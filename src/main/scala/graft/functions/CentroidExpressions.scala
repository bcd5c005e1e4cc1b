package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Centroid scoring for IVF-style ANN: cosine similarity of an embedding
  * against a small centroid matrix carried as a plan constant. */
private[functions] trait CentroidScoring {
  def centroids: Array[Array[Double]]

  protected def scores(a: ArrayData, isFloat: Boolean): Array[Double] = {
    val n = a.numElements()
    val out = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var j = 0
      val m = math.min(n, cent.length)
      while (j < m) {
        val x = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
        dot += x * cent(j); na += x * x; nb += cent(j) * cent(j)
        j += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      out(c) = if (den == 0.0) -2.0 else dot / den
      c += 1
    }
    out
  }

  protected def isFloatChild(child: Expression): Boolean =
    child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

  def checkArray(child: Expression, name: String)
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"$name expects array<float|double>, got ${t.sql}")
    }
}

/** Index of the nearest (max-cosine) centroid; evaluated per vector row
  * during assignment — the hot loop of Lloyd iterations and of index
  * construction; codegen'd via [[KernelUnaryCodegen]] (direct kernel
  * call — no fallback input-row materialization; the O(C*d) kernel
  * dominates). */
case class NearestCentroid(child: Expression,
                           centroids: Array[Array[Double]])
    extends UnaryExpression with CentroidScoring with KernelUnaryCodegen {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes() = checkArray(child, "nearest_centroid")

  override def nullSafeEval(v: Any): Any = {
    val s = scores(v.asInstanceOf[ArrayData], isFloatChild(child))
    var best = 0; var c = 1
    while (c < s.length) { if (s(c) > s(best)) best = c; c += 1 }
    best
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "nearest_centroid"
}

/** Indices of the `nprobe` highest-cosine centroids (probe list for the
  * query side — evaluated once per query). */
case class TopCentroids(child: Expression,
                        centroids: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression with CentroidScoring with KernelUnaryCodegen {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes() = checkArray(child, "top_centroids")

  override def nullSafeEval(v: Any): Any = {
    val s = scores(v.asInstanceOf[ArrayData], isFloatChild(child))
    val top = s.zipWithIndex.sortBy(-_._1).take(nprobe).map(_._2)
    new GenericArrayData(top)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "top_centroids"
}

object CentroidFunctions {
  def nearest_centroid(emb: Column, cents: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(emb), cents))
  def top_centroids(emb: Column, cents: Array[Array[Double]],
                    nprobe: Int): Column =
    ColumnBridge.column(TopCentroids(ColumnBridge.expression(emb), cents, nprobe))
}
