package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jegou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011): split a d-dim vector
  * into m subspaces, quantize each against a small per-subspace
  * codebook, and answer queries with asymmetric distance computation
  * (ADC) — the query stays exact, each database vector is represented
  * by m small codes, and its approximate distance is m lookups into a
  * per-query table. Codebooks and LUTs ride as plan constants (m*k*d/m
  * doubles — bytes, not data), so both kernels are single-pass
  * per-row expressions, codegen'd via [[KernelUnaryCodegen]] /
  * [[KernelBinaryCodegen]] (direct kernel call — no fallback
  * input-row materialization; the O(m*k*d/m) kernel dominates). */
private[functions] object PqMath {
  /** Squared L2 between `a[off..off+len)` (float/double array data)
    * and `code` — accumulation order is ascending index, matching the
    * unrolled left-associative `+` chain of the SQL oracle. */
  def sqDist(a: ArrayData, isFloat: Boolean, off: Int,
             code: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < code.length) {
      val x = if (isFloat) a.getFloat(off + i).toDouble
              else a.getDouble(off + i)
      val d = x - code(i)
      s += d * d
      i += 1
    }
    s
  }
}

/** Per-subspace nearest-code ids: array<int> of length m (ties to the
  * lowest code id). `codebooks(j)(c)` is code c of subspace j; every
  * subspace has the same width d/m. */
case class PqEncode(child: Expression,
                    codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with KernelUnaryCodegen {

  private val subDim = codebooks(0)(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes() =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"pq_encode expects array<float|double>, got ${t.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val out = new Array[Int](codebooks.length)
    var j = 0
    while (j < codebooks.length) {
      val cb = codebooks(j)
      var best = 0
      var bestD = PqMath.sqDist(a, isFloat, j * subDim, cb(0))
      var c = 1
      while (c < cb.length) {
        val d = PqMath.sqDist(a, isFloat, j * subDim, cb(c))
        if (d < bestD) { bestD = d; best = c } // strict: ties keep low c
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** ADC distance of a code array against a per-query lookup table:
  * sum over subspaces of `lut(j)(code(j))`. */
case class PqAdc(child: Expression, lut: Array[Array[Double]])
    extends UnaryExpression with KernelUnaryCodegen {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"pq_adc expects array<int>, got ${t.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var s = 0.0
    var j = 0
    while (j < lut.length) { s += lut(j)(a.getInt(j)); j += 1 }
    s
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "pq_adc"
}

/** Batched ADC: distances of one code array against EVERY query LUT
  * of a serving batch — array<double> of length Q, `out(q) = sum over
  * j of luts(q)(j)(code(j))`, ascending-j like [[PqAdc]]. The whole
  * LUT stack is a plan constant (Q*m*k doubles — a 1000-query batch
  * over 8x16 codes is ~1 MB), so a query BATCH still costs ONE scan
  * of the compressed code table: Q*m lookups per row in a single
  * pass, instead of Q separate scans. */
case class PqAdcBatch(child: Expression, luts: Array[Array[Array[Double]]])
    extends UnaryExpression with KernelUnaryCodegen {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes() =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"pq_adc_batch expects array<int>, got ${t.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val out = new Array[Double](luts.length)
    var q = 0
    while (q < luts.length) {
      val lut = luts(q)
      var s = 0.0
      var j = 0
      while (j < lut.length) { s += lut(j)(a.getInt(j)); j += 1 }
      out(q) = s
      q += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "pq_adc_batch"
}

/** Residual to the row's assigned centroid — array<double> of
  * `v[i] - centroids(cluster)(i)` — the FAISS-IVFPQ `by_residual`
  * encode input: residuals concentrate near 0 with far smaller
  * variance than raw vectors, so the same codebook budget quantizes
  * them with much less error (measured in tools/RecallScale). The
  * centroid matrix is a plan constant (C x d doubles — KBs); the
  * cluster id is the row's `_cluster` column, so the subtraction is
  * a single per-row pass with no join. */
case class VecResidual(left: Expression, right: Expression,
                       centroids: Array[Array[Double]])
    extends BinaryExpression with KernelBinaryCodegen {

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes() =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"vec_residual expects (array<float|double>, int), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(v: Any, cl: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val cent = centroids(cl.asInstanceOf[Int])
    val isFloat = left.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val out = new Array[Double](cent.length)
    var i = 0
    while (i < cent.length) {
      val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      out(i) = x - cent(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "vec_residual"
}

/** Cluster-dispatched ADC — residual serving needs a PER-CLUSTER
  * lookup table (the query's residual `q - c_p` differs per probed
  * list, exactly FAISS's precomputed per-list tables). `luts` is
  * indexed by cluster id with null for unprobed clusters; the scan's
  * `_cluster IN probes` filter guarantees only probed rows reach the
  * kernel, so a null hit is a caller bug and throws. Accumulation is
  * ascending-j like [[PqAdc]]. */
case class PqAdcClustered(left: Expression, right: Expression,
                          luts: Array[Array[Array[Double]]])
    extends BinaryExpression with KernelBinaryCodegen {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes() =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"pq_adc_clustered expects (array<int>, int), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(v: Any, cl: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val lut = luts(cl.asInstanceOf[Int])
    require(lut != null,
      s"pq_adc_clustered: row from unprobed cluster $cl reached the kernel")
    var s = 0.0
    var j = 0
    while (j < lut.length) { s += lut(j)(a.getInt(j)); j += 1 }
    s
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "pq_adc_clustered"
}

/** Batched cluster-dispatched ADC: `luts(cluster)(q)` is query q's
  * table against cluster's residual frame — array<double> of length Q
  * per row, ascending-q/ascending-j. A query that did not probe the
  * row's cluster carries a null slot and yields +Infinity (the pair
  * join discards those rows afterward, same post-filter economics as
  * [[PqAdcBatch]]). */
case class PqAdcClusteredBatch(left: Expression, right: Expression,
                               luts: Array[Array[Array[Array[Double]]]])
    extends BinaryExpression with KernelBinaryCodegen {

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes() =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"pq_adc_clustered_batch expects (array<int>, int), got (${l.sql}, ${r.sql})")
    }

  private val nQueries: Int =
    luts.collectFirst { case ls if ls != null => ls.length }.getOrElse(0)

  override def nullSafeEval(v: Any, cl: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val clusterLuts = luts(cl.asInstanceOf[Int])
    val out = new Array[Double](nQueries)
    var q = 0
    while (q < nQueries) {
      val lut = if (clusterLuts == null) null else clusterLuts(q)
      if (lut == null) out(q) = Double.PositiveInfinity
      else {
        var s = 0.0
        var j = 0
        while (j < lut.length) { s += lut(j)(a.getInt(j)); j += 1 }
        out(q) = s
      }
      q += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "pq_adc_clustered_batch"
}

object PqFunctions {
  def pq_encode(emb: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(emb), codebooks))
  def pq_adc(codes: Column, lut: Array[Array[Double]]): Column =
    ColumnBridge.column(PqAdc(ColumnBridge.expression(codes), lut))
  def pq_adc_batch(codes: Column,
                   luts: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqAdcBatch(ColumnBridge.expression(codes), luts))
  def vec_residual(emb: Column, cluster: Column,
                   centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(VecResidual(ColumnBridge.expression(emb),
      ColumnBridge.expression(cluster), centroids))
  def pq_adc_clustered(codes: Column, cluster: Column,
                       luts: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqAdcClustered(ColumnBridge.expression(codes),
      ColumnBridge.expression(cluster), luts))
  def pq_adc_clustered_batch(codes: Column, cluster: Column,
      luts: Array[Array[Array[Array[Double]]]]): Column =
    ColumnBridge.column(PqAdcClusteredBatch(ColumnBridge.expression(codes),
      ColumnBridge.expression(cluster), luts))
}
