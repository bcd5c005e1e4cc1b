package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Sign-random-projection LSH bucket id: bit i of the result is the sign
  * of `embedding . planes(i)`.
  *
  * A native expression (with codegen via addReferenceObj for the plane
  * matrix) instead of `bits` stacked zip_with/aggregate lambda trees —
  * the HoF formulation compiled an O(bits * dim) expression per query and
  * dominated ANN bucketing time; this is one tight double loop that
  * whole-stage-codegen inlines into the scan.
  */
case class SignRandomProjection(child: Expression,
                                planes: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"srp_bucket expects array<float|double>, got ${t.sql}")
    }

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var bucket = 0L
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      var dot = 0.0; var j = 0
      val m = math.min(n, p.length)
      while (j < m) {
        dot += (if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)) * p(j)
        j += 1
      }
      if (dot >= 0) bucket |= (1L << i)
      i += 1
    }
    bucket
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val dot = ctx.freshName("dot"); val p = ctx.freshName("p")
      val m = ctx.freshName("m"); val bucket = ctx.freshName("bucket")
      s"""
         |long $bucket = 0L;
         |for (int $i = 0; $i < $planesRef.length; $i++) {
         |  double[] $p = $planesRef[$i];
         |  int $m = java.lang.Math.min($a.numElements(), $p.length);
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    $dot += ((double) $a.$getter($j)) * $p[$j];
         |  }
         |  if ($dot >= 0) $bucket |= (1L << $i);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "srp_bucket"
}

object SignRandomProjection {
  def srp_bucket(emb: Column, planes: Array[Array[Double]]): Column =
    ColumnBridge.column(
      SignRandomProjection(ColumnBridge.expression(emb), planes))

  def sign_bits(emb: Column): Column =
    ColumnBridge.column(SignBits(ColumnBridge.expression(emb)))
}

/** Axis-aligned SRP signature: bit j (j < min(64, len)) is the sign of
  * coordinate j — the SRP family with the coordinate axes as hyperplanes.
  *
  * Unlike the seeded Gaussian planes of [[SignRandomProjection]], this
  * signature is defined by the data alone, so ANY engine can recompute it
  * (`embedding[j] >= 0` in SQL) — which is what makes the LSH-blocked
  * near-dup join (SimilarityOps.embeddingNearDupLsh) cross-engine
  * oracle-checkable. Also 64 loads/row instead of a 64x64 plane
  * multiply. */
case class SignBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"sign_bits expects array<float|double>, got ${t.sql}")
    }

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), 64)
    var sig = 0L
    var j = 0
    while (j < n) {
      val x = if (isFloat) a.getFloat(j).toDouble else a.getDouble(j)
      if (x >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      s"""
         |long $sig = 0L;
         |int $n = java.lang.Math.min($a.numElements(), 64);
         |for (int $j = 0; $j < $n; $j++) {
         |  if (((double) $a.$getter($j)) >= 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "sign_bits"
}
