package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
  * per-row expressions; CodegenFallback is fine because row count
  * dominates (the NearestCentroid precedent). */
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
    extends UnaryExpression with CodegenFallback {

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
    extends UnaryExpression with CodegenFallback {

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
    extends UnaryExpression with CodegenFallback {

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

object PqFunctions {
  def pq_encode(emb: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(emb), codebooks))
  def pq_adc(codes: Column, lut: Array[Array[Double]]): Column =
    ColumnBridge.column(PqAdc(ColumnBridge.expression(codes), lut))
  def pq_adc_batch(codes: Column,
                   luts: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqAdcBatch(ColumnBridge.expression(codes), luts))
}
