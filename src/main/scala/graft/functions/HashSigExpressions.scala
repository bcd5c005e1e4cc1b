package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Per-ROW signature expressions over a pre-hashed token/shingle array.
  *
  * When the input already carries one array of element hashes per
  * document (shingleHashArrays), the MinHash/SimHash signature is a pure
  * scalar function of that row — no explode, no shuffle, no aggregation
  * state. The grouped Agg variants (MinHashAgg/SimHashAgg) remain for
  * streaming and SQL GROUP BY use; these are the batch fast path.
  */

/** k-permutation MinHash signature of an array<long> of element hashes.
  * Same universal-hash family as MinHashAgg (a_i*x + b_i, unsigned min). */
case class MinHashSig(child: Expression, k: Int = 64, seed: Long = 42L)
    extends UnaryExpression {

  @transient private lazy val (as, bs): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(seed)
    (Array.fill(k)(rnd.nextLong() | 1L), Array.fill(k)(rnd.nextLong()))
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"minhash_sig expects array<bigint>, got ${t.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(-1L)
    var j = 0
    while (j < a.numElements()) {
      val h = a.getLong(j)
      var i = 0
      while (i < k) {
        val hi = as(i) * h + bs(i)
        if (java.lang.Long.compareUnsigned(hi, sig(i)) < 0) sig(i) = hi
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("as", as, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val hi = ctx.freshName("hi")
      s"""
         |long[] $sig = new long[$k];
         |java.util.Arrays.fill($sig, -1L);
         |for (int $j = 0; $j < $a.numElements(); $j++) {
         |  long $h = $a.getLong($j);
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $hi = $asRef[$i] * $h + $bsRef[$i];
         |    if (Long.compareUnsigned($hi, $sig[$i]) < 0) $sig[$i] = $hi;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** 64-bit SimHash of an array<long> of token hashes (sign of per-bit
  * +1/-1 votes; bit set iff counter >= 0, matching SimHashAgg). */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"simhash_sig expects array<bigint>, got ${t.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val counters = new Array[Long](64)
    var j = 0
    while (j < a.numElements()) {
      val h = a.getLong(j)
      var b = 0
      while (b < 64) { counters(b) += (((h >>> b) & 1L) * 2L) - 1L; b += 1 }
      j += 1
    }
    var r = 0L; var b = 0
    while (b < 64) { if (counters(b) >= 0) r |= (1L << b); b += 1 }
    r
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val c = ctx.freshName("counters"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      s"""
         |long[] $c = new long[64];
         |for (int $j = 0; $j < $a.numElements(); $j++) {
         |  long $h = $a.getLong($j);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $c[$b] += ((($h >>> $b) & 1L) * 2L) - 1L;
         |  }
         |}
         |long $r = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($c[$b] >= 0) $r |= (1L << $b);
         |}
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "simhash_sig"
}

/** LSH band hashes of a MinHash signature: splits the k-long signature
  * into `bands` equal slices and hashes each (band index mixed in), as
  * one native loop instead of `bands` separate slice+hash expression
  * trees. Output index = band id (pair with posexplode). */
case class BandHashes(child: Expression, bands: Int)
    extends UnaryExpression {

  require(bands >= 1, s"band_hashes: bands must be >= 1, got $bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"band_hashes expects array<bigint>, got ${t.sql}")
    }

  // signature length must split into equal bands: silently truncating a
  // remainder would drop hash positions, and r=0 (bands > length) would
  // collapse every row into the same `bands` buckets — a quadratic
  // candidate-pair explosion, not a correctness-preserving degradation
  private def checkLength(k: Int): Unit =
    if (k == 0 || k % bands != 0) throw new IllegalArgumentException(
      s"band_hashes: signature length $k is not a positive multiple " +
        s"of bands=$bands")

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val k = a.numElements()
    checkLength(k)
    val r = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = b.toLong
      var j = 0
      while (j < r) {
        h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(a.getLong(b * r + j), h)
        j += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out"); val b = ctx.freshName("b")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val r = ctx.freshName("r")
      s"""
         |if ($a.numElements() == 0 || $a.numElements() % $bands != 0) {
         |  throw new IllegalArgumentException(
         |    "band_hashes: signature length " + $a.numElements() +
         |    " is not a positive multiple of bands=" + $bands);
         |}
         |int $r = $a.numElements() / $bands;
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $h = (long) $b;
         |  for (int $j = 0; $j < $r; $j++) {
         |    $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashLong($a.getLong($b * $r + $j), $h);
         |  }
         |  $out[$b] = $h;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "band_hashes"
}

object HashSig {
  def minhash_sig(hashes: Column, k: Int = 64, seed: Long = 42L): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes), k, seed))
  def simhash_sig(hashes: Column): Column =
    ColumnBridge.column(SimHashSig(ColumnBridge.expression(hashes)))
  def band_hashes(sig: Column, bands: Int): Column =
    ColumnBridge.column(BandHashes(ColumnBridge.expression(sig), bands))
}
