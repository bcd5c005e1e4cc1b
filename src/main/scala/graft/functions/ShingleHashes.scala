package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingle hashes of a text column, in ONE pass.
  *
  * Replaces `array_distinct(transform(sequence(...), i -> xxhash64(
  * concat(w[i], ' ', ...))))`: higher-order functions are
  * CodegenFallback, so that formulation paid interpreted expression
  * dispatch and a string allocation PER SHINGLE (~15us each, measured —
  * it dominated every dedup operator). Here: split on single spaces by
  * byte scan, XXH64 each word span in place (zero copies), slide a
  * window of n word hashes mixed position-sensitively, dedup in a
  * hash set. Equality of shingle hashes corresponds to equality of the
  * word n-gram (modulo 2^-64 collisions), which is all the dedup
  * operators need.
  */
case class ShingleHashes(child: Expression, n: Int, seed: Long = 42L)
    extends UnaryExpression with KernelUnaryCodegen {

  require(n >= 1 && n <= 16, "shingle width out of range")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"shingle_hashes expects string, got ${t.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    val base = s.getBaseObject
    val offset = s.getBaseOffset
    val len = s.numBytes()

    // hash each space-separated word span in place
    val wordHashes = new java.util.ArrayList[java.lang.Long]()
    var start = 0
    var i = 0
    while (i <= len) {
      val atEnd = i == len
      if (atEnd || org.apache.spark.unsafe.Platform.getByte(base, offset + i) == ' '.toByte) {
        wordHashes.add(XXH64.hashUnsafeBytes(base, offset + start, i - start, seed))
        start = i + 1
      }
      i += 1
    }
    val w = wordHashes.size()
    if (w < n) return new GenericArrayData(Array.empty[Long])

    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var p = 0
    while (p + n <= w) {
      var h = seed
      var j = 0
      while (j < n) { h = XXH64.hashLong(wordHashes.get(p + j), h); j += 1 }
      out.add(h)
      p += 1
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  def shingle_hashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), n))
}
