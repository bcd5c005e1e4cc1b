package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** k-permutation MinHash signature as ONE imperative aggregate.
  *
  * Input is a single 64-bit shingle hash; the k "permutations" are the
  * universal-hash family h_i(x) = a_i*x + b_i over Z_2^64 (odd a_i,
  * seeded deterministically), compared unsigned. Replaces k separate
  * min() aggregate columns — constant k-long state, map-side combine,
  * one shuffle, no wide-codegen compilation cost. Scales to any corpus
  * size; k bounds both state and CPU per row.
  */
case class MinHashAgg(
    child: Expression,
    k: Int = 64,
    seed: Long = 42L,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  // deterministic hash family; recomputed lazily on each executor
  @transient private lazy val (as, bs): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(seed)
    val a = Array.fill(k)(rnd.nextLong() | 1L) // odd multiplier
    val b = Array.fill(k)(rnd.nextLong())
    (a, b)
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(-1L) // 0xFFFF... = unsigned max

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val hi = as(i) * h + bs(i)
        if (java.lang.Long.compareUnsigned(hi, buf(i)) < 0) buf(i) = hi
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (java.lang.Long.compareUnsigned(b2(i), b1(i)) < 0) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(k * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def prettyName: String = "minhash_agg"
}

object MinHashAgg {
  /** Aggregate Column: k-long MinHash signature of a group of shingle
    * hashes. */
  def minhash_agg(shingleHash: Column, k: Int = 64,
                  seed: Long = 42L): Column =
    ColumnBridge.column(
      MinHashAgg(ColumnBridge.expression(shingleHash), k, seed)
        .toAggregateExpression())
}
