package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** 64-bit SimHash as a single imperative aggregate over token hashes.
  *
  * Replaces the 64-sum-columns formulation (which worked but paid ~64
  * aggregate expressions of codegen per query): one buffer of 64 counters,
  * updated with a tight bit loop, partial-aggregated map-side like any
  * hash aggregate — one shuffle, constant-width state, linear at 100 TB.
  *
  * Input: a LongType token hash (e.g. xxhash64(token)); each bit of the
  * hash votes +1/-1 on the corresponding output bit; eval emits the sign
  * vector packed into a long (bit set iff counter >= 0, matching the
  * previous formulation exactly).
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var b = 0
      while (b < 64) { buf(b) += (((h >>> b) & 1L) * 2L) - 1L; b += 1 }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var r = 0L; var b = 0
    while (b < 64) { if (buf(b) >= 0) r |= (1L << b); b += 1 }
    r
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getLong())
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
  override def prettyName: String = "simhash_agg"
}

object SimHashAgg {
  /** Aggregate Column: simhash of a group of token-hash longs. */
  def simhash_agg(tokenHash: Column): Column =
    ColumnBridge.column(
      SimHashAgg(ColumnBridge.expression(tokenHash)).toAggregateExpression())
}
