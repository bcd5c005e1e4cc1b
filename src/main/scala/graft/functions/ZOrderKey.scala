package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Z-order (Morton) key over 2-4 integer columns: the low `64/k` bits
  * of each value are interleaved MSB-first into one long, so sorting by
  * the key clusters rows that are close in EVERY dimension — the basis
  * for multi-dimensional data skipping, where a lexicographic sort only
  * ever prunes its leading column.
  *
  * CONTRACT: inputs must already lie in `[0, 2^(64/k))` — higher bits
  * are masked off, and negatives would interleave as large unsigned
  * values. [[graft.lake.LakeTable.compactZOrder]] guarantees this by
  * min/max-normalizing each column into the domain first (the same
  * reason Delta z-orders over range-bucket ranks, not raw bits: raw
  * high-bit interleaves collapse when values share their top bits).
  * Nulls key as 0 and therefore cluster with the dimension's minimum.
  *
  * Codegen'd — the key is evaluated once per row inside compaction's
  * sort, a hot path at rewrite scale.
  */
case class ZOrderKey(children: Seq[Expression]) extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.size < 2 || children.size > 4)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"zorder_key takes 2-4 columns, got ${children.size}")
    else if (!children.forall(c => c.dataType match {
      case ByteType | ShortType | IntegerType | LongType | DateType => true
      case _ => false
    }))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"zorder_key expects integer columns, got " +
          children.map(_.dataType.sql).mkString(", "))
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  private def k = children.size
  private def bitsPer = 64 / k

  private def asLong(t: DataType, v: Any): Long = t match {
    case ByteType => v.asInstanceOf[Byte].toLong
    case ShortType => v.asInstanceOf[Short].toLong
    case IntegerType | DateType => v.asInstanceOf[Int].toLong
    case _ => v.asInstanceOf[Long]
  }

  override def eval(input: InternalRow): Any = {
    var out = 0L
    var dim = 0
    while (dim < k) {
      val v = children(dim).eval(input)
      val u =
        if (v == null) 0L
        else asLong(children(dim).dataType, v) & ((1L << bitsPer) - 1)
      var b = 0
      while (b < bitsPer) {
        val bit = (u >>> (bitsPer - 1 - b)) & 1L
        out |= bit << ((k * bitsPer - 1) - (b * k + dim))
        b += 1
      }
      dim += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{Block, EmptyBlock, JavaCode}
    val childGens = children.map(_.genCode(ctx))
    val acc = ctx.freshName("zkey")
    val mask = (1L << bitsPer) - 1
    val pieces = children.zipWithIndex.map { case (_, dim) =>
      val g = childGens(dim)
      val u = ctx.freshName("u")
      val bitLines = (0 until bitsPer).map { b =>
        s"$acc |= (($u >>> ${bitsPer - 1 - b}) & 1L) << " +
          s"${(k * bitsPer - 1) - (b * k + dim)};"
      }.mkString(" ")
      s"{ long $u = (${g.isNull}) ? 0L : (((long) ${g.value}) & ${mask}L); " +
        s"$bitLines }"
    }.mkString("\n")
    val childBlocks =
      childGens.map(_.code).fold(EmptyBlock: Block)(_ + _)
    ev.copy(
      code = childBlocks + code"""
        long $acc = 0L;
        $pieces""",
      isNull = FalseLiteral,
      value = JavaCode.variable(acc, LongType))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
  override def prettyName: String = "zorder_key"
}

object ZOrderKey {
  def zorder_key(cols: Column*): Column =
    ColumnBridge.column(ZOrderKey(cols.map(ColumnBridge.expression)))
}
