package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Generator (UDTF) emitting all ordered element pairs (i < j) of an
  * array<struct<id, payload>> as rows (d1, p1, d2, p2).
  *
  * Replaces the nested `flatten(transform(transform(...)))` lambda
  * formulation in the dedup candidate generators: one flat loop, no
  * intermediate nested arrays, no per-element interpreted lambda
  * dispatch — this is the inner loop of every bucket-combos stage, so
  * candidate generation cost is pure row emission. Input is expected
  * sorted by id (sort_array upstream) so d1 < d2 holds.
  */
case class PairExplode(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  private lazy val elemStruct: StructType = child.dataType match {
    case ArrayType(s: StructType, _) if s.length == 2 => s
    case t => throw new IllegalArgumentException(
      s"pair_explode expects array<struct<id,payload>>, got ${t.sql}")
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _) if s.length == 2 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"pair_explode expects array<struct<id,payload>>, got ${t.sql}")
    }

  override def elementSchema: StructType = StructType(Seq(
    StructField("d1", elemStruct(0).dataType, elemStruct(0).nullable),
    StructField("p1", elemStruct(1).dataType, elemStruct(1).nullable),
    StructField("d2", elemStruct(0).dataType, elemStruct(0).nullable),
    StructField("p2", elemStruct(1).dataType, elemStruct(1).nullable)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < 2) return Iterator.empty
    val n = arr.numElements()
    val idType = elemStruct(0).dataType
    val payType = elemStruct(1).dataType
    // materialize once; structs are re-read per pair otherwise
    val ids = new Array[Any](n)
    val pays = new Array[Any](n)
    var i = 0
    while (i < n) {
      val s = arr.getStruct(i, 2)
      ids(i) = s.get(0, idType)
      pays(i) = s.get(1, payType) match {
        case c: ArrayData => c.copy() // defensive: reused buffers
        case v => v
      }
      i += 1
    }
    new Iterator[InternalRow] {
      private var a = 0
      private var b = 1
      override def hasNext: Boolean = a < n - 1
      override def next(): InternalRow = {
        val row = new GenericInternalRow(
          Array[Any](ids(a), pays(a), ids(b), pays(b)))
        b += 1
        if (b >= n) { a += 1; b = a + 1 }
        row
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "pair_explode"
}

object PairExplode {
  def pair_explode(sortedStructs: Column): Column =
    ColumnBridge.column(PairExplode(ColumnBridge.expression(sortedStructs)))
}
