package graft.lake

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.3: schema serialization round-trip property — the analogue
  * of the reference's only pure logic (schema_conversion.go, both
  * directions), over arbitrary nested StructTypes. */
class SchemaRoundTripSpec extends AnyFunSuite {

  private val primitive: Gen[DataType] = Gen.oneOf(
    BooleanType, ByteType, ShortType, IntegerType, LongType, FloatType,
    DoubleType, StringType, BinaryType, DateType, TimestampType,
    TimestampNTZType, DecimalType(12, 3), DecimalType(38, 10))

  private def dataType(depth: Int): Gen[DataType] =
    if (depth <= 0) primitive
    else Gen.frequency(
      6 -> primitive,
      1 -> Gen.lzy(for {
        e <- dataType(depth - 1); n <- Gen.oneOf(true, false)
      } yield ArrayType(e, n)),
      1 -> Gen.lzy(for {
        k <- primitive; v <- dataType(depth - 1); n <- Gen.oneOf(true, false)
      } yield MapType(k, v, n)),
      1 -> Gen.lzy(structType(depth - 1)))

  private def structType(depth: Int): Gen[StructType] = for {
    n <- Gen.choose(1, 5)
    fields <- Gen.listOfN(n, for {
      name <- Gen.identifier.map(_.take(12))
      dt <- dataType(depth)
      nullable <- Gen.oneOf(true, false)
    } yield StructField(name, dt, nullable))
  } yield StructType(fields.distinctBy(_.name))

  test("StructType -> json -> StructType is identity (nested, nullable)") {
    val prop = Prop.forAll(structType(3)) { s =>
      DataTypeBridge.fromJson(DataTypeBridge.toJson(s)) == s
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }
}
