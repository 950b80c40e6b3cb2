package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.TypeMap

/** SURVEY §2.6 edge cases: micros padding, negative TIME, 3-digit
  * hours, uppercase hex (reference/src/main.rs:442-507).
  */
class TypeMapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String =
    Seq(1).toDF("x").select(c.cast("string")).head.getString(0)

  test("DATE / DATETIME / DATETIME+micros formatting") {
    val ts = to_timestamp(lit("2024-03-05 07:08:09.123456"))
    assert(one(TypeMap.mysqlDate(ts)) == "2024-03-05")
    assert(one(TypeMap.mysqlDateTime(ts)) == "2024-03-05 07:08:09")
    assert(one(TypeMap.mysqlDateTimeMicros(ts)) == "2024-03-05 07:08:09.123456")
  }

  test("TIME: negative, zero-padded 3-digit hours (main.rs:466-472)") {
    assert(one(TypeMap.mysqlTime(lit(-12345L))) == "-003:25:45")
    assert(one(TypeMap.mysqlTime(lit(12345L))) == "003:25:45")
    // days fold into hours: 3 days + 7h = 079
    assert(one(TypeMap.mysqlTime(lit((3 * 24 + 7) * 3600L + 61))) == "079:01:01")
    assert(one(TypeMap.mysqlTime(lit(0L))) == "000:00:00")
  }

  test("TIME micros: %06d pad (main.rs:473-491)") {
    assert(one(TypeMap.mysqlTimeMicros(lit(-12345L), lit(42L))) == "-003:25:45.000042")
    assert(one(TypeMap.mysqlTimeMicros(lit(1L), lit(999999L))) == "000:00:01.999999")
  }

  test("non-UTF8 bytes → UPPERCASE hex (main.rs:494-500)") {
    assert(one(TypeMap.bytesHex(lit("AB".getBytes))) == "4142")
    assert(one(TypeMap.bytesHex(lit(Array[Byte](0, 127, -1)))) == "007FFF")
  }

  test("u64 → DecimalType(20,0), full unsigned range (main.rs:454)") {
    assert(one(TypeMap.mysqlUnsignedBigInt(lit(42L))) == "42")
    assert(one(TypeMap.mysqlUnsignedBigInt(lit(Long.MaxValue))) == "9223372036854775807")
    // -1 as a raw bit pattern is 2^64-1
    assert(one(TypeMap.mysqlUnsignedBigInt(lit(-1L))) == "18446744073709551615")
    assert(one(TypeMap.mysqlUnsignedBigInt(lit(Long.MinValue))) == "9223372036854775808")
  }
}
