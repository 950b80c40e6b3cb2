package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** MySQL wire-value → string mappings (SURVEY §2.6) — the reference's
  * entire scalar-function library (`row_to_map`,
  * reference/src/main.rs:442-507). Everything temporal/binary is
  * stringified exactly as the reference does; all of it is built-in
  * Spark expressions (codegen'd, no UDFs).
  */
object TypeMap {

  /** DATE at midnight → "YYYY-MM-DD" (reference/src/main.rs:457). */
  def mysqlDate(ts: Column): Column = date_format(ts, "yyyy-MM-dd")

  /** DATETIME, no fractional part → "YYYY-MM-DD HH:MM:SS"
    * (reference/src/main.rs:458-461).
    */
  def mysqlDateTime(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd HH:mm:ss")

  /** DATETIME with micros → "YYYY-MM-DD HH:MM:SS.ffffff" (%06d pad,
    * reference/src/main.rs:462-465).
    */
  def mysqlDateTimeMicros(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** MySQL TIME (a signed duration, not a time-of-day) from total
    * seconds → "HHH:MM:SS" with hours = days*24+h zero-padded to 3
    * (reference/src/main.rs:466-472). No Spark built-in type matches —
    * composed from abs/floor/lpad, still codegen-friendly.
    */
  def mysqlTime(seconds: Column): Column = {
    val a = abs(seconds)
    concat(
      when(seconds < 0, "-").otherwise(""),
      lpad(floor(a / 3600).cast("long").cast("string"), 3, "0"), lit(":"),
      lpad(floor((a % 3600) / 60).cast("long").cast("string"), 2, "0"), lit(":"),
      lpad((a % 60).cast("long").cast("string"), 2, "0"))
  }

  /** MySQL TIME with micros → "HHH:MM:SS.ffffff"
    * (reference/src/main.rs:473-491).
    */
  def mysqlTimeMicros(seconds: Column, micros: Column): Column =
    concat(mysqlTime(seconds), lit("."),
      lpad(micros.cast("string"), 6, "0"))

  /** Non-UTF-8 bytes → UPPERCASE hex (reference/src/main.rs:494-500).
    * Spark's `hex` is uppercase — an exact match.
    */
  def bytesHex(c: Column): Column = hex(c)

  /** MySQL BIGINT UNSIGNED (u64, reference/src/main.rs:454): no exact
    * Spark integral type — compute in DecimalType(20,0), which holds
    * the full 0..2^64-1 range (SURVEY §1.4/§2.6), then stringify like
    * every other mapping here (the reference's wire format is stringly,
    * SURVEY §1.2). Input is the raw 64-bit pattern as a signed long;
    * negative longs are re-interpreted as the high half.
    */
  def mysqlUnsignedBigInt(raw: Column): Column = {
    val dec = raw.cast(DecimalType(20, 0))
    when(raw < 0, dec + lit(BigDecimal(2).pow(64).bigDecimal).cast(DecimalType(21, 0)))
      .otherwise(dec).cast(DecimalType(20, 0)).cast("string")
  }
}
