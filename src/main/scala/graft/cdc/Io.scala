package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Testdata table access.
  *
  * The driver's `events.parquet` has shipped `ts` as parquet
  * TIMESTAMP(NANOS) in some rounds and TIMESTAMP(MICROS) in others, so
  * normalization is by INFERRED TYPE, not by assumption:
  *
  *  - TIMESTAMP(NANOS): Spark 4 refuses it by default
  *    (PARQUET_TYPE_ILLEGAL); we flip the documented escape hatch
  *    `spark.sql.legacy.parquet.nanosAsLong` (a dynamic SQLConf) and
  *    convert the epoch-nanos long to a microsecond timestamp.
  *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads it as
  *    TIMESTAMP_NTZ; cast to session-local TimestampType — every
  *    session here pins UTC, so the wall clock (what DuckDB's naive
  *    TIMESTAMP sees) maps to the identical epoch micros.
  *
  * Either way every downstream operator sees a regular microsecond
  * `TimestampType` column with the same integer epoch values the
  * DuckDB oracle computes. All testdata reads go through here.
  */
object Io {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
    else df
  }
}
