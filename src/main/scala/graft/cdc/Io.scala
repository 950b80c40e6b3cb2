package graft.cdc

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table access.
  *
  * The driver's `events.parquet` stores `ts` as parquet
  * TIMESTAMP(NANOS), which Spark 4 refuses by default
  * (PARQUET_TYPE_ILLEGAL). We flip the documented escape hatch
  * `spark.sql.legacy.parquet.nanosAsLong` (a dynamic SQLConf) and
  * normalize the resulting epoch-nanos long back to a microsecond
  * `TimestampType` column, so every downstream operator sees a regular
  * timestamp. All testdata reads go through here.
  */
object Io {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
