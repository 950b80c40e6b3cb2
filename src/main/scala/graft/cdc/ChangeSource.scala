package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Live change-stream source (SURVEY §2.1 S1-S4).
  *
  * The reference tails a MySQL binlog and decodes row events into
  * `Change`s (reference/src/main.rs:202-303). This harness has no live
  * MySQL; the driver's `events` table is the change-stream stand-in
  * (TESTDATA.md): `event_type` → op, `ts` → event time, `props` → row
  * payload, `user_id`/`event_id` → identity. The same projection is
  * exposed in batch (`fromEvents`) and streaming (`streamFromEvents`)
  * form — on a real cluster the streaming variant reads Kafka/Debezium
  * topics or a DSv2 binlog source; the envelope columns are identical
  * so every downstream operator works unchanged on either.
  *
  * Scale: this is a narrow per-row projection — no shuffle, fully
  * pipelined inside whole-stage codegen, pushdown-friendly (only the 5
  * source columns referenced are read from parquet).
  */
object ChangeSource {

  /** event_type → ChangeOp, the stand-in for the binlog op mapping
    * (WriteRows/UpdateRows/DeleteRows → Insert/Update/Delete,
    * reference/src/main.rs:279-284).
    */
  val opCol: Column =
    when(col("event_type").isin("signup", "purchase"), ChangeOp.Insert)
      .when(col("event_type").isin("click", "view"), ChangeOp.Update)
      .when(col("event_type") === "error", ChangeOp.Delete)
      .otherwise(ChangeOp.Backfill)

  /** Synthetic multi-tenant db name: 4 source databases. */
  val dbCol: Column = concat(lit("db"), (col("user_id") % 4).cast("string"))

  /** Synthetic table routing: signup/error touch `users`, purchase
    * touches `orders`, click/view touch `activity`.
    */
  val tableCol: Column =
    when(col("event_type").isin("signup", "error"), "users")
      .when(col("event_type") === "purchase", "orders")
      .otherwise("activity")

  /** events table → change envelope.
    *
    * before/after population follows reference/src/main.rs:286-292:
    * Insert → (null, after), Update → (before, after),
    * Delete → (before, null). `pkey` is empty on live changes
    * (reference/src/main.rs:276).
    */
  def fromEvents(events: DataFrame): DataFrame = {
    val op = opCol
    events.select(
      col("event_id"),
      op.as("op"),
      dbCol.as("db"),
      tableCol.as("table"),
      when(op.isin(ChangeOp.Update, ChangeOp.Delete), col("props")).as("before"),
      when(op =!= ChangeOp.Delete, col("props")).as("after"),
      col("ts"),
      lit("").as("pkey"))
  }

  /** Batch entry: read the events parquet of a scale-factor dir. */
  def batch(spark: SparkSession, sfDir: String): DataFrame =
    fromEvents(Io.table(spark, sfDir, "events"))

  /** Streaming twin: identical projection over readStream. At scale
    * this is the Kafka/DSv2-binlog entry point; offsets and resume come
    * from the query's checkpointLocation (replaces the reference's
    * SQLite log_pos table, reference/src/main.rs:137-141,238-255).
    * `dir` must contain parquet files with the events schema (ts as a
    * microsecond timestamp — tests stage a normalized copy).
    */
  def streamFromEvents(spark: SparkSession, dir: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    fromEvents(spark.readStream.schema(schema).parquet(dir))
}
