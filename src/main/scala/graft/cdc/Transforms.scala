package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** Per-row transforms (SURVEY §2.4 T1-T5).
  *
  * The reference embeds the Rhai scripting engine and calls a
  * user-supplied `transform(db, table, op, before, after, ts)` per row
  * (reference/src/main.rs:389-435). The two shipped scripts are pure
  * data reshaping (reference/test.rhai:1-36, reference/README.md:54-83),
  * so the Spark-native design replaces the script host with a
  * `Transform` trait whose implementations return Catalyst `Column`
  * expressions — fully codegen'd, optimizable, no per-row interpreter.
  * Arbitrary user logic can still drop to a Scala UDF implementation of
  * the same trait, mirroring the reference's "any script" escape hatch.
  */
trait Transform {
  /** Given an envelope DataFrame (op/db/table/before/after/ts/pkey),
    * return the transformed payload column (a struct or map, ready for
    * `to_json`).
    */
  def apply(changes: DataFrame): Column
}

object Transforms {

  private val rowType = MapType(StringType, StringType)

  /** before/after JSON string → map<string,string>, with `tenant` added
    * (both shipped scripts tag rows with `tenant = db`:
    * reference/test.rhai:2-3,34).
    */
  def rowWithTenant(jsonCol: Column, db: Column): Column =
    when(jsonCol.isNotNull,
      map_concat(from_json(jsonCol, rowType), map(lit("tenant"), db)))

  /** Debezium op recoding: Insert/Backfill → "c", Update → "u",
    * Delete → "d" (reference/test.rhai:8-14).
    */
  def debeziumOp(op: Column): Column =
    when(op.isin(ChangeOp.Insert, ChangeOp.Backfill), "c")
      .when(op === ChangeOp.Update, "u")
      .when(op === ChangeOp.Delete, "d")
      .otherwise(op)

  /** BigQuery-CDC op recoding: Delete → DELETE, everything else →
    * UPSERT (reference/test.rhai:27-33).
    */
  def bigqueryChangeType(op: Column): Column =
    when(op === ChangeOp.Delete, "DELETE").otherwise("UPSERT")

  /** T4: the Debezium envelope shipped as `debezium()` in
    * reference/test.rhai:1-23 —
    * `{payload: {before, after, op, source: {ts_ms, db, table}, ts_ms}}`.
    */
  object DebeziumEnvelope extends Transform {
    def apply(changes: DataFrame): Column = {
      val ts_ms = unix_millis(col("ts"))
      struct(
        struct(
          rowWithTenant(col("before"), col("db")).as("before"),
          rowWithTenant(col("after"), col("db")).as("after"),
          debeziumOp(col("op")).as("op"),
          struct(ts_ms.as("ts_ms"), col("db").as("db"), col("table").as("table")).as("source"),
          ts_ms.as("ts_ms")
        ).as("payload"))
    }
  }

  /** T5: the BigQuery-CDC projection shipped as `bigquery()` in
    * reference/test.rhai:25-36 — `fields = (op == Delete) ? before :
    * after` plus `_CHANGE_TYPE` and `tenant` keys.
    */
  object BigQueryCdc extends Transform {
    def apply(changes: DataFrame): Column = {
      val fields =
        when(col("op") === ChangeOp.Delete, col("before")).otherwise(col("after"))
      map_concat(
        from_json(fields, rowType),
        map(
          lit("_CHANGE_TYPE"), bigqueryChangeType(col("op")),
          lit("tenant"), col("db")))
    }
  }

  /** T1 — the GENERAL script host, Spark-first: a user "script" is a
    * SQL expression string over the envelope columns
    * (op/db/table/before/after/ts/pkey) — the analog of the
    * reference's Rhai transform hook (reference/src/main.rs:389-435)
    * with Spark SQL as the scripting language. Catalyst parses the
    * script ONCE at plan time and compiles it into whole-stage
    * codegen, so per-row cost is compiled code, not an interpreter
    * (the reference pays a Rhai `call_fn` per row), and an invalid
    * script fails at analysis, never mid-stream. Any string source
    * plugs in — inline, [[SqlScript.fromFile]], a config table —
    * which is the pluggable script loading the Rhai path implies.
    */
  final case class SqlScript(script: String) extends Transform {
    def apply(changes: DataFrame): Column = expr(script)
  }

  object SqlScript {
    def fromFile(path: String): SqlScript =
      SqlScript(new String(
        java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
        java.nio.charset.StandardCharsets.UTF_8))
  }

  /** T2's JSON wire encoding (reference/src/main.rs:421): payload column
    * → JSON bytes for the sink message body.
    */
  def toWire(changes: DataFrame, t: Transform): DataFrame =
    changes.withColumn("payload", to_json(t(changes)))
}
