package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY §2 (plus the LLM-pipeline extension ops)
  * is exposed as a named batch query over the driver's parquet testdata,
  * with a DuckDB oracle in [[oracleSql]]. Column names and value
  * encodings are aligned pairwise: every computed column is explicitly
  * aliased and cast the same way on both sides (longs stay BIGINT,
  * timestamps are emitted as epoch seconds/millis, floats are rounded)
  * so the driver's sorted-column hash compare is well-defined.
  */
object SparkEntry {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Io.table(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_cdc_changes")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S1-S4: live change-stream source — events → Change envelope
    // (reference/src/main.rs:202-303).
    "q_cdc_changes" -> ((s, dir) => {
      ChangeSource.fromEvents(T(s, dir, "events"))
        .select(
          col("event_id"),
          col("op"),
          col("db"),
          col("table"),
          col("before"),
          col("after"),
          col("ts").cast("long").as("ts_sec"),
          col("pkey"))
        .orderBy("event_id")
    }),

    // F1: regex stream filter on "{db}.{table}"
    // (reference/src/main.rs:220,260-262).
    "q_cdc_regex_filter" -> ((s, dir) => {
      Filters.regexFilter(
          ChangeSource.fromEvents(T(s, dir, "events")),
          """^db[0-2]\.(users|orders)$""")
        .select(col("event_id"), col("db"), col("table"))
        .orderBy("event_id")
    }),

    // T3: dynamic topic routing (reference/src/main.rs:424-434,
    // reference/test.rhai:46-48) + per-topic fan-out counts.
    "q_cdc_topic_route" -> ((s, dir) => {
      Routing.withTopic(ChangeSource.fromEvents(T(s, dir, "events")))
        .groupBy("topic").agg(count(lit(1)).cast("long").as("n"))
        .orderBy("topic")
    }),

    // T5: BigQuery-CDC projection (reference/test.rhai:25-36):
    // fields = Delete ? before : after, plus _CHANGE_TYPE and tenant.
    "q_cdc_bigquery" -> ((s, dir) => {
      val changes = ChangeSource.fromEvents(T(s, dir, "events"))
      changes.select(
          col("event_id"),
          when(col("op") === ChangeOp.Delete, col("before"))
            .otherwise(col("after")).as("fields"),
          Transforms.bigqueryChangeType(col("op")).as("_CHANGE_TYPE"),
          col("db").as("tenant"))
        .orderBy("event_id")
    }),

    // T4: Debezium envelope (reference/test.rhai:1-23), flattened to
    // scalar columns for the oracle compare; the nested-struct/JSON
    // form is exercised in the scalatest golden tests.
    "q_cdc_debezium" -> ((s, dir) => {
      val changes = ChangeSource.fromEvents(T(s, dir, "events"))
      changes.select(
          col("event_id"),
          Transforms.debeziumOp(col("op")).as("payload_op"),
          col("db").as("source_db"),
          col("table").as("source_table"),
          unix_millis(col("ts")).as("ts_ms"),
          col("before"),
          col("after"))
        .orderBy("event_id")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(

    "q_cdc_changes" ->
      s"""SELECT event_id, $opSql AS op, $dbSql AS db, $tableSql AS "table",
         |  $beforeSql AS before, $afterSql AS after,
         |  epoch_ns(ts) // 1000000000 AS ts_sec, '' AS pkey
         |FROM events ORDER BY event_id""".stripMargin,

    "q_cdc_regex_filter" ->
      s"""SELECT event_id, $dbSql AS db, $tableSql AS "table"
         |FROM events
         |WHERE regexp_matches($dbSql || '.' || $tableSql, '^db[0-2]\\.(users|orders)$$')
         |ORDER BY event_id""".stripMargin,

    "q_cdc_topic_route" ->
      s"""SELECT 'projects/my-project-id/topics/all_pims.' || $tableSql AS topic,
         |  count(*)::BIGINT AS n
         |FROM events GROUP BY 1 ORDER BY topic""".stripMargin,

    "q_cdc_bigquery" ->
      s"""SELECT event_id,
         |  CASE WHEN $opSql = 'Delete' THEN $beforeSql ELSE $afterSql END AS fields,
         |  CASE WHEN $opSql = 'Delete' THEN 'DELETE' ELSE 'UPSERT' END AS "_CHANGE_TYPE",
         |  $dbSql AS tenant
         |FROM events ORDER BY event_id""".stripMargin,

    "q_cdc_debezium" ->
      s"""SELECT event_id,
         |  CASE WHEN $opSql IN ('Insert','Backfill') THEN 'c'
         |       WHEN $opSql = 'Update' THEN 'u' ELSE 'd' END AS payload_op,
         |  $dbSql AS source_db, $tableSql AS source_table,
         |  epoch_ms(ts) AS ts_ms, $beforeSql AS before, $afterSql AS after
         |FROM events ORDER BY event_id""".stripMargin
  )

  // --- shared oracle fragments: the events → Change envelope mapping,
  // mirroring ChangeSource exactly ---

  private val opSql =
    """CASE WHEN event_type IN ('signup','purchase') THEN 'Insert'
      |     WHEN event_type IN ('click','view') THEN 'Update'
      |     WHEN event_type = 'error' THEN 'Delete'
      |     ELSE 'Backfill' END""".stripMargin
  private val dbSql = "('db' || (user_id % 4)::VARCHAR)"
  private val tableSql =
    """CASE WHEN event_type IN ('signup','error') THEN 'users'
      |     WHEN event_type = 'purchase' THEN 'orders'
      |     ELSE 'activity' END""".stripMargin
  private val beforeSql =
    "CASE WHEN event_type IN ('click','view','error') THEN props END"
  private val afterSql = "CASE WHEN event_type <> 'error' THEN props END"
}
