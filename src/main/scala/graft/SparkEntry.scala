package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc._
import graft.ops._

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

  /** Session-cached frozen-PRF models per sf dir — the retrieval
    * analog of the `graft_idx` build-once pattern: the freeze is paid
    * once, `q_text_rm3_frozen_serve` times only the serving map.
    */
  private val prfCache =
    new java.util.concurrent.ConcurrentHashMap[String, Retrieval.FrozenPrf]()

  /** Session-staged media fixture dirs (fixture encode paid once per
    * sf dir) — so the serve-side decode queries time what production
    * runs: reading ALREADY-ENCODED bytes and decoding them.
    */
  private val mediaStage =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Shared input of the as-of queries: change rows + session-start
    * marks. The envelope feeds both sides — cached (once per plan,
    * lifecycle per [[graft.ops.Caching.cachedOnce]]) so the events
    * scan + envelope runs once.
    */
  private def asofInputs(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val env = Caching.cachedOnce(
      ChangeSource.fromEvents(T(s, dir, "events"))
        .select(col("event_id"), col("db"), col("table"), col("ts")))
    val ch = env.select(col("event_id"), col("db"), col("table"),
      unix_micros(col("ts")).as("ts_us"))
    val sessions = env
      .groupBy(col("db"), col("table"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("db"), col("table"), unix_micros(col("w.start")).as("ts_us"))
    (ch, sessions)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The full reference drive loop in one plan: change source
    * → envelope → regex filter → BigQuery-CDC transform → topic
    * routing (source/filter/transform/route, SURVEY §3.1).
    */
  def entry(spark: SparkSession): DataFrame = {
    val changes = ChangeSource.batch(spark, "/root/testdata/sf0.001")
    Routing.withTopic(Filters.regexFilter(changes, "^db[0-3]\\..*"))
      .select(
        col("topic"),
        when(col("op") === ChangeOp.Delete, col("before"))
          .otherwise(col("after")).as("fields"),
        Transforms.bigqueryChangeType(col("op")).as("_CHANGE_TYPE"),
        col("db").as("tenant"))
  }

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
    }),

    // F1: regex stream filter on "{db}.{table}"
    // (reference/src/main.rs:220,260-262).
    "q_cdc_regex_filter" -> ((s, dir) => {
      Filters.regexFilter(
          ChangeSource.fromEvents(T(s, dir, "events")),
          """^db[0-2]\.(users|orders)$""")
        .select(col("event_id"), col("db"), col("table"))
    }),

    // T3: dynamic topic routing (reference/src/main.rs:424-434,
    // reference/test.rhai:46-48) + per-topic fan-out counts.
    "q_cdc_topic_route" -> ((s, dir) => {
      Routing.withTopic(ChangeSource.fromEvents(T(s, dir, "events")))
        .groupBy("topic").agg(count(lit(1)).cast("long").as("n"))
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
    }),

    // T1: the general script host — a USER-SUPPLIED script (a Spark
    // SQL expression string, the Rhai analog) routed through the
    // Transform trait, flattened to scalars for the oracle compare.
    // The script below is the kind of reshaping test.rhai ships:
    // topic from db.table, BigQuery-style change type, payload pick.
    "q_cdc_script" -> ((s, dir) => {
      val changes = ChangeSource.fromEvents(T(s, dir, "events"))
      val script = Transforms.SqlScript(
        """named_struct(
          |  'topic', concat(db, '.', `table`),
          |  'change_type',
          |    CASE WHEN op = 'Delete' THEN 'DELETE' ELSE 'UPSERT' END,
          |  'tenant', db,
          |  'at_ms', unix_millis(ts),
          |  'payload', coalesce(
          |    CASE WHEN op = 'Delete' THEN before ELSE after END, '{}'))
          |""".stripMargin)
      changes.select(col("event_id"), script(changes).as("p"))
        .select(col("event_id"), col("p.*"))
    }),

    // S5/S6: snapshot (backfill) source with projection pushdown —
    // full-table partitioned scan, the scale path
    // (reference/src/main.rs:305-387,326,331).
    "q_cdc_backfill" -> ((s, dir) => {
      Backfill.snapshot(T(s, dir, "customer"), "db0", "customer",
          "c_custkey", Seq("c_custkey", "c_name", "c_acctbal"))
    }),

    // F2/O1: one keyset page — `pkey > last ORDER BY pkey LIMIT n`
    // (reference/src/main.rs:325-349), batch size 1000
    // (reference/src/main.rs:42-43).
    "q_cdc_backfill_page" -> ((s, dir) => {
      Backfill.page(
          Backfill.snapshot(T(s, dir, "customer"), "db0", "customer",
            "c_custkey", Seq("c_custkey", "c_name", "c_acctbal")),
          "c_custkey", lastKey = 100, batch = 1000)
    }),

    // M1/M2: backfill ⊎ live-change LWW merge
    // (reference/src/main.rs:71-121) — live events patch a customer
    // snapshot; Delete tombstones win over Backfill.
    "q_cdc_lww_merge" -> ((s, dir) => {
      val bf = T(s, dir, "customer").select(
        col("c_custkey").cast("string").as("key"),
        lit(ChangeOp.Backfill).as("op"),
        col("c_acctbal").as("bal"),
        lit(Backfill.PlaceholderTs).as("ts_sec"),
        lit(-1L).as("seq"),
        col("c_custkey").as("custkey"))
      val ev = T(s, dir, "events")
      val live = ev.select(
        (col("user_id") % 150 + 1).cast("string").as("key"),
        ChangeSource.opCol.as("op"),
        col("value").as("bal"),
        col("ts").cast("long").as("ts_sec"),
        col("event_id").as("seq"),
        (col("user_id") % 150 + 1).as("custkey"))
      Merge.lww(bf, live)
        .select(col("custkey"), col("op"), col("bal"), col("ts_sec"),
          when(col("precedence") === 1, "live").otherwise("backfill").as("src"))
    }),

    // M1/M2 STRICT PARITY: the reference's literal pairwise
    // `update_with` zip (reference/src/main.rs:71-121) — including its
    // race bugs (non-matching live change dropped, Delete never
    // matches so backfill resurrects the key) — proving the documented
    // divergence of q_cdc_lww_merge against actual behavior.
    "q_cdc_merge_strict" -> ((s, dir) => {
      val bf = T(s, dir, "customer").select(
        col("c_custkey").as("ord"),
        lit("db0").as("db"), lit("customer").as("table"),
        col("c_custkey").cast("long").as("key"),
        lit(ChangeOp.Backfill).as("op"),
        col("c_acctbal").as("bal"))
      val live = T(s, dir, "events").select(
        col("event_id").as("ord"),
        ChangeSource.dbCol.as("db"), lit("customer").as("table"),
        (col("user_id") % 150 + 1).cast("long").as("key"),
        ChangeSource.opCol.as("op"),
        col("value").as("bal"))
      Merge.strictPairwise(bf, live)
    }),

    // X145 CDC end-to-end composite (VERDICT r12 missing #2): the
    // reference's main() as ONE oracle-gated composition
    // (reference/src/main.rs:123-191): decode (S4) → regex filter
    // (F1) → backfill ⊎ live LWW merge (M1/M2) → Debezium op +
    // BigQuery change type (T4/T5) → topic routing (T3) — each stage
    // the SAME fragment its per-stage gate proves, so cross-stage
    // contract drift breaks this hash the way q_pipe_curate breaks
    // for the curation recipe.
    "q_pipe_cdc" -> ((s, dir) => {
      val bf = Backfill.snapshot(T(s, dir, "customer"), "db0", "customer",
          "c_custkey", Seq("c_custkey", "c_acctbal"))
        .select(col("c_custkey").cast("string").as("key"),
          col("op"), col("db"), col("table"), col("ts_sec"),
          lit(-1L).as("seq"), col("c_acctbal").as("bal"),
          lit(null).cast("string").as("payload"))
      val live = Filters.regexFilter(
          ChangeSource.fromEvents(T(s, dir, "events")),
          """^db[0-2]\.(users|orders)$""")
        .select((col("event_id") % 150 + 1).cast("string").as("key"),
          col("op"), col("db"), col("table"),
          col("ts").cast("long").as("ts_sec"),
          col("event_id").as("seq"),
          lit(null).cast("double").as("bal"),
          col("after").as("payload"))
      Routing.withTopic(Merge.lww(bf, live))
        .select(col("key").cast("long").as("custkey"),
          col("topic"),
          Transforms.debeziumOp(col("op")).as("payload_op"),
          Transforms.bigqueryChangeType(col("op")).as("_CHANGE_TYPE"),
          col("ts_sec"),
          when(col("precedence") === 1, "live").otherwise("backfill")
            .as("src"),
          col("bal"), col("payload"))
    }),

    // §2.6: the MySQL wire-value → string type-mapping library
    // (reference/src/main.rs:442-507): DATE/DATETIME(+micros)
    // formatting, signed 3-digit-hour TIME, uppercase-hex bytes, and
    // u64 (BIGINT UNSIGNED, main.rs:454) → Decimal(20,0)-then-string
    // incl. the high-bit reinterpret path (odd ids → negative raws).
    "q_cdc_typemap" -> ((s, dir) => {
      val ev = T(s, dir, "events")
      val secs = col("event_id") % 500000 - 250000
      val rawU = when(col("event_id") % 2 === 0, col("event_id") * 123456789L)
        .otherwise(-(col("event_id") * 987654321L) - 1)
      ev.select(
          col("event_id"),
          TypeMap.mysqlDate(col("ts")).as("my_date"),
          TypeMap.mysqlDateTime(col("ts")).as("my_dt"),
          TypeMap.mysqlDateTimeMicros(col("ts")).as("my_dt_us"),
          TypeMap.mysqlTime(secs).as("my_time"),
          TypeMap.mysqlTimeMicros(secs, col("event_id") % 1000000).as("my_time_us"),
          TypeMap.bytesHex(col("props")).as("my_hex"),
          TypeMap.mysqlUnsignedBigInt(rawU).as("my_u64"))
    }),

    // A1: per-replica binlog resume offset — max(4, pos) guard +
    // per-server upsert (reference/src/main.rs:204-218,240-254).
    "q_cdc_offsets" -> ((s, dir) => {
      Offsets.logPos(
          ChangeSource.fromEvents(T(s, dir, "events")).withColumn(
            "event_id", col("event_id")))
    }),

    // A2/A3: backfill job-queue status + last-key extraction
    // (reference/src/main.rs:340-367). The queue is seeded with one
    // job ('db9'.users) whose relation never produces rows, so the
    // todo→done transition is actually exercised: it stays 'todo'.
    "q_cdc_jobqueue" -> ((s, dir) => {
      val ch = ChangeSource.fromEvents(T(s, dir, "events"))
      val jobs = ch.select(col("db"), col("table").as("relation")).distinct()
        .unionByName(s.range(1)
          .select(lit("db9").as("db"), lit("users").as("relation")))
      Offsets.jobQueue(ch, jobs)
        .select(col("db"), col("relation"), col("position"),
          col("n_rows"), col("status"))
    }),

    // Event-time tumbling-window change rates — the batch twin of
    // streaming.Pipeline.windowedCounts (same groupBy(window(...))
    // plan; streaming adds only the watermark).
    "q_cdc_windowed" -> ((s, dir) => {
      ChangeSource.fromEvents(T(s, dir, "events"))
        .groupBy(window(col("ts"), "1 hour"), col("db"), col("table"))
        .agg(count(lit(1)).cast("long").as("n_changes"))
        .select(
          unix_timestamp(col("window.start")).as("win_start"),
          col("db"), col("table"), col("n_changes"))
    }),

    // Event-time sessionization (gap 30 min) — batch twin of
    // streaming.Pipeline.sessionizedCounts (same session_window
    // groupBy; streaming adds only the watermark). Bounds are epoch
    // MICROS: Spark session end = last event + gap.
    "q_cdc_sessions" -> ((s, dir) =>
      ChangeSource.fromEvents(T(s, dir, "events"))
        .groupBy(col("db"), col("table"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).cast("long").as("n_changes"))
        .select(col("db"), col("table"),
          unix_micros(col("w.start")).as("sess_start_us"),
          unix_micros(col("w.end")).as("sess_end_us"),
          col("n_changes"))
        ),

    // Scale-safe twin of q_cdc_sessions: two-phase sessionization
    // (ops.Sessions) — bucket-local sessions at keys×buckets
    // parallelism, then a boundary merge over sessions only. Breaks
    // the 12-key parallelism cap of the one-shot session window;
    // output proven identical via the same oracle.
    "q_cdc_sessions2" -> ((s, dir) =>
      Sessions.twoPhase(
        ChangeSource.fromEvents(T(s, dir, "events"))
          .select(col("db"), col("table"), unix_micros(col("ts")).as("ts_us")),
        Seq("db", "table"), "ts_us",
        gapUs = 30L * 60 * 1000000, bucketUs = 2L * 3600 * 1000000)),

    // Window-function class: per-target inter-arrival gap via lag
    // (deterministic tie-break on the unique event_id).
    "q_cdc_lag" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("db"), col("table"))
        .orderBy(col("ts_us"), col("event_id"))
      ChangeSource.fromEvents(T(s, dir, "events"))
        .select(col("event_id"), col("db"), col("table"),
          unix_micros(col("ts")).as("ts_us"))
        .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
    }),

    // SCD Type-2 dimension: every (db, table, user) change version
    // with its half-open validity interval; deletes close their
    // predecessor's interval but materialize no version. The
    // warehouse-dimension / point-in-time-feature product of the
    // change stream (cdc.Scd; StateTable keeps only the latest).
    "q_cdc_scd2" -> ((s, dir) => {
      val ch = T(s, dir, "events").select(
        ChangeSource.dbCol.as("db"), ChangeSource.tableCol.as("table"),
        col("user_id"), ChangeSource.opCol.as("op"), col("props"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      Scd.type2(ch, Seq("db", "table", "user_id"), "ts_us", "event_id",
        "props", "op")
    }),

    // Multi-way join + aggregation over the TPC-H-ish tables: revenue
    // per nation. Dims broadcast explicitly; money in integer cents
    // (round once per row, then BIGINT arithmetic) so the distributed
    // sum is associative and bit-identical to the single-node oracle.
    // X101 key-skew profile: the salting/AQE pre-flight — top-20
    // heaviest user_ids of the events stream (the sessions/retention
    // family's shuffle key) with integer-micros shares and global
    // context counts. Partial-agg + TakeOrdered + broadcast totals;
    // never a global sort.
    "q_diag_skew" -> ((s, dir) =>
      Diagnostics.keyProfile(T(s, dir, "events"), "user_id", topN = 20)),

    "q_olap_revenue" -> ((s, dir) => {
      val cents = round(col("l_extendedprice") * 100).cast("long")
      val discPct = round(col("l_discount") * 100).cast("long")
      T(s, dir, "lineitem")
        .join(T(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(T(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(T(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(cents * (lit(100L) - discPct)).as("revenue_c100"),
          count(lit(1)).as("n_items"))
    }),

    // Weekly cohort retention matrix over the event stream — the
    // warehouse query the CDC pipeline feeds. Integer week buckets
    // (epoch-micro div), two partial-aggregated shuffles, no join
    // (ops.Events).
    "q_olap_retention" -> ((s, dir) =>
      Events.retention(T(s, dir, "events"), "user_id", "ts")),

    // Strictly-ordered 3-stage conversion funnel (signup → click →
    // purchase, first-touch minima). One shuffle per stage, all on
    // the user key; step conversion in integer micros.
    "q_olap_funnel" -> ((s, dir) =>
      Events.funnel(T(s, dir, "events"), "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))),

    // Hierarchical rollup of change counts (grouping-sets class,
    // absent from the reference per SURVEY §2.9 — free from Spark).
    "q_cdc_rollup" -> ((s, dir) =>
      ChangeSource.fromEvents(T(s, dir, "events"))
        .rollup(col("db"), col("table"), col("op"))
        .agg(count(lit(1)).as("n_changes"))
        ),

    // Exact distinct cardinality per routing target.
    "q_cdc_distinct_users" -> ((s, dir) =>
      T(s, dir, "events")
        .select(ChangeSource.dbCol.as("db"), ChangeSource.tableCol.as("table"),
          col("user_id"))
        .groupBy(col("db"), col("table"))
        .agg(count_distinct(col("user_id")).as("n_users"))
        ),

    // Sketch class: HLL distinct + approximate quantiles. The sketch
    // VALUES are by design not bit-reproducible in another engine, so
    // the oracle-checked output carries (a) the exact group keys and
    // counts and (b) integer VERDICTS that the in-plan sketches landed
    // inside their published error bounds vs the exact answers
    // computed in the same aggregation (HLL rsd 5% → 15% + small-N
    // slack; percentile_approx accuracy 1000 → rank error n/1000,
    // banded far wider at [p90, max]). The oracle's verdict columns
    // are constant 1 — a sketch outside its bound hash-mismatches.
    // Tight-band assertions live in OpsSpec (large synthetic n).
    // At 100 TB the sketches replace the exact twins
    // (q_cdc_distinct_users / sorted percentiles): fixed-size state,
    // one shuffle, mergeable partials.
    "q_cdc_approx_stats" -> ((s, dir) =>
      T(s, dir, "events")
        .select(ChangeSource.dbCol.as("db"), ChangeSource.tableCol.as("table"),
          col("user_id"), col("value"))
        .groupBy(col("db"), col("table"))
        .agg(count(lit(1)).as("n_rows"),
          count_distinct(col("user_id")).as("n_users"),
          approx_count_distinct(col("user_id")).as("hll"),
          percentile_approx(col("value"), lit(0.95), lit(1000)).as("p95a"),
          expr("percentile(value, 0.90D)").as("p90x"),
          max(col("value")).as("vmax"))
        .select(col("db"), col("table"), col("n_rows"), col("n_users"),
          (abs(col("hll") - col("n_users")).cast("double")
            <= greatest(lit(5.0), col("n_users") * 0.15))
            .cast("long").as("hll_within_tol"),
          (col("p95a") >= col("p90x") && col("p95a") <= col("vmax"))
            .cast("long").as("p95_within_band"))),

    // Set difference: users only ever backfilled, never deleted.
    "q_cdc_except" -> ((s, dir) => {
      val e = T(s, dir, "events")
      e.filter(ChangeSource.opCol === ChangeOp.Backfill).select(col("user_id"))
        .except(
          e.filter(ChangeSource.opCol === ChangeOp.Delete).select(col("user_id")))
    }),

    // As-of join (union + one window pass; ops.AsOf): each change
    // event attached to the start of its containing session — the
    // temporal-join operator Spark lacks natively, vs DuckDB's native
    // ASOF JOIN as the oracle.
    "q_cdc_asof" -> ((s, dir) => {
      val (ch, sessions) = asofInputs(s, dir)
      AsOf.joinTs(ch, sessions, Seq("db", "table"), "ts_us")
        .select(col("event_id"), col("db"), col("table"), col("ts_us"),
          col("asof_ts").as("sess_start_us"))
    }),

    // Scale-safe twin of q_cdc_asof (ops.AsOf.joinTsTwoPhase):
    // bucket-local mark carry at keys×buckets parallelism + running
    // carry-in over the bucket summary — breaks the 12-key cap, same
    // oracle.
    "q_cdc_asof2" -> ((s, dir) => {
      val (ch, sessions) = asofInputs(s, dir)
      AsOf.joinTsTwoPhase(ch, sessions, Seq("db", "table"), "ts_us",
          bucketWidth = 2L * 3600 * 1000000)
        .select(col("event_id"), col("db"), col("table"), col("ts_us"),
          col("asof_ts").as("sess_start_us"))
    }),

    // ---- LLM-data-pipeline extensions (builder brief; SURVEY §7.4) ----

    // Text analysis: token/piece counts, language ID, quality score,
    // md5 + rolling fingerprints — one codegen'd narrow pass.
    "q_text_stats" -> ((s, dir) => {
      val t = col("text")
      T(s, dir, "documents").select(
          col("doc_id"),
          TextAnalysis.tokenCount(t).as("n_tokens"),
          TextAnalysis.pieceCount(t).as("n_pieces"),
          TextAnalysis.langId(t).as("lang_pred"),
          TextAnalysis.qualityMicros(t).as("quality_micros"),
          TextAnalysis.md5Fingerprint(t).as("fp_md5"),
          TextAnalysis.rollingFingerprint(t).as("fp_roll"))
    }),

    // Repetition signals (Gopher-style quality gates): top-token
    // share, duplicate-token fraction, top-bigram share per doc —
    // partial-agg shuffles over gram COUNTS, never gram instances.
    "q_text_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionStats(T(s, dir, "documents"), "doc_id", "text")),

    // In-row twin: the same signals from ONE compiled pass per doc
    // (native rep_stats) — zero shuffle, streaming-compatible; shares
    // q_text_repetition's oracle (plan-shape equivalence pair).
    "q_text_repetition2" -> ((s, dir) =>
      TextAnalysis.repetitionStatsRow(T(s, dir, "documents"), "doc_id", "text")),

    // Vocabulary heavy hitters: top-50 tokens by document frequency,
    // deterministic tie-break. Partial agg map-side, then
    // TakeOrderedAndProject — the driver never materializes the full
    // sorted vocab.
    "q_text_vocab" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("tok")).limit(50)),

    // X119 Misra-Gries heavy-hitter summary: per-source vocabulary
    // collapsed to k=10 counters by the mergeable-summaries compress
    // (subtract the (k+1)-th largest, drop the zeros) — est <= true,
    // true - est <= n/(k+1), any token above that share guaranteed
    // present. Deterministic threshold (a VALUE at the rank-(k+1)
    // row), hence oracle-exact; the streaming TopKStore merges the
    // same compress across batches/runs.
    "q_text_vocab_mg" -> ((s, dir) =>
      TextAnalysis.mgSummary(T(s, dir, "documents"), "text", "source",
        k = 10)),

    // X135 PMI collocations: top-40 adjacent bigrams by pointwise
    // mutual information at min count 3 — multi-word units the
    // heavy-hitter counts can't see. Count digests only on the
    // shuffles; global top-m is TakeOrderedAndProject.
    "q_text_pmi" -> ((s, dir) =>
      TextAnalysis.pmiCollocations(T(s, dir, "documents"), "text",
        minCount = 3, topM = 40)),

    // X136 vocabulary coverage curve: token-occurrence coverage of
    // the top {64, 256, 1024, 4096} types — the OOV-rate-vs-vocab-
    // budget curve, priced before training a tokenizer.
    "q_text_vocab_coverage" -> ((s, dir) =>
      TextAnalysis.vocabCoverage(T(s, dir, "documents"), "text",
        sizes = Seq(64, 256, 1024, 4096))),

    // X137 Zipf rank-frequency fit over the top 256 ranks: the
    // one-row natural-text diagnostic (slope near -1 for natural
    // language; templated corpora flatten toward 0).
    "q_text_zipf" -> ((s, dir) =>
      TextAnalysis.zipfFit(T(s, dir, "documents"), "text", topR = 256)),

    // X139 Unicode-script profile: per-doc dominant writing system
    // (fixed-order first-max tie-break) rolled up to (script, n_docs,
    // mean dominant share) — the mixed-script/mojibake tripwire.
    "q_text_scripts" -> ((s, dir) =>
      TextAnalysis.scriptProfile(T(s, dir, "documents"), "doc_id",
        "text")),

    // X140 frozen-vocab OOV scoring (freeze-on-self: the top-512
    // vocab is trained in-plan, the oracle-provable twin; the frozen
    // serve is the streaming gate Pipeline.oovGate).
    "q_text_oov" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      TextAnalysis.oovScore(docs, "doc_id", "text",
        TextAnalysis.freezeVocab(docs, "text", s = 512))
    }),

    // BPE vocabulary induction (X92): 12 merge rounds trained on the
    // top-2000 word histogram — the tokenizer-training step. The
    // corpus-sized work is ONE histogram pass; every round then
    // iterates on the bounded (word, count) digest.
    "q_text_bpe" -> ((s, dir) =>
      Bpe.merges(T(s, dir, "documents"), "text", rounds = 12,
        maxWords = 2000)),

    // The APPLY side of X92: the corpus re-tokenized with the 12
    // trained merges — top-30 subword pieces by count-weighted
    // frequency, the vocab-coverage quantity a tokenizer decision
    // reads.
    "q_text_bpe_encode" -> ((s, dir) =>
      Bpe.pieceFrequencies(T(s, dir, "documents"), "text", rounds = 12,
        maxWords = 2000, topK = 30)),

    // Corpus drift monitoring (X93): per-source Jensen–Shannon
    // divergence of the token distribution vs the whole corpus over
    // the top-500 token support — the ingestion-health gauge (a
    // source whose JS jumps changed its content mix).
    "q_text_drift" -> ((s, dir) =>
      Drift.tokenJsDrift(T(s, dir, "documents"), "text", "source",
        maxVocab = 500)),

    // X118 length-distribution drift: the X93 JS gauge pointed at the
    // X113 length BINS instead of tokens — "did this crawl refresh
    // change document SHAPES?" (truncation bugs, boilerplate floods,
    // chunking changes move length mass before any token-level gauge
    // reacts). The bin domain is ~8·log2(maxLen) ≈ 100 values, so
    // maxVocab=256 makes the support FULL — this is exact JS over the
    // binned length distribution, not a top-N approximation.
    "q_diag_lendrift" -> ((s, dir) =>
      Drift.tokenJsDrift(
        T(s, dir, "documents").select(col("source"),
          Diagnostics.binId(TextAnalysis.tokenCount(col("text")))
            .cast("string").as("lenbin")),
        "lenbin", "source", maxVocab = 256)),

    // X133 embedding SNAPSHOT drift: per label, the cosine between
    // the two snapshots' centroids (fixture snapshots = even/odd
    // vec_ids) plus both counts — the re-embed/re-crawl regression
    // check a corpus owes its ANN/dedup consumers before frozen
    // centroids or persisted indexes are trusted against it.
    "q_diag_embdrift" -> ((s, dir) =>
      Diagnostics.embeddingSnapshotDrift(T(s, dir, "embeddings"),
        "embedding", "label", col("vec_id") % 2 === 0)),

    // X143 Count-Min sketch: depth x width counter matrix over the
    // token stream, probed at the exact top-20 tokens — the measured
    // overestimate profile (est >= true structurally; MG under-
    // estimates heavy hitters, CMS over-estimates any key).
    "q_diag_cms" -> ((s, dir) =>
      Diagnostics.cmsEstimates(T(s, dir, "documents"), "text",
        depth = 4, width = 512, topN = 20)),

    // The embedding-space companion of X93: per-label centroid cosine
    // vs the corpus centroid (integer-exact quantized means — no
    // transcendentals). Catches semantic drift the token gauge can't.
    "q_sim_drift" -> ((s, dir) =>
      Drift.embeddingDrift(T(s, dir, "embeddings"), "vec_id",
        "embedding", "label")),

    // The FROZEN twins scored on the freeze's own corpus — each shares
    // its in-plan gauge's oracle verbatim, so the freeze/serve split
    // is provably output-invariant through the driver gate (the
    // build/serve pattern the index and graph families use).
    "q_text_drift_frozen" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      Drift.tokenJsFrozen(docs, "text", "source",
        Drift.freezeDistribution(docs, "text", maxVocab = 500))
    }),
    "q_sim_drift_frozen" -> ((s, dir) => {
      val embs = T(s, dir, "embeddings")
      Drift.embeddingDriftFrozen(embs, "embedding", "label",
        Drift.freezeCentroid(embs, "embedding"))
    }),

    // The monitors in their REAL two-snapshot shape, oracle-gated:
    // reference = the even-id half (last snapshot), target = the odd
    // half (this snapshot) — the actual drift number an ingestion
    // alert fires on, end-to-end against the oracle rather than
    // frozen-on-self.
    "q_text_drift_shift" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      Drift.tokenJsFrozen(docs.filter(col("doc_id") % 2 === 1),
        "text", "source",
        Drift.freezeDistribution(docs.filter(col("doc_id") % 2 === 0),
          "text", maxVocab = 500))
    }),
    "q_sim_drift_shift" -> ((s, dir) => {
      val embs = T(s, dir, "embeddings")
      Drift.embeddingDriftFrozen(embs.filter(col("vec_id") % 2 === 1),
        "embedding", "label",
        Drift.freezeCentroid(embs.filter(col("vec_id") % 2 === 0),
          "embedding"))
    }),

    // Composite curation pipeline — the end-to-end point of the
    // extension surface: quality gate + language ID + exact-dup
    // representative selection, in ONE shuffle (window on the
    // fingerprint; no join back to the corpus).
    "q_curate" -> ((s, dir) => {
      val t = col("text")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("fp")).orderBy(col("doc_id"))
      T(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.md5Fingerprint(t).as("fp"),
          TextAnalysis.langId(t).as("lang_pred"),
          TextAnalysis.qualityMicros(t).as("quality_micros"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("quality_micros") >= 550000)
        .select(col("doc_id"), col("lang_pred"), col("quality_micros"))
    }),

    // Exact dedup: hash-groupBy on the content fingerprint.
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exact(T(s, dir, "documents"), "doc_id", "text")),

    // MinHash(32) + LSH(8 bands × 4 rows) near-dup pairs, exact-Jaccard
    // verified at ≥ 0.2 on 3-word shingles.
    "q_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashPairs(T(s, dir, "documents"), "doc_id", "text",
        k = 3, numHashes = 32, bands = 8, rows = 4, threshold = 0.2)
        ),

    // X138 measured LSH recall curve: truth (exact posting-join
    // Jaccard) vs the banding's verified pairs, per true-Jaccard
    // decile — the on-this-corpus version of the 1-(1-s^r)^b S-curve
    // a (bands x rows) choice is priced from.
    "q_dedup_minhash_recall" -> ((s, dir) =>
      Dedup.minhashLshRecall(T(s, dir, "documents"), "doc_id", "text",
        k = 3, numHashes = 32, bands = 8, rows = 4, threshold = 0.2)),

    // X146 fixed-budget sampled recall harness — the SCALE default
    // for X138: truth pass on a deterministic salted-hash doc sample
    // whose RATE derives from the corpus size (target 250 docs), so
    // measurement cost is flat in corpus size (the unsampled truth
    // pass rode the corpus to a 31.7x sf1.0 ratio); per-decile recall
    // on the sample is an unbiased estimator (pairs survive at rate^2
    // independent of their Jaccard).
    "q_dedup_minhash_recall_sampled" -> ((s, dir) =>
      Dedup.minhashLshRecallSampled(T(s, dir, "documents"), "doc_id",
        "text", k = 3, numHashes = 32, bands = 8, rows = 4,
        threshold = 0.2, targetDocs = 250)),

    // X142 curation-recipe composite: quality gate -> exact-dup rep
    // (normalized key) -> near-dup cluster rep (MinHash+CC) -> PII
    // redact -> clean fingerprint, in ONE query — proves the
    // individually-proven stages COMPOSE (the oracle runs the same
    // chain nested).
    "q_pipe_curate" -> ((s, dir) =>
      Curation.curationPipeline(T(s, dir, "documents"), "doc_id",
        "text", "source", minQualityMicros = 550000, k = 3,
        numHashes = 32, bands = 8, rows = 4, threshold = 0.5)),

    // X148 curation provenance: every input doc's (outcome, keeper)
    // verdict from the SAME stage fragments as q_pipe_curate — the
    // "why did my doc disappear and who absorbed it" audit a deployed
    // recipe owes its operators; outcomes partition the input.
    "q_pipe_curate_audit" -> ((s, dir) =>
      Curation.curationAudit(T(s, dir, "documents"), "doc_id",
        "text", "source", minQualityMicros = 550000, k = 3,
        numHashes = 32, bands = 8, rows = 4, threshold = 0.5)),

    // SimHash(60-bit) near-dup pairs, hamming ≤ 5 via the full-recall
    // pigeonhole chunk join (6 chunks of 10 bits).
    "q_dedup_simhash" -> ((s, dir) =>
      Dedup.simhashPairs(T(s, dir, "documents"), "doc_id", "text",
        chunks = 6, maxDist = 5)
        ),

    // Exact global 3-gram Jaccard near-dup via posting-list join.
    "q_dedup_ngram" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(T(s, dir, "documents"), "doc_id", "text",
        k = 3, threshold = 0.2)
        ),

    // Edit-distance-verified near dups: X4's posting-join candidates
    // (+ the exact |len1-len2| <= d pruning), bounded-Levenshtein
    // verify. Character-level ground truth vs X4's bag overlap.
    "q_dedup_edit" -> ((s, dir) =>
      Dedup.editPairs(T(s, dir, "documents"), "doc_id", "text",
        k = 3, maxDist = 20)),

    // X4 skew-hardened: shingles in >= 1% of docs take an explicitly
    // salted posting join — the AQE-independent 100 TB path for
    // hot-shingle skew (151 hot shingles at sf0.01, so the gate
    // exercises the hot path). Same oracle as q_dedup_ngram: the
    // salting is output-invariant by construction.
    "q_dedup_ngram_salted" -> ((s, dir) =>
      Dedup.ngramJaccardPairsSalted(T(s, dir, "documents"), "doc_id", "text",
        k = 3, threshold = 0.2, hotFraction = 0.01, salts = 4)),

    // Prefix-filtered exact Jaccard (All-Pairs): provably identical
    // output to full pairwise at the threshold, posting only each
    // doc's rare-first prefix — the 100 TB refinement.
    "q_dedup_ngram_prefix" -> ((s, dir) =>
      Dedup.ngramJaccardPairsPrefix(T(s, dir, "documents"), "doc_id", "text",
        k = 3, threshold = 0.8)
        ),

    // Duplicate clusters: connected components (min-label propagation)
    // over the MinHash near-dup pairs → one representative per cluster.
    // Exact shared-substring spans (Lee-et-al substring dedup):
    // positional 8-gram posting join, df-capped, diagonal runs merged
    // into maximal spans of >= 16 verbatim tokens.
    "q_dedup_spans" -> ((s, dir) =>
      Dedup.substringSpans(T(s, dir, "documents"), "doc_id", "text",
        k = 8, minTokens = 16, maxDf = 64)),

    // X99 content-defined chunking: gear-style cuts where the 4-gram
    // hash ≡ 0 mod 8 (expected chunk ≈ 11 tokens); the chunk table is
    // ONE narrow in-row pass (native CdcChunks) + explode — zero
    // shuffle. Proves the boundary rule + fingerprints byte-identical
    // against the oracle's exploded positional-gram formulation.
    "q_dedup_cchunks" -> ((s, dir) =>
      Dedup.contentChunks(T(s, dir, "documents"), "doc_id", "text",
        k = 4, divisor = 8L)),

    // X99 per-doc shift-robust duplication gauge: fraction of each
    // doc's tokens inside chunks whose fingerprint (>= 4 tokens) is
    // claimed by 2+ docs — the cheap triage ahead of the spans pair
    // join (fp partial-agg + fp join + doc_id partial-agg, all longs).
    "q_dedup_cchunks_frac" -> ((s, dir) =>
      Dedup.chunkDupFraction(T(s, dir, "documents"), "doc_id", "text",
        k = 4, divisor = 8L, minDupTokens = 4)),

    // X100 first-wins chunk admission (batch twin of the streaming
    // ChunkDupStore): the lowest doc id claims each >= 4-token chunk
    // fingerprint; a doc is kept iff tokens claimed by lower ids stay
    // under 50%. Order-free (min over ids) — the rule the streaming
    // store replays identically.
    "q_dedup_cchunks_gate" -> ((s, dir) =>
      Dedup.chunkDupGate(T(s, dir, "documents"), "doc_id", "text",
        k = 4, divisor = 8L, minDupTokens = 4, maxDupFracMicros = 500000L)),

    "q_dedup_clusters" -> ((s, dir) =>
      Dedup.dupClusters(
        Dedup.minhashPairs(T(s, dir, "documents"), "doc_id", "text",
          k = 3, numHashes = 32, bands = 8, rows = 4, threshold = 0.2))
        ),

    // Quality-aware dedup survivors: highest-quality member per
    // near-dup cluster (ties: lower id) + all untouched docs, each
    // carrying its dropped-copy count — the practical dedup output.
    "q_dedup_keepbest" -> ((s, dir) =>
      Dedup.keepBestQuality(T(s, dir, "documents"), "doc_id", "text",
        Dedup.minhashPairs(T(s, dir, "documents"), "doc_id", "text",
          k = 3, numHashes = 32, bands = 8, rows = 4, threshold = 0.2))),

    // Embedding-cosine near-dup, IVF-style blocked by cluster label.
    "q_dedup_embed" -> ((s, dir) =>
      Dedup.cosinePairs(T(s, dir, "embeddings"), "vec_id", "embedding",
        "label", threshold = 0.35)
        ),

    // Embedding near-dup CLUSTERS: the X20 star-contraction over the
    // cosine pair graph — every dedup variant's pairwise output feeds
    // the same component step.
    "q_dedup_embed_clusters" -> ((s, dir) =>
      Dedup.dupClusters(
        Dedup.cosinePairs(T(s, dir, "embeddings"), "vec_id", "embedding",
          "label", threshold = 0.35))),

    // Brute-force cosine top-5 for 8 broadcast query vectors.
    "q_sim_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(T(s, dir, "embeddings"), "vec_id",
        "embedding", col("vec_id") < 8, k = 5)
        ),

    // Scalar quantization (SQ8): 1 byte/dim codes against per-dim
    // corpus ranges; brute-force integer code-dot scan + exact rerank
    // of the top-40 — the 4×-memory-cut middle ground between full
    // vectors and PQ's 16×.
    "q_sim_sq" -> ((s, dir) =>
      Sq.topK(T(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 8, k = 5, rerank = 40)),

    // SQ quality: recall@5 vs the brute-force truth.
    "q_sim_sq_recall" -> ((s, dir) =>
      Sq.recall(T(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 8, k = 5, rerank = 40)),

    // X141 SQ4 (nibble) tier: 16-level scalar quantization — half
    // SQ8's bytes, completing the 32->8->4->1 bit representation
    // ladder; wider rerank absorbs the coarser candidate cut.
    "q_sim_sq4" -> ((s, dir) =>
      Sq.topK(T(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 8, k = 5, rerank = 80, levels = 16)),

    // X141 quality half: SQ4 recall@5 vs the brute-force truth at the
    // same rerank — prices the extra 2x byte cut in measured recall.
    "q_sim_sq4_recall" -> ((s, dir) =>
      Sq.recall(T(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 8, k = 5, rerank = 80, levels = 16)),

    // Binary quantization (sign bits): the 64-dim vector packs into
    // ONE long, candidates cut by xor+popcount Hamming — the 32×
    // coarsest ANN tier (flat 1× / SQ8 4× / PQ 16× / BQ 32×), exact
    // rerank like the rest of the family.
    "q_sim_bq" -> ((s, dir) =>
      Bq.topK(T(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 8, k = 5, rerank = 160)),

    // BQ quality: recall@5 vs the brute-force truth. Measured at
    // sf0.01: 0.625 / 0.80 / 0.975 @ rerank 40 / 80 / 160 — BQ's
    // 1-bit cut needs a wider rerank than SQ/PQ for the same
    // quality, and mean-centering the signs was measured WORSE
    // (0.575 @ 40: the data is already near-centered) — so raw
    // signs + rerank=160 is the calibrated config.
    "q_sim_bq_recall" -> ((s, dir) =>
      Bq.recall(T(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 8, k = 5, rerank = 160)),

    // Random-hyperplane LSH near-neighbor pairs: 4 tables × 4 sign
    // bits, candidates verified at cosine ≥ 0.4.
    "q_sim_rplsh" -> ((s, dir) =>
      Similarity.rpLshPairs(T(s, dir, "embeddings"), "vec_id", "embedding",
        tables = 4, bits = 4, dim = 64, threshold = 0.4)
        ),

    // Product-quantization ANN: 16 subspaces × 32 L2-trained centroids
    // (16 bytes/vector), ADC scoring through micro-quantized lookup
    // tables, exact rerank of the top-40. The memory-side scale path
    // complementing IVF's compute-side one.
    "q_sim_pq" -> ((s, dir) =>
      Pq.topK(T(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 8, k = 5, m = 16, ksub = 32, iters = 2,
        rerank = 40)),

    // PQ quality: recall@5 vs the brute-force truth (measured ~0.98 at
    // sf0.01 with rerank=40).
    "q_sim_pq_recall" -> ((s, dir) =>
      Pq.recall(T(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 8, k = 5, m = 16, ksub = 32, iters = 2,
        rerank = 40)),

    // IVF × PQ — the composed big-corpus layout: probe 4 of 10 trained
    // lists (multiple assignment 2), ADC-score only the probed
    // candidates from 16-byte codes, exact-rerank the top 40
    // (recall@5 ≈ 0.975 vs truth at sf0.01).
    "q_sim_ivfpq" -> ((s, dir) =>
      Pq.ivfPqTopK(T(s, dir, "embeddings"), "vec_id", "embedding",
        "label", col("vec_id") < 8, k = 5, nprobe = 4, itersIvf = 4,
        massign = 2, m = 16, ksub = 32, itersPq = 2, rerank = 40)),

    // IVF × SQ (the FAISS IVF_SQ8 shape): trained-IVF probing over
    // 1-byte SQ codes + exact rerank — 4× memory instead of PQ's 16×,
    // and no codebook training (ranges are one aggregation).
    "q_sim_ivfsq" -> ((s, dir) =>
      Sq.ivfSqTopK(T(s, dir, "embeddings"), "vec_id", "embedding",
        "label", col("vec_id") < 8, k = 5, nprobe = 4, itersIvf = 4,
        massign = 2, rerank = 40)),

    // X141's composed tier: IVF probing x SQ4 nibble codes (the
    // FAISS IVF_SQ4 shape) — probed-list candidates scored from
    // 4-bit reconstructions, wider rerank absorbing the coarser cut.
    "q_sim_ivfsq4" -> ((s, dir) =>
      Sq.ivfSqTopK(T(s, dir, "embeddings"), "vec_id", "embedding",
        "label", col("vec_id") < 8, k = 5, nprobe = 4, itersIvf = 4,
        massign = 2, rerank = 80, levels = 16)),

    // The persisted-index build/search split (ops.Index): the SAME
    // IVF×PQ search as q_sim_ivfpq, but served from a prebuilt
    // bucketed artifact — the query's returned plan contains NO
    // training stage (PlanSpec asserts it); build runs once in the
    // query's setup. Shares q_sim_ivfpq's oracle: the artifact stores
    // exactly the quantized values the in-plan query computes.
    "q_sim_index_search" -> ((s, dir) => {
      val embs = T(s, dir, "embeddings")
      Index.build(s, embs, "vec_id", "embedding", "label", "graft_idx",
        itersIvf = 4, massign = 2, m = 16, ksub = 32, itersPq = 2,
        nBuckets = 8)
      Index.search(s, "graft_idx", embs, "vec_id", "embedding",
        col("vec_id") < 8, k = 5, nprobe = 4, rerank = 40)
    }),

    // The SQ serving tier of the same artifact: probe + 1-byte SQ
    // reconstruction scoring + exact rerank — shares q_sim_ivfsq's
    // oracle (the artifact stores exactly the quantized values the
    // in-plan query computes).
    "q_sim_index_sq" -> ((s, dir) => {
      val embs = T(s, dir, "embeddings")
      if (!Index.exists(s, "graft_idx"))
        Index.build(s, embs, "vec_id", "embedding", "label", "graft_idx",
          itersIvf = 4, massign = 2, m = 16, ksub = 32, itersPq = 2,
          nBuckets = 8)
      Index.searchSq(s, "graft_idx", embs, "vec_id", "embedding",
        col("vec_id") < 8, k = 5, nprobe = 4, rerank = 40)
    }),

    // The serve-side steady state: the SAME search against an index
    // built earlier in the session (q_sim_index_search's; built here
    // only if this query runs first — self-contained either way). In
    // the bench this is the number the build/search split exists for:
    // pure probe+ADC+rerank, no training, no writes.
    "q_sim_index_search_only" -> ((s, dir) => {
      val embs = T(s, dir, "embeddings")
      if (!Index.exists(s, "graft_idx"))
        Index.build(s, embs, "vec_id", "embedding", "label", "graft_idx",
          itersIvf = 4, massign = 2, m = 16, ksub = 32, itersPq = 2,
          nBuckets = 8)
      Index.search(s, "graft_idx", embs, "vec_id", "embedding",
        col("vec_id") < 8, k = 5, nprobe = 4, rerank = 40)
    }),

    // FLAT serving over the same artifact: probe + exact cosine over
    // the probed lists, no PQ stage — the shape for corpora whose
    // vectors fit the IO budget. Shares the build with
    // q_sim_index_search; oracle = the trained-IVF top-k itself.
    "q_sim_index_flat" -> ((s, dir) => {
      val embs = T(s, dir, "embeddings")
      if (!Index.exists(s, "graft_idx"))
        Index.build(s, embs, "vec_id", "embedding", "label", "graft_idx",
          itersIvf = 4, massign = 2, m = 16, ksub = 32, itersPq = 2,
          nBuckets = 8)
      Index.searchFlat(s, "graft_idx", embs, "vec_id", "embedding",
        col("vec_id") < 8, k = 5, nprobe = 4)
    }),

    // The BQ serving tier of the same artifact: full 8-byte Hamming
    // sweep over the stored one-long sign codes + exact rerank — no
    // probe, no trained parameters; shares q_sim_bq's oracle (the
    // stored codes are exactly the in-plan pack).
    "q_sim_index_bq" -> ((s, dir) => {
      val embs = T(s, dir, "embeddings")
      if (!Index.exists(s, "graft_idx"))
        Index.build(s, embs, "vec_id", "embedding", "label", "graft_idx",
          itersIvf = 4, massign = 2, m = 16, ksub = 32, itersPq = 2,
          nBuckets = 8)
      Index.searchBq(s, "graft_idx", embs, "vec_id", "embedding",
        col("vec_id") < 8, k = 5, rerank = 160)
    }),

    // The maintenance delta, oracle-gated end-to-end: build the index
    // on the even half of the corpus, APPEND the odd half (encode-only,
    // fixed centroids — no retrain) as an atomically-committed
    // generation (hard-link mode; the only public append path), search
    // the union. The oracle trains its unrolled Lloyd rounds on the
    // even half only and assigns/encodes everything — exactly the
    // append semantics. q_sim_index_append_commit is the same delta
    // committed the object-store-safe manifest way.
    "q_sim_index_append" -> ((s, dir) => {
      val embs = T(s, dir, "embeddings")
      Index.build(s, embs.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", "label", "graft_idx2",
        itersIvf = 4, massign = 2, m = 16, ksub = 32, itersPq = 2,
        nBuckets = 8)
      Index.appendCommitted(s, "graft_idx2",
        embs.filter(col("vec_id") % 2 === 1), "vec_id", "embedding")
      Index.search(s, "graft_idx2", embs, "vec_id", "embedding",
        col("vec_id") < 8, k = 5, nprobe = 4, rerank = 40)
    }),

    // The takedown delta, oracle-gated end-to-end: build on the FULL
    // corpus, DELETE the odd half (encoded parts rewritten minus the
    // ids at the atomic generation commit; trained params untouched —
    // append's fixed-parameter contract in reverse), search. The
    // oracle trains on everything and restricts CANDIDATES to the
    // survivors — exactly the delete semantics.
    "q_sim_index_delete" -> ((s, dir) => {
      val embs = T(s, dir, "embeddings")
      Index.build(s, embs, "vec_id", "embedding", "label", "graft_idx4",
        itersIvf = 4, massign = 2, m = 16, ksub = 32, itersPq = 2,
        nBuckets = 8)
      Index.delete(s, "graft_idx4",
        embs.filter(col("vec_id") % 2 === 1).select(col("vec_id")),
        "vec_id")
      Index.search(s, "graft_idx4", embs, "vec_id", "embedding",
        col("vec_id") < 8, k = 5, nprobe = 4, rerank = 40)
    }),

    // The same maintenance delta committed the OBJECT-STORE-SAFE way:
    // the appended generation is one _manifest.json naming immutable
    // segment directories (no hard links — S3-style stores have
    // none), served through a union view. Same oracle as
    // q_sim_index_append: the commit mode cannot change results.
    "q_sim_index_append_commit" -> ((s, dir) => {
      val embs = T(s, dir, "embeddings")
      Index.build(s, embs.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", "label", "graft_idx3",
        itersIvf = 4, massign = 2, m = 16, ksub = 32, itersPq = 2,
        nBuckets = 8)
      Index.appendCommitted(s, "graft_idx3",
        embs.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
        manifestCommit = true)
      Index.search(s, "graft_idx3", embs, "vec_id", "embedding",
        col("vec_id") < 8, k = 5, nprobe = 4, rerank = 40)
    }),

    // RP-LSH quality: recall of the verified pair set vs the exact
    // pair truth for 1/2/4 tables of one nested plane family — the
    // tables×bits tuning curve, measured (mirror of q_sim_ivf_sweep).
    "q_sim_rplsh_recall" -> ((s, dir) =>
      Similarity.rpLshRecallSweep(T(s, dir, "embeddings"), "vec_id",
        "embedding", tablesSweep = Seq(1, 2, 4), bits = 4, dim = 64,
        threshold = 0.4)),

    // Random-projection dimensionality reduction (X90): 64-d → 16-d
    // via the deterministic centered plane family, top-5 in the
    // REDUCED space — a pure narrow map (16 codegen'd folds/row, zero
    // shuffle) that cuts every downstream byte 4× and composes with
    // the SQ/PQ/BQ representation tiers.
    "q_sim_rproj" -> ((s, dir) =>
      Similarity.rpProjectTopK(T(s, dir, "embeddings"), "vec_id",
        "embedding", col("id") < 8, k = 5, rdim = 16, dim = 64)),

    // What the byte cut costs in fidelity: recall@5 of the
    // reduced-space search vs the full-space exact truth, per
    // (width, query), widths 8/16/32/48 of ONE nested plane family
    // (truth LEFT JOIN got — all-miss queries stay visible). The
    // measured curve on this corpus is brutal (near-isotropic
    // embeddings: mean recall@5 ≈ 0.05/0.05/0.13/0.18 at sf0.01) —
    // which is the
    // point: the sweep is the cheap pre-flight that says whether a
    // corpus tolerates projection before anything downstream trusts it.
    "q_sim_rproj_sweep" -> ((s, dir) =>
      Similarity.rpProjectRecallSweep(T(s, dir, "embeddings"), "vec_id",
        "embedding", col("id") < 8, k = 5, rdims = Seq(8, 16, 32, 48),
        dim = 64)),

    // IVF top-5: label-seeded centroids, corpus broadcast-assigned,
    // queries probe the 2 nearest lists.
    "q_sim_ivf" -> ((s, dir) =>
      Similarity.ivfTopK(T(s, dir, "embeddings"), "vec_id", "embedding",
        "label", col("vec_id") < 8, k = 5, nprobe = 2)),

    // Trained IVF quality: recall@5 of the k-means-trained (4
    // deterministic Lloyd rounds, integer-exact means, each vector
    // posted to its 2 nearest lists) IVF search vs the exact
    // brute-force top-5 — the ANN path measured, not asserted.
    "q_sim_ivf_recall" -> ((s, dir) =>
      Similarity.ivfRecall(T(s, dir, "embeddings"), "vec_id", "embedding",
        "label", col("vec_id") < 8, k = 5, nprobe = 2, iters = 4,
        massign = 2)),

    // recall@5 vs nprobe ∈ {1,2,4} over ONE trained centroid set —
    // the recall/cost curve that actually drives nprobe tuning
    // (measured at sf0.01: ~0.48/0.73/0.98 mean recall@5).
    "q_sim_ivf_sweep" -> ((s, dir) =>
      Similarity.ivfRecallSweep(T(s, dir, "embeddings"), "vec_id",
        "embedding", "label", col("vec_id") < 8, k = 5,
        nprobes = Seq(1, 2, 4), iters = 4, massign = 2)),

    // X129 Matryoshka truncation recall: recall@5 of prefix-dim
    // cosine search (dims 8/16/32 of 64) vs the full-dim truth — the
    // byte-budget/recall curve that drives MRL serving (a d-prefix
    // scan reads d/64 of the vector bytes).
    "q_sim_mrl_recall" -> ((s, dir) =>
      Similarity.mrlRecall(T(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 8, k = 5, dims = Seq(8, 16, 32))),

    // X129's serving form — truncate-then-rerank (adaptive
    // retrieval): 4k candidates from the 16-dim prefix scan, exact
    // full-dim re-score of ONLY those, top-5. Oracle-exact.
    "q_sim_mrl_rerank" -> ((s, dir) =>
      Similarity.mrlRerank(T(s, dir, "embeddings"), "vec_id", "embedding",
        col("vec_id") < 8, k = 5, dim = 16, factor = 4)),

    // Blocked kNN graph, build/serve split (ops.GraphStore — the
    // Index pattern applied to the graph family): ONE training +
    // blocked Σ|list|² self-join pass persists the edge list as a
    // bucketed artifact in the query's setup; the RETURNED plan is a
    // pure edge scan. PageRank and kNN-classify below serve from the
    // same artifact — one training for the whole family, not three.
    "q_sim_knngraph" -> ((s, dir) => {
      GraphStore.build(s, T(s, dir, "embeddings"), "vec_id", "embedding",
        "label", "graft_knng", k = 5, iters = 2, massign = 2, nBuckets = 8)
      GraphStore.edges(s, "graft_knng")
    }),

    // The SCALE-CORRECT seeding of the same build, oracle-gated: the
    // label-seeded twin above freezes nlist at the 10 labels (per-
    // list occupancy, and with it the Σ|list|² block join, then grows
    // linearly with the corpus — the sf1.0 point measured ~quadratic
    // growth, and ScaleProbe measured 13x from the seeding alone).
    // Here nlist derives from a hash of the id space (32 ≈ √n at the
    // gate SF; real deployments size nlist ∝ √n), so list occupancy
    // — not list COUNT — is what stays bounded as data grows. Same
    // operator, same oracle machinery, different seed expression.
    "q_sim_knngraph_sqrtn" -> ((s, dir) => {
      val embs = T(s, dir, "embeddings")
        .withColumn("seed", pmod(col("vec_id"), lit(32L)))
      GraphStore.build(s, embs, "vec_id", "embedding", "seed",
        "graft_knng_sq", k = 5, iters = 2, massign = 2, nBuckets = 8)
      GraphStore.edges(s, "graft_knng_sq")
    }),

    // The graph takedown delta, oracle-gated end-to-end: build the
    // graph on the FULL corpus, DELETE every third vector (deleted
    // sources drop; survivors that lost a neighbor re-rank from their
    // stored blocks; the rest stay untouched), serve the edges. The
    // oracle trains on everything and restricts graph MEMBERSHIP to
    // the survivors — exactly the fixed-centroid delete semantics.
    // Seeded SQRT-N (round 12): nlist from a hash of the id space,
    // not the 10 labels — list OCCUPANCY stays bounded as the corpus
    // grows, so the Σ|list|² block join scales ~n^1.5 instead of the
    // ~quadratic growth the label seeding measured at sf1.0
    // (BASELINE.md; ScaleProbe isolated 13x from the seeding alone).
    "q_sim_graph_delete" -> ((s, dir) => {
      val embs = T(s, dir, "embeddings")
        .withColumn("seed", pmod(col("vec_id"), lit(32L)))
      GraphStore.build(s, embs, "vec_id", "embedding", "seed",
        "graft_knng_d", k = 5, iters = 2, massign = 2, nBuckets = 8)
      GraphStore.delete(s, "graft_knng_d",
        embs.filter(col("vec_id") % 3 === 0).select(col("vec_id")),
        "vec_id")
      GraphStore.edges(s, "graft_knng_d")
    }),

    // PageRank centrality SERVED from the persisted kNN graph —
    // density/representativeness valuation of every vector (rank
    // sinks are outliers). Pure integer damped iteration, 3 rounds
    // unrolled (ops.Graph); the oracle unrolls the same rounds as
    // CTEs over the same (retrained — deterministic) graph. The plan
    // contains NO training stage (PlanSpec asserts it).
    "q_sim_pagerank" -> ((s, dir) => {
      if (!GraphStore.exists(s, "graft_knng"))
        GraphStore.build(s, T(s, dir, "embeddings"), "vec_id", "embedding",
          "label", "graft_knng", k = 5, iters = 2, massign = 2, nBuckets = 8)
      GraphStore.pageRank(s, "graft_knng", iters = 3)
    }),

    // kNN classification SERVED from the persisted graph: majority
    // label over the stored top-5 edges (ties → smaller label), with
    // the true label and a correctness flag — the label-propagation
    // building block, no in-plan retraining.
    "q_sim_knnlabel" -> ((s, dir) => {
      if (!GraphStore.exists(s, "graft_knng"))
        GraphStore.build(s, T(s, dir, "embeddings"), "vec_id", "embedding",
          "label", "graft_knng", k = 5, iters = 2, massign = 2, nBuckets = 8)
      GraphStore.classify(s, "graft_knng")
    }),

    // X90: graph maintenance delta — build the kNN-graph artifact on
    // the even half, APPEND the odd half (assigned at the STORED
    // centroids, only delta-involving pairs scored, stored top-k
    // merged on the unrounded ranking key), serve the edges. The
    // oracle trains on the even half only and blocks the whole
    // corpus — exactly the append semantics; equality proves the
    // incremental merge == a full rebuild at fixed centroids.
    // Seeded sqrt-n (round 12) like q_sim_graph_delete — see there.
    // Training sees only the EVEN half, whose residues mod 64 are the
    // 32 even values — the same 32-seed budget as the full-corpus
    // queries' mod 32 (a plain mod 32 over even ids would collapse to
    // 16 seeds and give back a 2x occupancy penalty).
    "q_sim_graph_append" -> ((s, dir) => {
      val embs = T(s, dir, "embeddings")
        .withColumn("seed", pmod(col("vec_id"), lit(64L)))
      GraphStore.build(s, embs.filter(col("vec_id") % 2 === 0), "vec_id",
        "embedding", "seed", "graft_knng2", k = 5, iters = 2,
        massign = 2, nBuckets = 8)
      GraphStore.append(s, "graft_knng2",
        embs.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
        "seed")
      GraphStore.edges(s, "graft_knng2")
    }),

    // Nearest-centroid (Rocchio) classifier: |labels| integer-exact
    // centroids from the even-id training half, every vector
    // classified by a zero-shuffle broadcast cosine pick — the
    // 100 TB-cheap counterpart to q_sim_knnlabel's blocked kNN vote.
    "q_sim_centroid" -> ((s, dir) =>
      Similarity.centroidClassify(T(s, dir, "embeddings"), "vec_id",
        "embedding", "label", col("id") % 2 === 0)),

    // Deterministic train/val/test split audit: hash-bucket
    // assignment (stable under corpus growth — a doc's split never
    // depends on the rest of the corpus), counts per (source, split).
    "q_curate_split" -> ((s, dir) =>
      Curation.splitCounts(T(s, dir, "documents"), "doc_id", "text",
        "source", trainPct = 70, valPct = 15)),

    // Sequence packing (concat-and-chunk): per-source docs cut into
    // 4096-token context windows; per (source, bin) docs + tokens.
    "q_curate_pack" -> ((s, dir) =>
      Curation.packBins(T(s, dir, "documents"), "doc_id", "text",
        "source", budget = 4096L)),

    // Split-leakage report: near-dup pairs straddling train/val/test —
    // the check that dedup ran before (or against) the split. Reuses
    // X4's posting join + the split hash.
    "q_curate_leakage" -> ((s, dir) =>
      Curation.splitLeakage(T(s, dir, "documents"), "doc_id", "text",
        k = 3, threshold = 0.2, trainPct = 70, valPct = 15)),

    // Deterministic domain-mixture sampling: per-source keep rates
    // (upweight src0/src1, downsample src2) decided by salted hash
    // buckets — reproducible, growth-stable, independent of the
    // split hash. Per-source audit of the kept mixture.
    "q_curate_mix" -> ((s, dir) =>
      Curation.mixCounts(T(s, dir, "documents"), "doc_id", "text",
        "source", Map("src0" -> 1.0, "src1" -> 0.8, "src2" -> 0.1),
        default = 0.5)),

    // X131 per-source exemplar selection: three in-row quality
    // signals (heuristic score, entropy, inverted dup-token
    // fraction), min-max normalized within source (two broadcast
    // values per source per signal — never a per-source rank over
    // the corpus), weighted 0.4/0.3/0.3, top-20 per source.
    "q_curate_exemplars" -> ((s, dir) =>
      Curation.qualityFuseTopN(T(s, dir, "documents"), "doc_id", "text",
        "source", n = 20)),

    // Rank-based quality-threshold calibration: the per-source cutoff
    // that keeps the best 60% by quality — pure integer math (no
    // interpolated quantiles), one per-source window.
    "q_curate_calibrate" -> ((s, dir) =>
      Curation.qualityCalibrate(T(s, dir, "documents"), "doc_id", "text",
        "source", keepPct = 60)),

    // Benchmark contamination: best n-gram containment of each eval
    // doc (doc_id % 20 = 0) against the training remainder, with the
    // offending doc — the dedup machinery pointed across corpora.
    "q_curate_contamination" -> ((s, dir) =>
      Curation.contamination(T(s, dir, "documents"), "doc_id", "text",
        col("doc_id") % 20 === 0, k = 3)),

    // X117 Bloom-pre-filtered contamination: the same audit through a
    // hand-built runtime filter — a broadcast zero-UDF Bloom of the
    // eval shingles prunes the training shingle stream BEFORE the
    // posting join (no false negatives by construction; false
    // positives die in the exact join) — so the pair proves the
    // two-stage plan output-identical through q_curate_contamination's
    // oracle, shared verbatim.
    "q_curate_contamination_bloom" -> ((s, dir) =>
      Curation.contaminationBloom(T(s, dir, "documents"), "doc_id", "text",
        col("doc_id") % 20 === 0, k = 3, mBits = 1 << 16, probes = 4)),

    // X127 cluster-balanced sample: exact per-cluster quota over the
    // TRAINED k-means partition of embedding space — topic-balanced
    // subset selection (a corpus-wide sample reproduces topic skew;
    // this one can't). Training oracle-unrolled; the quota window
    // compiles to WindowGroupLimit (the X95 shape).
    "q_curate_clustersample" -> ((s, dir) =>
      Similarity.clusterSample(T(s, dir, "embeddings"), "vec_id",
        "embedding", "label", iters = 2, n = 40)),

    // X128 NB model introspection: the m most class-indicative grams
    // per class by bucket log-ratio vs the training corpus — "what
    // did the filter learn", the audit a deployed classifier gate
    // owes its operators. Colliding grams share their bucket's score
    // (the hashing-trick caveat, surfaced not hidden).
    "q_curate_nbtopgrams" -> ((s, dir) =>
      Curation.nbTopGrams(T(s, dir, "documents"), "doc_id", "text",
        "source", col("doc_id") % 5 =!= 0, nBuckets = 512, m = 10)),

    // X126 reproducible epoch shuffle: the deterministic global
    // permutation between curation and the data loader — X89's stable
    // shard hash + an epoch-salted within-shard order, audited by an
    // order-SENSITIVE per-shard fingerprint (pos-tagged XOR), so the
    // hash match proves the full sequence both engines would replay.
    "q_curate_epochshuffle" -> ((s, dir) =>
      Curation.epochShuffle(T(s, dir, "documents"), "doc_id",
        nShards = 32, salt = "e1")),

    // X125 hashed multinomial Naive Bayes source classifier: train on
    // the doc_id % 5 != 0 slice (priors + Laplace-smoothed hashed
    // unigram+bigram counts, every log term quantized to integer
    // micros), score EVERY doc against every class, argmax with
    // deterministic ties — reported as the train/eval confusion
    // matrix. The supervised quality/domain filter of the fastText
    // pipelines, exact enough to oracle.
    "q_curate_nbclassify" -> ((s, dir) =>
      Curation.nbConfusion(T(s, dir, "documents"), "doc_id", "text",
        "source", col("doc_id") % 5 =!= 0, nBuckets = 512)),

    // Cross-source near-dup matrix: which sources systematically
    // duplicate each other (the drop-which-crawl audit); diagonal =
    // within-source dup baseline.
    "q_curate_overlap" -> ((s, dir) =>
      Curation.sourceOverlap(T(s, dir, "documents"), "doc_id", "text",
        "source", k = 3, threshold = 0.2)),

    // Stratified per-source sample with an EXACT quota: the 100
    // lowest-salted-hash docs of every source — rank-based, unbiased
    // w.r.t. ingest order, fully reproducible.
    "q_curate_stratified" -> ((s, dir) =>
      Curation.stratifiedSample(T(s, dir, "documents"), "doc_id",
        "source", n = 100)),

    // X134 dedup-aware sample: the same exact-quota sample drawn over
    // duplicate-cluster REPRESENTATIVES (MinHash pairs -> connected
    // components -> non-reps drop) — "no two sampled docs share a
    // cluster" is structural, not probabilistic.
    "q_curate_dedupsample" -> ((s, dir) =>
      Curation.dedupedSample(T(s, dir, "documents"), "doc_id", "text",
        "source", n = 50, k = 3, numHashes = 32, bands = 8, rows = 4,
        threshold = 0.2)),

    // Dataset card: per-source release summary (docs, tokens,
    // rank-based median/max length, dominant + distinct languages) —
    // all integer/rank math, no interpolation.
    "q_curate_card" -> ((s, dir) =>
      Curation.datasetCard(T(s, dir, "documents"), "doc_id", "text",
        "source")),

    // Code-point Shannon entropy per document (native codegen'd
    // expression, zero shuffle — scan-speed at any corpus size): the
    // classic noise/boilerplate quality signal beside q_text_stats'
    // ratio gates and q_text_lm's fluency score.
    "q_text_entropy" -> ((s, dir) =>
      T(s, dir, "documents").select(col("doc_id").as("id"),
        length(col("text")).cast("long").as("n_cp"),
        TextAnalysis.charEntropy(col("text")).as("entropy_micro_nats"))),

    // X97 training-text normalization (case-preserving control-char /
    // whitespace cleanup) + the normalization-insensitive dedup key
    // (lower + punct-strip). Both fingerprints hash-checked per doc —
    // the oracle proves the full regex chain is byte-identical across
    // engines. Narrow codegen'd pass, zero shuffle.
    "q_text_normalize" -> ((s, dir) => {
      val norm = TextAnalysis.normalizeText(col("text"))
      T(s, dir, "documents").select(col("doc_id"),
        md5(norm.cast("binary")).as("norm_fp"),
        md5(TextAnalysis.normalizedKey(col("text")).cast("binary"))
          .as("key_fp"),
        length(norm).cast("long").as("n_chars_norm"),
        (length(col("text")) - length(norm)).cast("long").as("n_removed"))
    }),

    // X113 mergeable log-histogram quantile sketch: per-source p50/
    // p90/p99 token-length brackets from HdrHistogram-style integer
    // bins (≤ 12.5% relative width, exact below 16) — the rank stats
    // the streaming HistStore can maintain incrementally because
    // binned counts merge by addition where raw ranks don't. One
    // partial-agg shuffle to the (source, bin) histogram; the walk
    // runs on histogram rows only.
    "q_diag_quantiles" -> ((s, dir) =>
      Diagnostics.lengthQuantileSketch(T(s, dir, "documents"),
        "text", "source", pcts = Seq(50, 90, 99))),

    // X115 mergeable distinct-token sketch: per-source exact distinct
    // (the oracle-checkable truth) + an in-band verdict that the
    // Datasketches HLL estimate landed within its rsd band — the
    // q_cdc_approx_stats tolerance-flag pattern; sketch VALUES are
    // engine-specific by design. The same sketch rides CardStore, so
    // the live card serves distinctness mergeably (union = register
    // max, idempotent under replay).
    "q_text_distinct_sketch" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(coalesce(col("source").cast("string"), lit("<null>"))
            .as("source"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy(col("source"))
        .agg(count_distinct(col("tok")).as("n_distinct"),
          hll_sketch_estimate(
            hll_sketch_agg(col("tok"), lit(12))).as("est"))
        .select(col("source"), col("n_distinct"),
          (abs(col("est") - col("n_distinct")).cast("double")
            <= greatest(lit(5.0), col("n_distinct") * 0.05))
            .cast("long").as("hll_within_tol"))),

    // X116 SEMANTIC split leakage: the X48 audit over the embedding-
    // cosine pair graph instead of n-gram Jaccard — a paraphrased
    // duplicate straddling train/test defeats every lexical gate but
    // not this one. Same blocked pair join as q_dedup_embed.
    "q_curate_semleak" -> ((s, dir) =>
      Curation.semanticLeakage(T(s, dir, "embeddings"), "vec_id",
        "embedding", "label", threshold = 0.3, trainPct = 80, valPct = 10)),

    // X120 value-quantile brackets per event type: the X113 binning
    // over SIGNED micro-quantized doubles — the deterministic,
    // mergeable upgrade of percentile_approx's opaque band
    // (q_cdc_approx_stats can only verdict-check its sketch; this
    // serves a guaranteed [q_lo, q_hi] bracket both engines compute
    // bit-identically). Same one-shuffle histogram shape.
    "q_olap_value_quantiles" -> ((s, dir) =>
      Diagnostics.valueQuantileSketch(T(s, dir, "events"), "value",
        "event_type", pcts = Seq(50, 95, 99))),

    // X114 within-doc token-run collapse: runs of the same token are
    // trimmed to their first maxRun occurrences — the repair twin of
    // the X54 repetition GATES (which can only drop a stuttered doc,
    // not fix it). One narrow in-row pass, zero shuffle; the cleaned
    // text is fingerprinted so the oracle proves the rebuilt string
    // byte-identical across engines.
    "q_text_runcollapse" -> ((s, dir) => {
      val clean =
        array_join(TextAnalysis.runCollapse(col("ts"), maxRun = 2), " ")
      T(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ts"))
        .select(col("doc_id"),
          md5(clean.cast("binary")).as("fp_clean"),
          size(col("ts")).cast("long").as("n_tokens"),
          (size(col("ts")) -
            size(TextAnalysis.runCollapse(col("ts"), maxRun = 2)))
            .cast("long").as("n_removed"))
    }),

    // JSONL import/export edge, proven LOSSLESS: export the corpus to
    // line-JSON, re-ingest with the explicit schema, emit per-source
    // content checksums the oracle computes from the ORIGINAL parquet
    // (ops.IoFormats). Temp shards live under the repo's target/.
    "q_io_jsonl" -> ((s, dir) =>
      IoFormats.jsonlRoundTrip(T(s, dir, "documents"), "doc_id", "text",
        "source",
        "target/qtmp/jsonl_" + dir.replaceAll("[^0-9a-zA-Z.]", "_"))),

    // X89: the final pipeline step — the curated corpus written as 16
    // hash-balanced JSONL shards (one file per shard), re-ingested and
    // audited per shard with the X84 lossless checksums; the oracle
    // recomputes shard assignment AND checksums from the original
    // table, so layout determinism and content survival are both gated.
    "q_io_shards" -> ((s, dir) =>
      IoFormats.shardedExport(T(s, dir, "documents"), "doc_id", "text",
        nShards = 16,
        "target/qtmp/shards_" + dir.replaceAll("[^0-9a-zA-Z.]", "_"))),

    // X124 WET export: the crawl chain's exit — per-doc extracted
    // text re-framed as WARC `conversion` records (.warc.wet.gz,
    // gzip member per record, file per shard task), read back
    // through the standard reader and proven LOSSLESS per shard
    // (X84 checksum scheme; oracle recomputes from the original
    // table without seeing a written byte).
    "q_io_wet" -> ((s, dir) =>
      IoFormats.wetExport(T(s, dir, "documents"), "doc_id", "text",
        nShards = 8,
        "target/qtmp/wet_" + dir.replaceAll("[^0-9a-zA-Z.]", "_"))),

    // X123 URL canonicalization + URL-level dedup: every logical page
    // in the messy fixture appears twice (scheme/host case, default
    // port, trailing slash, unsorted params, fragment vs clean) and
    // must collapse to ONE canonical URL with n_dup = 2 — the crawl
    // step that is orders of magnitude cheaper than fetching and
    // content-deduping the copy. Both engines canonicalize the same
    // messy strings independently, so the hash match proves the
    // RFC 3986 §6 chain byte-for-byte.
    "q_curate_urldedup" -> ((s, dir) => {
      val out = "target/qtmp/warcu_" + dir.replaceAll("[^0-9a-zA-Z.]", "_")
      IoFormats.stageWarcMessy(out, n = 64)
      IoFormats.readWarc(s, out)
        .select(Urls.canonicalize(col("uri")).as("canon_url"))
        .groupBy(col("canon_url"))
        .agg(count(lit(1)).as("n_dup"))
    }),

    // X122 HTML -> text extraction (the WARC->WET hop): each doc's
    // text wrapped in a hazard-bearing HTML shell (script/style with
    // code content, attributes, entities incl. the &amp;amp;
    // single-decode case), extracted by the shared regex chain, and
    // fingerprinted — the oracle runs the identical chain in RE2, so
    // hash match proves the extraction byte-for-byte.
    "q_text_html" -> ((s, dir) => {
      val html = concat(lit(TextAnalysis.HtmlWrapPrefix), col("text"),
        lit(TextAnalysis.HtmlWrapSuffix))
      val extracted = TextAnalysis.htmlToText(html)
      T(s, dir, "documents").select(col("doc_id"),
        md5(extracted.cast("binary")).as("fp_text"),
        length(extracted).cast("long").as("n_chars"))
    }),

    // X121 WARC ingestion (the Common Crawl source format): REAL ISO
    // 28500 framing — plain .warc and per-record-gzip-member .warc.gz
    // both staged with formula records, parsed by the byte-level
    // reader, every field + payload md5 hash-gated against an oracle
    // that recomputes them from the formula without seeing the bytes
    // (the multimodal scheme). Parallelism unit = the file, Common
    // Crawl's own sharding contract.
    "q_io_warc" -> ((s, dir) => {
      val out = "target/qtmp/warc_" + dir.replaceAll("[^0-9a-zA-Z.]", "_")
      IoFormats.stageWarcFixture(out, n = 64)
      IoFormats.readWarc(s, out)
        .select(
          when(col("file").endsWith(".gz"), "gz").otherwise("plain")
            .as("kind"),
          col("rec_idx"), col("warc_type"), col("uri"),
          col("content_length"),
          md5(col("payload")).as("payload_md5"))
    }),

    // PII scrub: email/phone/IPv4 redaction + per-doc audit counts —
    // a narrow codegen'd pass at scan speed (regex subset chosen to
    // behave identically under Java regex and RE2).
    "q_text_pii" -> ((s, dir) => {
      val t = col("text")
      val counts = TextAnalysis.piiCounts.map { case (n, f) => f(t).as(n) }
      T(s, dir, "documents").select(
        col("doc_id") +: TextAnalysis.md5Fingerprint(
          TextAnalysis.piiRedact(t)).as("fp_redacted") +: counts: _*)
    }),

    // RAG-style chunking: 64-token windows every 48 tokens (25%
    // overlap), short tails dropped unless first — narrow map, chunk
    // fingerprints enable chunk-level dedup downstream.
    "q_curate_chunks" -> ((s, dir) =>
      Curation.chunkWindows(T(s, dir, "documents"), "doc_id", "text",
        chunkLen = 64, stride = 48, minTokens = 16)),

    // DSIR importance weights: hashed unigram+bigram features, bucket
    // log-ratios (target = src0 vs raw corpus, Laplace-smoothed),
    // per-doc weight = exact long sum of per-feature micro
    // contributions. The hashing trick caps the model at nBuckets.
    "q_curate_dsir" -> ((s, dir) =>
      Curation.dsirWeights(T(s, dir, "documents"), "doc_id", "text",
        col("source") === "src0", nBuckets = 1024)),

    // DSIR importance RESAMPLING: Gumbel-top-n over the X72 weights —
    // inclusion ∝ weight, noise seeded from a salted id hash so the
    // drawn mixture is reproducible and growth-stable. Narrow map +
    // TakeOrderedAndProject.
    "q_curate_resample" -> ((s, dir) =>
      Curation.importanceResample(
        Curation.dsirWeights(T(s, dir, "documents"), "doc_id", "text",
          col("source") === "src0", nBuckets = 1024),
        "doc_id", "logw_micros", n = 50, salt = "rs")),

    // RefinedWeb-style global boilerplate removal: segments repeated
    // across > maxDf docs are dropped from every doc (broadcast anti
    // join against the small heavy-hitter set), survivors re-stitched
    // in order.
    "q_curate_boilerplate" -> ((s, dir) =>
      Curation.boilerplateRemove(T(s, dir, "documents"), "doc_id", "text",
        segLen = 8, maxDf = 12)),

    // Temperature-scaled source mixture: p_i ∝ n_i^0.7 over per-source
    // token counts; ONE float quantization, shares as exact integer
    // ppm division.
    "q_curate_temperature" -> ((s, dir) =>
      Curation.temperatureMix(T(s, dir, "documents"), "doc_id", "text",
        "source", alpha = 0.7)),

    // X112 filter operating curve: per keep-rate decile, the exact
    // quality threshold + precision/recall against the lang='en'
    // proxy label — the read-before-you-pick table for the quality
    // gate. Histogram partial-agg; windows walk histogram rows.
    "q_curate_curve" -> ((s, dir) =>
      Curation.filterCurve(T(s, dir, "documents"), "doc_id", "text",
        labelPred = col("lang") === "en")),

    // X107 token-budget water-filling: allocate a 40k-token budget
    // over temperature weights (alpha 0.7) under a 1.5-epoch cap —
    // small sources cap out, their surplus redistributes at weights
    // in one closed-form integer pass. Corpus work = one partial
    // agg; everything else runs on the |sources|-row digest.
    "q_curate_budget" -> ((s, dir) =>
      Curation.tokenBudgetPlan(T(s, dir, "documents"), "doc_id", "text",
        "source", alpha = 0.7, budget = 40000L, maxEpochsPct = 150)),

    // X106 cluster-aware split: the split hash keys on the near-dup
    // cluster representative, so whole clusters land in one split and
    // the X48 leakage is zero by construction for every clustered
    // pair. Same pair op + params as q_dedup_clusters.
    "q_curate_cluster_split" -> ((s, dir) =>
      Curation.clusterSplit(T(s, dir, "documents"), "doc_id",
        Dedup.minhashPairs(T(s, dir, "documents"), "doc_id", "text",
          k = 3, numHashes = 32, bands = 8, rows = 4, threshold = 0.2),
        trainPct = 80, valPct = 10)),

    // X105 corpus snapshot diff: v1 drops ids ≡3 (mod 10), v2 drops
    // ids ≡2 (mod 7) and edits a slice (≡0 mod 11 gains a word →
    // changed; else ≡0 mod 5 gains trailing spaces → equivalent under
    // the normalized key). Two fingerprint scans + one id-keyed
    // full-outer join; statuses compare 16-byte md5s, never texts.
    "q_curate_diff" -> ((s, dir) => {
      val base = T(s, dir, "documents")
      val v1 = base.filter(col("doc_id") % 10 =!= 3)
      val v2 = base.filter(col("doc_id") % 7 =!= 2)
        .withColumn("text",
          when(col("doc_id") % 11 === 0, concat(col("text"), lit(" edited")))
            .when(col("doc_id") % 5 === 0, concat(col("text"), lit("  ")))
            .otherwise(col("text")))
      Curation.snapshotDiff(v1, v2, "doc_id", "text")
    }),

    // X95 per-source cap (domain capping): keep the 10 highest-quality
    // docs per source; survivors carry their rank and the per-source
    // overflow count. row_number<=cap compiles to WindowGroupLimit
    // (partial before the exchange — hot domains can't flood it).
    "q_curate_domcap" -> ((s, dir) =>
      Curation.sourceCap(T(s, dir, "documents"), "doc_id", "text",
        "source", cap = 10)),

    // X96 exact nearest-rank length percentiles per source
    // (p25/50/75/95), computed over the (source, length) histogram —
    // corpus-sized work is one partial-agg shuffle, the cumulative
    // window walks histogram rows only.
    "q_text_percentiles" -> ((s, dir) =>
      Curation.lengthPercentiles(T(s, dir, "documents"), "doc_id", "text",
        "source")),

    // CCNet-style LM fluency score: hashed bigram LM (Laplace over
    // the hashed space) trained on the lang='en' reference slice,
    // per-doc per-token cross-entropy in micro-nats. Per-instance
    // log-probs micro-quantized before the exact long sum.
    "q_text_lm" -> ((s, dir) =>
      TextAnalysis.lmScore(T(s, dir, "documents"), "doc_id", "text",
        col("lang") === "en", nBuckets = 2048)),

    // BM25 keyword retrieval: inverted posting index (tf/dl/df/avgdl)
    // + Lucene-style BM25, top-10 per fixed keyword query. Contributions
    // are micro-quantized BEFORE the per-doc sum (exact long
    // arithmetic), rank ties break on doc_id.
    // X110 frozen-PRF twin: freeze the expanded weighted queries +
    // stats from the corpus, serve the ranking as a pure narrow map +
    // top-k — shares q_text_rm3's oracle verbatim, proving the
    // freeze/serve split output-invariant through the driver gate.
    "q_text_rm3_frozen" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val frozen = Retrieval.freezePrf(docs, "doc_id", "text",
        fbDocs = 5, fbTerms = 5)
      Retrieval.prfFrozenTopK(docs, "doc_id", "text", frozen, k = 10)
    }),

    // X110 serve-side steady state: the freeze is a session-cached
    // artifact collected ONCE (the graft_idx build pattern), so this
    // entry times what production serving actually runs — the pure
    // narrow-map scoring + top-k, no index build, no feedback pass.
    // Shares q_text_rm3's oracle verbatim, like the in-plan twin.
    "q_text_rm3_frozen_serve" -> ((s, dir) => {
      val frozen = prfCache.computeIfAbsent(dir, d =>
        Retrieval.freezePrf(T(s, d, "documents"), "doc_id", "text",
          fbDocs = 5, fbTerms = 5))
      Retrieval.prfFrozenTopK(T(s, dir, "documents"), "doc_id", "text",
        frozen, k = 10)
    }),

    // X109 CCNet perplexity buckets: per-source head/middle/tail
    // terciles of the bigram-LM cross-entropy (reference = the
    // lang='en' slice, like q_text_lm). Rank-based integer thirds;
    // bigram-less docs surface as 'unscored'.
    "q_text_ccnet" -> ((s, dir) =>
      Curation.ccnetBuckets(T(s, dir, "documents"), "doc_id", "text",
        "source", refPred = col("lang") === "en", nBuckets = 2048)),

    "q_text_bm25" -> ((s, dir) =>
      Retrieval.bm25TopK(T(s, dir, "documents"), "doc_id", "text", k = 10)),

    // X130 impact-ordered posting pruning: per-term top-15 postings
    // by BM25 contribution (query-independent, so the pruned index
    // is a build-time artifact); serving reads 15 postings per query
    // term instead of df. Oracle-exact output contract.
    "q_text_bm25_pruned" -> ((s, dir) =>
      Retrieval.bm25PrunedTopK(T(s, dir, "documents"), "doc_id", "text",
        k = 10, m = 15)),

    // X130's measured recall@10 vs full BM25 per query — the
    // posting-budget/recall curve.
    "q_text_bm25_pruned_recall" -> ((s, dir) =>
      Retrieval.bm25PrunedRecall(T(s, dir, "documents"), "doc_id", "text",
        k = 10, m = 15)),

    // X149 persisted inverted text index — the ANN Index's
    // build/serve split applied to BM25 (tokenize/count ONCE, serve
    // ranked searches with no corpus recount in the plan; postings
    // and stats bucket-pruned to the query terms). Output shares
    // q_text_bm25's oracle VERBATIM: the artifact serves the exact
    // in-plan ranking.
    "q_text_index_search" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      if (!TextIndex.exists(s, "graft_tidx"))
        TextIndex.build(s, docs, "doc_id", "text", "graft_tidx",
          nBuckets = 8)
      TextIndex.search(s, "graft_tidx", k = 10)
    }),

    // X149 ⊕ X147: the metrics harness over the ARTIFACT-SERVED
    // ranking — the full serve-and-evaluate loop as one gate. The
    // oracle is the in-plan bm25 metrics SQL: serving is bit-identical
    // by X149's contract, so the evaluation must be too.
    "q_text_index_metrics" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      if (!TextIndex.exists(s, "graft_tidx"))
        TextIndex.build(s, docs, "doc_id", "text", "graft_tidx",
          nBuckets = 8)
      Retrieval.retrievalMetrics(
        TextIndex.search(s, "graft_tidx", k = 10),
        Retrieval.relevanceConjunctive(docs, "doc_id", "text"), k = 10)
    }),

    // X149 EXACT append: build on half the corpus, append the other
    // half, search — against the FULL-corpus oracle. BM25's global
    // stats (df, N, avgdl) are sums, so maintenance is exact by
    // additivity: no fixed-parameter compromise, unlike the ANN
    // artifact's fixed-centroid append.
    "q_text_index_append" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      TextIndex.build(s, docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", "graft_tidx_app", nBuckets = 8)
      TextIndex.append(s, "graft_tidx_app",
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
      TextIndex.search(s, "graft_tidx_app", k = 10)
    }),

    // X149 EXACT takedown: bucket-pruned posting/dl rewrites +
    // negative stats deltas — against the survivor-corpus oracle.
    "q_text_index_delete" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      TextIndex.build(s, docs, "doc_id", "text", "graft_tidx_del",
        nBuckets = 8)
      TextIndex.delete(s, "graft_tidx_del",
        docs.filter(col("doc_id") % 3 === 0).select(col("doc_id")),
        "doc_id")
      TextIndex.search(s, "graft_tidx_del", k = 10)
    }),

    // X150 exact phrase search, in-plan: adjacent-token phrase
    // occurrences from a posexploded token stream pruned to the
    // phrases' terms — each term's shifted position list equi-joins
    // on (id, start); overlapping matches of a repeated-token phrase
    // ("order order") count separately.
    "q_text_phrase" -> ((s, dir) =>
      Retrieval.phraseTopK(T(s, dir, "documents"), "doc_id", "text",
        k = 10)),

    // X150 artifact serving: the positional part of the text index
    // (bucket-pruned to the phrases' terms, NO tokenize in the plan)
    // serves the identical ranking — shares q_text_phrase's oracle.
    "q_text_index_phrase" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      if (!TextIndex.exists(s, "graft_tidx_pos"))
        TextIndex.build(s, docs, "doc_id", "text", "graft_tidx_pos",
          nBuckets = 8, positions = true)
      TextIndex.searchPhrase(s, "graft_tidx_pos", k = 10)
    }),

    // X150 EXACT positional maintenance: build half with positions,
    // append the other half, take down a third — phrase serving
    // equals the in-plan phrase search over the survivors (positions
    // are rows, so maintenance is exact by construction, and the
    // takedown shares the postings' tok-bucket pruning).
    "q_text_index_phrase_upd" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      TextIndex.build(s, docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", "graft_tidx_posu", nBuckets = 8,
        positions = true)
      TextIndex.append(s, "graft_tidx_posu",
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text")
      TextIndex.delete(s, "graft_tidx_posu",
        docs.filter(col("doc_id") % 3 === 0).select(col("doc_id")),
        "doc_id")
      TextIndex.searchPhrase(s, "graft_tidx_posu", k = 10)
    }),

    // X151 proximity search, in-plan: within-window co-occurrence
    // counts of a term pair from the pruned positional stream — the
    // SpanNear operator; n_occ counts pairs, so dense mention
    // clusters outrank stray hits.
    "q_text_near" -> ((s, dir) =>
      Retrieval.nearTopK(T(s, dir, "documents"), "doc_id", "text",
        k = 10)),

    // X151 artifact serving from the same positional part — shares
    // q_text_near's oracle (bit-identical by shared nearRank).
    "q_text_index_near" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      if (!TextIndex.exists(s, "graft_tidx_pos"))
        TextIndex.build(s, docs, "doc_id", "text", "graft_tidx_pos",
          nBuckets = 8, positions = true)
      TextIndex.searchNear(s, "graft_tidx_pos", k = 10)
    }),

    // X152 phrase-targeted takedown: one bucket-pruned positional
    // scan names every doc containing the phrase, the exact delete
    // takes them down (atomic commit, stats corrected) — BM25 serving
    // afterwards equals a build over the non-matching docs. The
    // "remove every document quoting X" compliance composite.
    "q_text_index_takedown" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      TextIndex.build(s, docs, "doc_id", "text", "graft_tidx_tk",
        nBuckets = 8, positions = true)
      TextIndex.deleteMatchingPhrase(s, "graft_tidx_tk",
        Seq("hash", "join"))
      TextIndex.search(s, "graft_tidx_tk", k = 10)
    }),

    // X153 keyword-in-context snippets: per term the docs with the
    // most hits, each carrying the FIRST hit's ±2-token window — the
    // RAG-citation/snippet operator; in-plan and artifact-served.
    "q_text_kwic" -> ((s, dir) =>
      Retrieval.kwicTopK(T(s, dir, "documents"), "doc_id", "text",
        k = 5)),

    "q_text_index_kwic" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      if (!TextIndex.exists(s, "graft_tidx_pos"))
        TextIndex.build(s, docs, "doc_id", "text", "graft_tidx_pos",
          nBuckets = 8, positions = true)
      TextIndex.searchKwic(s, "graft_tidx_pos", docs, "doc_id", "text",
        k = 5)
    }),

    // X154 sloppy ordered phrase, in-plan: terms in order within a
    // slop-widened window (p(m−1) − p0 ≤ m−1+slop) — the
    // near-verbatim-quote matcher contamination/quote-detection
    // users need where X150's exact adjacency misses (an interposed
    // token breaks the equi-join; RetrievalSpec pins one).
    "q_text_phrase_sloppy" -> ((s, dir) =>
      Retrieval.sloppyTopK(T(s, dir, "documents"), "doc_id", "text",
        k = 10)),

    // X154 artifact serving from the same positional part — shares
    // q_text_phrase_sloppy's oracle (bit-identical by shared
    // sloppyRank).
    "q_text_index_phrase_sloppy" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      if (!TextIndex.exists(s, "graft_tidx_pos"))
        TextIndex.build(s, docs, "doc_id", "text", "graft_tidx_pos",
          nBuckets = 8, positions = true)
      TextIndex.searchSloppy(s, "graft_tidx_pos", k = 10)
    }),

    // X155 KWIC over the BM25 ranking, in-plan: the
    // serve-and-cite loop as one operator — each top-k hit carries
    // the ±2-token window around the first occurrence of any of its
    // query's terms (X153's window extraction ∘ X68's ranking).
    "q_text_kwic_multi" -> ((s, dir) =>
      Retrieval.kwicMultiTopK(T(s, dir, "documents"), "doc_id", "text",
        k = 10)),

    // X155 artifact serving: the ranked ids come from the bucketed
    // postings (X149 search), the windows from the positional part —
    // token arrays fetched only for the k ranked ids per query.
    "q_text_index_kwic_multi" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      if (!TextIndex.exists(s, "graft_tidx_pos"))
        TextIndex.build(s, docs, "doc_id", "text", "graft_tidx_pos",
          nBuckets = 8, positions = true)
      TextIndex.searchKwicMulti(s, "graft_tidx_pos", docs, "doc_id",
        "text", k = 10)
    }),

    // X156 CDC → retrieval-index composite (VERDICT r14 missing #2):
    // the reference's end state — a maintained downstream table
    // (reference/README.md:11) — re-expressed as a maintained
    // RETRIEVAL artifact. Decode (S4) → regex filter (F1) → LWW
    // merge vs the backfill corpus (M1/M2) → the live winners applied
    // to a built text index as delete+append (X149's atomic
    // maintenance: an upsert replaces, a tombstone removes) → BM25
    // serving. Oracle: plain bm25TopKSql over the SQL-merged
    // surviving corpus — search-after-maintenance must equal a build
    // over the merged state, bit-for-bit.
    "q_pipe_cdc_index" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val bf = docs.select(col("doc_id").cast("long").as("key"),
        col("text"), lit(ChangeOp.Backfill).as("op"),
        lit(Backfill.PlaceholderTs).as("ts_sec"), lit(-1L).as("seq"),
        lit(0).as("precedence"))
      // the %37 sparsifier keeps the change stream a DELTA (a few
      // hundred touched keys against the corpus) — the realistic CDC
      // shape, and the one where delta-proportional maintenance cost
      // actually shows (an every-key stream is just a rebuild)
      val live = Filters.regexFilter(
          ChangeSource.fromEvents(T(s, dir, "events")),
          """^db[0-2]\.(users|orders)$""")
        .filter(col("event_id") % 37 === 0)
        .select((col("event_id") % 700 + 1).as("key"),
          concat(lit("revised "), col("table"),
            lit(" entry hash join scan "),
            coalesce(col("after"), lit(""))).as("text"),
          col("op"), col("ts").cast("long").as("ts_sec"),
          col("event_id").as("seq"), lit(1).as("precedence"))
      val winners = Merge.winners(bf.unionByName(live))
      // keys the live stream won: upserts must REPLACE their indexed
      // doc, tombstones must remove it — both start with the delete
      val touched = Caching.cachedOnce(
        winners.filter(col("precedence") === 1))
      // the base build is session-wide pay-once (r15 verdict #6):
      // upsert is replay-idempotent (it removes exactly the rows it
      // itself added and re-adds the same content), so a warm
      // re-execution upserting onto the already-maintained index
      // serves the identical ranking — the warm number measures the
      // composite's steady state (upsert + serve), not a rebuild
      if (!TextIndex.exists(s, "graft_tidx_cdc"))
        TextIndex.build(s, docs, "doc_id", "text", "graft_tidx_cdc",
          nBuckets = 8)
      // ONE atomic commit: upserts replace their indexed docs,
      // tombstones take theirs down, stats corrected together
      TextIndex.upsert(s, "graft_tidx_cdc",
        Merge.current(touched).select(col("key"), col("text")),
        "key", "text",
        delIds = Some(touched.filter(col("op") === ChangeOp.Delete)
          .select(col("key"))),
        delCol = "key")
      TextIndex.search(s, "graft_tidx_cdc", k = 10)
    }),

    // X158 the CDC→ANN composite — q_pipe_cdc_index's shape on the
    // VECTOR artifact: decode (S4) → regex filter (F1) → LWW merge
    // (M1/M2) → the live winners applied to a built+appended ANN
    // index as ONE upsert per part (re-embedded keys replace their
    // codes, tombstones remove; X158's atomic maintenance) → IVF×PQ
    // serving over the merged corpus. Training is pinned to the
    // UNTOUCHED id<250 half (the CDC key domain is [250,500)), so
    // upsert's fixed-trained-params contract is what the oracle
    // checks: the in-plan IVF×PQ twin over the SQL-merged corpus,
    // trained on the same id<250 rows. The %37 sparsifier keeps the
    // stream a DELTA (~100 touched keys) — the regime where
    // delta-proportional maintenance cost shows.
    "q_pipe_cdc_ann" -> ((s, dir) => {
      val embs = T(s, dir, "embeddings")
      val bf = embs.select(col("vec_id").cast("long").as("key"),
        col("embedding").cast("array<double>").as("vec"),
        lit(ChangeOp.Backfill).as("op"),
        lit(Backfill.PlaceholderTs).as("ts_sec"), lit(-1L).as("seq"),
        lit(0).as("precedence"))
      // the change's payload vector: the donor row key%250's embedding
      // (deterministic and SQL-expressible — standing in for the
      // re-embedded row a real feed would carry)
      val donors = embs.select(col("vec_id").cast("long").as("dkey"),
        col("embedding").cast("array<double>").as("dvec"))
      val live = Filters.regexFilter(
          ChangeSource.fromEvents(T(s, dir, "events")),
          """^db[0-2]\.(users|orders)$""")
        .filter(col("event_id") % 37 === 0)
        .select((col("event_id") % 250 + 250).as("key"),
          col("op"), col("ts").cast("long").as("ts_sec"),
          col("event_id").as("seq"), lit(1).as("precedence"))
        .join(donors, col("key") % 250 === col("dkey"))
        .select(col("key"), col("dvec").as("vec"), col("op"),
          col("ts_sec"), col("seq"), col("precedence"))
      val winners = Caching.cachedOnce(
        Merge.winners(bf.unionByName(live)))
      val touched = winners.filter(col("precedence") === 1)
      // base build+append is session-wide pay-once, like the text
      // composite above: upsert is replay-idempotent, so a warm
      // re-execution measures the steady state (upsert + serve)
      if (!Index.exists(s, "graft_idx_cdc")) {
        Index.build(s, embs.filter(col("vec_id") < 250), "vec_id",
          "embedding", "label", "graft_idx_cdc",
          itersIvf = 4, massign = 2, m = 16, ksub = 32, itersPq = 2,
          nBuckets = 8)
        Index.appendCommitted(s, "graft_idx_cdc",
          embs.filter(col("vec_id") >= 250), "vec_id", "embedding")
      }
      // ONE generation commit per part: upserted keys' codes replaced,
      // tombstoned keys' removed
      Index.upsert(s, "graft_idx_cdc",
        Merge.current(touched).select(col("key"), col("vec")),
        "key", "vec",
        delIds = Some(touched.filter(col("op") === ChangeOp.Delete)
          .select(col("key"))),
        delCol = "key")
      // serve over the merged corpus (the exact rerank needs the keys'
      // CURRENT vectors)
      Index.search(s, "graft_idx_cdc",
        Merge.current(winners).select(col("key").as("id"), col("vec")),
        "id", "vec", col("id") < 8, k = 5, nprobe = 4, rerank = 40)
    }),

    // X159 the CDC→kNN-graph composite — the trilogy's third leg
    // (text index X156, ANN index X158, graph here): the same change
    // stream maintains the persisted kNN graph as ONE
    // GraphStore.upsert (r17 — formerly delete-then-append, two
    // commits with a crash window between them): every winner key
    // leaves the graph — its own edges AND its appearances in other
    // sources' top-k — and the non-tombstone winners merge in at the
    // STORED centroids, all published in a single generation advance
    // per part. Oracle: the in-plan fixed-centroid kNN graph over the
    // SQL-merged corpus, trained on the untouched id<250 half. upsert
    // is replay-idempotent (removes exactly the keys it ingests), so
    // the base build+append is session-wide pay-once like the other
    // composites.
    "q_pipe_cdc_graph" -> ((s, dir) => {
      val embs = T(s, dir, "embeddings")
        .withColumn("seed", pmod(col("vec_id"), lit(64L)))
      val bf = embs.select(col("vec_id").cast("long").as("key"),
        col("embedding").cast("array<double>").as("vec"),
        lit(ChangeOp.Backfill).as("op"),
        lit(Backfill.PlaceholderTs).as("ts_sec"), lit(-1L).as("seq"),
        lit(0).as("precedence"))
      val donors = embs.select(col("vec_id").cast("long").as("dkey"),
        col("embedding").cast("array<double>").as("dvec"))
      val live = Filters.regexFilter(
          ChangeSource.fromEvents(T(s, dir, "events")),
          """^db[0-2]\.(users|orders)$""")
        .filter(col("event_id") % 37 === 0)
        .select((col("event_id") % 250 + 250).as("key"),
          col("op"), col("ts").cast("long").as("ts_sec"),
          col("event_id").as("seq"), lit(1).as("precedence"))
        .join(donors, col("key") % 250 === col("dkey"))
        .select(col("key"), col("dvec").as("vec"), col("op"),
          col("ts_sec"), col("seq"), col("precedence"))
      val touched = Caching.cachedOnce(
        Merge.winners(bf.unionByName(live))
          .filter(col("precedence") === 1))
      if (!GraphStore.exists(s, "graft_knng_cdc")) {
        GraphStore.build(s, embs.filter(col("vec_id") < 250), "vec_id",
          "embedding", "seed", "graft_knng_cdc", k = 5, iters = 2,
          massign = 2, nBuckets = 8)
        GraphStore.append(s, "graft_knng_cdc",
          embs.filter(col("vec_id") >= 250), "vec_id", "embedding",
          "seed")
      }
      GraphStore.upsert(s, "graft_knng_cdc",
        Merge.current(touched).select(col("key"), col("vec"),
          pmod(col("key"), lit(64L)).as("seed")),
        "key", "vec", "seed",
        delIds = Some(touched.filter(col("op") === ChangeOp.Delete)
          .select(col("key"))),
        delCol = "key")
      GraphStore.edges(s, "graft_knng_cdc")
    }),

    // X160 the ONE-STREAM trilogy composite (r16 verdict #6): a
    // single decoded change stream — one decode, one LWW collapse —
    // maintains ALL THREE artifacts (text index, ANN index, kNN
    // graph) and serves all three surfaces in one frame. This is the
    // deployment shape: a CDC row carries the document's text AND its
    // embedding, and the three feeds share the decode instead of
    // re-reading the log three times. The vector artifacts are the
    // X158/X159 ones (same stream, same winners — the upserts are
    // idempotent, so sharing is exact); the text artifact is its own
    // (its corpus keys revisions in the embeddings domain [250,500),
    // unlike X156's). Oracle: the three serve oracles UNION ALL'd
    // with aligned (fam, q, rank, hit, score) columns.
    "q_pipe_cdc_all" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val embs = T(s, dir, "embeddings")
      val donors = embs.select(col("vec_id").cast("long").as("dkey"),
        col("embedding").cast("array<double>").as("dvec"))
      // ONE decoded/filtered/sparsified stream carrying BOTH payloads
      val live = Filters.regexFilter(
          ChangeSource.fromEvents(T(s, dir, "events")),
          """^db[0-2]\.(users|orders)$""")
        .filter(col("event_id") % 37 === 0)
        .select((col("event_id") % 250 + 250).as("key"),
          concat(lit("revised "), col("table"),
            lit(" entry hash join scan "),
            coalesce(col("after"), lit(""))).as("text"),
          col("op"), col("ts").cast("long").as("ts_sec"),
          col("event_id").as("seq"))
        .join(donors, col("key") % 250 === col("dkey"))
        .select(col("key"), col("text"), col("dvec").as("vec"),
          col("op"), col("ts_sec"), col("seq"))
      // ONE LWW collapse, shared by all three upserts
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("key"))
        .orderBy(col("ts_sec").desc, col("seq").desc)
      val winners = Caching.cachedOnce(
        live.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn"))
      val ups = winners.filter(col("op") =!= ChangeOp.Delete)
      val tombs = winners.filter(col("op") === ChangeOp.Delete)
        .select(col("key"))
      // pay-once bases (the vector ones shared with X158/X159)
      if (!TextIndex.exists(s, "graft_tidx_all"))
        TextIndex.build(s, docs, "doc_id", "text", "graft_tidx_all",
          nBuckets = 8)
      if (!Index.exists(s, "graft_idx_cdc")) {
        Index.build(s, embs.filter(col("vec_id") < 250), "vec_id",
          "embedding", "label", "graft_idx_cdc",
          itersIvf = 4, massign = 2, m = 16, ksub = 32, itersPq = 2,
          nBuckets = 8)
        Index.appendCommitted(s, "graft_idx_cdc",
          embs.filter(col("vec_id") >= 250), "vec_id", "embedding")
      }
      if (!GraphStore.exists(s, "graft_knng_cdc")) {
        GraphStore.build(s, embs.filter(col("vec_id") < 250)
            .withColumn("seed", pmod(col("vec_id"), lit(64L))),
          "vec_id", "embedding", "seed", "graft_knng_cdc", k = 5,
          iters = 2, massign = 2, nBuckets = 8)
        GraphStore.append(s, "graft_knng_cdc",
          embs.filter(col("vec_id") >= 250)
            .withColumn("seed", pmod(col("vec_id"), lit(64L))),
          "vec_id", "embedding", "seed")
      }
      // three upserts from the one winners frame — concurrent,
      // exactly the TrilogyStream.applyChanges batch body
      graft.ops.Par.jobs(Seq(
        () => TextIndex.upsert(s, "graft_tidx_all",
          ups.select(col("key"), col("text")), "key", "text",
          delIds = Some(tombs), delCol = "key"),
        () => Index.upsert(s, "graft_idx_cdc",
          ups.select(col("key"), col("vec")), "key", "vec",
          delIds = Some(tombs), delCol = "key"),
        () => GraphStore.upsert(s, "graft_knng_cdc",
          ups.select(col("key"), col("vec"),
            pmod(col("key"), lit(64L)).as("seed")),
          "key", "vec", "seed",
          delIds = Some(tombs), delCol = "key")))
      // three serves, one aligned frame
      val text = TextIndex.search(s, "graft_tidx_all", k = 10)
        .select(lit("text").as("fam"), col("qid").cast("long").as("q"),
          col("rank").cast("long").as("rank"),
          col("doc_id").cast("long").as("hit"),
          col("score_micros").cast("long").as("score"))
      // the MERGED corpus view (originals minus touched keys ⊎ the
      // upserted vectors): the exact rerank scores candidates' CURRENT
      // vectors — raw embeddings would rerank re-embedded keys with
      // their stale originals
      val mergedCorpus = embs
        .select(col("vec_id").cast("long").as("id"),
          col("embedding").cast("array<double>").as("vec"))
        .join(winners.select(col("key").as("id")), Seq("id"),
          "left_anti")
        .unionByName(ups.select(col("key").as("id"), col("vec")))
      val ann = Index.search(s, "graft_idx_cdc", mergedCorpus,
          "id", "vec", col("id") < 8, k = 5, nprobe = 4, rerank = 40)
        .select(lit("ann").as("fam"), col("qid").cast("long").as("q"),
          col("rank").cast("long").as("rank"),
          col("neighbor_id").cast("long").as("hit"),
          col("cos_micros").cast("long").as("score"))
      val graph = GraphStore.edges(s, "graft_knng_cdc")
        .select(lit("graph").as("fam"),
          col("src_id").cast("long").as("q"),
          col("rank").cast("long").as("rank"),
          col("neighbor_id").cast("long").as("hit"),
          col("cos_micros").cast("long").as("score"))
      text.unionByName(ann).unionByName(graph)
    }),

    // X147b the same metrics harness over the HYBRID (RRF-fused)
    // ranking — the point of an eval harness is COMPARING rankers on
    // one qrel set: BM25-only vs BM25⊕embedding fusion, same
    // conjunctive qrels, same k.
    "q_text_retrieval_metrics_rrf" -> ((s, dir) =>
      Retrieval.retrievalMetrics(
        Retrieval.rrfFuse(
          Retrieval.bm25TopK(T(s, dir, "documents"), "doc_id", "text",
            k = 10), "doc_id",
          Similarity.bruteForceTopK(T(s, dir, "embeddings"), "vec_id",
            "embedding", col("vec_id") < 4, k = 10),
          "neighbor_id", k = 10),
        Retrieval.relevanceConjunctive(T(s, dir, "documents"),
          "doc_id", "text"), k = 10)),

    // X147 retrieval quality metrics: the served BM25 ranking scored
    // against deterministic conjunctive qrels (doc relevant iff it
    // contains EVERY query term) — per query MRR, precision@10,
    // recall@10, nDCG@10 in integer micros; the nDCG discount table
    // is a Scala-precomputed literal shared by both engines (a
    // runtime log2 could differ by an ulp and flip a rounding).
    "q_text_retrieval_metrics" -> ((s, dir) =>
      Retrieval.bm25Metrics(T(s, dir, "documents"), "doc_id", "text",
        k = 10)),

    // X104 pseudo-relevance feedback: BM25 top-5 as pseudo-relevant,
    // harvest the 5 most characteristic non-query terms, rescore the
    // weighted expanded query. One shared index build; both scoring
    // passes are broadcast posting joins.
    "q_text_rm3" -> ((s, dir) =>
      Retrieval.prfExpandTopK(T(s, dir, "documents"), "doc_id", "text",
        k = 10, fbDocs = 5, fbTerms = 5)),

    // Hybrid retrieval: reciprocal-rank fusion of the BM25 ranking
    // with the embedding cosine ranking for the same qids (doc_id and
    // vec_id share the id domain). Integer-nanos contributions.
    "q_hybrid_rrf" -> ((s, dir) =>
      Retrieval.rrfFuse(
        Retrieval.bm25TopK(T(s, dir, "documents"), "doc_id", "text", k = 10),
        "doc_id",
        Similarity.bruteForceTopK(T(s, dir, "embeddings"), "vec_id",
          "embedding", col("vec_id") < 4, k = 10),
        "neighbor_id", k = 10)),

    // SemDeDup: trained k-means blocks (2 Lloyd rounds over the label
    // seeds) + within-cluster cosine pairs at >= 0.35 + connected
    // components -> min-id representative per semantic dup cluster.
    "q_dedup_semantic" -> ((s, dir) =>
      Dedup.dupClusters(
        Dedup.semanticPairs(T(s, dir, "embeddings"), "vec_id", "embedding",
          "label", iters = 2, threshold = 0.35))),

    // Multimodal: REAL ImageIO decode over genuine PNG bytes (one
    // formula-pixel fixture image per doc id, encoded in-plan). The
    // oracle computes the expected stats from the pixel formula and
    // never sees the bytes — agreement proves the codec path is
    // pixel-exact end to end.
    "q_mm_decode" -> ((s, dir) =>
      Multimodal.decodeImages(
        Multimodal.imageFixture(T(s, dir, "documents")))
        .toDF()),

    // Multimodal: REAL JDK WAV decode over genuine RIFF/PCM bytes
    // (formula-sample fixture, same oracle scheme as q_mm_decode):
    // container properties + sample-exact integer signal stats.
    "q_mm_audio" -> ((s, dir) =>
      Multimodal.decodeAudio(
        Multimodal.audioFixture(T(s, dir, "documents")))
        .toDF()),

    // Multimodal: REAL RIFF/AVI demux + per-frame ImageIO decode
    // (MPNG fixture — every frame an independent lossless still):
    // every 2nd frame up to 3 per video, real dims + brightness,
    // formula-oracle-checked. Inter-frame codecs (H.264) remain the
    // documented gap — the JDK ships none.
    "q_mm_video" -> ((s, dir) =>
      Multimodal.decodeVideoFrames(
        Multimodal.videoFixture(T(s, dir, "documents")),
        stride = 2, maxFrames = 3)
        .toDF()),

    // The serve-side steady state of q_mm_video: the fixture encode
    // is staged to parquet ONCE per session (a production corpus
    // stores encoded bytes), so this entry times only what ingest
    // actually runs — demux + frame decode. Shares q_mm_video's
    // oracle verbatim (staging cannot change results).
    "q_mm_video_decode" -> ((s, dir) => {
      val staged = mediaStage.computeIfAbsent(dir, d => {
        val out = java.nio.file.Files
          .createTempDirectory("graft_mm_stage").toString
        Multimodal.videoFixture(T(s, d, "documents"))
          .write.mode("overwrite").parquet(out)
        out
      })
      Multimodal.decodeVideoFrames(
        s.read.parquet(staged)
          .as(org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]),
        stride = 2, maxFrames = 3)
        .toDF()
    }),

    // Multimodal: REAL RIFF/AVI demux-only frame extraction (X13) —
    // stride-sampled chunk slicing + header metadata with NO pixel
    // decode, the cheap keyframe-extraction half of q_mm_video.
    // Formula oracle checks header fields, sampled index set, and
    // 25 fps timestamps; the chunk-slicing byte-exactness is
    // spec-proven (MultimodalSpec).
    "q_mm_frames" -> ((s, dir) =>
      Multimodal.extractFrames(
        Multimodal.videoFixture(T(s, dir, "documents")),
        stride = 2, maxFrames = 3)
        .toDF()),

    // Multimodal: real aspect-preserving nearest-neighbor rescale;
    // output carries the mean brightness of the actually-resampled
    // pixels, oracle-checked through the formula.
    "q_mm_resize" -> ((s, dir) =>
      Multimodal.resizeImages(
        Multimodal.imageFixture(T(s, dir, "documents")), maxDim = 16)
        .toDF()),

    // Multimodal: real per-channel moment features, one row per
    // component (feat_idx 2c = mean, 2c+1 = second moment, both ·1e6).
    "q_mm_features" -> ((s, dir) =>
      Multimodal.imageFeatures(
        Multimodal.imageFixture(T(s, dir, "documents")))
        .toDF())
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
         |FROM events ORDER BY event_id""".stripMargin,

    "q_cdc_script" ->
      s"""SELECT event_id,
         |  $dbSql || '.' || $tableSql AS topic,
         |  CASE WHEN $opSql = 'Delete' THEN 'DELETE' ELSE 'UPSERT' END
         |    AS change_type,
         |  $dbSql AS tenant,
         |  epoch_ms(ts) AS at_ms,
         |  coalesce(CASE WHEN $opSql = 'Delete' THEN $beforeSql
         |           ELSE $afterSql END, '{}') AS payload
         |FROM events ORDER BY event_id""".stripMargin,

    "q_cdc_backfill" ->
      """SELECT 'Backfill' AS op, 'db0' AS db, 'customer' AS "table",
        |  1::BIGINT AS ts_sec, 'c_custkey' AS pkey,
        |  c_custkey, c_name, c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_cdc_backfill_page" ->
      """SELECT 'Backfill' AS op, 'db0' AS db, 'customer' AS "table",
        |  1::BIGINT AS ts_sec, 'c_custkey' AS pkey,
        |  c_custkey, c_name, c_acctbal
        |FROM customer WHERE c_custkey > 100
        |ORDER BY c_custkey LIMIT 1000""".stripMargin,

    "q_cdc_lww_merge" ->
      s"""WITH b AS (
         |  SELECT c_custkey AS custkey, 'Backfill' AS op, c_acctbal AS bal,
         |         1::BIGINT AS ts_sec, -1::BIGINT AS seq, 0 AS prec
         |  FROM customer),
         |l AS (
         |  SELECT (user_id % 150 + 1) AS custkey, $opSql AS op, value AS bal,
         |         epoch_ns(ts) // 1000000000 AS ts_sec, event_id AS seq, 1 AS prec
         |  FROM events),
         |u AS (SELECT * FROM b UNION ALL SELECT * FROM l),
         |r AS (SELECT *, row_number() OVER (
         |        PARTITION BY custkey
         |        ORDER BY ts_sec DESC, prec DESC, seq DESC) AS rn FROM u)
         |SELECT custkey, op, bal, ts_sec,
         |  CASE WHEN prec = 1 THEN 'live' ELSE 'backfill' END AS src
         |FROM r WHERE rn = 1 AND op <> 'Delete' ORDER BY custkey""".stripMargin,

    "q_cdc_merge_strict" ->
      s"""WITH b AS (
         |  SELECT row_number() OVER (ORDER BY c_custkey) AS rn,
         |    'db0' AS db, 'customer' AS "table", c_custkey::BIGINT AS key,
         |    'Backfill' AS op, c_acctbal AS bal
         |  FROM customer),
         |l AS (
         |  SELECT row_number() OVER (ORDER BY event_id) AS rn,
         |    $dbSql AS db, 'customer' AS "table",
         |    (user_id % 150 + 1)::BIGINT AS key, $opSql AS op, value AS bal
         |  FROM events),
         |j AS (
         |  SELECT coalesce(b.rn, l.rn) AS rn,
         |    CASE WHEN b.key IS NULL OR (b.db = l.db AND b."table" = l."table"
         |      AND l.op <> 'Delete' AND b.key = l.key) THEN true ELSE false END AS take,
         |    b.db AS bdb, b."table" AS btab, b.key AS bkey, b.op AS bop, b.bal AS bbal,
         |    l.db AS ldb, l."table" AS ltab, l.key AS lkey, l.op AS lop, l.bal AS lbal
         |  FROM b FULL JOIN l ON b.rn = l.rn)
         |SELECT rn::BIGINT AS rn,
         |  CASE WHEN take THEN ldb ELSE bdb END AS db,
         |  CASE WHEN take THEN ltab ELSE btab END AS "table",
         |  CASE WHEN take THEN lkey ELSE bkey END AS key,
         |  CASE WHEN take THEN lop ELSE bop END AS op,
         |  CASE WHEN take THEN lbal ELSE bbal END AS bal,
         |  CASE WHEN take THEN 'live' ELSE 'backfill' END AS src
         |FROM j""".stripMargin,

    "q_pipe_cdc" ->
      s"""WITH b AS (
         |  SELECT c_custkey::VARCHAR AS key, 'Backfill' AS op, 'db0' AS db,
         |    'customer' AS "table", 1::BIGINT AS ts_sec, -1::BIGINT AS seq,
         |    c_acctbal AS bal, NULL::VARCHAR AS payload, 0 AS prec
         |  FROM customer),
         |l AS (
         |  SELECT (event_id % 150 + 1)::VARCHAR AS key, $opSql AS op,
         |    $dbSql AS db, $tableSql AS "table",
         |    epoch_ns(ts) // 1000000000 AS ts_sec, event_id AS seq,
         |    NULL::DOUBLE AS bal, $afterSql AS payload, 1 AS prec
         |  FROM events
         |  WHERE regexp_matches($dbSql || '.' || $tableSql,
         |    '^db[0-2]\\.(users|orders)$$')),
         |u AS (SELECT * FROM b UNION ALL SELECT * FROM l),
         |r AS (SELECT *, row_number() OVER (PARTITION BY key
         |        ORDER BY ts_sec DESC, prec DESC, seq DESC) AS rn FROM u)
         |SELECT key::BIGINT AS custkey,
         |  'projects/my-project-id/topics/all_pims.' || "table" AS topic,
         |  CASE WHEN op IN ('Insert','Backfill') THEN 'c'
         |       WHEN op = 'Update' THEN 'u' ELSE 'd' END AS payload_op,
         |  CASE WHEN op = 'Delete' THEN 'DELETE' ELSE 'UPSERT' END
         |    AS "_CHANGE_TYPE",
         |  ts_sec,
         |  CASE WHEN prec = 1 THEN 'live' ELSE 'backfill' END AS src,
         |  bal, payload
         |FROM r WHERE rn = 1 AND op <> 'Delete' ORDER BY custkey""".stripMargin,

    "q_cdc_typemap" ->
      """SELECT event_id,
        |  strftime(ts, '%Y-%m-%d') AS my_date,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS my_dt,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS my_dt_us,
        |  CASE WHEN (event_id % 500000 - 250000) < 0 THEN '-' ELSE '' END
        |    || lpad((abs(event_id % 500000 - 250000) // 3600)::VARCHAR, 3, '0')
        |    || ':' || lpad(((abs(event_id % 500000 - 250000) % 3600) // 60)::VARCHAR, 2, '0')
        |    || ':' || lpad((abs(event_id % 500000 - 250000) % 60)::VARCHAR, 2, '0') AS my_time,
        |  CASE WHEN (event_id % 500000 - 250000) < 0 THEN '-' ELSE '' END
        |    || lpad((abs(event_id % 500000 - 250000) // 3600)::VARCHAR, 3, '0')
        |    || ':' || lpad(((abs(event_id % 500000 - 250000) % 3600) // 60)::VARCHAR, 2, '0')
        |    || ':' || lpad((abs(event_id % 500000 - 250000) % 60)::VARCHAR, 2, '0')
        |    || '.' || lpad((event_id % 1000000)::VARCHAR, 6, '0') AS my_time_us,
        |  hex(props) AS my_hex,
        |  ((CASE WHEN event_id % 2 = 0 THEN event_id * 123456789
        |         ELSE -(event_id * 987654321) - 1 END)::HUGEINT
        |   + CASE WHEN event_id % 2 = 0 THEN 0::HUGEINT
        |          ELSE 18446744073709551616::HUGEINT END)::DECIMAL(20,0)::VARCHAR AS my_u64
        |FROM events ORDER BY event_id""".stripMargin,

    "q_cdc_offsets" ->
      s"""SELECT $dbSql AS server_id,
         |  greatest(4, max(event_id))::BIGINT AS pos,
         |  count(*)::BIGINT AS n_events
         |FROM events GROUP BY 1 ORDER BY server_id""".stripMargin,

    "q_cdc_jobqueue" ->
      s"""WITH c AS (SELECT $dbSql AS db, $tableSql AS relation, event_id FROM events),
         |seen AS (
         |  SELECT db, relation, max(event_id)::BIGINT AS position,
         |    count(*)::BIGINT AS n_rows
         |  FROM c GROUP BY 1, 2),
         |jobs AS (SELECT DISTINCT db, relation FROM c
         |         UNION SELECT 'db9', 'users')
         |SELECT j.db, j.relation, s.position,
         |  coalesce(s.n_rows, 0)::BIGINT AS n_rows,
         |  CASE WHEN s.n_rows IS NOT NULL THEN 'done' ELSE 'todo' END AS status
         |FROM jobs j LEFT JOIN seen s ON j.db = s.db AND j.relation = s.relation
         |ORDER BY j.db, j.relation""".stripMargin,

    "q_cdc_windowed" ->
      s"""SELECT epoch(date_trunc('hour', ts))::BIGINT AS win_start,
         |  $dbSql AS db, $tableSql AS "table", count(*)::BIGINT AS n_changes
         |FROM events GROUP BY 1, 2, 3 ORDER BY win_start, db, "table"""".stripMargin,

    // gaps-and-islands sessionization in epoch micros; a session
    // breaks when the gap is >= 30 min (Spark merges while
    // next.ts < prev.ts + gap), session end = last event + gap
    "q_cdc_sessions" -> sessionsOracle,

    // the two-phase plan must produce the IDENTICAL session set
    "q_cdc_sessions2" -> sessionsOracle,

    "q_cdc_lag" ->
      s"""WITH c AS (
         |  SELECT event_id, $dbSql AS db, $tableSql AS "table",
         |    epoch_ns(ts) // 1000 AS ts_us FROM events)
         |SELECT event_id, db, "table", ts_us::BIGINT AS ts_us,
         |  (ts_us - lag(ts_us) OVER (PARTITION BY db, "table"
         |    ORDER BY ts_us, event_id))::BIGINT AS gap_us
         |FROM c ORDER BY event_id""".stripMargin,

    "q_cdc_scd2" ->
      s"""WITH ch AS (
         |  SELECT $dbSql AS db, $tableSql AS "table", user_id,
         |    $opSql AS op, props, epoch_ns(ts) // 1000 AS ts_us, event_id
         |  FROM events),
         |v AS (
         |  SELECT db, "table", user_id, op, props,
         |    ts_us::BIGINT AS valid_from_us,
         |    (lead(ts_us) OVER (PARTITION BY db, "table", user_id
         |      ORDER BY ts_us, event_id))::BIGINT AS valid_to_us
         |  FROM ch)
         |SELECT db, "table", user_id, props AS payload, valid_from_us,
         |  valid_to_us,
         |  (CASE WHEN valid_to_us IS NULL THEN 1 ELSE 0 END)::BIGINT AS is_current
         |FROM v WHERE op <> 'Delete'
         |ORDER BY db, "table", user_id, valid_from_us""".stripMargin,

    "q_diag_skew" ->
      (Diagnostics.keyProfileSql("user_id", "events", topN = 20)
        + " ORDER BY rank"),

    "q_olap_revenue" ->
      """SELECT n_name,
        |  sum(round(l_extendedprice * 100)::BIGINT
        |      * (100 - round(l_discount * 100)::BIGINT))::BIGINT AS revenue_c100,
        |  count(*)::BIGINT AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_olap_retention" ->
      (Events.retentionSql("user_id", "ts", "events")
        + " ORDER BY cohort_week, week_offset"),

    "q_olap_funnel" ->
      (Events.funnelSql("user_id", "event_type", "ts", "events",
        Seq("signup", "click", "purchase")) + " ORDER BY stage"),

    "q_cdc_rollup" ->
      s"""SELECT db, "table", op, count(*)::BIGINT AS n_changes
         |FROM (SELECT $dbSql AS db, $tableSql AS "table", $opSql AS op FROM events)
         |GROUP BY ROLLUP(db, "table", op)
         |ORDER BY db NULLS FIRST, "table" NULLS FIRST, op NULLS FIRST""".stripMargin,

    "q_cdc_distinct_users" ->
      s"""SELECT $dbSql AS db, $tableSql AS "table",
         |  count(DISTINCT user_id)::BIGINT AS n_users
         |FROM events GROUP BY 1, 2 ORDER BY db, "table"""".stripMargin,

    // sketch verdicts: the oracle states the exact keys/counts and
    // that every in-plan sketch landed inside its error bound (the
    // Spark side computes the bound checks; here they are constant 1)
    "q_cdc_approx_stats" ->
      s"""SELECT $dbSql AS db, $tableSql AS "table",
         |  count(*)::BIGINT AS n_rows,
         |  count(DISTINCT user_id)::BIGINT AS n_users,
         |  1::BIGINT AS hll_within_tol, 1::BIGINT AS p95_within_band
         |FROM events GROUP BY 1, 2 ORDER BY db, "table"""".stripMargin,

    "q_cdc_except" ->
      s"""SELECT user_id FROM events WHERE $opSql = 'Backfill'
         |EXCEPT SELECT user_id FROM events WHERE $opSql = 'Delete'
         |ORDER BY user_id""".stripMargin,

    // native ASOF JOIN against the gaps-and-islands session starts
    "q_cdc_asof" -> asofOracle,

    // the two-phase plan must attach the IDENTICAL as-of marks
    "q_cdc_asof2" -> asofOracle,

    // ---- LLM-data-pipeline extensions: oracles generated from the
    // same Scala constants as the Spark pipelines ----

    "q_text_stats" -> {
      val t = "text"
      s"""SELECT doc_id,
         |  ${TextAnalysis.tokenCountSql(t)} AS n_tokens,
         |  ${TextAnalysis.pieceCountSql(t)} AS n_pieces,
         |  ${TextAnalysis.langIdSql(t)} AS lang_pred,
         |  ${TextAnalysis.qualityMicrosSql(t)} AS quality_micros,
         |  ${TextAnalysis.md5FingerprintSql(t)} AS fp_md5,
         |  ${TextAnalysis.rollingFingerprintSql(t)} AS fp_roll
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "q_text_repetition" ->
      (TextAnalysis.repetitionStatsSql("doc_id", "text", "documents")
        + " ORDER BY doc_id"),

    // the in-row twin must produce the IDENTICAL rows
    "q_text_repetition2" ->
      (TextAnalysis.repetitionStatsSql("doc_id", "text", "documents")
        + " ORDER BY doc_id"),

    "q_text_vocab" ->
      s"""SELECT tok, count(*)::BIGINT AS n
         |FROM (SELECT unnest(${TextAnalysis.tokensSql("text")}) AS tok FROM documents)
         |GROUP BY tok ORDER BY n DESC, tok LIMIT 50""".stripMargin,

    "q_text_vocab_mg" ->
      (TextAnalysis.mgSummarySql("text", "source", "documents", k = 10)
        + " ORDER BY source, tok"),

    "q_text_pmi" ->
      TextAnalysis.pmiCollocationsSql("text", "documents",
        minCount = 3, topM = 40),

    "q_text_vocab_coverage" ->
      (TextAnalysis.vocabCoverageSql("text", "documents",
        sizes = Seq(64, 256, 1024, 4096)) + " ORDER BY vocab_size"),

    "q_text_zipf" ->
      TextAnalysis.zipfFitSql("text", "documents", topR = 256),

    "q_text_scripts" ->
      (TextAnalysis.scriptProfileSql("doc_id", "text", "documents")
        + " ORDER BY script"),

    "q_text_oov" ->
      (TextAnalysis.oovScoreSql("doc_id", "text", "documents", s = 512)
        + " ORDER BY doc_id"),

    "q_text_bpe" ->
      (Bpe.mergesSql("text", "documents", rounds = 12, maxWords = 2000)
        + " ORDER BY round"),

    "q_text_bpe_encode" ->
      Bpe.pieceFrequenciesSql("text", "documents", rounds = 12,
        maxWords = 2000, topK = 30),

    "q_text_drift" ->
      (Drift.tokenJsDriftSql("text", "source", "documents",
        maxVocab = 500) + " ORDER BY source"),

    "q_diag_lendrift" -> {
      val lb =
        s"(${Diagnostics.binIdSql(TextAnalysis.tokenCountSql("text"))})::VARCHAR"
      Drift.tokenJsDriftSql(lb, "source", "documents", maxVocab = 256) +
        " ORDER BY source"
    },

    "q_diag_embdrift" ->
      (Diagnostics.embeddingSnapshotDriftSql("embedding", "label",
        "embeddings", "vec_id % 2 = 0") + " ORDER BY label"),

    "q_diag_cms" ->
      (Diagnostics.cmsEstimatesSql("text", "documents", depth = 4,
        width = 512, topN = 20) + " ORDER BY tok"),

    "q_sim_drift" ->
      (Drift.embeddingDriftSql("vec_id", "embedding", "label",
        "embeddings") + " ORDER BY label"),

    // frozen twins share the in-plan oracles verbatim
    "q_text_drift_frozen" ->
      (Drift.tokenJsDriftSql("text", "source", "documents",
        maxVocab = 500) + " ORDER BY source"),
    "q_sim_drift_frozen" ->
      (Drift.embeddingDriftSql("vec_id", "embedding", "label",
        "embeddings") + " ORDER BY label"),

    "q_text_drift_shift" ->
      (Drift.tokenJsDriftSql("text", "source",
        "(SELECT * FROM documents WHERE doc_id % 2 = 1)", maxVocab = 500,
        refTable = "(SELECT * FROM documents WHERE doc_id % 2 = 0)")
        + " ORDER BY source"),
    "q_sim_drift_shift" ->
      (Drift.embeddingDriftSql("vec_id", "embedding", "label",
        "(SELECT * FROM embeddings WHERE vec_id % 2 = 1)",
        refTable = "(SELECT * FROM embeddings WHERE vec_id % 2 = 0)")
        + " ORDER BY label"),

    "q_curate" -> {
      val t = "text"
      s"""WITH s AS (
         |  SELECT doc_id, ${TextAnalysis.md5FingerprintSql(t)} AS fp,
         |    ${TextAnalysis.langIdSql(t)} AS lang_pred,
         |    ${TextAnalysis.qualityMicrosSql(t)} AS quality_micros
         |  FROM documents),
         |r AS (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM s)
         |SELECT doc_id, lang_pred, quality_micros FROM r
         |WHERE rn = 1 AND quality_micros >= 550000 ORDER BY doc_id""".stripMargin
    },

    "q_dedup_exact" ->
      (Dedup.exactSql("doc_id", "text", "documents") + " ORDER BY fp"),

    "q_dedup_minhash" ->
      (Dedup.minhashPairsSql("doc_id", "text", "documents",
        k = 3, numHashes = 32, bands = 8, rows = 4, threshold = 0.2)
        + " ORDER BY id1, id2"),

    "q_dedup_minhash_recall" ->
      (Dedup.minhashLshRecallSql("doc_id", "text", "documents",
        k = 3, numHashes = 32, bands = 8, rows = 4, threshold = 0.2)
        + " ORDER BY bucket"),

    "q_dedup_minhash_recall_sampled" ->
      (Dedup.minhashLshRecallSampledSql("doc_id", "text", "documents",
        k = 3, numHashes = 32, bands = 8, rows = 4, threshold = 0.2,
        targetDocs = 250)
        + " ORDER BY bucket"),

    "q_pipe_curate" ->
      (Curation.curationPipelineSql("doc_id", "text", "source",
        "documents", minQualityMicros = 550000, k = 3, numHashes = 32,
        bands = 8, rows = 4, threshold = 0.5) + " ORDER BY doc_id"),

    "q_pipe_curate_audit" ->
      (Curation.curationAuditSql("doc_id", "text", "source",
        "documents", minQualityMicros = 550000, k = 3, numHashes = 32,
        bands = 8, rows = 4, threshold = 0.5)
        + " ORDER BY doc_id, outcome"),

    "q_dedup_simhash" ->
      (Dedup.simhashPairsSql("doc_id", "text", "documents", maxDist = 5)
        + " ORDER BY id1, id2"),

    "q_dedup_ngram" ->
      (Dedup.ngramJaccardPairsSql("doc_id", "text", "documents",
        k = 3, threshold = 0.2) + " ORDER BY id1, id2"),

    "q_dedup_edit" ->
      (Dedup.editPairsSql("doc_id", "text", "documents",
        k = 3, maxDist = 20) + " ORDER BY id1, id2"),

    // salting is pair-preserving — the oracle is the same plain
    // pairwise-threshold query as q_dedup_ngram
    "q_dedup_ngram_salted" ->
      (Dedup.ngramJaccardPairsSql("doc_id", "text", "documents",
        k = 3, threshold = 0.2) + " ORDER BY id1, id2"),

    // oracle: plain full-pairwise threshold — the prefix filter is
    // provably exact, so the outputs must be identical
    "q_dedup_ngram_prefix" ->
      (Dedup.ngramJaccardPairsSql("doc_id", "text", "documents",
        k = 3, threshold = 0.8) + " ORDER BY id1, id2"),

    "q_dedup_spans" ->
      (Dedup.substringSpansSql("doc_id", "text", "documents",
        k = 8, minTokens = 16, maxDf = 64)
        + " ORDER BY id1, id2, start1"),

    "q_dedup_cchunks" ->
      (Dedup.contentChunksSql("doc_id", "text", "documents",
        k = 4, divisor = 8L) + " ORDER BY doc_id, start"),

    "q_dedup_cchunks_frac" ->
      (Dedup.chunkDupFractionSql("doc_id", "text", "documents",
        k = 4, divisor = 8L, minDupTokens = 4) + " ORDER BY doc_id"),

    "q_dedup_cchunks_gate" ->
      (Dedup.chunkDupGateSql("doc_id", "text", "documents",
        k = 4, divisor = 8L, minDupTokens = 4, maxDupFracMicros = 500000L)
        + " ORDER BY doc_id"),

    "q_dedup_clusters" ->
      (Dedup.dupClustersSql(Dedup.minhashPairsSql("doc_id", "text", "documents",
        k = 3, numHashes = 32, bands = 8, rows = 4, threshold = 0.2))
        + " ORDER BY id"),

    "q_dedup_keepbest" ->
      (Dedup.keepBestQualitySql("doc_id", "text", "documents",
        Dedup.minhashPairsSql("doc_id", "text", "documents",
          k = 3, numHashes = 32, bands = 8, rows = 4, threshold = 0.2))
        + " ORDER BY doc_id"),

    "q_dedup_embed" ->
      (Dedup.cosinePairsSql("vec_id", "embedding", "label", "embeddings",
        threshold = 0.35) + " ORDER BY id1, id2"),

    "q_dedup_embed_clusters" ->
      (Dedup.dupClustersSql(Dedup.cosinePairsSql("vec_id", "embedding",
        "label", "embeddings", threshold = 0.35)) + " ORDER BY id"),

    "q_sim_rplsh" ->
      (Similarity.rpLshPairsSql("vec_id", "embedding", "embeddings",
        tables = 4, bits = 4, dim = 64, threshold = 0.4) + " ORDER BY id1, id2"),

    "q_sim_topk" ->
      (Similarity.bruteForceTopKSql("vec_id", "embedding", "embeddings",
        "id < 8", k = 5) + " ORDER BY qid, rank"),

    "q_sim_rproj" ->
      (Similarity.rpProjectTopKSql("vec_id", "embedding", "embeddings",
        "id < 8", k = 5, rdim = 16, dim = 64) + " ORDER BY qid, rank"),

    "q_sim_rproj_sweep" ->
      (Similarity.rpProjectRecallSweepSql("vec_id", "embedding",
        "embeddings", "id < 8", k = 5, rdims = Seq(8, 16, 32, 48),
        dim = 64) + " ORDER BY n_dims, qid"),

    "q_sim_sq" ->
      (Sq.topKSql("vec_id", "embedding", "embeddings",
        "id < 8", k = 5, rerank = 40) + " ORDER BY qid, rank"),

    "q_sim_sq4" ->
      (Sq.topKSql("vec_id", "embedding", "embeddings",
        "id < 8", k = 5, rerank = 80, levels = 16)
        + " ORDER BY qid, rank"),

    "q_sim_sq4_recall" ->
      (Sq.recallSql("vec_id", "embedding", "embeddings",
        "id < 8", k = 5, rerank = 80, levels = 16) + " ORDER BY qid"),

    "q_sim_bq" ->
      (Bq.topKSql("vec_id", "embedding", "embeddings",
        "id < 8", k = 5, rerank = 160, dim = 64) + " ORDER BY qid, rank"),

    "q_sim_bq_recall" ->
      (Bq.recallSql("vec_id", "embedding", "embeddings",
        "id < 8", k = 5, rerank = 160, dim = 64) + " ORDER BY qid"),

    // the persisted BQ tier stores exactly the in-plan pack — same
    // oracle as q_sim_bq
    "q_sim_index_bq" ->
      (Bq.topKSql("vec_id", "embedding", "embeddings",
        "id < 8", k = 5, rerank = 160, dim = 64) + " ORDER BY qid, rank"),

    "q_sim_sq_recall" ->
      (Sq.recallSql("vec_id", "embedding", "embeddings",
        "id < 8", k = 5, rerank = 40) + " ORDER BY qid"),

    "q_sim_ivfsq" ->
      (Sq.ivfSqTopKSql("vec_id", "embedding", "label", "embeddings",
        "id < 8", k = 5, nprobe = 4, itersIvf = 4, massign = 2,
        rerank = 40) + " ORDER BY qid, rank"),

    "q_sim_ivfsq4" ->
      (Sq.ivfSqTopKSql("vec_id", "embedding", "label", "embeddings",
        "id < 8", k = 5, nprobe = 4, itersIvf = 4, massign = 2,
        rerank = 80, levels = 16) + " ORDER BY qid, rank"),

    "q_sim_rplsh_recall" ->
      (Similarity.rpLshRecallSweepSql("vec_id", "embedding", "embeddings",
        tablesSweep = Seq(1, 2, 4), bits = 4, dim = 64, threshold = 0.4)
        + " ORDER BY n_tables"),

    "q_sim_pq" ->
      (Pq.topKSql("vec_id", "embedding", "embeddings", "id < 8",
        k = 5, m = 16, ksub = 32, iters = 2, rerank = 40)
        + " ORDER BY qid, rank"),

    "q_sim_pq_recall" ->
      (Pq.recallSql("vec_id", "embedding", "embeddings", "id < 8",
        k = 5, m = 16, ksub = 32, iters = 2, rerank = 40)
        + " ORDER BY 1"),

    "q_sim_ivfpq" ->
      (Pq.ivfPqTopKSql("vec_id", "embedding", "label", "embeddings",
        "id < 8", k = 5, nprobe = 4, itersIvf = 4, massign = 2,
        m = 16, ksub = 32, itersPq = 2, rerank = 40)
        + " ORDER BY qid, rank"),

    // the persisted-index search must return the EXACT q_sim_ivfpq
    // result — same oracle, build/search split proven output-invariant
    "q_sim_index_search" ->
      (Pq.ivfPqTopKSql("vec_id", "embedding", "label", "embeddings",
        "id < 8", k = 5, nprobe = 4, itersIvf = 4, massign = 2,
        m = 16, ksub = 32, itersPq = 2, rerank = 40)
        + " ORDER BY qid, rank"),

    // ...and so must the steady-state search over the prebuilt index
    "q_sim_index_search_only" ->
      (Pq.ivfPqTopKSql("vec_id", "embedding", "label", "embeddings",
        "id < 8", k = 5, nprobe = 4, itersIvf = 4, massign = 2,
        m = 16, ksub = 32, itersPq = 2, rerank = 40)
        + " ORDER BY qid, rank"),

    // flat (no-PQ) serving must equal the in-plan trained-IVF top-k
    "q_sim_index_flat" ->
      (Similarity.ivfTrainedTopKSql("vec_id", "embedding", "label",
        "embeddings", "id < 8", k = 5, nprobe = 4, iters = 4, dim = 64,
        massign = 2) + " ORDER BY qid, rank"),

    // ...and the SQ tier must equal the in-plan IVF×SQ search
    "q_sim_index_sq" ->
      (Sq.ivfSqTopKSql("vec_id", "embedding", "label", "embeddings",
        "id < 8", k = 5, nprobe = 4, itersIvf = 4, massign = 2,
        rerank = 40) + " ORDER BY qid, rank"),

    // build-on-half + append-half: the oracle trains on the even ids
    // only (trainPredSql) but assigns/encodes the whole corpus — the
    // Spark side's append must land on the identical result
    "q_sim_index_append" ->
      (Pq.ivfPqTopKSql("vec_id", "embedding", "label", "embeddings",
        "id < 8", k = 5, nprobe = 4, itersIvf = 4, massign = 2,
        m = 16, ksub = 32, itersPq = 2, rerank = 40,
        trainPredSql = "id % 2 = 0")
        + " ORDER BY qid, rank"),

    // train on everything, candidates = survivors only — the delete
    // contract (fixed trained params, shrunken encoded set)
    "q_sim_index_delete" ->
      (Pq.ivfPqTopKSql("vec_id", "embedding", "label", "embeddings",
        "id < 8", k = 5, nprobe = 4, itersIvf = 4, massign = 2,
        m = 16, ksub = 32, itersPq = 2, rerank = 40,
        candPredSql = "a.id % 2 = 0")
        + " ORDER BY qid, rank"),

    // identical truth: the manifest commit mode may not change results
    "q_sim_index_append_commit" ->
      (Pq.ivfPqTopKSql("vec_id", "embedding", "label", "embeddings",
        "id < 8", k = 5, nprobe = 4, itersIvf = 4, massign = 2,
        m = 16, ksub = 32, itersPq = 2, rerank = 40,
        trainPredSql = "id % 2 = 0")
        + " ORDER BY qid, rank"),

    "q_sim_ivf" ->
      (Similarity.ivfTopKSql("vec_id", "embedding", "label", "embeddings",
        "id < 8", k = 5, nprobe = 2) + " ORDER BY qid, rank"),

    "q_sim_ivf_recall" ->
      Similarity.ivfRecallSql("vec_id", "embedding", "label", "embeddings",
        "id < 8", k = 5, nprobe = 2, iters = 4, dim = 64, massign = 2),

    "q_sim_ivf_sweep" ->
      Similarity.ivfRecallSweepSql("vec_id", "embedding", "label", "embeddings",
        "id < 8", k = 5, nprobes = Seq(1, 2, 4), iters = 4, dim = 64,
        massign = 2),

    "q_sim_mrl_recall" ->
      (Similarity.mrlRecallSql("vec_id", "embedding", "embeddings",
        "id < 8", k = 5, dims = Seq(8, 16, 32)) + " ORDER BY dim, qid"),

    "q_sim_mrl_rerank" ->
      (Similarity.mrlRerankSql("vec_id", "embedding", "embeddings",
        "id < 8", k = 5, dim = 16, factor = 4) + " ORDER BY qid, rank"),

    "q_sim_knngraph" ->
      (Similarity.knnGraphSql("vec_id", "embedding", "label", "embeddings",
        k = 5, iters = 2, dim = 64, massign = 2)
        + " ORDER BY src_id, rank"),

    "q_sim_knngraph_sqrtn" ->
      (Similarity.knnGraphSql("vec_id", "embedding", "(vec_id % 32)",
        "embeddings", k = 5, iters = 2, dim = 64, massign = 2)
        + " ORDER BY src_id, rank"),

    // train on everything, membership = survivors on both sides —
    // the graph delete contract (sqrt-n seeded, round 12)
    "q_sim_graph_delete" ->
      (Similarity.knnGraphSql("vec_id", "embedding", "(vec_id % 32)",
        "embeddings", k = 5, iters = 2, dim = 64, massign = 2,
        memberPredSql = "a1.id % 3 <> 0 AND a2.id % 3 <> 0")
        + " ORDER BY src_id, rank"),

    // train on the even half only, block the whole corpus — the
    // fixed-centroid rebuild the Spark-side append must equal
    // (sqrt-n seeded, round 12)
    "q_sim_graph_append" ->
      (Similarity.knnGraphSql("vec_id", "embedding", "(vec_id % 64)",
        "embeddings", k = 5, iters = 2, dim = 64, massign = 2,
        trainPredSql = "id % 2 = 0")
        + " ORDER BY src_id, rank"),

    "q_sim_knnlabel" ->
      (Similarity.knnClassifySql("vec_id", "embedding", "label", "embeddings",
        k = 5, iters = 2, dim = 64, massign = 2)
        + " ORDER BY id"),

    "q_sim_centroid" ->
      (Similarity.centroidClassifySql("vec_id", "embedding", "label",
        "embeddings", "id % 2 = 0", dim = 64) + " ORDER BY id"),

    "q_sim_pagerank" ->
      (Graph.pageRankSql(
        "SELECT src_id AS src, neighbor_id AS dst FROM ("
          + Similarity.knnGraphSql("vec_id", "embedding", "label",
            "embeddings", k = 5, iters = 2, dim = 64, massign = 2) + ")",
        iters = 3) + " ORDER BY id"),

    "q_curate_split" ->
      (Curation.splitCountsSql("doc_id", "text", "source", "documents",
        trainPct = 70, valPct = 15) + " ORDER BY source, split"),

    "q_curate_pack" ->
      (Curation.packBinsSql("doc_id", "text", "source", "documents",
        budget = 4096L) + " ORDER BY source, bin"),

    "q_curate_calibrate" ->
      (Curation.qualityCalibrateSql("doc_id", "text", "source", "documents",
        keepPct = 60) + " ORDER BY source"),

    "q_curate_exemplars" ->
      (Curation.qualityFuseTopNSql("doc_id", "text", "source", "documents",
        n = 20) + " ORDER BY source, rank"),

    "q_curate_contamination" ->
      (Curation.contaminationSql("doc_id", "text", "documents",
        "doc_id % 20 = 0", k = 3) + " ORDER BY bench_id"),

    // X117 shares X46's oracle VERBATIM: the Bloom stage is a pure
    // prune, so the two plans must hash-match through the driver.
    "q_curate_contamination_bloom" ->
      (Curation.contaminationSql("doc_id", "text", "documents",
        "doc_id % 20 = 0", k = 3) + " ORDER BY bench_id"),

    "q_curate_mix" ->
      (Curation.mixCountsSql("doc_id", "text", "source", "documents",
        Map("src0" -> 1.0, "src1" -> 0.8, "src2" -> 0.1), default = 0.5)
        + " ORDER BY source"),

    "q_curate_leakage" ->
      (Curation.splitLeakageSql("doc_id", "text", "documents",
        k = 3, threshold = 0.2, trainPct = 70, valPct = 15)
        + " ORDER BY split_a, split_b"),

    "q_curate_overlap" ->
      (Curation.sourceOverlapSql("doc_id", "text", "source", "documents",
        k = 3, threshold = 0.2) + " ORDER BY source_a, source_b"),

    "q_curate_nbclassify" ->
      (Curation.nbConfusionSql("doc_id", "text", "source", "documents",
        "doc_id % 5 <> 0", nBuckets = 512)
        + " ORDER BY label, predicted, split"),

    "q_curate_epochshuffle" ->
      (Curation.epochShuffleSql("doc_id", "documents",
        nShards = 32, salt = "e1") + " ORDER BY shard"),

    "q_curate_nbtopgrams" ->
      (Curation.nbTopGramsSql("doc_id", "text", "source", "documents",
        "doc_id % 5 <> 0", nBuckets = 512, m = 10)
        + " ORDER BY c_label, rank"),

    "q_curate_clustersample" ->
      (Similarity.clusterSampleSql("vec_id", "embedding", "label",
        "embeddings", iters = 2, dim = 64, n = 40)
        + " ORDER BY cl, rank"),

    "q_curate_stratified" ->
      (Curation.stratifiedSampleSql("doc_id", "source", "documents", n = 100)
        + " ORDER BY source, rank"),

    "q_curate_dedupsample" ->
      (Curation.dedupedSampleSql("doc_id", "text", "source", "documents",
        n = 50, k = 3, numHashes = 32, bands = 8, rows = 4,
        threshold = 0.2) + " ORDER BY source, rank"),

    "q_curate_card" ->
      (Curation.datasetCardSql("doc_id", "text", "source", "documents")
        + " ORDER BY source"),

    "q_io_jsonl" ->
      (IoFormats.jsonlRoundTripSql("doc_id", "text", "source", "documents")
        + " ORDER BY source"),

    "q_io_shards" ->
      (IoFormats.shardedExportSql("doc_id", "text", "documents",
        nShards = 16) + " ORDER BY shard"),

    "q_io_wet" ->
      IoFormats.wetExportSql("doc_id", "text", "documents", nShards = 8),

    "q_text_entropy" ->
      (TextAnalysis.charEntropySql("doc_id", "text", "documents")
        + " ORDER BY id"),

    "q_text_normalize" -> {
      val norm = TextAnalysis.normalizeTextSql("text")
      s"""SELECT doc_id,
         |  md5($norm) AS norm_fp,
         |  md5(${TextAnalysis.normalizedKeySql("text")}) AS key_fp,
         |  length($norm)::BIGINT AS n_chars_norm,
         |  (length(text) - length($norm))::BIGINT AS n_removed
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "q_diag_quantiles" ->
      (Diagnostics.lengthQuantileSketchSql("text", "source",
        "documents", pcts = Seq(50, 90, 99)) + " ORDER BY source, pct"),

    "q_text_distinct_sketch" ->
      s"""SELECT coalesce(source::VARCHAR, '<null>') AS source,
         |  count(DISTINCT tok)::BIGINT AS n_distinct,
         |  1::BIGINT AS hll_within_tol
         |FROM (SELECT source, unnest(${TextAnalysis.tokensSql("text")}) AS tok
         |      FROM documents)
         |GROUP BY 1 ORDER BY source""".stripMargin,

    "q_curate_semleak" ->
      (Curation.semanticLeakageSql("vec_id", "embedding", "label",
        "embeddings", threshold = 0.3, trainPct = 80, valPct = 10)
        + " ORDER BY split_a, split_b"),

    "q_olap_value_quantiles" ->
      (Diagnostics.valueQuantileSketchSql("value", "event_type", "events",
        pcts = Seq(50, 95, 99)) + " ORDER BY source, pct"),

    "q_text_runcollapse" -> {
      val ts = TextAnalysis.tokensSql("text")
      val clean = TextAnalysis.runCollapseSql("ts", maxRun = 2)
      s"""WITH base AS (
         |  SELECT doc_id, $ts AS ts FROM documents)
         |SELECT doc_id,
         |  md5(array_to_string($clean, ' ')) AS fp_clean,
         |  len(ts)::BIGINT AS n_tokens,
         |  (len(ts) - len($clean))::BIGINT AS n_removed
         |FROM base ORDER BY doc_id""".stripMargin
    },

    "q_curate_urldedup" ->
      s"""WITH r AS (SELECT unnest(range(0, 64)) AS i),
         |u AS (SELECT ${Urls.canonicalizeSql(
             IoFormats.messyUriSql("i", 64))} AS canon_url FROM r)
         |SELECT canon_url, count(*)::BIGINT AS n_dup
         |FROM u GROUP BY 1 ORDER BY canon_url""".stripMargin,

    "q_text_html" -> {
      val html = s"'${TextAnalysis.HtmlWrapPrefix}' || text || " +
        s"'${TextAnalysis.HtmlWrapSuffix}'"
      val extracted = TextAnalysis.htmlToTextSql(html)
      s"""SELECT doc_id, md5($extracted) AS fp_text,
         |  length($extracted)::BIGINT AS n_chars
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "q_io_warc" -> {
      val pay = IoFormats.warcPayloadSql("i")
      s"""WITH r AS (SELECT unnest(range(0, 64)) AS i),
         |k AS (SELECT unnest(['gz', 'plain']) AS kind),
         |p AS (SELECT kind, i, $pay AS pay FROM r, k)
         |SELECT kind, i::BIGINT AS rec_idx, 'response' AS warc_type,
         |  ${IoFormats.warcUriSql("i")} AS uri,
         |  length(pay)::BIGINT AS content_length,
         |  md5(pay) AS payload_md5
         |FROM p ORDER BY kind, rec_idx""".stripMargin
    },

    "q_text_pii" -> {
      val counts = TextAnalysis.piiCountsSql("text")
        .map { case (n, e) => s"$e AS $n" }.mkString(",\n  ")
      s"""SELECT doc_id,
         |  ${TextAnalysis.md5FingerprintSql(TextAnalysis.piiRedactSql("text"))}
         |    AS fp_redacted,
         |  $counts
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "q_curate_chunks" ->
      (Curation.chunkWindowsSql("doc_id", "text", "documents",
        chunkLen = 64, stride = 48, minTokens = 16)
        + " ORDER BY doc_id, chunk_idx"),

    "q_curate_dsir" ->
      (Curation.dsirWeightsSql("doc_id", "text", "documents",
        "source = 'src0'", nBuckets = 1024) + " ORDER BY doc_id"),

    "q_curate_resample" ->
      Curation.importanceResampleSql(
        Curation.dsirWeightsSql("doc_id", "text", "documents",
          "source = 'src0'", nBuckets = 1024),
        "doc_id", "logw_micros", n = 50, salt = "rs"),

    "q_curate_boilerplate" ->
      (Curation.boilerplateRemoveSql("doc_id", "text", "documents",
        segLen = 8, maxDf = 12) + " ORDER BY doc_id"),

    "q_curate_temperature" ->
      (Curation.temperatureMixSql("doc_id", "text", "source", "documents",
        alpha = 0.7) + " ORDER BY source"),

    "q_curate_budget" ->
      (Curation.tokenBudgetPlanSql("doc_id", "text", "source", "documents",
        alpha = 0.7, budget = 40000L, maxEpochsPct = 150)
        + " ORDER BY source"),

    "q_curate_curve" ->
      (Curation.filterCurveSql("doc_id", "text", "documents",
        "lang = 'en'") + " ORDER BY pct"),

    "q_curate_cluster_split" ->
      (Curation.clusterSplitSql("doc_id", "documents",
        Dedup.minhashPairsSql("doc_id", "text", "documents",
          k = 3, numHashes = 32, bands = 8, rows = 4, threshold = 0.2),
        trainPct = 80, valPct = 10) + " ORDER BY doc_id"),

    "q_curate_diff" ->
      (Curation.snapshotDiffSql(
        "SELECT doc_id, text FROM documents WHERE doc_id % 10 != 3",
        """SELECT doc_id,
          |  CASE WHEN doc_id % 11 = 0 THEN text || ' edited'
          |       WHEN doc_id % 5 = 0 THEN text || '  '
          |       ELSE text END AS text
          |FROM documents WHERE doc_id % 7 != 2""".stripMargin)
        + " ORDER BY doc_id"),

    "q_curate_domcap" ->
      (Curation.sourceCapSql("doc_id", "text", "source", "documents",
        cap = 10) + " ORDER BY r.source, rnk"),

    "q_text_percentiles" ->
      (Curation.lengthPercentilesSql("doc_id", "text", "source",
        "documents") + " ORDER BY c.source, pct"),

    "q_text_lm" ->
      (TextAnalysis.lmScoreSql("doc_id", "text", "documents",
        "lang = 'en'", nBuckets = 2048) + " ORDER BY doc_id"),

    "q_text_rm3" ->
      (Retrieval.prfExpandTopKSql("doc_id", "text", "documents",
        k = 10, fbDocs = 5, fbTerms = 5) + " ORDER BY qid, rank"),

    "q_text_ccnet" ->
      (Curation.ccnetBucketsSql("doc_id", "text", "source", "documents",
        "lang = 'en'", nBuckets = 2048) + " ORDER BY doc_id"),

    // the frozen twin shares the in-plan PRF oracle verbatim
    "q_text_rm3_frozen" ->
      (Retrieval.prfExpandTopKSql("doc_id", "text", "documents",
        k = 10, fbDocs = 5, fbTerms = 5) + " ORDER BY qid, rank"),

    // the serve-only twin shares it too: caching the freeze cannot
    // change the served ranking
    "q_text_rm3_frozen_serve" ->
      (Retrieval.prfExpandTopKSql("doc_id", "text", "documents",
        k = 10, fbDocs = 5, fbTerms = 5) + " ORDER BY qid, rank"),

    "q_text_bm25" ->
      (Retrieval.bm25TopKSql("doc_id", "text", "documents", k = 10)
        + " ORDER BY qid, rank"),

    "q_text_bm25_pruned" ->
      (Retrieval.bm25PrunedTopKSql("doc_id", "text", "documents",
        k = 10, m = 15) + " ORDER BY qid, rank"),

    "q_text_retrieval_metrics" ->
      (Retrieval.bm25MetricsSql("doc_id", "text", "documents", k = 10)
        + " ORDER BY 1"),

    // X149: the artifact serves the EXACT in-plan ranking — all three
    // lifecycle gates run against plain bm25TopKSql over the corpus
    // the maintained artifact should equal (full / union / survivors)
    "q_text_index_search" ->
      (Retrieval.bm25TopKSql("doc_id", "text", "documents", k = 10)
        + " ORDER BY qid, rank"),

    "q_text_index_append" ->
      (Retrieval.bm25TopKSql("doc_id", "text", "documents", k = 10)
        + " ORDER BY qid, rank"),

    "q_text_index_metrics" ->
      (Retrieval.bm25MetricsSql("doc_id", "text", "documents", k = 10)
        + " ORDER BY 1"),

    "q_text_index_delete" ->
      (Retrieval.bm25TopKSql("doc_id", "text",
        "(SELECT * FROM documents WHERE doc_id % 3 <> 0)", k = 10)
        + " ORDER BY qid, rank"),

    // X150: the artifact-served twins share the in-plan phrase oracle
    // (serving is bit-identical by construction)
    "q_text_phrase" ->
      (Retrieval.phraseTopKSql("doc_id", "text", "documents", k = 10)
        + " ORDER BY pid, rank"),

    "q_text_index_phrase" ->
      (Retrieval.phraseTopKSql("doc_id", "text", "documents", k = 10)
        + " ORDER BY pid, rank"),

    "q_text_index_phrase_upd" ->
      (Retrieval.phraseTopKSql("doc_id", "text",
        "(SELECT * FROM documents WHERE doc_id % 3 <> 0)", k = 10)
        + " ORDER BY pid, rank"),

    "q_text_near" ->
      (Retrieval.nearTopKSql("doc_id", "text", "documents", k = 10)
        + " ORDER BY qid, rank"),

    "q_text_kwic" ->
      (Retrieval.kwicTopKSql("doc_id", "text", "documents", k = 5)
        + " ORDER BY qid, rank"),

    "q_text_index_kwic" ->
      (Retrieval.kwicTopKSql("doc_id", "text", "documents", k = 5)
        + " ORDER BY qid, rank"),

    // X154: in-plan and artifact-served share the oracle
    "q_text_phrase_sloppy" ->
      (Retrieval.sloppyTopKSql("doc_id", "text", "documents", k = 10)
        + " ORDER BY pid, rank"),

    "q_text_index_phrase_sloppy" ->
      (Retrieval.sloppyTopKSql("doc_id", "text", "documents", k = 10)
        + " ORDER BY pid, rank"),

    // X155: bm25TopKSql as the ranking subquery + the same
    // first-hit-window extraction
    "q_text_kwic_multi" ->
      (Retrieval.kwicMultiTopKSql("doc_id", "text", "documents", k = 10)
        + " ORDER BY qid, rank"),

    "q_text_index_kwic_multi" ->
      (Retrieval.kwicMultiTopKSql("doc_id", "text", "documents", k = 10)
        + " ORDER BY qid, rank"),

    // X156: BM25 over the LWW-merged surviving corpus (backfill docs
    // ⊎ regex-filtered live changes, winner per key by (ts, prec,
    // seq), tombstones out) — the maintained index must serve exactly
    // this corpus's ranking
    "q_pipe_cdc_index" ->
      (Retrieval.bm25TopKSql("doc_id", "text",
        s"""(SELECT key AS doc_id, text FROM (
           |  SELECT u.*, row_number() OVER (PARTITION BY key
           |      ORDER BY ts_sec DESC, prec DESC, seq DESC) AS rn
           |  FROM (
           |    SELECT doc_id::BIGINT AS key, text, 'Backfill' AS op,
           |      1::BIGINT AS ts_sec, -1::BIGINT AS seq, 0 AS prec
           |    FROM documents
           |    UNION ALL
           |    SELECT (event_id % 700 + 1)::BIGINT AS key,
           |      'revised ' || $tableSql || ' entry hash join scan ' ||
           |        coalesce($afterSql, '') AS text,
           |      $opSql AS op, epoch_ns(ts) // 1000000000 AS ts_sec,
           |      event_id AS seq, 1 AS prec
           |    FROM events
           |    WHERE event_id % 37 = 0
           |      AND regexp_matches($dbSql || '.' || $tableSql,
           |      '^db[0-2]\\.(users|orders)$$')) u)
           | WHERE rn = 1 AND op <> 'Delete')""".stripMargin, k = 10)
        + " ORDER BY qid, rank"),

    // X158: the in-plan IVF×PQ twin over the LWW-merged corpus
    // (originals minus touched keys ⊎ upserted keys carrying their
    // donor key%250's vector), TRAINED on the untouched id<250 half —
    // exactly upsert's fixed-trained-params contract
    "q_pipe_cdc_ann" ->
      (Pq.ivfPqTopKSql("id", "vec", "label", cdcAnnMergedSql,
        "id < 8", k = 5, nprobe = 4, itersIvf = 4, massign = 2,
        m = 16, ksub = 32, itersPq = 2, rerank = 40,
        trainPredSql = "id < 250")
        + " ORDER BY qid, rank"),

    // X159: the in-plan fixed-centroid kNN graph over the same merged
    // corpus, trained on the untouched id<250 half — delete+append's
    // composition must land on the full rebuild at stored centroids
    "q_pipe_cdc_graph" ->
      (Similarity.knnGraphSql("id", "vec", "(id % 64)",
        cdcAnnMergedSql, k = 5, iters = 2, dim = 64, massign = 2,
        trainPredSql = "id < 250")
        + " ORDER BY src_id, rank"),

    // X160: the three serve oracles UNION ALL'd with aligned columns —
    // the text twin's merged corpus keys revisions in the embeddings
    // domain (%250+250); the ANN/graph twins are X158/X159's verbatim
    // (same stream, same winners, shared artifacts)
    "q_pipe_cdc_all" -> {
      val textSql = Retrieval.bm25TopKSql("doc_id", "text",
        s"""(SELECT key AS doc_id, text FROM (
           |  SELECT u.*, row_number() OVER (PARTITION BY key
           |      ORDER BY ts_sec DESC, prec DESC, seq DESC) AS rn
           |  FROM (
           |    SELECT doc_id::BIGINT AS key, text, 'Backfill' AS op,
           |      1::BIGINT AS ts_sec, -1::BIGINT AS seq, 0 AS prec
           |    FROM documents
           |    UNION ALL
           |    SELECT (event_id % 250 + 250)::BIGINT AS key,
           |      'revised ' || $tableSql || ' entry hash join scan ' ||
           |        coalesce($afterSql, '') AS text,
           |      $opSql AS op, epoch_ns(ts) // 1000000000 AS ts_sec,
           |      event_id AS seq, 1 AS prec
           |    FROM events
           |    WHERE event_id % 37 = 0
           |      AND regexp_matches($dbSql || '.' || $tableSql,
           |      '^db[0-2]\\.(users|orders)$$')) u)
           | WHERE rn = 1 AND op <> 'Delete')""".stripMargin, k = 10)
      val annSql = Pq.ivfPqTopKSql("id", "vec", "label",
        cdcAnnMergedSql, "id < 8", k = 5, nprobe = 4, itersIvf = 4,
        massign = 2, m = 16, ksub = 32, itersPq = 2, rerank = 40,
        trainPredSql = "id < 250")
      val graphSql = Similarity.knnGraphSql("id", "vec", "(id % 64)",
        cdcAnnMergedSql, k = 5, iters = 2, dim = 64, massign = 2,
        trainPredSql = "id < 250")
      s"""SELECT 'text' AS fam, qid::BIGINT AS q, rank::BIGINT AS rank,
         |  doc_id::BIGINT AS hit, score_micros::BIGINT AS score
         |FROM ($textSql)
         |UNION ALL
         |SELECT 'ann' AS fam, qid::BIGINT, rank::BIGINT,
         |  neighbor_id::BIGINT, cos_micros::BIGINT
         |FROM ($annSql)
         |UNION ALL
         |SELECT 'graph' AS fam, src_id::BIGINT, rank::BIGINT,
         |  neighbor_id::BIGINT, cos_micros::BIGINT
         |FROM ($graphSql)
         |ORDER BY fam, q, rank""".stripMargin
    },

    // X152: BM25 over the corpus minus every phrase-matching doc
    "q_text_index_takedown" ->
      (Retrieval.bm25TopKSql("doc_id", "text",
        Retrieval.phraseExcludeSql("doc_id", "text", "documents",
          Seq("hash", "join")), k = 10)
        + " ORDER BY qid, rank"),

    "q_text_index_near" ->
      (Retrieval.nearTopKSql("doc_id", "text", "documents", k = 10)
        + " ORDER BY qid, rank"),

    "q_text_retrieval_metrics_rrf" ->
      (Retrieval.retrievalMetricsSql(
        Retrieval.rrfFuseSql(
          Retrieval.bm25TopKSql("doc_id", "text", "documents", k = 10),
          "doc_id",
          Similarity.bruteForceTopKSql("vec_id", "embedding",
            "embeddings", "id < 4", k = 10),
          "neighbor_id", k = 10),
        "doc_id", "text", "documents", k = 10) + " ORDER BY 1"),

    "q_text_bm25_pruned_recall" ->
      (Retrieval.bm25PrunedRecallSql("doc_id", "text", "documents",
        k = 10, m = 15) + " ORDER BY qid"),

    "q_hybrid_rrf" ->
      (Retrieval.rrfFuseSql(
        Retrieval.bm25TopKSql("doc_id", "text", "documents", k = 10),
        "doc_id",
        Similarity.bruteForceTopKSql("vec_id", "embedding", "embeddings",
          "id < 4", k = 10),
        "neighbor_id", k = 10) + " ORDER BY qid, rank"),

    "q_dedup_semantic" ->
      (Dedup.dupClustersSql(Dedup.semanticPairsSql("vec_id", "embedding",
        "label", "embeddings", iters = 2, dim = 64, threshold = 0.35))
        + " ORDER BY id"),

    "q_mm_decode" ->
      (Multimodal.decodeImagesSql("documents") + " ORDER BY media_id"),

    "q_mm_audio" ->
      (Multimodal.decodeAudioSql("documents") + " ORDER BY media_id"),

    "q_mm_video" ->
      (Multimodal.decodeVideoFramesSql("documents", stride = 2,
        maxFrames = 3) + " ORDER BY media_id, frame_idx"),

    // the serve-only twin shares it: pre-staged bytes, same frames
    "q_mm_video_decode" ->
      (Multimodal.decodeVideoFramesSql("documents", stride = 2,
        maxFrames = 3) + " ORDER BY media_id, frame_idx"),

    "q_mm_frames" ->
      (Multimodal.framesSql("documents", stride = 2, maxFrames = 3)
        + " ORDER BY media_id, frame_idx"),

    "q_mm_resize" ->
      (Multimodal.resizeImagesSql("documents", maxDim = 16)
        + " ORDER BY media_id"),

    "q_mm_features" ->
      (Multimodal.imageFeaturesSql("documents")
        + " ORDER BY media_id, feat_idx")
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

  /** The q_pipe_cdc_ann LWW winners over the live change stream —
    * key ∈ [250,500), per-key (ts, seq)-max (backfill always loses:
    * its placeholder ts_sec=1 predates every event).
    */
  private lazy val cdcAnnWinnersSql =
    s"""SELECT key, op FROM (
       |  SELECT (event_id % 250 + 250)::BIGINT AS key, $opSql AS op,
       |    row_number() OVER (PARTITION BY (event_id % 250 + 250)
       |      ORDER BY epoch_ns(ts) // 1000000000 DESC, event_id DESC) AS rn
       |  FROM events
       |  WHERE event_id % 37 = 0
       |    AND regexp_matches($dbSql || '.' || $tableSql,
       |    '^db[0-2]\\.(users|orders)$$')) w
       | WHERE rn = 1""".stripMargin

  /** The merged ANN corpus: untouched originals ⊎ upserted keys with
    * their donor key%250's vector; tombstoned keys absent. One row
    * per surviving id — the table the IVF×PQ oracle runs over.
    */
  private lazy val cdcAnnMergedSql =
    s"""(SELECT e.vec_id AS id, e.embedding AS vec, e.label
       | FROM embeddings e
       | WHERE e.vec_id NOT IN (SELECT key FROM ($cdcAnnWinnersSql))
       | UNION ALL
       | SELECT w.key AS id, d.embedding AS vec, d.label
       | FROM ($cdcAnnWinnersSql) w
       | JOIN embeddings d ON d.vec_id = w.key % 250
       | WHERE w.op <> 'Delete')""".stripMargin

  private lazy val asofOracle =
    s"""WITH c AS (
       |  SELECT event_id, $dbSql AS db, $tableSql AS "table",
       |    epoch_ns(ts) // 1000 AS ts_us FROM events),
       |m AS (
       |  SELECT db, "table", ts_us,
       |    CASE WHEN lag(ts_us) OVER w IS NULL
       |      OR ts_us - lag(ts_us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_sess
       |  FROM c WINDOW w AS (PARTITION BY db, "table" ORDER BY ts_us)),
       |g AS (
       |  SELECT *, sum(new_sess) OVER (PARTITION BY db, "table" ORDER BY ts_us
       |    ROWS UNBOUNDED PRECEDING) AS sid FROM m),
       |sess AS (
       |  SELECT db, "table", min(ts_us)::BIGINT AS sess_start_us
       |  FROM g GROUP BY db, "table", sid)
       |SELECT c.event_id, c.db, c."table", c.ts_us::BIGINT AS ts_us,
       |  s.sess_start_us
       |FROM c ASOF JOIN sess s
       |  ON c.db = s.db AND c."table" = s."table" AND c.ts_us >= s.sess_start_us
       |ORDER BY event_id""".stripMargin

  private lazy val sessionsOracle =
    s"""WITH c AS (
       |  SELECT $dbSql AS db, $tableSql AS "table",
       |    epoch_ns(ts) // 1000 AS ts_us FROM events),
       |m AS (
       |  SELECT db, "table", ts_us,
       |    CASE WHEN lag(ts_us) OVER w IS NULL
       |      OR ts_us - lag(ts_us) OVER w >= 1800000000 THEN 1 ELSE 0 END AS new_sess
       |  FROM c WINDOW w AS (PARTITION BY db, "table" ORDER BY ts_us)),
       |g AS (
       |  SELECT *, sum(new_sess) OVER (PARTITION BY db, "table" ORDER BY ts_us
       |    ROWS UNBOUNDED PRECEDING) AS sid FROM m)
       |SELECT db, "table", min(ts_us)::BIGINT AS sess_start_us,
       |  (max(ts_us) + 1800000000)::BIGINT AS sess_end_us,
       |  count(*)::BIGINT AS n_changes
       |FROM g GROUP BY db, "table", sid
       |ORDER BY db, "table", sess_start_us""".stripMargin
}
