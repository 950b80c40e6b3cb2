package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-log product analytics: cohort retention and ordered funnels.
  * The classic warehouse queries a CDC pipeline feeds (the reference
  * ships its changes TO a warehouse — these are the queries that run
  * there), expressed scale-first over the change stream's event table.
  *
  * == Determinism contract ==
  *
  * Time is bucketed by pure integer arithmetic on epoch micros
  * (floor(ts_us / week_us), spelled as an exact integer floor-division
  * so Spark's truncate-toward-zero `div` and DuckDB's flooring `//`
  * agree even pre-epoch) — no calendar functions, so the engines can
  * never disagree on week boundaries (ISO-vs-locale week conventions,
  * DST). NULL timestamps are filtered on both engines. Conversion
  * ratios are micro-quantized once at the end; every upstream value
  * is a count or a min — exact.
  *
  * == 100 TB shape ==
  *
  *  - [[retention]] is TWO shuffles, both partial-aggregated: one
  *    groupBy(user) collapsing each user's (bounded: one per active
  *    week) week set, then the narrow cohort/offset explode re-groups
  *    on the (cohort, offset) matrix — output |weeks|² rows. No join,
  *    no distinct-then-join double shuffle.
  *  - [[funnel]] is one shuffle per stage, ALL on the same user key:
  *    each stage joins the previous stage's (user, ts) watermark and
  *    re-aggregates — Spark reuses the hash partitioning across the
  *    chain, and stage frames only carry users still in the funnel
  *    (monotonically shrinking).
  */
object Events {

  private val WeekUs = 604800L * 1000000L // 7 * 86400 s, in micros

  /** Weekly cohort retention matrix: users grouped by their first
    * active week (integer weeks since epoch), counted in each later
    * week they return. Output: (cohort_week, week_offset, n_users) —
    * offset 0 row is the cohort size.
    */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame =
    events
      // NULL timestamps carry no week — dropped on BOTH engines (the
      // oracle filters identically), so no NULL-cohort row divergence.
      // Floor division spelled as (a - pmod(a,b)) div b: exact (the
      // numerator is divisible by b) and FLOORS for pre-epoch micros
      // (ts before 1970 lands in week -1, not sharing bucket 0 with
      // post-epoch rows). Spark's `div` and DuckDB's `//` both
      // truncate toward zero, so the oracle spells the SAME
      // subtract-positive-mod floor — engines agree by construction.
      .filter(col(tsCol).isNotNull)
      .select(col(userCol).as("u"),
        expr(s"(unix_micros($tsCol) - pmod(unix_micros($tsCol), $WeekUs))" +
          s" div $WeekUs").as("wk"))
      .groupBy(col("u"))
      .agg(collect_set(col("wk")).as("wks"))
      .select(array_min(col("wks")).as("cohort_week"),
        explode(col("wks")).as("wk"))
      .groupBy(col("cohort_week"),
        (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))

  /** DuckDB twin of [[retention]] (distinct + self-join form — same
    * matrix, the engine-idiomatic spelling).
    */
  def retentionSql(user: String, ts: String, table: String): String =
    s"""WITH uw AS (
       |  SELECT DISTINCT $user AS u,
       |    (us - ((us % $WeekUs) + $WeekUs) % $WeekUs) // $WeekUs AS wk
       |  FROM (SELECT $user, epoch_ns($ts) // 1000 AS us
       |        FROM $table WHERE $ts IS NOT NULL)),
       |c AS (SELECT u, min(wk) AS cohort_week FROM uw GROUP BY u)
       |SELECT c.cohort_week::BIGINT AS cohort_week,
       |  (uw.wk - c.cohort_week)::BIGINT AS week_offset,
       |  count(*)::BIGINT AS n_users
       |FROM uw JOIN c ON uw.u = c.u
       |GROUP BY 1, 2""".stripMargin

  /** Strictly-ordered conversion funnel: a user converts at stage i
    * when some stage-i event lands strictly after their earliest
    * qualifying stage-(i−1) event (stage timestamps are the funnel's
    * running minima — the standard "first touch" semantics). Output:
    * one row per stage — (stage, event_type, n_users,
    * conv_micros) with conv_micros the step conversion vs the
    * previous stage (stage 1 = 1e6).
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty)
    val ev = Caching.cachedOnce(events.select(col(userCol).as("u"),
      col(typeCol).as("et"), unix_micros(col(tsCol)).as("ts_us")))
    // per-stage (u, t) watermark frames: earliest qualifying event
    val frames = stages.tail.scanLeft(
      ev.filter(col("et") === stages.head)
        .groupBy(col("u")).agg(min(col("ts_us")).as("t"))) {
      (prev, stage) =>
        ev.filter(col("et") === stage)
          .join(prev.select(col("u"), col("t").as("pt")), "u")
          .filter(col("ts_us") > col("pt"))
          .groupBy(col("u")).agg(min(col("ts_us")).as("t"))
    }
    // per-stage counts collapse to ONE row (n0..nK) — step conversion
    // needs adjacent pairs, and a crossJoin of one-row frames beats a
    // no-partition window (which would move "all" data to one task and
    // warn, even at 3 rows). The one-row frame is cached so the K
    // output rows don't each recompute the funnel chain.
    val wide = Caching.cachedOnce(
      frames.zipWithIndex
        .map { case (f, i) => f.agg(count(lit(1)).cast("long").as(s"n$i")) }
        .reduce(_ crossJoin _))
    stages.zipWithIndex.map { case (stage, i) =>
      // an empty prior stage converts nobody: conv 0, not a 0/0 error
      // (ANSI divide) — the oracle spells the same CASE
      wide.select(lit(i + 1L).as("stage"), lit(stage).as("event_type"),
        col(s"n$i").as("n_users"),
        (if (i == 0) lit(1000000L)
         else when(col(s"n${i - 1}") === 0L, lit(0L))
           .otherwise(round(col(s"n$i").cast("double") / col(s"n${i - 1}")
             * 1e6).cast("long"))).as("conv_micros"))
    }.reduce(_ unionByName _)
  }

  /** DuckDB twin of [[funnel]] for the fixed 3-stage shape. */
  def funnelSql(user: String, typ: String, ts: String, table: String,
      stages: Seq[String]): String = {
    require(stages.size == 3, "oracle twin is written for 3 stages")
    val (s1, s2, s3) = (stages(0), stages(1), stages(2))
    s"""WITH ev AS (
       |  SELECT $user AS u, $typ AS et, epoch_ns($ts) // 1000 AS ts_us
       |  FROM $table),
       |f1 AS (SELECT u, min(ts_us) AS t FROM ev WHERE et = '$s1' GROUP BY u),
       |f2 AS (SELECT e.u, min(e.ts_us) AS t FROM ev e JOIN f1 ON e.u = f1.u
       |  WHERE e.et = '$s2' AND e.ts_us > f1.t GROUP BY e.u),
       |f3 AS (SELECT e.u, min(e.ts_us) AS t FROM ev e JOIN f2 ON e.u = f2.u
       |  WHERE e.et = '$s3' AND e.ts_us > f2.t GROUP BY e.u),
       |n AS (SELECT (SELECT count(*) FROM f1) AS n1,
       |  (SELECT count(*) FROM f2) AS n2, (SELECT count(*) FROM f3) AS n3)
       |SELECT 1::BIGINT AS stage, '$s1' AS event_type, n1::BIGINT AS n_users,
       |  1000000::BIGINT AS conv_micros FROM n
       |UNION ALL SELECT 2, '$s2', n2,
       |  (CASE WHEN n1 = 0 THEN 0
       |    ELSE round(n2::DOUBLE / n1 * 1e6) END)::BIGINT FROM n
       |UNION ALL SELECT 3, '$s3', n3,
       |  (CASE WHEN n2 = 0 THEN 0
       |    ELSE round(n3::DOUBLE / n2 * 1e6) END)::BIGINT FROM n""".stripMargin
  }
}
