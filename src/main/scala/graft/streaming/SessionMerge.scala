package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch two-phase sessionization
  * (ops.Sessions.twoPhase, q_cdc_sessions2): the same
  * (key, time-bucket) parallelism shape, under watermarks.
  *
  * The built-in streaming `session_window` (Pipeline.sessionizedCounts)
  * keys its state by the session key alone — the change stream has 12
  * (db, table) targets, so event processing serializes onto 12 state
  * partitions no matter the cluster size, the same cap the batch
  * two-phase removes. Here:
  *
  *  - '''Phase 1''' ([[bucketSessions]]): `flatMapGroupsWithState`
  *    keyed by (db, table, bucket = floor(ts / bucketUs)). Every
  *    micro-batch folds its events into the bucket's session list
  *    (exact interval-merge — order of arrival can't matter). The
  *    group sets an event-time timeout at bucket end; when the
  *    WATERMARK passes it, no in-bucket event can still arrive, the
  *    bucket's local sessions are final, and they are emitted
  *    (append). State per group is bounded by the bucket's session
  *    count; parallelism is keys × buckets, exactly the batch phase-1
  *    exchange.
  *  - '''Phase 2''' ([[stitch]]): merges bucket-local sessions that
  *    straddle bucket boundaries — the batch phase-2 window over
  *    SESSIONS (not events; compressed by the per-bucket event
  *    density). Spark cannot chain a second stateful operator behind
  *    flatMapGroupsWithState (its output may carry event times behind
  *    the global watermark, which a downstream stateful op would
  *    silently discard as late — Spark's correctness check rejects the
  *    chain), so [[run]] appends each closed bucket's sessions — they
  *    are immutable facts once the watermark passes the bucket end —
  *    to an append-only store, and [[currentSessions]] stitches at
  *    read time: the same materialize-on-read shape as [[StateTable]].
  *
  * Session semantics match `session_window` and the batch twin: a new
  * session starts iff the gap to the previous event is >= gapUs;
  * session end = last event + gap.
  */
object SessionMerge {

  /** A bucket-local (or stitched) session: [start_us, last_us] with n
    * events. `bk` is the time bucket whose phase-1 group produced it.
    */
  case class LocalSess(db: String, table: String, bk: Long,
      start_us: Long, last_us: Long, n: Long)

  /** Final session row — the batch twin's output schema. */
  case class SessOut(db: String, table: String, sess_start_us: Long,
      sess_end_us: Long, n_changes: Long)

  /** Insert one event time into a start-sorted list of disjoint
    * sessions (start, last, n), merging every session within gapUs of
    * the point (an event can bridge two neighbors). Exact: the result
    * is the same maximal gap<gapUs grouping the batch sort computes,
    * for ANY arrival order.
    */
  private[graft] def insert(sessions: List[(Long, Long, Long)],
      tUs: Long, gapUs: Long): List[(Long, Long, Long)] = {
    val (near, far) = sessions.partition { case (a, b, _) =>
      tUs > a - gapUs && tUs < b + gapUs
    }
    val merged = near.foldLeft((tUs, tUs, 1L)) { case ((s, l, n), (a, b, m)) =>
      (math.min(s, a), math.max(l, b), n + m)
    }
    (merged :: far).sortBy(_._1)
  }

  private def phase1Fn(gapUs: Long, bucketUs: Long)(
      key: (String, String, Long), it: Iterator[Long],
      state: GroupState[List[(Long, Long, Long)]]): Iterator[LocalSess] = {
    val (db, table, bk) = key
    if (state.hasTimedOut) {
      val out = state.get.iterator.map { case (s, l, n) =>
        LocalSess(db, table, bk, s, l, n)
      }
      state.remove()
      out
    } else {
      var ss = state.getOption.getOrElse(Nil)
      it.foreach(t => ss = insert(ss, t, gapUs))
      state.update(ss)
      // final once the watermark passes bucket end: every event of this
      // bucket is younger than the horizon then. setTimeoutTimestamp
      // must stay ahead of the current watermark (late-straggler
      // groups time out on the next advance).
      val bucketEndMs = (bk + 1) * bucketUs / 1000
      state.setTimeoutTimestamp(
        math.max(bucketEndMs, state.getCurrentWatermarkMs() + 1))
      Iterator.empty
    }
  }

  /** Phase 1: watermarked bucket-local sessionization. `changes` must
    * carry db, table and an event-time `ts`; emits each bucket's final
    * sessions once the watermark passes its end.
    */
  def bucketSessions(changes: DataFrame, watermark: String, gapUs: Long,
      bucketUs: Long): Dataset[LocalSess] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .withWatermark("ts", watermark)
      // the event-time column must survive into the FMGWS input for
      // the event-time timeout to see the watermark
      .select(col("ts"), col("db"), col("table"),
        unix_micros(col("ts")).as("ts_us"),
        floor(unix_micros(col("ts")) / bucketUs).as("bk"))
      .as[(java.sql.Timestamp, String, String, Long, Long)]
      .groupByKey(r => (r._2, r._3, r._5))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (k: (String, String, Long),
            it: Iterator[(java.sql.Timestamp, String, String, Long, Long)],
            s: GroupState[List[(Long, Long, Long)]]) =>
          phase1Fn(gapUs, bucketUs)(k, it.map(_._4), s))
  }

  /** Launch the full streaming path: phase-1 bucket sessions, appended
    * to `sessDir` as they close. A closed bucket's local sessions are
    * IMMUTABLE facts (the watermark passed its end — no event can
    * still land in it), so the store is append-only and replay-safe;
    * [[currentSessions]] is the compaction-style read that stitches
    * them into final sessions. Events only ever transit the (keys ×
    * buckets)-parallel phase 1; everything downstream operates on
    * sessions, compressed by the per-bucket event density.
    */
  def run(changes: DataFrame, watermark: String, gapUs: Long,
      bucketUs: Long, sessDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    bucketSessions(changes, watermark, gapUs, bucketUs)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[LocalSess], _: Long) =>
        batch.write.mode("append").parquet(sessDir)
      }
      .start()

  /** Final sessions over every closed bucket in `sessDir` — the batch
    * phase-2 stitch ([[stitch]]) over the append-only session store.
    * Equal to the batch twin (ops.Sessions.twoPhase) over the same
    * (watermark-closed) events.
    */
  def currentSessions(spark: org.apache.spark.sql.SparkSession,
      sessDir: String, gapUs: Long): Dataset[SessOut] = {
    import spark.implicits._
    // distinct: foreachBatch appends are at-least-once on crash replay;
    // a replayed bucket emission re-appends byte-identical rows (one
    // session row is fully determined by its key+bucket+interval), so
    // dedup at read time restores exactly-once semantics
    stitch(spark.read.parquet(sessDir).distinct().as[LocalSess], gapUs)
  }

  /** Phase 2, batch form: stitch a set of bucket-local sessions into
    * final sessions — the exact batch phase-2 logic (consecutive
    * per-key sessions merge iff next.start − prev.last < gap), runnable
    * inside `foreachBatch` or a test. Input sessions of one key must be
    * pairwise disjoint (phase-1 output is).
    */
  def stitch(local: Dataset[LocalSess], gapUs: Long): Dataset[SessOut] = {
    val spark = local.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w2 = Window.partitionBy(col("db"), col("table")).orderBy(col("start_us"))
    val prevLast = lag(col("last_us"), 1).over(w2)
    local.toDF()
      .withColumn("new_grp",
        when(prevLast.isNull || col("start_us") - prevLast >= gapUs, 1)
          .otherwise(0))
      .withColumn("gid", sum(col("new_grp"))
        .over(w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("db"), col("table"), col("gid"))
      .agg(min(col("start_us")).as("sess_start_us"),
        (max(col("last_us")) + gapUs).as("sess_end_us"),
        sum(col("n")).cast("long").as("n_changes"))
      .select(col("db"), col("table"), col("sess_start_us"),
        col("sess_end_us"), col("n_changes"))
      .as[SessOut]
  }
}
