package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of (temporal) join — the streaming twin of
  * ops.AsOf.joinTs, and the standard enrichment join of a change
  * pipeline: each probe-side row is matched with the greatest
  * version-side timestamp <= its own, per key (ties match, like ASOF's
  * `>=`; null when no prior version). Think trades-vs-quotes, or
  * change events against a slowly-changing dimension's version stream.
  *
  * Spark has no built-in streaming as-of: stream-stream interval joins
  * bound BOTH sides by a time range, but "the latest version before
  * me" is unbounded lookback. Keyed state is the right tool:
  *
  *  - both streams union into one watermarked input, tagged probe /
  *    version, and group by the join key (ONE shuffle, like the batch
  *    twin's single window pass);
  *  - per-key state holds the version timestamps plus probes not yet
  *    safe to answer. A probe at ts can only be emitted once the
  *    WATERMARK passes ts: any version still in flight must then carry
  *    a LATER timestamp, so the match is final (the same completeness
  *    argument as the batch sort — correctness inherits the watermark
  *    contract);
  *  - event-time timeouts fire exactly when the watermark crosses the
  *    earliest pending probe, so quiet keys flush without new data;
  *  - versions strictly older than the newest one at-or-below the
  *    watermark are evicted — no future probe can prefer them (its ts
  *    exceeds the watermark, so the newer version dominates). State
  *    per key = surviving versions + in-flight probes, bounded by the
  *    watermark horizon, NOT by stream history.
  *
  * Emission is append-mode and per-probe-final. Rows on EITHER side
  * arriving behind the watermark are dropped by the stateful operator
  * itself (Spark's standard late-data rule) — the exactness claim is
  * "equal to the batch join over the rows the watermark admitted".
  * TemporalJoinSpec pins equality with the batch operator under
  * out-of-order, multi-batch arrival.
  */
object TemporalJoin {

  /** One answered probe: the probe row plus its as-of match in micros
    * (None = no version at or before the probe).
    */
  case class AsOfOut(key: String, ts_us: Long, payload: String,
      asof_ts_us: Option[Long])

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** Versions strictly older than the newest one at-or-below the
    * watermark can never be an answer again: any future probe's ts
    * exceeds the watermark, so that newest-at-or-below version
    * dominates every older one. Keep it; keep everything newer.
    */
  private[graft] def evictMarks(sortedMarks: List[Long], wmMs: Long): List[Long] = {
    val (atOrBelow, above) = sortedMarks.partition(_ / 1000 <= wmMs)
    atOrBelow.lastOption.toList ++ above
  }

  /** Greatest mark <= ts in an ascending list (ties match). */
  private[graft] def matchOf(sortedMarks: List[Long], ts: Long): Option[Long] =
    sortedMarks.takeWhile(_ <= ts).lastOption

  private def fn(key: String,
      it: Iterator[(String, java.sql.Timestamp, Int, String)],
      state: GroupState[(List[Long], List[(Long, String)])]): Iterator[AsOfOut] = {
    var (marks, pending) = state.getOption.getOrElse((List.empty[Long], Nil))
    if (!state.hasTimedOut) {
      it.foreach {
        case (_, t, 0, _) => marks = micros(t) :: marks
        case (_, t, _, payload) => pending = (micros(t), payload) :: pending
      }
      marks = marks.sorted
    }
    val wmMs = state.getCurrentWatermarkMs()
    val (ready, wait) = pending.partition(_._1 / 1000 <= wmMs)
    // match BEFORE evicting: eviction is only sound for future probes
    // (ts > watermark); a ready probe may still need an older version
    val out = ready.sortBy(_._1).map { case (ts, payload) =>
      AsOfOut(key, ts, payload, matchOf(marks, ts))
    }
    marks = evictMarks(marks, wmMs)
    if (wait.isEmpty && marks.isEmpty) state.remove()
    else {
      state.update((marks, wait))
      if (wait.nonEmpty)
        // fire when the watermark crosses the earliest still-pending
        // probe (never at-or-behind the current watermark)
        state.setTimeoutTimestamp(math.max(wait.map(_._1 / 1000).min, wmMs + 1))
    }
    out.iterator
  }

  /** `probes` needs (key, ts, payload); `versions` needs (key, ts).
    * Output: one [[AsOfOut]] per probe row, emitted once the watermark
    * passes its timestamp.
    */
  def asOf(probes: DataFrame, versions: DataFrame,
      watermark: String): Dataset[AsOfOut] = {
    val spark = probes.sparkSession
    import spark.implicits._
    probes.select(col("key"), col("ts"), lit(1).as("side"), col("payload"))
      .unionByName(versions.select(col("key"), col("ts"),
        lit(0).as("side"), lit("").as("payload")))
      .withWatermark("ts", watermark)
      .as[(String, java.sql.Timestamp, Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
