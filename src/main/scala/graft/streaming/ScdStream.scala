package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD Type-2 — the streaming twin of cdc.Scd.type2: closed
  * validity intervals stream out as soon as the watermark makes them
  * final; the OPEN (current) version of each key lives in state, one
  * small record per live key (the same bound as the LWW state twin).
  *
  * A version's interval closes at the key's NEXT change — so a version
  * is final exactly when a later change is final, and a change can be
  * applied exactly when the watermark passes it (nothing earlier can
  * still arrive; the same completeness argument as the batch sort).
  * Changes inside the horizon buffer in arrival order and apply in
  * (ts, seq) order once the watermark admits them: out-of-order
  * arrival cannot reorder versions. Deletes close their predecessor
  * and leave the key with no open version — identical semantics to the
  * batch operator, which ScdStreamSpec pins.
  *
  * Emission is append-mode (closed intervals are immutable facts);
  * rows behind the watermark are dropped by the stateful operator
  * (standard late-data rule).
  */
object ScdStream {

  /** A closed version: [valid_from_us, valid_to_us). The open versions
    * are in state, not in the output stream (materialize them with
    * [[StateTable]]-style reads if a current-rows view is needed).
    */
  case class ClosedVersion(key: String, payload: String,
      valid_from_us: Long, valid_to_us: Long)

  private type St = (Option[(Long, String)], List[(Long, Long, String, String)])

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** Apply watermark-admitted changes in (ts, seq) order to the open
    * version; pure, unit-testable. Returns (closed versions emitted,
    * new open version).
    */
  private[graft] def applyReady(open: Option[(Long, String)],
      ready: List[(Long, Long, String, String)],
      deleteOp: String): (List[(String, Long, Long)], Option[(Long, String)]) = {
    ready.sortBy(r => (r._1, r._2)).foldLeft(
        (List.empty[(String, Long, Long)], open)) {
      case ((closed, cur), (ts, _, payload, op)) =>
        val nowClosed = cur match {
          case Some((fromUs, pl)) => (pl, fromUs, ts) :: closed
          case None => closed
        }
        (nowClosed, if (op == deleteOp) None else Some((ts, payload)))
    } match { case (closed, cur) => (closed.reverse, cur) }
  }

  private def fn(deleteOp: String)(key: String,
      it: Iterator[(String, java.sql.Timestamp, Long, String, String)],
      state: GroupState[St]): Iterator[ClosedVersion] = {
    var (open, pending) = state.getOption.getOrElse(
      (Option.empty[(Long, String)], List.empty[(Long, Long, String, String)]))
    if (!state.hasTimedOut)
      it.foreach { case (_, t, seq, payload, op) =>
        pending = (micros(t), seq, payload, op) :: pending
      }
    val wmMs = state.getCurrentWatermarkMs()
    val (ready, wait) = pending.partition(_._1 / 1000 <= wmMs)
    val (closed, newOpen) = applyReady(open, ready, deleteOp)
    open = newOpen
    if (wait.isEmpty && open.isEmpty) state.remove()
    else {
      state.update((open, wait))
      if (wait.nonEmpty)
        state.setTimeoutTimestamp(math.max(wait.map(_._1 / 1000).min, wmMs + 1))
    }
    closed.iterator.map { case (pl, fromUs, toUs) =>
      ClosedVersion(key, pl, fromUs, toUs)
    }
  }

  /** `changes` needs (key, ts, seq, payload, op); emits each closed
    * version once the change that closed it clears the watermark.
    */
  def closedVersions(changes: DataFrame, watermark: String,
      deleteOp: String = graft.cdc.ChangeOp.Delete): Dataset[ClosedVersion] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes.select(col("key"), col("ts"), col("seq").cast("long"),
        col("payload"), col("op"))
      .withWatermark("ts", watermark)
      .as[(String, java.sql.Timestamp, Long, String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn(deleteOp))
  }
}
