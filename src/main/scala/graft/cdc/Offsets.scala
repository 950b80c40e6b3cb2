package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Offset / job-queue bookkeeping (SURVEY §2.7 A1-A3).
  *
  * In streaming mode all of this is subsumed by the query's
  * checkpointLocation (Structured Streaming offset + commit logs give
  * the reference's at-least-once persistence, reference/src/main.rs:
  * 238-255, for free). The batch queries below reproduce the
  * *bookkeeping arithmetic* itself so it stays oracle-checkable:
  */
object Offsets {

  /** A1: per-replica resume offset — `max(4, pos)` guard (binlog
    * positions < 4 are invalid, reference/src/main.rs:205) over the
    * latest seen position, upserted per server_id
    * (reference/src/main.rs:243-247). Here: server_id ≙ the synthetic
    * db shard, pos ≙ highest event_id seen.
    */
  def logPos(changes: DataFrame): DataFrame =
    changes.groupBy(col("db").as("server_id"))
      .agg(greatest(lit(4L), max(col("event_id"))).as("pos"),
        count(lit(1)).cast("long").as("n_events"))

  /** A2+A3: backfill job-queue status transitions — a job flips to
    * 'done' when its page comes back empty
    * (reference/src/main.rs:350-367), and the last-seen key per page
    * drives the next keyset bound (reference/src/main.rs:340-349).
    *
    * The queue is user-seeded (README.md:39): `jobs` is the expected
    * (db, relation) list, outer-joined against the observed rows so a
    * job whose relation produced nothing surfaces as 'todo' — the
    * reference's initial state — instead of silently disappearing.
    */
  def jobQueue(changes: DataFrame, jobs: DataFrame): DataFrame = {
    val seen = changes.groupBy(col("db"), col("table").as("relation"))
      .agg(
        max(col("event_id")).as("position"),
        count(lit(1)).cast("long").as("n_rows"))
    jobs.join(seen, Seq("db", "relation"), "left")
      .select(col("db"), col("relation"), col("position"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        when(col("n_rows").isNotNull, "done").otherwise("todo").as("status"))
  }
}
