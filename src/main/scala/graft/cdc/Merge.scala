package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stateful backfill ⊎ live-change merge (SURVEY §2.3 M1/M2 — the
  * heart of the reference).
  *
  * The reference zips the snapshot stream and the binlog stream and,
  * when both yield simultaneously, lets the live change supersede a
  * stale backfill row of the same key (`Change::update_with`,
  * reference/src/main.rs:71-121). That pairwise race resolution has
  * documented edge bugs (a non-matching live change is dropped,
  * main.rs:107-110; a backfill can resurrect a deleted row,
  * main.rs:84) — per SURVEY §7.4 we implement the *intended*
  * semantics: **last-writer-wins per key, live > backfill on ties,
  * Delete is a tombstone that also beats backfill**.
  *
  * Spark-first: the merge is `unionByName` (M1) + one keyed
  * `row_number` window (M2). Exactly one shuffle on the merge key;
  * with AQE on, skewed keys are split automatically. The streaming
  * twin keeps the same per-key LWW state in
  * `flatMapGroupsWithState` (see streaming.LwwMerge).
  *
  * Inputs must share: key (string merge key), op, ts_sec, seq (unique
  * tie-break id), plus any payload columns; `precedence` is added here
  * (live=1, backfill=0).
  */
object Merge {

  /** Winner per key by (ts_sec, precedence, seq) over an already-
    * unioned frame — tombstones KEPT (they must be remembered so a
    * stale late backfill cannot resurrect a deleted key; filter with
    * [[current]] when reading).
    */
  def winners(u: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ts_sec").desc, col("precedence").desc, col("seq").desc)
    u.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** The live rows of a winners table (tombstones dropped). */
  def current(winners: DataFrame): DataFrame =
    winners.filter(col("op") =!= ChangeOp.Delete)

  /** M1+M2 in batch form. Returns the materialized post-merge state:
    * per key the winning record, with tombstoned keys removed.
    */
  def lww(backfill: DataFrame, live: DataFrame): DataFrame =
    current(winners(
      backfill.withColumn("precedence", lit(0))
        .unionByName(live.withColumn("precedence", lit(1)))))
}
