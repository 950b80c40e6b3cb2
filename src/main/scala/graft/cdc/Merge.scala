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

  /** STRICT-PARITY twin of the reference's literal pairwise merge —
    * the race bugs included, so the documented divergence of [[lww]]
    * is proven against real behavior rather than asserted:
    *
    * The reference polls both streams and, when both yield, emits ONE
    * record for the two inputs: `backfill.update_with(change)`
    * (reference/src/main.rs:107-110). `update_with` returns the live
    * change only when db+table match AND both records carry an `after`
    * row AND the values at the backfill's pkey are equal
    * (main.rs:73-82); otherwise the backfill row — meaning:
    *
    *  - a non-matching live change is silently DROPPED (not re-queued);
    *  - a Delete (after = None) never matches the wildcard arm
    *    (main.rs:84), so a stale backfill row RESURRECTS the deleted
    *    key;
    *  - when one side is exhausted/pending the other passes through
    *    (main.rs:111-113). NOTE: the pass-through applies the intent of
    *    the `(_, _) => Poll::Pending` fallthrough; the literal
    *    reference has NO arm for (backfill EOF, live Ready) — that
    *    combination hits the Pending arm and the merge STALLS once the
    *    backfill stream terminates while changes remain (another latent
    *    reference bug, like the drop/resurrect pair above). A stalled
    *    stream has no batch analogue, so rows past the snapshot end
    *    pass through here; MergeSpec pins the divergence.
    *
    * Batch model: the reference's serial drive loop is a zip — pair
    * the i-th backfill row with the i-th live change (row_number over
    * each side's order), full-outer join on the pair index, then
    * apply `update_with` per pair. Inputs need columns
    * (ord, db, table, key, op, bal); `key` stands for
    * `row.1[pkey]`, absent-after is modeled by op = Delete.
    *
    * Scale note: this operator is intentionally NOT a scale path — the
    * reference's pairwise zip is inherently a single serial sequence
    * (the global row_number windows below mirror that 1-process
    * semantics, reference flake.nix deploys exactly one replica). The
    * distributed, key-partitioned answer to the same race is [[lww]].
    */
  def strictPairwise(backfill: DataFrame, live: DataFrame): DataFrame = {
    val b = backfill.withColumn("rn", row_number().over(Window.orderBy(col("ord"))))
    val l = live.withColumn("rn", row_number().over(Window.orderBy(col("ord"))))
    val j = b.as("b").join(l.as("l"), Seq("rn"), "full_outer")
    // update_with returns the change iff db/table match, both afters
    // exist (live Delete has none), and the pkey values are equal;
    // a missing backfill side (rn past the snapshot) passes the live
    // change through. NULL-valued condition → otherwise → backfill.
    val takeLive = col("b.key").isNull ||
      (col("b.db") === col("l.db") && col("b.table") === col("l.table") &&
        col("l.op") =!= ChangeOp.Delete && col("b.key") === col("l.key"))
    def pick(f: String) = when(takeLive, col(s"l.$f")).otherwise(col(s"b.$f"))
    j.select(col("rn").cast("long").as("rn"),
      pick("db").as("db"), pick("table").as("table"),
      pick("key").as("key"), pick("op").as("op"), pick("bal").as("bal"),
      when(takeLive, "live").otherwise("backfill").as("src"))
  }
}
