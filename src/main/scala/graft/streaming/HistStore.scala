package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Diagnostics

/** Streaming token-length histogram (X113): the mergeable-quantile
  * store that closes [[CardStore]]'s documented gap — the live card
  * deliberately omits median/percentiles because RANK statistics
  * don't merge, but BINNED COUNTS do (plain addition), and the
  * [[graft.ops.Diagnostics]] log-histogram answers any percentile
  * from the bins with a guaranteed ≤ 12.5%-wide value bracket.
  *
  * State = one row per (source, bin): (cnt, run_id, last_batch) in
  * the [[StateTable]] bucketed layout, bucketed by source hash.
  * Counters are ADDITIVE state, so the store carries the same
  * per-row (run, batch) high-water replay guard as [[CardStore]]
  * (scoped to the checkpoint lineage via [[RunMark]] — see the
  * exactly-once contract there; a replayed micro-batch re-derives
  * the SAME per-(source, bin) delta rows, so the row-level mark
  * catches every one of them).
  *
  * Serving ([[quantiles]]) runs [[Diagnostics.sketchServe]] — the
  * VERBATIM walk the batch sketch uses — over the stored counts, so
  * the maintained sketch EQUALS `lengthQuantileSketch` on the union
  * of everything ever ingested, under any batch split, arrival
  * order, replay, or run boundary (binning is deterministic,
  * addition is associative-commutative; HistStoreSpec pins it).
  * Work per trigger ∝ batch + touched buckets; state ∝ |sources| ×
  * ~O(8·log₂ maxLen) bins — a few hundred rows per source at any
  * corpus size.
  */
object HistStore {

  /** Merge one micro-batch's per-(source, bin) delta into the store;
    * public for batch-mode reuse and tests — [[maintain]] is the
    * streaming driver.
    */
  /** The per-(source, bin) delta a doc set contributes — the only
    * store-specific piece; the additive protocol (replay guard,
    * subtract) lives in [[CounterStore]]. NULL-text docs are excluded
    * (the X97 contract — matches the batch sketch, so the
    * union-equality law holds).
    */
  private def binDelta(docs: DataFrame, textCol: String,
      sourceCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(coalesce(col(sourceCol).cast("string"), lit("<null>"))
          .as("source"),
        Diagnostics.binId(
          graft.ops.TextAnalysis.tokenCount(col(textCol))).as("bin"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).cast("long").as("d_cnt"))

  def applyBatch(batch: DataFrame, textCol: String, sourceCol: String,
      tableDir: String, runId: String, batchId: Long,
      nBucketsIfNew: Int, graceCommits: Int = 0): Unit =
    CounterStore.applyDelta(binDelta(batch, textCol, sourceCol),
      tableDir, runId, batchId, nBucketsIfNew, graceCommits)

  /** Run the maintenance query — state only; quantiles are SERVED
    * from the store ([[quantiles]]).
    */
  def maintain(docs: DataFrame, textCol: String, sourceCol: String,
      tableDir: String, checkpointDir: String,
      nBuckets: Int = StateTable.DefaultBuckets,
      graceCommits: Int = 0): StreamingQuery = {
    val runId = RunMark.forCheckpoint(checkpointDir)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, textCol, sourceCol, tableDir, runId, batchId,
          nBuckets, graceCommits)
      }
      .start()
  }

  /** Takedown (the X94 family, for THIS artifact): binned counts are
    * the rare sketch state that is exactly SUBTRACTABLE — removing a
    * doc decrements its (source, bin) cell, and the served quantiles
    * equal a from-scratch build over the survivors (spec-pinned).
    * `removals` carries the removed docs' (textCol, sourceCol) — a
    * takedown manifest knows the content it removes.
    *
    * Contract: apply each removal batch ONCE (a driver-invoked
    * maintenance op, like compact). Subtraction is not idempotent —
    * the store has no doc ids to anti-join on (that's what makes it
    * a sketch), so replay protection is the caller's manifest, not
    * the state. Cells floor at the removal count reaching zero; rows
    * at zero drop (an emptied bucket keeps its schema-bearing
    * version, the StateTable convention).
    */
  def forget(removals: DataFrame, textCol: String, sourceCol: String,
      tableDir: String, graceCommits: Int = 0): Unit =
    CounterStore.subtract(binDelta(removals, textCol, sourceCol),
      tableDir, graceCommits)

  /** The raw maintained histogram: (source, bin, cnt). */
  def histogram(spark: SparkSession, tableDir: String): DataFrame =
    StateTable.read(spark, tableDir)
      .select(col("source"), col("bin"), col("cnt"))

  /** Serve quantiles from the maintained counts — the verbatim batch
    * walk, so this EQUALS `lengthQuantileSketch` over the union of
    * all ingested rows.
    */
  def quantiles(spark: SparkSession, tableDir: String,
      pcts: Seq[Int]): DataFrame =
    Diagnostics.sketchServe(histogram(spark, tableDir), pcts)
}
