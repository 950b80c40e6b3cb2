package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Diagnostics

/** Streaming Count-Min sketch (X144 — X143's live twin): the
  * depth×width counter matrix maintained across micro-batches, runs,
  * and replays. CMS cells are ADDITIVE state (merging two corpora's
  * sketches is cell-wise addition — the law OpsSpec pins on the batch
  * operator), so the store is the [[HistStore]] shape with the sketch
  * row index standing where the source stood: state = one row per
  * (d, b) cell carrying (cnt, run_id, last_batch) in the
  * [[StateTable]] bucketed layout, with the same per-row (run, batch)
  * high-water replay guard (a replayed micro-batch re-derives the
  * SAME per-cell delta rows, so the row-level mark catches every one).
  *
  * Serving ([[estimates]]) probes the stored cells with the VERBATIM
  * bucket hashes the batch operator uses, so the maintained estimate
  * EQUALS [[graft.ops.Diagnostics.cmsEstimates]]'s est over the union
  * of everything ever ingested, under any batch split, arrival order,
  * replay, or run boundary (CmsStoreSpec pins it). With
  * [[graft.streaming.TopKStore]] (Misra-Gries) this completes the
  * live frequency-summary pair: MG under-estimates heavy hitters,
  * CMS over-estimates any key.
  *
  * State is depth·width rows — bounded by DEFINITION of the sketch,
  * at any corpus size; work per trigger ∝ batch + touched buckets.
  * `depth`/`width` are the store's identity: the caller passes the
  * same pair to every operation (they parameterize the hashes — a
  * mismatched probe is meaningless, exactly as for the batch op).
  */
object CmsStore {

  private def cellDelta(batch: DataFrame, textCol: String, depth: Int,
      width: Int): DataFrame =
    Diagnostics.cmsCells(batch, textCol, depth, width)
      .select(col("d").cast("string").as("source"), col("b").as("bin"),
        col("c").as("d_cnt"))

  /** Merge one micro-batch's per-cell delta into the store; public
    * for batch-mode reuse and tests — [[maintain]] is the streaming
    * driver.
    */
  def applyBatch(batch: DataFrame, textCol: String, tableDir: String,
      runId: String, batchId: Long, depth: Int, width: Int,
      nBucketsIfNew: Int, graceCommits: Int = 0): Unit =
    CounterStore.applyDelta(cellDelta(batch, textCol, depth, width),
      tableDir, runId, batchId, nBucketsIfNew, graceCommits)

  /** Run the maintenance query — state only; estimates are SERVED
    * from the store ([[estimates]]).
    */
  def maintain(docs: DataFrame, textCol: String, tableDir: String,
      checkpointDir: String, depth: Int, width: Int,
      nBuckets: Int = StateTable.DefaultBuckets,
      graceCommits: Int = 0): StreamingQuery = {
    val runId = RunMark.forCheckpoint(checkpointDir)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, textCol, tableDir, runId, batchId, depth,
          width, nBuckets, graceCommits)
      }
      .start()
  }

  /** Takedown: CMS cells, like binned counts, are exactly
    * SUBTRACTABLE — removing a doc decrements its tokens' cells, and
    * the served estimates equal a from-scratch build over the
    * survivors (spec-pinned). Same caller-manifest replay contract as
    * [[HistStore.forget]] (subtraction is not idempotent; the sketch
    * has no doc ids by construction). Cells at zero drop.
    */
  def forget(removals: DataFrame, textCol: String, tableDir: String,
      depth: Int, width: Int, graceCommits: Int = 0): Unit =
    CounterStore.subtract(cellDelta(removals, textCol, depth, width),
      tableDir, graceCommits)

  /** The raw maintained matrix: (d, b, cnt). */
  def cells(spark: SparkSession, tableDir: String): DataFrame =
    StateTable.read(spark, tableDir)
      .select(col("source").cast("long").as("d"), col("bin").as("b"),
        col("cnt"))

  /** Serve point estimates for a key frame — the verbatim batch
    * probe hashes over the stored cells, so this EQUALS
    * `cmsEstimates`'s est over the union of all ingested rows. An
    * absent cell counts as zero (a never-seen key estimates 0, never
    * null).
    */
  def estimates(spark: SparkSession, tableDir: String, keys: DataFrame,
      tokCol: String, depth: Int, width: Int): DataFrame =
    Diagnostics.cmsProbes(keys, tokCol, depth, width)
      .join(cells(spark, tableDir), Seq("d", "b"), "left")
      .groupBy(col("tok"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_n"))
}
