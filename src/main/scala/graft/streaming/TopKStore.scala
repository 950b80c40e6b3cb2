package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.TextAnalysis

/** Streaming heavy-hitter summary (X119): the Misra-Gries merge over
  * an unbounded ingest stream — the fourth mergeable statistic of the
  * live-card family (counts [[CardStore]], ranks-via-bins
  * [[HistStore]], distincts the HLL column; exact top-k needs corpus
  * ranks, which don't merge — the MG summary does).
  *
  * State = at most `k` (source, tok, est) counters per source plus a
  * per-source total `n_src`, in the [[StateTable]] bucketed layout.
  * Per micro-batch: EXACT batch counts (a batch is finite — its
  * counts are an MG summary with zero error) combine with the stored
  * summary by token-wise addition, then ONE compress
  * ([[TextAnalysis.mgCompress]], shared verbatim with the batch op)
  * restores capacity. The Agarwal-et-al merge theorem carries the
  * bound through any number of merges: serving estimates satisfy
  * `est ≤ true` and `true − est ≤ n_src/(k+1)` over everything ever
  * ingested, so any token with share > 1/(k+1) of a source is
  * guaranteed present (TopKStoreSpec pins both laws plus replay).
  *
  * Replay guard: the summary is NOT set-like (addition + subtraction),
  * so deltas ride the [[CardStore]] run-scoped (run, batch)
  * high-water — here the mark lives on every row of a source (a
  * source's rows always commit together), and a delta is stale iff
  * the source's mark says this (run, batch) already applied.
  *
  * Every source additionally keeps ONE sentinel row (tok = NULL — a
  * real token can never be NULL) carrying its n_src total and the
  * mark: a compress is allowed to drop EVERY counter (all counts
  * tying at the threshold do exactly that), and without the sentinel
  * that batch would silently lose the source's total and replay
  * mark — and, if the source was its bucket's only content, stage
  * nothing so the stale pre-batch bucket kept serving. The sentinel
  * guarantees a live source always commits at least one row.
  *
  * Takedown: REBUILD, like the card — an MG summary cannot
  * un-subtract (contrast [[HistStore.forget]], where binned counts
  * subtract exactly).
  */
object TopKStore {

  def applyBatch(batch: DataFrame, textCol: String, sourceCol: String,
      tableDir: String, runId: String, batchId: Long, k: Int,
      nBucketsIfNew: Int, graceCommits: Int = 0): Unit = {
    val spark = batch.sparkSession
    val delta = batch.filter(col(textCol).isNotNull)
      .select(coalesce(col(sourceCol).cast("string"), lit("<null>"))
          .as("source"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).cast("long").as("d_cnt"))

    StateTable.mergeBucketedBySource(delta, tableDir, nBucketsIfNew,
      emptyState = spark.range(0).select(lit("").as("source"),
        lit("").as("tok"), lit(0L).as("est"), lit(0L).as("n_src"),
        lit("").as("run_id"), lit(0L).as("last_batch")).limit(0),
      batchId, graceCommits) { (existing, d) =>
      // per-SOURCE staleness: all of a source's rows commit together
      // and carry the same mark, so one lookup row per source decides
      val marks = existing
        .groupBy(col("source"))
        .agg(max(col("run_id")).as("srid"), max(col("last_batch")).as("slb"))
      val stale = col("srid").isNotNull && col("srid") === lit(runId) &&
        lit(batchId) <= col("slb")
      val liveDelta = d.join(marks, Seq("source"), "left")
        .filter(!stale).select(col("source"), col("tok"), col("d_cnt"))
        .persist()

      // sources whose delta is stale (or absent) pass through untouched
      val untouchedRows = existing.join(
        liveDelta.select(col("source")).distinct(), Seq("source"),
        "left_anti")

      // combine: token-wise addition of the stored summary's COUNTER
      // rows (tok != NULL — sentinels carry no mass) and the exact
      // batch counts (an MG summary with zero error), then one
      // compress back to capacity k
      val combined = existing
        .filter(col("tok").isNotNull)
        .join(liveDelta.select(col("source")).distinct(), Seq("source"))
        .select(col("source"), col("tok"), col("est").as("cnt"))
        .join(liveDelta, Seq("source", "tok"), "full_outer")
        .select(col("source"), col("tok"),
          (coalesce(col("cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L)))
            .as("cnt"))
      val oldTotals = existing
        .select(col("source"), col("n_src")).distinct()
      val newTotals = liveDelta
        .groupBy(col("source"))
        .agg(sum(col("d_cnt")).as("d_tot"))
        .join(oldTotals, Seq("source"), "left")
        .select(col("source"),
          (coalesce(col("n_src"), lit(0L)) + col("d_tot")).as("n_src2"))
      val compressed = TextAnalysis.mgCompress(combined, k)
        .join(newTotals, Seq("source"))
        .select(col("source"), col("tok"), col("est_cnt").as("est"),
          col("n_src2").as("n_src"),
          lit(runId).as("run_id"), lit(batchId).as("last_batch"))
      // the per-source sentinel: survives even a compress that drops
      // every counter, so n_src and the replay mark always commit
      val sentinels = newTotals.select(col("source"),
        lit(null).cast("string").as("tok"), lit(0L).as("est"),
        col("n_src2").as("n_src"),
        lit(runId).as("run_id"), lit(batchId).as("last_batch"))

      val merged = untouchedRows.unionByName(compressed)
        .unionByName(sentinels)
      (merged, () => { liveDelta.unpersist(); () })
    }
  }

  def maintain(docs: DataFrame, textCol: String, sourceCol: String,
      tableDir: String, checkpointDir: String, k: Int,
      nBuckets: Int = StateTable.DefaultBuckets,
      graceCommits: Int = 0): StreamingQuery = {
    val runId = RunMark.forCheckpoint(checkpointDir)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, textCol, sourceCol, tableDir, runId, batchId,
          k, nBuckets, graceCommits)
      }
      .start()
  }

  /** The served summary: (source, tok, est, n_src) — estimates carry
    * the MG bound over the union of everything ingested. Sentinel
    * rows stay internal; a source whose compress dropped every
    * counter serves no summary rows (every est is 0) but keeps its
    * total in [[totals]].
    */
  def summary(spark: SparkSession, tableDir: String): DataFrame =
    StateTable.read(spark, tableDir)
      .filter(col("tok").isNotNull)
      .select(col("source"), col("tok"), col("est"), col("n_src"))

  /** Per-source ingested token totals — served from the sentinel
    * rows, present even when the summary is empty.
    */
  def totals(spark: SparkSession, tableDir: String): DataFrame =
    StateTable.read(spark, tableDir)
      .filter(col("tok").isNull)
      .select(col("source"), col("n_src"))
}
