package graft.streaming

import java.nio.file.{Files, Paths}

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
  * Takedown: REBUILD, like the card — an MG summary cannot
  * un-subtract (contrast [[HistStore.forget]], where binned counts
  * subtract exactly).
  */
object TopKStore {

  def applyBatch(batch: DataFrame, textCol: String, sourceCol: String,
      tableDir: String, runId: String, batchId: Long, k: Int,
      nBucketsIfNew: Int, graceCommits: Int = 0): Unit = {
    val spark = batch.sparkSession
    Files.createDirectories(Paths.get(tableDir))
    val st = StateTable.loadManifestFull(tableDir)
    val nBuckets = st.nBuckets.getOrElse(nBucketsIfNew)
    val bucket = pmod(hash(col("source")), lit(nBuckets)).cast("int")

    val delta = batch.filter(col(textCol).isNotNull)
      .select(coalesce(col(sourceCol).cast("string"), lit("<null>"))
          .as("source"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).cast("long").as("d_cnt"))
      .withColumn("b", bucket)
      .persist()
    try {
      val touched = delta.select(col("b")).distinct()
        .collect().map(_.getInt(0)).toSeq.sorted
      if (touched.isEmpty) return
      val existingPaths = touched.flatMap(b =>
        st.buckets.get(b).map(v => s"$tableDir/b$b/$v"))
      val existing =
        if (existingPaths.nonEmpty) spark.read.parquet(existingPaths: _*)
        else spark.range(0).select(lit("").as("source"), lit("").as("tok"),
          lit(0L).as("est"), lit(0L).as("n_src"), lit("").as("run_id"),
          lit(0L).as("last_batch")).limit(0)

      // per-SOURCE staleness: all of a source's rows commit together
      // and carry the same mark, so one lookup row per source decides
      val marks = existing
        .groupBy(col("source"))
        .agg(max(col("run_id")).as("srid"), max(col("last_batch")).as("slb"))
      val stale = col("srid").isNotNull && col("srid") === lit(runId) &&
        lit(batchId) <= col("slb")
      val liveDelta = delta.join(marks, Seq("source"), "left")
        .filter(!stale).select(col("source"), col("tok"), col("d_cnt"))

      // sources whose delta is stale (or absent) pass through untouched
      val untouchedRows = existing.join(
        liveDelta.select(col("source")).distinct(), Seq("source"),
        "left_anti")

      // combine: token-wise addition of the stored summary and the
      // exact batch counts (an MG summary with zero error), then one
      // compress back to capacity k
      val combined = existing
        .join(liveDelta.select(col("source")).distinct(), Seq("source"))
        .select(col("source"), col("tok"), col("est").as("cnt"),
          col("n_src"))
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

      val merged = untouchedRows.unionByName(compressed)
        .withColumn("b", bucket)
      val version =
        s"v${batchId}_${java.util.UUID.randomUUID().toString.take(8)}"
      StateTable.commitPartitioned(tableDir, merged, nBuckets, st, version,
        graceCommits)
    } finally delta.unpersist()
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
    * the MG bound over the union of everything ingested.
    */
  def summary(spark: SparkSession, tableDir: String): DataFrame =
    StateTable.read(spark, tableDir)
      .select(col("source"), col("tok"), col("est"), col("n_src"))
}
