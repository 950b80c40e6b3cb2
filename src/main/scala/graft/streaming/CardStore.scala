package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Live corpus card (X103): per-source running (n_docs, n_tokens,
  * max_tokens) maintained over an unbounded ingest stream — the
  * monitoring twin of the batch dataset card
  * ([[graft.ops.Curation.datasetCard]], X61), restricted to the
  * MERGEABLE statistics (sum/sum/max), plus a Datasketches HLL
  * distinct-token sketch (X115 — HLL union is register-wise max, so
  * distinctness DOES merge; the estimate serves within its published
  * rsd band). Median/percentiles live in the binned-count companion
  * [[HistStore]] (X113 — rank stats merge once the values are
  * binned); heavy hitters (the top-1 language/token question) live in
  * [[TopKStore]] (X119 — the Misra-Gries summary merges with its
  * classic bound); the batch card stays the retrospective source of
  * exact truth for all of them.
  *
  * == The exactly-once additive pattern ==
  *
  * Every other store in this family (dedup fingerprints, band keys,
  * chunk fps, the bottom-k sample) is replay-safe because its merge
  * is a SET operation — union-distinct of already-present rows is a
  * no-op. Counters are not: an at-least-once replay of a foreachBatch
  * micro-batch would double-add. The guard is a per-source
  * (run, batch) HIGH-WATER: each state row carries the `run_id` and
  * `last_batch` of the last micro-batch that contributed to it, and
  * a delta is skipped iff it re-arrives under the SAME run with a
  * batch id at or below the mark. "Run" is the CHECKPOINT LINEAGE,
  * not the driver process ([[RunMark.forCheckpoint]]): crash
  * recovery restarts the driver against the same checkpoint and
  * replays the interrupted batch under its original id, so the
  * restarted `maintain()` must resume the SAME run id for the mark
  * to catch it — a process-scoped UUID would change across exactly
  * that restart and double-add. A fresh checkpoint (fresh offsets,
  * which can never re-deliver old batches) gets a fresh id, which
  * matters because batch ids themselves RESTART at 0 in a fresh
  * run — a bare batch high-water would silently drop the first
  * batches of every later ingest run against already-seen sources.
  * Re-delivery of any committed batch — immediate crash-replay or a
  * stale late duplicate within the run — is a pure no-op on
  * content; a new run always accumulates; work stays ∝ batch +
  * touched buckets.
  *
  * NULL sources aggregate under the `'<null>'` sentinel (the
  * [[graft.ops.Diagnostics]] convention — an unattributed-ingest
  * spike is exactly what a live card must surface).
  *
  * Takedown: REBUILD, by design. n_docs/n_tokens could subtract, but
  * max_tokens cannot un-max and the HLL cannot un-merge — a partial
  * forget would serve a mixed-freshness card that looks exact and
  * isn't. Contrast [[HistStore.forget]]: binned counts subtract
  * exactly, which is why the quantile sketch gets a real takedown
  * path and the card doesn't.
  */
object CardStore {

  /** Merge one micro-batch's per-source delta into the card state;
    * public for batch-mode reuse and tests — [[maintain]] is the
    * streaming driver.
    */
  def applyBatch(batch: DataFrame, textCol: String, sourceCol: String,
      tableDir: String, runId: String, batchId: Long,
      nBucketsIfNew: Int, graceCommits: Int = 0): Unit = {
    val spark = batch.sparkSession
    // one scan: both aggregations below reuse the cached projection
    // instead of re-reading and re-tokenizing the micro-batch
    val base = batch
      .select(coalesce(col(sourceCol).cast("string"), lit("<null>"))
          .as("source"),
        col(textCol).as("text"))
      .persist()
    val docAgg = base
      .select(col("source"),
        graft.ops.TextAnalysis.tokenCount(col("text")).as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("d_docs"),
        coalesce(sum(col("n_tok")), lit(0L)).cast("long").as("d_tokens"),
        coalesce(max(col("n_tok")), lit(0L)).cast("long").as("d_max"))
    // X115: distinct-token sketch per source — the Datasketches HLL is
    // MERGEABLE (register-wise max), so the live card can carry the
    // one distinct stat the batch card computes exactly; the union is
    // idempotent (set-like), so replay safety doesn't even need the
    // high-water — it rides it anyway for uniformity
    val tokAgg = base
      .select(col("source"),
        explode(graft.ops.TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy(col("source"))
      .agg(hll_sketch_agg(col("tok"), HllLgK).as("d_hll"))
    val delta = docAgg.join(tokAgg, Seq("source"), "left")

    // try/finally, not the merge-closure cleanup: the scaffold
    // returns early on an empty batch WITHOUT invoking the closure,
    // and base must not leak in the cache across idle triggers
    try StateTable.mergeBucketedBySource(delta, tableDir, nBucketsIfNew,
      emptyState = spark.range(0).select(lit("").as("source"),
        lit(0L).as("n_docs"), lit(0L).as("n_tokens"),
        lit(0L).as("max_tokens"), lit(null).cast("binary").as("tok_hll"),
        lit("").as("run_id"), lit(0L).as("last_batch")).limit(0),
      batchId, graceCommits) { (existing0, d) =>
      // in-place upgrade from pre-sketch state (no tok_hll column):
      // a NULL sketch means "distincts unknown so far" — the next
      // delta's sketch takes over, exactly the fresh-source path
      val existing =
        if (existing0.columns.contains("tok_hll")) existing0
        else existing0.withColumn("tok_hll", lit(null).cast("binary"))

      // the high-water guard: a delta is stale iff it re-arrives
      // under the SAME run at or below the source's stored mark; the
      // stored row then passes through untouched
      val stale = col("sn").isNotNull && col("srid") === lit(runId) &&
        lit(batchId) <= col("slb")
      val merged = existing
        .select(col("source"), col("n_docs").as("sn"),
          col("n_tokens").as("st"), col("max_tokens").as("sm"),
          col("tok_hll").as("sh"),
          col("run_id").as("srid"), col("last_batch").as("slb"))
        .join(d, Seq("source"), "full_outer")
        .select(col("source"),
          when(col("d_docs").isNull, col("sn"))
            .when(stale, col("sn"))
            .otherwise(coalesce(col("sn"), lit(0L)) + col("d_docs"))
            .as("n_docs"),
          when(col("d_docs").isNull, col("st"))
            .when(stale, col("st"))
            .otherwise(coalesce(col("st"), lit(0L)) + col("d_tokens"))
            .as("n_tokens"),
          when(col("d_docs").isNull, col("sm"))
            .when(stale, col("sm"))
            .otherwise(greatest(coalesce(col("sm"), lit(-1L)), col("d_max")))
            .as("max_tokens"),
          when(col("d_docs").isNull, col("sh"))
            .when(stale, col("sh"))
            .when(col("sh").isNull, col("d_hll"))
            .when(col("d_hll").isNull, col("sh"))
            .otherwise(hll_union(col("sh"), col("d_hll"))).as("tok_hll"),
          when(col("d_docs").isNull, col("srid"))
            .when(stale, col("srid"))
            .otherwise(lit(runId)).as("run_id"),
          when(col("d_docs").isNull, col("slb"))
            .when(stale, col("slb"))
            .otherwise(lit(batchId)).as("last_batch"))
      (merged, () => ())
    }
    finally base.unpersist()
  }

  /** Run the maintenance query — state only; the card is SERVED from
    * the store ([[card]]).
    */
  def maintain(docs: DataFrame, textCol: String, sourceCol: String,
      tableDir: String, checkpointDir: String,
      nBuckets: Int = StateTable.DefaultBuckets,
      graceCommits: Int = 0): StreamingQuery = {
    // one mark scope per checkpoint lineage: a crash-restart from the
    // same checkpoint resumes this id (so its replays hit the mark);
    // a fresh checkpoint gets a fresh one (see the high-water contract)
    val runId = RunMark.forCheckpoint(checkpointDir)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, textCol, sourceCol, tableDir, runId, batchId,
          nBuckets, graceCommits)
      }
      .start()
  }

  /** lgConfigK of the distinct-token HLL sketch: rsd ≈ 1.04/√2¹² ≈
    * 1.6% at a few KB of state per source.
    */
  val HllLgK = 12

  /** The current per-source card: (source, n_docs, n_tokens,
    * max_tokens, n_distinct_tokens≈). The (run_id, last_batch) mark
    * and the raw sketch bytes stay internal; the distinct count is
    * the HLL estimate (within its published rsd band — the batch
    * card remains the exact source of truth).
    */
  def card(spark: SparkSession, tableDir: String): DataFrame = {
    val t0 = StateTable.read(spark, tableDir)
    // same pre-sketch tolerance as applyBatch: old tables serve 0
    // until their first post-upgrade delta
    val t = if (t0.columns.contains("tok_hll")) t0
      else t0.withColumn("tok_hll", lit(null).cast("binary"))
    t.select(col("source"), col("n_docs"), col("n_tokens"),
      col("max_tokens"),
      when(col("tok_hll").isNull, lit(0L))
        .otherwise(hll_sketch_estimate(col("tok_hll")))
        .as("n_distinct_tokens"))
  }
}
