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
  def applyBatch(batch: DataFrame, textCol: String, sourceCol: String,
      tableDir: String, runId: String, batchId: Long,
      nBucketsIfNew: Int, graceCommits: Int = 0): Unit = {
    val spark = batch.sparkSession
    // NULL-text docs are excluded (the X97 contract — matches the
    // batch sketch, so the union-equality law holds)
    val delta = batch.filter(col(textCol).isNotNull)
      .select(coalesce(col(sourceCol).cast("string"), lit("<null>"))
          .as("source"),
        Diagnostics.binId(
          graft.ops.TextAnalysis.tokenCount(col(textCol))).as("bin"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).cast("long").as("d_cnt"))

    StateTable.mergeBucketedBySource(delta, tableDir, nBucketsIfNew,
      emptyState = spark.range(0).select(lit("").as("source"),
        lit(0L).as("bin"), lit(0L).as("cnt"), lit("").as("run_id"),
        lit(0L).as("last_batch")).limit(0),
      batchId, graceCommits) { (existing, d) =>
      // the CardStore high-water guard, per (source, bin) row: a
      // replayed batch re-derives the same delta rows, so each stored
      // row's (run, batch) mark catches its own replay
      val stale = col("sc").isNotNull && col("srid") === lit(runId) &&
        lit(batchId) <= col("slb")
      val merged = existing
        .select(col("source"), col("bin"), col("cnt").as("sc"),
          col("run_id").as("srid"), col("last_batch").as("slb"))
        .join(d, Seq("source", "bin"), "full_outer")
        .select(col("source"), col("bin"),
          when(col("d_cnt").isNull, col("sc"))
            .when(stale, col("sc"))
            .otherwise(coalesce(col("sc"), lit(0L)) + col("d_cnt"))
            .as("cnt"),
          when(col("d_cnt").isNull, col("srid"))
            .when(stale, col("srid"))
            .otherwise(lit(runId)).as("run_id"),
          when(col("d_cnt").isNull, col("slb"))
            .when(stale, col("slb"))
            .otherwise(lit(batchId)).as("last_batch"))
      (merged, () => ())
    }
  }

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
      tableDir: String, graceCommits: Int = 0): Unit = {
    val spark = removals.sparkSession
    val st = StateTable.loadManifestFull(tableDir)
    val nBuckets = st.nBuckets.getOrElse(StateTable.DefaultBuckets)
    val bucket = pmod(hash(col("source")), lit(nBuckets)).cast("int")
    val delta = removals.filter(col(textCol).isNotNull)
      .select(coalesce(col(sourceCol).cast("string"), lit("<null>"))
          .as("source"),
        Diagnostics.binId(
          graft.ops.TextAnalysis.tokenCount(col(textCol))).as("bin"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).cast("long").as("d_cnt"))
      .withColumn("b", bucket)
      .persist()
    try {
      val touched = delta.select(col("b")).distinct()
        .collect().map(_.getInt(0)).toSeq.sorted
        .filter(st.buckets.contains)
      if (touched.isEmpty) return
      // mergeSchema: same straddle-safe protocol as the shared
      // scaffold (StateTable.mergeBucketedBySource) — touched buckets
      // can span a store-schema upgrade, and a plain read would
      // silently drop the newer column and persist the loss here.
      val merged = spark.read.option("mergeSchema", "true").parquet(
          touched.map(b => s"$tableDir/b$b/${st.buckets(b)}"): _*)
        .join(delta.drop("b"), Seq("source", "bin"), "left")
        .select(col("source"), col("bin"),
          (col("cnt") - coalesce(col("d_cnt"), lit(0L))).as("cnt"),
          col("run_id"), col("last_batch"))
        .filter(col("cnt") > 0)
        .withColumn("b", bucket)
        .persist()
      try {
        val keptBuckets = merged.select(col("b")).distinct()
          .collect().map(_.getInt(0)).toSet
        StateTable.commitPartitioned(tableDir, merged, nBuckets, st,
          s"f${java.util.UUID.randomUUID().toString.take(8)}",
          graceCommits, emptied = touched.filterNot(keptBuckets))
      } finally merged.unpersist()
    } finally delta.unpersist()
  }

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
