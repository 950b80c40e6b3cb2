package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.cdc._

/** The whole reference pipeline (SURVEY §3.1), streaming-native:
  * change stream → regex filter → transform → topic routing → sink.
  *
  * The reference's drive loop (reference/src/main.rs:162-188) pulls
  * one record at a time and publishes per row; here the loop belongs
  * to Structured Streaming — micro-batches, offset/commit logs in
  * `checkpointLocation` replacing the SQLite log_pos table
  * (reference/src/main.rs:137-141, 238-255) with the same
  * at-least-once contract (exactly-once to idempotent/partitioned
  * file sinks).
  *
  * Sink shape: one parquet directory partitioned by `topic` — the
  * scale analogue of the per-topic Pub/Sub publisher cache
  * (reference/src/main.rs:131,182-185): routing is data, partitioned
  * writes fan out server-side, no driver-side loop.
  */
object Pipeline {

  /** Assemble the full transform chain on any change envelope frame
    * (batch or streaming — identical plan either way).
    */
  def transformed(changes: DataFrame, regex: String,
      transform: Transform = Transforms.DebeziumEnvelope): DataFrame =
    Routing.withTopic(
      Transforms.toWire(Filters.regexFilter(changes, regex), transform))
      .select(col("topic"), col("payload"))

  /** Launch: file-stream source → pipeline → topic-partitioned parquet.
    * `Trigger.AvailableNow` drains what exists then stops — the
    * snapshot-then-stream pattern; rerunning resumes from the
    * checkpoint (S3 offset parity).
    */
  def run(spark: SparkSession, srcDir: String,
      schema: org.apache.spark.sql.types.StructType, regex: String,
      outDir: String, checkpointDir: String): StreamingQuery =
    transformed(ChangeSource.streamFromEvents(spark, srcDir, schema), regex)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").partitionBy("topic").parquet(outDir)
      }
      .start()

  /** Event-time windowed change-rate stats with a watermark — the
    * standard streaming-agg extension (SURVEY §2.9 lists these as
    * absent from the reference; they come with the engine).
    */
  def windowedCounts(changes: DataFrame, watermark: String,
      windowLen: String): DataFrame =
    changes
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("db"), col("table"))
      .agg(count(lit(1)).as("n_changes"))

  /** Streaming exact dedup: drop records whose content fingerprint
    * was already seen within the watermark horizon — the streaming
    * twin of ops.Dedup.exact, with state bounded by the watermark
    * (unbounded exact dedup on an infinite stream is impossible; the
    * horizon IS the scale knob).
    */
  def dedupedByFingerprint(changes: DataFrame, payloadCol: String,
      watermark: String): DataFrame =
    changes
      .withColumn("fp", graft.ops.TextAnalysis.md5Fingerprint(col(payloadCol)))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Event-time sessionization: gap-merged activity sessions per
    * (db, table). Streaming session_window needs the watermark to
    * close sessions; the batch twin (SparkEntry q_cdc_sessions) runs
    * the same groupBy without one.
    */
  def sessionizedCounts(changes: DataFrame, watermark: String,
      gap: String): DataFrame =
    changes
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("db"), col("table"))
      .agg(count(lit(1)).as("n_changes"))

  /** The training-data curation composite (X22) as a Structured
    * Streaming job: language-ID + quality gate + repetition gate (all
    * narrow codegen'd passes — identical plans to the batch operators;
    * the repetition counters are the in-row `rep_stats`, which is what
    * makes a boilerplate gate possible in streaming at all — the
    * exploded-aggregate form would be a second stateful op) feeding
    * fingerprint dedup with watermark-bounded state. A document stream
    * curates incrementally: junk and boilerplate drop before any state
    * is touched, and only the survivors' fingerprints occupy the dedup
    * store. `docs` needs (doc_id, text, ts).
    * `maxTopBigramMicros` = 1e6 disables the repetition gate.
    */
  def curated(docs: DataFrame, watermark: String, minQualityMicros: Long,
      maxTopBigramMicros: Long = 1000000L): DataFrame = {
    val s = graft.functions.ArrayExprs.repStats(
      graft.ops.TextAnalysis.tokens(col("text")))
    docs
      .withColumn("lang_pred", graft.ops.TextAnalysis.langId(col("text")))
      .withColumn("quality_micros",
        graft.ops.TextAnalysis.qualityMicros(col("text")))
      .filter(col("quality_micros") >= minQualityMicros)
      .withColumn("top_bigram_micros",
        when(element_at(s, 4) === 0, lit(0L))
          .otherwise(round(element_at(s, 5).cast("double") / element_at(s, 4) * 1e6)
            .cast("long")))
      .filter(col("top_bigram_micros") <= maxTopBigramMicros)
      .withColumn("fp", graft.ops.TextAnalysis.md5Fingerprint(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
  }

  /** Ingest-time PII scrub: redact emails/phones/IPv4 and carry the
    * audit counts (X58 streaming twin). A pure narrow map — identical
    * plan to the batch operator, no state at all — which is exactly
    * why the scrub belongs FIRST in an ingest pipeline: text is clean
    * before any fingerprint, store, or sink sees it (a fingerprint of
    * unscrubbed text would differ from the stored scrubbed content,
    * and PII would live on in the dedup state). Compose as
    * `curated(piiScrubbed(docs), …)`.
    */
  def piiScrubbed(docs: DataFrame): DataFrame = {
    val t = col("text")
    val counts = graft.ops.TextAnalysis.piiCounts
      .map { case (n, f) => f(t).as(n) }
    docs.select(
      (docs.columns.filter(_ != "text").map(col).toSeq :+
        graft.ops.TextAnalysis.piiRedact(t).as("text")) ++ counts: _*)
  }

  /** Ingest-time keyword gate (X68's streaming twin): score each
    * arriving document against the fixed keyword query set with BM25
    * statistics FROZEN from a static reference corpus
    * ([[graft.ops.Retrieval.freezeStats]] — the offline index-build
    * half; collecting it is one action over STATIC data at stage
    * construction, |query terms| + 1 doubles on the driver). The
    * per-batch work is a pure narrow map — native per-term token
    * counts, literal idf/avgdl, no shuffle, NO STATE — so the gate
    * composes anywhere in the ingest chain and a routing sink can
    * fan matched docs out by qid. Emits one row per (doc, matched
    * query) at score ≥ minScoreMicros; unmatched docs are absent.
    */
  def keywordGate(docs: DataFrame, stats: graft.ops.Retrieval.FrozenStats,
      minScoreMicros: Long): DataFrame =
    graft.ops.Retrieval.scoreFrozen(docs, "text", stats, minScoreMicros)

  /** Ingest-time EXPANDED-query gate (X110 — [[keywordGate]] with the
    * PRF vocabulary): scores arriving docs against the weighted
    * expanded queries FROZEN from a static reference corpus
    * ([[graft.ops.Retrieval.freezePrf]] — expansion terms + idf +
    * avgdl, size bounded by the query set). Catches docs that match
    * the relevant set's VOCABULARY without using the queries' literal
    * terms — the recall the plain keyword gate structurally lacks.
    * Pure narrow map, no shuffle, no state; emits one row per (doc,
    * query) at score ≥ minScoreMicros.
    */
  def prfGate(docs: DataFrame, idCol: String, frozen: graft.ops.Retrieval.FrozenPrf,
      minScoreMicros: Long): DataFrame =
    graft.ops.Retrieval.scorePrfFrozen(docs, idCol, "text", frozen)
      .filter(col("score_micros") >= minScoreMicros)

  /** Ingest-time CCNet bucketing (X111 — [[Curation.ccnetBuckets]]'s
    * streaming half, the literal CCNet production shape): score each
    * arriving doc under the FROZEN bigram LM and assign head/middle/
    * tail against the FROZEN per-source cutpoint values
    * ([[graft.ops.Curation.freezeCcnet]]). Value-threshold semantics:
    * CE ties at a boundary go to the better bucket (the batch
    * operator splits boundary ties by id — the one divergence, by
    * design); sources unseen at freeze time go to `tail` (no
    * evidence of head-ness); bigram-less docs surface as `unscored`.
    * Pure narrow map, no shuffle, no state.
    */
  def ccnetGate(docs: DataFrame,
      model: graft.ops.TextAnalysis.LmModel,
      cuts: graft.ops.Curation.FrozenCcnet,
      sourceCol: String = "source"): DataFrame = {
    val c1 = typedLit(cuts.cut1)
    val c2 = typedLit(cuts.cut2)
    graft.ops.TextAnalysis.scoreLmFrozen(docs, "text", model)
      .withColumn("ce_t", when(col("n_bigrams") > 0,
        expr("CAST((-logp_micros) div n_bigrams AS BIGINT)")))
      .withColumn("bucket",
        when(col("n_bigrams") === 0, lit("unscored"))
          .when(col("ce_t") <= coalesce(
            element_at(c1, col(sourceCol)), lit(Long.MinValue)), "head")
          .when(col("ce_t") <= coalesce(
            element_at(c2, col(sourceCol)), lit(Long.MinValue)), "middle")
          .otherwise(lit("tail")))
      .drop("ce_micros")
  }

  /** Ingest-time DSIR gate (X72's streaming twin): weight each
    * arriving doc by target-likeness with bucket log-ratios FROZEN
    * from static corpora ([[graft.ops.Curation.freezeDsir]] — the
    * nBuckets-long array IS the model). Pure narrow map, no state;
    * docs below `minLogwMicros` drop — importance FILTERING on
    * ingest (the resampling variant keeps the weight column and
    * samples downstream).
    */
  def dsirGate(docs: DataFrame, lrMicros: IndexedSeq[Long],
      minLogwMicros: Long): DataFrame =
    graft.ops.Curation.scoreDsirFrozen(docs, "text", lrMicros)
      .filter(col("logw_micros") >= minLogwMicros)

  /** Ingest-time exemplar gate (X131's streaming twin): fuse each
    * arriving doc's quality signals at ranges FROZEN from a static
    * reference corpus ([[graft.ops.Curation.freezeQualityRanges]] —
    * six longs per source IS the model; normalization clamped, unseen
    * sources drop) and keep docs whose fused score clears the
    * threshold. Pure narrow map + one tiny broadcast, no state.
    */
  def exemplarGate(docs: DataFrame,
      frozen: graft.ops.Curation.QualityRanges,
      minFusedMicros: Long): DataFrame =
    graft.ops.Curation.scoreQualityFrozen(docs, "doc_id", "text",
        "source", frozen)
      .filter(col("fused_micros") >= minFusedMicros)

  /** Streaming OOV gate (X140's live half): score arriving docs
    * against a FROZEN vocabulary ([[graft.ops.TextAnalysis
    * .freezeVocab]] — s strings IS the model, embedded in the
    * codegen'd hash-set membership counter) and keep docs under the
    * OOV-rate ceiling. Pure narrow map: no state, no shuffle, no
    * broadcast even — the vocab rides the compiled plan. Frozen
    * -on-self == the batch [[graft.ops.TextAnalysis.oovScore]]
    * exactly (spec-pinned); a vocab shift is a model-refresh event,
    * the standing frozen-twin contract.
    */
  def oovGate(docs: DataFrame,
      frozen: graft.ops.TextAnalysis.FrozenVocab,
      maxOovMicros: Long): DataFrame =
    graft.ops.TextAnalysis.oovScore(docs, "doc_id", "text", frozen)
      .filter(col("oov_micros") <= maxOovMicros)

  /** Streaming script gate (X139's live half): keep docs whose
    * dominant Unicode script ([[graft.ops.TextAnalysis.scriptOf]])
    * is in the allowed set AND holds at least `minShareMicros` of
    * the doc's characters — the ingest-time mojibake/mixed-script
    * filter. Pure narrow map: the script ranges are plan constants,
    * no state, no shuffle.
    */
  def scriptGate(docs: DataFrame, allowed: Seq[String],
      minShareMicros: Long): DataFrame =
    graft.ops.TextAnalysis.scriptOf(docs, "doc_id", "text")
      .filter(col("script").isin(allowed: _*) &&
        col("share_micros") >= minShareMicros)

  /** Streaming cluster-balanced sample (X127's live twin): arriving
    * vectors assign to FROZEN k-means centroids
    * ([[graft.ops.Similarity.freezeCentroids]] — nlist·(dim+2)
    * doubles IS the model) as a pure narrow map, then stream into the
    * X102 bottom-k [[SampleStore]] with the cluster as the stratum
    * and [[graft.ops.Similarity.clusterSample]]'s own rank salt.
    * Bottom-k merges exactly, so PER CLUSTER the served sample is the
    * exact quota over everything ever ingested; the cluster
    * PARTITION itself is the frozen one — the build/serve contract
    * shared by every frozen twin here (the batch operator RETRAINS
    * on its input, so batch == stream is pinned on the freeze corpus
    * (spec), and post-freeze ingest that shifts cluster structure is
    * a model-refresh event, exactly as for the ANN index). Serve via
    * `SampleStore.sample`.
    */
  def clusterSampleMaintain(vecs: DataFrame, vecCol: String,
      model: graft.ops.Similarity.CentroidModel, idCol: String,
      tableDir: String, checkpointDir: String, n: Int,
      nBuckets: Int = StateTable.DefaultBuckets)
      : org.apache.spark.sql.streaming.StreamingQuery =
    SampleStore.maintain(
      graft.ops.Similarity.assignFrozen(vecs, vecCol, model),
      idCol, "cl", tableDir, checkpointDir, n, nBuckets,
      salt = "clsample_")

  /** Ingest-time classifier gate (X125's streaming twin — the
    * fastText-filter production shape): classify each arriving doc
    * under a hashed-NB model FROZEN from a static labeled corpus
    * ([[graft.ops.Curation.freezeNb]] — K·(nBuckets+1) longs IS the
    * model) and keep docs whose predicted class lands in `keep`
    * (e.g. the high-quality reference domains). Pure narrow map, no
    * state; the `predicted`/`score_micros` columns ride along for
    * downstream audit.
    */
  def nbGate(docs: DataFrame, model: graft.ops.Curation.NbModel,
      keep: Set[String]): DataFrame =
    graft.ops.Curation.scoreNbFrozen(docs, "text", model)
      .filter(col("predicted").isin(keep.toSeq: _*))

  /** Ingest-time LM fluency gate (X76's streaming twin — the CCNet
    * shape): score each arriving doc's per-token cross-entropy under a
    * bigram LM FROZEN from a static reference corpus
    * ([[graft.ops.TextAnalysis.freezeLm]] — 2·nBuckets longs IS the
    * model). Pure narrow map, no state; docs whose cross-entropy
    * exceeds `maxCeMicros` drop. Docs too short to score (no bigrams,
    * null ce_micros) PASS — the gate has no evidence against them and
    * a length gate is a separate concern.
    */
  def lmGate(docs: DataFrame, model: graft.ops.TextAnalysis.LmModel,
      maxCeMicros: Long): DataFrame =
    graft.ops.TextAnalysis.scoreLmFrozen(docs, "text", model)
      .filter(col("ce_micros").isNull || col("ce_micros") <= maxCeMicros)

  /** Ingest-time drift gauge (X93's streaming twin): per-source JS
    * divergence of each micro-batch against a token distribution
    * FROZEN from a static reference corpus
    * ([[graft.ops.Drift.freezeDistribution]] — maxVocab (token,
    * count) pairs IS the model). The reference side is a broadcast
    * literal table; the batch pays only its own in-batch counts — no
    * state, no corpus rescan. Use from foreachBatch; one row per
    * source per batch, the time series an ingestion alert reads.
    */
  def driftGauge(docs: DataFrame,
      dist: graft.ops.Drift.FrozenDist): DataFrame =
    graft.ops.Drift.tokenJsFrozen(docs, "text", "source", dist)

  /** The embedding-space drift gauge for ingest — per-cohort centroid
    * cosine of each micro-batch against a centroid FROZEN from a
    * static reference corpus ([[graft.ops.Drift.freezeCentroid]] —
    * 64 doubles IS the model). Use from foreachBatch beside
    * [[driftGauge]]: the two gauges together catch vocabulary drift
    * AND semantic drift per batch.
    */
  def embeddingDriftGauge(embs: DataFrame,
      frozen: graft.ops.Drift.FrozenCentroid): DataFrame =
    graft.ops.Drift.embeddingDriftFrozen(embs, "embedding", "label", frozen)

  /** Ingest-time contamination gate: each streamed doc's n-gram
    * CONTAINMENT of any benchmark shingle (X46's measure) against a
    * STATIC benchmark corpus — a stream-static equi-join on the hashed
    * shingle longs (the static side is small: benchmark suites are
    * thousands of items, so Spark broadcasts it), then one watermarked
    * per-doc aggregation. Output (append, final once the watermark
    * passes the doc): doc_id, ts, containment_micros, contaminated.
    * Docs landing above the threshold are flagged ON INGEST, before
    * they ever reach a training mix. `bench` needs a `text` column;
    * `docs` needs (doc_id, text, ts).
    */
  /** X117's streaming half — the Bloom-gated contamination check as a
    * pure NARROW map: the benchmark shingles freeze into a
    * [[graft.ops.Bloom]] bit array (a plan-time literal, mBits/8
    * bytes), and each arriving doc counts its might-match shingles
    * IN-ROW. No join, no aggregation, no watermark, no state: a doc
    * is flagged in the same micro-batch it arrives in, where
    * [[contaminationGate]] holds every doc until the watermark
    * passes it.
    *
    * Semantics: the reported containment is an UPPER BOUND (Bloom
    * false positives only ADD hits — the no-false-negative law means
    * every truly-contaminated doc is flagged; a clean doc flags with
    * probability ≤ the fp rate compounded over its shingles). That is
    * the correct polarity for an ingest gate: flagged docs go to the
    * exact offline audit (X46/X117), unflagged docs are PROVEN clean.
    */
  def bloomContaminationGate(docs: DataFrame, bench: DataFrame, k: Int,
      threshold: Double, mBits: Int = 1 << 16,
      probes: Int = 4): DataFrame = {
    val words = graft.ops.Bloom.build(
      bench.select(explode(
        graft.ops.Dedup.hashedShingles(col("text"), k)).as("h")).distinct(),
      "h", mBits, probes)
    val bm = typedLit(words.toSeq)
    val hs = graft.ops.Dedup.hashedShingles(col("text"), k)
    // NULL-text docs must vanish (not emit NULL verdicts that escape
    // both filter(contaminated) and filter(!contaminated)) — the same
    // outcome the exact gate produces via its explode, and the X97
    // null convention the stores use.
    docs
      .filter(col("text").isNotNull)
      .withColumn("hs", hs)
      .withColumn("n", size(col("hs")))
      .withColumn("common",
        size(filter(col("hs"),
          h => graft.ops.Bloom.mightContain(bm, h, mBits, probes))))
      .select(col("doc_id"), col("ts"),
        round(col("common").cast("double") / col("n") * 1e6)
          .cast("long").as("containment_micros"))
      .withColumn("contaminated",
        col("containment_micros") >= (threshold * 1e6).toLong)
  }

  def contaminationGate(docs: DataFrame, bench: DataFrame, k: Int,
      watermark: String, threshold: Double): DataFrame = {
    val benchHashes = bench
      .select(explode(graft.ops.Dedup.hashedShingles(col("text"), k)).as("h"))
      .distinct()
      .withColumn("hit", lit(1))
    docs
      .withColumn("hs", graft.ops.Dedup.hashedShingles(col("text"), k))
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"), size(col("hs")).as("n"),
        explode(col("hs")).as("h"))
      .join(benchHashes, Seq("h"), "left")
      .groupBy(col("doc_id"), col("ts"), col("n"))
      .agg(count(col("hit")).as("common"))
      .select(col("doc_id"), col("ts"),
        round(col("common").cast("double") / col("n") * 1e6)
          .cast("long").as("containment_micros"))
      .withColumn("contaminated",
        col("containment_micros") >= (threshold * 1e6).toLong)
  }

  /** Streaming WET sink — the crawl chain's live EXIT (X124's
    * streaming twin): each micro-batch of documents runs the shared
    * wrap → X122 extraction projection and lands as CC-convention
    * `.warc.wet.gz` segments (gzip member per record), one file per
    * (batch, partition) at a DETERMINISTIC name — so Structured
    * Streaming's at-least-once batch replay yields exactly-once
    * segments (a replayed batch rewrites its own files byte-for-byte,
    * never duplicates them). Compose after the curation gates:
    * `wetSink(curated(piiScrubbed(docs), …), …)` is live crawl →
    * scrub → gate → dedup → standard-format export, end to end.
    * Segments are immediately servable by [[graft.ops.IoFormats
    * .readWarc]]/`streamWarc` — the chain round-trips while running.
    */
  def wetSink(docs: DataFrame, idCol: String, textCol: String,
      outDir: String, checkpointDir: String): StreamingQuery =
    graft.ops.IoFormats.wetRows(docs, idCol, textCol)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        batch.as[(Long, String)].foreachPartition {
          (it: Iterator[(Long, String)]) =>
            val pid = org.apache.spark.TaskContext.getPartitionId()
            graft.ops.IoFormats.writeWetSegment(it, outDir,
              f"batch-$batchId%06d-part-$pid%05d.warc.wet.gz")
        }
        ()
      }
      .start()
}
