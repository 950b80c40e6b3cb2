package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus drift monitoring — per-source Jensen–Shannon divergence of
  * the token distribution against the whole-corpus distribution
  * (builder brief; beyond-reference extension per SURVEY §2.10 X93).
  *
  * The ingestion-health gauge of a training-data pipeline: a source
  * whose JS jumps between snapshots changed its content mix (format
  * drift, spam influx, language shift) long before any downstream
  * metric moves. JS over a shared support is symmetric, bounded by
  * ln 2, and defined even where one side has zero mass — the right
  * default among the divergences.
  *
  * == Determinism contract ==
  *
  * The support is the top `maxVocab` corpus tokens by (count desc,
  * token asc) — a deterministic cut that also BOUNDS the state (the
  * drift of the head is the signal; the tail is noise by
  * construction). Both distributions renormalize over that support.
  * Per-token contributions are micro-quantized BEFORE the per-source
  * sum (integer order-free addition — the cross-row float-sum rule),
  * and the contribution arithmetic is spelled identically on both
  * engines: p = n_st/n_s, q = n_t/n, m = (p+q)/2,
  * c = [p>0] · 0.5·p·ln(p/m) + 0.5·q·ln(q/m).
  *
  * == 100 TB shape ==
  *
  * Two partial-aggregated count shuffles (corpus histogram, per-source
  * histogram over the vocab-filtered stream — the filter is a
  * broadcast semi-join, the corpus never re-shuffles for it); the
  * scoring grid is |sources| × maxVocab rows, independent of corpus
  * bytes. Output: one row per source.
  */
object Drift {

  /** The per-token JS contribution over (n_st, n_s, n_t, n) columns —
    * shared verbatim by the in-plan gauge and the frozen streaming
    * twin so the two can never drift from each other.
    */
  private def contribMicros = {
    // p is 0/0-guarded: a source with NO in-support tokens has n_s = 0
    // (every n_st is 0 too) — the guard pins p to 0 so each token
    // contributes the pure q-side 0.5·q·ln 2 and the source surfaces
    // at js ≈ ln 2 (maximal drift) instead of NaN-ing out. For
    // n_s > 0 rows the CASE selects the unguarded expression — values
    // unchanged.
    val p = when(col("n_s") > 0, col("n_st").cast("double") / col("n_s"))
      .otherwise(lit(0.0))
    val q = col("n_t").cast("double") / col("n")
    val m = (p + q) / 2
    val contrib =
      when(col("n_st") > 0, lit(0.5) * p * log(p / m)).otherwise(lit(0.0)) +
        lit(0.5) * q * log(q / m)
    round(contrib * 1e6).cast("long")
  }

  /** The (source, n_s, n_st, n_t, n) grid → (source, n_tokens,
    * js_micros) scoring tail shared by both gauges. Every source
    * present in `toks` gets a row — a source whose tokens all fall
    * outside the support scores ≈ ln 2, the worst-case-visible analog
    * of the recall gauges' zero-hit rows.
    */
  private def scoreGrid(toks: DataFrame, vocab: DataFrame,
      corpusTot: DataFrame): DataFrame = {
    val st = toks.join(broadcast(vocab.select(col("tok"))), "tok")
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("n_st"))
    val srcTot = toks.select(col("source")).distinct()
      .join(st.groupBy(col("source")).agg(sum(col("n_st")).as("n_s0")),
        Seq("source"), "left")
      .select(col("source"), coalesce(col("n_s0"), lit(0L)).as("n_s"))
    srcTot
      .crossJoin(broadcast(vocab))
      .crossJoin(broadcast(corpusTot))
      .join(st, Seq("source", "tok"), "left")
      .select(col("source"), col("n_s"),
        coalesce(col("n_st"), lit(0L)).as("n_st"), col("n_t"), col("n"))
      .select(col("source"), col("n_s"), contribMicros.as("c"))
      .groupBy(col("source")).agg(max(col("n_s")).as("n_tokens"),
        sum(col("c")).as("js_micros"))
  }

  /** Per-source JS divergence vs the corpus, over the top-`maxVocab`
    * token support. Output: (source, n_tokens, js_micros).
    */
  def tokenJsDrift(docs: DataFrame, textCol: String, sourceCol: String,
      maxVocab: Int): DataFrame = {
    val toks = docs.select(col(sourceCol).as("source"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("n_t"))
      .orderBy(col("n_t").desc, col("tok").asc).limit(maxVocab)
    scoreGrid(toks, vocab, vocab.agg(sum(col("n_t")).as("n")))
  }

  /** The reference token distribution FROZEN from a static corpus —
    * `maxVocab` (token, count) pairs plus the total: the model is
    * bounded by construction (the frozen-stats pattern of
    * [[TextAnalysis.freezeLm]] / [[Curation.freezeDsir]]).
    */
  case class FrozenDist(toks: IndexedSeq[(String, Long)], total: Long)

  def freezeDistribution(docs: DataFrame, textCol: String,
      maxVocab: Int): FrozenDist = {
    val rows = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n_t"))
      .orderBy(col("n_t").desc, col("tok").asc).limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1))).toIndexedSeq
    FrozenDist(rows, rows.map(_._2).sum)
  }

  /** Per-source JS of `docs` against a FROZEN reference distribution
    * — the streaming twin of [[tokenJsDrift]]: the reference side is
    * a broadcast literal table, so a micro-batch pays only its own
    * in-batch counts (no state, no corpus rescan). Scoring the
    * freeze's own corpus reproduces [[tokenJsDrift]] exactly
    * (OpsSpec pins it); scoring arriving batches against last week's
    * frozen corpus is the snapshot-over-snapshot monitor.
    * Output: (source, n_tokens, js_micros) per source present in
    * `docs`.
    */
  def tokenJsFrozen(docs: DataFrame, textCol: String, sourceCol: String,
      dist: FrozenDist): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab = dist.toks.toDF("tok", "n_t")
    val toks = docs.select(col(sourceCol).as("source"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    scoreGrid(toks, vocab,
      Seq(dist.total).toDF("n"))
  }

  /** The embedding-space companion of [[tokenJsDrift]]: per-group
    * centroid cosine against the corpus centroid — catches drift the
    * token gauge can't see (same vocabulary, shifted semantics) and
    * vice versa. Centroid components are the house micro-quantized
    * means ([[Similarity.centroids]] — integer-exact on both
    * engines), so unlike the JS gauge there is no transcendental in
    * sight: the output is deterministic to the bit. A cohort whose
    * centroid swings away from the corpus (cos_micros drops) changed
    * its embedding mix.
    *
    * Cost: two partial-aggregated (group, dim)-cell shuffles over
    * the corpus scan, then a |groups|-row broadcast join — one row
    * per group out, independent of corpus bytes.
    * Output: (label, n_vecs, cos_micros).
    */
  def embeddingDrift(embs: DataFrame, idCol: String, vecCol: String,
      groupCol: String): DataFrame = {
    val gcent = Similarity.centroids(embs, groupCol, vecCol)
    val ccent = Similarity.centroids(
      embs.withColumn("__all", lit(0L)), "__all", vecCol)
      .select(col("cent").as("ccent"))
    val counts = embs.groupBy(col(groupCol).cast("long").as("label"))
      .agg(count(lit(1)).as("n_vecs"))
    gcent.crossJoin(broadcast(ccent))
      .select(col("cl").cast("long").as("label"),
        Vectors.cosineMicros(col("cent"), col("ccent")).as("cos_micros"))
      .join(broadcast(counts), "label")
      .select(col("label"), col("n_vecs"), col("cos_micros"))
  }

  /** The corpus centroid FROZEN from a static corpus — 64
    * micro-quantized means, the whole model ([[FrozenDist]]'s
    * embedding-space sibling).
    */
  case class FrozenCentroid(cent: IndexedSeq[Double])

  def freezeCentroid(embs: DataFrame, vecCol: String): FrozenCentroid =
    FrozenCentroid(
      Similarity.centroids(embs.withColumn("__all", lit(0L)), "__all", vecCol)
        .collect()(0).getSeq[Double](1).toIndexedSeq)

  /** Per-group centroid cosine of `embs` against a FROZEN reference
    * centroid — the streaming twin of [[embeddingDrift]]: the
    * reference is a 64-double literal, the batch pays only its own
    * per-group means. Scoring the freeze's own corpus reproduces
    * [[embeddingDrift]] exactly (OpsSpec pins it).
    * Output: (label, n_vecs, cos_micros).
    */
  def embeddingDriftFrozen(embs: DataFrame, vecCol: String,
      groupCol: String, frozen: FrozenCentroid): DataFrame = {
    val gcent = Similarity.centroids(embs, groupCol, vecCol)
    val counts = embs.groupBy(col(groupCol).cast("long").as("label"))
      .agg(count(lit(1)).as("n_vecs"))
    gcent
      .select(col("cl").cast("long").as("label"),
        Vectors.cosineMicros(col("cent"),
          typedLit(frozen.cent)).as("cos_micros"))
      .join(broadcast(counts), "label")
      .select(col("label"), col("n_vecs"), col("cos_micros"))
  }

  /** DuckDB twin of [[embeddingDrift]] — the same quantized-centroid
    * CTE for groups and (constant-cluster) corpus. With `refTable`
    * the reference centroid comes from a DIFFERENT snapshot than the
    * scored groups (the [[embeddingDriftFrozen]] two-snapshot shape);
    * default: self.
    */
  def embeddingDriftSql(id: String, vec: String, group: String,
      table: String, refTable: String = null): String = {
    val ref = Option(refTable).getOrElse(table)
    s"""WITH g AS (${Similarity.centroidsSql(group, vec, table)}),
       |c AS (SELECT cent AS ccent FROM (
       |  ${Similarity.centroidsSql("0", vec, ref)})),
       |n AS (SELECT $group::BIGINT AS label, count(*)::BIGINT AS n_vecs
       |      FROM $table GROUP BY 1)
       |SELECT g.cl::BIGINT AS label, n.n_vecs,
       |  ${Vectors.cosineMicrosSql("g.cent", "c.ccent")} AS cos_micros
       |FROM g CROSS JOIN c JOIN n ON n.label = g.cl::BIGINT""".stripMargin
  }

  /** DuckDB twin of [[tokenJsDrift]] — same support cut, same
    * contribution arithmetic, same quantize-before-sum. With
    * `refTable` the support AND the q-side distribution come from a
    * DIFFERENT snapshot than the scored sources (the
    * [[tokenJsFrozen]] two-snapshot shape); default: self.
    */
  def tokenJsDriftSql(text: String, source: String, table: String,
      maxVocab: Int, refTable: String = null): String = {
    val ref = Option(refTable).getOrElse(table)
    s"""WITH toks AS (
       |  SELECT $source AS source, unnest(${TextAnalysis.tokensSql(text)}) AS tok
       |  FROM $table),
       |rtoks AS (
       |  SELECT unnest(${TextAnalysis.tokensSql(text)}) AS tok FROM $ref),
       |vocab AS (
       |  SELECT tok, count(*)::BIGINT AS n_t FROM rtoks
       |  GROUP BY tok ORDER BY n_t DESC, tok LIMIT $maxVocab),
       |st AS (
       |  SELECT source, t.tok, count(*)::BIGINT AS n_st
       |  FROM toks t JOIN vocab v ON v.tok = t.tok
       |  GROUP BY 1, 2),
       |stot AS (
       |  SELECT s.source, coalesce(t.n_s0, 0)::BIGINT AS n_s
       |  FROM (SELECT DISTINCT source FROM toks) s
       |  LEFT JOIN (SELECT source, sum(n_st)::BIGINT AS n_s0 FROM st
       |             GROUP BY 1) t ON t.source = s.source),
       |ctot AS (SELECT sum(n_t)::BIGINT AS n FROM vocab),
       |grid AS (
       |  SELECT s.source, s.n_s, coalesce(x.n_st, 0)::BIGINT AS n_st,
       |    v.n_t, c.n
       |  FROM stot s CROSS JOIN vocab v CROSS JOIN ctot c
       |  LEFT JOIN st x ON x.source = s.source AND x.tok = v.tok),
       |scored AS (
       |  SELECT source, n_s,
       |    round((CASE WHEN n_st > 0 THEN
       |        0.5 * (CASE WHEN n_s > 0 THEN n_st::DOUBLE / n_s ELSE 0.0 END)
       |            * ln((CASE WHEN n_s > 0 THEN n_st::DOUBLE / n_s ELSE 0.0 END)
       |                 / (((CASE WHEN n_s > 0 THEN n_st::DOUBLE / n_s ELSE 0.0 END) + (n_t::DOUBLE / n)) / 2))
       |      ELSE 0.0 END
       |      + 0.5 * (n_t::DOUBLE / n)
       |          * ln((n_t::DOUBLE / n)
       |               / (((CASE WHEN n_s > 0 THEN n_st::DOUBLE / n_s ELSE 0.0 END) + (n_t::DOUBLE / n)) / 2)))
       |      * 1e6)::BIGINT AS c
       |  FROM grid)
       |SELECT source, max(n_s)::BIGINT AS n_tokens,
       |  sum(c)::BIGINT AS js_micros
       |FROM scored GROUP BY source""".stripMargin
  }
}
