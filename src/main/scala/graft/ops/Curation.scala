package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-mechanics operators a training-data pipeline runs after
  * cleaning: deterministic dataset splitting, sequence packing, and
  * benchmark-contamination checking. All exact integer/micro math over
  * the shared md5-hash60 family — every operator oracle-checked.
  */
object Curation {

  /** Deterministic split assignment: bucket = hash60("split_" ++ id)
    * mod 100, train < trainPct <= val < trainPct+valPct <= test. The
    * hash (not a random draw) makes the split REPRODUCIBLE and stable
    * under corpus growth — a doc's split never depends on what else is
    * in the corpus, so re-runs and incremental ingests can't leak
    * train docs into test. A narrow map; no shuffle.
    */
  def splitOf(id: Column, trainPct: Int, valPct: Int): Column = {
    val bucket = pmod(Hashing.hash60(concat(lit("split_"), id.cast("string"))),
      lit(100))
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  def splitOfSql(id: String, trainPct: Int, valPct: Int): String = {
    val bucket = s"(${Hashing.hash60Sql(s"'split_' || $id::VARCHAR")} % 100)"
    s"""CASE WHEN $bucket < $trainPct THEN 'train'
       |     WHEN $bucket < ${trainPct + valPct} THEN 'val'
       |     ELSE 'test' END""".stripMargin
  }

  /** Per-(source, split) doc and token counts — the split audit a
    * training run records. One partial-aggregated shuffle.
    */
  def splitCounts(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, trainPct: Int, valPct: Int): DataFrame =
    docs.select(col(sourceCol).as("source"),
        splitOf(col(idCol), trainPct, valPct).as("split"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tok"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))

  def splitCountsSql(id: String, text: String, source: String, table: String,
      trainPct: Int, valPct: Int): String =
    s"""SELECT $source AS source, ${splitOfSql(id, trainPct, valPct)} AS split,
       |  count(*)::BIGINT AS n_docs,
       |  sum(${TextAnalysis.tokenCountSql(text)})::BIGINT AS n_tokens
       |FROM $table GROUP BY 1, 2""".stripMargin

  /** Deterministic domain-mixture sampling: keep a doc with per-source
    * probability `weights(source)` (fallback `default`), decided by a
    * hash bucket of the doc id rather than a random draw — the sampled
    * set is reproducible, stable under corpus growth, and disjoint
    * sampling decisions (e.g. the [[splitOf]] bucket) stay independent
    * because each decision salts the hash differently. This is the
    * standard pretraining "domain weights" knob (upweight curated
    * sources, downsample crawl). Narrow filter; no shuffle.
    */
  def mixSample(docs: DataFrame, idCol: String, sourceCol: String,
      weights: Map[String, Double], default: Double): DataFrame = {
    val bucket = pmod(Hashing.hash60(
      concat(lit("mix_"), col(idCol).cast("string"))), lit(1000000L))
    val rate = weights.foldLeft(lit(default)) { case (acc, (src, w)) =>
      when(col(sourceCol) === src, lit(w)).otherwise(acc)
    }
    docs.filter(bucket < rate * 1e6)
  }

  /** Per-source audit of the sampled mixture: kept docs + tokens. */
  def mixCounts(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, weights: Map[String, Double],
      default: Double): DataFrame =
    mixSample(docs, idCol, sourceCol, weights, default)
      .select(col(sourceCol).as("source"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))

  def mixCountsSql(id: String, text: String, source: String, table: String,
      weights: Map[String, Double], default: Double): String = {
    val rate = weights.toSeq.sortBy(_._1).map { case (src, w) =>
      s"WHEN $source = '$src' THEN $w"
    }.mkString("CASE ", " ", s" ELSE $default END")
    s"""SELECT $source AS source, count(*)::BIGINT AS n_docs,
       |  sum(${TextAnalysis.tokenCountSql(text)})::BIGINT AS n_tokens
       |FROM $table
       |WHERE (${Hashing.hash60Sql(s"'mix_' || $id::VARCHAR")} % 1000000)
       |  < ($rate) * 1e6
       |GROUP BY 1""".stripMargin
  }

  /** Stratified per-source sampling with an EXACT quota: the n docs
    * per source whose salted id-hash ranks lowest (ties by id). Unlike
    * [[mixSample]] (a keep-RATE decided row-locally) this guarantees
    * an exact per-stratum COUNT — the "give me exactly 10k docs from
    * every source" shape used for eval sets and pilot mixes — at the
    * cost of one rank: a per-source window, the same single wide
    * stage as [[qualityCalibrate]]. The hash order (not id order)
    * makes the sample unbiased w.r.t. ingest order yet fully
    * reproducible; the salt keeps it independent of the split/mix
    * decisions. Output: (source, doc_id, rank).
    */
  def stratifiedSample(docs: DataFrame, idCol: String, sourceCol: String,
      n: Int): DataFrame = {
    val h = Hashing.hash60(concat(lit("strat_"), col("id").cast("string")))
    val w = Window.partitionBy(col("source")).orderBy(col("h"), col("id"))
    docs.select(col(sourceCol).as("source"), col(idCol).as("id"))
      .withColumn("h", h)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
      .select(col("source"), col("id").as("doc_id"), col("rank"))
  }

  def stratifiedSampleSql(id: String, source: String, table: String,
      n: Int): String =
    s"""SELECT source, id AS doc_id, rank FROM (
       |  SELECT $source AS source, $id AS id,
       |    row_number() OVER (PARTITION BY $source
       |      ORDER BY ${Hashing.hash60Sql(s"'strat_' || $id::VARCHAR")}, $id
       |    )::BIGINT AS rank
       |  FROM $table)
       |WHERE rank <= $n""".stripMargin

  /** X126 — reproducible epoch shuffle (the training-order plan):
    * the deterministic global permutation every training run needs
    * between curation and the data loader. Each doc lands in a shard
    * by the X89 salted shard hash (stable across epochs — a doc's
    * FILE never moves, so shard-level caching and resume hold), and
    * WITHIN its shard is ordered by an epoch-salted hash — a fresh
    * reproducible permutation per epoch from `salt` alone, no RNG
    * state, no coordination, any-engine replayable. A doc's (shard,
    * pos) is a pure function of (id, salts, nShards): audits,
    * resumes, and loss-spike forensics ("what exactly did step K
    * see?") replay it bit-for-bit.
    *
    * Output is the per-shard audit digest (nShards rows): doc count,
    * the shard's first doc id (`head_id`, the resume anchor), and an
    * ORDER-SENSITIVE fingerprint `ord_fp` = bit-XOR over docs of
    * hash60(pos ":" okey) — the position is coupled to the doc's
    * order key INSIDE the hash, so the per-doc terms are
    * non-separable: transposing two docs replaces both terms with
    * hashes of different payloads and the XOR changes. (A linear
    * packing like pos·2³¹ + okeyLow would NOT work: XOR factors over
    * independent bit fields, positions always XOR to a
    * membership-independent constant, and swapped payloads cancel
    * pairwise — order-insensitive despite appearances.) Engines and
    * re-runs agreeing on the fingerprint proves the full sequence,
    * not just membership.
    *
    * == 100 TB shape ==
    *
    * ONE hash exchange on the shard id + a per-shard LOCAL sort (the
    * window partitions on `shard`) — the terasort-per-shard shape
    * production uses to write training data; NO global sort, no
    * driver-side permutation table. Shard count is the knob: size
    * shards to the loader's file budget and the per-task sort stays
    * in memory.
    */
  def epochShuffle(docs: DataFrame, idCol: String, nShards: Int,
      salt: String): DataFrame = {
    val d = docs.select(col(idCol).as("id"))
      .withColumn("shard",
        pmod(Hashing.hash60(concat(col("id").cast("string"), lit(":shard"))),
          lit(nShards.toLong)).cast("int"))
      .withColumn("okey",
        Hashing.hash60(concat(lit(s"epoch_${salt}_"), col("id").cast("string"))))
    val w = Window.partitionBy(col("shard")).orderBy(col("okey"), col("id"))
    d.withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("ph", Hashing.hash60(concat(col("pos").cast("string"),
        lit(":"), col("okey").cast("string"))))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        max(when(col("pos") === 1, col("id"))).as("head_id"),
        expr("bit_xor(ph)").as("ord_fp"))
  }

  def epochShuffleSql(id: String, table: String, nShards: Int,
      salt: String): String =
    s"""WITH p AS (
       |  SELECT id, shard, okey, row_number() OVER (
       |      PARTITION BY shard ORDER BY okey, id)::BIGINT AS pos
       |  FROM (SELECT $id AS id,
       |    (${Hashing.hash60Sql(s"$id::VARCHAR || ':shard'")}
       |      % $nShards)::INT AS shard,
       |    ${Hashing.hash60Sql(s"'epoch_${salt}_' || $id::VARCHAR")} AS okey
       |  FROM $table))
       |SELECT shard, count(*)::BIGINT AS n_docs,
       |  max(CASE WHEN pos = 1 THEN id END)::BIGINT AS head_id,
       |  bit_xor(${Hashing.hash60Sql("pos::VARCHAR || ':' || okey::VARCHAR")})::BIGINT
       |    AS ord_fp
       |FROM p GROUP BY 1""".stripMargin

  /** Dataset card: the per-source summary a corpus release publishes —
    * doc/token counts, rank-based median and max document length, the
    * dominant predicted language and the number of distinct ones. All
    * integer/rank math (the median is the ⌈n/2⌉-th smallest token
    * count — no interpolation), so the oracle compare is exact. One
    * narrow scoring pass, one per-source window for the median rank,
    * one partial-agg shuffle for the counts, one tiny per-(source,
    * lang) agg for the mode — at 100 TB the windows are the only
    * sort-wide stages and they key on the (bounded) source set.
    */
  def datasetCard(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val scored = docs.select(col(sourceCol).as("source"), col(idCol).as("id"),
      TextAnalysis.tokenCount(col(textCol)).as("n_tok"),
      TextAnalysis.langId(col(textCol)).as("lang"))
    val wMed = Window.partitionBy(col("source")).orderBy(col("n_tok"), col("id"))
    val agg = scored.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tok")).cast("long").as("n_tokens"),
      max(col("n_tok")).as("max_tokens"),
      countDistinct(col("lang")).as("n_langs"))
    val med = scored
      .withColumn("rn", row_number().over(wMed))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
      .filter(col("rn") === ceil(col("n") / 2.0))
      .select(col("source"), col("n_tok").as("med_tokens"))
    val wLang = Window.partitionBy(col("source"))
      .orderBy(col("n").desc, col("lang").asc)
    val top = scored.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(wLang))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("top_lang"))
    agg.join(med, "source").join(top, "source")
  }

  def datasetCardSql(id: String, text: String, source: String,
      table: String): String =
    s"""WITH s AS (
       |  SELECT $source AS source, $id AS id,
       |    ${TextAnalysis.tokenCountSql(text)} AS n_tok,
       |    ${TextAnalysis.langIdSql(text)} AS lang
       |  FROM $table),
       |a AS (
       |  SELECT source, count(*)::BIGINT AS n_docs,
       |    sum(n_tok)::BIGINT AS n_tokens, max(n_tok)::BIGINT AS max_tokens,
       |    count(DISTINCT lang)::BIGINT AS n_langs
       |  FROM s GROUP BY 1),
       |m AS (
       |  SELECT source, n_tok AS med_tokens FROM (
       |    SELECT source, n_tok,
       |      row_number() OVER (PARTITION BY source ORDER BY n_tok, id) AS rn,
       |      count(*) OVER (PARTITION BY source) AS n
       |    FROM s) WHERE rn = ceil(n / 2.0)),
       |t AS (
       |  SELECT source, lang AS top_lang FROM (
       |    SELECT source, lang, row_number() OVER (PARTITION BY source
       |      ORDER BY count(*) DESC, lang) AS rn
       |    FROM s GROUP BY source, lang) WHERE rn = 1)
       |SELECT source, n_docs, n_tokens, max_tokens, n_langs, med_tokens,
       |  top_lang
       |FROM a JOIN m USING (source) JOIN t USING (source)""".stripMargin

  /** Sequence packing (concat-and-chunk): documents of one source are
    * concatenated in id order and cut into `budget`-token context
    * windows; a doc's bin is the window its FIRST token lands in —
    * exactly the LM-pretraining packing layout. Per (source, bin):
    * docs, tokens, and the bin's fill start offset. One window cumsum
    * per source — the key is the source (bounded parallelism is fine:
    * the cumsum is per-source sequential BY SPEC, the order defines
    * the packing; shard sources for more width at scale).
    */
  def packBins(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col("source")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(sourceCol).as("source"), col(idCol).as("id"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("bin", floor((col("cum") - col("n_tok")) / budget))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).cast("long").as("n_tokens"))
  }

  def packBinsSql(id: String, text: String, source: String, table: String,
      budget: Long): String =
    s"""SELECT source, bin, count(*)::BIGINT AS n_docs,
       |  sum(n_tok)::BIGINT AS n_tokens
       |FROM (
       |  SELECT source, ((cum - n_tok) // $budget)::BIGINT AS bin, n_tok
       |  FROM (
       |    SELECT $source AS source, $id AS id,
       |      ${TextAnalysis.tokenCountSql(text)} AS n_tok,
       |      sum(${TextAnalysis.tokenCountSql(text)}) OVER (
       |        PARTITION BY $source ORDER BY $id
       |        ROWS UNBOUNDED PRECEDING) AS cum
       |    FROM $table))
       |GROUP BY 1, 2""".stripMargin

  /** Split-leakage report: near-duplicate pairs that straddle dataset
    * splits — the reason dedup must run BEFORE (or be checked against)
    * splitting: a test doc whose near-twin sits in train is a leaked
    * eval item no matter how clean the split hash is. Reuses the exact
    * posting-join dedup (X4) and the hash split, aggregated per
    * (split, split) with the worst (max) similarity. Empty result =
    * clean split at the threshold.
    */
  /** Quality-threshold calibration: for a TARGET keep rate, the
    * per-source quality cutoff and kept count — rank-based (the
    * cutoff is the quality of the k-th best doc, k = max(1,
    * ⌊n·keepPct/100⌋), ties by doc id), so the math is pure integers
    * and the oracle compare is exact (interpolated quantiles differ
    * in IEEE details across engines; ranks don't). At 100 TB the
    * per-source rank is the one wide stage — a sort-based window on
    * (source); the approximate twin at extreme scale is
    * percentile_approx (a q_cdc_approx_stats-style rows-only check),
    * this operator is the exact calibration pass run per curation
    * batch. Output: (source, n_docs, n_keep, cutoff_micros).
    */
  def qualityCalibrate(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, keepPct: Int): DataFrame = {
    require(keepPct >= 1 && keepPct <= 100)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("q").desc, col("id").asc)
    docs.select(col(sourceCol).as("source"), col(idCol).as("id"),
        TextAnalysis.qualityMicros(col(textCol)).as("q"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_docs", count(lit(1)).over(Window.partitionBy(col("source"))))
      .withColumn("n_keep", greatest(lit(1L), floor(col("n_docs") * keepPct / 100)))
      .filter(col("rn") === col("n_keep"))
      .select(col("source"), col("n_docs").cast("long").as("n_docs"),
        col("n_keep").cast("long").as("n_keep"),
        col("q").as("cutoff_micros"))
  }

  def qualityCalibrateSql(id: String, text: String, source: String,
      table: String, keepPct: Int): String =
    s"""WITH s AS (
       |  SELECT $source AS source, $id AS id,
       |    ${TextAnalysis.qualityMicrosSql(text)} AS q
       |  FROM $table),
       |r AS (
       |  SELECT source, q,
       |    row_number() OVER (PARTITION BY source ORDER BY q DESC, id) AS rn,
       |    count(*) OVER (PARTITION BY source) AS n_docs
       |  FROM s)
       |SELECT source, n_docs::BIGINT AS n_docs,
       |  greatest(1, n_docs * $keepPct // 100)::BIGINT AS n_keep,
       |  q AS cutoff_micros
       |FROM r WHERE rn = greatest(1, n_docs * $keepPct // 100)""".stripMargin

  /** Cross-source near-duplication matrix: near-dup pairs (X4 posting
    * join) aggregated per unordered source pair — the "who copies
    * whom" audit that decides which source to DROP when two crawls
    * overlap (dedup within one source is cheap; systematic cross-
    * source duplication means paying twice for the same content).
    * Same shape as [[splitLeakage]] with the split column swapped for
    * the source — the diagonal (same-source pairs) is kept: it is the
    * within-source dup rate, the baseline the off-diagonal compares
    * against. Output: (source_a, source_b, n_pairs, worst_jacc_micros).
    */
  def sourceOverlap(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, k: Int, threshold: Double): DataFrame = {
    // prefix-filtered pair generation (X14), NOT the plain posting
    // join: output is property-proven identical at the threshold, but
    // posted volume is bounded by the pigeonhole prefix — the sf1.0
    // scale point measured the plain join at ~60x for 10x docs
    // (fixed-vocab synthetic corpora make df grow linearly with the
    // corpus, so unbounded posting joins go quadratic), and the
    // prefix path cut the same audit to posted-volume growth
    val pairs = Dedup.ngramJaccardPairsPrefix(docs, idCol, textCol, k, threshold)
    val src = docs.select(col(idCol).as("id"), col(sourceCol).as("source"))
    pairs
      .join(src.select(col("id").as("id1"), col("source").as("s1")), "id1")
      .join(src.select(col("id").as("id2"), col("source").as("s2")), "id2")
      .groupBy(least(col("s1"), col("s2")).as("source_a"),
        greatest(col("s1"), col("s2")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        max(col("jacc_micros")).as("worst_jacc_micros"))
  }

  def sourceOverlapSql(id: String, text: String, source: String,
      table: String, k: Int, threshold: Double): String =
    s"""WITH pairs AS (${Dedup.ngramJaccardPairsSql(id, text, table, k, threshold)}),
       |s AS (SELECT $id AS id, $source AS source FROM $table)
       |SELECT least(s1.source, s2.source) AS source_a,
       |  greatest(s1.source, s2.source) AS source_b,
       |  count(*)::BIGINT AS n_pairs,
       |  max(p.jacc_micros)::BIGINT AS worst_jacc_micros
       |FROM pairs p JOIN s s1 ON p.id1 = s1.id JOIN s s2 ON p.id2 = s2.id
       |GROUP BY 1, 2""".stripMargin

  def splitLeakage(docs: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double, trainPct: Int, valPct: Int): DataFrame = {
    // prefix-filtered for the same reason as [[sourceOverlap]]
    val pairs = Dedup.ngramJaccardPairsPrefix(docs, idCol, textCol, k, threshold)
    val splits = docs.select(col(idCol).as("id"),
      splitOf(col(idCol), trainPct, valPct).as("split"))
    pairs
      .join(splits.select(col("id").as("id1"), col("split").as("sp1")), "id1")
      .join(splits.select(col("id").as("id2"), col("split").as("sp2")), "id2")
      .filter(col("sp1") =!= col("sp2"))
      .groupBy(least(col("sp1"), col("sp2")).as("split_a"),
        greatest(col("sp1"), col("sp2")).as("split_b"))
      .agg(count(lit(1)).as("n_pairs"),
        max(col("jacc_micros")).as("worst_jacc_micros"))
  }

  def splitLeakageSql(id: String, text: String, table: String,
      k: Int, threshold: Double, trainPct: Int, valPct: Int): String =
    s"""WITH pairs AS (${Dedup.ngramJaccardPairsSql(id, text, table, k, threshold)}),
       |s AS (SELECT $id AS id, ${splitOfSql(id, trainPct, valPct)} AS split
       |      FROM $table)
       |SELECT least(s1.split, s2.split) AS split_a,
       |  greatest(s1.split, s2.split) AS split_b,
       |  count(*)::BIGINT AS n_pairs,
       |  max(p.jacc_micros)::BIGINT AS worst_jacc_micros
       |FROM pairs p JOIN s s1 ON p.id1 = s1.id JOIN s s2 ON p.id2 = s2.id
       |WHERE s1.split <> s2.split
       |GROUP BY 1, 2""".stripMargin

  /** X116 SEMANTIC split leakage: [[splitLeakage]]'s n-gram pairs
    * catch near-verbatim copies straddling the split; this twin runs
    * the same audit over the embedding-cosine pair graph
    * ([[Dedup.cosinePairs]], blocked by the label column), so a
    * paraphrased or re-templated duplicate — lexically disjoint,
    * semantically identical — still counts as leakage. This is the
    * decontamination check model-eval pipelines actually need: a
    * benchmark item rephrased into the training set defeats every
    * lexical gate but not the embedding.
    *
    * == 100 TB shape ==
    *
    * Pair cost is the blocked cosine join's (within-block pairs,
    * never all-pairs — swap in the trained-kmeans blocks of X70 for
    * unlabeled corpora); the split columns are narrow hash maps
    * joined by id; output is ≤ 3 rows.
    */
  def semanticLeakage(embs: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double, trainPct: Int,
      valPct: Int): DataFrame = {
    val pairs = Dedup.cosinePairs(embs, idCol, vecCol, blockCol, threshold)
    val splits = embs.select(col(idCol).as("id"),
      splitOf(col(idCol), trainPct, valPct).as("split"))
    pairs
      .join(splits.select(col("id").as("id1"), col("split").as("sp1")), "id1")
      .join(splits.select(col("id").as("id2"), col("split").as("sp2")), "id2")
      .filter(col("sp1") =!= col("sp2"))
      .groupBy(least(col("sp1"), col("sp2")).as("split_a"),
        greatest(col("sp1"), col("sp2")).as("split_b"))
      .agg(count(lit(1)).as("n_pairs"),
        max(col("cos_micros")).as("worst_cos_micros"))
  }

  def semanticLeakageSql(id: String, vec: String, block: String,
      table: String, threshold: Double, trainPct: Int, valPct: Int): String =
    s"""WITH pairs AS (${Dedup.cosinePairsSql(id, vec, block, table, threshold)}),
       |s AS (SELECT $id AS id, ${splitOfSql(id, trainPct, valPct)} AS split
       |      FROM $table)
       |SELECT least(s1.split, s2.split) AS split_a,
       |  greatest(s1.split, s2.split) AS split_b,
       |  count(*)::BIGINT AS n_pairs,
       |  max(p.cos_micros)::BIGINT AS worst_cos_micros
       |FROM pairs p JOIN s s1 ON p.id1 = s1.id JOIN s s2 ON p.id2 = s2.id
       |WHERE s1.split <> s2.split
       |GROUP BY 1, 2""".stripMargin

  /** Benchmark contamination: for each eval doc, the best n-gram
    * containment against the (disjoint) training corpus —
    * |shingles(eval) ∩ shingles(train)| / |shingles(eval)| — plus the
    * offending doc. Containment (not Jaccard): a benchmark item pasted
    * into a much larger page is full contamination even though Jaccard
    * is tiny. Posting join on hashed-shingle longs, exactly the dedup
    * machinery pointed across corpora; cost ∝ shared content, never
    * |eval| × |train|.
    */
  def contamination(docs: DataFrame, idCol: String, textCol: String,
      evalPred: Column, k: Int): DataFrame = {
    val (ev, tr) = contaminationPosts(docs, idCol, textCol, evalPred, k)
    contaminationScore(ev, tr)
  }

  /** X117 Bloom-pre-filtered contamination: output-IDENTICAL to
    * [[contamination]] (it shares the oracle), but the training-side
    * shingle stream is pruned by a broadcast [[Bloom]] of the eval
    * shingles BEFORE the posting join — a hand-built runtime filter.
    * False positives survive the prune and die in the exact join;
    * false negatives cannot exist (build and probe share the position
    * expression), so the prune is pure savings: the join's shuffle
    * carries only train shingles that MIGHT be contaminated
    * (∝ shared content + fp·|train shingles|) instead of every train
    * shingle. At benchmark-suite scale the Bloom is 1-2 orders
    * smaller than the exact eval-shingle set a broadcast semi-join
    * would ship.
    */
  def contaminationBloom(docs: DataFrame, idCol: String, textCol: String,
      evalPred: Column, k: Int, mBits: Int = 1 << 16,
      probes: Int = 4): DataFrame = {
    val (ev, tr) = contaminationPosts(docs, idCol, textCol, evalPred, k)
    val evC = Caching.cachedOnce(ev)
    val words = Bloom.build(evC.select(col("h")).distinct(), "h",
      mBits, probes)
    val trPruned = tr
      .crossJoin(Bloom.frame(tr, words))
      .filter(Bloom.mightContain(col("bloom_bm"), col("h"), mBits, probes))
      .drop("bloom_bm")
    contaminationScore(evC, trPruned)
  }

  private def contaminationPosts(docs: DataFrame, idCol: String,
      textCol: String, evalPred: Column, k: Int): (DataFrame, DataFrame) = {
    val base = docs.select(col(idCol).as("id"),
      Dedup.hashedShingles(col(textCol), k).as("hs"), evalPred.as("is_eval"))
    val posts = base.select(col("id"), col("is_eval"), size(col("hs")).as("n"),
      explode(col("hs")).as("h"))
    (posts.filter(col("is_eval")), posts.filter(!col("is_eval")))
  }

  private def contaminationScore(ev: DataFrame, tr: DataFrame): DataFrame = {
    val overlap = ev.as("e")
      .join(tr.as("t"), col("e.h") === col("t.h"))
      .groupBy(col("e.id").as("bench_id"), col("t.id").as("doc_id"),
        col("e.n").as("n_bench"))
      .agg(count(lit(1)).as("common"))
      .select(col("bench_id"), col("doc_id"),
        round(col("common").cast("double") / col("n_bench") * 1e6)
          .cast("long").as("containment_micros"))
    // best offender per benchmark doc (ties: lower doc id)
    val w = Window.partitionBy(col("bench_id"))
      .orderBy(col("containment_micros").desc, col("doc_id").asc)
    overlap.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("bench_id"), col("doc_id"), col("containment_micros"))
  }

  /** Overlapping token-window chunking — the RAG-ingestion /
    * context-window shape: windows of `chunkLen` tokens every
    * `stride` tokens (stride < chunkLen ⇒ overlap), each chunk
    * carrying its position, token count, reconstructed text and
    * content fingerprint (chunk-level dedup key). Tail fragments
    * shorter than `minTokens` drop UNLESS they are the doc's first
    * chunk — every doc yields at least one chunk.
    *
    * A narrow map (explode of ≤ len/stride window starts per doc, in-
    * row slicing) — no shuffle at all; at 100 TB this runs at scan
    * speed and the output lands partitioned exactly like its input.
    */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
      chunkLen: Int, stride: Int, minTokens: Int): DataFrame = {
    val ts = TextAnalysis.tokens(col(textCol))
    docs
      .select(col(idCol).as("doc_id"), ts.as("ts"))
      .select(col("doc_id"), col("ts"),
        explode(sequence(lit(1), greatest(size(col("ts")), lit(1)),
          lit(stride))).as("start"))
      .select(col("doc_id"),
        floor((col("start") - 1) / stride).cast("long").as("chunk_idx"),
        col("start").cast("long").as("start_tok"),
        slice(col("ts"), col("start"), lit(chunkLen)).as("ch"))
      .filter(size(col("ch")) >= minTokens || col("start_tok") === 1)
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("ch")).cast("long").as("n_tokens"),
        concat_ws(" ", col("ch")).as("text"),
        TextAnalysis.md5Fingerprint(concat_ws(" ", col("ch"))).as("fp"))
  }

  def chunkWindowsSql(id: String, text: String, table: String,
      chunkLen: Int, stride: Int, minTokens: Int): String =
    s"""WITH d AS (SELECT $id AS id, ${TextAnalysis.tokensSql(text)} AS ts
       |  FROM $table),
       |w AS (
       |  SELECT id, ts,
       |    unnest(generate_series(1, greatest(len(ts), 1), $stride)) AS start
       |  FROM d),
       |c AS (
       |  SELECT id, start, ts[start : least(start + ${chunkLen - 1}, len(ts))] AS ch
       |  FROM w)
       |SELECT id AS doc_id, ((start - 1) // $stride)::BIGINT AS chunk_idx,
       |  start::BIGINT AS start_tok, len(ch)::BIGINT AS n_tokens,
       |  array_to_string(ch, ' ') AS text,
       |  ${TextAnalysis.md5FingerprintSql("array_to_string(ch, ' ')")} AS fp
       |FROM c WHERE len(ch) >= $minTokens OR start = 1""".stripMargin

  /** DSIR-style importance weights (Xie et al., "Data Selection for
    * Language Models via Importance Resampling"): score every doc by
    * how much its hashed n-gram feature distribution looks like a
    * TARGET subcorpus rather than the raw corpus. Features are
    * unigram + bigram hashes bucketed into `nBuckets`; bucket
    * log-ratios use Laplace smoothing:
    * lr(b) = ln( ((tgt_b+1)/(T+nB)) / ((raw_b+1)/(R+nB)) ), and a
    * doc's weight is the sum over its feature INSTANCES (counts, not
    * distinct presence — the multinomial model) of round(lr·1e6) —
    * integer micros summed as longs, so the cross-row sum is exact.
    *
    * == 100 TB shape ==
    *
    * One narrow gram pass; the bucket table is ≤ nBuckets rows (two
    * partial-agg shuffles over bucket COUNTS) cross-joined with the
    * 1-row totals and broadcast back; the per-doc weight is one
    * partial-agg shuffle keyed on the doc id. Nothing scales with
    * vocabulary — the hashing trick caps the model at nBuckets
    * doubles, which is the entire point of DSIR at corpus scale.
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, nBuckets: Int): DataFrame = {
    val feats = docs
      .select(col(idCol).as("id"), targetPred.as("is_tgt"),
        TextAnalysis.tokens(col(textCol)).as("ts"))
      .select(col("id"), col("is_tgt"),
        explode(unigramsAndBigrams(col("ts"))).as("g"))
      .select(col("id"), col("is_tgt"),
        pmod(Hashing.hash60(col("g")), lit(nBuckets.toLong)).as("b"))
    val cached = Caching.cachedOnce(feats)
    val buckets = cached.groupBy(col("b")).agg(
      count(lit(1)).as("raw_n"),
      sum(when(col("is_tgt"), 1L).otherwise(0L)).as("tgt_n"))
    val totals = cached.agg(
      count(lit(1)).as("r_total"),
      sum(when(col("is_tgt"), 1L).otherwise(0L)).as("t_total"))
    val lr = buckets.join(broadcast(totals))
      .select(col("b"),
        round(log(((col("tgt_n") + 1).cast("double") /
            (col("t_total") + nBuckets).cast("double")) /
          ((col("raw_n") + 1).cast("double") /
            (col("r_total") + nBuckets).cast("double"))) * 1e6)
          .cast("long").as("lr_micros"))
    cached.join(broadcast(lr), "b")
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_feats"), sum(col("lr_micros")).as("logw_micros"))
  }

  /** The offline half of the streaming DSIR gate: the nBuckets bucket
    * log-ratios of [[dsirWeights]] collected into an array (bucket b →
    * lr_micros, missing buckets = smoothed-prior ratio). One action
    * over STATIC corpora at stage construction; the array is nBuckets
    * longs — the whole "model", by the hashing-trick design.
    */
  def freezeDsir(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, nBuckets: Int): IndexedSeq[Long] = {
    val feats = docs
      .select(col(idCol).as("id"), targetPred.as("is_tgt"),
        TextAnalysis.tokens(col(textCol)).as("ts"))
      .select(col("is_tgt"),
        explode(unigramsAndBigrams(col("ts"))).as("g"))
      .select(col("is_tgt"),
        pmod(Hashing.hash60(col("g")), lit(nBuckets.toLong)).as("b"))
    val rows = feats.groupBy(col("b")).agg(
      count(lit(1)).as("raw_n"),
      sum(when(col("is_tgt"), 1L).otherwise(0L)).as("tgt_n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rTotal = rows.values.map(_._1).sum + nBuckets
    val tTotal = rows.values.map(_._2).sum + nBuckets
    (0 until nBuckets).map { b =>
      val (rawN, tgtN) = rows.getOrElse(b.toLong, (0L, 0L))
      math.round(math.log(((tgtN + 1).toDouble / tTotal) /
        ((rawN + 1).toDouble / rTotal)) * 1e6)
    }
  }

  /** Score docs against a frozen DSIR model — a pure narrow map (the
    * bucket array is a literal; per-doc grams hash and look up
    * in-row, no shuffle, no state). On the SAME corpus the stats were
    * frozen from, output is identical to [[dsirWeights]] (spec-pinned)
    * — the build/serve split, exactly like the keyword gate's frozen
    * BM25 stats. Output: (…docs columns…, n_feats, logw_micros).
    */
  def scoreDsirFrozen(docs: DataFrame, textCol: String,
      lrMicros: IndexedSeq[Long]): DataFrame = {
    val nB = lrMicros.size
    val grams = unigramsAndBigrams(TextAnalysis.tokens(col(textCol)))
    val lrArr = typedLit(lrMicros)
    val contribs = transform(grams, g =>
      element_at(lrArr, pmod(Hashing.hash60(g), lit(nB.toLong)).cast("int") + 1))
    docs
      .withColumn("n_feats", size(grams).cast("long"))
      .withColumn("logw_micros",
        aggregate(contribs, lit(0L), (acc, x) => acc + x))
  }

  /** 2^60 + 1: maps the 60-bit hash onto u ∈ (0, 1) exclusive at both
    * ends ((h+1)/(2^60+1) with h ∈ [0, 2^60)), so ln(u) and ln(−ln u)
    * are always finite. The long→double conversion rounds identically
    * on both engines (IEEE round-to-nearest).
    */
  private val GumbelDenom = 1152921504606846977L

  /** Deterministic importance RESAMPLING via the Gumbel-top-n trick
    * (Efraimidis-Spirakis weighted sampling without replacement, in
    * Gumbel form): draw n docs with inclusion probability
    * proportional to their importance weight by taking the top n of
    * key = log w + Gumbel(u_id), where the Gumbel noise
    * −ln(−ln u) is seeded from a salted hash of the doc id instead of
    * a random draw. This is the SAMPLING half of DSIR (X72/X74 weight
    * and gate; this draws the mixture) — and because the per-doc key
    * is a pure function of (salt, id, weight), the sample is
    * reproducible, auditable, and each doc's key is independent of
    * the rest of the corpus.
    *
    * `weights` is any (id, logw_micros) relation — [[dsirWeights]]
    * output composes directly. Keys stay integer micros: the Gumbel
    * term quantizes through the same round(x·1e6) contract as every
    * float here.
    *
    * == 100 TB shape ==
    *
    * One narrow map (hash, two ln, one add) + a global top-n via
    * ORDER BY + LIMIT — Spark plans `TakeOrderedAndProject` (per
    * partition top-n, then a single n-row merge on the driver — no
    * global sort materializes), the X21/O1 shape. n is a sample
    * size, not corpus-scale.
    */
  def importanceResample(weights: DataFrame, idCol: String,
      logwCol: String, n: Int, salt: String): DataFrame = {
    val u = (Hashing.hash60(concat(lit(salt + "_"),
      col(idCol).cast("string"))) + 1).cast("double") /
      lit(GumbelDenom).cast("double")
    weights
      .withColumn("gumbel_micros", round(-log(-log(u)) * 1e6).cast("long"))
      .withColumn("key_micros", col(logwCol) + col("gumbel_micros"))
      .orderBy(col("key_micros").desc, col(idCol))
      .limit(n)
  }

  /** DuckDB twin of [[importanceResample]] over the [[dsirWeightsSql]]
    * weight relation.
    */
  def importanceResampleSql(weightsSql: String, id: String, logw: String,
      n: Int, salt: String): String = {
    val u = s"((${Hashing.hash60Sql(s"'${salt}_' || $id::VARCHAR")} + 1)::DOUBLE" +
      s" / $GumbelDenom::DOUBLE)"
    s"""WITH w AS ($weightsSql),
       |keyed AS (
       |  SELECT *, round(-ln(-ln($u)) * 1e6)::BIGINT AS gumbel_micros
       |  FROM w)
       |SELECT *, ($logw + gumbel_micros)::BIGINT AS key_micros FROM keyed
       |ORDER BY key_micros DESC, $id LIMIT $n""".stripMargin
  }

  def dsirWeightsSql(id: String, text: String, table: String,
      targetPredSql: String, nBuckets: Int): String =
    s"""WITH d AS (
       |  SELECT $id AS id, ($targetPredSql) AS is_tgt,
       |    ${TextAnalysis.tokensSql(text)} AS ts FROM $table),
       |feats AS (
       |  SELECT id, is_tgt,
       |    ${Hashing.hash60Sql("g")} % $nBuckets AS b
       |  FROM (SELECT id, is_tgt, unnest(list_concat(ts,
       |    list_transform(generate_series(1, greatest(len(ts) - 1, 0)),
       |      i -> ts[i] || ' ' || ts[i + 1]))) AS g FROM d)),
       |buckets AS (
       |  SELECT b, count(*) AS raw_n,
       |    sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS tgt_n
       |  FROM feats GROUP BY 1),
       |totals AS (
       |  SELECT count(*) AS r_total,
       |    sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS t_total FROM feats),
       |lr AS (
       |  SELECT b,
       |    round(ln(((tgt_n + 1)::DOUBLE / (t_total + $nBuckets)::DOUBLE)
       |      / ((raw_n + 1)::DOUBLE / (r_total + $nBuckets)::DOUBLE))
       |      * 1e6)::BIGINT AS lr_micros
       |  FROM buckets CROSS JOIN totals)
       |SELECT f.id AS doc_id, count(*)::BIGINT AS n_feats,
       |  sum(lr.lr_micros)::BIGINT AS logw_micros
       |FROM feats f JOIN lr ON f.b = lr.b
       |GROUP BY 1""".stripMargin

  /** Global repeated-segment (boilerplate) removal — the RefinedWeb /
    * CCNet "remove lines duplicated across documents" pass (Penedo et
    * al. 2023 §3; license blocks, navigation chrome, cookie banners).
    * A document is cut into consecutive `segLen`-token segments (the
    * stand-in for newline-split lines — the test corpus has no
    * newlines; a production run swaps the segmenter, the dataflow is
    * identical); a segment whose corpus-wide document frequency
    * exceeds `maxDf` is boilerplate and is dropped from EVERY doc;
    * the survivors are stitched back in order.
    *
    * Scale shape: the boilerplate set is intrinsically small (at most
    * total_segments / maxDf distinct values), so the removal is a
    * broadcast LEFT ANTI join against the heavy-hitter set — the
    * corpus-side pass stays narrow except one partial-aggregated
    * df count (on 8-byte hashes, never segment text) and the per-doc
    * re-stitch. At 100 TB the df agg is the only wide stage and
    * shuffles ~|distinct segments| hash/count pairs.
    *
    * Output: (doc_id, n_segments, n_removed, clean_text, clean_fp) —
    * all integer/hash/string values, oracle-exact.
    */
  def boilerplateRemove(docs: DataFrame, idCol: String, textCol: String,
      segLen: Int, maxDf: Int): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("ts"))
    val segs = base.select(col("id"),
      posexplode(transform(
        sequence(lit(1), greatest(size(col("ts")), lit(1)), lit(segLen)),
        st => array_join(slice(col("ts"), st, lit(segLen)), " "))).as(Seq("pos", "seg")))
    val segH = segs.withColumn("h", Hashing.hash60(col("seg")))
    // heavy hitters: segments present in > maxDf distinct docs
    val boiler = segH.groupBy(col("h"))
      .agg(countDistinct(col("id")).as("df"))
      .filter(col("df") > maxDf)
      .select(col("h"))
    val kept = segH.join(broadcast(boiler), Seq("h"), "left_anti")
    val perDoc = kept.groupBy(col("id")).agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("seg")))),
        s => s.getField("seg")), " ").as("clean_text"))
    base
      .select(col("id").as("doc_id"),
        size(sequence(lit(1), greatest(size(col("ts")), lit(1)), lit(segLen)))
          .cast("long").as("n_segments"))
      .join(perDoc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_segments"),
        (col("n_segments") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        TextAnalysis.md5Fingerprint(coalesce(col("clean_text"), lit("")))
          .as("clean_fp"))
  }

  def boilerplateRemoveSql(id: String, text: String, table: String,
      segLen: Int, maxDf: Int): String =
    s"""WITH d AS (SELECT $id AS id, ${TextAnalysis.tokensSql(text)} AS ts
       |  FROM $table),
       |w AS (SELECT id, ts,
       |    unnest(generate_series(1, greatest(len(ts), 1), $segLen)) AS start
       |  FROM d),
       |s AS (SELECT id, ((start - 1) // $segLen)::BIGINT AS pos,
       |    array_to_string(ts[start : least(start + ${segLen - 1}, len(ts))], ' ')
       |      AS seg
       |  FROM w),
       |b AS (SELECT ${Hashing.hash60Sql("seg")} AS h FROM s
       |  GROUP BY 1 HAVING count(DISTINCT id) > $maxDf),
       |k AS (SELECT * FROM s
       |  WHERE ${Hashing.hash60Sql("seg")} NOT IN (SELECT h FROM b)),
       |agg AS (SELECT id, count(*)::BIGINT AS n_kept,
       |    string_agg(seg, ' ' ORDER BY pos) AS clean_text
       |  FROM k GROUP BY 1)
       |SELECT d.id AS doc_id,
       |  len(generate_series(1, greatest(len(d.ts), 1), $segLen))::BIGINT
       |    AS n_segments,
       |  (len(generate_series(1, greatest(len(d.ts), 1), $segLen))::BIGINT
       |    - coalesce(a.n_kept, 0)) AS n_removed,
       |  coalesce(a.clean_text, '') AS clean_text,
       |  ${TextAnalysis.md5FingerprintSql("coalesce(a.clean_text, '')")}
       |    AS clean_fp
       |FROM d LEFT JOIN agg a ON d.id = a.id""".stripMargin

  /** Temperature-scaled source mixture — the multilingual/multi-domain
    * sampling rule p_i ∝ n_i^α (Arivazhagan et al. 2019 §4; α < 1
    * flattens the head so low-resource sources are not drowned).
    * Per-source token counts feed ONE quantization (w = round(n^α ·
    * 1e6), the same expression shape both engines), then the shares
    * are exact integer arithmetic: share_ppm = w·10⁶ div Σw — no
    * cross-engine float division.
    *
    * One partial-aggregated shuffle to source granularity (bounded,
    * tiny), then a broadcast of the 1-row total. Output: (source,
    * n_tokens, w_micros, share_ppm).
    */
  def temperatureMix(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, alpha: Double): DataFrame = {
    val per = docs
      .select(col(sourceCol).as("source"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tok"))
      .groupBy(col("source"))
      .agg(sum(col("n_tok")).as("n_tokens"))
      .withColumn("w_micros",
        round(pow(col("n_tokens").cast("double"), lit(alpha)) * 1e6)
          .cast("long"))
    val tot = per.agg(sum(col("w_micros")).as("tot_w"))
    per.join(broadcast(tot))
      .select(col("source"), col("n_tokens"), col("w_micros"),
        expr("w_micros * 1000000L div tot_w").as("share_ppm"))
  }

  def temperatureMixSql(id: String, text: String, source: String,
      table: String, alpha: Double): String =
    s"""WITH per AS (
       |  SELECT $source AS source,
       |    sum(${TextAnalysis.tokenCountSql(text)})::BIGINT AS n_tokens
       |  FROM $table GROUP BY 1),
       |w AS (SELECT source, n_tokens,
       |    round(pow(n_tokens::DOUBLE, $alpha) * 1e6)::BIGINT AS w_micros
       |  FROM per),
       |tot AS (SELECT sum(w_micros) AS tot_w FROM w)
       |SELECT source, n_tokens, w_micros,
       |  ((w_micros * 1000000) // tot_w)::BIGINT AS share_ppm
       |FROM w CROSS JOIN tot""".stripMargin

  /** X95 per-source document cap ("domain capping" — the RefinedWeb /
    * C4-style rule that no single domain may dominate the corpus):
    * keep the `cap` highest-quality docs per source, quality =
    * [[TextAnalysis.qualityMicros]], ties broken by lower id. Output
    * one row per KEPT doc: (doc_id, source, quality_micros, rnk,
    * n_dropped) where n_dropped is the per-source overflow the cap
    * discarded (same value on every kept row of a source — the audit
    * column a capping run reports).
    *
    * Scale shape: the `row_number <= cap` filter over the per-source
    * window is exactly the pattern Catalyst rewrites into
    * WindowGroupLimit with a PARTIAL pass before the exchange
    * (PlanSpec asserts it) — each input partition forwards at most
    * `cap` rows per source into the shuffle, so a hot domain (the
    * whole point of capping) cannot flood the exchange: shuffle
    * volume is ≤ cap · |sources| · |partitions| regardless of corpus
    * size. The per-source sizes aggregate is |sources| rows and
    * broadcasts back onto the capped survivors.
    */
  def sourceCap(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, cap: Int): DataFrame = {
    // NULL text would rank with a NULL quality — Spark and DuckDB
    // disagree on default NULL ordering (Spark ASC = NULLS FIRST,
    // DuckDB = NULLS LAST), so NULL-text docs are out of scope by
    // contract (both engines filter them)
    val q = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
        TextAnalysis.qualityMicros(col(textCol)).as("quality_micros"))
    val sizes = q.groupBy(col("source"))
      .agg(count(lit(1)).as("n_source"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality_micros").desc, col("doc_id").asc)
    q.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= cap)
      .join(broadcast(sizes), "source")
      .select(col("doc_id"), col("source"), col("quality_micros"),
        col("rnk"), greatest(col("n_source") - cap, lit(0)).cast("long")
          .as("n_dropped"))
  }

  def sourceCapSql(id: String, text: String, source: String,
      table: String, cap: Int): String =
    s"""WITH q AS (
       |  SELECT $id AS doc_id, $source AS source,
       |    ${TextAnalysis.qualityMicrosSql(text)} AS quality_micros
       |  FROM $table WHERE $text IS NOT NULL),
       |sizes AS (SELECT source, count(*) AS n FROM q GROUP BY 1),
       |r AS (
       |  SELECT doc_id, source, quality_micros, row_number() OVER (
       |    PARTITION BY source
       |    ORDER BY quality_micros DESC, doc_id) AS rnk
       |  FROM q)
       |SELECT r.doc_id, r.source, r.quality_micros, r.rnk::BIGINT AS rnk,
       |  greatest(s.n - $cap, 0)::BIGINT AS n_dropped
       |FROM r JOIN sizes s ON r.source = s.source
       |WHERE r.rnk <= $cap""".stripMargin

  /** X96 exact per-source length percentiles (nearest-rank, integer
    * arithmetic end-to-end): value_p = smallest length L such that at
    * least ceil(p·n/100) docs of the source have length ≤ L — the
    * corpus-shape summary a curation run reads before picking chunk
    * sizes, pack budgets and truncation points ([[datasetCard]]'s
    * mean hides exactly the tails this surfaces).
    *
    * Deliberately NOT a per-source corpus sort: the corpus-sized work
    * is ONE partial-aggregated groupBy to the (source, length)
    * HISTOGRAM; the running-count window then walks histogram rows —
    * |sources| × |distinct lengths| of them, independent of corpus
    * row count — so the giant-source skew a per-source row window
    * would hit (all rows of one source in one task) never exists.
    * The nearest-rank index is exact integer math both engines spell
    * identically: idx = (p·n + 99) div 100; value = min length whose
    * cumulative count reaches idx.
    */
  def lengthPercentiles(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, pcts: Seq[Int] = Seq(25, 50, 75, 95)): DataFrame = {
    // NULL text → NULL length: its histogram row would sort first in
    // Spark's running window but last in DuckDB's — NULL-text docs are
    // out of the percentile population by contract (both engines)
    val hist = docs.filter(col(textCol).isNotNull)
      .select(col(sourceCol).as("source"),
        length(col(textCol)).cast("long").as("len"))
      .groupBy(col("source"), col("len"))
      .agg(count(lit(1)).as("c"))
    val cum = hist.withColumn("hi",
      sum(col("c")).over(Window.partitionBy(col("source"))
        .orderBy(col("len").asc)))
    val sizes = hist.groupBy(col("source"))
      .agg(sum(col("c")).as("n_docs"))
    cum.join(broadcast(sizes), "source")
      .select(col("source"), col("len"), col("hi"), col("n_docs"),
        explode(array(pcts.map(p => lit(p)): _*)).as("pct"))
      .filter(col("hi") >= expr("(pct * n_docs + 99) div 100"))
      .groupBy(col("source"), col("pct"), col("n_docs"))
      .agg(min(col("len")).as("value"))
      .select(col("source"), col("pct").cast("long").as("pct"),
        col("value"), col("n_docs"))
  }

  def lengthPercentilesSql(id: String, text: String, source: String,
      table: String, pcts: Seq[Int] = Seq(25, 50, 75, 95)): String = {
    val pctList = pcts.mkString(", ")
    s"""WITH hist AS (
       |  SELECT $source AS source, length($text)::BIGINT AS len,
       |    count(*) AS c
       |  FROM $table WHERE $text IS NOT NULL GROUP BY 1, 2),
       |cum AS (
       |  SELECT source, len, sum(c) OVER (
       |    PARTITION BY source ORDER BY len) AS hi
       |  FROM hist),
       |sizes AS (SELECT source, sum(c) AS n_docs FROM hist GROUP BY 1)
       |SELECT c.source, p.pct::BIGINT AS pct, min(c.len) AS value,
       |  any_value(s.n_docs)::BIGINT AS n_docs
       |FROM cum c
       |JOIN sizes s ON c.source = s.source
       |CROSS JOIN (SELECT unnest([$pctList]) AS pct) p
       |WHERE c.hi >= (p.pct * s.n_docs + 99) // 100
       |GROUP BY 1, 2""".stripMargin
  }

  /** CCNet-style perplexity buckets (X109): per-source head/middle/
    * tail terciles of the [[TextAnalysis.lmScore]] per-token
    * cross-entropy (lower = more reference-like = `head`). CCNet's
    * observation stands at any scale: an absolute LM threshold is
    * meaningless across domains (legal text and chat logs live at
    * different perplexities), so the cut must be WITHIN-source and
    * rank-based. Buckets by exact integer thirds (`3·rank ≤ n` head,
    * `≤ 2n` middle — nearest-rank, no interpolated quantiles); docs
    * the LM cannot score (no bigrams) surface as `unscored` instead
    * of silently vanishing. Output: (doc_id, source, ce_micros,
    * bucket).
    *
    * == 100 TB shape ==
    *
    * The LM pass is X76's broadcast-model scoring (cost ∝ tokens);
    * the tercile windows key on the bounded source set and order
    * per-source docs — the one sort-wide stage, same shape as
    * [[qualityCalibrate]].
    */
  def ccnetBuckets(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, refPred: org.apache.spark.sql.Column,
      nBuckets: Int): DataFrame = {
    val lm = TextAnalysis.lmScore(docs, idCol, textCol, refPred, nBuckets)
      .selectExpr("doc_id",
        "CAST((-logp_micros) div n_bigrams AS BIGINT) AS ce_micros")
    val base = docs
      .select(col(idCol).as("doc_id"), col(sourceCol).as("source"))
      .join(lm, Seq("doc_id"), "left")
    val w = Window.partitionBy(col("source"))
      .orderBy(col("ce_micros").asc, col("doc_id").asc)
    val scored = base.filter(col("ce_micros").isNotNull)
      .withColumn("rnk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("source"))))
      .selectExpr("doc_id", "source", "ce_micros",
        """CASE WHEN rnk * 3 <= n THEN 'head'
          |     WHEN rnk * 3 <= 2 * n THEN 'middle'
          |     ELSE 'tail' END AS bucket""".stripMargin)
    val unscored = base.filter(col("ce_micros").isNull)
      .selectExpr("doc_id", "source", "CAST(NULL AS BIGINT) AS ce_micros",
        "'unscored' AS bucket")
    scored.unionByName(unscored)
  }

  def ccnetBucketsSql(id: String, text: String, source: String,
      table: String, refPredSql: String, nBuckets: Int): String =
    s"""WITH lm AS (${TextAnalysis.lmScoreSql(id, text, table, refPredSql, nBuckets)}),
       |ce AS (SELECT doc_id,
       |    ((-logp_micros) // n_bigrams)::BIGINT AS ce_micros FROM lm),
       |base AS (
       |  SELECT d.$id AS doc_id, d.$source AS source, ce.ce_micros
       |  FROM $table d LEFT JOIN ce ON ce.doc_id = d.$id),
       |scored AS (
       |  SELECT doc_id, source, ce_micros,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY ce_micros, doc_id) AS rnk,
       |    count(*) OVER (PARTITION BY source) AS n
       |  FROM base WHERE ce_micros IS NOT NULL)
       |SELECT doc_id, source, ce_micros,
       |  CASE WHEN rnk * 3 <= n THEN 'head'
       |       WHEN rnk * 3 <= 2 * n THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM scored
       |UNION ALL
       |SELECT doc_id, source, NULL::BIGINT AS ce_micros,
       |  'unscored' AS bucket
       |FROM base WHERE ce_micros IS NULL""".stripMargin

  /** Quality-filter operating curve (X112): for each keep-rate
    * decile, the exact quality threshold that achieves it plus the
    * precision/recall a proxy label assigns to that cut — the table
    * you read BEFORE picking a filter threshold, instead of
    * hand-tuning one and hoping. `pct` is the TARGET keep rate;
    * `t_micros` the lowest quality kept (= the smallest threshold
    * whose keep count reaches ⌈pct·n/100⌉ — nearest-rank, ties keep
    * everything at the boundary value so n_keep can exceed the
    * target); precision = labeled-positive share of the kept set,
    * recall = kept share of all positives (both integer ppm,
    * zero-positive corpora report 0 instead of dividing by zero).
    * NULL-text docs are excluded (the X97 contract — and Spark
    * DESC sorts NULL last where DuckDB sorts it first, so keeping
    * them would smuggle an ordering divergence).
    *
    * == 100 TB shape ==
    *
    * One narrow scoring pass + one partial-agg shuffle to the
    * (quality, count, pos_count) HISTOGRAM; the cumulative window
    * and the decile probe walk histogram rows only
    * ([[lengthPercentiles]]'s argument) — never the corpus.
    */
  def filterCurve(docs: DataFrame, idCol: String, textCol: String,
      labelPred: org.apache.spark.sql.Column,
      pcts: Seq[Int] = Seq(10, 20, 30, 40, 50, 60, 70, 80, 90)): DataFrame = {
    val hist = docs.filter(col(textCol).isNotNull)
      .select(TextAnalysis.qualityMicros(col(textCol)).as("q"),
        labelPred.cast("long").as("pos"))
      .groupBy(col("q"))
      .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("posc"))
    val w = Window.orderBy(col("q").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = Caching.cachedOnce(hist
      .withColumn("ckeep", sum(col("cnt")).over(w))
      .withColumn("cpos", sum(col("posc")).over(w)))
    val tot = cum.agg(sum(col("cnt")).as("n"), sum(col("posc")).as("npos"))
    val pctDf = docs.sparkSession.createDataFrame(pcts.map(Tuple1(_)))
      .toDF("pct")
    val th = pctDf.crossJoin(broadcast(tot))
      .selectExpr("pct", "n", "npos",
        "CAST((pct * n + 99) div 100 AS BIGINT) AS idx")
      .join(cum.select(col("q"), col("ckeep")), col("ckeep") >= col("idx"))
      .groupBy(col("pct"), col("npos"))
      .agg(max(col("q")).as("t_micros"))
    th.join(cum.select(col("q").as("t_micros"), col("ckeep"), col("cpos")),
        Seq("t_micros"))
      .selectExpr("CAST(pct AS BIGINT) AS pct", "t_micros",
        "CAST(ckeep AS BIGINT) AS n_keep",
        "CAST(cpos AS BIGINT) AS n_pos_keep",
        "CAST((cpos * 1000000) div ckeep AS BIGINT) AS precision_ppm",
        """CAST(CASE WHEN npos = 0 THEN 0
          |  ELSE (cpos * 1000000) div npos END AS BIGINT) AS recall_ppm"""
          .stripMargin)
  }

  def filterCurveSql(id: String, text: String, table: String,
      labelPredSql: String,
      pcts: Seq[Int] = Seq(10, 20, 30, 40, 50, 60, 70, 80, 90)): String =
    s"""WITH s AS (
       |  SELECT ${TextAnalysis.qualityMicrosSql(text)} AS q,
       |    CASE WHEN ($labelPredSql) THEN 1 ELSE 0 END AS pos
       |  FROM $table WHERE $text IS NOT NULL),
       |hist AS (SELECT q, count(*) AS cnt, sum(pos) AS posc
       |         FROM s GROUP BY 1),
       |cum AS (
       |  SELECT q,
       |    sum(cnt) OVER (ORDER BY q DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ckeep,
       |    sum(posc) OVER (ORDER BY q DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cpos
       |  FROM hist),
       |tot AS (SELECT sum(cnt) AS n, sum(posc) AS npos FROM hist),
       |pcts(pct) AS (VALUES ${pcts.map(p => s"($p)").mkString(", ")}),
       |th AS (
       |  SELECT p.pct, tot.npos, max(c.q) AS t_micros
       |  FROM pcts p CROSS JOIN tot
       |  JOIN cum c ON c.ckeep >= (p.pct * tot.n + 99) // 100
       |  GROUP BY 1, 2)
       |SELECT th.pct::BIGINT AS pct, th.t_micros,
       |  c.ckeep::BIGINT AS n_keep, c.cpos::BIGINT AS n_pos_keep,
       |  ((c.cpos * 1000000) // c.ckeep)::BIGINT AS precision_ppm,
       |  (CASE WHEN th.npos = 0 THEN 0
       |     ELSE (c.cpos * 1000000) // th.npos END)::BIGINT AS recall_ppm
       |FROM th JOIN cum c ON c.q = th.t_micros""".stripMargin

  /** Frozen CCNet cutpoints (X111): the per-source head/middle
    * boundary CE values of [[ccnetBuckets]], collected once from a
    * static reference corpus (2 longs per source — the production
    * CCNet shape: train the LM offline, compute the cutoffs offline,
    * bucket at ingest). `cut1` = max head CE, `cut2` = max
    * head∪middle CE; sources whose head/scored set is empty are
    * absent from the respective map.
    */
  final case class FrozenCcnet(cut1: Map[String, Long],
      cut2: Map[String, Long])

  def freezeCcnet(corpus: DataFrame, idCol: String, textCol: String,
      sourceCol: String, refPred: org.apache.spark.sql.Column,
      nBuckets: Int): FrozenCcnet = {
    val rows = ccnetBuckets(corpus, idCol, textCol, sourceCol, refPred,
        nBuckets)
      .filter(col("bucket").isin("head", "middle"))
      .groupBy(col("source"))
      .agg(max(when(col("bucket") === "head", col("ce_micros"))).as("c1"),
        max(col("ce_micros")).as("c2"))
      .collect()
    FrozenCcnet(
      rows.flatMap(r => Option(r.get(1))
        .map(v => r.getString(0) -> v.asInstanceOf[Long])).toMap,
      rows.flatMap(r => Option(r.get(2))
        .map(v => r.getString(0) -> v.asInstanceOf[Long])).toMap)
  }

  /** Token-budget allocation plan (X107): exact integer WATER-FILLING
    * of a training-token budget over sources at [[temperatureMix]]
    * weights, under a repetition cap of `maxEpochsPct`/100 epochs per
    * source — the planning step every pretraining run does between
    * "here are my domain weights" and "here is the sampler config".
    * Greedy proportional allocation over-draws small sources (their
    * fair share exceeds what maxEpochs allows); water-filling caps
    * them and redistributes the surplus across the rest at their
    * weights, in ONE closed-form pass instead of an iterative loop:
    *
    *  1. fill order = the EXACT cap/weight ratio, encoded as the
    *     two-part quotient key `(cap div w, ((cap mod w)·10¹²) div w)`
    *     (ties by source). The key is a total order identical to the
    *     rational order: two distinct fractions with denominators
    *     ≤ 10⁶ (weights are ppm) differ by ≥ 1/(w₁w₂) ≥ 10⁻¹², so
    *     their 10¹²-scaled floors differ — no quantization swap is
    *     possible, and no product exceeds (10⁶−1)·10¹² < 2⁶³
    *     regardless of source size (the naive `(cap·10⁹) div w`
    *     overflowed Long past caps of ~9.2·10⁹ tokens — well inside
    *     100 TB territory);
    *  2. a source CAPS iff spreading the budget remaining at its turn
    *     over the suffix at weights would give it ≥ its cap:
    *     R/wSuffix ≥ cap/w with R = B − capPrefix, compared EXACTLY
    *     via the same two-part keys (lexicographic ≥ on the pairs ==
    *     ≥ on the rationals, by the same 10⁻¹² gap argument; R < 0
    *     short-circuits to false before any division), with a
    *     cumulative-AND so the capped set is a prefix of the fill
    *     order;
    *  3. capped sources take their cap; the rest take
    *     `floor(R·w / wUncapped)` of the remaining budget R, computed
    *     overflow-free as `w·(R div wU) + (w·(R mod wU)) div wU`
    *     (exact: write R = a·wU + r, then floor(R·w/wU) =
    *     a·w + floor(r·w/wU), and r·w < 10¹²); truncation slack stays
    *     unallocated; a `least(cap, ·)` guards the tie edge.
    *
    * Residual overflow bound after these rewrites: only
    * `epochs_micros` still forms a product with a corpus-sized
    * operand — `(alloc mod avail)·10⁶` — requiring avail < 2⁶³/10⁶ ≈
    * 9.2·10¹² tokens PER SOURCE (~37 TB of text in one source), vs
    * the previous ~9.2·10⁹ whole-plan ceiling.
    *
    * Output per source: (source, avail_tokens, weight_ppm,
    * cap_tokens, alloc_tokens, epochs_micros, capped). Zero-weight /
    * zero-token sources are excluded (they draw nothing).
    *
    * == 100 TB shape ==
    *
    * Corpus-sized work is [[temperatureMix]]'s one partial-agg
    * shuffle; everything after runs on the \|sources\|-row digest
    * (the single-partition windows are over that digest, never the
    * corpus — the [[lengthPercentiles]] argument).
    */
  def tokenBudgetPlan(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, alpha: Double, budget: Long,
      maxEpochsPct: Int): DataFrame = {
    val base = temperatureMix(docs, idCol, textCol, sourceCol, alpha)
      .filter(col("n_tokens") > 0 && col("share_ppm") > 0)
      .selectExpr("source", "n_tokens AS avail", "share_ppm AS w",
        s"CAST((n_tokens * $maxEpochsPct) div 100 AS BIGINT) AS cap")
      .selectExpr("*",
        "CAST(cap div w AS BIGINT) AS q1",
        "CAST(((cap % w) * 1000000000000) div w AS BIGINT) AS q2")
    val tot = base.agg(sum(col("w")).as("tot_w"))
    val ord = Window.orderBy(col("q1"), col("q2"), col("source"))
    val prev = ord.rowsBetween(Window.unboundedPreceding, -1)
    val upTo = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val s1 = base.crossJoin(broadcast(tot))
      .withColumn("cap_pre", coalesce(sum(col("cap")).over(prev), lit(0L)))
      .withColumn("w_pre", coalesce(sum(col("w")).over(prev), lit(0L)))
      .withColumn("r", lit(budget) - col("cap_pre"))
      .withColumn("wsuf", col("tot_w") - col("w_pre"))
      .withColumn("rq1", expr("CAST(r div wsuf AS BIGINT)"))
      .withColumn("rq2",
        expr("CAST(((r % wsuf) * 1000000000000) div wsuf AS BIGINT)"))
      .withColumn("cond",
        (col("r") >= 0 && (col("rq1") > col("q1") ||
          (col("rq1") === col("q1") && col("rq2") >= col("q2"))))
          .cast("int"))
      .withColumn("capflag", min(col("cond")).over(upTo))
    val ct = s1.agg(
      coalesce(sum(when(col("capflag") === 1, col("cap"))), lit(0L))
        .as("capped_tok"),
      coalesce(sum(when(col("capflag") === 1, col("w"))), lit(0L))
        .as("capped_w"))
    s1.crossJoin(broadcast(ct))
      .selectExpr("source", "avail", "w", "cap", "capflag",
        s"""CAST(CASE WHEN capflag = 1 THEN cap
           |  ELSE least(cap,
           |    w * (($budget - capped_tok) div (tot_w - capped_w))
           |    + (w * (($budget - capped_tok) % (tot_w - capped_w)))
           |      div (tot_w - capped_w)) END AS BIGINT) AS alloc"""
          .stripMargin)
      .selectExpr("source", "CAST(avail AS BIGINT) AS avail_tokens",
        "CAST(w AS BIGINT) AS weight_ppm", "CAST(cap AS BIGINT) AS cap_tokens",
        "CAST(alloc AS BIGINT) AS alloc_tokens",
        """CAST((alloc div avail) * 1000000
          |  + ((alloc % avail) * 1000000) div avail
          |  AS BIGINT) AS epochs_micros""".stripMargin,
        "CAST(capflag AS BIGINT) AS capped")
  }

  def tokenBudgetPlanSql(id: String, text: String, source: String,
      table: String, alpha: Double, budget: Long,
      maxEpochsPct: Int): String =
    s"""WITH w0 AS (${temperatureMixSql(id, text, source, table, alpha)}),
       |base AS (
       |  SELECT source, n_tokens AS avail, share_ppm AS w,
       |    (n_tokens * $maxEpochsPct) // 100 AS cap
       |  FROM w0 WHERE n_tokens > 0 AND share_ppm > 0),
       |qq AS (SELECT *, cap // w AS q1,
       |  ((cap % w) * 1000000000000) // w AS q2 FROM base),
       |tot AS (SELECT sum(w) AS tot_w FROM qq),
       |s1 AS (
       |  SELECT qq.*, tot_w,
       |    coalesce(sum(cap) OVER (ORDER BY q1, q2, source
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cap_pre,
       |    coalesce(sum(w) OVER (ORDER BY q1, q2, source
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS w_pre
       |  FROM qq CROSS JOIN tot),
       |s2 AS (
       |  SELECT *, ($budget - cap_pre) AS r, (tot_w - w_pre) AS wsuf,
       |    ($budget - cap_pre) // (tot_w - w_pre) AS rq1,
       |    ((($budget - cap_pre) % (tot_w - w_pre)) * 1000000000000)
       |      // (tot_w - w_pre) AS rq2
       |  FROM s1),
       |s2b AS (
       |  SELECT *, CASE WHEN r >= 0 AND (rq1 > q1
       |      OR (rq1 = q1 AND rq2 >= q2)) THEN 1 ELSE 0 END AS cond
       |  FROM s2),
       |s3 AS (
       |  SELECT *, min(cond) OVER (ORDER BY q1, q2, source
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS capflag
       |  FROM s2b),
       |ct AS (
       |  SELECT coalesce(sum(CASE WHEN capflag = 1 THEN cap END), 0) AS capped_tok,
       |    coalesce(sum(CASE WHEN capflag = 1 THEN w END), 0) AS capped_w
       |  FROM s3),
       |a AS (
       |  SELECT s3.*, CASE WHEN capflag = 1 THEN cap
       |    ELSE least(cap,
       |      w * (($budget - capped_tok) // (tot_w - capped_w))
       |      + (w * (($budget - capped_tok) % (tot_w - capped_w)))
       |        // (tot_w - capped_w))
       |    END AS alloc
       |  FROM s3 CROSS JOIN ct)
       |SELECT source, avail::BIGINT AS avail_tokens, w::BIGINT AS weight_ppm,
       |  cap::BIGINT AS cap_tokens, alloc::BIGINT AS alloc_tokens,
       |  ((alloc // avail) * 1000000
       |    + ((alloc % avail) * 1000000) // avail)::BIGINT AS epochs_micros,
       |  capflag::BIGINT AS capped
       |FROM a""".stripMargin

  /** Cluster-aware split assignment (X106): [[splitOf]]'s hash rule
    * applied to each doc's near-dup cluster REPRESENTATIVE instead of
    * its own id (unclustered docs fall back to themselves), so a
    * whole near-dup cluster lands in one split and the cross-split
    * leakage [[splitLeakage]] measures is ZERO by construction — for
    * every pair the cluster graph contains. The X48 report finds the
    * leak; this is the fix: same reproducible hash bucketing, but the
    * unit of assignment is the content cluster, not the doc. `pairs`
    * is any near-dup pair operator (X2-X5, X14, X70); leakage through
    * pairs BELOW the chosen threshold is out of contract (tighten the
    * pair op, not the split). Cost beyond the pair graph: the X20
    * components pass + one id-keyed left join + a narrow hash map.
    */
  def clusterSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
      trainPct: Int, valPct: Int): DataFrame = {
    val comp = Dedup.dupClusters(pairs)
    docs.select(col(idCol).as("doc_id"))
      .join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("rep_id", coalesce(col("rep_id"), col("doc_id")))
      .select(col("doc_id"), col("rep_id"),
        splitOf(col("rep_id"), trainPct, valPct).as("split"))
  }

  def clusterSplitSql(id: String, table: String, pairsSql: String,
      trainPct: Int, valPct: Int): String =
    s"""WITH comp AS (${Dedup.dupClustersSql(pairsSql)})
       |SELECT d.$id AS doc_id,
       |  coalesce(c.rep_id, d.$id) AS rep_id,
       |  ${splitOfSql(s"coalesce(c.rep_id, d.$id)", trainPct, valPct)} AS split
       |FROM $table d LEFT JOIN comp c ON c.id = d.$id""".stripMargin

  /** Corpus snapshot diff (X105): per-doc change classification
    * between two corpus versions — the release-governance audit that
    * answers "what actually changed since the last training set".
    * Statuses: `added` (only in v2), `removed` (only in v1),
    * `identical` (raw bytes equal), `equivalent` (raw differs but the
    * [[TextAnalysis.normalizedKey]] matches — whitespace/case/punct
    * churn a re-crawl or re-extraction introduces without changing
    * content; counting these as "changed" would drown the real edits),
    * `changed` (content actually differs). NULL-text rows are absent
    * from their side (the X97 contract: normalize before comparing).
    *
    * == 100 TB shape ==
    *
    * Two narrow fingerprint scans (md5 of raw + of the normalized
    * key — both codegen'd regex/md5 chains at scan speed) and ONE
    * full-outer join keyed on the doc id; no pair joins, no windows.
    * The classification compares 16-byte fingerprints, never texts.
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def side(df: DataFrame, fp: String, nk: String) = df
      .filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        md5(col(textCol).cast("binary")).as(fp),
        md5(TextAnalysis.normalizedKey(col(textCol)).cast("binary")).as(nk))
    side(v1, "fp_a", "nk_a")
      .join(side(v2, "fp_b", "nk_b"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("fp_a").isNull, lit("added"))
          .when(col("fp_b").isNull, lit("removed"))
          .when(col("fp_a") === col("fp_b"), lit("identical"))
          .when(col("nk_a") === col("nk_b"), lit("equivalent"))
          .otherwise(lit("changed")).as("status"))
  }

  /** DuckDB twin of [[snapshotDiff]]; `aSql` / `bSql` are subqueries
    * producing (doc_id, text) for the two versions.
    */
  def snapshotDiffSql(aSql: String, bSql: String): String =
    s"""WITH va AS ($aSql), vb AS ($bSql),
       |a AS (SELECT doc_id, md5(text) AS fp_a,
       |  md5(${TextAnalysis.normalizedKeySql("text")}) AS nk_a
       |  FROM va WHERE text IS NOT NULL),
       |b AS (SELECT doc_id, md5(text) AS fp_b,
       |  md5(${TextAnalysis.normalizedKeySql("text")}) AS nk_b
       |  FROM vb WHERE text IS NOT NULL)
       |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
       |  CASE WHEN a.fp_a IS NULL THEN 'added'
       |       WHEN b.fp_b IS NULL THEN 'removed'
       |       WHEN a.fp_a = b.fp_b THEN 'identical'
       |       WHEN a.nk_a = b.nk_b THEN 'equivalent'
       |       ELSE 'changed' END AS status
       |FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id""".stripMargin

  /** Shared gram extractor of the hashed-feature family (DSIR X72,
    * NB X125): unigrams ++ adjacent bigrams of `ts` (an already-split
    * token array column). The bigram arm is guarded so one-token docs
    * contribute their unigram only.
    */
  private def unigramsAndBigrams(ts: Column): Column = {
    val bigrams = when(size(ts) >= 2,
      transform(sequence(lit(1), size(ts) - 1),
        i => concat_ws(" ", element_at(ts, i), element_at(ts, i + 1))))
      .otherwise(array().cast("array<string>"))
    concat(ts, bigrams)
  }

  /** X125 — hashed multinomial Naive Bayes classifier (train + serve
    * in one plan): the supervised quality/domain classifier every
    * production LLM corpus pipeline runs (the role fastText's linear
    * classifier plays in the GPT-3 / LLaMA / CCNet data recipes),
    * expressed as exact integer math over hashed gram counts so the
    * oracle can prove it.
    *
    * Features are [[unigramsAndBigrams]] hashed into `nBuckets`
    * buckets (the Weinberger-et-al hashing trick — fastText's own
    * vocabulary bound). Docs matching `trainPred` train the model:
    * per-class gram-bucket counts `cnt(c,b)`, per-class totals
    * `tot_c`, and doc-count priors. Every doc (train AND held-out)
    * then scores against every trained class in log-space micros:
    *
    *   score(d,c) = round(ln(nd_c / n_tr)·1e6)
    *              + Σ_g round(ln((cnt(c,b(g)) + 1) / (tot_c + nBuckets))·1e6)
    *
    * — Laplace-smoothed multinomial NB, each log term quantized to an
    * integer ONCE (the house `round(x·1e6)` contract, the same shape
    * [[dsirWeights]] and `TextAnalysis.lmScore` prove cross-engine)
    * and summed exactly as longs. The prediction is the max-score
    * class, ties broken to the lexicographically smallest label
    * (`row_number` over (score DESC, label ASC) — deterministic on
    * both engines). Docs whose label never appears in training still
    * score and predict among the trained classes; docs with NULL text
    * carry prior-only scores.
    *
    * Output: one row per doc — (doc_id, label, split, predicted)
    * with split ∈ train/eval from `trainPred`. [[nbConfusion]] is the
    * bounded (≤ K²·2 rows) gate aggregate over this frame.
    *
    * == 100 TB shape ==
    *
    * One narrow gram pass over the corpus (cached once — it feeds the
    * model aggs and the scoring agg). The model is ≤ K·nBuckets
    * (class, bucket) count rows — two partial-agg shuffles over
    * COUNTS, never gram instances — and is broadcast BY CONSTRUCTION
    * bounded: the hashing trick caps it at K·nBuckets longs
    * independent of vocabulary, which is the entire reason fastText
    * ships this shape. Scoring compresses to distinct (doc, bucket)
    * pairs (one partial-agg shuffle ∝ corpus tokens), expands by the
    * K-row class digest (broadcast), and aggregates per (doc, class);
    * the argmax is a per-doc window (ndocs partitions, no skew).
    * Nothing anywhere scales with vocabulary or pairs of docs.
    */
  def nbPredict(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, trainPred: Column, nBuckets: Int): DataFrame = {
    val base = docs.select(col(idCol).as("id"), col(labelCol).as("label"),
      trainPred.as("is_tr"), TextAnalysis.tokens(col(textCol)).as("ts"))
    val d = Caching.cachedOnce(base.select(col("id"), col("label"), col("is_tr")))
    val feats = Caching.cachedOnce(base
      .select(col("id"), col("label"), col("is_tr"),
        explode(unigramsAndBigrams(col("ts"))).as("g"))
      .select(col("id"), col("label"), col("is_tr"),
        pmod(Hashing.hash60(col("g")), lit(nBuckets.toLong)).as("b")))
    // model: priors from train docs, bucket counts from train grams
    val pri = d.filter(col("is_tr"))
      .groupBy(col("label").as("c_label")).agg(count(lit(1)).as("nd"))
    val ntr = d.filter(col("is_tr")).agg(count(lit(1)).as("n_tr"))
    val tot = feats.filter(col("is_tr"))
      .groupBy(col("label").as("c_label")).agg(count(lit(1)).as("tot_c"))
    val classes = Caching.cachedOnce(
      pri.join(tot, Seq("c_label"), "left").crossJoin(broadcast(ntr))
        .select(col("c_label"),
          round(log(col("nd").cast("double") / col("n_tr").cast("double")) * 1e6)
            .cast("long").as("prior_lp"),
          round(log(lit(1.0) /
              (coalesce(col("tot_c"), lit(0L)) + nBuckets).cast("double")) * 1e6)
            .cast("long").as("unseen_lp"),
          coalesce(col("tot_c"), lit(0L)).as("tot_c")))
    val model = feats.filter(col("is_tr"))
      .groupBy(col("label").as("c_label"), col("b")).agg(count(lit(1)).as("cnt"))
      .join(broadcast(classes.select(col("c_label"), col("tot_c"))), "c_label")
      .select(col("c_label"), col("b"),
        round(log((col("cnt") + 1).cast("double") /
            (col("tot_c") + nBuckets).cast("double")) * 1e6)
          .cast("long").as("lp"))
    // scoring: distinct (doc, bucket) counts × class digest, model left-joined
    val db = feats.groupBy(col("id"), col("b")).agg(count(lit(1)).as("dn"))
    val fs = db
      .crossJoin(broadcast(classes.select(col("c_label"), col("unseen_lp"))))
      .join(broadcast(model), Seq("c_label", "b"), "left")
      .groupBy(col("id"), col("c_label"))
      .agg(sum(col("dn") * coalesce(col("lp"), col("unseen_lp"))).as("fsum"))
    val scores = d.select(col("id"))
      .crossJoin(broadcast(classes.select(col("c_label"), col("prior_lp"))))
      .join(fs, Seq("id", "c_label"), "left")
      .select(col("id"), col("c_label"),
        (col("prior_lp") + coalesce(col("fsum"), lit(0L))).as("score"))
    // asc_nulls_last: Spark sorts NULLS FIRST on asc by default while
    // DuckDB sorts them last — with a NULL training label (a real,
    // carried class) a score tie would otherwise pick different
    // predictions per engine
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("c_label").asc_nulls_last)
    scores.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id"), col("c_label").as("predicted"))
      .join(d, "id")
      .select(col("id").as("doc_id"), col("label"),
        when(col("is_tr"), "train").otherwise("eval").as("split"),
        col("predicted"))
  }

  /** The gate aggregate of [[nbPredict]]: the train/eval confusion
    * matrix — (label, predicted, split, n_docs), ≤ K²·2 rows. The
    * eval slice is the held-out accuracy audit a pipeline reads
    * before trusting the classifier's keep/drop verdicts.
    */
  def nbConfusion(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, trainPred: Column, nBuckets: Int): DataFrame =
    nbPredict(docs, idCol, textCol, labelCol, trainPred, nBuckets)
      .groupBy(col("label"), col("predicted"), col("split"))
      .agg(count(lit(1)).as("n_docs"))

  def nbConfusionSql(id: String, text: String, label: String,
      table: String, trainPredSql: String, nBuckets: Int): String =
    s"""WITH d AS (
       |  SELECT $id AS id, $label AS label, ($trainPredSql) AS is_tr,
       |    ${TextAnalysis.tokensSql(text)} AS ts FROM $table),
       |feats AS (
       |  SELECT id, label, is_tr, ${Hashing.hash60Sql("g")} % $nBuckets AS b
       |  FROM (SELECT id, label, is_tr, unnest(list_concat(ts,
       |    list_transform(generate_series(1, greatest(len(ts) - 1, 0)),
       |      i -> ts[i] || ' ' || ts[i + 1]))) AS g FROM d)),
       |pri AS (SELECT label AS c_label, count(*) AS nd
       |        FROM d WHERE is_tr GROUP BY 1),
       |ntr AS (SELECT count(*) AS n_tr FROM d WHERE is_tr),
       |tot AS (SELECT label AS c_label, count(*) AS tot_c
       |        FROM feats WHERE is_tr GROUP BY 1),
       |classes AS (
       |  SELECT p.c_label,
       |    round(ln(nd::DOUBLE / n_tr::DOUBLE) * 1e6)::BIGINT AS prior_lp,
       |    round(ln(1::DOUBLE
       |      / (coalesce(tot_c, 0) + $nBuckets)::DOUBLE) * 1e6)::BIGINT AS unseen_lp,
       |    coalesce(tot_c, 0) AS tot_c
       |  FROM pri p LEFT JOIN tot t ON p.c_label = t.c_label CROSS JOIN ntr),
       |model AS (
       |  SELECT cb.c_label, cb.b,
       |    round(ln((cb.cnt + 1)::DOUBLE
       |      / (c.tot_c + $nBuckets)::DOUBLE) * 1e6)::BIGINT AS lp
       |  FROM (SELECT label AS c_label, b, count(*) AS cnt
       |        FROM feats WHERE is_tr GROUP BY 1, 2) cb
       |  JOIN classes c ON cb.c_label = c.c_label),
       |db AS (SELECT id, b, count(*) AS dn FROM feats GROUP BY 1, 2),
       |fs AS (
       |  SELECT db.id, c.c_label,
       |    sum(db.dn * coalesce(m.lp, c.unseen_lp)) AS fsum
       |  FROM db CROSS JOIN classes c
       |  LEFT JOIN model m ON m.c_label = c.c_label AND m.b = db.b
       |  GROUP BY 1, 2),
       |scores AS (
       |  SELECT d.id, c.c_label, c.prior_lp + coalesce(f.fsum, 0) AS score
       |  FROM d CROSS JOIN classes c
       |  LEFT JOIN fs f ON f.id = d.id AND f.c_label = c.c_label),
       |pred AS (
       |  SELECT id, c_label AS predicted FROM (
       |    SELECT id, c_label, row_number() OVER (
       |      PARTITION BY id ORDER BY score DESC, c_label ASC) AS rn
       |    FROM scores) WHERE rn = 1)
       |SELECT d.label, p.predicted,
       |  CASE WHEN d.is_tr THEN 'train' ELSE 'eval' END AS split,
       |  count(*)::BIGINT AS n_docs
       |FROM d JOIN pred p ON d.id = p.id
       |GROUP BY 1, 2, 3""".stripMargin

  /** X128 — NB model introspection: the m most class-INDICATIVE
    * grams per class, by the DSIR-style log-ratio of the gram's
    * bucket under the class model vs the whole training corpus:
    *
    *   lr(c,b) = round(ln( ((cnt(c,b)+1)/(tot_c+nB))
    *                     / ((cnt(b)+1)/(tot+nB)) )·1e6)
    *
    * — "what did the filter learn", the audit a deployed [[
    * nbPredict]] gate owes its operators (why is this source
    * draining away? which boilerplate token is carrying the class?).
    * Grams score through their BUCKET (the hashing-trick caveat,
    * stated rather than hidden: colliding grams share a score, and
    * the gram column is exactly how you see which grams ride a hot
    * bucket). A class ranks only grams whose bucket it actually
    * trained on (the lr ⋈ grams inner join): a gram a class never
    * uses cannot be indicative of it, and scoring it would only
    * surface the all-unseen noise floor. Ties and ranks
    * deterministic: (lr desc, gram asc). Output: (c_label, gram,
    * lr_micros, rank), ≤ K·m rows.
    *
    * == 100 TB shape ==
    *
    * One gram pass partial-aggregated to DISTINCT (class, bucket) and
    * (gram, bucket) frames — the shuffles carry model-/vocab-sized
    * digests, never gram instances; the bucket stats broadcast back;
    * the per-class top-m compiles to WindowGroupLimit (each input
    * partition forwards ≤ m rows per class before the exchange).
    */
  def nbTopGrams(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, trainPred: Column, nBuckets: Int,
      m: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val feats = Caching.cachedOnce(docs.filter(trainPred)
      .select(col(labelCol).as("label"),
        explode(unigramsAndBigrams(TextAnalysis.tokens(col(textCol)))).as("g"))
      .select(col("label"), col("g"),
        pmod(Hashing.hash60(col("g")), lit(nBuckets.toLong)).as("b")))
    val tot = feats.agg(count(lit(1)).as("tot"))
    val bAll = feats.groupBy(col("b")).agg(count(lit(1)).as("cnt_b"))
    val bCls = feats.groupBy(col("label").as("c_label"), col("b"))
      .agg(count(lit(1)).as("cnt_cb"))
    val totC = feats.groupBy(col("label").as("c_label"))
      .agg(count(lit(1)).as("tot_c"))
    val lr = bCls
      .join(broadcast(totC), "c_label")
      .join(broadcast(bAll), "b")
      .crossJoin(broadcast(tot))
      .select(col("c_label"), col("b"),
        round(log(((col("cnt_cb") + 1).cast("double") /
            (col("tot_c") + nBuckets).cast("double")) /
          ((col("cnt_b") + 1).cast("double") /
            (col("tot") + nBuckets).cast("double"))) * 1e6)
          .cast("long").as("lr_micros"))
    val grams = feats.select(col("g"), col("b")).distinct()
    val w = Window.partitionBy(col("c_label"))
      .orderBy(col("lr_micros").desc, col("g").asc)
    grams.join(broadcast(lr), "b")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= m)
      .select(col("c_label"), col("g").as("gram"), col("lr_micros"),
        col("rank"))
  }

  def nbTopGramsSql(id: String, text: String, label: String,
      table: String, trainPredSql: String, nBuckets: Int, m: Int): String =
    s"""WITH feats AS (
       |  SELECT label, g, ${Hashing.hash60Sql("g")} % $nBuckets AS b
       |  FROM (SELECT $label AS label, unnest(list_concat(ts,
       |    list_transform(generate_series(1, greatest(len(ts) - 1, 0)),
       |      i -> ts[i] || ' ' || ts[i + 1]))) AS g
       |  FROM (SELECT $label, ${TextAnalysis.tokensSql(text)} AS ts
       |        FROM $table WHERE $trainPredSql))),
       |tot AS (SELECT count(*) AS tot FROM feats),
       |ball AS (SELECT b, count(*) AS cnt_b FROM feats GROUP BY 1),
       |bcls AS (SELECT label AS c_label, b, count(*) AS cnt_cb
       |         FROM feats GROUP BY 1, 2),
       |totc AS (SELECT label AS c_label, count(*) AS tot_c
       |         FROM feats GROUP BY 1),
       |lr AS (
       |  SELECT bc.c_label, bc.b,
       |    round(ln(((cnt_cb + 1)::DOUBLE / (tot_c + $nBuckets)::DOUBLE)
       |      / ((cnt_b + 1)::DOUBLE / (tot + $nBuckets)::DOUBLE))
       |      * 1e6)::BIGINT AS lr_micros
       |  FROM bcls bc JOIN totc tc ON bc.c_label = tc.c_label
       |  JOIN ball ba ON bc.b = ba.b CROSS JOIN tot),
       |grams AS (SELECT DISTINCT g, b FROM feats)
       |SELECT c_label, gram, lr_micros, rank FROM (
       |  SELECT lr.c_label, grams.g AS gram, lr.lr_micros,
       |    row_number() OVER (PARTITION BY lr.c_label
       |      ORDER BY lr.lr_micros DESC, grams.g ASC)::BIGINT AS rank
       |  FROM grams JOIN lr ON grams.b = lr.b)
       |WHERE rank <= $m""".stripMargin

  /** The frozen NB model: labels sorted ascending, per-class prior
    * log-micros, and per-class FULL bucket→lp arrays (absent buckets
    * carry the smoothed unseen lp baked in). K·(nBuckets + 1) longs —
    * the whole model, bounded by the hashing trick regardless of
    * vocabulary, exactly the artifact fastText serializes.
    */
  final case class NbModel(labels: IndexedSeq[String],
      priorLp: IndexedSeq[Long], lp: IndexedSeq[IndexedSeq[Long]]) {
    require(labels.nonEmpty,
      "empty NB model: trainPred matched no docs at freeze time")
    def nBuckets: Int = lp.head.size
  }

  /** The offline half of the streaming NB gate: collect
    * [[nbPredict]]'s count tables into arrays. One action over the
    * STATIC labeled corpus at stage construction.
    */
  def freezeNb(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, trainPred: Column, nBuckets: Int): NbModel = {
    val base = docs.filter(trainPred)
      .select(col(labelCol).as("label"), TextAnalysis.tokens(col(textCol)).as("ts"))
    val nd = base.groupBy(col("label")).agg(count(lit(1)).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(!nd.contains(null),
      "NULL training label at freeze time: the frozen model's sorted " +
        "label array cannot represent a null class (the batch path " +
        "carries it; filter or fill labels before freezing)")
    val cnts = base
      .select(col("label"), explode(unigramsAndBigrams(col("ts"))).as("g"))
      .select(col("label"), pmod(Hashing.hash60(col("g")), lit(nBuckets.toLong)).as("b"))
      .groupBy(col("label"), col("b")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val labels = nd.keys.toIndexedSeq.sorted
    val nTr = nd.values.sum
    val tot = labels.map(l => l ->
      cnts.collect { case ((`l`, _), n) => n }.sum).toMap
    NbModel(labels,
      labels.map(l => math.round(math.log(nd(l).toDouble / nTr.toDouble) * 1e6)),
      labels.map { l =>
        val tc = tot(l) + nBuckets
        (0 until nBuckets).map { b =>
          math.round(math.log((cnts.getOrElse((l, b.toLong), 0L) + 1).toDouble
            / tc.toDouble) * 1e6)
        }
      })
  }

  /** Score docs against a frozen NB model — a pure narrow map (the
    * per-class bucket arrays are literals; per-doc grams hash and
    * look up in-row, no shuffle, no state). On the SAME corpus the
    * model was frozen from, `predicted` matches [[nbPredict]] on
    * every doc (spec-pinned): the labels array is sorted, so
    * `array_position`'s first-max equals the batch row_number's
    * min-label tie-break. Output: (…docs columns…, predicted,
    * score_micros).
    */
  def scoreNbFrozen(docs: DataFrame, textCol: String,
      model: NbModel): DataFrame = {
    val nB = model.nBuckets
    // NULL text coalesces to zero grams so the score degrades to the
    // prior (matching the batch path, where a NULL-text doc simply
    // contributes no feature rows) instead of going NULL.
    val grams = coalesce(unigramsAndBigrams(TextAnalysis.tokens(col(textCol))),
      array().cast("array<string>"))
    // tokenize + hash ONCE into a bucket array; the K per-class score
    // columns then pay array lookups only (an md5 per gram PER CLASS
    // would multiply the gate's dominant cost by K for nothing)
    val bucketsCol = transform(grams, g =>
      pmod(Hashing.hash60(g), lit(nB.toLong)).cast("int"))
    val scoreCols = model.labels.indices.map { k =>
      val arr = typedLit(model.lp(k))
      lit(model.priorLp(k)) + aggregate(col("nb_buckets"),
        lit(0L), (acc, b) => acc + element_at(arr, b + 1))
    }
    val labelsLit = typedLit(model.labels)
    docs
      .withColumn("nb_buckets", bucketsCol)
      .withColumn("nb_scores", array(scoreCols: _*))
      .withColumn("score_micros", array_max(col("nb_scores")))
      .withColumn("predicted", element_at(labelsLit,
        array_position(col("nb_scores"), col("score_micros")).cast("int")))
      .drop("nb_buckets", "nb_scores")
  }

  /** X131 per-source exemplar selection: fuse three independent
    * in-row quality signals — the heuristic quality score (length
    * prior + stopword + alpha ratios), code-point entropy, and the
    * duplicate-token fraction (inverted) — each min-max normalized
    * WITHIN its source, weighted 0.4/0.3/0.3, and keep each source's
    * top n by the fused score. Normalization is what makes a
    * weighted sum of unlike signals principled, and per-source
    * min/max is a TWO-VALUE aggregate per (source, signal): the
    * ranges broadcast, the signals and the fusion are one narrow
    * codegen'd pass, and the top-n compiles to partial
    * WindowGroupLimit — no per-source rank over the corpus (the
    * rank-fusion alternative would put every doc of a source through
    * one window partition; min-max fusion buys the same
    * scale-invariance for two broadcast doubles per source).
    * Degenerate ranges (max == min) pin the signal to 0.5 on both
    * engines. Docs with NULL text or zero tokens drop (no signal).
    * Output: (source, rank, doc_id, fused_micros).
    */
  /** The X131 per-doc signal frame (doc_id, source, q, e, dup).
    * Signals are computed in a projection ABOVE the drop filters:
    * qualityMicros divides by length(text), which an empty text
    * would trip under ANSI — the Filter boundary keeps CollapseProject
    * from evaluating signals on rows the guards remove.
    */
  private def qualitySignals(docs: DataFrame, idCol: String,
      textCol: String, sourceCol: String): DataFrame = {
    val st = graft.functions.ArrayExprs.repStats(TextAnalysis.tokens(col("text")))
    docs
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
        col(textCol).as("text"))
      .withColumn("st", st)
      .filter(col("st").isNotNull && element_at(col("st"), 1) > 0)
      .select(col("doc_id"), col("source"),
        TextAnalysis.qualityMicros(col("text")).as("q"),
        TextAnalysis.charEntropy(col("text")).as("e"),
        round((lit(1.0) - element_at(col("st"), 2).cast("double")
          / element_at(col("st"), 1)) * 1e6).cast("long").as("dup"))
  }

  private def fuseAt(ranges: DataFrame, sig: DataFrame,
      clamp: Boolean): DataFrame = {
    def nrm(v: Column, lo: Column, hi: Column): Column = {
      val raw = (v - lo).cast("double") / (hi - lo).cast("double")
      val bounded = if (clamp) least(greatest(raw, lit(0.0)), lit(1.0)) else raw
      when(hi === lo, lit(0.5)).otherwise(bounded)
    }
    sig.join(broadcast(ranges), "source")
      .withColumn("fused_micros", round(
        (nrm(col("q"), col("qlo"), col("qhi")) * 0.4
          + nrm(col("e"), col("elo"), col("ehi")) * 0.3
          + (lit(1.0) - nrm(col("dup"), col("dlo"), col("dhi"))) * 0.3)
          * 1e6).cast("long"))
  }

  def qualityFuseTopN(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, n: Int): DataFrame = {
    val sig = Caching.cachedOnce(
      qualitySignals(docs, idCol, textCol, sourceCol))
    val ranges = sig.groupBy(col("source")).agg(
      min(col("q")).as("qlo"), max(col("q")).as("qhi"),
      min(col("e")).as("elo"), max(col("e")).as("ehi"),
      min(col("dup")).as("dlo"), max(col("dup")).as("dhi"))
    val fused = fuseAt(ranges, sig, clamp = false)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("fused_micros").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
      .select(col("source"), col("rank"), col("doc_id"),
        col("fused_micros"))
  }

  /** X134 dedup-aware stratified sampling: the [[X60]] exact-quota
    * sample drawn over duplicate-cluster REPRESENTATIVES instead of
    * raw docs — near-dup pairs ([[Dedup.minhashPairs]]) contract to
    * connected components ([[Dedup.dupClusters]]), every non-rep
    * member drops, then the per-source bottom-n rank sample runs over
    * the survivors. The ordering is the point: sampling BEFORE dedup
    * puts both twins of a duplicated page into an eval set with
    * probability ∝ dup-rate — this operator makes "no two sampled
    * docs share a cluster" structural. Output = [[stratifiedSample]]'s
    * (source, doc_id, rank).
    */
  def dedupedSample(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, n: Int, k: Int, numHashes: Int, bands: Int,
      rows: Int, threshold: Double): DataFrame = {
    val pairs = Dedup.minhashPairs(docs, idCol, textCol, k, numHashes,
      bands, rows, threshold)
    val losers = Dedup.dupClusters(pairs)
      .filter(col("id") =!= col("rep_id")).select(col("id"))
    val kept = docs.join(losers, docs(idCol) === losers("id"), "left_anti")
    stratifiedSample(kept, idCol, sourceCol, n)
  }

  def dedupedSampleSql(id: String, text: String, source: String,
      table: String, n: Int, k: Int, numHashes: Int, bands: Int,
      rows: Int, threshold: Double): String = {
    val labels = Dedup.dupClustersSql(Dedup.minhashPairsSql(id, text,
      table, k, numHashes, bands, rows, threshold))
    val kept = s"""(SELECT d.* FROM $table d
       |  WHERE d.$id NOT IN (
       |    SELECT id FROM ($labels) WHERE id <> rep_id))""".stripMargin
    stratifiedSampleSql(id, source, kept, n)
  }

  /** X132 frozen quality ranges: the X131 normalization model is six
    * longs per source — freeze it from a static reference corpus and
    * [[scoreQualityFrozen]] fuses any frame (batch or stream) as a
    * pure narrow map + one tiny broadcast join. Frozen-on-self
    * reproduces [[qualityFuseTopN]]'s fused scores exactly (every
    * value sits inside its own range, so the clamp is a no-op —
    * spec-pinned).
    */
  final case class QualityRanges(
      ranges: Map[String, (Long, Long, Long, Long, Long, Long)])

  def freezeQualityRanges(docs: DataFrame, idCol: String,
      textCol: String, sourceCol: String): QualityRanges =
    QualityRanges(
      qualitySignals(docs, idCol, textCol, sourceCol)
        .groupBy(col("source")).agg(
          min(col("q")).as("qlo"), max(col("q")).as("qhi"),
          min(col("e")).as("elo"), max(col("e")).as("ehi"),
          min(col("dup")).as("dlo"), max(col("dup")).as("dhi"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
        .toMap)

  /** Score docs against frozen per-source ranges: signals in-row,
    * normalization CLAMPED to [0, 1] (post-freeze ingest can exceed
    * the frozen ranges; extrapolating would let one outlier dominate
    * the fusion — the clamp saturates it at "best/worst seen at
    * freeze time"). Docs from sources the freeze never saw DROP (no
    * model — a new source is a model-refresh event, the standing
    * frozen-twin contract). Output: (doc_id, source, fused_micros).
    */
  def scoreQualityFrozen(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, frozen: QualityRanges): DataFrame = {
    val spark = docs.sparkSession
    import scala.jdk.CollectionConverters._
    val rows = frozen.ranges.toSeq.sortBy(_._1).map { case (s, t) =>
      org.apache.spark.sql.Row(s, t._1, t._2, t._3, t._4, t._5, t._6)
    }
    val schema = org.apache.spark.sql.types.StructType(
      Seq("source" -> "string", "qlo" -> "long", "qhi" -> "long",
        "elo" -> "long", "ehi" -> "long", "dlo" -> "long",
        "dhi" -> "long").map { case (n, t) =>
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.DataType.fromDDL(t))
      })
    val ranges = spark.createDataFrame(rows.asJava, schema)
    fuseAt(ranges, qualitySignals(docs, idCol, textCol, sourceCol),
      clamp = true)
      .select(col("doc_id"), col("source"), col("fused_micros"))
  }

  def qualityFuseTopNSql(id: String, text: String, source: String,
      table: String, n: Int): String =
    s"""WITH d AS (
       |  SELECT $id AS doc_id, $source AS source, $text AS text
       |  FROM $table WHERE $text IS NOT NULL AND length($text) > 0),
       |toks AS (SELECT doc_id, unnest(${TextAnalysis.tokensSql("text")}) AS tok
       |         FROM d),
       |uc AS (SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY 1, 2),
       |ua AS (SELECT doc_id, sum(cnt) AS n_tokens, count(*) AS n_distinct
       |       FROM uc GROUP BY 1),
       |sig AS (
       |  SELECT d.doc_id, d.source,
       |    ${TextAnalysis.qualityMicrosSql("d.text")} AS q,
       |    ent.entropy_micro_nats AS e,
       |    round((1.0 - ua.n_distinct::DOUBLE / ua.n_tokens) * 1e6)::BIGINT AS dup
       |  FROM d
       |  JOIN ua ON ua.doc_id = d.doc_id AND ua.n_tokens > 0
       |  JOIN (${TextAnalysis.charEntropySql(id, text, table)}) ent
       |    ON ent.id = d.doc_id),
       |rng AS (SELECT source, min(q) AS qlo, max(q) AS qhi,
       |          min(e) AS elo, max(e) AS ehi,
       |          min(dup) AS dlo, max(dup) AS dhi
       |        FROM sig GROUP BY 1),
       |f AS (
       |  SELECT sig.source, sig.doc_id, round(
       |    ((CASE WHEN qhi = qlo THEN 0.5
       |           ELSE (q - qlo)::DOUBLE / (qhi - qlo)::DOUBLE END) * 0.4
       |     + (CASE WHEN ehi = elo THEN 0.5
       |             ELSE (e - elo)::DOUBLE / (ehi - elo)::DOUBLE END) * 0.3
       |     + (1.0 - (CASE WHEN dhi = dlo THEN 0.5
       |               ELSE (dup - dlo)::DOUBLE / (dhi - dlo)::DOUBLE END)) * 0.3)
       |    * 1e6)::BIGINT AS fused_micros
       |  FROM sig JOIN rng ON rng.source = sig.source),
       |r AS (SELECT source, doc_id, fused_micros, row_number() OVER (
       |        PARTITION BY source ORDER BY fused_micros DESC, doc_id) AS rank
       |      FROM f)
       |SELECT source, rank::BIGINT AS rank, doc_id, fused_micros
       |FROM r WHERE rank <= $n""".stripMargin

  /** X142 curation-recipe composite: the public web-corpus recipe
    * shape (CCNet / RefinedWeb / FineWeb-style) as ONE query —
    * quality gate → exact-dup representative on the normalized key
    * → near-dup CLUSTER representative (MinHash+LSH pairs contracted
    * by connected components) → PII redaction → content fingerprint
    * of the clean text. Every stage is an already-oracle-proven
    * operator; this query proves they COMPOSE (the oracle runs the
    * identical chain as nested SQL, so any cross-stage contract
    * drift — column naming, tie rules, null handling — breaks the
    * hash).
    *
    * Output: (doc_id, source, clean_fp) — the survivors a trainer
    * would ingest, with the fingerprint standing in for the redacted
    * text (hash-comparable across engines).
    *
    * Scale: the gates are narrow scans; the exact-rep window
    * partitions on the normalized key (dup-group-sized partitions);
    * the near-dup stage is the banded LSH (~linear in true dups);
    * the anti-join ships only loser ids. No stage shuffles the
    * corpus more than its standalone twin already does.
    */
  def curationPipeline(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, minQualityMicros: Long, k: Int, numHashes: Int,
      bands: Int, rows: Int, threshold: Double): DataFrame = {
    val t = col(textCol)
    val gated = docs
      .filter(t.isNotNull && length(t) > 0)
      .filter(TextAnalysis.qualityMicros(t) >= minQualityMicros)
    val w = Window.partitionBy(col("nk")).orderBy(col(idCol).asc)
    val exactReps = Caching.cachedOnce(gated
      .withColumn("nk", TextAnalysis.normalizedKey(t))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
        t.as("text")))
    val losers = Dedup.dupClusters(Dedup.minhashPairs(exactReps,
        "doc_id", "text", k, numHashes, bands, rows, threshold))
      .filter(col("id") =!= col("rep_id")).select(col("id"))
    exactReps.join(losers, exactReps("doc_id") === losers("id"), "left_anti")
      .select(col("doc_id"), col("source"),
        TextAnalysis.md5Fingerprint(
          TextAnalysis.piiRedact(col("text"))).as("clean_fp"))
  }

  def curationPipelineSql(id: String, text: String, source: String,
      table: String, minQualityMicros: Long, k: Int, numHashes: Int,
      bands: Int, rows: Int, threshold: Double): String = {
    val gated =
      s"""(SELECT $id AS doc_id, $source AS source, $text AS text
         |  FROM $table
         |  WHERE $text IS NOT NULL AND length($text) > 0
         |    AND ${TextAnalysis.qualityMicrosSql(text)} >= $minQualityMicros)""".stripMargin
    val exact =
      s"""(SELECT doc_id, source, text FROM (
         |  SELECT doc_id, source, text, row_number() OVER (
         |      PARTITION BY ${TextAnalysis.normalizedKeySql("text")}
         |      ORDER BY doc_id) AS rn
         |  FROM $gated g) WHERE rn = 1)""".stripMargin
    val labels = Dedup.dupClustersSql(Dedup.minhashPairsSql(
      "doc_id", "text", s"$exact er", k, numHashes, bands, rows, threshold))
    s"""SELECT e.doc_id, e.source,
       |  ${TextAnalysis.md5FingerprintSql(
             TextAnalysis.piiRedactSql("e.text"))} AS clean_fp
       |FROM $exact e
       |WHERE e.doc_id NOT IN (
       |  SELECT id FROM ($labels) WHERE id <> rep_id)""".stripMargin
  }

  /** X148 curation provenance — the audit trail the X142 recipe owes
    * its operators: EVERY input doc gets exactly one (outcome,
    * keeper) verdict, so "why did my doc disappear, and who absorbed
    * it" is a query, not an investigation:
    *
    *  - `empty`     — null/zero-length text (no keeper);
    *  - `quality`   — failed the quality gate (no keeper);
    *  - `exact_dup` — lost the normalized-key cut; keeper = the
    *    group's min-id representative (the rank-1 doc the pipeline
    *    keeps);
    *  - `near_dup`  — lost the MinHash cluster cut; keeper = the
    *    cluster's rep_id;
    *  - `kept`      — survived every stage; keeper = itself.
    *
    * The stages are the SAME fragments [[curationPipeline]] runs
    * (same gates, same window, same banding), so the audit's `kept`
    * set equals the pipeline's survivors BY CONSTRUCTION — OpsSpec
    * pins that, plus that the outcomes PARTITION the input (every
    * doc exactly once). Scale: one extra min-over-window on the nk
    * exchange the pipeline already pays; the outcome legs are
    * anti-join projections of the same cached frames — no new corpus
    * shuffle.
    */
  def curationAudit(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, minQualityMicros: Long, k: Int, numHashes: Int,
      bands: Int, rows: Int, threshold: Double): DataFrame = {
    val base = Caching.cachedOnce(docs.select(col(idCol).as("doc_id"),
      col(sourceCol).as("source"), col(textCol).as("text")))
    val nonEmpty = base.filter(col("text").isNotNull &&
      length(col("text")) > 0)
    val gated = nonEmpty.filter(
      TextAnalysis.qualityMicros(col("text")) >= minQualityMicros)
    val ranked = Caching.cachedOnce(gated
      .withColumn("nk", TextAnalysis.normalizedKey(col("text")))
      .withColumn("keeper",
        min(col("doc_id")).over(Window.partitionBy(col("nk")))))
    val exactReps = ranked.filter(col("doc_id") === col("keeper"))
      .select(col("doc_id"), col("source"), col("text"))
    val clusters = Caching.cachedOnce(
      Dedup.dupClusters(Dedup.minhashPairs(exactReps, "doc_id", "text",
        k, numHashes, bands, rows, threshold)))
    val nearLosers = clusters.filter(col("id") =!= col("rep_id"))
    def leg(df: DataFrame, outcome: String, keeper: Column) =
      df.select(col("doc_id"), lit(outcome).as("outcome"),
        keeper.cast("long").as("keeper_id"))
    val noKeeper = lit(null).cast("long")
    leg(base.join(nonEmpty.select(col("doc_id")), Seq("doc_id"),
        "left_anti"), "empty", noKeeper)
      .unionByName(leg(nonEmpty.join(gated.select(col("doc_id")),
        Seq("doc_id"), "left_anti"), "quality", noKeeper))
      .unionByName(leg(ranked.filter(col("doc_id") =!= col("keeper")),
        "exact_dup", col("keeper")))
      .unionByName(nearLosers.select(col("id").as("doc_id"),
        lit("near_dup").as("outcome"), col("rep_id").cast("long")
          .as("keeper_id")))
      .unionByName(leg(exactReps.join(
        nearLosers.select(col("id").as("doc_id")), Seq("doc_id"),
        "left_anti"), "kept", col("doc_id")))
  }

  def curationAuditSql(id: String, text: String, source: String,
      table: String, minQualityMicros: Long, k: Int, numHashes: Int,
      bands: Int, rows: Int, threshold: Double): String = {
    val base = s"(SELECT $id AS doc_id, $source AS source, $text AS text FROM $table)"
    val ne = s"(SELECT * FROM $base b WHERE text IS NOT NULL AND length(text) > 0)"
    val gated =
      s"""(SELECT * FROM $ne n
         |  WHERE ${TextAnalysis.qualityMicrosSql("text")} >= $minQualityMicros)""".stripMargin
    val ranked =
      s"""(SELECT doc_id, source, text, min(doc_id) OVER (
         |    PARTITION BY ${TextAnalysis.normalizedKeySql("text")})
         |    AS keeper FROM $gated g)""".stripMargin
    val exact =
      s"(SELECT doc_id, source, text FROM $ranked r WHERE doc_id = keeper)"
    val labels = Dedup.dupClustersSql(Dedup.minhashPairsSql(
      "doc_id", "text", s"$exact er", k, numHashes, bands, rows,
      threshold))
    s"""SELECT doc_id, 'empty' AS outcome, NULL::BIGINT AS keeper_id
       |FROM $base b
       |WHERE doc_id NOT IN (SELECT doc_id FROM $ne n2)
       |UNION ALL
       |SELECT doc_id, 'quality', NULL::BIGINT FROM $ne n
       |WHERE doc_id NOT IN (SELECT doc_id FROM $gated g2)
       |UNION ALL
       |SELECT doc_id, 'exact_dup', keeper::BIGINT FROM $ranked r
       |WHERE doc_id <> keeper
       |UNION ALL
       |SELECT id, 'near_dup', rep_id::BIGINT FROM ($labels) l
       |WHERE id <> rep_id
       |UNION ALL
       |SELECT doc_id, 'kept', doc_id::BIGINT FROM $exact e
       |WHERE doc_id NOT IN (SELECT id FROM ($labels) l2 WHERE id <> rep_id)""".stripMargin
  }

  def contaminationSql(id: String, text: String, table: String,
      evalPredSql: String, k: Int): String =
    s"""WITH base AS (
       |  SELECT $id AS id, ${Dedup.hashedShinglesSql(text, k)} AS hs,
       |    ($evalPredSql) AS is_eval FROM $table),
       |posts AS (
       |  SELECT id, is_eval, len(hs) AS n, unnest(hs) AS h FROM base),
       |overlap AS (
       |  SELECT e.id AS bench_id, t.id AS doc_id,
       |    round(count(*)::DOUBLE / any_value(e.n) * 1e6)::BIGINT AS containment_micros
       |  FROM posts e JOIN posts t ON e.h = t.h
       |  WHERE e.is_eval AND NOT t.is_eval
       |  GROUP BY 1, 2)
       |SELECT bench_id, doc_id, containment_micros FROM (
       |  SELECT bench_id, doc_id, containment_micros, row_number() OVER (
       |    PARTITION BY bench_id
       |    ORDER BY containment_micros DESC, doc_id) AS rn
       |  FROM overlap) WHERE rn = 1""".stripMargin
}
