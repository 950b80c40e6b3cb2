package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the LLM-data-pipeline surface (builder
  * brief; beyond-reference extensions per SURVEY §2.9/§7.4): exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
  *
  * Scale design (the point of each op at 100 TB):
  *  - exact: one hash-groupBy — a single shuffle on a 16-byte key.
  *  - MinHash+LSH: signatures are a narrow per-row map; the only wide
  *    op is the band-bucket self-join, whose key cardinality makes
  *    bucket sizes tiny (collisions ≈ near-dups only), so the join
  *    output is ~linear in the number of true duplicate pairs, never
  *    O(n²). Exact Jaccard runs only on surviving candidates.
  *  - SimHash: 60-bit signature per doc; candidate pairs via the
  *    pigeonhole chunk-join (hamming ≤ d guarantees an equal chunk
  *    when chunks > d), then exact popcount verify — full recall,
  *    not probabilistic, so the oracle is the plain hamming filter.
  *  - n-gram Jaccard / cosine near-dup: the exact quadratic baselines,
  *    blocked by a coarse key (source / cluster label) so each block's
  *    pairwise stays bounded — the pattern used to verify the
  *    probabilistic paths on samples.
  *
  * All hash math is the cross-engine [[Hashing]] family, so the DuckDB
  * oracle reproduces signatures, buckets and pairs bit-for-bit.
  */
object Dedup {

  import Hashing.{P, hash60, hash60Sql}

  // ---------------------------------------------------------------- exact

  /** Exact dedup: group by content fingerprint, keep the smallest id
    * as representative. One shuffle on the md5 key.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), TextAnalysis.md5Fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).cast("long").as("n_copies"))

  def exactSql(id: String, text: String, table: String): String =
    s"""SELECT ${TextAnalysis.md5FingerprintSql(text)} AS fp,
       |  min($id) AS rep_id, count(*)::BIGINT AS n_copies
       |FROM $table GROUP BY 1""".stripMargin

  // ------------------------------------------------------------- shingles

  /** Distinct k-word shingles of a token array (short docs degrade to
    * one truncated shingle; concat_ws skips past-the-end NULLs the
    * same way on both engines). Native expression — the HOF
    * formulation (`array_distinct(transform(sequence…))`) evaluates
    * its lambda interpreted per shingle and dominated the whole dedup
    * runtime; functions.WordShingles is bit-identical and ~30× faster.
    */
  def shingles(words: Column, k: Int): Column =
    graft.functions.ArrayExprs.wordShingles(words, k)

  def shinglesSql(words: String, k: Int): String = {
    val parts = (0 until k).map(o => s"$words[i + $o]")
    s"list_distinct([concat_ws(' ', ${parts.mkString(", ")}) " +
      s"for i in range(1, greatest(len($words) - ${k - 2}, 2))])"
  }

  /** The hashed shingle universe: distinct hash60 values of the
    * k-shingles. All set-similarity (ngram/minhash verify) is defined
    * over THIS universe on both engines — joins, doc frequencies and
    * intersections run on 8-byte longs instead of ~30-byte strings.
    * (A 60-bit collision merges two universe elements for every doc
    * equally; both engines hash identically, so results still match
    * bit-for-bit.)
    */
  def hashedShingles(textCol: Column, k: Int): Column =
    graft.functions.ArrayExprs.hash60Array(
      shingles(TextAnalysis.tokens(textCol), k))

  def hashedShinglesSql(text: String, k: Int): String =
    s"list_distinct([${hash60Sql("s")} for s in ${shinglesSql(TextAnalysis.tokensSql(text), k)}])"

  // ------------------------------------------------------- MinHash + LSH

  /** MinHash signature from a precomputed `hash60(shingle) mod P`
    * array: per permutation j, min over (a_j·x + b_j) mod P. Products
    * stay < 2^62 — no overflow on either engine.
    *
    * NOTE: only for small expression contexts (tests/oracle) — inside
    * a query use [[minhashSignatures]], the explode/agg form, which
    * hashes every shingle exactly once. The per-row HOF form is prone
    * to CollapseProject inlining the shared hash array into all
    * `numHashes` mins, multiplying the md5 work by `numHashes`.
    */
  def minhashSignature(hm: Column, numHashes: Int): Column = {
    val ss = Hashing.seeds(numHashes)
    array((0 until numHashes).map { j =>
      val (a, b) = ss(j)
      array_min(transform(hm, x => (x * a + b) % P))
    }: _*)
  }


  def minhashSignatureSqlParts(hm: String, numHashes: Int): Seq[String] = {
    val ss = Hashing.seeds(numHashes)
    (0 until numHashes).map { j =>
      val (a, b) = ss(j)
      s"list_min([(x * $a + $b) % $P for x in $hm])"
    }
  }

  /** LSH band keys: signature → `bands` strings, each joining `rows`
    * consecutive signature values. Docs sharing any band key are
    * candidate pairs.
    */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      concat_ws("_", (0 until rows).map(r => element_at(sig, b * rows + r + 1)): _*)
    }: _*)

  /** Full MinHash-LSH near-dup pipeline: docs → signatures → band
    * explode → bucket self-join → exact-Jaccard verify ≥ threshold.
    * Returns (id1, id2, jacc_micros) with id1 < id2.
    *
    * The band join shuffles on (band_idx, band_key) — high cardinality,
    * uniformly hash-distributed, so no hot buckets; AQE splits any
    * residual skew. The verify join ships only candidate ids back to
    * the (id → shingles) map: compact keys, ~linear in true dup pairs.
    */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int, bands: Int, rows: Int,
      threshold: Double): DataFrame = {
    require(bands * rows == numHashes)
    // one md5 per shingle TOTAL: signatures and the exact verify both
    // derive from the hashed universe — a purely narrow map. Cached:
    // the plan references it from three exchange subtrees (signatures,
    // verify s1, verify s2), which would otherwise re-hash every
    // shingle per subtree. Spills to disk if it outgrows memory;
    // lifecycle per [[Caching.cachedOnce]].
    val base = Caching.cachedOnce(docs.select(
      col(idCol).as("id"),
      hashedShingles(col(textCol), k).as("hs")))
    val sigs = base.select(col("id"),
      graft.functions.ArrayExprs.minhashSigFromHashes(
        col("hs"), Hashing.seeds(numHashes)).as("sig"))
    val buckets = sigs.select(
      col("id"),
      posexplode(bandKeys(col("sig"), bands, rows)).as(Seq("band", "key")))
    val cands = buckets.as("l")
      .join(buckets.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"))
      .distinct()
    cands
      .join(base.as("s1"), col("id1") === col("s1.id"))
      .join(base.as("s2"), col("id2") === col("s2.id"))
      .select(col("id1"), col("id2"),
        graft.functions.ArrayExprs.jaccardMicros60(
          col("s1.hs"), col("s2.hs")).as("jacc_micros"))
      .filter(col("jacc_micros") >= (threshold * 1e6).toLong)
  }

  /** Exact set-Jaccard of two distinct-element arrays, in micros. */
  def jaccardMicros(s1: Column, s2: Column): Column = {
    val i = size(array_intersect(s1, s2)).cast("double")
    val u = size(s1).cast("double") + size(s2).cast("double") - i
    round(i / u * 1e6).cast("long")
  }

  def jaccardMicrosSql(s1: String, s2: String): String =
    s"round(len(list_intersect($s1, $s2))::DOUBLE / " +
      s"(len($s1) + len($s2) - len(list_intersect($s1, $s2)))::DOUBLE * 1e6)::BIGINT"

  /** DuckDB twin of [[minhashPairs]] — same signatures, same bands,
    * same verify, so the result set is identical (the LSH is
    * deterministic given the hash family; no sampling anywhere).
    */
  def minhashPairsSql(id: String, text: String, table: String,
      k: Int, numHashes: Int, bands: Int, rows: Int,
      threshold: Double): String = {
    val sigParts = minhashSignatureSqlParts(s"[h % $P for h in hs]", numHashes)
    val bandRows = (0 until bands).map { b =>
      val vals = (0 until rows).map(r => s"sig[${b * rows + r + 1}]")
      s"SELECT id, $b AS band, concat_ws('_', ${vals.mkString(", ")}) AS key FROM sigs"
    }.mkString(" UNION ALL ")
    s"""WITH base AS (
       |  SELECT $id AS id, ${hashedShinglesSql(text, k)} AS hs FROM $table),
       |sigs AS (
       |  SELECT id, hs, [${sigParts.mkString(", ")}] AS sig FROM base),
       |buckets AS ($bandRows),
       |cands AS (
       |  SELECT DISTINCT l.id AS id1, r.id AS id2
       |  FROM buckets l JOIN buckets r
       |    ON l.band = r.band AND l.key = r.key AND l.id < r.id),
       |pairs AS (
       |  SELECT id1, id2, ${jaccardMicrosSql("s1.hs", "s2.hs")} AS jacc_micros
       |  FROM cands JOIN sigs s1 ON id1 = s1.id JOIN sigs s2 ON id2 = s2.id)
       |SELECT id1, id2, jacc_micros FROM pairs
       |WHERE jacc_micros >= ${(threshold * 1e6).toLong}""".stripMargin
  }

  // ------------------------------------------------------------- SimHash

  /** 60-bit SimHash from a precomputed token-hash array: bit b is set
    * iff more than half of the tokens have bit b set. The 60 per-bit
    * folds are unrolled at plan-build time (b is a Scala constant), so
    * shift amounts are literals and the whole thing codegens.
    */
  def simhash(hs: Column): Column = {
    val n = size(hs)
    (0 until 60).map { b =>
      val ones = aggregate(hs, lit(0L), (s, h) => s + shiftright(h, b) % 2L)
      when(ones * 2 > n, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** SimHash signatures per doc — native one-pass expression (one md5
    * per token, narrow map, no explode/aggregate). Returns (id, sig).
    */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      graft.functions.ArrayExprs.simhash60(
        TextAnalysis.tokens(col(textCol))).as("sig"))

  /** SimHash near-dup pairs with hamming distance ≤ maxDist, found via
    * the pigeonhole chunk join: split the 60-bit signature into
    * `chunks` equal pieces; any pair within maxDist ≤ chunks−1 shares
    * at least one identical chunk, so the chunk-bucket join has FULL
    * recall. Verify = popcount(xor) ≤ maxDist.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      chunks: Int, maxDist: Int): DataFrame = {
    require(maxDist < chunks && 60 % chunks == 0)
    val bitsPer = 60 / chunks
    val sigs = simhashSignatures(docs, idCol, textCol)
    val buckets = sigs.select(
      col("id"), col("sig"),
      posexplode(array((0 until chunks).map { c =>
        shiftright(col("sig"), c * bitsPer) % (1L << bitsPer)
      }: _*)).as(Seq("chunk", "key")))
    buckets.as("l")
      .join(buckets.as("r"),
        col("l.chunk") === col("r.chunk") && col("l.key") === col("r.key") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"),
        bit_count(col("l.sig").bitwiseXOR(col("r.sig"))).cast("long").as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** Oracle: plain pairwise hamming — exact thanks to the pigeonhole
    * full recall of [[simhashPairs]].
    */
  def simhashPairsSql(id: String, text: String, table: String,
      maxDist: Int): String = {
    val words = TextAnalysis.tokensSql(text)
    s"""WITH sigs AS (
       |  SELECT id,
       |    list_sum([CASE WHEN 2 * list_sum([(h >> b) & 1 for h in hs]) > len(hs)
       |      THEN (1::BIGINT << b) ELSE 0 END for b in range(0, 60)])::BIGINT AS sig
       |  FROM (SELECT $id AS id, [${hash60Sql("w")} for w in $words] AS hs FROM $table))
       |SELECT l.id AS id1, r.id AS id2, bit_count(xor(l.sig, r.sig))::BIGINT AS dist
       |FROM sigs l JOIN sigs r ON l.id < r.id
       |WHERE bit_count(xor(l.sig, r.sig)) <= $maxDist""".stripMargin
  }

  // ---------------------------------- n-gram Jaccard (posting-list join)

  /** EXACT global n-gram-Jaccard near-dup via an inverted index: post
    * (shingle → id) lists, self-join on the shingle, count common
    * shingles per pair, jaccard = common / (n1 + n2 − common).
    *
    * This is the scalable exact algorithm: no O(n²) block cross — cost
    * is Σ df(s)² over shingles, i.e. proportional to actually-shared
    * content. A pair below threshold that shares no shingle is never
    * materialized (jaccard 0 — correctly absent). The count groupBy
    * partial-aggregates map-side; hot shingles are the skew source and
    * AQE's skew-join split handles them (at 100 TB one adds the
    * prefix-filter refinement: only post each doc's rarest shingles).
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double): DataFrame = {
    val base = docs.select(
      col(idCol).as("id"),
      hashedShingles(col(textCol), k).as("hs"))
    val posts = base.select(col("id"), size(col("hs")).as("n"),
      explode(col("hs")).as("h"))
    // length-ratio pruning is exact: J ≥ t forces t·n1 ≤ n2 and
    // t·n2 ≤ n1 (intersection ≤ min, union ≥ max), so mismatched
    // sizes drop before the aggregation ever sees their postings
    val common = posts.as("l")
      .join(posts.as("r"), col("l.h") === col("r.h") && col("l.id") < col("r.id") &&
        col("l.n") * threshold <= col("r.n") && col("r.n") * threshold <= col("l.n"))
      .groupBy(col("l.id").as("id1"), col("r.id").as("id2"),
        col("l.n").as("n1"), col("r.n").as("n2"))
      .agg(count(lit(1)).cast("double").as("common"))
    common
      .select(col("id1"), col("id2"),
        round(col("common") /
          (col("n1").cast("double") + col("n2").cast("double") - col("common")) * 1e6)
          .cast("long").as("jacc_micros"))
      .filter(col("jacc_micros") >= (threshold * 1e6).toLong)
  }

  /** Skew-hardened [[ngramJaccardPairs]]: identical output, but hot
    * shingles — the posting join's skew source — take an explicitly
    * salted path instead of relying on AQE's runtime skew split.
    *
    * A shingle shared by millions of docs concentrates its whole
    * posting list (and its |df|² pair fan-out) on one reducer. Here:
    *
    *  - document frequencies are computed once; shingles appearing in
    *    at least `hotFraction` of the corpus (df >= ceil(hotFraction ×
    *    ndocs), computed in-plan — the threshold scales with the data,
    *    an absolute cutoff would misclassify at 100× the corpus) form
    *    the (tiny — heavy hitters are few by definition) hot set,
    *    broadcast to split the posting stream.
    *  - cold postings self-join exactly as before.
    *  - hot postings join on (h, salt) where the left row's salt is
    *    pmod(hash(id), salts) and the right side is replicated once per
    *    salt value: every (a, b) pair meets exactly once — in the
    *    partition keyed by (h, salt(a)) — so the hot shingle's work
    *    spreads over `salts` reducers at the cost of replicating only
    *    hot postings `salts`×. Deterministic, planner-independent, and
    *    composable with AQE (which still handles residual imbalance).
    *
    * Per-shingle pair rows from the two paths are disjoint (a shared
    * shingle is either hot or cold), so the common-count aggregation
    * downstream is unchanged — the result is equal row-for-row to the
    * unsalted operator at any (hotFraction, salts); OpsSpec pins it on
    * a deliberately skewed fixture.
    */
  def ngramJaccardPairsSalted(docs: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double, hotFraction: Double, salts: Int): DataFrame = {
    require(salts > 0 && hotFraction > 0)
    val base = docs.select(
      col(idCol).as("id"),
      hashedShingles(col(textCol), k).as("hs"))
    // cached: the posting stream feeds FIVE subtrees (df aggregation,
    // cold self-join ×2, hot ×2) — without the cache the shingle
    // hashing re-runs in each, like its minhashPairs/Prefix siblings
    // (lifecycle per [[Caching.cachedOnce]])
    val posts = Caching.cachedOnce(
      base.select(col("id"), size(col("hs")).as("n"),
        explode(col("hs")).as("h")))
    val ndocs = base.agg(count(lit(1)).as("ndocs"))
    val hotKeys = posts.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .join(broadcast(ndocs))
      .filter(col("df") >= ceil(col("ndocs") * hotFraction))
      .select(col("h"))

    val lenOk = col("l.n") * threshold <= col("r.n") &&
      col("r.n") * threshold <= col("l.n")
    val cold = posts.join(broadcast(hotKeys), Seq("h"), "left_anti")
    val coldPairs = cold.as("l")
      .join(cold.as("r"),
        col("l.h") === col("r.h") && col("l.id") < col("r.id") && lenOk)
      .select(col("l.id").as("id1"), col("r.id").as("id2"),
        col("l.n").as("n1"), col("r.n").as("n2"))

    val hot = posts.join(broadcast(hotKeys), "h")
    val hotL = hot.withColumn("salt", pmod(hash(col("id")), lit(salts)))
    val hotR = hot.withColumn("salt",
      explode(sequence(lit(0), lit(salts - 1))))
    val hotPairs = hotL.as("l")
      .join(hotR.as("r"),
        col("l.h") === col("r.h") && col("l.salt") === col("r.salt") &&
          col("l.id") < col("r.id") && lenOk)
      .select(col("l.id").as("id1"), col("r.id").as("id2"),
        col("l.n").as("n1"), col("r.n").as("n2"))

    coldPairs.unionByName(hotPairs)
      .groupBy(col("id1"), col("id2"), col("n1"), col("n2"))
      .agg(count(lit(1)).cast("double").as("common"))
      .select(col("id1"), col("id2"),
        round(col("common") /
          (col("n1").cast("double") + col("n2").cast("double") - col("common")) * 1e6)
          .cast("long").as("jacc_micros"))
      .filter(col("jacc_micros") >= (threshold * 1e6).toLong)
  }

  def ngramJaccardPairsSql(id: String, text: String, table: String,
      k: Int, threshold: Double): String = {
    s"""WITH base AS (
       |  SELECT $id AS id, ${hashedShinglesSql(text, k)} AS hs FROM $table)
       |SELECT l.id AS id1, r.id AS id2,
       |  ${jaccardMicrosSql("l.hs", "r.hs")} AS jacc_micros
       |FROM base l JOIN base r ON l.id < r.id
       |WHERE ${jaccardMicrosSql("l.hs", "r.hs")} >= ${(threshold * 1e6).toLong}""".stripMargin
  }

  /** Prefix-filtered exact Jaccard (All-Pairs style) — the 100 TB
    * refinement of [[ngramJaccardPairs]]: under a global canonical
    * shingle order (ascending document frequency, then shingle — rare
    * first), any pair with Jaccard ≥ t must share a shingle within
    * each doc's first `|d| − ⌈t·|d|⌉ + 1` shingles, so only that
    * prefix is posted to the join. EXACT: J ≥ t ⟹ the pair overlap
    * is ≥ ⌈t·|x|⌉ for both docs (a partner smaller than t·|x| can't
    * reach t), and the pigeonhole on the canonical order guarantees a
    * shared prefix element — the verify step then applies the exact
    * threshold. At t=0.8 the posted volume drops ~5×, and the rare-
    * first order makes bucket sizes tiny.
    */
  def ngramJaccardPairsPrefix(docs: DataFrame, idCol: String, textCol: String,
      k: Int, threshold: Double): DataFrame = {
    // cached: referenced from three subtrees (document frequencies,
    // prefix extraction, verify re-join) — without the cache the
    // shingle hashing re-runs once per exchange subtree (lifecycle per
    // [[Caching.cachedOnce]])
    val base = Caching.cachedOnce(docs.select(
      col(idCol).as("id"),
      hashedShingles(col(textCol), k).as("hs")))
    val posts = base.select(col("id"), size(col("hs")).as("n"),
      explode(col("hs")).as("h"))
    val dfreq = posts.groupBy(col("h")).agg(count(lit(1)).as("df"))
    // Per-doc prefix under the global (df, h) rare-first order, via a
    // hash aggregate sorting ≤|hs| structs per doc — no window
    // shuffle+sort. Both join inputs are already hash-partitioned by
    // `h` from the dfreq aggregation, so the join adds no exchange.
    val prefixIds = posts.join(dfreq, "h")
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("df"), col("h")))).as("ord"),
        first(col("n")).as("n"))
      .select(col("id"),
        transform(
          slice(col("ord"), lit(1),
            (col("n") - ceil(col("n") * threshold) + 1).cast("int")),
          x => x.getField("h")).as("pref"))
    // Attach the (long) shingle-hash array once, explode the prefix,
    // self-join on the hashed key, verify per matched posting with the
    // one-pass native Jaccard, dedup identical pair rows at the end —
    // no separate candidate materialization or re-join back to base.
    val prefix = prefixIds.join(base, "id")
      .select(col("id"), col("hs"), explode(col("pref")).as("h"))
    prefix.as("l")
      .join(prefix.as("r"), col("l.h") === col("r.h") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"),
        graft.functions.ArrayExprs.jaccardMicros60(
          col("l.hs"), col("r.hs")).as("jacc_micros"))
      .filter(col("jacc_micros") >= (threshold * 1e6).toLong)
      .distinct()
  }

  // --------------------------------------- duplicate clusters (conn comp)

  /** Connected components over near-dup pairs → (id, rep_id) with
    * rep = min id of the component. This is the step that turns
    * pairwise near-dup output into an actionable dedup decision (keep
    * one representative per cluster).
    *
    * Algorithm: alternating large-star/small-star contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond"),
    * which converges in O(log n) rounds EVEN ON LONG CHAINS — the
    * 100 TB property plain min-label propagation lacks (its round
    * count is the graph diameter; PropertySpec pins the difference on
    * a path graph). Each round is two groupBy-min + join passes over
    * the edge list, every intermediate localCheckpointed to truncate
    * lineage:
    *
    *  - large-star: every node links its LARGER neighbors to the
    *    minimum of its closed neighborhood;
    *  - small-star: every node links its smaller neighbors (and
    *    itself) to that minimum.
    *
    * Fixpoint = the edge set is a union of 2-level stars whose
    * centers are the component minima; labels read directly off the
    * final edges.
    */
  def dupClusters(pairs: DataFrame): DataFrame =
    connectedComponents(pairs)._1

  /** [[dupClusters]] plus the number of star rounds executed (exposed
    * for the O(log n) convergence assertion in PropertySpec).
    */
  private[graft] def connectedComponents(pairs: DataFrame): (DataFrame, Int) = {
    // canonical edge orientation (small, large); pairs already have
    // id1 < id2 but normalize defensively. Materialized ONCE — `pairs`
    // is usually a whole LSH pipeline.
    var edges = pairs.select(
        least(col("id1"), col("id2")).as("a"),
        greatest(col("id1"), col("id2")).as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint()

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      val mins = sym.groupBy(col("a")).agg(min(col("b")).as("mb"))
        .select(col("a"), least(col("a"), col("mb")).as("m"))
      // (v, m(u)) for every neighbor v > u — larger nodes hang off the
      // neighborhood min; orientation stays (small, large)
      sym.filter(col("b") > col("a")).join(mins, "a")
        .select(col("m").as("a"), col("b")).filter(col("a") =!= col("b"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      // e is oriented (a < b): group by the LARGER endpoint b; m =
      // min of its smaller neighbors; relink them (and b) to m
      val mins = e.groupBy(col("b")).agg(min(col("a")).as("m"))
      val relinked = e.join(mins, "b")
        .select(col("m").as("a"), col("a").as("b"))
        .filter(col("a") =!= col("b"))
      val self = mins.select(col("m").as("a"), col("b"))
      relinked.union(self).distinct()
    }

    var rounds = 0
    var converged = edges.isEmpty
    while (!converged) {
      // fixpoint ⟺ empty symmetric difference, computed in the SAME
      // shuffle that materializes the round: tag next=1 / edges=2 and
      // sum per edge — 1 ⇒ only next, 2 ⇒ only edges, 3 ⇒ both. The
      // checkpoint job IS the diff job; the convergence probe below
      // only scans the (tiny, already-materialized) checkpoint blocks
      // instead of re-running a union+aggregate shuffle per round.
      val merged = smallStar(largeStar(edges)).withColumn("t", lit(1L))
        .union(edges.withColumn("t", lit(2L)))
        .groupBy(col("a"), col("b")).agg(sum(col("t")).as("t"))
        .localCheckpoint()
      rounds += 1
      converged = merged.filter(col("t") =!= 3).isEmpty
      // next = the tag-1 and tag-3 rows (exactly smallStar∘largeStar's
      // output, both sides distinct sets)
      edges = merged.filter(col("t") =!= 2).select(col("a"), col("b"))
    }
    // final stars: (center, leaf) edges; centers label themselves
    val labels = edges.select(col("b").as("id"), col("a").as("rep_id"))
      .union(edges.select(col("a").as("id"), col("a").as("rep_id")))
      .groupBy(col("id")).agg(min(col("rep_id")).as("rep_id"))
    (labels, rounds)
  }

  /** Oracle: transitive closure by recursive CTE over the same pair
    * set, component rep = min reachable id. `pairsSql` must be a
    * complete SELECT returning (id1, id2, …).
    */
  def dupClustersSql(pairsSql: String): String =
    s"""WITH RECURSIVE pr AS ($pairsSql),
       |sym AS (SELECT id1 AS a, id2 AS b FROM pr
       |        UNION ALL SELECT id2, id1 FROM pr),
       |reach AS (
       |  SELECT a AS src, b AS dst FROM sym
       |  UNION
       |  SELECT r.src, s.b FROM reach r JOIN sym s ON r.dst = s.a)
       |SELECT src AS id, least(src, min(dst))::BIGINT AS rep_id
       |FROM reach GROUP BY src""".stripMargin

  // ------------------------------------------- embedding cosine near-dup

  /** Embedding near-dup: pairs with cosine ≥ threshold, blocked by a
    * coarse cluster key (IVF-style — recall is bounded by the blocking,
    * exactly like production ANN dedup).
    */
  def cosinePairs(embs: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    // norms once per row (identical fold order as inline cosine, so
    // values — and the oracle — are unchanged), not once per pair
    val base = embs.select(
      col(idCol).as("id"), col(blockCol).as("blk"),
      Vectors.toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
    base.as("l")
      .join(base.as("r"), col("l.blk") === col("r.blk") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"),
        round(Vectors.dot(col("l.v"), col("r.v")) /
          (col("l.nrm") * col("r.nrm")) * 1e6).cast("long").as("cos_micros"))
      .filter(col("cos_micros") >= (threshold * 1e6).toLong)
  }

  def cosinePairsSql(id: String, vec: String, block: String, table: String,
      threshold: Double): String = {
    s"""WITH base AS (
       |  SELECT $id AS id, $block AS blk, ${Vectors.toDoubleSql(vec)} AS v FROM $table)
       |SELECT l.id AS id1, r.id AS id2,
       |  ${Vectors.cosineMicrosSql("l.v", "r.v")} AS cos_micros
       |FROM base l JOIN base r ON l.blk = r.blk AND l.id < r.id
       |WHERE ${Vectors.cosineMicrosSql("l.v", "r.v")} >= ${(threshold * 1e6).toLong}""".stripMargin
  }

  // ------------------------------------------- exact substring spans

  /** Exact shared-substring spans across documents (the
    * substring-level dedup of Lee et al., "Deduplicating Training Data
    * Makes Language Models Better": long VERBATIM repeats matter even
    * between documents whose set similarity is low — a quoted license
    * block inside two otherwise-unrelated pages is invisible to
    * Jaccard but is exactly the memorization hazard).
    *
    * Method: positional k-token grams (position kept, NOT the
    * distinct-set shingles the Jaccard family uses) → posting join on
    * the gram hash → a shared span of L ≥ k tokens appears as L−k+1
    * consecutive matches on one DIAGONAL (p1 − p2 constant); an
    * islands-and-gaps window (island = p1 − row_number per diagonal)
    * merges each run into ONE maximal span row:
    * (id1, id2, start1, start2, span_tokens), span_tokens ≥ minTokens.
    *
    * == 100 TB shape ==
    *
    * Cost ∝ matched gram OCCURRENCES, never |docs|²: the posting join
    * keys on 8-byte gram hashes, and grams whose DOCUMENT frequency
    * exceeds `maxDf` are dropped before the join (ubiquitous
    * boilerplate grams are the skew axis here, exactly like X4's
    * stopword postings — a gram in >maxDf docs contributes quadratic
    * pairs and no dedup signal; spans crossing a dropped gram split
    * conservatively). The window keys on (id1, id2, diagonal) — the
    * pair spread — after the join has already cut the volume. Both
    * stages partial-aggregate/shuffle on long keys only.
    */
  def substringSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minTokens: Int, maxDf: Int): DataFrame = {
    val posts = Caching.cachedOnce(docs
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("ts"))
      .select(col("id"), col("ts"),
        explode(when(size(col("ts")) >= k,
          sequence(lit(1), size(col("ts")) - (k - 1)))
          .otherwise(array().cast("array<int>"))).as("p"))
      .select(col("id"), col("p"),
        Hashing.hash60(concat_ws(" ", slice(col("ts"), col("p"), lit(k))))
          .as("h")))
    // document frequency per gram — drop boilerplate grams BEFORE the
    // self-join (the grams are the join's skew axis)
    val keep = posts.groupBy(col("h"))
      .agg(countDistinct(col("id")).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("h"))
    val kept = posts.join(keep, "h")
    val matches = kept.as("l")
      .join(kept.as("r"), col("l.h") === col("r.h") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"),
        col("l.p").as("p1"), col("r.p").as("p2"))
    val wDiag = Window.partitionBy(col("id1"), col("id2"), col("diag"))
      .orderBy(col("p1"))
    matches
      .withColumn("diag", col("p1") - col("p2"))
      .withColumn("isl", col("p1") - row_number().over(wDiag))
      .groupBy(col("id1"), col("id2"), col("diag"), col("isl"))
      .agg(min(col("p1")).as("start1"), min(col("p2")).as("start2"),
        (count(lit(1)) + (k - 1)).as("span_tokens"))
      .filter(col("span_tokens") >= minTokens)
      .select(col("id1"), col("id2"),
        col("start1").cast("long").as("start1"),
        col("start2").cast("long").as("start2"),
        col("span_tokens").cast("long").as("span_tokens"))
  }

  def substringSpansSql(id: String, text: String, table: String,
      k: Int, minTokens: Int, maxDf: Int): String = {
    val ws = TextAnalysis.tokensSql(text)
    val gram = (0 until k).map(o => s"ts[p + $o]").mkString("concat_ws(' ', ", ", ", ")")
    s"""WITH d AS (SELECT $id AS id, $ws AS ts FROM $table),
       |posts AS (
       |  SELECT id, unnest(generate_series(1, len(ts) - ${k - 1})) AS p, ts
       |  FROM d WHERE len(ts) >= $k),
       |g AS (SELECT id, p, ${Hashing.hash60Sql(gram)} AS h FROM posts),
       |keep AS (SELECT h FROM g GROUP BY h
       |         HAVING count(DISTINCT id) <= $maxDf),
       |kg AS (SELECT g.* FROM g JOIN keep USING (h)),
       |m AS (
       |  SELECT l.id AS id1, r.id AS id2, l.p AS p1, r.p AS p2,
       |    l.p - r.p AS diag
       |  FROM kg l JOIN kg r ON l.h = r.h AND l.id < r.id),
       |isl AS (
       |  SELECT *, p1 - row_number() OVER (
       |    PARTITION BY id1, id2, diag ORDER BY p1) AS isl
       |  FROM m)
       |SELECT id1, id2, min(p1)::BIGINT AS start1, min(p2)::BIGINT AS start2,
       |  (count(*) + ${k - 1})::BIGINT AS span_tokens
       |FROM isl GROUP BY id1, id2, diag, isl
       |HAVING count(*) + ${k - 1} >= $minTokens""".stripMargin
  }

  // --------------------------------------- content-defined chunking

  /** Content-defined chunking of every document (X99): the
    * rsync/LBFS boundary rule on token streams. A cut falls after
    * every position whose k-token gram hashes to 0 mod `divisor`
    * (expected chunk length ≈ divisor + k − 1 tokens); chunks are the
    * runs between cuts, each fingerprinted by `hash60` of its joined
    * tokens. Because boundaries depend only on local gram content,
    * an edit re-synchronizes at the first shared cut downstream and
    * every later chunk fingerprint matches verbatim — this catches
    * the insert-shifted near-copies that fixed-stride windows (X75)
    * and whole-doc fingerprints (X1) both miss, without the pair
    * join [[substringSpans]] needs.
    *
    * == 100 TB shape ==
    *
    * The entire chunker is ONE narrow in-row pass (native
    * [[graft.functions.CdcChunks]], real `doGenCode`) + an explode:
    * zero shuffle, scan speed at any corpus size. Downstream dedup
    * work happens on (fp, chunk) rows — 8-byte keys, partial-agg
    * friendly.
    */
  def contentChunks(docs: DataFrame, idCol: String, textCol: String,
      k: Int, divisor: Long): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.ArrayExprs.cdcChunks(
          TextAnalysis.tokens(col(textCol)), k, divisor)).as("c"))
      .select(col("doc_id"), col("c.start").as("start"),
        col("c.chunk_tokens").as("chunk_tokens"), col("c.fp").as("fp"))

  /** DuckDB twin of [[contentChunks]]: same boundary rule spelled as
    * a positional-gram scan + cut filter + lead() window (the oracle
    * is corpus-exploded where the engine is in-row — that asymmetry
    * is the point: the simple formulation proves the fused one).
    */
  def contentChunksSql(id: String, text: String, table: String,
      k: Int, divisor: Long): String = {
    val ws = TextAnalysis.tokensSql(text)
    val gram = (0 until k).map(o => s"ts[p + $o]").mkString("concat_ws(' ', ", ", ", ")")
    s"""WITH d AS (SELECT $id AS id, $ws AS ts FROM $table
       |           WHERE $text IS NOT NULL),
       |dn AS (SELECT id, ts, len(ts) AS n FROM d WHERE len(ts) >= 1),
       |posts AS (
       |  SELECT id, n, unnest(generate_series(1, n - ${k - 1})) AS p, ts
       |  FROM dn WHERE n >= $k),
       |cuts AS (
       |  SELECT id, p + $k AS start FROM posts
       |  WHERE (${Hashing.hash60Sql(gram)}) % $divisor = 0 AND p + $k <= n),
       |starts AS (SELECT id, 1 AS start FROM dn
       |           UNION ALL SELECT id, start FROM cuts),
       |seg AS (SELECT id, start,
       |    lead(start) OVER (PARTITION BY id ORDER BY start) AS nxt
       |  FROM starts)
       |SELECT s.id AS doc_id, s.start::BIGINT AS start,
       |  (coalesce(s.nxt - 1, dn.n) - s.start + 1)::BIGINT AS chunk_tokens,
       |  ${Hashing.hash60Sql(
             "array_to_string(list_slice(dn.ts, s.start, coalesce(s.nxt - 1, dn.n)), ' ')")} AS fp
       |FROM seg s JOIN dn ON s.id = dn.id""".stripMargin
  }

  /** Per-document shift-robust duplication gauge over
    * [[contentChunks]]: a chunk is CLAIMED when its fingerprint (at
    * ≥ `minDupTokens` tokens — sub-gram slivers carry no signal)
    * appears in 2+ documents; each doc reports its total tokens, the
    * tokens inside claimed chunks, and the duplicated fraction in
    * integer micros. This is the triage stage ahead of the exact
    * [[substringSpans]] pair join: spans cost ∝ matched gram
    * occurrences across PAIRS, this costs one fp partial-agg + one
    * fp join + one doc_id partial-agg — all 8-byte keys, no pair
    * blow-up — and tells you which slice of the corpus is worth the
    * pair-level look.
    */
  def chunkDupFraction(docs: DataFrame, idCol: String, textCol: String,
      k: Int, divisor: Long, minDupTokens: Int): DataFrame = {
    val ch = Caching.cachedOnce(contentChunks(docs, idCol, textCol, k, divisor))
    val claimed = ch.filter(col("chunk_tokens") >= minDupTokens)
      .groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("fp"), lit(1).as("dup"))
    ch.join(claimed, Seq("fp"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("chunk_tokens")).as("total_tokens"),
        coalesce(sum(when(col("dup") === 1, col("chunk_tokens"))), lit(0L))
          .as("dup_tokens"))
      .selectExpr("doc_id",
        "CAST(total_tokens AS BIGINT) AS total_tokens",
        "CAST(dup_tokens AS BIGINT) AS dup_tokens",
        "CAST((dup_tokens * 1000000) div total_tokens AS BIGINT) AS dup_frac_micros")
  }

  /** First-wins admission over [[contentChunks]] (X100's batch twin):
    * a ≥`minDupTokens` chunk fingerprint is CLAIMED by the lowest doc
    * id carrying it; each doc counts the tokens inside chunks claimed
    * by a LOWER id, and `kept = 1` iff that duplicated fraction stays
    * under `maxDupFracMicros`. Unlike the symmetric
    * [[chunkDupFraction]] (both copies flagged), first-wins is the
    * ADMISSION semantics — the original survives, the shifted
    * re-crawl drops — and it is order-free (min over ids), so the
    * same rule replays identically in the streaming store
    * (`streaming.ChunkDupStore` proves one-batch-from-empty
    * equivalence against THIS operator). Cost: one fp partial-agg
    * (min), one fp join, one doc_id partial-agg — all 8-byte keys.
    */
  def chunkDupGate(docs: DataFrame, idCol: String, textCol: String,
      k: Int, divisor: Long, minDupTokens: Int,
      maxDupFracMicros: Long): DataFrame = {
    val ch = Caching.cachedOnce(contentChunks(docs, idCol, textCol, k, divisor))
    val claims = ch.filter(col("chunk_tokens") >= minDupTokens)
      .groupBy(col("fp")).agg(min(col("doc_id")).as("claim_id"))
    ch.join(claims, Seq("fp"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("chunk_tokens")).as("total_tokens"),
        coalesce(sum(when(col("chunk_tokens") >= minDupTokens
            && col("claim_id") < col("doc_id"), col("chunk_tokens"))), lit(0L))
          .as("dup_tokens"))
      .selectExpr("doc_id",
        "CAST(total_tokens AS BIGINT) AS total_tokens",
        "CAST(dup_tokens AS BIGINT) AS dup_tokens",
        "CAST((dup_tokens * 1000000) div total_tokens AS BIGINT) AS dup_frac_micros",
        s"CAST(IF((dup_tokens * 1000000) div total_tokens < ${maxDupFracMicros}L, 1, 0) AS BIGINT) AS kept")
  }

  def chunkDupGateSql(id: String, text: String, table: String,
      k: Int, divisor: Long, minDupTokens: Int,
      maxDupFracMicros: Long): String = {
    val dup = s"""coalesce(sum(c.chunk_tokens) FILTER (
       |    WHERE c.chunk_tokens >= $minDupTokens
       |      AND cl.claim_id < c.doc_id), 0)""".stripMargin
    s"""WITH chunks AS (${contentChunksSql(id, text, table, k, divisor)}),
       |claims AS (
       |  SELECT fp, min(doc_id) AS claim_id FROM chunks
       |  WHERE chunk_tokens >= $minDupTokens GROUP BY fp)
       |SELECT c.doc_id,
       |  sum(c.chunk_tokens)::BIGINT AS total_tokens,
       |  $dup::BIGINT AS dup_tokens,
       |  (($dup * 1000000) // sum(c.chunk_tokens))::BIGINT AS dup_frac_micros,
       |  (CASE WHEN ($dup * 1000000) // sum(c.chunk_tokens)
       |     < $maxDupFracMicros THEN 1 ELSE 0 END)::BIGINT AS kept
       |FROM chunks c LEFT JOIN claims cl USING (fp)
       |GROUP BY c.doc_id""".stripMargin
  }

  def chunkDupFractionSql(id: String, text: String, table: String,
      k: Int, divisor: Long, minDupTokens: Int): String =
    s"""WITH chunks AS (${contentChunksSql(id, text, table, k, divisor)}),
       |claimed AS (
       |  SELECT fp FROM chunks WHERE chunk_tokens >= $minDupTokens
       |  GROUP BY fp HAVING count(DISTINCT doc_id) >= 2)
       |SELECT doc_id,
       |  sum(chunk_tokens)::BIGINT AS total_tokens,
       |  coalesce(sum(chunk_tokens) FILTER (
       |    WHERE fp IN (SELECT fp FROM claimed)), 0)::BIGINT AS dup_tokens,
       |  ((coalesce(sum(chunk_tokens) FILTER (
       |    WHERE fp IN (SELECT fp FROM claimed)), 0) * 1000000)
       |   // sum(chunk_tokens))::BIGINT AS dup_frac_micros
       |FROM chunks GROUP BY doc_id""".stripMargin

  /** The deduplicated corpus with QUALITY-aware survivor choice: every
    * doc outside any near-dup cluster survives untouched; within a
    * cluster the highest-quality member (ties: lower id) survives and
    * carries the count of dropped copies. This is the practical dedup
    * output — production pipelines keep the best-written copy, not the
    * lowest id. `pairs` is any of the near-dup pair operators (X2-X5,
    * X14, X70); cost beyond the pair graph is one components pass,
    * one window over CLUSTER MEMBERS only (the tiny side), and one
    * anti-join keyed on the doc id.
    */
  def keepBestQuality(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame): DataFrame = {
    val q = docs.select(col(idCol).as("id"),
      TextAnalysis.qualityMicros(col(textCol)).as("quality_micros"))
    val comp = dupClusters(pairs)
    val sizes = comp.groupBy(col("rep_id")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("rep_id"))
      .orderBy(col("quality_micros").desc, col("id").asc)
    val best = comp.join(q, "id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(sizes, "rep_id")
      .select(col("id").as("doc_id"), col("quality_micros"),
        (col("n") - 1).cast("long").as("n_dropped"))
    val singles = q.join(comp, Seq("id"), "left_anti")
      .select(col("id").as("doc_id"), col("quality_micros"),
        lit(0L).as("n_dropped"))
    singles.unionByName(best)
  }

  def keepBestQualitySql(id: String, text: String, table: String,
      pairsSql: String): String =
    s"""WITH comp AS (${dupClustersSql(pairsSql)}),
       |q AS (SELECT $id AS id,
       |  ${TextAnalysis.qualityMicrosSql(text)} AS quality_micros
       |  FROM $table),
       |sizes AS (SELECT rep_id, count(*) AS n FROM comp GROUP BY 1),
       |best AS (
       |  SELECT id, quality_micros, rep_id FROM (
       |    SELECT c.id, q.quality_micros, c.rep_id, row_number() OVER (
       |      PARTITION BY c.rep_id
       |      ORDER BY q.quality_micros DESC, c.id) AS rn
       |    FROM comp c JOIN q ON q.id = c.id) WHERE rn = 1)
       |SELECT q.id AS doc_id, q.quality_micros, 0::BIGINT AS n_dropped
       |FROM q LEFT JOIN comp c ON q.id = c.id WHERE c.id IS NULL
       |UNION ALL
       |SELECT b.id AS doc_id, b.quality_micros, (s.n - 1)::BIGINT AS n_dropped
       |FROM best b JOIN sizes s ON b.rep_id = s.rep_id""".stripMargin

  // ---------------------------------------------- semantic dedup (SemDeDup)

  /** SemDeDup-style semantic near-dup pairs (Abbas et al., "SemDeDup:
    * Data-efficient learning at web-scale through semantic
    * deduplication"): cluster the embeddings with trained k-means,
    * then pair up docs with cosine ≥ threshold WITHIN each cluster.
    * Unlike [[cosinePairs]] — whose blocking column is given — the
    * blocks here are LEARNED, which is the production shape: one
    * k-means training pass (on a sample at 100 TB, per the X51
    * append precedent), one zero-shuffle assignment over the corpus
    * ([[Similarity.assignToNearest]]'s broadcast pick), and
    * per-cluster pair generation whose cost is Σ|cluster|², never
    * |corpus|². Feed the output to [[dupClusters]] for the keep-one
    * representative step.
    */
  def semanticPairs(embs: DataFrame, idCol: String, vecCol: String,
      seedCol: String, iters: Int, threshold: Double): DataFrame = {
    // same canonical plan as Similarity's internal base — cachedOnce
    // shares one materialization with any ANN query over the table
    val base = Caching.cachedOnce(
      embs.select(col(idCol).as("id"), Vectors.toDouble(col(vecCol)).as("v"))
        .withColumn("nrm", Vectors.norm(col("v"))))
    val cents = Similarity.withCNorm(
      Similarity.kmeans(embs, idCol, vecCol, seedCol, iters))
    val blocked = Similarity.assignWithVec(base, cents)
    blocked.as("l")
      .join(blocked.as("r"),
        col("l.cl") === col("r.cl") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"),
        round(Vectors.dot(col("l.v"), col("r.v")) /
          (col("l.nrm") * col("r.nrm")) * 1e6).cast("long").as("cos_micros"))
      .filter(col("cos_micros") >= (threshold * 1e6).toLong)
  }

  /** DuckDB twin of [[semanticPairs]]: the shared trained-IVF prefix
    * (seeded centroids + unrolled Lloyd rounds + final assignment af)
    * with no query/truth legs, then the within-cluster pair predicate.
    */
  def semanticPairsSql(id: String, vec: String, seed: String, table: String,
      iters: Int, dim: Int, threshold: Double): String = {
    val cm = Vectors.cosineMicrosSql("l.v", "r.v")
    s"""${Similarity.ivfTrainedPrefixSql(id, vec, seed, table,
          "false", 1, iters, dim)}
       |SELECT l.id AS id1, r.id AS id2, $cm AS cos_micros
       |FROM af l JOIN af r ON l.cl = r.cl AND l.id < r.id
       |WHERE $cm >= ${(threshold * 1e6).toLong}""".stripMargin
  }

  /** Edit-distance-verified near-dup pairs: candidates from the
    * hashed-shingle posting join (docs sharing at least one token
    * k-gram), pruned by the EXACT length bound (|len1 − len2| ≤ d is
    * necessary for Levenshtein ≤ d), verified with the exact
    * bounded Levenshtein distance. Character-level ground truth where
    * set-Jaccard (X4) measures bag overlap and substring spans (X59)
    * find verbatim runs — the three answer different dedup questions
    * and share one candidate machinery.
    *
    * Recall is provable, not heuristic: d character edits touch at
    * most d tokens, leaving an untouched run of ≥ ⌈(n − d·k)/(d+1)⌉
    * tokens somewhere, so any pair within distance d whose docs have
    * at least d + k·(d+1) tokens shares a shingle and WILL be a
    * candidate (the X3 pigeonhole argument, character edition).
    *
    * == 100 TB shape ==
    *
    * The posting join is X4's (same skew treatment applies — hot
    * shingles salt via [[ngramJaccardPairsSalted]]'s split); the
    * verify stage touches only candidate pairs and uses the
    * THRESHOLDED Levenshtein (O(d·len) per pair, not O(len²) — the
    * candidate texts join back by id, never travel with postings).
    * Output: (id1, id2, edit_dist), id1 < id2, edit_dist ≤ d.
    */
  def editPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int, maxDist: Int): DataFrame = {
    val base = Caching.cachedOnce(docs.select(col(idCol).as("id"),
      col(textCol).as("text"), length(col(textCol)).as("len"),
      hashedShingles(col(textCol), k).as("hs")))
    val posts = base.select(col("id"), col("len"), explode(col("hs")).as("h"))
    val cands = posts.as("l")
      .join(posts.as("r"), col("l.h") === col("r.h") &&
        col("l.id") < col("r.id") &&
        abs(col("l.len") - col("r.len")) <= maxDist)
      .select(col("l.id").as("id1"), col("r.id").as("id2"))
      .distinct()
    cands
      .join(base.select(col("id").as("id1"), col("text").as("t1")), "id1")
      .join(base.select(col("id").as("id2"), col("text").as("t2")), "id2")
      .select(col("id1"), col("id2"),
        levenshtein(col("t1"), col("t2"), maxDist).cast("long").as("edit_dist"))
      .filter(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
  }

  /** DuckDB twin of [[editPairs]] (DuckDB's levenshtein has no
    * threshold form — the unbounded distance filtered to ≤ d is the
    * same relation).
    */
  def editPairsSql(id: String, text: String, table: String,
      k: Int, maxDist: Int): String =
    s"""WITH base AS (
       |  SELECT $id AS id, $text AS text, length($text) AS len,
       |    ${hashedShinglesSql(text, k)} AS hs FROM $table),
       |posts AS (SELECT id, len, unnest(hs) AS h FROM base),
       |cands AS (
       |  SELECT DISTINCT l.id AS id1, r.id AS id2
       |  FROM posts l JOIN posts r ON l.h = r.h AND l.id < r.id
       |    AND abs(l.len - r.len) <= $maxDist)
       |SELECT id1, id2, levenshtein(b1.text, b2.text)::BIGINT AS edit_dist
       |FROM cands JOIN base b1 ON b1.id = cands.id1
       |  JOIN base b2 ON b2.id = cands.id2
       |WHERE levenshtein(b1.text, b2.text) <= $maxDist""".stripMargin

  // ----------------------------------------- LSH quality measurement (X138)

  /** X138 MinHash-LSH measured recall curve: which truth pairs the
    * banding misses, bucketed by TRUE Jaccard decile — the measured
    * version of the 1−(1−s^r)^b S-curve every (bands × rows) choice is
    * made from, on this corpus instead of on the formula's iid
    * assumption. Truth = [[ngramJaccardPairs]] (exact, posting-join
    * bounded); found = [[minhashPairs]] (banding + exact verify over
    * the SAME hashed-shingle universe, so found ⊆ truth and the two
    * jacc values agree bit-for-bit — the join needs only the id pair).
    * Output one row per occupied decile bucket (bucket = ⌊jacc/1e5⌋,
    * so 1.0 lands in bucket 10 — always recall 1e6: identical docs
    * have identical signatures): (bucket, n_true, n_found,
    * recall_micros).
    *
    * The ANN family's measured-recall discipline ([[graft.ops
    * .Similarity.rpLshRecallSweep]]) applied to dedup. Scale: the
    * truth pass is the measurement harness — exact but Σdf²-bounded;
    * at full corpus scale run it on a SAMPLE (recall per bucket is a
    * ratio estimator, unbiased under uniform pair sampling) or swap in
    * [[ngramJaccardPairsPrefix]]; the found pass is the production
    * LSH itself.
    */
  def minhashLshRecall(docs: DataFrame, idCol: String, textCol: String,
      k: Int, numHashes: Int, bands: Int, rows: Int,
      threshold: Double): DataFrame = {
    val truth = ngramJaccardPairs(docs, idCol, textCol, k, threshold)
    val found = minhashPairs(docs, idCol, textCol, k, numHashes, bands,
        rows, threshold)
      .select(col("id1"), col("id2"), lit(1L).as("hit"))
    truth.join(found, Seq("id1", "id2"), "left")
      .groupBy(floor(col("jacc_micros") / 1e5).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_true"),
        sum(coalesce(col("hit"), lit(0L))).as("n_found"))
      .select(col("bucket"), col("n_true"), col("n_found"),
        round(col("n_found").cast("double") / col("n_true") * 1e6)
          .cast("long").as("recall_micros"))
  }

  def minhashLshRecallSql(id: String, text: String, table: String,
      k: Int, numHashes: Int, bands: Int, rows: Int,
      threshold: Double): String =
    s"""WITH truth AS (
       |${ngramJaccardPairsSql(id, text, table, k, threshold)}),
       |found AS (
       |${minhashPairsSql(id, text, table, k, numHashes, bands, rows, threshold)})
       |SELECT floor(t.jacc_micros / 1e5)::BIGINT AS bucket,
       |  count(*)::BIGINT AS n_true,
       |  sum(CASE WHEN f.id1 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_found,
       |  round(sum(CASE WHEN f.id1 IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
       |    / count(*) * 1e6)::BIGINT AS recall_micros
       |FROM truth t LEFT JOIN found f ON t.id1 = f.id1 AND t.id2 = f.id2
       |GROUP BY 1""".stripMargin

  /** The SCALE form of [[minhashLshRecall]] (X146): the recall curve
    * measured on a deterministic salted-hash DOC sample of FIXED
    * BUDGET instead of the full corpus. The sample rate is derived
    * from the corpus size (rate = targetDocs/|docs|, capped at 1), so
    * the truth pass's Σdf² cost is FLAT in corpus size — recall
    * estimation is a statistics problem, and its cost should scale
    * with the measurement budget, never with the corpus (the 31.7×
    * sf1.0 super-linearity of the unsampled harness was exactly the
    * truth pass riding the corpus). Sampling docs uniformly keeps
    * every PAIR with probability rate² independent of its Jaccard, so
    * the per-decile recall ratio on the sample is an unbiased
    * estimator of the full-corpus curve. The salt is fixed ("lshrs:")
    * so both engines sample identical docs; the found pass is the
    * production banding run on the same sample, so found ⊆ truth
    * still holds row-wise. This is the default harness at full corpus
    * scale; the unsampled twin stays the exact gate at test SFs.
    *
    * The corpus count is one bounded count job (the only full-corpus
    * touch — a scan, no shuffle); floor division in both engines
    * keeps the threshold bit-identical.
    */
  def minhashLshRecallSampled(docs: DataFrame, idCol: String,
      textCol: String, k: Int, numHashes: Int, bands: Int, rows: Int,
      threshold: Double, targetDocs: Long): DataFrame = {
    val n = docs.count()
    val thr =
      if (n == 0) 1000000L
      else math.min(1000000L, targetDocs * 1000000L / n)
    minhashLshRecall(
      docs.filter(pmod(Hashing.hash60(
        concat(lit("lshrs:"), col(idCol).cast("string"))),
        lit(1000000L)) < thr),
      idCol, textCol, k, numHashes, bands, rows, threshold)
  }

  def minhashLshRecallSampledSql(id: String, text: String,
      table: String, k: Int, numHashes: Int, bands: Int, rows: Int,
      threshold: Double, targetDocs: Long): String = {
    val sampled = s"""(SELECT * FROM $table
       | WHERE ${Hashing.hash60Sql(s"'lshrs:' || ($id)::VARCHAR")}
       |   % 1000000 <
       |   (SELECT least(1000000, $targetDocs * 1000000 // count(*))
       |    FROM $table))""".stripMargin
    minhashLshRecallSql(id, text, sampled, k, numHashes, bands, rows,
      threshold)
  }
}
