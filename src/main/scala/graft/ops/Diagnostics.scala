package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pre-shuffle key diagnostics (X101): the measurement that decides
  * whether a join/groupBy key needs salting, AQE skew handling, or a
  * broadcast — BEFORE the 100 TB shuffle runs, not after it straggles.
  * Every skew mitigation in this repo (the salted posting join, the
  * df-capped gram join, AQE skew-join) presupposes someone measured
  * the key distribution; this is that operator.
  */
object Diagnostics {

  /** Top-`topN` heaviest values of `keyCol` with their absolute and
    * fractional (integer-micros) share, plus the global row/key
    * counts as context columns: `share_micros · n_keys / 10⁶` ≫ 1 is
    * the skew factor that says the uniform-hash assumption is wrong.
    * NULL keys profile as the sentinel `'<null>'` (a NULL-heavy key
    * is the most common real-world skew axis — dropping it would
    * hide exactly the hot key the profile exists to find; the
    * sentinel also sidesteps the Spark-NULLS-FIRST / DuckDB-NULLS-
    * LAST ordering divergence).
    *
    * == 100 TB shape ==
    *
    * One partial-agg shuffle to |keys| count rows, a TakeOrdered
    * top-N (never a global sort), a broadcast of the 1-row totals;
    * the rank window orders ≤ topN rows. Cost ∝ corpus scan +
    * |keys|, output ∝ topN.
    */
  def keyProfile(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    val counts = df
      .select(coalesce(col(keyCol).cast("string"), lit("<null>")).as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("total_rows"),
      count(lit(1)).as("n_keys"))
    // limit first (TakeOrderedAndProject), then rank the <= topN
    // survivors — same (cnt desc, key asc) total order, so the local
    // row_number equals the global rank
    counts.orderBy(col("cnt").desc, col("key").asc).limit(topN)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("key").asc)))
      .crossJoin(broadcast(totals))
      .selectExpr("CAST(rank AS BIGINT) AS rank", "key",
        "CAST(cnt AS BIGINT) AS cnt",
        "CAST((cnt * 1000000) div total_rows AS BIGINT) AS share_micros",
        "CAST(total_rows AS BIGINT) AS total_rows",
        "CAST(n_keys AS BIGINT) AS n_keys")
  }

  // ------------- X113: mergeable log-histogram quantile sketch -------------

  /** HdrHistogram-style integer binning for non-negative longs: values
    * below 2^SubBits map to themselves (EXACT); above, the value lands
    * in the power-of-two bucket `b = floor(log2 n)` subdivided into 8
    * equal-width sub-bins, so every bin's relative width is ≤ 1/8
    * (12.5%). All integer math — `length(bin(n))` is the bit length,
    * the divisor is an exact power-of-two — so Spark and DuckDB agree
    * on every boundary by construction (a float `log2` would disagree
    * at exact powers of two).
    *
    * Why bins at all: rank statistics (median, p99) are NOT mergeable
    * — the batch card computes them with corpus ranks a stream can
    * never have, which is exactly why [[graft.streaming.CardStore]]
    * documents median as batch-only. Binned counts ARE mergeable
    * (plain addition), and the bin walk answers any quantile with a
    * GUARANTEED bracket: the true nearest-rank value lies in
    * [q_lo, q_hi], and (q_hi−q_lo)/q_lo ≤ 1/8. That trade — exact
    * rank over the bins, bounded value error inside one — is the
    * whole sketch.
    */
  val SubBits = 4
  private val SubCount = 1 << SubBits // 16
  private val HalfSub = SubCount / 2  // 8

  /** Bin id of a non-negative long count (`n < 16` → identity). The
    * sub-bin is `n >> shift` — exact integer arithmetic at every
    * magnitude (the divisor is 2^shift, so the shift IS the integer
    * division DuckDB's `//` computes); a `n / p` double division
    * would round for n ≥ 2^53 and could cross a bin boundary.
    */
  def binId(n: Column): Column = {
    val shift = (length(bin(n)) - lit(SubBits)).cast("long")
    when(n < lit(SubCount.toLong), n)
      .otherwise(lit(HalfSub.toLong) * shift +
        call_function("shiftright", n, shift.cast("int")))
  }

  def binIdSql(n: String): String = {
    val shift = s"(length(bin(($n)::BIGINT)) - $SubBits)"
    val p = s"CAST(pow(2, $shift) AS BIGINT)"
    s"(CASE WHEN ($n) < $SubCount THEN ($n) " +
      s"ELSE $HalfSub * $shift + (($n) // $p) END)::BIGINT"
  }

  /** Inclusive [lo, hi] value range of a bin id (inverse of [[binId]]). */
  def binLo(id: Column): Column = {
    val shift = (id / lit(HalfSub.toLong)).cast("long") - lit(1L)
    val u = id - lit(HalfSub.toLong) * shift
    val p = pow(lit(2.0), shift.cast("double")).cast("long")
    when(id < lit(SubCount.toLong), id).otherwise(u * p)
  }

  def binHi(id: Column): Column = {
    val shift = (id / lit(HalfSub.toLong)).cast("long") - lit(1L)
    val u = id - lit(HalfSub.toLong) * shift
    val p = pow(lit(2.0), shift.cast("double")).cast("long")
    // u*p + (p-1), NOT (u+1)*p - 1: for the top bin (u = 15,
    // shift = 59) the latter's intermediate 16*2^59 = 2^63 overflows
    // (ANSI error); the re-association peaks at exactly Long.MaxValue
    when(id < lit(SubCount.toLong), id)
      .otherwise(u * p + (p - lit(1L)))
  }

  def binLoSql(id: String): String = {
    val shift = s"(($id) // $HalfSub - 1)"
    val p = s"CAST(pow(2, $shift) AS BIGINT)"
    s"(CASE WHEN ($id) < $SubCount THEN ($id) " +
      s"ELSE (($id) - $HalfSub * $shift) * $p END)::BIGINT"
  }

  def binHiSql(id: String): String = {
    val shift = s"(($id) // $HalfSub - 1)"
    val p = s"CAST(pow(2, $shift) AS BIGINT)"
    // same re-association as binHi: (u+1)*p would overflow BIGINT on
    // the top bin before the -1 brings it back in range
    s"(CASE WHEN ($id) < $SubCount THEN ($id) " +
      s"ELSE (($id) - $HalfSub * $shift) * $p + ($p - 1) END)::BIGINT"
  }

  /** Signed extension: negative values mirror into negative bin ids
    * (`-binId(-v) - 1` — the offset keeps them disjoint from bin 0),
    * which stays MONOTONE in v, so the same cumulative walk serves
    * signed domains; the inverse mirrors back ([lo,hi] of a negative
    * bin is the negated, swapped range of its mirror). For b ≥ 0
    * these reduce to [[binId]]/[[binLo]]/[[binHi]] exactly, so the
    * non-negative token-length path is unchanged.
    */
  def signedBinId(v: Column): Column =
    when(v >= 0, binId(v)).otherwise(-binId(-v) - lit(1L))

  def signedLo(b: Column): Column =
    when(b >= 0, binLo(b)).otherwise(-binHi(-b - lit(1L)))

  def signedHi(b: Column): Column =
    when(b >= 0, binHi(b)).otherwise(-binLo(-b - lit(1L)))

  def signedBinIdSql(v: String): String =
    s"(CASE WHEN ($v) >= 0 THEN ${binIdSql(v)} " +
      s"ELSE -${binIdSql(s"-($v)")} - 1 END)::BIGINT"

  def signedLoSql(b: String): String =
    s"(CASE WHEN ($b) >= 0 THEN ${binLoSql(b)} " +
      s"ELSE -${binHiSql(s"(-($b) - 1)")} END)::BIGINT"

  def signedHiSql(b: String): String =
    s"(CASE WHEN ($b) >= 0 THEN ${binHiSql(b)} " +
      s"ELSE -${binLoSql(s"(-($b) - 1)")} END)::BIGINT"

  /** The quantile walk over a (source, bin, cnt) histogram: for each
    * requested percentile, nearest-rank r = ⌈pct·n/100⌉ and the first
    * bin whose cumulative count reaches it → (source, pct, n_docs,
    * q_lo, q_hi) with the true nearest-rank value GUARANTEED inside
    * [q_lo, q_hi]. Shared verbatim by the batch sketch and the
    * streaming store's serve path ([[graft.streaming.HistStore]]) —
    * the walk runs on histogram rows only (≤ ~200 bins per source),
    * never corpus rows.
    */
  def sketchServe(hist: DataFrame, pcts: Seq[Int]): DataFrame = {
    val wCum = Window.partitionBy(col("source")).orderBy(col("bin"))
    val wAll = Window.partitionBy(col("source"))
    hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n_docs", sum(col("cnt")).over(wAll))
      .withColumn("pct", explode(array(pcts.map(p => lit(p.toLong)): _*)))
      .withColumn("r", expr("(pct * n_docs + 99) div 100"))
      .filter(col("cum") >= col("r"))
      .groupBy(col("source"), col("pct"), col("n_docs"))
      .agg(min(col("bin")).as("qbin"))
      .select(col("source"), col("pct"), col("n_docs").cast("long").as("n_docs"),
        signedLo(col("qbin")).as("q_lo"), signedHi(col("qbin")).as("q_hi"))
  }

  /** X113 batch op: per-source token-length quantile sketch — ONE
    * partial-agg shuffle from corpus rows to the (source, bin) counts,
    * then the [[sketchServe]] walk on the tiny histogram. The same
    * numbers the streaming store serves after ingesting the same rows
    * in any batch split (counter addition is associative, the binning
    * is deterministic) — that equality is HistStoreSpec's pin.
    */
  def lengthQuantileSketch(docs: DataFrame, textCol: String,
      sourceCol: String, pcts: Seq[Int]): DataFrame = {
    // NULL-text docs are excluded (the X97 contract, same as the
    // filter curve): a NULL length has no bin, and a NULL bin row
    // would order differently across engines
    val hist = docs.filter(col(textCol).isNotNull)
      .select(coalesce(col(sourceCol).cast("string"), lit("<null>"))
          .as("source"),
        binId(TextAnalysis.tokenCount(col(textCol))).as("bin"))
      .groupBy(col("source"), col("bin")).agg(count(lit(1)).as("cnt"))
    sketchServe(hist, pcts)
  }

  /** The SQL twin of [[sketchServe]]'s walk — ONE copy of the
    * load-bearing nearest-rank rule shared by the length and value
    * twins (two hand-maintained copies is how the rank rule drifts).
    * `histCte` must yield (source, bin, cnt).
    */
  private def sketchWalkSql(histCte: String, pcts: Seq[Int]): String = {
    val pctList = pcts.mkString(", ")
    s"""WITH h AS (
       |$histCte),
       |c AS (
       |  SELECT source, bin, cnt,
       |    sum(cnt) OVER (PARTITION BY source ORDER BY bin) AS cum,
       |    sum(cnt) OVER (PARTITION BY source) AS n_docs
       |  FROM h),
       |pr AS (
       |  SELECT c.source, p.pct, c.bin, c.cum, c.n_docs,
       |    (p.pct * c.n_docs + 99) // 100 AS r
       |  FROM c, (SELECT unnest([$pctList]) AS pct) p),
       |q AS (
       |  SELECT source, pct, n_docs, min(bin) AS qbin
       |  FROM pr WHERE cum >= r GROUP BY 1, 2, 3)
       |SELECT source, pct::BIGINT AS pct, n_docs::BIGINT AS n_docs,
       |  ${signedLoSql("qbin")} AS q_lo, ${signedHiSql("qbin")} AS q_hi
       |FROM q""".stripMargin
  }

  def lengthQuantileSketchSql(text: String, source: String,
      table: String, pcts: Seq[Int]): String = {
    val n = TextAnalysis.tokenCountSql(text)
    sketchWalkSql(
      s"""  SELECT coalesce(($source)::VARCHAR, '<null>') AS source,
         |    ${binIdSql(n)} AS bin, count(*) AS cnt
         |  FROM $table WHERE $text IS NOT NULL GROUP BY 1, 2""".stripMargin,
      pcts)
  }

  /** X120: the [[lengthQuantileSketch]] machinery over a SIGNED
    * numeric column — values micro-quantize (the house `round(x·10⁶)`
    * rule, identical expression shape on both engines), bin through
    * [[signedBinId]], and serve bracket quantiles per key. This is
    * the deterministic, mergeable upgrade of `percentile_approx`'s
    * opaque band: the bracket is a guarantee ([q_lo, q_hi] contains
    * the true nearest-rank micro value, relative width ≤ 12.5%), the
    * counts merge by addition, and two engines agree bit-for-bit.
    * NULL values are excluded (no bin — the X97-style contract).
    */
  def valueQuantileSketch(df: DataFrame, valueCol: String,
      keyCol: String, pcts: Seq[Int]): DataFrame = {
    val vMicros = round(col(valueCol) * 1e6).cast("long")
    val hist = df.filter(col(valueCol).isNotNull)
      .select(coalesce(col(keyCol).cast("string"), lit("<null>"))
          .as("source"),
        signedBinId(vMicros).as("bin"))
      .groupBy(col("source"), col("bin")).agg(count(lit(1)).as("cnt"))
    sketchServe(hist, pcts)
  }

  def valueQuantileSketchSql(value: String, key: String, table: String,
      pcts: Seq[Int]): String = {
    val v = s"CAST(round(($value) * 1e6) AS BIGINT)"
    sketchWalkSql(
      s"""  SELECT coalesce(($key)::VARCHAR, '<null>') AS source,
         |    ${signedBinIdSql(v)} AS bin, count(*) AS cnt
         |  FROM $table WHERE $value IS NOT NULL GROUP BY 1, 2""".stripMargin,
      pcts)
  }

  def keyProfileSql(keyExpr: String, table: String, topN: Int): String =
    s"""WITH c AS (
       |  SELECT coalesce(($keyExpr)::VARCHAR, '<null>') AS key,
       |    count(*) AS cnt
       |  FROM $table GROUP BY 1),
       |t AS (SELECT sum(cnt) AS total_rows, count(*) AS n_keys FROM c),
       |top AS (
       |  SELECT key, cnt,
       |    row_number() OVER (ORDER BY cnt DESC, key ASC) AS rank
       |  FROM c ORDER BY cnt DESC, key ASC LIMIT $topN)
       |SELECT rank::BIGINT AS rank, key, cnt::BIGINT AS cnt,
       |  ((cnt * 1000000) // total_rows)::BIGINT AS share_micros,
       |  total_rows::BIGINT AS total_rows, n_keys::BIGINT AS n_keys
       |FROM top, t""".stripMargin

  /** X133 embedding drift between two corpus snapshots (the
    * snapshot axis — [[graft.ops.Drift.embeddingDrift]] is the
    * label-vs-corpus axis within ONE snapshot): per label,
    * the cosine between the snapshots' centroids plus both counts —
    * the "did the embedding model (or the corpus mix) move" check a
    * re-embedded or re-crawled corpus owes its ANN/dedup consumers
    * before they trust frozen centroids, thresholds, or persisted
    * indexes against it. Centroids are the deterministic
    * micro-quantized means ([[Similarity.centroids]]); labels present
    * in only one snapshot drop (no pair to compare — their appearance
    * IS the drift signal, visible in the count columns of the labels
    * that remain, and in [[keyProfile]] over the label column).
    * Zero-norm centroids drop like [[Similarity.bruteForceTopK]]'s
    * zero-norm vectors (cosine undefined; ANSI would throw).
    *
    * == 100 TB shape ==
    *
    * Two partial-agg shuffles over (label, dim) cells — 64·|labels|
    * rows each, never vector instances — then a |labels|-row join.
    * Cost ∝ corpus scan.
    */
  def embeddingSnapshotDrift(embs: DataFrame, vecCol: String, labelCol: String,
      snapshotPred: Column): DataFrame = {
    def side(pred: Column, centName: String, nName: String): DataFrame =
      Similarity.centroids(embs.filter(pred), labelCol, vecCol)
        .select(col("cl"), col("cent").as(centName))
        .join(embs.filter(pred).groupBy(col(labelCol).as("cl"))
          .agg(count(lit(1)).as(nName)), "cl")
    side(snapshotPred, "cent1", "n_v1")
      .join(side(!snapshotPred, "cent2", "n_v2"), "cl")
      .filter(Vectors.norm(col("cent1")) > 0 &&
        Vectors.norm(col("cent2")) > 0)
      .select(col("cl").as("label"), col("n_v1"), col("n_v2"),
        Vectors.cosineMicros(col("cent1"), col("cent2"))
          .as("centroid_cos_micros"))
  }

  /** X143 Count-Min sketch: the depth×width counter matrix over the
    * token stream, probed at the exact top-`topN` tokens — est_n is
    * the CMS point estimate (min over depth rows of the key's bucket
    * counter), true_n the exact count, so the output IS the sketch's
    * measured overestimate profile on this corpus. est ≥ true always
    * (every occurrence of a key lands in its own buckets); the
    * classic bound est − true ≤ 2N/width w.h.p. per row. Completes
    * the sketch family's query surface: [[graft.ops.TextAnalysis
    * .mgSummary]] (Misra-Gries) UNDER-estimates and only answers
    * heavy hitters; CMS OVER-estimates and answers ANY key — the two
    * standard mergeable frequency summaries, both by plain addition.
    *
    * Deterministic: row d hashes tok through hash60("d:" + tok) mod
    * width — both engines compute identical cells, so est matches
    * bit-for-bit (no probabilistic anything at fixed seeds).
    *
    * Scale: the corpus leaves through ONE partial-agg shuffle of
    * (d, bucket) cells (depth·width rows — the SKETCH, by definition
    * bounded); the probe side is topN keys × depth joined against
    * that digest. Merging shards/streams is cell-wise addition — the
    * [[graft.streaming.TopKStore]]-family contract.
    */
  private def cmsBucketOf(d: Int, t: Column, width: Int): Column =
    pmod(Hashing.hash60(concat(lit(s"$d:"), t)), lit(width.toLong))

  private def cmsToks(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))

  /** All `depth` (d, b) rows of a token in ONE pass (posexplode over
    * the per-row bucket array) — a union of per-d branches would
    * re-read and re-tokenize the input once per sketch row
    * (self-review finding; matters per micro-batch in the store).
    */
  private def cmsCellsOf(toks: DataFrame, depth: Int,
      width: Int): DataFrame =
    toks
      .select(posexplode(array((0 until depth).map(d =>
        cmsBucketOf(d, col("tok"), width)): _*)).as(Seq("d", "b")))
      .select(col("d").cast("long").as("d"), col("b"))
      .groupBy(col("d"), col("b")).agg(count(lit(1)).as("c"))

  /** The CMS matrix itself: (d, b, c) cells. Public because the merge
    * law — cms(A ∪ B) == cms(A) + cms(B) cell-wise — is the sketch's
    * whole point (shard/stream roll-ups) and is spec-pinned on this
    * frame.
    */
  def cmsCells(docs: DataFrame, textCol: String, depth: Int,
      width: Int): DataFrame =
    cmsCellsOf(cmsToks(docs, textCol), depth, width)

  /** Probe rows for a key frame: (tok, d, b) — the key's bucket in
    * every sketch row. Shared by the batch estimate query and the
    * [[graft.streaming.CmsStore]] serve path.
    */
  def cmsProbes(keys: DataFrame, tokCol: String, depth: Int,
      width: Int): DataFrame =
    // all depth rows per key in ONE pass (posexplode, the cmsCellsOf
    // shape) — the former depth-way union re-evaluated the key frame
    // once per sketch row (ADVICE r12)
    keys
      .select(col(tokCol).as("tok"),
        posexplode(array((0 until depth).map(d =>
          cmsBucketOf(d, col(tokCol), width)): _*)).as(Seq("d", "b")))
      .select(col("tok"), col("d").cast("long").as("d"), col("b"))

  def cmsEstimates(docs: DataFrame, textCol: String, depth: Int,
      width: Int, topN: Int): DataFrame = {
    // cached: the cell pass and the truth pass both consume the
    // exploded tokens
    val toks = Caching.cachedOnce(cmsToks(docs, textCol))
    val cells = cmsCellsOf(toks, depth, width)
    val truth = toks.groupBy(col("tok")).agg(count(lit(1)).as("true_n"))
      .orderBy(col("true_n").desc, col("tok").asc).limit(topN)
    // one pass over truth (posexplode) — the former depth-way union
    // re-ran the full-vocab groupBy + top-N once per sketch row
    // (ADVICE r12)
    val probes = truth
      .select(col("tok"), col("true_n"),
        posexplode(array((0 until depth).map(d =>
          cmsBucketOf(d, col("tok"), width)): _*)).as(Seq("d", "b")))
      .select(col("tok"), col("true_n"),
        col("d").cast("long").as("d"), col("b"))
    probes.join(cells, Seq("d", "b"))
      .groupBy(col("tok"), col("true_n")).agg(min(col("c")).as("est_n"))
      .select(col("tok"), col("true_n"), col("est_n"))
  }

  def cmsEstimatesSql(text: String, table: String, depth: Int,
      width: Int, topN: Int): String =
    s"""WITH toks AS (
       |  SELECT unnest(${TextAnalysis.tokensSql(text)}) AS tok FROM $table
       |  WHERE $text IS NOT NULL AND length($text) > 0),
       |cells AS (
       |  SELECT d, ${Hashing.hash60Sql("d || ':' || tok")} % $width AS b,
       |    count(*) AS c
       |  FROM toks CROSS JOIN range(0, $depth) t(d) GROUP BY 1, 2),
       |truth AS (
       |  SELECT tok, count(*) AS true_n FROM toks GROUP BY 1
       |  ORDER BY true_n DESC, tok LIMIT $topN),
       |probes AS (
       |  SELECT tok, true_n, d,
       |    ${Hashing.hash60Sql("d || ':' || tok")} % $width AS b
       |  FROM truth CROSS JOIN range(0, $depth) t(d))
       |SELECT p.tok, p.true_n::BIGINT AS true_n, min(c)::BIGINT AS est_n
       |FROM probes p JOIN cells USING (d, b)
       |GROUP BY 1, 2""".stripMargin

  def embeddingSnapshotDriftSql(vec: String, label: String, table: String,
      predSql: String): String = {
    val t1 = s"(SELECT * FROM $table WHERE $predSql)"
    val t2 = s"(SELECT * FROM $table WHERE NOT ($predSql))"
    s"""WITH c1 AS (${Similarity.centroidsSql(label, vec, t1)}),
       |c2 AS (${Similarity.centroidsSql(label, vec, t2)}),
       |n1 AS (SELECT $label AS cl, count(*) AS n_v1 FROM $table
       |       WHERE $predSql GROUP BY 1),
       |n2 AS (SELECT $label AS cl, count(*) AS n_v2 FROM $table
       |       WHERE NOT ($predSql) GROUP BY 1)
       |SELECT c1.cl AS label, n_v1, n_v2,
       |  ${Vectors.cosineMicrosSql("c1.cent", "c2.cent")} AS centroid_cos_micros
       |FROM c1 JOIN c2 ON c2.cl = c1.cl
       |JOIN n1 ON n1.cl = c1.cl
       |JOIN n2 ON n2.cl = c1.cl
       |WHERE ${Vectors.normSql("c1.cent")} > 0
       |  AND ${Vectors.normSql("c2.cent")} > 0""".stripMargin
  }
}
