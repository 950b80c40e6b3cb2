package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) for embedding columns: each dimension is
  * linearly mapped to an 8-bit code against the corpus' per-dimension
  * [min, max] range — 1 byte per dimension instead of 4 (float32), the
  * standard "cheap 4× memory cut" between full vectors and PQ's 16×.
  *
  * Search = brute-force ASYMMETRIC scan — the exact query vector
  * against midpoint RECONSTRUCTIONS of the 1-byte corpus codes
  * (x̂_d = lo_d + (code_d + ½)·span_d/255; scoring raw code dots was
  * measured and rejected: the per-dim `lo` shift makes a code dot an
  * affine-biased, non-monotone proxy for cosine — recall@5 ≈ 0.3 vs
  * ≈ 1.0 reconstructed) — then exact-cosine rerank of the
  * top-`rerank` candidates, exactly the PQ/IVF rerank contract:
  * output cosines are EXACT, only the candidate cut is approximate.
  *
  * == Determinism contract (oracle-exact, like the rest of the ANN
  * family) ==
  *
  *  - ranges are computed on MICRO-quantized values (round(x·1e6) —
  *    exact integers in doubles), so min/max agree bit-for-bit;
  *  - codes are floor((xm − lo)·255 / max(1, hi − lo)): the numerator
  *    is an exact integer < 2^30 in a double, the quotient's double
  *    rounding error (< 1e-7 relative) is smaller than the 1/(hi−lo)
  *    gap between representable quotient values, so floor is exact on
  *    both engines — both compute the identical integer code;
  *  - reconstruction and the approximate cosine are the SAME
  *    expression shape on both engines (sequential folds via the
  *    native codegen'd [[graft.functions.ArrayExprs.dotProduct]] /
  *    DuckDB list_reduce), and the candidate-cut key is quantized to
  *    micros before ranking (house ANN contract), so the cut is
  *    bit-identical.
  *
  * == 100 TB shape ==
  *
  * Training is ONE partial-aggregated shuffle of 64 (dim, min, max)
  * rows; the 64-entry range table broadcasts; encoding is a narrow
  * map co-partitioned with the scan. The scored scan is queries ⨝
  * corpus with the query side broadcast — the corpus never shuffles;
  * only the per-query rank windows see score rows. Store the codes
  * bucketed ([[Index]]-style) and the scan reads 1-byte-per-dim
  * column chunks — the IO-bound regime SQ is built for.
  */
object Sq {

  private def baseOf(embs: DataFrame, idCol: String, vecCol: String): DataFrame =
    Caching.cachedOnce(
      embs.select(col(idCol).as("id"), Vectors.toDouble(col(vecCol)).as("v"))
        .withColumn("nrm", Vectors.norm(col("v"))))

  private def microsOf(v: Column): Column = transform(v, x => round(x * 1e6))

  /** Per-dimension [lo, hi] micro ranges, one row per dimension —
    * the persistable form ([[Index]] stores this as the `sq_ranges`
    * part).
    */
  private[ops] def rangesTall(base: DataFrame): DataFrame =
    // NOTE r18: a fixed-width rewrite (2·dim min/max buffers in one
    // global agg, the centroidsExact discipline) was tried and
    // MEASURED SLOWER here — q_sim_sq4 warm 0.51→0.84 s, q_sim_sq
    // 0.66→1.04 s — because each row then evaluates 2·dim
    // element_at+round branches against the explode shape's dim rows
    // through an already partial-aggregated hash agg (the exchange
    // carries ≤ dim rows per task either way, so there was no shuffle
    // to win). Reverted to the explode shape; measurement beats
    // symmetry (guide §1.1).
    base
      .select(posexplode(microsOf(col("v"))).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))

  /** Collapse tall ranges to ONE broadcastable row of parallel arrays
    * (los, his), ordered by dimension.
    */
  private[ops] def collapseRanges(tall: DataFrame): DataFrame =
    tall
      .agg(array_sort(collect_list(struct(col("d"), col("lo"), col("hi")))).as("rs"))
      .select(
        transform(col("rs"), r => r.getField("lo")).as("los"),
        transform(col("rs"), r => r.getField("hi")).as("his"))

  private def rangesOf(base: DataFrame, dim: Int): DataFrame =
    collapseRanges(rangesTall(base))

  /** The SQ8 code array of `v` against broadcast (los, his) columns.
    * `clamp` pins out-of-range values to [0, 255] — needed when
    * encoding NEW vectors at FIXED stored ranges ([[Index]] appends);
    * a build-time encode never clamps (the ranges are the corpus
    * min/max by construction, so the guard would be dead).
    * Native codegen'd expression: the HOF form was O(dim²) per row —
    * CollapseProject inlines the micros transform into every
    * element_at lambda call — and O(dim³) once the reconstruction
    * referenced the code column (measured 45× at sf0.1).
    */
  private[ops] def codeCol(dim: Int, clamp: Boolean,
      maxCode: Double = 255.0): Column =
    graft.functions.ArrayExprs.sqEncode(col("v"), col("los"), col("his"),
      clamp, maxCode)

  /** (id, v, nrm, code, los, his): the corpus with its SQ8 code array
    * attached — a narrow map against the broadcast range row. The
    * encode HOF is interpreted (transform is CodegenFallback) but runs
    * once per corpus row at build time; the search-time hot loop is
    * the native codegen'd code dot.
    */
  private def encoded(base: DataFrame, ranges: DataFrame, dim: Int,
      maxCode: Double = 255.0): DataFrame =
    base.join(broadcast(ranges))
      .withColumn("code", codeCol(dim, clamp = false, maxCode))
      .select(col("id"), col("v"), col("nrm"), col("code"),
        col("los"), col("his"))

  /** SQ8 top-k with exact rerank.
    * Output: (qid, rank, neighbor_id, cos_micros) — exact cosines;
    * only the candidate cut (by code-dot, top-`rerank`) is approximate.
    */
  def topK(embs: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, rerank: Int, dim: Int = 64,
      levels: Int = 256): DataFrame = {
    val base = baseOf(embs, idCol, vecCol)
    val ranges = rangesOf(base, dim)
    val c = encoded(base, ranges, dim, maxCode = (levels - 1).toDouble)
    // asymmetric search: queries keep their EXACT vectors (only the
    // corpus side is quantized) — the standard SQ distance computer
    val queries = base.filter(queryPred)
      .select(col("id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))

    // the 1-byte-scan stage: score EVERY corpus code (brute-force SQ)
    cutAndRerank(base, queries,
      withRecon(c, dim, maxCode = (levels - 1).toDouble)
        .join(broadcast(queries.select(col("qid"), col("qv"), col("qnrm"))),
          col("id") =!= col("qid")),
      k, rerank)
  }

  /** IVF × SQ — the composed layout (FAISS IVF_SQ8 shape): trained-IVF
    * probing restricts the scored set to the probed centroid lists
    * (~massign·nprobe/nlist of the corpus), those candidates are
    * scored from their 1-byte SQ codes (asymmetric, reconstructed),
    * and only the top-`rerank` survivors pay an exact cosine. Both
    * halves are the already-oracle-proven components (trained cosine
    * IVF with multiple assignment; the [[topK]] SQ scorer), glued by
    * one candidate join — the same composition contract as
    * [[Pq.ivfPqTopK]], at 4× memory instead of 16× and with no
    * codebook training at all (SQ ranges are one aggregation).
    */
  def ivfSqTopK(embs: DataFrame, idCol: String, vecCol: String,
      seedCol: String, queryPred: Column, k: Int, nprobe: Int,
      itersIvf: Int, massign: Int, rerank: Int, dim: Int = 64,
      levels: Int = 256): DataFrame = {
    val base = baseOf(embs, idCol, vecCol)
    val ranges = rangesOf(base, dim)
    val c = encoded(base, ranges, dim, maxCode = (levels - 1).toDouble)
    val queries = base.filter(queryPred)
      .select(col("id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val cents = Similarity.withCNorm(
      Similarity.kmeans(embs, idCol, vecCol, seedCol, itersIvf))
    val assigned = Similarity.assignToNearest(base, cents, massign)

    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("pcos").desc, col("cl").asc)
    val probes = queries.join(broadcast(cents))
      .select(col("qid"), col("cl"),
        (Vectors.dot(col("qv"), col("cent")) / (col("qnrm") * col("cnrm"))).as("pcos"))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nprobe)
      .select(col("qid"), col("cl"))

    // candidates from the probed lists (distinct: multiple assignment
    // can reach a vector through several lists); SQ-score only these
    val candPairs = probes.join(assigned, "cl")
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id")).distinct()
    cutAndRerank(base, queries,
      candPairs.join(withRecon(c, dim, maxCode = (levels - 1).toDouble), "id")
        .join(broadcast(queries.select(col("qid"), col("qv"), col("qnrm"))), "qid"),
      k, rerank)
  }

  /** Midpoint reconstruction of the SQ code in MICRO units — all
    * inputs exact integers in doubles; identical values to the oracle
    * side's list comprehension. Needs (code, los, his) columns in
    * scope. Native codegen'd (same CollapseProject trap as
    * [[codeCol]]).
    */
  private[ops] def reconCol(dim: Int, maxCode: Double = 255.0): Column =
    graft.functions.ArrayExprs.sqRecon(col("code"), col("los"), col("his"),
      maxCode)

  /** Attach (rv, nrv) — the reconstruction and its norm — ONCE per
    * corpus row. Reconstruction depends only on the row's code and the
    * (broadcast) ranges, so computing it inside the pair scan would
    * repeat the interpreted 64-dim HOF once per (query, candidate)
    * PAIR — measured 2-3× slower at sf0.1. The pair-side hot loop is
    * then just the native codegen'd dot.
    */
  private[ops] def withRecon(c: DataFrame, dim: Int,
      maxCode: Double = 255.0): DataFrame =
    c.withColumn("rv", reconCol(dim, maxCode))
      .withColumn("nrv", Vectors.norm(col("rv")))
      .select(col("id"), col("rv"), col("nrv"))

  /** Shared search tail: score the exact query vector against each
    * candidate's precomputed reconstruction ([[withRecon]] — the
    * approximate cosine, micro-quantized for the cut), keep the
    * top-`rerank` per query, exact-cosine rerank. `scored` must carry
    * (qid, id, qv, qnrm, rv, nrv).
    */
  private[ops] def cutAndRerank(base: DataFrame, queries: DataFrame,
      scored: DataFrame, k: Int, rerank: Int): DataFrame = {
    val wCand = Window.partitionBy(col("qid"))
      .orderBy(col("akey").desc, col("id").asc)
    val cands = scored
      .select(col("qid"), col("id"),
        round(Vectors.dot(col("qv"), col("rv")) /
          (col("qnrm") * col("nrv")) * 1e6).as("akey"))
      .withColumn("crn", row_number().over(wCand))
      .filter(col("crn") <= rerank)
      .select(col("qid"), col("id"))

    val wTop = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    broadcast(cands)
      .join(base, "id")
      .join(broadcast(queries.select(col("qid"), col("qv"), col("qnrm"))), "qid")
      .select(col("qid"), col("id").as("neighbor_id"),
        (Vectors.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cos"))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("neighbor_id"),
        round(col("cos") * 1e6).cast("long").as("cos_micros"))
  }

  /** Recall@k of [[topK]] vs the brute-force truth, per query —
    * the quality audit ([[Similarity]]/[[Pq]] recall contract).
    */
  def recall(embs: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, rerank: Int, dim: Int = 64,
      levels: Int = 256): DataFrame = {
    val truth = Similarity.bruteForceTopK(embs, idCol, vecCol, queryPred, k)
      .select(col("qid"), col("neighbor_id"))
    val got = topK(embs, idCol, vecCol, queryPred, k, rerank, dim, levels)
      .select(col("qid"), col("neighbor_id"))
    truth.join(got, Seq("qid", "neighbor_id"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("hits"))
      .select(col("qid"),
        round(col("hits").cast("double") / k * 1e6).cast("long")
          .as("recall_micros"))
  }

  // ------------------------------------------------------------ oracle

  private def codeSql(xm: String, los: String, his: String, dim: Int,
      maxCode: Double = 255.0): String =
    s"[floor(($xm[i] - $los[i]) * $maxCode / greatest(1.0, $his[i] - $los[i])) " +
      s"for i in range(1, ${dim + 1})]"

  /** Shared CTE prefix: encode, score by code dot, cut to `rerank`,
    * exact-cosine the candidates (CTE `f`).
    */
  private def prefixSql(id: String, vec: String, table: String,
      queryPredSql: String, rerank: Int, dim: Int,
      maxCode: Double = 255.0): String =
    s"""WITH e AS (SELECT $id AS id, ${Vectors.toDoubleSql(vec)} AS v FROM $table),
       |x AS (SELECT id, v, [round(y * 1e6) for y in v] AS xm FROM e),
       |mm AS (
       |  SELECT d, min(xm[d + 1]) AS lo, max(xm[d + 1]) AS hi
       |  FROM x CROSS JOIN range(0, $dim) t(d) GROUP BY 1),
       |a AS (SELECT list(lo ORDER BY d) AS los, list(hi ORDER BY d) AS his
       |      FROM mm),
       |c AS (SELECT id, v, ${codeSql("xm", "los", "his", dim, maxCode)} AS code,
       |        los, his
       |      FROM x, a),
       |q AS (SELECT id AS qid, v AS qv, ${Vectors.normSql("v")} AS qnrm
       |      FROM x WHERE $queryPredSql),
       |s AS (
       |  SELECT qid, id, qv, nv, round(${Vectors.dotSql("qv", "rv")} /
       |      (qnrm * ${Vectors.normSql("rv")}) * 1e6) AS akey
       |  FROM (
       |    SELECT qid, c.id AS id, qv, qnrm, c.v AS nv,
       |      [c.los[i] + (c.code[i] + 0.5) * greatest(1.0, c.his[i] - c.los[i]) / $maxCode
       |       for i in range(1, ${dim + 1})] AS rv
       |    FROM q JOIN c ON c.id <> qid)),
       |cand AS (
       |  SELECT qid, id, qv, nv FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid
       |      ORDER BY akey DESC, id) AS crn FROM s) WHERE crn <= $rerank),
       |f AS (
       |  SELECT qid, id AS neighbor_id, ${Vectors.cosineSql("qv", "nv")} AS cos
       |  FROM cand),
       |r AS (SELECT qid, neighbor_id, cos, row_number() OVER (
       |        PARTITION BY qid ORDER BY cos DESC, neighbor_id) AS rank FROM f)""".stripMargin

  def topKSql(id: String, vec: String, table: String,
      queryPredSql: String, k: Int, rerank: Int, dim: Int = 64,
      levels: Int = 256): String =
    s"""${prefixSql(id, vec, table, queryPredSql, rerank, dim,
          (levels - 1).toDouble)}
       |SELECT qid, rank::BIGINT AS rank, neighbor_id,
       |  round(cos * 1e6)::BIGINT AS cos_micros
       |FROM r WHERE rank <= $k""".stripMargin

  /** DuckDB twin of [[ivfSqTopK]]: the trained-IVF prefix
    * ([[Similarity.ivfTrainedPrefixSql]] — e, trained cents, massign
    * assignment af, queries q) + the SQ encode over the SAME `e`, with
    * reconstruction scoring restricted to the probed candidates.
    */
  def ivfSqTopKSql(id: String, vec: String, seed: String, table: String,
      queryPredSql: String, k: Int, nprobe: Int, itersIvf: Int,
      massign: Int, rerank: Int, dim: Int = 64,
      levels: Int = 256): String = {
    val maxCode = (levels - 1).toDouble
    s"""${Similarity.ivfTrainedPrefixSql(id, vec, seed, table, queryPredSql,
          k, itersIvf, dim, massign)},
       |x AS (SELECT id, v, [round(y * 1e6) for y in v] AS xm FROM e),
       |mm AS (
       |  SELECT d, min(xm[d + 1]) AS lo, max(xm[d + 1]) AS hi
       |  FROM x CROSS JOIN range(0, $dim) t(d) GROUP BY 1),
       |rng AS (SELECT list(lo ORDER BY d) AS los, list(hi ORDER BY d) AS his
       |        FROM mm),
       |sqc AS (SELECT id, v, ${codeSql("xm", "los", "his", dim, maxCode)} AS code,
       |          los, his
       |        FROM x, rng),
       |probes AS (
       |  SELECT qid, cl FROM (
       |    SELECT q.qid, c.cl, row_number() OVER (PARTITION BY q.qid
       |      ORDER BY ${Vectors.cosineSql("q.qv", "c.cent")} DESC, c.cl) AS prn
       |    FROM q CROSS JOIN cents$itersIvf c) WHERE prn <= $nprobe),
       |candp AS (
       |  SELECT DISTINCT p.qid, a.id FROM probes p JOIN af a ON a.cl = p.cl
       |  WHERE a.id <> p.qid),
       |s AS (
       |  SELECT qid, id, qv, nv, round(${Vectors.dotSql("qv", "rv")} /
       |      (qnrm * ${Vectors.normSql("rv")}) * 1e6) AS akey
       |  FROM (
       |    SELECT cp.qid, cp.id, q.qv, q.qnrm, c.v AS nv,
       |      [c.los[i] + (c.code[i] + 0.5) * greatest(1.0, c.his[i] - c.los[i]) / $maxCode
       |       for i in range(1, ${dim + 1})] AS rv
       |    FROM candp cp JOIN sqc c ON c.id = cp.id JOIN q ON q.qid = cp.qid)),
       |cand AS (
       |  SELECT qid, id, qv, nv FROM (
       |    SELECT *, row_number() OVER (PARTITION BY qid
       |      ORDER BY akey DESC, id) AS crn FROM s) WHERE crn <= $rerank),
       |f AS (
       |  SELECT qid, id AS neighbor_id, ${Vectors.cosineSql("qv", "nv")} AS cos
       |  FROM cand),
       |r AS (SELECT qid, neighbor_id, cos, row_number() OVER (
       |        PARTITION BY qid ORDER BY cos DESC, neighbor_id) AS rank FROM f)
       |SELECT qid, rank::BIGINT AS rank, neighbor_id,
       |  round(cos * 1e6)::BIGINT AS cos_micros
       |FROM r WHERE rank <= $k""".stripMargin
  }

  /** Twin of [[recall]]: the truth ranking reuses the prefix's `e`/`q`
    * CTEs; hits join INNER (a zero-hit query drops out on both
    * engines — the Spark semi-join + groupBy does the same).
    */
  def recallSql(id: String, vec: String, table: String,
      queryPredSql: String, k: Int, rerank: Int, dim: Int = 64,
      levels: Int = 256): String =
    s"""${prefixSql(id, vec, table, queryPredSql, rerank, dim,
          (levels - 1).toDouble)},
       |got AS (SELECT qid, neighbor_id FROM r WHERE rank <= $k),
       |tsc AS (
       |  SELECT qid, e.id AS neighbor_id, ${Vectors.cosineSql("qv", "e.v")} AS cos
       |  FROM q JOIN e ON e.id <> qid),
       |truth AS (
       |  SELECT qid, neighbor_id FROM (
       |    SELECT qid, neighbor_id, row_number() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, neighbor_id) AS rank FROM tsc) WHERE rank <= $k)
       |SELECT t.qid, round(count(*)::DOUBLE / $k * 1e6)::BIGINT AS recall_micros
       |FROM truth t JOIN got g USING (qid, neighbor_id)
       |GROUP BY 1""".stripMargin
}
