package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary quantization (BQ / sign quantization) for embedding
  * columns: each dimension collapses to its SIGN bit, the whole
  * 64-dim vector packs into ONE 64-bit word — a 32× memory cut vs
  * float32, the coarsest tier of the ANN ladder (flat 1× / SQ8 4× /
  * PQ 16× / BQ 32×). Candidate scoring is Hamming distance between
  * packed words — `bit_count(a ^ b)`, two ALU ops per pair inside
  * whole-stage codegen, no arrays touched — followed by the family's
  * standard exact-cosine rerank of the top-`rerank` survivors
  * (output cosines are EXACT; only the candidate cut is approximate).
  * Sign-bit Hamming is a monotone proxy for angular distance on
  * roughly-centered data (the random-hyperplane LSH bound with the
  * coordinate axes as hyperplanes — [[Similarity.rpLshPairs]] is the
  * same geometry with random planes).
  *
  * == Determinism contract ==
  *
  * Everything before the exact rerank is INTEGER: the code is a
  * disjoint-bit OR-fold (order-free), Hamming is a popcount, and the
  * cut ranks by (hamming asc, id asc) — bit-identical on any engine.
  * The oracle spells Hamming as the unpacked sign-mismatch count over
  * the same doubles — same integer by construction; packing is the
  * ENGINE's representation choice, not part of the semantics.
  *
  * == 100 TB shape ==
  *
  * Packing is a narrow map co-partitioned with the scan (one long out
  * per row). Search scans 8 BYTES per corpus vector — a 100 TB float
  * corpus is a 3 TB BQ sweep, memory-resident on a modest cluster —
  * with the query side broadcast, the corpus never shuffling, and
  * only (qid, id, hamming) longs reaching the rank window. The exact
  * rerank touches ≤ rerank × |queries| full vectors by id.
  */
object Bq {

  private def baseOf(embs: DataFrame, idCol: String, vecCol: String): DataFrame =
    Caching.cachedOnce(
      embs.select(col(idCol).as("id"), Vectors.toDouble(col(vecCol)).as("v"))
        .withColumn("nrm", Vectors.norm(col("v"))))

  /** Sign-bit pack of the array column named `vName` (dim ≤ 64) into
    * one long: bit d set iff v[d] > 0. Disjoint bits OR-fold —
    * order-free, overflow-free. (SQL-expr form: the DSL's shiftleft
    * only takes a literal shift, and the lambda needs a per-element
    * one.)
    */
  def packCol(vName: String, dim: Int): Column = {
    require(dim <= 64, s"one-word BQ packs at most 64 dims, got $dim")
    // guard: a vector LONGER than `dim` would zip against a NULL index,
    // shiftleft(1L, NULL) = NULL, and the OR-fold would silently turn
    // every code (hence every Hamming distance) NULL — fail loud instead.
    // A NULL VECTOR stays a NULL code (explicit first branch: without
    // it, size(NULL) is NULL under ANSI, the IF condition is NULL, and
    // the else branch would raise_error with a NULL message).
    expr(s"IF($vName IS NULL, CAST(NULL AS BIGINT), " +
      s"IF(size($vName) <= $dim, " +
      s"aggregate(zip_with($vName, sequence(0, ${dim - 1}), " +
      "(x, i) -> IF(x > 0D, shiftleft(1L, i), 0L)), 0L, (a, b) -> a | b), " +
      s"raise_error(concat('BQ packCol: vector of ', cast(size($vName) AS STRING), " +
      s"' dims exceeds dim=$dim'))))")
  }

  /** The Hamming cut + exact rerank over an already-packed corpus —
    * shared by the in-plan [[topK]] and the persisted-index BQ tier
    * ([[Index.searchBq]], which reads `packed` from the stored
    * bq_codes part instead of packing in-plan). `packed` is
    * (id, code), `qPacked` (qid, qcode), `base` (id, v, nrm) for the
    * rerank, `queries` (qid, qv, qnrm).
    */
  private[graft] def cutAndRerank(packed: DataFrame, qPacked: DataFrame,
      base: DataFrame, queries: DataFrame, k: Int, rerank: Int): DataFrame = {
    // the 8-byte sweep: every corpus word against every (broadcast)
    // query word — the hot loop is xor+popcount in codegen
    val wCand = Window.partitionBy(col("qid"))
      .orderBy(col("ham").asc, col("id").asc)
    val cands = packed.join(broadcast(qPacked), col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        expr("bit_count(code ^ qcode)").as("ham"))
      .withColumn("crn", row_number().over(wCand))
      .filter(col("crn") <= rerank)
      .select(col("qid"), col("id"))

    // family-standard exact rerank: ≤ rerank × |queries| candidates
    // broadcast, the corpus joined by id — never shuffled
    val wTop = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    broadcast(cands)
      .join(base, "id")
      .join(broadcast(queries), "qid")
      .select(col("qid"), col("id").as("neighbor_id"),
        (Vectors.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cos"))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("neighbor_id"),
        round(col("cos") * 1e6).cast("long").as("cos_micros"))
  }

  /** BQ top-k with exact rerank.
    * Output: (qid, rank, neighbor_id, cos_micros) — exact cosines;
    * only the candidate cut (by Hamming, top-`rerank`) is approximate.
    */
  def topK(embs: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, rerank: Int, dim: Int = 64): DataFrame = {
    val base = baseOf(embs, idCol, vecCol)
    val packed = base.select(col("id"), packCol("v", dim).as("code"))
    val queries = base.filter(queryPred)
      .select(col("id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val qPacked = base.filter(queryPred)
      .select(col("id").as("qid"), packCol("v", dim).as("qcode"))
    cutAndRerank(packed, qPacked, base, queries, k, rerank)
  }

  /** Recall@k of [[topK]] vs the brute-force truth, per query.
    * Truth LEFT JOIN got (matching [[recallSql]]): a query whose BQ
    * cut misses ALL k true neighbors still emits (qid, 0) — worst-case
    * queries stay visible instead of silently dropping out and
    * inflating the reported recall.
    */
  def recall(embs: DataFrame, idCol: String, vecCol: String,
      queryPred: Column, k: Int, rerank: Int, dim: Int = 64): DataFrame = {
    val truth = Similarity.bruteForceTopK(embs, idCol, vecCol, queryPred, k)
      .select(col("qid"), col("neighbor_id"))
    val got = topK(embs, idCol, vecCol, queryPred, k, rerank, dim)
      .select(col("qid"), col("neighbor_id"), lit(1).as("hit"))
    truth.join(got, Seq("qid", "neighbor_id"), "left")
      .groupBy(col("qid")).agg(count(col("hit")).as("hits"))
      .select(col("qid"),
        round(col("hits").cast("double") / k * 1e6).cast("long")
          .as("recall_micros"))
  }

  // ------------------------------------------------------------ oracle

  /** Hamming as the UNPACKED sign-mismatch count — same integer as
    * the packed popcount, spelled without the engine's word layout.
    */
  private def hamSql(a: String, b: String, dim: Int): String =
    s"len([i for i in range(1, ${dim + 1}) if ($a[i] > 0) <> ($b[i] > 0)])"

  private def prefixSql(id: String, vec: String, table: String,
      queryPredSql: String, rerank: Int, dim: Int): String =
    s"""WITH e AS (SELECT $id AS id, ${Vectors.toDoubleSql(vec)} AS v FROM $table),
       |q AS (SELECT id AS qid, v AS qv, ${Vectors.normSql("v")} AS qnrm
       |      FROM e WHERE $queryPredSql),
       |cut AS (
       |  SELECT qid, id FROM (
       |    SELECT q.qid, e.id, row_number() OVER (PARTITION BY q.qid
       |      ORDER BY ${hamSql("q.qv", "e.v", dim)} ASC, e.id) AS crn
       |    FROM q JOIN e ON e.id <> q.qid) WHERE crn <= $rerank),
       |f AS (
       |  SELECT c.qid, e.id AS neighbor_id,
       |    ${Vectors.cosineSql("q2.qv", "e.v")} AS cos
       |  FROM cut c JOIN e ON e.id = c.id JOIN q q2 ON q2.qid = c.qid)""".stripMargin

  /** DuckDB twin of [[topK]]. */
  def topKSql(id: String, vec: String, table: String, queryPredSql: String,
      k: Int, rerank: Int, dim: Int): String =
    s"""${prefixSql(id, vec, table, queryPredSql, rerank, dim)}
       |SELECT qid, rank, neighbor_id, cos_micros FROM (
       |  SELECT qid, row_number() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, neighbor_id)::BIGINT AS rank,
       |    neighbor_id, round(cos * 1e6)::BIGINT AS cos_micros
       |  FROM f)
       |WHERE rank <= $k""".stripMargin

  /** DuckDB twin of [[recall]]. */
  def recallSql(id: String, vec: String, table: String, queryPredSql: String,
      k: Int, rerank: Int, dim: Int): String =
    s"""${prefixSql(id, vec, table, queryPredSql, rerank, dim)},
       |got AS (
       |  SELECT qid, neighbor_id FROM (
       |    SELECT qid, neighbor_id, row_number() OVER (PARTITION BY qid
       |      ORDER BY cos DESC, neighbor_id) AS rank FROM f)
       |  WHERE rank <= $k),
       |truth AS (
       |  SELECT qid, neighbor_id FROM (
       |    SELECT q.qid, e.id AS neighbor_id, row_number() OVER (
       |      PARTITION BY q.qid
       |      ORDER BY ${Vectors.cosineSql("q.qv", "e.v")} DESC, e.id) AS rank
       |    FROM q JOIN e ON e.id <> q.qid) WHERE rank <= $k)
       |SELECT t.qid AS qid,
       |  round(count(g.neighbor_id)::DOUBLE / $k * 1e6)::BIGINT AS recall_micros
       |FROM truth t LEFT JOIN got g
       |  ON t.qid = g.qid AND t.neighbor_id = g.neighbor_id
       |GROUP BY 1""".stripMargin
}
