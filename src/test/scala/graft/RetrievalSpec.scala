package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

/** BM25 / hybrid-fusion / semantic-dedup semantics on hand-built
  * corpora, checked against independent brute-force reference
  * implementations (plain Scala loops, no Spark).
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // vocabulary overlaps Retrieval.Queries terms ("dup", "spark",
  // "hash", "join", ...) so every fixed query matches something
  private val docs = Seq(
    (0L, "dup spark hash join merge window agg"),
    (1L, "spark spark spark hash hash join fast query scan"),
    (2L, "window agg vector window agg vector window agg"),
    (3L, "fast query scan fast query scan merge hash"),
    (4L, "dup dup dup spark merge"),
    (5L, "unrelated words entirely outside the vocabulary"))
    .toDF("doc_id", "text")

  /** Brute-force BM25 reference: same formula, same quantization,
    * implemented with plain collections.
    */
  private def bm25Reference(corpus: Seq[(Long, String)],
      queries: Seq[(Long, Seq[String])], k: Int): Seq[(Long, Long, Long, Long)] = {
    val toks = corpus.map { case (id, t) => id -> t.split("\\s+").toSeq }.toMap
    val n = corpus.size.toDouble
    val dl = toks.map { case (id, ts) => id -> ts.size.toDouble }
    val avgdl = dl.values.sum / n
    val df = toks.values.flatMap(_.distinct).groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toDouble }
    queries.flatMap { case (qid, terms) =>
      val scored = toks.keys.toSeq.flatMap { id =>
        val contribs = terms.flatMap { t =>
          val tf = toks(id).count(_ == t).toDouble
          if (tf == 0 || !df.contains(t)) None
          else {
            val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
            val c = idf * tf * (Retrieval.K1 + 1.0) /
              (tf + Retrieval.K1 * (1.0 - Retrieval.B +
                Retrieval.B * dl(id) / avgdl))
            Some(math.round(c * 1e6))
          }
        }
        if (contribs.isEmpty) None else Some(id -> contribs.sum)
      }
      scored.sortBy { case (id, s) => (-s, id) }.take(k).zipWithIndex
        .map { case ((id, s), i) => (qid, (i + 1).toLong, id, s) }
    }
  }

  test("bm25TopK matches the brute-force reference on every fixed query") {
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", k = 3)
      .select("qid", "rank", "doc_id", "score_micros")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = bm25Reference(
      Seq(0L -> "dup spark hash join merge window agg",
        1L -> "spark spark spark hash hash join fast query scan",
        2L -> "window agg vector window agg vector window agg",
        3L -> "fast query scan fast query scan merge hash",
        4L -> "dup dup dup spark merge",
        5L -> "unrelated words entirely outside the vocabulary"),
      Retrieval.Queries, k = 3).toSet
    assert(got == want)
  }

  test("bm25: rare term dominates — q0 ('dup spark') ranks the dup-heavy doc first") {
    val top = Retrieval.bm25TopK(docs, "doc_id", "text", k = 1)
      .filter(col("qid") === 0 && col("rank") === 1)
      .select("doc_id").as[Long].head()
    // doc 4 has tf(dup)=3; "dup" is in 2 of 6 docs, "spark" in 3 —
    // idf(dup) > idf(spark), so the dup-heavy doc outranks spark-heavy 1
    assert(top == 4L)
  }

  test("rrfFuse: doc in both lists beats single-list docs at equal ranks") {
    val a = Seq((0L, 1L, 10L), (0L, 2L, 11L)).toDF("qid", "rank", "doc_id")
    val b = Seq((0L, 1L, 11L), (0L, 2L, 12L)).toDF("qid", "rank", "doc_id")
    val got = Retrieval.rrfFuse(a, "doc_id", b, "doc_id", k = 3)
      .select("rank", "doc_id", "rrf_nanos", "n_lists")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val r1 = math.round(1e9 / 61)
    val r2 = math.round(1e9 / 62)
    // doc 11: rank2 in a + rank1 in b = r2 + r1; beats 10 (r1) and 12 (r2)
    assert(got == Seq((1L, 11L, r1 + r2, 2L), (2L, 10L, r1, 1L),
      (3L, 12L, r2, 1L)))
  }

  test("semanticPairs: learned blocks separate the two semantic groups") {
    // two tight direction groups in 4-d; labels seed 2 clusters
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val embs = Seq(
      (0L, v(1, 0.01, 0, 0), 0),
      (1L, v(1, 0.02, 0, 0), 0),  // near-dup of 0
      (2L, v(0.99, 0, 0.01, 0), 1), // same direction, seeded wrong
      (3L, v(0, 0, 1, 0.01), 1),
      (4L, v(0, 0.01, 1, 0), 0))  // near-dup of 3, seeded wrong
      .toDF("vec_id", "embedding", "label")
    val pairs = Dedup.semanticPairs(embs, "vec_id", "embedding", "label",
      iters = 2, threshold = 0.9)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // k-means must pull 2 into the x-group and 4 into the z-group
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)) &&
      pairs.contains((1L, 2L)) && pairs.contains((3L, 4L)))
    assert(!pairs.exists(p => Set(0L, 1L, 2L).contains(p._1) &&
      Set(3L, 4L).contains(p._2)))
    // and the components collapse to one representative per group
    val reps = Dedup.dupClusters(
      Dedup.semanticPairs(embs, "vec_id", "embedding", "label",
        iters = 2, threshold = 0.9))
      .select("id", "rep_id").as[(Long, Long)].collect().toMap
    assert(Set(0L, 1L, 2L).forall(reps(_) == 0L))
    assert(Set(3L, 4L).forall(reps(_) == 3L))
  }

  test("semanticPairs cosines equal the exact pairwise cosine") {
    def v(xs: Double*) = xs.map(_.toFloat).toArray
    val embs = Seq(
      (0L, v(1, 0.1, 0, 0), 0), (1L, v(1, 0.2, 0, 0), 0),
      (2L, v(0.9, 0.15, 0, 0), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Dedup.semanticPairs(embs, "vec_id", "embedding", "label",
      iters = 1, threshold = 0.5)
      .select("id1", "id2", "cos_micros").as[(Long, Long, Long)]
      .collect().toMap2
    def cos(a: Array[Float], b: Array[Float]): Long = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      def dot(x: Array[Double], y: Array[Double]) =
        x.zip(y).foldLeft(0.0) { case (acc, (p, q)) => acc + p * q }
      math.round(dot(ad, bd) / (math.sqrt(dot(ad, ad)) * math.sqrt(dot(bd, bd))) * 1e6)
    }
    val vecs = Map(0L -> v(1, 0.1, 0, 0), 1L -> v(1, 0.2, 0, 0),
      2L -> v(0.9, 0.15, 0, 0))
    got.foreach { case ((i, j), m) => assert(m == cos(vecs(i), vecs(j))) }
  }

  private implicit class PairMap(xs: Array[(Long, Long, Long)]) {
    def toMap2: Map[(Long, Long), Long] =
      xs.map { case (a, b, c) => (a, b) -> c }.toMap
  }
}
