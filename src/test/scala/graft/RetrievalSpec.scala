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

  test("bm25 pruning: a corpus-covering budget equals full BM25 exactly; " +
      "m=1 keeps only each term's top-impact posting") {
    // m >= max df: nothing pruned — output must be BIT-identical
    val full = Retrieval.bm25TopK(docs, "doc_id", "text", k = 3)
      .select("qid", "rank", "doc_id", "score_micros")
      .as[(Long, Long, Long, Long)].collect().toSet
    val wide = Retrieval.bm25PrunedTopK(docs, "doc_id", "text", k = 3, m = 6)
      .select("qid", "rank", "doc_id", "score_micros")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(wide == full)
    // m=1: per term only the highest-contribution posting survives —
    // q0's 'dup' keeps doc 4 (tf=3 beats doc 0's tf=1), so doc 4
    // still tops the pruned ranking and recall@1 for q0 stays 1.0
    val pruned1 = Retrieval.bm25PrunedTopK(docs, "doc_id", "text",
        k = 1, m = 1)
      .filter(col("qid") === 0 && col("rank") === 1)
      .select("doc_id").as[Long].head()
    assert(pruned1 == 4L)
    val rec = Retrieval.bm25PrunedRecall(docs, "doc_id", "text",
        k = 3, m = 6)
      .select("recall_micros").as[Long].collect()
    assert(rec.forall(_ == 1000000L)) // unpruned budget -> recall 1.0
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

  test("dsirWeights: target-like docs score higher; brute-force reference matches") {
    val corpus = Seq(
      (0L, "alpha beta alpha beta", true),   // target style
      (1L, "alpha beta gamma", true),
      (2L, "delta epsilon zeta", false),
      (3L, "alpha beta alpha", false),       // raw doc that LOOKS like target
      (4L, "delta epsilon delta epsilon", false))
      .toDF("doc_id", "text", "is_tgt")
    val nB = 64
    val got = Curation.dsirWeights(corpus, "doc_id", "text",
        col("is_tgt"), nB)
      .select("doc_id", "n_feats", "logw_micros")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    // brute-force reference with plain collections
    def grams(t: String): Seq[String] = {
      val ts = t.split("\\s+").toSeq
      ts ++ ts.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    val rows = Seq(
      (0L, "alpha beta alpha beta", true), (1L, "alpha beta gamma", true),
      (2L, "delta epsilon zeta", false), (3L, "alpha beta alpha", false),
      (4L, "delta epsilon delta epsilon", false))
    val feats = rows.flatMap { case (id, t, tgt) =>
      grams(t).map(g => (id, tgt, h60(g) % nB))
    }
    val rTot = feats.size.toDouble + nB
    val tTot = feats.count(_._2).toDouble + nB
    val byB = feats.groupBy(_._3)
    val lr = byB.map { case (b, fs) =>
      b -> math.round(math.log(((fs.count(_._2) + 1) / tTot) /
        ((fs.size + 1) / rTot)) * 1e6)
    }
    val want = feats.groupBy(_._1).map { case (id, fs) =>
      id -> (fs.size.toLong, fs.map(f => lr(f._3)).sum)
    }
    assert(got == want)
    // the target-style raw doc outweighs the off-target docs
    assert(got(3L)._2 > got(2L)._2 && got(3L)._2 > got(4L)._2)
  }

  test("scoreDsirFrozen on the stats corpus reproduces dsirWeights exactly") {
    val corpus = Seq(
      (0L, "alpha beta alpha beta", "t"), (1L, "alpha beta gamma", "t"),
      (2L, "delta epsilon zeta", "r"), (3L, "alpha beta alpha", "r"))
      .toDF("doc_id", "text", "src")
    val nB = 64
    val lr = Curation.freezeDsir(corpus, "doc_id", "text",
      col("src") === "t", nB)
    val frozen = Curation.scoreDsirFrozen(corpus, "text", lr)
      .select("doc_id", "n_feats", "logw_micros")
      .as[(Long, Long, Long)].collect().toSet
    val batch = Curation.dsirWeights(corpus, "doc_id", "text",
        col("src") === "t", nB)
      .select("doc_id", "n_feats", "logw_micros")
      .as[(Long, Long, Long)].collect().toSet
    assert(frozen == batch)
  }

  test("streaming dsirGate drops off-target docs, keeps target-like ones") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (0L, "alpha beta alpha beta", "t"), (1L, "alpha beta gamma", "t"),
      (2L, "delta epsilon zeta", "r"), (3L, "omega psi chi", "r"))
      .toDF("doc_id", "text", "src")
    val lr = Curation.freezeDsir(corpus, "doc_id", "text",
      col("src") === "t", 64)
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.Pipeline.dsirGate(
        input.toDF().toDF("doc_id", "text"), lr, minLogwMicros = 1L)
      .writeStream.format("memory").queryName("dsir_out")
      .outputMode("append").start()
    input.addData(Seq((100L, "alpha beta alpha"), (101L, "delta epsilon zeta")))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("dsir_out").select("doc_id").as[Long]
      .collect().toSet
    assert(kept == Set(100L)) // target-like survives, off-target drops
    spark.sql("DROP TABLE IF EXISTS dsir_out")
  }

  test("nbPredict: brute-force reference matches scores, predictions, confusion") {
    val rows = Seq(
      (0L, "alpha beta alpha beta gamma", "A"),
      (1L, "alpha beta gamma", "A"),
      (2L, "delta epsilon zeta delta", "B"),
      (3L, "delta zeta epsilon", "B"),
      (4L, "alpha beta gamma beta", "A"),   // held out
      (5L, "epsilon delta zeta", "B"))      // held out
    val corpus = rows.toDF("doc_id", "text", "source")
    val nB = 64
    val got = Curation.nbPredict(corpus, "doc_id", "text", "source",
        col("doc_id") <= 3, nB)
      .select("doc_id", "label", "split", "predicted")
      .as[(Long, String, String, String)].collect().toSet

    // plain-collections reference of the exact integer formula
    val want = PlainRefs.nbReference(rows, _ <= 3, nB)
    assert(got == want)
    // the disjoint-vocabulary held-out docs classify correctly
    assert(got.contains((4L, "A", "eval", "A")))
    assert(got.contains((5L, "B", "eval", "B")))

    val conf = Curation.nbConfusion(corpus, "doc_id", "text", "source",
        col("doc_id") <= 3, nB)
      .select("label", "predicted", "split", "n_docs")
      .as[(String, String, String, Long)].collect().toSet
    val wantConf = want.groupBy(r => (r._2, r._4, r._3))
      .map { case ((l, p, s), rs) => (l, p, s, rs.size.toLong) }.toSet
    assert(conf == wantConf)
  }

  test("nbPredict ties break to the smallest label; NULL text scores prior-only") {
    // identical training text per class -> every score ties across
    // classes -> predicted must be the lexicographically smallest
    val corpus = Seq(
      (0L, Some("x y z"), "B"), (1L, Some("x y z"), "A"),
      (2L, Some("x y"), "B"), (3L, None: Option[String], "B"))
      .toDF("doc_id", "text", "source")
    val got = Curation.nbPredict(corpus, "doc_id", "text", "source",
        col("doc_id") <= 1, 32)
      .select("doc_id", "predicted").as[(Long, String)].collect().toMap
    assert(got == Map(0L -> "A", 1L -> "A", 2L -> "A", 3L -> "A"))
  }

  test("nbTopGrams: plain reference matches; class-exclusive grams rank top") {
    val rows = Seq(
      (0L, "alpha beta alpha", "A"), (1L, "alpha gamma beta", "A"),
      (2L, "delta epsilon zeta", "B"), (3L, "delta zeta zeta", "B"))
    val nB = 64
    val m = 3
    val got = Curation.nbTopGrams(rows.toDF("doc_id", "text", "source"),
        "doc_id", "text", "source", col("doc_id") >= 0, nB, m)
      .select("c_label", "gram", "lr_micros", "rank")
      .as[(String, String, Long, Long)].collect().toSet

    // plain reference of the exact bucket log-ratio formula
    val want = PlainRefs.nbTopGramsReference(rows, _ >= 0, nB, m)
    assert(got == want)
    // the class-exclusive vocabularies surface as their class's top grams
    val topA = got.filter(r => r._1 == "A" && r._4 == 1L).map(_._2)
    assert(topA.forall(g => g.contains("alpha") || g.contains("beta")
      || g.contains("gamma")))
  }

  test("scoreNbFrozen reproduces nbPredict; streaming nbGate keeps the kept class") {
    val corpus = Seq(
      (0L, Some("alpha beta alpha gamma"), "A"),
      (1L, Some("alpha beta gamma"), "A"),
      (2L, Some("delta epsilon zeta"), "B"),
      (3L, Some("delta zeta epsilon delta"), "B"),
      (4L, Some("alpha gamma beta"), "A"),
      (5L, None: Option[String], "B"))
      .toDF("doc_id", "text", "source")
    val nB = 64
    val trainPred = col("doc_id") <= 3
    val model = Curation.freezeNb(corpus, "doc_id", "text", "source",
      trainPred, nB)
    assert(model.labels == IndexedSeq("A", "B")) // sorted
    val frozen = Curation.scoreNbFrozen(corpus, "text", model)
      .select("doc_id", "predicted").as[(Long, String)].collect().toMap
    val batch = Curation.nbPredict(corpus, "doc_id", "text", "source",
        trainPred, nB)
      .select("doc_id", "predicted").as[(Long, String)].collect().toMap
    assert(frozen == batch) // includes the NULL-text prior-only doc

    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.Pipeline.nbGate(
        input.toDF().toDF("doc_id", "text"), model, keep = Set("A"))
      .writeStream.format("memory").queryName("nb_out")
      .outputMode("append").start()
    input.addData(Seq((100L, "alpha beta gamma"), (101L, "delta epsilon zeta")))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("nb_out").select("doc_id", "predicted")
      .as[(Long, String)].collect().toSet
    assert(kept == Set((100L, "A"))) // the B-styled doc dropped
    spark.sql("DROP TABLE IF EXISTS nb_out")
  }

  test("lmScore: fluent-by-reference text scores lower ce; brute-force matches") {
    val corpus = Seq(
      (0L, "alpha beta gamma alpha beta", "en"),  // reference style
      (1L, "alpha beta gamma delta", "en"),
      (2L, "beta alpha gamma beta alpha", "xx"),  // seen words, unseen order
      (3L, "omega psi chi phi", "xx"),            // fully out of model
      (4L, "alpha beta gamma", "xx"))             // reference-like raw doc
      .toDF("doc_id", "text", "lang")
    val nB = 64
    val got = TextAnalysis.lmScore(corpus, "doc_id", "text",
        col("lang") === "en", nB)
      .select("doc_id", "n_bigrams", "logp_micros", "ce_micros")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

    // brute-force reference with plain collections
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(15), 16)
    }
    val rows = Seq(
      (0L, "alpha beta gamma alpha beta", true),
      (1L, "alpha beta gamma delta", true),
      (2L, "beta alpha gamma beta alpha", false),
      (3L, "omega psi chi phi", false),
      (4L, "alpha beta gamma", false))
    def pairs(t: String): Seq[(Long, Long)] = {
      val ts = t.split("\\s+").toSeq
      ts.sliding(2).filter(_.size == 2).toSeq
        .map(w => (h60(w.head) % nB, h60(w.mkString(" ")) % nB))
    }
    val refPairs = rows.filter(_._3).flatMap(r => pairs(r._2))
    val cnt1 = refPairs.groupBy(_._1).map { case (c, xs) => c -> xs.size }
    val cnt2 = refPairs.groupBy(_._2).map { case (e, xs) => e -> xs.size }
    val want = rows.map { case (id, t, _) =>
      val lps = pairs(t).map { case (c, e) =>
        math.round(math.log((cnt2.getOrElse(e, 0) + 1).toDouble /
          (cnt1.getOrElse(c, 0) + nB)) * 1e6)
      }
      id -> (lps.size.toLong, lps.sum,
        math.round(-lps.sum.toDouble / lps.size))
    }.toMap
    assert(got == want)
    // the reference-like raw doc reads as more fluent than the
    // scrambled and the out-of-model docs
    assert(got(4L)._3 < got(2L)._3 && got(4L)._3 < got(3L)._3)
  }

  test("scoreLmFrozen on the stats corpus reproduces lmScore exactly") {
    val corpus = Seq(
      (0L, "alpha beta gamma alpha beta", "en"),
      (1L, "alpha beta gamma delta", "en"),
      (2L, "omega psi chi phi", "xx"),
      (3L, "alpha beta gamma", "xx"),
      (4L, "solo", "xx"))  // < 2 tokens: absent from batch, n=0 frozen
      .toDF("doc_id", "text", "lang")
    val nB = 64
    val model = TextAnalysis.freezeLm(corpus, "text", col("lang") === "en", nB)
    val frozen = TextAnalysis.scoreLmFrozen(corpus, "text", model)
      .filter(col("n_bigrams") > 0)
      .select("doc_id", "n_bigrams", "logp_micros", "ce_micros")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = TextAnalysis.lmScore(corpus, "doc_id", "text",
        col("lang") === "en", nB)
      .select("doc_id", "n_bigrams", "logp_micros", "ce_micros")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(frozen == batch && batch.size == 4)
    // the too-short doc is present in the frozen (narrow-map) output
    // with no events and a null ce
    val solo = TextAnalysis.scoreLmFrozen(corpus, "text", model)
      .filter(col("doc_id") === 4L)
      .select(col("n_bigrams"), col("ce_micros").isNull).head
    assert(solo.getLong(0) == 0L && solo.getBoolean(1))
  }

  test("streaming lmGate drops gibberish, passes fluent and too-short docs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val reference = Seq(
      (0L, "alpha beta gamma alpha beta gamma", "en"),
      (1L, "alpha beta gamma delta alpha beta", "en"))
      .toDF("doc_id", "text", "lang")
    val model = TextAnalysis.freezeLm(reference, "text",
      col("lang") === "en", 64)
    // cutoff between the in-model (~3.0e6 micro-nats) and fully
    // out-of-model (~ln(nB)·1e6 ≈ 4.16e6) cross-entropies
    val maxCe = 3500000L
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.Pipeline.lmGate(
        input.toDF().toDF("doc_id", "text"), model, maxCeMicros = maxCe)
      .writeStream.format("memory").queryName("lm_out")
      .outputMode("append").start()
    input.addData(Seq(
      (100L, "alpha beta gamma alpha"),   // fluent under the model
      (101L, "omega psi chi phi zeta"),   // gibberish to the model
      (102L, "solo")))                    // unscoreable: passes
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("lm_out").select("doc_id").as[Long]
      .collect().toSet
    assert(kept == Set(100L, 102L))
    spark.sql("DROP TABLE IF EXISTS lm_out")
  }

  test("keepBestQuality keeps the best-quality cluster member and all singles") {
    // 0/1/2 are one near-dup cluster (2 is the long, high-quality
    // copy); 3 is unrelated and must survive untouched
    val dupDocs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy cat"),
      (2L, "the quick brown fox jumps over the lazy dog and then keeps " +
        "running through the quiet field toward a distant river bank"),
      (3L, "completely different words about spark engines here today"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(dupDocs, "doc_id", "text",
      k = 3, numHashes = 32, bands = 8, rows = 4, threshold = 0.2)
    val comp = Dedup.dupClusters(pairs)
      .select("id", "rep_id").as[(Long, Long)].collect()
    val clustered = comp.map(_._1).toSet
    assert(clustered.contains(0L) && clustered.contains(1L))
    val out = Dedup.keepBestQuality(dupDocs, "doc_id", "text", pairs)
      .select("doc_id", "n_dropped").as[(Long, Long)].collect().toMap
    // one survivor per cluster: the max-quality member (ties: lower id)
    val q = dupDocs.select(col("doc_id"),
      graft.ops.TextAnalysis.qualityMicros(col("text")).as("q"))
      .as[(Long, Long)].collect().toMap
    for ((_, members) <- comp.groupBy(_._2)) {
      val ids = members.map(_._1)
      val want = ids.minBy(i => (-q(i), i))
      val survivors = out.keySet.intersect(ids.toSet)
      assert(survivors == Set(want))
      assert(out(want) == ids.size - 1)
    }
    // unclustered docs survive with zero drops; totals add up
    assert(out(3L) == 0L)
    assert(out.keySet.size + out.values.sum == 4L)
  }

  test("chunkWindows: overlap, tail rule, and reconstruction match a reference") {
    val fixture = Seq(
      (0L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 toks: 3 windows @ stride 4
      (1L, "a b"),                                    // short doc: one whole chunk
      (2L, (1 to 8).map(i => s"t$i").mkString(" ")))  // tail fragment < min drops
      .toDF("doc_id", "text")
    val got = Curation.chunkWindows(fixture, "doc_id", "text",
        chunkLen = 6, stride = 4, minTokens = 3)
      .select("doc_id", "chunk_idx", "start_tok", "n_tokens", "text")
      .as[(Long, Long, Long, Long, String)].collect().toSet
    def ref(id: Long, t: String): Seq[(Long, Long, Long, Long, String)] = {
      val ts = t.split("\\s+").toSeq
      (1 to math.max(ts.size, 1) by 4).map { s =>
        val ch = ts.slice(s - 1, s - 1 + 6)
        (id, ((s - 1) / 4).toLong, s.toLong, ch.size.toLong, ch.mkString(" "))
      }.filter(c => c._4 >= 3 || c._3 == 1)
    }
    val want = (ref(0L, (1 to 10).map(i => s"w$i").mkString(" "))
      ++ ref(1L, "a b") ++ ref(2L, (1 to 8).map(i => s"t$i").mkString(" "))).toSet
    assert(got == want)
    // doc 0: windows at 1, 5, 9 — the last has 2 toks < 3 and drops
    assert(got.count(_._1 == 0L) == 2)
    assert(got.exists(c => c._1 == 1L && c._4 == 2L)) // short doc kept whole
  }

  test("chunkWindows is streaming-compatible as-is (stateless narrow map)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq((0L, (1 to 10).map(i => s"w$i").mkString(" ")), (1L, "a b"))
    val input = MemoryStream[(Long, String)]
    val q = Curation.chunkWindows(input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", chunkLen = 6, stride = 4, minTokens = 3)
      .writeStream.format("memory").queryName("chunk_out")
      .outputMode("append").start()
    input.addData(rows)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("chunk_out")
      .select("doc_id", "chunk_idx", "start_tok", "n_tokens", "text")
      .as[(Long, Long, Long, Long, String)].collect().toSet
    val batch = Curation.chunkWindows(rows.toDF("doc_id", "text"),
        "doc_id", "text", chunkLen = 6, stride = 4, minTokens = 3)
      .select("doc_id", "chunk_idx", "start_tok", "n_tokens", "text")
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
    spark.sql("DROP TABLE IF EXISTS chunk_out")
  }

  test("scoreFrozen on the corpus itself reproduces bm25TopK's scores") {
    val stats = Retrieval.freezeStats(docs, "doc_id", "text")
    val frozen = Retrieval.scoreFrozen(docs, "text", stats, 1L)
      .select(col("qid"), col("doc_id"), col("score_micros"))
      .as[(Long, Long, Long)].collect()
      .map { case (q, d, s) => (q, d) -> s }.toMap
    // k = 10 > corpus size, so the ranking carries every scored doc
    val ranked = Retrieval.bm25TopK(docs, "doc_id", "text", k = 10)
      .select(col("qid"), col("doc_id"), col("score_micros"))
      .as[(Long, Long, Long)].collect()
      .map { case (q, d, s) => (q, d) -> s }.toMap
    assert(frozen == ranked)
  }

  test("streaming keyword gate == batch scoreFrozen on the same docs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val stats = Retrieval.freezeStats(docs, "doc_id", "text")
    val newDocs = Seq(
      (100L, "dup spark dup"),
      (101L, "hash join"),
      (102L, "nothing matching at all"))
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.Pipeline.keywordGate(
        input.toDF().toDF("doc_id", "text"), stats, minScoreMicros = 1L)
      .writeStream.format("memory").queryName("kw_out")
      .outputMode("append").start()
    input.addData(newDocs.take(2))
    q.processAllAvailable()
    input.addData(newDocs.drop(2))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("kw_out")
      .select("qid", "doc_id", "score_micros")
      .as[(Long, Long, Long)].collect().toSet
    val batch = Retrieval.scoreFrozen(
        newDocs.toDF("doc_id", "text"), "text", stats, 1L)
      .select(col("qid"), col("doc_id"), col("score_micros"))
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(!streamed.exists(_._2 == 102L)) // unmatched doc absent
    assert(streamed.exists(_._2 == 100L))
    spark.sql("DROP TABLE IF EXISTS kw_out")
  }
  test("PRF expansion pulls in a doc that never uses the query's literal terms") {
    // q0 = ("dup", "spark"). The spark-docs all talk about "engine",
    // so PRF harvests it; doc 20 uses ONLY that vocabulary.
    val prfDocs = Seq(
      (10L, "dup spark engine engine tuning"),
      (11L, "spark engine engine engine pipeline"),
      (12L, "dup spark engine tuning pipeline"),
      (20L, "engine engine engine tuning pipeline"), // no query term
      (30L, "hash join merge window agg vector"),
      (31L, "fast query scan fast query scan"),
      (32L, "unrelated words entirely outside everything"))
      .toDF("doc_id", "text")

    val plain = Retrieval.bm25TopK(prfDocs, "doc_id", "text", k = 7)
      .filter($"qid" === 0L).select("doc_id").as[Long].collect().toSet
    val prf = Retrieval.prfExpandTopK(prfDocs, "doc_id", "text",
        k = 7, fbDocs = 3, fbTerms = 2)
      .filter($"qid" === 0L).select("doc_id").as[Long].collect().toSet

    assert(!plain.contains(20L), "doc 20 must be invisible to plain BM25")
    assert(prf.contains(20L), "PRF must surface the vocabulary-only doc")
    // the original hits don't vanish: originals keep weight 1e6
    assert(Set(10L, 11L, 12L).subsetOf(prf))

    // stage-1 parity: with w == 1e6 the weighted pass reproduces the
    // plain ranking exactly (the (w*c) div 1e6 == c identity)
    val viaPrfNoExp = Retrieval.prfExpandTopK(prfDocs, "doc_id", "text",
        k = 7, fbDocs = 7, fbTerms = 0)
      .collect().map(_.toSeq).toSet
    val bm = Retrieval.bm25TopK(prfDocs, "doc_id", "text", k = 7)
      .collect().map(_.toSeq).toSet
    assert(viaPrfNoExp == bm)
  }
  test("frozen PRF == in-plan PRF on self; the gate passes vocabulary-only docs") {
    val prfDocs = Seq(
      (10L, "dup spark engine engine tuning"),
      (11L, "spark engine engine engine pipeline"),
      (12L, "dup spark engine tuning pipeline"),
      (20L, "engine engine engine tuning pipeline"),
      (30L, "hash join merge window agg vector"),
      (31L, "fast query scan fast query scan"))
      .toDF("doc_id", "text")
    val frozen = Retrieval.freezePrf(prfDocs, "doc_id", "text",
      fbDocs = 3, fbTerms = 2)
    // frozen-on-self reproduces the in-plan three-stage ranking
    val served = Retrieval.prfFrozenTopK(prfDocs, "doc_id", "text",
        frozen, k = 6).collect().map(_.toSeq).toSet
    val inPlan = Retrieval.prfExpandTopK(prfDocs, "doc_id", "text",
        k = 6, fbDocs = 3, fbTerms = 2).collect().map(_.toSeq).toSet
    assert(served == inPlan)
    // the streaming gate shape: the vocabulary-only doc 20 scores on
    // q0 through the harvested expansion terms alone
    val gated = graft.streaming.Pipeline.prfGate(
        prfDocs, "doc_id", frozen, minScoreMicros = 1L)
      .filter($"qid" === 0L).select("id").as[Long].collect().toSet
    assert(gated.contains(20L))
  }
  test("frozen PRF keeps zero-score rows that match a term (the in-plan posting join's tie tail)") {
    // a near-ubiquitous term on a huge corpus has idf so small that
    // round(c*1e6) == 0; the in-plan posting join still keeps the
    // matched doc (score 0, ranked on the id tie-break). Pin the
    // frozen path's parity with a hand-built model carrying such an
    // idf — unreachable organically at unit-test corpus sizes.
    val docs = Seq((1L, "common filler words"), (2L, "no hit here"))
      .toDF("doc_id", "text")
    val frozen = Retrieval.FrozenPrf(avgdl = 3.0,
      idf = Map("common" -> 1e-9),
      weights = Map(0L -> Seq(("common", 1000000L))))
    val rows = Retrieval.scorePrfFrozen(docs, "doc_id", "text", frozen)
      .as[(Long, Long, Long)].collect().toSet
    assert(rows == Set((1L, 0L, 0L)),
      "doc 1 matches 'common' and must survive with score 0; doc 2 must not")
  }

  test("ccnet gate: frozen-on-self == batch terciles; unknown source tails; short doc unscored") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the dog", "r", "s0"),
      (2L, "the quick brown fox jumps over a dog", "x", "s0"),
      (3L, "quick brown the over fox dog jumps the", "x", "s0"),
      (4L, "zzz yyy xxx www vvv uuu ttt sss", "x", "s0"),
      (5L, "the quick brown fox", "x", "s1"),
      (6L, "fox brown quick the", "x", "s1"),
      (7L, "solo", "x", "s1"))
      .toDF("doc_id", "text", "lang", "source")
    val ref = col("lang") === "r"
    val batch = Curation.ccnetBuckets(d, "doc_id", "text", "source",
        ref, nBuckets = 64)
      .as[(Long, String, Option[Long], String)].collect()
    // the equality below assumes no boundary CE ties — guard it
    assert(batch.flatMap(_._3).distinct.length
      == batch.count(_._3.isDefined), "corpus has tied CEs; pick other texts")

    val model = TextAnalysis.freezeLm(d, "text", ref, nBuckets = 64)
    val cuts = Curation.freezeCcnet(d, "doc_id", "text", "source",
      ref, nBuckets = 64)
    val gated = graft.streaming.Pipeline.ccnetGate(d, model, cuts)
      .select("doc_id", "bucket").as[(Long, String)].collect().toMap
    assert(gated == batch.map(r => r._1 -> r._4).toMap)

    // a source the freeze never saw: no evidence of head-ness -> tail
    val fresh = Seq((9L, "the quick brown fox jumps over the dog", "x", "s9"))
      .toDF("doc_id", "text", "lang", "source")
    assert(graft.streaming.Pipeline.ccnetGate(fresh, model, cuts)
      .select("bucket").as[String].head() == "tail")
    // bigram-less docs stay visible as unscored
    val short = Seq((10L, "one", "x", "s0"))
      .toDF("doc_id", "text", "lang", "source")
    assert(graft.streaming.Pipeline.ccnetGate(short, model, cuts)
      .select("bucket").as[String].head() == "unscored")
  }

  test("retrieval metrics (X147): MRR/precision/recall/nDCG on a hand-scored fixture") {
    // k=3 weights: w1=1e6, w2=round(1e6/log2(3))=630930, w3=500000;
    // the fixture is chosen so every expected metric is an exact
    // integer regardless of w2 (qid 1's dcg == idcg; qid 0 hits only
    // rank 3; qid 2 hits nothing)
    val ranked = Seq(
      (0L, 1L, 10L), (0L, 2L, 11L), (0L, 3L, 12L),
      (1L, 1L, 20L), (1L, 2L, 21L), (1L, 3L, 22L),
      (2L, 1L, 30L), (2L, 2L, 31L), (2L, 3L, 32L))
      .toDF("qid", "rank", "doc_id")
    val rel = Seq((0L, 12L), (1L, 20L), (1L, 21L), (1L, 22L), (1L, 23L),
      (2L, 99L)).toDF("qid", "doc_id")
    val out = Retrieval.retrievalMetrics(ranked, rel, k = 3)
      .orderBy("qid")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(out == Seq(
      // qid, n_rel, first_rel_rank, hits, mrr, precision, recall, ndcg
      (0L, 1L, 3L, 1L, 333333L, 333333L, 1000000L, 500000L),
      (1L, 4L, 1L, 3L, 1000000L, 1000000L, 750000L, 1000000L),
      (2L, 1L, 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("conjunctive relevance (X147): a doc is relevant iff it contains EVERY query term") {
    // query 0 = ("dup", "spark"): docs 0 and 4 carry both; doc 1 has
    // only "spark", doc 5 neither
    val rel = Retrieval.relevanceConjunctive(docs, "doc_id", "text")
      .filter(col("qid") === 0L)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(rel == Set(0L, 4L))
  }

  test("phrase search (X150): adjacent-token matches on a hand corpus; overlapping occurrences of a repeated-token phrase count") {
    // doc0: hash@2 join@3 → 1; doc1: "spark spark spark" → 2 starts,
    // "hash hash join" → 1; doc4: "dup dup dup" → 2 overlapping
    // starts; doc2: trigram at 0 and 3 (position 6 has no vector
    // after "window agg")
    val got = Retrieval.phraseTopK(docs, "doc_id", "text", k = 10,
        phrases = Seq(
          0L -> Seq("hash", "join"),
          1L -> Seq("dup", "dup"),
          2L -> Seq("window", "agg", "vector"),
          3L -> Seq("spark", "spark")))
      .as[(Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (0L, 1L, 0L, 1L), (0L, 2L, 1L, 1L),
      (1L, 1L, 4L, 2L),
      (2L, 1L, 2L, 2L),
      (3L, 1L, 1L, 2L)))
  }

  test("proximity search (X151): within-window pair counts on a hand corpus") {
    // w=3. (hash,join): doc1 hash@3,4 join@5 -> 2 pairs, doc0 -> 1;
    // (dup,spark): doc4 dup@0,1,2 spark@3 -> 3 pairs (all within 3),
    // doc0 -> 1; (merge,hash): doc0 |4-2|=2 -> 1, doc3 |6-7|=1 -> 1,
    // tie broken by doc id
    val got = Retrieval.nearTopK(docs, "doc_id", "text", k = 10, w = 3,
        pairs = Seq(
          0L -> ("hash", "join"),
          1L -> ("dup", "spark"),
          2L -> ("merge", "hash")))
      .as[(Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (0L, 1L, 1L, 2L), (0L, 2L, 0L, 1L),
      (1L, 1L, 4L, 3L), (1L, 2L, 0L, 1L),
      (2L, 1L, 0L, 1L), (2L, 2L, 3L, 1L)))
  }

  test("KWIC snippets (X153): first-hit window, clamped at both edges, ranked by tf") {
    // doc4 "dup dup dup spark merge": first 'dup' at 0 → window
    // clamps left: "dup dup dup"; doc0 first 'dup' at 0 → "dup spark
    // hash"; tf ranks doc4 first. 'merge' in doc0 at 4 → full ±2
    // window; doc3 at 6 → clamps right; doc4 at 4 (last) → clamps.
    val got = Retrieval.kwicTopK(docs, "doc_id", "text", k = 5, w = 2,
        terms = Seq(0L -> "dup", 1L -> "merge"))
      .as[(Long, Long, Long, Long, String)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (0L, 1L, 4L, 3L, "dup dup dup"),
      (0L, 2L, 0L, 1L, "dup spark hash"),
      (1L, 1L, 0L, 1L, "hash join merge window agg"),
      (1L, 2L, 3L, 1L, "query scan merge hash"),
      (1L, 3L, 4L, 1L, "dup spark merge")))
  }

  test("conjunctive relevance: a query with a REPEATED term counts it once (advice r13)") {
    // before the fix, the duplicate "dup" row inflated nt above
    // n_terms = |distinct terms| and NO doc could ever be relevant;
    // relevance is a distinct-terms predicate: same qrels as the
    // deduplicated query
    val rel = Retrieval.relevanceConjunctive(docs, "doc_id", "text",
        queries = Seq(7L -> Seq("dup", "dup", "spark")))
      .select(col("qid"), col("doc_id")).as[(Long, Long)].collect().toSet
    assert(rel == Set((7L, 0L), (7L, 4L)))
  }

  test("sloppy phrase (X154): ordered in-window matches; slop 0 is the exact phrase; pins a near-verbatim quote X150 provably misses") {
    // doc1 "spark spark spark hash hash join fast query scan":
    //   ("hash","query") slop 3 → (3,7),(4,7) = 2 matches, but the
    //   EXACT phrase finds nothing (tokens interleaved by 'join fast')
    // ("hash","join") slop 0 ≡ exact: doc0 (2,3), doc1 (4,5)
    // ("fast","query","scan") slop 2: doc3 (0,1,2),(3,4,5) — (0,4,5)
    //   is pruned by the per-step width bound; doc1 (6,7,8)
    // ("query","fast") slop 1: ORDER matters — only doc3's (1,3)
    val phrases = Seq(
      (0L, Seq("hash", "query"), 3),
      (1L, Seq("hash", "join"), 0),
      (2L, Seq("fast", "query", "scan"), 2),
      (3L, Seq("query", "fast"), 1))
    val got = Retrieval.sloppyTopK(docs, "doc_id", "text", k = 10,
        phrases = phrases)
      .as[(Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (0L, 1L, 1L, 2L),
      (1L, 1L, 0L, 1L), (1L, 2L, 1L, 1L),
      (2L, 1L, 3L, 2L), (2L, 2L, 1L, 1L),
      (3L, 1L, 3L, 1L)))
    // the divergence pin: the exact phrase misses the interleaved case
    assert(Retrieval.phraseTopK(docs, "doc_id", "text", k = 10,
      phrases = Seq(0L -> Seq("hash", "query"))).count() == 0)
  }

  test("KWIC over the ranking (X155): rows ARE the bm25 ranking; each carries the window around the first hit of ANY query term") {
    val qs = Seq(0L -> Seq("dup", "spark"), 1L -> Seq("merge", "hash"))
    val got = Retrieval.kwicMultiTopK(docs, "doc_id", "text", k = 10,
        w = 2, queries = qs)
      .as[(Long, Long, Long, Long, String)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    val ranked = Retrieval.bm25TopK(docs, "doc_id", "text", k = 10,
        queries = qs)
      .as[(Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4)) == ranked)
    val snippets = got.map(r => (r._1, r._3) -> r._5).toMap
    // q0 {dup, spark}: first hits at position 0 in all three docs
    assert(snippets((0L, 0L)) == "dup spark hash")
    assert(snippets((0L, 1L)) == "spark spark spark")
    assert(snippets((0L, 4L)) == "dup dup dup")
    // q1 {merge, hash}: doc0 hash@2 (full ±2 window), doc1 hash@3,
    // doc3 merge@6 (right-clamped), doc4 merge@4 (last token)
    assert(snippets((1L, 0L)) == "dup spark hash join merge")
    assert(snippets((1L, 1L)) == "spark spark hash hash join")
    assert(snippets((1L, 3L)) == "query scan merge hash")
    assert(snippets((1L, 4L)) == "dup spark merge")
  }
}
