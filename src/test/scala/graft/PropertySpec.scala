package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc._
import graft.functions._

/** Property tests (SURVEY §5.3): merge order-independence, op-recode
  * totality, and algebraic laws of the native expressions. Expression
  * laws run JVM-side via `compute` (no Spark job per case); the Spark
  * properties use a reduced case count.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(p: Prop, cases: Int = 100): Unit = {
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(r.passed, r.status.toString)
  }

  private def longArray(xs: Seq[Long]) = new GenericArrayData(xs.distinct.toArray)
  private def strArray(xs: Seq[String]) =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])

  test("argTopMCos equals the struct-sort formulation it replaced (fuzz)") {
    // the native pick claims BIT-identical selection to
    // sort-by-(negcos, position) with stable ties — fuzz it against a
    // reference implementation over random vectors incl. duplicated
    // centroids (forced exact ties)
    val pick = ArgTopMCos(null, null, null, null, 3)
    val vecGen = Gen.listOfN(4, Gen.chooseNum(-5.0, 5.0))
    val centsGen = Gen.nonEmptyListOf(vecGen).map(_.take(8))
    check(Prop.forAll(vecGen, centsGen, Gen.chooseNum(0, 7)) { (v, cs0, dup) =>
      // duplicate one centroid so exact ties actually occur
      val cs = if (cs0.nonEmpty) cs0 :+ cs0(dup % cs0.length) else cs0
      val vn = math.sqrt(v.map(x => x * x).sum)
      val cnorms = cs.map(c => math.sqrt(c.map(x => x * x).sum))
      def arr(xs: Seq[Double]) = new GenericArrayData(xs.toArray)
      val got = pick.compute(arr(v), vn,
          new GenericArrayData(cs.map(c => arr(c)).toArray[Any]),
          arr(cnorms))
        .toIntArray().toSeq
      // reference: negcos with the same op order, stable sort by key
      // using Double.compare, positions ascending on ties
      val keys = cs.zipWithIndex.map { case (c, i) =>
        val dot = v.zip(c).map { case (a, b) => a * b }
          .foldLeft(0.0)(_ + _)
        (-(dot / (vn * cnorms(i))), i)
      }
      val want = keys.sortWith { (a, b) =>
        val c = java.lang.Double.compare(a._1, b._1)
        if (c != 0) c < 0 else a._2 < b._2
      }.take(3).map(_._2)
      got == want
    })
  }

  test("repStats counters equal brute-force grouping, for any token list") {
    val rs = RepStats(null)
    val tokGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "ab", "x"))
    check(Prop.forAll(tokGen) { ts =>
      val got = rs.compute(strArray(ts)).toLongArray().toSeq
      val uni = ts.groupBy(identity).view.mapValues(_.size.toLong)
      val bi = ts.zip(ts.drop(1)).map { case (a, b) => s"$a $b" }
        .groupBy(identity).view.mapValues(_.size.toLong)
      got == Seq(ts.size.toLong, uni.size.toLong, uni.values.max,
        math.max(ts.size - 1, 0).toLong,
        if (bi.isEmpty) 0L else bi.values.max)
    })
  }

  test("jaccardMicros60: symmetric, bounded, identity, disjoint-zero") {
    val j = JaccardMicros60(null, null)
    val gen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 50L))
    check(Prop.forAll(gen, gen) { (a, b) =>
      val ab = j.compute(longArray(a), longArray(b))
      val ba = j.compute(longArray(b), longArray(a))
      val self = j.compute(longArray(a), longArray(a))
      val disjoint = j.compute(longArray(a.map(_ + 1000)), longArray(b))
      ab == ba && ab >= 0L && ab <= 1000000L && self == 1000000L && disjoint == 0L
    })
  }

  test("minhash from pre-hashed shingles == minhash from strings, for any tokens") {
    val seeds = graft.ops.Hashing.seeds(16)
    val as = seeds.map(_._1).toArray
    val bs = seeds.map(_._2).toArray
    val fromStr = MinHashSig(null, as, bs)
    val h60 = Hash60Array(null)
    val fromHash = MinHashSigFromHashes(null, as, bs)
    val gen = Gen.nonEmptyListOf(Gen.alphaNumStr.suchThat(_.nonEmpty))
    check(Prop.forAll(gen) { words =>
      val direct = fromStr.compute(strArray(words)).toLongArray().toSeq
      val viaHash = fromHash.compute(h60.compute(strArray(words))).toLongArray().toSeq
      direct == viaHash
    })
  }

  test("word shingles: distinct, at most n-k+1 of them, each with <= k words") {
    val gen = Gen.nonEmptyListOf(Gen.identifier.suchThat(_.nonEmpty))
    check(Prop.forAll(gen, Gen.chooseNum(1, 5)) { (words, k) =>
      val sh = WordShingles(null, k).compute(strArray(words))
      val out = (0 until sh.numElements()).map(sh.getUTF8String(_).toString)
      out.distinct == out &&
        out.size <= math.max(words.size - k + 1, 1) &&
        out.forall(_.split(" ").length <= k)
    })
  }

  test("stopword hits == brute-force count, for any tokens and set") {
    val wordGen = Gen.oneOf("the", "a", "fox", "und", "la", "xyz")
    check(Prop.forAll(Gen.listOf(wordGen), Gen.someOf(Seq("the", "a", "und"))) {
      (words, set) =>
        val hits = StopwordHits(null, set.toSeq).compute(strArray(words))
        hits == words.count(set.contains)
    })
  }

  test("LWW merge is independent of arrival order and of backfill/live split order") {
    val rowGen = for {
      key <- Gen.oneOf("k1", "k2", "k3")
      ts <- Gen.chooseNum(0L, 5L)
      op <- Gen.oneOf(ChangeOp.Insert, ChangeOp.Update, ChangeOp.Delete)
    } yield (key, op, ts)
    val casesGen = Gen.listOfN(12, rowGen)
    check(Prop.forAll(casesGen) { rows =>
      // seq is a globally unique tie-break: fix it per logical row so
      // permutations are true reorderings of the SAME input
      val live = rows.zipWithIndex.map { case ((k, op, ts), i) =>
        (k, op, ts, i.toLong, s"v$i")
      }
      def winners(xs: Seq[(String, String, Long, Long, String)]) = {
        val df = xs.toDF("key", "op", "ts_sec", "seq", "payload")
        Merge.lww(df.limit(0), df) // empty backfill; all rows live
          .select("key", "payload").as[(String, String)].collect().toMap
      }
      winners(live) == winners(scala.util.Random.shuffle(live))
    }, cases = 10)
  }

  test("star-contraction components: O(log n) rounds on a path graph") {
    // a 96-node chain: min-label propagation would need ~95 rounds
    // (diameter); large-star/small-star must close it in O(log n)
    val n = 96
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("id1", "id2")
    val (labels, rounds) = graft.ops.Dedup.connectedComponents(pairs)
    val out = labels.as[(Long, Long)].collect().toMap
    assert(out == (0L until n).map(_ -> 0L).toMap)
    val bound = 2 * (math.log(n.toDouble) / math.log(2)).ceil.toInt
    assert(rounds <= bound, s"$rounds rounds for a $n-chain (bound $bound)")
  }

  test("substring spans equal a brute-force diagonal-run reference on random corpora") {
    val rnd = new scala.util.Random(99)
    val k = 2; val minTokens = 3
    for (_ <- 1 to 5) {
      // tiny alphabet → plenty of shared grams, runs and multi-spans
      val docs = (0 until 4).map { id =>
        val n = rnd.nextInt(11)
        (id.toLong, Seq.fill(n)("abc".charAt(rnd.nextInt(3)).toString).mkString(" "))
      }
      val toks = docs.map { case (id, t) =>
        id -> (if (t.isEmpty) Array.empty[String] else t.split(" ")) }.toMap
      def grams(ts: Array[String]): Map[Int, String] =
        (1 to ts.length - k + 1).map(p => p -> ts.slice(p - 1, p - 1 + k).mkString(" ")).toMap
      val expected = (for {
        (a, ta) <- toks; (b, tb) <- toks if a < b
        ga = grams(ta); gb = grams(tb)
        matches = for { (p1, g1) <- ga.toSeq; (p2, g2) <- gb.toSeq if g1 == g2 }
          yield (p1, p2)
        ((_, run)) <- matches.groupBy { case (p1, p2) => p1 - p2 }.toSeq
        ps = run.map(_._1).sorted
        island <- ps.foldLeft(Vector.empty[Vector[Int]]) { (acc, p) =>
          if (acc.nonEmpty && acc.last.last == p - 1) acc.init :+ (acc.last :+ p)
          else acc :+ Vector(p)
        }
        len = island.length + k - 1 if len >= minTokens
        d = run.head._1 - run.head._2
      } yield (a, b, island.head.toLong, (island.head - d).toLong, len.toLong)).toSet
      val got = graft.ops.Dedup.substringSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", k, minTokens, maxDf = 100)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == expected, s"docs=$docs")
    }
  }

  test("star-contraction components agree with union-find on random graphs") {
    val rnd = new scala.util.Random(1234)
    for (_ <- 1 to 3) {
      val n = 40
      val edges = (0 until 50).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // reference: sequential union-find
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = nodes.map { v =>
        // component rep = min node id reachable — recompute honestly
        val comp = nodes.filter(u => find(u.toInt) == find(v.toInt))
        v -> comp.min
      }.toMap
      val out = graft.ops.Dedup.dupClusters(edges.toDF("id1", "id2"))
        .as[(Long, Long)].collect().toMap
      assert(out == expected)
    }
  }

  test("streaming interval-merge == reference sessionization, any event set, any arrival order") {
    // reference: sort, split where gap >= gapUs (the batch-window rule)
    def reference(ts: Seq[Long], gapUs: Long): List[(Long, Long, Long)] = {
      val sorted = ts.sorted
      sorted.tail.foldLeft(List((sorted.head, sorted.head, 1L))) {
        case ((s, l, n) :: rest, t) =>
          if (t - l >= gapUs) (t, t, 1L) :: (s, l, n) :: rest
          else (s, t, n + 1) :: rest
        case (Nil, _) => Nil // unreachable
      }.reverse
    }
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 200) {
      val gapUs = 1 + rnd.nextInt(50)
      val n = 1 + rnd.nextInt(12)
      // duplicates allowed: same-timestamp events must merge, not split
      val ts = Seq.fill(n)(rnd.nextInt(200).toLong)
      val shuffled = rnd.shuffle(ts)
      val streamed = shuffled.foldLeft(List.empty[(Long, Long, Long)])(
        (ss, t) => graft.streaming.SessionMerge.insert(ss, t, gapUs))
      assert(streamed == reference(ts, gapUs),
        s"trial $trial gap $gapUs events $ts order $shuffled")
    }
  }

  test("op recodes are total over the ChangeOp domain") {
    val ops = Seq(ChangeOp.Insert, ChangeOp.Update, ChangeOp.Delete,
      ChangeOp.Backfill)
    val col = org.apache.spark.sql.functions.col("op")
    val out = ops.toDF("op")
      .select(Transforms.debeziumOp(col), Transforms.bigqueryChangeType(col))
      .as[(String, String)].collect()
    assert(out.map(_._1).toSet.subsetOf(Set("c", "u", "d")))
    assert(out.map(_._2).toSet.subsetOf(Set("UPSERT", "DELETE")))
  }
  test("cdc chunks: reference equality, partition invariant, shift re-sync (fuzz)") {
    // JVM-side via compute: no Spark job per case
    def ref(ts: IndexedSeq[String], k: Int, divisor: Long): Seq[(Long, Long, Long)] = {
      def h(s: String): Long = ArrayExprs.hash60(UTF8String.fromString(s))
      val n = ts.length
      if (n == 0) return Seq.empty
      val cutStarts = (1 to n - k + 1).filter { p =>
        h(ts.slice(p - 1, p - 1 + k).mkString(" ")) % divisor == 0L && p + k <= n
      }.map(_ + k)
      val starts = 1 +: cutStarts
      starts.zipAll(starts.drop(1).map(_ - 1), 0, n).map { case (s, e) =>
        (s.toLong, (e - s + 1).toLong, h(ts.slice(s - 1, e).mkString(" ")))
      }
    }
    def run(expr: CdcChunks, ts: Seq[String]): Seq[(Long, Long, Long)] = {
      val out = expr.compute(strArray(ts))
      (0 until out.numElements()).map { i =>
        val r = out.getStruct(i, 3)
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
    }
    val tokGen = Gen.listOf(Gen.oneOf(
      Gen.identifier.map(_.take(4)), Gen.oneOf("a", "b", "ab", "")))
    check(Prop.forAll(tokGen, Gen.chooseNum(1, 4), Gen.chooseNum(1L, 4L)) {
      (ts0, k, div) =>
        val ts = ts0.take(40).toIndexedSeq
        val expr = CdcChunks(null, k, div)
        val got = run(expr, ts)
        val want = ref(ts, k, div)
        // 1. exact reference equality
        val eq = got == want
        // 2. chunks PARTITION the doc: contiguous, covering, in order
        val partitions = ts.isEmpty ||
          (got.head._1 == 1L && got.map(_._2).sum == ts.length &&
            got.sliding(2).forall {
              case Seq((s1, l1, _), (s2, _, _)) => s2 == s1 + l1
              case _ => true
            })
        eq && partitions
    }, cases = 200)
    // 3. head-insertion re-sync: all but the head chunk of the base
    // reappear in the shifted doc (content-local boundaries)
    val baseGen = Gen.listOfN(30, Gen.identifier.map(_.take(3)))
    val insGen = Gen.listOfN(4, Gen.identifier.map(_.take(3)))
    check(Prop.forAll(baseGen, insGen) { (base, ins) =>
      val expr = CdcChunks(null, 2, 2L)
      val b = run(expr, base.toIndexedSeq)
      val s = run(expr, (ins ++ base).toIndexedSeq)
      val shiftFps = s.map(_._3).toSet
      b.drop(1).forall(c => shiftFps.contains(c._3))
    }, cases = 100)
  }

  // plain-Scala mirror of TextAnalysis.mgCompress for one source:
  // threshold = (k+1)-th largest by (cnt desc, tok asc), survivors
  // cnt > t at est = cnt - t
  private def mgCompressRef(counts: Map[String, Long],
      k: Int): Map[String, Long] = {
    val ranked = counts.toSeq.sortBy { case (t, c) => (-c, t) }
    val thresh = if (ranked.length > k) ranked(k)._2 else 0L
    ranked.filter(_._2 > thresh)
      .map { case (t, c) => t -> (c - thresh) }.toMap
  }

  test("MG merge law: est <= true, undershoot <= n/(k+1), any merge sequence (fuzz)") {
    val k = 4
    // random multi-batch streams over a small skewed alphabet — the
    // compress/merge sequence must keep the Agarwal bound vs exact
    val tokGen = Gen.frequency(5 -> Gen.const("hot"),
      3 -> Gen.oneOf("w1", "w2"), 2 -> Gen.oneOf((1 to 12).map("t" + _)))
    val batchGen = Gen.listOf(tokGen)
    check(Prop.forAll(Gen.listOfN(5, batchGen)) { batches =>
      var summary = Map.empty[String, Long]
      val truth = scala.collection.mutable.Map.empty[String, Long]
      for (b <- batches) {
        val exact = b.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
        exact.foreach { case (t, c) => truth(t) = truth.getOrElse(t, 0L) + c }
        val combined = (summary.keySet ++ exact.keySet).map(t =>
          t -> (summary.getOrElse(t, 0L) + exact.getOrElse(t, 0L))).toMap
        summary = mgCompressRef(combined, k)
      }
      val n = truth.values.sum
      truth.forall { case (t, c) =>
        val e = summary.getOrElse(t, 0L)
        e <= c && c - e <= n / (k + 1) &&
          (c <= n / (k + 1) || summary.contains(t))
      } && summary.size <= k
    }, cases = 200)
  }

  test("MG compress: the Spark op equals the plain-Scala mirror (fuzz)") {
    val tokGen = Gen.oneOf((1 to 9).map("x" + _))
    check(Prop.forAll(Gen.nonEmptyListOf(tokGen), Gen.chooseNum(1, 5)) {
      (toks, k) =>
        val counts = toks.groupBy(identity)
          .map { case (t, g) => t -> g.size.toLong }
        val got = graft.ops.TextAnalysis.mgCompress(
            counts.toSeq.map { case (t, c) => ("s", t, c) }
              .toDF("source", "tok", "cnt"), k)
          .select($"tok", $"est_cnt").as[(String, Long)].collect().toMap
        got == mgCompressRef(counts, k)
    }, cases = 15) // each case runs a Spark job
  }

  // plain-Scala mirror of Diagnostics.binId / binLo / binHi
  private def binRef(n: Long): (Long, Long, Long) =
    if (n < 16) (n, n, n)
    else {
      val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(n)
      val shift = bitlen - 4
      val id = 8L * shift + (n >>> shift)
      val u = id - 8L * shift
      // hi = u<<shift + (2^shift - 1): overflow-free form (the
      // ((u+1)<<shift) - 1 association would wrap at the top bin)
      (id, u << shift, (u << shift) + ((1L << shift) - 1))
    }

  test("log-histogram bins: inverse/width/monotone laws up to 2^63-1 (fuzz)") {
    // full Long range: the r9 shiftright fix exists FOR n >= 2^53,
    // where a double division rounds and can cross a bin boundary —
    // the law must hold there, not just below the double-exact regime
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue)) { n =>
      val (_, lo, hi) = binRef(n)
      lo <= n && n <= hi && (n < 16 || (hi + 1 - lo) * 8 <= lo)
    }, cases = 500)
    // monotone: id non-decreasing across each value and its successor
    check(Prop.forAll(Gen.chooseNum(0L, Long.MaxValue - 1)) { n =>
      binRef(n)._1 <= binRef(n + 1)._1
    }, cases = 500)
    // the Column implementation equals the mirror on random values
    // drawn across the WHOLE range plus the exact double-rounding
    // boundary cases around 2^53/2^54 and the top bin (where the
    // inverse's (u+1)<<shift wraps consistently on both paths)
    val boundary = Seq(1L << 53, 1L << 54, 1L << 62).flatMap(p =>
      Seq(p - 1, p, p + 1, p + (p >> 4) - 1, p + (p >> 4))) ++
      Seq(Long.MaxValue, Long.MaxValue - 1)
    val rnd = new scala.util.Random(11)
    val vals = new scala.util.Random(7)
      .shuffle((0L to 200L) ++ boundary ++
        Seq.fill(300)(rnd.nextLong() & Long.MaxValue))
      .distinct
    val got = vals.toDF("n")
      .select($"n", graft.ops.Diagnostics.binId($"n").as("b"))
      .select($"n", $"b", graft.ops.Diagnostics.binLo($"b").as("lo"),
        graft.ops.Diagnostics.binHi($"b").as("hi"))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (n, b, lo, hi) =>
      val (rb, rlo, rhi) = binRef(n)
      assert((b, lo, hi) == ((rb, rlo, rhi)), s"mirror mismatch at n=$n")
    }
  }

  test("epoch shuffle digest equals the plain reference, any ids/shards/salt") {
    import org.apache.spark.sql.functions.col
    val gen = for {
      ids <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 400L)).map(_.distinct)
      nS <- Gen.chooseNum(1, 8)
      salt <- Gen.oneOf("e1", "e2", "x")
    } yield (ids, nS, salt)
    check(Prop.forAll(gen) { case (ids, nS, salt) =>
      val got = graft.ops.Curation
        .epochShuffle(ids.toDF("doc_id"), "doc_id", nS, salt)
        .select(col("shard"), col("n_docs"), col("head_id"), col("ord_fp"))
        .as[(Int, Long, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
      got == PlainRefs.epochDigest(ids, nS, salt)
    }, cases = 10) // each case runs a Spark job
  }

  test("NB classifier equals the plain reference, any corpus/labels/buckets") {
    import org.apache.spark.sql.functions.col
    val tokGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "ab", "x"))
    val docGen = for {
      toks <- tokGen
      lab <- Gen.oneOf("A", "B", "C")
    } yield (toks.mkString(" "), lab) // single-space join: no split drift
    val gen = for {
      docs <- Gen.nonEmptyListOf(docGen).map(_.take(12))
      nB <- Gen.oneOf(16, 64)
    } yield (docs, nB)
    check(Prop.forAll(gen) { case (docList, nB) =>
      val rows = docList.zipWithIndex.map { case ((t, l), i) => (i.toLong, t, l) }
      val got = graft.ops.Curation
        .nbPredict(rows.toDF("doc_id", "text", "source"),
          "doc_id", "text", "source", col("doc_id") % 2 === 0, nB)
        .select("doc_id", "label", "split", "predicted")
        .as[(Long, String, String, String)].collect().toSet
      got == PlainRefs.nbReference(rows, _ % 2 == 0, nB)
    }, cases = 8) // each case runs a multi-stage Spark job
  }

  test("NB top-grams equals the plain reference, any corpus/buckets/quota") {
    import org.apache.spark.sql.functions.col
    val tokGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "ab", "x"))
    val docGen = for {
      toks <- tokGen
      lab <- Gen.oneOf("A", "B", "C")
    } yield (toks.mkString(" "), lab)
    val gen = for {
      docs <- Gen.nonEmptyListOf(docGen).map(_.take(10))
      nB <- Gen.oneOf(16, 64)
      m <- Gen.chooseNum(1, 5)
    } yield (docs, nB, m)
    check(Prop.forAll(gen) { case (docList, nB, m) =>
      val rows = docList.zipWithIndex.map { case ((t, l), i) => (i.toLong, t, l) }
      val got = graft.ops.Curation
        .nbTopGrams(rows.toDF("doc_id", "text", "source"),
          "doc_id", "text", "source", col("doc_id") >= 0, nB, m)
        .select("c_label", "gram", "lr_micros", "rank")
        .as[(String, String, Long, Long)].collect().toSet
      got == PlainRefs.nbTopGramsReference(rows, _ >= 0, nB, m)
    }, cases = 6) // each case runs a multi-stage Spark job
  }

  test("BM25 pruning law: a corpus-covering budget == full BM25, and " +
      "pruned candidate sets only shrink with m (fuzz)") {
    // random small corpora over the query vocabulary: words the fixed
    // Queries actually hit, plus noise words that don't
    val wordGen = Gen.oneOf("dup", "spark", "hash", "join", "merge",
      "window", "agg", "vector", "fast", "query", "scan", "noise", "blah")
    val docGen = Gen.nonEmptyListOf(wordGen).map(_.take(12).mkString(" "))
    val corpusGen = Gen.nonEmptyListOf(docGen).map(_.take(8))
    check(Prop.forAll(corpusGen, Gen.chooseNum(1, 3)) { (texts, m) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val full = graft.ops.Retrieval.bm25TopK(docs, "doc_id", "text", k = 5)
        .select("qid", "rank", "doc_id", "score_micros")
        .as[(Long, Long, Long, Long)].collect().toSet
      val wide = graft.ops.Retrieval.bm25PrunedTopK(docs, "doc_id", "text",
          k = 5, m = texts.size)
        .select("qid", "rank", "doc_id", "score_micros")
        .as[(Long, Long, Long, Long)].collect().toSet
      val narrow = graft.ops.Retrieval.bm25PrunedTopK(docs, "doc_id",
          "text", k = 5, m = m)
        .select("qid", "doc_id").as[(Long, Long)].collect().toSet
      val narrowDocsPerQ = narrow.groupBy(_._1).view.mapValues(_.size)
      // m >= |corpus| covers every posting: bit-identical to full;
      // and a narrower budget can never SURFACE more than m docs per
      // query term could contribute (here: m * |query terms| bound)
      (wide == full) &&
        narrowDocsPerQ.forall { case (qid, cnt) =>
          cnt <= m * graft.ops.Retrieval.Queries
            .find(_._1 == qid).map(_._2.size).getOrElse(0)
        }
    }, cases = 8) // each case runs several Spark jobs
  }

  test("MRL rerank law: a corpus-covering candidate budget == brute " +
      "force at full dimension, any vectors/prefix (fuzz)") {
    val vecGen = Gen.listOfN(4, Gen.chooseNum(-5.0, 5.0)
      .map(v => math.rint(v * 8) / 8.0f)).map(_.map(_.toFloat))
      // avoid the all-zero vector (drops by the zero-norm rule and
      // would shrink the corpus the law counts)
      .suchThat(_.exists(_ != 0f))
    val corpusGen = Gen.nonEmptyListOf(vecGen).map(_.take(6))
      .suchThat(_.size >= 2)
    check(Prop.forAll(corpusGen, Gen.chooseNum(1, 4)) { (vecs, dim) =>
      val embs = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val truth = graft.ops.Similarity.bruteForceTopK(embs, "vec_id",
          "embedding", org.apache.spark.sql.functions.col("vec_id") === 0, k = 2)
        .select("rank", "neighbor_id", "cos_micros")
        .as[(Long, Long, Long)].collect().toSet
      val got = graft.ops.Similarity.mrlRerank(embs, "vec_id",
          "embedding", org.apache.spark.sql.functions.col("vec_id") === 0, k = 2, dim = dim,
          factor = vecs.size)
        .select("rank", "neighbor_id", "cos_micros")
        .as[(Long, Long, Long)].collect().toSet
      // candidates from the prefix scan can drop zero-norm PREFIXES,
      // so the law conditions on every prefix being rankable
      val allPrefixesLive = vecs.forall(_.take(dim).exists(_ != 0f))
      !allPrefixesLive || got == truth
    }, cases = 8)
  }

  test("corpus vocab stats (X135-X137) == plain references on random corpora (fuzz)") {
    import graft.ops.TextAnalysis
    val wordGen = Gen.oneOf("a", "b", "c", "dd", "ee", "ff", "gg", "zz")
    val docGen = Gen.nonEmptyListOf(wordGen).map(_.take(10).mkString(" "))
    val corpusGen = Gen.nonEmptyListOf(docGen).map(_.take(6))
    def lnm(x: Long): Long = math.round(math.log(x.toDouble) * 1e6)
    check(Prop.forAll(corpusGen, Gen.chooseNum(1, 8)) { (texts, s) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val toks = texts.map(_.split("\\s+").toSeq)
      val counts = toks.flatten.groupBy(identity)
        .map { case (t, g) => t -> g.size.toLong }
      val ranked = counts.toSeq.sortBy { case (t, c) => (-c, t) }
      val nTotal = counts.values.sum
      // X136: exact curve + monotone coverage + saturation
      val sizes = Seq(s, s + 2)
      val gotCov = TextAnalysis.vocabCoverage(df, "text", sizes)
        .orderBy("vocab_size").as[(Long, Long, Long)].collect().toSeq
      val wantCov = sizes.map { sz =>
        (sz.toLong, math.min(sz, ranked.size).toLong,
          math.round(ranked.take(sz).map(_._2).sum.toDouble / nTotal * 1e6))
      }
      // X137: the op on its own token ranks == plain least squares
      val pts = ranked.take(256).zipWithIndex.map { case ((_, c), i) =>
        (math.round(math.log((i + 1).toDouble) * 1e3),
          math.round(math.log(c.toDouble) * 1e3))
      }
      val n = pts.size.toLong
      val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val den = n * sxx - sx * sx
      val zipfRow = TextAnalysis.zipfFit(df, "text", topR = 256)
        .collect().head
      val zipfHolds = if (den == 0) {
        // degenerate fit (e.g. one distinct token): NULL on both
        // engines, never round(NaN) = 0 (self-review finding)
        zipfRow.isNullAt(1) && zipfRow.isNullAt(2)
      } else {
        val slopeRaw = (n * sxy - sx * sy).toDouble / den.toDouble
        val want = (n, math.round(slopeRaw * 1e6),
          math.round((sy.toDouble - slopeRaw * sx.toDouble) / n * 1e3))
        (zipfRow.getLong(0), zipfRow.getLong(1), zipfRow.getLong(2)) == want
      }
      // X135: full PMI output == plain reference (minCount 1 = no cut)
      val bgs = toks.filter(_.size >= 2)
        .flatMap(ts => ts.sliding(2).map(p => (p(0), p(1))))
      val bc = bgs.groupBy(identity).map { case (p, g) => p -> g.size.toLong }
      val nB = bgs.size.toLong
      val wantPmi = bc.map { case ((a, b), cab) =>
        (s"$a $b", cab,
          lnm(cab) + 2 * lnm(nTotal) - lnm(nB) - lnm(counts(a)) - lnm(counts(b)))
      }.toSeq.sortBy(r => (-r._3, r._1))
      val gotPmi = TextAnalysis.pmiCollocations(df, "text",
          minCount = 1, topM = 1000)
        .as[(String, Long, Long)].collect().toSeq
      gotCov == wantCov && gotCov(0)._3 <= gotCov(1)._3 &&
        zipfHolds && gotPmi == wantPmi
    }, cases = 8)
  }

  test("text index maintenance laws hold on random corpora (fuzz, reduced cases)") {
    // X149's exactness contract, fuzzed: for ANY corpus (including
    // empty texts, single-word docs, all-duplicate tokens), build
    // half + append half + delete a third serves the EXACT in-plan
    // BM25 ranking over the survivors. Randomized corpora catch
    // tokenizer/stat edges the fixed gate corpus can't (zero-length
    // docs in dl, query terms with df 0, all-known appends).
    import graft.ops.{Retrieval, TextIndex}
    val base = java.nio.file.Files
      .createTempDirectory("graft_tidx_fuzz").toString
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps",
      "zeta", "dup", "spark", "hash", "join")
    val docGen = Gen.chooseNum(0, 12)
      .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpusGen = Gen.chooseNum(4, 10)
      .flatMap(n => Gen.listOfN(n, docGen))
    check(Prop.forAll(corpusGen) { texts =>
      val df = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      import org.apache.spark.sql.functions.col
      // rebuild under ONE name: build owns the orphan sweep, so the
      // prior case's delete generation is reclaimed each round
      TextIndex.build(spark, df.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", "tidx_fz", nBuckets = 2, baseDir = Some(base))
      TextIndex.append(spark, "tidx_fz",
        df.filter(col("doc_id") % 2 === 1), "doc_id", "text")
      TextIndex.delete(spark, "tidx_fz",
        df.filter(col("doc_id") % 3 === 0).select(col("doc_id")),
        "doc_id")
      val got = TextIndex.search(spark, "tidx_fz", k = 5)
        .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
        .toSeq
      val want = Retrieval.bm25TopK(df.filter(col("doc_id") % 3 =!= 0),
          "doc_id", "text", k = 5)
        .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
        .toSeq
      got == want
    }, cases = 4)
  }
}
