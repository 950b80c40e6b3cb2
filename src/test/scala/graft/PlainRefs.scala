package graft

/** Plain-collections reference implementations shared by the spec
  * suites (OpsSpec / RetrievalSpec / PropertySpec) — independent of
  * the library code under test (java.security MD5 + collections
  * only), and kept in ONE place so a formula change cannot leave the
  * suites disagreeing with each other.
  */
object PlainRefs {

  /** JVM mirror of `ops.Hashing.hash60`. */
  def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(md.take(15), 16)
  }

  /** Unigrams ++ adjacent bigrams, mirroring
    * `Curation.unigramsAndBigrams` over single-space-joined text.
    */
  def grams(t: String): Seq[String] = {
    val ts = t.split("\\s+").toSeq
    ts ++ ts.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  /** `Curation.epochShuffle` digest: shard → (n_docs, head_id,
    * ord_fp). `posOf` remaps the 1-based in-order position before it
    * enters the fingerprint term — identity for the true digest;
    * tests pass a permutation to prove the fingerprint actually
    * SEES order (the law a linearly-packed XOR silently fails).
    */
  def epochDigest(ids: Seq[Long], nShards: Int, salt: String,
      posOf: (Int, Int) => Int = (p, _) => p): Map[Int, (Long, Long, Long)] =
    ids
      .map(id => (id, (h60(s"$id:shard") % nShards).toInt,
        h60(s"epoch_${salt}_$id")))
      .groupBy(_._2).map { case (s, rows) =>
        val ordered = rows.sortBy(r => (r._3, r._1))
        val n = ordered.size
        val fp = ordered.zipWithIndex.map { case (r, i) =>
          h60(s"${posOf(i + 1, n)}:${r._3}")
        }.reduce(_ ^ _)
        s -> (n.toLong, ordered.head._1, fp)
      }

  /** `Curation.nbPredict` reference: (doc_id, label, split,
    * predicted) rows over `(id, text, label)` docs, training on
    * `isTrain(id)`.
    */
  def nbReference(rows: Seq[(Long, String, String)],
      isTrain: Long => Boolean, nB: Int): Set[(Long, String, String, String)] = {
    val train = rows.filter(r => isTrain(r._1))
    val labels = train.map(_._3).distinct.sorted
    val nd = train.groupBy(_._3).map { case (l, rs) => l -> rs.size }
    val feats = train.flatMap { case (_, t, l) =>
      grams(t).map(g => (l, h60(g) % nB)) }
    val tot = labels.map(l => l -> feats.count(_._1 == l)).toMap
    val cnt = feats.groupBy(identity).map { case (k, fs) => k -> fs.size }
    def score(t: String, c: String): Long =
      math.round(math.log(nd(c).toDouble / train.size.toDouble) * 1e6) +
        grams(t).map { g =>
          val b = h60(g) % nB
          math.round(math.log((cnt.getOrElse((c, b), 0) + 1).toDouble /
            (tot(c) + nB).toDouble) * 1e6)
        }.sum
    rows.map { case (id, t, l) =>
      val best = labels.map(c => score(t, c)).max
      (id, l, if (isTrain(id)) "train" else "eval",
        labels.filter(c => score(t, c) == best).min)
    }.toSet
  }

  /** `Curation.nbTopGrams` reference: (c_label, gram, lr_micros,
    * rank) rows over `(id, text, label)` docs, training on
    * `isTrain(id)`.
    */
  def nbTopGramsReference(rows: Seq[(Long, String, String)],
      isTrain: Long => Boolean, nB: Int,
      m: Int): Set[(String, String, Long, Long)] = {
    val feats = rows.filter(r => isTrain(r._1)).flatMap { case (_, t, l) =>
      grams(t).map(g => (l, g, h60(g) % nB)) }
    val tot = feats.size
    val cntB = feats.groupBy(_._3).map { case (b, fs) => b -> fs.size }
    val totC = feats.groupBy(_._1).map { case (l, fs) => l -> fs.size }
    val cntCB = feats.groupBy(f => (f._1, f._3))
      .map { case (k, fs) => k -> fs.size }
    def lr(c: String, b: Long): Long =
      math.round(math.log(((cntCB.getOrElse((c, b), 0) + 1).toDouble /
          (totC(c) + nB)) /
        ((cntB(b) + 1).toDouble / (tot + nB))) * 1e6)
    // a class ranks only grams whose bucket it actually trained on
    // (the op's inner join lr ⋈ grams): a gram a class never uses
    // cannot be indicative of it, and scoring it would only surface
    // the all-unseen noise floor
    totC.keys.flatMap { c =>
      feats.map(f => (f._2, f._3)).distinct
        .filter { case (_, b) => cntCB.contains((c, b)) }
        .map { case (g, b) => (c, g, lr(c, b)) }
        .sortBy { case (_, g, s) => (-s, g) }
        .take(m).zipWithIndex
        .map { case ((cl, g, s), i) => (cl, g, s, (i + 1).toLong) }
    }.toSet
  }
}
