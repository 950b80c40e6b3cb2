package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword retrieval over the document corpus: BM25 scoring on an
  * inverted posting index, and reciprocal-rank fusion of a keyword
  * ranking with an embedding (ANN) ranking — the hybrid-retrieval
  * shape an LLM data/eval pipeline runs next to its vector store.
  *
  * == 100 TB shape ==
  *
  * The index build is two partial-agg shuffles over term COUNTS
  * (tf keyed on (doc, term), dl keyed on doc) — never term instances —
  * and the corpus-wide stats (df per term, N, avgdl) aggregate to a
  * vocabulary-sized (tiny) and a single-row table respectively, both
  * broadcast. Query terms broadcast against the postings, so scoring
  * touches only the query terms' posting lists (cost ∝ matched
  * postings, not corpus size); the per-doc score sum and the top-k
  * window both key on (query, doc) / query — no corpus-wide shuffle
  * after the index build. Fusion is arithmetic over two k-row-per-
  * query rankings: negligible at any scale.
  *
  * == Determinism contract ==
  *
  * BM25 is float math (ln, divisions). Per-(query, term, doc)
  * contributions are computed in the SAME expression shape on both
  * engines and quantized to integer micros BEFORE the per-doc sum, so
  * the cross-row summation is exact long arithmetic — partition order
  * cannot perturb scores (the NOTES float-sum rule). Ranking orders by
  * the quantized score with doc id as tie-break, so rank assignment is
  * deterministic on both engines even among equal scores.
  */
object Retrieval {

  /** Lucene-style BM25 constants. */
  val K1 = 1.2
  val B = 0.75

  /** RRF smoothing constant (the standard k=60 of Cormack et al.). */
  val RrfK = 60

  /** Fixed keyword query set for the gate queries: qid → terms over
    * the documents vocabulary ("dup" is the one rare term — df 25 of
    * 500 docs at sf0.01 — so q0 exercises a discriminative idf; the
    * rest score on tf/length like real stopword-ish queries).
    */
  val Queries: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("dup", "spark"),
    1L -> Seq("hash", "join", "merge"),
    2L -> Seq("window", "agg", "vector"),
    3L -> Seq("fast", "query", "scan"))

  private def queryDf(docs: DataFrame,
      queries: Seq[(Long, Seq[String])] = Queries): DataFrame = {
    val rows = queries.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
    docs.sparkSession.createDataFrame(rows).toDF("qid", "tok")
  }

  /** The per-(query term, doc) BM25 contribution in integer micros:
    * idf(term) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)), with
    * idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (always positive).
    */
  private[ops] def contribMicros(tf: Column, df: Column, dl: Column,
      n: Column, avgdl: Column): Column = {
    val idf = log(lit(1.0) +
      (n.cast("double") - df.cast("double") + 0.5) / (df.cast("double") + 0.5))
    val num = tf.cast("double") * (K1 + 1.0)
    val den = tf.cast("double") +
      lit(K1) * (lit(1.0 - B) + lit(B) * dl.cast("double") / avgdl)
    round(idf * num / den * 1e6).cast("long")
  }

  /** BM25 top-k per query from [[Queries]] over the documents table.
    * Output: (qid, rank, doc_id, score_micros).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int, queries: Seq[(Long, Seq[String])] = Queries): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val tf = Caching.cachedOnce(
      toks.groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf")))
    val dl = tf.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    val qdf = queryDf(docs, queries)
    // df stats restricted to the query vocabulary BEFORE the broadcast:
    // the scored stream below only ever consumes df rows for query
    // terms (its qdf join restricts it first), and a corpus-wide df
    // table is |vocab| rows — a multi-GB driver broadcast at corpus
    // scale. The left-semi pushes below the aggregation
    // (PushDownLeftSemiAntiJoin), so the df shuffle shrinks to the
    // query terms' postings too — same restriction freezeStats applies
    // before ITS collect.
    val dfT = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .join(broadcast(qdf.select(col("tok")).distinct()), Seq("tok"),
        "left_semi")
    val corpus = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
      .select(col("n"), (col("sumdl").cast("double") / col("n")).as("avgdl"))
    val scored = tf
      .join(broadcast(qdf), "tok")
      .join(dl, "id")
      .join(broadcast(dfT), "tok")
      .join(broadcast(corpus))
      .select(col("qid"), col("id"),
        contribMicros(col("tf"), col("df"), col("dl"), col("n"), col("avgdl"))
          .as("c"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("c")).as("score_micros"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_micros").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("doc_id"),
        col("score_micros"))
  }

  private def queriesValuesSql: String = queriesValuesSqlOf(Queries)

  private def queriesValuesSqlOf(qs: Seq[(Long, Seq[String])]): String =
    qs.flatMap { case (qid, ts) => ts.map(t => s"($qid, '$t')") }
      .mkString(", ")

  // --------------------------------------------- X150 phrase search

  /** Fixed phrase set for the gate queries: pid → adjacent-token
    * phrase over the documents vocabulary. Includes a REPEATED-token
    * phrase (1) — "order order order" must count TWO overlapping
    * occurrences — and a trigram (2).
    */
  val Phrases: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("hash", "join"),
    1L -> Seq("order", "order"),
    2L -> Seq("big", "order", "scan"),
    3L -> Seq("data", "slow"))

  /** Rank phrase matches from a positional token table (id, tok,
    * pos) — shared by the in-plan [[phraseTopK]] and the
    * artifact-served [[TextIndex.searchPhrase]] so the two are
    * bit-identical by construction. A phrase t0…t(m−1) matches at
    * `start` iff term j sits at position start+j for every j: each
    * term's (pruned) position list shifts left by its offset and the
    * lists equi-join on (id, start) — cost ∝ the PHRASE TERMS'
    * postings, never the corpus, and overlapping occurrences (the
    * repeated-token phrase) fall out naturally because every start
    * is its own row. Output: (pid, rank, doc_id, n_occ), ranked by
    * occurrence count with doc id tie-break.
    */
  /** (id, start) of every occurrence of `terms` as an adjacent
    * phrase in a positional stream — the ONE copy of the shifted
    * equi-join chain, shared by [[phraseRank]] and the takedown scan
    * ([[graft.ops.TextIndex.phraseMatchIds]]) so "matches the
    * phrase" cannot silently diverge between serving and compliance.
    */
  private[graft] def phraseStarts(ptoks: DataFrame,
      terms: Seq[String]): DataFrame =
    terms.zipWithIndex.map { case (t, j) =>
      ptoks.filter(col("tok") === t)
        .select(col("id"), (col("pos") - j).as("start"))
    }.reduce((a, b) => a.join(b, Seq("id", "start")))

  private[graft] def phraseRank(ptoks: DataFrame,
      phrases: Seq[(Long, Seq[String])], k: Int): DataFrame = {
    val matches = phrases.map { case (pid, terms) =>
      phraseStarts(ptoks, terms)
        .select(lit(pid).as("pid"), col("id"), col("start"))
    }.reduce(_ unionByName _)
    val counts = matches.groupBy(col("pid"), col("id"))
      .agg(count(lit(1)).as("n_occ"))
    val w = Window.partitionBy(col("pid"))
      .orderBy(col("n_occ").desc, col("id").asc)
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("pid"), col("rank"), col("id").as("doc_id"),
        col("n_occ"))
  }

  /** Exact adjacent-token phrase search, in-plan: posexplode the
    * corpus ONCE pruned to the phrases' terms, then [[phraseRank]].
    * The artifact twin ([[TextIndex.searchPhrase]] over the
    * positional part) serves the identical output with the tokenize
    * pass paid at build time.
    */
  def phraseTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int, phrases: Seq[(Long, Seq[String])] = Phrases): DataFrame = {
    val terms = phrases.flatMap(_._2).distinct
    val ptoks = Caching.cachedOnce(
      docs.select(col(idCol).cast("long").as("id"),
          posexplode(TextAnalysis.tokens(col(textCol)))
            .as(Seq("pos", "tok")))
        .filter(col("tok").isin(terms: _*)))
    phraseRank(ptoks, phrases, k)
  }

  /** DuckDB table expression for "`table` minus every doc containing
    * `phrase`" — the oracle side of the phrase-targeted takedown
    * (X152): the same positional join chain as [[phraseTopKSql]],
    * collapsed to a NOT IN exclusion.
    */
  def phraseExcludeSql(id: String, text: String, table: String,
      phrase: Seq[String]): String = {
    val ptoks =
      s"""SELECT $id AS doc_id,
         |    unnest(${TextAnalysis.tokensSql(text)}) AS tok,
         |    generate_subscripts(${TextAnalysis.tokensSql(text)}, 1) AS pos
         |  FROM $table""".stripMargin
    val sides = phrase.zipWithIndex.map { case (t, j) =>
      s"(SELECT doc_id, pos - $j AS start FROM ($ptoks) WHERE tok = '$t') a$j"
    }
    val from = sides.head +
      sides.tail.map(sd => s" JOIN $sd USING (doc_id, start)").mkString
    s"""(SELECT * FROM $table WHERE $id NOT IN (
       |  SELECT DISTINCT a0.doc_id FROM $from))""".stripMargin
  }

  // ----------------------------------------- X151 proximity search

  /** Fixed proximity query set for the gate queries: qid → (a, b)
    * term pair, scored by how often the two terms co-occur within
    * [[NearWindow]] positions (unordered, distinct terms).
    */
  val NearPairs: Seq[(Long, (String, String))] = Seq(
    0L -> ("hash", "join"),
    1L -> ("spark", "window"),
    2L -> ("data", "slow"),
    3L -> ("big", "scan"))

  /** Default proximity window (|pa − pb| ≤ w, positions distinct). */
  val NearWindow = 3

  /** Rank within-window co-occurrences from a positional token table
    * (id, tok, pos) — shared by the in-plan [[nearTopK]] and the
    * artifact-served [[TextIndex.searchNear]], like [[phraseRank]].
    * For each (qid, a, b): the two terms' (pruned) position lists
    * equi-join on id and keep pairs with 1 ≤ |pa − pb| ≤ w — the
    * classic SpanNear/proximity operator. n_occ counts co-occurrence
    * PAIRS (a dense cluster of mentions outranks one stray hit),
    * which is why the pair join, not an exists, is the right shape.
    * Pairs are expected term-distinct (an identical-term pair would
    * count each unordered co-occurrence in both orders).
    */
  private[graft] def nearRank(ptoks: DataFrame,
      pairs: Seq[(Long, (String, String))], w: Int, k: Int): DataFrame = {
    val matches = pairs.map { case (qid, (a, b)) =>
      val pa = ptoks.filter(col("tok") === a)
        .select(col("id"), col("pos").as("pa"))
      val pb = ptoks.filter(col("tok") === b)
        .select(col("id"), col("pos").as("pb"))
      pa.join(pb, Seq("id"))
        .filter(abs(col("pa") - col("pb")).between(1, w))
        .select(lit(qid).as("qid"), col("id"))
    }.reduce(_ unionByName _)
    val counts = matches.groupBy(col("qid"), col("id"))
      .agg(count(lit(1)).as("n_occ"))
    val win = Window.partitionBy(col("qid"))
      .orderBy(col("n_occ").desc, col("id").asc)
    counts.withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("doc_id"),
        col("n_occ"))
  }

  /** Proximity search, in-plan: posexplode ONCE pruned to the pairs'
    * terms, then [[nearRank]]. Cost ∝ the terms' position lists plus
    * the within-doc pair join — never corpus-wide.
    */
  def nearTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int = NearWindow,
      pairs: Seq[(Long, (String, String))] = NearPairs): DataFrame = {
    val terms = pairs.flatMap { case (_, (a, b)) => Seq(a, b) }.distinct
    val ptoks = Caching.cachedOnce(
      docs.select(col(idCol).cast("long").as("id"),
          posexplode(TextAnalysis.tokens(col(textCol)))
            .as(Seq("pos", "tok")))
        .filter(col("tok").isin(terms: _*)))
    nearRank(ptoks, pairs, w, k)
  }

  /** DuckDB twin of [[nearTopK]] — same positional stream, same
    * range predicate, same (n_occ desc, doc_id) ranking.
    */
  def nearTopKSql(id: String, text: String, table: String, k: Int,
      w: Int = NearWindow,
      pairs: Seq[(Long, (String, String))] = NearPairs): String = {
    val legs = pairs.map { case (qid, (a, b)) =>
      s"""SELECT $qid::BIGINT AS qid, pa.doc_id AS doc_id
         |  FROM (SELECT doc_id, pos FROM ptoks WHERE tok = '$a') pa
         |  JOIN (SELECT doc_id, pos FROM ptoks WHERE tok = '$b') pb
         |    ON pa.doc_id = pb.doc_id
         |   AND abs(pa.pos - pb.pos) BETWEEN 1 AND $w""".stripMargin
    }
    s"""WITH ptoks AS (
       |  SELECT $id AS doc_id,
       |    unnest(${TextAnalysis.tokensSql(text)}) AS tok,
       |    generate_subscripts(${TextAnalysis.tokensSql(text)}, 1) AS pos
       |  FROM $table),
       |nm AS (${legs.mkString(" UNION ALL ")}),
       |nc AS (SELECT qid, doc_id, count(*) AS n_occ FROM nm GROUP BY 1, 2)
       |SELECT qid, rank, doc_id, n_occ FROM (
       |  SELECT qid, doc_id, n_occ,
       |    row_number() OVER (PARTITION BY qid
       |      ORDER BY n_occ DESC, doc_id ASC) AS rank
       |  FROM nc) WHERE rank <= $k""".stripMargin
  }

  // --------------------------------------------- X153 KWIC snippets

  /** Fixed term set for the snippet gates: qid → single term. */
  val KwicTerms: Seq[(Long, String)] = Seq(
    0L -> "dup", 1L -> "vector", 2L -> "hash", 3L -> "scan")

  /** Snippet window half-width (tokens either side of the hit). */
  val KwicWindow = 2

  /** Rank keyword-in-context snippets from a positional stream plus
    * the matched docs' token arrays — shared by the in-plan
    * [[kwicTopK]] and the artifact-served [[TextIndex.searchKwic]].
    * Per (term, doc): tf and the FIRST occurrence's ±w token window
    * (deterministic: min position), ranked by (tf desc, doc id).
    * `base` is (id, ts); only MATCHED ids' arrays are ever fetched —
    * the snippet join is match-set-sized, never corpus-sized.
    */
  private[graft] def kwicRank(ptoks: DataFrame, base: DataFrame,
      terms: Seq[(Long, String)], w: Int, k: Int): DataFrame = {
    // ONE (tok, id) aggregation over the pruned stream, then
    // per-term filters of the digest — grouping on (tok, id) is
    // satisfied by the artifact's tok-bucketing, so the serve plan
    // keeps the bucket-pruned scan AND skips the exchange (a
    // per-term groupBy(id) made DisableUnnecessaryBucketedScan drop
    // the bucketed scan entirely — PlanSpec caught it)
    val perDoc = ptoks.groupBy(col("tok"), col("id"))
      .agg(min(col("pos")).as("p0"), count(lit(1)).as("tf"))
    val matches = terms.map { case (qid, t) =>
      perDoc.filter(col("tok") === t)
        .select(lit(qid).as("qid"), col("id"), col("p0"), col("tf"))
    }.reduce(_ unionByName _)
    // 0-based min pos → 1-based slice window [p−w, p+w] clamped
    val p1 = col("p0") + 1
    val start = greatest(p1 - w, lit(1))
    val stop = least(p1 + w, size(col("ts")))
    val snip = matches.join(base, "id")
      .select(col("qid"), col("id"), col("tf"),
        array_join(slice(col("ts"), start, stop - start + 1), " ")
          .as("snippet"))
    val win = Window.partitionBy(col("qid"))
      .orderBy(col("tf").desc, col("id").asc)
    snip.withColumn("rank", row_number().over(win).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("doc_id"),
        col("tf"), col("snippet"))
  }

  /** Keyword-in-context top-k, in-plan: the RAG-citation/snippet
    * operator — for each term the docs with the most hits, each with
    * the first hit's ±w token window as text.
    */
  def kwicTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int = KwicWindow,
      terms: Seq[(Long, String)] = KwicTerms): DataFrame = {
    val base = Caching.cachedOnce(
      docs.select(col(idCol).cast("long").as("id"),
        TextAnalysis.tokens(col(textCol)).as("ts")))
    val ptoks = base
      .select(col("id"), posexplode(col("ts")).as(Seq("pos", "tok")))
      .filter(col("tok").isin(terms.map(_._2).distinct: _*))
    kwicRank(ptoks, base, terms, w, k)
  }

  /** DuckDB twin of [[kwicTopK]] — 1-based positions throughout, the
    * same clamped [p−w, p+w] window and (tf desc, doc) ranking.
    */
  def kwicTopKSql(id: String, text: String, table: String, k: Int,
      w: Int = KwicWindow,
      terms: Seq[(Long, String)] = KwicTerms): String = {
    val legs = terms.map { case (qid, t) =>
      s"""SELECT $qid::BIGINT AS qid, doc_id, min(pos) AS p1,
         |  count(*)::BIGINT AS tf
         |FROM ptoks WHERE tok = '$t' GROUP BY 1, 2""".stripMargin
    }
    s"""WITH base AS (
       |  SELECT $id AS doc_id, ${TextAnalysis.tokensSql(text)} AS ts
       |  FROM $table),
       |ptoks AS (
       |  SELECT doc_id, unnest(ts) AS tok,
       |    generate_subscripts(ts, 1) AS pos
       |  FROM base),
       |m AS (${legs.mkString(" UNION ALL ")}),
       |snip AS (
       |  SELECT m.qid, m.doc_id, m.tf,
       |    array_to_string(
       |      b.ts[greatest(m.p1 - $w, 1):least(m.p1 + $w, len(b.ts))],
       |      ' ') AS snippet
       |  FROM m JOIN base b ON b.doc_id = m.doc_id)
       |SELECT qid, rank, doc_id, tf, snippet FROM (
       |  SELECT qid, doc_id, tf, snippet,
       |    row_number() OVER (PARTITION BY qid
       |      ORDER BY tf DESC, doc_id ASC) AS rank
       |  FROM snip) WHERE rank <= $k""".stripMargin
  }

  // -------------------------------------- X154 sloppy ordered phrase

  /** Fixed sloppy-phrase set for the gate queries: (pid, terms,
    * slop). The semantics (documented at [[sloppyMatches]]) make
    * slop 0 coincide with the exact phrase, so the set deliberately
    * pairs phrases X150 provably misses — near-verbatim quotes whose
    * tokens are separated by an interposed word, the contamination /
    * quote-detection case (RetrievalSpec pins one).
    */
  val SloppyPhrases: Seq[(Long, Seq[String], Int)] = Seq(
    (0L, Seq("hash", "join"), 2),
    (1L, Seq("big", "scan"), 3),
    (2L, Seq("data", "query", "slow"), 4),
    (3L, Seq("order", "scan"), 1))

  /** Every ordered in-window occurrence of `terms` in a positional
    * stream — the sloppy-phrase match core (Lucene PhraseQuery-slop
    * flavored, with an exactly-specified oracle-matchable rule):
    * positions p0 < p1 < … < p(m−1), term j at pj, total width
    * p(m−1) − p0 ≤ (m−1) + slop. Slop 0 degenerates to the exact
    * adjacent phrase ([[phraseStarts]]).
    *
    * Shape: each term's (pruned) position list joins the chain on id
    * with the order predicate AND the per-step width bound
    * pj − p0 ≤ j + slop — which is NECESSARY (the remaining terms
    * need m−1−j strictly-increasing slots) and at j = m−1 exactly
    * the final constraint, so the chain prunes maximally without
    * changing the match set. One row per position TUPLE: n_occ
    * counts distinct in-window orderings, identically in both
    * engines. Cost ∝ the phrase terms' position lists (bucket-pruned
    * when served from the artifact), never the corpus.
    */
  private[graft] def sloppyMatches(ptoks: DataFrame,
      terms: Seq[String], slop: Int): DataFrame = {
    val legs = terms.zipWithIndex.map { case (t, j) =>
      ptoks.filter(col("tok") === t)
        .select(col("id"), col("pos").as(s"p$j"))
    }
    legs.zipWithIndex.tail.foldLeft(legs.head) { case (acc, (leg, j)) =>
      acc.join(leg, Seq("id"))
        .filter(col(s"p$j") > col(s"p${j - 1}") &&
          col(s"p$j") - col("p0") <= lit(j + slop))
    }
  }

  /** Rank sloppy-phrase matches — shared by the in-plan
    * [[sloppyTopK]] and the artifact-served
    * [[TextIndex.searchSloppy]], like [[phraseRank]]. Output:
    * (pid, rank, doc_id, n_occ), (n_occ desc, doc_id) ranking.
    */
  private[graft] def sloppyRank(ptoks: DataFrame,
      phrases: Seq[(Long, Seq[String], Int)], k: Int): DataFrame = {
    val matches = phrases.map { case (pid, terms, slop) =>
      sloppyMatches(ptoks, terms, slop)
        .select(lit(pid).as("pid"), col("id"))
    }.reduce(_ unionByName _)
    val counts = matches.groupBy(col("pid"), col("id"))
      .agg(count(lit(1)).as("n_occ"))
    val w = Window.partitionBy(col("pid"))
      .orderBy(col("n_occ").desc, col("id").asc)
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("pid"), col("rank"), col("id").as("doc_id"),
        col("n_occ"))
  }

  /** Sloppy ordered-phrase search, in-plan: posexplode ONCE pruned
    * to the phrases' terms, then [[sloppyRank]].
    */
  def sloppyTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int,
      phrases: Seq[(Long, Seq[String], Int)] = SloppyPhrases): DataFrame = {
    val terms = phrases.flatMap(_._2).distinct
    val ptoks = Caching.cachedOnce(
      docs.select(col(idCol).cast("long").as("id"),
          posexplode(TextAnalysis.tokens(col(textCol)))
            .as(Seq("pos", "tok")))
        .filter(col("tok").isin(terms: _*)))
    sloppyRank(ptoks, phrases, k)
  }

  /** DuckDB twin of [[sloppyTopK]] — the same join chain with the
    * same order + per-step width predicates, the same tuple
    * counting and (n_occ desc, doc_id) ranking.
    */
  def sloppyTopKSql(id: String, text: String, table: String, k: Int,
      phrases: Seq[(Long, Seq[String], Int)] = SloppyPhrases): String = {
    val legs = phrases.map { case (pid, terms, slop) =>
      val sides = terms.zipWithIndex.map { case (t, j) =>
        s"(SELECT doc_id, pos AS p$j FROM ptoks WHERE tok = '$t') a$j"
      }
      val from = sides.head + terms.indices.tail.map { j =>
        s" JOIN ${sides(j)} ON a$j.doc_id = a0.doc_id" +
          s" AND a$j.p$j > a${j - 1}.p${j - 1}" +
          s" AND a$j.p$j - a0.p0 <= ${j + slop}"
      }.mkString
      s"SELECT $pid::BIGINT AS pid, a0.doc_id AS doc_id FROM $from"
    }
    s"""WITH ptoks AS (
       |  SELECT $id AS doc_id,
       |    unnest(${TextAnalysis.tokensSql(text)}) AS tok,
       |    generate_subscripts(${TextAnalysis.tokensSql(text)}, 1) AS pos
       |  FROM $table),
       |pm AS (${legs.mkString(" UNION ALL ")}),
       |pc AS (SELECT pid, doc_id, count(*) AS n_occ FROM pm GROUP BY 1, 2)
       |SELECT pid, rank, doc_id, n_occ FROM (
       |  SELECT pid, doc_id, n_occ,
       |    row_number() OVER (PARTITION BY pid
       |      ORDER BY n_occ DESC, doc_id ASC) AS rank
       |  FROM pc) WHERE rank <= $k""".stripMargin
  }

  // ------------------------------------ X155 KWIC over a ranking

  /** Snippets for an existing per-query RANKING — X153's window
    * extraction composed with X68's BM25 ranking: each ranked
    * (qid, doc) row gains the ±w token window around the FIRST
    * occurrence (min position) of ANY of the query's terms in the
    * doc. Deterministic (min over positions), match-set-sized (the
    * token arrays join only the k ranked ids per query), shared by
    * the in-plan [[kwicMultiTopK]] and the artifact-served
    * [[TextIndex.searchKwicMulti]]. Every BM25-ranked doc matches at
    * least one query term (a no-term doc cannot score), so the
    * first-hit join is total over the ranking.
    */
  private[graft] def kwicForRanking(ranked: DataFrame, ptoks: DataFrame,
      base: DataFrame, queries: Seq[(Long, Seq[String])],
      w: Int): DataFrame = {
    val firstHit = ptoks.join(broadcast(queryDf(ptoks, queries)), "tok")
      .groupBy(col("qid"), col("id")).agg(min(col("pos")).as("p0"))
    val hits = ranked.join(firstHit,
      ranked("qid") === firstHit("qid") &&
        ranked("doc_id") === firstHit("id"))
      .select(ranked("qid"), col("rank"), col("doc_id"),
        col("score_micros"), col("p0"))
    val p1 = col("p0") + 1
    val start = greatest(p1 - w, lit(1))
    val stop = least(p1 + w, size(col("ts")))
    hits.join(base, col("doc_id") === base("id"))
      .select(col("qid"), col("rank"), col("doc_id"),
        col("score_micros"),
        array_join(slice(col("ts"), start, stop - start + 1), " ")
          .as("snippet"))
  }

  /** BM25 top-k WITH snippets, in-plan: the serve-and-cite loop as
    * one operator — rank with [[bm25TopK]], snippet each hit from
    * the same corpus. Output: (qid, rank, doc_id, score_micros,
    * snippet).
    */
  def kwicMultiTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int = KwicWindow,
      queries: Seq[(Long, Seq[String])] = Queries): DataFrame = {
    val ranked = bm25TopK(docs, idCol, textCol, k, queries)
    val base = Caching.cachedOnce(
      docs.select(col(idCol).cast("long").as("id"),
        TextAnalysis.tokens(col(textCol)).as("ts")))
    val ptoks = base
      .select(col("id"), posexplode(col("ts")).as(Seq("pos", "tok")))
      .filter(col("tok").isin(queries.flatMap(_._2).distinct: _*))
    kwicForRanking(ranked, ptoks, base, queries, w)
  }

  /** DuckDB twin of [[kwicMultiTopK]] — [[bm25TopKSql]] as the
    * ranking subquery, the same min-position-of-any-query-term
    * window extraction (1-based throughout).
    */
  def kwicMultiTopKSql(id: String, text: String, table: String,
      k: Int, w: Int = KwicWindow,
      queries: Seq[(Long, Seq[String])] = Queries): String = {
    val qvals = queriesValuesSqlOf(queries)
    s"""WITH kbase AS (
       |  SELECT $id AS doc_id, ${TextAnalysis.tokensSql(text)} AS ts
       |  FROM $table),
       |kptoks AS (
       |  SELECT doc_id, unnest(ts) AS tok,
       |    generate_subscripts(ts, 1) AS pos
       |  FROM kbase),
       |kqs(qid, tok) AS (VALUES $qvals),
       |fh AS (
       |  SELECT kqs.qid, kptoks.doc_id, min(pos) AS p1
       |  FROM kptoks JOIN kqs ON kqs.tok = kptoks.tok
       |  GROUP BY 1, 2),
       |rk AS (${bm25TopKSql(id, text, table, k, queries)}),
       |out AS (
       |  SELECT rk.qid AS qid, rk.rank AS rank, rk.doc_id AS doc_id,
       |    rk.score_micros AS score_micros,
       |    array_to_string(
       |      b.ts[greatest(fh.p1 - $w, 1):least(fh.p1 + $w, len(b.ts))],
       |      ' ') AS snippet
       |  FROM rk
       |  JOIN fh ON fh.qid = rk.qid AND fh.doc_id = rk.doc_id
       |  JOIN kbase b ON b.doc_id = rk.doc_id)
       |SELECT qid, rank, doc_id, score_micros, snippet FROM out""".stripMargin
  }

  /** DuckDB twin of [[phraseTopK]]: unnest + generate_subscripts
    * zip to the same 0/1-based-irrelevant positional stream (only
    * position DIFFERENCES matter), the same per-term shifted
    * self-joins, the same (n_occ desc, doc_id) ranking.
    */
  def phraseTopKSql(id: String, text: String, table: String, k: Int,
      phrases: Seq[(Long, Seq[String])] = Phrases): String = {
    val legs = phrases.map { case (pid, terms) =>
      val sides = terms.zipWithIndex.map { case (t, j) =>
        s"(SELECT doc_id, pos - $j AS start FROM ptoks WHERE tok = '$t') a$j"
      }
      val from = sides.head +
        sides.tail.map(s => s" JOIN $s USING (doc_id, start)").mkString
      s"SELECT $pid::BIGINT AS pid, a0.doc_id AS doc_id, a0.start AS start FROM $from"
    }
    s"""WITH ptoks AS (
       |  SELECT $id AS doc_id,
       |    unnest(${TextAnalysis.tokensSql(text)}) AS tok,
       |    generate_subscripts(${TextAnalysis.tokensSql(text)}, 1) AS pos
       |  FROM $table),
       |pm AS (${legs.mkString(" UNION ALL ")}),
       |pc AS (SELECT pid, doc_id, count(*) AS n_occ FROM pm GROUP BY 1, 2)
       |SELECT pid, rank, doc_id, n_occ FROM (
       |  SELECT pid, doc_id, n_occ,
       |    row_number() OVER (PARTITION BY pid
       |      ORDER BY n_occ DESC, doc_id ASC) AS rank
       |  FROM pc) WHERE rank <= $k""".stripMargin
  }

  /** DuckDB twin of [[bm25TopK]] — same constants, same micro
    * quantization before the sum, same (score desc, id) ranking.
    */
  def bm25TopKSql(id: String, text: String, table: String, k: Int,
      queries: Seq[(Long, Seq[String])] = Queries): String =
    s"""WITH toks AS (
       |  SELECT $id AS id, unnest(${TextAnalysis.tokensSql(text)}) AS tok
       |  FROM $table),
       |tf AS (SELECT id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT id, sum(tf) AS dl FROM tf GROUP BY 1),
       |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
       |corpus AS (SELECT count(*) AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
       |qs(qid, tok) AS (VALUES ${queriesValuesSqlOf(queries)}),
       |scored AS (
       |  SELECT qs.qid, tf.id,
       |    sum(round(ln(1.0 + (n::DOUBLE - df::DOUBLE + 0.5) / (df::DOUBLE + 0.5))
       |      * (tf::DOUBLE * ${K1 + 1.0})
       |      / (tf::DOUBLE + $K1 * (1.0 - $B + $B * dl::DOUBLE / avgdl))
       |      * 1e6)::BIGINT)::BIGINT AS score_micros
       |  FROM tf JOIN qs ON qs.tok = tf.tok
       |  JOIN dl ON dl.id = tf.id
       |  JOIN dft ON dft.tok = tf.tok
       |  CROSS JOIN corpus
       |  GROUP BY 1, 2),
       |r AS (SELECT qid, id, score_micros, row_number() OVER (
       |        PARTITION BY qid ORDER BY score_micros DESC, id) AS rank
       |      FROM scored)
       |SELECT qid, rank::BIGINT AS rank, id AS doc_id, score_micros
       |FROM r WHERE rank <= $k""".stripMargin

  /** X130 impact-ordered posting pruning: per TERM, keep only the m
    * postings with the highest BM25 contribution — which is
    * query-INDEPENDENT (a function of tf/df/dl/avgdl only), so the
    * pruned index is a build-time artifact and serving reads m
    * postings per query term instead of df. Corpus stats (df, dl,
    * avgdl) stay the FULL corpus's: pruning drops which postings
    * score, never what they score. Output contract = [[bm25TopK]]'s.
    */
  def bm25PrunedTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int, m: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val tf = Caching.cachedOnce(
      toks.groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf")))
    val dl = tf.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    val qdf = queryDf(docs)
    val dfT = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .join(broadcast(qdf.select(col("tok")).distinct()), Seq("tok"),
        "left_semi")
    val corpus = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
      .select(col("n"), (col("sumdl").cast("double") / col("n")).as("avgdl"))
    // per-posting impact; the per-term top-m is the pruned index
    // (row_number over tok → partial WindowGroupLimit, the X95 shape)
    val impact = tf
      .join(broadcast(dfT), "tok") // restricts to query terms first
      .join(dl, "id")
      .join(broadcast(corpus))
      .select(col("tok"), col("id"),
        contribMicros(col("tf"), col("df"), col("dl"), col("n"),
          col("avgdl")).as("c"))
    val wm = Window.partitionBy(col("tok"))
      .orderBy(col("c").desc, col("id").asc)
    val pruned = impact.withColumn("rn", row_number().over(wm))
      .filter(col("rn") <= m)
    val scored = pruned
      .join(broadcast(qdf), "tok")
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("c")).as("score_micros"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_micros").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id").as("doc_id"),
        col("score_micros"))
  }

  def bm25PrunedTopKSql(id: String, text: String, table: String,
      k: Int, m: Int): String =
    s"""WITH toks AS (
       |  SELECT $id AS id, unnest(${TextAnalysis.tokensSql(text)}) AS tok
       |  FROM $table),
       |tf AS (SELECT id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT id, sum(tf) AS dl FROM tf GROUP BY 1),
       |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
       |corpus AS (SELECT count(*) AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
       |qs(qid, tok) AS (VALUES $queriesValuesSql),
       |imp AS (
       |  SELECT tf.tok, tf.id,
       |    round(ln(1.0 + (n::DOUBLE - df::DOUBLE + 0.5) / (df::DOUBLE + 0.5))
       |      * (tf::DOUBLE * ${K1 + 1.0})
       |      / (tf::DOUBLE + $K1 * (1.0 - $B + $B * dl::DOUBLE / avgdl))
       |      * 1e6)::BIGINT AS c
       |  FROM tf JOIN dl ON dl.id = tf.id
       |  JOIN dft ON dft.tok = tf.tok
       |  CROSS JOIN corpus
       |  WHERE tf.tok IN (SELECT tok FROM qs)),
       |pr AS (SELECT tok, id, c, row_number() OVER (
       |         PARTITION BY tok ORDER BY c DESC, id) AS rn FROM imp),
       |scored AS (
       |  SELECT qs.qid, pr.id, sum(c)::BIGINT AS score_micros
       |  FROM pr JOIN qs ON qs.tok = pr.tok WHERE rn <= $m GROUP BY 1, 2),
       |r AS (SELECT qid, id, score_micros, row_number() OVER (
       |        PARTITION BY qid ORDER BY score_micros DESC, id) AS rank
       |      FROM scored)
       |SELECT qid, rank::BIGINT AS rank, id AS doc_id, score_micros
       |FROM r WHERE rank <= $k""".stripMargin

  /** Recall@k of the pruned index vs full BM25 per query — the
    * posting-budget/recall curve (the [[graft.ops.Similarity]]
    * measured-recall discipline applied to retrieval). The
    * denominator is the query's ACTUAL truth size (a sparse query can
    * match fewer than k docs; dividing by k would under-report it).
    */
  def bm25PrunedRecall(docs: DataFrame, idCol: String, textCol: String,
      k: Int, m: Int): DataFrame = {
    val truth = bm25TopK(docs, idCol, textCol, k)
    val approx = bm25PrunedTopK(docs, idCol, textCol, k, m)
    truth.as("t")
      .join(approx.as("a"),
        col("t.qid") === col("a.qid") &&
          col("t.doc_id") === col("a.doc_id"), "left")
      .groupBy(col("t.qid").as("qid"))
      .agg(round(count(col("a.doc_id")).cast("double")
        / count(col("t.doc_id")) * 1e6).cast("long").as("recall_micros"))
  }

  def bm25PrunedRecallSql(id: String, text: String, table: String,
      k: Int, m: Int): String =
    s"""SELECT t.qid AS qid,
       |  round(count(a.doc_id)::DOUBLE / count(t.doc_id) * 1e6)::BIGINT
       |    AS recall_micros
       |FROM (${bm25TopKSql(id, text, table, k)}) t
       |LEFT JOIN (${bm25PrunedTopKSql(id, text, table, k, m)}) a
       |  ON t.qid = a.qid AND t.doc_id = a.doc_id
       |GROUP BY 1""".stripMargin

  // ----------------------------------------- X147 retrieval quality metrics

  /** Per-rank nDCG discount weights in integer micros,
    * w(r) = round(1e6 / log2(r + 1)), PRECOMPUTED in Scala and
    * inlined into BOTH engines — a runtime log2 could differ by an
    * ulp between JVMs/DuckDB and flip a rounding; a shared literal
    * table cannot. idcg(m) = Σ_{r≤m} w(r) is its prefix sum (exact
    * long addition).
    */
  private def dcgWeights(k: Int): IndexedSeq[Long] =
    (1 to k).map(r => math.round(1e6 / (math.log(r + 1.0) / math.log(2.0))))

  private def idcgPrefix(k: Int): IndexedSeq[Long] =
    dcgWeights(k).scanLeft(0L)(_ + _).tail

  /** Deterministic relevance fixture for the [[Queries]] set: a doc
    * is relevant to a query iff it contains EVERY term of the query
    * (boolean conjunctive retrieval — the classic binary qrel a
    * ranker is scored against when no human judgments exist). Cost ∝
    * the query terms' postings: the distinct (doc, tok) stream joins
    * the broadcast query terms and a doc survives on matching the
    * full term count — no corpus-wide work beyond the token scan.
    */
  def relevanceConjunctive(docs: DataFrame, idCol: String,
      textCol: String,
      queries: Seq[(Long, Seq[String])] = Queries): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .distinct()
    // distinct (qid, tok): a query with a REPEATED term would
    // otherwise count the duplicate into nt while n_terms below is
    // the distinct size — nt > n_terms and no doc could ever be
    // relevant (advice r13; the fixed Queries set has no duplicate
    // terms, so committed hashes were never wrong — latent only)
    val qrows = queries.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
    val qdf = docs.sparkSession.createDataFrame(qrows).toDF("qid", "tok")
      .distinct()
    val qn = queries.map { case (qid, ts) => (qid, ts.distinct.size.toLong) }
    val qnDf = docs.sparkSession.createDataFrame(qn).toDF("qid", "n_terms")
    toks.join(broadcast(qdf), "tok")
      .groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("nt"))
      .join(broadcast(qnDf), "qid")
      .filter(col("nt") === col("n_terms"))
      .select(col("qid"), col("doc_id"))
  }

  /** Ranking-quality metrics of `ranked` (qid, rank, doc_id — any
    * ranker's top-k contract) against a binary relevance set rel
    * (qid, doc_id): per query MRR, precision@k, recall@k and nDCG@k,
    * all in integer micros from long-exact intermediate sums (the
    * discount table is a shared literal — see [[dcgWeights]]).
    * Queries with no relevant doc at all are omitted (nothing to
    * score against); a query whose top-k missed every relevant doc
    * reports zeros. Scale: `rel` aggregates to one (qid, n_rel)
    * digest; the hit join is |ranked| = |queries|·k rows against the
    * relevance keys — per-query digests all the way, no corpus
    * shuffle.
    */
  def retrievalMetrics(ranked: DataFrame, rel: DataFrame,
      k: Int): DataFrame = {
    val ws = dcgWeights(k)
    val wMap = typedLit(ws.zipWithIndex.map { case (w, i) => (i + 1) -> w }.toMap)
    val idcgMap = typedLit(idcgPrefix(k).zipWithIndex
      .map { case (c, i) => (i + 1) -> c }.toMap)
    val relC = Caching.cachedOnce(rel.select(col("qid"), col("doc_id")))
    val nRel = relC.groupBy(col("qid")).agg(count(lit(1)).as("n_rel"))
    val perQ = ranked
      .join(relC, Seq("qid", "doc_id"), "left_semi")
      .groupBy(col("qid"))
      .agg(min(col("rank")).as("frr"),
        count(lit(1)).as("hits"),
        sum(element_at(wMap, col("rank").cast("int"))).as("dcg"))
    nRel.join(perQ, Seq("qid"), "left")
      .select(col("qid"), col("n_rel"),
        coalesce(col("frr"), lit(0L)).as("first_rel_rank"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        when(col("frr").isNull, 0L)
          .otherwise(round(lit(1e6) / col("frr")).cast("long"))
          .as("mrr_micros"),
        round(coalesce(col("hits"), lit(0L)).cast("double") * 1e6 / k)
          .cast("long").as("precision_micros"),
        round(coalesce(col("hits"), lit(0L)).cast("double") * 1e6
          / col("n_rel")).cast("long").as("recall_micros"),
        when(col("dcg").isNull, 0L)
          .otherwise(round(col("dcg").cast("double") * 1e6 /
            element_at(idcgMap, least(col("n_rel"), lit(k.toLong)).cast("int"))))
          .cast("long").as("ndcg_micros"))
  }

  /** The gate composition: [[bm25TopK]] scored against the
    * conjunctive qrels — "how good is the ranker we actually serve",
    * measured, per query. Output: (qid, n_rel, first_rel_rank, hits,
    * mrr_micros, precision_micros, recall_micros, ndcg_micros).
    */
  def bm25Metrics(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    retrievalMetrics(bm25TopK(docs, idCol, textCol, k),
      relevanceConjunctive(docs, idCol, textCol), k)

  def bm25MetricsSql(id: String, text: String, table: String,
      k: Int): String =
    retrievalMetricsSql(bm25TopKSql(id, text, table, k), id, text,
      table, k)

  /** DuckDB twin of [[retrievalMetrics]] over any ranker SQL emitting
    * (qid, rank, doc_id, ...), scored against the conjunctive qrels
    * of `table` — the same generated weight/idcg literals as the
    * Spark side.
    */
  def retrievalMetricsSql(rankedSql: String, id: String, text: String,
      table: String, k: Int): String = {
    val wCase = dcgWeights(k).zipWithIndex
      .map { case (w, i) => s"WHEN ${i + 1} THEN $w" }.mkString(" ")
    val idcgCase = idcgPrefix(k).zipWithIndex
      .map { case (c, i) => s"WHEN ${i + 1} THEN $c" }.mkString(" ")
    s"""WITH ranked AS ($rankedSql),
       |rtoks AS (
       |  SELECT DISTINCT $id AS doc_id,
       |    unnest(${TextAnalysis.tokensSql(text)}) AS tok FROM $table),
       |rqs(qid, tok) AS (VALUES $queriesValuesSql),
       |rqsd AS (SELECT DISTINCT qid, tok FROM rqs),
       |rqn AS (SELECT qid, count(DISTINCT tok) AS n_terms FROM rqs GROUP BY 1),
       |rel AS (
       |  SELECT m.qid, m.doc_id FROM (
       |    SELECT rqsd.qid, rtoks.doc_id, count(*) AS nt
       |    FROM rtoks JOIN rqsd ON rqsd.tok = rtoks.tok GROUP BY 1, 2) m
       |  JOIN rqn ON rqn.qid = m.qid AND m.nt = rqn.n_terms),
       |nrel AS (SELECT qid, count(*) AS n_rel FROM rel GROUP BY 1),
       |perq AS (
       |  SELECT r.qid, min(r.rank) AS frr, count(*) AS hits,
       |    sum(CASE r.rank $wCase END)::BIGINT AS dcg
       |  FROM ranked r JOIN rel ON rel.qid = r.qid AND rel.doc_id = r.doc_id
       |  GROUP BY 1)
       |SELECT n.qid, n.n_rel::BIGINT AS n_rel,
       |  coalesce(p.frr, 0)::BIGINT AS first_rel_rank,
       |  coalesce(p.hits, 0)::BIGINT AS hits,
       |  CASE WHEN p.frr IS NULL THEN 0
       |       ELSE round(1e6 / p.frr) END::BIGINT AS mrr_micros,
       |  round(coalesce(p.hits, 0)::DOUBLE * 1e6 / $k)::BIGINT
       |    AS precision_micros,
       |  round(coalesce(p.hits, 0)::DOUBLE * 1e6 / n.n_rel)::BIGINT
       |    AS recall_micros,
       |  CASE WHEN p.dcg IS NULL THEN 0
       |       ELSE round(p.dcg::DOUBLE * 1e6 /
       |         (CASE least(n.n_rel, $k) $idcgCase END)) END::BIGINT
       |    AS ndcg_micros
       |FROM nrel n LEFT JOIN perq p ON p.qid = n.qid""".stripMargin
  }

  /** Reciprocal-rank fusion of two rankings (qid, rank, doc col):
    * fused score = Σ round(1e9 / (RrfK + rank)) over the lists a doc
    * appears in — integer nanos, so the cross-list sum is exact.
    * Output: (qid, rank, doc_id, rrf_nanos, n_lists).
    */
  def rrfFuse(a: DataFrame, aDoc: String, b: DataFrame, bDoc: String,
      k: Int): DataFrame = {
    def side(d: DataFrame, doc: String): DataFrame =
      d.select(col("qid"), col(doc).as("doc_id"),
        round(lit(1e9) / (lit(RrfK) + col("rank").cast("double")))
          .cast("long").as("contrib"))
    val fused = side(a, aDoc).unionByName(side(b, bDoc))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("contrib")).as("rrf_nanos"),
        count(lit(1)).cast("long").as("n_lists"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("rrf_nanos").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("doc_id"), col("rrf_nanos"),
        col("n_lists"))
  }

  /** Pseudo-relevance feedback (X104) — the RM3/Rocchio move on the
    * BM25 index: run the original query, treat its top `fbDocs` docs
    * as pseudo-relevant, harvest the `fbTerms` most characteristic
    * terms from them (weight = Σ over feedback docs of the doc's
    * normalized term frequency, micro-quantized per (doc, term)
    * BEFORE the sum — the float-sum rule), and rescore with the
    * expanded weighted query (original terms at weight 10⁶,
    * expansion terms at their harvested micros; per-term BM25
    * contributions scale by weight in exact integer math:
    * (w · c) div 10⁶, both non-negative so Spark `div` == DuckDB
    * `//`). The PRF point: a document using only the VOCABULARY of
    * the relevant set — never the query's literal terms — can enter
    * the ranking (OpsSpec pins exactly that).
    *
    * == 100 TB shape ==
    *
    * One shared index build (the [[bm25TopK]] partial-agg shuffles,
    * built once and reused by both scoring passes); the feedback
    * set is k rows per query and BROADCASTS against tf to harvest
    * expansion terms (cost ∝ feedback docs' vocabularies); the
    * rescore is the same broadcast posting join as stage 1 with
    * |queries|·(orig + fbTerms) terms — still ∝ matched postings,
    * never corpus size.
    */
  /** The shared posting-index frames of the PRF stages: (tf, dl,
    * dfT, corpus, orig). tf/dl are cache-once so both scoring passes
    * reuse one build.
    */
  private def prfIndex(docs: DataFrame, idCol: String, textCol: String) = {
    val toks = docs.select(col(idCol).as("id"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val tf = Caching.cachedOnce(
      toks.groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf")))
    val dl = Caching.cachedOnce(
      tf.groupBy(col("id")).agg(sum(col("tf")).as("dl")))
    val dfT = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val corpus = dl.agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
      .select(col("n"), (col("sumdl").cast("double") / col("n")).as("avgdl"))
    (tf, dl, dfT, corpus, queryDf(docs))
  }

  private def prfScorePass(tf: DataFrame, dl: DataFrame, dfT: DataFrame,
      corpus: DataFrame, qterms: DataFrame): DataFrame = {
    // Restrict the df broadcast to THIS pass's query vocabulary
    // (originals in pass 1, originals + harvested expansion terms in
    // pass 3) — qterms is |queries|·(orig+fbTerms) rows, so the
    // broadcast is query-sized, never |vocab|-sized; the left-semi
    // pushes below dfT's aggregation. Results are unchanged: the
    // scored stream is already term-restricted by the qterms join.
    val dfQ = dfT.join(broadcast(qterms.select(col("tok")).distinct()),
      Seq("tok"), "left_semi")
    tf
    .join(broadcast(qterms), "tok")
    .join(dl, "id")
    .join(broadcast(dfQ), "tok")
    .join(broadcast(corpus))
    .select(col("qid"), col("id"), col("w_micros"),
      contribMicros(col("tf"), col("df"), col("dl"), col("n"),
        col("avgdl")).as("c"))
    .selectExpr("qid", "id",
      "CAST((w_micros * c) div 1000000 AS BIGINT) AS wc")
    .groupBy(col("qid"), col("id"))
    .agg(sum(col("wc")).as("score_micros"))
  }

  private def prfTopK(scored: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_micros").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
  }

  /** Stages 1–2 over prebuilt index frames: the weighted expanded
    * query (qid, tok, w_micros) — originals at 10⁶, harvested terms
    * at their feedback weights.
    */
  private def prfQueryTerms(tf: DataFrame, dl: DataFrame, dfT: DataFrame,
      corpus: DataFrame, orig: DataFrame, fbDocs: Int,
      fbTerms: Int): DataFrame = {
    val fb = prfTopK(prfScorePass(tf, dl, dfT, corpus,
        orig.withColumn("w_micros", lit(1000000L))), fbDocs)
      .select(col("qid"), col("id"))
    val wExp = broadcast(fb).join(tf, "id").join(dl, "id")
      .select(col("qid"), col("tok"),
        round(col("tf").cast("double") * 1e6 / col("dl").cast("double"))
          .cast("long").as("wc"))
      .groupBy(col("qid"), col("tok")).agg(sum(col("wc")).as("w_micros"))
      .join(orig, Seq("qid", "tok"), "left_anti")
    val wWin = Window.partitionBy(col("qid"))
      .orderBy(col("w_micros").desc, col("tok").asc)
    val expTerms = wExp.withColumn("rn", row_number().over(wWin))
      .filter(col("rn") <= fbTerms)
      .select(col("qid"), col("tok"), col("w_micros"))
    orig.withColumn("w_micros", lit(1000000L)).unionByName(expTerms)
  }

  def prfExpandTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int, fbDocs: Int, fbTerms: Int): DataFrame = {
    val (tf, dl, dfT, corpus, orig) = prfIndex(docs, idCol, textCol)
    // The expanded query is an EXPENSIVE subtree (it embeds the whole
    // pass-1 scoring + harvest window), and the rescore references it
    // from two separate exchanges (the qterms broadcast and the df
    // restriction's distinct) — each broadcast executes its subtree
    // independently, so without a cache pass 1 runs once per
    // reference (the r9 q_text_rm3 warm inversion). Cache-once
    // collapses that to one build; the frame is |queries|·(orig +
    // fbTerms) rows, so the cache is query-sized at any corpus scale.
    val qterms = Caching.cachedOnce(
      prfQueryTerms(tf, dl, dfT, corpus, orig, fbDocs, fbTerms))
    prfTopK(prfScorePass(tf, dl, dfT, corpus, qterms), k)
      .select(col("qid"), col("rank"), col("id").as("doc_id"),
        col("score_micros"))
  }

  /** Frozen PRF artifact (X110): the expanded weighted query terms
    * plus the corpus stats they score against — collected ONCE from a
    * static reference corpus (|queries|·(orig+fbTerms) terms + as
    * many idf doubles + one avgdl; driver-side size bounded by the
    * query set, never the corpus). [[scorePrfFrozen]] then scores any
    * frame — batch or stream — as a pure narrow map.
    */
  final case class FrozenPrf(avgdl: Double, idf: Map[String, Double],
      weights: Map[Long, Seq[(String, Long)]])

  def freezePrf(corpus: DataFrame, idCol: String, textCol: String,
      fbDocs: Int, fbTerms: Int): FrozenPrf = {
    val (tf, dl, dfT, corpusStats, orig) = prfIndex(corpus, idCol, textCol)
    val qt = prfQueryTerms(tf, dl, dfT, corpusStats, orig, fbDocs, fbTerms)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val terms = qt.map(_._2).distinct.toSeq
    val Seq(n, sumdl) = dl.agg(count(lit(1)), sum(col("dl")))
      .collect().head.toSeq.map(_.toString.toLong)
    val dfMap = dfT.filter(col("tok").isin(terms: _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val idf = terms.map { t =>
      val d = dfMap.getOrElse(t, 0L).toDouble
      t -> math.log(1.0 + (n - d + 0.5) / (d + 0.5))
    }.toMap
    FrozenPrf(sumdl.toDouble / n, idf,
      qt.groupBy(_._1).map { case (q, xs) =>
        q -> xs.map(x => (x._2, x._3)).toSeq }.toMap)
  }

  /** Score documents against a [[FrozenPrf]] — the PRF analog of
    * [[scoreFrozen]]: per-term tf via the native `stopwordHits`
    * count, contributions quantized then weighted in exact integer
    * math ((w·c − pmod)/10⁶ — same value as the posting join's
    * `(w·c) div 10⁶`), summed per (doc, qid). Pure narrow map: no
    * shuffle, no state; identical on batch and stream. Frozen-on-self
    * reproduces the in-plan stage-3 scores exactly (spec + the
    * shared-oracle twin query prove it).
    */
  def scorePrfFrozen(docs: DataFrame, idCol: String, textCol: String,
      frozen: FrozenPrf): DataFrame = {
    // ONE tokenization + one hash-probe pass per row for every term
    // the model carries (+ the doc length as the array's last slot);
    // the alias is referenced many times below, which is exactly why
    // CollapseProject leaves it as its own computed-once projection
    val allTerms = frozen.weights.values.flatten.map(_._1).toSeq.distinct.sorted
    val pos = allTerms.zipWithIndex.toMap
    val withTc = docs.select(col(idCol).as("id"),
      graft.functions.ArrayExprs.termCounts(
        TextAnalysis.tokens(col(textCol)), allTerms).as("__tc"))
    val dl = element_at(col("__tc"), allTerms.size + 1).cast("double")
    // the posting join keeps every doc that MATCHES a query term,
    // including docs whose rounded contributions sum to 0 (possible
    // when idf is tiny — a term in nearly all docs of a large
    // corpus); the frozen path must reproduce that tail, so the
    // filter below is on match count, not on score > 0
    def matchesOf(ts: Seq[(String, Long)]): Column =
      ts.map { case (t, _) =>
        when(element_at(col("__tc"), pos(t) + 1) > 0, 1).otherwise(0)
      }.reduce(_ + _)
    def scoreOf(ts: Seq[(String, Long)]): Column =
      ts.map { case (t, wMicros) =>
        val tf = element_at(col("__tc"), pos(t) + 1).cast("double")
        val c = lit(frozen.idf(t)) * (tf * (K1 + 1.0)) /
          (tf + lit(K1) * (lit(1.0 - B) + lit(B) * dl / frozen.avgdl))
        val cl = round(c * 1e6).cast("long")
        val prod = lit(wMicros) * cl
        when(tf > 0,
          ((prod - pmod(prod, lit(1000000L))) / lit(1000000L)).cast("long"))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    val scored = frozen.weights.toSeq.sortBy(_._1).map { case (qid, ts) =>
      struct(lit(qid).as("qid"), scoreOf(ts).as("score_micros"),
        matchesOf(ts).as("m"))
    }
    withTc
      .select(col("id"), explode(array(scored: _*)).as("q"))
      .filter(col("q.m") > 0)
      .select(col("id"), col("q.qid").as("qid"),
        col("q.score_micros").as("score_micros"))
  }

  /** [[prfExpandTopK]] served from a frozen artifact: rank the
    * frozen scores — output-identical to the in-plan three-stage
    * query when frozen on the same corpus (the twin shares its
    * oracle verbatim).
    */
  def prfFrozenTopK(docs: DataFrame, idCol: String, textCol: String,
      frozen: FrozenPrf, k: Int): DataFrame =
    prfTopK(scorePrfFrozen(docs, idCol, textCol, frozen), k)
      .select(col("qid"), col("rank"), col("id").as("doc_id"),
        col("score_micros"))

  /** DuckDB twin of [[prfExpandTopK]] — same three stages, same
    * quantization points, same tie-breaks.
    */
  def prfExpandTopKSql(id: String, text: String, table: String,
      k: Int, fbDocs: Int, fbTerms: Int): String = {
    val contrib =
      s"""round(ln(1.0 + (n::DOUBLE - df::DOUBLE + 0.5) / (df::DOUBLE + 0.5))
         |      * (tf::DOUBLE * ${K1 + 1.0})
         |      / (tf::DOUBLE + $K1 * (1.0 - $B + $B * dl::DOUBLE / avgdl))
         |      * 1e6)::BIGINT""".stripMargin
    s"""WITH toks AS (
       |  SELECT $id AS id, unnest(${TextAnalysis.tokensSql(text)}) AS tok
       |  FROM $table),
       |tf AS (SELECT id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dl AS (SELECT id, sum(tf) AS dl FROM tf GROUP BY 1),
       |dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
       |corpus AS (SELECT count(*) AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
       |qs(qid, tok) AS (VALUES $queriesValuesSql),
       |s1 AS (
       |  SELECT qs.qid, tf.id,
       |    sum((1000000 * $contrib) // 1000000)::BIGINT AS score_micros
       |  FROM tf JOIN qs ON qs.tok = tf.tok
       |  JOIN dl ON dl.id = tf.id JOIN dft ON dft.tok = tf.tok
       |  CROSS JOIN corpus GROUP BY 1, 2),
       |fb AS (SELECT qid, id FROM (
       |    SELECT qid, id, row_number() OVER (
       |      PARTITION BY qid ORDER BY score_micros DESC, id) AS rank
       |    FROM s1) WHERE rank <= $fbDocs),
       |wexp AS (
       |  SELECT fb.qid, tf.tok,
       |    sum(round(tf.tf::DOUBLE * 1e6 / dl.dl::DOUBLE)::BIGINT) AS w_micros
       |  FROM fb JOIN tf ON tf.id = fb.id JOIN dl ON dl.id = fb.id
       |  GROUP BY 1, 2),
       |wexc AS (
       |  SELECT w.* FROM wexp w LEFT JOIN qs
       |    ON qs.qid = w.qid AND qs.tok = w.tok
       |  WHERE qs.tok IS NULL),
       |expt AS (SELECT qid, tok, w_micros FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY qid ORDER BY w_micros DESC, tok) AS rn
       |    FROM wexc) WHERE rn <= $fbTerms),
       |qw AS (SELECT qid, tok, 1000000::BIGINT AS w_micros FROM qs
       |       UNION ALL SELECT qid, tok, w_micros FROM expt),
       |s2 AS (
       |  SELECT qw.qid, tf.id,
       |    sum((qw.w_micros * $contrib) // 1000000)::BIGINT AS score_micros
       |  FROM tf JOIN qw ON qw.tok = tf.tok
       |  JOIN dl ON dl.id = tf.id JOIN dft ON dft.tok = tf.tok
       |  CROSS JOIN corpus GROUP BY 1, 2),
       |r AS (SELECT qid, id, score_micros, row_number() OVER (
       |        PARTITION BY qid ORDER BY score_micros DESC, id) AS rank
       |      FROM s2)
       |SELECT qid, rank::BIGINT AS rank, id AS doc_id, score_micros
       |FROM r WHERE rank <= $k""".stripMargin
  }

  // ------------------------------------------- frozen-stats scoring

  /** Frozen BM25 statistics of a static reference corpus — the
    * offline half of the ingest-time keyword gate: per-[[Queries]]
    * term idf plus the corpus length normalizer. Collected ONCE at
    * stage-construction time (one action over the STATIC corpus —
    * exactly the production shape, where index stats are an offline
    * artifact and ingest pays a pure narrow map). The collected set
    * is |query terms| + 1 doubles — driver-side size is bounded by
    * the query set, never the corpus.
    */
  final case class FrozenStats(avgdl: Double, idf: Map[String, Double])

  def freezeStats(corpus: DataFrame, idCol: String,
      textCol: String): FrozenStats = {
    val toks = corpus.select(col(idCol).as("id"),
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    val tf = toks.groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
    val Seq(n, sumdl) = dl.agg(count(lit(1)), sum(col("dl")))
      .collect().head.toSeq.map(_.toString.toLong)
    val terms = Queries.flatMap(_._2).distinct
    val dfMap = tf.filter(col("tok").isin(terms: _*))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val idf = terms.map { t =>
      val df = dfMap.getOrElse(t, 0L).toDouble
      t -> math.log(1.0 + (n.toDouble - df + 0.5) / (df + 0.5))
    }.toMap
    FrozenStats(sumdl.toDouble / n, idf)
  }

  /** Score documents against [[Queries]] with FROZEN corpus stats —
    * a pure narrow map (no shuffle, no state): per-term tf comes from
    * the native `stopwordHits` count over the doc's own tokens, every
    * idf/avgdl is a literal, and the per-query score is a compile-time
    * fold. Works identically on a batch frame and a stream (the
    * streaming keyword gate applies exactly this). Output: one row
    * per (doc, qid) with score ≥ max(1, minScoreMicros) — zero-score
    * docs are absent, mirroring the posting join.
    */
  def scoreFrozen(docs: DataFrame, textCol: String, stats: FrozenStats,
      minScoreMicros: Long): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val dl = size(toks).cast("double")
    def scoreOf(terms: Seq[String]): Column =
      terms.map { t =>
        val tf = graft.functions.ArrayExprs.stopwordHits(toks, Seq(t))
          .cast("double")
        val c = lit(stats.idf(t)) * (tf * (K1 + 1.0)) /
          (tf + lit(K1) * (lit(1.0 - B) + lit(B) * dl / stats.avgdl))
        when(tf > 0, round(c * 1e6).cast("long")).otherwise(lit(0L))
      }.reduce(_ + _)
    val scored = Queries.map { case (qid, terms) =>
      struct(lit(qid).as("qid"), scoreOf(terms).as("score_micros"))
    }
    docs
      .withColumn("q", explode(array(scored: _*)))
      .withColumn("qid", col("q.qid"))
      .withColumn("score_micros", col("q.score_micros"))
      .drop("q")
      .filter(col("score_micros") >= math.max(1L, minScoreMicros))
  }

  /** DuckDB twin of [[rrfFuse]] over two ranking SQLs whose outputs
    * carry (qid, rank, <doc>).
    */
  def rrfFuseSql(aSql: String, aDoc: String, bSql: String, bDoc: String,
      k: Int): String =
    s"""WITH la AS ($aSql), lb AS ($bSql),
       |u AS (
       |  SELECT qid, $aDoc AS doc_id,
       |    round(1e9 / ($RrfK + rank::DOUBLE))::BIGINT AS contrib FROM la
       |  UNION ALL
       |  SELECT qid, $bDoc AS doc_id,
       |    round(1e9 / ($RrfK + rank::DOUBLE))::BIGINT AS contrib FROM lb),
       |f AS (SELECT qid, doc_id, sum(contrib)::BIGINT AS rrf_nanos,
       |        count(*)::BIGINT AS n_lists
       |      FROM u GROUP BY 1, 2),
       |r AS (SELECT *, row_number() OVER (
       |        PARTITION BY qid ORDER BY rrf_nanos DESC, doc_id) AS rank
       |      FROM f)
       |SELECT qid, rank::BIGINT AS rank, doc_id, rrf_nanos, n_lists
       |FROM r WHERE rank <= $k""".stripMargin
}
