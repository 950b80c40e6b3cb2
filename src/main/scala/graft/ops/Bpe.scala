package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE (byte-pair-encoding) vocabulary induction over the corpus —
  * the tokenizer-training step of a training-data pipeline, as a
  * deterministic dataflow (builder brief; beyond-reference extension
  * per SURVEY §2.10 X92).
  *
  * Classic word-level BPE (Sennrich et al., arXiv:1508.07909): the
  * corpus collapses to a (word, count) table, each word spelled as
  * space-separated symbols (initially characters); each round counts
  * adjacent symbol pairs weighted by word count, picks the most
  * frequent pair, and rewrites it as one merged symbol everywhere.
  * The merge table IS the trained artifact — applying it in order
  * reproduces the tokenizer.
  *
  * == 100 TB shape ==
  *
  * The corpus-sized work is exactly ONE pass: the word histogram
  * (narrow tokenize → partial-aggregated count shuffle). Everything
  * after runs on the `maxWords`-row vocabulary table — each round is
  * a pair-count aggregation + a one-row top pick + a broadcast
  * rewrite over a bounded table, independent of corpus bytes. That is
  * the textbook split: histogram once at scale, iterate on the
  * digest. Rounds localCheckpoint the (bounded) working table so
  * round r+1's plan starts flat instead of replaying rounds 1..r —
  * the [[Similarity.kmeans]] pattern.
  *
  * == Determinism contract ==
  *
  * Words: lowercased `[a-z]+` whitespace tokens of 2..16 chars (the
  * engine-common regex subset); vocabulary cut = top `maxWords` by
  * (count desc, word asc); merge pick = (pair_count desc, pair asc);
  * the pair rewrite is a space-padded literal `replace` — both
  * engines substitute left-to-right non-overlapping, and the padding
  * makes a symbol-boundary-crossing substring unmatchable (" bo w "
  * does not contain " o w "), so "a a a" merges to "aa a" on both
  * engines. Integer counts throughout — nothing to quantize.
  */
object Bpe {

  private def spacedChars(w: Column): Column =
    trim(regexp_replace(w, "(.)", "$1 "))

  /** The (word, count) digest: the single corpus-sized pass. */
  private def wordHistogram(docs: DataFrame, textCol: String,
      maxWords: Int): DataFrame =
    docs
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("w"))
      .filter(col("w").rlike("^[a-z]+$") &&
        length(col("w")).between(2, 16))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc).limit(maxWords)
      .select(spacedChars(col("w")).as("sym"), col("n"))

  /** The shared training loop: per-round one-row picks plus the final
    * rewritten vocabulary table.
    */
  private def train(docs: DataFrame, textCol: String, rounds: Int,
      maxWords: Int): (Seq[DataFrame], DataFrame) = {
    var cur = wordHistogram(docs, textCol, maxWords).localCheckpoint()
    val bests = (1 to rounds).map { r =>
      // adjacent symbol pairs of every word, weighted by word count
      // (words collapsed to one symbol have no pairs — filtered, not
      // exploded-empty: Spark's sequence(1, 0) is DESCENDING)
      val best = cur
        .filter(size(split(col("sym"), " ")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(split(sym, ' ')) - 1),
            |  i -> concat(element_at(split(sym, ' '), i), ' ',
            |              element_at(split(sym, ' '), i + 1)))""".stripMargin))
          .as("pair"), col("n"))
        .groupBy(col("pair")).agg(sum(col("n")).as("pair_count"))
        .orderBy(col("pair_count").desc, col("pair").asc).limit(1)
        .localCheckpoint()
      cur = cur.crossJoin(broadcast(best))
        .select(trim(expr(
          """replace(concat(' ', sym, ' '), concat(' ', pair, ' '),
            |        concat(' ', replace(pair, ' ', ''), ' '))""".stripMargin))
          .as("sym"), col("n"))
        .localCheckpoint()
      best.select(lit(r.toLong).as("round"), col("pair"),
        expr("replace(pair, ' ', '')").as("merged"), col("pair_count"))
    }
    (bests, cur)
  }

  /** Train `rounds` BPE merges over `docs(textCol)`.
    * Output: (round, pair, merged, pair_count) — one row per merge,
    * in training order.
    */
  def merges(docs: DataFrame, textCol: String, rounds: Int,
      maxWords: Int): DataFrame =
    train(docs, textCol, rounds, maxWords)._1.reduce(_.unionByName(_))

  /** The APPLY side: the subword vocabulary after `rounds` trained
    * merges — every vocabulary word re-spelled in merged symbols, the
    * pieces exploded and weighted by word count, top `topK` by
    * (weight desc, piece asc). What the trained tokenizer actually
    * emits over this corpus, and the quantity a vocab-size/coverage
    * decision reads.
    * Output: (piece, weight).
    */
  def pieceFrequencies(docs: DataFrame, textCol: String, rounds: Int,
      maxWords: Int, topK: Int): DataFrame =
    train(docs, textCol, rounds, maxWords)._2
      .select(explode(split(col("sym"), " ")).as("piece"), col("n"))
      .groupBy(col("piece")).agg(sum(col("n")).as("weight"))
      .orderBy(col("weight").desc, col("piece").asc).limit(topK)

  /** The unrolled-round CTE block shared by both oracles (w0 →
    * (b1, w1) → … → (bR, wR)), same cut, pick and padded-replace
    * semantics as the Spark side.
    */
  private def ctesSql(text: String, table: String, rounds: Int,
      maxWords: Int): String = {
    // every CTE is MATERIALIZED and each round references its
    // predecessor exactly once (the rewrite cross-joins the one-row
    // pick instead of repeating scalar subqueries) — without this the
    // optimizer inlines the chain and the expansion is 3^rounds scans
    // of the corpus (observed as an fd-exhaustion failure at 12 rounds)
    val w0 =
      s"""w0 AS MATERIALIZED (
         |  SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS sym, n FROM (
         |    SELECT w, count(*)::BIGINT AS n FROM (
         |      SELECT unnest(string_split_regex(lower($text), '\\s+')) AS w
         |      FROM $table)
         |    WHERE regexp_full_match(w, '[a-z]+') AND len(w) BETWEEN 2 AND 16
         |    GROUP BY w ORDER BY n DESC, w LIMIT $maxWords))""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      s"""b$r AS MATERIALIZED (
         |  SELECT pair, pair_count FROM (
         |    SELECT pair, sum(n)::BIGINT AS pair_count FROM (
         |      SELECT unnest([s[i] || ' ' || s[i + 1]
         |                     for i in range(1, len(s))]) AS pair, n
         |      FROM (SELECT string_split(sym, ' ') AS s, n FROM w${r - 1}))
         |    GROUP BY pair)
         |  ORDER BY pair_count DESC, pair LIMIT 1),
         |w$r AS MATERIALIZED (
         |  SELECT trim(replace(' ' || sym || ' ', ' ' || pair || ' ',
         |    ' ' || replace(pair, ' ', '') || ' ')) AS sym, n
         |  FROM w${r - 1} CROSS JOIN b$r)""".stripMargin
    }.mkString(",\n")
    s"WITH $w0,\n$roundCtes"
  }

  /** DuckDB twin of [[merges]]. */
  def mergesSql(text: String, table: String, rounds: Int,
      maxWords: Int): String = {
    val selects = (1 to rounds).map { r =>
      s"""SELECT $r::BIGINT AS round, pair, replace(pair, ' ', '') AS merged,
         |  pair_count FROM b$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"${ctesSql(text, table, rounds, maxWords)}\n$selects"
  }

  /** DuckDB twin of [[pieceFrequencies]] — the merge rounds' final
    * vocabulary CTE (w`rounds`), pieces unnested and count-weighted.
    */
  def pieceFrequenciesSql(text: String, table: String, rounds: Int,
      maxWords: Int, topK: Int): String =
    s"""${ctesSql(text, table, rounds, maxWords)}
       |SELECT piece, sum(n)::BIGINT AS weight FROM (
       |  SELECT unnest(string_split(sym, ' ')) AS piece, n FROM w$rounds)
       |GROUP BY piece ORDER BY weight DESC, piece LIMIT $topK""".stripMargin
}
