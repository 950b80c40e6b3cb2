package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for the LLM-data-pipeline surface (builder
  * brief; extensions beyond the reference per SURVEY §2.9/§7.4): token
  * counting, language ID, quality scoring, document fingerprinting.
  *
  * All operators are pure Catalyst `Column` pipelines over the
  * `documents` table — no UDFs, fully inside whole-stage codegen, no
  * shuffle (per-row narrow transforms). At 100 TB these run at scan
  * speed; the only wide ops downstream are whatever aggregation the
  * caller adds.
  *
  * Each operator has a DuckDB-SQL twin (same constants, generated
  * here) used by the driver's oracle; floating-point outputs are
  * quantized to integer micro-units on both sides so the hash compare
  * is exact.
  */
object TextAnalysis {

  /** Whitespace tokens. Docs are single-space word streams; split on
    * runs of whitespace keeps this robust to real corpora.
    */
  def tokens(text: Column): Column = split(text, "\\s+")
  def tokensSql(e: String): String = s"string_split_regex($e, '\\s+')"

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")
  def tokenCountSql(e: String): String = s"len(${tokensSql(e)})::BIGINT"

  /** BPE-ish subword pieces: letter runs, digit runs, single other
    * non-space chars — the standard pre-tokenizer regex shape.
    */
  val PiecePattern = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def pieceCount(text: Column): Column =
    regexp_count(text, lit(PiecePattern)).cast("long")
  def pieceCountSql(e: String): String =
    s"len(regexp_extract_all($e, '$PiecePattern'))::BIGINT"

  /** Language-ID: stopword-profile hit counts, argmax with a fixed
    * tie-break order (first in [[LangProfiles]] wins), 'und' when no
    * profile hits. A real system swaps the profiles for char-n-gram
    * models; the operator shape (per-row scoring + argmax) is the same.
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "es" -> Seq("el", "la", "y", "los", "de", "es"))

  def langHits(text: Column, words: Seq[String]): Column =
    graft.functions.ArrayExprs.stopwordHits(tokens(text), words)

  def langHitsSql(e: String, words: Seq[String]): String = {
    val inList = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter(${tokensSql(e)}, w -> w IN ($inList)))::BIGINT"
  }

  /** Predicted language: the profile with the strictly highest hit
    * count in declaration order; 'und' when every profile scores 0.
    */
  def langId(text: Column): Column = {
    val hits = LangProfiles.map { case (lang, ws) => lang -> langHits(text, ws) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldLeft(when(best === 0, "und")) { case (acc, (lang, h)) =>
      acc.when(h === best, lang)
    }.otherwise("und")
  }

  def langIdSql(e: String): String = {
    val hits = LangProfiles.map { case (l, ws) => l -> langHitsSql(e, ws) }
    val best = hits.map(_._2).reduce((a, b) => s"greatest($a, $b)")
    val whens = hits.map { case (l, h) => s"WHEN $h = $best THEN '$l'" }
    s"(CASE WHEN $best = 0 THEN 'und' ${whens.mkString(" ")} ELSE 'und' END)"
  }

  /** Quality score in [0, 1], emitted as integer micros:
    * 0.3·min(tokens/100, 1) + 0.4·(1 − stopword_ratio) + 0.3·alpha_ratio.
    * The components are the classic cheap heuristics (length prior,
    * boilerplate via stopword excess, symbol soup via alpha ratio).
    */
  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  def qualityMicros(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val stopRatio = langHits(text, StopWords).cast("double") / n
    val alphaRatio =
      regexp_count(text, lit("[a-zA-Z]")).cast("double") / length(text).cast("double")
    round(
      (least(n / 100.0, lit(1.0)) * 0.3 + (lit(1.0) - stopRatio) * 0.4 +
        alphaRatio * 0.3) * 1e6).cast("long")
  }

  def qualityMicrosSql(e: String): String = {
    val n = s"(${tokenCountSql(e)}::DOUBLE)"
    val stop = s"(${langHitsSql(e, StopWords)}::DOUBLE / $n)"
    val alpha = s"(len(regexp_extract_all($e, '[a-zA-Z]'))::DOUBLE / length($e)::DOUBLE)"
    s"round((least($n / 100.0, 1.0) * 0.3 + (1.0 - $stop) * 0.4 + $alpha * 0.3) * 1e6)::BIGINT"
  }

  /** Repetition signals (the Gopher-report style quality gates for
    * machine-generated/boilerplate text), per document:
    * top-token share, duplicate-token fraction, top-bigram share —
    * all integer micros.
    *
    * Unlike the narrow per-row operators above this one aggregates:
    * explode → per-(doc, gram) counts → per-doc maxima. Every
    * aggregation partial-aggregates map-side and keys on the doc id,
    * so at 100 TB it is two partial-agg shuffles over gram counts
    * (not gram instances) plus one doc-keyed join — no window, no
    * skew beyond document length itself.
    */
  def repetitionStats(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("ts"))
    val uni = toks.select(col("id"), explode(col("ts")).as("tok"))
      .groupBy(col("id"), col("tok")).agg(count(lit(1)).as("n"))
      .groupBy(col("id")).agg(
        sum(col("n")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("n")).as("top_n"))
    val bigrams = when(size(col("ts")) >= 2,
      transform(sequence(lit(1), size(col("ts")) - 1),
        i => concat_ws(" ", element_at(col("ts"), i), element_at(col("ts"), i + 1))))
    val bi = toks.select(col("id"), explode(bigrams).as("bg"))
      .groupBy(col("id"), col("bg")).agg(count(lit(1)).as("n"))
      .groupBy(col("id")).agg(
        sum(col("n")).as("n_bigrams"),
        max(col("n")).as("top_bg_n"))
    uni.join(bi, Seq("id"), "left")
      .select(col("id").as("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("n_distinct").cast("long").as("n_distinct"),
        round(col("top_n").cast("double") / col("n_tokens") * 1e6)
          .cast("long").as("top_tok_micros"),
        round((lit(1.0) - col("n_distinct").cast("double") / col("n_tokens")) * 1e6)
          .cast("long").as("dup_tok_micros"),
        coalesce(round(col("top_bg_n").cast("double") / col("n_bigrams") * 1e6)
          .cast("long"), lit(0L)).as("top_bigram_micros"))
  }

  /** In-row twin of [[repetitionStats]]: the counters come from ONE
    * compiled pass per document (native `rep_stats` expression) — zero
    * shuffle, no explode, streaming-compatible (no cross-row state).
    * Identical output (same counts, same micro math) — the pair shares
    * one oracle, proving the plan-shape equivalence. Prefer this for
    * typical document sizes; the exploded-aggregate form is the
    * pathological-document path (a single doc's grams never fit one
    * row's memory only when the doc itself is pathological).
    */
  def repetitionStatsRow(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val s = col("s")
    docs
      .select(col(idCol).as("doc_id"),
        graft.functions.ArrayExprs.repStats(tokens(col(textCol))).as("s"))
      // a null text yields a null counter array; the exploded-aggregate
      // twin (and the shared oracle's unnest) DROP such docs — match,
      // or the twins' identical-rows contract breaks on null corpora
      .filter(s.isNotNull)
      .select(col("doc_id"),
        element_at(s, 1).as("n_tokens"),
        element_at(s, 2).as("n_distinct"),
        round(element_at(s, 3).cast("double") / element_at(s, 1) * 1e6)
          .cast("long").as("top_tok_micros"),
        round((lit(1.0) - element_at(s, 2).cast("double") / element_at(s, 1)) * 1e6)
          .cast("long").as("dup_tok_micros"),
        when(element_at(s, 4) === 0, lit(0L))
          .otherwise(round(element_at(s, 5).cast("double") / element_at(s, 4) * 1e6)
            .cast("long")).as("top_bigram_micros"))
  }

  def repetitionStatsSql(id: String, text: String, table: String): String =
    s"""WITH d AS (SELECT $id AS id, ${tokensSql(text)} AS ts FROM $table),
       |u AS (SELECT id, unnest(ts) AS tok FROM d),
       |uc AS (SELECT id, tok, count(*) AS n FROM u GROUP BY 1, 2),
       |ua AS (SELECT id, sum(n) AS n_tokens, count(*) AS n_distinct,
       |         max(n) AS top_n FROM uc GROUP BY 1),
       |b AS (SELECT id, unnest(list_transform(generate_series(1, len(ts) - 1),
       |         i -> ts[i] || ' ' || ts[i + 1])) AS bg
       |      FROM d WHERE len(ts) >= 2),
       |bc AS (SELECT id, bg, count(*) AS n FROM b GROUP BY 1, 2),
       |ba AS (SELECT id, sum(n) AS n_bigrams, max(n) AS top_bg_n
       |       FROM bc GROUP BY 1)
       |SELECT ua.id AS doc_id, n_tokens::BIGINT AS n_tokens,
       |  n_distinct::BIGINT AS n_distinct,
       |  round(top_n::DOUBLE / n_tokens * 1e6)::BIGINT AS top_tok_micros,
       |  round((1.0 - n_distinct::DOUBLE / n_tokens) * 1e6)::BIGINT AS dup_tok_micros,
       |  coalesce(round(top_bg_n::DOUBLE / n_bigrams * 1e6)::BIGINT, 0) AS top_bigram_micros
       |FROM ua LEFT JOIN ba ON ua.id = ba.id""".stripMargin

  /** PII scrubbing — the redaction pass a training-data pipeline runs
    * before anything else sees the text. Three pattern families
    * (emails, international-ish phone numbers, IPv4 addresses) are
    * replaced with fixed tags, in a FIXED order (email → phone → ip:
    * replacement text must not be re-matched by a later pattern, and
    * both engines apply the same order so outputs match exactly).
    *
    * The patterns deliberately use only the regex subset with
    * identical semantics in Java regex (Spark, codegen'd
    * `regexp_replace`) and RE2 (DuckDB): character classes, bounded
    * repetition, `\b` word boundaries — no backreferences, no
    * lookaround, no ambiguous alternation. A narrow per-row pass, zero
    * shuffle: at 100 TB this runs at scan speed and is the shape the
    * real pass (more patterns, same operator) would run.
    */
  val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiPhone = "\\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"
  val PiiIpv4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  private val PiiPasses = Seq(
    PiiEmail -> "<EMAIL>", PiiPhone -> "<PHONE>", PiiIpv4 -> "<IP>")

  def piiRedact(text: Column): Column =
    PiiPasses.foldLeft(text) { case (c, (p, tag)) =>
      regexp_replace(c, lit(p), lit(tag))
    }

  def piiRedactSql(e: String): String =
    PiiPasses.foldLeft(e) { case (s, (p, tag)) =>
      s"regexp_replace($s, '$p', '$tag', 'g')"
    }

  /** Per-doc PII hit counts (before redaction) — the audit columns a
    * scrub pass reports alongside the redacted text.
    */
  def piiCounts: Seq[(String, Column => Column)] = Seq(
    "n_emails" -> ((t: Column) => regexp_count(t, lit(PiiEmail)).cast("long")),
    "n_phones" -> ((t: Column) => regexp_count(t, lit(PiiPhone)).cast("long")),
    "n_ips" -> ((t: Column) => regexp_count(t, lit(PiiIpv4)).cast("long")))

  def piiCountsSql(e: String): Seq[(String, String)] = Seq(
    "n_emails" -> s"len(regexp_extract_all($e, '$PiiEmail'))::BIGINT",
    "n_phones" -> s"len(regexp_extract_all($e, '$PiiPhone'))::BIGINT",
    "n_ips" -> s"len(regexp_extract_all($e, '$PiiIpv4'))::BIGINT")

  /** Content fingerprint: md5 of the whitespace-normalized, lowercased
    * text — the exact-dedup key.
    */
  def md5Fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")).cast("binary"))
  def md5FingerprintSql(e: String): String =
    s"md5(lower(regexp_replace(trim($e), '\\s+', ' ', 'g')))"

  /** X97 training-text normalization: control chars (C0 + DEL — this
    * covers every ASCII whitespace except the space itself) become
    * spaces, space runs collapse, ends trim. CASE IS PRESERVED — this
    * is the text a trainer consumes, unlike [[md5Fingerprint]]'s
    * lowercased key. Character classes are spelled as explicit ASCII
    * ranges (never \s or \p{...}) so Java regex and DuckDB's RE2
    * agree by construction (Java's \s includes \x0B, RE2's does not —
    * the one-char divergence an implicit class would smuggle in).
    * ASCII contract: lowercase in [[normalizedKey]] is byte-wise on
    * this corpus; locale-sensitive case folding (Turkish dotted i) is
    * out of scope for the cross-engine oracle.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(text, "[\\x00-\\x1f\\x7f]", " "), " +", " "))

  def normalizeTextSql(e: String): String =
    s"trim(regexp_replace(regexp_replace($e, " +
      s"'[\\x00-\\x1f\\x7f]', ' ', 'g'), ' +', ' ', 'g'))"

  /** The normalization-insensitive dedup key: [[normalizeText]] then
    * lowercase, punctuation stripped, spaces re-collapsed — catches
    * copies that differ only in case/punct/whitespace, which raw
    * [[md5Fingerprint]] (case+whitespace only) misses.
    */
  def normalizedKey(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(normalizeText(text)), "[^a-z0-9 ]", ""),
      " +", " "))

  def normalizedKeySql(e: String): String =
    s"trim(regexp_replace(regexp_replace(lower(${normalizeTextSql(e)}), " +
      s"'[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"

  /** X119 Misra-Gries heavy-hitter summary (the COMPRESS half): per
    * source, exact (token, cnt) counts collapse to at most `k`
    * counters by subtracting the (k+1)-th largest count `t` from
    * everything and dropping what hits zero — the Agarwal-et-al
    * mergeable-summaries rule. The estimates carry the classic MG
    * guarantee: `est ≤ true` and `true − est ≤ n/(k+1)` (every
    * compress step removes ≥ (k+1)·t mass, and total mass is n), so
    * any token with share > 1/(k+1) is GUARANTEED present. Fully
    * deterministic (threshold by (cnt desc, tok asc) rank — a VALUE,
    * so threshold ties all drop together), hence oracle-exact.
    *
    * Why it exists: exact top-k ([[q_text_vocab]]'s shape) needs
    * corpus ranks, which don't merge — this is the fourth and last
    * mergeable statistic the live card family needs (counts X103,
    * ranks-via-bins X113, distincts X115, heavy hitters here); the
    * streaming half is [[graft.streaming.TopKStore]]: combine exact
    * batch counts into the stored summary, re-compress, bound
    * preserved across any number of merges.
    *
    * Output: (source, tok, est_cnt, thresh, n_src) — thresh is this
    * compress's subtracted threshold (the per-step error witness),
    * n_src the source's total token count.
    */
  def mgSummary(docs: DataFrame, textCol: String, sourceCol: String,
      k: Int): DataFrame = {
    val counts = docs
      .select(coalesce(col(sourceCol).cast("string"), lit("<null>"))
          .as("source"),
        explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    mgCompress(counts, k)
  }

  /** The compress step over exact or already-summarized (source, tok,
    * cnt) rows — shared verbatim by the batch op and the streaming
    * store's merge.
    */
  def mgCompress(counts: DataFrame, k: Int): DataFrame = {
    val wRank = Window.partitionBy(col("source"))
      .orderBy(col("cnt").desc, col("tok").asc)
    val wSrc = Window.partitionBy(col("source"))
    counts
      .withColumn("rn", row_number().over(wRank))
      .withColumn("thresh",
        max(when(col("rn") === k + 1, col("cnt")).otherwise(lit(0L)))
          .over(wSrc))
      .withColumn("n_src", sum(col("cnt")).over(wSrc))
      .filter(col("cnt") > col("thresh"))
      .select(col("source"), col("tok"),
        (col("cnt") - col("thresh")).cast("long").as("est_cnt"),
        col("thresh").cast("long").as("thresh"),
        col("n_src").cast("long").as("n_src"))
  }

  def mgSummarySql(text: String, source: String, table: String,
      k: Int): String =
    s"""WITH c AS (
       |  SELECT coalesce(($source)::VARCHAR, '<null>') AS source, tok,
       |    count(*) AS cnt
       |  FROM (SELECT $source, unnest(${tokensSql(text)}) AS tok
       |        FROM $table)
       |  GROUP BY 1, 2),
       |r AS (
       |  SELECT source, tok, cnt,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY cnt DESC, tok ASC) AS rn,
       |    sum(cnt) OVER (PARTITION BY source) AS n_src
       |  FROM c),
       |t AS (
       |  SELECT source, tok, cnt, n_src,
       |    max(CASE WHEN rn = ${k + 1} THEN cnt ELSE 0 END)
       |      OVER (PARTITION BY source) AS thresh
       |  FROM r)
       |SELECT source, tok, (cnt - thresh)::BIGINT AS est_cnt,
       |  thresh::BIGINT AS thresh, n_src::BIGINT AS n_src
       |FROM t WHERE cnt > thresh""".stripMargin

  /** X114 within-document token-run collapse: runs of the SAME token
    * longer than `maxRun` are trimmed to their first `maxRun`
    * occurrences ("batch batch batch batch" → "batch batch" at
    * maxRun = 2) — the crawl-artifact cleanup (stuttered OCR, pasted
    * repetition, template echo) that document-level gates like the
    * [[repetitionStats]] shares can only DROP a doc for, never
    * repair. Within-doc and order-preserving, which no cross-doc
    * dedup op in the family touches.
    *
    * Shape: a single narrow in-row pass — tokenize once (the alias
    * is non-cheap and referenced per kept token, so CollapseProject
    * keeps it materialized once per row), keep token i iff fewer
    * than `maxRun` immediate predecessors equal it, re-join on
    * single spaces. Zero shuffle; scan speed at any corpus size.
    * The `maxRun` comparison window is unrolled at PLAN time (it is
    * a Scala constant), so the per-token work is O(maxRun), not
    * O(run length).
    */
  def runCollapse(ts: Column, maxRun: Int): Column = {
    require(maxRun >= 1, "maxRun must be >= 1")
    filter(ts, (t, i) => {
      // 0-based current index i; 1-based predecessors at i, i-1, ...
      // CaseWhen (not ||) so the element_at probes only run when
      // every probed index is >= 1 (ANSI mode throws on index 0)
      val anyDiff = (1 to maxRun)
        .map(j => element_at(ts, i + lit(1 - j)) =!= t)
        .reduce(_ || _)
      when(i < lit(maxRun), lit(true)).otherwise(anyDiff)
    })
  }

  def runCollapseSql(tsExpr: String, maxRun: Int): String = {
    val t = s"($tsExpr)"
    val anyDiff = (1 to maxRun)
      .map(j => s"$t[i-$j] != $t[i]").mkString(" OR ")
    s"[$t[i] for i in range(1, len($t)+1) if i <= $maxRun OR ($anyDiff)]"
  }

  /** X122 HTML → text extraction: the WARC→WET hop of a crawl
    * pipeline — strip `<script>`/`<style>` blocks wholesale (their
    * CONTENT is code, not text), drop every remaining tag, decode
    * the five predefined XML entities (`&amp;` LAST, so `&amp;lt;`
    * decodes to the literal `&lt;` and never double-decodes — the
    * classic extraction bug), then collapse whitespace. Regexes stay
    * in the Java∩RE2 common subset with explicit `(?is)` flags, so
    * both engines run the identical chain — the oracle proves it
    * byte-for-byte. One narrow codegen'd pass, scan speed at any
    * corpus size.
    */
  def htmlToText(html: Column): Column = {
    // two SEQUENTIAL block passes, not one alternation: RE2 has no
    // backreferences, so <(script|style)>.*?</(script|style)> would
    // let a <script> block close at an embedded </style> (the
    // document.write('</style>') pattern) and leak script code into
    // the text — spec-pinned
    val noBlocks = regexp_replace(
      regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]*>", " ")
    val decoded = regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(noTags,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"),
      "&amp;", "&")
    trim(regexp_replace(decoded, "[ \\t\\r\\n]+", " "))
  }

  /** The gate's HTML wrapper (no single quotes — it inlines into the
    * oracle's SQL literal verbatim): script/style blocks with real
    * hazards (`1 < 2` inside code, attributes), entities including
    * the `&amp;amp;` single-decode case.
    */
  val HtmlWrapPrefix: String = "<html><head><title>T</title>" +
    "<script type=\"x\">var j = 1 < 2;</script>" +
    "<style>p{color:red}</style></head><body><p>"
  val HtmlWrapSuffix: String = "</p><br><b>bold</b> &amp;amp; " +
    "&lt;tag&gt; &#39;q&#39; tail</body></html>"

  def htmlToTextSql(e: String): String = {
    val noBlocks =
      s"regexp_replace(regexp_replace($e, " +
        "'(?is)<script[^>]*>.*?</script>', ' ', 'g'), " +
        "'(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    val noTags = s"regexp_replace($noBlocks, '(?s)<[^>]*>', ' ', 'g')"
    val decoded = "regexp_replace(regexp_replace(regexp_replace(" +
      s"regexp_replace(regexp_replace($noTags, " +
      "'&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '\"', 'g'), " +
      "'&#39;', '''', 'g'), '&amp;', '&', 'g')"
    s"trim(regexp_replace($decoded, '[ \\t\\r\\n]+', ' ', 'g'))"
  }

  /** Rolling (Karp-Rabin-style) fingerprint over token hashes:
    * fold h ← (h·B + hash60(w) mod P) mod P, left to right. Order
    * sensitive (unlike a bag-of-words hash); both engines fold
    * sequentially so values match exactly.
    */
  val RollB = 1000003L

  def rollingFingerprint(text: Column): Column =
    graft.functions.ArrayExprs.rollingHash(tokens(text), RollB, Hashing.P)

  def rollingFingerprintSql(e: String): String =
    s"list_reduce(list_prepend(0::BIGINT, [${Hashing.hash60Sql("w")} % ${Hashing.P} " +
      s"for w in ${tokensSql(e)}]), (acc, h) -> (acc * $RollB + h) % ${Hashing.P})"

  /** Code-point Shannon entropy in integer micro-nats — the
    * "random garbage vs natural text" signal (near-0 = boilerplate/
    * padding, near-max = noise or misdecoded binary). Native
    * in-row expression: one compiled pass per doc, zero shuffle —
    * scan speed at any corpus size. Per-char contributions are
    * micro-quantized BEFORE the (order-free, integer) sum, the house
    * rule that keeps the grouped-SQL oracle bit-identical.
    */
  def charEntropy(text: Column): Column =
    graft.functions.ArrayExprs.charEntropy(text)

  /** DuckDB twin of [[charEntropy]] as a per-doc grouped pipeline:
    * explode code points positionally (substring is code-point
    * based), count per (doc, char), quantize each char's contribution,
    * integer-sum per doc. Returns a complete SELECT of
    * (id, n_cp, entropy_micro_nats) over `table`; null text → null,
    * empty text → (0, 0).
    */
  def charEntropySql(id: String, text: String, table: String): String =
    s"""SELECT d.$id AS id, length(d.$text)::BIGINT AS n_cp,
       |  (CASE WHEN d.$text IS NULL THEN NULL
       |        ELSE coalesce(e.ent, 0) END)::BIGINT AS entropy_micro_nats
       |FROM $table d LEFT JOIN (
       |  SELECT id, sum(round(cnt * (ln(n) - ln(cnt)) / n * 1e6)::BIGINT) AS ent
       |  FROM (
       |    SELECT id, cnt, sum(cnt) OVER (PARTITION BY id) AS n
       |    FROM (
       |      SELECT id, c, count(*) AS cnt FROM (
       |        SELECT $id AS id, unnest([substring($text, i::INT, 1)
       |          for i in range(1, length($text) + 1)]) AS c
       |        FROM $table)
       |      GROUP BY 1, 2))
       |  GROUP BY 1) e ON d.$id = e.id""".stripMargin

  /** Per-doc bigram-LM event stream: one packed long per position
    * i < n with c·nB + e, where c = hash(wi) % nB (context bucket)
    * and e = hash(wi + ' ' + wi+1) % nB (bigram bucket). Computed by
    * the native [[graft.functions.ArrayExprs.lmEventBuckets]] — one
    * compiled pass per row; the HOF struct form paid two interpreted
    * md5 pipelines per position. Docs under two tokens produce an
    * empty array.
    */
  private def lmEvents(text: Column, nBuckets: Int): Column =
    graft.functions.ArrayExprs.lmEventBuckets(tokens(text), nBuckets)

  /** Unpack the packed event: e = x mod nB, c = (x − e) / nB — exact
    * integer arithmetic (the quotient is an exact multiple before the
    * division).
    */
  private def unpackE(x: Column, nB: Int): Column = pmod(x, lit(nB.toLong))
  private def unpackC(x: Column, nB: Int): Column =
    ((x - pmod(x, lit(nB.toLong))) / lit(nB.toLong)).cast("long")

  /** Hashed bigram language-model fluency score — the CCNet-style
    * quality gate (Wenzek et al., "CCNet: Extracting High Quality
    * Monolingual Datasets from Web Crawl Data"): train a reference LM
    * on a trusted subcorpus, score every doc by its per-token
    * cross-entropy under that LM, and gate on the score (clean prose
    * scores low; gibberish, boilerplate soup and wrong-language text
    * score high). A production deployment swaps in a KenLM; the
    * dataflow — frozen reference statistics, per-doc narrow scoring —
    * is identical, which is what this operator pins down.
    *
    * Model: bigram events hashed into `nBuckets` (the hashing trick —
    * the model is ≤ 2·nBuckets longs no matter the vocabulary), with
    * Laplace smoothing over the hashed space:
    * P(e|c) = (cnt2(e)+1) / (cnt1(c)+nB), where cnt2 counts bigram
    * instances in the reference docs bucketed by the bigram hash and
    * cnt1 counts the same instances bucketed by the context (first
    * word) hash. Per-instance log-probs are micro-quantized BEFORE the
    * per-doc sum (exact long arithmetic both engines); ce_micros =
    * round(−logp_micros / n_bigrams) is the per-token cross-entropy in
    * micro-nats. Docs with fewer than two tokens have no events and
    * are absent (the gate passes them — no evidence either way).
    *
    * == 100 TB shape ==
    *
    * One narrow gram pass over the corpus; the model is two ≤ nBuckets
    * bucket-count tables (partial-agg shuffles over counts, never gram
    * instances) broadcast back; the per-doc score is one partial-agg
    * shuffle keyed on the doc id. Nothing scales with vocabulary, and
    * the serving half ([[scoreLmFrozen]]) is a zero-shuffle map.
    */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
      refPred: Column, nBuckets: Int): DataFrame = {
    val feats = Caching.cachedOnce(docs
      .select(col(idCol).as("id"), refPred.as("is_ref"),
        explode(lmEvents(col(textCol), nBuckets)).as("ce"))
      .select(col("id"), col("is_ref"),
        unpackC(col("ce"), nBuckets).as("c"),
        unpackE(col("ce"), nBuckets).as("e")))
    val cnt1 = feats.filter(col("is_ref")).groupBy(col("c"))
      .agg(count(lit(1)).as("c_n"))
    val cnt2 = feats.filter(col("is_ref")).groupBy(col("e"))
      .agg(count(lit(1)).as("e_n"))
    feats
      .join(broadcast(cnt1), Seq("c"), "left")
      .join(broadcast(cnt2), Seq("e"), "left")
      .select(col("id"),
        round(log((coalesce(col("e_n"), lit(0L)) + 1).cast("double") /
            (coalesce(col("c_n"), lit(0L)) + nBuckets).cast("double")) * 1e6)
          .cast("long").as("lp"))
      .groupBy(col("id").as("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("logp_micros"))
      .withColumn("ce_micros",
        round(-col("logp_micros").cast("double") / col("n_bigrams"))
          .cast("long"))
  }

  /** The frozen bigram LM: bucket b → reference instance count, for
    * contexts (cnt1) and bigrams (cnt2). 2·nBuckets longs — the whole
    * model, by the hashing-trick design.
    */
  final case class LmModel(ctx: IndexedSeq[Long], big: IndexedSeq[Long]) {
    def nBuckets: Int = ctx.size
  }

  /** The offline half of the streaming LM gate: collect the two
    * bucket-count tables of [[lmScore]] into arrays. One action over
    * the STATIC reference corpus at stage construction.
    */
  def freezeLm(docs: DataFrame, textCol: String, refPred: Column,
      nBuckets: Int): LmModel = {
    val feats = docs.filter(refPred)
      .select(explode(lmEvents(col(textCol), nBuckets)).as("ce"))
      .select(unpackC(col("ce"), nBuckets).as("c"),
        unpackE(col("ce"), nBuckets).as("e"))
    val cnt1 = feats.groupBy(col("c")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cnt2 = feats.groupBy(col("e")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    LmModel(
      (0 until nBuckets).map(b => cnt1.getOrElse(b.toLong, 0L)),
      (0 until nBuckets).map(b => cnt2.getOrElse(b.toLong, 0L)))
  }

  /** Score docs against a frozen LM — a pure narrow map (both count
    * arrays are literals; per-doc events hash and look up in-row, no
    * shuffle, no state). On the SAME corpus the model was frozen from,
    * output matches [[lmScore]] exactly on every doc with ≥ 1 bigram
    * (spec-pinned). Docs under two tokens get n_bigrams = 0 and null
    * ce_micros — present here (unlike [[lmScore]], which never sees
    * them past the explode), so a gate can choose to pass them.
    * Output: (…docs columns…, n_bigrams, logp_micros, ce_micros).
    */
  def scoreLmFrozen(docs: DataFrame, textCol: String,
      model: LmModel): DataFrame = {
    val nB = model.nBuckets
    val ctxArr = typedLit(model.ctx)
    val bigArr = typedLit(model.big)
    val lps = transform(lmEvents(col(textCol), nB), x =>
      round(log(
        (element_at(bigArr, unpackE(x, nB).cast("int") + 1) + 1)
          .cast("double") /
        (element_at(ctxArr, unpackC(x, nB).cast("int") + 1) + nB)
          .cast("double")) * 1e6).cast("long"))
    docs
      .withColumn("n_bigrams", size(lps).cast("long"))
      .withColumn("logp_micros",
        aggregate(lps, lit(0L), (acc, x) => acc + x))
      .withColumn("ce_micros",
        when(col("n_bigrams") > 0,
          round(-col("logp_micros").cast("double") / col("n_bigrams"))
            .cast("long")))
  }

  def lmScoreSql(id: String, text: String, table: String,
      refPredSql: String, nBuckets: Int): String =
    s"""WITH d AS (
       |  SELECT $id AS id, ($refPredSql) AS is_ref,
       |    ${tokensSql(text)} AS ts FROM $table),
       |pairs AS (
       |  SELECT id, is_ref,
       |    ${Hashing.hash60Sql("ts[i]")} % $nBuckets AS c,
       |    ${Hashing.hash60Sql("ts[i] || ' ' || ts[i + 1]")} % $nBuckets AS e
       |  FROM (SELECT id, is_ref, ts, unnest(generate_series(1, len(ts) - 1)) AS i
       |        FROM d WHERE len(ts) >= 2)),
       |cnt1 AS (SELECT c, count(*) AS c_n FROM pairs WHERE is_ref GROUP BY 1),
       |cnt2 AS (SELECT e, count(*) AS e_n FROM pairs WHERE is_ref GROUP BY 1),
       |scored AS (
       |  SELECT p.id,
       |    round(ln((coalesce(e_n, 0) + 1)::DOUBLE
       |      / (coalesce(c_n, 0) + $nBuckets)::DOUBLE) * 1e6)::BIGINT AS lp
       |  FROM pairs p LEFT JOIN cnt1 USING (c) LEFT JOIN cnt2 USING (e))
       |SELECT id AS doc_id, count(*)::BIGINT AS n_bigrams,
       |  sum(lp)::BIGINT AS logp_micros,
       |  round(-sum(lp)::DOUBLE / count(*))::BIGINT AS ce_micros
       |FROM scored GROUP BY 1""".stripMargin
}
