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

  // --------------------------------- Corpus vocabulary statistics (X135-X137)

  /** round(ln(x)·1e6) as a long — the house "quantize every ln term
    * ONCE, then integer-sum" rule (the [[graft.ops.Curation]] NB
    * discipline) that keeps log-sum formulas bit-identical across
    * engines.
    */
  private def lnMicros(x: Column): Column =
    round(log(x.cast("double")) * 1e6).cast("long")

  /** Adjacent token bigrams as strings ("a b"), NON-distinct —
    * occurrence counts are the PMI denominator's event space, unlike
    * the per-doc-distinct shingle universe dedup uses. Caller filters
    * `size(ts) >= 2` first (Spark's `sequence(1, 0)` would DESCEND).
    */
  private def adjacentBigrams(ts: Column): Column =
    transform(sequence(lit(1), size(ts) - 1),
      i => concat_ws(" ", element_at(ts, i), element_at(ts, i + 1)))

  /** X135 PMI collocations: the top-m adjacent-token bigrams by
    * pointwise mutual information, PMI(a,b) = ln(p(ab)/(p(a)p(b)))
    * with p from corpus OCCURRENCE counts (Church-Hanks collocation
    * extraction — the "what multi-word units does this corpus carry"
    * diagnostic that heavy-hitter token counts ([[mgSummary]]) can't
    * see, since PMI surfaces pairs whose parts are individually rare).
    * `minCount` suppresses the classic PMI pathology (a hapax pair of
    * two hapax tokens scores ln N — pure noise).
    *
    * Integer math: PMI decomposes as ln(c_ab) + 2·ln(N) − ln(B)
    * − ln(c_a) − ln(c_b); each term quantizes to micros ONCE, the sum
    * is exact long arithmetic (never c_ab·N²/…, which overflows at
    * corpus scale). Output (bigram, n_pair, pmi_micros), total order
    * (pmi desc, bigram asc).
    *
    * Scale: two partial-agg count shuffles (unigrams, bigrams) over
    * the token stream; the scoring joins carry only COUNT DIGESTS
    * (vocab- and bigram-type-sized, Heaps-bounded) keyed on tokens —
    * never token instances; corpus totals ride two broadcast one-row
    * frames; the global top-m compiles to TakeOrderedAndProject
    * (per-partition top-m, driver merges m·partitions rows).
    */
  def pmiCollocations(docs: DataFrame, textCol: String,
      minCount: Int, topM: Int): DataFrame = {
    // cached: unigram and bigram counts both consume the token arrays
    val ts = Caching.cachedOnce(docs
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(tokens(col(textCol)).as("ts")))
    val uni = ts.select(explode(col("ts")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val big = ts.filter(size(col("ts")) >= 2)
      .select(explode(adjacentBigrams(col("ts"))).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val nUni = uni.agg(sum(col("c")).as("n_uni"))
    val nBig = ts.filter(size(col("ts")) >= 2)
      .agg(sum(size(col("ts")) - 1).cast("long").as("n_big"))
    big
      .withColumn("tok_a", substring_index(col("bigram"), " ", 1))
      .withColumn("tok_b", substring_index(col("bigram"), " ", -1))
      .join(uni.as("ua"), col("tok_a") === col("ua.tok"))
      .join(uni.as("ub"), col("tok_b") === col("ub.tok"))
      .crossJoin(broadcast(nUni))
      .crossJoin(broadcast(nBig))
      .select(col("bigram"), col("n_pair"),
        (lnMicros(col("n_pair")) + lit(2L) * lnMicros(col("n_uni"))
          - lnMicros(col("n_big")) - lnMicros(col("ua.c"))
          - lnMicros(col("ub.c"))).as("pmi_micros"))
      .orderBy(col("pmi_micros").desc, col("bigram").asc)
      .limit(topM)
  }

  def pmiCollocationsSql(text: String, table: String,
      minCount: Int, topM: Int): String =
    s"""WITH d AS (
       |  SELECT ${tokensSql(text)} AS ts FROM $table
       |  WHERE $text IS NOT NULL AND length($text) > 0),
       |uni AS (
       |  SELECT tok, count(*) AS c FROM (SELECT unnest(ts) AS tok FROM d)
       |  GROUP BY 1),
       |big AS (
       |  SELECT bigram, count(*) AS n_pair FROM (
       |    SELECT ts[i] || ' ' || ts[i + 1] AS bigram
       |    FROM (SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i
       |          FROM d WHERE len(ts) >= 2))
       |  GROUP BY 1 HAVING count(*) >= $minCount),
       |tot AS (SELECT sum(c)::BIGINT AS n_uni FROM uni),
       |btot AS (SELECT sum(len(ts) - 1)::BIGINT AS n_big FROM d
       |         WHERE len(ts) >= 2)
       |SELECT big.bigram, big.n_pair::BIGINT AS n_pair,
       |  (round(ln(big.n_pair::DOUBLE) * 1e6)::BIGINT
       |   + 2 * round(ln(n_uni::DOUBLE) * 1e6)::BIGINT
       |   - round(ln(n_big::DOUBLE) * 1e6)::BIGINT
       |   - round(ln(ua.c::DOUBLE) * 1e6)::BIGINT
       |   - round(ln(ub.c::DOUBLE) * 1e6)::BIGINT) AS pmi_micros
       |FROM big
       |JOIN uni ua ON ua.tok = split_part(big.bigram, ' ', 1)
       |JOIN uni ub ON ub.tok = split_part(big.bigram, ' ', 2)
       |CROSS JOIN tot CROSS JOIN btot
       |ORDER BY pmi_micros DESC, big.bigram LIMIT $topM""".stripMargin

  /** Corpus token-frequency ranks: (tok, c, rank) with rank = 1 the
    * most frequent, ties broken on the token's binary string order
    * (both engines' default). The row_number is a GLOBAL window — a
    * single-partition sort over the VOCABULARY digest, which Heaps'
    * law bounds far below corpus size (the [[graft.ops.Curation]]
    * X113 cumulative-walk argument; the corpus itself only ever rides
    * the partial-agg count shuffle).
    */
  private def tokenRanks(docs: DataFrame, textCol: String): DataFrame = {
    val uc = docs
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    uc.withColumn("rank",
      row_number().over(Window.orderBy(col("c").desc, col("tok").asc))
        .cast("long"))
  }

  private def tokenRanksSql(text: String, table: String): String =
    s"""SELECT tok, c, row_number() OVER (ORDER BY c DESC, tok)::BIGINT AS rank
       |FROM (
       |  SELECT tok, count(*) AS c FROM (
       |    SELECT unnest(${tokensSql(text)}) AS tok FROM $table
       |    WHERE $text IS NOT NULL AND length($text) > 0)
       |  GROUP BY 1)""".stripMargin

  /** X136 vocabulary coverage curve: for each candidate vocabulary
    * size s, the fraction of all token OCCURRENCES covered by the s
    * most frequent types — the curve that prices a tokenizer/vocab
    * budget before training one (coverage(s) = 1 − OOV rate at size
    * s). Output (vocab_size, n_types, coverage_micros); n_types =
    * min(s, |vocab|) makes saturated sizes visible.
    *
    * Scale: the corpus pays ONE partial-agg count shuffle; the
    * ranking and the conditional sums run over the Heaps-bounded
    * vocab digest ([[tokenRanks]]); one row per requested size.
    */
  def vocabCoverage(docs: DataFrame, textCol: String,
      sizes: Seq[Int]): DataFrame = {
    val ranked = tokenRanks(docs, textCol)
    val one = ranked.agg(
      sum(col("c")).as("n_total"),
      (count(lit(1)).as("n_vocab") +: sizes.map(s =>
        sum(when(col("rank") <= s, col("c"))).as(s"cov_$s"))): _*)
    one.select(explode(array(sizes.map(s =>
        struct(lit(s.toLong).as("vocab_size"),
          least(lit(s.toLong), col("n_vocab")).as("n_types"),
          round(coalesce(col(s"cov_$s"), lit(0L)).cast("double")
            / col("n_total") * 1e6).cast("long").as("coverage_micros"))): _*))
        .as("r"))
      .select(col("r.vocab_size"), col("r.n_types"),
        col("r.coverage_micros"))
  }

  def vocabCoverageSql(text: String, table: String,
      sizes: Seq[Int]): String = {
    val covs = sizes.map(s =>
      s"coalesce(sum(CASE WHEN rank <= $s THEN c END), 0) AS cov_$s")
      .mkString(", ")
    val rows = sizes.map(s =>
      s"""SELECT ${s}::BIGINT AS vocab_size,
         |  least($s, n_vocab)::BIGINT AS n_types,
         |  round(cov_$s::DOUBLE / n_total * 1e6)::BIGINT AS coverage_micros
         |FROM agg""".stripMargin).mkString("\nUNION ALL\n")
    s"""WITH rk AS (${tokenRanksSql(text, table)}),
       |agg AS (
       |  SELECT sum(c)::BIGINT AS n_total, count(*)::BIGINT AS n_vocab, $covs
       |  FROM rk)
       |$rows""".stripMargin
  }

  /** X137 Zipf rank-frequency fit: least-squares slope/intercept of
    * ln(freq) on ln(rank) over the top `topR` token ranks — the
    * one-row "is this corpus natural text" diagnostic (natural
    * language sits near slope −1; templated/synthetic corpora flatten
    * toward 0, and a slope shift between two snapshots is the same
    * early-warning [[graft.ops.Diagnostics]] drift gives embeddings).
    *
    * Integer math: ln(rank)/ln(freq) quantize to MILLIS (not micros —
    * the sums of products must stay in long range: at millis,
    * x·y ≤ ~4.5e8, so topR up to ~1e5 is safe, documented bound), all
    * moment sums are exact long arithmetic, and the only doubles are
    * the final two divisions — identical expression trees on both
    * engines, hence bit-identical after rounding. Output
    * (n_ranks, slope_micros, intercept_micros), intercept in
    * micro-ln-units at ln(rank) = 0.
    *
    * Scale: one count shuffle, then a top-R rank filter over the
    * vocab digest and a 5-moment aggregate — one output row.
    */
  def zipfFit(docs: DataFrame, textCol: String, topR: Int): DataFrame = {
    require(topR >= 2 && topR <= 100000, "topR in [2, 1e5]")
    def lnMillis(x: Column): Column =
      round(log(x.cast("double")) * 1e3).cast("long")
    val pts = tokenRanks(docs, textCol).filter(col("rank") <= topR)
      .select(lnMillis(col("rank")).as("x"), lnMillis(col("c")).as("y"))
    val m = pts.agg(count(lit(1)).as("n_ranks"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val num = (col("n_ranks") * col("sxy") - col("sx") * col("sy"))
      .cast("double")
    val denL = col("n_ranks") * col("sxx") - col("sx") * col("sx")
    val slopeRaw = num / denL.cast("double")
    // a single-rank (or otherwise degenerate) corpus has den = 0: the
    // fit is undefined — emit NULL on BOTH engines instead of letting
    // Spark's round(NaN) = 0 silently diverge from the SQL twin's
    // NaN-cast failure (self-review finding, fuzz-pinned)
    m.select(col("n_ranks"),
      when(denL =!= 0, round(slopeRaw * 1e6).cast("long"))
        .as("slope_micros"),
      when(denL =!= 0,
        round((col("sy").cast("double") - slopeRaw * col("sx").cast("double"))
          / col("n_ranks") * 1e3).cast("long"))
        .as("intercept_micros"))
  }

  def zipfFitSql(text: String, table: String, topR: Int): String =
    s"""WITH rk AS (${tokenRanksSql(text, table)}),
       |pts AS (
       |  SELECT round(ln(rank::DOUBLE) * 1e3)::BIGINT AS x,
       |    round(ln(c::DOUBLE) * 1e3)::BIGINT AS y
       |  FROM rk WHERE rank <= $topR),
       |m AS (
       |  SELECT count(*)::BIGINT AS n_ranks,
       |    sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
       |    sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx
       |  FROM pts)
       |SELECT n_ranks,
       |  CASE WHEN n_ranks * sxx - sx * sx = 0 THEN NULL
       |    ELSE round((n_ranks * sxy - sx * sy)::DOUBLE
       |      / (n_ranks * sxx - sx * sx)::DOUBLE * 1e6)::BIGINT
       |  END AS slope_micros,
       |  CASE WHEN n_ranks * sxx - sx * sx = 0 THEN NULL
       |    ELSE round((sy::DOUBLE - (n_ranks * sxy - sx * sy)::DOUBLE
       |        / (n_ranks * sxx - sx * sx)::DOUBLE * sx::DOUBLE)
       |      / n_ranks * 1e3)::BIGINT
       |  END AS intercept_micros
       |FROM m""".stripMargin

  // ------------------------------------ Script profile + OOV gate (X139-X140)

  /** Script classes in a FIXED order (the tie-break order), each a
    * disjoint BMP code-point range rendered as LITERAL characters
    * (built from code points, so no source-encoding ambiguity) — the
    * identical pattern string runs in both Java regex and RE2.
    * "other" (anything unclassified: punctuation, space, unlisted
    * scripts) is derived as length − Σclasses, never matched.
    */
  private def rangeClass(lo: Int, hi: Int): String =
    s"[${new String(Character.toChars(lo))}-${new String(Character.toChars(hi))}]"

  private[ops] val Scripts: Seq[(String, String)] = Seq(
    "latin" -> "[a-zA-Z]",
    "digit" -> "[0-9]",
    "cyrillic" -> rangeClass(0x0400, 0x04FF),
    "greek" -> rangeClass(0x0370, 0x03FF),
    "arabic" -> rangeClass(0x0600, 0x06FF),
    "devanagari" -> rangeClass(0x0900, 0x097F),
    "cjk" -> rangeClass(0x4E00, 0x9FFF),
    "kana" -> rangeClass(0x3040, 0x30FF),
    "hangul" -> rangeClass(0xAC00, 0xD7AF))

  private[ops] val ScriptNames: Seq[String] = Scripts.map(_._1) :+ "other"

  /** X139 Unicode-script profile: classify every code point into a
    * fixed script-range family, take each doc's DOMINANT script
    * (first-max tie-break over the fixed class order — both engines'
    * list-position rule), and roll up per script: how many docs, and
    * the mean share the dominant script holds of the doc's characters.
    * The cheap precursor to model-based language ID ([[langId]] sees
    * words; this sees writing systems) and the standard mixed-script
    * spam / mojibake tripwire: natural single-script text sits near
    * share 1e6, misdecoded or injected text sags.
    *
    * Scale: per-doc counting is |Scripts| codegen'd regexp_count
    * passes — narrow, scan-speed; the only shuffle is the final
    * partial-agg rollup to ≤ |Scripts|+1 rows.
    */
  /** Per-doc half of [[scriptProfile]]: (doc_id, script,
    * share_micros) — the dominant script and its character share,
    * as a pure narrow map (the ingest-gate shape,
    * [[graft.streaming.Pipeline]] `scriptGate`).
    */
  def scriptOf(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val counts = array(Scripts.map { case (_, p) =>
      regexp_count(col("text"), lit(p)).cast("long") }: _*)
    val names = array(ScriptNames.map(lit): _*)
    docs.filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("cs0", counts)
      .withColumn("cs", concat(col("cs0"),
        array(length(col("text")).cast("long")
          - aggregate(col("cs0"), lit(0L), (a, x) => a + x))))
      .withColumn("idx", array_position(col("cs"), array_max(col("cs"))))
      .select(col("doc_id"),
        element_at(names, col("idx").cast("int")).as("script"),
        round(array_max(col("cs")).cast("double")
          / length(col("text")) * 1e6).cast("long").as("share_micros"))
  }

  def scriptProfile(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    scriptOf(docs, idCol, textCol)
      .groupBy(col("script"))
      .agg(count(lit(1)).as("n_docs"), sum(col("share_micros")).as("s"))
      .select(col("script"), col("n_docs"),
        round(col("s").cast("double") / col("n_docs")).cast("long")
          .as("mean_share_micros"))

  def scriptProfileSql(id: String, text: String, table: String): String = {
    val cs0 = Scripts.map { case (_, p) =>
      s"len(regexp_extract_all(text, '$p'))::BIGINT" }.mkString(", ")
    val names = ScriptNames.map(n => s"'$n'").mkString(", ")
    s"""WITH d AS (
       |  SELECT $id AS doc_id, $text AS text FROM $table
       |  WHERE $text IS NOT NULL AND length($text) > 0),
       |c0 AS (SELECT doc_id, text, [$cs0] AS cs0 FROM d),
       |c AS (SELECT doc_id, text,
       |        list_append(cs0, length(text)::BIGINT - list_sum(cs0)) AS cs
       |      FROM c0),
       |e AS (
       |  SELECT ([$names])[list_position(cs, list_max(cs))] AS script,
       |    round(list_max(cs)::DOUBLE / length(text) * 1e6)::BIGINT
       |      AS share_micros
       |  FROM c)
       |SELECT script, count(*)::BIGINT AS n_docs,
       |  round(sum(share_micros)::DOUBLE / count(*))::BIGINT
       |    AS mean_share_micros
       |FROM e GROUP BY 1""".stripMargin
  }

  /** X140 frozen vocabulary: the top-s token types by corpus
    * frequency ([[tokenRanks]] order), frozen as the model artifact —
    * s strings IS the model, the [[vocabCoverage]] curve priced it.
    */
  final case class FrozenVocab(vocab: Seq[String])

  def freezeVocab(docs: DataFrame, textCol: String, s: Int): FrozenVocab = {
    import org.apache.spark.sql.Encoders
    FrozenVocab(tokenRanks(docs, textCol).filter(col("rank") <= s)
      .orderBy(col("rank")).select(col("tok"))
      .as[String](Encoders.STRING).collect().toSeq)
  }

  /** Score docs against a frozen vocabulary: per doc, token count,
    * OOV occurrence count and OOV rate in micros. The scorer is the
    * codegen'd hash-set membership counter
    * ([[graft.functions.ArrayExprs.stopwordHits]]) — O(|tokens|) per
    * row regardless of vocab size, zero shuffle, zero state: the
    * ingest-time gate shape ([[graft.streaming.Pipeline]] `oovGate`),
    * riding the scan at scan speed while the vocab ranking stays a
    * batch job. High OOV = noise, mojibake, or out-of-domain text —
    * the cheap twin of the [[lmScore]] perplexity gate.
    */
  def oovScore(docs: DataFrame, idCol: String, textCol: String,
      frozen: FrozenVocab): DataFrame =
    docs.filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("ts"))
      .select(col("doc_id"), size(col("ts")).cast("long").as("n_tokens"),
        (size(col("ts")).cast("long") -
          graft.functions.ArrayExprs.stopwordHits(col("ts"), frozen.vocab))
          .as("n_oov"))
      .withColumn("oov_micros",
        round(col("n_oov").cast("double") / col("n_tokens") * 1e6)
          .cast("long"))

  /** DuckDB twin of freeze-on-self [[oovScore]]: the oracle
    * recomputes the top-s vocab from the same table (the standing
    * frozen-twin oracle pattern) and counts OOV occurrences by join.
    */
  def oovScoreSql(id: String, text: String, table: String,
      s: Int): String =
    s"""WITH rk AS (${tokenRanksSql(text, table)}),
       |voc AS (SELECT tok FROM rk WHERE rank <= $s),
       |d AS (
       |  SELECT $id AS doc_id, ${tokensSql(text)} AS ts FROM $table
       |  WHERE $text IS NOT NULL AND length($text) > 0),
       |tk AS (SELECT doc_id, unnest(ts) AS t FROM d),
       |h AS (
       |  SELECT tk.doc_id AS hid, count(*) AS n_in
       |  FROM tk JOIN voc ON voc.tok = tk.t GROUP BY 1)
       |SELECT d.doc_id, len(d.ts)::BIGINT AS n_tokens,
       |  (len(d.ts) - coalesce(h.n_in, 0))::BIGINT AS n_oov,
       |  round((len(d.ts) - coalesce(h.n_in, 0))::DOUBLE / len(d.ts) * 1e6)
       |    ::BIGINT AS oov_micros
       |FROM d LEFT JOIN h ON h.hid = d.doc_id""".stripMargin
}
