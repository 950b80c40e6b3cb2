package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so the whole operator surface is
  * reachable from plain `spark.sql(...)` too:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  *   SELECT word_shingles(split(text, ' '), 3), simhash60(split(text, ' ')) FROM docs
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "word_shingles", "word_shingles(words, k) - distinct k-word shingles",
      args => WordShingles(args.head, intArg(args(1), "k")))
    register(ext, "dot_product", "dot_product(a, b) - sequential dot product of two double arrays",
      args => DotProduct(args.head, args(1)))
    register(ext, "simhash60", "simhash60(words) - 60-bit SimHash of a token array",
      args => SimHash60(args.head))
    register(ext, "minhash_sig", "minhash_sig(shingles, k) - MinHash signature with k deterministic permutations",
      args => {
        val seeds = graft.ops.Hashing.seeds(intArg(args(1), "numHashes"))
        MinHashSig(args.head, seeds.map(_._1), seeds.map(_._2))
      })
    register(ext, "rolling_hash", "rolling_hash(words) - Karp-Rabin rolling fingerprint",
      args => RollingHash(args.head, graft.ops.TextAnalysis.RollB, graft.ops.Hashing.P))
    register(ext, "hash60_array", "hash60_array(strings) - de-duplicated 60-bit md5 hash per element",
      args => Hash60Array(args.head))
    register(ext, "jaccard_micros60", "jaccard_micros60(a, b) - set Jaccard of two long arrays, in micros",
      args => JaccardMicros60(args.head, args(1)))
    register(ext, "minhash_sig_from_hashes", "minhash_sig_from_hashes(hashes, k) - MinHash signature from pre-hashed shingles",
      args => {
        val seeds = graft.ops.Hashing.seeds(intArg(args(1), "numHashes"))
        MinHashSigFromHashes(args.head, seeds.map(_._1), seeds.map(_._2))
      })
    register(ext, "stopword_hits", "stopword_hits(words, 'w1,w2,...') - count of elements in the fixed word set",
      args => StopwordHits(args.head, stringArg(args(1), "words").split(",").toSeq))
    register(ext, "arg_top_m_cos", "arg_top_m_cos(v, vnorm, cents, cnorms, m) - positions of the m highest-cosine centroids",
      args => ArgTopMCos(args.head, args(1), args(2), args(3), intArg(args(4), "m")))
    register(ext, "arg_min_l2", "arg_min_l2(v, cents, halves) - position of the nearest centroid by L2 (max dot - half|c|^2)",
      args => ArgMinL2(args.head, args(1), args(2)))
    register(ext, "rep_stats", "rep_stats(tokens) - [n_tokens, n_distinct, top_token_n, n_bigrams, top_bigram_n] in one in-row pass",
      args => RepStats(args.head))
    register(ext, "sq_encode", "sq_encode(v, los, his, clamp[, max_code]) - SQ code array against per-dim micro ranges (max_code 255 = SQ8 default, 15 = SQ4)",
      args => SqEncode(args.head, args(1), args(2), boolArg(args(3), "clamp"),
        if (args.length > 4) doubleArg(args(4), "max_code") else 255.0))
    register(ext, "sq_recon", "sq_recon(code, los, his[, max_code]) - SQ midpoint reconstruction in micro units (max_code 255 = SQ8 default)",
      args => SqRecon(args.head, args(1), args(2),
        if (args.length > 3) doubleArg(args(3), "max_code") else 255.0))
    register(ext, "char_entropy", "char_entropy(text) - code-point Shannon entropy in micro-nats",
      args => CharEntropy(args.head))
  }

  private def boolArg(e: Expression, name: String): Boolean = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be a boolean literal, got $other")
  }

  private def doubleArg(e: Expression, name: String): Double = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Double, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toDouble
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toDouble
    // Spark SQL parses a fractional literal like `15.0` as Decimal —
    // without this branch `sq_encode(v, los, his, false, 15.0)` from
    // SQL rejects a perfectly numeric argument
    case org.apache.spark.sql.catalyst.expressions.Literal(
        v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$name must be a numeric literal, got $other")
  }

  private def stringArg(e: Expression, name: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: org.apache.spark.unsafe.types.UTF8String, _) =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$name must be a string literal, got $other")
  }

  private def intArg(e: Expression, name: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  private def register(ext: SparkSessionExtensions, name: String, usage: String,
      builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo("graft", name),
      (args: Seq[Expression]) => builder(args)))
}
