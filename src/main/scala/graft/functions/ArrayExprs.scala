package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot paths where Spark's
  * higher-order functions (transform/aggregate/zip_with) are too slow:
  * HOFs evaluate their lambda INTERPRETED per element, and — worse —
  * any `CodegenFallback` expression anywhere in an operator kicks the
  * WHOLE operator out of whole-stage codegen (CollapseCodegenStages
  * rejects plans containing one). So every expression here implements
  * a real `doGenCode`: [[DotProduct]] and [[StopwordHits]] emit their
  * inner loop as Java; the rest emit a single delegate call to their
  * `compute` method — one virtual call per ROW with the loop compiled
  * in this class, while the surrounding stage stays fused.
  *
  * Semantics are bit-compatible with the HOF formulations they
  * replace (same iteration order, same fold association), so the
  * DuckDB oracle twins in graft.ops are unchanged.
  */
object ArrayExprs {

  /** Distinct k-word shingles — fast path of ops.Dedup.shingles. */
  def wordShingles(words: Column, k: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(words), k))

  /** Sequential-fold dot product — fast path of ops.Vectors.dot. */
  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** MinHash signature — fast path of ops.Dedup.minhashSignature. */
  def minhashSig(shingles: Column, seeds: IndexedSeq[(Long, Long)]): Column =
    Bridge.column(MinHashSig(Bridge.expression(shingles),
      seeds.map(_._1), seeds.map(_._2)))

  /** 60-bit SimHash — fast path of ops.Dedup.simhash. */
  def simhash60(words: Column): Column =
    Bridge.column(SimHash60(Bridge.expression(words)))

  /** Karp-Rabin rolling hash — fast path of
    * ops.TextAnalysis.rollingFingerprint.
    */
  def rollingHash(words: Column, b: Long, p: Long): Column =
    Bridge.column(RollingHash(Bridge.expression(words), b, p))

  /** Per-element hash60 of a string array, de-duplicated — fast path
    * of `array_distinct(transform(xs, ops.Hashing.hash60))`.
    */
  def hash60Array(ss: Column): Column =
    Bridge.column(Hash60Array(Bridge.expression(ss)))

  /** Encoded bigram-LM event buckets — fast path of
    * ops.TextAnalysis's gram pipeline: element i (for i < n−1) is
    * (hash60(w_i) % nB) · nB + (hash60(w_i + " " + w_{i+1}) % nB) —
    * the (context, bigram) bucket pair packed into one long. One
    * compiled pass; the HOF form paid two interpreted md5 pipelines
    * per token position.
    */
  def lmEventBuckets(tokens: Column, nBuckets: Int): Column =
    Bridge.column(LmEventBuckets(Bridge.expression(tokens), nBuckets))

  /** SQ encode — fast path of ops.Sq's code HOF. `maxCode` = 255 is
    * the SQ8 tier, 15 the SQ4 (nibble) tier; same exactness argument
    * at any smaller code range (the quotient gap only widens).
    */
  def sqEncode(v: Column, los: Column, his: Column, clamp: Boolean,
      maxCode: Double = 255.0): Column =
    Bridge.column(SqEncode(Bridge.expression(v), Bridge.expression(los),
      Bridge.expression(his), clamp, maxCode))

  /** SQ midpoint reconstruction — fast path of ops.Sq's recon HOF. */
  def sqRecon(code: Column, los: Column, his: Column,
      maxCode: Double = 255.0): Column =
    Bridge.column(SqRecon(Bridge.expression(code), Bridge.expression(los),
      Bridge.expression(his), maxCode))

  /** Exact set-Jaccard (in micros) of two distinct-element long
    * arrays — fast path of ops.Dedup.jaccardMicros over hashed
    * shingles (array_intersect is interpreted and gets inlined twice
    * by CollapseProject; this is one sort-merge pass per row).
    */
  def jaccardMicros60(a: Column, b: Column): Column =
    Bridge.column(JaccardMicros60(Bridge.expression(a), Bridge.expression(b)))

  /** MinHash signature from pre-hashed shingles — same values as
    * [[minhashSig]] when fed `hash60Array` of the same shingles
    * (dedup cannot change a min).
    */
  def minhashSigFromHashes(hs: Column, seeds: IndexedSeq[(Long, Long)]): Column =
    Bridge.column(MinHashSigFromHashes(Bridge.expression(hs),
      seeds.map(_._1), seeds.map(_._2)))

  /** Count of array elements contained in a fixed word set — fast
    * path of `size(filter(xs, x => x.isInCollection(words)))`, with
    * the membership loop emitted directly into generated code.
    */
  def stopwordHits(ss: Column, words: Seq[String]): Column =
    Bridge.column(StopwordHits(Bridge.expression(ss), words))

  /** Positions (0-based) of the `m` centroids with the highest cosine
    * against `v`, rank order — fast path of the transform→array_sort→
    * slice struct pipeline in ops.Similarity.assignToNearest.
    */
  def argTopMCos(v: Column, vnorm: Column, cents: Column, cnorms: Column,
      m: Int): Column =
    Bridge.column(ArgTopMCos(Bridge.expression(v), Bridge.expression(vnorm),
      Bridge.expression(cents), Bridge.expression(cnorms), m))

  /** Position (0-based) of the centroid minimizing L2 distance to `v`
    * (max dot − ½|c|²) — fast path of ops.Pq.assignL2All's in-row pick.
    */
  def argMinL2(v: Column, cents: Column, halves: Column): Column =
    Bridge.column(ArgMinL2(Bridge.expression(v), Bridge.expression(cents),
      Bridge.expression(halves)))

  /** Code-point Shannon entropy in micro-nats — the in-row quality
    * signal of ops.TextAnalysis.charEntropy.
    */
  def charEntropy(text: Column): Column =
    Bridge.column(CharEntropy(Bridge.expression(text)))

  /** Per-document repetition counters over a token array, in one
    * in-row pass: [n_tokens, n_distinct, top_token_n, n_bigrams,
    * top_bigram_n] — the zero-shuffle twin of the exploded-aggregate
    * ops.TextAnalysis.repetitionStats.
    */
  def repStats(tokens: Column): Column =
    Bridge.column(RepStats(Bridge.expression(tokens)))

  /** Content-defined chunk boundaries + fingerprints of a token
    * array, in one in-row pass — the zero-shuffle engine of
    * ops.Dedup.contentChunks.
    */
  def cdcChunks(tokens: Column, k: Int, divisor: Long): Column =
    Bridge.column(CdcChunks(Bridge.expression(tokens), k, divisor))

  /** Per-term counts of a FIXED term list over a token array, plus
    * the total token count as the LAST element — one tokenization,
    * one hash-probe pass, however many terms the model carries. The
    * frozen-model scorers alias this ONCE and read tf/dl via
    * element_at; a per-term [[stopwordHits]] chain re-evaluates the
    * token split per term (CollapseProject will not inline a
    * non-cheap alias referenced many times, so the single array IS
    * computed once per row).
    */
  def termCounts(tokens: Column, terms: Seq[String]): Column =
    Bridge.column(TermCounts(Bridge.expression(tokens), terms))

  /** The cross-engine 60-bit md5 hash (ops.Hashing.hash60) computed
    * JVM-side: low 60 bits = first 15 hex chars of the md5 of the
    * UTF-8 bytes — identical to `conv(substring(md5(x),1,15),16,10)`
    * and to DuckDB's `('0x'||substring(md5(x),1,15))::BIGINT`.
    */
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash60(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // first 15 hex chars = 7.5 bytes: 7 full bytes + high nibble of the 8th
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    (acc << 4) | ((d(7) & 0xf0L) >> 4)
  }
}

/** `array<string>` → distinct k-grams joined by single spaces.
  * Matches `array_distinct(transform(sequence(1, greatest(n-k+1, 1)),
  * i => concat_ws(" ", words[i..i+k-1])))` exactly: short arrays
  * degrade to one truncated shingle (concat_ws skips past-the-end),
  * first-occurrence order preserved.
  *
  * Eval is one compiled loop per row; doGenCode delegates to
  * [[compute]] so the enclosing stage stays in whole-stage codegen.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  private val sep = UTF8String.fromString(" ")

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val m = math.max(n - k + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < m) {
      val end = math.min(i + k, n)
      val parts = new Array[UTF8String](end - i)
      var j = i
      while (j < end) { parts(j - i) = arr.getUTF8String(j); j += 1 }
      seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** `array<string>` → `array<long>`: the bigram-LM event stream.
  * Element i (i ∈ [0, n−1)) packs the (context, bigram) hash buckets
  * of position i into one long: (hash60(w_i) % nB) · nB +
  * (hash60(w_i ⧺ " " ⧺ w_{i+1}) % nB). Order-preserving, one entry
  * per position (multiplicity matters — the LM is multinomial), and
  * the product stays < nB² ≪ 2^62. Bucket values are identical to
  * the pmod(hash60(...), nB) Column pipeline this replaces, so the
  * DuckDB oracle twin is untouched.
  */
case class LmEventBuckets(child: Expression, nBuckets: Int)
    extends UnaryExpression {
  require(nBuckets > 0)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lm_event_buckets"

  private val sep = UTF8String.fromString(" ")

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val m = math.max(n - 1, 0)
    val nB = nBuckets.toLong
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val a = arr.getUTF8String(i)
      val b = arr.getUTF8String(i + 1)
      val c = ArrayExprs.hash60(a) % nB
      val e = ArrayExprs.hash60(UTF8String.concatWs(sep, a, b)) % nB
      out(i) = c * nB + e
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lmEventBuckets", this, classOf[LmEventBuckets].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): LmEventBuckets =
    copy(child = newChild)
}

/** `array<string>` → `array<long>`: hash60 of every element,
  * de-duplicated preserving first-occurrence order. One compiled loop
  * per row; used to move posting-list join keys from ~30-byte shingle
  * strings onto 8-byte longs (collisions merge universe elements, so
  * set-similarity can only grow — safe wherever an exact verify
  * follows).
  */
case class Hash60Array(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hash60_array"

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < n) { seen.add(ArrayExprs.hash60(arr.getUTF8String(i))); i += 1 }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hash60Array", this, classOf[Hash60Array].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Hash60Array =
    copy(child = newChild)
}

/** SQ encode of a double vector against per-dim [lo, hi] MICRO
  * ranges: code[i] = floor((round(v[i]·1e6) − los[i]) · maxCode /
  * max(1, his[i] − los[i])), optionally clamped to [0, maxCode]
  * (maxCode 255 = SQ8, 15 = SQ4; encoding
  * NEW vectors at FIXED stored ranges). Bit-compatible with the
  * composed catalyst round/floor/greatest HOF form it replaces — the
  * half-up round goes through BigDecimal.valueOf exactly like Spark's
  * `Round` double path (Math.round differs on negative .5 ties). The
  * HOF form was O(dim²) per row (CollapseProject inlines the micros
  * transform into every element_at lambda call) and O(dim³) once the
  * reconstruction referenced the code column — measured 45× slower at
  * sf0.1. One compiled pass here.
  */
case class SqEncode(v: Expression, los: Expression, his: Expression,
    clamp: Boolean, maxCode: Double = 255.0)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = v
  override def second: Expression = los
  override def third: Expression = his
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sq_encode"

  def compute(varr: ArrayData, larr: ArrayData, harr: ArrayData): ArrayData = {
    val n = varr.numElements()
    if (larr.numElements() < n || harr.numElements() < n)
      throw new IllegalArgumentException(
        s"sq_encode: ${larr.numElements()}/${harr.numElements()} range entries for $n dims")
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val x = varr.getDouble(i) * 1e6
      // Spark Round(double) semantics: NaN/Inf pass through, else
      // BigDecimal.valueOf + HALF_UP
      val xm =
        if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
        else java.math.BigDecimal.valueOf(x)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
      val lo = larr.getDouble(i)
      val span = math.max(1.0, harr.getDouble(i) - lo)
      var c = math.floor((xm - lo) * maxCode / span)
      if (clamp) c = math.max(0.0, math.min(maxCode, c))
      out(i) = c
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sqEncode", this, classOf[SqEncode].getName)
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"${ev.value} = $ref.compute($a, $b, $c);")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): SqEncode = copy(v = f, los = s, his = t)
}

/** SQ midpoint reconstruction in micro units:
  * r[i] = los[i] + (code[i] + ½) · max(1, his[i] − los[i]) / maxCode.
  * Bit-compatible with the HOF form (same per-element op order).
  */
case class SqRecon(code: Expression, los: Expression, his: Expression,
    maxCode: Double = 255.0)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = code
  override def second: Expression = los
  override def third: Expression = his
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sq_recon"

  def compute(carr: ArrayData, larr: ArrayData, harr: ArrayData): ArrayData = {
    val n = carr.numElements()
    if (larr.numElements() < n || harr.numElements() < n)
      throw new IllegalArgumentException(
        s"sq_recon: ${larr.numElements()}/${harr.numElements()} range entries for $n dims")
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val lo = larr.getDouble(i)
      out(i) = lo + (carr.getDouble(i) + 0.5) *
        math.max(1.0, harr.getDouble(i) - lo) / maxCode
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sqRecon", this, classOf[SqRecon].getName)
    nullSafeCodeGen(ctx, ev, (a, b, c) => s"${ev.value} = $ref.compute($a, $b, $c);")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): SqRecon = copy(code = f, los = s, his = t)
}

/** Set-Jaccard in micros of two distinct-element `array<long>`s:
  * `round(|a∩b| / |a∪b| * 1e6)` with the same double math as the
  * `size(array_intersect)` formulation and the DuckDB
  * `list_intersect` oracle. Sort + two-pointer merge per row.
  */
case class JaccardMicros60(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "jaccard_micros60"

  def compute(a: ArrayData, b: ArrayData): Long = {
    val xs = a.toLongArray()
    val ys = b.toLongArray()
    java.util.Arrays.sort(xs)
    java.util.Arrays.sort(ys)
    var i = 0; var j = 0; var common = 0
    while (i < xs.length && j < ys.length) {
      if (xs(i) == ys(j)) { common += 1; i += 1; j += 1 }
      else if (xs(i) < ys(j)) i += 1
      else j += 1
    }
    val u = (xs.length + ys.length - common).toDouble
    Math.round(common.toDouble / u * 1e6)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jaccard60", this, classOf[JaccardMicros60].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.compute($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaccardMicros60 =
    copy(left = newLeft, right = newRight)
}

/** Sequential dot product of two `array<double>` columns: exactly
  * `Σ a(i)·b(i)` accumulated left-to-right — the association the
  * oracle's `list_reduce(list_prepend(0.0, …))` uses. Codegen'd.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(left = newLeft, right = newRight)
}

/** MinHash signature of a shingle array: per permutation j,
  * min over shingles of (a_j·(hash60(s) mod P) + b_j) mod P — each
  * shingle md5-hashed exactly ONCE for all permutations, no
  * explode/shuffle. Values identical to the HOF/SQL formulations.
  */
case class MinHashSig(child: Expression, as: IndexedSeq[Long], bs: IndexedSeq[Long])
    extends UnaryExpression {

  private val P = graft.ops.Hashing.P
  // seeds kept as IndexedSeq in the case-class parameters so structural
  // equality (semanticEquals / canonicalization) works; copied to flat
  // arrays once per plan for the per-row loop
  @transient private lazy val asArr = as.toArray
  @transient private lazy val bsArr = bs.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullable: Boolean = true // empty input → null signature

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val k = asArr.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = ArrayExprs.hash60(arr.getUTF8String(i)) % P
      var j = 0
      while (j < k) {
        val h = (x * asArr(j) + bsArr(j)) % P
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSig].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** [[MinHashSig]] taking pre-hashed (hash60) shingles: per
  * permutation j, min over (a_j·(h mod P) + b_j) mod P. Identical
  * values to MinHashSig on the original strings — hashing first and
  * de-duplicating cannot change any min.
  */
case class MinHashSigFromHashes(child: Expression, as: IndexedSeq[Long], bs: IndexedSeq[Long])
    extends UnaryExpression {

  private val P = graft.ops.Hashing.P
  @transient private lazy val asArr = as.toArray
  @transient private lazy val bsArr = bs.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_from_hashes"
  override def nullable: Boolean = true // empty input → null signature

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val k = asArr.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = arr.getLong(i) % P
      var j = 0
      while (j < k) {
        val h = (x * asArr(j) + bsArr(j)) % P
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSigH", this,
      classOf[MinHashSigFromHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.compute($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigFromHashes =
    copy(child = newChild)
}

/** 60-bit SimHash of a token array: bit b set iff more than half of
  * the tokens have bit b set in hash60(token). One md5 per token, one
  * pass, no explode/aggregate.
  */
case class SimHash60(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    val ones = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = ArrayExprs.hash60(arr.getUTF8String(i))
      var b = 0
      while (b < 60) {
        ones(b) += ((h >> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (2 * ones(b) > n) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash60", this, classOf[SimHash60].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

/** Karp-Rabin rolling hash over token hashes: left fold of
  * h ← (h·B + hash60(w) mod P) mod P. Order-sensitive; matches the
  * `aggregate` HOF and the oracle's `list_reduce` exactly.
  */
case class RollingHash(child: Expression, b: Long, p: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = (acc * b + ArrayExprs.hash60(arr.getUTF8String(i)) % p) % p
      i += 1
    }
    acc
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rollingHash", this, classOf[RollingHash].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** Positions of the `m` best centroids by cosine, descending, ties to
  * the LOWER position: per centroid i, key_i = −(dot(v, cents_i) /
  * (vnorm · cnorms_i)) — the identical IEEE operation order as the
  * struct pipeline it replaces (negate(divide(dot, multiply))), with
  * [[java.lang.Double.compare]] ordering (array_sort's double
  * semantics, −0.0 < 0.0) and stable insertion, so when callers order
  * the centroid arrays by cluster id ascending the pick order equals
  * the old (negcos, cl) struct sort bit-for-bit.
  *
  * The old HOF pipeline built nlist structs per row and sorted them
  * INTERPRETED (ArraySort is CodegenFallback — kicking the whole
  * projection out of whole-stage codegen); this is one compiled loop
  * (nlist × dim multiplies + an m-slot insertion) per row and the
  * stage stays fused.
  */
case class ArgTopMCos(v: Expression, vnorm: Expression, cents: Expression,
    cnorms: Expression, m: Int)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  require(m >= 1)

  override def first: Expression = v
  override def second: Expression = vnorm
  override def third: Expression = cents
  override def fourth: Expression = cnorms
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "arg_top_m_cos"

  def compute(varr: ArrayData, vn: Double, cs: ArrayData,
      ns: ArrayData): ArrayData = {
    val nlist = cs.numElements()
    // explicit shape check: this is SQL-reachable (GraftExtensions) and
    // an UnsafeArrayData read past the end returns garbage silently
    if (ns.numElements() < nlist)
      throw new IllegalArgumentException(
        s"arg_top_m_cos: ${ns.numElements()} norms for $nlist centroids")
    val take = math.min(m, nlist)
    val bestKey = new Array[Double](take)
    val bestPos = new Array[Int](take)
    var filled = 0
    val x = varr.toDoubleArray()
    var i = 0
    while (i < nlist) {
      val c = cs.getArray(i)
      val d = math.min(x.length, c.numElements())
      var dot = 0.0
      var j = 0
      while (j < d) { dot += x(j) * c.getDouble(j); j += 1 }
      val key = -(dot / (vn * ns.getDouble(i)))
      // insertion position: first slot with a STRICTLY greater key —
      // equal keys keep the earlier (lower-position) pick first
      if (filled < take || java.lang.Double.compare(key, bestKey(filled - 1)) < 0) {
        var p = if (filled < take) filled else take - 1
        while (p > 0 && java.lang.Double.compare(bestKey(p - 1), key) > 0) {
          bestKey(p) = bestKey(p - 1); bestPos(p) = bestPos(p - 1); p -= 1
        }
        bestKey(p) = key; bestPos(p) = i
        if (filled < take) filled += 1
      }
      i += 1
    }
    new GenericArrayData(bestPos.take(filled))
  }

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Double],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("argTopMCos", this, classOf[ArgTopMCos].getName)
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = $ref.compute($a, $b, $c, $d);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): ArgTopMCos =
    copy(v = newFirst, vnorm = newSecond, cents = newThird, cnorms = newFourth)
}

/** Position of the centroid minimizing L2 distance to `v`: key_i =
  * halves_i − dot(v, cents_i) (identical operation order as the
  * struct pipeline in ops.Pq.assignL2All), minimized with
  * Double.compare, ties to the lower position. One compiled loop.
  */
case class ArgMinL2(v: Expression, cents: Expression, halves: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def first: Expression = v
  override def second: Expression = cents
  override def third: Expression = halves
  override def dataType: DataType = IntegerType
  override def prettyName: String = "arg_min_l2"

  def compute(varr: ArrayData, cs: ArrayData, hs: ArrayData): Int = {
    val nlist = cs.numElements()
    // explicit shape check: SQL-reachable, and an UnsafeArrayData read
    // past the end returns garbage silently
    if (hs.numElements() < nlist)
      throw new IllegalArgumentException(
        s"arg_min_l2: ${hs.numElements()} halves for $nlist centroids")
    val x = varr.toDoubleArray()
    var bestKey = Double.PositiveInfinity
    var bestPos = 0
    var i = 0
    while (i < nlist) {
      val c = cs.getArray(i)
      val d = math.min(x.length, c.numElements())
      var dot = 0.0
      var j = 0
      while (j < d) { dot += x(j) * c.getDouble(j); j += 1 }
      val key = hs.getDouble(i) - dot
      if (i == 0 || java.lang.Double.compare(key, bestKey) < 0) {
        bestKey = key; bestPos = i
      }
      i += 1
    }
    bestPos
  }

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("argMinL2", this, classOf[ArgMinL2].getName)
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = $ref.compute($a, $b, $c);")
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): ArgMinL2 =
    copy(v = newFirst, cents = newSecond, halves = newThird)
}

/** Repetition counters of a token array in one compiled in-row pass:
  * output [n_tokens, n_distinct, top_token_count, n_bigrams,
  * top_bigram_count]. Counts are identical to exploding the tokens
  * (and adjacent-pair bigrams) and aggregating per document — the
  * shuffle-free twin ops.TextAnalysis uses for typical document sizes
  * and for streaming (no cross-row state at all).
  */
case class RepStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rep_stats"

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val uni = new java.util.HashMap[UTF8String, Long]()
    var topUni = 0L
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      val c = uni.merge(t, 1L, (a, b) => a + b)
      if (c > topUni) topUni = c
      i += 1
    }
    val sep = UTF8String.fromString(" ")
    val bi = new java.util.HashMap[UTF8String, Long]()
    var topBi = 0L
    i = 0
    while (i < n - 1) {
      val g = UTF8String.concatWs(sep, arr.getUTF8String(i), arr.getUTF8String(i + 1))
      val c = bi.merge(g, 1L, (a, b) => a + b)
      if (c > topBi) topBi = c
      i += 1
    }
    new GenericArrayData(Array[Long](n.toLong, uni.size.toLong, topUni,
      math.max(n - 1, 0).toLong, topBi))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("repStats", this, classOf[RepStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RepStats =
    copy(child = newChild)
}

/** Count of elements of an `array<string>` that are members of a
  * fixed word set — `size(filter(xs, x => x IN words))` without the
  * interpreted lambda. The membership loop is emitted straight into
  * whole-stage codegen; the set lives in the references array.
  */
case class StopwordHits(child: Expression, words: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "stopword_hits"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def compute(arr: ArrayData): Long = {
    val n = arr.numElements()
    var c = 0L
    var i = 0
    while (i < n) {
      if (set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopset", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = $c.numElements();
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($setRef.contains($c.getUTF8String($i))) ${ev.value}++;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordHits =
    copy(child = newChild)
}

/** Shannon entropy of a string's CODE-POINT distribution, in integer
  * micro-nats: per distinct code point c with count k over n total,
  * contribution = round(k·(ln n − ln k)/n · 1e6), summed as longs —
  * quantize-then-sum, so the cross-char accumulation is order-free
  * (HashMap iteration order cannot matter) and the DuckDB twin's
  * per-(doc, char) grouped SQL produces the identical integer.
  * Empty string → 0. One compiled in-row pass (count map + one loop
  * over distinct chars); the classic "random garbage vs natural
  * text" quality signal (both tails are suspect: near-0 entropy is
  * boilerplate/padding, near-max is noise/encoded binary).
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  // Analysis-time input check. NOT ExpectsInputTypes: its
  // `inputTypes: Seq[AbstractDataType]` signature cannot be written
  // from this package — AbstractDataType is private[sql] in Spark 4.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_entropy requires STRING input, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "char_entropy"

  def compute(s: UTF8String): Long = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    if (n == 0L) return 0L
    val lnN = math.log(n.toDouble)
    var acc = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val k = it.next()
      acc += math.round(k * (lnN - math.log(k.toDouble)) / n * 1e6)
    }
    acc
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charEntropy", this, classOf[CharEntropy].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)
}

/** `array<string>` tokens → `array<struct<start, chunk_tokens, fp>>`:
  * content-defined chunking (the rsync/LBFS boundary idea applied to
  * token streams). A cut falls AFTER every position p (1-based,
  * p ∈ [1, n−k+1]) whose k-token gram satisfies
  * `hash60(gram) % divisor == 0` and whose successor start p+k still
  * lands inside the document; chunk starts are {1} ∪ {p+k : cut at p}
  * (strictly increasing by construction — no sort, no dedup), each
  * chunk runs to the next start − 1 (the last to n), and
  * `fp = hash60(tokens[start..end] joined by " ")` is the chunk's
  * cross-engine content fingerprint. Boundaries depend only on LOCAL
  * k-gram content, so an insertion near the head of a copied document
  * re-synchronizes at the first shared cut and every following chunk
  * fingerprint matches verbatim — the shift-robustness fixed-stride
  * windows (X75) fundamentally lack. Gram hashing reuses the md5
  * `hash60` (identical in DuckDB), NOT a cheaper rolling hash: the
  * oracle twin must spell the same boundary rule, and md5-per-gram is
  * one in-row O(n·k) pass either way. Empty array → empty result;
  * n < k → one whole-document chunk (no cut candidates exist).
  */
case class CdcChunks(child: Expression, k: Int, divisor: Long)
    extends UnaryExpression {
  require(k >= 1 && divisor >= 1)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", LongType, nullable = false),
    StructField("chunk_tokens", LongType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "cdc_chunks"

  private val sep = UTF8String.fromString(" ")

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val starts = scala.collection.mutable.ArrayBuffer[Int](1)
    if (n >= k) {
      val parts = new Array[UTF8String](k)
      var p = 1
      while (p <= n - k + 1) {
        var j = 0
        while (j < k) { parts(j) = arr.getUTF8String(p - 1 + j); j += 1 }
        if (ArrayExprs.hash60(UTF8String.concatWs(sep, parts: _*)) % divisor == 0L
            && p + k <= n) starts += p + k
        p += 1
      }
    }
    val m = starts.length
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val s = starts(i)
      val e = if (i + 1 < m) starts(i + 1) - 1 else n
      val parts = new Array[UTF8String](e - s + 1)
      var j = s
      while (j <= e) { parts(j - s) = arr.getUTF8String(j - 1); j += 1 }
      out(i) = new GenericInternalRow(Array[Any](s.toLong, (e - s + 1).toLong,
        ArrayExprs.hash60(UTF8String.concatWs(sep, parts: _*))))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cdcChunks", this, classOf[CdcChunks].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

/** `array<string>` tokens → `array<long>` of length `terms.size + 1`:
  * element i = occurrences of `terms(i)`, last element = the total
  * token count (so a scorer needs no second pass for the doc
  * length). Values identical to per-term `StopwordHits(_, Seq(t))`
  * and `size(tokens)` — this is purely the fused evaluation.
  */
case class TermCounts(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "term_counts"

  @transient private lazy val index: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    terms.zipWithIndex.foreach { case (t, i) =>
      m.put(UTF8String.fromString(t), i)
    }
    m
  }

  def compute(arr: ArrayData): ArrayData = {
    val tally = new Array[Long](terms.size + 1)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val at = index.get(arr.getUTF8String(i))
      if (at != null) tally(at) += 1
      i += 1
    }
    tally(terms.size) = n
    val out = new Array[Any](tally.length)
    i = 0
    while (i < tally.length) { out(i) = tally(i); i += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("termCounts", this, classOf[TermCounts].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}
