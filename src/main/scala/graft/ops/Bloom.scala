package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zero-UDF Bloom filter over 60-bit hashes (X117): a bit array in a
  * broadcast one-row array<long> column, probed with pure Column
  * arithmetic (the md5-60 permuted-hash family → bit index; word
  * lookup via element_at; bit test via an unsigned shift) — every
  * probe stays inside whole-stage codegen, no UDF, no driver-side
  * per-row work.
  *
  * Why: the exact eval-shingle SET is the broadcast a contamination
  * semi-join needs, and at benchmark-suite scale that set is 10⁷-10⁸
  * longs — a 100-800 MB broadcast. The Bloom carries the same
  * no-false-negative pruning power in mBits/8 bytes (1-2 orders
  * smaller at ~1% false positives), and false positives are NOT a
  * correctness trade here: the exact posting join that follows kills
  * them, so the two-stage plan is output-IDENTICAL to the one-stage
  * one (shared oracle). This is Spark's runtime-filter/semi-join
  * pushdown pattern, built by hand where the optimizer can't see it.
  *
  * Determinism: build and probe share [[position]] — the SAME Column
  * expression computes the bit index on both paths, so membership
  * can never miss (no-false-negative law spec-pinned in OpsSpec).
  */
object Bloom {

  /** Bit position of probe `j` for hash column `h`: the Hashing
    * permuted family mod mBits. Shared by [[build]] and
    * [[mightContain]] — this sharing IS the no-false-negative
    * guarantee.
    */
  def position(h: Column, j: Int, mBits: Int, probes: Int): Column = {
    val (a, b) = Hashing.seeds(probes)(j)
    pmod(pmod(lit(a) * pmod(h, lit(Hashing.P)) + lit(b), lit(Hashing.P)),
      lit(mBits.toLong))
  }

  /** Materialize the bit array from a DataFrame of member hashes.
    * The collect is a BOUNDED digest: ≤ probes · |distinct members|
    * positions, and the member set is the SMALL side by contract
    * (an eval suite, a blocklist, a frozen query set) — never the
    * corpus.
    */
  def build(members: DataFrame, hCol: String, mBits: Int,
      probes: Int): Array[Long] = {
    require(mBits % 64 == 0, "mBits must be a multiple of 64")
    val words = new Array[Long](mBits / 64)
    members
      .select(explode(array((0 until probes).map(j =>
        position(col(hCol), j, mBits, probes)): _*)).as("p"))
      .distinct()
      .collect()
      .foreach { r =>
        val p = r.getLong(0)
        words((p >>> 6).toInt) |= (1L << (p & 63))
      }
    words
  }

  /** One-row broadcast frame carrying the bit array. */
  def frame(df: DataFrame, words: Array[Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    broadcast(Seq(Tuple1(words.toSeq)).toDF("bloom_bm"))
  }

  /** Membership test: AND over the probes' bit tests — word fetch by
    * element_at on the broadcast array, bit extract by unsigned
    * shift. Codegen-friendly (no UDF, no HOF); the probe count
    * unrolls at plan time.
    */
  def mightContain(bm: Column, h: Column, mBits: Int,
      probes: Int): Column =
    (0 until probes).map { j =>
      val pos = position(h, j, mBits, probes)
      val word = element_at(bm,
        (shiftright(pos, 6) + lit(1L)).cast("int"))
      call_function("shiftrightunsigned", word,
        pmod(pos, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
}
