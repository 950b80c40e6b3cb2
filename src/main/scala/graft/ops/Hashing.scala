package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing for the dedup / fingerprint
  * operators.
  *
  * Everything here is computed identically by Spark (Catalyst `Column`
  * expressions, codegen'd) and by the DuckDB oracle (SQL fragments
  * generated from the SAME Scala constants), so MinHash signatures,
  * SimHash bits and LSH band keys hash-match bit-for-bit between the
  * engine under test and the oracle.
  *
  * Base hash: the low 60 bits (15 hex chars) of md5 — md5 of UTF-8
  * bytes is identical everywhere, and 60 bits always fits a signed
  * int64, so `('0x'||substr)::BIGINT` (DuckDB) == `conv(substr,16,10)`
  * (Spark) with no sign traps. Permuted hash family:
  * `h_j(x) = (a_j * (x mod P) + b_j) mod P` with P = 2^31-1, so the
  * product stays < 2^62 (no overflow on either engine).
  */
object Hashing {

  /** Mersenne prime 2^31-1: keeps a*x+b inside int64. */
  val P = 2147483647L

  /** 60-bit md5-derived hash of a string column. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** DuckDB fragment computing the same 60-bit hash of `e`. */
  def hash60Sql(e: String): String =
    s"('0x' || substring(md5($e), 1, 15))::BIGINT"

  /** Deterministic (a, b) hash-family seeds via splitmix-ish LCG;
    * a != 0 guaranteed. Same values are inlined into the oracle SQL.
    */
  def seeds(n: Int): IndexedSeq[(Long, Long)] = {
    var x = 0x9e3779b97f4a7c15L
    def next(): Long = {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 33) % P
    }
    (0 until n).map { _ =>
      val a = { val v = next(); if (v == 0) 1L else v }
      (a, next())
    }
  }
}
