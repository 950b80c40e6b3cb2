package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, as pure
  * Catalyst higher-order-function pipelines (codegen'd; no UDF, no
  * MLlib dependency in the hot path).
  *
  * Determinism contract with the DuckDB oracle: floats are widened to
  * double (exact), products are exact-per-element, and sums fold
  * SEQUENTIALLY left-to-right on both engines (`aggregate` here,
  * `list_reduce(list_prepend(0.0, …))` in SQL) — so cosine values are
  * bit-identical and micro-quantization can never disagree.
  */
object Vectors {

  // array-level Cast, not transform(x => x.cast): identical values
  // (float→double widening), but Cast is codegen'd while the HOF's
  // CodegenFallback would kick the whole stage out of codegen
  def toDouble(v: Column): Column = v.cast("array<double>")
  def toDoubleSql(v: String): String = s"[x::DOUBLE for x in $v]"

  /** Sequential left fold sum of an array<double>. */
  def seqSum(v: Column): Column = aggregate(v, lit(0.0), (acc, x) => acc + x)
  def seqSumSql(v: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, $v), (acc, x) -> acc + x)"

  /** Native codegen'd expression — the `zip_with`+`aggregate` HOF
    * form evaluates interpreted per element; same left-to-right
    * association, so oracle values are unchanged.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.ArrayExprs.dotProduct(a, b)
  def dotSql(a: String, b: String): String =
    seqSumSql(s"[$a[i] * $b[i] for i in range(1, len($a) + 1)]")

  def norm(a: Column): Column = sqrt(dot(a, a))
  def normSql(a: String): String = s"sqrt(${seqSumSql(s"[x * x for x in $a]")})"

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
  def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}))"

  /** Cosine quantized to integer micros — the oracle-safe output form. */
  def cosineMicros(a: Column, b: Column): Column =
    round(cosine(a, b) * 1e6).cast("long")
  def cosineMicrosSql(a: String, b: String): String =
    s"round(${cosineSql(a, b)} * 1e6)::BIGINT"
}
