package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream filtering (SURVEY §2.2 F1).
  *
  * The reference compiles one regex and matches it against
  * `"{db}.{table}"` before row decode, pruning whole events cheaply
  * (reference/src/main.rs:220,260-262; example pattern
  * reference/README.md:46).
  *
  * Spark-first: a plain `rlike` predicate. Catalyst's
  * PushDownPredicates moves it ahead of any downstream projection, and
  * because `db`/`table` derive from source columns it collapses into
  * the scan stage — the same "filter before materialize" effect the
  * reference hand-codes. At 100 TB this predicate sits inside
  * whole-stage codegen; no shuffle, no extra pass.
  */
object Filters {

  /** `"{db}.{table}" ~ pattern` predicate. */
  def dbTableMatches(pattern: String): Column =
    concat_ws(".", col("db"), col("table")).rlike(pattern)

  def regexFilter(changes: DataFrame, pattern: String): DataFrame =
    changes.filter(dbTableMatches(pattern))
}
