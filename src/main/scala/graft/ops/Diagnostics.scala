package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pre-shuffle key diagnostics (X101): the measurement that decides
  * whether a join/groupBy key needs salting, AQE skew handling, or a
  * broadcast — BEFORE the 100 TB shuffle runs, not after it straggles.
  * Every skew mitigation in this repo (the salted posting join, the
  * df-capped gram join, AQE skew-join) presupposes someone measured
  * the key distribution; this is that operator.
  */
object Diagnostics {

  /** Top-`topN` heaviest values of `keyCol` with their absolute and
    * fractional (integer-micros) share, plus the global row/key
    * counts as context columns: `share_micros · n_keys / 10⁶` ≫ 1 is
    * the skew factor that says the uniform-hash assumption is wrong.
    * NULL keys profile as the sentinel `'<null>'` (a NULL-heavy key
    * is the most common real-world skew axis — dropping it would
    * hide exactly the hot key the profile exists to find; the
    * sentinel also sidesteps the Spark-NULLS-FIRST / DuckDB-NULLS-
    * LAST ordering divergence).
    *
    * == 100 TB shape ==
    *
    * One partial-agg shuffle to |keys| count rows, a TakeOrdered
    * top-N (never a global sort), a broadcast of the 1-row totals;
    * the rank window orders ≤ topN rows. Cost ∝ corpus scan +
    * |keys|, output ∝ topN.
    */
  def keyProfile(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    val counts = df
      .select(coalesce(col(keyCol).cast("string"), lit("<null>")).as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("total_rows"),
      count(lit(1)).as("n_keys"))
    // limit first (TakeOrderedAndProject), then rank the <= topN
    // survivors — same (cnt desc, key asc) total order, so the local
    // row_number equals the global rank
    counts.orderBy(col("cnt").desc, col("key").asc).limit(topN)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("key").asc)))
      .crossJoin(broadcast(totals))
      .selectExpr("CAST(rank AS BIGINT) AS rank", "key",
        "CAST(cnt AS BIGINT) AS cnt",
        "CAST((cnt * 1000000) div total_rows AS BIGINT) AS share_micros",
        "CAST(total_rows AS BIGINT) AS total_rows",
        "CAST(n_keys AS BIGINT) AS n_keys")
  }

  def keyProfileSql(keyExpr: String, table: String, topN: Int): String =
    s"""WITH c AS (
       |  SELECT coalesce(($keyExpr)::VARCHAR, '<null>') AS key,
       |    count(*) AS cnt
       |  FROM $table GROUP BY 1),
       |t AS (SELECT sum(cnt) AS total_rows, count(*) AS n_keys FROM c),
       |top AS (
       |  SELECT key, cnt,
       |    row_number() OVER (ORDER BY cnt DESC, key ASC) AS rank
       |  FROM c ORDER BY cnt DESC, key ASC LIMIT $topN)
       |SELECT rank::BIGINT AS rank, key, cnt::BIGINT AS cnt,
       |  ((cnt * 1000000) // total_rows)::BIGINT AS share_micros,
       |  total_rows::BIGINT AS total_rows, n_keys::BIGINT AS n_keys
       |FROM top, t""".stripMargin
}
