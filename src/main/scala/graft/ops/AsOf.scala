package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the temporal operator Spark has no built-in for
  * (brief: custom operators the reference lacks; composes existing
  * ops per the (a)-preference in the builder prompt).
  *
  * For each left row, attach the greatest right timestamp that is
  * <= the left timestamp within the same key group (DuckDB/kdb
  * `ASOF JOIN` semantics). Implemented as UNION + ONE WINDOW PASS:
  * tag right rows as marks, union with left rows, sort within the
  * key partition by (ts, marks-first), and carry the last non-null
  * mark forward. One shuffle on the keys, linear scan within groups —
  * never the per-row range join / broadcast backward-scan that
  * explodes at 100 TB. Ties (left.ts == right.ts) match the mark, as
  * in ASOF's `>=`.
  */
object AsOf {

  /** `left` gains `asof_ts`: the greatest `right.tsCol` <= its own
    * `tsCol` within equal `keys` (null when no prior right row).
    * `tsCol` must be orderable and identically typed on both sides.
    */
  def joinTs(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String): DataFrame = {
    val k = keys.map(col)
    val marks = right.select(k :+ col(tsCol).as("__ts"): _*)
      .withColumn("__mark", col("__ts"))
      .withColumn("__is_left", lit(0))
    val lefts = left
      .withColumn("__ts", col(tsCol))
      .withColumn("__mark", lit(null).cast(right.schema(tsCol).dataType))
      .withColumn("__is_left", lit(1))
    val w = Window.partitionBy(k: _*)
      // marks sort before left rows at equal ts → >= semantics
      .orderBy(col("__ts").asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lefts.unionByName(marks, allowMissingColumns = true)
      .withColumn("asof_ts", last(col("__mark"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .drop("__ts", "__mark", "__is_left")
  }

  /** Scale-safe twin of [[joinTs]] for LOW-CARDINALITY key sets, same
    * two-phase shape as [[Sessions.twoPhase]]: the one-shot window
    * serializes each key group onto one task, so a 12-target change
    * stream caps at 12-way parallelism no matter the cluster. Here:
    *
    *  - phase 1 carries the last mark WITHIN (key, time-bucket) —
    *    parallelism keys × buckets;
    *  - phase 2 computes each bucket's carry-in (the latest mark of
    *    any earlier bucket) with a running max over the per-bucket
    *    summary — keys × buckets rows, not events — and a coalesce
    *    resolves rows whose bucket holds no earlier mark.
    *
    * EXACT for any bucket width: the as-of mark of a row is either in
    * its own bucket (phase-1 window sees it) or is the latest mark of
    * some earlier bucket (the running max). Oracle-proven identical to
    * the one-shot plan (q_cdc_asof2 vs q_cdc_asof).
    */
  def joinTsTwoPhase(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0)
    val k = keys.map(col)
    val marks = right.select(k :+ col(tsCol).as("__ts"): _*)
      .withColumn("__mark", col("__ts"))
      .withColumn("__is_left", lit(0))
    val lefts = left
      .withColumn("__ts", col(tsCol))
      .withColumn("__mark", lit(null).cast(right.schema(tsCol).dataType))
      .withColumn("__is_left", lit(1))
    val u = lefts.unionByName(marks, allowMissingColumns = true)
      .withColumn("__bk", floor(col("__ts") / bucketWidth))

    val w1 = Window.partitionBy(k :+ col("__bk"): _*)
      .orderBy(col("__ts").asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = u.withColumn("__local",
      last(col("__mark"), ignoreNulls = true).over(w1))

    // per-bucket mark maxima → running strictly-earlier carry-in
    val bmax = u.filter(col("__is_left") === 0)
      .groupBy(k :+ col("__bk"): _*).agg(max(col("__mark")).as("__bmax"))
    val wc = Window.partitionBy(k: _*).orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = u.select(k :+ col("__bk"): _*).distinct()
      .join(bmax, keys :+ "__bk", "left")
      .withColumn("__carry", max(col("__bmax")).over(wc))
      .select(k :+ col("__bk") :+ col("__carry"): _*)

    local.join(carry, keys :+ "__bk")
      .withColumn("asof_ts", coalesce(col("__local"), col("__carry")))
      .filter(col("__is_left") === 1)
      .drop("__ts", "__mark", "__is_left", "__bk", "__local", "__carry")
  }
}
