package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe event-time sessionization (gap semantics identical to
  * `session_window`: a new session starts iff the gap to the previous
  * event is >= the threshold; session end = last event + gap).
  *
  * The one-shot `session_window` / gaps-and-islands formulation
  * partitions its window by the session KEY alone — with a
  * low-cardinality key set (the change stream has 12 (db, table)
  * targets) the sort-and-scan serializes onto 12 tasks no matter how
  * big the cluster is. [[twoPhase]] removes that cap:
  *
  *  - '''Phase 1''' buckets events by (key, floor(ts / bucketUs)) and
  *    builds bucket-local sessions; the window partitions on
  *    (key, bucket), so parallelism = keys × time-buckets — at 100 TB,
  *    thousands of tasks, each sorting one bounded bucket.
  *  - '''Phase 2''' merges sessions that straddle bucket boundaries
  *    with a window over the LOCAL SESSIONS per key. Sessions within a
  *    key are time-disjoint and start-ordered, so two consecutive ones
  *    merge iff `next.start − prev.lastEvent < gap`; a running group
  *    id stitches transitive chains. This pass is per-key sequential
  *    again, but its input is sessions, not events — compressed by the
  *    per-bucket event density (millions-to-one at 100 TB), which is
  *    what makes the cap harmless.
  *
  * EXACT for any bucket width: splits inside a bucket are decided with
  * complete local order; splits across buckets are exactly the
  * boundary-merge decisions phase 2 replays. Oracle-checked equal to
  * the session_window twin (q_cdc_sessions2 vs q_cdc_sessions).
  */
object Sessions {

  /** df must carry `keys` and an epoch-micros `tsUsCol`. Output:
    * keys..., sess_start_us, sess_end_us, n_changes.
    */
  def twoPhase(df: DataFrame, keys: Seq[String], tsUsCol: String,
      gapUs: Long, bucketUs: Long): DataFrame = {
    require(bucketUs > 0 && gapUs > 0)
    def kcols: Seq[Column] = keys.map(col)
    val evs = df
      .select(kcols :+ col(tsUsCol).cast("long").as("ts_us"): _*)
      .withColumn("bk", floor(col("ts_us") / bucketUs))

    // phase 1: sessions local to one (key, bucket)
    val w1 = Window.partitionBy(kcols :+ col("bk"): _*).orderBy(col("ts_us"))
    val prevTs = lag(col("ts_us"), 1).over(w1)
    val local = evs
      .withColumn("new_sess",
        when(prevTs.isNull || col("ts_us") - prevTs >= gapUs, 1).otherwise(0))
      .withColumn("sid", sum(col("new_sess"))
        .over(w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(kcols :+ col("bk") :+ col("sid"): _*)
      .agg(min(col("ts_us")).as("start_us"), max(col("ts_us")).as("last_us"),
        count(lit(1)).as("n"))

    // phase 2: stitch boundary sessions — window over sessions only.
    // Local sessions of one key are time-disjoint, so last_us is
    // increasing in start order and the consecutive-gap test is exact.
    val w2 = Window.partitionBy(kcols: _*).orderBy(col("start_us"))
    val prevLast = lag(col("last_us"), 1).over(w2)
    local
      .withColumn("new_grp",
        when(prevLast.isNull || col("start_us") - prevLast >= gapUs, 1)
          .otherwise(0))
      .withColumn("gid", sum(col("new_grp"))
        .over(w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(kcols :+ col("gid"): _*)
      .agg(min(col("start_us")).as("sess_start_us"),
        (max(col("last_us")) + gapUs).as("sess_end_us"),
        sum(col("n")).cast("long").as("n_changes"))
      .select(kcols :+ col("sess_start_us") :+ col("sess_end_us")
        :+ col("n_changes"): _*)
  }
}
