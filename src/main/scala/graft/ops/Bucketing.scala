package graft.ops

import org.apache.spark.sql.DataFrame

/** Bucketed table layout for exchange-free (co-located) joins — the
  * 100 TB answer to "this fact-to-fact join shuffles every time":
  * pay the shuffle ONCE at write time, then every join/aggregation on
  * the bucket key reads both sides already hash-partitioned the same
  * way, and Catalyst drops the Exchange entirely (PlanSpec asserts
  * it). Same-bucket-count tables also sort-merge without a sort when
  * `sortBy` matches the join key.
  */
object Bucketing {

  /** Persist `df` hash-bucketed (and sorted) by `key` into the
    * session catalog as `table`.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)
}
