package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cache discipline for operator bases that are referenced from
  * several exchange subtrees (shingle maps, embedding norms, shared
  * envelopes).
  *
  * `Dataset.storageLevel` resolves through the session CacheManager by
  * canonicalized plan, so a fresh DataFrame whose plan matches an
  * already-cached one reports the cached level — persisting only when
  * the lookup misses keeps repeated operator invocations from piling
  * duplicate cache requests ("Asked to cache already cached data") and
  * bounds cache growth to one entry per distinct base plan, not one
  * per call.
  *
  * Lifecycle contract: operators deliberately leave the cached base in
  * place for the duration of the job that consumes the returned (lazy)
  * DataFrame — there is no post-action hook on a Dataset, so eager
  * unpersist inside the operator would defeat the cache before the
  * caller's terminal action runs. Long-lived sessions embedding these
  * operators should scope cache lifetime themselves:
  * `spark.catalog.clearCache()` between jobs (what `graft.Bench` and
  * `graft.Verify` do) or `unpersist()` on the inputs they hold.
  */
object Caching {

  /** Persist `df` unless an identical (canonicalized) plan is already
    * cached, in which case the existing entry is shared as-is.
    */
  def cachedOnce(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) df.persist() else df
}
