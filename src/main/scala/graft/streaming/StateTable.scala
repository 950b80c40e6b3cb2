package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.cdc.Merge
import graft.streaming.LwwMerge.KeyedChange

/** Materialize a keyed CURRENT-STATE table from the change stream —
  * the reference's end goal (`mysql → cdc-rs → pubsub → CDC-enabled
  * bigquery table`, reference/README.md:11): downstream readers see
  * one row per live key, updated by each micro-batch.
  *
  * Each batch unions the stored winners with the new changes and
  * keeps the per-key LWW winner, INCLUDING tombstones — a remembered
  * Delete is what stops a stale late backfill from resurrecting the
  * row. Read the table through [[graft.cdc.Merge.current]].
  *
  * The per-batch rewrite is idempotent (same input batch → same
  * table), so checkpointed replays after a crash converge — the same
  * exactly-once-effect argument as the reference's
  * offsets-before-rows SQLite checkpointing (main.rs:238-255), done
  * by the streaming commit log. At 100 TB the rewrite becomes a
  * partition-scoped compaction (partition the table by bucket(key),
  * rewrite only buckets present in the batch) or a Delta/Iceberg
  * MERGE — the merge logic is unchanged.
  */
object StateTable {

  /** One micro-batch application: previous winners ⊎ batch → new
    * winners (tombstones kept).
    */
  def applyBatch(existing: DataFrame, batch: DataFrame): DataFrame =
    Merge.winners(existing.unionByName(batch))

  /** Run the maintenance query. `tableDir` holds the winners as
    * parquet; `checkpointDir` the stream's offset/commit log.
    */
  def maintain(changes: Dataset[KeyedChange], tableDir: String,
      checkpointDir: String): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .foreachBatch { (batch: Dataset[KeyedChange], _: Long) =>
        val spark = batch.sparkSession
        val existing =
          if (new java.io.File(tableDir).exists())
            spark.read.parquet(tableDir)
          else batch.toDF().limit(0)
        // localCheckpoint materializes the previous table so the
        // overwrite below cannot consume the files it is replacing
        applyBatch(existing.localCheckpoint(true), batch.toDF())
          .write.mode(SaveMode.Overwrite).parquet(tableDir)
      }
      .start()
}
