package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.GraphStore

/** Streaming kNN-graph MAINTENANCE — [[IndexStream.maintain]]'s twin
  * for the graph artifact: each micro-batch of arriving embeddings is
  * assigned at the stored centroids and merged into the persisted
  * edge list by [[graft.ops.GraphStore.append]] (only delta-involving
  * pairs scored; stored top-k merged on the unrounded ranking key —
  * cost ∝ batch, never ∝ corpus²). The stream's checkpoint serializes
  * batches, matching the artifact's single-writer contract, and
  * `append` is IDEMPOTENT (already-present ids drop in one bucketed
  * anti-join), so foreachBatch's at-least-once replay is a no-op
  * rather than a double merge — GraphStreamSpec proves micro-batched
  * maintenance equals one batch append AND that a replayed batch
  * changes nothing. Retraining cadence stays an offline policy,
  * exactly as with the ANN index.
  */
object GraphStream {

  def maintain(embs: DataFrame, idCol: String, vecCol: String,
      seedCol: String, graphName: String,
      checkpointDir: String): StreamingQuery =
    embs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          GraphStore.append(batch.sparkSession, graphName, batch,
            idCol, vecCol, seedCol)
      }
      .start()

  /** Streaming TAKEDOWN feed — [[IndexStream.retract]]'s twin for the
    * graph artifact: delete-request micro-batches through
    * [[graft.ops.GraphStore.delete]] (deleted sources drop, survivors
    * that lost a neighbor re-rank from blocks). Replay-safe: deleting
    * already-absent ids touches no source and rewrites identical
    * content, so an at-least-once duplicate delivery is a no-op in
    * the served graph.
    */
  def retract(delIds: DataFrame, idCol: String, graphName: String,
      checkpointDir: String): StreamingQuery =
    delIds.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          GraphStore.delete(batch.sparkSession, graphName, batch, idCol)
      }
      .start()
}
