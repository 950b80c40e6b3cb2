package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted kNN-graph artifact — the build/serve split for the graph
  * family ([[Similarity.knnGraph]] → [[Graph.pageRank]] /
  * kNN-classify), mirroring what [[Index]] does for ANN serving: the
  * expensive corpus-wide work (seeded k-means training + the blocked
  * Σ|list|² self-join) runs ONCE and lands as a bucketed table;
  * PageRank, classification and any other graph consumer then serve
  * from the stored edge list with no training stage in their plans
  * (PlanSpec asserts it — no checkpoint scans, no Lloyd rounds).
  *
  * Before this split the three graph queries each retrained the same
  * k-means and rebuilt the same blocked join in-plan — three full
  * trainings for one artifact (the round-5/6 verdict's standing perf
  * debt). At 100 TB the difference is not a constant: training is a
  * corpus-wide pass, serving PageRank is |edges| = n·k rows.
  *
  * == Layout ==
  *
  * Two bucketed parquet tables under `<baseDir>/<name>/`:
  *  - `edges`   (src_id, rank, neighbor_id, cos_micros), bucketed by
  *    src_id — PageRank's per-iteration join keys on the edge source,
  *    so the big side arrives pre-hashed and never re-exchanges;
  *  - `labels`  (id, label), bucketed by id — the classify vote's
  *    neighbor-label attach and the truth join read it in place.
  *
  * == Determinism contract ==
  *
  * The build is [[Similarity.knnGraph]] verbatim: seeded centroids,
  * fixed unrolled Lloyd rounds, (cos desc, id) ranking — the stored
  * edges are bit-identical to what the in-plan query computes, so
  * every serve query shares the in-plan oracle unchanged.
  */
object GraphStore {

  private def part(name: String, p: String) = s"${name}_$p"

  private def graphDir(baseDir: Option[String], name: String): String =
    s"${baseDir.getOrElse(s"${sys.props("java.io.tmpdir")}/graft_graph")}/$name"

  /** Whether `name` is already attached in this session's catalog. */
  def exists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(part(name, "edges"))

  /** Train + block-join + persist: one [[Similarity.knnGraph]] pass,
    * bucket-written — the pay-once side of the split.
    */
  def build(spark: SparkSession, embs: DataFrame, idCol: String,
      vecCol: String, seedCol: String, name: String, k: Int, iters: Int,
      massign: Int = 1, nBuckets: Int = 8,
      baseDir: Option[String] = None): Unit = {
    val dir = graphDir(baseDir, name)
    val edges =
      Similarity.knnGraph(embs, idCol, vecCol, seedCol, k, iters, massign)
    val labels = embs.select(col(idCol).as("id"),
      col(seedCol).cast("long").as("label"))
    Bucketing.writeBucketed(edges, part(name, "edges"), "src_id",
      nBuckets, Some(s"$dir/edges"))
    Bucketing.writeBucketed(labels, part(name, "labels"), "id",
      nBuckets, Some(s"$dir/labels"))
  }

  /** The stored edge list, (src_id, rank, neighbor_id, cos_micros) —
    * already the [[Similarity.knnGraph]] output shape.
    */
  def edges(spark: SparkSession, name: String): DataFrame =
    spark.table(part(name, "edges"))

  /** PageRank served from the stored edges: [[Graph.pageRank]] over a
    * zero-training scan. The edges table is bucketed by src_id, the
    * per-iteration contribution join keys on src — the n·k edge side
    * reads pre-hashed.
    */
  def pageRank(spark: SparkSession, name: String, iters: Int,
      dampingPct: Int = 85): DataFrame =
    Graph.pageRank(
      edges(spark, name)
        .select(col("src_id").as("src"), col("neighbor_id").as("dst")),
      iters, dampingPct)

  /** kNN classification served from the stored edges + labels — the
    * vote/tie-break half of [[Similarity.knnClassify]] with the graph
    * (and the label projection) read instead of recomputed. Output
    * identical: (id, pred_label, votes, label, correct).
    */
  def classify(spark: SparkSession, name: String): DataFrame = {
    val graph = edges(spark, name)
    val labels = spark.table(part(name, "labels"))
    val votes = graph
      .join(labels.select(col("id").as("neighbor_id"),
        col("label").as("nlabel")), "neighbor_id")
      .groupBy(col("src_id"), col("nlabel"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("votes").desc, col("nlabel").asc)
    votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("src_id").as("id"), col("nlabel").as("pred_label"),
        col("votes"))
      .join(labels, "id")
      .select(col("id"), col("pred_label"), col("votes"), col("label"),
        (col("pred_label") === col("label")).cast("long").as("correct"))
  }
}
