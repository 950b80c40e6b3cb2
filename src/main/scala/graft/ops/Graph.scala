package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists — here PageRank, the
  * centrality score that turns the kNN graph ([[Similarity.knnGraph]])
  * into a data-VALUATION signal: high-rank documents sit in dense,
  * well-connected neighborhoods (representative; keep for training),
  * rank sinks are outliers (candidates for the quality gate). The
  * graph counterpart to [[Dedup.dupClusters]]' connected components,
  * exercising the other classic iterative-dataflow shape (fixed
  * damped iteration instead of fixpoint convergence).
  *
  * == Determinism contract ==
  *
  * Pure integer arithmetic end-to-end: ranks live in micros, each
  * node's contribution is `pr div outdeg` (floor — both engines
  * truncate positives identically), inflows sum as longs
  * (associative), and the damped update is
  * `(100−d)·1e4 + (d·inflow) div 100`. No floats anywhere, so the
  * oracle's unrolled CTEs match bit-for-bit. Dangling mass is NOT
  * redistributed (nodes without out-edges leak rank — the standard
  * simplification; with a kNN edge list every node has out-degree k).
  *
  * == 100 TB shape ==
  *
  * Each iteration is one join of the edge list with the rank table on
  * src plus one partial-aggregated shuffle of (dst, contrib) — both
  * keyed ON THE EDGE ENDPOINTS, so pre-partitioning edges by src (and
  * caching them — done here) makes every round reuse the same
  * exchange. Rounds chain linearly in one lazy plan (no action per
  * round); at hundreds of rounds you would localCheckpoint every ~10
  * to cap lineage, but PageRank converges in tens of rounds and this
  * operator's contract is a FIXED iteration count.
  */
object Graph {

  /** `iters` damped PageRank rounds over (src, dst) edges.
    * Output: (id, pr_micros) for every node with any edge.
    */
  def pageRank(edges: DataFrame, iters: Int, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val e = Caching.cachedOnce(edges.select(col("src"), col("dst")))
    val nodes = Caching.cachedOnce(
      e.select(col("src").as("id"))
        .union(e.select(col("dst").as("id"))).distinct())
    val out = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val base = (100L - dampingPct) * 10000L
    var pr = nodes.select(col("id"), lit(1000000L).as("pr"))
    for (_ <- 1 to iters) {
      val inflow = e.join(out, "src")
        .join(pr.select(col("id").as("src"), col("pr")), "src")
        .select(col("dst").as("id"), expr("pr div outdeg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("infl"))
      pr = nodes.join(inflow, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(s"($dampingPct * coalesce(infl, 0L)) div 100"))
            .as("pr"))
    }
    pr.select(col("id"), col("pr").as("pr_micros"))
  }

  /** DuckDB twin of [[pageRank]]: the same rounds unrolled as CTEs
    * over `edgesSql` (a complete SELECT returning (src, dst) — may
    * itself start with WITH; it nests).
    */
  def pageRankSql(edgesSql: String, iters: Int, dampingPct: Int = 85): String = {
    val base = (100L - dampingPct) * 10000L
    val rounds = (1 to iters).map { r =>
      s"""pr$r AS (
         |  SELECT n.id, ($base + ($dampingPct * coalesce(i.infl, 0)) // 100)::BIGINT AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS id, sum(p.pr // o.outdeg) AS infl
         |    FROM edges e JOIN outd o ON e.src = o.src
         |    JOIN pr${r - 1} p ON p.id = e.src
         |    GROUP BY 1) i ON n.id = i.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH g AS ($edgesSql),
       |edges AS (SELECT src, dst FROM g),
       |outd AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
       |nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
       |pr0 AS (SELECT id, 1000000::BIGINT AS pr FROM nodes),
       |$rounds
       |SELECT id, pr AS pr_micros FROM pr$iters""".stripMargin
  }
}
