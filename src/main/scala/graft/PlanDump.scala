package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Round-18 optimization evidence: dumps `.explain("formatted")` for
  * the named queries into `plans/r18/<query>_<tag>.txt` (one file per
  * query), so before/after plan claims in OPTIMIZATION_r18.md are
  * checkable without running Spark.
  *
  * Usage: `runMain graft.PlanDump <tag> q_name [q_name...]`
  * (tag is `before` or `after`; sf dir from SPARK_GRAFT_SF_DIR,
  * default sf0.001 — plan SHAPE is sf-independent here, and the
  * composites' pay-once base builds make bigger SFs pointlessly slow
  * for an explain).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val names = args.drop(1)
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r18"))
    for (name <- names) {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.write(Paths.get(s"plans/r18/${name}_$tag.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      println(s"[plandump] plans/r18/${name}_$tag.txt")
    }
    spark.stop()
  }
}
