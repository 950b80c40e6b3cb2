package graft
import org.apache.spark.sql.SparkSession

/** Isolated-query diagnostic: times the named queries 3× each in a
  * fresh JVM with a per-rep cache reset (`runMain graft.IsoBench
  * q_name...`). Separates plan cost (steady-state reps) from one-time
  * JVM state — first executions of the codegen-heavy ANN queries pay
  * ~2× for whole-stage/Janino compilation, which in-bench lands on
  * whichever query compiles the shapes first.
  */
object IsoBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // warmup
    SparkEntry.queries("q_cdc_changes")(spark, dir).write.mode("overwrite").format("noop").save()
    for (n <- args; rep <- 1 to 3) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"[iso] $n rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
