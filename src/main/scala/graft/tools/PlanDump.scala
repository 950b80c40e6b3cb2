package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway diagnostic: print the formatted physical plan of named
  * queries at a given sf dir (`runMain graft.tools.PlanDump <sfDir>
  * q_name...`). Complements IsoBench (timings) when a plan shape is
  * the suspect.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args.tail) {
      println(s"==== $n ====")
      println(graft.SparkEntry.queries(n)(spark, args.head).queryExecution
        .explainString(org.apache.spark.sql.execution.ExtendedMode))
    }
    spark.stop()
  }
}
