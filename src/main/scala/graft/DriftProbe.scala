package graft

import org.apache.spark.sql.SparkSession

/** Bench-attribution probe for the two flagged drift items
  * (VERDICT r11 "What's wrong" #2/#3): runs `q_mm_audio` and
  * `q_text_rm3_frozen_serve` N times each inside ONE session —
  * clearCache between iterations, exactly the Bench warm-run shape —
  * and prints every wall time. The question each answers:
  *
  *  - `q_mm_audio` warm moved 0.55 → 1.26 s between the r10 and r11
  *    driver sweeps on BYTE-IDENTICAL code. If the within-session
  *    spread of the identical plan is a large fraction of that swing,
  *    the cross-sweep delta is run-to-run noise on a sub-second
  *    query, not a regression.
  *  - `q_text_rm3_frozen_serve` warm moved ~1.0 → 1.73 s r9 → r10,
  *    also with the serve path byte-identical (git: the only r9→r10
  *    Retrieval.scala change was `prfExpandTopK`'s cachedOnce, which
  *    `scorePrfFrozen` never executes). Same test: the distribution
  *    of N identical serves bounds how much of the delta a single
  *    sampled pair can carry.
  *
  * Round 12 extended the same probe to `q_text_bpe` (lock FAIL ×5.10
  * with a warm>cold inversion on untouched code) and `q_text_rm3`
  * (×2.37) — the query list is now an argument so every future
  * unattributed lock trip runs through the identical instrument.
  *
  * Usage: `runMain graft.DriftProbe [sfDir] [iters] [q1,q2,...]`
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(8)
    val queryNames = args.lift(2)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("q_mm_audio", "q_text_rm3_frozen_serve"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def series(name: String): Seq[Double] = {
      val fn = SparkEntry.queries(name)
      (1 to iters).map { i =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[driftprobe] $name iter $i: $s%.3f s")
        s
      }
    }

    queryNames.foreach { name =>
      val ts = series(name)
      val warm = ts.drop(1) // iter 1 pays the freeze / first-plan cost
      val mn = warm.min; val mx = warm.max
      val med = warm.sorted.apply(warm.size / 2)
      println(f"[driftprobe] $name warm min/median/max: " +
        f"$mn%.3f / $med%.3f / $mx%.3f s (spread x${mx / mn}%.2f)")
    }
    spark.stop()
  }
}
