package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TopKStore

/** Streaming Misra-Gries heavy hitters (X119): the merge theorem's
  * laws over a real multi-batch ingest — `est ≤ true`,
  * `true − est ≤ n/(k+1)`, every token above the guarantee share
  * present — plus the replay/run semantics every additive store
  * carries.
  */
class TopKStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 3

  // skewed vocabulary: 'a' dominates, mid-weight 'b'/'c', a tail of
  // onces — exactly the regime MG exists for
  private val b0 = Seq(
    ("a a a a a a b b c", Some("s0")),
    ("a a a b c t1 t2", Some("s0")),
    ("x x y", Some("s1")))
  private val b1 = Seq(
    ("a a c c t3 t4 t5", Some("s0")),
    ("x z z", Some("s1")))

  private def applyB(rows: Seq[(String, Option[String])], dir: String,
      run: String, id: Long): Unit =
    TopKStore.applyBatch(rows.toDF("text", "source"), "text", "source",
      dir, runId = run, batchId = id, k = K, nBucketsIfNew = 4)

  private def servedOf(dir: String) =
    TopKStore.summary(spark, dir)
      .as[(String, String, Long, Long)].collect()

  private def exactCounts(rows: Seq[(String, Option[String])]) =
    rows.flatMap { case (t, s) =>
      t.split("\\s+").map(tok => (s.getOrElse("<null>"), tok))
    }.groupBy(identity).map { case (k2, g) => k2 -> g.size.toLong }

  private def checkLaws(dir: String,
      rows: Seq[(String, Option[String])]): Unit = {
    val truth = exactCounts(rows)
    val nSrc = truth.groupBy(_._1._1).map { case (s, m) => s -> m.values.sum }
    val served = servedOf(dir)
    // totals are served from the sentinels — for EVERY source, even
    // one whose whole summary compressed away — and match the true
    // ingested mass; counter rows agree
    val totals = TopKStore.totals(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(totals == nSrc, s"totals $totals != $nSrc")
    served.groupBy(_._1).foreach { case (s, g) =>
      assert(g.map(_._4).toSet == Set(nSrc(s)), s"n_src wrong for $s")
    }
    val est = served.map(r => (r._1, r._2) -> r._3).toMap
    truth.foreach { case ((s, tok), true0) =>
      val e = est.getOrElse((s, tok), 0L)
      assert(e <= true0, s"overestimate at ($s,$tok)")
      assert(true0 - e <= nSrc(s) / (K + 1),
        s"bound broken at ($s,$tok): est $e true $true0 n ${nSrc(s)}")
      if (true0 > nSrc(s) / (K + 1))
        assert(e > 0, s"guaranteed heavy hitter ($s,$tok) missing")
    }
    // capacity law
    served.groupBy(_._1).foreach { case (s, g) =>
      assert(g.size <= K, s"summary over capacity for $s")
    }
  }

  test("multi-batch merge keeps the MG bound and every guaranteed hitter") {
    val dir = Files.createTempDirectory("tk_state").toString
    applyB(b0, dir, "runA", 0)
    applyB(b1, dir, "runA", 1)
    checkLaws(dir, b0 ++ b1)
  }

  test("replayed/stale batches are no-ops; a fresh run keeps merging") {
    val dir = Files.createTempDirectory("tk_rp_state").toString
    applyB(b0, dir, "runA", 0)
    applyB(b1, dir, "runA", 1)
    val want = servedOf(dir).toSet
    applyB(b1, dir, "runA", 1) // crash replay
    assert(servedOf(dir).toSet == want)
    applyB(b0, dir, "runA", 0) // stale re-delivery
    assert(servedOf(dir).toSet == want)
    val b2 = Seq(("a a a q", Some("s0")))
    applyB(b2, dir, "runB", 0) // fresh run, ids restart
    checkLaws(dir, b0 ++ b1 ++ b2)
  }

  test("a compress that drops EVERY counter keeps totals and the mark") {
    val dir = Files.createTempDirectory("tk_drop_state").toString
    // 4 distinct tokens x2 each at k=3: thresh = 2, every counter
    // drops — the sentinel must carry n_src=8 and the replay mark
    val b = Seq(("t1 t1 t2 t2 t3 t3 t4 t4", Some("s0")))
    applyB(b, dir, "runA", 0)
    assert(servedOf(dir).isEmpty, "summary should be empty after the tie")
    assert(TopKStore.totals(spark, dir)
      .as[(String, Long)].collect().toMap == Map("s0" -> 8L))
    // replay of the same batch must still be a no-op (the mark lives
    // on the sentinel)
    applyB(b, dir, "runA", 0)
    assert(TopKStore.totals(spark, dir)
      .as[(String, Long)].collect().toMap == Map("s0" -> 8L))
    // the next batch merges against the true total: bound n/(k+1)
    val b2 = Seq(("q q q q q", Some("s0")))
    applyB(b2, dir, "runA", 1)
    checkLaws(dir, b ++ b2)
  }

  test("vocab within capacity: the summary IS the exact counts") {
    val dir = Files.createTempDirectory("tk_ex_state").toString
    val rows = Seq(("p p p q q r", Some("s0")), ("p q", Some("s0")))
    applyB(rows.take(1), dir, "runA", 0)
    applyB(rows.drop(1), dir, "runA", 1)
    val served = servedOf(dir).map(r => (r._1, r._2) -> r._3).toMap
    assert(served == Map(("s0", "p") -> 4L, ("s0", "q") -> 3L,
      ("s0", "r") -> 1L))
  }
}
