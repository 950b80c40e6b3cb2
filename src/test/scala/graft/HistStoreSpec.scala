package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Diagnostics
import graft.streaming.HistStore

/** Streaming token-length histogram (X113): binned counts merge by
  * addition, so the maintained sketch must EQUAL the batch quantile
  * sketch on the union of everything ever ingested — under any batch
  * split, replay, or run boundary. The sketch's value contract (the
  * true nearest-rank quantile lies inside the served [q_lo, q_hi]
  * bracket) is pinned in OpsSpec against a plain-Scala reference.
  */
class HistStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Pcts = Seq(50, 90, 99)

  // token counts chosen to straddle the exact region (< 16) and two
  // log bins above it
  private def doc(n: Int, src: String): (String, Option[String]) =
    (Seq.fill(n)("w").mkString(" "), Some(src))

  private val b0 = Seq(doc(3, "s0"), doc(17, "s0"), doc(40, "s0"),
    doc(5, "s1"))
  private val b1 = Seq(doc(100, "s0"), doc(7, "s1"), doc(7, "s1"),
    ("stray doc", None))

  private def applyB(rows: Seq[(String, Option[String])], dir: String,
      run: String, id: Long): Unit =
    HistStore.applyBatch(rows.toDF("text", "source"), "text", "source",
      dir, runId = run, batchId = id, nBucketsIfNew = 4)

  private def served(dir: String) =
    HistStore.quantiles(spark, dir, Pcts)
      .as[(String, Long, Long, Long, Long)].collect().toSet

  private def batchSketch(rows: Seq[(String, Option[String])]) =
    Diagnostics.lengthQuantileSketch(rows.toDF("text", "source"),
        "text", "source", Pcts)
      .as[(String, Long, Long, Long, Long)].collect().toSet

  test("split batches serve the one-shot batch sketch exactly") {
    val dir = Files.createTempDirectory("hs_state").toString
    applyB(b0, dir, "runA", 0)
    applyB(b1, dir, "runA", 1)
    assert(served(dir) == batchSketch(b0 ++ b1))
  }

  test("replayed and stale batches are no-ops; a fresh run accumulates") {
    val dir = Files.createTempDirectory("hs_rp_state").toString
    applyB(b0, dir, "runA", 0)
    applyB(b1, dir, "runA", 1)
    val want = served(dir)
    applyB(b1, dir, "runA", 1) // crash-replay of the committed batch
    assert(served(dir) == want)
    applyB(b0, dir, "runA", 0) // stale re-delivery below the mark
    assert(served(dir) == want)
    // fresh checkpoint: ids restart at 0, data is new — must apply
    val b2 = Seq(doc(200, "s0"), doc(9, "s2"))
    applyB(b2, dir, "runB", 0)
    assert(served(dir) == batchSketch(b0 ++ b1 ++ b2))
  }

  test("forget decrements exactly: served == from-scratch over survivors") {
    val dir = Files.createTempDirectory("hs_fg_state").toString
    applyB(b0, dir, "runA", 0)
    applyB(b1, dir, "runA", 1)
    // take down one s0 doc and one s1 doc (by content, the takedown
    // manifest's shape) — binned counts subtract exactly
    val removed = Seq(doc(17, "s0"), doc(7, "s1"))
    HistStore.forget(removed.toDF("text", "source"), "text", "source", dir)
    val survivors = (b0 ++ b1).diff(removed)
    assert(served(dir) == batchSketch(survivors))
    // removing every remaining s1 doc empties its rows but keeps the
    // store readable; s0 and the rest are untouched
    val s1Rest = survivors.filter(_._2.contains("s1"))
    HistStore.forget(s1Rest.toDF("text", "source"), "text", "source", dir)
    assert(served(dir) == batchSketch(survivors.diff(s1Rest)))
    assert(!served(dir).exists(_._1 == "s1"))
  }

  test("streaming maintenance equals the batch sketch on the union") {
    implicit val sqlCtx = spark.sqlContext
    val tableDir = Files.createTempDirectory("hs_str_state").toString
    val ckpt = Files.createTempDirectory("hs_ckpt").toString
    val input = MemoryStream[(String, Option[String])]
    val q = HistStore.maintain(input.toDF().toDF("text", "source"),
      "text", "source", tableDir, ckpt, nBuckets = 4)
    Seq(b0, b1).foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    assert(served(tableDir) == batchSketch(b0 ++ b1))
  }
}
