package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Diagnostics
import graft.streaming.CmsStore

/** Streaming Count-Min sketch (X144): cells merge by addition, so the
  * maintained matrix must EQUAL the batch sketch on the union of
  * everything ever ingested — under any batch split, replay, or run
  * boundary — and served estimates must equal the batch operator's.
  * The estimate laws themselves (overestimate, collision-free
  * exactness, merge-by-addition) are pinned in OpsSpec.
  */
class CmsStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Depth = 3
  private val Width = 64

  private val b0 = Seq((0L, "a a b the"), (1L, "c the the"))
  private val b1 = Seq((2L, "b c c the"), (3L, "a zz"))

  private def applyB(rows: Seq[(Long, String)], dir: String,
      run: String, id: Long): Unit =
    CmsStore.applyBatch(rows.toDF("doc_id", "text"), "text", dir,
      runId = run, batchId = id, depth = Depth, width = Width,
      nBucketsIfNew = 4)

  private def storeCells(dir: String) =
    CmsStore.cells(spark, dir).as[(Long, Long, Long)].collect().toSet

  private def batchCells(rows: Seq[(Long, String)]) =
    Diagnostics.cmsCells(rows.toDF("doc_id", "text"), "text",
        Depth, Width)
      .as[(Long, Long, Long)].collect().toSet

  test("split batches maintain the one-shot batch matrix exactly") {
    val dir = Files.createTempDirectory("cms_state").toString
    applyB(b0, dir, "runA", 0)
    applyB(b1, dir, "runA", 1)
    assert(storeCells(dir) == batchCells(b0 ++ b1))
    // served estimates == the batch operator's est on the same keys
    val servedEst = CmsStore.estimates(spark, dir,
        Seq("a", "b", "c", "the", "zz").toDF("tok"), "tok",
        Depth, Width)
      .as[(String, Long)].collect().toMap
    val batchEst = Diagnostics.cmsEstimates(
        (b0 ++ b1).toDF("doc_id", "text"), "text", Depth, Width,
        topN = 100)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(servedEst == batchEst)
    // a never-ingested key estimates a number (possibly 0 or a
    // collision), never null — and still obeys est >= true (true = 0)
    val unseen = CmsStore.estimates(spark, dir,
        Seq("neverseen").toDF("tok"), "tok", Depth, Width)
      .as[(String, Long)].head()
    assert(unseen._2 >= 0L)
  }

  test("replayed and stale batches are no-ops; a fresh run accumulates") {
    val dir = Files.createTempDirectory("cms_rp_state").toString
    applyB(b0, dir, "runA", 0)
    applyB(b1, dir, "runA", 1)
    val want = storeCells(dir)
    applyB(b1, dir, "runA", 1) // crash-replay of the committed batch
    assert(storeCells(dir) == want)
    applyB(b0, dir, "runA", 0) // stale re-delivery below the mark
    assert(storeCells(dir) == want)
    val b2 = Seq((4L, "the zz zz"))
    applyB(b2, dir, "runB", 0) // fresh checkpoint: must apply
    assert(storeCells(dir) == batchCells(b0 ++ b1 ++ b2))
  }

  test("forget decrements exactly: cells == from-scratch over survivors") {
    val dir = Files.createTempDirectory("cms_fg_state").toString
    applyB(b0, dir, "runA", 0)
    applyB(b1, dir, "runA", 1)
    val removed = Seq(b1(1)) // (3L, "a zz")
    CmsStore.forget(removed.toDF("doc_id", "text"), "text", dir,
      Depth, Width)
    assert(storeCells(dir) == batchCells((b0 ++ b1).diff(removed)))
    // a REPLAYED forget (counters would go negative) fails loudly
    // and commits nothing — the exactly-subtractable law is already
    // broken at the caller, so silent flooring would corrupt counters
    val before = storeCells(dir)
    val e = intercept[IllegalStateException] {
      CmsStore.forget(removed.toDF("doc_id", "text"), "text", dir,
        Depth, Width)
    }
    assert(e.getMessage.contains("forget"))
    assert(storeCells(dir) == before)
  }

  test("streaming maintenance equals the batch matrix on the union") {
    implicit val sqlCtx = spark.sqlContext
    val tableDir = Files.createTempDirectory("cms_str_state").toString
    val ckpt = Files.createTempDirectory("cms_ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = CmsStore.maintain(input.toDF().toDF("doc_id", "text"),
      "text", tableDir, ckpt, depth = Depth, width = Width,
      nBuckets = 4)
    Seq(b0, b1).foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    assert(storeCells(tableDir) == batchCells(b0 ++ b1))
  }
}
