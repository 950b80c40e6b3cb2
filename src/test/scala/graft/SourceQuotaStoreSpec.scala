package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SourceQuotaStore

/** Persistent per-source admission quota: the X95 domain cap enforced
  * over a stream — one-batch equivalence with the batch operator,
  * cross-batch budget memory, cross-run persistence, replay safety,
  * and the release (takedown) path.
  */
class SourceQuotaStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def runStream(tableDir: String, outDir: String, cap: Int,
      rows: Seq[Seq[(Long, String, String)]]): Unit = {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("sqs_ckpt").toString
    val input = MemoryStream[(Long, String, String)]
    val q = SourceQuotaStore.maintain(
      input.toDF().toDF("doc_id", "text", "source"),
      "doc_id", "text", "source", cap, tableDir, outDir, ckpt,
      nBuckets = 4)
    rows.foreach { batch =>
      input.addData(batch: _*)
      q.processAllAvailable()
    }
    q.stop()
  }

  // quality ranking is (qualityMicros desc, doc_id asc); these texts
  // only need DISTINCT quality per source for the hand-checks below
  private def doc(id: Long, src: String, nWords: Int): (Long, String, String) =
    (id, Seq.tabulate(nWords)(i => s"word$i").mkString(" "), src)

  test("one batch from empty state == the batch sourceCap selection") {
    val tableDir = Files.createTempDirectory("sqs1_state").toString
    val outDir = Files.createTempDirectory("sqs1_out").toString
    val docs = cdc.Io.table(spark, "/root/testdata/sf0.001", "documents")

    SourceQuotaStore.applyBatch(docs, "doc_id", "text", "source",
      cap = 10, tableDir, outDir, runId = "run-1", batchId = 0L,
      nBucketsIfNew = 4)

    val streamed = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    val batch = ops.Curation.sourceCap(docs, "doc_id", "text", "source",
      cap = 10).select("doc_id").as[Long].collect().toSet
    assert(streamed.nonEmpty && streamed == batch)
    // spend equals the per-source admitted count (10 each here)
    val spend = SourceQuotaStore.spend(spark, tableDir)
      .as[(String, Long)].collect().toMap
    assert(spend.values.forall(_ == 10L) && spend.size == 20)
  }

  test("budget is remembered across batches and runs; replay cannot over-admit") {
    val tableDir = Files.createTempDirectory("sqs2_state").toString
    val outDir = Files.createTempDirectory("sqs2_out").toString

    // cap 3 on source A: batch 1 has 2 A-docs (both admitted), batch 2
    // has 3 (only the best one fits); B never fills
    runStream(tableDir, outDir, cap = 3, Seq(
      Seq(doc(1, "A", 5), doc(2, "A", 9), doc(10, "B", 4)),
      Seq(doc(3, "A", 30), doc(4, "A", 20), doc(5, "A", 10), doc(11, "B", 6))))
    val got = spark.read.parquet(outDir).select("doc_id").as[Long]
      .collect().toSet
    // batch 2's best A-doc is doc 3 (highest quality: longest text)
    assert(got == Set(1L, 2L, 10L, 11L, 3L))
    assert(SourceQuotaStore.spend(spark, tableDir)
      .as[(String, Long)].collect().toMap == Map("A" -> 3L, "B" -> 2L))

    // a FRESH run (fresh checkpoint) still sees A exhausted
    runStream(tableDir, outDir, cap = 3, Seq(Seq(doc(6, "A", 40))))
    assert(spark.read.parquet(outDir).select("doc_id").as[Long]
      .collect().toSet == Set(1L, 2L, 10L, 11L, 3L))

    // replaying an already-committed batch admits nothing further
    // (counts are already bumped) — the cap can never over-admit
    SourceQuotaStore.applyBatch(
      Seq(doc(3, "A", 30), doc(4, "A", 20)).toDF("doc_id", "text", "source"),
      "doc_id", "text", "source", cap = 3, tableDir, outDir,
      runId = "run-x", batchId = 99L, nBucketsIfNew = 4)
    assert(SourceQuotaStore.spend(spark, tableDir)
      .as[(String, Long)].collect().toMap == Map("A" -> 3L, "B" -> 2L))

    // generic StateTable compaction applies and preserves the spend
    graft.streaming.StateTable.compact(spark, tableDir)
    assert(SourceQuotaStore.spend(spark, tableDir)
      .as[(String, Long)].collect().toMap == Map("A" -> 3L, "B" -> 2L))
  }

  test("post-commit replay with free slots is still a no-op (high-water, not count arithmetic)") {
    val tableDir = Files.createTempDirectory("sqs_hw_state").toString
    val outDir = Files.createTempDirectory("sqs_hw_out").toString
    def apply(rows: Seq[(Long, String, String)], runId: String,
        id: Long): Unit =
      SourceQuotaStore.applyBatch(rows.toDF("doc_id", "text", "source"),
        "doc_id", "text", "source", cap = 10, tableDir, outDir,
        runId = runId, batchId = id, nBucketsIfNew = 4)

    // A spends 2 of 10 — plenty of slots left, so count arithmetic
    // alone WOULD re-admit the replay; the (run, batch) mark must not
    apply(Seq(doc(1, "A", 5), doc(2, "A", 9)), "run-1", 0)
    assert(spark.read.parquet(outDir).select("doc_id").as[Long]
      .collect().toSet == Set(1L, 2L))
    apply(Seq(doc(1, "A", 5), doc(2, "A", 9)), "run-1", 0) // replay
    assert(spark.read.parquet(outDir).select("doc_id").as[Long]
      .collect().toSet == Set(1L, 2L), "replay re-emitted despite the mark")
    assert(SourceQuotaStore.spend(spark, tableDir)
      .as[(String, Long)].collect().toMap == Map("A" -> 2L),
      "replay double-counted admissions")

    // a FRESH run's batch 0 must still accumulate (ids restart at 0)
    apply(Seq(doc(3, "A", 7)), "run-2", 0)
    assert(SourceQuotaStore.spend(spark, tableDir)
      .as[(String, Long)].collect().toMap == Map("A" -> 3L))
  }

  test("release gives takedown slots back; untouched sources keep their spend") {
    val tableDir = Files.createTempDirectory("sqs3_state").toString
    val outDir = Files.createTempDirectory("sqs3_out").toString

    runStream(tableDir, outDir, cap = 2, Seq(
      Seq(doc(1, "A", 5), doc(2, "A", 9), doc(3, "A", 12), doc(10, "B", 4))))
    assert(SourceQuotaStore.spend(spark, tableDir)
      .as[(String, Long)].collect().toMap == Map("A" -> 2L, "B" -> 1L))

    // two A-docs taken down → two slots free; floors at zero beyond
    SourceQuotaStore.release(Seq(("A", 2L)).toDF("source", "n"),
      "source", "n", tableDir)
    assert(SourceQuotaStore.spend(spark, tableDir)
      .as[(String, Long)].collect().toMap == Map("A" -> 0L, "B" -> 1L))

    // batch 1 admitted A's best two by quality: docs 3 (12w) and 2 (9w)
    runStream(tableDir, outDir, cap = 2, Seq(Seq(doc(4, "A", 7), doc(5, "A", 3))))
    assert(spark.read.parquet(outDir).select("doc_id").as[Long]
      .collect().toSet == Set(3L, 2L, 10L, 4L, 5L))
    assert(SourceQuotaStore.spend(spark, tableDir)
      .as[(String, Long)].collect().toMap == Map("A" -> 2L, "B" -> 1L))
  }
}
