package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TokenQuotaStore

/** Token-budget admission: spend the X107 plan over a stream.
  * Admission is a quality-rank prefix per (source, batch); budgets
  * are remembered across batches and runs; post-commit replay admits
  * nothing; release re-opens tokens.
  */
class TokenQuotaStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // same word shape everywhere -> equal quality for equal-length
  // docs, so within-source order among them is by id
  private def doc(n: Int, tag: String) =
    (1 to n).map(i => s"$tag${i % 10}abc").mkString(" ")

  private val plan = Seq(("A", 12L), ("B", 4L)).toDF("source", "alloc_tokens")

  private def apply(rows: Seq[(Long, String, String)], tableDir: String,
      outDir: String, id: Long, runId: String = "run-1"): Unit =
    TokenQuotaStore.applyBatch(rows.toDF("doc_id", "text", "source"),
      "doc_id", "text", "source", plan, tableDir, outDir,
      runId = runId, batchId = id, nBucketsIfNew = 4)

  private def admitted(outDir: String) =
    spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet

  private def spend(tableDir: String) =
    TokenQuotaStore.spend(spark, tableDir)
      .as[(String, Long)].collect().toSet

  test("prefix admission per source; budgets persist; post-commit replay admits nothing") {
    val tableDir = Files.createTempDirectory("tq_state").toString
    val outDir = Files.createTempDirectory("tq_out").toString

    // A (12 tokens): three equal 5-token docs -> ids 1, 2 fit
    // (cum 5, 10), 3 overflows (15). B (4): a 5-token doc never
    // fits. C: not in the plan -> no budget at all.
    apply(Seq(
      (1L, doc(5, "a"), "A"), (2L, doc(5, "b"), "A"), (3L, doc(5, "c"), "A"),
      (4L, doc(5, "d"), "B"), (9L, doc(2, "z"), "C")),
      tableDir, outDir, 0)
    assert(admitted(outDir) == Set(1L, 2L))
    assert(spend(tableDir) == Set(("A", 10L)))

    // B's budget takes a 3-token doc; A bounces another 5-token doc
    apply(Seq((5L, doc(3, "e"), "B"), (6L, doc(5, "f"), "A")),
      tableDir, outDir, 1)
    assert(admitted(outDir) == Set(1L, 2L, 5L))
    assert(spend(tableDir) == Set(("A", 10L), ("B", 3L)))

    // a 2-token doc lands A exactly on its 12-token budget
    apply(Seq((7L, doc(2, "g"), "A")), tableDir, outDir, 2)
    assert(admitted(outDir) == Set(1L, 2L, 5L, 7L))
    assert(spend(tableDir) == Set(("A", 12L), ("B", 3L)))

    // post-commit replay: counters reject everything, state unchanged
    apply(Seq((7L, doc(2, "g"), "A")), tableDir, outDir, 2)
    assert(admitted(outDir) == Set(1L, 2L, 5L, 7L))
    assert(spend(tableDir) == Set(("A", 12L), ("B", 3L)))
  }

  test("post-commit replay with remaining slack is still a no-op (high-water, not budget arithmetic)") {
    val tableDir = Files.createTempDirectory("tq_hw_state").toString
    val outDir = Files.createTempDirectory("tq_hw_out").toString

    // A spends 2 of 12 — plenty of slack left, so budget arithmetic
    // alone WOULD re-admit the replay; the (run, batch) mark must not
    apply(Seq((1L, doc(2, "a"), "A")), tableDir, outDir, 0)
    assert(admitted(outDir) == Set(1L))
    assert(spend(tableDir) == Set(("A", 2L)))

    apply(Seq((1L, doc(2, "a"), "A")), tableDir, outDir, 0)
    assert(admitted(outDir) == Set(1L),
      "replayed batch re-emitted despite the high-water mark")
    assert(spend(tableDir) == Set(("A", 2L)), "replay double-spent tokens")

    // a FRESH run's batch 0 against the same source must accumulate
    // (batch ids restart at 0 across runs — the mark is run-scoped)
    apply(Seq((2L, doc(3, "b"), "A")), tableDir, outDir, 0, runId = "run-2")
    assert(admitted(outDir) == Set(1L, 2L))
    assert(spend(tableDir) == Set(("A", 5L)))
  }

  test("streaming maintenance across runs; release re-opens tokens") {
    implicit val sqlCtx = spark.sqlContext
    val tableDir = Files.createTempDirectory("tq_str_state").toString
    val outDir = Files.createTempDirectory("tq_str_out").toString

    def runStream(rows: Seq[Seq[(Long, String, String)]]): Unit = {
      val ckpt = Files.createTempDirectory("tq_ckpt").toString
      val input = MemoryStream[(Long, String, String)]
      val q = TokenQuotaStore.maintain(
        input.toDF().toDF("doc_id", "text", "source"),
        "doc_id", "text", "source", plan, tableDir, outDir, ckpt,
        nBuckets = 4)
      rows.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
    }

    runStream(Seq(Seq((1L, doc(5, "a"), "A"), (2L, doc(5, "b"), "A"))))
    // fresh run, fresh checkpoint: the spend carries over (10/12) —
    // another 5-token doc bounces
    runStream(Seq(Seq((3L, doc(5, "c"), "A"))))
    assert(admitted(outDir) == Set(1L, 2L))

    // takedown: doc 1's five tokens release — now a 5-token doc fits
    TokenQuotaStore.release(Seq(("A", 5L)).toDF("source", "toks"),
      "source", "toks", tableDir)
    runStream(Seq(Seq((4L, doc(5, "d"), "A"))))
    assert(admitted(outDir) == Set(1L, 2L, 4L))
  }
}
