package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup
import graft.streaming.ChunkDupStore

/** Cross-horizon shift-robust dedup: a re-crawl with an inserted
  * preamble is dropped across micro-batches and across separate
  * streaming runs, because its content-defined chunks re-synchronize
  * with the stored original's. One batch from empty state must equal
  * the batch chunkDupGate exactly (first-wins is order-free).
  */
class ChunkDupStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 3
  private val Div = 4L
  private val MinDup = 2
  private val Thresh = 500000L // drop at >= 50% duplicated tokens

  private val base = (1 to 60).map(i => s"tok${i * 13 % 101}n$i").mkString(" ")
  private val shifted = "freshly inserted preamble words here " + base
  private val fresh = (1 to 50).map(i => s"other${i * 7 % 89}x$i").mkString(" ")

  private def gateBatch(rows: Seq[(Long, String)], tableDir: String,
      outDir: String, batchId: Long): Unit =
    ChunkDupStore.applyBatch(rows.toDF("doc_id", "text"), "doc_id", "text",
      tableDir, outDir, batchId, K, Div, MinDup, Thresh, nBucketsIfNew = 4)

  test("one batch from empty state == the batch chunkDupGate") {
    val tableDir = Files.createTempDirectory("cds_eq_state").toString
    val outDir = Files.createTempDirectory("cds_eq_out").toString
    val rows = Seq((10L, base), (11L, shifted), (12L, fresh))

    gateBatch(rows, tableDir, outDir, batchId = 0)
    val got = spark.read.parquet(outDir)
      .select("doc_id", "total_tokens", "dup_tokens", "dup_frac_micros")
      .as[(Long, Long, Long, Long)].collect().toSet

    val want = Dedup.chunkDupGate(rows.toDF("doc_id", "text"),
        "doc_id", "text", K, Div, MinDup, Thresh)
      .filter($"kept" === 1)
      .select("doc_id", "total_tokens", "dup_tokens", "dup_frac_micros")
      .as[(Long, Long, Long, Long)].collect().toSet

    assert(got == want)
    // the shifted re-crawl was actually gated out (not a vacuous run)
    assert(got.map(_._1) == Set(10L, 12L))
  }

  test("shifted copies drop across batches and across runs; store == emitted signal chunks") {
    implicit val sqlCtx = spark.sqlContext
    val tableDir = Files.createTempDirectory("cds_state").toString
    val outDir = Files.createTempDirectory("cds_out").toString

    def runStream(rows: Seq[Seq[(Long, String)]]): Unit = {
      val ckpt = Files.createTempDirectory("cds_ckpt").toString
      val input = MemoryStream[(Long, String)]
      val q = ChunkDupStore.maintain(input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", tableDir, outDir, ckpt,
        K, Div, MinDup, Thresh, nBuckets = 4)
      rows.foreach { batch => input.addData(batch: _*); q.processAllAvailable() }
      q.stop()
    }

    // run 1: base admitted; NEXT batch's shifted copy caught by the
    // store (cross-batch memory), unrelated doc admitted
    runStream(Seq(
      Seq((1L, base)),
      Seq((2L, shifted), (3L, fresh))))
    val after1 = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(after1 == Set(1L, 3L))

    // run 2: FRESH query, FRESH checkpoint — the store still
    // remembers (cross-horizon), a differently-shifted copy drops
    runStream(Seq(Seq(
      (4L, "another totally different lead in . " + base), (5L, "tiny doc"))))
    val after2 = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(after2 == Set(1L, 3L, 5L))

    // invariant: the store is exactly the distinct >= MinDup chunk
    // fingerprints of the EMITTED docs
    val emitted = Seq((1L, base), (3L, fresh), (5L, "tiny doc"))
    val want = Dedup.contentChunks(emitted.toDF("doc_id", "text"),
        "doc_id", "text", K, Div)
      .filter($"chunk_tokens" >= MinDup)
      .select("fp").as[Long].collect().toSet
    val got = ChunkDupStore.fingerprints(spark, tableDir)
      .as[Long].collect().toSet
    assert(got == want)
  }

  test("post-commit replay: state byte-identical, fully-seen docs gate out") {
    val tableDir = Files.createTempDirectory("cds_rp_state").toString
    val outDir = Files.createTempDirectory("cds_rp_out").toString
    val rows = Seq((1L, base), (2L, fresh))

    gateBatch(rows, tableDir, outDir, batchId = 0)
    val fpsBefore = ChunkDupStore.fingerprints(spark, tableDir)
      .as[Long].collect().sorted.toSeq
    val emittedBefore = spark.read.parquet(outDir).count()
    assert(emittedBefore == 2)

    // replay the SAME batch after its commit: both docs now read as
    // fully seen (their own fingerprints) → gated out, store unchanged
    gateBatch(rows, tableDir, outDir, batchId = 0)
    val fpsAfter = ChunkDupStore.fingerprints(spark, tableDir)
      .as[Long].collect().sorted.toSeq
    assert(fpsAfter == fpsBefore)
    assert(spark.read.parquet(outDir).count() == emittedBefore)
  }

  test("forget releases a doc's chunks so its content can re-enter") {
    val tableDir = Files.createTempDirectory("cds_fg_state").toString
    val outDir = Files.createTempDirectory("cds_fg_out").toString

    gateBatch(Seq((1L, base), (2L, fresh)), tableDir, outDir, batchId = 0)
    ChunkDupStore.forget(Seq(base).toDF("text"), "text", tableDir,
      K, Div, MinDup)

    // base's content re-enters (even shifted); fresh is still fenced
    gateBatch(Seq((7L, shifted), (8L, "lead in . " + fresh)),
      tableDir, outDir, batchId = 1)
    val docs = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(docs == Set(1L, 2L, 7L))
  }
}
