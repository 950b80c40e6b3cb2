package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.NearDupStore

/** Persistent near-dup gate: lightly-edited copies drop across
  * batches and across runs on the LSH band-key store; shingle-less
  * docs always pass (no signature, no decision).
  */
class NearDupStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while the rain falls on the quiet field"
  private def edited(word: String) = base.replace("rain", word)
  private val other =
    "completely different content about spark physical plans and shuffle boundaries here"

  test("near-duplicates drop across batches and runs; short docs always pass") {
    implicit val sqlCtx = spark.sqlContext
    val tableDir = Files.createTempDirectory("nds_state").toString
    val outDir = Files.createTempDirectory("nds_out").toString

    def runStream(rows: Seq[Seq[(Long, String)]]): Unit = {
      val ckpt = Files.createTempDirectory("nds_ckpt").toString
      val input = MemoryStream[(Long, String)]
      val q = NearDupStore.maintain(input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", tableDir, outDir, ckpt, nBuckets = 4)
      rows.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
    }

    def out(): Set[Long] = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet

    // in-batch near-dup (2 edits 1), cross-batch near-dup (4 edits 1
    // differently), unrelated passes
    runStream(Seq(
      Seq((1L, base), (2L, edited("snow")), (3L, other)),
      Seq((4L, edited("sun")), (5L, "fresh corpus material covering watermark semantics and state store eviction policies instead"))))
    val r1 = out()
    assert(r1.contains(1L) && r1.contains(3L) && r1.contains(5L)
      && !r1.contains(2L) && !r1.contains(4L))

    // fresh run, fresh checkpoint: the band-key store still remembers
    runStream(Seq(Seq((6L, edited("wind")), (7L, "unrelated brand new words nothing shared with anything previously seen at all"))))
    val r2 = out()
    assert(!r2.contains(6L) && r2.contains(7L))

    // short docs still shingle (WordShingles emits the whole-doc
    // tail), so identical short docs DO dedup
    runStream(Seq(Seq((8L, "tiny doc"), (9L, "tiny doc"))))
    assert(out().contains(8L) && !out().contains(9L))

    // takedown: forget doc 1's text — its claimed band keys release,
    // so a lightly-edited variant that the gate just dropped now
    // passes; the unrelated doc's keys stay claimed
    NearDupStore.forget(Seq(base).toDF("text"), "text", tableDir)
    runStream(Seq(Seq((10L, edited("rain")), (11L, other))))
    val r3 = out()
    assert(r3.contains(10L), "variant of forgotten content still gated")
    assert(!r3.contains(11L), "unrelated doc's keys were lost by forget")
  }
}
