package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DedupStore

/** Persistent cross-horizon dedup: duplicates are dropped across
  * micro-batches AND across separate streaming runs (fresh query,
  * fresh checkpoint) — the property the watermark-bounded operator
  * cannot provide. State lives in the StateTable bucketed layout.
  */
class DedupStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("first occurrence wins within a batch, across batches, and across runs") {
    implicit val sqlCtx = spark.sqlContext
    val tableDir = Files.createTempDirectory("dds_state").toString
    val outDir = Files.createTempDirectory("dds_out").toString

    def runStream(rows: Seq[Seq[(Long, String)]]): Unit = {
      val ckpt = Files.createTempDirectory("dds_ckpt").toString
      val input = MemoryStream[(Long, String)]
      val q = DedupStore.maintain(input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", tableDir, outDir, ckpt, nBuckets = 4)
      rows.foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
      }
      q.stop()
    }

    // run 1: in-batch dup (1, 2 share text modulo whitespace), then a
    // cross-batch dup (4)
    runStream(Seq(
      Seq((1L, "alpha beta gamma"), (2L, "alpha  beta gamma"), (3L, "delta")),
      Seq((4L, "alpha beta gamma"), (5L, "epsilon"))))
    val afterRun1 = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(afterRun1 == Set(1L, 3L, 5L))

    // run 2: a FRESH query with a FRESH checkpoint — the store still
    // remembers run 1's fingerprints (this is the cross-horizon point)
    runStream(Seq(Seq((6L, "delta"), (7L, "zeta"))))
    val afterRun2 = spark.read.parquet(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(afterRun2 == Set(1L, 3L, 5L, 7L))

    assert(DedupStore.fingerprints(spark, tableDir).distinct().count() == 4)

    // survivors keep their payload columns (fp/bucket are internal)
    assert(spark.read.parquet(outDir).columns.sorted.toSeq
      == Seq("doc_id", "text"))

    // the store is a plain StateTable layout: generic compaction
    // applies, and the store still dedups afterwards
    graft.streaming.StateTable.compact(spark, tableDir)
    assert(DedupStore.fingerprints(spark, tableDir).distinct().count() == 4)
    runStream(Seq(Seq((8L, "zeta"), (9L, "eta"))))
    assert(spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
      == Set(1L, 3L, 5L, 7L, 9L))
  }
}
