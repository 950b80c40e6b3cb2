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

  test("forget releases a fingerprint so the content can re-enter; everything else stays") {
    implicit val sqlCtx = spark.sqlContext
    val tableDir = Files.createTempDirectory("ddf_state").toString
    val outDir = Files.createTempDirectory("ddf_out").toString

    def runStream(rows: Seq[(Long, String)]): Unit = {
      val ckpt = Files.createTempDirectory("ddf_ckpt").toString
      val input = MemoryStream[(Long, String)]
      val q = DedupStore.maintain(input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", tableDir, outDir, ckpt, nBuckets = 2)
      input.addData(rows: _*); q.processAllAvailable(); q.stop()
    }

    runStream(Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")))
    assert(DedupStore.fingerprints(spark, tableDir).count() == 3)

    // forget "alpha": its re-submission passes; "beta" stays blocked
    DedupStore.forget(Seq("alpha").toDF("text"), "text", tableDir)
    assert(DedupStore.fingerprints(spark, tableDir).count() == 2)
    runStream(Seq((4L, "alpha"), (5L, "beta")))
    assert(spark.read.parquet(outDir).select("doc_id").as[Long]
      .collect().toSet == Set(1L, 2L, 3L, 4L))

    // forgetting EVERYTHING empties buckets out of the manifest (the
    // 2-bucket table guarantees at least one bucket fully empties)
    DedupStore.forget(Seq("alpha", "beta", "gamma").toDF("text"), "text",
      tableDir)
    assert(DedupStore.fingerprints(spark, tableDir).count() == 0)
    runStream(Seq((6L, "beta"), (7L, "gamma")))
    assert(spark.read.parquet(outDir).select("doc_id").as[Long]
      .collect().toSet == Set(1L, 2L, 3L, 4L, 6L, 7L))
    // an unknown text is a no-op, not an error
    DedupStore.forget(Seq("never seen").toDF("text"), "text", tableDir)
  }
}
