package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Curation
import graft.streaming.SampleStore

/** Streaming stratified sampling: bottom-k by salted hash is closed
  * under merge, so the maintained sample must equal the batch
  * stratifiedSample on the UNION corpus exactly — any batch split,
  * any arrival order, replays included.
  */
class SampleStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val N = 4
  private val all = (1L to 30L).map(i => (i, s"s${i % 3}"))

  private def batchSample(rows: Seq[(Long, String)]) =
    Curation.stratifiedSample(rows.toDF("doc_id", "source"),
        "doc_id", "source", N)
      .as[(String, Long, Long)].collect().toSet

  private def served(tableDir: String) =
    SampleStore.sample(spark, tableDir)
      .as[(String, Long, Long)].collect().toSet

  test("any micro-batch split equals the batch sample on the union; replay is a content no-op") {
    val tableDir = Files.createTempDirectory("smp_state").toString
    // uneven, interleaved splits — arrival order must not matter
    val batches = Seq(
      all.filter(_._1 % 5 == 0), all.filter(_._1 % 5 != 0).take(7),
      all.filter(t => t._1 % 5 != 0 && t._1 > 7).drop(0))
    batches.zipWithIndex.foreach { case (b, i) =>
      SampleStore.applyBatch(b.toDF("doc_id", "source"), "doc_id", "source",
        tableDir, batchId = i, n = N, nBucketsIfNew = 4)
    }
    // the splits OVERLAP (id 8 arrives twice) and union to the full
    // corpus — distinct-merge must absorb the overlap
    assert(served(tableDir) == batchSample(all))

    // replayed batch: content no-op
    SampleStore.applyBatch(batches(1).toDF("doc_id", "source"), "doc_id",
      "source", tableDir, batchId = 1, n = N, nBucketsIfNew = 4)
    assert(served(tableDir) == batchSample(all))
  }

  test("streaming maintenance across runs: the sample tracks the union corpus") {
    implicit val sqlCtx = spark.sqlContext
    val tableDir = Files.createTempDirectory("smp_str_state").toString

    def runStream(rows: Seq[Seq[(Long, String)]]): Unit = {
      val ckpt = Files.createTempDirectory("smp_ckpt").toString
      val input = MemoryStream[(Long, String)]
      val q = SampleStore.maintain(input.toDF().toDF("doc_id", "source"),
        "doc_id", "source", tableDir, ckpt, n = N, nBuckets = 4)
      rows.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
    }

    runStream(Seq(all.take(10), all.slice(10, 18)))
    assert(served(tableDir) == batchSample(all.take(18)))
    // fresh query, fresh checkpoint — the store carries over
    runStream(Seq(all.drop(18)))
    assert(served(tableDir) == batchSample(all))
  }

  test("frozen-centroid cluster sample: stream == batch clusterSample on the union") {
    import org.apache.spark.sql.functions.col
    implicit val sqlCtx = spark.sqlContext
    // two separable clusters; enough members that the quota bites
    val vecs = (0L until 12L).map(i =>
      (i, Seq(1f, 0.01f * i), 0)) ++ (12L until 20L).map(i =>
      (i, Seq(0.01f * (i - 12), 1f), 1))
    val corpus = vecs.toDF("vec_id", "embedding", "label")
    val model = graft.ops.Similarity.freezeCentroids(
      corpus, "vec_id", "embedding", "label", iters = 2)

    val batch = graft.ops.Similarity.clusterSample(
        corpus, "vec_id", "embedding", "label", iters = 2, n = 3)
      .select(col("cl").cast("long"), col("vec_id"), col("rank"))
      .as[(Long, Long, Long)].collect().toSet

    val tableDir = Files.createTempDirectory("clsmp_state").toString
    val ckpt = Files.createTempDirectory("clsmp_ckpt").toString
    val input = MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.Pipeline.clusterSampleMaintain(
      input.toDF().toDF("vec_id", "embedding"), "embedding", model,
      "vec_id", tableDir, ckpt, n = 3, nBuckets = 4)
    // interleaved arrival across the two clusters, in two batches
    val rows = vecs.map(v => (v._1, v._2))
    input.addData(rows.filter(_._1 % 2 == 0): _*); q.processAllAvailable()
    input.addData(rows.filter(_._1 % 2 == 1): _*); q.processAllAvailable()
    q.stop()

    val streamed = SampleStore.sample(spark, tableDir)
      .select(col("source").cast("long"), col("doc_id"), col("rank"))
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("reopening a store under a different rank salt fails loudly") {
    val tableDir = Files.createTempDirectory("smp_salt_state").toString
    SampleStore.applyBatch(all.take(5).toDF("doc_id", "source"), "doc_id",
      "source", tableDir, batchId = 0, n = N, nBucketsIfNew = 4)
    // mixed-salt bottom-k state is meaningless — must refuse, not merge
    val e = intercept[IllegalArgumentException] {
      SampleStore.applyBatch(all.drop(5).toDF("doc_id", "source"), "doc_id",
        "source", tableDir, batchId = 1, n = N, nBucketsIfNew = 4,
        salt = "clsample_")
    }
    assert(e.getMessage.contains("salt"))
    // the original salt keeps working
    SampleStore.applyBatch(all.drop(5).toDF("doc_id", "source"), "doc_id",
      "source", tableDir, batchId = 1, n = N, nBucketsIfNew = 4)
    assert(served(tableDir) == batchSample(all))
  }

  test("forget retracts a sampled id; later ranks close up; no resurrection") {
    val tableDir = Files.createTempDirectory("smp_fg_state").toString
    SampleStore.applyBatch(all.toDF("doc_id", "source"), "doc_id", "source",
      tableDir, batchId = 0, n = N, nBucketsIfNew = 4)
    val before = served(tableDir)
    val (srcF, idF, rankF) = before.find(_._3 == 2L).get

    SampleStore.forget(Seq(idF).toDF("doc_id"), "doc_id", tableDir)
    val want = before.collect {
      case (s, d, r) if d != idF =>
        (s, d, if (s == srcF && r > rankF) r - 1 else r)
    }
    assert(served(tableDir) == want)
    // the evicted 5th candidate is NOT resurrected: srcF now holds n-1
    assert(served(tableDir).count(_._1 == srcF) == N - 1)
  }
}
