package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._
import graft.streaming.TextIndexStream

/** Streaming maintenance of the persisted text index: micro-batched
  * ingest/takedown (+ at-least-once replays) serve the EXACT ranking
  * a one-shot batch build over the same corpus produces — the
  * additive-stats law under the streaming delivery contract.
  */
class TextIndexStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = cdc.Io.table(spark, sf, "documents")

  private def searchOf(name: String) =
    TextIndex.search(spark, name, k = 10)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq

  private def inPlan(corpus: org.apache.spark.sql.DataFrame) =
    Retrieval.bm25TopK(corpus, "doc_id", "text", k = 10)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("micro-batched ingest + a replay serve the one-shot build's ranking") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("tidxs_app").toString
    val rows = docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val (seed, rest) = rows.splitAt(rows.length / 4)
    TextIndex.build(spark, seed.toDF("doc_id", "text"), "doc_id",
      "text", "tidxs_app", nBuckets = 4, baseDir = Some(dir))

    val ckpt = Files.createTempDirectory("tidxs_app_ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = TextIndexStream.maintain(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      "tidxs_app", ckpt)
    val (b1, b2) = rest.splitAt(rest.length / 2)
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    input.addData(b1.take(20): _*); q.processAllAvailable() // replay
    q.stop()

    val got = searchOf("tidxs_app")
    assert(got.nonEmpty && got == inPlan(docs))
  }

  test("micro-batched takedown + a replay serve the survivor build's ranking") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("tidxs_del").toString
    TextIndex.build(spark, docs, "doc_id", "text", "tidxs_del",
      nBuckets = 4, baseDir = Some(dir))
    val delRows = docs.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").cast("long")).as[Long].collect().sorted.toSeq

    val ckpt = Files.createTempDirectory("tidxs_del_ckpt").toString
    val input = MemoryStream[Long]
    val q = TextIndexStream.retract(input.toDF().toDF("doc_id"),
      "doc_id", "tidxs_del", ckpt)
    val (b1, b2) = delRows.splitAt(delRows.length / 2)
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    input.addData(b2.take(10): _*); q.processAllAvailable() // replay
    q.stop()

    val got = searchOf("tidxs_del")
    assert(got.nonEmpty &&
      got == inPlan(docs.filter(col("doc_id") % 3 =!= 0)))
  }

  test("streaming maintenance of a POSITIONAL index: phrase serving equals the one-shot build (ingest + takedown + replays)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("tidxs_pos").toString
    val rows = docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val (seed, rest) = rows.splitAt(rows.length / 2)
    TextIndex.build(spark, seed.toDF("doc_id", "text"), "doc_id",
      "text", "tidxs_pos", nBuckets = 4, baseDir = Some(dir),
      positions = true)

    val ckpt = Files.createTempDirectory("tidxs_pos_ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = TextIndexStream.maintain(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      "tidxs_pos", ckpt)
    input.addData(rest: _*); q.processAllAvailable()
    input.addData(rest.take(15): _*); q.processAllAvailable() // replay
    q.stop()

    val ckptD = Files.createTempDirectory("tidxs_posd_ckpt").toString
    val delRows = rows.map(_._1).filter(_ % 3 == 0)
    val inputD = MemoryStream[Long]
    val qd = TextIndexStream.retract(inputD.toDF().toDF("doc_id"),
      "doc_id", "tidxs_pos", ckptD)
    inputD.addData(delRows: _*); qd.processAllAvailable()
    inputD.addData(delRows.take(10): _*); qd.processAllAvailable()
    qd.stop()

    val survivors = docs.filter(col("doc_id") % 3 =!= 0)
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Long)].collect()
        .sortBy(r => (r._1, r._2)).toSeq
    assert(sorted(TextIndex.searchPhrase(spark, "tidxs_pos", k = 10)) ==
      sorted(Retrieval.phraseTopK(survivors, "doc_id", "text", k = 10)))
    assert(sorted(TextIndex.searchNear(spark, "tidxs_pos", k = 10)) ==
      sorted(Retrieval.nearTopK(survivors, "doc_id", "text", k = 10)))
    assert(searchOf("tidxs_pos") == inPlan(survivors))
  }

  test("a replacement stream with a FRESH checkpoint is not deduped against the retired stream's epochs (review r14)") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("tidxs_ns").toString
    val rows = docs.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    val (seed, rest) = rows.splitAt(rows.length / 2)
    val (b1, b2) = rest.splitAt(rest.length / 2)
    TextIndex.build(spark, seed.toDF("doc_id", "text"), "doc_id",
      "text", "tidxs_ns", nBuckets = 4, baseDir = Some(dir))
    // stream A ingests b1 as ITS epoch 0+, then retires
    val ckA = Files.createTempDirectory("tidxs_ns_ckA").toString
    val inA = MemoryStream[(Long, String)]
    val qA = TextIndexStream.maintain(inA.toDF().toDF("doc_id", "text"),
      "doc_id", "text", "tidxs_ns", ckA)
    inA.addData(b1: _*); qA.processAllAvailable(); qA.stop()
    // replacement stream B (new checkpoint): its epoch numbering
    // restarts at 0 — bare-epoch markers would silently skip b2
    val ckB = Files.createTempDirectory("tidxs_ns_ckB").toString
    val inB = MemoryStream[(Long, String)]
    val qB = TextIndexStream.maintain(inB.toDF().toDF("doc_id", "text"),
      "doc_id", "text", "tidxs_ns", ckB)
    inB.addData(b2: _*); qB.processAllAvailable(); qB.stop()
    assert(searchOf("tidxs_ns") == inPlan(docs))
  }
}
