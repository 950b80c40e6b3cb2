package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._
import graft.streaming.{GraphStream, IndexStream, TextIndexStream, TrilogyStream}

/** X160 — the one-stream trilogy composite: a single decoded change
  * stream maintains the text index, the ANN index AND the kNN graph
  * in ONE foreachBatch (one decode, one LWW collapse, three upserts).
  * Verified against the REAL DSv2 graft-changelog source (snapshotless
  * live segments), with the three INDIVIDUAL feeds driven by the same
  * log as the equality twins: composing the feeds must change nothing
  * but the number of source reads.
  */
class TrilogyStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def embs = cdc.Io.table(spark, sf, "embeddings")

  test("one DSv2 change stream maintains all three artifacts == the three individual feeds on twins (r16 verdict #6)") {
    // base corpus: even ids with a deterministic text per id
    val even = embs.filter(col("vec_id") % 2 === 0)
      .withColumn("text", concat(lit("doc "), col("vec_id"),
        lit(" hash join scan term "), pmod(col("vec_id"), lit(7L))))
      .withColumn("seed", pmod(col("vec_id"), lit(64L)))
    val dirT = Files.createTempDirectory("tri_t").toString
    val dirT2 = Files.createTempDirectory("tri_t2").toString
    val dirG = Files.createTempDirectory("tri_g").toString
    val dirG2 = Files.createTempDirectory("tri_g2").toString
    val dirI = Files.createTempDirectory("tri_i").toString
    val dirI2 = Files.createTempDirectory("tri_i2").toString
    for ((n, d) <- Seq("tri_tidx" -> dirT, "solo_tidx" -> dirT2))
      TextIndex.build(spark, even, "vec_id", "text", n, nBuckets = 4,
        baseDir = Some(d))
    for ((n, d) <- Seq("tri_idx" -> dirI, "solo_idx" -> dirI2))
      Index.build(spark, even, "vec_id", "embedding", "label", n,
        itersIvf = 2, massign = 2, m = 16, ksub = 32, itersPq = 1,
        nBuckets = 4, baseDir = Some(d))
    for ((n, d) <- Seq("tri_g" -> dirG, "solo_g" -> dirG2))
      GraphStore.build(spark, even, "vec_id", "embedding", "seed", n,
        k = 4, iters = 1, massign = 2, nBuckets = 4, baseDir = Some(d))

    // one change log: two live segments — re-embed+retitle key 0
    // (donor 1) with an intra-batch conflict, insert key 7 (donor 8),
    // tombstone key 6; then re-edit key 0 again (donor 3)
    val vecOf = embs.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    def row(id: Long, text: String, vec: Seq[Double]) =
      s"""{"id":"$id","text":"$text","vec":"${vec.mkString("[", ",", "]")}"}"""
    def line(op: String, before: String, after: String, ts: Long) =
      s"""{"op":"$op","db":"d","table":"docs","before":$before,"after":$after,"ts":$ts,"pkey":"id"}"""
    val logDir = Files.createTempDirectory("tri_log").toString
    Files.write(java.nio.file.Paths.get(logDir, "log.000001.jsonl"),
      Seq(
        line("Update", "null",
          row(0L, "stale title zero", vecOf(5L)), 100L),
        line("Update", "null",
          row(0L, "fresh title zero hash", vecOf(1L)), 101L),
        line("Insert", "null",
          row(7L, "brand new seven join", vecOf(8L)), 102L),
        line("Delete", row(6L, "", Nil), "null", 103L))
        .mkString("\n").getBytes)
    Files.write(java.nio.file.Paths.get(logDir, "log.000002.jsonl"),
      Seq(line("Update", "null",
        row(0L, "final title zero scan", vecOf(3L)),
        200L)).mkString("\n").getBytes)

    def decoded() = {
      val changes = spark.readStream.format("graft-changelog")
        .option("path", logDir).load()
      changes.select(
        coalesce(get_json_object(col("after"), "$.id"),
          get_json_object(col("before"), "$.id")).cast("long").as("key"),
        col("op"),
        coalesce(get_json_object(col("after"), "$.text"), lit(""))
          .as("text"),
        from_json(coalesce(get_json_object(col("after"), "$.vec"),
          lit("[]")), ArrayType(DoubleType)).as("vec"),
        pmod(coalesce(get_json_object(col("after"), "$.id"),
          get_json_object(col("before"), "$.id")).cast("long"),
          lit(64L)).as("seed"),
        unix_timestamp(col("ts")).as("ts_sec"), col("seq"))
    }
    def ck() = Files.createTempDirectory("tri_ck").toString

    // the composed feed: ONE stream, ONE foreachBatch, three upserts
    val qTri = TrilogyStream.applyChanges(decoded(), "key", "op",
      "text", "vec", "seed", "tri_tidx", "tri_idx", "tri_g", ck())
    qTri.processAllAvailable(); qTri.stop()
    // the three individual feeds on the twin artifacts, same log
    val qT = TextIndexStream.applyChanges(decoded(), "key", "op",
      "text", "solo_tidx", ck())
    qT.processAllAvailable(); qT.stop()
    val qI = IndexStream.applyChanges(decoded(), "key", "op", "vec",
      "solo_idx", ck())
    qI.processAllAvailable(); qI.stop()
    val qG = GraphStream.applyChanges(decoded(), "key", "op", "vec",
      "seed", "solo_g", ck())
    qG.processAllAvailable(); qG.stop()

    // serve surfaces bit-identical, composed vs individual
    def textOf(n: String) = TextIndex.search(spark, n, k = 10)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(textOf("tri_tidx").nonEmpty &&
      textOf("tri_tidx") == textOf("solo_tidx"))
    def annOf(n: String) = {
      val corpus = even.select(col("vec_id").cast("long").as("id"),
          col("embedding").cast("array<double>").as("vec"))
        .filter(!col("id").isin(0L, 6L))
        .unionByName(Seq((0L, vecOf(3L)), (7L, vecOf(8L)))
          .toDF("id", "vec"))
      Index.search(spark, n, corpus, "id", "vec", col("id") < 8,
        k = 4, nprobe = 2, rerank = 16)
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    }
    assert(annOf("tri_idx").nonEmpty && annOf("tri_idx") == annOf("solo_idx"))
    def edgesOf(n: String) = GraphStore.edges(spark, n)
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(edgesOf("tri_g").nonEmpty && edgesOf("tri_g") == edgesOf("solo_g"))
    // the merged state is LWW-correct: key 0 carries its LAST edit,
    // 6 is gone, 7 is present — pinned on the graph surface
    val es = edgesOf("tri_g")
    assert(es.forall { case (s_, _, n, _) => s_ != 6L && n != 6L })
    assert(es.exists(_._1 == 7L) && es.exists(_._1 == 0L))
    val texts = textOf("tri_tidx")
    assert(texts == textOf("solo_tidx"))
  }
}
