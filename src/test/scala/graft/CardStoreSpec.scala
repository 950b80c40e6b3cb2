package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CardStore

/** Live corpus card: additive per-source stats that stay correct
  * under at-least-once replay. Set-semantics stores get replay-safety
  * for free; counters need the (run, batch) high-water mark — and it
  * must be scoped to the RUN, because a fresh checkpoint restarts
  * batch ids at 0 while legitimately carrying new data.
  */
class CardStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // (text, source): token counts are whitespace-split sizes
  private val b0 = Seq(
    ("one two three", Some("s0")),          // 3 tokens
    ("four five", Some("s0")),              // 2
    ("alpha beta gamma delta", Some("s1"))) // 4
  private val b1 = Seq(
    ("x", Some("s1")),                      // 1
    ("p q r s t u", Some("s2")),            // 6
    ("stray", None))                        // null source -> '<null>'

  private def apply(rows: Seq[(String, Option[String])], dir: String,
      run: String, id: Long): Unit =
    CardStore.applyBatch(rows.toDF("text", "source"), "text", "source",
      dir, runId = run, batchId = id, nBucketsIfNew = 4)

  private def cardOf(tableDir: String) =
    CardStore.card(spark, tableDir)
      .as[(String, Long, Long, Long, Long)].collect().toSet

  // last element = n_distinct_tokens: the HLL estimate is EXACT at
  // these cardinalities (the sketch is still in its exact coupon
  // mode), so the spec can pin precise values
  private val want01 = Set(
    ("s0", 2L, 5L, 3L, 5L),
    ("s1", 2L, 5L, 4L, 5L),
    ("s2", 1L, 6L, 6L, 6L),
    ("<null>", 1L, 1L, 1L, 1L))

  test("split batches merge to the one-shot totals (sum/sum/max)") {
    val dir = Files.createTempDirectory("cs_state").toString
    apply(b0, dir, "runA", 0)
    apply(b1, dir, "runA", 1)
    assert(cardOf(dir) == want01)
  }

  test("same-run replayed and stale batches are content no-ops; a new run accumulates from id 0") {
    val dir = Files.createTempDirectory("cs_rp_state").toString
    apply(b0, dir, "runA", 0)
    apply(b1, dir, "runA", 1)
    // crash-replay of the last committed batch (same run, same id) —
    // without the mark this would double-add s1/s2/<null>
    apply(b1, dir, "runA", 1)
    assert(cardOf(dir) == want01)
    // a stale same-run re-delivery (id below the mark) is ignored too
    apply(b0, dir, "runA", 0)
    assert(cardOf(dir) == want01)
    // a FRESH run restarts ids at 0 but carries NEW data — the
    // run-scoped mark must let it through (a bare batch high-water
    // would silently drop this batch for the already-seen source s0)
    apply(Seq(("six seven", Some("s0"))), dir, "runB", 0)
    assert(cardOf(dir) ==
      (want01 - (("s0", 2L, 5L, 3L, 5L)) + (("s0", 3L, 7L, 3L, 7L))))
  }

  test("crash-restart from the same checkpoint resumes the run id, so its replays are no-ops") {
    val dir = Files.createTempDirectory("cs_cr_state").toString
    val ckpt = Files.createTempDirectory("cs_cr_ckpt").toString
    // what maintain() derives on first start
    val r1 = graft.streaming.RunMark.forCheckpoint(ckpt)
    apply(b0, dir, r1, 0)
    val want = Set(("s0", 2L, 5L, 3L, 5L), ("s1", 1L, 4L, 4L, 4L))
    assert(cardOf(dir) == want)
    // driver crashes post-commit; the restarted maintain() re-derives
    // the run id from the SAME checkpoint — a fresh UUID here is
    // exactly the bug that would double-add the replayed batch
    val r2 = graft.streaming.RunMark.forCheckpoint(ckpt)
    assert(r2 == r1, "run id must be stable across restarts of one checkpoint")
    apply(b0, dir, r2, 0) // Structured Streaming replays batch 0
    assert(cardOf(dir) == want)
  }

  test("pre-sketch state upgrades in place: old buckets read, distincts resume") {
    val dir = Files.createTempDirectory("cs_up_state").toString
    apply(b0, dir, "runA", 0)
    // simulate a pre-X115 table: rewrite every committed bucket
    // version without the tok_hll column (same manifest, same paths)
    def stripColumn(root: java.io.File): Unit =
      for (bdir <- root.listFiles if bdir.getName.startsWith("b");
           vdir <- bdir.listFiles if vdir.isDirectory) {
        val tmp = Files.createTempDirectory("cs_up_tmp").toFile
        spark.read.parquet(vdir.toString).drop("tok_hll")
          .write.mode("overwrite").parquet(tmp.toString)
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
        }
        rm(vdir)
        Files.move(tmp.toPath, vdir.toPath)
      }
    stripColumn(new java.io.File(dir))
    // the old table still SERVES (distincts 0 = unknown) ...
    assert(cardOf(dir) ==
      Set(("s0", 2L, 5L, 3L, 0L), ("s1", 1L, 4L, 4L, 0L)))
    // ... and still MERGES: the first post-upgrade delta re-seeds the
    // sketch for the sources it touches; untouched sources stay 0
    apply(b1, dir, "runA", 1)
    assert(cardOf(dir) == Set(
      ("s0", 2L, 5L, 3L, 0L),
      ("s1", 2L, 5L, 4L, 1L), // distincts resume from b1's {x} only
      ("s2", 1L, 6L, 6L, 6L),
      ("<null>", 1L, 1L, 1L, 1L)))
  }

  test("MIXED pre/post-upgrade buckets: new-bucket sketches survive the read") {
    // the single-schema-donor hazard: reading old (no tok_hll) and
    // new buckets together must not drop the new buckets' sketches
    val dir = Files.createTempDirectory("cs_mix_state").toString
    apply(b0, dir, "runA", 0) // buckets now have tok_hll
    // strip the column from ONLY the buckets s1 does NOT hash into,
    // by rewriting every bucket EXCEPT s1's
    val s1Bucket = {
      import org.apache.spark.sql.functions.{hash, pmod, lit}
      Seq("s1").toDF("source")
        .select(pmod(hash($"source"), lit(4)).cast("int")).as[Int].head()
    }
    for (bdir <- new java.io.File(dir).listFiles
           if bdir.getName.startsWith("b") &&
             bdir.getName != s"b$s1Bucket";
         vdir <- bdir.listFiles if vdir.isDirectory) {
      val tmp = Files.createTempDirectory("cs_mix_tmp").toFile
      spark.read.parquet(vdir.toString).drop("tok_hll")
        .write.mode("overwrite").parquet(tmp.toString)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
      }
      rm(vdir)
      Files.move(tmp.toPath, vdir.toPath)
    }
    // a batch touching BOTH an old-schema bucket (s0/<null>/s2 side)
    // and s1's new-schema bucket: s1's stored sketch must survive
    apply(b1, dir, "runA", 1)
    val got = cardOf(dir)
    assert(got.contains(("s1", 2L, 5L, 4L, 5L)),
      s"s1's pre-existing sketch was dropped by the mixed read: $got")
  }

  test("streaming maintenance; a second run keeps accumulating") {
    implicit val sqlCtx = spark.sqlContext
    val tableDir = Files.createTempDirectory("cs_str_state").toString

    def runStream(rows: Seq[Seq[(String, Option[String])]]): Unit = {
      val ckpt = Files.createTempDirectory("cs_ckpt").toString
      val input = MemoryStream[(String, Option[String])]
      val q = CardStore.maintain(input.toDF().toDF("text", "source"),
        "text", "source", tableDir, ckpt, nBuckets = 4)
      rows.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      q.stop()
    }

    runStream(Seq(b0, b1))
    assert(cardOf(tableDir) == want01)
    // second run, fresh checkpoint, batch ids restart at 0: the card
    // keeps accumulating (both for a seen source and a new one)
    runStream(Seq(Seq(
      ("brand new words here", Some("s9")), ("tail doc", Some("s2")))))
    assert(cardOf(tableDir) ==
      (want01 - (("s2", 1L, 6L, 6L, 6L)))
        + (("s2", 2L, 8L, 6L, 8L)) + (("s9", 1L, 4L, 4L, 4L)))
  }
}
