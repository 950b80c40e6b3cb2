package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sessions
import graft.streaming.SessionMerge

/** The streaming two-phase sessionization twin (SURVEY §2.9 X33's
  * streaming analogue): phase-1 bucket-local sessions under a
  * watermark, append-only session store, stitch-on-read — proven equal
  * to the batch twin ops.Sessions.twoPhase on the same events.
  */
class SessionMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val GapUs = 1800L * 1000000    // 30 min
  private val BucketUs = 7200L * 1000000 // 2 h
  private val Base = 1767225600L         // 2026-01-01 00:00:00 UTC, seconds

  private def ts(offSec: Long): Timestamp =
    new Timestamp((Base + offSec) * 1000L)

  test("streaming two-phase sessions equal the batch twin (straddling buckets, out-of-order batches)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = Files.createTempDirectory("graft_sess").toString
    val input = MemoryStream[(Timestamp, String, String)]
    val q = SessionMerge.run(input.toDF().toDF("ts", "db", "table"),
      watermark = "10 minutes", GapUs, BucketUs,
      sessDir = s"$root/sessions", checkpointDir = s"$root/ckpt")

    // (db1, t1): one session split inside bucket 0 (gap 6800s >= 30m),
    // then a session STRADDLING buckets 0/1 (7000 -> 7300, gap 300s),
    // then a fresh one at 20000 (bucket 2).
    // (db1, t2): 50 alone; 7100 -> 7250 straddles buckets 0/1.
    val ev1 = Seq((200L, "db1", "t1"), (100L, "db1", "t1"), (50L, "db1", "t2"))
    val ev2 = Seq((7000L, "db1", "t1"), (7300L, "db1", "t1"), (7100L, "db1", "t2"))
    val ev3 = Seq((7250L, "db1", "t2"), (7400L, "db1", "t1"), (20000L, "db1", "t1"))
    // out-of-order across micro-batches: 7250 arrives AFTER 7300
    Seq(ev1, ev2, ev3).foreach { evs =>
      input.addData(evs.map { case (o, d, t) => (ts(o), d, t) })
      q.processAllAvailable()
    }
    // sentinel far in the future: advances the watermark past every
    // real bucket's end; two rounds so the no-data timeout batch runs
    input.addData(Seq((ts(200000L), "dbZ", "tZ")))
    q.processAllAvailable()
    input.addData(Seq((ts(200010L), "dbZ", "tZ")))
    q.processAllAvailable()
    q.stop()

    val streamed = SessionMerge.currentSessions(spark, s"$root/sessions", GapUs)
      .collect().map(s => (s.db, s.table, s.sess_start_us, s.sess_end_us, s.n_changes))
      .toSet

    // batch twin over the same CLOSED events (the sentinel's bucket is
    // still open, so it is absent from the store by design)
    val all = (ev1 ++ ev2 ++ ev3).map { case (o, d, t) =>
      (d, t, (Base + o) * 1000000L)
    }.toDF("db", "table", "ts_us")
    val expected = Sessions.twoPhase(all, Seq("db", "table"), "ts_us",
        GapUs, BucketUs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toSet

    assert(streamed == expected)
    // the straddling sessions really did merge across buckets
    assert(streamed.contains(("db1", "t1",
      (Base + 7000L) * 1000000L, (Base + 7400L) * 1000000L + GapUs, 3L)))
    assert(streamed.contains(("db1", "t2",
      (Base + 7100L) * 1000000L, (Base + 7250L) * 1000000L + GapUs, 2L)))
  }

  test("bucket sessions are held until the watermark passes the bucket end") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, String)]
    val q = SessionMerge.bucketSessions(input.toDF().toDF("ts", "db", "table"),
        "10 minutes", GapUs, BucketUs)
      .writeStream.format("memory").queryName("sess_gate")
      .outputMode("append").start()

    input.addData(Seq((ts(100L), "db1", "t1"), (ts(300L), "db1", "t1")))
    q.processAllAvailable()
    // watermark (= max event - 10 min) is far inside bucket 0: nothing final yet
    assert(spark.table("sess_gate").count() == 0)

    // advance past bucket 0's end (7200s) + delay; timeout batch emits
    input.addData(Seq((ts(9000L), "db1", "t1")))
    q.processAllAvailable()
    input.addData(Seq((ts(9100L), "db1", "t1")))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sess_gate")
      .select("db", "table", "bk", "start_us", "last_us", "n")
      .as[(String, String, Long, Long, Long, Long)].collect().toSet
    assert(rows == Set(("db1", "t1", Base * 1000000L / BucketUs,
      (Base + 100L) * 1000000L, (Base + 300L) * 1000000L, 2L)))
    spark.sql("DROP TABLE IF EXISTS sess_gate")
  }

  test("interval-merge insert is arrival-order invariant") {
    val times = Seq(0L, 100L, 2000L, 2100L, 2150L, 9000L).map(_ * 1000000L)
    val gap = 1800L * 1000000L
    val expected = times.permutations.take(120).map { perm =>
      perm.foldLeft(List.empty[(Long, Long, Long)])(
        (ss, t) => SessionMerge.insert(ss, t, gap))
    }.toSet
    assert(expected.size == 1) // every arrival order yields the same sessions
    assert(expected.head.map { case (s, l, n) => (s / 1000000L, l / 1000000L, n) } ==
      List((0L, 100L, 2L), (2000L, 2150L, 3L), (9000L, 9000L, 1L)))
  }

  test("replayed bucket emissions dedup at read time (at-least-once appends)") {
    val root = Files.createTempDirectory("graft_sess_rp").toString
    val rows = Seq(
      SessionMerge.LocalSess("db1", "t1", 0L, 1000L, 2000L, 3L),
      SessionMerge.LocalSess("db1", "t1", 1L, 9000L, 9500L, 2L))
    rows.toDS().write.mode("append").parquet(s"$root/sessions")
    rows.toDS().write.mode("append").parquet(s"$root/sessions") // crash replay
    val out = SessionMerge.currentSessions(spark, s"$root/sessions", gapUs = 5000L)
      .collect().map(s => (s.sess_start_us, s.sess_end_us, s.n_changes)).toSet
    // gap 9000-2000 = 7000 >= 5000: the buckets stay separate sessions;
    // replayed duplicate rows must not double n_changes
    assert(out == Set((1000L, 7000L, 3L), (9000L, 14500L, 2L)))
  }
}
