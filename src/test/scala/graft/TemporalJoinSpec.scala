package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOf
import graft.streaming.TemporalJoin

/** The streaming as-of (temporal) join: proven equal to the batch
  * operator ops.AsOf.joinTs under out-of-order, multi-batch arrival,
  * with version state bounded by the watermark.
  */
class TemporalJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Base = 1767225600L // 2026-01-01 00:00:00 UTC, seconds
  private def ts(off: Long): Timestamp = new Timestamp((Base + off) * 1000L)
  private def us(off: Long): Long = (Base + off) * 1000000L

  test("streaming as-of equals the batch as-of under out-of-order multi-batch arrival") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val probesIn = MemoryStream[(String, Timestamp, String)]
    val versionsIn = MemoryStream[(String, Timestamp)]
    val q = TemporalJoin.asOf(
        probesIn.toDF().toDF("key", "ts", "payload"),
        versionsIn.toDF().toDF("key", "ts"),
        watermark = "5 minutes")
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()

    // k1 versions at 100/500/900; k2 version at 400 only.
    // probes: before any version (-> null), tie on 100, between
    // versions, after the last one — arriving OUT OF ORDER: the probe
    // at 600 lands before the version at 500 that answers it.
    versionsIn.addData(Seq(("k1", ts(100L))))
    probesIn.addData(Seq(("k1", ts(600L), "p600"), ("k1", ts(50L), "p50"),
      ("k1", ts(100L), "p100")))
    q.processAllAvailable()
    // batch-2 arrivals stay inside the watermark horizon (wm = 600-300)
    versionsIn.addData(Seq(("k1", ts(500L)), ("k2", ts(400L))))
    probesIn.addData(Seq(("k2", ts(350L), "q350")))
    q.processAllAvailable()
    versionsIn.addData(Seq(("k1", ts(900L))))
    probesIn.addData(Seq(("k1", ts(1000L), "p1000"), ("k2", ts(2000L), "q2000")))
    q.processAllAvailable()
    // sentinels push the watermark past every probe; second round runs
    // the no-data timeout batch that flushes quiet keys
    versionsIn.addData(Seq(("kZ", ts(10000L))))
    q.processAllAvailable()
    versionsIn.addData(Seq(("kZ", ts(10001L))))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("asof_out")
      .as[TemporalJoin.AsOfOut].collect()
      .map(o => (o.key, o.ts_us, o.payload, o.asof_ts_us)).toSet

    val left = Seq(
      ("k1", us(50L), "p50"), ("k1", us(100L), "p100"), ("k1", us(600L), "p600"),
      ("k1", us(1000L), "p1000"), ("k2", us(350L), "q350"), ("k2", us(2000L), "q2000"))
      .toDF("key", "ts_us", "payload")
    val right = Seq(("k1", us(100L)), ("k1", us(500L)), ("k1", us(900L)),
      ("k2", us(400L))).toDF("key", "ts_us")
    val batch = AsOf.joinTs(left, right, Seq("key"), "ts_us")
      .select("key", "ts_us", "payload", "asof_ts")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet

    assert(streamed == batch)
    // spot checks: null before any version, tie matches, latest-below wins
    assert(streamed.contains(("k1", us(50L), "p50", None)))
    assert(streamed.contains(("k1", us(100L), "p100", Some(us(100L)))))
    assert(streamed.contains(("k1", us(600L), "p600", Some(us(500L)))))
    assert(streamed.contains(("k2", us(2000L), "q2000", Some(us(400L)))))
    spark.sql("DROP TABLE IF EXISTS asof_out")
  }

  test("probes are answered only once the watermark passes them") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val probesIn = MemoryStream[(String, Timestamp, String)]
    val versionsIn = MemoryStream[(String, Timestamp)]
    val q = TemporalJoin.asOf(
        probesIn.toDF().toDF("key", "ts", "payload"),
        versionsIn.toDF().toDF("key", "ts"),
        watermark = "5 minutes")
      .writeStream.format("memory").queryName("asof_gate")
      .outputMode("append").start()

    versionsIn.addData(Seq(("k1", ts(100L))))
    probesIn.addData(Seq(("k1", ts(200L), "p200")))
    q.processAllAvailable()
    // watermark = 200 - 300 < 200: the probe must still be pending —
    // a version at e.g. 150 could still arrive and change the answer
    assert(spark.table("asof_gate").count() == 0)

    versionsIn.addData(Seq(("k1", ts(150L)))) // late-but-in-horizon version
    versionsIn.addData(Seq(("kZ", ts(1000L)))) // watermark past 200
    q.processAllAvailable()
    versionsIn.addData(Seq(("kZ", ts(1001L))))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("asof_gate").as[TemporalJoin.AsOfOut].collect()
      .map(o => (o.key, o.ts_us, o.asof_ts_us)).toSet
    // the in-horizon version at 150 (not 100) is the final answer
    assert(rows == Set(("k1", us(200L), Some(us(150L)))))
    spark.sql("DROP TABLE IF EXISTS asof_gate")
  }

  test("version eviction keeps exactly the newest at-or-below the watermark") {
    val marks = List(10L, 20L, 30L, 40L).map(_ * 1000000L)
    // wm at 25s: 10/20 dominated by 20 -> keep 20 (newest <= wm), 30, 40
    assert(TemporalJoin.evictMarks(marks, 25L * 1000) ==
      List(20L, 30L, 40L).map(_ * 1000000L))
    // wm before all: nothing evictable
    assert(TemporalJoin.evictMarks(marks, 5L * 1000) == marks)
    // wm past all: only the newest survives
    assert(TemporalJoin.evictMarks(marks, 50L * 1000) == List(40L * 1000000L))
    assert(TemporalJoin.evictMarks(Nil, 50L) == Nil)
  }

  test("match is greatest version <= probe, ties included") {
    val marks = List(100L, 500L, 900L)
    assert(TemporalJoin.matchOf(marks, 50L).isEmpty)
    assert(TemporalJoin.matchOf(marks, 100L).contains(100L))
    assert(TemporalJoin.matchOf(marks, 600L).contains(500L))
    assert(TemporalJoin.matchOf(marks, 2000L).contains(900L))
  }
}
