package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{ChangeOp, Scd}
import graft.streaming.ScdStream

/** Streaming SCD-2: closed validity intervals equal the batch twin's
  * closed rows under out-of-order, multi-batch arrival.
  */
class ScdStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Base = 1767225600L
  private def ts(off: Long): Timestamp = new Timestamp((Base + off) * 1000L)
  private def us(off: Long): Long = (Base + off) * 1000000L

  test("streamed closed intervals equal the batch twin's closed rows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Long, String, String)]
    val q = ScdStream.closedVersions(
        input.toDF().toDF("key", "ts", "seq", "payload", "op"),
        watermark = "5 minutes")
      .writeStream.format("memory").queryName("scd_out")
      .outputMode("append").start()

    // k1: insert → update → delete → reinsert; k2: single open version.
    // Out of order across batches, all inside the watermark horizon.
    input.addData(Seq(
      ("k1", ts(100L), 1L, "v1", ChangeOp.Insert),
      ("k1", ts(400L), 3L, "", ChangeOp.Delete),
      ("k1", ts(250L), 2L, "v2", ChangeOp.Update)))
    q.processAllAvailable()
    input.addData(Seq(
      ("k1", ts(600L), 4L, "v3", ChangeOp.Insert),
      ("k2", ts(500L), 5L, "w1", ChangeOp.Insert)))
    q.processAllAvailable()
    // sentinels advance the watermark past every change; second round
    // runs the no-data timeout batch
    input.addData(Seq(("kZ", ts(10000L), 9L, "z", ChangeOp.Insert)))
    q.processAllAvailable()
    input.addData(Seq(("kZ", ts(10001L), 10L, "z", ChangeOp.Insert)))
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("scd_out").as[ScdStream.ClosedVersion]
      .collect().map(c => (c.key, c.payload, c.valid_from_us, c.valid_to_us))
      .toSet

    val batchIn = Seq(
      ("k1", us(100L), 1L, "v1", ChangeOp.Insert),
      ("k1", us(250L), 2L, "v2", ChangeOp.Update),
      ("k1", us(400L), 3L, "", ChangeOp.Delete),
      ("k1", us(600L), 4L, "v3", ChangeOp.Insert),
      ("k2", us(500L), 5L, "w1", ChangeOp.Insert))
      .toDF("key", "ts_us", "seq", "payload", "op")
    val batchClosed = Scd.type2(batchIn, Seq("key"), "ts_us", "seq",
        "payload", "op")
      .filter(col("valid_to_us").isNotNull)
      .select("key", "payload", "valid_from_us", "valid_to_us")
      .as[(String, String, Long, Long)].collect().toSet

    assert(streamed == batchClosed)
    // delete closed v2 at 400; v3 and w1 are open -> absent here
    assert(streamed == Set(
      ("k1", "v1", us(100L), us(250L)),
      ("k1", "v2", us(250L), us(400L))))
    spark.sql("DROP TABLE IF EXISTS scd_out")
  }

  test("applyReady is arrival-order invariant and honors deletes") {
    val changes = List(
      (300L, 3L, "c", "Update"), (100L, 1L, "a", "Insert"),
      (200L, 2L, "", "Delete"), (400L, 4L, "d", "Insert"))
    val expectClosed = List(("a", 100L, 200L), ("c", 300L, 400L))
    changes.permutations.take(24).foreach { perm =>
      val (closed, open) = ScdStream.applyReady(None, perm, "Delete")
      assert(closed == expectClosed, s"order $perm")
      assert(open.contains((400L, "d")))
    }
  }
}
