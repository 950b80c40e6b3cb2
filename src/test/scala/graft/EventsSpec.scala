package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Events

/** Semantics pins for the event-analytics operators on hand-built
  * logs (the driver's oracle covers them end-to-end on testdata).
  */
class EventsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val WeekUs = 604800L * 1000000L
  private def ts(week: Long, offsetUs: Long = 0L) =
    new java.sql.Timestamp((week * WeekUs + offsetUs) / 1000)

  test("retention counts users per (cohort week, offset)") {
    // u1 first active week 10, returns week 11 and 13; u2 cohort 10
    // only; u3 cohort 11, returns 13; duplicate events collapse
    val ev = Seq(
      (1L, ts(10)), (1L, ts(10, 5L)), (1L, ts(11)), (1L, ts(13)),
      (2L, ts(10)),
      (3L, ts(11)), (3L, ts(13)))
      .toDF("user_id", "ts")
    val out = Events.retention(ev, "user_id", "ts")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (10L, 0L, 2L), (10L, 1L, 1L), (10L, 3L, 1L),
      (11L, 0L, 1L), (11L, 2L, 1L)))
  }

  test("retention floors pre-epoch timestamps and drops NULLs") {
    // u1's first event is 1 ms BEFORE the epoch: floor division puts
    // it in week -1 (truncation would collapse it into week 0 with
    // the epoch event — the divergence the floor spelling prevents);
    // u2 has ONLY a NULL timestamp → contributes no rows at all;
    // u3 has a NULL plus a real week-1 event → the NULL is dropped,
    // the cohort comes from the real event
    val ev = Seq(
      (1L, ts(0, -1000L)), (1L, ts(0)),
      (2L, null.asInstanceOf[java.sql.Timestamp]),
      (3L, null.asInstanceOf[java.sql.Timestamp]), (3L, ts(1)))
      .toDF("user_id", "ts")
    val out = Events.retention(ev, "user_id", "ts")
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set(
      (-1L, 0L, 1L), (-1L, 1L, 1L), // u1: cohort -1, returns in week 0
      (1L, 0L, 1L)))                // u3 alone; u2 vanished
  }

  test("funnel requires strictly-ordered first-touch stages") {
    // u1 converts fully; u2's purchase PRECEDES its click → stops at
    // click; u3 clicks before signup and once after → the late click
    // counts; u4 never signs up → never enters
    val ev = Seq(
      (1L, "signup", ts(0, 100000L)), (1L, "click", ts(0, 200000L)),
      (1L, "purchase", ts(0, 300000L)),
      (2L, "signup", ts(0, 100000L)), (2L, "purchase", ts(0, 150000L)),
      (2L, "click", ts(0, 200000L)),
      (3L, "click", ts(0, 50000L)), (3L, "signup", ts(0, 100000L)),
      (3L, "click", ts(0, 400000L)),
      (4L, "click", ts(0, 100000L)), (4L, "purchase", ts(0, 200000L)))
      .toDF("user_id", "event_type", "ts")
    val out = Events.funnel(ev, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "signup", 3L, 1000000L),
      (2L, "click", 3L, 1000000L), // u1, u2, u3 all click after signup
      (3L, "purchase", 1L, 333333L))) // only u1 purchases after click
  }

  test("funnel stage events at the exact prior timestamp do not count") {
    val ev = Seq(
      (1L, "signup", ts(0, 100000L)), (1L, "click", ts(0, 100000L)))
      .toDF("user_id", "event_type", "ts")
    val out = Events.funnel(ev, "user_id", "event_type", "ts",
        Seq("signup", "click", "purchase"))
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(out.map(r => (r._1, r._3)).toSeq ==
      Seq((1L, 1L), (2L, 0L), (3L, 0L)))
  }
}
