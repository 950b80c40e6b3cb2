package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{ChangeOp, Scd}

/** SCD Type-2 materialization: versions carry half-open validity
  * intervals; deletes close intervals without materializing versions.
  */
class ScdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long, String, String)]) =
    Scd.type2(rows.toDF("k", "ts_us", "seq", "payload", "op"),
        Seq("k"), "ts_us", "seq", "payload", "op")
      .as[(String, String, Long, Option[Long], Long)].collect().toSet

  test("versions chain half-open intervals; last is current") {
    val out = run(Seq(
      ("a", 100L, 1L, "v1", ChangeOp.Insert),
      ("a", 200L, 2L, "v2", ChangeOp.Update),
      ("a", 300L, 3L, "v3", ChangeOp.Update)))
    assert(out == Set(
      ("a", "v1", 100L, Some(200L), 0L),
      ("a", "v2", 200L, Some(300L), 0L),
      ("a", "v3", 300L, None, 1L)))
  }

  test("delete closes the predecessor and leaves no current row until reinsert") {
    val out = run(Seq(
      ("a", 100L, 1L, "v1", ChangeOp.Insert),
      ("a", 250L, 2L, "", ChangeOp.Delete),
      ("a", 400L, 3L, "v2", ChangeOp.Insert),
      ("b", 100L, 4L, "w1", ChangeOp.Insert),
      ("b", 500L, 5L, "", ChangeOp.Delete)))
    assert(out == Set(
      // v1's interval ends AT the delete, not at the reinsert
      ("a", "v1", 100L, Some(250L), 0L),
      ("a", "v2", 400L, None, 1L),
      // b is tombstoned: closed version, no current row
      ("b", "w1", 100L, Some(500L), 0L)))
  }

  test("equal timestamps order by the unique seq") {
    val out = run(Seq(
      ("a", 100L, 2L, "late", ChangeOp.Update),
      ("a", 100L, 1L, "early", ChangeOp.Insert)))
    assert(out == Set(
      ("a", "early", 100L, Some(100L), 0L),
      ("a", "late", 100L, None, 1L)))
  }
}
