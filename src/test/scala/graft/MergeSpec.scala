package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{ChangeOp, Merge}

/** M2 race semantics (SURVEY §2.3, §7.4): live supersedes stale
  * backfill, Delete tombstones beat Backfill (the reference's
  * resurrect bug is deliberately fixed — reference/src/main.rs:84),
  * plus order-invariance properties.
  */
class MergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(String, String, String, Long, Long)]): DataFrame =
    rows.toDF("key", "op", "bal", "ts_sec", "seq")

  private def result(bf: DataFrame, live: DataFrame): Map[String, (String, String)] =
    Merge.lww(bf, live).select("key", "op", "bal").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap

  test("live change supersedes stale backfill row of same key (main.rs:81)") {
    val bf = df(Seq(("k1", ChangeOp.Backfill, "old", 1L, -1L)))
    val live = df(Seq(("k1", ChangeOp.Update, "new", 100L, 1L)))
    assert(result(bf, live) == Map("k1" -> (ChangeOp.Update, "new")))
  }

  test("backfill-only keys survive (main.rs:86)") {
    val bf = df(Seq(("k1", ChangeOp.Backfill, "snap", 1L, -1L)))
    val live = df(Seq(("k2", ChangeOp.Insert, "x", 100L, 1L)))
    assert(result(bf, live) ==
      Map("k1" -> (ChangeOp.Backfill, "snap"), "k2" -> (ChangeOp.Insert, "x")))
  }

  test("Delete tombstone wins over Backfill — no resurrection (fixes main.rs:84)") {
    val bf = df(Seq(("k1", ChangeOp.Backfill, "ghost", 1L, -1L)))
    val live = df(Seq(("k1", ChangeOp.Delete, "gone", 50L, 1L)))
    assert(result(bf, live) == Map.empty)
  }

  test("ties on ts: live precedence beats backfill") {
    val bf = df(Seq(("k1", ChangeOp.Backfill, "snap", 7L, -1L)))
    val live = df(Seq(("k1", ChangeOp.Update, "live", 7L, 1L)))
    assert(result(bf, live) == Map("k1" -> (ChangeOp.Update, "live")))
  }

  test("within live: highest (ts, seq) wins") {
    val bf = df(Nil)
    val live = df(Seq(
      ("k1", ChangeOp.Insert, "v1", 10L, 1L),
      ("k1", ChangeOp.Update, "v2", 20L, 2L),
      ("k1", ChangeOp.Update, "v2b", 20L, 3L)))
    assert(result(bf, live) == Map("k1" -> (ChangeOp.Update, "v2b")))
  }

  // ---- strict-parity pairwise merge (the reference's LITERAL
  // update_with zip, race bugs included — Merge.strictPairwise) ----

  private def sdf(rows: Seq[(Long, String, String, Long, String, String)]): DataFrame =
    rows.toDF("ord", "db", "table", "key", "op", "bal")

  private def strict(bf: DataFrame, live: DataFrame): Seq[(Long, Long, String, String)] =
    Merge.strictPairwise(bf, live).orderBy("rn")
      .select("rn", "key", "op", "src").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSeq

  test("strict parity: matching live supersedes its paired backfill (main.rs:81)") {
    val bf = sdf(Seq((1L, "db0", "t", 5L, ChangeOp.Backfill, "old")))
    val live = sdf(Seq((1L, "db0", "t", 5L, ChangeOp.Update, "new")))
    assert(strict(bf, live) == Seq((1L, 5L, ChangeOp.Update, "live")))
  }

  test("strict parity: non-matching live change is DROPPED, not re-queued (main.rs:107-110)") {
    // pair (backfill key 5, live key 9): update_with keeps the
    // backfill and the live update vanishes from the output entirely —
    // the reference bug lww deliberately fixes
    val bf = sdf(Seq((1L, "db0", "t", 5L, ChangeOp.Backfill, "snap")))
    val live = sdf(Seq((1L, "db0", "t", 9L, ChangeOp.Update, "lost")))
    assert(strict(bf, live) == Seq((1L, 5L, ChangeOp.Backfill, "backfill")))
    // ... whereas the intended-semantics merge keeps BOTH keys
    val lww = Merge.lww(
      bf.select(col("key").cast("string").as("key"), col("op"), col("bal"),
        lit(1L).as("ts_sec"), lit(-1L).as("seq")),
      live.select(col("key").cast("string").as("key"), col("op"), col("bal"),
        lit(2L).as("ts_sec"), lit(1L).as("seq")))
    assert(lww.count() == 2)
  }

  test("strict parity: Delete never matches — paired backfill resurrects the key (main.rs:84)") {
    val bf = sdf(Seq((1L, "db0", "t", 5L, ChangeOp.Backfill, "ghost")))
    val live = sdf(Seq((1L, "db0", "t", 5L, ChangeOp.Delete, "gone")))
    // same key, but the Delete's missing after-row hits the wildcard
    // arm: the backfill row survives and the delete is swallowed
    assert(strict(bf, live) == Seq((1L, 5L, ChangeOp.Backfill, "backfill")))
  }

  test("strict parity: unpaired rows pass through (main.rs:111-113)") {
    val bf = sdf(Seq((1L, "db0", "t", 1L, ChangeOp.Backfill, "a")))
    val live = sdf(Seq(
      (1L, "db1", "t", 1L, ChangeOp.Update, "x"), // db mismatch → dropped
      (2L, "db0", "t", 2L, ChangeOp.Insert, "b"), // past the snapshot → live
      (3L, "db0", "t", 3L, ChangeOp.Delete, "c")))
    // rows 2-3 land past the backfill's end. The LITERAL reference has
    // no (backfill EOF, live Ready) match arm — they'd fall to the
    // `_ => Poll::Pending` fallthrough and the drive loop would stall
    // forever (a latent bug alongside drop/resurrect); this models the
    // pass-through those arms intend (main.rs:111-113), since a stalled
    // stream has no batch analogue. Deliberate, documented divergence.
    assert(strict(bf, live) == Seq(
      (1L, 1L, ChangeOp.Backfill, "backfill"),
      (2L, 2L, ChangeOp.Insert, "live"),
      (3L, 3L, ChangeOp.Delete, "live")))
  }

  /** Seeded random change batches (deterministic — no scalacheck
    * bridge artifact in the offline cache).
    */
  private def randomBatches(seed: Long, n: Int): Seq[Seq[(String, String, String, Long, Long)]] = {
    val rnd = new scala.util.Random(seed)
    val ops = Seq(ChangeOp.Insert, ChangeOp.Update, ChangeOp.Delete)
    (0 until n).map { _ =>
      (0 until 8).map { i =>
        val k = s"k${rnd.nextInt(3)}"
        val o = ops(rnd.nextInt(3))
        val ts = 1L + rnd.nextInt(5)
        (k, o, s"$o-$ts", ts, i.toLong)
      }
    }
  }

  test("property: merge result is invariant to input order") {
    for (rows <- randomBatches(seed = 42, n = 10)) {
      val bf = df(Seq(("k0", ChangeOp.Backfill, "snap", 1L, -1L)))
      val expected = result(bf, df(rows))
      val shuffled = new scala.util.Random(7).shuffle(rows)
      assert(result(bf, df(shuffled)) == expected)
    }
  }

  test("property: re-merging the winners is a fixpoint") {
    for (rows <- randomBatches(seed = 11, n = 10)) {
      val bf = df(Seq(("k1", ChangeOp.Backfill, "snap", 1L, -1L)))
      val winners = Merge.lww(bf, df(rows))
        .select("key", "op", "bal", "ts_sec", "seq")
        .as[(String, String, String, Long, Long)].collect().toSeq
      val twice = result(df(Nil), df(winners))
      assert(twice == winners.map(w => w._1 -> (w._2, w._3)).toMap)
    }
  }
}
