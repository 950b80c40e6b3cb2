package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot / backfill source (SURVEY §2.1 S5-S6, §2.2 F2, §2.8 O1).
  *
  * The reference drives snapshots from a SQLite job queue and runs
  * keyset pagination per job: `SELECT {selection} FROM {db}.{relation}
  * WHERE {pkey} > ?last ORDER BY {pkey} ASC LIMIT {batch}`
  * (reference/src/main.rs:305-387), emitting every row as a
  * `Backfill` change with `(before=None, after=Some(row))` and the
  * placeholder ts of epoch-second 1 (reference/src/main.rs:369-381,375).
  *
  * Spark-first: pagination is an anti-pattern at scale — a snapshot is
  * ONE partitioned scan ([[snapshot]]); Catalyst pushes the `selection`
  * column pruning and any predicate into the parquet/JDBC source, and
  * 1000 executors each read their own split. The keyset page
  * ([[page]]) is still provided for semantic parity (it is what a
  * resumable, rate-limited backfill of a live OLTP source needs) and
  * plans as a single `TakeOrderedAndProject` — no full sort, no extra
  * shuffle.
  */
object Backfill {

  val PlaceholderTs = 1L // reference/src/main.rs:375 (`ts: 1 // @TODO`)

  /** Full-table snapshot as a stream of Backfill changes. `selection`
    * is the job's projection column list (reference/src/main.rs:326,331;
    * default '*' per reference/src/main.rs:146). The selected row
    * columns are kept flat (typed) next to the envelope metadata; the
    * wire form (`after` JSON) is derived on demand via [[wire]].
    */
  def snapshot(table: DataFrame, db: String, relation: String,
      pkey: String, selection: Seq[String] = Nil): DataFrame = {
    val cols = if (selection.isEmpty) table.columns.toSeq else selection
    table.select(
      lit(ChangeOp.Backfill).as("op") +:
      lit(db).as("db") +:
      lit(relation).as("table") +:
      lit(PlaceholderTs).as("ts_sec") +:
      lit(pkey).as("pkey") +:
      cols.map(col): _*)
  }

  /** One keyset page: `pkey > last ORDER BY pkey LIMIT n`
    * (reference/src/main.rs:325-349). Default batch size 1000
    * (reference/src/main.rs:42-43).
    */
  def page(snapshotDf: DataFrame, pkey: String, lastKey: Long,
      batch: Int = 1000): DataFrame =
    snapshotDf.filter(col(pkey) > lastKey).orderBy(col(pkey)).limit(batch)

  /** Wire form: selected columns folded into an `after` JSON payload,
    * matching the live-change envelope shape.
    */
  def wire(snap: DataFrame, rowCols: Seq[String]): DataFrame =
    snap.select(
      col("op"), col("db"), col("table"),
      lit(null).cast("string").as("before"),
      to_json(struct(rowCols.map(col): _*)).as("after"),
      timestamp_seconds(col("ts_sec")).as("ts"),
      col("pkey"))
}
