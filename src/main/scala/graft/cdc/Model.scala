package graft.cdc

import org.apache.spark.sql.types._

/** The CDC change envelope.
  *
  * Mirrors the reference's `Change` record (reference/src/main.rs:55-63):
  * `op` (reference/src/main.rs:46-53: Insert | Update | Delete | Backfill),
  * `db`, `table`, a (before, after) optional row pair (the Debezium
  * convention, reference/src/main.rs:286-292), an event timestamp
  * (binlog header epoch seconds, reference/src/main.rs:285) and the
  * primary-key column NAME (reference/src/main.rs:371; empty on live
  * changes, reference/src/main.rs:276).
  *
  * Spark-first representation: the row payloads are carried as JSON
  * strings at the envelope boundary (the reference's `rhai::Map` is
  * schemaless — reference/src/main.rs:22,442-507); downstream operators
  * that know the table schema promote them to typed structs with
  * `from_json`. `ts` is a proper `TimestampType` column instead of a
  * raw u32 of epoch seconds.
  */
case class Change(
    op: String,
    db: String,
    table: String,
    before: Option[String],
    after: Option[String],
    ts: java.sql.Timestamp,
    pkey: String)

object ChangeOp {
  val Insert   = "Insert"
  val Update   = "Update"
  val Delete   = "Delete"
  val Backfill = "Backfill"
  val all: Seq[String] = Seq(Insert, Update, Delete, Backfill)
}

object Model {
  /** Envelope schema used by streaming sources and from_json promotion. */
  val changeSchema: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("db", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("before", StringType, nullable = true),
    StructField("after", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = false),
    StructField("pkey", StringType, nullable = false)))
}
