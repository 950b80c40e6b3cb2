package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dynamic topic routing (SURVEY §2.4 T3).
  *
  * The reference calls a script fn `topic(db, table) -> String` per
  * record (reference/src/main.rs:424-434); the shipped script routes by
  * table name under a fixed prefix
  * (reference/test.rhai:46-48: `projects/my-project-id/topics/all_pims.${table}`).
  *
  * Spark-first: the route is a `Column`, attached once; the sink
  * partitions by it (`partitionBy("topic")` for files, or the native
  * `topic` column for the Kafka sink). At scale this avoids any
  * per-record driver work — routing is data, not control flow.
  */
object Routing {

  val DefaultPrefix = "projects/my-project-id/topics/all_pims."

  /** The shipped script's routing expression. */
  def topicByTable(prefix: String = DefaultPrefix): Column =
    concat(lit(prefix), col("table"))

  def withTopic(changes: DataFrame, topic: Column = topicByTable()): DataFrame =
    changes.withColumn("topic", topic)
}
