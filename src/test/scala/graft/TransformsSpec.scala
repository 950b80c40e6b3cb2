package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc._

/** Envelope golden shapes vs the shipped Rhai scripts
  * (reference/test.rhai:1-36, reference/README.md:54-83).
  */
class TransformsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def changes = Seq(
    ("Insert", "pim", "products", null, """{"id":"1","name":"x"}""", 1700000000L),
    ("Update", "pim", "products", """{"id":"1","name":"x"}""", """{"id":"1","name":"y"}""", 1700000001L),
    ("Delete", "pim", "products", """{"id":"1","name":"y"}""", null, 1700000002L),
    ("Backfill", "pim", "products", null, """{"id":"2"}""", 1L))
    .toDF("op", "db", "table", "before", "after", "ts_sec")
    .withColumn("ts", timestamp_seconds(col("ts_sec"))).drop("ts_sec")
    .withColumn("pkey", lit(""))

  test("Debezium envelope (test.rhai:1-23): op recode + source block + tenant") {
    val rows = Transforms.toWire(changes, Transforms.DebeziumEnvelope)
      .select(col("op"), col("payload")).collect()
    val byOp = rows.map(r => r.getString(0) -> r.getString(1)).toMap

    assert(byOp("Insert").contains(""""op":"c""""))
    assert(byOp("Update").contains(""""op":"u""""))
    assert(byOp("Delete").contains(""""op":"d""""))
    assert(byOp("Backfill").contains(""""op":"c"""")) // Backfill → create
    // source block carries ts_ms/db/table (test.rhai:15-19)
    assert(byOp("Insert").contains(""""source":{"ts_ms":1700000000000,"db":"pim","table":"products"}"""))
    // rows are tagged with tenant = db (test.rhai:2-3)
    assert(byOp("Update").contains(""""tenant":"pim""""))
    // Insert has no before (null skipped from JSON)
    assert(!byOp("Insert").contains(""""before""""))
  }

  test("BigQuery-CDC projection (test.rhai:25-36): fields source + _CHANGE_TYPE") {
    val rows = Transforms.toWire(changes, Transforms.BigQueryCdc)
      .select(col("op"), col("payload")).collect()
    val byOp = rows.map(r => r.getString(0) -> r.getString(1)).toMap

    assert(byOp("Insert").contains(""""_CHANGE_TYPE":"UPSERT""""))
    assert(byOp("Delete").contains(""""_CHANGE_TYPE":"DELETE""""))
    // Delete projects the BEFORE image
    assert(byOp("Delete").contains(""""name":"y""""))
    // Update projects the AFTER image
    assert(byOp("Update").contains(""""name":"y""""))
    assert(byOp("Backfill").contains(""""tenant":"pim""""))
  }

  test("SqlScript host: user SQL script == hand-built transform; analysis-time failure; file loading") {
    // the same reshaping BigQueryCdc hand-builds, written as a user
    // script string — the host must produce identical wire output
    val script = Transforms.SqlScript(
      """map_concat(
        |  from_json(CASE WHEN op = 'Delete' THEN before ELSE after END,
        |            'map<string,string>'),
        |  map('_CHANGE_TYPE',
        |      CASE WHEN op = 'Delete' THEN 'DELETE' ELSE 'UPSERT' END,
        |      'tenant', db))""".stripMargin)
    val got = Transforms.toWire(changes, script)
      .select("op", "payload").as[(String, String)].collect().sorted.toSeq
    val want = Transforms.toWire(changes, Transforms.BigQueryCdc)
      .select("op", "payload").as[(String, String)].collect().sorted.toSeq
    assert(got == want)

    // a broken script fails at ANALYSIS (plan time), never mid-stream
    val bad = Transforms.SqlScript("concat(no_such_column, '!')")
    intercept[org.apache.spark.sql.AnalysisException] {
      Transforms.toWire(changes, bad).collect()
    }

    // scripts load from files — the pluggable loader
    val f = java.nio.file.Files.createTempFile("graft_script", ".sql")
    java.nio.file.Files.writeString(f, "upper(db)")
    val fromFile = Transforms.SqlScript.fromFile(f.toString)
    assert(changes.select(fromFile(changes).as("x")).distinct()
      .as[String].collect().toSeq == Seq("PIM"))
  }

  test("topic routing (test.rhai:46-48)") {
    val t = Routing.withTopic(changes).select("topic").distinct().as[String].collect()
    assert(t.toSeq == Seq("projects/my-project-id/topics/all_pims.products"))
  }
}
