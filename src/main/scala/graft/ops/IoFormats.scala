package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-format ingestion: JSONL (one JSON object per line) — the
  * lingua franca of LLM corpus interchange (every public corpus dump
  * ships as sharded .jsonl). The engine's native columnar format is
  * parquet; this is the import/export edge.
  *
  * [[jsonlRoundTrip]] proves the edge is LOSSLESS, not just runnable:
  * it exports the corpus to JSONL, re-ingests it with the explicit
  * schema, and emits per-source content checksums (order-free XOR of
  * per-row 60-bit text hashes) that the oracle computes from the
  * ORIGINAL parquet — any dropped row, re-encoded character, or
  * mangled escape during the round trip breaks the hash compare.
  *
  * == 100 TB shape ==
  *
  * Both legs are narrow scans: the export writes one shard per
  * partition (no shuffle), the import is a parallel line-split read
  * (JSONL's point: byte-offset splittable), and the audit is one
  * partial-aggregated shuffle of |sources| rows. Schema is supplied,
  * not inferred — inference would scan the corpus twice.
  */
object IoFormats {

  /** Export → re-ingest → per-source audit. Output: (source, n_docs,
    * ids_xor, fp_xor, sum_chars) — all order-free aggregates over
    * content that must survive the trip byte-exactly.
    */
  def jsonlRoundTrip(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, tmpDir: String): DataFrame = {
    val spark = docs.sparkSession
    val d = docs.select(col(idCol).as("id"), col(textCol).as("text"),
      col(sourceCol).as("source"))
    d.write.mode("overwrite").json(tmpDir)
    spark.read.schema(d.schema).json(tmpDir)
      .withColumn("fp", Hashing.hash60(col("text")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        expr("bit_xor(id)").as("ids_xor"),
        expr("bit_xor(fp)").as("fp_xor"),
        sum(length(col("text"))).as("sum_chars"))
  }

  /** DuckDB twin of [[jsonlRoundTrip]] — over the ORIGINAL parquet
    * table: equality proves the JSONL trip changed nothing.
    */
  def jsonlRoundTripSql(id: String, text: String, source: String,
      table: String): String =
    s"""SELECT $source AS source, count(*)::BIGINT AS n_docs,
       |  bit_xor($id)::BIGINT AS ids_xor,
       |  bit_xor(${Hashing.hash60Sql(text)})::BIGINT AS fp_xor,
       |  sum(length($text))::BIGINT AS sum_chars
       |FROM $table GROUP BY 1""".stripMargin
}
