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

  /** The shard-assignment expression shared by the export and its
    * oracle: a salted 60-bit hash of the id modulo `nShards` —
    * deterministic (re-runs and engines agree), uniform (shards
    * balance to ~±1/√(docs/shard) with zero coordination), and
    * independent of the X44 split hash and X45 mix hash (different
    * salt), so sharding cannot correlate with split membership.
    */
  private def shardCol(idCol: String, nShards: Int) =
    pmod(Hashing.hash60(concat(col(idCol).cast("string"), lit(":shard"))),
      lit(nShards.toLong)).cast("int")

  /** X89: the final pipeline step — write the corpus as `nShards`
    * balanced JSONL shards (ONE file per shard: the repartition puts
    * each shard id wholly in one task, `partitionBy` then splits that
    * task's output by shard id — exactly one data file lands in each
    * `shard=K/` directory), re-ingest, and audit per shard with the
    * X84 lossless checksums. Output: (shard, n_docs, ids_xor, fp_xor,
    * sum_chars), provable against the ORIGINAL table by the oracle
    * twin — shard assignment included, since both engines compute the
    * same salted hash.
    *
    * == 100 TB shape ==
    *
    * One hash-partitioned shuffle (unavoidable: a shard must be
    * writable as one unit) and narrow writes; no global sort, no
    * window, no driver-side packing loop. Shard COUNT is the
    * operator's scale knob: budget ≈ corpus_bytes / shard_bytes.
    */
  def shardedExport(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int, tmpDir: String): DataFrame = {
    val spark = docs.sparkSession
    val d = docs.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("shard", shardCol("id", nShards))
    d.repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").json(tmpDir)
    spark.read.schema("id BIGINT, text STRING, shard INT")
      .option("basePath", tmpDir).json(tmpDir)
      .withColumn("fp", Hashing.hash60(col("text")))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        expr("bit_xor(id)").as("ids_xor"),
        expr("bit_xor(fp)").as("fp_xor"),
        sum(length(col("text"))).as("sum_chars"))
  }

  /** DuckDB twin of [[shardedExport]] over the ORIGINAL table: same
    * salted shard hash (hash60 is non-negative, so plain `%` matches
    * Spark's `pmod`), same order-free checksums.
    */
  def shardedExportSql(id: String, text: String, table: String,
      nShards: Int): String =
    s"""SELECT (${Hashing.hash60Sql(s"$id::VARCHAR || ':shard'")}
       |    % $nShards)::INT AS shard,
       |  count(*)::BIGINT AS n_docs,
       |  bit_xor($id)::BIGINT AS ids_xor,
       |  bit_xor(${Hashing.hash60Sql(text)})::BIGINT AS fp_xor,
       |  sum(length($text))::BIGINT AS sum_chars
       |FROM $table GROUP BY 1""".stripMargin
}
