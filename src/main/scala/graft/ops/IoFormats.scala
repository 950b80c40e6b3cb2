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

  // ----------------------------- X121: WARC (ISO 28500) ingestion

  /** One parsed WARC record. `payload` is raw bytes (web content is
    * binary); headers surface as typed columns.
    */
  final case class WarcRow(file: String, rec_idx: Long, warc_type: String,
      uri: String, content_length: Long, payload: Array[Byte])

  /** Read a directory of WARC files — plain `.warc` or the Common
    * Crawl convention `.warc.gz` (each record its OWN gzip member,
    * concatenated; the JDK's GZIPInputStream reads concatenated
    * members transparently, so one stream yields the whole file).
    * Framing per ISO 28500: `WARC/1.0\r\n`, header lines to a blank
    * line, `Content-Length` payload bytes, `\r\n\r\n` terminator.
    *
    * == 100 TB shape ==
    *
    * The parallelism unit is the FILE (binaryFile source — one task
    * per file), which is exactly how Common Crawl ships: ~1 GB
    * .warc.gz segments, tens of thousands of them per crawl; a
    * 1000-executor cluster maps files to tasks with no shuffle at
    * all, and the parse is a single forward pass per file (the gzip
    * member framing is NOT splittable, so per-file tasks are the
    * honest maximum parallelism — the reason CC publishes many small
    * segments). mapPartitions is the per-partition-imperative-parse
    * boundary, the same justification as the media codecs.
    */
  def readWarc(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .mapPartitions(warcRows).toDF()
  }

  /** Streaming twin of [[readWarc]]: new segments appearing in `dir`
    * are parsed per micro-batch through the SAME byte-level pass —
    * crawl ingestion as a live source (compose with the extraction
    * and curation gates in [[graft.streaming.Pipeline]]). The file
    * stream source tracks seen files in the checkpoint, so each
    * segment is parsed exactly once per run; the parallelism unit
    * stays the file.
    */
  def streamWarc(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    // the binaryFile source's fixed schema — the streaming source
    // requires it stated (no inference on a possibly-empty dir)
    spark.readStream.format("binaryFile")
      .schema("path STRING, modificationTime TIMESTAMP, " +
        "length LONG, content BINARY")
      .load(dir)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .mapPartitions(warcRows).toDF()
  }

  /** The shared file → records pass (gz sniff, member-concatenated
    * gunzip, byte-level parse) — ONE copy serving both the batch and
    * the streaming reader, so the spec-pinned stream == batch
    * equality can't drift.
    */
  private def warcRows(
      files: Iterator[(String, Array[Byte])]): Iterator[WarcRow] =
    files.flatMap { case (path, raw) =>
      val data = if (path.endsWith(".gz")) gunzipAll(raw) else raw
      parseWarc(data).zipWithIndex.map { case ((t, uri, pay), i) =>
        WarcRow(path, i.toLong, t, uri, pay.length.toLong, pay)
      }
    }

  /** Decompress a stream of CONCATENATED gzip members to one byte
    * array (the .warc.gz layout).
    */
  private def gunzipAll(raw: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(raw))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** Single forward pass over WARC framing → (type, target-uri,
    * payload) per record. Headers are ASCII per the spec; payloads
    * are raw bytes.
    */
  private def parseWarc(
      data: Array[Byte]): Seq[(String, String, Array[Byte])] = {
    val out = Seq.newBuilder[(String, String, Array[Byte])]
    var p = 0
    def findBlank(from: Int): Int = {
      var i = from
      while (i + 3 < data.length &&
        !(data(i) == '\r' && data(i + 1) == '\n' &&
          data(i + 2) == '\r' && data(i + 3) == '\n')) i += 1
      i
    }
    while (p < data.length) {
      // tolerate inter-record CRLF padding
      while (p < data.length && (data(p) == '\r' || data(p) == '\n')) p += 1
      if (p >= data.length) return out.result()
      val hdrEnd = findBlank(p)
      require(hdrEnd + 3 < data.length, s"truncated WARC header at $p")
      val lines = new String(data, p, hdrEnd - p, "ISO-8859-1")
        .split("\r\n")
      require(lines.head.startsWith("WARC/"),
        s"not a WARC record at offset $p: ${lines.head.take(20)}")
      val hdrs = lines.tail.flatMap { l =>
        l.split(": ", 2) match {
          case Array(k2, v) => Some(k2.toLowerCase -> v)
          case _ => None
        }
      }.toMap
      val payStart = hdrEnd + 4
      // validate on the LONG before narrowing: a corrupt/hostile
      // Content-Length >= 2^31 must fail loud here, not wrap into a
      // small int and misparse the rest of the file
      val lenL = hdrs("content-length").toLong
      require(lenL >= 0 && lenL <= data.length - payStart,
        s"bad Content-Length $lenL at $p (file has ${data.length} bytes)")
      val len = lenL.toInt
      out += ((hdrs.getOrElse("warc-type", ""),
        hdrs.getOrElse("warc-target-uri", ""),
        java.util.Arrays.copyOfRange(data, payStart, payStart + len)))
      p = payStart + len
    }
    out.result()
  }

  // record-content formula shared by the fixture writer and the
  // DuckDB oracle — the multimodal scheme: the bytes are REAL WARC
  // framing, the oracle recomputes the expected fields without them
  def warcUri(i: Long): String = s"http://example.com/doc/$i"
  def warcPayload(i: Long): String =
    "warc payload body " + i + " " + ("x" * (i % 7).toInt)
  def warcUriSql(i: String): String = s"'http://example.com/doc/' || $i"
  def warcPayloadSql(i: String): String =
    s"'warc payload body ' || $i || ' ' || repeat('x', ($i % 7)::INT)"

  private def warcRecordBytes(uri: String, payload: String,
      warcType: String = "response"): Array[Byte] = {
    val pay = payload.getBytes("UTF-8")
    val hdr = ("WARC/1.0\r\n" +
      s"WARC-Type: $warcType\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      s"Content-Length: ${pay.length}\r\n\r\n").getBytes("ISO-8859-1")
    hdr ++ pay ++ "\r\n\r\n".getBytes("ISO-8859-1")
  }

  /** Stage the fixture pair — one plain .warc, one .warc.gz with a
    * gzip member PER RECORD (the Common Crawl layout) — carrying the
    * formula records. Returns the directory.
    */
  def stageWarcFixture(dir: String, n: Int): String = {
    val d = new java.io.File(dir)
    d.mkdirs()
    def record(i: Long): Array[Byte] =
      warcRecordBytes(warcUri(i), warcPayload(i))
    val plain = new java.io.FileOutputStream(s"$dir/fixture.warc")
    try (0L until n.toLong).foreach(i => plain.write(record(i)))
    finally plain.close()
    val gz = new java.io.FileOutputStream(s"$dir/fixture.warc.gz")
    try (0L until n.toLong).foreach { i =>
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(record(i)); g.close()
      gz.write(bos.toByteArray)
    } finally gz.close()
    dir
  }

  // X123's messy-URL fixture: each logical page appears TWICE — once
  // with every normalization hazard (scheme/host case, default port,
  // trailing slash, unsorted params, fragment), once clean — and the
  // two must collapse under canonicalization. Shared with the oracle.
  def messyUri(i: Long, n: Int): String = {
    val j = i % (n / 2)
    if (i / (n / 2) == 0)
      s"HTTP://Example.COM:80/page/$j/?b=2&a=1#frag$j"
    else s"http://example.com/page/$j?a=1&b=2"
  }

  def messyUriSql(i: String, n: Int): String = {
    val j = s"(($i) % ${n / 2})"
    s"(CASE WHEN ($i) // ${n / 2} = 0 " +
      s"THEN 'HTTP://Example.COM:80/page/' || $j || '/?b=2&a=1#frag' || $j " +
      s"ELSE 'http://example.com/page/' || $j || '?a=1&b=2' END)"
  }

  /** Test hook: one framed record with caller-chosen uri/payload —
    * the composition specs build small custom segments with it.
    */
  private[graft] def warcRecordForTest(uri: String,
      payload: String): Array[Byte] = warcRecordBytes(uri, payload)

  // ----------------------------- X124: WET export (crawl chain exit)

  /** WET export — the crawl chain's standard EXIT format: each
    * page's extracted plain text as a `WARC-Type: conversion` record
    * (what Common Crawl publishes beside every crawl segment as
    * `.warc.wet.gz`), one gzip member per record, one file per shard
    * partition. With X121 (WARC ingest) → X122 (HTML→text) → X123
    * (URL dedup) this closes the loop: crawl → extract → dedup →
    * WET round-trips entirely through standard formats.
    *
    * The extraction hop IS part of the export (wrap → [[TextAnalysis.
    * htmlToText]] → record), and the return value is the round-trip
    * PROOF: the written directory read back through the standard
    * reader ([[readWarc]]), reduced to per-shard order-free checksums
    * (the X84 sharded-export scheme) that a DuckDB oracle recomputes
    * from the ORIGINAL table without seeing a single written byte —
    * n/type/id-xor/text-fp-xor/char-sum all have to survive framing,
    * gzip, and re-parse losslessly for the hash gate to pass.
    *
    * == 100 TB shape ==
    *
    * ONE hash exchange (repartition on the salted shard key), then
    * each task streams its rows through a gzip member encoder
    * straight to the target filesystem via the Hadoop FS API (HDFS /
    * S3A / local all serve; no driver collect, no temp staging, no
    * second shuffle). The gzip-member-per-record layout keeps the
    * output streamable AND record-seekable, and file = read-back
    * parallelism unit — Common Crawl's own contract. Read-back for
    * the proof frame is file-parallel with one partial-agg shuffle
    * of shard-sized checksum rows.
    */
  def wetExport(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int, outDir: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rows = wetRows(docs, idCol, textCol)
      .withColumn("shard", shardCol("id", nShards))
    // clean target through the Hadoop FS so any scheme works
    val outPath = new org.apache.hadoop.fs.Path(outDir)
    val dfs = outPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    dfs.delete(outPath, true)
    dfs.mkdirs(outPath)
    rows.repartition(nShards, col("shard"))
      .select($"id", $"wet").as[(Long, String)]
      .foreachPartition { (it: Iterator[(Long, String)]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        writeWetSegment(it, outDir, f"part-$pid%05d.warc.wet.gz")
      }
    // round-trip: parse the written files back and reduce to the
    // lossless per-shard checksums (shard recomputed from the parsed
    // id by the SAME salted hash — file names stay layout-private)
    readWarc(spark, outDir)
      .select(col("warc_type"),
        regexp_extract(col("uri"), "/doc/(\\d+)$", 1).cast("long").as("id"),
        col("payload").cast("string").as("wet"))
      .withColumn("shard", shardCol("id", nShards))
      .withColumn("fp", Hashing.hash60(col("wet")))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("warc_type") === "conversion", 1L).otherwise(0L))
          .as("n_conversion"),
        expr("bit_xor(id)").as("ids_xor"),
        expr("bit_xor(fp)").as("fp_xor"),
        sum(length(col("wet"))).as("sum_chars"))
  }

  /** Executor-side WET segment writer: stream (id, extracted text)
    * rows through per-record gzip members into ONE `.warc.wet.gz`
    * at a DETERMINISTIC name (overwrite on create — a task or batch
    * retry rewrites its own file, so at-least-once execution yields
    * exactly-once segments). Empty iterators write nothing.
    */
  private[graft] def writeWetSegment(it: Iterator[(Long, String)],
      outDir: String, fileName: String): Unit = {
    if (!it.hasNext) return
    val path = new org.apache.hadoop.fs.Path(outDir, fileName)
    val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.setWriteChecksum(false) // no .crc sidecars next to segments
    val out = fs.create(path, true)
    try it.foreach { case (id, wet) =>
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(warcRecordBytes(warcUri(id), wet, "conversion"))
      g.close()
      out.write(bos.toByteArray)
    } finally out.close()
  }

  /** The wrap → X122-extract projection shared by [[wetExport]] and
    * the streaming sink: (id, wet).
    */
  private[graft] def wetRows(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val html = concat(lit(TextAnalysis.HtmlWrapPrefix), col(textCol),
      lit(TextAnalysis.HtmlWrapSuffix))
    docs.select(col(idCol).cast("long").as("id"),
      TextAnalysis.htmlToText(html).as("wet"))
  }

  /** DuckDB twin of [[wetExport]] over the ORIGINAL table: the same
    * wrap → extract chain (RE2) and the same order-free checksums —
    * the oracle never reads the written WET bytes.
    */
  def wetExportSql(id: String, text: String, table: String,
      nShards: Int): String = {
    val wet = TextAnalysis.htmlToTextSql(
      s"'${TextAnalysis.HtmlWrapPrefix}' || $text || " +
        s"'${TextAnalysis.HtmlWrapSuffix}'")
    s"""WITH w AS (SELECT $id AS id, $wet AS wet FROM $table)
       |SELECT (${Hashing.hash60Sql(s"id::VARCHAR || ':shard'")}
       |    % $nShards)::INT AS shard,
       |  count(*)::BIGINT AS n_docs,
       |  count(*)::BIGINT AS n_conversion,
       |  bit_xor(id)::BIGINT AS ids_xor,
       |  bit_xor(${Hashing.hash60Sql("wet")})::BIGINT AS fp_xor,
       |  sum(length(wet))::BIGINT AS sum_chars
       |FROM w GROUP BY 1 ORDER BY shard""".stripMargin
  }

  /** Stage one plain .warc of [[messyUri]] records. */
  def stageWarcMessy(dir: String, n: Int): String = {
    new java.io.File(dir).mkdirs()
    val plain = new java.io.FileOutputStream(s"$dir/messy.warc")
    try (0L until n.toLong).foreach(i =>
      plain.write(warcRecordBytes(messyUri(i, n), s"body $i")))
    finally plain.close()
    dir
  }
}
