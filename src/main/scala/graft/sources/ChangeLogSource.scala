package graft.sources

import java.util.{Map => JMap}

import scala.collection.JavaConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A DataSource V2 change-log source — the Spark-native shape of the
  * reference's MySQL binlog reader (SURVEY §2.1 S1-S4;
  * reference/src/main.rs:202-303).
  *
  * The log is a directory of immutable, lexicographically-ordered
  * JSON-lines files of change envelopes. The streaming offset is
  * `(file index, rows consumed in that file)` — exactly the binlog's
  * `(filename, pos)` pair (reference/src/main.rs:137-141): advancing
  * to the next file is the RotateEvent (S2, main.rs:233-237), and
  * Structured Streaming's checkpoint persists the offset with the same
  * at-least-once contract as the reference's SQLite upsert-per-
  * table-map (S3, main.rs:238-255) — no bespoke state store needed.
  *
  * Admission control: `maxRowsPerTrigger` bounds each micro-batch the
  * way `--backfill-batch-size` bounds the reference's pages.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft.sources.ChangeLogSource")
  *     .option("path", dir).option("maxRowsPerTrigger", "1000").load()
  * }}}
  *
  * Scale notes: one replication stream is inherently serial (the
  * reference runs one process per source DB — flake.nix:125-152), so
  * each micro-batch plans one partition per file slice; horizontal
  * scale comes from many sources feeding one unioned stream, and from
  * everything downstream being ordinary distributed DataFrames.
  */
class ChangeLogSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-changelog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangeLog.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new ChangeLogTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object ChangeLog {
  /** Envelope schema: the reference's `Change` (main.rs:55-63) plus
    * `seq`, the per-log monotonic sequence (binlog pos analog).
    */
  val schema: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("db", StringType, nullable = false),
    StructField("table", StringType, nullable = false),
    StructField("before", StringType, nullable = true),
    StructField("after", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = false),
    StructField("pkey", StringType, nullable = false),
    StructField("seq", LongType, nullable = false)))

  /** Diagnostic: number of driver-side full-file row-count scans ever
    * performed (specs assert one per sealed segment, not one per
    * trigger).
    */
  val scansPerformed = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Log segments: JSONL envelopes or raw MySQL-framed `.binlog`
    * files ([[Binlog]]) — one directory, one offset space; the
    * lexicographic successor is the rotate target.
    */
  def listLogFiles(dir: String): Seq[java.io.File] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile &&
        (f.getName.endsWith(".jsonl") || f.getName.endsWith(".binlog")))
      .sortBy(_.getName).toSeq
  }

  def isBinlog(path: String): Boolean = path.endsWith(".binlog")

  /** Mirror state of [[syncFromMaster]]: the (filename, pos) resume
    * pair — exactly the reference's SQLite offsets row
    * (reference/src/main.rs:238-255), persisted as a sidecar JSON in
    * the log directory (not a `.binlog`/`.jsonl` suffix, so
    * [[listLogFiles]] never serves it as a segment).
    */
  final case class MasterState(filename: String, pos: Long)

  private def stateFile(dir: String) =
    new java.io.File(dir, "_binlog_master.json")

  def readMasterState(dir: String): Option[MasterState] = {
    val f = stateFile(dir)
    if (!f.isFile) None
    else {
      val n = new ObjectMapper().readTree(f)
      Some(MasterState(n.get("filename").asText, n.get("pos").asLong))
    }
  }

  private def writeMasterState(dir: String, s: MasterState): Unit =
    java.nio.file.Files.write(stateFile(dir).toPath,
      s"""{"filename":"${s.filename}","pos":${s.pos}}""".getBytes("UTF-8"))

  /** LIVE ingest (S1's network half): pull the master's binlog over
    * the wire ([[BinlogClient.fetch]] — handshake, REGISTER_SLAVE,
    * BINLOG_DUMP NON_BLOCK) and mirror the streamed events into local
    * `.binlog` segments in `dir`, one per master file, following
    * rotates until the master has no more. The wire events are
    * byte-identical to file events, so a fully-mirrored segment is
    * byte-equal to the master's file and the existing DSv2 source
    * ([[ChangeLogSource]]) serves it through the SAME decode and
    * (fileIdx, row) offset machinery — the wire client replaces only
    * the directory listing's feed, exactly as [[Binlog]]'s scaladoc
    * promised. The (filename, pos) resume pair persists in a sidecar
    * (`_binlog_master.json`); repeated calls are incremental
    * (each dump starts at the last mirrored event's master-stamped
    * `next_position`).
    *
    * Integration-gated like the Kafka sink
    * ([[graft.streaming.Sink.kafkaSink]]): returns None (and opens no
    * socket) unless a `host:port` master is supplied — by default
    * from `SPARK_GRAFT_BINLOG_MASTER`.
    */
  def syncFromMaster(dir: String,
      master: Option[String] = sys.env.get("SPARK_GRAFT_BINLOG_MASTER"),
      user: String = sys.env.getOrElse("SPARK_GRAFT_BINLOG_USER", "repl"),
      password: String = sys.env.getOrElse("SPARK_GRAFT_BINLOG_PASSWORD", ""),
      serverId: Long = 7777L,
      firstFile: String = "binlog.000001"): Option[MasterState] =
    master.map { hp =>
      val (host, port) = hp.lastIndexOf(':') match {
        case i if i > 0 => (hp.substring(0, i), hp.substring(i + 1).toInt)
        case _ => (hp, 3306)
      }
      new java.io.File(dir).mkdirs()
      var state = readMasterState(dir).getOrElse(MasterState(firstFile, 4L))
      var more = true
      while (more) {
        val f = BinlogClient.fetch(host, port, user, password, serverId,
          state.filename, state.pos)
        if (f.events.nonEmpty) {
          val local = new java.io.File(dir, state.filename + ".binlog")
          val out = new java.io.FileOutputStream(local, true)
          try {
            if (local.length() == 0L) out.write(Binlog.Magic)
            f.events.foreach(out.write)
          } finally out.close()
        }
        state = f.decoded.rotate match {
          // a rotate whose target we just crossed into: resume there
          case Some(r) => MasterState(r.nextFile, math.max(r.pos, 4L))
          case None => MasterState(state.filename, math.max(f.endPos, state.pos))
        }
        more = f.decoded.rotate.isDefined
        writeMasterState(dir, state)
      }
      state
    }

  /** A running master tail: the [[syncFromMaster]] loop on its own
    * daemon thread. `stop()` is graceful (finishes the in-flight
    * sync, then exits); `lastError` surfaces the most recent failed
    * poll (the loop keeps polling through transient master outages —
    * the reference process restarts on error under its supervisor,
    * reference/flake.nix:125-152; here the resume pair makes retry
    * free).
    */
  final class MasterTail private[ChangeLog] (dir: String,
      master: String, user: String, password: String, serverId: Long,
      firstFile: String, pollMillis: Long) {
    @volatile private var running = true
    @volatile var lastError: Option[Throwable] = None
    @volatile var syncs: Long = 0L
    private val thread = new Thread(() => {
      while (running) {
        try {
          syncFromMaster(dir, Some(master), user, password, serverId,
            firstFile)
          syncs += 1
          lastError = None
        } catch { case e: Exception => lastError = Some(e) }
        val deadline = System.nanoTime() + pollMillis * 1000000L
        while (running && System.nanoTime() < deadline) Thread.sleep(10)
      }
    }, s"binlog-master-tail($master)")
    thread.setDaemon(true)
    thread.start()
    def stop(): Unit = { running = false; thread.join(30000) }
  }

  /** Turnkey LIVE ingest: keep mirroring the master into `dir` every
    * `pollMillis` while a streaming query consumes the directory —
    * the complete reference drive loop (connect → dump → decode →
    * stream) as one call next to one `readStream`:
    * {{{
    *   val tail = ChangeLog.tailMaster(dir).get // env-gated
    *   val q = spark.readStream.format("graft-changelog")
    *     .option("path", dir).load() ... .start()
    *   // ... q.stop(); tail.stop()
    * }}}
    * Env-gated like [[syncFromMaster]]: None (no thread, no socket)
    * unless a master is configured.
    */
  def tailMaster(dir: String,
      master: Option[String] = sys.env.get("SPARK_GRAFT_BINLOG_MASTER"),
      user: String = sys.env.getOrElse("SPARK_GRAFT_BINLOG_USER", "repl"),
      password: String = sys.env.getOrElse("SPARK_GRAFT_BINLOG_PASSWORD", ""),
      serverId: Long = 7777L,
      firstFile: String = "binlog.000001",
      pollMillis: Long = 1000L): Option[MasterTail] =
    master.map(hp =>
      new MasterTail(dir, hp, user, password, serverId, firstFile,
        pollMillis))

  /** Row count of one segment — lines for JSONL, decoded row-changes
    * for binlog (events are not rows: a multi-row WRITE_ROWS is
    * several, a TABLE_MAP is none).
    */
  def countFileRows(f: java.io.File): Long =
    if (isBinlog(f.getName))
      Binlog.decodeFile(java.nio.file.Files.readAllBytes(f.toPath))
        .changes.size.toLong
    else {
      val src = scala.io.Source.fromFile(f)
      try src.getLines().count(_.nonEmpty) finally src.close()
    }

  /** One JSON line → InternalRow. Field absence/null → SQL null for
    * before/after; ts is epoch seconds in the log (u32 in the
    * reference, main.rs:285).
    */
  def parseLine(mapper: ObjectMapper, line: String, seq: Long): InternalRow = {
    val node = mapper.readTree(line)
    def str(f: String): UTF8String =
      if (node.hasNonNull(f)) {
        val v = node.get(f)
        // row images are nested JSON objects — keep them as JSON text
        // (the envelope carries rows as JSON strings, SURVEY §1.4)
        UTF8String.fromString(if (v.isTextual) v.asText else v.toString)
      } else null
    InternalRow(
      str("op"), str("db"), str("table"), str("before"), str("after"),
      node.get("ts").asLong * 1000000L, // epoch sec → micros
      if (node.hasNonNull("pkey")) str("pkey") else UTF8String.EMPTY_UTF8,
      seq)
  }
}

/** Offset = (index of current file, rows already consumed in it) —
  * the (filename, pos) pair, totally ordered.
  */
case class ChangeLogOffset(fileIdx: Int, row: Long) extends Offset {
  override def json(): String = s"""{"fileIdx":$fileIdx,"row":$row}"""
}

object ChangeLogOffset {
  def fromJson(s: String): ChangeLogOffset = {
    val n = new ObjectMapper().readTree(s)
    ChangeLogOffset(n.get("fileIdx").asInt, n.get("row").asLong)
  }
}

class ChangeLogTable(path: String) extends Table with SupportsRead {
  require(path != null, "path option is required")
  override def name(): String = s"changelog(`$path`)"
  override def schema(): StructType = ChangeLog.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new ChangeLogScan(path,
        Option(options.get("maxRowsPerTrigger")).map(_.toLong))
    }
}

class ChangeLogScan(path: String, maxRowsPerTrigger: Option[Long]) extends Scan {
  override def readSchema(): StructType = ChangeLog.schema
  override def description(): String = s"ChangeLogScan($path)"

  override def toBatch: Batch = new Batch {
    // seq base = file index in the high bits, exactly as the streaming
    // path plans it — seq is the per-log monotonic position and the
    // LWW tie-break, so a batch read of the same log must yield the
    // same seq values as streaming reads
    override def planInputPartitions(): Array[InputPartition] =
      ChangeLog.listLogFiles(path).zipWithIndex.map { case (f, i) =>
        ChangeLogPartition(f.getAbsolutePath, 0L, Long.MaxValue, i.toLong << 40)
          .asInstanceOf[InputPartition]
      }.toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new ChangeLogReaderFactory
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ChangeLogMicroBatchStream(path, maxRowsPerTrigger)
}

class ChangeLogMicroBatchStream(path: String, maxRowsPerTrigger: Option[Long])
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxRows}

  // driver-side listing; files are immutable once written (log segments)
  private def files = ChangeLog.listLogFiles(path)

  /** Row counts memoized per path, keyed to the size observed at count
    * time: sealed segments are scanned at most once per query lifetime
    * instead of once per file per trigger; a still-growing active
    * segment changes size, is recounted, and REPLACES its entry — so
    * the map holds exactly one entry per segment (an actively-growing
    * file would otherwise add one stale entry per observed size for
    * the life of the query). Driver-side only.
    */
  private val rowCounts =
    scala.collection.mutable.HashMap.empty[String, (Long, Long)]
  private def countRows(f: java.io.File): Long = synchronized {
    val (path, size) = (f.getAbsolutePath, f.length())
    rowCounts.get(path) match {
      case Some((`size`, n)) => n
      case _ =>
        ChangeLog.scansPerformed.incrementAndGet()
        val n = ChangeLog.countFileRows(f)
        rowCounts.update(path, (size, n))
        n
    }
  }

  /** End-of-log snapshot taken when Trigger.AvailableNow starts: the
    * query drains up to here (possibly over several admission-limited
    * micro-batches), then stops — the snapshot-then-stop half of the
    * reference's snapshot-then-stream flow.
    */
  private var availableNowEnd: Option[ChangeLogOffset] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(trueEnd())

  private def trueEnd(): ChangeLogOffset = {
    val fs = files
    if (fs.isEmpty) ChangeLogOffset(0, 0L)
    else ChangeLogOffset(fs.size - 1, countRows(fs.last))
  }

  override def initialOffset(): Offset = ChangeLogOffset(0, 0L)

  override def getDefaultReadLimit: ReadLimit =
    maxRowsPerTrigger.map(ReadLimit.maxRows).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  /** Admission-controlled end offset: advance from `start` by at most
    * the row limit — the reference's page-size bound
    * (--backfill-batch-size, main.rs:42-43) applied to the log.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[ChangeLogOffset]
    val fs = files
    if (fs.isEmpty) return s
    val budget: Long = limit match {
      case m: ReadMaxRows => m.maxRows()
      case _ => Long.MaxValue
    }
    val cap = availableNowEnd.getOrElse(ChangeLogOffset(Int.MaxValue, Long.MaxValue))
    var idx = math.min(s.fileIdx, fs.size - 1)
    var row = if (idx == s.fileIdx) s.row else 0L
    var left = budget
    var done = false
    while (!done) {
      val fileCap = if (idx == cap.fileIdx) cap.row
        else if (idx > cap.fileIdx) 0L else Long.MaxValue
      val n = math.min(countRows(fs(idx)), fileCap)
      val take = math.max(math.min(n - row, left), 0L)
      row += take
      left -= take
      if (left <= 0 || idx >= fs.size - 1 || idx >= cap.fileIdx) done = true
      else if (row >= n) { idx += 1; row = 0L }
    }
    ChangeLogOffset(idx, row)
  }

  override def reportLatestOffset(): Offset = trueEnd()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ChangeLogOffset]
    val e = end.asInstanceOf[ChangeLogOffset]
    val fs = files
    (s.fileIdx to math.min(e.fileIdx, fs.size - 1)).flatMap { i =>
      val from = if (i == s.fileIdx) s.row else 0L
      val until = if (i == e.fileIdx) e.row else Long.MaxValue
      // seq base: file index in the high bits — a monotone log position
      if (until > from)
        Some(ChangeLogPartition(fs(i).getAbsolutePath, from, until,
          i.toLong << 40).asInstanceOf[InputPartition])
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangeLogReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def deserializeOffset(json: String): Offset =
    ChangeLogOffset.fromJson(json)
}

case class ChangeLogPartition(file: String, from: Long, until: Long,
    seqBase: Long) extends InputPartition

class ChangeLogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ChangeLogPartition]
    if (ChangeLog.isBinlog(p.file)) new PartitionReader[InternalRow] {
      // wire-framed segment: decode events → row-changes, slice the
      // same (from, until) row window the offsets planned
      private val it = Binlog
        .decodeFile(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(p.file)))
        .changes.iterator.zipWithIndex
        .filter { case (_, i) => i >= p.from && i < p.until }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) {
          val (rc, i) = it.next()
          current = InternalRow(
            UTF8String.fromString(rc.op), UTF8String.fromString(rc.db),
            UTF8String.fromString(rc.table),
            rc.before.map(UTF8String.fromString).orNull,
            rc.after.map(UTF8String.fromString).orNull,
            rc.tsSec * 1000000L, // binlog header epoch sec → micros
            UTF8String.EMPTY_UTF8, // pkey empty on live changes
            p.seqBase + i)
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    } else new PartitionReader[InternalRow] {
      private val mapper = new ObjectMapper()
      private val src = scala.io.Source.fromFile(p.file)
      private val it = src.getLines().filter(_.nonEmpty).zipWithIndex
        .filter { case (_, i) => i >= p.from && i < p.until }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) {
          val (line, i) = it.next()
          current = ChangeLog.parseLine(mapper, line, p.seqBase + i)
          true
        } else false
      override def get(): InternalRow = current
      override def close(): Unit = src.close()
    }
  }
}
