package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.collection.JavaConverters._

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.cdc.Merge
import graft.streaming.LwwMerge.KeyedChange

/** Materialize a keyed CURRENT-STATE table from the change stream —
  * the reference's end goal (`mysql → cdc-rs → pubsub → CDC-enabled
  * bigquery table`, reference/README.md:11): downstream readers see
  * one row per live key, updated by each micro-batch.
  *
  * Each batch unions the stored winners with the new changes and
  * keeps the per-key LWW winner, INCLUDING tombstones — a remembered
  * Delete is what stops a stale late backfill from resurrecting the
  * row. Read the table through [[read]] + [[graft.cdc.Merge.current]].
  *
  * == Layout: hash-bucketed, versioned, manifest-committed ==
  *
  * The table is partitioned by `bucket = pmod(hash(key), nBuckets)`:
  *
  * {{{
  *   tableDir/manifest.json            bucket → committed version dir
  *   tableDir/b<bucket>/<version>/     parquet winners of one bucket
  *   tableDir/.staging/<version>/      in-flight batch output
  * }}}
  *
  * A micro-batch touches ONLY the buckets its keys hash into: it reads
  * those buckets' committed winners, merges, writes the new winners to
  * a fresh version directory per bucket, then commits by atomically
  * replacing `manifest.json` (write-temp + ATOMIC_MOVE). Untouched
  * buckets are never read, rewritten, or even listed — their files
  * stay byte-identical (StreamingSpec asserts it). At 100 TB this is
  * the difference between a full-table rewrite per trigger and work
  * proportional to the batch's key spread; it is the same
  * copy-on-write + atomic-metadata-swap shape Delta/Iceberg use, built
  * on nothing but parquet and one JSON file.
  *
  * == Crash safety / exactly-once effect ==
  *
  * Nothing committed is ever modified in place:
  *  - crash mid-staging: the manifest still points at the old
  *    versions; the replayed batch writes a fresh (uuid) staging dir.
  *  - crash after manifest commit but before the stream checkpoint
  *    commits: the batch replays against the already-updated buckets —
  *    LWW is idempotent (re-applying the same changes cannot change a
  *    per-key maximum; `seq` is the unique tie-break), so the replay
  *    converges to the identical winners.
  *  - superseded version dirs are deleted only AFTER the manifest
  *    commit; orphaned bucket versions from a crash are swept the next
  *    time their bucket is touched, and stale `.staging` entries are
  *    swept after every successful commit.
  *
  * == Concurrency contract (single writer, snapshot-unsafe GC) ==
  *
  * One maintenance writer at a time — the stream's checkpoint already
  * serializes batches; a second concurrent writer would race manifest
  * commits (each tmp file is uniquely named, so the LAST move wins and
  * the loser's buckets leak until their next touch). Readers get
  * atomic snapshots at manifest-load time. By default GC deletes
  * superseded versions IMMEDIATELY after commit, so a reader that
  * loaded the old manifest and is still mid-scan can lose its files —
  * re-resolve [[read]] per query (cheap), or run with
  * `graceCommits` > 0: each superseded version then survives that many
  * further commits (tracked in the manifest's `retired` list with the
  * generation that retired it), giving concurrent readers a bounded
  * window to finish against their snapshot (StreamingSpec proves a
  * reader's snapshot survives commits inside the window and that
  * expired versions are swept).
  *
  * == File sizes ==
  *
  * Batch writes `repartition` on the bucket id before the partitioned
  * write, so every committed bucket version is exactly ONE parquet
  * file — compaction happens on write, and file count stays equal to
  * the (fixed) bucket count instead of growing with write parallelism.
  * [[compact]] is the corresponding offline maintenance pass for
  * tables written by earlier layouts (or after lowering nBuckets
  * pressure): it rewrites every committed bucket into a fresh
  * single-file version under the same commit protocol.
  */
object StateTable {

  val DefaultBuckets = 64

  /** One micro-batch application: previous winners ⊎ batch → new
    * winners (tombstones kept).
    */
  def applyBatch(existing: DataFrame, batch: DataFrame): DataFrame =
    Merge.winners(existing.unionByName(batch))

  // ---------------------------------------------------------- manifest

  /** A superseded bucket version kept alive for grace-period readers:
    * retired by commit generation `gen`.
    */
  private[graft] final case class Retired(bucket: Int, version: String, gen: Long)

  /** Full committed metadata: layout bucket count, monotone commit
    * generation, live bucket → version map, the retired versions
    * still inside their grace window, and the table's committed grace
    * POLICY — stored (like nBuckets) so one caller using a smaller
    * per-call value cannot silently expire versions other callers
    * promised to their readers.
    */
  private[graft] final case class Manifest(nBuckets: Option[Int], gen: Long,
      buckets: Map[Int, String], retired: Seq[Retired], grace: Int = 0)

  /** (bucket count, bucket → committed version-directory name).
    * Absent file = empty table. The bucket count is part of the
    * committed layout — later maintenance runs must hash with the SAME
    * count or keys would be routed to the wrong buckets, so [[
    * applyBatchBucketed]] always prefers the stored value.
    */
  private[graft] def loadManifest(tableDir: String): (Option[Int], Map[Int, String]) = {
    val m = loadManifestFull(tableDir)
    (m.nBuckets, m.buckets)
  }

  private[graft] def loadManifestFull(tableDir: String): Manifest = {
    val p = Paths.get(tableDir, "manifest.json")
    if (!Files.exists(p)) Manifest(None, 0L, Map.empty, Seq.empty)
    else {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Files.readString(p))
      val retired = Option(node.get("retired")).toSeq
        .flatMap(_.elements().asScala)
        .map(r => Retired(r.get("b").asInt, r.get("v").asText, r.get("gen").asLong))
      Manifest(
        Some(node.get("nBuckets").asInt),
        Option(node.get("gen")).map(_.asLong).getOrElse(0L),
        node.get("buckets").properties().asScala
          .map(e => e.getKey.toInt -> e.getValue.asText).toMap,
        retired,
        Option(node.get("grace")).map(_.asInt).getOrElse(0))
    }
  }

  private def commitManifest(tableDir: String, nBuckets: Int, gen: Long,
      m: Map[Int, String], retired: Seq[Retired], grace: Int): Unit = {
    val entries = m.toSeq.sortBy(_._1)
      .map { case (b, v) => s""""$b": "$v"""" }.mkString(", ")
    val retEntries = retired.sortBy(r => (r.gen, r.bucket))
      .map(r => s"""{"b": ${r.bucket}, "v": "${r.version}", "gen": ${r.gen}}""")
      .mkString(", ")
    // unique tmp name: two racing writers must not interleave partial
    // writes into one tmp file (the later MOVE still wins the commit)
    val tmp = Paths.get(tableDir,
      s".manifest.tmp.${java.util.UUID.randomUUID().toString.take(8)}")
    Files.writeString(tmp,
      s"""{"nBuckets": $nBuckets, "gen": $gen, "grace": $grace, "buckets": {$entries}, "retired": [$retEntries]}""")
    Files.move(tmp, Paths.get(tableDir, "manifest.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  // both helpers CLOSE their directory streams — this code runs once
  // per micro-batch commit for the life of a query, and unclosed
  // Files.walk/list handles only surface as fd exhaustion much later
  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
      finally s.close()
    }

  private def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toVector finally s.close()
  }

  /** Operational snapshot of a committed table: one row per LIVE
    * bucket — (bucket, version, n_files, bytes) straight from the
    * filesystem, no data read, no Spark job — with the manifest
    * header (gen, n_buckets, grace, n_retired) as constant columns.
    * The numbers an operator checks before/after compact, a
    * retraction, or grace-policy tuning: steady-state n_files is 1
    * per bucket (commitPartitioned compacts on write), so anything
    * larger names the bucket that needs [[compact]]; n_retired > 0
    * says grace-window versions are still holding disk.
    */
  def describe(spark: SparkSession, tableDir: String): DataFrame = {
    import spark.implicits._
    val m = loadManifestFull(tableDir)
    val rows = m.buckets.toSeq.sortBy(_._1).map { case (b, v) =>
      val d = Paths.get(tableDir, s"b$b", v)
      val files =
        if (Files.isDirectory(d)) listDir(d).filter { p =>
          val n = p.getFileName.toString
          Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith(".")
        } else Seq.empty
      (b, v, files.size.toLong, files.map(Files.size(_)).sum)
    }
    rows.toDF("bucket", "version", "n_files", "bytes")
      .withColumn("gen", lit(m.gen))
      .withColumn("n_buckets", lit(m.nBuckets.getOrElse(0)))
      .withColumn("grace", lit(m.grace))
      .withColumn("n_retired", lit(m.retired.size))
  }

  /** The committed winners table (all buckets). */
  def read(spark: SparkSession, tableDir: String): DataFrame = {
    val (_, m) = loadManifest(tableDir)
    require(m.nonEmpty, s"no committed state at $tableDir")
    val paths = m.toSeq.sortBy(_._1)
      .map { case (b, v) => s"$tableDir/b$b/$v" }
    spark.read.parquet(paths: _*)
  }

  // ------------------------------------------------------- maintenance

  /** Apply one micro-batch to the bucketed table (the foreachBatch
    * body; public for batch-mode reuse and tests).
    *
    * `graceCommits` > 0 keeps each superseded bucket version on disk
    * for that many further commits before deletion, so a reader that
    * resolved [[read]] against a recent manifest can finish its scan
    * across concurrent commits — the multi-reader extension of the
    * single-writer contract. 0 (default) deletes superseded versions
    * immediately after the manifest swap (reader must re-resolve).
    */
  def applyBatchBucketed(batch: DataFrame, tableDir: String, batchId: Long,
      nBucketsIfNew: Int, graceCommits: Int = 0): Unit = {
    val spark = batch.sparkSession
    Files.createDirectories(Paths.get(tableDir))
    val st = loadManifestFull(tableDir)
    val nBuckets = st.nBuckets.getOrElse(nBucketsIfNew)
    val bucket = pmod(hash(col("key")), lit(nBuckets))
    val bdf = batch.persist()
    try {
      val touched = bdf.select(bucket.cast("int").as("b"))
        .distinct().collect().map(_.getInt(0)).toSeq.sorted
      if (touched.isEmpty) return
      val existingPaths = touched.flatMap(b =>
        st.buckets.get(b).map(v => s"$tableDir/b$b/$v"))
      val existing =
        if (existingPaths.nonEmpty) spark.read.parquet(existingPaths: _*)
        else bdf.limit(0)

      // fresh uuid version per attempt: a replayed batch never writes
      // into a directory it is reading from
      val version = s"v${batchId}_${java.util.UUID.randomUUID().toString.take(8)}"
      commitPartitioned(tableDir, applyBatch(existing, bdf).withColumn("b", bucket),
        nBuckets, st, version, graceCommits)
    } finally bdf.unpersist()
  }

  /** The shared scaffold for the source-keyed aggregate stores
    * ([[CardStore]], [[HistStore]], [[TopKStore]]): load the
    * manifest, bucket the delta by `hash(source)`, read ONLY the
    * touched buckets, hand (existing, delta-with-b) to the
    * store-specific merge, and commit the merged rows through
    * [[commitPartitioned]]. The merge returns its frame plus a
    * cleanup hook (run after the commit — for any persists the merge
    * plan holds). `emptyState` supplies the store's 0-row schema
    * frame when a touched bucket has no committed version yet.
    *
    * Why one scaffold: the protocol (touched-bucket pruning, staging
    * version naming, the read-before-write rule, GC interaction) is
    * load-bearing for every store at once — three hand-rolled copies
    * of it is how a protocol fix misses a store.
    */
  private[streaming] def mergeBucketedBySource(deltaNoB: DataFrame,
      tableDir: String, nBucketsIfNew: Int, emptyState: => DataFrame,
      batchId: Long, graceCommits: Int)(
      merge: (DataFrame, DataFrame) => (DataFrame, () => Unit)): Unit = {
    val spark = deltaNoB.sparkSession
    Files.createDirectories(Paths.get(tableDir))
    val st = loadManifestFull(tableDir)
    val nBuckets = st.nBuckets.getOrElse(nBucketsIfNew)
    val bucket = pmod(hash(col("source")), lit(nBuckets)).cast("int")
    val delta = deltaNoB.withColumn("b", bucket).persist()
    try {
      val touched = delta.select(col("b")).distinct()
        .collect().map(_.getInt(0)).toSeq.sorted
      if (touched.isEmpty) return
      val existingPaths = touched.flatMap(b =>
        st.buckets.get(b).map(v => s"$tableDir/b$b/$v"))
      // mergeSchema: bucket versions can straddle a store-schema
      // upgrade (some rewritten, some not); the default single-donor
      // schema would silently DROP the new column from every bucket
      // in the read — and the next commit would persist the loss
      val existing =
        if (existingPaths.nonEmpty)
          spark.read.option("mergeSchema", "true").parquet(existingPaths: _*)
        else emptyState
      val (merged, cleanup) = merge(existing, delta)
      // fresh uuid version per attempt: a replayed batch never writes
      // into a directory it is reading from (the protocol rule every
      // store must follow — owned here, not copy-pasted per store)
      val version =
        s"v${batchId}_${java.util.UUID.randomUUID().toString.take(8)}"
      try commitPartitioned(tableDir, merged.withColumn("b", bucket),
        nBuckets, st, version, graceCommits)
      finally cleanup()
    } finally delta.unpersist()
  }

  /** Stage `withB` (winners + int bucket column `b`), move each bucket
    * dir into place, commit the manifest, then GC: superseded versions
    * past their grace window, crashed-attempt orphans, and stale
    * staging entries. (private[streaming]: [[DedupStore]] commits its
    * fingerprint buckets through the same protocol.)
    *
    * `emptied` names touched buckets whose new content is EMPTY — a
    * partitioned write produces no directory for them, so without the
    * explicit list the manifest would keep serving their superseded
    * versions. They leave the bucket map (absent = empty) and their
    * old versions retire under the same grace policy
    * ([[DedupStore.forget]] / [[NearDupStore.forget]] are the
    * callers).
    */
  private[streaming] def commitPartitioned(tableDir: String, withB: DataFrame,
      nBuckets: Int, st: Manifest, version: String,
      graceCommits: Int, emptied: Seq[Int] = Seq.empty): Unit = {
    val staging = s"$tableDir/.staging/$version"
    // one exchange keyed on the bucket id → each bucket lands wholly in
    // one task → exactly ONE parquet file per committed bucket version:
    // compaction happens on write, and the table's file count stays
    // pinned at nBuckets instead of growing with write parallelism
    withB.repartition(col("b"))
      .write.partitionBy("b").parquet(staging)

    val written = listDir(Paths.get(staging))
      .filter(p => p.getFileName.toString.startsWith("b="))
      .map(p => p.getFileName.toString.stripPrefix("b=").toInt -> p)
    val moved0 = written.map { case (b, src) =>
      val dst = Paths.get(tableDir, s"b$b", version)
      Files.createDirectories(dst.getParent)
      Files.move(src, dst)
      b -> version
    }.toMap
    // a retraction that empties EVERY touched bucket stages nothing at
    // all — commit one empty (schema-bearing) version so a table whose
    // last key was forgotten stays readable instead of reverting to
    // "no committed state"
    val moved = if (moved0.nonEmpty || emptied.isEmpty) moved0 else {
      val b = emptied.head
      val dst = Paths.get(tableDir, s"b$b", version)
      Files.createDirectories(dst.getParent)
      withB.drop("b").limit(0).coalesce(1).write.parquet(dst.toString)
      Map(b -> version)
    }

    // the versions this commit supersedes enter the retired set at the
    // new generation; entries whose grace window has elapsed leave it
    // and their directories are deleted AFTER the manifest swap. The
    // effective grace is the LARGER of the call's value and the
    // table's committed policy — a default-grace caller (e.g. an
    // operator running compact) can never expire versions a previous
    // maintainer promised to concurrent readers; an explicit larger
    // value upgrades the stored policy.
    val gen = st.gen + 1
    val grace = math.max(graceCommits, st.grace)
    val removed = emptied.filterNot(moved.contains)
    val newlyRetired = (moved.keys.toSeq ++ removed).sorted.distinct
      .flatMap(b => st.buckets.get(b).map(v => Retired(b, v, gen)))
    val (kept, expired) = (st.retired ++ newlyRetired)
      .partition(r => gen - r.gen < grace)
    commitManifest(tableDir, nBuckets, gen,
      st.buckets ++ moved -- removed, kept, grace)

    // post-commit GC: a touched bucket keeps its committed version and
    // any still-graced retired versions; everything else there is a
    // crashed-attempt orphan. Expired retirees (possibly in untouched
    // buckets) are deleted by path. Then drop the whole staging area —
    // nothing in-flight can live there under the single-writer contract.
    val keptByBucket = kept.groupBy(_.bucket)
    moved.foreach { case (b, v) =>
      val keep = keptByBucket.getOrElse(b, Seq.empty).map(_.version).toSet + v
      listDir(Paths.get(tableDir, s"b$b"))
        .filter(p => !keep.contains(p.getFileName.toString))
        .foreach(deleteRecursively)
    }
    removed.foreach { b =>
      val keep = keptByBucket.getOrElse(b, Seq.empty).map(_.version).toSet
      listDir(Paths.get(tableDir, s"b$b"))
        .filter(p => !keep.contains(p.getFileName.toString))
        .foreach(deleteRecursively)
    }
    expired.foreach(r =>
      deleteRecursively(Paths.get(tableDir, s"b${r.bucket}", r.version)))
    deleteRecursively(Paths.get(tableDir, ".staging"))
  }

  /** Remove `del`'s keys (single column `keyCol`) from a committed
    * key-set table: reads ONLY the buckets the keys hash into,
    * anti-joins, recommits — buckets the retraction empties leave the
    * manifest. The shared takedown tail of [[DedupStore.forget]] and
    * [[NearDupStore.forget]]; cost ∝ touched buckets, never ∝ table.
    */
  private[streaming] def retractKeys(del: DataFrame, keyCol: String,
      tableDir: String, graceCommits: Int): Unit = {
    val spark = del.sparkSession
    val st = loadManifestFull(tableDir)
    if (st.nBuckets.isEmpty) return // nothing committed: no-op
    val nBuckets = st.nBuckets.get
    val bucket = pmod(hash(col(keyCol)), lit(nBuckets)).cast("int")
    val d = del.select(col(keyCol)).distinct()
      .withColumn("b", bucket).persist()
    try {
      val touched = d.select(col("b")).distinct()
        .collect().map(_.getInt(0)).toSeq.sorted
        .filter(st.buckets.contains)
      if (touched.isEmpty) return
      val existing = spark.read.parquet(
        touched.map(b => s"$tableDir/b$b/${st.buckets(b)}"): _*)
      val kept = existing.join(d.select(col(keyCol)), Seq(keyCol), "left_anti")
        .withColumn("b", bucket).persist()
      try {
        val keptBuckets = kept.select(col("b")).distinct()
          .collect().map(_.getInt(0)).toSet
        commitPartitioned(tableDir, kept, nBuckets, st,
          s"f_${java.util.UUID.randomUUID().toString.take(8)}",
          graceCommits, emptied = touched.filterNot(keptBuckets))
      } finally kept.unpersist()
    } finally d.unpersist()
  }

  /** Offline compaction: rewrite EVERY committed bucket into a fresh
    * single-file version under the same staged-move + manifest-commit
    * protocol (content unchanged — winners are carried verbatim). For
    * tables written by earlier multi-file layouts or imported data;
    * steady-state batch writes are already one file per version.
    */
  def compact(spark: SparkSession, tableDir: String,
      graceCommits: Int = 0): Unit = {
    val st = loadManifestFull(tableDir)
    require(st.buckets.nonEmpty, s"no committed state at $tableDir")
    val union = st.buckets.toSeq.sortBy(_._1).map { case (b, v) =>
      spark.read.parquet(s"$tableDir/b$b/$v").withColumn("b", lit(b))
    }.reduce(_.unionByName(_))
    val version = s"c_${java.util.UUID.randomUUID().toString.take(8)}"
    commitPartitioned(tableDir, union, st.nBuckets.get, st, version,
      graceCommits)
  }

  /** Run the maintenance query. `tableDir` holds the bucketed winners;
    * `checkpointDir` the stream's offset/commit log. `graceCommits`:
    * see [[applyBatchBucketed]].
    */
  def maintain(changes: Dataset[KeyedChange], tableDir: String,
      checkpointDir: String, nBuckets: Int = DefaultBuckets,
      graceCommits: Int = 0): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .foreachBatch { (batch: Dataset[KeyedChange], batchId: Long) =>
        applyBatchBucketed(batch.toDF(), tableDir, batchId, nBuckets,
          graceCommits)
      }
      .start()
}
