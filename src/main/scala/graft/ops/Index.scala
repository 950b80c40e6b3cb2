package graft.ops

import scala.collection.JavaConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted ANN index — the build/search split that turns the
  * oracle-proven in-plan ANN queries ([[Similarity.ivfTopKTrained]],
  * [[Pq.ivfPqTopK]]) into the shape a 100 TB deployment actually runs:
  * train ONCE, write the index as bucketed tables, serve MANY searches
  * that read the artifact with no training stage at all.
  *
  * == Artifact layout (four tables under one `name` prefix) ==
  *
  *  - `<name>_cents`     (cl, cent, cnrm): trained IVF centroids
  *    (deterministic integer-exact k-means, [[Similarity.kmeans]]) —
  *    nlist rows, broadcast at search time.
  *  - `<name>_codebooks` (m, cl, cent): PQ subspace codebooks
  *    ([[Pq.kmeansL2All]]) — m × ksub rows, broadcast at search time.
  *  - `<name>_postings`  (cl, id): the inverted file — every corpus
  *    vector posted to its `massign` nearest lists, hash-BUCKETED BY
  *    `cl` ([[Bucketing]]): the probe join reads only matching
  *    buckets and never shuffles the posting side.
  *  - `<name>_codes`     (id, m, cl): 16-byte-per-vector PQ codes,
  *    bucketed by `id`: the ADC join shuffles only the (tiny)
  *    candidate pairs, never the codes.
  *
  * plus `<name>_meta` (massign, m, ksub, nBuckets) so search/append
  * don't re-specify build parameters.
  *
  * == Why this matters at scale ==
  *
  * The in-plan queries retrain k-means inside every execution — correct
  * for the DuckDB oracle gate, but it pays ~6 Lloyd-round checkpoint
  * barriers per query and re-reads the whole corpus. Here training cost
  * is paid once at [[build]]; [[search]] is probe (broadcast cents) →
  * candidate pairs (bucketed postings, no exchange on the corpus side)
  * → ADC (bucketed codes ⨝ broadcast LUT → partial-agg LONG sum) →
  * exact rerank (≤ rerank × |queries| rows). The only corpus-wide work
  * left in a search is the bucketed-scan fraction the probes touch:
  * ~massign·nprobe/nlist of the postings.
  *
  * Search output is bit-identical to [[Pq.ivfPqTopK]] at the same
  * parameters (the artifact stores exactly the quantized values the
  * in-plan query computes), so `q_sim_index_search` shares the
  * `q_sim_ivfpq` oracle.
  *
  * [[append]] is the maintenance delta: assign + encode ONLY the new
  * vectors at the FIXED trained centroids/codebooks and append them to
  * the bucketed tables — committed files are never rewritten
  * (IndexSpec proves byte-identity of untouched files, and that
  * append-then-search equals encode-from-scratch at the same
  * centroids). Retraining cadence stays a policy decision above the
  * engine, as in production IVF/PQ systems.
  */
object Index {

  /** Build parameters persisted with the artifact. */
  final case class Meta(massign: Int, m: Int, ksub: Int, nBuckets: Int)

  private def part(name: String, p: String) = s"${name}_$p"

  /** The index's own directory: always namespaced by `name`, so two
    * indexes sharing a baseDir can never overwrite each other's files.
    */
  private def indexDir(baseDir: Option[String], name: String): String =
    s"${baseDir.getOrElse(s"${sys.props("java.io.tmpdir")}/graft_index")}/$name"

  // ------------------------------------------------- filesystem helpers

  private def listDir(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    val s = java.nio.file.Files.list(p)
    try s.iterator().asScala.toVector finally s.close()
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.delete(f))
      finally s.close()
    }

  /** Each part's committed metadata lives in ONE file
    * `<indexDir>/<part>.current`, replaced by atomic tmp-write + move —
    * the part's single commit point (the [[graft.streaming.StateTable]]
    * manifest shape): the CURRENT data directory, a monotone commit
    * generation, the retired directories still inside their grace
    * window, and the committed grace policy. Every maintenance path
    * ([[build]], [[appendCommitted]], [[compact]]) moves through it, so
    * [[register]] resolves the right directory across sessions AND
    * across crashes — a maintenance run that dies before sweeping old
    * directories leaves the state file authoritative, and the next
    * commit sweeps every non-current, non-graced sibling.
    *
    * Legacy content (a bare directory name from earlier layouts) is
    * read as generation 0 with no retired entries.
    */
  private[graft] final case class PartState(current: String, gen: Long,
      retired: Seq[(String, Long)], grace: Int)

  private[graft] def loadPart(dir: String, p: String): PartState = {
    val f = java.nio.file.Paths.get(dir, s"$p.current")
    if (!java.nio.file.Files.exists(f)) PartState(p, 0L, Seq.empty, 0)
    else {
      val s = java.nio.file.Files.readString(f).trim
      if (!s.startsWith("{")) PartState(s, 0L, Seq.empty, 0)
      else {
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
        val retired = Option(node.get("retired")).toSeq
          .flatMap(_.elements().asScala)
          .map(r => (r.get("d").asText, r.get("gen").asLong))
        PartState(node.get("current").asText,
          Option(node.get("gen")).map(_.asLong).getOrElse(0L),
          retired,
          Option(node.get("grace")).map(_.asInt).getOrElse(0))
      }
    }
  }

  private def writePartState(dir: String, p: String, st: PartState): Unit = {
    val retired = st.retired
      .map { case (d, g) => s"""{"d": "$d", "gen": $g}""" }.mkString(", ")
    val tmp = java.nio.file.Paths.get(dir,
      s".$p.current.tmp.${java.util.UUID.randomUUID().toString.take(8)}")
    java.nio.file.Files.writeString(tmp,
      s"""{"current": "${st.current}", "gen": ${st.gen}, "grace": ${st.grace}, "retired": [$retired]}""")
    java.nio.file.Files.move(tmp, java.nio.file.Paths.get(dir, s"$p.current"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def readPointer(dir: String, p: String): String =
    loadPart(dir, p).current

  /** A MANIFEST generation directory holds no data files at all — just
    * `_manifest.json` naming its constituent SEGMENT directories (each
    * a bucketed-parquet dir: the original build dir, a compact output,
    * or one committed delta). This is the object-store-safe commit
    * shape ([[appendCommitted]]'s `manifestCommit = true`): a commit
    * writes ONE small JSON file instead of a hard-link farm, which on
    * S3-style stores (no links, renames are copies) is the only
    * O(1)-data option — exactly the Delta/Iceberg snapshot shape.
    */
  private val ManifestFile = "_manifest.json"

  private def hasManifest(dir: String, gen: String): Boolean =
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, gen, ManifestFile))

  /** The data directories a generation resolves to: itself for a plain
    * directory, its manifest's segment list otherwise (manifests list
    * segments only — chains are flattened at commit time, never nested).
    */
  private[graft] def segmentsOf(dir: String, gen: String): Seq[String] =
    if (!hasManifest(dir, gen)) Seq(gen)
    else {
      val s = java.nio.file.Files.readString(
        java.nio.file.Paths.get(dir, gen, ManifestFile))
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
        .get("segments").elements().asScala.map(_.asText).toVector
    }

  private def writeManifest(dir: String, gen: String,
      segments: Seq[String]): Unit = {
    val genDir = java.nio.file.Paths.get(dir, gen)
    java.nio.file.Files.createDirectories(genDir)
    java.nio.file.Files.writeString(genDir.resolve(ManifestFile),
      s"""{"segments": [${segments.map(s => s""""$s"""").mkString(", ")}]}""")
  }

  /** Commit `newDir` as part `p`'s current directory: one atomic state
    * swap, then GC. The previous current enters the retired list at
    * the new generation; entries whose grace window elapsed leave it
    * and their directories are deleted AFTER the swap — a reader that
    * resolved a recent state file keeps its files for `grace` further
    * commits (the [[graft.streaming.StateTable]] reader-snapshot
    * contract). The effective grace is the larger of the call's value
    * and the committed policy, so a default-grace maintenance call can
    * never expire versions a previous maintainer promised.
    */
  private def commitPart(dir: String, p: String, newDir: String,
      graceCommits: Int): Unit = {
    val st = loadPart(dir, p)
    val gen = st.gen + 1
    val grace = math.max(graceCommits, st.grace)
    val kept = (st.retired :+ (st.current, gen))
      .filter { case (_, g) => gen - g < grace }
    writePartState(dir, p, PartState(newDir, gen, kept, grace))
    // expired generations are reclaimed by the sweep below — which,
    // unlike a direct delete, keeps any directory a LIVE manifest
    // still references as a segment (an expired generation's data can
    // outlive it when later manifests share it)
    sweepStale(dir, p)
  }

  /** The id column is CAST TO LONG at the artifact boundary (advice
    * r13): [[delete]]'s touched-bucket digest hashes the del ids as
    * long, and Spark's Murmur3 hashes IntegerType and LongType
    * DIFFERENTLY — an int-typed source id would put the digest in the
    * wrong hash family and deleted rows could silently survive in
    * "kept" files. One cast here makes every bucketed part uniformly
    * long-keyed (the [[TextIndex.tokTf]] convention), so bucketBy and
    * the digest always agree.
    */
  private[graft] def baseOf(embs: DataFrame, idCol: String, vecCol: String): DataFrame =
    Caching.cachedOnce(
      embs.select(col(idCol).cast("long").as("id"),
          Vectors.toDouble(col(vecCol)).as("v"))
        .withColumn("nrm", Vectors.norm(col("v"))))

  /** Train + encode + persist. One corpus-wide training pass (IVF
    * k-means + PQ codebooks), one assignment pass, then the bucketed
    * writes — the pay-once side of the split.
    */
  def build(spark: SparkSession, embs: DataFrame, idCol: String,
      vecCol: String, seedCol: String, name: String,
      itersIvf: Int = 4, massign: Int = 2, m: Int = 16, ksub: Int = 32,
      itersPq: Int = 2, nBuckets: Int = 8,
      baseDir: Option[String] = None): Unit = {
    ArtifactFiles.requireArtifactName(name)
    require(64 % m == 0, "subspaces must divide the dimension")
    val subDim = 64 / m
    import spark.implicits._

    val base = baseOf(embs, idCol, vecCol)
    val cents = Similarity.withCNorm(
      Similarity.kmeans(embs, idCol, vecCol, seedCol, itersIvf))
    val postings = Similarity.assignToNearest(base, cents, massign)
      .select(col("cl"), col("id"))

    val tall = Pq.tallOf(base, "v", m, subDim)
    val cb = Pq.kmeansL2All(tall, ksub, itersPq, subDim)
    val codes = Pq.assignL2All(tall, cb)

    // SQ tier: per-dim ranges + 1-byte codes — the 4×-memory serving
    // option next to PQ's 16× and flat's none, from the same artifact
    val sqRanges = Sq.rangesTall(base)

    // BQ tier: one sign-packed long per vector (32×) — the coarsest
    // serving option, an 8-byte full sweep instead of a probe
    val bqCodes = base.select(col("id"), Bq.packCol("v", 64).as("code"))

    val dir = indexDir(baseDir, name)
    def loc(p: String) = s"$dir/$p"
    // trained parameters first (tiny tables; training itself already
    // ran eagerly through the kmeans collects) — the three writes are
    // independent (distinct tables/dirs), land them concurrently
    // (r18: they were sequential, three ~0.3 s scheduling latencies
    // in a row on every build-bearing gate)
    Par.jobs(Seq(
      () => cents.write.mode("overwrite").format("parquet")
        .option("path", loc("cents")).saveAsTable(part(name, "cents")),
      () => cb.write.mode("overwrite").format("parquet")
        .option("path", loc("codebooks")).saveAsTable(part(name, "codebooks")),
      () => sqRanges.write.mode("overwrite").format("parquet")
        .option("path", loc("sq_ranges")).saveAsTable(part(name, "sq_ranges"))))
    // ... then encode from the WRITTEN ranges (64 rows — re-reading
    // them beats re-aggregating the corpus; micros are integral
    // doubles, so the parquet round trip is exact) and land the four
    // encoded parts CONCURRENTLY: each bucketed write is only
    // nBuckets tasks wide, the four are independent (distinct tables,
    // distinct dirs, shared inputs read-only), and the shared `base`
    // cache materializes once under the block manager's per-partition
    // locks whichever job touches a partition first.
    val sqCodes = base.join(broadcast(
        Sq.collapseRanges(spark.table(part(name, "sq_ranges")))))
      .select(col("id"), Sq.codeCol(64, clamp = false).cast("array<int>")
        .as("code"))
    Par.jobs(Seq(
      () => Bucketing.writeBucketed(postings, part(name, "postings"), "cl",
        nBuckets, Some(loc("postings"))),
      () => Bucketing.writeBucketed(codes, part(name, "codes"), "id",
        nBuckets, Some(loc("codes"))),
      () => Bucketing.writeBucketed(sqCodes, part(name, "sq_codes"), "id",
        nBuckets, Some(loc("sq_codes"))),
      () => Bucketing.writeBucketed(bqCodes, part(name, "bq_codes"), "id",
        nBuckets, Some(loc("bq_codes")))))
    Seq((massign, m, ksub, nBuckets))
      .toDF("massign", "m", "ksub", "nBuckets")
      .write.mode("overwrite").format("parquet")
      .option("path", loc("meta")).saveAsTable(part(name, "meta"))
    // a rebuild re-establishes the canonical layout: reset every
    // part's state (an earlier compact/append may have moved one
    // aside) and sweep superseded generation directories. A rebuild is
    // a NEW index — it does not extend grace promises of the one it
    // replaces (retrain cadence is an offline, coordinated act).
    for (p <- Parts) {
      writePartState(dir, p, PartState(p, 0L, Seq.empty, 0))
      sweepStale(dir, p)
    }
  }

  private val Parts =
    Seq("cents", "codebooks", "sq_ranges", "postings", "codes", "sq_codes",
      "bq_codes", "meta")
  /** The bucketed (key-clustered) parts and their bucket keys. */
  /** Bucket id of a bucketed-writer data file — delegated to the one
    * shared copy of the file contract ([[ArtifactFiles.bucketIdOf]]).
    */
  private[ops] def bucketIdOf(fileName: String): Option[Int] =
    ArtifactFiles.bucketIdOf(fileName)

  private val BucketedParts =
    Seq("postings" -> "cl", "codes" -> "id", "sq_codes" -> "id",
      "bq_codes" -> "id")

  /** Delete every sibling directory of part `p` that is neither its
    * current state target nor a still-graced retiree (superseded
    * generations past their window, crashed-attempt leftovers), plus
    * any crashed staging entries for the part (single-writer contract:
    * nothing of `p`'s can be legitimately in flight during a commit).
    */
  private def sweepStale(dir: String, p: String): Unit = {
    val st = loadPart(dir, p)
    val gens = st.retired.map(_._1) :+ st.current
    // a manifest generation keeps every segment it references alive —
    // including plain directories of generations that already expired
    val keep = (gens ++ gens.flatMap(segmentsOf(dir, _))).toSet
    listDir(java.nio.file.Paths.get(dir))
      .filter(d => java.nio.file.Files.isDirectory(d) && {
        val n = d.getFileName.toString
        (n == p || n.startsWith(s"${p}_")) && !keep.contains(n)
      })
      .foreach(deleteRecursively)
    val staging = java.nio.file.Paths.get(dir, ".staging")
    if (java.nio.file.Files.exists(staging))
      listDir(staging)
        .filter(_.getFileName.toString.startsWith(s"${p}_"))
        .foreach(deleteRecursively)
  }

  private def readMeta(spark: SparkSession, name: String): Meta = {
    val r = spark.table(part(name, "meta")).collect()(0)
    Meta(r.getAs[Int]("massign"), r.getAs[Int]("m"), r.getAs[Int]("ksub"),
      r.getAs[Int]("nBuckets"))
  }

  /** Whether `name` is already attached in this session's catalog. */
  def exists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(part(name, "meta"))

  /** Re-attach an index BUILT BY A PREVIOUS SESSION from its files:
    * recreates the catalog entries (including the bucketing spec —
    * without it the zero-exchange join layout would be lost) over the
    * existing locations, resolved through the per-part pointer files
    * (so compacted parts are found, and a crashed compact cannot
    * strand the index). The bucket count comes from the persisted
    * meta table — a caller-supplied value could silently declare a
    * false bucket spec and drop join candidates. No data is read or
    * written beyond metadata. This is what makes the artifact an
    * artifact: build once, serve from any number of later sessions.
    */
  def register(spark: SparkSession, name: String, baseDir: String): Unit = {
    ArtifactFiles.requireArtifactName(name)
    val dir = s"$baseDir/$name"
    def loc(p: String): String = s"$dir/${readPointer(dir, p)}"
    for (p <- Seq("cents", "codebooks", "sq_ranges", "meta")) {
      spark.sql(
        s"DROP TABLE IF EXISTS ${ArtifactFiles.ident(part(name, p))}")
      spark.sql(
        s"""CREATE TABLE ${ArtifactFiles.ident(part(name, p))} USING parquet
           |LOCATION '${ArtifactFiles.sqlLit(loc(p))}'""".stripMargin)
    }
    val nBuckets = readMeta(spark, name).nBuckets
    for ((p, key) <- BucketedParts) {
      val cur = readPointer(dir, p)
      if (hasManifest(dir, cur))
        attachView(spark, name, p, dir, segmentsOf(dir, cur))
      else attachBucketed(spark, name, p, key, nBuckets, s"$dir/$cur")
    }
  }

  /** (postings, codes, sq_codes, bq_codes) of `embs` encoded at the
    * STORED centroids, codebooks and ranges — the no-training encode
    * pass shared by [[append]] and the rebuild-equivalence spec. Four
    * zero-shuffle broadcast-assign maps; nothing here ever retrains.
    * SQ codes CLAMP to [0, 255]: new vectors may fall outside the
    * stored per-dim ranges (the fixed-parameters analog of assigning
    * to the fixed centroids). BQ sign codes have no trained
    * parameters at all — encode is the same pack as build.
    */
  def encode(spark: SparkSession, name: String, embs: DataFrame,
      idCol: String, vecCol: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val meta = readMeta(spark, name)
    val subDim = 64 / meta.m
    val base = baseOf(embs, idCol, vecCol)
    val postings = Similarity.assignToNearest(base,
        spark.table(part(name, "cents")), meta.massign)
      .select(col("cl"), col("id"))
    val codes = Pq.assignL2All(
      Pq.tallOf(base, "v", meta.m, subDim),
      spark.table(part(name, "codebooks")))
    val sqCodes = base.join(broadcast(
        Sq.collapseRanges(spark.table(part(name, "sq_ranges")))))
      .select(col("id"), Sq.codeCol(64, clamp = true).cast("array<int>")
        .as("code"))
    val bqCodes = base.select(col("id"), Bq.packCol("v", 64).as("code"))
    (postings, codes, sqCodes, bqCodes)
  }

  /** IN-PLACE incremental append — the spec-only fast path, NOT a
    * serving write path: [[encode]] ONLY `newEmbs` (no retraining, no
    * Lloyd rounds) and drip the delta files straight into the live
    * bucketed postings/codes tables. Committed files are untouched
    * and cost stays ∝ |delta| (IndexSpec proves byte-identity), but
    * the files become visible ONE BY ONE and a crash mid-append
    * leaves a half-landed delta in the served index. Every public
    * maintenance path therefore goes through [[appendCommitted]]
    * (atomic generation swap; same results, spec-proven equal) —
    * this method exists only so the specs can prove that equality
    * and exercise compaction over dripped files.
    */
  private[graft] def appendInPlace(spark: SparkSession, name: String,
      newEmbs: DataFrame, idCol: String, vecCol: String): Unit = {
    val meta = readMeta(spark, name)
    val (postings, codes, sqCodes, bqCodes) =
      encode(spark, name, newEmbs, idCol, vecCol)
    // four independent delta writes (distinct tables), issued
    // concurrently — each is only nBuckets tasks wide ([[Par.jobs]])
    Par.jobs(Seq(
      () => Bucketing.appendBucketed(postings, part(name, "postings"), "cl",
        meta.nBuckets),
      () => Bucketing.appendBucketed(codes, part(name, "codes"), "id",
        meta.nBuckets),
      () => Bucketing.appendBucketed(sqCodes, part(name, "sq_codes"), "id",
        meta.nBuckets),
      () => Bucketing.appendBucketed(bqCodes, part(name, "bq_codes"), "id",
        meta.nBuckets)))
  }

  /** THE append path: atomic visibility and reader snapshots — the
    * delta is published as a fresh GENERATION directory committed
    * through the part state file, never by dripping files into the
    * live directory (the in-place drip survives only as the
    * package-private [[appendInPlace]] spec fixture):
    *
    *  1. the encoded delta is bucket-written to `.staging/<uuid>`;
    *  2. a new generation directory is populated with HARD LINKS to
    *     every committed file of the current generation plus the
    *     staged delta files (metadata-only on a posix store — this
    *     directory IS a manifest of immutable files, materialized as
    *     links. Data is never copied: parquet files are immutable once
    *     written). With `manifestCommit = true` the generation is
    *     instead ONE `_manifest.json` naming the segment directories —
    *     the object-store-safe shape (S3-style stores have no links
    *     and copy on rename), exactly the Delta/Iceberg snapshot: the
    *     delta writes straight to its segment dir and the commit
    *     writes one small file, at the cost of attaching the part as a
    *     union view (no bucket spec declarable over multiple dirs —
    *     [[attachView]]); [[compact]] collapses the chain back to one
    *     plain bucketed directory. Search results are identical either
    *     way (IndexSpec proves byte-identity);
    *  3. one atomic state-file swap makes the generation current
    *     ([[commitPart]]), retiring the previous one under the grace
    *     window.
    *
    * What this buys over the in-place drip (whose delta files appear
    * one by one in the live directory):
    *  - a crash during the phase-1 delta writes leaves NO trace in
    *    the served index (the state files still name the old
    *    generations; staged orphans are swept on the next commit —
    *    IndexSpec pins this) — with in-place append a half-landed
    *    delta is visible immediately. A crash inside phase 2 (four
    *    metadata-only state swaps, ~ms) can commit a prefix of the
    *    parts; candidates probing the new postings simply lack code
    *    rows until the replayed append re-commits, so the window
    *    degrades to "delta not yet visible", never to corruption;
    *  - a cross-session reader that resolved [[register]] against a
    *    recent state keeps a consistent file set for `graceCommits`
    *    further commits — with in-place append there is no snapshot
    *    to hold;
    *  - at-least-once maintenance replays ([[
    *    graft.streaming.IndexStream.maintain]]) re-commit a fresh
    *    generation; the duplicate-tolerant search plus [[compact]]
    *    (which now also commits generations) reclaim storage on the
    *    same cadence as before.
    *
    * Cost stays ∝ |delta| + O(#files) link metadata, never ∝ corpus
    * bytes. Single writer, like all index maintenance.
    */
  def appendCommitted(spark: SparkSession, name: String, newEmbs: DataFrame,
      idCol: String, vecCol: String, graceCommits: Int = 0,
      manifestCommit: Boolean = false): Unit = {
    val meta = readMeta(spark, name)
    val (postings, codes, sqCodes, bqCodes) =
      encode(spark, name, newEmbs, idCol, vecCol)
    val dir = indexDirOf(spark, name)
    val parts = Seq(("postings", "cl", postings), ("codes", "id", codes),
        ("sq_codes", "id", sqCodes), ("bq_codes", "id", bqCodes))
      .map { case (p, key, df) =>
        (p, key, df, loadPart(dir, p),
          java.util.UUID.randomUUID().toString.take(8))
      }
    // Phase 1, CONCURRENT: the four delta bucket-writes — the only
    // steps that move data ([[Par.jobs]]; distinct stage tables,
    // distinct target dirs). Staged files are invisible to readers
    // until phase 2 commits, so concurrency cannot widen the
    // visibility window. Bucket-writing goes through a throwaway
    // EXTERNAL table (the only way to bucketBy-write); the entry is
    // dropped, the files kept.
    Par.jobs(parts.map { case (p, key, df, _, uid) => () =>
      val stageTbl = s"${part(name, p)}_stage_$uid"
      val target =
        if (manifestCommit) s"$dir/${p}_s$uid" // straight to its segment dir
        else java.nio.file.Paths.get(dir, ".staging", s"${p}_$uid").toString
      Bucketing.writeBucketed(df, stageTbl, key, meta.nBuckets, Some(target))
      spark.sql(s"DROP TABLE $stageTbl")
    })
    // Phase 2, SEQUENTIAL: metadata-only publication + the atomic
    // per-part state swaps (cheap — links/manifests and catalog DDL).
    for ((p, key, _, st, uid) <- parts) {
      val newName = s"${p}_g${st.gen + 1}_$uid"
      if (manifestCommit) {
        // object-store path: the delta already sits in its immutable
        // segment directory (no rename — renames copy on S3-style
        // stores); the generation is one small manifest naming the
        // live segment set. No links, no data copied or moved.
        val segments = segmentsOf(dir, st.current) :+ s"${p}_s$uid"
        writeManifest(dir, newName, segments)
        attachView(spark, name, p, dir, segments)
      } else {
        val staging = java.nio.file.Paths.get(dir, ".staging", s"${p}_$uid")
        val newDir = java.nio.file.Paths.get(dir, newName)
        java.nio.file.Files.createDirectories(newDir)
        linkInto(newDir, java.nio.file.Paths.get(dir, st.current))
        linkInto(newDir, staging)
        attachBucketed(spark, name, p, key, meta.nBuckets, s"$dir/$newName")
      }
      commitPart(dir, p, newName, graceCommits)
    }
  }

  /** The index's directory on disk, resolved from the (file-backed)
    * meta table — never caller-supplied, so maintenance always acts on
    * the directory the catalog actually serves.
    */
  /** Operational snapshot of the artifact — the
    * [[graft.streaming.StateTable.describe]] analog for the index:
    * one row per part with its committed state (current generation
    * name, gen counter, grace policy, still-graced retiree count),
    * its resolved segment count (a manifest-committed chain lists >1
    * until [[compact]] collapses it) and the file count/bytes of the
    * CURRENT generation's data, straight from the filesystem — no
    * data read, no job. The numbers an operator checks before/after
    * append chains, compact, delete, and grace tuning.
    */
  def describe(spark: SparkSession, name: String): DataFrame = {
    import spark.implicits._
    val dir = indexDirOf(spark, name)
    val rows = Parts.map { p =>
      val st = loadPart(dir, p)
      val segs = segmentsOf(dir, st.current)
      val files = segs.flatMap { s =>
        val d = java.nio.file.Paths.get(dir, s)
        if (!java.nio.file.Files.isDirectory(d)) Seq.empty
        else {
          val w = java.nio.file.Files.walk(d)
          try w.iterator().asScala.filter { f =>
            val n = f.getFileName.toString
            java.nio.file.Files.isRegularFile(f) &&
              !n.startsWith("_") && !n.startsWith(".")
          }.toVector finally w.close()
        }
      }
      (p, st.current, st.gen, st.grace, st.retired.size.toLong,
        segs.size.toLong, files.size.toLong,
        files.map(java.nio.file.Files.size(_)).sum)
    }
    rows.toDF("part", "current", "gen", "grace", "n_retired",
      "n_segments", "n_files", "bytes")
  }

  /** Consult-and-compact — the [[TextIndex.maybeCompact]] analog for
    * the ANN artifact (r14 verdict #7 named BOTH indexes' delta
    * chains): every [[appendCommitted]] adds one file set per batch
    * (manifest commits accrete whole segments), so a long-lived
    * maintenance stream grows the file count without bound unless
    * some cron compacts. If any bucketed part's CURRENT generation
    * holds more than `maxFilesPerPart` data files, run [[compact]]
    * (which also reclaims at-least-once replays' duplicate rows);
    * filesystem metadata only while under threshold. Search output
    * unchanged either way. Returns whether it compacted.
    */
  def maybeCompact(spark: SparkSession, name: String,
      maxFilesPerPart: Int): Boolean = {
    val dir = indexDirOf(spark, name)
    // clamp to the post-compact floor (compact leaves one file per
    // bucket): an unsatisfiable threshold would otherwise re-run a
    // full compact after EVERY batch (review r15)
    val threshold = math.max(maxFilesPerPart, readMeta(spark, name).nBuckets)
    val over = BucketedParts.exists { case (p, _) =>
      val n = segmentsOf(dir, loadPart(dir, p).current).map { s =>
        val d = java.nio.file.Paths.get(dir, s)
        if (!java.nio.file.Files.isDirectory(d)) 0
        else listDir(d).count { f =>
          val fn = f.getFileName.toString
          java.nio.file.Files.isRegularFile(f) &&
            !fn.startsWith("_") && !fn.startsWith(".")
        }
      }.sum
      n > threshold
    }
    if (over) compact(spark, name)
    over
  }

  private def indexDirOf(spark: SparkSession, name: String): String = {
    val scan = spark.table(part(name, "meta")).queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
    }.getOrElse(sys.error(s"${part(name, "meta")} is not file-backed"))
    java.nio.file.Paths.get(scan.location.rootPaths.head.toUri.getPath)
      .getParent.toString
  }

  /** Hard-link every data file of `srcDir` into `dst` (fallback: copy,
    * for stores without link support). Parquet files are immutable
    * once committed, so links are safe shared references.
    */
  private def linkInto(dst: java.nio.file.Path, srcDir: java.nio.file.Path): Unit =
    listDir(srcDir)
      .filter { f =>
        val n = f.getFileName.toString
        java.nio.file.Files.isRegularFile(f) &&
          !n.startsWith("_") && !n.startsWith(".")
      }
      .foreach { f =>
        val t = dst.resolve(f.getFileName.toString)
        try java.nio.file.Files.createLink(t, f)
        catch {
          case _: UnsupportedOperationException => java.nio.file.Files.copy(f, t)
        }
      }

  /** Drop the part's catalog entry whatever it is — bucketed table
    * (link-mode generations, build output) or view (manifest-mode
    * generations). Spark rejects DROP TABLE on a view and vice versa.
    */
  private def dropEntry(spark: SparkSession, tbl: String): Unit =
    if (spark.catalog.tableExists(tbl)) {
      if (spark.catalog.getTable(tbl).tableType == "VIEW")
        spark.sql(s"DROP VIEW $tbl")
      else spark.sql(s"DROP TABLE $tbl")
    }

  /** (Re-)create the catalog entry of a bucketed part over `location`
    * (schema recovered from the files' own footer — metadata-only).
    */
  private def attachBucketed(spark: SparkSession, name: String, p: String,
      key: String, nBuckets: Int, location: String): Unit = {
    dropEntry(spark, part(name, p))
    val cols = spark.read.parquet(location).schema.toDDL
    spark.sql(
      s"""CREATE TABLE ${ArtifactFiles.ident(part(name, p))} ($cols)
         |USING parquet
         |CLUSTERED BY ($key) SORTED BY ($key) INTO $nBuckets BUCKETS
         |LOCATION '${ArtifactFiles.sqlLit(location)}'""".stripMargin)
  }

  /** Catalog entry for a MANIFEST generation: a view unioning
    * path-scans of the segment directories. The bucket spec is not
    * declarable on a multi-directory scan (Spark's bucketed tables are
    * single-location), so manifest-mode parts trade the zero-exchange
    * join for commit cheapness — search RESULTS are identical
    * (IndexSpec proves it byte-for-byte); on a real object store the
    * partition-preserving analog is a DSv2 relation reporting
    * storage-partitioned joins, which this view stands in for.
    */
  private def attachView(spark: SparkSession, name: String, p: String,
      dir: String, segments: Seq[String]): Unit = {
    dropEntry(spark, part(name, p))
    val legs = segments
      .map(s => s"SELECT * FROM parquet.`$dir/$s`")
      .mkString(" UNION ALL ")
    spark.sql(s"CREATE VIEW ${part(name, p)} AS $legs")
  }

  /** Offline compaction for an append-heavy index: every [[append]]
    * adds one file per touched bucket, so after many deltas the
    * postings/codes tables hold (appends × buckets) small files.
    * Rewrites each as ONE file per bucket into a fresh sibling
    * directory (dropping exact-duplicate rows — both tables are sets,
    * so the only source of duplicates is an at-least-once maintenance
    * replay, and removing them reclaims that storage), re-points the
    * catalog entry AND the part's pointer file, then sweeps every
    * non-current sibling — search output unchanged; file count
    * re-pinned to the bucket count. Crash-safe at every step: before
    * the pointer move the old directory is untouched and pointed; a
    * crash after it leaves an orphan sibling that the sweep of the
    * NEXT compact (or rebuild) removes, with the pointer authoritative
    * throughout.
    */
  def compact(spark: SparkSession, name: String,
      graceCommits: Int = 0): Unit = {
    val dir = indexDirOf(spark, name)
    val nBuckets = readMeta(spark, name).nBuckets
    for ((p, key) <- BucketedParts) {
      val tbl = part(name, p)
      // resolve the current data directories through the state file,
      // NOT the catalog entry: a manifest-mode part is a view over
      // several segment dirs, and compact is what collapses that
      // chain back to one plain bucketed directory
      val segs = segmentsOf(dir, loadPart(dir, p).current)
        .map(s => s"$dir/$s")
      val newName = s"${p}_c${java.util.UUID.randomUUID().toString.take(8)}"
      // read the OLD files by path (overwriting a table being read from
      // is rejected by identity — the path read sidesteps it, and the
      // write targets a fresh directory anyway); repartition on the
      // bucket key (same murmur3 hash family as bucketBy) so each
      // bucket's rows land wholly in one task → one file per bucket
      dropEntry(spark, tbl)
      Bucketing.writeBucketed(
        spark.read.parquet(segs: _*).distinct()
          .repartition(nBuckets, col(key)),
        tbl, key, nBuckets, Some(s"$dir/$newName"))
      commitPart(dir, p, newName, graceCommits)
    }
  }

  /** Takedown maintenance — remove `delIds` from every encoded part
    * (the right-to-be-forgotten half of the index lifecycle, next to
    * [[append]]/[[appendCommitted]]/[[compact]]): each bucketed part
    * is rewritten minus the deleted ids into a fresh generation
    * directory and committed through the same atomic per-part state
    * swap as every other maintenance op — a crash mid-delete leaves
    * the served index untouched, and graced readers keep their
    * snapshot (which is a FEATURE for audits and a RETENTION BOUND
    * for takedowns: set `graceCommits = 0`, the default, when the
    * point is that the data is gone, then [[compact]]/sweep reclaims
    * bytes).
    *
    * The TRAINED parameters (centroids, codebooks, ranges) are
    * deliberately not retrained — [[append]]'s fixed-parameter
    * contract in reverse: a delete changes the encoded SET, not the
    * model, so search-after-delete equals the same search with
    * candidates restricted to survivors (`q_sim_index_delete` proves
    * it through the in-plan oracle with a candidate predicate).
    * Retraining cadence stays an offline, coordinated act
    * ([[build]]).
    *
    * Cost: BUCKET-PRUNED on the id-keyed parts (codes/sq_codes/
    * bq_codes — the [[appendCommitted]] file-surgery shape in
    * reverse): the deleted ids hash to ≤ |delIds| of the nBuckets
    * id-buckets, so only the FILES of those buckets are read,
    * anti-joined and rewritten; every untouched bucket file is
    * hard-linked into the new generation byte-identical (IndexSpec
    * proves name + content identity). At 100 TB a single-document
    * takedown therefore rewrites ~1/nBuckets of each codes table, not
    * the whole table. The postings part is full-touch by necessity —
    * it is bucketed by `cl`, and deleted ids scatter across cluster
    * buckets (finding which would read all postings anyway). The four
    * part rewrites land concurrently ([[Par.jobs]]); reads resolve
    * through the state file, so link-mode AND manifest-mode parts
    * both collapse to a plain bucketed dir.
    */
  def delete(spark: SparkSession, name: String, delIds: DataFrame,
      idCol: String, graceCommits: Int = 0): Unit =
    upsertImpl(spark, name, None, Some(delIds), idCol, graceCommits)

  /** Upsert — replace-or-insert `embs` and take down `delIds`, in ONE
    * generation commit per part (the [[TextIndex.upsert]] shape on
    * the vector artifact, r15 verdict #3: the CDC feed would
    * otherwise run [[delete]] then [[appendCommitted]] as TWO commit
    * rounds — twice the staging/link/swap machinery, and a window
    * where a re-embedded id is absent from the served index).
    * Semantics: every id in `embs` ∪ `delIds` leaves the encoded
    * parts, then `embs` is encoded at the FIXED trained
    * centroids/codebooks ([[append]]'s contract) and ingested —
    * search-after == the same search over
    * (corpus \ (embs.ids ∪ delIds)) ∪ embs (`q_pipe_cdc_ann` proves
    * it through the in-plan IVF×PQ oracle over the merged corpus).
    *
    * Replay-idempotent WITHOUT markers: a replayed upsert removes
    * exactly the rows it itself added (the removal set is its own
    * ingest ids) and re-encodes the same vectors at the same fixed
    * params — byte-equal state, so the streaming CDC feed
    * ([[graft.streaming.IndexStream.applyChanges]]) needs no marker
    * table (unlike [[TextIndex]], whose append-side content guards
    * made un-marked replays observable in the stats).
    *
    * Cost: the removal side is bucket-pruned exactly like [[delete]]
    * (id-keyed parts rewrite only the touched buckets' files;
    * postings full-touch by necessity); the ingest side stages only
    * the delta's encoded bytes; untouched files hard-link into the
    * fresh generation byte-identical (IndexSpec).
    */
  def upsert(spark: SparkSession, name: String, embs: DataFrame,
      idCol: String, vecCol: String,
      delIds: Option[DataFrame] = None, delCol: String = "id",
      graceCommits: Int = 0): Unit =
    upsertImpl(spark, name, Some((embs, idCol, vecCol)), delIds, delCol,
      graceCommits)

  /** The one removal+ingest commit path behind [[upsert]] AND
    * [[delete]] (delete is its empty-ingest specialization — one
    * removal path, the [[TextIndex.upsertImpl]] discipline). Phase 1
    * stages everything concurrently per part: the bucket-pruned
    * removal rewrite AND the encoded ingest delta land under
    * `.staging`, kept files hard-link — readers still serve the old
    * generations. Phase 2 commits each part through its atomic state
    * swap; a crash between part commits degrades to "delta not yet
    * visible on the later parts" (the [[appendCommitted]] window),
    * never to a half-applied removal within a part.
    */
  private def upsertImpl(spark: SparkSession, name: String,
      ingest: Option[(DataFrame, String, String)],
      delIds: Option[DataFrame], delCol: String,
      graceCommits: Int): Unit = {
    val dir = indexDirOf(spark, name)
    val meta = readMeta(spark, name)
    // removal set: every ingested id leaves first (an upsert of an
    // indexed id must REPLACE it), plus the explicit tombstones
    val removalSrcs =
      ingest.map { case (df, ic, _) =>
        df.select(col(ic).cast("long").as("__del_id")) }.toSeq ++
      delIds.map(_.select(col(delCol).cast("long").as("__del_id"))).toSeq
    if (removalSrcs.isEmpty) return
    // explicit persist + finally-unpersist (NOT cachedOnce): the CDC
    // feed calls this once per micro-batch with batch-unique plans,
    // so leaked entries would grow without bound (the
    // TextIndex.append r13 discipline). ingestBase pins the SAME
    // cache entry encode's internal baseOf resolves (cachedOnce
    // dedups by canonicalized plan), so it too is released here.
    val del = removalSrcs.reduce(_ union _).distinct().persist()
    val ingestBase = ingest.map { case (df, ic, vc) => baseOf(df, ic, vc) }
    try {
    // ONE bounded probe job (r18: was three ~0.1 s jobs —
    // requireUniqueIds, ingest isEmpty, touched digest):
    //  - the touched id-buckets — bucketBy's own hash family
    //    (functions.hash IS HashPartitioning's Murmur3 seed-42
    //    expression, pmod nBuckets). ≤ nBuckets values: a bounded
    //    driver-side digest, not a corpus collect (collect_set is
    //    restricted to the del side's bucket values);
    //  - the unique-ingest-id precondition (advice r16;
    //    multi-version batches LWW-collapse first in
    //    IndexStream.applyChanges) and "a PRESENT-but-empty ingest
    //    frame is a pure takedown" (verdict r16 #2: it used to
    //    bucket-write and link four empty delta files per
    //    generation) both read off the same aggregate.
    val probeRows = (Seq(
        del.select(lit("d").as("t"),
          pmod(hash(col("__del_id")), lit(meta.nBuckets))
            .cast("long").as("k"))) ++
      ingestBase.map(b => b.select(lit("i").as("t"), col("id").as("k"))))
      .reduce(_ unionByName _)
      .groupBy(col("t"), col("k")).agg(count(lit(1)).as("c"))
      .groupBy(col("t")).agg(
        collect_set(when(col("t") === "d", col("k"))).as("bkts"),
        count(lit(1)).as("groups"),
        max(when(col("c") > 1, col("k"))).as("dupk"),
        sum(when(col("c") > 1, lit(1)).otherwise(lit(0))).as("dups"))
      .collect().map(r => r.getString(0) -> r).toMap
    probeRows.get("i").filter(_.getLong(4) > 0).foreach { r =>
      throw new IllegalArgumentException(
        s"requirement failed: upsert ingest contains duplicate ids " +
          s"(e.g. ${r.get(3)}) — collapse to one row per id " +
          "(last-writer-wins) before upserting")
    }
    val hasIngest = probeRows.get("i").exists(_.getLong(2) > 0)
    val touched = probeRows.get("d")
      .map(_.getSeq[Long](1).map(_.toInt).toSet)
      .getOrElse(Set.empty[Int])
    // a batch with nothing to remove AND nothing to ingest advances
    // no generation at all (every id hashes to a bucket, so an empty
    // touched set ⟹ an empty removal set)
    if (touched.isEmpty && !hasIngest) return
    // encode the ingest delta at the FIXED trained params (lazy
    // frames — materialized by the phase-1 staging writes, before any
    // catalog re-attach)
    val deltaOf: Map[String, DataFrame] =
      (if (hasIngest) ingest else None).map { case (df, ic, vc) =>
        val (po, co, sq, bq) = encode(spark, name, df, ic, vc)
        Map("postings" -> po, "codes" -> co, "sq_codes" -> sq,
          "bq_codes" -> bq)
      }.getOrElse(Map.empty)
    val parts = BucketedParts.map { case (p, key) =>
      (p, key, s"${p}_u${java.util.UUID.randomUUID().toString.take(8)}")
    }
    // phase 1, CONCURRENT: per-part removal rewrites + ingest delta
    // stages into fresh generation dirs (distinct stage tables and
    // target dirs; readers still serve the old generations). id-keyed
    // parts rewrite ONLY the files of touched buckets and link the
    // rest; postings rewrites fully.
    Par.jobs(parts.map { case (p, key, newName) => () =>
      val segDirs = segmentsOf(dir, loadPart(dir, p).current)
        .map(s => java.nio.file.Paths.get(dir, s))
      val files = segDirs.flatMap(listDir).filter { f =>
        val n = f.getFileName.toString
        java.nio.file.Files.isRegularFile(f) &&
          !n.startsWith("_") && !n.startsWith(".")
      }
      // a file with no parseable bucket tag is conservatively treated
      // as touched (rewritten) — never silently kept
      val (rewrite, keep) =
        if (key != "id") (files, Seq.empty[java.nio.file.Path])
        else files.partition(f =>
          bucketIdOf(f.getFileName.toString).forall(touched.contains))
      val newDir = java.nio.file.Paths.get(dir, newName)
      java.nio.file.Files.createDirectories(newDir)
      if (rewrite.nonEmpty) {
        val stageTbl = s"${part(name, p)}_stage_${newName.takeRight(8)}"
        val stage = java.nio.file.Paths.get(dir, ".staging", newName)
        Bucketing.writeBucketed(
          spark.read.parquet(rewrite.map(_.toString): _*)
            .join(del, col("id") === col("__del_id"), "left_anti")
            .repartition(meta.nBuckets, col(key)),
          stageTbl, key, meta.nBuckets, Some(stage.toString))
        spark.sql(s"DROP TABLE $stageTbl")
        linkInto(newDir, stage)
      }
      // the ingest delta: its own staged bucket-write, linked into the
      // SAME generation dir — removal and ingest publish in one swap
      deltaOf.get(p).foreach { df =>
        val stageTbl = s"${part(name, p)}_stage_i${newName.takeRight(8)}"
        val stage = java.nio.file.Paths.get(dir, ".staging",
          s"${newName}_delta")
        Bucketing.writeBucketed(df, stageTbl, key, meta.nBuckets,
          Some(stage.toString))
        spark.sql(s"DROP TABLE $stageTbl")
        linkInto(newDir, stage)
      }
      keep.foreach { f =>
        val t = newDir.resolve(f.getFileName.toString)
        try java.nio.file.Files.createLink(t, f)
        catch {
          case _: UnsupportedOperationException =>
            java.nio.file.Files.copy(f, t)
        }
      }
    })
    // phase 2, SEQUENTIAL: re-attach + atomic per-part commits (the
    // staged rewrite dirs are swept by commitPart once linked)
    for ((p, key, newName) <- parts) {
      attachBucketed(spark, name, p, key, meta.nBuckets, s"$dir/$newName")
      commitPart(dir, p, newName, graceCommits)
    }
    } finally { del.unpersist(); ingestBase.foreach(_.unpersist()) }
  }

  /** Search the persisted index for the corpus rows selected by
    * `queryPred` — the serve-many side of the split. The plan contains
    * NO training stage (PlanSpec asserts no checkpoint scans) and no
    * exchange on the postings/codes side (bucketed layout + broadcast
    * small sides). Output: (qid, rank, neighbor_id, cos_micros), exact
    * cosines — bit-identical to [[Pq.ivfPqTopK]] at the same params.
    */
  def search(spark: SparkSession, name: String, embs: DataFrame,
      idCol: String, vecCol: String, queryPred: Column, k: Int,
      nprobe: Int, rerank: Int): DataFrame = {
    val base = baseOf(embs, idCol, vecCol)
    val queries = base.filter(queryPred)
      .select(col("id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    searchQueries(spark, name, base, queries, k, nprobe, rerank)
  }

  /** FLAT search over the persisted index: probe the nprobe nearest
    * lists, rank the probed candidates by EXACT cosine against the
    * full vectors — no PQ codes, no rerank stage. The serving shape
    * for corpora whose vectors still fit the IO budget (reads
    * ~massign·nprobe/nlist of the corpus rows per query batch);
    * [[searchQueries]] is the 16-byte-code path for when they don't.
    * Output identical to the in-plan [[Similarity.ivfTopKTrained]] at
    * the build parameters (shared oracle).
    */
  def searchFlat(spark: SparkSession, name: String, embs: DataFrame,
      idCol: String, vecCol: String, queryPred: Column, k: Int,
      nprobe: Int): DataFrame = {
    val base = baseOf(embs, idCol, vecCol)
    searchFlatQueries(spark, name, base,
      base.filter(queryPred).select(col("id").as("qid"), col("v").as("qv"),
        col("nrm").as("qnrm")), k, nprobe)
  }

  private def searchFlatQueries(spark: SparkSession, name: String,
      base: DataFrame, queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val cents = spark.table(part(name, "cents"))
    val postings = spark.table(part(name, "postings"))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("pcos").desc, col("cl").asc)
    val probes = queries.join(broadcast(cents))
      .select(col("qid"), col("cl"),
        (Vectors.dot(col("qv"), col("cent")) / (col("qnrm") * col("cnrm"))).as("pcos"))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nprobe)
      .select(col("qid"), col("cl"))
    // dedup on the ids alone (the query VECTOR would otherwise ride
    // every candidate row through the distinct's exchange), then
    // re-attach the broadcast query table for the exact scoring
    val pairs = broadcast(probes).join(postings, "cl")
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id")).distinct()
    val wTop = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    pairs.join(base, "id")
      .join(broadcast(queries), "qid")
      .select(col("qid"), col("id").as("neighbor_id"),
        (Vectors.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cos"))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("neighbor_id"),
        round(col("cos") * 1e6).cast("long").as("cos_micros"))
  }

  /** SQ8 search over the persisted index — the middle serving tier:
    * probe the nprobe nearest lists, score the probed candidates from
    * their 1-BYTE-per-dim SQ codes (asymmetric midpoint
    * reconstruction, [[Sq]]), exact-rerank the top-`rerank`. Reads 4×
    * fewer candidate bytes than [[searchFlat]] and needs no codebook
    * training; [[searchQueries]] (PQ, 16×) is the tier below. Output
    * bit-identical to the in-plan [[Sq.ivfSqTopK]] at the build
    * parameters (shared oracle). The sq_codes table is bucketed by id:
    * the candidate join shuffles only the (tiny) probe pairs, never
    * the codes.
    */
  def searchSq(spark: SparkSession, name: String, embs: DataFrame,
      idCol: String, vecCol: String, queryPred: Column, k: Int,
      nprobe: Int, rerank: Int): DataFrame = {
    val base = baseOf(embs, idCol, vecCol)
    val queries = base.filter(queryPred)
      .select(col("id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    searchSqQueries(spark, name, base, queries, k, nprobe, rerank)
  }

  /** [[searchSq]] with an explicit query table (qid, qv, qnrm) — the
    * streaming-probe entry point ([[graft.streaming.IndexStream]]),
    * like [[searchQueries]] for the PQ tier.
    */
  def searchSqQueries(spark: SparkSession, name: String, base: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int, rerank: Int): DataFrame = {
    val cents = spark.table(part(name, "cents"))
    val postings = spark.table(part(name, "postings"))
    val ranges = Sq.collapseRanges(spark.table(part(name, "sq_ranges")))
    val sqCodes = spark.table(part(name, "sq_codes"))

    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("pcos").desc, col("cl").asc)
    val probes = queries.join(broadcast(cents))
      .select(col("qid"), col("cl"),
        (Vectors.dot(col("qv"), col("cent")) / (col("qnrm") * col("cnrm"))).as("pcos"))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nprobe)
      .select(col("qid"), col("cl"))
    val pairs = broadcast(probes).join(postings, "cl")
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id")).distinct()
    // reconstruction once per DISTINCT candidate id, not per pair (and
    // not for unprobed corpus rows). dropDuplicates: an at-least-once
    // maintenance replay appends identical code rows; duplicates here
    // would make the rerank-cut window see the same candidate twice
    // and evict a distinct one — dup rows are byte-identical, so the
    // pick is value-deterministic; on clean data this is an identity.
    val candCodes = Sq.withRecon(
      pairs.select(col("id")).distinct()
        .join(sqCodes, "id")
        .dropDuplicates("id")
        .withColumn("code", col("code").cast("array<double>"))
        .join(broadcast(ranges)), 64)
    val scored = pairs.join(candCodes, "id")
      .join(broadcast(queries), "qid")
    Sq.cutAndRerank(base, queries, scored, k, rerank)
  }

  /** BQ search over the persisted index — the coarsest serving tier:
    * NO probe at all; the stored one-long sign codes are swept in
    * full (8 bytes per corpus vector — a 32× cut; at 100 TB of
    * float32 this sweep reads ~3 TB), candidates cut by xor+popcount
    * Hamming, then the family's exact rerank. Query codes pack
    * in-plan from the query vectors — bit-identical to the stored
    * codes for in-corpus queries (the pack has no trained
    * parameters), so output matches the in-plan [[Bq.topK]] exactly
    * (shared oracle). dropDuplicates on the code scan: an
    * at-least-once maintenance replay appends identical code rows;
    * duplicates would crowd distinct candidates out of the
    * rank-window cut — dup rows are byte-identical, so the drop is
    * value-deterministic and an identity on clean data.
    */
  def searchBq(spark: SparkSession, name: String, embs: DataFrame,
      idCol: String, vecCol: String, queryPred: Column, k: Int,
      rerank: Int, dim: Int = 64): DataFrame = {
    val base = baseOf(embs, idCol, vecCol)
    val queries = base.filter(queryPred)
      .select(col("id").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    searchBqQueries(spark, name, base, queries, k, rerank, dim)
  }

  /** [[searchBq]] with an explicit query table (qid, qv, qnrm) — the
    * streaming-probe entry point ([[graft.streaming.IndexStream]]),
    * like [[searchQueries]] / [[searchSqQueries]] for the other tiers.
    */
  def searchBqQueries(spark: SparkSession, name: String, base: DataFrame,
      queries: DataFrame, k: Int, rerank: Int, dim: Int = 64): DataFrame = {
    val packed = spark.table(part(name, "bq_codes")).dropDuplicates("id")
    val qPacked = queries.select(col("qid"), Bq.packCol("qv", dim).as("qcode"))
    Bq.cutAndRerank(packed, qPacked, base, queries, k, rerank)
  }

  /** Search with an explicit query table (qid, qv, qnrm) — the entry
    * point the streaming probe uses ([[graft.streaming.IndexStream]]):
    * query vectors need not be part of the indexed corpus. `base` is
    * the corpus (id, v, nrm) for the exact rerank.
    */
  def searchQueries(spark: SparkSession, name: String, base: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int, rerank: Int): DataFrame = {
    val meta = readMeta(spark, name)
    val subDim = 64 / meta.m
    val cents = spark.table(part(name, "cents"))
    val cb = spark.table(part(name, "codebooks"))
    val postings = spark.table(part(name, "postings"))
    val codes = spark.table(part(name, "codes"))

    // queries → nprobe nearest centroid lists; the centroid table is
    // nlist rows — broadcast, so probing never shuffles anything wider
    // than the query set itself
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("pcos").desc, col("cl").asc)
    val probes = queries.join(broadcast(cents))
      .select(col("qid"), col("cl"),
        (Vectors.dot(col("qv"), col("cent")) / (col("qnrm") * col("cnrm"))).as("pcos"))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= nprobe)
      .select(col("qid"), col("cl"))

    // candidate pairs from the probed lists: the probe set (queries ×
    // nprobe rows) broadcasts against the bucketed postings — the
    // posting side is scanned in place, never exchanged. distinct():
    // multiple assignment can reach a vector through several lists.
    val candPairs = broadcast(probes).join(postings, "cl")
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id")).distinct()

    // ADC over the probed candidates only: codes stay bucketed-in-place,
    // the LUT is queries × m × ksub rows — broadcast. The distinct
    // before the LUT join makes the ADC sum immune to DUPLICATED code
    // rows (an at-least-once [[graft.streaming.IndexStream.maintain]]
    // replay appends a batch twice; without it each duplicate doubles
    // that vector's approximate dot and biases the candidate cut) —
    // on clean data it is an identity over (queries × candidates × m)
    // rows, so search output is unchanged.
    val lut = Pq.lutOf(queries, cb, meta.m, subDim)
    val approx = candPairs
      .join(codes, "id")
      .select(col("qid"), col("id"), col("m"), col("cl")).distinct()
      .join(broadcast(lut), Seq("qid", "m", "cl"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("part_micros")).as("adot_micros"))
    Pq.rerankExact(base, queries, approx, k, rerank)
  }
}
