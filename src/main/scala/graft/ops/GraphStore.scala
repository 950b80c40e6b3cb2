package graft.ops

import scala.collection.JavaConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted kNN-graph artifact — the build/serve split for the graph
  * family ([[Similarity.knnGraph]] → [[Graph.pageRank]] /
  * kNN-classify), mirroring what [[Index]] does for ANN serving: the
  * expensive corpus-wide work (seeded k-means training + the blocked
  * Σ|list|² self-join) runs ONCE and lands as bucketed tables;
  * PageRank, classification and any other graph consumer then serve
  * from the stored edge list with no training stage in their plans
  * (PlanSpec asserts it — no checkpoint scans, no Lloyd rounds).
  *
  * Before this split the three graph queries each retrained the same
  * k-means and rebuilt the same blocked join in-plan — three full
  * trainings for one artifact (the round-5/6 verdict's standing perf
  * debt). At 100 TB the difference is not a constant: training is a
  * corpus-wide pass, serving PageRank is |edges| = n·k rows.
  *
  * == Layout (five bucketed/plain tables under `<baseDir>/<name>/`) ==
  *
  *  - `edges`  (src_id, rank, neighbor_id, cos_micros, cos_raw),
  *    bucketed by src_id — PageRank's per-iteration join keys on the
  *    edge source, so the big side arrives pre-hashed and never
  *    re-exchanges. `cos_raw` is internal: the unrounded ranking key
  *    [[append]] merges on (rounded micros could order near-ties
  *    differently than a rebuild would). [[edges]] serves the public
  *    four columns.
  *  - `labels` (id, label), bucketed by id — the classify vote's
  *    neighbor-label attach and the truth join read it in place.
  *  - `blocks` (cl, id, v, nrm), bucketed by cl — every vector's
  *    massign list assignments WITH its vector: the candidate-join
  *    side [[append]] probes (storage ×massign, exactly what a
  *    production vector-graph index carries).
  *  - `cents`  (cl, cent, cnrm): the trained centroids — append
  *    assigns new vectors at these FIXED centroids, never retrains.
  *  - `meta`   (k, massign, nBuckets): build parameters.
  *
  * == Determinism contract ==
  *
  * The build is [[Similarity.knnGraph]] verbatim: seeded centroids,
  * fixed unrolled Lloyd rounds, (cos desc, id) ranking — the stored
  * edges are bit-identical to what the in-plan query computes, so
  * every serve query shares the in-plan oracle unchanged. [[append]]
  * extends it: append == full rebuild at the stored centroids
  * (GraphStoreSpec proves it), so the maintained graph shares the
  * train-on-the-original-corpus oracle (`q_sim_graph_append`).
  */
object GraphStore {

  private def part(name: String, p: String) = s"${name}_$p"

  private def graphDir(baseDir: Option[String], name: String): String =
    s"${baseDir.getOrElse(s"${sys.props("java.io.tmpdir")}/graft_graph")}/$name"

  /** Whether `name` is already attached in this session's catalog. */
  def exists(spark: SparkSession, name: String): Boolean =
    spark.catalog.tableExists(part(name, "edges"))

  /** Re-attach a graph BUILT BY A PREVIOUS SESSION from its files —
    * the [[Index.register]]/[[TextIndex.register]] analog, closing
    * the artifact-lifecycle gap (build once, serve from any number of
    * later sessions). This artifact has no pointer files: every
    * maintenance op writes its fresh sibling directory and sweeps the
    * superseded one IN THE SAME CALL, so a quiesced artifact holds
    * exactly ONE directory per part (`p` or `p_<tag>`). Resolution is
    * therefore by uniqueness, and an ambiguous layout (two dirs for
    * one part — a maintenance run crashed between its rewrite and its
    * sweep) is REFUSED loudly with both names rather than guessed at:
    * finish the interrupted op from the original session or rebuild.
    * Bucket specs come from the persisted meta (a caller-supplied
    * count could declare a false spec and silently drop join
    * candidates — the [[Index.register]] rationale). Metadata-only:
    * no data read beyond schema footers.
    */
  def register(spark: SparkSession, name: String, baseDir: String): Unit = {
    ArtifactFiles.requireArtifactName(name)
    val dir = java.nio.file.Paths.get(graphDir(Some(baseDir), name))
    require(java.nio.file.Files.isDirectory(dir),
      s"no graph artifact at $dir")
    def resolve(p: String): String = {
      val s = java.nio.file.Files.list(dir)
      val cands = try {
        s.iterator().asScala.filter { c =>
          val n = c.getFileName.toString
          java.nio.file.Files.isDirectory(c) &&
            (n == p || n.startsWith(s"${p}_"))
        }.toVector
      } finally s.close()
      require(cands.nonEmpty, s"part $p missing under $dir")
      require(cands.size == 1,
        s"part $p is ambiguous under $dir (${cands.map(_.getFileName)
          .mkString(", ")}) — a maintenance run crashed between its " +
          "rewrite and its sweep; finish it from the original session " +
          "or rebuild")
      cands.head.toString
    }
    def attachPlain(tbl: String, location: String): Unit = {
      if (spark.catalog.tableExists(tbl)) spark.sql(
        s"DROP TABLE ${ArtifactFiles.ident(tbl)}")
      val cols = spark.read.parquet(location).schema.toDDL
      spark.sql(
        s"CREATE TABLE ${ArtifactFiles.ident(tbl)} ($cols) USING parquet " +
          s"LOCATION '${ArtifactFiles.sqlLit(location)}'")
    }
    attachPlain(part(name, "meta"), resolve("meta"))
    attachPlain(part(name, "cents"), resolve("cents"))
    val nBuckets =
      spark.table(part(name, "meta")).collect()(0).getAs[Int]("nBuckets")
    for ((p, key) <- Seq(("edges", "src_id"), ("blocks", "cl"),
        ("labels", "id")))
      attachBucketed(spark, part(name, p), key, nBuckets, resolve(p))
  }

  /** Auto-compaction policy hook — [[Index.maybeCompact]]'s graph
    * analog for the streaming feeds: [[append]] delta-appends
    * blocks/labels (one file set per batch), so a long-lived
    * maintenance stream grows file counts without bound unless some
    * cron compacts. If any of the three big tables holds more than
    * `maxFilesPerPart` data files, run [[compact]]; filesystem
    * metadata only while under threshold. The threshold clamps to the
    * post-compact floor (one file per bucket) — an unsatisfiable
    * value would otherwise re-run a full compact after every batch.
    * Returns whether it compacted.
    */
  def maybeCompact(spark: SparkSession, name: String,
      maxFilesPerPart: Int): Boolean = {
    val nBuckets =
      spark.table(part(name, "meta")).collect()(0).getAs[Int]("nBuckets")
    val threshold = math.max(maxFilesPerPart, nBuckets)
    val over = Seq("edges", "blocks", "labels").exists { p =>
      val d = dirOf(spark, part(name, p))
      val s = java.nio.file.Files.list(d)
      val n = try {
        s.iterator().asScala.count { f =>
          val fn = f.getFileName.toString
          java.nio.file.Files.isRegularFile(f) &&
            !fn.startsWith("_") && !fn.startsWith(".")
        }
      } finally s.close()
      n > threshold
    }
    if (over) compact(spark, name)
    over
  }

  /** id cast to long at the artifact boundary — same rationale as
    * [[Index.baseOf]] (advice r13): [[delete]]'s touched-bucket
    * digests hash the del ids as long, and Murmur3(int) ≠
    * Murmur3(long), so an int-typed source id would compute the
    * kept/rewrite partition in the wrong hash family.
    */
  private def baseOf(embs: DataFrame, idCol: String, vecCol: String) =
    Caching.cachedOnce(
      embs.select(col(idCol).cast("long").as("id"),
          Vectors.toDouble(col(vecCol)).as("v"))
        .withColumn("nrm", Vectors.norm(col("v"))))

  /** Train + block-join + persist: one [[Similarity.knnGraphAt]] pass
    * at freshly trained centroids, bucket-written — the pay-once side
    * of the split.
    */
  def build(spark: SparkSession, embs: DataFrame, idCol: String,
      vecCol: String, seedCol: String, name: String, k: Int, iters: Int,
      massign: Int = 1, nBuckets: Int = 8,
      baseDir: Option[String] = None): Unit = {
    ArtifactFiles.requireArtifactName(name)
    import spark.implicits._
    val dir = graphDir(baseDir, name)
    val base = baseOf(embs, idCol, vecCol)
    val cents = Similarity.withCNorm(
      Similarity.kmeans(embs, idCol, vecCol, seedCol, iters))
    val edges = Similarity.knnGraphAt(base, cents, k, massign)
    val blocks = Similarity.assignWithVec(base, cents, massign)
      .select(col("cl"), col("id"), col("v"), col("nrm"))
    val labels = embs.select(col(idCol).cast("long").as("id"),
      col(seedCol).cast("long").as("label"))
    // the three bucketed writes are independent (distinct tables and
    // dirs; `base` materializes once under the block manager's
    // per-partition locks) — land them concurrently, each is only
    // nBuckets tasks wide ([[Par.jobs]])
    Par.jobs(Seq(
      () => Bucketing.writeBucketed(edges, part(name, "edges"), "src_id",
        nBuckets, Some(s"$dir/edges")),
      () => Bucketing.writeBucketed(labels, part(name, "labels"), "id",
        nBuckets, Some(s"$dir/labels")),
      () => Bucketing.writeBucketed(blocks, part(name, "blocks"), "cl",
        nBuckets, Some(s"$dir/blocks"))))
    cents.write.mode("overwrite").format("parquet")
      .option("path", s"$dir/cents").saveAsTable(part(name, "cents"))
    Seq((k, massign, nBuckets)).toDF("k", "massign", "nBuckets")
      .write.mode("overwrite").format("parquet")
      .option("path", s"$dir/meta").saveAsTable(part(name, "meta"))
    // A REBUILD over a previously appended/deleted artifact lands in
    // the canonical dirs above while the superseded generation dirs
    // (edges_aXXXX / *_dXXXX — append/delete rewrite into fresh
    // siblings and re-point the catalog) would otherwise stay on disk
    // forever. Build is the only entry point that re-establishes the
    // canonical layout, so it owns the sweep: every sibling that is
    // not one of the five canonical tables goes. Safe under the
    // artifact's single-writer contract — no reader holds a
    // superseded generation once the catalog points at the new build.
    sweepOrphans(dir)
  }

  private val CanonicalParts = Set("edges", "labels", "blocks", "cents", "meta")

  private def sweepOrphans(dir: String): Unit = {
    val p = java.nio.file.Paths.get(dir)
    if (!java.nio.file.Files.isDirectory(p)) return
    val s = java.nio.file.Files.list(p)
    try s.forEach { c =>
      if (java.nio.file.Files.isDirectory(c)
          && !CanonicalParts.contains(c.getFileName.toString))
        deleteDir(c)
    } finally s.close()
  }

  /** Incremental maintenance — the [[Index.append]] analog for the
    * graph: assign ONLY the new vectors at the stored centroids, score
    * ONLY candidate pairs with a new endpoint (new↔new and new↔old
    * through shared lists — the old×old Σ|list|² join never re-runs),
    * then
    *
    *  - NEW sources take the top-k of their full candidate set;
    *  - stored sources that gained a candidate re-rank their stored
    *    top-k UNION the new pairs — sound because
    *    topk(A∪B) ⊆ topk(A) ∪ B, exact because the merge ranks on the
    *    stored unrounded `cos_raw`;
    *  - every other source keeps its stored rows untouched.
    *
    * The result equals a full rebuild at the stored centroids over
    * the union corpus (GraphStoreSpec proves equality; the
    * `q_sim_graph_append` oracle proves it end-to-end), at cost
    * ∝ |delta|·avg-list + touched edges, never ∝ Σ|list|².
    * Single-writer, like all artifact maintenance; the edges rewrite
    * lands in a fresh sibling directory and re-attaches (the
    * [[Index.compact]] pattern — the X56/X88 generation machinery is
    * the upgrade path if graph maintenance ever needs reader
    * snapshots). IDEMPOTENT under replay: ids already in the artifact
    * are dropped up front, so at-least-once delivery
    * ([[graft.streaming.GraphStream.maintain]]) cannot double-merge.
    */
  def append(spark: SparkSession, name: String, newEmbs: DataFrame,
      idCol: String, vecCol: String, seedCol: String): Unit = {
    val metaRow = spark.table(part(name, "meta")).collect()(0)
    val (k, massign, nBuckets) = (metaRow.getAs[Int]("k"),
      metaRow.getAs[Int]("massign"), metaRow.getAs[Int]("nBuckets"))
    val cents = spark.table(part(name, "cents"))
    // idempotence gate: ids already in the artifact are dropped, so an
    // at-least-once REPLAY (GraphStream's foreachBatch contract, or a
    // crashed-and-retried batch append) is a no-op instead of
    // double-merging pairs into the top-k — one anti-join probe of the
    // bucketed labels table, cost ∝ batch
    val fresh = Caching.cachedOnce(newEmbs.join(
      spark.table(part(name, "labels"))
        .select(col("id").as(s"__seen_$idCol")),
      newEmbs(idCol) === col(s"__seen_$idCol"), "left_anti"))
    if (fresh.isEmpty) return
    val newBase = baseOf(fresh, idCol, vecCol)
    val newBlocks = Caching.cachedOnce(
      Similarity.assignWithVec(newBase, cents, massign)
        .select(col("cl"), col("id"), col("v"), col("nrm")))
    val oldBlocks = spark.table(part(name, "blocks"))

    def cos = (Vectors.dot(col("sv"), col("v"))
      / (col("snrm") * col("nrm"))).as("cos")
    def srcSide(df: DataFrame) = df.select(col("cl"),
      col("id").as("src_id"), col("v").as("sv"), col("nrm").as("snrm"))
    def dstSide(df: DataFrame) = df.select(col("cl"),
      col("id").as("neighbor_id"), col("v"), col("nrm"))

    // pairs with a NEW source: new↔new plus new→old through shared
    // lists (the tiny new side broadcasts against the bucketed blocks)
    val newSrcPairs = srcSide(newBlocks)
      .join(dstSide(newBlocks).unionByName(dstSide(oldBlocks)), Seq("cl"))
      .filter(col("src_id") =!= col("neighbor_id"))
      .select(col("src_id"), col("neighbor_id"), cos)
    val newEdges = Similarity.knnRankPairs(newSrcPairs, k,
      dedup = massign > 1)

    // pairs where a STORED source gains a new candidate
    val oldNewPairs = srcSide(oldBlocks).join(dstSide(newBlocks), Seq("cl"))
      .select(col("src_id"), col("neighbor_id"), cos)
    val oldNewDedup = Caching.cachedOnce(
      if (massign > 1) oldNewPairs.distinct() else oldNewPairs)

    // stored rows split by whether their source gained candidates;
    // read BY PATH so the rewrite below can target the same table
    val edgesTbl = part(name, "edges")
    val oldDir = dirOf(spark, edgesTbl)
    val stored = spark.read.parquet(oldDir.toString)
    val touched = oldNewDedup.select(col("src_id")).distinct()
    val untouched = stored.join(touched, Seq("src_id"), "left_anti")
    val merged = Similarity.knnRankPairs(
      stored.join(touched, Seq("src_id"), "left_semi")
        .select(col("src_id"), col("neighbor_id"), col("cos_raw").as("cos"))
        .unionByName(oldNewDedup),
      k, dedup = false) // stored rows and new pairs are disjoint sets

    val dir = oldDir.getParent.toString
    val newName = s"edges_a${java.util.UUID.randomUUID().toString.take(8)}"
    Bucketing.writeBucketed(
      untouched.unionByName(merged).unionByName(newEdges),
      edgesTbl, "src_id", nBuckets, Some(s"$dir/$newName"))

    // delta-append the blocks and labels (concurrently — distinct
    // tables, both ∝ batch; they run only AFTER the edges rewrite, so
    // the rewrite's scan of the blocks table never races the append);
    // then sweep the superseded edges dir
    Par.jobs(Seq(
      () => Bucketing.appendBucketed(newBlocks, part(name, "blocks"), "cl",
        nBuckets),
      () => Bucketing.appendBucketed(
        fresh.select(col(idCol).cast("long").as("id"),
          col(seedCol).cast("long").as("label")),
        part(name, "labels"), "id", nBuckets)))
    deleteDir(oldDir)
  }

  /** A table's backing directory, resolved through its file relation
    * — lets a rewrite read the OLD files by path while its write
    * re-targets the same catalog name.
    */
  private def dirOf(spark: SparkSession, tbl: String): java.nio.file.Path = {
    // drop any cached relation first: maintenance runs inside
    // foreachBatch's CLONED session, whose DROP/CREATE re-points the
    // shared external catalog but leaves the PARENT session's relation
    // cache holding the superseded location — a post-stream describe/
    // compact in the parent would walk a swept directory (r16 spec)
    spark.catalog.refreshTable(tbl)
    val scan = spark.table(tbl).queryExecution.analyzed.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
    }.getOrElse(sys.error(s"$tbl is not file-backed"))
    java.nio.file.Paths.get(scan.location.rootPaths.head.toUri.getPath)
  }

  private def deleteDir(d: java.nio.file.Path): Unit = {
    val s = java.nio.file.Files.walk(d)
    try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(f => java.nio.file.Files.delete(f))
    finally s.close()
  }

  /** Takedown for the graph artifact — the [[graft.ops.Index.delete]]
    * analog: the result equals a full rebuild at the STORED centroids
    * over the survivor corpus (GraphStoreSpec proves it), at cost
    * ∝ touched sources × their lists + part rewrites:
    *
    *  - DELETED sources lose their rows outright;
    *  - survivor sources whose stored top-k contained a deleted
    *    neighbor RE-RANK from their stored block candidates minus the
    *    deleted ids — sound because removing candidates below the
    *    stored top-k cannot change it, so only sources that visibly
    *    lost a neighbor need recomputing, and their full candidate
    *    set is exactly their blocks join;
    *  - every other source keeps its stored rows untouched;
    *  - blocks and labels drop the deleted ids (rewrites into fresh
    *    sibling dirs, catalog re-pointed, old dirs swept — the
    *    artifact's single-writer maintenance contract).
    *
    * BUCKET-PRUNED writes (round 13, the [[graft.ops.Index.delete]]
    * refinement applied here): each part rewrites only the FILES of
    * buckets that can change, hard-linking every other bucket file
    * into its fresh directory byte-identical —
    *
    *  - `edges` (by src_id): buckets of (deleted ids ∪ re-ranked
    *    sources) — kept buckets hold only sources that neither died
    *    nor lost a neighbor, so their files are exact;
    *  - `labels` (by id): buckets of the deleted ids, read by FILE
    *    PATH (the only part whose scan prunes too — edges/blocks must
    *    be scanned anyway to find touched sources / deleted members);
    *  - `blocks` (by cl): buckets of the CLUSTERS the deleted ids were
    *    assigned to (known from the stored assignments) — a cl list
    *    with no deleted member is unchanged by definition.
    *
    * At 100 TB a one-document takedown thus rewrites ~massign/nBuckets
    * of blocks, ~(1+|touched srcs|)/nBuckets of edges and 1/nBuckets
    * of labels instead of all three tables. The touched-bucket sets
    * are ≤ nBuckets driver digests, never corpus collects.
    */
  def delete(spark: SparkSession, name: String, delIds: DataFrame,
      idCol: String): Unit =
    upsertImpl(spark, name, None, Some(delIds), idCol)

  /** Upsert — replace-or-insert `embs` and take down `delIds` in ONE
    * generation advance per part (the [[Index.upsert]] shape on the
    * graph artifact, r16 verdict #1: the CDC feed used to run
    * [[delete]] then [[append]] as TWO commit rounds, and the crash
    * window between them served a graph missing the re-embedded keys
    * until the replay converged it). Semantics: every id in
    * `embs` ∪ `delIds` leaves the graph — its own rows, its block
    * membership, its appearances in other sources' top-k — then
    * `embs` is assigned at the STORED centroids and merged; the
    * result equals a fixed-centroid rebuild over
    * (corpus \ (embs.ids ∪ delIds)) ∪ embs (GraphStoreSpec proves
    * it; `q_pipe_cdc_graph` proves it end-to-end). Edge derivation
    * fuses [[delete]]'s survivor re-rank with [[append]]'s merge:
    *
    *  - survivors that LOST a stored neighbor re-rank from their full
    *    candidate set (kept ∪ new blocks) — exact, and it already
    *    sees the ingested vectors;
    *  - survivors that only GAINED candidates merge their stored
    *    top-k (unrounded `cos_raw`) with the new pairs —
    *    topk(A∪B) ⊆ topk(A) ∪ B;
    *  - ingested sources take the top-k of their full candidate set;
    *  - every other source keeps its stored rows, and untouched
    *    bucket FILES hard-link into the fresh generation
    *    byte-identical ([[delete]]'s pruning, extended with the
    *    ingest's own buckets).
    *
    * Replay-idempotent WITHOUT markers (the [[Index.upsert]]
    * argument): a replayed upsert removes exactly the ids it itself
    * ingested and re-derives the same rows at the same fixed
    * centroids — survivors that now hold an ingested id in their
    * top-k re-enter the full re-rank, so the stored-row merge never
    * sees a pair twice (GraphStoreSpec's CDC case proves
    * stream + replay == the one-batch application).
    */
  def upsert(spark: SparkSession, name: String, embs: DataFrame,
      idCol: String, vecCol: String, seedCol: String,
      delIds: Option[DataFrame] = None, delCol: String = "id"): Unit =
    upsertImpl(spark, name, Some((embs, idCol, vecCol, seedCol)), delIds,
      delCol)

  /** The one removal+ingest commit path behind [[upsert]] AND
    * [[delete]] (delete is its empty-ingest specialization — the
    * [[Index.upsertImpl]] discipline). Phase 1 stages the three
    * bucket-pruned rewrites concurrently into fresh sibling dirs
    * while the catalog still serves the old generation — a crash
    * anywhere in phase 1 leaves the served graph untouched; phase 2
    * swaps the catalog over the complete fresh dirs and sweeps the
    * old ones.
    */
  private def upsertImpl(spark: SparkSession, name: String,
      ingest: Option[(DataFrame, String, String, String)],
      delIds: Option[DataFrame], delCol: String): Unit = {
    val metaRow = spark.table(part(name, "meta")).collect()(0)
    val (k, massign, nBuckets) = (metaRow.getAs[Int]("k"),
      metaRow.getAs[Int]("massign"), metaRow.getAs[Int]("nBuckets"))
    // removal set: every ingested id leaves first (an upsert of a
    // graphed id must REPLACE its vector), plus the explicit
    // tombstones. Explicit persist + finally-unpersist: the streaming
    // feeds call this once per micro-batch with batch-unique plans
    // (self-review r13 — the CounterStore-family cache discipline).
    val removalSrcs =
      ingest.map { case (df, ic, _, _) =>
        df.select(col(ic).cast("long").as("__del")) }.toSeq ++
      delIds.map(_.select(col(delCol).cast("long").as("__del"))).toSeq
    if (removalSrcs.isEmpty) return
    val del = removalSrcs.reduce(_ unionByName _).distinct().persist()
    val ingestBase = ingest.map { case (df, ic, vc, _) => baseOf(df, ic, vc) }
    try {
      // ONE bounded probe job (r18: was three — requireUniqueIds,
      // ingest isEmpty, del isEmpty): the unique-ingest-id
      // precondition (advice r16; multi-version batches LWW-collapse
      // first in GraphStream.applyChanges) and "a present-but-empty
      // ingest frame is a pure takedown" (the r16 verdict-#2
      // discipline: no empty delta staging) read off one aggregate.
      val probe = (Seq(del.select(lit("d").as("t"), col("__del").as("k"))) ++
        ingestBase.map(b => b.select(lit("i").as("t"), col("id").as("k"))))
        .reduce(_ unionByName _)
        .groupBy(col("t"), col("k")).agg(count(lit(1)).as("c"))
        .groupBy(col("t")).agg(count(lit(1)).as("groups"),
          max(when(col("c") > 1, col("k"))).as("dupk"),
          sum(when(col("c") > 1, lit(1)).otherwise(lit(0))).as("dups"))
        .collect().map(r => r.getString(0) -> r).toMap
      probe.get("i").filter(_.getLong(3) > 0).foreach { r =>
        throw new IllegalArgumentException(
          s"requirement failed: upsert ingest contains duplicate ids " +
            s"(e.g. ${r.get(2)}) — collapse to one row per id " +
            "(last-writer-wins) before upserting")
      }
      val hasIngest = probe.get("i").exists(_.getLong(1) > 0)
      if (!hasIngest && !probe.contains("d")) return
      val cents = spark.table(part(name, "cents"))
      val edgesTbl = part(name, "edges")
      val blocksTbl = part(name, "blocks")
      val labelsTbl = part(name, "labels")
      val (edgesDir, blocksDir, labelsDir) =
        (dirOf(spark, edgesTbl), dirOf(spark, blocksTbl), dirOf(spark, labelsTbl))
      val blocks = spark.read.parquet(blocksDir.toString)
      val keptBlocks =
        blocks.join(del, blocks("id") === col("__del"), "left_anti").persist()
      // the ingest delta's assignments at the STORED centroids —
      // [[append]]'s fixed-parameter contract
      val newBlocks = if (hasIngest) Some(Caching.cachedOnce(
        Similarity.assignWithVec(ingestBase.get, cents, massign)
          .select(col("cl"), col("id"), col("v"), col("nrm")))) else None
      val stored = spark.read.parquet(edgesDir.toString)
      val survivors = stored
        .join(del, stored("src_id") === col("__del"), "left_anti")
      // survivors that LOST a stored neighbor — full re-rank
      val touched = survivors
        .join(del, survivors("neighbor_id") === col("__del"), "left_semi")
        .select(col("src_id")).distinct().persist()
      // survivors that only GAINED candidates from the ingest —
      // stored-top-k ∪ new-pairs merge (disjoint from `touched`)
      def dstSide(df: DataFrame) = df.select(col("cl"),
        col("id").as("neighbor_id"), col("v"), col("nrm"))
      def srcSide(df: DataFrame) = df.select(col("cl"),
        col("id").as("src_id"), col("v").as("sv"), col("nrm").as("snrm"))
      def cos = (Vectors.dot(col("sv"), col("v"))
        / (col("snrm") * col("nrm"))).as("cos")
      val oldNewDedup = newBlocks.map { nb =>
        val p = srcSide(keptBlocks).join(dstSide(nb), Seq("cl"))
          .filter(col("src_id") =!= col("neighbor_id"))
          .select(col("src_id"), col("neighbor_id"), cos)
        Caching.cachedOnce(if (massign > 1) p.distinct() else p)
      }
      val gainedOnly = oldNewDedup.map(p =>
        p.select(col("src_id")).distinct()
          .join(touched, Seq("src_id"), "left_anti").persist())
      try {
        // full candidate set: kept blocks ∪ the ingest's assignments
        val allDst = newBlocks
          .map(nb => dstSide(keptBlocks).unionByName(dstSide(nb)))
          .getOrElse(dstSide(keptBlocks))
        val srcBlocks = keptBlocks
          .join(touched, keptBlocks("id") === touched("src_id"), "left_semi")
        val pairs = srcSide(srcBlocks).join(allDst, Seq("cl"))
          .filter(col("src_id") =!= col("neighbor_id"))
          .select(col("src_id"), col("neighbor_id"), cos)
        val reranked = Similarity.knnRankPairs(pairs, k, dedup = massign > 1)
        // gained-only survivors: stored rows (all still valid — no
        // lost neighbor) merged with the new pairs on the unrounded
        // ranking key; stored rows and new pairs are disjoint sets
        val merged = (oldNewDedup, gainedOnly) match {
          case (Some(onp), Some(g)) =>
            Some(Similarity.knnRankPairs(
              stored.join(g, Seq("src_id"), "left_semi")
                .select(col("src_id"), col("neighbor_id"),
                  col("cos_raw").as("cos"))
                .unionByName(onp.join(g, Seq("src_id"), "left_semi")),
              k, dedup = false))
          case _ => None
        }
        // ingested sources: top-k of their full candidate set
        val newEdges = newBlocks.map { nb =>
          Similarity.knnRankPairs(
            srcSide(nb).join(allDst, Seq("cl"))
              .filter(col("src_id") =!= col("neighbor_id"))
              .select(col("src_id"), col("neighbor_id"), cos),
            k, dedup = massign > 1)
        }
        val newLabels = ingest.map { case (df, ic, _, sc) =>
          df.select(col(ic).cast("long").as("id"),
            col(sc).cast("long").as("label"))
        }.filter(_ => hasIngest)

        val dir = edgesDir.getParent.toString
        val tag = if (hasIngest) "u" else "d"
        def fresh(p: String) =
          s"${p}_$tag${java.util.UUID.randomUUID().toString.take(8)}"
        def bucketOf(c: org.apache.spark.sql.Column) =
          pmod(hash(c), lit(nBuckets))
        // per-part touched-bucket digests (≤ nBuckets values each);
        // the ingest's own ids/clusters join the touched sets, so
        // every staged row hashes into a rewritten bucket. ONE
        // tagged-union collect for all three parts (r18: three
        // separate ~0.1 s digest jobs fused into one — same sets,
        // same ≤ 3·nBuckets bound)
        def tagb(df: DataFrame, t: String) =
          df.select(lit(t).as("t"), col("b"))
        val digests = (Seq(
            tagb(del.select(bucketOf(col("__del")).as("b")), "e"),
            tagb(del.select(bucketOf(col("__del")).as("b")), "l"),
            tagb(touched.select(bucketOf(col("src_id")).as("b")), "e"),
            tagb(blocks.join(del, blocks("id") === col("__del"), "left_semi")
              .select(bucketOf(col("cl")).as("b")), "b")) ++
          gainedOnly.map(g =>
            tagb(g.select(bucketOf(col("src_id")).as("b")), "e")) ++
          newBlocks.map(nb =>
            tagb(nb.select(bucketOf(col("id")).as("b")), "e")) ++
          newBlocks.map(nb =>
            tagb(nb.select(bucketOf(col("id")).as("b")), "l")) ++
          newBlocks.map(nb =>
            tagb(nb.select(bucketOf(col("cl")).as("b")), "b")))
          .reduce(_ unionByName _).distinct().collect()
          .groupBy(_.getString(0))
          .map { case (t, rs) => t -> rs.map(_.getInt(1)).toSet }
        val edgeBkts = digests.getOrElse("e", Set.empty[Int])
        val labelBkts = digests.getOrElse("l", Set.empty[Int])
        val blockBkts = digests.getOrElse("b", Set.empty[Int])
        // untagged files join the REWRITE read-set (never silently
        // kept or row-filtered away); kept files hard-link
        // byte-identical
        def split(d: java.nio.file.Path, bkts: Set[Int]) =
          ArtifactFiles.dataFiles(d).partition(f =>
            ArtifactFiles.bucketIdOf(f.getFileName.toString)
              .forall(bkts.contains))
        val (rewE, keptE) = split(edgesDir, edgeBkts)
        val (rewB, keptB) = split(blocksDir, blockBkts)
        val (rewL, keptL) = split(labelsDir, labelBkts)
        val (eNew, bNew, lNew) =
          (fresh("edges"), fresh("blocks"), fresh("labels"))
        def readFiles(files: Seq[java.nio.file.Path]) =
          spark.read.parquet(files.map(_.toString): _*)
        def stageWrite(df: DataFrame, p: String, key: String,
            newName: String): Unit = {
          val stageTbl = s"${part(name, p)}_stage_${newName.takeRight(8)}"
          Bucketing.writeBucketed(df, stageTbl, key, nBuckets,
            Some(s"$dir/$newName"))
          spark.sql(s"DROP TABLE ${ArtifactFiles.ident(stageTbl)}")
        }
        // phase 1, CONCURRENT: the pruned rewrites (removal + ingest
        // fused per part) land in fresh dirs through throwaway stage
        // tables — the real catalog entries still serve the old
        // generation, so a crash here leaves the served graph intact
        // (orphans swept by the next build)
        Par.jobs(Seq(
          () => if (rewE.nonEmpty || hasIngest) {
            // rows of the touched edge files whose src neither died,
            // re-ranks nor merges, plus the recomputed top-ks
            val kept = if (rewE.isEmpty) None else Some {
              val t = readFiles(rewE)
              val k0 = t.join(del, t("src_id") === col("__del"), "left_anti")
                .join(touched, Seq("src_id"), "left_anti")
              gainedOnly.map(g => k0.join(g, Seq("src_id"), "left_anti"))
                .getOrElse(k0)
            }
            stageWrite(
              (kept.toSeq ++ Seq(reranked) ++ merged.toSeq ++ newEdges.toSeq)
                .reduce(_ unionByName _),
              "edges", "src_id", eNew)
          },
          () => if (rewB.nonEmpty || hasIngest) {
            val kept = if (rewB.isEmpty) None else Some {
              val t = readFiles(rewB)
              t.join(del, t("id") === col("__del"), "left_anti")
            }
            stageWrite((kept.toSeq ++ newBlocks.toSeq)
              .reduce(_ unionByName _), "blocks", "cl", bNew)
          },
          () => if (rewL.nonEmpty || hasIngest) {
            val kept = if (rewL.isEmpty) None else Some {
              val t = readFiles(rewL)
              t.join(del, t("id") === col("__del"), "left_anti")
            }
            stageWrite((kept.toSeq ++ newLabels.toSeq)
              .reduce(_ unionByName _), "labels", "id", lNew)
          }))
        ArtifactFiles.linkFiles(keptE, java.nio.file.Paths.get(dir, eNew))
        ArtifactFiles.linkFiles(keptB, java.nio.file.Paths.get(dir, bNew))
        ArtifactFiles.linkFiles(keptL, java.nio.file.Paths.get(dir, lNew))
        // phase 2: catalog swaps over the COMPLETE fresh dirs, then
        // the old dirs go — one generation advance per part
        attachBucketed(spark, edgesTbl, "src_id", nBuckets, s"$dir/$eNew")
        attachBucketed(spark, blocksTbl, "cl", nBuckets, s"$dir/$bNew")
        attachBucketed(spark, labelsTbl, "id", nBuckets, s"$dir/$lNew")
        Seq(edgesDir, blocksDir, labelsDir)
          .foreach(ArtifactFiles.deleteRecursively)
      } finally { touched.unpersist(); keptBlocks.unpersist()
        gainedOnly.foreach(_.unpersist()); oldNewDedup.foreach(_.unpersist())
        newBlocks.foreach(_.unpersist()) }
    } finally { del.unpersist(); ingestBase.foreach(_.unpersist()) }
  }

  /** (Re-)create the catalog entry of a bucketed part over `location`
    * (schema recovered from the files' own footer — metadata-only).
    */
  private def attachBucketed(spark: SparkSession, tbl: String,
      key: String, nBuckets: Int, location: String): Unit = {
    if (spark.catalog.tableExists(tbl)) spark.sql(
      s"DROP TABLE ${ArtifactFiles.ident(tbl)}")
    val cols = spark.read.parquet(location).schema.toDDL
    spark.sql(
      s"""CREATE TABLE ${ArtifactFiles.ident(tbl)} ($cols) USING parquet
         |CLUSTERED BY ($key) SORTED BY ($key) INTO $nBuckets BUCKETS
         |LOCATION '${ArtifactFiles.sqlLit(location)}'""".stripMargin)
  }

  /** Offline file-count maintenance — [[Index.compact]]'s graph
    * analog. [[append]] delta-appends `blocks` and `labels` (one file
    * set per batch: incremental by construction), and every bucketed
    * write can emit one file per (task × bucket) it holds, so a long
    * maintenance history accretes small files even though the edges
    * CONTENT compacts on each rewrite. This rewrites the three big
    * tables with an explicit pre-partition on their bucket key —
    * `repartition(n, key)` and `bucketBy(n, key)` share the same
    * murmur3 hash partitioning, so each write task holds exactly one
    * bucket and the table lands as ≤ nBuckets files. Content is
    * byte-identical by construction (GraphStoreSpec asserts the
    * serve surfaces and the post-compact file counts); fresh sibling
    * dirs + catalog re-point + old-dir sweep, the artifact's
    * single-writer maintenance contract throughout.
    */
  def compact(spark: SparkSession, name: String): Unit = {
    val metaRow = spark.table(part(name, "meta")).collect()(0)
    val nBuckets = metaRow.getAs[Int]("nBuckets")
    Par.jobs(Seq(("edges", "src_id"), ("blocks", "cl"), ("labels", "id"))
      .map { case (p, key) => () => {
        val tbl = part(name, p)
        val oldDir = dirOf(spark, tbl)
        val rows = spark.read.parquet(oldDir.toString)
          .repartition(nBuckets, col(key))
        val newName = s"${p}_c${java.util.UUID.randomUUID().toString.take(8)}"
        Bucketing.writeBucketed(rows, tbl, key, nBuckets,
          Some(s"${oldDir.getParent}/$newName"))
        deleteDir(oldDir)
      }})
  }

  /** Operational snapshot — [[Index.describe]]'s graph analog: one
    * row per table with its backing directory name and file
    * count/bytes from the filesystem (no data read, no job). File
    * counts creep with delta appends; [[compact]] re-pins them.
    */
  def describe(spark: SparkSession, name: String): DataFrame = {
    import spark.implicits._
    val rows = Seq("edges", "labels", "blocks", "cents", "meta").map { p =>
      val d = dirOf(spark, part(name, p))
      val w = java.nio.file.Files.walk(d)
      val files = try {
        import scala.collection.JavaConverters._
        w.iterator().asScala.filter { f =>
          val n = f.getFileName.toString
          java.nio.file.Files.isRegularFile(f) &&
            !n.startsWith("_") && !n.startsWith(".")
        }.toVector
      } finally w.close()
      (p, d.getFileName.toString, files.size.toLong,
        files.map(java.nio.file.Files.size(_)).sum)
    }
    rows.toDF("part", "dir", "n_files", "bytes")
  }

  /** The stored edge list, (src_id, rank, neighbor_id, cos_micros) —
    * the [[Similarity.knnGraph]] output shape (`cos_raw` stays
    * internal to the artifact).
    */
  def edges(spark: SparkSession, name: String): DataFrame =
    spark.table(part(name, "edges"))
      .select(col("src_id"), col("rank"), col("neighbor_id"),
        col("cos_micros"))

  /** PageRank served from the stored edges: [[Graph.pageRank]] over a
    * zero-training scan. The edges table is bucketed by src_id, the
    * per-iteration contribution join keys on src — the n·k edge side
    * reads pre-hashed.
    */
  def pageRank(spark: SparkSession, name: String, iters: Int,
      dampingPct: Int = 85): DataFrame =
    Graph.pageRank(
      edges(spark, name)
        .select(col("src_id").as("src"), col("neighbor_id").as("dst")),
      iters, dampingPct)

  /** kNN classification served from the stored edges + labels — the
    * vote/tie-break half of [[Similarity.knnClassify]] with the graph
    * (and the label projection) read instead of recomputed. Output
    * identical: (id, pred_label, votes, label, correct).
    */
  def classify(spark: SparkSession, name: String): DataFrame = {
    val graph = edges(spark, name)
    val labels = spark.table(part(name, "labels"))
    val votes = graph
      .join(labels.select(col("id").as("neighbor_id"),
        col("label").as("nlabel")), "neighbor_id")
      .groupBy(col("src_id"), col("nlabel"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("votes").desc, col("nlabel").asc)
    votes.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("src_id").as("id"), col("nlabel").as("pred_label"),
        col("votes"))
      .join(labels, "id")
      .select(col("id"), col("pred_label"), col("votes"), col("label"),
        (col("pred_label") === col("label")).cast("long").as("correct"))
  }
}
