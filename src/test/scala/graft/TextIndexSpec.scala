package graft

import java.nio.file.Files
import java.security.MessageDigest

import scala.collection.JavaConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

/** Persisted inverted text index: the build/serve split for BM25 and
  * its EXACT maintenance laws — search-after-append/delete equals a
  * from-scratch build bit-for-bit (BM25's global stats are sums, so
  * no fixed-parameter compromise exists), plus the byte-level
  * append-only / bucket-pruned file guarantees. End-to-end the same
  * contracts are proven by the shared DuckDB oracles
  * (q_text_index_search/append/delete share q_text_bm25's SQL).
  */
class TextIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def docs = cdc.Io.table(spark, sf, "documents")

  private def tmpBase(tag: String): String =
    Files.createTempDirectory(s"graft_tidx_$tag").toString

  private def fileHashes(dir: String): Map[String, String] = {
    val root = java.nio.file.Paths.get(dir)
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .filterNot { p =>
        val n = p.getFileName.toString
        n.startsWith("_") || n.startsWith(".")
      }
      .map { p =>
        val md5 = MessageDigest.getInstance("MD5")
          .digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
        root.relativize(p).toString -> md5
      }.toMap
  }

  private def searchOf(name: String) =
    TextIndex.search(spark, name, k = 10)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq

  private def inPlan(corpus: org.apache.spark.sql.DataFrame) =
    Retrieval.bm25TopK(corpus, "doc_id", "text", k = 10)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("search from the artifact equals the in-plan BM25 bit-for-bit") {
    TextIndex.build(spark, docs, "doc_id", "text", "tidx_eq",
      nBuckets = 4, baseDir = Some(tmpBase("eq")))
    val got = searchOf("tidx_eq")
    assert(got.nonEmpty && got == inPlan(docs))
  }

  test("append equals a rebuild over the union; committed files byte-untouched; replay is a no-op") {
    val dir = tmpBase("app")
    val even = docs.filter(col("doc_id") % 2 === 0)
    val odd = docs.filter(col("doc_id") % 2 === 1)
    TextIndex.build(spark, even, "doc_id", "text", "tidx_app",
      nBuckets = 4, baseDir = Some(dir))
    val before = fileHashes(s"$dir/tidx_app/postings")
    TextIndex.append(spark, "tidx_app", odd, "doc_id", "text")
    // append-only: every committed posting file survives byte-identical
    val after = fileHashes(s"$dir/tidx_app/postings")
    for ((n, h) <- before)
      assert(after.get(n).contains(h), s"committed file $n changed")
    assert(after.size > before.size, "append landed no delta files")
    // exactness: search == in-plan BM25 over the UNION (global stats
    // df/N/avgdl are sums, so the append is exact, not approximate)
    val got = searchOf("tidx_app")
    assert(got.nonEmpty && got == inPlan(docs))
    // replayed append: known ids are dropped up front, nothing changes
    TextIndex.append(spark, "tidx_app", odd, "doc_id", "text")
    assert(searchOf("tidx_app") == got)
  }

  test("delete equals a rebuild over survivors; untouched tok-bucket files byte-identical") {
    val dir = tmpBase("del")
    TextIndex.build(spark, docs, "doc_id", "text", "tidx_del",
      nBuckets = 4, baseDir = Some(dir))
    val delDocs = docs.filter(col("doc_id") % 3 === 0)
    // touched tok buckets, from the deleted docs' own tokens
    val touched = delDocs
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .select(pmod(hash(col("tok")), lit(4))).distinct()
      .as[Int].collect().toSet
    val bucketRe = """.*_(\d+)(?:\..*)?$""".r
    def bOf(n: String): Int =
      n match { case bucketRe(b) => b.toInt; case _ => -1 }
    val before = fileHashes(s"$dir/tidx_del/postings")

    TextIndex.delete(spark, "tidx_del",
      delDocs.select(col("doc_id")), "doc_id")

    val newDir = Files.list(java.nio.file.Paths.get(s"$dir/tidx_del"))
      .iterator().asScala
      .find(d => Files.isDirectory(d) &&
        d.getFileName.toString.startsWith("postings_d"))
      .getOrElse(fail("no fresh postings dir after delete"))
    val after = fileHashes(newDir.toString)
    val (wasTouched, wasKept) =
      before.partition { case (n, _) => touched.contains(bOf(n)) }
    // with a real vocabulary most buckets are touched; the law needs
    // at least the partition to be non-degenerate on one side
    assert(wasTouched.nonEmpty)
    for ((n, h) <- wasKept)
      assert(after.get(n).contains(h), s"untouched file $n changed")
    for ((n, _) <- wasTouched)
      assert(!after.contains(n), s"touched file $n not rewritten")
    // exactness: search == in-plan BM25 over the survivors (stats
    // corrected by negative deltas, not recomputed)
    val got = searchOf("tidx_del")
    assert(got.nonEmpty &&
      got == inPlan(docs.filter(col("doc_id") % 3 =!= 0)))
    // cross-session portability: drop every catalog entry, re-attach
    // from files (bucketing spec included), serve identically — and
    // the re-attached serving scan is still bucket-pruned
    for (p <- Seq("postings", "dl", "stats", "meta"))
      spark.sql(s"DROP TABLE IF EXISTS tidx_del_$p")
    TextIndex.register(spark, "tidx_del", dir)
    assert(searchOf("tidx_del") == got)
    val servePlan = TextIndex.search(spark, "tidx_del", k = 10)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(servePlan.contains("SelectedBucketsCount"),
      "re-attached serving scan lost bucket pruning")
  }

  test("compact collapses delta files and the stats chain; search unchanged; register still resolves") {
    val dir = tmpBase("cmp")
    val third = docs.filter(col("doc_id") % 3 === 0)
    TextIndex.build(spark, docs.filter(col("doc_id") % 3 === 1),
      "doc_id", "text", "tidx_cmp", nBuckets = 4, baseDir = Some(dir))
    TextIndex.append(spark, "tidx_cmp",
      docs.filter(col("doc_id") % 3 === 2), "doc_id", "text")
    TextIndex.append(spark, "tidx_cmp", third, "doc_id", "text")
    TextIndex.delete(spark, "tidx_cmp", third.select(col("doc_id")),
      "doc_id")
    val before = searchOf("tidx_cmp")
    val statsRowsBefore = spark.table("tidx_cmp_stats").count()

    TextIndex.compact(spark, "tidx_cmp")

    // search byte-for-byte unchanged (sums are sums)
    assert(searchOf("tidx_cmp") == before)
    // the stats delta chain merged: one row per live term, all df > 0
    // (the deleted third's +df/-df pairs cancelled and were dropped)
    val stats = spark.table("tidx_cmp_stats")
    assert(stats.count() < statsRowsBefore)
    assert(stats.groupBy("tok").count().filter(col("count") > 1).count() == 0)
    assert(stats.filter(col("df") <= 0).count() == 0)
    // meta collapsed to one row carrying the same sums
    assert(spark.table("tidx_cmp_meta").count() == 1)
    // file count re-pinned: ≤ one file per bucket per part
    for (p <- Seq("postings", "dl", "stats")) {
      import scala.collection.JavaConverters._
      val loc = java.nio.file.Files.list(
          java.nio.file.Paths.get(s"$dir/tidx_cmp"))
        .iterator().asScala
        .find(d => d.getFileName.toString.startsWith(s"${p}_c"))
        .getOrElse(fail(s"no compacted dir for $p"))
      val files = java.nio.file.Files.list(loc).iterator().asScala
        .count { f =>
          val n = f.getFileName.toString
          java.nio.file.Files.isRegularFile(f) &&
            !n.startsWith("_") && !n.startsWith(".")
        }
      assert(files <= 4, s"$p has $files files after compact")
    }
    // a fresh catalog resolves the compacted layout
    for (p <- Seq("postings", "dl", "stats", "meta"))
      spark.sql(s"DROP TABLE IF EXISTS tidx_cmp_$p")
    TextIndex.register(spark, "tidx_cmp", dir)
    assert(searchOf("tidx_cmp") == before)
  }
}
