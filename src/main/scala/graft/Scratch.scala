package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._
import graft.cdc.Io

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val docs = Io.table(spark, dir, "documents")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    val base = docs.select(col("doc_id").as("id"),
      Dedup.shingles(TextAnalysis.tokens(col("text")), 3).as("sh"))

    time("scan only")(docs.count())
    time("shingles")(base.count())
    time("shingles forced")(base.select(sum(size(col("sh")))).head().getLong(0))
    val posts = base.select(col("id"), size(col("sh")).as("n"), explode(col("sh")).as("s"))
    time("posts")(posts.count())
    val joined = posts.as("l").join(posts.as("r"),
      col("l.s") === col("r.s") && col("l.id") < col("r.id"))
    time("posting join")(joined.count())
    time("full ngram")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2).count())

    val sigs = base.select(col("id"),
      graft.functions.ArrayExprs.minhashSig(col("sh"), Hashing.seeds(32)).as("sig"))
    time("minhash sigs")(sigs.count())
    time("minhash full")(Dedup.minhashPairs(docs, "doc_id", "text", 3, 32, 8, 4, 0.2).count())
    time("simhash sigs")(Dedup.simhashSignatures(docs, "doc_id", "text").count())
    spark.stop()
  }
}
