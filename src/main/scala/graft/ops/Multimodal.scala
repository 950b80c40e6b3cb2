package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing (builder brief;
  * beyond-reference extension per SURVEY §2.9/§7.4).
  *
  * Media is carried as an opaque `binary` column plus typed metadata —
  * the layout a 100 TB multimodal corpus actually uses (parquet binary
  * chunks + struct metadata, partitioned by kind/source so decode jobs
  * prune to one modality). Decode / feature-extraction runs as a
  * TYPED per-partition pipeline ([[decode]]): one decoder instance is
  * initialized per partition and streamed over the rows — the same
  * batch shape as an `mapInPandas`/Arrow UDF, without materializing
  * the partition. The codec itself is STUBBED (this container has no
  * image/audio libraries): [[StubCodec]] derives deterministic fake
  * dimensions/features from the content's md5, so the plumbing —
  * schema, partitioning, per-partition init, output contract — is real
  * and oracle-checkable while the native-library call is an explicit
  * single swap point.
  */
object Multimodal {

  /** A media row: opaque bytes + typed metadata. */
  case class MediaRow(media_id: Long, kind: String, content: Array[Byte],
      n_bytes: Long, source: String)

  /** Decoded/feature-extracted output. */
  case class DecodedMedia(media_id: Long, kind: String, width: Long,
      height: Long, channels: Long, brightness_micros: Long, content_md5: String)

  /** One sampled video frame. */
  case class Frame(media_id: Long, frame_idx: Long, frame_md5: String)

  /** Resize output: original + target dims, resized-content fingerprint. */
  case class ResizedMedia(media_id: Long, width: Long, height: Long,
      out_width: Long, out_height: Long, resized_md5: String)

  /** One extracted feature component (exploded layout — join-friendly
    * and oracle-comparable without array-ordering concerns).
    */
  case class MediaFeature(media_id: Long, kind: String, feat_idx: Long,
      feat_val: Long)

  // ------------------------------------------------------------- codec stub

  /** THE swap point: a real implementation wraps ImageIO / ffmpeg /
    * soundfile here. Deterministic fake: dimensions and features are
    * arithmetic over the content md5, so the DuckDB oracle reproduces
    * them exactly. One instance per partition (decoder init is the
    * expensive part in real codecs — same lifecycle as a connection in
    * a ForeachWriter).
    */
  final class StubCodec {
    private val md = java.security.MessageDigest.getInstance("MD5")

    def md5Hex(bytes: Array[Byte]): String = {
      md.reset()
      md.digest(bytes).map(b => f"$b%02x").mkString
    }

    private def hexField(hex: String, from: Int, len: Int): Long =
      java.lang.Long.parseLong(hex.substring(from, from + len), 16)

    def decode(m: MediaRow): DecodedMedia = {
      val hex = md5Hex(m.content) // ??? real codec: decode m.content instead
      DecodedMedia(
        media_id = m.media_id,
        kind = m.kind,
        width = 1 + hexField(hex, 0, 4) % 1024,
        height = 1 + hexField(hex, 4, 4) % 1024,
        channels = 1 + hexField(hex, 8, 2) % 4,
        brightness_micros = hexField(hex, 10, 6) % 1000000,
        content_md5 = hex)
    }

    /** Aspect-preserving resize to `maxDim` on the longest side —
      * real codec: an actual rescale; stub: integer-math target dims
      * from the decoded (fake) dims, resized payload fingerprinted as
      * md5 of the source md5 + target geometry.
      */
    def resize(m: MediaRow, maxDim: Int): ResizedMedia = {
      val d = decode(m)
      val longest = math.max(d.width, d.height)
      val ow = math.max(1L, d.width * maxDim / longest)
      val oh = math.max(1L, d.height * maxDim / longest)
      ResizedMedia(m.media_id, d.width, d.height, ow, oh,
        md5Hex(s"${d.content_md5}_${ow}x$oh".getBytes("UTF-8")))
    }

    /** Feature extraction: a `dim`-component vector — real codec: a
      * vision/audio embedding model; stub: dim equal hex slices of the
      * content md5 (dim must divide 32).
      */
    def features(m: MediaRow, dim: Int): Iterator[MediaFeature] = {
      val hex = md5Hex(m.content)
      val w = 32 / dim
      (0 until dim).iterator.map(j =>
        MediaFeature(m.media_id, m.kind, j.toLong, hexField(hex, j * w, w)))
    }

    /** Frame sampling: every `stride` bytes, up to `maxFrames` —
      * real codec: keyframe extraction.
      */
    def sampleFrames(m: MediaRow, stride: Int, maxFrames: Int): Iterator[Frame] = {
      val n = math.min(maxFrames, m.content.length / stride)
      (0 until n).iterator.map { i =>
        Frame(m.media_id, i.toLong,
          md5Hex(m.content.slice(i * stride, i * stride + stride)))
      }
    }
  }

  // ------------------------------------------------------------- pipeline

  /** Stage the driver's `documents` table as a media table: text bytes
    * as the opaque payload, modality round-robin by id. (A real corpus
    * reads parquet/tar shards of actual media bytes — shape-identical.)
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("content"),
      length(col("text")).cast("long").as("n_bytes"),
      col("source")).as[MediaRow]
  }

  /** Per-partition decode: codec initialized once per partition,
    * rows streamed through it.
    */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val codec = new StubCodec
      it.map(codec.decode)
    }
  }

  /** Aspect-preserving resize over the image modality only (filter →
    * partition pruning on a kind-partitioned layout), per-partition
    * codec lifecycle as [[decode]].
    */
  def resize(media: Dataset[MediaRow], maxDim: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image").mapPartitions { it =>
      val codec = new StubCodec
      it.map(m => codec.resize(m, maxDim))
    }
  }

  /** Feature extraction for every modality, exploded to one row per
    * vector component.
    */
  def features(media: Dataset[MediaRow], dim: Int): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val codec = new StubCodec
      it.flatMap(m => codec.features(m, dim))
    }
  }

  /** Frame sampling over the video modality only — the filter prunes
    * before any decode work (partition pruning when the table is laid
    * out partitioned by kind).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int,
      maxFrames: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video").mapPartitions { it =>
      val codec = new StubCodec
      it.flatMap(m => codec.sampleFrames(m, stride, maxFrames))
    }
  }

  // ------------------------------------------------------------- oracles

  private def hexFieldSql(hex: String, from: Int, len: Int): String =
    s"('0x' || substring($hex, ${from + 1}, $len))::BIGINT"

  val KindSql = "(['image', 'audio', 'video'])[doc_id % 3 + 1]"

  def decodeSql(table: String): String =
    s"""SELECT doc_id AS media_id, $KindSql AS kind,
       |  1 + ${hexFieldSql("md5(text)", 0, 4)} % 1024 AS width,
       |  1 + ${hexFieldSql("md5(text)", 4, 4)} % 1024 AS height,
       |  1 + ${hexFieldSql("md5(text)", 8, 2)} % 4 AS channels,
       |  ${hexFieldSql("md5(text)", 10, 6)} % 1000000 AS brightness_micros,
       |  md5(text) AS content_md5
       |FROM $table""".stripMargin

  def resizeSql(table: String, maxDim: Int): String =
    s"""WITH d AS (
       |  SELECT doc_id AS media_id,
       |    1 + ${hexFieldSql("md5(text)", 0, 4)} % 1024 AS width,
       |    1 + ${hexFieldSql("md5(text)", 4, 4)} % 1024 AS height,
       |    md5(text) AS content_md5
       |  FROM $table WHERE $KindSql = 'image'),
       |r AS (
       |  SELECT *, greatest(width, height) AS longest,
       |    greatest(1, width * $maxDim // greatest(width, height)) AS out_width,
       |    greatest(1, height * $maxDim // greatest(width, height)) AS out_height
       |  FROM d)
       |SELECT media_id, width, height, out_width, out_height,
       |  md5(content_md5 || '_' || out_width || 'x' || out_height) AS resized_md5
       |FROM r""".stripMargin

  def featuresSql(table: String, dim: Int): String = {
    val w = 32 / dim
    s"""SELECT doc_id AS media_id, $KindSql AS kind, j AS feat_idx,
       |  ('0x' || substring(md5(text), (j * $w + 1)::INT, $w))::BIGINT AS feat_val
       |FROM $table CROSS JOIN range(0, $dim) t(j)""".stripMargin
  }

  /** NOTE (oracle contract): Spark slices `content` BYTE-wise (it is a
    * binary column) while DuckDB's substring()/length() here are
    * CHARACTER-based — the two agree only because the staged
    * `documents.text` payload is ASCII (the sandbox DuckDB has no
    * md5(BLOB)/blob-slice functions to express the byte-wise form).
    * Real media payloads are opaque bytes and never go through a
    * varchar oracle; this ASCII assumption is a property of the test
    * staging only, not of the Spark pipeline.
    */
  def framesSql(table: String, stride: Int, maxFrames: Int): String =
    s"""SELECT doc_id AS media_id, i AS frame_idx,
       |  md5(substring(text, (i * $stride + 1)::INT, $stride)) AS frame_md5
       |FROM $table CROSS JOIN range(0, $maxFrames) t(i)
       |WHERE $KindSql = 'video' AND i < length(text) // $stride""".stripMargin
}
