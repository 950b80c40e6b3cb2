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
  * TYPED per-partition pipeline: one codec instance is initialized per
  * partition and the rows are streamed through it — the same batch
  * shape as a `mapInPandas`/Arrow UDF, without materializing the
  * partition.
  *
  * == The image codec is REAL ==
  *
  * [[ImageCodec]] decodes genuine PNG/JPEG bytes with the JDK's
  * `javax.imageio.ImageIO` (no new dependency): real width / height /
  * channels, real pixel reads for brightness and per-channel moments,
  * and a real integer nearest-neighbor rescale for the resize path.
  * 8-bit grayscale reads raw raster samples (TYPE_BYTE_GRAY's `getRGB`
  * would color-manage the linear gray space — a known exactness trap);
  * everything else reads packed sRGB via `getRGB` (alpha, if present,
  * is dropped and the image reports 3 channels).
  *
  * == How the oracle checks a codec DuckDB cannot run ==
  *
  * The sandbox DuckDB can't decode PNGs, so the correctness queries
  * stage a fixture whose pixel values are a pure integer FORMULA of
  * (media_id, x, y, channel) ([[pixelValue]]), encode those pixels as
  * real PNG bytes ([[imageFixture]] — PNG because it is lossless;
  * JPEG decodes through the same swap point but is not bit-stable
  * across codec builds), and run the real decode on the Spark side.
  * The DuckDB twin computes the same statistics directly from the
  * formula via range joins — it never sees the bytes. The two agree
  * ONLY if encode → ImageIO decode → pixel reads reproduce every
  * sample exactly, which makes the hash compare a genuine end-to-end
  * proof of the codec path (spec-pinned against a hand-made 2×2 PNG
  * as well). All derived statistics are integer math (`sum·10⁶ div
  * n`), so both engines agree bit-for-bit.
  *
  * Audio is REAL too: [[AudioCodec]] parses RIFF/PCM WAV with the
  * JDK's `javax.sound.sampled` (container properties + sample-exact
  * signal stats, same formula-oracle scheme over [[sampleValue]]).
  * Video is real at the CONTAINER + STILL level: [[VideoCodec]]
  * demuxes RIFF/AVI (avih header, movi frame chunks) and decodes
  * each sampled frame with ImageIO — the MJPEG/MPNG family. The one
  * honestly-absent piece is an inter-frame codec (H.264 etc.; the
  * JDK ships none). The round-8 byte-slice stub sampler is deleted;
  * frame extraction is demux-only ([[VideoCodec.extractFrames]]) and
  * spec-proven byte-exact against independent still encodes.
  */
object Multimodal {

  /** A media row: opaque bytes + typed metadata. */
  case class MediaRow(media_id: Long, kind: String, content: Array[Byte],
      n_bytes: Long, source: String)

  /** Decoded image: real dims/channels + integer mean brightness. */
  case class DecodedImage(media_id: Long, kind: String, width: Long,
      height: Long, channels: Long, brightness_micros: Long)

  /** Resize output: original + target dims, mean brightness of the
    * actually-resampled pixels.
    */
  case class ResizedImage(media_id: Long, width: Long, height: Long,
      out_width: Long, out_height: Long, resized_brightness_micros: Long)

  /** One extracted feature component (exploded layout — join-friendly
    * and oracle-comparable without array-ordering concerns).
    * For images: feat_idx 2c = channel-c mean·10⁶, 2c+1 = channel-c
    * second moment·10⁶.
    */
  case class MediaFeature(media_id: Long, kind: String, feat_idx: Long,
      feat_val: Long)

  /** One sampled video frame. */
  /** A frame EXTRACTED at stride — demuxed, NOT pixel-decoded: the
    * real keyframe/stride-sampling shape, where the container walk
    * slices out the raw frame payload and only header metadata + the
    * presentation timestamp surface (a downstream decoder or shipper
    * consumes the bytes). Every column is formula-oracle-checkable;
    * the byte-exactness of the slicing itself is spec-proven (the
    * demuxed chunk equals an independent still encode).
    */
  case class SampledFrame(media_id: Long, frame_idx: Long, width: Long,
      height: Long, n_frames: Long, frame_micros: Long)

  /** Decoded audio: real container/stream properties + integer signal
    * stats. `power` = mean of v² over all samples; `peak` = max |v| —
    * both non-negative on purpose (a signed mean would hit the
    * Spark-truncating vs DuckDB-flooring integer-division divergence).
    */
  case class DecodedAudio(media_id: Long, kind: String, sample_rate: Long,
      channels: Long, n_frames: Long, duration_micros: Long, power: Long,
      peak: Long)

  // --------------------------------------------------------- fixture formula

  /** The fixture's deterministic pixel law — the shared ground truth
    * both engines compute from. Kept to small primes so the SQL twin
    * is a one-liner; values cover the full 0..255 range.
    */
  def pixelValue(id: Long, x: Int, y: Int, c: Int): Int =
    ((id * 31 + x * 7 + y * 13 + c * 101) % 256).toInt

  /** Fixture geometry: width 4..32, height 4..26, alternating
    * grayscale (1 channel) and RGB (3 channels) by id parity — small
    * enough that the oracle's range-join stays trivial, varied enough
    * to exercise non-square dims and both raster layouts.
    */
  def fixtureWidth(id: Long): Int = 4 + (id % 29).toInt
  def fixtureHeight(id: Long): Int = 4 + ((id / 29) % 23).toInt
  def fixtureChannels(id: Long): Int = if (id % 2 == 0) 1 else 3

  private val DimsSqlBody =
    """SELECT doc_id AS media_id, 4 + doc_id % 29 AS w,
      |    4 + (doc_id // 29) % 23 AS h,
      |    CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS ch""".stripMargin

  /** The formula evaluated at (sx, sy): shared by the decode oracle
    * (identity sampling) and the resize oracle (nearest-neighbor
    * source coordinates).
    */
  private def pxSql(sx: String, sy: String): String =
    s"(media_id * 31 + ($sx) * 7 + ($sy) * 13 + c * 101) % 256"

  // ------------------------------------------------------------- image codec

  /** THE codec: JDK ImageIO for stills. One instance per partition
    * (decoder init and scratch buffers are the expensive part of real
    * codecs — same lifecycle as a connection in a ForeachWriter).
    */
  final class ImageCodec {
    javax.imageio.ImageIO.setUseCache(false) // no temp-file cache per call

    /** Encode the fixture's formula image as real PNG bytes. */
    def encodeFixturePng(id: Long): Array[Byte] = {
      val (w, h, ch) = (fixtureWidth(id), fixtureHeight(id), fixtureChannels(id))
      val img = new java.awt.image.BufferedImage(w, h,
        if (ch == 1) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          if (ch == 1) img.getRaster.setSample(x, y, 0, pixelValue(id, x, y, 0))
          else img.setRGB(x, y,
            (pixelValue(id, x, y, 0) << 16) | (pixelValue(id, x, y, 1) << 8) |
              pixelValue(id, x, y, 2))
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Real decode. None for undecodable bytes (callers drop such
      * rows; a quarantine is one anti-join away and the count never
      * scales with good data).
      */
    def read(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes)))
      catch { case _: java.io.IOException => None }

    /** Channel count as reported: raw 1 for grayscale rasters,
      * 3 otherwise (alpha dropped — see the object doc).
      */
    def channelsOf(img: java.awt.image.BufferedImage): Int =
      if (img.getRaster.getNumBands == 1) 1 else 3

    /** One pixel sample, exact: raster for gray, packed sRGB else. */
    def sample(img: java.awt.image.BufferedImage, x: Int, y: Int,
        c: Int): Int =
      if (img.getRaster.getNumBands == 1) img.getRaster.getSample(x, y, 0)
      else (img.getRGB(x, y) >> ((2 - c) * 8)) & 0xff

    def decode(m: MediaRow): Option[DecodedImage] = read(m.content).map { img =>
      val (w, h, ch) = (img.getWidth, img.getHeight, channelsOf(img))
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          var c = 0
          while (c < ch) { sum += sample(img, x, y, c); c += 1 }
          x += 1
        }
        y += 1
      }
      DecodedImage(m.media_id, m.kind, w, h, ch,
        sum * 1000000L / (w.toLong * h * ch))
    }

    /** Aspect-preserving integer nearest-neighbor rescale to `maxDim`
      * on the longest side; reports the mean brightness of the pixels
      * actually resampled (src coords `x·w div ow`, `y·h div oh`).
      */
    def resize(m: MediaRow, maxDim: Int): Option[ResizedImage] =
      read(m.content).map { img =>
        val (w, h, ch) = (img.getWidth, img.getHeight, channelsOf(img))
        val longest = math.max(w, h)
        val ow = math.max(1, w * maxDim / longest)
        val oh = math.max(1, h * maxDim / longest)
        var sum = 0L
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            val (sx, sy) = (x * w / ow, y * h / oh)
            var c = 0
            while (c < ch) { sum += sample(img, sx, sy, c); c += 1 }
            x += 1
          }
          y += 1
        }
        ResizedImage(m.media_id, w, h, ow, oh,
          sum * 1000000L / (ow.toLong * oh * ch))
      }

    /** Per-channel first and second moments (·10⁶, exact integer
      * division) — the cheap "embedding" every vision curation
      * pipeline starts from (channel statistics, exposure checks).
      */
    def features(m: MediaRow): Iterator[MediaFeature] =
      read(m.content).iterator.flatMap { img =>
        val (w, h, ch) = (img.getWidth, img.getHeight, channelsOf(img))
        val n = w.toLong * h
        (0 until ch).iterator.flatMap { c =>
          var s = 0L
          var s2 = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = sample(img, x, y, c).toLong
              s += v; s2 += v * v
              x += 1
            }
            y += 1
          }
          Iterator(
            MediaFeature(m.media_id, m.kind, 2L * c, s * 1000000L / n),
            MediaFeature(m.media_id, m.kind, 2L * c + 1, s2 * 1000000L / n))
        }
      }
  }

  // ------------------------------------------------------------ audio codec

  /** Audio fixture geometry/signal law (the [[pixelValue]] analog):
    * 16-bit signed PCM, frames 200..499, mono/stereo by parity,
    * sample rate 8/12/16 kHz by id mod 3.
    */
  def audioFrames(id: Long): Int = 200 + (id % 300).toInt
  def audioChannels(id: Long): Int = 1 + (id % 2).toInt
  def audioRate(id: Long): Int = 8000 + (id % 3).toInt * 4000
  def sampleValue(id: Long, i: Int, c: Int): Int =
    (((id * 37 + i * 11 + c * 101) % 65536) - 32768).toInt

  /** THE audio codec: JDK `javax.sound.sampled` WAV (RIFF/PCM)
    * decode — real container parse (sample rate, channels, bit
    * depth), real sample reads for the signal stats. 16-bit
    * little-endian signed PCM only (the WAV interchange baseline);
    * anything else — and undecodable bytes — returns None and drops,
    * like [[ImageCodec.read]]. Compressed audio (MP3/AAC) needs
    * codecs this container doesn't ship; the WAV path proves the
    * decode plumbing on a format the JDK genuinely parses.
    */
  final class AudioCodec {

    def encodeFixtureWav(id: Long): Array[Byte] = {
      val (nf, ch, rate) = (audioFrames(id), audioChannels(id), audioRate(id))
      val pcm = new Array[Byte](nf * ch * 2)
      var i = 0
      while (i < nf) {
        var c = 0
        while (c < ch) {
          val v = sampleValue(id, i, c)
          val off = (i * ch + c) * 2
          pcm(off) = (v & 0xff).toByte
          pcm(off + 1) = ((v >> 8) & 0xff).toByte
          c += 1
        }
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, ch,
        true, false)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nf.toLong),
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    def decode(m: MediaRow): Option[DecodedAudio] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(m.content))
        val f = in.getFormat
        if (f.getSampleSizeInBits != 16 || f.isBigEndian ||
          f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          None
        else {
          val bytes = readFully(in)
          val ch = f.getChannels
          val nf = bytes.length / (2 * ch)
          var sumSq = 0L
          var peak = 0L
          var s = 0
          val total = nf * ch
          while (s < total) {
            val lo = bytes(2 * s) & 0xff
            val hi = bytes(2 * s + 1).toInt
            val v = (hi << 8) | lo // sign comes from the high byte
            sumSq += v.toLong * v
            val a = math.abs(v.toLong)
            if (a > peak) peak = a
            s += 1
          }
          val rate = f.getSampleRate.toLong
          Some(DecodedAudio(m.media_id, m.kind, rate, ch.toLong, nf.toLong,
            nf.toLong * 1000000L / rate,
            if (total == 0) 0L else sumSq / total, peak))
        }
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }

    private def readFully(in: java.io.InputStream): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    }
  }

  // ------------------------------------------------------------ video codec

  /** One decoded, sampled video frame: real dims + brightness from
    * actual pixel reads of the demuxed frame.
    */
  case class DecodedFrame(media_id: Long, frame_idx: Long, width: Long,
      height: Long, brightness_micros: Long)

  /** Video fixture law: per-video frame count 4..8; frame `f`'s
    * pixels extend [[pixelValue]] with a frame term.
    */
  def videoFrameCount(id: Long): Int = 4 + (id % 5).toInt
  def framePixel(id: Long, f: Int, x: Int, y: Int, c: Int): Int =
    ((id * 31 + f * 59 + x * 7 + y * 13 + c * 101) % 256).toInt

  /** A demuxed AVI: main-header fields + raw frame chunk payloads in
    * stream order.
    */
  final case class AviFile(microSecPerFrame: Long, totalFrames: Long,
      width: Long, height: Long, frames: IndexedSeq[Array[Byte]])

  /** THE video swap point, now a real RIFF/AVI DEMUXER + real still
    * decode: walks the public RIFF chunk structure (`RIFF…AVI `,
    * `LIST hdrl` → `avih` main header, `LIST movi` → `00dc`/`00db`
    * frame chunks, even-byte padding), then decodes each sampled
    * frame with [[ImageCodec]] — the MJPEG/MPNG family, where every
    * frame is an independent still. What remains honestly absent is
    * an INTER-FRAME codec (H.264 etc.): the JDK ships none, so
    * temporally-compressed streams are out of scope, and the fixture
    * writes PNG frames (lossless → oracle-exact; a real MJPEG file
    * decodes through the same path, just not bit-stably).
    */
  final class VideoCodec {
    private val still = new ImageCodec

    private def fourcc(b: Array[Byte], p: Int): String =
      new String(b, p, 4, "US-ASCII")
    private def u32(b: Array[Byte], p: Int): Long =
      (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
        ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

    def parseAvi(bytes: Array[Byte]): Option[AviFile] = {
      if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
        fourcc(bytes, 8) != "AVI ") return None
      var microSec, total, w, h = 0L
      val frames = IndexedSeq.newBuilder[Array[Byte]]
      def walk(from: Int, until: Int, inMovi: Boolean): Unit = {
        var p = from
        while (p + 8 <= until) {
          val id = fourcc(bytes, p)
          val len = u32(bytes, p + 4).toInt
          val body = p + 8
          id match {
            case "LIST" =>
              val listType = fourcc(bytes, body)
              walk(body + 4, body + len, inMovi || listType == "movi")
            case "avih" =>
              microSec = u32(bytes, body)
              total = u32(bytes, body + 16)
              w = u32(bytes, body + 32)
              h = u32(bytes, body + 36)
            case c if inMovi && (c.endsWith("dc") || c.endsWith("db")) =>
              frames += java.util.Arrays.copyOfRange(bytes, body, body + len)
            case _ =>
          }
          p = body + len + (len & 1) // RIFF chunks pad to even
        }
      }
      walk(12, bytes.length, inMovi = false)
      Some(AviFile(microSec, total, w, h, frames.result()))
    }

    /** Demux WITHOUT decode: every `stride`-th frame chunk (up to
      * `maxFrames`) sliced out of `movi`, surfaced as header metadata
      * + timestamp — keyframe extraction's cost shape (container
      * walk + a copy; no pixel work). The chunk bytes are materially
      * extracted (they are what a real sampler hands downstream);
      * their byte-exactness is spec-proven against an independent
      * still encode.
      */
    def extractFrames(m: MediaRow, stride: Int,
        maxFrames: Int): Iterator[SampledFrame] =
      parseAvi(m.content).iterator.flatMap { avi =>
        avi.frames.iterator.zipWithIndex
          .filter { case (_, i) => i % stride == 0 && i / stride < maxFrames }
          .map { case (chunk, i) =>
            // touch the extracted payload (length check) — the slice
            // is the deliverable; everything else is header metadata
            require(chunk.length > 0, "empty frame chunk")
            SampledFrame(m.media_id, i.toLong, avi.width, avi.height,
              avi.totalFrames, i.toLong * avi.microSecPerFrame)
          }
      }

    /** The demuxed raw chunk payloads at stride — the byte deliverable
      * of [[extractFrames]], exposed for the slicing-exactness spec.
      */
    def extractChunks(m: MediaRow, stride: Int,
        maxFrames: Int): IndexedSeq[Array[Byte]] =
      parseAvi(m.content).toIndexedSeq.flatMap { avi =>
        avi.frames.zipWithIndex
          .filter { case (_, i) => i % stride == 0 && i / stride < maxFrames }
          .map(_._1)
      }

    /** Demux + decode every `stride`-th frame (up to `maxFrames`),
      * reporting real dims and brightness per sampled frame.
      */
    def sampleFrames(m: MediaRow, stride: Int,
        maxFrames: Int): Iterator[DecodedFrame] =
      parseAvi(m.content).iterator.flatMap { avi =>
        avi.frames.iterator.zipWithIndex
          .filter { case (_, i) => i % stride == 0 && i / stride < maxFrames }
          .flatMap { case (frame, i) =>
            still.read(frame).map { img =>
              val (w, h, ch) = (img.getWidth, img.getHeight,
                still.channelsOf(img))
              var sum = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  var c = 0
                  while (c < ch) { sum += still.sample(img, x, y, c); c += 1 }
                  x += 1
                }
                y += 1
              }
              DecodedFrame(m.media_id, i.toLong, w.toLong, h.toLong,
                sum * 1000000L / (w.toLong * h * ch))
            }
          }
      }

    /** Encode the fixture video: RIFF/AVI with a real `avih` header
      * and one PNG per frame in `movi` ("MPNG": each frame an
      * independent still — the lossless cousin of MJPEG).
      */
    def encodeFixtureAvi(id: Long): Array[Byte] = {
      val (w, h) = (fixtureWidth(id), fixtureHeight(id))
      val n = videoFrameCount(id)
      val frames = (0 until n).map { f =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y,
              (framePixel(id, f, x, y, 0) << 16) |
                (framePixel(id, f, x, y, 1) << 8) |
                framePixel(id, f, x, y, 2))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        bos.toByteArray
      }
      val out = new java.io.ByteArrayOutputStream()
      def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
      def u32w(v: Long): Unit = {
        out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
        out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
      }
      val avih = { // 56-byte main header
        val b = new java.io.ByteArrayOutputStream()
        def u(v: Long): Unit = {
          b.write((v & 0xff).toInt); b.write(((v >> 8) & 0xff).toInt)
          b.write(((v >> 16) & 0xff).toInt); b.write(((v >> 24) & 0xff).toInt)
        }
        u(40000L); u(0); u(0); u(0) // 25 fps, maxBytesPerSec, padding, flags
        u(n.toLong); u(0); u(1); u(0) // totalFrames, initial, streams, sugg
        u(w.toLong); u(h.toLong); u(0); u(0); u(0); u(0)
        b.toByteArray
      }
      val moviBody = {
        val b = new java.io.ByteArrayOutputStream()
        b.write("movi".getBytes("US-ASCII"))
        frames.foreach { fr =>
          b.write("00dc".getBytes("US-ASCII"))
          var v = fr.length.toLong
          (0 until 4).foreach { i => b.write(((v >> (8 * i)) & 0xff).toInt) }
          b.write(fr)
          if ((fr.length & 1) == 1) b.write(0) // even padding
        }
        b.toByteArray
      }
      val hdrlBody = "hdrl".getBytes("US-ASCII") ++
        "avih".getBytes("US-ASCII") ++ {
          val b = new java.io.ByteArrayOutputStream()
          var v = avih.length.toLong
          (0 until 4).foreach { i => b.write(((v >> (8 * i)) & 0xff).toInt) }
          b.toByteArray
        } ++ avih
      val riffBody = 4 + // "AVI "
        8 + hdrlBody.length + 8 + moviBody.length
      cc("RIFF"); u32w(riffBody.toLong); cc("AVI ")
      cc("LIST"); u32w(hdrlBody.length.toLong); out.write(hdrlBody)
      cc("LIST"); u32w(moviBody.length.toLong); out.write(moviBody)
      out.toByteArray
    }
  }

  // ------------------------------------------------------------- pipeline

  /** Stage the driver's `documents` table as a media table: text bytes
    * as the opaque payload, modality round-robin by id. (A real corpus
    * reads parquet/tar shards of actual media bytes — shape-identical.)
    * Feeds modality routing/metadata queries over opaque payloads;
    * the decode pipelines use the REAL fixtures — [[imageFixture]]
    * (PNG), [[audioFixture]] (RIFF/WAVE PCM16), [[videoFixture]]
    * (RIFF/AVI with PNG frames).
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

  /** Stage one REAL PNG per document id: formula pixels
    * ([[pixelValue]]) encoded per-partition. Staging is part of the
    * measured queries by necessity (the test dirs are read-only); a
    * production corpus reads already-encoded bytes and skips straight
    * to decode.
    */
  def imageFixture(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      val codec = new ImageCodec
      it.map { id =>
        val png = codec.encodeFixturePng(id)
        MediaRow(id, "image", png, png.length.toLong, "fixture")
      }
    }
  }

  /** Stage one REAL RIFF/PCM WAV per document id: formula samples
    * ([[sampleValue]]) encoded per-partition — the audio analog of
    * [[imageFixture]].
    */
  def audioFixture(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      val codec = new AudioCodec
      it.map { id =>
        val wav = codec.encodeFixtureWav(id)
        MediaRow(id, "audio", wav, wav.length.toLong, "fixture")
      }
    }
  }

  /** Per-partition real WAV decode over the audio modality —
    * container properties + integer signal stats; undecodable or
    * non-PCM16 rows drop.
    */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "audio").mapPartitions { it =>
      val codec = new AudioCodec
      it.flatMap(codec.decode)
    }
  }

  /** Stage one REAL RIFF/AVI video (PNG frames) per document id —
    * the video analog of [[imageFixture]].
    */
  def videoFixture(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      val codec = new VideoCodec
      it.map { id =>
        val avi = codec.encodeFixtureAvi(id)
        MediaRow(id, "video", avi, avi.length.toLong, "fixture")
      }
    }
  }

  /** Per-partition real demux + frame decode over the video
    * modality: every `stride`-th frame, up to `maxFrames` per video.
    */
  def decodeVideoFrames(media: Dataset[MediaRow], stride: Int,
      maxFrames: Int): Dataset[DecodedFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video").mapPartitions { it =>
      val codec = new VideoCodec
      it.flatMap(m => codec.sampleFrames(m, stride, maxFrames))
    }
  }

  /** Per-partition real decode over the image modality (the filter
    * prunes to one modality — partition pruning on a kind-partitioned
    * layout). Undecodable rows drop (see [[ImageCodec.read]]).
    */
  def decodeImages(media: Dataset[MediaRow]): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image").mapPartitions { it =>
      val codec = new ImageCodec
      it.flatMap(codec.decode)
    }
  }

  /** Real aspect-preserving nearest-neighbor resize over the image
    * modality, per-partition codec lifecycle as [[decodeImages]].
    */
  def resizeImages(media: Dataset[MediaRow], maxDim: Int): Dataset[ResizedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image").mapPartitions { it =>
      val codec = new ImageCodec
      it.flatMap(m => codec.resize(m, maxDim))
    }
  }

  /** Real per-channel moment features, exploded to one row per
    * component.
    */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "image").mapPartitions { it =>
      val codec = new ImageCodec
      it.flatMap(codec.features)
    }
  }

  /** Frame EXTRACTION over the video modality only — real RIFF/AVI
    * demux at stride with NO pixel decode (the cheap half of X13b's
    * demux+decode): the filter prunes before any container work
    * (partition pruning when the table is laid out partitioned by
    * kind), and per row the cost is a chunk walk + maxFrames slices.
    */
  def extractFrames(media: Dataset[MediaRow], stride: Int,
      maxFrames: Int): Dataset[SampledFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video").mapPartitions { it =>
      val codec = new VideoCodec
      it.flatMap(m => codec.extractFrames(m, stride, maxFrames))
    }
  }

  // ------------------------------------------------------------- oracles

  /** Decode oracle: pure formula, never touches bytes — agreement
    * with the Spark side proves the PNG encode→decode→sample loop is
    * pixel-exact. Range joins are bounded by the fixture's max dims
    * (32×26×3), so the oracle stays |docs|·O(1).
    */
  def decodeImagesSql(table: String): String =
    s"""WITH dims AS ($DimsSqlBody FROM $table),
       |px AS (
       |  SELECT media_id, w, h, ch, ${pxSql("x", "y")} AS v
       |  FROM dims, range(0, 32) tx(x), range(0, 26) ty(y), range(0, 3) tc(c)
       |  WHERE x < w AND y < h AND c < ch)
       |SELECT media_id, 'image' AS kind, max(w)::BIGINT AS width,
       |  max(h)::BIGINT AS height, max(ch)::BIGINT AS channels,
       |  ((sum(v) * 1000000) // (max(w) * max(h) * max(ch)))::BIGINT
       |    AS brightness_micros
       |FROM px GROUP BY media_id""".stripMargin

  /** Resize oracle: the same nearest-neighbor source-coordinate law
    * (`x·w div ow`) evaluated through the formula.
    */
  def resizeImagesSql(table: String, maxDim: Int): String =
    s"""WITH dims AS ($DimsSqlBody FROM $table),
       |rd AS (
       |  SELECT *, greatest(1, (w * $maxDim) // greatest(w, h)) AS ow,
       |    greatest(1, (h * $maxDim) // greatest(w, h)) AS oh
       |  FROM dims),
       |px AS (
       |  SELECT media_id, w, h, ow, oh, ch,
       |    ${pxSql("(x * w) // ow", "(y * h) // oh")} AS v
       |  FROM rd, range(0, $maxDim) tx(x), range(0, $maxDim) ty(y),
       |    range(0, 3) tc(c)
       |  WHERE x < ow AND y < oh AND c < ch)
       |SELECT media_id, max(w)::BIGINT AS width, max(h)::BIGINT AS height,
       |  max(ow)::BIGINT AS out_width, max(oh)::BIGINT AS out_height,
       |  ((sum(v) * 1000000) // (max(ow) * max(oh) * max(ch)))::BIGINT
       |    AS resized_brightness_micros
       |FROM px GROUP BY media_id""".stripMargin

  /** Features oracle: per-channel Σv and Σv² through the formula. */
  def imageFeaturesSql(table: String): String =
    s"""WITH dims AS ($DimsSqlBody FROM $table),
       |px AS (
       |  SELECT media_id, w, h, c, ${pxSql("x", "y")} AS v
       |  FROM dims, range(0, 32) tx(x), range(0, 26) ty(y), range(0, 3) tc(c)
       |  WHERE x < w AND y < h AND c < ch),
       |mo AS (
       |  SELECT media_id, c, max(w) * max(h) AS n, sum(v) AS s,
       |    sum(v * v) AS s2
       |  FROM px GROUP BY media_id, c)
       |SELECT media_id, 'image' AS kind, (c * 2)::BIGINT AS feat_idx,
       |  ((s * 1000000) // n)::BIGINT AS feat_val FROM mo
       |UNION ALL
       |SELECT media_id, 'image' AS kind, (c * 2 + 1)::BIGINT AS feat_idx,
       |  ((s2 * 1000000) // n)::BIGINT AS feat_val FROM mo""".stripMargin

  /** Audio oracle: pure signal formula, never touches bytes —
    * agreement proves the WAV encode→parse→sample loop is
    * sample-exact (the [[decodeImagesSql]] argument, for sound).
    */
  def decodeAudioSql(table: String): String =
    s"""WITH dims AS (
       |  SELECT doc_id AS media_id, 200 + doc_id % 300 AS nf,
       |    1 + doc_id % 2 AS ch, 8000 + (doc_id % 3) * 4000 AS rate
       |  FROM $table),
       |sm AS (
       |  SELECT media_id, nf, ch, rate,
       |    ((media_id * 37 + i * 11 + c * 101) % 65536) - 32768 AS v
       |  FROM dims, range(0, 500) ti(i), range(0, 2) tc(c)
       |  WHERE i < nf AND c < ch)
       |SELECT media_id, 'audio' AS kind, max(rate)::BIGINT AS sample_rate,
       |  max(ch)::BIGINT AS channels, max(nf)::BIGINT AS n_frames,
       |  ((max(nf) * 1000000) // max(rate))::BIGINT AS duration_micros,
       |  (sum(v * v) // (max(nf) * max(ch)))::BIGINT AS power,
       |  max(abs(v))::BIGINT AS peak
       |FROM sm GROUP BY media_id""".stripMargin

  /** Video oracle: the frame-extended pixel formula over the SAMPLED
    * frame indices — proves demux picks the right chunks AND each
    * frame decodes pixel-exactly.
    */
  def decodeVideoFramesSql(table: String, stride: Int,
      maxFrames: Int): String =
    s"""WITH dims AS (
       |  SELECT doc_id AS media_id, 4 + doc_id % 29 AS w,
       |    4 + (doc_id // 29) % 23 AS h, 4 + doc_id % 5 AS nf
       |  FROM $table),
       |px AS (
       |  SELECT media_id, f, w, h,
       |    (media_id * 31 + f * 59 + x * 7 + y * 13 + c * 101) % 256 AS v
       |  FROM dims, range(0, 8) tf(f), range(0, 32) tx(x),
       |    range(0, 26) ty(y), range(0, 3) tc(c)
       |  WHERE f < nf AND f % $stride = 0 AND f // $stride < $maxFrames
       |    AND x < w AND y < h)
       |SELECT media_id, f::BIGINT AS frame_idx, max(w)::BIGINT AS width,
       |  max(h)::BIGINT AS height,
       |  ((sum(v) * 1000000) // (max(w) * max(h) * 3))::BIGINT
       |    AS brightness_micros
       |FROM px GROUP BY media_id, f""".stripMargin

  val KindSql = "(['image', 'audio', 'video'])[doc_id % 3 + 1]"

  /** NOTE (oracle contract): Spark slices `content` BYTE-wise (it is a
    * binary column) while DuckDB's substring()/length() here are
    * CHARACTER-based — the two agree only because the staged
    * `documents.text` payload is ASCII (the sandbox DuckDB has no
    * md5(BLOB)/blob-slice functions to express the byte-wise form).
    * Real media payloads are opaque bytes and never go through a
    * varchar oracle; this ASCII assumption is a property of the test
    * staging only, not of the Spark pipeline.
    */
  /** Frame-extraction oracle: pure fixture formula — proves the demux
    * reads the real `avih` header fields (dims, totalFrames, 25 fps
    * → 40000 µs/frame) and selects exactly the stride-sampled chunk
    * indices, without any pixel work on either engine.
    */
  def framesSql(table: String, stride: Int, maxFrames: Int): String =
    s"""WITH dims AS (
       |  SELECT doc_id AS media_id, 4 + doc_id % 29 AS w,
       |    4 + (doc_id // 29) % 23 AS h, 4 + doc_id % 5 AS nf
       |  FROM $table)
       |SELECT media_id, (i * $stride)::BIGINT AS frame_idx,
       |  w::BIGINT AS width, h::BIGINT AS height, nf::BIGINT AS n_frames,
       |  (i * $stride * 40000)::BIGINT AS frame_micros
       |FROM dims CROSS JOIN range(0, $maxFrames) t(i)
       |WHERE i * $stride < nf""".stripMargin
}
