package graft.multimodal

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder-prompt requirement): media payloads
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract runs as a batched per-partition typed transformation
  * (the Scala analog of `mapInPandas` — same batch shape, no Python).
  *
  * Decode is REAL header parsing — pure byte arithmetic, no codec libs:
  * PNG (IHDR width/height, chunk walk), JPEG (segment walk to SOF0/SOF2),
  * GIF (logical screen descriptor), WAV (RIFF chunk walk: fmt channels /
  * sample rate, data frame count). Payloads the sniffer does not recognize
  * fall back to the deterministic stub (`format = "blob"`), so an unknown
  * kind degrades to the old plumbing-only behavior instead of failing.
  * FULL image/audio decode (pixels/samples) would need codec libs this
  * container lacks and stays out of scope; headers are the real contract a
  * 100-TB metadata-extraction pass runs on.
  *
  * The media fixture is synthesized deterministically from the documents
  * table as tiny VALID files of the four formats and parked at a fixed
  * path, so the DuckDB oracle can independently re-parse the same bytes
  * (hex arithmetic; a recursive CTE re-walks the JPEG segments).
  */
object MediaPipeline {

  final case class MediaRecord(doc_id: Long, kind: String, media: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long,
      kind: String,
      format: String, // sniffed from magic bytes, not trusted from `kind`
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      sample_rate: Int,
      channels: Int,
      emb: Array[Float])

  object MediaCodec {
    val BatchSize = 64 // Arrow-like batch shape for the vectorized analog

    // ---- byte helpers (0-based offsets) ----
    private def be(v: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte)
    private def le(v: Long, n: Int): Array[Byte] =
      Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)
    private def u8(bs: Array[Byte], o: Int): Int = bs(o) & 0xff
    private def be16(bs: Array[Byte], o: Int): Int = (u8(bs, o) << 8) | u8(bs, o + 1)
    private def be32(bs: Array[Byte], o: Int): Long =
      (u8(bs, o).toLong << 24) | (u8(bs, o + 1) << 16) | (u8(bs, o + 2) << 8) | u8(bs, o + 3)
    private def le16(bs: Array[Byte], o: Int): Int = u8(bs, o) | (u8(bs, o + 1) << 8)
    private def le32(bs: Array[Byte], o: Int): Long =
      u8(bs, o).toLong | (u8(bs, o + 1).toLong << 8) |
        (u8(bs, o + 2).toLong << 16) | (u8(bs, o + 3).toLong << 24)
    private def ascii(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    private def startsWith(bs: Array[Byte], at: Int, sig: Array[Byte]): Boolean =
      bs.length >= at + sig.length && sig.indices.forall(i => bs(at + i) == sig(i))

    private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = ascii(typ)
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      be(data.length.toLong, 4) ++ t ++ data ++ be(crc.getValue, 4)
    }

    // ---- synthesizers: tiny VALID files of each format ----
    def png(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
      val ihdr = be(w.toLong, 4) ++ be(h.toLong, 4) ++
        Array[Byte](8, 2, 0, 0, 0) // depth 8, truecolor, deflate, none, none
      PngSig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", body) ++
        pngChunk("IEND", Array.empty)
    }

    def jpeg(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
      val app0 = Array[Byte](0xff.toByte, 0xe0.toByte) ++ be(16L, 2) ++
        ascii("JFIF") ++ Array[Byte](0, 1, 1, 0) ++ be(1L, 2) ++ be(1L, 2) ++
        Array[Byte](0, 0)
      val comData = body.take(32000) // COM segment length is a BE16
      val com = Array[Byte](0xff.toByte, 0xfe.toByte) ++
        be(2L + comData.length, 2) ++ comData
      val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte) ++ be(11L, 2) ++
        Array[Byte](8) ++ be(h.toLong, 2) ++ be(w.toLong, 2) ++
        Array[Byte](1, 0x11, 0) // 1 component, 1x1 sampling, qtable 0
      Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ com ++ sof0 ++
        Array[Byte](0xff.toByte, 0xd9.toByte)
    }

    def gif(w: Int, h: Int, body: Array[Byte]): Array[Byte] =
      ascii("GIF89a") ++ le(w.toLong, 2) ++ le(h.toLong, 2) ++
        Array[Byte](0, 0, 0) ++ body

    def wav(channels: Int, sampleRate: Int, data0: Array[Byte]): Array[Byte] = {
      val blockAlign = channels * 2 // 16-bit PCM
      val data = data0.take(data0.length - data0.length % blockAlign)
      val fmt = le(1L, 2) ++ le(channels.toLong, 2) ++ le(sampleRate.toLong, 4) ++
        le(sampleRate.toLong * blockAlign, 4) ++ le(blockAlign.toLong, 2) ++ le(16L, 2)
      ascii("RIFF") ++ le(36L + data.length, 4) ++ ascii("WAVE") ++
        ascii("fmt ") ++ le(16L, 4) ++ fmt ++
        ascii("data") ++ le(data.length.toLong, 4) ++ data
    }

    // ---- decoders: sniff the magic, then parse the real structure ----

    /** PNG: verify the 8-byte signature, then walk chunks to IHDR (always
      * first in a valid file, but walked, not assumed). */
    private def decodePng(bs: Array[Byte]): Option[(Int, Int)] = {
      var o = 8
      while (o + 8 <= bs.length) {
        val len = be32(bs, o)
        val typ = new String(bs, o + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        if (typ == "IHDR" && len >= 8 && o + 16 <= bs.length)
          return Some((be32(bs, o + 8).toInt, be32(bs, o + 12).toInt))
        o += (8 + len + 4).toInt
      }
      None
    }

    /** JPEG: walk the segment chain from SOI; SOF0-SOF15 (except the
      * DHT/DAC/RST family C4/C8/CC) carry height/width at +5/+7. */
    private def decodeJpeg(bs: Array[Byte]): Option[(Int, Int)] = {
      var o = 2
      while (o + 4 <= bs.length && u8(bs, o) == 0xff) {
        val m = u8(bs, o + 1)
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (o + 9 <= bs.length)
            return Some((be16(bs, o + 7), be16(bs, o + 5)))
          return None
        }
        if (m == 0xd9 || (m >= 0xd0 && m <= 0xd8) || m == 0x01) o += 2
        else o += 2 + be16(bs, o + 2)
      }
      None
    }

    /** WAV: verify RIFF/WAVE, walk chunks for `fmt ` (channels, rate,
      * block align) and `data` (frame count = size / block align). */
    private def decodeWav(bs: Array[Byte]): Option[(Int, Int, Int)] = {
      var o = 12
      var channels = 0; var rate = 0; var blockAlign = 0; var frames = -1
      while (o + 8 <= bs.length) {
        val id = new String(bs, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = le32(bs, o + 4)
        if (id == "fmt " && size >= 16 && o + 24 <= bs.length) {
          channels = le16(bs, o + 10)
          rate = le32(bs, o + 12).toInt
          blockAlign = le16(bs, o + 20)
        } else if (id == "data" && blockAlign > 0)
          frames = (size / blockAlign).toInt
        o += (8 + size + (size % 2)).toInt // chunks are word-aligned
      }
      if (channels > 0 && frames >= 0) Some((channels, rate, frames)) else None
    }

    /** Deterministic 8-dim rolling-byte embedding — the feature-extraction
      * stand-in for a real encoder model (shape parity, no ML libs). */
    private def embed(bs: Array[Byte]): Array[Float] = {
      val emb = new Array[Float](8)
      var i = 0
      while (i < bs.length) { emb(i % 8) += (bs(i) & 0xff) / 255.0f; i += 1 }
      emb
    }

    /** Stub fallback for unrecognized payloads: the round-2 deterministic
      * fake, kept so an unknown format degrades instead of failing. */
    private def decodeBlob(r: MediaRecord): MediaFeatures = {
      val n = r.media.length.toLong
      MediaFeatures(r.doc_id, r.kind, "blob", n, (n % 640L).toInt,
        ((n * 7L) % 480L).toInt, (n % 16L).toInt, 0, 0, embed(r.media))
    }

    def decode(r: MediaRecord): MediaFeatures = {
      val bs = r.media
      val n = bs.length.toLong
      def img(format: String, dims: Option[(Int, Int)]): MediaFeatures =
        dims.map { case (w, h) =>
          MediaFeatures(r.doc_id, r.kind, format, n, w, h, 1, 0, 0, embed(bs))
        }.getOrElse(decodeBlob(r))
      if (startsWith(bs, 0, PngSig)) img("png", decodePng(bs))
      else if (bs.length >= 2 && u8(bs, 0) == 0xff && u8(bs, 1) == 0xd8)
        img("jpeg", decodeJpeg(bs))
      else if (startsWith(bs, 0, ascii("GIF87a")) || startsWith(bs, 0, ascii("GIF89a"))) {
        if (bs.length >= 10)
          MediaFeatures(r.doc_id, r.kind, "gif", n, le16(bs, 6), le16(bs, 8),
            1, 0, 0, embed(bs))
        else decodeBlob(r)
      } else if (startsWith(bs, 0, ascii("RIFF")) && startsWith(bs, 8, ascii("WAVE")))
        decodeWav(bs).map { case (ch, rate, frames) =>
          MediaFeatures(r.doc_id, r.kind, "wav", n, 0, 0, frames, rate, ch, embed(bs))
        }.getOrElse(decodeBlob(r))
      else decodeBlob(r)
    }
  }

  /** Fixed path for the synthesized media fixture — the DuckDB oracle
    * re-parses the same parquet's binary column byte-for-byte. */
  val MediaRoot = "/tmp/graft-cdc-media"

  /** Deterministic media fixture derived from `documents`: each doc's text
    * bytes become the body of a tiny VALID png/jpeg/gif/wav (dims and audio
    * params are arithmetic functions of doc_id), one doc in five stays a
    * raw blob to exercise the sniffer's fallback. Written once per (dir,
    * rowcount) to [[MediaRoot]] (marker-gated), then read back, so the
    * query decodes exactly the bytes the oracle parses. */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = Paths.get(MediaRoot)
    val out = root.resolve("media.parquet")
    val marker = root.resolve("_graft_spec")
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val sig = s"$dir|${docs.count()}|media-v2"
    val current = Files.exists(marker) &&
      new String(Files.readAllBytes(marker), "UTF-8") == sig
    if (!current) {
      Files.createDirectories(root)
      docs.select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          val body = Option(text).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val w = 1 + (Math.floorMod(id, 640L)).toInt
          val h = 1 + (Math.floorMod(id * 7L, 480L)).toInt
          Math.floorMod(id, 5L).toInt match {
            case 0 => MediaRecord(id, "image", MediaCodec.png(w, h, body))
            case 1 => MediaRecord(id, "image", MediaCodec.jpeg(w, h, body))
            case 2 => MediaRecord(id, "image", MediaCodec.gif(w, h, body))
            case 3 => MediaRecord(id, "audio", MediaCodec.wav(
              1 + Math.floorMod(id, 2L).toInt,
              8000 + Math.floorMod(id, 5L).toInt * 4000, body))
            case _ => MediaRecord(id, "blob", body)
          }
        }.toDF()
        .coalesce(1) // tiny fixture; a real media lake stays partitioned
        .write.mode("overwrite").parquet(out.toString)
      Files.write(marker, sig.getBytes("UTF-8"))
    }
    s.read.parquet(out.toString)
  }

  // ---- video frame sampling (y4m-style fixed-frame container) ---------

  final case class VideoRecord(doc_id: Long, media: Array[Byte])

  final case class SampledFrame(
      doc_id: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      frame_idx: Int,
      byte_sum: Long)

  /** Frame-walk a YUV4MPEG2 (y4m) stream — the uncompressed video
    * container whose fixed frame size makes sampling pure offset
    * arithmetic (the property a 100-TB frame-sampling pass relies on:
    * seek, don't decode). Header `YUV4MPEG2 W<w> H<h> ...\n` is parsed
    * from the bytes (not trusted from the synthesizer), each frame is a
    * `FRAME\n` marker + w·h·3/2 bytes of 4:2:0 planar data, and every
    * [[FrameSampleStep]]-th frame is emitted with its unsigned-byte sum
    * (the cheapest content digest both engines reproduce exactly).
    * Marker bytes are VERIFIED per frame — a malformed stream yields no
    * further frames rather than garbage offsets. */
  object VideoCodec {
    val FrameSampleStep = 2
    private val Marker = "FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

    def sample(r: VideoRecord): Seq[SampledFrame] = {
      val bs = r.media
      val nl = bs.indexOf('\n'.toByte)
      if (nl < 0) return Seq.empty
      val header = new String(bs, 0, nl, java.nio.charset.StandardCharsets.US_ASCII)
      val toks = header.split(" ")
      if (toks.isEmpty || toks(0) != "YUV4MPEG2") return Seq.empty
      val w = toks.collectFirst { case t if t.startsWith("W") => t.drop(1) }
        .flatMap(_.toIntOption)
      val h = toks.collectFirst { case t if t.startsWith("H") => t.drop(1) }
        .flatMap(_.toIntOption)
      (w, h) match {
        // upper bound keeps fs/stride inside Int (and any negative or
        // absurd header dimension yields Seq.empty, per the contract
        // above — toIntOption already absorbed non-numeric tokens)
        case (Some(w0), Some(h0)) if w0 > 0 && h0 > 0 &&
            w0.toLong * h0 * 3 / 2 + Marker.length <= bs.length =>
          val fs = w0 * h0 * 3 / 2
          val stride = Marker.length + fs
          val frames = Iterator.from(0)
            .map(f => (f, nl + 1 + f * stride))
            .takeWhile { case (_, o) =>
              o + stride <= bs.length &&
                Marker.indices.forall(i => bs(o + i) == Marker(i))
            }
            .map(_._1).toVector
          val nf = frames.length
          frames.filter(_ % FrameSampleStep == 0).map { f =>
            val base = nl + 1 + f * stride + Marker.length
            var sum = 0L
            var j = 0
            while (j < fs) { sum += (bs(base + j) & 0xff); j += 1 }
            SampledFrame(r.doc_id, w0, h0, nf, f, sum)
          }
        case _ => Seq.empty
      }
    }

    /** Synthesizer: a tiny VALID y4m stream; frame bytes are a pure
      * function of (doc_id, frame, offset) so the DuckDB oracle can
      * verify the sampled sums byte-for-byte from the parquet blob. */
    def y4m(id: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
      val header = s"YUV4MPEG2 W$w H$h F25:1\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val fs = w * h * 3 / 2
      val out = new java.io.ByteArrayOutputStream()
      out.write(header)
      (0 until nFrames).foreach { f =>
        out.write(Marker)
        (0 until fs).foreach(j =>
          out.write((Math.floorMod(id * 31L + f * 7L + j, 256L)).toInt))
      }
      out.toByteArray
    }
  }

  /** Deterministic video fixture: one small y4m stream per document
    * (dims/frame-count are arithmetic functions of doc_id). Separate
    * parquet + marker from the image/audio fixture so the two evolve
    * independently. */
  def videoTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val root = Paths.get(MediaRoot)
    val out = root.resolve("video.parquet")
    val marker = root.resolve("_graft_video_spec")
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val sig = s"$dir|${docs.count()}|video-v1"
    val current = Files.exists(marker) &&
      new String(Files.readAllBytes(marker), "UTF-8") == sig
    if (!current) {
      Files.createDirectories(root)
      docs.select(col("doc_id")).as[Long]
        .map { id =>
          val w = 4 + 2 * Math.floorMod(id, 4L).toInt
          val h = 4 + 2 * Math.floorMod(id * 3L, 4L).toInt
          val nf = 1 + Math.floorMod(id, 7L).toInt
          VideoRecord(id, VideoCodec.y4m(id, w, h, nf))
        }.toDF()
        .coalesce(1)
        .write.mode("overwrite").parquet(out.toString)
      Files.write(marker, sig.getBytes("UTF-8"))
    }
    s.read.parquet(out.toString)
  }

  /** Batched per-partition frame sampling over the binary column — same
    * vectorized batch shape as [[extractFeatures]]. */
  def sampleVideoFrames(s: SparkSession, video: DataFrame): DataFrame = {
    import s.implicits._
    video.as[VideoRecord]
      .mapPartitions { it =>
        it.grouped(MediaCodec.BatchSize)
          .flatMap(batch => batch.flatMap(VideoCodec.sample))
      }
      .toDF()
  }

  /** Batched per-partition feature extraction over the binary column. */
  def extractFeatures(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.as[MediaRecord]
      .mapPartitions { it =>
        // batch the partition like a vectorized UDF would (shape parity
        // with mapInPandas), then decode each batch
        it.grouped(MediaCodec.BatchSize).flatMap(batch => batch.map(MediaCodec.decode))
      }
      .toDF()
  }
}
