package graft.codec

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.sql.Timestamp

import graft.model.ChangeEvent

/** Binary change-record codec — our WAL record format. The layout is a
  * fixed header + length-prefixed fields, deliberately exercising the
  * reference's mainframe storage semantics (SURVEY.md §2.3 P4-P10):
  * big-endian binary integers (COMP analog, encoding.py:258-276), EBCDIC
  * cp037 character data (encoding.py:279-306), zoned decimal
  * (encoding.py:209-256) and packed decimal COMP-3 (encoding.py:112-161)
  * for the v2 evolved columns.
  *
  * Record layout (big-endian throughout):
  * {{{
  *   byte   0      schemaVersion (1 | 2)
  *   byte   1      op tag: 'I' | 'U' | 'D'  (REDEFINES-style dispatch)
  *   bytes  2-9    seq      int64  (COMP-8 analog)
  *   bytes 10-17   warc_ts  int64 epoch micros
  *   url   : int16 len + EBCDIC(IBM037) bytes        (PIC X(n) analog)
  *   lang  : 2 bytes EBCDIC, space-padded            (PIC X(2) analog)
  *   text  : int32 len (-1 = null) + UTF-8 bytes
  *   html  : int32 len (-1 = null) + raw bytes
  *   -- schemaVersion >= 2 only --
  *   fetch_status : 3-byte zoned decimal (PIC 9(3))
  *   content_len  : 6-byte packed decimal (PIC S9(11) COMP-3)
  * }}}
  */
object RecordCodec {

  val SchemaV1 = 1
  val SchemaV2 = 2

  /** Evolved columns carried by v2 records, in promotion order. */
  val V2Columns: Seq[(String, String)] =
    Seq("fetch_status" -> "int", "content_len" -> "bigint")

  def encode(e: ChangeEvent): Array[Byte] = {
    val bos = new ByteArrayOutputStream(64 +
      (if (e.text == null) 0 else e.text.length) +
      (if (e.html == null) 0 else e.html.length))
    val out = new DataOutputStream(bos)
    require(e.schemaVersion == SchemaV1 || e.schemaVersion == SchemaV2,
      s"unsupported schema version ${e.schemaVersion}")
    out.writeByte(e.schemaVersion)
    out.writeByte(e.op.charAt(0))
    out.writeLong(e.seq)
    out.writeLong(e.warcTs.getTime * 1000L + (e.warcTs.getNanos / 1000) % 1000)
    val urlBytes = MainframeNum.stringToEbcdic(e.url)
    require(urlBytes.length <= Short.MaxValue, "url too long")
    out.writeShort(urlBytes.length)
    out.write(urlBytes)
    val lang2 = (Option(e.lang).getOrElse("") + "  ").substring(0, 2)
    out.write(MainframeNum.stringToEbcdic(lang2))
    writeLenPrefixed(out, if (e.text == null) null else e.text.getBytes("UTF-8"))
    writeLenPrefixed(out, e.html)
    if (e.schemaVersion >= SchemaV2) {
      val fs = e.extra.getOrElse("fetch_status", "0").toLong
      out.write(MainframeNum.encodeZoned(java.math.BigDecimal.valueOf(fs), 3))
      val cl = e.extra.getOrElse("content_len", "0").toLong
      out.write(MainframeNum.encodePacked(java.math.BigDecimal.valueOf(cl), 11))
    }
    out.flush()
    bos.toByteArray
  }

  private def writeLenPrefixed(out: DataOutputStream, bytes: Array[Byte]): Unit =
    if (bytes == null) out.writeInt(-1)
    else { out.writeInt(bytes.length); out.write(bytes) }

  def decode(bytes: Array[Byte]): ChangeEvent = {
    val buf = ByteBuffer.wrap(bytes) // big-endian by default
    val schemaVersion = buf.get().toInt
    require(schemaVersion == SchemaV1 || schemaVersion == SchemaV2,
      s"unsupported schema version $schemaVersion")
    val op = buf.get().toChar.toString
    val seq = buf.getLong()
    val tsMicros = buf.getLong()
    val ts = microsToTimestamp(tsMicros)
    val urlLen = buf.getShort() & 0xffff
    val urlBytes = new Array[Byte](urlLen); buf.get(urlBytes)
    val url = MainframeNum.ebcdicToString(urlBytes)
    val langBytes = new Array[Byte](2); buf.get(langBytes)
    val lang = MainframeNum.ebcdicToString(langBytes).trim
    val text = readLenPrefixed(buf).map(new String(_, "UTF-8")).orNull
    val html = readLenPrefixed(buf).orNull
    val extra: Map[String, String] =
      if (schemaVersion >= SchemaV2) {
        val zoned = new Array[Byte](3); buf.get(zoned)
        val fetchStatus = MainframeNum.decodeZoned(zoned, 0).longValueExact()
        val packed = new Array[Byte](MainframeNum.packedStorageBytes(11)); buf.get(packed)
        val contentLen = MainframeNum.decodePacked(packed, 0).longValueExact()
        Map("fetch_status" -> fetchStatus.toString, "content_len" -> contentLen.toString)
      } else Map.empty
    ChangeEvent(op, seq, url, ts, html, text, lang, schemaVersion, extra)
  }

  private def readLenPrefixed(buf: ByteBuffer): Option[Array[Byte]] = {
    val len = buf.getInt()
    if (len < 0) None
    else { val a = new Array[Byte](len); buf.get(a); Some(a) }
  }

  def microsToTimestamp(micros: Long): Timestamp = {
    val ts = new Timestamp(Math.floorDiv(micros, 1000L))
    ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    ts
  }

  // -------------------------------------------------------------------
  // Segment framing: magic + version, then int32-length-prefixed records.
  // One segment file = one WAL chunk; decode parallelism = #segments.
  // -------------------------------------------------------------------

  val SegmentMagic: Array[Byte] = "GWAL".getBytes("US-ASCII")

  def frameSegment(records: Iterator[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.write(SegmentMagic)
    out.writeInt(1)
    records.foreach { r => out.writeInt(r.length); out.write(r) }
    out.flush()
    bos.toByteArray
  }

  /** Iterate raw records of a framed segment (lazy, no copy of the whole). */
  def readSegment(segment: Array[Byte]): Iterator[Array[Byte]] = {
    val buf = ByteBuffer.wrap(segment)
    val magic = new Array[Byte](4); buf.get(magic)
    require(java.util.Arrays.equals(magic, SegmentMagic), "bad segment magic")
    val ver = buf.getInt()
    require(ver == 1, s"bad segment version $ver")
    new Iterator[Array[Byte]] {
      def hasNext: Boolean = buf.remaining() > 4
      def next(): Array[Byte] = {
        val len = buf.getInt()
        val a = new Array[Byte](len); buf.get(a); a
      }
    }
  }

  def decodeSegment(segment: Array[Byte]): Iterator[ChangeEvent] =
    readSegment(segment).map(decode)
}
