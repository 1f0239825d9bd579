package graft.codec

import java.math.{BigDecimal => JBigDecimal, BigInteger}
import java.nio.ByteBuffer
import java.nio.charset.Charset

/** Mainframe numeric / character codecs, re-implemented from public COBOL
  * storage-format semantics. Behavioral reference:
  * /root/reference/mf_spark/utils/encoding.py:112-276 (packed decimal,
  * zoned decimal, big-endian binary) and encoding.py:19-40 (CCSID→codec).
  * Pure Scala — used inside typed Dataset.map decoders (JVM-native, no
  * serialization wall, cf. SURVEY.md §2.11).
  */
object MainframeNum {

  /** EBCDIC code page 37 (the reference's default CCSID 037,
    * encoding.py:19-24). The JVM ships this charset natively; the full
    * 13-codepage registry (encoding.py:19-40 parity) lives in [[Ccsid]]. */
  val Cp037: Charset = Ccsid.charset(Ccsid.Default)

  def ebcdicToString(bytes: Array[Byte]): String = new String(bytes, Cp037)
  def stringToEbcdic(s: String): Array[Byte] = s.getBytes(Cp037)

  /** CCSID-parameterized variants (any of the 13 registered code pages). */
  def ebcdicToString(bytes: Array[Byte], ccsid: Int): String = Ccsid.decode(bytes, ccsid)
  def stringToEbcdic(s: String, ccsid: Int): Array[Byte] = Ccsid.encode(s, ccsid)

  // ---------------------------------------------------------------------
  // Packed decimal (COMP-3): two BCD digits per byte, final nibble = sign
  // (0xC/0xF positive, 0xD negative). Semantics per encoding.py:112-161.
  // ---------------------------------------------------------------------

  /** Decode packed-decimal bytes into a BigDecimal with the given scale. */
  def decodePacked(bytes: Array[Byte], scale: Int): JBigDecimal = {
    require(bytes.nonEmpty, "packed decimal needs at least one byte")
    val sb = new StringBuilder(bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      val hi = b >> 4
      val lo = b & 0x0f
      if (i == bytes.length - 1) {
        require(hi <= 9, s"bad packed digit $hi")
        sb.append(hi)
        require(lo >= 0xa, s"bad packed sign nibble $lo")
      } else {
        require(hi <= 9 && lo <= 9, s"bad packed digits $hi/$lo")
        sb.append(hi).append(lo)
      }
      i += 1
    }
    val sign = (bytes(bytes.length - 1) & 0x0f) match {
      case 0xd => -1
      case _   => 1 // C, F (and A/E per convention) are positive
    }
    val unscaled = new BigInteger(sb.toString)
    new JBigDecimal(if (sign < 0) unscaled.negate() else unscaled, scale)
  }

  /** Encode a BigDecimal into packed-decimal bytes for `digits` total digits
    * (storage = (digits+1)/2 + ... standard COBOL: ceil((digits+1)/2) bytes).
    * Inverse of [[decodePacked]]; round-trip property-tested. */
  def encodePacked(value: JBigDecimal, digits: Int): Array[Byte] = {
    val scale = value.scale
    val unscaled = value.unscaledValue()
    val neg = unscaled.signum() < 0
    val digitsStr = unscaled.abs().toString
    require(digitsStr.length <= digits,
      s"value $value needs ${digitsStr.length} digits > declared $digits (scale $scale)")
    val padded = ("0" * (digits - digitsStr.length)) + digitsStr
    // ensure an even count of digit nibbles before the sign nibble
    val full = if (padded.length % 2 == 0) "0" + padded else padded
    val nBytes = (full.length + 1) / 2
    val buf = new Array[Byte](nBytes)
    var i = 0
    var pos = 0
    while (i < full.length - 1) {
      buf(pos) = (((full.charAt(i) - '0') << 4) | (full.charAt(i + 1) - '0')).toByte
      i += 2; pos += 1
    }
    val sign = if (neg) 0xd else 0xc
    buf(nBytes - 1) = (((full.charAt(full.length - 1) - '0') << 4) | sign).toByte
    buf
  }

  /** Storage bytes for a COMP-3 field of `digits` digits (COBOL rule,
    * cf. vsam_types.py:345-356). */
  def packedStorageBytes(digits: Int): Int = digits / 2 + 1

  // ---------------------------------------------------------------------
  // Zoned decimal (DISPLAY): one EBCDIC digit per byte (0xF0-0xF9), sign
  // carried in the zone nibble of the LAST byte (C/F pos, D neg).
  // Semantics per encoding.py:209-256.
  // ---------------------------------------------------------------------

  def decodeZoned(bytes: Array[Byte], scale: Int): JBigDecimal = {
    require(bytes.nonEmpty, "zoned decimal needs at least one byte")
    val sb = new StringBuilder(bytes.length)
    var i = 0
    var sign = 1
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      val zone = b >> 4
      val digit = b & 0x0f
      require(digit <= 9, s"bad zoned digit $digit at $i")
      if (i == bytes.length - 1) {
        sign = zone match {
          case 0xd       => -1
          case 0xc | 0xf => 1
          case z         => throw new IllegalArgumentException(s"bad sign zone $z")
        }
      } else require(zone == 0xf, s"bad zone $zone at $i")
      sb.append(digit)
      i += 1
    }
    val unscaled = new BigInteger(sb.toString)
    new JBigDecimal(if (sign < 0) unscaled.negate() else unscaled, scale)
  }

  def encodeZoned(value: JBigDecimal, digits: Int): Array[Byte] = {
    val unscaled = value.unscaledValue()
    val neg = unscaled.signum() < 0
    val s = unscaled.abs().toString
    require(s.length <= digits, s"value $value needs ${s.length} digits > $digits")
    val padded = ("0" * (digits - s.length)) + s
    val out = new Array[Byte](digits)
    var i = 0
    while (i < digits) {
      val zone = if (i == digits - 1) (if (neg) 0xd else 0xc) else 0xf
      out(i) = ((zone << 4) | (padded.charAt(i) - '0')).toByte
      i += 1
    }
    out
  }

  // ---------------------------------------------------------------------
  // Binary (COMP / COMP-4 / COMP-5): big-endian two's complement.
  // Semantics per encoding.py:258-276.
  // ---------------------------------------------------------------------

  def decodeBinaryLong(bytes: Array[Byte]): Long = {
    require(bytes.length >= 1 && bytes.length <= 8, s"bad binary width ${bytes.length}")
    var v = if ((bytes(0) & 0x80) != 0) -1L else 0L
    var i = 0
    while (i < bytes.length) { v = (v << 8) | (bytes(i) & 0xffL); i += 1 }
    v
  }

  def encodeBinary(value: Long, width: Int): Array[Byte] = {
    val out = new Array[Byte](width)
    var v = value
    var i = width - 1
    while (i >= 0) { out(i) = (v & 0xff).toByte; v >>= 8; i -= 1 }
    out
  }

  def putLongBE(buf: ByteBuffer, v: Long): Unit = buf.putLong(v)
}
