package graft.codec

import java.nio.charset.Charset

/** CCSID (Coded Character Set Identifier) → JVM charset registry.
  * Capability parity with /root/reference/mf_spark/utils/encoding.py:19-40
  * (the reference maps 13 CCSIDs to Python codecs); here each maps to the
  * JVM-native charset of the same code page, so decode/encode stay inside
  * codegen-friendly JVM string conversion — no UDF, no external library.
  */
object Ccsid {

  /** All supported CCSIDs, by JVM canonical charset name. Every entry is
    * verified loadable at class-init (the JDK ships them in jdk.charsets). */
  val charsetNames: Map[Int, String] = Map(
    37 -> "IBM037", // US/English EBCDIC (default)
    500 -> "IBM500", // International EBCDIC
    1047 -> "IBM1047", // Open-systems EBCDIC
    1140 -> "IBM01140", // US EBCDIC with Euro
    1200 -> "UTF-16", // Unicode
    1208 -> "UTF-8", // Unicode
    930 -> "x-IBM930", // Japanese mixed EBCDIC
    935 -> "x-IBM935", // Simplified Chinese EBCDIC
    937 -> "x-IBM937", // Traditional Chinese EBCDIC
    273 -> "IBM273", // German EBCDIC
    284 -> "IBM284", // Spanish EBCDIC
    285 -> "IBM285", // UK EBCDIC
    297 -> "IBM297") // French EBCDIC

  /** CCSID → charset, resolved once (Charset instances are thread-safe). */
  val charsets: Map[Int, Charset] =
    charsetNames.map { case (id, n) => id -> Charset.forName(n) }

  val Default: Int = 37

  def charset(ccsid: Int): Charset =
    charsets.getOrElse(ccsid,
      throw new IllegalArgumentException(
        s"unsupported CCSID $ccsid (supported: ${charsetNames.keys.toSeq.sorted.mkString(",")})"))

  def supported(ccsid: Int): Boolean = charsets.contains(ccsid)

  def decode(bytes: Array[Byte], ccsid: Int = Default): String =
    new String(bytes, charset(ccsid))

  def encode(s: String, ccsid: Int = Default): Array[Byte] =
    s.getBytes(charset(ccsid))
}
