package graft.schema

import java.math.{BigDecimal => JBigDecimal}
import java.nio.ByteBuffer

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.codec.MainframeNum
import graft.schema.Copybook._

/** Copybook-driven fixed-length record decode/encode — the declarative
  * "record schema → byte slicing → typed values" capability
  * (/root/reference/mf_spark/parsers/copybook_parser.py:358-400 layout use;
  * /root/reference/mf_spark/utils/encoding.py:112-276 field codecs;
  * docs/HOW_IT_WORKS.md:236-247). Values produced in [[Copybook.toSparkSchema]]
  * order so `spark.createDataFrame(rows, schema)` round-trips. */
object CopybookCodec {

  def decodeValue(f: Field, bytes: Array[Byte], offset: Int): Any = {
    val len = f.unitLength
    val slice = java.util.Arrays.copyOfRange(bytes, offset, offset + len)
    val p = f.pic.getOrElse(
      throw new IllegalArgumentException(s"${f.name} is a group"))
    f.usage match {
      case Comp1 => ByteBuffer.wrap(slice).getFloat
      case Comp2 => ByteBuffer.wrap(slice).getDouble
      case Display if p.alpha =>
        // PIC X: EBCDIC, right-trim the space padding (P2 semantics)
        val s = MainframeNum.ebcdicToString(slice)
        s.replaceAll("\\s+$", "")
      case Display =>
        narrow(MainframeNum.decodeZoned(slice, p.scale), f)
      case Comp3 =>
        narrow(MainframeNum.decodePacked(slice, p.scale), f)
      case Comp =>
        narrow(JBigDecimal.valueOf(MainframeNum.decodeBinaryLong(slice), p.scale), f)
    }
  }

  private def narrow(v: JBigDecimal, f: Field): Any = f.sparkType match {
    case ShortType       => v.shortValueExact()
    case IntegerType     => v.intValueExact()
    case LongType        => v.longValueExact()
    case _: DecimalType  => v
    case other           => throw new IllegalStateException(s"unexpected $other")
  }

  /** Decode one fixed-length record into a Row shaped like
    * [[Copybook.toSparkSchema]]. */
  def decodeRecord(root: Field, bytes: Array[Byte]): Row = {
    require(bytes.length >= recordLength(root),
      s"record too short: ${bytes.length} < ${recordLength(root)}")
    val values = Vector.newBuilder[Any]
    def walkGroup(f: Field, base: Int): Unit = {
      var cur = base
      val childOffsets = scala.collection.mutable.HashMap.empty[String, Int]
      f.children.foreach { c =>
        val at = c.redefines match {
          case Some(target) => childOffsets.getOrElse(target.toUpperCase, cur)
          case None         => cur
        }
        childOffsets(c.name.toUpperCase) = at
        if (c.isFiller || c.redefines.nonEmpty) () // skipped in flat schema
        else if (c.isGroup && c.occurs <= 1) walkGroup(c, at)
        else if (c.occurs > 1)
          values += (0 until c.occurs).map { i =>
            if (c.isGroup) structValue(c, at + i * c.unitLength)
            else decodeValue(c, bytes, at + i * c.unitLength)
          }
        else values += decodeValue(c, bytes, at)
        if (c.redefines.isEmpty) cur += c.totalLength
      }
    }
    def structValue(g: Field, base: Int): Row = {
      var cur = base
      Row.fromSeq(g.children.filter(c => !c.isFiller && c.redefines.isEmpty).map { c =>
        val at = cur; cur += c.totalLength
        if (c.isGroup) structValue(c, at) else decodeValue(c, bytes, at)
      })
    }
    walkGroup(root, 0)
    Row.fromSeq(values.result())
  }

  /** Encode one elementary value back to bytes (P6 round-trip capability,
    * encoding.py:163-207; used by tests and fixture generators). */
  def encodeValue(f: Field, v: Any): Array[Byte] = {
    val p = f.pic.get
    f.usage match {
      case Comp1 =>
        ByteBuffer.allocate(4).putFloat(v.asInstanceOf[Float]).array()
      case Comp2 =>
        ByteBuffer.allocate(8).putDouble(v.asInstanceOf[Double]).array()
      case Display if p.alpha =>
        val s = v.toString
        val padded = if (s.length >= p.length) s.take(p.length)
                     else s + (" " * (p.length - s.length))
        MainframeNum.stringToEbcdic(padded)
      case Display =>
        MainframeNum.encodeZoned(toDec(v, p.scale), p.length)
      case Comp3 =>
        MainframeNum.encodePacked(toDec(v, p.scale), p.length)
      case Comp =>
        MainframeNum.encodeBinary(toDec(v, p.scale).unscaledValue().longValueExact(),
          f.unitLength)
    }
  }

  private def toDec(v: Any, scale: Int): JBigDecimal = (v match {
    case d: JBigDecimal    => d
    case d: BigDecimal     => d.bigDecimal
    case n: java.lang.Number => JBigDecimal.valueOf(n.doubleValue())
    case s: String         => new JBigDecimal(s)
  }).setScale(scale)

  /** Encode a full record from a flat path→value map (layout order). */
  def encodeRecord(root: Field, values: Map[String, Any]): Array[Byte] = {
    val buf = new Array[Byte](recordLength(root))
    java.util.Arrays.fill(buf, MainframeNum.stringToEbcdic(" ")(0)) // EBCDIC spaces
    layout(root).foreach { slot =>
      val key = if (slot.index >= 0) s"${slot.path}[${slot.index}]" else slot.path
      values.get(key).orElse(values.get(slot.path)).foreach { v =>
        val enc = encodeValue(slot.field, v)
        System.arraycopy(enc, 0, buf, slot.offset, enc.length)
      }
    }
    buf
  }
}
