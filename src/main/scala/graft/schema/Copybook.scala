package graft.schema

import org.apache.spark.sql.types._

import graft.codec.MainframeNum

/** COBOL copybook schema support, re-implemented from public COBOL storage
  * rules. Capability parity with the reference's pure-Python pipeline
  * (/root/reference/mf_spark/parsers/copybook_parser.py:30-83 field model,
  * 179-233 offset assignment, 402-419 Spark schema mapping;
  * /root/reference/mf_spark/converters/vsam_types.py:288-343 PIC→type,
  * 345-356 storage bytes) — the code here is an independent Scala design.
  */
object Copybook {

  sealed trait Usage
  case object Display extends Usage // zoned / character
  case object Comp extends Usage // binary big-endian (COMP/COMP-4/COMP-5)
  case object Comp1 extends Usage // 4-byte IEEE float
  case object Comp2 extends Usage // 8-byte IEEE float
  case object Comp3 extends Usage // packed decimal

  /** Parsed PICTURE clause. */
  final case class Pic(
      alpha: Boolean, // X/A item
      length: Int, // alpha length or total digits
      scale: Int, // digits right of V
      signed: Boolean)

  final case class Field(
      name: String,
      level: Int,
      pic: Option[Pic],
      usage: Usage,
      occurs: Int,
      redefines: Option[String],
      children: Vector[Field] = Vector.empty) {

    def isGroup: Boolean = pic.isEmpty && children.nonEmpty
    def isFiller: Boolean = name.equalsIgnoreCase("FILLER")

    /** storage bytes of ONE occurrence (COBOL rules; cf. vsam_types.py:345-356) */
    def unitLength: Int = pic match {
      case Some(p) =>
        usage match {
          case Display => p.length
          case Comp3   => MainframeNum.packedStorageBytes(p.length)
          case Comp1   => 4
          case Comp2   => 8
          case Comp =>
            if (p.length <= 4) 2 else if (p.length <= 9) 4 else 8
        }
      case None => children.filter(_.redefines.isEmpty).map(_.totalLength).sum
    }

    def totalLength: Int = unitLength * math.max(occurs, 1)

    /** Spark type of ONE occurrence (mapping per SURVEY.md §1.3). */
    def sparkType: DataType = pic match {
      case Some(p) =>
        usage match {
          case Comp1 => FloatType
          case Comp2 => DoubleType
          case _ if p.alpha => StringType
          case Comp3 => DecimalType(p.length, p.scale)
          case _ if p.scale > 0 => DecimalType(p.length, p.scale)
          case _ => // integral: zoned or binary
            if (p.length <= 4) ShortType
            else if (p.length <= 9) IntegerType
            else LongType
        }
      case None =>
        StructType(children.filter(c => !c.isFiller && c.redefines.isEmpty)
          .map(c => StructField(normalize(c.name), c.fieldType, nullable = true)))
    }

    /** type including OCCURS wrapping */
    def fieldType: DataType =
      if (occurs > 1) ArrayType(sparkType, containsNull = false) else sparkType
  }

  def normalize(name: String): String = name.toLowerCase.replace('-', '_')

  // ---------------------------------------------------------------------
  // parsing
  // ---------------------------------------------------------------------

  private val LineRe =
    raw"^\s*(\d{1,2})\s+([A-Za-z0-9-]+)(.*?)\.?\s*$$".r
  private val PicRe =
    raw"(?i)PIC(?:TURE)?\s+(\S+)".r.unanchored
  private val OccursRe =
    raw"(?i)OCCURS\s+(\d+)(?:\s+TIMES)?".r.unanchored
  private val RedefinesRe =
    raw"(?i)REDEFINES\s+([A-Za-z0-9-]+)".r.unanchored
  private val UsageRe =
    raw"(?i)\b(?:USAGE\s+(?:IS\s+)?)?(COMP-[1-5]|COMP|BINARY|PACKED-DECIMAL|DISPLAY)\b".r.unanchored

  /** Strip sequence columns / comments / continuations per fixed-format
    * COBOL (cf. copybook_parser.py:235-284 _clean_content). */
  def cleanLines(content: String): Seq[String] =
    content.linesIterator.toSeq
      .map { raw =>
        // fixed-format: cols 1-6 sequence area, col 7 indicator
        val line = if (raw.length > 6 && raw.take(6).forall(c => c.isDigit || c == ' '))
          raw.drop(6) else raw
        if (line.startsWith("*") || line.startsWith("/")) "" else line
      }
      .map(_.replaceAll("\\s+", " ").trim)
      .filter(_.nonEmpty)

  /** Join clause fragments until the period terminator. */
  private def statements(lines: Seq[String]): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    lines.foreach { l =>
      cur.append(' ').append(l)
      if (l.endsWith(".")) { out += cur.toString.trim.dropRight(1); cur.clear() }
    }
    val rest = cur.toString.trim
    if (rest.nonEmpty) out += rest
    out.result()
  }

  def parsePic(s: String): Pic = {
    val norm = s.toUpperCase
    val signed = norm.startsWith("S")
    val body = if (signed) norm.drop(1) else norm
    // expand 9(4)V9(2) / X(10) / repeated literals like 999
    def expand(part: String): String = {
      val re = raw"([X9AV])(?:\((\d+)\))?".r
      re.findAllMatchIn(part).map { m =>
        val ch = m.group(1)
        val n = Option(m.group(2)).map(_.toInt).getOrElse(1)
        ch * n
      }.mkString
    }
    val expanded = expand(body)
    if (expanded.contains('X') || expanded.contains('A'))
      Pic(alpha = true, length = expanded.count(c => c == 'X' || c == 'A'),
        scale = 0, signed = false)
    else {
      val vIdx = expanded.indexOf('V')
      val digits = expanded.count(_ == '9')
      val scale = if (vIdx >= 0) expanded.drop(vIdx + 1).count(_ == '9') else 0
      Pic(alpha = false, length = digits, scale = scale, signed = signed)
    }
  }

  /** Parse copybook text into the level-01 root field. */
  def parse(content: String): Field = {
    val stmts = statements(cleanLines(content))
    val flat = stmts.flatMap { st =>
      st match {
        case LineRe(levelS, name, rest) =>
          val level = levelS.toInt
          if (level == 88 || level == 66) None // condition/rename entries: skipped
          else {
            val pic = PicRe.findFirstMatchIn(rest).map(m => parsePic(m.group(1)))
            val occurs = OccursRe.findFirstMatchIn(rest).map(_.group(1).toInt).getOrElse(1)
            val redef = RedefinesRe.findFirstMatchIn(rest).map(_.group(1))
            val usage = UsageRe.findFirstMatchIn(rest).map(_.group(1).toUpperCase) match {
              case Some("COMP-1") => Comp1
              case Some("COMP-2") => Comp2
              case Some("COMP-3") | Some("PACKED-DECIMAL") => Comp3
              case Some("COMP") | Some("COMP-4") | Some("COMP-5") | Some("BINARY") => Comp
              case _ => Display
            }
            Some(Field(name, level, pic, usage, occurs, redef))
          }
        case _ => None
      }
    }
    require(flat.nonEmpty, "no fields parsed")
    val (root, rest) = buildTree(flat.head, flat.tail.toList)
    require(rest.isEmpty, s"trailing fields after root: ${rest.map(_.name)}")
    root
  }

  /** Nest by level numbers (children have strictly greater levels). */
  private def buildTree(parent: Field, rest: List[Field]): (Field, List[Field]) = {
    var remaining = rest
    var children = Vector.empty[Field]
    while (remaining.nonEmpty && remaining.head.level > parent.level) {
      val (child, after) = buildTree(remaining.head, remaining.tail)
      children :+= child
      remaining = after
    }
    (parent.copy(children = children), remaining)
  }

  // ---------------------------------------------------------------------
  // layout: byte offsets for elementary items (cf. copybook_parser.py:179-233)
  // ---------------------------------------------------------------------

  final case class Slot(
      path: String, // dotted field path, normalized
      field: Field,
      offset: Int,
      index: Int) // occurs index (0-based), -1 for non-array

  /** Flattened elementary layout with absolute offsets; REDEFINES share the
    * offset of their target. */
  def layout(root: Field): Seq[Slot] = {
    val out = Vector.newBuilder[Slot]
    def walk(f: Field, prefix: String, offset: Int): Int = {
      // offsets of this group's direct children (for REDEFINES targets)
      var cur = offset
      val childOffsets = scala.collection.mutable.HashMap.empty[String, Int]
      f.children.foreach { c =>
        val base = c.redefines match {
          case Some(target) =>
            childOffsets.getOrElse(target.toUpperCase, cur)
          case None => cur
        }
        childOffsets(c.name.toUpperCase) = base
        (0 until math.max(c.occurs, 1)).foreach { i =>
          val at = base + i * c.unitLength
          val path = if (prefix.isEmpty) normalize(c.name)
                     else s"$prefix.${normalize(c.name)}"
          if (c.isGroup) walk(c, path, at)
          else if (!c.isFiller)
            out += Slot(path, c, at, if (c.occurs > 1) i else -1)
        }
        if (c.redefines.isEmpty) cur += c.totalLength
      }
      cur
    }
    walk(root, "", 0)
    out.result()
  }

  def recordLength(root: Field): Int = root.totalLength

  /** Flat Spark schema of elementary items (the reference's
    * collapse_root + flatten semantics, migrator.py:344). Arrays become
    * ArrayType columns; FILLER and REDEFINES alternates are skipped at the
    * schema level (alternates are decodable via [[layout]]). */
  def toSparkSchema(root: Field): StructType = {
    val fields = Vector.newBuilder[StructField]
    def walk(f: Field, prefix: String): Unit =
      f.children.foreach { c =>
        if (c.isFiller || c.redefines.nonEmpty) ()
        else if (c.isGroup && c.occurs <= 1)
          walk(c, s"$prefix${normalize(c.name)}_")
        else
          fields += StructField(prefix + normalize(c.name), c.fieldType, nullable = true)
      }
    walk(root, "")
    StructType(fields.result())
  }
}
