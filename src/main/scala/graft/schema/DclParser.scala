package graft.schema

import org.apache.spark.sql.types.StructType

/** DB2 DCLGEN output parser — capability parity with
  * /root/reference/mf_spark/parsers/dcl_parser.py:169-260: a DCLGEN file
  * carries (1) an `EXEC SQL DECLARE <tbl> TABLE (…) END-EXEC` statement with
  * the SQL column types, (2) a COBOL 01-level record of host variables, and
  * (3) a generated comment stating the column count; the parser extracts all
  * three and maps columns to host variables by the DCL- naming convention.
  *
  * Independent design: instead of per-line regex scans (which drop a PIC
  * clause that DCLGEN wraps onto its own continuation line), the source is
  * first normalized COBOL-style — sequence area stripped, indicator-column
  * comments removed — then joined and split into period-terminated
  * statements, the same strategy as [[Copybook]].
  */
object DclParser {

  /** One host variable from the COBOL declaration (levels 02-48; the 01
    * record name and 49 VARCHAR length/text sub-fields are structural). */
  final case class HostVar(level: Int, name: String, pic: Option[String],
      sqlColumn: Option[String])

  final case class DclGen(
      tableName: String, // schema-qualified, as declared
      schema: String,
      table: String,
      columns: Seq[DdlParser.ColumnDef],
      hostVars: Seq[HostVar],
      columnCount: Int) {
    def sparkSchema: StructType = StructType(columns.map(c =>
      org.apache.spark.sql.types.StructField(
        c.name.toLowerCase, TypeMapper.db2ToSpark(c.sqlType), c.nullable)))
  }

  /** Strip the fixed-form COBOL frame: sequence number columns 1-6 and
    * 73-80, and any line whose indicator column (7) marks a comment.
    *
    * The frame is stripped only when the file actually CARRIES it — every
    * non-blank line must look fixed-form (cols 1-6 digits/spaces, a valid
    * indicator in col 7). Trimmed / free-form copies (content before col 8,
    * which the reference's position-independent regex scan handles) would
    * otherwise be silently truncated into a wrong parse; they fall back to
    * the raw lines with only leading-`*` comment lines removed. */
  private def normalize(content: String): Seq[String] = {
    val lines = content.linesIterator.toSeq
    val nonBlank = lines.filter(_.trim.nonEmpty)
    val fixedForm = nonBlank.nonEmpty && nonBlank.forall { l =>
      // a line of only a sequence number ('000100' + trailing blanks) is
      // fixed-form-compatible: requiring length > 6 on EVERY line let one
      // such line flip the whole file into the free-form fallback, leaving
      // sequence columns embedded in the DECLARE parse
      if (l.length <= 6) l.forall(c => c.isDigit || c == ' ')
      else l.take(6).forall(c => c.isDigit || c == ' ') &&
        " */-Dd".contains(l.charAt(6)) // space, comment, continuation, debug
    }
    if (fixedForm)
      lines.flatMap { raw =>
        val line = if (raw.length > 72) raw.take(72) else raw
        if (line.length <= 6) None
        else if (line.charAt(6) == '*' || line.charAt(6) == '/') None // comment
        else Some(line.substring(7)) // drop cols 1-7 (sequence + indicator)
      }
    else
      lines.map(_.replaceAll("\\s+$", ""))
        .filter(l => l.trim.nonEmpty && !l.trim.startsWith("*"))
  }

  private val DeclareRe =
    raw"(?is)EXEC\s+SQL\s+DECLARE\s+([\w.]+)\s+TABLE\s*\((.*?)\)\s*END-EXEC".r
  private val ColCountRe =
    raw"(?i)NUMBER\s+OF\s+COLUMNS\s.*?\bIS\s+(\d+)".r
  private val FieldRe =
    raw"(?is)^(\d{1,2})\s+([\w-]+)(?:\s+PIC\s+(\S+))?(?:\s+(?:USAGE\s+)?(COMP(?:-[1-5])?|DISPLAY|BINARY|PACKED-DECIMAL))?\s*$$".r

  def parse(content: String): DclGen = {
    val body = normalize(content).mkString("\n")

    val (tableName, columns) = DeclareRe.findFirstMatchIn(body) match {
      case Some(m) =>
        val cols = DdlParser.splitTopLevel(m.group(2)).flatMap { part =>
          raw"(?is)^\"?([\w]+)\"?\s+(.+)$$".r.findFirstMatchIn(part.trim).map { cm =>
            val rest = cm.group(2).trim
            val notNull = rest.toUpperCase.contains("NOT NULL")
            val typeText = rest
              .split(raw"(?i)\s+(NOT\s+NULL|WITH|DEFAULT|FOR\s+SBCS|FOR\s+MIXED)\b")(0).trim
            DdlParser.ColumnDef(cm.group(1).toUpperCase, typeText, nullable = !notNull)
          }
        }
        (m.group(1).toUpperCase, cols)
      case None => ("", Seq.empty[DdlParser.ColumnDef])
    }
    val (schema, table) = tableName.split('.') match {
      case Array(s, t) => (s, t)
      case _           => ("", tableName)
    }

    // COBOL host variables: everything outside the DECLARE block, joined and
    // split on period-terminated statements (continuation-safe).
    val cobolText = DeclareRe.replaceAllIn(body, " ")
    val statements = cobolText.replaceAll(raw"\s+", " ")
      .split(raw"\.\s+|\.$$").map(_.trim).filter(_.nonEmpty)
    val vars = statements.flatMap {
      case FieldRe(lvl, name, pic, usage) =>
        val level = lvl.toInt
        if (level == 1 || level == 49) None // record name / VARCHAR sub-fields
        else {
          val picClause = Option(pic).map { p =>
            "PIC " + p + Option(usage).map(" " + _).getOrElse("")
          }
          Some(HostVar(level, name.toUpperCase, picClause, sqlColumn = None))
        }
      case _ => None
    }.toSeq

    // name-convention mapping: DCL-COLUMN-NAME ↔ COLUMN_NAME
    val colNames = columns.map(_.name).toSet
    val mapped = vars.map { v =>
      val candidate = v.name.stripPrefix("DCL-").replace('-', '_')
      v.copy(sqlColumn = Some(candidate).filter(colNames.contains))
    }

    val count = ColCountRe.findFirstMatchIn(content)
      .map(_.group(1).toInt).getOrElse(columns.size)

    DclGen(tableName, schema, table, columns, mapped, count)
  }

  def parseFile(path: String): DclGen =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
}
