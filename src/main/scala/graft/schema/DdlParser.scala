package graft.schema

import org.apache.spark.sql.types._

/** DB2 DDL / DCLGEN schema support — capability parity with
  * /root/reference/mf_spark/parsers/ddl_parser.py:141-332 (CREATE TABLE →
  * columns/PK/FK → StructType) and mf_spark/converters/db2_types.py:165-418
  * (SQL type → Spark type); independent Scala implementation.
  */
object DdlParser {

  final case class ColumnDef(name: String, sqlType: String, nullable: Boolean)
  final case class TableDef(
      name: String,
      columns: Seq[ColumnDef],
      primaryKey: Seq[String],
      foreignKeys: Seq[(Seq[String], String)]) { // (cols, referenced table)
    def schema: StructType = StructType(columns.map(c =>
      StructField(c.name.toLowerCase, TypeMapper.db2ToSpark(c.sqlType), c.nullable)))
  }

  private val CreateRe =
    raw"(?is)CREATE\s+TABLE\s+([\w.\"]+)\s*\((.*)\)\s*(?:IN\s+\w+.*)?;?\s*".r

  /** split a column list on top-level commas (paren-aware,
    * cf. ddl_parser.py:252-282). */
  def splitTopLevel(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur.append('(')
      case ')' => depth -= 1; cur.append(')')
      case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
      case c => cur.append(c)
    }
    val last = cur.toString.trim
    if (last.nonEmpty) out += last
    out.result()
  }

  private val PkRe = raw"(?i)^(?:CONSTRAINT\s+\w+\s+)?PRIMARY\s+KEY\s*\(([^)]*)\)".r
  private val FkRe =
    raw"(?i)^(?:CONSTRAINT\s+\w+\s+)?FOREIGN\s+KEY\s*\(([^)]*)\)\s*REFERENCES\s+([\w.\"]+).*".r
  private val ColRe = raw"""(?is)^"?(\w+)"?\s+(.+)$$""".r

  def stripComments(sql: String): String =
    sql.linesIterator.map { l =>
      val i = l.indexOf("--")
      if (i >= 0) l.take(i) else l
    }.mkString("\n")

  def parseCreateTable(sql: String): TableDef = {
    val clean = stripComments(sql)
    val m = CreateRe.findFirstMatchIn(clean)
      .getOrElse(throw new IllegalArgumentException("no CREATE TABLE found"))
    val tableName = m.group(1).replace("\"", "")
    val body = m.group(2)
    var cols = Vector.empty[ColumnDef]
    var pk = Seq.empty[String]
    var fks = Vector.empty[(Seq[String], String)]
    splitTopLevel(body).foreach {
      case PkRe(colList) =>
        pk = colList.split(',').map(_.trim.replace("\"", "").toLowerCase).toSeq
      case FkRe(colList, ref) =>
        fks :+= (colList.split(',').map(_.trim.toLowerCase).toSeq, ref.replace("\"", ""))
      case ColRe(name, rest) =>
        val upper = rest.toUpperCase
        val notNull = upper.contains("NOT NULL")
        // type text = everything before constraint-ish keywords
        val typeText = rest.split(raw"(?i)\s+(NOT\s+NULL|DEFAULT|GENERATED|WITH|CHECK|CONSTRAINT|PRIMARY|REFERENCES|UNIQUE)\b")(0).trim
        cols :+= ColumnDef(name, typeText, nullable = !notNull)
      case other =>
        throw new IllegalArgumentException(s"unparseable table element: $other")
    }
    // PK columns are implicitly NOT NULL
    val withPk = cols.map(c =>
      if (pk.contains(c.name.toLowerCase)) c.copy(nullable = false) else c)
    TableDef(tableName, withPk, pk, fks)
  }

  /** parse every CREATE TABLE in a DDL script */
  def parseScript(sql: String): Seq[TableDef] = {
    val clean = stripComments(sql)
    raw"(?is)CREATE\s+TABLE.*?\(((?:[^()]|\([^()]*\))*)\)\s*(?:IN\s+[\w.]+)?\s*;".r
      .findAllMatchIn(clean)
      .map(m => parseCreateTable(m.matched)).toSeq
  }
}

/** Unified source-type → Spark mapping (SURVEY.md §1.3; facade parity with
  * /root/reference/mf_spark/converters/type_mapper.py:57-100). */
object TypeMapper {

  // size params may carry K/M/G units (LOB sizes, e.g. BLOB(1M))
  private val ParamRe = raw"(\w[\w ]*?)\s*\(\s*(\d+)\s*[KMG]?\s*(?:,\s*(\d+)\s*)?\)".r

  def db2ToSpark(sqlType: String): DataType = {
    val upper = sqlType.trim.toUpperCase
    val forBitData = upper.contains("FOR BIT DATA")
    val t = upper.replace("FOR BIT DATA", "").trim
    val (base, params) = t match {
      case ParamRe(b, p1, p2) =>
        (b.trim, Seq(p1.toInt) ++ Option(p2).map(_.toInt).toSeq)
      case _ => (t, Seq.empty[Int])
    }
    if (forBitData) return BinaryType
    base match {
      case "SMALLINT" => ShortType
      case "INTEGER" | "INT" => IntegerType
      case "BIGINT" => LongType
      case "DECIMAL" | "NUMERIC" | "DEC" | "DECFLOAT" =>
        DecimalType(params.headOption.getOrElse(31), params.lift(1).getOrElse(0))
      case "REAL" => FloatType
      case "FLOAT" | "DOUBLE" | "DOUBLE PRECISION" => DoubleType
      case "CHAR" | "CHARACTER" | "VARCHAR" | "CLOB" | "GRAPHIC" |
          "VARGRAPHIC" | "DBCLOB" | "LONG VARCHAR" | "XML" | "ROWID" =>
        StringType
      case "BINARY" | "VARBINARY" | "BLOB" => BinaryType
      case "DATE" => DateType
      case "TIME" => StringType // no Spark TIME type (db2_types.py:174-176)
      case "TIMESTAMP" | "TIMESTAMP WITH TIME ZONE" => TimestampType
      case "BOOLEAN" => BooleanType
      case other =>
        throw new IllegalArgumentException(s"unmapped DB2 type: $other")
    }
  }

  /** Additive-evolution promotion matrix (schema_validator.py:116-128
    * semantics): may `from` be widened to `to` without data loss? */
  def promotable(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (ShortType, IntegerType | LongType | DoubleType | _: DecimalType) => true
    case (IntegerType, LongType | DoubleType | _: DecimalType) => true
    case (LongType, DoubleType | _: DecimalType) => true
    case (FloatType, DoubleType) => true
    case (d1: DecimalType, d2: DecimalType) =>
      d2.precision >= d1.precision && d2.scale >= d1.scale
    case (DateType, TimestampType) => true
    case (_, StringType) => true
    case _ => false
  }
}
