package graft

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.{Copybook, CopybookCodec, DdlParser, TypeMapper}

/** Copybook / DDL schema pipeline — capability parity with the reference's
  * pure-Python parsers (SURVEY.md §7.5): declarative record schema, offset
  * layout, Spark schema mapping, and record decode/encode round-trip. */
class CopybookSpec extends AnyFunSuite {

  // Structure mirrors /root/reference/input/CUSTREC.cpy-style copybooks
  // (levels, PIC, COMP-3, OCCURS, REDEFINES, FILLER) — content is our own.
  private val cpy =
    """      *================================================================*
      |      * CUSTOMER MASTER RECORD - test copybook                         *
      |      *================================================================*
      |       01  CUSTOMER-RECORD.
      |           05  CUST-ID                 PIC 9(9).
      |           05  CUST-NAME               PIC X(20).
      |           05  CUST-BALANCE            PIC S9(7)V99 COMP-3.
      |           05  CUST-SCORE              PIC S9(4) COMP.
      |           05  CUST-ADDR.
      |               10  CUST-CITY           PIC X(10).
      |               10  CUST-ZIP            PIC 9(5).
      |           05  CUST-PHONES             PIC X(8) OCCURS 3 TIMES.
      |           05  CUST-RAW                PIC X(6).
      |           05  CUST-ALT REDEFINES CUST-RAW.
      |               10  CUST-ALT-A          PIC 9(3).
      |               10  CUST-ALT-B          PIC X(3).
      |           05  FILLER                  PIC X(4).
      |""".stripMargin

  private lazy val root = Copybook.parse(cpy)

  test("parses levels, groups, OCCURS, REDEFINES, FILLER") {
    assert(root.name == "CUSTOMER-RECORD" && root.level == 1)
    val names = root.children.map(_.name)
    assert(names == Vector("CUST-ID", "CUST-NAME", "CUST-BALANCE", "CUST-SCORE",
      "CUST-ADDR", "CUST-PHONES", "CUST-RAW", "CUST-ALT", "FILLER"))
    val addr = root.children.find(_.name == "CUST-ADDR").get
    assert(addr.isGroup && addr.children.map(_.name) == Vector("CUST-CITY", "CUST-ZIP"))
    assert(root.children.find(_.name == "CUST-PHONES").get.occurs == 3)
    assert(root.children.find(_.name == "CUST-ALT").get.redefines.contains("CUST-RAW"))
  }

  test("storage lengths follow COBOL rules (vsam_types.py:345-356 semantics)") {
    def len(n: String) = root.children.find(_.name == n).get.totalLength
    assert(len("CUST-ID") == 9) // zoned DISPLAY: 1 byte per digit
    assert(len("CUST-NAME") == 20)
    assert(len("CUST-BALANCE") == 5) // COMP-3: 9 digits/2 + 1
    assert(len("CUST-SCORE") == 2) // COMP <= 4 digits: 2 bytes
    assert(len("CUST-ADDR") == 15)
    assert(len("CUST-PHONES") == 24) // 8 x 3
    assert(len("CUST-RAW") == 6)
    // REDEFINES shares storage — record length excludes it
    assert(Copybook.recordLength(root) == 9 + 20 + 5 + 2 + 15 + 24 + 6 + 4)
  }

  test("offsets computed like copybook_parser.py:179-233 (REDEFINES shares offset)") {
    val slots = Copybook.layout(root)
    def off(path: String, idx: Int = -1) =
      slots.find(s => s.path == path && s.index == idx).get.offset
    assert(off("cust_id") == 0)
    assert(off("cust_name") == 9)
    assert(off("cust_balance") == 29)
    assert(off("cust_score") == 34)
    assert(off("cust_addr.cust_city") == 36)
    assert(off("cust_addr.cust_zip") == 46)
    assert(off("cust_phones", 0) == 51)
    assert(off("cust_phones", 2) == 51 + 16)
    assert(off("cust_raw") == 75)
    assert(off("cust_alt.cust_alt_a") == 75, "REDEFINES starts at target's offset")
    assert(off("cust_alt.cust_alt_b") == 78)
  }

  test("Spark schema mapping (SURVEY.md §1.3)") {
    val schema = Copybook.toSparkSchema(root)
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("cust_id") == IntegerType) // 9 digits
    assert(byName("cust_name") == StringType)
    assert(byName("cust_balance") == DecimalType(9, 2))
    assert(byName("cust_score") == ShortType)
    assert(byName("cust_addr_cust_city") == StringType)
    assert(byName("cust_addr_cust_zip") == IntegerType) // 5 digits -> Integer
    assert(byName("cust_phones") == ArrayType(StringType, containsNull = false))
    assert(!byName.contains("filler"), "FILLER skipped")
    assert(!byName.contains("cust_alt"), "REDEFINES alternate skipped in flat schema")
  }

  test("record decode/encode round-trip through EBCDIC/zoned/packed/binary") {
    val values = Map[String, Any](
      "cust_id" -> 123456789,
      "cust_name" -> "ACME CORP",
      "cust_balance" -> new JBigDecimal("-12345.67"),
      "cust_score" -> (-321).toShort,
      "cust_addr.cust_city" -> "BERLIN",
      "cust_addr.cust_zip" -> 10115,
      "cust_phones[0]" -> "555-0001",
      "cust_phones[1]" -> "555-0002",
      "cust_phones[2]" -> "555-0003",
      "cust_raw" -> "42XYZ.")
    val bytes = CopybookCodec.encodeRecord(root, values)
    assert(bytes.length == Copybook.recordLength(root))
    val row = CopybookCodec.decodeRecord(root, bytes)
    val schema = Copybook.toSparkSchema(root)
    val byName = schema.fieldNames.zip(row.toSeq).toMap
    assert(byName("cust_id") == 123456789)
    assert(byName("cust_name") == "ACME CORP")
    assert(byName("cust_balance").asInstanceOf[JBigDecimal]
      .compareTo(new JBigDecimal("-12345.67")) == 0)
    assert(byName("cust_score") == (-321).toShort)
    assert(byName("cust_addr_cust_city") == "BERLIN")
    assert(byName("cust_addr_cust_zip") == 10115)
    assert(byName("cust_phones") == Seq("555-0001", "555-0002", "555-0003"))
    assert(byName("cust_raw") == "42XYZ.")
  }

  test("decoded records load into a Spark DataFrame with the derived schema") {
    val spark = SparkTestBase.spark
    val schema = Copybook.toSparkSchema(root)
    val recs = (1 to 50).map { i =>
      CopybookCodec.encodeRecord(root, Map(
        "cust_id" -> (100000000 + i),
        "cust_name" -> s"CUST-$i",
        "cust_balance" -> new JBigDecimal(s"$i.25"),
        "cust_score" -> i.toShort,
        "cust_addr.cust_city" -> "CITY",
        "cust_addr.cust_zip" -> (10000 + i),
        "cust_phones[0]" -> s"555-$i",
        "cust_raw" -> "RAWRAW"))
    }
    val rows = recs.map(b => CopybookCodec.decodeRecord(root, b))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    assert(df.count() == 50)
    import org.apache.spark.sql.functions._
    assert(df.agg(sum(col("cust_id"))).head.getLong(0) ==
      (1 to 50).map(i => 100000000L + i).sum)
  }

  // ---- DDL ---------------------------------------------------------------

  private val ddl =
    """-- orders table (structure mirrors db2/schema/source/*.ddl style)
      |CREATE TABLE APP.ORDERS (
      |  ORDER_ID      INTEGER NOT NULL,
      |  CUST_ID       BIGINT NOT NULL,
      |  TOTAL_AMT     DECIMAL(12,2),
      |  STATUS        CHAR(2) NOT NULL,
      |  NOTES         VARCHAR(200),
      |  PAYLOAD       BLOB(1M),
      |  CREATED_TS    TIMESTAMP,
      |  SHIP_DATE     DATE,
      |  PRIORITY      SMALLINT,
      |  ACTIVE        BOOLEAN,
      |  PRIMARY KEY (ORDER_ID),
      |  CONSTRAINT FK_CUST FOREIGN KEY (CUST_ID) REFERENCES APP.CUSTOMER
      |) IN TSORDERS;
      |""".stripMargin

  test("DDL parse: columns, nullability, PK, FK (ddl_parser.py:141-332 semantics)") {
    val t = DdlParser.parseCreateTable(ddl)
    assert(t.name == "APP.ORDERS")
    assert(t.primaryKey == Seq("order_id"))
    assert(t.foreignKeys == Seq((Seq("cust_id"), "APP.CUSTOMER")))
    val schema = t.schema
    val byName = schema.fields.map(f => f.name -> f).toMap
    assert(byName("order_id").dataType == IntegerType && !byName("order_id").nullable)
    assert(byName("cust_id").dataType == LongType && !byName("cust_id").nullable)
    assert(byName("total_amt").dataType == DecimalType(12, 2) && byName("total_amt").nullable)
    assert(byName("status").dataType == StringType)
    assert(byName("payload").dataType == BinaryType)
    assert(byName("created_ts").dataType == TimestampType)
    assert(byName("ship_date").dataType == DateType)
    assert(byName("priority").dataType == ShortType)
    assert(byName("active").dataType == BooleanType)
  }

  test("type promotion matrix (schema_validator.py:116-128 semantics)") {
    assert(TypeMapper.promotable(ShortType, IntegerType))
    assert(TypeMapper.promotable(IntegerType, LongType))
    assert(TypeMapper.promotable(LongType, DecimalType(20, 0)))
    assert(TypeMapper.promotable(FloatType, DoubleType))
    assert(TypeMapper.promotable(DateType, TimestampType))
    assert(TypeMapper.promotable(IntegerType, StringType))
    assert(!TypeMapper.promotable(LongType, IntegerType))
    assert(!TypeMapper.promotable(DoubleType, FloatType))
    assert(!TypeMapper.promotable(TimestampType, DateType))
    assert(TypeMapper.promotable(DecimalType(9, 2), DecimalType(12, 2)))
    assert(!TypeMapper.promotable(DecimalType(12, 2), DecimalType(9, 2)))
  }

  test("DB2 FOR BIT DATA maps to binary; TIME maps to string") {
    assert(TypeMapper.db2ToSpark("CHAR(8) FOR BIT DATA") == BinaryType)
    assert(TypeMapper.db2ToSpark("TIME") == StringType)
    assert(TypeMapper.db2ToSpark("VARCHAR(50)") == StringType)
    assert(TypeMapper.db2ToSpark("DECFLOAT(34)") == DecimalType(34, 0))
  }
}
