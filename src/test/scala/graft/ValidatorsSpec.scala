package graft

import graft.validate.Validators

/** Validators reproduce the reference's data_validator.py semantics in one
  * pass each (SURVEY.md §5 item 6). */
class ValidatorsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "a", "x"), (2L, "b", ""), (3L, null.asInstanceOf[String], "z"),
    (4L, "d", "null"), (5L, "e", "w")).toDF("id", "s1", "s2")

  test("count validation with and without tolerance") {
    assert(Validators.validateCount(df, 5).passed)
    assert(!Validators.validateCount(df, 6).passed)
    assert(Validators.validateCount(df, 6, tolerancePct = 20).passed)
  }

  test("single-pass null profile counts null, empty and 'null' strings") {
    val (rows, nulls) = Validators.nullProfile(df)
    assert(rows == 5)
    assert(nulls("id") == 0)
    assert(nulls("s1") == 1)
    assert(nulls("s2") == 2) // "" and "null"
    val violations = Validators.nullThresholdViolations(df, thresholdPct = 25.0)
    assert(violations.keySet == Set("s2")) // 40% > 25%
  }

  test("missing required columns") {
    assert(Validators.missingColumns(df, Seq("id", "S1")).isEmpty)
    assert(Validators.missingColumns(df, Seq("id", "nope")) == Seq("nope"))
  }

  test("table digest is order-independent and content-sensitive") {
    val a = Seq((1, "x"), (2, "y"), (3, "z")).toDF("k", "v")
    val b = Seq((3, "z"), (1, "x"), (2, "y")).toDF("k", "v") // same rows, other order
    val c = Seq((1, "x"), (2, "y"), (3, "Z")).toDF("k", "v") // one value differs
    assert(Validators.tableDigest(a) == Validators.tableDigest(b))
    assert(Validators.tableDigest(a) != Validators.tableDigest(c))
  }

  test("full-outer diff classification (data_validator.py:292-337 semantics)") {
    val l = Seq(1, 2, 3, 4).toDF("k")
    val r = Seq(3, 4, 5).toDF("k")
    val d = Validators.diffByKey(l, r, Seq("k"))
    assert(d == Validators.DiffResult(matching = 2, leftOnly = 2, rightOnly = 1))
    assert(!d.identical)
  }

  test("orphan FK check (docs/DESIGN.md:199-208 semantics)") {
    val orders = Seq((10, 1), (11, 2), (12, 99)).toDF("oid", "cust")
    val customers = Seq((1, "a"), (2, "b")).toDF("cid", "name")
    assert(Validators.orphanCount(orders, "cust", customers, "cid") == 1)
  }

  test("rowset equality gate") {
    val a = Seq((1, "x"), (1, "x"), (2, "y")).toDF("k", "v")
    val b = Seq((2, "y"), (1, "x"), (1, "x")).toDF("k", "v")
    val c = Seq((1, "x"), (2, "y")).toDF("k", "v") // multiset differs
    assert(Validators.rowsetEqual(a, b))
    assert(!Validators.rowsetEqual(a, c))
  }

  test("combined validate(): errors, warnings, single-pass metrics") {
    val r = Validators.validate(df,
      expectedCount = Some(5), requiredColumns = Seq("id", "s1"),
      nonNullColumns = Seq("id"))
    assert(r.passed && r.recordCount == 5)
    assert(r.schema("id") == "bigint")
    val bad = Validators.validate(df,
      expectedCount = Some(7), requiredColumns = Seq("nope"),
      nonNullColumns = Seq("s1"), warnNullPct = 30.0)
    assert(!bad.passed)
    assert(bad.errors.exists(_.contains("nope")))
    assert(bad.errors.exists(_.contains("count 5 != expected 7")))
    assert(bad.errors.exists(_.contains("s1 has 1 null")))
    assert(bad.warnings.exists(_.contains("s2")), s"warnings: ${bad.warnings}")
    assert(bad.summary.contains("FAILED"))
  }

  // ---- SchemaValidator (schema_validator.py:101-335 parity) ----

  import org.apache.spark.sql.types._
  import graft.schema.SchemaValidator
  import graft.schema.SchemaValidator.{Options, SchemaEvolutionException}

  private val base = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("amount", DecimalType(9, 2))))

  test("compare: identical schemas are compatible with no changes") {
    val r = SchemaValidator.compare(base, base)
    assert(r.isCompatible && r.typeMismatches.isEmpty && r.compatibleChanges.isEmpty)
    assert(r.matching.toSet == Set("id", "name", "amount"))
  }

  test("compare: promotion (int->long, decimal widening) is compatible, reported") {
    val src = StructType(Seq(
      StructField("id", IntegerType),
      StructField("name", StringType),
      StructField("amount", DecimalType(7, 2))))
    val r = SchemaValidator.compare(src, base)
    assert(r.isCompatible)
    assert(r.compatibleChanges.keySet == Set("id", "amount"))
    // strict mode rejects the same widening
    assert(!SchemaValidator.compare(src, base, Options(strictMode = true)).isCompatible)
    // promotion disabled → mismatch
    val r2 = SchemaValidator.compare(src, base, Options(allowTypePromotion = false))
    assert(!r2.isCompatible && r2.typeMismatches.keySet == Set("id", "amount"))
  }

  test("compare: narrowing and dropped columns are incompatible") {
    val narrowed = StructType(Seq(
      StructField("id", IntegerType), // long -> int: narrowing
      StructField("name", StringType),
      StructField("amount", DecimalType(9, 2))))
    val r = SchemaValidator.compare(base, narrowed)
    assert(!r.isCompatible && r.typeMismatches.keySet == Set("id"))
    val dropped = StructType(base.fields.filter(_.name != "name"))
    val r2 = SchemaValidator.compare(base, dropped)
    assert(!r2.isCompatible && r2.missingInTarget == Seq("name"))
    assert(SchemaValidator.compare(base, dropped,
      Options(allowMissingInTarget = true)).isCompatible)
    intercept[SchemaEvolutionException](
      SchemaValidator.requireCompatible(base, dropped))
  }

  test("validate: required fields and expected types") {
    val (ok, _) = SchemaValidator.validate(base, Seq("id", "name"))
    assert(ok)
    val (bad, errs) = SchemaValidator.validate(base, Seq("nope"),
      Map("name" -> LongType))
    assert(!bad && errs.size == 2)
  }

  test("inferTargetSchema applies renames and type overrides") {
    val t = SchemaValidator.inferTargetSchema(base,
      typeMappings = Map("amount" -> DoubleType),
      columnMappings = Map("name" -> "full_name"))
    assert(t.fieldNames.toSeq == Seq("id", "full_name", "amount"))
    assert(t("amount").dataType == DoubleType)
    assert(!t("id").nullable) // nullability carried through
  }

  test("LakeTable commit gate: incompatible snapshot schema is a typed error") {
    import graft.lake.LakeTable
    val t = LakeTable.create(tmpDir("sevol"), base, numBuckets = 4)
    val s0 = t.currentSnapshot()
    // additive evolution commits fine
    val widened = StructType(base.fields :+ StructField("extra", IntegerType))
    t.commit(s0.copy(version = s0.version + 1, batchId = "evolve-ok",
      parentVersion = s0.version, schemaJson = widened.json))
    // dropping a column is rejected with the report attached
    val s1 = t.currentSnapshot()
    val dropped = StructType(widened.fields.filter(_.name != "name"))
    val ex = intercept[SchemaEvolutionException] {
      t.commit(s1.copy(version = s1.version + 1, batchId = "evolve-bad",
        parentVersion = s1.version, schemaJson = dropped.json))
    }
    assert(ex.report.missingInTarget == Seq("name"))
    assert(t.currentSnapshot().version == s1.version, "bad commit must not land")
  }
}
