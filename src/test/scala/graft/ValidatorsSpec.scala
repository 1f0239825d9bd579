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
}
