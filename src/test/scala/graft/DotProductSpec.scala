package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.DotProductExpr

/** Native codegen'd dot_product vs the higher-order fold it replaced:
  * bit-identical results (the parity the oracle hash depends on), null /
  * length-mismatch semantics, and operation under whole-stage codegen. */
class DotProductSpec extends SparkTestBase with PropHelpers {

  private def foldDot = {
    import org.apache.spark.sql.Column
    (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  }

  test("bit-identical to the left-fold on random vectors (codegen path)") {
    DotProductExpr.register(spark)
    import spark.implicits._
    val gen = Gen.listOfN(64, Gen.chooseNum(-1e3, 1e3))
    // batch the cases into ONE DataFrame: a per-case Spark job would make
    // the property pass take minutes for no extra coverage
    val cases = (0 until 30).map { i =>
      var seed = org.scalacheck.rng.Seed(42L + i)
      val xs = gen.pureApply(Gen.Parameters.default, seed).toArray
      val ys = gen.pureApply(Gen.Parameters.default, seed.next).toArray
      (i, xs, ys)
    }
    val df = cases.toDF("i", "a", "b")
      .select(col("i"), DotProductExpr.dot(col("a"), col("b")).as("native"),
        foldDot(col("a"), col("b")).as("fold"))
    df.collect().foreach { r =>
      // exact bit equality, not approximate: the oracle hash needs it
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        s"case ${r.getInt(0)} diverges")
    }
  }

  test("null array or length mismatch yields null, matching zip_with poisoning") {
    DotProductExpr.register(spark)
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0, 2.0)), Some(Array(3.0))),        // mismatch
      (None: Option[Array[Double]], Some(Array(1.0))),  // null side
      (Some(Array(1.0, 2.0)), Some(Array(3.0, 4.0)))    // ok
    ).toDF("a", "b")
    val out = df.select(DotProductExpr.dot(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out(0).isEmpty && out(1).isEmpty && out(2).contains(11.0))
  }

  test("null ELEMENT poisons the sum to null, matching the fold (both paths)") {
    DotProductExpr.register(spark)
    import spark.implicits._
    val df = Seq(
      (0, Seq[Option[Double]](Some(1.0), None, Some(2.0)),
          Seq[Option[Double]](Some(3.0), Some(4.0), Some(5.0))),
      (1, Seq[Option[Double]](Some(1.0), Some(2.0)),
          Seq[Option[Double]](Some(3.0), None)),
      (2, Seq[Option[Double]](Some(1.0), Some(2.0)),
          Seq[Option[Double]](Some(3.0), Some(4.0)))
    ).toDF("i", "a", "b")
    val out = df.select(col("i"),
        DotProductExpr.dot(col("a"), col("b")).as("native"),
        foldDot(col("a"), col("b")).as("fold"))
      .collect().map(r => (r.getInt(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .sortBy(_._1)
    out.foreach { case (i, native, fold) =>
      assert(native == fold, s"case $i: native=$native fold=$fold") }
    assert(out(0)._2.isEmpty && out(1)._2.isEmpty && out(2)._2.contains(11.0))
    // interpreted path too (eval, not codegen)
    val expr = DotProductExpr(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq[java.lang.Double](1.0, null), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = true)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq[java.lang.Double](2.0, 3.0), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = true)))
    assert(expr.eval(null) == null)
  }

  test("runs inside whole-stage codegen over a real scan") {
    DotProductExpr.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
    val df = e.select(DotProductExpr.dot(col("v"), col("v")).as("n2"))
    df.collect().foreach(r => assert(r.getDouble(0) > 0.0))
    // the "*(n)" prefix is the WholeStageCodegen marker in the compact
    // tree format — the dot_product projection must carry it
    val plan = df.queryExecution.executedPlan.toString
    assert(raw"\*\(\d+\) Project \[dot_product".r.findFirstIn(plan).nonEmpty,
      s"dot_product projection fell out of codegen:\n$plan")
  }
}
