package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.{DotProductExpr, NearestCentroidExpr}

/** The round-6 nearest-centroid expressions vs the relational
  * pair-join + max_by pipelines they replaced: bit-identical winners
  * (the parity the oracle hash depends on) on random data, forced ties,
  * NaN scores, and null inputs — plus operation under whole-stage
  * codegen. The reference implementations below are verbatim copies of
  * the round-5 relational shapes from PipelineQueries. */
class NearestCentroidSpec extends SparkTestBase {

  private def dot(a: Column, b: Column) = DotProductExpr.dot(a, b)

  private def registerAll(): Unit = {
    DotProductExpr.register(spark)
    NearestCentroidExpr.register(spark)
  }

  /** Deterministic pseudo-random vectors (plus forced duplicates/zeros). */
  private def vecs(n: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val gen = Gen.listOfN(dim, Gen.chooseNum(-10.0, 10.0))
    (0 until n).map { i =>
      gen.pureApply(Gen.Parameters.default, org.scalacheck.rng.Seed(seed + i))
    }
  }

  /** The former IVF assignment: broadcast pair join, per-pair cosine,
    * max_by(cent_id, struct(c, -cent_id)) — round-5 PipelineQueries. */
  private def relationalCosAssign(e: DataFrame, cent: DataFrame): Map[Int, Option[Int]] =
    e.join(broadcast(cent))
      .select(col("vec_id"),
        (dot(col("v"), col("cv")) / (col("nv") * col("ncv"))).as("c"),
        col("cent_id"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"), struct(col("c"),
        (-col("cent_id")).as("nid"))).as("cell"))
      .collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap

  private def exprCosAssign(e: DataFrame, cent: DataFrame): Map[Int, Option[Int]] = {
    val cb = cent.select(col("cent_id"), col("cv"), col("ncv")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toIndexedSeq, r.getDouble(2)))
      .sortBy(_._1).toIndexedSeq
    e.select(col("vec_id"),
        NearestCentroidExpr.nearestCos(col("v"), col("nv"),
          typedLit(cb.map(_._1)), typedLit(cb.map(_._2)),
          typedLit(cb.map(_._3))).as("cell"))
      .collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap
  }

  test("cosine argmax matches the relational max_by pipeline (random + ties + NaN)") {
    registerAll()
    import spark.implicits._
    val dim = 16
    // 40 random vectors, a zero vector (nv = 0 → every score NaN), and a
    // vector duplicating a centroid (exact-1.0 scores)
    val base = vecs(40, dim, 7L)
    val cents = vecs(6, dim, 99L)
    val data = (base :+ Seq.fill(dim)(0.0) :+ cents(2))
      .zipWithIndex.map { case (v, i) => (i, v) }
    val e = data.toDF("vec_id", "v")
      .withColumn("nv", sqrt(dot(col("v"), col("v"))))
    // duplicated centroid vector under two ids (4 and 5) forces the
    // (c == c) tie for EVERY vector → max_by must break to the lower id
    val centRows = (cents.take(4) :+ cents(3) :+ cents(3))
      .zipWithIndex.map { case (cv, i) => (i, cv) }
    val cent = centRows.toDF("cent_id", "cv")
      .withColumn("ncv", sqrt(dot(col("cv"), col("cv"))))
    // the zero vector makes the relational form divide by zero, which
    // Spark's ANSI mode (default-on) raises on; the oracle's (DuckDB's)
    // arithmetic — and the expression — yield NaN there instead, so the
    // reference is computed with ANSI off. Real embeddings are non-zero:
    // on them both forms are identical under either setting.
    val rel = {
      val prev = spark.conf.get("spark.sql.ansi.enabled")
      spark.conf.set("spark.sql.ansi.enabled", "false")
      try relationalCosAssign(e, cent)
      finally spark.conf.set("spark.sql.ansi.enabled", prev)
    }
    val got = exprCosAssign(e, cent)
    assert(got == rel, s"expression diverges from relational max_by:\n" +
      s"rel=$rel\ngot=$got")
    // the NaN row (zero vector, vec_id 40) must resolve like max_by:
    // NaN = NaN ties break to the LOWEST cent_id
    assert(got(40).contains(0))
    // ties on the duplicated centroid resolve to id 4, never 5
    assert(!got.values.flatten.exists(_ == 5))
  }

  test("null vector, null norm, and null element all yield null (both eval paths)") {
    registerAll()
    import spark.implicits._
    val cb = IndexedSeq((0, IndexedSeq(1.0, 0.0), 1.0), (1, IndexedSeq(0.0, 1.0), 1.0))
    def assign(df: DataFrame): Seq[Option[Int]] =
      df.select(NearestCentroidExpr.nearestCos(col("v"), col("nv"),
          typedLit(cb.map(_._1)), typedLit(cb.map(_._2)),
          typedLit(cb.map(_._3))).as("cell"))
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq
    val rows = Seq(
      (0, Some(Seq[Option[Double]](Some(3.0), Some(1.0))), Some(math.sqrt(10.0))),
      (1, None: Option[Seq[Option[Double]]], Some(1.0)),       // null v
      (2, Some(Seq[Option[Double]](Some(1.0), Some(2.0))), None: Option[Double]), // null nv
      (3, Some(Seq[Option[Double]](Some(1.0), None)), Some(1.0))) // null element
    val df = rows.toDF("i", "v", "nv")
    val out = assign(df)
    assert(out == Seq(Some(0), None, None, None), s"got $out")
  }

  /** Round-5 relational PQ assignment over one codebook: pair join on m,
    * ((nsv − 2·dot) + nscv) score, max_by winner per (vec, m). */
  private def relationalPqAssign(subs: DataFrame, book: DataFrame): Map[(Int, Int), Int] = {
    def l2n(na: Column, a: Column, b: Column, nb: Column): Column =
      na - lit(2.0) * dot(a, b) + nb
    subs.join(broadcast(book), Seq("m"))
      .select(col("vec_id"), col("m"),
        (-l2n(col("nsv"), col("sv"), col("scv"), col("nscv"))).as("nd"),
        col("cent_id"))
      .groupBy(col("vec_id"), col("m"))
      .agg(max_by(col("cent_id"), struct(col("nd"),
        (-col("cent_id")).as("nid"))).as("cell"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap
  }

  test("pq_codes and pq_reconstruct match the relational subspace argmin") {
    registerAll()
    import spark.implicits._
    val dim = 16
    val subDim = 4
    val pqM = dim / subDim
    val data = (vecs(30, dim, 13L) :+ Seq.fill(dim)(0.0))
      .zipWithIndex.map { case (v, i) => (i, v) }
    val e = data.toDF("vec_id", "v")
    // ragged codebook: subspace 0 has 3 centroids, the rest 4 (mirrors
    // trained books whose empty cells were dropped); one duplicate pair
    // (ids 2 and 3 of subspace 1) forces the tie-break
    val cvecs = vecs(8, subDim, 55L)
    val bookRows = (0 until pqM).flatMap { m =>
      val ks = if (m == 0) 3 else 4
      (0 until ks).map { kk =>
        val cv = if (m == 1 && kk == 3) cvecs(2 + 4) else cvecs((m + kk) % 8)
        (m, kk, cv)
      }
    }
    // make subspace 1 ids 2/3 share one vector → guaranteed equal scores
    val fixed = bookRows.map { case (m, kk, cv) =>
      if (m == 1 && (kk == 2 || kk == 3)) (m, kk, cvecs(6)) else (m, kk, cv)
    }
    val book = fixed.toDF("m", "cent_id", "scv")
      .withColumn("nscv", dot(col("scv"), col("scv")))
    val subs = e.select(col("vec_id"), col("v"),
        explode(sequence(lit(0), lit(pqM - 1))).as("m"))
      .select(col("vec_id"), col("m"),
        slice(col("v"), col("m") * subDim + 1, lit(subDim)).as("sv"))
      .withColumn("nsv", dot(col("sv"), col("sv")))
    val rel = relationalPqAssign(subs, book)

    val collected = book.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toIndexedSeq,
        r.getDouble(3)))
    val cb = (0 until pqM).map { m =>
      val g = collected.filter(_._1 == m).sortBy(_._2)
      (g.map(_._2).toIndexedSeq, g.map(_._3).toIndexedSeq,
        g.map(_._4).toIndexedSeq)
    }
    val ids = typedLit(cb.map(_._1))
    val cents = typedLit(cb.map(_._2))
    val norms = typedLit(cb.map(_._3))
    val got = e.select(col("vec_id"),
        NearestCentroidExpr.pqCodes(col("v"), ids, cents, norms,
          lit(subDim)).as("cells"))
      .collect()
      .flatMap(r => r.getSeq[Int](1).zipWithIndex.map { case (c, m) =>
        (r.getInt(0), m) -> c
      }).toMap
    assert(got == rel, s"pq_codes diverges:\nrel=$rel\ngot=$got")
    // ties resolved to the LOWER id (2, never 3) in subspace 1
    assert(!got.exists { case ((_, m), c) => m == 1 && c == 3 })

    // reconstruction = the winners' vectors concatenated in m order,
    // bit-exact (same doubles the relational winner join would fetch)
    val byId = collected.map(r => (r._1, r._2) -> r._3).toMap
    val rec = e.select(col("vec_id"),
        NearestCentroidExpr.pqReconstruct(col("v"), ids, cents, norms,
          lit(subDim)).as("rhat"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    data.foreach { case (i, _) =>
      val expect = (0 until pqM).flatMap(m => byId((m, rel((i, m)))))
      assert(rec(i) == expect, s"rhat diverges for vec $i")
    }
  }

  test("nearest_centroid_cos runs inside whole-stage codegen over a real scan") {
    registerAll()
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nv", sqrt(dot(col("v"), col("v"))))
    val cb = e.limit(4).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Double](1).toIndexedSeq))
    val df = e.select(NearestCentroidExpr.nearestCos(col("v"), col("nv"),
      typedLit(cb.map(_._1).toIndexedSeq),
      typedLit(cb.map(_._2).toIndexedSeq),
      typedLit(cb.map(c => math.sqrt(c._2.map(x => x * x).sum)).toIndexedSeq))
      .as("cell"))
    assert(df.collect().forall(!_.isNullAt(0)))
    val plan = df.queryExecution.executedPlan.toString
    assert(raw"\*\(\d+\) Project \[nearest_centroid_cos".r.findFirstIn(plan).nonEmpty,
      s"nearest_centroid_cos fell out of codegen:\n$plan")
  }
}
