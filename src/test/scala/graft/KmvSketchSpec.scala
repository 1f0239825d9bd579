package graft

import scala.util.Random

import graft.ops.KmvSketch

/** Algebraic + statistical properties of the KMV bottom-k aggregator: the
  * sketch must equal the exact k smallest distinct values independent of
  * element order, duplication, partitioning, and merge shape (it is a
  * deterministic function of the input SET), and the derived cardinality
  * and Jaccard estimates must track ground truth within the standard
  * 1/sqrt(k) envelope on real data. */
class KmvSketchSpec extends SparkTestBase {

  private def truthBottomK(hs: Seq[Long], k: Int): Seq[Long] =
    hs.distinct.sorted.take(k)

  test("reduce/merge equal the exact bottom-k under random orders, dups, and merge shapes") {
    val rnd = new Random(47)
    for (trial <- 0 until 20) {
      val k = 1 + rnd.nextInt(64)
      val agg = new KmvSketch(k)
      val base = Seq.fill(rnd.nextInt(400))(rnd.nextLong() >>> 4)
      // duplication must not change a set sketch
      val hs = base ++ Seq.fill(rnd.nextInt(100))(
        if (base.isEmpty) rnd.nextLong() >>> 4 else base(rnd.nextInt(base.size)))
      val want = truthBottomK(hs, k)
      assert(rnd.shuffle(hs).foldLeft(agg.zero)(agg.reduce).toSeq == want,
        s"trial $trial fold")
      val parts = rnd.shuffle(hs).grouped(1 + rnd.nextInt(7)).toSeq
      val bufs = rnd.shuffle(parts.map(_.foldLeft(agg.zero)(agg.reduce)))
      assert(bufs.foldLeft(agg.zero)(agg.merge).toSeq == want,
        s"trial $trial merge shape")
    }
  }

  test("ta_kmv_overlap is partitioning-invariant and estimates track exact set overlap") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sf = "/root/testdata/sf0.01"
    val K = 256
    val base = SparkEntry.queries("ta_kmv_overlap")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(base.nonEmpty)

    // exact per-lang shingle-hash sets, serially mirrored from the table
    val toks = split(col("text"), " ")
    val hashed = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), toks.as("ts"))
      .select(col("lang"),
        explode(when(size(col("ts")) >= 3,
          transform(sequence(lit(1), size(col("ts")) - 2),
            i => conv(substring(md5(concat_ws(" ", element_at(col("ts"), i),
              element_at(col("ts"), i + 1), element_at(col("ts"), i + 2))
              .cast("binary")), 1, 15), 16, 10).cast("long")))
          .otherwise(array().cast("array<long>"))).as("h"))
    val exactSets = hashed.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (l, rows) => l -> rows.map(_._2).toSet }

    // partitioning invariance of the sketch itself
    def sketchOf(partitions: Int): Map[String, Seq[Long]] = hashed
      .repartition(partitions).as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new KmvSketch(K).toColumn)
      .collect().toMap
    val sk1 = sketchOf(1)
    assert(sketchOf(13) == sk1, "sketch depends on partitioning")
    sk1.foreach { case (lang, sk) =>
      assert(sk == exactSets(lang).toSeq.sorted.take(K),
        s"lang=$lang sketch is not the exact bottom-$K")
    }

    // cardinality estimate within the 1/sqrt(k) envelope (≈6%; allow 4x)
    exactSets.foreach { case (lang, s) =>
      val est = KmvSketch.estimate(sk1(lang), K)
      assert(math.abs(est - s.size) <= math.max(4.0 * s.size / math.sqrt(K), 2.0),
        s"lang=$lang cardinality est=$est exact=${s.size}")
    }

    // pairwise Jaccard estimate within the envelope, and the query's
    // integer surface agrees with KmvSketch.overlap's derivation
    base.foreach { case (la, lb, kUnion, unionKth, nShared, ppm) =>
      val (jEst, _) = KmvSketch.overlap(sk1(la), sk1(lb), K)
      assert(ppm == (nShared * 1000000L) / kUnion, "ppm must be the floor division")
      val sa = exactSets(la); val sb = exactSets(lb)
      val jTrue = sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(math.abs(jEst - jTrue) <= 4.0 / math.sqrt(K) + 0.02,
        s"pair ($la,$lb) jaccard est=$jEst true=$jTrue")
      val u = (sk1(la) ++ sk1(lb)).distinct.sorted.take(K)
      assert(kUnion == u.size && unionKth == u.last,
        s"pair ($la,$lb) union sketch surface mismatch")
    }
  }
}
