package graft

import scala.util.Random

import graft.ops.HllSketch

/** Algebraic + statistical properties of the HLL aggregator: registers
  * must be independent of element order, merge shape, and duplication
  * (idempotent max), match a serial ground-truth mirror, and the derived
  * estimate must track exact distinct counts within HLL's error bound. */
class HllSketchSpec extends SparkTestBase {

  private def truthRegs(hs: Seq[Long], p: Int): Seq[Int] = {
    val m = 1 << p
    val regs = new Array[Int](m)
    hs.foreach { h =>
      val reg = (h & (m - 1)).toInt
      val w = h >>> p
      val rho = (60 - p) - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1
      if (rho > regs(reg)) regs(reg) = rho
    }
    regs.toIndexedSeq
  }

  test("reduce/merge equal ground truth under random orders, merge shapes, and duplication") {
    val rnd = new Random(11)
    for (trial <- 0 until 15) {
      val p = 4 + rnd.nextInt(6)
      val agg = new HllSketch(p)
      val hs = Seq.fill(rnd.nextInt(300))(rnd.nextLong() >>> 4) // 60-bit domain
      val want = truthRegs(hs, p)
      // shuffled single fold, with every element delivered 1-3 times
      val dup = rnd.shuffle(hs.flatMap(h => Seq.fill(1 + rnd.nextInt(3))(h)))
      assert(dup.foldLeft(agg.zero)(agg.reduce).toSeq == want, s"trial $trial fold")
      // random partitioning merged in random order
      val parts = rnd.shuffle(hs).grouped(1 + rnd.nextInt(7)).toSeq
      val bufs = rnd.shuffle(parts.map(_.foldLeft(agg.zero)(agg.reduce)))
      val merged = bufs.foldLeft(agg.zero)(agg.merge)
      assert(merged.toSeq == want, s"trial $trial merge shape")
    }
  }

  test("estimate tracks exact cardinality within the p=9 error regime") {
    val rnd = new Random(23)
    for (n <- Seq(50, 500, 5000, 50000)) {
      val hs = Seq.fill(n)(rnd.nextLong() >>> 4).distinct
      val est = HllSketch.estimate(truthRegs(hs, 9), 9)
      val err = math.abs(est - hs.size) / hs.size.toDouble
      // 3 sigma at m=512 is ~14%; linear counting regime is tighter
      assert(err < 0.15, f"n=$n est=$est%.0f err=$err%.3f")
    }
  }

  test("ta_hll_distinct is partitioning-invariant and its estimate matches exact distinct") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val q = SparkEntry.queries("ta_hll_distinct")
    val base = q(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(base.nonEmpty)
    // the distributed registers are independent of partitioning and match
    // the serial mirror over the same hashes
    val hashed = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("lang"),
        conv(substring(md5(regexp_replace(lower(col("text")), "\\s+", " ")
          .cast("binary")), 1, 15), 16, 10).cast("long").as("h"))
    def viaAgg(partitions: Int): Set[(String, Int, Int)] = hashed
      .repartition(partitions).as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new HllSketch(9).toColumn)
      .collect().flatMap { case (lang, regs) =>
        regs.zipWithIndex.collect { case (rho, reg) if rho > 0 => (lang, reg, rho) }
      }.toSet
    assert(viaAgg(1) == base, "registers depend on partitioning (1)")
    assert(viaAgg(13) == base, "registers depend on partitioning (13)")
    val mirror = hashed.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).flatMap { case (lang, hs) =>
        truthRegs(hs.map(_._2).toSeq, 9).zipWithIndex.collect {
          case (rho, reg) if rho > 0 => (lang, reg, rho)
        }
      }.toSet
    assert(mirror == base, "registers disagree with the serial mirror")
    // estimate per lang from the emitted occupied registers vs exact
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("lang"), regexp_replace(lower(col("text")), "\\s+", " ").as("norm"))
    val exact = docs.groupBy("lang").agg(countDistinct(col("norm")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (lang, d) =>
      val regs = Array.fill(512)(0)
      base.filter(_._1 == lang).foreach { case (_, reg, rho) => regs(reg) = rho }
      val est = HllSketch.estimate(regs.toIndexedSeq, 9)
      val err = math.abs(est - d) / d.toDouble
      assert(err < 0.15, f"lang=$lang exact=$d est=$est%.0f err=$err%.3f")
    }
  }
}
