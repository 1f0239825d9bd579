package graft

import scala.util.Random

import graft.ops.CmsSketch

/** Algebraic + statistical properties of the Count-Min aggregator: the
  * counter matrix must equal a serial ground-truth mirror independent
  * of element order and merge shape, and the derived point estimate
  * must be one-sided (never below the true count) and within the
  * standard εN overcount envelope on real data. */
class CmsSketchSpec extends SparkTestBase {

  private def truthCells(hs: Seq[Long], d: Int, w: Int): Seq[Long] = {
    val cells = new Array[Long](d * w)
    hs.foreach { h =>
      val h1 = h & ((1L << 30) - 1)
      val h2 = h >>> 30
      (0 until d).foreach(i => cells(i * w + ((h1 + i * h2) % w).toInt) += 1)
    }
    cells.toIndexedSeq
  }

  test("reduce/merge equal ground truth under random orders and merge shapes") {
    val rnd = new Random(31)
    for (trial <- 0 until 15) {
      val d = 2 + rnd.nextInt(4)
      val w = 1 << (4 + rnd.nextInt(5))
      val agg = new CmsSketch(d, w)
      val hs = Seq.fill(rnd.nextInt(500))(rnd.nextLong() >>> 4) // 60-bit domain
      val want = truthCells(hs, d, w)
      assert(rnd.shuffle(hs).foldLeft(agg.zero)(agg.reduce).toSeq == want,
        s"trial $trial fold")
      val parts = rnd.shuffle(hs).grouped(1 + rnd.nextInt(9)).toSeq
      val bufs = rnd.shuffle(parts.map(_.foldLeft(agg.zero)(agg.reduce)))
      assert(bufs.foldLeft(agg.zero)(agg.merge).toSeq == want,
        s"trial $trial merge shape")
    }
  }

  test("ta_cms_freq is partitioning-invariant and estimates are one-sided within eN") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val base = SparkEntry.queries("ta_cms_freq")(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(base.nonEmpty)
    val hashed = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .select(col("lang"),
        conv(substring(md5(col("w").cast("binary")), 1, 15), 16, 10)
          .cast("long").as("h"))
    def viaAgg(partitions: Int): Set[(String, Int, Int, Long)] = hashed
      .repartition(partitions).as[(String, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new CmsSketch(4, 1024).toColumn)
      .collect().flatMap { case (lang, cells) =>
        cells.zipWithIndex.collect {
          case (cnt, idx) if cnt > 0 => (lang, idx / 1024, idx % 1024, cnt)
        }
      }.toSet
    assert(viaAgg(1) == base, "cells depend on partitioning (1)")
    assert(viaAgg(13) == base, "cells depend on partitioning (13)")
    // estimates: for every term, min-over-rows >= exact count and the
    // overcount stays within the standard envelope (expected N/w per
    // row; assert a generous 8x that plus slack)
    val perLang = hashed.collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
    perLang.foreach { case (lang, rows) =>
      val hs = rows.map(_._2).toSeq
      val n = hs.size.toLong
      val cells = Array.fill(4096)(0L)
      base.filter(_._1 == lang).foreach { case (_, r, c, cnt) => cells(r * 1024 + c) = cnt }
      val exact = hs.groupBy(identity).map { case (h, g) => h -> g.size.toLong }
      val bound = 8L * n / 1024 + 2
      exact.foreach { case (h, c) =>
        val est = CmsSketch.estimate(cells.toIndexedSeq, 4, 1024, h)
        assert(est >= c, s"lang=$lang CMS undercounted: est=$est exact=$c")
        assert(est - c <= bound,
          s"lang=$lang overcount ${est - c} exceeds envelope $bound (n=$n)")
      }
    }
  }
}
