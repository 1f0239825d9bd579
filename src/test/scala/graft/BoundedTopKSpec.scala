package graft

import scala.util.Random

import graft.ops.BoundedTopK

/** Algebraic properties of the bounded top-k aggregator: the result must
  * be independent of element order and merge shape (what Spark's partial
  * aggregation relies on), and always equal the ground-truth sort.take(k). */
class BoundedTopKSpec extends SparkTestBase {

  // multiset semantics: duplicates rank separately, exactly like row_number
  private def truth(xs: Seq[(String, Long)], k: Int): Seq[(String, Long)] =
    xs.sortBy(identity).take(k)

  test("reduce/merge equal ground truth under random orders and merge shapes") {
    val rnd = new Random(7)
    for (trial <- 0 until 20) {
      val k = 1 + rnd.nextInt(8)
      val agg = new BoundedTopK(k)
      val n = rnd.nextInt(60)
      val xs = Seq.fill(n)((f"h${rnd.nextInt(20)}%02d", rnd.nextInt(10).toLong))
      val want = truth(xs, k)
      // single fold, shuffled
      val shuffled = rnd.shuffle(xs)
      assert(shuffled.foldLeft(agg.zero)(agg.reduce) == want, s"trial $trial fold")
      // random partitioning into 1..5 buffers, merged in random order
      val parts = shuffled.grouped(1 + rnd.nextInt(5)).toSeq
      val bufs = rnd.shuffle(parts.map(_.foldLeft(agg.zero)(agg.reduce)))
      val merged = bufs.foldLeft(agg.zero)(agg.merge)
      assert(merged == want, s"trial $trial merge shape")
    }
  }

  test("distributed result is partitioning-invariant and matches the window form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("lang"),
        md5(concat(col("doc_id").cast("string"), lit(":sample")).cast("binary")).as("h"),
        col("doc_id"))
    def viaAgg(partitions: Int): Set[(Long, String, Int)] = docs
      .repartition(partitions)
      .as[(String, String, Long)]
      .groupByKey(_._1).mapValues(r => (r._2, r._3))
      .agg(new BoundedTopK(30).toColumn)
      .flatMap { case (lang, items) =>
        items.iterator.zipWithIndex.map { case ((_, id), i) => (id, lang, i + 1) }
      }.collect().toSet
    val w = Window.partitionBy(col("lang")).orderBy(col("h"))
    val viaWindow = docs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 30).select(col("doc_id"), col("lang"), col("rk"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val one = viaAgg(1)
    assert(one == viaAgg(13), "result depends on partitioning")
    assert(one == viaWindow, "aggregator disagrees with the window rank")
  }
}
