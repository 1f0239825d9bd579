package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.feed.{FeedGen, FeedSpec}
import graft.ingest.CdcIngest
import graft.ingest.CdcIngest.IngestConfig
import graft.lake.{LakeTable, ZOrder}

/** Z-order clustering compaction: the Morton key's bit math, the
  * order-preserving column images, and the 2-D pruning claim that
  * justifies its existence — one layout under which BOTH the warc_ts
  * zone maps (filesInRange) and a second column's bounds
  * (filesInColRange) prune, where either linear order sacrifices one. */
class ZOrderSpec extends SparkTestBase {

  // all-v2 feed so fetch_status is populated on every row
  private val spec = FeedSpec(seed = 91L, numEvents = 6000, numUrls = 2000,
    eventsPerSegment = 1500, evolveAtEvent = 0)

  private def build(): LakeTable = {
    val feed = tmpDir("zofeed")
    FeedGen.writeSegments(spec, feed)
    val table = LakeTable.create(tmpDir("zotbl"), CdcIngest.PagesSchemaV1, 4)
    CdcIngest.run(spark, table, feed, IngestConfig(numBuckets = 4))
    table
  }

  test("bucketize is an exact binary search; interleave alternates bit slots") {
    import spark.implicits._
    // bounds [1,2,3]: bucket k = values in [bounds(k-1), bounds(k))
    val vals = Seq(Some(0.0), Some(1.0), Some(2.0), Some(3.0), Some(9.0), None)
      .toDF("v")
    val got = vals.select(ZOrder.bucketize(col("v"), Array(1.0, 2.0, 3.0)).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 1L, 2L, 3L, 3L, 0L), s"bucketize: $got")
    // interleave(8 bits, d=2): a fills even slots from bit 15, b odd
    val one = Seq((255L, 0L), (0L, 255L), (255L, 255L), (0L, 0L)).toDF("a", "b")
    val z = one.select(col("a"), col("b"),
      ZOrder.interleave(Seq(col("a"), col("b")), 8).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(z((255L, 0L)) == 0xAAAAL && z((0L, 255L)) == 0x5555L &&
      z((255L, 255L)) == 0xFFFFL && z((0L, 0L)) == 0L, s"interleave: $z")
  }

  test("zvalue spreads a skewed dimension equi-depth (no min-max collapse)") {
    import spark.implicits._
    // 5% of values are an extreme outlier cluster (the late-data shape):
    // min-max scaling would squeeze the other 95% into low bits; the
    // equi-depth z must still split the NON-outlier mass near its median
    val rows = (0 until 2000).map { i =>
      val a = if (i % 20 == 0) -86400000000L else i.toLong * 1000L
      (a, (i * 7919 % 2000).toLong)
    }
    val df = rows.toDF("a", "b")
    val schema = StructType(Seq(StructField("a", LongType), StructField("b", LongType)))
    val z = df.select(col("a"), ZOrder.zvalue(df, schema, Seq("a", "b")).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(z.forall(_._2 >= 0L) && z.forall(_._2 < (1L << 16)))
    // top z-bit (bit 15 = a's MSB) must split the rows near 50/50 even
    // though the outliers own 95% of the raw VALUE range
    val topSet = z.count { case (_, zz) => (zz >> 15 & 1L) == 1L }
    assert(math.abs(topSet - z.length / 2) < z.length / 8,
      s"equi-depth broken: $topSet of ${z.length} rows in the top half")
    // and the split is BY a's order: every top-bit row has larger a than
    // every outlier
    val cut = z.filter { case (_, zz) => (zz >> 15 & 1L) == 1L }.map(_._1).min
    assert(cut > -86400000000L && z.filter(_._1 < cut).forall(p => (p._2 >> 15 & 1L) == 0L))
  }

  test("images preserve order: strings in UTF-8 byte order, timestamps in micros") {
    import spark.implicits._
    val strs = Seq("", "a", "ab", "abc", "b", "ba", "z" * 10).toDF("s")
    val imgs = strs.select(ZOrder.image(StringType, col("s")).as("i"))
      .collect().map(_.getLong(0))
    assert(imgs.sliding(2).forall(p => p(0) < p(1)),
      s"string image order broken: ${imgs.mkString(",")}")
    val ts = Seq("2020-01-01 00:00:00", "2020-01-01 00:00:01", "2021-06-01 12:00:00")
      .map(java.sql.Timestamp.valueOf).toDF("t")
    val tImgs = ts.select(ZOrder.image(TimestampType, col("t")).as("i"))
      .collect().map(_.getLong(0))
    assert(tImgs.sliding(2).forall(p => p(0) < p(1)))
    intercept[IllegalArgumentException] {
      ZOrder.image(DoubleType, col("x"))
    }
    intercept[IllegalArgumentException] { // 1 column = linear sort, refused
      ZOrder.zvalue(strs, StructType(Seq(StructField("s", StringType))), Seq("s"))
    }
  }

  test("z-order prunes BOTH dimensions where each linear order sacrifices one") {
    // the demo needs two HIGH-cardinality dimensions: with a low-cardinality
    // leading column a linear sort keeps the trailing dimension sorted
    // within each run and prunes both anyway — content_len (~unique longs)
    // × warc_ts is the pair where linear orders genuinely trade off
    val table = build()
    val baseUs = FeedGen.BaseEpochMillis * 1000L
    // a 1/8 slice of the forward ts range; a 10% slice of content_len
    val (loUs, hiUs) = (baseUs + 1000L * 1000000L, baseUs + 1750L * 1000000L)
    def tsSel(s: graft.lake.Snapshot) = table.filesInRange(s, loUs, hiUs).size
    def clSel(s: graft.lake.Snapshot) =
      table.filesInColRange(s, "content_len", Some("10000"), Some("20000")).size

    // A: default time-sorted layout — ts prunes, content_len is scattered
    CdcIngest.compact(spark, table, maxFileRows = 100L)
    val a = table.currentSnapshot()
    assert(a.files.size > a.numBuckets, "maxFileRows must split buckets")
    assert(tsSel(a) <= a.files.size / 2, s"time sort must prune ts: ${tsSel(a)}/${a.files.size}")
    assert(clSel(a) > a.files.size * 4 / 5, s"content_len should be vacuous on time sort: ${clSel(a)}/${a.files.size}")

    // B: linear clusterBy(content_len) — content_len prunes, ts is scattered
    CdcIngest.compact(spark, table, maxFileRows = 100L, clusterBy = Seq("content_len"))
    val b = table.currentSnapshot()
    assert(clSel(b) <= b.files.size / 2, s"content_len cluster must prune it: ${clSel(b)}/${b.files.size}")
    assert(tsSel(b) > b.files.size * 4 / 5, s"ts should be vacuous on content_len cluster: ${tsSel(b)}/${b.files.size}")

    // C: z-order(warc_ts, content_len) — BOTH prune from one layout
    CdcIngest.compact(spark, table, maxFileRows = 100L,
      zOrderBy = Seq("warc_ts", "content_len"))
    val c = table.currentSnapshot()
    assert(tsSel(c) < c.files.size * 4 / 5 && tsSel(c) > 0,
      s"z-order lost ts pruning: ${tsSel(c)}/${c.files.size}")
    assert(clSel(c) < c.files.size * 4 / 5 && clSel(c) > 0,
      s"z-order lost content_len pruning: ${clSel(c)}/${c.files.size}")
    // the 2-D claim: no linear layout achieves both at once
    assert(tsSel(c) < tsSel(b), "z-order must beat the content_len-clustered layout on ts")
    assert(clSel(c) < clSel(a), "z-order must beat the time-sorted layout on content_len")

    // pruned reads stay exactly the full-scan filters on the z layout
    val prunedCl = table.readColRange(spark, "content_len", Some("10000"), Some("20000"))
      .select("url", "warc_ts").collect().map(r => (r.getString(0), r.getTimestamp(1))).toSet
    val fullCl = table.read(spark)
      .filter(col("content_len") >= 10000L && col("content_len") <= 20000L)
      .select("url", "warc_ts").collect().map(r => (r.getString(0), r.getTimestamp(1))).toSet
    assert(prunedCl == fullCl && prunedCl.nonEmpty)
    val prunedTs = table.readRange(spark, loUs, hiUs)
      .select("url", "warc_ts").collect().map(r => (r.getString(0), r.getTimestamp(1))).toSet
    val fullTs = table.read(spark).filter(
      col("warc_ts") >= lit(new java.sql.Timestamp(loUs / 1000L)) &&
        col("warc_ts") <= lit(new java.sql.Timestamp(hiUs / 1000L)))
      .select("url", "warc_ts").collect().map(r => (r.getString(0), r.getTimestamp(1))).toSet
    assert(prunedTs == fullTs && prunedTs.nonEmpty)

    // clusterBy and zOrderBy are mutually exclusive — conflicting orders
    intercept[IllegalArgumentException] {
      CdcIngest.compact(spark, table, clusterBy = Seq("lang"),
        zOrderBy = Seq("warc_ts", "fetch_status"))
    }
  }
}
