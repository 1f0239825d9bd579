package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.feed.{FeedGen, FeedSpec}
import graft.ingest.CdcIngest
import graft.ingest.CdcIngest.IngestConfig
import graft.lake.LakeTable

/** Type promotion (Iceberg ALTER TABLE … TYPE analog): a metadata-only
  * widening along the promotion matrix. Old files keep their narrower
  * physical type and upcast at scan time; later merges write the widened
  * type; time travel below the promotion still reads the old type. */
class TypePromotionSpec extends SparkTestBase {

  private val spec = FeedSpec(seed = 71L, numEvents = 2000, numUrls = 300,
    eventsPerSegment = 500, evolveAtEvent = 500)

  test("int->long promotion is metadata-only; reads upcast; later ingest converges") {
    val feed = tmpDir("promofeed")
    FeedGen.writeSegments(spec, feed)
    val table = LakeTable.create(tmpDir("promotbl"), CdcIngest.PagesSchemaV1, 8)
    CdcIngest.run(spark, table, feed, IngestConfig(numBuckets = 8, segmentsPerBatch = 1))
    val vPre = table.currentSnapshot().version
    assert(table.currentSnapshot().schema("fetch_status").dataType == IntegerType)
    val before = table.read(spark)
      .select("url", "warc_ts", "fetch_status").collect()
      .map(r => (r.getString(0), r.getTimestamp(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2).toLong))).toSet

    val snap = table.promoteColumn("fetch_status", LongType)
    assert(snap.files == table.readSnapshot(vPre).files,
      "promotion must not touch the file set (metadata-only)")
    assert(table.currentSnapshot().schema("fetch_status").dataType == LongType)
    // scan-time upcast: identical values, now as longs
    val after = table.read(spark)
      .select("url", "warc_ts", "fetch_status").collect()
      .map(r => (r.getString(0), r.getTimestamp(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(after == before, "upcast read must preserve every value")
    // time travel below the promotion still presents the narrow type
    assert(table.readAsOf(spark, vPre).schema("fetch_status").dataType == IntegerType)

    // later ingest merges int-decoded events into the widened table and
    // converges to the serial oracle; new files carry the widened type
    val bigger = spec.copy(numEvents = 4000)
    FeedGen.writeSegments(bigger, feed)
    CdcIngest.run(spark, table, feed, IngestConfig(numBuckets = 8, segmentsPerBatch = 1))
    val expected = FeedGen.expectedState(FeedGen.events(bigger))
    val got = table.read(spark).select("url", "warc_ts", "text", "fetch_status")
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got == expected.values.map(e =>
      (e.url, e.warcTs, e.text, e.fetch_status.map(_.toLong))).toSet)
    val newFile = table.currentSnapshot().files
      .find(_.addedVersion == table.currentSnapshot().version).get
    val physical = spark.read.parquet(table.root.resolve(newFile.path).toString)
    assert(physical.schema("fetch_status").dataType == LongType,
      "post-promotion merges must write the widened physical type")
  }

  test("promotions needing a rewrite, and narrowings, are refused") {
    val table = LakeTable.create(tmpDir("promoref"), CdcIngest.PagesSchemaV1, 4)
    // content-bearing promotion paths that the scan cannot upcast in place
    val e1 = intercept[IllegalArgumentException](
      table.promoteColumn("lang", BinaryType)) // not in the matrix at all
    assert(e1.getMessage.contains("promotion matrix"))
    val e2 = intercept[IllegalArgumentException](
      table.promoteColumn("warc_ts", StringType)) // promotable but needs rewrite
    assert(e2.getMessage.contains("rewrite"))
    intercept[NoSuchElementException](table.promoteColumn("nope", LongType))
  }
}
