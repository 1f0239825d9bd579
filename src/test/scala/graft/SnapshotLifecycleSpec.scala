package graft

import graft.feed.{FeedGen, FeedSpec}
import graft.ingest.CdcIngest
import graft.ingest.CdcIngest.IngestConfig
import graft.lake.LakeTable

/** Snapshot lifecycle: rollback (Iceberg rollback analog — content AND
  * watermark restored as a new commit, replay converges afterwards) and
  * immutable named tags (retention anchors expiration must honor). */
class SnapshotLifecycleSpec extends SparkTestBase {

  private val spec = FeedSpec(seed = 61L, numEvents = 3000, numUrls = 300,
    eventsPerSegment = 500, evolveAtEvent = 1500)

  private def replay(): (LakeTable, String) = {
    val feed = tmpDir("lcfeed")
    FeedGen.writeSegments(spec, feed)
    val table = LakeTable.create(tmpDir("lctbl"), CdcIngest.PagesSchemaV1, 8)
    CdcIngest.run(spark, table, feed,
      IngestConfig(numBuckets = 8, segmentsPerBatch = 1))
    (table, feed)
  }

  private def state(df: org.apache.spark.sql.DataFrame): Set[(String, java.sql.Timestamp, String)] =
    df.select("url", "warc_ts", "text").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getString(2))).toSet

  test("rollback restores content + watermark; re-ingest converges to the oracle") {
    val (table, feed) = replay()
    val v6 = table.currentSnapshot().version
    assert(v6 == 6L && table.currentSnapshot().watermarkSegment == 5)
    val v3State = state(table.readAsOf(spark, 3L))
    val rolled = table.rollback(3L)
    assert(rolled.version == 7L, "rollback is a NEW commit, history intact")
    assert(rolled.watermarkSegment == 2,
      "rollback must restore the ingest resume point")
    assert(state(table.read(spark)) == v3State)
    // the restored schema is the PRE-EVOLUTION one (evolve hits in seg 3)
    assert(!table.currentSnapshot().schema.fieldNames.contains("fetch_status"),
      "rolling back across the evolution must restore the narrower schema")
    // replaying the same WAL re-applies segments 3..5 and converges
    CdcIngest.run(spark, table, feed, IngestConfig(numBuckets = 8, segmentsPerBatch = 1))
    val expected = FeedGen.expectedState(FeedGen.events(spec))
    assert(state(table.read(spark)) ==
      expected.values.map(e => (e.url, e.warcTs, e.text)).toSet)
    assert(table.currentSnapshot().schema.fieldNames.contains("fetch_status"),
      "re-ingest must re-evolve the schema")
  }

  test("tags are immutable anchors; expiration retains tagged snapshots and their files") {
    val (table, _) = replay()
    table.tag("audit", 2L)
    assert(table.resolveVersion("audit") == 2L)
    assert(table.resolveVersion("2") == 2L)
    table.tag("audit", 2L) // idempotent re-tag
    intercept[IllegalArgumentException](table.tag("audit", 4L))
    intercept[NoSuchElementException](table.resolveVersion("nope"))
    intercept[Exception](table.tag("bad", 99L)) // unknown version
    val v2State = state(table.readAsOf(spark, 2L))
    val (expired, _) = table.expireSnapshots(keepLast = 1)
    assert(!expired.contains(2L), "tagged snapshot must survive expiration")
    assert(expired.contains(1L) && expired.contains(3L),
      "untagged old snapshots expire normally")
    assert(state(table.readAsOf(spark, 2L)) == v2State,
      "tagged snapshot must stay byte-readable after expiration")
    assert(table.tags() == Map("audit" -> 2L))
  }
}
