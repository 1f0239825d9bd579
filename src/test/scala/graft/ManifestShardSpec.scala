package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.feed.{FeedGen, FeedSpec}
import graft.ingest.CdcIngest
import graft.ingest.CdcIngest.IngestConfig
import graft.lake.LakeTable

/** Sharded snapshot manifests (Iceberg manifest-list analog): the snapshot
  * JSON carries an O(buckets) manifest LIST; per-bucket entries live in
  * content-addressed immutable manifest files. The property under test is
  * the 100-TB one: a commit touching k buckets writes k manifest files +
  * one small snapshot, NEVER an O(total files) rewrite. */
class ManifestShardSpec extends SparkTestBase {

  private val spec = FeedSpec(seed = 91L, numEvents = 4000, numUrls = 800,
    eventsPerSegment = 1000, evolveAtEvent = 2000)

  private def build(buckets: Int = 8): LakeTable = {
    val feed = tmpDir("msfeed")
    FeedGen.writeSegments(spec, feed)
    val table = LakeTable.create(tmpDir("mstbl"), CdcIngest.PagesSchemaV1, buckets)
    CdcIngest.run(spark, table, feed, IngestConfig(numBuckets = buckets))
    table
  }

  private def manifestNames(t: LakeTable): Set[String] =
    if (!Files.isDirectory(t.manifestsDir)) Set.empty
    else Files.list(t.manifestsDir).iterator().asScala
      .map(_.getFileName.toString).filterNot(_.startsWith(".")).toSet

  test("a 1-bucket rewrite commits exactly 1 new manifest; all other refs are reused by path") {
    val table = build()
    val before = table.currentSnapshot()
    val beforeNames = manifestNames(table)
    CdcIngest.compact(spark, table, buckets = Some(Set(0)))
    val after = table.currentSnapshot()
    val newNames = manifestNames(table) -- beforeNames
    assert(newNames.size == 1,
      s"1-bucket compaction must write exactly 1 new manifest, wrote: $newNames")
    val beforeRefs = before.manifests.map(r => r.bucket -> r.path).toMap
    val afterRefs = after.manifests.map(r => r.bucket -> r.path).toMap
    (beforeRefs.keySet - 0).foreach { b =>
      assert(afterRefs(b) == beforeRefs(b),
        s"untouched bucket $b must re-reference the parent's manifest")
    }
    assert(afterRefs(0) != beforeRefs.getOrElse(0, ""),
      "the rewritten bucket must get a new manifest")
  }

  test("a metadata-only commit (promoteColumn) writes ZERO new manifests") {
    val table = build()
    val before = manifestNames(table)
    val beforeRefs = table.currentSnapshot().manifests
    table.promoteColumn("fetch_status", org.apache.spark.sql.types.LongType)
    assert(manifestNames(table) == before,
      "promote is O(1): no bucket changed, no manifest written")
    assert(table.currentSnapshot().manifests == beforeRefs)
  }

  test("snapshot round-trips through the sharded format (files, deletes, stats)") {
    val table = build()
    val committed = table.currentSnapshot()
    // a second LakeTable instance = cold cache, full re-parse from disk
    val cold = LakeTable.load(table.root.toString)
    val reread = cold.currentSnapshot()
    assert(reread.files.toSet == committed.files.toSet)
    assert(reread.deleteFiles.toSet == committed.deleteFiles.toSet)
    assert(reread.manifests == committed.manifests)
    assert(reread.schemaJson == committed.schemaJson &&
      reread.watermarkSegment == committed.watermarkSegment)
  }

  test("legacy inline-format snapshots still parse (pre-shard tables stay readable)") {
    val root = Paths.get(tmpDir("mslegacy"))
    Files.createDirectories(root.resolve("snapshots"))
    Files.createDirectories(root.resolve("data"))
    val legacy =
      """{
        |  "version": 3, "batchId": "seg0-1", "parentVersion": 2,
        |  "watermarkSegment": 1,
        |  "schemaJson": "{\"type\":\"struct\",\"fields\":[{\"name\":\"url\",\"type\":\"string\",\"nullable\":false,\"metadata\":{}}]}",
        |  "numBuckets": 4,
        |  "files": [
        |    {"path": "data/s00000003-b00001-000.parquet", "bucket": 1,
        |     "rows": 7, "sizeBytes": 99, "tsMinMicros": 5, "tsMaxMicros": 9,
        |     "addedVersion": 3,
        |     "colStats": {"lang": {"t": "string", "min": "de", "max": "ru"}}}
        |  ],
        |  "deleteFiles": [
        |    {"path": "data/s00000003-del-b00001-000.parquet", "bucket": 1,
        |     "rows": 2, "sizeBytes": 11, "addedVersion": 3}
        |  ],
        |  "lineage": [], "metrics": {"events": 7}
        |}""".stripMargin
    Files.write(root.resolve("snapshots/v000000000003.json"), legacy.getBytes("UTF-8"))
    val snap = LakeTable.load(root.toString).readSnapshot(3L)
    assert(snap.files.size == 1 && snap.files.head.rows == 7 &&
      snap.files.head.colStats("lang").max == "ru")
    assert(snap.deleteFiles.size == 1 && snap.deleteFiles.head.rows == 2)
    assert(snap.manifests.isEmpty)
  }

  test("expiration deletes only expired-exclusive manifests; shared ones survive") {
    val feed = tmpDir("msexpfeed")
    FeedGen.writeSegments(spec, feed)
    val table = LakeTable.create(tmpDir("msexptbl"), CdcIngest.PagesSchemaV1, 8)
    CdcIngest.run(spark, table, feed,
      IngestConfig(numBuckets = 8, segmentsPerBatch = 1))
    val vMax = table.currentSnapshot().version
    assert(vMax >= 2, "need history to expire")
    val (expired, _) = table.expireSnapshots(keepLast = 1)
    assert(expired.nonEmpty)
    // the retained snapshot must still read through its (shared) manifests
    val cold = LakeTable.load(table.root.toString)
    assert(cold.read(spark).count() > 0)
    // every surviving manifest is referenced; nothing referenced was lost
    assert(cold.orphanManifests().isEmpty,
      "expiration must delete exactly the expired-exclusive manifests")
    val refs = cold.currentSnapshot().manifests.map(_.path).toSet
    refs.foreach(p => assert(Files.exists(cold.root.resolve(p))))
  }

  test("commit cost is O(touched), not O(table): snapshot JSON stays small as files grow") {
    // grow the table's file count via split compaction, then trickle-commit
    // one bucket and compare the snapshot JSON size against the total
    // entry volume — the pre-shard format serialized EVERY entry per commit
    val table = build()
    CdcIngest.compact(spark, table, maxFileRows = 30L)
    val snap = table.currentSnapshot()
    assert(snap.files.size > 15, s"want many files, got ${snap.files.size}")
    CdcIngest.compact(spark, table, buckets = Some(Set(1)))
    val v = table.currentSnapshot().version
    val snapBytes = Files.size(table.root.resolve(f"snapshots/v$v%012d.json"))
    val allManifestBytes = Files.list(table.manifestsDir).iterator().asScala
      .filterNot(_.getFileName.toString.startsWith("."))
      .map(Files.size).sum
    // the snapshot JSON (manifest list) must be far smaller than the full
    // entry volume it replaces — O(buckets) refs vs O(files) entries
    assert(snapBytes < allManifestBytes / 2,
      s"manifest list ($snapBytes B) should be small vs entries ($allManifestBytes B)")
  }

  test("orphan manifests from a lost-race commit are visible to GC and never referenced") {
    val table = build()
    val cur = table.currentSnapshot()
    // simulate the loser of a version race: manifests written, claim lost
    val twin = cur.copy(version = cur.version + 1, parentVersion = cur.version,
      batchId = "loser",
      files = cur.files.map(f => f.copy(rows = f.rows))) // same content
    // winner commits first
    table.rollback(cur.version)
    val e = intercept[IllegalArgumentException](table.commit(twin))
    assert(e.getMessage.contains("commit conflict"))
    // content-addressed: the loser's manifests dedup against existing ones,
    // so nothing is orphaned here — and the sweep agrees
    assert(table.orphanManifests().isEmpty)
  }
}
