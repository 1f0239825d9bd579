package graft

import graft.feed.{FeedGen, FeedSpec}
import graft.ingest.CdcIngest
import graft.ingest.CdcIngest.IngestConfig
import graft.lake.LakeTable
import org.apache.spark.sql.types._

/** Rename/drop schema evolution (Iceberg field-ID analog): metadata-only
  * commits where old files keep their physical columns and the read path
  * coalesces the alias chain back into the current names. Covers the
  * mid-stream rename against the serial oracle, time travel across the
  * rename, compaction folding the chain away, alias-aware stat pruning,
  * the structural/resurrection refusals, and the fail-closed commit gate.
  */
class SchemaRenameSpec extends SparkTestBase {

  private val spec = FeedSpec(seed = 71L, numEvents = 3000, numUrls = 300,
    eventsPerSegment = 500, evolveAtEvent = 1000)
  private val cfg = IngestConfig(numBuckets = 8, segmentsPerBatch = 1)

  /** Ingest 3 segments (covers the v2 evolution at event 1000), then rename
    * `lang` → `language` and `fetch_status` → `http_status`, drop `html`,
    * and ingest the remaining segments — so the final table mixes files
    * written under BOTH physical layouts, and post-rename batches arrive
    * with the decoder's ORIGINAL field names. */
  private def replayWithRename(): (LakeTable, Long) = {
    val feed = tmpDir("rnfeed")
    FeedGen.writeSegments(spec, feed)
    val table = LakeTable.create(tmpDir("rntbl"), CdcIngest.PagesSchemaV1, 8)
    val segs = CdcIngest.listSegments(feed, spark.sessionState.newHadoopConf())
    val (first, rest) = segs.splitAt(3)
    first.foreach(sg => CdcIngest.applyBatch(spark, table, Seq(sg), cfg))
    val preRenameV = table.currentSnapshot().version
    table.renameColumn("lang", "language")
    table.renameColumn("fetch_status", "http_status")
    table.dropColumn("html")
    rest.foreach(sg => CdcIngest.applyBatch(spark, table, Seq(sg), cfg))
    (table, preRenameV)
  }

  private def finalStateOf(table: LakeTable): Set[(String, Long, String, String, Any)] =
    table.read(spark)
      .select("url", "warc_ts", "language", "text", "http_status")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getString(2),
        r.getString(3), if (r.isNullAt(4)) null else r.getInt(4))).toSet

  test("mid-stream rename + drop: final state matches the serial oracle through the alias read") {
    val (table, _) = replayWithRename()
    val snap = table.currentSnapshot()
    assert(snap.schema.fieldNames.toSeq ==
      Seq("url", "warc_ts", "text", "language", "http_status", "content_len"),
      "renames applied, html dropped, v2 columns present")
    assert(snap.renames == Map(
      "language" -> Seq("lang"), "http_status" -> Seq("fetch_status")))
    assert(snap.retired == Seq("html"))
    val expected = FeedGen.expectedState(FeedGen.events(spec)).values.map { e =>
      (e.url, e.warcTs.getTime, e.lang, e.text,
        e.fetch_status.map(x => x: Any).orNull)
    }.toSet
    assert(finalStateOf(table) == expected,
      "old-physical-name files and new-name files must coalesce into one state")
  }

  test("time travel reads pre-rename versions through their own schema") {
    val (table, preV) = replayWithRename()
    val old = table.readAsOf(spark, preV)
    assert(old.columns.contains("lang") && old.columns.contains("html") &&
      !old.columns.contains("language"))
    assert(old.count() > 0)
  }

  test("compaction folds the alias chain into the current physical names") {
    val (table, _) = replayWithRename()
    val before = finalStateOf(table)
    CdcIngest.compact(spark, table)
    assert(finalStateOf(table) == before, "compaction must not change state")
    val snap = table.currentSnapshot()
    val one = spark.read.parquet(
      table.root.resolve(snap.files.head.path).toString)
    assert(one.columns.contains("language") && !one.columns.contains("lang"),
      "compacted files are written under the CURRENT physical names")
  }

  test("stat pruning follows the alias chain for renamed columns") {
    val (table, _) = replayWithRename()
    val snap = table.currentSnapshot()
    // pre-rename files recorded their string stats under 'lang'; an
    // impossible range on the CURRENT name must still prune them
    val pruned = table.filesInColRange(snap, "language", Some("zz"), None)
    assert(pruned.size < snap.files.size,
      s"alias stats must prune (kept ${pruned.size} of ${snap.files.size})")
    // and the pruned read still returns correct (empty) results
    assert(table.readColRange(spark, "language", Some("zz"), None).count() == 0)
  }

  test("structural and resurrection refusals") {
    val (table, _) = replayWithRename()
    intercept[IllegalArgumentException](table.renameColumn("url", "page_url"))
    intercept[IllegalArgumentException](table.dropColumn("warc_ts"))
    intercept[IllegalArgumentException](table.renameColumn("text", "language"))
    // 'lang' is a live alias and 'html' retired: both names stay reserved
    intercept[IllegalArgumentException](table.renameColumn("text", "lang"))
    intercept[IllegalArgumentException](table.renameColumn("text", "html"))
    // re-adding a dropped column is refused by the commit gate itself
    val cur = table.currentSnapshot()
    val withHtml = StructType(cur.schema.fields :+
      StructField("html", BinaryType, nullable = true))
    intercept[IllegalArgumentException](table.commit(cur.copy(
      version = cur.version + 1, parentVersion = cur.version,
      batchId = "resurrect", schemaJson = withHtml.json)))
  }

  test("an UNDECLARED drop still fails the commit gate closed") {
    val (table, _) = replayWithRename()
    val cur = table.currentSnapshot()
    val narrowed = StructType(cur.schema.fields.filterNot(_.name == "text"))
    intercept[graft.schema.SchemaValidator.SchemaEvolutionException](
      table.commit(cur.copy(version = cur.version + 1,
        parentVersion = cur.version, batchId = "undeclared-drop",
        schemaJson = narrowed.json)))
  }

  test("rollback across a rename restores the old names and aliases") {
    val (table, preV) = replayWithRename()
    table.rollback(preV)
    val snap = table.currentSnapshot()
    assert(snap.schema.fieldNames.contains("lang") &&
      snap.schema.fieldNames.contains("html") &&
      !snap.schema.fieldNames.contains("language"))
    assert(snap.renames.isEmpty && snap.retired.isEmpty,
      "rollback restores the TARGET snapshot's rename state")
    assert(table.read(spark).count() > 0)
  }
}
