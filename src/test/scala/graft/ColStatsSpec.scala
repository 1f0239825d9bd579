package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.feed.{FeedGen, FeedSpec}
import graft.ingest.CdcIngest
import graft.ingest.CdcIngest.IngestConfig
import graft.lake.LakeTable

/** Generalized per-column zone maps (Iceberg lower/upper-bounds analog) +
  * clustering compaction: footer-harvested bounds in the manifest, the
  * manifest-only planner (`filesInColRange`), the pruned reader
  * (`readColRange`), and the clusterBy rewrite that gives the bounds
  * teeth. */
class ColStatsSpec extends SparkTestBase {

  private val spec = FeedSpec(seed = 77L, numEvents = 4000, numUrls = 1500,
    eventsPerSegment = 1000, evolveAtEvent = 2000)

  private def build(): LakeTable = {
    val feed = tmpDir("csfeed")
    FeedGen.writeSegments(spec, feed)
    val table = LakeTable.create(tmpDir("cstbl"), CdcIngest.PagesSchemaV1, 4)
    CdcIngest.run(spark, table, feed, IngestConfig(numBuckets = 4))
    table
  }

  test("manifest entries carry typed bounds; unbounded text is refused, not truncated") {
    val table = build()
    val snap = table.currentSnapshot()
    snap.files.foreach { f =>
      val lang = f.colStats.get("lang")
      assert(lang.exists(st => st.typ == "string" &&
        LakeTable.statOrder("string", st.min, st.max) <= 0),
        s"${f.path} lacks a lang bound")
      assert(!f.colStats.contains("warc_ts"),
        "warc_ts stays in the specialized zone map, not colStats")
    }
    // the 64-char cap: a column with long values must be ABSENT (refused,
    // not truncated — a truncated max is a WRONG bound for pruning)
    val longDir = tmpDir("cslong")
    import spark.implicits._
    Seq(("k1", "x" * 200), ("k2", "y" * 200)).toDF("k", "payload")
      .coalesce(1).write.mode("overwrite").parquet(longDir)
    val part = java.nio.file.Files.list(java.nio.file.Paths.get(longDir))
      .iterator()
    val pFile = scala.jdk.CollectionConverters.IteratorHasAsScala(part).asScala
      .find(_.toString.endsWith(".parquet")).get
    val (_, _, stats) = CdcIngest.parquetFooterAll(pFile,
      spark.sessionState.newHadoopConf())
    assert(stats.contains("k") && !stats.contains("payload"),
      s"64-char cap violated: $stats")
    // snapshot JSON round-trips the stats
    val reread = table.readSnapshot(snap.version)
    assert(reread.files.map(f => f.path -> f.colStats).toMap ==
      snap.files.map(f => f.path -> f.colStats).toMap)
  }

  test("annotated INT32/INT64 columns (timestamp/date) record no stat — prune-correct, never prune-wrong") {
    // an annotated physical int stores micros/days, but readColRange casts
    // user bounds into the EXTERNAL domain — recording them as "long"
    // would compare micros against user values and prune wrongly
    val dir = tmpDir("csann")
    import spark.implicits._
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        java.sql.Date.valueOf("2024-01-01")),
      (2L, java.sql.Timestamp.valueOf("2024-06-01 00:00:00"),
        java.sql.Date.valueOf("2024-06-01"))
    ).toDF("plain", "event_ts", "event_date")
    val prev = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try df.coalesce(1).write.mode("overwrite").parquet(dir)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    val pFile = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.find(_.toString.endsWith(".parquet")).get
    val (_, _, stats) = CdcIngest.parquetFooterAll(pFile,
      spark.sessionState.newHadoopConf())
    assert(stats.get("plain").exists(s => s.typ == "long" && s.min == "1" && s.max == "2"))
    assert(!stats.contains("event_ts"),
      s"annotated TIMESTAMP_MICROS int must record no stat: $stats")
    assert(!stats.contains("event_date"),
      s"annotated DATE int must record no stat: $stats")
  }

  test("string statOrder is unsigned UTF-8 byte order, matching parquet stats and UTF8String") {
    // U+1F600 (UTF-8 F0 9F 98 80) vs U+E000 (UTF-8 EE 80 80): UTF-16
    // code-unit order says emoji < private-use (D83D < E000); byte order
    // says emoji > private-use — the divergence that mis-pruned files
    val emoji = new String(Character.toChars(0x1F600))
    val pua = "\uE000"
    assert(emoji.compareTo(pua) < 0, "sanity: UTF-16 order diverges here")
    assert(LakeTable.statOrder("string", emoji, pua) > 0,
      "statOrder must follow UTF-8 byte order")
    assert(LakeTable.statOrder("string", "abc", "abd") < 0)
    assert(LakeTable.statOrder("string", "abc", "abc") == 0)
    assert(LakeTable.statOrder("string", "ab", "abc") < 0)
  }

  test("clusterBy compaction makes lang bounds tight and pruning real") {
    val table = build()
    // time-sorted-only layout: lang spans ~every file, pruning is vacuous
    CdcIngest.compact(spark, table, maxFileRows = 150L)
    val flat = table.currentSnapshot()
    val flatSel = table.filesInColRange(flat, "lang", Some("de"), Some("de"))
    assert(flatSel.size > flat.files.size / 2,
      "without clustering, most files should contain some 'de' rows")
    // clustered rewrite: each rolled file covers a tight lang range
    CdcIngest.compact(spark, table, maxFileRows = 150L, clusterBy = Seq("lang"))
    val clus = table.currentSnapshot()
    assert(clus.files.size > clus.numBuckets, "maxFileRows must split buckets")
    val clusSel = table.filesInColRange(clus, "lang", Some("de"), Some("de"))
    assert(clusSel.nonEmpty && clusSel.size <= clus.files.size / 2 &&
      clusSel.size < flatSel.size,
      s"clustered pruning has no teeth: ${clusSel.size} of ${clus.files.size} files")
    // and the pruned read is exactly the full-scan filter
    val pruned = table.readColRange(spark, "lang", Some("de"), Some("de"))
      .select("url", "warc_ts", "lang").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getString(2))).toSet
    val full = table.read(spark).filter(col("lang") === "de")
      .select("url", "warc_ts", "lang").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getString(2))).toSet
    assert(pruned == full, "pruned read must equal the full-scan filter")
    assert(pruned.nonEmpty)
  }

  test("numeric bounds prune after the v2 evolution, and stat-less files are kept") {
    val table = build()
    CdcIngest.compact(spark, table, maxFileRows = 150L,
      clusterBy = Seq("fetch_status"))
    val snap = table.currentSnapshot()
    // fetch_status is v2-only: rows from v1 events are null there — files
    // can still carry bounds over their non-null values
    val sel = table.filesInColRange(snap, "fetch_status", Some("404"), Some("404"))
    assert(sel.size < snap.files.size, "status pruning should drop some files")
    val pruned = table.readColRange(spark, "fetch_status", Some("404"), Some("404"))
    val full = table.read(spark).filter(col("fetch_status") === 404)
    assert(pruned.count() == full.count() && pruned.count() > 0)
    // a column nobody recorded stats for prunes nothing (correct, not fast)
    assert(table.filesInColRange(snap, "no_such_col", Some("x"), Some("x"))
      .size == snap.files.size)
  }
}
