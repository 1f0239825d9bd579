package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.codec.RecordCodec
import graft.feed.{FeedGen, FeedSpec}
import graft.ingest.CdcIngest
import graft.ingest.CdcIngest.IngestConfig
import graft.lake.LakeTable
import graft.model.ChangeEvent

/** Table-maintenance surface: driver-side bucket planning (`bucketOf` /
  * `lookup`), snapshot expiration (`expireSnapshots`, Iceberg
  * expire_snapshots analog), and the time-clustering contract of sorted
  * compaction (rows ordered by warc_ts within every compacted bucket file —
  * what makes parquet row-group min/max skipping selective for time-range
  * scans on a key-bucketed layout). */
class LakeMaintenanceSpec extends SparkTestBase {

  private val spec = FeedSpec(seed = 21L, numEvents = 3000, numUrls = 300,
    eventsPerSegment = 500)

  private def replay(buckets: Int = 8): LakeTable = {
    val feed = tmpDir("lmfeed")
    FeedGen.writeSegments(spec, feed)
    val table = LakeTable.create(tmpDir("lmtbl"), CdcIngest.PagesSchemaV1, buckets)
    CdcIngest.run(spark, table, feed, IngestConfig(numBuckets = buckets, segmentsPerBatch = 2))
    table
  }

  test("staleTmpDirs: old .tmp-* crash debris is swept, live writers' dirs are not") {
    val table = replay()
    // crash debris: a writer killed between Spark output and move-into-
    // place leaves its .tmp dir behind; backdate the WHOLE tree past the
    // age guard (the guard is the newest mtime anywhere in the tree)
    val dead = table.root.resolve(".tmp-dead-crash")
    Files.createDirectories(dead.resolve(s"${LakeTable.BucketCol}=0"))
    Files.write(dead.resolve(s"${LakeTable.BucketCol}=0").resolve("part-0.parquet"),
      Array[Byte](1, 2, 3))
    val old = java.nio.file.attribute.FileTime.fromMillis( // past the 24 h default guard
      System.currentTimeMillis() - 25L * 60 * 60 * 1000)
    Seq(dead, dead.resolve(s"${LakeTable.BucketCol}=0"),
      dead.resolve(s"${LakeTable.BucketCol}=0").resolve("part-0.parquet"))
      .foreach(Files.setLastModifiedTime(_, old))
    // a LIVE long-running job: the tmp ROOT is old (Spark set it at job
    // start) but a task file deep inside is fresh — must never be listed
    // (this is the exact case a root-mtime-only guard got wrong)
    val live = table.root.resolve(".tmp-live-write")
    Files.createDirectories(live.resolve("_temporary"))
    Files.write(live.resolve("_temporary").resolve("part-0.parquet"),
      Array[Byte](9))
    Files.setLastModifiedTime(live, old) // stale root, fresh child
    val stale = table.staleTmpDirs()
    assert(stale.map(_.getFileName.toString) == Seq(".tmp-dead-crash"),
      s"expected only the fully-backdated dir, got $stale")
    // neither shows up in the file/manifest orphan sweeps (the gap this
    // listing closes)
    assert(!table.orphanFiles().exists(_.toString.contains(".tmp-")))
    // tighter age guard picks up the fresh one too — the knob works
    assert(table.staleTmpDirs(olderThanMs = -1L).size == 2)
  }

  test("bucketOf matches bucketExpr for every key shape") {
    import spark.implicits._
    val urls = (0 until 300).map(FeedGen.urlOf(spec, _)) ++
      Seq("", "a", "https://x.example.com/§·ü/path", "exactly-one-char-ж")
    val viaExpr = urls.toDF("url")
      .select(col("url"), LakeTable.bucketExpr(8).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    urls.foreach { u =>
      assert(LakeTable.bucketOf(u, 8) == viaExpr(u), s"bucketOf mismatch for '$u'")
    }
  }

  test("lookup: reads only the keys' buckets and returns exactly their live state") {
    val table = replay()
    val snap = table.currentSnapshot()
    val expected = FeedGen.expectedState(FeedGen.events(spec))
    // one live url, one url the feed never inserted
    val live = expected.keys.take(3).toSeq
    val absent = "https://never.example.com/nope"
    val keys = live :+ absent
    // pruning: the planned file set covers only the keys' buckets, a strict
    // subset of the table's files
    val planned = table.lookupFiles(snap, keys)
    val wantBuckets = keys.map(LakeTable.bucketOf(_, snap.numBuckets)).toSet
    assert(planned.map(_.bucket).toSet.subsetOf(wantBuckets))
    assert(planned.size < snap.files.size,
      s"lookup planned ${planned.size} of ${snap.files.size} files — no pruning")
    // correctness vs the serial oracle
    val got = table.lookup(spark, keys)
      .select("url", "warc_ts", "text", "lang").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getString(2), r.getString(3)))
      .toSet
    val want = live.map(u => expected(u))
      .map(e => (e.url, e.warcTs, e.text, e.lang)).toSet
    assert(got == want)
  }

  test("expireSnapshots: old versions gone, retained state byte-stable, shared files survive") {
    val table = replay()
    val before = table.listVersions().sorted
    assert(before.size >= 3) // create + >=2 batches
    val curBefore = table.read(spark)
      .select("url", "warc_ts", "text").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getString(2))).toSet
    // keep the last TWO snapshots: files the last batch carried over from
    // its parent are referenced by both a retained and an expired snapshot
    // and must survive
    val keep = 2
    val (expired, deleted) = table.expireSnapshots(keepLast = keep)
    assert(expired == before.dropRight(keep))
    assert(table.listVersions().sorted == before.takeRight(keep))
    // current read is identical
    val curAfter = table.read(spark)
      .select("url", "warc_ts", "text").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getString(2))).toSet
    assert(curAfter == curBefore)
    // every retained snapshot's file really exists (shared files survived)
    table.listVersions().foreach { v =>
      table.readSnapshot(v).files.foreach { f =>
        assert(Files.exists(table.root.resolve(f.path)), s"retained file ${f.path} deleted")
      }
    }
    // deleted files are gone and were not referenced by retained snapshots
    val retained = table.listVersions()
      .flatMap(v => table.readSnapshot(v).files.map(_.path)).toSet
    deleted.foreach { p =>
      assert(!Files.exists(p))
      assert(!retained.contains(table.root.relativize(p).toString))
    }
    // time travel to an expired version fails on the missing manifest
    intercept[Exception](table.readSnapshot(expired.last))
    // nothing is orphaned: expiration cleaned up completely
    assert(table.orphanFiles().isEmpty)
    // retaining less than the current snapshot is rejected
    intercept[IllegalArgumentException](table.expireSnapshots(0))
  }

  test("compact: every bucket file is warc_ts-sorted (row-group skipping contract)") {
    val table = replay()
    CdcIngest.compact(spark, table)
    val snap = table.currentSnapshot()
    assert(snap.files.nonEmpty)
    assert(snap.files.groupBy(_.bucket).values.forall(_.size == 1),
      "compaction should leave one file per bucket")
    snap.files.foreach { f =>
      val ts = spark.read.parquet(table.root.resolve(f.path).toString)
        .select("warc_ts").collect().map(_.getTimestamp(0).getTime)
      val sorted = ts.zip(ts.tail).forall { case (a, b) => a <= b }
      assert(sorted, s"bucket ${f.bucket} file not time-clustered after compaction")
    }
    // logical content unchanged by the sorted rewrite
    val expected = FeedGen.expectedState(FeedGen.events(spec))
    val got = table.read(spark)
      .select("url", "warc_ts", "text").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getString(2))).toSet
    assert(got == expected.values.map(e => (e.url, e.warcTs, e.text)).toSet)
  }

  test("zone maps: manifest ts stats are honest; time-slice scan prunes files and matches a full-scan filter") {
    val table = replay()
    // stats recorded at ingest time for every data file, and honest: the
    // recorded bounds equal the file's actual non-null min/max
    val snap0 = table.currentSnapshot()
    assert(snap0.files.nonEmpty)
    assert(snap0.files.forall(f => f.tsMinMicros.isDefined && f.tsMaxMicros.isDefined),
      "ingest-written files must carry warc_ts zone maps")
    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000 + (t.getNanos / 1000) % 1000
    snap0.files.take(3).foreach { f =>
      val ts = spark.read.parquet(table.root.resolve(f.path).toString)
        .select("warc_ts").where(col("warc_ts").isNotNull)
        .collect().map(r => micros(r.getTimestamp(0)))
      assert(ts.min == f.tsMinMicros.get && ts.max == f.tsMaxMicros.get,
        s"${f.path}: recorded [${f.tsMinMicros.get}, ${f.tsMaxMicros.get}] " +
          s"!= actual [${ts.min}, ${ts.max}]")
    }
    // ts-sorted compaction with small files → per-bucket files partition the
    // ts range → a narrow slice prunes files from the manifest alone
    CdcIngest.compact(spark, table, maxFileRows = 8)
    val snap = table.currentSnapshot()
    assert(snap.files.size > snap.numBuckets, "expected multi-file buckets")
    val lo = (FeedGen.BaseEpochMillis + 1000L * 1000L) * 1000L
    val hi = (FeedGen.BaseEpochMillis + 2000L * 1000L) * 1000L
    val planned = table.filesInRange(snap, lo, hi)
    assert(planned.size < snap.files.size,
      s"slice planned ${planned.size} of ${snap.files.size} files — no pruning")
    // correctness: the pruned scan equals a full scan with the same filter
    def inst(us: Long) = java.time.Instant.ofEpochSecond(us / 1000000L, us % 1000000L * 1000L)
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getTimestamp(1), r.getString(2))
    val got = table.readRange(spark, lo, hi)
      .select("url", "warc_ts", "text").collect().map(key).toSet
    val want = table.read(spark)
      .filter(col("warc_ts") >= lit(inst(lo)) && col("warc_ts") <= lit(inst(hi)))
      .select("url", "warc_ts", "text").collect().map(key).toSet
    assert(got == want)
    assert(got.nonEmpty, "slice chosen to contain winners at this seed")
    // legacy manifests (no stats) degrade to a full plan, never a wrong one
    val legacy = snap.copy(files =
      snap.files.map(_.copy(tsMinMicros = None, tsMaxMicros = None)))
    assert(table.filesInRange(legacy, lo, hi).size == snap.files.size)
  }

  /** Far-future update events for the given urls (guaranteed LWW winners),
    * framed as the feed's next contiguous segment. */
  private def raceSegment(feed: String, segId: Int, urls: Seq[String]): Seq[ChangeEvent] = {
    val tsMicros = 4102444800000000L
    val extra = urls.zipWithIndex.map { case (url, i) =>
      ChangeEvent(ChangeEvent.OpUpdate, 10000L + i, url,
        RecordCodec.microsToTimestamp(tsMicros + i * 1000000L),
        FeedGen.htmlOf(url, tsMicros), FeedGen.textOf(url, tsMicros, "en"),
        "en", RecordCodec.SchemaV1, None, None)
    }
    Files.write(Paths.get(feed, f"segment-$segId%06d.bin"),
      RecordCodec.frameSegment(extra.iterator.map(RecordCodec.encode)))
    extra
  }

  /** Every data file on disk must be referenced by SOME snapshot —
    * a raced compaction may abandon work but never leak orphans. */
  private def orphanFiles(table: LakeTable): Set[String] = {
    val refs = table.listVersions()
      .flatMap(v => table.readSnapshot(v).files.map(_.path)).toSet
    val st = Files.list(table.dataDir)
    val onDisk =
      try {
        val it = st.iterator()
        val b = Set.newBuilder[String]
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString.endsWith(".parquet"))
            b += table.root.relativize(p).toString
        }
        b.result()
      } finally st.close()
    onDisk -- refs
  }

  test("maxFileRows: merge splits bucket files; small-file compact re-clusters them") {
    val feed = tmpDir("sffeed")
    FeedGen.writeSegments(spec, feed)
    val table = LakeTable.create(tmpDir("sftbl"), CdcIngest.PagesSchemaV1, 4)
    CdcIngest.run(spark, table, feed,
      IngestConfig(numBuckets = 4, segmentsPerBatch = 6, maxFileRows = 50))
    val snap0 = table.currentSnapshot()
    val multi = snap0.files.groupBy(_.bucket).filter(_._2.size >= 2)
    assert(multi.nonEmpty, "maxFileRows produced no multi-file buckets")
    assert(snap0.files.forall(_.rows <= 50), "a data file exceeds maxFileRows")
    val expected = FeedGen.expectedState(FeedGen.events(spec))
      .values.map(e => (e.url, e.warcTs, e.text)).toSet
    def state() = table.read(spark).select("url", "warc_ts", "text").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getString(2))).toSet
    assert(state() == expected)
    // small-file maintenance: compact ONLY the multi-file buckets
    val snap1 = CdcIngest.compact(spark, table, buckets = Some(multi.keySet))
    multi.keySet.foreach { b =>
      assert(snap1.files.count(_.bucket == b) == 1, s"bucket $b not re-clustered")
    }
    // untouched buckets' file entries are carried verbatim — no rewrite
    val untouched = snap0.files.filterNot(f => multi.keySet(f.bucket)).toSet
    assert(untouched.subsetOf(snap1.files.toSet))
    assert(state() == expected)
    assert(orphanFiles(table).isEmpty)
  }

  test("materialized view: seed, incremental refresh, idempotence, single live version") {
    import graft.lake.MaterializedView
    val feed = tmpDir("mvfeed")
    FeedGen.writeSegments(spec, feed)
    val table = LakeTable.create(tmpDir("mvtbl"), CdcIngest.PagesSchemaV1, 8)
    CdcIngest.run(spark, table, feed, IngestConfig(numBuckets = 8, segmentsPerBatch = 2))
    val mv = tmpDir("mvroot")
    def recompute(): Set[(String, Long, Long)] = {
      val t = table.read(spark)
      val bytes = if (t.columns.contains("content_len"))
        coalesce(col("content_len"), lit(0L)) else lit(0L)
      t.groupBy(element_at(split(col("url"), "/"), 3).as("host"))
        .agg(count(lit(1)).as("n_pages"), sum(bytes).as("total_bytes"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    }
    def mvSet(): Set[(String, Long, Long)] = MaterializedView.read(spark, mv)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val v0 = MaterializedView.seed(spark, table, mv)
    assert(mvSet() == recompute())
    // advance the table (updates + the feed's own deletes), refresh from deltas
    val liveBase = FeedGen.expectedState(FeedGen.events(spec))
    val picks = (0 until spec.numUrls).iterator.map(FeedGen.urlOf(spec, _))
      .filter(liveBase.contains).take(5).toSeq
    raceSegment(feed, 6, picks)
    CdcIngest.run(spark, table, feed, IngestConfig(numBuckets = 8, segmentsPerBatch = 2))
    val (from, to) = MaterializedView.refresh(spark, table, mv)
    assert(from == v0 && to == table.currentSnapshot().version)
    assert(mvSet() == recompute(), "refreshed MV diverges from full recompute")
    // idempotent: already current
    assert(MaterializedView.refresh(spark, table, mv) == (to, to))
    // exactly one live version dir + state.json remain
    val entries = Files.list(Paths.get(mv)).iterator()
    val names = scala.collection.mutable.Buffer.empty[String]
    while (entries.hasNext) names += entries.next().getFileName.toString
    assert(names.count(_.startsWith("v")) == 1, s"stale MV versions: $names")
    assert(names.contains("state.json"))
  }

  test("materialized view: a crash-orphaned version dir is overwritten, not trusted") {
    import graft.lake.MaterializedView
    val feed = tmpDir("mvcfeed")
    FeedGen.writeSegments(spec, feed)
    val table = LakeTable.create(tmpDir("mvctbl"), CdcIngest.PagesSchemaV1, 8)
    CdcIngest.run(spark, table, feed, IngestConfig(numBuckets = 8, segmentsPerBatch = 2))
    val mv = tmpDir("mvcroot")
    MaterializedView.seed(spark, table, mv)
    // simulate a refresh that crashed AFTER writing its version dir but
    // BEFORE flipping state.json: a later refresh must overwrite the
    // partial dir, never serve it
    val liveBase = FeedGen.expectedState(FeedGen.events(spec))
    val picks = (0 until spec.numUrls).iterator.map(FeedGen.urlOf(spec, _))
      .filter(liveBase.contains).take(3).toSeq
    raceSegment(feed, 6, picks)
    CdcIngest.run(spark, table, feed, IngestConfig(numBuckets = 8, segmentsPerBatch = 2))
    val crashV = table.currentSnapshot().version
    val partial = Paths.get(mv, f"v$crashV%012d")
    Files.createDirectories(partial)
    Files.write(partial.resolve("garbage.parquet"), Array[Byte](1, 2, 3))
    val (_, to) = MaterializedView.refresh(spark, table, mv)
    assert(to == crashV)
    // the MV serves the REAL refresh result, not the crash debris
    val t = table.read(spark)
    val want = t.groupBy(element_at(split(col("url"), "/"), 3).as("host"))
      .agg(count(lit(1)).as("n_pages"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = MaterializedView.read(spark, mv).select("host", "n_pages")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == want, "crash-orphaned MV dir leaked into the served view")
  }

  test("rebucket: layout evolves per snapshot; reads, lookups, time travel, ingest follow") {
    val feed = tmpDir("rbfeed")
    FeedGen.writeSegments(spec, feed)
    val table = LakeTable.create(tmpDir("rbtbl"), CdcIngest.PagesSchemaV1, 8)
    CdcIngest.run(spark, table, feed, IngestConfig(numBuckets = 8, segmentsPerBatch = 2))
    val vPre = table.currentSnapshot().version
    def state() = table.read(spark).select("url", "warc_ts", "text").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getString(2))).toSet
    val before = state()
    val snap = CdcIngest.rebucket(spark, table, 16)
    assert(snap.numBuckets == 16 && table.currentSnapshot().numBuckets == 16)
    assert(state() == before, "rebucket changed logical content")
    // every file's rows hash to its manifest bucket under the NEW layout
    snap.files.foreach { f =>
      val urls = spark.read.parquet(table.root.resolve(f.path).toString)
        .select("url").collect().map(_.getString(0))
      assert(urls.forall(u => LakeTable.bucketOf(u, 16) == f.bucket),
        s"rows misplaced in bucket ${f.bucket}")
    }
    // point lookup plans with the new layout and still answers correctly
    val expected = FeedGen.expectedState(FeedGen.events(spec))
    val keys = expected.keys.take(3).toSeq
    val got = table.lookup(spark, keys).select("url", "warc_ts", "text").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getString(2))).toSet
    assert(got == keys.map(u => (u, expected(u).warcTs, expected(u).text)).toSet)
    // time travel to the pre-rebucket snapshot is untouched (old layout)
    val pre = table.readAsOf(spark, vPre).select("url", "warc_ts", "text").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getString(2))).toSet
    assert(pre == before)
    // further ingest merges correctly against the 16-bucket layout
    val picks = expected.keys.take(4).toSeq
    val extra = raceSegment(feed, 6, picks)
    CdcIngest.run(spark, table, feed, IngestConfig(numBuckets = 16, segmentsPerBatch = 2))
    val want = FeedGen.expectedState(FeedGen.events(spec).concat(extra.iterator))
      .values.map(e => (e.url, e.warcTs, e.text)).toSet
    assert(state() == want, "post-rebucket ingest diverged from the oracle")
    assert(orphanFiles(table).isEmpty)
  }

  test("rebucket then expire reclaims the old layout's storage") {
    // a rebucket doubles storage until retention lapses — expire must GC
    // every old-layout file once no retained snapshot references it
    val feed = tmpDir("refeed")
    FeedGen.writeSegments(spec, feed)
    val table = LakeTable.create(tmpDir("retbl"), CdcIngest.PagesSchemaV1, 8)
    CdcIngest.run(spark, table, feed, IngestConfig(numBuckets = 8, segmentsPerBatch = 2))
    val oldFiles = table.currentSnapshot().files.map(_.path).toSet
    CdcIngest.rebucket(spark, table, 16)
    val state = table.read(spark).select("url", "warc_ts", "text").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getString(2))).toSet
    table.expireSnapshots(keepLast = 1)
    oldFiles.foreach { f =>
      assert(!Files.exists(table.root.resolve(f)),
        s"old-layout file $f survived expiration")
    }
    assert(orphanFiles(table).isEmpty)
    val after = table.read(spark).select("url", "warc_ts", "text").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getString(2))).toSet
    assert(after == state, "expiration disturbed the retained snapshot")
  }

  test("commit: losing a version race throws and never clobbers the winner") {
    // rename(2) silently replaces an existing target, so the version claim
    // must be link(2)-based — this pins that a same-version commit from a
    // different batch FAILS and the first writer's snapshot survives intact
    val table = replay()
    val base = table.currentSnapshot()
    val a = base.copy(version = base.version + 1, batchId = "writer-a",
      parentVersion = base.version)
    val b = base.copy(version = base.version + 1, batchId = "writer-b",
      parentVersion = base.version)
    table.commit(a)
    assert(table.tryCommit(b).isEmpty, "lost race must be reported, not absorbed")
    intercept[IllegalArgumentException](table.commit(b))
    assert(table.readSnapshot(a.version).batchId == "writer-a",
      "loser's commit clobbered the winner's snapshot")
    // idempotent re-commit of the SAME batch still succeeds
    assert(table.commit(a).batchId == "writer-a")
    assert(table.tryCommit(a).map(_.batchId).contains("writer-a"))
  }

  test("changeDeltas across a pure compaction is empty (renames are not changes)") {
    val table = replay()
    val v0 = table.currentSnapshot().version
    CdcIngest.compact(spark, table)
    val v1 = table.currentSnapshot().version
    assert(v1 > v0)
    assert(table.changeDeltas(spark, v0, v1).isEmpty,
      "compaction's file renames surfaced as logical changes")
    assert(table.changesBetween(spark, v0, v1).isEmpty)
  }

  test("compact: optimistic commit rebases around a racing ingest (partial progress)") {
    val feed = tmpDir("ccfeed")
    FeedGen.writeSegments(spec, feed)
    val table = LakeTable.create(tmpDir("cctbl"), CdcIngest.PagesSchemaV1, 8)
    CdcIngest.run(spark, table, feed, IngestConfig(numBuckets = 8, segmentsPerBatch = 2))
    val liveBase = FeedGen.expectedState(FeedGen.events(spec))
    // racer updates 4 live urls → rewrites only their buckets
    val picks = (0 until spec.numUrls).iterator.map(FeedGen.urlOf(spec, _))
      .filter(liveBase.contains).take(4).toSeq
    val racedBuckets = picks.map(LakeTable.bucketOf(_, 8)).toSet
    var extra: Seq[ChangeEvent] = Seq.empty
    val snap = CdcIngest.compact(spark, table, beforeCommit = () => {
      extra = raceSegment(feed, 6, picks)
      CdcIngest.run(spark, table, feed, IngestConfig(numBuckets = 8, segmentsPerBatch = 2))
    })
    // partial progress: exactly the racer's buckets were abandoned
    assert(snap.metrics("abandonedBuckets") == racedBuckets.size.toLong,
      s"expected ${racedBuckets.size} abandoned, got ${snap.metrics("abandonedBuckets")}")
    val byBucket = snap.files.groupBy(_.bucket)
    (0 until 8).filterNot(racedBuckets).filter(byBucket.contains).foreach { b =>
      assert(byBucket(b).size == 1, s"kept bucket $b not compacted to one file")
    }
    // NOTHING lost: final state = serial fold of base feed + racer's updates
    val want = FeedGen.expectedState(FeedGen.events(spec).concat(extra.iterator))
    val got = table.read(spark)
      .select("url", "warc_ts", "text").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getString(2))).toSet
    assert(got == want.values.map(e => (e.url, e.warcTs, e.text)).toSet,
      "racing ingest's updates were lost by the compaction rebase")
    assert(orphanFiles(table).isEmpty, s"orphaned data files: ${orphanFiles(table)}")
  }

  test("compact: total conflict abandons cleanly, no new snapshot, no orphans") {
    val feed = tmpDir("ctfeed")
    FeedGen.writeSegments(spec, feed)
    val table = LakeTable.create(tmpDir("cttbl"), CdcIngest.PagesSchemaV1, 8)
    CdcIngest.run(spark, table, feed, IngestConfig(numBuckets = 8, segmentsPerBatch = 2))
    val liveBase = FeedGen.expectedState(FeedGen.events(spec))
    // racer touches EVERY bucket: pick one live url per bucket
    val byBucket = liveBase.keySet.groupBy(LakeTable.bucketOf(_, 8))
    assert(byBucket.size == 8, "feed too small to populate all buckets")
    val picks = byBucket.values.map(_.head).toSeq
    var extra: Seq[ChangeEvent] = Seq.empty
    val snap = CdcIngest.compact(spark, table, beforeCommit = () => {
      extra = raceSegment(feed, 6, picks)
      CdcIngest.run(spark, table, feed, IngestConfig(numBuckets = 8, segmentsPerBatch = 2))
    })
    // compaction contributed nothing: returned snapshot IS the racer's
    assert(snap.version == table.listVersions().max)
    assert(!snap.batchId.startsWith("compact-"),
      "a fully-conflicted compaction must not commit")
    val want = FeedGen.expectedState(FeedGen.events(spec).concat(extra.iterator))
    val got = table.read(spark)
      .select("url", "warc_ts", "text").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getString(2))).toSet
    assert(got == want.values.map(e => (e.url, e.warcTs, e.text)).toSet)
    assert(orphanFiles(table).isEmpty, s"orphaned data files: ${orphanFiles(table)}")
  }
}
