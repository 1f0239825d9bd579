package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.codec.RecordCodec
import graft.feed.{FeedGen, FeedSpec}
import graft.ingest.CdcIngest
import graft.ingest.CdcIngest.IngestConfig
import graft.lake.LakeTable
import graft.model.ChangeEvent

/** Time-travel reads (`readAsOf`, Iceberg VERSION AS OF) and the
  * incremental changelog (`changesBetween`, Iceberg table_changes analog)
  * against serial-oracle folds of the same feed. */
class TimeTravelSpec extends SparkTestBase {

  /** LWW fold INCLUDING delete winners (FeedGen.expectedState drops them;
    * the changelog classification needs the tombstone winners too). */
  private def winnerFold(evs: Iterator[ChangeEvent]): Map[String, ChangeEvent] = {
    val m = scala.collection.mutable.HashMap.empty[String, ChangeEvent]
    evs.foreach { e =>
      m.get(e.url) match {
        case Some(cur)
            if (cur.warcTs.getTime > e.warcTs.getTime) ||
              (cur.warcTs.getTime == e.warcTs.getTime && cur.seq >= e.seq) => ()
        case _ => m.update(e.url, e)
      }
    }
    m.toMap
  }

  private val spec = FeedSpec(seed = 11L, numEvents = 4000, numUrls = 300,
    eventsPerSegment = 500, evolveAtEvent = 3000)
  private val cut = 2000 // batch 1 = segments 0-3 = seq < 2000

  private def replay(): LakeTable = {
    val feed = tmpDir("ttfeed")
    FeedGen.writeSegments(spec, feed)
    val table = LakeTable.create(tmpDir("tttbl"), CdcIngest.PagesSchemaV1, 8)
    CdcIngest.run(spark, table, feed, IngestConfig(numBuckets = 8, segmentsPerBatch = 4))
    table
  }

  test("readAsOf: each version matches the serial-oracle prefix fold") {
    val table = replay()
    val vs = table.listVersions().sorted
    assert(vs.size == 3) // create + 2 batches
    // v1: pre-evolution schema (evolution lands in batch 2)
    val s1 = table.readSnapshot(vs(1))
    assert(!s1.schema.fieldNames.contains("fetch_status"),
      "evolved column leaked into the pre-evolution snapshot")
    val exp1 = FeedGen.expectedState(FeedGen.events(spec).take(cut))
    val got1 = table.readAsOf(spark, vs(1))
      .select("url", "warc_ts", "text", "lang").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getString(2), r.getString(3)))
      .toSet
    assert(got1 == exp1.values.map(e => (e.url, e.warcTs, e.text, e.lang)).toSet)
    // v2 (latest): readAsOf == read (non-binary columns — Row equality on
    // Array[Byte] is referential)
    val proj = Seq("url", "warc_ts", "text", "lang", "fetch_status", "content_len")
    val cur = table.read(spark).select(proj.map(col): _*).collect().toSet
    assert(table.readAsOf(spark, vs.last).select(proj.map(col): _*).collect().toSet == cur)
  }

  test("changesBetween: I/U/D classification matches the serial-oracle diff") {
    val table = replay()
    val vs = table.listVersions().sorted
    val w1 = winnerFold(FeedGen.events(spec).take(cut))
    val w2 = winnerFold(FeedGen.events(spec))
    def live(m: Map[String, ChangeEvent]) = m.filter(_._2.op != ChangeEvent.OpDelete)
    val (l1, l2) = (live(w1), live(w2))
    val expI = l2.keySet -- l1.keySet
    val expD = l1.keySet -- l2.keySet
    val expU = (l1.keySet & l2.keySet).filter(u => l1(u).seq != l2(u).seq)
    val got = table.changesBetween(spark, vs(1), vs.last)
      .select(col("change_op"), col("url"), col("warc_ts"), col("text"), col("lang"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2),
        r.getString(3), r.getString(4)))
    val byOp = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byOp.getOrElse("I", Set.empty) == expI)
    assert(byOp.getOrElse("D", Set.empty) == expD)
    assert(byOp.getOrElse("U", Set.empty) == expU)
    // payload of I/U rows is the new winner's; D rows carry the delete's
    // warc_ts with a nulled payload (tombstone shape)
    got.foreach {
      case ("D", url, ts, text, lang) =>
        assert(ts == w2(url).warcTs && text == null && lang == null)
      case (_, url, ts, text, lang) =>
        assert(ts == l2(url).warcTs && text == l2(url).text && lang == l2(url).lang)
    }
    // full-history diff from the create snapshot: every live row is an I
    val all = table.changesBetween(spark, vs(0), vs.last)
    assert(all.filter(col("change_op") === "I").count() == l2.size)
    assert(all.filter(col("change_op") =!= "I").count() == 0)
  }

  test("changeDeltas: pre/post-images match the serial-oracle folds") {
    val table = replay()
    val vs = table.listVersions().sorted
    val w1 = winnerFold(FeedGen.events(spec).take(cut))
    val w2 = winnerFold(FeedGen.events(spec))
    val d = table.changeDeltas(spark, vs(1), vs.last)
      .select("change_op", "url", "warc_ts_before", "warc_ts_after",
        "text_before", "text_after", "content_len_before", "content_len_after")
      .collect()
    // classification agrees with changesBetween on the same version pair
    val keyed = d.map(r => (r.getString(1), r.getString(0))).toSet
    val cb = table.changesBetween(spark, vs(1), vs.last)
      .select("url", "change_op").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(keyed == cb)
    // all three classes exercised by this feed
    assert(d.map(_.getString(0)).toSet == Set("I", "U", "D"))
    d.foreach { r =>
      val (op, url) = (r.getString(0), r.getString(1))
      r.getString(0) match {
        case "I" => // no live pre-image: before side all null
          assert(r.isNullAt(2) && r.isNullAt(4) && r.isNullAt(6), s"I $url has a pre-image")
          assert(r.getTimestamp(3) == w2(url).warcTs && r.getString(5) == w2(url).text)
        case "D" => // no live post-image; pre-image = the old live winner
          assert(r.isNullAt(3) && r.isNullAt(5) && r.isNullAt(7), s"D $url has a post-image")
          assert(r.getTimestamp(2) == w1(url).warcTs && r.getString(4) == w1(url).text)
        case "U" => // both images live, each matching its fold's winner
          assert(r.getTimestamp(2) == w1(url).warcTs && r.getString(4) == w1(url).text)
          assert(r.getTimestamp(3) == w2(url).warcTs && r.getString(5) == w2(url).text)
          // evolution null-fill: the pre-evolution winner has no content_len
          if (w1(url).schemaVersion < RecordCodec.SchemaV2) assert(r.isNullAt(6))
      }
    }
  }

  test("changesBetween: a small batch diffs only its touched buckets") {
    val base = FeedSpec(seed = 13L, numEvents = 2000, numUrls = 400,
      eventsPerSegment = 1000)
    val feed = tmpDir("prfeed")
    FeedGen.writeSegments(base, feed)
    val table = LakeTable.create(tmpDir("prtbl"), CdcIngest.PagesSchemaV1, 16)
    CdcIngest.run(spark, table, feed, IngestConfig(numBuckets = 16, segmentsPerBatch = 2))
    // hand-built third segment: 5 updates to urls LIVE in the base fold
    // (a tombstoned url would correctly classify as I, not U), strictly newer
    val liveBase = FeedGen.expectedState(FeedGen.events(base)).keySet
    val picks = (0 until base.numUrls).iterator.map(FeedGen.urlOf(base, _))
      .filter(liveBase.contains).take(5).toSeq
    val tsMicros = 4102444800000000L // far future: guaranteed LWW winners
    val extra = picks.zipWithIndex.map { case (url, i) =>
      ChangeEvent(ChangeEvent.OpUpdate, 2000L + i, url,
        RecordCodec.microsToTimestamp(tsMicros + i * 1000000L),
        FeedGen.htmlOf(url, tsMicros), FeedGen.textOf(url, tsMicros, "en"),
        "en", RecordCodec.SchemaV1, None, None)
    }
    Files.write(Paths.get(feed, "segment-000002.bin"),
      RecordCodec.frameSegment(extra.iterator.map(RecordCodec.encode)))
    CdcIngest.run(spark, table, feed, IngestConfig(numBuckets = 16, segmentsPerBatch = 2))
    val vs = table.listVersions().sorted
    val (s1, s2) = (table.readSnapshot(vs(1)), table.readSnapshot(vs.last))
    val changed = table.changedBuckets(s1, s2)
    assert(changed.size <= 5, s"expected <=5 changed buckets, got $changed")
    val diff = table.changesBetween(spark, vs(1), vs.last).collect()
    assert(diff.length == 5)
    assert(diff.forall(_.getString(0) == "U"))
    assert(diff.map(_.getString(1)).toSet == extra.map(_.url).toSet)
  }
}
