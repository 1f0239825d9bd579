package graft.feed

import java.nio.file.{Files, Path, Paths}
import java.sql.Timestamp
import java.util.Random

import graft.codec.RecordCodec
import graft.model.ChangeEvent

/** Deterministic change-feed generator (test + bench input; FIXTURES.md §2).
  * Seed-fixed `java.util.Random` (LCG, spec-stable across JVMs); no
  * wall-clock, no external data. Produces a binlog/WAL-style directory of
  * framed binary segment files `segment-%06d.bin`.
  *
  * Knobs mirror the failure modes the engine must survive (SURVEY.md §5):
  * hot-domain Zipf skew (salting), duplicates (idempotent dedup), late
  * arrivals (cross-batch LWW), deletes (tombstones), and a mid-stream
  * schema-evolution switch to v2 records (additive evolution).
  */
final case class FeedSpec(
    seed: Long = 42L,
    numEvents: Int = 10000,
    numUrls: Int = 1000,
    numDomains: Int = 20,
    /** probability mass of the single hottest domain (skew driver) */
    hotDomainWeight: Double = 0.5,
    deleteRatio: Double = 0.08,
    duplicateRatio: Double = 0.05,
    /** fraction of events whose warc_ts is drawn far in the past (late data) */
    lateRatio: Double = 0.05,
    eventsPerSegment: Int = 1000,
    /** event index at which records switch to schema v2 (-1 = never) */
    evolveAtEvent: Int = -1) {
  require(numEvents > 0 && numUrls > 0 && eventsPerSegment > 0)
}

object FeedGen {

  val BaseEpochMillis: Long = 1577836800000L // 2020-01-01T00:00:00Z — fixed, deterministic

  private val Langs = Array("en", "de", "fr", "es", "zh", "ru", "pt", "ja")

  /** cheap deterministic 128-bit-ish hex digest (splitmix64 x2) — md5 was
    * the feed-generation bottleneck at benchmark sizes; content only needs
    * to be deterministic, not cryptographic. */
  private def fastHex(s: String): String = {
    def mix(seed: Long): Long = {
      var z = seed + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    var h1 = 0x811c9dc5L; var h2 = 0x2545f4914f6cdd1dL
    var i = 0
    while (i < s.length) {
      h1 = mix(h1 ^ s.charAt(i).toLong)
      h2 = mix(h2 + s.charAt(i).toLong * 0x100000001b3L)
      i += 1
    }
    f"$h1%016x$h2%016x"
  }

  /** Deterministic url universe: hot domain gets a large share of urls'
    * traffic via [[pickUrl]]; url strings are ASCII (EBCDIC-safe). */
  def urlOf(spec: FeedSpec, i: Int): String = {
    val domain = i % spec.numDomains
    s"https://d$domain.example.com/page/${i / spec.numDomains}"
  }

  private def pickUrl(spec: FeedSpec, rng: Random): Int = {
    if (rng.nextDouble() < spec.hotDomainWeight) {
      // hot domain 0: urls with i % numDomains == 0
      val slot = rng.nextInt((spec.numUrls + spec.numDomains - 1) / spec.numDomains)
      math.min(slot * spec.numDomains, spec.numUrls - 1)
    } else rng.nextInt(spec.numUrls)
  }

  /** Deterministic content derivation — text/html are pure functions of
    * (url, warc_ts), which is what makes the byte-identical-text-per-version
    * invariant checkable end-to-end. Includes multi-byte UTF-8. */
  def textOf(url: String, tsMicros: Long, lang: String): String =
    s"§${fastHex(s"$url|$tsMicros")}·${lang}·len=${(tsMicros % 977).toInt}"

  def htmlOf(url: String, tsMicros: Long): Array[Byte] = {
    val h = fastHex(s"html|$url|$tsMicros")
    s"<html><body>$h</body></html>".getBytes("UTF-8")
  }

  def langOf(url: String): String = Langs(math.abs(url.hashCode) % Langs.length)

  /** Generate the full event stream, in binlog (seq) order. */
  def events(spec: FeedSpec): Iterator[ChangeEvent] = {
    val rng = new Random(spec.seed)
    val seen = new java.util.BitSet(spec.numUrls)
    var lastEvent: ChangeEvent = null
    var k = 0
    new Iterator[ChangeEvent] {
      def hasNext: Boolean = k < spec.numEvents
      def next(): ChangeEvent = {
        // occasionally re-emit the previous record verbatim (at-least-once dup)
        if (lastEvent != null && rng.nextDouble() < spec.duplicateRatio) {
          k += 1
          return lastEvent
        }
        val urlIdx = pickUrl(spec, rng)
        val url = urlOf(spec, urlIdx)
        val isDelete = seen.get(urlIdx) && rng.nextDouble() < spec.deleteRatio
        val op =
          if (isDelete) ChangeEvent.OpDelete
          else if (seen.get(urlIdx)) ChangeEvent.OpUpdate
          else { seen.set(urlIdx); ChangeEvent.OpInsert }
        // mostly-forward timestamps; a slice arrives very late (old versions)
        val tsMicros =
          if (rng.nextDouble() < spec.lateRatio)
            (BaseEpochMillis - 86400000L) * 1000L + rng.nextInt(1000000) * 1000L
          else
            BaseEpochMillis * 1000L + k.toLong * 1000000L + rng.nextInt(1000) * 1000L
        val ts = RecordCodec.microsToTimestamp(tsMicros)
        val lang = langOf(url)
        val schemaVersion =
          if (spec.evolveAtEvent >= 0 && k >= spec.evolveAtEvent) RecordCodec.SchemaV2
          else RecordCodec.SchemaV1
        val (fs, cl) =
          if (schemaVersion >= RecordCodec.SchemaV2)
            (Some(if (rng.nextDouble() < 0.9) 200 else 404),
              Some((100 + rng.nextInt(100000)).toLong))
          else (None, None)
        val ev =
          if (isDelete)
            ChangeEvent(op, k.toLong, url, ts, null, null, lang, schemaVersion, fs, cl)
          else
            ChangeEvent(op, k.toLong, url, ts,
              htmlOf(url, tsMicros), textOf(url, tsMicros, lang), lang,
              schemaVersion, fs, cl)
        lastEvent = ev
        k += 1
        ev
      }
    }
  }

  /** Write the feed as framed binary WAL segments under `dir`.
    * @return segment file paths in segment-id order */
  def writeSegments(spec: FeedSpec, dir: String): Seq[Path] = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    val out = Vector.newBuilder[Path]
    events(spec).grouped(spec.eventsPerSegment).zipWithIndex.foreach {
      case (chunk, segId) =>
        val maxSv = chunk.iterator.map(_.schemaVersion).max
        val bytes = RecordCodec.frameSegment(chunk.iterator.map(RecordCodec.encode), maxSv)
        val p = d.resolve(f"segment-$segId%06d.bin")
        Files.write(p, bytes)
        out += p
    }
    out.result()
  }

  /** Serial-replay oracle (FIXTURES.md §5): final state = per url the event
    * winning LWW on (warc_ts, seq); a winning delete removes the row. This
    * is the ground truth the distributed replay must match row-for-row. */
  def expectedState(evs: Iterator[ChangeEvent]): Map[String, ChangeEvent] = {
    val m = scala.collection.mutable.HashMap.empty[String, ChangeEvent]
    evs.foreach { e =>
      m.get(e.url) match {
        case Some(cur)
            if (cur.warcTs.getTime > e.warcTs.getTime) ||
              (cur.warcTs.getTime == e.warcTs.getTime && cur.seq >= e.seq) => ()
        case _ => m.update(e.url, e)
      }
    }
    m.filter { case (_, e) => e.op != ChangeEvent.OpDelete }.toMap
  }
}
