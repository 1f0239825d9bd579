package graft

import java.math.{BigDecimal => JBigDecimal}
import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.codec.{MainframeNum, RecordCodec}
import graft.model.ChangeEvent

/** Codec semantics mirror /root/reference/mf_spark/utils/encoding.py:112-276.
  * Round-trip properties + known-answer vectors. */
class CodecSpec extends AnyFunSuite with PropHelpers {

  // -- known-answer vectors (hand-computed per COBOL storage rules) --------

  test("packed decimal known vectors (encoding.py:112-161 semantics)") {
    // 12345 scale 2 → 123.45, bytes 12 34 5C
    assert(MainframeNum.decodePacked(Array(0x12, 0x34, 0x5c).map(_.toByte), 2) ==
      new JBigDecimal("123.45"))
    // negative sign nibble D
    assert(MainframeNum.decodePacked(Array(0x12, 0x34, 0x5d).map(_.toByte), 0) ==
      new JBigDecimal("-12345"))
    // F treated positive (unsigned)
    assert(MainframeNum.decodePacked(Array(0x00, 0x7f).map(_.toByte), 0) ==
      new JBigDecimal("7"))
  }

  test("zoned decimal known vectors (encoding.py:209-256 semantics)") {
    // "123" positive: F1 F2 C3
    assert(MainframeNum.decodeZoned(Array(0xf1, 0xf2, 0xc3).map(_.toByte), 0) ==
      new JBigDecimal("123"))
    // negative last zone D: F1 F2 D3 → -123
    assert(MainframeNum.decodeZoned(Array(0xf1, 0xf2, 0xd3).map(_.toByte), 0) ==
      new JBigDecimal("-123"))
    // unsigned F zone in last byte
    assert(MainframeNum.decodeZoned(Array(0xf9, 0xf9).map(_.toByte), 1) ==
      new JBigDecimal("9.9"))
  }

  test("binary int known vectors (encoding.py:258-276 semantics)") {
    assert(MainframeNum.decodeBinaryLong(Array(0x00, 0x01).map(_.toByte)) == 1L)
    assert(MainframeNum.decodeBinaryLong(Array(0xff, 0xff).map(_.toByte)) == -1L)
    assert(MainframeNum.decodeBinaryLong(Array(0x80, 0x00).map(_.toByte)) == -32768L)
    assert(MainframeNum.decodeBinaryLong(
      Array(0x00, 0x00, 0x30, 0x39).map(_.toByte)) == 12345L)
  }

  test("EBCDIC cp037 round-trip (encoding.py:19-40; JVM charset IBM037)") {
    val s = "https://d0.example.com/page/42?a=B&c=9"
    assert(MainframeNum.ebcdicToString(MainframeNum.stringToEbcdic(s)) == s)
    // known byte check: 'A' = 0xC1 in cp037
    assert(MainframeNum.stringToEbcdic("A")(0) == 0xc1.toByte)
    assert(MainframeNum.stringToEbcdic("0")(0) == 0xf0.toByte)
  }

  // -- round-trip properties ----------------------------------------------

  test("packed decimal encode/decode round-trip") {
    forAllG2(Gen.chooseNum(-99999999999L, 99999999999L), Gen.chooseNum(0, 4)) {
      (v: Long, scale: Int) =>
        val bd = JBigDecimal.valueOf(v, scale)
        val enc = MainframeNum.encodePacked(bd, 11)
        assert(enc.length == MainframeNum.packedStorageBytes(11))
        assert(MainframeNum.decodePacked(enc, scale).compareTo(bd) == 0)
    }
  }

  test("zoned decimal encode/decode round-trip") {
    forAllG2(Gen.chooseNum(-999999L, 999999L), Gen.chooseNum(0, 3)) {
      (v: Long, scale: Int) =>
        val bd = JBigDecimal.valueOf(v, scale)
        val enc = MainframeNum.encodeZoned(bd, 7)
        assert(enc.length == 7)
        assert(MainframeNum.decodeZoned(enc, scale).compareTo(bd) == 0)
    }
  }

  test("binary encode/decode round-trip at widths 2/4/8") {
    forAllG(Gen.chooseNum(Long.MinValue, Long.MaxValue)) { (v: Long) =>
      assert(MainframeNum.decodeBinaryLong(MainframeNum.encodeBinary(v, 8)) == v)
      val s = v.toShort
      assert(MainframeNum.decodeBinaryLong(MainframeNum.encodeBinary(s.toLong, 2)) == s.toLong)
      val i = v.toInt
      assert(MainframeNum.decodeBinaryLong(MainframeNum.encodeBinary(i.toLong, 4)) == i.toLong)
    }
  }

  // -- record codec ---------------------------------------------------------

  private val genEvent: Gen[ChangeEvent] = for {
    op <- Gen.oneOf("I", "U", "D")
    seq <- Gen.chooseNum(0L, Long.MaxValue / 2)
    urlN <- Gen.chooseNum(0, 5000)
    tsMillis <- Gen.chooseNum(0L, 4102444800000L) // ≤ 2100
    micros <- Gen.chooseNum(0, 999)
    lang <- Gen.oneOf("en", "de", "zh", "")
    sv <- Gen.oneOf(1, 2)
    textOpt <- Gen.option(Gen.asciiPrintableStr.map(_ + "§·漢字"))
    htmlOpt <- Gen.option(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    fs <- Gen.chooseNum(0, 999)
    cl <- Gen.chooseNum(0L, 99999999999L)
  } yield {
    val ts = RecordCodec.microsToTimestamp(tsMillis * 1000L + micros)
    val (fso, clo) = if (sv >= 2) (Some(fs), Some(cl)) else (None, None)
    val del = op == "D"
    ChangeEvent(op, seq, s"https://d${urlN % 7}.example.com/p/$urlN", ts,
      if (del) null else htmlOpt.orNull,
      if (del) null else textOpt.orNull,
      lang, sv, fso, clo)
  }

  test("ChangeEvent binary record round-trip (header + EBCDIC + zoned + packed)") {
    forAllG(genEvent) { e =>
      val d = RecordCodec.decode(RecordCodec.encode(e))
      assert(d.op == e.op)
      assert(d.seq == e.seq)
      assert(d.url == e.url)
      assert(d.warcTs == e.warcTs)
      assert(d.lang == e.lang.trim)
      assert(d.schemaVersion == e.schemaVersion)
      assert(Option(d.text) == Option(e.text), "text must round-trip byte-identically")
      if (e.text != null)
        assert(java.util.Arrays.equals(d.text.getBytes("UTF-8"), e.text.getBytes("UTF-8")))
      assert((d.html == null) == (e.html == null))
      if (e.html != null) assert(java.util.Arrays.equals(d.html, e.html))
      assert(d.fetch_status == e.fetch_status)
      assert(d.content_len == e.content_len)
    }
  }

  test("segment framing round-trips a stream of records") {
    val evs = (0 until 100).map { i =>
      ChangeEvent("U", i.toLong, s"https://x.example.com/$i",
        new Timestamp(1577836800000L + i), Array[Byte](1, 2, 3), s"t$i", "en", 1, None, None)
    }
    val seg = RecordCodec.frameSegment(evs.iterator.map(RecordCodec.encode))
    val back = RecordCodec.decodeSegment(seg).toSeq
    assert(back.map(_.seq) == evs.map(_.seq))
    assert(back.map(_.url) == evs.map(_.url))
    assert(back.map(_.text) == evs.map(_.text))
  }

  test("segmentOffsets fails fast on a corrupt length prefix instead of spinning") {
    val evs = (0 until 3).map { i =>
      ChangeEvent("U", i.toLong, s"https://x.example.com/$i",
        new Timestamp(1577836800000L + i), Array[Byte](1, 2, 3), s"t$i", "en", 1, None, None)
    }
    val seg = RecordCodec.frameSegment(evs.iterator.map(RecordCodec.encode))
    // find the second frame's length-prefix offset by walking the clean
    // segment, then corrupt it two ways
    val offs = RecordCodec.segmentOffsets(seg).toSeq
    val lenPos = offs(1)._1 - 4
    def corrupt(v: Int): Array[Byte] = {
      val c = seg.clone()
      c(lenPos) = (v >> 24).toByte; c(lenPos + 1) = (v >> 16).toByte
      c(lenPos + 2) = (v >> 8).toByte; c(lenPos + 3) = v.toByte
      c
    }
    // negative length: the old walker repositioned BACKWARDS and spun
    // forever; now it must throw
    intercept[RecordCodec.CorruptRecordException] {
      RecordCodec.segmentOffsets(corrupt(-4)).toSeq
    }
    // past-the-end length must throw, not read garbage offsets
    intercept[RecordCodec.CorruptRecordException] {
      RecordCodec.segmentOffsets(corrupt(seg.length)).toSeq
    }
    // near-Int.MaxValue length: an addition-form bound (off + len + crc)
    // would overflow negative and slip past the guard into
    // buf.position(negative) — must be the TYPED corruption error
    intercept[RecordCodec.CorruptRecordException] {
      RecordCodec.segmentOffsets(corrupt(Int.MaxValue - 8)).toSeq
    }
    // and the clean walk still yields every frame
    assert(offs.length == 3)
  }

  test("encode rejects v2 records whose null fields the wire format cannot represent") {
    val ok = ChangeEvent("U", 1L, "https://x.example.com/1",
      new Timestamp(1577836800000L), Array[Byte](1), "t", "en",
      RecordCodec.SchemaV2, Some(200), Some(10L))
    assert(RecordCodec.decode(RecordCodec.encode(ok)).fetch_status == Some(200))
    intercept[IllegalArgumentException] {
      RecordCodec.encode(ok.copy(fetch_status = None))
    }
    intercept[IllegalArgumentException] {
      RecordCodec.encode(ok.copy(content_len = None))
    }
  }

  test("verifySegment: clean framing passes, each damage class pinpoints its offset") {
    val evs = (0 until 50).map { i =>
      ChangeEvent("U", i.toLong, s"https://x.example.com/$i",
        new Timestamp(1577836800000L + i), Array[Byte](1, 2, 3), s"t$i", "en", 1, None, None)
    }
    val seg = RecordCodec.frameSegment(evs.iterator.map(RecordCodec.encode))
    assert(RecordCodec.verifySegment(seg) == Right(50L))
    assert(RecordCodec.verifySegment(seg, deep = true) == Right(50L))

    // truncated tail: the last frame's length overruns what's left
    val truncated = seg.take(seg.length - 5)
    assert(RecordCodec.verifySegment(truncated).isLeft)

    // corrupt frame length mid-file: verify names the length prefix offset
    val frames = RecordCodec.segmentOffsets(seg).toSeq
    val (off10, _) = frames(10)
    val badLen = seg.clone()
    badLen(off10 - 4) = 0x7f.toByte // frame 10's int32 length prefix → huge
    RecordCodec.verifySegment(badLen) match {
      case Left((at, msg)) =>
        assert(at == (off10 - 4).toLong, s"wrong offset $at for corrupt length")
        assert(msg.contains("corrupt frame length"))
      case Right(n) => fail(s"corrupt length passed with $n records")
    }

    // bad magic and bad version
    val badMagic = seg.clone(); badMagic(0) = 'X'.toByte
    assert(RecordCodec.verifySegment(badMagic) == Left((0L, "bad segment magic")))

    // content damage inside a v3 record: the per-record CRC catches ANY
    // byte flip in SHALLOW mode — including free-text damage no decode
    // validation could ever see
    val badContent = seg.clone()
    val (off20, len20) = frames(20)
    badContent(off20 + len20 / 2) = (badContent(off20 + len20 / 2) ^ 0x40).toByte
    RecordCodec.verifySegment(badContent) match {
      case Left((at, msg)) =>
        assert(at == off20.toLong)
        assert(msg.contains("CRC mismatch"))
      case Right(n) => fail(s"CRC missed content damage, $n records")
    }
    // ...and readSegment (the ingest full-record path) fail-fasts on it
    intercept[RecordCodec.CorruptRecordException] {
      RecordCodec.readSegment(badContent).foreach(_ => ())
    }

    // legacy format 2 (no CRC): framing-only verify is blind to content
    // damage; --deep still catches codec-visible classes
    val seg2 = RecordCodec.frameSegment(
      evs.iterator.map(RecordCodec.encode), withCrc = false)
    assert(RecordCodec.verifySegment(seg2) == Right(50L))
    val frames2 = RecordCodec.segmentOffsets(seg2).toSeq
    val bad2 = seg2.clone()
    bad2(frames2(20)._1) = 99.toByte // schema-version tag of record 20
    assert(RecordCodec.verifySegment(bad2) == Right(50L),
      "framing-only verify must not see content damage in a CRC-less segment")
    RecordCodec.verifySegment(bad2, deep = true) match {
      case Left((at, msg)) =>
        assert(at == frames2(20)._1.toLong)
        assert(msg.contains("decode failed"))
      case Right(n) => fail(s"deep verify missed content damage, $n records")
    }
  }

  test("truncationPoint: ends at the last fully-valid frame for every damage class") {
    val evs = (0 until 30).map { i =>
      ChangeEvent("U", i.toLong, s"https://z.example.com/$i",
        new Timestamp(1577836800000L + i), Array[Byte](7), s"tt$i", "en", 1, None, None)
    }
    val seg = RecordCodec.frameSegment(evs.iterator.map(RecordCodec.encode))
    assert(RecordCodec.truncationPoint(seg).isEmpty, "clean segment needs no repair")
    val frames = RecordCodec.segmentOffsets(seg).toSeq
    def endOf(i: Int): Int = frames(i)._1 + frames(i)._2 + 4 // crc
    // torn mid-record: cut inside the last record
    val torn = seg.take(seg.length - 3)
    assert(RecordCodec.truncationPoint(torn) == Some(endOf(28)))
    assert(RecordCodec.verifySegment(torn.take(endOf(28))) == Right(29L))
    // CRC-damaged record 29 (content flip): keep through record 28
    val rot = seg.clone(); rot(frames(29)._1 + 2) = (rot(frames(29)._1 + 2) ^ 1).toByte
    assert(RecordCodec.truncationPoint(rot) == Some(endOf(28)))
    // corrupt length prefix of record 29: same cut
    val badLen = seg.clone(); badLen(frames(29)._1 - 4) = 0x7f.toByte
    assert(RecordCodec.truncationPoint(badLen) == Some(endOf(28)))
    // damage in record 0: only the header survives — no useful prefix
    val first = seg.clone(); first(frames(0)._1) = (first(frames(0)._1) ^ 1).toByte
    assert(RecordCodec.truncationPoint(first) == Some(RecordCodec.SegmentHeaderLen))
    // length prefix corrupted to Int.MaxValue: len + crcLen overflows Int —
    // both walkers must report/truncate, never throw
    val huge = seg.clone()
    val lp = frames(29)._1 - 4
    huge(lp) = 0x7f.toByte; huge(lp + 1) = 0xff.toByte
    huge(lp + 2) = 0xff.toByte; huge(lp + 3) = 0xff.toByte
    assert(RecordCodec.truncationPoint(huge) == Some(endOf(28)))
    RecordCodec.verifySegment(huge) match {
      case Left((at, msg)) =>
        assert(at == lp.toLong && msg.contains("corrupt frame length"))
      case Right(n) => fail(s"overflowing frame length passed with $n records")
    }
  }

  test("planTailRepair: clean keeps all, torn tail truncates, headless damage refuses") {
    val evs = (0 until 30).map { i =>
      ChangeEvent("U", i.toLong, s"https://z.example.com/$i",
        new Timestamp(1577836800000L + i), Array[Byte](7), s"tt$i", "en", 1, None, None)
    }
    val seg = RecordCodec.frameSegment(evs.iterator.map(RecordCodec.encode))
    assert(RecordCodec.planTailRepair(seg) == Right((seg.length, 30L)),
      "clean segment plans to its own length")
    val frames = RecordCodec.segmentOffsets(seg).toSeq
    def endOf(i: Int): Int = frames(i)._1 + frames(i)._2 + 4 // crc
    // torn mid-record: plan = cut at end of last valid frame, 29 kept
    assert(RecordCodec.planTailRepair(seg.take(seg.length - 3)) ==
      Right((endOf(28), 29L)))
    // damage in record 0: nothing but the header survives — refuse
    val first = seg.clone(); first(frames(0)._1) = (first(frames(0)._1) ^ 1).toByte
    RecordCodec.planTailRepair(first) match {
      case Left((_, msg)) => assert(msg.contains("re-fetch"))
      case Right(p) => fail(s"headless damage must not be repairable, got $p")
    }
  }

  test("format interop: v2 and v3 segments decode identically; offsets agree") {
    val evs = (0 until 40).map { i =>
      ChangeEvent("U", i.toLong, s"https://y.example.com/$i",
        new Timestamp(1577836800000L + i), Array[Byte](9, 8), s"body $i", "en", 1, None, None)
    }
    val v2 = RecordCodec.frameSegment(evs.iterator.map(RecordCodec.encode), withCrc = false)
    val v3 = RecordCodec.frameSegment(evs.iterator.map(RecordCodec.encode))
    assert(!RecordCodec.segmentHasCrc(v2) && RecordCodec.segmentHasCrc(v3))
    assert(RecordCodec.segmentSchemaHint(v2.take(9)) == RecordCodec.segmentSchemaHint(v3.take(9)))
    val d2 = RecordCodec.decodeSegment(v2).toSeq
    val d3 = RecordCodec.decodeSegment(v3).toSeq
    assert(d2.map(_.seq) == d3.map(_.seq) && d2.map(_.text) == d3.map(_.text))
    // the zero-copy walker sees the same (record, length) stream in both
    val o2 = RecordCodec.segmentOffsets(v2).map(_._2).toSeq
    val o3 = RecordCodec.segmentOffsets(v3).map(_._2).toSeq
    assert(o2 == o3, "frame lengths diverge between formats")
    assert(RecordCodec.segmentOffsets(v3).size == 40)
  }
}
