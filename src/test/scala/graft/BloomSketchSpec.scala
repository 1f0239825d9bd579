package graft

import scala.util.Random

import graft.ops.BloomSketch

/** Algebraic properties of the Bloom bitset aggregator: the finished
  * filter must equal a naive bitset over the same positions, be
  * independent of element order, merge shape, and duplication (OR is
  * idempotent), keep every word < 2^32 (the exact-double-probe
  * contract), and the dd_bloom_decontaminate query built on it must be
  * one-sided: a superset of the exact decontamination hits with a
  * bounded false-positive rate. */
class BloomSketchSpec extends SparkTestBase {

  private def truthWords(bits: Seq[Long], words: Int): Seq[Long] = {
    val w = new Array[Long](words)
    bits.foreach(b => w((b >>> 5).toInt) |= (1L << (b & 31)))
    w.toIndexedSeq
  }

  test("reduce/merge equal a naive bitset under random orders, merge shapes, duplication") {
    val rnd = new Random(7)
    for (trial <- 0 until 15) {
      val words = 1 << (2 + rnd.nextInt(6))
      val agg = new BloomSketch(words)
      val bits = Seq.fill(rnd.nextInt(400))(rnd.nextLong().abs % (words * 32L))
      val want = truthWords(bits, words)
      val dup = rnd.shuffle(bits.flatMap(b => Seq.fill(1 + rnd.nextInt(3))(b)))
      assert(dup.foldLeft(agg.zero)(agg.reduce).toSeq == want, s"trial $trial fold")
      val parts = rnd.shuffle(bits).grouped(1 + rnd.nextInt(9)).toSeq
      val bufs = rnd.shuffle(parts.map(_.foldLeft(agg.zero)(agg.reduce)))
      val merged = bufs.foldLeft(agg.zero)(agg.merge)
      assert(merged.toSeq == want, s"trial $trial merge shape")
      assert(merged.forall(w => w >= 0 && w < (1L << 32)), s"trial $trial word range")
    }
  }

  test("dd_bloom_decontaminate supersets the exact hits with bounded false positives") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = SparkEntry.queries("dd_decontaminate")(spark, sf).collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      val bloom = SparkEntry.queries("dd_bloom_decontaminate")(spark, sf).collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(bloom.keySet == exact.keySet, s"$sf: must cover exactly the train docs")
      val missed = exact.filter(_._2).keySet -- bloom.filter(_._2).keySet
      assert(missed.isEmpty, s"$sf: bloom must never miss an exact hit: $missed")
      val clean = exact.filterNot(_._2).keySet
      val falsePos = bloom.filter(_._2).keySet.intersect(clean)
      // m=2^17 bits / k=8 over the held-out shingles keeps the per-doc
      // false-flag rate well under this ceiling at both SFs
      assert(falsePos.size * 20 <= math.max(clean.size, 20),
        s"$sf: ${falsePos.size} false positives of ${clean.size} clean docs exceeds 5%")
    }
  }
}
