package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch as a typed [[Aggregator]] — the mergeable fixed-size
  * FREQUENCY sketch that completes the trio next to [[HllSketch]]
  * (cardinality) and [[BloomSketch]] (membership): "roughly how often
  * does each term occur" over a stream too large to count exactly,
  * with one-sided error (estimates never undercount). Partial state is
  * a fixed d×w counter matrix per group per task regardless of input
  * size, map-side combine ships ONE row per (group, task), and merge
  * is an elementwise SUM — associative and commutative, so the sketch
  * is independent of partitioning, task order, and merge shape (NOT of
  * input duplication: counts are sums by definition, unlike the
  * idempotent HLL max / Bloom OR — re-delivered rows re-count, which
  * is the correct semantics for a frequency sketch fed exactly-once).
  *
  * Cross-engine contract (same recipe as [[BloomSketch]]): the input
  * is a 60-bit non-negative hash h (first 15 hex chars of an md5);
  * double hashing h1 = h mod 2^30 (low 30 bits), h2 = h >> 30 (high
  * 30 bits) gives row i's counter index (h1 + i·h2) mod w for
  * i = 0..d-1 — all integer arithmetic an external SQL engine
  * reproduces exactly, so the emitted (row, counter, count) cells are
  * hash-comparable across engines.
  */
final class CmsSketch(d: Int, w: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(d > 0 && w > 0, s"d and w must be positive, got d=$d w=$w")

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    val h1 = h & ((1L << 30) - 1)
    val h2 = h >>> 30
    var i = 0
    while (i < d) {
      b(i * w + ((h1 + i * h2) % w).toInt) += 1
      i += 1
    }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < d * w) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toIndexedSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object CmsSketch {
  /** Point estimate for the element hashing to h: the MINIMUM of its d
    * counters (each row overcounts by its colliders, never undercounts,
    * so the min is the tightest one-sided bound — the Cormode-
    * Muthukrishnan estimator, within εN with probability 1-δ at
    * w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉). */
  def estimate(cells: Seq[Long], d: Int, w: Int, h: Long): Long = {
    require(cells.size == d * w, s"expected ${d * w} cells, got ${cells.size}")
    val h1 = h & ((1L << 30) - 1)
    val h2 = h >>> 30
    (0 until d).map(i => cells(i * w + ((h1 + i * h2) % w).toInt)).min
  }
}
