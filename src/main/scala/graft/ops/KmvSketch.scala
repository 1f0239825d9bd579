package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** K-minimum-values (KMV / bottom-k) sketch as a typed [[Aggregator]] —
  * the mergeable bounded-state sketch that adds SET expressiveness the
  * HLL register vector cannot provide: because the state is the k
  * smallest DISTINCT hash values of the input set, two groups' sketches
  * can be combined into union, intersection, and Jaccard estimates
  * (Bar-Yossef et al. 2002; the Theta-sketch family's core idea), which
  * is what cross-slice overlap questions ("how much does lang A's shingle
  * set overlap lang B's?") need at 100 TB.
  *
  * Scale contract, same as the HLL/Bloom/CMS siblings: partial state is
  * at most k longs per group per task no matter how many rows stream
  * through, map-side combine ships ONE partial row per (group, task), and
  * merge is a sorted-merge + truncate. The sketch is a DETERMINISTIC
  * function of the input SET — independent of row order, partitioning,
  * merge shape, and duplication — so unlike randomized quantile sketches
  * it is hash-comparable across engines: DuckDB reproduces it exactly as
  * the k smallest distinct hashes per group (`row_number() OVER (ORDER BY
  * h) <= k`). All comparisons are on non-negative 60-bit md5-prefix
  * hashes (the corpus-wide cross-engine hash primitive).
  *
  * State invariant: a strictly increasing (therefore distinct) Array[Long]
  * of size ≤ k. Inserts are O(k) array copies — k is small (hundreds) and
  * a saturated sketch rejects almost every row with one binary search.
  */
final class KmvSketch(k: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(k >= 1, s"k must be positive, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    if (b.length == k && h >= b(b.length - 1)) return b
    val pos = java.util.Arrays.binarySearch(b, h)
    if (pos >= 0) return b // already present
    val ins = -pos - 1
    val outLen = math.min(b.length + 1, k)
    val out = new Array[Long](outLen)
    System.arraycopy(b, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(b, ins, out, ins + 1, outLen - ins - 1)
    out
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    if (x.isEmpty) return y
    if (y.isEmpty) return x
    val out = new Array[Long](math.min(x.length + y.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < x.length || j < y.length)) {
      val v =
        if (j >= y.length || (i < x.length && x(i) <= y(j))) { val v = x(i); i += 1; v }
        else { val v = y(j); j += 1; v }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toIndexedSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object KmvSketch {
  /** Hash domain: 60-bit md5-prefix hashes live in [0, 2^60). */
  val HashDomain: Double = math.pow(2.0, 60)

  /** Distinct-cardinality estimate: exact below saturation (the sketch IS
    * the distinct set), else the standard unbiased KMV estimator
    * (k-1)/normalized-kth-minimum. Float output — spec-gate material,
    * never hash-compared (the query surface emits only integers). */
  def estimate(sketch: Seq[Long], k: Int): Double =
    if (sketch.size < k) sketch.size.toDouble
    else (k - 1).toDouble * HashDomain / sketch.last.toDouble

  /** Jaccard + intersection estimates for two sketches built with the same
    * k (Theta-sketch set operations): combine to the k smallest of the
    * union, count how many of those lie in BOTH sketches — that fraction
    * estimates J(A,B) over a uniform sample of A∪B — and scale by the
    * union-cardinality estimate for the intersection size. */
  def overlap(a: Seq[Long], b: Seq[Long], k: Int): (Double, Double) = {
    val union = (a ++ b).distinct.sorted.take(k)
    val sa = a.toSet; val sb = b.toSet
    val shared = union.count(v => sa.contains(v) && sb.contains(v))
    val j = if (union.isEmpty) 0.0 else shared.toDouble / union.size
    (j, j * estimate(union, k))
  }
}
