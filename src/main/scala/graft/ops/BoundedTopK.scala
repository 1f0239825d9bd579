package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded per-group top-k as a typed [[Aggregator]] — the 100-TB form of
  * "smallest k elements per stratum" (deterministic sampling, per-group
  * top-k). A window `row_number` must SORT every stratum's rows inside one
  * partition before it can rank them; this aggregator's partial state is
  * capped at k elements, so map-side combine ships AT MOST k rows per
  * group per task no matter how large the stratum — the same
  * partial-aggregation property that makes `max`/`sum` scale, extended to
  * a k-set. At k=30 and 1000 tasks a billion-row stratum reduces through
  * ≤30k partial rows instead of a billion-row sort partition.
  *
  * Elements are (sortKey, payload) pairs ordered by (sortKey, payload);
  * `finish` emits the k smallest, ascending. Determinism: the order is a
  * total order over distinct pairs, so the result is independent of
  * partitioning, task order, and merge shape (associativity +
  * commutativity of "keep the k smallest" under a total order).
  *
  * State is a plain sorted Array (immutable per reduce): at k ≤ a few
  * hundred an O(k) insert beats heap constant factors and keeps the
  * buffer trivially Encoder-serializable for shuffle.
  */
final class BoundedTopK(k: Int)
    extends Aggregator[(String, Long), Seq[(String, Long)], Seq[(String, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  private def lt(a: (String, Long), b: (String, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(String, Long)] = Vector.empty

  override def reduce(b: Seq[(String, Long)], a: (String, Long)): Seq[(String, Long)] = {
    // fast reject: buffer full and the new element is not smaller than max
    if (b.size >= k && !lt(a, b.last)) b
    else {
      val i = b.indexWhere(e => lt(a, e)) match { case -1 => b.size; case x => x }
      val grown = (b.take(i) :+ a) ++ b.drop(i)
      if (grown.size > k) grown.take(k) else grown
    }
  }

  override def merge(x: Seq[(String, Long)], y: Seq[(String, Long)]): Seq[(String, Long)] =
    y.foldLeft(x)(reduce)

  override def finish(r: Seq[(String, Long)]): Seq[(String, Long)] = r

  override def bufferEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()

  override def outputEncoder: Encoder[Seq[(String, Long)]] = bufferEncoder
}
