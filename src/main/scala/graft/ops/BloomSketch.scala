package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bloom-filter bitset as a typed [[Aggregator]] — the mergeable
  * fixed-size membership sketch behind "have we seen this n-gram/url"
  * at 100 TB: partial state is a fixed packed bit array per task no
  * matter how many elements flow through it, map-side combine ships ONE
  * partial row per task, and merge is a bitwise OR — associative,
  * commutative, and idempotent, so the filter is independent of
  * partitioning, task order, merge shape, AND input duplication.
  *
  * The input is an already-computed BIT POSITION in [0, words*32) — the
  * caller derives the k positions per element (double hashing over a
  * 60-bit md5-prefix hash; see the dd_bloom_decontaminate query), which
  * keeps this class a pure bitset and the position arithmetic in one
  * place next to its SQL mirror.
  *
  * Bits pack 32 PER LONG WORD (not 64) on purpose: every finished word
  * is < 2^32, so the downstream membership probe can test a bit with
  * exact double arithmetic (`floor(w / 2^(bit%32)) % 2` — both the
  * division by a power of two and the floor are exact for w < 2^53),
  * which is expressible in portable Column/SQL functions on engines
  * without a shift-by-column primitive. The filter is a scalar: m/32
  * longs total (16 KB at m = 2^17), so collecting the ONE finished row
  * to the driver is O(m) bounded work regardless of element count.
  */
final class BloomSketch(words: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(words > 0, s"words must be positive, got $words")
  private val mBits = words.toLong * 32

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(b: Array[Long], bit: Long): Array[Long] = {
    require(bit >= 0 && bit < mBits, s"bit $bit out of [0,$mBits)")
    b((bit >>> 5).toInt) |= (1L << (bit & 31))
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { x(i) |= y(i); i += 1 }
    x
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
