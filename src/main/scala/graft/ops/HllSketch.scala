package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog count-distinct as a typed [[Aggregator]] — the mergeable
  * bounded-state sketch that makes "how many distinct X" tractable at
  * 100 TB: partial state is a fixed 2^p-register array per group per task
  * (2 KB at p=9) no matter how many rows flow through it, map-side combine
  * ships ONE partial row per group per task, and merge is an elementwise
  * max — associative, commutative, and idempotent, so the result is
  * independent of partitioning, task order, merge shape, AND input
  * duplication (re-delivered rows change nothing, unlike a sum).
  *
  * The register contract is deterministic and engine-independent so an
  * external SQL engine can reproduce it bit-for-bit from the same hashes:
  * the input is a 60-bit non-negative hash h (the first 15 hex chars of an
  * md5, a cross-engine primitive); register = h mod 2^p; w = h >> p (a
  * (60-p)-bit value); rho = (60-p) - bitlen(w) + 1, i.e. the 1-based
  * position of the highest set bit counted from the top of the (60-p)-bit
  * window, with the all-zero w mapping to (60-p)+1. Spark's `bin()` and
  * DuckDB's `bin()` both render without leading zeros, so the SQL mirror
  * is `maxBits + 1 - length(bin(w))` with a w=0 special case.
  *
  * The query surface emits the OCCUPIED registers (register, max rho) —
  * integer-exact, hash-checkable across engines; the cardinality estimate
  * (harmonic mean + linear-counting correction, float arithmetic whose
  * ulp behavior is libm-dependent) is derived from the registers by the
  * caller and quality-gated in the spec, never hash-compared.
  */
final class HllSketch(p: Int)
    extends Aggregator[Long, Array[Int], Seq[Int]] {
  require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
  private val m = 1 << p
  private val maxBits = 60 - p

  override def zero: Array[Int] = new Array[Int](m)

  override def reduce(b: Array[Int], h: Long): Array[Int] = {
    val reg = (h & (m - 1)).toInt
    val w = h >>> p
    val bitlen = 64 - java.lang.Long.numberOfLeadingZeros(w) // 0 for w=0
    val rho = maxBits - bitlen + 1
    if (rho > b(reg)) b(reg) = rho
    b
  }

  override def merge(x: Array[Int], y: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
    x
  }

  override def finish(r: Array[Int]): Seq[Int] = r.toIndexedSeq

  override def bufferEncoder: Encoder[Array[Int]] =
    ExpressionEncoder[Array[Int]]()

  override def outputEncoder: Encoder[Seq[Int]] =
    ExpressionEncoder[Seq[Int]]()
}

object HllSketch {
  /** Cardinality estimate from a register vector (standard HLL: harmonic
    * mean with the alpha bias constant, linear counting below 2.5m when
    * empty registers remain). The harmonic sum is computed EXACTLY in
    * fixed point — sum of 2^(S-rho) as a Long with S = 60-p+1 ≥ max rho,
    * so the only float ops are two divisions and (in the small-range
    * regime) one log — spec-gate material, not hash-compare material. */
  def estimate(regs: Seq[Int], p: Int): Double = {
    val m = 1 << p
    require(regs.size == m, s"expected $m registers, got ${regs.size}")
    val s = 60 - p + 1
    val fixedSum = regs.map(r => 1L << (s - r)).sum // exact: m * 2^s < 2^63
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m * m * math.pow(2.0, s) / fixedSum.toDouble
    val zeros = regs.count(_ == 0)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }
}
