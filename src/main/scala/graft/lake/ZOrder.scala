package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering key for multi-dimensional file pruning —
  * the Delta `OPTIMIZE ZORDER BY` / Iceberg `rewrite_data_files(sort_order
  * => zorder(...))` analog, built as pure Catalyst column expressions so
  * the compaction sort stays inside whole-stage codegen.
  *
  * Why it exists: a LINEAR cluster order `(a, b)` gives tight per-file
  * bounds on `a` but leaves `b` scattered across every file whenever `a`
  * is high-cardinality — predicates on `b` alone prune nothing. Bit
  * interleaving gives every clustered dimension ~sqrt-of-linear locality
  * simultaneously, so the manifest zone maps ([[LakeTable.filesInRange]]
  * for `warc_ts`, [[LakeTable.filesInColRange]] for everything else) have
  * teeth on ALL interleaved columns at once. At 100 TB this is the
  * difference between "time slices are cheap OR status scans are cheap"
  * and both being cheap from one layout.
  *
  * Mechanics: each column maps to an order-preserving signed-long image
  * (raw value for integrals, micros for timestamps, days for dates,
  * first-7-bytes big-endian for strings — the same UTF-8 byte order
  * `statOrder` prunes in), then to an EQUI-DEPTH bucket id in [0, 256)
  * against quantile boundaries measured on the rewrite input itself (one
  * `approxQuantile` pass over only the clustered columns — the same
  * sampling-summary machinery Delta's range-id z-ordering leans on).
  * Equi-depth matters: min-max scaling looked simpler but collapses under
  * skew — 5% of web-crawl events arrive a day late, which stretches the
  * ts range ~15x and squeezes ALL forward traffic into low bits a fixed
  * top-bit interleave never sees (measured: zero ts pruning). Quantile
  * buckets give every dimension uniform occupancy BY CONSTRUCTION, for
  * any marginal distribution. Bucket ids (8 bits/dim) interleave
  * MSB-first into one small non-negative long; the bucket lookup is a
  * balanced `when`-tree (depth 8), so per-row cost is log(Q) comparisons
  * inside codegen. 256 buckets/dim bounds the z-space at 65k cells for
  * d=2 — far above any per-bucket file count, so file boundaries, not
  * cell resolution, stay the limiting factor. Nulls map to bucket 0 and
  * cluster together at the low end (pruning stays correct: recorded
  * min/max cover only non-null values, and stat-less files are always
  * kept).
  *
  * Reference analog: the migration tool leaves physical layout to the
  * warehouse (`mf_spark/core/migrator.py` writes partition-dir output);
  * a lake that owns its files must own their clustering too.
  */
object ZOrder {

  /** Max columns: below 2 z-order degenerates to a linear sort (use
    * `clusterBy`); above 4 each dimension keeps too little locality and
    * pruning power collapses — refuse loudly rather than cluster badly. */
  val MaxCols = 4

  /** Equi-depth buckets per dimension (8 bits). */
  val Buckets = 256
  private val BitsPerDim = 8

  /** Order-preserving signed-long image of a column; signed comparison of
    * images == the column's natural (and stat-pruning) order. */
  private[graft] def image(dt: DataType, c: Column): Column = dt match {
    case ByteType | ShortType | IntegerType | LongType => c.cast(LongType)
    case TimestampType => unix_micros(c)
    case DateType      => unix_date(c).cast(LongType)
    case StringType    =>
      // first 7 bytes big-endian (56 bits, always non-negative) —
      // identical order to statOrder's unsigned UTF-8 compare; rpad AFTER
      // hex so a short string pads with zero BYTES, keeping prefix order
      // ("b" must sort after "ab", not between "a" and "ab")
      conv(rpad(hex(substring(c.cast(BinaryType), 1, 7)), 14, "0"), 16, 10)
        .cast(LongType)
    case other => throw new IllegalArgumentException(
      s"z-order needs an order-preserving long image; unsupported type " +
        s"$other (supported: integral, timestamp, date, string)")
  }

  private def imageOf(schema: StructType, name: String): Column = {
    val f = schema.fields.find(_.name == name).getOrElse(
      throw new NoSuchElementException(
        s"no column '$name' (have: ${schema.fieldNames.mkString(", ")})"))
    image(f.dataType, col(name))
  }

  /** Equi-depth bucket id of `c` against sorted `bounds` (bucket k =
    * values in [bounds(k-1), bounds(k))), as the closed form of the
    * binary search: bucket = #{m : c >= bounds(m)} — one literal-array
    * `filter` whose generated code is O(1) in the bucket count. The
    * former balanced `when`-tree emitted ~2·Q nested conditionals PER
    * DIMENSION; at Q=256 that generated class cost seconds of
    * Janino/JIT per executor before the first row (measured on the
    * z-order compact write stage: 65.7 s task time cold / 12.5 s warm
    * for 361 rows, 16 tasks — the whole cost was compiling the
    * comparator, not evaluating it). Identical bucket ids (ZOrderSpec
    * pins the exact values, nulls to bucket 0). */
  private[graft] def bucketize(c: Column, bounds: Array[Double]): Column = {
    val arr = array(bounds.map(lit(_)).toIndexedSeq: _*)
    when(c.isNull, lit(0L))
      .otherwise(size(filter(arr, b => c >= b)).cast(LongType))
  }

  /** Interleave the low `bits` bits of each scaled column MSB-first:
    * slot s = i*d+j lands at bit (bits*d - 1 - s). */
  private[graft] def interleave(scaled: Seq[Column], bits: Int): Column = {
    val d = scaled.size
    val terms = for { i <- 0 until bits; j <- 0 until d } yield
      shiftleft(shiftrightunsigned(scaled(j), bits - 1 - i).bitwiseAND(lit(1L)),
        bits * d - 1 - (i * d + j))
    terms.reduce(_ bitwiseOR _)
  }

  /** Morton key over `cols` for the rows of `df`: equi-depth-bucketizes
    * each column's image against df's own quantiles (one approxQuantile
    * job over only these columns), then interleaves the bucket bits.
    * Always non-negative and small (< 2^(8d)), so a plain ascending sort
    * orders it correctly. */
  def zvalue(df: DataFrame, schema: StructType, cols: Seq[String]): Column = {
    require(cols.size >= 2 && cols.size <= MaxCols,
      s"z-order takes 2..$MaxCols columns, got ${cols.size} " +
        "(1 column is a linear sort — use --cluster)")
    val d = cols.size
    val imgs = cols.map(n => imageOf(schema, n))
    val tmp = df.select(imgs.zipWithIndex.map { case (im, j) =>
      im.cast(DoubleType).as(s"_zimg$j") }: _*)
    val probs = (1 until Buckets).map(_.toDouble / Buckets).toArray
    val bounds = tmp.stat.approxQuantile(
      (0 until d).map(j => s"_zimg$j").toArray, probs, 0.001)
    val scaled = imgs.zip(bounds).map { case (im, b) =>
      if (b.isEmpty) lit(0L) // all-null column: constant dimension
      else bucketize(im.cast(DoubleType), b)
    }
    interleave(scaled, BitsPerDim).as(s"z(${cols.mkString(",")})")
  }
}
