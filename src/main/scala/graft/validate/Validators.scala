package graft.validate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality validators — the reference's DataValidator capabilities
  * (/root/reference/mf_spark/validators/data_validator.py) re-expressed as
  * single-pass Spark aggregations (the reference runs one filter+count job
  * PER COLUMN, data_validator.py:218-246 — ours is one job total).
  */
object Validators {

  final case class CountCheck(expected: Long, actual: Long, tolerancePct: Double) {
    def passed: Boolean =
      if (tolerancePct <= 0) actual == expected
      else math.abs(actual - expected) <= expected * tolerancePct / 100.0
  }

  /** record-count validation (data_validator.py:131-193). */
  def validateCount(df: DataFrame, expected: Long, tolerancePct: Double = 0.0): CountCheck =
    CountCheck(expected, df.count(), tolerancePct)

  private def nullish(c: String): Column =
    col(c).isNull || (col(c).cast("string") === lit("")) ||
      (col(c).cast("string") === lit("null"))

  /** per-column null/blank profile in ONE pass (vs data_validator.py:218-246).
    * @return (rowCount, column → null count) */
  def nullProfile(df: DataFrame, columns: Seq[String] = Seq.empty): (Long, Map[String, Long]) = {
    val cols = if (columns.nonEmpty) columns else df.columns.toSeq
    val aggs = count(lit(1)).as("_rows") +:
      cols.map(c => sum(when(nullish(c), 1L).otherwise(0L)).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    (row.getLong(0), cols.zipWithIndex.map { case (c, i) => c -> row.getLong(i + 1) }.toMap)
  }

  /** columns whose null ratio exceeds the threshold (data_validator.py:207-246). */
  def nullThresholdViolations(
      df: DataFrame, thresholdPct: Double, columns: Seq[String] = Seq.empty): Map[String, Double] = {
    val (rows, nulls) = nullProfile(df, columns)
    if (rows == 0) Map.empty
    else nulls.map { case (c, n) => c -> (n * 100.0 / rows) }
      .filter(_._2 > thresholdPct)
  }

  /** required-column presence (data_validator.py:195-205). */
  def missingColumns(df: DataFrame, required: Seq[String]): Seq[String] = {
    val have = df.columns.map(_.toLowerCase).toSet
    required.filterNot(c => have.contains(c.toLowerCase))
  }

  /** Combined validation report (data_validator.py:19-96 ValidationResult
    * analog): typed errors/warnings + row count + schema metrics. */
  final case class ValidationReport(
      recordCount: Long,
      expectedCount: Option[Long],
      errors: Seq[String],
      warnings: Seq[String],
      columnNulls: Map[String, Long],
      schema: Map[String, String]) {
    def passed: Boolean = errors.isEmpty
    def summary: String = {
      val status = if (passed) "PASSED" else "FAILED"
      (Seq(s"validation $status: $recordCount rows" +
          expectedCount.map(e => s" (expected $e)").getOrElse("")) ++
        errors.map("  error: " + _) ++ warnings.map("  warning: " + _))
        .mkString("\n")
    }
  }

  /** One-call validation (data_validator.py:131-170 `validate` parity, but
    * count + all null checks run in a single Spark job): expected count,
    * required columns, non-null columns (errors), plus a null-ratio
    * warning sweep over every other column. */
  def validate(
      df: DataFrame,
      expectedCount: Option[Long] = None,
      requiredColumns: Seq[String] = Seq.empty,
      nonNullColumns: Seq[String] = Seq.empty,
      tolerancePct: Double = 0.0,
      warnNullPct: Double = 50.0): ValidationReport = {
    val errors = Seq.newBuilder[String]
    val warnings = Seq.newBuilder[String]
    val missing = missingColumns(df, requiredColumns)
    missing.foreach(c => errors += s"required column missing: $c")
    val (rows, nulls) = nullProfile(df)
    expectedCount.foreach { e =>
      val chk = CountCheck(e, rows, tolerancePct)
      if (!chk.passed) errors += s"record count $rows != expected $e" +
        (if (tolerancePct > 0) s" (±$tolerancePct%)" else "")
    }
    val have = df.columns.map(c => c.toLowerCase -> c).toMap
    nonNullColumns.flatMap(c => have.get(c.toLowerCase)).foreach { c =>
      val n = nulls.getOrElse(c, 0L)
      if (n > 0) errors += s"column $c has $n null/blank values"
    }
    if (rows > 0) nulls.foreach { case (c, n) =>
      val pct = n * 100.0 / rows
      if (pct > warnNullPct && !nonNullColumns.exists(_.equalsIgnoreCase(c)))
        warnings += f"column $c is $pct%.1f%% null"
    }
    ValidationReport(rows, expectedCount, errors.result(), warnings.result(),
      nulls, df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap)
  }

  /** Order-independent whole-table digest — the correct form of the
    * reference's md5-of-first-row checksum (data_validator.py:266-290, whose
    * intent was a table fingerprint): sum + xor of per-row xxhash64 over all
    * columns, null-tagged so (null) and ("") differ. Equal digests across a
    * replay and its oracle ⇒ same multiset of rows (up to 128-bit collision). */
  def tableDigest(df: DataFrame): (Long, String, Long) = {
    val rowHash = xxhash64(
      df.columns.map(c => coalesce(col(c).cast("string"), lit("<null>"))).toSeq: _*)
    // sum channel in exact decimal (ANSI mode forbids long overflow); xor
    // channel as an order-independent second fingerprint
    val row = df.withColumn("_h", rowHash).agg(
      count(lit(1)).as("n"),
      sum(col("_h").cast("decimal(38,0)")).as("hsum"),
      expr("bit_xor(_h)").as("hxor")).head()
    (row.getLong(0),
      if (row.isNullAt(1)) "0" else row.getDecimal(1).toBigInteger.toString,
      if (row.isNullAt(2)) 0L else row.getLong(2))
  }

  final case class DiffResult(matching: Long, leftOnly: Long, rightOnly: Long) {
    def identical: Boolean = leftOnly == 0 && rightOnly == 0
  }

  /** full-outer-join dataset diff on key columns (data_validator.py:292-337). */
  def diffByKey(left: DataFrame, right: DataFrame, keys: Seq[String]): DiffResult = {
    val l = left.select(keys.map(col): _*).distinct().withColumn("_l", lit(1))
    val r = right.select(keys.map(col): _*).distinct().withColumn("_r", lit(1))
    val j = l.join(r, keys, "full_outer")
      .agg(
        sum(when(col("_l").isNotNull && col("_r").isNotNull, 1L).otherwise(0L)),
        sum(when(col("_r").isNull, 1L).otherwise(0L)),
        sum(when(col("_l").isNull, 1L).otherwise(0L))).head()
    DiffResult(j.getLong(0), j.getLong(1), j.getLong(2))
  }

  /** row-for-row multiset equality via exceptAll both ways (our replay gate). */
  def rowsetEqual(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  /** left-anti orphan FK check (docs/DESIGN.md:199-208): rows in `child`
    * whose key has no match in `parent`. */
  def orphanCount(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): Long =
    child.join(parent, child(childKey) === parent(parentKey), "left_anti").count()
}
