package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed left as-of join — "for every left row, the single most
  * recent right row at or before the left row's timestamp, per key".
  *
  * The reference can only answer point-in-time questions by re-running a
  * migration up to a cut and comparing end states
  * (mf_spark/validators/data_validator.py compares final tables only);
  * here it is a first-class scalable operator, so any probe set can be
  * answered against the change stream in one pass without replaying the
  * engine.
  *
  * Spark has no ASOF JOIN. The naive encodings both fail at scale:
  *
  *  - `l JOIN r ON l.key = r.key AND r.ts <= l.ts` + windowed rank:
  *    materializes EVERY (probe, earlier-event) pair before ranking —
  *    O(probes × history-per-key) shuffle rows. At 10^10 events a single
  *    hot key's history makes this a scale-killer.
  *  - per-key `collect_list` + UDF binary search: unbounded per-group
  *    state, loses whole-stage codegen.
  *
  * This implementation uses the UNION + running-`last` trick instead:
  * tag right rows side=0 carrying a payload struct, left rows side=1
  * carrying a null payload, union them, and compute
  * `last(payload, ignoreNulls = true)` over
  * `(key) ORDER BY (ts, side, tieBreak) ROWS UNBOUNDED PRECEDING..CURRENT`.
  * Every left row then holds the payload of the nearest preceding right
  * row. Cost: ONE hash shuffle of (left ∪ right) on the key plus one
  * within-partition sort — the same plan shape as the LWW dedup window,
  * linear in input, zero row inflation, hot keys handled by AQE skew
  * splitting of the sort, never a pair explosion.
  *
  * Tie semantics: a right row with ts exactly equal to a left row's ts IS
  * visible to it (as-of = "at or before"; side 0 sorts before side 1).
  * Among equal-ts right rows the greatest `tieBreak` wins (e.g. the WAL
  * sequence number, matching the engine's LWW order warc_ts DESC, seq
  * DESC).
  *
  * @param left      probe rows; ALL its columns are preserved in the output
  * @param right     event/history rows
  * @param keys      equi-join key columns (present on both sides)
  * @param leftTs    left timestamp column name
  * @param rightTs   right timestamp column name
  * @param tieBreak  right-side columns ordering equal-ts right rows
  *                  ascending (the LAST one wins)
  * @param payload   right-side columns to surface on matches
  * @param asCol     name of the output struct column holding the matched
  *                  payload (null when no right row is at or before leftTs)
  */
object AsofJoin {

  def lastBefore(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      tieBreak: Seq[String],
      payload: Seq[String],
      asCol: String = "asof"): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")

    val pay = struct(payload.map(col): _*)
    val payType = right.select(pay.as("__p")).schema("__p").dataType
    val tb = struct(tieBreak.map(col): _*)
    val tbType = right.select(tb.as("__tb")).schema("__tb").dataType
    val carry = struct(left.columns.map(col): _*)
    val carryType = left.select(carry.as("__l")).schema("__l").dataType

    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"), tb.as("__tb"),
        pay.as("__p"), lit(null).cast(carryType).as("__l")): _*)
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast(tbType).as("__tb"),
        lit(null).cast(payType).as("__p"), carry.as("__l")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    r.unionByName(l)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*"), col("__asof").as(asCol))
  }
}
