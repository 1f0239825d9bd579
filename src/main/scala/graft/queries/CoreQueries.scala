package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core relational operator corpus over the driver testdata (SURVEY.md §2).
  * Every query has a DuckDB-equivalent oracle in [[CoreQueries.oracles]].
  *
  * Determinism rules for oracle parity (driver hashes values):
  *  - SUM over doubles is order-dependent → sum in DECIMAL (exact), cast the
  *    final result to double: identical bits in Spark and DuckDB;
  *  - row-level double arithmetic is written with identical operation order
  *    on both sides (IEEE-deterministic), and never rounded (Spark's
  *    round() works on the shortest decimal repr, DuckDB's on the binary
  *    value — they disagree near ties);
  *  - all computed columns aliased identically on both sides.
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** sum in exact decimal, emit double — see determinism rules above. */
  private def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  private val ts19950101 = Timestamp.valueOf("1995-01-01 00:00:00")
  private val ts19960101 = Timestamp.valueOf("1996-01-01 00:00:00")
  private val ts19970101 = Timestamp.valueOf("1997-01-01 00:00:00")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A4: grouped aggregation, TPC-H Q1 style pricing summary
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit(ts19970101))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // P-filter/projection with parquet pushdown (SURVEY §4: PushedFilters)
    "q02_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit(ts19960101) &&
          col("l_shipdate") < lit(ts19970101) && col("l_discount") > lit(0.05))
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"))
    }),

    // J-equi join with broadcast dimension (customer is small → broadcast)
    "q03_join_broadcast" -> ((s, dir) => {
      t(s, dir, "orders").join(
          broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
    }),

    // multi-way join: lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region
    "q04_multi_join_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .filter(col("o_orderdate") >= lit(ts19950101))
        .groupBy(col("r_name"), col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
    }),

    // J1: full-outer-join dataset diff classification (data_validator.py:292-337)
    "q05_full_outer_diff" -> ((s, dir) => {
      val c = t(s, dir, "customer").select(col("c_custkey").as("k"))
      val o = t(s, dir, "orders").select(col("o_custkey").as("k")).distinct()
      c.as("c").join(o.as("o"), col("c.k") === col("o.k"), "full_outer")
        .select(
          when(col("c.k").isNull, lit("right_only"))
            .when(col("o.k").isNull, lit("left_only"))
            .otherwise(lit("both")).as("status"))
        .groupBy(col("status")).agg(count(lit(1)).as("n"))
    }),

    // J2: left-anti orphan FK check (docs/DESIGN.md:199-208)
    "q06_left_anti_orphans" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("orphans"))
    }),

    // left-semi join (EXISTS)
    "q07_semi_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_active"))
    }),

    // W1: LWW winner per key via window row_number (north rule dedup shape)
    "q08_window_lww" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("value").as("last_value"))
    }),

    // same result as q08 via the engine's two-phase SALTED max_by dedup —
    // proves the salted path is semantically identical (same oracle SQL)
    "q09_salted_lww" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val payload = struct(col("ts"), col("event_id"), col("value"))
      val phase1 = ev
        .withColumn("_salt", pmod(col("event_id"), lit(8)))
        .groupBy(col("user_id"), col("_salt"))
        .agg(max_by(payload, struct(col("ts"), col("event_id"))).as("w"))
      phase1.groupBy(col("user_id"))
        .agg(max_by(col("w"), struct(col("w.ts"), col("w.event_id"))).as("w"))
        .select(col("user_id"), col("w.event_id").as("last_event_id"),
          col("w.value").as("last_value"))
    }),

    // running aggregation window (exact decimal accumulation)
    "q10_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          sum(col("value").cast(DecimalType(18, 6))).over(w)
            .cast("double").as("running_value"))
    }),

    // top-k with deterministic tie-break
    "q11_topk_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))
    }),

    // per-group stats: count / exact distinct / min / max / exact-sum avg
    "q12_agg_stats" -> ((s, dir) => {
      val e = t(s, dir, "events")
      e.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        (dsum(col("value"), 6) / count(lit(1))).as("avg_value"))
    }),

    // A2: single-pass per-column null/blank profile (vs the reference's
    // O(columns) filter-count jobs, data_validator.py:218-246)
    "q13_null_profile" -> ((s, dir) => {
      val e = t(s, dir, "events")
      def nulls(c: String) =
        sum(when(col(c).isNull || col(c).cast("string") === lit(""), 1L)
          .otherwise(0L)).as(s"${c}_nulls")
      e.agg(count(lit(1)).as("n_rows"), nulls("user_id"), nulls("event_type"),
        nulls("value"), nulls("props"))
    }),

    // A3-intent: order-independent table fingerprint (exact aggregates)
    "q14_fingerprint" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      d.agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("text")).as("n_distinct_text"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"),
        countDistinct(col("lang")).as("n_langs"))
    }),

    // P1/P2: rename-lowercase + trim normalizers
    "q15_rename_trim" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      c.select(
        col("c_custkey").as("custkey"),
        trim(col("c_name")).as("name"),
        lower(col("c_mktsegment")).as("mktsegment"))
    }),

    // P10: schema-driven casts (type_mapper.py analog in projection form)
    "q16_cast_types" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey").cast("string").as("orderkey_str"),
          col("l_quantity").cast("int").as("qty_int"),
          col("l_extendedprice").cast(DecimalType(18, 2)).cast("string").as("price_dec"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day"))
        .groupBy(col("ship_day"))
        .agg(count(lit(1)).as("n"), max(col("qty_int")).as("max_qty"))
    }),

    // §2.8: unionByName with missing columns = the schema-evolution primitive
    "q17_union_evolution" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val v1 = o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
      val v2 = o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"),
          col("o_orderpriority").as("priority"))
      v1.unionByName(v2, allowMissingColumns = true)
        .groupBy(col("priority")).agg(count(lit(1)).as("n"), dsum(col("price")).as("total"))
    }),

    // set difference
    "q18_set_except" -> ((s, dir) => {
      val active = t(s, dir, "orders").select(col("o_custkey").as("custkey")).distinct()
      val negative = t(s, dir, "customer").filter(col("c_acctbal") < 0)
        .select(col("c_custkey").as("custkey"))
      active.except(negative)
    }),

    // array explode: token frequencies (split + explode; SURVEY §2.9 array)
    "q19_token_explode" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .filter(col("n") >= 10)
    }),

    // json scalar extraction from props
    "q20_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
    }),

    // hierarchical aggregation (ROLLUP + grouping_id): per (status,
    // priority), per status subtotals, and the grand total in ONE pass —
    // Spark expands the grouping sets before the shuffle, so this stays a
    // single partial-aggregated exchange, not three scans. gid
    // disambiguates a real NULL group key from a rolled-up level.
    "q21_rollup" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast("double").as("revenue"))
        .select(col("o_orderstatus"), col("o_orderpriority"),
          col("gid"), col("n_orders"), col("revenue"))
    }),

    // pivot (long → wide): per-source doc counts fanned out to one column
    // per language, as ONE groupBy of conditional aggregates over a fixed
    // domain — one partial-aggregated exchange (PlanSpec-pinned). Written
    // this way deliberately: `DataFrame.pivot`, even with its value list
    // fixed, plans TWO aggregation phases (inner (source,lang) count, then
    // a pivotfirst re-aggregation = a second shuffle); the conditional-
    // aggregate form halves that, which is the shape a 100-TB pivot needs.
    "q22_pivot" -> ((s, dir) => {
      val langs = Seq("de", "en", "es", "fr", "zh")
      val aggs = langs.map(l =>
        sum(when(col("lang") === l, 1L).otherwise(0L)).as(l))
      t(s, dir, "documents")
        .groupBy(col("source")).agg(aggs.head, aggs.tail: _*)
    }),

    // ordered-sequence funnel: per user, first signup then first purchase
    // AT OR AFTER it; converted = within the hour. ONE shuffle: the
    // conditional min-over-window shares its user partitioning with the
    // groupBy that follows, so Spark plans a single exchange. Timestamps
    // compared/emitted as epoch MICROS longs — exact in both engines
    // (unix_micros / epoch_us), no float or truncation anywhere.
    "q23_funnel" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      t(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          // events.ts is TIMESTAMP_NTZ; cast under the UTC session resolves
          // to the same instant DuckDB's epoch_us reads from the naive value
          unix_micros(col("ts").cast("timestamp")).as("us"))
        .withColumn("su",
          min(when(col("event_type") === "signup", col("us"))).over(w))
        .where(col("su").isNotNull)
        .groupBy(col("user_id"))
        .agg(min(col("su")).as("signup_us"),
          min(when(col("event_type") === "purchase" && col("us") >= col("su"),
            col("us"))).as("purchase_us"))
        .select(col("user_id"), col("signup_us"),
          (col("purchase_us") - col("signup_us")).as("wait_us"),
          (col("purchase_us").isNotNull &&
            col("purchase_us") - col("signup_us") <= 3600000000L).as("converted"))
    }),

    // weekly cohort retention: cohort = a user's first active week (exact
    // integer week = floor(epoch_us / 7 days) — no calendar/locale
    // semantics to diverge between engines), cell (cohort, offset) =
    // distinct users active offset weeks later. The classic growth-
    // analytics triangle as two aggregations over one pass of events.
    "q24_retention" -> ((s, dir) => {
      val weeks = t(s, dir, "events")
        .select(col("user_id"),
          floor(unix_micros(col("ts").cast("timestamp")) / 604800000000L).as("wk"))
        .distinct()
      val cohort = weeks.groupBy("user_id").agg(min(col("wk")).as("cw"))
      weeks.join(cohort, Seq("user_id"))
        .groupBy(col("cw").as("cohort_week"),
          (col("wk") - col("cw")).as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }),

    // hot-key split join — the manual skew cure for fact⋈dimension joins
    // when a handful of keys dominate (hot-domain traffic): keys whose
    // frequency exceeds 1.2× the mean (exact integer cross-multiply,
    // cnt·5·nKeys > 6·total — no float threshold to diverge) take the
    // BROADCAST path (their dimension rows are by-definition few; the
    // fact side never shuffles), everything else takes the normal
    // shuffle join, and the union is semantically invisible — the oracle
    // is the PLAIN join, which is the whole point of the technique. The
    // cold path carries a merge hint so the compiled plan is the one
    // you'd deploy at 100 TB (AQE would locally broadcast the sandbox's
    // tiny dimension and hide the shape under test).
    "q25_hotkey_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val freq = ev.groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      val tot = freq.agg(sum(col("cnt")), count(lit(1))).head()
      val (total, nKeys) = (tot.getLong(0), tot.getLong(1))
      val hotKeys = freq
        .where(col("cnt") * lit(5L * nKeys) > lit(6L * total))
        .select(col("user_id")).localCheckpoint()
      val cust = t(s, dir, "customer").withColumnRenamed("c_custkey", "user_id")
      val hot = ev.join(broadcast(hotKeys), Seq("user_id"), "left_semi")
        .join(broadcast(cust.join(broadcast(hotKeys), Seq("user_id"), "left_semi")),
          Seq("user_id"))
      val cold = ev.join(broadcast(hotKeys), Seq("user_id"), "left_anti")
        .hint("merge").join(cust.hint("merge"), Seq("user_id"))
      hot.unionByName(cold)
        .groupBy(col("user_id"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
    }),

    // gaps-and-islands batch sessionization: consecutive same-user events
    // ≤24 h apart form one island; island ids are a running sum of break
    // flags over the (us, event_id) total order — the lag + conditional-
    // cumsum window pattern, all integer arithmetic. ONE exchange end to
    // end: both windows and the closing groupBy share the user_id hash
    // partitioning (the groupBy's (user_id, island) clustering is
    // satisfied by it — PlanSpec-pinned). At 100 TB this is the shape a
    // batch sessionizer must have: no self-join, no per-user collect,
    // state = one sort per partition.
    "q26_gap_islands" -> ((s, dir) => {
      val gapUs = 86400000000L // 24 h
      val wOrd = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        // null lag (first event of a user) falls to otherwise(1) — exactly
        // the oracle's CASE WHEN diff <= gap THEN 0 ELSE 1 null semantics
        .withColumn("brk",
          when(col("us") - lag(col("us"), 1).over(wOrd) <= gapUs, 0L)
            .otherwise(1L))
        .withColumn("island", sum(col("brk")).over(wRun))
        .groupBy(col("user_id"), col("island"))
        .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
          count(lit(1)).as("n_events"))
    }),

    // bucketed interval self-join — the scalable form of "events within a
    // time horizon of each event": the naive `b.us BETWEEN a.us AND
    // a.us+H` self-join plans a per-user nested loop (quadratic in the
    // hottest user); bucketing us into H-wide epochs turns it into an
    // EQUI-join on (user_id, bucket) — each anchor probes exactly its own
    // and the next bucket (a follower within (us, us+H] can live nowhere
    // else), each candidate pair is matched in exactly one bucket (the
    // target's), and the range predicate is a residual filter after the
    // hash match. Buckets via integer `div` — no float division near
    // bucket boundaries. merge-hinted so the compiled plan is the 100-TB
    // sort-merge shape (AQE would broadcast the sandbox's tiny side).
    // The oracle is the PLAIN inequality join — the bucketing must be
    // semantically invisible, which is exactly what this checks.
    "q27_range_self_join" -> ((s, dir) => {
      val h = 3600000000L // 1 h horizon
      val e = t(s, dir, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
      val probes = e.select(col("event_id"), col("user_id"), col("us"),
        explode(array(expr(s"us div $h"), expr(s"us div $h") + 1)).as("bk"))
      val targets = e.select(col("user_id").as("t_user"),
        col("us").as("t_us"), expr(s"us div $h").as("bk"))
      probes.hint("merge")
        .join(targets.hint("merge"),
          probes("user_id") === targets("t_user") &&
            probes("bk") === targets("bk") &&
            col("t_us") > col("us") && col("t_us") <= col("us") + h)
        .groupBy(col("event_id")).agg(count(lit(1)).as("n_follow"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        | COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1997-01-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        | l_extendedprice * (1.0 - l_discount) AS net_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01' AND l_discount > 0.05""".stripMargin,
    "q03_join_broadcast" ->
      """SELECT c_mktsegment,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q04_multi_join_agg" ->
      """SELECT r_name, n_name,
        | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |GROUP BY r_name, n_name""".stripMargin,
    "q05_full_outer_diff" ->
      """WITH c AS (SELECT c_custkey AS k FROM customer),
        |     o AS (SELECT DISTINCT o_custkey AS k FROM orders)
        |SELECT CASE WHEN c.k IS NULL THEN 'right_only'
        |            WHEN o.k IS NULL THEN 'left_only'
        |            ELSE 'both' END AS status, COUNT(*) AS n
        |FROM c FULL OUTER JOIN o ON c.k = o.k GROUP BY 1""".stripMargin,
    "q06_left_anti_orphans" ->
      """SELECT COUNT(*) AS orphans FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)""".stripMargin,
    "q07_semi_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n_active FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment""".stripMargin,
    "q08_window_lww" ->
      """SELECT user_id, event_id AS last_event_id, value AS last_value FROM (
        | SELECT user_id, event_id, value,
        |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) WHERE rn = 1""".stripMargin,
    "q09_salted_lww" ->
      """SELECT user_id, event_id AS last_event_id, value AS last_value FROM (
        | SELECT user_id, event_id, value,
        |  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) WHERE rn = 1""".stripMargin,
    "q10_window_running" ->
      """SELECT event_id, user_id,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
        |   PARTITION BY user_id ORDER BY ts, event_id
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events""".stripMargin,
    "q11_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q12_agg_stats" ->
      """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
        | MIN(value) AS min_value, MAX(value) AS max_value,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_value
        |FROM events GROUP BY event_type""".stripMargin,
    "q13_null_profile" ->
      """SELECT COUNT(*) AS n_rows,
        | CAST(SUM(CASE WHEN user_id IS NULL OR CAST(user_id AS VARCHAR) = '' THEN 1 ELSE 0 END) AS BIGINT) AS user_id_nulls,
        | CAST(SUM(CASE WHEN event_type IS NULL OR CAST(event_type AS VARCHAR) = '' THEN 1 ELSE 0 END) AS BIGINT) AS event_type_nulls,
        | CAST(SUM(CASE WHEN value IS NULL OR CAST(value AS VARCHAR) = '' THEN 1 ELSE 0 END) AS BIGINT) AS value_nulls,
        | CAST(SUM(CASE WHEN props IS NULL OR CAST(props AS VARCHAR) = '' THEN 1 ELSE 0 END) AS BIGINT) AS props_nulls
        |FROM events""".stripMargin,
    "q14_fingerprint" ->
      """SELECT COUNT(*) AS n_rows, COUNT(DISTINCT text) AS n_distinct_text,
        | CAST(SUM(n_chars) AS BIGINT) AS sum_chars, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
        | COUNT(DISTINCT lang) AS n_langs
        |FROM documents""".stripMargin,
    "q15_rename_trim" ->
      """SELECT c_custkey AS custkey, TRIM(c_name) AS name,
        | LOWER(c_mktsegment) AS mktsegment FROM customer""".stripMargin,
    "q16_cast_types" ->
      """SELECT strftime(l_shipdate, '%Y-%m-%d') AS ship_day, COUNT(*) AS n,
        | MAX(CAST(l_quantity AS INT)) AS max_qty
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q17_union_evolution" ->
      """WITH u AS (
        | SELECT o_orderkey AS k, o_totalprice AS price, NULL AS priority
        | FROM orders WHERE o_orderkey % 2 = 0
        | UNION ALL
        | SELECT o_orderkey AS k, o_totalprice AS price, o_orderpriority AS priority
        | FROM orders WHERE o_orderkey % 2 = 1)
        |SELECT priority, COUNT(*) AS n,
        | CAST(SUM(CAST(price AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM u GROUP BY priority""".stripMargin,
    "q18_set_except" ->
      """SELECT DISTINCT o_custkey AS custkey FROM orders
        |EXCEPT
        |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0""".stripMargin,
    "q19_token_explode" ->
      """SELECT token, COUNT(*) AS n FROM (
        | SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token HAVING COUNT(*) >= 10""".stripMargin,
    "q20_json_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
        |FROM events GROUP BY k""".stripMargin,
    // GROUPING(a, b) bit order (a = MSB) matches Spark's grouping_id()
    "q21_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
        | COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "q22_pivot" ->
      """SELECT source,
        | COUNT(*) FILTER (lang = 'de') AS de,
        | COUNT(*) FILTER (lang = 'en') AS en,
        | COUNT(*) FILTER (lang = 'es') AS es,
        | COUNT(*) FILTER (lang = 'fr') AS fr,
        | COUNT(*) FILTER (lang = 'zh') AS zh
        |FROM documents GROUP BY source""".stripMargin,
    "q23_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |su AS (SELECT user_id, MIN(us) AS signup_us FROM e
        |       WHERE event_type = 'signup' GROUP BY 1),
        |pu AS (SELECT e.user_id, MIN(e.us) AS purchase_us
        |       FROM e JOIN su USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.us >= su.signup_us
        |       GROUP BY 1)
        |SELECT su.user_id, su.signup_us,
        |  pu.purchase_us - su.signup_us AS wait_us,
        |  COALESCE(pu.purchase_us - su.signup_us <= 3600000000, FALSE) AS converted
        |FROM su LEFT JOIN pu USING (user_id)""".stripMargin,
    "q24_retention" ->
      """WITH weeks AS (SELECT DISTINCT user_id,
        |    CAST(FLOOR(epoch_us(ts) / 604800000000) AS BIGINT) AS wk FROM events),
        |cohort AS (SELECT user_id, MIN(wk) AS cw FROM weeks GROUP BY 1)
        |SELECT cw AS cohort_week, wk - cw AS week_offset,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM weeks JOIN cohort USING (user_id) GROUP BY 1, 2""".stripMargin,
    // the oracle is the PLAIN join — the hot/cold split must be
    // semantically invisible, which is exactly what this checks
    "q25_hotkey_join" ->
      """SELECT user_id, c_mktsegment, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2""".stripMargin,
    "q26_gap_islands" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |x AS (SELECT user_id, event_id, us,
        |    CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |              <= 86400000000 THEN 0 ELSE 1 END AS brk
        |  FROM e),
        |y AS (SELECT user_id, us,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM x)
        |SELECT user_id, CAST(island AS BIGINT) AS island,
        |  MIN(us) AS start_us, MAX(us) AS end_us,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM y GROUP BY 1, 2""".stripMargin,
    // the oracle is the PLAIN inequality join — the bucket decomposition
    // must be semantically invisible, which is exactly what this checks
    "q27_range_self_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events)
        |SELECT a.event_id, CAST(COUNT(*) AS BIGINT) AS n_follow
        |FROM e a JOIN e b ON a.user_id = b.user_id
        |  AND b.us > a.us AND b.us <= a.us + 3600000000
        |GROUP BY 1""".stripMargin
  )
}
