package graft

import org.apache.spark.sql.functions._

/** Guards the SparkEntry corpus: every query runs and returns rows on the
  * smoke SF, plus spot value checks. DuckDB-parity is the driver's gate
  * (tools/compare_oracle.py locally). */
class QueriesSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("oracle SQL exists for every SQL-expressible query; names line up") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"oracle without query: ${os.diff(qs)}")
    val rowsOnly = qs.diff(os)
    assert(rowsOnly == Set("cdc_replay_state", "cdc_decode_stats"),
      s"unexpected rows-only queries: $rowsOnly")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs and returns rows") {
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("entry() (flagship CDC replay) returns live pages") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("text_fp"))
  }

  test("spot: cdc queries self-certify (digest_match true on every row)") {
    Seq("cdc_replay_state", "cdc_decode_stats").foreach { q =>
      val df = SparkEntry.queries(q)(spark, sf)
      assert(df.filter(!col("digest_match") || !col("row_match")).isEmpty,
        s"$q: engine state diverges from the independent serial oracle")
    }
  }

  test("spot: q06 orphan count is zero (testdata FKs are consistent)") {
    val n = SparkEntry.queries("q06_left_anti_orphans")(spark, sf)
      .head.getLong(0)
    assert(n == 0L)
  }

  test("spot: q08 and q09 (salted path) agree row-for-row") {
    val a = SparkEntry.queries("q08_window_lww")(spark, sf)
    val b = SparkEntry.queries("q09_salted_lww")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("spot: dd_exact keeps one row per distinct text") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val expected = d.select(countDistinct(col("text"))).head.getLong(0)
    assert(SparkEntry.queries("dd_exact")(spark, sf).count() == expected)
  }

  test("spot: mm_media_features n_bytes equals utf-8 text length") {
    val got = SparkEntry.queries("mm_media_features")(spark, sf)
      .agg(sum(col("n_bytes"))).head.getLong(0)
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .agg(sum(length(encode(col("text"), "UTF-8")))).head.getLong(0)
    assert(got == expected)
  }
}
