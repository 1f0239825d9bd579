package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.feed.{FeedGen, FeedSpec}
import graft.ingest.CdcIngest
import graft.ingest.CdcIngest.IngestConfig
import graft.lake.LakeTable

/** Physical-plan property guards: the 100-TB scale story lives in plan
  * SHAPE (pushdown, broadcast, shuffle count, no cartesian blowups), and
  * those properties regress silently — a plan that quietly grows an extra
  * exchange or loses a pushed filter still returns correct rows at test SF.
  * Each assertion here pins a claim made in SURVEY.md §4 / BENCH.md. */
class PlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Full formatted explain of the FINAL (post-AQE) plan — `toString`
    * truncates long fields like ReadSchema, and AQE hides exchanges
    * inside QueryStage wrappers, so string-level assertions go through
    * the formatted explain of the materialized plan. */
  private def planString(df: DataFrame): String = {
    df.collect() // materialize so AQE finalizes its plan
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  /** Count data-movement exchanges (hash/range/single-partition) in the
    * final plan; broadcast exchanges are excluded — broadcasting a small
    * side is the DESIRED plan, not a shuffle. */
  private def shuffleCount(plan: String): Int = {
    // count only the FINAL (post-AQE) plan — the formatted explain repeats
    // every node in its "Initial Plan" section; the negative lookbehind is
    // load-bearing: tree headers print as "BroadcastExchange (9)", whose
    // TAIL would otherwise match (a broadcast is the desired plan, not a
    // shuffle)
    val finalOnly = plan.split(raw"\+- == Initial Plan ==").head
    raw"(?<!Broadcast)Exchange \(\d+\)".r.findAllIn(finalOnly).length
  }

  test("q02: filter and projection are pushed into the parquet scan") {
    val plan = planString(SparkEntry.queries("q02_filter_project")(spark, sf))
    assert(plan.contains("PushedFilters: ["), s"no pushed filters in:\n$plan")
    assert(plan.contains("IsNotNull") || plan.contains("GreaterThan"),
      s"expected pushed predicates in:\n$plan")
    // column pruning: the scan must not read the full 16-column lineitem
    assert(plan.contains("ReadSchema:"), "no ReadSchema in plan")
    assert(!plan.contains("l_comment"),
      s"untouched column l_comment read by the scan:\n$plan")
  }

  test("q03: small dimension joins are broadcast, not shuffled") {
    val plan = planString(SparkEntry.queries("q03_join_broadcast")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
  }

  test("dedup pair generators never plan a cartesian/nested-loop join") {
    Seq("dd_minhash_pairs", "dd_ngram_jaccard", "dd_embed_cosine").foreach { q =>
      val plan = planString(SparkEntry.queries(q)(spark, sf))
      assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian product")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$q plans a nested-loop join")
    }
  }

  test("lwwDedup with aligned partitioning plans exactly two shuffles (salt + align)") {
    import spark.implicits._
    val events = (1 to 1000)
      .map(i => (s"https://d${i % 7}.example.com/p/$i", i.toLong,
        new java.sql.Timestamp(1577836800000L + i), i % 3))
      .toDF("url", "seq", "warc_ts", "schema_version")
    // exactly TWO exchanges, each load-bearing: phase 1's distribution on
    // (url, _salt) — the salted, partial-agg'd shuffle that bounds hot-key
    // receive volume — and phase 2's repartition(n, url), which doubles as
    // the bucket alignment so the groupBy(url) AND any downstream
    // bucket-partitioned write reuse it (no third exchange may appear)
    val plan = planString(CdcIngest.lwwDedup(events, salt = 4, urlPartitions = Some(8)))
    val n = shuffleCount(plan)
    assert(n == 2, s"expected exactly 2 exchanges, found $n:\n$plan")
    assert(plan.contains("_salt"), s"phase-1 exchange lost its salt:\n$plan")
  }

  test("merge path: bucket-aligned inputs add no exchange after the join") {
    // end-to-end ingest, then re-run the same merge shape and count
    // exchanges: key-winner source (1: repartition to buckets) + target
    // (1: repartition to buckets) + NONE after the full-outer join
    val spec = FeedSpec(seed = 3L, numEvents = 2000, numUrls = 300,
      eventsPerSegment = 500)
    val dir = tmpDir("planfeed")
    FeedGen.writeSegments(spec, dir)
    val table = LakeTable.create(tmpDir("plantbl"), CdcIngest.PagesSchemaV1, 8)
    CdcIngest.run(spark, table, dir, IngestConfig(numBuckets = 8, segmentsPerBatch = 10))
    // the committed state reads back with one row per surviving url and
    // the files are bucket-partitioned — the write happened without a
    // post-join exchange (asserted structurally: every data file name
    // carries its bucket id, and bucket = pmod(hash(url), 8) holds row-wise)
    val snap = table.currentSnapshot()
    val byBucket = table.readRaw(spark, snap)
      .withColumn("b", LakeTable.bucketExpr(8))
    assert(byBucket.filter(col("b") < 0 || col("b") >= 8).isEmpty)
    snap.files.foreach(f => assert(f.path.contains(f"b${f.bucket}%05d"),
      s"file ${f.path} not bucket-scoped"))
    // and the per-file rows from footers sum to the physical row count
    assert(snap.files.map(_.rows).sum == table.readRaw(spark, snap).count())
  }

  test("DV read: positional vectors apply as a broadcast anti-join, zero shuffles") {
    val spec = FeedSpec(seed = 92L, numEvents = 2000, numUrls = 300,
      eventsPerSegment = 500)
    val dir = tmpDir("dvplanfeed")
    FeedGen.writeSegments(spec, dir)
    val table = LakeTable.create(tmpDir("dvplantbl"), CdcIngest.PagesSchemaV1, 8)
    CdcIngest.run(spark, table, dir, IngestConfig(numBuckets = 8,
      segmentsPerBatch = 1, mergeOnRead = true, deleteVectors = true))
    assert(table.currentSnapshot().deleteFiles.nonEmpty)
    val plan = planString(table.read(spark))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"vector application must be a broadcast anti-join:\n$plan")
    val n = shuffleCount(plan)
    assert(n == 0, s"a delete-aware read must add no shuffle, found $n:\n$plan")
  }

  test("dd_url_canon: per-row canonicalization + one aggregation, no joins") {
    val plan = planString(SparkEntry.queries("dd_url_canon")(spark, sf))
    assert(!plan.contains("Join"), s"url canon must not join:\n$plan")
    val n = shuffleCount(plan)
    // one shuffle for the group-by; countDistinct(raw_url) legitimately
    // plans as a two-level aggregate (second level re-keys on canon only)
    assert(n <= 2, s"url canon grew extra exchanges ($n):\n$plan")
  }

  test("dd_substring_dedup: window-hash dedup is map-side combined, never a pair blow-up") {
    val plan = planString(SparkEntry.queries("dd_substring_dedup")(spark, sf))
    // the dup-window join must stay a hash join on the window-hash key —
    // a cartesian/nested-loop here is the all-pairs suffix comparison the
    // bounded-window design exists to avoid
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pair blow-up crept into the window-hash join:\n$plan")
    // the window-count groupBy must partially aggregate before its
    // shuffle: each task collapses its repeats of a window hash locally,
    // so the exchange carries (hash, count) rows, not one row per window
    assert(plan.toLowerCase.contains("partial"),
      s"no partial aggregation before the window-hash shuffle in:\n$plan")
  }

  test("q23_funnel: window and groupBy share one user_id exchange") {
    val plan = planString(SparkEntry.queries("q23_funnel")(spark, sf))
    val n = shuffleCount(plan)
    assert(n == 1, s"funnel must reuse the window's partitioning, found $n:\n$plan")
  }

  test("ta_repetition: pure per-row projection — zero exchanges") {
    val plan = planString(SparkEntry.queries("ta_repetition")(spark, sf))
    val n = shuffleCount(plan)
    assert(n == 0, s"per-row repetition signals must not shuffle, found $n:\n$plan")
  }

  test("dd_decontaminate: held-out shingle set is broadcast; one corpus sweep") {
    val plan = planString(SparkEntry.queries("dd_decontaminate")(spark, sf))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"held-out semi-join is not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"decontamination plans a product join:\n$plan")
  }

  test("dd_bloom_decontaminate: probe is a zero-shuffle, zero-join per-row pass") {
    // the filter enters the plan as a 16 KB bitset literal; the returned
    // probe must be embarrassingly parallel — no exchange, no join of any
    // kind (the held-side aggregation runs eagerly at build time and is
    // bounded: ONE collected row of m/32 words)
    val plan = planString(SparkEntry.queries("dd_bloom_decontaminate")(spark, sf))
    val n = shuffleCount(plan)
    assert(n == 0, s"bloom probe must not shuffle, found $n:\n$plan")
    assert(!plan.contains("Join"), s"bloom probe must not join:\n$plan")
  }

  test("ta_pmi_cooccur: support-floored candidates, map-combined counts, no product join") {
    val plan = planString(SparkEntry.queries("ta_pmi_cooccur")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pmi plans a product join:\n$plan")
    // both count passes partially aggregate before their exchanges
    val finalOnly = plan.split(raw"\+- == Initial Plan ==").head
    val partials = raw"HashAggregate".r.findAllIn(finalOnly).length
    assert(partials >= 4, s"expected map-side combines around the count shuffles:\n$plan")
  }

  test("ta_entropy: exactly two exchanges — the final groupBy reuses the window's doc_id partitioning") {
    val plan = planString(SparkEntry.queries("ta_entropy")(spark, sf))
    val n = shuffleCount(plan)
    assert(n == 2,
      s"expected (doc_id,w) + doc_id exchanges only — the groupBy(doc_id) must reuse the window partitioning, found $n:\n$plan")
  }

  test("ta_corpus_filter: composition never plans a cartesian/nested-loop join") {
    val plan = planString(SparkEntry.queries("ta_corpus_filter")(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"corpus filter plans a product join:\n$plan")
  }

  test("cdc_domain_stats: hot-domain rollup is partially aggregated before its shuffle") {
    val plan = planString(SparkEntry.queries("cdc_domain_stats")(spark, sf))
    // two HashAggregate nodes around one exchange = map-side combine: the
    // Zipf-hot domain is collapsed to one row per task before shuffling
    val aggs = raw"HashAggregate \(\d+\)".r.findAllIn(
      plan.split(raw"\+- == Initial Plan ==").head).length
    assert(aggs >= 2, s"expected partial+final aggregation, found $aggs:\n$plan")
  }

  test("ann queries: probes/queries are broadcast (index side never shuffles to them)") {
    val plan = planString(SparkEntry.queries("ann_ivf_topk")(spark, sf))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"IVF probe join is not broadcast:\n$plan")
  }

  test("ann_filtered_topk: the metadata predicate is the join KEY, probes broadcast") {
    val plan = planString(SparkEntry.queries("ann_filtered_topk")(spark, sf))
    // label equi-match must reach the join as a key (hash-matched before
    // any distance work), not a post-join filter over an all-pairs product
    assert(plan.contains("BroadcastHashJoin"),
      s"filtered search lost its label-keyed broadcast join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"filtered search degenerated to scan-then-filter over all pairs:\n$plan")
  }

  test("q21_rollup: grouping sets expand into ONE partial-aggregated pass") {
    val plan = planString(SparkEntry.queries("q21_rollup")(spark, sf))
    assert(plan.contains("Expand"), s"no grouping-set Expand in:\n$plan")
    assert(shuffleCount(plan) == 1,
      s"rollup should be one exchange (partial agg before, final after):\n$plan")
  }

  test("q22_pivot: fixed-domain pivot is one groupBy — no domain-discovery pass") {
    val df = SparkEntry.queries("q22_pivot")(spark, sf)
    val plan = planString(df)
    assert(shuffleCount(plan) == 1, s"pivot should be one exchange:\n$plan")
    // a pivot without the fixed value list runs a distinct-values job first;
    // the fixed list keeps it to a single aggregate over the scan
    assert(!plan.contains("CollectLimit"), s"unexpected collect in:\n$plan")
  }

  test("ta_sample_topk_agg: partial aggregation before the stratum shuffle") {
    val plan = planString(SparkEntry.queries("ta_sample_topk_agg")(spark, sf))
    assert(shuffleCount(plan) == 1, s"bounded top-k should be one exchange:\n$plan")
    // the typed Aggregator must run map-side (partial_boundedtopk) so the
    // exchange carries <=k rows per stratum per task, not the whole corpus
    assert(plan.toLowerCase.contains("partial"),
      s"no partial aggregation before the shuffle in:\n$plan")
  }

  test("ta_hll_distinct: sketch is partially aggregated — one exchange carries registers, not rows") {
    val plan = planString(SparkEntry.queries("ta_hll_distinct")(spark, sf))
    assert(shuffleCount(plan) == 1,
      s"HLL should be one exchange (partial sketches before, merge after):\n$plan")
    // the typed Aggregator must run map-side so the exchange ships one
    // 2 KB register array per (lang, task), never the corpus rows
    assert(plan.toLowerCase.contains("partial"),
      s"no partial sketch aggregation before the shuffle in:\n$plan")
  }

  test("ta_cms_freq: sketch is partially aggregated — one exchange carries counter matrices, not tokens") {
    val plan = planString(SparkEntry.queries("ta_cms_freq")(spark, sf))
    assert(shuffleCount(plan) == 1,
      s"CMS should be one exchange (partial sketches before, merge after):\n$plan")
    // the typed Aggregator must run map-side so the exchange ships one
    // 32 KB counter matrix per (lang, task), never the token rows
    assert(plan.toLowerCase.contains("partial"),
      s"no partial sketch aggregation before the shuffle in:\n$plan")
  }

  test("ta_inverted_index: two map-combinable exchanges, no count-distinct Expand") {
    val plan = planString(SparkEntry.queries("ta_inverted_index")(spark, sf))
    assert(shuffleCount(plan) == 2,
      s"inverted index should be exactly (term,doc) + (term) exchanges:\n$plan")
    // countDistinct would plan an Expand (row multiplication before the
    // shuffle); the two-phase groupBy shape must never regress into it
    assert(!plan.contains("Expand"), s"count-distinct Expand crept in:\n$plan")
    val aggs = raw"HashAggregate \(\d+\)".r.findAllIn(
      plan.split(raw"\+- == Initial Plan ==").head).length
    assert(aggs >= 4, s"expected partial+final at both levels, found $aggs:\n$plan")
  }

  test("ta_tfidf: the df-truncated vocab joins back as a broadcast, never a shuffle join") {
    val plan = planString(SparkEntry.queries("ta_tfidf")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"idf join is not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"vocab join regressed to a shuffle/cartesian join:\n$plan")
  }

  test("ta_index_search: the query relation drives the postings via broadcast joins") {
    val plan = planString(SparkEntry.queries("ta_index_search")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"posting-list probe is not broadcast-driven:\n$plan")
    // the only tolerable non-broadcast join is none at all: the ≤6-row
    // query relation must never shuffle the postings against themselves
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"postings joined by shuffle/cartesian instead of broadcast probes:\n$plan")
  }

  test("ta_bm25_search: broadcast probes, and norms ride the postings without an extra exchange") {
    val plan = planString(SparkEntry.queries("ta_bm25_search")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"BM25 probe is not broadcast-driven:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"BM25 probe regressed to a shuffle/cartesian join:\n$plan")
    // len lives in the postings groupBy key — there must be no join back
    // to the documents table for doc lengths (count the scans downstream
    // of the checkpointed postings: the probe side reuses one relation)
    assert(!plan.contains("Exchange hashpartitioning(doc_id"),
      s"doc-length join-back exchange crept in:\n$plan")
  }

  test("q25_hotkey_join: both paths compile as intended — broadcast for hot keys, shuffle for cold") {
    val plan = planString(SparkEntry.queries("q25_hotkey_join")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"hot path is not a broadcast join:\n$plan")
    assert(plan.contains("SortMergeJoin"),
      s"cold path lost its shuffle-join shape (merge hint ignored?):\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian crept in:\n$plan")
  }

  test("q26_gap_islands: both windows and the groupBy share one user_id exchange") {
    val plan = planString(SparkEntry.queries("q26_gap_islands")(spark, sf))
    val n = shuffleCount(plan)
    assert(n == 1,
      s"sessionizer must reuse the window's user_id partitioning, found $n:\n$plan")
  }

  test("q27_range_self_join: bucketed equi-join — sort-merge on (user, bucket), never a nested loop") {
    val plan = planString(SparkEntry.queries("q27_range_self_join")(spark, sf))
    assert(plan.contains("SortMergeJoin"),
      s"interval join lost its equi-join shape (merge hint ignored?):\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"interval join degenerated to a per-user nested loop:\n$plan")
  }

  test("dd_kmeans_cluster: K centroid rows broadcast to a linear scan — no shuffle join") {
    val plan = planString(SparkEntry.queries("dd_kmeans_cluster")(spark, sf))
    // the K-row centroid relation joins as a broadcast nested loop (no
    // key — every vector scores every centroid); anything shuffling the
    // corpus to the centroids would be the wrong plan at any scale
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"centroids are not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"kmeans shuffles the corpus to a K-row relation:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian crept in:\n$plan")
  }

  test("dd_semdedup: pair generation is an equi-join on cluster — never corpus all-pairs") {
    val plan = planString(SparkEntry.queries("dd_semdedup")(spark, sf))
    assert(!plan.contains("CartesianProduct"),
      s"semdedup degenerated to corpus all-pairs:\n$plan")
    // the ONLY nested-loop join allowed is the K-row centroid broadcast
    // inside the kmeans assignment, which appears twice in the final plan
    // because the assignment subtree is referenced by both sides of the
    // dup left-join (no caching — recomputing a K-row broadcast is
    // cheaper than persisting the corpus). A THIRD nested loop would mean
    // the pair join lost its cluster equi key and degenerated to an
    // all-pairs product under the cosine residual.
    val finalOnly = plan.split(raw"\+- == Initial Plan ==").head
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(finalOnly).length
    assert(bnlj == 2,
      s"expected exactly the twice-referenced centroid broadcast, found $bnlj:\n$plan")
    // and the pair/join-back joins do carry keys
    assert("BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin".r
      .findAllIn(finalOnly).nonEmpty, s"no keyed join found:\n$plan")
  }

  test("AsofJoin plans zero joins and one key shuffle (union + window, no pair blow-up)") {
    import spark.implicits._
    val right = (0 until 100).map(i => (s"k${i % 7}", i.toLong, i.toLong, s"v$i"))
      .toDF("k", "ts", "seq", "v")
    val left = (0 until 30).map(i => (s"k${i % 7}", i.toLong * 3))
      .toDF("k", "pts")
    val plan = planString(graft.ops.AsofJoin.lastBefore(
      left, right, Seq("k"), "pts", "ts", Seq("seq"), Seq("v")))
    assert(!plan.contains("Join"),
      s"asof must not plan ANY join (probe × history blow-up):\n$plan")
    assert(shuffleCount(plan) <= 2,
      s"asof should shuffle each side once onto the key, found more:\n$plan")
    assert(plan.contains("Window"), s"no window in asof plan:\n$plan")
  }

  test("ta_seq_pack: hierarchical prefix sum — corpus windows partition by blk, one tiny global stage") {
    // NOTE: the formatted explain prints exchange DISTRIBUTIONS in the
    // trailing node-details section ("(9) Exchange / Arguments: …"), not
    // in the tree — partitioning assertions search the whole string,
    // tree-shape assertions (joins) search the final tree only
    val plan = planString(SparkEntry.queries("ta_seq_pack")(spark, sf))
    val finalOnly = plan.split(raw"\+- == Initial Plan ==").head
    // the corpus-sized window must be partitioned by blk — a global
    // (unpartitioned) window over doc_id would funnel the whole corpus
    // through one partition, the exact plan this query exists to avoid
    assert(plan.contains("hashpartitioning(blk"),
      s"big-side window not partitioned by blk:\n$plan")
    // the ONLY single-partition stage is the cumsum over the n/64-row
    // block-subtotal table (one exchange node; the details section lists
    // it once per tree it appears in — final + initial = at most 2)
    val singles = raw"Arguments: SinglePartition".r.findAllIn(plan).length
    assert(singles >= 1 && singles <= 2,
      s"expected the single tiny SinglePartition exchange, found $singles:\n$plan")
    // and the corpus relation never repartitions on doc identity
    assert(!plan.contains("hashpartitioning(doc_id"),
      s"corpus side repartitioned on doc_id:\n$plan")
    // the base-offset table must come back as a broadcast, not a shuffle
    assert(finalOnly.contains("BroadcastHashJoin"),
      s"blk_base join-back must broadcast:\n$plan")
  }

  test("ta_mix_rebalance: rate table broadcasts; corpus side never shuffles on data size") {
    val plan = planString(SparkEntry.queries("ta_mix_rebalance")(spark, sf))
    val finalOnly = plan.split(raw"\+- == Initial Plan ==").head
    assert(finalOnly.contains("BroadcastHashJoin"),
      s"per-lang rate join must broadcast:\n$plan")
    // allowed exchanges are lang-level aggregations (|langs| rows); the
    // corpus relation itself must reach the join without repartitioning,
    // so no exchange may hash on doc-identity columns
    assert(!plan.contains("hashpartitioning(doc_id"),
      s"corpus side repartitioned on doc_id:\n$plan")
    assert(!finalOnly.contains("CartesianProduct"),
      s"cartesian product in mix plan:\n$plan")
  }
}
