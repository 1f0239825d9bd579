package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over `documents` / `embeddings`
  * (builder-prompt requirement beyond SURVEY.md §2): deduplication (exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine), similarity
  * search (brute-force top-k + LSH-bucketed scale path), and text analysis
  * (language-ID, quality scoring, token counting, fingerprinting).
  *
  * Oracle-parity tactics: all similarity thresholds are evaluated with
  * integer cross-multiplication (no float compare), hashes are md5 hex
  * strings (identical in Spark and DuckDB), dot products run over
  * double-cast arrays with identical left-fold order, and simhash bits are
  * derived from hex-digit positions (portable to both dialects).
  */
object PipelineQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** md5 hex of a string column (Spark needs an explicit binary cast). */
  private def md5s(c: Column): Column = md5(c.cast("binary"))

  /** distinct word-3-gram shingles per doc: (doc_id, shingle). */
  private def shingles(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    t(s, dir, "documents")
      .select(col("doc_id"), toks.as("ts"))
      .select(col("doc_id"),
        explode(when(size(col("ts")) >= 3,
          transform(sequence(lit(1), size(col("ts")) - 2),
            i => concat_ws(" ", element_at(col("ts"), i),
              element_at(col("ts"), i + 1), element_at(col("ts"), i + 2))))
          .otherwise(array().cast("array<string>"))).as("shingle"))
      .distinct()
  }

  private val ShinglesSql =
    """sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
      |  FROM (SELECT doc_id, ts, unnest(generate_series(1, greatest(len(ts)-2, 0))) AS i
      |        FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)))""".stripMargin

  /** 8-hash MinHash signature per doc (min of seeded md5 over shingles). */
  private def minhashSig(s: SparkSession, dir: String): DataFrame =
    shingles(s, dir)
      .groupBy(col("doc_id"))
      .agg(
        min(md5s(concat(lit("0:"), col("shingle")))).as("h0"),
        (1 until 8).map(j =>
          min(md5s(concat(lit(s"$j:"), col("shingle")))).as(s"h$j")): _*)

  private val MinhashSigSql =
    s"""WITH $ShinglesSql
       |SELECT doc_id, ${(0 until 8).map(j => s"min(md5('$j:' || shingle)) AS h$j").mkString(", ")}
       |FROM sh GROUP BY doc_id""".stripMargin

  /** 16-bit SimHash from token md5 nibbles — bit b of token hash = bit
    * (3 - b%4) of hex digit (1 + b/4); portable via position-in-hex-alphabet
    * arithmetic on both engines. */
  private val SimhashBits = 16
  private def simhashBitExprs(hexpos: (Int) => String): Seq[String] =
    (0 until SimhashBits).map { b =>
      val digit = 1 + b / 4
      val shift = 1 << (3 - b % 4)
      s"CASE WHEN ((${hexpos(digit)}) / $shift) % 2 = 1 THEN 1 ELSE -1 END"
    }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- deduplication -------------------------------------------------
    "dd_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy(md5s(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_dups"))
    }),

    "dd_ngram_jaccard" -> ((s, dir) => {
      val sh = shingles(s, dir)
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = sh.as("a")
        .join(sh.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.as("sa"), col("da") === col("sa.doc_id"))
        .join(sizes.as("sb"), col("db") === col("sb.doc_id"))
        // jaccard >= 0.30 in integer arithmetic: 100*inter >= 30*union
        .filter(lit(100) * col("inter") >=
          lit(30) * (col("sa.n") + col("sb.n") - col("inter")))
        .select(col("da"), col("db"), col("inter"),
          (col("sa.n") + col("sb.n") - col("inter")).as("uni"))
    }),

    "dd_minhash_sig" -> ((s, dir) => minhashSig(s, dir)),

    "dd_minhash_pairs" -> ((s, dir) => {
      // LSH: 4 bands of 2 hashes; candidates share >= 1 band bucket
      val sig = minhashSig(s, dir)
      val banded = sig.select(col("doc_id"),
        explode(array((0 until 4).map(k =>
          struct(lit(k).as("band"),
            md5s(concat(col(s"h${2 * k}"), col(s"h${2 * k + 1}"))).as("key"))): _*)).as("bk"))
        .select(col("doc_id"), col("bk.band"), col("bk.key"))
      banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("da"), col("y.doc_id").as("db"))
        .distinct()
    }),

    "dd_simhash" -> ((s, dir) => {
      val tokh = t(s, dir, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .select(col("doc_id"), md5s(col("tok")).as("h"))
      val votes = simhashBitExprs(d => s"position(substr(h, $d, 1) IN '0123456789abcdef') - 1")
      val agged = tokh.groupBy(col("doc_id"))
        .agg(votes.zipWithIndex.map { case (e, b) =>
          sum(expr(e)).as(s"v$b")
        }.head, votes.zipWithIndex.tail.map { case (e, b) => sum(expr(e)).as(s"v$b") }: _*)
      agged.select(col("doc_id"),
        (0 until SimhashBits).map(b =>
          when(col(s"v$b") >= 0, lit(1L << (SimhashBits - 1 - b))).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
    }),

    "dd_embed_cosine" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      def dot(a: Column, b: Column): Column =
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      // brute-force pair scan capped at 800 vectors (640k dot products at
      // sf0.1) — the LSH-bucketed path (ann_lsh_topk) is the scale story
      e.filter(col("vec_id") < 800).as("a")
        .join(e.filter(col("vec_id") < 800).as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"),
          (dot(col("a.v"), col("b.v")) /
            (sqrt(dot(col("a.v"), col("a.v"))) * sqrt(dot(col("b.v"), col("b.v"))))).as("cos"))
        .filter(col("cos") >= 0.40)
        .select(col("va"), col("vb"))
    }),

    // ---- similarity search ---------------------------------------------
    "ann_brute_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
      def dot(a: Column, b: Column): Column =
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val scored = broadcast(q).join(e, col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          (dot(col("qv"), col("v")) /
            (sqrt(dot(col("qv"), col("qv"))) * sqrt(dot(col("v"), col("v"))))).as("cos"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),

    // LSH-bucketed scale path: sign bits of dims 1..8 → 256 buckets; a
    // query only scans its own bucket (the 100-TB-shape alternative to
    // the O(N) brute-force scan above)
    "ann_lsh_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("bucket",
          (1 to 8).map(i =>
            when(element_at(col("v"), i) >= 0, lit(1 << (i - 1))).otherwise(lit(0)))
            .reduce(_ + _))
      def dot(a: Column, b: Column): Column =
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("v").as("qv"), col("bucket"))
      val scored = broadcast(q).join(e, Seq("bucket"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          (dot(col("qv"), col("v")) /
            (sqrt(dot(col("qv"), col("qv"))) * sqrt(dot(col("v"), col("v"))))).as("cos"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }),

    // ---- text analysis ---------------------------------------------------
    "ta_langid" -> ((s, dir) => {
      val ts = split(col("text"), " ")
      def score(words: Seq[String]) =
        size(filter(ts, tk => tk.isin(words: _*)))
      t(s, dir, "documents").select(
          col("doc_id"),
          score(Seq("the", "and", "of", "a")).as("s_en"),
          score(Seq("der", "die", "und", "das")).as("s_de"),
          score(Seq("le", "la", "et", "les")).as("s_fr"),
          score(Seq("el", "los", "que", "de")).as("s_es"))
        .select(col("doc_id"),
          when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr") &&
            col("s_en") >= col("s_es"), lit("en"))
            .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es"), lit("de"))
            .when(col("s_fr") >= col("s_es"), lit("fr"))
            .otherwise(lit("es")).as("lang_guess"),
          col("s_en"), col("s_de"), col("s_fr"), col("s_es"))
    }),

    "ta_quality" -> ((s, dir) => {
      val ts = split(col("text"), " ")
      t(s, dir, "documents").select(
          col("doc_id"),
          size(ts).as("n_tokens"),
          size(array_distinct(ts)).as("n_uniq"),
          aggregate(transform(ts, tk => length(tk).cast("long")), lit(0L),
            (acc, x) => acc + x).as("sum_tok_len"))
        .withColumn("quality_ok",
          col("n_tokens") >= 5 && col("n_tokens") <= 10000 &&
            lit(10) * col("n_uniq") >= lit(3) * col("n_tokens"))
    }),

    "ta_tokens" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("bpe_tokens"))
    }),

    "ta_token_totals" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("lang"), size(split(col("text"), " ")).as("n"))
        .groupBy(col("lang"))
        .agg(sum(col("n")).as("total_tokens"), count(lit(1)).as("n_docs"))
    }),

    "ta_fingerprint" -> ((s, dir) => {
      t(s, dir, "documents").select(
        col("doc_id"),
        md5s(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))
    })
  )

  private def simhashOracle: String = {
    val votes = simhashBitExprs(d => s"strpos('0123456789abcdef', substr(h, $d, 1)) - 1")
    val vcols = votes.zipWithIndex.map { case (e, b) => s"SUM($e) AS v$b" }.mkString(", ")
    val value = (0 until SimhashBits).map { b =>
      s"CASE WHEN v$b >= 0 THEN ${1L << (SimhashBits - 1 - b)} ELSE 0 END"
    }.mkString(" + ")
    s"""WITH tokh AS (SELECT doc_id, md5(unnest(string_split(text, ' '))) AS h FROM documents),
       |agged AS (SELECT doc_id, $vcols FROM tokh GROUP BY doc_id)
       |SELECT doc_id, CAST($value AS BIGINT) AS simhash FROM agged""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "dd_exact" ->
      """SELECT md5(text) AS fp, MIN(doc_id) AS keeper, COUNT(*) AS n_dups
        |FROM documents GROUP BY 1""".stripMargin,
    "dd_ngram_jaccard" ->
      s"""WITH $ShinglesSql,
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT da, db, inter, (sa.n + sb.n - inter) AS uni
         |FROM inter JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
         |WHERE 100 * inter >= 30 * (sa.n + sb.n - inter)""".stripMargin,
    "dd_minhash_sig" -> MinhashSigSql,
    "dd_minhash_pairs" ->
      s"""WITH sig AS ($MinhashSigSql),
         |banded AS (
         |  ${(0 until 4).map(k =>
            s"SELECT doc_id, $k AS band, md5(h${2 * k} || h${2 * k + 1}) AS key FROM sig")
            .mkString("\n  UNION ALL\n  ")})
         |SELECT DISTINCT x.doc_id AS da, y.doc_id AS db
         |FROM banded x JOIN banded y
         |  ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id""".stripMargin,
    "dd_simhash" -> simhashOracle,
    "dd_embed_cosine" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings)
        |SELECT a.vec_id AS va, b.vec_id AS vb
        |FROM e a JOIN e b ON a.vec_id < b.vec_id AND a.vec_id < 800 AND b.vec_id < 800
        |WHERE list_dot_product(a.v, b.v) /
        |      (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.40""".stripMargin,
    "ann_brute_topk" ->
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |    list_dot_product(q.v, e.v) /
        |    (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS cos
        |  FROM e q JOIN e ON q.vec_id < 10 AND e.vec_id <> q.vec_id)
        |SELECT query_id, neighbor_id, rank FROM (
        |  SELECT query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        |  FROM scored) WHERE rank <= 5""".stripMargin,
    "ann_lsh_topk" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |           FROM embeddings),
         |eb AS (SELECT vec_id, v,
         |  ${(1 to 8).map(i => s"(CASE WHEN v[$i] >= 0 THEN ${1 << (i - 1)} ELSE 0 END)").mkString(" + ")} AS bucket
         |  FROM e),
         |scored AS (
         |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |    list_dot_product(q.v, e.v) /
         |    (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(e.v, e.v))) AS cos
         |  FROM eb q JOIN eb e ON q.bucket = e.bucket AND q.vec_id < 10 AND e.vec_id <> q.vec_id)
         |SELECT query_id, neighbor_id, rank FROM (
         |  SELECT query_id, neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
         |  FROM scored) WHERE rank <= 5""".stripMargin,
    "ta_langid" ->
      """WITH sc AS (SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), t -> t IN ('the','and','of','a'))) AS s_en,
        |  len(list_filter(string_split(text, ' '), t -> t IN ('der','die','und','das'))) AS s_de,
        |  len(list_filter(string_split(text, ' '), t -> t IN ('le','la','et','les'))) AS s_fr,
        |  len(list_filter(string_split(text, ' '), t -> t IN ('el','los','que','de'))) AS s_es
        | FROM documents)
        |SELECT doc_id,
        |  CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
        |       WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
        |       WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END AS lang_guess,
        |  s_en, s_de, s_fr, s_es
        |FROM sc""".stripMargin,
    "ta_quality" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  len(list_distinct(string_split(text, ' '))) AS n_uniq,
        |  CAST(list_sum(list_transform(string_split(text, ' '), t -> len(t))) AS BIGINT) AS sum_tok_len,
        |  (len(string_split(text, ' ')) >= 5 AND len(string_split(text, ' ')) <= 10000 AND
        |   10 * len(list_distinct(string_split(text, ' '))) >= 3 * len(string_split(text, ' ')))
        |    AS quality_ok
        |FROM documents""".stripMargin,
    "ta_tokens" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_tokens
        |FROM documents""".stripMargin,
    "ta_token_totals" ->
      """SELECT lang, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens, COUNT(*) AS n_docs
        |FROM documents GROUP BY lang""".stripMargin,
    "ta_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp
        |FROM documents""".stripMargin
  )
}
