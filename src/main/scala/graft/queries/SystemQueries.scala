package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

import graft.feed.{FeedGen, FeedSpec}
import graft.ingest.CdcIngest
import graft.ingest.CdcIngest.IngestConfig
import graft.lake.LakeTable
import graft.multimodal.MediaPipeline

/** System-level operators: Structured Streaming, multimodal plumbing, and
  * the CDC engine exercised through the harness (SURVEY.md §2.10, §2.11).
  * The cdc_* queries synthesize their own deterministic feed (seed-fixed,
  * FIXTURES.md) — no DuckDB oracle possible, so the driver records a
  * rows-only check for them; their real correctness gate is IngestSpec's
  * serial-oracle comparison. */
object SystemQueries {

  // ---- structured streaming: availableNow replay → windowed aggregation ----
  private def strmHourly(s: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    val sch = s.read.parquet(path).schema
    // the file streaming source wants a directory — stage the single
    // parquet file behind a symlink (copy fallback)
    val srcDir = Files.createTempDirectory("strmsrc")
    val staged = srcDir.resolve("events.parquet")
    try Files.createSymbolicLink(staged, java.nio.file.Paths.get(path))
    catch { case _: Exception => Files.copy(java.nio.file.Paths.get(path), staged) }
    val name = "strm_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = s.readStream.schema(sch).parquet(srcDir.toString)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 6))).cast("double").as("total_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("total_value"))
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("strmck").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    s.table(name)
  }

  // ---- CDC engine through the harness (deterministic synthesized feed) ----
  private val CdcSpec = FeedSpec(seed = 42L, numEvents = 4000, numUrls = 400,
    eventsPerSegment = 1000, evolveAtEvent = 2000)

  /** replay the deterministic feed into a fresh lake table, return the final
    * live state (hashed text so the dump stays small). */
  def cdcReplay(s: SparkSession, dir: String): DataFrame = {
    val work = Files.createTempDirectory("cdcq")
    val feedDir = work.resolve("feed").toString
    FeedGen.writeSegments(CdcSpec, feedDir)
    val table = LakeTable.create(work.resolve("table").toString,
      CdcIngest.PagesSchemaV1, numBuckets = 16)
    CdcIngest.run(s, table, feedDir, IngestConfig(numBuckets = 16, segmentsPerBatch = 2))
    table.read(s).select(col("url"), col("warc_ts"), col("lang"),
      md5(col("text").cast("binary")).as("text_fp"),
      col("fetch_status"), col("content_len"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "strm_hourly" -> ((s, dir) => strmHourly(s, dir)),

    // multimodal: binary media column → batched typed decode (stub codec)
    "mm_media_features" -> ((s, dir) => {
      MediaPipeline.extractFeatures(s, MediaPipeline.mediaTable(s, dir))
        .select(col("doc_id"), col("kind"), col("n_bytes"),
          col("width"), col("height"), col("n_frames"))
    }),

    // CDC engine end-to-end (rows-only oracle; serial-oracle gate in tests)
    "cdc_replay_state" -> ((s, dir) => cdcReplay(s, dir)),

    // binary WAL decode stats (codec exercised through Spark)
    "cdc_decode_stats" -> ((s, dir) => {
      val work = Files.createTempDirectory("cdcd")
      val paths = FeedGen.writeSegments(CdcSpec, work.toString).map(_.toString)
      CdcIngest.eventsDf(s, paths)
        .groupBy(col("op"), col("schema_version"))
        .agg(count(lit(1)).as("n"), min(col("seq")).as("min_seq"),
          max(col("seq")).as("max_seq"), countDistinct(col("url")).as("n_urls"))
    })
  )

  val oracles: Map[String, String] = Map(
    "strm_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type, COUNT(*) AS n,
        | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "mm_media_features" ->
      """SELECT doc_id,
        | CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
        | CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        | CAST(octet_length(encode(text)) % 640 AS INT) AS width,
        | CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS height,
        | CAST(CASE WHEN doc_id % 2 = 0 THEN 1
        |           ELSE octet_length(encode(text)) % 16 END AS INT) AS n_frames
        |FROM documents""".stripMargin
    // cdc_replay_state / cdc_decode_stats: no DuckDB-expressible oracle
    // (input is the engine's own binary WAL) → driver rows-only check.
  )
}
