package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ingest.CdcIngest.IngestConfig
import graft.lake.LakeTable

/** Structured Streaming front-end for the engine (north rule: "Structured
  * Streaming pipeline … foreachBatch MERGE"; SURVEY.md §2.10).
  *
  * The WAL directory is tailed with the file streaming source
  * (`binaryFile` — new `segment-*.bin` files are discovered as they land);
  * each micro-batch's file list is handed to [[CdcIngest.applyBatch]],
  * which performs decode → salted LWW dedup → MERGE → atomic snapshot
  * commit.
  *
  * Exactly-once holds under BOTH coordination layers:
  *  - Spark's streaming checkpoint tracks which files were seen;
  *  - the lake table's own watermark makes any replayed batch a no-op
  *    (applyBatch skips batches at or below the committed watermark), so a
  *    crash between sink commit and checkpoint write cannot double-apply.
  *
  * Segments inside one micro-batch may arrive out of order — they are
  * sorted by id; the engine still requires the WAL itself to be gapless
  * (an out-of-order LANDING across micro-batches fails fast with the
  * gap-in-WAL error rather than silently skipping data).
  */
object StreamingIngest {

  private val SegName = raw".*segment-(\d+)\.bin".r

  /** Run a streaming ingest over `feedDir`. With [[Trigger.AvailableNow]]
    * (the default) this drains everything currently in the directory and
    * stops — the replay-from-WAL shape; a processing-time trigger tails the
    * directory indefinitely. Returns the number of micro-batches applied. */
  def run(
      spark: SparkSession,
      table: LakeTable,
      feedDir: String,
      config: IngestConfig = IngestConfig(),
      checkpointDir: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None): Long = {
    val ckpt = checkpointDir.getOrElse(
      Files.createTempDirectory("graft-stream-ckpt").toString)
    var batches = 0L
    // the binaryFile source's fixed schema, required explicitly for streams
    val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    val reader = spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "segment-*.bin")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n.toString))
    val files = reader.load(feedDir)
      .select(col("path")) // content stays in the source; applyBatch re-reads
    val query = files.writeStream
      .queryName("graft-cdc-ingest")
      .option("checkpointLocation", ckpt)
      .trigger(trigger)
      .foreachBatch { (batchDf: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val segs = batchDf.collect().map(_.getString(0)).toSeq
          .flatMap { p =>
            p match {
              case SegName(id) => Some(id.toLong -> stripScheme(p))
              case _           => None
            }
          }
          .sortBy(_._1)
        if (segs.nonEmpty) {
          CdcIngest.applyBatch(spark, table, segs, config)
          batches += 1
        }
      }
      .start()
    query.awaitTermination()
    batches
  }

  private def stripScheme(p: String): String =
    if (p.startsWith("file:")) p.stripPrefix("file:") else p
}
