package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder-prompt requirement): media payloads
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract runs as a batched per-partition typed transformation
  * (the Scala analog of `mapInPandas` — same batch shape, no Python).
  *
  * The actual image/audio decode is STUBBED (no codec libs in this
  * container): [[MediaStub.decode]] derives deterministic fake metadata
  * from the bytes, so the Spark-side plumbing — schema, partitioning,
  * batching, binary handling — is real and testable end-to-end.
  */
object MediaPipeline {

  final case class MediaRecord(doc_id: Long, kind: String, media: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      emb: Array[Float])

  /** STUB decoder — deterministic pure function of the payload bytes.
    * A real deployment swaps this body for an actual codec; everything
    * around it (batching, schema, partitioning) stays unchanged. */
  object MediaStub {
    val BatchSize = 64 // Arrow-like batch shape for the vectorized analog

    def decode(r: MediaRecord): MediaFeatures = {
      val n = r.media.length.toLong
      val width = (n % 640L).toInt
      val height = ((n * 7L) % 480L).toInt
      val frames = if (r.kind == "audio") (n % 16L).toInt else 1
      // fake embedding: 8 dims from simple rolling bytes (deterministic)
      val emb = new Array[Float](8)
      var i = 0
      while (i < r.media.length) {
        emb(i % 8) += (r.media(i) & 0xff) / 255.0f
        i += 1
      }
      MediaFeatures(r.doc_id, r.kind, n, width, height, frames, emb)
    }
  }

  /** Media table derived from `documents`: the text bytes stand in for an
    * opaque media payload (binary column + kind metadata). */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        when(col("doc_id") % 2 === 0, lit("image")).otherwise(lit("audio")).as("kind"),
        encode(col("text"), "UTF-8").as("media"))

  /** Batched per-partition feature extraction over the binary column. */
  def extractFeatures(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.as[MediaRecord]
      .mapPartitions { it =>
        // batch the partition like a vectorized UDF would (shape parity
        // with mapInPandas), then decode each batch
        it.grouped(MediaStub.BatchSize).flatMap(batch => batch.map(MediaStub.decode))
      }
      .toDF()
  }
}
