package graft.ingest

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.codec.RecordCodec
import graft.lake.{DataFileEntry, LakeTable, Snapshot}
import graft.model.ChangeEvent

/** The CDC / incremental-ingest engine (north rule core; SURVEY.md §7.1 #5).
  *
  * Per micro-batch of WAL segments:
  *  1. decode — binary segments → typed `Dataset[ChangeEvent]` (Dataset.map,
  *     JVM-native; replaces the reference's Python UDF decode,
  *     encoding.py:279-306);
  *  2. in-batch LWW dedup — two-phase salted aggregation: phase 1 groups by
  *     (url, salt) with map-side partial aggregation (hot-domain skew is
  *     reduced before the shuffle), phase 2 groups by url; winner = max_by
  *     (warc_ts, seq) — SURVEY.md §2.6;
  *  3. additive schema evolution — v2 records promote `extra` entries to
  *     typed columns; the table schema widens, old rows read as null
  *     (schema_validator.py:116-128 promotion semantics);
  *  4. MERGE — full-outer join against ONLY the touched buckets' files
  *     (manifest-driven partition pruning); last-writer-wins vs the target
  *     on (warc_ts, _seq); deletes become tombstones so later-arriving
  *     older versions still lose;
  *  5. atomic commit — data files + snapshot + checkpoint watermark +
  *     per-bucket lineage + metrics all become visible via ONE atomic
  *     rename of the snapshot JSON (exactly-once; idempotent on replay).
  *
  * Scale notes (100 TB): parallelism of decode = #segments; the only
  * shuffles are the two dedup aggregations (partial-agg'd, keyed by url —
  * salting bounds per-reducer hot-key volume), the merge join (both sides
  * hashed by url), and the final repartition by bucket for file clustering.
  * Read amplification is bounded by bucket pruning: untouched buckets are
  * carried into the new snapshot by reference, never rewritten.
  */
object CdcIngest {

  final case class IngestConfig(
      numBuckets: Int = 32,
      saltBuckets: Int = 16,
      segmentsPerBatch: Int = 4)

  /** User-facing v1 schema of the pages lake table (BASELINE.json:input_hint). */
  val PagesSchemaV1: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = true),
    StructField("html", BinaryType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)))

  private val sparkTypeOf: Map[String, DataType] =
    Map("int" -> IntegerType, "bigint" -> LongType)

  /** Injected by tests between data-file write and snapshot commit. */
  final class CrashInjected extends RuntimeException("injected crash before commit")

  // -------------------------------------------------------------------
  // 1. decode
  // -------------------------------------------------------------------

  def decodeSegments(spark: SparkSession, segmentPaths: Seq[String]): Dataset[ChangeEvent] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(segmentPaths: _*)
      .select("content").as[Array[Byte]]
      .flatMap(bytes => RecordCodec.decodeSegment(bytes))
  }

  /** Decoded events as a DataFrame with lake column names. */
  def eventsDf(spark: SparkSession, segmentPaths: Seq[String]): DataFrame =
    decodeSegments(spark, segmentPaths).toDF()
      .withColumnRenamed("warcTs", "warc_ts")
      .withColumnRenamed("schemaVersion", "schema_version")

  // -------------------------------------------------------------------
  // 2. salted two-phase LWW dedup
  // -------------------------------------------------------------------

  /** One winner row per url: max by (warc_ts, seq). Adds bookkeeping columns
    * `_n` (events folded) and `_sv` (max schema version seen).
    * Phase 1 salts by `pmod(seq, salt)` — the salt must split same-key rows,
    * so it derives from the event position, not the key; phase 2 sees at
    * most `salt` rows per url regardless of how hot the domain is. */
  def lwwDedup(events: DataFrame, salt: Int): DataFrame = {
    val payload = struct(events.columns.map(col).toSeq: _*)
    val ord = struct(col("warc_ts"), col("seq"))
    val phase1 = events
      .withColumn("_salt", pmod(col("seq"), lit(salt.toLong)))
      .groupBy(col("url"), col("_salt"))
      .agg(
        max_by(payload, ord).as("_w"),
        count(lit(1)).as("_n"),
        max(col("schema_version")).as("_sv"))
    phase1
      .groupBy(col("url"))
      .agg(
        max_by(col("_w"), struct(col("_w.warc_ts"), col("_w.seq"))).as("_w"),
        sum(col("_n")).as("_n"),
        max(col("_sv")).as("_sv"))
      .select(col("_w.*"), col("_n"), col("_sv"))
  }

  // -------------------------------------------------------------------
  // batch apply
  // -------------------------------------------------------------------

  /** Apply one batch of WAL segments (inclusive id range) to the table.
    * Returns the committed snapshot. Idempotent: a batch at or below the
    * table watermark is skipped; a replayed commit of the same version+batch
    * resolves to the already-committed snapshot. */
  def applyBatch(
      spark: SparkSession,
      table: LakeTable,
      segments: Seq[(Long, String)],
      config: IngestConfig = IngestConfig(),
      crashBeforeCommit: Boolean = false): Snapshot = {
    require(segments.nonEmpty, "empty batch")
    val t0 = System.nanoTime()
    val snap = table.currentSnapshot()
    val segFrom = segments.map(_._1).min
    val segTo = segments.map(_._1).max
    if (segTo <= snap.watermarkSegment) return snap // already applied
    require(segFrom == snap.watermarkSegment + 1,
      s"gap in WAL: table at segment ${snap.watermarkSegment}, batch starts at $segFrom")
    val batchId = s"seg$segFrom-$segTo"
    val numBuckets = snap.numBuckets

    val raw = eventsDf(spark, segments.map(_._2))
    // promote evolved columns unconditionally (null when absent) …
    val promoted = RecordCodec.V2Columns.foldLeft(raw) { case (df, (name, typ)) =>
      df.withColumn(name, element_at(col("extra"), name).cast(sparkTypeOf(typ)))
    }.drop("extra")

    val winners = lwwDedup(promoted, config.saltBuckets)
      .withColumn(LakeTable.BucketCol, LakeTable.bucketExpr(numBuckets))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // one small job: touched buckets + per-bucket lineage + schema decision
      val stats = winners.groupBy(col(LakeTable.BucketCol)).agg(
        count(lit(1)).as("winners"),
        sum(when(col("op") === ChangeEvent.OpDelete, 1L).otherwise(0L)).as("deletes"),
        sum(col("_n")).as("events"),
        max(col("_sv")).as("maxSv"),
        min(col("seq")).as("minSeq"),
        max(col("seq")).as("maxSeq")).collect()
      val touched = stats.map(_.getAs[Int](LakeTable.BucketCol)).toSet
      val batchEvents = stats.map(_.getAs[Long]("events")).sum
      val batchDeletes = stats.map(_.getAs[Long]("deletes")).sum
      val batchWinners = stats.map(_.getAs[Long]("winners")).sum
      val maxSv = if (stats.isEmpty) 1 else stats.map(_.getAs[Int]("maxSv")).max

      // … but only widen the table schema if the batch actually carries v2
      val newSchema =
        if (maxSv >= RecordCodec.SchemaV2 &&
            !snap.schema.fieldNames.contains(RecordCodec.V2Columns.head._1))
          StructType(snap.schema.fields ++ RecordCodec.V2Columns.map {
            case (n, t) => StructField(n, sparkTypeOf(t), nullable = true)
          })
        else snap.schema
      val dataCols = newSchema.fieldNames.toSeq

      // target side: only files of touched buckets, read through the NEW schema
      val physical = StructType(newSchema.fields ++ Array(
        StructField(LakeTable.SeqCol, LongType), StructField(LakeTable.DeletedCol, BooleanType)))
      val targetFiles = snap.files.filter(f => touched.contains(f.bucket))
      val target =
        if (targetFiles.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], physical)
        else spark.read.schema(physical)
          .parquet(targetFiles.map(f => table.root.resolve(f.path).toString): _*)

      val merged = mergeLww(winners.drop("_n", "_sv", LakeTable.BucketCol), target, dataCols)

      // cluster output by bucket: one shuffle, one file per touched bucket
      val tmpDir = table.root.resolve(s".tmp-${java.util.UUID.randomUUID()}")
      merged
        .withColumn(LakeTable.BucketCol, LakeTable.bucketExpr(numBuckets))
        .repartition(col(LakeTable.BucketCol))
        .write.partitionBy(LakeTable.BucketCol).mode("overwrite")
        .parquet(tmpDir.toString)

      val newVersion = snap.version + 1
      val newFiles = moveDataFiles(spark, table, tmpDir, newVersion)
      if (crashBeforeCommit) throw new CrashInjected

      val carried = snap.files.filterNot(f => touched.contains(f.bucket))
      val lineage = stats.toSeq.map { r =>
        Map[String, Any](
          "bucket" -> r.getAs[Int](LakeTable.BucketCol).toLong,
          "rows" -> newFiles.filter(_.bucket == r.getAs[Int](LakeTable.BucketCol)).map(_.rows).sum,
          "upserts" -> (r.getAs[Long]("winners") - r.getAs[Long]("deletes")),
          "deletes" -> r.getAs[Long]("deletes"),
          "minSeq" -> r.getAs[Long]("minSeq"),
          "maxSeq" -> r.getAs[Long]("maxSeq"),
          "segFrom" -> segFrom,
          "segTo" -> segTo)
      }
      val metrics = Map[String, Any](
        "events" -> batchEvents,
        "upserts" -> (batchWinners - batchDeletes),
        "deletes" -> batchDeletes,
        "touchedBuckets" -> touched.size.toLong,
        "durationMs" -> (System.nanoTime() - t0) / 1000000L)
      table.commit(Snapshot(
        version = newVersion, batchId = batchId, parentVersion = snap.version,
        watermarkSegment = segTo, schemaJson = newSchema.json,
        numBuckets = numBuckets, files = carried ++ newFiles,
        lineage = lineage, metrics = metrics))
    } finally winners.unpersist()
  }

  /** MERGE INTO semantics over a full-outer join on the key: source row wins
    * iff it is strictly newer by (warc_ts, seq); a winning delete leaves a
    * tombstone row (url, warc_ts, _seq, _deleted=true, payload nulls). */
  private[ingest] def mergeLww(source: DataFrame, target: DataFrame, dataCols: Seq[String]): DataFrame = {
    val s = source.alias("s")
    val t = target.alias("t")
    val joined = t.join(s, col("t.url") === col("s.url"), "full_outer")
    val tgtPresent = col(s"t.${LakeTable.SeqCol}").isNotNull
    val srcPresent = col("s.seq").isNotNull
    val srcWins = srcPresent && (!tgtPresent ||
      struct(col("s.warc_ts"), col("s.seq")) > struct(col("t.warc_ts"), col(s"t.${LakeTable.SeqCol}")))
    val isDel = col("s.op") === lit(ChangeEvent.OpDelete)
    val outCols =
      coalesce(col("s.url"), col("t.url")).as("url") +:
        dataCols.filterNot(_ == "url").map { c =>
          val srcVal = // a winning delete keeps its warc_ts, nulls the payload
            if (c == "warc_ts") col("s.warc_ts")
            else when(isDel, lit(null)).otherwise(col(s"s.$c"))
          when(srcWins, srcVal).otherwise(col(s"t.$c")).as(c)
        } :+
        when(srcWins, col("s.seq")).otherwise(col(s"t.${LakeTable.SeqCol}")).as(LakeTable.SeqCol) :+
        when(srcWins, isDel).otherwise(coalesce(col(s"t.${LakeTable.DeletedCol}"), lit(false)))
          .as(LakeTable.DeletedCol)
    joined.select(outCols: _*)
  }

  /** Move spark's partitioned output into the table's data dir under
    * version-scoped names; row counts come from parquet footers (metadata
    * only — no extra Spark job). */
  private def moveDataFiles(
      spark: SparkSession, table: LakeTable, tmpDir: Path, version: Long): Seq[DataFileEntry] = {
    val conf = spark.sessionState.newHadoopConf()
    val bucketDirs = Files.list(tmpDir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith(s"${LakeTable.BucketCol}="))
      .toSeq
    val entries = bucketDirs.flatMap { bd =>
      val bucket = bd.getFileName.toString.stripPrefix(s"${LakeTable.BucketCol}=").toInt
      val parts = Files.list(bd).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
      parts.zipWithIndex.map { case (p, i) =>
        val name = f"s$version%08d-b$bucket%05d-$i%03d.parquet"
        val dest = table.dataDir.resolve(name)
        Files.move(p, dest, StandardCopyOption.ATOMIC_MOVE)
        val rows = parquetRowCount(dest, conf)
        DataFileEntry(table.root.relativize(dest).toString, bucket, rows)
      }
    }
    deleteRecursively(tmpDir)
    entries
  }

  def parquetRowCount(p: Path, conf: org.apache.hadoop.conf.Configuration): Long = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(p.toUri), conf)
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try rd.getRecordCount finally rd.close()
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }

  // -------------------------------------------------------------------
  // driver loop: resumable from checkpoint (= the snapshot watermark)
  // -------------------------------------------------------------------

  private val SegName = raw"segment-(\d+)\.bin".r

  def listSegments(feedDir: String): Seq[(Long, String)] =
    Files.list(Paths.get(feedDir)).iterator().asScala
      .flatMap { p =>
        p.getFileName.toString match {
          case SegName(id) => Some(id.toLong -> p.toString)
          case _           => None
        }
      }.toSeq.sortBy(_._1)

  /** Ingest all WAL segments newer than the table's checkpoint, in batches.
    * Safe to call repeatedly / after a crash: the watermark in the latest
    * committed snapshot is the checkpoint. Returns committed snapshots. */
  def run(
      spark: SparkSession,
      table: LakeTable,
      feedDir: String,
      config: IngestConfig = IngestConfig()): Seq[Snapshot] = {
    val watermark = table.currentSnapshot().watermarkSegment
    val pending = listSegments(feedDir).filter(_._1 > watermark)
    pending.grouped(config.segmentsPerBatch).map { batch =>
      applyBatch(spark, table, batch, config)
    }.toSeq
  }
}
