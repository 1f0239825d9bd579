package graft

import org.apache.spark.sql.SparkSession

import graft.feed.{FeedGen, FeedSpec}
import graft.ingest.CdcIngest
import graft.ingest.CdcIngest.IngestConfig
import graft.lake.LakeTable

/** spark-submit entry point for the CDC engine (the reference's
  * run_migration.py / cli.py analog, SURVEY.md §3 E1-E2).
  *
  * Usage:
  *   MainIngest gen    <feedDir> <numEvents> <numUrls> [eventsPerSegment] [evolveAt]
  *   MainIngest init   <tableDir> [numBuckets]
  *   MainIngest ingest <tableDir> <feedDir> [segmentsPerBatch] [saltBuckets]
  *   MainIngest show   <tableDir>
  *
  * `ingest` is resumable: the checkpoint is the committed snapshot
  * watermark; re-running after completion is a no-op.
  */
object MainIngest {

  def usage(): Nothing = {
    System.err.println(
      """usage:
        |  MainIngest gen    <feedDir> <numEvents> <numUrls> [eventsPerSegment] [evolveAtEvent]
        |  MainIngest init   <tableDir> [numBuckets]
        |  MainIngest ingest <tableDir> <feedDir> [segmentsPerBatch] [saltBuckets]
        |  MainIngest stream <tableDir> <feedDir> [checkpointDir]
        |  MainIngest export <tableDir> <outDir> [json|csv|parquet]
        |  MainIngest show   <tableDir>""".stripMargin)
    sys.exit(2)
  }

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft-cdc-ingest")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "gen" :: feedDir :: n :: u :: rest =>
      val perSeg = rest.headOption.map(_.toInt).getOrElse(1000)
      val evolveAt = rest.drop(1).headOption.map(_.toInt).getOrElse(-1)
      val spec = FeedSpec(numEvents = n.toInt, numUrls = u.toInt,
        eventsPerSegment = perSeg, evolveAtEvent = evolveAt)
      val paths = FeedGen.writeSegments(spec, feedDir)
      println(s"wrote ${paths.size} segments (${spec.numEvents} events) to $feedDir")

    case "init" :: tableDir :: rest =>
      val buckets = rest.headOption.map(_.toInt).getOrElse(32)
      LakeTable.create(tableDir, CdcIngest.PagesSchemaV1, buckets)
      println(s"created table at $tableDir with $buckets buckets")

    case "ingest" :: tableDir :: feedDir :: rest =>
      val perBatch = rest.headOption.map(_.toInt).getOrElse(4)
      val salt = rest.drop(1).headOption.map(_.toInt).getOrElse(16)
      val spark = session()
      spark.sparkContext.setLogLevel("WARN")
      val table = LakeTable.load(tableDir)
      val before = table.currentSnapshot()
      val t0 = System.nanoTime()
      val snaps = CdcIngest.run(spark, table, feedDir,
        IngestConfig(numBuckets = before.numBuckets, saltBuckets = salt, segmentsPerBatch = perBatch))
      val secs = (System.nanoTime() - t0) / 1e9
      if (snaps.isEmpty)
        println(s"nothing to do: table already at segment ${before.watermarkSegment}")
      else {
        val events = snaps.map(_.metrics.get("events").map(_.toString.toDouble.toLong).getOrElse(0L)).sum
        println(f"applied ${snaps.size} batches, $events events in $secs%.2f s " +
          f"(${events / secs}%.0f events/s); table now at v${snaps.last.version}, " +
          s"segment ${snaps.last.watermarkSegment}")
      }
      spark.stop()

    // Structured Streaming front-end: drains the WAL dir via availableNow
    // foreachBatch MERGE (resumable through the checkpoint dir)
    case "stream" :: tableDir :: feedDir :: rest =>
      val ckpt = rest.headOption
      val spark = session()
      spark.sparkContext.setLogLevel("WARN")
      val table = graft.lake.LakeTable.load(tableDir)
      val cfg = IngestConfig(numBuckets = table.currentSnapshot().numBuckets)
      val n = graft.ingest.StreamingIngest.run(spark, table, feedDir, cfg,
        checkpointDir = ckpt)
      val snap = table.currentSnapshot()
      println(s"streamed $n micro-batches; table now at v${snap.version}, " +
        s"segment ${snap.watermarkSegment}")
      spark.stop()

    // multi-format snapshot export + run manifest (reference K1-K3/K7 parity)
    case "export" :: tableDir :: outDir :: rest =>
      import graft.lake.Exporter
      val fmt = rest.headOption.getOrElse("json") match {
        case "csv" => Exporter.Csv
        case "parquet" => Exporter.Parquet
        case _ => Exporter.Json
      }
      val spark = session()
      spark.sparkContext.setLogLevel("WARN")
      val table = LakeTable.load(tableDir)
      val r = Exporter.export(spark, table.read(spark), outDir, fmt, "pages")
      val manifest = Exporter.writeManifest(outDir, Seq(r))
      println(s"exported ${r.rows} rows to ${r.path} in ${r.durationMs} ms; manifest: $manifest")
      spark.stop()

    case "show" :: tableDir :: Nil =>
      val spark = session()
      spark.sparkContext.setLogLevel("WARN")
      val table = LakeTable.load(tableDir)
      val snap = table.currentSnapshot()
      println(s"snapshot v${snap.version} batch=${snap.batchId} " +
        s"watermark=${snap.watermarkSegment} files=${snap.files.size} " +
        s"schema=${snap.schema.fieldNames.mkString(",")}")
      val df = table.read(spark)
      println(s"live rows: ${df.count()}")
      df.orderBy("url").show(5, 60)
      println("-- lineage (last 5) --")
      table.lineage(spark).orderBy(org.apache.spark.sql.functions.desc("snapshot_version")).show(5)
      println("-- metrics --")
      table.metrics(spark).show(20)
      spark.stop()

    case _ => usage()
  }
}
