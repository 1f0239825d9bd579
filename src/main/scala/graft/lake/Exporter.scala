package graft.lake

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-format export of a lake snapshot — capability parity with the
  * reference's sink matrix (SURVEY.md §2.2 K1-K3 JSON/parquet/CSV writes,
  * migrator.py:456-463, and the K7 per-run JSON manifest,
  * migrator.py:465-482). The reference `coalesce(1)`s everything; ours
  * keeps partitioned output by default (scale) with single-file opt-in. */
object Exporter {

  sealed trait Format { def name: String }
  case object Json extends Format { val name = "json" }
  case object Csv extends Format { val name = "csv" }
  case object Parquet extends Format { val name = "parquet" }

  final case class ExportResult(
      dataset: String, format: String, path: String, rows: Long, durationMs: Long)

  def export(
      spark: SparkSession,
      df: DataFrame,
      outDir: String,
      format: Format,
      datasetName: String = "dataset",
      singleFile: Boolean = false): ExportResult = {
    val t0 = System.nanoTime()
    // binary columns are not JSON/CSV-representable — hex-encode them
    // (the reference's JSON sink relies on Cobrix pre-decoding everything)
    val exportable = format match {
      case Parquet => df
      case _ =>
        df.schema.fields.foldLeft(df) { (d, f) =>
          if (f.dataType == org.apache.spark.sql.types.BinaryType)
            d.withColumn(f.name, org.apache.spark.sql.functions.hex(
              org.apache.spark.sql.functions.col(f.name)))
          else d
        }
    }
    val shaped = if (singleFile) exportable.coalesce(1) else exportable
    val path = s"$outDir/$datasetName.${format.name}"
    val writer = shaped.write.mode("overwrite")
    format match {
      case Json    => writer.json(path)
      case Csv     => writer.option("header", "true").csv(path)
      case Parquet => writer.parquet(path)
    }
    val rows = spark.read.format(format.name)
      .option("header", "true").load(path).count()
    ExportResult(datasetName, format.name, path, rows,
      (System.nanoTime() - t0) / 1000000L)
  }

  /** Per-run JSON manifest (K7 parity: per-dataset status/count/duration). */
  def writeManifest(outDir: String, results: Seq[ExportResult]): String = {
    val node = LakeTable.Mapper.createObjectNode()
    node.put("datasets", results.size)
    node.put("total_rows", results.map(_.rows).sum)
    val arr = node.putArray("exports")
    results.foreach { r =>
      val e = arr.addObject()
      e.put("dataset", r.dataset); e.put("format", r.format)
      e.put("path", r.path); e.put("rows", r.rows)
      e.put("duration_ms", r.durationMs); e.put("status", "success")
    }
    val json = LakeTable.Mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node)
    val p = Paths.get(outDir, "export_manifest.json")
    Files.createDirectories(p.getParent)
    Files.writeString(p, json)
    p.toString
  }
}
