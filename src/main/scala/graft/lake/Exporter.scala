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
      dataset: String, format: String, path: String, rows: Long, durationMs: Long,
      checksums: Seq[FileChecksum] = Seq.empty, dirSha256: Option[String] = None)

  /** Content digest of one written output file (file_utils.py:46-87 parity:
    * the reference records per-file and per-directory md5/sha256). */
  final case class FileChecksum(name: String, bytes: Long, md5: String, sha256: String)

  def export(
      spark: SparkSession,
      df: DataFrame,
      outDir: String,
      format: Format,
      datasetName: String = "dataset",
      singleFile: Boolean = false,
      withChecksums: Boolean = false): ExportResult = {
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
    // row count via observe(): collected as a side effect of the write
    // itself — no second scan of the sink (and no CSV/JSON re-inference)
    val obs = new org.apache.spark.sql.Observation()
    val observed = shaped.observe(obs,
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
    val path = s"$outDir/$datasetName.${format.name}"
    val writer = observed.write.mode("overwrite")
    format match {
      case Json    => writer.json(path)
      case Csv     => writer.option("header", "true").csv(path)
      case Parquet => writer.parquet(path)
    }
    val rows = obs.get("rows").asInstanceOf[Long]
    val sums = if (withChecksums) fileChecksums(spark, path) else Seq.empty
    ExportResult(datasetName, format.name, path, rows,
      (System.nanoTime() - t0) / 1000000L, sums,
      if (withChecksums) Some(dirDigest(sums)) else None)
  }

  /** Directory-level aggregate digest (CAPABILITY parity with
    * file_utils.py:66-87 `get_directory_checksum`, deliberately NOT
    * byte-compatible): the reference hashes raw bytes of all files in
    * sorted-filename walk order; this digest hashes the SORTED per-file
    * content sha256s of part files only, making it order- AND
    * name-independent — required here because Spark part-file names carry
    * per-run UUIDs, so the reference's name-ordered fold would change
    * across re-exports of identical content. Stable across re-exports,
    * changes when any part file's bytes change; never compare it against a
    * reference-produced digest. */
  def dirDigest(sums: Seq[FileChecksum]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    sums.map(_.sha256).sorted.foreach(h =>
      md.update(h.getBytes(java.nio.charset.StandardCharsets.US_ASCII)))
    md.digest().map("%02x".format(_)).mkString
  }

  /** REFERENCE-COMPATIBLE directory digest (file_utils.py:66-87
    * `get_directory_checksum` byte parity): one sha256 fed the raw bytes
    * of EVERY regular file under `path`, in sorted-relative-filename walk
    * order. Use this mode only when a digest must interoperate with a
    * reference-produced one — it is name-dependent (Spark part files
    * carry per-run UUIDs, so two exports of identical content digest
    * differently) and inherently sequential (byte order is part of the
    * contract), so [[dirDigest]] remains the default. Reads through the
    * Hadoop FS API so any scheme works. */
  def dirDigestNameOrdered(spark: SparkSession, path: String): String = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val files = {
      val it = fs.listFiles(root, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.Path]
      while (it.hasNext) buf += it.next().getPath
      buf.sortBy(p => p.toString.stripPrefix(root.toString))
    }
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val buf = new Array[Byte](1 << 16)
    files.foreach { p =>
      val in = fs.open(p)
      try {
        var n = in.read(buf)
        while (n >= 0) {
          if (n > 0) md.update(buf, 0, n)
          n = in.read(buf)
        }
      } finally in.close()
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Distributed per-file content digests of an output directory: one
    * binaryFile scan, md5 + sha256 per part file (never on the driver — at
    * cluster scale each executor hashes its own files). Opt-in: it is the
    * one case where re-reading the sink is the point. */
  def fileChecksums(spark: SparkSession, path: String): Seq[FileChecksum] = {
    import org.apache.spark.sql.functions._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "part-*")
      .load(path)
      .select(
        regexp_extract(col("path"), "[^/]+$", 0).as("name"),
        col("length"),
        md5(col("content")).as("md5"),
        sha2(col("content"), 256).as("sha256"))
      .collect()
      .map(r => FileChecksum(r.getString(0), r.getLong(1),
        r.getString(2), r.getString(3)))
      .sortBy(_.name).toSeq
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
      r.dirSha256.foreach(d => e.put("dir_sha256", d))
      if (r.checksums.nonEmpty) {
        val fs = e.putArray("files")
        r.checksums.foreach { c =>
          val fn = fs.addObject()
          fn.put("name", c.name); fn.put("bytes", c.bytes)
          fn.put("md5", c.md5); fn.put("sha256", c.sha256)
        }
      }
    }
    val json = LakeTable.Mapper.writerWithDefaultPrettyPrinter().writeValueAsString(node)
    val p = Paths.get(outDir, "export_manifest.json")
    Files.createDirectories(p.getParent)
    Files.writeString(p, json)
    p.toString
  }
}
