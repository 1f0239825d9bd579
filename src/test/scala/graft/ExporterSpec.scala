package graft

import graft.feed.{FeedGen, FeedSpec}
import graft.ingest.CdcIngest
import graft.ingest.CdcIngest.IngestConfig
import graft.lake.{Exporter, LakeTable}

/** Multi-format export sinks + run manifest (K1-K3/K7 parity). */
class ExporterSpec extends SparkTestBase {

  private lazy val table: LakeTable = {
    val spec = FeedSpec(seed = 43L, numEvents = 1000, numUrls = 150, eventsPerSegment = 500)
    val feed = tmpDir("expfeed")
    FeedGen.writeSegments(spec, feed)
    val t = LakeTable.create(tmpDir("exptbl"), CdcIngest.PagesSchemaV1, 8)
    CdcIngest.run(spark, t, feed, IngestConfig(numBuckets = 8))
    t
  }

  test("exports a snapshot to json, csv and parquet with identical row counts") {
    val out = tmpDir("expout")
    val df = table.read(spark)
    val n = df.count()
    val results = Seq(Exporter.Json, Exporter.Csv, Exporter.Parquet).map { f =>
      Exporter.export(spark, df, out, f, "pages")
    }
    assert(results.map(_.rows).toSet == Set(n))
    // parquet round-trips the binary html; json/csv hex-encode it
    val pq = spark.read.parquet(s"$out/pages.parquet")
    assert(pq.schema("html").dataType == org.apache.spark.sql.types.BinaryType)
    val js = spark.read.json(s"$out/pages.json")
    assert(js.schema("html").dataType == org.apache.spark.sql.types.StringType)
  }

  test("per-file content checksums match an independent local digest") {
    val out = tmpDir("expout3")
    val r = Exporter.export(spark, table.read(spark), out, Exporter.Csv,
      "pages", singleFile = true, withChecksums = true)
    assert(r.checksums.nonEmpty)
    r.checksums.foreach { c =>
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(r.path, c.name))
      def hex(alg: String) = java.security.MessageDigest.getInstance(alg)
        .digest(bytes).map("%02x".format(_)).mkString
      assert(c.bytes == bytes.length)
      assert(c.md5 == hex("MD5") && c.sha256 == hex("SHA-256"))
    }
    val manifest = Exporter.writeManifest(out, Seq(r))
    val json = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(manifest)))
    assert(json.contains("\"sha256\""))
  }

  test("dir digest: stable across re-exports, changes when a part file changes") {
    val df = table.read(spark)
    val r1 = Exporter.export(spark, df, tmpDir("expdd1"), Exporter.Csv,
      "pages", singleFile = true, withChecksums = true)
    val r2 = Exporter.export(spark, df, tmpDir("expdd2"), Exporter.Csv,
      "pages", singleFile = true, withChecksums = true)
    assert(r1.dirSha256.nonEmpty)
    // same content, different part-file UUIDs → identical aggregate digest
    assert(r1.dirSha256 == r2.dirSha256)
    // corrupt one output file → the digest must change
    val part = new java.io.File(r2.path).listFiles()
      .filter(_.getName.startsWith("part-")).head.toPath
    java.nio.file.Files.writeString(part, "tampered\n",
      java.nio.file.StandardOpenOption.APPEND)
    // drop Hadoop's local-FS checksum sidecar so the re-read sees the
    // tampered bytes instead of failing CRC verification
    java.nio.file.Files.deleteIfExists(
      part.resolveSibling("." + part.getFileName.toString + ".crc"))
    val after = Exporter.dirDigest(Exporter.fileChecksums(spark, r2.path))
    assert(Some(after) != r1.dirSha256)
    // and it lands in the manifest
    val manifest = Exporter.writeManifest(tmpDir("expddm"), Seq(r1))
    val json = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(manifest)))
    assert(json.contains("\"dir_sha256\" : \"" + r1.dirSha256.get + "\""))
  }

  test("name-ordered dir digest matches the reference byte-for-byte semantics") {
    // file_utils.py:66-87: one sha256 over raw bytes of all files in
    // sorted-filename walk order — verified against an independent local
    // reimplementation over the same directory
    val dir = java.nio.file.Paths.get(tmpDir("refdig"))
    java.nio.file.Files.writeString(dir.resolve("b.txt"), "second")
    java.nio.file.Files.writeString(dir.resolve("a.txt"), "first")
    val sub = java.nio.file.Files.createDirectories(dir.resolve("sub"))
    java.nio.file.Files.writeString(sub.resolve("c.txt"), "third")
    val got = Exporter.dirDigestNameOrdered(spark, dir.toString)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    // sorted by path relative to the root: a.txt, b.txt, sub/c.txt
    Seq("first", "second", "third").foreach(s => md.update(s.getBytes("UTF-8")))
    val expected = md.digest().map("%02x".format(_)).mkString
    assert(got == expected)
    // name-DEPENDENT by design: renaming a file changes the byte order
    java.nio.file.Files.move(dir.resolve("a.txt"), dir.resolve("z.txt"))
    assert(Exporter.dirDigestNameOrdered(spark, dir.toString) != expected)
  }

  test("rows with embedded newlines are counted correctly (observe, not re-read)") {
    import spark.implicits._
    val tricky = Seq(("a", "line1\nline2"), ("b", "x,y\n\"q\"")).toDF("k", "v")
    val out = tmpDir("expout4")
    val r = Exporter.export(spark, tricky, out, Exporter.Csv, "tricky")
    assert(r.rows == 2, "embedded newlines must not inflate the manifest count")
  }

  test("single-file export and manifest (K7 parity)") {
    val out = tmpDir("expout2")
    val r = Exporter.export(spark, table.read(spark), out, Exporter.Json,
      "pages", singleFile = true)
    val parts = new java.io.File(r.path).listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.length == 1, "coalesce(1) must yield a single data file")
    val manifest = Exporter.writeManifest(out, Seq(r))
    val json = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(manifest)))
    assert(json.contains("\"datasets\" : 1") && json.contains("\"status\" : \"success\""))
  }
}
