package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained materialized aggregate over a [[LakeTable]] —
  * the downstream-consumer half of the change-data-feed: a per-host rollup
  * (live pages, total content bytes — the Common-Crawl-shaped report a web
  * corpus gets sliced by) that is seeded ONCE by a full aggregation and
  * then kept current from [[LakeTable.changeDeltas]] pre/post-images alone,
  * so a refresh costs the CHANGE volume since the last refresh, never a
  * table rescan. Only invertible aggregates (count, sum) are maintained;
  * max-style aggregates have no delta inverse under deletes and belong on
  * the recompute path (`cdc_domain_stats`).
  *
  * Durability contract (north rule: resumable from checkpoint): the MV
  * root holds one parquet directory per applied table version
  * (`v{N}/part-*.parquet`) plus a `state.json` naming the applied version.
  * A refresh writes the NEW version directory completely, then flips
  * `state.json` by atomic rename, then deletes the old directory — a crash
  * at any point leaves a consistent MV at one version or the other, and a
  * replayed refresh is idempotent (same delta fold onto the same base).
  *
  * Reference analog: the reference re-runs its aggregation reports from
  * scratch per migration run (`data_validator.py` summary queries); this
  * is the incremental, checkpointed form those reports need at 10^10-row
  * scale.
  */
object MaterializedView {

  /** Aggregate schema: host, n_pages, total_bytes. */
  private def hostOf(c: Column): Column = element_at(split(c, "/"), 3)

  private def bytesCol(df: DataFrame, name: String): Column =
    if (df.columns.contains(name)) coalesce(col(name), lit(0L)) else lit(0L)

  private def statePath(mvRoot: String): Path = Paths.get(mvRoot, "state.json")

  private def dataDir(mvRoot: String, version: Long): Path =
    Paths.get(mvRoot, f"v$version%012d")

  /** Table version the MV currently reflects, if seeded. */
  def appliedVersion(mvRoot: String): Option[Long] = {
    val p = statePath(mvRoot)
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), "UTF-8")
      "\"tableVersion\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toLong)
    }
  }

  /** Current MV rows (host, n_pages, total_bytes). */
  def read(spark: SparkSession, mvRoot: String): DataFrame = {
    val v = appliedVersion(mvRoot).getOrElse(
      throw new IllegalStateException(s"no materialized view at $mvRoot — seed first"))
    spark.read.parquet(dataDir(mvRoot, v).toString)
  }

  /** Full aggregation of the table's state AS OF `version` (default:
    * current) — the one table scan the MV ever takes. */
  def seed(spark: SparkSession, table: LakeTable, mvRoot: String,
      version: Option[Long] = None): Long = {
    val v = version.getOrElse(table.currentSnapshot().version)
    val base = table.readAsOf(spark, v)
    val mv = base.groupBy(hostOf(col("url")).as("host"))
      .agg(count(lit(1)).as("n_pages"),
        sum(bytesCol(base, "content_len")).as("total_bytes"))
    commitMv(mv, mvRoot, v, previous = None)
    v
  }

  /** Roll the MV forward from its applied version to `toVersion` (default:
    * current) using only the change-data-feed — I contributes +after, D
    * contributes −before, U contributes after−before. No-op when already
    * current. Returns (fromVersion, toVersion). */
  def refresh(spark: SparkSession, table: LakeTable, mvRoot: String,
      toVersion: Option[Long] = None): (Long, Long) = {
    val from = appliedVersion(mvRoot).getOrElse(
      throw new IllegalStateException(s"no materialized view at $mvRoot — seed first"))
    val to = toVersion.getOrElse(table.currentSnapshot().version)
    require(to >= from, s"cannot refresh backwards: applied v$from, asked v$to")
    if (to == from) return (from, to)
    val d = table.changeDeltas(spark, from, to)
    val after = bytesCol(d, "content_len_after")
    val before = bytesCol(d, "content_len_before")
    val delta = d.select(hostOf(col("url")).as("host"),
        when(col("change_op") === "I", 1L)
          .when(col("change_op") === "D", -1L).otherwise(0L).as("dp"),
        (when(col("change_op") =!= "D", after).otherwise(lit(0L))
          - when(col("change_op") =!= "I", before).otherwise(lit(0L))).as("db"))
      .groupBy("host").agg(sum("dp").as("dp"), sum("db").as("db"))
    val next = read(spark, mvRoot).join(delta, Seq("host"), "full_outer")
      .select(col("host"),
        (coalesce(col("n_pages"), lit(0L)) + coalesce(col("dp"), lit(0L))).as("n_pages"),
        (coalesce(col("total_bytes"), lit(0L)) + coalesce(col("db"), lit(0L))).as("total_bytes"))
      .filter(col("n_pages") > 0)
    commitMv(next, mvRoot, to, previous = Some(from))
    (from, to)
  }

  /** Write the MV parquet for `version`, flip state.json atomically, then
    * drop the superseded version directory. */
  private def commitMv(mv: DataFrame, mvRoot: String, version: Long,
      previous: Option[Long]): Unit = {
    Files.createDirectories(Paths.get(mvRoot))
    val dest = dataDir(mvRoot, version)
    // overwrite-safe: a crashed earlier attempt at this version is replaced
    mv.write.mode("overwrite").parquet(dest.toString)
    val tmp = Paths.get(mvRoot, s".state-${java.util.UUID.randomUUID()}.json")
    Files.write(tmp,
      s"""{"tableVersion": $version}""".getBytes("UTF-8"))
    Files.move(tmp, statePath(mvRoot), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    previous.filter(_ != version).foreach { old =>
      val dir = dataDir(mvRoot, old)
      if (Files.exists(dir)) {
        val st = Files.list(dir)
        try st.iterator().forEachRemaining(p => Files.deleteIfExists(p))
        finally st.close()
        Files.deleteIfExists(dir)
      }
    }
  }
}
