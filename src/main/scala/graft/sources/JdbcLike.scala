package graft.sources

import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.Registry

/** JDBC-shaped source/sink surface — capability parity with the
  * reference's database family (SURVEY.md §2 S2/S5/K5):
  *  - S2 whole-table scan with a fetch-size hint
  *    (db2/scripts/db2_to_json.py:139-160, fetchsize=10000);
  *  - S5 connectivity probe (db2_to_postgres.py:326-340, SELECT 1);
  *  - K5 batched table write in FK-dependency order
  *    (db2_to_postgres.py:202-222, batchsize=10000, parents first).
  *
  * The trait is the seam the engine codes against; two implementations:
  *  - [[SparkJdbc]] — the real `spark.read/write.format("jdbc")` wiring.
  *    It CANNOT run in this sandbox (zero egress, no database endpoint, no
  *    JDBC driver jars in /opt/spark/jars) and is therefore
  *    documented-absent from the test matrix; the option plumbing is the
  *    complete production shape.
  *  - [[MockJdbc]] — the reference's own fallback shape
  *    (db2_to_json.py:163-178 mock mode): an in-memory table map, used by
  *    tests and local runs.
  */
trait JdbcLikeSource {

  /** S5: cheap connectivity check; never throws. */
  def probe(spark: SparkSession): Boolean

  /** S2: whole-table scan. */
  def scan(spark: SparkSession, table: String): DataFrame

  /** K5: batched write of one table. */
  def write(df: DataFrame, table: String): Unit

  /** K5 ordering half: write several tables parents-first, driven by the
    * registry's Kahn dependency order (Registry.applyOrder) — a child row
    * must never land before the parent rows its FKs reference. Returns the
    * table names in the order written. */
  def writeAll(reg: Registry, tables: Map[String, DataFrame]): Seq[String] =
    reg.applyOrder.map(_.name).filter(tables.contains).map { name =>
      write(tables(name), name); name
    }
}

/** Production JDBC wiring (documented-absent from tests — see trait doc).
  * `props` carries url/user/password/driver exactly as Spark's JDBC source
  * expects them. */
final case class SparkJdbc(
    url: String,
    props: Map[String, String] = Map.empty,
    fetchSize: Int = 10000,
    batchSize: Int = 10000) extends JdbcLikeSource {

  private def configure[T](rw: T, opt: (T, String, String) => T): T =
    props.foldLeft(opt(rw, "url", url)) { case (acc, (k, v)) => opt(acc, k, v) }

  override def scan(spark: SparkSession, table: String): DataFrame =
    configure[org.apache.spark.sql.DataFrameReader](
      spark.read.format("jdbc"), (r, k, v) => r.option(k, v))
      .option("dbtable", table)
      .option("fetchsize", fetchSize.toString)
      .load()

  override def probe(spark: SparkSession): Boolean =
    Try(scan(spark, "(SELECT 1 AS ok) AS probe").count() == 1L).getOrElse(false)

  override def write(df: DataFrame, table: String): Unit =
    configure[org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row]](
      df.write.format("jdbc"), (w, k, v) => w.option(k, v))
      .option("dbtable", table)
      .option("batchsize", batchSize.toString)
      .mode("append")
      .save()
}

/** In-memory mock with the same surface — the reference's mock mode
  * (db2_to_json.py:163-178). Thread-unsafe by design (test/dev helper). */
final class MockJdbc(
    initial: Map[String, DataFrame] = Map.empty,
    var reachable: Boolean = true) extends JdbcLikeSource {

  private val tables = scala.collection.mutable.Map.empty[String, DataFrame] ++ initial
  private val writeLog = scala.collection.mutable.ArrayBuffer.empty[String]

  override def probe(spark: SparkSession): Boolean = reachable

  override def scan(spark: SparkSession, table: String): DataFrame =
    tables.getOrElse(table,
      throw new IllegalArgumentException(s"mock: no such table $table"))

  override def write(df: DataFrame, table: String): Unit = {
    if (!reachable) throw new IllegalStateException("mock: unreachable")
    tables(table) = tables.get(table).map(_.unionByName(df)).getOrElse(df)
    writeLog += table
  }

  /** Tables written, in write order — lets tests assert FK ordering. */
  def written: Seq[String] = writeLog.toSeq
}
