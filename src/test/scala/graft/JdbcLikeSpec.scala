package graft

import org.apache.spark.sql.functions._

import graft.config.{FeedDef, Registry}
import graft.sources.MockJdbc

/** JDBC-shaped surface (S2/S5/K5) against the mock implementation — the
  * reference's own fallback (db2_to_json.py:163-178); the real SparkJdbc
  * wiring is documented-absent (no endpoint/driver in this sandbox). */
class JdbcLikeSpec extends SparkTestBase {

  test("scan round-trips a table; probe reflects reachability (S2/S5)") {
    import spark.implicits._
    val src = new MockJdbc(Map(
      "customers" -> Seq((1L, "ada"), (2L, "bob")).toDF("id", "name")))
    assert(src.probe(spark))
    val df = src.scan(spark, "customers")
    assert(df.count() == 2 && df.columns.toSeq == Seq("id", "name"))
    src.reachable = false
    assert(!src.probe(spark))
    intercept[IllegalStateException] {
      src.write(df, "customers_copy")
    }
    intercept[IllegalArgumentException] {
      src.scan(spark, "nope")
    }
  }

  test("writeAll lands tables parents-first per registry dependency order (K5)") {
    import spark.implicits._
    // child -> parent FK chain: orders depends on customers, items on orders
    val reg = Registry(Seq(
      FeedDef("items", "", "", dependsOn = Seq("orders")),
      FeedDef("customers", "", ""),
      FeedDef("orders", "", "", dependsOn = Seq("customers"))))
    val sink = new MockJdbc()
    val items = Seq((10L, 100L)).toDF("item_id", "order_id")
    val orders = Seq((100L, 1L)).toDF("order_id", "customer_id")
    val customers = Seq((1L, "ada")).toDF("id", "name")
    val order = sink.writeAll(reg,
      Map("items" -> items, "orders" -> orders, "customers" -> customers))
    assert(order == Seq("customers", "orders", "items"))
    assert(sink.written == Seq("customers", "orders", "items"))
    assert(sink.scan(spark, "orders").count() == 1)
  }

  test("write appends by name (batched sink semantics)") {
    import spark.implicits._
    val sink = new MockJdbc()
    sink.write(Seq((1L, "a")).toDF("id", "v"), "t")
    sink.write(Seq((2L, "b")).toDF("id", "v"), "t")
    val got = sink.scan(spark, "t").orderBy(col("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "b")))
  }
}
