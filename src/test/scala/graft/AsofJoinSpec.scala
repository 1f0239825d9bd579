package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.AsofJoin

/** Property-gates [[graft.ops.AsofJoin]] against a brute-force in-JVM
  * oracle on seeded random data: per (key, probe_ts), the matched payload
  * must be the right row with the greatest (ts, seq) at or before the
  * probe — including the ts == probe_ts inclusive-tie case, keys with no
  * history, probes before the first event, and duplicate event
  * timestamps distinguished only by the tie-break. */
class AsofJoinSpec extends SparkTestBase {
  import AsofJoinSpec._

  private def t(ms: Long) = new Timestamp(ms)

  test("asof join equals the brute-force oracle on seeded random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260817L)
    val keys = (0 until 12).map(i => s"k$i")
    // duplicate timestamps on purpose: ts drawn from a small grid
    val evs = (0 until 600).map { i =>
      Ev(keys(rnd.nextInt(keys.size)), t(rnd.nextInt(50) * 1000L), i.toLong,
        s"v$i")
    }
    // probes on and off the grid; 2 keys get no history at all
    val probes = (0 until 150).map { i =>
      Probe(s"k${rnd.nextInt(14)}", t(rnd.nextInt(60) * 500L), i)
    }

    val got = AsofJoin.lastBefore(
        probes.toDF(), evs.toDF(), keys = Seq("k"),
        leftTs = "pts", rightTs = "ts", tieBreak = Seq("seq"),
        payload = Seq("seq", "v"))
      .select(col("k"), col("pts"), col("tag"),
        col("asof.seq").as("mseq"), col("asof.v").as("mv"))
      .collect()
      .map(r => (r.getInt(2), (Option(r.get(3)), Option(r.get(4)))))
      .toMap

    val byKey = evs.groupBy(_.k)
    probes.foreach { p =>
      val want = byKey.getOrElse(p.k, Nil)
        .filter(!_.ts.after(p.pts))
        .sortBy(e => (e.ts.getTime, e.seq))
        .lastOption
      val (gSeq, gV) = got(p.tag)
      assert(gSeq == want.map(_.seq) && gV == want.map(_.v),
        s"probe ${p.k}@${p.pts}: got ($gSeq,$gV) want $want")
    }
    assert(got.size == probes.size, "asof join must preserve every left row")
  }

  test("all left columns are carried through and payload struct is named") {
    import spark.implicits._
    val evs = Seq(Ev("a", t(1000), 1L, "x")).toDF()
    val probes = Seq(Probe("a", t(2000), 7)).toDF()
      .withColumn("extra", lit("carried"))
    val out = AsofJoin.lastBefore(probes, evs, Seq("k"), "pts", "ts",
      Seq("seq"), Seq("v"), asCol = "state")
    assert(out.columns.toSeq == Seq("k", "pts", "tag", "extra", "state"))
    val row = out.collect().head
    assert(row.getAs[String]("extra") == "carried")
    assert(row.getAs[org.apache.spark.sql.Row]("state").getAs[String]("v") == "x")
  }
}

object AsofJoinSpec {
  // top-level (not spec-nested): encoders for inner case classes need the
  // outer instance and fail under Janino codegen
  final case class Ev(k: String, ts: Timestamp, seq: Long, v: String)
  final case class Probe(k: String, pts: Timestamp, tag: Int)
}
