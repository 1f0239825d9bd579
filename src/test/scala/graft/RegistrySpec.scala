package graft

import java.nio.file.{Files, Paths}

import graft.config.{FeedDef, Registry}
import graft.feed.{FeedGen, FeedSpec}

/** Config registry + dependency-ordered multi-table apply
  * (settings.py:270-348 / db2_to_json.py:58-72 capability). */
class RegistrySpec extends SparkTestBase {

  test("applyOrder: parents first, stable tie-break, cycle detected") {
    def fd(n: String, deps: String*) =
      FeedDef(n, s"/t/$n", s"/f/$n", dependsOn = deps)
    val reg = Registry(Seq(
      fd("child_b", "parent"), fd("child_a", "parent"),
      fd("parent"), fd("grandchild", "child_a", "child_b")))
    assert(reg.applyOrder.map(_.name) ==
      Seq("parent", "child_a", "child_b", "grandchild"))
    val cyc = Registry(Seq(fd("a", "b"), fd("b", "a")))
    val ex = intercept[IllegalArgumentException](cyc.applyOrder)
    assert(ex.getMessage.contains("cycle"))
  }

  test("validate flags duplicates, unknown deps, missing feed dirs") {
    val reg = Registry(Seq(
      FeedDef("x", "/t/x", "/nonexistent/feed"),
      FeedDef("x", "/t/x2", "/nonexistent/feed2", dependsOn = Seq("ghost"))))
    val (ok, errors) = reg.validate()
    assert(!ok)
    assert(errors.exists(_.contains("duplicate")))
    assert(errors.exists(_.contains("ghost")))
    assert(errors.count(_.contains("feed dir not found")) == 2)
  }

  test("json round-trip: fromJson parses all fields") {
    val json =
      """{"feeds": [
        |  {"name": "parent", "tableDir": "/t/p", "feedDir": "/f/p",
        |   "numBuckets": 8, "expectedCount": 150, "tolerancePct": 2.5,
        |   "description": "ref table"},
        |  {"name": "child", "tableDir": "/t/c", "feedDir": "/f/c",
        |   "dependsOn": ["parent"], "segmentsPerBatch": 2}
        |]}""".stripMargin
    val reg = Registry.fromJson(json)
    assert(reg.feeds.size == 2)
    val p = reg.byName("parent")
    assert(p.numBuckets == 8 && p.expectedCount.contains(150L) &&
      p.tolerancePct == 2.5 && p.description == "ref table")
    assert(reg.byName("child").dependsOn == Seq("parent"))
    intercept[IllegalArgumentException](Registry.fromJson("""{"feeds":[{"name":"x"}]}"""))
  }

  test("e2e: two dependent tables applied in order with count validation") {
    val work = tmpDir("regrun")
    val parentSpec = FeedSpec(seed = 61L, numEvents = 800, numUrls = 120, eventsPerSegment = 200)
    val childSpec = FeedSpec(seed = 67L, numEvents = 600, numUrls = 90, eventsPerSegment = 200)
    FeedGen.writeSegments(parentSpec, s"$work/feed-parent")
    FeedGen.writeSegments(childSpec, s"$work/feed-child")
    val expectedParent = FeedGen.expectedState(FeedGen.events(parentSpec)).size.toLong
    val expectedChild = FeedGen.expectedState(FeedGen.events(childSpec)).size.toLong
    val reg = Registry(Seq(
      FeedDef("child", s"$work/tbl-child", s"$work/feed-child",
        numBuckets = 8, dependsOn = Seq("parent"),
        expectedCount = Some(expectedChild)),
      FeedDef("parent", s"$work/tbl-parent", s"$work/feed-parent",
        numBuckets = 8, expectedCount = Some(expectedParent))))
    assert(reg.validate()._1)
    val manifest = s"$work/run-manifest.json"
    val results = Registry.runAll(spark, reg, manifestPath = Some(manifest))
    assert(results.map(_.name) == Seq("parent", "child"), "parents must apply first")
    assert(results.forall(_.passed))
    assert(results.forall(_.countValidation.exists(_.passed)))
    val m = new String(Files.readAllBytes(Paths.get(manifest)), "UTF-8")
    assert(m.contains("\"passed\" : true") && m.contains("count_validation"))
    // re-run: resumable no-op, counts still validate
    val again = Registry.runAll(spark, reg)
    assert(again.forall(r => r.batches == 0 && r.passed))
    // a wrong expected count fails the run
    val bad = Registry(Seq(reg.feeds.last.copy(expectedCount = Some(expectedParent + 5))))
    assert(!Registry.runAll(spark, bad).forall(_.passed))
  }
}
