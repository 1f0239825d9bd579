package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev-only measurement harness for the OPTIMIZATION rounds (guide §1):
  * times the SparkEntry query corpus with the SAME session config and
  * count() methodology as [[Bench]]'s query section, but adds
  *   - SPARK_GRAFT_ONLY=q1,q2     restrict to named queries
  *   - SPARK_GRAFT_EXTRA_REPS=k   run each query k times (all samples shown)
  *   - SPARK_GRAFT_PLAN_DIR=dir   dump .explain("formatted") per query
  *     (suffix via SPARK_GRAFT_PLAN_TAG, default "before")
  * Artifacts go to stderr/plan files only — BENCH.md / BENCH_LATEST.json are
  * never touched. The driver's bench remains [[Bench]], unchanged.
  */
object BenchExtra {

  private val Scratch: String = {
    val shm = Paths.get("/dev/shm")
    val base = if (Files.isWritable(shm)) shm else Paths.get("/tmp")
    Files.createDirectories(base.resolve("graft-bench")).toString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_EXTRA_REPS", "1").toInt
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val planTag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.local.dir", Scratch)
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    if (sys.env.get("SPARK_GRAFT_TRACE").contains("1"))
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val wall = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3
          val m = i.taskMetrics
          System.err.println(f"[stage] id=${i.stageId}%-4d tasks=${i.numTasks}%-4d " +
            f"wall=${wall}%7.2fs run=${m.executorRunTime / 1e3}%8.2fs " +
            f"cpu=${m.executorCpuTime / 1e9}%8.2fs " +
            f"desc=${i.name.take(60)}")
        }
      })
    try {
      // same warm-up as Bench: touch one input so timings measure compute
      SparkEntry.queries.get("q01_pricing_summary").foreach(f => f(s, sfDir).count())
      val names = SparkEntry.queries.keys.toSeq.sorted
        .filter(n => only.forall(_.contains(n)))
      var total = 0.0
      names.foreach { name =>
        val fn = SparkEntry.queries(name)
        val samples = (1 to reps).map { _ =>
          s.sparkContext.setJobDescription(name)
          val t0 = System.nanoTime()
          try fn(s, sfDir).count()
          catch { case e: Throwable => System.err.println(s"[extra] $name: $e") }
          (System.nanoTime() - t0) / 1e9
        }
        s.sparkContext.setJobDescription(null)
        total += samples.min
        System.err.println(f"[extra] $name%-24s min=${samples.min}%7.3f s  " +
          samples.map(v => f"$v%.3f").mkString("[", ", ", "]"))
        planDir.foreach { d =>
          try {
            val df = fn(s, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.createDirectories(Paths.get(d))
            Files.writeString(Paths.get(d, s"${name}_$planTag.txt"), txt)
          } catch { case e: Throwable =>
            System.err.println(s"[extra] plan dump $name failed: $e")
          }
        }
      }
      System.err.println(f"[extra] TOTAL (min over $reps reps) = $total%.2f s over ${names.size} queries")
    } finally s.stop()
  }
}
