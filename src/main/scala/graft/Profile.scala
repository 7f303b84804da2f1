package graft

import org.apache.spark.sql.SparkSession

/** Dev profiler: times named queries (3 runs each) on SPARK_GRAFT_SF_DIR
  * with the same session config as Bench; SPARK_GRAFT_EXPLAIN=1 also
  * prints the formatted physical plan. Not part of the driver contract —
  * this is the local feedback loop for plan iteration.
  *
  * Per-query scheduler metrics (jobs / stages / tasks / task time /
  * shuffle bytes, from a SparkListener) separate the two cost regimes
  * the optimization guide cares about: a query whose wall time is much
  * larger than its summed task time is *scheduling/driver-bound* (too
  * many jobs or stages — collect-driven loops, per-iteration
  * checkpoints), while one whose task time dominates is genuinely
  * *compute/shuffle-bound* and worth plan surgery.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val explain = sys.env.contains("SPARK_GRAFT_EXPLAIN")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // listener counters — reset per measured run, read after waiting
    // for the listener bus to drain
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val shufR = new java.util.concurrent.atomic.AtomicLong
    val shufW = new java.util.concurrent.atomic.AtomicLong
    val stageDump = sys.env.contains("SPARK_GRAFT_STAGES")
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          if (stageDump)
            println(s"[job] start id=${e.jobId} t=${e.time % 1000000}")
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          if (stageDump)
            println(s"[job] end   id=${e.jobId} t=${e.time % 1000000}")
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(e.stageInfo.numTasks.toLong)
          val m = e.stageInfo.taskMetrics
          if (m != null) {
            taskMs.addAndGet(m.executorRunTime)
            shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            if (stageDump)
              println(f"[stage] id=${e.stageInfo.stageId}%4d " +
                f"tasks=${e.stageInfo.numTasks}%3d " +
                f"runMs=${m.executorRunTime}%7d " +
                f"cpuMs=${m.executorCpuTime / 1000000}%7d " +
                f"gcMs=${m.jvmGCTime}%6d " +
                f"inMB=${m.inputMetrics.bytesRead / 1e6}%7.1f " +
                f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%7.1f " +
                f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.1f  " +
                e.stageInfo.name.take(90))
          }
        }
      })
    def resetCounters(): Unit = {
      // listener bus drain is asynchronous and its waitUntilEmpty is
      // private[spark]; a short sleep suffices for a dev profiler
      Thread.sleep(300)
      Seq(jobs, stages, tasks, taskMs, shufR, shufW).foreach(_.set(0L))
    }

    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    run(SparkEntry.queries("q_pricing_summary")(spark, sfDir))

    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      val times = (1 to 3).map { i =>
        if (i == 3) resetCounters() // metrics from the last (warmed) run
        val t0 = System.nanoTime()
        run(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      Thread.sleep(300)
      println(f"[profile] $name%-28s min=${times.min}%7.3f  " +
        f"runs=${times.map(t => f"$t%.3f").mkString(",")}  " +
        f"jobs=${jobs.get}%3d stages=${stages.get}%3d tasks=${tasks.get}%4d " +
        f"taskSec=${taskMs.get / 1e3}%7.2f " +
        f"shufMB=${(shufR.get + shufW.get) / 1e6}%8.2f")
    }
    spark.stop()
  }
}
