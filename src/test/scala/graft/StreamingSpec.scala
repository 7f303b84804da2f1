package graft

import graft.streaming.EventsPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double, props: String)

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(id: Long, t: String, typ: String, v: Double) =
    Ev(id, Timestamp.valueOf(t), id % 10, typ, v, "{}")

  test("hourly rollup over a memory stream matches the batch result") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Ev]
    val data = Seq(
      ev(1, "2024-01-01 10:05:00", "click", 1.0),
      ev(2, "2024-01-01 10:55:00", "click", 2.0),
      ev(3, "2024-01-01 11:05:00", "click", 4.0),
      ev(4, "2024-01-01 10:20:00", "view", 8.0))
    ms.addData(data: _*)

    val q = EventsPipeline.hourlyRollup(ms.toDF())
      .writeStream.format("memory").queryName("roll")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("roll")
        .select("window_start", "event_type", "n_events", "total_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      val expected = EventsPipeline.hourlyRollup(data.toDF())
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(got == expected)
      assert(got.exists { case (w, t, n, v) =>
        w.toString.startsWith("2024-01-01 10:00:00") && t == "click" &&
          n == 2 && v == 3.0 })
    } finally q.stop()
  }

  test("degenerate event keys roll into a sentinel group instead of wedging the partitioned sink") {
    // the serving/summary tables are PARTITIONED by event_type; a
    // null or empty key reaching the partition-scoped upsert would
    // fail its non-null require and the checkpoint would replay the
    // same microbatch forever — a poison pill. The rollup normalizes
    // such keys to a sentinel group (counted, not dropped) and drops
    // null-ts rows (no window to roll into).
    val dir = TestSpark.tmpDir("streampoison")
    val landing = s"$dir/landing"
    Seq(ev(1, "2024-01-01 10:05:00", null, 1.0),
        ev(2, "2024-01-01 10:15:00", "", 2.0),
        ev(3, "2024-01-01 10:20:00", "click", 4.0),
        Ev(4, null, 4, "click", 8.0, "{}")) // null ts: no window
      .toDF().write.mode("append").parquet(landing)
    val rollup = EventsPipeline.hourlyRollup(
      EventsPipeline.readEventsStream(spark, landing))
    val q = EventsPipeline.maintainedUpsertSink(
      rollup, s"$dir/serving", s"$dir/summary", s"$dir/ckpt").start()
    try q.awaitTermination() finally graft.plans.MaterializedAgg.clear()
    val got = spark.read.parquet(s"$dir/serving")
      .select("event_type", "n_events", "total_value")
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("__unknown__", 2L, 3.0), ("click", 1L, 4.0)), got)
  }

  test("foreachBatch upsert sink: AvailableNow drain, idempotent restart, incremental merge") {
    val dir = TestSpark.tmpDir("stream")
    val landing = s"$dir/landing"
    val target = s"$dir/serving"
    val ckpt = s"$dir/ckpt"

    Seq(ev(1, "2024-01-01 10:05:00", "click", 1.0),
        ev(2, "2024-01-01 10:55:00", "click", 2.0))
      .toDF().write.mode("append").parquet(landing)

    def runOnce(): Unit = {
      val rollup = EventsPipeline.hourlyRollup(
        EventsPipeline.readEventsStream(spark, landing))
      val q = EventsPipeline.upsertSink(rollup, target, ckpt).start()
      q.awaitTermination()
    }

    runOnce()
    val first = spark.read.parquet(target)
      .as[(Timestamp, String, Long, Double)].collect().toSet
    assert(first.map(_._3).sum == 2)

    runOnce() // nothing new: checkpoint makes this a no-op
    assert(spark.read.parquet(target)
      .as[(Timestamp, String, Long, Double)].collect().toSet == first)

    // late-but-within-watermark batch updates the same window (upsert, not append)
    Seq(ev(3, "2024-01-01 10:30:00", "click", 4.0))
      .toDF().write.mode("append").parquet(landing)
    runOnce()
    val after = spark.read.parquet(target)
      .select("event_type", "n_events", "total_value")
      .as[(String, Long, Double)].collect().toSet
    assert(after.exists { case (t, n, v) => t == "click" && n == 3 && v == 7.0 })
  }

  test("maintained sink: mid-microbatch kill inside the serving swap — " +
       "the replayed batch neither drops nor duplicates") {
    // the foreachBatch at-least-once contract (SURVEY §2.9): a batch
    // whose sink died half-written is re-presented from the checkpoint
    // on restart, and the sink must land it EXACTLY once overall. Two
    // kill points: inside the serving upsert's partition swap (sink
    // half written), and inside the summary refresh (serving written,
    // summary not). Both injected via the process-wide fault hook,
    // path-filtered to this test's tables.
    val dir = TestSpark.tmpDir("streamkill")
    val landing = s"$dir/landing"
    val target = s"$dir/serving"
    val summary = s"$dir/summary"

    def runOnce(): Unit = {
      val rollup = EventsPipeline.hourlyRollup(
        EventsPipeline.readEventsStream(spark, landing))
      val q = EventsPipeline.maintainedUpsertSink(
        rollup, target, summary, s"$dir/ckpt").start()
      q.awaitTermination()
    }
    def killAt(path: String): Exception = {
      @volatile var fired = false
      graft.tables.LakehouseTable.globalFaultHook = (p, label) =>
        if (p == path && !fired && label.startsWith("rename:") &&
            label.contains("tombstone")) {
          fired = true
          throw new RuntimeException("injected mid-microbatch kill")
        }
      val e = intercept[Exception](runOnce())
      graft.tables.LakehouseTable.globalFaultHook = null
      assert(fired, "kill hook never fired — no swap rename reached")
      e
    }
    try {
      // batch 1 lands clean
      Seq(ev(1, "2024-01-01 10:05:00", "click", 1.0),
          ev(2, "2024-01-01 10:20:00", "view", 8.0))
        .toDF().write.mode("append").parquet(landing)
      runOnce()

      // batch 2: killed INSIDE the serving table's partition swap
      Seq(ev(3, "2024-01-01 10:30:00", "click", 4.0),
          ev(4, "2024-01-01 11:05:00", "click", 2.0))
        .toDF().write.mode("append").parquet(landing)
      killAt(target)
      // restart from the same checkpoint: offsets were never
      // committed, the batch replays, upsert repairs the interrupted
      // swap and re-applies — exactly-once landing
      runOnce()
      val got = spark.read.parquet(target)
        .select("event_type", "n_events", "total_value")
        .as[(String, Long, Double)].collect().toSet
      assert(got == Set(("click", 2L, 5.0),   // 10:00 window: ev1+ev3
                        ("click", 1L, 2.0),   // 11:00 window: ev4
                        ("view", 1L, 8.0)), got)
      val sum1 = spark.read.parquet(summary)
        .select("event_type", "sum_n_events", "sum_total_value")
        .as[(String, Long, Double)].collect().toSet
      assert(sum1 == Set(("click", 3L, 7.0), ("view", 1L, 8.0)), sum1)

      // batch 3: killed INSIDE the summary refresh (serving already
      // upserted) — the replay re-upserts idempotently and completes
      // the refresh; nothing drops, nothing doubles
      Seq(ev(5, "2024-01-01 11:30:00", "view", 16.0))
        .toDF().write.mode("append").parquet(landing)
      killAt(summary)
      runOnce()
      val got3 = spark.read.parquet(target)
        .select("event_type", "n_events", "total_value")
        .as[(String, Long, Double)].collect().toSet
      assert(got3 == Set(("click", 2L, 5.0), ("click", 1L, 2.0),
                         ("view", 1L, 8.0), ("view", 1L, 16.0)), got3)
      val sum3 = spark.read.parquet(summary)
        .select("event_type", "sum_n_events", "sum_total_value")
        .as[(String, Long, Double)].collect().toSet
      assert(sum3 == Set(("click", 3L, 7.0), ("view", 2L, 24.0)), sum3)
    } finally {
      graft.tables.LakehouseTable.globalFaultHook = null
      graft.plans.MaterializedAgg.clear()
    }
  }

  test("maintained sink keeps the MV summary serving across microbatches") {
    val dir = TestSpark.tmpDir("streammv")
    val landing = s"$dir/landing"
    val target = s"$dir/serving"
    val summary = s"$dir/summary"

    def runOnce(n: Int): Unit = {
      val rollup = EventsPipeline.hourlyRollup(
        EventsPipeline.readEventsStream(spark, landing))
      val q = EventsPipeline.maintainedUpsertSink(
        rollup, target, summary, s"$dir/ckpt$n").start()
      q.awaitTermination()
    }

    graft.plans.MaterializedAgg.attach(spark)
    try {
      // microbatch 1
      Seq(ev(1, "2024-01-01 10:05:00", "click", 1.0),
          ev(2, "2024-01-01 11:55:00", "click", 2.0),
          ev(3, "2024-01-01 10:20:00", "view", 8.0))
        .toDF().write.mode("append").parquet(landing)
      runOnce(1)

      def probe() = spark.read.parquet(target).groupBy($"event_type")
        .agg(sum($"n_events").as("events"), count(lit(1)).as("windows"))
      def scans(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.map(_.toString).mkString(",")
              case _ => ""
            }
        }
      // served from the summary, equal to the direct computation
      assert(scans(probe()).forall(_.contains("summary")), scans(probe()))
      val direct1 = Seq(("click", 2L, 2L), ("view", 1L, 1L))
      assert(probe().orderBy("event_type")
        .as[(String, Long, Long)].collect().toSeq == direct1)

      // microbatch 2: a new window for click and a brand-new type —
      // refresh swaps exactly the touched event_type partitions
      Seq(ev(4, "2024-01-01 12:05:00", "click", 4.0),
          ev(5, "2024-01-01 12:10:00", "purchase", 16.0))
        .toDF().write.mode("append").parquet(landing)
      runOnce(2)
      assert(scans(probe()).forall(_.contains("summary")), scans(probe()))
      assert(probe().orderBy("event_type")
        .as[(String, Long, Long)].collect().toSeq ==
        Seq(("click", 3L, 3L), ("purchase", 1L, 1L), ("view", 1L, 1L)))
      // the untouched type's summary partition survived the second swap
      assert(spark.read.parquet(summary).filter($"event_type" === "view")
        .count() == 1)

      // crash window: a batch whose upsert lands but whose refresh
      // never runs (process died in between) must leave the NEXT
      // covered query on the source scan with fresh values — the
      // mutator's auto-invalidation is what closes this window, not
      // the sink's own discipline
      graft.tables.LakehouseTable(spark, target,
          Seq("window_start", "event_type"), Seq("event_type"))
        .upsert(Seq((java.sql.Timestamp.valueOf("2024-01-01 13:00:00"),
                     "click", 9L, 99.0))
          .toDF("window_start", "event_type", "n_events", "total_value"))
      val crashed = probe()
      assert(scans(crashed).exists(_.contains("serving")), scans(crashed))
      assert(crashed.filter($"event_type" === "click")
        .as[(String, Long, Long)].head()._2 == 12L,
        "post-crash covered query must see the upserted rows")
    } finally graft.plans.MaterializedAgg.clear()
  }

  test("maintained JOIN sink keeps a dim-join summary serving across microbatches") {
    val dir = TestSpark.tmpDir("streammvj")
    val landing = s"$dir/landing"
    val target = s"$dir/serving"
    val summary = s"$dir/jsummary"
    Seq(("click", "engagement"), ("view", "engagement"),
        ("purchase", "revenue"))
      .toDF("etype", "category").write.parquet(s"$dir/dim")
    val dim = spark.read.parquet(s"$dir/dim")

    def runOnce(n: Int): Unit = {
      val rollup = EventsPipeline.hourlyRollup(
        EventsPipeline.readEventsStream(spark, landing))
      val q = EventsPipeline.maintainedJoinSink(
        rollup, target, s"$dir/dim", summary, s"$dir/ckpt$n").start()
      q.awaitTermination()
    }
    def probe() = spark.read.parquet(target)
      .join(dim, col("event_type") === col("etype"))
      .groupBy($"event_type", $"category")
      .agg(sum($"n_events").as("events"), count(lit(1)).as("windows"))
    def scans(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString).mkString(",")
            case _ => ""
          }
      }

    graft.plans.MaterializedAgg.attach(spark)
    try {
      Seq(ev(1, "2024-01-01 10:05:00", "click", 1.0),
          ev(2, "2024-01-01 11:55:00", "click", 2.0),
          ev(3, "2024-01-01 10:20:00", "view", 8.0))
        .toDF().write.mode("append").parquet(landing)
      runOnce(1)
      // covered join-aggregate reads ONLY the summary — neither the
      // serving table nor the dim is scanned
      assert(scans(probe()).forall(_.contains("jsummary")), scans(probe()))
      assert(probe().orderBy("event_type")
        .as[(String, String, Long, Long)].collect().toSeq ==
        Seq(("click", "engagement", 2L, 2L), ("view", "engagement", 1L, 1L)))

      // batch 2 touches click + a brand-new type; view's summary
      // partition must survive the partial swap untouched
      Seq(ev(4, "2024-01-01 12:05:00", "click", 4.0),
          ev(5, "2024-01-01 12:10:00", "purchase", 16.0))
        .toDF().write.mode("append").parquet(landing)
      runOnce(2)
      assert(scans(probe()).forall(_.contains("jsummary")), scans(probe()))
      assert(probe().orderBy("event_type")
        .as[(String, String, Long, Long)].collect().toSeq ==
        Seq(("click", "engagement", 3L, 3L),
            ("purchase", "revenue", 1L, 1L),
            ("view", "engagement", 1L, 1L)))
      assert(spark.read.parquet(summary).filter($"event_type" === "view")
        .count() == 1)
    } finally graft.plans.MaterializedAgg.clear()
  }
}
