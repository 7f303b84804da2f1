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
}
