package graft

import graft.streaming.EwmaStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class EwmaStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val J = EwmaStream.J

  /** The q_ewma formula over a set of observed (mi, cents) rows. */
  private def reference(rows: Seq[(Long, Long)], t: Long): Double = {
    val byMi = rows.groupBy(_._1).map { case (mi, rs) => mi -> rs.map(_._2).sum }
    var num = 0L; var den = 0L
    byMi.foreach { case (mi, cents) =>
      val d = t - mi
      if (d >= 0 && d <= J) { val w = 1L << (J - d).toInt; num += cents * w; den += w }
    }
    num.toDouble / (den * 10000.0)
  }

  test("cross-batch smoothing equals the batch formula; decay reaches forward months") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long)]
    val b1 = Seq((1L, 100L, 50000L), (1L, 101L, 70000L), (1L, 103L, 20000L))
    ms.addData(b1: _*)
    val q = EwmaStream.smoothed(ms.toDF().toDF("key", "mi", "cents"))
      .writeStream.format("memory").queryName("ewma_s")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // batch 2 updates month 101 (late-but-in-window) and adds 104:
      // months 101..104 must re-emit with the refreshed window
      val b2 = Seq((1L, 101L, 10000L), (1L, 104L, 90000L))
      ms.addData(b2: _*)
      q.processAllAvailable()
      val all = b1 ++ b2
      val got = spark.table("ewma_s").as[EwmaStream.Out].collect()
      // latest emission per month (memory sink appends update-mode rows)
      val latest = got.groupBy(_.mi).map { case (mi, os) => mi -> os.last.ewma }
      for (mi <- Seq(101L, 103L, 104L)) {
        val exp = reference(all.map(r => (r._2, r._3)), mi)
        assert(latest.contains(mi), s"month $mi must re-emit")
        assert(latest(mi) == exp, s"month $mi: ${latest(mi)} != $exp")
      }
      // month 102 was never observed: like the batch query's join, an
      // unobserved month has no row at all
      assert(!latest.contains(102L))
      // month 100 predates every batch-2 update — not re-emitted, and
      // its batch-1 value matches the formula over batch-1 rows alone
      val m100 = got.filter(_.mi == 100L)
      assert(m100.length == 1)
      assert(m100.head.ewma == reference(b1.map(r => (r._2, r._3)), 100L))
    } finally q.stop()
  }

  test("state stays bounded: months beyond 2J prune, too-late rows count as dropped") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long)]
    ms.addData((7L, 100L, 10000L))
    val q = EwmaStream.smoothed(ms.toDF().toDF("key", "mi", "cents"))
      .writeStream.format("memory").queryName("ewma_b")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // jump far forward: month 100 falls off the 2J+1 window
      ms.addData((7L, 200L, 30000L))
      q.processAllAvailable()
      // a row for the pruned month is late (200 - 2J horizon)
      ms.addData((7L, 100L, 99999L))
      q.processAllAvailable()
      val got = spark.table("ewma_b").as[EwmaStream.Out].collect()
      // the too-late row emits nothing new for month 100, is counted,
      // and the counter surfaces IMMEDIATELY via a re-statement of the
      // latest observed month (value unchanged — an upsert no-op)
      assert(got.count(_.mi == 100L) == 1, "pruned month must not re-emit")
      assert(got.filter(_.mi == 200L).last.late_dropped == 1L)
      assert(got.filter(_.mi == 200L).last.ewma ==
        reference(Seq((200L, 30000L)), 200L))
      // and it persists on the next on-time emission for the key
      ms.addData((7L, 201L, 10000L))
      q.processAllAvailable()
      val after = spark.table("ewma_b").as[EwmaStream.Out].collect()
      assert(after.filter(_.mi == 201L).last.late_dropped == 1L)
      // and month 201's window sees only months 200-201 (100 pruned):
      assert(after.filter(_.mi == 201L).last.ewma ==
        reference(Seq((200L, 30000L), (201L, 10000L)), 201L))
      // a forward jump INSIDE one batch: the old row is classified
      // late against the batch-inclusive horizon, not silently pruned
      ms.addData((9L, 300L, 10000L), (9L, 100L, 5000L))
      q.processAllAvailable()
      val k9 = spark.table("ewma_b").as[EwmaStream.Out].collect()
        .filter(_.key == 9L)
      assert(k9.map(_.mi).toSet == Set(300L))
      assert(k9.last.late_dropped == 1L)
    } finally q.stop()
  }

  test("rows in the [max-2J, max-J) band are late: in state-prune range but past the update horizon") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long)]
    ms.addData((3L, 100L, 10000L))
    val q = EwmaStream.smoothed(ms.toDF().toDF("key", "mi", "cents"))
      .writeStream.format("memory").queryName("ewma_band")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // advance to 100 + 1.5J: month 100 is still IN state (>= max-2J)
      // but BELOW the update horizon (< max-J)
      val mid = 100L + J + J / 2 // 115 for J=10
      ms.addData((3L, mid, 30000L))
      q.processAllAvailable()
      // a late row for month 100: accepting it would re-emit months
      // [100, 100+J] whose lookback below max-2J is already pruned —
      // it must be DROPPED and counted, even though 100 is in state
      ms.addData((3L, 100L, 77777L))
      q.processAllAvailable()
      val got = spark.table("ewma_band").as[EwmaStream.Out].collect()
      assert(got.count(_.mi == 100L) == 1, "band-late month must not re-emit")
      assert(got.filter(_.mi == 100L).head.ewma ==
        reference(Seq((100L, 10000L)), 100L), "original value untouched")
      // the drop surfaces on the next emission
      ms.addData((3L, mid + 1, 10000L))
      q.processAllAvailable()
      val after = spark.table("ewma_band").as[EwmaStream.Out].collect()
      assert(after.filter(_.mi == mid + 1).last.late_dropped == 1L)
      // and mid+1 smooths over exactly the non-late rows — the batch
      // formula over what was accepted, proving no partial-window skew
      assert(after.filter(_.mi == mid + 1).last.ewma ==
        reference(Seq((mid, 30000L), (mid + 1, 10000L)), mid + 1))
    } finally q.stop()
  }

  test("an ALL-late batch surfaces its late_dropped counter immediately") {
    // late counts used to accumulate invisibly in state until some
    // future ON-TIME row for the key happened to emit — monitoring
    // missed exactly the batches where data was being discarded. An
    // all-late batch now re-states the latest observed month with the
    // fresh counter (an upsert no-op for the ewma value itself).
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long)]
    ms.addData((4L, 100L, 10000L))
    val q = EwmaStream.smoothed(ms.toDF().toDF("key", "mi", "cents"))
      .writeStream.format("memory").queryName("ewma_alllate")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      ms.addData((4L, 200L, 20000L)) // horizon jump; month 100 prunes
      q.processAllAvailable()
      ms.addData((4L, 100L, 5000L))  // ENTIRELY late batch
      q.processAllAvailable()
      val got = spark.table("ewma_alllate").as[EwmaStream.Out].collect()
      val m200 = got.filter(_.mi == 200L)
      assert(m200.last.late_dropped == 1L,
        s"all-late batch must emit the counter now, got ${m200.toSeq}")
      assert(m200.last.ewma == reference(Seq((200L, 20000L)), 200L),
        "the re-stated month's value must be unchanged")
    } finally q.stop()
  }
}
