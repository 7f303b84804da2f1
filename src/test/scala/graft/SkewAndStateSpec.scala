package graft

import graft.operators.Skew
import graft.streaming.SessionizeStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class SkewAndStateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedAgg equals plain aggregation on a hot-key distribution") {
    // hot key: 90% of rows share k=0
    val df = (1 to 10000).map(i => (if (i % 10 == 0) i % 7 else 0, i.toDouble))
      .toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"))
      .as[(Int, Double, Long)].collect().toSet
    val salted = Skew.saltedAgg(df, Seq("k"), salts = 8, saltOn = col("v"),
        partial = Seq(sum("v").as("ps"), count(lit(1)).as("pn")),
        finalAgg = Seq(sum("ps").as("s"), sum("pn").as("n")))
      .as[(Int, Double, Long)].collect().toSet
    assert(salted == plain)
  }

  test("saltedJoin equals plain join, spreads the hot key") {
    val big = (1 to 5000).map(i => (if (i % 20 == 0) i % 5 else 1, s"r$i"))
      .toDF("k", "payload")
    val dim = Seq((1, "one"), (2, "two"), (3, "three"), (4, "four"), (0, "zero"))
      .toDF("k", "name")
    val plain = big.join(dim, Seq("k")).as[(Int, String, String)]
      .collect().toSet
    val salted = Skew.saltedJoin(big, dim, "k", salts = 8)
      .select("k", "payload", "name").as[(Int, String, String)]
      .collect().toSet
    assert(salted == plain)
  }

  test("stateful streaming sessionization matches gap semantics") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Timestamp)]
    def t(s: String) = Timestamp.valueOf(s)
    // user 1: two sessions split by a > gap pause; user 2: one session
    ms.addData(
      (1L, 1L, t("2024-01-01 10:00:00")),
      (1L, 2L, t("2024-01-01 10:10:00")),
      (1L, 3L, t("2024-01-01 13:00:00")), // 2h50m gap -> closes session 1
      (2L, 4L, t("2024-01-01 09:00:00")))
    val events = ms.toDF().toDF("user_id", "event_id", "ts")
    val q = SessionizeStream.sessionize(events, gapSeconds = 3600)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val closed = spark.table("sess")
        .as[SessionizeStream.SessionOut].collect()
      // only user 1's first session is closed so far (2 events, 600s span)
      assert(closed.toSeq == Seq(
        SessionizeStream.SessionOut(1L, t("2024-01-01 10:00:00").getTime / 1000,
          t("2024-01-01 10:10:00").getTime / 1000, 2)))
      // a later event for user 2 beyond the gap closes user 2's session
      ms.addData((2L, 5L, t("2024-01-01 12:00:00")))
      q.processAllAvailable()
      val all = spark.table("sess").as[SessionizeStream.SessionOut].collect()
      assert(all.exists(s => s.user_id == 2L && s.n_events == 1))
    } finally q.stop()
  }

  test("sessionize handles cross-batch stragglers: gap-adjacent lowers start, deep-late is a singleton") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Timestamp)]
    def t(s: String) = Timestamp.valueOf(s)
    def sec(s: String) = t(s).getTime / 1000
    ms.addData((1L, 1L, t("2024-01-01 10:00:00")))
    val q = SessionizeStream.sessionize(
        ms.toDF().toDF("user_id", "event_id", "ts"), gapSeconds = 3600)
      .writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2: one straggler 30 min BEFORE the open session's start
      // (within gap → belongs, start lowers) and one 5 h before
      // (cannot be reconstructed → emitted as a singleton immediately;
      // the old `delta <= gap` test silently absorbed BOTH into the
      // 10:00 session without moving its start)
      ms.addData((1L, 2L, t("2024-01-01 09:30:00")),
                 (1L, 3L, t("2024-01-01 05:00:00")))
      q.processAllAvailable()
      // close the open session so its boundaries become observable
      ms.addData((1L, 4L, t("2024-01-01 15:00:00")))
      q.processAllAvailable()
      val out = spark.table("sess_late")
        .as[SessionizeStream.SessionOut].collect().toSet
      assert(out.contains(SessionizeStream.SessionOut(
        1L, sec("2024-01-01 05:00:00"), sec("2024-01-01 05:00:00"), 1)),
        s"deep-late singleton missing: $out")
      assert(out.contains(SessionizeStream.SessionOut(
        1L, sec("2024-01-01 09:30:00"), sec("2024-01-01 10:00:00"), 2)),
        s"gap-adjacent straggler must lower the session start: $out")
    } finally q.stop()
  }
}
