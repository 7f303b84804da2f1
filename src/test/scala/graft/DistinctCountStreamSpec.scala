package graft

import graft.functions.Kmv
import graft.streaming.DistinctCountStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DistinctCountStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Kmv.hash32 is bit-identical to the SQL replays' md5 prefix") {
    val samples = Seq("a", "42", "hello world", "", "Ω≈ç√∫", "1999")
    val viaSql = samples.toDF("s")
      .select(col("s"),
        expr("cast(conv(substring(md5(cast(s as binary)), 1, 8), 16, 10) as long)")
          .as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach(s => assert(Kmv.hash32(s) == viaSql(s), s))
  }

  test("streaming KMV state equals the batch sketch over the same rows, " +
       "regardless of micro-batch split") {
    implicit val sq = spark.sqlContext
    // 300 distinct items cycled with duplicates, one group, k below the
    // distinct count so the estimator path (not the exact-set path) runs
    val rows = (1 to 900).map(i => ("g", s"item${i % 300}"))
    val k = 64

    // batch reference: the k smallest distinct hashes, like q_kmv_replay
    val hashes = rows.map(_._2).distinct.map(Kmv.hash32).distinct.sorted.take(k)
    val expectHk = hashes.last
    val expectEst = Kmv.estimate(hashes.size, k, expectHk)

    for (splitAt <- Seq(1, 450, 899)) {
      val ms = MemoryStream[(String, String)]
      val (b1, b2) = rows.splitAt(splitAt)
      ms.addData(b1: _*)
      val name = s"kmv_$splitAt"
      val q = DistinctCountStream
        .distinctCounts(ms.toDF().toDF("group", "item"), k)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        q.processAllAvailable()
        ms.addData(b2: _*)
        q.processAllAvailable()
        val fin = spark.table(name).as[DistinctCountStream.Out].collect()
          .filter(_.rows_seen == 900)
        assert(fin.nonEmpty, s"split $splitAt: no final emission")
        val o = fin.head
        assert(o.k_used == k && o.hk == expectHk && o.estimate == expectEst,
               s"split $splitAt: $o")
        // honest sketch: within 25% of the true 300 at k=64
        assert(math.abs(o.estimate - 300.0) / 300.0 < 0.25, o.estimate)
      } finally q.stop()
    }
  }

  test("below k distinct values the count is exact; state stays bounded") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    ms.addData(Seq(("a", "x"), ("a", "y"), ("a", "x"), ("b", "z")): _*)
    val q = DistinctCountStream
      .distinctCounts(ms.toDF().toDF("group", "item"), k = 256)
      .writeStream.format("memory").queryName("kmv_small")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val r = spark.table("kmv_small").as[DistinctCountStream.Out].collect()
      assert(r.find(_.group == "a").get.estimate == 2)
      assert(r.find(_.group == "b").get.estimate == 1)
      assert(r.forall(o => o.k_used <= 256))
    } finally q.stop()
  }

  test("rows_seen counts EVERY row; null items skip only the hash") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    ms.addData(Seq(("a", "x"), ("a", null), ("a", "y"), ("a", null)): _*)
    val q = DistinctCountStream
      .distinctCounts(ms.toDF().toDF("group", "item"), k = 256)
      .writeStream.format("memory").queryName("kmv_nulls")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val o = spark.table("kmv_nulls").as[DistinctCountStream.Out]
        .collect().find(_.group == "a").get
      assert(o.rows_seen == 4, s"row counter must include null items: $o")
      assert(o.estimate == 2)
    } finally q.stop()
  }
}
