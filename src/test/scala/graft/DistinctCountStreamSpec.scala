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

  test("a restart with a SMALLER k downsizes restored state losslessly") {
    // a checkpoint written under k=256 restores 256 hashes into a
    // k=128 run; offer() never shrinks a full set, so without the
    // restore-time truncation the estimate would read the wrong order
    // statistic forever. Keeping the k smallest IS the k-sized sketch
    // of the same prefix — the result must be bit-equal to a single
    // k=128 run over all rows.
    val dir = TestSpark.tmpDir("kmvrestart")
    val landing = s"$dir/landing"; val ckpt = s"$dir/ckpt"
    val rows1 = (1 to 400).map(i => ("g", s"item$i"))
    val rows2 = (401 to 450).map(i => ("g", s"item$i"))
    rows1.toDF("group", "item").write.mode("append").parquet(landing)
    // foreachBatch sink: the memory sink refuses checkpoint recovery
    def runOnce(k: Int): Unit = {
      val src = spark.readStream
        .schema("group string, item string").parquet(landing)
      val q = DistinctCountStream.distinctCounts(src, k)
        .writeStream
        .outputMode("update").option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[DistinctCountStream.Out],
           _: Long) =>
            b.write.mode("append").parquet(s"$dir/out")
        }
        .start()
      q.awaitTermination()
    }
    runOnce(256)
    rows2.toDF("group", "item").write.mode("append").parquet(landing)
    runOnce(128)
    val o = spark.read.parquet(s"$dir/out")
      .as[DistinctCountStream.Out].collect().maxBy(_.rows_seen)
    // batch reference at k=128 over ALL items
    val hashes = (rows1 ++ rows2).map(_._2).map(Kmv.hash32)
      .distinct.sorted.take(128)
    assert(o.k_used == 128 && o.hk == hashes.last &&
           o.estimate == Kmv.estimate(hashes.size, 128, hashes.last), o)
  }

  test("a restart with a LARGER k clamps to the stored k (no silent bias)") {
    // the inverse direction is NOT lossless: hashes the k=64 sketch
    // already discarded are gone, so honoring k=256 after restore
    // would refill the set with too-large values and bias the
    // estimate. The effective k must clamp to min(stored, configured)
    // — the final state must be bit-equal to a single k=64 run.
    val dir = TestSpark.tmpDir("kmvgrow")
    val landing = s"$dir/landing"; val ckpt = s"$dir/ckpt"
    val rows1 = (1 to 300).map(i => ("g", s"item$i"))
    val rows2 = (301 to 500).map(i => ("g", s"item$i"))
    rows1.toDF("group", "item").write.mode("append").parquet(landing)
    def runOnce(k: Int): Unit = {
      val src = spark.readStream
        .schema("group string, item string").parquet(landing)
      val q = DistinctCountStream.distinctCounts(src, k)
        .writeStream
        .outputMode("update").option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[DistinctCountStream.Out],
           _: Long) =>
            b.write.mode("append").parquet(s"$dir/out")
        }
        .start()
      q.awaitTermination()
    }
    runOnce(64)
    rows2.toDF("group", "item").write.mode("append").parquet(landing)
    runOnce(256)
    val o = spark.read.parquet(s"$dir/out")
      .as[DistinctCountStream.Out].collect().maxBy(_.rows_seen)
    // batch reference at the ORIGINAL k=64 over ALL items
    val hashes = (rows1 ++ rows2).map(_._2).map(Kmv.hash32)
      .distinct.sorted.take(64)
    assert(o.k_used == 64 && o.hk == hashes.last &&
           o.estimate == Kmv.estimate(hashes.size, 64, hashes.last), o)
  }
}
