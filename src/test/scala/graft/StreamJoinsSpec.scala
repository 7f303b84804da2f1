package graft

import graft.streaming.StreamJoins
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

case class Click(user: Long, click_ts: Timestamp, page: String)
case class Buy(buyer: Long, buy_ts: Timestamp, amount: Double)

class StreamJoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-static enrichment join attaches dimension rows per micro-batch") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[Click]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user", "tier")
    val q = StreamJoins.enrich(ms.toDF(), dim, Seq("user"))
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      ms.addData(Click(1, ts("2024-01-01 10:00:00"), "home"),
                 Click(2, ts("2024-01-01 10:01:00"), "cart"),
                 Click(9, ts("2024-01-01 10:02:00"), "x")) // no dim row → dropped
      q.processAllAvailable()
      val got = spark.table("enriched").select("user", "page", "tier")
        .as[(Long, String, String)].collect().toSet
      assert(got == Set((1L, "home", "gold"), (2L, "cart", "basic")))
    } finally q.stop()
  }

  test("stream-stream interval join pairs events inside the window only") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Buy]
    val joined = StreamJoins.intervalJoin(
      clicks.toDF(), buys.toDF(), "user", "buyer",
      "click_ts", "buy_ts", window = "1 HOUR", delay = "2 hours")
    val q = joined.writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    try {
      clicks.addData(Click(1, ts("2024-01-01 10:00:00"), "ad"),
                     Click(2, ts("2024-01-01 10:00:00"), "ad"))
      buys.addData(Buy(1, ts("2024-01-01 10:30:00"), 9.99),  // inside window
                   Buy(2, ts("2024-01-01 12:30:00"), 5.0),   // outside window
                   Buy(3, ts("2024-01-01 10:10:00"), 1.0))   // no click
      q.processAllAvailable()
      val got = spark.table("attributed").select("user", "page", "amount")
        .as[(Long, String, Double)].collect().toSet
      assert(got == Set((1L, "ad", 9.99)))
    } finally q.stop()
  }

  test("left-outer interval join emits unmatched rows after the watermark") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[Click]
    val buys = MemoryStream[Buy]
    val joined = StreamJoins.leftOuterIntervalJoin(
      clicks.toDF(), buys.toDF(), "user", "buyer",
      "click_ts", "buy_ts", window = "1 HOUR", delay = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("outer_attr")
      .outputMode("append").start()
    try {
      clicks.addData(Click(1, ts("2024-01-01 10:00:00"), "ad"),   // converts
                     Click(2, ts("2024-01-01 10:00:00"), "ad"))   // never does
      buys.addData(Buy(1, ts("2024-01-01 10:30:00"), 9.99))
      q.processAllAvailable()
      // matched pair emits immediately; the unmatched click must NOT
      // emit yet — a matching buy could still arrive
      val early = spark.table("outer_attr").select("user").as[Long].collect()
      assert(early.toSet == Set(1L), early.toSeq)

      // advance both watermarks past click_ts + window + delay: the
      // unmatched click's interval can no longer be matched → it emits
      // with null right columns
      clicks.addData(Click(99, ts("2024-01-01 13:00:00"), "later"))
      buys.addData(Buy(98, ts("2024-01-01 13:00:00"), 1.0))
      q.processAllAvailable()
      q.processAllAvailable() // second batch lets the outer emit flush
      val got = spark.table("outer_attr")
        .select("user", "page", "amount")
        .as[(Long, String, Option[Double])].collect().toSet
      assert(got.contains((1L, "ad", Some(9.99))), got)
      assert(got.contains((2L, "ad", None)),
        s"unmatched left row must emit with null rights after watermark: $got")
    } finally q.stop()
  }

  test("streaming ANN lookup equals the batch lshTopK per microbatch") {
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._
    val c = Ctx(spark, "/root/testdata/sf0.001")
    val corpus = graft.similarity.Similarity
      .prepare(c.embeddings, "vec_id", "embedding")
    val queryRows = c.embeddings.filter(col("vec_id") % 50 === 0)
      .as[(Long, Seq[Float], Int)].collect().map(r => (r._1, r._2))

    val ms = MemoryStream[(Long, Seq[Float])]
    val results = scala.collection.mutable.Set[(Long, Long)]()
    // excludeSelf = true: THIS stream replays corpus rows as queries
    // (self-search), so the batch operator's self-exclusion is the
    // correct semantics. The sink's default is false because a real
    // stream's query ids are unrelated to corpus ids — an id collision
    // must not censor a true neighbor (pinned in SimilaritySpec).
    val q = graft.streaming.AnnStream.lshTopKSink(
      ms.toDF().toDF("qid", "qvec"), corpus, "qid", "qvec",
      k = 5, nbits = 64, bands = 16,
      checkpoint = TestSpark.tmpDir("annstream") + "/ckpt",
      sink = df => results.synchronized {
        results ++= df.select("query_id", "vec_id")
          .as[(Long, Long)].collect()
      },
      excludeSelf = true)
    try {
      val (b1, b2) = queryRows.splitAt(queryRows.length / 2)
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
      val batch = graft.similarity.Similarity
        .lshTopK(corpus.filter(col("id") % 50 === 0), corpus, 5, 64, 16,
                 graft.functions.CrossEngine.rnd6)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      // streamed answers (self-match included for streamed queries,
      // which the batch path's identical ids also exclude) match batch
      assert(results.toSet == batch,
        s"stream ${results.size} vs batch ${batch.size}")
    } finally q.stop()
  }
}
