package graft

import graft.streaming.HeavyHittersStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("per-group MG state accumulates across micro-batches with the guarantee intact") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    val k = 3
    // batch 1: group a sees a skewed stream; group b a uniform one
    val batch1 = Seq.fill(20)(("a", "hot")) ++
      Seq(("a", "x1"), ("a", "x2"), ("a", "x3"), ("a", "x4")) ++
      Seq(("b", "u1"), ("b", "u2"), ("b", "u3"))
    ms.addData(batch1: _*)
    val df = ms.toDF().toDF("group", "item")
    val q = HeavyHittersStream.topItems(df, k)
      .writeStream.format("memory").queryName("hh")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val r1 = spark.table("hh").as[HeavyHittersStream.Out].collect()
      val a1 = r1.filter(_.group == "a")
      assert(a1.forall(_.rows_seen == 24))
      // "hot" has frequency 20 > 24/(k+1)=6 -> MUST be tracked, rank 1
      assert(a1.exists(o => o.item == "hot" && o.rank == 1))
      // no overcount; undercount bounded by n/(k+1)
      val hot1 = a1.find(_.item == "hot").get
      assert(hot1.min_count <= 20 && hot1.min_count >= 20 - 24 / (k + 1))
      assert(a1.length <= k)

      // batch 2: more of the same hot item, a new group c
      ms.addData(Seq.fill(10)(("a", "hot")) ++ Seq(("c", "solo")): _*)
      q.processAllAvailable()
      val r2 = spark.table("hh").as[HeavyHittersStream.Out].collect()
      // Update mode re-emits group a with refreshed state: latest rows_seen
      val a2 = r2.filter(o => o.group == "a" && o.rows_seen == 34)
      assert(a2.nonEmpty, "group a must re-emit after new data")
      val hot2 = a2.find(_.item == "hot").get
      // state carried over: count grew past what batch 2 alone provides
      assert(hot2.min_count > 10 && hot2.min_count <= 30)
      assert(hot2.rank == 1)
      // untouched group b is NOT re-emitted in batch 2 (update semantics)
      assert(r2.filter(_.group == "b").forall(_.rows_seen == 3))
      assert(r2.exists(o => o.group == "c" && o.item == "solo" &&
        o.min_count == 1 && o.rows_seen == 1))
    } finally q.stop()
  }

  test("streaming result equals a sequential driver-side MG over the same rows") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    val k = 4
    val rows = (1 to 50).map(i => ("g", s"i${i % 7}")) // zipfian-ish cycle
    val (b1, b2) = rows.splitAt(23)
    ms.addData(b1: _*)
    val q = HeavyHittersStream.topItems(ms.toDF().toDF("group", "item"), k)
      .writeStream.format("memory").queryName("hh_seq")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      ms.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table("hh_seq").as[HeavyHittersStream.Out].collect()
        .filter(_.rows_seen == 50).map(o => o.item -> o.min_count).toMap

      // driver-side reference: one MG pass in arrival order — the
      // stream IS this pass, so the result must match exactly (single
      // group ⇒ no partition nondeterminism)
      val buf = scala.collection.mutable.HashMap.empty[String, Long]
      rows.foreach { case (_, i) => graft.functions.MisraGries.offer(buf, i, k) }
      assert(got == buf.toMap)
    } finally q.stop()
  }
}
