package graft

import graft.operators.RangeJoin
import graft.text.DedupClusters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binned range join matches the naive between-join") {
    val points = (0L until 500L).map(p => (p, p * 7 % 400)).toDF("pid", "pt")
    val intervals = Seq(
      (1L, 0L, 50L), (2L, 40L, 60L), (3L, 100L, 300L), (4L, 395L, 410L),
      (5L, 200L, 200L) // degenerate single-point interval
    ).toDF("iid", "s", "e")

    val binned = RangeJoin.binned(points, intervals, "pt", "s", "e", binWidth = 32)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals,
        col("pt") >= col("s") && col("pt") <= col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(binned == naive)
    assert(naive.nonEmpty)
  }

  test("binned range join with extra equi-keys scopes matches per key") {
    val points = (0L until 300L).map(p => (p, p % 3, p % 100)).toDF("pid", "g", "pt")
    val intervals = Seq((10L, 0L, 0L, 50L), (11L, 1L, 25L, 75L), (12L, 2L, 90L, 99L))
      .toDF("iid", "g", "s", "e")
    val binned = RangeJoin.binned(points, intervals, "pt", "s", "e",
        binWidth = 16, extraKeys = Seq("g"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, Seq("g"))
      .filter(col("pt") >= col("s") && col("pt") <= col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(binned == naive)
    assert(naive.nonEmpty)
  }

  test("binned range join plans as an equi-join, not a nested loop") {
    val points = (0L until 1000L).map(p => (p, p % 500)).toDF("pid", "pt")
    val intervals = (0L until 50L).map(i => (i, i * 10, i * 10 + 25))
      .toDF("iid", "s", "e")
    val plan = RangeJoin.binned(points, intervals, "pt", "s", "e", binWidth = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("connected components on an empty pair set returns empty, survivors keep all") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(DedupClusters.connectedComponents(pairs).count() == 0)
    val all = Seq(1L, 2L, 3L).toDF("doc_id")
    val surv = DedupClusters.survivors(all, "doc_id", pairs)
      .as[Long].collect().toSet
    assert(surv == Set(1L, 2L, 3L))
  }
}
