package graft

import graft.gold.Gold
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions (SURVEY.md §5.5): the properties that keep
  * these queries viable at 100 TB must hold in the plan, not just in
  * intent — dimension joins broadcast, scans prune columns, predicates
  * reach the parquet reader. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("gold dimension joins broadcast (no shuffle of the dim side)") {
    val p = planOf(Gold.departmentAnalytics(Ctx(spark, sf)))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("filters push down to the parquet scan") {
    val p = planOf(Queries.defs("q_between_filter").fn(spark, sf))
    assert(p.contains("PushedFilters:"), p.take(2000))
    assert(p.contains("GreaterThanOrEqual(l_shipdate") ||
           p.contains("IsNotNull(l_shipdate)"), p.take(2000))
  }

  test("projection prunes scan columns to what the query reads") {
    val p = planOf(Queries.defs("q_pricing_summary").fn(spark, sf))
    // lineitem has 11 columns; the pricing summary needs only 5
    assert(!p.contains("l_shipdate"),
      "pricing summary should not read l_shipdate\n" + p.take(2000))
    assert(p.contains("l_returnflag"))
  }

  test("anti-join RI check broadcasts the key set") {
    val p = planOf(Queries.defs("q_anti_join").fn(spark, sf))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      p.take(2000))
  }
}
