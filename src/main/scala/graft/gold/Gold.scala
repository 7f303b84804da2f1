package graft.gold

import graft.Ctx
import graft.functions.CrossEngine.{dateStr, exactAvg, exactSum, rnd2, rnd4, units}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's four gold-layer analytics (docs/etl_processes.md:420-683)
  * re-expressed over the driver testdata star schema:
  *   orders/lineitem = orders/order_items, part = products
  *   (p_brand stands in for `department`), customer = users.
  *
  * Output discipline: double aggregates go through the cross-engine
  * rounder (2 money / 4 rates) and dates are emitted as ISO strings, so
  * results are bit-stable across engines and partition orders — required
  * by the DuckDB-oracle hash compare, and good hygiene for any
  * distributed float aggregation.
  *
  * Scale notes: `part` (dimension) is broadcast explicitly; fact-side
  * joins shuffle only on the join key; multiple exact countDistinct in
  * one agg uses Catalyst's expand-based RewriteDistinctAggregates
  * (reference semantics say exact — approx_count_distinct is the
  * documented escape hatch at 100 TB, not the default).
  */
object Gold {
  /** Anchor for "days since last order" — the reference uses
    * current_date() (docs/etl_processes.md:638), which is
    * non-reproducible; we pin a date after the data's horizon. */
  val AnchorDate = "2002-01-01"

  private def revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** daily_sales (docs/etl_processes.md:425-437). Faithful quirk: the
    * reference joins orders×items first, so sum/avg of the order total
    * are over *joined rows* (weighted by item count) and order_count is
    * countDistinct. Values reproduced as written — but computed from a
    * per-order pre-aggregate: lineitem collapses to (orderkey, n_items)
    * before the join, the joined-row sums become n_items-weighted order
    * sums, countDistinct(orderkey) becomes a plain count (one row per
    * order post-join), and the remaining distinct-customer expand runs
    * on per-order rows, not per-item rows. Bit-identical output (the
    * weighted integer-unit sums are the same integers; the double ops
    * mirror exactSum/exactAvg operand-for-operand). */
  def dailySales(c: Ctx): DataFrame = {
    val perOrder = c.lineitem.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_items"))
    val wUnits = sum(units(col("o_totalprice"), 2) * col("n_items"))
    c.orders.join(perOrder, col("o_orderkey") === col("l_orderkey"))
      .groupBy(dateStr(col("o_orderdate")).as("order_date"))
      .agg(
        (floor(wUnits / 1.0 + 0.5) / 100.0).as("total_sales"),
        count(lit(1)).as("order_count"),
        (floor(wUnits * 100 / sum("n_items") + 0.5) / 10000.0).as("avg_order_value"),
        countDistinct("o_custkey").as("unique_customers"),
        sum("n_items").as("total_items"),
        rnd4(sum("n_items").cast("double") / count(lit(1)))
          .as("items_per_order"))
  }

  /** product_performance (docs/etl_processes.md:490-500).
    *
    * Aggregate-then-join: grouping directly on (p_partkey, p_name,
    * p_brand) drags ~80 bytes of strings per row through the
    * countDistinct expand and the agg shuffle; since partkey → (name,
    * brand) is functionally dependent, aggregating on the int key alone
    * and broadcast-joining the dimension onto the (already tiny)
    * aggregate is the same result with a fraction of the shuffle bytes
    * — the shape that survives a 100× scale-up. */
  def productPerformance(c: Ctx): DataFrame =
    c.lineitem
      .groupBy(col("l_partkey"))
      .agg(
        count(lit(1)).as("times_purchased"),
        exactSum(revenue, 4, 2).as("total_revenue"),
        countDistinct("l_orderkey").as("order_count"),
        exactAvg(col("l_quantity"), 2, 4).as("avg_quantity"),
        exactAvg(col("l_discount"), 2, 4).as("avg_discount"))
      .join(broadcast(c.part.select("p_partkey", "p_name", "p_brand")),
            col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
              col("times_purchased"), col("total_revenue"),
              col("order_count"), col("avg_quantity"), col("avg_discount"))

  /** department_analytics (docs/etl_processes.md:556-567): three exact
    * countDistincts.
    *
    * Decomposed, not one agg: three distinct columns in a single agg
    * make Catalyst Expand every joined row 4× before the shuffle. Here
    * the revenue aggregates + the parts distinct share ONE pass (a
    * single countDistinct plans as two-level agg, no Expand), while the
    * order/customer distincts reduce to pre-aggregated narrow int-pair
    * sets — (brand, orderkey) deduplicates map-side BEFORE its shuffle,
    * and only that distinct pair set (not the full fact rows) joins
    * orders to reach custkey. Per-brand results (dozens of rows) then
    * join back broadcast-small. Same results, no 4× row multiply, no
    * wide rows through any shuffle.
    *
    * Precondition (holds for this data model and is what the reference
    * job assumes): orders is pk-unique on o_orderkey and every
    * l_orderkey resolves — the inner orders join then neither drops nor
    * duplicates lineitem rows, so revenue aggregates are unchanged by
    * computing them before that join. q_anti_join checks the RI side. */
  def departmentAnalytics(c: Ctx): DataFrame = {
    val li = c.lineitem
      .join(broadcast(c.part.select("p_partkey", "p_brand")),
            col("l_partkey") === col("p_partkey"))
    // revenue branch pre-aggregates by (brand, partkey): the distinct
    // part count becomes a plain second-level count (NO Expand — even
    // a single countDistinct alongside other aggs doubles every input
    // row), and the long unit-sums re-sum exactly, so the fixed-point
    // results are bit-identical to the direct exactSum/exactAvg forms
    // (same integer totals through the same IEEE op sequence)
    val perPart = li.groupBy(col("p_brand"), col("p_partkey"))
      .agg(sum(units(revenue, 4)).as("__su"), count(revenue).as("__n"))
    val rev = perPart.groupBy(col("p_brand"))
      .agg(
        (floor(sum(col("__su")) / 100.0 + 0.5) / 100.0).as("total_revenue"),
        count(lit(1)).as("unique_parts"),
        (floor(sum(col("__su")) * 1.0 / sum(col("__n")) + 0.5) / 10000.0)
          .as("avg_item_revenue"))
    // one branch for BOTH order/customer distincts: the distinct
    // (brand, orderkey) pair set is computed once (uncached branches
    // would rescan lineitem per consumer), joined 1:1 to orders, and
    // aggregated with count + a single countDistinct — the ×2 Expand
    // this costs runs over the narrow pre-deduplicated pair set, far
    // cheaper than the extra full lineitem scan it replaces
    val ouc = li.select(col("p_brand"), col("l_orderkey")).distinct()
      .join(c.orders.select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("unique_orders"),
           countDistinct("o_custkey").as("unique_customers"))
    rev.join(ouc, "p_brand")
      .select(col("p_brand"), col("total_revenue"), col("unique_parts"),
              col("unique_orders"), col("unique_customers"),
              col("avg_item_revenue"))
  }

  /** Per-customer order metrics + segment bucketing
    * (docs/etl_processes.md:630-668). The when-chain is order-sensitive;
    * preserved exactly (>10 Loyal; >5 ∧ ≤30d Active; >1 ∧ ≤90d Regular;
    * >90d Lapsed; else New). */
  def userMetrics(c: Ctx): DataFrame =
    c.orders.groupBy(col("o_custkey").as("custkey"))
      .agg(
        countDistinct("o_orderkey").as("total_orders"),
        exactSum(col("o_totalprice"), 2, 2).as("total_spent"),
        exactAvg(col("o_totalprice"), 2, 4).as("avg_order_value"),
        to_date(min("o_orderdate")).as("first_order_d"),
        to_date(max("o_orderdate")).as("last_order_d"))
      .withColumn("days_since_last_order",
        datediff(lit(AnchorDate).cast("date"), col("last_order_d")))
      .withColumn("customer_segment",
        when(col("total_orders") > 10, "Loyal")
          .when(col("total_orders") > 5 && col("days_since_last_order") <= 30, "Active")
          .when(col("total_orders") > 1 && col("days_since_last_order") <= 90, "Regular")
          .when(col("days_since_last_order") > 90, "Lapsed")
          .otherwise("New"))
      .withColumn("first_order_date", dateStr(col("first_order_d")))
      .withColumn("last_order_date", dateStr(col("last_order_d")))
      .drop("first_order_d", "last_order_d")

  /** Favorite part per customer: count purchases, rank desc, keep rank 1.
    * rank() ties are kept (a customer can emit several favorites) —
    * reference W1 semantics preserved exactly
    * (docs/etl_processes.md:643-652). */
  def favoriteParts(c: Ctx): DataFrame = {
    val counts = c.lineitem
      .join(c.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("custkey"), col("l_partkey"))
      .agg(count(lit(1)).as("purchase_count"))
    // rank()=1 with ties kept ≡ equality against the per-customer max:
    // two hash aggregates + an equi-join instead of a per-group SORT —
    // at scale the window's shuffle+sort per custkey partition is the
    // expensive half, and the max table is customer-sized
    val maxes = counts.groupBy("custkey")
      .agg(max(col("purchase_count")).as("purchase_count"))
    counts.join(maxes, Seq("custkey", "purchase_count"))
      .select(col("custkey"), col("l_partkey").as("favorite_partkey"),
              col("purchase_count").as("favorite_purchase_count"))
  }

  /** customer_insights = user metrics ⋈ favorite products
    * (docs/etl_processes.md:655-668). */
  def customerInsights(c: Ctx): DataFrame =
    userMetrics(c).join(favoriteParts(c), Seq("custkey"))
}
