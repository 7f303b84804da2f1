package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The co-purchase graph derivation shared by the market-basket,
  * label-propagation, and triangle-counting queries (one definition,
  * three consumers — reference intent: all three analyze the same
  * "bought together" relation over order items).
  *
  * Scale shape: the pair fan-out is (basket size choose 2) keyed on
  * the order id — bounded by the largest basket, never
  * corpus-quadratic — and the pair aggregation shuffles on the
  * high-cardinality (p_a, p_b). `items` is localCheckpointed because
  * every consumer feeds it to 2-4 branches whose pushed-down
  * projections defeat ReuseExchange; uncheckpointed, the source
  * distinct would re-execute per branch.
  */
object CoPurchase {

  /** Distinct (order, part) incidence pairs, materialized. */
  def items(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
      .localCheckpoint()

  /** Co-purchase pairs `p_a < p_b` appearing in at least `minCo`
    * common orders, with the co-occurrence count as `cntCol`. */
  def pairs(items: DataFrame, cntCol: String = "n_co",
            minCo: Long = 2): DataFrame =
    items.select(col("ok"), col("pk").as("p_a"))
      .join(items.select(col("ok"), col("pk").as("p_b")), Seq("ok"))
      .filter(col("p_a") < col("p_b"))
      .groupBy("p_a", "p_b").agg(count(lit(1)).as(cntCol))
      .filter(col(cntCol) >= minCo)

  /** Undirected edge list (both directions) of [[pairs]], materialized
    * for iteration loops. Symmetrized by a single explode, not a
    * two-branch union — the union shape executed the whole pair
    * pipeline (self-join + aggregation) once PER BRANCH inside this
    * materialization (guide §2.3: one pass can carry both
    * directions). */
  def undirectedEdges(items: DataFrame): DataFrame =
    pairs(items)
      .select(explode(array(
          struct(col("p_a").as("src"), col("p_b").as("dst")),
          struct(col("p_b").as("src"), col("p_a").as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
      .localCheckpoint()
}
