package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Largest-remainder budget allocation (the training-mix operator):
  * split an integer `budget` across the rows of `df` proportionally to
  * `weightCol`, exactly — every allocation is an integer within one
  * unit of its proportional share, and they sum to the budget
  * precisely (floor shares, then one extra unit to the rows with the
  * largest fractional remainders; ties broken by `keyCol`).
  *
  * Scale shape: the input is one row per allocation key (source,
  * domain, language — dozens to thousands of rows at any corpus size),
  * produced by a data-sized aggregation upstream; the window ranks
  * THESE rows, never the corpus. The 1-row totals broadcast. Double
  * products are exact below 2^53 weight-units; lift the multiply to
  * DECIMAL(38,0) beyond that.
  */
object Allocation {
  def largestRemainder(df: DataFrame, keyCol: String, weightCol: String,
                       budget: Long): DataFrame = {
    val tot = df.agg(sum(col(weightCol)).as("__total"))
    val f = df.crossJoin(broadcast(tot))
      // 0/0 would flow NaN through floor and silently allocate nothing;
      // a zero or negative weight total must fail loudly instead. The
      // check lives INSIDE __raw's lineage — a free-standing assert
      // column gets pruned by Catalyst and never evaluates.
      // isNull is part of the guard: an all-NULL weight column sums to
      // NULL, and `NULL <= 0` is NULL — the bare comparison would fall
      // through to the otherwise branch and silently allocate null to
      // every row, the exact failure this guard exists to surface
      .withColumn("__raw",
        when(col("__total").isNull || col("__total") <= 0, raise_error(
          lit(s"largestRemainder: total $weightCol must be > 0 and " +
            "non-null")).cast("double"))
        .otherwise(col(weightCol) * lit(budget.toDouble) / col("__total")))
      .withColumn("__floor", floor(col("__raw")).cast("long"))
      .withColumn("__frac", col("__raw") - col("__floor"))
    val ranked = f.withColumn("__rk",
      row_number().over(Window.orderBy(col("__frac").desc, col(keyCol))))
    val fsum = ranked.agg(sum("__floor").as("__fsum"))
    ranked.crossJoin(broadcast(fsum))
      .withColumn("alloc",
        (col("__floor") +
         when(col("__rk") <= lit(budget) - col("__fsum"), 1).otherwise(0))
          .cast("long"))
      .drop("__total", "__raw", "__floor", "__frac", "__rk", "__fsum")
  }
}
