package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal backward) join: for each left row, attach the most
  * recent right row with the same key and time ≤ the left row's time.
  *
  * Spark has no ASOF JOIN operator; per the design preference order
  * this composes built-ins rather than adding a custom SparkPlan: tag
  * both sides, union, and run `last(_, ignoreNulls)` over a
  * (key, time)-ordered window. Cost: ONE shuffle on the key + an
  * in-partition sort — the same asymptotics as a dedicated merge-based
  * as-of physical operator, with codegen/AQE applying as usual (an
  * inequality-join formulation would explode instead). Scales linearly
  * at 100 TB.
  *
  * Tie semantics: a right row at exactly the left row's time matches
  * (right sorts before left at equal times) — same as DuckDB/kdb ASOF.
  */
object AsOfJoin {
  /** leftTime/rightTime must share a comparable type (e.g. µs longs).
    * `carry` = right-side columns to attach, emitted as `asof_<name>`
    * (null when no right row precedes the left row).
    *
    * The carry columns travel as ONE struct through a single
    * last(ignoreNulls): all asof_* values come from the SAME (most
    * recent) right row — per-column lasts would stitch fields from
    * different rows whenever a carry value is legitimately NULL (and
    * make that NULL invisible, resurrecting an older row's value).
    * NULL keys never match, same as any SQL equi-join / DuckDB ASOF:
    * null-key right rows contribute nothing, null-key left rows carry
    * null. */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           carry: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val rStruct = struct(carry.map(c => col(c).as(c)): _*)
    val rType = right.select(rStruct.as("__r")).schema("__r").dataType
    val lAligned = left.select(
      Seq(col(key).as("__k"), col(leftTime).as("__t"), lit(1).as("__side")) ++
        lCols.map(col) :+ lit(null).cast(rType).as("__r"): _*)
    val rAligned = right.select(
      Seq(col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__side")) ++
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        when(col(key).isNotNull, rStruct).otherwise(lit(null).cast(rType))
          .as("__r"): _*)
    // third ordering key = the carry struct itself: multiple RIGHT
    // rows at the same (key, time) would otherwise leave last() to
    // shuffle order — run-to-run nondeterminism in an operator whose
    // consumers hash-compare results (the tie-break discipline every
    // other arbitrary-winner op here pins: Dedup.keepFirst, TopKPairs).
    // Rule: ties resolve to the GREATEST carry tuple, deterministically.
    // Struct ordering requires orderable carry types (atomics/arrays);
    // an unorderable carry (map) fails loudly at analysis, not silently.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAligned.unionByName(rAligned)
      .withColumn("__last", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(lCols.map(col) ++
        carry.map(c => col("__last").getField(c).as(s"asof_$c")): _*)
  }
}
