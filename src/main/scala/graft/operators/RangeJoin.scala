package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join via bucketing — a join the reference never
  * needs (all its joins are integer equi-joins, SURVEY §2.3) but a
  * training-data pipeline does: points-in-window rollups, event-to-
  * session attribution, promo/maintenance-window scans.
  *
  * Spark has no native interval-join operator for batch; a naive
  * `points.join(intervals, pt.between(start, end))` plans as a
  * BroadcastNestedLoopJoin — O(|P|·|I|) and a driver OOM once the
  * interval side outgrows the broadcast threshold. The standard scale
  * shape is bucketing: quantize the point domain into fixed-width
  * bins, explode each interval to the bins it overlaps, equi-join on
  * the bin id, and apply the exact range predicate to the bucket-local
  * candidates. Work becomes O(|P| + |I|·span/bin + candidates), fully
  * shuffle-partitioned on the bin key — no broadcast, no nested loop,
  * survives an arbitrary scale-up as long as binWidth is chosen near
  * the typical interval span (replication factor = span/binWidth + 1).
  *
  * Composed entirely from built-in codegen'd expressions (design rule
  * (a)): floor-div for the point bin, sequence+explode for the
  * interval bins.
  */
object RangeJoin {
  /** Inner-joins `points` to `intervals` where
    * `pointCol ∈ [startCol, endCol]` (inclusive), with optional extra
    * equi-keys. All three range columns must be long-valued (cast
    * dates/timestamps to epoch days/seconds first); column names
    * across the two frames must be disjoint. */
  def binned(points: DataFrame, intervals: DataFrame,
             pointCol: String, startCol: String, endCol: String,
             binWidth: Long, extraKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth))
    val i = intervals.withColumn("__bin",
      explode(sequence(floor(col(startCol) / binWidth),
                       floor(col(endCol) / binWidth))))
    p.join(i, Seq("__bin") ++ extraKeys)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }

  /** Convenience for timestamp/date frames: DAY-GRANULAR containment —
    * the point's calendar day must lie within [start day, end day]
    * (all three truncated via to_date), NOT exact timestamp
    * containment: a 23:00 point matches an interval ending 08:00 the
    * same day. That is the attribution-window semantics the
    * q_range_join oracle pins (it casts to DATE the same way). For
    * exact timestamp bounds, cast to epoch seconds and call [[binned]]
    * directly — the exact predicate there runs on the values you
    * give it. */
  def binnedByDay(points: DataFrame, intervals: DataFrame,
                  pointTs: Column, startTs: Column, endTs: Column,
                  binDays: Int, extraKeys: Seq[String] = Nil): DataFrame = {
    val p = points.withColumn("__pt_day", unix_date(to_date(pointTs)).cast("long"))
    val i = intervals
      .withColumn("__start_day", unix_date(to_date(startTs)).cast("long"))
      .withColumn("__end_day", unix_date(to_date(endTs)).cast("long"))
    binned(p, i, "__pt_day", "__start_day", "__end_day", binDays.toLong, extraKeys)
      .drop("__pt_day", "__start_day", "__end_day")
  }
}
