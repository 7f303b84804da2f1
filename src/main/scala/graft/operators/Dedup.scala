package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * The reference's PK dedup (glue_etl.py:395-404, dropDuplicates) keeps
  * an *arbitrary* row per key. We provide that, plus a deterministic
  * variant (explicit tie-break ordering) which is what the oracle-checked
  * queries use — arbitrary winners cannot be cross-checked against SQL.
  *
  * Both are single-shuffle on the key columns. `keepFirst` uses a
  * row_number window (shuffle + in-partition sort); at 100 TB prefer it
  * over `groupBy(keys).agg(min_by(...))` only when whole surviving rows
  * are needed — otherwise min/max aggregates are cheaper.
  */
object Dedup {
  /** Reference-parity arbitrary-winner dedup. */
  def byKey(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Deterministic dedup: keep the first row per key under `order`. */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** count vs distinct-count duplicate detection
    * (docs/data_quality.md:152-162). */
  def duplicateStats(df: DataFrame, keys: Seq[String]): DataFrame = {
    // ONE aggregate pass: count + count_distinct share a single scan
    // (two separate .count() jobs doubled the I/O of this check)
    val r = df.agg(
      count(lit(1)).as("total"),
      count_distinct(struct(keys.map(col): _*)).as("dist")).head()
    val (total, dist) = (r.getLong(0), r.getLong(1))
    import df.sparkSession.implicits._
    Seq((total, dist, total - dist))
      .toDF("total_rows", "distinct_keys", "duplicate_rows")
  }
}
