package graft.tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level diff between two versions of a keyed table — the CDC
  * (change-data-capture) primitive a lakehouse without a transaction
  * log still needs: downstream incremental consumers ask "what changed
  * between yesterday's snapshot and today's?".
  *
  * One full-outer join on the pk, comparing the non-key columns as a
  * null-safe struct equality (no hashing — a hash would false-negative
  * on collisions and adds a pass over every column anyway). Each side
  * is classified inserted / deleted / updated; unchanged rows drop out
  * before anything else is computed, so the output is change-sized,
  * not table-sized. Shuffles once per side on the pk — the minimum for
  * an unsorted comparison; on bucketed tables (tables.Bucketing) the
  * exchange disappears entirely.
  */
object SnapshotDiff {
  /** (pk columns..., change ∈ {inserted, deleted, updated}) — one row
    * per changed key. `before`/`after` must share the full schema. */
  def diff(before: DataFrame, after: DataFrame, pk: Seq[String]): DataFrame = {
    val attrs = before.columns.filterNot(pk.contains).toSeq
    require(after.columns.filterNot(pk.contains).toSeq == attrs,
      "before/after schemas must match")
    def packed(df: DataFrame, side: String) = df.select(
      pk.map(col) :+
        struct(attrs.map(col): _*).as(s"__${side}_attrs") :+
        lit(1).as(s"__${side}_present"): _*)
    packed(before, "b")
      .join(packed(after, "a"), pk, "full_outer")
      .withColumn("change",
        when(col("__b_present").isNull, "inserted")
          .when(col("__a_present").isNull, "deleted")
          .when(!(col("__b_attrs") <=> col("__a_attrs")), "updated"))
      .filter(col("change").isNotNull)
      .select(pk.map(col) :+ col("change"): _*)
  }
}
