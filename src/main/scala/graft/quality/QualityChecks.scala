package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality check framework (reference docs/data_quality.md:139-372).
  *
  * Each check computes distributed aggregates and returns one row
  * (check_name, table_name, metric, value, passed) — results union into
  * a quality report the pipeline can gate on, mirroring the reference's
  * WARN thresholds (RI breach >0.1 %, completeness >1 %, metric
  * discrepancy >1 % ⇒ alert, :414-421). All checks are single-pass
  * aggregations or broadcast anti-joins — nothing collects to the
  * driver beyond the one-row verdicts.
  */
object QualityChecks {
  final case class Check(check: String, table: String, metric: Double,
                         passed: Boolean)

  private def result(spark: SparkSession, rows: Seq[Check]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }

  /** Duplicate-PK check (data_quality.md:152-162). ONE aggregate pass
    * — count + count_distinct share a single scan (the two-job
    * count/distinct-count form doubles the I/O of this check; same
    * lesson as [[graft.operators.Dedup.duplicateStats]]). */
  def duplicatePk(df: DataFrame, table: String, pk: Seq[String]): Check = {
    val r = df.agg(count(lit(1)).as("t"),
                   count_distinct(struct(pk.map(col): _*)).as("d")).head()
    val dups = r.getLong(0) - r.getLong(1)
    Check("duplicate_pk", table, dups.toDouble, dups == 0)
  }

  /** Null-required-fields check (data_quality.md:165-185). */
  def nullRequired(df: DataFrame, table: String, required: Seq[String]): Check = {
    val cond = required.map(col(_).isNull).reduce(_ || _)
    val n = df.filter(cond).count()
    Check("null_required_fields", table, n.toDouble, n == 0)
  }

  /** FK-integrity check via anti-join count (data_quality.md:235-239);
    * threshold is the reference's 0.1 % RI-breach SLA. NULL foreign
    * keys are NOT orphans (SQL FK semantics: NULL = no parent, legal —
    * gate them with [[nullRequired]] if the column is mandatory). The
    * dim key is aliased before the join so fk and pk may share a name
    * (the star-schema norm) without an ambiguous-reference failure. */
  def fkIntegrity(fact: DataFrame, dim: DataFrame, fk: String, pk: String,
                  table: String, maxBreachRatio: Double = 0.001): Check = {
    val total = fact.count().max(1L)
    val orphans = fact
      .filter(col(fk).isNotNull)
      .join(broadcast(dim.select(col(pk).as("__fk_pk")).distinct()),
            col(fk) === col("__fk_pk"), "left_anti").count()
    val ratio = orphans.toDouble / total
    Check(s"fk_$fk", table, ratio, ratio <= maxBreachRatio)
  }

  /** Numeric-range check: share of rows outside [lo, hi]
    * (data_quality.md:249-259). ONE aggregate pass — total and
    * violation count share a single scan. */
  def range(df: DataFrame, table: String, column: String,
            lo: Double, hi: Double, maxViolRatio: Double = 0.005): Check = {
    val r = df.agg(count(lit(1)).as("t"),
                   count(when(col(column) < lo || col(column) > hi, 1))
                     .as("v")).head()
    val ratio = r.getLong(1).toDouble / r.getLong(0).max(1L)
    Check(s"range_$column", table, ratio, ratio <= maxViolRatio)
  }

  /** Gold-vs-recalculated reconciliation (data_quality.md:301-372):
    * FULL-OUTER join on the key, compare each metric within
    * `tolerance`. Returns the number of mismatching rows as the
    * metric. Full outer + null-safe comparison on purpose: an inner
    * join would silently PASS when the recalc (or gold) side lost rows
    * — the exact pipeline bug reconciliation exists to catch — and a
    * null metric would null out the > comparison and count as a
    * match. A key present on only one side, or a metric null on
    * exactly one side, is a mismatch; null==null matches.
    *
    * `tolerance` is RELATIVE — the reference contract is "metric
    * discrepancy >1 % => alert" (data_quality.md:414-421), a
    * proportional SLA: an ABSOLUTE 0.01 would flag a money total of
    * 1,000,000.00 vs 1,000,000.05 (0.000005 % off) while passing a
    * rate of 0.500 vs 0.509 (1.8 % off). |g-r| must be within
    * tolerance x max(|g|,|r|), with a 1e-9 absolute floor so
    * float-dust differences near zero do not flag. */
  def reconcile(gold: DataFrame, recalc: DataFrame, key: Seq[String],
                metrics: Seq[String], table: String,
                tolerance: Double = 0.01): Check = {
    val g = gold.withColumn("__g", lit(true))
    val r = metrics.foldLeft(recalc) { (d, m) =>
      d.withColumnRenamed(m, s"${m}_rc") }.withColumn("__r", lit(true))
    val joined = g.join(r, key, "full_outer")
    val bothNull = (m: String) => col(m).isNull && col(s"${m}_rc").isNull
    val withinTol = (m: String) =>
      coalesce(abs(col(m) - col(s"${m}_rc")) <=
        greatest(greatest(abs(col(m)), abs(col(s"${m}_rc"))) * tolerance,
                 lit(1e-9)), lit(false))
    val bad = col("__g").isNull || col("__r").isNull ||
      metrics.map(m => !(bothNull(m) || withinTol(m))).reduce(_ || _)
    val n = joined.filter(bad).count()
    Check("gold_reconciliation", table, n.toDouble, n == 0)
  }

  /** Bundle into a report frame. */
  def report(spark: SparkSession, checks: Seq[Check]): DataFrame =
    result(spark, checks)
}
