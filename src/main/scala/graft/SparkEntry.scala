package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    gold.Gold.customerInsights(Ctx(spark, "/root/testdata/sf0.001"))

  private def allDefs = Queries.defs ++ QueriesText.defs ++ QueriesAnalytics.defs

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * beyond-reference training-data pipeline ops). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (name, d) => name -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (name, d) if d.oracle.isDefined =>
      name -> d.oracle.get
    }
}
