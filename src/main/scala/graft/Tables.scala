package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-generated testdata (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. All queries in
  * [[SparkEntry.queries]] read through here so scan options stay in one
  * place. At 100 TB these would be partitioned directory trees; the
  * reader call is identical (`spark.read.parquet(dir)`), so nothing in
  * the query layer changes with scale.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) — Spark 4 has no ns
      // timestamp type; read as long then truncate to µs (integer div:
      // ns epochs overflow double precision).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}

/** Per-query context: lazily bound tables for one scale-factor dir. */
final case class Ctx(spark: SparkSession, dir: String) {
  def t(name: String): DataFrame = Tables.load(spark, dir, name)
  def region     = t("region")
  def nation     = t("nation")
  def customer   = t("customer")
  def supplier   = t("supplier")
  def part       = t("part")
  def orders     = t("orders")
  def lineitem   = t("lineitem")
  def events     = t("events")
  def documents  = t("documents")
  def embeddings = t("embeddings")
}
