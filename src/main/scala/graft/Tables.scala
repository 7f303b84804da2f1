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
      // events.ts has shipped as both parquet TIMESTAMP(NANOS) and
      // TIMESTAMP(MICROS) across testdata generations — normalize to
      // TimestampType µs either way. Nanos: Spark 4 has no ns type, so
      // read as long (nanosAsLong) and integer-truncate to µs (ns
      // epochs overflow double precision). Micros: isAdjustedToUTC
      // false reads as TIMESTAMP_NTZ; session TZ is pinned UTC, so the
      // cast to TimestampType is instant-preserving.
      // KNOWN SIDE EFFECT: nanosAsLong is a session-wide SQLConf (no
      // per-read option exists) — after this call, OTHER parquet reads
      // in the session also map TIMESTAMP(NANOS) columns to LongType
      // instead of failing. Every repo entry point (Verify/Bench/
      // Profile/TestSpark) already sets it at session build, so this
      // is belt-and-braces for ad-hoc sessions; library callers who
      // need strict nanos handling should set the conf themselves and
      // not rely on load-order.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampType}
      df.schema("ts").dataType match {
        case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampType => df
        case _ => df.withColumn("ts", col("ts").cast(TimestampType))
      }
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
