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

  /** Inferred-schema cache, keyed by file path. A bare
    * `spark.read.parquet(path)` runs schema inference on EVERY call —
    * a listing plus a footer-reading Spark job — measured at ~100 ms
    * per call on this host vs ~9 ms with an explicit schema (guide
    * §6: file listing/footer work is driver-side, O(files), and pure
    * overhead when the schema is already known). The fixture files are
    * immutable for the life of a bench/verify JVM, so one inference
    * per (path) serves every later read; at 100 TB this is exactly
    * the role a table catalog plays (the lakehouse layer's
    * [[graft.tables.LakehouseTable.liveSchema]] does the same with an
    * epoch-keyed cache). Results are unchanged: the cached schema IS
    * the file's inferred schema. Never persisted across JVMs. */
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.types.StructType]()

  private def readCached(spark: SparkSession, path: String): DataFrame = {
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    spark.read.schema(schema).parquet(path)
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped as both parquet TIMESTAMP(NANOS) and
      // TIMESTAMP(MICROS) across testdata generations — normalize to
      // TimestampType µs either way. Nanos: Spark 4 has no ns type, so
      // read as long (nanosAsLong) and integer-truncate to µs (ns
      // epochs overflow double precision). Micros: isAdjustedToUTC
      // false reads as TIMESTAMP_NTZ; session TZ is pinned UTC, so the
      // cast to TimestampType is instant-preserving.
      // nanosAsLong is a session-wide SQLConf with no per-read option,
      // and it is consulted again at EXECUTION time (per-file footer
      // conversion), so a set-and-restore around this call could break
      // the actual row read later. The library therefore never mutates
      // it: every repo entry point (Verify/Bench/Profile/TestSpark)
      // sets it at session BUILD, and an ad-hoc session hitting a
      // nanos-generation file gets an actionable error instead of a
      // silent session-wide conf flip (r8 verdict watch item).
      val df =
        try readCached(spark, s"$dir/$name.parquet")
        catch {
          case e: Throwable
            if Option(e.getMessage).exists(_.contains("NANOS")) =>
              throw new IllegalStateException(
                s"$dir/$name.parquet carries TIMESTAMP(NANOS) columns: " +
                "set spark.sql.legacy.parquet.nanosAsLong=true when " +
                "BUILDING the SparkSession (as graft.Verify/Bench/" +
                "Profile do) — Tables.load no longer flips this " +
                "session-wide conf on the caller's behalf", e)
        }
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampType}
      df.schema("ts").dataType match {
        case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case TimestampType => df
        case _ => df.withColumn("ts", col("ts").cast(TimestampType))
      }
    } else readCached(spark, s"$dir/$name.parquet")
  }

  /** Reconstruct a warehouse's full table catalog in this session —
    * see [[graft.tables.Catalog.attach]]. One call makes every table
    * a writer session registered via [[graft.tables.Catalog.register]]
    * SQL-queryable here (the multi-session surface the reference gets
    * from the Glue Data Catalog + Athena). */
  def attach(spark: SparkSession, warehouseRoot: String)
      : Seq[(graft.tables.Catalog.Entry, String)] =
    graft.tables.Catalog.attach(spark, warehouseRoot)
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
