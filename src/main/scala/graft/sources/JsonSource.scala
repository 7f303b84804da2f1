package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSON-lines source (beyond the reference's CSV ingest — the other
  * format a training-data landing zone actually receives: crawler
  * output, API event logs).
  *
  * Mirrors the engine's two-phase CSV contract (SURVEY §2.1 S1 +
  * P10): schema is declared, not inferred twice, and malformed records
  * follow the same null-on-error / quarantine discipline as the cast
  * loop — PERMISSIVE mode routes unparseable lines to a corrupt-record
  * column so the caller can split valid/rejected exactly like
  * `Validation.split`. Scale: schema'd JSON parsing is a pure per-row
  * projection (no shuffle, whole file-parallel).
  */
object JsonSource {
  val CorruptCol = "_corrupt_record"

  /** Schema'd json-lines read with corrupt-record capture.
    *
    * Reads the file as TEXT and parses with from_json rather than
    * using the raw JSON relation: Spark disallows queries whose
    * referenced columns prune down to only `_corrupt_record` on a raw
    * JSON scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN — `corrupt.count()`
    * trips it after column pruning), and the sanctioned workaround is
    * cache(), which leaks blocks for the session lifetime. Parsing a
    * text relation has no such restriction, needs no materialization,
    * and is the same single pass over the bytes. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.text(path)
      // blank lines: the .json() datasource skips them; text+from_json
      // would otherwise turn them into phantom all-null "valid" rows
      .filter(length(trim(col("value"))) > 0)
      .select(col("value"), from_json(col("value"),
          schema.add(StructField(CorruptCol, StringType)),
          Map("mode" -> "PERMISSIVE",
              "columnNameOfCorruptRecord" -> CorruptCol)).as("__p"))
      // a JSON `null` literal parses to a NULL struct (no corrupt col
      // to carry the line) — classify it as corrupt with the raw line.
      // getField, not a parsed "__p.name" path string: a field name
      // containing a dot (legal in JSON keys, supported by Casting.ref
      // elsewhere) would otherwise resolve as a deeper nested path
      .select(schema.fieldNames.toSeq
          .map(f => col("__p").getField(f).as(f)) :+
        coalesce(col("__p").getField(CorruptCol),
                 when(col("__p").isNull, col("value"))).as(CorruptCol): _*)

  /** (valid-without-corrupt-col, corrupt-lines) split. */
  def split(df: DataFrame): (DataFrame, DataFrame) =
    (df.filter(col(CorruptCol).isNull).drop(CorruptCol),
     df.filter(col(CorruptCol).isNotNull).select(col(CorruptCol)))

  /** Parse a JSON string column against a declared schema (the
    * in-table variant: events.props-style payload columns).
    * Unparseable strings become a NULL struct — same null-on-error
    * contract as Casting.castTo. */
  def parseColumn(df: DataFrame, jsonCol: String, schema: StructType,
                  outCol: String): DataFrame =
    df.withColumn(outCol, from_json(col(jsonCol), schema))
}
