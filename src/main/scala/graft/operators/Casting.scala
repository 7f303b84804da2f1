package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, TimestampType}

/** Schema-driven cast loop.
  *
  * Reference semantics (etl_utils.py:320-354, glue_etl.py:296-312):
  *   - every declared field present in the frame is cast to its declared
  *     type; a value that cannot be cast becomes NULL (Spark's default
  *     ANSI-off cast behavior);
  *   - declared fields missing from the frame are skipped (logged);
  *   - timestamp fields go through to_timestamp so bare ISO strings parse;
  *   - undeclared extra columns pass through untouched.
  *
  * Casts are per-row scalar expressions — fully whole-stage-codegen'd,
  * no shuffle, so this scales linearly with input size.
  */
object Casting {
  /** Column reference by EXACT name: backtick-quoted so names
    * containing dots (legal in CSV/Excel headers, e.g. "order.total")
    * resolve as columns, not struct-field paths. */
  private[graft] def ref(name: String) =
    col("`" + name.replace("`", "``") + "`")

  def castTo(df: DataFrame, schema: StructType): DataFrame = {
    val present = df.columns.toSet
    // ANSI-off sessions (the engine's standard everywhere) get the
    // legacy cast — the REFERENCE's exact semantics (Spark 3.5, ANSI
    // off): malformed strings null WITHOUT exceptions, and numeric
    // downcasts wrap exactly as the reference job would wrap them.
    // try_cast is kept only for ANSI-on sessions, where a plain cast
    // would throw; note it is a slightly different contract there
    // (numeric overflow nulls instead of wrapping), and its TryEval
    // catches a real JVM exception per failing row — on a
    // systematically uncastable column that turns a scan into an
    // exception storm (600k throws ≈ seconds at sf0.1), which is why
    // it must never be the ANSI-off path.
    val ansiOn = df.sparkSession.conf
      .get("spark.sql.ansi.enabled", "true").toBoolean
    schema.fields.filter(f => present.contains(f.name)).foldLeft(df) {
      (acc, f) =>
        val c = f.dataType match {
          // try_to_timestamp, not to_timestamp: under ANSI mode
          // (Spark 4 default) to_timestamp throws on malformed input;
          // the null-on-error contract must hold independent of the
          // session's spark.sql.ansi.enabled setting.
          case TimestampType => try_to_timestamp(ref(f.name))
          case dt if ansiOn  => ref(f.name).try_cast(dt)
          case dt            => ref(f.name).cast(dt)
        }
        acc.withColumn(f.name, c)
    }
  }

  /** Declared fields absent from the frame (reference warns + skips). */
  def missingColumns(df: DataFrame, schema: StructType): Seq[String] =
    schema.fieldNames.toSeq.filterNot(df.columns.contains)

  /** Strict schema conformance for append-only tables whose schema is
    * pinned by the first written batch: every pinned field cast
    * null-on-error (castTo rules), fields the batch is missing become
    * typed nulls, undeclared extras are DROPPED, and the pinned column
    * order is restored. Without this, a later file whose inferSchema
    * drifts (int→string, new column) would append conflicting parquet
    * schemas into one directory and poison every later read. */
  def conformTo(df: DataFrame, schema: StructType): DataFrame = {
    val cast = castTo(df, schema)
    val present = cast.columns.toSet
    cast.select(schema.fields.toSeq.map { f =>
      if (present.contains(f.name)) ref(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }
}
