package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Row-validation rules engine.
  *
  * Reference semantics (etl_utils.py:109-297): each failed rule
  * contributes one message; messages accumulate into an array
  * (array_union ⇒ duplicates collapse), are joined with "; " into a
  * single `validation_errors` string, and NULL marks a valid row. The
  * frame is then split into (valid, rejected).
  *
  * Everything here is per-row expression work plus (for RI rules) a
  * broadcast left-anti join — no driver-side collect, no unnecessary
  * shuffle; the v1 `isin(collect())` anti-pattern is deliberately not
  * reproduced (the reference's own refactor replaces it,
  * etl_utils.py:168-245).
  */
final case class Rule(failWhen: Column, message: String)

object Validation {
  val ErrCol = "validation_errors"

  /** Non-null checks for every non-nullable field of a declared schema
    * (etl_utils.py:148-159). */
  def requiredFieldRules(schema: StructType): Seq[Rule] =
    schema.fields.filterNot(_.nullable).toSeq.map { f =>
      // Casting.ref, not bare col(): a dotted field name (legal in
      // CSV/Excel headers, the reason ref() exists) would parse as a
      // struct path here and throw — or silently resolve a struct
      // field — while the cast loop next to it backtick-quotes
      Rule(Casting.ref(f.name).isNull, s"Missing required field: ${f.name}")
    }

  /** Error-string column: NULL when valid. array_distinct preserves the
    * reference's array_union dedup of repeated messages.
    *
    * Fast path: when every rule carries a distinct non-empty message
    * (the overwhelmingly common case), array_distinct is a no-op and
    * concat_ws already skips NULL arguments — so the whole accumulation
    * collapses to one codegen'd concat_ws over the when-columns, with
    * no array allocation and no higher-order filter (ArrayFilter is
    * CodegenFallback: it would drop the hot per-row path out of
    * whole-stage codegen). */
  def errorColumn(rules: Seq[Rule]): Column = {
    val msgs = rules.map(r => when(r.failWhen, lit(r.message)))
    val distinctMsgs = rules.map(_.message).distinct.size == rules.size
    if (distinctMsgs && rules.forall(_.message.nonEmpty))
      nullif(concat_ws("; ", msgs: _*), lit(""))
    else {
      val arr = array_distinct(filter(array(msgs: _*), _.isNotNull))
      when(size(arr) > 0, concat_ws("; ", arr))
    }
  }

  def withErrors(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.withColumn(ErrCol, errorColumn(rules))

  /** (valid-without-error-col, rejected-with-error-col) split —
    * glue_etl.py:246-249. */
  def split(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val tagged = withErrors(df, rules)
    (tagged.filter(col(ErrCol).isNull).drop(ErrCol),
     tagged.filter(col(ErrCol).isNotNull))
  }

  /** Rows of `df` whose `fk` has no match in `ref.pk` — RI violations as
    * a distributed anti-join (etl_utils.py:170-179). `ref` key sets are
    * dimension-sized, so broadcast keeps this shuffle-free on the fact
    * side at any scale. */
  def riViolations(df: DataFrame, ref: DataFrame, fk: String, pk: String,
                   broadcastRef: Boolean = true): DataFrame = {
    // broadcastRef = true is the REFERENCE shape (fact fk vs a
    // dimension's pk — a dim-sized key set, forced broadcast keeps the
    // check shuffle-free). Pass FALSE when `ref` is fact-derived: the
    // forced hint would drag a fact-cardinality distinct through the
    // driver at 100 TB; un-hinted, the planner shuffles and AQE still
    // upgrades to broadcast when the key set turns out small.
    val keys = ref.select(col(pk)).distinct()
    df.join(if (broadcastRef) broadcast(keys) else keys,
            col(fk) === col(pk), "left_anti")
  }

  /** FK-violation membership flag joined back onto `df` (the v2
    * left-outer tag pattern, etl_utils.py:182-245): adds a boolean
    * `flagName` column, true when fk has no match in ref. */
  def tagRiViolations(df: DataFrame, ref: DataFrame, fk: String, pk: String,
                      flagName: String,
                      broadcastRef: Boolean = true): DataFrame = {
    // broadcastRef contract as in [[riViolations]]
    val keys0 = ref.select(col(pk).as("__ri_pk")).distinct()
      .withColumn("__ri_hit", lit(1))
    val keys = if (broadcastRef) broadcast(keys0) else keys0
    df.join(keys, col(fk) === col("__ri_pk"), "left_outer")
      .withColumn(flagName, col("__ri_hit").isNull)
      .drop("__ri_pk", "__ri_hit")
  }
}
