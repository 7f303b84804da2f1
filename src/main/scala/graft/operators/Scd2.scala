package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 merge — versioned dimension rows
  * with (valid_from, valid_to) intervals, NULL valid_to marking the
  * open version. The reference's silver products table keeps
  * `is_active` + `last_updated_timestamp` (docs/data_model.md:104-105),
  * i.e. SCD1 overwrite; SCD2 is the history-preserving upgrade every
  * real dimension eventually needs.
  *
  * Merge semantics per key in `updates` (effective at `effectiveTs`):
  *   - attrs unchanged vs the open version → no-op;
  *   - attrs changed → close the open version (valid_to = effectiveTs)
  *     and append a new open version (valid_from = effectiveTs);
  *   - no open version → insert a new open version.
  * Keys absent from `updates` pass through untouched; closed history
  * rows always pass through untouched.
  *
  * Plan shape: one full-outer join of the open slice with the updates
  * on the pk + a union with the (untouched) closed slice — shuffle
  * only on the pk, change-sized output growth, idempotent for the
  * same (updates, effectiveTs) batch. Pair with LakehouseTable
  * .overwrite for the atomic swap.
  */
object Scd2 {
  def merge(current: DataFrame, updates: DataFrame, pk: Seq[String],
            attrs: Seq[String], effectiveTs: String): DataFrame = {
    // fail at the call, not as silent NULL valid_from rows: the
    // lit(...).cast("date") below nulls on an unparseable string
    require(scala.util.Try(java.sql.Date.valueOf(effectiveTs)).isSuccess,
      s"effectiveTs must be a yyyy-MM-dd date, got '$effectiveTs'")
    val vf = "valid_from"; val vt = "valid_to"
    val closed = current.filter(col(vt).isNotNull)
    val open   = current.filter(col(vt).isNull)

    // one update row per key: duplicate keys in a batch would fan the
    // join out and emit several open versions for one key (arbitrary-
    // winner dedup, the same contract as Upsert / the reference's
    // dropDuplicates-before-MERGE)
    val u = updates.dropDuplicates(pk).select(
      pk.map(c => col(c).as(s"__u_$c")) ++
        attrs.map(c => col(c).as(s"__u_$c")): _*)
    val joinCond = pk.map(c => col(c) === col(s"__u_$c")).reduce(_ && _)
    val j = open.join(u, joinCond, "full_outer")

    val hasOpen   = pk.map(c => col(c).isNotNull).reduce(_ && _)
    val hasUpdate = pk.map(c => col(s"__u_$c").isNotNull).reduce(_ && _)
    val changed   = attrs.map(c => !(col(c) <=> col(s"__u_$c"))).reduce(_ || _)

    val ets = lit(effectiveTs).cast("date")
    def out(pkc: String => Column, attrc: String => Column,
            vfc: Column, vtc: Column): Column = struct(
      pk.map(c => pkc(c).as(c)) ++ attrs.map(c => attrc(c).as(c)) :+
        vfc.as(vf) :+ vtc.as(vt): _*)

    // a join row yields 1-2 output rows; emitting them as an exploded
    // when-array keeps this a SINGLE pass over the join (three
    // filter+union branches would execute the full-outer join three
    // times — the inputs are exchange-reused but the join itself is not)
    val keptOpen = when(hasOpen && (!hasUpdate || !changed),
      out(col, col, col(vf), col(vt)))
    // an out-of-order batch (effectiveTs before the open version's
    // valid_from) would write an INVERTED interval (valid_to <
    // valid_from) and overlapping history — silent corruption every
    // downstream as-of lookup inherits. raise_error makes it fail
    // loudly at execution, with the offending key's dates, at zero
    // cost on the in-order path.
    val closeTs = when(ets >= col(vf), ets).otherwise(raise_error(concat(
      lit(s"Scd2.merge: effectiveTs $effectiveTs predates open valid_from "),
      col(vf).cast("string"),
      lit(" — out-of-order batch; replay batches in order"))))
    val closedNow = when(hasOpen && hasUpdate && changed,
      out(col, col, col(vf), closeTs))
    val opened = when(hasUpdate && (!hasOpen || changed),
      out(c => col(s"__u_$c"), c => col(s"__u_$c"), ets, lit(null).cast("date")))

    val merged = j
      .select(explode(filter(array(keptOpen, closedNow, opened),
                             _.isNotNull)).as("__r"))
      .select(col("__r.*"))

    closed.unionByName(merged.select(current.columns.map(col): _*))
  }
}
