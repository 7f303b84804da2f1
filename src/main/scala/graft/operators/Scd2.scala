package graft.operators

import org.apache.spark.sql.DataFrame
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
    val vf = "valid_from"; val vt = "valid_to"
    val closed = current.filter(col(vt).isNotNull)
    val open   = current.filter(col(vt).isNull)

    val u = updates.select(
      pk.map(c => col(c).as(s"__u_$c")) ++
        attrs.map(c => col(c).as(s"__u_$c")): _*)
    val joinCond = pk.map(c => col(c) === col(s"__u_$c")).reduce(_ && _)
    val j = open.join(u, joinCond, "full_outer")

    val hasOpen   = pk.map(c => col(c).isNotNull).reduce(_ && _)
    val hasUpdate = pk.map(c => col(s"__u_$c").isNotNull).reduce(_ && _)
    val changed   = attrs.map(c => !(col(c) <=> col(s"__u_$c"))).reduce(_ || _)

    // open versions that survive as-is: no update, or update is a no-op
    val keptOpen = j.filter(hasOpen && (!hasUpdate || !changed))
      .select(current.columns.map(col): _*)
    // open versions closed by a changed update
    val closedNow = j.filter(hasOpen && hasUpdate && changed)
      .select(pk.map(col) ++ attrs.map(col) :+
        col(vf) :+ lit(effectiveTs).cast("date").as(vt): _*)
    // new open versions: changed update or brand-new key
    val opened = j.filter(hasUpdate && (!hasOpen || changed))
      .select(pk.map(c => col(s"__u_$c").as(c)) ++
        attrs.map(c => col(s"__u_$c").as(c)) :+
        lit(effectiveTs).cast("date").as(vf) :+
        lit(null).cast("date").as(vt): _*)

    closed.unionByName(keptOpen).unionByName(closedNow).unionByName(opened)
  }
}
