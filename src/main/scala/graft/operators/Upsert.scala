package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Delta-MERGE emulation (SURVEY.md §7.4; reference glue_etl.py:442-458).
  *
  * `whenMatchedUpdateAll + whenNotMatchedInsertAll` with update-wins
  * semantics is exactly:
  *
  *   updates ∪ (target ⟕̸ updates on pk)
  *
  * i.e. every update row survives, and target rows survive only when no
  * update shares their key. Idempotent: re-applying the same batch is a
  * no-op, preserving the reference's at-least-once ingestion contract.
  *
  * Scale notes: the anti-join shuffles on the pk unless the updates key
  * set is small enough to broadcast — typical for incremental batches
  * against a big target, so we broadcast the key set when asked. The
  * union itself is free (no shuffle).
  */
object Upsert {
  /** Update-wins MERGE. Duplicate-pk update rows are collapsed first
    * (arbitrary winner — at-least-once re-deliveries are identical
    * rows, so the winner is value-irrelevant; callers needing a
    * deterministic winner dedup with an ordering BEFORE calling, as
    * the silver stage does): without it, both copies survive the
    * union and the target ends up with duplicate pk rows — Delta
    * MERGE errors on exactly this. Pre-deduplicated callers use
    * [[merge]] and skip the redundant exchange. */
  def upsert(target: DataFrame, updates: DataFrame, pk: Seq[String],
             broadcastUpdates: Boolean = true): DataFrame =
    merge(target, updates.dropDuplicates(pk), pk, broadcastUpdates)

  /** [[upsert]] whose `updates` are ALREADY pk-unique (the caller
    * deduplicated, typically with a deterministic ordering). */
  private[graft] def merge(target: DataFrame, updates: DataFrame,
                           pk: Seq[String],
                           broadcastUpdates: Boolean = true): DataFrame = {
    val keyCols = pk.map(col)
    val keys0   = updates.select(keyCols: _*).distinct()
    val keys    = if (broadcastUpdates) broadcast(keys0) else keys0
    val kept    = target.join(keys, pk, "left_anti")
    updates.unionByName(kept)
  }

  /** CDC apply: the full MERGE surface — upserts AND deletes in one
    * pass. `changes` carries the target schema plus a boolean
    * `deleteCol`; rows with it true delete their key, the rest
    * (false OR NULL — CDC extracts routinely leave the flag null on
    * updates) update-wins upsert. Same single anti-join shape as
    * [[upsert]] (ALL change keys leave the target, surviving upserts
    * come back via the union), so deletes cost nothing extra.
    * Idempotent. */
  def applyChanges(target: DataFrame, changes: DataFrame, pk: Seq[String],
                   deleteCol: String,
                   broadcastChanges: Boolean = true): DataFrame = {
    // same duplicate-pk collapse as [[upsert]] — two surviving change
    // rows for one key would both reach the union. A key carrying BOTH
    // a delete and an update in one batch gets an arbitrary winner:
    // batches with conflicting changes per key must be ordered by the
    // caller (one change per key per batch is the CDC extract norm).
    val deduped = changes.dropDuplicates(pk)
    val keys0 = deduped.select(pk.map(col): _*).distinct()
    val keys  = if (broadcastChanges) broadcast(keys0) else keys0
    val kept  = target.join(keys, pk, "left_anti")
    // NULL flag must mean "not a delete": a bare !col filter drops
    // NULL-flag rows AFTER their key was anti-joined out — the row
    // would vanish entirely instead of being updated
    deduped.filter(!coalesce(col(deleteCol), lit(false)))
      .drop(deleteCol).unionByName(kept)
  }
}
