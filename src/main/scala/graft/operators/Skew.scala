package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY §4: "salting for skew").
  *
  * AQE's skew-join split handles sort-merge skew automatically, but two
  * shapes still need manual salting at 100 TB:
  *   - aggregation hot keys: one reducer owns the hot group →
  *     [[saltedAgg]] does a two-level aggregate (partial per salt,
  *     final merge) so the hot group fans out over `salts` reducers;
  *   - broadcast-averse skewed joins where the big side's hot key
  *     must spread: [[saltedJoin]] replicates the small side per salt.
  *
  * Salts are deterministic (hash of the row's key + a stable column),
  * so results are reproducible.
  */
object Skew {
  /** Two-level aggregation: groupBy (keys + salt) with `partial`
    * aggregates, then merge with `finalAgg`. Caller supplies both
    * halves of the decomposition (e.g. partial sum → final sum,
    * partial count → final sum). */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int,
                saltOn: Column,
                partial: Seq[Column], finalAgg: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltOn), lit(salts)))
    val pre = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    pre.groupBy(keys.map(col): _*)
      .agg(finalAgg.head, finalAgg.tail: _*)
  }

  /** Skewed equi-join: salt the big (skewed) side into [0, salts),
    * replicate every small-side row `salts` times, join on
    * (key, salt). Semantically identical to the plain join; the hot
    * key's rows spread over `salts` tasks.
    *
    * The salt is deliberately row-NONdeterministic
    * (monotonically_increasing_id depends on partition layout, so a
    * retried task may assign different salts): results are unaffected
    * — every small-side row exists under every salt, so each big row
    * finds its match whatever salt it draws — and a content-derived
    * salt would put exact-duplicate rows (boilerplate-heavy hot keys,
    * the exact case salting exists for) all in ONE salt bucket,
    * re-creating the hot partition. Don't reuse this salt for
    * anything that must reproduce across runs. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    // Replicating the small side `salts`× would emit `salts` copies of
    // each UNMATCHED small-side row under right/full outer — only join
    // types that never emit unmatched small-side rows are semantically
    // identical to the plain join.
    val allowed = Set("inner", "left", "leftouter", "leftsemi", "semi",
      "leftanti", "anti")
    require(allowed.contains(joinType.toLowerCase.replaceAll("_", "")),
      s"saltedJoin supports inner/left_outer/left_semi/left_anti, got $joinType")
    val bigS = big.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(salts)))
    val smallS = small.crossJoin(
      broadcast(big.sparkSession.range(salts).select(col("id").cast("int").as("__salt"))))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
