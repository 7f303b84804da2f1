package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-gate adapters for the rows-only queries' invariant pins.
  *
  * Seven queries are structurally non-SQL-expressible — iterative
  * k-means / BPE / PCA training, engine-internal HLL and
  * Greenwald-Khanna sketch registers — so their OUTPUT cannot
  * hash-match a DuckDB twin. Their mechanisms already do (the
  * q_*_replay convention), and their terminal configurations are
  * invariant-pinned in ScalaTest (recall floors, determinism, error
  * bounds, round-trips). This object lifts those pins INTO the
  * per-round driver gate: each companion `q_<name>_check` query
  * computes the SAME invariants in Spark over the live fixture and
  * emits (invariant, ok ∈ {0,1}) rows whose oracle is the constant
  * all-pass table. A regression flips ok to 0, the driver's hash
  * compare goes red, and CORRECTNESS_r{N} carries a checked status
  * for every rows-only family instead of "no_oracle" alone.
  *
  * Floors are SCALE-ROBUST regression floors, not the strict per-scale
  * pins: the same check query runs at sf0.01 (driver gate), sf0.1 and
  * sf1 (rehearsals), and honest quality metrics move with scale (IVF
  * recall 0.415 and PQ recall 0.42 at sf1 under the same bounded
  * configs; HLL excursions past 1σ of its 5 % rsd). The gate floors
  * (recall ≥ 0.35, HLL ≤ 2σ) hold at every rehearsal scale and still
  * catch real breakage (broken paths land near random: ~1/nlist, ~k/N,
  * unbounded); the tight small-scale pins (0.5 / 0.6 / 1σ) stay in
  * SimilaritySpec / PlanSpec where the scale is fixed.
  *
  * ok is BIGINT (not BOOLEAN) on purpose: integer equality is
  * identical across Spark/parquet/pandas/DuckDB, boolean dtypes are
  * not guaranteed to be.
  */
object Checks {
  /** ONE-row frame of named boolean flags (aggregation results) →
    * (invariant, ok) rows. The caller guarantees `row` has exactly
    * one row — aggregate without groupBy, or crossJoined aggregates. */
  def fromFlags(row: DataFrame, flags: (String, Column)*): DataFrame =
    row.select(explode(array(flags.map { case (n, c) =>
        struct(lit(n).as("invariant"),
               when(c, 1L).otherwise(0L).as("ok"))
      }: _*)).as("kv"))
      .select(col("kv.invariant").as("invariant"), col("kv.ok").as("ok"))

  /** Driver-computed booleans — for invariants over model-scale
    * training artifacts (BPE merge tables, PCA components) that live
    * on the driver by contract. */
  def fromLocal(spark: SparkSession, flags: (String, Boolean)*): DataFrame = {
    import spark.implicits._
    flags.toSeq.map { case (n, b) => (n, if (b) 1L else 0L) }
      .toDF("invariant", "ok")
  }

  /** The constant all-pass oracle for the named invariants. */
  def oracle(names: String*): String =
    names.sorted
      .map(n => s"SELECT '$n' AS invariant, CAST(1 AS BIGINT) AS ok")
      .mkString(" UNION ALL ")
}
