package graft.operators

import graft.functions.CrossEngine._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-analytics operators over event streams and fact tables
  * (beyond-reference; exposed to queries by `QueriesAnalytics` and to
  * library users directly).
  *
  * All of them follow the engine's determinism rules: integer or
  * fixed-point arithmetic wherever a result feeds a comparison or an
  * oracle, floor-form rounding for emitted doubles, and no global
  * windows — each op's shuffles key on its natural high-cardinality
  * column (user, group), so the shapes scale linearly.
  */
object Analytics {
  /** Per-user strictly-ordered funnel timestamps: `t1` is the earliest
    * `types(0)` event, `t(i+1)` the earliest `types(i)` event AFTER
    * `t(i)` — an out-of-order conversion (click before view) does not
    * count. Returns one row per user who completed stage 1, with null
    * `t(i)` columns from the first unmet stage on. Each stage is one
    * user-keyed conditional-min aggregation — no window, no per-user
    * sort. */
  def funnelTimes(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, types: Seq[String]): DataFrame = {
    require(types.nonEmpty, "funnel needs at least one stage")
    val s1 = events.filter(col(typeCol) === types.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    types.tail.zipWithIndex.foldLeft(s1) { case (acc, (t, i)) =>
      val prev = s"t${i + 1}"
      val cur  = s"t${i + 2}"
      val nxt = events.filter(col(typeCol) === t)
        .join(acc.select(col(userCol), col(prev)), userCol)
        .filter(col(tsCol) > col(prev))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(cur))
      acc.join(nxt, Seq(userCol), "left_outer")
    }
  }

  /** Weekly cohort retention: cohort = ISO week (Monday-start
    * date_trunc) of the user's first event; one output row per
    * (cohort_week, whole-week offset) with the distinct active users.
    * Two shuffles: the user-level min and the cohort×offset distinct
    * count; the first-seen side joins back on the natural user key. */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val first = events.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("first_ts"))
      .select(col(userCol),
              date_trunc("week", col("first_ts")).as("cohort_week"))
    events.join(first, userCol)
      .withColumn("week_offset",
        floor(datediff(to_date(col(tsCol)), to_date(col("cohort_week"))) / 7)
          .cast("long"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_active"))
  }

  /** Robust per-group outlier screen via MAD fences (median absolute
    * deviation — immune to the outliers it hunts, unlike stddev
    * z-scores). Two group-level median passes, each joined back
    * broadcast; medians are floor-rounded to 6 decimals BEFORE the
    * fence so the boundary comparison is bit-identical in any IEEE
    * engine. Groups whose fence nothing exceeds are absent. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double = 3.0): DataFrame = {
    val med = df.groupBy(col(groupCol))
      .agg(rnd6(percentile(col(valueCol), lit(0.5))).as("med"))
    val dev = df.join(broadcast(med), groupCol)
      .withColumn("__dev", abs(col(valueCol) - col("med")))
    val mad = dev.groupBy(col(groupCol))
      .agg(rnd6(percentile(col("__dev"), lit(0.5))).as("mad"))
    dev.join(broadcast(mad), groupCol)
      .filter(col("__dev") > col("mad") * k)
      .groupBy(col(groupCol))
      // med/mad are constant within a group and every surviving row
      // carries them — first() is deterministic here, and it replaces
      // two post-aggregation joins that re-embedded (and re-executed)
      // the exact-percentile subtrees
      .agg(first(col("med")).as("med"), first(col("mad")).as("mad"),
           count(lit(1)).as("n_outliers"),
           rnd2(max(col("__dev"))).as("max_abs_dev"))
      .select(col(groupCol), col("med"), col("mad"),
              col("n_outliers"), col("max_abs_dev"))
  }

  /** Per-group least-squares fit + Pearson correlation of `yCol` on
    * `xCol`, both ≤`d`-decimal columns. The five sufficient statistics
    * are EXACT integer sums of integer units (one map-side-combined
    * pass); both engines then combine the same integers through the
    * same IEEE double sequence, so results are bit-equal even where a
    * sum exceeds 2^53 (integer→double rounding is itself
    * deterministic). The quadratic sums accumulate as DECIMAL(38,0) —
    * a long Σy² wraps silently under ANSI-off at ~10⁹ rows of 10⁵-unit
    * values (measured: sf0.1 already sits at 80 % of Long.MaxValue),
    * while decimal sums stay exact to 10³⁸ and match the oracle's
    * HUGEINT. Output: group, n, slope, intercept (y-units), corr_xy. */
  def linregBy(df: DataFrame, groupCol: String, xCol: String, yCol: String,
               d: Int): DataFrame = {
    val scale = math.pow(10, d)
    // regression statistics are defined over COMPLETE (x, y) pairs: a
    // row with only one side present must drop from ALL six statistics
    // together — counting it in n while the sums null-skip it would
    // make the statistics describe different row sets (silently wrong
    // slope on any input with nulls; the oracle twin filters the same
    // way)
    val bothPresent = col(xCol).isNotNull && col(yCol).isNotNull
    val x = when(bothPresent, units(col(xCol), d).cast("long"))
    val y = when(bothPresent, units(col(yCol), d).cast("long"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    // cast BEFORE multiplying: a long×long product wraps first
    val (xd, yd) = (x.cast(dec), y.cast(dec))
    val stats = df.groupBy(col(groupCol))
      .agg(count(when(bothPresent, lit(1))).as("n"),
           sum(xd).as("sx"), sum(yd).as("sy"),
           sum(xd * xd).as("sxx"), sum(xd * yd).as("sxy"),
           sum(yd * yd).as("syy"))
    val (n, sx, sy, sxx, sxy, syy) =
      (col("n").cast("double"), col("sx").cast("double"),
       col("sy").cast("double"), col("sxx").cast("double"),
       col("sxy").cast("double"), col("syy").cast("double"))
    val covN  = n * sxy - sx * sy
    // zero variance (single row, all-equal x) → NULL, explicitly and
    // identically in both twins: bare division-by-zero diverges across
    // engines (Spark NULL under ANSI-off, DuckDB Inf/NaN)
    val varXN = nullif(n * sxx - sx * sx, lit(0.0))
    val varYN = nullif(n * syy - sy * sy, lit(0.0))
    // unit scaling cancels in slope/corr; intercept needs one rescale.
    // n = 0 groups (every row missing x or y) drop entirely: the SQL
    // twin's WHERE clause removes such groups before aggregation, so an
    // all-null-stats n=0 row on the Spark side would be a row-count
    // divergence on null-bearing inputs
    stats.filter(col("n") > 0).select(col(groupCol), col("n"),
      rnd6(covN / varXN).as("slope"),
      rnd6(((sy - (covN / varXN) * sx) / n) / scale).as("intercept"),
      rnd6(covN / (sqrt(varXN) * sqrt(varYN))).as("corr_xy"))
  }
}
