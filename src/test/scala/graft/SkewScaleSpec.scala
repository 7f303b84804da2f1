package graft

import org.scalatest.funsuite.AnyFunSuite

/** Skew rehearsal: the driver fixtures are uniform-ish, so the flat
  * bench and ScalingSpec never exercise the case skew handling exists
  * for. `tools/gen_skew.py` derives a Zipf-skewed sf0.1 variant — one
  * hot key holding ~40% of the rows in every skew-sensitive column
  * (customer 0 / part 0 / supplier 0 / user 0) and a hot token in 40%
  * of documents — and this spec pins that the heavy skew-sensitive
  * queries stay within ~2x of their uniform-fixture times on it.
  *
  * What each family proves under real skew:
  *   - near-dup candidate generation (prefix filter, banded LSH,
  *     simhash buckets): a stop-word-like hot-df token must not blow
  *     up candidate pairs — PPJoin's df-ascending prefix ordering and
  *     the band/bucket bounds are exactly the mechanisms on trial;
  *   - skewed fact⋈dim joins + multi-distinct aggregates (AQE skew
  *     split / broadcast): one part/customer holding 40% of the fact
  *     side must not serialize a reducer;
  *   - hot-entity windows (sessionize / funnel): one user owning 40%
  *     of events concentrates a window partition — the per-key work
  *     is data-linear, so the stage must stay time-bounded;
  *   - salted aggregation: Skew.saltedAgg's two-level decomposition
  *     must hold its plan shape when the salt actually matters.
  *
  * Times are min-of-2 with an untimed warmup (the ScalingSpec
  * discipline) against this host's bursty VM-steal stalls. The band is
  * 2x plus a 0.3s absolute floor: sub-second queries are dominated by
  * fixed planning overhead where a 2x ratio is pure noise.
  */
class SkewScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val uniform = "/root/testdata/sf0.1"
  private val skewed = "fixtures/skew0.1"

  private val skewSensitive = Seq(
    // near-dup candidate generation with a hot-df token
    "q_prefix_jaccard",
    "q_minhash_neardup",
    "q_ngram_jaccard",
    "q_simhash_neardup",
    "q_cluster_sizes",
    // skewed fact-dim joins and multi-distinct aggregates
    "q_product_performance",
    "q_department_analytics",
    "q_customer_insights",
    "q_supplier_share",
    // hot-user sequence/window family
    "q_sessionize",
    "q_event_funnel",
    // hot part inside baskets (pair generation per order)
    "q_market_basket",
    // the salting operator itself, on data that actually skews
    "q_salted_agg",
    // iterative graph family: the hot part/customer becomes a
    // high-degree node. PageRank's edge distinct() collapses the 40%
    // row multiplicity to a distinct-neighbor degree (measured ~6-8%
    // of E on the skew fixture), so the clustered exchange-free
    // layout's hot partition is a bounded ~2-3x straggler per
    // iteration, not a 40% serialization; LPA's co-purchase edges are
    // deduped+thresholded upstream the same way
    "q_pagerank",
    "q_label_prop")

  private val MaxRatio = 2.0
  private val AbsFloor = 0.3 // seconds: below this, ratios are noise

  private def timeMin2(name: String, sfDir: String): Double = {
    val fn = SparkEntry.queries(name)
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }

  test("skewed fixtures: heavy skew-sensitive queries stay within the " +
       "uniform band (slow, needs fixtures/skew0.1)") {
    assume(new java.io.File(skewed).isDirectory &&
           new java.io.File(uniform).isDirectory)
    // warmup both fixtures: codegen + scan caches outside timing
    skewSensitive.foreach { n =>
      SparkEntry.queries(n)(spark, uniform)
        .write.format("noop").mode("overwrite").save()
      SparkEntry.queries(n)(spark, skewed)
        .write.format("noop").mode("overwrite").save()
    }
    val ratios = skewSensitive.map { n =>
      val u = timeMin2(n, uniform)
      val s = timeMin2(n, skewed)
      val r = s / math.max(u, 0.05)
      info(f"$n%-26s uniform=$u%6.2fs skew=$s%6.2fs ratio=$r%5.2f")
      (n, u, s, r)
    }
    val bad = ratios.filter { case (_, u, s, r) =>
      r > MaxRatio && (s - u) > AbsFloor
    }
    assert(bad.isEmpty,
      s"skew pathology (>${MaxRatio}x the uniform time): " +
      bad.map { case (n, u, s, r) => f"$n=$r%.2fx ($u%.2fs -> $s%.2fs)" }
        .mkString(", "))
  }

  test("salted aggregation splits the hot key across reducers on the " +
       "skewed fixture (slow, needs fixtures/skew0.1)") {
    assume(new java.io.File(skewed).isDirectory)
    import org.apache.spark.sql.functions._
    val c = Ctx(spark, skewed)
    // per-user aggregate where user 0 holds 40% of the table: the
    // salted two-level plan must produce EXACTLY the plain groupBy's
    // result (row-for-row), spreading the hot key over the salt fan-out
    val plain = c.events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
    val salted = graft.operators.Skew.saltedAgg(
      c.events, keys = Seq("user_id"), salts = 16,
      saltOn = col("event_id"),
      partial = Seq(count(lit(1)).as("__n"), sum(col("value")).as("__sv")),
      finalAgg = Seq(sum("__n").as("n"), sum("__sv").as("sv")))
    // exact equality on the count; float sums compared within 1e-6
    // relative (different add orders across the two plans)
    val joined = plain.alias("p").join(salted.alias("s"), "user_id")
      .select(col("user_id"), col("p.n").as("pn"), col("s.n").as("sn"),
              col("p.sv").as("psv"), col("s.sv").as("ssv"))
    assert(joined.filter(col("pn") =!= col("sn")).count() == 0)
    assert(joined.filter(
      abs(col("psv") - col("ssv")) > abs(col("psv")) * 1e-6 + 1e-6)
      .count() == 0)
    assert(plain.count() == salted.count()) // no key lost or invented
    // and the hot key is really hot (the fixture contract)
    val hot = c.events.filter(col("user_id") === 0).count()
    val total = c.events.count()
    assert(hot * 10 >= total * 3 && hot * 10 <= total * 5,
      s"fixture lost its skew: hot=$hot total=$total")
    // the salted PARTIAL stage genuinely fans the hot key out: its
    // pre-aggregate has `salts` rows for user 0, not one
    val pre = c.events
      .withColumn("__salt", pmod(hash(col("event_id")), lit(16)))
      .filter(col("user_id") === 0)
      .select(col("__salt")).distinct().count()
    assert(pre == 16, s"hot key fanned out over $pre salts, expected 16")
  }
}
