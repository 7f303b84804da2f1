package graft

import graft.gold.Gold
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions (SURVEY.md §5.5): the properties that keep
  * these queries viable at 100 TB must hold in the plan, not just in
  * intent — dimension joins broadcast, scans prune columns, predicates
  * reach the parquet reader. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("gold dimension joins broadcast (no shuffle of the dim side)") {
    val p = planOf(Gold.departmentAnalytics(Ctx(spark, sf)))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // the three exact countDistincts are decomposed into single-distinct
    // passes + pre-aggregated pair sets; a combined agg would reintroduce
    // Catalyst's Expand (4x row multiply before the shuffle)
    assert(!p.contains("Expand"), "Expand reappeared:\n" + p.take(3000))
  }

  test("filters push down to the parquet scan") {
    val p = planOf(Queries.defs("q_between_filter").fn(spark, sf))
    assert(p.contains("PushedFilters:"), p.take(2000))
    assert(p.contains("GreaterThanOrEqual(l_shipdate") ||
           p.contains("IsNotNull(l_shipdate)"), p.take(2000))
  }

  test("projection prunes scan columns to what the query reads") {
    val p = planOf(Queries.defs("q_pricing_summary").fn(spark, sf))
    // lineitem has 11 columns; the pricing summary needs only 5
    assert(!p.contains("l_shipdate"),
      "pricing summary should not read l_shipdate\n" + p.take(2000))
    assert(p.contains("l_returnflag"))
  }

  test("anti-join RI: dim-shaped ref broadcasts; fact-derived ref does not force it") {
    // the pipeline shape: fact fk vs a dimension's pk — forced broadcast
    import spark.implicits._
    val fact = (1 to 100).map(i => (i, i % 10)).toDF("id", "fk")
    val dim = (0 to 8).map(k => Tuple1(k)).toDF("pk")
    val dimPlan = planOf(
      graft.operators.Validation.riViolations(fact, dim, "fk", "pk"))
    assert(dimPlan.contains("BroadcastHashJoin") && dimPlan.contains("LeftAnti"),
      dimPlan.take(2000))
    // q_anti_join's ref is ORDERS (fact-derived keys): the hint must be
    // ABSENT — at 100 TB a forced broadcast of a fact-cardinality key
    // set OOMs the driver; AQE may still pick broadcast at runtime,
    // but the static plan must not mandate it
    val p = planOf(Queries.defs("q_anti_join").fn(spark, sf))
    assert(p.contains("LeftAnti"), p.take(2000))
    val logical = Queries.defs("q_anti_join").fn(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!logical.contains("broadcast"),
      "fact-derived ref must not carry a broadcast hint:\n" +
        logical.take(2000))
  }

  test("date-partitioned tables prune partitions on date filters") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("prune")
    val t = graft.tables.LakehouseTable(spark, s"$dir/t", Seq("id"), Seq("date"))
    t.overwrite((1 to 300).map(i => (i, s"2024-01-0${i % 3 + 1}", i * 1.0))
      .toDF("id", "date", "v"))
    val q = t.read.filter(org.apache.spark.sql.functions.col("date") === "2024-01-02")
    val p = planOf(q)
    assert(p.contains("PartitionFilters:"), p.take(2000))
    assert(p.contains("isnotnull(date") || p.contains("date#"), p.take(2000))
    assert(q.count() == 100)
  }

  test("agg-before-join: dimension attaches to the aggregate, not the fact scan") {
    // product_performance aggregates lineitem on the int part key and
    // broadcast-joins part onto the (tiny) aggregate — the dimension
    // strings must not pass through the shuffle. The tell: the
    // Exchange's output carries no p_name/p_brand.
    val p = planOf(Queries.defs("q_product_performance").fn(spark, sf))
    val shuffled = p.linesIterator.filter(_.contains("hashpartitioning")).mkString("\n")
    assert(!shuffled.contains("p_name"),
      "dimension strings crossed the shuffle\n" + shuffled)
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("binned range join: no nested-loop or cartesian operator in the plan") {
    val p = planOf(QueriesAnalytics.defs("q_range_join").fn(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("word_freq top-k plans as TakeOrderedAndProject, not a global window") {
    // a no-partition row_number window over the whole vocabulary would
    // pull every distinct token onto one task; the top-20 must come from
    // per-partition heaps, with any rank window running on ≤20 rows
    val df = QueriesText.defs("q_word_freq").fn(spark, sf)
    val p = planOf(df)
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("tfidf joins tf to document-frequency by shuffle, not broadcast") {
    // df (one row per distinct word) is vocabulary-sized — an explicit
    // broadcast hint on it would OOM the driver at corpus scale. Only the
    // 1-row corpus count may carry a broadcast hint.
    val df = QueriesText.defs("q_tfidf_keywords").fn(spark, sf)
    val hints = df.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.size == 1,
      s"expected exactly the 1-row count broadcast hint, got ${hints.size}")
  }

  test("decontaminate broadcasts the eval shingle set; no shuffle pair join") {
    val p = planOf(QueriesText.defs("q_decontaminate").fn(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("corpus-filter scans stay window-free where no window is needed") {
    // quality gate and repetition filter are scan + aggregation work; a
    // Window sneaking in would mean a needless global sort crept back
    for (name <- Seq("q_quality_gate", "q_repetition_filter")) {
      val p = planOf(QueriesText.defs(name).fn(spark, sf))
      assert(!p.contains("Window"), s"$name grew a Window:\n" + p.take(2000))
    }
    // doc_pack's running sum must partition by source, never globally
    val dp = planOf(QueriesText.defs("q_doc_pack").fn(spark, sf))
    assert(dp.contains("windowspecdefinition(source"), dp.take(3000))
  }

  test("approx_count_distinct stays within 5% of exact") {
    val r = QueriesText.defs("q_approx_distinct").fn(spark, "/root/testdata/sf0.01")
      .collect().head
    val (eo, ao) = (r.getLong(0), r.getLong(1))
    val (ep, ap) = (r.getLong(2), r.getLong(3))
    assert(math.abs(ao - eo).toDouble / eo < 0.05, s"$ao vs $eo")
    assert(math.abs(ap - ep).toDouble / ep < 0.05, s"$ap vs $ep")
  }

  test("approx percentiles track exact within 1% of the group's value") {
    val sf01 = "/root/testdata/sf0.01"
    val exact = QueriesAnalytics.defs("q_percentiles").fn(spark, sf01)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(4))).toMap
    val approx = QueriesAnalytics.defs("q_approx_percentiles").fn(spark, sf01)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    for ((flag, (q50, p50)) <- exact) {
      val (aq, ap) = approx(flag)
      assert(math.abs(aq - q50) / q50 < 0.01, s"$flag qty $aq vs $q50")
      assert(math.abs(ap - p50) / p50 < 0.01, s"$flag price $ap vs $p50")
    }
  }

  test("kmv replay: estimate within 10% of exact; top-k plans as TakeOrdered") {
    val df = QueriesText.defs("q_kmv_replay").fn(spark, "/root/testdata/sf0.01")
    val r = df.collect().head
    val (est, exact) = (r.getAs[Long]("kmv_estimate"), r.getAs[Long]("exact_distinct"))
    assert(math.abs(est - exact).toDouble / exact < 0.10, s"$est vs $exact")
    // the k-smallest-hashes selection must be a bounded-heap TakeOrdered,
    // not a full sort — that's the distributed-KMV merge shape
    assert(planOf(df).contains("TakeOrderedAndProject"), planOf(df).take(2000))
  }

  test("hash-sample median tracks the exact median within 5% per group") {
    val sf01 = "/root/testdata/sf0.01"
    val exact = QueriesAnalytics.defs("q_percentiles").fn(spark, sf01)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(4))).toMap
    val sampled = QueriesAnalytics.defs("q_sample_pctl_replay").fn(spark, sf01)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(sampled.keySet == exact.keySet)
    for ((flag, (q50, p50)) <- exact) {
      val (sq, sp) = sampled(flag)
      assert(math.abs(sq - q50) / q50 < 0.05, s"$flag qty $sq vs $q50")
      assert(math.abs(sp - p50) / p50 < 0.05, s"$flag price $sp vs $p50")
    }
  }

  test("char-bigram LM joins its bounded count table broadcast") {
    val p = planOf(QueriesText.defs("q_char_bigram_lm").fn(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("prefix-filter similarity join plans as equi-joins, no cartesian") {
    val p = planOf(QueriesText.defs("q_prefix_jaccard").fn(spark, sf))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoop"), p.take(3000))
  }

  test("substring dedup: equi-joins only, windows partition by doc") {
    val p = planOf(QueriesText.defs("q_substring_dedup").fn(spark, sf))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("BroadcastNestedLoop"), p.take(3000))
    // the span merge must never sort globally — every window keys on
    // doc_id, so per-node state is bounded by one document's grams
    assert(p.contains("windowspecdefinition(doc_id"), p.take(3000))
  }

  test("oov vocabulary is a TakeOrdered top-k, never a global sort") {
    val p = planOf(QueriesText.defs("q_oov_rate").fn(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("bm25: corpus stats broadcast, top-k heaps, no window, no sort-merge") {
    val p = planOf(QueriesText.defs("q_bm25_topk").fn(spark, sf))
    // the 1-row stats side must come back as a broadcast nested-loop
    // over one row, never a shuffled join against the per-doc table
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("SortMergeJoin"),
      "corpus-sized join crept into BM25:\n" + p.take(3000))
  }

  test("jl projection is map-only: zero exchanges, zero joins") {
    // the whole point of a data-independent projection: the sign
    // matrix is a literal, so the query is scan → project → generate —
    // any Exchange here means the literals regressed to a join
    val p = planOf(QueriesText.defs("q_jl_project").fn(spark, sf))
    assert(!p.contains("Exchange"), p.take(3000))
    assert(!p.contains("Join"), p.take(3000))
  }

  test("pca projection scan is exchange-free (components are literals)") {
    val c = Ctx(spark, sf)
    val model = graft.similarity.DimReduce.fit(
      c.embeddings, org.apache.spark.sql.functions.col("embedding"), k = 4)
    val p = planOf(graft.similarity.DimReduce.project(
      c.embeddings, org.apache.spark.sql.functions.col("embedding"),
      model, "pc"))
    assert(!p.contains("Exchange"), p.take(3000))
    assert(!p.contains("Join"), p.take(3000))
  }

  test("bpe dictionary cap is a TakeOrdered top-k, never a global sort") {
    // the training collect is bounded by the PLAN (per-partition heaps),
    // not by trust: a plain sort+limit would still work at sf0.001 but
    // single-task the vocabulary at scale
    val c = Ctx(spark, sf)
    val p = planOf(graft.text.Bpe.wordDict(
      c.documents, org.apache.spark.sql.functions.col("text"),
      maxVocab = 1000))
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("market basket: order-key equi-join, top-k heaps, broadcast totals") {
    val p = planOf(QueriesAnalytics.defs("q_market_basket").fn(spark, sf))
    // pair generation must key on the order — a cartesian/nested-loop
    // here would be corpus-quadratic instead of per-basket-bounded
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(p.contains("TakeOrderedAndProject"),
      "top-100 should plan as per-partition heaps\n" + p.take(3000))
    assert(p.contains("BroadcastNestedLoopJoin") ||
           p.contains("BroadcastExchange"),
      "the 1-row n_orders total should broadcast\n" + p.take(3000))
  }

  test("winnow: both window passes share one doc_id shuffle") {
    val p = planOf(QueriesText.defs("q_winnow").fn(spark, sf))
    // the gram-hash lag and the winnow min partition AND sort
    // identically — a second Exchange between them would mean the
    // window specs drifted apart
    val exchanges = "Exchange hashpartitioning\\(doc_id".r.findAllIn(p).size
    assert(exchanges <= 1,
      s"winnow windows re-shuffled on doc_id $exchanges times\n" + p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("cms: sketch probe joins broadcast; corpus reduces before the explode") {
    val p = planOf(QueriesText.defs("q_cms_estimate").fn(spark, sf))
    // the ≤1024-row sketch must broadcast to the probe side
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    // the ×4 hash-row Generate must consume the AGGREGATED vocab (its
    // formatted-explain Input list carries the count column), not the
    // raw token stream — the corpus-scale pass happens exactly once
    val sketchGen = "(?s)\\) Generate[^(]*?Input \\[\\d+\\]: \\[[^\\]]*cnt".r
    assert(sketchGen.findFirstIn(p).isDefined,
      "sketch explode must consume the aggregated vocab\n" + p.take(3000))
  }

  test("ewma: constant-fanout explode+equi-join — no window, no cartesian") {
    val p = planOf(QueriesAnalytics.defs("q_ewma").fn(spark, sf))
    // the decay arithmetic must stay the J+1-fanout explode + join on
    // (supplier, month): a Window formulation would per-partition sort
    // the whole fact table; a non-equi range join would nested-loop
    assert(!p.contains("Window"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // and the explode consumes the supplier x month AGGREGATE, not the scan
    val aggGen = "(?s)\\) Generate[^(]*?Input \\[\\d+\\]: \\[[^\\]]*cents".r
    assert(aggGen.findFirstIn(p).isDefined,
      "ewma explode must consume the monthly aggregate\n" + p.take(3000))
  }

  test("triangles: equi-join wedges + semi-join closure, no cartesian blowup") {
    val p = planOf(QueriesAnalytics.defs("q_triangles").fn(spark, sf))
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // triangle closure is a semi-join against the oriented edge list
    assert(p.contains("LeftSemi"), p.take(3000))
  }

  test("topk per group: aggregate path, zero Window operators") {
    val p = planOf(QueriesAnalytics.defs("q_topk_per_group").fn(spark, sf))
    // the whole point of TopKPairs: per-group top-k WITHOUT the
    // row_number window's full per-group shuffle+sort — a Window here
    // means someone reverted to the idiom the aggregate replaces
    assert(!p.contains("Window"), p.take(3000))
    // TypedImperativeAggregate plans through ObjectHashAggregate with
    // a partial stage (map-side capped buffers before the shuffle)
    assert(p.contains("ObjectHashAggregate"), p.take(3000))
  }

  test("mv serving: covered aggregate scans the summary; direct twin scans the fact") {
    try {
      val served = QueriesAnalytics.defs("q_mv_daily_sales").fn(spark, sf)
      val ps = planOf(served)
      assert(ps.contains("graft_mv_dailysales"),
        "covered aggregate must scan the summary parquet:\n" + ps.take(3000))
      assert(!ps.contains("lineitem.parquet"),
        "the fact table must NOT be scanned when served:\n" + ps.take(3000))
      // the direct twin (measure filter => bail) stays on the fact scan
      val pd = planOf(QueriesAnalytics.defs("q_mv_daily_sales_direct").fn(spark, sf))
      assert(pd.contains("lineitem.parquet"), pd.take(3000))
      assert(!pd.contains("graft_mv_dailysales"), pd.take(3000))
      // the JOIN shape: the covered aggregate over lineitem ⋈ part
      // scans the brand-grain join summary, with neither input scanned
      val pj = planOf(QueriesAnalytics.defs("q_mv_brand_qty").fn(spark, sf))
      assert(pj.contains("graft_mv_brandqty"), pj.take(3000))
      assert(!pj.contains("lineitem.parquet") && !pj.contains("part.parquet"),
        pj.take(3000))
      // exact countDistinct served from the distinct-grain summary:
      // the distinct agg re-runs over the summary's grain rows, so the
      // plan aggregates the summary scan and touches neither input
      val pdd = planOf(QueriesAnalytics.defs("q_mv_dept_distinct").fn(spark, sf))
      assert(pdd.contains("graft_mv_deptdistinct"), pdd.take(3000))
      assert(!pdd.contains("lineitem.parquet") && !pdd.contains("part.parquet"),
        pdd.take(3000))
      val pddd = planOf(
        QueriesAnalytics.defs("q_mv_dept_distinct_direct").fn(spark, sf))
      assert(pddd.contains("lineitem.parquet"), pddd.take(3000))
      assert(!pddd.contains("graft_mv_deptdistinct"), pddd.take(3000))
    } finally graft.plans.MaterializedAgg.clear()
  }
}
