package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Large-V regime rehearsal on graphs that genuinely need it.
  *
  * Every driver fixture graph has V ≤ 500k, so PageRank's large-V path
  * (rank vector too big to broadcast: edges pre-partitioned by the
  * join key, only the O(V) rank side reshuffles per iteration —
  * `PageRank.scala` regime comment) used to run only under the forced
  * `maxBroadcastNodes = 0` equivalence spec. This spec measures it on
  * `fixtures/graph/edges_{500k,2m}.parquet` (tools/gen_graph.py:
  * V = 0.5M/2M, E ≈ 5M/20M, 10 edges/node, hash-deterministic), on
  * both sides of the 500k default crossover:
  *
  *  1. the two regimes agree numerically at V = 2M (the correctness
  *     pin, now on data the default actually routes to large-V);
  *  2. per-iteration cost scales ~linearly in E from 5M → 20M edges
  *     in BOTH regimes (a quadratic or an accidental per-iteration
  *     O(E) re-exchange shows up here first);
  *  3. the crossover's decidable side: below 500k nodes broadcast
  *     beats large-V (pinned — stable across runs), so the default
  *     routes small graphs right. Above the crossover the single-JVM
  *     wall-clock comparison is deliberately informational only —
  *     see the inline note at the assertion for the measured
  *     variance and the cluster-economics argument.
  *
  * Per-iteration time is isolated by differencing: t(6 iters) −
  * t(2 iters) over 4, which cancels the shared setup (edge
  * materialization, node classification) that dominates small runs.
  * Timing discipline per ScalingSpec: result consumed via noop-write
  * inside runWithStats' own checkpoint, superseded results released
  * so runs don't read-lock each other's blocks, and generous pins —
  * this host shows ±20 % drift, so only structural regressions
  * (regime inversion, superlinear scaling) can trip them.
  */
class GraphRegimeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "fixtures/graph"
  private def have(f: String) = new java.io.File(s"$dir/$f").isFile

  private def edges(f: String): DataFrame =
    spark.read.parquet(s"$dir/$f")

  /** Total wall time of a fixed-iteration PageRank run; the result
    * checkpoint is released so back-to-back measurements don't
    * accumulate pinned O(V) blocks. */
  private def runSecs(e: DataFrame, iters: Int, maxB: Long): Double = {
    val t0 = System.nanoTime()
    val (r, _) = graft.operators.PageRank.runWithStats(
      e, iters, maxBroadcastNodes = maxB)
    val t = (System.nanoTime() - t0) / 1e9
    graft.operators.Checkpoints.release(r)
    t
  }

  /** Per-iteration seconds via the 2-vs-6-iteration difference,
    * min-of-2 with corrupted-run rejection: on a shared host a
    * scheduling stall inside the 2-iteration run can make the
    * difference collapse to ~zero (observed: a concurrent DuckDB
    * oracle saturating the cores drove t2's setup from 8 s to 19 s
    * and the difference negative — a 5M-edge join+aggregate cannot
    * genuinely run in <50 ms/iter at local[4]). Differences under
    * the floor are measurement failures, not fast code; a run is
    * retried once and NaN is returned only if both passes are
    * corrupted (callers `assume` it away rather than asserting on
    * noise). */
  private def perIter(e: DataFrame, maxB: Long): Double = {
    val ds = (1 to 2).iterator.map { _ =>
      val t2 = runSecs(e, 2, maxB)
      val t6 = runSecs(e, 6, maxB)
      (t6 - t2) / 4.0
    }.filter(_ > 0.05).toSeq
    if (ds.isEmpty) Double.NaN else ds.min
  }

  test("both regimes agree numerically at V=2M (slow, needs fixtures/graph)") {
    assume(have("edges_2m.parquet"))
    val e = edges("edges_2m.parquet")
    // default 500k crossover routes V=2M to large-V naturally; the
    // broadcast twin is forced. 3 iterations keep the cross-regime
    // sum-order drift far below the tolerance.
    val large = graft.operators.PageRank.run(e, iters = 3)
    val bcast = graft.operators.PageRank.run(
      e, iters = 3, maxBroadcastNodes = Long.MaxValue)
    val d = large.withColumnRenamed("r", "rl")
      .join(bcast.withColumnRenamed("r", "rb"), Seq("node"))
      .agg(max(abs(col("rl") - col("rb"))).as("d"),
           count(lit(1)).as("n")).collect()(0)
    assert(d.getLong(1) == 2000000L, s"node count ${d.getLong(1)}")
    // ranks are O(1/V) ≈ 5e-7; 1e-12 allows ~2e-6 relative drift
    assert(d.getDouble(0) < 1e-12,
      s"regime disagreement: L-inf ${d.getDouble(0)}")
    graft.operators.Checkpoints.release(large)
    graft.operators.Checkpoints.release(bcast)
  }

  test("LabelPropagation regimes agree at V=2M; large-V per-iteration " +
       "measured (slow, needs fixtures/graph)") {
    assume(have("edges_2m.parquet"))
    val e = edges("edges_2m.parquet")
    // default crossover routes V=2M to the large-V path (edges
    // re-laid by dst, one O(E) exchange per iteration) naturally;
    // broadcast is forced for the twin. Deterministic synchronous
    // LPA ⇒ identical label assignments regardless of regime.
    val t0 = System.nanoTime()
    val (large, itL) = graft.operators.LabelPropagation.runWithStats(
      e, maxIters = 3, earlyExit = false)
    val largeN = large.count()
    val tLarge = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val (bcast, itB) = graft.operators.LabelPropagation.runWithStats(
      e, maxIters = 3, earlyExit = false,
      maxBroadcastNodes = Long.MaxValue)
    val tB = (System.nanoTime() - t1) / 1e9
    assert(itL == 3 && itB == 3)
    assert(largeN == 2000000L, s"node count $largeN")
    info(f"LPA V=2M E=20M, 3 iters: large-V ${tLarge}%6.1f s  " +
         f"broadcast ${tB}%6.1f s")
    val diff = large.withColumnRenamed("label", "ll")
      .join(bcast.withColumnRenamed("label", "lb"), Seq("node"))
      .filter(col("ll") =!= col("lb")).count()
    assert(diff == 0L, s"$diff nodes labeled differently across regimes")
    graft.operators.Checkpoints.release(large)
    graft.operators.Checkpoints.release(bcast)
  }

  test("per-iteration cost: linear in E, large-V competitive at V=2M " +
       "(slow, needs fixtures/graph)") {
    assume(have("edges_500k.parquet") && have("edges_2m.parquet"))
    val e05 = edges("edges_500k.parquet")
    val e2  = edges("edges_2m.parquet")
    // warmup: codegen + scan caches outside the timed region
    runSecs(e05, 1, Long.MaxValue)

    val b05 = perIter(e05, Long.MaxValue)
    val l05 = perIter(e05, 0)
    val b2  = perIter(e2,  Long.MaxValue)
    val l2  = perIter(e2,  0)
    assume(!(b05.isNaN || l05.isNaN || b2.isNaN || l2.isNaN),
      "host too loaded for the per-iteration difference to measure")
    info(f"V=500k E=5M :  broadcast ${b05}%6.2f s/iter  large-V ${l05}%6.2f s/iter")
    info(f"V=2M   E=20M:  broadcast ${b2}%6.2f s/iter  large-V ${l2}%6.2f s/iter")

    // The scaling PIN applies to the large-V path only — the regime a
    // 100 TB graph runs, and the one whose per-iteration cost is
    // dominated by measurable O(E) data work (join + exchange +
    // aggregate): 4× the edges lands ≈4×; an O(E²) candidate blowup
    // (≈16×) or a reintroduced per-iteration re-exchange of the O(E)
    // side clears the ceiling. Denominator floored at 0.25 s — a
    // 5M-edge pass under that at local[4] is clock noise
    // (ScalingSpec's clamp discipline). Broadcast's cross-scale ratio
    // stays informational: its per-iteration cost is dominated by the
    // O(V) relation build whose sub-second 500k time jitters 2×+ on
    // this host, and the default crossover never runs broadcast past
    // 500k nodes anyway — there is no production path whose scaling
    // that ratio would pin.
    assert(l2 / math.max(l05, 0.25) < 8.0,
      f"large-V per-iter scaled ${l2 / math.max(l05, 0.25)}%.1fx for 4x edges")
    // Crossover pin, LOWER side: below the 500k default, broadcast
    // must win — that is the side a local measurement can decide, and
    // it is stable (measured 0.31–0.73 vs 1.15–1.43 s/iter across
    // calm and loaded runs). The UPPER side is deliberately NOT
    // wall-clock-pinned here: across repeated runs broadcast at V=2M
    // measured 1.65–5.46 s/iter (the O(V) relation build is GC-bound
    // and swings 3×) against large-V's stable 4.4–6.1, so any
    // single-JVM comparison is a coin flip — and structurally the
    // single JVM hides exactly the costs that decide the crossover on
    // a cluster: broadcast re-ships O(V)·executors bytes per
    // iteration, rebuilds the hash relation per executor, and pins
    // O(V) on the driver, while large-V's rank shuffle is priced
    // fully even locally. The info lines above record the comparison;
    // the cluster argument lives in BASELINE.md.
    // 1.5× band: across runs b05 ∈ [0.31, 0.73] and l05 ∈ [0.76,
    // 1.43] — broadcast won every time, but the gap once narrowed to
    // 17%, within host noise. The pin catches a genuine inversion
    // (large-V clearly faster below the crossover would mean the
    // default belongs lower), not a photo finish.
    assert(b05 < l05 * 1.5,
      f"broadcast ${b05}%.2f s/iter vs large-V ${l05}%.2f s/iter " +
      "below the 500k crossover — the default routes small graphs " +
      "wrong")
  }
}
