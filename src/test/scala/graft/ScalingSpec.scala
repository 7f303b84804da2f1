package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scaling regression pin: the flat per-SF bench can't tell an
  * accidental quadratic from a slow-but-linear query — this spec can.
  * It times the heaviest queries at sf0.01 and sf0.1 (10× the data)
  * and asserts the time ratio stays far below quadratic: a linear
  * operator lands ≤10× (usually well under, fixed overhead dominates
  * the small SF), an O(n²) regression lands ~100×. Reverting
  * q_prefix_jaccard to a block join, or q_source_overlap to a
  * corpus-quadratic join, fails here long before a 100 TB run would.
  *
  * Timing discipline mirrors Bench: noop sink (count() would let
  * Catalyst prune projection work), one untimed warmup per SF for
  * codegen/scan caches, min-of-2 per query against this host's bursty
  * VM-steal stalls.
  */
class ScalingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val heaviest = Seq(
    "q_prefix_jaccard",
    "q_ann_pq",
    "q_department_analytics",
    "q_ann_ivf",
    "q_source_overlap",
    // the other quadratic-risk family: banded LSH candidate joins and
    // iterative connected components — both must stay ~linear too
    "q_minhash_neardup",
    "q_cluster_sizes",
    // gram-explode + per-doc window family: token-count-linear by
    // construction, and the cross-doc gram join must never fan out
    "q_cdc_chunks",
    "q_substring_dedup",
    // iterative family: fixed iteration counts, so each pass must stay
    // O(E) (pagerank) / O(tokens) (bpe vocab join) for the total to
    // scale linearly
    "q_pagerank",
    "q_bpe_encode",
    // pair-generation family: winnow overlap must stay bounded by the
    // stop-fingerprint rule, triangles by the degree orientation, and
    // market basket by basket size — each has a quadratic failure mode
    // one careless edit away
    "q_winnow_overlap",
    "q_triangles",
    "q_market_basket",
    "q_label_prop")

  private val MaxRatio = 15.0

  private def timeMin2(name: String, sfDir: String): Double = {
    val fn = SparkEntry.queries(name)
    def once(): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    math.min(once(), once())
  }

  test("heaviest queries scale ~linearly from sf0.01 to sf0.1 (slow)") {
    val small = "/root/testdata/sf0.01"
    val large = "/root/testdata/sf0.1"
    assume(new java.io.File(small).isDirectory &&
           new java.io.File(large).isDirectory)
    // warmup: absorb JVM/codegen startup outside the timed region
    heaviest.foreach { n =>
      SparkEntry.queries(n)(spark, small)
        .write.format("noop").mode("overwrite").save()
    }
    val ratios = heaviest.map { n =>
      val s = timeMin2(n, small)
      val l = timeMin2(n, large)
      val r = l / math.max(s, 0.05) // clamp: sub-50ms small-SF times
                                    // are pure overhead, not data work
      info(f"$n%-28s sf0.01=$s%6.2fs sf0.1=$l%6.2fs ratio=$r%5.1f")
      (n, r)
    }
    val bad = ratios.filter(_._2 > MaxRatio)
    assert(bad.isEmpty,
      s"superlinear scaling (>${MaxRatio}x for 10x data): " +
      bad.map { case (n, r) => f"$n=$r%.1fx" }.mkString(", "))
  }
}
