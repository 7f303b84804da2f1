package graft

import org.scalatest.funsuite.AnyFunSuite

/** The winnowing guarantee (Schleimer/Wilkerson/Aiken §2): any run of
  * ≥ w+k-1 shared words yields at least one common selected
  * fingerprint — and a run of m shared grams yields ≥ ceil((m-w+1)/w)
  * distinct ones, because one selection can serve at most w
  * consecutive windows. With k=4, w=5, a 20-word shared run has 17
  * grams → ≥ 3 shared fingerprints, exactly the q_winnow_overlap
  * reporting threshold, so the pair is GUARANTEED to surface.
  *
  * Built on a synthetic documents.parquet so the ground truth is by
  * construction (unique filler words can't collide into extra runs).
  */
class WinnowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mkDocs(dir: String): Unit = {
    import spark.implicits._
    val shared = (1 to 20).map(i => s"shared$i").mkString(" ")
    def filler(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    Seq(
      (1L, s"${filler("ax", 10)} $shared ${filler("ay", 10)}"),
      (2L, s"${filler("bx", 10)} $shared ${filler("by", 10)}"),
      (3L, filler("cx", 40)),
      (4L, filler("dx", 40)))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("a 20-word shared run guarantees >= 3 shared fingerprints; disjoint docs share none") {
    val dir = TestSpark.tmpDir("winnow")
    mkDocs(dir)
    val over = QueriesText.defs("q_winnow_overlap").fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(over.exists { case (a, b, n) => a == 1L && b == 2L && n >= 3 },
      s"pair (1,2) with >=3 shared fps must surface, got ${over.toSeq}")
    assert(!over.exists { case (a, b, _) => a >= 3L || b >= 3L },
      s"disjoint docs must not pair: ${over.toSeq}")
  }

  test("per-doc summary: gram counts exact, fingerprint density ~2/(w+1), short docs empty") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("winnow2")
    mkDocs(dir)
    // add a doc too short for any full winnow window (< k+w-1 = 8 words)
    Seq((5L, "only five words right here"))
      .toDF("doc_id", "text")
      .write.mode("append").parquet(s"$dir/documents.parquet")
    val rows = QueriesText.defs("q_winnow").fn(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(1L)._1 == 37) // 40 words -> 37 grams
    assert(rows(5L)._1 == 2 && rows(5L)._2 == 0,
      "a 5-word doc has 2 grams but no full winnow window")
    // density: selections per gram are bounded by 1 (every selection is
    // a gram) and below by 1/w (one per window); typical ~2/(w+1)
    val (grams, fps) = rows(1L)
    assert(fps >= grams / 5 && fps <= grams, s"density off: $fps of $grams")
  }
}
