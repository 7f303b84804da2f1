package graft

import graft.functions.CrossEngine.rnd6
import graft.similarity.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("cosine: identity 1, orthogonal 0, opposite -1") {
    val all = Similarity.prepare(
      emb(1L -> Seq(1f, 0f), 2L -> Seq(0f, 1f), 3L -> Seq(-2f, 0f)),
      "vec_id", "embedding")
    val pairs = Similarity.nearDuplicates(all, all, threshold = -2.0)
      .select(col("query_id"), col("vec_id"), rnd6(col("cos")).as("c"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(pairs((1L, 3L)) == -1.0)
    assert(pairs((1L, 2L)) == 0.0)
  }

  test("brute-force topk: correct neighbor order, k rows per query") {
    val all = Similarity.prepare(
      emb(1L -> Seq(1f, 0f), 2L -> Seq(0.9f, 0.1f), 3L -> Seq(0.5f, 0.5f),
          4L -> Seq(0f, 1f)),
      "vec_id", "embedding")
    val top = Similarity
      .bruteForceTopK(all.filter(col("id") === 1), all, 3, rnd6)
      .orderBy("rn").as[(Long, Long, Double, Int)].collect()
    assert(top.map(_._2).toSeq == Seq(2L, 3L, 4L)) // by descending cosine to (1,0)
  }

  test("ivf topk on testdata: k results per query, subset quality vs brute force") {
    val c = Ctx(spark, "/root/testdata/sf0.001")
    val all = Similarity.prepare(c.embeddings, "vec_id", "embedding")
    val queries = all.filter(col("id") % 50 === 0)
    val bf = Similarity.bruteForceTopK(queries, all, 5, rnd6)
      .as[(Long, Long, Double, Int)].collect().map(r => (r._1, r._2)).toSet
    val ivf = Similarity.ivfTopK(c.embeddings, "vec_id", "embedding",
        queries, 5, 53, 4, rnd6, kmeansIters = 3)
      .as[(Long, Long, Double, Int)].collect().map(r => (r._1, r._2)).toSet
    assert(ivf.size == bf.size)
    val recall = (ivf & bf).size.toDouble / bf.size
    assert(recall >= 0.5, s"ivf recall $recall too low")
  }

  test("ivf maxCentroids cap is rank-based: offset id spaces keep centroids") {
    // ids offset by 1M: the old range cut (id < centroidEvery*maxCentroids
    // = 2120) selected ZERO centroids here -- empty broadcast, empty
    // assignment join, silently empty result. The rank cap (order by id,
    // limit) must keep exactly maxCentroids centroids and produce k rows
    // per query regardless of where the id space starts.
    val c = Ctx(spark, "/root/testdata/sf0.001")
    val off = c.embeddings.withColumn("vec_id", col("vec_id") + 1000000L)
    val queries = Similarity.prepare(off, "vec_id", "embedding")
      .filter(col("id") % 50 === 0)
    val nQueries = queries.count()
    val got = Similarity.ivfTopK(off, "vec_id", "embedding",
        queries, 5, 53, 4, rnd6, kmeansIters = 0, maxCentroids = 4)
    assert(got.count() == nQueries * 5,
      s"expected ${nQueries * 5} rows, got ${got.count()}")
  }

  test("lsh topk on testdata: k results per query, recall vs brute force") {
    val c = Ctx(spark, "/root/testdata/sf0.001")
    val all = Similarity.prepare(c.embeddings, "vec_id", "embedding")
    val queries = all.filter(col("id") % 50 === 0)
    val bf = Similarity.bruteForceTopK(queries, all, 5, rnd6)
      .as[(Long, Long, Double, Int)].collect().map(r => (r._1, r._2)).toSet
    val lsh = Similarity.lshTopK(queries, all, 5, nbits = 64, bands = 16, rnd6)
      .as[(Long, Long, Double, Int)].collect().map(r => (r._1, r._2)).toSet
    // LSH may return < k when buckets are sparse; never more
    assert(lsh.size <= bf.size)
    val recall = (lsh & bf).size.toDouble / bf.size
    assert(recall >= 0.6, s"lsh recall $recall too low")
    // deterministic across runs (hash-derived hyperplanes, no RNG state)
    val again = Similarity.lshTopK(queries, all, 5, nbits = 64, bands = 16, rnd6)
      .as[(Long, Long, Double, Int)].collect().map(r => (r._1, r._2)).toSet
    assert(again == lsh)
  }

  test("lsh md5-plane mode: k-bounded results, recall vs brute force, deterministic") {
    // the DuckDB-replayable variant (±1 md5 planes over fixed-point
    // vectors) must behave like an LSH: bounded by k, decent recall,
    // bit-stable across runs — same contract as the xxhash path
    val c = Ctx(spark, "/root/testdata/sf0.001")
    val all = Similarity.prepare(c.embeddings, "vec_id", "embedding")
    val queries = all.filter(col("id") % 50 === 0)
    val bf = Similarity.bruteForceTopK(queries, all, 5, rnd6)
      .as[(Long, Long, Double, Int)].collect().map(r => (r._1, r._2)).toSet
    val lsh = Similarity.lshTopKMd5(queries, all, 5, nbits = 64, bands = 16,
        dim = 64, rnd6)
      .as[(Long, Long, Double, Int)].collect().map(r => (r._1, r._2)).toSet
    assert(lsh.size <= bf.size)
    val recall = (lsh & bf).size.toDouble / bf.size
    assert(recall >= 0.6, s"md5-lsh recall $recall too low")
    val again = Similarity.lshTopKMd5(queries, all, 5, nbits = 64, bands = 16,
        dim = 64, rnd6)
      .as[(Long, Long, Double, Int)].collect().map(r => (r._1, r._2)).toSet
    assert(again == lsh)
  }

  test("lsh excludeSelf=false: an id collision between unrelated query/corpus " +
       "spaces does not censor a true neighbor") {
    val c = Ctx(spark, "/root/testdata/sf0.001")
    val corpus = Similarity.prepare(c.embeddings, "vec_id", "embedding")
    val buckets = Similarity.lshBuckets(corpus, 64, 16)
    // a query that IS corpus vector 0's embedding but arrives under an
    // id that collides with a DIFFERENT corpus id (50): with the
    // self-search filter its nearest neighbor set is intact (0 is not
    // 50); but a query whose external id collides with its own true
    // neighbor would lose it — assert both directions
    val qSame = c.embeddings.filter(col("vec_id") === 0)
      .select(lit(50L).as("vec_id"), col("embedding"))
    val qs = Similarity.prepare(qSame, "vec_id", "embedding")
    val withFilter = Similarity.lshTopKWith(qs, corpus, buckets, 5, 64, 16,
        rnd6, excludeSelf = true)
      .select("vec_id").as[Long].collect().toSet
    val noFilter = Similarity.lshTopKWith(qs, corpus, buckets, 5, 64, 16,
        rnd6, excludeSelf = false)
      .select("vec_id").as[Long].collect().toSet
    // corpus doc 0 (the exact match, cosine 1.0) survives both ways
    assert(withFilter.contains(0L) && noFilter.contains(0L))
    // corpus doc 50 is a legitimate candidate for the EXTERNAL query
    // "50": only the no-filter mode may ever return it, and the
    // filtered mode must have censored it from the candidate set
    assert(!withFilter.contains(50L))
  }

  test("pq topk on testdata: k results per query, recall vs brute force, deterministic") {
    val c = Ctx(spark, "/root/testdata/sf0.001")
    val all = Similarity.prepare(c.embeddings, "vec_id", "embedding")
    val queries = all.filter(col("id") % 50 === 0)
    val bf = Similarity.bruteForceTopK(queries, all, 5, rnd6)
      .as[(Long, Long, Double, Int)].collect().map(r => (r._1, r._2)).toSet
    val pq = Similarity.pqTopK(all, queries, 5, dim = 64, m = 16,
        codebookSize = 250, rnd6, kmeansIters = 2)
      .as[(Long, Long, Double, Int)].collect().map(r => (r._1, r._2)).toSet
    // PQ always returns exactly k per query (every vector is scored)
    assert(pq.size == bf.size)
    val recall = (pq & bf).size.toDouble / bf.size
    assert(recall >= 0.6, s"pq recall $recall too low")
    // deterministic across runs (seedless codebooks, fixed-order sums)
    val again = Similarity.pqTopK(all, queries, 5, dim = 64, m = 16,
        codebookSize = 250, rnd6, kmeansIters = 2)
      .as[(Long, Long, Double, Int)].collect().map(r => (r._1, r._2)).toSet
    assert(again == pq)
  }

  test("ivf: empty centroid set fails loudly AT ACTION TIME, not at plan build") {
    // ids all odd, centroidEvery even: no id is a multiple -> zero
    // centroids. The guard must be lazy (constructing the frame runs
    // NO job — the round-9 eager isEmpty cost a standalone scan per
    // call, 1.6x on q_ivf_replay and once per AnnStream microbatch)
    // and must still surface the actionable message when executed.
    val corpus = emb(1L -> Seq(1f, 0f), 3L -> Seq(0f, 1f), 5L -> Seq(1f, 1f))
    val queries = Similarity.prepare(corpus, "vec_id", "embedding")
    val plan = Similarity.ivfTopK(corpus, "vec_id", "embedding",
      queries, 2, 2, 1, rnd6) // construction must not throw
    val ex = intercept[Exception] { plan.collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("no centroid candidates")),
      s"expected the centroid guard in the error chain, got: ${msgs(ex)}")
  }

  test("pq: zero-norm corpus vector is dropped in-expression, never ranked") {
    // a zero-norm vector unit-normalizes to NaN and encodes to all -1
    // sentinel codes; AdcScores emits an EMPTY score array so
    // posexplode drops the row — no separate filter on `codes` (a
    // predicate there gets projection-collapsed and re-runs the
    // m-subspace encode per row: the round-9 4.3x regression).
    val all = Similarity.prepare(
      emb(0L -> Seq(1f, 0f, 0f, 0f), 1L -> Seq(0.9f, 0.1f, 0f, 0f),
          2L -> Seq(0f, 1f, 0f, 0f), 3L -> Seq(0f, 0f, 0f, 0f)),
      "vec_id", "embedding")
    val queries = all.filter(col("id") === 0L)
    val got = Similarity.pqTopK(all, queries, 3, dim = 4, m = 2,
        codebookSize = 8, rnd6)
      .as[(Long, Long, Double, Int)].collect()
    assert(!got.exists(_._2 == 3L),
      s"zero-norm vector ranked: ${got.toSeq}")
    assert(got.map(_._2).toSet == Set(1L, 2L), got.toSeq)
  }

  test("pq codebook refinement: golden Lloyd step — means, ties, drops, " +
       "ragged skips, NaN sentinel") {
    // the driver-side per-subspace Lloyd loop, hand-computed: m=2
    // subspaces of sub=2 dims. Subspace 0 starts with codewords
    // (0,0) and (4,0); subspace 1 with (0,0) and (0,4).
    val cb = Array(Array(0.0, 0.0, 4.0, 0.0), Array(0.0, 0.0, 0.0, 4.0))
    val seed = Array(
      Array(1.0, 0.0, 0.0, 1.0),  // ss0 -> cw0 (d²=1 vs 9); ss1 -> cw0
      Array(3.0, 0.0, 0.0, 3.0),  // ss0 -> cw1 (1 vs 9); ss1 -> cw1 (9 vs 1)
      Array(2.0, 0.0, 0.0, 2.0),  // EQUIDISTANT (4 vs 4): tie -> cw0 both
      Array(9.0, 9.0),            // ragged: ss0 ONLY -> cw1 (162 vs 106)
      Array(Double.NaN, 0.0, 0.0, 0.0)) // ss0: NaN scores -> NO cluster;
                                        // ss1 slice (0,0) is finite -> cw0
    val out = Similarity.refineSubspaceCodebooks(seed, cb, sub = 2)
    // ss0: cw0 = mean((1,0),(2,0)) = (1.5,0); cw1 = mean((3,0),(9,9)) = (6,4.5)
    assert(out(0).toSeq == Seq(1.5, 0.0, 6.0, 4.5), out(0).toSeq)
    // ss1: cw0 = mean((0,1),(0,2),(0,0)) = (0,1); cw1 = (0,3) — the NaN
    // sentinel is PER SUBSPACE, so the half-degenerate seed still
    // trains the subspace where its slice is finite
    assert(out(1).toSeq == Seq(0.0, 1.0, 0.0, 3.0), out(1).toSeq)
    // an empty codeword DROPS, order preserved: a codebook where cw0
    // wins everything loses cw1 entirely
    val cbFar = Array(Array(0.0, 0.0, 100.0, 100.0))
    val out2 = Similarity.refineSubspaceCodebooks(
      Array(Array(1.0, 1.0), Array(2.0, 2.0)), cbFar, sub = 2)
    assert(out2(0).toSeq == Seq(1.5, 1.5), out2(0).toSeq)
  }

  test("zero-norm vectors never pass a threshold or steal a rank") {
    // 0/0 would be NaN, which Spark orders ABOVE every number: the
    // degenerate vector would pass any threshold and take rank 1 from
    // every real neighbor. The null-guarded cosine excludes it.
    val all = Similarity.prepare(
      emb(1L -> Seq(1f, 0f), 2L -> Seq(0.9f, 0.1f), 3L -> Seq(0f, 0f)),
      "vec_id", "embedding")
    val q1 = all.filter(col("id") === 1)
    val nd = Similarity.nearDuplicates(q1, all, threshold = 0.5)
      .select("vec_id").as[Long].collect().toSet
    assert(nd == Set(2L), s"zero vector leaked through the threshold: $nd")
    val top = Similarity.bruteForceTopK(q1, all, 1, rnd6)
      .as[(Long, Long, Double, Int)].collect()
    assert(top.map(_._2).toSeq == Seq(2L),
      s"rank 1 stolen from the real neighbor: ${top.toSeq}")
  }

  test("lsh bucket width over 63 bits is rejected (the mask would wrap to 0)") {
    val all = Similarity.prepare(emb(1L -> Seq(1f, 0f)), "vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.lshBuckets(all, nbits = 64, bands = 1)
    }
    assert(ex.getMessage.contains("63"))
  }

  test("PQ: ragged seed vectors cannot misalign the codebook; degenerate size rejected") {
    // every full vector is a codeword (codebookSize covers the corpus),
    // so PQ scoring is EXACT for them — rank-1 must match brute force.
    // A short seed vector once shifted every later codeword in its
    // subspace's flat codebook, silently corrupting all codes.
    val full = Seq(
      0L -> Seq(1f, 0f, 0f, 0f), 1L -> Seq(0.99f, 0.1f, 0f, 0f),
      2L -> Seq(0f, 1f, 0f, 0f), 3L -> Seq(0f, 0.99f, 0.1f, 0f),
      4L -> Seq(0f, 0f, 1f, 0f), 5L -> Seq(0f, 0f, 0.99f, 0.1f),
      6L -> Seq(0.3f, -0.4f, 0.5f, -0.6f), 7L -> Seq(-0.7f, 0.2f, 0.1f, 0.9f))
    val ragged = Seq(10L -> Seq(0.5f, 0.5f, 0.5f)) // 3 of 4 dims
    val all = Similarity.prepare(emb((full ++ ragged): _*),
      "vec_id", "embedding")
    val queries = all.filter(col("id").isin(0L, 2L, 4L))
    val pq = Similarity.pqTopK(all, queries, 1, dim = 4, m = 2,
        codebookSize = 32, rnd6)
      .as[(Long, Long, Double, Int)].collect().map(r => (r._1, r._2)).toSet
    assert(pq == Set((0L, 1L), (2L, 3L), (4L, 5L)), pq)
    val ex = intercept[IllegalArgumentException] {
      Similarity.pqTopK(all, queries, 1, dim = 4, m = 2, codebookSize = 0, rnd6)
    }
    assert(ex.getMessage.contains("codebookSize"))
  }

  test("semdedup: one survivor per cluster, sizes partition the shard") {
    val out = QueriesText.defs("q_semdedup").fn(spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Long, Boolean)].collect()
    val shardSize = out.length
    assert(shardSize > 0)
    val byCluster = out.groupBy(_._2)
    // cluster sizes are consistent and partition the shard
    byCluster.foreach { case (cid, rows) =>
      assert(rows.forall(_._3 == rows.length), s"cluster $cid size mismatch")
      // exactly one survivor, and it is the min id
      val survivors = rows.filter(_._4).map(_._1)
      assert(survivors.toSeq == Seq(rows.map(_._1).min), s"cluster $cid survivors $survivors")
      // the label is the min member id (GraphX CC contract)
      assert(cid == rows.map(_._1).min)
    }
    assert(byCluster.valuesIterator.map(_.length).sum == shardSize)
    // non-degenerate: the corpus shard has at least one true near-dup group
    assert(byCluster.valuesIterator.exists(_.length > 1), "no multi-doc cluster")
  }
}
