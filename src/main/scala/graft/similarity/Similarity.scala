package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (beyond-reference; SURVEY.md §7.6).
  *
  * Vectors are `array<float>` columns cast to double before any
  * arithmetic: float accumulation orders differ across engines, double
  * sequential fold is bit-reproducible (and matches the DuckDB oracle's
  * list_dot_product over DOUBLE[]).
  *
  * Brute force is the correctness baseline: queries × corpus via
  * broadcast of the (small) query set — one pass over the corpus, no
  * shuffle of the big side. The IVF variant is the scale path: cluster
  * assignment bounds each query to nprobe partitions of the corpus, so
  * cost drops from |Q|·|C| to |Q|·(nprobe/K)·|C| with the same
  * DataFrame-only plan shape. All ordering ties are broken on vec_id,
  * so results are deterministic.
  */
object Similarity {
  /** Sequential-fold dot product — the codegen'd native expression
    * ([[graft.functions.DotProduct]]); same accumulation order as the
    * zip_with+aggregate formulation it replaced, ~allocation-free. */
  def dot(a: Column, b: Column): Column = graft.functions.NativeFunctions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine with a zero-norm guard: a degenerate all-zeros embedding
    * has no direction, and the raw 0/0 would be NaN — which Spark
    * orders ABOVE every number, so one zero vector would pass any
    * similarity threshold and steal rank 1 from a real neighbor for
    * every query. nullif makes the score NULL instead: filtered out by
    * any threshold comparison, sorted last (nulls-last) by every
    * rank window. Fixtures contain no zero vectors, so oracle twins
    * are unaffected. */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / nullif(normA * normB, lit(0.0))

  /** (id, vec double[], norm) projection of an embeddings table. */
  def prepare(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    graft.functions.NativeFunctions.register(emb.sparkSession)
    val v = transform(col(vecCol), x => x.cast("double"))
    emb.select(col(idCol).as("id"), v.as("v")).withColumn("nrm", norm(col("v")))
  }

  /** All (query, corpus) pairs with cosine ≥ threshold, self excluded.
    * `queries`/`corpus` are outputs of [[prepare]]. */
  def nearDuplicates(queries: DataFrame, corpus: DataFrame,
                     threshold: Double): DataFrame = {
    val q = broadcast(queries.select(col("id").as("query_id"),
      col("v").as("qv"), col("nrm").as("qn")))
    corpus.select(col("id").as("vec_id"), col("v"), col("nrm"))
      .join(q, col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("v"), col("qn"), col("nrm")))
      .filter(col("cos") >= threshold)
      .select(col("query_id"), col("vec_id"), col("cos"))
  }

  /** Exact top-k cosine neighbors per query (brute force baseline).
    * Ranking uses the rounded cosine + id tie-break so the winner set
    * is stable across engines and partitionings. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     roundedCos: Column => Column): DataFrame = {
    val scored = nearDuplicates(queries, corpus, threshold = -2.0)
      .withColumn("cos_r", roundedCos(col("cos")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_r").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id"), col("cos_r"), col("rn"))
  }

  /** Lloyd k-means refinement of a centroid set, as pure DataFrame
    * ops: assign (crossJoin with the broadcast centroids — they are
    * K·dim doubles, tiny), then recompute each centroid as the
    * element-wise mean of its members (posexplode → per-(cid,dim) avg →
    * re-assemble ordered by dim). Refined centroids cut IVF's recall
    * loss on weakly-clustered data; iterations are O(iters · |corpus| ·
    * K) with no driver-side state, so the same code runs at cluster
    * scale. */
  /** argmax-by-cosine as an AGGREGATE, not a rank window: max_by with
    * a (cos, -cid) ordering struct gets map-side partial aggregation —
    * each task reduces its slice of the candidates×vectors product to
    * one running best per vector, instead of shuffling and sorting the
    * whole product per id. Tie-break matches orderBy(cos desc, cid
    * asc); `score` must be the same cosine expression the rank-window
    * formulation ordered by (rounded vs raw changes assignments at the
    * rounding boundary). `payload` is what to keep for the winner. */
  private def argmaxByCos(pairs: DataFrame, payload: Column,
                          score: Column): DataFrame =
    pairs.groupBy(col("id"))
      .agg(max_by(payload, struct(score, -col("cid"))).as("best"))

  def refineCentroids(all: DataFrame, centroids: DataFrame,
                      iters: Int): DataFrame = {
    if (iters <= 0) return centroids
    val spark = centroids.sparkSession
    // Centroid sets are MODEL-SCALE by contract (K·dim doubles — the
    // same bounded-driver-artifact contract as pqTopK's codebooks), so
    // the Lloyd loop iterates them DRIVER-side: each pass is exactly
    // ONE job (assignment + per-centroid mean, K rows collected) and
    // the next pass's crossJoin broadcasts a LocalRelation job-free.
    // The old shape (localCheckpoint per pass) paid a checkpoint job
    // PLUS a broadcast-build job per iteration and a final broadcast
    // build in the caller. Values are bit-identical: the collect reads
    // the same aggregate output the checkpoint would have stored
    // (q_kmeans_replay / q_ivf_refined_replay hash-match pins this).
    var cur = centroids
    for (_ <- 1 to iters) {
      val assigned = argmaxByCos(
          all.crossJoin(broadcast(cur)),
          struct(col("cid"), col("v")),
          cosine(col("cv"), col("v"), col("cn"), col("nrm")))
        .select(col("best.cid").as("cid"), col("best.v").as("v"))
      // centroid mean via the element-wise VectorSum aggregate: one
      // dims-long buffer per centroid per partition, instead of
      // posexplode (|members|·dims rows) + two more aggregations
      val means = assigned
        .groupBy(col("cid"))
        .agg(graft.functions.NativeFunctions.vectorSum(col("v")).as("vs"),
             count(lit(1)).as("cnt"))
        .select(col("cid"),
                transform(col("vs"), x => x / col("cnt")).as("cv"))
        .withColumn("cn", norm(col("cv")))
      val rows = means.collect() // K rows — bounded by the centroid cap
      cur = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), means.schema)
    }
    cur
  }

  /** IVF (inverted-file) approximate top-k: centroids start as a
    * deterministic subsample (id % centroidEvery == 0), optionally
    * k-means-refined; each corpus vector is assigned to its nearest
    * centroid; a query scans only the `nprobe` centroids nearest to
    * it.
    *
    * `maxCentroids` caps the centroid count independently of the
    * corpus: the first `maxCentroids` subsampled ids BY RANK (order
    * by id, limit — a TakeOrderedAndProject over the nlist-sized
    * subsample, like pqTopK's codebook cap), not by id range. A range
    * cut (id < centroidEvery·maxCentroids) silently selects fewer or
    * ZERO centroids on offset or sparse id spaces — empty broadcast,
    * empty assignment join, empty result with no error. Without a
    * cap, nlist grows as corpus/centroidEvery and the corpus→centroid
    * assignment — a corpus×nlist product — turns quadratic in the
    * corpus (the round-9 sf1 rehearsal measured 18× cost for 10×
    * data). FAISS-style guidance applies: pick nlist ~ O(√corpus) or
    * a fixed budget, never a fixed SPACING; a capped nlist trades
    * recall (bigger cells, same nprobe) for linear assignment, the
    * standard IVF contract. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              queries: DataFrame, k: Int, centroidEvery: Int, nprobe: Int,
              roundedCos: Column => Column, kmeansIters: Int = 0,
              maxCentroids: Int = Int.MaxValue,
              excludeSelf: Boolean = true): DataFrame = {
    // centroidEvery <= 0: `id % 0` is NULL under ANSI-off, the filter
    // drops every row, and the result is silently empty — fail loudly
    // like pqTopK's codebookSize guard and lshBuckets' bit guard
    require(centroidEvery >= 1, s"centroidEvery must be >= 1, got $centroidEvery")
    require(nprobe >= 1 && k >= 1, s"nprobe ($nprobe) and k ($k) must be >= 1")
    val all = prepare(emb, idCol, vecCol)
    val sub = all.filter(col("id") % centroidEvery === 0)
      .select(col("id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    val cent0 = if (maxCentroids == Int.MaxValue) sub
                else sub.orderBy(col("cid")).limit(maxCentroids)
    val cent = broadcast(
      if (kmeansIters > 0) refineCentroids(all, cent0, kmeansIters)
      else cent0)

    // An id space with NO multiples of centroidEvery (tiny corpus, or
    // ids all in one residue class) yields zero centroids — empty
    // broadcast, empty assignment join, silently empty result. The
    // guard must be LAZY: an eager `cent0.isEmpty` is a standalone
    // Spark job per ivfTopK CALL (subsample scan + orderBy/limit),
    // paid even when the returned frame is composed lazily — and in
    // AnnStream it re-ran per microbatch (round-9 measured 1.6× on
    // q_ivf_replay). Instead the query-probe side joins the broadcast
    // centroids LEFT on `true`: an empty centroid set null-pads every
    // query row instead of silently dropping it, and the coalesced
    // raise_error fires inside the plan the caller already executes —
    // zero extra jobs, zero extra scans. (Queries empty → zero rows →
    // correct empty result, nothing to guard.)
    def joinCentGuarded(vecs: DataFrame): DataFrame =
      vecs.join(cent, lit(true), "left")
        .withColumn("cid", coalesce(col("cid"), raise_error(lit(
          s"no centroid candidates: no id in '$idCol' is a multiple of " +
          s"$centroidEvery — pick a smaller centroidEvery for this id " +
          "space")).cast(cent0.schema("cid").dataType)))

    def nearestCentroids(vecs: DataFrame, n: Int): DataFrame = {
      val w = Window.partitionBy(col("id"))
        .orderBy(roundedCos(cosine(col("cv"), col("v"), col("cn"), col("nrm"))).desc,
                 col("cid"))
      joinCentGuarded(vecs)
        .withColumn("crn", row_number().over(w))
        .filter(col("crn") <= n)
    }

    // corpus→centroid assignment via the aggregate argmax (map-side
    // partial reduction over the corpus×centroid product); the query
    // side keeps the rank window — it needs top-nprobe, and the
    // query set is small by construction. The corpus side carries the
    // SAME lazy empty-centroid guard: AQE's empty-relation propagation
    // can short-circuit the final probe⋈assigned join off an empty
    // assignment stage before the probe side's guard ever evaluates,
    // so each side must fail loudly on its own.
    val assigned = argmaxByCos(joinCentGuarded(all),
        struct(col("cid"), col("v"), col("nrm")),
        // rounded, matching the rank-window ordering this replaced
        roundedCos(cosine(col("cv"), col("v"), col("cn"), col("nrm"))))
      // best.v/best.nrm are the CORPUS vector's own vector and norm
      // (the struct argmaxByCos reduced over) — named vvec/vnrm so a
      // future reader does not mistake them for the centroid's
      .select(col("id").as("vec_id"), col("best.cid").as("cid"),
              col("best.v").as("vvec"), col("best.nrm").as("vnrm"))
    val probes = nearestCentroids(queries, nprobe)
      .select(col("id").as("query_id"), col("cid"), col("v").as("qv"),
              col("nrm").as("qn"))

    val scored0 = probes.join(assigned, Seq("cid"))
      .withColumn("cos_r",
        roundedCos(cosine(col("qv"), col("vvec"), col("qn"), col("vnrm"))))
    val scored =
      if (excludeSelf) scored0.filter(col("query_id") =!= col("vec_id"))
      else scored0
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_r").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id"), col("cos_r"), col("rn"))
  }

  /** Random-hyperplane (sign-bit) LSH bucketing — the other classic
    * ANN scale path next to IVF. Each vector gets `nbits` sign bits
    * (sign of ⟨v, h_p⟩ for hyperplane p); bits group into `bands`
    * buckets; near vectors (small angle) collide in ≥1 band with high
    * probability. Hyperplane weights are derived from xxhash64(p·4096
    * + dim) — deterministic across runs/executors with no side state
    * to distribute. Returns one (id, band, bucket) row per band. */
  def lshBuckets(prepared: DataFrame, nbits: Int, bands: Int): DataFrame = {
    graft.functions.NativeFunctions.register(prepared.sparkSession)
    // all nbits sign bits in ONE codegen'd pass (LshSignBits), then
    // each band's bucket is a shift+mask over the packed long
    bandBuckets(prepared.select(col("id"),
      graft.functions.NativeFunctions.lshBits(col("v"), nbits).as("__bits")),
      nbits, bands)
  }

  /** Md5-mode sign-bit buckets — the MinHashLSH HashMode convention
    * applied to hyperplane LSH: planes are ±1 sign rows derived
    * driver-side from md5 ([[DimReduce.jlSigns]]) and the vector is
    * fixed-pointed (×10⁴, the q_jl_project convention), so every sign
    * decision is exact integer arithmetic that any engine replays
    * bit-identically (DuckDB: md5 nibble → ±1, list_dot_product ≥ 0).
    * Same banding and downstream join/rerank code as the xxhash64
    * production path; use for verification surfaces. */
  def lshBucketsMd5(prepared: DataFrame, nbits: Int, bands: Int,
                    dim: Int, prefix: String = "lshq"): DataFrame = {
    graft.functions.NativeFunctions.register(prepared.sparkSession)
    val planes = lit(DimReduce.jlSigns(nbits, dim, prefix).flatten)
    val iv = prepared.select(col("id"),
      // floor() returns LONG; the expression wants array<double> —
      // the cast is exact (|values| ≪ 2^53) and keeps one input type
      transform(col("v"),
        x => floor(x * 10000 + lit(0.5)).cast("double")).as("__iv"))
    bandBuckets(iv.select(col("id"),
      graft.functions.NativeFunctions.planeBits(col("__iv"), planes)
        .as("__bits")), nbits, bands)
  }

  /** Shared banding over a packed sign-bit long: one (id, band,
    * bucket) row per band, bucket = bits[b·r, (b+1)·r) as an int. */
  private def bandBuckets(withBits: DataFrame, nbits: Int,
                          bands: Int): DataFrame = {
    require(nbits % bands == 0, "nbits must be divisible by bands")
    // r = 64 would shift 1L by 64 — a mod-64 no-op in the JVM, so the
    // mask silently became 0 and EVERY vector landed in bucket 0: the
    // bucket join degenerates to the full |Q|×|C| cross product
    require(nbits / bands <= 63,
      s"bits per band must be <= 63, got ${nbits / bands} (nbits=$nbits, bands=$bands)")
    val r = nbits / bands
    val mask = (1L << r) - 1
    withBits.select(col("id"),
      posexplode(array((0 until bands).map(b =>
        shiftright(col("__bits"), b * r).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "bucket")))
  }

  /** LSH-bucketed approximate top-k: bucket-collision candidates,
    * exact-cosine rerank. Work is |collisions| + rerank, vs |Q|·|C|
    * brute force; like MinHash LSH, the bucket join is the only
    * all-pairs step and its size is bounded by construction. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              nbits: Int, bands: Int,
              roundedCos: Column => Column): DataFrame =
    lshTopKWith(queries, corpus, lshBuckets(corpus, nbits, bands),
                k, nbits, bands, roundedCos)

  /** [[lshTopK]] with the corpus bucket table supplied by the caller —
    * for repeated lookups against the same corpus (a streaming sink, a
    * query service), where recomputing the corpus signatures per call
    * would dominate: buckets are deterministic (hash-derived
    * hyperplanes), so compute them once, persist, and reuse.
    *
    * `excludeSelf` (default true) drops candidates whose corpus id
    * equals the query id — right for SELF-search, where queries are
    * drawn from the corpus and "your own row" is a degenerate
    * neighbor. Pass FALSE when the two id spaces are unrelated (a
    * stream of external queries against a static corpus): there an
    * accidental id collision would otherwise silently censor a true
    * nearest neighbor from that query's top-k. */
  def lshTopKWith(queries: DataFrame, corpus: DataFrame,
                  corpusBuckets: DataFrame, k: Int,
                  nbits: Int, bands: Int,
                  roundedCos: Column => Column,
                  excludeSelf: Boolean = true): DataFrame =
    lshRerank(queries, corpus, corpusBuckets,
      lshBuckets(queries, nbits, bands), k, roundedCos, excludeSelf)

  /** [[lshTopK]] with md5-derived ±1 planes on BOTH sides
    * ([[lshBucketsMd5]]): the end-to-end ANN query becomes DuckDB-
    * replayable — which pairs the banding surfaces included — while
    * exercising the same candidate-join + exact-rerank code as the
    * production path. */
  def lshTopKMd5(queries: DataFrame, corpus: DataFrame, k: Int,
                 nbits: Int, bands: Int, dim: Int,
                 roundedCos: Column => Column): DataFrame =
    lshRerank(queries, corpus, lshBucketsMd5(corpus, nbits, bands, dim),
      lshBucketsMd5(queries, nbits, bands, dim), k, roundedCos,
      excludeSelf = true)

  /** Candidate join + exact-cosine rerank shared by every LSH top-k
    * variant; `queryBuckets` is broadcast (the query side is small by
    * the same contract as [[bruteForceTopK]]). */
  private def lshRerank(queries: DataFrame, corpus: DataFrame,
                        corpusBuckets: DataFrame, queryBuckets: DataFrame,
                        k: Int, roundedCos: Column => Column,
                        excludeSelf: Boolean): DataFrame = {
    val qb = broadcast(queryBuckets.withColumnRenamed("id", "query_id"))
    val cand0 = corpusBuckets
      .join(qb, Seq("band", "bucket"))
    val cand = (if (excludeSelf) cand0.filter(col("query_id") =!= col("id"))
                else cand0)
      .select("query_id", "id").distinct()
    val q = broadcast(queries.select(col("id").as("query_id"),
      col("v").as("qv"), col("nrm").as("qn")))
    val scored = cand
      .join(corpus.select(col("id"), col("v"), col("nrm")), "id")
      .join(q, "query_id")
      .withColumn("cos_r", roundedCos(cosine(col("qv"), col("v"), col("qn"), col("nrm"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_r").desc, col("id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("id").as("vec_id"), col("cos_r"), col("rn"))
  }

  /** ONE per-subspace Lloyd refinement step over the training sample,
    * entirely driver-side (the faiss/MLlib convention: codebooks train
    * on a bounded sample, not the corpus — a corpus-wide assignment
    * pass per iteration costs full scans for marginal centroid
    * quality). Same semantics the Spark formulation had: L2 argmin via
    * 2·x·c − |c|² ([[graft.functions.PqArgmin.bestIndex]], the ONE
    * definition shared with the encode expression — its -1 for a
    * degenerate NaN vector or empty codebook contributes to no
    * cluster), ties to the lowest index, empty codewords drop with
    * index order preserved, ragged (short) seeds skipped per
    * subspace. Deterministic throughout; golden-tested directly in
    * SimilaritySpec. */
  private[graft] def refineSubspaceCodebooks(
      seed: Array[Array[Double]], cb: Array[Array[Double]],
      sub: Int): Array[Array[Double]] =
    Array.tabulate(cb.length) { j =>
      val cbj = cb(j)
      val n = cbj.length / sub
      val sums = Array.fill(n)(new Array[Double](sub))
      val cnts = new Array[Long](n)
      seed.filter(_.length >= (j + 1) * sub).foreach { v =>
        val best = graft.functions.PqArgmin.bestIndex(v, j * sub, cbj, sub)
        if (best >= 0) {
          cnts(best) += 1
          var d2 = 0
          while (d2 < sub) { sums(best)(d2) += v(j * sub + d2); d2 += 1 }
        }
      }
      (0 until n).filter(cnts(_) > 0).toArray
        .flatMap(c => sums(c).map(_ / cnts(c)))
    }

  /** Product quantization (PQ, Jégou et al. 2011) approximate top-k —
    * the memory-compression ANN scale path next to IVF (partitioning)
    * and sign-LSH (bucketing). Vectors are unit-normalized (so cosine
    * = dot), split into `m` contiguous subspaces; each subvector is
    * encoded as the id of its nearest codeword (L2) from a
    * deterministic per-subspace codebook (`id % codebookEvery == 0`
    * sample, the same seedless convention as IVF's centroids). A query
    * is answered ADC-style: its dot product against every codeword is
    * tabulated once (|codebook|·m lookups), and a corpus vector's
    * approximate score is the sum of m table entries — the corpus is
    * never re-read at full precision.
    *
    * The codebook trains on a FIXED-SIZE deterministic sample
    * (md5-ordered top-`codebookSize` — a seedless pseudo-random draw
    * that plans as TakeOrderedAndProject, per-partition heaps, no
    * global sort), so it stays broadcast-sized no matter how large the
    * corpus grows — unlike a `%`-sampled codebook, whose size tracks
    * the corpus and eventually can't broadcast.
    *
    * At 100 TB this is the point: the scoring pass touches only the
    * (vec_id, subspace, code) triples — m small ints per vector
    * instead of `dim` floats (16× compression at dim=64, m=4) — and
    * every join on the big side is against a broadcast table.
    *
    * Determinism: per (query, vector, subspace) exactly one table row
    * matches, so the approximate score is assembled with a fixed-order
    * sum of m per-subspace singletons (no float accumulation-order
    * ambiguity); ranking uses the rounded score + vec_id tie-break. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             dim: Int, m: Int, codebookSize: Int,
             roundedScore: Column => Column, kmeansIters: Int = 0,
             excludeSelf: Boolean = true): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    // an empty codebook would make the ADC stride 0 and scoring divide
    // by zero per corpus row at scan time, far from the misconfiguration
    require(codebookSize >= 1, s"codebookSize must be >= 1, got $codebookSize")
    val sub = dim / m
    graft.functions.NativeFunctions.register(corpus.sparkSession)
    // Spark's non-ANSI divide returns NULL (not IEEE NaN) on a zero
    // divisor, and null array slots read back as 0.0 through
    // UnsafeArrayData — a zero-norm vector would silently encode AS
    // the zero vector (argmin = the min-norm codeword) instead of
    // hitting PqArgmin's NaN -> -1 sentinel path. Map the nulls to
    // NaN explicitly so degenerate vectors take the documented
    // sentinel route (all -1 codes -> AdcScores emits empty -> row
    // dropped by posexplode).
    def unit(df: DataFrame): DataFrame =
      df.select(col("id"),
        transform(col("v"),
          x => coalesce(x / col("nrm"), lit(Double.NaN))).as("u"))
    val cu = unit(corpus)

    // Codebooks live DRIVER-side as flat row-major arrays — model-scale
    // data (m · |codebook| · sub doubles, ~64 KB), the same place
    // MLlib keeps k-means centers. Encoding is then ONE codegen'd
    // PqArgmin loop per subvector instead of a |codebook|-way join +
    // argmax aggregation (the former 10M-row blowup per encode pass).
    // ONE collect job fetches BOTH driver-side model artifacts — the
    // md5-sampled codebook seed AND the unit-normalized query vectors
    // (both model-scale by contract). They were two separate collect
    // jobs before; each job is pure fixed overhead at this size, and
    // the union costs nothing extra (the subplans run inside the one
    // job).
    val bothRows = cu
      .join(corpus
        .orderBy(md5(col("id").cast("string").cast("binary")), col("id"))
        .limit(codebookSize).select("id"), "id")
      .withColumn("__role", lit(0))
      .unionByName(unit(queries).withColumn("__role", lit(1)))
      .collect()
    val seed = bothRows.filter(_.getInt(2) == 0)
      .sortBy(_.getAs[Number](0).longValue) // int/short ids too
      .map(_.getSeq[Double](1).toArray)
      // a degenerate (zero-norm) sample is all-NaN after unit
      // normalization: as a codeword it can never win an argmin (NaN
      // scores) but it would waste a slot and put NaN into the ADC
      // tables — keep the codebook finite
      .filter(_.forall(java.lang.Double.isFinite))
    // ragged (shorter-than-dim) seed vectors are skipped PER SUBSPACE,
    // exactly as the refinement loop below does: one short vector's
    // partial slice would otherwise shift every subsequent codeword in
    // the flat row-major codebook — silently wrong codes, no error
    var cb: Array[Array[Double]] = Array.tabulate(m)(j =>
      seed.filter(_.length >= (j + 1) * sub)
        .flatMap(v => v.slice(j * sub, (j + 1) * sub)))
    require(seed.isEmpty || cb.forall(_.nonEmpty),
      s"every subspace needs at least one full-length ($dim) seed vector")

    // codebooks/ADC tables ride as broadcast-carried constants, not
    // literals: a lit() of these arrays lands in EVERY stage's task
    // binary (2.4 MiB measured for the ADC tables) and Catalyst
    // hashes the payload — see NativeFunctions.ConstDoubleArray
    val sess = corpus.sparkSession
    def codeCols(cbArr: Array[Array[Double]]): Seq[Column] = {
      val cbCols = cbArr.map(a =>
        graft.functions.NativeFunctions.constDoubleArray(sess, a))
      (0 until m).map { j =>
        // ragged corpus vectors: a short slice would make PqArgmin
        // parse the codebook at the wrong stride and return a
        // VALID-LOOKING but out-of-range code (AdcScores would then
        // read another subspace's table entry, or past the table).
        // Emit the explicit no-codeword sentinel instead.
        when(size(col("u")) >= (j + 1) * sub,
          graft.functions.NativeFunctions
            .pqArgmin(slice(col("u"), j * sub + 1, sub), cbCols(j)))
          .otherwise(lit(-1))
          .as(s"code_$j")
      }
    }

    for (_ <- 1 to kmeansIters) cb = refineSubspaceCodebooks(seed, cb, sub)

    // encode the corpus: m int codes per vector, single codegen'd pass
    val codes = cu.select(col("id").as("vec_id"),
                          array(codeCols(cb): _*).as("codes"))

    // ADC lookup tables for ALL queries, built DRIVER-side (queries
    // are broadcast-small by the same contract as bruteForceTopK; the
    // tables are |Q| · Σ n_j doubles — model scale). Scoring is then a
    // pure corpus projection: ONE AdcScores loop emits every query's
    // score per vector, posexplode pairs them with query ids, and the
    // rank window sees only narrow (query, vec, score) rows. The
    // joined formulation this replaces dragged each query's tables
    // (~16 KB) through every join-output row — GBs of UnsafeRow
    // materialization just to read m doubles per row.
    val qRows = bothRows.filter(_.getInt(2) == 1)
      .sortBy(_.getAs[Number](0).longValue) // int/short ids too
    val qIds = qRows.map(_.getAs[Number](0).longValue)
    val qVecs = qRows.map(_.getSeq[Double](1).toArray)
    val njs = (0 until m).map(j => cb(j).length / sub)
    val offsets = njs.scanLeft(0)(_ + _) // m prefix offsets + total stride
    val stride = offsets(m)
    val tables = new Array[Double](qIds.length * stride)
    for (qi <- qIds.indices; j <- 0 until m; ci <- 0 until njs(j)) {
      var s = 0.0
      var d2 = 0
      while (d2 < sub) {
        s += qVecs(qi)(j * sub + d2) * cb(j)(ci * sub + d2)
        d2 += 1
      }
      tables(qi * stride + offsets(j) + ci) = s
    }

    // a degenerate corpus vector (zero-norm -> NaN after unit
    // normalization) encodes to ALL -1 sentinel codes; its all-zero
    // score would OUTRANK every real negative-similarity neighbor —
    // the "zero vector steals rank 1" failure the cosine() nullif
    // guard prevents in the exact paths. AdcScores returns an EMPTY
    // array for such rows, so posexplode drops them here with no
    // separate predicate: a filter on `codes` would be projection-
    // collapsed into this select and re-run the m-subspace encode
    // per row (the 4.3× round-9 regression).
    val scored = codes
      .select(col("vec_id"),
        posexplode(graft.functions.NativeFunctions.adcScores(
          col("codes"),
          graft.functions.NativeFunctions.constDoubleArray(sess, tables),
          lit(offsets.toArray)))
          .as(Seq("__qi", "score")))
      .select(element_at(lit(qIds), col("__qi") + 1).as("query_id"),
              col("vec_id"), roundedScore(col("score")).as("score_r"))
    val scoredX =
      if (excludeSelf) scored.filter(col("query_id") =!= col("vec_id"))
      else scored
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_r").desc, col("vec_id"))
    scoredX.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col("vec_id"), col("score_r"), col("rn"))
  }
}
