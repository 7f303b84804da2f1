package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dimensionality reduction for embedding columns — the step a
  * SemDeDup-style curation pipeline runs before clustering/ANN so the
  * distance computations work in a compact space (beyond-reference;
  * the embeddings family next to [[Similarity]]).
  *
  * Two reducers:
  *
  *  - '''PCA''' ([[fit]]/[[project]]): the optimal linear reducer.
  *    Scale design follows the module's model-scale contract (same as
  *    the PQ codebooks): the DISTRIBUTED work is one aggregation pass
  *    producing the d-vector sum and the d×d second-moment matrix
  *    (per-row O(d²) work is inherent to covariance; partial
  *    aggregation ships ONE d²-length buffer per partition, never
  *    per-row state). The eigensolve then runs driver-side on the
  *    d×d covariance — a few-KB artifact (64×64 here), independent of
  *    corpus size — via a deterministic cyclic Jacobi. Projection
  *    broadcasts the k component vectors as literals into codegen'd
  *    array arithmetic: corpus rows are touched exactly twice (one
  *    aggregate scan, one projection scan), no shuffle of vectors.
  *  - '''Johnson-Lindenstrauss''' ([[jlSigns]]): data-independent
  *    sparse random projection (Achlioptas ±1 signs). Signs derive
  *    from md5 so an external engine can replay them — the same
  *    replayability convention as `q_minhash_replay` — which makes
  *    the projection oracle-checkable end to end (`q_jl_project`).
  */
object DimReduce {
  /** Driver-side PCA model: model-scale by contract (k·d + d doubles —
    * a few KB; never corpus-sized). Components are rows, unit-norm,
    * mutually orthogonal, ordered by eigenvalue descending, each
    * sign-canonicalized (largest-|coordinate| entry positive) so the
    * model is unique and reproducible across runs and cluster layouts. */
  final case class PcaModel(mean: Array[Double],
                            components: Array[Array[Double]],
                            eigenvalues: Array[Double],
                            totalVariance: Double) {
    def dim: Int = mean.length
    def k: Int = components.length
    /** Fraction of total variance captured by the first `m` components. */
    def explained(m: Int): Double =
      if (totalVariance <= 0) 0.0
      else eigenvalues.take(m).sum / totalVariance
  }

  /** One distributed pass: n, Σx (length d), and Σ x⊗x flattened
    * row-major (length d²). The outer product materializes d² doubles
    * per row — inherent to covariance — and the element-wise VectorSum
    * aggregate combines map-side, so the shuffle carries one d²-length
    * buffer per partition regardless of row count. */
  private def moments(df: DataFrame, vecCol: Column): (Long, Array[Double], Array[Double]) = {
    graft.functions.NativeFunctions.register(df.sparkSession)
    import graft.functions.NativeFunctions.vectorSum
    // null vectors are excluded from n AND the sums together: VectorSum
    // skips nulls on its own, so counting them would divide the mean
    // (and every covariance entry) by the wrong n — a silently skewed
    // model on any corpus with missing embeddings
    val prepared = df
      .select(transform(vecCol, x => x.cast("double")).as("v"))
      .filter(col("v").isNotNull)
      .withColumn("outer",
        flatten(transform(col("v"), x => transform(col("v"), y => x * y))))
    val r = prepared
      .agg(count(lit(1)), vectorSum(col("v")), vectorSum(col("outer")))
      .head()
    val n = r.getLong(0)
    // VectorSum returns null over an empty input — getSeq would NPE
    // with no hint the input was the problem
    require(n > 0, "PCA/JL needs at least one non-null vector")
    (n,
     r.getSeq[Double](1).toArray,
     r.getSeq[Double](2).toArray)
  }

  /** Eigen-decomposition of a symmetric matrix by cyclic Jacobi
    * rotations (driver-side; d is model-scale). Deterministic: fixed
    * sweep order, fixed convergence threshold, no randomness. Returns
    * (eigenvalues, eigenvectors-as-rows) sorted by eigenvalue
    * descending, each vector sign-canonicalized. */
  def jacobiEigen(a: Array[Array[Double]], maxSweeps: Int = 64,
                  tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    val m = Array.tabulate(d, d)((i, j) => a(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiagNorm(m)
    val scale = math.max(1.0, frobenius(m))
    while (sweep < maxSweeps && off > tol * scale) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = m(p)(q)
          if (math.abs(apq) > 1e-300) {
            // classic symmetric Schur decomposition of the 2x2 block
            val theta = (m(q)(q) - m(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val mip = m(i)(p); val miq = m(i)(q)
              m(i)(p) = c * mip - s * miq
              m(i)(q) = s * mip + c * miq
              i += 1
            }
            i = 0
            while (i < d) {
              val mpi = m(p)(i); val mqi = m(q)(i)
              m(p)(i) = c * mpi - s * mqi
              m(q)(i) = s * mpi + c * mqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiagNorm(m)
      sweep += 1
    }
    val pairs = (0 until d).map { j =>
      (m(j)(j), canonicalize(Array.tabulate(d)(i => v(i)(j))))
    }.sortBy(-_._1) // stable sort: exact-tie order follows the
                    // deterministic Jacobi output, so it reproduces
    (pairs.map(_._1).toArray, pairs.map(_._2).toArray)
  }

  private def frobenius(m: Array[Array[Double]]): Double =
    math.sqrt(m.iterator.map(r => r.iterator.map(x => x * x).sum).sum)

  private def offDiagNorm(m: Array[Array[Double]]): Double = {
    var s = 0.0; var i = 0
    while (i < m.length) {
      var j = 0
      while (j < m.length) { if (i != j) s += m(i)(j) * m(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  /** Flip so the largest-|entry| coordinate (first on ties) is positive
    * — removes the eigenvector sign ambiguity. */
  private def canonicalize(vec: Array[Double]): Array[Double] = {
    var best = 0; var i = 1
    while (i < vec.length) {
      if (math.abs(vec(i)) > math.abs(vec(best))) best = i
      i += 1
    }
    if (vec(best) < 0) vec.map(x => -x) else vec
  }

  /** Fit a k-component PCA: one distributed aggregation pass + a
    * driver-side d×d eigensolve. */
  def fit(df: DataFrame, vecCol: Column, k: Int): PcaModel = {
    val (n, sum, sumOuter) = moments(df, vecCol)
    require(n > 0, "PCA needs a non-empty input")
    val d = sum.length
    val mean = sum.map(_ / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      sumOuter(i * d + j) / n - mean(i) * mean(j)
    }
    val (evals, evecs) = jacobiEigen(cov)
    PcaModel(mean, evecs.take(k), evals.take(k),
      // trace = total variance; clamp tiny negative rounding residue
      evals.iterator.map(math.max(_, 0.0)).sum)
  }

  /** Append `outCol`: the k mean-centered principal coordinates of
    * `vecCol`. Components ship as literals into codegen'd zip_with /
    * aggregate arithmetic (the PqArgmin convention) — one projection
    * scan, no shuffle, no join. dot(x−μ, c) folds to dot(x, c) − μ·c
    * with the constant precomputed on the driver. */
  def project(df: DataFrame, vecCol: Column, model: PcaModel,
              outCol: String): DataFrame = {
    val v = transform(vecCol, x => x.cast("double"))
    val coords = model.components.map { comp =>
      val mu = comp.iterator.zip(model.mean.iterator).map { case (c, m) => c * m }.sum
      aggregate(
        zip_with(v, typedlit(comp.toSeq), (x, c) => x * c),
        lit(0.0), (acc, x) => acc + x) - lit(mu)
    }
    df.withColumn(outCol, array(coords.toIndexedSeq: _*))
  }

  /** Achlioptas ±1 sign matrix for a k-dim JL projection, derived from
    * md5("prefix<j>_<i>") — first hex nibble 0–7 ⇒ +1, 8–f ⇒ −1 — so
    * any md5-capable engine reproduces it exactly (q_jl_project's
    * DuckDB oracle does). Model-scale: k·d entries on the driver. */
  def jlSigns(k: Int, d: Int, prefix: String = "jl"): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(k, d) { (j, i) =>
      val h = md.digest(
        s"$prefix${j}_$i".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      if ((h(0) & 0x80) == 0) 1.0 else -1.0 // first hex nibble 0-7 => +1
    }
  }
}
