package graft

import graft.similarity.DimReduce
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DimReduceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = Ctx(spark, sfDir).embeddings

  test("jacobiEigen: golden 2x2 and diagonal 3x3") {
    val (ev, vecs) = DimReduce.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(ev(0) - 3.0) < 1e-12 && math.abs(ev(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(vecs(0).zip(Array(r, r)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    // canonicalized: largest-|entry| coordinate positive
    assert(vecs(1).map(math.abs).zip(Array(r, r)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    assert(vecs(1)(0) > 0 || vecs(1)(1) > 0)

    val (dv, dvecs) = DimReduce.jacobiEigen(Array(
      Array(5.0, 0.0, 0.0), Array(0.0, 9.0, 0.0), Array(0.0, 0.0, 1.0)))
    assert(dv.toSeq == Seq(9.0, 5.0, 1.0))
    assert(dvecs(0).toSeq == Seq(0.0, 1.0, 0.0))
  }

  test("fit: eigen equation, orthonormality, descending spectrum, trace") {
    val model = DimReduce.fit(emb, col("embedding"), k = 8)
    val d = model.dim
    assert(d == 64 && model.k == 8)

    // recompute covariance locally from the same rows — the distributed
    // moment pass must agree with the straightforward driver-side math
    val rows = emb.select(transform(col("embedding"), x => x.cast("double")))
      .as[Seq[Double]].collect().map(_.toArray)
    val n = rows.length
    val mean = Array.tabulate(d)(i => rows.iterator.map(_(i)).sum / n)
    assert(mean.zip(model.mean).forall { case (a, b) => math.abs(a - b) < 1e-9 },
      "distributed mean != local mean")
    val cov = Array.tabulate(d, d) { (i, j) =>
      rows.iterator.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n
    }
    val trace = (0 until d).map(i => cov(i)(i)).sum
    assert(math.abs(trace - model.totalVariance) < 1e-6)

    // spectrum: descending, non-negative (covariance is PSD)
    assert(model.eigenvalues.sliding(2).forall(p => p(0) >= p(1) - 1e-12))
    assert(model.eigenvalues.forall(_ >= -1e-9))

    // eigen equation against the LOCAL covariance: C v = lambda v
    model.components.zip(model.eigenvalues).foreach { case (v, lam) =>
      val cv = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v(j)).sum)
      val resid = math.sqrt(cv.zip(v).map { case (a, b) => val e = a - lam * b; e * e }.sum)
      assert(resid < 1e-8, s"eigen residual $resid for lambda=$lam")
    }

    // orthonormality
    for (a <- model.components.indices; b <- a until model.k) {
      val dot = model.components(a).zip(model.components(b)).map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"component dot($a,$b)=$dot")
    }

    // PCA optimality floor: top-8 of 64 must capture at least its
    // pro-rata share (equality only for an isotropic spectrum)
    assert(model.explained(8) >= 8.0 / 64.0)
    assert(model.explained(4) <= model.explained(8) + 1e-12)
  }

  test("fit is deterministic run-to-run (within float-merge tolerance)") {
    val m1 = DimReduce.fit(emb, col("embedding"), k = 4)
    val m2 = DimReduce.fit(emb, col("embedding"), k = 4)
    assert(m1.eigenvalues.zip(m2.eigenvalues).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    m1.components.zip(m2.components).foreach { case (v1, v2) =>
      assert(v1.zip(v2).forall { case (a, b) => math.abs(a - b) < 1e-7 })
    }
  }

  test("project: Parseval bound and centered-mean-zero") {
    val model = DimReduce.fit(emb, col("embedding"), k = 8)
    val v = transform(col("embedding"), x => x.cast("double"))
    val mu = typedlit(model.mean.toSeq)
    val out = DimReduce.project(emb, col("embedding"), model, "pc")
      .withColumn("centered_sq",
        aggregate(zip_with(v, mu, (x, m) => (x - m) * (x - m)),
                  lit(0.0), (a, x) => a + x))
      .withColumn("pc_sq",
        aggregate(transform(col("pc"), x => x * x), lit(0.0), (a, x) => a + x))
      .select(col("pc"), col("centered_sq"), col("pc_sq"))
      .as[(Seq[Double], Double, Double)].collect()
    assert(out.nonEmpty)
    // orthonormal projection can never exceed the centered energy
    out.foreach { case (_, csq, psq) =>
      assert(psq <= csq + 1e-6, s"Parseval violated: $psq > $csq")
    }
    // projections of mean-centered data average to ~0 per coordinate
    val k = model.k
    val sums = Array.fill(k)(0.0)
    out.foreach { case (pc, _, _) => (0 until k).foreach(j => sums(j) += pc(j)) }
    sums.foreach(s => assert(math.abs(s / out.length) < 1e-6))
  }

  test("jlSigns: deterministic md5-derived +-1 matrix") {
    val s1 = DimReduce.jlSigns(8, 64)
    val s2 = DimReduce.jlSigns(8, 64)
    assert(s1.map(_.toSeq).toSeq == s2.map(_.toSeq).toSeq)
    assert(s1.forall(_.forall(x => x == 1.0 || x == -1.0)))
    // md5 nibbles are uniform: a 512-entry matrix that came out all-ones
    // would mean the derivation is broken, not that we got unlucky
    val ones = s1.map(_.count(_ == 1.0)).sum
    assert(ones > 128 && ones < 384, s"suspicious sign balance: $ones/512")
    // replay one entry by hand against the documented derivation
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest("jl3_17".getBytes("US-ASCII"))
    val want = if ((h(0) & 0x80) == 0) 1.0 else -1.0
    assert(s1(3)(17) == want)
  }

  test("queries: q_embed_pca and q_jl_project run and are shaped right") {
    val pca = SparkEntry.queries("q_embed_pca")(spark, sfDir).collect()
    assert(pca.nonEmpty)
    pca.foreach { r =>
      val resid = r.getAs[Double]("resid_ratio")
      assert(resid >= 0.0 && resid <= 1.0)
    }
    val nEmb = emb.count()
    val jl = SparkEntry.queries("q_jl_project")(spark, sfDir)
    assert(jl.count() == nEmb * 8)
  }
}
