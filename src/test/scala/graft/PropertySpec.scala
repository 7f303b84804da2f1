package graft

import graft.functions.{CrossEngine, NativeFunctions}
import graft.operators.{RangeJoin, Upsert}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the core operators — randomized
  * inputs catch the edge cases example tests miss (empty sets,
  * single-element arrays, all-duplicate keys, intervals straddling bin
  * boundaries, negative values). Generators are sampled with fixed
  * seeds (scalacheck's scalatest bridge isn't in the offline cache),
  * so failures are reproducible.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic generator sampling: seeds 0..n-1. */
  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))
         .getOrElse(fail(s"generator failed at seed $i")))

  private val tokens = Gen.listOf(Gen.oneOf(
    "a", "b", "c", "dd", "ee", "ff", "gg", "hh", "longertoken", "z9"))

  test("keepFirst dedup is deterministic and keeps the ordered winner per key") {
    val gen = Gen.listOf(Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(0L, 20L),
                                 Gen.alphaLowerStr.map(_.take(4))))
    samples(gen, 10).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("k", "ord", "v")
      def run() = graft.operators.Dedup
        .keepFirst(df, Seq("k"), Seq(col("ord").desc, col("v").asc))
        .as[(Int, Long, String)].collect().sortBy(_._1).toSeq
      val got = run()
      // winner per key = max ord, ties by min v — computed independently
      val expected = rows.groupBy(_._1).map { case (k, g) =>
        g.minBy(r => (-r._2, r._3))
      }.toSeq.sortBy(_._1)
      assert(got == expected, s"rows=$rows")
      assert(got == run(), "second run differed")
    }
  }

  test("largest-remainder allocation: integral, exact-sum, within one unit of share") {
    val gen = Gen.zip(Gen.chooseNum(0L, 999983L),
                      Gen.nonEmptyListOf(Gen.chooseNum(1L, 10000L)))
    samples(gen, 12).foreach { case (budget, weights) =>
      val df = weights.zipWithIndex.map { case (w, i) => (f"k$i%03d", w) }
        .toDF("k", "w")
      val out = graft.operators.Allocation
        .largestRemainder(df, "k", "w", budget)
        .select("k", "w", "alloc").as[(String, Long, Long)].collect()
      assert(out.map(_._3).sum == budget,
        s"allocs must sum to $budget exactly: ${out.mkString(",")}")
      val total = weights.sum.toDouble
      out.foreach { case (k, w, a) =>
        val fl = math.floor(w * budget.toDouble / total).toLong
        assert(a == fl || a == fl + 1, s"$k: alloc $a not in {$fl, ${fl + 1}}")
      }
    }
    // a zero weight total must fail loudly, not allocate NaN/null
    val zero = Seq(("a", 0L), ("b", 0L)).toDF("k", "w")
    val ex = intercept[Exception](
      graft.operators.Allocation.largestRemainder(zero, "k", "w", 100L).collect())
    assert(ex.getMessage != null)
  }

  test("sortedJaccard over hashed token sets equals the set-theoretic Jaccard") {
    NativeFunctions.register(spark)
    val cases = samples(Gen.zip(tokens, tokens), 30)
    val got = cases.toDF("a", "b")
      .select(NativeFunctions.sortedJaccard(
        NativeFunctions.hashedTokenSet(array_distinct(col("a"))),
        NativeFunctions.hashedTokenSet(array_distinct(col("b")))).as("j"))
      .as[Double].collect()
    cases.zip(got).foreach { case ((a, b), j) =>
      val sa = a.toSet; val sb = b.toSet
      val expected =
        if (sa.union(sb).isEmpty) 0.0
        else sa.intersect(sb).size.toDouble / sa.union(sb).size
      assert(math.abs(j - expected) < 1e-12, s"a=$a b=$b")
    }
  }

  test("upsert is idempotent and update-wins on random batches") {
    val keyVal = Gen.listOf(Gen.zip(Gen.choose(0L, 20L), Gen.choose(0, 1000)))
    samples(Gen.zip(keyVal, keyVal), 10).foreach { case (t, u) =>
      val target = t.toDF("k", "v").dropDuplicates("k")
      val updates = u.toDF("k", "v").dropDuplicates("k")
      val once = Upsert.upsert(target, updates, Seq("k"))
      val twice = Upsert.upsert(once, updates, Seq("k"))
      val got = once.as[(Long, Int)].collect().toMap
      val gotTwice = twice.as[(Long, Int)].collect().toMap
      val expected = target.as[(Long, Int)].collect().toMap ++
        updates.as[(Long, Int)].collect().toMap
      assert(got == expected)
      assert(gotTwice == expected)
      // pk uniqueness is preserved
      assert(once.count() == once.select("k").distinct().count())
    }
  }

  test("binned range join equals the naive between-join for random intervals") {
    val pts = Gen.listOf(Gen.choose(-100L, 100L))
    val ivs = Gen.listOf(Gen.zip(Gen.choose(-100L, 100L), Gen.choose(0L, 40L)))
    val widths = Gen.oneOf(1L, 3L, 16L, 64L)
    samples(Gen.zip(pts, ivs, widths), 10).foreach { case (ps, is, w) =>
      val points = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }
        .toDF("pid", "pt")
      val intervals = is.zipWithIndex.map { case ((s, len), i) =>
        (i.toLong, s, s + len) }.toDF("iid", "s", "e")
      val binned = RangeJoin.binned(points, intervals, "pt", "s", "e", w)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      val naive = points.join(intervals,
          col("pt") >= col("s") && col("pt") <= col("e"))
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(binned == naive, s"w=$w ps=$ps is=$is")
    }
  }

  test("MV rewrite equals the direct aggregation across random data and query shapes") {
    import graft.plans.MaterializedAgg
    // random fact rows: small key space forces group collisions, nulls
    // in the measure exercise count(m)/avg null semantics
    val rowGen = Gen.listOfN(300, Gen.zip(
      Gen.chooseNum(0, 4), Gen.oneOf("x", "y", "z"),
      Gen.option(Gen.chooseNum(-50, 50))))
    for ((rows, si) <- samples(rowGen, 2).zipWithIndex) {
      val dir = TestSpark.tmpDir(s"mvprop$si")
      rows.map { case (k, d, v) => (k, d, v.map(Integer.valueOf).orNull) }
        .toDF("k", "d", "v").write.parquet(s"$dir/src")
      val srcT = spark.read.parquet(s"$dir/src")
      MaterializedAgg.build(srcT, Seq("k", "d"), Seq("v"))
        .write.parquet(s"$dir/gold")
      MaterializedAgg.attach(spark)

      val shapes: Seq[org.apache.spark.sql.DataFrame] = Seq(
        srcT.groupBy($"k", $"d").agg(sum($"v").as("s"), count(lit(1)).as("n")),
        srcT.groupBy($"k").agg(min($"v").as("mn"), max($"v").as("mx"),
                               count($"v").as("cv")),
        srcT.groupBy($"d").agg(avg($"v").as("a"), sum($"v").as("s")),
        srcT.filter($"d" =!= "z").groupBy($"k").agg(sum($"v").as("s")),
        srcT.filter($"k" > 1 && $"d" === "x").agg(count(lit(1)).as("n")),
        srcT.agg(sum($"v").as("s"), avg($"v").as("a"), count($"v").as("c")))
      def collectAll() = shapes.map(_.collect().map(_.toString).sorted.toSeq)

      MaterializedAgg.register(spark, s"$dir/src", s"$dir/gold",
                               Seq("k", "d"), Seq("v"))
      // guard against a vacuous pass: if registration silently failed
      // to match, rewritten == direct trivially
      val roots = shapes.head.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.mkString(",")
            case _ => ""
          }
      }
      assert(roots.exists(_.contains("gold")), s"rewrite never fired: $roots")
      val rewritten = try collectAll() finally MaterializedAgg.clear()
      val direct = collectAll()
      rewritten.zip(direct).zipWithIndex.foreach { case ((r, e), qi) =>
        assert(r == e, s"seed=$si shape=$qi")
      }
    }
  }

  test("MV join rewrite equals the direct join-aggregation across random shapes") {
    import graft.plans.MaterializedAgg
    // random fact rows over a dim with skewed fk multiplicity (some
    // pks never referenced, some referenced many times — pk-fk is NOT
    // assumed by the rewrite, so a dup dim key is legal and covered by
    // building the summary from the same join)
    val rowGen = Gen.listOfN(300, Gen.zip(
      Gen.oneOf("d0", "d1", "d2"), Gen.chooseNum(0, 9),
      Gen.option(Gen.chooseNum(-50, 50))))
    for ((rows, si) <- samples(rowGen, 2).zipWithIndex) {
      val dir = TestSpark.tmpDir(s"mvjprop$si")
      rows.map { case (dt, fk, v) => (dt, fk, v.map(Integer.valueOf).orNull) }
        .toDF("dt", "fk", "v").write.parquet(s"$dir/fact")
      // pid 0..7 only: fks 8,9 dangle (inner join drops them)
      (0 until 8).map(p => (p, s"b${p % 3}"))
        .toDF("pid", "brand").write.parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim")
      MaterializedAgg.buildJoin(fact, dim, "fk", "pid",
        Seq("dt", "brand"), Seq("v")).write.parquet(s"$dir/gold")
      MaterializedAgg.attach(spark)

      def joined() = fact.join(dim, fact("fk") === dim("pid"))
      val shapes: Seq[org.apache.spark.sql.DataFrame] = Seq(
        joined().groupBy($"dt", $"brand")
          .agg(sum($"v").as("s"), count(lit(1)).as("n")),
        joined().groupBy($"brand")
          .agg(min($"v").as("mn"), max($"v").as("mx"), count($"v").as("cv")),
        joined().filter($"brand" =!= "b1").groupBy($"dt")
          .agg(avg($"v").as("a")),
        joined().filter($"dt" === "d0").agg(count(lit(1)).as("n")),
        dim.join(fact, fact("fk") === dim("pid")).groupBy($"dt")
          .agg(sum($"v").as("s")))
      def collectAll() = shapes.map(_.collect().map(_.toString).sorted.toSeq)

      MaterializedAgg.registerJoin(spark, s"$dir/fact", s"$dir/dim",
        "fk", "pid", s"$dir/gold", Seq("dt", "brand"), Seq("v"))
      val roots = shapes.head.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.mkString(",")
            case _ => ""
          }
      }
      assert(roots.exists(_.contains("gold")), s"join rewrite never fired: $roots")
      val rewritten = try collectAll() finally MaterializedAgg.clear()
      val direct = collectAll()
      rewritten.zip(direct).zipWithIndex.foreach { case ((r, e), qi) =>
        assert(r == e, s"seed=$si shape=$qi")
      }
    }
  }

  test("PrefixJoin equals brute-force Jaccard on random corpora") {
    // random docs over a small vocabulary (high collision probability:
    // near-dups, exact dups, empty docs, singleton docs all arise);
    // PPJoin completeness must hold at several thresholds
    val docGen = Gen.listOfN(60, tokens)
    for ((seedDocs, si) <- samples(docGen, 3).zipWithIndex) {
      val data = seedDocs.zipWithIndex.map { case (ts, i) => (i, ts.distinct) }
      val docs = data.toDF("doc_id", "toks")
      // vocabLimit 0 forces the DISTRIBUTED dictionary branch
      // (repartitionByRange + zipWithIndex rank); the default takes
      // the literal-map fast path — the property must hold on both
      for ((num, den, vocabLimit) <- Seq((9, 10, 1 << 16), (4, 5, 0))) {
        val t = num.toDouble / den
        // compare pair SETS exactly but scores by tolerance — exact
        // equality of two differently-implemented roundings (Spark
        // decimal HALF_UP vs math.round binary floor(x+.5)) only
        // holds while union sizes divide 1e6 cleanly, a trap for
        // anyone enlarging the generator later
        val got = graft.text.PrefixJoin
          .joinAll(docs, "doc_id", "toks", t, num, den, vocabLimit)
          .select(col("id_a"), col("id_b"), col("jaccard"))
          .as[(Int, Int, Double)].collect()
          .map { case (a, b, j) => (a, b) -> j }.toMap
        val sets = data.map { case (i, ts) => (i, ts.toSet) }
        val want = (for {
          (a, sa) <- sets; (b, sb) <- sets
          if a < b && sa.nonEmpty && sb.nonEmpty
          j = sa.intersect(sb).size.toDouble / sa.union(sb).size
          if j >= t
        } yield (a, b) -> j).toMap
        assert(got.keySet == want.keySet,
          s"seed=$si t=$t missing=${(want.keySet -- got.keySet).take(3)} " +
          s"extra=${(got.keySet -- want.keySet).take(3)}")
        want.foreach { case (k, j) =>
          assert(math.abs(got(k) - j) < 1e-9, s"seed=$si $k: ${got(k)} vs $j")
        }
      }
    }
  }

  test("exactSum matches BigDecimal arithmetic on random cent amounts") {
    val cents = Gen.nonEmptyListOf(Gen.choose(-10000000L, 10000000L))
    samples(cents, 20).foreach { cs =>
      val doubles = cs.map(c => c / 100.0)
      val expected = BigDecimal(cs.sum) / 100
      val got = doubles.toDF("v")
        .agg(CrossEngine.exactSum(col("v"), 2, 2).as("s"))
        .as[Double].head()
      assert(BigDecimal(got) == expected, s"cs=$cs")
    }
  }

  test("Excel codec round-trips random typed tables bit-exactly") {
    // per-row: long, string (letter-prefixed so inference can never
    // read it as a number/bool/date), nullable double, bool, nullable
    // date (incl. the pre-1900-03-01 leap-bug serial zone), nullable
    // second-precision timestamp
    val genRow = for {
      id <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
      s <- Gen.oneOf(Gen.const(null: String),
             Gen.alphaNumStr.map(x => "s_<&\"垚" + x.take(8)))
      d <- Gen.oneOf(Gen.const(Double.NaN),
             Gen.choose(-1e12, 1e12)).map(x => if (x.isNaN) null
               else java.lang.Double.valueOf(x))
      b <- Gen.oneOf(true, false)
      days <- Gen.oneOf(Gen.const(-1), Gen.choose(0, 80000))
      ts <- Gen.oneOf(Gen.const(-1L),
              Gen.choose(0L, 4102444800L)) // ≤ 2100-01-01, whole seconds
    } yield Seq[Any](id, s, d, b,
      if (days < 0) null
      else java.sql.Date.valueOf(java.time.LocalDate.of(1900, 1, 1)
        .plusDays(days.toLong)),
      if (ts < 0) null
      else java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(ts)))
    val genRows = Gen.nonEmptyListOf(genRow)
    samples(genRows, 8).foreach { rows =>
      val dir = TestSpark.tmpDir("xlsx_prop")
      val out = new java.io.FileOutputStream(s"$dir/t.xlsx")
      try graft.sources.ExcelSource.write(
        Seq("id", "s", "d", "b", "dt", "ts"), rows, out)
      finally out.close()
      val back = graft.sources.ExcelSource.read(spark, dir)
        .selectExpr("id", "s", "d", "b", "cast(dt as string)",
                    "cast(ts as string)")
        .as[(Long, String, Option[Double], Boolean, String, String)]
        .collect().sortBy(_._1).toSeq
      val expected = rows.map { r =>
        (r(0).asInstanceOf[Long], r(1).asInstanceOf[String],
         Option(r(2).asInstanceOf[java.lang.Double]).map(_.doubleValue),
         r(3).asInstanceOf[Boolean],
         Option(r(4)).map(_.toString).orNull,
         Option(r(5)).map(_.toString.stripSuffix(".0")).orNull)
      }.sortBy(_._1)
      assert(back == expected, s"rows=$rows")
    }
  }
}
