package graft

import graft.etl.Archiver
import graft.quality.QualityChecks
import graft.tables.LakehouseTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QualityAndOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("quality checks: pass on clean data, flag injected anomalies") {
    val clean = Seq((1, 10, 5.0), (2, 10, 7.0), (3, 11, 9.0)).toDF("id", "fk", "v")
    val dim = Seq(10, 11).toDF("pk")
    assert(QualityChecks.duplicatePk(clean, "t", Seq("id")).passed)
    assert(QualityChecks.nullRequired(clean, "t", Seq("id", "fk")).passed)
    assert(QualityChecks.fkIntegrity(clean, dim, "fk", "pk", "t").passed)
    assert(QualityChecks.range(clean, "t", "v", 0, 100).passed)

    val dirty = clean.union(Seq((1, 99, -3.0)).toDF("id", "fk", "v"))
    assert(!QualityChecks.duplicatePk(dirty, "t", Seq("id")).passed)
    val fk = QualityChecks.fkIntegrity(dirty, dim, "fk", "pk", "t")
    assert(!fk.passed && fk.metric == 0.25)
    assert(!QualityChecks.range(dirty, "t", "v", 0, 100).passed)
  }

  test("gold reconciliation: exact recompute passes, perturbed fails") {
    val gold = Seq(("a", 10.0, 3L), ("b", 20.0, 5L)).toDF("k", "sales", "n")
    val recalcOk = gold.select($"k", $"sales", $"n")
    assert(QualityChecks.reconcile(gold, recalcOk, Seq("k"),
      Seq("sales"), "g").passed)
    val recalcBad = gold.withColumn("sales", $"sales" + 5.0)
    assert(!QualityChecks.reconcile(gold, recalcBad, Seq("k"),
      Seq("sales"), "g").passed)
    // tolerance is RELATIVE (the reference's ">1 % discrepancy" SLA):
    // a money-scale total 0.000005 % off passes, a rate 1.8 % off fails
    val big = Seq(("a", 1000000.00)).toDF("k", "sales")
    val bigOff = Seq(("a", 1000000.05)).toDF("k", "sales")
    assert(QualityChecks.reconcile(big, bigOff, Seq("k"),
      Seq("sales"), "g").passed, "0.000005% money drift must pass a 1% SLA")
    val rate = Seq(("a", 0.500)).toDF("k", "sales")
    val rateOff = Seq(("a", 0.509)).toDF("k", "sales")
    assert(!QualityChecks.reconcile(rate, rateOff, Seq("k"),
      Seq("sales"), "g").passed, "1.8% rate drift must fail a 1% SLA")
  }

  test("reconciliation catches missing rows and null metrics — the inner-join blind spots") {
    val gold = Seq(("a", 10.0), ("b", 20.0)).toDF("k", "sales")
    // recalc LOST a key (the classic dropped-partition bug): an inner
    // join would discard the unmatched gold row and report a PASS
    val lost = Seq(("a", 10.0)).toDF("k", "sales")
    assert(!QualityChecks.reconcile(gold, lost, Seq("k"),
      Seq("sales"), "g").passed)
    // a NULL recalc metric nulls the > comparison — must mismatch,
    // not silently pass
    val nulled = Seq(("a", Option(10.0)), ("b", Option.empty[Double]))
      .toDF("k", "sales")
    assert(!QualityChecks.reconcile(gold, nulled, Seq("k"),
      Seq("sales"), "g").passed)
    // null == null on BOTH sides is a match, not a mismatch
    val goldN = Seq(("a", Option(10.0)), ("b", Option.empty[Double]))
      .toDF("k", "sales")
    assert(QualityChecks.reconcile(goldN, nulled, Seq("k"),
      Seq("sales"), "g").passed)
  }

  test("fkIntegrity: same-named fk/pk resolves; NULL fks are not orphans") {
    // star-schema norm: fact and dim share the key NAME — the naive
    // col===col join condition was ambiguous and crashed
    val fact = Seq((Option(1L), "x"), (Option(2L), "y"),
                   (Option.empty[Long], "z")) // NULL fk: legal, no parent
      .toDF("customer_id", "v")
    val dim = Seq((1L, "c1"), (2L, "c2")).toDF("customer_id", "name")
    val c = QualityChecks.fkIntegrity(fact, dim,
      "customer_id", "customer_id", "orders")
    assert(c.passed && c.metric == 0.0, c)
    // a REAL orphan still counts
    val orphaned = Seq((Option(9L), "w")).toDF("customer_id", "v")
    assert(!QualityChecks.fkIntegrity(orphaned, dim,
      "customer_id", "customer_id", "orders").passed)
  }

  test("archiver: batched move, resumable, idempotent") {
    val dir = TestSpark.tmpDir("arch")
    val src = s"$dir/in"; val dst = s"$dir/done"
    new java.io.File(src).mkdirs()
    (1 to 7).foreach { i =>
      java.nio.file.Files.write(java.nio.file.Paths.get(src, s"f$i.csv"),
        s"x$i".getBytes)
    }
    assert(Archiver.archive(spark, src, dst, batchSize = 3) == 7)
    assert(new java.io.File(src).list().isEmpty)
    assert(new java.io.File(dst).list().length == 7)
    assert(Archiver.archive(spark, src, dst) == 0) // rerun: nothing left

    // a re-delivered file with an already-archived name must still
    // drain (mtime-suffixed), not silently stall in srcDir forever
    java.nio.file.Files.write(java.nio.file.Paths.get(src, "f1.csv"),
      "x1-redelivered".getBytes)
    val pinnedMtime = 1700000000000L // rsync -t style preserved mtime
    assert(new java.io.File(src, "f1.csv").setLastModified(pinnedMtime))
    assert(Archiver.archive(spark, src, dst) == 1)
    assert(new java.io.File(src).list().isEmpty)
    assert(new java.io.File(dst).list().count(_.startsWith("f1.csv")) == 2)

    // and a THIRD delivery with the SAME name and SAME mtime (delivery
    // tools preserve mtimes) must not crash-loop on the taken suffix
    java.nio.file.Files.write(java.nio.file.Paths.get(src, "f1.csv"),
      "x1-redelivered-again".getBytes)
    assert(new java.io.File(src, "f1.csv").setLastModified(pinnedMtime))
    assert(Archiver.archive(spark, src, dst) == 1)
    assert(new java.io.File(src).list().isEmpty)
    assert(new java.io.File(dst).list().count(_.startsWith("f1.csv")) == 3)
  }

  test("analyze + clustered rewrite keep data identical and register stats") {
    val dir = TestSpark.tmpDir("zord")
    val t = LakehouseTable(spark, s"$dir/t", Seq("a"))
    val df = (1 to 1000).map(i => (i % 97, i % 31, s"v$i")).toDF("a", "b", "v")
    t.overwrite(df)
    t.optimizeClustered(Seq("a", "b"))
    assert(t.read.count() == 1000)
    assert(t.read.groupBy("a").count().count() == 97)
    t.analyze("zord_t")
    val stats = spark.sql("DESC EXTENDED zord_t a").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(stats.get("distinct_count").exists(_.toLong >= 90))
  }
}
