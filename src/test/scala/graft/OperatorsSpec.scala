package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("castTo: uncastable values become null, missing columns skipped") {
    val df = Seq(("1", "x", "2025-04-01T11:27:00"))
      .toDF("a", "b", "ts")
    val schema = StructType(Seq(
      StructField("a", IntegerType),
      StructField("b", DoubleType),
      StructField("ts", TimestampType),
      StructField("missing", StringType)))
    val out = Casting.castTo(df, schema)
    val row = out.collect().head
    assert(row.getInt(0) == 1)
    assert(row.isNullAt(1)) // "x" -> null, no ANSI throw
    assert(row.getTimestamp(2).toString.startsWith("2025-04-01 11:27:00"))
    assert(Casting.missingColumns(df, schema) == Seq("missing"))
    assert(!out.columns.contains("missing"))
  }

  test("validation: message accumulation, dedup, '; ' join, null when valid") {
    val df = Seq((1, -5.0), (2, 100.0), (3, -1.0)).toDF("id", "amt")
    val rules = Seq(
      Rule(col("amt") < 0, "NEG"),
      Rule(col("amt") < -0.5, "NEG"), // duplicate message collapses
      Rule(col("id") === 3, "ID3"))
    val tagged = Validation.withErrors(df, rules)
    val m = tagged.collect().map(r => r.getInt(0) -> Option(r.getString(2))).toMap
    assert(m(1).contains("NEG"))
    assert(m(2).isEmpty)
    assert(m(3).contains("NEG; ID3"))
    val (valid, rejected) = Validation.split(df, rules)
    assert(valid.count() == 1 && rejected.count() == 2)
    assert(!valid.columns.contains(Validation.ErrCol))
  }

  test("riViolations: anti-join finds orphans; tag marks them") {
    val fact = Seq((1, 10), (2, 11), (3, 99)).toDF("id", "fk")
    val dim = Seq(10, 11).toDF("pk")
    val bad = Validation.riViolations(fact, dim, "fk", "pk")
    assert(bad.select("id").as[Int].collect().toSet == Set(3))
    val tagged = Validation.tagRiViolations(fact, dim, "fk", "pk", "orphan")
    assert(tagged.filter(col("orphan")).select("id").as[Int].collect().toSet == Set(3))
  }

  test("upsert: update-wins, inserts new keys, idempotent") {
    val target = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val updates = Seq((2, "B"), (3, "C")).toDF("k", "v")
    val once = Upsert.upsert(target, updates, Seq("k"))
    val m = once.as[(Int, String)].collect().toMap
    assert(m == Map(1 -> "a", 2 -> "B", 3 -> "C"))
    val twice = Upsert.upsert(once, updates, Seq("k"))
    assert(twice.as[(Int, String)].collect().toMap == m)
  }

  test("upsert/applyChanges collapse duplicate-pk batch rows — never duplicate target pks") {
    // an at-least-once redelivery inside one batch: both copies used
    // to survive the union, leaving two rows for one pk (Delta MERGE
    // errors on exactly this shape)
    val target = Seq((1, "a")).toDF("k", "v")
    val updates = Seq((1, "B"), (1, "B"), (2, "C")).toDF("k", "v")
    val out = Upsert.upsert(target, updates, Seq("k"))
    assert(out.count() == 2)
    assert(out.select("k").distinct().count() == 2)
    val changes = Seq((1, "B", false), (1, "B", false)).toDF("k", "v", "del")
    val cdc = Upsert.applyChanges(target, changes, Seq("k"), "del")
    assert(cdc.count() == 1 &&
           cdc.as[(Int, String)].collect().toSeq == Seq((1, "B")))
  }

  test("dedup: keepFirst is deterministic under explicit order") {
    val df = Seq((1, 10, "x"), (1, 5, "y"), (2, 7, "z")).toDF("k", "ord", "v")
    val out = Dedup.keepFirst(df, Seq("k"), Seq(col("ord").asc))
    assert(out.select("v").as[String].collect().toSet == Set("y", "z"))
    assert(Dedup.byKey(df, Seq("k")).count() == 2)
  }
}
