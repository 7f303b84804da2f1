package graft

import graft.operators.Scd2
import graft.tables.SnapshotDiff
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Scd2AndDiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("snapshot diff classifies inserted/deleted/updated, drops unchanged") {
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
                     (4L, null.asInstanceOf[String], 40.0)).toDF("k", "s", "v")
    val after = Seq((2L, "b", 20.0),                      // unchanged
                    (3L, "CHANGED", 30.0),                // updated
                    (4L, null.asInstanceOf[String], 40.0),// unchanged (null attr)
                    (5L, "new", 50.0)).toDF("k", "s", "v")// inserted
    val got = SnapshotDiff.diff(before, after, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "deleted"), (3L, "updated"), (5L, "inserted")))
  }

  test("scd2 merge: close+append on change, no-op on same attrs, insert new keys") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val current = Seq(
      (1L, "gold",   d("2000-01-01"), d("2001-01-01")),  // closed history
      (1L, "plat",   d("2001-01-01"), null),             // open
      (2L, "silver", d("2000-01-01"), null),             // open, no update
      (3L, "bronze", d("2000-01-01"), null)              // open, no-op update
    ).toDF("k", "tier", "valid_from", "valid_to")
    val updates = Seq(
      (1L, "diamond"),  // change → close + append
      (3L, "bronze"),   // same attrs → no-op
      (9L, "new")       // new key → insert open
    ).toDF("k", "tier")

    val merged = Scd2.merge(current, updates, Seq("k"), Seq("tier"), "2002-06-01")
    val got = merged.select(col("k"), col("tier"),
        date_format(col("valid_from"), "yyyy-MM-dd"),
        date_format(col("valid_to"), "yyyy-MM-dd"))
      .as[(Long, String, String, Option[String])].collect().toSet
    assert(got == Set(
      (1L, "gold",    "2000-01-01", Some("2001-01-01")),
      (1L, "plat",    "2001-01-01", Some("2002-06-01")),
      (1L, "diamond", "2002-06-01", None),
      (2L, "silver",  "2000-01-01", None),
      (3L, "bronze",  "2000-01-01", None),
      (9L, "new",     "2002-06-01", None)))

    // idempotence: re-applying the same batch at the same ts is a no-op
    val again = Scd2.merge(merged, updates, Seq("k"), Seq("tier"), "2002-06-01")
    assert(again.count() == merged.count())
    // exactly one open version per key, always
    val openPerKey = merged.filter(col("valid_to").isNull)
      .groupBy("k").count().as[(Long, Long)].collect()
    assert(openPerKey.forall(_._2 == 1))
  }

  test("scd2 rejects out-of-order batches and unparseable dates instead of corrupting history") {
    def d(s: String) = java.sql.Date.valueOf(s)
    val current = Seq((1L, "plat", d("2024-06-01"), Option.empty[java.sql.Date]))
      .toDF("k", "tier", "valid_from", "valid_to")
    val updates = Seq((1L, "gold")).toDF("k", "tier")
    // closing the open version at a date BEFORE its valid_from would
    // write an inverted interval — must fail loud at execution
    val ex = intercept[Exception] {
      Scd2.merge(current, updates, Seq("k"), Seq("tier"), "2024-01-01")
        .collect()
    }
    assert(ex.getMessage.contains("out-of-order") ||
           Option(ex.getCause).exists(_.getMessage.contains("out-of-order")),
      ex.getMessage)
    // garbage effectiveTs fails at the CALL, not as silent NULL dates
    intercept[IllegalArgumentException] {
      Scd2.merge(current, updates, Seq("k"), Seq("tier"), "not-a-date")
    }
    // a no-op update against an older effectiveTs stays a no-op (no
    // interval is closed, so the guard must not fire)
    val noop = Scd2.merge(current,
      Seq((1L, "plat")).toDF("k", "tier"), Seq("k"), Seq("tier"),
      "2024-01-01")
    assert(noop.count() == 1)
  }
}
