package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("as-of picks latest right row <= left time; ties match; no-match is null") {
    val trades = Seq(
      (1L, 100L, "t1"), // after q@50 and q@100 (tie) -> q@100
      (1L, 60L, "t2"),  // between q@50 and q@100 -> q@50
      (1L, 10L, "t3"),  // before any quote -> null
      (2L, 500L, "t4")) // key with no quotes at all -> null
      .toDF("k", "t", "name")
    val quotes = Seq(
      (1L, 50L, 10.0), (1L, 100L, 11.0), (3L, 1L, 99.0))
      .toDF("k", "t", "price")
    val out = AsOfJoin.asOf(trades, quotes, "k", "t", "t", Seq("price"))
      .select("name", "asof_price")
      .as[(String, Option[Double])].collect().toMap
    assert(out == Map(
      "t1" -> Some(11.0), "t2" -> Some(10.0),
      "t3" -> None, "t4" -> None))
  }

  test("multiple carry columns attach together") {
    val l = Seq((1L, 20L, "x")).toDF("k", "t", "v")
    val r = Seq((1L, 15L, "a", 7L)).toDF("k", "t", "tag", "n")
    val out = AsOfJoin.asOf(l, r, "k", "t", "t", Seq("tag", "n"))
      .select("asof_tag", "asof_n").as[(String, Long)].collect()
    assert(out.toSeq == Seq(("a", 7L)))
  }

  test("carry columns come from ONE row; a legit NULL carry value shadows older rows") {
    // per-column last(ignoreNulls) would stitch tag from t=1 with n
    // from t=2 (a row that exists nowhere) and resurrect 5.0 past the
    // most recent row's NULL — the struct carry keeps rows atomic
    val l = Seq((1L, 3L, "x")).toDF("k", "t", "v")
    val r = Seq(
      (1L, 1L, "x1", Option.empty[Long]),
      (1L, 2L, Option.empty[String].orNull, Option(5L)))
      .toDF("k", "t", "tag", "n")
    val out = AsOfJoin.asOf(l, r, "k", "t", "t", Seq("tag", "n"))
      .select("asof_tag", "asof_n")
      .as[(Option[String], Option[Long])].collect()
    assert(out.toSeq == Seq((None, Some(5L))),
      s"carry must be row-atomic from the t=2 row: ${out.toSeq}")
  }

  test("NULL keys never match, like any SQL equi-join / DuckDB ASOF") {
    val l = Seq((Option.empty[Long], 10L, "nullk"), (Option(1L), 10L, "k1"))
      .toDF("k", "t", "name")
    val r = Seq((Option.empty[Long], 5L, 7.0), (Option(1L), 5L, 9.0))
      .toDF("k", "t", "price")
    val out = AsOfJoin.asOf(l, r, "k", "t", "t", Seq("price"))
      .select("name", "asof_price")
      .as[(String, Option[Double])].collect().toMap
    assert(out == Map("nullk" -> None, "k1" -> Some(9.0)), out)
  }
}
