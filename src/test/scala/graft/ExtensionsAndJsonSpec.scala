package graft

import graft.sources.JsonSource
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

class ExtensionsAndJsonSpec extends AnyFunSuite {

  test("GraftExtensions injects native functions via spark.sql.extensions") {
    // TestSpark's session is built with
    // spark.sql.extensions=graft.functions.GraftExtensions; the graft_*
    // functions must resolve in SQL TEXT with no per-session register()
    // call, both on the session itself and on newSession() clones
    // (the thrift-server / streaming-restart path).
    val spark = TestSpark.spark
    val newSession = spark.newSession()
    for (s <- Seq(spark, newSession)) {
      val j = s.sql(
        "SELECT graft_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j")
        .head().getDouble(0)
      assert(math.abs(j - 0.5) < 1e-12)
      val d = s.sql(
        "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .head().getDouble(0)
      assert(d == 11.0)
      val sig = s.sql(
        "SELECT graft_minhash_sig(t, 4) AS s FROM VALUES ('a'), ('b') AS v(t)")
        .head().getSeq[Long](0)
      assert(sig.length == 4)
    }
  }

  test("GraftExtensions injects the MV rewrite rule — fires with no attach()") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = TestSpark.tmpDir("extmv")
    (1 to 100).map(i => (i % 3, i)).toDF("k", "v").write.parquet(s"$dir/src")
    val srcT = spark.read.parquet(s"$dir/src")
    graft.plans.MaterializedAgg.build(srcT, Seq("k"), Seq("v"))
      .write.parquet(s"$dir/gold")
    graft.plans.MaterializedAgg.register(
      spark, s"$dir/src", s"$dir/gold", Seq("k"), Seq("v"))
    try {
      // injected via spark.sql.extensions only — NO attach() here; the
      // newSession() clone is the thrift-server / streaming-restart
      // path that per-session experimental.extraOptimizations misses
      for (s <- Seq(spark, spark.newSession())) {
        val q = s.read.parquet(s"$dir/src").groupBy("k")
          .agg(sum($"v").as("s"))
        val roots = q.queryExecution.optimizedPlan.collect {
          case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
            lr.relation match {
              case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                fs.location.rootPaths.map(_.toString).mkString(",")
              case _ => ""
            }
        }
        assert(roots.nonEmpty && roots.forall(_.contains("gold")), roots)
        assert(q.orderBy("k").as[(Int, Long)].collect().toSeq ==
          (0 until 3).map(k => k -> (1 to 100).filter(_ % 3 == k).map(_.toLong).sum))
      }
    } finally graft.plans.MaterializedAgg.clear()
  }

  test("json-lines source: schema'd read, corrupt-record quarantine, column parse") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = TestSpark.tmpDir("json")
    Files.write(Paths.get(s"$dir/events.jsonl"), java.util.Arrays.asList(
      """{"event_id": 1, "kind": "click", "value": 2.5}""",
      """{"event_id": 2, "kind": "view"}""",
      """not json at all""",
      "",                      // blank separator line → skipped entirely
      """null""",              // JSON null literal → corrupt, not all-null valid
      """{"event_id": "NaNsense", "kind": 7}"""))

    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("kind", StringType),
      StructField("value", DoubleType)))
    val (valid, corrupt) = JsonSource.split(
      JsonSource.read(spark, s"$dir/events.jsonl", schema))

    // "NaNsense" parses as JSON but fails the schema → PERMISSIVE
    // nulls the uncastable fields and keeps the raw line; "null" and
    // "not json" are corrupt; the blank line is skipped, NOT a
    // phantom all-null valid row
    assert(corrupt.count() == 3)
    val rows = valid.as[(Option[Long], String, Option[Double])].collect().toSet
    assert(rows == Set((Some(1L), "click", Some(2.5)), (Some(2L), "view", None)))

    // in-table JSON payload parse (props-style)
    val parsed = JsonSource.parseColumn(
      Seq((1L, """{"k": 42}"""), (2L, "oops")).toDF("id", "props"),
      "props", StructType(Seq(StructField("k", LongType))), "p")
      .select(col("id"), col("p.k"))
      .as[(Long, Option[Long])].collect().toSet
    assert(parsed == Set((1L, Some(42L)), (2L, None)))
  }

  test("json source: field names containing dots resolve as literals, not paths") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dir = TestSpark.tmpDir("jsondot")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "d.jsonl"),
      """{"user.id": 7, "v": "a"}""".getBytes)
    val schema = StructType(Seq(
      StructField("user.id", LongType), StructField("v", StringType)))
    // a parsed "__p.user.id" path string would look for a nested
    // `user` struct and throw; getField treats the name as a literal
    val (valid, corrupt) = JsonSource.split(
      JsonSource.read(spark, s"$dir/d.jsonl", schema))
    assert(corrupt.count() == 0)
    val row = valid.select(col("`user.id`"), col("v"))
      .as[(Long, String)].collect().toSeq
    assert(row == Seq((7L, "a")))
  }
}
