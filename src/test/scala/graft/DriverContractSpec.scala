package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself (SparkEntry): the flagship
  * query smoke, and structural invariants the ++ merge of the three
  * query files cannot enforce (a duplicate name would silently shadow
  * an earlier query and its oracle).
  */
class DriverContractSpec extends AnyFunSuite {

  test("entry() flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  test("query names are unique across files; every oracle has a query") {
    val names = Queries.defs.keys.toSeq ++ QueriesText.defs.keys.toSeq ++
      QueriesAnalytics.defs.keys.toSeq
    val dupes = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dupes.isEmpty, s"duplicate query names shadow silently: $dupes")
    assert(SparkEntry.queries.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // every query name is a valid identifier-ish slug (the driver uses
    // them as output directory names)
    assert(names.forall(_.matches("[a-z0-9_]+")), names.filterNot(_.matches("[a-z0-9_]+")))
  }

  test("no duplicate query definitions even within one file (source scan)") {
    // a duplicate key INSIDE one ListMap literal collapses before
    // defs.keys is evaluated, so the runtime check above cannot see
    // it — only the source can
    val files = Seq("Queries.scala", "QueriesText.scala", "QueriesAnalytics.scala")
      .map(f => java.nio.file.Paths.get("src/main/scala/graft", f))
    val rx = """"(q_[a-z0-9_]+)"\s*->""".r
    val defs = files.flatMap(f =>
      rx.findAllMatchIn(java.nio.file.Files.readString(f)).map(_.group(1)))
    val dupes = defs.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dupes.isEmpty, s"duplicate query definitions in source: $dupes")
    assert(defs.toSet == SparkEntry.queries.keySet)
  }

  test("Tables.load mutates no session conf (nanosAsLong stays caller-owned)") {
    // r8 verdict watch item: load() used to flip the session-wide
    // nanosAsLong conf as a side effect; library callers inherited it
    // silently. Contract now: the conf is read-only to the library —
    // a session that did NOT set it keeps its value across load().
    val spark = TestSpark.spark
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "false")
      val df = Tables.load(spark, "/root/testdata/sf0.001", "events")
      assert(df.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType)
      assert(spark.conf.get(key) == "false",
        "Tables.load must not flip session confs")
    } finally before.fold(spark.conf.unset(key))(v => spark.conf.set(key, v))
  }
}
