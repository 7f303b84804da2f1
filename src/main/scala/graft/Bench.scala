package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Timing discipline: results go to the `noop` sink — `.count()` would
  * let Catalyst prune the projection work (an md5 query would time only
  * the scan). A warmup action first absorbs JVM/codegen startup so
  * per-query numbers reflect steady state.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    System.err.println(s"[bench] maxMemory=${Runtime.getRuntime.maxMemory() / (1 << 20)} MB" +
      s" cpus=${Runtime.getRuntime.availableProcessors()}")

    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup: touch every table + exercise codegen/shuffle machinery once
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    run(SparkEntry.queries("q_pricing_summary")(spark, sfDir))

    // min of 3 iterations per query, ROUND-ROBIN across queries: the
    // host shows bursty multi-second scheduling stalls (VM steal);
    // back-to-back iterations would let one burst poison all of a
    // query's samples, while interleaving puts each query's samples
    // minutes apart so min-of-3 sees at least one calm window. A query
    // that throws is marked failed (-1, excluded from total, listed in
    // "failed") — a fail-fast elapsed time must not make the bench
    // look faster.
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b narrows the set for local
    // iteration on one operator; the driver never sets it, so the
    // per-round artifact always covers the full suite
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    def measure(dir: String, iters: Int): Seq[(String, Option[Double])] = {
      val samples = scala.collection.mutable.Map.empty[String, List[Double]]
        .withDefaultValue(Nil)
      val broken = scala.collection.mutable.Set.empty[String]
      for (_ <- 1 to iters; (name, fn) <- queries if !broken(name)) {
        val t0 = System.nanoTime()
        try {
          run(fn(spark, dir))
          samples(name) = ((System.nanoTime() - t0) / 1e9) :: samples(name)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          broken += name
        }
      }
      queries.map { case (name, _) =>
        name -> (if (broken(name)) None else samples(name).minOption)
      }
    }
    val results = measure(sfDir, 3)
    // Locale.ROOT: the f-interpolator uses the default locale, and a
    // comma-decimal host locale would emit invalid JSON
    def ms(d: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    def toJson(rs: Seq[(String, Option[Double])], dir: String): String = {
      val qs = rs.map { case (k, v) => "\"" + k + "\":" + v.fold("-1")(ms) }
        .mkString("{", ",", "}")
      val failed = rs.collect { case (k, None) => "\"" + k + "\"" }
        .mkString("[", ",", "]")
      val total = rs.flatMap(_._2).sum
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":$qs,"failed":$failed,"sf":"$dir"}"""
    }
    val failed = results.collect { case (k, None) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    // Second scale point: a min-of-2 pass at the sibling sf0.01 dir
    // (when present) lands in BENCH_FULL.json only — a two-point
    // curve makes the next cross-round drift question answerable from
    // data (code change moves both points; fixture/host drift moves
    // them independently). stdout stays exactly the driver's one-line
    // contract.
    val secondDir = new java.io.File(sfDir).getCanonicalFile.getParentFile match {
      case null => None
      case p =>
        // canonical-path compare: a trailing slash or symlinked
        // spelling of sf0.01 itself must not re-bench the same dir as
        // its own "second" scale point
        Some(new java.io.File(p, "sf0.01"))
          .filter(d => d.isDirectory &&
            d.getCanonicalPath !=
              new java.io.File(sfDir).getCanonicalPath)
          .map(_.getPath)
    }
    val second = secondDir.map(d => toJson(measure(d, 2), d))
    val mainJson = toJson(results, sfDir)
    // Provenance keys (judge r8 ask #4): cross-round per-query diffs used
    // to require git archaeology because BENCH_FULL.json is overwritten in
    // place. `git_head` + `fixture_gen` (a listing hash of the benched dir:
    // name×length×mtime, same recipe as the summary cache tag) pin WHICH
    // code ran on WHICH fixture generation; the file also lands beside the
    // previous rounds' as BENCH_FULL_<head>.json so drift attribution is a
    // plain file diff.
    val gitHead: String = {
      try {
        val head = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(".git", "HEAD")),
          java.nio.charset.StandardCharsets.UTF_8).trim
        val sha =
          if (head.startsWith("ref: ")) {
            val ref = head.drop(5)
            val refPath = java.nio.file.Paths.get(".git", ref)
            if (java.nio.file.Files.exists(refPath))
              new String(java.nio.file.Files.readAllBytes(refPath),
                java.nio.charset.StandardCharsets.UTF_8).trim
            else {
              // after `git gc` the branch ref lives only in
              // .git/packed-refs ("<sha> <ref>" lines) — without this
              // fallback every post-gc bench writes BENCH_FULL_unknown
              // .json, clobbering the cross-round drift trail
              val packed = java.nio.file.Paths.get(".git", "packed-refs")
              if (java.nio.file.Files.exists(packed))
                scala.io.Source.fromFile(packed.toFile).getLines()
                  .filterNot(l => l.startsWith("#") || l.startsWith("^"))
                  .map(_.split(' '))
                  .collectFirst { case Array(sha, r) if r == ref => sha }
                  .getOrElse("")
              else ""
            }
          } else head
        if (sha.length >= 8) sha.take(8) else "unknown"
      } catch { case _: Throwable => "unknown" }
    }
    val fixtureGen: String = {
      val files = Option(new java.io.File(sfDir).listFiles()).getOrElse(Array.empty)
        .filter(_.isFile).sortBy(_.getName)
        .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
        .mkString("|")
      java.lang.Long.toHexString(
        scala.util.hashing.MurmurHash3.stringHash(files).toLong & 0xffffffffL)
    }
    val provenance =
      s""","git_head":"$gitHead","fixture_gen":"$fixtureGen""""
    val full = second.fold(mainJson.dropRight(1) + provenance + "}")(s =>
      mainJson.dropRight(1) + provenance + s""","second_scale":$s}""")
    // The driver retains only the LAST ~2000 chars of stdout; a single
    // line with every per-query timing gets its FRONT truncated there
    // and can never re-parse. So: full line first (humans, logs), full
    // JSON also durably on disk in the repo, and a short headline
    // object as the FINAL line — small enough to always survive the
    // tail window intact.
    println(full)
    // a SPARK_GRAFT_BENCH_ONLY subset run must not clobber the
    // committed full-suite artifacts with a partial line
    if (only.isEmpty) {
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH_FULL.json"),
        (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // durable per-commit copy (not overwritten by later rounds)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"BENCH_FULL_$gitHead.json"),
        (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    // a subset run skipped the artifact writes above — pointing its
    // summary at BENCH_FULL.json would hand tooling a stale (or
    // missing) full-suite artifact as if it described THIS run
    val queriesIn =
      if (only.isEmpty) "\"BENCH_FULL.json\""
      else results.map(r => s""""${r._1}"""").mkString("[", ",", "]")
    println(
      s"""{"metric":"total","value":${ms(total)},"unit":"sec","n_queries":${results.size},"n_failed":${results.count(_._2.isEmpty)},"failed":$failed,"queries_in":$queriesIn,"sf":"$sfDir"}""")
    spark.stop()
  }
}
