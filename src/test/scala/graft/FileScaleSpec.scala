package graft

import graft.tables.LakehouseTable
import org.scalatest.funsuite.AnyFunSuite

/** File-COUNT scale rehearsal for the table layer (round-12 verdict
  * ask 4). 100 TB at 256 MB/file ≈ 400k files; the layer's driver-side
  * moves — partition discovery, the stats-manifest probe and its
  * survivor FILE LIST collect (`readPruned`), `getContentSummary` +
  * full rewrite (`compact`) — must grow ~O(files) with small
  * constants, or a big table wedges the driver long before the
  * executors notice. The flat per-SF bench can't see this (row volume
  * scales, file count barely moves), so this spec scales file count
  * DIRECTLY: the same tiny rows fanned into 5k files (50 partition
  * dirs × 100) and 50k files (500 × 100) — a 10× file-count decade at
  * constant per-file size — and pins the wall-time ratio of each move
  * far below quadratic (linear lands ≈10×, O(files²) lands ≈100×).
  * Driver-memory is bounded alongside: the collected survivor list at
  * 50k files is ~5 MB of paths, and a loose used-heap growth ceiling
  * catches the 50 GB-class driver-bitmap blowups the layer was
  * designed away from (LakehouseTable.scala bloom-manifest note),
  * not GC noise.
  *
  * Files are byte-identical copies of one donor parquet (generation
  * speed), which makes the stats manifest maximally UNSELECTIVE: every
  * file survives the prune, so the measured collect is the worst-case
  * O(files) list, not a lucky skip.
  */
class FileScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def buildTable(dirs: Int, filesPerDir: Int): LakehouseTable = {
    val root = TestSpark.tmpDir(s"filescale-${dirs}x$filesPerDir")
    // one donor part file, copied everywhere
    val donorDir = s"$root/donor"
    Seq((1, "x")).toDF("k", "v").coalesce(1).write.parquet(donorDir)
    val donor = new java.io.File(donorDir).listFiles()
      .find(_.getName.endsWith(".parquet")).get.toPath
    val base = new java.io.File(s"$root/t")
    (0 until dirs).foreach { d =>
      val pdir = new java.io.File(base, f"part=p$d%04d")
      pdir.mkdirs()
      (0 until filesPerDir).foreach { f =>
        java.nio.file.Files.copy(donor,
          pdir.toPath.resolve(f"f-$f%05d.parquet"))
      }
    }
    LakehouseTable(spark, s"$root/t", Seq("k"), Seq("part"))
  }

  private def timed[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  test("driver-side moves scale ~O(files) across a 5k -> 50k decade " +
       "(slow)") {
    val small = buildTable(50, 100)   //  5,000 files
    val large = buildTable(500, 100)  // 50,000 files

    def measure(t: LakehouseTable, files: Int): Map[String, Double] = {
      // discovery + full scan (the read every maintenance op starts
      // from): file-open cost dominates at tiny files — the honest
      // worst case for a listing-shaped regression
      val (n, tScan) = timed(t.read.count())
      assert(n == files.toLong, s"expected $files rows, got $n")
      // stats-manifest build: one distributed pass, sharded write
      val (_, tStats) = timed(t.writeFileStats(Seq("k")))
      // manifest probe + survivor-list collect + explicit-file plan
      // assembly — the DRIVER-side piece readPruned pays before any
      // executor touches data (the DataFrame it returns is lazy)
      val heap0 = usedHeap()
      val (pruned, tPrune) = timed(t.readPruned("k", 0, 10))
      val heapGrowth = (usedHeap() - heap0) / (1 << 20)
      // ...and the end-to-end pruned read (all files survive — the
      // donor-copy layout makes the prune worst-case unselective)
      val (np, tPrunedScan) = timed(pruned.count())
      assert(np == files.toLong)
      // compact: getContentSummary walk + full rewrite; partitioned
      // tables re-cluster on the key so 100 tiny files per dir merge
      // to one
      val (_, tCompact) = timed(t.compact(128L << 20))
      val after = t.read.inputFiles.length
      assert(after <= files / 50,
        s"compaction left $after files for $files inputs")
      info(f"$files%6d files: scan=$tScan%6.2fs stats=$tStats%6.2fs " +
           f"prune-assemble=$tPrune%5.2fs pruned-scan=$tPrunedScan%6.2fs " +
           f"compact=$tCompact%6.2fs heapGrowth=${heapGrowth}%4d MB")
      Map("scan" -> tScan, "stats" -> tStats, "prune" -> tPrune,
          "prunedScan" -> tPrunedScan, "compact" -> tCompact,
          "heapMB" -> heapGrowth.toDouble)
    }

    val s = measure(small, 5000)
    val l = measure(large, 50000)

    // 10× the files: linear lands ≈10×; the pin at 30× tolerates this
    // host's scheduling noise and per-JVM warmup while still failing
    // an O(files²) listing (≈100×) outright. Sub-second small-side
    // times are clamped so fixed overhead can't fake a high ratio.
    Seq("scan", "stats", "prune", "prunedScan", "compact").foreach { k =>
      val ratio = l(k) / math.max(s(k), 0.5)
      info(f"$k%-11s ratio=${ratio}%5.1fx (5k=${s(k)}%6.2fs 50k=${l(k)}%6.2fs)")
      assert(ratio < 30.0,
        f"$k scaled ${ratio}%.1fx across a 10x file-count decade — superlinear")
    }
    // the 50k survivor list is ~5 MB of path strings; a 512 MB ceiling
    // only catches driver-bitmap-class blowups, not GC noise
    assert(l("heapMB") < 512.0,
      s"driver heap grew ${l("heapMB")} MB assembling a 50k-file prune")
  }

  test("dirs-heavy third point: prune assembly stays ~O(dirs) from 50k " +
       "to 200k files (2,000 dirs x 100) (slow)") {
    // the 5k->50k decade pins every move; this leg extends ONLY the
    // DRIVER-side prune assembly (survivor collect + covered-dir
    // collapse + reader-path globs — the move the collapse fix made
    // O(dirs)) one more 4x step, to where the 400k-file extrapolation
    // lives. The stats manifest is synthesized directly (one row per
    // file, every file surviving — the same worst-case unselective
    // shape writeFileStats builds; the distributed build itself is
    // executor-bound and already pinned), so the leg isolates the
    // driver constant instead of re-paying a 200k-file scan.
    def synthManifest(t: LakehouseTable): Int = {
      import org.apache.spark.sql.functions.lit
      val files = t.read.inputFiles
      files.toSeq.toDF("file")
        .withColumn("min_k", lit(0)).withColumn("max_k", lit(1))
        .repartition(4)
        .write.mode("overwrite").parquet(s"${t.path}.filestats")
      files.length
    }
    def measurePrune(dirs: Int): (Double, Long, Int) = {
      val t = buildTable(dirs, 100)
      val n = synthManifest(t)
      assert(n == dirs * 100, s"expected ${dirs * 100} files, got $n")
      val heap0 = usedHeap()
      val (pruned, tPrune) = timed(t.readPruned("k", 0, 10))
      val heapGrowth = (usedHeap() - heap0) / (1 << 20)
      // exactness: the assembled plan covers every survivor file
      val (got, tResolve) = timed(pruned.inputFiles.length)
      assert(got == n, s"assembled plan covers $got of $n survivors")
      info(f"${dirs * 100}%6d files ($dirs dirs): " +
           f"prune-assemble=$tPrune%5.2fs resolve=$tResolve%5.2fs " +
           f"heapGrowth=$heapGrowth%4d MB")
      (tPrune, heapGrowth, n)
    }
    val (t50, _, _) = measurePrune(500)    //  50,000 files
    val (t200, heap200, _) = measurePrune(2000) // 200,000 files
    val ratio = t200 / math.max(t50, 0.5)
    info(f"prune-assemble 50k->200k ratio=$ratio%5.1fx")
    // 4x the files (and dirs): linear lands ~4x; 12x tolerates host
    // noise while still failing a quadratic assemble (~16x+) or a
    // return of the per-file driver glob storm (~40x)
    assert(ratio < 12.0,
      f"prune assembly scaled $ratio%.1fx across a 4x dirs-heavy step")
    assert(heap200 < 512, s"driver heap grew $heap200 MB at 200k files")
  }

  private def usedHeap(): Long = {
    System.gc()
    val r = Runtime.getRuntime
    r.totalMemory() - r.freeMemory()
  }
}
