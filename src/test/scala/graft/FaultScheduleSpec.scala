package graft

import graft.tables.LakehouseTable
import org.scalatest.funsuite.AnyFunSuite

/** Systematic crash-fault enumeration for the table layer's swap
  * protocol (SURVEY §7.4 atomic-swap requirement; the reference's
  * at-least-once retry contract, stepfunctions/lambda_function.py:84-98
  * — a crashed Glue attempt is simply re-run). Every FileSystem
  * rename/delete a mutator performs is an interruption point; a
  * counting pass through the fault-injection seam enumerates them, and
  * the writer is then killed at EACH one in turn. At every kill point
  * the spec asserts the two-sided contract:
  *
  *   1. READER VISIBILITY: a fresh reader sees only complete states —
  *      each swap unit (whole table, partition dir, or bucket dir) is
  *      the old generation, the new generation, or absent WITH its
  *      tombstone present (recoverable); never a half-visible mix
  *      inside one unit. (Cross-unit visibility is sequential by
  *      contract — the Hive dynamic-partition-overwrite shape.)
  *   2. CONVERGENCE: repairInterruptedSwaps + re-running the SAME
  *      mutation lands on exactly the no-crash final state.
  *
  * This generalizes the ad-hoc crash-window tests in LakehouseTableSpec
  * to the full schedule: if a new rename/delete is ever added to a
  * mutator, the counting pass picks it up automatically and the kill
  * loop covers it with no spec change.
  */
class FaultScheduleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private case class InjectedCrash(k: Int, label: String)
    extends RuntimeException(s"injected crash at step $k ($label)")

  /** Enumerate the mutation's interruption points (no-op hook). */
  private def countSteps(t: LakehouseTable)(mutate: => Unit): Int = {
    var n = 0
    t.faultHook = _ => n += 1
    try mutate finally t.faultHook = null
    n
  }

  /** Run the mutation, killing the writer just before step k's
    * rename/delete executes. Returns the step's label. */
  private def crashAt(t: LakehouseTable, k: Int)(mutate: => Unit): String = {
    var n = 0
    var hit = ""
    t.faultHook = label => {
      n += 1
      if (n == k) { hit = label; throw InjectedCrash(k, label) }
    }
    try {
      mutate
      fail(s"mutation completed without reaching step $k")
    } catch { case _: InjectedCrash => () }
    finally t.faultHook = null
    hit
  }

  private def tombstones(parent: String): Seq[String] =
    Option(new java.io.File(parent).list()).getOrElse(Array.empty[String])
      .filter(_.contains(".tombstone-")).toSeq

  // ── full-table swap family: overwrite / upsert(full-merge) /
  //    compact / optimizeClustered / optimizeZOrder / overwriteVersioned

  /** Shared schedule for mutators whose publish is ONE whole-table
    * tombstone swap. `validLive`: the complete states a reader may
    * observe; `finalRows`: the converged state after repair + rerun. */
  private def fullTableSchedule(name: String,
                                setup: LakehouseTable => Unit,
                                mutate: LakehouseTable => Unit,
                                validLive: Set[Set[(Int, String)]],
                                finalRows: Set[(Int, String)]): Unit = {
    val probe = LakehouseTable(spark, s"${TestSpark.tmpDir(s"fs-$name-n")}/t", Seq("k"))
    setup(probe)
    val steps = countSteps(probe)(mutate(probe))
    assert(steps >= 1, s"$name: no interruption points enumerated")
    // the no-crash run must land on finalRows (sanity on the scenario)
    assert(probe.read.as[(Int, String)].collect().toSet == finalRows)

    (1 to steps).foreach { k =>
      val dir = TestSpark.tmpDir(s"fs-$name-$k")
      val t = LakehouseTable(spark, s"$dir/t", Seq("k"))
      setup(t)
      val label = crashAt(t, k)(mutate(t))
      // 1. reader visibility from a FRESH instance
      val r = LakehouseTable(spark, s"$dir/t", Seq("k"))
      if (r.exists) {
        val seen = r.read.as[(Int, String)].collect().toSet
        assert(validLive.contains(seen),
          s"$name step $k ($label): partial state visible: $seen")
      } else
        assert(tombstones(dir).nonEmpty,
          s"$name step $k ($label): table absent with NO tombstone — unrecoverable")
      // 2. repair + rerun converges
      r.repairInterruptedSwaps()
      mutate(r)
      assert(r.read.as[(Int, String)].collect().toSet == finalRows,
        s"$name step $k ($label): repair + rerun did not converge")
    }
  }

  private val oldGen = (1 to 20).map(i => (i, s"old$i")).toSet
  private def oldDf = oldGen.toSeq.toDF("k", "v")

  test("fault schedule: overwrite — every interruption point recovers") {
    val newGen = (1 to 5).map(i => (i, s"new$i")).toSet
    fullTableSchedule("overwrite",
      t => t.overwrite(oldDf),
      t => t.overwrite(newGen.toSeq.toDF("k", "v")),
      validLive = Set(oldGen, newGen),
      finalRows = newGen)
  }

  test("fault schedule: upsert (unpartitioned full-merge path)") {
    val merged = oldGen.filterNot(_._1 == 3) ++ Set((3, "UP3"), (21, "new21"))
    fullTableSchedule("upsert-full",
      t => t.overwrite(oldDf),
      t => t.upsert(Seq((3, "UP3"), (21, "new21")).toDF("k", "v")),
      validLive = Set(oldGen, merged),
      finalRows = merged)
  }

  test("fault schedule: compact (fold rewrite — row SET never changes, " +
       "repair resolves any duplicate window)") {
    // the unpartitioned fold protocol may leave input rows visible
    // TWICE between its commit point and the delete loop's end (never
    // fewer — nothing is hidden or lost); set-equality holds at every
    // kill point, and repair + rerun converge to the exact multiset.
    val all = oldGen + ((21, "old21"))
    fullTableSchedule("compact",
      t => { t.overwrite(oldDf); t.append(Seq((21, "old21")).toDF("k", "v")) },
      t => t.compact(512L * 1024 * 1024),
      validLive = Set(all), // rows never change set-wise
      finalRows = all)
    // duplicate-window bound + exact-count convergence at each kill
    val probe = LakehouseTable(spark, s"${TestSpark.tmpDir("fs-cfd-n")}/t", Seq("k"))
    probe.overwrite(oldDf)
    val steps = countSteps(probe)(probe.compact(512L * 1024 * 1024))
    (1 to steps).foreach { k =>
      val dir = TestSpark.tmpDir(s"fs-cfd-$k")
      val t = LakehouseTable(spark, s"$dir/t", Seq("k"))
      t.overwrite(oldDf)
      val label = crashAt(t, k)(t.compact(512L * 1024 * 1024))
      val r = LakehouseTable(spark, s"$dir/t", Seq("k"))
      val n = r.read.count()
      assert(n >= oldGen.size && n <= 2L * oldGen.size,
        s"compact-fold step $k ($label): count $n outside [20, 40]")
      r.repairInterruptedSwaps()
      assert(r.read.count() == oldGen.size,
        s"compact-fold step $k ($label): repair left duplicates/losses")
      r.compact(512L * 1024 * 1024)
      assert(r.read.count() == oldGen.size &&
             r.read.as[(Int, String)].collect().toSet == oldGen,
        s"compact-fold step $k ($label): rerun did not converge")
    }
  }

  test("optimistic concurrency: an appendBatch lands DURING a compact " +
       "and both survive — including at every compact kill point") {
    // the reference's autoCompact-beside-appends reality
    // (config/settings.py:124-127): compaction's input snapshot
    // predates the interleaved batch, so the fold neither reads nor
    // deletes it. The batch rows and the compacted rows must BOTH be
    // visible afterwards, with no duplicates once the fold completes.
    val base = (1 to 20).map(i => (i, s"old$i")).toSet
    val late = Set((99, "landed-mid-compact"))

    // no-crash leg: inject a COMPLETE concurrent appendBatch inside
    // the compact's window (after its input snapshot is taken — the
    // commit step precedes the landing rename and the delete loop)
    val dir0 = TestSpark.tmpDir("occ-cfa-n")
    val c0 = LakehouseTable(spark, s"$dir0/t", Seq("k"))
    base.grouped(5).foreach(g => { c0.appendBatch(g.toSeq.toDF("k", "v")); () })
    val sib0 = LakehouseTable(spark, s"$dir0/t", Seq("k"))
    var landed = false
    c0.faultHook = label =>
      if (label == "commit:compactFold" && !landed) {
        landed = true
        sib0.appendBatch(late.toSeq.toDF("k", "v"))
        ()
      }
    c0.compact(512L * 1024 * 1024)
    c0.faultHook = null
    assert(landed, "concurrent append never ran")
    assert(c0.read.count() == base.size + late.size,
      "append-during-compact lost or duplicated rows")
    assert(c0.read.as[(Int, String)].collect().toSet == base ++ late)

    // kill harness: compact crashes at EVERY step with the same
    // concurrent append injected at its commit step; after repair +
    // compact rerun, both generations are intact and exact
    val probe = LakehouseTable(spark, s"${TestSpark.tmpDir("occ-cfa-p")}/t", Seq("k"))
    base.grouped(5).foreach(g => { probe.appendBatch(g.toSeq.toDF("k", "v")); () })
    val steps = countSteps(probe)(probe.compact(512L * 1024 * 1024))
    (1 to steps).foreach { k =>
      val dir = TestSpark.tmpDir(s"occ-cfa-$k")
      val t = LakehouseTable(spark, s"$dir/t", Seq("k"))
      base.grouped(5).foreach(g => { t.appendBatch(g.toSeq.toDF("k", "v")); () })
      val sib = LakehouseTable(spark, s"$dir/t", Seq("k"))
      var mid = false
      var n2 = 0
      var hit = ""
      t.faultHook = label => {
        if (label == "commit:compactFold" && !mid) {
          mid = true
          sib.appendBatch(late.toSeq.toDF("k", "v"))
          ()
        }
        n2 += 1
        if (n2 == k) { hit = label; throw new RuntimeException(s"kill@$k") }
      }
      try { t.compact(512L * 1024 * 1024); () } catch { case _: RuntimeException => () }
      t.faultHook = null
      val r = LakehouseTable(spark, s"$dir/t", Seq("k"))
      r.repairInterruptedSwaps()
      // the interleaved batch may not have run for kills before the
      // commit step; land it now if not (the writer would retry)
      if (!mid) { sib.appendBatch(late.toSeq.toDF("k", "v")); () }
      assert(r.read.as[(Int, String)].collect().toSet == base ++ late,
        s"append-during-compact kill@$k ($hit): rows lost")
      r.compact(512L * 1024 * 1024)
      assert(r.read.count() == (base.size + late.size).toLong,
        s"append-during-compact kill@$k ($hit): duplicates after rerun")
    }
  }

  test("fault schedule: optimizeClustered and optimizeZOrder") {
    fullTableSchedule("optclu",
      t => t.overwrite(oldDf),
      t => t.optimizeClustered(Seq("k")),
      validLive = Set(oldGen),
      finalRows = oldGen)
    fullTableSchedule("optz",
      t => t.overwrite(oldDf),
      t => t.optimizeZOrder(Seq("k", "v")),
      validLive = Set(oldGen),
      finalRows = oldGen)
  }

  test("fault schedule: overwriteVersioned — live table is never the casualty") {
    val newGen = (1 to 5).map(i => (i, s"new$i")).toSet
    // finalRows covers live; archive content legitimately varies with
    // the kill point (a crash before the archive rename loses that one
    // archive by design — the tombstone is dropped as superseded), so
    // the schedule pins the live table and archive EXISTENCE only.
    val probe = LakehouseTable(spark, s"${TestSpark.tmpDir("fs-ver-n")}/t", Seq("k"))
    probe.overwrite(oldDf)
    val steps = countSteps(probe)(probe.overwriteVersioned(newGen.toSeq.toDF("k", "v")))
    assert(steps >= 3, s"expected the 3 swap renames, got $steps")
    (1 to steps).foreach { k =>
      val dir = TestSpark.tmpDir(s"fs-ver-$k")
      val t = LakehouseTable(spark, s"$dir/t", Seq("k"))
      t.overwrite(oldDf)
      val label = crashAt(t, k)(t.overwriteVersioned(newGen.toSeq.toDF("k", "v")))
      val r = LakehouseTable(spark, s"$dir/t", Seq("k"))
      if (r.exists) {
        val seen = r.read.as[(Int, String)].collect().toSet
        assert(seen == oldGen || seen == newGen,
          s"versioned step $k ($label): partial live state: $seen")
      } else assert(tombstones(dir).nonEmpty,
        s"versioned step $k ($label): live absent with no tombstone")
      r.repairInterruptedSwaps()
      r.overwriteVersioned(newGen.toSeq.toDF("k", "v"))
      assert(r.read.as[(Int, String)].collect().toSet == newGen,
        s"versioned step $k ($label): rerun did not converge")
      assert(r.versions.nonEmpty, s"versioned step $k: no archive after rerun")
    }
  }

  // ── partition-scoped family: each partition dir is its own swap unit

  test("fault schedule: partition-scoped upsert — per-partition atomicity") {
    val init = Set((1, "a", "p1"), (2, "b", "p2"))
    val batch = Set((1, "A", "p1"), (3, "c", "p2"))
    val finalP = Map("p1" -> Set((1, "A")), "p2" -> Set((2, "b"), (3, "c")))
    val oldP = Map("p1" -> Set((1, "a")), "p2" -> Set((2, "b")))

    val probe = LakehouseTable(spark,
      s"${TestSpark.tmpDir("fs-upp-n")}/t", Seq("k"), Seq("part"))
    probe.overwrite(init.toSeq.toDF("k", "v", "part"))
    val steps = countSteps(probe)(probe.upsert(batch.toSeq.toDF("k", "v", "part")))
    // intent + begin + commit record + 2 partitions x (tombstone,
    // promote, drop) + staged sweep
    assert(steps == 10, s"expected 10 interruption points, got $steps")

    (1 to steps).foreach { k =>
      val dir = TestSpark.tmpDir(s"fs-upp-$k")
      val t = LakehouseTable(spark, s"$dir/t", Seq("k"), Seq("part"))
      t.overwrite(init.toSeq.toDF("k", "v", "part"))
      val label = crashAt(t, k)(t.upsert(batch.toSeq.toDF("k", "v", "part")))
      // reader visibility: each PARTITION is old-complete, new-complete,
      // or absent with its tombstone present
      val r = LakehouseTable(spark, s"$dir/t", Seq("k"), Seq("part"))
      val crashed: Set[(Int, String, String)] =
        r.read.as[(Int, String, String)].collect().toSet
      val byPart: Map[String, Set[(Int, String)]] =
        crashed.groupBy(_._3).view.mapValues(_.map(x => (x._1, x._2))).toMap
      Seq("p1", "p2").foreach { p =>
        byPart.get(p) match {
          case Some(rows) =>
            assert(rows == oldP(p) || rows == finalP(p),
              s"upsert-part step $k ($label): partition $p partial: $rows")
          case None =>
            assert(tombstones(dir).exists(_.endsWith(s"part=$p")),
              s"upsert-part step $k ($label): $p absent with no tombstone")
        }
      }
      r.repairInterruptedSwaps()
      r.upsert(batch.toSeq.toDF("k", "v", "part"))
      val conv = r.read.as[(Int, String, String)].collect().toSet
      assert(conv == Set((1, "A", "p1"), (2, "b", "p2"), (3, "c", "p2")),
        s"upsert-part step $k ($label): did not converge: $conv")
    }
  }

  test("fault schedule: dropPartitions — per-partition delete, rerun is a no-op") {
    val init = Set((1, "a", "p1"), (2, "b", "p2"), (3, "c", "p3"))
    val probe = LakehouseTable(spark,
      s"${TestSpark.tmpDir("fs-dp-n")}/t", Seq("k"), Seq("part"))
    probe.overwrite(init.toSeq.toDF("k", "v", "part"))
    val steps = countSteps(probe)(probe.dropPartitions(Seq("p1", "p2")))
    assert(steps == 5,
      s"expected intent + begin + commit + 2 per-partition deletes, got $steps")
    (1 to steps).foreach { k =>
      val dir = TestSpark.tmpDir(s"fs-dp-$k")
      val t = LakehouseTable(spark, s"$dir/t", Seq("k"), Seq("part"))
      t.overwrite(init.toSeq.toDF("k", "v", "part"))
      crashAt(t, k)(t.dropPartitions(Seq("p1", "p2")))
      // untouched partition intact; dropped prefix is all-or-nothing per dir
      val r = LakehouseTable(spark, s"$dir/t", Seq("k"), Seq("part"))
      val seen = r.read.as[(Int, String, String)].collect().toSet
      assert(seen.contains((3, "c", "p3")), s"drop step $k: untouched p3 lost")
      val remaining = seen.map(_._3)
      assert(remaining == Set("p1", "p2", "p3") || remaining == Set("p2", "p3") ||
             remaining == Set("p3"),
        s"drop step $k: non-prefix partial drop: $remaining")
      r.dropPartitions(Seq("p1", "p2")) // rerun converges (missing = no-op)
      assert(r.read.as[(Int, String, String)].collect().toSet ==
             Set((3, "c", "p3")), s"drop step $k: rerun did not converge")
    }
  }

  // ── append / bucket / vacuum families

  test("fault schedule: appendBatch — a batch is visible all-or-nothing") {
    val first = Seq((1, "a")).toDF("k", "v")
    val second = Seq((2, "b")).toDF("k", "v")
    val probe = LakehouseTable(spark, s"${TestSpark.tmpDir("fs-ab-n")}/t", Seq("k"))
    probe.appendBatch(first)
    val steps = countSteps(probe) { probe.appendBatch(second); () }
    assert(steps == 4,
      s"appendBatch must be intent + begin + commit + ONE publish rename, got $steps")

    (1 to steps).foreach { k =>
      val dir = TestSpark.tmpDir(s"fs-ab-$k")
      val t = LakehouseTable(spark, s"$dir/t", Seq("k"))
      t.appendBatch(first)
      crashAt(t, k) { t.appendBatch(second); () }
      val r = LakehouseTable(spark, s"$dir/t", Seq("k"))
      // crashed batch is INVISIBLE (at worst an orphaned staging dir)
      assert(r.read.as[(Int, String)].collect().toSet == Set((1, "a")),
        s"step $k: half-landed batch visible")
      r.appendBatch(second)
      assert(r.read.as[(Int, String)].collect().toSet ==
             Set((1, "a"), (2, "b")))
      // orphaned staging dirs are vacuum's to sweep (only the kill at
      // the publish rename leaves one — the begin kill precedes the
      // staged write)
      val v = LakehouseTable(spark, s"$dir/t", Seq("k"))
      v.vacuum(maxAgeMs = 0)
      val dir2 = Option(new java.io.File(dir).list()).get.toSeq
      assert(!dir2.exists(_.contains(".appendstage-")),
        s"step $k: orphaned staging dir survived vacuum: $dir2")
    }
  }

  test("fault schedule: replaceBucket — bucket dir is the swap unit") {
    val oldB = Set((1, "a"))
    val newB = Set((9, "z"))
    val probe = LakehouseTable(spark, s"${TestSpark.tmpDir("fs-rb-n")}/t", Seq("k"))
    probe.appendBatch(oldB.toSeq.toDF("k", "v"), bucket = "b")
    val steps = countSteps(probe)(probe.replaceBucket("b", newB.toSeq.toDF("k", "v")))
    assert(steps == 6,
      s"expected intent + begin + commit + the 3 swap steps, got $steps")
    (1 to steps).foreach { k =>
      val dir = TestSpark.tmpDir(s"fs-rb-$k")
      val t = LakehouseTable(spark, s"$dir/t", Seq("k"))
      t.appendBatch(oldB.toSeq.toDF("k", "v"), bucket = "b")
      val label = crashAt(t, k)(t.replaceBucket("b", newB.toSeq.toDF("k", "v")))
      val r = LakehouseTable(spark, s"$dir/t", Seq("k"))
      r.readBucket("b") match {
        case Some(df) =>
          val seen = df.as[(Int, String)].collect().toSet
          assert(seen == oldB || seen == newB,
            s"bucket step $k ($label): partial bucket: $seen")
        case None =>
          assert(tombstones(dir).exists(_.endsWith("-b")),
            s"bucket step $k ($label): bucket absent with no tombstone")
      }
      r.repairInterruptedSwaps()
      r.replaceBucket("b", newB.toSeq.toDF("k", "v"))
      assert(r.readBucket("b").get.as[(Int, String)].collect().toSet == newB,
        s"bucket step $k ($label): rerun did not converge")
    }
  }

  test("concurrent-writer tripwire: an interleaved mutator aborts the " +
       "first writer loudly — never a silent lost update") {
    // two pipelines accidentally pointed at one table are the realistic
    // single-writer violation. The epoch token turns it from a silent
    // lost update into a loud abort: writer A stamps its epoch, writer B
    // interleaves a COMPLETE mutation, and A's publish-time ownership
    // check throws — B's generation stays live and intact, A's staged
    // data is a vacuumable orphan, and A's retry applies cleanly.
    val dir = TestSpark.tmpDir("tripwire")
    val a = LakehouseTable(spark, s"$dir/t", Seq("k"))
    a.overwrite(Seq((1, "base")).toDF("k", "v"))
    val b = LakehouseTable(spark, s"$dir/t", Seq("k"))

    var injected = false
    a.faultHook = label =>
      if (label == "begin:overwrite" && !injected) {
        injected = true
        b.overwrite(Seq((9, "other")).toDF("k", "v"))
      }
    val e = intercept[java.util.ConcurrentModificationException] {
      a.overwrite(Seq((2, "mine")).toDF("k", "v"))
    }
    a.faultHook = null
    assert(injected, "interleaved writer never ran")
    assert(e.getMessage.contains("single-writer"), e.getMessage)
    // B's generation is live and COMPLETE — A aborted pre-publish
    assert(a.read.as[(Int, String)].collect().toSet == Set((9, "other")))
    // A's staged orphan is vacuum's to sweep; the retry then applies
    LakehouseTable(spark, s"$dir/t", Seq("k")).vacuum(maxAgeMs = 0)
    assert(!Option(new java.io.File(dir).list()).get.exists(_.contains(".staged-")))
    a.overwrite(Seq((2, "mine")).toDF("k", "v"))
    assert(a.read.as[(Int, String)].collect().toSet == Set((2, "mine")))

    // same contract on the partition-scoped upsert path when the two
    // writers OVERLAP: B completes a full upsert touching p1 inside
    // A's window; A (also touching p1) aborts before ANY partition
    // swap, so the table is exactly B's merge — then A's retry lands
    // on top of it. (The disjoint-partition case now COMMUTES and
    // both land — see the optimistic-concurrency test below.)
    val dir2 = TestSpark.tmpDir("tripwire2")
    val pa = LakehouseTable(spark, s"$dir2/t", Seq("k"), Seq("part"))
    pa.overwrite(Seq((1, "a", "p1"), (2, "b", "p2")).toDF("k", "v", "part"))
    val pb = LakehouseTable(spark, s"$dir2/t", Seq("k"), Seq("part"))
    var injected2 = false
    pa.faultHook = label =>
      if (label == "begin:upsert" && !injected2) {
        injected2 = true
        pb.upsert(Seq((3, "B3", "p1")).toDF("k", "v", "part"))
      }
    intercept[java.util.ConcurrentModificationException] {
      pa.upsert(Seq((1, "A1", "p1")).toDF("k", "v", "part"))
    }
    pa.faultHook = null
    assert(injected2)
    assert(pa.read.as[(Int, String, String)].collect().toSet ==
           Set((1, "a", "p1"), (3, "B3", "p1"), (2, "b", "p2")),
           "B's merge not intact")
    pa.upsert(Seq((1, "A1", "p1")).toDF("k", "v", "part"))
    assert(pa.read.as[(Int, String, String)].collect().toSet ==
           Set((1, "A1", "p1"), (3, "B3", "p1"), (2, "b", "p2")))
  }

  test("optimistic concurrency: commutative concurrent writers both " +
       "land; non-commuting and unknown-intent writers abort loudly") {
    import graft.tables.{LakehouseTable => LT}

    // 1. append ∥ append (appendBatch, the crash-safe append path):
    // B lands a COMPLETE batch inside A's begin-to-publish window —
    // appends read no live state and land uniquely-named batch dirs,
    // so A classifies B's commit record as commuting and publishes
    // too. Both batches visible, nothing lost, no exception.
    val dirA = TestSpark.tmpDir("occ-append")
    val a1 = LakehouseTable(spark, s"$dirA/t", Seq("k"))
    a1.appendBatch(Seq((0, "base")).toDF("k", "v"))
    val a2 = LakehouseTable(spark, s"$dirA/t", Seq("k"))
    var appended = false
    a1.faultHook = label =>
      if (label == "begin:appendBatch" && !appended) {
        appended = true
        a2.appendBatch(Seq((2, "from-B")).toDF("k", "v"))
      }
    a1.appendBatch(Seq((1, "from-A")).toDF("k", "v"))
    a1.faultHook = null
    assert(appended)
    assert(a1.read.as[(Int, String)].collect().toSet ==
           Set((0, "base"), (1, "from-A"), (2, "from-B")),
           "concurrent appends lost a batch")

    // 2. upsert ∥ upsert on DISJOINT partitions: B merges p2 inside
    // A's p1 window. B's commit record carries {part=p2}; A touches
    // {part=p1}; the sets are disjoint, so A's merge (which read only
    // p1, unchanged by B) publishes. Both updates land.
    val dirU = TestSpark.tmpDir("occ-upsert")
    val u1 = LakehouseTable(spark, s"$dirU/t", Seq("k"), Seq("part"))
    u1.overwrite(Seq((1, "a", "p1"), (2, "b", "p2")).toDF("k", "v", "part"))
    val u2 = LakehouseTable(spark, s"$dirU/t", Seq("k"), Seq("part"))
    var upserted = false
    u1.faultHook = label =>
      if (label == "begin:upsert" && !upserted) {
        upserted = true
        u2.upsert(Seq((2, "B2", "p2")).toDF("k", "v", "part"))
      }
    u1.upsert(Seq((1, "A1", "p1")).toDF("k", "v", "part"))
    u1.faultHook = null
    assert(upserted)
    assert(u1.read.as[(Int, String, String)].collect().toSet ==
           Set((1, "A1", "p1"), (2, "B2", "p2")),
           "disjoint-partition upserts did not both land")

    // 3. append ∥ overwrite does NOT commute: the overwrite's swap
    // has no knowledge of the in-flight append's rows — the append
    // must abort, the overwrite's generation stays intact, and the
    // append's rerun lands on the new generation.
    val dirX = TestSpark.tmpDir("occ-mixed")
    val x1 = LakehouseTable(spark, s"$dirX/t", Seq("k"))
    x1.appendBatch(Seq((0, "base")).toDF("k", "v"))
    val x2 = LakehouseTable(spark, s"$dirX/t", Seq("k"))
    var overwrote = false
    x1.faultHook = label =>
      if (label == "begin:appendBatch" && !overwrote) {
        overwrote = true
        x2.overwrite(Seq((9, "new-gen")).toDF("k", "v"))
      }
    intercept[java.util.ConcurrentModificationException] {
      x1.appendBatch(Seq((1, "from-A")).toDF("k", "v"))
    }
    x1.faultHook = null
    assert(overwrote)
    assert(x1.read.as[(Int, String)].collect().toSet == Set((9, "new-gen")),
           "overwrite generation damaged by aborted append")
    x1.appendBatch(Seq((1, "from-A")).toDF("k", "v"))
    assert(x1.read.as[(Int, String)].collect().toSet ==
           Set((9, "new-gen"), (1, "from-A")))

    // 4. in-flight writer of UNKNOWN intent (epoch stamped, no commit
    // record — e.g. one that will turn out to be an overwrite): the
    // publisher retries its bounded window, then aborts loudly
    // instead of guessing. Simulated by stamping a foreign token
    // directly (the one state a classifier cannot explain).
    val (savedR, savedS) = (LT.conflictRetries, LT.conflictRetrySleepMs)
    LT.conflictRetries = 2
    LT.conflictRetrySleepMs = 10
    try {
      val dirF = TestSpark.tmpDir("occ-inflight")
      val f1 = LakehouseTable(spark, s"$dirF/t", Seq("k"))
      f1.appendBatch(Seq((0, "base")).toDF("k", "v"))
      var stamped = false
      f1.faultHook = label =>
        if (label == "begin:appendBatch" && !stamped) {
          stamped = true
          // through the Hadoop FS (not raw java.io) so the local
          // filesystem's checksum sidecar stays consistent
          val hfs = org.apache.hadoop.fs.FileSystem.getLocal(
            spark.sparkContext.hadoopConfiguration)
          val out = hfs.create(
            new org.apache.hadoop.fs.Path(s"$dirF/t.schemaepoch"), true)
          out.write("in-flight-foreign-token".getBytes("UTF-8"))
          out.close()
        }
      val e = intercept[java.util.ConcurrentModificationException] {
        f1.appendBatch(Seq((1, "mine")).toDF("k", "v"))
      }
      f1.faultHook = null
      assert(stamped)
      assert(e.getMessage.contains("unknown intent"), e.getMessage)
      assert(f1.read.as[(Int, String)].collect().toSet == Set((0, "base")))
    } finally {
      LT.conflictRetries = savedR
      LT.conflictRetrySleepMs = savedS
    }

    // 5. under the kill harness: a writer killed right after its
    // commit record (before any rename) leaves an orphan record —
    // the rerun (whose begin-snapshot includes the orphan) and later
    // unrelated mutations are unaffected.
    val dirK = TestSpark.tmpDir("occ-kill")
    val k1 = LakehouseTable(spark, s"$dirK/t", Seq("k"))
    k1.appendBatch(Seq((0, "base")).toDF("k", "v"))
    // step 4 of appendBatch is the publish rename (intent, begin,
    // commit, rename) — killing there leaves the record with no batch dir
    crashAt(k1, 4) { k1.appendBatch(Seq((1, "x")).toDF("k", "v")); () }
    assert(new java.io.File(s"$dirK/t.commits").list()
             .count(_.startsWith("c-")) >= 2,
           "orphan commit record missing — kill landed elsewhere")
    val k2 = LakehouseTable(spark, s"$dirK/t", Seq("k"))
    k2.appendBatch(Seq((1, "x")).toDF("k", "v"))
    k2.overwrite(Seq((9, "done")).toDF("k", "v"))
    assert(k2.read.as[(Int, String)].collect().toSet == Set((9, "done")),
           "stale commit record blocked a later mutation")
  }

  test("optimistic concurrency: TRULY parallel appendBatch writers all " +
       "land (threads, not hook-serialized interleaving)") {
    // the hook-based legs serialize the interleaver inside the
    // writer's window; this one runs four real threads through the
    // whole begin→stage→resolve→publish protocol simultaneously, so
    // the unknown-intent retry path (marker holds a token whose
    // record hasn't landed yet) is exercised by genuine in-flight
    // writers rather than a planted marker. Appends commute, so ALL
    // must land — any lost batch is a protocol hole, any abort here
    // is a false conflict.
    import graft.tables.{LakehouseTable => LT}
    val (savedR, savedS) = (LT.conflictRetries, LT.conflictRetrySleepMs)
    LT.conflictRetries = 150 // 30 s window: four concurrent Spark
    LT.conflictRetrySleepMs = 200 // jobs on 4 cores stretch publishes
    try {
      val dir = TestSpark.tmpDir("occ-parallel")
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val threads = (0 until 4).map { i =>
        new Thread(() => {
          try {
            val t = LakehouseTable(spark, s"$dir/t", Seq("k"))
            t.appendBatch(Seq((i, s"writer-$i")).toDF("k", "v"))
            ()
          } catch { case e: Throwable => errs.add(e); () }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(120000))
      assert(errs.isEmpty,
        s"parallel appends failed: ${errs.toArray.toSeq.map(_.toString)}")
      val got = LakehouseTable(spark, s"$dir/t", Seq("k"))
        .read.as[(Int, String)].collect().toSet
      assert(got == (0 until 4).map(i => (i, s"writer-$i")).toSet,
        s"lost batches: $got")
    } finally {
      LT.conflictRetries = savedR
      LT.conflictRetrySleepMs = savedS
    }
  }

  test("fault schedule + OCC: compactPartitions — per-partition swap " +
       "schedule; commutes with a DISJOINT upsert, aborts on overlap") {
    val init = (1 to 10).map(i => (i, s"v$i", s"p${i % 2}")).toSet
    def freshTable(dir: String): LakehouseTable = {
      val t = LakehouseTable(spark, s"$dir/t", Seq("k"), Seq("part"))
      // fragmented: one append per row
      init.toSeq.sortBy(_._1).foreach(r =>
        t.append(Seq(r).toDF("k", "v", "part")))
      t
    }

    // crash schedule: content-preserving, so the row SET never changes
    // at any kill point; repair + rerun converge and compact for real
    val probe = freshTable(TestSpark.tmpDir("fs-cp-n"))
    val steps = countSteps(probe)(probe.compactPartitions(Seq("p1")))
    assert(steps >= 5, s"expected the partition-swap schedule, got $steps")
    (1 to steps).foreach { k =>
      val dir = TestSpark.tmpDir(s"fs-cp-$k")
      val t = freshTable(dir)
      val label = crashAt(t, k)(t.compactPartitions(Seq("p1")))
      val r = LakehouseTable(spark, s"$dir/t", Seq("k"), Seq("part"))
      val seen = r.read.as[(Int, String, String)].collect().toSet
      if (seen != init)
        // the one permitted intermediate: p1 absent WITH its tombstone
        assert(seen == init.filter(_._3 == "p0") &&
               tombstones(dir).exists(_.endsWith("part=p1")),
          s"compactPartitions step $k ($label): partial state: $seen")
      r.repairInterruptedSwaps()
      r.compactPartitions(Seq("p1"))
      assert(r.read.as[(Int, String, String)].collect().toSet == init,
        s"compactPartitions step $k ($label): rerun did not converge")
      assert(new java.io.File(s"$dir/t/part=p1").listFiles()
               .count(_.getName.endsWith(".parquet")) == 1,
        s"compactPartitions step $k: p1 not compacted after rerun")
    }

    // DISJOINT interleave: an upsert into p0 lands INSIDE the p1
    // compaction's window — both effects visible, nothing lost
    val dirD = TestSpark.tmpDir("fs-cp-disjoint")
    val cd = freshTable(dirD)
    val sib = LakehouseTable(spark, s"$dirD/t", Seq("k"), Seq("part"))
    var landed = false
    cd.faultHook = label =>
      if (label == "begin:compactPartitions" && !landed) {
        landed = true
        sib.upsert(Seq((100, "mid", "p0")).toDF("k", "v", "part"))
      }
    cd.compactPartitions(Seq("p1"))
    cd.faultHook = null
    assert(landed)
    assert(cd.read.as[(Int, String, String)].collect().toSet ==
           init + ((100, "mid", "p0")),
      "disjoint upsert-during-compactPartitions lost an effect")

    // OVERLAP aborts loudly: the same interleave into p1
    val dirO = TestSpark.tmpDir("fs-cp-overlap")
    val co = freshTable(dirO)
    val sibO = LakehouseTable(spark, s"$dirO/t", Seq("k"), Seq("part"))
    var hit = false
    co.faultHook = label =>
      if (label == "begin:compactPartitions" && !hit) {
        hit = true
        sibO.upsert(Seq((100, "mid", "p1")).toDF("k", "v", "part"))
      }
    val e = intercept[java.util.ConcurrentModificationException] {
      co.compactPartitions(Seq("p1"))
    }
    co.faultHook = null
    assert(hit)
    assert(e.getMessage.contains("part=p1"), e.getMessage)
    // the upsert's merge is intact; the compaction rerun applies
    assert(co.read.as[(Int, String, String)].collect().toSet ==
           init + ((100, "mid", "p1")))
    co.compactPartitions(Seq("p1"))
    assert(co.read.as[(Int, String, String)].collect().toSet ==
           init + ((100, "mid", "p1")))
  }

  test("a concurrent writer's repair cannot steal a LIVE fold's crash " +
       "protection: young land-less rw-records are left alone") {
    // every mutator repairs before its own mutation — including the
    // commuting appends that legitimately interleave a fold. A repair
    // running inside the fold's record-to-landing window must NOT
    // roll the record back: if the fold then crashed right after
    // landing, nothing would remain to clean the duplicate inputs.
    // Young land-less records are a live fold's property; only
    // TTL-aged ones (a genuinely dead fold) roll back.
    val base = (1 to 12).map(i => (i, s"v$i")).toSet
    val dir = TestSpark.tmpDir("fold-steal")
    val t = LakehouseTable(spark, s"$dir/t", Seq("k"))
    base.grouped(3).foreach(g => { t.appendBatch(g.toSeq.toDF("k", "v")); () })
    val sibling = LakehouseTable(spark, s"$dir/t", Seq("k"))
    var checked = false
    t.faultHook = label =>
      // the step before the landing rename: the rw-record exists, the
      // compacted dir does not — exactly the stealable window
      if (label.startsWith("rename:") && label.contains("compacted-") &&
          !checked) {
        checked = true
        val rwBefore = new java.io.File(s"$dir/t.commits").list()
          .count(_.startsWith("rw-"))
        assert(rwBefore == 1, s"expected the live fold's record, got $rwBefore")
        sibling.repairInterruptedSwaps()
        val rwAfter = new java.io.File(s"$dir/t.commits").list()
          .count(_.startsWith("rw-"))
        assert(rwAfter == 1,
          "concurrent repair rolled back a LIVE fold's rw-record")
      }
    t.compact(512L * 1024 * 1024)
    t.faultHook = null
    assert(checked, "fold landing step never observed")
    assert(t.read.count() == base.size)
    assert(t.read.as[(Int, String)].collect().toSet == base)
    // ...and a genuinely dead fold's record DOES roll back once aged:
    // plant a land-less record older than the TTL, repair, gone
    import graft.tables.{LakehouseTable => LT}
    val savedTtl = LT.commitTtlMs
    LT.commitTtlMs = 50
    try {
      val planted = new java.io.File(s"$dir/t.commits/rw-deadfold")
      val w = new java.io.FileWriter(planted); w.write("compactFold|gone"); w.close()
      Thread.sleep(120)
      sibling.repairInterruptedSwaps()
      assert(!planted.exists(), "aged land-less rw-record not rolled back")
    } finally LT.commitTtlMs = savedTtl
  }

  test("fold rewrite reader visibility: a concurrent reader NEVER loses " +
       "a row mid-compact — the duplicate window is its only artifact") {
    // the fold's documented visibility contract: between the
    // compacted-<tag> landing and the end of the input delete loop a
    // reader may see input rows twice, but every row stays visible at
    // least once at EVERY protocol step — chosen over a hide-first
    // ordering whose mid-crash state would leave rows invisible until
    // repair. A fresh reader instance lists at each step and pins it.
    val base = (1 to 20).map(i => (i, s"r$i")).toSet
    val dir = TestSpark.tmpDir("fold-reader")
    val t = LakehouseTable(spark, s"$dir/t", Seq("k"))
    base.grouped(4).foreach(g => { t.appendBatch(g.toSeq.toDF("k", "v")); () })
    val observed = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Boolean)]
    t.faultHook = label => {
      val r = LakehouseTable(spark, s"$dir/t", Seq("k")).read
      val rows = r.as[(Int, String)].collect()
      observed += ((label, rows.length.toLong, rows.toSet == base))
    }
    t.compact(512L * 1024 * 1024)
    t.faultHook = null
    assert(observed.size >= 8, s"too few steps observed: $observed")
    observed.foreach { case (label, n, setOk) =>
      assert(setOk, s"mid-fold reader at '$label' lost or gained row VALUES")
      assert(n >= base.size && n <= 2L * base.size,
        s"mid-fold reader at '$label' saw $n rows (expected 20..40)")
    }
    // the window is real: at least one step shows the duplicates
    assert(observed.exists(_._2 > base.size),
      s"duplicate window never observed — steps: $observed")
    assert(t.read.count() == base.size)
  }

  test("vanished-file race classification + bounded metadata-read retry " +
       "(the fold's land-then-delete window, SoakScheduleSpec's failure)") {
    import graft.tables.{LakehouseTable => LT}
    // classification walks the cause chain and flattened task messages
    assert(LT.isVanishedFileRace(new java.io.FileNotFoundException("x")))
    assert(LT.isVanishedFileRace(new RuntimeException("outer",
      new IllegalStateException("mid",
        new java.io.FileNotFoundException("gone")))))
    // driver-side surface: the remote task failure arrives flattened
    // into the message, no typed cause
    assert(LT.isVanishedFileRace(new org.apache.spark.SparkException(
      "Job aborted due to stage failure: ... " +
      "[FAILED_READ_FILE.FILE_NOT_EXIST] Encountered error while reading")))
    assert(!LT.isVanishedFileRace(new RuntimeException("boom")))
    // a cause CYCLE (JVM forbids direct self-cause) must not loop: the
    // walk is depth-bounded
    val a1 = new RuntimeException("a")
    val b1 = new RuntimeException("b", a1)
    a1.initCause(b1)
    assert(!LT.isVanishedFileRace(a1))

    // retry: transient vanished-file throws are absorbed, the re-list
    // (re-run body) wins; non-matching errors propagate on throw one
    var calls = 0
    val got = LT.retryVanishedRead(attempts = 5, sleepMs = 1L) {
      calls += 1
      if (calls < 3) throw new java.io.FileNotFoundException("transient")
      42
    }
    assert(got == 42 && calls == 3)
    var once = 0
    val e = intercept[RuntimeException] {
      LT.retryVanishedRead(attempts = 5, sleepMs = 1L) {
        once += 1; throw new RuntimeException("not transient")
      }
    }
    assert(e.getMessage == "not transient" && once == 1)
    // exhausted attempts propagate the (still transient) last error
    var worn = 0
    intercept[java.io.FileNotFoundException] {
      LT.retryVanishedRead(attempts = 3, sleepMs = 1L) {
        worn += 1; throw new java.io.FileNotFoundException("persistent")
      }
    }
    assert(worn == 3)
  }

  test("optimistic concurrency: a non-commuting IN-FLIGHT intent aborts " +
       "the later publisher — no retry window burned, one winner") {
    // writer B (an overwrite) begins and is killed before its publish
    // record: only its INTENT exists. A concurrent appendBatch must
    // abort on the intent alone — waiting cannot help (the ops cannot
    // both land), and aborting on intents is what keeps the
    // marker-fast-path sound (a non-commuting writer can never slip
    // past a live window unpublished). B's rerun — whose begin
    // snapshot includes the orphan intent — is unaffected.
    val dir = TestSpark.tmpDir("occ-intent")
    val a = LakehouseTable(spark, s"$dir/t", Seq("k"))
    a.appendBatch(Seq((0, "base")).toDF("k", "v"))
    val b = LakehouseTable(spark, s"$dir/t", Seq("k"))
    var killed = false
    a.faultHook = label =>
      if (label == "begin:appendBatch" && !killed) {
        killed = true
        // B runs up to (not including) its commit step: intent written,
        // epoch stamped, staged write done — then dies
        crashAt(b, 3)(b.overwrite(Seq((9, "B")).toDF("k", "v")))
      }
    val e = intercept[java.util.ConcurrentModificationException] {
      a.appendBatch(Seq((1, "mine")).toDF("k", "v"))
    }
    a.faultHook = null
    assert(killed)
    assert(e.getMessage.contains("in flight (intent recorded)"), e.getMessage)
    // nothing landed from either writer
    assert(a.read.as[(Int, String)].collect().toSet == Set((0, "base")))
    // both reruns apply cleanly (snapshots include the orphan intent)
    b.overwrite(Seq((9, "B")).toDF("k", "v"))
    a.appendBatch(Seq((1, "mine")).toDF("k", "v"))
    assert(a.read.as[(Int, String)].collect().toSet ==
           Set((9, "B"), (1, "mine")))
  }

  test("optimistic concurrency: a mutation that outlives commitTtlMs " +
       "aborts loudly at publish instead of merging over pruned history") {
    // the one TTL hole is a mutation whose begin-to-publish exceeds
    // commitTtlMs: every record it must classify appeared after its
    // own begin (so expires later), which makes its OWN intent record
    // always the first casualty of a concurrent repair's pruning —
    // and the publish self-check turns the potential silent
    // lost-update into a loud abort. Reproduced with the REAL pruning
    // path: the TTL is shrunk, the mutation is fault-hook-delayed
    // past it, and a sibling writer's vacuum-repair prunes mid-window.
    import graft.tables.{LakehouseTable => LT}
    val savedTtl = LT.commitTtlMs
    LT.commitTtlMs = 150
    try {
      val dir = TestSpark.tmpDir("occ-ttl")
      val t = LakehouseTable(spark, s"$dir/t", Seq("k"))
      t.appendBatch(Seq((0, "base")).toDF("k", "v"))
      val sibling = LakehouseTable(spark, s"$dir/t", Seq("k"))
      var delayed = false
      t.faultHook = label =>
        if (label.startsWith("commit:") && !delayed) {
          delayed = true
          Thread.sleep(400) // begin-to-publish now exceeds the TTL
          sibling.vacuum(maxAgeMs = Long.MaxValue) // repair prunes the
          () // expired records (vacuum itself touches nothing else)
        }
      val e = intercept[java.util.ConcurrentModificationException] {
        t.appendBatch(Seq((1, "slow")).toDF("k", "v"))
      }
      t.faultHook = null
      assert(delayed)
      assert(e.getMessage.contains("outlived"), e.getMessage)
      assert(t.read.as[(Int, String)].collect().toSet == Set((0, "base")))
      // a WITHIN-TTL mutation is never prunable mid-flight: the same
      // interleaved repair with a sane TTL leaves the intent alone and
      // the mutation publishes
      LT.commitTtlMs = 3600L * 1000
      val t2 = LakehouseTable(spark, s"$dir/t", Seq("k"))
      var repaired = false
      t2.faultHook = label =>
        if (label.startsWith("commit:") && !repaired) {
          repaired = true
          sibling.vacuum(maxAgeMs = Long.MaxValue)
          ()
        }
      t2.appendBatch(Seq((1, "slow")).toDF("k", "v"))
      t2.faultHook = null
      assert(repaired)
      assert(t2.read.as[(Int, String)].collect().toSet ==
             Set((0, "base"), (1, "slow")))
    } finally LT.commitTtlMs = savedTtl
  }

  test("fault schedule: vacuumVersions — live and newest archive never touched") {
    def setup(dir: String): LakehouseTable = {
      val t = LakehouseTable(spark, s"$dir/t", Seq("k"))
      (1 to 3).foreach(g =>
        t.overwriteVersioned(Seq((g, s"g$g")).toDF("k", "v"), retain = 5))
      assert(t.versions == Seq(1L, 2L))
      t
    }
    val probe = setup(TestSpark.tmpDir("fs-vv-n"))
    val steps = countSteps(probe) { probe.vacuumVersions(0.0, force = true); () }
    assert(steps == 1, s"expected 1 archive delete (newest retained), got $steps")
    val dir = TestSpark.tmpDir("fs-vv-1")
    val t = setup(dir)
    crashAt(t, 1) { t.vacuumVersions(0.0, force = true); () }
    val r = LakehouseTable(spark, s"$dir/t", Seq("k"))
    assert(r.read.as[(Int, String)].collect().toSet == Set((3, "g3")),
      "vacuumVersions crash touched the live table")
    assert(r.versions.contains(2L), "newest archive lost mid-vacuum")
    r.vacuumVersions(0.0, force = true)
    assert(r.versions == Seq(2L), "vacuum rerun did not converge")
  }

  test("optimistic concurrency: an ackBatch racing a fold is never " +
       "silent — early ack aborts the fold, late ack's duplicate is " +
       "swallowed by the delete-loop backstop") {
    import spark.implicits._
    val b1Rows = Set((1, "a"), (2, "b"))
    val b2Rows = Set((3, "c"))

    // EARLY leg: the ack lands before the fold's input listing (hook
    // at begin:compactFold). The fold snapshots the already-renamed
    // done- dir, but its publish-time classification still sees the
    // ack's fresh records → conservative loud abort; nothing renamed
    // or deleted, and the rerun converges.
    val dirE = TestSpark.tmpDir("occ-ackfold-e")
    val tE = LakehouseTable(spark, s"$dirE/t", Seq("k"))
    val b1 = tE.appendBatch(b1Rows.toSeq.toDF("k", "v"))
    tE.appendBatch(b2Rows.toSeq.toDF("k", "v"))
    val sibE = LakehouseTable(spark, s"$dirE/t", Seq("k"))
    var ackedE = false
    tE.faultHook = label =>
      if (label == "begin:compactFold" && !ackedE) {
        ackedE = true
        sibE.ackBatch(b1)
      }
    val e = intercept[java.util.ConcurrentModificationException] {
      tE.compact(512L * 1024 * 1024)
    }
    tE.faultHook = null
    assert(ackedE && e.getMessage.contains("ackBatch"), e.getMessage)
    assert(tE.read.as[(Int, String)].collect().toSet == b1Rows ++ b2Rows)
    assert(tE.unackedBatches().size == 1, "ack lost by the aborted fold")
    tE.compact(512L * 1024 * 1024) // rerun (new snapshot) converges
    assert(tE.read.as[(Int, String)].collect().toSet == b1Rows ++ b2Rows)
    assert(tE.unackedBatches().isEmpty)

    // LATE leg: the ack slips through the residual check-to-rename
    // window (hook at commit:compactFold — after the fold's
    // classification passed). The rename wins the race against the
    // delete loop, but the loop's done-twin backstop removes the
    // duplicate copy: rows exact, handshake satisfied (the batch can
    // never be re-presented), nothing silent.
    val dirL = TestSpark.tmpDir("occ-ackfold-l")
    val tL = LakehouseTable(spark, s"$dirL/t", Seq("k"))
    val lb1 = tL.appendBatch(b1Rows.toSeq.toDF("k", "v"))
    tL.appendBatch(b2Rows.toSeq.toDF("k", "v"))
    val sibL = LakehouseTable(spark, s"$dirL/t", Seq("k"))
    var ackedL = false
    tL.faultHook = label =>
      if (label == "commit:compactFold" && !ackedL) {
        ackedL = true
        sibL.ackBatch(lb1)
      }
    tL.compact(512L * 1024 * 1024)
    tL.faultHook = null
    assert(ackedL, "late ack never ran")
    assert(tL.read.as[(Int, String)].collect().toSet == b1Rows ++ b2Rows,
      "late ack duplicated or lost rows through the fold")
    assert(tL.read.count() == (b1Rows.size + b2Rows.size).toLong)
    assert(tL.unackedBatches().isEmpty)

    // and the crash side of the LATE leg: kill the fold at every step
    // with the same slipped ack injected; repair + rerun must converge
    // on the exact row set with the duplicate twin gone
    val pDir = TestSpark.tmpDir("occ-ackfold-p")
    val probe = LakehouseTable(spark, s"$pDir/t", Seq("k"))
    val pb1 = probe.appendBatch(b1Rows.toSeq.toDF("k", "v"))
    probe.appendBatch(b2Rows.toSeq.toDF("k", "v"))
    val pSib = LakehouseTable(spark, s"$pDir/t", Seq("k"))
    // hand-rolled counting pass (countSteps would overwrite the
    // injecting hook): count the fold's steps WITH the slipped ack
    var pN = 0
    var pAcked = false
    probe.faultHook = label => {
      if (label == "commit:compactFold" && !pAcked) {
        pAcked = true; pSib.ackBatch(pb1)
      }
      pN += 1
    }
    try probe.compact(512L * 1024 * 1024)
    finally probe.faultHook = null
    assert(pAcked, "probe ack never ran")
    val steps = pN
    (1 to steps).foreach { k =>
      val dir = TestSpark.tmpDir(s"occ-ackfold-$k")
      val t = LakehouseTable(spark, s"$dir/t", Seq("k"))
      val kb1 = t.appendBatch(b1Rows.toSeq.toDF("k", "v"))
      t.appendBatch(b2Rows.toSeq.toDF("k", "v"))
      val sib = LakehouseTable(spark, s"$dir/t", Seq("k"))
      var acked = false
      var n2 = 0
      var hit = ""
      t.faultHook = label => {
        if (label == "commit:compactFold" && !acked) {
          acked = true
          sib.ackBatch(kb1)
        }
        n2 += 1
        if (n2 == k) { hit = label; throw new RuntimeException(s"kill@$k") }
      }
      try { t.compact(512L * 1024 * 1024); () }
      catch { case _: RuntimeException => () }
      t.faultHook = null
      val r = LakehouseTable(spark, s"$dir/t", Seq("k"))
      r.repairInterruptedSwaps()
      if (!acked) sib.ackBatch(kb1) // pre-commit kills: ack runs now
      r.compact(512L * 1024 * 1024)
      assert(r.read.as[(Int, String)].collect().toSet == b1Rows ++ b2Rows,
        s"ack-vs-fold kill@$k ($hit): rows wrong after repair+rerun")
      assert(r.read.count() == (b1Rows.size + b2Rows.size).toLong,
        s"ack-vs-fold kill@$k ($hit): duplicate rows survived")
    }
  }

  test("fold skips bucket dirs: a bucketed append landing INSIDE an " +
       "existing bucket mid-compact survives, and the bucket layout " +
       "stays intact") {
    import spark.implicits._
    val loose = Set((1, "root"))
    val inBucket = Set((2, "bucketed"))
    val late = Set((3, "landed-mid-compact"))
    val dir = TestSpark.tmpDir("occ-cfb")
    val t = LakehouseTable(spark, s"$dir/t", Seq("k"))
    t.appendBatch(loose.toSeq.toDF("k", "v"))
    t.appendBatch(inBucket.toSeq.toDF("k", "v"), bucket = "srcA")
    val sib = LakehouseTable(spark, s"$dir/t", Seq("k"))
    var landed = false
    t.faultHook = label =>
      if (label == "commit:compactFold" && !landed) {
        landed = true
        // lands a NEW batch dir inside the existing srcA bucket —
        // exactly the nested write a recursive snapshot delete of the
        // bucket entry would have destroyed
        sib.appendBatch(late.toSeq.toDF("k", "v"), bucket = "srcA")
        ()
      }
    t.compact(512L * 1024 * 1024)
    t.faultHook = null
    assert(landed, "bucketed append never ran")
    assert(t.read.as[(Int, String)].collect().toSet == loose ++ inBucket ++ late,
      "fold destroyed a bucket-nested batch")
    // the bucket dir itself must be untouched — both its batches
    // still individually visible to the handshake
    assert(t.unackedBatches("srcA").size == 2,
      "bucket batch dirs were flattened by the fold")
    assert(t.readBucket("srcA").get.count() == 2L)
  }

  test("optimistic concurrency: an interleaved record TTL-pruned " +
       "mid-classification aborts loudly, not with a raw " +
       "FileNotFoundException") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("occ-fnf")
    val t = LakehouseTable(spark, s"$dir/t", Seq("k"))
    t.appendBatch(Seq((0, "base")).toDF("k", "v"))
    val sibling = LakehouseTable(spark, s"$dir/t", Seq("k"))
    val commitLog = new java.io.File(s"$dir/t.commits")
    var interleaved = false
    t.faultHook = label => {
      if (label == "begin:appendBatch" && !interleaved) {
        interleaved = true
        sibling.appendBatch(Seq((1, "other")).toDF("k", "v"))
        ()
      }
      if (label.startsWith("classify:")) {
        // simulate a concurrent repair's TTL prune landing between the
        // classifier's listing and its record read: every record file
        // vanishes (the classifier reads the named one first)
        Option(commitLog.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.startsWith("c-") || f.getName.startsWith("i-"))
          .foreach(f => { f.delete(); () })
      }
    }
    val e = intercept[java.util.ConcurrentModificationException] {
      t.appendBatch(Seq((2, "me")).toDF("k", "v"))
    }
    t.faultHook = null
    assert(interleaved)
    assert(e.getMessage.contains("TTL-pruned") &&
           e.getMessage.contains("outlived"), e.getMessage)
    // nothing renamed: the base row and the sibling's batch are intact
    assert(t.read.as[(Int, String)].collect().toSet ==
           Set((0, "base"), (1, "other")))
  }
}
