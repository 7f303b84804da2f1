package graft

import graft.tables.LakehouseTable
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Randomized-schedule soak for the table layer's optimistic
  * concurrency: FaultScheduleSpec enumerates every interruption point
  * of each mutator in isolation and hand-picks the racy interleavings;
  * this spec instead lets a seeded RNG drive MANY writers through a
  * long arbitrary schedule and checks one interleaving-independent
  * oracle at the end.
  *
  * The op mix is restricted to the auto-merged (commuting) families
  * plus the row-preserving maintenance ops — appendBatch / blind
  * append / ackBatch / compact(fold) / optimizeClustered — which is
  * exactly what makes the oracle decidable without reconstructing the
  * interleaving: every op either ADDS a unique known row set exactly
  * once or PRESERVES the row multiset, so
  *
  *   final rows == base ∪ (rows of every append that completed)
  *
  * must hold for EVERY schedule, no matter how the OCC classification
  * resolved the races (a conflict abort contributes nothing and must
  * corrupt nothing — that is the property under test). Crash faults
  * are woven in: a randomly chosen append is killed at a random
  * protocol step, repaired, and re-run only if its batch did not land
  * (the all-or-nothing batch contract makes that check exact — the
  * same land-or-retry decision the ETL driver makes).
  *
  * Three writer threads × 18 ops with a fixed seed keeps the wall
  * cost bounded while still exercising thousands of step-level
  * interleavings across runs (thread scheduling varies; the oracle
  * does not).
  */
class SoakScheduleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("randomized concurrent schedule: commuting writers + maintenance " +
       "+ crash/repair converge on the interleaving-independent oracle") {
    val dir = TestSpark.tmpDir("soak")
    val base = (1 to 10).map(i => (i, "base")).toSet
    val seedT = LakehouseTable(spark, s"$dir/t", Seq("k"))
    seedT.appendBatch(base.toSeq.toDF("k", "v"))

    val nThreads = 3
    val opsPerThread = 18
    // all rows any thread will ever append, keyed so every (thread,
    // op) pair is globally unique — multiset equality reduces to set
    // equality and a count check
    def rowsFor(thread: Int, op: Int): Set[(Int, String)] =
      (0 until 3).map(j => (1000 + thread * 1000 + op * 10 + j,
                            s"t$thread-op$op")).toSet

    val landed =
      java.util.concurrent.ConcurrentHashMap.newKeySet[(Int, String)]()
    val aborted = new java.util.concurrent.atomic.AtomicInteger(0)
    val crashesRepaired = new java.util.concurrent.atomic.AtomicInteger(0)
    val errors =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()

    def worker(thread: Int): Thread = new Thread(() => {
      // per-thread deterministic op stream; the INTERLEAVING is the
      // only nondeterminism, and the oracle is interleaving-free
      val rnd = new scala.util.Random(20260817L + thread)
      val t = LakehouseTable(spark, s"$dir/t", Seq("k"))
      val myBatches = scala.collection.mutable.ArrayBuffer[String]()
      try {
        (0 until opsPerThread).foreach { op =>
          val rows = rowsFor(thread, op)
          try {
            rnd.nextInt(10) match {
              case 0 | 1 | 2 | 3 =>
                myBatches += t.appendBatch(rows.toSeq.toDF("k", "v"))
                landed.addAll(rows.asJava)
              case 4 =>
                t.append(rows.toSeq.toDF("k", "v"))
                landed.addAll(rows.asJava)
              case 5 =>
                if (myBatches.nonEmpty)
                  t.ackBatch(myBatches.remove(myBatches.size - 1))
              case 6 =>
                t.compact(512L * 1024 * 1024)
              case 7 =>
                t.optimizeClustered(Seq("k"))
              case _ =>
                // crash leg: kill an appendBatch at a random protocol
                // step, repair, re-run iff the batch did not land
                val killAt = 1 + rnd.nextInt(6)
                var n = 0
                var batchDir: String = null
                t.faultHook = _ => {
                  n += 1
                  if (n == killAt) throw new RuntimeException(s"soak-kill@$n")
                }
                try batchDir = t.appendBatch(rows.toSeq.toDF("k", "v"))
                catch { case e: RuntimeException
                    if e.getMessage != null &&
                       e.getMessage.startsWith("soak-kill") => () }
                finally t.faultHook = null
                if (batchDir == null) {
                  t.repairInterruptedSwaps()
                  // all-or-nothing: landed iff some batch dir holds a
                  // row of OURS — cheap exact check via the unique tag.
                  // Bounded retry: the scan races other threads' folds
                  // (a file listed before a fold's delete loop may be
                  // gone by scan time — rows are never lost, but THIS
                  // read attempt can fail; re-listing resolves it)
                  var present = false
                  var tries = 0
                  var ok = false
                  while (!ok) {
                    try {
                      present = t.exists &&
                        t.read.filter(col("v") === s"t$thread-op$op")
                          .count() > 0
                      ok = true
                    } catch {
                      case e: org.apache.spark.SparkException =>
                        tries += 1
                        if (tries >= 20) throw e
                        Thread.sleep(100)
                    }
                  }
                  if (!present)
                    batchDir = t.appendBatch(rows.toSeq.toDF("k", "v"))
                  crashesRepaired.incrementAndGet()
                }
                myBatches += batchDir
                landed.addAll(rows.asJava)
            }
          } catch {
            case _: java.util.ConcurrentModificationException =>
              // a loud OCC abort: allowed for any op at any time; it
              // must simply contribute nothing (checked by the oracle)
              aborted.incrementAndGet(); ()
          }
        }
      } catch { case e: Throwable => errors.add(e); () }
    })

    val threads = (0 until nThreads).map(worker)
    threads.foreach(_.start())
    threads.foreach(_.join(600000))
    assert(errors.isEmpty,
      s"unexpected writer failure: ${Option(errors.peek()).map(_.toString)}")

    // settle: repair any crash residue, then one quiet fold so the
    // final layout is also exercised end-to-end
    val fin = LakehouseTable(spark, s"$dir/t", Seq("k"))
    fin.repairInterruptedSwaps()
    fin.compact(512L * 1024 * 1024)

    val expect = base ++ landed.asScala
    val got = fin.read.as[(Int, String)].collect()
    assert(got.toSet == expect,
      s"row SET diverged: missing=${(expect -- got.toSet).take(5)} " +
      s"extra=${(got.toSet -- expect).take(5)}")
    assert(got.length == expect.size,
      s"duplicates survived the schedule: ${got.length} vs ${expect.size}")
    // handshake sanity: every listed unacked batch actually exists
    fin.unackedBatches().foreach { b =>
      val u = new java.net.URI(b)
      val f = new java.io.File(if (u.getScheme == null) b else u.getPath)
      assert(f.exists, s"unackedBatches lists a missing dir: $b")
    }
    info(s"schedule: ${nThreads * opsPerThread} ops, " +
         s"${aborted.get()} loud aborts, " +
         s"${crashesRepaired.get()} crash/repair legs, " +
         s"${expect.size} rows exact")
  }
}
