package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Pins the filesystem primitives the table layer's "Filesystem
  * contract" scaladoc (LakehouseTable) builds on — if a store (or a
  * Hadoop upgrade) changes any of these behaviors, the swap / record
  * / claim protocols' guarantees change with them, and this spec is
  * the canary. Each assertion names the protocol piece that relies
  * on it. Runs against the local FS (the deployment envelope doc maps
  * each primitive to HDFS/S3A/ABFS/GCS behavior).
  */
class FsContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def fs = org.apache.hadoop.fs.FileSystem.getLocal(
    spark.sparkContext.hadoopConfiguration)

  private def touch(p: Path, body: String = "x"): Unit = {
    val out = fs.create(p, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  test("create(overwrite=false) refuses an existing path — commit/intent " +
       "records and Excel claims are decided by exactly this") {
    val dir = new Path(TestSpark.tmpDir("fscontract"))
    val p = new Path(dir, "c-claim")
    touch(p)
    intercept[java.io.IOException] { fs.create(p, false) }
    // and the loser's failed create must not have damaged the
    // winner's content
    val in = fs.open(p)
    val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    assert(txt == "x")
  }

  test("rename moves files and whole dirs to a missing destination; " +
       "a rename onto an existing FILE fails instead of clobbering") {
    val dir = new Path(TestSpark.tmpDir("fscontract2"))
    // file → missing dest: blind append's per-file moves
    touch(new Path(dir, "a"))
    assert(fs.rename(new Path(dir, "a"), new Path(dir, "b")))
    // dir → missing dest, children intact: every tombstone swap,
    // appendBatch's batch publish, the fold's compacted-<tag> landing
    fs.mkdirs(new Path(dir, "d1/sub"))
    touch(new Path(dir, "d1/sub/f"))
    assert(fs.rename(new Path(dir, "d1"), new Path(dir, "d2")))
    assert(fs.exists(new Path(dir, "d2/sub/f")))
    // file → EXISTING file: must fail (returns false), not clobber —
    // renameOrFail turns this into a loud error; the protocols never
    // rely on rename-replace except the catalog manifest, which
    // handles the refusing-store case explicitly
    touch(new Path(dir, "x1"), "one")
    touch(new Path(dir, "x2"), "two")
    val renamed = fs.rename(new Path(dir, "x1"), new Path(dir, "x2"))
    if (renamed) {
      // POSIX rename(2) replaces atomically — acceptable: the dest
      // holds exactly ONE writer's complete bytes either way
      val in = fs.open(new Path(dir, "x2"))
      val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      assert(txt == "one" || txt == "two")
    } else assert(fs.exists(new Path(dir, "x1")), "refused rename lost src")
  }

  test("rename of a dir ONTO an existing NON-EMPTY dir never silently " +
       "destroys the destination's data — why the swap protocol orders " +
       "renames so the destination never exists") {
    val dir = new Path(TestSpark.tmpDir("fscontract3"))
    fs.mkdirs(new Path(dir, "src"))
    touch(new Path(dir, "src/f"))
    fs.mkdirs(new Path(dir, "dst"))
    touch(new Path(dir, "dst/existing"))
    val r = fs.rename(new Path(dir, "src"), new Path(dir, "dst"))
    // permitted outcomes across Hadoop filesystems: refuse (POSIX
    // ENOTEMPTY), or HDFS-style move-inside (dst/src/f). In BOTH the
    // destination's pre-existing data survives and the source's data
    // is not lost — the invariants every protocol rename depends on.
    assert(fs.exists(new Path(dir, "dst/existing")),
      "rename onto a non-empty dir destroyed the destination's data")
    assert(fs.exists(new Path(dir, "src/f")) ||
           fs.exists(new Path(dir, "dst/src/f")),
      s"rename (returned $r) lost the source's data")

    // CAVEAT pinned on purpose: POSIX rename(2) REPLACES an existing
    // EMPTY destination dir atomically — so "destination exists"
    // cannot be trusted as a guard, only "destination never created"
    // (which is how every swap orders its renames: the live path is
    // renamed AWAY before anything is renamed in)
    fs.mkdirs(new Path(dir, "src2"))
    touch(new Path(dir, "src2/g"))
    fs.mkdirs(new Path(dir, "emptydst"))
    val r2 = fs.rename(new Path(dir, "src2"), new Path(dir, "emptydst"))
    if (r2) assert(fs.exists(new Path(dir, "emptydst/g")) ||
                   fs.exists(new Path(dir, "emptydst/src2/g")))
    else assert(fs.exists(new Path(dir, "src2/g")))
  }
}
