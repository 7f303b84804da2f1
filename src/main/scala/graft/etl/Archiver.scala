package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Post-ETL input archival (SURVEY §2.1 S9; reference
  * stepfunctions/lambda_function.py:24,37-108: paginated list + copy +
  * delete with continuation-token resumption).
  *
  * Filesystem equivalent: move each processed file to the archive dir.
  * Each rename is individually atomic and durable, so resumption is
  * per-FILE — finer than the reference's page granularity, with
  * nothing to re-do at a "batch boundary" (a rerun lists only files
  * still in the source dir and continues where the crash stopped).
  * `batchSize` therefore paces PROGRESS LOGGING, the one thing the
  * reference's pagination actually surfaced per page — it does not
  * (and could not) add any durability the per-file renames lack. */
object Archiver {
  def archive(spark: SparkSession, srcDir: String, dstDir: String,
              batchSize: Int = 100): Int = {
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(srcDir), conf)
    // the DESTINATION may live on a different filesystem (hdfs -> s3a
    // archive tier, the reference's own S3 shape): rename cannot cross
    // filesystems at all — it would wedge on the FIRST file and every
    // rerun after it, so cross-FS moves fall back to copy+delete
    // (copy first, delete only after, so a crash between them leaves a
    // duplicate, never a loss; the rerun's exists(target) path then
    // suffixes it like any re-delivery)
    val dst = new Path(dstDir)
    val dstFs = dst.getFileSystem(conf)
    val sameFs = fs.getUri == dstFs.getUri
    def move(from: Path, to: Path): Boolean =
      if (sameFs) fs.rename(from, to)
      else org.apache.hadoop.fs.FileUtil.copy(fs, from, dstFs, to,
        /*deleteSource=*/ true, /*overwrite=*/ false, conf)
    if (!dstFs.exists(dst)) dstFs.mkdirs(dst)
    val files = fs.listStatus(new Path(srcDir)).filter(_.isFile).map(_.getPath)
    var moved = 0
    files.foreach { f =>
      val target = new Path(dst, f.getName)
      if (dstFs.exists(target)) {
        // a same-named file was archived before (re-delivered input):
        // suffix with the source mtime so the move always completes —
        // silently skipping would leave the file in srcDir forever,
        // re-failing on every run (the 'resumable' contract never
        // draining). mtime alone is NOT unique (rsync -t / distcp -p
        // preserve it across re-deliveries), so fall through to a
        // random tag rather than crash-looping on the same suffix.
        val mtime = fs.getFileStatus(f).getModificationTime
        val suffixed = new Path(dst, s"${f.getName}.$mtime")
        val unique =
          if (!dstFs.exists(suffixed)) suffixed
          else new Path(dst, s"${f.getName}.$mtime." +
            java.util.UUID.randomUUID().toString.take(8))
        require(move(f, unique), s"archive move failed for $f")
      } else require(move(f, target), s"archive move failed for $f")
      moved += 1
      if (moved % batchSize == 0)
        org.slf4j.LoggerFactory.getLogger(getClass)
          .info(s"archived $moved/${files.length} files from $srcDir")
    }
    moved
  }
}
