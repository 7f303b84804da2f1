package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables for co-located joins (SURVEY §4: "bucketing for
  * co-located joins").
  *
  * Writing both sides of a repeated equi-join bucketed by the join key
  * into the same bucket count lets Spark's planner join bucket-to-bucket
  * with NO exchange on either side — the shuffle is paid once at write
  * time instead of on every query. At 100 TB this is the difference
  * between re-shuffling the fact table per query and a purely local
  * join stage; the bucket count should be sized so each bucket is a few
  * hundred MB at target scale.
  */
object Bucketing {
  /** Write `df` as a bucketed managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCol: Option[String] = None): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // the in-memory catalog forgets tables across sessions but their
    // warehouse dirs persist; clear any orphaned location. The real
    // dir is catalog-normalized: identifiers lowercase, and a
    // db-qualified name lives under <db>.db/ — naive warehouse+name
    // concatenation would miss it and saveAsTable would fail with
    // 'location already exists'.
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val rel = table.toLowerCase.split('.') match {
      case Array(db, t) => s"$db.db/$t"
      case Array(t)     => t
      case _ => throw new IllegalArgumentException(
        s"table must be 'table' or 'db.table', got '$table'")
    }
    val loc = new org.apache.hadoop.fs.Path(s"$wh/$rel")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.format("parquet").bucketBy(buckets, bucketCol)
    sortCol.fold(w)(s => w.sortBy(s)).saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
