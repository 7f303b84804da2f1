package graft.text

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over a near-duplicate pair graph → dedup
  * clusters (beyond-reference; the step after MinHash/SimHash pair
  * generation in a real training-data dedup pipeline: each cluster
  * keeps one representative).
  *
  * Default path: GraphX's Pregel connected components — the canonical
  * distributed CC. It hash-partitions the edge list once, then each
  * round only ships CHANGED labels (Pregel activates only vertices
  * that received a message), unpersists the previous round's RDDs as
  * it goes, and converges in O(diameter) rounds. Near-dup clusters
  * are dense, so diameter (and round count) is tiny. The result (min
  * vertex id per component) is the unique fixpoint — deterministic
  * regardless of execution order.
  *
  * [[connectedComponentsDF]] keeps the pure-DataFrame label
  * propagation (min-id + pointer jumping) for plans that must stay in
  * Catalyst; GraphX is faster per round because the per-iteration
  * DataFrame variant re-plans, re-shuffles every label (not just
  * changed ones), and accumulates checkpoint blocks.
  */
object DedupClusters {
  /** pairs: (id_a, id_b) undirected near-dup edges. Returns
    * (id, cluster_id) for every node that appears in a pair, where
    * cluster_id = min node id of its component. */
  def connectedComponents(pairs: DataFrame): DataFrame = {
    // fail fast on the id contract: a non-numeric string id casts to
    // NULL and crashes the Dataset decode deep inside the GraphX job
    // with no hint the id type was the problem; ids past 2^53 would
    // later mis-compare through a double cast in survivorsBy. Map
    // string ids to longs (xxhash64, a dictionary) before clustering.
    Seq("id_a", "id_b").foreach { c =>
      val dt = pairs.schema(c).dataType
      require(Seq(org.apache.spark.sql.types.LongType,
                  org.apache.spark.sql.types.IntegerType,
                  org.apache.spark.sql.types.ShortType,
                  org.apache.spark.sql.types.ByteType).contains(dt),
        s"DedupClusters needs integral pair ids; '$c' is $dt")
    }
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs
      .select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)]
      .rdd.map { case (a, b) => Edge(a, b, ()) }
    val graph = Graph.fromEdges(edges, (),
      edgeStorageLevel = StorageLevel.MEMORY_AND_DISK,
      vertexStorageLevel = StorageLevel.MEMORY_AND_DISK)
    val cc = org.apache.spark.graphx.lib.ConnectedComponents.run(graph)
    val out = cc.vertices.map { case (id, label) => (id, label) }
      .toDF("id", "cluster_id")
      // materialize before unpersisting the lineage we built it from
      .localCheckpoint(true)
    graph.unpersist(blocking = false)
    cc.unpersist(blocking = false)
    out
  }

  /** DataFrame-only label propagation (see class doc). */
  def connectedComponentsDF(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .cache()
    var labels = edges.select(col("src").as("id"))
      .distinct()
      .withColumn("cluster_id", col("id"))
      .cache()

    // labels only ever decrease (min propagation), so the label sum is a
    // strictly-monotone convergence witness — one cheap aggregate per
    // iteration instead of a change-detection join. coalesce: an empty
    // graph (no near-dup pairs is a legitimate state) sums to NULL.
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum("cluster_id"), lit(0L))).head().getLong(0)

    var prevSum = labelSum(labels)
    var prevRdd: Option[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]] = None
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // each node's candidate label: min of its own and its neighbors'
      val neighborLabels = edges
        .join(labels.withColumnRenamed("id", "dst")
                    .withColumnRenamed("cluster_id", "nl"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("nl").as("min_neighbor"))
      val hop = labels.join(neighborLabels, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("cluster_id"),
                coalesce(col("min_neighbor"), col("cluster_id")))
            .as("cluster_id"))
        .cache()
      // pointer jumping: adopt the label of your label — turns O(diameter)
      // propagation into O(log diameter)
      val next = hop
        .join(hop.select(col("id").as("cluster_id"), col("cluster_id").as("ll")),
              Seq("cluster_id"), "left_outer")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("ll"), col("cluster_id")))
            .as("cluster_id"))
      // localCheckpoint truncates the LOGICAL plan — without it each
      // iteration's plan nests the previous one's and Catalyst analysis
      // time grows exponentially (cache only truncates execution
      // lineage). On a multi-node cluster use checkpoint(dir) instead.
      // Keep the checkpointed RDD handle so the PREVIOUS iteration's
      // blocks can be dropped — localCheckpoint persists its RDD and a
      // DataFrame.unpersist() won't release it, so without this the
      // block manager accumulates one labels copy per iteration.
      val matRdd = next.rdd
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val mat = pairs.sparkSession.createDataFrame(matRdd, next.schema)
      val s = labelSum(mat)
      hop.unpersist()
      labels.unpersist()
      prevRdd.foreach(_.unpersist(blocking = false))
      prevRdd = Some(matRdd)
      labels = mat
      converged = s == prevSum
      prevSum = s
      i += 1
    }
    edges.unpersist()
    // the final labels RDD stays persisted (it's the result); callers
    // consume it immediately
    labels
  }

  /** Full dedup: near-dup pairs → components → survivors = one
    * representative (min id) per cluster + all unpaired docs. */
  def survivors(allIds: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val comps = connectedComponents(pairs)
    val dropped = comps.filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    allIds.select(col(idCol)).join(dropped, Seq(idCol), "left_anti")
  }

  /** Policy-driven survivor selection: keep the highest-`scoreCol` doc
    * per cluster (ties → min id) instead of the arbitrary min-id
    * representative — the production dedup policy (keep the longest /
    * highest-quality copy, drop the rest). Unpaired docs form
    * singleton clusters and always survive. Returns
    * (idCol, cluster_id, scoreCol) — one row per cluster. */
  def survivorsBy(docs: DataFrame, idCol: String, scoreCol: String,
                  pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val comps = connectedComponents(pairs)
    val scored = docs.select(col(idCol), col(scoreCol))
      .join(comps.withColumnRenamed("id", "__cc_id"),
            col(idCol) === col("__cc_id"), "left_outer")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
      .drop("__cc_id")
    val w = Window.partitionBy("cluster_id")
      .orderBy(col(scoreCol).desc, col(idCol))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("cluster_id"), col(scoreCol))
  }
}
