package graft.text

import graft.functions.NativeFunctions
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** EXACT all-pairs set-similarity join via prefix filtering — the
  * PPJoin family (Xiao et al., "Efficient Similarity Joins for Near
  * Duplicate Detection"): two sorted sets with J ≥ t must share a
  * token within each set's first |s| − ⌈t·|s|⌉ + 1 elements
  * (pigeonhole over a SHARED global token order), so candidates come
  * from an equi-join on prefix tokens only, then exact-verify.
  *
  * The global order is CANONICAL PPJoin order: ascending document
  * frequency. With the rarest tokens in every prefix, the candidate
  * equi-join's per-token bucket sizes stay small on zipfian corpora —
  * a hash order would land frequent tokens in prefixes, and those
  * buckets grow with corpus size (a hot-key quadratic in disguise; see
  * [[PrefixJoinSpec]] for the measured candidate-count gap).
  *
  * 100 TB story: the dictionary is VOCABULARY-sized (sublinear in the
  * corpus by Heaps' law) and the rank assignment never single-threads —
  * range-partition by (df, token), sort within partitions, then
  * distributed `zipWithIndex` assigns contiguous global ranks per
  * partition with one count job, no single-partition window. Every
  * subsequent step is an equi-shuffle keyed on token or doc id. The
  * only quadratic left is the true-output size itself, which no exact
  * join can beat.
  *
  * Re-expresses (beyond) the dedup surface of the reference's silver
  * dedup (`/root/reference/docs/etl_processes.md` duplicate handling)
  * for a training-data corpus.
  */
object PrefixJoin {

  /** Dictionary-encode each document's token SET as a SORTED
    * `array<long>` of df-ascending dictionary ranks (position 0 = the
    * document's globally rarest token). Output: (idCol, ws, n).
    * Raw (non-distinct) token arrays are accepted: both paths
    * deduplicate internally, so n/ws/df are always set-semantics.
    *
    * Injective by construction over the corpus vocabulary (ranks are
    * distinct by assignment, unlike a 64-bit hash which is only
    * statistically so), hence Jaccard over rank sets equals Jaccard
    * over the token sets exactly.
    *
    * Two re-encode strategies by vocabulary size:
    *  - vocab ≤ `literalVocabLimit`: the ranked dictionary rides into
    *    the plan as ONE map literal and each row re-encodes with a
    *    codegen'd `transform` + `array_sort` — zero extra shuffles,
    *    the PQ-codebook convention for model-scale driver artifacts.
    *    Vocabulary is sublinear in corpus size (Heaps' law), so this
    *    is the common case even at large scale.
    *  - larger: fully distributed — token-keyed dictionary join, then
    *    one doc-keyed shuffle reassembles the sorted rank sets. The
    *    rank assignment never single-threads either way (see below). */
  def encodeDfAscending(docs: DataFrame, idCol: String, toksCol: String,
                        literalVocabLimit: Int = 1 << 16,
                        carryCols: Seq[String] = Nil): DataFrame = {
    val spark = docs.sparkSession
    // explode_outer + isNotNull on the GENERATED attribute: a plain
    // explode of a derived array lets InferFiltersFromGenerate re-inline
    // the array expression below the projection (see verify SKILL.md)
    // distinct (doc, tok): callers may pass RAW token arrays — without
    // this, duplicate tokens inflate n/ws (wrong Jaccard denominators)
    // and df becomes an occurrence count instead of document frequency.
    // carryCols (per-doc attributes, functionally dependent on idCol —
    // the blocking columns) ride along through both paths so callers
    // never join the corpus back on itself just to re-attach them
    // (guide §2.4: that join was a whole extra exchange pair in
    // joinAll's plan).
    val toks = docs
      .select(col(idCol) +: carryCols.map(col) :+
              explode_outer(col(toksCol)).as("tok"): _*)
      .filter(col("tok").isNotNull)
      .distinct()
    val dfCounts = toks.groupBy("tok").agg(count("*").as("df"))

    // bounded-cardinality probe: limit+1 rows collect iff the whole
    // vocabulary does — never an unbounded driver fetch
    val head = dfCounts.limit(literalVocabLimit + 1).collect()
    if (head.length <= literalVocabLimit) {
      val ranks: Map[String, Long] = head.iterator
        .map(r => (r.getString(0), r.getLong(1)))
        .toSeq.sortBy { case (t, df) => (df, t) }
        .iterator.zipWithIndex
        .map { case ((t, _), i) => (t, i.toLong) }.toMap
      val dict = typedlit(ranks)
      // parity with the distributed path: drop null tokens, and drop
      // docs with no valid tokens at all (null/empty arrays) — the
      // explode/groupBy route never emits those rows
      docs.select(col(idCol) +: carryCols.map(col) :+
          array_sort(transform(
            array_distinct(filter(col(toksCol), t => t.isNotNull)),
            t => element_at(dict, t))).as("ws"): _*)
        .filter(col("ws").isNotNull && size(col("ws")) > 0)
        .withColumn("n", size(col("ws")))
    } else {
      // Global df-ascending total order WITHOUT a single-partition
      // window: range partitioning makes partition i's (df, tok) keys
      // all precede partition i+1's, so per-partition contiguous
      // indices from zipWithIndex form a global ascending rank. Ties
      // broken by token for determinism.
      //
      // Checkpoints: the corpus-scale (doc, tok) pairs feed both the
      // df re-aggregation and the final dictionary join, and
      // zipWithIndex runs TWO internal jobs (count + emit) over the
      // vocab-scale sorted frame — un-truncated, this path re-ran the
      // full explode+distinct shuffle 3-4 times, precisely on the
      // large-vocabulary corpora it exists for.
      val toksC = toks.localCheckpoint()
      val sorted = toksC.groupBy("tok").agg(count("*").as("df"))
        .repartitionByRange(col("df"), col("tok"))
        .sortWithinPartitions("df", "tok")
        .localCheckpoint()
      val dict = spark.createDataFrame(
        sorted.select("tok").rdd.zipWithIndex()
          .map { case (r, i) => Row(r.getString(0), i) },
        StructType(Seq(StructField("tok", StringType, nullable = false),
                       StructField("rank", LongType, nullable = false))))
      // carryCols join the grouping key: functionally dependent on
      // idCol, so the groups are identical and the attributes ride out
      toksC.join(dict, "tok")
        .groupBy(col(idCol) +: carryCols.map(col): _*)
        .agg(sort_array(collect_list(col("rank"))).as("ws"))
        .withColumn("n", size(col("ws")))
    }
  }

  /** Candidate (id_a < id_b) pairs from the prefix equi-join plus the
    * exact length-ratio prune (J ≥ num/den ⟹ den·min ≥ num·max).
    * Prefix length uses integer arithmetic (⌈num·n/den⌉ as
    * (num·n + den − 1) div den) — a float t·n would round the prefix
    * short and silently drop true pairs. `blockCols` (columns of
    * `encoded`) join into the candidate key: only same-block pairs
    * are produced, and each prefix-token bucket is further split per
    * block — the blocked-dedup shape (per-source, per-language)
    * without a per-block quadratic anywhere. */
  def candidates(encoded: DataFrame, idCol: String,
                 num: Int, den: Int,
                 blockCols: Seq[String] = Nil): DataFrame = {
    val pref = encoded
      .withColumn("plen",
        col("n") - expr(s"(n * $num + ${den - 1}) div $den").cast("int") + 1)
      .select(col(idCol) +: col("n") +: blockCols.map(col) :+
              explode_outer(slice(col("ws"), lit(1), col("plen"))).as("tok"): _*)
      .filter(col("tok").isNotNull)
    val keys = "tok" +: blockCols
    pref.select(col(idCol).as("id_a") +: col("n").as("n_a") +:
                keys.map(col): _*)
      .join(pref.select(col(idCol).as("id_b") +: col("n").as("n_b") +:
                        keys.map(col): _*), keys)
      .filter(col("id_a") < col("id_b"))
      .filter(least(col("n_a"), col("n_b")) * den >=
              greatest(col("n_a"), col("n_b")) * num)
      .select("id_a", "id_b").distinct()
  }

  /** Full exact similarity join: encode → prefix candidates → verify
    * with the single-merge-walk [[NativeFunctions.sortedJaccard]].
    * Output: (id_a, id_b, jaccard) for all pairs with J ≥ threshold —
    * same-block pairs only when `blockCols` is non-empty (the
    * per-source dedup shape) — no quadratic step either way. The
    * round-9 sf1 scaling rehearsal is why blocking lives HERE: the
    * previous source-blocked implementation was a per-block
    * self-join, and at 10× the corpus its fixed block count made
    * candidate generation quadratic (measured 26× for 10× data on
    * q_cluster_sizes); a block column on the prefix equi-join keeps
    * the same output with linear candidates. */
  def joinAll(docs: DataFrame, idCol: String, toksCol: String,
              threshold: Double, num: Int, den: Int,
              literalVocabLimit: Int = 1 << 16,
              blockCols: Seq[String] = Nil): DataFrame = {
    require(num.toDouble / den <= threshold,
      s"prune ratio $num/$den exceeds threshold $threshold")
    NativeFunctions.register(docs.sparkSession)
    // the encoded corpus feeds three consumers (prefix self-join + two
    // verify joins); checkpoint so the dictionary build runs ONCE
    // instead of once per consumer (the DedupClusters pattern).
    // blockCols are carried THROUGH the encode (not re-attached with a
    // corpus self-join — that join cost an extra exchange pair here)
    val encB = encodeDfAscending(docs, idCol, toksCol, literalVocabLimit,
                                 carryCols = blockCols)
      .localCheckpoint()
    // EXACT-duplicate collapse (the Lee et al. dedup-pipeline
    // convention: exact dedup before near-dup): identical token sets
    // hit identical prefix buckets, so a group of g exact duplicates
    // multiplies every one of its candidate rows by g² — on a
    // duplicate-heavy corpus (dedup's raison d'être) candidate
    // generation then grows with the square of duplication depth (the
    // round-9 sf1 rehearsal measured 18× for 10× data). Joining once
    // per DISTINCT (set, block) and expanding afterwards does the
    // same g² work only where it IS the true output: cross-group
    // member pairs inherit the representative pair's Jaccard verbatim
    // (their sets are equal), within-group pairs are Jaccard 1.0 ≥
    // any threshold. Output is row-identical to the uncollapsed join.
    val keyCols = col("ws") +: blockCols.map(col)
    val keyNames = "ws" +: blockCols
    val grouped = encB.groupBy(keyCols: _*)
      .agg(min(col(idCol)).as("__rep"))
      .localCheckpoint() // feeds reps + the members join below
    val reps = grouped
      .select(col("__rep").as(idCol) +: keyCols: _*)
      .withColumn("n", size(col("ws")))
    // rep→member as ROWS via a join back on the group key — NOT
    // collect_list: a boilerplate group with g duplicates would put
    // all g ids in one array in one row (g=10⁷ at corpus scale is an
    // 80 MB row → task OOM), while the join keeps every structure
    // O(row) and distributed. Spark hash-partitions array keys fine;
    // the set arrays shuffle once more, same order of work as the
    // groupBy above. Checkpointed: consumed ×4 (cross ×2, within ×2).
    // Docs with a NULL block value are dropped here: candidates()'
    // equi-join (like the uncollapsed join and the SQL twins) never
    // matches a NULL key, so NULL-block docs can contribute NOTHING
    // to the output — not even an exact-duplicate pair. Keeping them
    // in the member expansion would make `within` ADD J=1.0 rows the
    // uncollapsed join doesn't have, breaking the row-identical
    // invariant above. (ws itself is never null/empty — both
    // encodeDfAscending paths drop docs with no valid tokens.)
    val mSide0 = encB.select(col(idCol).as("__mid") +: keyCols: _*)
    val mSide = blockCols.foldLeft(mSide0)((d, c) => d.filter(col(c).isNotNull))
    val members = mSide
      .join(grouped, keyNames.map(n => mSide(n) === grouped(n)).reduce(_ && _))
      .select(col("__rep"), col("__mid"))
      .localCheckpoint()
    val repPairs = candidates(reps, idCol, num, den, blockCols)
      .join(reps.select(col(idCol).as("id_a"), col("ws").as("ws_a")), "id_a")
      .join(reps.select(col(idCol).as("id_b"), col("ws").as("ws_b")), "id_b")
      .withColumn("jaccard",
        NativeFunctions.sortedJaccard(col("ws_a"), col("ws_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    val cross = repPairs
      .join(members.select(col("__rep").as("id_a"), col("__mid").as("__ma")),
            "id_a")
      .join(members.select(col("__rep").as("id_b"), col("__mid").as("__mb")),
            "id_b")
      .select(least(col("__ma"), col("__mb")).as("id_a"),
              greatest(col("__ma"), col("__mb")).as("id_b"), col("jaccard"))
    val within = members
      .join(members.withColumnRenamed("__mid", "__mid2"), "__rep")
      .filter(col("__mid") < col("__mid2"))
      .select(col("__mid").as("id_a"), col("__mid2").as("id_b"),
              lit(1.0).as("jaccard"))
    cross.unionByName(within)
  }
}
