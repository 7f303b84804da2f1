package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection (beyond-reference;
  * SURVEY.md §7.6).
  *
  * Pipeline: token set → k minhash values (min over tokens of
  * xxhash64(seed_i, token)) → band signatures (hash of r consecutive
  * minhashes) → bucket join on (band, signature) for candidate pairs →
  * exact Jaccard verification on candidates only.
  *
  * Scale design: the only all-pairs step is the bucket self-join, whose
  * size LSH bounds by construction (a pair collides iff some band
  * matches, probability 1-(1-J^r)^b). The signature build is one
  * explode + hash-aggregate (single shuffle on doc id); verification
  * joins word sets only for candidate pairs. No driver-side state, no
  * UDFs — xxhash64 is codegen'd, so this runs at full scan speed on
  * 100 TB of documents. Skewed buckets (boilerplate text) can be capped
  * by salting the bucket key; not needed at test scale.
  */
object MinHashLSH {

  /** Which hash family drives the token dictionary, the per-plane
    * minhash, and the band buckets. The PIPELINE (dictionary-encode →
    * signature → band → bucket-join → exact-Jaccard verify) is
    * identical in both modes — only the hash expressions differ.
    *
    *  - [[XxHash]]: production. xxhash64 token dictionary + the
    *    single-pass mixing aggregate ([[graft.functions.MinHashSignature]])
    *    + xxhash64 band buckets. Fastest (one codegen'd aggregate), but
    *    xxhash64 internals are not reproducible in SQL engines, so
    *    results can only be pinned by recall/golden tests.
    *  - [[Md5Hash]]: oracle. The token dictionary and the band buckets
    *    are the first 60 bits of an md5 hex digest; the k per-plane
    *    minhashes are the classic universal-hash family over that one
    *    md5 token hash — `(aᵢ·h_lo + bᵢ·h_hi + cᵢ) mod (2³¹−1)` with
    *    h split into two 30-bit halves so every product stays under
    *    2⁶¹ and every operation is exact 64-bit integer arithmetic in
    *    ANY engine (DuckDB, Trino — no overflow, no floats). The
    *    END-TO-END near-dup output (including which pairs the banding
    *    surfaces — LSH recall < 1 stops mattering because the oracle
    *    replays the SAME bands) hash-matches cross-engine. One md5 per
    *    token total (not per plane — r9 replaced the per-plane md5,
    *    which made md5 mode k× the hash work of production and the
    *    sf1 bench's single heaviest query); use for verification
    *    surfaces, production stays [[XxHash]].
    */
  sealed trait HashMode
  case object XxHash extends HashMode
  case object Md5Hash extends HashMode

  /** First 60 bits of md5 as a positive long (15 hex chars) — the
    * md5-mode hash primitive. DuckDB twin:
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`. Native digest
    * expression ([[graft.functions.Md5Bits]]) rather than
    * conv∘substring∘md5: value-identical, but skips the 32-char hex
    * string + substring + base-16 parse per token (md5 mode's entire
    * per-token hot path; callers register NativeFunctions). */
  def md5Long(c: Column): Column =
    graft.functions.NativeFunctions.md5Bits(c, 15)

  /** Md5-mode plane-hash parameters: modulus 2³¹−1 (Mersenne prime)
    * and the 30-bit split point. Products aᵢ·h_half are < 2⁶¹ and the
    * three-term sum < 2⁶³ — exact in BIGINT everywhere. */
  val PlaneMod: Long  = 2147483647L   // 2^31 - 1
  val HalfBase: Long = 1073741824L    // 2^30

  /** Deterministic (aᵢ, bᵢ, cᵢ) for plane i, derived driver-side from
    * md5 so any engine (or reviewer) can re-derive them; embedded as
    * literals in both the Spark expression and the SQL twin. aᵢ, bᵢ
    * are non-zero mod P so no plane degenerates to a constant. */
  def planeCoeffs(i: Int): (Long, Long, Long) = {
    def h60(tag: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$tag:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    (h60("mh-a") % (PlaneMod - 1) + 1,
     h60("mh-b") % (PlaneMod - 1) + 1,
     h60("mh-c") % PlaneMod)
  }

  /** Plane i's hash of a 60-bit md5 token hash `h`:
    * `(aᵢ·(h mod 2³⁰) + bᵢ·(h div 2³⁰) + cᵢ) mod (2³¹−1)` — a
    * 2-universal integer family (Carter–Wegman) that consumes all 60
    * bits of h, runs entirely in codegen'd long arithmetic, and has an
    * exact SQL twin: `(a*(h%1073741824) + b*(h//1073741824) + c) %
    * 2147483647`. */
  def planeHash(i: Int, h: Column): Column = {
    val (a, b, c) = planeCoeffs(i)
    (lit(a) * (h % lit(HalfBase)) + lit(b) * shiftright(h, 30) + lit(c)) %
      lit(PlaneMod)
  }

  /** Dictionary-encode a distinct token array into a sorted long array
    * (the form [[graft.functions.NativeFunctions.sortedJaccard]]
    * consumes), under either hash family. */
  def hashedTokenSet(tokens: Column, mode: HashMode): Column = mode match {
    case XxHash  => graft.functions.NativeFunctions.hashedTokenSet(tokens)
    case Md5Hash => array_sort(transform(tokens, t => md5Long(t)))
  }

  /** (docId, tokens) → one row per doc with `sig` array of k minhashes.
    * Deterministic: hash function i chains xxhash64(i) into the token
    * hash, so results are stable across runs/partitionings. Uses the
    * single-pass [[graft.functions.MinHashSignature]] aggregate (one
    * Array[Long] buffer per group, map-side combinable). */
  def signatures(docs: DataFrame, idCol: String, tokensCol: String,
                 k: Int, mode: HashMode = XxHash): DataFrame = {
    graft.functions.MinHashSignature.register(docs.sparkSession)
    graft.functions.NativeFunctions.register(docs.sparkSession)
    // explode_outer + attribute filter, NOT plain explode: for explode,
    // InferFiltersFromGenerate adds Filter(size(tokens) > 0) and
    // predicate pushdown inlines the token expression into it BELOW
    // whatever projection materialized its inputs — for derived token
    // columns (shingles over a words array) that re-expands the
    // underlying regex split per element_at, turning a 0.3s scan into
    // ~9s. explode_outer generates no such filter; the null-token
    // filter on the GENERATED attribute is unpushable and free.
    val tok = docs.select(col(idCol), explode_outer(col(tokensCol)).as("tok"))
      .filter(col("tok").isNotNull)
    mode match {
      case XxHash =>
        tok.groupBy(col(idCol))
          .agg(graft.functions.MinHashSignature.sig(col("tok"), k).as("sig"))
      case Md5Hash =>
        // contract check the XxHash branch does not need: md5-mode
        // tokens must already be the 60-bit LONG hashes from
        // hashedTokenSet. A raw STRING array (the type XxHash accepts)
        // would cast to NULL inside planeHash's arithmetic, every sig
        // element would be NULL, and banding would collapse to ONE
        // constant bucket per band — the silent O(n²) cross product
        // the rowsPerBand guard exists to prevent.
        docs.schema(tokensCol).dataType match {
          case org.apache.spark.sql.types.ArrayType(
                 org.apache.spark.sql.types.LongType, _) => ()
          case t => throw new IllegalArgumentException(
            s"Md5Hash signatures need array<bigint> token hashes from " +
            s"hashedTokenSet(_, Md5Hash); '$tokensCol' is $t")
        }
        // plane i = min over tokens of planeHash(i, tok) — tok is
        // already the 60-bit md5 token hash from hashedTokenSet, so
        // the k planes cost k long-multiplies per token, not k md5
        // digests. k plain min() aggregates instead of the mixing
        // aggregate — still one shuffle on the doc id with map-side
        // combine; exact SQL replayability at near-production speed.
        val mins = (0 until k).map(i =>
          min(planeHash(i, col("tok"))).as(s"h$i"))
        tok.groupBy(col(idCol))
          .agg(mins.head, mins.tail: _*)
          .select(col(idCol), array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
    }
  }

  /** Reference formulation with k separate min() aggregates — kept to
    * pin the equivalence of the single-pass aggregate in tests. */
  private[graft] def signaturesViaMinAggs(docs: DataFrame, idCol: String,
                                          tokensCol: String, k: Int): DataFrame = {
    val tok = docs.select(col(idCol), explode(col(tokensCol)).as("tok"))
    val mins = (0 until k).map(i => min(xxhash64(lit(i), col("tok"))).as(s"h$i"))
    tok.groupBy(col(idCol))
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** Candidate pairs whose signatures collide in ≥1 band.
    * bands·rowsPerBand must equal the signature length. An optional
    * blocking column joins into the bucket key: on corpora where LSH
    * buckets degenerate (tiny vocabularies, boilerplate), scoping dedup
    * to a shard/domain bounds the bucket self-join — the standard
    * escape hatch at 100 TB. */
  def candidatePairs(sigs: DataFrame, idCol: String,
                     bands: Int, rowsPerBand: Int,
                     blockCol: Option[String] = None,
                     mode: HashMode = XxHash): DataFrame = {
    graft.functions.NativeFunctions.register(sigs.sparkSession)
    val keyCols = Seq("band", "bucket") ++ blockCol
    // banded buckets checkpointed: both self-join sides read them, and
    // without truncation each side re-runs the upstream signature
    // aggregate (tokenize + k-plane minhash + shuffle) — measured
    // 2.2 s of an 11.4 s sf1 query, paid twice. bands·n small rows.
    // DeduplicateRelations re-aliases the right side of the self-join.
    val bnd = banded(sigs, idCol, bands, rowsPerBand, blockCol, mode)
      .localCheckpoint()
    val a = bnd.withColumnRenamed(idCol, "id_a")
    val b = bnd.withColumnRenamed(idCol, "id_b")
    a.join(b, keyCols)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Band buckets for one signature set. rowsPerBand = 0 would make
    * every bucket the constant xxhash64(b) — the "bucket join" then
    * degenerates to the full O(n²) cross product, silently: guarded
    * here, the one place every pair path goes through. */
  private def banded(sigs: DataFrame, idCol: String, bands: Int,
                     rowsPerBand: Int, blockCol: Option[String],
                     mode: HashMode = XxHash): DataFrame = {
    require(bands >= 1 && rowsPerBand >= 1,
      s"bands ($bands) and rowsPerBand ($rowsPerBand) must be >= 1 — " +
      "bands must divide the signature length k, with bands <= k")
    def bucket(b: Int): Column = {
      val elems = (0 until rowsPerBand).map(r =>
        element_at(col("sig"), b * rowsPerBand + r + 1))
      mode match {
        case XxHash  => xxhash64((lit(b) +: elems): _*)
        // md5 of "b:v1:...:vr" (decimal longs) — concat_ws twin in SQL
        case Md5Hash => md5Long(concat_ws(":",
          (lit(b.toString) +: elems.map(_.cast("string"))): _*))
      }
    }
    sigs.select(
      (col(idCol) +: blockCol.map(col).toSeq) :+
      posexplode(array((0 until bands).map(bucket): _*))
        .as(Seq("band", "bucket")): _*)
  }

  /** Candidate pairs ACROSS two signature sets (id_a from `left`,
    * id_b from `right`) — the incremental-dedup shape: batch
    * signatures vs the stored corpus. Banding each side separately
    * and joining across means left-left and right-right collisions
    * are never generated — the union-then-filter alternative
    * materializes every pair of STORED docs sharing a bucket each
    * batch, a cost that grows with the corpus instead of the batch.
    * `left` is expected to be the small (batch) side; it is broadcast
    * so the corpus-side bucket table never shuffles. */
  def crossCandidatePairs(left: DataFrame, right: DataFrame, idCol: String,
                          bands: Int, rowsPerBand: Int,
                          blockCol: Option[String] = None,
                          mode: HashMode = XxHash): DataFrame = {
    // mode must thread through to BOTH bandings: an Md5Hash pipeline
    // banded here with xxhash would be self-consistent (results look
    // fine) but silently lose the cross-engine SQL replayability that
    // is md5 mode's entire purpose
    val keyCols = Seq("band", "bucket") ++ blockCol
    val l = banded(left, idCol, bands, rowsPerBand, blockCol, mode)
      .withColumnRenamed(idCol, "id_a")
    val r = banded(right, idCol, bands, rowsPerBand, blockCol, mode)
      .withColumnRenamed(idCol, "id_b")
    broadcast(l).join(r, keyCols)
      .select("id_a", "id_b").distinct()
  }

  /** Full near-dup detection: candidates + exact Jaccard ≥ threshold.
    * `docs` must carry (idCol, tokensCol) with distinct tokens.
    *
    * Tokens are dictionary-encoded ONCE up front (xxhash64 → sorted
    * long array); the minhash aggregate then mixes 8-byte values per
    * plane instead of rehashing token bytes k times, and the exact-
    * Jaccard verification reuses the same hashed arrays — one
    * tokenization pass feeds the whole pipeline. */
  def nearDuplicates(docs: DataFrame, idCol: String, tokensCol: String,
                     k: Int, bands: Int, threshold: Double,
                     blockCol: Option[String] = None,
                     mode: HashMode = XxHash): DataFrame = {
    require(k % bands == 0 && bands <= k,
      s"bands ($bands) must divide the signature length k ($k): trailing " +
      "planes would silently be ignored (or every bucket degenerate)")
    graft.functions.NativeFunctions.register(docs.sparkSession)
    // localCheckpoint, not a bare select: FOUR consumers read this
    // frame (the signature build, the block re-join, and both sides of
    // the verification join) — un-truncated, each would re-run the
    // tokenization + hash + sort over the corpus. Same pattern as
    // PrefixJoin.joinAll; RDD-level storage, GC-reclaimed.
    val hashed = docs.select(
      (col(idCol) +: blockCol.map(col).toSeq) :+
        hashedTokenSet(col(tokensCol), mode).as("toks"): _*)
      .localCheckpoint()
    val sigs0 = signatures(hashed, idCol, "toks", k, mode)
    val sigs = blockCol
      .map(bc => sigs0.join(hashed.select(col(idCol), col(bc)), Seq(idCol)))
      .getOrElse(sigs0)
    val cand = candidatePairs(sigs, idCol, bands, k / bands, blockCol, mode)
    val sets = hashed.select(col(idCol), col("toks"))
    cand
      .join(sets.select(col(idCol).as("id_a"), col("toks").as("toks_a")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("toks").as("toks_b")), "id_b")
      .withColumn("jaccard",
        graft.functions.NativeFunctions.sortedJaccard(col("toks_a"), col("toks_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
