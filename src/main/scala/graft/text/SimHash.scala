package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash document fingerprinting (beyond-reference; SURVEY.md §7.6).
  *
  * Each document gets a 48-bit signature: token hashes vote per bit
  * (+count / -count), the sign of each bit-sum sets the bit. Near-dups
  * = pairs within `maxHamming` bits, found inside a blocking key to
  * bound the pairwise comparison (at scale: block on simhash bands of
  * the signature itself, same LSH idea as MinHash).
  *
  * The token hash is the first 48 bits of md5 — portable to any engine
  * with md5, keeping the operator oracle-checkable in principle (the
  * bit loop makes the SQL twin unwieldy, so the driver check is
  * rows-only; ScalaTest pins golden signatures).
  */
object SimHash {
  val Bits = 48

  /** First 48 bits of md5(token) as a long (portable, deterministic).
    * Native digest expression ([[graft.functions.Md5Bits]]) —
    * value-identical to `conv(substring(md5(tok), 1, 12), 16, 10)`
    * without the per-token hex-string/substring/parse allocations;
    * callers must register NativeFunctions (simhash does). */
  def tokenHash(tok: Column): Column =
    graft.functions.NativeFunctions.md5Bits(tok, 12)

  /** (docId, tokens array) → (docId, simhash long). */
  def simhash(docs: DataFrame, idCol: String, tokensCol: String): DataFrame = {
    graft.functions.NativeFunctions.register(docs.sparkSession)
    val tok = docs
      // explode_outer + attribute filter, not plain explode: the
      // inferred size(tokens)>0 filter would inline a derived token
      // expression below its producing projection (see
      // MinHashLSH.signatures for the pathological case)
      .select(col(idCol), explode_outer(col(tokensCol)).as("tok"))
      .filter(col("tok").isNotNull)
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", tokenHash(col("tok")))
    val bitVotes = (0 until Bits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, col("cnt"))
            .otherwise(-col("cnt"))).as(s"b$b")
    }
    tok.groupBy(col(idCol))
      .agg(bitVotes.head, bitVotes.tail: _*)
      .select(col(idCol),
        (0 until Bits).map(b =>
          when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** Pairs within `maxHamming` bits inside `blockCol` blocks, found by
    * segment LSH rather than an all-pairs block join.
    *
    * Pigeonhole: split the 48-bit signature into `maxHamming + 1`
    * segments; two signatures within `maxHamming` bits differ in at most
    * `maxHamming` segments, so at least one segment is bit-identical.
    * Joining on (block, segment-idx, segment-bits) therefore finds every
    * qualifying pair, and the exact hamming filter removes false
    * candidates. Candidate count is bounded by segment-bucket sizes
    * (LSH-style), not |block|² — the property that keeps this viable
    * when a block holds millions of documents.
    */
  def nearDuplicates(sigs: DataFrame, idCol: String, blockCol: String,
                     maxHamming: Int): DataFrame = {
    // a negative value would make nSeg <= 0 and the segment-bound
    // arithmetic below divide by zero with no hint the ARG was bad
    require(maxHamming >= 0, s"maxHamming must be >= 0, got $maxHamming")
    val nSeg = maxHamming + 1
    // pigeonhole needs maxHamming+1 segments of ≥1 bit; past that every
    // pair qualifies anyway, so the plain block join is the only option
    if (nSeg > Bits)
      return nearDuplicatesBlocked(sigs, idCol, blockCol, maxHamming)
    val bounds = (0 to nSeg).map(i => i * Bits / nSeg)
    val segKeys = array((0 until nSeg).map { s =>
      val lo = bounds(s); val w = bounds(s + 1) - lo
      struct(lit(s).as("seg"),
             shiftright(col("sh"), lo).bitwiseAND(lit((1L << w) - 1)).as("bits"))
    }: _*)
    val keyed = sigs
      .select(col(blockCol).as("blk"), col(idCol).as("id"),
              col("simhash").as("sh"))
      // house pattern: explode_outer + attribute filter (see simhash())
      .select(col("blk"), col("id"), col("sh"),
              explode_outer(segKeys).as("k"))
      .filter(col("k").isNotNull)
      .select(col("blk"), col("k.seg").as("seg"), col("k.bits").as("bits"),
              col("id"), col("sh"))
      // checkpointed: BOTH sides of the self-join read this frame, and
      // without truncation each re-runs the upstream simhash aggregate
      // (tokenize + two shuffles) — measured 2.9 s of a 18.3 s query
      // at sf1 paid twice. nSeg·n rows of 4 small columns.
      .localCheckpoint()
    val a = keyed.select(col("blk"), col("seg"), col("bits"),
                         col("id").as("id_a"), col("sh").as("sh_a"))
    val b = keyed.select(col("blk"), col("seg"), col("bits"),
                         col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("blk", "seg", "bits"))
      .filter(col("id_a") < col("id_b"))
      // exact hamming filter FIRST, distinct second: with 48 bits and
      // maxHamming+1 segments each segment key is only 5-6 bits wide
      // (≤64 buckets per block), so candidate volume is the sum of
      // m²-sized buckets — 10s of millions of rows at 50k docs. The
      // bit_count is a codegen'd per-row op that cuts that stream to
      // the true near-dup pairs BEFORE the distinct's shuffle; a
      // distinct-first order shuffles the full candidate stream
      // (measured ~15 s of the 18.3 s sf1 query). A close pair shares
      // several identical segments, so the distinct (on the pair plus
      // its deterministic hamming) still collapses the multi-segment
      // emits to one row.
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
      .distinct()
  }

  /** The quadratic within-block comparison — the oracle twin the banded
    * path is equality-tested against (never the scale path). */
  def nearDuplicatesBlocked(sigs: DataFrame, idCol: String, blockCol: String,
                            maxHamming: Int): DataFrame = {
    val a = sigs.select(col(blockCol).as("blk"), col(idCol).as("id_a"),
                        col("simhash").as("sh_a"))
    val b = sigs.select(col(blockCol).as("blk"), col(idCol).as("id_b"),
                        col("simhash").as("sh_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
  }
}
