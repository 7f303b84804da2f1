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

  /** First 48 bits of md5(token) as a long (portable, deterministic). */
  def tokenHash(tok: Column): Column =
    conv(substring(md5(tok.cast("binary")), 1, 12), 16, 10).cast("long")

  /** (docId, tokens array) → (docId, simhash long). */
  def simhash(docs: DataFrame, idCol: String, tokensCol: String): DataFrame = {
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

  /** Pairs within `maxHamming` bits, compared inside `blockCol` blocks. */
  def nearDuplicates(sigs: DataFrame, idCol: String, blockCol: String,
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
