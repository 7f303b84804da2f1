package graft

import graft.functions.NativeFunctions
import graft.text.PrefixJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two properties that make [[PrefixJoin]] the flagship exact
  * similarity join: (1) exactness — identical pairs to a brute-force
  * all-pairs Jaccard; (2) the CANONICAL df-ascending prefix order
  * generates strictly fewer candidates than a hash order on a zipfian
  * corpus (the hot-key risk the frequency dictionary exists to kill).
  * Reverting the dictionary to hash order fails the ratio assertion.
  */
class PrefixJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic zipfian corpus: slot j of doc i draws from 2^j
    * variants, so slot-0 tokens appear in EVERY doc (df = N) and
    * slot-9 tokens in ~N/512 (df ≈ 1) — a frequency skew like a real
    * vocabulary. Odd docs drop their rarest token: a true J = 9/10
    * near-dup pair per even/odd couple. */
  private def zipfDocs(n: Int): Seq[(Int, Seq[String])] =
    (0 until n).map { i =>
      val full = (0 until 10).map(j => s"w${j}_${i / 2 % (1 << j)}")
      (i, if (i % 2 == 0) full else full.dropRight(1))
    }

  test("exactness: identical pairs to brute-force all-pairs Jaccard") {
    val data = zipfDocs(600)
    val docs = data.toDF("doc_id", "toks")
    val got = PrefixJoin.joinAll(docs, "doc_id", "toks",
                                 threshold = 0.9, num = 9, den = 10)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("j"))
      .as[(Int, Int, Double)].collect().toSet

    val sets = data.map { case (i, ts) => (i, ts.toSet) }
    val brute = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= 0.9
    } yield (a, b, math.round(j * 10000) / 10000.0)).toSet

    assert(brute.nonEmpty, "fixture must contain true near-dup pairs")
    assert(got == brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
  }

  test("df-ascending prefix order beats hash order on candidate count") {
    NativeFunctions.register(spark)
    val docs = zipfDocs(600).toDF("doc_id", "toks")

    val dfOrdered = PrefixJoin.encodeDfAscending(docs, "doc_id", "toks")
    val nDf = PrefixJoin.candidates(dfOrdered, "doc_id", 9, 10).count()

    // the distributed (zipWithIndex) re-encode is rank-identical to
    // the map-literal fast path: same sets, same candidate pairs
    val bigPath = PrefixJoin.encodeDfAscending(docs, "doc_id", "toks",
                                               literalVocabLimit = 0)
    assert(bigPath.select(col("doc_id"), col("ws"))
             .as[(Int, Seq[Long])].collect().toMap ==
           dfOrdered.select(col("doc_id"), col("ws"))
             .as[(Int, Seq[Long])].collect().toMap)

    // the round-3..5 encoding: xxhash64 + array_sort — order-blind
    val hashOrdered = docs
      .select(col("doc_id"),
              NativeFunctions.hashedTokenSet(col("toks")).as("ws"))
      .withColumn("n", size(col("ws")))
    val nHash = PrefixJoin.candidates(hashOrdered, "doc_id", 9, 10).count()

    // every true pair must still be a candidate (PPJoin completeness
    // holds under ANY shared total order — the order buys efficiency)
    assert(nDf >= 300, s"true pairs missing from candidates: $nDf")
    // zipfian skew puts universal tokens in hash-order prefixes; the
    // df dictionary keeps buckets rare → strictly fewer candidates
    assert(nDf * 2 < nHash,
      s"df-ascending ($nDf) should at least halve hash-order ($nHash)")
  }

  test("raw (non-distinct) token arrays encode identically to pre-distinct sets") {
    // duplicate tokens must NOT inflate n, ws, or df — both encode
    // paths deduplicate internally (generic-API contract)
    val raw = zipfDocs(100).map { case (i, ts) => (i, ts ++ ts.take(3)) }
    val rawDf = raw.toDF("doc_id", "toks")
    val setDf = zipfDocs(100).toDF("doc_id", "toks")
    for (limit <- Seq(1 << 16, 0)) { // literal path and distributed path
      val fromRaw = PrefixJoin.encodeDfAscending(rawDf, "doc_id", "toks", limit)
        .select(col("doc_id"), col("ws"), col("n"))
        .as[(Int, Seq[Long], Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      val fromSet = PrefixJoin.encodeDfAscending(setDf, "doc_id", "toks", limit)
        .select(col("doc_id"), col("ws"), col("n"))
        .as[(Int, Seq[Long], Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(fromRaw == fromSet, s"limit=$limit: raw-array encode diverged")
    }
    // end-to-end: joinAll over raw arrays equals joinAll over sets
    val jRaw = PrefixJoin.joinAll(rawDf, "doc_id", "toks", 0.9, 9, 10)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4))
      .as[(Int, Int, Double)].collect().toSet
    val jSet = PrefixJoin.joinAll(setDf, "doc_id", "toks", 0.9, 9, 10)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4))
      .as[(Int, Int, Double)].collect().toSet
    assert(jRaw == jSet)
  }

  test("duplicate collapse: dup groups expand fully, empty sets pair with nothing") {
    // 3 exact copies of doc A, 2 of doc B (a true 9/10 near-dup of A),
    // plus 3 docs with EMPTY token sets. The collapse must (a) emit
    // every member pair — within-group at J=1.0, cross-group at the
    // representative pair's J — and (b) emit NOTHING for the empty-set
    // group: an empty set has no prefix token to bucket on, and the
    // 0/0 Jaccard convention excludes it (the uncollapsed join never
    // paired them either).
    val base = (0 until 10).map(j => s"t$j")
    val docs = Seq(
      (0, base), (1, base), (2, base),                 // dup group A
      (3, base.dropRight(1)), (4, base.dropRight(1)),  // dup group B
      (5, Seq.empty[String]), (6, Seq.empty[String]), (7, Seq.empty[String]))
      .toDF("doc_id", "toks")
    val got = PrefixJoin.joinAll(docs, "doc_id", "toks", 0.9, 9, 10)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("j"))
      .as[(Int, Int, Double)].collect().toSet
    val expected = Set(
      (0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0),           // within A
      (3, 4, 1.0),                                      // within B
      (0, 3, 0.9), (0, 4, 0.9), (1, 3, 0.9),            // cross A×B
      (1, 4, 0.9), (2, 3, 0.9), (2, 4, 0.9))
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("blocked join: NULL-block docs pair with nothing, like the equi-join") {
    // candidates() buckets on (prefix token, block) with a plain
    // equi-join, so a NULL block value never matches — not even two
    // exact duplicates in the NULL block. The duplicate-collapse
    // expansion must preserve that: before the fix, `within` used a
    // null-safe member join and ADDED J=1.0 pairs for NULL-block
    // duplicates that the uncollapsed join (and the SQL twins, which
    // join on a.source = b.source) never produce.
    val base = (0 until 10).map(j => s"t$j")
    val docs = Seq(
      (0, base, "web"), (1, base, "web"),             // dup group, block web
      (2, base, null), (3, base, null),               // dup group, NULL block
      (4, base.dropRight(1), "web"),                  // near-dup, block web
      (5, base.dropRight(1), null))                   // near-dup, NULL block
      .toDF("doc_id", "toks", "source")
    val got = PrefixJoin.joinAll(docs, "doc_id", "toks", 0.9, 9, 10,
        blockCols = Seq("source"))
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("j"))
      .as[(Int, Int, Double)].collect().toSet
    val expected = Set(
      (0, 1, 1.0),                                    // within web dups
      (0, 4, 0.9), (1, 4, 0.9))                       // cross web near-dups
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }
}
