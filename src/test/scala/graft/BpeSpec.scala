package graft

import graft.text.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Classic Sennrich-style fixture; merge sequence computed by hand:
  //   pairs round 1: (e,s)=9 (s,t)=9 → lexicographic tie-break (e,s)
  //   round 2: (es,t)=9 → "est"
  //   round 3: (l,o)=7 (o,w)=7 → (l,o)
  //   round 4: (lo,w)=7 → "low"
  private val dict = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("trainOnDict: hand-computed golden merge sequence") {
    val m = Bpe.trainOnDict(dict, 4)
    assert(m.map(x => (x.left, x.right, x.merged, x.pairFreq)) == Vector(
      ("e", "s", "es", 9L),
      ("es", "t", "est", 9L),
      ("l", "o", "lo", 7L),
      ("lo", "w", "low", 7L)))
    assert(m.map(_.rank) == Vector(0, 1, 2, 3))
  }

  test("trainOnDict: exhausts early when no adjacent pairs remain") {
    val m = Bpe.trainOnDict(Seq(("ab", 1L)), 10)
    assert(m.map(_.merged) == Vector("ab")) // one merge, then exhausted
  }

  test("encodeWord: lowest-rank-first application, OOV composition") {
    val ranks = Bpe.trainOnDict(dict, 4).map(m => (m.left, m.right) -> m.rank).toMap
    // "lowest" is NOT in the training dictionary, yet composes from
    // trained subwords: es → est → lo → low ⇒ [low, est]
    assert(Bpe.encodeWord("lowest", ranks).toSeq == Seq("low", "est"))
    assert(Bpe.encodeWord("low", ranks).toSeq == Seq("low"))
    assert(Bpe.encodeWord("xyz", ranks).toSeq == Seq("x", "y", "z"))
    assert(Bpe.encodeWord("", ranks).toSeq == Seq.empty)
  }

  test("train on testdata: deterministic, compressive, round-trips") {
    val docs = Ctx(spark, "/root/testdata/sf0.001").documents
    // 160 merges fully fuses this fixture's 31-word vocab (sum of
    // word lengths − vocab ≈ 107 pair fusions), making the
    // compression assertion a structural property, not a knife-edge
    val m1 = Bpe.train(docs, col("text"), numMerges = 160)
    val m2 = Bpe.train(docs, col("text"), numMerges = 160)
    assert(m1 == m2, "training must be reproducible run-to-run")
    assert(m1.nonEmpty)
    // pair frequency at selection time is non-increasing only per
    // symbol-pair lifetime, but every rule must have freq >= 1 and
    // ranks must be dense
    assert(m1.map(_.rank) == m1.indices.toVector)
    assert(m1.forall(_.pairFreq >= 1))

    val ranks = m1.map(x => (x.left, x.right) -> x.rank).toMap
    val vocab = docs
      .select(explode(graft.text.TextFunctions.words(col("text"))).as("word"))
      .filter(length(col("word")) > 0).distinct().as[String].collect()
    assert(vocab.nonEmpty)
    // round-trip: concatenating the tokens reproduces every word
    vocab.foreach { w =>
      assert(Bpe.encodeWord(w, ranks).mkString == w, s"round-trip failed for '$w'")
    }
    // compression: BPE minimizes FREQUENCY-WEIGHTED token count (the
    // merge objective), so assert corpus-weighted tokens beat
    // corpus-weighted chars by >2x — high-frequency words merge first
    val dictRows = Bpe.wordDict(docs, col("text"), maxVocab = 65536)
      .as[(String, Long)].collect()
    val chars = dictRows.map { case (w, f) => w.length.toDouble * f }.sum
    val toks = dictRows.map { case (w, f) =>
      Bpe.encodeWord(w, ranks).length.toDouble * f }.sum
    assert(toks < chars / 2, s"expected >2x compression, got $toks tokens / $chars chars")
  }

  test("encodeDocs: positional reassembly matches direct per-doc encoding") {
    val merges = Bpe.trainOnDict(dict, 4)
    val ranks = merges.map(x => (x.left, x.right) -> x.rank).toMap
    val docs = Seq(
      (1L, "low lower newest"),
      (2L, "widest lowest low low"),
      (3L, "   "), // whitespace-only: kept, with an EMPTY token array —
      // a vanished row would silently drop the doc from any inner-join
      // consumer (row accounting beats compactness here)
      (4L, "xyz")).toDF("id", "txt")
    val got = Bpe.encodeDocs(docs, col("id"), col("txt"), merges)
      .as[(Long, Seq[String])].collect().toMap
    def direct(s: String): Seq[String] =
      s.trim.split("\\s+").filter(_.nonEmpty).toSeq
        .flatMap(w => Bpe.encodeWord(w, ranks))
    assert(got(1L) == direct("low lower newest"))
    assert(got(2L) == direct("widest lowest low low"))
    assert(got(4L) == Seq("x", "y", "z"))
    assert(got(3L) == Seq.empty, s"wordless doc must keep its row: $got")
  }

  test("wordDict: deterministic cap keeps highest-frequency words") {
    val docs = Seq("a a a b b c").toDF("text")
    val d = Bpe.wordDict(docs, col("text"), maxVocab = 2)
      .as[(String, Long)].collect().toSeq
    assert(d == Seq(("a", 3L), ("b", 2L)))
  }

  test("queries: q_bpe_merges and q_bpe_encode run and are stable") {
    val dir = "/root/testdata/sf0.001"
    val merges = SparkEntry.queries("q_bpe_merges")(spark, dir)
    assert(merges.count() > 0)
    val enc1 = SparkEntry.queries("q_bpe_encode")(spark, dir).collect().toSeq
    val enc2 = SparkEntry.queries("q_bpe_encode")(spark, dir).collect().toSeq
    assert(enc1 == enc2)
    assert(enc1.nonEmpty)
  }

  test("q_bpe_step_replay's argmax pair IS the production trainer's first merge") {
    // the oracle-checked replay computes one merge iteration in pure
    // relational algebra; the trainer's rank-0 merge must agree on both
    // the chosen pair and its weighted frequency (at step 1 every
    // symbol is a single char, so the (left, right) tuple tie-break
    // equals the replay's 2-char-string ordering)
    val dir = "/root/testdata/sf0.001"
    val docs = Ctx(spark, dir).documents
    val first = graft.text.Bpe.train(docs, org.apache.spark.sql.functions.col("text"),
                                     numMerges = 1).head
    val chosen = SparkEntry.queries("q_bpe_step_replay")(spark, dir)
      .filter(org.apache.spark.sql.functions.col("is_merge") === 1L)
      .collect().head
    assert(chosen.getAs[String]("pair") == first.left + first.right)
    assert(chosen.getAs[Long]("pair_freq") == first.pairFreq)
  }

  test("q_bpe_step2_replay's second winner IS the production trainer's rank-1 merge") {
    // depth-2 replay: the step-2 argmax runs over MERGED symbol
    // sequences with the (left, right) tuple tie-break — the
    // iteration handoff. Must agree with trainOnDict's second merge
    // on pair identity AND weighted frequency.
    val dir = "/root/testdata/sf0.001"
    val docs = Ctx(spark, dir).documents
    val merges = graft.text.Bpe.train(docs,
      org.apache.spark.sql.functions.col("text"), numMerges = 2)
    assert(merges.length == 2)
    val second = merges(1)
    val chosen = SparkEntry.queries("q_bpe_step2_replay")(spark, dir)
      .filter(org.apache.spark.sql.functions.col("is_merge") === 1L)
      .collect().head
    assert(chosen.getAs[String]("left_sym") == second.left, chosen)
    assert(chosen.getAs[String]("right_sym") == second.right, chosen)
    assert(chosen.getAs[Long]("pair_freq") == second.pairFreq, chosen)
  }
}
