package graft

import graft.text.{MinHashLSH, SimHash, TextFunctions => TF}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shingles: content, short-doc edge") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(TF.shingles(TF.words(col("text")), 3).as("sh"))
    val rows = df.as[Seq[String]].collect()
    assert(rows(0) == Seq("a b c", "b c d"))
    assert(rows(1) == Seq.empty)
  }

  test("fingerprint: whitespace/case variants collapse, content changes don't") {
    val df = Seq(("a", "Hello  World"), ("b", " hello world "), ("c", "hello worlds"))
      .toDF("id", "text").select(col("id"), TF.fingerprint(col("text")).as("fp"))
    val m = df.as[(String, String)].collect().toMap
    assert(m("a") == m("b"))
    assert(m("a") != m("c"))
  }

  test("predictLang: priority chain and und fallback") {
    val df = Seq(
      "the cat and the dog is here", // en
      "der hund und die katze ist",  // de
      "xyz qqq zzz")                 // no markers -> und
      .toDF("text")
    val ws = TF.words(col("text"))
    val out = df.select(TF.predictLang(
      TF.markerScore(ws, TF.LangMarkers(0)._2),
      TF.markerScore(ws, TF.LangMarkers(1)._2),
      TF.markerScore(ws, TF.LangMarkers(2)._2),
      TF.markerScore(ws, TF.LangMarkers(3)._2)).as("l")).as[String].collect()
    assert(out.toSeq == Seq("en", "de", "und"))
  }

  test("minhash LSH finds planted near-dup, skips unrelated, deterministic") {
    val base = (1 to 60).map(i => s"w$i")
    val nearDup = base.take(57) ++ Seq("x1", "x2", "x3") // J ≈ 57/63 ≈ 0.905
    val other = (100 to 160).map(i => s"w$i")
    val docs = Seq((1L, base), (2L, nearDup), (3L, other))
      .toDF("doc_id", "ws")
    val run1 = MinHashLSH.nearDuplicates(docs, "doc_id", "ws", 64, 16, 0.7)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(run1.map(r => (r.getLong(0), r.getLong(1))) == Seq((1L, 2L)))
    assert(run1.head.getDouble(2) > 0.89 && run1.head.getDouble(2) < 0.92)
    val run2 = MinHashLSH.nearDuplicates(docs, "doc_id", "ws", 64, 16, 0.7)
      .orderBy("id_a", "id_b").collect().toSeq
    assert(run1 == run2)
  }

  test("simhash: identical docs hamming 0, near docs close, far docs far") {
    val a = (1 to 50).map(i => s"w$i")
    val docs = Seq(
      (1L, "blk", a), (2L, "blk", a),
      (3L, "blk", a.take(45) ++ Seq("q1", "q2", "q3", "q4", "q5")),
      (4L, "blk", (200 to 250).map(i => s"z$i")))
      .toDF("doc_id", "blk", "w")
    val sigs = SimHash.simhash(docs.select("doc_id", "w"), "doc_id", "w")
      .join(docs.select("doc_id", "blk"), "doc_id")
    val pairs = SimHash.nearDuplicates(sigs, "doc_id", "blk", maxHamming = 48)
      .as[(Long, Long, Long)].collect()
      .map { case (x, y, h) => (x, y) -> h }.toMap
    assert(pairs((1L, 2L)) == 0)
    assert(pairs((1L, 3L)) < pairs((1L, 4L)))
  }

  test("simhash banded pairing equals the quadratic block join on real docs") {
    val c = Ctx(spark, "/root/testdata/sf0.001")
    val sigs = SimHash.simhash(
      c.documents.select(col("doc_id"), TF.words(col("text")).as("w")),
      "doc_id", "w")
      .join(c.documents.select("doc_id", "source"), "doc_id")
      .cache()
    try {
      for (h <- Seq(4, 8, 16)) {
        val banded = SimHash.nearDuplicates(sigs, "doc_id", "source", h)
          .orderBy("id_a", "id_b").collect().toSeq
        val blocked = SimHash.nearDuplicatesBlocked(sigs, "doc_id", "source", h)
          .orderBy("id_a", "id_b").collect().toSeq
        assert(banded == blocked, s"maxHamming=$h: banded != blocked")
        assert(banded.nonEmpty, s"maxHamming=$h found no pairs — vacuous test")
      }
    } finally sigs.unpersist()
  }

  test("minhash LSH recall >= 0.95 vs blocked-exact ground truth at J>=0.9") {
    // ground truth: the oracle-checked exact blocked-Jaccard pairs,
    // filtered to the J >= 0.9 operating point the 8x8 banding targets;
    // candidate set: the production LSH query. A banding or hashing
    // regression (wrong operating point, broken signatures, dropped
    // buckets) shows up here as lost true pairs, which golden-signature
    // tests alone can't catch.
    val sf = "/root/testdata/sf0.01"
    val exact = QueriesText.defs("q_ngram_jaccard").fn(spark, sf)
      .filter(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = QueriesText.defs("q_minhash_neardup").fn(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.size > 100, s"vacuous ground truth: ${exact.size} pairs")
    val recall = (lsh & exact).size.toDouble / exact.size
    assert(recall >= 0.95, s"LSH recall $recall < 0.95 (${exact.size} true pairs)")
  }

  test("simhash banded pairing joins on segment keys, not block alone") {
    val c = Ctx(spark, "/root/testdata/sf0.001")
    val sigs = SimHash.simhash(
      c.documents.select(col("doc_id"), TF.words(col("text")).as("w")),
      "doc_id", "w")
      .join(c.documents.select("doc_id", "source"), "doc_id")
    val p = SimHash.nearDuplicates(sigs, "doc_id", "source", 8)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the pair join must key on the exploded (seg, bits) columns — a
    // join keyed on the block column alone is the all-pairs shape
    val joinKeys = p.linesIterator
      .filter(l => l.contains("hashpartitioning") || l.contains("keys"))
      .mkString("\n")
    assert(joinKeys.contains("bits"), p.take(3000))
  }

  test("chunk dedup: boilerplate dropped everywhere, clean docs untouched") {
    val sf = "/root/testdata/sf0.01"
    val out = QueriesText.defs("q_chunk_dedup").fn(spark, sf)
      .as[(Long, Long, Long, String)].collect()
    val c = Ctx(spark, sf)
    assert(out.length == c.documents.count(), "one row per doc")
    assert(out.forall { case (_, n, kept, _) => kept >= 0 && kept <= n })
    // the corpus has known cross-doc boilerplate: at least one doc
    // must lose a chunk, and most docs must keep everything
    val touched = out.count { case (_, n, kept, _) => kept < n }
    assert(touched > 0, "vacuous: no chunk dropped anywhere")
    assert(touched < out.length / 2, "dropped chunks from most docs")
    // a doc with all chunks kept must reassemble to its own normalized
    // text (chunking then joining on single spaces is lossless there)
    val untouchedFp = QueriesText.defs("q_fingerprint").fn(spark, sf)
    val both = out.filter { case (_, n, kept, _) => kept == n }.map(r => r._1 -> r._4).toMap
    val origFp = untouchedFp.select(col("doc_id"), col("fp"))
      .as[(Long, String)].collect().toMap
    both.foreach { case (id, fp) =>
      assert(fp == origFp(id), s"doc $id: untouched doc's cleaned_fp drifted") }
  }

  test("bloom decontamination equals exact decontamination") {
    val sf = "/root/testdata/sf0.01"
    val exact = QueriesText.defs("q_decontaminate").fn(spark, sf)
      .as[(Long, Long, Boolean)].collect().sorted.toSeq
    val bloom = QueriesText.defs("q_bloom_decontaminate").fn(spark, sf)
      .as[(Long, Long, Boolean)].collect().sorted.toSeq
    assert(exact.nonEmpty, "vacuous: no contaminated docs in corpus")
    assert(bloom == exact, "bloom-prefiltered result drifted from exact")
  }

  test("substring dedup: maximal cross-doc spans, merging, within-doc repeats ignored") {
    val dir = TestSpark.tmpDir("subdup")
    Seq(
      // 1 & 2 share one 8-token run -> one merged span of 8 each
      (1L, "a b c d e f g h i j"),
      (2L, "x1 x2 a b c d e f g h x3 x4"),
      // no cross-doc content
      (3L, "p q r s t u"),
      // 4 & 5 share two runs separated by unique tokens -> 2 spans
      (4L, "m1 m2 m3 m4 m5 zz4a zz4b n1 n2 n3 n4 n5"),
      (5L, "m1 m2 m3 m4 m5 yy5a yy5b n1 n2 n3 n4 n5"),
      // a WITHIN-doc repeat is not duplication across the corpus
      (6L, "r1 r2 r3 r4 r5 w r1 r2 r3 r4 r5"),
      // shorter than L tokens: no windows at all
      (7L, "s1 s2 s3"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val out = QueriesText.defs("q_substring_dedup").fn(spark, dir)
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) == ((10L, 1L, 8L, true)))
    assert(out(2L) == ((12L, 1L, 8L, true)))
    assert(out(3L) == ((6L, 0L, 0L, false)))
    assert(out(4L) == ((12L, 2L, 10L, true)))
    assert(out(5L) == ((12L, 2L, 10L, true)))
    assert(out(6L) == ((11L, 0L, 0L, false)))
    assert(out(7L) == ((3L, 0L, 0L, false)))
  }

  test("bloom probe sits in the plan as a constant-bloom filter") {
    val p = QueriesText.defs("q_bloom_decontaminate").fn(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("graft_might_contain") || p.contains("might_contain"), p.take(3000))
  }
}
