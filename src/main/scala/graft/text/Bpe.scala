package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: train merge rules from a corpus, then
  * encode documents with them — the subword-tokenization step of a
  * training-data pipeline (beyond-reference; SURVEY.md §7.6 family).
  *
  * Scale design (the SentencePiece / HuggingFace convention):
  *
  *  - BPE trains on the word-frequency DICTIONARY, not the corpus. The
  *    distributed part is one `groupBy(word)` shuffle; the dictionary is
  *    then capped to `maxVocab` entries by a TakeOrderedAndProject
  *    (per-partition top-k heaps, no global sort) and collected. Per
  *    Heaps' law the full dictionary grows ~O(corpus^0.5); the capped
  *    dictionary is a bounded model-scale driver artifact by contract —
  *    the same contract as the PQ codebooks in
  *    [[graft.similarity.Similarity]] (64k words ≈ a few MB).
  *  - The iterative merge loop runs driver-side over that dictionary
  *    (`numMerges` passes over ≤ maxVocab symbol arrays — milliseconds
  *    to seconds, independent of corpus size).
  *  - ENCODING is where corpus scale lives, and the iterative
  *    lowest-rank-first merge loop is deliberately NOT run per
  *    occurrence: the corpus's distinct words are encoded once
  *    (vocab-sized input — the one non-codegen scalar function in this
  *    module runs on Heaps-law rows, not corpus rows) and occurrences
  *    get their token arrays back via a vocab-side equi-join that AQE
  *    broadcasts at realistic vocab sizes. Per-document token sequences
  *    are then reassembled positionally with codegen'd array functions.
  *
  * Determinism: ties in pair frequency break lexicographically on the
  * pair, so training is reproducible run-to-run and cluster-to-cluster
  * (no dependence on partitioning or hash order).
  */
object Bpe {
  /** One learned merge rule: at `rank`, adjacent symbol pair
    * (`left`,`right`) — occurring `pairFreq` times, weighted by word
    * frequency — was fused into `merged`. */
  final case class Merge(rank: Int, left: String, right: String,
                         merged: String, pairFreq: Long)

  /** Distributed word-frequency dictionary, capped deterministically:
    * top `maxVocab` by (freq desc, word asc) — plans as
    * TakeOrderedAndProject, so no single-task global sort. */
  def wordDict(docs: DataFrame, textCol: Column, maxVocab: Int): DataFrame =
    // house explode pattern (MinHashLSH.signatures): a plain explode of
    // the DERIVED words() array lets InferFiltersFromGenerate push an
    // inferred size()>0 filter below the projection and re-run the
    // regex split per row; explode_outer over a materialized column +
    // a filter on the GENERATED attribute generates no such filter
    docs.select(TextFunctions.words(textCol).as("__w"))
      .select(explode_outer(col("__w")).as("word"))
      .filter(col("word").isNotNull && length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(maxVocab)

  /** Classic Sennrich-style BPE training over a word-frequency
    * dictionary (driver-side; input is bounded by `maxVocab`). Each
    * iteration counts adjacent symbol pairs weighted by word frequency,
    * fuses the most frequent pair (lexicographic tie-break), and stops
    * early when no adjacent pairs remain. */
  def trainOnDict(wordFreq: Seq[(String, Long)], numMerges: Int): Vector[Merge] = {
    var vocab: Array[(Array[String], Long)] =
      wordFreq.iterator.map { case (w, f) =>
        (w.toCharArray.map(_.toString), f)
      }.toArray
    val out = Vector.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), f) = counts.minBy { case ((a, b), n) => (-n, a, b) }
        out += Merge(rank, l, r, l + r, f)
        vocab = vocab.map { case (syms, fq) => (applyMerge(syms, l, r), fq) }
        rank += 1
      }
    }
    out.result()
  }

  /** Left-to-right non-overlapping fusion of one pair in one word. */
  private def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val b = Array.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += syms(i); i += 1 }
    }
    b.result()
  }

  /** End-to-end training: one shuffle + one bounded collect + the
    * driver loop. The collect is capped at `maxVocab` rows by the plan
    * itself (TakeOrderedAndProject), never corpus-sized. */
  def train(docs: DataFrame, textCol: Column, numMerges: Int,
            maxVocab: Int = 65536): Vector[Merge] = {
    val dict = wordDict(docs, textCol, maxVocab).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    trainOnDict(dict, numMerges)
  }

  /** Encode one word: repeatedly fuse the lowest-rank applicable pair
    * (all its non-overlapping occurrences) until none applies — the
    * standard BPE inference rule, matching training order. Concatenating
    * the result always reproduces the word exactly. Out-of-dictionary
    * words are handled naturally: trained merges apply wherever their
    * pairs occur, and whatever never merged stays as characters. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = word.toCharArray.map(_.toString)
    var done = syms.length < 2
    while (!done) {
      var best = Int.MaxValue; var bl = ""; var br = ""
      var i = 0
      while (i < syms.length - 1) {
        val rk = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < best) { best = rk; bl = syms(i); br = syms(i + 1) }
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        syms = applyMerge(syms, bl, br)
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** The learned merge table as a DataFrame (model-scale: one row per
    * merge rule). */
  def mergesDf(c: graft.Ctx, merges: Seq[Merge]): DataFrame = {
    import c.spark.implicits._
    merges.map(m => (m.rank.toLong, m.left, m.right, m.merged, m.pairFreq))
      .toDF("rank", "left_sym", "right_sym", "merged", "pair_freq")
  }

  /** Token arrays for every distinct word in `wordsDf` (must expose a
    * `word` column). The scalar merge loop runs HERE — on Heaps-law
    * vocab rows, not corpus rows — so the non-codegen function is off
    * the hot path by construction; occurrences join against this. */
  def encodeVocab(wordsDf: DataFrame, merges: Seq[Merge]): DataFrame = {
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    val bc = wordsDf.sparkSession.sparkContext.broadcast(ranks)
    val enc = udf((w: String) =>
      if (w == null) Array.empty[String] else encodeWord(w, bc.value))
    wordsDf.withColumn("tokens", enc(col("word")))
  }

  /** Per-document BPE token sequence: explode words positionally, join
    * the vocab token table (vocab side — AQE broadcasts it at realistic
    * sizes), reassemble in order with codegen'd array ops. Returns
    * (docId, tokens array). */
  def encodeDocs(docs: DataFrame, idCol: Column, textCol: Column,
                 merges: Seq[Merge]): DataFrame = {
    // explode_outer + generated-attribute filter, not plain posexplode
    // of the derived array (see wordDict) — and empty texts keep their
    // doc_id row alive here anyway for the left-outer re-attach below
    val words = docs.select(idCol.as("doc_id"),
        TextFunctions.words(textCol).as("__w"))
      .select(col("doc_id"),
              posexplode_outer(col("__w")).as(Seq("pos", "word")))
      .filter(col("word").isNotNull && length(col("word")) > 0)
    val vocab = encodeVocab(words.select("word").distinct(), merges)
    val encoded = words.join(vocab, Seq("word"))
      .groupBy("doc_id")
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("tokens")))),
        s => s.getField("tokens"))).as("tokens"))
    // row accounting: a doc whose text is empty/whitespace-only has no
    // word rows and would VANISH from the output (an inner-join
    // consumer then silently drops the document) — re-attach every
    // input doc, empty token array for the wordless ones
    docs.select(idCol.as("doc_id")).distinct()
      .join(encoded, Seq("doc_id"), "left_outer")
      .withColumn("tokens",
        coalesce(col("tokens"), array().cast("array<string>")))
  }
}
