package graft

import graft.Queries.{Q, QueryDef}
import graft.functions.CrossEngine._
import graft.multimodal.Multimodal
import graft.similarity.{DimReduce, Similarity}
import graft.text.{Bpe, DedupClusters, MinHashLSH, SimHash, TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.collection.immutable.ListMap

/** Training-data pipeline queries (beyond-reference; SURVEY.md §7.6):
  * dedup family, similarity search, text analysis, multimodal
  * plumbing, sessionization. Oracle twins follow the same determinism
  * rules as [[Queries]]; LSH/IVF internals are not SQL-expressible, so
  * those two run as rows-only checks with ScalaTest coverage instead.
  */
object QueriesText {
  private def q(fn: Ctx => DataFrame, oracle: String = ""): QueryDef =
    QueryDef((s, dir) => fn(Ctx(s, dir)), Some(oracle).filter(_.nonEmpty))

  /** doc_id, source + distinct word set — shared text prep. */
  private def docWords(c: Ctx): DataFrame =
    c.documents.select(col("doc_id"), col("source"),
                       TF.wordSet(col("text")).as("ws"))

  /** Source-blocked exact near-dup pairs, via [[graft.text.PrefixJoin]]
    * with `source` as the blocking column: candidates come from the
    * prefix equi-join on each set's rarest tokens (split per source),
    * then the exact length-ratio prune and single-merge-walk Jaccard
    * verify. Shared by the ngram/cluster/survivor queries so the
    * pruning logic lives in exactly one place.
    *
    * History: this was a per-source self-join with the same prune and
    * verify — correct, and fine at driver scales, but the block count
    * is FIXED, so per-block candidates grew quadratically with the
    * corpus (the round-9 sf1 rehearsal measured 26× for 10× data on
    * q_cluster_sizes). Prefix filtering emits the same exact pairs
    * (dictionary ranks are injective, so rank-set Jaccard IS word-set
    * Jaccard) with ~linear candidates. */
  private def jaccardPairs(c: Ctx, threshold: Double,
                           num: Int, den: Int): DataFrame =
    graft.text.PrefixJoin.joinAll(docWords(c), "doc_id", "ws",
      threshold, num, den, blockCols = Seq("source"))

  private val normSql = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
  private val wsSql   = "list_distinct(regexp_split_to_array(trim(text), '\\s+'))"

  /** DuckDB twin of the FULL Md5Hash-mode MinHashLSH.nearDuplicates
    * pipeline (dictionary → k-plane signature → band buckets →
    * source-blocked bucket join → exact Jaccard ≥ threshold): the
    * token dictionary and band buckets are the first 60 bits of md5,
    * exactly as [[graft.text.MinHashLSH.md5Long]] computes them, and
    * each plane i is the Carter–Wegman family
    * [[graft.text.MinHashLSH.planeHash]] with its (aᵢ,bᵢ,cᵢ) embedded
    * as literals — all exact BIGINT arithmetic, so the twin replays
    * the banding itself: which pairs LSH surfaces is part of the
    * checked contract, not a recall gamble. `from` supplies the doc
    * relation (doc_id, source, + whatever `tokensExpr` reads). */
  private def minhashNeardupSql(from: String, tokensExpr: String,
                                bands: Int, rowsPerBand: Int,
                                threshold: String): String = {
    val k = bands * rowsPerBand
    val r = rowsPerBand
    val planes = (0 until k).map { i =>
      val (a, b, c) = graft.text.MinHashLSH.planeCoeffs(i)
      s"list_min(list_transform(toks, h -> ($a*(h%1073741824) + " +
        s"$b*(h//1073741824) + $c) % 2147483647))"
    }.mkString(",\n      |   ")
    s"""WITH d AS (
      | SELECT doc_id, source,
      |  list_sort(list_transform($tokensExpr,
      |    t -> CAST('0x'||substr(md5(t),1,15) AS BIGINT))) AS toks
      | FROM $from
      |), sig AS (
      | SELECT doc_id, source, toks,
      |  [$planes] AS sig
      | FROM d
      |), bnd AS (
      | SELECT doc_id, source, b,
      |  CAST('0x'||substr(md5(CAST(b AS VARCHAR)||':'||
      |    list_aggregate(list_transform(sig[(b*$r+1):(b*$r+$r)],
      |      v->CAST(v AS VARCHAR)), 'string_agg', ':')),1,15) AS BIGINT) AS bucket
      | FROM sig, unnest(range($bands)) t(b)
      |), cand AS (
      | SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      | FROM bnd a JOIN bnd c ON a.source=c.source AND a.b=c.b
      |   AND a.bucket=c.bucket AND a.doc_id < c.doc_id
      |), j AS (
      | SELECT id_a, id_b,
      |  CAST(len(list_intersect(x.toks, y.toks)) AS DOUBLE)
      |   / (len(x.toks)+len(y.toks)-len(list_intersect(x.toks,y.toks))) AS jac
      | FROM cand JOIN d x ON x.doc_id=id_a JOIN d y ON y.doc_id=id_b
      |)
      |SELECT id_a, id_b, floor(jac*10000+0.5)/10000 AS jaccard
      |FROM j WHERE jac >= $threshold""".stripMargin
  }

  /** locate() with a COLUMN needle (the functions-API overloads only
    * take literal needles): position of `needle` in the constant
    * `hay`, 1-based, 0 if absent — matches DuckDB strpos(hay, c). */
  private def locate_col(needle: Column, hay: String): Column =
    call_function("locate", needle, lit(hay))

  // ── winnowing (k=4-word grams, window w=5) — shared by q_winnow and
  // q_winnow_overlap so the fingerprint definition lives in one place.
  private val WinnowK = 4
  private val WinnowW = 5

  /** doc_id + gram count (full k-grams only: n_words − k + 1, floored
    * at 0 — docs shorter than k words have none). */
  private def winnowBase(c: Ctx): DataFrame =
    c.documents
      .select(col("doc_id"), TF.words(lower(col("text"))).as("__a"))
      .select(col("doc_id"),
              greatest(size(col("__a")).cast("long") - (WinnowK - 1), lit(0L))
                .as("n_grams"))

  /** Distinct selected fingerprints per doc: `sel` = 32-char gram md5
    * followed by the zero-padded REVERSED gram position, so the plain
    * windowed min() realizes min-hash-then-rightmost-position in one
    * lexicographic compare. Two window passes (gram lag, winnow min)
    * share the (doc_id, pos) partitioning+sort — one shuffle total. */
  private def winnowSelected(c: Ctx): DataFrame = {
    val pos = c.documents
      .select(col("doc_id"),
              posexplode_outer(TF.words(lower(col("text"))))
                .as(Seq("pos", "word")))
      .filter(col("word").isNotNull)
    val wOrd = Window.partitionBy("doc_id").orderBy("pos")
    val gram = concat_ws(" ",
      lag(col("word"), 3).over(wOrd), lag(col("word"), 2).over(wOrd),
      lag(col("word"), 1).over(wOrd), col("word"))
    pos
      .withColumn("h", md5(gram.cast("binary")))
      .filter(col("pos") >= WinnowK - 1)
      .withColumn("g", col("pos") - (WinnowK - 1))
      .withColumn("key", concat(col("h"),
        lpad((lit(999999999) - col("g")).cast("string"), 9, "0")))
      .withColumn("sel",
        min(col("key")).over(wOrd.rowsBetween(-(WinnowW - 1), 0)))
      .filter(col("g") >= WinnowW - 1)
      .select(col("doc_id"), col("sel"))
      .distinct()
  }

  /** DuckDB twin of [[winnowSelected]] (CTEs `wd` → `sl`), spliced
    * into both winnow oracles. */
  private val winnowSelSql: String =
    """wd AS (
      | SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS a
      | FROM documents
      |), p AS (
      | SELECT doc_id, i - 1 AS pos, a[i] AS word
      | FROM wd, unnest(generate_series(1, len(a))) AS t(i)
      |), gh AS (
      | SELECT doc_id, pos,
      |  md5(concat_ws(' ', lag(word, 3) OVER win, lag(word, 2) OVER win,
      |                lag(word, 1) OVER win, word)) AS h
      | FROM p WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      |), ky AS (
      | SELECT doc_id, pos - 3 AS g,
      |  h || lpad(CAST(999999999 - (pos - 3) AS VARCHAR), 9, '0') AS key
      | FROM gh WHERE pos >= 3
      |), sl AS (
      | SELECT DISTINCT doc_id, sel FROM (
      |  SELECT doc_id, g,
      |   min(key) OVER (PARTITION BY doc_id ORDER BY g
      |                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS sel
      |  FROM ky)
      | WHERE g >= 4
      |)""".stripMargin

  val defs: ListMap[String, QueryDef] = ListMap(

    // ── exact dedup + fingerprinting ──────────────────────────────────
    "q_dedup_exact" -> q(
      c => c.documents
        .groupBy(TF.fingerprint(col("text")).as("fp"))
        .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies")),
      s"""SELECT md5($normSql) AS fp, min(doc_id) AS doc_id,
        | count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin),

    "q_fingerprint" -> q(
      c => c.documents.select(
        col("doc_id"),
        TF.fingerprint(col("text")).as("fp"),
        sha2(col("text").cast("binary"), 256).as("sha"),
        length(col("text")).cast("long").as("text_len")),
      s"""SELECT doc_id, md5($normSql) AS fp, sha256(text) AS sha,
        | CAST(length(text) AS BIGINT) AS text_len
        |FROM documents""".stripMargin),

    // ── text quality / language id / token counting ───────────────────
    "q_text_quality" -> q(
      c => c.documents
        // one regex split shared by n_words and n_stop (same
        // project-boundary reasoning as q_lang_id)
        .withColumn("__w", TF.words(col("text")))
        .withColumn("n_words", size(col("__w")).cast("long"))
        .withColumn("n_nospace",
          length(regexp_replace(col("text"), "\\s", "")).cast("long"))
        .withColumn("n_punct",
          regexp_count(col("text"), lit("[^a-z0-9\\s]")).cast("long"))
        .withColumn("n_stop",
          TF.markerScore(col("__w"), Seq("the", "a", "of", "and", "is")))
        .withColumn("avg_word_len",
          rnd4(col("n_nospace").cast("double") / col("n_words")))
        .withColumn("punct_ratio",
          rnd4(col("n_punct").cast("double") / col("n_chars")))
        .withColumn("stop_ratio",
          rnd4(col("n_stop").cast("double") / col("n_words")))
        .withColumn("quality_score",
          rnd4(least(lit(1.0), col("n_words") / lit(100.0)) * 0.5 +
               col("stop_ratio") * 0.3 + (lit(1.0) - col("punct_ratio")) * 0.2))
        .select("doc_id", "n_words", "avg_word_len", "punct_ratio",
                "stop_ratio", "quality_score"),
      """WITH m AS (
        | SELECT doc_id, n_chars,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words,
        |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS n_nospace,
        |  CAST(len(regexp_extract_all(text, '[^a-z0-9\s]')) AS BIGINT) AS n_punct,
        |  CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |       w -> w IN ('the','a','of','and','is'))) AS BIGINT) AS n_stop
        | FROM documents
        |), r AS (
        | SELECT doc_id, n_words,
        |  floor(CAST(n_nospace AS DOUBLE) / n_words * 10000 + 0.5) / 10000 AS avg_word_len,
        |  floor(CAST(n_punct AS DOUBLE) / n_chars * 10000 + 0.5) / 10000 AS punct_ratio,
        |  floor(CAST(n_stop AS DOUBLE) / n_words * 10000 + 0.5) / 10000 AS stop_ratio
        | FROM m
        |)
        |SELECT doc_id, n_words, avg_word_len, punct_ratio, stop_ratio,
        | floor((least(1.0, n_words / 100.0) * 0.5 + stop_ratio * 0.3 +
        |        (1.0 - punct_ratio) * 0.2) * 10000 + 0.5) / 10000 AS quality_score
        |FROM r""".stripMargin),

    // C4/Gopher-style corpus filter: hard keep/drop verdict plus the
    // machine-readable reject reasons a curation pipeline logs. One
    // narrow scan + codegen'd per-row exprs — no shuffle at all.
    "q_quality_gate" -> q(
      c => {
        val m = c.documents
          .withColumn("__w", TF.words(col("text")))
          .withColumn("n_words", size(col("__w")).cast("long"))
          .withColumn("n_nospace",
            length(regexp_replace(col("text"), "\\s", "")).cast("long"))
          .withColumn("n_stop",
            TF.markerScore(col("__w"), Seq("the", "a", "of", "and", "is")))
          .withColumn("avg_word_len",
            col("n_nospace").cast("double") / col("n_words"))
          .withColumn("stop_ratio",
            col("n_stop").cast("double") / col("n_words"))
        val passWords = col("n_words") >= 30
        val passStop  = col("stop_ratio") >= 0.02
        val passLen   = col("avg_word_len") >= 3.0 && col("avg_word_len") <= 5.0
        // concat_ws skips the nulls of un-fired when()s in BOTH engines,
        // so reasons is "" for kept docs and ';'-joined rule ids otherwise
        m.withColumn("keep", passWords && passStop && passLen)
          .withColumn("reasons", concat_ws(";",
            when(!passWords, "min_words"),
            when(!passStop, "stopword_ratio"),
            when(!passLen, "word_length")))
          .select(col("doc_id"), col("keep"), col("reasons"))
      },
      """WITH m AS (
        | SELECT doc_id,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words,
        |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS n_nospace,
        |  CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |       w -> w IN ('the','a','of','and','is'))) AS BIGINT) AS n_stop
        | FROM documents
        |), r AS (
        | SELECT doc_id,
        |  n_words >= 30 AS pw,
        |  CAST(n_stop AS DOUBLE) / n_words >= 0.02 AS ps,
        |  CAST(n_nospace AS DOUBLE) / n_words BETWEEN 3.0 AND 5.0 AS pl
        | FROM m
        |)
        |SELECT doc_id, (pw AND ps AND pl) AS keep,
        | concat_ws(';', CASE WHEN NOT pw THEN 'min_words' END,
        |                CASE WHEN NOT ps THEN 'stopword_ratio' END,
        |                CASE WHEN NOT pl THEN 'word_length' END) AS reasons
        |FROM r""".stripMargin),

    // Gopher repetition rule: the share of a doc's most frequent
    // bigram. Scales as explode → two-level agg (per-(doc,bigram)
    // partial counts combine map-side; the per-doc rollup moves one
    // row per distinct bigram, never the token stream).
    "q_repetition_filter" -> q(
      c => {
        // __w and __bg materialized behind project boundaries: inlining
        // words() into shingles() re-evaluates the regex split per
        // element, and explode must target the materialized attribute
        // (explode_outer + isNotNull — the generate-pushdown trap)
        val exploded = c.documents
          .withColumn("__w", TF.words(col("text")))
          .withColumn("__bg", TF.shingles(col("__w"), 2))
          .select(col("doc_id"), explode_outer(col("__bg")).as("bigram"))
          .filter(col("bigram").isNotNull)
        exploded.groupBy("doc_id", "bigram").agg(count(lit(1)).as("n"))
          .groupBy("doc_id")
          .agg(sum("n").as("n_bigrams"), max("n").as("top_n"))
          .withColumn("top_share",
            rnd4(col("top_n").cast("double") / col("n_bigrams")))
          .withColumn("keep", col("top_share") <= 0.1)
          .select("doc_id", "n_bigrams", "top_n", "top_share", "keep")
      },
      """WITH w AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a FROM documents
        |), g AS (
        | SELECT doc_id, a[i] || ' ' || a[i + 1] AS bigram
        | FROM w, unnest(generate_series(1, len(a) - 1)) AS t(i)
        |), pb AS (
        | SELECT doc_id, bigram, count(*) AS n FROM g GROUP BY 1, 2
        |), d AS (
        | SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams,
        |  CAST(max(n) AS BIGINT) AS top_n
        | FROM pb GROUP BY 1
        |)
        |SELECT doc_id, n_bigrams, top_n, top_share, top_share <= 0.1 AS keep
        |FROM (SELECT *, floor(CAST(top_n AS DOUBLE) / n_bigrams * 10000 + 0.5)
        |        / 10000 AS top_share FROM d)""".stripMargin),

    // Concat-and-chunk sequence packing (the standard LLM pretraining
    // batch layout): deterministic doc order per source, running token
    // count, pack = exclusive-prefix-sum div budget. The window
    // partitions by source — the packing unit — so state never exceeds
    // one running long per partition; the rollup is map-side combinable.
    "q_doc_pack" -> q(
      c => {
        val d = c.documents.select(col("doc_id"), col("source"),
          TF.wsTokenCount(col("text")).as("n_tokens"))
        val w = Window.partitionBy("source").orderBy("doc_id")
        d.withColumn("cum", sum("n_tokens").over(w))
          .withColumn("pack_id",
            floor((col("cum") - col("n_tokens")) / lit(2048.0)).cast("long"))
          .groupBy(col("source"), col("pack_id"))
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("pack_tokens"))
      },
      """WITH d AS (
        | SELECT doc_id, source,
        |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
        | FROM documents
        |), s AS (
        | SELECT source, n_tokens,
        |  sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |       ROWS UNBOUNDED PRECEDING) AS cum
        | FROM d
        |)
        |SELECT source, CAST(floor((cum - n_tokens) / 2048.0) AS BIGINT) AS pack_id,
        | count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
        |FROM s GROUP BY 1, 2""".stripMargin),

    // PII redaction. The corpus is synthetic word soup with no natural
    // PII, so the demo PLANTS deterministic doc_id-derived emails/phones
    // first; what's under test — identically in the oracle — is the
    // redaction pass itself: match counts plus an md5 over the fully
    // scrubbed text (full-content equality, not a spot check).
    "q_pii_scrub" -> q(
      c => {
        val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
        val phoneRe = "\\b[0-9]{3}-[0-9]{4}\\b"
        val planted = concat(col("text"),
          when(col("doc_id") % 3 =!= 0,
            concat(lit(" reach user"), col("doc_id").cast("string"),
                   lit("@example-mail.com"))).otherwise(lit("")),
          when(col("doc_id") % 2 === 0,
            concat(lit(" call 555-"),
                   lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit("")))
        c.documents.select(col("doc_id"), planted.as("t"))
          .withColumn("n_emails", regexp_count(col("t"), lit(emailRe)).cast("long"))
          .withColumn("n_phones", regexp_count(col("t"), lit(phoneRe)).cast("long"))
          .withColumn("scrub_md5", md5(
            regexp_replace(regexp_replace(col("t"), emailRe, "<EMAIL>"),
                           phoneRe, "<PHONE>").cast("binary")))
          .select("doc_id", "n_emails", "n_phones", "scrub_md5")
      },
      """WITH p AS (
        | SELECT doc_id, text ||
        |  CASE WHEN doc_id % 3 <> 0 THEN ' reach user' || CAST(doc_id AS VARCHAR)
        |       || '@example-mail.com' ELSE '' END ||
        |  CASE WHEN doc_id % 2 = 0 THEN ' call 555-'
        |       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END AS t
        | FROM documents
        |)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        | CAST(len(regexp_extract_all(t, '\b[0-9]{3}-[0-9]{4}\b')) AS BIGINT) AS n_phones,
        | md5(regexp_replace(regexp_replace(t,
        |   '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |   '\b[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g')) AS scrub_md5
        |FROM p""".stripMargin),

    // Benchmark decontamination (the GPT-3-style n-gram overlap check):
    // flag training docs sharing shingles with a held-out eval set
    // (here: doc_id % 97 — a benchmark suite is tiny, so its distinct
    // shingle set broadcasts; were the eval side ever corpus-sized the
    // join would simply shuffle on the shingle key instead).
    "q_decontaminate" -> q(
      c => {
        val sh = c.documents
          .withColumn("__w", TF.words(col("text")))
          .withColumn("__sh", array_distinct(TF.shingles(col("__w"), 3)))
          .select(col("doc_id"), explode_outer(col("__sh")).as("sh"))
          .filter(col("sh").isNotNull)
        val evalSh = sh.filter(col("doc_id") % 97 === 0).select("sh").distinct()
        sh.filter(col("doc_id") % 97 =!= 0)
          .join(broadcast(evalSh), Seq("sh"))
          .groupBy(col("doc_id"))
          // per-doc shingles are already distinct -> plain count is the
          // distinct shared-shingle count, no second distinct pass
          .agg(count(lit(1)).as("n_shared"))
          .withColumn("contaminated", col("n_shared") >= 2)
      },
      """WITH w AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a FROM documents
        |), g AS (
        | SELECT DISTINCT doc_id, a[i] || ' ' || a[i + 1] || ' ' || a[i + 2] AS sh
        | FROM w, unnest(generate_series(1, len(a) - 2)) AS t(i)
        |), e AS (SELECT DISTINCT sh FROM g WHERE doc_id % 97 = 0)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared,
        | count(*) >= 2 AS contaminated
        |FROM g WHERE doc_id % 97 <> 0 AND sh IN (SELECT sh FROM e)
        |GROUP BY 1""".stripMargin),

    // Training-mix allocation: split a 1M-token epoch budget across
    // sources proportionally to their token mass, integer-exact via the
    // largest-remainder method. The only window runs over one row per
    // SOURCE (not per doc/token) — mix tables are dozens of rows at any
    // corpus scale; the data-sized pass is the one groupBy(source).
    // (The double products stay exact below 2^53 token-units; a real
    // 100 TB run would lift the multiply to DECIMAL(38,0).)
    "q_domain_mix" -> q(
      c => {
        val tok = c.documents.groupBy(col("source"))
          .agg(sum(TF.wsTokenCount(col("text"))).as("toks"))
        graft.operators.Allocation
          .largestRemainder(tok, "source", "toks", budget = 1000000L)
          .withColumn("oversample",
            rnd4(col("alloc").cast("double") / col("toks")))
          .select("source", "toks", "alloc", "oversample")
      },
      """WITH tok AS (
        | SELECT source,
        |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS toks
        | FROM documents GROUP BY 1
        |), t AS (SELECT *, sum(toks) OVER () AS total FROM tok),
        |f AS (
        | SELECT source, toks,
        |  CAST(floor(toks * 1000000.0 / total) AS BIGINT) AS floor_alloc,
        |  toks * 1000000.0 / total - floor(toks * 1000000.0 / total) AS frac
        | FROM t
        |), r AS (
        | SELECT *, CAST(row_number() OVER (ORDER BY frac DESC, source) AS BIGINT) AS rk,
        |  sum(floor_alloc) OVER () AS fsum
        | FROM f
        |)
        |SELECT source, toks,
        | CAST(floor_alloc + CASE WHEN rk <= 1000000 - fsum THEN 1 ELSE 0 END AS BIGINT) AS alloc,
        | floor(CAST(floor_alloc + CASE WHEN rk <= 1000000 - fsum THEN 1 ELSE 0 END AS DOUBLE)
        |   / toks * 10000 + 0.5) / 10000 AS oversample
        |FROM r""".stripMargin),

    // ── temperature-scaled mix (the multilingual up-sampling trick:
    // allocate by weight^α so low-resource sources get a larger share
    // than proportional). α = 0.5 via sqrt — correctly rounded IEEE in
    // every engine, unlike pow(x, α) which is libm-dependent; the
    // sqrt weight is then QUANTIZED to integer units so the weight
    // total is an exact long sum (a raw double sum is partial-order-
    // dependent and would make the remainder ranking flaky). Same
    // largest-remainder operator and scale shape as q_domain_mix. ────
    "q_temperature_mix" -> q(
      c => {
        val tok = c.documents.groupBy(col("source"))
          .agg(sum(TF.wsTokenCount(col("text"))).as("toks"))
          .withColumn("w",
            floor(sqrt(col("toks").cast("double")) * 10000 + 0.5).cast("long"))
        graft.operators.Allocation
          .largestRemainder(tok, "source", "w", budget = 1000000L)
          .withColumn("oversample",
            rnd4(col("alloc").cast("double") / col("toks")))
          .select("source", "toks", "alloc", "oversample")
      },
      """WITH tok AS (
        | SELECT source,
        |  CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS toks
        | FROM documents GROUP BY 1
        |), wt AS (
        | SELECT source, toks,
        |  CAST(floor(sqrt(CAST(toks AS DOUBLE)) * 10000 + 0.5) AS BIGINT) AS w
        | FROM tok
        |), t AS (SELECT *, sum(w) OVER () AS total FROM wt),
        |f AS (
        | SELECT source, toks, w,
        |  CAST(floor(w * 1000000.0 / total) AS BIGINT) AS floor_alloc,
        |  w * 1000000.0 / total - floor(w * 1000000.0 / total) AS frac
        | FROM t
        |), r AS (
        | SELECT *, CAST(row_number() OVER (ORDER BY frac DESC, source) AS BIGINT) AS rk,
        |  sum(floor_alloc) OVER () AS fsum
        | FROM f
        |)
        |SELECT source, toks,
        | CAST(floor_alloc + CASE WHEN rk <= 1000000 - fsum THEN 1 ELSE 0 END AS BIGINT) AS alloc,
        | floor(CAST(floor_alloc + CASE WHEN rk <= 1000000 - fsum THEN 1 ELSE 0 END AS DOUBLE)
        |   / toks * 10000 + 0.5) / 10000 AS oversample
        |FROM r""".stripMargin),

    "q_lang_id" -> q(
      c => {
        // Split the text ONCE into a lower projection and score the
        // materialized array 4×. Building TF.words(text) inline per
        // score would evaluate the regex split 4× per row (the split is
        // the dominant cost); CollapseProject keeps this boundary
        // because the producer expression is non-cheap and referenced
        // more than once.
        val tokenized = c.documents.select(
          col("doc_id"), col("lang"), TF.words(col("text")).as("w"))
        val scored = tokenized.select(
          col("doc_id"), col("lang"),
          TF.markerScore(col("w"), TF.LangMarkers(0)._2).as("en_score"),
          TF.markerScore(col("w"), TF.LangMarkers(1)._2).as("de_score"),
          TF.markerScore(col("w"), TF.LangMarkers(2)._2).as("es_score"),
          TF.markerScore(col("w"), TF.LangMarkers(3)._2).as("fr_score"))
        scored
          .withColumn("pred_lang", TF.predictLang(
            col("en_score"), col("de_score"), col("es_score"), col("fr_score")))
          .withColumn("is_match", col("pred_lang") === col("lang"))
          .select("doc_id", "lang", "en_score", "de_score", "es_score",
                  "fr_score", "pred_lang", "is_match")
      },
      """WITH s AS (
        | SELECT doc_id, lang,
        |  CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |       w -> w IN ('the','a','of','and','is'))) AS BIGINT) AS en_score,
        |  CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |       w -> w IN ('der','die','das','und','ist'))) AS BIGINT) AS de_score,
        |  CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |       w -> w IN ('el','la','los','y','es'))) AS BIGINT) AS es_score,
        |  CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |       w -> w IN ('le','les','du','et','est'))) AS BIGINT) AS fr_score
        | FROM documents
        |)
        |SELECT doc_id, lang, en_score, de_score, es_score, fr_score,
        | CASE
        |  WHEN en_score >= de_score AND en_score >= es_score AND en_score >= fr_score AND en_score > 0 THEN 'en'
        |  WHEN de_score >= es_score AND de_score >= fr_score AND de_score > 0 THEN 'de'
        |  WHEN es_score >= fr_score AND es_score > 0 THEN 'es'
        |  WHEN fr_score > 0 THEN 'fr'
        |  ELSE 'und' END AS pred_lang,
        | (CASE
        |  WHEN en_score >= de_score AND en_score >= es_score AND en_score >= fr_score AND en_score > 0 THEN 'en'
        |  WHEN de_score >= es_score AND de_score >= fr_score AND de_score > 0 THEN 'de'
        |  WHEN es_score >= fr_score AND es_score > 0 THEN 'es'
        |  WHEN fr_score > 0 THEN 'fr'
        |  ELSE 'und' END) = lang AS is_match
        |FROM s""".stripMargin),

    "q_token_count" -> q(
      c => c.documents
        .withColumn("ws_tokens", TF.wsTokenCount(col("text")))
        .withColumn("bpe_tokens", TF.bpeTokenCount(col("text")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
             sum("ws_tokens").as("total_ws_tokens"),
             sum("bpe_tokens").as("total_bpe_tokens"),
             rnd4(avg("ws_tokens")).as("avg_ws_tokens")),
      s"""SELECT lang, count(*) AS n_docs,
        | CAST(sum(wt) AS BIGINT) AS total_ws_tokens,
        | CAST(sum(bt) AS BIGINT) AS total_bpe_tokens,
        | floor(avg(wt) * 10000 + 0.5) / 10000 AS avg_ws_tokens
        |FROM (SELECT lang,
        |  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS wt,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9\\s]')) AS BIGINT) AS bt
        | FROM documents) GROUP BY 1""".stripMargin),

    // trained subword tokenizer: BPE merge rules learned from the
    // corpus's word-frequency dictionary (one shuffle + a capped
    // collect + a driver loop — the SentencePiece convention; scale
    // argument in text/Bpe.scala). Iterative training is not
    // SQL-expressible → rows-only; BpeSpec pins a hand-computed golden
    // merge sequence, run-to-run determinism, and the encode
    // round-trip property (concat(tokens) == word for every vocab word).
    "q_bpe_merges" -> q(
      c => Bpe.mergesDf(c, Bpe.train(c.documents, col("text"), numMerges = 48))),

    // q_bpe_merges' BpeSpec invariant pins lifted into the driver
    // gate: training is reproducible run-to-run, ranks are dense,
    // every rule is well-formed with positive selection frequency,
    // and the corpus vocabulary supports the full requested merge
    // depth. The merge table is driver-side model-scale by contract,
    // so the flags are computed locally (the training itself still
    // runs its distributed word-frequency pass per train call).
    "q_bpe_merges_check" -> q(
      c => {
        val m1 = Bpe.train(c.documents, col("text"), numMerges = 48)
        val m2 = Bpe.train(c.documents, col("text"), numMerges = 48)
        Checks.fromLocal(c.spark,
          "bpe_deterministic" -> (m1 == m2),
          "bpe_ranks_dense" -> (m1.map(_.rank) == m1.indices.toVector),
          "bpe_freq_positive" -> m1.forall(_.pairFreq >= 1),
          "bpe_wellformed" -> m1.forall(m =>
            m.merged == m.left + m.right &&
            m.left.nonEmpty && m.right.nonEmpty),
          "bpe_full_depth" -> (m1.length == 48))
      },
      Checks.oracle("bpe_deterministic", "bpe_ranks_dense",
                    "bpe_freq_positive", "bpe_wellformed",
                    "bpe_full_depth")),

    // the corpus encoded with the trained tokenizer: the iterative
    // merge loop runs once per DISTINCT word (Heaps-law vocab rows),
    // occurrences get token arrays back via a vocab-side equi-join,
    // and per-doc sequences reassemble positionally — corpus-side work
    // is all codegen'd array ops. Rows-only for the same reason as
    // q_bpe_merges (output depends on the trained merges).
    "q_bpe_encode" -> q(
      c => {
        val merges = Bpe.train(c.documents, col("text"), numMerges = 48)
        val enc = Bpe.encodeDocs(c.documents, col("doc_id"), col("text"), merges)
        c.documents.select(col("doc_id"), col("lang")).join(enc, Seq("doc_id"))
          .withColumn("n_tokens", size(col("tokens")).cast("long"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
               sum("n_tokens").as("total_bpe_tokens"),
               rnd4(avg("n_tokens")).as("avg_tokens_per_doc"))
          .orderBy(col("lang"))
      }),

    // q_bpe_encode's BpeSpec round-trip pin lifted into the driver
    // gate, DISTRIBUTED over the whole corpus (the spec checks the
    // sf0.001 vocab driver-side): concatenating every document's BPE
    // tokens must reproduce its concatenated words exactly, every
    // input doc must survive encoding (row parity — the empty-text
    // re-attach), and the trained merges must actually compress.
    "q_bpe_encode_check" -> q(
      c => {
        val merges = Bpe.train(c.documents, col("text"), numMerges = 48)
        val enc = Bpe.encodeDocs(c.documents, col("doc_id"), col("text"),
                                 merges)
        val joined = c.documents
          .select(col("doc_id"),
            array_join(filter(TF.words(col("text")),
                              w => length(w) > 0), "").as("orig"))
          .join(enc, Seq("doc_id"))
        val stats = joined.agg(
            count(lit(1)).as("n"),
            sum(when(array_join(col("tokens"), "") === col("orig"), 0L)
                  .otherwise(1L)).as("n_bad"),
            sum(size(col("tokens")).cast("long")).as("n_tok"),
            sum(length(col("orig")).cast("long")).as("n_chr"))
          .crossJoin(c.documents.agg(count(lit(1)).as("n_docs")))
        Checks.fromFlags(stats,
          "bpe_roundtrip_all_docs" -> (col("n_bad") === 0L),
          "bpe_doc_parity" -> (col("n") === col("n_docs")),
          "bpe_compressive" -> (col("n_tok") < col("n_chr")))
      },
      Checks.oracle("bpe_roundtrip_all_docs", "bpe_doc_parity",
                    "bpe_compressive")),

    // ONE BPE training step under a hash-matched oracle (the
    // q_minhash_replay convention applied to tokenizer training): the
    // first merge iteration of [[graft.text.Bpe.train]] — word
    // frequencies over ALL occurrences (same TextFunctions.words
    // basis), adjacent CHARACTER pairs per distinct word weighted by
    // word frequency, and the argmax pair under the production
    // (freq desc, pair asc) tie-break — is plain relational algebra,
    // so DuckDB replays it exactly. The full iterative loop stays
    // rows-only (q_bpe_merges golden-pinned); this pins the per-step
    // mechanism those iterations repeat. The row_number window ranks
    // the PAIR table (vocab-bigram-sized), never the corpus.
    "q_bpe_step_replay" -> q(
      c => {
        val wf = c.documents
          .select(explode(TF.words(col("text"))).as("w"))
          .filter(col("w") =!= "")
          .groupBy("w").agg(count(lit(1)).as("freq"))
        val pairs = wf.filter(length(col("w")) >= 2)
          .select(col("freq"),
                  explode(sequence(lit(1), length(col("w")) - 1)).as("i"),
                  col("w"))
          .select(col("w").substr(col("i"), lit(2)).as("pair"), col("freq"))
          .groupBy("pair").agg(sum("freq").as("pair_freq"))
        val byFreq = Window.orderBy(col("pair_freq").desc, col("pair"))
        pairs.select(col("pair"), col("pair_freq"),
                     when(row_number().over(byFreq) === 1, 1L).otherwise(0L)
                       .as("is_merge"))
      },
      """WITH wf AS (
        | SELECT w, count(*) AS freq
        | FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |       FROM documents)
        | WHERE w <> '' GROUP BY 1
        |), pos AS (
        | SELECT w, freq, unnest(range(1, length(w))) AS i
        | FROM wf WHERE length(w) >= 2
        |), pairs AS (
        | SELECT substr(w, CAST(i AS INT), 2) AS pair,
        |        CAST(sum(freq) AS BIGINT) AS pair_freq
        | FROM pos GROUP BY 1
        |)
        |SELECT pair, pair_freq,
        | CAST(CASE WHEN row_number() OVER (ORDER BY pair_freq DESC, pair) = 1
        |      THEN 1 ELSE 0 END AS BIGINT) AS is_merge
        |FROM pairs""".stripMargin),

    // TWO chained BPE training steps (r8 verdict ask #6): step 1 picks
    // the winning char pair; step 2 must count pairs over the MERGED
    // symbol sequences — the iteration-to-iteration handoff where
    // state-threading bugs live. Applying a first-round (char,char)
    // merge left-to-right non-overlapping is exactly string replace()
    // semantics in both engines, with a \u0001 sentinel standing in
    // for the fused symbol (corpus is alnum — no collision); step-2
    // pair identities re-expand the sentinel, and the argmax uses the
    // production (freq desc, LEFT asc, RIGHT asc) tuple order — which
    // differs from concat order once symbols are multi-char. BpeSpec
    // pins this query's two winners against Bpe.trainOnDict on the
    // same corpus, tying the replay to the production trainer.
    "q_bpe_step2_replay" -> q(
      c => {
        val S = "\u0001"
        val wf = c.documents
          .select(explode(TF.words(col("text"))).as("w"))
          .filter(col("w") =!= "")
          .groupBy("w").agg(count(lit(1)).as("freq"))
          .localCheckpoint() // feeds step-1 pairs AND step-2 re-count
        val pairs1 = wf.filter(length(col("w")) >= 2)
          .select(col("freq"),
                  explode(sequence(lit(1), length(col("w")) - 1)).as("i"),
                  col("w"))
          .select(col("w").substr(col("i"), lit(2)).as("pair"), col("freq"))
          .groupBy("pair").agg(sum("freq").as("pair_freq"))
        // single-char symbols: (l,r) tuple order == 2-char concat order
        val m1 = pairs1.orderBy(col("pair_freq").desc, col("pair")).limit(1)
          .select(col("pair").as("m1"))
        val w2 = wf.crossJoin(broadcast(m1))
          .select(replace(col("w"), col("m1"), lit(S)).as("w2"),
                  col("freq"), col("m1"))
        def sym(ch: Column) = when(ch === S, col("m1")).otherwise(ch)
        val pairs2 = w2.filter(length(col("w2")) >= 2)
          .select(col("freq"), col("m1"),
                  explode(sequence(lit(1), length(col("w2")) - 1)).as("i"),
                  col("w2"))
          .select(sym(col("w2").substr(col("i"), lit(1))).as("left_sym"),
                  sym(col("w2").substr(col("i") + 1, lit(1))).as("right_sym"),
                  col("freq"))
          .groupBy("left_sym", "right_sym").agg(sum("freq").as("pair_freq"))
        val byFreq = Window.orderBy(col("pair_freq").desc,
                                    col("left_sym"), col("right_sym"))
        pairs2.select(col("left_sym"), col("right_sym"), col("pair_freq"),
                      when(row_number().over(byFreq) === 1, 1L).otherwise(0L)
                        .as("is_merge"))
      },
      """WITH wf AS (
        | SELECT w, count(*) AS freq
        | FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        |       FROM documents)
        | WHERE w <> '' GROUP BY 1
        |), p1 AS (
        | SELECT substr(w, CAST(i AS INT), 2) AS pair,
        |        CAST(sum(freq) AS BIGINT) AS pair_freq
        | FROM (SELECT w, freq, unnest(range(1, length(w))) AS i
        |       FROM wf WHERE length(w) >= 2)
        | GROUP BY 1
        |), m1 AS (
        | SELECT pair AS m1 FROM p1 ORDER BY pair_freq DESC, pair LIMIT 1
        |), w2 AS (
        | SELECT replace(w, (SELECT m1 FROM m1), chr(1)) AS w2, freq,
        |        (SELECT m1 FROM m1) AS m1
        | FROM wf
        |), pos AS (
        | SELECT w2, freq, m1, unnest(range(1, length(w2))) AS i
        | FROM w2 WHERE length(w2) >= 2
        |), p2 AS (
        | SELECT
        |  CASE WHEN substr(w2, CAST(i AS INT), 1) = chr(1) THEN m1
        |       ELSE substr(w2, CAST(i AS INT), 1) END AS left_sym,
        |  CASE WHEN substr(w2, CAST(i AS INT) + 1, 1) = chr(1) THEN m1
        |       ELSE substr(w2, CAST(i AS INT) + 1, 1) END AS right_sym,
        |  CAST(sum(freq) AS BIGINT) AS pair_freq
        | FROM pos GROUP BY 1, 2
        |)
        |SELECT left_sym, right_sym, pair_freq,
        | CAST(CASE WHEN row_number() OVER
        |   (ORDER BY pair_freq DESC, left_sym, right_sym) = 1
        |  THEN 1 ELSE 0 END AS BIGINT) AS is_merge
        |FROM p2""".stripMargin),

    // document segmentation: sentence boundaries on [.!?]+ runs —
    // the pre-tokenization step of a text pipeline
    "q_sentence_stats" -> q(
      c => c.documents
        .withColumn("sentences",
          filter(transform(split(col("text"), "[.!?]+"), trim(_)),
                 s => length(s) > 0))
        .select(col("doc_id"),
                size(col("sentences")).cast("long").as("n_sentences"),
                rnd4(expr("aggregate(sentences, 0L, (a, s) -> a + length(s))")
                  .cast("double") / size(col("sentences"))).as("avg_sentence_chars")),
      """WITH s AS (
        | SELECT doc_id,
        |  list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
        |              x -> trim(x)), x -> length(x) > 0) AS sentences
        | FROM documents
        |)
        |SELECT doc_id, CAST(len(sentences) AS BIGINT) AS n_sentences,
        | floor(CAST(list_sum(list_transform(sentences, x -> length(x))) AS DOUBLE)
        |   / len(sentences) * 10000 + 0.5) / 10000 AS avg_sentence_chars
        |FROM s""".stripMargin),

    // array-function surface over token arrays (union/intersect/except/
    // slice), emitted as joined strings — array VALUES deserialize
    // differently per engine, strings hash identically. The oracle wraps
    // array_to_string in coalesce: DuckDB yields NULL for an empty list
    // where Spark's array_join yields '' (bit at sf1, where ~half the
    // sampled docs carry no stopword).
    "q_array_funcs" -> q(
      c => {
        val docs = c.documents.filter(col("doc_id") % 25 === 0)
        val w = TF.wordSet(col("text"))
        val first5 = slice(array_sort(w), 1, 5)
        val stop = array(lit("the"), lit("a"), lit("of"), lit("and"), lit("is"))
        docs.select(
          col("doc_id"),
          array_join(first5, ",").as("first5_words"),
          array_join(array_sort(array_intersect(w, stop)), ",").as("stopwords_present"),
          size(array_except(w, stop)).cast("long").as("n_content_words"),
          size(array_union(w, stop)).cast("long").as("n_union"))
      },
      """WITH d AS (
        | SELECT doc_id,
        |  list_distinct(regexp_split_to_array(trim(text), '\s+')) AS w,
        |  ['the','a','of','and','is'] AS stop
        | FROM documents WHERE doc_id % 25 = 0
        |)
        |SELECT doc_id,
        | coalesce(array_to_string(list_sort(w)[1:5], ','), '') AS first5_words,
        | coalesce(array_to_string(list_sort(list_intersect(w, stop)), ','), '')
        |   AS stopwords_present,
        | CAST(len(list_filter(w, x -> NOT list_contains(stop, x))) AS BIGINT) AS n_content_words,
        | CAST(len(list_distinct(list_concat(w, stop))) AS BIGINT) AS n_union
        |FROM d""".stripMargin),

    // ── set-similarity dedup family ───────────────────────────────────
    "q_ngram_jaccard" -> q(
      c => jaccardPairs(c, threshold = 0.8, num = 4, den = 5)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
                rnd4(col("jaccard")).as("jaccard")),
      s"""WITH d AS (SELECT doc_id, source, $wsSql AS ws FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        | floor(CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
        |   / len(list_distinct(list_concat(a.ws, b.ws))) * 10000 + 0.5) / 10000 AS jaccard
        |FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
        |   / len(list_distinct(list_concat(a.ws, b.ws))) >= 0.8""".stripMargin),

    // ── EXACT all-pairs similarity join via prefix filtering, in
    // canonical df-ascending PPJoin order (see [[text.PrefixJoin]]).
    // Unlike q_ngram_jaccard's source-blocked quadratic twin, this is
    // exact over ALL pairs with no blocking key and no quadratic step:
    // candidates come from an equi-join on each set's RAREST tokens,
    // so bucket sizes stay bounded on zipfian corpora. On THIS corpus
    // (31-word vocabulary) the true answer is itself ~O(n²) pairs, so
    // runtime is output-bound — still ~15× faster than the oracle
    // engine's quadratic at sf0.1. ────────────────────────────────────
    "q_prefix_jaccard" -> q(
      c => {
        val docs = c.documents
          .select(col("doc_id"), TF.wordSet(col("text")).as("toks"))
        graft.text.PrefixJoin
          .joinAll(docs, "doc_id", "toks", threshold = 0.9, num = 9, den = 10)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
                  rnd4(col("jaccard")).as("jaccard"))
      },
      s"""WITH d AS (SELECT doc_id, $wsSql AS ws FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        | floor(CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
        |   / len(list_distinct(list_concat(a.ws, b.ws))) * 10000 + 0.5) / 10000 AS jaccard
        |FROM d a JOIN d b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
        |   / len(list_distinct(list_concat(a.ws, b.ws))) >= 0.9""".stripMargin),

    // near-dup pairs → connected components → dedup clusters
    // (min-id label propagation; oracle = recursive transitive closure)
    // dedup observability: the cluster-size histogram every curation
    // report leads with (how much of the corpus is duplicated, and how
    // deep). Singletons count as size-1 clusters; the two stacked
    // groupBys shrink row counts monotonically (docs → clusters →
    // sizes), so each shuffle is smaller than the last.
    "q_cluster_sizes" -> q(
      c => {
        val labels = DedupClusters.connectedComponents(
          jaccardPairs(c, threshold = 0.9, num = 9, den = 10)
            .select("id_a", "id_b"))
          .withColumnRenamed("id", "doc_id")
        c.documents.select(col("doc_id"))
          .join(labels, Seq("doc_id"), "left_outer")
          .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
          .groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
          .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      },
      s"""WITH RECURSIVE d AS (
        | SELECT doc_id, source, $wsSql AS ws FROM documents
        |), pairs AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        | FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
        | WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
        |   / len(list_distinct(list_concat(a.ws, b.ws))) >= 0.9
        |), e AS (
        | SELECT doc_a AS a, doc_b AS b FROM pairs
        | UNION SELECT doc_b, doc_a FROM pairs
        |), reach(a, b) AS (
        | SELECT a, b FROM e
        | UNION
        | SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
        |), labels AS (
        | SELECT a AS id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
        |), clustered AS (
        | SELECT doc_id, coalesce(l.cluster_id, doc_id) AS cluster_id
        | FROM documents LEFT JOIN labels l ON doc_id = l.id
        |), cs AS (
        | SELECT cluster_id, count(*) AS cluster_size FROM clustered GROUP BY 1
        |)
        |SELECT cluster_size, count(*) AS n_clusters FROM cs GROUP BY 1""".stripMargin),

    "q_dedup_clusters" -> q(
      c => DedupClusters.connectedComponents(
        jaccardPairs(c, threshold = 0.9, num = 9, den = 10)
          .select("id_a", "id_b")),
      s"""WITH RECURSIVE d AS (
        | SELECT doc_id, source, $wsSql AS ws FROM documents
        |), pairs AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        | FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
        | WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
        |   / len(list_distinct(list_concat(a.ws, b.ws))) >= 0.9
        |), e AS (
        | SELECT doc_a AS a, doc_b AS b FROM pairs
        | UNION SELECT doc_b, doc_a FROM pairs
        |), reach(a, b) AS (
        | SELECT a, b FROM e
        | UNION
        | SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
        |)
        |SELECT a AS id, least(a, min(b)) AS cluster_id
        |FROM reach GROUP BY a""".stripMargin),

    // bands=8 (r=8): collision prob at the J=0.9 operating point is
    // 1-(1-0.9^8)^8 ≈ 99%, but false candidates at J≈0.5 drop from
    // ~64% (r=4) to ~3% — on this duplicate-heavy corpus that's 10×
    // fewer candidate pairs to exact-verify, the dominant cost.
    // best-of-cluster dedup: same CC labels as q_dedup_clusters, but
    // the survivor policy keeps the highest-n_chars doc per cluster
    // (ties → min id) — the production "keep the best copy" rule.
    // Unpaired docs are singleton clusters.
    "q_dedup_survivors" -> q(
      c => DedupClusters.survivorsBy(c.documents, "doc_id", "n_chars",
        jaccardPairs(c, threshold = 0.9, num = 9, den = 10)
          .select("id_a", "id_b")),
      s"""WITH RECURSIVE d AS (
        | SELECT doc_id, source, $wsSql AS ws FROM documents
        |), pairs AS (
        | SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        | FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
        | WHERE CAST(len(list_intersect(a.ws, b.ws)) AS DOUBLE)
        |   / len(list_distinct(list_concat(a.ws, b.ws))) >= 0.9
        |), e AS (
        | SELECT doc_a AS a, doc_b AS b FROM pairs
        | UNION SELECT doc_b, doc_a FROM pairs
        |), reach(a, b) AS (
        | SELECT a, b FROM e
        | UNION
        | SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
        |), labels AS (
        | SELECT a AS id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
        |), clustered AS (
        | SELECT doc_id, coalesce(l.cluster_id, doc_id) AS cluster_id, n_chars
        | FROM documents LEFT JOIN labels l ON doc_id = l.id
        |)
        |SELECT doc_id, cluster_id, n_chars FROM (
        | SELECT *, row_number() OVER (PARTITION BY cluster_id
        |   ORDER BY n_chars DESC, doc_id) AS rn
        | FROM clustered) WHERE rn = 1""".stripMargin),

    // vocabulary extraction: global token frequencies, top-20 — the
    // first step of building a tokenizer vocab over a corpus
    "q_word_freq" -> q(
      c => {
        val tokens = c.documents.select(col("doc_id"),
          explode_outer(TF.words(col("text"))).as("word"))
          .filter(col("word").isNotNull)
        val counts = tokens.groupBy("word")
          .agg(count(lit(1)).as("n_occurrences"),
               countDistinct("doc_id").as("n_docs"))
        // orderBy+limit plans as TakeOrderedAndProject (per-partition
        // top-k heaps); a global no-partition Window here would pull the
        // entire vocabulary onto one task. The rank window runs only on
        // the 20-row limited result.
        val top = counts
          .orderBy(col("n_occurrences").desc, col("word")).limit(20)
        val w = Window.orderBy(col("n_occurrences").desc, col("word"))
        top.withColumn("rk", row_number().over(w).cast("long"))
      },
      """WITH t AS (
        | SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS word
        | FROM documents
        |), a AS (
        | SELECT word, count(*) AS n_occurrences,
        |  count(DISTINCT doc_id) AS n_docs
        | FROM t GROUP BY 1
        |)
        |SELECT word, n_occurrences, n_docs, rk FROM (
        | SELECT *, CAST(row_number() OVER (ORDER BY n_occurrences DESC, word)
        |   AS BIGINT) AS rk FROM a) WHERE rk <= 20""".stripMargin),

    // ── exact per-source heavy hitters via a Misra-Gries candidate
    // pass (sketch → exact recount, the two-phase frequent-items plan):
    // phase 1 runs the custom MisraGries TypedImperativeAggregate —
    // one O(k)-memory mergeable pass per source whose output is
    // GUARANTEED to contain every item with frequency > n/(k+1) —
    // and phase 2 recounts only those ≤k candidates (broadcast
    // semi-join) and applies the exact threshold. The corpus is never
    // aggregated at full vocabulary cardinality: at 100 TB the wide
    // groupBy(word) this replaces is the difference between shuffling
    // every token and shuffling k counters per source. Output is
    // exact, so the sketch's partition-order sensitivity is invisible
    // (candidates are a superset by the deterministic MG bound, and
    // the recount filter prunes to the true answer). ─────────────────
    "q_heavy_hitters" -> q(
      c => {
        val k = 32
        graft.functions.NativeFunctions.register(c.spark)
        val words = c.documents
          .select(col("source"),
                  explode_outer(TF.words(col("text"))).as("word"))
          .filter(col("word").isNotNull)
        // the sketch pass emits the per-source total n ALONGSIDE the MG
        // sketch (one aggregate, two outputs), so the exact threshold
        // needs no third pass over the token stream: phase 1 = sketch +
        // totals together, phase 2 = candidate recount. cand is
        // ≤|sources| rows — checkpointed so its two consumers don't
        // each re-run the corpus aggregate.
        val cand = words.groupBy("source")
          .agg(graft.functions.NativeFunctions
                 .heavyHitters(col("word"), k).as("sketch"),
               count(lit(1)).as("n"))
          .localCheckpoint()
        val candWords = cand
          .select(col("source"), explode(map_keys(col("sketch"))).as("word"))
        val counts = words
          .join(broadcast(candWords), Seq("source", "word"), "left_semi")
          .groupBy("source", "word").agg(count(lit(1)).as("cnt"))
        counts.join(broadcast(cand.select(col("source"), col("n"))), "source")
          .filter(col("cnt") * (k + 1) > col("n"))
          .select(col("source"), col("word"), col("cnt"))
      },
      """WITH w AS (
        | SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS word
        | FROM documents
        |), c AS (
        | SELECT source, word, CAST(count(*) AS BIGINT) AS cnt
        | FROM w GROUP BY 1, 2
        |), t AS (
        | SELECT source, sum(cnt) AS n FROM c GROUP BY 1
        |)
        |SELECT c.source, c.word, c.cnt
        |FROM c JOIN t USING (source)
        |WHERE c.cnt * 33 > t.n""".stripMargin),

    // ── Count-Min sketch (Cormode/Muthukrishnan), d=4 rows × w=256
    // buckets, probed for point-frequency estimates. Unlike the HLL /
    // Misra-Gries sketches (rows-only checks), this one is md5-derived
    // end to end, so the ENTIRE sketch construction and probe replay
    // exactly in the oracle — a hash-matched sketch. Scale shape: the
    // token stream first reduces to vocabulary-sized word counts (one
    // map-side-combined shuffle — the only pass over corpus-scale
    // data); the ×4 hash-row explode and the 1024-cell sketch build
    // run on the vocab, and probes join against the ≤1024-row sketch.
    // The bucket index is two hex chars of md5 mapped through a
    // 16-char locate() table — the one hex→int path both engines
    // evaluate identically. Estimates upper-bound true counts by
    // construction (an empty bucket proves absence → est 0). ─────────
    "q_cms_estimate" -> q(
      c => {
        val hexTab = "0123456789abcdef"
        val probes = Seq("the", "spark", "window", "data", "stream",
                         "model", "a", "zzz_absent")
        def bucket(j: Column, word: Column): Column = {
          val h = md5(concat(j.cast("string"), lit(":"), word).cast("binary"))
          (locate_col(substring(h, 1, 1), hexTab) - 1) * 16 +
            (locate_col(substring(h, 2, 1), hexTab) - 1)
        }
        // localCheckpoint: wc feeds both the sketch build and the
        // true-count probe join; without it the corpus token pass runs
        // twice (ReuseExchange can't match the differing projections).
        // wc is vocabulary-sized.
        val wc = c.documents
          .select(explode_outer(TF.words(lower(col("text")))).as("word"))
          .filter(col("word").isNotNull)
          .groupBy("word").agg(count(lit(1)).as("cnt"))
          .localCheckpoint()
        val sketch = wc
          .select(posexplode(transform(sequence(lit(0), lit(3)),
                    j => bucket(j, col("word")))).as(Seq("j", "bucket")),
                  col("cnt"))
          .groupBy("j", "bucket").agg(sum(col("cnt")).as("c"))
        val probeDf = c.spark.createDataFrame(
            probes.map(Tuple1.apply)).toDF("word")
          .select(col("word"),
                  posexplode(transform(sequence(lit(0), lit(3)),
                    j => bucket(j, col("word")))).as(Seq("j", "bucket")))
        val est = probeDf
          .join(broadcast(sketch), Seq("j", "bucket"), "left_outer")
          .groupBy("word")
          .agg(min(coalesce(col("c"), lit(0L))).as("est"))
        est.join(wc, Seq("word"), "left_outer")
          .select(col("word"), col("est"),
                  coalesce(col("cnt"), lit(0L)).as("true_cnt"))
      },
      """WITH t AS (
        | SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
        | FROM documents
        |), wc AS (
        | SELECT word, count(*) AS cnt FROM t GROUP BY 1
        |), hb AS (
        | SELECT j, (strpos('0123456789abcdef',
        |             substring(md5(concat(CAST(j AS VARCHAR), ':', word)), 1, 1)) - 1) * 16
        |         + (strpos('0123456789abcdef',
        |             substring(md5(concat(CAST(j AS VARCHAR), ':', word)), 2, 1)) - 1)
        |           AS bucket,
        |        cnt
        | FROM wc, unnest([0, 1, 2, 3]) AS u(j)
        |), sk AS (
        | SELECT j, bucket, CAST(sum(cnt) AS BIGINT) AS c
        | FROM hb GROUP BY 1, 2
        |), pw AS (
        | SELECT unnest(['the', 'spark', 'window', 'data', 'stream',
        |                'model', 'a', 'zzz_absent']) AS word
        |), pb AS (
        | SELECT word, j, (strpos('0123456789abcdef',
        |             substring(md5(concat(CAST(j AS VARCHAR), ':', word)), 1, 1)) - 1) * 16
        |         + (strpos('0123456789abcdef',
        |             substring(md5(concat(CAST(j AS VARCHAR), ':', word)), 2, 1)) - 1)
        |           AS bucket
        | FROM pw, unnest([0, 1, 2, 3]) AS u(j)
        |), es AS (
        | SELECT word, min(coalesce(sk.c, 0)) AS est
        | FROM pb LEFT JOIN sk USING (j, bucket) GROUP BY 1
        |)
        |SELECT es.word, es.est, coalesce(wc.cnt, 0) AS true_cnt
        |FROM es LEFT JOIN wc USING (word)""".stripMargin),

    // stratified deterministic sampling: first 25 docs per language in
    // md5 order — balanced per-class samples, reproducible across
    // engines and partitionings (unlike rand()-based sampleBy).
    // Skew contract at scale: partitionBy(lang) has ~handfuls of
    // distinct values, so each language becomes ONE sorted window task.
    // The pre-filter below bounds what reaches the sort to ≤25 rows per
    // (lang, input partition) — a per-partition top-k (cheap, no
    // shuffle) that preserves every possible global top-25 candidate,
    // so the single-task sort sees O(25 × partitions) rows instead of
    // the full table. Same output, skew-safe.
    "q_stratified_sample" -> q(
      c => {
        val key = md5(col("doc_id").cast("string").cast("binary"))
        val docs = c.documents.select(col("lang"), col("doc_id"))
        val bounded = docs
          .withColumn("pk", row_number().over(
            Window.partitionBy(col("lang"), spark_partition_id())
              .orderBy(key, col("doc_id"))))
          .filter(col("pk") <= 25).drop("pk")
        // same `key` expression as the pre-filter — diverging orderings
        // would break the top-25-candidate-preservation argument above
        val w = Window.partitionBy("lang").orderBy(key, col("doc_id"))
        bounded
          .withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 25)
          .select(col("lang"), col("doc_id"), col("rk"))
      },
      """SELECT lang, doc_id, rk FROM (
        | SELECT lang, doc_id, CAST(row_number() OVER (PARTITION BY lang
        |   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
        | FROM documents) WHERE rk <= 25""".stripMargin),

    // END-TO-END near-dup under a hash-matched oracle (r9): the
    // pipeline runs in Md5Hash mode — token dictionary, per-plane
    // minhash, and band buckets all derive from md5, so DuckDB replays
    // the ENTIRE path including which pairs the banding surfaces
    // (LSH recall < 1 stops mattering: both engines miss the same
    // pairs). The xxhash64 production mode stays the library default,
    // pinned by MinHashLSHSpec recall/equivalence tests and the
    // q_minhash_replay mechanism twin.
    "q_minhash_neardup" -> q(
      c => MinHashLSH
        .nearDuplicates(docWords(c), "doc_id", "ws",
                        k = 64, bands = 8, threshold = 0.9,
                        blockCol = Some("source"),
                        mode = MinHashLSH.Md5Hash)
        .select(col("id_a"), col("id_b"), rnd4(col("jaccard")).as("jaccard")),
      minhashNeardupSql("documents", wsSql, bands = 8, rowsPerBand = 8,
                        threshold = "0.9")),

    // MinHash mechanism replay, ORACLE-checked: the production
    // signature (q_minhash_neardup) uses xxhash64, which no SQL oracle
    // can reproduce — this k=4 variant derives each plane's hash from
    // md5 (identical hex in both engines; lexicographic min of hex =
    // min of the 128-bit value), so the min-over-shingles mechanism
    // itself is hash-matched cross-engine rather than only pinned by
    // ScalaTest recall. Per-row array fold, no shuffle at all.
    "q_minhash_replay" -> q(
      c => {
        val d = c.documents.withColumn("ws", TF.wordSet(col("text")))
        def mh(j: Int) = array_min(transform(col("ws"),
          w => md5(concat(lit(s"$j:"), w).cast("binary")))).as(s"mh$j")
        d.select(col("doc_id"), mh(0), mh(1), mh(2), mh(3))
      },
      s"""WITH d AS (SELECT doc_id, $wsSql AS ws FROM documents)
        |SELECT doc_id,
        | list_min(list_transform(ws, w -> md5('0:' || w))) AS mh0,
        | list_min(list_transform(ws, w -> md5('1:' || w))) AS mh1,
        | list_min(list_transform(ws, w -> md5('2:' || w))) AS mh2,
        | list_min(list_transform(ws, w -> md5('3:' || w))) AS mh3
        |FROM d""".stripMargin),

    // END-TO-END SimHash near-dup, oracle-checked (r9): the token hash
    // was md5-derived all along (SimHash.tokenHash = first 48 bits of
    // md5), so the whole path — per-(doc,token) counts, 48 bit-votes,
    // strict sign packing, source-blocked pairing, hamming ≤ 8 — is
    // replayable in DuckDB. Spark runs the segment-LSH pair search
    // (proven equal to the quadratic form by SimHashSpec); the oracle
    // runs the quadratic form directly.
    "q_simhash_neardup" -> q(
      c => {
        val sigs = SimHash.simhash(
          c.documents.select(col("doc_id"), col("source"),
                             TF.words(col("text")).as("w")),
          "doc_id", "w")
          .join(c.documents.select("doc_id", "source"), "doc_id")
        SimHash.nearDuplicates(sigs, "doc_id", "source", maxHamming = 8)
      },
      """WITH tok AS (
        | SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
        | FROM documents
        |), cnt AS (
        | SELECT doc_id, tok, count(*) AS cnt FROM tok GROUP BY 1, 2
        |), h AS (
        | SELECT doc_id, cnt,
        |  CAST('0x'||substr(md5(tok),1,12) AS BIGINT) AS h FROM cnt
        |), votes AS (
        | SELECT doc_id, b,
        |  sum(CASE WHEN (h >> b) & 1 = 1 THEN cnt ELSE -cnt END) AS s
        | FROM h, unnest(range(48)) t(b) GROUP BY 1, 2
        |), sig AS (
        | SELECT doc_id,
        |  CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS sh
        | FROM votes GROUP BY 1
        |), sb AS (
        | SELECT s.doc_id, s.sh, d.source FROM sig s
        | JOIN documents d ON d.doc_id = s.doc_id
        |)
        |SELECT a.doc_id AS id_a, c.doc_id AS id_b,
        | CAST(bit_count(xor(a.sh, c.sh)) AS BIGINT) AS hamming
        |FROM sb a JOIN sb c ON a.source = c.source AND a.doc_id < c.doc_id
        |WHERE bit_count(xor(a.sh, c.sh)) <= 8""".stripMargin),

    // The SimHash MECHANISM under a hash-matched oracle (the
    // q_minhash_replay convention): per-bit ±1 votes derive from one
    // md5 hex character per bit — replayable in DuckDB, unlike the
    // production xxhash64 path in text/SimHash — summed over each
    // document's distinct word set in ONE groupBy pass (16 aggregates,
    // map-side combined), then packed big-endian into the signature.
    // Integer vote sums are exact in any order, so the signature is
    // bit-identical across engines; ties (sum == 0) take bit 1 on both
    // sides. q_simhash_neardup keeps the production path with its
    // banding pinned by golden-signature specs.
    "q_simhash_replay" -> q(
      c => {
        val nbits = 16
        val toks = c.documents
          .select(col("doc_id"), explode_outer(TF.wordSet(col("text"))).as("w"))
          .filter(col("w").isNotNull)
          .withColumn("h", md5(col("w").cast("binary")))
        val votes = (0 until nbits).map { j =>
          sum(when(substring(col("h"), j + 1, 1).between("0", "7"), 1L)
                .otherwise(-1L)).as(s"s$j")
        }
        val sums = toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
        val sig = (0 until nbits).map { j =>
          when(col(s"s$j") >= 0, lit(1L << (nbits - 1 - j))).otherwise(0L)
        }.reduce(_ + _)
        sums.select(col("doc_id"), sig.as("sig"))
      }, {
        val votes = (0 until 16).map(j =>
          s"sum(CASE WHEN substr(md5(w), ${j + 1}, 1) BETWEEN '0' AND '7'" +
          s" THEN 1 ELSE -1 END) AS s$j").mkString(",\n  ")
        val pack = (0 until 16).map(j =>
          s"(CASE WHEN s$j >= 0 THEN ${1L << (15 - j)} ELSE 0 END)")
          .mkString(" + ")
        s"""WITH t AS (
          | SELECT doc_id, unnest($wsSql) AS w FROM documents
          |), sums AS (
          | SELECT doc_id,
          |  $votes
          | FROM t GROUP BY doc_id
          |)
          |SELECT doc_id, CAST($pack AS BIGINT) AS sig FROM sums""".stripMargin
      }),

    // ── embedding similarity ──────────────────────────────────────────
    // Query batches are FIXED-size (id % 50 = 0 AND id < 2000 — the
    // realistic shape: a search batch does not grow with the corpus).
    // At the driver's sf0.01/sf0.1 every id is < 2000, so outputs are
    // unchanged there; at sf1+ the cap keeps query-side cost constant
    // per corpus row — without it the queries×corpus product made
    // every brute-force/ADC scan quadratic in the fixture scale (the
    // round-9 sf1 rehearsal's q_ann_* superlinear findings).
    "q_embed_neardup" -> q(
      c => {
        val all = Similarity.prepare(c.embeddings, "vec_id", "embedding")
        Similarity
          .nearDuplicates(
            all.filter(col("id") % 50 === 0 && col("id") < 2000), all, 0.3)
          .select(col("query_id"), col("vec_id"), rnd6(col("cos")).as("cos"))
      },
      """WITH n AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
        |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) nrm
        | FROM embeddings
        |), qy AS (SELECT * FROM n WHERE vec_id % 50 = 0 AND vec_id < 2000)
        |SELECT qy.vec_id AS query_id, c.vec_id AS vec_id,
        | floor(list_dot_product(qy.v, c.v) / (qy.nrm * c.nrm) * 1000000 + 0.5) / 1000000 AS cos
        |FROM qy JOIN n c ON c.vec_id <> qy.vec_id
        |WHERE list_dot_product(qy.v, c.v) / (qy.nrm * c.nrm) >= 0.3""".stripMargin),

    "q_ann_topk" -> q(
      c => {
        val all = Similarity.prepare(c.embeddings, "vec_id", "embedding")
        Similarity
          .bruteForceTopK(
            all.filter(col("id") % 50 === 0 && col("id") < 2000),
            all, k = 5, rnd6)
          .select(col("query_id"), col("vec_id"), col("cos_r"),
                  col("rn").cast("long").as("rn"))
      },
      """WITH n AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
        |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) nrm
        | FROM embeddings
        |), qy AS (SELECT * FROM n WHERE vec_id % 50 = 0 AND vec_id < 2000),
        |scored AS (
        | SELECT qy.vec_id AS query_id, c.vec_id AS vec_id,
        |  floor(list_dot_product(qy.v, c.v) / (qy.nrm * c.nrm) * 1000000 + 0.5) / 1000000 AS cos_r
        | FROM qy JOIN n c ON c.vec_id <> qy.vec_id
        |)
        |SELECT query_id, vec_id, cos_r, rn FROM (
        | SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |   ORDER BY cos_r DESC, vec_id) AS BIGINT) AS rn
        | FROM scored) WHERE rn <= 5""".stripMargin),

    // LSH-bucketed ANN (the second scale path next to IVF): sign-bit
    // hyperplane buckets → collision candidates → exact rerank. Md5
    // plane mode (the r9 near-dup HashMode treatment applied to
    // sign-bit LSH): ±1 planes from md5 over fixed-point vectors make
    // the bucket keys — and therefore WHICH pairs the banding
    // surfaces — bit-identical in DuckDB, so the whole end-to-end
    // top-k hash-matches (LSH recall < 1 stops mattering because the
    // oracle replays the same bands). The xxhash64 production path
    // ([[Similarity.lshTopK]]) keeps its recall + determinism pins in
    // SimilaritySpec and its streaming drive in AnnStream.
    "q_ann_lsh" -> q(
      c => {
        val all = Similarity.prepare(c.embeddings, "vec_id", "embedding")
        Similarity
          .lshTopKMd5(all.filter(col("id") % 50 === 0 && col("id") < 2000),
                      all, k = 5, nbits = 64, bands = 16, dim = 64, rnd6)
          .select(col("query_id"), col("vec_id"), col("cos_r"),
                  col("rn").cast("long").as("rn"))
      },
      """WITH signs AS (
        | SELECT p, [CASE WHEN substr(md5('lshq' || p::VARCHAR || '_' || i::VARCHAR), 1, 1)
        |              BETWEEN '0' AND '7' THEN 1.0 ELSE -1.0 END
        |            FOR i IN range(0, 64)] AS s
        | FROM (SELECT unnest(range(0, 64)) AS p)
        |), iv AS (
        | SELECT vec_id,
        |  [floor(CAST(e AS DOUBLE) * 10000 + 0.5) FOR e IN embedding] AS v
        | FROM embeddings
        |), bits AS (
        | SELECT iv.vec_id, s.p,
        |  CASE WHEN list_dot_product(iv.v, s.s) >= 0 THEN 1 ELSE 0 END AS bit
        | FROM iv CROSS JOIN signs s
        |), buckets AS (
        | SELECT vec_id, p // 4 AS band, sum(bit * (1 << (p % 4))) AS bucket
        | FROM bits GROUP BY vec_id, p // 4
        |), cand AS (
        | SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS vec_id
        | FROM (SELECT * FROM buckets WHERE vec_id % 50 = 0 AND vec_id < 2000) qb
        | JOIN buckets cb ON cb.band = qb.band AND cb.bucket = qb.bucket
        |   AND cb.vec_id <> qb.vec_id
        |), n AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
        |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) nrm
        | FROM embeddings
        |), scored AS (
        | SELECT cd.query_id, cd.vec_id,
        |  floor(list_dot_product(qy.v, c.v) / (qy.nrm * c.nrm) * 1000000 + 0.5) / 1000000 AS cos_r
        | FROM cand cd
        | JOIN n qy ON qy.vec_id = cd.query_id
        | JOIN n c ON c.vec_id = cd.vec_id
        |)
        |SELECT query_id, vec_id, cos_r, rn FROM (
        | SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |   ORDER BY cos_r DESC, vec_id) AS BIGINT) AS rn
        | FROM scored) WHERE rn <= 5""".stripMargin),

    // The LSH MECHANISM under a hash-matched oracle (the
    // q_minhash_replay convention applied to sign-bit LSH): hyperplane
    // signs derive from md5 — replayable in DuckDB, unlike production
    // xxhash64 — embeddings are fixed-pointed (1e4, exact in doubles),
    // so the ±1 dot products are exact integers and the sign bits and
    // banded bucket keys are bit-identical across engines. This pins
    // the whole signature→band pipeline exactly; q_ann_lsh keeps the
    // faster packed-bits xxhash path with its recall pinned in
    // SimilaritySpec.
    "q_lsh_replay" -> q(
      c => {
        val nbits = 16
        val bandBits = 4
        val signs = DimReduce.jlSigns(nbits, d = 64, prefix = "lsh")
        val base = c.embeddings.select(col("vec_id"),
          transform(col("embedding"),
            e => floor(e.cast("double") * 10000 + 0.5)).as("iv"))
        val bits = (0 until nbits).map { j =>
          (aggregate(zip_with(col("iv"), typedlit(signs(j).toSeq),
                              (x, s) => x * s),
                     lit(0.0), (a, x) => a + x) >= 0).cast("long")
        }
        val withBits = base.select(col("vec_id"), array(bits: _*).as("b"))
        val keys = (0 until nbits / bandBits).map { g =>
          (0 until bandBits).map(i =>
            element_at(col("b"), g * bandBits + i + 1) *
              lit(1L << (bandBits - 1 - i))).reduce(_ + _)
        }
        withBits.select(col("vec_id"), posexplode(array(keys: _*)))
          .select(col("vec_id"), col("pos").cast("long").as("band"),
                  col("col").as("band_key"))
      },
      """WITH signs AS (
        | SELECT j, [CASE WHEN substr(md5('lsh' || j::VARCHAR || '_' || i::VARCHAR), 1, 1)
        |              BETWEEN '0' AND '7' THEN 1.0 ELSE -1.0 END
        |            FOR i IN range(0, 64)] AS s
        | FROM (SELECT unnest(range(0, 16)) AS j)
        |), iv AS (
        | SELECT vec_id,
        |  [floor(CAST(e AS DOUBLE) * 10000 + 0.5) FOR e IN embedding] AS v
        | FROM embeddings
        |), bits AS (
        | SELECT iv.vec_id, s.j,
        |  CASE WHEN list_dot_product(iv.v, s.s) >= 0 THEN 1 ELSE 0 END AS bit
        | FROM iv CROSS JOIN signs s
        |)
        |SELECT vec_id, CAST(j // 4 AS BIGINT) AS band,
        | CAST(sum(bit * (1 << (3 - (j % 4)))) AS BIGINT) AS band_key
        |FROM bits GROUP BY vec_id, j // 4""".stripMargin),

    "q_ann_pq" -> q(
      c => {
        val all = Similarity.prepare(c.embeddings, "vec_id", "embedding")
        Similarity.pqTopK(all,
                          all.filter(col("id") % 50 === 0 && col("id") < 2000),
                          k = 5, dim = 64, m = 16, codebookSize = 250, rnd6,
                          kmeansIters = 2)
          .select(col("query_id"), col("vec_id"), col("score_r"),
                  col("rn").cast("long").as("rn"))
      }),

    // q_ann_pq's SimilaritySpec invariant pins lifted into the driver
    // gate: recall floor vs brute force, exact row parity (PQ scores
    // every vector), and run-to-run determinism (seedless codebooks,
    // fixed-order sums) — the determinism leg executes the Lloyd-
    // refined path twice and counts symmetric-difference rows.
    "q_ann_pq_check" -> q(
      c => {
        val all = Similarity.prepare(c.embeddings, "vec_id", "embedding")
        val queries = all.filter(col("id") % 50 === 0 && col("id") < 2000)
        // see q_ann_ivf_check: checkpoint the nQueries·k-row results
        // so each PQ path executes exactly once (the determinism leg
        // needs two INDEPENDENT executions — but only two)
        val bf = Similarity.bruteForceTopK(queries, all, 5, rnd6)
          .select(col("query_id"), col("vec_id")).localCheckpoint()
        def run() = Similarity.pqTopK(all, queries, k = 5, dim = 64,
            m = 16, codebookSize = 250, rnd6, kmeansIters = 2)
          .select(col("query_id"), col("vec_id")).localCheckpoint()
        val pq = run()
        val pq2 = run()
        val stats = pq.agg(count(lit(1)).as("n_pq"))
          .crossJoin(bf.agg(count(lit(1)).as("n_bf")))
          .crossJoin(bf.join(pq, Seq("query_id", "vec_id"), "left_semi")
                       .agg(count(lit(1)).as("n_hit")))
          .crossJoin(pq.exceptAll(pq2).unionAll(pq2.exceptAll(pq))
                       .agg(count(lit(1)).as("n_diff")))
        Checks.fromFlags(stats,
          "pq_row_parity" -> (col("n_pq") === col("n_bf")),
          // SCALE-ROBUST regression floor, deliberately below the
          // strict SimilaritySpec pin (recall >= 0.6 at sf0.001): the
          // fixed 250-codeword / m=16 config measures 0.42 on the
          // rotated-replica sf1 corpus. 0.35 still catches real
          // breakage (a broken encode scores near-random, ~k/N).
          "pq_recall_ge_35pct" -> (col("n_hit") * 100 >= col("n_bf") * 35),
          "pq_deterministic" -> (col("n_diff") === 0L))
      },
      Checks.oracle("pq_row_parity", "pq_recall_ge_35pct",
                    "pq_deterministic")),

    // The PQ MECHANISM under a hash-matched oracle: with kmeansIters=0
    // the codebooks are the md5-ordered top-250 sample (md5 hex strings
    // order identically in both engines), split per subspace in seed-id
    // order; encoding is argmax of 2·x·c − |c|² with ties to the lowest
    // codeword index (PqArgmin's strict-> loop ≡ ORDER BY sc DESC, ci);
    // ADC scores are per-subspace dots summed in ascending-j order
    // (AdcScores' fixed loop ≡ the ordered-aggregate sum). Everything
    // else is the same sequential double fold as q_ann_topk. This pins
    // the production pqTopK path itself; q_ann_pq keeps the Lloyd-
    // refined configuration with recall pinned in SimilaritySpec.
    "q_pq_replay" -> q(
      c => {
        val all = Similarity.prepare(c.embeddings, "vec_id", "embedding")
        Similarity.pqTopK(all,
                          all.filter(col("id") % 50 === 0 && col("id") < 2000),
                          k = 5,
                          dim = 64, m = 16, codebookSize = 250, rnd6,
                          kmeansIters = 0)
          .select(col("query_id"), col("vec_id"), col("score_r"),
                  col("rn").cast("long").as("rn"))
      },
      """WITH n AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
        |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                        CAST(embedding AS DOUBLE[]))) nrm
        | FROM embeddings
        |), un AS (
        | SELECT vec_id, list_transform(v, x -> x / nrm) AS u FROM n
        |), seed AS (
        | SELECT vec_id FROM embeddings
        | ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 250
        |), sidx AS (
        | SELECT un.vec_id, un.u,
        |  row_number() OVER (ORDER BY un.vec_id) - 1 AS ci
        | FROM un JOIN seed USING (vec_id)
        |), cw AS (
        | SELECT j.j, sidx.ci, sidx.u[j.j*4+1 : j.j*4+4] AS c
        | FROM sidx CROSS JOIN (SELECT unnest(range(0, 16)) AS j) j
        |), qy AS (SELECT vec_id, u FROM un
        |          WHERE vec_id % 50 = 0 AND vec_id < 2000),
        |enc AS (
        | SELECT vec_id, j, ci AS code FROM (
        |  SELECT x.vec_id, cw.j, cw.ci,
        |   row_number() OVER (PARTITION BY x.vec_id, cw.j ORDER BY
        |     2 * list_dot_product(x.u[cw.j*4+1 : cw.j*4+4], cw.c)
        |       - list_dot_product(cw.c, cw.c) DESC, cw.ci) AS rn
        |  FROM un x CROSS JOIN cw) WHERE rn = 1
        |), scored AS (
        | SELECT q.vec_id AS query_id, e.vec_id,
        |  sum(list_dot_product(q.u[e.j*4+1 : e.j*4+4], cw.c)
        |      ORDER BY e.j) AS score
        | FROM enc e
        | JOIN cw ON cw.j = e.j AND cw.ci = e.code
        | CROSS JOIN qy q
        | WHERE e.vec_id <> q.vec_id
        | GROUP BY q.vec_id, e.vec_id
        |)
        |SELECT query_id, vec_id,
        | floor(score * 1000000 + 0.5) / 1000000 AS score_r, rn FROM (
        | SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |   ORDER BY floor(score * 1000000 + 0.5) / 1000000 DESC, vec_id)
        |   AS BIGINT) AS rn
        | FROM scored) WHERE rn <= 5""".stripMargin),

    "q_ann_ivf" -> q(
      c => {
        val all = Similarity.prepare(c.embeddings, "vec_id", "embedding")
        // maxCentroids = 40: at sf0.1 the uncapped nlist is 38, so
        // driver-scale results are identical; past that the cap keeps
        // corpus→centroid assignment linear (nlist fixed, cells grow)
        Similarity.ivfTopK(c.embeddings, "vec_id", "embedding",
          all.filter(col("id") % 50 === 0 && col("id") < 2000),
          k = 5, centroidEvery = 53,
          nprobe = 4, rnd6, kmeansIters = 3, maxCentroids = 40)
          .select(col("query_id"), col("vec_id"), col("cos_r"),
                  col("rn").cast("long").as("rn"))
      }),

    // q_ann_ivf's SimilaritySpec invariant pins lifted into the driver
    // gate (Checks convention): the k-means-refined production config
    // is recall-floored against brute force, k-bounded, and row-parity
    // checked — all computed distributed (semi-join hit count, no
    // collect), emitted as constant-oracle pass rows.
    "q_ann_ivf_check" -> q(
      c => {
        val all = Similarity.prepare(c.embeddings, "vec_id", "embedding")
        val queries = all.filter(col("id") % 50 === 0 && col("id") < 2000)
        // top-k outputs are nQueries·k rows — localCheckpoint them so
        // the flag aggregates below (counts, semi-join, parity) read
        // the tiny materialized result instead of re-executing the
        // whole index scan per crossJoined aggregate
        val bf = Similarity.bruteForceTopK(queries, all, 5, rnd6)
          .select(col("query_id"), col("vec_id")).localCheckpoint()
        val ivf = Similarity.ivfTopK(c.embeddings, "vec_id", "embedding",
          queries, k = 5, centroidEvery = 53,
          nprobe = 4, rnd6, kmeansIters = 3, maxCentroids = 40)
          .localCheckpoint()
        val stats = ivf
          .agg(count(lit(1)).as("n_ivf"), max(col("rn")).as("max_rn"))
          .crossJoin(bf.agg(count(lit(1)).as("n_bf")))
          .crossJoin(bf.join(ivf.select("query_id", "vec_id"),
                             Seq("query_id", "vec_id"), "left_semi")
                       .agg(count(lit(1)).as("n_hit")))
        Checks.fromFlags(stats,
          "ivf_k_bounded" -> (col("max_rn") <= 5),
          "ivf_row_parity" -> (col("n_ivf") === col("n_bf")),
          // SCALE-ROBUST regression floor, deliberately below the
          // strict SimilaritySpec pin (recall >= 0.5 at sf0.001): the
          // same bounded config (nlist <= 40, nprobe 4) legitimately
          // measures 0.415 on the 20k-vector sf1 corpus, and this
          // check must hold at every rehearsal scale. 0.35 still
          // catches any real breakage (a broken assignment or scoring
          // path lands near 1/nlist ~ 0.03).
          "ivf_recall_ge_35pct" -> (col("n_hit") * 100 >= col("n_bf") * 35))
      },
      Checks.oracle("ivf_k_bounded", "ivf_row_parity",
                    "ivf_recall_ge_35pct")),

    // The IVF MECHANISM under a hash-matched oracle: with
    // kmeansIters=0 the whole path is deterministic SQL — centroids
    // are the id%53 subsample, corpus assignment is argmax of the
    // ROUNDED cosine (ties to the lowest centroid id, exactly the
    // max_by(struct(score, -cid)) order), queries probe their
    // top-nprobe centroids, and the exact rerank orders by
    // (rounded cos, vec_id). Every float op is the same sequential
    // dot-product fold both engines use (q_ann_topk precedent), so
    // the production ivfTopK function itself — not a re-derivation —
    // hash-matches. q_ann_ivf keeps the k-means-refined production
    // configuration with its recall pinned in SimilaritySpec.
    "q_ivf_replay" -> q(
      c => {
        val all = Similarity.prepare(c.embeddings, "vec_id", "embedding")
        Similarity.ivfTopK(c.embeddings, "vec_id", "embedding",
          all.filter(col("id") % 50 === 0 && col("id") < 2000), k = 5,
          centroidEvery = 53, nprobe = 4, rnd6, kmeansIters = 0,
          maxCentroids = 40)
          .select(col("query_id"), col("vec_id"), col("cos_r"),
                  col("rn").cast("long").as("rn"))
      },
      """WITH n AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
        |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                        CAST(embedding AS DOUBLE[]))) nrm
        | FROM embeddings
        |), qy AS (SELECT * FROM n WHERE vec_id % 50 = 0 AND vec_id < 2000),
        |cent AS (
        | SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n
        | WHERE vec_id % 53 = 0 ORDER BY vec_id LIMIT 40
        |), assigned AS (
        | SELECT vec_id, cid FROM (
        |  SELECT x.vec_id, c.cid,
        |   row_number() OVER (PARTITION BY x.vec_id ORDER BY
        |     floor(list_dot_product(x.v, c.cv) / (x.nrm * c.cn)
        |           * 1000000 + 0.5) / 1000000 DESC, c.cid) AS arn
        |  FROM n x CROSS JOIN cent c) WHERE arn = 1
        |), probes AS (
        | SELECT query_id, cid FROM (
        |  SELECT q.vec_id AS query_id, c.cid,
        |   row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |     floor(list_dot_product(q.v, c.cv) / (q.nrm * c.cn)
        |           * 1000000 + 0.5) / 1000000 DESC, c.cid) AS crn
        |  FROM qy q CROSS JOIN cent c) WHERE crn <= 4
        |), scored AS (
        | SELECT p.query_id, a.vec_id,
        |  floor(list_dot_product(q.v, x.v) / (q.nrm * x.nrm)
        |        * 1000000 + 0.5) / 1000000 AS cos_r
        | FROM probes p
        | JOIN assigned a ON a.cid = p.cid
        | JOIN n x ON x.vec_id = a.vec_id
        | JOIN qy q ON q.vec_id = p.query_id
        | WHERE a.vec_id <> p.query_id
        |)
        |SELECT query_id, vec_id, cos_r, rn FROM (
        | SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |   ORDER BY cos_r DESC, vec_id) AS BIGINT) AS rn
        | FROM scored) WHERE rn <= 5""".stripMargin),

    // The k-means REFINEMENT mechanism under a hash-matched oracle —
    // the one DataFrame-side iterative loop q_ivf_replay leaves
    // unpinned (it runs kmeansIters=0). This calls the production
    // [[Similarity.refineCentroids]] itself — argmax-by-raw-cosine
    // assignment (max_by(struct(cos, -cid)) ≡ ORDER BY cos DESC, cid),
    // per-centroid element-wise mean via the VectorSum aggregate — on
    // FIXED-POINT vectors (×10⁴, the q_jl_project convention): dots
    // are exact integers in any summation order, norms/cosines are
    // single correctly-rounded IEEE ops on exact inputs, and the mean
    // is an exact-int sum over an exact count, so even the refined
    // centroid DOUBLES hash-match across engines. Memberless centroids
    // drop (groupBy over assignments) in both formulations. q_ann_ivf
    // keeps the raw-embedding 3-iteration production configuration
    // with recall pinned in SimilaritySpec.
    "q_kmeans_replay" -> q(
      c => {
        val all0 = Similarity.prepare(c.embeddings, "vec_id", "embedding")
        val iv = all0.select(col("id"),
            transform(col("v"),
              x => floor(x * 10000 + lit(0.5)).cast("double")).as("v"))
          .withColumn("nrm", Similarity.norm(col("v")))
        val cent0 = iv.filter(col("id") % 53 === 0)
          .orderBy(col("id")).limit(40)
          .select(col("id").as("cid"), col("v").as("cv"),
                  col("nrm").as("cn"))
        Similarity.refineCentroids(iv, cent0, iters = 1)
          .select(col("cid"), posexplode(col("cv")).as(Seq("dim_idx", "c")))
          .select(col("cid"), col("dim_idx").cast("long").as("dim_idx"),
                  col("c"))
      },
      """WITH iv AS (
        | SELECT vec_id,
        |  [floor(CAST(e AS DOUBLE) * 10000 + 0.5) FOR e IN embedding] AS v
        | FROM embeddings
        |), n AS (
        | SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM iv
        |), cent AS (
        | SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n
        | WHERE vec_id % 53 = 0 ORDER BY vec_id LIMIT 40
        |), assigned AS (
        | SELECT vec_id, cid FROM (
        |  SELECT x.vec_id, c.cid,
        |   row_number() OVER (PARTITION BY x.vec_id ORDER BY
        |     list_dot_product(x.v, c.cv) / (x.nrm * c.cn) DESC, c.cid) AS arn
        |  FROM n x CROSS JOIN cent c) WHERE arn = 1
        |)
        |SELECT a.cid, g.i AS dim_idx,
        | sum(n.v[CAST(g.i AS INT) + 1]) / count(*) AS c
        |FROM assigned a
        |JOIN n ON n.vec_id = a.vec_id,
        |     (SELECT unnest(range(0, 64)) AS i) g
        |GROUP BY 1, 2""".stripMargin),

    // The REFINED IVF end to end under a hash-matched oracle: the
    // production ivfTopK at kmeansIters=1 — refinement assignment by
    // RAW cosine (refineCentroids), per-centroid means, then the
    // rounded-cosine assignment/probe/rerank of q_ivf_replay against
    // the REFINED centroids. Inputs are fixed-pointed INTO THE FLOAT
    // embedding column (×10⁴ integers are exact in float32), so the
    // unchanged production function computes: exact-int dots, means
    // that are exact-int sums over exact counts, and sequential
    // double folds for the mean-vector norms/cosines — the same
    // cross-engine fold equality q_ann_topk rests on. Only q_ann_ivf's
    // raw-embedding multi-iteration configuration stays rows-only.
    "q_ivf_refined_replay" -> q(
      c => {
        val fp = c.embeddings.select(col("vec_id"),
          transform(col("embedding"),
            e => floor(e.cast("double") * 10000 + 0.5).cast("float"))
            .as("embedding"))
        val all = Similarity.prepare(fp, "vec_id", "embedding")
        Similarity.ivfTopK(fp, "vec_id", "embedding",
          all.filter(col("id") % 50 === 0 && col("id") < 2000), k = 5,
          centroidEvery = 53, nprobe = 4, rnd6, kmeansIters = 1,
          maxCentroids = 40)
          .select(col("query_id"), col("vec_id"), col("cos_r"),
                  col("rn").cast("long").as("rn"))
      },
      """WITH iv AS (
        | SELECT vec_id,
        |  [floor(CAST(e AS DOUBLE) * 10000 + 0.5) FOR e IN embedding] AS v
        | FROM embeddings
        |), n AS (
        | SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM iv
        |), qy AS (SELECT * FROM n WHERE vec_id % 50 = 0 AND vec_id < 2000),
        |cent0 AS (
        | SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n
        | WHERE vec_id % 53 = 0 ORDER BY vec_id LIMIT 40
        |), assigned0 AS (
        | SELECT vec_id, cid FROM (
        |  SELECT x.vec_id, c.cid,
        |   row_number() OVER (PARTITION BY x.vec_id ORDER BY
        |     list_dot_product(x.v, c.cv) / (x.nrm * c.cn) DESC, c.cid) AS arn
        |  FROM n x CROSS JOIN cent0 c) WHERE arn = 1
        |), centm AS (
        | SELECT a.cid, g.i,
        |  sum(n.v[CAST(g.i AS INT) + 1]) / count(*) AS m
        | FROM assigned0 a JOIN n ON n.vec_id = a.vec_id,
        |      (SELECT unnest(range(0, 64)) AS i) g
        | GROUP BY 1, 2
        |), cent AS (
        | SELECT cid, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM (
        |  SELECT cid, list(m ORDER BY i) AS cv FROM centm GROUP BY cid)
        |), assigned AS (
        | SELECT vec_id, cid FROM (
        |  SELECT x.vec_id, c.cid,
        |   row_number() OVER (PARTITION BY x.vec_id ORDER BY
        |     floor(list_dot_product(x.v, c.cv) / (x.nrm * c.cn)
        |           * 1000000 + 0.5) / 1000000 DESC, c.cid) AS arn
        |  FROM n x CROSS JOIN cent c) WHERE arn = 1
        |), probes AS (
        | SELECT query_id, cid FROM (
        |  SELECT q.vec_id AS query_id, c.cid,
        |   row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |     floor(list_dot_product(q.v, c.cv) / (q.nrm * c.cn)
        |           * 1000000 + 0.5) / 1000000 DESC, c.cid) AS crn
        |  FROM qy q CROSS JOIN cent c) WHERE crn <= 4
        |), scored AS (
        | SELECT p.query_id, a.vec_id,
        |  floor(list_dot_product(q.v, x.v) / (q.nrm * x.nrm)
        |        * 1000000 + 0.5) / 1000000 AS cos_r
        | FROM probes p
        | JOIN assigned a ON a.cid = p.cid
        | JOIN n x ON x.vec_id = a.vec_id
        | JOIN qy q ON q.vec_id = p.query_id
        | WHERE a.vec_id <> p.query_id
        |)
        |SELECT query_id, vec_id, cos_r, rn FROM (
        | SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        |   ORDER BY cos_r DESC, vec_id) AS BIGINT) AS rn
        | FROM scored) WHERE rn <= 5""".stripMargin),

    // int8 embedding quantization (the storage-scale embedding op:
    // 4× smaller vectors for ANN shortlists): symmetric per-vector
    // scale to [-127, 127], then measure round-trip cosine fidelity
    // against the full-precision vector. Every step is the same IEEE
    // op sequence in both engines (floor-form rounding, sequential
    // dot folds), so even the fidelity doubles hash-match.
    "q_embed_quantize" -> q(
      c => {
        graft.functions.NativeFunctions.register(c.spark)
        import graft.functions.NativeFunctions.dot
        val base = c.embeddings
          .select(col("vec_id"),
                  transform(col("embedding"), x => x.cast("double")).as("v"))
          .withColumn("mx", greatest(array_max(col("v")), -array_min(col("v"))))
          .withColumn("scale",
            when(col("mx") === 0, lit(1.0)).otherwise(col("mx") / 127.0))
          .withColumn("qv",
            transform(col("v"), x => floor(x / col("scale") + 0.5)))
          .withColumn("dq", transform(col("qv"), q => q * col("scale")))
        base.select(col("vec_id"),
          rnd6(dot(col("v"), col("dq")) /
               (sqrt(dot(col("v"), col("v"))) * sqrt(dot(col("dq"), col("dq")))))
            .as("cos_fidelity"),
          array_max(col("qv")).cast("long").as("q_max"),
          array_min(col("qv")).cast("long").as("q_min"))
      },
      """WITH b AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |  greatest(list_max(CAST(embedding AS DOUBLE[])),
        |           -list_min(CAST(embedding AS DOUBLE[]))) AS mx
        | FROM embeddings
        |), s AS (
        | SELECT vec_id, v,
        |  CASE WHEN mx = 0 THEN 1.0 ELSE mx / 127.0 END AS scale
        | FROM b
        |), qz AS (
        | SELECT vec_id, v, scale,
        |  list_transform(v, x -> floor(x / scale + 0.5)) AS qv
        | FROM s
        |), dz AS (
        | SELECT vec_id, v, qv,
        |  list_transform(qv, q -> q * scale) AS dq
        | FROM qz
        |)
        |SELECT vec_id,
        | floor(list_dot_product(v, dq) /
        |   (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(dq, dq)))
        |   * 1000000 + 0.5) / 1000000 AS cos_fidelity,
        | CAST(list_max(qv) AS BIGINT) AS q_max,
        | CAST(list_min(qv) AS BIGINT) AS q_min
        |FROM dz""".stripMargin),

    // PCA over the embedding corpus (the SemDeDup-style reduction
    // step): one distributed moment pass, driver-side 64x64 Jacobi
    // eigensolve (model-scale, the PQ-codebook contract), literal
    // components in a codegen'd projection scan. Iterative eigensolve
    // isn't one SQL query → rows-only; DimReduceSpec pins golden
    // eigenpairs, orthonormality, the eigen equation, a local
    // covariance cross-check, Parseval residuals, and determinism.
    "q_embed_pca" -> q(
      c => {
        val model = DimReduce.fit(c.embeddings, col("embedding"), k = 8)
        val v = transform(col("embedding"), x => x.cast("double"))
        val mu = typedlit(model.mean.toSeq)
        DimReduce.project(c.embeddings, col("embedding"), model, "pc")
          // residual via Parseval (components orthonormal):
          // ||x-mu||^2 - sum(pc^2) is the unexplained energy, so the
          // ratio needs no reconstruction pass
          .withColumn("centered_sq",
            aggregate(zip_with(v, mu, (x, m) => (x - m) * (x - m)),
                      lit(0.0), (a, x) => a + x))
          .withColumn("pc_sq",
            aggregate(transform(col("pc"), x => x * x),
                      lit(0.0), (a, x) => a + x))
          .select(col("vec_id"),
            rnd4(element_at(col("pc"), 1)).as("pc1"),
            rnd4(element_at(col("pc"), 2)).as("pc2"),
            rnd4(element_at(col("pc"), 3)).as("pc3"),
            rnd4(element_at(col("pc"), 4)).as("pc4"),
            rnd4(when(col("centered_sq") === 0, 0.0)
              .otherwise(greatest(lit(0.0),
                lit(1.0) - col("pc_sq") / col("centered_sq"))))
              .as("resid_ratio"),
            rnd4(lit(model.explained(8))).as("explained8"))
      }),

    // q_embed_pca's DimReduceSpec invariant pins lifted into the
    // driver gate: component orthonormality and a valid descending
    // spectrum (driver-side — the model is k·d doubles by contract)
    // plus the distributed Parseval bound over EVERY projected row
    // (projected energy never exceeds centered energy; a broken
    // eigensolve or de-normalized component fails it immediately).
    "q_embed_pca_check" -> q(
      c => {
        val model = DimReduce.fit(c.embeddings, col("embedding"), k = 8)
        val comps = model.components
        val orth = (for {
          i <- comps.indices; j <- i until comps.length
        } yield math.abs(
          comps(i).zip(comps(j)).map { case (a, b) => a * b }.sum -
            (if (i == j) 1.0 else 0.0))).max <= 1e-6
        val desc = model.eigenvalues.zip(model.eigenvalues.drop(1))
          .forall { case (a, b) => a >= b - 1e-9 }
        val valid = model.eigenvalues.forall(_ >= -1e-9) &&
          model.explained(8) <= 1.0 + 1e-9
        val v = transform(col("embedding"), x => x.cast("double"))
        val mu = typedlit(model.mean.toSeq)
        val proj = DimReduce.project(c.embeddings, col("embedding"),
                                     model, "pc")
          .withColumn("centered_sq",
            aggregate(zip_with(v, mu, (x, m) => (x - m) * (x - m)),
                      lit(0.0), (a, x) => a + x))
          .withColumn("pc_sq",
            aggregate(transform(col("pc"), x => x * x),
                      lit(0.0), (a, x) => a + x))
        val stats = proj.agg(
          min(col("pc_sq") <= col("centered_sq") * 1.000001 + 1e-9)
            .as("parseval"))
        Checks.fromLocal(c.spark,
            "pca_orthonormal" -> orth,
            "pca_descending_spectrum" -> desc,
            "pca_spectrum_valid" -> valid)
          .unionAll(Checks.fromFlags(stats,
            "pca_parseval_bound" -> col("parseval")))
      },
      Checks.oracle("pca_orthonormal", "pca_descending_spectrum",
                    "pca_spectrum_valid", "pca_parseval_bound")),

    // Johnson-Lindenstrauss sparse random projection (Achlioptas ±1
    // signs), the data-INDEPENDENT reducer next to PCA. Signs derive
    // from md5 and embeddings are fixed-pointed (1e4, exact in
    // doubles), so DuckDB replays the whole projection bit-exactly —
    // the q_minhash_replay convention applied to dim reduction.
    "q_jl_project" -> q(
      c => {
        val k = 8
        val signs = DimReduce.jlSigns(k, d = 64)
        val base = c.embeddings.select(col("vec_id"),
          transform(col("embedding"),
            e => floor(e.cast("double") * 10000 + 0.5)).as("iv"))
        val projs = (0 until k).map { j =>
          aggregate(zip_with(col("iv"), typedlit(signs(j).toSeq),
                             (x, s) => x * s),
                    lit(0.0), (a, x) => a + x).cast("long")
        }
        base.select(col("vec_id"), posexplode(array(projs: _*)))
          .select(col("vec_id"), col("pos").cast("long").as("dim_idx"),
                  col("col").as("proj"))
      },
      """WITH signs AS (
        | SELECT j, [CASE WHEN substr(md5('jl' || j::VARCHAR || '_' || i::VARCHAR), 1, 1)
        |              BETWEEN '0' AND '7' THEN 1.0 ELSE -1.0 END
        |            FOR i IN range(0, 64)] AS s
        | FROM (SELECT unnest(range(0, 8)) AS j)
        |), iv AS (
        | SELECT vec_id,
        |  [floor(CAST(e AS DOUBLE) * 10000 + 0.5) FOR e IN embedding] AS v
        | FROM embeddings
        |)
        |SELECT iv.vec_id, CAST(s.j AS BIGINT) AS dim_idx,
        | CAST(list_dot_product(iv.v, s.s) AS BIGINT) AS proj
        |FROM iv CROSS JOIN signs s""".stripMargin),

    // ONE power-iteration step under a hash-matched oracle (the
    // q_minhash_replay convention applied to PCA): the core of
    // [[graft.similarity.DimReduce]]'s eigensolve is repeated
    // second-moment-times-vector products w = Σ_rows x·(xᵀv); with the
    // deterministic start vector v₀ = 1 and embeddings integerized
    // (×10⁴, the q_jl_project convention) the whole step is exact
    // integer arithmetic, so DuckDB replays it bit-for-bit. The full
    // eigendecomposition stays rows-only (golden eigenpairs in
    // DimReduceSpec); this pins the per-iteration mechanism. Scale:
    // xᵀv₀ is a map-side fold; the per-dimension Σ is a 64-group
    // partial-aggregated shuffle — no driver matrix, no collect.
    "q_power_iter_replay" -> q(
      c => {
        val iv = c.embeddings.select(col("vec_id"),
          transform(col("embedding"),
            e => floor(e.cast("double") * 10000 + 0.5).cast("long")).as("v"))
        val dotted = iv.withColumn("dot",
          aggregate(col("v"), lit(0L), (a, x) => a + x))
        dotted.select(col("dot"), posexplode(col("v")))
          .groupBy(col("pos").cast("long").as("dim_idx"))
          .agg(sum(col("col") * col("dot")).as("w"))
      },
      """WITH iv AS (
        | SELECT vec_id,
        |  [CAST(floor(CAST(e AS DOUBLE) * 10000 + 0.5) AS BIGINT)
        |   FOR e IN embedding] AS v
        | FROM embeddings
        |), s AS (
        | SELECT vec_id, v, list_sum(v) AS dot FROM iv
        |)
        |SELECT g.i AS dim_idx,
        | CAST(sum(s.v[CAST(g.i AS INT) + 1] * s.dot) AS BIGINT) AS w
        |FROM s, (SELECT unnest(range(0, 64)) AS i) g
        |GROUP BY 1""".stripMargin),

    // TWO chained power-iteration steps (r8 verdict ask #6): the
    // depth-1 replay pins one moment-product; state-threading bugs
    // live in the HANDOFF — normalize the step-1 vector, feed it back,
    // multiply again. The inter-step normalization is the production
    // shape (scale to unit-ish magnitude) made exactly replayable:
    // v1[d] = floor((w1[d]/max|w1|)·10⁴ + 0.5) — one IEEE divide, one
    // multiply, one floor, bit-identical in any IEEE engine — then
    // step 2 is again exact integer arithmetic (|w2| ≤ n·10⁴·64·10⁸ <
    // 2⁶³ at any test sf). Both steps and the handoff hash-match.
    "q_power_iter2_replay" -> q(
      c => {
        val iv = c.embeddings.select(col("vec_id"),
          transform(col("embedding"),
            e => floor(e.cast("double") * 10000 + 0.5).cast("long")).as("v"))
          .localCheckpoint() // two moment passes read it
        val dotted = iv.withColumn("dot",
          aggregate(col("v"), lit(0L), (a, x) => a + x))
        val w1 = dotted.select(col("dot"), posexplode(col("v")))
          .groupBy(col("pos").cast("long").as("dim_idx"))
          .agg(sum(col("col") * col("dot")).as("w1"))
        // normalize: one 64-row frame; the max broadcasts
        val mx = w1.agg(max(abs(col("w1"))).as("mx"))
        val v1 = w1.crossJoin(broadcast(mx))
          .select(col("dim_idx"), col("w1"),
            floor((col("w1").cast("double") / col("mx").cast("double"))
              * 10000 + 0.5).cast("long").as("v1"))
          .localCheckpoint() // feeds the row-dot join AND the output join
        // step 2: dot2 = vᵀ·v1 per row (explode + 64-row broadcast
        // join — v1 is dimension-indexed, not a literal), then the
        // same per-dimension moment aggregate
        val dot2 = iv.select(col("vec_id"), posexplode(col("v")))
          .join(broadcast(v1.select(col("dim_idx"),  col("v1"))),
                col("pos").cast("long") === col("dim_idx"))
          .groupBy("vec_id").agg(sum(col("col") * col("v1")).as("dot2"))
        val w2 = iv.join(dot2, "vec_id")
          .select(col("dot2"), posexplode(col("v")))
          .groupBy(col("pos").cast("long").as("dim_idx"))
          .agg(sum(col("col") * col("dot2")).as("w2"))
        v1.join(w2, "dim_idx")
          .select(col("dim_idx"), col("w1"), col("v1"), col("w2"))
      },
      """WITH iv AS (
        | SELECT vec_id,
        |  [CAST(floor(CAST(e AS DOUBLE) * 10000 + 0.5) AS BIGINT)
        |   FOR e IN embedding] AS v
        | FROM embeddings
        |), s AS (
        | SELECT vec_id, v, list_sum(v) AS dot FROM iv
        |), w1 AS (
        | SELECT g.i AS dim_idx,
        |  CAST(sum(s.v[CAST(g.i AS INT) + 1] * s.dot) AS BIGINT) AS w1
        | FROM s, (SELECT unnest(range(0, 64)) AS i) g
        | GROUP BY 1
        |), v1 AS (
        | SELECT dim_idx, w1,
        |  CAST(floor((CAST(w1 AS DOUBLE) /
        |    CAST((SELECT max(abs(w1)) FROM w1) AS DOUBLE)) * 10000 + 0.5)
        |   AS BIGINT) AS v1
        | FROM w1
        |), d2 AS (
        | SELECT iv.vec_id, iv.v,
        |  CAST(sum(iv.v[CAST(v1.dim_idx AS INT) + 1] * v1.v1) AS BIGINT) AS dot2
        | FROM iv, v1 GROUP BY 1, 2
        |), w2 AS (
        | SELECT g.i AS dim_idx,
        |  CAST(sum(d2.v[CAST(g.i AS INT) + 1] * d2.dot2) AS BIGINT) AS w2
        | FROM d2, (SELECT unnest(range(0, 64)) AS i) g
        | GROUP BY 1
        |)
        |SELECT v1.dim_idx, v1.w1, v1.v1, w2.w2
        |FROM v1 JOIN w2 ON v1.dim_idx = w2.dim_idx""".stripMargin),

    // TF-IDF-style keyword extraction (rational idf surrogate
    // tf·N/df — no transcendentals, which differ in the last ulp
    // across libm implementations): top-3 keywords per document.
    "q_tfidf_keywords" -> q(
      c => {
        val tokens = c.documents.select(col("doc_id"),
          explode_outer(TF.words(col("text"))).as("word"))
          .filter(col("word").isNotNull)
        // localCheckpoint: tf feeds both the document-frequency
        // aggregate and the scoring join; without it the token explode
        // + (doc, word) shuffle run twice (ReuseExchange can't match
        // the branches). Materializing tf costs one copy of the very
        // shuffle output the second derivation would recompute.
        val tf = tokens.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
          .localCheckpoint()
        val df_ = tf.groupBy("word").agg(count(lit(1)).as("df"))
        val n = c.documents.agg(count(lit(1)).as("n_docs"))
        // df_ has one row per distinct word — vocabulary-sized, far past
        // broadcast limits at corpus scale. Both sides already key on
        // `word`, so let the join shuffle; only the 1-row count broadcasts.
        val scored = tf.join(df_, "word")
          .crossJoin(broadcast(n))
          .withColumn("score", col("tf") * col("n_docs") / col("df"))
        val w = Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("word"))
        scored.withColumn("rk", row_number().over(w).cast("long"))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("word"), rnd4(col("score")).as("score"),
                  col("rk"))
      },
      """WITH tokens AS (
        | SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS word
        | FROM documents
        |), tf AS (
        | SELECT doc_id, word, count(*) AS tf FROM tokens GROUP BY 1, 2
        |), df AS (
        | SELECT word, count(*) AS df FROM tf GROUP BY 1
        |), scored AS (
        | SELECT tf.doc_id, tf.word,
        |  tf.tf * (SELECT count(*) FROM documents) / df.df AS score
        | FROM tf JOIN df ON tf.word = df.word
        |)
        |SELECT doc_id, word,
        | floor(score * 10000 + 0.5) / 10000 AS score, rk
        |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |   ORDER BY score DESC, word) AS BIGINT) AS rk FROM scored)
        |WHERE rk <= 3""".stripMargin),

    // exact-distinct's documented scale escape hatch (SURVEY §2.4):
    // HLL sketches differ across engines, so rows-only; relative
    // error vs exact is pinned in ScalaTest
    // decomposed per key: two distinct GROUPS in one agg would Expand
    // every row 2x before the shuffle (the department_analytics
    // lesson); per-key branches each keep the single-distinct-group
    // no-Expand plan over a one-column pruned scan, and the 1-row
    // results cross-join for free
    "q_approx_distinct" -> q(
      c => c.lineitem.agg(
          countDistinct("l_orderkey").as("exact_orders"),
          approx_count_distinct("l_orderkey").as("approx_orders"))
        .crossJoin(c.lineitem.agg(
          countDistinct("l_partkey").as("exact_parts"),
          approx_count_distinct("l_partkey").as("approx_parts")))),

    // q_approx_distinct's PlanSpec error pin lifted into the driver
    // gate. Floor is 10 % = 2x the sketch's 5 % rsd (one STANDARD
    // DEVIATION): the estimate legitimately excursions past 1 sigma at
    // some cardinalities (7.8 % on the 1.47M-order sf1 fixture), so
    // the scale-robust gate sits at 2 sigma while PlanSpec keeps the
    // tighter 5 % pin at the driver-gate scale.
    "q_approx_distinct_check" -> q(
      c => {
        val stats = c.lineitem.agg(
          countDistinct("l_orderkey").as("eo"),
          approx_count_distinct("l_orderkey").as("ao"),
          countDistinct("l_partkey").as("ep"),
          approx_count_distinct("l_partkey").as("ap"))
        Checks.fromFlags(stats,
          "hll_orders_within_10pct" -> (abs(col("ao") - col("eo")) * 10 <= col("eo")),
          "hll_parts_within_10pct" -> (abs(col("ap") - col("ep")) * 10 <= col("ep")))
      },
      Checks.oracle("hll_orders_within_10pct", "hll_parts_within_10pct")),

    // the distinct-SKETCH mechanism under a hash-matched oracle (the
    // q_minhash_replay convention applied to cardinality estimation):
    // HLL registers aren't portable across engines, but the K-minimum-
    // values estimator — hash every value, keep the k smallest DISTINCT
    // hashes, estimate (k−1)/h₍k₎ — is the same order-statistics idea
    // and IS exact relational algebra when the hash is md5. Both
    // engines take the 256 smallest 32-bit hash prefixes and integer-
    // divide, so the estimate (2102 vs 2000 exact at sf0.01 — honest
    // ~5 % sketch error) matches bit-for-bit. Scale: orderBy+limit
    // plans as TakeOrdered (per-partition top-k, merge of 256-row
    // heaps) — exactly how a distributed KMV sketch merges; no full
    // sort, no collect. q_approx_distinct keeps the production HLL
    // path with its error pinned in ScalaTest.
    "q_kmv_replay" -> q(
      c => {
        graft.functions.NativeFunctions.register(c.spark)
        // graft_md5_bits(x, 8) ≡ conv(substring(md5(x),1,8),16,10):
        // first 4 digest bytes as an unsigned int, straight off the
        // digest — no per-row 32-char hex string at 6M rows/sf1
        val h = c.lineitem.select(
            graft.functions.NativeFunctions.md5Bits(
                col("l_partkey").cast("string"), 8).as("hv"))
          .distinct()
        h.orderBy(col("hv")).limit(256)
          .agg(count(lit(1)).as("k_used"), max(col("hv")).as("hk"),
               // below k distinct hashes the sketch IS the distinct set
               // (exact count) — same rule as functions.Kmv.estimate
               expr("CASE WHEN count(1) < 256 THEN count(1)" +
                    " ELSE (255 * 4294967296) div max(hv) END")
                 .as("kmv_estimate"))
          .crossJoin(c.lineitem.agg(
            countDistinct("l_partkey").as("exact_distinct")))
      },
      """WITH h AS (
        | SELECT DISTINCT
        |  CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8)
        |       AS BIGINT) AS hv
        | FROM lineitem
        |), k AS (SELECT hv FROM h ORDER BY hv LIMIT 256)
        |SELECT count(*) AS k_used, max(hv) AS hk,
        | CASE WHEN count(*) < 256 THEN count(*)
        |      ELSE (255 * 4294967296) // max(hv) END AS kmv_estimate,
        | (SELECT count(DISTINCT l_partkey) FROM lineitem) AS exact_distinct
        |FROM k""".stripMargin),

    // ── multimodal plumbing ───────────────────────────────────────────
    "q_multimodal_features" -> q(
      c => Multimodal.fromDocuments(c.documents).select(
        col("asset_id"), col("meta.kind").as("kind"),
        col("meta.byte_len").as("byte_len"),
        sha2(col("payload"), 256).as("sha")),
      """SELECT doc_id AS asset_id, 'text' AS kind,
        | CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        | sha256(text) AS sha
        |FROM documents""".stripMargin),

    // REAL image decode (javax.imageio, pure JDK) over a mixed batch:
    // every non-10th doc becomes an actual PNG (synthetic formula
    // pixels through the real encoder), every 10th keeps undecodable
    // text bytes. PNG is lossless, so the DECODED per-channel sums
    // equal the source formula's closed form — the oracle replays that
    // formula over (x, y) grids while Spark ran a genuine codec
    // round-trip; text rows come back as labeled err rows with NULL
    // stats. Exercises decode + the degraded path in one hash-matched
    // query.
    "q_multimodal_decode" -> q(
      c => Multimodal.decodeImages(Multimodal.pngAssets(c.documents))
        .toDF()
        .select(col("asset_id"), col("width"), col("height"),
                col("sum_r"), col("sum_g"), col("sum_b"), col("err")),
      """WITH img AS (
        | SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
        | FROM documents WHERE doc_id % 10 <> 0
        |), px AS (
        | SELECT i.doc_id, i.w, i.h, x.x, y.y
        | FROM img i
        | CROSS JOIN (SELECT unnest(range(0, 9)) AS x) x
        | CROSS JOIN (SELECT unnest(range(0, 7)) AS y) y
        | WHERE x.x < i.w AND y.y < i.h
        |), sums AS (
        | SELECT doc_id, max(w) AS w, max(h) AS h,
        |  sum((x*7 + y*13 + doc_id) % 256) AS sum_r,
        |  sum((x*3 + y*11 + 2*doc_id) % 256) AS sum_g,
        |  sum((x*5 + y + 3*doc_id) % 256) AS sum_b
        | FROM px GROUP BY doc_id
        |)
        |SELECT doc_id AS asset_id, CAST(w AS INTEGER) AS width,
        | CAST(h AS INTEGER) AS height, CAST(sum_r AS BIGINT) AS sum_r,
        | CAST(sum_g AS BIGINT) AS sum_g, CAST(sum_b AS BIGINT) AS sum_b,
        | CAST(NULL AS VARCHAR) AS err
        |FROM sums
        |UNION ALL
        |SELECT doc_id AS asset_id, NULL, NULL, NULL, NULL, NULL,
        | 'not_decodable' AS err
        |FROM documents WHERE doc_id % 10 = 0""".stripMargin),

    // frame-sampling stub (1→N video shape): the oracle replays the
    // frame arithmetic (fixed 256-byte frames, every 2nd sampled,
    // trailing partial dropped, short payloads yield one short frame)
    "q_multimodal_frames" -> q(
      c => Multimodal
        .frameSampleStub(Multimodal.fromDocuments(c.documents),
                         everyNth = 2, frameBytes = 256)
        .toDF()
        .groupBy(col("asset_id"))
        .agg(count(lit(1)).as("n_frames"),
             sum(octet_length(col("frame_bytes")).cast("long")).as("sampled_bytes")),
      """WITH a AS (
        | SELECT doc_id AS asset_id, octet_length(encode(text)) AS blen
        | FROM documents
        |), f AS (
        | SELECT asset_id, blen, greatest(1, blen // 256) AS nf FROM a
        |)
        |SELECT asset_id,
        | CAST((nf + 1) // 2 AS BIGINT) AS n_frames,
        | CAST(CASE WHEN blen < 256 THEN blen
        |           ELSE 256 * ((nf + 1) // 2) END AS BIGINT) AS sampled_bytes
        |FROM f""".stripMargin),

    // built-in session_window in batch (the native API twin of the
    // lag+running-sum sessionizer): sessions merge while the gap is
    // STRICTLY under 48 h — the oracle replays that boundary exactly
    // (>= 172800 starts a new session). ts truncated to seconds on
    // both sides so the boundary comparison sees identical values.
    "q_session_window" -> q(
      c => c.events
        .select(col("user_id"), date_trunc("second", col("ts")).as("tss"))
        .groupBy(col("user_id"), session_window(col("tss"), "48 hours").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
                unix_timestamp(col("sw.start")).as("start_sec"),
                unix_timestamp(col("sw.end")).as("end_sec"),
                col("n_events")),
      """WITH e AS (
        | SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
        |), g AS (
        | SELECT user_id, sec,
        |  CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w >= 172800
        |       THEN 1 ELSE 0 END AS is_new
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec)
        |), s AS (
        | SELECT user_id, sec,
        |  sum(is_new) OVER (PARTITION BY user_id ORDER BY sec
        |       ROWS UNBOUNDED PRECEDING) AS sid
        | FROM g
        |)
        |SELECT user_id, min(sec) AS start_sec,
        | max(sec) + 172800 AS end_sec, count(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin),

    // the classic MinHash pipeline over SHINGLES
    // (shingle→minhash→band→bucket-join): 3-word shingles are order-
    // SENSITIVE, so reordered rewrites that bag-of-words Jaccard calls
    // near-dups correctly do NOT match here (exhaustive ground truth on
    // this corpus: exactly one pair ≥ 0.5, J = 0.97 — verified in
    // DuckDB). r9: Md5Hash mode + a full-pipeline twin makes this
    // oracle-checked end to end — the twin replays the banding, so
    // recall < 1 no longer blocks the hash match.
    "q_minhash_shingles" -> q(
      c => {
        // materialize the words array behind a project boundary before
        // shingling: TF.shingles(TF.words(...), 3) would inline the
        // regex split into every element_at inside the transform lambda
        // (~3·n_shingles splits per doc, interpreted)
        val sh = c.documents
          .withColumn("w", TF.words(col("text")))
          .select(col("doc_id"), col("source"),
                  array_distinct(TF.shingles(col("w"), 3)).as("sh"))
        // 8×8 banding like q_minhash_neardup: this corpus's word-set
        // dups are order-shuffled (shingle-J ≈ 0), so loose banding
        // would drown the join in candidates that all verify to 0
        MinHashLSH.nearDuplicates(sh, "doc_id", "sh",
            k = 64, bands = 8, threshold = 0.8, blockCol = Some("source"),
            mode = MinHashLSH.Md5Hash)
          .select(col("id_a"), col("id_b"), rnd4(col("jaccard")).as("jaccard"))
      },
      minhashNeardupSql(
        from = """(SELECT doc_id, source,
                  | regexp_split_to_array(trim(text), '\s+') AS w
                  |FROM documents)""".stripMargin,
        tokensExpr = """list_distinct(
                       | CASE WHEN len(w) < 3 THEN CAST([] AS VARCHAR[])
                       |  ELSE [w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                       |        FOR i IN range(0, len(w) - 2)]
                       | END)""".stripMargin,
        bands = 8, rowsPerBand = 8, threshold = "0.8")),

    // The shingle-MinHash MECHANISM under a hash-matched oracle:
    // q_minhash_replay proved word-SET minhash replays in DuckDB; this
    // adds the ORDER-SENSITIVE shingle construction (space-joined
    // 3-word windows, exactly TF.shingles) to the replayed pipeline,
    // so the q_minhash_shingles signature path — shingling, distinct,
    // per-plane md5 min — is pinned bit-exactly end to end. The
    // production query keeps xxhash + banding with its golden pins.
    "q_shingle_replay" -> q(
      c => {
        val d = c.documents
          .withColumn("w", TF.words(col("text")))
          .select(col("doc_id"),
                  array_distinct(TF.shingles(col("w"), 3)).as("sh"))
        def mh(j: Int) = array_min(transform(col("sh"),
          s => md5(concat(lit(s"$j:"), s).cast("binary")))).as(s"mh$j")
        d.select(col("doc_id"), mh(0), mh(1), mh(2), mh(3))
      },
      """WITH w AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
        | FROM documents
        |), d AS (
        | SELECT doc_id, list_distinct(
        |  CASE WHEN len(ws) < 3 THEN CAST([] AS VARCHAR[])
        |   ELSE [ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
        |         FOR i IN range(0, len(ws) - 2)]
        |  END) AS sh
        | FROM w
        |)
        |SELECT doc_id,
        | list_min(list_transform(sh, s -> md5('0:' || s))) AS mh0,
        | list_min(list_transform(sh, s -> md5('1:' || s))) AS mh1,
        | list_min(list_transform(sh, s -> md5('2:' || s))) AS mh2,
        | list_min(list_transform(sh, s -> md5('3:' || s))) AS mh3
        |FROM d""".stripMargin),

    // stateful sessionizer (flatMapGroupsWithState) run in batch mode:
    // emits every CLOSED session, i.e. q_sessionize minus each user's
    // final (still-open) session — which IS SQL-expressible: sessions
    // as in q_sessionize, dropping each user's max session id
    "q_sessionize_stateful" -> q(
      c => graft.streaming.SessionizeStream
        .sessionize(c.events, gapSeconds = 172800).toDF(),
      """WITH e AS (
        | SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) sec FROM events
        |), g AS (
        | SELECT user_id, event_id, sec,
        |  CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 172800
        |       THEN 1 ELSE 0 END AS is_new
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
        |), s AS (
        | SELECT user_id, sec,
        |  sum(is_new) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |       ROWS UNBOUNDED PRECEDING) AS sid
        | FROM g
        |), agg AS (
        | SELECT user_id, sid, min(sec) AS start_sec, max(sec) AS end_sec,
        |  count(*) AS n_events
        | FROM s GROUP BY 1, 2
        |)
        |SELECT user_id, start_sec, end_sec, n_events FROM (
        | SELECT *, max(sid) OVER (PARTITION BY user_id) AS last_sid FROM agg
        |) WHERE sid < last_sid""".stripMargin),

    // ── sessionization (gap-based, lag + running sum) ─────────────────
    "q_sessionize" -> q(
      c => {
        val e = c.events.select(col("user_id"), col("event_id"),
                                col("ts").cast("long").as("sec"))
        val wOrd = Window.partitionBy("user_id").orderBy("sec", "event_id")
        val tagged = e
          .withColumn("prev", lag("sec", 1).over(wOrd))
          .withColumn("is_new",
            when(col("prev").isNull || col("sec") - col("prev") > 172800, 1)
              .otherwise(0))
          .withColumn("session_id",
            sum("is_new").over(
              wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        tagged.groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
               min("sec").as("start_sec"),
               max("sec").as("end_sec"),
               (max("sec") - min("sec")).as("duration"))
      },
      """WITH e AS (
        | SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) sec FROM events
        |), g AS (
        | SELECT user_id, event_id, sec,
        |  CASE WHEN lag(sec) OVER w IS NULL OR sec - lag(sec) OVER w > 172800
        |       THEN 1 ELSE 0 END AS is_new
        | FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
        |), s AS (
        | SELECT user_id, sec,
        |  CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY sec, event_id
        |       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        | FROM g
        |)
        |SELECT user_id, session_id, count(*) AS n_events,
        | min(sec) AS start_sec, max(sec) AS end_sec,
        | max(sec) - min(sec) AS duration
        |FROM s GROUP BY 1, 2""".stripMargin),

    // ── chunk-level boilerplate removal (MassiveText/RefinedWeb line
    // dedup, with fixed 10-word chunks as the "line" unit — this corpus
    // has no newline/sentence structure). Chunks appearing in ≥3
    // distinct docs are boilerplate and are dropped from every doc;
    // the remainder is reassembled in original order. Both shuffles
    // key on high-cardinality columns (chunk text, then doc_id), so
    // the plan holds at corpus scale; no step is quadratic. ──────────
    "q_chunk_dedup" -> q(
      c => {
        val k = 10
        val docs = c.documents
          .withColumn("__a", TF.words(lower(col("text"))))
          .withColumn("__chunks",
            transform(sequence(lit(1), ceil(size(col("__a")) / lit(k.toDouble)).cast("int")),
              i => concat_ws(" ", slice(col("__a"), (i - lit(1)) * k + lit(1), lit(k)))))
          .select(col("doc_id"),
                  size(col("__chunks")).cast("long").as("n_chunks"),
                  col("__chunks"))
        // posexplode_outer + isNotNull: the generated-attribute filter
        // keeps InferFiltersFromGenerate from re-deriving __chunks
        // below the projection that materialized __a
        val chunks = docs
          .select(col("doc_id"), col("n_chunks"),
                  posexplode_outer(col("__chunks")).as(Seq("pos", "chunk")))
          .filter(col("chunk").isNotNull)
        val shared = chunks.groupBy("chunk")
          .agg(countDistinct("doc_id").as("nd"))
        val re = chunks.join(shared, Seq("chunk")).filter(col("nd") < 3)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_kept"),
               concat_ws(" ", transform(
                 array_sort(collect_list(struct(col("pos"), col("chunk")))),
                 x => x.getField("chunk"))).as("cleaned"))
        docs.select("doc_id", "n_chunks")
          .join(re, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("n_chunks"),
                  coalesce(col("n_kept"), lit(0L)).as("n_kept"),
                  md5(coalesce(col("cleaned"), lit("")).cast("binary"))
                    .as("cleaned_fp"))
      },
      """WITH w AS (
        | SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS a
        | FROM documents
        |), base AS (
        | SELECT doc_id, CAST(ceil(len(a) / 10.0) AS BIGINT) AS n_chunks, a
        | FROM w
        |), ch AS (
        | SELECT doc_id, n_chunks, i AS pos,
        |  array_to_string(a[(i-1)*10+1 : i*10], ' ') AS chunk
        | FROM base, unnest(generate_series(1, n_chunks)) AS t(i)
        |), d AS (
        | SELECT chunk, count(DISTINCT doc_id) AS nd FROM ch GROUP BY 1
        |), re AS (
        | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |  md5(string_agg(chunk, ' ' ORDER BY pos)) AS cleaned_fp
        | FROM ch JOIN d USING (chunk) WHERE nd < 3 GROUP BY 1
        |)
        |SELECT b.doc_id, b.n_chunks, coalesce(re.n_kept, 0) AS n_kept,
        | coalesce(re.cleaned_fp, md5('')) AS cleaned_fp
        |FROM (SELECT doc_id, n_chunks FROM base) b
        |LEFT JOIN re USING (doc_id)""".stripMargin),

    // ── content-defined chunking (ROLLING-hash fingerprinting, the
    // gear/Rabin CDC family): a chunk boundary falls wherever the
    // rolling hash of the trailing 4-word window lands in a 1/16
    // target band — boundaries depend on LOCAL content only, so an
    // insertion re-chunks one neighborhood while fixed-k chunking
    // (q_chunk_dedup) shifts every downstream chunk. The rolling
    // window is 3 codegen'd lags (no per-position substring loops),
    // chunk ids are a per-doc prefix sum, and cross-doc dedup is one
    // shuffle on chunk text — every window partitions by doc_id, so
    // nothing grows beyond doc length. Output per doc: chunk count,
    // chunks shared with other docs, and an order-sensitive doc
    // fingerprint over the chunk hashes. ─────────────────────────────
    "q_cdc_chunks" -> q(
      c => {
        val pos = c.documents
          // NO pre-explode repartition here (unlike q_substring_dedup):
          // the very next operator is a window keyed on doc_id whose
          // shuffle already parallelizes the heavy per-position md5 —
          // an extra exchange costs what it saves (measured)
          .select(col("doc_id"),
                  posexplode_outer(TF.words(lower(col("text"))))
                    .as(Seq("pos", "word")))
          .filter(col("word").isNotNull)
        val wOrd = Window.partitionBy("doc_id").orderBy("pos")
        val winStr = concat_ws(" ",
          lag(col("word"), 3).over(wOrd), lag(col("word"), 2).over(wOrd),
          lag(col("word"), 1).over(wOrd), col("word"))
        val tagged = pos
          .withColumn("bnd",
            when(substring(md5(winStr.cast("binary")), 1, 1) === "0", 1)
              .otherwise(0))
          .withColumn("chunk_id", coalesce(
            sum(col("bnd")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)),
            lit(0)))
        val chunks = tagged.groupBy(col("doc_id"), col("chunk_id"))
          .agg(concat_ws(" ", transform(
                 array_sort(collect_list(struct(col("pos"), col("word")))),
                 x => x.getField("word"))).as("chunk"))
          .withColumn("cfp", md5(col("chunk").cast("binary")))
        val shared = chunks.groupBy("chunk")
          .agg(countDistinct("doc_id").as("nd"))
        chunks.join(shared, Seq("chunk"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"),
               count(when(col("nd") > 1, 1)).as("dup_chunks"),
               md5(concat_ws("|", transform(
                     array_sort(collect_list(struct(col("chunk_id"), col("cfp")))),
                     x => x.getField("cfp"))).cast("binary")).as("doc_fp"))
      },
      """WITH w AS (
        | SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS a
        | FROM documents
        |), p AS (
        | SELECT doc_id, i - 1 AS pos, a[i] AS word
        | FROM w, unnest(generate_series(1, len(a))) AS t(i)
        |), b AS (
        | SELECT doc_id, pos, word,
        |  CASE WHEN substring(md5(concat_ws(' ',
        |    lag(word, 3) OVER win, lag(word, 2) OVER win,
        |    lag(word, 1) OVER win, word)), 1, 1) = '0' THEN 1 ELSE 0 END AS bnd
        | FROM p WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
        |), t2 AS (
        | SELECT doc_id, pos, word,
        |  coalesce(sum(bnd) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
        | FROM b
        |), ch AS (
        | SELECT doc_id, chunk_id, string_agg(word, ' ' ORDER BY pos) AS chunk
        | FROM t2 GROUP BY 1, 2
        |), cf AS (
        | SELECT doc_id, chunk_id, chunk, md5(chunk) AS cfp FROM ch
        |), d AS (
        | SELECT chunk, count(DISTINCT doc_id) AS nd FROM cf GROUP BY 1
        |)
        |SELECT cf.doc_id,
        | count(*) AS n_chunks,
        | count(CASE WHEN d.nd > 1 THEN 1 END) AS dup_chunks,
        | md5(string_agg(cfp, '|' ORDER BY chunk_id)) AS doc_fp
        |FROM cf JOIN d ON cf.chunk = d.chunk
        |GROUP BY 1""".stripMargin),

    // ── winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    // scheme): hash every k-word gram, then in each window of w
    // consecutive gram hashes select the minimum (rightmost on ties —
    // encoded by appending the 9-digit REVERSED gram position to the
    // md5, so one lexicographic min does hash-then-rightmost in a
    // single windowed min both engines evaluate identically). The
    // selected set is position-robust: any shared run of ≥ w+k-1
    // words is guaranteed to contribute a common fingerprint, and
    // density is ~2/(w+1) of grams regardless of doc length. Both
    // window passes partition by doc_id and share one sort order, so
    // the whole per-doc half is ONE shuffle; nothing is
    // corpus-quadratic. ──────────────────────────────────────────────
    "q_winnow" -> q(
      c => {
        val base = winnowBase(c)
        val agg = winnowSelected(c).groupBy("doc_id").agg(
          count(lit(1)).as("n_fps"),
          md5(concat_ws("|", array_sort(collect_list(col("sel"))))
            .cast("binary")).as("fps_fp"))
        base.join(agg, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("n_grams"),
                  coalesce(col("n_fps"), lit(0L)).as("n_fps"),
                  coalesce(col("fps_fp"), md5(lit("").cast("binary")))
                    .as("fps_fp"))
      },
      s"""WITH $winnowSelSql, ag AS (
        | SELECT doc_id, count(*) AS n_fps,
        |  md5(string_agg(sel, '|' ORDER BY sel)) AS fps_fp
        | FROM sl GROUP BY 1
        |)
        |SELECT b.doc_id,
        | greatest(CAST(len(b.a) AS BIGINT) - 3, 0) AS n_grams,
        | coalesce(ag.n_fps, 0) AS n_fps,
        | coalesce(ag.fps_fp, md5('')) AS fps_fp
        |FROM wd b LEFT JOIN ag USING (doc_id)""".stripMargin),

    // ── winnow-based partial-overlap detection (what MOSS does with
    // the fingerprints): doc pairs sharing ≥ 3 selected hashes, with
    // containment = shared / smaller fingerprint set. Fingerprints in
    // > 50 distinct docs are dropped first (the standard
    // stop-fingerprint rule) — that bound caps every join bucket's
    // fan-out at 50²/2 pairs per hash, so candidate generation stays
    // linear in corpus size however common the boilerplate; without
    // it one hot gram would produce a quadratic bucket. All shuffles
    // key on the high-cardinality fp or on doc_id. ───────────────────
    "q_winnow_overlap" -> q(
      c => {
        // localCheckpoint: fps feeds FOUR downstream branches (stop-fp
        // count, kept join, both pair sides via kept, per-doc totals)
        // whose differing pushed-down projections defeat ReuseExchange
        // — without it the corpus-scale token+window pipeline executes
        // up to 8x (16 Window nodes in the uncheckpointed plan). The
        // checkpoint pins the fingerprint set (corpus-fingerprint-
        // sized, ~0.3 rows/gram) and every branch reads THAT.
        val fps = winnowSelected(c)
          .select(col("doc_id"), substring(col("sel"), 1, 32).as("fp"))
          .distinct()
          .localCheckpoint()
        // fps is distinct (doc_id, fp), so count(*) IS the doc count
        val keptFp = fps.groupBy("fp")
          .agg(count(lit(1)).as("nd")).filter(col("nd") <= 50)
        val kept = fps.join(keptFp.select("fp"), Seq("fp"))
          .localCheckpoint()
        val perDoc = kept.groupBy("doc_id").agg(count(lit(1)).as("n_fp"))
        val pairs = kept.select(col("fp"), col("doc_id").as("id_a"))
          .join(kept.select(col("fp"), col("doc_id").as("id_b")), Seq("fp"))
          .filter(col("id_a") < col("id_b"))
          .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 3)
        pairs
          .join(perDoc.select(col("doc_id").as("id_a"), col("n_fp").as("n_a")),
                Seq("id_a"))
          .join(perDoc.select(col("doc_id").as("id_b"), col("n_fp").as("n_b")),
                Seq("id_b"))
          .select(col("id_a"), col("id_b"), col("n_shared"),
                  rnd4(col("n_shared").cast("double") /
                       least(col("n_a"), col("n_b"))).as("containment"))
      },
      s"""WITH $winnowSelSql, fp AS (
        | SELECT DISTINCT doc_id, substring(sel, 1, 32) AS fp FROM sl
        |), kf AS (
        | SELECT fp FROM (SELECT fp, count(*) AS nd FROM fp GROUP BY 1)
        | WHERE nd <= 50
        |), kept AS (
        | SELECT fp.doc_id, fp.fp FROM fp JOIN kf USING (fp)
        |), n AS (
        | SELECT doc_id, count(*) AS n_fp FROM kept GROUP BY 1
        |), pr AS (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        | FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
        | GROUP BY 1, 2 HAVING count(*) >= 3
        |)
        |SELECT pr.id_a, pr.id_b, pr.n_shared,
        | floor(CAST(pr.n_shared AS DOUBLE) / least(na.n_fp, nb.n_fp)
        |       * 10000 + 0.5) / 10000 AS containment
        |FROM pr
        |JOIN n na ON na.doc_id = pr.id_a
        |JOIN n nb ON nb.doc_id = pr.id_b""".stripMargin),

    // ── exact duplicated-substring detection (the suffix-array dedup
    // family, Lee et al. 2022 "Deduplicating Training Data Makes
    // Language Models Better"): find every maximal token span of
    // length ≥ L that some OTHER document also contains, and report
    // per doc how much of it is such boilerplate. Spark-first shape:
    // a suffix array is a single-machine structure, but its product —
    // "which length-L windows repeat across docs" — is exactly an
    // L-gram self-aggregation: hash every L-token window (one derived
    // array per doc, no per-position substring loops), one shuffle on
    // the gram to find cross-doc grams, a semi-join back, then a
    // per-doc gaps-and-islands merge of overlapping windows into
    // maximal spans. Every stage keys on gram or doc_id — nothing is
    // corpus-quadratic, and window state is bounded by doc length.
    // Granularity vs the true suffix array: spans shorter than L are
    // invisible (by contract), spans ≥ L are found exactly. ──────────
    "q_substring_dedup" -> q(
      c => {
        val L = 5
        val docs = c.documents
          .withColumn("__ws", TF.words(lower(col("text"))))
          .select(col("doc_id"), col("__ws"),
                  size(col("__ws")).cast("long").as("n_tokens"))
        // md5 of the joined window, not xxhash64: the oracle replays
        // the same hash, so a collision (if one ever happened) would
        // collide identically in both engines instead of diverging
        val grams = docs
          // the fixture parquet is single-row-group (unsplittable):
          // without this shuffle ONE task md5-hashes every window in
          // the corpus; repartitioned, gram generation parallelizes
          // across cores (at real scale file splits do this for free)
          .repartition(col("doc_id"))
          .select(col("doc_id"),
                  posexplode_outer(
                    // the when-guard matters: sequence(1, n-4) on a
                    // short doc (n<5) would count DOWN (Spark defaults
                    // to step -1 when start > stop), not return empty
                    when(size(col("__ws")) >= L,
                      transform(sequence(lit(1), size(col("__ws")) - (L - 1)),
                        i => md5(concat_ws(" ", slice(col("__ws"), i, lit(L)))
                                   .cast("binary")))))
                    .as(Seq("pos", "g")))
          .filter(col("g").isNotNull)
        // "appears in >1 distinct doc" ≡ min(doc)≠max(doc): one plain
        // min/max pass, no distinct-tracking aggregation state
        val crossDoc = grams.groupBy("g")
          .agg(min("doc_id").as("__mn"), max("doc_id").as("__mx"))
          .filter(col("__mn") =!= col("__mx"))
        val hits = grams.join(crossDoc, Seq("g"), "left_semi")
        // merge overlapping/adjacent [pos, pos+L-1] windows: a new
        // maximal span starts where the gap from the previous window
        // start exceeds L (strictly: next start > prev start + L)
        val wOrd = Window.partitionBy("doc_id").orderBy("pos")
        val spans = hits
          .withColumn("prev", lag("pos", 1).over(wOrd))
          .withColumn("newi",
            when(col("prev").isNull || col("pos") - col("prev") > L, 1)
              .otherwise(0))
          .withColumn("span_id",
            sum("newi").over(
              wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("doc_id"), col("span_id"))
          .agg((max("pos") - min("pos") + L).cast("long").as("cov"))
        val perDoc = spans.groupBy("doc_id")
          .agg(count(lit(1)).as("n_spans"), sum("cov").as("dup_tokens"))
        docs.select("doc_id", "n_tokens")
          .join(perDoc, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("n_tokens"),
                  coalesce(col("n_spans"), lit(0L)).as("n_spans"),
                  coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
                  // boilerplate gate at 20% — integer arithmetic, so
                  // the flag is bit-identical in every engine
                  (coalesce(col("dup_tokens"), lit(0L)) * 5 > col("n_tokens"))
                    .as("flagged"))
      },
      """WITH w AS (
        | SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS a
        | FROM documents
        |), base AS (
        | SELECT doc_id, CAST(len(a) AS BIGINT) AS n_tokens, a FROM w
        |), g AS (
        | SELECT doc_id, i AS pos,
        |  md5(array_to_string(a[i : i+4], ' ')) AS g
        | FROM base, unnest(generate_series(1, len(a) - 4)) AS t(i)
        |), d AS (
        | SELECT g FROM g GROUP BY g HAVING count(DISTINCT doc_id) > 1
        |), h AS (
        | SELECT doc_id, pos FROM g JOIN d USING (g)
        |), isl AS (
        | SELECT doc_id, pos,
        |  CASE WHEN lag(pos) OVER w IS NULL
        |         OR pos - lag(pos) OVER w > 5 THEN 1 ELSE 0 END AS newi
        | FROM h WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        |), sp AS (
        | SELECT doc_id, pos,
        |  sum(newi) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS UNBOUNDED PRECEDING) AS span_id
        | FROM isl
        |), cov AS (
        | SELECT doc_id, span_id,
        |  CAST(max(pos) - min(pos) + 5 AS BIGINT) AS cov
        | FROM sp GROUP BY 1, 2
        |), agg AS (
        | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |  CAST(sum(cov) AS BIGINT) AS dup_tokens
        | FROM cov GROUP BY 1
        |)
        |SELECT b.doc_id, b.n_tokens,
        | coalesce(agg.n_spans, 0) AS n_spans,
        | coalesce(agg.dup_tokens, 0) AS dup_tokens,
        | coalesce(agg.dup_tokens, 0) * 5 > b.n_tokens AS flagged
        |FROM base b LEFT JOIN agg USING (doc_id)""".stripMargin),

    // ── SemDeDup (Abbas et al. 2023): embedding-cosine near-dup graph
    // → connected components → one survivor (min id) per semantic
    // cluster. Pair generation here is the exact all-pairs oracle twin
    // over a FIXED 400-vector shard (% 5 under id 2000 — constant at
    // every sf, so the deliberate all-pairs step has constant cost; a
    // corpus-growing shard would be quadratic in scale); the scale
    // path is the sign-bit LSH bucketing of q_ann_lsh feeding the
    // same CC + survivor stages. ──
    "q_semdedup" -> q(
      c => {
        val all = Similarity.prepare(
          c.embeddings.filter(col("vec_id") % 5 === 0 && col("vec_id") < 2000),
          "vec_id", "embedding")
        val a = all.select(col("id").as("id_a"), col("v").as("va"),
                           col("nrm").as("na"))
        val b = all.select(col("id").as("id_b"), col("v").as("vb"),
                           col("nrm").as("nb"))
        val pairs = a.join(b, col("id_a") < col("id_b"))
          .filter(Similarity.cosine(col("va"), col("vb"),
                                    col("na"), col("nb")) >= 0.3)
          .select("id_a", "id_b")
        val comps = DedupClusters.connectedComponents(pairs)
        val labeled = all.select(col("id"))
          .join(comps, Seq("id"), "left_outer")
          .withColumn("cluster_id", coalesce(col("cluster_id"), col("id")))
        val sizes = labeled.groupBy("cluster_id")
          .agg(count(lit(1)).as("cluster_size"),
               min("id").as("__survivor"))
        labeled.join(sizes, Seq("cluster_id"))
          .select(col("id").as("vec_id"), col("cluster_id"),
                  col("cluster_size"),
                  (col("id") === col("__survivor")).as("is_survivor"))
      },
      """WITH RECURSIVE n AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
        |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |       CAST(embedding AS DOUBLE[]))) nrm
        | FROM embeddings WHERE vec_id % 5 = 0 AND vec_id < 2000
        |), pairs AS (
        | SELECT a.vec_id pa, b.vec_id pb
        | FROM n a JOIN n b ON a.vec_id < b.vec_id
        | WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.3
        |), e AS (
        | SELECT pa a, pb b FROM pairs UNION SELECT pb, pa FROM pairs
        |), reach(a, b) AS (
        | SELECT a, b FROM e
        | UNION
        | SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
        |), lab AS (
        | SELECT a AS id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
        |), labeled AS (
        | SELECT n.vec_id, coalesce(l.cluster_id, n.vec_id) AS cluster_id
        | FROM n LEFT JOIN lab l ON n.vec_id = l.id
        |), s AS (
        | SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size,
        |  min(vec_id) AS survivor FROM labeled GROUP BY 1
        |)
        |SELECT vec_id, cluster_id, cluster_size,
        | vec_id = survivor AS is_survivor
        |FROM labeled JOIN s USING (cluster_id)""".stripMargin),

    // ── bloom-prefiltered decontamination: same output as
    // q_decontaminate, but the corpus side first passes through a
    // bloom filter built (distributed, bloom_filter_agg) over the eval
    // shingle set, and only survivors reach the exact semi-join. The
    // bloom can never miss a true member, and the exact join removes
    // its false positives — so the result is exact while the join's
    // build side shrinks from all corpus shingles to ~matches + fpp.
    // At 100 TB this is the difference between shuffling the full
    // corpus shingle set and shuffling only the contaminated sliver. ──
    "q_bloom_decontaminate" -> q(
      c => {
        graft.functions.NativeFunctions.register(c.spark)
        val sh = c.documents
          .withColumn("__w", TF.words(col("text")))
          .withColumn("__sh", array_distinct(TF.shingles(col("__w"), 3)))
          .select(col("doc_id"), explode_outer(col("__sh")).as("sh"))
          .filter(col("sh").isNotNull)
        sh.filter(col("doc_id") % 97 === 0).select("sh").distinct()
          .createOrReplaceTempView("bloom_eval_sh_v")
        sh.filter(col("doc_id") % 97 =!= 0)
          .createOrReplaceTempView("bloom_corpus_sh_v")
        // scalar subquery: the bloom sketch is built distributed
        // (partial sketches OR-merged), lands as one ~100 KB constant,
        // and the probe stays inside whole-stage codegen. The IN
        // semi-join then removes bloom false positives, so the output
        // is exact (the bloom can never miss a true member).
        c.spark.sql(
          """SELECT doc_id, count(*) AS n_shared,
            | count(*) >= 2 AS contaminated
            |FROM bloom_corpus_sh_v
            |WHERE graft_might_contain(
            |   (SELECT graft_bloom_agg(xxhash64(sh), 100000L, 800000L)
            |    FROM bloom_eval_sh_v),
            |   xxhash64(sh))
            |  AND sh IN (SELECT sh FROM bloom_eval_sh_v)
            |GROUP BY doc_id""".stripMargin)
      },
      """WITH w AS (
        | SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS a FROM documents
        |), g AS (
        | SELECT DISTINCT doc_id, a[i] || ' ' || a[i + 1] || ' ' || a[i + 2] AS sh
        | FROM w, unnest(generate_series(1, len(a) - 2)) AS t(i)
        |), e AS (SELECT DISTINCT sh FROM g WHERE doc_id % 97 = 0)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared,
        | count(*) >= 2 AS contaminated
        |FROM g WHERE doc_id % 97 <> 0 AND sh IN (SELECT sh FROM e)
        |GROUP BY 1""".stripMargin),

    // ── cross-source contamination matrix: pairwise 3-gram overlap
    // between sources (the "is my web scrape leaking into my books
    // split?" audit). The unit is the distinct (source, shingle) pair
    // set — one explode + distinct, then a self-join keyed on the
    // high-cardinality shingle; output is |sources|² rows. No step is
    // corpus-quadratic: the join fan-out is bounded by how many
    // sources share each shingle (≤ |sources|). ──────────────────────
    "q_source_overlap" -> q(
      c => {
        // localCheckpoint: sh feeds three branches (per-source counts,
        // both self-join sides) — uncheckpointed, the shingle explode +
        // distinct shuffle re-execute per branch. The checkpoint stores
        // exactly one copy of that distinct's output.
        val sh = c.documents
          .withColumn("__w", TF.words(col("text")))
          .withColumn("__sh", array_distinct(TF.shingles(col("__w"), 3)))
          .select(col("source"), explode_outer(col("__sh")).as("sh"))
          .filter(col("sh").isNotNull)
          .distinct()
          .localCheckpoint()
        val counts = sh.groupBy("source").agg(count(lit(1)).as("n"))
        val shared = sh.select(col("source").as("source_a"), col("sh"))
          .join(sh.select(col("source").as("source_b"), col("sh")), "sh")
          .filter(col("source_a") < col("source_b"))
          .groupBy("source_a", "source_b")
          .agg(count(lit(1)).as("n_shared"))
        shared
          .join(broadcast(counts.select(col("source").as("source_a"),
                                        col("n").as("n_a"))), "source_a")
          .join(broadcast(counts.select(col("source").as("source_b"),
                                        col("n").as("n_b"))), "source_b")
          .select(col("source_a"), col("source_b"), col("n_shared"),
                  rnd6(col("n_shared").cast("double") /
                       (col("n_a") + col("n_b") - col("n_shared")))
                    .as("jaccard"))
      },
      """WITH w AS (
        | SELECT doc_id, source,
        |  regexp_split_to_array(trim(text), '\s+') AS a
        | FROM documents
        |), g AS (
        | SELECT DISTINCT source, a[i] || ' ' || a[i + 1] || ' ' || a[i + 2] AS sh
        | FROM w, unnest(generate_series(1, len(a) - 2)) AS t(i)
        |), n AS (SELECT source, count(*) AS n FROM g GROUP BY 1)
        |SELECT a.source AS source_a, b.source AS source_b,
        | count(*) AS n_shared,
        | floor(CAST(count(*) AS DOUBLE)
        |   / (any_value(na.n) + any_value(nb.n) - count(*))
        |   * 1000000 + 0.5) / 1000000 AS jaccard
        |FROM g a JOIN g b ON a.sh = b.sh AND a.source < b.source
        |JOIN n na ON na.source = a.source
        |JOIN n nb ON nb.source = b.source
        |GROUP BY 1, 2""".stripMargin),

    // ── deterministic eval-holdout split: every doc lands in exactly
    // one of train/validation/test by its md5 bucket — reproducible
    // across engines, runs, and partitionings (rand()-based splits are
    // none of those). Thresholds on the 2-hex-char prefix: < 'e6' is
    // 230/256 ≈ 89.8 % train, < 'f3' adds 13/256 ≈ 5.1 % validation,
    // rest test. Pure map-side assignment + one agg shuffle — scales. ─
    "q_split_assign" -> q(
      c => {
        val h = substring(md5(col("doc_id").cast("string").cast("binary")), 1, 2)
        c.documents
          .withColumn("split",
            when(h < "e6", "train")
              .when(h < "f3", "validation")
              .otherwise("test"))
          .groupBy(col("split"), col("lang"))
          .agg(count(lit(1)).as("n_docs"),
               sum(col("n_chars")).as("total_chars"))
      },
      """SELECT CASE
        |  WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
        |  WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'validation'
        |  ELSE 'test' END AS split, lang,
        | count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY 1, 2""".stripMargin),

    // ── corpus character-bigram familiarity scoring (the CCNet/KenLM
    // quality-filter shape, transcendental-free): score each doc by the
    // mean corpus frequency of its char bigrams — gibberish and
    // non-corpus-like text scores low. Per-doc sums stay INTEGER
    // (order-independent, exact in every engine); ONE double division
    // at the end. Unlike q_tfidf's word vocabulary, the char-bigram
    // domain is bounded by |charset|² (≤ ~10k rows), so the count-table
    // broadcast is safe at ANY corpus size. ──────────────────────────
    "q_char_bigram_lm" -> q(
      c => {
        // the string is split to a char ARRAY once per doc, then each
        // exploded position does two O(1) element_at lookups —
        // substr(__t, i, 2) here would be O(i) (UTF8String seeks char
        // boundaries from the start), turning the pass into O(len²)
        // per doc (~3× slower at 300-char docs, worse as docs grow).
        // The length guard keeps sequence() off its descending-range
        // trap. repartition BEFORE the ~300× char fan-out: one 128 MB
        // scan partition of docs becomes ~38 GB of generated rows —
        // the narrow input must spread before the explode, at any
        // scale (sf0.1: 4.0 s → 1.6 s, single-file scan).
        val bg = c.documents
          .repartition(col("doc_id"))
          .withColumn("__t", TF.normalize(col("text")))
          .filter(length(col("__t")) >= 2)
          .withColumn("__a", split(col("__t"), ""))
          .select(col("doc_id"), col("__a"),
                  explode(sequence(lit(1), length(col("__t")) - 1)).as("__i"))
          .select(col("doc_id"),
                  concat(element_at(col("__a"), col("__i")),
                         element_at(col("__a"), col("__i") + 1)).as("bg"))
        val counts = bg.groupBy("bg").agg(count(lit(1)).as("cnt"))
        bg.join(broadcast(counts), "bg")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum(col("cnt")).as("__s"))
          .select(col("doc_id"), col("n_bigrams"),
                  rnd4(col("__s").cast("double") / col("n_bigrams"))
                    .as("avg_bigram_freq"))
      },
      s"""WITH t AS (
        | SELECT doc_id, $normSql AS t FROM documents
        |), bg AS (
        | SELECT doc_id, substr(t, i, 2) AS bg
        | FROM t, unnest(generate_series(1, length(t) - 1)) AS g(i)
        |), cnt AS (
        | SELECT bg, count(*) AS cnt FROM bg GROUP BY 1
        |)
        |SELECT doc_id, count(*) AS n_bigrams,
        | floor(CAST(sum(cnt) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000
        |   AS avg_bigram_freq
        |FROM bg JOIN cnt USING (bg) GROUP BY 1""".stripMargin),

    // ── character-diversity filter via Gini impurity — the log-free
    // entropy surrogate (1 − Σ pᵢ² = (n² − Σ cᵢ²)/n²): repeated-char
    // spam scores near 0, diverse text near 1. Everything is integer
    // until the single final division, so the oracle matches bit-exact.
    // Two shuffles, both keyed on doc_id — scales linearly. ──────────
    "q_char_diversity" -> q(
      c => {
        // chars come straight off one split per doc; repartition
        // before the char fan-out (see q_char_bigram_lm for both)
        val ch = c.documents
          .repartition(col("doc_id"))
          .withColumn("__t", TF.normalize(col("text")))
          .filter(length(col("__t")) >= 1)
          .select(col("doc_id"), explode(split(col("__t"), "")).as("ch"))
        ch.groupBy(col("doc_id"), col("ch"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy("doc_id")
          .agg(sum(col("cnt")).as("__n"),
               sum(col("cnt") * col("cnt")).as("__ss"),
               count(lit(1)).as("n_distinct_chars"))
          .select(col("doc_id"), col("__n").as("n_chars_norm"),
                  col("n_distinct_chars"),
                  rnd6((col("__n") * col("__n") - col("__ss")).cast("double") /
                       (col("__n") * col("__n"))).as("gini"))
      },
      s"""WITH t AS (
        | SELECT doc_id, $normSql AS t FROM documents
        |), ch AS (
        | SELECT doc_id, substr(t, i, 1) AS ch
        | FROM t, unnest(generate_series(1, length(t))) AS g(i)
        |), pc AS (
        | SELECT doc_id, ch, count(*) AS cnt FROM ch GROUP BY 1, 2
        |)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_chars_norm,
        | count(*) AS n_distinct_chars,
        | floor(CAST(sum(cnt) * sum(cnt) - sum(cnt * cnt) AS DOUBLE)
        |   / (sum(cnt) * sum(cnt)) * 1000000 + 0.5) / 1000000 AS gini
        |FROM pc GROUP BY 1""".stripMargin),

    // ── within-doc sentence dedup (the intra-document half of the
    // MassiveText line rules; q_chunk_dedup is the corpus-wide half):
    // repeated sentences inside one doc keep only their first
    // occurrence, the doc reassembles in original order. All shuffles
    // key on doc_id (+ sentence) — no cross-doc step at all, so this
    // is embarrassingly parallel at corpus scale. ────────────────────
    "q_line_dedup" -> q(
      c => {
        val base = c.documents
          .withColumn("__s",
            filter(transform(split(col("text"), "[.!?]+"), trim(_)),
                   x => length(x) > 0))
          .select(col("doc_id"), size(col("__s")).cast("long").as("n_sentences"),
                  col("__s"))
        val sent = base
          .select(col("doc_id"), posexplode_outer(col("__s")).as(Seq("pos", "sent")))
          .filter(col("sent").isNotNull)
        val firsts = sent.groupBy(col("doc_id"), col("sent"))
          .agg(min(col("pos")).as("pos"))
        val re = firsts.groupBy("doc_id")
          .agg(count(lit(1)).as("n_kept"),
               md5(concat_ws(". ", transform(
                 array_sort(collect_list(struct(col("pos"), col("sent")))),
                 x => x.getField("sent"))).cast("binary")).as("cleaned_fp"))
        base.select("doc_id", "n_sentences")
          .join(re, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("n_sentences"),
                  coalesce(col("n_kept"), lit(0L)).as("n_kept"),
                  coalesce(col("cleaned_fp"), md5(lit("").cast("binary")))
                    .as("cleaned_fp"))
      },
      """WITH s AS (
        | SELECT doc_id,
        |  list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
        |              x -> trim(x)), x -> length(x) > 0) AS ss
        | FROM documents
        |), e AS (
        | SELECT doc_id, i AS pos, ss[i] AS sent
        | FROM s, unnest(generate_series(1, len(ss))) AS g(i)
        |), f AS (
        | SELECT doc_id, sent, min(pos) AS pos FROM e GROUP BY 1, 2
        |), re AS (
        | SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |  md5(string_agg(sent, '. ' ORDER BY pos)) AS cleaned_fp
        | FROM f GROUP BY 1
        |)
        |SELECT b.doc_id, CAST(len(b.ss) AS BIGINT) AS n_sentences,
        | coalesce(re.n_kept, 0) AS n_kept,
        | coalesce(re.cleaned_fp, md5('')) AS cleaned_fp
        |FROM s b LEFT JOIN re USING (doc_id)""".stripMargin),

    // ── out-of-vocabulary rate against a fixed-size corpus vocabulary
    // (the tokenizer-coverage question every training run asks): the
    // top-K vocabulary is a bounded deterministic set (count desc,
    // word asc — TakeOrderedAndProject, per-partition heaps, never a
    // global sort), so its broadcast is safe at any corpus size; the
    // token stream then left-joins it map-side and reduces per doc.
    // Counts stay integer; one division at the end. ──────────────────
    "q_oov_rate" -> q(
      c => {
        val toks = c.documents
          .withColumn("__w", TF.words(lower(col("text"))))
          .select(col("doc_id"), explode_outer(col("__w")).as("word"))
          .filter(col("word").isNotNull)
        // (no checkpoint here: the vocab-build and scoring passes are
        // the algorithmic minimum of two, the broadcast exchange
        // materializes vocab once, and PlanSpec pins its TakeOrdered
        // shape — a checkpoint would hide that subplan)
        val vocab = toks.groupBy("word").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("word")).limit(20)
          .select(col("word"), lit(true).as("__in"))
        toks.join(broadcast(vocab), Seq("word"), "left_outer")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
               sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
          .select(col("doc_id"), col("n_tokens"), col("n_oov"),
                  rnd6(col("n_oov").cast("double") / col("n_tokens"))
                    .as("oov_rate"))
      },
      """WITH w AS (
        | SELECT doc_id,
        |  unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
        | FROM documents
        |), v AS (
        | SELECT word FROM (
        |  SELECT word, count(*) AS cnt FROM w GROUP BY 1
        |  ORDER BY cnt DESC, word LIMIT 20)
        |)
        |SELECT doc_id, count(*) AS n_tokens,
        | CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |   AS n_oov,
        | floor(CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |   / count(*) * 1000000 + 0.5) / 1000000 AS oov_rate
        |FROM w LEFT JOIN v ON w.word = v.word
        |GROUP BY 1""".stripMargin),

    // ── BM25 ranked retrieval (Robertson–Spärck Jones), the scoring
    // half of corpus search / hard-negative mining. One pass: a single
    // groupBy(doc_id) over the exploded token stream computes doc
    // length AND per-term tf together (map-side partial agg → the
    // shuffle carries one narrow row per doc, not per token); corpus
    // stats (N, Σdl, per-term df) reduce that to ONE row that
    // cross-joins back as a broadcast. No join against a corpus-sized
    // side, no window. avgdl = exact long Σdl / exact count, and the
    // score expression is the same left-associated IEEE sequence in
    // both engines, so scores are bit-identical before the belt-and-
    // braces rounding; ordering uses the ROUNDED score (+ doc_id) so
    // the top-k row set is engine-independent even at a tie boundary.
    // orderBy+limit → TakeOrderedAndProject (per-partition heaps, no
    // global sort) — the whole plan is two reduce-style shuffles of
    // O(docs) narrow rows regardless of corpus size.
    "q_bm25_topk" -> q(
      c => bm25Scored(c).orderBy(col("score").desc, col("doc_id"))
        .select(col("doc_id"), col("score"))
        .limit(20),
      s"""WITH $bm25CteSql
        |SELECT doc_id, score FROM sc WHERE score > 0
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin),

    // ── hybrid retrieval: reciprocal-rank fusion (Cormack et al.) of
    // the lexical BM25 arm and the semantic embedding-cosine arm, the
    // standard way modern search stacks combine sparse and dense
    // retrieval. Both arms produce ENGINE-INDEPENDENT rank lists
    // (ranks assigned on ROUNDED scores with id tie-breaks), so the
    // fused 1/(60+r) scores are bit-identical across engines. Each
    // arm's scale story is its own operator's (BM25: two reduce
    // shuffles; cosine: broadcast single query); the fusion itself
    // joins two ≤30-row lists. vec_id ≡ doc_id in the fixture (one
    // embedding per document). ───────────────────────────────────────
    "q_rrf_fusion" -> q(
      c => {
        val kRrf = 60
        val lex = bm25Scored(c)
          .orderBy(col("score").desc, col("doc_id")).limit(30)
        val wLex = Window.orderBy(col("score").desc, col("doc_id"))
        val lexRank = lex.withColumn("rl", row_number().over(wLex).cast("long"))
          .select(col("doc_id"), col("rl"))
        val all = Similarity.prepare(c.embeddings, "vec_id", "embedding")
        val semRank = Similarity
          .bruteForceTopK(all.filter(col("id") === 0), all, k = 30, rnd6)
          .select(col("vec_id").as("doc_id"), col("rn").cast("long").as("rs"))
        lexRank.join(semRank, Seq("doc_id"), "full_outer")
          .withColumn("rrf", rnd6(
            coalesce(lit(1.0) / (col("rl") + kRrf), lit(0.0)) +
            coalesce(lit(1.0) / (col("rs") + kRrf), lit(0.0))))
          .select(col("doc_id"), coalesce(col("rl"), lit(0L)).as("rl"),
                  coalesce(col("rs"), lit(0L)).as("rs"), col("rrf"))
          .orderBy(col("rrf").desc, col("doc_id")).limit(20)
      },
      s"""WITH $bm25CteSql, lex AS (
        | SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
        |   AS BIGINT) AS rl
        | FROM (SELECT * FROM sc WHERE score > 0
        |       ORDER BY score DESC, doc_id LIMIT 30)
        |), n AS (
        | SELECT vec_id, CAST(embedding AS DOUBLE[]) v,
        |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
        |                        CAST(embedding AS DOUBLE[]))) nrm
        | FROM embeddings
        |), qy AS (SELECT * FROM n WHERE vec_id = 0),
        |sem AS (
        | SELECT vec_id AS doc_id, CAST(rn AS BIGINT) AS rs FROM (
        |  SELECT c.vec_id,
        |   row_number() OVER (ORDER BY
        |     floor(list_dot_product(qy.v, c.v) / (qy.nrm * c.nrm)
        |           * 1000000 + 0.5) / 1000000 DESC, c.vec_id) AS rn
        |  FROM qy JOIN n c ON c.vec_id <> qy.vec_id)
        | WHERE rn <= 30
        |)
        |SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
        | coalesce(lex.rl, 0) AS rl, coalesce(sem.rs, 0) AS rs,
        | floor((coalesce(1e0 / (lex.rl + 60), 0e0) +
        |        coalesce(1e0 / (sem.rs + 60), 0e0)) * 1000000 + 0.5)
        |   / 1000000 AS rrf
        |FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id
        |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin),
  )

  /** BM25 (k1=1.2, b=0.75) scores for the fixed probe terms — shared
    * by q_bm25_topk and the RRF fusion. One groupBy(doc_id) pass over
    * the token stream (doc length and per-term tf together), corpus
    * stats reduced to ONE broadcast row; the score expression is the
    * same left-associated IEEE sequence the oracle parses. */
  private def bm25Scored(c: Ctx): DataFrame = {
    val terms = Seq("spark", "window", "stream")
    val k1 = 1.2
    val b  = 0.75
    val toks = c.documents.select(
      col("doc_id"),
      explode(TF.words(lower(col("text")))).as("word"))
    val perDoc = toks.groupBy("doc_id").agg(
      count(lit(1)).as("dl"),
      terms.map(t => sum(when(col("word") === t, 1L).otherwise(0L))
        .as(s"tf_$t")): _*)
    val avgdl = col("tot_dl").cast("double") / col("n_docs")
    def termScore(t: String): Column = {
      val tf  = col(s"tf_$t").cast("double")
      val idf = log((col("n_docs") - col(s"df_$t") + 0.5) /
                    (col(s"df_$t") + 0.5) + 1.0)
      // 2.2 as a literal, not k1+1.0: the runtime sum rounds to a
      // different double than the SQL literal the oracle parses
      idf * (tf * 2.2) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / avgdl))
    }
    // localCheckpoint: perDoc feeds both the corpus-stats aggregate and
    // the scoring crossJoin; differing pushed-down projections defeat
    // ReuseExchange, so without it the token explode+groupBy runs twice
    // per query (and 4x in the RRF fusion). perDoc is doc-sized.
    val perDocCk = perDoc.localCheckpoint()
    val statsCk = perDocCk.agg(
      count(lit(1)).as("n_docs"),
      (sum(col("dl")).as("tot_dl") +:
        terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L))
          .as(s"df_$t"))): _*)
    perDocCk.crossJoin(broadcast(statsCk))
      .withColumn("score", rnd6(terms.map(termScore).reduce(_ + _)))
      .filter(col("score") > 0)
  }

  /** DuckDB twin of [[bm25Scored]] (CTEs `t` → `sc`). Lazy: `defs`
    * above interpolates it during object init, before a plain val
    * this far down would have been assigned. */
  private lazy val bm25CteSql: String =
    """t AS (
      | SELECT doc_id,
      |  unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
      | FROM documents
      |), d AS (
      | SELECT doc_id, count(*) AS dl,
      |  sum(CASE WHEN word = 'spark'  THEN 1 ELSE 0 END) AS tf_spark,
      |  sum(CASE WHEN word = 'window' THEN 1 ELSE 0 END) AS tf_window,
      |  sum(CASE WHEN word = 'stream' THEN 1 ELSE 0 END) AS tf_stream
      | FROM t GROUP BY 1
      |), s AS (
      | SELECT count(*) AS n_docs, sum(dl) AS tot_dl,
      |  sum(CASE WHEN tf_spark  > 0 THEN 1 ELSE 0 END) AS df_spark,
      |  sum(CASE WHEN tf_window > 0 THEN 1 ELSE 0 END) AS df_window,
      |  sum(CASE WHEN tf_stream > 0 THEN 1 ELSE 0 END) AS df_stream
      | FROM d
      |), sc AS (
      | SELECT d.doc_id,
      |  floor((
      |   ln((s.n_docs - s.df_spark + 0.5) / (s.df_spark + 0.5) + 1.0)
      |    * (CAST(tf_spark AS DOUBLE) * 2.2)
      |    / (CAST(tf_spark AS DOUBLE)
      |       + 1.2 * (1.0 - 0.75 + 0.75 * dl
      |                / (CAST(s.tot_dl AS DOUBLE) / s.n_docs)))
      |   + ln((s.n_docs - s.df_window + 0.5) / (s.df_window + 0.5) + 1.0)
      |    * (CAST(tf_window AS DOUBLE) * 2.2)
      |    / (CAST(tf_window AS DOUBLE)
      |       + 1.2 * (1.0 - 0.75 + 0.75 * dl
      |                / (CAST(s.tot_dl AS DOUBLE) / s.n_docs)))
      |   + ln((s.n_docs - s.df_stream + 0.5) / (s.df_stream + 0.5) + 1.0)
      |    * (CAST(tf_stream AS DOUBLE) * 2.2)
      |    / (CAST(tf_stream AS DOUBLE)
      |       + 1.2 * (1.0 - 0.75 + 0.75 * dl
      |                / (CAST(s.tot_dl AS DOUBLE) / s.n_docs)))
      |  ) * 1000000 + 0.5) / 1000000 AS score
      | FROM d, s
      |)""".stripMargin
}
