package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the training-data pipeline
  * operators (beyond-reference; SURVEY.md §7.6).
  *
  * Everything here is built from codegen'd `functions._` expressions —
  * no UDFs — so whole-stage codegen keeps the per-row work in one pass
  * over the documents table, and every function has a mechanical SQL
  * twin for the DuckDB oracle (same regexes, same arithmetic).
  */
object TextFunctions {
  /** Canonical form for fingerprinting: lowercase, collapsed
    * whitespace. (SQL twin: lower(trim(regexp_replace(x,'\s+',' ','g')))) */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Whitespace tokens. (SQL: regexp_split_to_array(trim(x), '\s+')) */
  /** TWIN CONVENTION (shared with every DuckDB oracle that models
    * this): split of an EMPTY/whitespace-only string yields [""] —
    * one phantom empty token — exactly like the SQL twins'
    * string_split. Changing this to an empty array would require the
    * same guard in every oracle twin at once or blank documents would
    * hash-mismatch; current fixtures contain none, so the convention
    * is latent but must move in lockstep. */
  def words(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct word set — the unit for set-similarity dedup. */
  def wordSet(text: Column): Column = array_distinct(words(text))

  /** n-word shingles of the token array (empty when fewer than n words). */
  def shingles(wordsCol: Column, n: Int): Column =
    when(size(wordsCol) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(wordsCol) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(wordsCol, i + j + 1)): _*)))

  /** Exact 128-bit content fingerprint of the normalized text.
    * (SQL: md5(...)) */
  def fingerprint(text: Column): Column = md5(normalize(text).cast("binary"))

  /** BPE-ish token count: letter runs, single digits, single symbols —
    * a cheap deterministic proxy for subword tokenizers.
    * (SQL: len(regexp_extract_all(x, pattern)))
    * TWIN CONVENTION: the pattern is lowercase-only and is applied to
    * RAW text identically in both engines — an uppercase letter counts
    * as a symbol token on BOTH sides (consistent, though it fragments
    * mixed-case words). Widening to [a-zA-Z]+ or lowercasing must
    * change the oracle SQL in the same commit. */
  val BpeTokenPattern = "[a-z]+|[0-9]|[^a-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeTokenPattern)).cast("long")

  def wsTokenCount(text: Column): Column = size(words(text)).cast("long")

  /** Language marker stopword sets for the n-gram language-ID
    * heuristic. Deliberately small: the heuristic must be expressible
    * identically in the oracle SQL. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "la", "los", "y", "es"),
    "fr" -> Seq("le", "les", "du", "et", "est"))

  /** Count of tokens from `set` in the word array. */
  def markerScore(wordsCol: Column, set: Seq[String]): Column =
    size(filter(wordsCol, w => w.isInCollection(set))).cast("long")

  /** Priority-ordered argmax over marker scores: en ≥ de ≥ es ≥ fr,
    * 'und' when all zero. First-match-wins chain, mirrored exactly in
    * the oracle CASE. */
  def predictLang(en: Column, de: Column, es: Column, fr: Column): Column =
    when(en >= de && en >= es && en >= fr && en > 0, "en")
      .when(de >= es && de >= fr && de > 0, "de")
      .when(es >= fr && es > 0, "es")
      .when(fr > 0, "fr")
      .otherwise("und")
}
