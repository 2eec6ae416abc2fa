package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus processing
  * (BASELINE.json LLM-data-pipeline extensions).
  *
  * Everything here is composed from built-in `org.apache.spark.sql
  * .functions` so it stays inside whole-stage codegen — no UDFs, no
  * serialization walls, safe to run over billions of documents. Each
  * function takes and returns `Column`, composing like any expression.
  */
object TextFunctions {

  /** Whitespace tokenization; empty string → empty array (split of "" in
    * Spark yields [""], which we filter to keep token counts honest). */
  def wsTokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(wsTokens(text))

  /** GPT-2-style ("BPE-ish") pre-tokenizer regex: contractions, letter
    * runs, digit runs, punctuation runs — the standard byte-pair
    * pre-split shape, counted per document. Works identically under
    * Java regex (Spark) and RE2 (DuckDB oracle). */
  val bpeishPattern: String =
    "'(?:s|d|m|t|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s]+"

  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeishPattern), lit(0)))

  /** Characters that are neither alphanumeric nor whitespace. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))

  def digitCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[0-9]", ""))

  def upperCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[A-Z]", ""))

  /** Mean whitespace-token length (0.0 for empty docs). */
  def meanTokenLen(text: Column): Column = {
    val toks = wsTokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(transform(toks, t => length(t).cast("double")),
        lit(0.0), (acc, x) => acc + x) / size(toks))
  }

  /** Fraction of tokens that appear in `words` (lower-cased exact match). */
  def wordRatio(text: Column, words: Seq[String]): Column = {
    val toks = wsTokens(lower(text))
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => t.isin(words.map(lit): _*))).cast("double") /
        size(toks))
  }

  /** English stopwords used by the quality score and language ID.
    * Small fixed lists keep the generated predicate codegen-friendly. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "an", "of", "to", "and", "in", "is", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "es"),
    "de" -> Seq("der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "les", "en", "est", "que"),
    "zh" -> Seq("de", "shi", "bu", "le", "zai", "ren", "you", "wo", "ta", "zhe"))

  /** C4/Gopher-flavored quality score in [0,1]: rewards stopword presence
    * and sane token lengths, penalizes punctuation/digit noise. The exact
    * formula is arbitrary but deterministic — the oracle reimplements it
    * verbatim. */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val punctRatio = when(len === 0, 0.0).otherwise(punctCount(text) / len)
    val digitRatio = when(len === 0, 0.0).otherwise(digitCount(text) / len)
    val stopRatio = wordRatio(text, stopwords("en"))
    val mtl = meanTokenLen(text)
    val lenOk = when(mtl >= 3 && mtl <= 10, 1.0).otherwise(0.0)
    greatest(lit(0.0), least(lit(1.0),
      lit(0.4) * least(stopRatio * 5, lit(1.0)) +
        lit(0.3) * lenOk +
        lit(0.3) * (lit(1.0) - least((punctRatio + digitRatio) * 5, lit(1.0)))))
  }

  /** Stopword-vote language ID: score each candidate language by DISTINCT
    * stopword hits in the token set; highest score wins, ties broken by
    * language code order; no hits → "und" (undetermined). */
  def langId(text: Column): Column = {
    val toks = array_distinct(wsTokens(lower(text)))
    val scored = stopwords.toSeq.sortBy(_._1).map { case (langCode, words) =>
      struct(
        size(filter(toks, t => t.isin(words.map(lit): _*))).as("score"),
        lit(langCode).as("lang"))
    }
    // array_max on struct(score, lang): max score, then max lang — to get
    // deterministic FIRST lang on ties we negate via reverse sort order:
    // sort desc by (score, -lexical) is awkward; instead pick via reduce.
    val best = scored.reduce { (a, b) =>
      when(b.getField("score") > a.getField("score"), b).otherwise(a)
    }
    when(best.getField("score") === 0, "und").otherwise(best.getField("lang"))
  }

  /** Content fingerprint: md5 of the normalized text (lower-case,
    * whitespace collapsed). Identical in DuckDB, so oracle-able; the
    * stable key for exact dedup at any scale. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " ").cast("binary"))

  /** Word n-gram shingles (contiguous, n>=1) from whitespace tokens. */
  def shingles(text: Column, n: Int): Column = {
    val toks = wsTokens(lower(text))
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  // -------------------------------------------------------------------
  // PII scrubbing — the standard training-data redaction pass. Patterns
  // are deliberately restricted to syntax that behaves identically under
  // Java regex (Spark codegen) and RE2 (DuckDB oracle): character
  // classes, bounded repetition, and ASCII \b word boundaries only.
  // -------------------------------------------------------------------
  val emailPattern: String = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val ipv4Pattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePattern: String = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Occurrences of one PII pattern. */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Redact all PII with typed placeholders. Order matters and is fixed:
    * emails first (their local part may contain digits), then IPs, then
    * phones (an IP octet sequence must not be half-eaten by the looser
    * phone pattern). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        ipv4Pattern, "<IP>"),
      phonePattern, "<PHONE>")
}
