package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline operators
  * (north-star, SURVEY.md §7.1 M4): tokenization, language-ID heuristic,
  * quality scoring, fingerprinting.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs) so the hot path stays inside whole-stage codegen. Each helper
  * has an exact ANSI-SQL twin used by the DuckDB oracle — keep the
  * expression *shape* in sync or bit-exact double comparison breaks.
  */
object TextFunctions {

  /** Whitespace tokens of lower-cased text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** BPE-ish subword tokens: letter runs, digit runs, single punctuation. */
  val BpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def bpeishTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(BpeishPattern), lit(0))

  /** Distinct word n-gram shingles (for minhash / Jaccard dedup).
    * For texts shorter than n tokens the whole text is the one shingle.
    */
  def shingles(toks: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** How many tokens (with repeats) appear in `words`. */
  def stopwordCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))

  // ── language-ID heuristic ────────────────────────────────────────────
  // Disjoint stopword marker sets + a CJK codepoint check; ties break
  // en > es > de > fr; no signal → 'und'. Engine-defined heuristic.
  val EnMarkers = Seq("the", "and", "of", "to", "is", "in", "that")
  val EsMarkers = Seq("el", "la", "los", "las", "una", "por", "con")
  val DeMarkers = Seq("der", "die", "das", "und", "ist", "nicht")
  val FrMarkers = Seq("le", "les", "des", "une", "est", "dans")
  val CjkPattern = "[一-鿿]"

  def langId(text: Column): Column = {
    val t = tokens(text)
    val en = stopwordCount(t, EnMarkers)
    val es = stopwordCount(t, EsMarkers)
    val de = stopwordCount(t, DeMarkers)
    val fr = stopwordCount(t, FrMarkers)
    when(text.rlike(CjkPattern), "zh")
      .when(en === 0 && es === 0 && de === 0 && fr === 0, "und")
      .when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  // ── quality scoring ─────────────────────────────────────────────────
  /** Characters left after stripping alphanumerics and whitespace. */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[a-zA-Z0-9\\s]", ""))

  /** Engine-defined quality score in [0,1]:
    * 0.4·min(1, n_tokens/50) + 0.3·stopword_ratio + 0.3·(1 − punct_ratio).
    */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val nTokens = size(t)
    val nChars = length(text)
    val tokensNorm = least(lit(1.0), nTokens / lit(50.0))
    val stopRatio = stopwordCount(t, EnMarkers) / greatest(nTokens, lit(1))
    val punctRatio = punctCount(text) / greatest(nChars, lit(1))
    lit(0.4) * tokensNorm + lit(0.3) * stopRatio + lit(0.3) * (lit(1.0) - punctRatio)
  }

  // ── fingerprinting ──────────────────────────────────────────────────
  /** Normalized text: lower-cased, whitespace collapsed, trimmed. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Content fingerprint = md5 of the normalized text (exact-dedup key). */
  def fingerprint(text: Column): Column = md5(to_binary(normalized(text), lit("utf-8")))
}
