package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Text-analysis primitives for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, fingerprinting, shingling.
  *
  * Everything is composed from built-in (codegen'd) string/regex functions
  * — per-row, embarrassingly parallel, no shuffle, no UDF. Each primitive
  * is deterministic so results are reproducible run-to-run and
  * oracle-checkable.
  */
object Text {

  /** Characteristic-stopword patterns per language (whole-word matches).
    * Kept in RE2-compatible syntax so the same pattern text runs under
    * Java regex (Spark) and RE2 (DuckDB/oracle) with identical results.
    */
  val LangPatterns: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|a|of|and|to|in|is)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|ein)\\b",
    "fr" -> "\\b(le|la|les|et|est|une|dans)\\b",
    "es" -> "\\b(el|los|las|y|es|una|en)\\b")

  /** Count of whole-word stopword hits for one language. */
  def langScore(text: Column, lang: String): Column = {
    val p = LangPatterns.toMap.apply(lang)
    size(regexp_extract_all(lower(text), lit(p), lit(0)))
  }

  /** n-gram-heuristic language ID: argmax of stopword-hit counts with fixed
    * precedence en > de > fr > es; all-zero → "und" (undetermined).
    */
  def langId(text: Column): Column = {
    val en = langScore(text, "en"); val de = langScore(text, "de")
    val fr = langScore(text, "fr"); val es = langScore(text, "es")
    when(en === 0 && de === 0 && fr === 0 && es === 0, "und")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Whitespace token count. */
  def wsTokens(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token count: letter runs, digit runs, and single punctuation
    * marks each count as one token (a cheap stand-in for a real tokenizer's
    * token count, linear in text length).
    */
  def bpeTokens(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Punctuation (non-word, non-space) character count. */
  def punctChars(text: Column): Column =
    size(regexp_extract_all(text, lit("[^\\w\\s]"), lit(0)))

  /** Heuristic quality score in [0,1]: length component, stopword-density
    * component, punctuation-cleanliness component. All-double arithmetic in
    * a fixed order (reproducible bit-for-bit across engines).
    */
  def qualityScore(text: Column): Column = {
    val toks = wsTokens(text).cast("double")
    val lenComponent = least(lit(1.0), toks / lit(200.0))
    val stopComponent = least(lit(1.0),
      langScore(text, "en").cast("double") / greatest(toks * lit(0.05), lit(1.0)))
    val punctComponent = lit(1.0) -
      least(lit(1.0), punctChars(text).cast("double") / greatest(length(text).cast("double"), lit(1.0)))
    round(lenComponent * lit(0.5) + stopComponent * lit(0.3) + punctComponent * lit(0.2), 4)
  }

  /** Repetition score in [0,1]: 1 − distinct-words/words over casefolded
    * whitespace tokens — 0 = no repetition, →1 = the document is one token
    * repeated (Gopher-style "repetition" quality signal; heavily repeated
    * boilerplate/spam scores high and gets filtered upstream of training).
    * Single-pass array expressions, no shuffle.
    */
  def repetitionScore(text: Column): Column = {
    val words = split(lower(trim(text)), "\\s+")
    val n = size(words).cast("double")
    round(when(n > 0, lit(1.0) - size(array_distinct(words)).cast("double") / n)
      .otherwise(0.0), 4)
  }

  /** PII scrubbing, C4-style: redact email addresses and long digit runs
    * (phone/account numbers) with fixed placeholder tokens. Patterns are
    * RE2-compatible (no lookaround/backrefs) so the same pattern text runs
    * identically under Java regex and the oracle's RE2. Narrow per-row op.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val LongDigitPattern = "[0-9]{7,}"

  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailPattern, "<EMAIL>"),
      LongDigitPattern, "<NUMBER>")

  /** Count of PII hits (emails + long digit runs) — the audit metric that
    * pairs with [[scrubPii]].
    */
  def piiCount(text: Column): Column =
    (size(regexp_extract_all(text, lit(EmailPattern), lit(0))) +
      size(regexp_extract_all(text, lit(LongDigitPattern), lit(0)))).cast("long")

  /** Document fingerprint: md5 of the casefolded, alphanumeric-only
    * normalization — equal fingerprints ⇔ texts equal modulo case,
    * punctuation, and whitespace. The exact-dedup key at scale (16-byte key
    * shuffles instead of full documents).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]", ""))

  /** 60-bit token hash derived from md5 (first 15 hex digits): positive,
    * fits a signed long, and — unlike xxhash64 — computable in any SQL
    * engine with an md5 function, which is what makes SimHash sketches
    * oracle-checkable. (DuckDB: `('0x' || substr(md5(t),1,15))::BIGINT`.)
    */
  def tokenHash60(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** Distinct word-n-gram shingle set (array<string>), the MinHash input.
    * Empty array when the document has fewer than n words.
    *
    * PLAN NOTE: this single-expression form re-evaluates the split inside
    * the transform lambda per element access (codegen cannot hoist loop-
    * invariant subexpressions out of higher-order-function loops). For any
    * plan that evaluates shingles over a corpus, pre-split the words into
    * their own projection and use [[shinglesFromWords]] instead — see
    * `Dedup.shingleSets`.
    */
  def wordShingles(text: Column, n: Int): Column =
    shinglesFromWords(split(lower(trim(text)), "\\s+"), n)

  /** Shingle set from an already-materialized words array. When `words` is
    * a projection-level alias (referenced n+2 times here, so
    * CollapseProject keeps the boundary), the tokenization runs once per
    * row regardless of shingle count.
    */
  def shinglesFromWords(words: Column, n: Int, distinct: Boolean = true): Column = {
    val count = size(words) - (n - 1) // shingle count; <=0 when too few words
    val grams = transform(
      sequence(lit(0), count - 1),
      i => concat_ws(" ", (0 until n).map(j => element_at(words, (i + j + 1).cast(IntegerType))): _*))
    // guard: sequence(0, negative) would generate a DESCENDING sequence
    // distinct=true: SET semantics (dedup/Jaccard); false: every occurrence
    // survives (n-gram COUNTING)
    when(count > 0, if (distinct) array_distinct(grams) else grams)
      .otherwise(array().cast("array<string>"))
  }
}
