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

  /** Whitespace token count. Defined once as a catalyst tree
    * ([[wsTokensExpr]]) so the Column API and the `graft_ws_tokens` SQL
    * registration share the exact same expression.
    */
  def wsTokens(text: Column): Column = {
    import org.apache.spark.sql.{graftshim => shim}
    shim.toColumn(wsTokensExpr(shim.toExpression(text)))
  }

  private[graft] def wsTokensExpr(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Size, StringSplit, StringTrim}
    Size(StringSplit(StringTrim(e), Literal("\\s+"), Literal(-1)))
  }

  /** BPE-ish token count: letter runs, digit runs, and single punctuation
    * marks each count as one token (a cheap stand-in for a real tokenizer's
    * token count, linear in text length). One catalyst definition
    * ([[bpeTokensExpr]]) behind both the Column API and `graft_bpe_tokens`:
    * the native [[TokenCount]] scan over Spark's own `Lower` —
    * regex-equivalent semantics (spec- and property-gated against the
    * regex form) at a fraction of the per-byte cost.
    */
  def bpeTokens(text: Column): Column = {
    import org.apache.spark.sql.{graftshim => shim}
    shim.toColumn(bpeTokensExpr(shim.toExpression(text)))
  }

  private[graft] def bpeTokensExpr(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.Lower
    TokenCount(Lower(e))
  }

  /** The regex formulation [[TokenCount]] replaces — kept as the
    * executable spec of the token semantics: TextSpec/PropertySpec assert
    * the two agree on arbitrary Unicode input.
    */
  private[graft] def bpeTokensRegexExpr(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Lower, RegExpExtractAll, Size}
    Size(RegExpExtractAll(Lower(e), Literal("[a-z]+|[0-9]+|[^a-z0-9\\s]"), Literal(0)))
  }

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
  def repetitionScore(text: Column): Column =
    repetitionScoreFromWords(split(lower(trim(text)), "\\s+"))

  /** [[repetitionScore]] over a pre-projected words array — `words` is
    * referenced four times here, so passing an inline split would evaluate
    * the tokenization four times per row (round-13 plan audit); project
    * the split into its own alias first (the t13/t20 discipline).
    */
  def repetitionScoreFromWords(words: Column): Column =
    round(when(size(words) > 0, dupWordFrac(words)).otherwise(0.0), 4)

  /** T23 — hashed-feature linear quality score: the fasttext-filter plan
    * shape (hash each token into one of `buckets` feature slots, sum the
    * weight-vector entries of the slots the document hits, threshold the
    * linear score). Real pipelines load trained weights; here the weight
    * vector is a deterministic fixture over the bucket index — dyadic
    * rationals (multiples of 1/8) so per-doc sums are EXACT in double in
    * any summation order, making the score bit-identical across engines.
    *
    * Scale shape is the point: scoring is per-row array arithmetic —
    * md5-bucket each token, fold the weights — so applying the model to
    * 100 TB is a zero-shuffle narrow map over the corpus, embarrassingly
    * parallel across executors. No join against a weight table (the
    * vector is closed-form here; a real 64-entry vector would broadcast
    * for free as a literal array).
    */
  def hashedLinearScore(text: Column, buckets: Int = 64): Column = {
    val words = split(lower(trim(text)), "\\s+")
    // slot = first 16 md5 bits mod buckets; weight(slot) ∈ {-10/8 … +10/8}
    def weight(w: Column): Column = {
      val slot = conv(substring(md5(w), 1, 4), 16, 10).cast("long") % buckets
      ((slot * 37L + 11L) % 21L - 10L).cast("double") / 8.0
    }
    aggregate(words, lit(0.0), (acc, w) => acc + weight(w))
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

  /** Gopher-style quality-rule signals (Rae et al. 2021, §A1.1 — the
    * standard pre-training corpus gate), each a narrow codegen'd array/
    * regex expression with integer counts and end-of-pipeline divisions
    * only, so every signal is bit-identical in any engine:
    *
    *   - `n_words`, `mean_word_len` — whitespace words (empty tokens
    *     dropped), exact integer length sum before the one division;
    *   - `symbol_ratio` — '#'/ellipsis hits per word;
    *   - `alpha_frac` — fraction of words containing a letter;
    *   - `bullet_frac` / `ellipsis_frac` — fraction of non-blank lines
    *     starting with a bullet / ending with an ellipsis;
    *   - `stop_hits` — how many of the 8 canonical stopwords appear.
    *
    * Divisions round(4); zero denominators yield null ratios (not NaN).
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def gopherSignals(text: Column): Seq[(String, Column)] = {
    val words = filter(split(trim(text), "\\s+"), w => length(w) > 0)
    val lowered = transform(words, w => lower(w))
    val nWords = size(words).cast("long")
    val sumLen = aggregate(words, lit(0L), (acc, w) => acc + length(w).cast("long"))
    val lines = split(text, "\n")
    val nLines = size(filter(lines, l => length(trim(l)) > 0)).cast("long")
    val bulletLines = size(filter(lines, l => trim(l).rlike("^[-*•]"))).cast("long")
    val ellipsisLines = size(filter(lines, l => rtrim(l).rlike("(\\.\\.\\.|…)$"))).cast("long")
    val symbolHits = size(regexp_extract_all(text, lit("#|\\.\\.\\.|…"), lit(0))).cast("long")
    val alphaWords = size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long")
    val stopHits = size(filter(
      array(GopherStopwords.map(lit): _*), sw => array_contains(lowered, sw))).cast("long")
    def ratio(num: Column, den: Column): Column =
      when(den > 0L, round(num.cast("double") / den.cast("double"), 4))
    Seq(
      "n_words" -> nWords,
      "mean_word_len" -> ratio(sumLen, nWords),
      "symbol_ratio" -> ratio(symbolHits, nWords),
      "alpha_frac" -> ratio(alphaWords, nWords),
      "bullet_frac" -> ratio(bulletLines, nLines),
      "ellipsis_frac" -> ratio(ellipsisLines, nLines),
      "stop_hits" -> stopHits)
  }

  /** The Gopher pass/fail gate over [[gopherSignals]], at the published
    * thresholds (50 ≤ words ≤ 100k, mean word length in [3,10], symbol
    * ratio < 0.1, bullet lines < 90%, ellipsis lines < 30%, ≥ 80% alpha
    * words, ≥ 2 stopwords). Null ratios (zero denominator) pass their
    * rule, matching the paper's "fraction of" reading.
    */
  def gopherPass(text: Column): Column = {
    val s = gopherSignals(text).toMap
    def ok(c: Column, p: Column => Column): Column = c.isNull || p(c)
    (s("n_words") >= 50L && s("n_words") <= 100000L) &&
      ok(s("mean_word_len"), c => c >= 3.0 && c <= 10.0) &&
      ok(s("symbol_ratio"), _ < 0.1) &&
      ok(s("bullet_frac"), _ < 0.9) &&
      ok(s("ellipsis_frac"), _ < 0.3) &&
      ok(s("alpha_frac"), _ >= 0.8) &&
      s("stop_hits") >= 2L
  }

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

  /** T20 — Gopher-style intra-document repetition signals (the "repetitious
    * documents are low-quality" family of pretraining filters; cf. Rae et
    * al. 2021 §A1.1, which thresholds exactly these fractions). All three
    * are narrow per-row array expressions over ONE shared words projection
    * — zero shuffle, so the filter costs a map pass at any corpus size.
    * Word convention matches [[wsTokens]]/the shingle family:
    * `split(lower(trim(text)), "\\s+")`.
    */
  /** Fraction of word occurrences that are repeats of an earlier word:
    * `1 − distinct/total`. 0 for all-unique text, → 1 as one word
    * dominates. Null-safe via the caller's guard (total ≥ 1 always holds
    * for the split convention: splitting "" yields [""]).
    */
  def dupWordFrac(words: Column): Column =
    lit(1.0) - size(array_distinct(words)).cast("double") / size(words)

  /** Occurrence fraction of the single most frequent word — the "top word
    * share" signal (boilerplate/spam pages repeat one token). Computed
    * WITHOUT a per-word shuffle: sort the in-row array, then one fold
    * tracks the longest equal-run. O(w log w) per row, no exchange —
    * the 100 TB-right shape for a per-document statistic (an
    * explode + groupBy(doc, word) formulation would shuffle every word
    * occurrence in the corpus).
    */
  def topWordFrac(words: Column): Column = {
    val best = aggregate(
      array_sort(words),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, w) => {
        val run = when(w === acc.getField("prev"), acc.getField("run") + lit(1L))
          .otherwise(lit(1L))
        struct(w.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    best.cast("double") / size(words)
  }

  /** Fraction of word n-grams that duplicate an earlier n-gram in the same
    * document: `1 − distinct/total` over the [[shinglesFromWords]] grams.
    * Null when the document has fewer than n words (no n-grams to judge).
    */
  def dupNgramFrac(words: Column, n: Int): Column = {
    val total = size(words) - (n - 1)
    when(total > 0,
      lit(1.0) -
        size(shinglesFromWords(words, n)).cast("double") / total.cast("double"))
  }

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
