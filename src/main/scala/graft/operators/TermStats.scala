package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-relative term statistics — the tf-idf-style scoring a training-
  * data pipeline uses to surface what a document is ABOUT (topic terms for
  * domain filtering, dedup explanations, quality review). Extends the text
  * family (T1-T9) with the first CROSS-document text score: T7's vocabulary
  * is corpus-global, the quality/repetition scores are per-document; this
  * one needs both sides.
  */
object TermStats {

  /** Per-document top-k DISTINCTIVE terms: score = tf / df — term frequency
    * in this document over the term's document frequency in the corpus
    * (plain tf-idf with a 1/df weight instead of log(N/df): the ranking a
    * log idf gives per-document is dominated by the same monotone-in-df
    * ordering, and a single integer division is bit-identical across
    * engines where log(N/df) is at the mercy of libm rounding).
    * Ties break by term ascending; score rounded to 6.
    *
    * Scale shape: tf = one map-side-combined shuffle on (doc, term); df =
    * distinct + count keyed by term (vocabulary-sized — AQE broadcasts it
    * back onto tf); the rank window partitions per document over that
    * document's own vocabulary, never the corpus. Whitespace tokenization
    * matches T7's vocabulary build.
    */
  def distinctiveTerms(docs: DataFrame, idCol: String, textCol: String,
                       k: Int): DataFrame = {
    require(k >= 1, "distinctiveTerms: k must be >= 1")
    val toks = docs.select(col(idCol),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = toks.select(col(idCol), col("term")).distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("score", round(col("tf").cast("double") / col("df").cast("double"), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"), col("rank"))
  }

  /** Corpus-wide word n-gram counts — the classic LM-statistics workload
    * (bigram/trigram tables with frequency cutoffs). One narrow explode +
    * one map-side-combined count shuffle; the top-N cut rides
    * `TakeOrderedAndProject` (per-partition heaps, no global sort). The
    * shingle expression is [[graft.functions.Text.shinglesFromWords]] over
    * its own words projection (HOF-recompute pitfall; see Dedup.shingleSets)
    * with DISTINCT OFF — counts weigh every occurrence.
    */
  def ngramCounts(docs: DataFrame, textCol: String, n: Int, topN: Int): DataFrame = {
    require(n >= 1 && topN >= 1, "ngramCounts: n and topN must be >= 1")
    docs.select(split(lower(trim(col(textCol))), "\\s+").as("_words"))
      .select(explode(graft.functions.Text.shinglesFromWords(col("_words"), n,
        distinct = false)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram").asc)
      .limit(topN)
  }

  /** CCNet-style unigram language-model score: the mean corpus frequency
    * of the document's token OCCURRENCES (repeats count). High = built
    * from ubiquitous tokens (boilerplate/stereotype text); low = rare-token
    * text — the standard cheap LM proxy for corpus quality bucketing
    * (head/middle/tail) before an expensive model-based filter.
    *
    * Exact across engines: token counts are integers, their sum is exact,
    * and the mean is one division. Scale: vocabulary build = one
    * map-side-combined shuffle; the occurrence join is vocabulary-sized on
    * the build side; per-doc mean partial-aggregates.
    */
  /** T16 — per-source term-distribution DRIFT: Pearson's χ² statistic of
    * each source's unigram counts against the corpus-wide distribution,
    * the "did this slice of the corpus change composition" monitor a
    * continuously-ingesting pipeline alarms on (and the simplest honest
    * answer to "is source X statistically like the rest"). For source s
    * with n_s tokens, expected count of term t is e = n_s · c_t / N;
    * χ²_s = Σ_t (o_st − e)² / e over the FULL vocabulary — absent terms
    * contribute e (the textbook statistic; dropping them understates
    * drift), via a source × vocabulary frame left-joined with observed
    * counts. χ² over log-based divergences (KL): every term's cell is
    * one subtraction, one multiply, one divide on identical operands —
    * no libm, so cells are bit-identical across engines (the
    * [[distinctiveTerms]] 1/df argument, applied to divergence).
    *
    * Scale shape: token counts are map-side-combined shuffles keyed by
    * (source, term) / term; the cell frame is #sources × vocabulary —
    * vocabulary-sized, NOT corpus-sized; one final per-source sum.
    * Output: (source, n_tokens, chi2 round 4), one row per source.
    *
    * Caveat on the final sum: CELLS are bit-identical, but the per-source
    * χ² is `round(Σ cells, 4)` and the summation ORDER of that Σ is not
    * fixed (Spark partial aggregation vs an oracle engine's scan order),
    * so the pre-round double can differ by ULPs and, with a large enough
    * vocabulary, occasionally land on a round-4 boundary. If a
    * differential gate ever flakes here, fix the order (sort-by-term
    * prefix aggregation) or compare at a coarser rounding — the statistic
    * itself is as stable as IEEE addition allows.
    */
  def chiSquareDrift(docs: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(sourceCol),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(length(col("term")) > 0)
    val o = toks.groupBy(sourceCol, "term").agg(count(lit(1)).as("o"))
    val ns = toks.groupBy(sourceCol).agg(count(lit(1)).as("n"))
    val ct = toks.groupBy("term").agg(count(lit(1)).as("c"))
    // "_tot", not "N": Spark's default case-insensitive resolution would
    // make a column named N ambiguous with the per-source n
    val total = toks.agg(count(lit(1)).as("_tot"))
    val cells = ns.crossJoin(ct).crossJoin(total)
      .join(o, Seq(sourceCol, "term"), "left")
      .withColumn("o0", coalesce(col("o"), lit(0L)).cast("double"))
      .withColumn("e", col("n").cast("double") * col("c").cast("double") / col("_tot").cast("double"))
    cells.groupBy(col(sourceCol))
      .agg(max(col("n")).as("n_tokens"),
        round(sum((col("o0") - col("e")) * (col("o0") - col("e")) / col("e")), 4).as("chi2"))
  }

  def unigramLmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("_n"))
    toks.join(vocab, "term")
      .groupBy(col(idCol))
      .agg(round(avg(col("_n")), 4).as("lm_score"))
  }
}
