package graft

import graft.functions.Text
import org.apache.spark.sql.functions._

/** T1–T4 text primitives: deterministic, engine-reproducible semantics. */
class TextSpec extends SparkTestBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("t").select(c).collect()(0).get(0)

  test("langId picks the dominant stopword language; all-zero -> und (T1)") {
    assert(one(Text.langId(col("t")), "the cat is in the house") == "en")
    assert(one(Text.langId(col("t")), "der Hund ist nicht ein Problem") == "de")
    assert(one(Text.langId(col("t")), "le chat est dans la maison") == "fr")
    assert(one(Text.langId(col("t")), "los gatos y las casas en verano") == "es")
    assert(one(Text.langId(col("t")), "zzz qqq xxx") == "und")
  }

  test("wsTokens / bpeTokens count as documented (T3)") {
    assert(one(Text.wsTokens(col("t")), "  a b   c  ") == 3)
    assert(one(Text.bpeTokens(col("t")), "hello world42!") == 4,
      "letter run, letter run, digit run, punct = 4")
  }

  test("fingerprint is invariant to case/punct/whitespace and nothing else (T4)") {
    val a = one(Text.fingerprint(col("t")), "Hello, World!")
    val b = one(Text.fingerprint(col("t")), "  hello world  ")
    val c = one(Text.fingerprint(col("t")), "hello worlds")
    assert(a == b && a != c)
  }

  test("tokenHash60 is 60-bit non-negative and distinct across tokens") {
    val hs = Seq("alpha", "beta", "gamma", "").toDF("t")
      .select(Text.tokenHash60(col("t"))).as[Long].collect()
    hs.foreach(h => assert(h >= 0 && h < (1L << 60)))
    assert(hs.distinct.length == hs.length)
  }

  test("wordShingles produces distinct n-grams in order-independent set form") {
    val sh = one(Text.wordShingles(col("t"), 2), "a b a b c")
      .asInstanceOf[scala.collection.Seq[String]].toSet
    assert(sh == Set("a b", "b a", "b c"))
  }

  test("repetitionScore: 0 for all-distinct, ->1 for one repeated token, bounded") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta"),  // all distinct -> 0
      (2L, "spam spam spam spam"),     // 1 distinct of 4 -> 0.75
      (3L, "The the THE mix")          // casefolds: the x3 + mix -> 0.5
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), Text.repetitionScore(col("text")).as("r"))
      .orderBy("doc_id").as[(Long, Double)].collect().toSeq
    assert(out == Seq((1L, 0.0), (2L, 0.75), (3L, 0.5)))
  }

  test("dupWordFrac / topWordFrac / dupNgramFrac: hand-computed fractions (T20)") {
    def ws(t: String) = split(lower(trim(lit(t))), "\\s+")
    def d(c: org.apache.spark.sql.Column): Double =
      Seq(1).toDF("x").select(round(c, 6)).collect()(0).getDouble(0)
    // "a b a b a" — 5 words, 2 distinct; top word "a" appears 3 times
    assert(d(Text.dupWordFrac(ws("a b a b a"))) == 0.6)
    assert(d(Text.topWordFrac(ws("a b a b a"))) == 0.6)
    // trigrams of "a b a b a": [aba, bab, aba] — 3 total, 2 distinct
    assert(d(Text.dupNgramFrac(ws("a b a b a"), 3)) == 0.333333)
    // all-distinct text: zero repetition on every signal
    assert(d(Text.dupWordFrac(ws("v w x y z"))) == 0.0)
    assert(d(Text.topWordFrac(ws("v w x y z"))) == 0.2)
    assert(d(Text.dupNgramFrac(ws("v w x y z"), 3)) == 0.0)
    // top-word fold is order-independent (sorted-run maximum)
    assert(d(Text.topWordFrac(ws("b a a b a"))) == 0.6)
    // fewer than n words: no n-grams to judge -> null
    val nulls = Seq(1).toDF("x")
      .select(Text.dupNgramFrac(ws("a b"), 3).as("f")).collect()(0)
    assert(nulls.isNullAt(0))
  }

  test("scrubPii redacts emails and long digit runs; piiCount matches (T9)") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact me at jane.doe+x@example.co.uk or call 5551234567 now"),
      (2L, "short 123456 stays, 1234567 goes"),
      (3L, "no pii here")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), Text.scrubPii(col("text")).as("s"),
      Text.piiCount(col("text")).as("n"))
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(out(0)._2 == "contact me at <EMAIL> or call <NUMBER> now" && out(0)._3 == 2L)
    assert(out(1)._2 == "short 123456 stays, <NUMBER> goes" && out(1)._3 == 1L)
    assert(out(2)._2 == "no pii here" && out(2)._3 == 0L)
  }

  test("qualityScore stays within [0,1] on testdata") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val mm = docs.select(Text.qualityScore(col("text")).as("q"))
      .agg(min("q"), max("q")).collect()(0)
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  test("gopherSignals: hand-computed counts and ratios (T13)") {
    val doc = "- first bullet line\n- second bullet line\nplain line ends...\n\n"
    val df = Seq((1L, doc)).toDF("doc_id", "text")
    val sig = Text.gopherSignals(col("text"))
    val row = df.select(sig.map { case (n, c) => c.as(n) }: _*).collect()(0)
    val get = sig.map(_._1).zipWithIndex.toMap
    assert(row.getLong(get("n_words")) == 11L, "words incl. the two '-' bullets")
    // 3 non-blank lines: 2 bullet, 1 ellipsis-terminated
    assert(row.getDouble(get("bullet_frac")) == 0.6667)
    assert(row.getDouble(get("ellipsis_frac")) == 0.3333)
    assert(row.getLong(get("stop_hits")) == 0L)
    // '...' counts once as a symbol; 11 words
    assert(row.getDouble(get("symbol_ratio")) == 0.0909)
  }

  test("gopherPass: passes normal prose, fails short/bulleted/stopword-free docs (T13)") {
    val prose = ("the quick brown fox jumps over the lazy dog and then walks to " +
      "the river of calm water that we have seen with joy ") * 5 // >50 words, stopwords
    val bullets = (1 to 60).map(i => s"- item $i of the list that we have").mkString("\n")
    val short = "too few words to pass the gate"
    val symbols = (("### " * 20) + "the of and that have with be to ") * 10
    val df = Seq((1L, prose), (2L, bullets), (3L, short), (4L, symbols))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"), Text.gopherPass(col("text")).as("p"))
      .orderBy("doc_id").as[(Long, Boolean)].collect().toMap
    assert(out(1L), "normal prose passes every rule")
    assert(!out(2L), "90%+ bullet lines fail the bullet rule")
    assert(!out(3L), "under 50 words fails the length rule")
    assert(!out(4L), "symbol ratio >= 0.1 fails the symbol rule")
  }

  test("hashedLinearScore: additive over tokens, dyadic-exact, trim/case stable (T23)") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a b"), (4L, "a a"),
      (5L, "  A  b "), (6L, "a b c d e f g h the of and with")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), Text.hashedLinearScore(col("text")).as("s"))
      .as[(Long, Double)].collect().toMap
    // linear: score of a concatenation is the sum of per-token weights
    assert(out(3L) == out(1L) + out(2L))
    assert(out(4L) == 2 * out(1L))
    // casefold + trim + \s+ collapse → same tokens, same score
    assert(out(5L) == out(3L))
    // every weight is a multiple of 1/8 → 8×score is integral (exact sums)
    out.values.foreach(s => assert((s * 8) == (s * 8).round.toDouble, s"non-dyadic $s"))
  }

  test("NFC normalization: decomposed == precomposed after the expression; pipeline collapses noise (T24)") {
    import graft.functions.TextNorm
    import spark.implicits._
    val precomposed = "caf\u00e9"       // \u00e9 precomposed
    val decomposed = "cafe\u0301"       // e + combining acute accent
    val rows = Seq((1L, precomposed), (2L, decomposed),
      (3L, "  Mixed\tCase\u000band\u0000control  "), (4L, "plain ascii"))
      .toDF("id", "t")
    val out = rows.select(col("id"), TextNorm.normalizeText(col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the whole point: the two byte sequences become THE SAME document
    assert(out(1L) == out(2L), s"NFC must canonicalize: ${out(1L)} vs ${out(2L)}")
    assert(out(1L) == "caf\u00e9")
    // control chars (tab, VT, NUL) become spaces, then collapse; case folds
    assert(out(3L) == "mixed case and control")
    assert(out(4L) == "plain ascii")
    // bare expression: ASCII fast path returns the input unchanged; nulls pass
    assert(rows.select(TextNorm.nfc(lit(null).cast("string"))).head.isNullAt(0))
    // SQL registration: graft_nfc callable from plain SQL
    graft.plans.GraftExtensions.registerFunctions(spark)
    assert(spark.sql("SELECT graft_nfc('cafe\u0301') = 'caf\u00e9'").head.getBoolean(0))
    // wrong input type fails at analysis, not execution
    intercept[org.apache.spark.sql.AnalysisException] {
      rows.select(TextNorm.nfc(col("id"))).collect()
    }
  }
}
