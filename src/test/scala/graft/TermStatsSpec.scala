package graft

import graft.operators.TermStats

/** T10 — per-document distinctive terms (tf/df). */
class TermStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "spark spark engine"),
    (2L, "engine tuning"),
    (3L, "spark tuning tuning notes")
  ).toDF("doc_id", "text")

  test("score = tf/df; top-k per document with term-ascending tiebreak") {
    val out = TermStats.distinctiveTerms(docs, "doc_id", "text", 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._6)).toMap
    // doc 1: spark tf=2 df=2 -> 1.0 ; engine tf=1 df=2 -> 0.5
    assert(byDoc(1L).map(t => (t._2, t._5)).toSeq == Seq(("spark", 1.0), ("engine", 0.5)))
    // doc 2: engine 1/2 = 0.5 and tuning 1/2 = 0.5 tie -> term asc: engine first
    assert(byDoc(2L).map(_._2).toSeq == Seq("engine", "tuning"))
    // doc 3: tuning tf=2 df=2 -> 1.0 beats notes 1/1 = 1.0? equal -> notes first (term asc)
    assert(byDoc(3L).head._2 == "notes" && byDoc(3L).head._5 == 1.0)
  }

  test("k bounds output per document; every document with tokens appears") {
    val out = TermStats.distinctiveTerms(docs, "doc_id", "text", 1)
    assert(out.count() == 3)
    assert(out.select("doc_id").distinct().count() == 3)
  }

  test("ngramCounts weighs every occurrence, not per-document sets") {
    val d = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TermStats.ngramCounts(d, "text", 2, 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // doc1 bigrams: "a b", "b a", "a b" (repeat counts); doc2: "a b", "b c"
    assert(out == Map("a b" -> 3L, "b a" -> 1L, "b c" -> 1L))
  }

  test("unigramLmScore: mean corpus frequency of token occurrences, repeats weighted") {
    // corpus freqs over the 3 docs: spark=3, engine=2, tuning=3, notes=1
    val out = TermStats.unigramLmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(1L) == ((3 + 3 + 2) / 3.0 * 10000).round / 10000.0) // spark spark engine
    assert(out(2L) == (2 + 3) / 2.0)                               // engine tuning
    assert(out(3L) == ((3 + 3 + 3 + 1) / 4.0))                     // spark tuning tuning notes
  }

  test("bigramLmScore: order-sensitive pair frequencies; <2-token docs null (T22)") {
    // corpus bigram freqs: "a b"=3 (doc1 ×2, doc2 ×1), "b a"=2 (doc1, doc3),
    // "b c"=1 (doc2); doc3 is doc2 scrambled — same words, rarer pairs
    val d = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "c b a"), (4L, "a"))
      .toDF("doc_id", "text")
    val out = TermStats.bigramLmScore(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    assert(out(1L) == Some(((3 + 2 + 3) / 3.0 * 10000).round / 10000.0)) // "a b","b a","a b"
    assert(out(2L) == Some((3 + 1) / 2.0))                               // "a b","b c"
    assert(out(3L) == Some((1 + 2) / 2.0))                               // "c b"=1,"b a"
    // scrambled doc scores strictly below its in-order twin
    assert(out(3L).get < out(2L).get)
    assert(out(4L).isEmpty)                                              // no pairs to judge
  }

  test("chiSquareDrift: hand-computed cells; absent vocabulary terms contribute e (T16)") {
    // corpus: x,y,z each 3 of N=9; every source has n=3, so e=1 per cell
    val docs = Seq(("A", "x x y"), ("B", "x y y"), ("C", "z z z"))
      .toDF("source", "text")
    val out = TermStats.chiSquareDrift(docs, "source", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // A: (2-1)² + (1-1)² + (0-1)² = 2 — the z cell (o=0) contributes e=1
    assert(out("A") == ((3L, 2.0)), s"got ${out("A")}")
    assert(out("B") == ((3L, 2.0)))
    // C is pure drift: (0-1)² + (0-1)² + (3-1)²/1 = 6
    assert(out("C") == ((3L, 6.0)))
    // identical distributions → zero drift
    val same = Seq(("A", "x y"), ("B", "x y")).toDF("source", "text")
    val zero = TermStats.chiSquareDrift(same, "source", "text")
      .collect().map(_.getDouble(2))
    assert(zero.forall(_ == 0.0))
  }

  test("duplicateSpanCoverage: merged-interval coverage of cross-doc repeated windows (T18)") {
    import graft.operators.TermStats
    import org.apache.spark.sql.functions.col
    // docs 1 and 2 share the exact 3-token span "a b c" (doc 2 twice,
    // overlapping contexts); doc 3 repeats "x y z" WITHIN itself only —
    // within-doc repetition must NOT count as duplicated; doc 4 is short
    val docs = Seq(
      (1L, "a b c d e"),           // windows: [a b c][b c d][c d e] — only "a b c" dup
      (2L, "q a b c r a b c"),     // "a b c" at starts 1 and 5
      (3L, "x y z x y z"),         // "x y z" twice, but one doc only
      (4L, "tiny")                 // n < w -> no windows
    ).toDF("doc_id", "text")
    val out = TermStats.duplicateSpanCoverage(docs, "doc_id", "text", w = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "dup_tokens", "dup_frac")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // doc 1: dup start {0} -> 3 covered of 5; doc 2: starts {1, 5} ->
    // 3 + min(4, 3) = 6 of 8; doc 3: zero; doc 4: zero
    assert(out == Seq(
      (1L, 5L, 3L, 0.6), (2L, 8L, 6L, 0.75), (3L, 6L, 0L, 0.0), (4L, 1L, 0L, 0.0)),
      s"got $out")
    // overlapping dup starts merge, not double-count: doc 5 shares both
    // windows of "p p p p" with doc 6 -> starts {0, 1}, covered 3 + 1 = 4
    val ov = Seq((5L, "p p p p"), (6L, "p p p p")).toDF("doc_id", "text")
    val o5 = TermStats.duplicateSpanCoverage(ov, "doc_id", "text", w = 3)
      .filter(col("doc_id") === 5L)
      .select("dup_tokens").as[Long].collect().head
    assert(o5 == 4L, s"overlapping windows must merge to full coverage, got $o5")
  }

  test("scrubDuplicateSpans removes exactly the covered tokens, keeps order; full-dup docs keep 0 (T19)") {
    import graft.operators.TermStats
    val docs = Seq(
      (1L, "a b c d e"),       // dup window "a b c" -> scrub to "d e"
      (2L, "q a b c r"),       // "a b c" at start 1 -> scrub to "q r"
      (3L, "a b c"),           // the whole doc is the dup window -> empty
      (4L, "unique text here entirely novel")
    ).toDF("doc_id", "text")
    val out = TermStats.scrubDuplicateSpans(docs, "doc_id", "text", w = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "kept_tokens", "cleaned_md5")
      .as[(Long, Long, Long, String)].collect().toSeq
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out == Seq(
      (1L, 5L, 2L, h("d e")),
      (2L, 5L, 2L, h("q r")),
      (3L, 3L, 0L, h("")),
      (4L, 5L, 5L, h("unique text here entirely novel"))),
      s"got $out")
  }

  test("bm25: hand-computed Okapi scores; non-matching docs score 0 (T17)") {
    // corpus: N=3; query terms: spark (df=2), tuning (df=2)
    val out = TermStats.bm25(docs, "doc_id", "text", Seq("spark", "tuning"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val n = 3.0; val tot = 3.0 + 2.0 + 4.0; val avgdl = tot / n
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def cell(tf: Double, dl: Double, df: Double) =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1 "spark spark engine": spark tf=2, dl=3; no tuning
    assert(out(1L) == ((3L, r4(cell(2, 3, 2)))), s"got ${out(1L)}")
    // doc 2 "engine tuning": tuning tf=1, dl=2
    assert(out(2L) == ((2L, r4(cell(1, 2, 2)))))
    // doc 3: spark tf=1 + tuning tf=2, dl=4 — fixed-order term sum
    assert(out(3L) == ((4L, r4(cell(1, 4, 2) + cell(2, 4, 2)))))
    // a doc matching no term scores 0.0, and empty text gets dl=0
    val extra = docs.union(Seq((4L, "unrelated words only"), (5L, "")).toDF("doc_id", "text"))
    val out2 = TermStats.bm25(extra, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out2(4L)._2 == 0.0 && out2(5L) == ((0L, 0.0)))
    // higher tf at equal length ranks higher; every score non-negative
    assert(out(1L)._2 > out(2L)._2)
    assert(out.values.forall(_._2 >= 0.0))
  }

  test("qualityBuckets: quartile thresholds partition the corpus into head/middle/tail (T26)") {
    // lm_score is monotone in how common a doc's tokens are: docs built
    // of the repeated token score high, unique-token docs score low
    val docs = (1L to 8L).map { i =>
      val text = if (i <= 2) s"rare$i token$i only$i"          // tail
                 else if (i <= 6) s"common common rare$i"      // middle
                 else "common common common"                   // head
      (i, text)
    }.toDF("doc_id", "text")
    val out = TermStats.qualityBuckets(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(out.length == 8, "every document is bucketed")
    val byBucket = out.groupBy(_._3).view.mapValues(_.map(_._1).toSet).toMap
    assert(byBucket.keySet == Set("head", "middle", "tail"), s"got $byBucket")
    // ordering invariant: every tail score <= every middle <= every head
    val maxTail = out.filter(_._3 == "tail").map(_._2).max
    val mids = out.filter(_._3 == "middle").map(_._2)
    val minHead = out.filter(_._3 == "head").map(_._2).min
    assert(maxTail <= mids.min && mids.max <= minHead,
      s"buckets must be score-ordered: $out")
    // the all-common docs land in head
    assert(byBucket("head").contains(7L) && byBucket("head").contains(8L))
  }

  test("pmiCollocations: hand-computed PMI; collocated pair beats frequent-but-independent (T25)") {
    // "new york" always collocates; "the" is everywhere (so "the x" pairs
    // have high counts but low PMI); pairs under minCount drop
    val docs = Seq(
      (1L, "new york the a the b"),
      (2L, "new york the c the d"),
      (3L, "new york the a the b"),
      (4L, "rare pair")).toDF("doc_id", "text")
    val out = TermStats.pmiCollocations(docs, "text", minCount = 2, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val byGram = out.map(t => t._1 -> ((t._2, t._3))).toMap
    // hand recompute for "new york": unigrams N1=20, c_new=3, c_york=3;
    // bigrams N2=16, c_ab=3 → pmi = ln((3/16) / ((3/20)*(3/20)))
    val expected = BigDecimal(math.log((3.0/16.0) / ((3.0/20.0) * (3.0/20.0))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byGram("new york")._1 == 3L)
    assert(math.abs(byGram("new york")._2 - expected) < 1e-9,
      s"pmi(new york) = ${byGram("new york")._2}, expected $expected")
    assert(!byGram.contains("rare pair"), "pairs under minCount must drop")
    // the collocation outranks the independent high-frequency pairs
    assert(out.head._1 == "new york")
    byGram.filterKeys(_.startsWith("the ")).foreach { case (g, (_, p)) =>
      assert(p < byGram("new york")._2, s"$g must score below the collocation") }
  }

  test("heavyHitters: exact regime (vocab <= map) equals the exact counts; epsilon pin (T27)") {
    import graft.functions.FreqItems
    // the oracle's 0.00341796875 literal IS the sketch's own constant
    assert(FreqItems.epsilon(1024) == 3.5 / 1024)
    val df = Seq.tabulate(200)(i =>
      (i.toLong, s"tok${i % 7} tok${i % 3} filler${i % 5}")).toDF("doc_id", "text")
    // 15 distinct tokens <= maxMapSize 16: no evictions -> every token
    // returned with estimate == exact and collapsed bounds
    val got = TermStats.heavyHitters(df, "text", 16)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val exact = df.selectExpr("explode(split(lower(trim(text)), '\\\\s+')) AS t")
      .groupBy("t").count().as[(String, Long)].collect().toMap
    assert(got.keySet == exact.keySet, "no evictions: every token is frequent")
    got.foreach { case (t, (est, lb, ub)) =>
      assert(est == exact(t) && lb == est && ub == est, s"$t exact in the no-eviction regime")
    }
  }

  test("heavyHitters: eviction regime honors the published bound; union of shards too (T27)") {
    import graft.functions.FreqItems
    import org.apache.spark.sql.functions._
    // 400 distinct rare tokens + 3 heavy ones, map size 16 -> evictions
    // "dominant" (300 of 1000 tokens) clears eps(16)*N = 218.75 — the gate
    // row must be non-empty; the heavies exercise bound-bracketing
    val rows = (1 to 300).map(i => (i.toLong, s"heavy${i % 3} dominant rare$i")) ++
      (301 to 400).map(i => (i.toLong, s"rare$i"))
    val df = rows.toDF("doc_id", "text").repartition(7)
    val toks = df.select(explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
    val exact = toks.groupBy("t").count().as[(String, Long)].collect().toMap
    val n = exact.values.sum.toDouble
    val got = TermStats.heavyHitters(df, "text", 16)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // no false negatives above eps*N, and bounds bracket the truth
    exact.filter(_._2 > FreqItems.epsilon(16) * n).keys.foreach(t =>
      assert(got.contains(t), s"$t above eps*N must be returned"))
    got.foreach { case (t, (_, lb, ub)) =>
      val tru = exact.getOrElse(t, 0L)
      assert(lb <= tru && tru <= ub, s"$t: [$lb,$ub] must bracket $tru")
      assert(ub - lb <= (FreqItems.epsilon(16) * n).toLong + 1, s"$t: width within eps*N")
    }
    // sharded states folded with freqSketchUnion keep the same guarantees
    val states = df.withColumn("_shard", pmod(col("doc_id"), lit(4)))
      .select(col("_shard"), explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .groupBy("_shard").agg(FreqItems.freqSketch(col("t"), 16).as("st"))
    val folded = states.agg(FreqItems.freqSketchUnion(col("st"), 16).as("sk"))
      .select(explode(FreqItems.freqItems(col("sk"))).as("it"))
      .select("it.token", "it.estimate", "it.lower", "it.upper")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    exact.filter(_._2 > FreqItems.epsilon(16) * n).keys.foreach(t =>
      assert(folded.contains(t), s"union: $t above eps*N must be returned"))
    folded.foreach { case (t, (lb, ub)) =>
      val tru = exact.getOrElse(t, 0L)
      assert(lb <= tru && tru <= ub, s"union $t: [$lb,$ub] must bracket $tru")
    }
    // the gate row is deterministically all-true regardless of partitioning
    val gate = TermStats.heavyHittersGate(df.repartition(13), "text", 16)
      .as[(String, Long, Boolean)].collect()
    assert(gate.nonEmpty && gate.forall(_._3), "within_tol must hold under any stream order")
  }
}
