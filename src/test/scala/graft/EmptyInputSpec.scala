package graft

import graft.operators._
import graft.functions.Text
import org.apache.spark.sql.functions._

/** Empty-relation semantics (SURVEY §7.4.8): the engine keeps schemas and
  * returns empty results where the reference loses schema or raises —
  * every operator family must degrade to empty, not throw or fabricate.
  */
class EmptyInputSpec extends SparkTestBase {
  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("round-5 additions: empty inputs degrade to empty/zero, never throw") {
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val km = Similarity.kmeansAssign(emptyVecs, "vec_id", "embedding", dim = 4, k = 2, iters = 2)
    assert(km.columns.contains("cell") && km.count() == 0)
    assert(Similarity.quantizedTopK(emptyVecs, emptyVecs, "vec_id", "embedding", 5).count() == 0)
    assert(TermStats.distinctiveTerms(emptyDocs, "doc_id", "text", 3).count() == 0)
    assert(TermStats.unigramLmScore(emptyDocs, "doc_id", "text").count() == 0)
    assert(Dedup.decontaminationPairs(emptyDocs, emptyDocs, "doc_id", "text", 3, 0.5, 50).count() == 0)
    assert(Dedup.exactIncremental(emptyDocs, emptyDocs, "doc_id", "text").count() == 0)
    val emptyNums = Seq.empty[Double].toDF("v")
    assert(Analytics.histogram(emptyNums, "v", 0.0, 1.0, 4).count() == 0)
    val prof = Analytics.profile(emptyNums, Seq("v")).collect()
    assert(prof.length == 1 && prof(0).getLong(1) == 0L && prof(0).getLong(2) == 0L,
      "profile of an empty table reads (0 nulls, 0 distinct), not null")
    assert(Analytics.topNPerGroup(emptyNums.withColumn("k", lit(1)), Seq("k"),
      Seq(col("v").desc), 2).count() == 0)
  }

  test("round-6 additions: empty inputs degrade to empty/zero, never throw") {
    // BM25 over an empty corpus: no rows, schema intact (N=0 never divides)
    val bm = TermStats.bm25(emptyDocs, "doc_id", "text", Seq("spark"))
    assert(bm.columns.toSeq == Seq("doc_id", "dl", "bm25") && bm.count() == 0)
    // incremental minhash: empty batch and/or empty corpus
    assert(Dedup.minhashIncremental(emptyDocs, emptyDocs, "doc_id", "text", 0.5).count() == 0)
    // image codecs: empty frames stay empty, schemas intact
    val png = Multimodal.encodePngBatches(spark, emptyDocs, "doc_id")
    assert(png.columns.toSeq == Seq("doc_id", "payload", "media_type") && png.count() == 0)
    assert(Multimodal.decodeImageBatches(spark, png, "doc_id").count() == 0)
    // built-in session_window over no events
    val noEvents = Seq.empty[(Long, Long)].toDF("user_id", "ts_us")
    assert(graft.streaming.StreamOps.sessionizeWindow(noEvents, "30 minutes").count() == 0)
  }

  test("round-7 additions: empty inputs degrade to empty/zero, never throw") {
    // duplicate-span coverage: empty corpus -> no rows, schema intact
    val ds = TermStats.duplicateSpanCoverage(emptyDocs, "doc_id", "text", 5)
    assert(ds.columns.toSeq == Seq("doc_id", "n_tokens", "dup_tokens", "dup_frac") &&
      ds.count() == 0)
    // materialized indexes built over an empty corpus: empty frames with
    // the right schemas, and probes against them keep the whole batch
    val batch = Seq((1L, "some new document text here")).toDF("doc_id", "text")
    val mh = Dedup.buildMinhashIndex(emptyDocs, "doc_id", "text")
    assert(mh.sets.count() == 0 && mh.bands.count() == 0)
    assert(Dedup.minhashIncrementalFromIndex(batch, mh, "doc_id", "text", 0.5).count() == 1)
    assert(Dedup.exactIncrementalFromIndex(batch,
      Dedup.fingerprintIndex(emptyDocs, "text"), "doc_id", "text").count() == 1)
    val ci = Dedup.buildContainmentIndex(emptyDocs, "doc_id", "text", 3, 50)
    assert(Dedup.decontaminationFromIndex(ci, batch, "doc_id", "text", 3, 0.5).count() == 0)
    val noVecs7 = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val vb = Seq((1L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val ei = Dedup.buildEmbeddingIndex(noVecs7, "vec_id", "embedding", dim = 4)
    assert(Dedup.embeddingIncrementalFromIndex(vb, ei, "vec_id", "embedding",
      0.9, dim = 4).count() == 1)
    // audio codecs: empty frames stay empty, schemas intact
    val wav = Multimodal.encodeWavBatches(spark, emptyDocs, "doc_id")
    assert(wav.columns.toSeq == Seq("doc_id", "payload", "media_type") && wav.count() == 0)
    assert(Multimodal.decodeAudioBatches(spark, wav, "doc_id").count() == 0)
    assert(Multimodal.resizePixelsToBox(spark,
      Multimodal.encodePngBatches(spark, emptyDocs, "doc_id"), "doc_id", 8, 6).count() == 0)
    // exact median over an empty / all-null input yields a null (SQL agg)
    val med = Seq.empty[Double].toDF("v")
      .agg(graft.functions.ExactMedian.exactMedian(col("v"))).head
    assert(med.isNullAt(0))
  }

  test("round-8 additions: empty inputs degrade to empty/zero, never throw") {
    val dir = "target/tmp/emptyspec_r8"
    val batch = Seq((1L, "some new document text here")).toDF("doc_id", "text")
    // index UPDATE with an EMPTY survivor batch: appends empty deltas,
    // probes are unchanged
    Dedup.writeMinhashIndex(
      Dedup.buildMinhashIndex(batch, "doc_id", "text"), s"$dir/mh", "doc_id", 2)
    val before = Dedup.minhashIncrementalFromIndex(
      Seq((2L, "another doc")).toDF("doc_id", "text"),
      Dedup.readMinhashIndex(spark, s"$dir/mh"), "doc_id", "text", 0.5).count()
    Dedup.updateMinhashIndex(emptyDocs, s"$dir/mh", "doc_id", "text", shards = 2)
    assert(Dedup.minhashIncrementalFromIndex(
      Seq((2L, "another doc")).toDF("doc_id", "text"),
      Dedup.readMinhashIndex(spark, s"$dir/mh"), "doc_id", "text", 0.5).count() == before)
    graft.sources.ParquetSink.writeSharded(
      Dedup.fingerprintIndex(batch, "text"), s"$dir/fp", "fingerprint", 2)
    Dedup.updateFingerprintIndex(emptyDocs, s"$dir/fp", "text", shards = 2)
    assert(spark.read.parquet(s"$dir/fp").count() == 1)
    Dedup.writeContainmentIndex(
      Dedup.buildContainmentIndex(batch, "doc_id", "text", 2, 50), s"$dir/ci",
      "doc_id", 2)
    Dedup.updateContainmentIndex(emptyDocs, s"$dir/ci", "doc_id", "text", 2, 50,
      shards = 2)
    assert(Dedup.decontaminationFromIndex(Dedup.readContainmentIndex(spark, s"$dir/ci"),
      batch, "doc_id", "text", 2, 0.5).count() == 1)
    // IVF: empty update is a no-op; empty queries probe to zero rows
    val vb = Seq((1L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    Similarity.writeIvfIndex(
      Similarity.buildIvfIndex(vb, "vec_id", "embedding", dim = 4, k = 1),
      s"$dir/ivf", "vec_id", shards = 2)
    Similarity.updateIvfIndex(noVecs, s"$dir/ivf", "vec_id", "embedding", shards = 2)
    val ivf = Similarity.readIvfIndex(spark, s"$dir/ivf")
    assert(ivf.cells.count() == 1)
    assert(Similarity.ivfTopKFromIndex(ivf, noVecs, "vec_id", "embedding", k = 3).count() == 0)
    // AVI codec: empty frames stay empty, schemas intact
    val avi = Multimodal.encodeAviBatches(spark, emptyDocs, "doc_id")
    assert(avi.columns.toSeq == Seq("doc_id", "payload", "media_type") && avi.count() == 0)
    assert(Multimodal.decodeVideoBatches(spark, avi, "doc_id").count() == 0)
    // AIFF: same contract as WAV
    assert(Multimodal.decodeAudioBatches(spark,
      Multimodal.encodeAiffBatches(spark, emptyDocs, "doc_id"), "doc_id").count() == 0)
  }

  test("dedup family: empty corpus -> empty outputs, schemas intact") {
    assert(Dedup.exact(emptyDocs, "doc_id", "text").count() == 0)
    val nd = Dedup.minhashNearDups(emptyDocs, "doc_id", "text", 0.5)
    assert(nd.columns.toSeq == Seq("id_1", "id_2", "jaccard") && nd.count() == 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs, "doc_id", "text", 2, 0.1).count() == 0)
    assert(Dedup.simhashNearDups(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("connectedComponents: empty pair set -> empty labels (both paths)") {
    val noPairs = Seq.empty[(Long, Long)].toDF("id_1", "id_2")
    for (limit <- Seq(1L << 20, 0L))
      assert(Dedup.connectedComponents(noPairs, localEdgeLimit = limit).count() == 0)
    // keepCanonical over no pairs keeps everything
    val docs = Seq(1L, 2L).toDF("doc_id")
    assert(Dedup.keepCanonical(docs, "doc_id", noPairs).count() == 2)
  }

  test("pairs / similarity: empty inputs -> empty outputs") {
    assert(Pairs.blockedPairs(emptyDocs, "doc_id", 8).count() == 0)
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.bruteForceTopK(noVecs, noVecs, "vec_id", "embedding", 5).count() == 0)
    assert(Dedup.embeddingNearDups(noVecs, "vec_id", "embedding", 0.5).count() == 0)
  }

  test("aggregation / packing / sampling: empty -> empty (grouped) or null row (global)") {
    assert(Agg.groupAgg(emptyDocs, Seq("doc_id"), Seq("text" -> Seq("count"))).count() == 0)
    // global aggregate over empty input yields ONE row (SQL semantics):
    // count = 0, value aggs null — documented deviation from the
    // reference's schema-less DataFrame({})
    val g = Agg.globalAgg(emptyDocs.withColumn("v", lit(1.0)), Seq("v" -> Seq("count", "sum")))
    val row = g.head
    assert(row.getLong(0) == 0L && row.isNullAt(1))
    assert(Packing.packByTokenBudget(
      Seq.empty[(Long, Long)].toDF("doc_id", "n_tokens"), "doc_id", "n_tokens", 100).count() == 0)
    assert(Sampling.deterministicSample(emptyDocs, "doc_id", 0.5).count() == 0)
  }

  test("text functions: empty string and whitespace-only documents") {
    val edge = Seq((1L, ""), (2L, "   "), (3L, "one")).toDF("doc_id", "text")
    val out = edge.select(
      Text.wsTokens(col("text")).as("t"),
      Text.repetitionScore(col("text")).as("r"),
      Text.qualityScore(col("text")).as("q"),
      Text.fingerprint(col("text")).as("f")).collect()
    out.foreach { r =>
      assert(!r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2) && !r.isNullAt(3))
      assert(r.getDouble(1) >= 0.0 && r.getDouble(2) >= 0.0)
    }
    // empty and whitespace-only normalize to the same fingerprint
    assert(out(0).getString(3) == out(1).getString(3))
  }

  test("round-9 additions: empty inputs degrade to empty/zero, never throw") {
    // bigram LM over an empty corpus: no rows, schema intact
    val bg = TermStats.bigramLmScore(emptyDocs, "doc_id", "text")
    assert(bg.columns.toSeq == Seq("doc_id", "lm2_score") && bg.count() == 0)
    // single-token corpus: every row survives with a null score
    val one = Seq((1L, "solo")).toDF("doc_id", "text")
    val bg1 = TermStats.bigramLmScore(one, "doc_id", "text").collect()
    assert(bg1.length == 1 && bg1(0).isNullAt(1))
    // hashed linear scorer over an empty frame: no rows, no throw
    assert(emptyDocs.select(Text.hashedLinearScore(col("text"))).count() == 0)
    // snapshot diff: empty vs empty, empty vs non-empty (all added/removed)
    assert(Ops.snapshotDiff(emptyDocs, emptyDocs, "doc_id", Seq("text")).count() == 0)
    val some = Seq((1L, "a")).toDF("doc_id", "text")
    assert(Ops.snapshotDiff(emptyDocs, some, "doc_id", Seq("text"))
      .collect()(0).getString(1) == "added")
    assert(Ops.snapshotDiff(some, emptyDocs, "doc_id", Seq("text"))
      .collect()(0).getString(1) == "removed")
    // skew stats over an empty table: no rows, schema intact
    val sk = Joins.skewStats(emptyDocs, Seq("doc_id"))
    assert(sk.count() == 0)
  }

  test("round-10 additions: empty inputs degrade to empty/zero, never throw") {
    // PCM resample of an empty payload frame: no rows, typed schema intact
    val emptyPayload = spark.emptyDataset[(Long, Array[Byte])]
      .toDF("doc_id", "payload")
    val rs = Multimodal.resampleAudioBatches(spark, emptyPayload, "doc_id", 12000)
    assert(rs.count() == 0)
    // bucketed snapshot staging of an empty frame: table registers, diff
    // of two empty bucketed snapshots is empty
    graft.sources.ParquetSink.writeBucketedTable(emptyDocs, "empty_x8b_a",
      "doc_id", 2, "target/tmp/empty_x8b_a")
    graft.sources.ParquetSink.writeBucketedTable(emptyDocs, "empty_x8b_b",
      "doc_id", 2, "target/tmp/empty_x8b_b")
    assert(Ops.snapshotDiff(spark.table("empty_x8b_a"), spark.table("empty_x8b_b"),
      "doc_id", Seq("text")).count() == 0)
    // MAD over an empty frame: empty stats, empty scores, no throw
    assert(Analytics.madScores(emptyDocs.withColumn("v", col("doc_id").cast("double")),
      Seq("text"), "v").count() == 0)
    // normalization of empty/blank strings: empty out, null passes through
    val blank = Seq((1L, ""), (2L, "   \t "), (3L, null.asInstanceOf[String]))
      .toDF("id", "t")
      .select(col("id"), graft.functions.TextNorm.normalizeText(col("t")).as("n"))
      .orderBy("id").collect()
    assert(blank(0).getString(1) == "" && blank(1).getString(1) == "")
    assert(blank(2).isNullAt(1))
    // per-window distinct users over zero events: empty relation
    assert(graft.streaming.StreamOps.windowDistinctUsers(
      emptyDocs.select(col("doc_id").as("user_id"), col("doc_id").as("ts_us")),
      3600000000L).count() == 0)
    // changeset apply with both sides empty: empty, schema intact
    val emptyChanges = emptyDocs.withColumn("change", lit("added"))
      .select("doc_id", "change", "text")
    assert(Ops.applyChangeset(emptyDocs, emptyChanges, "doc_id").count() == 0)
  }

  test("round-13 additions: empty inputs degrade to empty/zero, never throw") {
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val emptyPairs = Seq.empty[(Long, Long)].toDF("id_1", "id_2")
    // keepBest with no pairs: everything survives (no clusters, no losers)
    val docs = Seq((1L, 3L), (2L, 9L)).toDF("doc_id", "score")
    assert(Dedup.keepBest(docs, "doc_id", emptyPairs, "score").count() == 2)
    assert(Dedup.keepBest(emptyDocs.withColumn("score", lit(1L)),
      "doc_id", emptyPairs, "score").count() == 0)
    // semDedup over an empty corpus: empty, never throws (kmeans emits its
    // typed-null cell column and the pair join finds nothing)
    assert(Dedup.semDedup(emptyVecs, "vec_id", "embedding", dim = 4, k = 2,
      threshold = 0.5).count() == 0)
    // RRF over empty candidate lists: empty fusion; topKRanked keeps schema
    val emptyScored = Seq.empty[(Long, Double)].toDF("id", "score")
    val ranked = operators.Retrieval.topKRanked(emptyScored, "id", "score", 5)
    assert(ranked.columns.toSeq == Seq("id", "rank") && ranked.count() == 0)
    assert(operators.Retrieval.rrfFuse(Seq(ranked, ranked), "id").count() == 0)
  }

  test("round-11 additions: empty inputs degrade to empty/zero, never throw") {
    // JSON extraction over an empty frame: no rows, lifted schema intact
    val emptyProps = Seq.empty[(Long, String)].toDF("id", "props")
    val out = SemiStructured.extractJson(emptyProps, "props",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType))))
    assert(out.columns.toSeq == Seq("id", "k") && out.count() == 0)
  }

  test("round-13 late additions (s5p/x14/t27/d4e): empty inputs degrade to empty, never throw") {
    val emptySrc = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    // the mixing solver: empty corpus -> empty plan, schema intact
    val plan = Sampling.mixingPlan(emptySrc, "source", "doc_id",
      temperature = 2.0, budget = 1000L)
    assert(plan.columns.toSeq == Seq("source", "n_docs", "n_weight", "share",
      "target_weight", "repeat_factor") && plan.count() == 0)
    // the dataset card
    val card = Analytics.corpusReport(emptySrc, "text", "source")
    assert(card.columns.contains("dup_frac") && card.count() == 0)
    // heavy hitters: the global sketch row exists but decodes to no items
    assert(TermStats.heavyHitters(emptySrc, "text", 16).count() == 0)
    assert(TermStats.heavyHittersGate(emptySrc, "text", 16).count() == 0)
    val states = TermStats.buildHeavyHitterShardStates(emptySrc, "doc_id",
      "text", 16, shards = 2)
    assert(states.count() == 0)
    assert(TermStats.mergedHeavyHitters(states, 16).count() == 0)
    // the sampled df diagnostic
    assert(Dedup.shingleDfStatsSampled(emptySrc, "doc_id", "text", 3,
      rate = 0.25).count() == 0)
    // the fuzzy auto gate: empty histogram -> nDocs 0, budget 0, total 0
    // -> unbounded branch over nothing (must not divide, throw, or emit)
    assert(Dedup.fuzzyNearDupsAuto(emptySrc, "doc_id", "text", maxDist = 40)
      .count() == 0)
  }

  test("round-16 additions: empty inputs degrade to empty/zero, never throw") {
    // span scrub over no docs: schema intact, zero rows (the priced
    // tokenVolume is 0 -> widths floor at defaultParallelism, no divide)
    val sc = TermStats.scrubDuplicateSpans(emptyDocs, "doc_id", "text", 5)
    assert(sc.columns.toSeq == Seq("doc_id", "n_tokens", "kept_tokens", "cleaned_md5") &&
      sc.count() == 0)
    // the gated embedding LSH branches with an empty corpus: the gate's
    // pairCost/allPairs are both 0 -> banded branch over nothing
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Dedup.embedNearDupAuto(emptyVecs, "vec_id", "embedding", 0.45,
      dim = 4, bands = 4, bitsPerBand = 2).count() == 0)
    assert(Dedup.embeddingIncrementalAuto(emptyVecs, emptyVecs, "vec_id",
      "embedding", 0.45, dim = 4, bands = 4, bitsPerBand = 2).count() == 0)
    // simhash pairs (first-agreeing-chunk form) over nothing
    assert(Dedup.simhashNearDups(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("round-17 additions: empty inputs degrade to empty/zero, never throw") {
    // the guarded fixed-cap sparse path on no docs: the sampled stage is
    // size-gated off, the exact histogram is empty (priced 0 <= guard),
    // and the admitted pipeline yields no pairs — even when the sampled
    // stage is explicitly ARMED, a zero estimate must admit, not refuse
    assert(Dedup.ngramJaccardPairsSparse(emptyDocs, "doc_id", "text", 3, 0.2,
      maxDf = 50).count() == 0)
    assert(Dedup.ngramJaccardPairsSparse(emptyDocs, "doc_id", "text", 3, 0.2,
      maxDf = 50, quickPriceMinDocs = 0L).count() == 0)
    // slice diagnostic over no clicks: schema intact, zero rows; the
    // derivation then falls back to the horizon (spec'd in StreamOpsSpec)
    val emptyClicks = Seq.empty[(Long, Long)].toDF("user_id", "ts_us")
    val st = graft.streaming.StreamOps.asofSliceStats(emptyClicks,
      "user_id", "ts_us", 3600000000L)
    assert(st.columns.toSeq == Seq("slice_us", "amplification", "n_slots",
      "max_slot", "n_rows") && st.count() == 0)
  }
}
