package graft

import graft.operators.Sampling

/** Reproducible hash-based sampling. */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("deterministicSample: identical membership across runs and partitionings") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(docs.repartition(13), "doc_id", 0.2)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "membership must not depend on partitioning or run")
    assert(math.abs(a.size - 100) < 40, s"~20% of 500 expected, got ${a.size}")
  }

  test("different seeds give different (but internally stable) samples") {
    val s0 = Sampling.deterministicSample(docs, "doc_id", 0.3, seed = 0)
      .select("doc_id").as[Long].collect().toSet
    val s1 = Sampling.deterministicSample(docs, "doc_id", 0.3, seed = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(s0 != s1, "seeds must decorrelate samples")
  }

  test("fraction bounds: 0 keeps nothing, 1 keeps everything") {
    assert(Sampling.deterministicSample(docs, "doc_id", 0.0).count() == 0)
    assert(Sampling.deterministicSample(docs, "doc_id", 1.0).count() == docs.count())
  }

  test("stratifiedSample honors per-stratum fractions and drops absent strata") {
    val out = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 1.0), seed = 0)
    val langs = out.select("lang").distinct().as[String].collect().toSet
    assert(langs == Set("en"), "strata absent from the map must be dropped")
    assert(out.count() == docs.filter($"lang" === "en").count(), "fraction 1.0 keeps all of stratum")
  }
}
