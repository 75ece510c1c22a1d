package graft

import org.apache.spark.sql.functions._

/** Cross-operator invariants of the end-to-end chains (the driver gate
  * hash-compares their outputs; these pin the SEMANTIC properties a reader
  * should be able to rely on without decoding the oracle SQL).
  */
class ChainSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("curation chain: benchmark ids never reach the output; blend is only the weighted sources") {
    val out = SparkEntry.curationChain(spark, sf).persist()
    val ids = out.select("doc_id").as[Long].collect()
    assert(ids.nonEmpty)
    assert(ids.forall(_ % 17 != 0), "held-out benchmark docs must never appear")
    assert(ids.distinct.length == ids.length, "output ids are unique (dedup held)")
    val srcs = Tables.documents(spark, sf)
      .join(out.select("doc_id"), "doc_id")
      .select("source").distinct().as[String].collect().toSet
    assert(srcs.subsetOf(Set("src0", "src1", "src2", "src3")),
      s"only the weighted sources survive the mixture, got $srcs")
    out.unpersist()
  }

  test("curation chain is deterministic across runs and partitionings") {
    def canon(cpus: Int) = SparkEntry.curationChain(spark, sf)
      .repartition(cpus).collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(canon(2) == canon(7))
  }

  test("ingest chain: only batch ids survive, none colliding with the corpus (round-6)") {
    val out = SparkEntry.ingestChain(spark, sf).persist()
    val ids = out.select("doc_id").as[Long].collect()
    assert(ids.nonEmpty)
    assert(ids.forall(_ % 13 == 0), "only new-batch docs may reach the output")
    assert(ids.distinct.length == ids.length, "self-dedup held")
    // no surviving batch doc shares a fingerprint with the corpus
    val docs = Tables.documents(spark, sf)
    val survivors = docs.join(out.select("doc_id"), "doc_id")
    val corpusFps = docs.filter(col("doc_id") % 13 =!= 0)
      .select(graft.functions.Text.fingerprint(col("text")).as("fp")).distinct()
    val collisions = survivors
      .select(graft.functions.Text.fingerprint(col("text")).as("fp"))
      .join(corpusFps, "fp").count()
    assert(collisions == 0, "exact ingest dedup held end-to-end")
    out.unpersist()
  }

  test("curation chain: per-shard bins are monotone in doc_id (packing contract)") {
    val rows = SparkEntry.curationChain(spark, sf)
      .select("shard", "doc_id", "bin").as[(Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2).map(_._3)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b },
        "bin ids never decrease along the shard's id order")
    }
  }
}
