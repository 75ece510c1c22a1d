package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

/** Token-budget sequence packing. */
class PackingSpec extends SparkTestBase {
  import spark.implicits._

  test("bins cut at budget boundaries; overflow bounded to one document") {
    val docs = Seq((1L, 1000L), (2L, 1000L), (3L, 1000L), (4L, 5000L), (5L, 100L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.packByTokenBudget(docs, "doc_id", "n_tokens",
      budget = 2048, shards = 1, shardExpr = Some(lit(0)))
      .orderBy("doc_id").select("doc_id", "bin").as[(Long, Long)].collect().toSeq
    // exclusive prefix sums: 0, 1000, 2000, 3000, 8000 -> bins 0,0,0,1,3
    assert(out == Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 3L)))
  }

  test("assignment is partitioning-invariant and deterministic") {
    val docs = (1 to 500).map(i => (i.toLong, (i % 97 + 10).toLong)).toDF("doc_id", "n_tokens")
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packByTokenBudget(df, "doc_id", "n_tokens", budget = 512, shards = 4)
        .select("doc_id", "shard", "bin").collect().map(_.toString).sorted.toSeq
    assert(run(docs) == run(docs.repartition(11)))
  }

  test("bin arithmetic is exact past 2^53 (integer div, not double floor)") {
    // second doc's exclusive prefix sum is 2^53 + 1, which a double cannot
    // represent: floor((2^53+1) / 1.0) would round down to 2^53
    val big = (1L << 53) + 1L
    val docs = Seq((1L, big), (2L, 10L)).toDF("doc_id", "n_tokens")
    val out = Packing.packByTokenBudget(docs, "doc_id", "n_tokens",
      budget = 1, shards = 1, shardExpr = Some(lit(0)))
      .orderBy("doc_id").select("bin").as[Long].collect().toSeq
    assert(out == Seq(0L, big), s"expected exact long bins, got $out")
  }

  test("no bin exceeds budget by more than its last document") {
    val docs = (1 to 300).map(i => (i.toLong, (i % 50 + 1).toLong * 10)).toDF("doc_id", "n_tokens")
    val bins = Packing.packByTokenBudget(docs, "doc_id", "n_tokens", budget = 1000, shards = 4)
      .groupBy("shard", "bin")
      .agg(sum("n_tokens").as("total"), max("n_tokens").as("biggest"))
      .collect()
    bins.foreach { r =>
      assert(r.getLong(2) < 1000 + r.getLong(3),
        s"bin ${r.get(0)}/${r.get(1)} total ${r.getLong(2)} exceeds budget + last doc")
    }
  }
}
