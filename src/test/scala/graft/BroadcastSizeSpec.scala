package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** Pins the bytes-per-key assumption behind `Dedup.BroadcastRareKeyLimit`:
  * the limit protects the driver/executors from a broadcast HashedRelation
  * whose REAL footprint is several× the raw key bytes, so the constant must
  * be derived from a measured per-row cost, not the 8-byte key. This spec
  * measures the actual BroadcastExchange `dataSize` for a single-long-column
  * relation at the limit's scale and asserts the budgeted bytes/key bounds
  * it from above within 2× (estimate ≥ actual, never optimistic).
  */
class BroadcastSizeSpec extends SparkTestBase {

  private def broadcastDataSize(plan: SparkPlan): Option[Long] = {
    import org.apache.spark.sql.execution.adaptive.QueryStageExec
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => q +: walk(q.plan)
      case r: ReusedExchangeExec => r +: walk(r.child)
      case other =>
        (other +: other.children.flatMap(walk)) ++ other.subqueries.flatMap(walk)
    }
    val sizes = walk(plan).collect {
      case b: BroadcastExchangeExec => b.metrics("dataSize").value
    }
    // AQE leaves unexecuted copies with zeroed metrics in the tree — the
    // materialized stage's value is the (unique) positive one
    sizes.filter(_ > 0).maxOption
  }

  test("broadcast HashedRelation bytes/key: budgeted estimate bounds measured within 2x") {
    val n = 1 << 19 // the rare-key limit's scale
    val keys = spark.range(n).select((col("id") * 2654435761L).as("sk"))
    val probe = spark.range(1 << 10).select((col("id") * 2654435761L).as("sk"))
    val joined = probe.join(broadcast(keys), "sk")
    // collect() (not count()) — count() plans a NEW QueryExecution and the
    // metrics would stay zeroed on this one
    joined.collect()
    val measured = broadcastDataSize(joined.queryExecution.executedPlan)
      .getOrElse(fail("no BroadcastExchange in the executed plan"))
    val bytesPerKey = measured.toDouble / n
    info(f"measured broadcast dataSize: $measured bytes = $bytesPerKey%.1f bytes/key at $n keys")
    val budgeted = graft.operators.Dedup.BroadcastBytesPerKey
    assert(budgeted >= bytesPerKey,
      f"budget ($budgeted B/key) must not undercount the measured relation ($bytesPerKey%.1f B/key)")
    assert(budgeted <= bytesPerKey * 2,
      f"budget ($budgeted B/key) must stay within 2x of measured ($bytesPerKey%.1f B/key) — not a blind guess")
  }
}
