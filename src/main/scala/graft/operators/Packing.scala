package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing: assign documents to training batches so
  * each batch's token total stays near `budget` — the step between a
  * deduped corpus and a training dataloader.
  *
  * Contiguous packing per shard: documents are sharded by a hash of their
  * id (shards are the unit of parallelism — a GLOBAL running sum would be
  * one sequential pass on one executor), ordered deterministically within
  * the shard, and cut into bins wherever the running token total crosses a
  * budget boundary: `bin = exclusive_prefix_sum div budget` (integer
  * division on longs — exact at any cumulative total, unlike a double
  * `floor(x / b)` which loses integer precision past 2^53). Bins may
  * overflow by at most one document — the standard streaming-packing
  * bound; documents longer than the budget get a bin of their own.
  * REQUIRES unique ids: the in-shard order is `ORDER BY id` alone, so
  * duplicate ids would make the running sum (hence bin membership)
  * partition-order-dependent. With unique ids the assignment is fully
  * deterministic for a fixed (shards, budget): membership depends only on
  * ids and token counts, never on partitioning or run order.
  */
object Packing {

  /** `shardExpr` overrides the default murmur3 id-hash shard — e.g. an
    * md5-derived or modulo shard when cross-engine reproducibility of the
    * assignment matters (murmur3 is Spark-specific).
    */
  def packByTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
                        budget: Long, shards: Int = 32,
                        shardExpr: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(budget > 0 && shards > 0, "packByTokenBudget: budget and shards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shardExpr.getOrElse(pmod(hash(col(idCol)), lit(shards))))
      // both terms cast: a fractional token column would otherwise mix a
      // truncated running sum with an untruncated current-row value
      .withColumn("_cum",
        sum(col(tokenCol).cast("long")).over(w) - col(tokenCol).cast("long"))
      // `div` = integer division on longs; _cum >= 0 so it equals floor
      .withColumn("bin", expr(s"_cum div ${budget}L"))
      .drop("_cum")
  }
}
