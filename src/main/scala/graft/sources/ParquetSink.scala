package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sink side of the pipeline: write the processed corpus as parquet a
  * training dataloader (or the next pipeline stage) consumes in parallel.
  *
  * Two layouts:
  *   - [[writeSharded]]: exactly `shards` files, membership = hash(id) —
  *     deterministic (a row lands in the same shard no matter how the
  *     input was partitioned), which keeps re-runs byte-stable and lets a
  *     dataloader assign shards to workers reproducibly. Shard count sizes
  *     the files: pick `corpus bytes / target file size` (~256 MB-1 GB per
  *     file at 100 TB — thousands of shards, never one file per task).
  *   - [[writePartitioned]]: Hive-style `col=value` directories (e.g. per
  *     language). Downstream filters on the partition column prune whole
  *     directories at plan time (PartitionFilters in the scan) — the
  *     standard layout for per-slice consumption.
  */
object ParquetSink {

  def writeSharded(df: DataFrame, path: String, idCol: String, shards: Int): Unit = {
    require(shards >= 1, "writeSharded: shards must be >= 1")
    // hash-repartition, NOT round-robin repartition(n): round-robin shard
    // membership depends on the incoming partitioning and task order
    df.repartition(shards, col(idCol))
      .write.mode("overwrite").parquet(path)
  }

  def writePartitioned(df: DataFrame, path: String, byCol: String): Unit =
    df.write.mode("overwrite").partitionBy(byCol).parquet(path)
}
