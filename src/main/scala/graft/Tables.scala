package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided testdata tables (TESTDATA.md).
  *
  * All loads are plain parquet scans — Catalyst pushes filters and column
  * pruning into the scan, so callers should NOT pre-materialize. `events`
  * needs the nanos conf (FIXTURES.md §B note), which `Session.tune` sets.
  */
object Tables {

  /** A parquet file is splittable only at row-group granularity: a
    * single-row-group file arrives as ONE partition, serializing every
    * per-row pipeline upstream of the first shuffle onto one core (measured
    * 8-30× slowdowns on the text/dedup operators — the testdata writes one
    * row group per table). When the scan yields fewer partitions than the
    * session's parallelism, redistribute once right after the scan; a real
    * 100 TB table has thousands of row groups and is left untouched.
    * Filters/pruning still push into the scan below the exchange
    * (PushPredicateThroughNonJoin handles Repartition).
    */
  private def parallelized(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    parallelized(spark, spark.read.parquet(s"$dir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events.parquet` stores ts as parquet TIMESTAMP(NANOS); with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it reads as bigint nanos.
    * Exposes an extra `ts_us` (microseconds) column matching what
    * micro-precision engines (e.g. the DuckDB oracle) see after truncation.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    Session.tune(s)
    table(s, d, "events").withColumn("ts_us", expr("ts div 1000"))
  }
}
