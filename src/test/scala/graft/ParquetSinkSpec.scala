package graft

import graft.sources.ParquetSink
import org.apache.spark.sql.functions._

/** Sharded / partitioned parquet output. */
class ParquetSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("writeSharded: exact shard count, lossless round-trip, partitioning-invariant membership") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val path = "target/tmp/sink_sharded"
    ParquetSink.writeSharded(docs, path, "doc_id", 4)
    val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4, s"expected 4 shard files, got ${files.length}")
    val back = spark.read.parquet(path)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").as[Long].collect().sorted.toSeq ==
      docs.select("doc_id").as[Long].collect().sorted.toSeq)
    // membership must be a function of the id, not the input partitioning
    val fileOf = (p: String) => spark.read.parquet(p)
      .select(col("doc_id"), input_file_name().as("f"))
      .as[(Long, String)].collect().groupBy(_._1).view.mapValues(_.head._2.split("/").last).toMap
    val m1 = fileOf(path)
    ParquetSink.writeSharded(docs.repartition(13), path + "_b", "doc_id", 4)
    val m2 = fileOf(path + "_b")
    val sameGrouping = m1.groupBy(_._2).values.map(_.keySet).toSet ==
      m2.groupBy(_._2).values.map(_.keySet).toSet
    assert(sameGrouping, "shard membership must not depend on input partitioning")
  }

  test("appendSharded adds delta shards; compactSharded restores the shard count, rows unchanged") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val path = "target/tmp/sink_append_compact"
    val base = docs.filter(col("doc_id") % 3 =!= 0)
    val delta = docs.filter(col("doc_id") % 3 === 0)
    ParquetSink.writeSharded(base, path, "doc_id", 4)
    ParquetSink.appendSharded(delta, path, "doc_id", 4)
    def parquetFiles() =
      new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles() == 8, "base 4 + delta 4 shards")
    val wantIds = docs.select("doc_id").as[Long].collect().sorted.toSeq
    assert(spark.read.parquet(path).select("doc_id").as[Long].collect().sorted.toSeq
      == wantIds, "append must read as base ∪ delta")
    ParquetSink.compactSharded(spark, path, "doc_id", 4)
    assert(parquetFiles() == 4, "compaction restores the target shard count")
    assert(!new java.io.File(path + ".old").exists() &&
      !new java.io.File(path + ".compact_tmp").exists(), "swap dirs cleaned up")
    assert(spark.read.parquet(path).select("doc_id").as[Long].collect().sorted.toSeq
      == wantIds, "compaction must not change the reader-visible rows")
  }

  test("compactShardedWith applies the fold while rewriting (dedup survives the swap)") {
    val path = "target/tmp/sink_compact_with"
    val rows = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    ParquetSink.writeSharded(rows, path, "doc_id", 2)
    ParquetSink.appendSharded(rows, path, "doc_id", 2) // duplicate generation
    assert(spark.read.parquet(path).count() == 4)
    ParquetSink.compactShardedWith(spark, path, "doc_id", 2)(_.distinct())
    assert(spark.read.parquet(path).as[(Long, String)].collect().sorted.toSeq ==
      Seq((1L, "a"), (2L, "b")), "transform must apply to base ∪ deltas")
  }

  test("compaction swap is crash-recoverable: live-missing + .old-present self-heals") {
    val path = "target/tmp/sink_crash_recover"
    val rows = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    ParquetSink.writeSharded(rows, path, "doc_id", 2)
    // simulate a crash in the swap window: live renamed aside, replacement
    // never renamed in — exactly the state between the two renameTo calls
    val live = new java.io.File(path)
    val old = new java.io.File(path + ".old")
    assert(live.renameTo(old), "test setup: move live aside")
    assert(!live.exists() && old.exists())
    // a rerun must restore the snapshot and complete normally
    ParquetSink.compactSharded(spark, path, "doc_id", 2)
    assert(live.exists() && !old.exists(), "rerun must heal the swap window")
    assert(spark.read.parquet(path).select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L), "no rows lost across the recovery")
  }

  test("writePartitioned: hive layout; scans prune to the filtered partition") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val path = "target/tmp/sink_partitioned"
    ParquetSink.writePartitioned(docs, path, "lang")
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.forall(_.startsWith("lang=")) && dirs.nonEmpty)
    val one = spark.read.parquet(path).filter(col("lang") === "en")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"partition filter must prune at plan time:\n$plan")
    assert(one.count() == docs.filter(col("lang") === "en").count())
  }
}
