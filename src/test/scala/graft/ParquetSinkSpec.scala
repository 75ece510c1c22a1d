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

  test("writeShuffled: seed-keyed permutation — membership by key mod, in-shard sort, byte-stable reruns (S8)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "source")
    val path = "target/tmp/sink_shuffled"
    ParquetSink.writeShuffled(docs, path, "doc_id", seed = "e1", shards = 4)
    val back = spark.read.parquet(path)
      .select(col("doc_id"), col("_shuffle_key"), col("shard").cast("int").as("shard"),
        input_file_name().as("f"))
      .as[(Long, Long, Int, String)].collect()
    // lossless, membership = key mod shards, key = the documented md5 form
    assert(back.length == docs.count())
    back.foreach { case (id, key, shard, _) =>
      assert(shard == (key % 4).toInt, s"doc $id: shard $shard != key%4")
    }
    val expectKey = docs.select(col("doc_id"),
        conv(substring(md5(concat_ws(":", lit("e1"), col("doc_id"))), 1, 15), 16, 10)
          .cast("long")).as[(Long, Long)].collect().toMap
    back.foreach { case (id, key, _, _) => assert(key == expectKey(id)) }
    // each shard file is internally sorted by (key, id) — the dataloader's
    // stream order IS the shuffled order
    back.groupBy(_._4).foreach { case (_, rows) =>
      val keys = rows.sortBy(r => (r._2, r._1)).map(_._2).toSeq
      assert(rows.map(_._2).toSeq == keys, "shard file must be key-sorted")
    }
    // byte-stable: a rerun with the same seed reproduces the same files
    val sums1 = new java.io.File(path).listFiles().filter(_.getName.startsWith("shard="))
      .map(d => d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => java.util.Arrays.hashCode(java.nio.file.Files.readAllBytes(f.toPath))).toSeq)
      .toMap
    ParquetSink.writeShuffled(docs, path, "doc_id", seed = "e1", shards = 4)
    val sums2 = new java.io.File(path).listFiles().filter(_.getName.startsWith("shard="))
      .map(d => d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => java.util.Arrays.hashCode(java.nio.file.Files.readAllBytes(f.toPath))).toSeq)
      .toMap
    assert(sums1 == sums2, "same-seed rerun must be byte-stable")
    // a new seed is a fresh permutation: some doc changes shard
    ParquetSink.writeShuffled(docs, path + "_e2", "doc_id", seed = "e2", shards = 4)
    val m1 = back.map(r => r._1 -> r._3).toMap
    val m2 = spark.read.parquet(path + "_e2")
      .select(col("doc_id"), col("shard").cast("int"))
      .as[(Long, Int)].collect().toMap
    assert(m1.exists { case (id, s) => m2(id) != s }, "new seed must reshuffle")
  }

  test("zorderExport: tight per-file boxes in BOTH dims — a y-band touches few files where an x-sort touches all (S9)") {
    // 64×64 grid, 16 files of 256 rows each. Under z-order every file is
    // one 16×16 quadrant; under an x-only sort every file spans all of y.
    val grid = spark.range(64 * 64)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val zPath = "target/tmp/sink_zorder"
    val xPath = "target/tmp/sink_xsort"
    ParquetSink.zorderExport(grid, zPath, "x", "y", shards = 16, bits = 6)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xPath)
    // round-trip is lossless
    assert(spark.read.parquet(zPath).count() == 4096)
    assert(spark.read.parquet(zPath).agg(sum(col("x") * 64 + col("y"))).head.getLong(0) ==
      grid.agg(sum(col("x") * 64 + col("y"))).head.getLong(0))
    // stats-based pruning for the band y ∈ [10, 13] (all x)
    def touched(path: String): Int =
      ParquetSink.fileStats(spark, path, Seq("x", "y"))
        .where(col("min_y") <= 13 && col("max_y") >= 10)
        .count().toInt
    val zTouched = touched(zPath)
    val xTouched = touched(xPath)
    assert(xTouched == 16, s"x-sorted files all span y: $xTouched")
    // ideal is 4 (one quadrant row); repartitionByRange samples its
    // boundaries, so one file may straddle a quadrant row and intersect the
    // band — allow that single straddler, still 3× better than the x-sort
    assert(zTouched <= 5, s"z-order should prune the y-band to ~one quadrant row: $zTouched")
  }

  test("zorderExport: empty input and all-null columns degrade to a valid write (no NPE)") {
    import spark.implicits._
    val empty = spark.range(0).select(col("id").as("x"), col("id").as("y"))
    ParquetSink.zorderExport(empty, "target/tmp/sink_zorder_empty", "x", "y", shards = 2, bits = 4)
    val backE = spark.read.parquet("target/tmp/sink_zorder_empty")
    assert(backE.count() == 0 && backE.columns.toSeq == Seq("x", "y"))
    // all-null coordinate column: min/max are null — everything grids to 0
    val nulls = Seq((1L, Option.empty[Long]), (2L, None), (3L, None))
      .toDF("x", "y")
    ParquetSink.zorderExport(nulls, "target/tmp/sink_zorder_nulls", "x", "y", shards = 2, bits = 4)
    assert(spark.read.parquet("target/tmp/sink_zorder_nulls").count() == 3)
    // user column named like the internal key must be rejected, not dropped
    val clash = spark.range(3).withColumn("_graft_zorder_key", lit(1L))
    intercept[IllegalArgumentException] {
      ParquetSink.zorderExport(clash, "target/tmp/sink_zorder_clash", "id", "id", shards = 1)
    }
    // null coordinates grid to cell 0 (least/greatest skip nulls — the
    // clamp must not bounce a null to the max cell): the null row files
    // with the (0,0) corner, not with the far corner
    val mixed = Seq((1L, Option(0L), Option(0L)), (2L, None, None),
      (3L, Option(63L), Option(63L)), (4L, Option(62L), Option(63L)))
      .toDF("id", "x", "y")
    val mPath = "target/tmp/sink_zorder_nullcell"
    ParquetSink.zorderExport(mixed, mPath, "x", "y", shards = 2, bits = 6)
    val byFile = spark.read.parquet(mPath)
      .select(input_file_name().as("f"), col("id"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val nullFile = byFile.find(_._2.contains(2L)).get._2
    assert(nullFile.contains(1L) && !nullFile.contains(3L),
      s"null row must cluster at cell 0 with (0,0), away from the far corner: $byFile")
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
