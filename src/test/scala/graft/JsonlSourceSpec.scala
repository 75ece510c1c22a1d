package graft

import graft.sources.JsonlSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL source/sink: round-trip fidelity, corrupt-line quarantine,
  * schema drift tolerance, deterministic sharding.
  */
class JsonlSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_jsonl_$tag").toString

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))

  test("round-trip preserves newlines, quotes, unicode, and nulls exactly") {
    val rows = Seq(
      (1L, "plain"),
      (2L, "line1\nline2\r\n\ttabbed"),
      (3L, "he said \"quote\" and \\backslash\\"),
      (4L, "unicode: naïve café 日本語 🙂"),
      (5L, null.asInstanceOf[String]))
    val dir = tmp("rt")
    JsonlSource.writeSharded(rows.toDF("id", "text"), dir, "id", 2)
    val back = JsonlSource.readWithSchema(spark, dir, schema)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(back.toSeq == rows.sortBy(_._1), "JSON escaping must be lossless")
  }

  test("corrupt lines quarantine; well-formed rows pass through") {
    val dir = tmp("bad")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "part-0.jsonl"),
      """{"id": 1, "text": "good"}
        |{not json at all
        |{"id": 3, "text": "also good"}
        |""".stripMargin)
    val withCorrupt = schema.add(StructField(JsonlSource.CorruptCol, StringType))
    // cache: Spark refuses corrupt-column-only projections on raw scans
    val df = JsonlSource.readWithSchema(spark, dir, withCorrupt).cache()
    val bad = JsonlSource.quarantine(df).select(JsonlSource.CorruptCol).as[String].collect()
    assert(bad.toSeq == Seq("{not json at all"), "raw malformed line preserved for triage")
    val good = JsonlSource.wellFormed(df).select("id").as[Long].collect().sorted
    assert(good.toSeq == Seq(1L, 3L))
  }

  test("schema drift: missing fields null, extra fields ignored") {
    val dir = tmp("drift")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir, "part-0.jsonl"),
      """{"id": 1}
        |{"id": 2, "text": "t", "extra_field": 99}
        |""".stripMargin)
    val out = JsonlSource.readWithSchema(spark, dir, schema)
      .orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).isNullAt(1), "absent field → null")
    assert(out(1).getString(1) == "t", "extra field silently ignored")
  }

  test("writeSharded: exactly N part files, membership stable across input partitionings") {
    val df = (1 to 100).map(i => (i.toLong, s"d$i")).toDF("id", "text")
    val d1 = tmp("sh1"); val d2 = tmp("sh2")
    JsonlSource.writeSharded(df, d1, "id", 4)
    JsonlSource.writeSharded(df.repartition(17), d2, "id", 4)
    def shardOf(dir: String): Map[Long, String] = {
      val back = JsonlSource.readWithSchema(spark, dir, schema)
        .select(col("id"), regexp_extract(input_file_name(), "part-(\\d+)", 1).as("shard"))
      back.as[(Long, String)].collect().toMap
    }
    val parts1 = new java.io.File(d1).listFiles().count(_.getName.startsWith("part-"))
    assert(parts1 == 4, s"exactly 4 shards, got $parts1")
    assert(shardOf(d1) == shardOf(d2), "hash sharding ignores incoming partitioning")
  }
}
