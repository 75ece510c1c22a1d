package graft

import org.apache.spark.sql.functions._

/** The hot-head fixture mode (r14 #4): the exempt head must keep its
  * absolute count growing with the corpus while every other token stays
  * copy-unique — the property that makes the 1000× heavy-hitter gates
  * non-vacuous.
  */
class ScaleGenSpec extends SparkTestBase {
  import spark.implicits._

  test("generateDocumentsHot: head tokens scale with copies, tail tokens stay copy-unique") {
    val dir = "target/tmp/scalegen_hot"
    Seq((0L, "the cat sat", "en", "w"), (1L, "the dog ran", "en", "w"),
      (2L, "the the bird", "en", "w"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/src/documents.parquet")
    ScaleGen.generateDocumentsHot(spark, s"$dir/src", s"$dir/out",
      copies = 3, hotHead = 1)
    val out = spark.read.parquet(s"$dir/out/documents.parquet")
    assert(out.count() == 9, "3 copies of 3 docs")
    val counts = out.select(explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    // "the" is the top-1 token (4 occurrences at 1x) — exempt, so 3x4
    assert(counts("the") == 12L, s"head token must scale with copies: $counts")
    // every other token is suffixed per copy: base form stays at its 1x
    // count, each suffixed variant carries exactly the 1x count
    assert(counts("cat") == 1L && counts("catx1") == 1L && counts("catx2") == 1L)
    assert(!counts.contains("thex1"), "head tokens must never be suffixed")
    // doc ids are disjoint across copies; n_chars matches the emitted text
    assert(out.select("doc_id").distinct().count() == 9)
    assert(out.filter(length(col("text")) =!= col("n_chars")).count() == 0)
  }
}
