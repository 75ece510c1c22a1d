package graft

import graft.sources.ColumnarSource
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** S10/S11/S12 — format round trips and their physical properties. */
class ColumnarSourceSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("ORC round-trip is lossless; filters and projection push into the ORC scan (S10)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = "target/tmp/orc_documents_spec"
    ColumnarSource.writeOrcSharded(docs, dir, "doc_id", 4)
    val back = ColumnarSource.readOrc(spark, dir)
    assert(back.count() == docs.count())
    assert(back.agg(sum(col("doc_id"))).head.getLong(0) ==
      docs.agg(sum(col("doc_id"))).head.getLong(0))
    // the same pushdown machinery as parquet
    val p = back.filter(col("doc_id") > 100).select("doc_id", "lang")
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,100"),
      s"expected ORC filter pushdown in:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"expected ORC column pruning in:\n$p")
  }

  test("zstd parquet: codec suffix on every part file, relation unchanged (S12)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = "target/tmp/zstd_documents_spec"
    ColumnarSource.writeParquetCodec(docs, dir, "doc_id", 2, "zstd")
    val parts = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.endsWith(".parquet"))
    assert(parts.nonEmpty && parts.forall(_.endsWith(".zstd.parquet")),
      s"every part must be zstd-coded: ${parts.toSeq}")
    assert(spark.read.parquet(dir).count() == docs.count())
  }

  test("writeTextLines refuses embedded line breaks instead of silently splitting docs (S11)") {
    val clean = Seq("one line", "another").toDF("text")
    ColumnarSource.writeTextLines(clean, "text", "target/tmp/text_clean_spec", 1)
    assert(ColumnarSource.readTextLines(spark, "target/tmp/text_clean_spec")
      .orderBy("value").as[String].collect().toSeq == Seq("another", "one line"))
    val dirty = Seq("ok", "broken\ndoc").toDF("text")
    val e = intercept[Exception] {
      ColumnarSource.writeTextLines(dirty, "text", "target/tmp/text_dirty_spec", 1)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => String.valueOf(x.getMessage) +: messages(x.getCause))
    assert(messages(e).exists(_.contains("embedded line break")),
      s"expected the raise_error evidence in: ${messages(e)}")
  }
}
