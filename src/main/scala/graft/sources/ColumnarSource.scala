package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Additional columnar/raw formats next to parquet ([[ParquetSink]]):
  *
  *   - ORC: Spark's second first-class columnar format (the ORC reader/
  *     writer ships in Spark core — no extra jar). Same predicate-pushdown
  *     and column-pruning machinery as parquet (`PushedFilters` in the
  *     scan, PlanSpec-pinned), footer min/max statistics for row-group
  *     skipping, and the same hash-sharded deterministic layout as
  *     [[ParquetSink.writeSharded]]. The engine reads whichever format an
  *     upstream producer chose — at 100 TB, format lock-in is a real cost
  *     and scan-pushdown parity is what makes the choice reversible.
  *   - zstd parquet: codec control for the hot/cold split (zstd ~2×
  *     smaller than snappy at similar scan speed for text-heavy corpora —
  *     the archival tier; snappy/lz4 stay the hot tier). Pure physical
  *     property: the relation round-trips bit-identically, only bytes on
  *     disk change.
  *   - raw text lines: `spark.read.text` — the rawest LLM-corpus
  *     ingestion shape (one document per line, .txt shards). Splittable,
  *     schema-free; the line IS the row.
  *
  * All three are oracle-gated as round trips (s10/s11/s12): write from the
  * canonical table, read back, and the relation must hash-match the
  * original — the format is not allowed to change the data.
  */
object ColumnarSource {

  def writeOrcSharded(df: DataFrame, path: String, idCol: String, shards: Int): Unit = {
    require(shards >= 1, "writeOrcSharded: shards must be >= 1")
    df.repartition(shards, col(idCol))
      .write.mode("overwrite").orc(path)
  }

  def readOrc(spark: SparkSession, path: String): DataFrame = spark.read.orc(path)

  /** Parquet with an explicit compression codec (zstd/snappy/lz4/gzip/
    * none) — same sharded layout as [[ParquetSink.writeSharded]].
    */
  def writeParquetCodec(df: DataFrame, path: String, idCol: String, shards: Int,
                        codec: String): Unit = {
    require(shards >= 1, "writeParquetCodec: shards must be >= 1")
    df.repartition(shards, col(idCol))
      .write.mode("overwrite").option("compression", codec).parquet(path)
  }

  /** One text line per row (`value` column). Newlines (or lone CRs — the
    * Hadoop line reader splits on both) inside a document break the line
    * model — [[writeTextLines]] REFUSES them with a per-row
    * `raise_error` guard rather than silently splitting a document into
    * several: codegen'd, zero cost on clean data, fails the job with the
    * offending evidence on dirty data.
    */
  def readTextLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  def writeTextLines(df: DataFrame, textCol: String, path: String, shards: Int): Unit = {
    import org.apache.spark.sql.functions.{concat, lit, raise_error, substring, when}
    require(shards >= 1, "writeTextLines: shards must be >= 1")
    val guarded = when(col(textCol).contains("\n") || col(textCol).contains("\r"),
      raise_error(concat(lit("writeTextLines: embedded line break in document: "),
        substring(col(textCol), 1, 80))))
      .otherwise(col(textCol))
    df.select(guarded.as("value"))
      .repartition(shards)
      .write.mode("overwrite").text(path)
  }
}
