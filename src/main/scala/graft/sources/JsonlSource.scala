package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** JSON-Lines source/sink — the interchange format LLM data pipelines
  * actually speak (one JSON object per line; raw web-scrape dumps, corpus
  * releases, and annotation exports all ship as .jsonl/.jsonl.gz).
  *
  * Spark's built-in json datasource IS a JSONL reader (line-delimited is
  * its default mode), so this wrapper only pins the pipeline-correct
  * settings:
  *   - [[readWithSchema]] is the 100 TB path: explicit schema = single
  *     pass, splittable scan, no inference job over the full corpus;
  *     fields absent from a line are null, extra fields are ignored —
  *     the schema-drift tolerance heterogeneous dumps need.
  *   - PERMISSIVE mode with a named corrupt-record column: a malformed
  *     line becomes one quarantinable row (raw line preserved in
  *     `_corrupt`), never a failed 100 TB job. [[quarantine]] /
  *     [[wellFormed]] split the two populations.
  *   - [[read]] (inference) exists for exploration; it costs a second
  *     full pass, same trade as CSV inference ([[CsvSource]]).
  *   - the sink shards by id-hash like [[ParquetSink.writeSharded]] —
  *     deterministic shard membership keeps re-runs byte-stable modulo
  *     in-file ordering.
  *
  * Round-trip fidelity (JSONL ↔ the engine's tables) is oracle-checked:
  * the `s6_jsonl_roundtrip` query writes the documents table to JSONL,
  * reads it back with an explicit schema, and must hash-match the
  * original parquet — newlines, quotes, and unicode in `text` survive
  * JSON escaping exactly.
  */
object JsonlSource {

  val CorruptCol = "_corrupt"

  /** Fast path: explicit schema, one pass. Add `CorruptCol` to the schema
    * (StringType) to capture malformed lines instead of nulling them.
    */
  def readWithSchema(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(schema)
      .json(path)

  /** Inference path (second full pass — exploration only at scale). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Rows that failed to parse (raw line in `CorruptCol`) — present only
    * when the read schema included `CorruptCol`. Note Spark refuses a
    * query whose referenced columns are ONLY the corrupt column of a raw
    * file scan (SPARK-38523 guard) — `cache()` the parsed frame before
    * projecting the quarantine down to just the raw lines.
    */
  def quarantine(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNotNull)

  /** Rows that parsed cleanly, corrupt-record column dropped. */
  def wellFormed(df: DataFrame): DataFrame =
    if (df.columns.contains(CorruptCol))
      df.filter(col(CorruptCol).isNull).drop(CorruptCol)
    else df

  /** Hash-sharded JSONL write: exactly `shards` part files, shard
    * membership a pure function of the id (stable across re-runs and
    * input partitionings). `compression` e.g. "gzip" for .jsonl.gz
    * releases ("none" while iterating — gzip parts are not splittable,
    * so compressed shards should be sized to ONE dataloader unit each).
    */
  def writeSharded(df: DataFrame, path: String, idCol: String, shards: Int,
                   compression: String = "none"): Unit = {
    require(shards >= 1, "writeSharded: shards must be >= 1")
    df.repartition(shards, col(idCol))
      .write.mode("overwrite")
      .option("compression", compression)
      .json(path)
  }
}
