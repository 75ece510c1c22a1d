package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source with the reference's scan semantics (S1–S4).
  *
  * Reference behavior (`/root/reference/src/csv_parser.py:49-79`):
  * header row = schema; configurable single-char delimiter; `"`-quoted
  * fields with `""` escapes (`csv_parser.py:19-46`); blank lines skipped;
  * short rows padded with nulls, long rows truncated to header width
  * (`csv_parser.py:71-75`); per-cell coercion `'' → null`, else int, else
  * float, else string (`csv_parser.py:6-16`).
  *
  * Spark mapping: the built-in CSV datasource already implements the
  * tokenizer (quote=`"`, escape by doubling) and PERMISSIVE mode pads short
  * rows with null / drops extra fields. Type coercion is per-COLUMN
  * (`inferSchema`) instead of per-cell — a mixed int/str column becomes
  * StringType; consumers bridge with `try_cast` (see `Agg.numericView`).
  *
  * Scale note: `inferSchema` is a second full pass over the data — at
  * 100 TB always prefer [[readWithSchema]] (single pass, schema pushed to
  * the reader, splittable scan parallelized across executors).
  */
object CsvSource {

  /** Inference path — compatibility with the reference's schema-less scan.
    * `escape = "` selects the reference's doubled-quote escaping
    * (`csv_parser.py:30-33`) — Spark's default escape is backslash, which
    * would leave `""` sequences un-unescaped (caught by CsvSourceSpec).
    */
  def read(spark: SparkSession, path: String, sep: String = ","): DataFrame =
    spark.read
      .option("header", "true")
      .option("sep", sep)
      .option("inferSchema", "true")
      .option("nullValue", "")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** Fast path: explicit schema, one pass, no inference job. */
  def readWithSchema(spark: SparkSession, path: String, schema: StructType,
                     sep: String = ","): DataFrame =
    spark.read
      .option("header", "true")
      .option("sep", sep)
      .option("nullValue", "")
      .option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .schema(schema)
      .csv(path)
}
