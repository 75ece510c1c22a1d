package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Semi-structured (JSON-string) column extraction.
  *
  * The reference engine is flat columns only
  * (`/root/reference/src/dataframe.py` — every cell is a scalar), so this
  * is extension surface: real event/crawl feeds carry a JSON properties
  * blob per row, and lifting typed fields out of it is the first step of
  * nearly every downstream pipeline.
  */
object SemiStructured {

  /** Temp column used while lifting fields; `_graft_`-prefixed per the
    * repo-wide reserved-namespace convention (see `zorderExport`,
    * `madScores`).
    */
  private val ParsedCol = "_graft_json_parsed"

  /** X12 — lift fields out of a JSON-string column with an EXPLICIT schema.
    *
    * `from_json` against a DECLARED schema is the Spark-first answer:
    * a codegen'd per-row Jackson parse, no corpus-wide inference job.
    * (The `spark.read.json`-style schema inference is a full extra scan —
    * at 100 TB that scan alone is the pipeline; a declared schema is also
    * the only way the result's types are stable across batches.)
    *
    * Scale shape: narrow, zero exchanges. The parse fuses into
    * whole-stage codegen with whatever follows, and Catalyst's JSON
    * expression optimization prunes the parse schema to the fields
    * actually consumed downstream, so `schema` can declare the full
    * contract without paying for unused fields.
    *
    * Malformed handling is PERMISSIVE and mirrors the s6c JSONL-source
    * quarantine contract: a row whose string does not parse yields null
    * in every extracted field — never a failed job. The quarantine
    * predicate is `jsonCol IS NOT NULL AND <extracted> IS NULL` (keep the
    * raw string with `keepRaw = true` to route such rows to review).
    *
    * @param keepRaw keep the original JSON string column alongside the
    *                extracted fields (default drops it — the usual shape
    *                once extraction succeeds)
    */
  def extractJson(df: DataFrame, jsonCol: String, schema: StructType,
                  keepRaw: Boolean = false): DataFrame = {
    require(df.columns.contains(jsonCol), s"extractJson: no column '$jsonCol'")
    val clash = schema.fieldNames.filter(df.columns.toSet)
    require(clash.isEmpty,
      s"extractJson: field(s) ${clash.mkString(", ")} already exist in the input")
    require(!df.columns.contains(ParsedCol),
      s"extractJson: reserved column $ParsedCol present in input")
    val parsed = df.withColumn(ParsedCol, from_json(col(jsonCol), schema))
    // getField, not col("parsed.f"): a schema field whose NAME contains a
    // dot (legal in JSON) must resolve as the exact struct field, not be
    // re-parsed as a nested column path
    val lifted = schema.fieldNames.foldLeft(parsed) { (acc, f) =>
      acc.withColumn(f, col(ParsedCol).getField(f))
    }
    val out = lifted.drop(ParsedCol)
    if (keepRaw) out else out.drop(jsonCol)
  }
}
