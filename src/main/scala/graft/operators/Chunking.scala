package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** T15 — document chunking: split long documents into fixed-size
  * overlapping windows, the step between a raw corpus and a context-
  * length-bounded training (or retrieval) set.
  *
  * Chunk starts walk the text at `chunkChars − overlapChars` strides;
  * the walk stops once a start passes len − overlap, so no emitted chunk
  * is wholly contained in its predecessor, and every character of the
  * document is covered (the final chunk may be shorter than chunkChars).
  * A document shorter than one chunk yields itself as chunk 0; empty and
  * NULL texts yield no rows.
  *
  * Engine-portable by construction: starts come from integer stride
  * arithmetic (`sequence`), content from 1-based `substring` — both
  * bit-identical in any SQL engine, so chunk boundaries never drift
  * between the pipeline and an external re-implementation. Narrow — the
  * explode is the output fan-out itself (Σ len/stride rows), there is no
  * shuffle and the full text never crosses an exchange.
  */
object Chunking {

  def chunkByChars(df: DataFrame, idCol: String, textCol: String,
                   chunkChars: Int, overlapChars: Int = 0): DataFrame = {
    require(chunkChars > 0, "chunkByChars: chunkChars must be > 0")
    require(overlapChars >= 0 && overlapChars < chunkChars,
      "chunkByChars: overlap must be in [0, chunkChars)")
    val stride = chunkChars - overlapChars
    df.select(col(idCol), col(textCol), length(col(textCol)).as("_len"))
      .filter(col("_len") > 0)
      .select(col(idCol),
        explode(sequence(lit(1),
          greatest(col("_len") - overlapChars, lit(1)), lit(stride))).as("chunk_start"),
        col(textCol))
      .select(col(idCol),
        expr(s"(chunk_start - 1) div $stride").as("chunk_id"), // exact integer div
        col("chunk_start").cast("long").as("chunk_start"),
        col(textCol).substr(col("chunk_start"), lit(chunkChars)).as("chunk"))
      .withColumn("chunk_chars", length(col("chunk")).cast("long"))
  }
}
