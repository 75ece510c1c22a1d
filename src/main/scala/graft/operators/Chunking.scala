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
      .transform(d => graft.functions.ArrayOps.explodeDense(d, Seq(col(idCol), col(textCol)),
        sequence(lit(1),
          greatest(col("_len") - overlapChars, lit(1)), lit(stride)), "chunk_start"))
      .select(col(idCol),
        expr(s"(chunk_start - 1) div $stride").as("chunk_id"), // exact integer div
        col("chunk_start").cast("long").as("chunk_start"),
        col(textCol).substr(col("chunk_start"), lit(chunkChars)).as("chunk"))
      .withColumn("chunk_chars", length(col("chunk")).cast("long"))
  }

  /** T15b — TOKEN-budget chunking: the same stride walk over the
    * whitespace token sequence instead of characters — the form a
    * training pipeline actually needs, since context windows are bounded
    * in tokens. Tokens = nonempty whitespace splits (the repo's T3/T7
    * convention); chunk text is the window's tokens re-joined with single
    * spaces, so intra-document runs of whitespace normalize (documented —
    * the chunk is a token window, not a substring). Same coverage
    * guarantees as [[chunkByChars]]: every token appears, no chunk is
    * contained in its predecessor, final chunk may be short. Same
    * engine-portable arithmetic: integer strides + 1-based array slicing.
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
                    chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > 0, "chunkByTokens: chunkTokens must be > 0")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      "chunkByTokens: overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlapTokens
    df.select(col(idCol),
        filter(split(trim(col(textCol)), "\\s+"), w => length(w) > 0).as("_w"))
      .select(col(idCol), col("_w"), size(col("_w")).as("_n"))
      .filter(col("_n") > 0)
      .transform(d => graft.functions.ArrayOps.explodeDense(d, Seq(col(idCol), col("_w"), col("_n")),
        sequence(lit(1),
          greatest(col("_n") - overlapTokens, lit(1)), lit(stride)), "tok_start"))
      .select(col(idCol),
        expr(s"(tok_start - 1) div $stride").as("chunk_id"),
        col("tok_start").cast("long").as("tok_start"),
        least(col("_n") - col("tok_start") + 1, lit(chunkTokens)).cast("long").as("n_tokens"),
        concat_ws(" ", slice(col("_w"), col("tok_start"), lit(chunkTokens))).as("chunk"))
  }
}
