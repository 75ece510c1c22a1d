package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payload
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side contract is real and tested — schema, partitioning,
  * batch-iterator shape, deterministic results. The media DECODERS are
  * stubs (this container has no image/audio libraries): `stubDecode`
  * derives deterministic fake dimensions/duration from a hash of the
  * payload. Swapping in a real decoder changes only the marked function.
  *
  * Scale notes: payloads never shuffle — decode/feature-extract are narrow
  * `mapPartitions` (one decoder init per partition, not per row, which is
  * the entire point of the batch shape). Keep binary columns OUT of shuffle
  * keys; aggregate on extracted metadata instead.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, n_frames: Int, duration_ms: Long)
  case class MediaRow(doc_id: Long, media_type: String, byte_len: Long,
                      sha256: String, meta: MediaMeta)

  /** Attach a binary payload column. Testdata has no real media bytes, so
    * the payload is the utf-8 encoding of `text` — the binary-column
    * plumbing (types, hashing, length, batch decode) is identical either
    * way.
    */
  def attachPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      encode(col(textCol), "UTF-8").as("payload"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("media_type"))

  /** ==== STUB ==== deterministic fake decoder: real implementations would
    * parse the container format here (e.g. JPEG headers / WAV chunks).
    * Metadata is derived from hex digits of the payload's sha256 — purely
    * a function of the bytes (reproducible) AND expressible in any SQL
    * engine with a sha256, which is what makes the decode oracle-checkable
    * (DuckDB: `('0x' || substr(sha256(text), f, l))::BIGINT`).
    */
  def stubDecode(shaHex: String, mediaType: String): MediaMeta = {
    def hx(from: Int, len: Int): Long =
      java.lang.Long.parseLong(shaHex.substring(from, from + len), 16)
    MediaMeta(
      width = (1 + hx(0, 6) % 4096).toInt,
      height = (1 + hx(6, 6) % 2160).toInt,
      n_frames = if (mediaType == "image") 1 else (1 + hx(12, 6) % 14400).toInt,
      duration_ms = if (mediaType == "image") 0L else hx(18, 12) % 600000L)
  }

  /** Batch decode via mapPartitions: the decoder is initialized once per
    * partition and fed rows as an iterator (the Scala analogue of a
    * `mapInPandas` batch UDF). Output is a typed Dataset with full schema.
    */
  def decodeBatches(spark: SparkSession, withPayload: DataFrame,
                    idCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    withPayload
      .select(col(idCol).cast("long"), col("payload"), col("media_type"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        // per-partition decoder init would go here (codec contexts etc.)
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        rows.map { case (id, payload, mt) =>
          digest.reset()
          val sha = digest.digest(payload).map("%02x".format(_)).mkString
          MediaRow(id, mt, payload.length.toLong, sha, stubDecode(sha, mt))
        }
      }
  }

  /** Frame sampling for video-typed rows: k deterministic frame indices
    * derived from the payload hash (stub for real frame extraction).
    */
  def sampleFrameIndices(df: DataFrame, k: Int): DataFrame =
    df.withColumn("frame_indices",
      transform(sequence(lit(0), lit(k - 1)),
        i => pmod(xxhash64(col("payload"), i), greatest(col("meta.n_frames").cast("long"), lit(1L)))))

  /** ==== STUB ==== aspect-preserving fit-to-box resize plan over decoded
    * media: computes target dimensions with PURE INTEGER arithmetic (no
    * float scale factor — `w*boxH >= h*boxW` picks the binding axis, then
    * one integer multiply/divide) and derives the "resized" payload's
    * digest deterministically from the source digest and the box. A real
    * implementation would decode + rescale pixels inside the decode
    * `mapPartitions` stage; the dimension planning, schema, and lineage
    * digest here are the engine-side contract either way. Narrow, no
    * shuffle. Rows already inside the box pass through unscaled.
    */
  def resizeToBox(decoded: DataFrame, boxW: Int, boxH: Int): DataFrame = {
    require(boxW >= 1 && boxH >= 1, "resizeToBox: box must be positive")
    val w = col("meta.width").cast("long")
    val h = col("meta.height").cast("long")
    val fits = w <= boxW && h <= boxH
    val wide = w * boxH >= h * boxW // binding axis: width
    decoded.select(
      col("doc_id"), col("media_type"), w.as("width"), h.as("height"),
      when(fits, w).when(wide, lit(boxW.toLong))
        .otherwise(expr(s"(meta.width * ${boxH}L) div meta.height")).as("new_width"),
      when(fits, h).when(wide, expr(s"(meta.height * ${boxW}L) div meta.width"))
        .otherwise(lit(boxH.toLong)).as("new_height"),
      when(fits, col("sha256"))
        .otherwise(sha2(concat(col("sha256"), lit(s"->${boxW}x$boxH")), 256))
        .as("resized_sha"))
  }

  /** Uniform temporal frame sampling — the standard video-pipeline recipe:
    * k evenly-spaced indices `floor(i·n_frames/k)`, deduplicated when the
    * clip has fewer than k frames. One output row per (doc, frame). Pure
    * integer arithmetic (no hash, no float), so the selection is identical
    * in any engine. Narrow op: expands rows ≤ k× with no shuffle; real
    * frame extraction plugs into the downstream `mapPartitions` decode.
    */
  def uniformFrameSample(decoded: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 1, "uniformFrameSample: k must be >= 1")
    decoded.select(col(idCol), col("meta.n_frames").cast("long").as("_nf"))
      .select(col(idCol), explode(array_distinct(
        expr(s"transform(sequence(0, ${k - 1}), i -> (i * _nf) div $k)"))).as("frame_idx"))
  }
}
