package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` payload
  * columns with typed metadata, processed in partition-sized batches.
  *
  * The Spark-side contract is real and tested — schema, partitioning,
  * batch-iterator shape, deterministic results. IMAGE payloads decode for
  * REAL via the JDK's `javax.imageio` (PNG/JPEG/GIF/BMP — no external
  * media library needed): [[decodeBatches]] sniffs the payload's magic
  * bytes and reads true dimensions when it is a decodable image;
  * [[decodeImageBatches]] additionally exposes pixel data (verified
  * against a closed-form oracle in `m2b_image_decode`). Only AUDIO/VIDEO
  * decode remains a stub (`stubDecode` — deterministic fake metadata from
  * a payload hash; the container has no codec libraries), and a
  * non-image payload tagged "image" falls back to the same stub.
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

  /** Cheap magic-byte sniff: does the payload start like a format
    * `javax.imageio` ships a reader for (PNG / JPEG / GIF / BMP)? Runs
    * before any reader lookup so the overwhelmingly-common non-image
    * payload costs a few byte compares, not an ImageIO registry probe.
    */
  private[graft] def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 8 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      (b(0) == 'B' && b(1) == 'M'))

  /** REAL image decode via the JDK: None when the payload is not a
    * decodable image (wrong magic, truncated, unsupported format). TOTAL:
    * a payload that passes the magic sniff but has a garbage body (e.g.
    * corpus text starting with "BM" or "GIF8" — "BM25..." is realistic
    * text) makes the JDK reader THROW rather than return null; that must
    * fall through to the hash stub, not fail the whole decode job.
    */
  private[graft] def tryDecodeImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (!looksLikeImage(payload)) None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case scala.util.control.NonFatal(_) => None }

  /** ==== STUB (audio/video only) ==== deterministic fake decoder for the
    * formats the JDK cannot parse (no codec libraries in this container):
    * metadata is derived from hex digits of the payload's sha256 — purely
    * a function of the bytes (reproducible) AND expressible in any SQL
    * engine with a sha256, which is what makes the decode oracle-checkable
    * (DuckDB: `('0x' || substr(sha256(text), f, l))::BIGINT`). Image
    * payloads only reach this when they are not actually decodable
    * (see [[decodeBatches]]).
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
    *
    * Image-typed payloads that really ARE images (magic-byte sniff +
    * `ImageIO.read`) decode for real: true width/height, n_frames = 1,
    * duration 0. Everything else — audio/video, and image-typed payloads
    * that don't parse (the testdata's utf-8 fixtures) — takes the
    * deterministic hash stub, so the operator is total either way.
    */
  def decodeBatches(spark: SparkSession, withPayload: DataFrame,
                    idCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    withPayload
      .select(col(idCol).cast("long"), col("payload"), col("media_type"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        // per-partition decoder init (ImageIO uses its static registry;
        // codec contexts for audio/video would init here)
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        rows.map { case (id, payload, mt) =>
          digest.reset()
          val sha = digest.digest(payload).map("%02x".format(_)).mkString
          val meta = (if (mt == "image") tryDecodeImage(payload) else None) match {
            case Some(img) => MediaMeta(img.getWidth, img.getHeight, 1, 0L)
            case None => stubDecode(sha, mt)
          }
          MediaRow(id, mt, payload.length.toLong, sha, meta)
        }
      }
  }

  /** Deterministic PNG fixture generator — REAL `ImageIO.write` encode in
    * the same mapPartitions batch shape as the decoders: for id the image
    * is (1 + id % 31) × (1 + id % 17) gray pixels with value
    * (x·7 + y·13 + id) mod 256. Every property a decoder can read —
    * dimensions and pixel content — is closed-form in the id, which is
    * what makes the round-trip oracle-checkable in plain SQL (see the
    * m2b_image_decode oracle). PNG is lossless, so the decode must return
    * the exact pixels the formula wrote.
    */
  def encodePngBatches(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (1 + id % 31).toInt
          val h = (1 + id % 17).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val g = ((x * 7 + y * 13 + id) % 256).toInt
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (id, bos.toByteArray)
        }
      }
      .toDF(idCol, "payload")
      .withColumn("media_type", lit("image"))
  }

  case class ImagePixels(doc_id: Long, width: Int, height: Int, px_sum: Long)

  /** REAL pixel-level image decode: dimensions plus the sum of the
    * luminance (low-byte) channel over every pixel — the cheapest
    * whole-raster statistic that still proves the decoder touched every
    * pixel value, not just the header. Throws on an undecodable payload
    * (this path is for known-image columns; use [[decodeBatches]] for the
    * total/fallback form).
    */
  def decodeImageBatches(spark: SparkSession, withPayload: DataFrame,
                         idCol: String): Dataset[ImagePixels] = {
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          require(img != null, s"decodeImageBatches: payload for id=$id is not a decodable image")
          var s = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              s += (img.getRGB(x, y) & 0xFF).toLong
              x += 1
            }
            y += 1
          }
          ImagePixels(id, img.getWidth, img.getHeight, s)
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
