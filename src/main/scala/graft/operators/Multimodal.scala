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
  * against a closed-form oracle in `m2b_image_decode`). AUDIO payloads
  * decode for REAL via the JDK's `javax.sound.sampled` (WAV/AIFF headers
  * + PCM bodies): [[decodeBatches]] reads channels / sample rate / frame
  * count / true duration; [[decodeAudioBatches]] additionally sums every
  * PCM sample (oracle rows `m2c_audio_decode` WAV / `m2d_aiff_decode`
  * AIFF). VIDEO decodes for REAL in two containers: an UNCOMPRESSED AVI
  * — plain RIFF bookkeeping, parsed by a hand-written walker with zero
  * codec libraries ([[tryDecodeAvi]] headers, [[decodeVideoBatches]]
  * frame bytes; oracle row `m2e_video_decode`), MJPEG-AVI's per-frame
  * JPEGs through ImageIO (`m2f_mjpeg_decode`) — and an ANIMATED GIF via
  * ImageIO's own multi-frame reader ([[tryDecodeGif]] headers + delay
  * metadata, frame rasters in [[decodeVideoBatches]]; oracle row
  * `m2h_gif_decode`). Only CODEC-compressed video in other containers
  * remains out of reach (`stubDecode` — deterministic fake metadata from
  * a payload hash; no codec libraries in this container), and a
  * non-media payload tagged image/audio/video falls back to the same
  * stub.
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

  /** Cheap RIFF/WAVE magic sniff — the audio analogue of
    * [[looksLikeImage]]: does the payload start like a container
    * `javax.sound.sampled` ships a reader for? (WAV: "RIFF" at 0,
    * "WAVE" at 8. The JDK also reads AIFF/AU; WAV is the fixture and
    * ingest-realistic format here.)
    */
  private[graft] def looksLikeWav(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** AIFF sniff ("FORM" at 0, "AIFF"/"AIFC" at 8) — the second container
    * `javax.sound.sampled` ships a reader for, proving the sniff→decode
    * dispatch generalizes past one format (the JDK also reads AU; AIFF is
    * the fixture here because its PCM body is big-endian — the opposite
    * byte order of WAV, so a passing round-trip exercises both layouts).
    */
  private[graft] def looksLikeAiff(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
      b(8) == 'A' && b(9) == 'I' && b(10) == 'F' &&
      (b(11) == 'F' || b(11) == 'C')

  private[graft] def looksLikeAudio(b: Array[Byte]): Boolean =
    looksLikeWav(b) || looksLikeAiff(b)

  /** REAL audio header decode via the JDK (`javax.sound.sampled` — zero
    * external codec libraries, the ImageIO move applied to audio): sample
    * rate, channel count, and frame length from the WAV or AIFF header
    * (sniffed by [[looksLikeAudio]]; `AudioSystem` dispatches by content),
    * true duration_ms = frames·1000 / rate (floor, exact long arithmetic —
    * fixture rates are integral). None when the payload is not decodable
    * audio (wrong magic, garbage body, unknown frame count) — total, like
    * [[tryDecodeImage]].
    *
    * Field mapping into the fixed [[MediaMeta]] shape: audio has no
    * spatial dimensions, so `width` carries CHANNELS and `height` carries
    * SAMPLE_RATE (documented contract, asserted by the m2c oracle);
    * `n_frames` = PCM sample frames.
    */
  private[graft] def tryDecodeWav(payload: Array[Byte]): Option[MediaMeta] =
    if (!looksLikeAudio(payload)) None
    else
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          val frames = in.getFrameLength
          if (frames < 0 || fmt.getSampleRate <= 0 || fmt.getChannels < 1) None
          else {
            val rate = math.max(1L, math.round(fmt.getSampleRate.toDouble))
            Some(MediaMeta(
              width = fmt.getChannels,
              height = math.min(rate, Int.MaxValue).toInt,
              n_frames = math.min(frames, Int.MaxValue).toInt,
              duration_ms = frames * 1000L / rate))
          }
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }

  /** ==== STUB (codec-compressed video + non-decodable payloads only) ====
    * deterministic fake decoder for the formats the JDK cannot parse (no
    * codec libraries in this container — uncompressed AVI decodes for real
    * via [[tryDecodeAvi]]): metadata is derived from hex digits of the payload's
    * sha256 — purely a function of the bytes (reproducible) AND expressible
    * in any SQL engine with a sha256, which is what makes the decode
    * oracle-checkable (DuckDB: `('0x' || substr(sha256(text), f, l))::
    * BIGINT`). Image/audio payloads only reach this when they are not
    * actually decodable (see [[decodeBatches]]).
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
    * duration 0. Audio-typed payloads that really are WAV (RIFF sniff +
    * `javax.sound.sampled`) decode for real: channels/sample_rate (in the
    * width/height slots — see [[tryDecodeWav]]), true frame count and
    * duration_ms. Everything else — video, and image/audio payloads that
    * don't parse (the testdata's utf-8 fixtures) — takes the deterministic
    * hash stub, so the operator is total either way.
    */
  def decodeBatches(spark: SparkSession, withPayload: DataFrame,
                    idCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    withPayload
      .select(col(idCol).cast("long"), col("payload"), col("media_type"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        // per-partition decoder init (ImageIO / AudioSystem use their
        // static registries; codec contexts for video would init here)
        val digest = java.security.MessageDigest.getInstance("SHA-256")
        rows.map { case (id, payload, mt) =>
          digest.reset()
          val sha = digest.digest(payload).map("%02x".format(_)).mkString
          val real = mt match {
            case "image" => tryDecodeImage(payload).map(img =>
              MediaMeta(img.getWidth, img.getHeight, 1, 0L))
            case "audio" => tryDecodeWav(payload)
            case "video" => tryDecodeAvi(payload).orElse(tryDecodeGif(payload))
            case _ => None
          }
          MediaRow(id, mt, payload.length.toLong, sha, real.getOrElse(stubDecode(sha, mt)))
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

  /** Deterministic WAV fixture generator — REAL `AudioSystem.write` encode
    * (16-bit signed little-endian PCM) in the same mapPartitions batch
    * shape as [[encodePngBatches]]: for id the clip is
    * (500 + id % 251) frames at (8000 + (id % 8)·1000) Hz with
    * (1 + id % 2) channels, every channel of frame i carrying sample
    * value ((i·31 + id) mod 512) − 256. Every property a decoder can
    * read — rate, channels, frame count, duration, and the amplitude sum
    * over all samples — is closed-form in the id, which makes the
    * round-trip oracle-checkable in plain SQL (the m2c_audio_decode
    * oracle). PCM is lossless, so the decode must return the exact
    * samples the formula wrote.
    */
  def encodeWavBatches(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val rate = (8000 + (id % 8) * 1000).toInt
          val channels = (1 + id % 2).toInt
          val frames = (500 + id % 251).toInt
          val data = new Array[Byte](frames * channels * 2)
          var i = 0
          while (i < frames) {
            val v = (((i * 31 + id) % 512) - 256).toInt
            var c = 0
            while (c < channels) {
              val off = (i * channels + c) * 2
              data(off) = (v & 0xFF).toByte
              data(off + 1) = ((v >> 8) & 0xFF).toByte
              c += 1
            }
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels,
            true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          (id, bos.toByteArray)
        }
      }
      .toDF(idCol, "payload")
      .withColumn("media_type", lit("audio"))
  }

  /** AIFF sibling of [[encodeWavBatches]] — the SAME closed-form fixture
    * (rate, channels, frames, samples all functions of the id) written
    * through `AudioFileFormat.Type.AIFF` with a BIG-endian 16-bit PCM
    * body (AIFF's required byte order — the mirror image of WAV's
    * little-endian, so decoding both proves the sample reader handles
    * either layout). Because the formula is identical, the m2d oracle is
    * the m2c oracle verbatim.
    */
  def encodeAiffBatches(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val rate = (8000 + (id % 8) * 1000).toInt
          val channels = (1 + id % 2).toInt
          val frames = (500 + id % 251).toInt
          val data = new Array[Byte](frames * channels * 2)
          var i = 0
          while (i < frames) {
            val v = (((i * 31 + id) % 512) - 256).toInt
            var c = 0
            while (c < channels) {
              val off = (i * channels + c) * 2
              data(off) = ((v >> 8) & 0xFF).toByte   // big-endian: high byte first
              data(off + 1) = (v & 0xFF).toByte
              c += 1
            }
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, channels,
            true, true)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.AIFF, bos)
          (id, bos.toByteArray)
        }
      }
      .toDF(idCol, "payload")
      .withColumn("media_type", lit("audio"))
  }

  /** RIFF/AVI sniff — "RIFF" at 0, "AVI " at 8 (the video sibling of
    * [[looksLikeWav]]; the two RIFF form types are disjoint).
    */
  private[graft] def looksLikeAvi(b: Array[Byte]): Boolean =
    b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  /** Minimal RIFF chunk walker: visits every NON-LIST chunk as
    * (fourcc, bodyOffset, bodySize), descending into LIST bodies (their
    * 4-byte list type is skipped), honoring the spec's word alignment.
    * Malformed sizes stop the walk instead of over-reading, and LIST
    * nesting deeper than [[MaxRiffDepth]] is skipped rather than entered
    * (a real AVI nests 2–3 levels; ~100 KB of crafted nested LIST headers
    * would otherwise overflow the stack, which NonFatal does not catch) —
    * the parser stays total on sniff-passing garbage.
    */
  private val MaxRiffDepth = 64

  private def walkRiff(b: Array[Byte], from: Int, to: Int, depth: Int = 0)
                      (visit: (String, Int, Int) => Unit): Unit = {
    def le32(o: Int): Long =
      (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
        ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
    var pos = from
    var ok = true
    while (ok && pos + 8 <= to) {
      val cc = new String(b, pos, 4, "ISO-8859-1")
      val size = le32(pos + 4)
      val body = pos + 8
      if (size < 0 || size > Int.MaxValue || body + size > to) ok = false
      else {
        if (cc == "LIST" && size >= 4) {
          if (depth < MaxRiffDepth)
            walkRiff(b, body + 4, body + size.toInt, depth + 1)(visit)
        } else visit(cc, body, size.toInt)
        pos = body + size.toInt + (size.toInt & 1)
      }
    }
  }

  /** REAL video container decode — a hand-written parser for UNCOMPRESSED
    * AVI (RIFF form 'AVI ', 'avih' main header, '00db' DIB frame chunks):
    * width/height/frame count from the avih fields, true duration_ms =
    * frames × microSecPerFrame / 1000. The JDK ships no video codec, but
    * an uncompressed AVI needs none — the container is plain RIFF
    * bookkeeping, so the header fields (and in [[decodeVideoBatches]] the
    * frame bytes themselves) are readable with zero codec libraries.
    * None when the payload is not a well-formed AVI — total, like its
    * image/audio siblings. Compressed streams would still need a codec;
    * that narrower boundary is documented at [[stubDecode]].
    */
  private[graft] def tryDecodeAvi(payload: Array[Byte]): Option[MediaMeta] =
    if (!looksLikeAvi(payload)) None
    else {
      def le32(o: Int): Long =
        (payload(o) & 0xFFL) | ((payload(o + 1) & 0xFFL) << 8) |
          ((payload(o + 2) & 0xFFL) << 16) | ((payload(o + 3) & 0xFFL) << 24)
      var meta: Option[MediaMeta] = None
      try {
        walkRiff(payload, 12, payload.length) { (cc, off, size) =>
          if (cc == "avih" && size >= 56 && meta.isEmpty) {
            val usPerFrame = le32(off)
            val frames = le32(off + 16)
            val w = le32(off + 32)
            val h = le32(off + 36)
            if (w > 0 && h > 0 && frames > 0 && usPerFrame > 0)
              meta = Some(MediaMeta(w.toInt, h.toInt, frames.toInt,
                frames * usPerFrame / 1000L))
          }
        }
        meta
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  case class AudioPcm(doc_id: Long, sample_rate: Int, channels: Int,
                      n_frames: Long, duration_ms: Long, amp_sum: Long)

  /** REAL sample-level audio decode — the [[decodeImageBatches]] analogue:
    * header fields plus the sum of every 16-bit PCM sample across all
    * frames and channels, the cheapest whole-signal statistic that still
    * proves the decoder read the body, not just the header. Requires
    * 16-bit signed PCM in either byte order (WAV's little-endian, AIFF's
    * big-endian); throws on anything else — this path is for known-audio
    * columns, [[decodeBatches]] is the total/fallback form.
    */
  def decodeAudioBatches(spark: SparkSession, withPayload: DataFrame,
                         idCol: String): Dataset[AudioPcm] = {
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload))
          try {
            val fmt = in.getFormat
            require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              fmt.getSampleSizeInBits == 16,
              s"decodeAudioBatches: id=$id is not 16-bit signed PCM")
            val frames = in.getFrameLength
            require(frames >= 0, s"decodeAudioBatches: id=$id has unknown frame count")
            val bytes = in.readAllBytes()
            val be = fmt.isBigEndian // WAV is LE, AIFF is BE — sum either
            var s = 0L
            var off = 0
            while (off + 1 < bytes.length) {
              s += (if (be) ((bytes(off) << 8) | (bytes(off + 1) & 0xFF)).toShort.toLong
                    else ((bytes(off) & 0xFF) | (bytes(off + 1) << 8)).toShort.toLong)
              off += 2
            }
            val rate = math.max(1L, math.round(fmt.getSampleRate.toDouble))
            AudioPcm(id, rate.toInt, fmt.getChannels, frames,
              frames * 1000L / rate, s)
          } finally in.close()
        }
      }
  }

  case class ResampledPcm(doc_id: Long, sample_rate: Int, channels: Int,
                          n_frames: Long, duration_ms: Long, amp_sum: Long)

  /** M2g — PCM sample-rate conversion, the one audio TRANSFORM next to
    * decode: each channel is linearly interpolated at exact rational
    * source positions (output frame j samples source position
    * j·src/target, kept as integer quotient+remainder — no floating
    * point, so results are bit-identical across engines, partitions and
    * reruns, and an upsample at src == target is the identity). The
    * interpolated value is the exact floor of
    * (s0·(target−frac) + s1·frac) / target, computed with a +32768 offset
    * so the dividend stays non-negative (floor == truncate — the same
    * arithmetic any SQL engine reproduces with `//`). Output rows carry
    * the resampled frame count (floor(frames·target/src)), duration at
    * the new rate, and the summed resampled amplitude across channels —
    * the decode-proof statistic, as in [[decodeAudioBatches]].
    *
    * Same scale shape as every decoder here: narrow mapPartitions, one
    * row per clip, payloads never shuffle. Accepts 16-bit signed PCM in
    * either byte order (WAV LE / AIFF BE).
    */
  def resampleAudioBatches(spark: SparkSession, withPayload: DataFrame,
                           idCol: String, targetRate: Int): Dataset[ResampledPcm] = {
    require(targetRate >= 1, "resampleAudioBatches: targetRate must be >= 1")
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload))
          try {
            val fmt = in.getFormat
            require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              fmt.getSampleSizeInBits == 16,
              s"resampleAudioBatches: id=$id is not 16-bit signed PCM")
            val ch = fmt.getChannels
            val src = math.max(1L, math.round(fmt.getSampleRate.toDouble)).toInt
            val bytes = in.readAllBytes()
            val be = fmt.isBigEndian
            val frames = bytes.length / (2 * ch)
            def sample(i: Int, c: Int): Long = {
              val off = (i * ch + c) * 2
              (if (be) ((bytes(off) << 8) | (bytes(off + 1) & 0xFF)).toShort
               else ((bytes(off) & 0xFF) | (bytes(off + 1) << 8)).toShort).toLong
            }
            val nOut = if (frames == 0) 0L else frames.toLong * targetRate / src
            var amp = 0L
            var j = 0L
            while (j < nOut) {
              val num = j * src
              val i0 = (num / targetRate).toInt
              val frac = num % targetRate
              val i1 = math.min(i0 + 1, frames - 1)
              var c = 0
              while (c < ch) {
                val s0 = sample(i0, c) + 32768L
                val s1 = sample(i1, c) + 32768L
                amp += (s0 * (targetRate - frac) + s1 * frac) / targetRate - 32768L
                c += 1
              }
              j += 1
            }
            ResampledPcm(id, targetRate, ch, nOut,
              nOut * 1000L / targetRate, amp)
          } finally in.close()
        }
      }
  }

  /** Deterministic uncompressed-AVI fixture generator — the video sibling
    * of [[encodePngBatches]]/[[encodeWavBatches]], built BY HAND to the
    * RIFF/AVI spec (no codec exists in the JDK to do it for us): for id
    * the clip is (2 + id % 5) frames of (1 + id % 8) × (1 + id % 6)
    * 24-bit BGR pixels at microSecPerFrame = 20000·(1 + id % 3), every
    * channel of pixel (x, y) in frame f carrying
    * (x·7 + y·13 + f·31 + id) mod 256. Rows are zero-padded to the
    * spec's 4-byte stride — padding contributes nothing to the byte sum,
    * which keeps the px_sum oracle a pure triple range product. Layout:
    * RIFF('AVI ') → LIST(hdrl){avih, LIST(strl){strh 'vids'/'DIB ',
    * strf BITMAPINFOHEADER}} → LIST(movi){'00db' × frames}.
    */
  def encodeAviBatches(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (1 + id % 8).toInt
          val h = (1 + id % 6).toInt
          val frames = (2 + id % 5).toInt
          val usPerFrame = (20000 * (1 + id % 3)).toInt
          val stride = ((3 * w + 3) / 4) * 4
          val frameBytes = stride * h
          val bos = new java.io.ByteArrayOutputStream()
          def cc(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
          def le32(v: Int): Unit = {
            bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF)
            bos.write((v >> 16) & 0xFF); bos.write((v >> 24) & 0xFF)
          }
          def le16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
          // sizes, inner-out: strf body 40, strh body 56, avih body 56
          val strlSize = 4 + (8 + 56) + (8 + 40)
          val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
          val moviSize = 4 + frames * (8 + frameBytes)
          val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
          cc("RIFF"); le32(riffSize); cc("AVI ")
          cc("LIST"); le32(hdrlSize); cc("hdrl")
          cc("avih"); le32(56)
          le32(usPerFrame); le32(0); le32(0); le32(0)  // usPerFrame, maxBps, padding, flags
          le32(frames); le32(0); le32(1); le32(0)      // totalFrames, initial, streams, bufSize
          le32(w); le32(h); le32(0); le32(0); le32(0); le32(0) // width, height, reserved[4]
          cc("LIST"); le32(strlSize); cc("strl")
          cc("strh"); le32(56)
          cc("vids"); cc("DIB ")
          le32(0); le16(0); le16(0); le32(0)           // flags, priority, language, initial
          le32(usPerFrame); le32(1000000)              // scale/rate = frame period
          le32(0); le32(frames); le32(0); le32(-1); le32(0) // start, length, bufSize, quality, sampleSize
          le16(0); le16(0); le16(w); le16(h)           // rcFrame
          cc("strf"); le32(40)
          le32(40); le32(w); le32(h); le16(1); le16(24) // BITMAPINFOHEADER
          le32(0); le32(frameBytes); le32(0); le32(0); le32(0); le32(0)
          cc("LIST"); le32(moviSize); cc("movi")
          var f = 0
          while (f < frames) {
            cc("00db"); le32(frameBytes)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = ((x * 7 + y * 13 + f * 31 + id) % 256).toInt
                bos.write(v); bos.write(v); bos.write(v) // B, G, R — same value
                x += 1
              }
              var pad = stride - 3 * w
              while (pad > 0) { bos.write(0); pad -= 1 }
              y += 1
            }
            f += 1
          }
          (id, bos.toByteArray)
        }
      }
      .toDF(idCol, "payload")
      .withColumn("media_type", lit("video"))
  }

  /** Deterministic MJPEG-AVI fixture generator — [[encodeAviBatches]]'s
    * compressed sibling: same per-id geometry (frames, size, frame period)
    * and the same closed-form raster v = (x·7 + y·13 + f·31 + id) mod 256,
    * but each frame is ImageIO-ENCODED as a complete JPEG in a '00dc'
    * chunk (strh handler / strf biCompression = 'MJPG'). JPEG is lossy, so
    * the decoded pixel sum is codec-defined rather than closed-form; the
    * generator therefore round-trips each frame through ImageIO at encode
    * time and records the ground truth as `expected_px_sum` — an oracle
    * column produced by the WHOLE-IMAGE decode, independent of the RIFF
    * walk + per-chunk decode that [[decodeVideoBatches]] performs. Odd
    * JPEG byte lengths get the spec's pad byte (excluded from the chunk
    * size, included in the enclosing LIST size).
    */
  def encodeMjpegAviBatches(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (1 + id % 8).toInt
          val h = (1 + id % 6).toInt
          val frames = (2 + id % 5).toInt
          val usPerFrame = (20000 * (1 + id % 3)).toInt
          var expected = 0L
          val jpegs = (0 until frames).map { f =>
            val img = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v = ((x * 7 + y * 13 + f * 31 + id) % 256).toInt
                img.setRGB(x, y, (v << 16) | (v << 8) | v)
                x += 1
              }
              y += 1
            }
            val fb = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "jpg", fb)
            val bytes = fb.toByteArray
            val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            expected += lumSum(back)
            bytes
          }
          val bos = new java.io.ByteArrayOutputStream()
          def cc(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
          def le32(v: Int): Unit = {
            bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF)
            bos.write((v >> 16) & 0xFF); bos.write((v >> 24) & 0xFF)
          }
          def le16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
          val strlSize = 4 + (8 + 56) + (8 + 40)
          val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
          val moviSize = 4 + jpegs.map(j => 8 + j.length + (j.length & 1)).sum
          val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
          cc("RIFF"); le32(riffSize); cc("AVI ")
          cc("LIST"); le32(hdrlSize); cc("hdrl")
          cc("avih"); le32(56)
          le32(usPerFrame); le32(0); le32(0); le32(0)
          le32(frames); le32(0); le32(1); le32(0)
          le32(w); le32(h); le32(0); le32(0); le32(0); le32(0)
          cc("LIST"); le32(strlSize); cc("strl")
          cc("strh"); le32(56)
          cc("vids"); cc("MJPG")
          le32(0); le16(0); le16(0); le32(0)
          le32(usPerFrame); le32(1000000)
          le32(0); le32(frames); le32(0); le32(-1); le32(0)
          le16(0); le16(0); le16(w); le16(h)
          cc("strf"); le32(40)
          le32(40); le32(w); le32(h); le16(1); le16(24)
          cc("MJPG")                                   // biCompression
          le32(0); le32(0); le32(0); le32(0); le32(0)
          cc("LIST"); le32(moviSize); cc("movi")
          jpegs.foreach { j =>
            cc("00dc"); le32(j.length); bos.write(j)
            if ((j.length & 1) == 1) bos.write(0)
          }
          (id, bos.toByteArray, expected)
        }
      }
      .toDF(idCol, "payload", "expected_px_sum")
      .withColumn("media_type", lit("video"))
  }

  /** Deterministic ANIMATED-GIF fixture generator — the pure-JDK sibling
    * of [[encodeAviBatches]] proving the video path generalizes past
    * RIFF: same per-id geometry family ((1 + id % 8) × (1 + id % 6),
    * 2 + id % 5 frames, frame period 20·(1 + id % 3) ms stored as the
    * GraphicControlExtension delayTime in centiseconds) and the same
    * closed-form raster v = (x·7 + y·13 + f·31 + id) mod 256, written as
    * indices into an explicit 256-entry gray palette. GIF is LOSSLESS for
    * palettized content, so decode must return the exact formula values —
    * px_sum stays a pure closed form (single-channel here; the DIB sum is
    * 3× it). Written with `javax.imageio`'s own GIF writer
    * (`writeToSequence` + per-frame metadata), read back by the same
    * registry — encoder and decoder share nothing but the format.
    */
  def encodeGifBatches(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions { ids =>
        // per-partition writer init (the batch-shape contract); palette
        // index i = gray value i, so raster bytes ARE the formula values
        val grays = Array.tabulate(256)(_.toByte)
        val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
        ids.map { id =>
          val w = (1 + id % 8).toInt
          val h = (1 + id % 6).toInt
          val frames = (2 + id % 5).toInt
          val delayCs = (2 * (1 + id % 3)).toInt // centiseconds = 20ms·(1+id%3)
          val bos = new java.io.ByteArrayOutputStream()
          val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          // sequential scan order: the JDK writer's default INTERLACED
          // output corrupts sub-8-row rasters (measured: a 2×2 frame
          // round-trips with its second row zeroed), and interlace buys
          // nothing for generated fixtures
          val param = writer.getDefaultWriteParam
          param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
          try {
            writer.setOutput(ios)
            writer.prepareWriteSequence(null)
            var f = 0
            while (f < frames) {
              val img = new java.awt.image.BufferedImage(w, h,
                java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
              val raster = img.getRaster
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  raster.setSample(x, y, 0, ((x * 7 + y * 13 + f * 31 + id) % 256).toInt)
                  x += 1
                }
                y += 1
              }
              val meta = writer.getDefaultImageMetadata(
                new javax.imageio.ImageTypeSpecifier(img), param)
              val fmt = "javax_imageio_gif_image_1.0"
              val root = meta.getAsTree(fmt)
                .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
              val gce = {
                val existing = root.getElementsByTagName("GraphicControlExtension")
                if (existing.getLength > 0)
                  existing.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
                else {
                  val n = new javax.imageio.metadata.IIOMetadataNode("GraphicControlExtension")
                  root.appendChild(n); n
                }
              }
              gce.setAttribute("disposalMethod", "none")
              gce.setAttribute("userInputFlag", "FALSE")
              gce.setAttribute("transparentColorFlag", "FALSE")
              gce.setAttribute("transparentColorIndex", "0")
              gce.setAttribute("delayTime", delayCs.toString)
              meta.setFromTree(fmt, root)
              writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), param)
              f += 1
            }
            writer.endWriteSequence()
          } finally { writer.dispose(); ios.close() }
          (id, bos.toByteArray)
        }
      }
      .toDF(idCol, "payload")
      .withColumn("media_type", lit("video"))
  }

  /** Animated-GIF sniff — "GIF87a"/"GIF89a" at 0. Same bytes
    * [[looksLikeImage]] accepts (a GIF *is* an image container); the
    * video path additionally walks every frame and the per-frame delay
    * metadata, which ImageIO exposes and plain `ImageIO.read` does not.
    */
  private[graft] def looksLikeGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'

  /** REAL animated-GIF video decode via the JDK (`javax.imageio` — the
    * second zero-codec-library video container next to RIFF/AVI): frame
    * count from the reader's image sequence, geometry from frame 0, true
    * duration_ms = Σ per-frame GraphicControlExtension delayTime × 10
    * (GIF stores centiseconds). None when the payload is not a decodable
    * GIF — total, like [[tryDecodeAvi]].
    */
  private[graft] def tryDecodeGif(payload: Array[Byte]): Option[MediaMeta] =
    if (!looksLikeGif(payload)) None
    else {
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      try {
        reader.setInput(javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload)))
        val n = reader.getNumImages(true)
        if (n < 1) None
        else Some(MediaMeta(reader.getWidth(0), reader.getHeight(0), n,
          (0 until n).map(f => gifFrameDelayCs(reader, f)).sum * 10L))
      } catch { case scala.util.control.NonFatal(_) => None }
      finally reader.dispose()
    }

  /** Per-frame delay in centiseconds from the frame's native GIF metadata
    * tree (`GraphicControlExtension/@delayTime`); 0 when the frame has no
    * GCE — the spec's "as fast as possible".
    */
  private def gifFrameDelayCs(reader: javax.imageio.ImageReader, frame: Int): Long = {
    val root = reader.getImageMetadata(frame)
      .getAsTree("javax_imageio_gif_image_1.0")
      .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
    val gce = root.getElementsByTagName("GraphicControlExtension")
    if (gce.getLength == 0) 0L
    else gce.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
      .getAttribute("delayTime").toLong
  }

  case class VideoFrames(doc_id: Long, width: Int, height: Int, n_frames: Long,
                         duration_ms: Long, px_sum: Long)

  /** Luminance (low-byte) pixel sum of a decoded raster — the shared
    * decode-proof statistic of [[decodeImageBatches]] and the MJPEG frame
    * path of [[decodeVideoBatches]].
    */
  private def lumSum(img: java.awt.image.BufferedImage): Long = {
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
    s
  }

  /** JPEG SOI sniff — FF D8 FF at offset 0 (every JFIF/EXIF frame starts
    * with the SOI marker followed by another marker byte).
    */
  private def looksLikeJpeg(b: Array[Byte], off: Int, size: Int): Boolean =
    size >= 3 && (b(off) & 0xFF) == 0xFF && (b(off + 1) & 0xFF) == 0xD8 &&
      (b(off + 2) & 0xFF) == 0xFF

  /** REAL frame-level video decode — the [[decodeAudioBatches]] analogue
    * for AVI: avih header fields plus a per-frame statistic over every
    * frame chunk in the movi list. '00db' (uncompressed DIB) chunks are
    * byte-summed — row padding is zero by spec-writer contract, so the sum
    * equals the pixel-channel sum. '00dc' (compressed) chunks that sniff
    * as JPEG — i.e. MJPEG, the one codec the JDK can decode because each
    * frame is a complete JPEG for the already-shipped ImageIO — are
    * DECODED and luminance-summed ([[lumSum]]); '00dc' chunks of any other
    * codec fall back to the byte sum (an integrity statistic, not a pixel
    * decode — that narrower honest boundary is documented at
    * [[stubDecode]]). The statistic proves the decoder walked (and for
    * DIB/MJPEG, decoded) every frame chunk, not just the header. ANIMATED
    * GIF payloads (sniffed by [[looksLikeGif]]) take the ImageIO frame
    * walk instead — every frame decoded and luminance-summed, duration
    * from the per-frame delay metadata. Throws on a payload that is
    * neither a parseable AVI nor a GIF — this path is for known-video
    * columns, [[decodeBatches]] is the total/fallback form.
    */
  def decodeVideoBatches(spark: SparkSession, withPayload: DataFrame,
                         idCol: String): Dataset[VideoFrames] = {
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          if (looksLikeGif(payload)) decodeGifRow(id, payload)
          else decodeAviRow(id, payload)
        }
      }
  }

  /** The GIF arm of [[decodeVideoBatches]]: header metadata via
    * [[tryDecodeGif]] plus every frame ImageIO-decoded and
    * luminance-summed — the same decode-proof statistic as the MJPEG arm.
    */
  private def decodeGifRow(id: Long, payload: Array[Byte]): VideoFrames = {
    val meta = tryDecodeGif(payload).getOrElse(
      throw new IllegalArgumentException(
        s"decodeVideoBatches: id=$id is not a parseable GIF"))
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    try {
      reader.setInput(javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload)))
      var pxSum = 0L
      var f = 0
      while (f < meta.n_frames) { pxSum += lumSum(reader.read(f)); f += 1 }
      VideoFrames(id, meta.width, meta.height, meta.n_frames,
        meta.duration_ms, pxSum)
    } finally reader.dispose()
  }

  /** The AVI arm of [[decodeVideoBatches]] — unchanged RIFF walk:
    * '00db' byte sums, MJPEG '00dc' ImageIO decode + luminance sum.
    */
  private def decodeAviRow(id: Long, payload: Array[Byte]): VideoFrames = {
    val meta = tryDecodeAvi(payload).getOrElse(
      throw new IllegalArgumentException(
        s"decodeVideoBatches: id=$id is not a parseable AVI"))
    var pxSum = 0L
    var nChunks = 0L
    walkRiff(payload, 12, payload.length) { (cc, off, size) =>
      if (cc == "00db" || cc == "00dc") {
        nChunks += 1
        if (cc == "00dc" && looksLikeJpeg(payload, off, size)) {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload, off, size))
          require(img != null,
            s"decodeVideoBatches: id=$id frame $nChunks sniffs as JPEG but does not decode")
          pxSum += lumSum(img)
        } else {
          var i = off
          val end = off + size
          while (i < end) { pxSum += (payload(i) & 0xFF); i += 1 }
        }
      }
    }
    require(nChunks == meta.n_frames,
      s"decodeVideoBatches: id=$id movi has $nChunks frame chunks, avih says ${meta.n_frames}")
    VideoFrames(id, meta.width, meta.height, meta.n_frames,
      meta.duration_ms, pxSum)
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

  /** Aspect-preserving fit-to-box resize PLAN over decoded media: computes
    * target dimensions with PURE INTEGER arithmetic (no float scale
    * factor — `w*boxH >= h*boxW` picks the binding axis, then one integer
    * multiply/divide, clamped to ≥ 1 so an extreme aspect ratio can never
    * plan a zero-pixel axis) and derives the "resized" payload's digest
    * deterministically from the source digest and the box (==== STUB ====
    * for the payload bytes only — [[resizePixelsToBox]] is the REAL pixel
    * resampler for decodable images, sharing this exact dimension
    * formula). Narrow, no shuffle. Rows already inside the box pass
    * through unscaled.
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
        .otherwise(greatest(lit(1L), expr(s"(meta.width * ${boxH}L) div meta.height")))
        .as("new_width"),
      when(fits, h).when(wide,
          greatest(lit(1L), expr(s"(meta.height * ${boxW}L) div meta.width")))
        .otherwise(lit(boxH.toLong)).as("new_height"),
      when(fits, col("sha256"))
        .otherwise(sha2(concat(col("sha256"), lit(s"->${boxW}x$boxH")), 256))
        .as("resized_sha"))
  }

  case class ResizedPixels(doc_id: Long, width: Int, height: Int,
                           new_width: Int, new_height: Int, px_sum: Long)

  /** REAL pixel resize — nearest-neighbor resampling inside the decode
    * `mapPartitions` stage, replacing [[resizeToBox]]'s digest stub for
    * decodable images: target dimensions from the SAME integer fit-to-box
    * formula (binding axis, multiply/divide, ≥ 1 clamp; a row already
    * inside the box passes through, where the source-index arithmetic
    * degenerates to the identity), source pixel for target (x, y) =
    * (x·w div nw, y·h div nh) — pure integer index math, no float kernel,
    * so every output pixel is closed-form in the source raster and the
    * resample is oracle-checkable (`m4b_resize_pixels` recomputes the
    * resampled px_sum from the PNG fixture formula in SQL). Returns the
    * low-byte (luminance) sum over the RESIZED raster — the decode-proof
    * statistic of [[decodeImageBatches]], applied to the resampled grid.
    * Throws on an undecodable payload (known-image columns; use
    * [[decodeBatches]] + [[resizeToBox]] for the total/planning form).
    */
  def resizePixelsToBox(spark: SparkSession, withPayload: DataFrame,
                        idCol: String, boxW: Int, boxH: Int): Dataset[ResizedPixels] = {
    require(boxW >= 1 && boxH >= 1, "resizePixelsToBox: box must be positive")
    import spark.implicits._
    withPayload.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          require(img != null, s"resizePixelsToBox: payload for id=$id is not a decodable image")
          val w = img.getWidth
          val h = img.getHeight
          val fits = w <= boxW && h <= boxH
          val wide = w.toLong * boxH >= h.toLong * boxW
          val nw = if (fits) w else if (wide) boxW
                   else math.max(1L, w.toLong * boxH / h).toInt
          val nh = if (fits) h else if (wide) math.max(1L, h.toLong * boxW / w).toInt
                   else boxH
          var s = 0L
          var y = 0
          while (y < nh) {
            val sy = (y.toLong * h / nh).toInt
            var x = 0
            while (x < nw) {
              val sx = (x.toLong * w / nw).toInt
              s += (img.getRGB(sx, sy) & 0xFF).toLong
              x += 1
            }
            y += 1
          }
          ResizedPixels(id, w, h, nw, nh, s)
        }
      }
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
