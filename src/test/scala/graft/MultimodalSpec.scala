package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payloads, batch decode shape, determinism. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (0L, "an image doc"), (1L, "an audio doc"), (2L, "a video doc"), (3L, "another image")
  ).toDF("doc_id", "text")

  test("attachPayload: binary column + media type from id (M1)") {
    val out = Multimodal.attachPayload(docs, "doc_id", "text")
      .orderBy("doc_id").select("media_type").as[String].collect().toSeq
    assert(out == Seq("image", "audio", "video", "image"))
  }

  test("decodeBatches: deterministic, typed output; image rows have 1 frame / 0 duration (M2)") {
    val withPayload = Multimodal.attachPayload(docs, "doc_id", "text")
    val a = Multimodal.decodeBatches(spark, withPayload, "doc_id").collect().sortBy(_.doc_id)
    val b = Multimodal.decodeBatches(spark, withPayload, "doc_id").collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq, "decode must be a pure function of the bytes")
    a.foreach { r =>
      assert(r.meta.width >= 1 && r.meta.width <= 4096)
      assert(r.meta.height >= 1 && r.meta.height <= 2160)
      if (r.media_type == "image") {
        assert(r.meta.n_frames == 1 && r.meta.duration_ms == 0L)
      } else {
        assert(r.meta.n_frames >= 1)
      }
      assert(r.byte_len > 0 && r.sha256.length == 64)
    }
  }

  test("decodeBatches runs per-partition (mapPartitions shape survives repartition)") {
    val withPayload = Multimodal.attachPayload(docs, "doc_id", "text").repartition(3)
    val out = Multimodal.decodeBatches(spark, withPayload, "doc_id").collect()
    assert(out.length == 4 && out.map(_.doc_id).toSet == Set(0L, 1L, 2L, 3L))
  }

  test("resizeToBox: integer fit-to-box, aspect preserved, pass-through when inside (M4)") {
    import spark.implicits._
    // (id, w, h): wider-than-box, taller-than-box, already-fits
    val rows = Seq((1L, 2000L, 1000L), (2L, 500L, 2000L), (3L, 320L, 200L))
      .map { case (id, w, h) =>
        (id, "image", 1L, s"sha$id", Multimodal.MediaMeta(w.toInt, h.toInt, 1, 0L))
      }.toDF("doc_id", "media_type", "byte_len", "sha256", "meta")
    val out = Multimodal.resizeToBox(rows, 640, 480)
      .select("doc_id", "new_width", "new_height", "resized_sha")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 640L && out(0).getLong(2) == 320L) // width-bound
    assert(out(1).getLong(1) == 120L && out(1).getLong(2) == 480L) // height-bound
    assert(out(2).getLong(1) == 320L && out(2).getLong(2) == 200L
      && out(2).getString(3) == "sha3") // inside: untouched, digest kept
    // aspect ratio error bounded by integer floor
    assert(math.abs(640.0 / 320.0 - 2000.0 / 1000.0) < 1e-9)
  }

  test("real PNG round-trip: ImageIO decode returns the exact fixture dims and pixels (M2b)") {
    import org.apache.spark.sql.functions.col
    val ids = Seq(0L, 1L, 17L, 30L, 99L).toDF("doc_id")
    val png = Multimodal.encodePngBatches(spark, ids, "doc_id")
    val out = Multimodal.decodeImageBatches(spark, png, "doc_id")
      .collect().map(r => r.doc_id -> r).toMap
    ids.as[Long].collect().foreach { id =>
      val w = (1 + id % 31).toInt
      val h = (1 + id % 17).toInt
      val want = (for (y <- 0 until h; x <- 0 until w) yield (x * 7 + y * 13 + id) % 256).sum
      assert(out(id).width == w && out(id).height == h, s"dims for id=$id")
      assert(out(id).px_sum == want, s"pixel sum for id=$id — decoder must read every pixel")
    }
    // decodeBatches takes the REAL path for true images: header dims, 1 frame
    val metas = Multimodal.decodeBatches(spark, png, "doc_id").toDF()
      .select(col("doc_id"), col("meta.width"), col("meta.height"), col("meta.n_frames"),
        col("meta.duration_ms"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
    ids.as[Long].collect().foreach { id =>
      assert(metas(id) == (((1 + id % 31).toInt, (1 + id % 17).toInt, 1, 0L)),
        s"decodeBatches real-image metadata for id=$id")
    }
  }

  test("decodeBatches falls back to the hash stub for image-typed payloads that don't parse") {
    val withPayload = Multimodal.attachPayload(docs, "doc_id", "text")
      .filter(org.apache.spark.sql.functions.col("media_type") === "image")
    val out = Multimodal.decodeBatches(spark, withPayload, "doc_id").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val want = Multimodal.stubDecode(r.sha256, "image")
      assert(r.meta == want, s"utf-8 payload (not an image) must stub-decode: ${r.doc_id}")
    }
  }

  test("resizePixelsToBox: real NN resample matches the closed-form grid; identity when inside (M4b)") {
    val ids = (0L until 40L).toDF("doc_id")
    val png = Multimodal.encodePngBatches(spark, ids, "doc_id")
    val out = Multimodal.resizePixelsToBox(spark, png, "doc_id", 8, 6)
      .collect().map(r => r.doc_id -> r).toMap
    (0L until 40L).foreach { id =>
      val w = (1 + id % 31).toInt
      val h = (1 + id % 17).toInt
      val fits = w <= 8 && h <= 6
      val wide = w * 6 >= h * 8
      val nw = if (fits) w else if (wide) 8 else math.max(1, w * 6 / h)
      val nh = if (fits) h else if (wide) math.max(1, h * 8 / w) else 6
      val exp = (for { y <- 0 until nh; x <- 0 until nw } yield
        ((x * w / nw) * 7 + (y * h / nh) * 13 + id) % 256).sum
      val r = out(id)
      assert((r.width, r.height, r.new_width, r.new_height, r.px_sum) ==
        ((w, h, nw, nh, exp)), s"NN resample for id=$id (${w}x$h -> ${nw}x$nh)")
      if (fits) assert(r.px_sum == (for { y <- 0 until h; x <- 0 until w } yield
        (x * 7 + y * 13 + id) % 256).sum, s"pass-through must keep every pixel: id=$id")
    }
  }

  test("real WAV round-trip: javax.sound decode returns the exact fixture header + samples (M2c)") {
    val ids = (0L until 20L).toDF("doc_id")
    val wav = Multimodal.encodeWavBatches(spark, ids, "doc_id")
    // header path (decodeBatches: channels/rate in the width/height slots)
    val metas = Multimodal.decodeBatches(spark, wav.withColumn("media_type", lit("audio")),
      "doc_id").collect().map(r => r.doc_id -> r.meta).toMap
    // sample path (decodeAudioBatches: body read, amplitude summed)
    val pcms = Multimodal.decodeAudioBatches(spark, wav, "doc_id")
      .collect().map(p => p.doc_id -> p).toMap
    (0L until 20L).foreach { id =>
      val rate = (8000 + (id % 8) * 1000).toInt
      val channels = (1 + id % 2).toInt
      val frames = (500 + id % 251).toInt
      val expSum = channels.toLong * (0 until frames).map(i => ((i * 31 + id) % 512) - 256).sum
      val m = metas(id)
      assert((m.width, m.height, m.n_frames, m.duration_ms) ==
        ((channels, rate, frames, frames * 1000L / rate)),
        s"decodeBatches WAV header for id=$id")
      val p = pcms(id)
      assert((p.sample_rate, p.channels, p.n_frames, p.amp_sum) ==
        ((rate, channels, frames.toLong, expSum)),
        s"decodeAudioBatches PCM body for id=$id")
    }
    // a sniff-passing garbage RIFF body stubs instead of throwing (total)
    val fakeRiff = ("RIFF1234WAVEgarbage that is not a valid wave body at all")
    assert(Multimodal.looksLikeWav(fakeRiff.getBytes("ISO-8859-1")))
    assert(Multimodal.tryDecodeWav(fakeRiff.getBytes("ISO-8859-1")).isEmpty)
  }

  test("real AIFF round-trip: big-endian PCM decodes to the same fixture header + samples (M2d)") {
    val ids = (0L until 20L).toDF("doc_id")
    val aiff = Multimodal.encodeAiffBatches(spark, ids, "doc_id")
    val metas = Multimodal.decodeBatches(spark, aiff.withColumn("media_type", lit("audio")),
      "doc_id").collect().map(r => r.doc_id -> r.meta).toMap
    val pcms = Multimodal.decodeAudioBatches(spark, aiff, "doc_id")
      .collect().map(p => p.doc_id -> p).toMap
    (0L until 20L).foreach { id =>
      val rate = (8000 + (id % 8) * 1000).toInt
      val channels = (1 + id % 2).toInt
      val frames = (500 + id % 251).toInt
      val expSum = channels.toLong * (0 until frames).map(i => ((i * 31 + id) % 512) - 256).sum
      val m = metas(id)
      assert((m.width, m.height, m.n_frames, m.duration_ms) ==
        ((channels, rate, frames, frames * 1000L / rate)),
        s"decodeBatches AIFF header for id=$id")
      val p = pcms(id)
      assert((p.sample_rate, p.channels, p.n_frames, p.amp_sum) ==
        ((rate, channels, frames.toLong, expSum)),
        s"decodeAudioBatches AIFF PCM body for id=$id")
    }
    // the AIFF sniff accepts FORM/AIFF and FORM/AIFC, rejects other FORMs,
    // and a sniff-passing garbage body decodes to None (total), as for WAV
    assert(Multimodal.looksLikeAiff("FORM1234AIFFrest".getBytes("ISO-8859-1")))
    assert(Multimodal.looksLikeAiff("FORM1234AIFCrest".getBytes("ISO-8859-1")))
    assert(!Multimodal.looksLikeAiff("FORM1234WAVErest".getBytes("ISO-8859-1")))
    assert(Multimodal.tryDecodeWav("FORM1234AIFFgarbage body".getBytes("ISO-8859-1")).isEmpty)
  }

  test("resampleAudioBatches: identity at source rate; exact integer interpolation both directions (M2g)") {
    val ids = (0L until 20L).toDF("doc_id")
    val wav = Multimodal.encodeWavBatches(spark, ids, "doc_id")
    // identity: resampling each clip AT its own rate must reproduce the
    // decode exactly (frac is always 0 → pure copy). Source rates vary per
    // id, so run one id at a time at its own rate.
    val pcms = Multimodal.decodeAudioBatches(spark, wav, "doc_id")
      .collect().map(p => p.doc_id -> p).toMap
    Seq(0L, 3L, 7L, 12L).foreach { id =>
      val rate = (8000 + (id % 8) * 1000).toInt
      val one = wav.filter(col("doc_id") === id)
      val r = Multimodal.resampleAudioBatches(spark, one, "doc_id", rate).collect().head
      val p = pcms(id)
      assert((r.n_frames, r.amp_sum) == ((p.n_frames, p.amp_sum)),
        s"identity resample must be a copy for id=$id")
    }
    // cross-rate: the closed-form fixture oracle (same arithmetic as the
    // DuckDB side of m2g_resample) for up- (8k→12k) and down- (14k→12k)
    val target = 12000
    val res = Multimodal.resampleAudioBatches(spark, wav, "doc_id", target)
      .collect().map(r => r.doc_id -> r).toMap
    (0L until 20L).foreach { id =>
      val src = (8000 + (id % 8) * 1000).toInt
      val ch = (1 + id % 2).toInt
      val frames = (500 + id % 251).toInt
      def vr(i: Long): Long = (i * 31 + id) % 512 // sample + 256
      val nOut = frames.toLong * target / src
      val exp = ch * (0L until nOut).map { j =>
        val num = j * src
        val i0 = num / target
        val fr = num % target
        val i1 = math.min(i0 + 1, frames - 1L)
        (vr(i0) * (target - fr) + vr(i1) * fr) / target - 256
      }.sum
      val r = res(id)
      assert((r.sample_rate, r.channels, r.n_frames, r.duration_ms, r.amp_sum) ==
        ((target, ch, nOut, nOut * 1000L / target, exp)),
        s"closed-form resample mismatch for id=$id (src=$src)")
    }
    // AIFF (big-endian) input resamples identically to WAV (little-endian)
    val aiff = Multimodal.encodeAiffBatches(spark, ids, "doc_id")
    val resAiff = Multimodal.resampleAudioBatches(spark, aiff, "doc_id", target)
      .collect().map(r => r.doc_id -> r.amp_sum).toMap
    (0L until 20L).foreach(id => assert(resAiff(id) == res(id).amp_sum,
      s"byte order must not change the resample for id=$id"))
  }

  test("real uncompressed-AVI round-trip: hand parser returns the exact fixture header + frame bytes (M2e)") {
    val ids = (0L until 20L).toDF("doc_id")
    val avi = Multimodal.encodeAviBatches(spark, ids, "doc_id")
    val metas = Multimodal.decodeBatches(spark, avi, "doc_id")
      .collect().map(r => r.doc_id -> r.meta).toMap
    val pxs = Multimodal.decodeVideoBatches(spark, avi, "doc_id")
      .collect().map(v => v.doc_id -> v).toMap
    (0L until 20L).foreach { id =>
      val w = (1 + id % 8).toInt
      val h = (1 + id % 6).toInt
      val frames = (2 + id % 5).toInt
      val usPerFrame = (20000 * (1 + id % 3)).toInt
      val expSum = (for {
        f <- 0 until frames; y <- 0 until h; x <- 0 until w
      } yield 3L * ((x * 7 + y * 13 + f * 31 + id) % 256)).sum
      val m = metas(id)
      assert((m.width, m.height, m.n_frames, m.duration_ms) ==
        ((w, h, frames, frames.toLong * usPerFrame / 1000)),
        s"decodeBatches AVI header for id=$id")
      val p = pxs(id)
      assert((p.width, p.height, p.n_frames, p.px_sum) ==
        ((w, h, frames.toLong, expSum)),
        s"decodeVideoBatches frame bytes for id=$id")
    }
    // sniff accepts RIFF/AVI only; garbage bodies decode to None (total)
    assert(Multimodal.looksLikeAvi("RIFF1234AVI rest".getBytes("ISO-8859-1")))
    assert(!Multimodal.looksLikeAvi("RIFF1234WAVErest".getBytes("ISO-8859-1")))
    assert(Multimodal.tryDecodeAvi("RIFF1234AVI garbage body here".getBytes("ISO-8859-1")).isEmpty)
  }

  test("real animated-GIF round-trip: frames, delay metadata, and exact palettized pixels (M2h)") {
    val ids = (0L until 20L).toDF("doc_id")
    val gif = Multimodal.encodeGifBatches(spark, ids, "doc_id")
    val metas = Multimodal.decodeBatches(spark, gif, "doc_id")
      .collect().map(r => r.doc_id -> r.meta).toMap
    val pxs = Multimodal.decodeVideoBatches(spark, gif, "doc_id")
      .collect().map(v => v.doc_id -> v).toMap
    (0L until 20L).foreach { id =>
      val w = (1 + id % 8).toInt
      val h = (1 + id % 6).toInt
      val frames = (2 + id % 5).toInt
      val durMs = frames.toLong * 20L * (1 + id % 3)
      val expSum = (for {
        f <- 0 until frames; y <- 0 until h; x <- 0 until w
      } yield (x * 7 + y * 13 + f * 31 + id) % 256).sum
      val m = metas(id)
      assert((m.width, m.height, m.n_frames, m.duration_ms) ==
        ((w, h, frames, durMs)), s"decodeBatches GIF header for id=$id")
      val p = pxs(id)
      assert((p.width, p.height, p.n_frames, p.duration_ms, p.px_sum) ==
        ((w, h, frames.toLong, durMs, expSum)),
        s"decodeVideoBatches GIF frames for id=$id — lossless palette round trip")
    }
    // sniff accepts GIF8 only; a garbage body decodes to None (total), so
    // decodeBatches falls back to the stub rather than failing the job
    assert(Multimodal.looksLikeGif("GIF89a-and-garbage".getBytes("ISO-8859-1")))
    assert(!Multimodal.looksLikeGif("JIF89a".getBytes("ISO-8859-1")))
    assert(Multimodal.tryDecodeGif("GIF89a then nothing real".getBytes("ISO-8859-1")).isEmpty)
  }

  test("real MJPEG-AVI decode: per-chunk ImageIO decode bit-matches the encode-time round trip (M2f)") {
    val ids = (0L until 20L).toDF("doc_id")
    val avi = Multimodal.encodeMjpegAviBatches(spark, ids, "doc_id")
    val expected = avi.select("doc_id", "expected_px_sum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pxs = Multimodal.decodeVideoBatches(spark, avi, "doc_id")
      .collect().map(v => v.doc_id -> v).toMap
    (0L until 20L).foreach { id =>
      val w = (1 + id % 8).toInt
      val h = (1 + id % 6).toInt
      val frames = (2 + id % 5).toInt
      val usPerFrame = (20000 * (1 + id % 3)).toInt
      val p = pxs(id)
      assert((p.width, p.height, p.n_frames, p.duration_ms) ==
        ((w, h, frames.toLong, frames.toLong * usPerFrame / 1000)),
        s"MJPEG AVI header for id=$id")
      assert(p.px_sum == expected(id),
        s"MJPEG per-chunk decode must match the encode-time round trip for id=$id")
      // dispatch pin: the '00dc' path went through ImageIO, not the raw
      // byte sum — a JPEG's entropy-coded bytes never sum to its decoded
      // luminance sum for these rasters (the frame bytes include markers,
      // huffman tables and FF bytes; the luminance sum is bounded by
      // 255·w·h·frames and the byte sum includes ~300+ header bytes/frame)
      val payload = avi.filter(col("doc_id") === id).select("payload")
        .collect()(0).getAs[Array[Byte]](0)
      val rawSum = payload.foldLeft(0L)((s, b) => s + (b & 0xFF))
      assert(p.px_sum != rawSum, s"id=$id: px_sum must not be the raw byte sum")
    }
  }

  test("walkRiff is stack-safe on adversarial deeply-nested LIST payloads (ADVICE r8)") {
    // ~600 KB of nothing but nested LIST headers: without the depth cap
    // this recursed once per level and overflowed the stack (which
    // NonFatal does NOT catch, so it escaped tryDecodeAvi's total
    // contract and failed the task). With the cap the walk skips levels
    // past MaxRiffDepth and returns None like any other sniff-passing
    // garbage.
    val levels = 50000
    // sizes inside-out: innermost LIST body is just its 4-byte type;
    // each enclosing body adds an 8-byte header
    val sizes = new Array[Int](levels)
    sizes(levels - 1) = 4
    for (i <- (levels - 2) to 0 by -1) sizes(i) = 4 + 8 + sizes(i + 1)
    val bos = new java.io.ByteArrayOutputStream()
    def cc(s: String): Unit = bos.write(s.getBytes("ISO-8859-1"))
    def le32(v: Int): Unit = {
      bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF)
      bos.write((v >> 16) & 0xFF); bos.write((v >> 24) & 0xFF)
    }
    cc("RIFF"); le32(4 + 8 + sizes(0)); cc("AVI ")
    (0 until levels).foreach { i => cc("LIST"); le32(sizes(i)); cc("nest") }
    val payload = bos.toByteArray
    assert(Multimodal.looksLikeAvi(payload))
    assert(Multimodal.tryDecodeAvi(payload).isEmpty,
      "deep-nested LIST payload must decode to None, not overflow the stack")
  }

  test("sniff-passing garbage bodies fall back to the stub instead of throwing (ADVICE r6)") {
    // realistic corpus text that PASSES the magic sniff: 'BM25...' sniffs
    // as BMP, 'GIF89a...' prose sniffs as GIF — the JDK readers THROW on
    // the garbage body (they don't return null), and the decode must stay
    // total: fall through to the hash stub, never fail the job.
    val corrupt = Seq(
      (0L, "BM25 is a ranking function used by search engines"),
      (1L, "GIF89a was superseded but this is just prose about it"),
      (2L, Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0D, 0x0A, 0x1A, 0x0A, 7, 7)
        .map(_.toByte).map(_.toChar).mkString) // PNG magic, truncated body
    ).toDF("doc_id", "text")
    val withPayload = Multimodal.attachPayload(corrupt, "doc_id", "text")
      .withColumn("media_type", lit("image"))
    corrupt.collect().foreach { r =>
      val bytes = r.getString(1).map(_.toByte).toArray
      if (Multimodal.looksLikeImage(bytes))
        assert(Multimodal.tryDecodeImage(bytes).isEmpty,
          s"garbage sniff-passer must decode to None, not throw: ${r.getLong(0)}")
    }
    val out = Multimodal.decodeBatches(spark, withPayload, "doc_id").collect()
    assert(out.length == 3)
    out.foreach { r =>
      val want = Multimodal.stubDecode(r.sha256, "image")
      assert(r.meta == want, s"sniff-passing garbage must stub-decode: ${r.doc_id}")
    }
  }

  test("looksLikeImage sniffs magic bytes without a decoder probe") {
    assert(Multimodal.looksLikeImage(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)))
    assert(Multimodal.looksLikeImage(Array(0xFF, 0xD8, 0xFF, 0xE0, 0, 0, 0, 0).map(_.toByte)))
    assert(Multimodal.looksLikeImage("GIF89a##".getBytes("ISO-8859-1")))
    assert(Multimodal.looksLikeImage("BM######".getBytes("ISO-8859-1")))
    assert(!Multimodal.looksLikeImage("plain text payload".getBytes("UTF-8")))
    assert(!Multimodal.looksLikeImage(Array[Byte](0x89.toByte))) // too short
  }

  test("sampleFrameIndices: k deterministic indices within [0, n_frames) (M-frames)") {
    val decoded = Multimodal.decodeBatches(spark,
      Multimodal.attachPayload(docs, "doc_id", "text"), "doc_id").toDF()
      .join(Multimodal.attachPayload(docs, "doc_id", "text").select("doc_id", "payload"), "doc_id")
    val out = Multimodal.sampleFrameIndices(decoded, 4)
      .select(col("doc_id"), col("frame_indices"), col("meta.n_frames").as("nf"))
      .collect()
    out.foreach { r =>
      val idx = r.getSeq[Long](1)
      val nf = math.max(r.getInt(2).toLong, 1L)
      assert(idx.length == 4)
      idx.foreach(i => assert(i >= 0 && i < nf, s"index $i out of [0,$nf)"))
    }
  }
}
