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
