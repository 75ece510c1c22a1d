package graft

import graft.operators.Chunking

/** Chunk-boundary semantics: coverage, overlap, tails, degenerate docs. */
class ChunkingSpec extends SparkTestBase {
  import spark.implicits._

  test("chunkByChars: stride walk covers every character; overlap is exact (T15)") {
    val text = ('a' to 'z').mkString // 26 chars
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val out = Chunking.chunkByChars(df, "doc_id", "text", chunkChars = 10, overlapChars = 4)
      .select("chunk_id", "chunk_start", "chunk").as[(Long, Long, String)]
      .collect().sortBy(_._1).toSeq
    // stride 6: starts 1, 7, 13, 19 (cap = len-overlap = 22 → last start 19)
    assert(out.map(_._2) == Seq(1L, 7L, 13L, 19L))
    assert(out.map(_._3) == Seq("abcdefghij", "ghijklmnop", "mnopqrstuv", "stuvwxyz"))
    // every adjacent pair overlaps by exactly overlapChars (except the tail,
    // which still starts overlap chars before the previous chunk's end)
    assert(out.sliding(2).forall { case Seq(a, b) => a._3.takeRight(4) == b._3.take(4) })
    // full coverage: concatenating chunk strides reconstructs the document
    val rebuilt = out.head._3 + out.tail.map(_._3.drop(4)).mkString
    assert(rebuilt == text, s"stride concatenation must rebuild the doc: $rebuilt")
  }

  test("chunkByChars: short, exact-fit, empty, and null documents (T15 edges)") {
    val df = Seq(
      (1L, "tiny"),              // shorter than one chunk
      (2L, "x" * 10),            // exactly one chunk
      (3L, ""),                  // empty → no rows
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Chunking.chunkByChars(df, "doc_id", "text", 10, 3)
      .select("doc_id", "chunk_id", "chunk").as[(Long, Long, String)].collect()
    assert(out.toSet == Set((1L, 0L, "tiny"), (2L, 0L, "x" * 10)),
      s"one whole-doc chunk for short/exact docs, nothing for empty/null: ${out.toSeq}")
  }

  test("chunkByTokens: token windows with exact overlap; counts and tails correct (T15b)") {
    val words = (1 to 10).map(i => s"w$i")
    val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val out = Chunking.chunkByTokens(df, "doc_id", "text", chunkTokens = 4, overlapTokens = 1)
      .select("chunk_id", "tok_start", "n_tokens", "chunk")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    // stride 3: starts 1, 4, 7 (cap = n - overlap = 9)
    assert(out.map(_._2) == Seq(1L, 4L, 7L))
    assert(out.map(_._4) == Seq("w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    assert(out.map(_._3) == Seq(4L, 4L, 4L))
    // dropping each chunk's overlap prefix rebuilds the token sequence
    val rebuilt = out.head._4.split(" ") ++ out.tail.flatMap(_._4.split(" ").drop(1))
    assert(rebuilt.toSeq == words)
    // whitespace runs normalize: the chunk is a token window, not a substring
    val messy = Seq((2L, "a  b\t c")).toDF("doc_id", "text")
    val m = Chunking.chunkByTokens(messy, "doc_id", "text", 5, 0)
      .select("chunk").as[String].collect()
    assert(m.toSeq == Seq("a b c"))
  }

  test("chunkByChars: zero overlap partitions the text exactly") {
    val df = Seq((1L, "0123456789ABCDEF")).toDF("doc_id", "text") // 16 chars
    val out = Chunking.chunkByChars(df, "doc_id", "text", 5, 0)
      .select("chunk").as[String].collect().toSeq
    assert(out.sorted == Seq("01234", "56789", "ABCDE", "F").sorted)
    assert(out.mkString.length == 16, "no char lost or duplicated")
  }
}
