package graft.operators

import graft.functions.{Text, Vectors}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, exact n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design (the whole point of these ops is the 100 TB corpus case):
  *   - exact dedup shuffles a 16-byte fingerprint, never document bodies;
  *   - MinHash reduces each document to a fixed 64-long signature before
  *     any pairwise work; candidate generation is an equi-join on band
  *     hashes (shuffle co-locates only colliding docs);
  *   - nothing here is O(n²) except the explicitly-exact verification of
  *     LSH candidates, which is O(candidates) not O(pairs).
  */
object Dedup {

  /** Exact dedup, canonical representative per duplicate class: groups by
    * [[Text.fingerprint]] and keeps the lowest id. Output: one row per
    * class with its size. Deterministic (min id), single shuffle of
    * (fingerprint, id) pairs only.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(Text.fingerprint(col(textCol)).as("fingerprint"), col(idCol))
      .groupBy("fingerprint")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))

  /** MinHash signature: `perms` independent min-hashes over the document's
    * word-`n`-gram shingle set. Computed WITHOUT exploding — no shuffle at
    * all for signature construction — in two projections:
    *
    *   1. ONE xxhash64 per shingle, materialized as a long array. Keeping
    *      this in its own projection (a non-cheap alias referenced `perms`
    *      times, which CollapseProject refuses to inline) is load-bearing:
    *      inlining the full shingle pipeline into every signature column
    *      builds a multi-MB expression tree whose optimizer + codegen cost
    *      alone runs to minutes.
    *   2. permutation p = min over xxhash64(p, baseHash) — re-hashing an
    *      8-byte long per element instead of re-shingling and re-hashing
    *      the document text. (Not an affine `a*h+b` map only because ANSI
    *      mode rejects the intentional wraparound multiply.)
    *
    * Any fixed hash family gives a valid MinHash; signature VALUES are an
    * internal detail (candidates are re-verified with exact Jaccard).
    */
  def minhashSignature(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, perms: Int = 64): DataFrame = {
    val hashed = df.select(col(idCol),
      transform(Text.wordShingles(col(textCol), n), s => xxhash64(s)).as("hs"))
    val sigCols = (0 until perms).map { p =>
      array_min(transform(col("hs"), h => xxhash64(lit(p), h))).as(s"mh_$p")
    }
    hashed.select((col(idCol) +: sigCols): _*)
  }

  /** LSH near-duplicate pairs via banded MinHash + exact-Jaccard
    * verification. `bands` × `rowsPerBand` must equal `perms`. A pair is a
    * candidate iff some band of the signature matches exactly; candidates
    * are then verified with the TRUE shingle-set Jaccard so the output
    * contains no false positives (recall is the standard LSH S-curve:
    * P[candidate] = 1-(1-j^r)^b).
    *
    * Default banding 32×2: recall at j = 0.5 is 1-(0.75)³² ≈ 0.9999 and →1
    * above — effectively exact at the threshold, rather than the ~64%
    * a 16×4 curve gives at j = 0.5. The wider low-j candidate tail this
    * trades for is bounded by the exact-verify step.
    *
    * Output: (id_1, id_2, jaccard) with id_1 < id_2, jaccard rounded to 6.
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      threshold: Double, n: Int = 3,
                      bands: Int = 32, rowsPerBand: Int = 2): DataFrame = {
    val perms = bands * rowsPerBand
    val sig = minhashSignature(df, idCol, textCol, n, perms)
    // one row per (doc, band): band key = hash of the band's minhashes
    val bandRows = sig.select(
      col(idCol),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          hash((b * rowsPerBand until (b + 1) * rowsPerBand).map(p => col(s"mh_$p")): _*)
            .as("bkey"))
      }: _*)).as("bd"))
      .select(col(idCol), col("bd.band"), col("bd.bkey"))
    val l = bandRows.select(col(idCol).as("id_1"), col("band"), col("bkey"))
    val r = bandRows.select(col(idCol).as("id_2"), col("band"), col("bkey"))
    val candidates = l.join(r, Seq("band", "bkey"))
      .filter(col("id_1") < col("id_2"))
      .select("id_1", "id_2").distinct()
    val shingled = df.select(col(idCol), Text.wordShingles(col(textCol), n).as("sh"))
    val verified = candidates
      .join(shingled.select(col(idCol).as("id_1"), col("sh").as("sh_1")), "id_1")
      .join(shingled.select(col(idCol).as("id_2"), col("sh").as("sh_2")), "id_2")
      .withColumn("inter", size(array_intersect(col("sh_1"), col("sh_2"))).cast("double"))
      .withColumn("uni", (size(col("sh_1")) + size(col("sh_2")) - col("inter")).cast("double"))
      .withColumn("jaccard", round(when(col("uni") > 0, col("inter") / col("uni")).otherwise(0.0), 6))
    verified.filter(col("jaccard") >= threshold).select("id_1", "id_2", "jaccard")
  }

  /** Exact word-n-gram Jaccard similarity for ALL pairs above `threshold`,
    * via an inverted shingle index: explode shingles, self-join on shingle,
    * count co-occurrences, derive |A∪B| = |A|+|B|-|A∩B|. Exact (no LSH
    * recall loss); cost is Σ_s freq(s)² over shingles — scalable when no
    * shingle is hot (drop ubiquitous shingles upstream if they are).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double): DataFrame = {
    // The inverted index joins on an 8-byte xxhash64 of the shingle, not
    // the shingle string: the self-join shuffles/broadcasts fixed-width
    // longs instead of text. (A 64-bit collision between two DISTINCT
    // shingles co-occurring in the same doc pair is the only way this can
    // differ from string keys — negligible and accepted.)
    val inv = df
      .select(col(idCol).as("id"), Text.wordShingles(col(textCol), n).as("sh"))
      .select(col("id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("s"))
      .select(col("id"), col("n_sh"), xxhash64(col("s")).as("sk"))
    val a = inv.select(col("id").as("id_1"), col("n_sh").as("n_1"), col("sk"))
    val b = inv.select(col("id").as("id_2"), col("n_sh").as("n_2"), col("sk"))
    a.join(b, "sk")
      .filter(col("id_1") < col("id_2"))
      .groupBy("id_1", "id_2", "n_1", "n_2")
      .agg(count(lit(1)).cast("double").as("inter"))
      .withColumn("jaccard",
        round(col("inter") / (col("n_1") + col("n_2") - col("inter")), 6))
      .filter(col("jaccard") >= threshold)
      .select("id_1", "id_2", "jaccard")
  }

  /** 64-bit SimHash over whitespace tokens: bit i of the sketch is the sign
    * of Σ_tokens (bit i of xxhash64(token) ? +1 : -1). Near-dup docs differ
    * in few bits (small Hamming distance). Computed per-row with array
    * expressions — no explode, no shuffle.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = array_distinct(split(lower(trim(col(textCol))), "\\s+"))
    val hashes = transform(toks, t => xxhash64(t))
    val sketch = (0 until 64).map { i =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << i)) =!= 0L, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
    df.select(col(idCol), sketch.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, banded into
    * 4×16-bit chunks for candidate generation (a pair within Hamming ≤ 3 of
    * a 64-bit sketch must agree exactly on ≥1 of 4 chunks — pigeonhole, so
    * recall is 100% for maxHamming ≤ 3).
    */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk banding guarantees recall only for maxHamming <= 3")
    val sh = simhash(df, idCol, textCol)
    val chunked = sh.select(
      col(idCol), col("simhash"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL)).as("ckey"))
      }: _*)).as("cd"))
      .select(col(idCol), col("simhash"), col("cd.chunk"), col("cd.ckey"))
    val l = chunked.select(col(idCol).as("id_1"), col("simhash").as("sh_1"), col("chunk"), col("ckey"))
    val r = chunked.select(col(idCol).as("id_2"), col("simhash").as("sh_2"), col("chunk"), col("ckey"))
    l.join(r, Seq("chunk", "ckey"))
      .filter(col("id_1") < col("id_2"))
      .select(col("id_1"), col("id_2"),
        bit_count(col("sh_1").bitwiseXOR(col("sh_2"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding-cosine near-duplicate pairs, EXACT all-pairs formulation:
    * self-join id_1 < id_2 with the codegen'd cosine expression. Quadratic
    * by definition — appropriate for verification scale or a pre-bucketed
    * corpus; the scale path is [[Similarity.lshCandidates]] feeding this
    * verification. Output cosine rounded to 6.
    */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_1"), col(vecCol).as("v_1"))
    val b = df.select(col(idCol).as("id_2"), col(vecCol).as("v_2"))
    a.join(broadcast(b), col("id_1") < col("id_2"))
      .withColumn("cosine", round(Vectors.cosine(col("v_1"), col("v_2")), 6))
      .filter(col("cosine") >= threshold)
      .select("id_1", "id_2", "cosine")
  }
}
