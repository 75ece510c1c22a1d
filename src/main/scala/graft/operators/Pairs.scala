package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Block-partitioned exact all-pairs generation — the scale-safe plan for
  * exact pairwise operators (exact n-gram Jaccard, exact cosine threshold
  * join) whose OUTPUT is inherently quadratic in the worst case.
  *
  * The naive formulations are a cartesian/broadcast-nested-loop join, which
  * ships the whole corpus to every executor (memory blowup) and computes
  * the n² pairs wherever the broadcast landed. This operator instead:
  *
  *   - assigns each row a block `b = pmod(hash(id), B)`;
  *   - emits each row under every block-pair key `(lo, hi)` it can
  *     participate in: the `lo` side keeps rows with `b == lo`, the `hi`
  *     side rows with `b == hi`, so row u is replicated exactly B times;
  *   - a plain shuffled EQUI-join on `(lo, hi)` then yields every unordered
  *     pair exactly once — pair (u, v) appears only under key
  *     (min(b_u,b_v), max(b_u,b_v)); same-block pairs are halved by id<.
  *
  * Properties at scale: shuffle volume is B× the (reduced) row payload —
  * never the full corpus per executor; per-task memory is two blocks;
  * compute is the unavoidable n²/2 pair evaluations spread over B(B+1)/2
  * independent keys. Choose B so a block fits comfortably in executor
  * memory and B(B+1)/2 ≳ the cluster's task slots.
  *
  * Output columns: `id_1 < id_2` (least/greatest of the pair's ids) and
  * payload structs `s_1`/`s_2` with all input columns. NOTE: `s_1` is NOT
  * guaranteed to belong to `id_1` — sides are aligned by block, not id —
  * so use this only with SYMMETRIC pair functions (intersection, cosine,
  * distance), which is what every set/vector similarity here is.
  */
object Pairs {

  /** Derive a block count from the input size: keeps the PER-TASK working
    * set (two blocks) roughly constant as the corpus grows — a fixed B
    * silently multiplies per-task memory by the corpus growth factor (10×
    * rows at B=16 means 10× the rows per block). Two lower bounds compose:
    *
    *   - memory: `ceil(n / rowsPerBlock)` so a block stays ≤ rowsPerBlock
    *     rows (size rowsPerBlock for the payload: ~8 KB-row shingle sets
    *     and ~1 KB-row embeddings both fit a few-hundred-MB task at the
    *     8192 default);
    *   - parallelism: smallest B with B(B+1)/2 ≥ taskSlots so the
    *     block-pair keys can occupy every core even on small corpora.
    *
    * Capped at min(n, 4096): B beyond n only makes empty blocks, and the
    * B× replication factor (shuffle volume = B·n rows) should not grow
    * unboundedly — past the cap the quadratic pair COUNT is the binding
    * constraint anyway, and the sparse/LSH variants are the right tool.
    */
  def autoBlocks(n: Long, rowsPerBlock: Long = 8192, taskSlots: Int = 32): Int = {
    require(rowsPerBlock >= 1, "autoBlocks: rowsPerBlock must be >= 1")
    if (n <= 1) 1
    else {
      val memB = (n + rowsPerBlock - 1) / rowsPerBlock
      val parB = math.ceil((math.sqrt(8.0 * math.max(taskSlots, 1) + 1) - 1) / 2).toLong
      math.min(math.max(memB, parB), math.min(n, 4096L)).toInt
    }
  }

  def blockedPairs(df: DataFrame, idCol: String, blocks: Int): DataFrame = {
    require(blocks >= 1, "blockedPairs: blocks must be >= 1")
    val payload = struct(df.columns.toIndexedSeq.map(col): _*)
    // null ids are excluded up front: a null id breaks pair dedup (`_ida <
    // _idb` is null-false, so same-block null pairs vanish while cross-block
    // ones survive with least/greatest collapsing to the one non-null id) —
    // every downstream dedup operator assumes well-formed non-null ids.
    val withB = df.filter(col(idCol).isNotNull)
      .select(pmod(hash(col(idCol)), lit(blocks)).as("_b"),
        col(idCol).as("_id"), payload.as("_s"))
    // lo side: row participates in keys (b, r) for r >= b
    val lo = withB
      .withColumn("_hi", explode(sequence(col("_b"), lit(blocks - 1))))
      .select(col("_b").as("_lo"), col("_hi"), col("_id").as("_ida"), col("_s").as("s_1"))
    // hi side: row participates in keys (r, b) for r <= b
    val hi = withB
      .withColumn("_lo", explode(sequence(lit(0), col("_b"))))
      .select(col("_lo"), col("_b").as("_hi"), col("_id").as("_idb"), col("_s").as("s_2"))
    lo.join(hi, Seq("_lo", "_hi"))
      // same-block key would otherwise emit (u,v) and (v,u) plus (u,u)
      .filter(col("_lo") =!= col("_hi") || col("_ida") < col("_idb"))
      .select(least(col("_ida"), col("_idb")).as("id_1"),
        greatest(col("_ida"), col("_idb")).as("id_2"),
        col("s_1"), col("s_2"))
  }
}
