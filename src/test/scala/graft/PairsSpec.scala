package graft

import graft.operators.Pairs

/** Blocked all-pairs plan: every unordered pair exactly once, any B. */
class PairsSpec extends SparkTestBase {
  import spark.implicits._

  test("blockedPairs emits each unordered pair exactly once for B in {1,3,7,32}") {
    val n = 30
    val df = (1 to n).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
    val want = (for { i <- 1 to n; j <- i + 1 to n } yield (i.toLong, j.toLong)).toSet
    for (b <- Seq(1, 3, 7, 32)) {
      val got = Pairs.blockedPairs(df, "id", b)
        .select("id_1", "id_2").as[(Long, Long)].collect()
      assert(got.length == want.size, s"B=$b: ${got.length} pairs, expected ${want.size}")
      assert(got.toSet == want, s"B=$b: pair set mismatch")
    }
  }

  test("null ids are excluded — no self-pairs or dropped pairs from null comparisons") {
    val df = Seq(Some(1L), Some(2L), Some(3L), None, None)
      .map(id => (id, "p")).toDF("id", "payload")
    val got = Pairs.blockedPairs(df, "id", 3)
      .select("id_1", "id_2").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      "null-id rows must not produce pairs (nor id_1 == id_2 artifacts)")
  }

  test("autoBlocks: per-block rows stay bounded as n grows; parallelism floor; caps honored") {
    // memory bound: block size n/B never exceeds rowsPerBlock
    for (n <- Seq(10L, 8192L, 81920L, 1000000L)) {
      val b = Pairs.autoBlocks(n, rowsPerBlock = 8192, taskSlots = 32)
      assert(b >= 1 && b <= 4096)
      if (n / b > 0) assert((n + b - 1) / b <= 8192, s"n=$n B=$b: block too big")
    }
    // a 10x corpus must NOT keep the same B (the silent-memory-blowup case)
    val b1 = Pairs.autoBlocks(100000L, rowsPerBlock = 8192, taskSlots = 32)
    val b10 = Pairs.autoBlocks(1000000L, rowsPerBlock = 8192, taskSlots = 32)
    assert(b10 >= 10 * b1 / 2, s"B must scale with n: B(100k)=$b1 B(1M)=$b10")
    // parallelism floor: B(B+1)/2 >= taskSlots even for small corpora
    val bs = Pairs.autoBlocks(100L, rowsPerBlock = 8192, taskSlots = 32)
    assert(bs.toLong * (bs + 1) / 2 >= 32, s"B=$bs: too few block-pair keys for 32 slots")
    // degenerate inputs
    assert(Pairs.autoBlocks(0L) == 1 && Pairs.autoBlocks(1L) == 1)
    // B never exceeds n (no point making empty blocks)
    assert(Pairs.autoBlocks(5L, rowsPerBlock = 1, taskSlots = 32) <= 5)
    // hard cap at 4096 for corpus sizes where all-pairs is infeasible anyway
    assert(Pairs.autoBlocks(1000000000L, rowsPerBlock = 8192) == 4096)
  }

  test("payload structs carry the pair's two rows (sides aligned by block, not id)") {
    val df = (1 to 10).map(i => (i.toLong, i * 100)).toDF("id", "v")
    val ok = Pairs.blockedPairs(df, "id", 4)
      .selectExpr("id_1", "id_2", "s_1.id AS a", "s_2.id AS b")
      .collect()
      .forall(r => Set(r.getLong(2), r.getLong(3)) == Set(r.getLong(0), r.getLong(1)))
    assert(ok, "each pair's payloads must be exactly its two member rows")
  }
}
