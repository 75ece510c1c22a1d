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

  test("payload structs carry the pair's two rows (sides aligned by block, not id)") {
    val df = (1 to 10).map(i => (i.toLong, i * 100)).toDF("id", "v")
    val ok = Pairs.blockedPairs(df, "id", 4)
      .selectExpr("id_1", "id_2", "s_1.id AS a", "s_2.id AS b")
      .collect()
      .forall(r => Set(r.getLong(2), r.getLong(3)) == Set(r.getLong(0), r.getLong(1)))
    assert(ok, "each pair's payloads must be exactly its two member rows")
  }
}
