package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._

/** H1 — rank-fusion retrieval: candidate-list ranking and reciprocal-rank
  * fusion (Cormack et al. 2009).
  */
class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  test("topKRanked: global top-k by (score DESC, id ASC) with 1-based ranks") {
    val scored = Seq((1L, 0.5), (2L, 0.9), (3L, 0.9), (4L, 0.1), (5L, 0.7))
      .toDF("id", "score")
    val got = Retrieval.topKRanked(scored, "id", "score", 3)
      .as[(Long, Long)].collect().toList.sortBy(_._2)
    // 0.9 ties break by id: 2 before 3; 0.7 third; 0.5/0.1 cut
    assert(got == List((2L, 1L), (3L, 2L), (5L, 3L)))
  }

  test("rrfFuse: fused score sums 1/(k0+rank) over the lists that retrieved the id") {
    val a = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("id", "rank")
    val b = Seq((11L, 1L), (13L, 2L)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), "id", k0 = 60, topK = 10)
      .as[(Long, Double, Long)].collect().toList
    def r(x: Double) = math.round(x * 1e6) / 1e6
    val want = List( // consensus id 11 outranks both systems' solo #1s
      (11L, r(1.0 / 62 + 1.0 / 61), 2L),
      (10L, r(1.0 / 61), 1L),
      (13L, r(1.0 / 62), 1L),
      (12L, r(1.0 / 63), 1L))
    assert(got == want, s"got $got")
  }

  test("rrfFuse: fused-score ties break by id ascending; topK cuts after sort") {
    val a = Seq((5L, 1L), (9L, 2L)).toDF("id", "rank")
    val b = Seq((9L, 1L), (5L, 2L)).toDF("id", "rank") // symmetric ranks → tied
    val got = Retrieval.rrfFuse(Seq(a, b), "id", k0 = 60, topK = 1)
      .as[(Long, Double, Long)].collect().toList
    assert(got.map(_._1) == List(5L), "tie must break to the smaller id")
  }
}
