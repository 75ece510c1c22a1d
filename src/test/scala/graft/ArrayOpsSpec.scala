package graft

import graft.functions.ArrayOps
import org.apache.spark.sql.functions._

/** SortedIntersectSize: codegen'd two-pointer kernel vs known answers,
  * exercised through both the whole-stage-codegen and interpreted paths.
  */
class ArrayOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val cases = Seq(
    (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L), 2L),
    (Seq.empty[Long], Seq(1L, 2L), 0L),
    (Seq(1L, 2L), Seq.empty[Long], 0L),
    (Seq(1L, 5L, 9L), Seq(2L, 6L, 10L), 0L),
    (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 3L),
    (Seq(1L, 1L, 2L), Seq(1L, 1L, 3L), 2L), // duplicates count per matched occurrence
    (Seq(-5L, 0L, 7L), Seq(-5L, 7L, 8L), 2L)
  )

  private def run(): Seq[(Long, Long)] =
    cases.toDF("a", "b", "want")
      .select(ArrayOps.sortedIntersectSize(col("a"), col("b")).as("got"), col("want"))
      .as[(Long, Long)].collect().toSeq

  test("two-pointer merge matches expected sizes (codegen path)") {
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    run().foreach { case (got, want) => assert(got == want) }
  }

  test("interpreted path (nullSafeEval) agrees with codegen") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try run().foreach { case (got, want) => assert(got == want) }
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("null inputs yield null (nullIntolerant)") {
    val df = Seq((Some(Seq(1L)), None: Option[Seq[Long]])).toDF("a", "b")
    assert(df.select(ArrayOps.sortedIntersectSize(col("a"), col("b"))).collect()(0).isNullAt(0))
  }
}
