package graft

import graft.operators.CustomAgg

/** G3 arbitrary-function aggregate surface (typed Aggregator). */
class CustomAggSpec extends SparkTestBase {
  import spark.implicits._

  private def df = Seq(Some(2.0), Some(8.0), None, Some(4.0)).toDF("v")

  test("midrange/spread: distributed fold matches the driver-side definition") {
    val out = CustomAgg.customGlobalAgg(df, Seq(
      ("midrange", "v", CustomAgg.midrange),
      ("spread", "v", CustomAgg.spread))).collect()(0)
    assert(out.getDouble(0) == 5.0 && out.getDouble(1) == 6.0)
    assert(out.schema.fieldNames.toSeq == Seq("midrange_v", "spread_v"),
      "reference {fn}_{col} naming")
  }

  test("nulls are skipped before reduce (dataframe.py:48 semantics)") {
    val allNull = Seq(None: Option[Double], None).toDF("v")
    val out = CustomAgg.customGlobalAgg(allNull, Seq(("midrange", "v", CustomAgg.midrange)))
      .collect()(0)
    assert(out.isNullAt(0), "empty fold -> null, not a sentinel")
  }

  test("geomean: multiplicative fold, non-positive values excluded") {
    val t = Seq(1.0, 10.0, 100.0, -5.0, 0.0).map(Option(_)).toDF("v")
    val out = CustomAgg.customGlobalAgg(t, Seq(("geomean", "v", CustomAgg.geomean)))
      .collect()(0).getDouble(0)
    assert(approx(out, 10.0, 1e-9), "geomean(1,10,100) = 10")
  }

  test("fold result is partition-count invariant (merge correctness)") {
    val t = (1 to 1000).map(i => Option(i.toDouble)).toDF("v")
    val one = CustomAgg.customGlobalAgg(t.coalesce(1),
      Seq(("midrange", "v", CustomAgg.midrange))).collect()(0).getDouble(0)
    val many = CustomAgg.customGlobalAgg(t.repartition(13),
      Seq(("midrange", "v", CustomAgg.midrange))).collect()(0).getDouble(0)
    assert(one == many && one == 500.5)
  }

  test("customGroupAgg: per-group folds, null keys form their own group") {
    val t = Seq(("a", Some(2.0)), ("a", Some(8.0)), ("b", Some(3.0)),
      (null, Some(10.0)), (null, None)).toDF("k", "v")
    val out = CustomAgg.customGroupAgg(t, Seq("k"), Seq(
      ("midrange", "v", CustomAgg.midrange),
      ("spread", "v", CustomAgg.spread)))
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getDouble(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(out == Set(("a", 5.0, 6.0), ("b", 3.0, 0.0), (null, 10.0, 0.0)))
  }

  test("customGroupAgg is partition-count invariant (per-group merge correctness)") {
    val t = (1 to 1000).map(i => (i % 3, Option(i.toDouble))).toDF("k", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      CustomAgg.customGroupAgg(d, Seq("k"), Seq(("midrange", "v", CustomAgg.midrange)))
        .collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(run(t.coalesce(1)) == run(t.repartition(13)))
  }

  test("fromFold builds ad-hoc aggregates (the arbitrary-callable entry point)") {
    val countEven = CustomAgg.fromFold[Long](
      z = 0L,
      red = (n, v) => if (v % 2 == 0) n + 1 else n,
      mrg = _ + _,
      fin = n => Some(n.toDouble))
    val out = CustomAgg.customGlobalAgg((1 to 10).map(i => Option(i.toDouble)).toDF("v"),
      Seq(("count_even", "v", countEven))).collect()(0).getDouble(0)
    assert(out == 5.0)
  }
}
