package graft

import graft.operators.{Agg, Pairs}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** SURVEY §5.3 algebraic invariants, scalacheck-driven (raw scalacheck —
  * the scalatestplus bridge isn't in the offline cache). Sample counts kept
  * small: each sample is a Spark job.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def check(name: String, p: Prop, samples: Int = 5): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(samples).withMaxSize(40), p)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("groupBy sums are partition-invariant") {
    check("sum-partition-invariant", Prop.forAll(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 5), Gen.choose(-100L, 100L)))) { xs =>
      val df = xs.toDF("k", "v")
      def sums(p: Int) = Agg.groupAgg(df.repartition(p), Seq("k"), Seq("v" -> Seq("sum")))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      sums(1) == sums(7)
    })
  }

  test("|inner join| equals sum of key-multiplicity products") {
    check("join-cardinality", Prop.forAll(
      Gen.nonEmptyListOf(Gen.choose(0, 4)), Gen.nonEmptyListOf(Gen.choose(0, 4))) { (ls, rs) =>
      val joined = ls.toDF("k")
        .join(rs.toDF("k").withColumnRenamed("k", "rk"), col("k") === col("rk")).count()
      val expect = ls.groupBy(identity).map { case (k, g) =>
        g.size.toLong * rs.count(_ == k)
      }.sum
      joined == expect
    })
  }

  test("blockedPairs covers all C(n,2) pairs exactly once for random n and B") {
    check("blocked-pairs-coverage", Prop.forAll(
      Gen.choose(2, 25), Gen.choose(1, 10)) { (n, b) =>
      val got = Pairs.blockedPairs((1 to n).map(_.toLong).toDF("id"), "id", b)
        .select("id_1", "id_2").as[(Long, Long)].collect()
      got.length == n * (n - 1) / 2 && got.distinct.length == got.length
    })
  }

  test("filter conjunction decomposes") {
    check("filter-conjunction", Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-50, 50))) { xs =>
      val df = xs.toDF("v")
      df.filter(col("v") > -10).filter(col("v") < 10).count() ==
        df.filter(col("v") > -10 && col("v") < 10).count()
    })
  }
}
