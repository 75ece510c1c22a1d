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

  test("forward-fill is idempotent (SURVEY §5.3)") {
    import graft.operators.Analytics
    check("ffill-idempotent", Prop.forAll(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 3), Gen.choose(0, 20),
        Gen.option(Gen.choose(-50.0, 50.0))))) { xs =>
      val df = xs.zipWithIndex.map { case ((k, o, v), i) => (k, o, i, v) }
        .toDF("k", "o", "tb", "v")
      val once = Analytics.forwardFill(df, "k", Seq("o", "tb"), "v", "f")
      val twice = Analytics.forwardFill(once.drop("v").withColumnRenamed("f", "v"),
        "k", Seq("o", "tb"), "v", "f")
      def canon(d: org.apache.spark.sql.DataFrame) =
        d.select("k", "o", "tb", "f").collect().map(_.toString).sorted.toSeq
      canon(once) == canon(twice)
    }, samples = 4)
  }

  test("repetitionScore stays in [0,1] for arbitrary text") {
    import graft.functions.Text
    check("repetition-bounds", Prop.forAll(Gen.listOfN(6, Gen.asciiPrintableStr)) { ss =>
      val scores = ss.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "text")
        .select(Text.repetitionScore(col("text")).as("r"))
        .collect().map(_.getDouble(0))
      scores.forall(r => r >= 0.0 && r <= 1.0)
    }, samples = 4)
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

  test("int8 quantization is scale-invariant (symmetric quantizer property)") {
    import graft.operators.Similarity
    check("q8-scale-invariant", Prop.forAll(
      Gen.nonEmptyListOf(Gen.choose(-8.0f, 8.0f)).suchThat(_.exists(_ != 0.0f)),
      Gen.oneOf(0.5f, 2.0f, 16.0f)) { (v, c) =>
      def codes(vec: Seq[Float]) =
        Similarity.quantizeInt8(Seq((1L, vec.toArray)).toDF("id", "vec"), "id", "vec")
          .collect()(0).getAs[Array[Byte]]("q8").toSeq
      codes(v) == codes(v.map(_ * c))
    }, samples = 4)
  }

  test("histogram bin counts sum to the in-range row count") {
    import graft.operators.Analytics
    check("histogram-total", Prop.forAll(
      Gen.nonEmptyListOf(Gen.choose(-5.0, 25.0))) { xs =>
      val df = xs.toDF("v")
      val binned = Analytics.histogram(df, "v", 0.0, 5.0, 4)
        .agg(coalesce(sum("n"), lit(0L))).collect()(0).getLong(0)
      binned == xs.count(x => x >= 0.0 && x < 20.0)
    })
  }
}
