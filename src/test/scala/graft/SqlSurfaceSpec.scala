package graft

import org.apache.spark.sql.functions._

/** The free SQL front-end: `Tables.registerAll` + `spark.sql` must agree
  * with the typed DataFrame surface on the same scans.
  */
class SqlSurfaceSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("registerAll exposes every table; SQL join+agg matches the DataFrame API") {
    Tables.registerAll(spark, sf)
    assert(Tables.AllNames.forall(spark.catalog.tableExists))
    val viaSql = spark.sql(
      """SELECT c.c_mktsegment AS seg, count(*) AS n, round(avg(o.o_totalprice), 4) AS avg_price
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment""".stripMargin)
      .orderBy("seg").collect().map(_.toString).toSeq
    val viaApi = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"))
      .agg(count(lit(1)).as("n"), round(avg(col("o_totalprice")), 4).as("avg_price"))
      .orderBy("seg").collect().map(_.toString).toSeq
    assert(viaSql == viaApi)
  }

  test("SQL CTE + window functions run over the registered views") {
    Tables.registerAll(spark, sf)
    val top = spark.sql(
      """WITH ranked AS (
        |  SELECT o_custkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rn
        |  FROM orders)
        |SELECT count(*) AS n FROM ranked WHERE rn = 1""".stripMargin)
      .head.getLong(0)
    val expect = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(top == expect)
  }
}
