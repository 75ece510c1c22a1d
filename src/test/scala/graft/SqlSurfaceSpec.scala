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

  test("registered graft_* SQL functions expose the native kernels to SQL users") {
    graft.plans.GraftExtensions.registerFunctions(spark)
    Tables.registerAll(spark, sf)
    val viaSql = spark.sql(
      """SELECT a.vec_id AS id_1, b.vec_id AS id_2,
        |       round(graft_cosine(a.embedding, b.embedding), 6) AS cosine,
        |       graft_byte_dot(
        |         graft_pack_int8(transform(a.embedding, x -> CAST(round(x * 10, 0) AS INT))),
        |         graft_pack_int8(transform(b.embedding, x -> CAST(round(x * 10, 0) AS INT)))) AS q
        |FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id = 1""".stripMargin)
      .collect()(0)
    val emb = Tables.embeddings(spark, sf)
    val viaApi = emb.filter(col("vec_id") === 0).crossJoin(
        emb.filter(col("vec_id") === 1).select(col("embedding").as("e2")))
      .select(round(graft.functions.Vectors.cosine(col("embedding"), col("e2")), 6))
      .collect()(0).getDouble(0)
    assert(viaSql.getDouble(2) == viaApi, "SQL function = native expression, same value")
    assert(!viaSql.isNullAt(3), "packed int8 pipeline composes inside SQL")
    // the registry rejects wrong arities with a clear message
    val e = intercept[Exception](spark.sql("SELECT graft_cosine(array(1.0f))").collect())
    assert(e.getMessage.contains("2 arguments"))
  }

  test("graft token counters resolve in SQL text and equal the Column API (VERDICT r11 #7)") {
    graft.plans.GraftExtensions.registerFunctions(spark)
    Tables.registerAll(spark, sf)
    val viaSql = spark.sql(
      "SELECT doc_id, graft_bpe_tokens(text) AS bpe, graft_ws_tokens(text) AS ws " +
        "FROM documents ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    val viaApi = Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.Text.bpeTokens(col("text")).as("bpe"),
        graft.functions.Text.wsTokens(col("text")).as("ws"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(viaSql == viaApi, "one expression definition behind both surfaces")
    val e = intercept[Exception](spark.sql("SELECT graft_bpe_tokens('a', 'b')").collect())
    assert(e.getMessage.contains("1 argument"))
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
