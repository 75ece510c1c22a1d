package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Pins `Tables.registerAll`'s per-view isolation (the r9 failure mode):
  * one unloadable table must cost only queries that reference IT — the
  * other views still register and still answer SQL.
  */
class TablesSpec extends SparkTestBase {

  private val srcSf = "/root/testdata/sf0.001"

  /** Build a scratch data dir with 9 good tables (symlinked to the real
    * sf0.001 parquet) and ONE corrupt table (garbage bytes where a parquet
    * footer should be).
    */
  private def stageCorrupted(bad: String): String = {
    val dir = Paths.get(s"target/tmp/tables_spec_corrupt_$bad")
    graft.sources.ParquetSink.rmRf(dir.toFile)
    Files.createDirectories(dir)
    Tables.AllNames.foreach { n =>
      val dst = dir.resolve(s"$n.parquet")
      if (n == bad) Files.write(dst, "this is not a parquet file".getBytes("UTF-8"))
      else Files.createSymbolicLink(dst, Paths.get(s"$srcSf/$n.parquet").toAbsolutePath)
    }
    dir.toString
  }

  test("registerAll: a corrupt table costs only its own view — the other nine register and query") {
    val dir = stageCorrupted("events")
    // drop any views a neighboring suite registered: createOrReplaceTempView
    // only replaces on a SUCCESSFUL load, so a pre-existing good `events`
    // view would mask the corrupt-table outcome this test pins
    Tables.AllNames.foreach(spark.catalog.dropTempView(_))
    Tables.registerAll(spark, dir)
    val good = Tables.AllNames.filterNot(_ == "events")
    assert(good.forall(spark.catalog.tableExists),
      s"missing views: ${good.filterNot(spark.catalog.tableExists)}")
    // every surviving view must actually answer a query, not just exist
    good.foreach { n =>
      assert(spark.sql(s"SELECT count(*) AS n FROM $n").head().getLong(0) > 0,
        s"view $n registered but returned no rows")
    }
    // ...and the corrupt one is genuinely unusable, not silently empty
    assert(!spark.catalog.tableExists("events") ||
      scala.util.Try(spark.sql("SELECT count(*) FROM events").head()).isFailure)
    // restore the real views for any suite running after this one
    Tables.registerAll(spark, srcSf)
  }

  test("registerAll: a fully-missing dir still fails loudly") {
    intercept[Throwable] {
      Tables.registerAll(spark, "target/tmp/tables_spec_definitely_missing")
    }
  }
}
