package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: print the formatted physical plan and wall time for
  * selected SparkEntry queries. Usage:
  *   runMain graft.PlanAudit <sfDir> <queryName> [queryName...]
  * With no query names, audits every query (plans only — though ITERATIVE
  * operators like d6_components run their driver loop at construction, so
  * building their frame already executes jobs and the printed plan shows
  * the final checkpointed leaves, not the pipeline).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Session.tune(spark)
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"\n=== $name ===")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      if (args.length > 1) {
        val t0 = System.nanoTime()
        val n = df.count()
        println(f"--- $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
