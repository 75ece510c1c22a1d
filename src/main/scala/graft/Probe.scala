package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc diagnostics main: run one named SparkEntry query repeatedly and
  * print per-run wall time plus the final executed (AQE) plan — the tool
  * for chasing plan flips / bimodal timings that a min-of-k bench hides.
  *
  * Usage: runMain graft.Probe <queryName> [sfDir] [runs] [plan|noplan]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Probe <query> [sfDir] [runs]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(2).flatMap(_.toIntOption).getOrElse(5)
    val showPlan = !args.lift(3).contains("noplan")
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
    val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
    var lastPlan = ""
    val times = (1 to runs).map { i =>
      System.gc()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      // normalize per-execution id churn (expr ids, plan ids, subquery ids)
      // so PLAN CHANGED means a structural change, not a fresh planning
      val plan = df.queryExecution.executedPlan.toString
        .replaceAll("#\\d+", "#N").replaceAll("plan_id=\\d+", "plan_id=N")
        .replaceAll("subquery\\d+", "subqueryN")
      val changed = if (plan != lastPlan && i > 1) "  [PLAN CHANGED]" else ""
      lastPlan = plan
      println(f"[probe] $name run $i: $dt%.3f s$changed")
      dt
    }
    println(f"[probe] min=${times.min}%.3f max=${times.max}%.3f spread=${times.max / times.min}%.2fx")
    if (showPlan) println(lastPlan.take(8000))
    spark.stop()
  }
}
