package graft
import org.apache.spark.sql.SparkSession

/** Diagnostic main: print the formatted physical plan and two timed runs
  * for one or more declared queries. Usage:
  *
  *   runMain graft.PlanDump <sfDir> <queryName> [queryName ...]
  *
  * Timing here is materialization via the same executor-side fold Bench
  * uses (count over toRdd), so numbers line up with bench_full.json. Not
  * part of the driver contract — a debugging surface for plan iteration.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"===== $name =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime
        val n = df.queryExecution.toRdd.count()
        println(f"run$i: ${(System.nanoTime - t0) / 1e9}%.3f s  ($n rows)")
      }
      // The pre-execution dump above shows AQE's INITIAL plan; stage
      // dedup (ReusedShuffle/ReusedExchange) only appears in the final
      // adaptive plan, so print it post-run when asked.
      if (sys.env.contains("SPARK_GRAFT_PLAN_FINAL")) {
        println(s"===== $name (final adaptive) =====")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode))
      }
    }
    spark.stop()
  }
}
