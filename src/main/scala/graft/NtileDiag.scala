package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot before/after harness for the r9 window-family re-plan
  * (VERDICT r8 items 1-2): runs the OLD per-partition rank-window
  * formulations of x58 / x130 / x30 against the shipped histogram /
  * bounded-top-k plans on the SAME corpus, asserting value equality, and
  * reports for each variant BOTH wall-clock and the MAX SHUFFLE-READ
  * RECORDS any single task consumed. The second number is the honest
  * scale metric: at local[32] over ≤10⁶ docs every one-task sort
  * finishes in milliseconds, so wall-clock alone cannot distinguish a
  * plan whose widest task reads 90% of the corpus from one whose widest
  * task reads 1/32 of it — but at 10¹¹ docs that per-task share IS the
  * job's critical path. Run on a benign scaled dir and on a `ScaleData
  * --skew` dir (90% one language, 50% one source) to see the ceiling the
  * re-plan removes.
  *
  * x130's two variants share [[graft.ops.TextOps]]'s memoized score
  * frame (materialized before either is timed), so the pair isolates
  * window-vs-histogram — not the trigram scoring both need.
  *
  * Usage: `sbt "runMain graft.NtileDiag <sfDir>"` → one JSON line.
  */
object NtileDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the probe measures PLAN width, so AQE must not coalesce the tiny
      // test shuffles into few partitions (at 100 TB every partition is
      // above the advisory size and no coalescing happens; here it would
      // make the histogram plan look as narrow as the window's ceiling).
      // AQE's skew-join splitting cannot rescue a window partition — a
      // single key's rows are not splittable under a rank — which is
      // exactly why the re-plan exists.
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1 << 18).groupBy(col("id") % 7).count().count() // shuffle warmup

    // max shuffle-read records of any single task since the last reset —
    // the SkewSpec salting-proof listener, reused as a plan-width probe.
    // Listener delivery is async; jobsStarted/jobsEnded parity plus a
    // bounded drain wait makes the per-variant read race-free enough for a
    // diagnostic (the counts differ by orders of magnitude, not percents).
    val maxRecords = new java.util.concurrent.atomic.AtomicLong(0)
    val jobsStarted = new java.util.concurrent.atomic.AtomicLong(0)
    val jobsEnded = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobsStarted.incrementAndGet(); ()
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        jobsEnded.incrementAndGet(); ()
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null && m.shuffleReadMetrics != null)
          maxRecords.getAndUpdate(v => math.max(v, m.shuffleReadMetrics.recordsRead))
        ()
      }
    })
    def drain(): Unit = {
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (jobsEnded.get() < jobsStarted.get() && System.nanoTime() < deadline)
        Thread.sleep(50)
      Thread.sleep(200) // tail task events after the last job-end
    }
    def timed(f: => Array[org.apache.spark.sql.Row])
        : (Array[org.apache.spark.sql.Row], Double, Long) = {
      drain(); maxRecords.set(0)
      val t0 = System.nanoTime(); val r = f; val dt = (System.nanoTime() - t0) / 1e9
      drain()
      (r, dt, maxRecords.get())
    }
    val docs = ops.Tables(spark, sfDir, "documents")

    // x58: per-language length deciles (reference window plan shared with
    // NtileSpec/SkewSpec via NtilePlan so the twins cannot drift) --------
    val (r58w, t58w, m58w) = timed(ops.NtilePlan.refLenDecilesWindow(docs).collect())
    val (r58h, t58h, m58h) = timed(SparkEntry.queries("x58_len_deciles")(spark, sfDir).collect())
    require(r58w.toSeq == r58h.toSeq, "x58 window vs histogram results differ")

    // x30: per-(source, lang) top-5 ----------------------------------------
    val (r30w, t30w, m30w) = timed(ops.NtilePlan.refStratifiedTopKWindow(docs).collect())
    val (r30a, t30a, m30a) = timed(SparkEntry.queries("x30_stratified_topk")(spark, sfDir).collect())
    require(r30w.toSeq == r30a.toSeq, "x30 window vs top-k-agg results differ")

    // x130: per-language LM-score terciles ---------------------------------
    // pre-materialize the shared memoized score frame so neither timing
    // pays the trigram lineage — the pair isolates the split itself
    val scored = ops.TextOps.diagLangScores(spark, sfDir)
    scored.count()
    val (r130w, t130w, m130w) = timed(ops.NtilePlan.refCcnetWindow(scored).collect())
    val (r130h, t130h, m130h) = timed(SparkEntry.queries("x130_ccnet_buckets")(spark, sfDir).collect())
    require(r130w.toSeq == r130h.toSeq, "x130 window vs histogram results differ")

    val nDocs = docs.count()
    // stop BEFORE the headline println (Bench's ordering): nothing may
    // reach stdout after the line a driver parses as the last one
    scala.util.Try(spark.stop())
    def fmt(d: Double): String = f"$d%.4f"
    // the headline is the literal last stdout line (Bench's contract)
    println(
      s"""{"metric":"ntile_diag","sf":"$sfDir","n_docs":$nDocs,""" +
      s""""sec_x58_window":${fmt(t58w)},"sec_x58_hist":${fmt(t58h)},""" +
      s""""sec_x30_window":${fmt(t30w)},"sec_x30_topk":${fmt(t30a)},""" +
      s""""sec_x130_window":${fmt(t130w)},"sec_x130_hist":${fmt(t130h)},""" +
      s""""max_task_rows_x58_window":$m58w,"max_task_rows_x58_hist":$m58h,""" +
      s""""max_task_rows_x30_window":$m30w,"max_task_rows_x30_topk":$m30a,""" +
      s""""max_task_rows_x130_window":$m130w,"max_task_rows_x130_hist":$m130h,""" +
      s""""equal":true}""")
  }
}
