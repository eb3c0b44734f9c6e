package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-STAGE attribution for one declared query: which stage owns the
  * suite-level single-task domination the r13 TASKSTATS exposed (VERDICT
  * r13 "What's wrong" #3 — x92/x152/x69/x90/x94/x97 spend 55-98% of wall
  * in ONE task). Bench's listener aggregates per QUERY; this main keeps the
  * per-stage task distributions plus each stage's callsite, so a 35 s
  * serial segment resolves to a code line instead of a guess.
  *
  *   runMain graft.StageDiag <sfDir> <queryName> [queryName ...]
  *
  * Output per stage: task count, max/med task ms, input records, shuffle
  * read/write records, and the stage's name+callsite. Not part of the
  * driver contract — a diagnostic surface like DedupDiag/NtileDiag.
  */
object StageDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class T(durMs: Long, inRecs: Long, srRecs: Long, swRecs: Long)
    val byStage = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.ConcurrentLinkedQueue[T]]()
    val stageInfo = new java.util.concurrent.ConcurrentHashMap[Int, (String, String, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskInfo != null && t.taskMetrics != null) {
          val q = byStage.computeIfAbsent(t.stageId, _ => new java.util.concurrent.ConcurrentLinkedQueue[T]())
          q.add(T(t.taskInfo.duration,
            t.taskMetrics.inputMetrics.recordsRead,
            t.taskMetrics.shuffleReadMetrics.recordsRead,
            t.taskMetrics.shuffleWriteMetrics.recordsWritten))
          ()
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for { a <- i.completionTime; b <- i.submissionTime } yield a - b).getOrElse(-1L)
        stageInfo.put(i.stageId, (i.name, i.details.linesIterator.take(6).mkString(" | "), wall))
        ()
      }
    })

    names.foreach { name =>
      byStage.clear(); stageInfo.clear()
      // fresh memo per query so attribution includes the memo build the
      // query would pay solo (the bench pass-1 shape)
      ops.DedupOps.clearMemo(); ops.PipelineOps.clearMemo()
      ops.TextOps.clearMemo(); ops.SimilarityOps.clearMemo()
      val df0 = SparkEntry.queries(name)(spark, sfDir)
      // SPARK_GRAFT_DIAG_HASHED=1 reproduces Bench.materialize's exact plan
      // (the xxhash64 projection on top) so stage attribution describes the
      // SAME execution the bench timed, not a cousin plan
      val df = if (sys.env.contains("SPARK_GRAFT_DIAG_HASHED"))
        df0.select(org.apache.spark.sql.functions.xxhash64(
          df0.columns.map(c => org.apache.spark.sql.functions.col(c).cast("string")): _*).as("h"))
      else df0
      spark.sparkContext.setJobDescription(s"stagediag:$name")
      val t0 = System.nanoTime()
      val nOut = df.queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      if (sys.env.contains("SPARK_GRAFT_DIAG_PLAN"))
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode))
      Thread.sleep(600) // listener bus drain
      println(f"===== $name  wall=$wall%.2f s  out=$nOut rows =====")
      import scala.jdk.CollectionConverters._
      val rows = byStage.asScala.toSeq.sortBy(_._1).map { case (sid, q) =>
        val ts = q.asScala.toSeq
        val durs = ts.map(_.durMs).sorted
        val (nm, site, sw) = Option(stageInfo.get(sid)).getOrElse(("?", "?", -1L))
        val callsite = site.split('|').map(_.trim)
          .find(l => l.contains("graft") && !l.contains("StageDiag"))
          .getOrElse(site.take(120))
        f"stage $sid%4d wall=${sw / 1000.0}%8.2fs tasks=${durs.length}%4d " +
          f"maxTask=${durs.last / 1000.0}%8.2fs medTask=${durs(durs.length / 2) / 1000.0}%7.2fs " +
          f"in=${ts.map(_.inRecs).sum}%12d sr=${ts.map(_.srRecs).sum}%12d sw=${ts.map(_.swRecs).sum}%12d  $nm  @ $callsite"
      }
      rows.foreach(println)
      val tot = byStage.asScala.values.flatMap(_.asScala).map(_.durMs).sum / 1000.0
      val mx = byStage.asScala.values.flatMap(_.asScala).map(_.durMs).maxOption.getOrElse(0L) / 1000.0
      println(f"  total task-sec=$tot%.1f  widest single task=$mx%.2fs  (wall $wall%.2fs)")
    }
    spark.stop()
  }
}
