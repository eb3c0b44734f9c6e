package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every declared query on SPARK_GRAFT_SF_DIR, one
  * JSON line out (BENCH_r{N}.json). Queries run in name order after a
  * warmup pass so the first timed query doesn't absorb JVM/codegen/IO
  * session warmup.
  *
  * Each query is fully materialized: a `count()` would let Catalyst prune
  * columns and drop sorts, under-measuring projection-heavy plans — and so
  * would an aggregate on top (EliminateSorts removes an ORDER BY under an
  * order-insensitive aggregate). So every row is hashed (xxhash64 across
  * all columns) and the hashes are folded ON THE EXECUTORS, below any
  * logical-plan rewrite: the fold runs over `queryExecution.toRdd`, so
  * Catalyst never sees an aggregate above the sort and the ORDER BY stays
  * in the executed plan. Driver memory is one long per partition at ANY
  * scale factor — the round-4 harness collected every row hash, which made
  * the harness itself driver-memory-bound at sf1 (VERDICT r4 item 2).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    import org.apache.spark.sql.functions._
    def buildSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      // Bench-scoped log filter (r11 verdict item 4): several queries
      // DELIBERATELY run a domain-bounded single-partition window (the
      // histogram-quantile plans — the frame is dimension-sized, not the
      // corpus), and WindowExec warns once per such stage, burying the
      // headline JSON under ~30 repeated lines per run. Verify keeps the
      // warning — only timing runs silence it.
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.window.WindowExec",
        org.apache.logging.log4j.Level.ERROR)
      // warmup: shuffle machinery + parquet reader + codegen paths
      s.range(1 << 20).groupBy(col("id") % 7).count().count()
      ops.Tables(s, sfDir, "nation").count()
      s
    }
    var spark = buildSession()

    // Materialize: hash every column of every row, fold executor-side.
    // The fold sits ABOVE the compiled physical plan (toRdd), so the sort
    // executes; it is order-sensitive within a partition (rotate-xor) and
    // partition results combine in partition order, so the folded value
    // still consumes the sorted output rather than a bag of rows.
    def materialize(df: org.apache.spark.sql.DataFrame): Long = {
      val hashed = df.select(xxhash64(df.columns.map(c => col(c).cast("string")): _*).as("h"))
      val parts = hashed.queryExecution.toRdd.mapPartitions { it =>
        var acc = 0L
        while (it.hasNext) {
          val r = it.next()
          acc = java.lang.Long.rotateLeft(acc, 1) ^ (if (r.isNullAt(0)) 0L else r.getLong(0))
        }
        Iterator.single(acc)
      }
      parts.collect().foldLeft(0L)((a, b) => java.lang.Long.rotateLeft(a, 13) ^ b)
    }

    // Per-query best-of-N (disclosed in the output): the shared host shows
    // 4-16× inflation windows under neighbor load; the min over N
    // interleaved passes is the standard way to report the code's cost
    // rather than the neighbors'. N=1 restores single-shot timing.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    var errs = List.empty[String]
    // Opt-in per-query task-time skew: max/median task duration answers
    // "did a straggler dominate this query" (the hostile-corpus question —
    // salting/AQE claims need a measured max/med ratio, not prose). A
    // listener collects task durations; the bus delivers asynchronously
    // after the blocking collect, so the drain waits for quiescence.
    val wantTaskStats = sys.env.contains("SPARK_GRAFT_BENCH_TASKSTATS")
    // (duration ms, shuffle-read records) per task: the records number is
    // the NtileDiag plan-width probe folded into the suite report (r9
    // verdict item 7) — the widest single task's shuffle-read rows is the
    // metric that caught the window family, and recording it per full-suite
    // run makes a future fixed-fraction-single-task plan visible without a
    // bespoke diag
    val taskDurs = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def registerTaskListener(s: SparkSession): Unit =
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
            if (t.taskInfo != null) {
              val rows = if (t.taskMetrics != null && t.taskMetrics.shuffleReadMetrics != null)
                t.taskMetrics.shuffleReadMetrics.recordsRead else 0L
              taskDurs.add((t.taskInfo.duration, rows)); ()
            }
        })
    if (wantTaskStats) registerTaskListener(spark)
    // sum_ms (round 14): max_ms ≈ wall with a tiny median does NOT imply a
    // serial task — 32 CONCURRENT uniform tasks each span their stage's
    // wall too, and with 2×32+2 tasks the median lands on the cheap half
    // (the r13 "single-task domination" reading; jstack + per-stage
    // StageDiag showed the heavy stages fully parallel). sum_ms/wall is
    // the disambiguator: ≈1 means serial, ≫1 means parallel.
    case class TaskStats(n: Int, maxMs: Long, medMs: Long, maxRows: Long, sumMs: Long)
    def drainTaskStats(): TaskStats = {
      var prev = -1; var cur = taskDurs.size(); var spins = 0
      while (cur != prev && spins < 25) { Thread.sleep(20); prev = cur; cur = taskDurs.size(); spins += 1 }
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var v = taskDurs.poll()
      while (v != null) { buf += v; v = taskDurs.poll() }
      if (buf.isEmpty) TaskStats(0, 0L, 0L, 0L, 0L)
      else {
        val s = buf.map(_._1).sorted
        TaskStats(s.length, s.last, s(s.length / 2), buf.map(_._2).max, s.sum)
      }
    }
    // optional subset (comma-separated names) for scale-exponent runs at
    // big SFs — the per-query map in the output shows exactly what ran
    val subset = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // exclusion list for scale runs that quarantine the labeled quadratic
    // oracles (x04/x05 at sf10 and at tight heap budgets) — recorded in
    // the artifact implicitly by the per-query map
    val excluded = sys.env.get("SPARK_GRAFT_BENCH_EXCLUDE")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => subset.forall(_.contains(n)) && !excluded(n) }
    // A FAILED pass records +∞ so it can never win the min — otherwise a
    // query that throws early in one pass would under-report its cost while
    // also being listed in errors. A query that failed EVERY pass surfaces
    // as -1 (plus its errors entry), never as a fake timing.
    def loadavg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // (timings, memo payer, loadavg at pass start, loadavg at pass end):
    // the per-pass load rides INTO the JSON artifact so a future reader can
    // see neighbor-load distortion per pass without consulting prose
    // (VERDICT r6 item 2 — bench_full_sf1's x88 read 18.2 s under ~25 load)
    // union of every NAMED live memo entry across the four memo families —
    // diffed around each query so the artifact says which caches the query
    // BUILT (vs read): r12 verdict item 4, rider timings move when payer
    // order changes and family-level attribution can't name the cache
    def liveMemoKeys: Set[String] =
      ops.DedupOps.memoKeys ++ ops.PipelineOps.memoKeys ++
        ops.TextOps.memoKeys ++ ops.SimilarityOps.memoKeys
    def pass(): (Seq[(String, Double)], List[String], Double, Double,
                 Map[String, TaskStats], Map[String, Seq[String]]) = {
      // fresh cross-query memo per pass: x02/x31/x47/x55 share a cached LSH
      // pair lineage — legitimate within a pass (one lineage, four
      // queries), but a best-of over passes must never time a cache read
      // against pass 1's real compute
      ops.DedupOps.clearMemo()
      ops.PipelineOps.clearMemo()
      ops.TextOps.clearMemo()
      ops.SimilarityOps.clearMemo()
      val loadStart = loadavg
      // which queries absorbed a shared-memo lineage cost: one entry per
      // memo FAMILY (dedup / pipeline / text) so e.g. x130's trigram-score
      // fill is attributed even though x02 already claimed the dedup memo
      var payers = List.empty[String]
      var taskStats = Map.empty[String, TaskStats]
      var paidMemos = Map.empty[String, Seq[String]]
      val timings = named.map { case (name, fn) =>
        val keysBefore = liveMemoKeys
        if (wantTaskStats) drainTaskStats() // discard the previous query's tail
        val t0 = System.nanoTime()
        val ok = try { materialize(fn(spark, sfDir)); true }
          catch { case e: Throwable =>
            errs ::= s"$name:${e.getClass.getSimpleName}"
            // full chain to stderr — the headline JSON carries only the
            // class name, which is useless for a once-in-a-suite failure
            System.err.println(s"[bench] $name FAILED:")
            e.printStackTrace()
            // An uncaught executor OOM stops the shared SparkContext, and
            // every later query would die with IllegalStateException — the
            // 2 GB sf1 proof runs cascaded exactly this way, reducing a
            // whole-suite diagnostic to its first casualty. Rebuild the
            // session so one query's death names ONE offender and the rest
            // of the suite still reports real results.
            if (spark.sparkContext.isStopped) {
              System.err.println(s"[bench] SparkContext died during $name — rebuilding session")
              ops.DedupOps.clearMemo(); ops.PipelineOps.clearMemo()
              ops.TextOps.clearMemo(); ops.SimilarityOps.clearMemo()
              spark = buildSession()
              if (wantTaskStats) registerTaskListener(spark)
            }
            false
          }
        // per-query NAMED attribution: which caches this query built. A
        // cache appearing while the query ran means THIS query paid its
        // lineage; a query that only reads an existing cache pays nothing.
        // (Finer than the old family-level 0→>0 test: x107 after x02 builds
        // dedup.prefix_index even though the dedup family was already warm.)
        val paid = (liveMemoKeys -- keysBefore).toSeq.sorted
        if (paid.nonEmpty) { payers ::= name; paidMemos += (name -> paid) }
        if (wantTaskStats) taskStats += (name -> drainTaskStats())
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else Double.PositiveInfinity)
      }
      (timings, payers.reverse.distinct, loadStart, loadavg, taskStats, paidMemos)
    }
    val passes = (1 to runs).map(_ => pass())
    val results = passes.map(_._1)
      .reduce((a, b) => a.zip(b).map { case ((n, x), (_, y)) => n -> math.min(x, y) })
      .map { case (n, v) => n -> (if (v.isInfinity) -1.0 else v) }
    // fixed 4-decimal seconds, not full double repr: the driver records only
    // the TAIL of sbt stdout, and a 183-query map at 17 significant digits
    // per value overflowed it (BENCH_r06 parsed:null) — 100 µs resolution
    // halves the line and is far below host noise anyway
    def fmt(v: Double): String =
      if (v.isInfinity) "-1.0" else f"$v%.4f"
    def qJson(rs: Seq[(String, Double)]): String = rs
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val qs = qJson(results)
    val errJson = errs.reverse.distinct.map(e => "\"" + e + "\"").mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // memo payers as a JSON ARRAY per pass (ADVICE r9 item 3: the
    // '+'-joined composite broke name-keyed consumers); per-pass records
    // below also keep `memo_payer` = first payer for old tooling
    def payersArr(ps: List[String]): String =
      ps.map(p => "\"" + p + "\"").mkString("[", ",", "]")
    val payers = passes.map(p => payersArr(p._2)).mkString("[", ",", "]")
    val loads = passes.map(p => s"[${fmt(p._3)},${fmt(p._4)}]").mkString("[", ",", "]")
    // per-query paid_memos from the pass that WON the best-of-min (same
    // discipline as task_skew: the reported timing and the reported memo
    // attribution describe the same execution) — r12 verdict item 4
    def paidJson(pm: Map[String, Seq[String]]): String = pm.toSeq.sortBy(_._1)
      .map { case (n, ks) => "\"" + n + "\":" + ks.map("\"" + _ + "\"").mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val wonPaid: Map[String, Seq[String]] = results.flatMap { case (name, best) =>
      passes.find(p => p._1.exists { case (n, v) => n == name && v == best })
        .flatMap(_._6.get(name)).map(name -> _)
    }.toMap
    val paidMemosJson = paidJson(wonPaid)
    // task-skew per query from the pass that WON the best-of-min (the
    // reported timing and the reported straggler profile describe the same
    // execution); ratio = max/med task ms, the straggler-impact number;
    // max_rows = the widest single task's shuffle-read records (the
    // NtileDiag plan-width metric, made continuous — r9 verdict item 7)
    val wonStats: Seq[(String, TaskStats)] = if (!wantTaskStats) Nil else
      results.flatMap { case (name, best) =>
        passes.find(p => p._1.exists { case (n, v) => n == name && v == best })
          .flatMap(_._5.get(name)).map(name -> _)
      }
    val skewJson: Option[String] = if (!wantTaskStats) None else Some {
      wonStats.map { case (name, st) =>
        val ratio = if (st.medMs > 0) st.maxMs.toDouble / st.medMs else -1.0
        "\"" + name +
          s"""":{"tasks":${st.n},"max_ms":${st.maxMs},"med_ms":${st.medMs},""" +
          s""""ratio":${fmt(ratio)},"max_rows":${st.maxRows},"sum_ms":${st.sumMs}}"""
      }.mkString("{", ",", "}")
    }
    // suite-wide widest task (shuffle-read records) — one number a reader
    // can diff across rounds without opening the per-query map
    val maxTaskRows: Option[Long] =
      if (wonStats.isEmpty) None else Some(wonStats.map(_._2.maxRows).max)
    // ok:false + nonzero exit when anything errored: a consumer keying on
    // either signal must never read a failed run as a clean record
    val ok = errs.isEmpty
    // Full artifact on disk: the driver's BENCH_r{N}.json keeps only the
    // tail of sbt output, which truncates the per-query map for a 100+
    // query suite. Write the headline line PLUS every per-pass timing to a
    // RUN-DISTINCT path: earlier rounds defaulted to a fixed
    // bench_full.json and same-round re-runs silently replaced the record
    // BASELINE cited (VERDICT r7 "What's wrong" #3). Every run now keeps
    // its own timestamped file and the headline names it, so a recorded
    // number always resolves to an artifact with matching contents. Set
    // SPARK_GRAFT_BENCH_OUT to pin a specific durable name instead.
    val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString
    val stamp = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss")
      .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      s"bench_runs/bench_${stamp}_$sfName.json")
    val skewField = skewJson.map(j => s""","task_skew":$j""").getOrElse("") +
      maxTaskRows.map(m => s""","max_task_rows":$m""").getOrElse("")
    val line =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","ok":$ok,"runs":$runs,"agg":"min","queries":$qs,"errors":$errJson,"loadavg_per_pass":$loads,"memo_payers":$payers,"paid_memos":$paidMemosJson,"sf":"$sfDir","artifact":"$out"$skewField}"""
    val perPass = passes.zipWithIndex
      .map { case ((rs, ps, l0, l1, _, pm), i) =>
        s"""{"pass":${i + 1},"memo_payer":"${ps.headOption.getOrElse("")}","memo_payers":${payersArr(ps)},"paid_memos":${paidJson(pm)},"loadavg":[${fmt(l0)},${fmt(l1)}],"queries":${qJson(rs)}}""" }
      .mkString("[", ",", "]")
    val outPath = java.nio.file.Paths.get(out)
    if (outPath.getParent != null) java.nio.file.Files.createDirectories(outPath.getParent)
    java.nio.file.Files.writeString(outPath,
      s"""{"headline":$line,"passes":$perPass}\n""")
    // ALSO drop the bare headline at a fixed path: sbt appends its own
    // [success] line after our stdout and the driver byte-caps the tail, so
    // the stdout contract alone can lose the record (BENCH_r07
    // parsed:null). bench_last.json is overwritten every run by design —
    // it answers "what did the most recent Bench on this tree measure"
    // regardless of how stdout was captured; durable runs keep their full
    // record under the distinct SPARK_GRAFT_BENCH_OUT name.
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_last.json"), line + "\n")
    // STDOUT gets a COMPACT headline, not the full line: the driver
    // byte-caps the captured stdout tail at 2,000 chars, and a 201-query
    // per-query map is ~6 KB — the captured tail started mid-JSON and
    // could never parse (BENCH_r07..r09 parsed:null; r9 verdict item 2
    // diagnosed the cap). Everything per-query lives in the timestamped
    // artifact and bench_last.json; this line carries only the scalars a
    // last-line JSON parse needs and stays far under the cap.
    // per-FAMILY subtotals ride the compact line (round 15, r14 verdict
    // item 2: the driver's per-query comparator reads only the byte-capped
    // stdout tail, so since r9 it has been per-query-blind; a 226-entry map
    // can never fit under the cap, but the 4 family subtotals — f scalar/
    // agg functions, r reference ops, t relational, x LLM-pipeline — give
    // the stdout record per-area movement at ~60 bytes). The FULL
    // per-query map remains in bench_last.json (byte-identical headline)
    // and the timestamped artifact the line names.
    val famJson = results.collect { case (n, v) if v >= 0 => (n.take(1), v) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (f, vs) => "\"" + f + "\":" + fmt(vs.map(_._2).sum) }
      .mkString("{", ",", "}")
    val compact =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","ok":$ok,"runs":$runs,"agg":"min","n_queries":${results.size},"errors":${errs.reverse.distinct.size},"families":$famJson${maxTaskRows.map(m => s""","max_task_rows":$m""").getOrElse("")},"sf":"$sfDir","artifact":"$out"}"""
    // the headline is the LAST thing on stdout — after spark.stop(), so no
    // shutdown logging can land between it and the end of the tail the
    // driver captures (BENCH_r06's parsed:null). stop() is best-effort:
    // a shutdown-hook race must not eat the headline.
    try spark.stop()
    catch { case e: Throwable => System.err.println(s"[bench] stop: $e") }
    println(compact)
    if (!ok) sys.exit(1)
  }
}
