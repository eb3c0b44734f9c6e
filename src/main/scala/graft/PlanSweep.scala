package graft

import org.apache.spark.sql.SparkSession

/** Global anti-pattern sweep over the ENTIRE declared batch surface —
  * the complement of [[PlanAudit]]'s per-query positive checks: plan
  * every query and enforce the three invariants that hold with an EMPTY
  * allowlist — **no CartesianProductExec anywhere**, **no built-in
  * exact `percentile`/`median` aggregate anywhere** (its per-group boxed
  * map buffer neither spills nor shrinks; `RelOps.exactQuantiles` is the
  * bit-identical spillable replacement), and **no global window over an
  * un-collapsed stream** (see [[unboundedGlobalWindows]]). (Spark plans a
  * CartesianProduct only for a non-broadcastable cross join — the shape
  * that detonates at 100 TB. BroadcastNestedLoopJoin hits are printed as
  * information, not failures: every one in this surface is a deliberate
  * broadcast of a 1-row/tiny side — corpus counts, query samples, seed
  * centroids — which PlanAudit asserts individually where it matters.)
  *
  * Run: `sbt "runMain graft.PlanSweep [sfDir]"` — exits 1 if any query
  * plans a cartesian or fails to plan. Streaming queries are skipped:
  * building their DataFrame executes the stream (they are covered by
  * their own oracles and specs, and their stateful plans cannot contain
  * a cartesian — stream-stream joins require equi/time-bound keys).
  */
object PlanSweep {

  /** Third suite-wide ban (r10 verdict item 6): a `WindowExec` with an
    * EMPTY partition spec buffers its whole input in ONE task — fine over
    * a bounded frame (a limit head, a histogram/pair-map aggregate, a
    * tiny dimension), fatal over a corpus-scale stream (the r8 window
    * family's failure mode, generalized). The pin asserts every global
    * window sits above a node that already collapsed the stream: a
    * limit (Global/Local/TakeOrdered/CollectLimit) or an aggregate
    * (hash/object-hash/sort — histogram, pair map, day dim, score
    * histogram lineages all end in one). Checked on `sparkPlan` (the
    * pre-AQE physical tree, where WindowExec/limits are visible without
    * unwrapping AdaptiveSparkPlanExec), subqueries included.
    */
  private[graft] def unboundedGlobalWindows(
      plan: org.apache.spark.sql.execution.SparkPlan): Seq[String] = {
    import org.apache.spark.sql.execution._
    def bounded(p: SparkPlan): Boolean = p.exists {
      case _: GlobalLimitExec | _: LocalLimitExec |
           _: TakeOrderedAndProjectExec | _: CollectLimitExec => true
      case _: aggregate.HashAggregateExec |
           _: aggregate.ObjectHashAggregateExec |
           _: aggregate.SortAggregateExec => true
      case _ => false
    }
    plan.collectWithSubqueries {
      case w: window.WindowExec if w.partitionSpec.isEmpty && !bounded(w.child) =>
        w.windowExpression.map(_.sql).mkString(", ").take(100)
      case w: window.WindowGroupLimitExec
          if w.partitionSpec.isEmpty && !bounded(w.child) =>
        s"WindowGroupLimit(${w.rankLikeFunction.sql})"
    }
  }

  private val streaming = Set(
    "x17_stream_tumbling", "x18_stream_dedup", "x19_stream_watermark",
    "x20_stream_static_join", "x32_stream_clean", "x44_stream_funnel",
    "x51_stream_stream_join", "x52_stream_session", "x60_stream_outer_join",
    "x74_stream_dedup_watermark", "x103_stream_tws")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-plan-sweep")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var cartesians = List.empty[String]
    var percentiles = List.empty[String]
    var globalWindows = List.empty[String]
    var errors = List.empty[String]
    var bnlj = 0
    var bcastGen = List.empty[String]
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1) if !streaming(name)) {
      try {
        val qe = fn(spark, sfDir).queryExecution
        val executed = qe.executedPlan
        val plan = executed.toString
        if (plan.contains("CartesianProduct")) cartesians ::= name
        if (plan.contains("BroadcastNestedLoopJoin")) bnlj += 1
        // second suite-wide ban (r9 verdict item 2, the cartesian's twin):
        // the built-in EXACT percentile/median aggregate buffers every
        // distinct value of a group in a boxed OpenHashMap that neither
        // spills nor shrinks — it OOMed the round-8 2 GB sf1 proof, and
        // every declared quantile now rides RelOps.exactQuantiles (a
        // spillable histogram, spec-proved bit-identical). Checked by
        // CLASS (PercentileBase), not plan-string grep, so it also catches
        // a Median/percentile_cont that analysis rewrote, wherever it
        // hides (subqueries included); ApproximatePercentile — bounded
        // mergeable sketch state — is legal and does not extend
        // PercentileBase.
        val hasExactPercentile = executed
          .collectWithSubqueries { case n => n }
          .exists(_.expressions.exists(_.exists {
            case _: org.apache.spark.sql.catalyst.expressions.aggregate.PercentileBase => true
            case _ => false
          }))
        if (hasExactPercentile) percentiles ::= name
        // third suite-wide ban (r10 verdict item 6): global windows must
        // sit above a bounded child — see unboundedGlobalWindows
        val ugw = unboundedGlobalWindows(qe.sparkPlan)
        if (ugw.nonEmpty) globalWindows ::= s"$name [${ugw.mkString("; ")}]"
        // corpus-sized-broadcast heuristic: a BroadcastExchange whose
        // build subtree EXPLODES corpus rows (Generate) usually means
        // Catalyst's post-aggregate size estimate under-guessed an
        // unbounded table (x88's 5-gram df, x34's word df — both found
        // the hard way by the 2 GB sf1 proof run, which is the
        // authoritative empirical detector: an over-sized broadcast
        // fails to BUILD there). Informational: a bounded exploded side
        // (x61's 8-way salted dim) legitimately trips it.
        def hasGenerate(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
          p.exists(_.isInstanceOf[org.apache.spark.sql.execution.GenerateExec])
        val hit = executed.exists {
          case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec =>
            hasGenerate(b.child)
          case _ => false
        }
        if (hit) bcastGen ::= name
      } catch { case e: Exception =>
        errors ::= s"$name (${e.getClass.getSimpleName})"
      }
    }
    println(s"[sweep] planned ${SparkEntry.queries.size - streaming.size} queries: " +
      s"${cartesians.size} cartesian, ${percentiles.size} exact-percentile, " +
      s"${globalWindows.size} unbounded-global-window, ${errors.size} errors, " +
      s"$bnlj informational BNLJ (deliberate tiny-side broadcasts)")
    bcastGen.reverse.foreach(n => println(s"[sweep] BROADCAST-over-Generate in $n (verify build side is bounded)"))
    cartesians.foreach(n => println(s"[sweep] CARTESIAN in $n"))
    percentiles.foreach(n => println(s"[sweep] EXACT-PERCENTILE aggregate in $n (non-spillable buffer — use RelOps.exactQuantiles)"))
    globalWindows.foreach(n => println(s"[sweep] UNBOUNDED GLOBAL WINDOW in $n (empty partition spec over an un-collapsed stream — one task buffers the corpus)"))
    errors.foreach(n => println(s"[sweep] ERROR planning $n"))
    spark.stop()
    if (cartesians.nonEmpty || percentiles.nonEmpty || globalWindows.nonEmpty || errors.nonEmpty) sys.exit(1)
  }
}
