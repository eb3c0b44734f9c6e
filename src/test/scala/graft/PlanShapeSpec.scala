package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The PlanAudit assertions as CI: every audited query's physical plan must
  * keep its scale-critical shape (pushdown at the scan, broadcasts where a
  * side is small, TakeOrderedAndProject for top-k, equi-joins for LSH
  * buckets, custom expressions inside whole-stage codegen). A regression
  * that silently flips one of these — e.g. an LSH join degrading to a
  * nested loop — fails the suite instead of waiting for the manual audit.
  */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll with SqlConfHelper {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-planshape-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Temp dirs holding staged parquet copies — reclaimed after the suite. */
  private val tmpDirs = scala.collection.mutable.Buffer.empty[java.nio.file.Path]
  private def stagedTempDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    tmpDirs += d
    d.toString
  }

  override def afterAll(): Unit = {
    spark.stop()
    tmpDirs.foreach { d =>
      scala.util.Try(java.nio.file.Files.walk(d)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p)))
    }
  }

  for (name <- PlanAudit.checks.keys.toSeq.sorted) {
    test(s"$name keeps its audited plan shape") {
      val (plan, results) = PlanAudit.auditOne(spark, sfDir, name)
      val failed = results.collect { case (pat, false) => pat }
      assert(failed.isEmpty,
        s"plan lost shape(s) ${failed.mkString(", ")}:\n" +
          plan.linesIterator.take(40).mkString("\n"))
    }
  }

  test("partition pruning: a filter on the partition column reaches the scan as a PartitionFilter") {
    // testdata ships single parquet files, so stage a copy partitioned by
    // event_type — the layout a 100 TB events table actually uses — and
    // assert the predicate lands in PartitionFilters (directory-level
    // pruning: non-matching partitions are never listed, let alone read),
    // NOT as a post-scan Filter over all partitions.
    import org.apache.spark.sql.functions._
    val dir = stagedTempDir("graft-partprune")
    graft.ops.Tables(spark, sfDir, "events")
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .where(col("event_type") === "view")
      .agg(count(lit(1)).as("n"))
    q.collect()
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters") &&
      ("PartitionFilters: \\[[^\\]]*event_type".r.findFirstIn(plan).isDefined),
      s"partition predicate did not prune at the scan:\n" +
        plan.linesIterator.take(30).mkString("\n"))
  }

  test("dynamic partition pruning: a filtered dim prunes fact partitions through the join") {
    // The other half of partition pruning: the predicate sits on the DIM
    // side, and DPP pushes the dim's surviving join keys into the fact
    // scan as a runtime subquery — at 100 TB this is the difference
    // between scanning every date partition and scanning the three the
    // dim filter selects. Fact = events partitioned by user_id % 8;
    // dim = a 2-row bucket table.
    import org.apache.spark.sql.functions._
    val dir = stagedTempDir("graft-dpp")
    graft.ops.Tables(spark, sfDir, "events")
      .withColumn("bucket", (col("user_id") % 8).cast("int"))
      .write.partitionBy("bucket").mode("overwrite").parquet(dir)
    // stats-based benefit estimation can veto DPP on toy-sized data; force
    // the decision on the filter ratio so the spec pins the MECHANISM
    withSQLConf(spark)("spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false") {
      // the dim filter must be a REAL predicate — a constant-true filter
      // folds away and the PartitionPruning rule sees no selective dim
      val dim = spark.range(0, 8).select(col("id").cast("int").as("d_bucket"))
      val q = spark.read.parquet(dir)
        .join(dim.where(col("d_bucket") % 4 === 0), col("bucket") === col("d_bucket"))
        .agg(count(lit(1)).as("n"))
      q.collect()
      val plan = q.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"no dynamic pruning expression reached the fact scan:\n" +
          plan.linesIterator.take(30).mkString("\n"))
    }
  }

  test("runtime bloom-filter pruning injects on a shuffle join with a selective build side") {
    // At 100 TB the selective-dim ⨝ fact shape runs as a shuffle join with
    // Catalyst's InjectRuntimeFilter planting a bloom filter on the fact
    // side — rows that cannot match are dropped BEFORE the exchange. The
    // production thresholds (10 MB creation side, 10 GB probe side) can
    // never trip at test scale, so this pins the behavior with the
    // thresholds scaled down and broadcast disabled; the assertion is that
    // the optimizer still wires the filter for us at all.
    import org.apache.spark.sql.functions._
    withSQLConf(spark)(
      "spark.sql.autoBroadcastJoinThreshold"                              -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled"                   -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"     -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val orders = graft.ops.Tables(spark, sfDir, "orders")
        .where(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val li = graft.ops.Tables(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_quantity")
      val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("q"))
      joined.collect()
      val plan = joined.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        "broadcast must be disabled for the runtime filter to apply:\n" +
          plan.linesIterator.take(30).mkString("\n"))
      assert(plan.toLowerCase.contains("bloomfilter") || plan.contains("might_contain"),
        "InjectRuntimeFilter did not plant a bloom filter on the probe side:\n" +
          plan.linesIterator.take(50).mkString("\n"))
    }
  }

  test("every declared memo rider plans against the cache (no silent de-memoization)") {
    // r11 verdict item 3: queries documented as "pure riders" on a memoized
    // lineage (the LSH pair/shingle/label caches, the trigram-score cache,
    // the quantization ppm/SQ-code caches) are cheap ONLY while their plan
    // actually reads the InMemoryRelation. A refactor that rebuilds the
    // lineage inline keeps correctness and silently re-pays the most
    // expensive subtree in the family — this pins every declared rider.
    import org.apache.spark.sql.execution.columnar.InMemoryRelation
    import org.apache.spark.sql.execution.LogicalRDD
    // riders whose plan must read an InMemoryRelation (a .cache()d memo)
    val cacheRiders = Seq(
      "x02_minhash_lsh", "x47_pagerank", "x80_incremental_dedup", "x86_lsh_verify",
      "x88_span_dedup", "x113_minhash_error", "x118_neardup_contamination",
      "x137_cluster_split", "x139_source_minhash", "x142_hll_union",
      "x156_cluster_density", "x157_threshold_sweep",
      // round 12: pair-lineage attribution + shingle-index dup-share riders
      "x162_cross_source_dups", "x165_dup_token_share",
      // trigram-LM score cache (TextOps)
      "x130_ccnet_buckets",
      // quantization lineage (round 12): ppm frame (x94/x97, A/B-measured
      // ~20 s win at sf10) + SQ code frame feeding both sides of x69's
      // self-join
      "x94_pq_ann", "x97_ivfpq_ann", "x69_quantized_topk")
    // riders on the memoized LABELS frame: large-star/small-star truncates
    // its lineage to a LogicalRDD (not an InMemoryRelation), so the pin is
    // RDD IDENTITY — the rider's plan must embed the very RDD backing the
    // memoized frame; an inline rebuild would mint a fresh one
    val labelRiders = Seq("x31_dup_clusters", "x64_canonical_pick",
      "x65_curation_pipeline", "x117_tombstone_propagate")
    val missing = (cacheRiders ++ labelRiders).filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"rider list names unknown queries: $missing")
    val deMemoized = cacheRiders.filter { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      !df.queryExecution.optimizedPlan.exists(_.isInstanceOf[InMemoryRelation])
    }
    assert(deMemoized.isEmpty,
      s"riders no longer plan against their memoized cache: ${deMemoized.mkString(", ")}")
    val memoLblRdds = graft.ops.DedupOps.clusterLabels(spark, sfDir)
      .queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd.id }.toSet
    assert(memoLblRdds.nonEmpty, "memoized labels frame lost its truncated backing RDD")
    val deLabeled = labelRiders.filter { name =>
      val rdds = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd.id }.toSet
      rdds.intersect(memoLblRdds).isEmpty
    }
    assert(deLabeled.isEmpty,
      s"riders no longer embed the memoized labels RDD: ${deLabeled.mkString(", ")}")
  }

  test("PlanSweep flags a global window over an un-collapsed stream, accepts bounded ones") {
    // third suite-wide ban (r10 verdict item 6): a WindowExec with an empty
    // partition spec buffers its input in ONE task — legal only above a
    // node that already collapsed the stream (limit or aggregate).
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val docs = graft.ops.Tables(spark, sfDir, "documents")
    val bad = docs.withColumn("r", row_number().over(Window.orderBy(col("doc_id"))))
    assert(PlanSweep.unboundedGlobalWindows(bad.queryExecution.sparkPlan).nonEmpty,
      "corpus-scale global window not flagged")
    val viaLimit = docs.limit(10)
      .withColumn("r", row_number().over(Window.orderBy(col("doc_id"))))
    assert(PlanSweep.unboundedGlobalWindows(viaLimit.queryExecution.sparkPlan).isEmpty,
      "limit-bounded global window falsely flagged")
    val viaAgg = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .withColumn("r", row_number().over(Window.orderBy(col("lang"))))
    assert(PlanSweep.unboundedGlobalWindows(viaAgg.queryExecution.sparkPlan).isEmpty,
      "aggregate-bounded (histogram-lineage) global window falsely flagged")
    // partitioned windows are out of scope for this ban regardless of child
    val partitioned = docs.withColumn("r",
      row_number().over(Window.partitionBy("lang").orderBy(col("doc_id"))))
    assert(PlanSweep.unboundedGlobalWindows(partitioned.queryExecution.sparkPlan).isEmpty)
  }
}
