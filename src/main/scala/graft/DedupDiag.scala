package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-shot diagnostic for the LSH dedup lineage (VERDICT r5 item 4): counts
  * the corpus-shape quantities that drive x02's cost — shingle rows, distinct
  * shingles, document-frequency tail, band-bucket sizes, candidate pairs —
  * and wall-times each phase separately, so a corpus regeneration's effect on
  * x02 can be attributed to input volume vs plan change with one run.
  *
  * Usage: `sbt "runMain graft.DedupDiag /root/testdata/sf0.1"` → one JSON line.
  */
object DedupDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    spark.range(1 << 18).groupBy(col("id") % 7).count().count() // shuffle warmup

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val docs = ops.Tables(spark, sfDir, "documents")
    val (nDocs, tDocs) = timed(docs.count())
    val words = docs.select(sum(size(split(col("text"), " "))).cast("long"))
      .collect()(0).getLong(0)

    val sh = ops.DedupOps.diagShingled(spark, sfDir).cache()
    val (shingleRows, tShingle) = timed(sh.count())
    val dfStats = sh.groupBy("sh").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)), max("c"), sum(col("c") * col("c")).cast("long")).collect()(0)

    // diagBands is the memoized band-signature cache: its count pays the
    // shingle→minhash lineage once, so tPairs below times the bucket join
    // alone over cached 60-byte band rows
    val bands = ops.DedupOps.diagBands(spark, sfDir)
    val (bandRows, tBands) = timed(bands.count())
    val buckets = bands.groupBy("band", "sig").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)), max("c"), sum(col("c") * (col("c") - 1) / 2).cast("long")).collect()(0)

    val (nPairs, tPairs) = timed(ops.DedupOps.diagPairs(spark, sfDir).count())

    // x107 stage attribution (round 7): the prefix-filtered exact join is
    // the suite's deliberate heavyweight — time its three stages separately
    // (shingle index / df+rank windows → prefix / candidate self-join) and
    // the verify remainder, so a trim can target the stage that pays
    val (prefixRows, tPrefix) = timed(ops.DedupOps.diagPrefixIndex(spark, sfDir).count())
    val (candRows, tCand) = timed(ops.DedupOps.diagPrefixPairs(spark, sfDir).count())
    val (x107Rows, tX107) = timed(
      SparkEntry.queries("x107_prefix_allpairs")(spark, sfDir).count())

    // x127 stage attribution (round 8; widened round 13 per the r12 verdict:
    // its solo sfx10 numbers spanned 51.7–103.7 s with verify-pair counts
    // stable, and "load band" was an inference without per-stage timings).
    // Four stages, each timed over the previous one's CACHED output so a
    // number names ONE stage: probe-prefix volume (what a keff tightening
    // would shrink), the keff-floored candidate aggregate (pre-length-
    // filter), the container-length filter, and the exact verify. The
    // prefix frame is cached HERE (not just its memoized index) so
    // sec_x127_cand_join doesn't re-run the keff filter/projection and
    // overlap sec_x127_prefix (ADVICE r13); CacheManager plan-matching
    // makes containmentCandRaw's internal rebuild hit this cache.
    val contPrefix = ops.DedupOps.containmentPrefix(spark, sfDir).cache()
    val (contPrefixRows, tContPrefix) = timed(contPrefix.count())
    val contRaw = ops.DedupOps.containmentCandRaw(spark, sfDir).cache()
    val (contRawPairs, tContRaw) = timed(contRaw.count())
    val contCl = ops.DedupOps.containmentCandidatesFrom(spark, sfDir, contRaw).cache()
    val (contPairs, tContCand) = timed(contCl.count())
    val (x127Out, tX127Verify) = timed(
      ops.DedupOps.containmentVerify(spark, sfDir, contCl).count())
    val (x127Rows, tX127) = timed(
      SparkEntry.queries("x127_containment_join")(spark, sfDir).count())
    contPrefix.unpersist(); contRaw.unpersist(); contCl.unpersist()

    // x124 stage attribution (round 8): the production chunk stage is the
    // native CdcChunkDigests expression (sec_cdc_digests); the SQL-HOF cut
    // stage rides along as the interpreted reference (sec_cdc_hof) that
    // motivated going native — the delta IS the lambda-dispatch + substring
    // re-walk constant a 100 TB pass would otherwise pay
    val cdcIn = ops.Tables.computeParallel(
      docs.where(col("text").isNotNull && length(col("text")) > 0))
      .select("doc_id", "source", "text")
    val (nCuts, tCdcHof) = timed(
      ops.PipelineOps.cdcCuts(cdcIn).select(sum(size(col("cuts"))).cast("long"))
        .collect()(0).getLong(0))
    val (nChunks, tCdcDigests) = timed(ops.PipelineOps.cdcDigests(cdcIn).count())
    val (x124Rows, tX124) = timed(
      SparkEntry.queries("x124_cdc_chunks")(spark, sfDir).count())

    // x129 stage attribution (round 9, r8 verdict item 7): the Gonzalez
    // traversal's cost is K driver-paced corpus passes — split the seed
    // argmax, the 7 greedy round argmaxes (the sequential-by-algorithm
    // part), and the distributed Voronoi assignment, so an sf bump that
    // slows x129 names the stage (pass cost vs round count vs aggregate)
    val kcClock = new ops.SimilarityOps.StageClock
    val kcFrame = ops.SimilarityOps.kcenterBuild(spark, sfDir, kcClock)
    val (x129Rows, tKcAssign) = timed(kcFrame.count())
    val tKcSeed = kcClock.times.getOrElse("seed_argmax", 0.0)
    val tKcRounds = kcClock.times.getOrElse("round_argmax", 0.0)

    // x139 stage attribution (round 10, r9 verdict item 5): the sketch
    // path (12-long per-source aggregate over the shingle multiset) vs
    // the exact-audit path (sampled md5-coin DISTINCT set — whose row
    // count ALSO reports how hard the r10 sample-side contract is
    // biting: at gate scales S=1 and the set is the full universe)
    val (srcSigRows, tX139Sketch) = timed(ops.DedupOps.diagSourceSig(spark, sfDir).count())
    val (auditSetRows, tX139AuditSet) = timed(ops.DedupOps.diagSourceAuditSet(spark, sfDir).count())
    val (x139Rows, tX139) = timed(
      SparkEntry.queries("x139_source_minhash")(spark, sfDir).count())

    // x142 stage attribution (round 10, same discipline; r11: the exact
    // count(DISTINCT) legs are stratum-bounded onto x139's audit set —
    // timed above as sec_x139_audit_set — so the remaining full-scan
    // exact leg is the plain instance-count sum, timed here)
    val (hllBaseRows, tHllBase) = timed(ops.DedupOps.diagHllExactN(spark, sfDir).count())
    val (hllRegRows, tX142Sketch) = timed(ops.DedupOps.hllRegisterSums(spark, sfDir).count())
    val (x142Rows, tX142) = timed(
      SparkEntry.queries("x142_hll_union")(spark, sfDir).count())

    // cluster-graph structure: LS/SS round count is the x31 cost driver
    val ((labels, rounds), tCluster) = timed {
      val (l, r) = ops.DedupOps.largeStarSmallStar(ops.DedupOps.diagEdges(spark, sfDir))
      (l.cache(), r)
    }
    val clusterStats = labels.groupBy("lbl").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)), max("c")).collect()(0)
    sh.unpersist(); labels.unpersist(); ops.DedupOps.clearMemo()

    println(
      s"""{"sf":"$sfDir","docs":$nDocs,"words":$words,"shingle_rows":$shingleRows,""" +
      s""""distinct_shingles":${dfStats.getLong(0)},"max_df":${dfStats.getLong(1)},"sum_df2":${dfStats.getLong(2)},""" +
      s""""band_rows":$bandRows,"buckets":${buckets.getLong(0)},"max_bucket":${buckets.getLong(1)},"bucket_pair_rows":${buckets.getLong(2)},""" +
      s""""candidate_pairs":$nPairs,"lsss_rounds":$rounds,"clusters":${clusterStats.getLong(0)},"max_cluster":${clusterStats.getLong(1)},""" +
      s""""prefix_rows":$prefixRows,"prefix_cand_pairs":$candRows,"x107_rows":$x107Rows,""" +
      s""""containment_prefix_rows":$contPrefixRows,"containment_raw_pairs":$contRawPairs,""" +
      s""""containment_verify_pairs":$contPairs,"x127_verify_rows":$x127Out,"x127_rows":$x127Rows,""" +
      s""""cdc_cuts":$nCuts,"cdc_chunks":$nChunks,"x124_rows":$x124Rows,""" +
      s""""x129_rows":$x129Rows,"sec_x129_seed":$tKcSeed,"sec_x129_rounds":$tKcRounds,"sec_x129_assign":$tKcAssign,""" +
      s""""x139_sources":$srcSigRows,"x139_audit_set_rows":$auditSetRows,"x139_rows":$x139Rows,""" +
      s""""sec_x139_sketch":$tX139Sketch,"sec_x139_audit_set":$tX139AuditSet,"sec_x139":$tX139,""" +
      s""""hll_exact_n_rows":$hllBaseRows,"hll_register_rows":$hllRegRows,"x142_rows":$x142Rows,""" +
      s""""sec_x142_exact_n":$tHllBase,"sec_x142_sketch":$tX142Sketch,"sec_x142":$tX142,""" +
      s""""sec_scan":$tDocs,"sec_shingle":$tShingle,"sec_bands":$tBands,"sec_pairs":$tPairs,"sec_cluster":$tCluster,""" +
      s""""sec_prefix_windows":$tPrefix,"sec_prefix_join":$tCand,"sec_x107_verify":$tX107,""" +
      s""""sec_x127_prefix":$tContPrefix,"sec_x127_cand_join":$tContRaw,""" +
      s""""sec_containment_cand":$tContCand,"sec_x127_verify":$tX127Verify,"sec_x127":$tX127,""" +
      s""""sec_cdc_hof":$tCdcHof,"sec_cdc_digests":$tCdcDigests,"sec_x124":$tX124}""")
    spark.stop()
  }
}
