package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Skew, Tables}

/** Salted-join equivalence: same rows as the plain equi-join, with the hot
  * key's probe rows spread across salt sub-partitions.
  */
class SkewSpec extends AnyFunSuite with BeforeAndAfterAll with SqlConfHelper {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-skew-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("AQE skew-join splits a skewed shuffle partition at runtime") {
    // The engine's OTHER skew answer besides x61's explicit salting: AQE
    // detects the oversized shuffle partition after the map stage and
    // splits it across reducers (OptimizeSkewedJoin), marking the join
    // skew=true. Production thresholds (256 MB) can't trip on test data,
    // so they scale down; the assertion is that the runtime re-plan
    // engages at all — at 100 TB this is what saves an unsalted join from
    // a straggler reducer when the skew wasn't known at write time.
    withSQLConf(spark)(
      "spark.sql.autoBroadcastJoinThreshold"                        -> "-1",
      "spark.sql.adaptive.skewJoin.enabled"                         -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor"           -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes"             -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled"               -> "false") {
      // 95% of fact rows share one key (id % 20 == 0 diverts 1 in 20) — one
      // reducer partition dwarfs the rest
      val fact = spark.range(200000)
        .select(when(col("id") % 20 === 0, col("id") % 50).otherwise(7L).as("k"),
          col("id").as("v"))
      val dim = spark.range(50).select(col("id").as("k"), (col("id") * 100).as("w"))
      val q = fact.join(dim, "k").agg(sum(col("v") + col("w")).as("s"))
      q.collect()
      val plan = q.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(plan.contains("skew=true"),
        "OptimizeSkewedJoin did not split the hot partition:\n" +
          plan.linesIterator.take(30).mkString("\n"))
    }
  }

  test("saltedJoin returns exactly the plain join's rows under heavy skew") {
    import spark.implicits._
    // 90% of the fact rows share one hot key
    val fact = spark.range(100000)
      .select(when(col("id") % 10 === 0, col("id") % 50).otherwise(7L).as("k"),
        col("id").as("v"))
    val dim = spark.range(50).select(col("id").as("k"), (col("id") * 100).as("w"))

    val plain  = fact.join(dim, "k")
    val salted = Skew.saltedJoin(fact, dim, "k", salt = 8)

    assert(salted.count() == plain.count())
    val sumPlain = plain.agg(sum(col("v") + col("w"))).head.getLong(0)
    val sumSalt  = salted.agg(sum(col("v") + col("w"))).head.getLong(0)
    assert(sumPlain == sumSalt)
  }

  test("saltedJoin on the testdata fact/dim pair matches the plain join") {
    val ev  = Tables(spark, "/root/testdata/sf0.001", "events")
    val dim = ev.groupBy("user_id").agg(count(lit(1)).as("n_user_events"))
    val plain  = ev.join(dim, "user_id")
    val salted = Skew.saltedJoin(ev, dim, "user_id", salt = 4)
    assert(salted.count() == plain.count())
  }

  // ---- skew-stress fixture (VERDICT r6 item 3): ScaleData --skew ----------
  // One hot user (~10% of events), one hot supplier (~10% of lineitem), and
  // a hot phrase on half the documents (interior 3-gram df ≈ corpus/2,
  // past x04's df-cap). Built once from sf0.1 so the hot shingle df (≈2500)
  // actually exceeds DfCap = 1000.

  private lazy val skewDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-skewfix").toString
    graft.ScaleData.run(spark, "/root/testdata/sf0.1", d, 1, skew = true)
    d
  }

  test("--skew fixture plants the hot keys it promises") {
    val ev = Tables(spark, skewDir, "events")
    val hot = ev.where(col("user_id") === 1L).count().toDouble / ev.count()
    assert(hot > 0.08 && hot < 0.15, s"hot user share $hot not ~10%")
    val li = Tables(spark, skewDir, "lineitem")
    val hotSupp = li.where(col("l_suppkey") === 1L).count().toDouble / li.count()
    assert(hotSupp > 0.08 && hotSupp < 0.15, s"hot supplier share $hotSupp not ~10%")
    // r9: the partition-key concentrations behind the window-family
    // re-plan — one language ~90%, one source ~50%
    val docs = Tables(spark, skewDir, "documents")
    val n = docs.count().toDouble
    val hotLang = docs.where(col("lang") === graft.ScaleData.SkewHotLang).count() / n
    assert(hotLang > 0.85 && hotLang < 0.95, s"hot language share $hotLang not ~90%")
    val hotSrc = docs.where(col("source") === graft.ScaleData.SkewHotSource).count() / n
    assert(hotSrc > 0.45 && hotSrc < 0.6, s"hot source share $hotSrc not ~50%")
  }

  test("re-planned x58/x30 match their window formulations on the 90%-one-language corpus") {
    // the r8 verdict's 'done' bar for the re-plan: same answers on a
    // fixture where the dominant partition holds ~90% of doc rows (the
    // shape that made the window plans a single-hot-task defect)
    // reference window plans shared with NtileDiag/NtileSpec (NtilePlan)
    // so the twins cannot drift from the oracle SQL
    val docs = Tables(spark, skewDir, "documents")
    val decHist = SparkEntry.queries("x58_len_deciles")(spark, skewDir)
    assert(decHist.collect().toSeq ==
      graft.ops.NtilePlan.refLenDecilesWindow(docs).collect().toSeq)
    val topAgg = SparkEntry.queries("x30_stratified_topk")(spark, skewDir)
    assert(topAgg.collect().toSeq ==
      graft.ops.NtilePlan.refStratifiedTopKWindow(docs).collect().toSeq)
    // ADVICE r9 item 1: the same equality with null-text rows injected
    // into the hot stratum — the UDAF's rank-last sentinel must agree
    // with the window's NULLS LAST under 90%-one-language skew too
    val withNulls = docs.select("source", "lang", "doc_id", "text")
      .unionByName(docs.limit(3)
        .select(col("source"), col("lang"),
          (col("doc_id") + 10_000_000L).as("doc_id"),
          lit(null).cast("string").as("text")))
    assert(graft.ops.NtilePlan.stratifiedTopKAgg(withNulls).collect().toSeq ==
      graft.ops.NtilePlan.refStratifiedTopKWindow(withNulls).collect().toSeq)
  }

  test("salting spreads the hot key: max per-task shuffle records drop >=4x on the skewed corpus") {
    // The scale claim behind x61, measured via task metrics instead of
    // wall-clock (timing is host-noise-fragile in CI): with broadcast off,
    // the unsalted sort-merge join funnels the hot user's ~60k rows into
    // ONE reducer task; the 8-way salt bounds every task near 1/8 of that.
    val maxRecords = new java.util.concurrent.atomic.AtomicLong(0)
    val jobsDone = new java.util.concurrent.Semaphore(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null && m.shuffleReadMetrics != null)
          maxRecords.getAndUpdate(v => math.max(v, m.shuffleReadMetrics.recordsRead))
      }
      // listener events are ordered: when onJobEnd lands, every onTaskEnd of
      // that job has landed — the drain signal (listenerBus is private[spark])
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobsDone.release()
    }
    withSQLConf(spark)(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled"  -> "false", // measure salting alone
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // enough reducers that the average task is far below the hot key —
      // at the suite default of 4, every task averages 25% of the corpus
      // and a 10% hot key is invisible at task granularity
      "spark.sql.shuffle.partitions" -> "128") {
      val ev  = Tables(spark, skewDir, "events")
      // dim is MATERIALIZED before the listener window: its own build
      // aggregates by user_id, so the hot user funnels the same ~10k rows
      // into one dim-build task in both runs — measuring it would mask the
      // join-side difference the salt exists to create
      val dim = ev.groupBy("user_id").agg(count(lit(1)).as("n_user_events")).cache()
      dim.count()
      def maxTaskRecords(df: org.apache.spark.sql.DataFrame): Long = {
        maxRecords.set(0)
        spark.sparkContext.addSparkListener(listener)
        try {
          jobsDone.drainPermits()
          df.agg(sum(col("n_user_events"))).collect()
          assert(jobsDone.tryAcquire(30, java.util.concurrent.TimeUnit.SECONDS),
            "listener did not observe job end")
          // AQE splits one query into several jobs — drain the burst
          while (jobsDone.tryAcquire(200, java.util.concurrent.TimeUnit.MILLISECONDS)) {}
        } finally spark.sparkContext.removeSparkListener(listener)
        maxRecords.get()
      }
      try {
        val plainMax  = maxTaskRecords(ev.join(dim.hint("merge"), "user_id"))
        val saltedMax = maxTaskRecords(Skew.saltedJoin(ev, dim.hint("merge"), "user_id", salt = 16))
        assert(plainMax > 0 && saltedMax > 0)
        assert(saltedMax * 4 <= plainMax,
          s"salting did not spread the hot key: plain max/task $plainMax, salted $saltedMax")
      } finally { dim.unpersist(); () }
    }
  }

  test("x04's df-cap actually triggers on the skewed corpus and bounds the candidate volume") {
    import spark.implicits._
    // replicate the shingle df computation over the fixture (word 3-grams,
    // distinct per doc — DedupOps' contract) and show (a) the hot phrase's
    // interior shingles exceed the cap, (b) the capped candidate volume
    // Σ C(df,2) is orders of magnitude below the uncapped one — the join
    // blowup the cap exists to prevent
    val docs = Tables(spark, skewDir, "documents").where(col("text").isNotNull)
    val w = split(col("text"), " ")
    val sh = docs.select(col("doc_id"), explode(
        when(size(w) >= 3, transform(sequence(lit(0), size(w) - 3), i =>
          concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))))
          .otherwise(array())).as("g"))
      .distinct()
    val df = sh.groupBy("g").agg(count(lit(1)).as("df")).cache()
    try {
      val hotDf = df.where(col("g") === "beta gamma delta").select("df").as[Long].head()
      assert(hotDf > graft.ops.DedupOps.DfCap,
        s"hot shingle df $hotDf does not exceed the cap ${graft.ops.DedupOps.DfCap}")
      val capped = df.where(col("df") <= graft.ops.DedupOps.DfCap)
        .agg(sum((col("df") * (col("df") - 1) / 2).cast("long"))).as[Long].head()
      val uncapped = df.agg(sum((col("df") * (col("df") - 1) / 2).cast("long"))).as[Long].head()
      assert(uncapped > capped * 5,
        s"fixture not skewed enough to demonstrate the cap: capped $capped, uncapped $uncapped")
      // and the production query itself completes, bounded, on this corpus
      val pairs = SparkEntry.queries("x04_ngram_jaccard")(spark, skewDir)
      assert(pairs.count() >= 0) // materializes without a pair explosion
    } finally { df.unpersist(); () }
  }

  test("LSH bucket cap engages on the skewed corpus: linear candidate volume, connectivity kept") {
    import spark.implicits._
    val cap = graft.ops.DedupOps.LshBucketCap
    val sizes = graft.ops.DedupOps.diagBands(spark, skewDir)
      .groupBy("band", "sig").agg(count(lit(1)).as("m")).cache()
    try {
      val maxBucket = sizes.agg(max("m")).as[Long].head()
      assert(maxBucket > cap,
        s"fixture has no over-cap LSH bucket (max $maxBucket, cap $cap) — nothing to prove")
      // candidate volume: uncapped Σ C(m,2) vs capped Σ[small] C(m,2) + Σ[big] (m−1)
      val uncapped = sizes.agg(sum(col("m") * (col("m") - 1) / 2).cast("long")).as[Long].head()
      val capped = sizes.agg(sum(
        when(col("m") <= cap, col("m") * (col("m") - 1) / 2)
          .otherwise(col("m") - 1)).cast("long")).as[Long].head()
      assert(uncapped > capped * 10,
        s"cap does not bound the volume: uncapped $uncapped vs capped $capped")
      // production pair set stays within the capped bound (dedup across bands only shrinks)
      val pairs = graft.ops.DedupOps.diagPairs(spark, skewDir).cache()
      try {
        assert(pairs.count() <= capped)
        // connectivity: every member of the biggest bucket still lands in ONE cluster —
        // the hub star is exactly the edge set that keeps a mega-bucket connected
        val big = graft.ops.DedupOps.diagBands(spark, skewDir).as("b")
          .join(sizes.where(col("m") === maxBucket).limit(1).as("s"),
            col("b.band") === col("s.band") && col("b.sig") === col("s.sig"))
          .select(col("b.doc_id").as("doc_id"))
        val labels = SparkEntry.queries("x31_dup_clusters")(spark, skewDir)
          .join(big, "doc_id")
        assert(labels.select("cluster").distinct().count() === 1L,
          "hub-star cap broke mega-bucket connectivity")
      } finally { pairs.unpersist(); () }
    } finally { sizes.unpersist(); () }
  }

  test("LSH bucket cap is invariant on the benign correctness corpus (sf0.01)") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val cap = graft.ops.DedupOps.LshBucketCap
    val bands = graft.ops.DedupOps.diagBands(spark, dir).cache()
    try {
      val maxBucket = bands.groupBy("band", "sig").agg(count(lit(1)).as("m"))
        .agg(max("m")).as[Long].head()
      assert(maxBucket <= cap,
        s"benign sf0.01 corpus has a bucket of $maxBucket > cap $cap — the cap would " +
          "change the oracle contract at the driver's correctness scale")
      // and therefore the capped production pair set IS the classic enumeration
      val classic = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_bands"))
      val produced = graft.ops.DedupOps.diagPairs(spark, dir)
      assert(produced.exceptAll(classic).isEmpty && classic.exceptAll(produced).isEmpty,
        "capped pair set differs from the classic enumeration on a benign corpus")
    } finally { bands.unpersist(); () }
  }

  test("x127's containment prefix is hot-shingle-immune on the skewed corpus") {
    import spark.implicits._
    // The planted boilerplate phrase gives its interior shingles df ≈ half
    // the corpus. A df-ORDERED prefix keeps only each doc's globally rarest
    // shingles, so the hot shingles must appear in ZERO prefixes — the
    // candidate join never probes a hot key, which is exactly why the
    // containment join needs no df-cap or bucket-cap heuristic.
    val docs = Tables(spark, skewDir, "documents")
    val w = split(col("text"), " ")
    val sh = docs.select(col("doc_id"), explode(
        when(size(w) >= 3, transform(sequence(lit(0), size(w) - 3), i =>
          concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))))
          .otherwise(array())).as("g"))
      .distinct()
    val withDf = sh.join(sh.groupBy("g").agg(count(lit(1)).as("df")), "g")
    val pref = withDf
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("df"), col("g"))))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      // the production EXTENDED prefix (n − mo + keff, DedupOps x127)
      .withColumn("mo", expr("(4*n + 4) div 5"))
      .withColumn("keff",
        greatest(lit(1), least(lit(8), expr("(n - (3*n + 4) div 5 + 1) - (n - mo)"))))
      .where(col("rk") <= col("n") - col("mo") + col("keff"))
      .cache()
    try {
      val hotDf = withDf.where(col("g") === "beta gamma delta")
        .select("df").as[Long].head()
      assert(hotDf > graft.ops.DedupOps.DfCap,
        s"hot shingle df $hotDf too small — fixture can't witness immunity")
      assert(pref.where(col("g") === "beta gamma delta").count() === 0L,
        "a hot shingle entered a containment prefix — the df order is broken")
      // candidate volume Σ_prefix (df−1) stays a per-doc-constant multiple
      // of the corpus (measured ~65/doc here), an order below the hot
      // shingle's df² blowup the prefix order exists to dodge
      val candVol = pref.agg(sum(col("df") - 1)).as[Long].head()
      val nDocs = docs.count()
      assert(candVol < 150L * nDocs,
        s"prefix candidate volume $candVol not linear-bounded (docs $nDocs)")
      assert(candVol * 10 < hotDf * hotDf,
        s"volume $candVol not clearly below the hot-key blowup ${hotDf * hotDf}")
      // and the production query itself completes on the hostile corpus
      assert(SparkEntry.queries("x127_containment_join")(spark, skewDir).count() >= 0)
    } finally { pref.unpersist(); () }
  }

  test("AQE skew-join engages on the t02-shaped fact join over the skewed supplier") {
    withSQLConf(spark)(
      "spark.sql.autoBroadcastJoinThreshold"                        -> "-1",
      "spark.sql.adaptive.skewJoin.enabled"                         -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor"           -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes"             -> "32KB",
      "spark.sql.adaptive.coalescePartitions.enabled"               -> "false") {
      val li   = Tables(spark, skewDir, "lineitem")
      val supp = Tables(spark, skewDir, "supplier")
      val q = li.join(supp, col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey"))
        .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      q.collect()
      val plan = q.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(plan.contains("skew=true"),
        "AQE did not split the hot supplier partition:\n" +
          plan.linesIterator.take(40).mkString("\n"))
    }
  }
}
