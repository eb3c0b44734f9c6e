package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** One spec per declared operator (SURVEY.md §2.B): every SparkEntry query
  * runs on sf0.001 and yields a well-formed, deterministic result. The
  * value-level gate is the driver's DuckDB oracle (t2, sf0.01); this suite is
  * the fast structural check that keeps `sbt test` meaningful per operator.
  */
class QueriesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("computeParallel spreads under-partitioned input and is identity otherwise") {
    import spark.implicits._
    val target = spark.sparkContext.defaultParallelism
    // under-partitioned: a 1-partition frame spreads to the session target
    val narrow = spark.range(100).toDF("id").coalesce(1)
    assert(narrow.rdd.getNumPartitions == 1)
    val spread = graft.ops.Tables.computeParallel(narrow)
    assert(spread.rdd.getNumPartitions == target)
    assert(spread.select("id").as[Long].collect().sorted.toSeq == (0L until 100L))
    // at-or-above target: no repartition node is added at all
    val wide = spark.range(100).toDF("id").repartition(target)
    assert(graft.ops.Tables.computeParallel(wide) eq wide)
  }

  test("computeParallel is a safe identity on streaming and file-scan inputs") {
    // streaming: partitioning is the source's call — identity, no throw
    // (the old rdd.getNumPartitions probe threw on any streaming frame)
    val stream = spark.readStream.format("rate").load()
    assert(stream.isStreaming)
    assert(graft.ops.Tables.computeParallel(stream) eq stream)
    // file scan: the under-partitioned single-file corpus spreads without
    // building (and discarding) an RDD lineage first
    val docs = graft.ops.Tables(spark, sfDir, "documents")
    val spread = graft.ops.Tables.computeParallel(docs)
    assert(spread.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism)
  }

  test("flagship entry returns rows") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
  }

  test("every query has an oracle or is explicitly rows-only") {
    val withOracle = SparkEntry.oracleSql.keySet
    val all        = SparkEntry.queries.keySet
    assert(withOracle.subsetOf(all))
  }

  // One test per operator: runs, has its declared total order, and the
  // queries that must be non-empty at sf0.001 are non-empty.
  private val mayBeEmpty =
    Set("r04_reconcile_diff", "t05_forecast_revenue", "x27_contamination")
  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and is well-formed") {
      val df   = fn(spark, sfDir)
      val rows = df.collect()
      if (!mayBeEmpty(name)) assert(rows.nonEmpty, s"$name returned 0 rows")
      assert(df.columns.nonEmpty)
      assert(df.columns.distinct.length == df.columns.length, "duplicate column names")
    }
  }

  test("f05 HLL estimate stays within the sketch's error bound per group") {
    // rsd=0.01 is the requested relative standard deviation; 4 sigma is a
    // once-in-10^4 false-failure bound, so a breach means a broken sketch,
    // not noise. The query carries the exact count alongside the estimate.
    val rows = graft.ops.FuncOps.approxDistinctRaw(spark, sfDir).collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_users").toDouble
      val exact  = r.getAs[Long]("exact_users").toDouble
      assert(math.abs(approx - exact) <= math.max(4.0, 4 * 0.01 * exact),
        s"event_type=${r.get(0)}: approx=$approx exact=$exact beyond 4x rsd")
    }
  }

  test("f12 exact-statistic regression agrees with the native regr_*/corr aggregates") {
    // The query derives slope/intercept/corr/r² from exact int64 sums (the
    // partitioning-independent formulation); Spark's native aggregates merge
    // running means in float. They must agree to far beyond the 6-dp oracle
    // rounding — this covers the native family without putting its
    // merge-order float noise on the oracle contract.
    import org.apache.spark.sql.functions._
    val pts = graft.ops.Tables(spark, sfDir, "events").select(
      col("event_type"),
      hour(col("ts")).cast("double").as("x"),
      floor(col("value") * 100 + 0.5).as("y"))
    val native = pts.groupBy("event_type").agg(
        regr_slope(col("y"), col("x")).as("slope"),
        regr_intercept(col("y"), col("x")).as("intercept"),
        corr(col("y"), col("x")).as("corr_xy"),
        regr_r2(col("y"), col("x")).as("r2"))
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = SparkEntry.queries("f12_regression_stats")(spark, sfDir).collect()
    assert(exact.nonEmpty)
    exact.foreach { r =>
      val n = native(r.getString(0))
      for (c <- Seq("slope", "intercept", "corr_xy", "r2"))
        assert(math.abs(r.getAs[Double](c) - n.getAs[Double](c)) < 1e-6,
          s"${r.getString(0)}.$c: exact=${r.getAs[Double](c)} native=${n.getAs[Double](c)}")
    }
  }

  test("x31 label propagation converges in O(log n) rounds on a 512-node path") {
    // worst-case diameter graph: a path 0-1-2-...-511. Plain min-label
    // propagation needs 511 rounds; pointer jumping (engaged from round 3)
    // must close it in ~2 + log2(512) — the empirical proof behind the
    // "O(log diameter) rounds" claim at corpus scale.
    import spark.implicits._
    val n = 512
    val forward   = (0L until (n - 1).toLong).map(i => (i, i + 1))
    val edges     = (forward ++ forward.map(_.swap)).toDF("a", "b")
    val (labels, rounds) = graft.ops.DedupOps.propagateMinLabels(edges)
    val out = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == n)
    assert(out.values.forall(_ == 0L), "every node must join cluster 0")
    assert(rounds <= 20, s"pointer jumping should close a $n-path in ~11 rounds, took $rounds")
  }

  test("x31 large-star/small-star closes worst-case graphs in no more rounds than pointer jumping") {
    // The SURVEY §9 scale path raced against the shipped default on the two
    // adversarial shapes: a max-diameter path and a broom (star of chains —
    // high-degree root AND deep tails). Both algorithms must produce the
    // identical single component; LS/SS must need no MORE rounds than
    // pointer jumping on either graph (it is the stated 100 TB default).
    import spark.implicits._
    def path(n: Int, off: Long = 0L) =
      (0L until (n - 1).toLong).map(i => (off + i, off + i + 1))
    // broom: 8 chains of 64 hanging off node 0
    val broom = (0 until 8).flatMap { c =>
      val off = 1L + c * 64L
      (0L, off) +: path(64, off)
    }
    for (fwd <- Seq(path(512), broom)) {
      val edges = (fwd ++ fwd.map(_.swap)).toDF("a", "b")
      val (pjL, pjRounds)   = graft.ops.DedupOps.propagateMinLabels(edges)
      val (lssL, lssRounds) = graft.ops.DedupOps.largeStarSmallStar(edges)
      val pj  = pjL.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val lss = lssL.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(lss == pj, "the two algorithms must label identically")
      assert(lss.values.forall(_ == 0L), "every node must join cluster 0")
      info(s"n=${lss.size}: pointer-jumping $pjRounds rounds, large-star/small-star $lssRounds")
      assert(lssRounds <= pjRounds,
        s"LS/SS took $lssRounds rounds vs pointer jumping's $pjRounds")
    }
  }

  test("x31 large-star/small-star labels random graphs identically to pointer jumping") {
    // Randomized equivalence lock for the round-6 LS/SS restructure (the
    // no-separate-node-set label extraction): on arbitrary multigraphs —
    // duplicate edges, self-loops, isolated-from-each-other components,
    // skewed degree — LS/SS and pointer jumping must emit the SAME
    // (node → component-min) map, with every original non-self-loop node
    // labeled. A driver-side union-find is the ground truth.
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 40 + trial * 20
      val m = n + rnd.nextInt(n)
      // no self-loops (production pair sets are strict doc_a < doc_b;
      // propagateMinLabels would label a self-loop-only node, LS/SS drops
      // it — a divergence no real input can produce); duplicates stay in
      val raw = Seq.fill(m) {
        val a = rnd.nextInt(n)
        val b = (a + 1 + rnd.nextInt(n - 1)) % n
        (a.toLong, b.toLong)
      }
      val edges = (raw ++ raw.map(_.swap)).toDF("a", "b")
      // ground truth: union-find over the same edge list
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      raw.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = raw.flatMap { case (a, b) => Seq(a, b) }.distinct
      val truth = nodes.map(v => v -> find(v.toInt).toLong).toMap
      // re-root: union-find roots are path-dependent; the algorithms label
      // by component MIN, so canonicalize truth to min-per-root first
      val rootMin = truth.groupBy(_._2).map { case (r, kv) => r -> kv.keys.min }
      val want = truth.map { case (v, r) => v -> rootMin(r) }
      val (pjL, _)  = graft.ops.DedupOps.propagateMinLabels(edges)
      val (lssL, _) = graft.ops.DedupOps.largeStarSmallStar(edges)
      val pj  = pjL.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val lss = lssL.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(lss == want, s"trial $trial: LS/SS diverges from union-find")
      assert(pj == want, s"trial $trial: pointer jumping diverges from union-find")
    }
  }

  test("f11 approx_percentile lands between the exact p40 and p60 per group") {
    val rows = graft.ops.FuncOps.approxPercentileRaw(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Double]("approx_med")
      val p40    = r.getAs[Double]("exact_p40")
      val p60    = r.getAs[Double]("exact_p60")
      assert(approx >= p40 && approx <= p60,
        s"event_type=${r.get(0)}: approx=$approx outside [$p40, $p60]")
    }
  }

  test("latest-by-key emits exactly one row per key (O-16)") {
    val n     = SparkEntry.queries("r02_latest_by_key")(spark, sfDir)
    val total = n.count()
    assert(n.select("user_id").distinct().count() == total)
  }

  test("bounded poll respects its capacity (O-6/O-7)") {
    assert(SparkEntry.queries("r01_poll_batch")(spark, sfDir).count() <= 10)
  }

  test("minhash LSH candidates include the exact-jaccard near-dups") {
    val lsh = SparkEntry.queries("x02_minhash_lsh")(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val jac = SparkEntry.queries("x04_ngram_jaccard")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every high-jaccard pair (>= 0.6) should surface as an LSH candidate
    val missed = jac -- lsh
    assert(missed.isEmpty, s"LSH missed high-jaccard pairs: $missed")
  }

  test("x88 span-dedup invariants hold and shared spans exist") {
    val rows = SparkEntry.queries("x88_span_dedup")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, dup, ppm) =
        (r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup"), r.getAs[Long]("dup_ppm"))
      assert(dup >= 0 && dup <= n)
      assert(ppm == dup * 1000000L / n)
    }
    // the synthetic corpus repeats 5-gram spans across docs — the signal
    // the operator exists to measure must be present
    assert(rows.map(_.getAs[Long]("n_dup")).sum > 0)
  }

  test("x89 BPE pair counts: vocabulary-weighted aggregation equals token-level counting") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("x89_bpe_pairs")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("cnt"))).toSeq
    assert(got.size == 50)
    // brute force without the vocab pre-aggregation: explode every token
    val brute = graft.ops.Tables(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) >= 2)
      .select(explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(50).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("cnt"))).toSeq
    assert(got == brute)
  }

  test("x90 bloom prefilter is lossless: results equal the exact no-bloom computation") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("x90_bloom_novelty")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_known"), r.getAs[Long]("novel_ppm"))).toSeq
    assert(got.nonEmpty)
    assert(got.map(_._3).sum > 0, "no known grams — the verify path never ran")
    // exact recompute with a plain semi-join (no bloom in the plan)
    val w = split(col("text"), " ")
    def grams(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      explode(when(size(w) >= 8,
        transform(sequence(lit(1), size(w) - 7),
          i => substring(md5(concat_ws(" ",
            element_at(w, i), element_at(w, i + 1), element_at(w, i + 2),
            element_at(w, i + 3), element_at(w, i + 4), element_at(w, i + 5),
            element_at(w, i + 6), element_at(w, i + 7))), 1, 16)))
        .otherwise(array().cast("array<string>"))).as("g"))
    val d     = graft.ops.Tables(spark, sfDir, "documents")
    val ref   = grams(d.where(col("source") =!= "src0")).select("g").distinct()
    val inc   = grams(d.where(col("source") === "src0")).distinct()
    val known = inc.join(ref, Seq("g"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_known"))
    val exact = inc.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      .join(known, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_known"), lit(0L)).as("n_known"),
        expr("(n_grams - coalesce(n_known, 0)) * 1000000 div n_grams").as("novel_ppm"))
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_known"), r.getAs[Long]("novel_ppm"))).toSeq
    assert(got == exact)
  }

  test("x91 banded simhash join equals brute-force all-pairs Hamming (pigeonhole recall = 100%)") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("x91_simhash_bands")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("ham"))).toSet
    assert(got.nonEmpty)
    val sh = graft.ops.Tables(spark, sfDir, "documents")
      .where(col("text").isNotNull)
      .select(col("doc_id"), graft.functions.SimHashFunctions.simhash32(col("text")).as("sh"))
    val brute = sh.select(col("doc_id").as("doc_a"), col("sh").as("sa"))
      .crossJoin(sh.select(col("doc_id").as("doc_b"), col("sh").as("sb")))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("ham", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
      .where(col("ham") <= 2).select("doc_a", "doc_b", "ham").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("ham"))).toSet
    assert(got == brute)
  }

  test("f15 listagg strings are sorted and consistent with their cardinalities") {
    val rows = SparkEntry.queries("f15_listagg")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nations = r.getAs[String]("nations").split(",").toSeq
      assert(nations == nations.sorted, "nation roster not sorted")
      assert(nations.size == r.getAs[Long]("n_nations"))
      val st = r.getAs[String]("statuses").split(",").toSeq
      assert(st == st.sorted && st.distinct == st, "status listagg not sorted-distinct")
    }
  }

  test("x92 row-local skip-gram counts equal the position-join construction") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("x92_skipgram_cooc")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("cnt"))).toSeq
    assert(got.size == 40)
    // independent construction: positional self-join within each doc
    val pos = graft.ops.Tables(spark, sfDir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("i", "w")))
    val brute = pos.as("a")
      .join(pos.as("b"), col("a.doc_id") === col("b.doc_id") &&
        col("b.i") > col("a.i") && col("b.i") <= col("a.i") + 3)
      .select(concat_ws(" ", col("a.w"), col("b.w")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(40).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("cnt"))).toSeq
    assert(got == brute)
  }

  test("x93 recall equals the direct overlap of x06 exact top-3 and x07 LSH results") {
    val got = SparkEntry.queries("x93_ann_recall")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_hit"), r.getAs[Long]("recall_ppm"))).toSeq
    assert(got.nonEmpty)
    got.foreach { case (_, h, ppm) =>
      assert(h >= 0 && h <= 3); assert(ppm == h * 1000000L / 3)
    }
    val exact = SparkEntry.queries("x06_cosine_topk")(spark, sfDir).collect()
      .filter(_.getAs[Number]("rk").longValue <= 3)
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_id")).toSet).toMap
    val lsh = SparkEntry.queries("x07_ann_lsh")(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_id")).toSet).toMap
    val expect = exact.map { case (q, top3) =>
      (q, (top3 intersect lsh.getOrElse(q, Set.empty)).size.toLong)
    }
    assert(got.map(g => (g._1, g._2)).toMap == expect)
  }

  test("x94 PQ ranking is well-formed and its recall@3 vs exact cosine is nonzero") {
    val rows = SparkEntry.queries("x94_pq_ann")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // per query: ranks 1..3, approx distance non-decreasing with rank
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      val byRk = rs.sortBy(_.getAs[Number]("rk").intValue)
      assert(byRk.map(_.getAs[Number]("rk").intValue).toSeq == (1 to byRk.length))
      val ds = byRk.map(_.getAs[Long]("approx_d")).toSeq
      assert(ds == ds.sorted)
    }
    // recall vs the exact top-3 — PQ is approximate, but on this corpus it
    // must find SOME of the true neighbors (x69's int8-SQ bar is 0.60)
    val exact = SparkEntry.queries("x06_cosine_topk")(spark, sfDir).collect()
      .filter(_.getAs[Number]("rk").longValue <= 3)
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_id")).toSet).toMap
    val pq = rows.groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_id")).toSet).toMap
    val hits  = exact.map { case (q, t3) => (t3 intersect pq.getOrElse(q, Set.empty)).size }.sum
    val total = exact.map(_._2.size).sum
    assert(hits > 0, s"PQ recall 0/$total — codes carry no signal")
    info(s"PQ recall@3 = $hits/$total")
  }

  test("x95 vocab growth is a true cumulative curve ending at the distinct word count") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("x95_vocab_growth")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("bucket")).toSeq == (1L to 10L))
    var cum = 0L
    rows.foreach { r =>
      cum += r.getAs[Long]("new_words")
      assert(r.getAs[Long]("vocab") == cum, s"bucket ${r.getAs[Long]("bucket")} cumulative drift")
    }
    val distinctWords = graft.ops.Tables(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0).select("w").distinct().count()
    assert(cum == distinctWords, "final vocab != corpus distinct word count")
  }

  test("x96 audio energy equals a direct recompute from the document bytes") {
    val rows = SparkEntry.queries("x96_mm_audio_energy")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val expect = graft.ops.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .filter(r => r.getAs[Long]("doc_id") % 3 == 2 && r.getAs[String]("text") != null)
      .flatMap { r =>
        val b = r.getAs[String]("text").getBytes("UTF-8")
        val n = b.length / 2
        if (n == 0) None
        else {
          val frames = (0 until n).grouped(64).map(_.map { k =>
            math.abs((((b(2 * k) & 0xff) | (b(2 * k + 1) << 8)).toShort).toLong)
          }.sum).toSeq
          Some((r.getAs[Long]("doc_id"),
            (n.toLong, frames.length.toLong, frames.sum, frames.max)))
        }
      }.toMap
    rows.foreach { r =>
      val got = (r.getAs[Long]("n_samples"), r.getAs[Long]("n_frames"),
        r.getAs[Long]("energy"), r.getAs[Long]("peak_energy"))
      assert(got == expect(r.getAs[Long]("doc_id")))
      assert(got._4 <= got._3 && got._2 == (got._1 + 63) / 64)
    }
    assert(rows.length == expect.size)
  }

  test("x97 IVF-PQ neighbors come only from probed cells and recall is nonzero") {
    val rows = SparkEntry.queries("x97_ivfpq_ann")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      val ds = rs.sortBy(_.getAs[Number]("rk").intValue).map(_.getAs[Long]("approx_d")).toSeq
      assert(ds == ds.sorted)
    }
    val exact = SparkEntry.queries("x06_cosine_topk")(spark, sfDir).collect()
      .filter(_.getAs[Number]("rk").longValue <= 3)
      .groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_id")).toSet).toMap
    val got = rows.groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_id")).toSet).toMap
    val hits  = exact.map { case (q, t3) => (t3 intersect got.getOrElse(q, Set.empty)).size }.sum
    val total = exact.map(_._2.size).sum
    assert(hits > 0, s"IVF-PQ recall 0/$total")
    info(s"IVF-PQ recall@3 = $hits/$total")
  }

  test("x25 chunk-dedup counts are consistent (n_dup = n_chunks - n_distinct)") {
    val rows = SparkEntry.queries("x25_chunk_dedup")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dup") == r.getAs[Long]("n_chunks") - r.getAs[Long]("n_distinct"))
      assert(r.getAs[Long]("n_dup") >= 0)
    }
  }

  test("x27 contamination only ever flags corpus documents, never the benchmark split") {
    val rows = SparkEntry.queries("x27_contamination")(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 10 != 0, "benchmark doc flagged as contaminated")
      assert(r.getAs[Long]("n_hits") > 0)
    }
  }

  test("x28 hash sampling is deterministic and in a sane rate band") {
    val a = SparkEntry.queries("x28_hash_sample")(spark, sfDir).collect()
    val b = SparkEntry.queries("x28_hash_sample")(spark, sfDir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq) // content-hash, not RNG
    val total   = a.map(_.getAs[Long]("n_total")).sum
    val sampled = a.map(_.getAs[Long]("n_sampled")).sum
    // 10% nominal; the sf0.001 corpus is 50 docs, so allow a wide band
    assert(sampled >= 0 && sampled <= total * 3 / 10)
  }

  test("x29 packing bins conserve tokens and number contiguously from 0") {
    val rows = SparkEntry.queries("x29_seq_packing")(spark, sfDir).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.nonEmpty)
    bySource.foreach { case (_, rs) =>
      val bins = rs.map(_.getAs[Long]("bin")).sorted.toSeq
      // bins start at 0 and are unique per source; gaps are LEGAL (a doc
      // longer than 512 tokens advances the next bin by more than one), so
      // contiguity is deliberately not asserted
      assert(bins.head == 0L, "first bin must be 0")
      assert(bins.distinct == bins, "bin numbers must be unique per source")
      assert(rs.map(_.getAs[Long]("bin_tokens")).sum > 0)
    }
    // token conservation: packed totals equal raw per-source token counts
    import org.apache.spark.sql.functions.{col => c, size => sz, split => sp, sum => su}
    val raw = graft.ops.Tables(spark, sfDir, "documents")
      .groupBy("source").agg(su(sz(sp(c("text"), " ")).cast("long")).as("t"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("t")).toMap
    bySource.foreach { case (src, rs) =>
      assert(rs.map(_.getAs[Long]("bin_tokens")).sum == raw(src))
    }
  }

  test("x30 stratified top-k ranks by diversity within each stratum") {
    val rows = SparkEntry.queries("x30_stratified_topk")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r.getAs[String]("source"), r.getAs[String]("lang"))).foreach {
      case (_, rs) =>
        val sorted = rs.sortBy(_.getAs[Long]("rn"))
        assert(sorted.map(_.getAs[Long]("rn")).toSeq == (1L to sorted.length).toSeq)
        val uniques = sorted.map(_.getAs[Long]("n_unique")).toSeq
        assert(uniques == uniques.sorted.reverse, "n_unique must be non-increasing by rank")
    }
  }

  test("x31 clusters are transitive closures of the LSH pairs with min-id representatives") {
    val clusters = SparkEntry.queries("x31_dup_clusters")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("cluster"), r.getAs[Long]("cluster_size")))
      .toMap
    val pairs = SparkEntry.queries("x02_minhash_lsh")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.nonEmpty && clusters.nonEmpty)
    // every candidate pair lands in one cluster (transitivity base case)
    pairs.foreach { case (a, b) =>
      assert(clusters(a)._1 == clusters(b)._1, s"pair ($a,$b) split across clusters")
    }
    // representative is the smallest member; sizes match the member count
    clusters.groupBy(_._2._1).foreach { case (rep, members) =>
      assert(members.keys.min == rep)
      assert(members.values.forall(_._2 == members.size))
    }
  }

  test("x33 centroids: 64 dims per label, counts match, integer sums exact") {
    val rows = SparkEntry.queries("x33_label_centroids")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byLabel = rows.groupBy(_.getAs[Long]("label"))
    // expected from a driver-side recompute over the raw table
    val raw = graft.ops.Tables(spark, sfDir, "embeddings")
      .select("label", "embedding").collect()
      .map(r => (r.getAs[Int]("label").toLong, r.getSeq[Float](1)))
    val expSums = raw
      .flatMap { case (l, v) => v.zipWithIndex.map { case (x, p) =>
        ((l, p + 1L), math.floor(x.toDouble * 1000000 + 0.5).toLong) } }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val expN = raw.groupBy(_._1).map { case (l, vs) => l -> vs.length.toLong }
    assert(byLabel.keySet == expN.keySet)
    byLabel.foreach { case (l, rs) =>
      assert(rs.map(_.getAs[Long]("i")).sorted.toSeq == (1L to 64L), s"label $l dims")
      rs.foreach { r =>
        val i = r.getAs[Long]("i")
        assert(r.getAs[Long]("n") == expN(l), s"label $l count")
        assert(r.getAs[Long]("sum_ppm") == expSums((l, i)), s"label $l dim $i sum")
      }
    }
  }

  test("x34/x38 integer ratios are exact and internally consistent") {
    val tfidf = SparkEntry.queries("x34_tfidf_topterms")(spark, sfDir).collect()
    tfidf.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq == (1 to rs.length), s"$src ranks")
      assert(rs.length <= 3)
    }
    val ttr = SparkEntry.queries("x38_type_token")(spark, sfDir).collect()
    ttr.foreach { r =>
      val (w, t, ppm) =
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_types"), r.getAs[Long]("ttr_ppm"))
      assert(t <= w && ppm == t * 1000000L / w)
    }
  }

  test("x36 overlap pairs are canonical (a < b) and positive") {
    SparkEntry.queries("x36_source_overlap")(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
      assert(r.getAs[Long]("n_shared") > 0)
    }
  }

  test("x37 mixture sampling is deterministic and never keeps more than total") {
    val a = SparkEntry.queries("x37_mixture_sample")(spark, sfDir).collect()
    val b = SparkEntry.queries("x37_mixture_sample")(spark, sfDir).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    a.foreach(r => assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_total")))
  }

  test("x04 df-cap is behavior-neutral below the cap (0.6 threshold)") {
    val capped   = graft.ops.DedupOps.jaccardPairs(spark, sfDir, 1000).collect().toSet
    val uncapped = graft.ops.DedupOps.jaccardPairs(spark, sfDir, Int.MaxValue).collect().toSet
    assert(capped == uncapped)
    assert(capped.nonEmpty)
  }

  test("ANN recall@3 vs exact top-k: multiprobe dominates single-probe; all variants non-trivial") {
    import org.apache.spark.sql.functions.{col => c}
    def top3(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, sfDir).where(c("rk") <= 3)
        .select("q_id", "n_id").collect().toSeq
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = top3("x06_cosine_topk")
    def recall(name: String): Double = {
      val variant = top3(name)
      val hits = exact.toSeq.map { case (q, ex) =>
        (variant.getOrElse(q, Set.empty) & ex).size.toDouble / ex.size
      }
      hits.sum / exact.size
    }
    val (rLsh, rMulti, rIvf, rTables) =
      (recall("x07_ann_lsh"), recall("x21_ann_multiprobe"),
        recall("x22_ann_ivf"), recall("x24_ann_lsh_multitable"))
    info(f"recall@3  lsh=$rLsh%.3f  multiprobe=$rMulti%.3f  ivf=$rIvf%.3f  multitable=$rTables%.3f")
    // multiprobe's candidate buckets are a superset of the single probe's, and
    // a global-top-3 member present in a candidate set always survives its
    // top-3 (at most 2 items outrank it anywhere) — so recall is monotone
    assert(rMulti >= rLsh)
    assert(rLsh > 0.0 && rIvf > 0.0 && rTables > 0.0,
      "ANN variants must recover some exact neighbors")
  }

  test("x71 LOCF fill: every gap day carries the most recent prior value") {
    val rows = SparkEntry.queries("x71_gap_fill")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, days) =>
      var prev = -1L
      days.sortBy(_.getDate(1).toString).foreach { r =>
        val v      = r.getLong(2)
        val filled = r.getBoolean(3)
        if (filled) assert(v == prev, s"gap day must carry prior value: $r")
        else assert(v != -1L, s"observed day can't be the leading-gap marker: $r")
        prev = v
      }
    }
  }

  test("x72 audience accounting: cumulative = running sum of news, 7-day actives bound dailies") {
    val rows = SparkEntry.queries("x72_cumulative_uniques")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var running = 0L
    rows.foreach { r =>
      running += r.getLong(1)
      assert(r.getLong(2) == running, s"cum_users must be the running sum of n_new: $r")
      assert(r.getLong(4) >= r.getLong(3), s"trailing-7-day actives can't undercut the day's actives: $r")
    }
    // the final cumulative count is the corpus's total distinct users
    val total = graft.ops.Tables(spark, sfDir, "events")
      .select("user_id").distinct().count()
    assert(running == total)
  }

  test("x85's gini arithmetic survives counts whose squares overflow int64") {
    // a source-language count of 4e9 squares to 1.6e19 > Long.MAX — the
    // decimal(38,0) statistic must carry it exactly (ANSI mode would throw
    // on the naive int64 product). Expected value from exact integer math:
    // 1e6 - (2·(4e9)² + (2e9)²)·1e6 // (1e10)² = 640000.
    val got = spark.sql(
      """SELECT CAST(1000000 AS BIGINT) -
        |       CAST((sum(CAST(c AS DECIMAL(38,0)) * c) * 1000000)
        |            div (sum(CAST(c AS DECIMAL(38,0))) * sum(CAST(c AS DECIMAL(38,0)))) AS BIGINT) AS gini_ppm
        |FROM VALUES (4000000000L), (4000000000L), (2000000000L) AS t(c)""".stripMargin)
      .head().getLong(0)
    assert(got == 640000L, s"expected 640000, got $got")
  }

  test("x75 rendezvous rebalance: documents move ONLY into the new shard, ~1/9 of the corpus") {
    val rows = SparkEntry.queries("x75_shard_rebalance")(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq == (0 to 8), "all nine shards populated")
    rows.foreach { r =>
      val (shard, nDocs, nMoved) = (r.getInt(0), r.getLong(1), r.getLong(2))
      if (shard == 8) assert(nMoved == nDocs, "every resident of the new shard just moved in")
      else assert(nMoved == 0L, s"rendezvous must not relocate docs between surviving shards: $r")
    }
    val total = rows.map(_.getLong(1)).sum
    val moved = rows.map(_.getLong(2)).sum
    val frac  = moved.toDouble / total
    info(f"moved $moved of $total (${frac * 100}%.1f%% — expected ≈ 11.1%%)")
    assert(frac > 0.03 && frac < 0.25, f"movement fraction $frac%.3f far from 1/9")
  }

  test("x69 int8-quantized ranking recovers the exact cosine top-5") {
    def top5(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, sfDir)
        .select("q_id", "n_id").collect().toSeq
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = top5("x06_cosine_topk")
    val quant = top5("x69_quantized_topk")
    val recall = exact.toSeq.map { case (q, ex) =>
      (quant.getOrElse(q, Set.empty) & ex).size.toDouble / ex.size
    }.sum / exact.size
    info(f"quantized recall@5 = $recall%.3f")
    // min/max int8 codes scoring unnormalized integer dot vs exact cosine:
    // the coarse candidate stage (production re-ranks ~20 candidates with
    // exact floats, recall 0.86 measured at sf0.001/sf0.01) — raw top-5
    // overlap must still clear half the exact answer
    assert(recall >= 0.5, f"quantized recall collapsed: $recall%.3f")
  }

  test("x98 BM25 matches a driver-side exact recomputation") {
    val docs = graft.ops.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val qterms = Seq("spark", "join", "window")
    val n = docs.size.toLong
    val l = docs.valuesIterator.map(_.size.toLong).sum
    val df = qterms.map(t => t -> docs.valuesIterator.count(_.contains(t)).toLong).toMap
    // independent arithmetic: BigInt accumulation, same IEEE chain for the
    // tf-saturation ppm (left-assoc 22.0*tf*l*1e6 over the exact int64
    // denominator 10*tf*l + 3*l + 9*dl*n)
    val scores = docs.flatMap { case (doc, toks) =>
      val dl = toks.size.toLong
      val acc = qterms.map { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0) BigInt(0)
        else {
          val idf = (2 * (n - df(t)) + 1) * 1000000L / (2 * df(t) + 1)
          val tfn = math.floor(22.0 * tf * l * 1000000
            / (10 * tf * l + 3 * l + 9 * dl * n) + 0.5).toLong
          BigInt(idf) * BigInt(tfn)
        }
      }.sum
      if (acc == 0) None else Some(doc -> (acc / 1000000).toLong)
    }.toSeq
    val expect = scores.sortBy { case (doc, s) => (-s, doc) }.take(20)
    val got = SparkEntry.queries("x98_bm25_rank")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
  }

  test("x99 heavy-hitter prefilter is lossless: equals the sketch-free plan") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("x99_heavy_hitters")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty, "no heavy hitters at the 1/50 threshold — fixture drift?")
    val tok = graft.ops.Tables(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("term"))
    val exact = tok.groupBy("term").agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(tok.agg(count(lit(1)).as("t"))))
      .where(col("c") * 50 >= col("t"))
      .select(col("term"), col("c"), expr("c * 1000000 div t").as("share_ppm"))
      .orderBy(col("c").desc, col("term")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == exact)
  }

  test("x100 zone maps: date-partitioned layout scans only matching rows") {
    val rows = SparkEntry.queries("x100_zone_skipping")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val dp = rows("datepart"); val ins = rows("insertion")
    // pruning changes cost, never the answer
    assert(dp.getAs[Long]("rows_match") == ins.getAs[Long]("rows_match"))
    // the datepart zone IS the predicate month: scanned == matched exactly
    assert(dp.getAs[Long]("read_amp_ppm") == 1000000L)
    // insertion-order zones interleave dates — min/max pruning is blind
    assert(ins.getAs[Long]("rows_scanned") >= 10 * dp.getAs[Long]("rows_scanned"),
      s"layout contrast collapsed: ${ins.getAs[Long]("rows_scanned")} vs ${dp.getAs[Long]("rows_scanned")}")
  }

  test("x101 quota sample: exactly 100 rows, equal to the window-sort plan") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("x101_quota_sample")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.size == 100, s"quota total drifted: ${got.size}")
    // recompute with the oracle's full per-source window sort (the shape
    // the bounded UDAF replaces) — selection must agree exactly
    val d = graft.ops.Tables(spark, sfDir, "documents")
    val cnt = d.groupBy("source").agg(count(lit(1)).as("c"))
    val tot = cnt.agg(sum(col("c")).as("n"))
    val base = cnt.crossJoin(broadcast(tot))
      .withColumn("q0", expr("100 * c div n"))
      .withColumn("rem", expr("(100 * c) % n"))
    val f = base.agg(sum(col("q0")).as("f"))
    val quota = base.crossJoin(broadcast(f))
      .withColumn("rr", row_number().over(Window.orderBy(col("rem").desc, col("source"))))
      .withColumn("q", col("q0") + when(col("rr") <= lit(100) - col("f"), 1L).otherwise(0L))
      .select(col("source"), col("q"))
    val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
    val expect = d.select(col("source"), col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .join(quota, "source").where(col("rk") <= col("q"))
      .select("source", "rk", "doc_id")
      .orderBy("source", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
  }

  test("x102 deletion-key blocking has guaranteed recall vs brute-force all-pairs") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("x102_fuzzy_prefix_join")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.nonEmpty, "no fuzzy prefix pairs at this sf — fixture drift?")
    val w = split(col("text"), " ")
    val p = graft.ops.Tables(spark, sfDir, "documents")
      .where(size(w) >= 8).select(col("doc_id"), slice(w, 1, 8).as("w"))
    val brute = p.as("a").join(p.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        expr("aggregate(zip_with(a.w, b.w, (x, y) -> if(x = y, 0, 1)), 0, (acc, v) -> acc + v)")
          .cast("long").as("hd"))
      .where(col("hd") <= 1).orderBy("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == brute)
  }

  test("x104 BPE merge round matches a driver-side greedy-merge recomputation") {
    import org.apache.spark.sql.functions.{col, explode, split, length}
    val vocab = graft.ops.Tables(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy("w").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    // round 1 selection: vocab-weighted char-pair counts
    val pairCnt = scala.collection.mutable.Map.empty[String, Long]
    vocab.foreach { case (w, f) =>
      w.sliding(2).foreach(p => pairCnt(p) = pairCnt.getOrElse(p, 0L) + f)
    }
    val top = pairCnt.toSeq.minBy { case (p, c) => (-c, p) }._1
    // greedy left-to-right merge as an explicit symbol fold (the semantics
    // the regexp_replace('g') formulation must reproduce)
    def merge(w: String): Vector[String] =
      w.map(_.toString).foldLeft(Vector.empty[String]) { (acc, c) =>
        if (acc.nonEmpty && acc.last == top.substring(0, 1) && c == top.substring(1, 2))
          acc.init :+ top
        else acc :+ c
      }
    val postCnt = scala.collection.mutable.Map.empty[String, Long]
    vocab.foreach { case (w, f) =>
      merge(w).sliding(2).filter(_.size == 2)
        .foreach(p => postCnt(p.mkString("+")) = postCnt.getOrElse(p.mkString("+"), 0L) + f)
    }
    val expect = postCnt.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
      .map { case (p, c) => (top, p, c) }
    val got = SparkEntry.queries("x104_bpe_merge")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expect)
  }

  test("x107 prefix-filtered all-pairs equals the df-capped exact join, on fewer candidates") {
    import org.apache.spark.sql.functions.{col, count, lit, row_number}
    import org.apache.spark.sql.expressions.Window
    // exactness: at test SF no shingle approaches x04's df cap, so the two
    // formulations compute the same mathematical result — any divergence is
    // a prefix-filter bug (a false negative would drop a pair)
    val exact = SparkEntry.queries("x04_ngram_jaccard")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val pref = SparkEntry.queries("x107_prefix_allpairs")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(pref == exact)
    assert(pref.nonEmpty)
    // the filter must actually filter: candidate pairs from prefix sets are
    // strictly fewer than the full inverted-index join generates
    val sh = graft.ops.DedupOps.diagShingled(spark, sfDir).cache()
    def pairs(df: org.apache.spark.sql.DataFrame): Long =
      df.as("a").join(df.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .select("a.doc_id", "b.doc_id").distinct().count()
    val full = pairs(sh)
    val ranked = sh
      .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
    val prefix = ranked.where(col("rk") <=
      col("n") - org.apache.spark.sql.functions.expr("(3*n + 4) div 5") + 1)
      .select("doc_id", "sh")
    val cand = pairs(prefix)
    sh.unpersist()
    info(s"candidate pairs: full join $full -> prefix $cand")
    assert(cand < full, s"prefix filter generated no savings: $cand vs $full")
    assert(cand >= pref.size.toLong)
  }

  test("x108 sorted-neighborhood: perfect precision, cluster-complete recall") {
    val exact = SparkEntry.queries("x04_ngram_jaccard")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val snm = SparkEntry.queries("x108_sorted_neighborhood")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // precision 1.0 by construction: every emitted pair is re-verified with
    // the exact trigram-jaccard, so snm ⊆ exact (values included)
    assert(snm.nonEmpty && snm.toSet.subsetOf(exact.toSet))
    // pair-level recall may drop INSIDE a dup cluster bigger than the
    // window (w=2 sees distances 1-2; a 4-member run misses its distance-3
    // pair) — but dedup consumes CLUSTERS, so the meaningful recall gate is
    // that SNM edges connect exactly the components the exact edges do
    def components(edges: Seq[(Long, Long)]): Set[Set[Long]] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      edges.flatMap(e => Seq(e._1, e._2)).groupBy(find).values.map(_.toSet).toSet
    }
    assert(components(snm.map(p => (p._1, p._2))) ==
      components(exact.map(p => (p._1, p._2))),
      "SNM split or merged a dup cluster the exact join defines")
  }

  test("x109 margin mining picks from the true forward top-k with sane margins") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("x109_bitext_margin")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // side/threshold contract
    rows.foreach { case (q, m, _, marginPpm) =>
      assert(q % 2 == 0 && q % 50 == 0, s"query $q not from side A's query batch")
      assert(m % 2 == 1, s"match $m not from side B")
      assert(marginPpm >= 1050000)
    }
    // driver-side ground truth: each emitted match must be one of the
    // query's exact top-4 cosine neighbors on side B (margin re-ranks
    // within the k-NN candidates, never invents a pair outside them)
    val vecs = graft.ops.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    val sideB = vecs.keys.filter(_ % 2 == 1).toSeq.sorted
    rows.foreach { case (q, m, _, _) =>
      val top4 = sideB.map(b => b -> cos(vecs(q), vecs(b)))
        .sortBy { case (b, c) => (-c, b) }.take(4).map(_._1).toSet
      assert(top4.contains(m), s"match $m for query $q outside exact top-4 $top4")
    }
  }

  test("x110 NDCG/MRR agree with a driver-side recomputation from the two rankings") {
    val exact = SparkEntry.queries("x06_cosine_topk")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val lsh = SparkEntry.queries("x07_ann_lsh")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val w = Map(1 -> 1000000L, 2 -> 630930L, 3 -> 500000L)
    val relevant = exact.filter(_._2 <= 3).groupBy(_._1)
      .view.mapValues(_.map(_._3).toSet).toMap
    val expect = relevant.keys.toSeq.sorted.map { q =>
      val hits = lsh.filter(t => t._1 == q && t._2 <= 3 && relevant(q).contains(t._3))
      val dcg = hits.map(t => w(t._2)).sum
      val mrr = if (hits.isEmpty) 0L else 1000000L / hits.map(_._2).min
      (q, hits.size.toLong, mrr, dcg * 1000000L / 2130930L)
    }
    val got = SparkEntry.queries("x110_ann_rank_eval")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
    // bounds + the binary-relevance identity: all 3 hits in 3 slots sum the
    // same weights in any order, so full recall ⇒ NDCG exactly 1
    got.foreach { case (q, nHit, mrrPpm, ndcgPpm) =>
      assert(ndcgPpm <= 1000000L && mrrPpm <= 1000000L)
      if (nHit == 3) assert(ndcgPpm == 1000000L,
        s"full-recall query $q should have NDCG 1000000, got $ndcgPpm")
    }
  }

  test("x111 budget selection is maximal and within budget") {
    import org.apache.spark.sql.functions.{col, split, size, expr, array_distinct}
    val w = split(col("text"), " ")
    val base = graft.ops.Tables(spark, sfDir, "documents")
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        size(w).cast("long").as("tok"), size(array_distinct(w)).cast("long").as("dw"))
      .where(col("tok") >= 1)
      .withColumn("dens", expr("dw * 1000000 div tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val budget = 3L * base.map(_._2).sum / 10
    // driver-side global greedy: (density DESC, doc_id ASC) prefix
    val ordered = base.sortBy { case (id, _, dens) => (-dens, id) }
    var cum = 0L
    val selected = ordered.takeWhile { case (_, tok, _) =>
      cum += tok; cum <= budget
    }
    val selTok = selected.map(_._2).sum
    val got = SparkEntry.queries("x111_budget_select")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._2).sum == selected.length, "selected doc count mismatch")
    assert(got.map(_._3).sum == selTok, "selected token total mismatch")
    assert(selTok <= budget)
    // maximality: the first rejected doc would overflow the budget
    if (selected.length < ordered.length)
      assert(selTok + ordered(selected.length)._2 > budget)
  }

  test("x112 label propagation refines the connected components") {
    // LP can SPLIT a component (bridge edges lose the plurality vote) but
    // can never merge nodes across components — labels only travel edges
    val cc = SparkEntry.queries("x31_dup_clusters")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap // doc -> component
    val lp = SparkEntry.queries("x112_label_prop")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(lp.nonEmpty)
    assert(lp.map(_._1).toSet == cc.keySet, "LP must label exactly the candidate-graph nodes")
    lp.groupBy(_._2).values.foreach { members =>
      val comps = members.map(m => cc(m._1)).toSet
      assert(comps.size == 1,
        s"LP community ${members.head._2} spans components $comps")
    }
  }

  test("x113 minhash estimates track exact jaccard within the k=12 error bound") {
    val rows = SparkEntry.queries("x113_minhash_error")(spark, sfDir).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (est, exact, err) =>
      // estimates are exact twelfths; error column is |est - exact|
      assert(est % (1000000L / 12) <= 11, s"est $est not a twelfth")
      assert(err == math.abs(est - exact))
      // identical sets force identical minima — J=1 must estimate as 1
      if (exact == 1000000L) assert(est == 1000000L,
        s"exact duplicate estimated at $est")
    }
    // candidacy bound: every banded pair shares one full 3-seed band, so
    // its estimate is at least 3/12 — REGARDLESS of true jaccard (this is
    // the selection bias the audit exists to expose: low-J pairs enter the
    // candidate set precisely because their minima collided)
    rows.foreach { case (est, _, _) =>
      assert(est >= 250000L, s"candidate with estimate $est < 3/12 — banding broken")
    }
    // unconditional accuracy holds where candidacy is near-certain: for
    // true near-dups (J ≥ 0.5) the estimate error obeys the k=12 binomial
    // bound (σ = √(J(1−J)/12) ≤ 144k ppm; allow ~2σ on the mean)
    val nearDups = rows.filter(_._2 >= 500000L)
    if (nearDups.nonEmpty) {
      val meanErr = nearDups.map(_._3).sum / nearDups.length
      assert(meanErr <= 290000, s"mean near-dup minhash error $meanErr ppm")
    }
  }

  test("x114 reliability diagram matches a driver-side rebinning of x105 scores") {
    val scored = SparkEntry.queries("x105_hash_classifier")(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3))) // lang, n_tokens, sw
    def binOf(n: Long, sw: Long): Int =
      (5 to -5 by -1).find(k => sw >= k * n).getOrElse(-6)
    val expect = scored.groupBy { case (_, n, sw) => binOf(n, sw) }
      .map { case (bin, g) =>
        val nEn = g.count(_._1 == "en").toLong
        (bin, g.length.toLong, nEn, nEn * 1000000L / g.length)
      }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("x114_calibration")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
    // the curve must actually rise: en-rate above the zero cut beats below
    val above = got.filter(_._1 >= 0); val below = got.filter(_._1 < 0)
    def rate(g: Seq[(Int, Long, Long, Long)]) =
      if (g.map(_._2).sum == 0) 0.0 else g.map(_._3).sum.toDouble / g.map(_._2).sum
    assert(rate(above) > rate(below),
      s"calibration curve flat: above=${rate(above)} below=${rate(below)}")
  }

  test("x115 shrinkage prior sits between raw mean and global mean") {
    val rows = SparkEntry.queries("x115_source_prior")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val gmean = {
      // recompute the integerized global mean exactly as the query does
      import org.apache.spark.sql.functions.{col, split, size, expr, array_distinct}
      val w = split(col("text"), " ")
      graft.ops.Tables(spark, sfDir, "documents").where(col("text").isNotNull)
        .select(size(w).cast("long").as("tok"), size(array_distinct(w)).cast("long").as("dw"))
        .where(col("tok") >= 1)
        .select(expr("dw * 1000000 div tok").as("dens"))
        .agg(expr("sum(dens) div count(*)")).collect()(0).getLong(0)
    }
    rows.foreach { case (src, n, raw, prior, shift) =>
      assert(shift == prior - raw, s"$src shift mismatch")
      // posterior mean is a convex combination: strictly between raw and
      // global (or equal when they coincide), and the pull shrinks as n grows
      assert((prior >= raw.min(gmean) - 1) && (prior <= raw.max(gmean) + 1),
        s"$src prior $prior outside [$raw, $gmean]")
      val maxPull = (20L * math.abs(gmean - raw)) / (n + 20) + 1
      assert(math.abs(shift) <= maxPull, s"$src pulled $shift > bound $maxPull")
    }
  }

  test("x116 streaming sketch equals the batch sketch across a forced 3-batch replay") {
    import org.apache.spark.sql.functions.{col, explode, split, length}
    import org.apache.spark.sql.streaming.Trigger
    // stage the corpus as 3 files so maxFilesPerTrigger=1 forces 3 real
    // micro-batches — the state must do the cell-wise sketch merge
    val staged = java.nio.file.Files.createTempDirectory("x116-multi").toString
    val docs = graft.ops.Tables(spark, sfDir, "documents")
    docs.repartition(3).write.mode("overwrite").parquet(staged)
    val schema = spark.read.parquet(staged).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(staged)
    val q = graft.ops.FuncOps.cmCells(
        stream.select(explode(split(col("text"), " ")).as("w"))
          .where(length(col("w")) >= 1))
      .writeStream.format("memory").queryName("x116_spec_sink").outputMode("complete")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("x116-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.length >= 3, s"expected ≥3 micro-batches, got ${q.recentProgress.length}")
    val streamed = spark.table("x116_spec_sink").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val batch = graft.ops.FuncOps.cmCells(
        docs.select(explode(split(col("text"), " ")).as("w"))
          .where(length(col("w")) >= 1)).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(streamed == batch, "streaming sketch state diverged from the batch build")
  }

  test("x117 re-elects canonicals only from survivors") {
    val rows = SparkEntry.queries("x117_tombstone_propagate")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (cluster, nMembers, nTomb, oldC, newC) =>
      assert(nTomb >= 1 && nTomb <= nMembers)
      // the new canonical is never a deleted doc; −1 exactly when the
      // whole cluster died
      if (nTomb == nMembers) assert(newC == -1L, s"cluster $cluster: all dead but kept $newC")
      else assert(newC != -1L && newC % 37 != 0, s"cluster $cluster elected tombstoned $newC")
      // if the old canonical survives, the election must keep it
      if (oldC % 37 != 0) assert(newC == oldC,
        s"cluster $cluster replaced surviving canonical $oldC with $newC")
    }
  }

  test("x118 near-dup contamination agrees with a driver-side filter of x86") {
    val v = SparkEntry.queries("x86_lsh_verify")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getBoolean(5)))
    val expect = v.filter { case (a, b, _, ok) => ok && ((a % 7 == 0) != (b % 7 == 0)) }
      .map { case (a, b, j, _) => (if (a % 7 == 0) a else b, j) }
      .groupBy(_._1)
      .map { case (d, g) => (d, g.length.toLong, g.map(_._2).max) }
      .toSeq.sortBy(_._1)
    val got = SparkEntry.queries("x118_neardup_contamination")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
  }

  test("x119 gate attribution: fail_only bounded by fail, and sums consistent") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("x119_gate_attribution")(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3, 4))
    rows.foreach { case (g, nFail, nOnly) =>
      assert(nOnly <= nFail, s"gate $g: fail_only $nOnly > fail $nFail")
    }
    // Σ fail_only ≤ total docs failing ANY gate (each doc counts in at
    // most one gate's fail_only, by definition of "only")
    val n = graft.ops.Tables(spark, sfDir, "documents")
      .where(col("text").isNotNull).count()
    assert(rows.map(_._3).sum <= n)
  }

  test("x120 epoch plan caps repeats at 4 and never over-allocates a source") {
    val rows = SparkEntry.queries("x120_epoch_plan")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val totalTokens = rows.map(_._2).sum
    rows.foreach { case (src, n, _, target, epochsMilli, alloc) =>
      assert(epochsMilli <= 4000, s"$src over the 4-epoch cap")
      assert(alloc <= target + 1, s"$src allocated $alloc above target $target")
      assert(alloc <= 4L * n, s"$src allocation exceeds 4 epochs of its data")
      // temperature up-weighting: every source gets MORE than one epoch
      // would under proportional allocation... only guaranteed for the
      // smallest; assert the global sanity instead: targets sum ≈ budget
      val _ = src
    }
    val budget = 2L * totalTokens
    val targetSum = rows.map(_._4).sum
    assert(targetSum <= budget && targetSum >= budget - rows.length,
      s"targets $targetSum vs budget $budget (floor drift > 1/source)")
    // α=0.5 up-weights small sources: the smallest source's epoch factor
    // must be ≥ the largest source's
    val bySize = rows.sortBy(_._2)
    assert(bySize.head._5 >= bySize.last._5,
      "temperature weighting failed to favor the small source")
  }

  test("x121 importance resampling shifts composition toward the target domain") {
    val rows = SparkEntry.queries("x121_dsir_resample")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, n, kept, ppm, _) =>
      assert(kept <= n)
      assert(ppm == kept * 1000000L / n, s"$lang rate mismatch")
    }
    // the DETERMINISTIC separation signal is the summed importance lift
    // (the realized keep rate adds binomial coin noise at tiny SF): the
    // target domain's total lift must be positive and strictly above
    // every other language's, which must each be negative — the hashed
    // trigram ratio model recognizing its own domain
    val en = rows.find(_._1 == "en").get
    val others = rows.filter(_._1 != "en")
    assert(en._5 > 0, s"target-domain lift ${en._5} not positive")
    others.foreach { o =>
      assert(o._5 < 0, s"${o._1} lift ${o._5} not negative")
      // per-doc mean comparison (scale-free across language sizes)
      assert(en._5 * o._2 > o._5 * en._2,
        s"en mean lift not above ${o._1}'s")
    }
  }

  test("x122 fertility is bounded by raw chars and reflects merge coverage") {
    val rows = SparkEntry.queries("x122_bpe_fertility")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, nWords, nTokens, fert, cpt) =>
      assert(nTokens >= nWords, s"$lang: fewer tokens than words")
      assert(fert == nTokens * 1000L / nWords)
      // merges only ever shrink: chars/token ≥ 1, and ≤ 3 ("the" is the
      // longest merged symbol)
      assert(cpt >= 1000L && cpt <= 3000L, s"$lang chars/token $cpt out of range")
    }
  }

  test("x123 data card agrees with the queries it summarizes") {
    val card = SparkEntry.queries("x123_data_card")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // cross-check against independent single-purpose queries
    import org.apache.spark.sql.functions.col
    val docs = graft.ops.Tables(spark, sfDir, "documents").where(col("text").isNotNull)
    assert(card("n_docs") == docs.count())
    assert(card("n_langs") == docs.select("lang").distinct().count())
    assert(card("n_sources") == docs.select("source").distinct().count())
    // exact-dup ppm consistent with x01's survivor counts: the card's
    // GLOBAL distinct-digest count can only find MORE dupes than x01's
    // per-source view (cross-source copies dedup globally, not per source)
    val x01 = SparkEntry.queries("x01_exact_dedup")(spark, sfDir).collect()
    val nDup = x01.map(r => r.getLong(3)).sum // n_dupes column
    assert(card("exact_dup_ppm") >= nDup * 1000000L / card("n_docs"),
      s"dup ppm ${card("exact_dup_ppm")} below x01-derived $nDup dupes")
    assert(card("gate_pass_ppm") <= 1000000L)
    assert(card("mean_doc_tokens_milli") > 0)
  }

  test("f17 priority sample selects by exact priority order and estimates the total") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("f17_priority_sample")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 50)
    // recompute priorities driver-side and check selection correctness:
    // every sampled priority ≥ every unsampled one
    val all = graft.ops.Tables(spark, sfDir, "documents")
      .where(col("text").isNotNull).select("doc_id", "n_chars").collect()
      .map { r =>
        val id = r.getLong(0); val w = r.getLong(1)
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
        val u = (((md(0) & 0xff) << 8) | (md(1) & 0xff)) + 1L
        (id, w, w * 65536L / u)
      }
    val sampled = rows.map(_._1).toSet
    val minSampled = rows.map(_._3).min
    all.filterNot(t => sampled.contains(t._1)).foreach { case (id, _, prio) =>
      assert(prio <= minSampled, s"unsampled doc $id has priority $prio > $minSampled")
    }
    // estimator sanity: Σ max(w, τ) over the sample tracks the true total
    // (unbiased in expectation; generous band for one realization)
    val trueTotal = all.map(_._2).sum.toDouble
    val est = rows.map(_._4).sum.toDouble
    info(f"priority-sampling estimate ratio: ${est / trueTotal}%.3f")
    assert(est / trueTotal > 0.5 && est / trueTotal < 2.0,
      s"estimate $est wildly off true $trueTotal")
  }

  test("f16 count-min estimates dominate true counts within the sketch bound") {
    val rows = SparkEntry.queries("f16_countmin")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // upper-bound property: collisions only ever inflate a counter
    rows.foreach { case (w, t, e) => assert(e >= t, s"CM underestimated '$w': $e < $t") }
    // error bound: E[overestimate] = (N - true)/width per row; with d=4
    // rows the min is far tighter — assert the loose single-row bound ×4
    import org.apache.spark.sql.functions.{col, explode, length, split}
    val n = graft.ops.Tables(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) >= 1).count()
    rows.foreach { case (w, t, e) =>
      assert(e - t <= 4L * n / 512,
        s"'$w' overestimate ${e - t} exceeds 4N/w = ${4L * n / 512}")
    }
  }

  test("x106 BPE encode matches a driver-side priority-queue encoder") {
    import org.apache.spark.sql.functions.{col, explode, split, length, count, lit}
    // the query's literal merge table, as (left symbol, right symbol) -> text
    val merges = Seq(("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"))
      .map { case (l, r) => (l, r, l + r) }
    // classic BPE encode: repeatedly merge the LOWEST-RANK applicable pair at
    // its leftmost occurrence (the algorithm the staged global-replace chain
    // in x106 claims to equal)
    def encode(w: String): Vector[String] = {
      var syms = w.map(_.toString).toVector
      var cont = true
      while (cont) {
        val hit = merges.iterator.zipWithIndex.flatMap { case ((l, r, _), k) =>
          syms.indices.dropRight(1).find(i => syms(i) == l && syms(i + 1) == r)
            .map(i => (k, i))
        }.toSeq.sortBy(_._1).headOption
        hit match {
          case Some((k, i)) =>
            syms = (syms.take(i) :+ merges(k)._3) ++ syms.drop(i + 2)
          case None => cont = false
        }
      }
      syms
    }
    val vocab = graft.ops.Tables(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("f"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val inv = scala.collection.mutable.Map.empty[String, Long]
    vocab.foreach { case (w, f) =>
      encode(w).foreach(t => inv(t) = inv.getOrElse(t, 0L) + f)
    }
    val expect = inv.toSeq.sortBy { case (t, c) => (-c, t) }.take(50)
    val got = SparkEntry.queries("x106_bpe_encode")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect)
    // the recursive merge must actually fire on this corpus
    assert(got.exists(_._1 == "the"), "recursive merge th+e never applied")
  }

  test("x105 hash classifier separates the reference domain") {
    val rows = SparkEntry.queries("x105_hash_classifier")(spark, sfDir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    def mean(sel: ((String, Long, Long)) => Boolean): Double = {
      val g = rows.filter(sel)
      g.map { case (_, n, sw) => sw.toDouble / n }.sum / g.length
    }
    val en = mean(_._1 == "en"); val other = mean(_._1 != "en")
    info(f"mean milli-lift/token: en=$en%.2f other=$other%.2f")
    // the broadcast linear model must assign the reference slice a higher
    // mean per-token score than the rest — the property a quality filter
    // thresholds on (measured +1.6 vs -0.7 at this sf)
    assert(en > other + 0.5, f"separation collapsed: en=$en%.2f other=$other%.2f")
  }

  test("brute-force top-k and LSH ANN agree on bucket-colocated neighbors") {
    val exact = SparkEntry.queries("x06_cosine_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = SparkEntry.queries("x07_ann_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // ANN returns a subset of the corpus; sanity: it finds at least one
    // exact-top-5 neighbor overall at this scale
    assert(ann.isEmpty || (exact & ann).nonEmpty)
  }

  test("x124 CDC boundaries are insertion-local — the property fixed-width chunking lacks") {
    import spark.implicits._
    // one char inserted at the FRONT: content-defined cuts re-synchronize at
    // the first boundary window after the edit, so all later chunks keep
    // their digests; fixed-width chunking would shift every chunk
    val base = (1 to 400).map(i => s"w$i").mkString(" ")
    val edited = "Z" + base
    val d = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val dg = graft.ops.PipelineOps.cdcDigests(d)
      .select("doc_id", "cd").collect().groupBy(_.getLong(0))
    val a = dg(1L).map(_.getString(1)).toSeq
    val b = dg(2L).map(_.getString(1)).toSeq
    assert(a.size > 5, s"fixture too short to chunk (got ${a.size} chunks)")
    val shared = a.intersect(b).size
    // everything but the first chunk (and at most one resync chunk) survives
    assert(shared >= a.size - 2,
      s"insertion shifted ${a.size - shared} of ${a.size} chunks — boundaries are not content-defined")
    // and the two texts do differ in at least one chunk
    assert(a.toSet != b.toSet)
  }

  test("exactQuantiles is bit-identical to the built-in percentile aggregate") {
    import org.apache.spark.sql.functions.{col, lit, percentile}
    // the histogram formulation replaces the built-in's boxed-map buffer
    // (which OOMed the 2 GB sf1 proof); its result must be EXACTLY the
    // built-in's double — same neighbors, same interpolation arithmetic
    val li = graft.ops.Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"))
    val builtin = li.groupBy("l_returnflag").agg(
      percentile(col("l_extendedprice"), lit(0.05)).as("lo"),
      percentile(col("l_extendedprice"), lit(0.9)).as("p90"),
      percentile(col("l_extendedprice"), lit(0.99)).as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val ours = graft.ops.RelOps.exactQuantiles(li, "l_returnflag", "l_extendedprice",
      Seq("lo" -> 0.05, "p90" -> 0.9, "hi" -> 0.99))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(ours.keySet == builtin.keySet)
    for ((k, (lo, p90, hi)) <- builtin) {
      assert(ours(k)._1 == lo, s"$k lo: ${ours(k)._1} != $lo")
      assert(ours(k)._2 == p90, s"$k p90: ${ours(k)._2} != $p90")
      assert(ours(k)._3 == hi, s"$k hi: ${ours(k)._3} != $hi")
    }
    // degenerate group sizes: 1 and 2 values (pos lands on/between endpoints)
    import spark.implicits._
    val tiny = Seq(("a", 10.0), ("b", 1.0), ("b", 2.0)).toDF("g", "v")
    val tb = tiny.groupBy("g").agg(percentile(col("v"), lit(0.5)).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val to = graft.ops.RelOps.exactQuantiles(tiny, "g", "v", Seq("m" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(to == tb)
  }

  test("x125 passage dedup equals an independent collect-side re-derivation") {
    val out = SparkEntry.queries("x125_passage_dedup")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // re-derive global first-occurrence passage dedup in plain Scala
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val docs = graft.ops.Tables(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    val seen = scala.collection.mutable.Set.empty[String]
    val agg = scala.collection.mutable.Map.empty[String, (Set[Long], Long, Long, Long, Long)]
    for ((id, src, text) <- docs) {
      val w = text.split(" ", -1)
      val passages = w.grouped(20).toSeq // in-order = (doc_id, pos) scan order
      val (docsS, np, rem, tot, kept) =
        agg.getOrElse(src, (Set.empty[Long], 0L, 0L, 0L, 0L))
      var (np2, rem2, tot2, kept2) = (np, rem, tot, kept)
      for (p <- passages) {
        val dg = md5hex(p.mkString(" "))
        np2 += 1; tot2 += p.length
        if (seen(dg)) rem2 += 1 else { seen += dg; kept2 += p.length }
      }
      agg(src) = (docsS + id, np2, rem2, tot2, kept2)
    }
    assert(out.keySet == agg.keySet.toSet)
    for ((src, (ids, np, rem, tot, kept)) <- agg) {
      val got = out(src)
      assert(got == ((ids.size.toLong, np, rem, tot, kept, kept * 1000000L / tot)),
        s"source $src: $got != ${(ids.size, np, rem, tot, kept, kept * 1000000L / tot)}")
    }
    // the dedup must actually fire on this corpus (shared 20-word windows)
    assert(agg.values.map(_._3).sum > 0, "no passage ever removed — fixture is vacuous")
  }

  test("x126 gopher rule counts equal an independent per-doc re-derivation") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("x126_gopher_rules")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    // re-derive the flags with plain collect-side Scala (not the query's ops)
    val docs = graft.ops.Tables(spark, sfDir, "documents")
      .select("source", "text").collect().map(r => (r.getString(0), r.getString(1)))
    val en = Set("the", "and", "of", "to", "a")
    val agg = docs.groupBy(_._1).map { case (src, rows) =>
      val f = rows.map { case (_, t) =>
        val w = t.split(" ", -1)
        val okLen = w.length >= 50 && w.length <= 100000
        val mwl = w.map(_.length).sum.toDouble / w.length
        val okMwl = mwl >= 3.0 && mwl <= 10.0
        val okStop = w.count(en) >= 2
        val okTtr = 5 * w.distinct.length >= w.length
        val okMaxw = w.forall(_.length <= 15)
        (okLen, okMwl, okStop, okTtr, okMaxw)
      }
      src -> (rows.size, f.count(!_._1), f.count(!_._2), f.count(!_._3),
        f.count(!_._4), f.count(!_._5),
        f.count(x => x._1 && x._2 && x._3 && x._4 && x._5))
    }
    assert(agg.nonEmpty && out.size == agg.size)
    for ((src, (n, fl, fm, fs, ft, fw, np)) <- agg) {
      val r = out(src)
      assert(Seq(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)) ==
        Seq(n.toLong, fl.toLong, fm.toLong, fs.toLong, ft.toLong, fw.toLong, np.toLong),
        s"source $src mismatch")
    }
    // the funnel must actually discriminate on this corpus
    assert(out.values.map(_.getLong(2)).sum + out.values.map(_.getLong(1)).sum > 0,
      "no rule ever fails — fixture can't witness the gate")
  }

  test("x127 containment prefix filter is lossless vs the brute-force ordered all-pairs") {
    import org.apache.spark.sql.functions._
    // brute force: exact distinct-trigram-shingle sets, ALL ordered pairs
    val w = split(col("text"), " ")
    val sh = graft.ops.Tables(spark, sfDir, "documents").select(
        col("doc_id"),
        explode(when(size(w) >= 3,
          transform(sequence(lit(0), size(w) - 3), i =>
            concat_ws(" ", element_at(w, i + 1), element_at(w, i + 2), element_at(w, i + 3))))
          .otherwise(array())).as("raw"))
      .select(col("doc_id"), substring(md5(col("raw")), 1, 16).as("sh")).distinct()
    val szs = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("i")).collect()
      .filter(r => 5 * r.getLong(2) >= 4 * szs(r.getLong(0)))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = SparkEntry.queries("x127_containment_join")(spark, sfDir).collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "fixture has no containment pairs — losslessness is vacuous")
    assert(got == brute, s"prefix filter lost ${(brute -- got).size} / invented ${(got -- brute).size} pairs")
    // emitted values recompute: na is the probe's exact set size and
    // containment ∈ [0.8, 1]
    for (r <- rows) {
      assert(r.getLong(2) == szs(r.getLong(0)), s"na mismatch for ${r.getLong(0)}")
      assert(r.getDouble(3) >= 0.8 && r.getDouble(3) <= 1.0)
    }
    // asymmetry (the quote case): C(a→b) uses ONLY a's size, so a strict
    // shingle-subset doc qualifies toward its superset regardless of the
    // superset's size — witnessed structurally: every brute pair (a,b) with
    // na ≤ nb qualifies while the reverse needs i ≥ 0.8·nb too; verify the
    // query never emitted a reverse pair the brute force rejected
    assert(got.forall(brute), "query emitted a pair brute force rejects")
  }

  test("x128 per-dimension moments match Spark's stddev/avg within integerization error") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("x128_embedding_moments")(spark, sfDir).collect()
    val nVecs = graft.ops.Tables(spark, sfDir, "embeddings").count()
    assert(out.length == 64 && out.forall(_.getLong(1) == nVecs))
    val direct = graft.ops.Tables(spark, sfDir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("p", "v")))
      .groupBy((col("p") + 1).cast("long").as("dim"))
      .agg(avg(col("v").cast("double")).as("m"), var_samp(col("v").cast("double")).as("s2"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    for (r <- out) {
      val (m, v) = direct(r.getLong(0))
      // μ-integerization quantizes each component by ≤ 0.5e-6
      assert(math.abs(r.getDouble(4) - m) < 1e-5, s"dim ${r.getLong(0)} mean")
      assert(math.abs(r.getDouble(5) - v) < 1e-4, s"dim ${r.getLong(0)} var")
    }
  }

  test("x129 k-center picks are a monotone farthest-point traversal that covers the corpus") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("x129_kcenter_coreset")(spark, sfDir).collect()
    assert(out.map(_.getLong(0)).toSeq == (1L to 8L))
    val ids = out.map(_.getLong(1))
    assert(ids.distinct.length == 8, "picks must be distinct vectors")
    // the max-min distance sequence is non-increasing (greedy argmax over a
    // set that only shrinks and a mind that only decreases)
    val crits = out.drop(1).map(_.getDouble(2))
    assert(crits.zip(crits.tail).forall { case (a, b) => a >= b }, crits.mkString(","))
    // cells partition the corpus
    assert(out.map(_.getLong(3)).sum == graft.ops.Tables(spark, sfDir, "embeddings").count())
    // covering radius ≤ the last pick's criterion: after the 8th center no
    // point is farther than the 8th max-min distance
    val e = graft.ops.Tables(spark, sfDir, "embeddings").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val cents = ids.map(e)
    val radius = e.values.map(v => cents.map(c => d2(v, c)).min).max
    assert(radius <= crits.last + 1e-6, s"radius $radius > last crit ${crits.last}")
  }

  test("x131 source affinity equals a collect-side feature-hash re-derivation") {
    val out = SparkEntry.queries("x131_source_affinity")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // re-derive: hash every token occurrence to a signed dim, cosine of
    // per-source centroids — plain Scala, no Spark expressions
    def hv(w: String): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.take(15), 16)
    }
    val cents = scala.collection.mutable.Map.empty[String, Array[Long]]
    for (r <- graft.ops.Tables(spark, sfDir, "documents").select("source", "text").collect()) {
      val v = cents.getOrElseUpdate(r.getString(0), Array.fill(64)(0L))
      for (w <- r.getString(1).split(" ", -1)) {
        val h = hv(w)
        v((h % 64).toInt) += (if ((h / 64) % 2 == 0) 1 else -1)
      }
    }
    val srcs = cents.keys.toSeq.sorted
    assert(out.size == srcs.size * (srcs.size - 1) / 2)
    for (a <- srcs; b <- srcs if a < b) {
      val (va, vb) = (cents(a), cents(b))
      val dot = va.zip(vb).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val cos = dot / (math.sqrt(va.map(x => x.toDouble * x).sum) *
        math.sqrt(vb.map(x => x.toDouble * x).sum))
      assert(math.abs(out((a, b)) - cos) < 1e-5, s"($a,$b): ${out((a, b))} vs $cos")
      assert(out((a, b)) >= -1.0 && out((a, b)) <= 1.0)
    }
  }

  test("x132 JL distortion histogram equals a collect-side projection and is unbiased") {
    val out = SparkEntry.queries("x132_jl_distortion")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // regenerate the sign matrix exactly as the query does
    def sign(r: Int, c: Int): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"jl:$r:$c".getBytes("UTF-8"))
      if ((h(0) & 0x80) == 0) 1 else -1
    }
    val e = graft.ops.Tables(spark, sfDir, "embeddings").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def proj(v: Array[Double]): Array[Double] =
      (0 until 16).map(r => (0 until 64).map(c => sign(r, c) * v(c)).sum / 4.0).toArray
    def nv(v: Array[Double]): Double = v.map(x => x * x).sum
    val ratios = for {
      (qid, qv) <- e.toSeq if qid % 50 == 0 && qid < 20000
      (cid, cv) <- e.toSeq if cid != qid
      // mirror the query's exact IEEE chain: ‖q‖² − 2⟨q,c⟩ + ‖c‖²
      full = nv(qv) - 2 * qv.zip(cv).map { case (x, y) => x * y }.sum + nv(cv)
      if full > 0
    } yield {
      val (pq, pc) = (proj(qv), proj(cv))
      val pd = pq.zip(pc).map { case (x, y) => (x - y) * (x - y) }.sum
      math.floor(pd * 1000000.0 / full + 0.5).toLong
    }
    assert(ratios.nonEmpty)
    val hist = ratios.groupBy(_ / 100000)
      .map { case (b, rs) => b -> (rs.size.toLong, rs.min, rs.max) }
    assert(out == hist, s"histogram mismatch: got ${out.toSeq.sortBy(_._1)} " +
      s"want ${hist.toSeq.sortBy(_._1)}")
    // Achlioptas ±1 projection is unbiased: E[proj d²] = full d² — the
    // sample mean ratio must sit near 1.0
    val mean = ratios.map(_.toDouble).sum / ratios.size
    assert(mean > 800000 && mean < 1200000, s"mean ratio $mean not ≈ 1e6")
    // and mass concentrates (JL): at k=16 most pairs fall within ±50%
    val central = ratios.count(r => r >= 500000 && r <= 1500000)
    assert(central * 10 >= ratios.size * 8, s"only $central/${ratios.size} pairs central")
  }

  test("x133 k-anonymity classes equal a collect-side re-derivation and cover all events") {
    val out = SparkEntry.queries("x133_k_anonymity")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val ev = graft.ops.Tables(spark, sfDir, "events")
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.hour(org.apache.spark.sql.functions.col("ts")).as("hr"),
        org.apache.spark.sql.functions.col("user_id"))
      .collect().map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2)))
    val agg = ev.groupBy(e => (e._1, e._2)).map { case (k, rows) =>
      k -> (rows.length.toLong, rows.map(_._3).distinct.length.toLong)
    }
    assert(out.keySet == agg.keySet.toSet)
    for ((k, (n, u)) <- agg) {
      assert(out(k) == ((n, u, if (u < 5) 1L else 0L)), s"class $k")
    }
    // coverage: class masses partition the event stream
    assert(out.values.map(_._1).sum == ev.length.toLong)
  }

  test("x130 CCNet buckets are balanced per-language terciles with ordered score ranges") {
    val out = SparkEntry.queries("x130_ccnet_buckets")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    val perLang = out.groupBy(_._1)
    val docsPerLang = graft.ops.Tables(spark, sfDir, "documents")
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, rows) <- perLang) {
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length))
      // ntile balance: sizes differ by at most 1, largest first
      val sizes = sorted.map(_._3)
      assert(sizes.max - sizes.min <= 1 && sizes.toSeq == sizes.sortBy(-_).toSeq)
      assert(sizes.sum == docsPerLang(lang), s"$lang bucket mass")
      // head bucket's worst score ≥ next bucket's best (DESC tercile order)
      for (pair <- sorted.sliding(2).filter(_.length == 2)) {
        val (hi, lo) = (pair(0), pair(1))
        assert(hi._4 >= lo._5, s"$lang: bucket ${hi._2} min ${hi._4} < bucket ${lo._2} max ${lo._5}")
      }
    }
  }

  test("x134 l-diversity equals a collect-side re-derivation and covers all events") {
    val out = SparkEntry.queries("x134_l_diversity")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val kRe = """"k"\s*:\s*(\d+)""".r
    val ev = graft.ops.Tables(spark, sfDir, "events")
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.hour(org.apache.spark.sql.functions.col("ts")).as("hr"),
        org.apache.spark.sql.functions.col("props"))
      .collect().map(r => (r.getString(0), r.getInt(1).toLong,
        kRe.findFirstMatchIn(r.getString(2)).map(_.group(1).toLong)))
    val agg = ev.groupBy(e => (e._1, e._2)).map { case (k, rows) =>
      val byVal = rows.groupBy(_._3).view.mapValues(_.length.toLong)
      k -> (rows.length.toLong, byVal.size.toLong,
        byVal.values.max * 1000000L / rows.length)
    }
    assert(out.keySet == agg.keySet.toSet)
    for ((k, (n, l, top)) <- agg)
      assert(out(k) == ((n, l, top, if (l < 3) 1L else 0L)), s"class $k")
    assert(out.values.map(_._1).sum == ev.length.toLong)
  }

  test("x135 dim quantiles are bit-identical to the built-in percentile") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("x135_dim_quantiles")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val micro = graft.ops.Tables(spark, sfDir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim").cast("long").as("dim"),
        floor(col("v").cast("double") * 1000000 + 0.5).cast("long").as("micro"))
    val ref = micro.groupBy("dim").agg(
        percentile(col("micro"), lit(0.25)).as("p25"),
        percentile(col("micro"), lit(0.5)).as("med"),
        percentile(col("micro"), lit(0.75)).as("p75"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(ref.length == 64 && out.size == 64)
    for ((d, (p25, med, p75)) <- ref) {
      // EXACT equality, not tolerance: the quantile positions are dyadic
      // and the cell values integers, so interpolation carries no ulp
      assert(out(d) == ((p25, med, p75, p75 - p25)), s"dim $d")
    }
  }

  test("x136 shard plan: shards within range, per-language mass conserved, target honored") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("x136_shard_plan")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val tok = graft.ops.Tables(spark, sfDir, "documents")
      .where(col("text").isNotNull)
      .groupBy("lang").agg(sum(size(split(col("text"), " ")).cast("long")).as("t"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((lang, rows) <- out.groupBy(_._1)) {
      val (t, n) = tok(lang)
      val nShards = math.max(1L, (t + 262143) / 262144)
      assert(rows.forall(r => r._2 >= 0 && r._2 < nShards), s"$lang shard range")
      assert(rows.map(_._3).sum == n, s"$lang doc mass")
      assert(rows.map(_._4).sum == t, s"$lang token mass")
      for (r <- rows) assert(r._5 == r._4 * 1000000L / 262144, s"$lang fill ppm")
    }
  }

  test("x137 cluster-safe split: zero leakage, clusters travel wholesale, docs partitioned") {
    val out = SparkEntry.queries("x137_cluster_split")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSet.subsetOf(Set("train", "val", "test")))
    assert(out.forall(_._4 == 0L), s"leaked pairs: $out")
    val nDocs = graft.ops.Tables(spark, sfDir, "documents").count()
    assert(out.map(_._2).sum == nDocs)
    // independent leak check: every x02 candidate pair's endpoints share a
    // split (re-derived from the x31 cluster output, not from x137)
    val clusters = SparkEntry.queries("x31_dup_clusters")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def coin(g: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.toString.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString
      val c = Integer.parseInt(hex, 16)
      if (c < 52429) "train" else if (c < 58982) "val" else "test"
    }
    val pairs = SparkEntry.queries("x02_minhash_lsh")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    for ((a, b) <- pairs)
      assert(coin(clusters(a)) == coin(clusters(b)), s"pair ($a,$b) crosses splits")
  }

  test("x139 source minhash equals a collect-side union-sketch re-derivation") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("x139_source_minhash")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // re-derive: per-source distinct word-3-gram digest sets from scratch
    val docs = graft.ops.Tables(spark, sfDir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), Option(r.getString(1)).getOrElse("")))
    def shingles(t: String): Set[String] = {
      val w = t.split(" ", -1)
      (0 until math.max(w.length - 2, 0)).map { i =>
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${w(i)} ${w(i + 1)} ${w(i + 2)}".getBytes("UTF-8"))
        md.take(8).map("%02x".format(_)).mkString
      }.toSet
    }
    val bySource = docs.groupBy(_._1).view
      .mapValues(_.map(d => shingles(d._2)).reduce(_ ++ _)).toMap
    val P = 2147483647L
    def mh(set: Set[String]): Array[Long] = {
      val hs = set.toArray.map(sh => java.lang.Long.parseLong(sh.take(15), 16) % P)
      (0 to 11).toArray.map { j =>
        val a = (2654435761L * (j + 1)) % P; val b = (40503L * (j + 7) + 97) % P
        hs.map(h => (a * h + b) % P).min
      }
    }
    val sigs = bySource.view.mapValues(mh).toMap
    for (sa <- bySource.keys; sb <- bySource.keys if sa < sb) {
      val agree = (0 to 11).count(j => sigs(sa)(j) == sigs(sb)(j)).toLong
      val i = (bySource(sa) & bySource(sb)).size.toLong
      val u = bySource(sa).size + bySource(sb).size - i
      val est = agree * 1000000L / 12
      val exact = i * 1000000L / u
      assert(out((sa, sb)) == ((est, exact, est - exact)), s"pair ($sa,$sb)")
    }
  }

  test("x140 embedding outliers equal a collect-side Tukey-fence re-derivation") {
    val out = SparkEntry.queries("x140_embedding_outliers")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val vecs = graft.ops.Tables(spark, sfDir, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1000000 + 0.5).toLong).toArray))
    def q(sorted: Array[Long], p: Double): Double = {
      val pos = p * (sorted.length - 1)
      val lo = sorted(pos.toInt).toDouble
      val hi = sorted(math.ceil(pos).toInt).toDouble
      // integral position: BOTH lerp weights are 0 — return the cell value
      // (the production exactQuantiles' explicit loI === hiI branch);
      // lerp-only would yield 0 whenever (n-1) divides by 4
      if (pos == math.floor(pos)) lo
      else lo * (math.ceil(pos) - pos) + hi * (pos - pos.toInt)
    }
    val fences = (0 until 64).map { d =>
      val s = vecs.map(_._2(d)).sorted
      val (p25, p75) = (q(s, 0.25), q(s, 0.75))
      (p25 - 1.5 * (p75 - p25), p75 + 1.5 * (p75 - p25))
    }
    val counts = vecs.map { case (id, v) =>
      id -> (0 until 64).count(d => v(d) < fences(d)._1 || v(d) > fences(d)._2).toLong
    }
    val hist = counts.groupBy(_._2).map { case (k, vs) =>
      k -> (vs.length.toLong, vs.map(_._1).min)
    }
    assert(out == hist)
    assert(out.values.map(_._1).sum == vecs.length.toLong)
  }

  test("x141 vocab curve equals a collect-side top-V prefix-sum re-derivation") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("x141_vocab_curve")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val counts = graft.ops.Tables(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val total = counts.map(_._2).sum
    val ranked = counts.sortBy { case (t, c) => (-c, t) }
    for (v <- Seq(250L, 500L, 1000L, 2000L)) {
      val s = ranked.take(v.toInt).map(_._2).sum
      assert(out(v) == ((total, total - s, (total - s) * 1000000L / total)), s"V=$v")
    }
    // the curve is monotone non-increasing in vocab size
    val oovs = Seq(250L, 500L, 1000L, 2000L).map(v => out(v)._2)
    assert(oovs == oovs.sorted.reverse)
  }

  test("x138 label dispersion equals brute-force mean pairwise distance on micro vectors") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("x138_label_dispersion")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val vecs = graft.ops.Tables(spark, sfDir, "embeddings")
      .select(col("label").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(v => math.floor(v.toDouble * 1000000 + 0.5).toLong).toArray))
    for ((lbl, members) <- vecs.groupBy(_._1)) {
      val vs = members.map(_._2)
      val n = vs.length
      assert(out(lbl)._1 == n.toLong)
      if (n >= 2) {
        var sum = BigInt(0)
        for (i <- 0 until n; j <- (i + 1) until n; d <- 0 until 64) {
          val diff = BigInt(vs(i)(d) - vs(j)(d)); sum += diff * diff
        }
        val mean = 2.0 * sum.toDouble / (n.toDouble * (n - 1)) / 1e12
        // brute force double-chains differ from the moments identity only
        // in float association — compare at the output's 6-dp rounding
        assert(math.abs(out(lbl)._2 - mean) < 2e-6, s"label $lbl: ${out(lbl)._2} vs $mean")
      } else assert(out(lbl)._2 == -1.0)
    }
  }

  private def md5lower(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Per-doc DISTINCT word-3-gram digest set (DedupOps' shingled shape). */
  private def docShingleSets(): Seq[(Long, String, Set[String])] =
    graft.ops.Tables(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .filter(!_.isNullAt(2))
      .map { r =>
        val w = r.getString(2).split(" ", -1)
        val sh = if (w.length < 3) Set.empty[String]
          else (0 to w.length - 3).map(i =>
            md5lower(s"${w(i)} ${w(i + 1)} ${w(i + 2)}").take(16)).toSet
        (r.getLong(0), r.getString(1), sh)
      }.toSeq

  test("x142 hll registers re-derive collect-side and the ALL row is the max-merge of the sources") {
    val out = SparkEntry.queries("x142_hll_union")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)), r.getDouble(4), r.getDouble(5))).toMap
    val pairs = docShingleSets().flatMap { case (_, src, sh) => sh.map(src -> _) }
    def rho(sh: String): Int = {
      val ws = sh.take(13)
      val z = ws.takeWhile(_ == '0').length
      if (z == 13) 53
      else {
        val d = Integer.parseInt(ws(z).toString, 16)
        val lz = if (d >= 8) 0 else if (d >= 4) 1 else if (d >= 2) 2 else 3
        4 * z + lz + 1
      }
    }
    def bucket(sh: String): Int = Integer.parseInt(sh.substring(13, 15), 16) % 32
    val perSrc = pairs.groupBy(_._1).map { case (src, ps) =>
      src -> ps.map(_._2).distinct.map(sh => bucket(sh) -> rho(sh))
        .groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
    }
    val merged = perSrc.values.flatten.groupBy(_._1).map { case (b, ms) => b -> ms.map(_._2).max }
    def est(reg: Map[Int, Int]): (Long, Double) = {
      val intsum = reg.values.map(m => 1L << (53 - m)).sum + (32L - reg.size) * (1L << 53)
      (32L - reg.size, 713.728 * 9007199254740992.0 / intsum.toDouble)
    }
    def r2(x: Double) = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    for ((src, reg) <- perSrc + ("ALL" -> merged)) {
      val ps = if (src == "ALL") pairs.map(_._2) else pairs.filter(_._1 == src).map(_._2)
      val (zb, e) = est(reg)
      val (counts, hll, _) = out(src)
      assert(counts == ((ps.size.toLong, ps.distinct.size.toLong, zb)), s"src $src")
      assert(math.abs(hll - r2(e)) < 1e-9, s"src $src est: $hll vs $e")
    }
    assert(out.keySet.size == perSrc.size + 1)
  }

  test("x143 rrf fusion equals a collect-side two-leg brute-force re-derivation") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("x143_rrf_fusion")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(4), r.getLong(5)), r.getDouble(3))).toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vecs = graft.ops.Tables(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cosr(q: Long, c: Long): Double = {
      def dot(a: Array[Float], b: Array[Float]) =
        (0 until a.length).foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
      val (a, b) = (vecs(q), vecs(c))
      r6(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))))
    }
    val toks = graft.ops.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .filter(!_.isNullAt(1))
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSet).toMap
    val qids = vecs.keys.filter(q => q % 50 == 0 && q < 20000).toSeq.sorted
    for (q <- qids) {
      val cl = vecs.keys.filter(_ != q).toSeq
        .map(c => (c, cosr(q, c))).sortBy { case (c, s) => (-s, c) }
        .take(20).zipWithIndex.map { case ((c, _), i) => c -> (i + 1) }.toMap
      val ll = toks.filter { case (d, ws) => d != q && (ws & toks(q)).nonEmpty }
        .map { case (d, ws) => (d, (ws & toks(q)).size) }.toSeq
        .sortBy { case (d, o) => (-o, d) }
        .take(20).zipWithIndex.map { case ((d, _), i) => d -> (i + 1) }.toMap
      val fused = (cl.keySet ++ ll.keySet).toSeq
        .map { d =>
          val sc = cl.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
            ll.get(d).map(r => 1.0 / (60 + r)).getOrElse(0.0)
          (d, sc, cl.getOrElse(d, -1).toLong, ll.getOrElse(d, -1).toLong)
        }
        .sortBy { case (d, sc, _, _) => (-sc, d) }.take(5)
      for (((d, sc, rc, rl), i) <- fused.zipWithIndex) {
        val (ids, rrf) = out((q, i + 1))
        assert(ids == ((d, rc, rl)), s"q=$q rk=${i + 1}")
        assert(math.abs(rrf - r6(sc)) < 1e-9, s"q=$q rk=${i + 1} score")
      }
    }
    assert(out.size == qids.size * 5)
  }

  test("x144 centroid confusion equals a collect-side integer-distance re-derivation") {
    val out = SparkEntry.queries("x144_centroid_confusion")(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7)), r.getDouble(8))).toMap
    val vecs = graft.ops.Tables(spark, sfDir, "embeddings")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).map(v => math.floor(v.toDouble * 1000000 + 0.5).toLong).toArray))
    val cents = vecs.groupBy(_._2).map { case (l, ms) =>
      l -> (0 until 64).map(d =>
        math.floor(ms.map(_._3(d)).sum.toDouble / ms.length + 0.5).toLong).toArray
    }
    val preds = vecs.map { case (_, l, pv) =>
      val p = cents.toSeq.map { case (cl, cv) =>
        (cl, (0 until 64).map(d => (pv(d) - cv(d)) * (pv(d) - cv(d))).sum)
      }.minBy { case (cl, d2) => (d2, cl) }._1
      (l, p)
    }
    val labels = cents.keys.toSeq.sorted
    val nTrue = preds.groupBy(_._1).map { case (l, ps) => l -> ps.length.toLong }
    val nPred = preds.groupBy(_._2).map { case (l, ps) => l -> ps.length.toLong }
    val tp = preds.filter(p => p._1 == p._2).groupBy(_._1).map { case (l, ps) => l -> ps.length.toLong }
    val nTot = preds.length.toLong
    val diag = tp.values.sum
    val peNum = labels.map(l =>
      BigInt(nTrue.getOrElse(l, 0L)) * BigInt(nPred.getOrElse(l, 0L))).sum
    val kappa = {
      val po = diag.toDouble / nTot
      val pe = peNum.toDouble / nTot / nTot
      BigDecimal((po - pe) / (1.0 - pe)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    for (l <- labels) {
      val (nt, np, t) = (nTrue.getOrElse(l, 0L), nPred.getOrElse(l, 0L), tp.getOrElse(l, 0L))
      val prec = if (np == 0) -1L else t * 1000000L / np
      val rec  = if (nt == 0) -1L else t * 1000000L / nt
      val f1   = if (prec > 0 && rec > 0) 2 * prec * rec / (prec + rec) else 0L
      val (ints, k) = out(l)
      assert(ints == ((nt, np, t, prec, rec, f1, diag * 1000000L / nTot)), s"label $l")
      assert(math.abs(k - kappa) < 1e-9, s"label $l kappa")
    }
    assert(out.size == labels.size)
  }

  test("x145 batch novelty equals a collect-side first-seen re-derivation") {
    val out = SparkEntry.queries("x145_batch_novelty")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val sets = docShingleSets()
    val n = graft.ops.Tables(spark, sfDir, "documents").count()
    val inst = sets.flatMap { case (id, _, sh) =>
      sh.map(_ -> math.min(9L, id * 10 / n))
    }
    val first = inst.groupBy(_._1).map { case (sh, bs) => sh -> bs.map(_._2).min }
    val byBatch = inst.groupBy(_._2)
    for ((b, is) <- byBatch) {
      val novel = is.count { case (sh, bb) => first(sh) == bb }.toLong
      val newSh = is.map(_._1).distinct.count(sh => first(sh) == b).toLong
      assert(out(b) == ((is.size.toLong, novel, novel * 1000000L / is.size, newSh)), s"batch $b")
    }
    assert(out.keySet == byBatch.keySet)
    // novelty is 100% in batch 0 by construction
    assert(out(0L)._3 == 1000000L)
  }

  test("x146 packing waste equals a collect-side per-doc policy re-derivation") {
    val out = SparkEntry.queries("x146_packing_waste")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7), r.getLong(8))).toMap
    val rows = graft.ops.Tables(spark, sfDir, "documents")
      .select("lang", "text").collect()
      .filter(!_.isNullAt(1))
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
    val langs = rows.map(_._1).distinct
    for (lang <- langs; l <- Seq(64L, 256L, 1024L)) {
      val ts = rows.filter(_._1 == lang).map(_._2)
      val lost = ts.map(t => math.max(0L, t - l)).sum
      val seqs = ts.map(t => (t + l - 1) / l).sum
      val slots = seqs * l
      assert(out((lang, l)) == ((ts.length.toLong, ts.sum, seqs, lost,
        lost * 1000000L / ts.sum, slots - ts.sum,
        (slots - ts.sum) * 1000000L / slots)), s"($lang, $l)")
    }
    assert(out.size == langs.length * 3)
  }

  test("x148 token drift equals a collect-side TVD re-derivation") {
    val out = SparkEntry.queries("x148_token_drift")(spark, sfDir).collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(out.map(_._1).toSeq == (1 to 10))
    val rows = graft.ops.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .filter(!_.isNullAt(1)).map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val n = graft.ops.Tables(spark, sfDir, "documents").count()
    val counts = rows.flatMap { case (id, ws) =>
      val h = if (id * 2 < n) 0 else 1
      ws.map(w => (w, h))
    }.groupBy(_._1).map { case (w, hs) =>
      (w, hs.count(_._2 == 0).toLong, hs.count(_._2 == 1).toLong)
    }.toSeq
    val (t0, t1) = (counts.map(_._2).sum, counts.map(_._3).sum)
    val gaps = counts.map { case (w, c0, c1) =>
      (w, c0, c1, (BigInt(c0) * t1 - BigInt(c1) * t0).abs)
    }
    val tvd = (gaps.map(_._4).sum * 1000000 / (2 * BigInt(t0) * BigInt(t1))).toLong
    val head = gaps.sortBy { case (w, _, _, g) => (-g, w) }.take(10)
    for (((w, c0, c1, g), i) <- head.zipWithIndex) {
      val gp = (g * 1000000 / (BigInt(t0) * BigInt(t1))).toLong
      assert(out(i)._2 == ((w, c0, c1, gp, t0, t1, tvd)), s"rank ${i + 1}")
    }
  }

  test("x149 ks length equals a collect-side two-sample ECDF sup re-derivation") {
    val out = SparkEntry.queries("x149_ks_length")(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val rows = graft.ops.Tables(spark, sfDir, "documents")
      .select("lang", "n_chars").collect()
      .filter(!_.isNullAt(1)).map(r => (r.getString(0), r.getLong(1)))
    val n = rows.length.toLong
    val vsAll = rows.map(_._2).distinct.sorted
    for (lang <- rows.map(_._1).distinct) {
      val mine = rows.filter(_._1 == lang).map(_._2)
      val nl = mine.length.toLong
      val cands = vsAll.map { v =>
        val fl = mine.count(_ <= v).toLong
        val fg = rows.count(_._2 <= v).toLong
        (v, (BigInt(fl) * (n - nl) - BigInt(fg - fl) * nl).abs)
      }
      val (bestV, bestD) = cands.maxBy { case (v, d2) => (d2, -v) }
      val ks = if (n == nl) 0L else (bestD * 1000000 / (BigInt(nl) * (n - nl))).toLong
      assert(out(lang) == ((nl, ks, bestV)), s"lang $lang")
    }
  }

  test("x150 classifier auc equals a collect-side Mann-Whitney re-derivation") {
    val out = SparkEntry.queries("x150_classifier_auc")(spark, sfDir).collect()
    assert(out.length == 1)
    val got = (out(0).getLong(0), out(0).getLong(1), out(0).getLong(2), out(0).getLong(3))
    // re-derive per-doc scores from the x105 model definition
    import org.apache.spark.sql.functions._
    val scored = SparkEntry.queries("x105_hash_classifier")(spark, sfDir)
      .select(col("doc_id"), (col("lang") === "en").as("pos"),
        expr("sw_milli div n_tokens").as("score")).collect()
      .map(r => (r.getBoolean(1), r.getLong(2)))
    val npos = scored.count(_._1).toLong
    val nneg = scored.length - npos
    // average-rank Mann-Whitney over the sorted scores
    val sorted = scored.sortBy(_._2)
    var idx = 0
    var r2 = BigInt(0)
    while (idx < sorted.length) {
      var j = idx
      while (j < sorted.length && sorted(j)._2 == sorted(idx)._2) j += 1
      val np = sorted.slice(idx, j).count(_._1)
      r2 += BigInt(np) * (2L * idx + (j - idx) + 1)
      idx = j
    }
    val u2 = r2 - BigInt(npos) * (npos + 1)
    val auc = if (npos == 0 || nneg == 0) -1L
      else (u2 * 1000000 / (2 * BigInt(npos) * nneg)).toLong
    assert(got == ((scored.length.toLong, npos, nneg, auc)))
    // sanity: the en-vs-rest classifier must rank better than chance
    assert(got._4 > 500000L)
  }

  test("x147 covariance audit equals a collect-side exact-moment re-derivation") {
    val out = SparkEntry.queries("x147_cov_offdiag")(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)), r.getDouble(3)))
    assert(out.map(_._1).toSeq == (1 to 20))
    val vecs = graft.ops.Tables(spark, sfDir, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(v => math.floor(v.toDouble * 1000 + 0.5).toLong).toArray)
    val n = BigInt(vecs.length)
    val s = (0 until 64).map(d => BigInt(vecs.map(_(d)).sum))
    def p(i: Int, j: Int) = BigInt(vecs.map(v => v(i) * v(j)).sum)
    def corr(i: Int, j: Int): Double = {
      val num = n * p(i, j) - s(i) * s(j)
      val vi  = n * p(i, i) - s(i) * s(i)
      val vj  = n * p(j, j) - s(j) * s(j)
      if (vi <= 0 || vj <= 0) 0.0
      else num.toDouble / math.sqrt(vi.toDouble) / math.sqrt(vj.toDouble)
    }
    val ranked = (for (i <- 0 until 64; j <- i + 1 until 64) yield
      ((i + 1).toLong, (j + 1).toLong, corr(i, j)))
      .sortBy { case (i, j, c) => (-math.abs(c), i, j) }.take(20)
    for ((exp, got) <- ranked.zip(out)) {
      assert(got._2._1 == ((exp._1, exp._2)), s"rank ${got._1}")
      assert(math.abs(got._2._2 - exp._3) < 2e-6, s"rank ${got._1} corr")
    }
  }

  test("x39/x54 keep a group whose n_chars are all NULL (r10 advice: quantiles decorate, counts anchor)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // exactQuantiles filters nulls pre-histogram, so an all-null group is
    // absent from its frame; the oracle's plain GROUP BY keeps the group
    // with NULL quartiles/med/mad, 0 outliers, and its row count. The
    // r11 left-joins make the engine match on this hostile fixture.
    val tmp = java.nio.file.Files.createTempDirectory("graft-nullgrp")
    try {
      val base = spark.read.parquet(s"$sfDir/documents.parquet")
      val hostile = Seq(
        (900001L, "alpha beta", "zz", "nullsrc", None: Option[Long]),
        (900002L, "gamma delta", "zz", "nullsrc", None: Option[Long]))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      base.select("doc_id", "text", "lang", "source", "n_chars")
        .unionByName(hostile)
        .write.parquet(s"$tmp/documents.parquet")
      val q39 = SparkEntry.queries("x39_len_quartiles")(spark, tmp.toString)
        .where(col("lang") === "zz").collect()
      assert(q39.length == 1, "all-null lang dropped from x39")
      assert(q39(0).getLong(q39(0).fieldIndex("n")) == 2L)
      for (c <- Seq("q1", "med", "q3"))
        assert(q39(0).isNullAt(q39(0).fieldIndex(c)), s"x39 $c not NULL")
      val q54 = SparkEntry.queries("x54_mad_outliers")(spark, tmp.toString)
        .where(col("source") === "nullsrc").collect()
      assert(q54.length == 1, "all-null source dropped from x54")
      assert(q54(0).getLong(q54(0).fieldIndex("n")) == 2L)
      assert(q54(0).getLong(q54(0).fieldIndex("n_outliers")) == 0L)
      for (c <- Seq("med", "mad"))
        assert(q54(0).isNullAt(q54(0).fieldIndex(c)), s"x54 $c not NULL")
      // the canonical corpus rows are untouched by the join change
      val before = SparkEntry.queries("x39_len_quartiles")(spark, sfDir).collect().toSeq
      val after = SparkEntry.queries("x39_len_quartiles")(spark, tmp.toString)
        .where(col("lang") =!= "zz").collect().toSeq
      assert(before == after)
    } finally {
      scala.util.Try(java.nio.file.Files.walk(tmp)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p)))
    }
  }

  test("x151 simpson diversity equals a collect-side per-doc re-derivation") {
    val out = SparkEntry.queries("x151_simpson_diversity")(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5))))
    val rows = graft.ops.Tables(spark, sfDir, "documents")
      .select("doc_id", "lang", "text").collect()
      .filter(!_.isNullAt(2))
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2).split(" ", -1)))
    assert(out.length == rows.length)
    val byId = out.toMap
    for ((id, lang, ws) <- rows) {
      val n = ws.length.toLong
      val sumsq = ws.groupBy(identity).values.map(g => g.length.toLong * g.length).sum
      val ppm = ((BigInt(n) * n - sumsq) * 1000000 / (BigInt(n) * n)).toLong
      val flag = if (ppm < 900000) 1 else 0
      assert(byId(id) == ((lang, n, sumsq, ppm, flag)), s"doc $id")
    }
  }

  test("x152 winnowing equals a collect-side Schleimer selection re-derivation") {
    val out = SparkEntry.queries("x152_winnowing")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val rows = graft.ops.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .filter(!_.isNullAt(1)).map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .filter(_._2.length >= 8)
    val fps = rows.flatMap { case (id, w) =>
      val hs = (0 to w.length - 4).map(i => md5hex(w.slice(i, i + 4).mkString(" ")))
      val sel = (0 to hs.length - 5).map { j =>
        val win = hs.slice(j, j + 5)
        j + win.lastIndexOf(win.min) // rightmost tie-break (Schleimer §5)
      }.distinct
      sel.map(p => (id, hs(p))).distinct
    }
    val byFp = fps.groupBy(_._2)
      .filter { case (_, ds) => ds.length >= 2 && ds.length <= 64 }
    val pairs = byFp.values.flatMap { ds =>
      val ids = ds.map(_._1).sorted
      for (i <- ids.indices; j <- i + 1 until ids.length) yield (ids(i), ids(j))
    }.groupBy(identity).map { case (p, g) => (p._1, p._2, g.size.toLong) }
      .filter(_._3 >= 2).toSeq
      .sortBy { case (a, b, c) => (-c, a, b) }
    assert(out.toSeq == pairs)
    // the corpus's exact-duplicate docs must surface as winnowing pairs
    assert(out.nonEmpty)
  }

  test("x153 chi2 balance equals a collect-side exact re-derivation") {
    val out = SparkEntry.queries("x153_chi2_balance")(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
    assert(out.map(_._1).toSeq == (1 to 10))
    val rows = graft.ops.Tables(spark, sfDir, "documents")
      .select("lang", "source").collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => (r.getString(0), r.getString(1)))
    val n = BigInt(rows.length)
    val o = rows.groupBy(identity).map { case (k, g) => k -> BigInt(g.length) }
    val rTot = rows.groupBy(_._1).map { case (k, g) => k -> BigInt(g.length) }
    val cTot = rows.groupBy(_._2).map { case (k, g) => k -> BigInt(g.length) }
    val cells = for (l <- rTot.keys.toSeq; src <- cTot.keys.toSeq) yield {
      val obs = o.getOrElse((l, src), BigInt(0))
      val d = obs * n - rTot(l) * cTot(src)
      val contrib = (d * d * 1000000 / (n * rTot(l) * cTot(src))).toLong
      val eMilli = (rTot(l) * cTot(src) * 1000 / n).toLong
      (l, src, obs.toLong, eMilli, contrib)
    }
    val chi2 = cells.map(_._5).sum
    val dof = (rTot.size - 1).toLong * (cTot.size - 1)
    val head = cells.sortBy { case (l, src, _, _, c) => (-c, l, src) }.take(10)
    for (((l, src, obs, em, c), i) <- head.zipWithIndex)
      assert(out(i)._2 == ((l, src, obs, em, c, chi2, dof)), s"rank ${i + 1}")
  }

  test("x154 rank concordance equals a collect-side brute-force pair count") {
    val out = SparkEntry.queries("x154_rank_concordance")(spark, sfDir).collect()
    assert(out.length == 1)
    val r = out(0)
    val got = (0 to 7).map(r.getLong).toVector
    val stop = Set("the", "and", "of", "to", "a")
    val rows = graft.ops.Tables(spark, sfDir, "documents")
      .select("text", "n_chars").collect()
      .filter(x => !x.isNullAt(0) && !x.isNullAt(1))
      .map { x =>
        val ws = x.getString(0).split(" ", -1)
        (ws.count(stop).toLong * 1000 / ws.length, x.getLong(1))
      }
    val n = rows.length.toLong
    var c = 0L; var d = 0L; var ta = 0L; var tb = 0L; var tab = 0L
    for (i <- rows.indices; j <- i + 1 until rows.length) {
      val s = (rows(i)._1 - rows(j)._1).sign * (rows(i)._2 - rows(j)._2).sign
      if (s > 0) c += 1 else if (s < 0) d += 1
      if (rows(i)._1 == rows(j)._1) ta += 1
      if (rows(i)._2 == rows(j)._2) tb += 1
      if (rows(i) == rows(j)) tab += 1
    }
    // C + D + T_a + T_b − T_ab must partition the n(n−1)/2 pairs
    assert(c + d + ta + tb - tab == n * (n - 1) / 2)
    val gamma = if (c + d == 0) 0L else (BigInt(c - d) * 1000000 / BigInt(c + d)).toLong
    val tau = if (n < 2) 0L else (BigInt(c - d) * 1000000 / (BigInt(n) * (n - 1) / 2)).toLong
    assert(got == Vector(n, c, d, ta, tb, tab, gamma, tau))
  }

  test("x155 burstiness equals a collect-side Fano-factor re-derivation") {
    val out = SparkEntry.queries("x155_burstiness")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val rows = graft.ops.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .filter(!_.isNullAt(1)).map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val n = rows.length.toLong
    val perDoc = rows.flatMap { case (id, ws) =>
      ws.groupBy(identity).map { case (w, g) => (w, g.length.toLong) }
    }
    val stats = perDoc.groupBy(_._1).map { case (w, cs) =>
      val s1 = cs.map(_._2).sum
      val s2 = cs.map(x => x._2 * x._2).sum
      (w, cs.length.toLong, s1, s2)
    }.filter(_._2 >= 5)
    val exp = stats.map { case (w, df, s1, s2) =>
      val vmr = ((BigInt(n) * s2 - BigInt(s1) * s1) * 1000000 / (BigInt(n) * s1)).toLong
      (w, df, s1, vmr, (BigInt(s1) * 1000000 / n).toLong)
    }.toSeq.sortBy { case (w, _, _, v, _) => (-v, w) }.take(20)
    assert(out.toSeq == exp)
  }

  test("x156 cluster density equals a re-derivation from x31 clusters and x02 pairs") {
    val out = SparkEntry.queries("x156_cluster_density")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))))
    val clusters = SparkEntry.queries("x31_dup_clusters")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap // doc -> cluster
    val pairs = SparkEntry.queries("x02_minhash_lsh")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.nonEmpty)
    val m = clusters.groupBy(_._2).map { case (c, g) => c -> g.size.toLong }
    val e = pairs.groupBy(p => clusters(p._1)).map { case (c, g) => c -> g.size.toLong }
    // every pair is intra-cluster (an edge merged its endpoints)
    pairs.foreach { case (a, b) => assert(clusters(a) == clusters(b)) }
    assert(out.map(_._1).toSeq == e.keys.toSeq.sorted)
    for ((c, (mm, ee, dens, tree)) <- out) {
      assert(mm == m(c) && ee == e(c), s"cluster $c")
      assert(dens == ee * 1000000L / (mm * (mm - 1) / 2), s"cluster $c density")
      assert(tree == (if (ee == mm - 1) 1 else 0), s"cluster $c tree flag")
    }
  }

  test("x157 threshold sweep equals a re-derivation from x86 verified pairs") {
    val out = SparkEntry.queries("x157_threshold_sweep")(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val verified = SparkEntry.queries("x86_lsh_verify")(spark, sfDir).collect()
      .map(r => (r.getLong(r.fieldIndex("doc_a")), r.getLong(r.fieldIndex("doc_b")),
        r.getLong(r.fieldIndex("jaccard_ppm"))))
    for (tau <- Seq(500000, 600000, 700000, 800000, 900000)) {
      val hits = verified.filter(_._3 >= tau)
      val docs = hits.flatMap(h => Seq(h._1, h._2)).distinct
      assert(out(tau) == ((hits.length.toLong, docs.length.toLong)), s"tau $tau")
    }
    // yield must be monotone non-increasing in tau
    val ys = Seq(500000, 600000, 700000, 800000, 900000).map(out(_)._1)
    assert(ys == ys.sorted.reverse)
  }

  test("x158 embedding drift equals a collect-side mean-shift re-derivation") {
    val out = SparkEntry.queries("x158_embedding_drift")(spark, sfDir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7))))
    assert(out.map(_._1).toSeq == (1 to 10))
    val vecs = graft.ops.Tables(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)
        .map(v => math.floor(v.toDouble * 1000000 + 0.5).toLong).toArray))
    val n = vecs.length.toLong
    val dims = vecs.head._2.length
    val byDim = (0 until dims).map { d =>
      val h0 = vecs.filter(_._1 * 2 < n).map(_._2(d))
      val h1 = vecs.filter(_._1 * 2 >= n).map(_._2(d))
      val gap = ((BigInt(h0.sum) * h1.length - BigInt(h1.sum) * h0.length) * 1000 /
        (BigInt(h0.length) * h1.length)).toLong
      ((d + 1).toLong, h0.length.toLong, h1.length.toLong, h0.sum, h1.sum, gap)
    }
    val l2sq = byDim.map(x => BigInt(x._6) * x._6).sum.toLong
    val head = byDim.sortBy { case (d, _, _, _, _, g) => (-g.abs, d) }.take(10)
    for (((d, n0, n1, s0, s1, g), i) <- head.zipWithIndex)
      assert(out(i)._2 == ((d, n0, n1, s0, s1, g, l2sq)), s"rank ${i + 1}")
  }

  test("x159 weighted median equals a collect-side cumulative-mass re-derivation") {
    val out = SparkEntry.queries("x159_weighted_median")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val rows = graft.ops.Tables(spark, sfDir, "documents")
      .select("source", "n_chars", "text").collect()
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .map(r => (r.getString(0), r.getLong(1), r.getString(2).split(" ", -1).length.toLong))
    assert(out.keySet == rows.map(_._1).toSet)
    for ((src, grp) <- rows.groupBy(_._1)) {
      val byLen = grp.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val tot = byLen.map(_._2).sum
      var cum = 0L; var med = -1L; var p90 = -1L
      for ((len, w) <- byLen) {
        cum += w
        if (med < 0 && 2 * cum >= tot) med = len
        if (p90 < 0 && 10 * cum >= 9 * tot) p90 = len
      }
      assert(out(src) == ((tot, med, p90)), s"source $src")
      // the weighted median can never sit below the doc-count median's
      // floor value for a mass-per-doc that grows with length — sanity
      // only: both quantiles must be actual lengths of this source
      assert(grp.exists(_._2 == med) && grp.exists(_._2 == p90))
    }
  }

  test("x162 cross-source attribution equals a re-derivation from x02 pairs") {
    val out = SparkEntry.queries("x162_cross_source_dups")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val srcOf = graft.ops.Tables(spark, sfDir, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse("(null)")).toMap
    val pairs = SparkEntry.queries("x02_minhash_lsh")(spark, sfDir).collect()
      .map(r => (srcOf(r.getLong(0)), srcOf(r.getLong(1)), r.getLong(2)))
    val groups = pairs.groupBy { case (a, b, _) =>
      if (a <= b) (a, b) else (b, a)
    }
    val total = pairs.length.toLong
    assert(out.keySet == groups.keySet)
    for ((k, g) <- groups) {
      val nPairs = g.length.toLong
      val bands  = g.map(_._3).sum
      val share  = (BigInt(nPairs) * 1000000 / total).toLong
      assert(out(k) == ((nPairs, bands, share)), s"source pair $k")
    }
  }

  test("x163 MMR selection equals a brute-force greedy re-derivation") {
    val out = SparkEntry.queries("x163_mmr_select")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // structural invariants first: ranks 1..k, distinct picks, row-wise
    // score identity. (Winning scores are NOT monotone in general: a
    // NEGATIVE max-cosine penalty can push a later step's score above the
    // pure-relevance first pick — observed on the sf0.001 corpus.)
    assert(out.map(_._1).toSeq == (1L to out.length))
    assert(out.map(_._2).distinct.length == out.length)
    for ((_, _, rel, pen, score) <- out) assert(score == 7 * rel - 3 * pen)
    // independent re-derivation from the raw float vectors
    val vecs = graft.ops.Tables(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .filter(!_.isNullAt(1))
      .map(r => (r.getLong(0), r.getSeq[Float](1)
        .map(v => math.floor(v.toDouble * 1000000 + 0.5).toLong).toArray))
    val dims = vecs.head._2.length
    val mean = (0 until dims).map { d =>
      val s = vecs.map(_._2(d)).sum
      math.floor(s.toDouble / vecs.length + 0.5).toLong
    }.toArray
    val nm2 = mean.map(m => m * m).sum
    def relOf(v: Array[Long]): (Long, Long) = {
      val dot = v.indices.map(i => v(i) * mean(i)).sum
      val na2 = v.map(x => x * x).sum
      (math.floor(dot.toDouble / math.sqrt(na2.toDouble) / math.sqrt(nm2.toDouble)
        * 1000000 + 0.5).toLong, na2)
    }
    val pool = vecs.filter(_._2.exists(_ != 0L))
      .map { case (id, v) => val (r, n2) = relOf(v); (id, r, v, n2) }
      .sortBy { case (id, r, _, _) => (-r, id) }.take(24)
    def sim(a: (Long, Long, Array[Long], Long), b: (Long, Long, Array[Long], Long)): Long = {
      val dot = a._3.indices.map(i => a._3(i) * b._3(i)).sum
      math.floor(dot.toDouble / math.sqrt(a._4.toDouble) / math.sqrt(b._4.toDouble)
        * 1000000 + 0.5).toLong
    }
    var chosen = Vector.empty[(Long, Long, Array[Long], Long)]
    var remaining = pool.toVector
    val expect = (1 to 8).flatMap { rk =>
      if (remaining.isEmpty) None else {
        val scored = remaining.map { c =>
          val pen = if (chosen.isEmpty) 0L else chosen.map(sim(c, _)).max
          (c, pen, 7 * c._2 - 3 * pen)
        }
        val (best, pen, score) = scored.minBy { case (c, _, sc) => (-sc, c._1) }
        chosen :+= best
        remaining = remaining.filterNot(_._1 == best._1)
        Some((rk.toLong, best._1, best._2, pen, score))
      }
    }
    assert(out.toSeq == expect)
  }

  test("x164 dedup impact equals a collect-side survivorship re-derivation") {
    val out = SparkEntry.queries("x164_dedup_impact")(spark, sfDir).collect()
      .map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .toMap
    val rows = graft.ops.Tables(spark, sfDir, "documents")
      .select("source", "doc_id", "n_chars", "text").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2), Option(r.getString(3))))
    // survivors: min doc_id per text value (md5 grouping ≡ text grouping)
    val kept = rows.groupBy(_._4).values.map(_.minBy(_._2)._2).toSet
    assert(out.keySet == rows.map(_._1).toSet)
    for ((src, grp) <- rows.groupBy(_._1)) {
      val (k, rm) = grp.partition(r => kept(r._2))
      val kc = k.map(_._3).sum; val rc = rm.map(_._3).sum
      val docPpm  = (BigInt(rm.length) * 1000000 / grp.length).toLong
      val charPpm = if (kc + rc == 0) 0L else (BigInt(rc) * 1000000 / (kc + rc)).toLong
      assert(out(src) ==
        ((k.length.toLong, rm.length.toLong, kc, rc, docPpm, charPpm)), s"source $src")
    }
  }

  test("x165 dup-token share equals a collect-side shingle-df re-derivation") {
    val out = SparkEntry.queries("x165_dup_token_share")(spark, sfDir).collect()
      .map(r => Option(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def md5hex16(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val rows = graft.ops.Tables(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(2))))
    val inst = rows.flatMap { case (id, src, text) =>
      val w = text.getOrElse("").split(" ", -1)
      val shingles =
        if (text.isEmpty || w.length < 3) Set.empty[String]
        else (0 to w.length - 3).map(i => md5hex16(s"${w(i)} ${w(i + 1)} ${w(i + 2)}")).toSet
      shingles.map(sh => (id, src, sh))
    }
    val df = inst.groupBy(_._3).view.mapValues(_.length).toMap
    val bySrc = inst.groupBy(_._2).filter(_._2.nonEmpty)
    assert(out.keySet == bySrc.keySet)
    for ((src, g) <- bySrc) {
      val n    = g.length.toLong
      val dup  = g.count(i => df(i._3) > 1).toLong
      val dist = g.map(_._3).distinct.length.toLong
      val ppm  = (BigInt(dup) * 1000000 / n).toLong
      assert(out(src) == ((n, dup, dist, ppm)), s"source $src")
    }
  }

  test("x166 span excision cross-checks x88, x164 and x165 (r12 verdict item 5)") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("x166_span_excise")(spark, sfDir).collect()
    assert(out.nonEmpty)
    // internal accounting identities + the corpus must exercise the signal
    out.foreach { r =>
      val (nd, touched, emptied) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("docs_touched"), r.getAs[Long]("docs_emptied"))
      val (tot, exc, kept, ppm) = (r.getAs[Long]("total_words"),
        r.getAs[Long]("excised_words"), r.getAs[Long]("kept_words"),
        r.getAs[Long]("kept_ppm"))
      assert(emptied <= touched && touched <= nd)
      assert(exc >= 0 && exc <= tot && kept == tot - exc)
      assert(ppm == (BigInt(kept) * 1000000 / tot).toLong)
    }
    assert(out.map(_.getAs[Long]("excised_words")).sum > 0)

    // vs x88 (same df≥2 distinct-docs 5-gram rule): a doc is touched by
    // excision ⟺ x88 reports a duplicated span in it — and every touched
    // doc loses at least one whole 5-gram (≥ 5 words)
    val cut = graft.ops.DedupOps.spanCutWords(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cut_words")).toMap
    val dupDocs = SparkEntry.queries("x88_span_dedup")(spark, sfDir).collect()
      .filter(_.getAs[Long]("n_dup") > 0).map(_.getAs[Long]("doc_id")).toSet
    assert(cut.keySet == dupDocs,
      s"excision-touched docs must equal x88's dup-span docs (${cut.size} vs ${dupDocs.size})")
    assert(cut.values.forall(_ >= 5L), "a touched doc loses at least one whole 5-gram")

    // vs x164 (exact-dup survivorship): an exact-duplicate doc of ≥ 5 words
    // is FULLY emptied — every one of its 5-grams has a cross-doc twin
    val docs = graft.ops.Tables(spark, sfDir, "documents")
      .where(col("text").isNotNull)
      .select(col("doc_id"), md5(col("text")).as("dg"),
        size(split(col("text"), " ")).cast("long").as("n")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val dgCount = docs.groupBy(_._2).view.mapValues(_.length).toMap
    // (sf0.001 carries no exact-dup pair — the check bites when one exists;
    // the synthetic near-dups below still exercise the x88 equality above)
    val exactDups = docs.filter(d => dgCount(d._2) >= 2 && d._3 >= 5)
    exactDups.foreach { case (id, _, n) =>
      assert(cut.get(id).contains(n), s"exact-dup doc $id must be fully excised ($n words)")
    }

    // vs x165 (trigram dup-token share): a duplicated 5-gram contains
    // duplicated trigrams, so any source with excised words has dup
    // trigram instances
    val dupInst = SparkEntry.queries("x165_dup_token_share")(spark, sfDir).collect()
      .map(r => Option(r.getString(0)) -> r.getAs[Long]("n_dup_inst")).toMap
    out.foreach { r =>
      if (r.getAs[Long]("excised_words") > 0)
        assert(dupInst.getOrElse(Option(r.getString(0)), 0L) > 0,
          s"source ${r.getString(0)}: excised words imply dup trigram instances")
    }
  }
}
