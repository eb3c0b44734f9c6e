package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The r9 re-plans of the per-language/stratum exact-rank window family
  * (the round-8 verdict's `weak` set): NtilePlan.histNtile must be
  * BIT-EQUAL to Spark's own `ntile(n) OVER (PARTITION BY p ORDER BY k,
  * id)` on every input shape — including the adversarial ones the
  * histogram split has to get exactly right (tie groups spanning bucket
  * boundaries, partitions smaller than n, single-value partitions) — and
  * the x30 TopKPairAgg re-plan must equal its old row_number
  * formulation. The DuckDB oracles keep the direct-window SQL, so the
  * driver's correctness gate re-proves all three every round; this spec
  * is the in-engine proof over inputs nastier than the corpus.
  */
class NtileSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-ntile-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** (part, key, id) rows → per-row buckets from both plans, compared. */
  private def check(rows: Seq[(String, Long, Long)], n: Int, label: String): Unit = {
    import spark.implicits._
    val df = rows.toDF("p", "k", "id")
    val expected = df.withColumn("bucket",
        ntile(n).over(Window.partitionBy("p").orderBy(col("k"), col("id"))).cast("long"))
      .select("p", "k", "id", "bucket").as[(String, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2, r._3))
    val got = graft.ops.NtilePlan.histNtile(df, "p", "k", "id", n)
      .select(col("p"), col("k"), col("id"), col("bucket").cast("long"))
      .as[(String, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2, r._3))
    assert(got.toSeq == expected.toSeq, s"$label (n=$n)")
  }

  test("histNtile == ntile on a deterministic pseudo-random mix of shapes") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5; n <- Seq(3, 10)) {
      // small key domain forces heavy ties; skewed part sizes
      val rows = (0 until 400).map { i =>
        val p = if (rnd.nextInt(10) < 7) "hot" else s"p${rnd.nextInt(3)}"
        (p, rnd.nextInt(8).toLong, i.toLong)
      }
      check(rows, n, s"random trial $trial")
    }
  }

  test("histNtile == ntile when one tie group spans every bucket boundary") {
    // all 100 rows share ONE key value: the single histogram cell
    // straddles all n-1 boundaries and the id tiebreak decides everything
    val rows = (0 until 100).map(i => ("p", 7L, i.toLong))
    check(rows, 3, "single-value partition")
    check(rows, 10, "single-value partition")
  }

  test("histNtile == ntile when partitions have fewer rows than buckets") {
    // q = 0 path: every row is its own bucket, formula must not div-by-0
    val rows = Seq(("a", 1L, 1L), ("a", 1L, 2L), ("b", 5L, 3L))
    check(rows, 10, "n < buckets")
    // and the exact-boundary case: rows == buckets
    check((0 until 10).map(i => ("c", (i % 2).toLong, i.toLong)), 10, "n == buckets")
  }

  test("histNtile == ntile on a 90%-one-partition skew with boundary ties") {
    val rnd = new scala.util.Random(7)
    val hot = (0 until 900).map(i => ("en", rnd.nextInt(5).toLong, i.toLong))
    val cold = (900 until 1000).map(i => (s"l${i % 4}", rnd.nextInt(5).toLong, i.toLong))
    check(hot ++ cold, 3, "skewed-language corpus")
    check(hot ++ cold, 10, "skewed-language corpus")
  }

  test("histNtileBucketStats == the window aggregation on adversarial shapes") {
    import spark.implicits._
    // the cells-only path (x58's plan): bucket count/min-key/max-key must
    // equal the direct ntile window's aggregation, including tie groups
    // spanning several boundaries and partitions smaller than n
    val rnd = new scala.util.Random(11)
    val shapes = Seq(
      (0 until 500).map(i => ("hot", rnd.nextInt(6).toLong, i.toLong)) ++
        (0 until 30).map(i => ("cold", rnd.nextInt(3).toLong, (1000 + i).toLong)),
      (0 until 80).map(i => ("p", 5L, i.toLong)), // one tie cell spans all boundaries
      Seq(("tiny", 1L, 1L), ("tiny", 2L, 2L)))    // fewer rows than buckets
    for (rows <- shapes; n <- Seq(3, 10)) {
      val df = rows.toDF("p", "k", "id")
      val expected = df.withColumn("bucket",
          ntile(n).over(Window.partitionBy("p").orderBy(col("k"), col("id"))).cast("long"))
        .groupBy("p", "bucket")
        .agg(count(lit(1)).as("n"), min(col("k")).as("lo"), max(col("k")).as("hi"))
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      val got = graft.ops.NtilePlan.histNtileBucketStats(df, "p", "k", n)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(got == expected, s"n=$n, shape of ${rows.length} rows")
    }
  }

  test("histNtileSumStats == the window aggregation with a payload sum") {
    import spark.implicits._
    // x130's plan: count/min/max are cell arithmetic, the payload SUM is
    // the one aggregate that forces boundary tie groups back to data rows
    val rnd = new scala.util.Random(23)
    val shapes = Seq(
      (0 until 600).map(i => ("hot", rnd.nextInt(5).toLong, i.toLong, rnd.nextInt(100).toLong)) ++
        (0 until 40).map(i => ("cold", rnd.nextInt(2).toLong, (2000 + i).toLong, rnd.nextInt(100).toLong)),
      (0 until 90).map(i => ("p", 7L, i.toLong, (i * 3 % 17).toLong)), // one tie cell, all boundaries
      Seq(("tiny", 1L, 1L, 5L), ("tiny", 1L, 2L, 9L)))
    for (rows <- shapes; n <- Seq(3, 10)) {
      val df = rows.toDF("p", "k", "id", "pay")
      val expected = df.withColumn("bucket",
          ntile(n).over(Window.partitionBy("p").orderBy(col("k"), col("id"))).cast("long"))
        .groupBy("p", "bucket")
        .agg(count(lit(1)).as("n"), sum(col("pay")).as("s"),
          min(col("k")).as("lo"), max(col("k")).as("hi"))
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      val got = graft.ops.NtilePlan.histNtileSumStats(df, "p", "k", "id", "pay", n)
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
      assert(got == expected, s"n=$n, shape of ${rows.length} rows")
    }
  }

  test("histNtile keeps null keys (Spark ntile semantics: nulls first under ASC)") {
    import spark.implicits._
    // a plain equi-join back to cells would silently DROP null-keyed rows;
    // the null-safe join must keep them in the same buckets Spark's own
    // window assigns (in-engine equality — the cross-engine oracle seam
    // is documented as requiring non-null keys, DuckDB sorting NULLS LAST)
    val rows: Seq[(String, Option[Long], Long)] =
      (0 until 40).map(i => ("p", if (i % 5 == 0) None else Some((i % 4).toLong), i.toLong))
    val df = rows.toDF("p", "k", "id")
    val expected = df.withColumn("bucket",
        ntile(4).over(Window.partitionBy("p").orderBy(col("k"), col("id"))).cast("long"))
      .collect().map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1)
    val got = graft.ops.NtilePlan.histNtile(df, "p", "k", "id", 4)
      .select(col("id"), col("bucket").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == expected.toSeq)
    assert(got.length == 40, "null-keyed rows were dropped")
  }

  test("x30 agg plan equals the window on null-text rows (rank-last sentinel)") {
    import spark.implicits._
    // ADVICE r9 item 1: null text makes n_unique NULL under ANSI, which
    // the old window ranked NULLS LAST but a primitive-Long UDAF lane
    // would throw on. Strata smaller than 5 force null-text docs INTO the
    // picked set (so the sentinel's rank AND its decode-to-null are both
    // exercised); the larger stratum proves nulls never displace real docs.
    val rows: Seq[(String, String, Long, String)] = Seq(
      ("s1", "en", 1L, "a b c d"), ("s1", "en", 2L, null),
      ("s1", "en", 3L, "a a"), ("s1", "en", 4L, null),
      ("s2", "de", 5L, null), // all-null stratum
      ("s2", "en", 6L, "x y"), ("s2", "en", 7L, "x")) ++
      (10L until 22L).map(i => ("s3", "fr", i, ("w" + i + " ") * (i % 7).toInt + "w"))
    val df = rows.toDF("source", "lang", "doc_id", "text")
    val got = graft.ops.NtilePlan.stratifiedTopKAgg(df).collect().toSeq
    val want = graft.ops.NtilePlan.refStratifiedTopKWindow(df).collect().toSeq
    assert(got == want)
    assert(got.exists(_.isNullAt(4)), "expected a picked null-text doc with null n_unique")
    assert(!got.exists(r => !r.isNullAt(4) && r.getLong(4) < 0), "sentinel leaked into output")
  }

  test("x30 TopKPairAgg plan equals the row_number window formulation") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = graft.ops.Tables(spark, sfDir, "documents")
    // reference window plan shared with NtileDiag/SkewSpec (NtilePlan)
    val aggPlan = SparkEntry.queries("x30_stratified_topk")(spark, sfDir)
    assert(aggPlan.collect().toSeq ==
      graft.ops.NtilePlan.refStratifiedTopKWindow(docs).collect().toSeq)
  }

  test("re-planned x58/x130 physical plans carry no rank window over doc rows") {
    val sfDir = "/root/testdata/sf0.001"
    for (q <- Seq("x58_len_deciles", "x130_ccnet_buckets", "x30_stratified_topk")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("ntile("), s"$q still plans an ntile window")
      if (q == "x30_stratified_topk")
        assert(!plan.contains("row_number("), s"$q still plans a rank window")
    }
  }
}
