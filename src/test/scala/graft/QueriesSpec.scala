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
  private val mayBeEmpty = Set("r04_reconcile_diff", "t05_forecast_revenue")
  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and is well-formed") {
      val df   = fn(spark, sfDir)
      val rows = df.collect()
      if (!mayBeEmpty(name)) assert(rows.nonEmpty, s"$name returned 0 rows")
      assert(df.columns.nonEmpty)
      assert(df.columns.distinct.length == df.columns.length, "duplicate column names")
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

  test("brute-force top-k and LSH ANN agree on bucket-colocated neighbors") {
    val exact = SparkEntry.queries("x06_cosine_topk")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = SparkEntry.queries("x07_ann_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // ANN returns a subset of the corpus; sanity: it finds at least one
    // exact-top-5 neighbor overall at this scale
    assert(ann.isEmpty || (exact & ann).nonEmpty)
  }
}
