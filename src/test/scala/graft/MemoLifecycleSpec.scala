package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, PipelineOps, SimilarityOps, TextOps}

/** Memo lifecycle: the (session, dir)-keyed caches in DedupOps/PipelineOps
  * must drop entries whose session has STOPPED — a long-lived multi-session
  * process (test suites, the serve shim) must not pin a dead session's
  * plans and cached blocks until someone calls clearMemo.
  *
  * The suite owns its sessions end-to-end (builds one, populates the memo,
  * stops it, builds a successor) — the established afterAll-stop pattern
  * means every other suite builds a fresh context anyway.
  */
class MemoLifecycleSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def build(): SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-memo-lifecycle")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("stopping a session evicts its memo entries on the next dedup access") {
    DedupOps.clearMemo()
    PipelineOps.clearMemo()

    val s1 = build()
    // populate several distinct caches through the public query surface
    SparkEntry.queries("x02_minhash_lsh")(s1, sfDir).collect()
    SparkEntry.queries("x107_prefix_allpairs")(s1, sfDir).collect()
    SparkEntry.queries("x90_bloom_novelty")(s1, sfDir).collect()
    val populated = DedupOps.memoSize
    assert(populated > 0, "dedup memo should hold the stopped-to-be session's entries")
    assert(PipelineOps.memoSize > 0, "novelty memo should be populated")

    s1.stop()
    // entries keyed by the stopped session are still present until swept...
    assert(DedupOps.memoSize == populated)
    // ...and the sweep (run by every accessor before reading its cache)
    // drops ALL of them, across every cache in both files
    DedupOps.evictStopped()
    PipelineOps.evictStopped()
    assert(DedupOps.memoSize == 0,
      s"dedup memo retained ${DedupOps.memoSize} entries for a stopped session")
    assert(PipelineOps.memoSize == 0,
      s"novelty memo retained ${PipelineOps.memoSize} entries for a stopped session")

    // a successor session repopulates cleanly through the same accessors
    val s2 = build()
    try {
      SparkEntry.queries("x02_minhash_lsh")(s2, sfDir).collect()
      assert(DedupOps.memoSize > 0)
    } finally {
      s2.stop()
      DedupOps.clearMemo()
      PipelineOps.clearMemo()
    }
  }

  /** Named memo attribution (r12 verdict item 4): Bench diffs memoKeys
    * around every query to emit per-query `paid_memos` — assert the diff
    * discipline names the RIGHT caches: the first dedup query pays the
    * band lineage, a later rider that needs a NEW cache (labels) is
    * attributed that cache and nothing it merely read, and clearMemo
    * leaves zero named keys across all four families.
    */
  test("memoKeys names the caches a query builds, not the ones it reads") {
    def allKeys: Set[String] =
      DedupOps.memoKeys ++ PipelineOps.memoKeys ++ TextOps.memoKeys ++ SimilarityOps.memoKeys
    DedupOps.clearMemo(); PipelineOps.clearMemo()
    TextOps.clearMemo(); SimilarityOps.clearMemo()
    assert(allKeys.isEmpty, s"cleared memos still expose keys: $allKeys")

    val s = build()
    try {
      val k0 = allKeys
      SparkEntry.queries("x02_minhash_lsh")(s, sfDir).collect()
      val paidByX02 = allKeys -- k0
      assert(paidByX02.contains("dedup.pairs") && paidByX02.contains("dedup.bands"),
        s"x02 should pay the pair+band lineage, paid: $paidByX02")
      assert(!paidByX02.contains("dedup.labels"),
        "x02 must not be attributed the cluster-label cache it never builds")

      val k1 = allKeys
      SparkEntry.queries("x31_dup_clusters")(s, sfDir).collect()
      val paidByX31 = allKeys -- k1
      assert(paidByX31.contains("dedup.labels"),
        s"x31 builds the label cache on top of x02's paid pairs, paid: $paidByX31")
      assert(!paidByX31.contains("dedup.pairs"),
        "x31 read x02's pair cache — it must not be attributed as its payer")

      // a pure re-read pays nothing: the Bench diff yields an empty set
      val k2 = allKeys
      SparkEntry.queries("x31_dup_clusters")(s, sfDir).collect()
      assert((allKeys -- k2).isEmpty, "a cache re-read must attribute no paid memo")
    } finally {
      s.stop()
      DedupOps.clearMemo(); PipelineOps.clearMemo()
      TextOps.clearMemo(); SimilarityOps.clearMemo()
    }
  }
}
