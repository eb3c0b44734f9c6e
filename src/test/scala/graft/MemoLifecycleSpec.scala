package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, PipelineOps}

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
}
