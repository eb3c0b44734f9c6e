package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline surface
  * (builder mandate; SURVEY.md §2.B extension table): exact hash dedup,
  * MinHash+LSH banding, SimHash, and exact n-gram Jaccard — all expressed as
  * shuffle-parallel Dataset programs with no driver-side state, so the same
  * plan runs on a 1000-executor cluster.
  *
  * Determinism: all hashing is md5-hex (identical in Spark and DuckDB);
  * MinHash minima are compared as 16-hex-char strings, so no integer
  * conversion is needed on either engine.
  */
object DedupOps {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  /** Max document frequency a shingle may have and still participate in the
    * x04 exact-jaccard self-join (Σdf² guard; behavior-neutral at test SF —
    * max observed df at sf0.01 is 7).
    */
  private[graft] val DfCap = 1000

  /** Word-3-gram shingle set, one row per distinct (doc_id, shingle),
    * keyed by the shingle's md5 DIGEST — the digest is projected BEFORE the
    * distinct so the dedup shuffle (and every downstream join) moves
    * 32-hex-char keys, never the raw trigram text. sequence() guarded:
    * Spark's sequence(0, n) with n<0 would generate a descending range
    * instead of an empty one.
    */
  private def shingled(s: SparkSession, dir: String): DataFrame =
    shingledDocs(docs(s, dir))

  /** Distinct 64-bit shingle digests of whatever document slice is handed
    * in — x86 shingles ONLY the candidate docs (semi-join pushed ahead of
    * the generator), the full-corpus callers pass the whole table.
    */
  private def shingledDocs(d: DataFrame): DataFrame = {
    // computeParallel: trigram construction + one MD5 per position run
    // before the distinct's exchange — the dominant cost of the whole LSH
    // lineage, serialized on a single-row-group corpus file. Identity for
    // already-parallel inputs (x86's candidate slice arrives post-join).
    // Round 15 (guide §4): the split/transform/element_at/concat_ws/md5
    // chain (interpreted HOF lambda per position, a gram string + a
    // 32-hex string allocated per shingle) is one codegen'd pass —
    // [[graft.functions.WordNgramDigests]] digests each trigram straight
    // from slices of the text's UTF-8 buffer. dedup = true is legal here
    // because of the .distinct() below: per-doc first-occurrence dedup
    // changes nothing in the distinct (doc_id, sh) set while the Generate
    // and the exchange carry only unique digests per document.
    Tables.computeParallel(d)
      .select(col("doc_id"),
        explode(graft.functions.WordNgramDigestsFunctions
          .wordNgramDigests(col("text"), 3, dedup = true)).as("sh"))
      .distinct()
  }

  /** DuckDB twin of [[shingled]] as a CTE body. 16 hex chars (64 bits) per
    * digest: collision odds at corpus scale are ~(n²/2⁶⁵) — negligible —
    * and every downstream shuffle/join moves half the key bytes.
    */
  private val shingleSql =
    """SELECT DISTINCT doc_id, substr(md5(raw), 1, 16) AS sh FROM (
      |  SELECT doc_id,
      |    unnest(list_transform(generate_series(1, greatest(len(string_split(text,' '))-2, 0)),
      |           i -> concat_ws(' ', string_split(text,' ')[i], string_split(text,' ')[i+1], string_split(text,' ')[i+2]))) AS raw
      |  FROM documents)""".stripMargin

  /** Exact dedup: first doc_id per md5(text) survives; per-source survivor
    * stats. At scale this is a single hash shuffle on the digest — never on
    * the full text bytes.
    */
  val exactDedup: Q = Q(
    "x01_exact_dedup",
    """SELECT source, count(*) AS n_docs, CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
      |       CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_dupes
      |FROM (SELECT source, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM documents)
      |GROUP BY source ORDER BY source NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy(col("digest")).orderBy("doc_id")
    // Project the 16-byte digest BEFORE the window exchange so the shuffle
    // moves (source, doc_id, digest) — never the full text bytes.
    docs(s, dir)
      .select(col("source"), col("doc_id"), md5(col("text")).as("digest"))
      .withColumn("rn", row_number().over(w))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("rn") === 1, 1).otherwise(0)).as("n_unique"),
        sum(when(col("rn") === 1, 0).otherwise(1)).as("n_dupes"))
      .orderBy("source")
  }

  /** Universal-hash minhash family: ONE md5 per shingle (already paid in
    * [[shingled]]), then h_j = (a_j·H + b_j) mod p over the digest's
    * leading 60 bits — the standard Carter-Wegman construction, replacing
    * round-1's 12 full md5 evaluations per shingle. Constants are inlined
    * identically into the Spark plan and the DuckDB twin; products stay
    * under 2^63 (a_j < 2^31.5, H mod p < 2^31), so no ANSI overflow.
    */
  private val MinhashP = 2147483647L // 2^31 - 1 (Mersenne prime)
  private def minhashA(j: Int): Long = (2654435761L * (j + 1)) % MinhashP
  private def minhashB(j: Int): Long = (40503L * (j + 7) + 97) % MinhashP

  /** LSH buckets larger than this connect through their min-doc HUB
    * (m−1 star pairs) instead of enumerating all C(m,2) in-bucket pairs.
    * A bucket this size is boilerplate collision, not similarity — the
    * round-8 skew fixture planted one shared phrase in half the corpus and
    * a single 7,464-doc bucket emitted 27.8M of 27.9M candidates (>99.9%
    * false positives at J ≥ 0.5), turning every pair-lineage rider into a
    * one-task straggler (x86 3.1 → 176 s). The star keeps the candidate
    * volume LINEAR in bucket size while preserving exactly what the
    * downstream consumers need from a mega-bucket: connectivity (x31's
    * clustering merges the same components) and membership (every member
    * still surfaces as a candidate, still exact-verified by x86). True
    * near-dup pairs are unaffected on every benign corpus — measured max
    * bucket is 14 at sf0.1 (DedupDiag) and the cap sits 4× above it; a
    * genuine duplicate GROUP bigger than the cap still collapses to one
    * representative via the hub component. The DuckDB oracle applies the
    * identical rule, so the contract is capped-pairs on BOTH sides.
    */
  private[graft] val LshBucketCap = 64

  /** Self-contained DuckDB twin of [[lshCandidatePairs]] (no ORDER BY) —
    * also the `pairs` CTE body for the x31 cluster query.
    */
  private[ops] val lshPairsSql: String =
    s"""WITH sh AS ($shingleSql),
       |hv AS (SELECT doc_id, CAST(concat('0x', substr(sh, 1, 15)) AS BIGINT) % $MinhashP AS h FROM sh),
       |mh AS (SELECT doc_id, seed,
       |              min((CASE ${(0 to 11).map(j => s"WHEN seed = $j THEN ${minhashA(j)} * h + ${minhashB(j)}").mkString(" ")} END) % $MinhashP) AS mh
       |       FROM hv CROSS JOIN (SELECT unnest(generate_series(0, 11)) AS seed) seeds
       |       GROUP BY doc_id, seed),
       |bands AS (SELECT doc_id, seed // 3 AS band,
       |                 md5(array_to_string(list_sort(list(lpad(CAST(seed AS VARCHAR), 2, '0') || ':' || CAST(mh AS VARCHAR))), ',')) AS sig
       |          FROM mh GROUP BY doc_id, seed // 3),
       |bstat AS (SELECT band, sig, count(*) AS c, min(doc_id) AS hub
       |          FROM bands GROUP BY 1, 2),
       |bp AS (SELECT b.band, b.sig, b.doc_id, s.c, s.hub
       |       FROM bands b JOIN bstat s ON s.band = b.band AND s.sig = b.sig),
       |pe AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |       FROM bp a JOIN bp b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
       |       WHERE a.c <= $LshBucketCap
       |       UNION ALL
       |       SELECT hub AS doc_a, doc_id AS doc_b FROM bp
       |       WHERE c > $LshBucketCap AND doc_id != hub)
       |SELECT doc_a, doc_b, count(*) AS n_bands
       |FROM pe GROUP BY 1, 2""".stripMargin

  /** LSH candidate pairs (doc_a < doc_b, n_bands ≥ 1), un-ordered — the
    * shared core of x02, x31 (clusters) and x47 (pagerank). The pair set
    * is tiny (candidates, not corpus) but its lineage — shingle, minhash,
    * band join — is the most expensive subtree in the dedup family, so the
    * CACHED result is memoized per (session, sf dir): within one process
    * the three queries pay for the lineage once. The cache holds only
    * (doc_a, doc_b, n_bands) rows; the ContextCleaner reclaims it when
    * the session goes away.
    */
  private val pairsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Evict memo entries pinned to STOPPED sessions, across every cache in
    * the file — in a long-lived multi-session process (test suites, the
    * serve shim) a dead session's entries would otherwise hold its plans
    * and cached blocks forever. Every accessor calls this before reading
    * its cache, so eviction needs no explicit lifecycle hook: the first
    * dedup access after any session stops sweeps ALL the maps.
    */
  private[graft] def evictStopped(): Unit =
    for (m <- Seq(pairsCache, labelsCache, bandsCache, candShinglesCache,
                  spanPosCache, shinglesCache, prefixIndexCache, prefixPairsCache))
      m.keys.filter(_._1.sparkContext.isStopped).foreach(m.remove)

  private[ops] def lshCandidatePairs(s: SparkSession, dir: String): DataFrame = {
    evictStopped()
    pairsCache.getOrElseUpdate((s, dir), lshCandidatePairsUncached(s, dir).cache())
  }

  /** Band signatures memoized like the pairs: the shingle→minhash→band
    * lineage is shared by the full pair join (x02 family) and x80's
    * delta-vs-index probe — one computation per (session, sf dir).
    */
  private val bandsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private[ops] def cachedBandSignatures(s: SparkSession, dir: String): DataFrame = {
    evictStopped()
    bandsCache.getOrElseUpdate((s, dir), bandSignatures(s, dir).cache())
  }

  /** Converged min-labels, memoized like the pairs: x31, x64 and x65 all
    * need the same propagation over the same candidate graph — one
    * iterative run per (session, sf dir), three consumers. The default
    * algorithm is large-star/small-star: QueriesSpec races it against
    * pointer jumping on a max-diameter path and a broom graph and it
    * closes both in strictly fewer rounds (9 vs 11, 6 vs 8 — the
    * star-forest convergence check observes the fixpoint the round the
    * star forms, not the round after).
    */
  private val labelsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private[graft] def clusterLabels(s: SparkSession, dir: String): DataFrame = {
    evictStopped()
    // the pair set is already canonical (doc_a < doc_b, distinct) — feed it
    // straight in; symmetrizing first only doubles the rows the loop's
    // initial distinct immediately halves again
    labelsCache.getOrElseUpdate((s, dir),
      largeStarSmallStar(
        lshCandidatePairs(s, dir).select(col("doc_a").as("a"), col("doc_b").as("b")))._1)
  }

  /** Number of live memo entries — Bench uses this to mark which query of
    * the x02/x31/x47/x55/x64/x65 family paid the shared lineage cost in
    * each pass.
    */
  private[graft] def memoSize: Int =
    pairsCache.size + labelsCache.size + bandsCache.size + candShinglesCache.size +
      spanPosCache.size + shinglesCache.size + prefixIndexCache.size + prefixPairsCache.size

  /** NAMED live memo entries — Bench diffs this set around every query to
    * emit per-query `paid_memos` in the artifact (r12 verdict item 4: rider
    * timings move when payer ORDER changes, and family-level first-payer
    * attribution can't say WHICH cache a query built vs read).
    */
  private[graft] def memoKeys: Set[String] = Seq(
    "dedup.pairs" -> pairsCache.size, "dedup.labels" -> labelsCache.size,
    "dedup.bands" -> bandsCache.size, "dedup.cand_shingles" -> candShinglesCache.size,
    "dedup.span_pos" -> spanPosCache.size, "dedup.shingles" -> shinglesCache.size,
    "dedup.prefix_index" -> prefixIndexCache.size,
    "dedup.prefix_pairs" -> prefixPairsCache.size,
  ).collect { case (n, c) if c > 0 => n }.toSet

  /** Drop the memoized caches (Bench calls this between timing passes
    * so a best-of-N never times a cache read where pass 1 timed the real
    * lineage; the FIRST dedup-family query of each pass pays it again).
    */
  private[graft] def clearMemo(): Unit = {
    pairsCache.values.foreach(df => scala.util.Try(df.unpersist()))
    pairsCache.clear()
    labelsCache.values.foreach(df => scala.util.Try(df.unpersist()))
    labelsCache.clear()
    bandsCache.values.foreach(df => scala.util.Try(df.unpersist()))
    bandsCache.clear()
    candShinglesCache.values.foreach(df => scala.util.Try(df.unpersist()))
    candShinglesCache.clear()
    spanPosCache.values.foreach(df => scala.util.Try(df.unpersist()))
    spanPosCache.clear()
    shinglesCache.values.foreach(df => scala.util.Try(df.unpersist()))
    shinglesCache.clear()
    prefixIndexCache.values.foreach(df => scala.util.Try(df.unpersist()))
    prefixIndexCache.clear()
    prefixPairsCache.values.foreach(df => scala.util.Try(df.unpersist()))
    prefixPairsCache.clear()
  }

  /** Per-document LSH band signatures (doc_id, band, sig) — the standing
    * index rows. Shared by the full pair join and x80's incremental
    * delta-vs-index join.
    */
  private[ops] def bandSignatures(s: SparkSession, dir: String): DataFrame = {
    // single-pass signature: all 12 minima in one hash aggregate (no ×12
    // explode, no second shuffle — one pass over the shingle set)
    val h = expr(s"cast(conv(substring(sh, 1, 15), 16, 10) as bigint) % $MinhashP")
    val minCols = (0 to 11).map(j =>
      min((lit(minhashA(j)) * col("h") + lit(minhashB(j))) % MinhashP).as(s"mh$j"))
    val sig = shingled(s, dir)
      .withColumn("h", h)
      .groupBy("doc_id")
      .agg(minCols.head, minCols.tail: _*)
    // band signatures from the signature columns; element order == seed
    // order == lexicographic lpad order, matching the oracle's list_sort
    def bandSig(b: Int): Column =
      md5(concat_ws(",", (3 * b to 3 * b + 2).map(j =>
        concat(lit(f"$j%02d:"), col(s"mh$j").cast("string"))): _*))
    sig.select(
      col("doc_id"),
      explode(array((0 to 3).map(b =>
        struct(lit(b).as("band"), bandSig(b).as("sig"))): _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Diagnostic accessors for [[graft.DedupDiag]] — the LSH lineage phase by
    * phase, so corpus-shape drift (shingle volume, bucket sizes, candidate
    * count) is measurable without touching the production entry points.
    */
  private[graft] def diagShingled(s: SparkSession, dir: String): DataFrame = shingled(s, dir)
  private[graft] def diagBands(s: SparkSession, dir: String): DataFrame = cachedBandSignatures(s, dir)
  private[graft] def diagPairs(s: SparkSession, dir: String): DataFrame = lshCandidatePairsUncached(s, dir)
  private[graft] def diagEdges(s: SparkSession, dir: String): DataFrame =
    lshCandidatePairs(s, dir).select(col("doc_a").as("a"), col("doc_b").as("b"))
  private[graft] def diagCachedShingles(s: SparkSession, dir: String): DataFrame =
    cachedShingles(s, dir)
  private[graft] def diagPrefixIndex(s: SparkSession, dir: String): DataFrame =
    cachedPrefixIndex(s, dir)
  private[graft] def diagPrefixPairs(s: SparkSession, dir: String): DataFrame =
    prefixCandidatePairs(s, dir)

  /** Band signatures annotated with bucket size and hub (bucket min doc):
    * ONE (band, sig) window pass over the cached index rows — the frame
    * the pair join and x80's incremental probe both cut by
    * [[LshBucketCap]]. The window's exchange partitions by exactly the
    * join keys, so the small-bucket self-join below adds no re-shuffle.
    */
  private def bucketStatBands(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band", "sig")
    cachedBandSignatures(s, dir)
      .withColumn("bucket_n", count(lit(1)).over(w))
      .withColumn("hub", min(col("doc_id")).over(w))
  }

  private def lshCandidatePairsUncached(s: SparkSession, dir: String): DataFrame = {
    val bands = bucketStatBands(s, dir)
    val small = bands.where(col("bucket_n") <= LshBucketCap)
    val a = small.as("a")
    val b = small.as("b")
    // small buckets: the classic all-in-bucket enumeration; over-cap
    // buckets: hub-star rows, row-local (no join) — see LshBucketCap
    val allPairs = a.join(b,
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val starPairs = bands
      .where(col("bucket_n") > LshBucketCap && col("doc_id") =!= col("hub"))
      .select(col("hub").as("doc_a"), col("doc_id").as("doc_b"))
    allPairs.union(starPairs)
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_bands"))
  }

  /** MinHash + LSH near-dup candidates: 12 universal hash functions over
    * the shingle digest, 4 bands × 3 rows; docs sharing ≥1 band signature
    * are candidate pairs. Per-band signatures shuffle by (band, signature)
    * — the classic LSH bucket join; no all-pairs comparison anywhere.
    */
  val minhashLsh: Q = Q(
    "x02_minhash_lsh",
    s"""$lshPairsSql ORDER BY doc_a, doc_b"""
  ) { (s, dir) =>
    lshCandidatePairs(s, dir).orderBy("doc_a", "doc_b")
  }

  /** Both directions of the LSH candidate graph in ONE pass over the pair
    * set. The expensive lineage below this is the memoized
    * [[lshCandidatePairs]] cache, so the explode itself needs no second
    * cache — each iteration re-reads cached 24-byte pair rows.
    */
  private def symmetricEdges(s: SparkSession, dir: String): DataFrame =
    lshCandidatePairs(s, dir)
      .select(explode(array(
        struct(col("doc_a").as("a"), col("doc_b").as("b")),
        struct(col("doc_b").as("a"), col("doc_a").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))

  /** Duplicate-cluster resolution: connected components over the LSH
    * candidate graph — the "keep one document per near-dup CLUSTER" step a
    * pairwise dedup can't express (A~B and B~C must collapse to one
    * representative even when A~C was never a candidate pair).
    *
    * Spark side: iterative min-label propagation WITH pointer jumping —
    * per round, every node takes the min label among itself, its
    * neighbors, and its label's label (shortcutting halves label chains,
    * so convergence is O(log diameter) rounds, each a bounded equi-join +
    * aggregate with no driver-side graph state — the same round budget
    * alternating large-star/small-star achieves). Oracle: DuckDB
    * recursive CTE computing min reachable node id per node.
    */
  val dupClusters: Q = Q(
    "x31_dup_clusters",
    s"""WITH RECURSIVE pairs AS ($lshPairsSql),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION SELECT doc_b AS a, doc_a AS b FROM pairs),
       |nodes AS (SELECT DISTINCT a AS node FROM edges),
       |reach(node, lbl) AS (
       |  SELECT node, node FROM nodes
       |  UNION
       |  SELECT e.b AS node, r.lbl FROM reach r JOIN edges e ON e.a = r.node),
       |labels AS (SELECT node, min(lbl) AS lbl FROM reach GROUP BY node)
       |SELECT CAST(node AS BIGINT) AS doc_id, CAST(lbl AS BIGINT) AS cluster,
       |       CAST(count(*) OVER (PARTITION BY lbl) AS BIGINT) AS cluster_size
       |FROM labels ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val labels = clusterLabels(s, dir)
    // the final `labels` cache stays referenced by the returned plan; the
    // ContextCleaner unpersists it once the result DF is released
    labels
      .select(col("node").cast("long").as("doc_id"), col("lbl").cast("long").as("cluster"))
      .withColumn("cluster_size", count(lit(1)).over(Window.partitionBy("cluster")))
      .orderBy("doc_id")
  }

  /** Min-label propagation with pointer jumping over a symmetric (a, b)
    * edge list — the x31 core, factored so the round bound is testable on
    * synthetic graphs (a 1000-node path must converge in ~2 + log2(n)
    * rounds, not n). Returns the converged (node, lbl) labels and the
    * round count; throws rather than returning wrong labels if the round
    * budget is exhausted.
    */
  private[graft] def propagateMinLabels(edges: DataFrame, maxRounds: Int = 50)
      : (DataFrame, Int) = {
    var labels = edges.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
      .cache()
    var gen       = labels // the cached generation (labels may be its projection)
    var converged = false
    var rounds    = 0
    while (!converged && rounds < maxRounds) { // diameter bound; tiny in practice
      val prop = edges.join(labels, col("a") === col("node"))
        .select(col("b").as("node"), col("lbl"), lit(null).cast("long").as("prev"))
      // Pointer jumping (shortcutting): each node also adopts its label's
      // label, halving label chains so convergence needs O(log diameter)
      // rounds — the long-chain guard at corpus scale. It costs an extra
      // labels⨝labels shuffle per round, which LOSES on the common case
      // (near-dup components have tiny diameters and converge in 2-3
      // rounds), so it engages only from round 3 — exactly when still
      // being unconverged means a deep chain exists.
      val steps =
        if (rounds < 2) Seq(prop)
        else Seq(prop, labels.as("l1")
          .join(labels.as("l2"), col("l1.lbl") === col("l2.node"))
          .select(col("l1.node").as("node"), col("l2.lbl").as("lbl"),
            lit(null).cast("long").as("prev")))
      // change detection rides the SAME aggregate that computes the next
      // generation: every node appears exactly once in the tagged self-row
      // (so max(prev) recovers its old label through the null-ignoring
      // aggregate), making the convergence check a filter over the cached
      // result instead of a second join+shuffle per round
      val tagged = labels.select(col("node"), col("lbl"), col("lbl").as("prev"))
      val next = steps.foldLeft(tagged)(_ unionByName _)
        .groupBy("node").agg(min("lbl").as("lbl"), max("prev").as("prev"))
        .cache()
      // full count (no limit): the filter scans EVERY partition of `next`,
      // so its cache is completely filled before the old generation is
      // unpersisted — an early-exit check could leave next partially
      // cached and trigger a per-round recomputation cascade
      val changed = next.where(col("lbl") =!= col("prev")).count()
      gen.unpersist()
      gen = next
      // lineage truncation: base the next round on the MATERIALIZED cache
      // (LogicalRDD), not on `next`'s logical plan — each round references
      // the previous one ~3× (prop, jump, tagged), so carrying logical
      // lineage across rounds grows the plan tree 3^rounds and a deep
      // chain (10+ rounds) OOMs the planner before any data moves
      labels = edges.sparkSession
        .createDataFrame(next.toDF().rdd, next.schema)
        .select("node", "lbl")
      converged = changed == 0
      rounds += 1
    }
    // wrong labels must never be returned silently: an unconverged exit
    // means a component with diameter > the round bound (the scale path is
    // large-star/small-star at O(log n) rounds) — fail loudly instead of
    // reporting one true cluster as several
    if (!converged)
      throw new IllegalStateException(
        s"label propagation did not converge within $rounds rounds")
    (labels, rounds)
  }

  /** Alternating large-star / small-star connected components (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC'14) — the
    * stated 100 TB scale path for x31, implemented next to pointer jumping
    * so the round counts are measurable against each other (QueriesSpec
    * races them on a 512-node path and a broom graph).
    *
    * Each round rewrites the edge set with two rank-contracting steps:
    * LARGE-STAR connects every neighbor ABOVE u to u's minimum (strictly
    * rank-reducing for high neighbors), SMALL-STAR connects every neighbor
    * at-or-below u — and u — to u's minimum. At the fixpoint every
    * component is a star rooted at its minimum node, so the labels fall
    * out of the final edge list without any propagation pass. Convergence
    * is O(log² n) worst-case, ~log n observed; every step is an equi-join
    * + hash aggregate over the CANDIDATE edge set (never the corpus), and
    * each round re-bases on the materialized cache — the same
    * 3^rounds-planner-OOM guard propagateMinLabels uses.
    */
  private[graft] def largeStarSmallStar(edges0: DataFrame, maxRounds: Int = 50)
      : (DataFrame, Int) = {
    val spark = edges0.sparkSession
    // canonical undirected edge set: (lo, hi) as long, self-loops dropped.
    // An already-canonical input (x31 passes the pair set, doc_a < doc_b
    // distinct) flows through unchanged; the distinct also halves a
    // symmetric input.
    var edges = edges0
      .select(least(col("a"), col("b")).cast("long").as("lo"),
        greatest(col("a"), col("b")).cast("long").as("hi"))
      .where(col("lo") =!= col("hi")).distinct().cache()
    // No separate node set: LS/SS never loses a node — a local-minimum
    // survives each round as a `lo` (its own group emits (u, v) when
    // m(u) = u), every other node as a `hi` (below-neighbors' groups emit
    // (m(w), u); small-star re-emits every oriented u as (mn, u)) — so the
    // original node set is exactly the final star forest's node set and
    // the labels fall out of the final edges alone (round-4's separate
    // nodes cache + count job + final left join are gone).
    var gen       = edges // the cached generation backing `edges`
    var converged = false
    var rounds    = 0
    while (!converged && rounds < maxRounds) {
      // LARGE-STAR: symmetric adjacency in ONE scan of the cached
      // generation (explode, not union — half the cache reads and half the
      // codegen surface of the union shape), m(u) = min(N(u) ∪ {u}); emit
      // (v, m(u)) for every neighbor v > u
      val sym = edges.select(explode(array(
          struct(col("lo").as("u"), col("hi").as("v")),
          struct(col("hi").as("u"), col("lo").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
      val lsMin = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      // no distinct here: duplicate (lo, hi) rows are absorbed by the
      // small-star min aggregate below and the final distinct — an extra
      // exchange per round buys nothing
      val ls = sym.join(lsMin, "u").where(col("v") > col("u"))
        .select(least(col("v"), col("m")).as("lo"), greatest(col("v"), col("m")).as("hi"))
        .where(col("lo") =!= col("hi"))
      // SMALL-STAR over the large-star output: orient edges high→low so
      // N(u) is u's smaller neighbors; emit (v, m(u)) for v ∈ N(u) ∪ {u}
      val oriented = ls.select(col("hi").as("u"), col("lo").as("v"))
      val ssMin    = oriented.groupBy("u").agg(min("v").as("mn"))
      val ss = oriented.join(ssMin, "u")
        .select(col("mn"), col("v"))
        .unionByName(ssMin.select(col("mn"), col("u").as("v")))
        .where(col("mn") =!= col("v"))
        .select(col("mn").as("lo"), col("v").as("hi")).distinct()
      val next = ss.cache()
      // Fixpoint detection: the iteration is at its fixpoint exactly when
      // the edge set is a STAR FOREST rooted at component minima (Kiveris
      // et al. §3) — every (lo, hi) edge has lo < hi, so a star's root is
      // its min; the forest test is (a) no node appears as both a parent
      // (lo) and a child (hi), and (b) every child has exactly ONE parent.
      // Checking the shape directly instead of comparing consecutive edge
      // sets fires a full round EARLIER (set-stability only observes a
      // star one round after it forms), and the explode keeps it to ONE
      // scan of next — the same pass that fills next's cache before the
      // old generation is unpersisted.
      val violations = next.select(explode(array(
          struct(col("hi").as("node"), col("lo").as("parent")),
          struct(col("lo").as("node"), lit(null).cast("long").as("parent")))).as("e"))
        .select(col("e.node").as("node"), col("e.parent").as("parent"))
        .groupBy("node")
        .agg(count(col("parent")).as("parents"), max(col("parent").isNull).as("isParent"))
        .where(col("parents") > 1 || (col("parents") >= 1 && col("isParent")))
        .count()
      gen.unpersist()
      gen = next
      // lineage truncation: re-base each round on the materialized cache
      // (see propagateMinLabels — the per-round plan references the
      // previous generation several times, so logical lineage grows
      // geometrically and OOMs the planner on deep chains)
      edges = spark.createDataFrame(next.toDF().rdd, next.schema)
      converged = violations == 0
      rounds += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"large-star/small-star did not converge within $rounds rounds")
    // stars: every non-root points straight at its component minimum, and
    // every root appears as a `lo` — one scan + one aggregate labels the
    // full node set (roots label themselves; min() is a no-op tie-break on
    // the star forest, where each child has exactly one parent)
    val labels = edges.select(explode(array(
        struct(col("hi").as("node"), col("lo").as("lbl")),
        struct(col("lo").as("node"), col("lo").as("lbl")))).as("e"))
      .select(col("e.node").as("node"), col("e.lbl").as("lbl"))
      .groupBy("node").agg(min("lbl").as("lbl"))
    (labels, rounds)
  }

  /** PageRank over the near-dup candidate graph, 3 iterations — the
    * "centrality inside a duplicate cluster" signal (the highest-rank
    * member is the canonical copy candidates point at). Iterative NUMERIC
    * graph analytics in exact integer ppm: each round is one equi-join +
    * hash aggregate, contributions are `pr div deg` per node (integer
    * division BEFORE the order-free sum, so no float accumulation and no
    * engine divergence); damping is `150000 + 850·Σ div 1000`. The oracle
    * unrolls the same three rounds as CTEs. Fixed iteration count keeps
    * the query deterministic; at corpus scale the same loop runs to a
    * convergence threshold with the identical per-round plan.
    */
  val pagerank: Q = Q(
    "x47_pagerank",
    s"""WITH pairs AS ($lshPairsSql),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION SELECT doc_b AS a, doc_a AS b FROM pairs),
       |deg AS (SELECT a AS node, count(*) AS deg FROM edges GROUP BY a),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS pr FROM deg),
       |r1 AS (SELECT e.b AS node, CAST(150000 + 850 * sum(r0.pr // d.deg) // 1000 AS BIGINT) AS pr
       |       FROM edges e JOIN r0 ON r0.node = e.a JOIN deg d ON d.node = e.a GROUP BY e.b),
       |r2 AS (SELECT e.b AS node, CAST(150000 + 850 * sum(r1.pr // d.deg) // 1000 AS BIGINT) AS pr
       |       FROM edges e JOIN r1 ON r1.node = e.a JOIN deg d ON d.node = e.a GROUP BY e.b),
       |r3 AS (SELECT e.b AS node, CAST(150000 + 850 * sum(r2.pr // d.deg) // 1000 AS BIGINT) AS pr
       |       FROM edges e JOIN r2 ON r2.node = e.a JOIN deg d ON d.node = e.a GROUP BY e.b)
       |SELECT CAST(node AS BIGINT) AS doc_id, pr AS pr_ppm
       |FROM r3 ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val edges = symmetricEdges(s, dir)
    val deg = edges.groupBy("a").agg(count(lit(1)).as("deg"))
    var pr  = deg.select(col("a").as("node"), lit(1000000L).as("pr"))
    for (_ <- 1 to 3) {
      pr = edges.join(pr, col("a") === col("node"))
        .join(deg.select(col("a"), col("deg")), "a")
        .select(col("b"), expr("pr div deg").as("c"))
        .groupBy(col("b"))
        .agg(expr("cast(150000 + 850 * sum(c) div 1000 as bigint)").as("pr"))
        .select(col("b").as("node"), col("pr"))
    }
    // the memoized pair lineage one level below (lshCandidatePairs) is the
    // cached subtree all three rounds share; no action runs here, and the
    // ContextCleaner reclaims it once the memo entry is dropped
    pr.select(col("node").cast("long").as("doc_id"), col("pr").as("pr_ppm"))
      .orderBy("doc_id")
  }

  /** LABEL PROPAGATION communities over the candidate graph (Raghavan et
    * al., Phys.Rev.E'07, synchronized variant): each node adopts the
    * PLURALITY label among its neighbors plus itself (ties to the smallest
    * label), 3 fixed rounds. The community view x31's connected components
    * cannot give: CC merges two dup clusters through ANY single spurious
    * candidate edge (one LSH collision chains unrelated template
    * families), while LP requires a plurality of edges — bridge edges
    * lose the vote. Deterministic by construction: the argmax is a
    * (count DESC, label ASC) window rank, no randomized update order.
    *
    * Scale shape: per round, one equi-join of the edge list with the label
    * table + a (node, label) count aggregate + a per-node argmax window —
    * all hash-partitioned on node keys, rounds FIXED at 3 (no
    * data-dependent loop); rides the memoized pair lineage like
    * x31/x47/x55. The oracle unrolls the same 3 rounds as CTEs.
    */
  val labelProp: Q = {
    def roundSql(prev: String, k: Int): String =
      s"""votes$k AS (
         |  SELECT e.b AS node, l.lbl AS lbl FROM edges e JOIN $prev l ON l.node = e.a
         |  UNION ALL SELECT node, lbl FROM $prev),
         |cnt$k AS (SELECT node, lbl, count(*) AS c FROM votes$k GROUP BY node, lbl),
         |lab$k AS (SELECT node, lbl FROM (
         |  SELECT node, lbl, row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rk
         |  FROM cnt$k) WHERE rk = 1)""".stripMargin
    Q(
      "x112_label_prop",
      s"""WITH pairs AS ($lshPairsSql),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |          UNION SELECT doc_b AS a, doc_a AS b FROM pairs),
         |lab0 AS (SELECT DISTINCT a AS node, a AS lbl FROM edges),
         |${roundSql("lab0", 1)},
         |${roundSql("lab1", 2)},
         |${roundSql("lab2", 3)}
         |SELECT CAST(node AS BIGINT) AS doc_id, CAST(lbl AS BIGINT) AS community
         |FROM lab3 ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val edges = symmetricEdges(s, dir)
      var lab = edges.select(col("a").as("node")).distinct()
        .select(col("node"), col("node").as("lbl"))
      for (_ <- 1 to 3) {
        val votes = edges.join(lab, col("a") === col("node"))
          .select(col("b").as("node"), col("lbl"))
          .unionAll(lab)
        lab = votes.groupBy("node", "lbl").agg(count(lit(1)).as("c"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("node").orderBy(col("c").desc, col("lbl"))))
          .where(col("rk") === 1)
          .select("node", "lbl")
      }
      lab.select(col("node").cast("long").as("doc_id"), col("lbl").cast("long").as("community"))
        .orderBy("doc_id")
    }
  }

  /** MINHASH ESTIMATOR-ERROR audit — the dedup-index analog of x93/x110's
    * ANN monitoring: for every LSH candidate pair, the Jaccard ESTIMATE
    * the 12-minimum signature implies (matching minima / 12, Broder'97:
    * P[min_h(A) = min_h(B)] = J(A,B)) side by side with the EXACT Jaccard
    * from the shingle sets, and the absolute error. This is the query that
    * answers "are 12 hashes enough for this corpus?" — expected error is
    * √(J(1−J)/k), so persistent outliers mean the signature width, not
    * the data, is the problem. One bias is structural and the audit makes
    * it visible: conditioning on candidacy FLOORS every estimate at 3/12
    * (a banded pair matched one full band by definition), so low-J pairs
    * read high — the spec pins the floor and checks the unbiased bound
    * only where candidacy is near-certain (J ≥ 0.5).
    *
    * Scale shape: signatures recompute over CANDIDATE docs only (the
    * memoized x86 slice — never the corpus-wide signature set the banding
    * already consumed); the estimate is a column-wise row-local compare
    * after two id-joins; exact Jaccard rides the same candidate shingle
    * memo. Everything is candidate-scale; integers end to end.
    */
  val minhashError: Q = Q(
    "x113_minhash_error",
    s"""WITH pairs AS ($lshPairsSql),
       |sh0 AS ($shingleSql),
       |cd AS (SELECT doc_a AS doc_id FROM pairs UNION SELECT doc_b FROM pairs),
       |shc AS (SELECT s.* FROM sh0 s JOIN cd ON s.doc_id = cd.doc_id),
       |hv AS (SELECT doc_id, CAST(concat('0x', substr(sh, 1, 15)) AS BIGINT) % $MinhashP AS h FROM shc),
       |mh AS (SELECT doc_id, seed,
       |              min((CASE ${(0 to 11).map(j => s"WHEN seed = $j THEN ${minhashA(j)} * h + ${minhashB(j)}").mkString(" ")} END) % $MinhashP) AS mh
       |       FROM hv CROSS JOIN (SELECT unnest(generate_series(0, 11)) AS seed) seeds
       |       GROUP BY doc_id, seed),
       |est AS (SELECT p.doc_a, p.doc_b,
       |               sum(CASE WHEN a.mh = b.mh THEN 1 ELSE 0 END) * 1000000 // 12 AS est_ppm
       |        FROM pairs p JOIN mh a ON a.doc_id = p.doc_a
       |                     JOIN mh b ON b.doc_id = p.doc_b AND b.seed = a.seed
       |        GROUP BY p.doc_a, p.doc_b),
       |sz AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
       |inter AS (SELECT p.doc_a, p.doc_b, count(*) AS i
       |          FROM pairs p JOIN shc a ON a.doc_id = p.doc_a
       |                       JOIN shc b ON b.doc_id = p.doc_b AND b.sh = a.sh
       |          GROUP BY 1, 2),
       |ex AS (SELECT i.doc_a, i.doc_b,
       |              i.i * 1000000 // (sa.n + sb.n - i.i) AS exact_ppm
       |       FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a
       |                    JOIN sz sb ON sb.doc_id = i.doc_b)
       |SELECT e.doc_a AS doc_a, e.doc_b AS doc_b,
       |       CAST(e.est_ppm AS BIGINT) AS est_ppm,
       |       CAST(coalesce(x.exact_ppm, 0) AS BIGINT) AS exact_ppm,
       |       CAST(abs(e.est_ppm - coalesce(x.exact_ppm, 0)) AS BIGINT) AS err_ppm
       |FROM est e LEFT JOIN ex x ON e.doc_a = x.doc_a AND e.doc_b = x.doc_b
       |ORDER BY doc_a, doc_b""".stripMargin
  ) { (s, dir) =>
    val pairs = lshCandidatePairs(s, dir)
    val shc = candidateShingles(s, dir)
    val h = expr(s"cast(conv(substring(sh, 1, 15), 16, 10) as bigint) % $MinhashP")
    val minCols = (0 to 11).map(j =>
      min((lit(minhashA(j)) * col("h") + lit(minhashB(j))) % MinhashP).as(s"mh$j"))
    val sig = shc.withColumn("h", h).groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    val matches = (0 to 11).map(j =>
      when(col(s"a.mh$j") === col(s"b.mh$j"), 1L).otherwise(0L)).reduce(_ + _)
    val est = pairs
      .join(sig.as("a"), col("a.doc_id") === col("doc_a"))
      .join(sig.as("b"), col("b.doc_id") === col("doc_b"))
      .select(col("doc_a"), col("doc_b"), (matches * 1000000L).as("m"))
      .withColumn("est_ppm", expr("m div 12")).drop("m")
    val sz = shc.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(shc.as("fa"), col("fa.doc_id") === col("doc_a"))
      .join(shc.as("fb"), col("fb.doc_id") === col("doc_b") && col("fb.sh") === col("fa.sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
    val exact = inter
      .join(sz.as("sa"), col("sa.doc_id") === col("doc_a"))
      .join(sz.as("sb"), col("sb.doc_id") === col("doc_b"))
      .select(col("doc_a").as("xa"), col("doc_b").as("xb"),
        expr("i * 1000000 div (sa.n + sb.n - i)").as("exact_ppm"))
    est
      .join(exact, col("doc_a") === col("xa") && col("doc_b") === col("xb"), "left")
      .select(col("doc_a"), col("doc_b"), col("est_ppm"),
        coalesce(col("exact_ppm"), lit(0L)).as("exact_ppm"),
        abs(col("est_ppm") - coalesce(col("exact_ppm"), lit(0L))).as("err_ppm"))
      .orderBy("doc_a", "doc_b")
  }

  /** Dedup-aware train/test split audit: documents are split 75/25 by the
    * x28 content-hash coin (deterministic, shuffle-free), then the LSH
    * candidate pairs are bucketed by which sides of the split they land on
    * — `train/test` pairs are LEAKAGE (a test document with a near-dup in
    * train inflates eval scores; the standard decontamination check).
    * Reuses the memoized pair lineage; the split assignment is a row-local
    * projection joined to the pair list on the doc_id key, so the audit
    * costs two key-joins over the (small) candidate set regardless of
    * corpus size.
    */
  /** Canonical-representative selection — the step that makes cluster
    * detection actionable: within each near-dup cluster (x31's labels),
    * KEEP the longest document (doc_id tiebreak) and report cluster size;
    * the kept set minus the rest is the deduplicated corpus (applied with
    * an x01-style anti join). One window over the cluster key after the
    * (node ⇒ doc) equi-join; the expensive pair lineage is the shared
    * memoized subtree.
    */
  val canonicalPick: Q = Q(
    "x64_canonical_pick",
    s"""WITH RECURSIVE pairs AS ($lshPairsSql),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION SELECT doc_b AS a, doc_a AS b FROM pairs),
       |nodes AS (SELECT DISTINCT a AS node FROM edges),
       |reach(node, lbl) AS (
       |  SELECT node, node FROM nodes
       |  UNION
       |  SELECT e.b AS node, r.lbl FROM reach r JOIN edges e ON e.a = r.node),
       |labels AS (SELECT node, min(lbl) AS lbl FROM reach GROUP BY node)
       |SELECT cluster, kept_doc, kept_chars, n_members FROM (
       |  SELECT CAST(l.lbl AS BIGINT) AS cluster, CAST(d.doc_id AS BIGINT) AS kept_doc,
       |         CAST(d.n_chars AS BIGINT) AS kept_chars,
       |         row_number() OVER (PARTITION BY l.lbl ORDER BY d.n_chars DESC, d.doc_id) AS rk,
       |         CAST(count(*) OVER (PARTITION BY l.lbl) AS BIGINT) AS n_members
       |  FROM labels l JOIN documents d ON l.node = d.doc_id)
       |WHERE rk = 1 ORDER BY cluster""".stripMargin
  ) { (s, dir) =>
    val labels = clusterLabels(s, dir)
    val d = docs(s, dir).select(col("doc_id"), col("n_chars"))
    val w  = Window.partitionBy("lbl").orderBy(col("n_chars").desc, col("doc_id"))
    val wc = Window.partitionBy("lbl")
    labels.join(d, col("node") === col("doc_id"))
      .withColumn("rk", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(wc))
      .where(col("rk") === 1)
      .select(col("lbl").cast("long").as("cluster"), col("doc_id").cast("long").as("kept_doc"),
        col("n_chars").cast("long").as("kept_chars"), col("n_members"))
      .orderBy("cluster")
  }

  /** TOMBSTONE PROPAGATION through the dedup index — the deletion
    *(takedown/GDPR) pass a standing corpus index must survive: given a
    * tombstone set (here the doc_id % 37 coin as the stand-in for a
    * deletion manifest), report every near-dup cluster the deletions
    * touch, and RE-ELECT its canonical from the SURVIVORS under x64's
    * rule (longest doc, id tiebreak; −1 when the whole cluster died).
    * Without this pass a curated corpus silently keeps serving a deleted
    * canonical — or drops a cluster that still has live members.
    *
    * Scale shape: rides the memoized cluster labels (x31/x64/x65's shared
    * propagation — NOT recomputed); the election is two windows over the
    * cluster key and the tombstone flag is a row-local coin (a real
    * manifest would broadcast-semi-join). Affected-cluster output is
    * deletion-bounded, not corpus-bounded.
    */
  val tombstonePropagate: Q = Q(
    "x117_tombstone_propagate",
    s"""WITH RECURSIVE pairs AS ($lshPairsSql),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION SELECT doc_b AS a, doc_a AS b FROM pairs),
       |nodes AS (SELECT DISTINCT a AS node FROM edges),
       |reach(node, lbl) AS (
       |  SELECT node, node FROM nodes
       |  UNION
       |  SELECT e.b AS node, r.lbl FROM reach r JOIN edges e ON e.a = r.node),
       |labels AS (SELECT node, min(lbl) AS lbl FROM reach GROUP BY node),
       |m AS (SELECT l.lbl AS cluster, d.doc_id, d.n_chars,
       |             (d.doc_id % 37 = 0) AS tomb
       |      FROM labels l JOIN documents d ON l.node = d.doc_id),
       |agg AS (SELECT cluster, count(*) AS n_members,
       |               sum(CASE WHEN tomb THEN 1 ELSE 0 END) AS n_tomb
       |        FROM m GROUP BY cluster),
       |oldc AS (SELECT cluster, doc_id AS old_canonical FROM (
       |  SELECT cluster, doc_id,
       |         row_number() OVER (PARTITION BY cluster ORDER BY n_chars DESC, doc_id) AS rk
       |  FROM m) WHERE rk = 1),
       |newc AS (SELECT cluster, doc_id AS new_canonical FROM (
       |  SELECT cluster, doc_id,
       |         row_number() OVER (PARTITION BY cluster ORDER BY n_chars DESC, doc_id) AS rk
       |  FROM m WHERE NOT tomb) WHERE rk = 1)
       |SELECT CAST(a.cluster AS BIGINT) AS cluster,
       |       CAST(a.n_members AS BIGINT) AS n_members,
       |       CAST(a.n_tomb AS BIGINT) AS n_tomb,
       |       CAST(o.old_canonical AS BIGINT) AS old_canonical,
       |       CAST(coalesce(n.new_canonical, -1) AS BIGINT) AS new_canonical
       |FROM agg a JOIN oldc o ON o.cluster = a.cluster
       |           LEFT JOIN newc n ON n.cluster = a.cluster
       |WHERE a.n_tomb >= 1 ORDER BY cluster""".stripMargin
  ) { (s, dir) =>
    val m = clusterLabels(s, dir)
      .join(docs(s, dir).select(col("doc_id"), col("n_chars")), col("node") === col("doc_id"))
      .select(col("lbl").as("cluster"), col("doc_id"), col("n_chars"),
        (col("doc_id") % 37 === 0).as("tomb"))
    val w = Window.partitionBy("cluster").orderBy(col("n_chars").desc, col("doc_id"))
    val agg = m.groupBy("cluster").agg(
      count(lit(1)).as("n_members"),
      sum(when(col("tomb"), 1L).otherwise(0L)).as("n_tomb"))
    val oldc = m.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
      .select(col("cluster").as("oc"), col("doc_id").as("old_canonical"))
    val newc = m.where(!col("tomb")).withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("cluster").as("nc"), col("doc_id").as("new_canonical"))
    agg.join(oldc, col("cluster") === col("oc"))
      .join(newc, col("cluster") === col("nc"), "left")
      .where(col("n_tomb") >= 1)
      .select(col("cluster").cast("long").as("cluster"), col("n_members"), col("n_tomb"),
        col("old_canonical").cast("long").as("old_canonical"),
        coalesce(col("new_canonical"), lit(-1L)).cast("long").as("new_canonical"))
      .orderBy("cluster")
  }

  /** NEAR-DUP DECONTAMINATION — the fuzzy complement to x27: exact n-gram
    * contamination checks (x27, the GPT-3 appendix method) miss
    * PARAPHRASED benchmark leakage, so the production pass also probes the
    * near-dup index: benchmark docs (the doc_id % 7 slice standing in for
    * an eval suite) that share a VERIFIED LSH near-dup (J ≥ 0.5) with a
    * non-benchmark corpus doc are contaminated at the near-dup level.
    * Reports each contaminated benchmark doc with its hit count and worst
    * Jaccard — the removal manifest for the corpus side.
    *
    * Scale shape: entirely candidate-scale — rides x86's verified pair
    * set (memoized lineage: banding proposed, exact shingle join
    * disposed), so the decontamination pass costs one filter + one
    * aggregate over pairs. The benchmark side never needs to be tiny
    * (unlike x27's broadcast gram set): banding treats both sides
    * symmetrically.
    */
  val nearDupContamination: Q = Q(
    "x118_neardup_contamination",
    s"""WITH sh AS ($shingleSql),
       |pairs AS ($lshPairsSql),
       |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS i
       |          FROM pairs p JOIN sh a ON a.doc_id = p.doc_a
       |                       JOIN sh b ON b.doc_id = p.doc_b AND b.sh = a.sh
       |          GROUP BY 1, 2),
       |v AS (SELECT p.doc_a, p.doc_b,
       |             CAST(coalesce(i.i, 0) * 1000000 // (sa.n + sb.n - coalesce(i.i, 0)) AS BIGINT) AS jaccard_ppm,
       |             (coalesce(i.i, 0) * 2 >= sa.n + sb.n - coalesce(i.i, 0)) AS verified
       |      FROM pairs p
       |      JOIN sz sa ON sa.doc_id = p.doc_a
       |      JOIN sz sb ON sb.doc_id = p.doc_b
       |      LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b),
       |x AS (SELECT CASE WHEN doc_a % 7 = 0 THEN doc_a ELSE doc_b END AS bench_doc,
       |             jaccard_ppm
       |      FROM v WHERE ((doc_a % 7 = 0) <> (doc_b % 7 = 0)) AND verified)
       |SELECT CAST(bench_doc AS BIGINT) AS bench_doc,
       |       CAST(count(*) AS BIGINT) AS n_near_dups,
       |       CAST(max(jaccard_ppm) AS BIGINT) AS max_jaccard_ppm
       |FROM x GROUP BY bench_doc ORDER BY bench_doc""".stripMargin
  ) { (s, dir) =>
    val v = lshVerify.run(s, dir)
    v.where((col("doc_a") % 7 === 0) =!= (col("doc_b") % 7 === 0) && col("verified"))
      .select(
        when(col("doc_a") % 7 === 0, col("doc_a")).otherwise(col("doc_b")).as("bench_doc"),
        col("jaccard_ppm"))
      .groupBy("bench_doc")
      .agg(count(lit(1)).as("n_near_dups"), max(col("jaccard_ppm")).as("max_jaccard_ppm"))
      .orderBy("bench_doc")
  }

  val splitLeakage: Q = Q(
    "x55_split_leakage",
    s"""WITH pairs AS ($lshPairsSql),
       |split AS (SELECT doc_id,
       |    CASE WHEN CAST('0x' || substr(md5(text),1,4) AS INTEGER) < 49152
       |         THEN 'train' ELSE 'test' END AS part FROM documents)
       |SELECT a.part AS part_a, b.part AS part_b, CAST(count(*) AS BIGINT) AS n_pairs
       |FROM pairs p JOIN split a ON p.doc_a = a.doc_id JOIN split b ON p.doc_b = b.doc_id
       |GROUP BY part_a, part_b ORDER BY part_a, part_b""".stripMargin
  ) { (s, dir) =>
    val split = docs(s, dir).select(col("doc_id"),
      when(conv(substring(md5(col("text")), 1, 4), 16, 10).cast("int") < 49152, "train")
        .otherwise("test").as("part"))
    lshCandidatePairs(s, dir)
      .join(split.select(col("doc_id").as("doc_a"), col("part").as("part_a")), "doc_a")
      .join(split.select(col("doc_id").as("doc_b"), col("part").as("part_b")), "doc_b")
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("part_a", "part_b")
  }

  /** 32-bit SimHash from word hashes: bit i of a word's hash is the parity
    * of the i-th hex char of its md5; the document bit is the sign of the
    * summed ±1 contributions (integer arithmetic — no float order issues).
    */
  val simhash: Q = Q(
    "x03_simhash",
    """SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, i - 1) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
      |FROM (SELECT doc_id, i, sum(CASE WHEN ascii(substr(h, CAST(i AS INT), 1)) % 2 = 1 THEN 1 ELSE -1 END) AS s
      |      FROM (SELECT doc_id, md5(w) AS h
      |            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents))
      |      CROSS JOIN (SELECT unnest(generate_series(1, 32)) AS i) bits
      |      GROUP BY doc_id, i)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    // Shuffle-free: SimHash is a per-document scalar, so the whole signature
    // is computed row-local by the codegen'd [[graft.functions.SimHash32]]
    // expression (one tight byte loop per row, no per-token allocation;
    // bit-identical HOF fallback inside SimHashFunctions). Round 2 exploded
    // words ×32 bit-lanes into a groupBy(doc_id, i) — ~300M shuffled rows
    // at sf0.1, the suite's worst query under load; this plan shuffles
    // nothing but the final sort.
    docs(s, dir)
      // NULL-text parity with the oracle: unnest over a NULL word list
      // emits no rows (doc omitted), while a row-local scalar would
      // emit (doc_id, NULL) — so filter NULL docs out explicitly.
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.SimHashFunctions.simhash32(col("text")).as("simhash"))
      .orderBy("doc_id")
  }

  /** Exact n-gram Jaccard near-dup pairs: distinct word-3-gram sets,
    * intersection via shingle-key equi-join (shuffle on the shingle — Σdf²
    * bounded, no cross join), |A∪B| = |A|+|B|−|A∩B|, threshold 0.6.
    */
  val ngramJaccard: Q = Q(
    "x04_ngram_jaccard",
    s"""WITH sh0 AS ($shingleSql),
       |capped AS (SELECT doc_id, sh FROM sh0
       |           QUALIFY count(*) OVER (PARTITION BY sh) <= $DfCap),
       |sh AS (SELECT doc_id, sh, count(*) OVER (PARTITION BY doc_id) AS n FROM capped),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i,
       |                 any_value(a.n) AS na, any_value(b.n) AS nb
       |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id GROUP BY 1, 2)
       |SELECT doc_a, doc_b, round(CAST(i AS DOUBLE) / (na + nb - i), 6) AS jaccard
       |FROM inter
       |WHERE CAST(i AS DOUBLE) / (na + nb - i) >= 0.6
       |ORDER BY doc_a, doc_b""".stripMargin
  ) { (s, dir) => jaccardPairs(s, dir, DfCap) }

  /** x04 body with an explicit df cap (spec asserts cap-equivalence at test
    * SF, where no shingle approaches the cap).
    *
    * Document-frequency cap: a shingle shared by d docs contributes d² join
    * rows, so one hot shingle at corpus scale is a cartesian bomb. Shingles
    * with df > cap are dropped from the universe ON BOTH ENGINES (jaccard
    * is then over the capped sets — near-ubiquitous shingles carry no
    * near-dup signal). The df window rides the same hash partitioning the
    * self-join needs, so the guard adds no extra shuffle of the big side.
    * The per-doc set size rides ON the join rows (a second window) instead
    * of a separate size aggregate — no third recomputation of the shingle
    * lineage and no post-join size lookups; the two join sides are
    * identical subtrees, which Spark's exchange reuse deduplicates.
    */
  private[graft] def jaccardPairs(s: SparkSession, dir: String, cap: Int): DataFrame = {
    val sh = shingled(s, dir)
      .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
      .where(col("df") <= cap)
      .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
      .select("doc_id", "sh", "n")
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("i"), first(col("a.n")).as("na"), first(col("b.n")).as("nb"))
    val jac = col("i").cast("double") / (col("na") + col("nb") - col("i"))
    inter
      .where(jac >= 0.6)
      .select(col("doc_a"), col("doc_b"), round(jac, 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** PREFIX-FILTERED exact all-pairs similarity join (Bayardo et al.
    * "Scaling Up All Pairs Similarity Search", WWW'07; Xiao et al. PPJoin,
    * WWW'08) — the same exact-Jaccard-0.6 semantics as x04, but with a
    * PROVABLE candidate bound in place of x04's df-cap heuristic:
    * order the shingle universe globally by (df asc, sh asc) and keep only
    * each doc's PREFIX of its sorted set, length |d| − ⌈t·|d|⌉ + 1; the
    * prefix-filter theorem says any pair with J ≥ t shares at least one
    * prefix shingle, so joining prefixes (not full sets) generates every
    * qualifying pair with zero false negatives. Candidates are then
    * verified exactly on the full sets (the x86 propose→verify shape), and
    * the threshold test is integer-pure: J ≥ 0.6 ⟺ 8·i ≥ 3·(na+nb);
    * prefix length uses ⌈3n/5⌉ = (3n+4) div 5.
    *
    * Scale shape: hot shingles place themselves OUT of prefixes by
    * construction — a shingle is in a doc's prefix only when it is among
    * the doc's globally rarest, so ubiquitous shingles (the d² join bombs
    * the df cap exists to kill) never generate candidates, while rare
    * shingles have tiny df and join cheaply. Everything is equi-joins and
    * window aggregates over the shingle hash partitioning; the verify pass
    * touches only candidate pairs. At test SF no shingle approaches x04's
    * cap, so x04 and x107 must agree EXACTLY — spec-asserted.
    */
  val prefixAllpairs: Q = Q(
    "x107_prefix_allpairs",
    s"""WITH sh0 AS ($shingleSql),
       |d AS (SELECT sh, count(*) AS df FROM sh0 GROUP BY sh),
       |r AS (SELECT s.doc_id, s.sh,
       |        row_number() OVER (PARTITION BY s.doc_id ORDER BY d.df, s.sh) AS rk,
       |        count(*) OVER (PARTITION BY s.doc_id) AS n
       |      FROM sh0 s JOIN d ON s.sh = d.sh),
       |p AS (SELECT doc_id, sh FROM r WHERE rk <= n - (3*n + 4) // 5 + 1),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM p a JOIN p b ON a.sh = b.sh AND a.doc_id < b.doc_id),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh0 GROUP BY doc_id),
       |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS i
       |          FROM cand c JOIN sh0 a ON a.doc_id = c.doc_a
       |                      JOIN sh0 b ON b.doc_id = c.doc_b AND b.sh = a.sh
       |          GROUP BY c.doc_a, c.doc_b)
       |SELECT i.doc_a, i.doc_b,
       |       round(CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i), 6) AS jaccard
       |FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a
       |             JOIN sz sb ON sb.doc_id = i.doc_b
       |WHERE 8 * i.i >= 3 * (sa.n + sb.n)
       |ORDER BY doc_a, doc_b""".stripMargin
  ) { (s, dir) =>
    val sh0 = cachedShingles(s, dir)
    val cand = prefixCandidatePairs(s, dir)
    // Verify is CANDIDATE-bounded (the x86 shape): prune the shingle index
    // to candidate docs with a broadcast semi-join BEFORE any shuffle —
    // without this the fb equi-join re-shuffles the whole corpus index by
    // (doc, sh) and dominated the sf1 run (measured 47 s → the windows'
    // ~17 s after the prune); sizes likewise only matter for candidates
    val candDocs = cand.select(col("doc_a").as("cd"))
      .union(cand.select(col("doc_b").as("cd"))).distinct()
    val shCand = sh0.join(broadcast(candDocs), col("doc_id") === col("cd"), "left_semi")
    val sz = shCand.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cand
      .join(shCand.as("fa"), col("fa.doc_id") === col("doc_a"))
      .join(shCand.as("fb"), col("fb.doc_id") === col("doc_b") && col("fb.sh") === col("fa.sh"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
    val jac = col("i").cast("double") / (col("sa.n") + col("sb.n") - col("i"))
    inter
      .join(sz.as("sa"), col("sa.doc_id") === col("doc_a"))
      .join(sz.as("sb"), col("sb.doc_id") === col("doc_b"))
      .where(lit(8) * col("i") >= lit(3) * (col("sa.n") + col("sb.n")))
      .select(col("doc_a"), col("doc_b"), round(jac, 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** CONTAINMENT-threshold all-pairs join (the ASYMMETRIC cousin of x107:
    * C(a→b) = |Sa∩Sb| / |Sa| ≥ 0.8 over the same trigram shingle sets).
    * Resemblance dedup (x02/x04/x107) is blind to exactly these pairs — a
    * short document quoted inside a much longer one has high containment
    * but Jaccard ≈ |Sa|/|Sb| → 0, so no symmetric threshold catches it;
    * containment is how a curation pass finds quotes, boilerplate
    * inclusions, and near-supersets (Broder 1997's "roughly contained"
    * relation; prefix filtering for asymmetric overlap per Chaudhuri et al.
    * SSJoin, ICDE'06).
    *
    * Prefix bound (probe-side only — that is the asymmetric part): if
    * C(a→b) ≥ t then |Sa∩Sb| ≥ ⌈t·na⌉ =: mo, and a's df-ordered prefix of
    * length na − mo + 1 must contain a witness (its complement has only
    * mo − 1 slots), so joining a-prefixes against the FULL shingle index
    * generates every qualifying ORDERED pair — no bound exists on the
    * container side, which may be any size. Threshold is integer-pure:
    * C ≥ 0.8 ⟺ 5·i ≥ 4·na; mo = ⌈4n/5⌉ = (4n+4) div 5.
    *
    * EXTENDED prefix + match-count floor (the adaptive-prefix-length idea,
    * Wang et al. SIGMOD'12 §3, applied as a fixed k): the minimal prefix
    * guarantees only ONE shared witness, so at 100× the pair set entering
    * verify was every pair sharing a single rare shingle — 30.8M candidate
    * rows whose per-pair full-set verify join enumerated ~9 BILLION rows
    * and spilled 78 GB of sort runs before dying (measured, sf10 24 g: the
    * first sf10 casualty of round 8, found the same way round 7 found its
    * three). Extending the prefix to L = na − mo + k (the rows EXIST in
    * x107's memoized t=0.6 index whenever k ≤ prefLen06 − (na − mo), so
    * keff = max(1, min(8, that)) per doc) strengthens the pigeonhole:
    * overlap∩prefix(L) ≥ overlap − (na − L) ≥ mo − (mo − keff) = keff —
    * a qualifying pair must share ≥ keff PREFIX shingles. The candidate
    * stage therefore GROUPS the prefix⋈index join by pair and keeps only
    * count ≥ keff (an aggregate, not a distinct — no pair-set blowup ever
    * materializes), then a length filter (overlap ≤ nb ⇒ nb ≥ mo) prunes
    * short containers before the exact full-set verify touches anything.
    * Every filter is provably lossless at t = 0.8; the spec asserts output
    * equality with brute-force ordered all-pairs.
    *
    * Scale shape: the probe side is rare-shingle-only by construction (a
    * prefix shingle is among its doc's globally RAREST — measured max
    * prefix df 12 at sf10), so the candidate join is linear-ish
    * (Σ_prefix df); hot boilerplate shingles never enter a prefix and the
    * full-index side is only ever probed at rare keys. Both joins are
    * equi-joins on the shingle hash partitioning; nothing pairs off
    * corpus-wide, and verify is bounded by the keff-filtered pair list.
    */
  /** x127's verified-candidate pair list (doc_a, doc_b, na) — the keff-
    * floored, length-filtered set that enters the exact verify. Factored so
    * DedupDiag can report the PAIR count entering verify (the quantity
    * whose unbounded growth was the r8 sf10 casualty) without re-stating
    * the filter stack.
    */
  /** x127's extended t=0.8 probe prefix — still a subset of the memoized
    * t=0.6 index (keff ≤ pl6 − (n − mo) by construction): reuse its
    * windows. Factored so DedupDiag can count/time the PROBE volume (the
    * quantity a keff tightening would shrink) separately from the
    * candidate join it feeds.
    */
  private[graft] def containmentPrefix(s: SparkSession, dir: String): DataFrame =
    cachedPrefixIndex(s, dir)
      .withColumn("mo", expr("(4*n + 4) div 5"))
      .withColumn("keff",
        greatest(lit(1), least(lit(8), expr("(n - (3*n + 4) div 5 + 1) - (n - mo)"))))
      .where(col("rk") <= col("n") - col("mo") + col("keff"))
      .select(col("doc_id").as("doc_a"), col("sh"),
        col("n").as("na"), col("mo"), col("keff"))

  /** x127's keff-floored candidate aggregate BEFORE the container-length
    * filter — DedupDiag counts it so the floor's selectivity and the
    * length filter's selectivity are each visible on their own.
    */
  private[graft] def containmentCandRaw(s: SparkSession, dir: String): DataFrame = {
    val sh0 = cachedShingles(s, dir)
    // candidate stage is an AGGREGATE, never a distinct pair materialization:
    // count shared prefix shingles per ordered pair, floor at keff
    containmentPrefix(s, dir)
      .join(sh0.select(col("doc_id").as("doc_b"), col("sh")), Seq("sh"))
      .where(col("doc_a") =!= col("doc_b"))
      .groupBy("doc_a", "doc_b", "na", "mo", "keff")
      .agg(count(lit(1)).as("ip"))
      .where(col("ip") >= col("keff"))
  }

  private[graft] def containmentCandidates(s: SparkSession, dir: String): DataFrame =
    containmentCandidatesFrom(s, dir, containmentCandRaw(s, dir))

  /** The container-length filter over a given raw candidate aggregate —
    * takes the DataFrame explicitly so DedupDiag can feed the CACHED raw
    * stage and time this filter alone.
    */
  private[graft] def containmentCandidatesFrom(
      s: SparkSession, dir: String, raw: DataFrame): DataFrame = {
    val sh0 = cachedShingles(s, dir)
    // length filter: overlap ≤ nb, so a container shorter than mo can't qualify
    val sz = sh0.groupBy(col("doc_id").as("szd")).agg(count(lit(1)).as("nb"))
    raw
      .join(sz, col("szd") === col("doc_b") && col("nb") >= col("mo"))
      .select("doc_a", "doc_b", "na")
  }

  /** x127's exact verify over a given candidate list — factored so
    * DedupDiag can time the verify stage against a CACHED candidate set
    * (the sec_x127_verify attribution the r12 verdict asked for), while
    * the query composes it with the live candidate plan.
    */
  private[graft] def containmentVerify(s: SparkSession, dir: String, cl: DataFrame): DataFrame = {
    val sh0 = cachedShingles(s, dir)
    // verify: candidate-bounded exact intersection (the x107/x86 shape)
    val candDocs = cl.select(col("doc_a").as("cd"))
      .union(cl.select(col("doc_b").as("cd"))).distinct()
    val shCand = sh0.join(broadcast(candDocs), col("doc_id") === col("cd"), "left_semi")
    cl
      .join(shCand.as("fa"), col("fa.doc_id") === col("doc_a"))
      .join(shCand.as("fb"), col("fb.doc_id") === col("doc_b") && col("fb.sh") === col("fa.sh"))
      .groupBy("doc_a", "doc_b", "na").agg(count(lit(1)).as("i"))
      .where(lit(5) * col("i") >= lit(4) * col("na"))
      .select(col("doc_a"), col("doc_b"), col("na"),
        round(col("i").cast("double") / col("na"), 6).as("containment"))
      .orderBy("doc_a", "doc_b")
  }

  val containmentJoin: Q = Q(
    "x127_containment_join",
    s"""WITH sh0 AS ($shingleSql),
       |d AS (SELECT sh, count(*) AS df FROM sh0 GROUP BY sh),
       |r AS (SELECT s.doc_id, s.sh,
       |        row_number() OVER (PARTITION BY s.doc_id ORDER BY d.df, s.sh) AS rk,
       |        count(*) OVER (PARTITION BY s.doc_id) AS n
       |      FROM sh0 s JOIN d ON s.sh = d.sh),
       |p AS (SELECT doc_id, sh, n, mo, greatest(1, least(8, pl6 - (n - mo))) AS keff
       |      FROM (SELECT doc_id, sh, rk, n, (4*n + 4) // 5 AS mo,
       |                   n - (3*n + 4) // 5 + 1 AS pl6 FROM r)
       |      WHERE rk <= n - mo + greatest(1, least(8, pl6 - (n - mo)))),
       |cand AS (SELECT p.doc_id AS doc_a, b.doc_id AS doc_b, p.n AS na,
       |                p.mo AS mo, count(*) AS ip
       |         FROM p JOIN sh0 b ON p.sh = b.sh AND p.doc_id <> b.doc_id
       |         GROUP BY 1, 2, 3, 4, p.keff
       |         HAVING count(*) >= p.keff),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh0 GROUP BY doc_id),
       |cl AS (SELECT c.doc_a, c.doc_b, c.na FROM cand c
       |       JOIN sz ON sz.doc_id = c.doc_b AND sz.n >= c.mo),
       |inter AS (SELECT c.doc_a, c.doc_b, c.na, count(*) AS i
       |          FROM cl c JOIN sh0 a ON a.doc_id = c.doc_a
       |                    JOIN sh0 b ON b.doc_id = c.doc_b AND b.sh = a.sh
       |          GROUP BY c.doc_a, c.doc_b, c.na)
       |SELECT doc_a, doc_b, CAST(na AS BIGINT) AS na,
       |       round(CAST(i AS DOUBLE) / na, 6) AS containment
       |FROM inter WHERE 5 * i >= 4 * na
       |ORDER BY doc_a, doc_b""".stripMargin
  ) { (s, dir) =>
    // Round 15 (guide §2.4/§5 — r14 verdict item 3): the verify stage
    // consumes the candidate list THREE times (the main join plus the two
    // candDocs legs of the semi-join prune), and the broadcast legs prune
    // columns differently, so exchange reuse never fires — AQE executed
    // the candidate join + aggregate lineage 3-5× per run (1,346 tasks,
    // StageDiag-attributed). The candidate list is PAIR-scale (keff-
    // floored, length-filtered — the r8 bound), so an in-query EAGER
    // localCheckpoint materializes it once per query invocation and every
    // consumer reads the checkpointed rows. This is lineage truncation
    // INSIDE the timed region — each Bench pass re-invokes the query
    // function and recomputes from parquet; nothing persists across runs
    // (the memo caches' clearMemo discipline is untouched).
    containmentVerify(s, dir, containmentCandidates(s, dir).localCheckpoint())
  }

  /** SORTED-NEIGHBORHOOD near-dup (Hernández & Stolfo, SIGMOD'95 — the
    * sort-based alternative to index joins for blocking): derive a content
    * sort key (first 40 consonants of the text — vowels and spaces dropped
    * so the key is robust to small in-word edits), sort within key-prefix
    * blocks, and compare each doc against only its next 2 neighbors in sort
    * order; survivors are verified with the SAME exact trigram-Jaccard ≥
    * 0.6 as x04/x107 by probing the shared digest shingle index with the
    * candidate id pairs (the x86 candidate-bounded verify shape).
    *
    * Key-design lesson, measured on this corpus: the near-dup copies carry
    * DIFFERENT `lang` labels (the generator relabels its mutated copies),
    * so a metadata-prefixed key (`lang || consonants`) scatters true pairs
    * to distant sort positions — recall 6/25. A content-only key is 25/25
    * on 58 candidates (vs 12 025 for the full inverted-index join). The
    * blocking key must derive from the bytes being compared, never from
    * labels that dedup itself would reveal to be inconsistent.
    *
    * Recall granularity: inside a dup cluster larger than the window the
    * distance-(w+1) pair is not emitted (4 near-identical docs sorted
    * adjacently → the 1st↔4th edge is missed), but every member still
    * connects through its neighbors — so CLUSTER-level recall (what x31's
    * closure consumes) survives; the spec asserts component equality with
    * the exact join, plus precision 1.0 (every pair re-verified exactly).
    *
    * Scale shape: ONE shuffle — hash on the 8-char block prefix — then an
    * in-partition sort and a 2-row lookahead window; candidate volume is
    * ≤ 2·N rows regardless of key skew, and verification is row-local
    * array intersection. The trade vs LSH banding (x02): SNM is a single
    * sort with O(N·w) candidates but misses pairs whose first consonants
    * diverge (edits at text START break the key — this corpus edits at the
    * end); banding is edit-position-oblivious but costs a signature pass
    * plus a band join. Both ship; x02 is the default.
    */
  val sortedNeighborhood: Q = {
    Q(
      "x108_sorted_neighborhood",
      s"""WITH k AS (
         |  SELECT doc_id,
         |         substr(regexp_replace(text, '[aeiou ]', '', 'g'), 1, 40) AS key
         |  FROM documents WHERE text IS NOT NULL),
         |n AS (
         |  SELECT doc_id,
         |         lead(doc_id, 1) OVER win AS id1, lead(doc_id, 2) OVER win AS id2
         |  FROM k WINDOW win AS (PARTITION BY substr(key, 1, 8) ORDER BY key, doc_id)),
         |pairs AS (
         |  SELECT DISTINCT least(a, b) AS doc_a, greatest(a, b) AS doc_b FROM (
         |    SELECT doc_id AS a, id1 AS b FROM n WHERE id1 IS NOT NULL
         |    UNION ALL
         |    SELECT doc_id AS a, id2 AS b FROM n WHERE id2 IS NOT NULL)),
         |sh0 AS ($shingleSql),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh0 GROUP BY doc_id),
         |inter AS (
         |  SELECT p.doc_a, p.doc_b, count(*) AS i
         |  FROM pairs p JOIN sh0 a ON a.doc_id = p.doc_a
         |               JOIN sh0 b ON b.doc_id = p.doc_b AND b.sh = a.sh
         |  GROUP BY p.doc_a, p.doc_b)
         |SELECT i.doc_a, i.doc_b,
         |       round(CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i), 6) AS jaccard
         |FROM inter i JOIN sz sa ON sa.doc_id = i.doc_a
         |             JOIN sz sb ON sb.doc_id = i.doc_b
         |WHERE 8 * i.i >= 3 * (sa.n + sb.n)
         |ORDER BY doc_a, doc_b""".stripMargin
    ) { (s, dir) =>
      // Text NEVER rides the window: the sort+shuffle see only (doc_id,
      // key) — 48 bytes/row instead of full documents; verification then
      // probes the memoized digest shingle index (shared with x107) with
      // the candidate pairs — per-pair row-local array intersection over
      // raw trigram strings measured 2.4× slower at sf0.1 (docs shared by
      // several pairs rebuild their arrays per pair; the equi-join
      // aggregates each doc's digests once).
      // ONE window pass: both lookahead neighbors ride a 2-element array
      // exploded after the window (a unionAll of two window branches plans
      // WindowExec twice — same sort, double cost).
      val k = docs(s, dir).where(col("text").isNotNull)
        .select(col("doc_id"),
          substring(regexp_replace(col("text"), "[aeiou ]", ""), 1, 40).as("key"))
      val win = Window.partitionBy(substring(col("key"), 1, 8)).orderBy("key", "doc_id")
      val pairs = k
        .select(col("doc_id"),
          lead(col("doc_id"), 1).over(win).as("id1"),
          lead(col("doc_id"), 2).over(win).as("id2"))
        .select(col("doc_id"), explode(array(col("id1"), col("id2"))).as("nbid"))
        .where(col("nbid").isNotNull)
        .select(least(col("doc_id"), col("nbid")).as("doc_a"),
          greatest(col("doc_id"), col("nbid")).as("doc_b"))
        .distinct()
      val sh0 = cachedShingles(s, dir)
      val sz = sh0.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = pairs
        .join(sh0.as("fa"), col("fa.doc_id") === col("doc_a"))
        .join(sh0.as("fb"), col("fb.doc_id") === col("doc_b") && col("fb.sh") === col("fa.sh"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
      inter
        .join(sz.as("sa"), col("sa.doc_id") === col("doc_a"))
        .join(sz.as("sb"), col("sb.doc_id") === col("doc_b"))
        .where(lit(8) * col("i") >= lit(3) * (col("sa.n") + col("sb.n")))
        .select(col("doc_a"), col("doc_b"),
          round(col("i").cast("double") / (col("sa.n") + col("sb.n") - col("i")), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b")
    }
  }

  /** The curation capstone: gates → near-dup drop → per-language sampling
    * as ONE declarative plan — the whole pipeline the x-series exercises
    * piecewise (x09 quality gates, x31/x64 cluster + pick, x37 mixture
    * coin), composed the way a production corpus build runs it. Per
    * language: pool size after gates + dedup, and the final sampled count.
    * Catalyst sees one tree, so the gate filters push into the scan UNDER
    * the anti join and the expensive pair lineage stays the shared
    * memoized subtree — composing queries does not multiply their cost.
    */
  val curationPipeline: Q = Q(
    "x65_curation_pipeline",
    s"""WITH RECURSIVE pairs AS ($lshPairsSql),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION SELECT doc_b AS a, doc_a AS b FROM pairs),
       |nodes AS (SELECT DISTINCT a AS node FROM edges),
       |reach(node, lbl) AS (
       |  SELECT node, node FROM nodes
       |  UNION
       |  SELECT e.b AS node, r.lbl FROM reach r JOIN edges e ON e.a = r.node),
       |labels AS (SELECT node, min(lbl) AS lbl FROM reach GROUP BY node),
       |ranked AS (SELECT l.lbl, d.doc_id,
       |    row_number() OVER (PARTITION BY l.lbl ORDER BY d.n_chars DESC, d.doc_id) AS rk
       |  FROM labels l JOIN documents d ON l.node = d.doc_id),
       |drop_ AS (SELECT doc_id FROM ranked WHERE rk > 1),
       |pool AS (SELECT lang, text FROM documents
       |         WHERE n_chars BETWEEN 100 AND 500
       |           AND doc_id NOT IN (SELECT doc_id FROM drop_))
       |SELECT lang, CAST(count(*) AS BIGINT) AS n_pool,
       |       CAST(sum(CASE WHEN CAST('0x' || substr(md5(text), 1, 4) AS INTEGER) <
       |         (CASE lang WHEN 'en' THEN 49152 ELSE 32768 END)
       |         THEN 1 ELSE 0 END) AS BIGINT) AS n_final
       |FROM pool GROUP BY lang ORDER BY lang""".stripMargin
  ) { (s, dir) =>
    val labels = clusterLabels(s, dir)
    val w = Window.partitionBy("lbl").orderBy(col("n_chars").desc, col("doc_id"))
    val dropList = labels
      .join(docs(s, dir).select(col("doc_id"), col("n_chars")), col("node") === col("doc_id"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") > 1)
      .select(col("doc_id"))
    val thr = when(col("lang") === "en", 49152).otherwise(32768)
    docs(s, dir)
      .where(col("n_chars").between(100, 500))
      .join(dropList, Seq("doc_id"), "left_anti")
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_pool"),
        sum(when(conv(substring(md5(col("text")), 1, 4), 16, 10).cast("int") < thr, 1)
          .otherwise(0)).cast("long").as("n_final"))
      .orderBy("lang")
  }

  /** Triangle participation over the LSH candidate graph — the local-density
    * signal that separates a TEMPLATE FAMILY (boilerplate: members pairwise
    * similar, so their neighborhoods close into triangles) from a chain of
    * coincidental pairwise matches (no closure). Per doc: how many
    * triangles it sits in. Rides the memoized pair lineage like
    * x31/x47/x55, so the triple join runs over CANDIDATE edges — a set
    * orders of magnitude below the corpus — with a < b < c canonical
    * orientation making each triangle counted exactly once.
    */
  val triangleCount: Q = Q(
    "x77_triangle_count",
    s"""WITH pairs AS ($lshPairsSql),
       |e AS (SELECT doc_a AS a, doc_b AS b FROM pairs),
       |tri AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
       |        FROM e e1 JOIN e e2 ON e1.b = e2.a
       |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
       |m AS (SELECT a AS doc_id FROM tri
       |      UNION ALL SELECT b FROM tri
       |      UNION ALL SELECT c FROM tri)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_triangles
       |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val e = lshCandidatePairs(s, dir)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"), col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("a"), col("e1.b").as("b"), col("e2.b").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
      .orderBy("doc_id")
  }

  /** Incremental dedup of an ingest batch against the standing index — the
    * shape a 100 TB pipeline runs HOURLY: only the delta's band signatures
    * probe the full index (delta ⨝ all on (band, sig)), so corpus-internal
    * pairs — the quadratically dominant set — are never recomputed. The
    * deterministic doc_id % 10 = 0 slice stands in for the new batch; the
    * oracle states the contract exactly: the full pair set restricted to
    * pairs touching the delta. Both-sides-in-delta pairs match in both
    * probe orders, so the join canonicalizes (least, greatest) and dedups
    * (band, pair) before counting — n_bands stays exact.
    *
    * The probe applies [[LshBucketCap]] exactly like the full pair join:
    * the delta joins only SMALL buckets, and an over-cap bucket reduces to
    * row-local hub-star rows filtered to delta-touching — so a boilerplate
    * mega-bucket costs the hourly ingest O(bucket) rows instead of
    * O(delta·bucket) join output (the skew fixture's 7,464-doc bucket made
    * the uncapped probe enumerate 5.6M pairs per run). Per band a doc has
    * ONE signature, so a pair meets in at most one bucket per band and the
    * (band, pair) distinct stays the exact n_bands dedup key.
    */
  val incrementalDedup: Q = Q(
    "x80_incremental_dedup",
    s"""WITH pairs AS ($lshPairsSql)
       |SELECT doc_a, doc_b, n_bands FROM pairs
       |WHERE doc_a % 10 = 0 OR doc_b % 10 = 0
       |ORDER BY doc_a, doc_b""".stripMargin
  ) { (s, dir) =>
    val bands = bucketStatBands(s, dir)
    val small = bands.where(col("bucket_n") <= LshBucketCap)
    val delta = small.where(col("doc_id") % 10 === 0)
    val smallPairs = delta.as("a")
      .join(small.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.band").as("band"),
        least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
    val starPairs = bands
      .where(col("bucket_n") > LshBucketCap && col("doc_id") =!= col("hub") &&
        (col("hub") % 10 === 0 || col("doc_id") % 10 === 0))
      .select(col("band"), col("hub").as("doc_a"), col("doc_id").as("doc_b"))
    smallPairs.union(starPairs)
      .distinct()
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_bands"))
      .orderBy("doc_a", "doc_b")
  }

  /** Candidate-doc shingle sets, memoized like the pairs: x86's verify plan
    * consumes this subtree three times (both intersection sides + the size
    * aggregate), and without materialization each consumer re-runs the
    * semi-join + shingle explode.
    */
  /** Corpus shingle index memoized for x107/x108: the prefix-join plan
    * references the set under FOUR different partitionings (df annotation
    * by sh, per-doc ranking by doc_id, and both verify sides), so exchange
    * reuse never fires and an uncached plan pays the generator 4×. Caching
    * (doc_id, sh) is heavier than the pair-level memos — at corpus scale
    * this is the disk-backed shingle index a production PPJoin
    * materializes once and probes repeatedly; locally ~16 B + digest per
    * shingle.
    */
  private val shinglesCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def cachedShingles(s: SparkSession, dir: String): DataFrame = {
    evictStopped()
    // plain (doc_id, sh) — annotating df/n windows INTO the materialization
    // measured slower (10.8 vs 7.5 s for x107 at sf0.1): the window sorts
    // then run inside the cache-write pass and the wider rows cost more
    // than the per-consumer recomputation they save
    shinglesCache.getOrElseUpdate((s, dir), shingled(s, dir).cache())
  }

  /** Ranked PREFIX index for x107 (doc_id, prefix shingle), memoized: the
    * df and per-doc rank windows over the full shingle index are the
    * dominant cost of the exact all-pairs plan, and the self-join consumes
    * the index twice — cached, the windows run once per (session, dir) and
    * both join sides read the materialized rows. Prefix rows are a strict
    * subset of the shingle index (|d| − ⌈0.6|d|⌉ + 2 per doc — ONE rank
    * past the minimal k=1 prefix, so the candidate stage can demand TWO
    * shared prefix tokens; see prefixCandidatePairs), so this is smaller
    * than shinglesCache, which it derives from. x127's keff extension
    * selects rk ≤ n − mo + keff ≤ the minimal k=1 length by construction,
    * so the extra rank is invisible to it.
    */
  private val prefixIndexCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def cachedPrefixIndex(s: SparkSession, dir: String): DataFrame = {
    evictStopped()
    prefixIndexCache.getOrElseUpdate((s, dir), {
      val ranked = cachedShingles(s, dir)
        .withColumn("df", count(lit(1)).over(Window.partitionBy("sh")))
        .withColumn("rk", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("df"), col("sh"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
      // rk and n ride the index: the candidate join's length and positional
      // filters (below) need them, and they're free here — both windows
      // already computed them
      ranked
        .where(col("rk") <= col("n") - expr("(3*n + 4) div 5") + 2)
        .select("doc_id", "sh", "rk", "n")
        .cache()
    })
  }

  /** x107's candidate pair list (tiny — prefix-filter-theorem-bounded),
    * memoized LIKE EVERY OTHER cache in this file: it is consumed twice
    * inside the plan (the verify probe and its own doc-id prune), and an
    * inline `.cache()` would survive Bench.clearMemo between best-of-N
    * passes — letting pass 2 time a cache read where pass 1 timed the real
    * window+join work (the exact discipline clearMemo documents).
    */
  private val prefixPairsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def prefixCandidatePairs(s: SparkSession, dir: String): DataFrame = {
    evictStopped()
    prefixPairsCache.getOrElseUpdate((s, dir), {
      val prefix = cachedPrefixIndex(s, dir)
      // The bare prefix join admits far more candidates than the verified
      // output (measured 3.0M candidates → 2,560 pairs at sf1, with verify
      // at 21 of x107's 27 s) — so the OTHER two PPJoin filters run as
      // row-local predicates on the join output, both provably lossless at
      // J ≥ 0.6 ⟺ 8i ≥ 3(na+nb):
      //  - LENGTH: i ≤ min(na,nb) ⇒ qualifying pairs have
      //    3·max(na,nb) ≤ 5·min(na,nb).
      //  - POSITIONAL (the join-predicate-safe form of Xiao et al. §3.2):
      //    for a token matching at ranks (rka, rkb) of the SAME global
      //    (df, sh) order, common tokens BEFORE it occupy distinct ranks
      //    below rka in a and below rkb in b (≤ min(rka−1, rkb−1) of them),
      //    and common tokens after it fit in the shorter suffix — so
      //    overlap ≤ ub = min(rka−1, rkb−1) + 1 + min(na−rka, nb−rkb),
      //    valid at EVERY match position (PPJoin's tighter first-match
      //    bound assumes zero prior overlap, which only holds for the
      //    pair's first common token — unsound as a per-row predicate). A
      //    pair survives iff ANY shared prefix token passes 8·ub ≥
      //    3(na+nb); pruning is lossless because each retained qualifying
      //    pair retains its first-match row.
      //  - PAIR-SPECIFIC PREFIX (the strongest cut): the stored prefix uses
      //    the threshold-only length n − ⌈0.6n⌉ + 2 ≈ 0.4n (correct before
      //    the partner's size is known), but once BOTH sizes are on the
      //    row the required overlap is α = ⌈3(na+nb)/8⌉ ≥ ⌈0.75·min⌉, and
      //    any qualifying pair must share ≥ 2 tokens within the SHORTER
      //    pair-specific prefixes n − α + 2 ≈ 0.25n (the k-extension
      //    lemma below). Rows beyond either pair-specific prefix cannot be
      //    among a qualifying pair's first TWO matches — dropped.
      //  - MATCH-COUNT FLOOR k = 2 (x127's keff discipline applied at the
      //    symmetric threshold — the round-12 fix for the sf10 straggler):
      //    if |A∩B| ≥ α then the global-order ranks of the first k common
      //    tokens satisfy rank_A(c_k) ≤ na − (i − k) ≤ na − α + k (i − k
      //    common tokens still follow c_k), so the (n − α + k)-prefixes
      //    share ≥ k tokens for ANY k ≤ α. With k = 2 the single-rare-
      //    shingle false positives that dominated the 100× candidate set
      //    vanish (measured: 6.88M → see BASELINE §2.1-r12; final output
      //    provably identical). α ≥ 2 ⟺ na + nb ≥ 3, so the only escape
      //    is the two-singleton pair (na = nb = 1), kept at count ≥ 1.
      //    Every filter above is per-row SOUND for qualifying pairs (ub
      //    bounds true overlap at every match row), so all ≥ 2 qualifying
      //    matches survive to the aggregate — the floor is lossless.
      val alpha = expr("(3*(a.n + b.n) + 7) div 8")
      val ub = least(col("a.rk"), col("b.rk")) +
        least(col("a.n") - col("a.rk"), col("b.n") - col("b.rk"))
      prefix.as("a")
        .join(prefix.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .where(lit(3) * greatest(col("a.n"), col("b.n")) <=
          lit(5) * least(col("a.n"), col("b.n")))
        .where(col("a.rk") <= col("a.n") - alpha + 2 &&
          col("b.rk") <= col("b.n") - alpha + 2)
        .where(lit(8) * ub >= lit(3) * (col("a.n") + col("b.n")))
        // COUPLING (ADVICE r12): the np >= 2 floor's losslessness needs the
        // length filter ABOVE to stay conjoined — α ≥ ⌈3(na+nb)/8⌉ only
        // guarantees two matches inside the stored +2 prefix because
        // 5·min ≥ 3·max already holds on every surviving row. Reordering or
        // relaxing that where-clause silently breaks the pigeonhole; the
        // x107 ≡ x04 equality spec is the tripwire.
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("np"), max(col("a.n") + col("b.n")).as("nsum"))
        .where(col("np") >= 2 || col("nsum") <= 2)
        .select("doc_a", "doc_b")
        .cache()
    })
  }

  private val candShinglesCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def candidateShingles(s: SparkSession, dir: String): DataFrame = {
    evictStopped()
    candShinglesCache.getOrElseUpdate((s, dir), {
      val pairs = lshCandidatePairs(s, dir)
      // shingle ONLY the docs the candidate list names — at 100 TB the
      // verify stage must never regenerate the corpus-wide shingle set the
      // banding already consumed (the candidate set is orders of magnitude
      // smaller, and broadcast-semi-join prunes before the explode)
      val cand = pairs.select(col("doc_a").as("doc_id"))
        .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
      shingledDocs(
        docs(s, dir).join(broadcast(cand), Seq("doc_id"), "left_semi")).cache()
    })
  }

  /** Exact-Jaccard verification of the LSH candidates — the post-filter
    * that turns "banded together at least once" into a real similarity
    * verdict (candidate→verify is THE two-stage shape of production LSH:
    * x02 proposes, this disposes). Per candidate pair: shingle-set
    * intersection, union by inclusion–exclusion, similarity in exact
    * integer ppm, and the ≥ 0.5 verdict.
    *
    * Scale shape: everything is CANDIDATE-scale — the pair list (memoized
    * lineage) joins the shingle table only for the docs it names, so the
    * intersection probe replicates candidate docs' shingle sets, never the
    * corpus's; per-doc sizes are a digest-count aggregate joined back by
    * key. The corpus-wide all-pairs variant (x04) exists as the oracle
    * baseline; this is the one that runs at 100 TB.
    */
  val lshVerify: Q = Q(
    "x86_lsh_verify",
    s"""WITH sh AS ($shingleSql),
       |pairs AS ($lshPairsSql),
       |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS i
       |          FROM pairs p JOIN sh a ON a.doc_id = p.doc_a
       |                       JOIN sh b ON b.doc_id = p.doc_b AND b.sh = a.sh
       |          GROUP BY 1, 2)
       |SELECT p.doc_a, p.doc_b, p.n_bands, coalesce(i.i, 0) AS n_inter,
       |       CAST(coalesce(i.i, 0) * 1000000 // (sa.n + sb.n - coalesce(i.i, 0)) AS BIGINT) AS jaccard_ppm,
       |       (coalesce(i.i, 0) * 2 >= sa.n + sb.n - coalesce(i.i, 0)) AS verified
       |FROM pairs p
       |JOIN sz sa ON sa.doc_id = p.doc_a
       |JOIN sz sb ON sb.doc_id = p.doc_b
       |LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b
       |ORDER BY p.doc_a, p.doc_b""".stripMargin
  ) { (s, dir) =>
    val pairs = lshCandidatePairs(s, dir)
    val sh    = candidateShingles(s, dir)
    val sz    = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.as("a"), col("a.doc_id") === col("doc_a"))
      .join(sh.as("b"), col("b.doc_id") === col("doc_b") && col("b.sh") === col("a.sh"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("i"))
    val i = coalesce(col("i"), lit(0L))
    pairs
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .select(col("doc_a"), col("doc_b"), col("n_bands"),
        i.as("n_inter"),
        expr("coalesce(i, 0) * 1000000 div (na + nb - coalesce(i, 0))").as("jaccard_ppm"),
        (i * 2 >= col("na") + col("nb") - i).as("verified"))
      .orderBy("doc_a", "doc_b")
  }

  /** Span-level duplication profile (the "dedup the substrings, not the
    * documents" shape of Lee et al., *Deduplicating Training Data Makes
    * Language Models Better*, ACL 2022): every word-5-gram POSITION in a
    * document is marked duplicated when the same 5-gram occurs in at least
    * one OTHER document; per-doc output is the duplicated-position fraction
    * in exact integer ppm. Unlike the doc-level families (x01/x02/x04) this
    * measures how much of each document's surface is boilerplate shared
    * with the rest of the corpus — the signal span-dedup pipelines cut on.
    *
    * Scale shape: positions are digested to 16 hex chars BEFORE any
    * exchange (the x01/x02 rule), the cross-doc frequency table is a
    * digest-keyed aggregate, and the mark-back is a digest equi-join — the
    * corpus text itself is never shuffled. Position rows grow linearly with
    * corpus tokens; both the df aggregate and the join shuffle hash-
    * partition on the digest, so the plan is the same at 1000 executors.
    */
  /** x88's positional-span stream, memoized: the plan consumes it twice
    * (the cross-doc df aggregate AND the mark-back join) — without
    * materialization the scan + 5-gram explode + per-position MD5 run
    * twice per execution. Same clearMemo discipline as the pair lineage.
    */
  private val spanPosCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def spanPositions(s: SparkSession, dir: String): DataFrame = {
    evictStopped()
    spanPosCache.getOrElseUpdate((s, dir), {
      // one row per 5-gram POSITION (not distinct): the duplicated fraction
      // weights a span by how often the document repeats it. The 1-based
      // start position `p` rides along (x88 ignores it; x166's excision
      // needs it to turn dup digests back into covered word intervals).
      // Round 15 (guide §4): the per-position interpreted lambda (five
      // element_at + concat_ws + md5-of-a-fresh-string) is one codegen'd
      // [[graft.functions.WordNgramDigests]] pass; dedup = false keeps
      // every POSITION (posexplode's p must stay the word index).
      Tables.computeParallel(docs(s, dir))
        .select(
          col("doc_id"),
          posexplode(graft.functions.WordNgramDigestsFunctions
            .wordNgramDigests(col("text"), 5, dedup = false)).as(Seq("p0", "g")))
        .select(col("doc_id"), (col("p0") + 1).as("p"), col("g"))
        .cache()
    })
  }

  val spanDedup: Q = Q(
    "x88_span_dedup",
    """WITH pos AS (
      |  SELECT doc_id, substr(md5(array_to_string(list_slice(w, i, i+4), ' ')), 1, 16) AS g
      |  FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents),
      |       LATERAL (SELECT unnest(generate_series(1, len(w)-4)) AS i) s),
      |df AS (SELECT g, count(DISTINCT doc_id) AS df FROM pos GROUP BY g)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
      |       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
      |       CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS dup_ppm
      |FROM pos JOIN df USING (g)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val pos = spanPositions(s, dir)
    val df = pos.groupBy("g").agg(countDistinct(col("doc_id")).as("df"))
    // the frequency table is CORPUS-cardinality (one row per distinct
    // 5-gram digest) — Catalyst's post-aggregate size estimate under-
    // guesses it and picks a broadcast, which is wrong at every scale:
    // the 2 GB sf1 proof run died building it, and on a real cluster a
    // corpus-sized broadcast is a per-executor copy of the whole digest
    // space. Forced shuffle-hash join instead: df is ALREADY hash-
    // partitioned by g from its groupBy, so its exchange reuses the
    // aggregate's; only pos pays a shuffle, same as the aggregate above.
    pos.join(df.hint("shuffle_hash"), "g")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_ppm", expr("n_dup * 1000000 div n_spans"))
      .orderBy("doc_id")
  }

  /** SimHash near-dup pairs at Hamming distance ≤ 2 via pigeonhole banding
    * (Manku, Jain & Sarma, *Detecting Near-Duplicates for Web Crawling*,
    * WWW 2007): split the 32-bit signature into 3 bands (11/11/10 bits) —
    * any pair differing in ≤ 2 bits agrees EXACTLY on at least one band, so
    * a band equi-join proposes a candidate superset with guaranteed 100%
    * recall and the exact `bit_count(xor)` verifies. The oracle is the
    * all-pairs quadratic; this plan replaces it with 3 hash-partitioned
    * equi-joins whose candidate volume is Σ(band-bucket sizes²) — birthday-
    * bounded, never n².
    *
    * Scale shape: signatures are row-local codegen ([[graft.functions.SimHash32]]),
    * the band explode is ×3, the join shuffles (band, value, doc_id, sig) —
    * 30-ish bytes/row — and verification is a codegen'd bit op on the
    * joined row. At 100 TB the band value would widen (64-bit simhash,
    * 4 bands of 16) but the plan is unchanged.
    */
  val simhashBands: Q = Q(
    "x91_simhash_bands",
    """WITH sh AS (
      |  SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, i - 1) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
      |  FROM (SELECT doc_id, i, sum(CASE WHEN ascii(substr(h, CAST(i AS INT), 1)) % 2 = 1 THEN 1 ELSE -1 END) AS s
      |        FROM (SELECT doc_id, md5(w) AS h
      |              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents))
      |        CROSS JOIN (SELECT unnest(generate_series(1, 32)) AS i) bits
      |        GROUP BY doc_id, i)
      |  GROUP BY doc_id)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS ham
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
      |ORDER BY doc_a, doc_b""".stripMargin
  ) { (s, dir) =>
    val sh = docs(s, dir)
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.SimHashFunctions.simhash32(col("text")).as("simhash"))
    // 3 bands: bits [0,11) / [11,22) / [22,32)
    val bands = sh.select(col("doc_id"), col("simhash"),
      explode(array(
        struct(lit(0).as("bi"), col("simhash").bitwiseAND(lit(2047L)).as("bv")),
        struct(lit(1).as("bi"), shiftright(col("simhash"), 11).bitwiseAND(lit(2047L)).as("bv")),
        struct(lit(2).as("bi"), shiftright(col("simhash"), 22).bitwiseAND(lit(1023L)).as("bv")))).as("band"))
      .select(col("doc_id"), col("simhash"), col("band.bi").as("bi"), col("band.bv").as("bv"))
    bands.as("a")
      .join(bands.as("b"),
        col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sa"), col("b.simhash").as("sb"))
      .distinct() // a pair may agree on more than one band
      .withColumn("ham", bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long"))
      .where(col("ham") <= 2)
      .select("doc_a", "doc_b", "ham")
      .orderBy("doc_a", "doc_b")
  }

  /** Hamming-distance comparison terms over two 8-word prefix arrays,
    * generated once per dialect so both engines compute identically by
    * construction (the x40 zTerms pattern).
    */
  private def hdTermsDuck(a: String, b: String): String =
    (1 to 8).map(i => s"(CASE WHEN $a.w[$i] <> $b.w[$i] THEN 1 ELSE 0 END)").mkString(" + ")

  /** Deletion-indexed fuzzy join (the SymSpell / spell-correction-at-scale
    * shape): all document pairs whose 8-word prefixes are within word-level
    * Hamming distance 1, found WITHOUT an all-pairs comparison. Each doc
    * emits 8 deletion keys — md5 of its prefix with position k dropped —
    * and two prefixes differing by ≤1 substitution MUST share the key that
    * drops the differing position (guaranteed recall by construction, the
    * x21 multiprobe/x91 pigeonhole argument applied to the deletion
    * neighborhood). Candidates equi-join on the key; an exact zip_with
    * Hamming verify keeps true pairs. The quadratic all-pairs shape lives
    * only in the DuckDB oracle.
    *
    * Scale shape: the 8× key fan-out is row-local and digest-keyed (32-hex
    * keys, never text); candidate volume is Σ(bucket²) over deletion-key
    * buckets — near-dup-density-bounded, the x02 banding argument; the
    * verify re-joins prefixes for candidate docs only. hd = 0 (identical
    * prefixes) is included: the relation is "Hamming ≤ 1", not "exactly 1".
    */
  val fuzzyPrefixJoin: Q = Q(
    "x102_fuzzy_prefix_join",
    s"""WITH p AS (SELECT doc_id, list_slice(string_split(text, ' '), 1, 8) AS w
       |  FROM documents WHERE len(string_split(text, ' ')) >= 8),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         ${hdTermsDuck("a", "b")} AS hd
       |  FROM p a JOIN p b ON a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(hd AS BIGINT) AS hd
       |FROM pairs WHERE hd <= 1 ORDER BY doc_a, doc_b""".stripMargin
  ) { (s, dir) =>
    // split once per row (round 14 — the size filter and the slice each
    // re-split the text when inlined)
    val p = Tables.computeParallel(docs(s, dir))
      .select(col("doc_id"), split(col("text"), " ").as("w0"))
      .where(size(col("w0")) >= 8)
      .select(col("doc_id"), slice(col("w0"), 1, 8).as("w"))
    val keys = p.select(col("doc_id"),
      explode(expr(
        "transform(sequence(0, 7), k -> md5(array_join(filter(w, (x, i) -> i != k), ' ')))"))
        .as("dk"))
    val cand = keys.as("a")
      .join(keys.as("b"), col("a.dk") === col("b.dk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(p.select(col("doc_id").as("doc_a"), col("w").as("wa")), "doc_a")
      .join(p.select(col("doc_id").as("doc_b"), col("w").as("wb")), "doc_b")
      .withColumn("hd", expr(
        "aggregate(zip_with(wa, wb, (x, y) -> if(x = y, 0, 1)), 0, (acc, v) -> acc + v)")
        .cast("long"))
      .where(col("hd") <= 1)
      .select("doc_a", "doc_b", "hd")
      .orderBy("doc_a", "doc_b")
  }

  /** Cluster-safe train/val/test split ASSIGNMENT — the fix for what x55
    * audits. x55 shows that a per-document hash split leaks: near-dup
    * pairs straddle the boundary, so eval measures memorization. The safe
    * rule (the Pile/C4 discipline): hash the DUPLICATE-CLUSTER
    * representative, not the document — every x31 component travels
    * wholesale to one split (singletons hash their own id). Output is the
    * per-split composition (docs, groups) plus the cross-split candidate-
    * pair count, which is ZERO BY CONSTRUCTION (every LSH candidate
    * pair's endpoints share a component, hence a coin) — and because the
    * ORACLE recomputes components from scratch via the recursive CTE and
    * applies the same rule, a zero in that column is also an end-to-end
    * proof that the engine's LS/SS labels agree with true connectivity.
    *
    * Split coin: first 4 md5 hex chars of the group id (the x28/x55
    * idiom) — < 52429 train (~80%), < 58982 val (~10%), else test.
    *
    * Scale shape: rides the MEMOIZED labels (candidate-scale); the
    * assignment is one doc⨝labels equi join (labels ≪ corpus) + a
    * row-local coin; the leakage audit joins the candidate pair list
    * (candidate-scale) to the 2-column assignment twice. Output is 3
    * rows.
    */
  val clusterSafeSplit: Q = Q(
    "x137_cluster_split",
    s"""WITH RECURSIVE pairs AS ($lshPairsSql),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION SELECT doc_b AS a, doc_a AS b FROM pairs),
       |nodes AS (SELECT DISTINCT a AS node FROM edges),
       |reach(node, lbl) AS (
       |  SELECT node, node FROM nodes
       |  UNION
       |  SELECT e.b AS node, r.lbl FROM reach r JOIN edges e ON e.a = r.node),
       |labels AS (SELECT node, min(lbl) AS lbl FROM reach GROUP BY node),
       |asg AS (SELECT d.doc_id, coalesce(l.lbl, d.doc_id) AS grp
       |        FROM documents d LEFT JOIN labels l ON d.doc_id = l.node),
       |parts AS (SELECT doc_id, grp,
       |    CASE WHEN CAST('0x' || substr(md5(CAST(grp AS VARCHAR)),1,4) AS INTEGER) < 52429 THEN 'train'
       |         WHEN CAST('0x' || substr(md5(CAST(grp AS VARCHAR)),1,4) AS INTEGER) < 58982 THEN 'val'
       |         ELSE 'test' END AS part FROM asg),
       |leak AS (SELECT pa.part AS part, count(*) AS leaked
       |         FROM pairs p JOIN parts pa ON p.doc_a = pa.doc_id
       |                      JOIN parts pb ON p.doc_b = pb.doc_id
       |         WHERE pa.part <> pb.part GROUP BY 1)
       |SELECT p.part AS part, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(count(DISTINCT grp) AS BIGINT) AS n_groups,
       |       CAST(coalesce(min(leaked), 0) AS BIGINT) AS leaked_pairs
       |FROM parts p LEFT JOIN leak ON p.part = leak.part
       |GROUP BY p.part ORDER BY part""".stripMargin
  ) { (s, dir) =>
    val lbls = clusterLabels(s, dir)
      .select(col("node").as("doc_id"), col("lbl"))
    val coin = conv(substring(md5(col("grp").cast("string")), 1, 4), 16, 10).cast("int")
    val parts = docs(s, dir).select("doc_id")
      .join(lbls, Seq("doc_id"), "left")
      .withColumn("grp", coalesce(col("lbl"), col("doc_id")))
      .withColumn("part",
        when(coin < 52429, "train").when(coin < 58982, "val").otherwise("test"))
    val pairs = lshCandidatePairs(s, dir)
    val leak = pairs
      .join(parts.select(col("doc_id").as("doc_a"), col("part").as("part_a")), "doc_a")
      .join(parts.select(col("doc_id").as("doc_b"), col("part").as("part_b")), "doc_b")
      .where(col("part_a") =!= col("part_b"))
      .groupBy(col("part_a").as("part")).agg(count(lit(1)).as("leaked"))
    parts.groupBy("part")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("grp")).as("n_groups"))
      .join(leak, Seq("part"), "left")
      .select(col("part"), col("n_docs"), col("n_groups"),
        coalesce(col("leaked"), lit(0L)).as("leaked_pairs"))
      .orderBy("part")
  }

  /** Documents per unit of x139's audit-sample modulus: S = max(1,
    * n_docs div AuditDocBudget). The gate corpora (500–5,000 docs) get
    * S = 1 — sample = population, full-universe oracle equality — while
    * sf1/sf10 (50k/500k docs) audit a 1/2 / 1/25 hash-stratum. Chosen so
    * every driver-verified scale keeps the exact proof and every bench
    * decade bounds the audit's exchange near the budget. */
  private[graft] val AuditDocBudget = 20000L

  /** x139's (source, sh) shingle MULTISET — the sketch consumes this
    * directly (min over a multiset = min over its set), so the corpus-
    * sized DISTINCT exists only on the sampled audit path. */
  private def sourceShingles(s: SparkSession, dir: String): DataFrame =
    cachedShingles(s, dir)
      .join(docs(s, dir).select("doc_id", "source"), "doc_id")
      .select("source", "sh")

  /** x139 sketch path, factored for DedupDiag stage attribution (r9
    * verdict item 5): one bounded hash aggregate — 12 longs per source on
    * every map task, mergeable across shards. */
  private[graft] def diagSourceSig(s: SparkSession, dir: String): DataFrame = {
    val h = expr(s"cast(conv(substring(sh, 1, 15), 16, 10) as bigint) % $MinhashP")
    val minCols = (0 to 11).map(j =>
      min((lit(minhashA(j)) * col("h") + lit(minhashB(j))) % MinhashP).as(s"mh$j"))
    sourceShingles(s, dir).withColumn("h", h).groupBy("source")
      .agg(minCols.head, minCols.tail: _*)
  }

  /** x139 audit path: the sampled DISTINCT (source, sh) set — the
    * md5-coin stratum of the scaladoc's sample-side contract. The coin
    * re-hashes sh (md5 of the md5-prefix string), independent of the
    * minhash family's h, and the modulus S broadcasts as a 1-row dim. */
  private[graft] def diagSourceAuditSet(s: SparkSession, dir: String): DataFrame = {
    val sFrame = docs(s, dir)
      .agg(greatest(lit(1L), expr(s"count(1) div $AuditDocBudget")).as("_s"))
    sourceShingles(s, dir).crossJoin(broadcast(sFrame))
      .where(expr("cast(conv(substring(md5(sh), 1, 15), 16, 10) as bigint) % _s = 0"))
      .select("source", "sh").distinct()
  }

  /** Source-level MinHash similarity matrix with its own error audit —
    * the sketch member of the source-affinity trio (x36 = verbatim digest
    * overlap, x131 = feature-hashed centroid cosine, x139 = set-resemblance
    * ESTIMATE from mergeable union sketches). The load-bearing property is
    * Broder's: min over a union is the min of mins, so a SOURCE's
    * 12-component signature comes out of the same bounded hash aggregate a
    * document's does — per-source state is 12 longs regardless of corpus
    * size, signatures are mergeable across shards/days (the incremental-
    * ingest story x80 tells for pairs), and the |sources|² comparison is
    * a ~190-row broadcast theta join of constant-width rows. That sketch
    * path is the 100 TB production plan.
    *
    * The EXACT source-pair Jaccard rides along as the error audit (the
    * x113 discipline at source granularity): a shingle-keyed self-join of
    * the per-source distinct shingle sets — per-shingle fan-out bounded by
    * #sources², the x36 shape — whose cost is the reason the sketch path
    * exists; shipping both in one result makes the oracle itself measure
    * the estimator's error (err_ppm), per pair, every round. Reuses the
    * memoized x107 shingle index and the x02 Carter-Wegman family —
    * identical constants inlined into both engines.
    *
    * SAMPLE-SIDE AUDIT CONTRACT (r10, the x132 pattern — r9 verdict item
    * 4): the audit legs (distinct build, per-source counts, intersection
    * self-join) read only a deterministic md5-coin stratum of the shingle
    * universe, `md5coin(sh) % S == 0` with `S = max(1, n_docs div
    * [[AuditDocBudget]])` — computable identically in both engines (the
    * corpus row count is the one scalar input). At the correctness-gate
    * scales S = 1, so the sample IS the population and the oracle
    * equality stays a full-universe proof; at 100× the audit's exchanges
    * shrink by ~S while exact_ppm becomes the exact Jaccard OF THE
    * SAMPLED UNIVERSE — an unbiased estimate of the full resemblance
    * (hash-uniform universe sampling), which is precisely what an
    * estimator-error audit needs. The coin hashes md5(sh) — a SECOND
    * md5, independent of the minhash family's input h = int(sh[0:15]) —
    * so the stratum is uncorrelated with the sketch's minima. The sketch
    * path itself now consumes the raw (source, sh) MULTISET (min is
    * duplicate-insensitive), dropping the corpus-sized DISTINCT it never
    * needed: per-source partial state is 12 longs on every map task at
    * any scale. DedupDiag times the two paths separately (r9 item 5).
    */
  val sourceMinhash: Q = {
    val aggSql = (0 to 11).map(j =>
      s"min((${minhashA(j)} * h + ${minhashB(j)}) % $MinhashP) AS mh$j").mkString(", ")
    val agreeSql = (0 to 11).map(j =>
      s"(CASE WHEN a.mh$j = b.mh$j THEN 1 ELSE 0 END)").mkString(" + ")
    Q(
      "x139_source_minhash",
      s"""WITH sshm AS (
         |    SELECT source, substr(md5(raw), 1, 16) AS sh FROM (
         |      SELECT source,
         |        unnest(list_transform(generate_series(1, greatest(len(string_split(text,' '))-2, 0)),
         |               i -> concat_ws(' ', string_split(text,' ')[i], string_split(text,' ')[i+1], string_split(text,' ')[i+2]))) AS raw
         |      FROM documents)),
         |h AS (SELECT source, CAST('0x' || substr(sh, 1, 15) AS BIGINT) % $MinhashP AS h FROM sshm),
         |sig AS (SELECT source, $aggSql FROM h GROUP BY source),
         |smp AS (SELECT greatest(1, count(*) // $AuditDocBudget) AS s FROM documents),
         |ssh AS (SELECT DISTINCT source, sh FROM sshm, smp
         |        WHERE CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) % s = 0),
         |cnt AS (SELECT source, count(*) AS n FROM ssh GROUP BY source),
         |inter AS (SELECT a.source AS sa, b.source AS sb, count(*) AS i
         |          FROM ssh a JOIN ssh b ON a.sh = b.sh AND a.source < b.source
         |          GROUP BY 1, 2),
         |est AS (SELECT a.source AS sa, b.source AS sb, $agreeSql AS agree
         |        FROM sig a JOIN sig b ON a.source < b.source)
         |SELECT e.sa AS source_a, e.sb AS source_b,
         |       CAST(e.agree * 1000000 // 12 AS BIGINT) AS est_ppm,
         |       CAST(CAST(coalesce(i.i, 0) AS HUGEINT) * 1000000 // (ca.n + cb.n - coalesce(i.i, 0)) AS BIGINT) AS exact_ppm,
         |       CAST(e.agree * 1000000 // 12
         |            - CAST(coalesce(i.i, 0) AS HUGEINT) * 1000000 // (ca.n + cb.n - coalesce(i.i, 0)) AS BIGINT) AS err_ppm
         |FROM est e
         |LEFT JOIN inter i ON e.sa = i.sa AND e.sb = i.sb
         |JOIN cnt ca ON e.sa = ca.source JOIN cnt cb ON e.sb = cb.source
         |ORDER BY source_a, source_b""".stripMargin
    ) { (s, dir) =>
      val sig = diagSourceSig(s, dir)
      val ssh = diagSourceAuditSet(s, dir)
      val cnt = ssh.groupBy("source").agg(count(lit(1)).as("n"))
      val inter = ssh.as("a")
        .join(ssh.as("b"), col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("sa"), col("b.source").as("sb"))
        .agg(count(lit(1)).as("i"))
      val agree = (0 to 11).map(j =>
        when(col(s"a.mh$j") === col(s"b.mh$j"), 1).otherwise(0)).reduce(_ + _)
      val est = sig.as("a")
        .join(broadcast(sig.as("b")), col("a.source") < col("b.source"))
        .select(col("a.source").as("sa"), col("b.source").as("sb"), agree.as("agree"))
      est
        .join(inter, Seq("sa", "sb"), "left")
        .join(broadcast(cnt.select(col("source").as("sa"), col("n").as("na"))), "sa")
        .join(broadcast(cnt.select(col("source").as("sb"), col("n").as("nb"))), "sb")
        .select(col("sa").as("source_a"), col("sb").as("source_b"),
          expr("agree * 1000000 div 12").as("est_ppm"),
          // intersection counts widen before the x1e6 (the x125 lesson;
          // HUGEINT on the DuckDB side -- its DECIMAL // rounds)
          expr("cast(cast(coalesce(i, 0) as decimal(38,0)) * 1000000 div (na + nb - coalesce(i, 0)) as bigint)")
            .as("exact_ppm"),
          expr("agree * 1000000 div 12 - cast(cast(coalesce(i, 0) as decimal(38,0)) * 1000000 div (na + nb - coalesce(i, 0)) as bigint)")
            .as("err_ppm"))
        .orderBy("source_a", "source_b")
    }
  }

  /** Mergeable per-source HLL registers + union audit — the
    * distinct-COUNTING analogue of x139's Broder union property: each
    * source carries 32 max-registers (Flajolet/Fusy/Gandouet/Meunier,
    * "HyperLogLog", AofA 2007) over its shingle-digest set, and the
    * corpus-wide ALL row is produced by MERGING the per-source registers
    * with max — never by re-scanning shingles — which is exactly how
    * 1000 executors (or 1000 daily shards) combine their sketches.
    * Where x139 estimates pairwise source Jaccard from min-signatures,
    * this estimates per-source and corpus distinct-shingle cardinality
    * from the same digest lineage. No extra hash is paid: bucket = hex
    * chars 14-15 of the shingle digest mod 32, ρ = leading-zero bits of
    * the 52-bit hex 1-13 prefix + 1, derived with string ops only (no
    * log2/bit_length, so both engines agree bit-for-bit). The estimator
    * is the raw harmonic mean with α₃₂·m² = 0.697·1024, and Σ 2^(−M_b)
    * is carried as the exact INTEGER Σ 2^(53−M_b) (32 terms ≤ 2^53 each,
    * < 2^59 total), so the only float ops are one literal multiply and
    * one divide in fixed order. Small-range linear counting is
    * deliberately NOT applied (ln is banned under §7.5); `zero_buckets`
    * is emitted so a consumer can — at corpus scale every bucket is hit.
    *
    * SAMPLE-SIDE AUDIT CONTRACT (r11, the x139/x132 pattern — r10 verdict
    * item 2): the exact count(DISTINCT) audit legs read only x139's
    * deterministic md5-coin shingle stratum (`md5coin(sh) % S == 0`,
    * S = max(1, n_docs div [[AuditDocBudget]]) — the SAME
    * [[diagSourceAuditSet]] frame, so in-suite the two audits share one
    * exchange) and report `n_distinct` as the Horvitz–Thompson scale-up
    * `S × |stratum|`. The coin is a function of the shingle itself, so
    * each DISTINCT shingle is in or out with probability 1/S — the
    * scale-up is an unbiased estimate of the true distinct count, which
    * is exactly what an estimator-error audit compares against. At every
    * correctness-gate scale S = 1: the stratum IS the population,
    * `n_distinct` is exact, and the oracle hash is unchanged from r10.
    * `n_shingles` (instance count, no DISTINCT) stays exact at all
    * scales — it is a plain per-source sum, partial-aggregated to one
    * row per source per map task.
    *
    * Scale shape (r11): registers come from ONE (source, bucket)
    * max-aggregate DIRECTLY over the memoized shingle multiset (max is
    * duplicate-insensitive, the same reason x139's sketch skips the
    * DISTINCT) — partial aggregation collapses every map task to ≤ 32
    * rows per source and the exchange carries register rows, never
    * shingles; the corpus-sized DISTINCT now exists only on the sampled
    * audit path. The ALL row is a 32-row roll-up.
    */
  val hllUnion: Q = Q(
    "x142_hll_union",
    s"""WITH sshm AS (
      |    SELECT source, sh FROM (
      |      SELECT DISTINCT doc_id, source, substr(md5(raw), 1, 16) AS sh FROM (
      |        SELECT doc_id, source,
      |          unnest(list_transform(generate_series(1, greatest(len(string_split(text,' '))-2, 0)),
      |                 i -> concat_ws(' ', string_split(text,' ')[i], string_split(text,' ')[i+1], string_split(text,' ')[i+2]))) AS raw
      |        FROM documents))),
      |r AS (SELECT source,
      |        CAST('0x' || substr(sh, 14, 2) AS INTEGER) % 32 AS b,
      |        substr(sh, 1, 13) AS ws
      |      FROM sshm),
      |rho AS (SELECT source, b,
      |          CASE WHEN length(regexp_extract(ws, '^0*')) = 13 THEN 53
      |               ELSE 4 * length(regexp_extract(ws, '^0*'))
      |                    + (CASE substr(ws, length(regexp_extract(ws, '^0*')) + 1, 1)
      |                         WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
      |                         WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
      |                         WHEN '7' THEN 1 ELSE 0 END) + 1 END AS rho
      |        FROM r),
      |reg AS (SELECT source, b, max(rho) AS mreg FROM rho GROUP BY source, b),
      |regall AS (SELECT 'ALL' AS source, b, max(mreg) AS mreg FROM reg GROUP BY b),
      |sums AS (SELECT source,
      |           sum(CAST(1 AS BIGINT) << (53 - mreg))
      |             + (32 - count(*)) * (CAST(1 AS BIGINT) << 53) AS intsum,
      |           CAST(32 - count(*) AS BIGINT) AS zero_buckets
      |         FROM (SELECT * FROM reg UNION ALL SELECT * FROM regall)
      |         GROUP BY source),
      |smp AS (SELECT greatest(1, count(*) // $AuditDocBudget) AS s FROM documents),
      |strat AS (SELECT DISTINCT source, sh FROM sshm, smp
      |          WHERE CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) % s = 0),
      |exn AS (SELECT source, count(*) AS n_shingles FROM sshm GROUP BY source
      |        UNION ALL SELECT 'ALL', count(*) FROM sshm),
      |exd AS (SELECT source, count(*) AS sd FROM strat GROUP BY source
      |        UNION ALL SELECT 'ALL', count(DISTINCT sh) FROM strat),
      |ex AS (SELECT n.source, n.n_shingles, d.sd * (SELECT s FROM smp) AS n_distinct
      |       FROM exn n LEFT JOIN exd d ON n.source = d.source)
      |SELECT s.source, CAST(e.n_shingles AS BIGINT) AS n_shingles,
      |       CAST(e.n_distinct AS BIGINT) AS n_distinct, s.zero_buckets,
      |       round(713.728::DOUBLE * 9007199254740992.0::DOUBLE / CAST(s.intsum AS DOUBLE), 2) AS hll_est,
      |       round((713.728::DOUBLE * 9007199254740992.0::DOUBLE / CAST(s.intsum AS DOUBLE) - e.n_distinct)
      |             * 1000000.0::DOUBLE / e.n_distinct, 2) AS err_ppm
      |FROM sums s JOIN ex e ON s.source = e.source
      |ORDER BY s.source""".stripMargin
  ) { (s, dir) =>
    val sums = hllRegisterSums(s, dir)
    val ss = sourceShingles(s, dir)
    // exact instance counts: no DISTINCT, partial-aggregated — cheap at any scale
    val exn = ss.groupBy("source").agg(count(lit(1)).as("n_shingles"))
      .unionByName(ss.agg(count(lit(1)).as("n_shingles"))
        .select(lit("ALL").as("source"), col("n_shingles")))
    // sampled audit: x139's md5-coin stratum (shared frame → shared
    // exchange in-suite), Horvitz–Thompson scaled by S (1-row broadcast)
    val sFrame = docs(s, dir)
      .agg(greatest(lit(1L), expr(s"count(1) div $AuditDocBudget")).as("_s"))
    val audit = diagSourceAuditSet(s, dir)
    val exd = audit.groupBy("source").agg(count(lit(1)).as("sd"))
      .unionByName(audit.agg(countDistinct(col("sh")).as("sd"))
        .select(lit("ALL").as("source"), col("sd")))
      .crossJoin(broadcast(sFrame))
      .select(col("source"), (col("sd") * col("_s")).as("n_distinct"))
    val ex = exn.join(exd, Seq("source"), "left")
    val raw = lit(713.728) * lit(9007199254740992.0) / col("intsum").cast("double")
    sums.join(ex, "source")
      .select(col("source"), col("n_shingles"), col("n_distinct"), col("zero_buckets"),
        round(raw, 2).as("hll_est"),
        round((raw - col("n_distinct")) * lit(1000000.0) / col("n_distinct"), 2)
          .as("err_ppm"))
      .orderBy("source")
  }

  /** x142's SKETCH path, factored for DedupDiag stage attribution (the
    * x139 precedent): per-source 32 max-registers → harmonic integer sums,
    * including the union-by-max ALL row. 21 rows out at the test corpus,
    * ≤ |sources|+1 anywhere. r11: rides the (source, sh) MULTISET directly
    * (max over a multiset = max over its set — the x139 sketch argument),
    * so the production path pays NO corpus-sized DISTINCT exchange: every
    * map task partial-aggregates to ≤ 32 register rows per source.
    */
  private[graft] def hllRegisterSums(s: SparkSession, dir: String): DataFrame = {
    val rho = sourceShingles(s, dir).select(col("source"),
        expr("cast(conv(substring(sh, 14, 2), 16, 10) as int) % 32").as("b"),
        substring(col("sh"), 1, 13).as("ws"))
      .select(col("source"), col("b"),
        expr("""CASE WHEN length(regexp_extract(ws, '^0*', 0)) = 13 THEN 53
               |     ELSE 4 * length(regexp_extract(ws, '^0*', 0))
               |          + (CASE substring(ws, length(regexp_extract(ws, '^0*', 0)) + 1, 1)
               |               WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
               |               WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
               |               WHEN '7' THEN 1 ELSE 0 END) + 1 END""".stripMargin).as("rho"))
    val reg = rho.groupBy("source", "b").agg(max("rho").as("mreg"))
    // union-by-max: the corpus sketch is a MERGE of the per-source sketches
    val regAll = reg.groupBy("b").agg(max("mreg").as("mreg"))
      .select(lit("ALL").as("source"), col("b"), col("mreg"))
    reg.unionByName(regAll)
      .groupBy("source")
      .agg(
        (sum(expr("shiftleft(cast(1 as bigint), cast(53 - mreg as int))"))
          + (lit(32L) - count(lit(1))) * expr("shiftleft(cast(1 as bigint), 53)"))
          .as("intsum"),
        (lit(32L) - count(lit(1))).as("zero_buckets"))
  }

  /** x142's exact-instance-count leg (the only remaining full-scan exact
    * leg after the r11 stratum bound — a plain per-source sum, no
    * DISTINCT), factored for DedupDiag stage attribution. The sampled
    * distinct leg is x139's [[diagSourceAuditSet]], timed there. */
  private[graft] def diagHllExactN(s: SparkSession, dir: String): DataFrame =
    sourceShingles(s, dir).groupBy("source").agg(count(lit(1)).as("n_shingles"))

  /** Crawl-batch novelty curve: split the corpus into 10 ingestion batches
    * (deterministic doc_id ranges — the stand-in for crawl snapshots) and
    * measure, per batch, how much of its shingle mass was NEVER seen in an
    * earlier batch. This is the curve a continuously-crawled corpus is
    * judged by (diminishing novelty ⇒ the next crawl buys fewer new
    * tokens — the data-constrained-scaling question), and the batch-delta
    * analogue of x80's incremental dedup: x80 asks "which NEW docs
    * duplicate the index", this asks "how much of each batch's CONTENT is
    * index-new". A shingle instance here is a distinct (doc, shingle)
    * presence from the shared [[cachedShingles]] index; it counts as
    * novel iff its shingle's first batch is this batch.
    *
    * Scale shape: rides the memoized shingle index; then two digest-keyed
    * hash aggregates ((sh, batch) counts; per-sh min batch) and one
    * digest equi-join between them — every exchange carries 16-hex
    * digests + small ints, never text, and the output is 10 rows. The
    * novelty ppm widens before the ×1e6 (x125 contract).
    */
  val batchNovelty: Q = Q(
    "x145_batch_novelty",
    s"""WITH sh AS ($shingleSql),
       |n AS (SELECT count(*) AS n_corpus FROM documents),
       |sb AS (SELECT sh.sh, least(9, sh.doc_id * 10 // n.n_corpus) AS batch FROM sh, n),
       |cb AS (SELECT sh, batch, count(*) AS c FROM sb GROUP BY sh, batch),
       |fb AS (SELECT sh, min(batch) AS first_batch FROM cb GROUP BY sh)
       |SELECT CAST(cb.batch AS BIGINT) AS batch,
       |       CAST(sum(c) AS BIGINT) AS n_inst,
       |       CAST(sum(CASE WHEN cb.batch = fb.first_batch THEN c ELSE 0 END) AS BIGINT) AS n_novel,
       |       CAST(CAST(sum(CASE WHEN cb.batch = fb.first_batch THEN c ELSE 0 END) AS HUGEINT)
       |            * 1000000 // sum(c) AS BIGINT) AS novelty_ppm,
       |       CAST(sum(CASE WHEN cb.batch = fb.first_batch THEN 1 ELSE 0 END) AS BIGINT) AS n_new_shingles
       |FROM cb JOIN fb ON cb.sh = fb.sh
       |GROUP BY cb.batch ORDER BY batch""".stripMargin
  ) { (s, dir) =>
    val nDocs = docs(s, dir).agg(count(lit(1)).as("n_corpus"))
    val sb = cachedShingles(s, dir)
      .crossJoin(broadcast(nDocs))
      .select(col("sh"), least(lit(9L), expr("doc_id * 10 div n_corpus")).as("batch"))
    val cb = sb.groupBy("sh", "batch").agg(count(lit(1)).as("c"))
    val fb = cb.groupBy("sh").agg(min(col("batch")).as("first_batch"))
    cb.join(fb, "sh")
      .groupBy("batch")
      .agg(
        sum(col("c")).as("n_inst"),
        sum(when(col("batch") === col("first_batch"), col("c")).otherwise(0L)).as("n_novel"),
        sum(when(col("batch") === col("first_batch"), 1L).otherwise(0L)).as("n_new_shingles"))
      .select(col("batch"), col("n_inst"), col("n_novel"),
        // widen BEFORE the ×1e6 (HUGEINT on the oracle side — x125 contract)
        expr("cast(cast(n_novel as decimal(38,0)) * 1000000 div n_inst as bigint)")
          .as("novelty_ppm"),
        col("n_new_shingles"))
      .orderBy("batch")
  }

  /** WINNOWING fingerprint overlap (Schleimer, Wilkerson & Aiken,
    * SIGMOD'03 — the MOSS plagiarism-detector selection rule): hash every
    * k-gram (k=4 words), slide a w=5 window over the hash sequence, and
    * in each window select the MINIMUM hash, breaking ties by the
    * RIGHTMOST position — the paper's guarantee is that any shared run of
    * ≥ k+w−1 = 8 words between two documents yields at least one shared
    * selected fingerprint, while only ~2/(w+1) of all grams are kept.
    * Pairs sharing ≥ 2 winnowed fingerprints are reported with their
    * overlap count. Differs from x11 (bottom-k global fingerprints — a
    * whole-doc sketch) and x88 (ALL spans): winnowing is the
    * position-local selection that keeps guaranteed substring-match
    * coverage at a fraction of x88's index size.
    *
    * Scale shape: selection is entirely ROW-LOCAL (one pass over the
    * gram-hash array with a w-bounded argmin per position — O(L·w) per
    * row, zero exchange); the only shuffles are the fingerprint
    * aggregate and the bounded pair aggregate. Pair generation rides the
    * x02/x91 discipline: collect the ≤ 64 doc ids per fingerprint
    * (df-capped — a fingerprint in > 64 docs is boilerplate, dropped and
    * declared) and emit C(df,2) pairs row-local, never a fingerprint
    * self-join. Docs shorter than k+w−1 = 8 words carry no full window
    * and are skipped on both engines (the guarantee threshold t is also
    * the minimum match length — shorter docs cannot satisfy it).
    */
  val winnowing: Q = Q(
    "x152_winnowing",
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |           WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 8),
      |h AS (SELECT doc_id, list_transform(generate_series(1, len(w) - 3),
      |        i -> substr(md5(array_to_string(list_slice(w, i, i + 3), ' ')), 1, 16)) AS hs
      |      FROM d),
      |sel AS (SELECT doc_id, hs,
      |          list_distinct(list_transform(generate_series(1, len(hs) - 4),
      |            j -> j + 5 - list_position(list_reverse(list_slice(hs, j, j + 4)),
      |                                       list_min(list_slice(hs, j, j + 4))))) AS ps
      |        FROM h),
      |fp AS (SELECT DISTINCT doc_id, hs[CAST(p AS BIGINT)] AS fph
      |       FROM sel, LATERAL (SELECT unnest(ps) AS p) u),
      |grp AS (SELECT fph FROM fp GROUP BY fph HAVING count(*) BETWEEN 2 AND 64)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
      |FROM fp a JOIN fp b ON a.fph = b.fph AND a.doc_id < b.doc_id
      |     JOIN grp ON grp.fph = a.fph
      |GROUP BY 1, 2 HAVING count(*) >= 2
      |ORDER BY n_shared DESC, doc_a, doc_b""".stripMargin
  ) { (s, dir) =>
    // Round 15 (guide §4): gram hashing + the w-bounded rightmost-argmin
    // selection + the distinct collapse — the whole row-local stage — run
    // as ONE codegen'd pass ([[graft.functions.WinnowFingerprints]]; the
    // HOF formulation allocated two window slices, a reversed copy, and
    // interpreted string comparisons PER WINDOW). The < 8-word size filter
    // is subsumed (empty array ⇒ no rows out of the explode); the
    // isNotNull survives for scan-level pushdown.
    val fps = docs(s, dir)
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        explode(graft.functions.WinnowFingerprintsFunctions
          .winnowFingerprints(col("text"))).as("fph"))
    fps.groupBy("fph")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .where(size(col("ds")).between(2, 64))
      // C(df,2) pairs emitted row-local from the ≤64-wide sorted id list
      .select(explode(flatten(transform(sequence(lit(1), size(col("ds")) - 1), i =>
        transform(sequence(i + 1, size(col("ds"))), j =>
          struct(element_at(col("ds"), i.cast("int")).as("doc_a"),
            element_at(col("ds"), j.cast("int")).as("doc_b")))))).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= 2)
      .orderBy(col("n_shared").desc, col("doc_a"), col("doc_b"))
  }

  /** Per-cluster candidate-EDGE DENSITY — the transitivity-dilution audit
    * x31's connected components needs before anyone deletes by cluster:
    * closure merges through chains, so a cluster can be a CLIQUE of true
    * duplicates (density 1 — delete all but one) or a HAIRBALL chained
    * through weak links (density → 2/m — deleting to one representative
    * destroys non-duplicate documents). density_ppm = e·10⁶ // C(m,2)
    * with e = LSH candidate pairs inside the cluster, plus the exact
    * tree/chain indicator e = m−1 (a closure-merged cluster is a tree
    * exactly when no band ever co-bucketed the far ends).
    *
    * Scale shape: pure RIDER — both inputs are the memoized candidate
    * lineages (pairs cache + converged labels cache; candidate-scale,
    * never corpus-scale), so the marginal cost is two candidate-sized
    * aggregates and one tiny join. Every pair is intra-cluster by
    * construction (an edge merged its endpoints), so e comes from
    * labeling doc_a alone.
    */
  val clusterDensity: Q = Q(
    "x156_cluster_density",
    s"""WITH RECURSIVE pairs AS ($lshPairsSql),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |          UNION SELECT doc_b AS a, doc_a AS b FROM pairs),
       |nodes AS (SELECT DISTINCT a AS node FROM edges),
       |reach(node, lbl) AS (
       |  SELECT node, node FROM nodes
       |  UNION
       |  SELECT e.b AS node, r.lbl FROM reach r JOIN edges e ON e.a = r.node),
       |labels AS (SELECT node, min(lbl) AS lbl FROM reach GROUP BY node),
       |m AS (SELECT lbl, count(*) AS m FROM labels GROUP BY lbl),
       |e AS (SELECT l.lbl, count(*) AS e FROM pairs p JOIN labels l ON l.node = p.doc_a
       |      GROUP BY l.lbl)
       |SELECT CAST(m.lbl AS BIGINT) AS cluster, CAST(m.m AS BIGINT) AS m,
       |       CAST(e.e AS BIGINT) AS n_edges,
       |       CAST(e.e * 1000000 // (m.m * (m.m - 1) // 2) AS BIGINT) AS density_ppm,
       |       CAST(CASE WHEN e.e = m.m - 1 THEN 1 ELSE 0 END AS INTEGER) AS is_tree
       |FROM m JOIN e ON e.lbl = m.lbl ORDER BY cluster""".stripMargin
  ) { (s, dir) =>
    val labels = clusterLabels(s, dir)
    val pairs  = lshCandidatePairs(s, dir)
    val m = labels.groupBy("lbl").agg(count(lit(1)).as("m"))
    val e = pairs.join(labels.select(col("node").as("doc_a"), col("lbl")), "doc_a")
      .groupBy("lbl").agg(count(lit(1)).as("e"))
    m.join(e, "lbl")
      .select(col("lbl").cast("long").as("cluster"), col("m"),
        col("e").as("n_edges"),
        expr("cast(e * 1000000 div (m * (m - 1) div 2) as bigint)").as("density_ppm"),
        when(col("e") === col("m") - 1, 1).otherwise(0).cast("int").as("is_tree"))
      .orderBy("cluster")
  }

  /** Dedup THRESHOLD-YIELD sweep — pairs and touched documents at five
    * Jaccard cutoffs in one pass, the sensitivity curve an operator reads
    * before picking τ (a yield cliff between 0.5 and 0.6 means the
    * corpus's near-dup mass sits right at the decision boundary and the
    * choice is load-bearing; a flat curve means any τ works). Rides
    * x86's exact-verification lineage (memoized candidate pairs +
    * candidate-only shingle sets — candidate-scale, never corpus-scale);
    * the sweep itself is a 5-way conditional re-aggregation of the same
    * verified pair frame, NOT five recomputations.
    */
  val thresholdSweep: Q = Q(
    "x157_threshold_sweep",
    s"""WITH sh AS ($shingleSql),
       |pairs AS ($lshPairsSql),
       |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS i
       |          FROM pairs p JOIN sh a ON a.doc_id = p.doc_a
       |                       JOIN sh b ON b.doc_id = p.doc_b AND b.sh = a.sh
       |          GROUP BY 1, 2),
       |j AS (SELECT p.doc_a, p.doc_b,
       |        CAST(coalesce(i.i, 0) * 1000000 // (sa.n + sb.n - coalesce(i.i, 0)) AS BIGINT) AS jac
       |      FROM pairs p
       |      JOIN sz sa ON sa.doc_id = p.doc_a
       |      JOIN sz sb ON sb.doc_id = p.doc_b
       |      LEFT JOIN inter i ON i.doc_a = p.doc_a AND i.doc_b = p.doc_b),
       |taus AS (SELECT unnest([500000, 600000, 700000, 800000, 900000]) AS tau_ppm),
       |hits AS (SELECT t.tau_ppm, j.doc_a, j.doc_b FROM j JOIN taus t ON j.jac >= t.tau_ppm)
       |SELECT t.tau_ppm AS tau_ppm,
       |       CAST(coalesce(p.n_pairs, 0) AS BIGINT) AS n_pairs,
       |       CAST(coalesce(d.n_docs, 0) AS BIGINT) AS n_docs
       |FROM taus t
       |LEFT JOIN (SELECT tau_ppm, count(*) AS n_pairs FROM hits GROUP BY 1) p
       |       ON p.tau_ppm = t.tau_ppm
       |LEFT JOIN (SELECT tau_ppm, count(DISTINCT d) AS n_docs
       |           FROM (SELECT tau_ppm, doc_a AS d FROM hits
       |                 UNION ALL SELECT tau_ppm, doc_b AS d FROM hits) u GROUP BY 1) d
       |       ON d.tau_ppm = t.tau_ppm
       |ORDER BY t.tau_ppm""".stripMargin
  ) { (s, dir) =>
    val pairs = lshCandidatePairs(s, dir)
    val sh    = candidateShingles(s, dir)
    val sz    = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(sh.as("a"), col("a.doc_id") === col("doc_a"))
      .join(sh.as("b"), col("b.doc_id") === col("doc_b") && col("b.sh") === col("a.sh"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("i"))
    val j = pairs
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .select(col("doc_a"), col("doc_b"),
        expr("cast(coalesce(i, 0) * 1000000 div (na + nb - coalesce(i, 0)) as bigint)")
          .as("jac"))
    val taus = Seq(500000, 600000, 700000, 800000, 900000)
    val hits = j.withColumn("tau_ppm", explode(array(taus.map(lit): _*)))
      .where(col("jac") >= col("tau_ppm"))
    val p = hits.groupBy("tau_ppm").agg(count(lit(1)).as("n_pairs"))
    val d = hits.select(col("tau_ppm"), explode(array(col("doc_a"), col("doc_b"))).as("d"))
      .groupBy("tau_ppm").agg(countDistinct(col("d")).as("n_docs"))
    val tdf = hits.sparkSession.range(0, taus.length)
      .select(element_at(array(taus.map(lit): _*), col("id").cast("int") + 1).as("tau_ppm"))
    tdf.join(p, Seq("tau_ppm"), "left").join(d, Seq("tau_ppm"), "left")
      .select(col("tau_ppm"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
      .orderBy("tau_ppm")
  }

  /** Cross-source duplicate ATTRIBUTION: every LSH candidate pair labeled
    * with its (source, source) endpoints — which sources duplicate each
    * other, and how much of the candidate mass each source pair carries.
    * The governance view read before dropping or down-weighting a source:
    * a source whose duplicate mass is mostly INTERNAL dedups away cheaply;
    * one entangled with many partners contaminates the others' splits.
    *
    * Scale shape: rides the memoized pair lineage (candidate-scale, the
    * expensive subtree already paid by the x02 family); the only new work
    * is two slim (doc_id, source) probes against the corpus projection and
    * a ≤|sources|² aggregate. share_ppm is each pair group's share of all
    * candidates, exact integer ppm via one broadcast total.
    */
  val crossSourceDups: Q = Q(
    "x162_cross_source_dups",
    s"""WITH pairs AS ($lshPairsSql),
       |ds AS (SELECT doc_id, coalesce(source, '(null)') AS src FROM documents),
       |j AS (SELECT least(a.src, b.src) AS src_lo, greatest(a.src, b.src) AS src_hi, p.n_bands
       |      FROM pairs p JOIN ds a ON a.doc_id = p.doc_a JOIN ds b ON b.doc_id = p.doc_b),
       |g AS (SELECT src_lo, src_hi, count(*) AS n_pairs,
       |             CAST(sum(n_bands) AS BIGINT) AS bands_sum FROM j GROUP BY 1, 2),
       |tot AS (SELECT sum(n_pairs) AS t FROM g)
       |SELECT src_lo, src_hi, n_pairs, bands_sum,
       |       CAST(CAST(n_pairs AS HUGEINT) * 1000000 // t AS BIGINT) AS share_ppm
       |FROM g, tot ORDER BY src_lo, src_hi""".stripMargin
  ) { (s, dir) =>
    // '(null)' sentinel on BOTH engines: least/greatest skip nulls in both,
    // but skipping would silently fold a (null, srcN) pair into (srcN, srcN)
    val ds = docs(s, dir)
      .select(col("doc_id"), coalesce(col("source"), lit("(null)")).as("src"))
    val j = lshCandidatePairs(s, dir)
      .join(ds.select(col("doc_id").as("doc_a"), col("src").as("sa")), "doc_a")
      .join(ds.select(col("doc_id").as("doc_b"), col("src").as("sb")), "doc_b")
      .select(least(col("sa"), col("sb")).as("src_lo"),
        greatest(col("sa"), col("sb")).as("src_hi"), col("n_bands"))
    val g = j.groupBy("src_lo", "src_hi")
      .agg(count(lit(1)).as("n_pairs"), sum("n_bands").as("bands_sum"))
    g.crossJoin(broadcast(g.agg(sum("n_pairs").as("t"))))
      .select(col("src_lo"), col("src_hi"), col("n_pairs"), col("bands_sum"),
        expr("cast(cast(n_pairs as decimal(38,0)) * 1000000 div t as bigint)").as("share_ppm"))
      .orderBy("src_lo", "src_hi")
  }

  /** Dedup SURVIVORSHIP audit: what does exact dedup DELETE, per source —
    * kept/removed document counts and character mass under x01's rule
    * (first doc_id per md5(text) survives), with removed shares in exact
    * ppm. The distribution-shift check an operator reads before committing
    * a dedup pass: a source losing 40% of its documents but 90% of its
    * characters is shedding its long tail, not its boilerplate.
    *
    * Same single digest-keyed window shuffle as x01 — the shuffle moves
    * (source, doc_id, digest, n_chars), never the text bytes.
    */
  val dedupImpact: Q = Q(
    "x164_dedup_impact",
    """WITH r AS (SELECT source, n_chars,
      |             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |           FROM documents)
      |SELECT source,
      |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
      |  CAST(sum(CASE WHEN rn = 1 THEN coalesce(n_chars, 0) ELSE 0 END) AS BIGINT) AS kept_chars,
      |  CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE coalesce(n_chars, 0) END) AS BIGINT) AS removed_chars,
      |  CAST(CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS HUGEINT) * 1000000 // count(*) AS BIGINT) AS removed_doc_ppm,
      |  CAST(CASE WHEN sum(coalesce(n_chars, 0)) = 0 THEN 0
      |       ELSE CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE coalesce(n_chars, 0) END) AS HUGEINT) * 1000000
      |            // sum(coalesce(n_chars, 0)) END AS BIGINT) AS removed_char_ppm
      |FROM r GROUP BY source ORDER BY source NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy(col("digest")).orderBy("doc_id")
    docs(s, dir)
      .select(col("source"), col("doc_id"), coalesce(col("n_chars"), lit(0L)).as("nc"),
        md5(col("text")).as("digest"))
      .withColumn("rn", row_number().over(w))
      .groupBy("source")
      .agg(
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rn") === 1, 0L).otherwise(1L)).as("n_removed"),
        sum(when(col("rn") === 1, col("nc")).otherwise(0L)).as("kept_chars"),
        sum(when(col("rn") === 1, 0L).otherwise(col("nc"))).as("removed_chars"),
        count(lit(1)).as("n_docs"))
      .select(col("source"), col("n_kept"), col("n_removed"), col("kept_chars"),
        col("removed_chars"),
        expr("cast(cast(n_removed as decimal(38,0)) * 1000000 div n_docs as bigint)")
          .as("removed_doc_ppm"),
        expr("""cast(case when kept_chars + removed_chars = 0 then 0
               |else cast(removed_chars as decimal(38,0)) * 1000000
               |     div (kept_chars + removed_chars) end as bigint)""".stripMargin)
          .as("removed_char_ppm"))
      .orderBy("source")
  }

  /** Duplicated-shingle TOKEN share per source (Lee et al.'s duplicate-
    * token-rate lens, NAACL'22): of each source's shingle instances, the
    * fraction whose shingle occurs in more than one place corpus-wide —
    * the internal-duplication level that predicts how much a dedup pass
    * will shrink the source, readable BEFORE running the pair join.
    *
    * Scale shape: rides the memoized corpus shingle index (the x107
    * family's cache); the df annotation is one map-side-combinable
    * aggregate plus one digest-keyed re-join — both linear, both keyed on
    * 16-hex digests, never raw trigram text.
    */
  val dupTokenShare: Q = Q(
    "x165_dup_token_share",
    s"""WITH sh AS ($shingleSql),
       |df AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh),
       |j AS (SELECT d.source, s.sh, f.df
       |      FROM sh s JOIN df f ON f.sh = s.sh JOIN documents d ON d.doc_id = s.doc_id)
       |SELECT source, count(*) AS n_inst,
       |  CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_inst,
       |  CAST(count(DISTINCT sh) AS BIGINT) AS n_distinct,
       |  CAST(CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS HUGEINT) * 1000000
       |       // count(*) AS BIGINT) AS dup_share_ppm
       |FROM j GROUP BY source ORDER BY source NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    val sh = cachedShingles(s, dir)
    val df = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    sh.join(df, "sh")
      .join(docs(s, dir).select(col("doc_id"), col("source")), "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_inst"),
        sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_dup_inst"),
        countDistinct(col("sh")).as("n_distinct"))
      .select(col("source"), col("n_inst"), col("n_dup_inst"), col("n_distinct"),
        expr("cast(cast(n_dup_inst as decimal(38,0)) * 1000000 div n_inst as bigint)")
          .as("dup_share_ppm"))
      .orderBy("source")
  }

  /** Per-doc EXCISED word count under the span-removal rule (docs with at
    * least one duplicated span only — readers left-join and coalesce 0).
    * Factored so the QueriesSpec cross-checks can reach doc granularity:
    * a doc appears here ⟺ x88 reports n_dup > 0 for it (same df ≥ 2
    * distinct-docs 5-gram rule), and an exact-duplicate doc (x164's
    * removed class, ≥ 5 words) must be FULLY excised.
    */
  private[graft] def spanCutWords(s: SparkSession, dir: String): DataFrame = {
    val pos = spanPositions(s, dir)
    // same df rule as x88: duplicated ⟺ the 5-gram occurs in ≥ 2 docs
    val df = pos.groupBy("g").agg(countDistinct(col("doc_id")).as("df"))
    // corpus-cardinality frequency table — never broadcast (the x88
    // lesson); df is already hash-partitioned on g from its groupBy
    val dup = pos.join(df.hint("shuffle_hash"), "g")
      .where(col("df") >= 2)
      .select(col("doc_id"), col("p"))
    // interval union by explosion: position p covers words p..p+4 (always
    // in-range — a position only exists where the full 5-gram fits), so
    // distinct (doc_id, word-index) counts the union exactly. The ×5
    // fan-out is dup-position-scale, 16 bytes a row, digests-and-ints only.
    dup
      .select(col("doc_id"), explode(sequence(col("p"), col("p") + 4)).as("wi"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("cut_words"))
  }

  /** Span-REMOVAL transform accounting (the actionable end of x88's
    * profile — Lee et al., *Deduplicating Training Data Makes Language
    * Models Better*, ACL 2022: EXCISE every word 5-gram span that occurs
    * in ≥ 2 documents, keep the rest of the document). x88 measures the
    * duplicated-span fraction; this emits what a span-excision pass DOES
    * to the corpus, reconstruction-accounted per source like x125:
    * docs touched, docs fully emptied, excised vs kept word mass, kept
    * ppm (exact integer arithmetic, widened before the ×1e6 — the x125
    * overflow contract).
    *
    * A word is excised when ANY duplicated 5-gram covers it; covered
    * intervals [p, p+4] are unioned exactly via the distinct word-index
    * explosion in [[spanCutWords]]. Exact-duplicate documents (x164's
    * removed class) are fully emptied by construction — every 5-gram has
    * a cross-doc twin — which the spec asserts against x164's digest rule.
    *
    * Scale shape: rides the memoized x88 positional-span stream (digested
    * row-locally — the corpus text is NEVER shuffled); the df table and
    * the mark-back join are digest-keyed like x88; the coverage explosion
    * is dup-position-bounded; per-doc word counts come from a row-local
    * scan projection and join the cut counts on doc_id carrying ints
    * only. Same plan at 1000 executors.
    */
  val spanExcise: Q = Q(
    "x166_span_excise",
    """WITH d AS (SELECT doc_id, source, len(string_split(text, ' ')) AS n
      |           FROM documents WHERE text IS NOT NULL),
      |pos AS (
      |  SELECT doc_id, i AS p,
      |         substr(md5(array_to_string(list_slice(w, i, i+4), ' ')), 1, 16) AS g
      |  FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents),
      |       LATERAL (SELECT unnest(generate_series(1, len(w)-4)) AS i) s),
      |df AS (SELECT g FROM pos GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
      |cov AS (SELECT DISTINCT doc_id, p + k AS wi
      |        FROM (SELECT doc_id, p FROM pos JOIN df USING (g)) dup,
      |             LATERAL (SELECT unnest(generate_series(0, 4)) AS k) kk),
      |cut AS (SELECT doc_id, count(*) AS cw FROM cov GROUP BY doc_id)
      |SELECT source,
      |       count(*) AS n_docs,
      |       CAST(sum(CASE WHEN cw IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS docs_touched,
      |       CAST(sum(CASE WHEN cw = n THEN 1 ELSE 0 END) AS BIGINT) AS docs_emptied,
      |       CAST(sum(n) AS BIGINT) AS total_words,
      |       CAST(sum(coalesce(cw, 0)) AS BIGINT) AS excised_words,
      |       CAST(sum(n) - sum(coalesce(cw, 0)) AS BIGINT) AS kept_words,
      |       CAST(CAST(sum(n) - sum(coalesce(cw, 0)) AS HUGEINT) * 1000000
      |            // sum(n) AS BIGINT) AS kept_ppm
      |FROM d LEFT JOIN cut USING (doc_id)
      |GROUP BY source ORDER BY source NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    val meta = docs(s, dir).where(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n"))
    meta.join(spanCutWords(s, dir), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("cut_words").isNotNull, 1L).otherwise(0L)).as("docs_touched"),
        sum(when(col("cut_words") === col("n"), 1L).otherwise(0L)).as("docs_emptied"),
        sum(col("n")).as("total_words"),
        sum(coalesce(col("cut_words"), lit(0L))).as("excised_words"))
      .withColumn("kept_words", col("total_words") - col("excised_words"))
      .withColumn("kept_ppm",
        // widen before the ×1e6 (the x125 contract: int64 wraps past
        // ~9.2e12 kept words per source)
        expr("cast(cast(kept_words as decimal(38,0)) * 1000000 div total_words as bigint)"))
      .select("source", "n_docs", "docs_touched", "docs_emptied",
        "total_words", "excised_words", "kept_words", "kept_ppm")
      .orderBy("source")
  }

  val all: Seq[Q] =
    Seq(exactDedup, minhashLsh, simhash, ngramJaccard, dupClusters, pagerank, splitLeakage,
      canonicalPick, curationPipeline, triangleCount, incrementalDedup, lshVerify,
      spanDedup, simhashBands, fuzzyPrefixJoin, prefixAllpairs, sortedNeighborhood,
      labelProp, minhashError, tombstonePropagate, nearDupContamination, containmentJoin,
      clusterSafeSplit, sourceMinhash, hllUnion, batchNovelty, winnowing,
      clusterDensity, thresholdSweep, crossSourceDups, dedupImpact, dupTokenShare,
      spanExcise)
}
