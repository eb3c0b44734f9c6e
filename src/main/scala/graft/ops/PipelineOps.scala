package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline pack 2 (builder mandate: "the operations a
  * large-scale training-data pipeline would need", beyond the x01-x13
  * dedup/similarity/text/multimodal packs): corpus-level chunk dedup stats,
  * in-document repetition scoring (the Gopher-style quality signal),
  * benchmark-contamination detection, deterministic hash sampling,
  * greedy sequence packing, and stratified per-source selection.
  *
  * Scale notes (100 TB):
  *  - Everything per-document (x26, x28) is a single codegen'd projection —
  *    no shuffle at all beyond the final aggregate/sort.
  *  - Chunk/gram sets (x25, x27) are digest-keyed BEFORE any exchange, so
  *    shuffles move 16-byte hashes, never raw text (the x01/x02 rule).
  *  - The contamination check (x27) broadcasts the BENCHMARK gram set — the
  *    eval suite is tiny next to the corpus, so the 100 TB side is never
  *    shuffled: scan → hash → broadcast-hash-join, the same shape used in
  *    production decontamination passes.
  *  - Sequence packing (x29) is one hash exchange on `source` + an
  *    in-partition running sum — the grouping key is the pack-stream
  *    identity, so bins never cross executors.
  */
object PipelineOps {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  /** Chunk-level dedup stats (CCNet-style paragraph dedup, adapted to the
    * corpus's single-line documents): non-overlapping 8-word chunks, hashed,
    * duplication counted per source. At scale: one exchange of md5 digests.
    */
  val chunkDedup: Q = Q(
    "x25_chunk_dedup",
    """WITH chunks AS (
      |  SELECT source, md5(array_to_string(list_slice(w, 8*i+1, 8*i+8), ' ')) AS ch
      |  FROM (SELECT source, string_split(text,' ') AS w FROM documents),
      |       LATERAL (SELECT unnest(generate_series(0, CAST(len(w)//8 AS BIGINT) - 1)) AS i) g)
      |SELECT source, count(*) AS n_chunks,
      |       CAST(count(DISTINCT ch) AS BIGINT) AS n_distinct,
      |       CAST(count(*) - count(DISTINCT ch) AS BIGINT) AS n_dup
      |FROM chunks GROUP BY source ORDER BY source NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    // split materialized once per row (round 14, the shingledDocs O(L²)
    // fix — each slice(w, i*8+1, 8) re-split the text when inlined)
    val w = col("w")
    docs(s, dir)
      .select(col("source"), split(col("text"), " ").as("w"))
      .select(col("source"),
        explode(when(size(w) >= 8,
          transform(sequence(lit(0), floor(size(w) / lit(8)).cast("int") - 1),
            i => md5(array_join(slice(w, i * 8 + 1, lit(8)), " "))))
          .otherwise(array().cast("array<string>"))).as("ch"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_chunks"),
        countDistinct(col("ch")).as("n_distinct"),
        (count(lit(1)) - countDistinct(col("ch"))).as("n_dup"))
      .orderBy("source")
  }

  /** In-document repetition score (repeated-bigram fraction — the Gopher
    * repetition quality gate). Integer parts-per-million, not a double
    * ratio: `(dup * 1e6) div total` is exact integer arithmetic on both
    * engines, so no float-rounding divergence is possible. Entirely
    * row-local — zero shuffle before the final sort.
    */
  val repetitionScore: Q = Q(
    "x26_repetition",
    """SELECT doc_id, CAST(len(bg) AS BIGINT) AS n_bigrams,
      |       CAST(len(list_distinct(bg)) AS BIGINT) AS n_unique,
      |       CAST((len(bg) - len(list_distinct(bg))) * 1000000 // len(bg) AS BIGINT) AS rep_ppm
      |FROM (SELECT doc_id, list_transform(generate_series(1, len(w)-1), i -> w[i] || ' ' || w[i+1]) AS bg
      |      FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents)
      |      WHERE len(w) >= 2)
      |ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    // Codegen'd [[graft.functions.BigramStats]]: zero-copy bigram dedup in
    // a hash set, replacing the interpreted O(n²) array_distinct per row.
    docs(s, dir)
      .select(col("doc_id"),
        graft.functions.BigramStatsFunctions.bigramStats(col("text")).as("bs"))
      .select(col("doc_id"), col("bs.n_bigrams").as("n_bigrams"),
        col("bs.n_unique").as("n_unique"))
      // the <2-token filter via the stats themselves (n_bigrams = 0) — a
      // size(split(...)) predicate would re-tokenize every row with an
      // interpreted regex just to count tokens
      .where(col("n_bigrams") > 0)
      .withColumn("rep_ppm", expr("(n_bigrams - n_unique) * 1000000 div n_bigrams"))
      .orderBy("doc_id")
  }

  /** Benchmark contamination check: corpus documents sharing any 8-word
    * gram with the held-out benchmark split (here the deterministic
    * doc_id%10=0 slice stands in for an eval suite). The benchmark gram set
    * is tiny relative to the corpus, so it is BROADCAST — the 100 TB side
    * is scanned once, hashed, and joined map-side with no shuffle.
    */
  val contamination: Q = Q(
    "x27_contamination",
    """WITH grams AS (
      |  SELECT doc_id, md5(array_to_string(list_slice(w, i, i+7), ' ')) AS g
      |  FROM (SELECT doc_id, string_split(text,' ') AS w FROM documents),
      |       LATERAL (SELECT unnest(generate_series(1, len(w)-7)) AS i) s),
      |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0),
      |corpus AS (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 10 <> 0)
      |SELECT corpus.doc_id, CAST(count(*) AS BIGINT) AS n_hits
      |FROM corpus JOIN bench USING (g)
      |GROUP BY corpus.doc_id ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    // split materialized once per row (round 14, the shingledDocs O(L²)
    // fix — each slice(w, i, 8) re-split the text when inlined)
    val w = col("w")
    def grams(df: DataFrame): DataFrame = df
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        explode(when(size(w) >= 8,
          transform(sequence(lit(1), size(w) - 7),
            i => md5(array_join(slice(w, i, lit(8)), " "))))
          .otherwise(array().cast("array<string>"))).as("g"))
    // computeParallel: one MD5 per 8-gram position dominates, and it runs
    // before any exchange — serialized on a single-row-group corpus file.
    val d      = Tables.computeParallel(docs(s, dir))
    val bench  = grams(d.where(col("doc_id") % 10 === 0)).select("g").distinct()
    // The corpus gram stream joins RAW (no pre-distinct): a distinct first
    // would shuffle every corpus gram — the whole 100 TB side — before the
    // map-side join. Joining first means the broadcast filter drops
    // non-matches at the scan, and only the (tiny) matched set reaches the
    // countDistinct aggregate, whose partial phase dedups map-side anyway.
    val corpus = grams(d.where(col("doc_id") % 10 =!= 0))
    corpus.join(broadcast(bench), "g")
      .groupBy("doc_id")
      .agg(countDistinct(col("g")).as("n_hits"))
      .orderBy("doc_id")
  }

  /** Deterministic content-hash sampling (~10%): a document is selected iff
    * the first 16 bits of md5(text) fall under the rate threshold — stable
    * across runs, engines, and cluster sizes (no RNG, no seed plumbing),
    * and stratified counts per source verify the rate. Pure projection +
    * one aggregate at any scale.
    */
  val hashSample: Q = Q(
    "x28_hash_sample",
    """SELECT source, CAST(count(*) AS BIGINT) AS n_total,
      |       CAST(sum(CASE WHEN CAST('0x' || substr(md5(text),1,4) AS INTEGER) < 6554 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
      |FROM documents GROUP BY source ORDER BY source NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    docs(s, dir)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(conv(substring(md5(col("text")), 1, 4), 16, 10).cast("int") < 6554, 1)
          .otherwise(0)).cast("long").as("n_sampled"))
      .orderBy("source")
  }

  /** Greedy sequence packing: documents in doc_id order per source are
    * appended into 512-token bins (a doc opens a new bin when the running
    * total before it crosses the boundary) — the token-budget batching step
    * in front of tokenizer sharding. One hash exchange on `source`, then a
    * purely in-partition running sum.
    *
    * SEQUENTIAL-PER-SOURCE BY CONTRACT: bin b's start depends on every
    * token count before it in the (source, doc_id) scan order, so one
    * task per source IS the declared identity of a greedy pack stream —
    * unlike the x130/x58/x30 rank windows (re-planned r9), there is no
    * order-free reformulation that yields the same bins. A production
    * packer shards the stream to (source, worker) substreams and accepts
    * per-worker bin numbering; this operator keeps the single-stream
    * semantics because its output (global bin ids per source) is what the
    * oracle — and a resumable tokenizer shard manifest — requires.
    */
  val seqPacking: Q = Q(
    "x29_seq_packing",
    """SELECT source, CAST((cum - n_tokens) // 512 AS BIGINT) AS bin,
      |       CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
      |FROM (SELECT source, len(string_split(text,' ')) AS n_tokens,
      |             sum(len(string_split(text,' '))) OVER (PARTITION BY source ORDER BY doc_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |      FROM documents)
      |GROUP BY source, bin ORDER BY source NULLS FIRST, bin NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    val wspec = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(s, dir)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(wspec))
      .withColumn("bin", expr("(cum - n_tokens) div 512"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
      .orderBy("source", "bin")
  }

  /** Stratified selection: top-5 documents per (source, lang) stratum by
    * lexical diversity (unique-word count), the keep-the-best-per-domain
    * curation step.
    *
    * Re-planned r9 (the verdict's x30 finding): the original per-stratum
    * `row_number() ≤ 5` window sorted every row of every stratum through
    * one task — parallelism capped at #(source, lang), and on a real
    * corpus one stratum is a double-digit share of all documents. Now a
    * bounded [[graft.functions.TopKPairAgg]] (key = n_unique DESC, id =
    * doc_id ASC — the oracle window's exact composite order, so ties
    * resolve identically): map tasks forward ≤ 5 pairs per stratum and
    * the only exchange carries bounded winner arrays. The oracle IS the
    * window formulation, so the hash match proves the re-plan lossless
    * (x101's precedent); NtileSpec asserts plan-level equality too.
    */
  val stratifiedTopK: Q = Q(
    "x30_stratified_topk",
    """SELECT source, lang, rn, doc_id, n_unique FROM (
      |  SELECT source, lang, doc_id,
      |         CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_unique,
      |         row_number() OVER (PARTITION BY source, lang
      |           ORDER BY len(list_distinct(string_split(text,' '))) DESC, doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 5 ORDER BY source NULLS FIRST, lang NULLS FIRST, rn NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    // implementation lives in NtilePlan.stratifiedTopKAgg next to its
    // reference-window twin (incl. the null-text rank-last sentinel that
    // matches the window's NULLS LAST — ADVICE r9 item 1)
    NtilePlan.stratifiedTopKAgg(docs(s, dir))
  }

  /** Referential-integrity audit across the relational tables — the
    * data-quality gate a pipeline runs before training joins (an orphaned
    * foreign key silently drops rows from every inner join downstream).
    * Each check is a left-anti join on the key: at 100 TB that is one
    * key-partitioned shuffle per pair, with the small dimension sides
    * broadcast by Catalyst. Reports checked row counts so a clean corpus
    * (0 orphans) is still a non-trivial assertion.
    */
  val refIntegrity: Q = Q(
    "x49_ref_integrity",
    """SELECT 'lineitem->orders' AS fk, (SELECT count(*) FROM lineitem) AS n_checked,
      |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
      |   WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
      |UNION ALL
      |SELECT 'lineitem->part' AS fk, (SELECT count(*) FROM lineitem) AS n_checked,
      |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
      |   WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)) AS n_orphans
      |UNION ALL
      |SELECT 'orders->customer' AS fk, (SELECT count(*) FROM orders) AS n_checked,
      |  (SELECT CAST(count(*) AS BIGINT) FROM orders o
      |   WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS n_orphans
      |ORDER BY fk""".stripMargin
  ) { (s, dir) =>
    def audit(name: String, fact: DataFrame, factKey: String,
        dim: DataFrame, dimKey: String): DataFrame = {
      val orphans = fact.join(dim, fact(factKey) === dim(dimKey), "left_anti")
      fact.agg(count(lit(1)).as("n_checked"))
        .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
        .select(lit(name).as("fk"), col("n_checked"), col("n_orphans"))
    }
    val li = Tables(s, dir, "lineitem")
    audit("lineitem->orders", li, "l_orderkey", Tables(s, dir, "orders"), "o_orderkey")
      .unionByName(audit("lineitem->part", li, "l_partkey", Tables(s, dir, "part"), "p_partkey"))
      .unionByName(audit("orders->customer", Tables(s, dir, "orders"), "o_custkey",
        Tables(s, dir, "customer"), "c_custkey"))
      .orderBy("fk")
  }

  /** Temperature-weighted domain mixture (α = 0.5): per-source sampling
    * weights ∝ n^α instead of ∝ n — the standard up-weighting of small
    * domains when mixing corpora for pretraining (raw proportional
    * sampling lets one giant crawl drown every curated source). Both
    * weight columns ride the integer-ppm contract: sqrt is a single
    * correctly-rounded IEEE op on an exact integer (identical in both
    * engines), integerized to milli-units BEFORE the ratio, so the ppm
    * division is exact int64 arithmetic — no float accumulation anywhere.
    * One vocabulary-of-sources-sized aggregate; the totals broadcast back
    * as a 1-row dimension.
    */
  val temperatureMix: Q = Q(
    "x76_temperature_mix",
    """WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY source),
      |s AS (SELECT source, n,
      |             CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS sq FROM c),
      |t AS (SELECT CAST(sum(sq) AS BIGINT) AS tot_sq, CAST(sum(n) AS BIGINT) AS tot_n FROM s)
      |SELECT source, n AS n_docs,
      |       CAST(n * 1000000 // tot_n AS BIGINT) AS w_raw_ppm,
      |       CAST(sq * 1000000 // tot_sq AS BIGINT) AS w_temp_ppm
      |FROM s, t ORDER BY source NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    val cnt = docs(s, dir).groupBy("source").agg(count(lit(1)).as("n"))
      .withColumn("sq", floor(sqrt(col("n").cast("double")) * 1000 + 0.5).cast("long"))
    val tot = cnt.agg(sum(col("sq")).as("tot_sq"), sum(col("n")).as("tot_n"))
    cnt.crossJoin(broadcast(tot))
      .select(col("source"), col("n").as("n_docs"),
        expr("n * 1000000 div tot_n").as("w_raw_ppm"),
        expr("sq * 1000000 div tot_sq").as("w_temp_ppm"))
      .orderBy("source")
  }

  /** Overlapping retrieval chunking (the RAG indexing shape): 32-token
    * windows with stride 24 (8-token overlap so a sentence straddling a
    * boundary survives whole in one chunk), each chunk identified by its
    * digest — the unit that embeds, dedups and retrieves. The final
    * window is the documented partial (shorter) chunk. Row-local
    * generation: token split, stride-strided starts, zero-copy-ish
    * slices; per-document fan-out is len/stride — linear, bounded, no
    * shuffle beyond the output sort. At 100 TB this is a pure map stage
    * feeding the embedding/sharding pipeline downstream.
    */
  val ragChunking: Q = Q(
    "x78_rag_chunking",
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |c AS (SELECT doc_id, CAST(s AS BIGINT) AS start_tok,
      |             list_slice(toks, s, least(s + 31, len(toks))) AS chunk
      |      FROM w, LATERAL (SELECT unnest(generate_series(1, len(toks), 24)) AS s) g)
      |SELECT doc_id, CAST((start_tok - 1) // 24 AS BIGINT) AS chunk_idx, start_tok,
      |       CAST(len(chunk) AS BIGINT) AS n_toks,
      |       md5(array_to_string(chunk, ' ')) AS chunk_md5
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
  ) { (s, dir) =>
    val toks = split(col("text"), " ")
    docs(s, dir)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), size(col("toks")), lit(24))).as("s"))
      .select(
        col("doc_id"),
        ((col("s") - 1) / 24).cast("long").as("chunk_idx"),
        col("s").cast("long").as("start_tok"),
        slice(col("toks"), col("s"),
          least(col("s") + 31, size(col("toks"))) - col("s") + 1).as("chunk"))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("chunk")).cast("long").as("n_toks"),
        md5(array_join(col("chunk"), " ")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Distribution-drift monitor between two time windows — the check a
    * 100 TB ingest pipeline runs before promoting a new batch: per
    * event_type, row count / cent volume / distinct-user drift between the
    * first and second half of the month, as exact integer ppm of the
    * combined total. ONE conditional-aggregation scan (FILTER-style
    * when()s inside a single groupBy) — never the naive
    * two-aggregates-plus-self-join, which would scan and shuffle twice.
    * All-integer arithmetic rides the determinism contract.
    */
  val driftMonitor: Q = Q(
    "x82_drift_monitor",
    """SELECT event_type, n_w1, n_w2,
      |       CAST(abs(n_w1 - n_w2) * 1000000 // (n_w1 + n_w2) AS BIGINT) AS n_drift_ppm,
      |       CAST(abs(c_w1 - c_w2) * 1000000 // (c_w1 + c_w2) AS BIGINT) AS cents_drift_ppm,
      |       users_w1, users_w2
      |FROM (SELECT event_type,
      |        CAST(count(*) FILTER (WHERE ts < TIMESTAMP '2024-01-16') AS BIGINT) AS n_w1,
      |        CAST(count(*) FILTER (WHERE ts >= TIMESTAMP '2024-01-16') AS BIGINT) AS n_w2,
      |        CAST(coalesce(sum(cents) FILTER (WHERE ts < TIMESTAMP '2024-01-16'), 0) AS BIGINT) AS c_w1,
      |        CAST(coalesce(sum(cents) FILTER (WHERE ts >= TIMESTAMP '2024-01-16'), 0) AS BIGINT) AS c_w2,
      |        CAST(count(DISTINCT user_id) FILTER (WHERE ts < TIMESTAMP '2024-01-16') AS BIGINT) AS users_w1,
      |        CAST(count(DISTINCT user_id) FILTER (WHERE ts >= TIMESTAMP '2024-01-16') AS BIGINT) AS users_w2
      |      FROM (SELECT event_type, ts, user_id,
      |                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events)
      |      GROUP BY event_type)
      |ORDER BY event_type NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    val cutoff = lit("2024-01-16").cast("timestamp")
    val w1     = col("ts") < cutoff
    val ev = Tables(s, dir, "events").select(
      col("event_type"), col("ts"), col("user_id"),
      floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    ev.groupBy("event_type")
      .agg(
        count(when(w1, 1)).as("n_w1"),
        count(when(!w1, 1)).as("n_w2"),
        coalesce(sum(when(w1, col("cents"))), lit(0L)).as("c_w1"),
        coalesce(sum(when(!w1, col("cents"))), lit(0L)).as("c_w2"),
        countDistinct(when(w1, col("user_id"))).as("users_w1"),
        countDistinct(when(!w1, col("user_id"))).as("users_w2"))
      // drift ratios from the already-exact int64 aggregates — `div` keeps
      // the whole chain in integer arithmetic (no double division anywhere).
      // The CENTS ratio rides decimal(38,0): a window's cent volume above
      // ~9e12 would push volume·1e6 past int64 (the x85 overflow class);
      // row counts stay int64 (count·1e6 needs > 9e12 ROWS per group to
      // overflow — disclosed headroom, not a realistic group)
      .select(col("event_type"), col("n_w1"), col("n_w2"),
        expr("abs(n_w1 - n_w2) * 1000000 div (n_w1 + n_w2)").as("n_drift_ppm"),
        expr("""abs(cast(c_w1 as decimal(38,0)) - c_w2) * 1000000
               | div (cast(c_w1 as decimal(38,0)) + c_w2)""".stripMargin)
          .cast("long").as("cents_drift_ppm"),
        col("users_w1"), col("users_w2"))
      .orderBy("event_type")
  }

  /** Bloom-prefiltered batch novelty: score an incoming crawl batch
    * (source = src0) against the rest of the corpus by word-8-gram overlap —
    * per incoming doc, how many of its distinct grams the reference corpus
    * already contains, and the novel fraction in exact ppm.
    *
    * This is the MIRROR of x27's broadcast shape: there the probe set
    * (benchmark) is tiny and broadcast exactly; here the reference side is
    * the 100 TB corpus — too big to broadcast as exact digests but
    * compressible to a Bloom filter (~1.2 MB per 10⁶ distinct grams at 1%
    * fpp, built DISTRIBUTED by `stat.bloomFilter`, which merges per-
    * partition partial filters — no driver-side scan). The broadcast bloom
    * prunes incoming grams map-side; only bloom-POSITIVES reach the exact
    * semi-join that removes false positives, so the shuffled verify volume
    * is (true hits + fpp·misses), not the batch. The final answer is EXACT
    * — the bloom is a perf layer, the semi-join is the truth layer.
    */
  /** Word-8-gram digests of a document slice, one row per distinct
    * (doc_id, g) AFTER the caller's distinct — shared by the bloom build
    * and the verify join.
    */
  private def novGrams(df: DataFrame): DataFrame =
    // Round 15 (guide §4): the 8-element_at interpreted lambda per gram is
    // one codegen'd [[graft.functions.WordNgramDigests]] pass. dedup = true
    // is legal: both consumers ([[noveltyGrams]]) apply a distinct on top
    // (ref: distinct g; inc: distinct (doc_id, g)), so per-doc
    // first-occurrence dedup changes nothing downstream while the explode
    // and the distinct's exchange carry only unique grams per document.
    df.select(col("doc_id"),
      explode(graft.functions.WordNgramDigestsFunctions
        .wordNgramDigests(col("text"), 8, dedup = true)).as("g"))

  /** (reference grams, incoming grams), both cached: the bloom build is an
    * ACTION over the reference lineage and the verify join consumes it
    * again — without materialization the corpus-side gram explode (the
    * expensive stage) runs twice per query execution. Same session-keyed
    * memo discipline as DedupOps.lshCandidatePairs.
    */
  private val noveltyCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), (DataFrame, DataFrame)]

  private[graft] def memoSize: Int = noveltyCache.size

  /** Named live memo entries — see DedupOps.memoKeys (Bench's per-query
    * paid_memos attribution).
    */
  private[graft] def memoKeys: Set[String] =
    if (noveltyCache.nonEmpty) Set("pipeline.novelty") else Set.empty

  /** Same contract as DedupOps.clearMemo: Bench drops the memo between
    * timing passes so a best-of-N never times a cache read where pass 1
    * timed the real gram lineage.
    */
  private[graft] def clearMemo(): Unit = {
    noveltyCache.values.foreach { case (a, b) =>
      scala.util.Try(a.unpersist()); scala.util.Try(b.unpersist())
    }
    noveltyCache.clear()
  }

  /** Drop entries pinned to stopped sessions (see DedupOps.evictStopped). */
  private[graft] def evictStopped(): Unit =
    noveltyCache.keys.filter(_._1.sparkContext.isStopped).foreach(noveltyCache.remove)

  private def noveltyGrams(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    evictStopped()
    noveltyCache.getOrElseUpdate((s, dir), {
      val d = Tables.computeParallel(docs(s, dir))
      (novGrams(d.where(col("source") =!= "src0")).select("g").distinct().cache(),
        novGrams(d.where(col("source") === "src0")).distinct().cache())
    })
  }

  val bloomNovelty: Q = Q(
    "x90_bloom_novelty",
    """WITH pos AS (
      |  SELECT doc_id, source, substr(md5(array_to_string(list_slice(w, i, i+7), ' ')), 1, 16) AS g
      |  FROM (SELECT doc_id, source, string_split(text,' ') AS w FROM documents),
      |       LATERAL (SELECT unnest(generate_series(1, len(w)-7)) AS i) s),
      |ref AS (SELECT DISTINCT g FROM pos WHERE source <> 'src0'),
      |inc AS (SELECT DISTINCT doc_id, g FROM pos WHERE source = 'src0')
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
      |       CAST(sum(CASE WHEN r.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_known,
      |       CAST(sum(CASE WHEN r.g IS NULL THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS novel_ppm
      |FROM inc LEFT JOIN ref r USING (g)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val (ref, inc) = noveltyGrams(s, dir)
    // Distributed bloom build: treeAggregate of per-partition partials.
    // expectedNumItems is a corpus-metadata constant in production (distinct
    // gram estimate); 1e6 at test SF keeps fpp ≪ 1% so the verify join sees
    // almost only true hits.
    val bloom  = ref.stat.bloomFilter("g", 1000000L, 0.01)
    val bloomB = s.sparkContext.broadcast(bloom)
    val mightContain = udf((g: String) => g != null && bloomB.value.mightContainString(g))
    val known = inc.where(mightContain(col("g")))
      .join(ref, Seq("g"), "left_semi") // exact verify: kill bloom false positives
      .groupBy("doc_id").agg(count(lit(1)).as("n_known"))
    inc.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      .join(known, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_known"), lit(0L)).as("n_known"),
        expr("(n_grams - coalesce(n_known, 0)) * 1000000 div n_grams").as("novel_ppm"))
      .orderBy("doc_id")
  }

  /** Exact-quota stratified sampling: draw EXACTLY 100 documents with
    * per-source counts apportioned ∝ source size by largest-remainder
    * (Hamilton) allocation — the sample-size guarantee the x28/x37 hash
    * coins cannot give (a Bernoulli coin's stratum counts are binomial,
    * ±√n; a fixed token budget needs exact counts). Selection within a
    * stratum is deterministic: the quota-many smallest md5(doc_id) keys,
    * tie-broken on doc_id.
    *
    * Scale shape: counts + apportionment are source-count-sized (the
    * quota table broadcasts); selection is [[graft.functions.BottomKPairAgg]]
    * — a bounded (hash, id)-pair top-k whose partial phase forwards ≤ 100
    * pairs per (source, map task), so the only exchanges are bounded
    * winner arrays. The oracle's per-source `row_number()` window — a full
    * sort of every stratum — is exactly the shape the UDAF exists to
    * avoid; QueriesSpec proves the two agree. Assumes corpus ≥ target
    * (100): then quota_i ≤ c_i holds (floor(T·c/n) + a remainder top-up
    * stays ≤ c whenever T ≤ n), so `slice` never runs short.
    */
  val quotaSample: Q = Q(
    "x101_quota_sample",
    """WITH cnt AS (SELECT source, count(*) AS c FROM documents GROUP BY source),
      |tot AS (SELECT sum(c) AS n FROM cnt),
      |base AS (SELECT source, c, (100 * c) // n AS q0, (100 * c) % n AS rem
      |         FROM cnt CROSS JOIN tot),
      |fl AS (SELECT sum(q0) AS f FROM base),
      |quota AS (SELECT source,
      |            q0 + (CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
      |                       <= 100 - f THEN 1 ELSE 0 END) AS q
      |          FROM base CROSS JOIN fl),
      |keyed AS (SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
      |rk AS (SELECT source, doc_id,
      |         row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rk
      |       FROM keyed)
      |SELECT r.source, CAST(r.rk AS BIGINT) AS rk, r.doc_id
      |FROM rk r JOIN quota USING (source) WHERE r.rk <= q
      |ORDER BY source, rk""".stripMargin
  ) { (s, dir) =>
    val T = 100
    val d = docs(s, dir)
    val cnt = d.groupBy("source").agg(count(lit(1)).as("c"))
    val tot = cnt.agg(sum(col("c")).as("n"))
    val base = cnt.crossJoin(broadcast(tot))
      .withColumn("q0", expr(s"$T * c div n"))
      .withColumn("rem", expr(s"($T * c) % n"))
    val f = base.agg(sum(col("q0")).as("f"))
    // single-partition window over the SOURCE-COUNT-sized apportionment
    // table only — never over documents
    val wq = Window.orderBy(col("rem").desc, col("source"))
    val quota = base.crossJoin(broadcast(f))
      .withColumn("rr", row_number().over(wq))
      .withColumn("q", (col("q0") + when(col("rr") <= lit(T) - col("f"), 1L)
        .otherwise(0L)).cast("int"))
      .select(col("source").as("q_source"), col("q"))
    val bottomk = udaf(new graft.functions.BottomKPairAgg(T),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong))
    d.select(col("source"), col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      .groupBy("source")
      .agg(bottomk(col("h"), col("doc_id")).as("picked"))
      .join(broadcast(quota), col("source") === col("q_source"))
      .select(col("source"),
        posexplode(expr("slice(picked, 1, q)")).as(Seq("pos", "pair")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rk"),
        col("pair._2").as("doc_id"))
      .orderBy("source", "rk")
  }

  /** TOKEN-BUDGET corpus selection — "spend 30% of the corpus's token
    * budget on the highest-quality documents": rank docs by an integer
    * quality density (lexical diversity, distinct/total words in ppm — a
    * stand-in for any per-doc score, e.g. x105's classifier), take the
    * greedy prefix of the (density DESC, doc_id) order while the running
    * token total stays within budget. The selection every data-constrained
    * training run makes once per corpus build.
    *
    * The naive plan is a GLOBAL window (one partition sorts the corpus) —
    * a scale-killer. Shipped instead: distributed threshold selection —
    * (1) histogram the densities into 1001 fixed ppm bins (one map-side-
    * combined aggregate); (2) a running sum over the BIN table (bounded
    * rows — the only unpartitioned window) finds which bins fit entirely
    * and which single bin the budget boundary crosses; (3) bins above the
    * boundary select whole; ONLY the boundary bin's docs sort exactly
    * ((density DESC, doc_id) + offset cumsum). Equality with the global
    * greedy is structural: bins partition disjoint density ranges, and the
    * boundary window applies the same order the global sort would inside
    * the one range it touches. The oracle IS the naive global-window plan,
    * so the hash match proves the phase split lossless.
    */
  val budgetSelect: Q = Q(
    "x111_budget_select",
    """WITH t AS (
      |  SELECT doc_id, source, len(string_split(text, ' ')) AS tok,
      |         len(list_distinct(string_split(text, ' '))) AS dw
      |  FROM documents WHERE text IS NOT NULL),
      |d AS (SELECT doc_id, source, tok, dw * 1000000 // tok AS dens
      |      FROM t WHERE tok >= 1),
      |b AS (SELECT 3 * sum(tok) // 10 AS budget FROM d),
      |o AS (SELECT *, sum(tok) OVER (ORDER BY dens DESC, doc_id) AS cum FROM d)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(tok) AS BIGINT) AS n_tokens
      |FROM o CROSS JOIN b WHERE cum <= budget
      |GROUP BY source ORDER BY source NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    // inlined split: pure-scalar uses, codegen CSE dedups it (an explicit
    // projection measured SLOWER on this class — see TextOps.hits scaladoc)
    val w = split(col("text"), " ")
    val base = docs(s, dir).where(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        size(w).cast("long").as("tok"), size(array_distinct(w)).cast("long").as("dw"))
      .where(col("tok") >= 1)
      .withColumn("dens", expr("dw * 1000000 div tok"))
      .withColumn("bin", expr("dens div 1000"))
    val budget = base.agg(expr("3 * sum(tok) div 10").as("budget"))
    val binCum = base.groupBy("bin").agg(sum(col("tok")).as("btok"))
      .withColumn("pre", coalesce(sum(col("btok")).over(
        Window.orderBy(col("bin").desc).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(budget))
    val fullBins = binCum.where(col("pre") + col("btok") <= col("budget"))
      .select(col("bin").as("fb"))
    val crossing = binCum
      .where(col("pre") <= col("budget") && col("pre") + col("btok") > col("budget"))
      .select(col("bin").as("cb"), col("pre"), col("budget"))
    val selFull = base.join(broadcast(fullBins), col("bin") === col("fb"))
      .select("source", "tok")
    val selBoundary = base.join(broadcast(crossing), col("bin") === col("cb"))
      .withColumn("cum", sum(col("tok")).over(
        Window.orderBy(col("dens").desc, col("doc_id"))))
      .where(col("pre") + col("cum") <= col("budget"))
      .select("source", "tok")
    selFull.unionAll(selBoundary)
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
      .orderBy("source")
  }

  /** EPOCH/REPEAT PLANNING under a token budget — the data-constrained
    * regime's allocation table (Muennighoff et al., NeurIPS'23: repeating
    * data up to ~4 epochs is near-as-good as fresh data, then returns
    * decay): temperature weights (x76's α=0.5, up-weighting small
    * domains) split a 2×-corpus token budget into per-source targets;
    * each source's repeat factor is its target over its actual tokens,
    * CAPPED at 4 epochs; the allocation column is what the cap leaves —
    * the table a training run's data loader is configured from.
    *
    * Integer discipline: sqrt is IEEE correctly-rounded (both engines
    * identical), integerized once to milli-units (the x76 path); every
    * division is positive with floor ≡ trunc. Scale shape: one token
    * aggregate to a source-count-sized table, then row-local arithmetic
    * against one broadcast scalar — the planning table costs one pass.
    */
  val epochPlan: Q = Q(
    "x120_epoch_plan",
    """WITH t AS (
      |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents WHERE text IS NOT NULL GROUP BY source),
      |w AS (SELECT source, n_tokens,
      |             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000 + 0.5) AS BIGINT) AS w_milli
      |      FROM t),
      |g AS (SELECT sum(w_milli) AS sw, 2 * sum(n_tokens) AS budget FROM w)
      |SELECT source, n_tokens, w_milli,
      |       CAST(budget * w_milli // sw AS BIGINT) AS target_tokens,
      |       CAST(least(4000, (budget * w_milli // sw) * 1000 // n_tokens) AS BIGINT) AS epochs_milli,
      |       CAST(least(4000, (budget * w_milli // sw) * 1000 // n_tokens) * n_tokens // 1000 AS BIGINT) AS alloc_tokens
      |FROM w CROSS JOIN g ORDER BY source NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    val t = docs(s, dir).where(col("text").isNotNull)
      .groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
    val w = t.withColumn("w_milli",
      floor(sqrt(col("n_tokens").cast("double")) * 1000 + 0.5).cast("long"))
    val g = w.agg(sum(col("w_milli")).as("sw"), (lit(2L) * sum(col("n_tokens"))).as("budget"))
    w.crossJoin(broadcast(g))
      .select(col("source"), col("n_tokens"), col("w_milli"),
        expr("budget * w_milli div sw").as("target_tokens"),
        expr("least(4000, (budget * w_milli div sw) * 1000 div n_tokens)").as("epochs_milli"),
        expr("least(4000, (budget * w_milli div sw) * 1000 div n_tokens) * n_tokens div 1000")
          .as("alloc_tokens"))
      .orderBy("source")
  }

  /** DSIR-SHAPED importance resampling (Xie et al., NeurIPS'23 "Data
    * Selection via Importance Resampling"): reweight the corpus toward a
    * target domain (the lang='en' slice, as in x105) using HASHED
    * CHAR-TRIGRAM features — the paper's hashed n-gram likelihood-ratio
    * estimator, made integer-exact: per 1024-bucket feature, the
    * milli-lift of target over raw probability (the x105/x34 double-path
    * integerization), CLAMPED to ±1000 so a document's summed lift is
    * bounded by ±1000·n and the keep decision needs NO division at all:
    * keep ⟺ 2·n·coin < 1000·n + Σw (coin = md5(doc_id) mod 1000 — the
    * deterministic resampling draw), which is exactly keep-probability
    * (1 + mean_lift/1000)/2 per doc. Output: the per-language composition
    * of the resampled corpus — the measurable distribution shift toward
    * the target that is DSIR's whole point.
    *
    * Scale shape: two trigram-bucket aggregates to a FIXED 1024-row model
    * (broadcast), one row-local scoring + coin pass, one language-sized
    * aggregate — the corpus never shuffles on a text-derived key; trigram
    * generation is the one-pass codegen `char_ngrams`.
    */
  val dsirResample: Q = Q(
    "x121_dsir_resample",
    """WITH tri AS (
      |  SELECT doc_id, lang, substr(text, CAST(i AS INT), 3) AS tri
      |  FROM documents, unnest(generate_series(1, length(text) - 2)) AS t(i)),
      |b AS (SELECT doc_id, lang,
      |             CAST('0x' || substr(md5(tri), 1, 4) AS INTEGER) % 1024 AS b FROM tri),
      |rawc AS (SELECT b, count(*) AS c_raw FROM b GROUP BY b),
      |tgtc AS (SELECT b, count(*) AS c_tgt FROM b WHERE lang = 'en' GROUP BY b),
      |tot AS (SELECT count(*) AS t_raw,
      |               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_tgt FROM b),
      |model AS (SELECT rawc.b,
      |            least(1000, greatest(-1000,
      |              CAST(floor(CAST(coalesce(c_tgt, 0) AS DOUBLE) * t_raw * 1000
      |                         / (CAST(c_raw AS DOUBLE) * t_tgt) + 0.5) - 1000 AS BIGINT))) AS w
      |          FROM rawc LEFT JOIN tgtc ON rawc.b = tgtc.b CROSS JOIN tot),
      |scored AS (SELECT doc_id, any_value(lang) AS lang,
      |                  CAST(count(*) AS BIGINT) AS n, CAST(sum(w) AS BIGINT) AS sw
      |           FROM b JOIN model USING (b) GROUP BY doc_id),
      |kept AS (SELECT lang,
      |                (2 * n * (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER) % 1000)
      |                   < 1000 * n + sw) AS keep, sw
      |         FROM scored)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |       CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS kept_ppm,
      |       CAST(sum(sw) AS BIGINT) AS sum_w_milli
      |FROM kept GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    val tri = docs(s, dir).select(col("doc_id"), col("lang"),
      explode(graft.functions.CharNgramsFunctions.charNgrams(col("text"), 3)).as("tri"))
    // The isNotNull is semantically inert (char_ngrams yields no null
    // elements, so b is never null) but load-bearing for the plan: the
    // inner join below pushes isnotnull(b) onto ONLY the scoring branch,
    // and that one-sided filter breaks exchange canonicalization. Stated
    // here it appears in both branches and ReuseExchange can fire.
    val b = tri.select(col("doc_id"), col("lang"),
      (conv(substring(md5(col("tri")), 1, 4), 16, 10).cast("long") % 1024).as("b"))
      .where(col("b").isNotNull)
    // ONE trigram pass feeds BOTH phases: collapse the stream to
    // per-(doc, bucket) counts first — a map-side-combined exchange both
    // the model build and the scoring branch hang off. The two branches
    // share that exchange byte-for-byte, so Catalyst's ReuseExchange
    // materializes the explode+md5 lineage ONCE (the broadcast-model job
    // writes the shuffle, the scoring job re-reads it) — no cache, no memo
    // lifecycle. Earlier shapes ran the trigram stream 4× (rawc/tgtc/tot
    // + scoring), then 2×; this is the floor. Values are bit-identical:
    // every count becomes a sum of per-cell bigint counts, lang is
    // functionally dependent on doc_id, and per-doc sum(w) over trigram
    // rows ≡ sum(w·cnt) over cells. The model's corpus totals are
    // unpartitioned window sums over the ≤1024-row bucket frame (free).
    // lang rides as a GROUPING key, not first(lang): it is functionally
    // dependent on doc_id so the groups are the same rows, but a
    // first(String) buffer is not HashAggregate-mutable and would demote
    // both partial aggregates to SortAggregate — a full sort of the
    // trigram stream, the exact cost this staging exists to avoid.
    val db = b.groupBy(col("doc_id"), col("lang"), col("b"))
      .agg(count(lit(1)).as("cnt"))
    val bc = db.groupBy("b").agg(sum(col("cnt")).as("c_raw"),
      sum(when(col("lang") === "en", col("cnt")).otherwise(0L)).as("c_tgt"))
    val model = bc
      .select(col("b"), least(lit(1000L), greatest(lit(-1000L), expr(
        """cast(floor(cast(c_tgt as double) * (sum(c_raw) over ()) * 1000
          |           / (cast(c_raw as double) * (sum(c_tgt) over ())) + 0.5) - 1000 as bigint)""".stripMargin)))
        .as("w"))
    val scored = db.join(broadcast(model), "b")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("cnt")).as("n"), sum(col("w") * col("cnt")).as("sw"))
    val coin = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast("long") % 1000
    scored
      .select(col("lang"), col("sw"),
        (lit(2L) * col("n") * coin < lit(1000L) * col("n") + col("sw")).as("keep"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("sw")).as("sum_w_milli"))
      .select(col("lang"), col("n_docs"), col("n_kept"),
        expr("n_kept * 1000000 div n_docs").as("kept_ppm"), col("sum_w_milli"))
      .orderBy("lang")
  }

  /** CONTENT-DEFINED chunk dedup (the FastCDC/rsync boundary idea —
    * Muthitacharoen et al., "A Low-Bandwidth Network File System",
    * SOSP'01): chunk boundaries are placed where a rolling content
    * condition fires — here, after char i when a windowed hash of the
    * trailing 8 chars lands in a 1-in-64 slice — so an insertion early in a document
    * shifts ONLY the chunk it lands in, where x25's fixed-width chunking
    * re-aligns every later chunk (the boundary-shift problem CDC exists to
    * solve). Boundaries come from the windowed gear-style integer hash in
    * `cdcBoundaryCond` (round 8; previously md5 of the trailing window —
    * DedupDiag measured that md5 at ~2/3 of the query's cost). Textbook
    * gear-CDC also adds min/max clamps; deliberately omitted — see
    * `cdcBoundaryCond`. Expected chunk length ~64 chars.
    * Per source: chunk count, distinct chunk digests, the fraction of
    * chunk occurrences whose content also appears in ANOTHER document
    * (cross-doc boilerplate, the dedup signal), and mean chunk length in
    * centichars — all exact integers.
    *
    * Scale shape: boundary detection, chunk slicing and digesting are ONE
    * row-local codegen HOF chain (the text never leaves its row — only
    * 16-hex digests explode); the cross-doc test is a digest-keyed
    * aggregate and the report is a source-count-sized rollup. The oracle
    * reaches the same chunks via an explode + lag window — plan
    * equivalence is not the contract, result equality is.
    */
  val cdcChunks: Q = Q(
    "x124_cdc_chunks",
    s"""WITH d AS (SELECT doc_id, source, text FROM documents
      |           WHERE text IS NOT NULL AND len(text) > 0),
      |pos AS (SELECT doc_id, source, text, i FROM (
      |          SELECT doc_id, source, text,
      |                 unnest(generate_series(1, len(text))) AS i FROM d) u
      |        WHERE i = len(text)
      |           OR (i >= 8 AND ${cdcBoundaryCond(k => s"ascii(substring(text, i - $k, 1))", "//")})),
      |chunks AS (SELECT doc_id, source,
      |             substr(text, coalesce(lag(i) OVER w, 0) + 1,
      |                    i - coalesce(lag(i) OVER w, 0)) AS chunk
      |           FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
      |dg AS (SELECT doc_id, source, substr(md5(chunk), 1, 16) AS cd, len(chunk) AS clen
      |       FROM chunks),
      |shared AS (SELECT cd, count(DISTINCT doc_id) AS nd FROM dg GROUP BY cd)
      |SELECT dg.source, CAST(count(*) AS BIGINT) AS n_chunks,
      |       CAST(count(DISTINCT dg.cd) AS BIGINT) AS n_distinct,
      |       CAST(sum(CASE WHEN s.nd > 1 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS cross_doc_ppm,
      |       CAST(sum(dg.clen) * 100 // count(*) AS BIGINT) AS mean_len_centi
      |FROM dg JOIN shared s ON s.cd = dg.cd
      |GROUP BY dg.source ORDER BY dg.source NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    val d = Tables.computeParallel(
      docs(s, dir).where(col("text").isNotNull && length(col("text")) > 0))
      .select("doc_id", "source", "text")
    val dg = cdcDigests(d)
    val shared = dg.groupBy("cd").agg(countDistinct(col("doc_id")).as("nd"))
    dg.join(shared, "cd")
      .groupBy("source")
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("cd")).as("n_distinct"),
        sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"),
        sum(col("clen")).as("sum_len"))
      .select(col("source"), col("n_chunks"), col("n_distinct"),
        expr("n_shared * 1000000 div n_chunks").as("cross_doc_ppm"),
        expr("sum_len * 100 div n_chunks").as("mean_len_centi"))
      .orderBy("source")
  }

  /** Row-local CDC chunk digests of a (…, text) frame: cut positions →
    * per-chunk (cd 16-hex digest, clen) via one codegen HOF chain — the
    * text never leaves its row, only digests explode. Shared by x124 and
    * the insertion-locality spec.
    */
  /** The CDC boundary predicate at position `i`, as a SQL fragment shared
    * verbatim by the Spark lambda and the DuckDB oracle (`div` is the one
    * dialect split: Spark spells integer division `div`, DuckDB `//`).
    *
    * Round 8 swapped the original per-position md5-of-8-char-window for
    * this windowed gear-style hash (DedupDiag measured the md5 window at
    * ~2/3 of x124's whole cost): each of the trailing 8 chars is mixed
    * through a Knuth multiplicative step (odd constant 2654435761) and
    * summed with geometric weights 2^k — the same shape gear-CDC's
    * `h = 2h + G[c]` produces over its effective window — then one more
    * multiplicative mix and a mid-bit slice (`div 4096 % 64`) so ALL
    * window chars influence the 6 decision bits, not just the last six.
    * Everything is positive int64 arithmetic (max ~2^60), exact and
    * identical in both engines. Expected chunk length stays ~64 chars
    * (measured 60.0 on the test corpus); no min/max clamps — they would
    * make each boundary depend on the previous cut, turning a row-local
    * stateless predicate into a sequential scan.
    */
  private[graft] def cdcBoundaryCond(charCode: Int => String, div: String): String = {
    val terms = (0 to 7)
      .map(k => s"((${charCode(k)} * 2654435761) % 1048576) * ${1 << k}")
      .mkString(" + ")
    s"(((($terms) * 2654435761) $div 4096) % 64 = 0)"
  }

  /** The boundary-detection stage in its SQL-HOF spelling — kept ONLY as
    * DedupDiag's interpreted reference point (production goes through the
    * codegen `CdcChunkDigests` expression; `cdcBoundaryCond` keeps the two
    * and the oracle in lock-step). The window chars are read from `cc`, a
    * per-doc char-code array built in one linear pass — not via
    * ascii(substring(text, i-k, 1)): UTF8String.substring is O(position)
    * (it byte-scans for char boundaries), so eight substring probes per
    * position would make this O(len²) per document. Even with the array,
    * interpreted HOF lambda dispatch keeps this path ~as slow as the
    * md5-window it replaced — which is why x124 went native (DedupDiag
    * round-8 numbers: md5 window 0.87 s, array-HOF gear 1.16 s, native
    * expression ~0.1 s for the same stage at sf0.1).
    */
  private[graft] def cdcCuts(d: DataFrame): DataFrame =
    d.withColumn("cc", expr("transform(split(text, ''), c -> ascii(c))"))
      .withColumn("cuts",
        expr(s"""filter(sequence(1, length(text)), i ->
                |  i = length(text) OR (i >= 8 AND ${
                   cdcBoundaryCond(k => s"element_at(cc, i - $k)", "div")}))"""
          .stripMargin))
      .drop("cc")

  private[graft] def cdcDigests(d: DataFrame): DataFrame =
    d.select(d.columns.filter(_ != "text").map(col) :+
        explode(graft.functions.CdcChunksFunctions.cdcChunkDigests(col("text"))).as("ch"): _*)
      .withColumn("cd", col("ch.cd")).withColumn("clen", col("ch.clen")).drop("ch")

  /** Corpus-level passage dedup with document reconstruction accounting
    * (the RefinedWeb / MassiveText recipe: split every document into
    * passages, drop every passage already seen ANYWHERE in the corpus, and
    * measure what survives per source). Differs from x25 (which counts
    * duplicate chunks per source) by enforcing a GLOBAL first-occurrence
    * winner — ordered by (doc_id, position), the deterministic scan order —
    * and by accounting the retained word mass, tail passages included.
    *
    * Passages are non-overlapping 20-word windows (the corpus is
    * single-line, so fixed windows stand in for paragraph breaks). Scale
    * shape: passages are digested ROW-LOCALLY inside one generator lambda,
    * so the only corpus-wide exchange is the digest window carrying
    * (digest16, source, doc_id, pos, wcnt) ≈ 40 B/passage — never text;
    * then one per-source hash aggregate. The ppm ratio is exact integer
    * arithmetic (kept_words widened to decimal(38,0) / HUGEINT before the
    * ×1e6 — int64 wraps past ~9.2e12 kept words/source; HUGEINT not
    * DECIMAL on the oracle side because DuckDB's DECIMAL `//` ROUNDS the
    * quotient before flooring, off-by-one vs Spark's truncating div), so
    * no float seam.
    */
  val passageDedup: Q = Q(
    "x125_passage_dedup",
    """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS w,
      |                  len(string_split(text, ' ')) AS n FROM documents),
      |p AS (SELECT doc_id, source, i,
      |        substr(md5(array_to_string(list_slice(w, 20*i+1, 20*i+20), ' ')), 1, 16) AS dg,
      |        least(20, n - 20*i) AS wcnt
      |      FROM d, LATERAL (SELECT unnest(generate_series(0, (n-1)//20)) AS i) g),
      |r AS (SELECT source, doc_id, dg, wcnt,
      |        row_number() OVER (PARTITION BY dg ORDER BY doc_id, i) AS rn
      |      FROM p)
      |SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |       count(*) AS n_pass,
      |       CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
      |       CAST(sum(wcnt) AS BIGINT) AS total_words,
      |       CAST(sum(CASE WHEN rn = 1 THEN wcnt ELSE 0 END) AS BIGINT) AS kept_words,
      |       CAST(CAST(sum(CASE WHEN rn = 1 THEN wcnt ELSE 0 END) AS HUGEINT) * 1000000
      |            // sum(wcnt) AS BIGINT) AS kept_ppm
      |FROM r GROUP BY source ORDER BY source NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    // split materialized once per row (round 14, the shingledDocs O(L²)
    // fix — each slice(w, i*20+1, 20) re-split the text when inlined)
    val w = col("w")
    val n = size(w)
    val passages = docs(s, dir)
      .select(col("source"), col("doc_id"), split(col("text"), " ").as("w"))
      .select(
        col("source"), col("doc_id"),
        posexplode(transform(sequence(lit(0), ((n - 1) / lit(20)).cast("int")), i =>
          struct(
            substring(md5(concat_ws(" ", slice(w, i * 20 + 1, lit(20)))), 1, 16).as("dg"),
            least(lit(20), n - i * 20).as("wcnt")))).as(Seq("pos", "pa")))
      .select(col("source"), col("doc_id"), col("pos"),
        col("pa.dg").as("dg"), col("pa.wcnt").as("wcnt"))
    val rn = row_number().over(Window.partitionBy("dg").orderBy("doc_id", "pos"))
    passages.withColumn("rn", rn)
      .groupBy("source")
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_pass"),
        sum(when(col("rn") === 1, 0).otherwise(1)).as("n_removed"),
        sum(col("wcnt")).as("total_words"),
        sum(when(col("rn") === 1, col("wcnt")).otherwise(0)).as("kept_words"))
      .withColumn("kept_ppm",
        // kept_words rides int64; the ×1e6 would wrap past ~9.2e12 kept
        // words per source, so widen to decimal(38,0) BEFORE the multiply
        // (the x128/x131 contract) — IntegralDivide lands back on int64
        expr("cast(cast(kept_words as decimal(38,0)) * 1000000 div total_words as bigint)"))
      .orderBy("source")
  }

  /** Context-length fit audit: for candidate sequence lengths L ∈
    * {64, 256, 1024}, what the two standard document→sequence policies
    * cost in tokens — (a) one-doc-one-sequence TRUNCATION at L loses
    * `max(0, t−L)` tokens per doc; (b) doc-per-sequence PADDING burns
    * `ceil(t/L)·L − t` slots per doc. The table this emits (per language
    * × L: docs, tokens, sequences, lost mass, pad mass, both as exact
    * ppm) is the decision input for picking a training context length
    * BEFORE running the packer (x29 packs greedily at a fixed L; x136
    * shards the packed output) — at 100 TB you want this audit from one
    * scan, not from trial packing runs.
    *
    * Scale shape: the ×3 candidate-length fan-out is a row-local literal
    * explode (Generate), everything else is ONE hash aggregate over
    * (lang, L) — no join, no window, partial aggregation collapses each
    * map task to ≤ |langs|×3 rows. Sums widen to decimal(38,0)/HUGEINT
    * before the ×1e6 ppm multiply (the x125 overflow contract). Null-text
    * docs are excluded on both engines (the x136 contract: a null doc has
    * no token count under ANSI `size(split(NULL))`).
    */
  val packingWaste: Q = Q(
    "x146_packing_waste",
    """WITH d AS (SELECT lang, len(string_split(text, ' ')) AS t
      |           FROM documents WHERE text IS NOT NULL),
      |f AS (SELECT lang, l, t,
      |             greatest(t - l, 0) AS lost,
      |             ((t + l - 1) // l) * l AS slots
      |      FROM d, (SELECT unnest([64, 256, 1024]) AS l) ls)
      |SELECT lang, CAST(l AS BIGINT) AS ctx_len,
      |       count(*) AS n_docs,
      |       CAST(sum(t) AS BIGINT) AS n_tokens,
      |       CAST(sum(slots // l) AS BIGINT) AS n_seqs,
      |       CAST(sum(lost) AS BIGINT) AS trunc_lost,
      |       CAST(CAST(sum(lost) AS HUGEINT) * 1000000 // sum(t) AS BIGINT) AS trunc_ppm,
      |       CAST(sum(slots - t) AS BIGINT) AS pad_tokens,
      |       CAST(CAST(sum(slots - t) AS HUGEINT) * 1000000 // sum(slots) AS BIGINT) AS pad_ppm
      |FROM f GROUP BY lang, l ORDER BY lang NULLS FIRST, ctx_len NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    val d = docs(s, dir).where(col("text").isNotNull)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("t"))
    d.select(col("lang"), col("t"),
        explode(array(lit(64L), lit(256L), lit(1024L))).as("l"))
      .select(col("lang"), col("l"), col("t"),
        greatest(col("t") - col("l"), lit(0L)).as("lost"),
        (expr("(t + l - 1) div l") * col("l")).as("slots"))
      .groupBy(col("lang"), col("l").as("ctx_len"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("t")).as("n_tokens"),
        sum(expr("slots div l")).as("n_seqs"),
        sum(col("lost")).as("trunc_lost"),
        sum(col("slots") - col("t")).as("pad_tokens"),
        sum(col("slots")).as("slots"))
      .select(col("lang"), col("ctx_len"), col("n_docs"), col("n_tokens"),
        col("n_seqs"), col("trunc_lost"),
        // widen BEFORE the ×1e6 (x125 contract; HUGEINT on the oracle side)
        expr("cast(cast(trunc_lost as decimal(38,0)) * 1000000 div n_tokens as bigint)")
          .as("trunc_ppm"),
        col("pad_tokens"),
        expr("cast(cast(pad_tokens as decimal(38,0)) * 1000000 div slots as bigint)")
          .as("pad_ppm"))
      .orderBy("lang", "ctx_len")
  }

  val all: Seq[Q] = Seq(chunkDedup, repetitionScore, contamination, hashSample,
    seqPacking, stratifiedTopK, refIntegrity, temperatureMix, ragChunking,
    driftMonitor, bloomNovelty, quotaSample, budgetSelect, epochPlan, dsirResample,
    cdcChunks, passageDedup, packingWaste)
}
