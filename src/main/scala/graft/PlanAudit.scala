package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape audit: prints `explain(formatted)` for headline queries and
  * greps the physical plan for the properties that matter at 100 TB —
  * parquet pushdown (`PushedFilters`), column pruning (`ReadSchema`),
  * broadcast of dims, `TakeOrderedAndProject` for top-k, whole-stage
  * codegen coverage. Run: `sbt "runMain graft.PlanAudit [queryName ...]"`.
  */
object PlanAudit {

  private[graft] val checks: Map[String, Seq[String]] = Map(
    // pushdown showcase: both filters reach the scan, 2-column read
    "t05_forecast_revenue" -> Seq("PushedFilters: \\[.*GreaterThanOrEqual\\(l_shipdate", "codegen id"),
    // dims broadcast, no fact-table shuffle on dim keys
    "t02_revenue_region" -> Seq("BroadcastHashJoin", "BroadcastExchange"),
    // top-k must not global-sort
    "t03_shipping_priority" -> Seq("TakeOrderedAndProject"),
    "r01_poll_batch"        -> Seq("TakeOrderedAndProject"),
    // semi join stays a join (no aggregate blowup)
    "t04_order_priority" -> Seq("LeftSemi"),
    // LSH bucket joins are equi joins, not nested loops
    "x07_ann_lsh"        -> Seq("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
    "x21_ann_multiprobe" -> Seq("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
    // IVF: centroids broadcast into the assignment, cell join is equi
    "x22_ann_ivf" -> Seq("BroadcastNestedLoopJoin|BroadcastExchange",
      "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
    // multi-table LSH: the table union is ONE (t, bucket) equi join
    "x24_ann_lsh_multitable" -> Seq("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
    // codegen'd custom expressions appear inline in the projection; the
    // round-robin spread must sit under the pair loop — the audit corpus is
    // a single file, whose 1-partition scan would otherwise serialize the
    // quadratic work (r6; identity on a many-split corpus)
    "x05_cosine_neardup" -> Seq("dot_f32", "codegen id",
      "(?i)roundrobinpartitioning"),
    // brute-force top-k: query side broadcasts AND the corpus-scan side is
    // spread before the per-row dot products (same r6 policy as x05)
    "x06_cosine_topk" -> Seq("BroadcastNestedLoopJoin|BroadcastHashJoin",
      "(?i)roundrobinpartitioning"),
    "x03_simhash"        -> Seq("simhash32", "codegen id"),
    "x11_fingerprint"    -> Seq("doc_fingerprint", "codegen id"),
    "x26_repetition"     -> Seq("bigram_stats", "codegen id"),
    // dedup pack: band/shingle joins are equi joins, never nested loops
    "x02_minhash_lsh"   -> Seq("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
    "x04_ngram_jaccard" -> Seq("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
    // contamination: the benchmark gram set is BROADCAST — the corpus side
    // (the 100 TB side) must never shuffle for the join
    "x27_contamination" -> Seq("BroadcastHashJoin", "BroadcastExchange"),
    // packing is one exchange on source + in-partition running sum
    "x29_seq_packing" -> Seq("WindowExec|Window", "codegen id"),
    // stratified top-k (re-planned r9): the bounded TopKPairAgg UDAF
    // (ObjectHashAggregate) replaces the per-stratum row_number window —
    // map tasks forward ≤ 5 pairs per stratum, no rank window anywhere
    "x30_stratified_topk" -> Seq("(?i)topkpairagg", "ObjectHashAggregate",
      "(?s)\\A(?!.*row_number).*", "(?s)\\A(?!.*ntile).*"),
    // corpus stats: tf⨝df is a FORCED shuffle-hash equi join on the word
    // key (df is vocabulary-cardinality — Heaps' law makes a broadcast of
    // it corpus-scale wrong); the scalar doc-count side stays broadcast
    "x34_tfidf_topterms" -> Seq("ShuffledHashJoin",
      "BroadcastExchange"),
    "x35_bigram_lift" -> Seq("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)",
      "BroadcastExchange"),
    // cross-source overlap: digest self-join stays an equi join
    "x36_source_overlap" -> Seq("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
    // correlated subqueries must decorrelate: scalar subquery → aggregate +
    // equi join; NOT EXISTS → left anti. A per-row re-execution would show
    // neither (and be quadratic at scale).
    "t23_correlated_avg" -> Seq("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
    "t24_solo_supplier"  -> Seq("LeftAnti"),
    // bucketed range join: an EQUI join on (type, bucket), never a BNL
    "t26_range_join" -> Seq("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
    // pagerank rounds are equi joins over the cached edge list
    "x47_pagerank" -> Seq("(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)",
      "InMemoryTableScan"),
    // inverted index: the posting-list head must be the bounded BottomKAgg
    // UDAF (ObjectHashAggregate), never an unbounded collect_list
    "x53_inverted_index" -> Seq("(?i)bottomkagg", "ObjectHashAggregate",
      "(?s)\\A(?!.*collect_list).*"),
    // stopword index: same bounded aggregate, per-language doc counts are a
    // broadcast dim (the token-key exchange is the only big shuffle)
    "x56_stopword_index" -> Seq("(?i)bottomkagg", "BroadcastExchange",
      "(?s)\\A(?!.*collect_list).*"),
    // semantic dedup: centroids broadcast into the assignment; the
    // within-cell pair join is an EQUI join on c_id, never a nested loop
    "x57_semantic_dedup" -> Seq("BroadcastExchange",
      "(?s)\\A(?!.*CartesianProduct).*"),
    // decile binning: one lang-partitioned window, no extra exchanges
    // decile binning (re-planned r9): the (lang, n_chars) value HISTOGRAM
    // is the only corpus-sized aggregate and there is NO per-language
    // doc-row rank window — ntile's absence is the pin; the windows that
    // remain ride domain-sized histogram rows / boundary tie groups
    "x58_len_deciles" -> Seq("Keys \\[2\\]: \\[lang#\\d+, n_chars#\\d+L\\]",
      "(?s)\\A(?!.*ntile).*", "codegen id"),
    // positional index: a single Generate (posexplode) feeds the aggregate —
    // no window or self-join to recover token order
    "x59_positional_index" -> Seq("Generate", "codegen id",
      "(?s)\\A(?!.*SortMergeJoin).*"),
    // salted skew join: the forced shuffle join runs on (type, salt), so
    // the salt column must appear in the join — 40 balanced keys, not 5
    "x61_salted_join" -> Seq("SortMergeJoin|ShuffledHashJoin", "d_salt"),
    // trigram LM: the vocabulary-sized ppm model must broadcast into the
    // scoring join — the corpus-sized trigram stream never shuffles on tri
    "x66_trigram_lm" -> Seq("BroadcastHashJoin", "BroadcastExchange", "char_ngrams"),
    // CDC merge: one full-outer equi join on the key, never a nested loop
    "x67_merge_apply" -> Seq("FullOuter", "(SortMergeJoin|ShuffledHashJoin)"),
    // NFC canonicalization is a codegen'd row-local projection
    "x68_nfc_clean" -> Seq("nfc_normalize", "codegen id"),
    // quantized ANN: the small query side broadcasts (x06's shape) — the
    // corpus-side code scan must never shuffle into the join
    "x69_quantized_topk" -> Seq("BroadcastHashJoin|BroadcastNestedLoopJoin", "BroadcastExchange"),
    // PII redaction is a codegen'd row-local regex projection
    "x70_pii_redact" -> Seq("regexp_replace", "codegen id"),
    // HOF array surface runs inside whole-stage codegen, no mid-plan exchange
    "f13_array_funcs" -> Seq("codegen id", "(?s)\\A(?!.*Exchange hashpartitioning).*"),
    // gap fill: the user×day grid builds from a BROADCAST day dimension;
    // the LOCF fill is a window, not a self-join
    "x71_gap_fill" -> Seq("BroadcastExchange", "Window"),
    // trailing-7-day actives: the day dimension broadcasts into the range
    // join — the distinct (user, day) activity set never shuffles for it
    "x72_cumulative_uniques" -> Seq("BroadcastNestedLoopJoin", "BroadcastExchange"),
    // OOV scoring: vocab is a TakeOrdered top-k that BROADCASTS into the
    // token stream — the corpus side never shuffles on the token key
    "x73_oov_rate" -> Seq("TakeOrderedAndProject", "BroadcastHashJoin"),
    // SAX: breakpoints and the reference word are broadcast 1-row dims;
    // the word build is a bounded 6-element collect, never corpus state;
    // the global quartiles ride the spillable histogram (no built-in
    // percentile buffer over the user-cardinality seg_sum domain — r10)
    "x79_sax_similarity" -> Seq("BroadcastExchange", "BroadcastNestedLoopJoin",
      "(?s)\\A(?!.*percentile\\().*"),
    // incremental dedup: delta probes the index via an EQUI join on
    // (band, sig) — never a nested loop over the corpus
    "x80_incremental_dedup" -> Seq(
      "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)",
      "(?s)\\A(?!.*BroadcastNestedLoopJoin).*"),
    // winsorized sum: the group-sized bounds table BROADCASTS back to the
    // fact — the fact side never shuffles for the clip — and the bounds
    // come from the spillable histogram formulation: the built-in
    // percentile's non-spillable ObjectHashAggregate buffer (which OOMed
    // the 2 GB sf1 proof) must never reappear in this plan
    "t29_winsorized_revenue" -> Seq("BroadcastHashJoin", "BroadcastExchange",
      "(?s)\\A(?!.*ObjectHashAggregate).*"),
    // exact percentiles: BOTH columns run the histogram plan (window over
    // the value domain) since r10 — any `percentile(` in the plan means
    // the non-spillable built-in buffer regressed (PlanSweep also bans it
    // suite-wide; this pin keeps the per-query failure message precise)
    "t21_percentiles" -> Seq("WindowExec|Window",
      "(?s)\\A(?!.*percentile\\().*"),
    // r10 migrations off the built-in exact-percentile aggregate: the GK
    // sketch (percentile_approx) is the ONLY percentile-named aggregate
    // f11 may contain — `percentile(` (exact) must not reappear
    "f11_approx_percentile" -> Seq("percentile_approx",
      "(?s)\\A(?!.*percentile\\().*", "WindowExec|Window"),
    "x39_len_quartiles" -> Seq("(?s)\\A(?!.*percentile\\().*",
      "WindowExec|Window"),
    "x54_mad_outliers" -> Seq("(?s)\\A(?!.*percentile\\().*",
      "WindowExec|Window", "BroadcastHashJoin"),
    // drift monitor: ONE conditional-aggregation scan — no join anywhere
    "x82_drift_monitor" -> Seq("(?s)\\A(?!.*Join).*", "HashAggregate"),
    // interpolation: windows over the broadcast-built grid, no self-join
    "x84_interpolate" -> Seq("BroadcastExchange", "Window",
      "(?s)\\A(?!.*SortMergeJoin).*"),
    // LSH verify: the candidate doc set SEMI-JOINS the corpus before any
    // shingle is generated — the verify stage never re-shingles the corpus
    "x86_lsh_verify" -> Seq("LeftSemi", "BroadcastExchange"),
    // label affinity: centroid pairing is an EQUI join on the dimension
    // index over label-count-sized tables — never a cartesian of vectors
    "x87_label_affinity" -> Seq("HashAggregate",
      "(?s)\\A(?!.*CartesianProduct).*"),
    // span dedup: the df mark-back is a digest equi-join FORCED to
    // shuffle-hash — a BroadcastHashJoin here means Catalyst's estimate
    // re-picked a corpus-cardinality broadcast (the 2 GB sf1 killer)
    "x88_span_dedup" -> Seq("ShuffledHashJoin",
      "(?s)\\A(?!.*CartesianProduct).*"),
    // BPE pairs: partial-agg word counts, top-50 never global-sorts
    "x89_bpe_pairs" -> Seq("HashAggregate", "TakeOrderedAndProject"),
    // bloom novelty: the exact verify is a semi join downstream of the
    // bloom-UDF prefilter — and never a nested loop
    "x90_bloom_novelty" -> Seq("LeftSemi",
      "(?s)\\A(?!.*BroadcastNestedLoopJoin).*"),
    // simhash banding: signature is codegen'd, the band join is an equi
    // join — the quadratic all-pairs shape lives only in the oracle
    "x91_simhash_bands" -> Seq("simhash32",
      "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)",
      "(?s)\\A(?!.*BroadcastNestedLoopJoin).*",
      "(?s)\\A(?!.*CartesianProduct).*"),
    // listagg: dims broadcast into both legs, groups dimension-bounded
    "f15_listagg" -> Seq("BroadcastHashJoin", "BroadcastExchange"),
    // skip-gram co-occurrence: pair generation is row-local — NO join in
    // the plan at all; top-40 never global-sorts
    "x92_skipgram_cooc" -> Seq("(?s)\\A(?!.*Join).*", "HashAggregate",
      "TakeOrderedAndProject", "(?i)roundrobinpartitioning"),
    // ANN recall eval: the hit check is a semi join on (q_id, n_id) over
    // top-k-sized sets
    "x93_ann_recall" -> Seq("LeftSemi"),
    // PQ: codebook and ADC lookup table broadcast into equi joins — the
    // corpus never shuffles for either, and no cartesian anywhere
    "x94_pq_ann" -> Seq("BroadcastHashJoin", "BroadcastExchange",
      "(?s)\\A(?!.*CartesianProduct).*",
      "(?s)\\A(?!.*BroadcastNestedLoopJoin).*"),
    // vocab growth: the corpus count broadcasts into row-local decile
    // arithmetic; the word aggregates are hash aggregates (first-occurrence
    // trick — no count-distinct over growing prefixes)
    "x95_vocab_growth" -> Seq("BroadcastExchange", "HashAggregate",
      "(?s)\\A(?!.*CartesianProduct).*"),
    // IVF-PQ: cell assign/residual/encode are row-local against literal
    // model parameters; the ADC table broadcasts into an equi join
    "x97_ivfpq_ann" -> Seq("BroadcastHashJoin", "BroadcastExchange",
      "(?s)\\A(?!.*CartesianProduct).*",
      "(?s)\\A(?!.*BroadcastNestedLoopJoin).*"),
    // BM25: the 3-term query dim broadcasts into the token stream (only
    // matches survive to any exchange), df/corpus stats broadcast back,
    // and the top-20 never global-sorts
    // …and the doc-length join is FORCED shuffle-hash (dl is the whole
    // corpus's (doc_id, length) — a broadcast of it is corpus-scale wrong)
    "x98_bm25_rank" -> Seq("BroadcastHashJoin", "BroadcastExchange",
      "TakeOrderedAndProject", "ShuffledHashJoin"),
    // heavy hitters: the SpaceSaving candidate union (≤64/partition)
    // broadcasts into the exact verify — the token stream never shuffles
    // on the term key
    "x99_heavy_hitters" -> Seq("BroadcastHashJoin", "BroadcastExchange"),
    // zone skipping: one scan, row-local layout fan-out, zone-granularity
    // aggregates — no join anywhere
    "x100_zone_skipping" -> Seq("(?s)\\A(?!.*Join).*", "HashAggregate",
      "Generate"),
    // quota sampling: selection is the bounded pair UDAF, the quota table
    // broadcasts, and no window ever touches the document stream (the one
    // Window in the plan ranks the source-count-sized apportionment table)
    "x101_quota_sample" -> Seq("(?i)bottomkpairagg", "ObjectHashAggregate",
      "BroadcastHashJoin"),
    // deletion-key fuzzy join: candidates equi-join on the digest key —
    // the all-pairs shape lives only in the oracle
    "x102_fuzzy_prefix_join" -> Seq(
      "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)",
      "(?s)\\A(?!.*CartesianProduct).*",
      "(?s)\\A(?!.*BroadcastNestedLoopJoin).*"),
    // BPE merge round: the winning merge is a 1-row broadcast into a
    // row-local projection over the (word, count) vocabulary; top-20
    // never global-sorts
    "x104_bpe_merge" -> Seq("BroadcastExchange", "TakeOrderedAndProject",
      "(?s)\\A(?!.*CartesianProduct).*"),
    // hash classifier: the 256-bucket model BROADCASTS into the scoring
    // pass — the token stream never shuffles on a text-derived key for it
    "x105_hash_classifier" -> Seq("BroadcastHashJoin", "BroadcastExchange"),
    // BPE encode: the merge chain is row-local over the vocabulary — the
    // only exchanges are the two hash aggregates and the final top-50
    "x106_bpe_encode" -> Seq("TakeOrderedAndProject", "codegen id"),
    // prefix join proposes and verifies through EQUI joins; the verify
    // side is candidate-pruned by a broadcast semi-join
    "x107_prefix_allpairs" -> Seq(
      "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)",
      "BroadcastExchange", "LeftSemi"),
    // SNM: the window sees only (doc_id, key); the verify probes the
    // digest index with equi joins
    "x108_sorted_neighborhood" -> Seq("WindowExec|Window",
      "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
    // bitext margins: query batch and candidate set broadcast — the far
    // side never shuffles on a similarity key
    "x109_bitext_margin" -> Seq("BroadcastExchange",
      "BroadcastNestedLoopJoin|BroadcastHashJoin"),
    // CM sketch: ONE partial-aggregated exchange to the 2048-cell matrix,
    // which then broadcasts into the estimate join
    "f16_countmin" -> Seq("BroadcastHashJoin", "BroadcastExchange",
      "TakeOrderedAndProject"),
    // rank eval joins two candidate-scale rankings on (q_id, n_id)
    "x110_ann_rank_eval" -> Seq(
      "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
    // budget selection: the bin histogram + boundary windows replace the
    // global sort; the bin/crossing tables broadcast into the doc stream
    "x111_budget_select" -> Seq("BroadcastHashJoin", "BroadcastExchange",
      "WindowExec|Window"),
    // label propagation: rounds are equi-joins + argmax windows, and the
    // memoized pair lineage is an InMemoryRelation, never recomputed
    "x112_label_prop" -> Seq(
      "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)",
      "(?i)inmemory"),
    // minhash-error audit is candidate-bounded: the cached candidate
    // shingle slice feeds both the signatures and the exact join
    "x113_minhash_error" -> Seq("(?i)inmemory",
      "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
    // calibration rides x105's broadcast-model scoring
    "x114_calibration" -> Seq("BroadcastHashJoin", "BroadcastExchange"),
    // source prior: aggregates + one broadcast scalar, no per-doc join
    "x115_source_prior" -> Seq("BroadcastExchange"),
    // tombstone propagation rides the memoized labels; election windows
    "x117_tombstone_propagate" -> Seq("(?i)inmemory", "WindowExec|Window"),
    // near-dup decontamination is a filter+aggregate over x86's verified
    // pairs — candidate-scale joins only
    "x118_neardup_contamination" -> Seq(
      "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"),
    // gate attribution: one corpus pass, the only fan-out is the literal
    // 4-element gate explode
    "x119_gate_attribution" -> Seq("Generate", "codegen id"),
    // epoch plan: source-sized aggregate + broadcast scalar
    "x120_epoch_plan" -> Seq("BroadcastExchange"),
    // DSIR: the 1024-row model broadcasts into row-local scoring — the
    // corpus never shuffles on a text key
    "x121_dsir_resample" -> Seq("BroadcastHashJoin", "BroadcastExchange",
      "char_ngrams"),
    // fertility rides the |V|-scaled vocabulary aggregate
    "x122_bpe_fertility" -> Seq("codegen id"),
    // passage dedup: row-local generator (digests inside the lambda), ONE
    // digest window — no join anywhere in the plan
    "x125_passage_dedup" -> Seq("(?s)\\A(?!.*Join).*", "Generate",
      "WindowExec|Window", "codegen id"),
    // gopher rules: pure scan → aggregate, no join, no window
    "x126_gopher_rules" -> Seq("(?s)\\A(?!.*Join).*",
      "(?s)\\A(?!.*Window).*", "HashAggregate", "codegen id"),
    // containment join: candidate joins are equi joins over the MEMOIZED
    // prefix/shingle index (InMemory scan), never nested loops
    "x127_containment_join" -> Seq("(?i)inmemory",
      "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)",
      "(?s)\\A(?!.*NestedLoop).*"),
    // moments: posexplode → 64-group aggregate; no join, no window
    "x128_embedding_moments" -> Seq("(?s)\\A(?!.*Join).*",
      "(?s)\\A(?!.*Window).*", "Generate", "HashAggregate"),
    // k-center: the RETURNED plan is the 8-literal Voronoi aggregate joined
    // to the 8-row pick frame — the corpus side never shuffles on a key
    "x129_kcenter_coreset" -> Seq("dot_f32", "HashAggregate"),
    // CCNet buckets (re-planned r9): scores ride the memoized x66 lineage
    // (InMemory scan) into a (lang, score) histogram + row-local bucket
    // arithmetic — NO per-language doc-row ntile window (the r8 verdict's
    // single-hot-task shape); only boundary tie groups sort doc rows
    "x130_ccnet_buckets" -> Seq("(?i)inmemory",
      "(?s)\\A(?!.*ntile).*", "WindowExec|Window"),
    // source affinity: centroid self-join on the dim key is an equi join
    // over a #sources×64-row aggregate — never a nested loop
    "x131_source_affinity" -> Seq("HashAggregate",
      "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)",
      "(?s)\\A(?!.*NestedLoop).*"),
    // JL audit (r9 sample-side contract): the comparison side is a bounded
    // hash sample via TakeOrdered — constant ≤400×4000 pair budget at any
    // corpus size; projections row-local dot_f32 folds after selection
    "x132_jl_distortion" -> Seq("dot_f32", "TakeOrderedAndProject",
      "BroadcastNestedLoopJoin|BroadcastHashJoin", "HashAggregate"),
    // k-anonymity: pure two-level aggregate — no join, no window
    "x133_k_anonymity" -> Seq("(?s)\\A(?!.*Join).*",
      "(?s)\\A(?!.*Window).*", "HashAggregate"),
    // l-diversity: (class, value) then class roll-up — two-level hash
    // aggregate, no join, no window (x133's shape with a value level)
    "x134_l_diversity" -> Seq("(?s)\\A(?!.*Join).*",
      "(?s)\\A(?!.*Window).*", "HashAggregate"),
    // robust dim quantiles ride the t21 spillable histogram plan: the
    // (dim, micro) histogram aggregate, no built-in percentile buffer
    "x135_dim_quantiles" -> Seq("Keys \\[2\\]: \\[dim#\\d+L, micro#\\d+L?\\]",
      "(?s)\\A(?!.*percentile).*", "WindowExec|Window"),
    // shard plan: the |languages| shard-count dim BROADCASTS; assignment
    // is row-local; no window anywhere
    "x136_shard_plan" -> Seq("BroadcastExchange", "BroadcastHashJoin",
      "(?s)\\A(?!.*Window).*", "HashAggregate"),
    // cluster-safe split rides the MEMOIZED labels (InMemory scan); every
    // join is an equi join, never a nested loop
    "x137_cluster_split" -> Seq("(?i)inmemory",
      "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)",
      "(?s)\\A(?!.*NestedLoop).*"),
    // label dispersion: the moments identity — posexplode feeding
    // map-side-combined aggregates, label-cardinality joins, NO pair join
    "x138_label_dispersion" -> Seq("Generate", "HashAggregate",
      "(?s)\\A(?!.*CartesianProduct).*", "(?s)\\A(?!.*Window).*"),
    // source minhash: rides the memoized shingle index (InMemory); the
    // exact-audit self-join is an EQUI join on sh; the |sources|² sketch
    // compare is a broadcast of constant-width signature rows
    "x139_source_minhash" -> Seq("(?i)inmemory",
      "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", "BroadcastExchange",
      "(?s)\\A(?!.*CartesianProduct).*"),
    // embedding outliers: the 64-row fence table BROADCASTS back into a
    // row-local probe; quantile fit is the t21 histogram (no percentile)
    "x140_embedding_outliers" -> Seq("BroadcastExchange", "BroadcastHashJoin",
      "(?s)\\A(?!.*percentile).*", "HashAggregate"),
    // vocab curve: everything after the token-count aggregate is
    // vocabulary/constant-sized — TakeOrdered head, broadcast cross of
    // the 4-row size dim, NO corpus probe pass
    "x141_vocab_curve" -> Seq("TakeOrderedAndProject", "BroadcastExchange",
      "HashAggregate"),
    // HLL union: rides the memoized shingle index (InMemory); registers
    // come from plain hash aggregates — no window over any corpus-sized
    // stream anywhere in the plan
    "x142_hll_union" -> Seq("(?i)inmemory", "HashAggregate",
      "(?s)\\A(?!.*Window).*"),
    // RRF fusion: the query batch broadcasts into BOTH legs — the corpus
    // never shuffles on a similarity key; per-leg/fused top-k are q_id-
    // partitioned windows over candidate-scale rows
    "x143_rrf_fusion" -> Seq("BroadcastExchange",
      "BroadcastNestedLoopJoin|BroadcastHashJoin", "WindowExec|Window"),
    // centroid confusion: centroids + totals broadcast; assignment is the
    // x22/x57 broadcast + partial-agg shape, never a cartesian of vectors
    "x144_centroid_confusion" -> Seq("BroadcastExchange",
      "BroadcastNestedLoopJoin|BroadcastHashJoin", "HashAggregate",
      "(?s)\\A(?!.*CartesianProduct).*"),
    // batch novelty: rides the memoized shingle index; digest-keyed hash
    // aggregates + ONE digest equi join — no window over doc/shingle rows
    "x145_batch_novelty" -> Seq("(?i)inmemory", "HashAggregate",
      "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)",
      "(?s)\\A(?!.*Window).*"),
    // packing waste: row-local literal fan-out + ONE hash aggregate — no
    // join, no window, codegen end to end
    "x146_packing_waste" -> Seq("(?s)\\A(?!.*Join).*", "Generate",
      "HashAggregate", "codegen id"),
    // covariance audit: the whole corpus collapses through the mergeable
    // VecOuterAgg state (ObjectHashAggregate); everything after is
    // constant-sized (2,016-row pair map broadcast, rank window over it)
    "x147_cov_offdiag" -> Seq("(?i)vecouteragg", "ObjectHashAggregate",
      "BroadcastExchange|BroadcastNestedLoopJoin", "WindowExec|Window"),
    // token drift: vocabulary-sized aggregates only, totals broadcast,
    // top-10 head is a bounded TakeOrdered — never a global vocab sort,
    // and no window over any vocab/corpus-sized stream (the rank window
    // runs over the 10-row head)
    "x148_token_drift" -> Seq("HashAggregate", "BroadcastExchange",
      "TakeOrderedAndProject"),
    // KS length distance: ONE (lang, n_chars) histogram aggregate; the
    // cumulative/argmax windows ride the bounded |langs|x|domain| grid
    "x149_ks_length" -> Seq("HashAggregate", "WindowExec|Window",
      "BroadcastExchange"),
    // classifier AUC: x105's broadcast-model scoring, then a bounded-
    // domain score histogram + cumulative window; no exact-percentile
    // buffer anywhere
    "x150_classifier_auc" -> Seq("BroadcastHashJoin", "BroadcastExchange",
      "WindowExec|Window", "(?s)\\A(?!.*percentile\\().*"),
    // Simpson diversity: the Σc² fold is ROW-LOCAL (sorted-run lengths of
    // the token array) — the plan must stay a pure scan+project: no join,
    // no aggregate, no window anywhere; the only exchange is the final
    // sort's range partitioning
    "x151_simpson_diversity" -> Seq("(?s)\\A(?!.*Join).*",
      "(?s)\\A(?!.*HashAggregate).*", "(?s)\\A(?!.*WindowExec).*"),
    // winnowing: selection is row-local, pairs come from the df-capped
    // per-fingerprint id list (x02/x91 discipline) — NO fingerprint
    // self-join may ever appear; collect_list rides ObjectHashAggregate
    "x152_winnowing" -> Seq("(?s)\\A(?!.*Join).*", "ObjectHashAggregate",
      "Generate"),
    // chi-square balance: one (lang, source) aggregate, marginals crossed
    // via broadcast (BroadcastNestedLoopJoin, never CartesianProduct),
    // top-10 head is a bounded TakeOrdered
    "x153_chi2_balance" -> Seq("HashAggregate",
      "BroadcastNestedLoopJoin|BroadcastExchange", "TakeOrderedAndProject",
      "(?s)\\A(?!.*CartesianProduct).*"),
    // rank concordance: ONE corpus aggregate feeds the CACHED cells
    // (InMemory), every window over the domain grid is PARTITIONED
    "x154_rank_concordance" -> Seq("(?i)inmemory", "WindowExec|Window",
      "BroadcastExchange", "(?s)\\A(?!.*CartesianProduct).*"),
    // burstiness: (doc, token) aggregate then vocab aggregate; the top-20
    // head must be a bounded TakeOrdered, never a global vocab sort
    "x155_burstiness" -> Seq("HashAggregate", "TakeOrderedAndProject",
      "BroadcastExchange"),
    // cluster density: pure rider on the memoized pair + label caches —
    // the expensive lineage must come from InMemory, never be re-derived
    "x156_cluster_density" -> Seq("(?i)inmemory", "HashAggregate"),
    // threshold sweep: same rider contract, plus the 5-way tau explode
    "x157_threshold_sweep" -> Seq("(?i)inmemory", "Generate", "HashAggregate"),
    // embedding drift: the x128 shape — posexplode into a 64-group
    // conditional aggregate, count broadcast, bounded TakeOrdered head
    "x158_embedding_drift" -> Seq("Generate", "HashAggregate",
      "BroadcastExchange", "TakeOrderedAndProject"),
    // weighted median: the histogram discipline with weights — one
    // (source, n_chars) aggregate, PARTITIONED cumulative windows, and
    // never the banned exact-percentile buffer
    "x159_weighted_median" -> Seq("HashAggregate", "WindowExec|Window",
      "(?s)\\A(?!.*percentile\\().*"),
    // cluster separability: ONE corpus posexplode aggregate (x33 shape),
    // global sums broadcast back into label-cardinality work — no join or
    // window ever touches corpus-scale rows
    "x160_cluster_separability" -> Seq("Generate", "HashAggregate",
      "BroadcastExchange"),
    // SQ recon error: one row-local pass into a bounded histogram — no
    // join, no window, codegen'd quantize/dequantize fold
    "x161_sq_recon_error" -> Seq("HashAggregate", "codegen id",
      "(?s)\\A(?!.*SortMergeJoin).*"))

  /** Execute one audited query and evaluate its plan patterns — shared by
    * the CLI main and PlanShapeSpec (so plan-shape regressions fail CI, not
    * just the manual audit).
    */
  private[graft] def auditOne(spark: SparkSession, sfDir: String, name: String)
      : (String, Seq[(String, Boolean)]) = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect() // execute THIS QueryExecution so AQE finalizes + codegen ids materialize
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    (plan, checks.getOrElse(name, Nil).map(pat => pat -> pat.r.findFirstIn(plan).isDefined))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = if (args.nonEmpty) args.toSeq else checks.keys.toSeq.sorted
    var bad   = 0
    names.foreach { name =>
      val (plan, results) = auditOne(spark, sfDir, name)
      println(s"\n========== $name ==========")
      println(plan.linesIterator.take(40).mkString("\n"))
      results.foreach { case (pat, ok) =>
        if (!ok) bad += 1
        println(s"  [${if (ok) "PASS" else "FAIL"}] plan contains /$pat/")
      }
    }
    println(s"\nplan audit: ${if (bad == 0) "all checks passed" else s"$bad FAILED"}")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
