package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline surface
  * (builder mandate; SURVEY.md §2.B extension table): language ID
  * (stopword-profile heuristic), quality scoring, token counting
  * (whitespace + BPE-ish regex), and bottom-k document fingerprinting.
  *
  * All four are single-pass projections/aggregations over `documents` —
  * narrow transforms plus one hash aggregate, the shape that scales linearly
  * with input size. Ratios are exact integer quotients rounded to 6 dp.
  */
object TextOps {

  // NOT computeParallel: measured 4.10 → 4.98 s across the 8-query family
  // when the spread was added (r6) — this family's row-local text CPU on the
  // current corpus (~1.7 MB of text) is smaller than one round-robin
  // exchange, unlike the shingle/dot-product lineages where the spread pays.
  // At corpus scale the scan is already parallel either way.
  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  private val stopwords = Map(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "fr" -> Seq("le", "la", "les", "et", "des"))

  /** n matching words for one language profile (array intersection count —
    * no explode, stays inside whole-stage codegen).
    */
  /** Stopword-profile count over the inlined split: for PURE-SCALAR uses
    * (size / array_distinct / one whole-array filter) whole-stage codegen's
    * common-subexpression elimination already evaluates the split once per
    * row, and an explicit split projection measured SLOWER (x09 16.3 →
    * 40.1 s at 100×, round-14 A/B) — the O(L²) re-split hazard only exists
    * for per-ELEMENT lambda references (element_at/slice inside transform),
    * which interpreted HOF eval re-computes per element.
    */
  private def hits(lang: String): Column =
    size(filter(split(col("text"), " "), w => w.isInCollection(stopwords(lang))))

  /** Same profile count over a pre-split `ws` words column (shared by the
    * lang-ID and pipeline queries so the gates can't silently diverge).
    */
  private def hitsInWs(lang: String): Column =
    size(filter(col("ws"), w => w.isInCollection(stopwords(lang))))
  private def hitsSql(lang: String): String = {
    val set = stopwords(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_filter(string_split(text, ' '), w -> w IN ($set)))"
  }

  /** Language ID via stopword-profile scores + CJK character detection;
    * argmax with a fixed priority order (en > de > es > fr > zh > und).
    * Output is the (label, predicted) confusion matrix.
    */
  val langId: Q = Q(
    "x08_lang_id",
    s"""SELECT lang, pred, count(*) AS n FROM (
       |  SELECT lang,
       |    CASE WHEN zh > 0 THEN 'zh'
       |         WHEN en >= de AND en >= es AND en >= fr AND en > 0 THEN 'en'
       |         WHEN de >= es AND de >= fr AND de > 0 THEN 'de'
       |         WHEN es >= fr AND es > 0 THEN 'es'
       |         WHEN fr > 0 THEN 'fr'
       |         ELSE 'und' END AS pred
       |  FROM (SELECT lang, ${hitsSql("en")} AS en, ${hitsSql("de")} AS de,
       |               ${hitsSql("es")} AS es, ${hitsSql("fr")} AS fr,
       |               len(regexp_extract_all(text, '[一-鿿]')) AS zh
       |        FROM documents))
       |GROUP BY lang, pred ORDER BY lang NULLS FIRST, pred NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    // split once, score all profiles over the same words array
    val scored = docs(s, dir)
      .select(col("lang"), col("text"), split(col("text"), " ").as("ws"))
      .select(
        col("lang"),
        hitsInWs("en").as("en"), hitsInWs("de").as("de"),
        hitsInWs("es").as("es"), hitsInWs("fr").as("fr"),
        regexp_count(col("text"), lit("[一-鿿]")).as("zh"))
    scored
      .withColumn("pred",
        when(col("zh") > 0, "zh")
          .when(col("en") >= col("de") && col("en") >= col("es") && col("en") >= col("fr") && col("en") > 0, "en")
          .when(col("de") >= col("es") && col("de") >= col("fr") && col("de") > 0, "de")
          .when(col("es") >= col("fr") && col("es") > 0, "es")
          .when(col("fr") > 0, "fr")
          .otherwise("und"))
      .groupBy("lang", "pred")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred")
  }

  /** Quality score per document: word count, stopword ratio, type-token
    * ratio, composite score — length/stopword/diversity heuristics of a
    * pretraining quality filter.
    */
  val qualityScore: Q = Q(
    "x09_quality_score",
    s"""SELECT doc_id, n_words,
       |  round(CAST(stop_n AS DOUBLE) / n_words, 6) AS stop_ratio,
       |  round(CAST(uniq_n AS DOUBLE) / n_words, 6) AS ttr,
       |  round(least(n_words / 100.0, 1.0) * 0.5 + (CAST(stop_n AS DOUBLE) / n_words) * 0.3
       |        + (CAST(uniq_n AS DOUBLE) / n_words) * 0.2, 6) AS score
       |FROM (SELECT doc_id, len(string_split(text, ' ')) AS n_words,
       |             ${hitsSql("en")} AS stop_n,
       |             len(list_distinct(string_split(text, ' '))) AS uniq_n
       |      FROM documents)
       |ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    // inlined split is optimal here: pure-scalar uses, codegen CSE dedups
    // it (the explicit projection measured 2.5x SLOWER — see hits scaladoc)
    val w = split(col("text"), " ")
    val base = docs(s, dir).select(
      col("doc_id"),
      size(w).as("n_words"),
      hits("en").as("stop_n"),
      size(array_distinct(w)).as("uniq_n"))
    val stopR = col("stop_n").cast("double") / col("n_words")
    val ttr   = col("uniq_n").cast("double") / col("n_words")
    base.select(
        col("doc_id"), col("n_words"),
        round(stopR, 6).as("stop_ratio"),
        round(ttr, 6).as("ttr"),
        round(least(col("n_words") / 100.0, lit(1.0)) * 0.5 + stopR * 0.3 + ttr * 0.2, 6).as("score"))
      .orderBy("doc_id")
  }

  /** Token counting per source: whitespace tokens, alphabetic tokens, and a
    * BPE-ish bounded-chunk tokenization (`[a-z]{1,4}|[0-9]{1,3}|punct`) —
    * the greedy-regex token estimate used for corpus sizing.
    */
  val tokenCount: Q = Q(
    "x10_token_count",
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(len(regexp_extract_all(text, '[^ ]+'))) AS BIGINT) AS ws_tokens,
      |  CAST(sum(len(regexp_extract_all(text, '[a-z]+'))) AS BIGINT) AS alpha_tokens,
      |  CAST(sum(len(regexp_extract_all(text, '[a-z]{1,4}|[0-9]{1,3}|[^a-z0-9 ]'))) AS BIGINT) AS bpe_tokens
      |FROM documents GROUP BY source ORDER BY source NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    docs(s, dir)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(regexp_count(col("text"), lit("[^ ]+"))).as("ws_tokens"),
        sum(regexp_count(col("text"), lit("[a-z]+"))).as("alpha_tokens"),
        sum(regexp_count(col("text"), lit("[a-z]{1,4}|[0-9]{1,3}|[^a-z0-9 ]"))).as("bpe_tokens"))
      .orderBy("source")
  }

  /** Document fingerprint: bottom-4 sketch over rolling 8-char shingle
    * hashes (winnowing-style selection, deterministic). Array-only pipeline —
    * no explode; the only shuffles are the final sort and, on an
    * under-partitioned corpus, the [[Tables.computeParallel]] spread.
    */
  val fingerprint: Q = Q(
    "x11_fingerprint",
    """SELECT doc_id,
      |  array_to_string(list_sort(list_distinct(
      |    list_transform(generate_series(1, greatest(length(text) - 7, 1)),
      |                   i -> md5(substr(text, CAST(i AS INT), 8)))))[1:4], '|') AS fp
      |FROM documents ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    // Codegen'd [[graft.functions.DocFingerprint]]: one pass with a bounded
    // bottom-4 selection on raw digests, replacing the interpreted HOF
    // pipeline (a 32-hex-char string per shingle + O(n²) array_distinct).
    // computeParallel: one MD5 per text position is the dominant cost and
    // a single-row-group corpus file would otherwise serialize it.
    Tables.computeParallel(docs(s, dir))
      .select(
        col("doc_id"),
        graft.functions.DocFingerprintFunctions.docFingerprint(col("text")).as("fp"))
      .orderBy("doc_id")
  }

  /** Shared scored→flags SQL CTE chain (x23 + the x32 streaming twin). */
  private[ops] val flagsSqlCtes: String =
    s"""scored AS (
       |  SELECT doc_id, source, text,
       |    len(string_split(text, ' ')) AS n_words,
       |    ${hitsSql("en")} AS en, ${hitsSql("de")} AS de,
       |    ${hitsSql("es")} AS es, ${hitsSql("fr")} AS fr,
       |    len(regexp_extract_all(text, '[一-鿿]')) AS zh,
       |    len(list_distinct(string_split(text, ' '))) AS uniq_n
       |  FROM documents),
       |flags AS (
       |  SELECT *, (zh = 0 AND en > 0 AND en >= de AND en >= es AND en >= fr) AS is_en,
       |    least(n_words / 100.0, 1.0) * 0.5 + (CAST(en AS DOUBLE) / n_words) * 0.3
       |      + (CAST(uniq_n AS DOUBLE) / n_words) * 0.2 AS score
       |  FROM scored)""".stripMargin

  /** Shared lang/quality gating as a projection over (doc_id, source, text)
    * — the Spark twin of [[flagsSqlCtes]], applied identically to the batch
    * scan (x23) and the micro-batch stream (x32).
    */
  private[ops] def cleanFlags(df: DataFrame): DataFrame = {
    val scored = df
      .select(col("doc_id"), col("source"), col("text"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("source"), col("text"),
        size(col("ws")).as("n_words"),
        hitsInWs("en").as("en"), hitsInWs("de").as("de"),
        hitsInWs("es").as("es"), hitsInWs("fr").as("fr"),
        regexp_count(col("text"), lit("[一-鿿]")).as("zh"),
        size(array_distinct(col("ws"))).as("uniq_n"))
    scored
      .withColumn("is_en", col("zh") === 0 && col("en") > 0 &&
        col("en") >= col("de") && col("en") >= col("es") && col("en") >= col("fr"))
      .withColumn("score",
        least(col("n_words") / 100.0, lit(1.0)) * 0.5 +
          (col("en").cast("double") / col("n_words")) * 0.3 +
          (col("uniq_n").cast("double") / col("n_words")) * 0.2)
  }

  /** The composed training-data cleaning pipeline — the flow the extension
    * pack exists for, as ONE declarative program: language-ID gate (en) →
    * quality-score gate → exact dedup (first doc per digest), reported as a
    * per-source funnel (docs in → en → quality → kept) plus kept token
    * volume. Single scan, two hash aggregates, one digest window — no stage
    * materializes an intermediate corpus, so the same plan runs at 100 TB.
    * The quality threshold compares the UNROUNDED score: both engines run
    * the identical IEEE arithmetic, whereas rounding first could flip a
    * boundary doc between engines. The gating CTEs come from
    * [[flagsSqlCtes]] so the batch and streaming (x32) funnels cannot
    * silently diverge.
    */
  val corpusClean: Q = Q(
    "x23_corpus_clean",
    s"""WITH $flagsSqlCtes,
       |base_agg AS (
       |  SELECT source, count(*) AS n_docs,
       |    CAST(sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
       |    CAST(sum(CASE WHEN is_en AND score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality
       |  FROM flags GROUP BY source),
       |elig AS (
       |  SELECT source, n_words,
       |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |  FROM flags WHERE is_en AND score >= 0.5),
       |kept AS (
       |  SELECT source,
       |    CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |    CAST(sum(CASE WHEN rn = 1 THEN n_words ELSE 0 END) AS BIGINT) AS kept_tokens
       |  FROM elig GROUP BY source)
       |SELECT b.source AS source, n_docs, n_en, n_quality,
       |       coalesce(n_kept, 0) AS n_kept, coalesce(kept_tokens, 0) AS kept_tokens
       |FROM base_agg b LEFT JOIN kept k ON b.source = k.source
       |ORDER BY source NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    val flags = cleanFlags(docs(s, dir))
    val baseAgg = flags.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("is_en"), 1).otherwise(0)).as("n_en"),
      sum(when(col("is_en") && col("score") >= 0.5, 1).otherwise(0)).as("n_quality"))
    val elig = flags.where(col("is_en") && col("score") >= 0.5)
      .select(col("source"), col("n_words"), col("doc_id"), md5(col("text")).as("digest"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("digest").orderBy("doc_id")))
    val kept = elig.groupBy("source").agg(
      sum(when(col("rn") === 1, 1).otherwise(0)).as("n_kept"),
      sum(when(col("rn") === 1, col("n_words")).otherwise(0L)).as("kept_tokens"))
    baseAgg.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_en"), col("n_quality"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      .orderBy("source")
  }

  /** Positional token index: first occurrence position (0-based) of every
    * token per document — the positional-posting flavor of x53's inverted
    * index (phrase queries and lead-paragraph weighting both need it).
    * `posexplode` keeps the position with the token in one generator (no
    * window or self-join to recover order); DuckDB twin zips `unnest` with
    * `generate_subscripts` (1-based, hence the -1). Row-local expansion +
    * one (doc_id, token) aggregate; sampled to every 50th doc to keep the
    * oracle compare bounded.
    */
  val positionalIndex: Q = Q(
    "x59_positional_index",
    """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token,
      |                  generate_subscripts(string_split(text, ' '), 1) AS pos
      |           FROM documents WHERE doc_id % 50 = 0)
      |SELECT doc_id, token, CAST(min(pos) - 1 AS BIGINT) AS first_pos
      |FROM t GROUP BY doc_id, token ORDER BY doc_id, token""".stripMargin
  ) { (s, dir) =>
    docs(s, dir)
      .where(col("doc_id") % 50 === 0)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "token")))
      .groupBy("doc_id", "token")
      .agg(min(col("pos")).cast("long").as("first_pos"))
      .orderBy("doc_id", "token")
  }

  /** Character-trigram language-model commonness score — the shape of a
    * CCNet/KenLM-style perplexity quality filter, with the transcendental
    * log-prob replaced by the integer-ppm determinism contract: each
    * trigram's corpus frequency becomes `floor(c·1e6/total + 0.5)` ppm, a
    * document scores the exact int64 mean of its trigrams' ppm values, and
    * low scorers (rare-trigram text: mojibake, binary spill, boilerplate
    * markup) are the filter's drop candidates. Two phases, one program:
    *
    *  1. model build — trigram counts are a hash aggregate whose key space
    *     is the OBSERVED trigram vocabulary (lexicon-shaped, far below
    *     corpus row count), so the exchange after partial aggregation is
    *     small relative to the scan; on a multilingual 100 TB corpus the
    *     observed vocabulary itself can outgrow a broadcast (CJK trigram
    *     diversity), in which case the production variant caps the model to
    *     the top-K trigrams by count — exactly how fixed-size CCNet/KenLM
    *     models ship — and scores unmatched trigrams at 0 ppm;
    *  2. scoring — the model joins back to the per-doc trigram stream on
    *     the trigram key; Catalyst/AQE broadcasts the model side (asserted
    *     by PlanAudit), so scoring is map-side and the only corpus-sized
    *     shuffle is the (doc_id, ppm) partial-sum exchange.
    *
    * The trigram stream is generated twice (model + scoring) rather than
    * cached — at 100 TB a rescan beats materializing a 3× blowup, and both
    * passes are narrow. Exact sums of int64 ppm values are order-free, so
    * the score is partitioning-independent; the final mean integerizes via
    * floor (sum and count are exact, IEEE division is correctly rounded, so
    * both engines floor the same double).
    */
  /** DuckDB CTE stack ending in a `score(doc_id, n_tri, mean_ppm)` relation —
    * the per-doc trigram-LM score shared by x66 (which emits it directly)
    * and x130 (which buckets it per language, CCNet-style). One definition
    * so the two oracles cannot silently diverge.
    */
  private val triScoreSqlCtes =
    """tri AS (
      |  SELECT doc_id, substr(text, CAST(i AS INT), 3) AS tri
      |  FROM documents, unnest(generate_series(1, length(text) - 2)) AS t(i)),
      |model AS (SELECT tri, count(*) AS c FROM tri GROUP BY tri),
      |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS tot FROM model),
      |ppm AS (SELECT tri, CAST(floor(c * 1000000.0 / tot + 0.5) AS BIGINT) AS ppm
      |        FROM model, tot),
      |score AS (
      |  SELECT t.doc_id AS doc_id, CAST(count(*) AS BIGINT) AS n_tri,
      |         CAST(floor(CAST(sum(p.ppm) AS DOUBLE) / count(*)) AS BIGINT) AS mean_ppm
      |  FROM tri t JOIN ppm p USING (tri)
      |  GROUP BY t.doc_id)""".stripMargin

  /** Spark twin of [[triScoreSqlCtes]]'s `score`: per-doc (n_tri, mean_ppm)
    * under the corpus trigram LM. Shared by x66 and x130.
    */
  private def triDocScores(s: SparkSession, dir: String): DataFrame = {
    // one-pass codegen generator ([[graft.functions.CharNgrams]]): the HOF
    // substr-per-position formulation re-walks the string from byte 0 for
    // every index (UTF8String char indexing is linear) — O(len²) on the
    // heavy-tailed documents that dominate a real corpus pass
    def tris(df: DataFrame): DataFrame = df.select(
      col("doc_id"),
      explode(graft.functions.CharNgramsFunctions.charNgrams(col("text"), 3)).as("tri"))
    val tri   = tris(docs(s, dir))
    val model = tri.groupBy("tri").agg(count(lit(1)).as("c"))
    val tot   = model.agg(sum(col("c")).cast("double").as("tot"))
    val ppm   = model.crossJoin(broadcast(tot))
      .select(col("tri"),
        floor(col("c") * 1000000.0 / col("tot") + 0.5).cast("long").as("ppm"))
    tri.join(broadcast(ppm), "tri")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tri"),
        floor(sum(col("ppm")).cast("double") / count(lit(1))).cast("long").as("mean_ppm"))
  }

  /** Per-doc LM scores WITH the document's language, memoized per
    * (session, sf dir) — the DedupOps.lshCandidatePairs discipline. The
    * score lineage (trigram explode ×2 + model join) is this family's
    * expensive subtree and is consumed three times in one process: by
    * x66, and twice inside x130's histogram-ntile plan (value histogram +
    * bucket-assignment join). The cached frame is 4 skinny columns
    * (doc_id, lang, n_tri, mean_ppm) ≈ 30 B/doc — doc-count-sized, never
    * text — so at 100 TB it is a few TB of spillable storage-level cache
    * cluster-wide vs re-running the corpus trigram pass per consumer.
    * Bench.clearMemo drops it between timing passes like every other memo.
    */
  private val scoreCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private def evictStopped(): Unit =
    scoreCache.keys.filter(_._1.sparkContext.isStopped).foreach(scoreCache.remove)

  private[graft] def memoSize: Int = scoreCache.size

  /** Named live memo entries — see DedupOps.memoKeys (Bench's per-query
    * paid_memos attribution).
    */
  private[graft] def memoKeys: Set[String] =
    if (scoreCache.nonEmpty) Set("text.score") else Set.empty

  /** Same contract as DedupOps.clearMemo (Bench drops memos between
    * best-of-N passes so pass 2 never times a cache read).
    */
  private[graft] def clearMemo(): Unit = {
    scoreCache.values.foreach(df => scala.util.Try(df.unpersist()))
    scoreCache.clear()
  }

  /** Diagnostic accessor for [[cachedLangScores]] (NtileDiag's
    * window-vs-histogram pair shares the memo so the comparison isolates
    * the split stage, not the trigram scoring both plans need).
    */
  private[graft] def diagLangScores(s: SparkSession, dir: String): DataFrame =
    cachedLangScores(s, dir)

  private[ops] def cachedLangScores(s: SparkSession, dir: String): DataFrame = {
    evictStopped()
    scoreCache.getOrElseUpdate((s, dir),
      triDocScores(s, dir)
        .join(docs(s, dir).select("doc_id", "lang"), "doc_id")
        .cache())
  }

  val trigramLm: Q = Q(
    "x66_trigram_lm",
    s"""WITH $triScoreSqlCtes
       |SELECT doc_id, n_tri, mean_ppm FROM score ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    cachedLangScores(s, dir).select("doc_id", "n_tri", "mean_ppm").orderBy("doc_id")
  }

  /** CCNet-style head/middle/tail corpus split (Wenzek et al. 2020,
    * reference behavior class: quality-bucketed corpus partitioning): every
    * document is scored by the corpus trigram LM (x66's exact score frame —
    * shared code, so the gate and the bucketer cannot diverge), then split
    * into per-LANGUAGE terciles by score. CCNet computes Wikipedia-LM
    * perplexity per language and keeps the head; here the corpus LM is the
    * stand-in and bucket 1 = head (highest mean ppm = most in-distribution).
    *
    * Scale shape (re-planned r9 — the round-8 verdict's x130 finding): the
    * LM model is |V_tri|-sized and broadcast (x66's plan); the tercile
    * split rides [[NtilePlan.histNtile]] — a (lang, mean_ppm) value
    * HISTOGRAM plus row-local bucket arithmetic — instead of the previous
    * `ntile(3) OVER (PARTITION BY lang …)` window, which capped
    * parallelism at #languages and sent a real corpus's dominant
    * language (~half the data) through ONE sorting task. Now the only
    * doc-row exchanges are hash-partitioned on (lang, score) — no
    * partition-count ceiling; the per-language work that remains is a
    * window over the score DOMAIN (distinct ppm values), and only tie
    * groups on the ≤ 2 boundary values per language ever sort doc rows.
    * The scored frame is memoized ([[cachedLangScores]]) so its two
    * consumers inside this plan — and x66 — pay the trigram lineage once.
    * ntile's remainder rule (first buckets get the extra row) is SQL
    * standard on both engines; the (mean_ppm DESC, doc_id) order is total,
    * so bucket assignment is deterministic — the oracle keeps the direct
    * window formulation, so every correctness round re-proves the re-plan
    * lossless (NtileSpec asserts it in-engine too).
    */
  val ccnetBuckets: Q = Q(
    "x130_ccnet_buckets",
    s"""WITH $triScoreSqlCtes,
       |b AS (
       |  SELECT d.lang, s.doc_id, s.n_tri, s.mean_ppm,
       |         ntile(3) OVER (PARTITION BY d.lang ORDER BY s.mean_ppm DESC, s.doc_id) AS bucket
       |  FROM score s JOIN documents d ON d.doc_id = s.doc_id)
       |SELECT lang, CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
       |       CAST(sum(n_tri) AS BIGINT) AS tri_mass,
       |       min(mean_ppm) AS min_ppm, max(mean_ppm) AS max_ppm
       |FROM b GROUP BY lang, bucket ORDER BY lang NULLS FIRST, bucket NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    // DESC score order as an ASC key: negate the (exact integer) score.
    // NON-NULL CONTRACT (ADVICE r9 item 2): mean_ppm is non-null by
    // construction — a doc reaches the score frame only through the
    // trigram inner join (n_tri ≥ 1), so the floor(sum/count) is never
    // null — and the negation DEPENDS on that:
    // the old window was DESC NULLS LAST, while a negated-ASC null would
    // sort NULLS FIRST and silently shift every bucket. If a future
    // scoring change can produce null mean_ppm, it must also re-plan
    // this call (histNtile's scaladoc carries the same non-null-key
    // caveat for the cross-engine seam).
    // tri_mass is the ONLY doc-dependent aggregate (n_docs is index
    // arithmetic, min/max ppm are the boundary keys), so the sum-stats
    // path applies: whole cells contribute from histogram partials and
    // only boundary tie groups ever revisit doc rows (via a broadcast
    // probe of the ≤2-per-language straddle cell map over the MEMOIZED
    // score frame)
    val scored = cachedLangScores(s, dir).withColumn("_negppm", -col("mean_ppm"))
      .select("lang", "_negppm", "doc_id", "n_tri")
    NtilePlan.histNtileSumStats(scored, "lang", "_negppm", "doc_id", "n_tri", 3)
      .select(col("lang"), col("bucket").cast("long").as("bucket"),
        col("_n").as("n_docs"), col("_sum").as("tri_mass"),
        (-col("_negppm_hi")).as("min_ppm"), (-col("_negppm_lo")).as("max_ppm"))
      .orderBy("lang", "bucket")
  }

  /** Gopher quality-rule funnel (Rae et al. 2021 §A2, the repetition gate
    * being x26): the five document-shape rules as INDEPENDENT fail counts
    * per source plus the all-rules survivor count — the per-rule
    * attribution a filter-tuning pass needs (x119 attributes a composed
    * gate stack; this is the rule-level view of the shape gates).
    *
    * Every rule is integer arithmetic on row-local counts — no doubles, so
    * no cross-engine rounding seam:
    *  - len:  50 ≤ n_words ≤ 100,000
    *  - mwl:  mean word length in [3, 10] chars ⟺ 3·n ≤ chars ≤ 10·n,
    *          where chars = length(text) − (n−1) (single-space separated)
    *  - stop: ≥ 2 English stop-word tokens (the [[stopwords]] en profile —
    *          same list as the x08/x23 gates)
    *  - ttr:  distinct/total words ≥ 0.2 ⟺ 5·distinct ≥ total
    *  - maxw: no token longer than 15 chars
    *
    * Row-local flags → one hash aggregate: the 100 TB plan is a single
    * narrow scan, no shuffle beyond the per-source partial-agg exchange.
    */
  val gopherRules: Q = Q(
    "x126_gopher_rules",
    s"""SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN nw BETWEEN 50 AND 100000 THEN 0 ELSE 1 END) AS BIGINT) AS fail_len,
       |  CAST(sum(CASE WHEN wc >= 3*nw AND wc <= 10*nw THEN 0 ELSE 1 END) AS BIGINT) AS fail_mwl,
       |  CAST(sum(CASE WHEN stop_n >= 2 THEN 0 ELSE 1 END) AS BIGINT) AS fail_stop,
       |  CAST(sum(CASE WHEN 5*uniq_n >= nw THEN 0 ELSE 1 END) AS BIGINT) AS fail_ttr,
       |  CAST(sum(CASE WHEN long_n = 0 THEN 0 ELSE 1 END) AS BIGINT) AS fail_maxw,
       |  CAST(sum(CASE WHEN nw BETWEEN 50 AND 100000 AND wc >= 3*nw AND wc <= 10*nw
       |                 AND stop_n >= 2 AND 5*uniq_n >= nw AND long_n = 0
       |            THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
       |FROM (SELECT source, len(string_split(text, ' ')) AS nw,
       |             length(text) - len(string_split(text, ' ')) + 1 AS wc,
       |             ${hitsSql("en")} AS stop_n,
       |             len(list_distinct(string_split(text, ' '))) AS uniq_n,
       |             len(list_filter(string_split(text, ' '), w -> length(w) > 15)) AS long_n
       |      FROM documents)
       |GROUP BY source ORDER BY source NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    // inlined split is optimal here: pure-scalar uses, codegen CSE dedups
    // it (the explicit projection measured SLOWER — see hits scaladoc)
    val w = split(col("text"), " ")
    val flags = docs(s, dir).select(
      col("source"),
      size(w).as("nw"),
      (length(col("text")) - size(w) + 1).as("wc"),
      hits("en").as("stop_n"),
      size(array_distinct(w)).as("uniq_n"),
      size(filter(w, t => length(t) > 15)).as("long_n"))
    val okLen  = col("nw").between(50, 100000)
    val okMwl  = col("wc") >= col("nw") * 3 && col("wc") <= col("nw") * 10
    val okStop = col("stop_n") >= 2
    val okTtr  = col("uniq_n") * 5 >= col("nw")
    val okMaxw = col("long_n") === 0
    flags.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(okLen, 0).otherwise(1)).as("fail_len"),
        sum(when(okMwl, 0).otherwise(1)).as("fail_mwl"),
        sum(when(okStop, 0).otherwise(1)).as("fail_stop"),
        sum(when(okTtr, 0).otherwise(1)).as("fail_ttr"),
        sum(when(okMaxw, 0).otherwise(1)).as("fail_maxw"),
        sum(when(okLen && okMwl && okStop && okTtr && okMaxw, 1).otherwise(0)).as("n_pass"))
      .orderBy("source")
  }

  /** Unicode canonicalization report over the codegen'd
    * [[graft.functions.NfcNormalize]] expression (DuckDB twin:
    * `nfc_normalize`). The corpus text is ASCII-clean, so each row is
    * seeded with a decomposed sequence (`e` + U+0301 combining acute) ahead
    * of the document head — NFC must compose it to precomposed `é`,
    * shrinking the char count by one while leaving the ASCII tail intact.
    * The md5 of the normalized string proves byte-level cross-engine
    * equality, which is exactly the property dedup digests depend on.
    * Row-local projection — no shuffle beyond the output sort.
    */
  val nfcClean: Q = Q(
    "x68_nfc_clean",
    """SELECT doc_id, length(s) AS raw_chars, length(n) AS nfc_chars,
      |       (s <> n) AS changed, md5(n) AS nfc_md5
      |FROM (SELECT doc_id, s, nfc_normalize(s) AS n
      |      FROM (SELECT doc_id, 'e' || chr(769) || substr(text, 1, 40) AS s
      |            FROM documents))
      |ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val raw = docs(s, dir).select(
      col("doc_id"),
      concat(lit("e\u0301"), substring(col("text"), 1, 40)).as("s"))  // decomposed: e + combining acute (oracle chr(769))
    raw
      .select(col("doc_id"), col("s"),
        graft.functions.NfcNormalizeFunctions.nfcNormalize(col("s")).as("n"))
      .select(
        col("doc_id"),
        length(col("s")).as("raw_chars"),
        length(col("n")).as("nfc_chars"),
        (col("s") =!= col("n")).as("changed"),
        md5(col("n")).as("nfc_md5"))
      .orderBy("doc_id")
  }

  /** PII detection + redaction — the scrubbing pass every pretraining
    * pipeline runs before anything else sees the text. The corpus is
    * synthetic and PII-free, so each row is seeded with a deterministic
    * email + phone built from its doc_id (same seeding idiom as x68's
    * combining-mark prefix), then both patterns are counted
    * (`regexp_extract_all`) and replaced with typed placeholders
    * (`regexp_replace`). The md5 of the redacted text proves byte-level
    * cross-engine equality of the rewrite.
    *
    * The regexes stay inside the Java-regex ∩ RE2 common subset (character
    * classes, bounded repetition — no backrefs, no lookaround), so both
    * engines match identical spans. Row-local projection: at 100 TB this
    * is a pure map stage — no shuffle beyond the output sort, and the
    * regex automata compile once per codegen'd task, not per row.
    */
  val piiRedact: Q = Q(
    "x70_pii_redact",
    """SELECT doc_id,
      |       CAST(len(regexp_extract_all(s, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
      |       CAST(len(regexp_extract_all(s, '\+1-555-[0-9]{4}')) AS BIGINT) AS n_phones,
      |       md5(regexp_replace(regexp_replace(s, '[a-z0-9._]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
      |                          '\+1-555-[0-9]{4}', '<PHONE>', 'g')) AS red_md5
      |FROM (SELECT doc_id,
      |             'contact user' || doc_id || '@mail.example.com or +1-555-' ||
      |             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' || substr(text, 1, 60) AS s
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val emailRe = "[a-z0-9._]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phoneRe = "\\+1-555-[0-9]{4}"
    docs(s, dir)
      .select(col("doc_id"),
        concat(lit("contact user"), col("doc_id"), lit("@mail.example.com or +1-555-"),
          lpad(col("doc_id") % 10000, 4, "0"), lit(" "), substring(col("text"), 1, 60)).as("s"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("s"), lit(emailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(col("s"), lit(phoneRe), lit(0))).cast("long").as("n_phones"),
        md5(regexp_replace(regexp_replace(col("s"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>")).as("red_md5"))
      .orderBy("doc_id")
  }

  /** First BPE merge iteration: the top-50 adjacent character pairs by
    * corpus frequency (Sennrich et al., *Neural Machine Translation of Rare
    * Words with Subword Units*, ACL 2016 — the statistic every tokenizer-
    * training pass computes repeatedly). The distributed trick is the
    * word-frequency pre-aggregation: pair explosion runs over the DISTINCT
    * vocabulary weighted by word counts, not over every token occurrence —
    * Zipf collapses the corpus to its vocabulary before the ×(len-1)
    * explode, so the expensive stage scales with |V|, not corpus tokens.
    * The token→(word,count) aggregate itself is map-side-combined (partial
    * hash agg before the exchange), the canonical two-level count shape.
    *
    * Total order on (cnt DESC, pair) makes the LIMIT cut identical on both
    * engines even through ties.
    */
  val bpePairs: Q = Q(
    "x89_bpe_pairs",
    """WITH wf AS (
      |  SELECT w, count(*) AS f FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE len(w) >= 2 GROUP BY w),
      |pairs AS (
      |  SELECT substr(w, CAST(i AS INT), 2) AS pair, f
      |  FROM wf, LATERAL (SELECT unnest(generate_series(1, len(w)-1)) AS i) s)
      |SELECT pair, CAST(sum(f) AS BIGINT) AS cnt
      |FROM pairs GROUP BY pair
      |ORDER BY cnt DESC, pair LIMIT 50""".stripMargin
  ) { (s, dir) =>
    val wf = docs(s, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("f"))
    wf.select(
        explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"),
        col("f"))
      .groupBy("pair").agg(sum(col("f")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair"))
      .limit(50)
  }

  /** One full BPE training iteration — the loop body x89 only STARTS
    * (Sennrich et al. ACL'16): select the best merge (x89's top pair),
    * APPLY it across the vocabulary, and recount pair frequencies over
    * the merged symbol streams. The merge is greedy left-to-right
    * non-overlapping — exactly what a global regexp_replace gives on both
    * engines ("aaa" under merge "aa" → [aa, a]; "abab" under "ab" →
    * [ab, ab]) — with the merged symbol marked by a '0' sentinel (the
    * corpus alphabet is lowercase letters, so the sentinel and the regex
    * are collision- and metacharacter-free by construction). Post-merge
    * pairs decode the sentinel back to the merged pair's text and join
    * symbols with '+' so "ab+c" ≠ "a+bc".
    *
    * Scale shape: x89's vocabulary-weighted trick carried through the
    * whole iteration — the token stream collapses to (word, count) FIRST,
    * so merge application and re-counting run over |V| rows (Zipf-
    * sub-linear), never corpus tokens; the selected merge is a 1-row
    * broadcast into a row-local projection; top-20 rides
    * TakeOrderedAndProject. A tokenizer trainer iterates exactly this
    * plan, feeding each round's winner back in.
    */
  val bpeMerge: Q = Q(
    "x104_bpe_merge",
    """WITH wf AS (
      |  SELECT w, count(*) AS f FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |  WHERE len(w) >= 2 GROUP BY w),
      |tp AS (
      |  SELECT pair FROM (
      |    SELECT substr(w, CAST(i AS INT), 2) AS pair, sum(f) AS cnt
      |    FROM wf, LATERAL (SELECT unnest(generate_series(1, len(w)-1)) AS i) s
      |    GROUP BY pair)
      |  ORDER BY cnt DESC, pair LIMIT 1),
      |m AS (SELECT regexp_replace(w, tp.pair, '0', 'g') AS m, f, tp.pair AS mp
      |      FROM wf CROSS JOIN tp),
      |pp AS (
      |  SELECT mp,
      |         (CASE WHEN substr(m, CAST(i AS INT), 1) = '0' THEN mp
      |               ELSE substr(m, CAST(i AS INT), 1) END) || '+' ||
      |         (CASE WHEN substr(m, CAST(i AS INT) + 1, 1) = '0' THEN mp
      |               ELSE substr(m, CAST(i AS INT) + 1, 1) END) AS pair, f
      |  FROM m, LATERAL (SELECT unnest(generate_series(1, len(m)-1)) AS i) s
      |  WHERE len(m) >= 2)
      |SELECT mp AS merged, pair, CAST(sum(f) AS BIGINT) AS cnt
      |FROM pp GROUP BY mp, pair
      |ORDER BY cnt DESC, pair LIMIT 20""".stripMargin
  ) { (s, dir) =>
    val wf = docs(s, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("f"))
    val tp = wf.select(
        explode(expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"),
        col("f"))
      .groupBy("pair").agg(sum(col("f")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(1)
      .select(col("pair").as("mp"))
    wf.crossJoin(broadcast(tp))
      .select(regexp_replace(col("w"), col("mp"), lit("0")).as("m"), col("f"), col("mp"))
      .where(length(col("m")) >= 2)
      .select(col("mp"), col("f"),
        explode(expr(
          """transform(sequence(1, length(m) - 1), i ->
            |  concat(if(substring(m, i, 1) = '0', mp, substring(m, i, 1)), '+',
            |         if(substring(m, i + 1, 1) = '0', mp, substring(m, i + 1, 1))))""".stripMargin))
          .as("pair"))
      .groupBy("mp", "pair").agg(sum(col("f")).as("cnt"))
      .select(col("mp").as("merged"), col("pair"), col("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(20)
  }

  /** Hashing-trick linear classifier — the fasttext/CCNet quality-filter
    * shape: score every document against a reference domain (here
    * lang='en' as the stand-in for "looks like the target corpus", the
    * way CCNet targets Wikipedia) with a BROADCAST linear model over
    * hashed token features. Train = two aggregates: per-bucket token
    * counts overall and in the reference slice (hashing trick: 256
    * buckets via the x41 md5 coin, so the model is fixed-size regardless
    * of vocabulary); weight = milli-lift of the bucket in the reference,
    * centered at 0 (floor(c_en·t_all·1000 / (c_all·t_en) + 0.5) − 1000 —
    * the x34 double-path: the cross products pass int64 at web scale, so
    * both engines run the identical IEEE chain and integerize once).
    * Apply = row-local: token → bucket → broadcast weight lookup → sum.
    * The score stays the RAW (Σw, n_tokens) pair — no per-doc division,
    * whose trunc-vs-floor semantics diverge cross-engine on negatives —
    * and pred is Σw > 0. Measured on this corpus: en mean-score +2.07
    * milli/token vs −0.7..−2.8 for every other language.
    *
    * Scale shape: two token-stream aggregates to a 256-row model
    * (broadcast), then a row-local scoring pass — the corpus never
    * shuffles on any text-derived key; per-doc output rides the doc_id
    * sort the driver contract requires.
    */
  val hashClassifier: Q = Q(
    "x105_hash_classifier",
    """WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents),
      |b AS (SELECT doc_id, lang,
      |        CAST('0x' || substr(md5(w), 1, 4) AS INTEGER) % 256 AS b FROM tok),
      |allc AS (SELECT b, count(*) AS c_all FROM b GROUP BY b),
      |enc AS (SELECT b, count(*) AS c_en FROM b WHERE lang = 'en' GROUP BY b),
      |tot AS (SELECT count(*) AS t_all,
      |               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_en FROM b),
      |model AS (SELECT allc.b,
      |            CAST(floor(CAST(coalesce(c_en, 0) AS DOUBLE) * t_all * 1000
      |                       / (CAST(c_all AS DOUBLE) * t_en) + 0.5) - 1000 AS BIGINT) AS w
      |          FROM allc LEFT JOIN enc ON allc.b = enc.b CROSS JOIN tot)
      |SELECT doc_id, any_value(lang) AS lang, CAST(count(*) AS BIGINT) AS n_tokens,
      |       CAST(sum(w) AS BIGINT) AS sw_milli, sum(w) > 0 AS pred_ref
      |FROM b JOIN model USING (b) GROUP BY doc_id ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val tok = docs(s, dir).select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("w"))
    val b = tok.select(col("doc_id"), col("lang"),
      (conv(substring(md5(col("w")), 1, 4), 16, 10).cast("long") % 256).as("b"))
    val allc = b.groupBy("b").agg(count(lit(1)).as("c_all"))
    val enc  = b.where(col("lang") === "en").groupBy(col("b").as("eb"))
      .agg(count(lit(1)).as("c_en"))
    val tot = b.agg(count(lit(1)).as("t_all"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("t_en"))
    val model = allc.join(enc, col("b") === col("eb"), "left")
      .crossJoin(broadcast(tot))
      .select(col("b"), expr(
        """cast(floor(cast(coalesce(c_en, 0) as double) * t_all * 1000
          |           / (cast(c_all as double) * t_en) + 0.5) - 1000 as bigint)""".stripMargin)
        .as("w"))
    b.join(broadcast(model), "b")
      .groupBy("doc_id")
      .agg(first(col("lang")).as("lang"), count(lit(1)).as("n_tokens"),
        sum(col("w")).as("sw_milli"))
      .withColumn("pred_ref", col("sw_milli") > 0)
      .select("doc_id", "lang", "n_tokens", "sw_milli", "pred_ref")
      .orderBy("doc_id")
  }

  /** BPE ENCODING — the other half of the tokenizer loop (x89 counts pairs,
    * x104 runs one training iteration, this APPLIES a learned merge table to
    * the corpus, the per-document operation a training pipeline runs over
    * 100 TB once the merges.txt is frozen). The merge table here is a
    * 5-entry literal (rank-ordered, including one RECURSIVE merge:
    * th+e → "the" consumes the rank-1 symbol), standing in for the
    * broadcast merges a user supplies.
    *
    * Algorithm: apply merges in rank order, each exhaustively greedy
    * left-to-right (= one global regexp_replace per merge; "aaa" under
    * "aa" → [aa, a]). This staged application is EXACTLY the classic
    * priority-queue BPE encode: merge k's output symbol is a fresh
    * sentinel, so it can only enable pairs learned AFTER k (rank > k), and
    * replacing letters never creates new letter-letter adjacencies —
    * adjacency across a merged span goes through the sentinel. Hence
    * processing ranks 1..K sequentially finds every merge the pair-priority
    * algorithm would. Sentinels are digits '1'..'5' (corpus alphabet is
    * [a-z ], checked — collision-free); output decodes them back to the
    * merged text.
    *
    * Scale shape: the token stream collapses to (word, count) FIRST, so the
    * K-deep replace chain and the symbol explode run over |V| rows (Zipf-
    * sub-linear in corpus size), never corpus tokens; the merge table is a
    * plan-time literal (a user-supplied one broadcasts); top-50 rides
    * TakeOrderedAndProject. The whole pipeline is two hash aggregates and
    * row-local projections — no text-keyed shuffle of the corpus.
    */
  private val bpeMerges: Seq[(String, String, String)] = Seq(
    // (pattern over current symbols, sentinel, fully-expanded text)
    ("th", "1", "th"),
    ("1e", "2", "the"), // recursive: rank-1 symbol + 'e'
    ("in", "3", "in"),
    ("an", "4", "an"),
    ("er", "5", "er"))

  val bpeEncode: Q = {
    val encSql = bpeMerges.foldLeft("w") { case (e, (p, sn, _)) =>
      s"regexp_replace($e, '$p', '$sn', 'g')"
    }
    val decSql = bpeMerges.map { case (_, sn, ex) => s"WHEN '$sn' THEN '$ex'" }
      .mkString("CASE sym ", " ", " ELSE sym END")
    Q(
      "x106_bpe_encode",
      s"""WITH wf AS (
         |  SELECT w, count(*) AS f FROM (
         |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE len(w) >= 1 GROUP BY w),
         |e AS (SELECT $encSql AS e, f FROM wf),
         |sym AS (
         |  SELECT substr(e, CAST(i AS INT), 1) AS sym, f
         |  FROM e, LATERAL (SELECT unnest(generate_series(1, len(e))) AS i) s)
         |SELECT $decSql AS token, CAST(sum(f) AS BIGINT) AS cnt
         |FROM sym GROUP BY token
         |ORDER BY cnt DESC, token LIMIT 50""".stripMargin
    ) { (s, dir) =>
      val wf = docs(s, dir)
        .select(explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) >= 1)
        .groupBy("w").agg(count(lit(1)).as("f"))
      val enc = bpeMerges.foldLeft(col("w")) { case (e, (p, sn, _)) =>
        regexp_replace(e, lit(p), lit(sn))
      }
      val decoded = bpeMerges.foldRight(col("sym")) { case ((_, sn, ex), acc) =>
        when(col("sym") === lit(sn), lit(ex)).otherwise(acc)
      }
      wf.select(enc.as("e"), col("f"))
        .select(explode(expr("transform(sequence(1, length(e)), i -> substring(e, i, 1))")).as("sym"),
          col("f"))
        .groupBy(decoded.as("token")).agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(50)
    }
  }

  /** CALIBRATION AUDIT of the x105 quality classifier — the reliability
    * diagram: bucket documents by their per-token milli-lift and report
    * the ACTUAL reference-domain rate per bucket. A filter threshold is
    * only as good as this curve (a score that separates on average can
    * still be useless at the cut point); production quality gates publish
    * exactly this table before anyone picks a threshold.
    *
    * Binning dodges the one cross-engine trap: per-token lift is
    * sw_milli / n_tokens with NEGATIVE numerators, where Spark `div`
    * truncates toward zero and DuckDB `//` floors — so bins are defined by
    * MULTIPLICATION-only edge tests (sw ≥ k·n for k = 5…−5), identical on
    * both engines and exact. The en-rate division is positive-only.
    *
    * Scale shape: rides the x105 scoring pass (broadcast model, row-local
    * apply), then ONE 12-row aggregate — the audit is free next to the
    * scoring it audits.
    */
  val calibration: Q = {
    val binSql = (5 to -5 by -1)
      .map(k => s"WHEN sw_milli >= $k * n_tokens THEN $k").mkString("CASE ", " ", " ELSE -6 END")
    Q(
      "x114_calibration",
      s"""WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents),
         |b AS (SELECT doc_id, lang,
         |        CAST('0x' || substr(md5(w), 1, 4) AS INTEGER) % 256 AS b FROM tok),
         |allc AS (SELECT b, count(*) AS c_all FROM b GROUP BY b),
         |enc AS (SELECT b, count(*) AS c_en FROM b WHERE lang = 'en' GROUP BY b),
         |tot AS (SELECT count(*) AS t_all,
         |               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_en FROM b),
         |model AS (SELECT allc.b,
         |            CAST(floor(CAST(coalesce(c_en, 0) AS DOUBLE) * t_all * 1000
         |                       / (CAST(c_all AS DOUBLE) * t_en) + 0.5) - 1000 AS BIGINT) AS w
         |          FROM allc LEFT JOIN enc ON allc.b = enc.b CROSS JOIN tot),
         |scored AS (SELECT doc_id, any_value(lang) AS lang,
         |                  CAST(count(*) AS BIGINT) AS n_tokens,
         |                  CAST(sum(w) AS BIGINT) AS sw_milli
         |           FROM b JOIN model USING (b) GROUP BY doc_id)
         |SELECT $binSql AS bin, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
         |       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS en_rate_ppm
         |FROM scored GROUP BY bin ORDER BY bin""".stripMargin
    ) { (s, dir) =>
      val scored = hashClassifier.run(s, dir)
      // descending-priority WHEN chain, same k = 5…−5 order as the SQL
      val binDesc = (5 to -5 by -1).map(k =>
        (k, col("sw_milli") >= lit(k.toLong) * col("n_tokens")))
        .foldLeft(Option.empty[Column]) {
          case (None, (k, c))      => Some(when(c, lit(k)))
          case (Some(acc), (k, c)) => Some(acc.when(c, lit(k)))
        }.get.otherwise(lit(-6))
      scored.groupBy(binDesc.as("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
        .withColumn("en_rate_ppm", expr("n_en * 1000000 div n_docs"))
        .orderBy("bin")
    }
  }

  /** QUALITY-GATE ATTRIBUTION — the observability report behind every
    * filter stack: per gate, how many docs FAIL it, and how many fail
    * ONLY it (the marginal count — exactly the docs that one gate alone
    * costs the corpus; relaxing the gate with the biggest fail-only count
    * buys back the most data). A funnel (x23) hides this: a doc dropped
    * at stage 2 never reaches stage 3's counter, so funnel counts
    * conflate rule order with rule cost. Gates here are the standard
    * cheap heuristics (min length, type-token repetition floor, mean
    * word-length gibberish ceiling, has-a-stopword), all integer tests.
    *
    * Scale shape: ONE row-local projection computes all four booleans,
    * one aggregate sums them — gate count is the only fan-out (a literal
    * 4-element explode of the flag struct), so the report costs a single
    * corpus pass regardless of how many gates ship.
    */
  val gateAttribution: Q = {
    val stopAll = stopwords.values.flatten.toSeq.distinct.sorted
    val stopSet = stopAll.map(w => s"'$w'").mkString(", ")
    Q(
      "x119_gate_attribution",
      s"""WITH f AS (
         |  SELECT
         |    len(string_split(text, ' ')) >= 5 AS g1,
         |    len(list_distinct(string_split(text, ' '))) * 10 >= len(string_split(text, ' ')) * 3 AS g2,
         |    length(replace(text, ' ', '')) <= 12 * len(string_split(text, ' ')) AS g3,
         |    len(list_filter(string_split(text, ' '), w -> w IN ($stopSet))) >= 1 AS g4
         |  FROM documents WHERE text IS NOT NULL),
         |g AS (SELECT gate, fail,
         |             (CASE gate WHEN 1 THEN g2 AND g3 AND g4 WHEN 2 THEN g1 AND g3 AND g4
         |                        WHEN 3 THEN g1 AND g2 AND g4 ELSE g1 AND g2 AND g3 END)
         |               AND fail AS fail_only
         |      FROM f, LATERAL (VALUES (1, NOT g1), (2, NOT g2), (3, NOT g3), (4, NOT g4))
         |                AS v(gate, fail))
         |SELECT gate, CAST(sum(CASE WHEN fail THEN 1 ELSE 0 END) AS BIGINT) AS n_fail,
         |       CAST(sum(CASE WHEN fail_only THEN 1 ELSE 0 END) AS BIGINT) AS n_fail_only
         |FROM g GROUP BY gate ORDER BY gate""".stripMargin
    ) { (s, dir) =>
      // split once per row (round 14 — six uses re-split it when inlined)
      val wsp = col("wsp")
      val f = docs(s, dir).where(col("text").isNotNull)
        .select(col("text"), split(col("text"), " ").as("wsp"))
        .select(
          (size(wsp) >= 5).as("g1"),
          (size(array_distinct(wsp)) * 10 >= size(wsp) * 3).as("g2"),
          (length(regexp_replace(col("text"), " ", "")) <= lit(12) * size(wsp)).as("g3"),
          (size(filter(wsp, w => w.isInCollection(stopAll))) >= 1).as("g4"))
      val others = Map(
        1 -> (col("g2") && col("g3") && col("g4")),
        2 -> (col("g1") && col("g3") && col("g4")),
        3 -> (col("g1") && col("g2") && col("g4")),
        4 -> (col("g1") && col("g2") && col("g3")))
      val fails = Map(1 -> !col("g1"), 2 -> !col("g2"), 3 -> !col("g3"), 4 -> !col("g4"))
      f.select(explode(array((1 to 4).map(k =>
          struct(lit(k).as("gate"), fails(k).as("fail"),
            (others(k) && fails(k)).as("fail_only"))): _*)).as("v"))
        .groupBy(col("v.gate").as("gate"))
        .agg(sum(when(col("v.fail"), 1L).otherwise(0L)).as("n_fail"),
          sum(when(col("v.fail_only"), 1L).otherwise(0L)).as("n_fail_only"))
        .orderBy("gate")
    }
  }

  /** TOKENIZER FERTILITY per language — tokens-per-word and
    * chars-per-token after applying x106's BPE merge table, the fairness
    * metric every multilingual tokenizer report publishes (a tokenizer
    * trained on one language's statistics fragments the others into more,
    * shorter tokens — inflating their effective sequence length and
    * training cost). Uses x106's exact encode chain (proved ≡ priority
    * BPE); the merge table's targets are English-frequent pairs, so the
    * measured fertility ordering IS the bias being quantified.
    *
    * Scale shape: (lang, word, count) vocabulary aggregate, row-local
    * encode, language-sized aggregate — |V|-scaled like x106, ratios in
    * exact milli (all divisions positive).
    */
  val bpeFertility: Q = {
    val encSql = bpeMerges.foldLeft("w") { case (e, (p, sn, _)) =>
      s"regexp_replace($e, '$p', '$sn', 'g')"
    }
    Q(
      "x122_bpe_fertility",
      s"""WITH wf AS (
         |  SELECT lang, w, count(*) AS f FROM (
         |    SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE len(w) >= 1 GROUP BY lang, w),
         |e AS (SELECT lang, f, len(w) AS chars, len($encSql) AS toks FROM wf)
         |SELECT lang,
         |       CAST(sum(f) AS BIGINT) AS n_words,
         |       CAST(sum(f * toks) AS BIGINT) AS n_tokens,
         |       CAST(sum(f * toks) * 1000 // sum(f) AS BIGINT) AS fertility_milli,
         |       CAST(sum(f * chars) * 1000 // sum(f * toks) AS BIGINT) AS chars_per_token_milli
         |FROM e GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin
    ) { (s, dir) =>
      val wf = docs(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) >= 1)
        .groupBy("lang", "w").agg(count(lit(1)).as("f"))
      val enc = bpeMerges.foldLeft(col("w")) { case (e, (p, sn, _)) =>
        regexp_replace(e, lit(p), lit(sn))
      }
      wf.select(col("lang"), col("f"), length(col("w")).cast("long").as("chars"),
          length(enc).cast("long").as("toks"))
        .groupBy("lang")
        .agg(sum(col("f")).as("n_words"),
          sum(col("f") * col("toks")).as("n_tokens"),
          sum(col("f") * col("chars")).as("sc"))
        .select(col("lang"), col("n_words"), col("n_tokens"),
          expr("n_tokens * 1000 div n_words").as("fertility_milli"),
          expr("sc * 1000 div n_tokens").as("chars_per_token_milli"))
        .orderBy("lang")
    }
  }

  /** Ranking quality of the x105 hashed classifier as exact AUC — the
    * threshold-free eval x114's calibration bins cannot give (calibration
    * says "are the probabilities honest", AUC says "does the score ORDER
    * positives above negatives at all"). AUC = the Mann–Whitney U
    * statistic: with per-doc scores grouped into a value histogram,
    * U = Σ_pos avg-rank − n₊(n₊+1)/2 where tied groups take the average
    * rank — carried ×2 so everything stays integer (2·avg-rank of a tied
    * group = 2·cum_before + n + 1), then auc_ppm = 2U·10⁶ // (2·n₊·n₋)
    * via HUGEINT/decimal widening. The score is the LENGTH-NORMALIZED
    * per-token mean milli-lift `sw_milli div n_tokens` (DuckDB's integer
    * `//` truncates toward zero exactly like Spark's `div`, verified on
    * negatives) — normalization matters twice: it is the better
    * classifier score AND it bounds the histogram domain by the WEIGHT
    * range (a few thousand values) instead of doc-length×weight, so the
    * cumulative window rides a bounded domain (the t21/x58 argument).
    *
    * Scale shape: x105's scoring pass (vocabulary-sized model broadcast
    * into the token stream), one per-doc aggregate, then a bounded-domain
    * score histogram + cumulative window + three constant aggregates.
    * Output is ONE row at any corpus size.
    */
  val classifierAuc: Q = Q(
    "x150_classifier_auc",
    """WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents),
      |b AS (SELECT doc_id, lang,
      |        CAST('0x' || substr(md5(w), 1, 4) AS INTEGER) % 256 AS b FROM tok),
      |allc AS (SELECT b, count(*) AS c_all FROM b GROUP BY b),
      |enc AS (SELECT b, count(*) AS c_en FROM b WHERE lang = 'en' GROUP BY b),
      |tot AS (SELECT count(*) AS t_all,
      |               sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t_en FROM b),
      |model AS (SELECT allc.b,
      |            CAST(floor(CAST(coalesce(c_en, 0) AS DOUBLE) * t_all * 1000
      |                       / (CAST(c_all AS DOUBLE) * t_en) + 0.5) - 1000 AS BIGINT) AS w
      |          FROM allc LEFT JOIN enc ON allc.b = enc.b CROSS JOIN tot),
      |doc AS (SELECT doc_id, any_value(lang) = 'en' AS pos,
      |               CAST(sum(w) AS BIGINT) // count(*) AS score
      |        FROM b JOIN model USING (b) GROUP BY doc_id),
      |sc AS (SELECT score, CAST(count(*) AS BIGINT) AS n,
      |              CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np
      |       FROM doc GROUP BY score),
      |cum AS (SELECT score, n, np, sum(n) OVER (ORDER BY score) AS cum_n FROM sc),
      |r2 AS (SELECT sum(CAST(np AS HUGEINT) * (2 * (cum_n - n) + n + 1)) AS r2 FROM cum),
      |tots AS (SELECT CAST(sum(np) AS BIGINT) AS npos,
      |                CAST(sum(n) - sum(np) AS BIGINT) AS nneg FROM sc)
      |SELECT CAST(npos + nneg AS BIGINT) AS n_docs, npos AS n_pos, nneg AS n_neg,
      |       CAST(CASE WHEN npos = 0 OR nneg = 0 THEN -1
      |            ELSE (r2 - CAST(npos AS HUGEINT) * (npos + 1)) * 1000000
      |                 // (2 * CAST(npos AS HUGEINT) * nneg) END AS BIGINT) AS auc_ppm
      |FROM r2, tots""".stripMargin
  ) { (s, dir) =>
    val tok = docs(s, dir).select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("w"))
    val b = tok.select(col("doc_id"), col("lang"),
      (conv(substring(md5(col("w")), 1, 4), 16, 10).cast("long") % 256).as("b"))
    val allc = b.groupBy("b").agg(count(lit(1)).as("c_all"))
    val enc  = b.where(col("lang") === "en").groupBy(col("b").as("eb"))
      .agg(count(lit(1)).as("c_en"))
    val tot = b.agg(count(lit(1)).as("t_all"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("t_en"))
    val model = allc.join(enc, col("b") === col("eb"), "left")
      .crossJoin(broadcast(tot))
      .select(col("b"), expr(
        """cast(floor(cast(coalesce(c_en, 0) as double) * t_all * 1000
          |           / (cast(c_all as double) * t_en) + 0.5) - 1000 as bigint)""".stripMargin)
        .as("w"))
    val doc = b.join(broadcast(model), "b")
      .groupBy("doc_id")
      .agg((first(col("lang")) === "en").as("pos"),
        expr("sum(w) div count(*)").as("score"))
    val sc = doc.groupBy("score").agg(count(lit(1)).as("n"),
      sum(when(col("pos"), 1L).otherwise(0L)).as("np"))
    val wCum = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sc.withColumn("cum_n", sum(col("n")).over(wCum))
    val r2 = cum.agg(sum(col("np").cast("decimal(38,0)")
      * (lit(2) * (col("cum_n") - col("n")) + col("n") + 1)).as("r2"))
    val tots = sc.agg(sum("np").as("npos"), (sum("n") - sum("np")).as("nneg"))
    r2.crossJoin(broadcast(tots))
      .select((col("npos") + col("nneg")).as("n_docs"),
        col("npos").as("n_pos"), col("nneg").as("n_neg"),
        expr("""cast(CASE WHEN npos = 0 OR nneg = 0 THEN -1
               |ELSE (r2 - cast(npos as decimal(38,0)) * (npos + 1)) * 1000000
               |     div (2 * cast(npos as decimal(38,0)) * nneg) END as bigint)"""
          .stripMargin).as("auc_ppm"))
  }

  /** Per-document SIMPSON lexical diversity (1 − Σpᵢ², Herfindahl
    * complement over the doc's own token distribution) — the
    * length-robust junk gate x38's corpus-level type-token ratio cannot
    * give: TTR decays with length even for healthy text (Heaps), while
    * Simpson is a proper diversity index with a per-doc value, so a
    * "same 3 tokens repeated 500 times" spam doc scores near 0 at any
    * length. Chosen over Shannon entropy because it is RATIONAL: with
    * per-token counts cᵢ and n = Σcᵢ, simpson_ppm = (n² − Σcᵢ²)·10⁶ //
    * n² is exact widened-integer arithmetic on both engines — no
    * transcendental, no float (§7.5).
    *
    * Scale shape: ZERO exchanges before the final sort. Σcᵢ² is computed
    * ROW-LOCALLY — sort the doc's token array, find run boundaries, sum
    * squared run lengths (O(L log L) per row) — where the oracle pays a
    * corpus-cardinality (doc, word) aggregate for the same number. At
    * 100 TB this is a pruned 3-column scan + embarrassingly parallel map;
    * the only aggregate anywhere is the oracle's.
    */
  val simpsonDiversity: Q = Q(
    "x151_simpson_diversity",
    """WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS w
      |           FROM documents WHERE text IS NOT NULL),
      |c AS (SELECT doc_id, word, count(*) AS c
      |      FROM (SELECT doc_id, unnest(w) AS word FROM d) t GROUP BY doc_id, word),
      |s AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |             CAST(sum(c * c) AS BIGINT) AS sumsq FROM c GROUP BY doc_id)
      |SELECT d.doc_id, d.lang, n_tokens, sumsq,
      |       CAST((CAST(n_tokens AS HUGEINT) * n_tokens - sumsq) * 1000000
      |            // (CAST(n_tokens AS HUGEINT) * n_tokens) AS BIGINT) AS simpson_ppm,
      |       CASE WHEN (CAST(n_tokens AS HUGEINT) * n_tokens - sumsq) * 1000000
      |                 // (CAST(n_tokens AS HUGEINT) * n_tokens) < 900000
      |            THEN 1 ELSE 0 END AS low_diversity
      |FROM d JOIN s USING (doc_id) ORDER BY doc_id""".stripMargin
  ) { (s, dir) =>
    val srt = array_sort(split(col("text"), " "))
    docs(s, dir).where(col("text").isNotNull)
      .select(col("doc_id"), col("lang"), srt.as("s"))
      .withColumn("n", size(col("s")))
      // run boundaries of the sorted token array (0-based positions where
      // a new token starts); run lengths are consecutive-boundary gaps;
      // Σ len² is the Simpson numerator — all row-local
      .withColumn("b",
        concat(
          filter(sequence(lit(0), col("n") - 1), i =>
            (i === 0) || (element_at(col("s"), i + 1) =!= element_at(col("s"), i))),
          array(col("n"))))
      .withColumn("sumsq",
        aggregate(sequence(lit(0), size(col("b")) - 2), lit(0L), (acc, j) =>
          acc + (element_at(col("b"), j + 2) - element_at(col("b"), j + 1)).cast("long")
              * (element_at(col("b"), j + 2) - element_at(col("b"), j + 1)).cast("long")))
      .select(col("doc_id"), col("lang"), col("n").cast("long").as("n_tokens"),
        col("sumsq"),
        expr("""cast((cast(n_tokens as decimal(38,0)) * n_tokens - sumsq) * 1000000
               |div (cast(n_tokens as decimal(38,0)) * n_tokens) as bigint)""".stripMargin)
          .as("simpson_ppm"))
      .withColumn("low_diversity",
        when(col("simpson_ppm") < 900000, 1).otherwise(0).cast("int"))
      .orderBy("doc_id")
  }

  /** RANK CONCORDANCE between the x09 stopword-ratio quality signal and
    * document LENGTH — "is the quality gate secretly a length proxy?",
    * the filter-audit every pretraining pipeline should run before
    * trusting a quality score (a gate that rank-tracks length deletes
    * short documents, not bad ones). Exact Kendall-family statistics
    * computed WITHOUT enumerating pairs: Goodman–Kruskal gamma
    * (C−D)/(C+D) (the ties-robust measure, JASA 1954) and Kendall τ_a
    * (C−D)/(n(n−1)/2), both in floor-ppm — rational, so cross-engine
    * exact (truncating integer division parity verified on negatives by
    * x150).
    *
    * Scale shape: ONE corpus aggregate to the (stop_milli, n_chars)
    * contingency CELLS — both domains are value-bounded (milli ratio
    * ≤ 1001 values; doc-length domain), so everything after is
    * corpus-size-independent: the full domain grid is assembled from
    * the CACHED cells (InMemory — one corpus pass total), concordant /
    * discordant pair masses come from a 2-D cumulative built with two
    * PARTITIONED windows over the grid (C = Σ n·F(a−1,b−1) via
    * F−CB and a lag; D = Σ n·(rowtot−F_up)) — the pair-free identity
    * that makes exact rank statistics feasible at 100 TB where any
    * O(n log n) per-pair approach is not. Output is ONE row; the
    * C+D+T_a+T_b−T_ab = n(n−1)/2 identity is spec-asserted.
    */
  val rankConcordance: Q = Q(
    "x154_rank_concordance",
    """WITH d AS (SELECT CAST(len(list_filter(string_split(text, ' '),
      |             w -> w IN ('the', 'and', 'of', 'to', 'a'))) * 1000
      |             // len(string_split(text, ' ')) AS BIGINT) AS a,
      |           n_chars AS b
      |           FROM documents WHERE text IS NOT NULL AND n_chars IS NOT NULL),
      |cells AS (SELECT a, b, count(*) AS n FROM d GROUP BY 1, 2),
      |da AS (SELECT DISTINCT a FROM cells), db AS (SELECT DISTINCT b FROM cells),
      |grid AS (SELECT da.a, db.b, coalesce(c.n, 0) AS n
      |         FROM da CROSS JOIN db LEFT JOIN cells c ON c.a = da.a AND c.b = db.b),
      |w1 AS (SELECT a, b, n, sum(n) OVER (PARTITION BY a ORDER BY b) AS cb FROM grid),
      |w2 AS (SELECT a, b, n, cb, sum(cb) OVER (PARTITION BY b ORDER BY a) AS f FROM w1),
      |w3 AS (SELECT a, b, n, f - cb AS fup FROM w2),
      |w4 AS (SELECT a, b, n, fup,
      |         coalesce(lag(fup) OVER (PARTITION BY a ORDER BY b), 0) AS l,
      |         max(fup) OVER (PARTITION BY a) AS rowtot FROM w3),
      |agg AS (SELECT CAST(sum(n) AS BIGINT) AS n_docs,
      |               CAST(sum(CAST(n AS HUGEINT) * l) AS BIGINT) AS c_pairs,
      |               CAST(sum(CAST(n AS HUGEINT) * (rowtot - fup)) AS BIGINT) AS d_pairs,
      |               CAST(sum(CAST(n AS HUGEINT) * (n - 1) // 2) AS BIGINT) AS ties_both
      |        FROM w4),
      |ta AS (SELECT CAST(sum(CAST(na AS HUGEINT) * (na - 1) // 2) AS BIGINT) AS ties_a
      |       FROM (SELECT a, sum(n) AS na FROM cells GROUP BY a)),
      |tb AS (SELECT CAST(sum(CAST(nb AS HUGEINT) * (nb - 1) // 2) AS BIGINT) AS ties_b
      |       FROM (SELECT b, sum(n) AS nb FROM cells GROUP BY b))
      |SELECT n_docs, c_pairs, d_pairs, ties_a, ties_b, ties_both,
      |  CAST(CASE WHEN c_pairs + d_pairs = 0 THEN 0
      |       ELSE (CAST(c_pairs AS HUGEINT) - d_pairs) * 1000000
      |            // (CAST(c_pairs AS HUGEINT) + d_pairs) END AS BIGINT) AS gamma_ppm,
      |  CAST(CASE WHEN n_docs < 2 THEN 0
      |       ELSE (CAST(c_pairs AS HUGEINT) - d_pairs) * 1000000
      |            // (CAST(n_docs AS HUGEINT) * (n_docs - 1) // 2) END AS BIGINT) AS tau_a_ppm
      |FROM agg, ta, tb""".stripMargin
  ) { (s, dir) =>
    // inlined split is optimal here: pure-scalar uses, codegen CSE dedups
    // it (the explicit projection measured SLOWER — see hits scaladoc)
    val wsp = split(col("text"), " ")
    val cells = docs(s, dir)
      .where(col("text").isNotNull && col("n_chars").isNotNull)
      .select(hits("en").as("stop_n"), size(wsp).as("n_words"), col("n_chars").as("b"))
      .select(expr("cast(stop_n * 1000 div n_words as bigint)").as("a"), col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .cache() // domain-bounded (≤ |milli| × |length|) — ONE corpus pass feeds it
    val da = cells.select("a").distinct()
    val db = cells.select("b").distinct()
    val grid = da.crossJoin(broadcast(db))
      .join(cells, Seq("a", "b"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val wCb = Window.partitionBy("a").orderBy("b")
    val wF  = Window.partitionBy("b").orderBy("a")
    val wA  = Window.partitionBy("a")
    val w4 = grid
      .withColumn("cb", sum("n").over(wCb))
      .withColumn("f", sum("cb").over(wF))
      .withColumn("fup", col("f") - col("cb"))
      .withColumn("l", coalesce(lag("fup", 1).over(wCb), lit(0L)))
      .withColumn("rowtot", max("fup").over(wA))
    val agg = w4.agg(
      sum("n").as("n_docs"),
      // widened like the ties columns: the n·l / n·(rowtot−fup) products are
      // n(n−1)/2-scale and would silently wrap int64 beyond ~4.3e9 docs
      sum(expr("cast(n as decimal(38,0)) * l")).cast("long").as("c_pairs"),
      sum(expr("cast(n as decimal(38,0)) * (rowtot - fup)")).cast("long").as("d_pairs"),
      sum(expr("cast(n as decimal(38,0)) * (n - 1) div 2")).cast("long").as("ties_both"))
    val ta = cells.groupBy("a").agg(sum("n").as("na"))
      .agg(sum(expr("cast(na as decimal(38,0)) * (na - 1) div 2")).cast("long").as("ties_a"))
    val tb = cells.groupBy("b").agg(sum("n").as("nb"))
      .agg(sum(expr("cast(nb as decimal(38,0)) * (nb - 1) div 2")).cast("long").as("ties_b"))
    agg.crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
      .select(col("n_docs"), col("c_pairs"), col("d_pairs"),
        col("ties_a"), col("ties_b"), col("ties_both"),
        expr("""cast(CASE WHEN c_pairs + d_pairs = 0 THEN 0
               |ELSE (cast(c_pairs as decimal(38,0)) - d_pairs) * 1000000
               |     div (cast(c_pairs as decimal(38,0)) + d_pairs) END as bigint)"""
          .stripMargin).as("gamma_ppm"),
        expr("""cast(CASE WHEN n_docs < 2 THEN 0
               |ELSE (cast(c_pairs as decimal(38,0)) - d_pairs) * 1000000
               |     div (cast(n_docs as decimal(38,0)) * (n_docs - 1) div 2) END as bigint)"""
          .stripMargin).as("tau_a_ppm"))
  }

  val all: Seq[Q] = Seq(langId, qualityScore, tokenCount, fingerprint, corpusClean,
    positionalIndex, trigramLm, nfcClean, piiRedact, bpePairs, bpeMerge, hashClassifier,
    bpeEncode, calibration, gateAttribution, bpeFertility, gopherRules, ccnetBuckets,
    classifierAuc, simpsonDiversity, rankConcordance)
}
