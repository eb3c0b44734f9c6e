package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search operators over the `embeddings` table
  * (`Array[Float]`, dim 64): brute-force cosine top-k (the exact baseline),
  * embedding-cosine near-dup pairs, and an LSH-bucketed ANN variant (the
  * 100 TB scale path — candidate generation via random-hyperplane sign
  * buckets, so no all-pairs shuffle).
  *
  * Determinism: elements are cast to double before multiply (matches the
  * DuckDB `::DOUBLE[]` twin), the dot product is a sequential left fold
  * (`aggregate`), and scores are rounded to 6 dp before ranking with a
  * vec_id tiebreak.
  *
  * Query batch (round 7): every search-family query set is
  * `vec_id % 50 = 0 AND vec_id < 20000` — a FIXED batch of ≤400 queries.
  * The original corpus-proportional slice (% 50 alone) made query×corpus
  * work quadratic by construction: measured at the 100× point, x94's PQ
  * scan hit 431 s (marginal exponent ≈ 1.6) purely from 10× more queries
  * against a 10× corpus. Query volume is an OPERATIONAL knob (a serving
  * deployment sizes its request batch), corpus growth is what the plan
  * must survive — so the benchmark pins the batch and lets only the
  * corpus scale. The cap is inert at every correctness scale factor
  * (max vec_id at sf0.1 is 1,999), so oracles and specs are unchanged.
  */
object SimilarityOps {

  // computeParallel: every operator here burns CPU per SCAN-SIDE row (dot
  // products against a broadcast/self side), and a single-file embeddings
  // corpus scans as ONE partition — at sf0.1 x05's 25M pair evaluations ran
  // on one core (measured: the 2× corpus, written as many part files, ran
  // FASTER than 1×). Identity once the corpus spans ≥ cores scan splits.
  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.computeParallel(Tables(s, dir, "embeddings"))

  /** Sequential-fold dot product of two float arrays, in double —
    * codegen'd custom expression (graft.functions.DotF32), bit-identical to
    * the HOF fold and the DuckDB twin.
    */
  private def dot(a: Column, b: Column): Column = graft.functions.GraftFunctions.dotF32(a, b)

  /** Micro-ppm NORMALIZED vector frame (vec_id, v: array<long>) — the
    * shared training input of the quantization family (x94 flat PQ, x97
    * IVF-PQ), memoized per (session, sf dir) and CACHED (r11 verdict item
    * 2): each consumer runs several ACTIONS over it (codebook seed
    * collects, a Lloyd-mean collect, assignment passes, the final
    * ranking), and each action would otherwise rescan + renormalize.
    * Same-day A/B at sf10 under identical self-load: cached x94 80.3 s /
    * x97 42.3 s vs uncached 91.6 s / 51.5 s — the cache saves ~20 s across
    * the pair (a cross-DAY comparison first suggested the opposite; sf10
    * single-shot totals bounce ±20% between days, which is why the record
    * protocol is same-session min-of-2). Bench.clearMemo drops it between
    * timing passes; evictQuantMemo sweeps dead sessions.
    *
    * nullif in the divide: subexpression elimination can fuse this
    * transform into a downstream filter PREDICATE and evaluate it
    * speculatively on rows normed()'s nrm>0 filter drops — under ANSI that
    * raised DIVIDE_BY_ZERO on a hostile zero-norm row. NULL-divide is a
    * no-op for every surviving row.
    */
  private val ppmCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private[ops] def ppmVectors(s: SparkSession, dir: String): DataFrame = {
    evictQuantMemo()
    ppmCache.getOrElseUpdate((s, dir),
      normed(s, dir).select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") / nullif(col("nrm"), lit(0.0)) * 1000000 + 0.5)
            .cast("long")).as("v"))
        .cache())
  }

  /** x69's int8 SQ code frame, memoized for the same reason: the
    * quantize-then-rank self-join consumes it on BOTH sides (corpus scan +
    * broadcast query batch) — one scan + transform instead of two.
    */
  private val sqCodesCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  private[ops] def sqCodes(s: SparkSession, dir: String): DataFrame = {
    evictQuantMemo()
    sqCodesCache.getOrElseUpdate((s, dir), {
      val mn = array_min(col("embedding")).cast("double")
      val mx = array_max(col("embedding")).cast("double")
      embs(s, dir).select(
        col("vec_id"),
        // mx == mn (constant vector, e.g. all-zero) would divide by zero:
        // Spark yields NULL codes while DuckDB errors on CAST(NaN) — guard
        // both sides so degenerate vectors quantize deterministically to 0
        transform(col("embedding").cast("array<double>"),
          x => when(mx === mn, lit(0L))
            .otherwise(floor((x - mn) * 255.0 / (mx - mn) + 0.5).cast("long") - 128))
          .as("codes"))
        .cache()
    })
  }

  private def evictQuantMemo(): Unit =
    for (m <- Seq(ppmCache, sqCodesCache))
      m.keys.filter(_._1.sparkContext.isStopped).foreach(m.remove)

  /** Live memo entries (Bench's memo-payer attribution). */
  private[graft] def memoSize: Int = ppmCache.size + sqCodesCache.size

  /** Named live memo entries — see DedupOps.memoKeys (Bench's per-query
    * paid_memos attribution).
    */
  private[graft] def memoKeys: Set[String] = Seq(
    "sim.ppm" -> ppmCache.size, "sim.sq_codes" -> sqCodesCache.size,
  ).collect { case (n, c) if c > 0 => n }.toSet

  /** Drop the memoized quantization lineages (Bench calls this between
    * timing passes — same contract as DedupOps.clearMemo).
    */
  private[graft] def clearMemo(): Unit = {
    ppmCache.values.foreach(df => scala.util.Try(df.unpersist()))
    ppmCache.clear()
    sqCodesCache.values.foreach(df => scala.util.Try(df.unpersist()))
    sqCodesCache.clear()
  }

  /** vec_id, embedding, L2 norm — EXCLUDING null and zero-norm vectors.
    * Cosine geometry is undefined for them, and the engines fail
    * DIFFERENTLY if they reach a denominator (Spark ANSI raises
    * DIVIDE_BY_ZERO, DuckDB float math yields NaN; a null array NPEs the
    * codegen'd dot on Spark and errors list_dot_product on DuckDB), so the
    * similarity family's corpus contract drops them at the loader — a
    * row-local filter both engines apply identically (hostile-fixture
    * sweep, round 12).
    */
  private def normed(s: SparkSession, dir: String): DataFrame =
    embs(s, dir).where(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
      .where(col("nrm") > 0)

  private val normedSql =
    """SELECT * FROM (
      |  SELECT vec_id, embedding::DOUBLE[] AS v, sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      |  FROM embeddings WHERE embedding IS NOT NULL) nn WHERE nrm > 0""".stripMargin

  /** Embedding-cosine near-dup pairs: all pairs above 0.4 cosine. Exact
    * (the oracle-checkable baseline); the LSH variant below is the scale
    * path that avoids the quadratic join.
    */
  val cosineNearDup: Q = Q(
    "x05_cosine_neardup",
    s"""WITH n AS ($normedSql)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.4
       |ORDER BY id_a, id_b""".stripMargin
  ) { (s, dir) =>
    val n = normed(s, dir)
    val cos = round(dot(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")), 6)
    n.as("a").join(n.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), cos.as("cos"))
      .where(col("cos") >= 0.4)
      .orderBy("id_a", "id_b")
  }

  /** Brute-force cosine top-k: for each query vector (vec_id % 50 = 0) the
    * 5 nearest neighbors by rounded cosine, vec_id tiebreak. The query set
    * is broadcast against the corpus — scan stays partition-parallel and the
    * only shuffle is the per-query top-k window.
    */
  val cosineTopK: Q = Q(
    "x06_cosine_topk",
    s"""WITH n AS ($normedSql)
       |SELECT q_id, rk, n_id, cos FROM (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos,
       |         row_number() OVER (PARTITION BY q.vec_id
       |           ORDER BY round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rk
       |  FROM n q JOIN n c ON q.vec_id % 50 = 0 AND q.vec_id < 20000 AND c.vec_id <> q.vec_id)
       |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin
  ) { (s, dir) =>
    val n = normed(s, dir)
    val q = n.where(col("vec_id") % 50 === 0 && col("vec_id") < 20000)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("nrm").as("qn"))
    val cos = round(dot(col("qv"), col("embedding")) / (col("qn") * col("nrm")), 6)
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    n.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), cos.as("cos"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 5)
      .select("q_id", "rk", "n_id", "cos")
      .orderBy("q_id", "rk")
  }

  /** The (plane, dim) hyperplane coefficient is a CONSTANT — the parity of
    * the first hex char of md5("p-i") — so it is computed once here on the
    * driver and shipped as a literal ±-flag array per plane, not re-derived
    * with an md5 call per row per element (the round-1 hot spot: 512 md5s
    * per vector per join side). The Spark-side fold applies +x / -x in the
    * same element order as before, so the per-plane sums are bit-identical
    * to both the round-1 plan and the DuckDB twin's per-element CASE.
    */
  private val Dim = 64
  private def planeSigns(p: Int): Seq[Int] = (0 until Dim).map { i =>
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p-$i".getBytes("UTF-8"))
    val firstHexChar = "%02x".format(d(0) & 0xff).charAt(0)
    if (firstHexChar.toInt % 2 == 1) 1 else -1
  }

  /** Sign bucket over an arbitrary plane set from literal coefficient
    * arrays; plane p contributes "$p+" or "$p-" to the bucket string
    * (zero-padded plane label when `pad` — needed once plane ids exceed
    * one digit so the DuckDB twin's list_sort agrees with plane order).
    */
  private def bucketFor(planes: Seq[Int], pad: Boolean = false): Column = {
    val planeCols = planes.map { p =>
      val signed = zip_with(col("embedding"), typedLit(planeSigns(p)), (x, sg) =>
        when(sg === 1, x.cast("double")).otherwise(-x.cast("double")))
      val s     = aggregate(signed, lit(0.0), (acc, v) => acc + v)
      val label = if (pad) f"$p%02d" else s"$p"
      when(round(s, 6) > 0, lit(s"$label+")).otherwise(lit(s"$label-"))
    }
    concat(planeCols: _*)
  }

  /** 8-plane sign bucket ("0±1±…7±") — single-table LSH (x07/x21). */
  private def bucketCol: Column = bucketFor(0 to 7)

  /** LSH-bucketed ANN: 8 deterministic random hyperplanes (coefficient ±1
    * from the parity of md5(plane||'-'||dim)), bucket = 8-bit sign pattern;
    * top-3 neighbors per query within its bucket. The equi-join on `bucket`
    * replaces the quadratic cross join — at 100 TB the corpus shuffles once
    * by bucket and each bucket compares internally. Buckets are recomputed
    * per join side rather than cached: post-fix the bucket is ~512 fused
    * multiply-adds per row — far cheaper than materializing a 100 TB corpus.
    */
  /** x07's oracle as a reusable CTE chain ending in `lsh` (q_id, rk, n_id,
    * cos; rk ≤ 3) — shared with the x93 recall evaluation.
    */
  private val annLshCtesSql =
    s"""n AS ($normedSql),
       |dims AS (SELECT vec_id, v, nrm, unnest(generate_series(0, len(v) - 1)) AS i FROM n),
       |proj AS (SELECT vec_id, p,
       |           sum(CASE WHEN ascii(substr(md5(CAST(p AS VARCHAR) || '-' || CAST(i AS VARCHAR)), 1, 1)) % 2 = 1
       |                    THEN v[CAST(i AS INT) + 1] ELSE -v[CAST(i AS INT) + 1] END) AS s
       |         FROM dims CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS p) planes
       |         GROUP BY vec_id, p),
       |buckets AS (SELECT vec_id, array_to_string(list_sort(list(CAST(p AS VARCHAR) ||
       |                     (CASE WHEN round(s, 6) > 0 THEN '+' ELSE '-' END))), '') AS bucket
       |            FROM proj GROUP BY vec_id),
       |nb AS (SELECT n.vec_id, v, nrm, bucket FROM n JOIN buckets USING (vec_id)),
       |lsh AS (SELECT q_id, rk, n_id, cos FROM (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos,
       |         row_number() OVER (PARTITION BY q.vec_id
       |           ORDER BY round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rk
       |  FROM nb q JOIN nb c ON q.bucket = c.bucket AND q.vec_id % 50 = 0 AND q.vec_id < 20000 AND c.vec_id <> q.vec_id)
       |WHERE rk <= 3)""".stripMargin

  val annLsh: Q = Q(
    "x07_ann_lsh",
    s"""WITH $annLshCtesSql
       |SELECT q_id, rk, n_id, cos FROM lsh ORDER BY q_id, rk""".stripMargin
  ) { (s, dir) =>
    val n = normed(s, dir)
    val withBucket = n.withColumn("bucket", bucketCol)
    val q = withBucket.where(col("vec_id") % 50 === 0 && col("vec_id") < 20000)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("nrm").as("qn"), col("bucket"))
    val cos = round(dot(col("qv"), col("embedding")) / (col("qn") * col("nrm")), 6)
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    withBucket.join(q, Seq("bucket"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), cos.as("cos"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select("q_id", "rk", "n_id", "cos")
      .orderBy("q_id", "rk")
  }

  /** Multiprobe LSH ANN: each query probes its own bucket plus all 8
    * Hamming-distance-1 buckets (one sign flipped) — the classic recall
    * lever for sign-LSH without growing the table. Probe fan-out is 9
    * bucket keys per query; candidate generation stays an equi join.
    * Bucket strings are fixed-layout ("0±1±…7±"), so flipping plane p is a
    * 1-char substring splice at position 2p+2.
    */
  val annMultiprobe: Q = Q(
    "x21_ann_multiprobe",
    s"""WITH n AS ($normedSql),
       |dims AS (SELECT vec_id, v, nrm, unnest(generate_series(0, len(v) - 1)) AS i FROM n),
       |proj AS (SELECT vec_id, p,
       |           sum(CASE WHEN ascii(substr(md5(CAST(p AS VARCHAR) || '-' || CAST(i AS VARCHAR)), 1, 1)) % 2 = 1
       |                    THEN v[CAST(i AS INT) + 1] ELSE -v[CAST(i AS INT) + 1] END) AS s
       |         FROM dims CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS p) planes
       |         GROUP BY vec_id, p),
       |buckets AS (SELECT vec_id, array_to_string(list_sort(list(CAST(p AS VARCHAR) ||
       |                     (CASE WHEN round(s, 6) > 0 THEN '+' ELSE '-' END))), '') AS bucket
       |            FROM proj GROUP BY vec_id),
       |nb AS (SELECT n.vec_id, v, nrm, bucket FROM n JOIN buckets USING (vec_id)),
       |probes AS (
       |  SELECT vec_id, v, nrm, bucket AS probe FROM nb WHERE vec_id % 50 = 0 AND vec_id < 20000
       |  UNION ALL
       |  SELECT vec_id, v, nrm,
       |         substr(bucket, 1, CAST(2*p+1 AS INT)) ||
       |         (CASE WHEN substr(bucket, CAST(2*p+2 AS INT), 1) = '+' THEN '-' ELSE '+' END) ||
       |         substr(bucket, CAST(2*p+3 AS INT), 16) AS probe
       |  FROM nb CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS p) flips
       |  WHERE vec_id % 50 = 0 AND vec_id < 20000)
       |SELECT q_id, rk, n_id, cos FROM (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos,
       |         row_number() OVER (PARTITION BY q.vec_id
       |           ORDER BY round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rk
       |  FROM probes q JOIN nb c ON q.probe = c.bucket AND c.vec_id <> q.vec_id)
       |WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin
  ) { (s, dir) =>
    val n = normed(s, dir)
    val nb = n.withColumn("bucket", bucketCol)
    val queries = nb.where(col("vec_id") % 50 === 0 && col("vec_id") < 20000)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("nrm").as("qn"), col("bucket"))
    val flip = (p: Column) => concat(
      col("bucket").substr(lit(1), (p * 2 + 1).cast("int")),
      when(col("bucket").substr(p * 2 + 2, lit(1)) === "+", lit("-")).otherwise(lit("+")),
      col("bucket").substr(p * 2 + 3, lit(16)))
    val probes = queries.select(col("q_id"), col("qv"), col("qn"), col("bucket").as("probe"))
      .unionByName(
        queries
          .withColumn("p", explode(sequence(lit(0), lit(7))))
          .select(col("q_id"), col("qv"), col("qn"), flip(col("p")).as("probe")))
    val cos = round(dot(col("qv"), col("embedding")) / (col("qn") * col("nrm")), 6)
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    nb.join(probes, col("probe") === col("bucket"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), cos.as("cos"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select("q_id", "rk", "n_id", "cos")
      .orderBy("q_id", "rk")
  }

  /** Nearest-centroid assignment shared by x22/x50/x57: corpus × broadcast
    * centroids, argmax rounded cosine with centroid-id tiebreak — as a
    * MAP-SIDE-COMBINED max_by aggregate, not a window. The first
    * formulation ranked the n×c crossJoin rows with row_number over
    * Window.partitionBy(vec_id): centroid count c grows with the corpus
    * (the % 250 seed policy keeps cells ~250 deep — the SemDeDup regime),
    * so the window EXCHANGED AND SORTED n×c ≈ n²/250 wide rows — measured
    * super-linear between decades (x57 sf1→sf10 exponent 1.67, a 48 GB
    * sort at sf10 that OOMed an 8g heap). The aggregate collapses each
    * vector's c candidate rows inside the scan partition (partial
    * aggregation), so the exchange carries n rows at any centroid count;
    * the per-row dot-product flops are unchanged and row-local.
    * Tie-break parity with the oracle's row_number(ORDER BY ccos DESC,
    * c_id): max_by on struct(ccos, −c_id).
    */
  private def assignCells(n: DataFrame, cents: DataFrame): DataFrame = {
    val centCos = round(dot(col("embedding"), col("cv")) / (col("nrm") * col("cn")), 6)
    n.crossJoin(broadcast(cents))
      .withColumn("ccos", centCos)
      .groupBy("vec_id")
      .agg(
        first(col("embedding")).as("embedding"),
        first(col("nrm")).as("nrm"),
        max_by(col("c_id"), struct(col("ccos"), (col("c_id") * -1).as("tb"))).as("c_id"))
  }

  /** IVF (inverted-file) ANN: a deterministic centroid sample partitions the
    * corpus into cells (assignment = argmax rounded cosine, centroid-id
    * tiebreak); each query searches only its own cell (nprobe=1). The
    * 100 TB shape: centroids broadcast to the scan (8 dot products per row,
    * no shuffle), then ONE hash shuffle by cell_id co-locates each query
    * with its candidates — candidate volume is corpus/cells per query
    * instead of the whole corpus.
    */
  val annIvf: Q = Q(
    "x22_ann_ivf",
    s"""WITH n AS ($normedSql),
       |cents AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 250 = 1),
       |assign AS (SELECT vec_id, v, nrm, c_id, rk FROM (
       |  SELECT n.vec_id, n.v, n.nrm, c.c_id,
       |         row_number() OVER (PARTITION BY n.vec_id
       |           ORDER BY round(list_dot_product(n.v, c.cv) / (n.nrm * c.cn), 6) DESC, c.c_id) AS rk
       |  FROM n CROSS JOIN cents c) WHERE rk = 1)
       |SELECT q_id, rk, n_id, cos FROM (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |         round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos,
       |         row_number() OVER (PARTITION BY q.vec_id
       |           ORDER BY round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rk
       |  FROM assign q JOIN assign c ON q.c_id = c.c_id AND q.vec_id % 50 = 0 AND q.vec_id < 20000 AND c.vec_id <> q.vec_id)
       |WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin
  ) { (s, dir) =>
    val n = normed(s, dir)
    val cents = n.where(col("vec_id") % 250 === 1)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"), col("nrm").as("cn"))
    val assign = assignCells(n, cents)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("c_id"))
    val q = assign.where(col("vec_id") % 50 === 0 && col("vec_id") < 20000)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("nrm").as("qn"), col("c_id"))
    val cos = round(dot(col("qv"), col("embedding")) / (col("qn") * col("nrm")), 6)
    val wTop = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    assign.join(q, Seq("c_id"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"), cos.as("cos"))
      .withColumn("rk", row_number().over(wTop))
      .where(col("rk") <= 3)
      .select("q_id", "rk", "n_id", "cos")
      .orderBy("q_id", "rk")
  }

  /** Multi-table LSH ANN: L=4 independent tables of k=6 planes each
    * (planes 8..31 — disjoint from x07's), candidates = union over tables,
    * expressed as ONE equi-join on (table, bucket): every row replicates
    * ×L with its per-table bucket, so the union costs no extra join and
    * shuffles once. The standard recall lever — P(candidate) =
    * 1-(1-s^k)^L — at the cost of L× replication, vs multiprobe's probe
    * fan-out on one table. Candidate pairs dedup BEFORE scoring (a pair
    * colliding in several tables scores once).
    */
  val annMultitable: Q = Q(
    "x24_ann_lsh_multitable",
    s"""WITH n AS ($normedSql),
       |dims AS (SELECT vec_id, v, nrm, unnest(generate_series(0, len(v) - 1)) AS i FROM n),
       |proj AS (SELECT vec_id, p,
       |           sum(CASE WHEN ascii(substr(md5(CAST(p AS VARCHAR) || '-' || CAST(i AS VARCHAR)), 1, 1)) % 2 = 1
       |                    THEN v[CAST(i AS INT) + 1] ELSE -v[CAST(i AS INT) + 1] END) AS s
       |         FROM dims CROSS JOIN (SELECT unnest(generate_series(8, 31)) AS p) planes
       |         GROUP BY vec_id, p),
       |tb AS (SELECT vec_id, CAST((p - 8) // 6 AS INT) AS t,
       |              array_to_string(list_sort(list(lpad(CAST(p AS VARCHAR), 2, '0') ||
       |                     (CASE WHEN round(s, 6) > 0 THEN '+' ELSE '-' END))), '') AS bucket
       |       FROM proj GROUP BY vec_id, CAST((p - 8) // 6 AS INT)),
       |cand AS (SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS n_id
       |         FROM tb q JOIN tb c ON q.t = c.t AND q.bucket = c.bucket
       |           AND q.vec_id % 50 = 0 AND q.vec_id < 20000 AND c.vec_id <> q.vec_id)
       |SELECT q_id, rk, n_id, cos FROM (
       |  SELECT q_id, n_id,
       |         round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) DESC, n_id) AS rk
       |  FROM cand JOIN n a ON a.vec_id = q_id JOIN n b ON b.vec_id = n_id)
       |WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin
  ) { (s, dir) =>
    val n = normed(s, dir)
    val tables = (0 to 3).map(t =>
      struct(lit(t).as("t"), bucketFor(8 + 6 * t to 8 + 6 * t + 5, pad = true).as("bucket")))
    val keyed = n
      .select(col("vec_id"), explode(array(tables: _*)).as("tb"))
      .select(col("vec_id"), col("tb.t").as("t"), col("tb.bucket").as("bucket"))
    val qk = keyed.where(col("vec_id") % 50 === 0 && col("vec_id") < 20000)
      .select(col("vec_id").as("q_id"), col("t"), col("bucket"))
    val cand = keyed.join(qk, Seq("t", "bucket"))
      .where(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"))
      .distinct()
    val na = n.select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("nrm").as("qn"))
    val nb = n.select(col("vec_id").as("n_id"), col("embedding").as("nv"), col("nrm").as("nn"))
    val cos = round(dot(col("qv"), col("nv")) / (col("qn") * col("nn")), 6)
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    cand.join(na, "q_id").join(nb, "n_id")
      .select(col("q_id"), col("n_id"), cos.as("cos"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select("q_id", "rk", "n_id", "cos")
      .orderBy("q_id", "rk")
  }

  /** Per-label embedding centroids — the training step behind IVF cell
    * lists and the standard clustering diagnostic (class prototype
    * vectors). Components are reported as exact integer micro-unit SUMS
    * plus counts rather than float averages: a float mean is
    * summation-order dependent (Spark's partial aggregation vs DuckDB's
    * sequential scan differ in ULPs, which can flip a 6-dp rounding
    * boundary), while integer sums are order-free and the consumer divides.
    * One posexplode + hash aggregate: shuffles (label, dim) pairs, never
    * vectors — linear at any corpus size.
    */
  val labelCentroids: Q = Q(
    "x33_label_centroids",
    """WITH idx AS (SELECT unnest(generate_series(1, 64)) AS i),
      |e AS (SELECT label, i, embedding[i] AS v
      |      FROM embeddings, idx WHERE embedding IS NOT NULL)
      |SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS i,
      |       CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_ppm,
      |       count(*) AS n
      |FROM e GROUP BY label, i ORDER BY label NULLS FIRST, i""".stripMargin
  ) { (s, dir) =>
    embs(s, dir)
      .select(col("label"), posexplode(col("embedding")).as(Seq("p", "v")))
      .groupBy(col("label").cast("long").as("label"), (col("p") + 1).cast("long").as("i"))
      .agg(
        sum(floor(col("v").cast("double") * 1000000 + 0.5).cast("long")).as("sum_ppm"),
        count(lit(1)).as("n"))
      .orderBy("label", "i")
  }

  /** One Lloyd iteration of k-means over the embeddings — the clustering
    * step behind IVF index training (x22 seeds its cells the same way) and
    * semantic dedup. Seeds are the vectors with `vec_id % 250 = 1`;
    * assignment is nearest-seed by rounded cosine (x22's assign shape: the
    * seed set is BROADCAST, the corpus never shuffles for assignment), and
    * the update step emits per-cluster component sums in exact integer ppm
    * plus member counts (x33's order-free integerization) — new centroid =
    * sum_ppm / n, computed by the consumer so the result stays int-exact.
    * At 100 TB the same two-stage plan holds: k×dim cells out of the
    * aggregate, corpus scanned once per iteration.
    */
  val kmeansIter: Q = Q(
    "x50_kmeans_iter",
    s"""WITH n AS ($normedSql),
       |cents AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 250 = 1),
       |assign AS (SELECT vec_id, v, c_id FROM (
       |  SELECT n.vec_id, n.v, c.c_id,
       |         row_number() OVER (PARTITION BY n.vec_id
       |           ORDER BY round(list_dot_product(n.v, c.cv) / (n.nrm * c.cn), 6) DESC, c.c_id) AS rk
       |  FROM n CROSS JOIN cents c) WHERE rk = 1),
       |e AS (SELECT c_id, i, v[i] AS comp
       |      FROM assign, (SELECT unnest(generate_series(1, 64)) AS i) idx)
       |SELECT CAST(c_id AS BIGINT) AS c_id, CAST(i AS BIGINT) AS i,
       |       CAST(sum(CAST(floor(comp * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_ppm,
       |       count(*) AS n
       |FROM e GROUP BY c_id, i ORDER BY c_id, i""".stripMargin
  ) { (s, dir) =>
    val n = normed(s, dir)
    val cents = n.where(col("vec_id") % 250 === 1)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"), col("nrm").as("cn"))
    assignCells(n, cents)
      .select(col("c_id"), posexplode(col("embedding")).as(Seq("p", "comp")))
      .groupBy(col("c_id").cast("long").as("c_id"), (col("p") + 1).cast("long").as("i"))
      .agg(
        sum(floor(col("comp").cast("double") * 1000000 + 0.5).cast("long")).as("sum_ppm"),
        count(lit(1)).as("n"))
      .orderBy("c_id", "i")
  }

  /** SemDeDup-shaped semantic dedup: vectors are assigned to their nearest
    * centroid (x22's IVF assign — centroids broadcast, one pass over the
    * corpus), and WITHIN each cell a vector is dropped when a lower-id
    * cellmate sits above the cosine threshold. The pair join is per-cell —
    * Σ cell² work instead of x05's corpus² — which is the published
    * SemDeDup recipe precisely because it survives web scale: cells are
    * O(corpus/k) and the cross-cell pairs (by construction far apart) are
    * never generated. Exactness caveat vs x05 is the same as any IVF
    * method: a near-dup pair straddling a cell boundary is missed.
    */
  val semanticDedup: Q = Q(
    "x57_semantic_dedup",
    s"""WITH n AS ($normedSql),
       |cents AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n WHERE vec_id % 250 = 1),
       |assign AS (SELECT vec_id, v, nrm, c_id FROM (
       |  SELECT n.vec_id, n.v, n.nrm, c.c_id,
       |         row_number() OVER (PARTITION BY n.vec_id
       |           ORDER BY round(list_dot_product(n.v, c.cv) / (n.nrm * c.cn), 6) DESC, c.c_id) AS rk
       |  FROM n CROSS JOIN cents c) WHERE rk = 1),
       |dup AS (SELECT DISTINCT b.vec_id FROM assign a JOIN assign b
       |        ON a.c_id = b.c_id AND a.vec_id < b.vec_id
       |        WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.4)
       |SELECT s.vec_id AS vec_id, CAST(s.c_id AS BIGINT) AS c_id,
       |       CAST(CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS dropped
       |FROM assign s LEFT JOIN dup d ON s.vec_id = d.vec_id
       |ORDER BY vec_id""".stripMargin
  ) { (s, dir) =>
    val n = normed(s, dir)
    val cents = n.where(col("vec_id") % 250 === 1)
      .select(col("vec_id").as("c_id"), col("embedding").as("cv"), col("nrm").as("cn"))
    val assign = assignCells(n, cents)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("c_id"))
    val pairCos = round(dot(col("a.embedding"), col("b.embedding")) /
      (col("a.nrm") * col("b.nrm")), 6)
    val dup = assign.as("a")
      .join(assign.as("b"),
        col("a.c_id") === col("b.c_id") && col("a.vec_id") < col("b.vec_id"))
      .where(pairCos >= 0.4)
      .select(col("b.vec_id").as("vec_id"))
      .distinct()
    assign.select(col("vec_id"), col("c_id").cast("long").as("c_id"))
      .join(dup.withColumn("hit", lit(1L)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("c_id"),
        coalesce(col("hit"), lit(0L)).as("dropped"))
      .orderBy("vec_id")
  }

  /** Int8 scalar quantization + quantized top-k — the product-quantization
    * memory story behind every billion-vector ANN deployment: each 64-dim
    * float vector (256 B) becomes 64 one-byte codes (4× compression; at
    * 100 TB of embeddings the codes fit where the floats never will), and
    * candidate scoring runs on INTEGER dot products of centered codes — no
    * float in the hot loop, exact int64 arithmetic, order-free and
    * partitioning-independent.
    *
    * Quantization is per-vector min/max: code_i = ⌊(x_i − mn)·255/(mx − mn)
    * + 0.5⌋. The chain is float→double casts (exact) and one IEEE
    * multiply/divide both engines round identically from identical inputs,
    * so the codes — and everything after them, all integer — hash-match.
    * The query side (vec_id % 50 = 0) is broadcast like x06: the corpus
    * scan stays partition-parallel, the only shuffle is the per-query
    * top-k window over ~k·|queries| rows. QueriesSpec measures recall@5 of
    * the quantized ranking against the exact-cosine x06 answer (~0.6 raw;
    * 0.86 when the quantized order generates 20 candidates for exact
    * re-rank — the two-stage shape a production deployment runs).
    */
  val quantizedTopK: Q = Q(
    "x69_quantized_topk",
    """WITH c AS (
      |  SELECT vec_id,
      |         list_transform(embedding::DOUBLE[], x -> CASE WHEN mx = mn THEN 0
      |           ELSE CAST(floor((x - mn) * 255.0 / (mx - mn) + 0.5) AS BIGINT) - 128 END) AS codes
      |  FROM (SELECT vec_id, embedding,
      |               CAST(list_min(embedding) AS DOUBLE) AS mn,
      |               CAST(list_max(embedding) AS DOUBLE) AS mx
      |        FROM embeddings))
      |SELECT q_id, rk, n_id, qdot FROM (
      |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
      |         CAST(list_dot_product(q.codes, c.codes) AS BIGINT) AS qdot,
      |         row_number() OVER (PARTITION BY q.vec_id
      |           ORDER BY CAST(list_dot_product(q.codes, c.codes) AS BIGINT) DESC, c.vec_id) AS rk
      |  FROM c q JOIN c ON q.vec_id % 50 = 0 AND q.vec_id < 20000 AND c.vec_id <> q.vec_id) t
      |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin
  ) { (s, dir) =>
    // memoized code frame (sqCodes): consumed by both sides of the
    // quantized self-join — one scan + transform instead of two
    val codes = sqCodes(s, dir)
    // integer dot product of the centered codes — exact int64, products are
    // ≤ 128²·64 ≈ 2^20, no overflow risk. Codegen'd DotI64 (round 14, guide
    // §4): the interpreted zip_with/aggregate fold ran once per candidate
    // pair — 240M boxed lambda evaluations at the 100× gate, ~30 s of the
    // 36 s wall (StageDiag) — where the native loop participates in
    // whole-stage codegen.
    val qdot = graft.functions.GraftFunctions.dotI64(col("q.codes"), col("c.codes"))
    // Round 15 (guide §2.3/§2.4 — r14 verdict item 8): the row_number
    // window shuffled and sorted EVERY (corpus, query) pair row —
    // |corpus|·|queries| rows through one exchange by q_id. The top-5
    // selection is a bounded partial aggregate instead (the x30
    // TopKPairAgg shape): each map task forwards ≤ 5 (qdot DESC, n_id ASC)
    // pairs per query, so the exchange carries winner arrays, never pair
    // rows, and the pair stream dies inside the broadcast-join stage.
    // LOSSLESS for the exact top-5: (qdot DESC, n_id ASC) is a TOTAL order
    // (n_id is unique per query), so the global top-5 is contained in the
    // union of per-task top-5s and the k-way ordered merge reproduces
    // row_number's cut exactly. Null qdot (null embedding → null codes)
    // rides the rank-last sentinel — Long.MinValue is strictly below any
    // real centered-code dot (|qdot| ≤ 128²·64) — and decodes back to
    // NULL, matching the window's DESC NULLS LAST (NtilePlan's x30
    // discipline).
    val topk = udaf(new graft.functions.TopKPairAgg(5),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
    // the QUERY side broadcasts (x06's shape) — the corpus scan stays
    // partition-parallel and is never shuffled
    codes.as("c")
      .join(broadcast(codes.where(col("vec_id") % 50 === 0 && col("vec_id") < 20000)).as("q"),
        col("c.vec_id") =!= col("q.vec_id"))
      .select(col("q.vec_id").as("q_id"), col("c.vec_id").as("n_id"),
        coalesce(qdot, lit(Long.MinValue)).as("qd"))
      .groupBy("q_id")
      .agg(topk(col("qd"), col("n_id")).as("picked"))
      .select(col("q_id"), posexplode(col("picked")).as(Seq("pos", "pair")))
      .select(col("q_id"), (col("pos") + 1).as("rk"), col("pair._2").as("n_id"),
        when(col("pair._1") === Long.MinValue, lit(null).cast("long"))
          .otherwise(col("pair._1")).as("qdot"))
      .orderBy("q_id", "rk")
  }

  /** Label-centroid affinity matrix — the inter-cluster redundancy signal
    * on top of x33's centroids: pairwise cosine between every pair of
    * label centroids, flagging clusters close enough (≥ 0.9) that a
    * curation pass should consider merging or re-balancing them. All
    * accumulation is exact: per-label per-dimension INTEGER ppm sums
    * (order-free), centroid components as exact `sum div n`, integer dot
    * products of the ppm centroids, with float entering only for the
    * final sqrt-normalize chain both engines round identically (the
    * x05/x69-proven IEEE contract). The matrix is |labels|² — a handful
    * of rows; the only corpus-scale work is the one posexplode aggregate.
    */
  val labelAffinity: Q = Q(
    "x87_label_affinity",
    """WITH e AS (SELECT label, i, CAST(floor((embedding::DOUBLE[])[i] * 1000000 + 0.5) AS BIGINT) AS ppm
      |           FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) idx),
      |c AS (SELECT label, i, sum(ppm) AS sp FROM e GROUP BY label, i),
      |d AS (SELECT a.label AS label_a, b.label AS label_b, sum(a.sp * b.sp) AS dot_ab
      |      FROM c a JOIN c b ON a.i = b.i AND a.label < b.label
      |      GROUP BY 1, 2),
      |nrm AS (SELECT label, sum(sp * sp) AS nn FROM c GROUP BY label)
      |SELECT label_a, label_b, cos, (cos >= 0.9) AS near_dup_clusters FROM (
      |  SELECT label_a, label_b,
      |         round(CAST(dot_ab AS DOUBLE) / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))), 6) AS cos
      |  FROM d JOIN nrm na ON d.label_a = na.label JOIN nrm nb ON d.label_b = nb.label)
      |ORDER BY label_a, label_b""".stripMargin
  ) { (s, dir) =>
    val ppm = embs(s, dir).select(
      col("label"), posexplode(col("embedding")).as(Seq("p", "comp")))
      .select(col("label"), (col("p") + 1).as("i"),
        floor(col("comp").cast("double") * 1000000 + 0.5).cast("long").as("ppm"))
    // cosine is scale-invariant, so the centroids enter UNDIVIDED as their
    // raw per-dim ppm sums — no integer division whose floor-vs-truncate
    // semantics diverge on negative sums; the sum-of-products statistics
    // ride decimal(38,0) (a billion-vector label's ppm sums square past
    // int64 — the x85 overflow class), matching DuckDB's HUGEINT sums
    val c = ppm.groupBy("label", "i")
      .agg(sum(col("ppm")).cast("decimal(38,0)").as("sp"))
    val d = c.as("a")
      .join(c.as("b"), col("a.i") === col("b.i") && col("a.label") < col("b.label"))
      .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
      .agg(sum(col("a.sp") * col("b.sp")).as("dot_ab"))
    val nrm = c.groupBy("label").agg(sum(col("sp") * col("sp")).as("nn"))
    d.join(nrm.select(col("label").as("label_a"), col("nn").as("na")), "label_a")
      .join(nrm.select(col("label").as("label_b"), col("nn").as("nb")), "label_b")
      .select(col("label_a"), col("label_b"),
        round(col("dot_ab").cast("double") / (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))), 6).as("cos"))
      // the flag compares the ROUNDED cosine (identical on both engines) —
      // a squared-integer-dot formulation would be the x85 overflow class
      .select(col("label_a"), col("label_b"), col("cos"),
        (col("cos") >= 0.9).as("near_dup_clusters"))
      .orderBy("label_a", "label_b")
  }

  /** ANN recall evaluation — the monitoring op a production vector index
    * runs continuously: recall@3 of the LSH index (x07) against the exact
    * top-3 (x06's ranking restricted to rk ≤ 3), per query, in exact ppm.
    * "Measure, don't guess": the recall/cost trade of every approximate
    * index is an empirical property of the data distribution, so the
    * evaluator is a first-class operator, not a test-only artifact.
    *
    * Scale shape: the exact side here is the oracle-baseline brute-force
    * scoring (quadratic family, like x05/x06 — at 100 TB one evaluates on a
    * SAMPLE of queries, which is exactly what the `vec_id % 50` query slice
    * is); the LSH side is the production bucket join. The comparison itself
    * is a (q_id, n_id) equi-join over top-k-sized sets — negligible.
    */
  val annRecall: Q = Q(
    "x93_ann_recall",
    s"""WITH $annLshCtesSql,
       |exact0 AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |             row_number() OVER (PARTITION BY q.vec_id
       |               ORDER BY round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rk
       |           FROM n q JOIN n c ON q.vec_id % 50 = 0 AND q.vec_id < 20000 AND c.vec_id <> q.vec_id),
       |exact AS (SELECT q_id, n_id FROM exact0 WHERE rk <= 3)
       |SELECT e.q_id AS q_id, CAST(count(l.n_id) AS BIGINT) AS n_hit,
       |       CAST(count(l.n_id) * 1000000 // 3 AS BIGINT) AS recall_ppm
       |FROM exact e LEFT JOIN lsh l ON e.q_id = l.q_id AND e.n_id = l.n_id
       |GROUP BY e.q_id ORDER BY q_id""".stripMargin
  ) { (s, dir) =>
    val exact = cosineTopK.run(s, dir).where(col("rk") <= 3).select("q_id", "n_id")
    val lshPairs = annLsh.run(s, dir).select("q_id", "n_id")
    val hits = exact.join(lshPairs, Seq("q_id", "n_id"), "left_semi")
      .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
    exact.groupBy("q_id").agg(count(lit(1)).as("n3"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        expr("coalesce(n_hit, 0) * 1000000 div 3").as("recall_ppm"))
      .orderBy("q_id")
  }

  /** Product-quantization ANN (Jégou, Douze & Schmid, *Product Quantization
    * for Nearest Neighbor Search*, TPAMI 2011): the 64-dim space splits
    * into 16 subspaces of 4 dims, each with a 64-entry codebook — seeded
    * from the 64 lowest-id vectors (the deterministic seed policy x50/x57
    * use) and refined by ONE Lloyd iteration with exact integer-ppm means.
    * Components are quantized from the NORMALIZED vector (v/‖v‖ in ppm), so
    * ADC's L2 ranking is cosine ranking (‖a−b‖² = 2−2cos on unit vectors) —
    * apples-to-apples with the exact x06 baseline. Every corpus vector
    * encodes to 16 codes (nearest entry per subspace, ties to the lowest
    * centroid id); queries rank candidates by ADC — the sum over subspaces
    * of the query-to-centroid distance looked up by the candidate's code.
    * Completes the ANN family: LSH (x07/x21/x24) buckets, IVF (x22)
    * partitions, int8 SQ (x69) compresses per-dim — PQ compresses per-
    * SUBSPACE: 16×6 bits = 12 bytes/vector vs 256 raw, the compression that
    * fits a billion-vector index in executor memory (recall@3 = 0.50
    * spec-measured vs SQ's 0.60 at 5× the bytes).
    *
    * Everything after the normalization is exact int64 arithmetic
    * (|x| ≤ 1e6 ⇒ ADC ≤ 16·4·(2e6)² ≈ 2.6e14, no overflow); the Lloyd mean
    * adds +2e6·n before the integer division so Spark's truncating `div`
    * equals DuckDB's flooring `//` on negative sums. Scale shape: the
    * codebook is k×d values → BROADCAST into the one-pass encode; the ADC
    * lookup table is |queries|×k×s rows → broadcast-joined against the code
    * stream; the corpus is scanned once per assignment pass and shuffled
    * only for the per-(vec,subspace) distance aggregate.
    */
  val pqAnn: Q = Q(
    "x94_pq_ann",
    s"""WITH e AS (SELECT vec_id, list_transform(v, x ->
       |             CAST(floor(x / nrm * 1000000 + 0.5) AS BIGINT)) AS v FROM ($normedSql) n0),
       |dims AS (SELECT vec_id, CAST((i-1) // 4 AS BIGINT) AS s, i, v[i] AS val
       |         FROM e, (SELECT unnest(generate_series(1, 64)) AS i) idx),
      |cb0 AS (SELECT vec_id AS cid, s, i, val FROM dims WHERE vec_id < 64),
      |cdist0 AS (SELECT d.vec_id, d.s, c.cid, sum((d.val - c.val) * (d.val - c.val)) AS dist
      |           FROM dims d JOIN cb0 c ON d.s = c.s AND d.i = c.i
      |           GROUP BY d.vec_id, d.s, c.cid),
      |codes0 AS (SELECT vec_id, s, cid FROM (
      |  SELECT vec_id, s, cid, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cid) AS rk
      |  FROM cdist0) WHERE rk = 1),
      |cb AS (SELECT a.cid, a.s, d.i,
      |              (sum(d.val) + 2000000 * count(*)) // count(*) - 2000000 AS val
      |       FROM codes0 a JOIN dims d ON d.vec_id = a.vec_id AND d.s = a.s
      |       GROUP BY a.cid, a.s, d.i),
      |cdist AS (SELECT d.vec_id, d.s, c.cid, sum((d.val - c.val) * (d.val - c.val)) AS dist
      |          FROM dims d JOIN cb c ON d.s = c.s AND d.i = c.i
      |          GROUP BY d.vec_id, d.s, c.cid),
      |codes AS (SELECT vec_id, s, cid FROM (
      |  SELECT vec_id, s, cid, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cid) AS rk
      |  FROM cdist) WHERE rk = 1),
      |qdist AS (SELECT vec_id AS q_id, s, cid, dist FROM cdist WHERE vec_id % 50 = 0 AND vec_id < 20000),
      |adc AS (SELECT q.q_id, c.vec_id AS n_id, CAST(sum(q.dist) AS BIGINT) AS approx_d
      |        FROM codes c JOIN qdist q ON q.s = c.s AND q.cid = c.cid
      |        WHERE c.vec_id <> q.q_id
      |        GROUP BY q.q_id, c.vec_id)
      |SELECT q_id, rk, n_id, approx_d FROM (
      |  SELECT q_id, n_id, approx_d,
      |         row_number() OVER (PARTITION BY q_id ORDER BY approx_d, n_id) AS rk
      |  FROM adc) WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin
  ) { (s, dir) =>
    // memoized ppm frame (A/B-measured win — see ppmVectors scaladoc)
    val e = ppmVectors(s, dir)

    // Codebooks are k×d MODEL PARAMETERS — collected to the driver and
    // shipped as literals (the planeSigns/bloom pattern), so every
    // assignment pass is a row-local codegen'd fold instead of a
    // corpus×k-row explode-join (which measured 5× slower at sf1: the
    // relational formulation the oracle keeps costs 82M joined rows where
    // this costs 4096 fused ops per row).

    /** Per-centroid subspace L2 distances of this row's `v`, ascending-cid
      * order — exact int64, identical to the oracle's cdist aggregate.
      */
    def distArr(sIdx: Int, vals: Seq[Seq[Long]]): Column =
      transform(sequence(lit(0), lit(vals.length - 1)), c =>
        aggregate(sequence(lit(0), lit(3)), lit(0L), (acc, j) => {
          val comp = element_at(col("v"), lit(sIdx * 4) + j + lit(1))
          val cval = element_at(element_at(typedLit(vals), c + 1), j + 1)
          acc + (comp - cval) * (comp - cval)
        }))

    /** One pass, all 16 subspaces: positions from the native
      * [[graft.functions.SubspaceArgmin]] loop (round 14, guide §4 — the
      * HOF formulation ran one interpreted aggregate fold per entry per
      * subspace per row), then positions → ids via O(1) literal lookups.
      * The position array is MATERIALIZED in its own projection so the
      * 16-use id lookup reads an attribute instead of re-running the
      * argmin per element (the x92 re-evaluation lesson). The
      * bridge-unavailable fallback is the original HOF argmin with
      * identical first-min ties.
      */
    def assignCodes(ids: Array[Seq[Long]], vals: Array[Seq[Seq[Long]]]): DataFrame = {
      val cbJava: Array[Array[Array[Long]]] = vals.map(_.map(_.toArray).toArray)
      val idsLit = typedLit(ids.toSeq)
      val pos = graft.functions.GraftFunctions.subspaceArgmin(col("v"), cbJava, 4)(
        array((0 until 16).map { sx =>
          val d = distArr(sx, vals(sx))
          array_position(d, array_min(d)).cast("int")
        }: _*))
      e.select(col("vec_id"), pos.as("pos"))
        .select(col("vec_id"),
          posexplode(transform(sequence(lit(0), lit(15)), sx =>
            element_at(element_at(idsLit, sx + 1), element_at(col("pos"), sx + 1))))
            .as(Seq("s", "cid")))
        .select(col("vec_id"), col("s").cast("long").as("s"), col("cid"))
    }

    // seed codebook: the 64 lowest-id vectors' subvectors
    val seedRows = e.where(col("vec_id") < 64).orderBy("vec_id").collect()
    val seedIds: Seq[Long] = seedRows.map(_.getAs[Long]("vec_id")).toSeq
    val seedVecs = seedRows.map(_.getSeq[Long](1).toArray)
    val seedIdsPerS  = Array.fill(16)(seedIds)
    val seedValsPerS = Array.tabulate(16)(sx =>
      seedVecs.map(v => v.slice(sx * 4, sx * 4 + 4).toSeq).toSeq)
    val codes0 = assignCodes(seedIdsPerS, seedValsPerS)

    // one Lloyd refinement: integer centroid means per (cid, s, i) — ONE
    // corpus-pass aggregate to k×d cells, collected like the seeds. The
    // +2e6·n offset keeps the numerator positive so Spark's truncating
    // `div` equals DuckDB's flooring `//` for negative component sums.
    val dims = e.select(col("vec_id"), posexplode(col("v")).as(Seq("p", "val")))
      .select(col("vec_id"), expr("p div 4").cast("long").as("s"),
        col("p").as("i"), col("val"))
    val cb1Rows = codes0.as("a")
      .join(dims.as("d"), col("d.vec_id") === col("a.vec_id") && col("d.s") === col("a.s"))
      .groupBy(col("a.cid").as("cid"), col("a.s").as("cs"), col("d.i").as("ci"))
      .agg(expr("(sum(val) + 2000000 * count(*)) div count(*) - 2000000").as("cval"))
      .collect()
    val bys = cb1Rows.groupBy(_.getAs[Long]("cs"))
    val cb1IdsPerS: Array[Seq[Long]] = Array.tabulate(16)(sx =>
      bys(sx.toLong).map(_.getAs[Long]("cid")).distinct.sorted.toSeq)
    val cb1ValsPerS: Array[Seq[Seq[Long]]] = Array.tabulate(16) { sx =>
      val rows = bys(sx.toLong)
      cb1IdsPerS(sx).map(cid =>
        rows.filter(_.getAs[Long]("cid") == cid)
          .sortBy(_.getAs[Int]("ci")).map(_.getAs[Long]("cval")).toSeq)
    }

    val codes = assignCodes(cb1IdsPerS, cb1ValsPerS)
    // ADC lookup table: FULL per-centroid distances, query rows only
    val qdist = e.where(col("vec_id") % 50 === 0 && col("vec_id") < 20000)
      .select(col("vec_id").as("q_id"),
        posexplode(array((0 until 16).map(sx => distArr(sx, cb1ValsPerS(sx))): _*))
          .as(Seq("qs", "dists")))
      .select(col("q_id"), col("qs").cast("long").as("qs"),
        posexplode(col("dists")).as(Seq("cpos", "dist")))
      .withColumn("qcid", element_at(
        element_at(typedLit(cb1IdsPerS.toSeq), col("qs").cast("int") + 1),
        col("cpos").cast("int") + 1))
      .select("q_id", "qs", "qcid", "dist")
    val adc = codes
      .join(broadcast(qdist), col("s") === col("qs") && col("cid") === col("qcid"))
      .where(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id")
      .agg(sum(col("dist")).as("approx_d"))
    val wTop = Window.partitionBy("q_id").orderBy(col("approx_d"), col("vec_id"))
    adc.withColumn("rk", row_number().over(wTop)).where(col("rk") <= 3)
      .select(col("q_id"), col("rk"), col("vec_id").as("n_id"), col("approx_d"))
      .orderBy("q_id", "rk")
  }

  /** IVF-PQ ANN — the composition FAISS ships as its production index
    * (Jégou et al. TPAMI'11 §IV): a coarse IVF quantizer (the x22/x57 seed
    * cells, vec_id % 250 = 1) partitions the corpus; every vector is PQ-
    * encoded on its RESIDUAL (v − cell centroid) with a shared 16×64
    * codebook seeded from the 64 lowest-id residuals; a query probes its
    * 2 nearest cells, forms a PER-CELL query residual, and ranks only the
    * probed cells' members by integer ADC. Residual encoding is what makes
    * the composition work: residual magnitudes are cell-radius-sized, so
    * the shared codebook spends its 64 entries on a much smaller space
    * than raw vectors (x94's flat PQ) would need.
    *
    * Exact int64 throughout: ppm components, residual subtraction, squared
    * L2 (≤ 16·4·(4e6)² ≈ 1e15), first-min ties to the lowest id at every
    * level — identical in both engines. Scale shape: coarse centroids and
    * PQ codebook are collected model parameters shipped as LITERALS (cell
    * assign, residual, encode all row-local, one corpus pass); the ADC
    * table is |queries|×2×k×s rows broadcast against the code stream; the
    * probe-2-of-C cell filter is what bounds candidate volume at a billion
    * vectors.
    */
  val ivfpqAnn: Q = Q(
    "x97_ivfpq_ann",
    s"""WITH n AS ($normedSql),
       |e AS (SELECT vec_id, list_transform(v, x ->
       |        CAST(floor(x / nrm * 1000000 + 0.5) AS BIGINT)) AS v FROM n),
       |dims AS (SELECT vec_id, CAST((i-1) // 4 AS BIGINT) AS s, i, v[i] AS val
       |         FROM e, (SELECT unnest(generate_series(1, 64)) AS i) idx),
       |cdims AS (SELECT vec_id AS gid, i, val FROM dims WHERE vec_id % 250 = 1 AND vec_id < 20000),
       |cd AS (SELECT d.vec_id, c.gid, sum((d.val - c.val) * (d.val - c.val)) AS gd
       |       FROM dims d JOIN cdims c ON d.i = c.i GROUP BY d.vec_id, c.gid),
       |cellrk AS (SELECT vec_id, gid, row_number() OVER (PARTITION BY vec_id ORDER BY gd, gid) AS rk FROM cd),
       |cell AS (SELECT vec_id, gid FROM cellrk WHERE rk = 1),
       |rdims AS (SELECT d.vec_id, a.gid, d.s, d.i, d.val - c.val AS val
       |          FROM dims d JOIN cell a ON a.vec_id = d.vec_id
       |                      JOIN cdims c ON c.gid = a.gid AND c.i = d.i),
       |scb AS (SELECT vec_id AS cid, s, i, val FROM rdims WHERE vec_id < 64),
       |pdist AS (SELECT r.vec_id, r.s, c.cid, sum((r.val - c.val) * (r.val - c.val)) AS dist
       |          FROM rdims r JOIN scb c ON r.s = c.s AND r.i = c.i
       |          GROUP BY r.vec_id, r.s, c.cid),
       |codes AS (SELECT vec_id, s, cid FROM (
       |  SELECT vec_id, s, cid, row_number() OVER (PARTITION BY vec_id, s ORDER BY dist, cid) AS rk
       |  FROM pdist) WHERE rk = 1),
       |qprobe AS (SELECT vec_id AS q_id, gid FROM cellrk
       |           WHERE vec_id % 50 = 0 AND vec_id < 20000 AND rk <= 2),
       |qrdims AS (SELECT p.q_id, p.gid, d.s, d.i, d.val - c.val AS val
       |           FROM qprobe p JOIN dims d ON d.vec_id = p.q_id
       |                        JOIN cdims c ON c.gid = p.gid AND c.i = d.i),
       |qdist AS (SELECT r.q_id, r.gid, r.s, c.cid, sum((r.val - c.val) * (r.val - c.val)) AS dist
       |          FROM qrdims r JOIN scb c ON r.s = c.s AND r.i = c.i
       |          GROUP BY r.q_id, r.gid, r.s, c.cid),
       |adc AS (SELECT p.q_id, x.vec_id AS n_id, CAST(sum(qd.dist) AS BIGINT) AS approx_d
       |        FROM qprobe p JOIN cell x ON x.gid = p.gid AND x.vec_id <> p.q_id
       |                      JOIN codes k ON k.vec_id = x.vec_id
       |                      JOIN qdist qd ON qd.q_id = p.q_id AND qd.gid = x.gid
       |                                   AND qd.s = k.s AND qd.cid = k.cid
       |        GROUP BY p.q_id, x.vec_id)
       |SELECT q_id, rk, n_id, approx_d FROM (
       |  SELECT q_id, n_id, approx_d,
       |         row_number() OVER (PARTITION BY q_id ORDER BY approx_d, n_id) AS rk
       |  FROM adc) WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin
  ) { (s, dir) =>
    // memoized ppm frame (A/B-measured win — see ppmVectors scaladoc)
    val e = ppmVectors(s, dir)

    // --- coarse quantizer: collected centroids as literals, ascending gid.
    // FIXED count (≤80, inert below sf10 like the query cap): the literal
    // codebook and the per-row assignment flops must be corpus-size-
    // independent — a k ∝ n seed policy grows the typedLit plan tree and
    // the n·c assignment work without bound (measured 167 s at sf10 before
    // the cap, 303 s before the query cap). Fixed-k IVF is the retrieval
    // design: cells deepen linearly and the probe-2 candidate volume grows
    // linearly with the corpus, never quadratically.
    val centRows = e.where(col("vec_id") % 250 === 1 && col("vec_id") < 20000)
      .orderBy("vec_id").collect()
    require(centRows.length >= 2, "IVF needs at least 2 cells to probe")
    val centIds: Seq[Long]       = centRows.map(_.getAs[Long]("vec_id")).toSeq
    val centVals: Seq[Seq[Long]] = centRows.map(_.getSeq[Long](1).toSeq).toSeq

    /** Full-64-dim squared L2 to every centroid, ascending-gid order. */
    def centDists(vc: Column): Column =
      transform(sequence(lit(0), lit(centIds.length - 1)), c =>
        aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, j) => {
          val d = element_at(vc, j + 1) - element_at(element_at(typedLit(centVals), c + 1), j + 1)
          acc + d * d
        }))
    /** Residual v − centroid[cpos] (cpos 1-based into the literal). */
    def residual(vc: Column, cpos: Column): Column =
      transform(sequence(lit(0), lit(63)), j =>
        element_at(vc, j + 1) - element_at(element_at(typedLit(centVals), cpos), j + 1))

    // Corpus-side cell assignment via the native SubspaceArgmin loop
    // (round 14, guide §4 — one "subspace" of width 64 over the whole
    // vector; the HOF centDists ran an interpreted 64-term fold per
    // centroid per row). The full distance ARRAY is only needed for the
    // 2nd-nearest probe, which is query-side — computed below on the ~400
    // query rows where interpreted cost is irrelevant.
    val centValsJava: Array[Array[Long]] = centVals.map(_.toArray).toArray
    val withCell = e
      .withColumn("cposArr",
        graft.functions.GraftFunctions.subspaceArgmin(col("v"), Array(centValsJava), 64)(
          array(array_position(centDists(col("v")), array_min(centDists(col("v")))).cast("int"))))
      .withColumn("cpos", element_at(col("cposArr"), 1))
      .withColumn("gid", element_at(typedLit(centIds), col("cpos")))
      .drop("cposArr")
    val r = withCell.withColumn("rv", residual(col("v"), col("cpos")))

    // --- shared residual PQ codebook: the 64 lowest-id residuals
    val seedRows = r.where(col("vec_id") < 64).orderBy("vec_id")
      .select("vec_id", "rv").collect()
    val seedIds: Seq[Long] = seedRows.map(_.getAs[Long]("vec_id")).toSeq
    val seedValsPerS: Array[Seq[Seq[Long]]] = Array.tabulate(16)(sx =>
      seedRows.map(_.getSeq[Long](1).slice(sx * 4, sx * 4 + 4).toSeq).toSeq)

    /** Per-centroid subspace L2 of `vec`'s subvector, ascending-cid order. */
    def distArr(vec: Column, sIdx: Int, vals: Seq[Seq[Long]]): Column =
      transform(sequence(lit(0), lit(vals.length - 1)), c =>
        aggregate(sequence(lit(0), lit(3)), lit(0L), (acc, j) => {
          val d = element_at(vec, lit(sIdx * 4) + j + lit(1)) -
            element_at(element_at(typedLit(vals), c + 1), j + 1)
          acc + d * d
        }))
    // one corpus pass: cell id + 16 codes, all row-local — positions from
    // the native SubspaceArgmin loop, materialized so the 16-use id lookup
    // reads an attribute (the x92 re-evaluation lesson); fallback is the
    // original HOF argmin with identical first-min ties
    val seedCbJava: Array[Array[Array[Long]]] = seedValsPerS.map(_.map(_.toArray).toArray)
    val codes = r
      .withColumn("pcs",
        graft.functions.GraftFunctions.subspaceArgmin(col("rv"), seedCbJava, 4)(
          array((0 until 16).map { sx =>
            val d = distArr(col("rv"), sx, seedValsPerS(sx))
            array_position(d, array_min(d)).cast("int")
          }: _*)))
      .select(col("vec_id"), col("gid"),
        posexplode(transform(sequence(lit(0), lit(15)), sx =>
          element_at(typedLit(seedIds), element_at(col("pcs"), sx + 1)))).as(Seq("s", "cid")))
      .select(col("vec_id"), col("gid"), col("s").cast("long").as("s"), col("cid"))

    // --- query side: probe the 2 nearest cells, per-cell residual, ADC
    // table. The full distance array (for the 2nd-nearest mask) is built
    // HERE, on query rows only.
    val masked = expr("transform(cd, (x, i) -> CASE WHEN i + 1 = cpos THEN CAST(9223372036854775807 AS BIGINT) ELSE x END)")
    val q = withCell.where(col("vec_id") % 50 === 0 && col("vec_id") < 20000)
      .withColumn("cd", centDists(col("v")))
      .withColumn("cd2", masked)
      .withColumn("cpos2", array_position(col("cd2"), array_min(col("cd2"))).cast("int"))
      .select(col("vec_id").as("q_id"), col("v"),
        explode(array(col("cpos"), col("cpos2"))).as("qcpos"))
      .withColumn("qgid", element_at(typedLit(centIds), col("qcpos")))
      .withColumn("qrv", residual(col("v"), col("qcpos")))
    val qdist = q
      .select(col("q_id"), col("qgid"),
        posexplode(array((0 until 16).map(sx => distArr(col("qrv"), sx, seedValsPerS(sx))): _*))
          .as(Seq("qs", "dists")))
      .select(col("q_id"), col("qgid"), col("qs").cast("long").as("qs"),
        posexplode(col("dists")).as(Seq("cposx", "dist")))
      .withColumn("qcid", element_at(typedLit(seedIds), col("cposx").cast("int") + 1))
      .select("q_id", "qgid", "qs", "qcid", "dist")

    val adc = codes
      .join(broadcast(qdist),
        col("gid") === col("qgid") && col("s") === col("qs") && col("cid") === col("qcid"))
      .where(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id")
      .agg(sum(col("dist")).as("approx_d"))
    val wTop = Window.partitionBy("q_id").orderBy(col("approx_d"), col("vec_id"))
    adc.withColumn("rk", row_number().over(wTop)).where(col("rk") <= 3)
      .select(col("q_id"), col("rk"), col("vec_id").as("n_id"), col("approx_d"))
      .orderBy("q_id", "rk")
  }

  /** RANKING-QUALITY evaluation of the ANN index — NDCG@3 and MRR of the
    * x07 LSH ranking against the exact x06 top-3, extending x93's recall
    * to POSITION-AWARE metrics (recall can't see that the index returns
    * the right neighbors in the wrong order; NDCG/MRR can). The
    * logarithmic NDCG discounts 1/log2(i+1) would be transcendental —
    * uncertifiable cross-engine — except that only k=3 positions exist, so
    * they are PLAN-TIME ppm literals (1000000, 630930, 500000) and the
    * whole metric is integer arithmetic: DCG = Σ w(rk) over hits,
    * IDCG = 2130930 (all three relevant), ndcg_ppm = DCG·10⁶ div IDCG,
    * mrr_ppm = 10⁶ div min hit rank. Per-query rows (the monitoring
    * artifact a production index alerts on), zeros kept for queries the
    * index fully misses.
    *
    * Scale shape: both rankings are already candidate-scale; the eval is
    * a key-join of two (query, neighbor) lists plus a query-bounded
    * aggregate — negligible next to the index it audits, which is the
    * point of running it continuously on a query sample.
    */
  val annRankEval: Q = Q(
    "x110_ann_rank_eval",
    s"""WITH $annLshCtesSql,
       |exact0 AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |             row_number() OVER (PARTITION BY q.vec_id
       |               ORDER BY round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rk
       |           FROM n q JOIN n c ON q.vec_id % 50 = 0 AND q.vec_id < 20000 AND c.vec_id <> q.vec_id),
       |exact AS (SELECT q_id, n_id FROM exact0 WHERE rk <= 3),
       |hits AS (
       |  SELECT e.q_id, l.rk FROM exact e JOIN lsh l ON e.q_id = l.q_id AND e.n_id = l.n_id
       |  WHERE l.rk <= 3),
       |agg AS (
       |  SELECT q_id, count(*) AS n_hit,
       |         sum(CASE rk WHEN 1 THEN 1000000 WHEN 2 THEN 630930 ELSE 500000 END) AS dcg,
       |         min(rk) AS first_hit
       |  FROM hits GROUP BY q_id)
       |SELECT q.q_id AS q_id,
       |       CAST(coalesce(a.n_hit, 0) AS BIGINT) AS n_hit,
       |       CAST(coalesce(1000000 // a.first_hit, 0) AS BIGINT) AS mrr_ppm,
       |       CAST(coalesce(a.dcg * 1000000 // 2130930, 0) AS BIGINT) AS ndcg_ppm
       |FROM (SELECT DISTINCT q_id FROM exact) q LEFT JOIN agg a ON q.q_id = a.q_id
       |ORDER BY q_id""".stripMargin
  ) { (s, dir) =>
    val exact = cosineTopK.run(s, dir).where(col("rk") <= 3).select("q_id", "n_id")
    val lsh = annLsh.run(s, dir).where(col("rk") <= 3).select("q_id", "rk", "n_id")
    val hits = exact.join(lsh, Seq("q_id", "n_id"))
    val agg = hits.groupBy("q_id").agg(
      count(lit(1)).as("n_hit"),
      sum(when(col("rk") === 1, 1000000L).when(col("rk") === 2, 630930L)
        .otherwise(500000L)).as("dcg"),
      min(col("rk")).as("first_hit"))
    exact.select("q_id").distinct()
      .join(agg, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        coalesce(expr("1000000 div first_hit"), lit(0L)).as("mrr_ppm"),
        coalesce(expr("dcg * 1000000 div 2130930"), lit(0L)).as("ndcg_ppm"))
      .orderBy("q_id")
  }

  /** MARGIN-BASED BITEXT MINING (Artetxe & Schwenk, ACL'19 — the CCMatrix /
    * LASER alignment criterion): score candidate pairs across two corpus
    * sides not by raw cosine but by the RATIO margin
    * `2·cos(x,y) / (meanK(x) + meanK(y))` — cosine normalized by both
    * endpoints' k-NN neighborhood density, which suppresses hubs (vectors
    * cosine-close to everything) that raw-threshold mining mis-pairs. Sides
    * here are the even/odd `vec_id` halves of `embeddings` (stand-ins for
    * two languages' sentence encodings); emitted: each query's best-margin
    * match above 1.05.
    *
    * Arithmetic is integer-pure past the one rounding point: cosines
    * round to micro units (the x06 canonicalization), neighborhood sums
    * add 4 bigints exactly, and the margin is one guarded integer division
    * to ppm — so both engines agree bit-for-bit with no float-order terms
    * (a grouped double mean would reintroduce them). Denominators are
    * required positive BEFORE dividing: Spark `div` truncates toward zero
    * while DuckDB `//` floors, and they only agree on positives.
    *
    * Scale shape: queries broadcast against the far side (the x06 brute
    * pattern — the ANN packs x07/x22/x94/x97 are the indexed path to the
    * same candidates); the reverse-direction neighborhoods are computed
    * only for the ≤ q·k DISTINCT candidate matches, each scored against
    * side A in one more broadcast pass — everything stays linear in corpus
    * size for a bounded query batch, quadratic in nothing.
    */
  val bitextMargin: Q = {
    val K = 4
    Q(
      "x109_bitext_margin",
      s"""WITH n AS ($normedSql),
         |a AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 2 = 0),
         |b AS (SELECT vec_id, v, nrm FROM n WHERE vec_id % 2 = 1),
         |q AS (SELECT vec_id, v, nrm FROM a WHERE vec_id % 50 = 0 AND vec_id < 20000),
         |fc AS (
         |  SELECT q.vec_id AS q_id, b.vec_id AS b_id,
         |         CAST(round(list_dot_product(q.v, b.v) / (q.nrm * b.nrm) * 1000000, 0) AS BIGINT) AS c,
         |         row_number() OVER (PARTITION BY q.vec_id
         |           ORDER BY CAST(round(list_dot_product(q.v, b.v) / (q.nrm * b.nrm) * 1000000, 0) AS BIGINT) DESC,
         |                    b.vec_id) AS rk
         |  FROM q CROSS JOIN b),
         |top AS (SELECT q_id, b_id, c FROM fc WHERE rk <= $K),
         |ma AS (SELECT q_id, sum(c) AS s_a FROM top GROUP BY q_id),
         |cand AS (SELECT DISTINCT b_id FROM top),
         |rc AS (
         |  SELECT y.vec_id AS b_id, a.vec_id AS a_id,
         |         CAST(round(list_dot_product(y.v, a.v) / (y.nrm * a.nrm) * 1000000, 0) AS BIGINT) AS c,
         |         row_number() OVER (PARTITION BY y.vec_id
         |           ORDER BY CAST(round(list_dot_product(y.v, a.v) / (y.nrm * a.nrm) * 1000000, 0) AS BIGINT) DESC,
         |                    a.vec_id) AS rk
         |  FROM (SELECT b.* FROM b JOIN cand ON b.vec_id = cand.b_id) y CROSS JOIN a),
         |mb AS (SELECT b_id, sum(c) AS s_b FROM rc WHERE rk <= $K GROUP BY b_id),
         |sc AS (
         |  SELECT t.q_id, t.b_id, t.c,
         |         8 * t.c * 1000000 // (ma.s_a + mb.s_b) AS margin_ppm
         |  FROM top t JOIN ma ON t.q_id = ma.q_id JOIN mb ON t.b_id = mb.b_id
         |  WHERE ma.s_a + mb.s_b > 0),
         |best AS (
         |  SELECT q_id, b_id AS m_id, c AS cos_micro, margin_ppm,
         |         row_number() OVER (PARTITION BY q_id
         |           ORDER BY margin_ppm DESC, b_id) AS rk
         |  FROM sc)
         |SELECT q_id, m_id, CAST(cos_micro AS BIGINT) AS cos_micro,
         |       CAST(margin_ppm AS BIGINT) AS margin_ppm
         |FROM best WHERE rk = 1 AND margin_ppm >= 1050000
         |ORDER BY q_id""".stripMargin
    ) { (s, dir) =>
      val n = normed(s, dir)
      val a = n.where(col("vec_id") % 2 === 0)
      val b = n.where(col("vec_id") % 2 === 1)
      val q = a.where(col("vec_id") % 50 === 0 && col("vec_id") < 20000)
        .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("nrm").as("qn"))
      val cMicro = (x: Column, xn: Column, y: Column, yn: Column) =>
        round(graft.functions.GraftFunctions.dotF32(x, y) / (xn * yn) * 1000000, 0).cast("long")
      // Round 15 (guide §2.3 — the x69 rewrite generalized): both k-NN
      // neighborhoods ran a row_number window over the full
      // broadcast-join pair stream (|corpus/2|·|queries| rows exchanged
      // and sorted by q_id). The micro-cosine keys are already exact
      // longs, so the bounded TopKPairAgg selection applies directly —
      // ≤ K (c DESC, id ASC) pairs per group per map task, winner arrays
      // on the exchange, pair rows dying inside the join stage. Lossless:
      // (c DESC, id ASC) is a total order (ids unique per group), so the
      // per-task top-K union contains the global top-K and the ordered
      // merge reproduces row_number's cut exactly; c is never null (both
      // sides come from the zero-norm-filtered normed frame).
      val topkK = udaf(new graft.functions.TopKPairAgg(K),
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong))
      val top = b.join(broadcast(q), lit(true))
        .select(col("q_id"), col("vec_id").as("b_id"),
          cMicro(col("qv"), col("qn"), col("embedding"), col("nrm")).as("c"))
        .groupBy("q_id")
        .agg(topkK(col("c"), col("b_id")).as("picked"))
        .select(col("q_id"), explode(col("picked")).as("pair"))
        .select(col("q_id"), col("pair._2").as("b_id"), col("pair._1").as("c"))
      val ma = top.groupBy("q_id").agg(sum(col("c")).as("s_a"))
      val cand = top.select("b_id").distinct()
      val y = b.join(broadcast(cand), col("vec_id") === cand("b_id"))
        .select(col("vec_id").as("y_id"), col("embedding").as("yv"), col("nrm").as("yn"))
      // reverse neighborhoods: only the top-K SUM is consumed, so the
      // winner array folds row-local (≤ K elements) — no explode needed
      val mb = a.join(broadcast(y), lit(true))
        .select(col("y_id"), col("vec_id").as("a_id"),
          cMicro(col("yv"), col("yn"), col("embedding"), col("nrm")).as("c"))
        .groupBy(col("y_id").as("b_id2"))
        .agg(topkK(col("c"), col("a_id")).as("picked"))
        .select(col("b_id2"),
          aggregate(col("picked"), lit(0L), (acc, p) => acc + p.getField("_1")).as("s_b"))
      val sc = top
        .join(ma, "q_id")
        .join(mb, col("b_id") === col("b_id2"))
        .where(col("s_a") + col("s_b") > 0)
        .select(col("q_id"), col("b_id"), col("c"),
          expr("8 * c * 1000000 div (s_a + s_b)").as("margin_ppm"))
      sc.withColumn("rk", row_number().over(
          Window.partitionBy("q_id").orderBy(col("margin_ppm").desc, col("b_id"))))
        .where(col("rk") === 1 && col("margin_ppm") >= 1050000)
        .select(col("q_id"), col("b_id").as("m_id"), col("c").as("cos_micro"), col("margin_ppm"))
        .orderBy("q_id")
    }
  }

  /** Per-dimension embedding moments — the feature-space health audit every
    * vector pipeline runs before trusting ANN/whitening/quantization over a
    * new corpus drop (mean shift ⇒ drift; variance collapse ⇒ dead dims;
    * extreme min/max ⇒ encoder overflow). Components are integerized to
    * exact micro-units (the x50 pattern: floor(v·1e6 + 0.5) on the widened
    * double is deterministic on both engines), so the sums are ORDER-FREE
    * int64 arithmetic — partitioning-independent, no float seam — and the
    * derived mean/variance divide exact sums as a final scalar step, scaled
    * BACK to original units before the 6-dp round: at μ² magnitudes (~1e10)
    * six decimals exceed double precision and the round is engine-divergent
    * by an ulp (measured), while at O(1) it is exact.
    *
    * Scale shape: one posexplode (row-local, 64× fan-out of 12-byte rows)
    * into one 64-group hash aggregate with map-side partial combine — the
    * exchange carries 64 rows per partition regardless of corpus size. The
    * mu² sum is widened to decimal(38,0) BEFORE aggregation: at 100 TB
    * (10¹² vectors/dim) an int64 sum of ~10¹³-sized squares would overflow.
    */
  val embeddingMoments: Q = Q(
    "x128_embedding_moments",
    """WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings),
      |x AS (SELECT i AS dim, CAST(floor(v[i] * 1000000 + 0.5) AS BIGINT) AS mu
      |      FROM e, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) s)
      |SELECT CAST(dim AS BIGINT) AS dim, count(*) AS n,
      |       min(mu) AS min_mu, max(mu) AS max_mu,
      |       round(CAST(sum(mu) AS DOUBLE) / count(*) / 1000000.0, 6) AS mean,
      |       round((CAST(sum(mu * mu) AS DOUBLE)
      |              - CAST(sum(mu) AS DOUBLE) * CAST(sum(mu) AS DOUBLE) / count(*))
      |             / (count(*) - 1) / 1000000000000.0, 6) AS var
      |FROM x GROUP BY dim ORDER BY dim""".stripMargin
  ) { (s, dir) =>
    embs(s, dir)
      .select(posexplode(col("embedding")).as(Seq("p", "comp")))
      .select((col("p") + 1).cast("long").as("dim"),
        floor(col("comp").cast("double") * 1000000 + 0.5).cast("long").as("mu"))
      .groupBy("dim")
      .agg(
        count(lit(1)).as("n"),
        min(col("mu")).as("min_mu"),
        max(col("mu")).as("max_mu"),
        sum(col("mu")).as("sum_mu"),
        sum(col("mu").cast("decimal(38,0)") * col("mu")).as("sum_mu2"))
      .select(col("dim"), col("n"), col("min_mu"), col("max_mu"),
        round(col("sum_mu").cast("double") / col("n") / 1000000.0, 6).as("mean"),
        round((col("sum_mu2").cast("double")
            - col("sum_mu").cast("double") * col("sum_mu").cast("double") / col("n"))
          / (col("n") - 1) / 1000000000000.0, 6).as("var"))
      .orderBy("dim")
  }

  /** Greedy k-center coreset (farthest-point traversal, Gonzalez 1985 — the
    * 2-approximation every diversity-aware data-selection pipeline uses as
    * its coverage baseline): seed at the max-norm vector, then 7 rounds of
    * "add the point farthest from every chosen center", then assign the
    * whole corpus to its nearest pick. Output: the 8 picks in selection
    * order with their selection criterion (norm² for the seed, min-distance²
    * at pick time after) and the size of each pick's Voronoi cell.
    *
    * Determinism across engines: squared L2 distances expand to sequential-
    * fold dot products (‖v‖² − 2⟨v,c⟩ + ‖c‖²) in double, rounded to 6 dp
    * BEFORE the argmax/argmin with a vec_id (then pick-index) tiebreak —
    * the exact discipline of the x06 family. Scale shape: each round is one
    * TakeOrdered(1) over a narrow (vec_id, v, mind) frame — k·(scan + dot)
    * work, candidates never pair off; the chosen centers travel as
    * LITERALS (k·d floats), so assignment is one broadcast-free map pass +
    * one 8-group aggregate. The only driver state is the 8 picked rows
    * (bounded collect, the PQ-codebook pattern).
    */
  val kcenterCoreset: Q = {
    val K = 8
    // one d-stage per pick: mind_i = least(mind_{i-1}, round(d²(v, c_i), 6));
    // the picked point leaves the frame (its mind is 0 — removing it keeps
    // every later stage's ORDER BY tiny and the semantics identical)
    val stages = (2 to K).map { i =>
      val prev = if (i == 2) "e" else s"d${i - 2}"
      val mind =
        s"round(d.nv - 2*list_dot_product(d.v, c.v) + list_dot_product(c.v, c.v), 6)"
      val acc = if (i == 2) mind else s"least(d.mind, $mind)"
      s"""d${i - 1} AS (SELECT d.vec_id, d.v, d.nv, $acc AS mind
         |  FROM $prev d, c${i - 1} c WHERE d.vec_id <> c.vec_id),
         |c$i AS (SELECT vec_id, v, mind AS crit FROM d${i - 1}
         |  ORDER BY mind DESC, vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    Q(
      "x129_kcenter_coreset",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS nv
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |c1 AS (SELECT vec_id, v, round(nv, 6) AS crit FROM e
         |  ORDER BY round(nv, 6) DESC, vec_id LIMIT 1),
         |$stages,
         |cents AS (${(1 to K).map(i => s"SELECT $i AS pick, vec_id, v, crit FROM c$i")
                      .mkString(" UNION ALL ")}),
         |assign AS (SELECT e.vec_id, c.pick,
         |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
         |      round(e.nv - 2*list_dot_product(e.v, c.v) + list_dot_product(c.v, c.v), 6), c.pick) AS rk
         |  FROM e CROSS JOIN cents c)
         |SELECT CAST(c.pick AS BIGINT) AS pick, c.vec_id, round(c.crit, 6) AS crit,
         |       count(*) AS n_assigned
         |FROM assign a JOIN cents c ON a.pick = c.pick AND a.rk = 1
         |GROUP BY c.pick, c.vec_id, c.crit ORDER BY pick""".stripMargin
    ) { (s, dir) => kcenterBuild(s, dir, new StageClock) }
  }

  /** Wall-clock recorder for driver-side iterative builders (r8 verdict
    * item 7: the next scale casualty should name its STAGE without a
    * bisection). The production query path pays only the nanoTime calls.
    */
  private[graft] final class StageClock {
    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def apply[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      times(name) = times.getOrElse(name, 0.0) + (System.nanoTime() - t0) / 1e9
      r
    }
  }

  /** x129's builder, shared by the Q lambda and DedupDiag so the diag's
    * stage attribution can never drift from the shipped plan. The clock
    * splits the two driver-side sequential costs — the seed argmax and
    * the K−1 greedy argmax corpus passes (inherent to Gonzalez traversal)
    * — from the final distributed assignment aggregate, which executes
    * when the returned frame is consumed.
    */
  private[graft] def kcenterBuild(s: SparkSession, dir: String,
      clock: StageClock): DataFrame = {
    val K = 8
    val e = embs(s, dir).where(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding"),
        dot(col("embedding"), col("embedding")).as("nv"))
    def d2(cv: Seq[Float]): Column = {
      val c = typedLit(cv)
      round(col("nv") - lit(2) * dot(col("embedding"), c) + dot(c, c), 6)
    }
    // seed pick: max ‖v‖², vec_id tiebreak — a bounded TakeOrdered(1)
    var picks = List.empty[(Int, Long, Double, Seq[Float])] // reversed
    val first = clock("seed_argmax") {
      e.select(col("vec_id"), col("embedding"), round(col("nv"), 6).as("crit"))
        .orderBy(col("crit").desc, col("vec_id")).limit(1).collect()(0)
    }
    picks ::= ((1, first.getLong(0), first.getDouble(2), first.getSeq[Float](1)))
    var cur = e.where(col("vec_id") =!= first.getLong(0))
      .withColumn("mind", d2(picks.head._4))
    for (i <- 2 to K) {
      val r = clock("round_argmax") {
        cur.orderBy(col("mind").desc, col("vec_id")).limit(1).collect()(0)
      }
      val id = r.getLong(r.fieldIndex("vec_id"))
      picks ::= ((i, id, r.getDouble(r.fieldIndex("mind")),
        r.getSeq[Float](r.fieldIndex("embedding"))))
      if (i < K)
        cur = cur.where(col("vec_id") =!= id)
          .withColumn("mind", least(col("mind"), d2(picks.head._4)))
    }
    val cents = picks.reverse
    // nearest-pick assignment: min (rounded d², pick) via struct ordering —
    // equivalent to the oracle's row_number rk=1 under the same total order
    val best = array_min(array(cents.map { case (p, _, _, cv) =>
      struct(d2(cv).as("d"), lit(p).as("p"))
    }: _*))
    val cells = e.select(best.getField("p").as("pick"))
      .groupBy("pick").agg(count(lit(1)).as("n_assigned"))
    val pickDf = s.createDataFrame(cents.map { case (p, id, crit, _) => (p, id, crit) })
      .toDF("pick", "vec_id", "crit")
    pickDf.join(cells, "pick")
      .select(col("pick").cast("long").as("pick"), col("vec_id"),
        round(col("crit"), 6).as("crit"), col("n_assigned"))
      .orderBy("pick")
  }

  /** Johnson–Lindenstrauss distortion audit: project 64-dim embeddings to
    * 16 dims through a deterministic ±1 sign matrix (Achlioptas 2003's
    * database-friendly JL variant, scale 1/√16) and measure, over the fixed
    * query batch × corpus pair set, how the projected squared L2 distance
    * distorts the true one — the measurement that licenses running ANN
    * candidate generation in a 4× cheaper space. Output is the distortion
    * histogram: pairs bucketed by ratio_ppm div 100000 (0.1-wide ratio
    * buckets; JL says mass concentrates around 1.0).
    *
    * Determinism: the sign matrix is generated from md5("jl:r:c") and
    * INLINED as literals into both engines; projections are 16 sequential-
    * fold dot products against those literals; both distances expand to
    * the same IEEE chain (‖·‖² terms + fold dots, same association order,
    * built from one Scala loop), and the ratio integerizes via
    * floor(r·1e6 + 0.5) before bucketing — zero float comparisons.
    *
    * Scale shape (r9, the r8 verdict's item 6 — the sample-side contract
    * made explicit): projections are row-local (16 dots per vector); the
    * comparison side is a DETERMINISTIC HASH SAMPLE — the ≤4000 corpus
    * vectors with the smallest (md5(vec_id), vec_id) — selected by a
    * bounded TakeOrdered, so the pair loop is a fixed ≤400-query batch ×
    * ≤4000-sample broadcast join: ≤1.6M pairs at ANY corpus size, where
    * the previous full-corpus loop was 400 × corpus (~49 s of the sf10
    * suite, linear forever). A distortion audit is a statistical estimate
    * by nature; 4000 hash-picked vectors bound its confidence interval
    * identically at every scale, and at the driver's correctness scales
    * (≤4000 vectors) the sample IS the full corpus, so the oracle still
    * audits every pair there. The histogram stays a ≤dozens-group
    * aggregate.
    */
  val jlDistortion: Q = {
    val rows = 16
    // Achlioptas ±1 signs from md5 — regenerated identically on both sides
    def sign(r: Int, c: Int): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"jl:$r:$c".getBytes("UTF-8"))
      if ((h(0) & 0x80) == 0) 1 else -1
    }
    val s16: Seq[Seq[Float]] =
      (0 until rows).map(r => (0 until 64).map(c => sign(r, c).toFloat))
    val sqlProj = (0 until rows).map { r =>
      val arr = s16(r).map(v => if (v > 0) "1" else "-1").mkString(", ")
      s"list_dot_product(v, [$arr]::DOUBLE[]) / 4.0"
    }
    Q(
      "x132_jl_distortion",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
         |  list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS nv
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |p AS (SELECT vec_id, v, nv, ${(0 until rows).map(r => s"${sqlProj(r)} AS p$r")
                  .mkString(", ")} FROM e),
         |q AS (SELECT * FROM p WHERE vec_id % 50 = 0 AND vec_id < 20000),
         |samp AS (SELECT * FROM p ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 4000),
         |pairs AS (
         |  SELECT CAST(floor((${(0 until rows).map(r => s"(q.p$r - c.p$r) * (q.p$r - c.p$r)")
                    .mkString(" + ")})
         |         * 1000000.0 / (q.nv - 2*list_dot_product(q.v, c.v) + c.nv) + 0.5) AS BIGINT) AS ratio_ppm
         |  FROM q, samp c
         |  WHERE q.vec_id <> c.vec_id
         |    AND q.nv - 2*list_dot_product(q.v, c.v) + c.nv > 0)
         |SELECT ratio_ppm // 100000 AS bucket, count(*) AS n,
         |       min(ratio_ppm) AS min_ppm, max(ratio_ppm) AS max_ppm
         |FROM pairs GROUP BY 1 ORDER BY bucket""".stripMargin
    ) { (s, dir) =>
      val e = embs(s, dir).where(col("embedding").isNotNull)
        .select(col("vec_id"), col("embedding"),
          dot(col("embedding"), col("embedding")).as("nv"))
      def proj(df: DataFrame): DataFrame =
        df.select(Seq(col("vec_id"), col("embedding"), col("nv")) ++
          (0 until rows).map(r =>
            (dot(col("embedding"), typedLit(s16(r))) / 4.0).as(s"p$r")): _*)
      // project AFTER the batch filter / sample selection: the 16 dots run
      // over ≤400 + ≤4000 rows, not the corpus — the corpus pays only the
      // narrow (vec_id, embedding) scan feeding the TakeOrdered coin
      val q = proj(e.where(col("vec_id") % 50 === 0 && col("vec_id") < 20000))
        .select(Seq(col("vec_id").as("q_id"), col("embedding").as("qv"), col("nv").as("qnv")) ++
          (0 until rows).map(r => col(s"p$r").as(s"q$r")): _*)
      // comparison side: bounded hash sample (TakeOrderedAndProject — never
      // a global sort), spread back out so the pair loop is not serialized
      // by the limit's single output partition (the x05/x06 policy)
      val samp = proj(Tables.computeParallel(
        e.orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(4000)))
      val projD2 = (0 until rows)
        .map(r => (col(s"q$r") - col(s"p$r")) * (col(s"q$r") - col(s"p$r")))
        .reduce(_ + _)
      val fullD2 = col("qnv") - lit(2) * dot(col("qv"), col("embedding")) + col("nv")
      broadcast(q).join(samp, col("q_id") =!= col("vec_id"))
        .where(fullD2 > 0)
        .select(floor(projD2 * 1000000.0 / fullD2 + 0.5).cast("long").as("ratio_ppm"))
        .groupBy(expr("ratio_ppm div 100000").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("ratio_ppm")).as("min_ppm"),
          max(col("ratio_ppm")).as("max_ppm"))
        .orderBy("bucket")
    }
  }

  /** Per-dimension ROBUST feature statistics — exact median/IQR of every
    * embedding dimension (the RobustScaler fit next to x128's mean/var
    * moments: quantile whitening is what you use when a corpus drop has
    * heavy-tailed or clipped dimensions that make variance lie). Values
    * integerize to micro units (floor(v·1e6 + 0.5), the x87 contract)
    * before any aggregation, so the quantile machinery runs on exact
    * int64 keys.
    *
    * Scale shape: rides [[RelOps.exactQuantiles]] — the t21/t29 spillable
    * histogram-quantile plan (one Tungsten hash aggregate on (dim, micro)
    * whose key space is bounded by 64 × the value domain, never the
    * corpus; domain-sized cumulative window; order-statistic lookup) —
    * NOT the built-in `percentile`, whose non-spillable per-group
    * OpenHashMap buffer is exactly what the r8 2 GB proof OOMed on.
    * Interpolation exactness: the quantile positions 0.25/0.5/0.75 of
    * (n−1) are dyadic and the cell values are integers ≤ 2²¹, so the
    * interpolated doubles are EXACT (no ulp seam) — Spark's
    * lo·(hi−pos)+hi·(pos−lo) and DuckDB's quantile_cont lerp produce the
    * same bit pattern, and the 6-dp round is decoration.
    */
  val dimQuantiles: Q = Q(
    "x135_dim_quantiles",
    """WITH x AS (SELECT d.i - 1 AS dim,
      |    CAST(floor(CAST(e.embedding[d.i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS micro
      |  FROM embeddings e, LATERAL (SELECT unnest(generate_series(1, len(e.embedding))) AS i) d)
      |SELECT CAST(dim AS BIGINT) AS dim,
      |       round(quantile_cont(micro, 0.25), 6) AS p25,
      |       round(quantile_cont(micro, 0.5), 6) AS med,
      |       round(quantile_cont(micro, 0.75), 6) AS p75,
      |       round(quantile_cont(micro, 0.75) - quantile_cont(micro, 0.25), 6) AS iqr
      |FROM x GROUP BY dim ORDER BY dim""".stripMargin
  ) { (s, dir) =>
    val x = embs(s, dir)
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim").cast("long").as("dim"),
        floor(col("v").cast("double") * 1000000 + 0.5).cast("long").as("micro"))
    RelOps.exactQuantiles(x, "dim", "micro",
        Seq("p25" -> 0.25, "med" -> 0.5, "p75" -> 0.75))
      .select(col("dim"),
        round(col("p25"), 6).as("p25"),
        round(col("med"), 6).as("med"),
        round(col("p75"), 6).as("p75"),
        round(col("p75") - col("p25"), 6).as("iqr"))
      .orderBy("dim")
  }

  /** Broken-embedding detector — Tukey-fence outlier profile per VECTOR:
    * count each vector's dimensions falling outside the corpus's
    * per-dimension [p25 − 1.5·IQR, p75 + 1.5·IQR] whiskers (x135's robust
    * fit, applied), and report the corpus as a histogram over that count.
    * A healthy embedding drop concentrates at n_out ∈ {0, 1}; a tail at
    * high n_out is the signature of NaN-adjacent encoder output, wrong
    * normalization, or a corrupted shard — the audit run before x57/x94
    * trust the vectors. The fit-then-transform shape is deliberate: the
    * quantile pass is the t21 spillable histogram plan (x135), the fence
    * table is 64 rows BROADCAST back, the probe is row-local, and the
    * result is a ≤65-row histogram — two linear passes, no window over
    * data rows, no join wider than the 64-row dim table.
    *
    * Exactness: fences are dyadic-exact doubles (x135's argument: dyadic
    * quantile positions over integer micro cells; 1.5·IQR and the ± stay
    * exact well under 2⁵³), micro values are exact ints — so the outside-
    * fence comparison is deterministic on both engines, no epsilon.
    */
  val embeddingOutliers: Q = Q(
    "x140_embedding_outliers",
    """WITH x AS (SELECT e.vec_id, d.i - 1 AS dim,
      |    CAST(floor(CAST(e.embedding[d.i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS micro
      |  FROM embeddings e, LATERAL (SELECT unnest(generate_series(1, len(e.embedding))) AS i) d),
      |q AS (SELECT dim, quantile_cont(micro, 0.25) AS p25, quantile_cont(micro, 0.75) AS p75
      |      FROM x GROUP BY dim),
      |f AS (SELECT x.vec_id,
      |        sum(CASE WHEN x.micro < q.p25 - 1.5 * (q.p75 - q.p25)
      |                   OR x.micro > q.p75 + 1.5 * (q.p75 - q.p25)
      |                 THEN 1 ELSE 0 END) AS n_out
      |      FROM x JOIN q ON x.dim = q.dim GROUP BY x.vec_id)
      |SELECT CAST(n_out AS BIGINT) AS n_out, CAST(count(*) AS BIGINT) AS n_vecs,
      |       CAST(min(vec_id) AS BIGINT) AS sample_vec
      |FROM f GROUP BY n_out ORDER BY n_out""".stripMargin
  ) { (s, dir) =>
    val x = embs(s, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        floor(col("v").cast("double") * 1000000 + 0.5).cast("long").as("micro"))
    val q = RelOps.exactQuantiles(x, "dim", "micro", Seq("p25" -> 0.25, "p75" -> 0.75))
    val lo = col("p25") - lit(1.5) * (col("p75") - col("p25"))
    val hi = col("p75") + lit(1.5) * (col("p75") - col("p25"))
    x.join(broadcast(q), "dim")
      .groupBy("vec_id")
      .agg(sum(when(col("micro") < lo || col("micro") > hi, 1).otherwise(0)).as("n_out"))
      .groupBy("n_out")
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("sample_vec"))
      .orderBy("n_out")
  }

  /** Per-label embedding dispersion — the EXACT mean pairwise squared L2
    * distance inside every label cluster, computed WITHOUT enumerating a
    * single pair via the moments identity
    * Σ_{i<j}‖xᵢ−xⱼ‖² = n·Σ‖xᵢ‖² − ‖Σxᵢ‖².
    * This is the cluster-tightness/diversity audit behind semantic-dedup
    * tuning (a label whose dispersion collapses is a near-duplicate
    * cluster x57 should be pruning; one whose dispersion matches the
    * corpus is not a cluster at all) — and the identity is the whole
    * point at scale: the naive formulation is an O(n²) self-join per
    * label, this is TWO map-side-combined aggregates whose exchanges
    * carry |labels| and |labels|×64 rows at ANY corpus size.
    *
    * Exactness: components integerize to micro units (x87), Σppm² and
    * the squared per-dim sums ride decimal(38,0)/HUGEINT (a billion-
    * vector label squares past int64 — the x85 overflow class); floats
    * enter only in the final scalar chain, written in the identical
    * association order on both engines. n < 2 labels report −1 (no
    * pairs).
    */
  val labelDispersion: Q = Q(
    "x138_label_dispersion",
    """WITH e AS (SELECT label, i, CAST(floor((embedding::DOUBLE[])[i] * 1000000 + 0.5) AS BIGINT) AS ppm
      |           FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) idx),
      |s2 AS (SELECT label, sum(CAST(ppm AS HUGEINT) * ppm) AS s2 FROM e GROUP BY label),
      |ds AS (SELECT label, i, sum(ppm) AS sd FROM e GROUP BY label, i),
      |s1 AS (SELECT label, sum(CAST(sd AS HUGEINT) * sd) AS s1sq FROM ds GROUP BY label),
      |n AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label)
      |SELECT CAST(n.label AS BIGINT) AS label, CAST(n.n AS BIGINT) AS n,
      |       round(CASE WHEN n.n < 2 THEN -1.0
      |         ELSE 2.0 * (CAST(n.n AS DOUBLE) * CAST(s2.s2 AS DOUBLE) - CAST(s1.s1sq AS DOUBLE))
      |              / (CAST(n.n AS DOUBLE) * CAST(n.n - 1 AS DOUBLE)) / 1000000000000.0 END, 6)
      |         AS mean_pair_d2
      |FROM n JOIN s2 ON n.label = s2.label JOIN s1 ON n.label = s1.label
      |ORDER BY label""".stripMargin
  ) { (s, dir) =>
    val e = embs(s, dir).select(
      col("label"), posexplode(col("embedding")).as(Seq("p", "comp")))
      .select(col("label"), (col("p") + 1).as("i"),
        floor(col("comp").cast("double") * 1000000 + 0.5).cast("long").as("ppm"))
    val s2 = e.groupBy("label")
      .agg(sum(col("ppm").cast("decimal(38,0)") * col("ppm")).as("s2"))
    val s1 = e.groupBy("label", "i").agg(sum(col("ppm")).as("sd"))
      .groupBy("label")
      .agg(sum(col("sd").cast("decimal(38,0)") * col("sd")).as("s1sq"))
    val n = embs(s, dir).groupBy("label").agg(count(lit(1)).as("n"))
    n.join(s2, "label").join(s1, "label")
      .select(col("label").cast("long").as("label"), col("n"),
        round(when(col("n") < 2, -1.0).otherwise(
          lit(2.0) * (col("n").cast("double") * col("s2").cast("double")
              - col("s1sq").cast("double"))
            / (col("n").cast("double") * (col("n") - 1).cast("double"))
            / lit(1000000000000.0)), 6).as("mean_pair_d2"))
      .orderBy("label")
  }

  /** Nearest-centroid classifier eval: assign every vector to its nearest
    * per-label MEAN centroid (Rocchio classification) and score the
    * assignment against the true labels — per-class confusion counts,
    * precision/recall/F1, global accuracy, and Cohen's κ (Cohen 1960:
    * (p_o − p_e)/(1 − p_e) with p_e from the confusion marginals). This is
    * the label-quality audit a training pipeline runs on embedding+label
    * corpora: κ near 0 means the labels carry no geometric signal.
    *
    * Cross-engine exactness: centroid components are integerized ppm means
    * — floor(Σppm/n + 0.5) where the division is ONE correctly-rounded
    * IEEE op in the same order on both engines (the x34 discipline) — and
    * the classifier metric is the exact INTEGER squared distance
    * Σ(ppm−c_ppm)², so argmin (label tiebreak) is bit-identical. The only
    * doubles in the output are κ's fixed-order ratio.
    *
    * Scale shape: centroids come from ONE (label, dim) aggregate
    * (|labels|×64 rows, broadcast back); assignment is the x22/x57
    * crossJoin-against-broadcast + min_by partial aggregate — the corpus
    * never shuffles on a similarity key and the exchange carries one row
    * per vector; everything downstream of the confusion aggregate is
    * |labels|-sized.
    */
  val centroidConfusion: Q = Q(
    "x144_centroid_confusion",
    """WITH idx AS (SELECT unnest(generate_series(1, 64)) AS i),
      |e AS (SELECT vec_id, label, i,
      |        CAST(floor((embedding::DOUBLE[])[i] * 1000000 + 0.5) AS BIGINT) AS ppm
      |      FROM embeddings, idx
      |      WHERE embedding IS NOT NULL AND label IS NOT NULL),
      |cent AS (SELECT label AS c_label, i,
      |           CAST(floor(CAST(sum(ppm) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS c_ppm
      |         FROM e GROUP BY label, i),
      |d AS (SELECT e.vec_id, e.label, c.c_label,
      |        sum((e.ppm - c.c_ppm) * (e.ppm - c.c_ppm)) AS d2
      |      FROM e JOIN cent c ON e.i = c.i
      |      GROUP BY e.vec_id, e.label, c.c_label),
      |pr AS (SELECT vec_id, label, c_label AS pred FROM (
      |        SELECT vec_id, label, c_label,
      |               row_number() OVER (PARTITION BY vec_id ORDER BY d2, c_label) AS rk
      |        FROM d) WHERE rk = 1),
      |conf AS (SELECT label, pred, count(*) AS n FROM pr GROUP BY label, pred),
      |cls AS (SELECT DISTINCT label FROM embeddings
      |        WHERE embedding IS NOT NULL AND label IS NOT NULL),
      |pc AS (SELECT cls.label AS label,
      |         CAST(COALESCE(t.n_true, 0) AS BIGINT) AS n_true,
      |         CAST(COALESCE(p.n_pred, 0) AS BIGINT) AS n_pred,
      |         CAST(COALESCE(dg.tp, 0) AS BIGINT) AS tp
      |       FROM cls
      |       LEFT JOIN (SELECT label, sum(n) AS n_true FROM conf GROUP BY label) t
      |         ON t.label = cls.label
      |       LEFT JOIN (SELECT pred, sum(n) AS n_pred FROM conf GROUP BY pred) p
      |         ON p.pred = cls.label
      |       LEFT JOIN (SELECT label, n AS tp FROM conf WHERE label = pred) dg
      |         ON dg.label = cls.label),
      |met AS (SELECT label, n_true, n_pred, tp,
      |          CAST(CASE WHEN n_pred = 0 THEN -1
      |               ELSE CAST(tp AS HUGEINT) * 1000000 // n_pred END AS BIGINT) AS precision_ppm,
      |          CAST(CASE WHEN n_true = 0 THEN -1
      |               ELSE CAST(tp AS HUGEINT) * 1000000 // n_true END AS BIGINT) AS recall_ppm
      |        FROM pc),
      |tot AS (SELECT sum(n_true) AS n_total, sum(tp) AS diag,
      |               sum(CAST(n_true AS HUGEINT) * n_pred) AS pe_num FROM pc)
      |SELECT CAST(met.label AS BIGINT) AS label, n_true, n_pred, tp,
      |       precision_ppm, recall_ppm,
      |       CAST(CASE WHEN precision_ppm > 0 AND recall_ppm > 0
      |            THEN 2 * precision_ppm * recall_ppm // (precision_ppm + recall_ppm)
      |            ELSE 0 END AS BIGINT) AS f1_ppm,
      |       CAST(CAST(diag AS HUGEINT) * 1000000 // n_total AS BIGINT) AS acc_ppm,
      |       round((CAST(diag AS DOUBLE) / n_total
      |              - CAST(pe_num AS DOUBLE) / n_total / n_total)
      |             / (1.0 - CAST(pe_num AS DOUBLE) / n_total / n_total), 6) AS kappa
      |FROM met, tot ORDER BY label""".stripMargin
  ) { (s, dir) =>
    val ppmArr = transform(col("embedding"), v =>
      floor(v.cast("double") * 1000000 + 0.5).cast("long"))
    // eval contract (hostile sweep): only labeled vectors with a present
    // embedding participate — train, assignment, and the class roster all
    // read the same filtered universe on both engines
    val evalSet = embs(s, dir)
      .where(col("embedding").isNotNull && col("label").isNotNull)
    // |labels|×64 centroid aggregate → per-label ordered component arrays
    val cent = evalSet
      .select(col("label"), posexplode(col("embedding")).as(Seq("p", "v")))
      .groupBy(col("label").as("c_label"), (col("p") + 1).as("i"))
      .agg(sum(floor(col("v").cast("double") * 1000000 + 0.5).cast("long")).as("sd"),
        count(lit(1)).as("cnt"))
      .select(col("c_label"), col("i"),
        floor(col("sd").cast("double") / col("cnt") + 0.5).cast("long").as("c_ppm"))
      .groupBy("c_label")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("c_ppm")))),
        x => x.getField("c_ppm")).as("cv"))
    // assignment: broadcast centroids, row-local exact integer d², min_by
    val pr = evalSet.select(col("vec_id"), col("label"), ppmArr.as("pv"))
      .crossJoin(broadcast(cent))
      .withColumn("d2", aggregate(
        zip_with(col("pv"), col("cv"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x))
      .groupBy("vec_id")
      .agg(first(col("label")).as("label"),
        min_by(col("c_label"), struct(col("d2"), col("c_label"))).as("pred"))
    val conf = pr.groupBy("label", "pred").agg(count(lit(1)).as("n"))
    val pc = evalSet.select(col("label")).distinct()
      .join(conf.groupBy("label").agg(sum("n").as("nt")), Seq("label"), "left")
      .join(conf.groupBy(col("pred").as("label")).agg(sum("n").as("np")), Seq("label"), "left")
      .join(conf.where(col("label") === col("pred")).select(col("label"), col("n").as("tpn")),
        Seq("label"), "left")
      .select(col("label"), coalesce(col("nt"), lit(0L)).as("n_true"),
        coalesce(col("np"), lit(0L)).as("n_pred"), coalesce(col("tpn"), lit(0L)).as("tp"))
    val tot = pc.agg(sum("n_true").as("n_total"), sum("tp").as("diag"),
      sum(col("n_true").cast("decimal(38,0)") * col("n_pred")).as("pe_num"))
    // one tot join only (r10 verdict cleanup): the per-label columns need
    // nothing corpus-wide until acc/kappa, so tot broadcasts in once below
    pc.select(col("label").cast("long").as("label"), col("n_true"), col("n_pred"), col("tp"),
        expr("""CASE WHEN n_pred = 0 THEN cast(-1 as bigint)
               |ELSE cast(cast(tp as decimal(38,0)) * 1000000 div n_pred as bigint) END"""
          .stripMargin).as("precision_ppm"),
        expr("""CASE WHEN n_true = 0 THEN cast(-1 as bigint)
               |ELSE cast(cast(tp as decimal(38,0)) * 1000000 div n_true as bigint) END"""
          .stripMargin).as("recall_ppm"))
      .withColumn("f1_ppm",
        expr("""CASE WHEN precision_ppm > 0 AND recall_ppm > 0
               |THEN (2 * precision_ppm * recall_ppm) div (precision_ppm + recall_ppm)
               |ELSE cast(0 as bigint) END""".stripMargin))
      .crossJoin(broadcast(tot))
      .withColumn("acc_ppm",
        expr("cast(cast(diag as decimal(38,0)) * 1000000 div n_total as bigint)"))
      .withColumn("kappa",
        round((col("diag").cast("double") / col("n_total")
            - col("pe_num").cast("double") / col("n_total") / col("n_total"))
          / (lit(1.0) - col("pe_num").cast("double") / col("n_total") / col("n_total")), 6))
      .select("label", "n_true", "n_pred", "tp", "precision_ppm", "recall_ppm",
        "f1_ppm", "acc_ppm", "kappa")
      .orderBy("label")
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009) of a
    * LEXICAL and a DENSE doc-to-doc retrieval leg — the standard hybrid
    * the RAG stack runs over a curated corpus: for each query doc
    * (id % 50 = 0, id < 20000 — x06's bounded query batch), leg 1 ranks
    * neighbors by distinct-token overlap (the inverted-index signal),
    * leg 2 by embedding cosine (x06's exact ranking), and the fusion
    * score is Σ 1/(60 + rank) over the legs where the candidate appears
    * (k = 60, the published constant). Top-5 fused per query, with each
    * leg's rank carried (−1 = absent from that leg's top-20).
    *
    * Cross-engine exactness: ranks are integers with deterministic
    * tiebreaks; 1/(60+r) is one correctly-rounded double op and the
    * two-term sum runs in fixed order — bit-identical, so the fused
    * rank cut needs no epsilon. Scale shape: the query batch broadcasts
    * into BOTH legs (the corpus never shuffles on a similarity key: the
    * token join is corpus-tokens ⨝ broadcast-query-tokens, the cosine
    * leg is x06's broadcast scan); per-leg and fused top-k windows
    * partition by q_id over candidate-scale rows only.
    *
    * STOP-TOKEN DF-CAP (round 14, the r13 verdict's one standing
    * scale-killer): the lexical leg admits a token into the overlap join
    * only when its document frequency is ≤ [[DedupOps.DfCap]] (= 1000, the
    * x04 shingle discipline — identical rule in the oracle). Without the
    * cap one hot token (stop words, boilerplate — the 100× skew fixture
    * plants a phrase in HALF the corpus) makes candidate mass per query
    * approach the whole corpus and lands one q_id's candidates in one
    * rank-window task: measured 18.3 → 110.2 s benign→skew at 100× with a
    * 24.6M-row widest task (bench_r13_full_skew10.json). A df-capped token
    * carries no retrieval signal anyway — IDF ≈ 0 is exactly the token a
    * BM25-style ranker downweights to nothing; dropping it is the lexical
    * analogue of x04's "near-ubiquitous shingles carry no near-dup
    * signal". Inert at the correctness SFs when no token crosses the cap
    * (sf0.001 has 500 docs — a token CANNOT exceed df 1000 there).
    */
  val rrfFusion: Q = Q(
    "x143_rrf_fusion",
    s"""WITH n AS ($normedSql),
       |q AS (SELECT vec_id AS q_id, v, nrm FROM n WHERE vec_id % 50 = 0 AND vec_id < 20000),
       |cosr AS (SELECT q_id, n_id, rc FROM (
       |  SELECT q.q_id, c.vec_id AS n_id,
       |         row_number() OVER (PARTITION BY q.q_id
       |           ORDER BY round(list_dot_product(q.v, c.v) / (q.nrm * c.nrm), 6) DESC, c.vec_id) AS rc
       |  FROM q JOIN n c ON c.vec_id <> q.q_id) WHERE rc <= 20),
       |tok0 AS (SELECT DISTINCT doc_id, w FROM (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)),
       |stop AS (SELECT w FROM tok0 GROUP BY w HAVING count(*) > ${DedupOps.DfCap}),
       |tok AS (SELECT doc_id, w FROM tok0 t
       |        WHERE NOT EXISTS (SELECT 1 FROM stop s WHERE s.w = t.w)),
       |qt AS (SELECT doc_id AS q_id, w FROM tok WHERE doc_id % 50 = 0 AND doc_id < 20000),
       |ov AS (SELECT qt.q_id, t.doc_id AS n_id, count(*) AS o
       |       FROM qt JOIN tok t ON qt.w = t.w AND t.doc_id <> qt.q_id
       |       GROUP BY qt.q_id, t.doc_id),
       |lexr AS (SELECT q_id, n_id, rl FROM (
       |  SELECT q_id, n_id,
       |         row_number() OVER (PARTITION BY q_id ORDER BY o DESC, n_id) AS rl
       |  FROM ov) WHERE rl <= 20),
       |f AS (SELECT COALESCE(c.q_id, l.q_id) AS q_id, COALESCE(c.n_id, l.n_id) AS n_id,
       |        COALESCE(1.0::DOUBLE / (60 + c.rc), 0.0) + COALESCE(1.0::DOUBLE / (60 + l.rl), 0.0) AS score,
       |        COALESCE(c.rc, -1) AS rc, COALESCE(l.rl, -1) AS rl
       |      FROM cosr c FULL OUTER JOIN lexr l ON c.q_id = l.q_id AND c.n_id = l.n_id)
       |SELECT q_id, rk, n_id, round(score, 6) AS rrf,
       |       CAST(rc AS BIGINT) AS rank_cos, CAST(rl AS BIGINT) AS rank_lex
       |FROM (SELECT q_id, n_id, score, rc, rl,
       |        row_number() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS rk
       |      FROM f)
       |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin
  ) { (s, dir) =>
    val n = normed(s, dir)
    val q = n.where(col("vec_id") % 50 === 0 && col("vec_id") < 20000)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"), col("nrm").as("qn"))
    val cos = round(dot(col("qv"), col("embedding")) / (col("qn") * col("nrm")), 6)
    // Round 15 (guide §2.3 — the x69/x109 rewrite): the per-leg top-20
    // windows shuffled the full broadcast-join pair stream by q_id.
    // Bounded TopKPairAgg selection instead; the cosine leg's key is the
    // EXACT micro integer of the declared 6-dp rounded cosine —
    // cos6 = nearestDouble(m/1e6) ⟹ round(cos6·1e6, 0) = m exactly and
    // m ↔ cos6 is strictly monotone, so (cm DESC, n_id) orders identically
    // to (cos DESC, n_id). Only the RANK flows downstream (rrf is a
    // function of rank alone), so the key conversion is invisible in the
    // output. Lossless per the total-order argument (n_id unique per q).
    val topk20 = udaf(new graft.functions.TopKPairAgg(20),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
    val cosr = n.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(cos * 1000000, 0).cast("long").as("cm"))
      .groupBy("q_id")
      .agg(topk20(col("cm"), col("n_id")).as("picked"))
      .select(col("q_id"), posexplode(col("picked")).as(Seq("pos", "pair")))
      .select(col("q_id"), col("pair._2").as("n_id"), (col("pos") + 1).as("rc"))
    val tok0 = Tables(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w")).distinct()
    // stop-token cut (df > DfCap — see scaladoc): the stop set is tiny by
    // construction (≤ total-token-mass/DfCap distinct tokens can cross the
    // cap), so it broadcasts into an anti-join; the two tok0 subtrees are
    // identical and share one exchange via reuse
    val stop = tok0.groupBy("w").agg(count(lit(1)).as("df"))
      .where(col("df") > DedupOps.DfCap).select("w")
    val tok = tok0.join(broadcast(stop), Seq("w"), "left_anti")
    val qt = tok.where(col("doc_id") % 50 === 0 && col("doc_id") < 20000)
      .select(col("doc_id").as("q_id"), col("w"))
    // lexical leg: same bounded selection over the (q, candidate) overlap
    // aggregate — the overlap counts are longs already
    val lexr = tok.join(broadcast(qt), tok("w") === qt("w") && col("doc_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("doc_id").as("n_id"))
      .agg(count(lit(1)).as("o"))
      .groupBy("q_id")
      .agg(topk20(col("o"), col("n_id")).as("picked"))
      .select(col("q_id"), posexplode(col("picked")).as(Seq("pos", "pair")))
      .select(col("q_id"), col("pair._2").as("n_id"), (col("pos") + 1).as("rl"))
    val score = coalesce(lit(1.0) / (lit(60) + col("rc")), lit(0.0)) +
      coalesce(lit(1.0) / (lit(60) + col("rl")), lit(0.0))
    val wf = Window.partitionBy("q_id").orderBy(col("score").desc, col("n_id"))
    cosr.join(lexr, Seq("q_id", "n_id"), "full_outer")
      .select(col("q_id"), col("n_id"), score.as("score"),
        coalesce(col("rc"), lit(-1)).as("rc"), coalesce(col("rl"), lit(-1)).as("rl"))
      .withColumn("rk", row_number().over(wf))
      .where(col("rk") <= 5)
      .select(col("q_id"), col("rk"), col("n_id"), round(col("score"), 6).as("rrf"),
        col("rc").cast("long").as("rank_cos"), col("rl").cast("long").as("rank_lex"))
      .orderBy("q_id", "rk")
  }

  /** Embedding covariance/whitening audit: the 20 most correlated
    * off-diagonal dimension pairs, from ONE pass. x128 reports the
    * per-dim first/second moments (the covariance DIAGONAL); a whitened
    * or decorrelated embedding space should also have near-zero
    * OFF-diagonal mass, and heavy |corr| pairs mean the effective
    * dimensionality is lower than 64 (a PQ/IVF recall hazard — subspace
    * quantizers assume decorrelated blocks). The full second-moment
    * matrix Σ m·mᵀ rides [[graft.functions.VecOuterAgg]] — a mergeable
    * 2,145-long state (n, 64 component sums, 2,080 upper-triangle
    * product sums in exact milli-integer arithmetic), so the corpus is
    * read once and the exchange carries ONE constant-size state per map
    * task; everything downstream (pair explode, corr arithmetic, the
    * rank window) runs over 2,016 constant rows. corr(i,j) =
    * (n·P_ij − S_i·S_j) / √(n·P_ii − S_i²) / √(n·P_jj − S_j²), exact
    * integers widened to decimal(38,0)/HUGEINT, ONE fixed-order double
    * chain at the end — bit-identical cross-engine, so the top-20 cut
    * needs no epsilon. The DuckDB twin recomputes the same sums by
    * unnesting pairs (the audit-scale shape; the Spark side never
    * generates per-row pair fan-out).
    */
  val covOffdiag: Q = Q(
    "x147_cov_offdiag",
    """WITH idx AS (SELECT unnest(generate_series(1, 64)) AS i),
      |m AS (SELECT vec_id, i,
      |        CAST(floor((embedding::DOUBLE[])[i] * 1000 + 0.5) AS BIGINT) AS mv
      |      FROM embeddings, idx WHERE embedding IS NOT NULL),
      |n AS (SELECT count(*) AS n FROM embeddings WHERE embedding IS NOT NULL),
      |s AS (SELECT i, sum(mv) AS si FROM m GROUP BY i),
      |p AS (SELECT a.i AS i, b.i AS j, sum(a.mv * b.mv) AS pij
      |      FROM m a JOIN m b ON a.vec_id = b.vec_id AND a.i < b.i
      |      GROUP BY a.i, b.i),
      |v AS (SELECT i, sum(mv * mv) AS pii FROM m GROUP BY i),
      |c AS (SELECT p.i, p.j,
      |        CASE WHEN n.n * va.pii - sa.si * sa.si <= 0
      |               OR n.n * vb.pii - sb.si * sb.si <= 0 THEN 0.0
      |             ELSE CAST(n.n * p.pij - sa.si * sb.si AS DOUBLE)
      |                  / sqrt(CAST(n.n * va.pii - sa.si * sa.si AS DOUBLE))
      |                  / sqrt(CAST(n.n * vb.pii - sb.si * sb.si AS DOUBLE)) END AS corr_raw
      |      FROM p JOIN s sa ON sa.i = p.i JOIN s sb ON sb.i = p.j
      |             JOIN v va ON va.i = p.i JOIN v vb ON vb.i = p.j, n)
      |SELECT rk, CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
      |       round(corr_raw, 6) AS corr
      |FROM (SELECT i, j, corr_raw,
      |        row_number() OVER (ORDER BY abs(corr_raw) DESC, i, j) AS rk FROM c)
      |WHERE rk <= 20 ORDER BY rk""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    val outer = udaf(new graft.functions.VecOuterAgg(64),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    // a null array would NPE the aggregator's update; moments are over
    // PRESENT vectors on both engines
    val st = embs(s, dir).where(col("embedding").isNotNull)
      .agg(outer(col("embedding")).as("st"))
    // constant 2,016-row (pair → state offsets) map; k(i,j) mirrors the
    // aggregator's upper-triangle layout
    def kOf(a: Int, b: Int) = (a - 1) * 65 - (a - 1) * a / 2 + (b - a + 1)
    val pairMap = (1 to 64).flatMap { i =>
      (i + 1 to 64).map(j => (kOf(i, j), i, j, kOf(i, i), kOf(j, j)))
    }.toDF("k", "i", "j", "kii", "kjj")
    val cells = st.crossJoin(broadcast(pairMap)).select(
      col("i").cast("long").as("i"), col("j").cast("long").as("j"),
      element_at(col("st"), lit(1)).as("n"),
      element_at(col("st"), col("i").cast("int") + 1).as("si"),
      element_at(col("st"), col("j").cast("int") + 1).as("sj"),
      element_at(col("st"), col("k") + 65).as("pij"),
      element_at(col("st"), col("kii") + 65).as("pii"),
      element_at(col("st"), col("kjj") + 65).as("pjj"))
    val num = col("n").cast("decimal(38,0)") * col("pij") -
      col("si").cast("decimal(38,0)") * col("sj")
    val vi = col("n").cast("decimal(38,0)") * col("pii") -
      col("si").cast("decimal(38,0)") * col("si")
    val vj = col("n").cast("decimal(38,0)") * col("pjj") -
      col("sj").cast("decimal(38,0)") * col("sj")
    val corr = when((vi <= 0).or(vj <= 0), lit(0.0))
      .otherwise(num.cast("double") / sqrt(vi.cast("double")) / sqrt(vj.cast("double")))
    cells.select(col("i"), col("j"), corr.as("corr_raw"))
      .withColumn("rk", row_number().over(
        Window.orderBy(abs(col("corr_raw")).desc, col("i"), col("j"))))
      .where(col("rk") <= 20)
      .select(col("rk"), col("i"), col("j"), round(col("corr_raw"), 6).as("corr"))
      .orderBy("rk")
  }

  /** EMBEDDING-SPACE DRIFT between the corpus's first and second halves —
    * the per-dimension MEAN SHIFT that x147's covariance audit does not
    * measure (covariance drifts catch shape changes; a new crawl batch
    * whose encoder or content moved shifts the MEAN first). For each
    * dimension d: gap = μ₀(d) − μ₁(d) over the vec_id halves, emitted in
    * exact nano units via the x148 cross-multiplication —
    * (s₀·n₁ − s₁·n₀)·1000 // (n₀·n₁) on micro-quantized components
    * (x128's floor(v·10⁶ + 0.5) canonicalization, so both engines share
    * one integerization point) — plus Σ gap² as the squared-L2 drift a
    * monitoring threshold watches. s·n products pass int64 at ~10¹²
    * vectors; everything is widened to decimal(38,0)/HUGEINT first.
    *
    * Scale shape: x128's shape exactly — one row-local posexplode into a
    * 64-group conditional aggregate (map-side combined; the exchange
    * carries 64 rows per partition at any corpus size), the half split
    * decided against one broadcast count. Top-10 head is a bounded
    * TakeOrdered; the Σ gap² total is a second 64-row aggregate.
    */
  val embeddingDrift: Q = Q(
    "x158_embedding_drift",
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |n AS (SELECT count(*) AS n_corpus FROM e),
      |x AS (SELECT CASE WHEN vec_id * 2 < n.n_corpus THEN 0 ELSE 1 END AS h,
      |             i AS dim, CAST(floor(v[i] * 1000000 + 0.5) AS BIGINT) AS mu
      |      FROM e, n, LATERAL (SELECT unnest(generate_series(1, len(v))) AS i) s),
      |g AS (SELECT dim,
      |        sum(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS n0,
      |        sum(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS n1,
      |        sum(CASE WHEN h = 0 THEN mu ELSE 0 END) AS s0,
      |        sum(CASE WHEN h = 1 THEN mu ELSE 0 END) AS s1 FROM x GROUP BY dim),
      |d AS (SELECT dim, n0, n1, s0, s1,
      |        CAST(CASE WHEN n0 = 0 OR n1 = 0 THEN 0
      |             ELSE (CAST(s0 AS HUGEINT) * n1 - CAST(s1 AS HUGEINT) * n0) * 1000
      |                  // (CAST(n0 AS HUGEINT) * n1) END AS BIGINT) AS gap_nano
      |      FROM g),
      |t AS (SELECT CAST(sum(CAST(gap_nano AS HUGEINT) * gap_nano) AS BIGINT) AS l2sq_total
      |      FROM d)
      |SELECT rk, CAST(dim AS BIGINT) AS dim, CAST(n0 AS BIGINT) AS n0,
      |       CAST(n1 AS BIGINT) AS n1, CAST(s0 AS BIGINT) AS s0,
      |       CAST(s1 AS BIGINT) AS s1, gap_nano, l2sq_total
      |FROM (SELECT *, row_number() OVER (ORDER BY abs(gap_nano) DESC, dim) AS rk FROM d), t
      |WHERE rk <= 10 ORDER BY rk""".stripMargin
  ) { (s, dir) =>
    val n = embs(s, dir).agg(count(lit(1)).as("n_corpus"))
    val g = embs(s, dir)
      .crossJoin(broadcast(n))
      .select(when(col("vec_id") * 2 < col("n_corpus"), 0).otherwise(1).as("h"),
        posexplode(col("embedding")).as(Seq("p", "comp")))
      .select(col("h"), (col("p") + 1).cast("long").as("dim"),
        floor(col("comp").cast("double") * 1000000 + 0.5).cast("long").as("mu"))
      .groupBy("dim")
      .agg(
        sum(when(col("h") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("h") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("h") === 0, col("mu")).otherwise(0L)).as("s0"),
        sum(when(col("h") === 1, col("mu")).otherwise(0L)).as("s1"))
    // degenerate half-split guard: n0·n1 = 0 would raise in DuckDB but yield
    // NULL under Spark's non-ANSI div — force the SAME 0 on both engines
    val d = g.withColumn("gap_nano",
      expr("""cast(CASE WHEN n0 = 0 OR n1 = 0 THEN 0
             |ELSE (cast(s0 as decimal(38,0)) * n1 - cast(s1 as decimal(38,0)) * n0)
             |     * 1000 div (cast(n0 as decimal(38,0)) * n1) END as bigint)"""
        .stripMargin))
    val t = d.agg(
      sum(col("gap_nano").cast("decimal(38,0)") * col("gap_nano")).cast("long")
        .as("l2sq_total"))
    d.orderBy(abs(col("gap_nano")).desc, col("dim")).limit(10)
      .withColumn("rk",
        row_number().over(Window.orderBy(abs(col("gap_nano")).desc, col("dim"))))
      .crossJoin(broadcast(t))
      .select(col("rk"), col("dim"), col("n0"), col("n1"), col("s0"), col("s1"),
        col("gap_nano"), col("l2sq_total"))
      .orderBy("rk")
  }

  /** CLUSTER SEPARABILITY of the labeled embedding space — the
    * Calinski–Harabasz variance-ratio index (CH 1974) from EXACT integer
    * scatter sums: per label, the within-cluster scatter W_c = Σ_i Σ_x
    * (x_i − μ_c,i)² and the between-cluster mass B_c = n_c·Σ_i (μ_c,i −
    * μ_i)², with ch_ppm = (B·(n−k)·10⁶) // (W·(k−1)). The audit x138's
    * per-label dispersion and x144's confusion matrix cannot answer alone:
    * "is this label set geometrically separable AT ALL, and which single
    * label contributes the least between-mass?" — the go/no-go a curation
    * pipeline wants before training a classifier on the labels.
    *
    * Exactness: components integerize once (floor(v·10⁶+0.5), x128), means
    * are FLOOR-ppm via the x94 offset trick ((s + 10⁶·n) div n − 10⁶, so
    * truncating `div` equals flooring `//` on negative sums), and both
    * scatter numerators are widened-integer arithmetic — no float anywhere,
    * the whole row hash-matches. W_c rides the exact numerator Σ_i (n_c·ssq
    * − s²) // n_c; B_c uses the integer means directly (|μ| ≤ 10⁶ ⇒ the
    * squared term is ≤ 64·4·10¹², ×n_c safe in decimal(38,0) to any corpus).
    *
    * Scale shape: ONE corpus posexplode aggregate to (label, dim) cells —
    * the x33/x128 exchange, map-side combined, |labels|×64 rows out —
    * then every downstream step runs on label-cardinality rows (the global
    * sums are a re-aggregate of the cells, the CH scalar a 1-row cross
    * join). Labeled-and-embedded rows only (the x144 eval contract).
    */
  val clusterSeparability: Q = Q(
    "x160_cluster_separability",
    """WITH e AS (SELECT label, i,
      |        CAST(floor((embedding::DOUBLE[])[i] * 1000000 + 0.5) AS BIGINT) AS ppm
      |      FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) idx
      |      WHERE embedding IS NOT NULL AND label IS NOT NULL),
      |cs AS (SELECT label, i, CAST(sum(ppm) AS HUGEINT) AS s,
      |         CAST(sum(CAST(ppm AS HUGEINT) * ppm) AS HUGEINT) AS ssq,
      |         CAST(count(*) AS HUGEINT) AS nc
      |       FROM e GROUP BY label, i),
      |g AS (SELECT i, sum(s) AS gs, sum(nc) AS n FROM cs GROUP BY i),
      |mu AS (SELECT cs.label, cs.i, cs.nc, cs.s, cs.ssq,
      |         (cs.s + 1000000 * cs.nc) // cs.nc - 1000000 AS muc,
      |         (g.gs + 1000000 * g.n) // g.n - 1000000 AS mug, g.n AS n
      |       FROM cs JOIN g ON g.i = cs.i),
      |lbl AS (SELECT label, max(nc) AS nc, max(n) AS n,
      |          sum(nc * ssq - s * s) // max(nc) AS wss,
      |          max(nc) * sum((muc - mug) * (muc - mug)) AS bss
      |        FROM mu GROUP BY label),
      |tot AS (SELECT sum(wss) AS w, sum(bss) AS b, count(*) AS k, max(n) AS n FROM lbl)
      |SELECT CAST(lbl.label AS BIGINT) AS label, CAST(lbl.nc AS BIGINT) AS n_vecs,
      |       CAST(lbl.wss AS BIGINT) AS wss, CAST(lbl.bss AS BIGINT) AS bss,
      |       CAST(CASE WHEN tot.k < 2 OR tot.w <= 0 THEN -1
      |            ELSE tot.b * (tot.n - tot.k) * 1000000 // (tot.w * (tot.k - 1))
      |            END AS BIGINT) AS ch_ppm
      |FROM lbl, tot ORDER BY label""".stripMargin
  ) { (s, dir) =>
    val cs = embs(s, dir)
      .where(col("embedding").isNotNull && col("label").isNotNull)
      .select(col("label").cast("long").as("label"),
        posexplode(col("embedding")).as(Seq("p", "v")))
      .select(col("label"), (col("p") + 1).cast("long").as("i"),
        floor(col("v").cast("double") * 1000000 + 0.5).cast("long").as("ppm"))
      .groupBy("label", "i")
      .agg(sum(col("ppm")).cast("decimal(38,0)").as("s"),
        sum(col("ppm").cast("decimal(38,0)") * col("ppm")).as("ssq"),
        count(lit(1)).cast("decimal(38,0)").as("nc"))
    val g = cs.groupBy("i").agg(sum("s").as("gs"), sum("nc").as("n"))
    val mu = cs.join(broadcast(g), "i")
      .select(col("label"), col("i"), col("nc"), col("s"), col("ssq"),
        expr("(s + 1000000 * nc) div nc - 1000000").as("muc"),
        expr("(gs + 1000000 * n) div n - 1000000").as("mug"), col("n"))
    val lbl = mu.groupBy("label")
      .agg(max("nc").as("nc"), max("n").as("n"),
        expr("sum(nc * ssq - s * s) div max(nc)").as("wss"),
        expr("max(nc) * sum((muc - mug) * (muc - mug))").as("bss"))
    val tot = lbl.agg(sum("wss").as("w"), sum("bss").as("b"),
      count(lit(1)).cast("decimal(38,0)").as("k"), max("n").as("ntot"))
    lbl.drop("n").crossJoin(broadcast(tot))
      .select(col("label"), col("nc").cast("long").as("n_vecs"),
        col("wss").cast("long").as("wss"), col("bss").cast("long").as("bss"),
        expr("""cast(CASE WHEN k < 2 OR w <= 0 THEN -1
               |ELSE b * (ntot - k) * 1000000 div (w * (k - 1)) END as bigint)"""
          .stripMargin).as("ch_ppm"))
      .orderBy("label")
  }

  /** QUANTIZATION-ERROR audit of the x69 int8 SQ codec — the exact
    * reconstruction-error histogram a pipeline checks before trusting a
    * compressed index: each vector is quantized with x69's per-vector
    * min/max affine rule, DEQUANTIZED back, and the squared error between
    * the micro-integerized reconstruction and the micro-integerized
    * original is summed per vector (pure int64 — both engines run the
    * identical IEEE chain from identical (mn, mx, code) inputs before the
    * single floor, the x128 discipline). A code drift, a changed rounding
    * mode, or a corrupted shard shifts the histogram immediately.
    *
    * Scale shape: ONE row-local corpus pass (no join back to the code
    * table — the audit recomputes the codec's contract inline, so it also
    * CHECKS it) into a bounded histogram aggregate: buckets are err² // 10⁷
    * — a handful of rows at any corpus size.
    */
  val sqReconError: Q = Q(
    "x161_sq_recon_error",
    """WITH c AS (
      |  SELECT vec_id, mn, mx,
      |         list_transform(v, x -> CASE WHEN mx = mn THEN 0
      |           ELSE CAST(floor((x - mn) * 255.0 / (mx - mn) + 0.5) AS BIGINT) - 128 END) AS codes,
      |         v
      |  FROM (SELECT vec_id, embedding::DOUBLE[] AS v,
      |               CAST(list_min(embedding) AS DOUBLE) AS mn,
      |               CAST(list_max(embedding) AS DOUBLE) AS mx
      |        FROM embeddings WHERE embedding IS NOT NULL)),
      |err AS (
      |  SELECT vec_id,
      |         list_sum(list_transform(generate_series(1, len(v)), i ->
      |           (CAST(floor((mn + (codes[i] + 128) * (mx - mn) / 255.0) * 1000000 + 0.5) AS BIGINT)
      |            - CAST(floor(v[i] * 1000000 + 0.5) AS BIGINT))
      |           * (CAST(floor((mn + (codes[i] + 128) * (mx - mn) / 255.0) * 1000000 + 0.5) AS BIGINT)
      |              - CAST(floor(v[i] * 1000000 + 0.5) AS BIGINT)))) AS e2
      |  FROM c)
      |SELECT CAST(e2 // 10000000 AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n,
      |       CAST(min(e2) AS BIGINT) AS min_e2, CAST(max(e2) AS BIGINT) AS max_e2
      |FROM err GROUP BY 1 ORDER BY bucket""".stripMargin
  ) { (s, dir) =>
    val mn = array_min(col("embedding")).cast("double")
    val mx = array_max(col("embedding")).cast("double")
    val code = (x: Column) => when(mx === mn, lit(0L))
      .otherwise(floor((x - mn) * 255.0 / (mx - mn) + 0.5).cast("long") - 128)
    val de = (x: Column) =>
      floor((mn + (code(x) + 128).cast("double") * (mx - mn) / 255.0) * 1000000 + 0.5)
        .cast("long")
    val orig = (x: Column) => floor(x * 1000000 + 0.5).cast("long")
    embs(s, dir).where(col("embedding").isNotNull)
      .select(col("vec_id"),
        aggregate(
          transform(col("embedding").cast("array<double>"),
            x => (de(x) - orig(x)) * (de(x) - orig(x))),
          lit(0L), (acc, x) => acc + x).as("e2"))
      .groupBy(expr("e2 div 10000000").as("bucket"))
      .agg(count(lit(1)).as("n"), min("e2").as("min_e2"), max("e2").as("max_e2"))
      .orderBy("bucket")
  }

  /** MMR candidate-pool size and selection count. The pool is the ONLY
    * corpus-coupled quantity — selection work is K·PoolN scores regardless
    * of corpus size, the property that makes greedy MMR deployable at all.
    */
  private val MmrPool = 24
  private val MmrK    = 8

  /** DuckDB twin of the greedy loop, unrolled: stage k scores the
    * remaining pool against the selected set sel(k−1) and takes the
    * arg-max (score desc, vec_id tiebreak).
    */
  private def mmrStagesSql: String = (2 to MmrK).map { k =>
    // MATERIALIZED: sel(k) references sel(k−1) three times — default CTE
    // inlining would expand the chain 3^k-fold (measured: blew the fd limit
    // through re-opened parquet scans before computing anything)
    s"""c$k AS (SELECT p.vec_id, p.rel_ppm, CAST(coalesce(max(f.sp), 0) AS BIGINT) AS pen
       |  FROM pool p LEFT JOIN sf f ON f.va = p.vec_id AND f.vb IN (SELECT vec_id FROM sel${k - 1})
       |  WHERE p.vec_id NOT IN (SELECT vec_id FROM sel${k - 1}) GROUP BY 1, 2),
       |s$k AS MATERIALIZED (SELECT CAST($k AS BIGINT) AS rk, vec_id, rel_ppm, pen AS div_pen_ppm,
       |  7 * rel_ppm - 3 * pen AS score_ppm FROM c$k ORDER BY score_ppm DESC, vec_id LIMIT 1),
       |sel$k AS MATERIALIZED (SELECT vec_id FROM sel${k - 1} UNION ALL SELECT vec_id FROM s$k)""".stripMargin
  }.mkString(",\n")

  /** Maximal-marginal-relevance selection (Carbonell & Goldstein, SIGIR'98)
    * — the diversity-aware subset pick a curation pipeline runs to choose
    * k REPRESENTATIVE documents: greedily maximize
    * λ·centrality − (1−λ)·max-similarity-to-already-picked (λ = 0.7,
    * integer-scaled to 7/3 in ppm so the arg-max is exact on both engines).
    * Relevance is cosine to the corpus MEAN vector; each step's diversity
    * penalty is the max cosine to the selected set.
    *
    * Scale shape: the corpus pays ONE row-local ppm projection + a 64-row
    * mean exchange + a TakeOrdered(24) — everything after that is bounded:
    * the greedy loop scores K·PoolN ≤ 192 candidates over a ≤24-row pool
    * collected to the driver (the documented model-parameter-collect
    * pattern, same class as the codebook family). Selection is inherently
    * sequential in k; distributing a 24-row loop would only add exchanges.
    *
    * Determinism: vectors and the mean are exact micro-ppm integers (the
    * x144 convention), so dots and norms-squared are exact integers; the
    * only floating step is dot/√·/√· — the same IEEE double sequence on
    * both engines — floored into ppm before any comparison. Ragged or
    * null-element vectors are excluded IDENTICALLY on both sides (len=64,
    * no NULL elements) before the ppm projection — without the shared
    * guard DuckDB's sum() would skip NULL ppm terms (keeping a vector
    * with a partial dot) while Spark's aggregate() null-propagates and
    * the na2 > 0 filter drops it (ADVICE r12).
    *
    * NOTE: unlike every other query in the file, CONSTRUCTING this
    * DataFrame runs Spark jobs eagerly — the ≤24-row pool collect and the
    * greedy loop execute at query-build time (the documented
    * model-parameter-collect pattern). A plan-shape sweep or dry
    * enumeration of SparkEntry.queries("x163_mmr_select") therefore pays
    * full corpus scans; don't read it as "free" in a plan-only pass.
    */
  val mmrSelect: Q = Q(
    "x163_mmr_select",
    s"""WITH idx AS (SELECT unnest(generate_series(1, 64)) AS i),
       |e AS MATERIALIZED (SELECT vec_id, i, CAST(floor((embedding::DOUBLE[])[i] * 1000000 + 0.5) AS BIGINT) AS ppm
       |      FROM embeddings, idx
       |      WHERE embedding IS NOT NULL AND len(embedding) = 64
       |        AND len(list_filter(embedding, x -> x IS NULL)) = 0),
       |m AS (SELECT i, CAST(floor(CAST(sum(ppm) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS mp
       |      FROM e GROUP BY i),
       |nm AS (SELECT CAST(sum(mp * mp) AS BIGINT) AS nm2 FROM m),
       |rv AS (SELECT e.vec_id, CAST(sum(e.ppm * m.mp) AS BIGINT) AS dotm,
       |              CAST(sum(e.ppm * e.ppm) AS BIGINT) AS na2
       |       FROM e JOIN m ON m.i = e.i GROUP BY e.vec_id),
       |rel AS (SELECT vec_id,
       |          CAST(floor(CAST(dotm AS DOUBLE) / sqrt(CAST(na2 AS DOUBLE)) / sqrt(CAST(nm2 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS rel_ppm
       |        FROM rv, nm WHERE na2 > 0 AND nm2 > 0),
       |pool AS MATERIALIZED (SELECT vec_id, rel_ppm FROM rel ORDER BY rel_ppm DESC, vec_id LIMIT $MmrPool),
       |pv AS (SELECT e.vec_id, e.i, e.ppm FROM e JOIN pool p ON p.vec_id = e.vec_id),
       |pn AS (SELECT vec_id, CAST(sum(ppm * ppm) AS BIGINT) AS n2 FROM pv GROUP BY vec_id),
       |pd AS (SELECT a.vec_id AS va, b.vec_id AS vb, CAST(sum(a.ppm * b.ppm) AS BIGINT) AS dd
       |       FROM pv a JOIN pv b ON a.i = b.i AND a.vec_id < b.vec_id GROUP BY 1, 2),
       |sim AS (SELECT va, vb,
       |          CAST(floor(CAST(dd AS DOUBLE) / sqrt(CAST(x.n2 AS DOUBLE)) / sqrt(CAST(y.n2 AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS sp
       |        FROM pd JOIN pn x ON x.vec_id = pd.va JOIN pn y ON y.vec_id = pd.vb),
       |sf AS MATERIALIZED (SELECT va, vb, sp FROM sim UNION ALL SELECT vb, va, sp FROM sim),
       |s1 AS MATERIALIZED (SELECT CAST(1 AS BIGINT) AS rk, vec_id, rel_ppm, CAST(0 AS BIGINT) AS div_pen_ppm,
       |       7 * rel_ppm AS score_ppm FROM pool ORDER BY score_ppm DESC, vec_id LIMIT 1),
       |sel1 AS MATERIALIZED (SELECT vec_id FROM s1),
       |$mmrStagesSql
       |SELECT rk, vec_id, rel_ppm, div_pen_ppm, score_ppm
       |FROM (${(1 to MmrK).map(k => s"SELECT * FROM s$k").mkString(" UNION ALL ")}) u
       |ORDER BY rk""".stripMargin
  ) { (s, dir) =>
    val ppm = transform(col("embedding"), v => floor(v.cast("double") * 1000000 + 0.5).cast("long"))
    // same exclusion as the oracle's e-CTE: fixed 64-wide, no NULL elements
    val ev = embs(s, dir)
      .where(col("embedding").isNotNull && size(col("embedding")) === 64 &&
        !exists(col("embedding"), _.isNull))
      .select(col("vec_id"), ppm.as("pv"))
    // corpus mean in exact ppm ints — one 64-row exchange (x144's shape)
    val mean = ev.select(posexplode(col("pv")).as(Seq("p", "v")))
      .groupBy((col("p") + 1).as("i"))
      .agg(sum("v").as("sd"), count(lit(1)).as("cnt"))
      .select(col("i"), floor(col("sd").cast("double") / col("cnt") + 0.5).cast("long").as("mp"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("mp")))),
        x => x.getField("mp")).as("mv"))
    val rel = ev.crossJoin(broadcast(mean))
      .withColumn("dotm", aggregate(zip_with(col("pv"), col("mv"), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x))
      .withColumn("na2", aggregate(transform(col("pv"), a => a * a),
        lit(0L), (acc, x) => acc + x))
      .withColumn("nm2", aggregate(transform(col("mv"), a => a * a),
        lit(0L), (acc, x) => acc + x))
      .where(col("na2") > 0 && col("nm2") > 0)
      .select(col("vec_id"), col("pv"),
        floor(col("dotm").cast("double") / sqrt(col("na2").cast("double")) /
          sqrt(col("nm2").cast("double")) * 1000000 + 0.5).cast("long").as("rel_ppm"),
        col("na2"))
    val pool = rel.orderBy(col("rel_ppm").desc, col("vec_id")).limit(MmrPool).collect()
    final case class Cand(id: Long, rel: Long, v: Array[Long], n2: Long)
    val cands = pool.map(r =>
      Cand(r.getLong(0), r.getLong(2), r.getSeq[Long](1).toArray, r.getLong(3)))
    def simPpm(a: Cand, b: Cand): Long = {
      var dd = 0L; var i = 0
      val n = math.min(a.v.length, b.v.length)
      while (i < n) { dd += a.v(i) * b.v(i); i += 1 }
      math.floor(dd.toDouble / math.sqrt(a.n2.toDouble) / math.sqrt(b.n2.toDouble)
        * 1000000 + 0.5).toLong
    }
    val chosen    = scala.collection.mutable.ArrayBuffer.empty[Cand]
    val remaining = scala.collection.mutable.ArrayBuffer(cands.toSeq: _*)
    val out       = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long)]
    var rk = 1L
    while (rk <= MmrK && remaining.nonEmpty) {
      val scored = remaining.map { c =>
        val pen = if (chosen.isEmpty) 0L else chosen.map(simPpm(c, _)).max
        (c, pen, 7 * c.rel - 3 * pen)
      }
      val (best, pen, score) = scored.minBy { case (c, _, sc) => (-sc, c.id) }
      out += ((rk, best.id, best.rel, pen, score))
      chosen += best
      remaining -= best
      rk += 1
    }
    import s.implicits._
    out.toSeq.toDF("rk", "vec_id", "rel_ppm", "div_pen_ppm", "score_ppm").orderBy("rk")
  }

  val all: Seq[Q] = Seq(cosineNearDup, cosineTopK, annLsh, annMultiprobe, annIvf,
    annMultitable, labelCentroids, kmeansIter, semanticDedup, quantizedTopK,
    labelAffinity, annRecall, pqAnn, ivfpqAnn, bitextMargin, annRankEval,
    embeddingMoments, kcenterCoreset, jlDistortion, dimQuantiles, labelDispersion,
    embeddingOutliers, rrfFusion, centroidConfusion, covOffdiag, embeddingDrift,
    clusterSeparability, sqReconError, mmrSelect)
}
