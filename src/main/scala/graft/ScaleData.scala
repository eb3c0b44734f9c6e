package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor multiplier for the driver testdata: materializes a K×-scaled
  * copy of an sf directory so the scale claims in SURVEY §9 can be MEASURED,
  * not just argued (`runMain graft.ScaleData <srcDir> <destDir> <k>`).
  *
  * Every fact table is replicated K times with per-copy key shifts that
  * preserve join consistency (orders.o_custkey shifts exactly like
  * customer.c_custkey, etc.). Two tables need content transforms so the
  * WORKLOAD scales the way a real corpus does, not the way naive
  * replication does:
  *
  *  - `documents.text` goes through a per-copy rotation of a 10-letter
  *    substitution alphabet (`translate`): byte-identical lengths and word
  *    structure (length-dependent costs scale exactly), but nearly every
  *    shingle differs across copies — cross-copy Jaccard ≈ 0, so LSH/dedup
  *    candidate pairs grow ~K-linearly. Naive replication would make every
  *    document an exact near-dup of its K−1 copies and grow the pair list
  *    ~K² — benchmarking a corpus shape that never occurs.
  *  - `embeddings.embedding` is element-rotated by the copy index: distinct
  *    vectors (no K-fold degenerate duplicate cells in IVF/semantic-dedup),
  *    same norms and dimensionality.
  *
  * The generated directory is benchmark input ONLY (`SPARK_GRAFT_SF_DIR`) —
  * correctness always runs against the driver's own testdata.
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val skew = args.contains("--skew")
    val pos = args.filterNot(_ == "--skew")
    require(pos.length == 3, "usage: ScaleData <srcDir> <destDir> <k> [--skew]")
    val Array(src, dest, kStr) = pos
    val k = kStr.toInt
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, dest, k, skew)
    spark.stop()
  }

  /** Hot fraction the skew mode injects (1 row in 10 → the hot key). */
  val SkewHotMod = 10
  /** The phrase appended to every other document in skew mode: its interior
    * word-3-grams are IDENTICAL across those docs, so their df is
    * ~half the corpus — deliberately past x04's df-cap on any corpus with
    * > 2·cap documents. Applied AFTER the per-copy alphabet rotation so
    * the hot shingles stay hot across copies instead of splitting K ways.
    */
  val SkewHotPhrase = " alpha beta gamma delta epsilon zeta eta theta"
  /** Skew mode concentrates ~90% of documents on this language (9 of every
    * [[SkewHotMod]] doc_ids) and ~50% on this source — the real-corpus
    * shape where a per-language/stratum window serializes most of the data
    * through one task (the r8 verdict's x130/x58/x30 finding).
    */
  val SkewHotLang = "en"
  val SkewHotSource = "src1"

  /** Body of the scaler, callable with a caller-owned session (SkewSpec
    * builds its fixture through this — main() owns its own session).
    * `skew = true` additionally plants one hot key per family:
    * events.user_id = 1 and lineitem.l_suppkey = 1 each carry ~10% of
    * rows, and half the documents share the [[SkewHotPhrase]] shingles —
    * the fixture for proving salting/df-cap/AQE actually engage.
    */
  def run(spark: SparkSession, src: String, dest: String, k: Int,
      skew: Boolean = false): Unit = {
    val copies = spark.range(k).select(col("id").as("copy"))
    def shifted(df: DataFrame, keys: Map[String, Long]): DataFrame =
      keys.foldLeft(df.crossJoin(copies)) { case (d, (c, step)) =>
        d.withColumn(c, col(c) + col("copy") * step)
      }.drop("copy")
    def maxOf(name: String, c: String): Long =
      ops.Tables(spark, src, name).agg(max(col(c))).head().getLong(0) + 1

    // dims stay as-is: scaling facts 10x against FIXED dims is the star-
    // schema shape (region/nation genuinely fixed; customer/supplier/part
    // scale with the facts per TPC-H, so they shift too)
    for (t <- Seq("region", "nation"))
      ops.Tables(spark, src, t).write.mode("overwrite").parquet(s"$dest/$t.parquet")

    val custStep  = maxOf("customer", "c_custkey")
    val suppStep  = maxOf("supplier", "s_suppkey")
    val partStep  = maxOf("part", "p_partkey")
    val orderStep = maxOf("orders", "o_orderkey")

    val plans: Seq[(String, DataFrame)] = Seq(
      "customer" -> shifted(ops.Tables(spark, src, "customer"), Map("c_custkey" -> custStep)),
      "supplier" -> shifted(ops.Tables(spark, src, "supplier"), Map("s_suppkey" -> suppStep)),
      "part"     -> shifted(ops.Tables(spark, src, "part"), Map("p_partkey" -> partStep)),
      "orders" -> shifted(ops.Tables(spark, src, "orders"),
        Map("o_orderkey" -> orderStep, "o_custkey" -> custStep)),
      "lineitem" -> shifted(ops.Tables(spark, src, "lineitem"),
        Map("l_orderkey" -> orderStep, "l_partkey" -> partStep, "l_suppkey" -> suppStep)),
      "events" -> shifted(ops.Tables(spark, src, "events"),
        Map("event_id" -> maxOf("events", "event_id"),
            "user_id"  -> maxOf("events", "user_id"))),
      "documents" -> {
        // TWO independent substitution alphabets, rotated by (copy % 10)
        // and (copy div 10 % 10): 100 distinct compositions, so every copy
        // pair differs in nearly every shingle up to K = 100. The first
        // sf10 build used the single 10-rotation alphabet — copies 10 apart
        // were BYTE-IDENTICAL, planting 10-deep exact-duplicate groups
        // whose pair joins grow K²/10 and filled the disk at K = 100.
        require(k <= 100, s"documents scaling supports k <= 100 distinct copies, got $k")
        val alpha1 = "aeiousnrtl"
        val alpha2 = "dhcmpgbfwy"
        def perms(alpha: String, sel: Int => Int): String =
          (0 until k).map(c => {
            val r = sel(c) % alpha.length
            "'" + (alpha.drop(r) + alpha.take(r)) + "'"
          }).mkString(",")
        val p1 = perms(alpha1, c => c % 10)
        val p2 = perms(alpha2, c => (c / 10) % 10)
        ops.Tables(spark, src, "documents").crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("copy") * maxOf("documents", "doc_id"))
          .withColumn("text",
            expr(s"translate(text, '$alpha1', element_at(array($p1), cast(copy + 1 as int)))"))
          .withColumn("text",
            expr(s"translate(text, '$alpha2', element_at(array($p2), cast(copy + 1 as int)))"))
          .drop("copy")
      },
      "embeddings" -> {
        // element rotation (copy % dim) composed with whole-vector negation
        // for copy >= dim: 2·dim distinct transforms (128 at dim 64), all
        // norm-preserving. Rotation alone repeats every dim copies — the
        // K = 100 build duplicated 36% of vectors, exploding the per-cell
        // quadratic in x57. Negated pairs sit at cosine −1, far below every
        // near-dup threshold, so pair counts stay ~K-linear.
        ops.Tables(spark, src, "embeddings").crossJoin(copies)
          .withColumn("vec_id", col("vec_id") + col("copy") * maxOf("embeddings", "vec_id"))
          .withColumn("r", (col("copy") % size(col("embedding"))).cast("int"))
          .withColumn("sgn",
            when((col("copy") / size(col("embedding"))).cast("int") % 2 === 1, lit(-1.0f))
              .otherwise(lit(1.0f)))
          .withColumn("embedding",
            expr("transform(concat(slice(embedding, r + 1, size(embedding) - r), " +
              "slice(embedding, 1, r)), x -> x * sgn)"))
          .drop("copy", "r", "sgn")
      })

    // Skew injection (--skew): the benign corpus above deliberately spreads
    // keys and shingles; this mode plants the hot spots a 100 TB pipeline
    // actually meets, so the engine's skew answers (x61 salting, x04's
    // df-cap, AQE skew-join) can be PROVEN to engage rather than argued.
    val finalPlans =
      if (!skew) plans
      else plans.map {
        case ("events", df) =>
          // one hot user carries ~1/SkewHotMod of all events
          "events" -> df.withColumn("user_id",
            when(col("event_id") % SkewHotMod === 0, lit(1L)).otherwise(col("user_id")))
        case ("lineitem", df) =>
          // one hot supplier carries ~1/SkewHotMod of all line items
          "lineitem" -> df.withColumn("l_suppkey",
            when(col("l_orderkey") % SkewHotMod === 0, lit(1L)).otherwise(col("l_suppkey")))
        case ("documents", df) =>
          // every other doc carries the fixed phrase → its interior word
          // 3-grams have df ≈ half the corpus (post-rotation, so the df
          // concentrates instead of splitting across copies); r9 adds the
          // partition-key concentrations a real crawl has — one language
          // at ~90% of the corpus and one source at ~50% — the fixture
          // behind the per-language window-family re-plan (x130/x58: a
          // per-lang rank window would sort 90% of doc rows in ONE task
          // here) and the per-stratum top-k (x30)
          "documents" -> df
            .withColumn("text",
              when(col("doc_id") % 2 === 0 && col("text").isNotNull,
                concat(col("text"), lit(SkewHotPhrase))).otherwise(col("text")))
            .withColumn("lang",
              when(col("doc_id") % SkewHotMod =!= 0, lit(SkewHotLang))
                .otherwise(col("lang")))
            .withColumn("source",
              when(col("doc_id") % 2 === 0, lit(SkewHotSource))
                .otherwise(col("source")))
        case other => other
      }

    // Multi-file output: the driver testdata is one file with one row
    // group per table, which caps scan parallelism at 1 (parquet cannot
    // split below row-group granularity). A real K×-scale corpus is many
    // files — writing the scaled copy as one file per source partition ×
    // copy would again serialize every scan stage, so spread each table
    // across the session's cores. Dims stay single-file (they broadcast).
    val spreadN = spark.sparkContext.defaultParallelism
    for ((t, df) <- finalPlans) {
      df.repartition(spreadN).write.mode("overwrite").parquet(s"$dest/$t.parquet")
      println(s"[scaledata] $t x$k written" + (if (skew) " (skew)" else ""))
    }
  }
}
