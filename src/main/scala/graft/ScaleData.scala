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
    require(args.length == 3, "usage: ScaleData <srcDir> <destDir> <k>")
    val Array(src, dest, kStr) = args
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
        val alpha = "aeiousnrtl"
        val perms = (0 until k).map(c => {
          val r = c % alpha.length
          "'" + (alpha.drop(r) + alpha.take(r)) + "'"
        }).mkString(",")
        ops.Tables(spark, src, "documents").crossJoin(copies)
          .withColumn("doc_id", col("doc_id") + col("copy") * maxOf("documents", "doc_id"))
          .withColumn("text",
            expr(s"translate(text, '$alpha', element_at(array($perms), cast(copy + 1 as int)))"))
          .drop("copy")
      },
      "embeddings" -> {
        ops.Tables(spark, src, "embeddings").crossJoin(copies)
          .withColumn("vec_id", col("vec_id") + col("copy") * maxOf("embeddings", "vec_id"))
          .withColumn("r", (col("copy") % size(col("embedding"))).cast("int"))
          .withColumn("embedding",
            concat(expr("slice(embedding, r + 1, size(embedding) - r)"),
              expr("slice(embedding, 1, r)")))
          .drop("copy", "r")
      })

    // Multi-file output: the driver testdata is one file with one row
    // group per table, which caps scan parallelism at 1 (parquet cannot
    // split below row-group granularity). A real K×-scale corpus is many
    // files — writing the scaled copy as one file per source partition ×
    // copy would again serialize every scan stage, so spread each table
    // across the session's cores. Dims stay single-file (they broadcast).
    val spreadN = spark.sparkContext.defaultParallelism
    for ((t, df) <- plans) {
      df.repartition(spreadN).write.mode("overwrite").parquet(s"$dest/$t.parquet")
      println(s"[scaledata] $t x$k written")
    }
    spark.stop()
  }
}
