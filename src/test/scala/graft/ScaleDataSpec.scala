package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** ScaleData corpus-shape contract. The k=100 build in round 7 exposed that
  * a small permutation family silently plants K/|perms|-deep EXACT-duplicate
  * groups: copies 10 apart were byte-identical under the single 10-rotation
  * alphabet, dedup pair joins grew K²/10, and the first sf10 bench filled
  * the disk. This spec locks the fixed transforms' distinctness so a future
  * transform change (or a k beyond the family's range) fails here, in
  * seconds, instead of at the 100× bench.
  */
class ScaleDataSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-scaledata-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  // k=12 crosses the first alphabet's 10-rotation period AND covers the
  // copy-index arithmetic of the second alphabet — the exact regime the
  // round-7 bug lived in
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-scaledata").toString
    ScaleData.run(spark, "/root/testdata/sf0.001", d, 12)
    d
  }

  test("document copies are pairwise byte-distinct across the full copy range") {
    val docs = spark.read.parquet(s"$dir/documents.parquet").where(col("text").isNotNull)
    val srcDup = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("text").isNotNull)
      .groupBy("text").count().where(col("count") > 1)
      .agg(coalesce(sum(col("count") * (col("count") - 1) / 2), lit(0.0))).head().getDouble(0)
    val scaledDup = docs.groupBy("text").count().where(col("count") > 1)
      .agg(coalesce(sum(col("count") * (col("count") - 1) / 2), lit(0.0))).head().getDouble(0)
    // duplicate PAIRS may only be the source's own duplicate pairs × k —
    // zero pairs across copies (linear growth, never K²/|perms|)
    assert(scaledDup == srcDup * 12,
      s"cross-copy duplicate text detected: source dup-pairs $srcDup, scaled $scaledDup (expect ${srcDup * 12})")
  }

  test("embedding copies are pairwise distinct and norm-preserving") {
    val src = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    assert(emb.count() == src.count() * 12)
    val dups = emb.groupBy("embedding").count().where(col("count") > 1).count()
    assert(dups == 0, s"$dups duplicate embedding vectors across copies")
    // norm preservation: rotation and negation must not change the L2 norm
    def normSum(df: org.apache.spark.sql.DataFrame): Double = df
      .select(round(aggregate(col("embedding"), lit(0.0d),
        (acc, x) => acc + x.cast("double") * x.cast("double")), 4).as("n2"))
      .agg(sum("n2")).head().getDouble(0)
    assert(math.abs(normSum(emb) - normSum(src) * 12) < 1e-2)
  }

  test("key shifts stay join-consistent at k=12") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    // every lineitem still finds its order — the per-copy shift moved both
    // sides of the FK identically
    val orphans = li.join(ord, li("l_orderkey") === ord("o_orderkey"), "left_anti").count()
    assert(orphans == 0, s"$orphans lineitem rows lost their order after scaling")
  }
}
