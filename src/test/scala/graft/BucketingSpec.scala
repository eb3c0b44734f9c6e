package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Tables

/** Bucketing = the co-located-join strategy for repeated big joins
  * (SURVEY.md §2.B joins note): both sides pre-hashed into the same bucket
  * count on the join key → the sort-merge join reads bucket i against
  * bucket i with NO Exchange on either side. At 100 TB this converts every
  * recurring fact⨝fact join from a full shuffle into a local merge.
  */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val warehouse = Files.createTempDirectory("graft-warehouse").toString

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-bucketing-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.autoBroadcastJoinThreshold", -1) // force the join path under test
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("bucketed tables join without an Exchange on either side") {
    val dir = "/root/testdata/sf0.001"
    Tables(spark, dir, "orders").write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables(spark, dir, "lineitem").write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val joined = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))

    val rows = joined.collect()
    assert(rows.nonEmpty)
    joined.collect() // finalize AQE
    val plan = joined.queryExecution.executedPlan.toString

    // the join consumes the bucketed layout directly: no shuffle on either
    // join key (the groupBy's Exchange on o_orderpriority is expected)
    assert(plan.contains("SortMergeJoin"))
    assert(plan.contains("Bucketed: true"))
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles a join key:\n$plan")

    // equivalence with the unbucketed join
    val plainCount = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey")).count()
    val bucketedCount = spark.table("lineitem_b")
      .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey")).count()
    assert(plainCount == bucketedCount)
  }
}
