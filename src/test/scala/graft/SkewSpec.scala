package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Skew, Tables}

/** Salted-join equivalence: same rows as the plain equi-join, with the hot
  * key's probe rows spread across salt sub-partitions.
  */
class SkewSpec extends AnyFunSuite with BeforeAndAfterAll with SqlConfHelper {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-skew-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("AQE skew-join splits a skewed shuffle partition at runtime") {
    // The engine's OTHER skew answer besides x61's explicit salting: AQE
    // detects the oversized shuffle partition after the map stage and
    // splits it across reducers (OptimizeSkewedJoin), marking the join
    // skew=true. Production thresholds (256 MB) can't trip on test data,
    // so they scale down; the assertion is that the runtime re-plan
    // engages at all — at 100 TB this is what saves an unsalted join from
    // a straggler reducer when the skew wasn't known at write time.
    withSQLConf(spark)(
      "spark.sql.autoBroadcastJoinThreshold"                        -> "-1",
      "spark.sql.adaptive.skewJoin.enabled"                         -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor"           -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes"             -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled"               -> "false") {
      // 95% of fact rows share one key (id % 20 == 0 diverts 1 in 20) — one
      // reducer partition dwarfs the rest
      val fact = spark.range(200000)
        .select(when(col("id") % 20 === 0, col("id") % 50).otherwise(7L).as("k"),
          col("id").as("v"))
      val dim = spark.range(50).select(col("id").as("k"), (col("id") * 100).as("w"))
      val q = fact.join(dim, "k").agg(sum(col("v") + col("w")).as("s"))
      q.collect()
      val plan = q.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(plan.contains("skew=true"),
        "OptimizeSkewedJoin did not split the hot partition:\n" +
          plan.linesIterator.take(30).mkString("\n"))
    }
  }

  test("saltedJoin returns exactly the plain join's rows under heavy skew") {
    import spark.implicits._
    // 90% of the fact rows share one hot key
    val fact = spark.range(100000)
      .select(when(col("id") % 10 === 0, col("id") % 50).otherwise(7L).as("k"),
        col("id").as("v"))
    val dim = spark.range(50).select(col("id").as("k"), (col("id") * 100).as("w"))

    val plain  = fact.join(dim, "k")
    val salted = Skew.saltedJoin(fact, dim, "k", salt = 8)

    assert(salted.count() == plain.count())
    val sumPlain = plain.agg(sum(col("v") + col("w"))).head.getLong(0)
    val sumSalt  = salted.agg(sum(col("v") + col("w"))).head.getLong(0)
    assert(sumPlain == sumSalt)
  }

  test("saltedJoin on the testdata fact/dim pair matches the plain join") {
    val ev  = Tables(spark, "/root/testdata/sf0.001", "events")
    val dim = ev.groupBy("user_id").agg(count(lit(1)).as("n_user_events"))
    val plain  = ev.join(dim, "user_id")
    val salted = Skew.saltedJoin(ev, dim, "user_id", salt = 4)
    assert(salted.count() == plain.count())
  }
}
