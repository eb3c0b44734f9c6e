package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Skew, Tables}

/** Salted-join equivalence: same rows as the plain equi-join, with the hot
  * key's probe rows spread across salt sub-partitions.
  */
class SkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-skew-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

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
