package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The PlanAudit assertions as CI: every audited query's physical plan must
  * keep its scale-critical shape (pushdown at the scan, broadcasts where a
  * side is small, TakeOrderedAndProject for top-k, equi-joins for LSH
  * buckets, custom expressions inside whole-stage codegen). A regression
  * that silently flips one of these — e.g. an LSH join degrading to a
  * nested loop — fails the suite instead of waiting for the manual audit.
  */
class PlanShapeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-planshape-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  for (name <- PlanAudit.checks.keys.toSeq.sorted) {
    test(s"$name keeps its audited plan shape") {
      val (plan, results) = PlanAudit.auditOne(spark, sfDir, name)
      val failed = results.collect { case (pat, false) => pat }
      assert(failed.isEmpty,
        s"plan lost shape(s) ${failed.mkString(", ")}:\n" +
          plan.linesIterator.take(40).mkString("\n"))
    }
  }
}
