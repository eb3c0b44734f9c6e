package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Source-format agnosticism (SURVEY §8.4): the engine's queries are
  * declarative Dataset programs over a schema, not over parquet — the same
  * program run against CSV and JSON stagings of a table must return
  * byte-identical results. This is the "switch the storage layer" contract
  * a user relies on when their corpus arrives as JSONL or CSV exports
  * instead of parquet, and it pins Spark's cross-format type fidelity
  * (int64 survives, strings round-trip) for the columns our surface uses.
  */
class SourceFormatSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sourceformat-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val tmpDirs = scala.collection.mutable.Buffer.empty[java.nio.file.Path]
  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix); tmpDirs += d; d.toString
  }

  override def afterAll(): Unit = {
    spark.stop()
    tmpDirs.foreach { d =>
      scala.util.Try(Files.walk(d)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => Files.deleteIfExists(p)))
    }
  }

  /** The probe program: a real multi-stage plan (filter → explode →
    * aggregate → sort) over whatever `documents` frame is handed in.
    */
  private def probe(docs: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] =
    docs.where(col("n_chars") > 0)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"), countDistinct(col("w")).as("n_types"))
      .orderBy("source")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  test("the same query returns identical results over parquet, CSV, JSON, and ORC stagings") {
    val parquetDocs = ops.Tables(spark, sfDir, "documents")
    val expected = probe(parquetDocs)
    assert(expected.nonEmpty)

    // JSON staging: schema-carrying read (JSONL is how web corpora ship)
    val jsonDir = tmp("graft-json")
    parquetDocs.write.mode("overwrite").json(jsonDir)
    val jsonDocs = spark.read.schema(parquetDocs.schema).json(jsonDir)
    assert(probe(jsonDocs) == expected, "JSON staging diverged")

    // CSV staging: quoted/escaped so free text with commas survives
    val csvDir = tmp("graft-csv")
    parquetDocs.write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true").option("escape", "\"")
      .csv(csvDir)
    val csvDocs = spark.read.schema(parquetDocs.schema)
      .option("header", "true").option("escape", "\"")
      .csv(csvDir)
    assert(probe(csvDocs) == expected, "CSV staging diverged")

    // ORC staging: the other columnar container Spark ships a native
    // vectorized reader for — same plan, same pushdown story as parquet
    val orcDir = tmp("graft-orc")
    parquetDocs.write.mode("overwrite").orc(orcDir)
    val orcDocs = spark.read.schema(parquetDocs.schema).orc(orcDir)
    assert(probe(orcDocs) == expected, "ORC staging diverged")
  }
}
