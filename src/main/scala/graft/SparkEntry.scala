package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every declared query pack (SURVEY.md §2.B). Each pack entry
  * carries its own DuckDB oracle SQL; non-SQL-expressible operators (streaming,
  * sketches) register without an oracle and get the driver's rows-only check.
  */
object SparkEntry {

  private def packs: Seq[Q] =
    RefOps.all ++ RelOps.all ++ DedupOps.all ++ TextOps.all ++ SimilarityOps.all ++
      MultimodalOps.all ++ StreamOps.all ++ FuncOps.all ++ PipelineOps.all ++
      CorpusStatsOps.all ++ LayoutOps.all ++ BehaviorOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue per region: lineitem⨝orders⨝customer⨝nation⨝region with the two
    * tiny dims broadcast — the plan shape we want at 100 TB.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li  = Tables(spark, dir, "lineitem")
    val o   = Tables(spark, dir, "orders")
    val c   = Tables(spark, dir, "customer")
    val n   = Tables(spark, dir, "nation")
    val r   = Tables(spark, dir, "region")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("r_name")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    packs.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
