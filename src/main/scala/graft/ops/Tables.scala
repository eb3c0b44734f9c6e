package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver testdata (`TESTDATA.md`): TPC-H-ish star schema +
  * `events` stream stand-in + `documents`/`embeddings` extension tables.
  * All reads go through here so filter pushdown/column pruning apply to a
  * plain parquet scan everywhere.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Columns written as parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright. Read as long via nanosAsLong, then convert to
    * micros-precision timestamps (lossless here: the generator emits no
    * sub-microsecond components). Conversion is a codegen'd projection on top
    * of the scan — pushdown/pruning still reach the parquet reader.
    */
  private val nanosCols: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    nanosCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (d.schema(c).dataType == LongType)
        d.withColumn(c, expr(s"timestamp_micros(`$c` div 1000)"))
      else d
    }
  }

  /** Decouple compute parallelism from scan parallelism for CPU-bound
    * narrow projections (per-shingle digests, codec work): when the source
    * scan yields fewer partitions than the session's parallelism — a
    * single-file or few-row-group corpus, where parquet splitting cannot go
    * below row-group granularity — redistribute rows first so the expensive
    * per-row work uses every core. At corpus scale the scan already yields
    * ≥ cores partitions and this is an identity: the shuffle only ever
    * moves a corpus small enough to be under-partitioned, never the big
    * one. Round-robin repartition, no key: the downstream work is
    * embarrassingly parallel.
    */
  def computeParallel(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}

/** One declared engine query (SURVEY.md §2.B): a Spark Dataset program plus —
  * when SQL-expressible — the equivalent DuckDB SQL for the driver's oracle.
  *
  * Canonicalization contract (SURVEY.md §7.5): every query ends in a total
  * ORDER BY; arithmetic on doubles goes through decimal(18,2) so both engines
  * aggregate exact values; derived doubles are rounded to 6 dp; column names
  * are identical on both sides (the driver sorts columns by name).
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object Q {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, Some(oracle), run)
}
