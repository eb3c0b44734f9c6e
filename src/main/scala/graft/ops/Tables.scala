package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, LongType,
  TimestampNTZType, TimestampType}

/** Loaders for the driver testdata (`TESTDATA.md`): TPC-H-ish star schema +
  * `events` stream stand-in + `documents`/`embeddings` extension tables.
  * All reads go through here so filter pushdown/column pruning apply to a
  * plain parquet scan everywhere.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Event-time columns the corpus generator has written in two flavors over
    * time: parquet TIMESTAMP(NANOS) (read as long via nanosAsLong, converted
    * to micros-precision timestamps) and plain `timestamp[us]` with no UTC
    * adjustment (read as TIMESTAMP_NTZ, which `withWatermark`/`unix_micros`
    * reject). Both normalize to TIMESTAMP here: the session TZ is pinned UTC
    * in every entrypoint, so the NTZ cast is lossless and oracle-identical.
    * Either conversion is a codegen'd projection on top of the scan —
    * pushdown/pruning still reach the parquet reader.
    */
  private val eventTimeCols: Map[String, Seq[String]] = Map("events" -> Seq("ts"))

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // every graft entrypoint sets this at session build (the conf that lets
    // the reader surface TIMESTAMP(NANOS) columns as long); this fallback
    // covers sessions built elsewhere (tests, library users) and fires only
    // when the value actually differs — never a blind mutation per read
    val nanosConf = "spark.sql.legacy.parquet.nanosAsLong"
    if (spark.conf.get(nanosConf, "false") != "true") spark.conf.set(nanosConf, "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val timed = eventTimeCols.getOrElse(name, Nil).foldLeft(df)(normalizeEventTime)
    name match {
      // drift normalization (SchemaDriftSpec locks each flavor): the corpus
      // generator has changed physical types across regenerations before
      // (events.ts three times) — documents/embeddings get the same
      // treatment PRE-EMPTIVELY so the next regeneration lands here, not at
      // the driver's correctness gate. Every cast is a no-op projection
      // when the type already matches (skipped entirely), so the canonical
      // corpus pays nothing and keeps scan-level pushdown on the id column.
      case "documents"  => normalizeIdToLong(timed, "doc_id")
      case "embeddings" =>
        normalizeFloatArray(normalizeIdToLong(timed, "vec_id"), "embedding")
      case _ => timed
    }
  }

  /** int32 id → bigint (a generator that shrinks an id column breaks joins
    * and % bucketing arithmetic downstream); identity when already long.
    */
  private def normalizeIdToLong(d: DataFrame, c: String): DataFrame =
    if (!d.schema.fieldNames.contains(c)) d
    else d.schema(c).dataType match {
      case IntegerType => d.withColumn(c, col(c).cast(LongType))
      case _           => d
    }

  /** list<float64> → array<float> (DotF32 and every ANN codepath contract
    * on float32 elements); identity when already float32.
    */
  private def normalizeFloatArray(d: DataFrame, c: String): DataFrame =
    if (!d.schema.fieldNames.contains(c)) d
    else d.schema(c).dataType match {
      case ArrayType(DoubleType, n) =>
        d.withColumn(c, col(c).cast(ArrayType(FloatType, n)))
      case _ => d
    }

  /** NTZ→TIMESTAMP / nanos-long→TIMESTAMP normalization for one column;
    * identity when the column is already a true TIMESTAMP or absent.
    */
  def normalizeEventTime(d: DataFrame, c: String): DataFrame =
    if (!d.schema.fieldNames.contains(c)) d
    else d.schema(c).dataType match {
      case LongType         => d.withColumn(c, expr(s"timestamp_micros(`$c` div 1000)"))
      case TimestampNTZType => d.withColumn(c, col(c).cast(TimestampType))
      case _                => d
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
    if (df.isStreaming) return df // micro-batch partitioning is the source's call
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Partition count without building the RDD: explicit partitionings
    // (repartition/coalesce) declare their count on the physical plan; file
    // scans report UnknownPartitioning(0), so estimate their yield from the
    // file index instead.
    val declared = df.queryExecution.executedPlan.outputPartitioning.numPartitions
    val current = if (declared > 0) declared else estimateScanPartitions(df)
    if (current < target) df.repartition(target) else df
  }

  /** Estimated partition yield of the plan's file scans, mirroring Spark's
    * split math (`FilePartition.maxSplitBytes`): each file contributes
    * `size + openCost` bytes, the split size is
    * `min(maxPartitionBytes, max(openCostInBytes, totalBytes / parallelism))`.
    * Non-file plans (local relations, DSv2) return MaxValue — assume
    * well-partitioned rather than add a speculative shuffle.
    */
  private def estimateScanPartitions(df: DataFrame): Int = {
    val spark = df.sparkSession
    val conf = spark.sessionState.conf
    val openCost = conf.filesOpenCostInBytes
    val relations = df.queryExecution.analyzed.collect {
      case l: LogicalRelation => l.relation
    }.collect { case fs: HadoopFsRelation => fs }
    if (relations.isEmpty) return Int.MaxValue
    val total = relations.map(fs =>
      fs.location.sizeInBytes + fs.location.inputFiles.length * openCost).sum
    val bytesPerCore = total / math.max(1, spark.sparkContext.defaultParallelism)
    val maxSplit = math.min(conf.filesMaxPartitionBytes, math.max(openCost, bytesPerCore))
    math.max(1, math.ceil(total.toDouble / math.max(1L, maxSplit)).toInt)
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
