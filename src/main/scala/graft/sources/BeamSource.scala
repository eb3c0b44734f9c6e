package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.schema.{LogicalTypeAnnotation, PrimitiveType}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for Beam topic tables — `format("beam")`
  * (SURVEY.md §4.2 `BeamSource`; the Spark-native analogue of the
  * reference's Pulsar consumer surface, ref src/broker/sse-broker.go).
  *
  * A topic is a directory of immutable append-only parquet segments (see
  * [[graft.topics.TopicTable]]). The connector exposes it as:
  *
  *  - a BATCH table: one [[InputPartition]] per segment file — scan
  *    parallelism scales with the segment count, and column pruning is
  *    pushed into the decoder (only requested fields are materialized);
  *  - a MICRO_BATCH stream: the offset is the count of segment files in
  *    NAME order, where names carry a per-topic monotone sequence assigned
  *    at registration — the listing is append-only by construction.
  *    `planInputPartitions(start, end)` is the file slice `(start, end]`,
  *    so each micro-batch reads exactly the new segments, checkpoint
  *    recovery replays deterministically from the sorted listing, and a
  *    late-registered segment always extends the next batch (it can never
  *    sort inside a committed prefix).
  *
  * Segments are decoded with parquet-mr's column-assembled [[Group]] API
  * against the FIXED BeamMessage schema — no Spark-internal reader APIs.
  * The hot analytic path (the ops package) still reads via Spark's vectorized parquet
  * source; this connector is the topic/serving surface, where batches are
  * micro-batch-sized.
  */
final class BeamSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "beam"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = BeamSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path"))
      .getOrElse(throw new IllegalArgumentException("beam source requires a path"))
    new BeamTable(path, Option(properties.get("maxSegmentsPerTrigger")).map(_.toInt),
      Option(properties.get("startingPosition")).getOrElse("earliest"))
  }
}

object BeamSource {
  /** BeamMessage wire schema (must match [[graft.topics.TopicTable.schema]]). */
  val schema: StructType = StructType(Seq(
    StructField("payload", BinaryType),
    StructField("topic", StringType),
    StructField("eventTime", TimestampType),
    StructField("publishTime", TimestampType),
    StructField("messageId", StringType),
    StructField("key", StringType),
    StructField("props", MapType(StringType, StringType))))

  /** Parse/validate a `startingPosition` option value: `earliest` (replay
    * all), `latest` (resolved to the live segment count at initialOffset
    * time), or `offset:<n>` (an explicit non-negative segment-count offset).
    * Returns None for `latest` — it is resolved lazily; callers needing a
    * pinned position pass `offset:<n>` (see BeamMicroBatchStream scaladoc).
    * Anything else throws, so typos fail fast instead of silently replaying
    * full history.
    */
  def parseStartingPosition(s: String): Option[Long] = s match {
    case "earliest" => Some(0L)
    case "latest"   => None
    case off if off.startsWith("offset:") =>
      val n = off.stripPrefix("offset:")
      val v = try n.toLong catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"beam startingPosition offset must be a long: '$s'")
      }
      if (v < 0) throw new IllegalArgumentException(
        s"beam startingPosition offset must be >= 0: '$s'")
      Some(v)
    case other =>
      throw new IllegalArgumentException(
        s"beam startingPosition must be earliest | latest | offset:<n>, got '$other'")
  }

  /** Segment listing in NAME order — the stream's offset domain. Writers
    * register segments under a per-topic monotone name sequence
    * ([[graft.topics.TopicTable.ingest]]), so the sorted listing is
    * append-only: a new segment can never sort inside a previously-listed
    * prefix (mtime ordering can — same-millisecond writes or a slow
    * writer's late visibility would skip/duplicate batches). Spark writer
    * temporaries/markers (`_*`, `.*`) are skipped; `listFiles` is
    * null-guarded against concurrent directory removal.
    */
  def listSegments(dir: String): Seq[java.io.File] = {
    val d = new java.io.File(dir)
    if (!d.isDirectory) Seq.empty
    else Option(d.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
        !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .sortBy(_.getName)
      .toSeq
  }

  /** Lower bound on `publishTime` implied by a pushed filter tree:
    * (micros, inclusive). `And` takes the tighter bound, `Or` the looser —
    * so the poll cursor's `pt > t OR (pt = t AND mid > m)` collapses to
    * `pt ≥ t`, which is exactly what segment pruning needs.
    */
  private[sources] def publishTimeLowerBound(
      f: org.apache.spark.sql.sources.Filter): Option[(Long, Boolean)] = {
    import org.apache.spark.sql.sources._
    def micros(v: Any): Option[Long] = v match {
      case t: java.sql.Timestamp  => Some(t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L)
      case i: java.time.Instant   => Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
      case _                      => None
    }
    f match {
      case GreaterThan("publishTime", v)        => micros(v).map((_, false))
      case GreaterThanOrEqual("publishTime", v) => micros(v).map((_, true))
      case EqualTo("publishTime", v)            => micros(v).map((_, true))
      case And(l, r) =>
        (publishTimeLowerBound(l), publishTimeLowerBound(r)) match {
          case (Some(a), Some(b)) => Some(if (tighter(a, b)) a else b)
          case (a, b)             => a.orElse(b)
        }
      case Or(l, r) =>
        for (a <- publishTimeLowerBound(l); b <- publishTimeLowerBound(r))
          yield if (tighter(a, b)) b else a
      case _ => None
    }
  }

  /** a strictly prunes more than b. */
  private[sources] def tighter(a: (Long, Boolean), b: (Long, Boolean)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && !a._2 && b._2)

  /** Per-segment footer summary: total row count, and publishTime min/max
    * (micros) when every block carries usable INT64 statistics (INT96
    * legacy stats or a missing column yield None — callers must treat
    * unknown bounds conservatively).
    */
  final case class SegmentStats(rows: Long, minPt: Option[Long], maxPt: Option[Long])

  private val statsCache =
    scala.collection.concurrent.TrieMap.empty[(String, Long, Long), Option[SegmentStats]]

  /** Footer stats for a segment, read once per (path, mtime, size) on the
    * driver and cached; None when the footer itself is unreadable.
    */
  def segmentStats(file: java.io.File): Option[SegmentStats] =
    statsCache.getOrElseUpdate((file.getAbsolutePath, file.lastModified(), file.length()), {
      try {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new Path(file.getAbsolutePath), new Configuration())
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val blocks = reader.getFooter.getBlocks.asScala
          val rows   = blocks.map(_.getRowCount).sum
          val ptStats = blocks.flatMap { b =>
            b.getColumns.asScala
              .find(_.getPath.toDotString == "publishTime")
              .filter(c => c.getPrimitiveType.getPrimitiveTypeName ==
                PrimitiveType.PrimitiveTypeName.INT64)
              .flatMap(c => Option(c.getStatistics))
              .filter(s => !s.isEmpty && s.hasNonNullValue)
              .map(s => (s.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                s.genericGetMax.asInstanceOf[java.lang.Long].longValue()))
          }
          val (mn, mx) =
            if (ptStats.isEmpty || ptStats.size != blocks.size) (None, None)
            else (Some(ptStats.map(_._1).min), Some(ptStats.map(_._2).max))
          Some(SegmentStats(rows, mn, mx))
        } finally reader.close()
      } catch { case _: Exception => None } // unreadable footer → never prune
    })

  /** Max publishTime (micros) recorded in the segment's parquet footer, or
    * None when unavailable (INT96 legacy stats, missing column).
    */
  def maxPublishTimeMicros(file: java.io.File): Option[Long] =
    segmentStats(file).flatMap(_.maxPt)

  /** Shortest prefix of `segments` whose KNOWN footer row counts reach
    * `limit` — the segment set a pushed LIMIT needs to open. Conservative:
    * a segment with an unreadable footer contributes 0 to the running
    * count (it stays in the prefix, and the prefix keeps growing until
    * known rows alone cover the limit), so an unknown can only ADD
    * segments, never starve the limit.
    */
  private[sources] def limitPrefix(segments: Seq[java.io.File],
      limit: Option[Int]): Seq[java.io.File] = limit match {
    case None => segments
    case Some(n) =>
      var known = 0L
      val it = segments.iterator
      val out = Seq.newBuilder[java.io.File]
      while (it.hasNext && known < n) {
        val f = it.next()
        out += f
        known += segmentStats(f).map(_.rows).getOrElse(0L)
      }
      out.result()
  }
}

final class BeamTable(path: String, maxSegmentsPerTrigger: Option[Int] = None,
    startingPosition: String = "earliest")
    extends Table with SupportsRead {
  override def name(): String = s"beam:$path"
  override def schema(): StructType = BeamSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxSeg = Option(options.get("maxSegmentsPerTrigger")).map(_.toInt)
      .orElse(maxSegmentsPerTrigger)
    val startPos = Option(options.get("startingPosition")).getOrElse(startingPosition)
    // Validate HERE, on the driver, at option-parse time: a malformed value
    // would otherwise surface as an async NumberFormatException on the
    // MicroBatchExecution thread (query dies after start() returned), and a
    // typo like "Latest" would silently fall back to a full-history replay.
    BeamSource.parseStartingPosition(startPos)
    new BeamScanBuilder(path, maxSeg, startPos)
  }
}

final class BeamScanBuilder(path: String, maxSegmentsPerTrigger: Option[Int] = None,
    startingPosition: String = "earliest")
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownLimit
    with SupportsPushDownAggregates {
  private var required: StructType = BeamSource.schema
  private var bound: Option[(Long, Boolean)] = None
  private var pruning: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  private var limit: Option[Int] = None
  private var footerCount: Option[Long] = None

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** All filters stay residual (Spark re-evaluates them — stats pruning is
    * conservative); the conjunction's tightest publishTime lower bound
    * drives segment skipping.
    */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    val bounds = filters.flatMap(BeamSource.publishTimeLowerBound(_).toSeq)
    bound = bounds.reduceOption((a, b) => if (BeamSource.tighter(a, b)) a else b)
    pruning = filters.filter(BeamSource.publishTimeLowerBound(_).isDefined)
    filters
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pruning

  /** LIMIT n bounds the scan to a footer-row-count-covering segment PREFIX
    * (the pollBatch trick, surfaced at the DSv2 level): Spark only calls
    * this when the limit sits directly on the scan, so any n rows satisfy
    * it and a name-sorted prefix whose known row counts reach n is enough.
    * Partial push — Spark still applies the exact LIMIT above the scan; we
    * only avoid opening segments that cannot be needed.
    */
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def isPartiallyPushed(): Boolean = true

  /** Global COUNT(*) is answered from parquet footer row counts alone —
    * zero data pages read, however deep the topic. Pushed COMPLETELY, and
    * only when it is exact: no grouping, no other aggregate, no pushed
    * bound/limit (Spark only attempts the push on a bare scan anyway —
    * our filters stay residual, which blocks aggregate pushdown under any
    * Filter node), and every segment footer readable (one unreadable
    * footer → refuse, Spark falls back to the counting scan). The count
    * snapshots the segment listing at planning time — the same moment
    * every other read of this immutable-segment table binds to.
    */
  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    footerCount.isDefined || tryPushCount(agg)

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    tryPushCount(agg)

  private def tryPushCount(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    val shapeOk = agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0)
        .isInstanceOf[org.apache.spark.sql.connector.expressions.aggregate.CountStar] &&
      bound.isEmpty && limit.isEmpty
    if (!shapeOk) return false
    val stats = BeamSource.listSegments(path).map(BeamSource.segmentStats)
    if (stats.exists(_.isEmpty)) return false
    footerCount = Some(stats.flatten.map(_.rows).sum)
    required = new StructType().add("count", LongType, nullable = false)
    true
  }

  override def build(): Scan =
    new BeamScan(path, required, bound, maxSegmentsPerTrigger, startingPosition, limit,
      footerCount)
}

final class BeamScan(path: String, required: StructType,
    bound: Option[(Long, Boolean)],
    maxSegmentsPerTrigger: Option[Int] = None,
    startingPosition: String = "earliest",
    limit: Option[Int] = None,
    footerCount: Option[Long] = None) extends Scan with SupportsReportStatistics {

  /** Size estimate = bytes of the surviving (post-pruning) segments —
    * lets Catalyst auto-broadcast a small topic table into a join.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = BeamSource.listSegments(path).filter(mayMatch).map(_.length()).sum
    override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong = java.util.OptionalLong.empty()
  }
  override def readSchema(): StructType = required
  override def description(): String =
    s"BeamScan path=$path, ReadSchema: ${required.simpleString}" +
      bound.map { case (v, incl) => s", PublishTimeBound: ${if (incl) ">=" else ">"} $v" }
        .getOrElse("") +
      limit.map(n => s", PushedLimit: $n").getOrElse("") +
      footerCount.map(c => s", PushedAggregate: count(*)=$c").getOrElse("")

  /** A segment can satisfy a publishTime lower bound only if its footer max
    * reaches it; unknown stats never prune (INT96 legacy, missing footer).
    */
  private def mayMatch(f: java.io.File): Boolean = bound match {
    case None => true
    case Some((v, inclusive)) =>
      BeamSource.maxPublishTimeMicros(f) match {
        case None      => true
        case Some(max) => if (inclusive) max >= v else max > v
      }
  }

  override def toBatch: Batch = footerCount match {
    case Some(c) => new Batch {
      // the answer was computed from footers at pushdown time: one
      // partition, one row, no segment opened
      override def planInputPartitions(): Array[InputPartition] =
        Array(BeamCountPartition(c))
      override def createReaderFactory(): PartitionReaderFactory =
        new BeamCountReaderFactory
    }
    case None => new Batch {
      override def planInputPartitions(): Array[InputPartition] =
        BeamSource.limitPrefix(BeamSource.listSegments(path).filter(mayMatch), limit)
          .map(f => BeamInputPartition(f.getAbsolutePath)).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new BeamReaderFactory(required)
    }
  }

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BeamMicroBatchStream(path, required, maxSegmentsPerTrigger, startingPosition)
}

final case class BeamInputPartition(file: String) extends InputPartition

/** Carrier for a completely-pushed COUNT(*): the value travels in the
  * partition; the reader just emits it.
  */
final case class BeamCountPartition(count: Long) extends InputPartition

final class BeamCountReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val c = partition.asInstanceOf[BeamCountPartition].count
      private var emitted = false
      override def next(): Boolean = if (emitted) false else { emitted = true; true }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](c))
      override def close(): Unit = ()
    }
}

final case class BeamOffset(count: Long) extends Offset {
  override def json(): String = s"""{"count":$count}"""
}

/** Offset = prefix length of the name-sorted segment list (names are
  * sequence-registered, so the listing is append-only). Immutable segments
  * + monotone listing ⇒ deterministic replay on checkpoint recovery (the
  * same prefix always names the same files).
  *
  * Admission control: `maxSegmentsPerTrigger` caps how many new segments a
  * micro-batch admits, so a week-long backlog drains in bounded batches
  * instead of one giant first batch (the FileStreamSource
  * `maxFilesPerTrigger` contract).
  */
final class BeamMicroBatchStream(path: String, required: StructType,
    maxSegmentsPerTrigger: Option[Int] = None,
    startingPosition: String = "earliest")
    extends MicroBatchStream with SupportsAdmissionControl {

  /** `startingPosition=latest` subscribes at the current end of the topic
    * (the kafka-style `startingOffsets` contract); `offset:<n>` starts at an
    * EXPLICIT segment-count offset the caller captured synchronously before
    * `query.start()` — `latest` resolves here, on the stream's execution
    * thread, AFTER start() returns, so a caller that snapshots any state
    * between start() and this resolution (the SSE hub's subscriber
    * high-water mark) must pin the start position itself or a segment
    * registered in that window is silently skipped. The default replays
    * from the beginning. Only consulted on a FRESH checkpoint — recovery
    * always resumes from the committed offset.
    */
  override def initialOffset(): Offset =
    BeamSource.parseStartingPosition(startingPosition) match {
      case Some(n) => BeamOffset(n)
      case None    => BeamOffset(BeamSource.listSegments(path).size.toLong)
    }

  override def latestOffset(): Offset = BeamOffset(BeamSource.listSegments(path).size.toLong)

  override def getDefaultReadLimit: ReadLimit =
    maxSegmentsPerTrigger.map(n => ReadLimit.maxFiles(n)).getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val total = BeamSource.listSegments(path).size.toLong
    val s     = start.asInstanceOf[BeamOffset].count
    limit match {
      case mf: ReadMaxFiles => BeamOffset(math.min(total, s + mf.maxFiles()))
      case _                => BeamOffset(total)
    }
  }

  override def deserializeOffset(json: String): Offset =
    BeamOffset(""""count"\s*:\s*(\d+)""".r.findFirstMatchIn(json)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(s"bad beam offset: $json")))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BeamOffset].count.toInt
    val e = end.asInstanceOf[BeamOffset].count.toInt
    BeamSource.listSegments(path).slice(s, e).map(f => BeamInputPartition(f.getAbsolutePath)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new BeamReaderFactory(required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final class BeamReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new BeamPartitionReader(partition.asInstanceOf[BeamInputPartition].file, required)
}

/** Decodes one parquet segment to InternalRows for the pruned schema.
  * Timestamps accept INT96 (legacy Spark default) and INT64
  * MICROS/MILLIS/NANOS annotations, so segments written under any
  * `spark.sql.parquet.outputTimestampType` read back identically.
  */
final class BeamPartitionReader(file: String, required: StructType)
    extends PartitionReader[InternalRow] {

  private val reader: ParquetReader[Group] = {
    val conf = new Configuration()
    // True projection: hand the pruned schema to parquet-mr so unrequested
    // columns are never decoded (not just dropped after assembly).
    if (required.length < BeamSource.schema.length) {
      val want = required.fieldNames.toSet
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(new Path(file), conf)
      val fr = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      val fileSchema =
        try fr.getFooter.getFileMetaData.getSchema finally fr.close()
      val projected = new org.apache.parquet.schema.MessageType(fileSchema.getName,
        fileSchema.getFields.asScala.filter(f => want(f.getName)).asJava)
      conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
        projected.toString)
    }
    ParquetReader.builder(new GroupReadSupport(), new Path(file))
      .withConf(conf)
      .build()
  }

  private var current: Group = _

  override def next(): Boolean = { current = reader.read(); current != null }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(required.length)
    var i = 0
    while (i < required.length) {
      row.update(i, readField(current, required(i)))
      i += 1
    }
    row
  }

  private def present(g: Group, name: String): Boolean =
    g.getType.containsField(name) && g.getFieldRepetitionCount(name) > 0

  private def readField(g: Group, f: StructField): Any =
    if (!present(g, f.name)) null
    else f.dataType match {
      case BinaryType    => g.getBinary(f.name, 0).getBytes
      case StringType    => UTF8String.fromBytes(g.getBinary(f.name, 0).getBytes)
      case TimestampType => readTimestampMicros(g, f.name)
      case MapType(StringType, StringType, _) =>
        val kv = g.getGroup(f.name, 0)
        val n  = if (kv.getType.containsField("key_value")) kv.getFieldRepetitionCount("key_value") else 0
        val keys = new Array[AnyRef](n)
        val vals = new Array[AnyRef](n)
        var j = 0
        while (j < n) {
          val entry = kv.getGroup("key_value", j)
          keys(j) = UTF8String.fromBytes(entry.getBinary("key", 0).getBytes)
          vals(j) =
            if (entry.getFieldRepetitionCount("value") > 0)
              UTF8String.fromBytes(entry.getBinary("value", 0).getBytes)
            else null
          j += 1
        }
        ArrayBasedMapData(keys, vals)
      case other => throw new UnsupportedOperationException(s"beam field type $other")
    }

  private def readTimestampMicros(g: Group, name: String): java.lang.Long = {
    val prim = g.getType.getType(name).asPrimitiveType()
    prim.getPrimitiveTypeName match {
      case PrimitiveType.PrimitiveTypeName.INT96 =>
        // 8 bytes nanos-of-day (LE) + 4 bytes julian day (LE), UTC-normalized
        val bytes = g.getInt96(name, 0).getBytes
        val buf   = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val nanosOfDay = buf.getLong
        val julianDay  = buf.getInt
        (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
      case PrimitiveType.PrimitiveTypeName.INT64 =>
        val v = g.getLong(name, 0)
        prim.getLogicalTypeAnnotation match {
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            ts.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MILLIS => v * 1000L
              case LogicalTypeAnnotation.TimeUnit.MICROS => v
              case LogicalTypeAnnotation.TimeUnit.NANOS  => v / 1000L
            }
          case _ => v // unannotated int64: assume micros
        }
      case other =>
        throw new UnsupportedOperationException(s"beam timestamp physical type $other")
    }
  }

  override def close(): Unit = reader.close()
}
