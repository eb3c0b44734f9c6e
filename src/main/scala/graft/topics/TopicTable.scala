package graft.topics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Keys

/** Directory-backed topic tables: the engine's stand-in for Pulsar topics
  * (SURVEY.md §7.1 `topics/`; ref capabilities #1/#5 README.md:14,18).
  *
  * A topic is a directory of append-only parquet segments with the
  * [[graft.model.BeamMessage]] schema (§1.4). Batch reads, bounded polls
  * (O-6), and file-source `readStream` (O-8) all go through here, so Spark's
  * native parquet DSv2 path (vectorized reader, pushdown, partition listing)
  * serves every consumer. Writes hash-partition naturally: each executor
  * task appends its own segment file — no coordination, no driver data path.
  *
  * In the zero-egress sandbox the `pulsar://` URL from configs is honored as
  * an identity but served locally (SURVEY.md §4.2 BeamSource note).
  */
final class TopicTable(spark: SparkSession, baseDir: String) {

  /** The owning session — the serve layer's metrics listener attaches here. */
  private[graft] def session: SparkSession = spark

  /** Topic directory: sha1 of the full name keeps paths safe (O-21 reuse). */
  private def dir(topicFn: String): String = s"$baseDir/${Keys.sha1Hex(topicFn)}"

  val schema: StructType = graft.sources.BeamSource.schema

  // Segments carry INT64-micros timestamps (not legacy INT96) so parquet
  // footer min/max statistics on publishTime are usable — the beam source
  // prunes whole segments under a poll cursor's bound. Parquet exposes no
  // per-write option for this, only the session conf; set it ONCE here
  // rather than on every ingest (a per-ingest set is racy against
  // concurrent writers expecting the prior value).
  spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")

  /** Ingest (O-1/O-4): stamp eventTime=now, a `PulsarBeamId` uuid property,
    * publishTime, and a per-row messageId, then append. `async` mirrors
    * O-5: fire-and-forget keeps default commit semantics; sync forces the
    * write to complete before returning (both are synchronous under local
    * parquet — the flag is the API contract, ref pulsar-producer.go:95-105).
    */
  def ingest(df: DataFrame, topicFn: String, async: Boolean = true): Unit =
    // The WHOLE ingest (stamp → write → register) serializes on a JVM-global
    // per-(baseDir, topic) lock, and publishTime is a monotone per-topic
    // stamp assigned under it — not a free-running current_timestamp().
    // Without this, two concurrent ingests can commit segments whose
    // registration order INVERTS their publishTime order (writer A stamps
    // T+5 but registers after writer B's T+3); every (publishTime,
    // messageId) cursor in the engine would then advance past the late
    // segment and silently never deliver it. One writer per topic at a
    // time mirrors the reference's model (exactly one broker owns a Pulsar
    // topic); cross-PROCESS writers keep loss-safety (the link claim in
    // registerSegments) but ordering across processes is the deployment's
    // responsibility, as it is for the reference.
    TopicTable.ingestLock(canonicalBase, topicFn).synchronized {
      val stampMicros = TopicTable.nextStampMicros(canonicalBase, topicFn)
      val out = df
        .withColumn("topic", lit(topicFn))
        .withColumn("eventTime", coalesce(col("eventTime"), current_timestamp()))
        .withColumn("publishTime", timestamp_micros(lit(stampMicros)))
        .withColumn("messageId",
          // Zero-padded components: every cursor/watermark in the engine
          // (pollBatch, durable cursors, SSE splice) totally orders messages
          // by (publishTime, messageId) with STRING comparison on the id, so
          // string order must equal numeric order — unpadded '10:...' would
          // sort below '9:...' within one multi-row ingest and be skipped
          // past by an already-persisted cursor.
          format_string("%013d:%010d:%020d", lit(stampMicros / 1000L),
            spark_partition_id(), monotonically_increasing_id()))
        .withColumn("key", coalesce(col("key"), lit("")))
        .withColumn("props",
          map_concat(coalesce(col("props"), map()), map(lit("PulsarBeamId"), expr("uuid()"))))
        .select("payload", "topic", "eventTime", "publishTime", "messageId", "key", "props")
      // Stage, then register under a per-topic monotone sequence: the beam
      // stream's offset is a prefix of the NAME-sorted listing, so a segment
      // must never become visible with a name that sorts inside an
      // already-committed prefix (same-millisecond mtimes or slow writers
      // would otherwise skip/duplicate batches). Names are assigned and moved
      // under the topic's lock, in ascending order — readers only ever see an
      // append-only listing.
      val staging = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(baseDir), ".staging-")
      try {
        out.write.mode("overwrite").parquet(staging.toString)
        registerSegments(topicFn, staging.toFile)
      } finally {
        staging.toFile.listFiles().foreach(_.delete())
        java.nio.file.Files.deleteIfExists(staging)
      }
    }

  private def canonicalBase: String =
    java.nio.file.Paths.get(baseDir).toAbsolutePath.normalize.toString

  private val SeqName = """^(\d{20})-.*""".r

  private def registerSegments(topicFn: String, staging: java.io.File): Unit = {
    val d = new java.io.File(dir(topicFn))
    d.mkdirs()
    // JVM-global sequence shared by every TopicTable over this baseDir —
    // in-process twin instances allocate from one counter (no collisions);
    // the link claim below still guards against other PROCESSES.
    val seq = TopicTable.seq(canonicalBase, topicFn, {
      val existing = Option(d.listFiles()).getOrElse(Array.empty)
        .flatMap(f => f.getName match { case SeqName(n) => Some(n.toLong); case _ => None })
      if (existing.isEmpty) 0L else existing.max
    })
    seq.synchronized {
      staging.listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
        .sortBy(_.getName)
        .foreach { f =>
          // Publish via an atomic hard-link claim, not ATOMIC_MOVE: POSIX
          // rename silently REPLACES an existing target, so two TopicTable
          // instances over one baseDir whose counters collide would lose a
          // committed segment. link(2) fails with EEXIST instead — on a
          // collision the counter is re-synced from the directory listing
          // and the claim retried under the next free sequence number. The
          // staged file is complete before the link, so readers only ever
          // see fully-formed segments, and the listing stays append-only.
          var assigned = false
          while (!assigned) {
            val n = seq.incrementAndGet()
            val target = new java.io.File(d, f"$n%020d-${f.getName}").toPath
            try {
              java.nio.file.Files.createLink(target, f.toPath)
              java.nio.file.Files.delete(f.toPath)
              assigned = true
            } catch {
              case _: java.nio.file.FileAlreadyExistsException =>
                val taken = Option(d.listFiles()).getOrElse(Array.empty)
                  .flatMap(s => s.getName match { case SeqName(m) => Some(m.toLong); case _ => None })
                if (taken.nonEmpty) seq.updateAndGet(cur => math.max(cur, taken.max))
                ()
            }
          }
        }
    }
  }

  /** Ingest raw payload bytes (the HTTP POST body path, O-1). `async`
    * follows the route's `?mode=async` (O-5, ref handlers.go:131 — default
    * is synchronous send).
    */
  def ingestPayload(payload: Array[Byte], topicFn: String,
      props: Map[String, String] = Map.empty, async: Boolean = false): Unit = {
    import spark.implicits._
    val df = Seq((payload, Option.empty[java.sql.Timestamp], Option.empty[String], props))
      .toDF("payload", "eventTime", "key", "props")
    ingest(df, topicFn, async)
  }

  def exists(topicFn: String): Boolean =
    new java.io.File(dir(topicFn)).exists()

  /** Current end of the topic in the beam stream's offset domain (count of
    * committed segments). Captured SYNCHRONOUSLY by callers that need a
    * fixed stream start position (`readStream(startingPosition=
    * "offset:<n>")`) — `latest` resolves its initial offset lazily on the
    * stream thread, so a segment registered between `query.start()` and
    * that resolution would be silently skipped.
    */
  def endOffset(topicFn: String): Long =
    graft.sources.BeamSource.listSegments(dir(topicFn)).size.toLong

  /** Batch scan over everything published so far, through the DSv2
    * connector (`format("beam")`, SURVEY.md §4.2): one partition per
    * segment, pruned columns pushed into the decode.
    */
  def read(topicFn: String): DataFrame = {
    recoverCompaction(topicFn)
    if (exists(topicFn)) spark.read.format("beam").load(dir(topicFn))
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Bounded peek (O-6): earliest-position arrival order, capped batch —
    * Catalyst plans TakeOrderedAndProject (no global sort at scale). Read
    * only; consumption semantics live in [[pollBatch]].
    */
  def poll(topicFn: String, limit: Int = 10): DataFrame =
    read(topicFn).orderBy("publishTime", "messageId").limit(limit)

  /** Per-(topic, subscription) consumption position: the (publishTime,
    * messageId) of the last delivered message. Mirrors the reference's
    * ack-on-receive in `PollBatchMessages` (ref src/broker/sse-broker.go:34-61
    * — every delivered message is acked, so the subscription advances).
    * An absent entry = a new subscription at the earliest position (poll
    * always subscribes earliest, ref src/route/handlers.go:166).
    *
    * DURABLE like a broker subscription: each advance writes the cursor
    * to `<topicDir>/.cursors/<sha1(sub)>` (one tiny file per named
    * subscription), and a fresh TopicTable over the same baseDir resumes
    * from it — acked messages are not re-delivered across restarts.
    * Non-resumable subscriptions never persist.
    */
  private val cursors =
    scala.collection.concurrent.TrieMap.empty[(String, String), (java.sql.Timestamp, String)]

  private def cursorFile(topicFn: String, sub: String): java.io.File =
    new java.io.File(s"${dir(topicFn)}/.cursors/${Keys.sha1Hex(sub)}")

  private def loadCursor(topicFn: String, sub: String): Option[(java.sql.Timestamp, String)] = {
    val f = cursorFile(topicFn, sub)
    if (!f.isFile) None
    else scala.util.Try {
      val Array(micros, mid) =
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8").trim.split("\t", 2)
      val ts = new java.sql.Timestamp(micros.toLong / 1000L)
      ts.setNanos(((micros.toLong % 1000000L) * 1000L).toInt)
      (ts, mid)
    }.toOption
  }

  private def saveCursor(topicFn: String, sub: String, pos: (java.sql.Timestamp, String)): Unit = {
    val f = cursorFile(topicFn, sub)
    f.getParentFile.mkdirs()
    val micros = TopicTable.micros(pos._1)
    // write-then-ATOMIC_MOVE (same pattern as registerSegments): a crash
    // mid-write must not leave a torn cursor that silently resets the
    // subscription to earliest and re-delivers acked history
    val tmp = java.nio.file.Files.createTempFile(f.getParentFile.toPath, ".cursor-", ".tmp")
    java.nio.file.Files.write(tmp, s"$micros\t${pos._2}\n".getBytes("UTF-8"))
    java.nio.file.Files.move(tmp, f.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  // Concurrent polls on one subscription serialize (a Pulsar consumer's
  // receive loop is serial per subscription) — otherwise two polls could
  // read the same cursor and double-deliver a batch. Non-resumable names
  // are a fresh UUID per request (no contention possible), so they get a
  // throwaway monitor instead of leaking one map entry per poll.
  private val locks = scala.collection.concurrent.TrieMap.empty[(String, String), Object]

  private def pollLock(topicFn: String, subscription: String): Object =
    if (subscription.startsWith(graft.model.ConsumerParams.NonResumablePrefix)) new Object
    else locks.getOrElseUpdate((topicFn, subscription), new Object)

  /** Destructive poll (O-6/O-7 + O-12 ack): deliver the next `limit`
    * messages after the subscription's cursor and advance it — poll #2
    * returns the NEXT batch, and an exhausted topic returns an empty batch
    * (the route's 204). A subscription named with the non-resumable prefix
    * is dropped after the poll (ref `consumer.Unsubscribe()` for
    * `model.NonResumable`, src/broker/sse-broker.go:40-42), so the next poll
    * under that name restarts from earliest.
    *
    * Scan cost is bounded on BOTH ends: [[TopicTable.pollFiles]] selects,
    * from driver-cached parquet footers, the minimal name-order segment
    * prefix that can satisfy the limit past the cursor — so a poll reads
    * O(limit) rows even over a week-deep backlog — and the cursor
    * predicate + TakeOrderedAndProject cap what the scan of that prefix
    * materializes. The selected files are read through Spark's vectorized
    * parquet source with the fixed beam schema.
    */
  def pollBatch(topicFn: String, subscription: String, limit: Int = 10)
      : Array[org.apache.spark.sql.Row] = pollLock(topicFn, subscription).synchronized {
    recoverCompaction(topicFn)
    val key        = (topicFn, subscription)
    val resumable  = !subscription.startsWith(graft.model.ConsumerParams.NonResumablePrefix)
    val cursor = cursors.get(key)
      .orElse(if (resumable) loadCursor(topicFn, subscription) else None)
    val cursorMicros = cursor.map { case (t, _) => TopicTable.micros(t) }
    val files = TopicTable.pollFiles(
      graft.sources.BeamSource.listSegments(dir(topicFn)), cursorMicros, limit)
    val base =
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(files.map(_.getAbsolutePath): _*)
    val fresh = cursor match {
      case None => base
      case Some((t, m)) =>
        base.where(col("publishTime") > t ||
          (col("publishTime") === t && col("messageId") > m))
    }
    val rows = fresh.orderBy("publishTime", "messageId").limit(limit).collect()
    rows.lastOption.foreach { r =>
      val pos = (r.getAs[java.sql.Timestamp]("publishTime"), r.getAs[String]("messageId"))
      if (resumable) saveCursor(topicFn, subscription, pos)
      cursors.put(key, pos)
      ()
    }
    if (!resumable) cursors.remove(key)
    rows
  }

  /** Segment compaction — the small-file maintenance pass (each ingest
    * writes its own segment, so a chatty producer accumulates thousands of
    * tiny files; merging restores scan efficiency and listing cost).
    * Merges all committed segments into ONE, sorted by (publishTime,
    * messageId), registered under the next sequence name; the old segments
    * are then deleted. Returns the number of segments removed.
    *
    * Contract (mirrors an offline OPTIMIZE, like Pulsar's broker-side
    * topic compaction this is an administrative pass, not a query):
    *
    *  - Message VALUES are untouched, so poll cursors — which are
    *    (publishTime, messageId) positions, not file references — remain
    *    exactly valid: a half-drained subscription resumes at the same
    *    message after compaction (spec-asserted).
    *  - The beam stream's offset domain (segment-listing prefix counts)
    *    is rebuilt, so ACTIVE streaming checkpoints are invalidated —
    *    run compaction only with no live readers of this topic and
    *    restart streams on fresh checkpoints after. Ingest is excluded
    *    by the topic's ingest lock for the whole pass.
    *  - The merged history is written as one segment via a single-task
    *    sort — fine for a maintenance window; a huge topic would use
    *    size-binned merge groups (the x29 packing shape) instead of one
    *    file. Readers that list MID-COMPACTION (between the merged
    *    segment's link and the old files' deletion) would double-count —
    *    the no-live-readers requirement covers this window too.
    */
  def compactTopic(topicFn: String): Int =
    TopicTable.ingestLock(canonicalBase, topicFn).synchronized {
      recoverCompaction(topicFn)
      val segs = graft.sources.BeamSource.listSegments(dir(topicFn))
      if (segs.size <= 1) 0
      else {
        val merged = spark.read.schema(schema).parquet(segs.map(_.getAbsolutePath): _*)
          .repartition(1)
          .sortWithinPartitions("publishTime", "messageId")
        val staging = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get(baseDir), ".compact-")
        try {
          merged.write.mode("overwrite").parquet(staging.toString)
          val staged = staging.toFile.listFiles()
            .filter(f => f.isFile && f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
            .head
          // Crash-safe commit: claim the target name, write a manifest
          // (target + victims), THEN link and delete. Recovery replays from
          // the manifest: target present → finish the deletes; target
          // absent → abandon (old segments intact). Either way the topic is
          // never left doubled after recoverCompaction runs.
          val d = new java.io.File(dir(topicFn))
          // same listing-derived init as registerSegments: a 0L init here
          // would poison the SHARED per-topic counter when compaction runs
          // first in a process — a later ingest would then link a segment
          // whose name sorts inside the committed prefix
          val seq = TopicTable.seq(canonicalBase, topicFn, {
            val existing = Option(d.listFiles()).getOrElse(Array.empty)
              .flatMap(f => f.getName match { case SeqName(n) => Some(n.toLong); case _ => None })
            if (existing.isEmpty) 0L else existing.max
          })
          var target: java.io.File = null
          seq.synchronized {
            while (target == null) {
              val n   = seq.incrementAndGet()
              val cand = new java.io.File(d, f"$n%020d-${staged.getName}")
              if (!cand.exists()) target = cand
            }
          }
          val manifest = manifestFile(topicFn)
          val body = (target.getName +: segs.map(_.getName)).mkString("\n")
          val tmp  = java.nio.file.Files.createTempFile(d.toPath, ".manifest-", ".tmp")
          java.nio.file.Files.write(tmp, body.getBytes("UTF-8"))
          java.nio.file.Files.move(tmp, manifest.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          java.nio.file.Files.createLink(target.toPath, staged.toPath)
          segs.foreach(f => java.nio.file.Files.deleteIfExists(f.toPath))
          java.nio.file.Files.deleteIfExists(manifest.toPath)
          segs.size
        } finally {
          staging.toFile.listFiles().foreach(_.delete())
          java.nio.file.Files.deleteIfExists(staging)
        }
      }
    }

  /** Time-based retention — the analog of Pulsar's broker-side topic TTL /
    * retention policy the reference relies on (its topics age out on the
    * broker; `config/pulsar_beam.yml` carries no knob because Pulsar owns
    * it). Expires every segment whose max publishTime (parquet footer
    * stats) is older than `retentionMs` before `nowMicros`, REPLACING the
    * file with an empty same-name, same-schema segment via an atomic move
    * rather than deleting the name.
    *
    * Why placeholders and not deletion: the beam stream's offset domain is
    * PREFIX COUNTS of the name-sorted segment listing — removing a name
    * would shift every position behind it and break live checkpoints.
    * Keeping the name keeps the domain, so unlike [[compactTopic]] this is
    * safe with live readers:
    *
    *  - poll cursors are (publishTime, messageId) positions: a cursor in
    *    the retained region is untouched; expired messages simply stop
    *    surfacing (they were behind every live cursor anyway).
    *  - streaming checkpoints resume exactly — an expired prefix position
    *    now reads as 0 rows; new segments keep appending behind the same
    *    monotone name sequence.
    *  - each replacement is individually atomic and idempotent (a crash
    *    mid-pass leaves some segments expired, none doubled or lost; the
    *    next pass finishes), so no manifest is needed.
    *  - the listing's LENGTH is not reduced — reclaiming the name count is
    *    [[compactTopic]]'s job in a no-live-readers maintenance window.
    *
    * Segments with unreadable/absent footer bounds are never expired
    * (conservative). Returns the number of segments expired this pass.
    */
  def expireTopic(topicFn: String, retentionMs: Long,
      nowMicros: Long = System.currentTimeMillis() * 1000L): Int =
    TopicTable.ingestLock(canonicalBase, topicFn).synchronized {
      recoverCompaction(topicFn)
      val cutoffMicros = nowMicros - retentionMs * 1000L
      val victims = graft.sources.BeamSource.listSegments(dir(topicFn)).filter { f =>
        graft.sources.BeamSource.segmentStats(f)
          .exists(st => st.rows > 0 && st.maxPt.exists(_ < cutoffMicros))
      }
      if (victims.isEmpty) 0
      else {
        // one empty schema-only segment staged once, copied over each victim
        val staging = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get(baseDir), ".expire-")
        try {
          spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
            .repartition(1).write.mode("overwrite").parquet(staging.toString)
          val empty = staging.toFile.listFiles()
            .filter(f => f.isFile && f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
            .head
          victims.foreach { v =>
            val tmp = java.nio.file.Files.createTempFile(
              v.getParentFile.toPath, ".expire-", ".tmp")
            java.nio.file.Files.copy(empty.toPath, tmp,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            java.nio.file.Files.move(tmp, v.toPath,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          }
          victims.size
        } finally {
          staging.toFile.listFiles().foreach(_.delete())
          java.nio.file.Files.deleteIfExists(staging)
        }
      }
    }

  private def manifestFile(topicFn: String): java.io.File =
    new java.io.File(dir(topicFn), ".compact-manifest")

  /** Replay a compaction interrupted mid-commit (see [[compactTopic]]).
    * Cheap no-op (one isFile check) when no manifest exists; called before
    * every read-path entry so a crashed compaction can never serve doubled
    * history. Serializes on the topic's ingest lock: an unsynchronized
    * recover racing a LIVE compaction could delete its manifest between
    * the manifest write and the link (voiding crash safety), and two
    * concurrent recovers could throw on the vanished manifest. The
    * re-check inside the lock handles both; a manifest vanishing between
    * the fast-path check and the lock is a completed recovery, not an
    * error.
    */
  private def recoverCompaction(topicFn: String): Unit =
    if (manifestFile(topicFn).isFile) // fast path; re-checked under the lock
      TopicTable.ingestLock(canonicalBase, topicFn).synchronized {
        val manifest = manifestFile(topicFn)
        if (manifest.isFile) {
          val d = new java.io.File(dir(topicFn))
          val lines = new String(
            java.nio.file.Files.readAllBytes(manifest.toPath), "UTF-8").split("\n").toSeq
          val target  = new java.io.File(d, lines.head)
          val victims = lines.tail
          if (target.isFile) // commit happened: finish the victim deletes
            victims.foreach(v =>
              java.nio.file.Files.deleteIfExists(new java.io.File(d, v).toPath))
          // else: link never happened — old segments are intact, just abandon
          java.nio.file.Files.deleteIfExists(manifest.toPath)
          ()
        }
      }

  /** Continuous subscription (O-8): micro-batch file stream. The
    * subscription's identity (exclusive-by-name, O-9) is the caller's
    * checkpoint location.
    */
  def readStream(topicFn: String, startingPosition: String = "earliest",
      maxSegmentsPerTrigger: Option[Int] = None): DataFrame = {
    val d = new java.io.File(dir(topicFn))
    if (!d.exists()) d.mkdirs() // subscribe-before-publish is legal (latest position)
    val reader = spark.readStream.format("beam")
      .option("startingPosition", startingPosition)
    maxSegmentsPerTrigger.foreach(n => reader.option("maxSegmentsPerTrigger", n))
    reader.load(d.toString)
  }
}

/** JVM-global per-(baseDir, topic) coordination shared by every TopicTable
  * instance in the process: the ingest serialization lock, the monotone
  * publish stamp, and the segment-name sequence. Keyed by the CANONICAL
  * base path so two instances constructed with different spellings of one
  * directory still coordinate.
  */
object TopicTable {
  private val locks  = scala.collection.concurrent.TrieMap.empty[(String, String), Object]
  private val stamps = scala.collection.concurrent.TrieMap.empty[(String, String), java.util.concurrent.atomic.AtomicLong]
  private val seqs   = scala.collection.concurrent.TrieMap.empty[(String, String), java.util.concurrent.atomic.AtomicLong]

  private[topics] def ingestLock(base: String, topicFn: String): Object =
    locks.getOrElseUpdate((base, topicFn), new Object)

  /** Strictly-increasing per-topic publish stamp: wall-clock micros, but
    * never ≤ a previously issued stamp — concurrent/fast ingests get
    * distinct, ordered publishTimes even within one clock tick.
    */
  private[topics] def nextStampMicros(base: String, topicFn: String): Long =
    stamps.getOrElseUpdate((base, topicFn), new java.util.concurrent.atomic.AtomicLong(0L))
      .updateAndGet(prev => math.max(prev + 1, System.currentTimeMillis() * 1000L))

  private[topics] def seq(base: String, topicFn: String, init: => Long): java.util.concurrent.atomic.AtomicLong =
    seqs.getOrElseUpdate((base, topicFn), new java.util.concurrent.atomic.AtomicLong(init))

  /** Timestamp → epoch micros. getNanos INCLUDES the millisecond part, so
    * the % 1000000 is load-bearing — every cursor encoding (durable file,
    * prefix selection) must use this one definition.
    */
  private[graft] def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L

  /** The minimal name-order segment prefix a bounded poll must read —
    * poll cost becomes proportional to the LIMIT, not the backlog depth.
    *
    * Ingest assigns each batch one strictly-increasing publishTime stamp
    * and registers its segments contiguously in name order, so the
    * name-sorted listing is publishTime-sorted ACROSS ingests; only
    * segments of a single ingest can tie. The selection therefore:
    *
    *  1. drops segments wholly before the cursor (footer max < cursor —
    *     the same bound the beam scan's filter pushdown uses);
    *  2. walks the remainder in name order, counting only rows of
    *     segments strictly past the cursor (a boundary segment's rows may
    *     be partially consumed, so it is included but counted as 0 —
    *     under-counting can only ADD files, never starve the batch);
    *  3. stops once the countable rows reach the limit, then extends
    *     through the tie tail: later segments whose min stamp does not
    *     exceed the max stamp already included (same-ingest ties are
    *     ordered by messageId across segments, so the tail is needed for
    *     a correct total order).
    *
    * Any segment with unreadable/unknown footer stats is treated as both
    * boundary (always included, counted 0) and unbounded (keeps the walk
    * going) — correctness never depends on stats being present.
    */
  private[graft] def pollFiles(segs: Seq[java.io.File], cursorMicros: Option[Long],
      limit: Int): Seq[java.io.File] =
    pollPrefix(segs.map(f => f -> graft.sources.BeamSource.segmentStats(f)),
      cursorMicros, limit)

  /** Pure core of [[pollFiles]] over pre-fetched stats — property-tested
    * directly (PropertySpec) against a row-level poll simulation.
    */
  private[graft] def pollPrefix[A](stats: Seq[(A, Option[graft.sources.BeamSource.SegmentStats])],
      cursorMicros: Option[Long], limit: Int): Seq[A] = {
    val fresh = cursorMicros match {
      case None    => stats
      case Some(t) => stats.filter { case (_, st) => st.flatMap(_.maxPt).forall(_ >= t) }
    }
    var countable = 0L
    var maxStamp  = Option.empty[Long] // max maxPt over included segments
    val prefix = scala.collection.mutable.ArrayBuffer.empty[A]
    val it = fresh.iterator
    var done = false
    while (it.hasNext && !done) {
      val (f, st) = it.next()
      val fullyFresh = st.exists(s => // both bounds: counted rows must be stamp-bounded
        s.minPt.isDefined && s.maxPt.isDefined && cursorMicros.forall(t => s.minPt.get > t))
      // Past the quota, only the tie tail still belongs: the `limit`
      // countable rows all carry stamps ≤ maxStamp (only stats-bearing,
      // fully-fresh segments count toward the quota), so a segment whose
      // min stamp exceeds maxStamp can only hold LATER rows. A segment
      // with unknown bounds never advances maxStamp but is always
      // tail-eligible (its minPt is unknown → forall holds) — stat-less
      // footers stay conservative without unbounding the whole walk.
      val inTail = st.flatMap(_.minPt).forall(mn => maxStamp.forall(mx => mn <= mx))
      if (countable < limit || inTail) {
        prefix += f
        if (fullyFresh) countable += st.get.rows
        st.flatMap(_.maxPt).foreach(mx => maxStamp = Some(maxStamp.fold(mx)(math.max(_, mx))))
      } else done = true
    }
    prefix.toSeq
  }
}
