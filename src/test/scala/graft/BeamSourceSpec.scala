package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.topics.TopicTable

/** DSv2 `format("beam")` connector (SURVEY.md §4.2): batch fidelity vs the
  * native parquet reader, column pruning, partition-per-segment planning,
  * and micro-batch offsets over arriving segments.
  */
class BeamSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-beamsource-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def freshTopics() =
    new TopicTable(spark, Files.createTempDirectory("graft-beamsrc").toString)

  test("batch read through format(\"beam\") matches the parquet reader row-for-row") {
    val topics = freshTopics()
    val fn     = "persistent://t/ns/fidelity"
    topics.ingestPayload("alpha".getBytes, fn, Map("a" -> "1", "b" -> "2"))
    topics.ingestPayload("beta".getBytes, fn)

    val viaBeam = topics.read(fn)
    assert(viaBeam.schema == topics.schema)
    val rows = viaBeam.orderBy("publishTime", "messageId").collect()
    assert(rows.length == 2)
    assert(rows.map(r => new String(r.getAs[Array[Byte]]("payload"))).toSet == Set("alpha", "beta"))
    assert(rows.forall(_.getAs[String]("topic") == fn))
    assert(rows.forall(_.getAs[Map[String, String]]("props").contains("PulsarBeamId")))
    val withProps = rows.find(r => new String(r.getAs[Array[Byte]]("payload")) == "alpha").get
    assert(withProps.getAs[Map[String, String]]("props")("a") == "1")

    assert(rows.forall(_.getAs[java.sql.Timestamp]("publishTime").getTime > 0))
  }

  test("beam timestamps decode identically to the native parquet reader") {
    val base   = Files.createTempDirectory("graft-beamsrc-ts").toString
    val topics = new TopicTable(spark, base)
    val fn     = "persistent://t/ns/ts"
    topics.ingestPayload("tsrow".getBytes, fn)
    val dir = s"$base/${graft.model.Keys.sha1Hex(fn)}"
    val viaParquet = spark.read.parquet(dir)
      .select("messageId", "publishTime", "eventTime").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    val viaBeam = spark.read.format("beam").load(dir)
      .select("messageId", "publishTime", "eventTime").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    assert(viaBeam == viaParquet)
  }

  test("column pruning reaches the beam scan (ReadSchema shrinks)") {
    val topics = freshTopics()
    val fn     = "persistent://t/ns/prune"
    topics.ingestPayload("p".getBytes, fn)
    val pruned = topics.read(fn).select("messageId")
    val plan   = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("BeamScan"))
    assert(plan.contains("ReadSchema: struct<messageId:string>"), plan)
    assert(pruned.collect().length == 1)
  }

  test("one input partition per segment file") {
    val base   = Files.createTempDirectory("graft-beamsrc-parts").toString
    val topics = new TopicTable(spark, base)
    val fn     = "persistent://t/ns/parts"
    for (i <- 1 to 3) topics.ingestPayload(s"m$i".getBytes, fn)
    val dir  = s"$base/${graft.model.Keys.sha1Hex(fn)}"
    val segs = graft.sources.BeamSource.listSegments(dir)
    assert(segs.size >= 3) // one append per ingest
    assert(topics.read(fn).rdd.getNumPartitions == segs.size)
  }

  test("publishTime cursor filter prunes whole segments via footer stats") {
    val base   = Files.createTempDirectory("graft-beamsrc-prune").toString
    val topics = new TopicTable(spark, base)
    val fn     = "persistent://t/ns/prunets"
    for (i <- 1 to 3) { topics.ingestPayload(s"m$i".getBytes, fn); Thread.sleep(30) }

    val all = topics.read(fn).orderBy("publishTime", "messageId").collect()
    assert(all.length == 3)
    val t3 = all(2).getAs[java.sql.Timestamp]("publishTime")

    val filtered = topics.read(fn).where(col("publishTime") >= t3)
    // only the third segment's footer max reaches t3 → one partition planned
    assert(filtered.rdd.getNumPartitions == 1,
      s"expected 1 surviving segment, got ${filtered.rdd.getNumPartitions}")
    assert(filtered.collect().map(r => new String(r.getAs[Array[Byte]]("payload"))).toSeq
      == Seq("m3"))

    // the poll cursor's OR-shape (pt > t OR (pt = t AND mid > m)) also prunes
    val t2  = all(1).getAs[java.sql.Timestamp]("publishTime")
    val m2  = all(1).getAs[String]("messageId")
    val cur = topics.read(fn).where(
      col("publishTime") > t2 || (col("publishTime") === t2 && col("messageId") > m2))
    assert(cur.rdd.getNumPartitions <= 2) // segment 1 pruned
    assert(cur.collect().map(r => new String(r.getAs[Array[Byte]]("payload"))).toSeq == Seq("m3"))
  }

  test("LIMIT pushes to the scan and opens only a row-covering segment prefix") {
    val base   = Files.createTempDirectory("graft-beamsrc-limit").toString
    val topics = new TopicTable(spark, base)
    val fn     = "persistent://t/ns/lim"
    for (i <- 1 to 4) topics.ingestPayload(s"m$i".getBytes, fn) // 4 one-row segments

    val limited = topics.read(fn).limit(2)
    val plan    = limited.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: 2"), plan)
    // partial push: the exact limit still applies above the scan
    assert(limited.collect().length == 2)
    // the planned scan holds only the 2-segment prefix, not all 4
    val scans = limited.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty, plan)
    assert(scans.head.inputRDD.getNumPartitions == 2,
      s"expected a 2-segment prefix, got ${scans.head.inputRDD.getNumPartitions}")
    // no limit → all segments planned (builder state does not leak)
    assert(topics.read(fn).rdd.getNumPartitions == 4)
  }

  test("COUNT(*) is answered from footers: pushed aggregate, no segment partitions") {
    val base   = Files.createTempDirectory("graft-beamsrc-count").toString
    val topics = new TopicTable(spark, base)
    val fn     = "persistent://t/ns/cnt"
    for (i <- 1 to 3) topics.ingestPayload(s"m$i".getBytes, fn)

    val counted = topics.read(fn).groupBy().count()
    val plan    = counted.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregate: count(*)=3"), plan)
    assert(counted.collect().map(_.getLong(0)).toSeq == Seq(3L))
    // complete push: one carrier partition, no per-segment readers
    val scans = counted.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty && scans.head.inputRDD.getNumPartitions == 1, plan)

    // a filtered count must NOT push (filters are residual → real scan)
    val filtered = topics.read(fn).where(col("messageId").isNotNull).groupBy().count()
    assert(!filtered.queryExecution.executedPlan.toString.contains("PushedAggregate"))
    assert(filtered.collect().map(_.getLong(0)).toSeq == Seq(3L))

    // grouped counts keep the normal scan too
    val grouped = topics.read(fn).groupBy("topic").count()
    assert(!grouped.queryExecution.executedPlan.toString.contains("PushedAggregate"))
    assert(grouped.collect().map(_.getLong(1)).sum == 3L)
  }

  test("maxSegmentsPerTrigger drains a backlog in bounded micro-batches") {
    val base   = Files.createTempDirectory("graft-beamsrc-ac").toString
    val topics = new TopicTable(spark, base)
    val fn     = "persistent://t/ns/backlog"
    for (i <- 1 to 3) { topics.ingestPayload(s"b$i".getBytes, fn); Thread.sleep(20) }
    val dir = s"$base/${graft.model.Keys.sha1Hex(fn)}"

    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    val q = spark.readStream.format("beam").option("maxSegmentsPerTrigger", 1).load(dir)
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("beamsrc-ac-ck").toString)
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = batch.count().toInt
        if (n > 0) batchSizes.synchronized(batchSizes += n)
        ()
      }
      .start()
    try {
      var i = 0
      while (i < 100 && batchSizes.synchronized(batchSizes.sum) < 3) { Thread.sleep(100); i += 1 }
      // each pre-existing segment arrived in its own batch — never all at once
      assert(batchSizes.synchronized(batchSizes.toList) == List(1, 1, 1))
    } finally q.stop()
  }

  test("scan reports segment-bytes statistics; small topic side broadcasts in a join") {
    val base   = Files.createTempDirectory("graft-beamsrc-stats").toString
    val topics = new TopicTable(spark, base)
    val fn     = "persistent://t/ns/stats"
    topics.ingestPayload("s1".getBytes, fn)
    val dir  = s"$base/${graft.model.Keys.sha1Hex(fn)}"
    val scan = new graft.sources.BeamScan(dir, graft.sources.BeamSource.schema, None)
    val expected = graft.sources.BeamSource.listSegments(dir).map(_.length()).sum
    assert(expected > 0)
    assert(scan.estimateStatistics().sizeInBytes().getAsLong == expected)

    val big    = spark.range(5000).select(col("id").cast("string").as("messageId"))
    val joined = big.join(topics.read(fn), "messageId")
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("micro-batch stream delivers only NEW segments per batch (offset slicing)") {
    val topics = freshTopics()
    val fn     = "persistent://t/ns/stream"
    topics.ingestPayload("first".getBytes, fn)

    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[String])]
    val q = topics.readStream(fn)
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("beamsrc-ck").toString)
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val payloads = batch.select("payload").collect()
          .map(r => new String(r.getAs[Array[Byte]]("payload"))).toSeq
        seen.synchronized(seen += ((id, payloads)))
        ()
      }
      .start()
    try {
      def flat = seen.synchronized(seen.flatMap(_._2).toList)
      var i = 0
      while (i < 100 && !flat.contains("first")) { Thread.sleep(100); i += 1 }
      assert(flat == List("first"))

      topics.ingestPayload("second".getBytes, fn)
      i = 0
      while (i < 100 && !flat.contains("second")) { Thread.sleep(100); i += 1 }
      // "second" arrived in a LATER batch containing only the new segment
      assert(flat == List("first", "second"))
      val batchWithSecond = seen.synchronized(seen.find(_._2.contains("second")).get)
      assert(batchWithSecond._2 == Seq("second"))
    } finally q.stop()
  }

  test("poll reads a limit-bounded segment prefix, not the whole backlog") {
    val base   = Files.createTempDirectory("graft-beamsrc-poll").toString
    val topics = new TopicTable(spark, base)
    val fn     = "persistent://t/ns/pollbound"
    import spark.implicits._
    // 6 ingests × 10 rows: a 60-message backlog in ≥6 segments
    for (b <- 1 to 6) {
      val df = (1 to 10).map(i => (s"b$b-m$i".getBytes, Option.empty[java.sql.Timestamp],
        Option.empty[String], Map.empty[String, String]))
        .toDF("payload", "eventTime", "key", "props").coalesce(1)
      topics.ingest(df, fn)
    }
    val dir  = s"$base/${graft.model.Keys.sha1Hex(fn)}"
    val segs = graft.sources.BeamSource.listSegments(dir)
    assert(segs.size >= 6)

    // fresh subscription, limit 10: one full segment satisfies the quota —
    // the prefix must stay far smaller than the backlog
    val first = TopicTable.pollFiles(segs, None, 10)
    assert(first.nonEmpty && first.size <= 2, s"expected ≤2 files, got ${first.size}")
    // cursor mid-topic (end of ingest 3): prefix = boundary segment(s) of
    // stamp 3 plus the next full segment — never the tail of the backlog
    val all = topics.read(fn).orderBy("publishTime", "messageId").collect()
    val t3  = all(29).getAs[java.sql.Timestamp]("publishTime")
    val mid = TopicTable.pollFiles(segs, Some(TopicTable.micros(t3)), 10)
    assert(mid.nonEmpty && mid.size <= 3, s"expected ≤3 files, got ${mid.size}")
    assert(mid.map(_.getName) == segs.map(_.getName).filter(mid.map(_.getName).contains),
      "prefix must preserve name order")

    // end-to-end: successive bounded polls drain the topic in total order
    val drained = scala.collection.mutable.ArrayBuffer.empty[String]
    var batch   = topics.pollBatch(fn, "drainsub", 10)
    var n       = 0
    while (batch.nonEmpty && n < 20) {
      drained ++= batch.map(r => new String(r.getAs[Array[Byte]]("payload")))
      batch = topics.pollBatch(fn, "drainsub", 10)
      n += 1
    }
    assert(drained.size == 60)
    assert(drained.toList ==
      all.map(r => new String(r.getAs[Array[Byte]]("payload"))).toList)
  }

  test("compaction merges segments; data, order, and poll cursors survive") {
    val base   = Files.createTempDirectory("graft-beamsrc-compact").toString
    val topics = new TopicTable(spark, base)
    val fn     = "persistent://t/ns/compact"
    import spark.implicits._
    for (b <- 1 to 8) {
      val df = (1 to 10).map(i => (s"b$b-m$i".getBytes, Option.empty[java.sql.Timestamp],
        Option.empty[String], Map.empty[String, String]))
        .toDF("payload", "eventTime", "key", "props").coalesce(1)
      topics.ingest(df, fn)
    }
    val dir    = s"$base/${graft.model.Keys.sha1Hex(fn)}"
    val before = topics.read(fn).orderBy("publishTime", "messageId").collect()
      .map(r => (new String(r.getAs[Array[Byte]]("payload")), r.getAs[String]("messageId")))
    assert(graft.sources.BeamSource.listSegments(dir).size >= 8)

    // drain two batches on a named subscription, then compact mid-stream
    val d1 = topics.pollBatch(fn, "compsub", 10)
    val d2 = topics.pollBatch(fn, "compsub", 10)
    assert(d1.length == 10 && d2.length == 10)

    val removed = topics.compactTopic(fn)
    assert(removed >= 8)
    assert(graft.sources.BeamSource.listSegments(dir).size == 1)

    // full history identical (values AND ids), in the same total order
    val after = topics.read(fn).orderBy("publishTime", "messageId").collect()
      .map(r => (new String(r.getAs[Array[Byte]]("payload")), r.getAs[String]("messageId")))
    assert(after.toSeq == before.toSeq)

    // the half-drained cursor resumes exactly where it left off
    val d3 = topics.pollBatch(fn, "compsub", 10)
    assert(d3.map(r => new String(r.getAs[Array[Byte]]("payload"))).toSeq ==
      before.slice(20, 30).map(_._1).toSeq)

    // a fresh stream from earliest sees the whole topic as one segment
    val offsets = topics.endOffset(fn)
    assert(offsets == 1L)
    // idempotent: nothing left to merge
    assert(topics.compactTopic(fn) == 0)
  }

  test("a compaction interrupted mid-commit recovers without doubling or losing data") {
    val base   = Files.createTempDirectory("graft-beamsrc-crash").toString
    val topics = new TopicTable(spark, base)
    val fn     = "persistent://t/ns/crash"
    for (i <- 1 to 3) topics.ingestPayload(s"m$i".getBytes, fn)
    val dir  = new java.io.File(s"$base/${graft.model.Keys.sha1Hex(fn)}")
    def segs = graft.sources.BeamSource.listSegments(dir.toString)
    val all  = topics.read(fn).orderBy("publishTime", "messageId").collect()
      .map(r => new String(r.getAs[Array[Byte]]("payload"))).toSeq
    assert(all == Seq("m1", "m2", "m3"))

    // crash BEFORE the merged segment was linked: manifest names a target
    // that never appeared → recovery abandons, old segments stay intact
    java.nio.file.Files.write(new java.io.File(dir, ".compact-manifest").toPath,
      (Seq("99999999999999999999-never-linked.parquet") ++ segs.map(_.getName))
        .mkString("\n").getBytes("UTF-8"))
    assert(topics.read(fn).count() == 3)
    assert(!new java.io.File(dir, ".compact-manifest").isFile, "manifest cleaned")
    assert(segs.size == 3)

    // crash AFTER the link but mid-delete: target exists, one victim was
    // already deleted, two remain → recovery finishes the deletes, so the
    // topic serves each message exactly once
    val victim = segs.head
    val target = new java.io.File(dir, f"${77777777L}%020d-${victim.getName}")
    java.nio.file.Files.createLink(target.toPath, victim.toPath)
    java.nio.file.Files.write(new java.io.File(dir, ".compact-manifest").toPath,
      Seq(target.getName, victim.getName).mkString("\n").getBytes("UTF-8"))
    val after = topics.read(fn).orderBy("publishTime", "messageId").collect()
      .map(r => new String(r.getAs[Array[Byte]]("payload"))).toSeq
    assert(after == all, s"history must be exactly-once after recovery, got $after")
    assert(!victim.exists() && target.exists())
  }

  test("retention expires old segments; cursors and streaming checkpoints survive") {
    val base   = Files.createTempDirectory("graft-beamsrc-retain").toString
    val topics = new TopicTable(spark, base)
    val fn     = "persistent://t/ns/retain"
    import spark.implicits._
    for (b <- 1 to 3) {
      val df = (1 to 4).map(i => (s"b$b-m$i".getBytes, Option.empty[java.sql.Timestamp],
        Option.empty[String], Map.empty[String, String]))
        .toDF("payload", "eventTime", "key", "props").coalesce(1)
      topics.ingest(df, fn)
    }
    val dir  = s"$base/${graft.model.Keys.sha1Hex(fn)}"
    def segs = graft.sources.BeamSource.listSegments(dir)
    assert(segs.size == 3)
    def payloads(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => new String(r.getAs[Array[Byte]]("payload"))).toSeq

    // a subscription drained through segment 1 — its cursor sits in the
    // region that survives, and must be unaffected by the expiry
    val d1 = topics.pollBatch(fn, "retsub", 4)
    assert(d1.length == 4 && d1.map(r => new String(r.getAs[Array[Byte]]("payload")))
      .forall(_.startsWith("b1-")))

    // a streaming checkpoint that has consumed ALL three segments
    val ck = Files.createTempDirectory("beamsrc-retain-ck").toString
    val streamed = scala.collection.mutable.ArrayBuffer.empty[String]
    def runStream(): Unit = {
      val q = topics.readStream(fn).writeStream
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          streamed.synchronized {
            streamed ++= payloads(batch.select("payload").collect())
          }
          ()
        }
        .start()
      q.awaitTermination()
    }
    runStream()
    assert(streamed.size == 12)

    // expire everything strictly older than segment 2's first message:
    // cutoff = minPt(seg2) with zero retention → exactly segment 1 goes
    val seg2Min = graft.sources.BeamSource.segmentStats(segs(1)).get.minPt.get
    assert(topics.expireTopic(fn, retentionMs = 60000L,
      nowMicros = seg2Min + 60000L * 1000L) == 1)
    // the NAME survives as an empty placeholder — the offset domain (prefix
    // counts over the name-sorted listing) must not shift
    assert(segs.size == 3, "expiry must not remove segment names")
    assert(graft.sources.BeamSource.segmentStats(segs.head).get.rows == 0L)
    // content: segment 1's messages are gone, everything else intact, in order
    val remaining = topics.read(fn).orderBy("publishTime", "messageId").collect()
    assert(payloads(remaining) == (for (b <- 2 to 3; i <- 1 to 4) yield s"b$b-m$i"))
    // idempotent: nothing further to expire at the same cutoff
    assert(topics.expireTopic(fn, 60000L, seg2Min + 60000L * 1000L) == 0)

    // the live cursor resumes exactly where it left off (start of seg 2)
    val d2 = topics.pollBatch(fn, "retsub", 4)
    assert(d2.map(r => new String(r.getAs[Array[Byte]]("payload"))).toSeq ==
      (1 to 4).map(i => s"b2-m$i"))

    // the streaming checkpoint resumes over the mutated listing: a new
    // ingest lands in a later batch, exactly once, no replay of expired data
    val df4 = (1 to 4).map(i => (s"b4-m$i".getBytes, Option.empty[java.sql.Timestamp],
      Option.empty[String], Map.empty[String, String]))
      .toDF("payload", "eventTime", "key", "props").coalesce(1)
    topics.ingest(df4, fn)
    runStream()
    assert(streamed.drop(12).toSeq == (1 to 4).map(i => s"b4-m$i"),
      s"checkpoint must resume past the expired prefix, got ${streamed.drop(12)}")

    // a FRESH subscription starts from the retained region, no errors
    val fresh = topics.pollBatch(fn, "newsub", 100)
    assert(fresh.map(r => new String(r.getAs[Array[Byte]]("payload"))).toSeq ==
      ((for (b <- 2 to 4; i <- 1 to 4) yield s"b$b-m$i")))
  }
}
