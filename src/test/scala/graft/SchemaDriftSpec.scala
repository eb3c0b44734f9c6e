package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift hardening: the driver's corpus generator has shipped
  * `events.ts` in two parquet flavors over time — TIMESTAMP(NANOS) (which
  * Spark reads as long under `nanosAsLong`) and plain `timestamp[us]` with no
  * UTC adjustment (which Spark reads as TIMESTAMP_NTZ, rejected by
  * `withWatermark` and `unix_micros`). This spec writes an events-shaped
  * fixture in BOTH flavors and drives a watermarked stream and a
  * `unix_micros` query through `Tables`/`StreamOps` on each, so the next
  * corpus regeneration breaks here (fast, in `sbt test`) instead of at the
  * driver's correctness gate.
  */
class SchemaDriftSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-schema-drift")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** events-shaped rows with `ts` as a true TIMESTAMP, micros precision. */
  private def baseEvents: DataFrame = {
    import spark.implicits._
    (0 until 200).map { i =>
      (i.toLong, (i % 7).toLong, Seq("view", "click", "purchase")(i % 3),
        i / 100.0, 1700000000000000L + i * 137000000L)
    }.toDF("event_id", "user_id", "event_type", "value", "ts_us")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
  }

  /** Write `df` (with `ts` transformed by `flavor`) as `<dir>/events.parquet` —
    * a single FILE like the driver's testdata (the streaming path stages the
    * file into a listing directory, so a directory-valued table would not
    * match the corpus layout being simulated).
    */
  private def writeFlavor(flavor: DataFrame => DataFrame): String = {
    val dir = Files.createTempDirectory("graft-drift")
    val tmp = dir.resolve("out")
    flavor(baseEvents).coalesce(1).write.parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().orElseThrow()
    Files.move(part, dir.resolve("events.parquet"))
    dir.toString
  }

  // timestamp[us] with no UTC adjustment → Spark reads TIMESTAMP_NTZ
  private lazy val ntzDir = writeFlavor(_.withColumn("ts", col("ts").cast(TimestampNTZType)))
  // nanos epoch as a plain int64 — what the nanosAsLong reader yields for
  // the historical TIMESTAMP(NANOS) fixtures (Spark cannot write NANOS, so
  // the spec exercises the post-reader LongType branch directly)
  private lazy val nanosDir = writeFlavor(
    _.withColumn("ts", (unix_micros(col("ts")) * 1000L).cast("long")))
  // the reference flavor: a true TIMESTAMP column
  private lazy val tsDir = writeFlavor(identity)

  private val flavors = Seq("ntz" -> (() => ntzDir), "nanos-long" -> (() => nanosDir),
    "timestamp" -> (() => tsDir))

  test("Tables normalizes every ts flavor to a true TIMESTAMP with equal values") {
    val results = flavors.map { case (name, dir) =>
      val df = ops.Tables(spark, dir(), "events")
      assert(df.schema("ts").dataType == TimestampType, s"flavor $name")
      name -> df.select("event_id", "ts").orderBy("event_id")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime)).toSeq
    }
    results.tail.foreach { case (name, vals) =>
      assert(vals == results.head._2, s"flavor $name diverges from ${results.head._1}")
    }
  }

  test("watermarked streaming aggregation runs on every ts flavor") {
    val results = flavors.map { case (name, dir) =>
      val sink = ops.StreamOps.streamWatermark.run(spark, dir()).collect()
      assert(sink.nonEmpty, s"flavor $name emitted no closed windows")
      name -> sink.map(_.toSeq).toSeq
    }
    results.tail.foreach { case (name, rows) =>
      assert(rows == results.head._2, s"flavor $name diverges from ${results.head._1}")
    }
  }

  test("runStream sizes state shards by input volume and restores the session conf") {
    val prev = spark.sessionState.conf.numShufflePartitions
    ops.StreamOps.streamWatermark.run(spark, ntzDir).collect()
    // a few-KB staged backlog must pin exactly one state shard into the
    // checkpoint, not the session's parallelism (the volume→splits policy)
    assert(ops.StreamOps.lastStateShards == 1)
    // and the session's own shuffle parallelism must come back afterwards
    assert(spark.sessionState.conf.numShufflePartitions == prev)
  }

  test("streaming consumes a multi-part directory table identically to a single file") {
    // the ScaleData corpus ships <table>.parquet as a part-file DIRECTORY;
    // a staging that copies only the dir entry feeds the stream ZERO rows
    // without erroring (caught live in r6 s4 — every sf1 streaming
    // measurement before the fix ran empty). Lock the layout contract:
    // same rows, same result, both layouts.
    val dirLayout = {
      val dir = Files.createTempDirectory("graft-drift-multi")
      baseEvents.repartition(3).write.parquet(dir.resolve("events.parquet").toString)
      dir.toString
    }
    val multi = ops.StreamOps.streamWatermark.run(spark, dirLayout).collect()
      .map(_.toSeq).toSeq
    val single = ops.StreamOps.streamWatermark.run(spark, tsDir).collect()
      .map(_.toSeq).toSeq
    assert(multi.nonEmpty, "multi-part stream emitted nothing — staging dropped the parts")
    assert(multi == single, "multi-part layout diverges from single-file")
  }

  test("unix_micros session transitions run on every ts flavor") {
    val results = flavors.map { case (name, dir) =>
      val rows = ops.BehaviorOps.transitions.run(spark, dir()).collect()
      assert(rows.nonEmpty, s"flavor $name")
      name -> rows.map(_.toSeq).toSeq
    }
    results.tail.foreach { case (name, rows) =>
      assert(rows == results.head._2, s"flavor $name diverges from ${results.head._1}")
    }
  }
}
