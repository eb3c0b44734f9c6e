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

  // ---- documents / embeddings drift (VERDICT r6 item 6) -------------------
  // The generator has re-typed events.ts three times; assume documents and
  // embeddings are next: id columns shrinking to int32, embedding elements
  // widening to float64, nullability flips. Each flavor is written as a
  // corpus-layout fixture and one dedup + one ANN query runs through Tables
  // on it, asserting identical results to the canonical flavor.

  private def writeTable(dir: java.nio.file.Path, name: String, df: DataFrame): Unit = {
    val tmp = dir.resolve(s"$name-out")
    df.coalesce(1).write.parquet(tmp.toString)
    val part = Files.list(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
      .findFirst().orElseThrow()
    Files.move(part, dir.resolve(s"$name.parquet"))
  }

  private def baseDocs: DataFrame = {
    import spark.implicits._
    val words = Array("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    (0 until 120).map { i =>
      val text = (0 until 12).map(j => words((i * 7 + j * (1 + i % 3)) % words.length))
        .mkString(" ")
      // docs i and i+60 share a prefix → real near-dup structure for x02
      (i.toLong, if (i % 40 == 39) null else text, "src" + (i % 3), "en")
    }.toDF("doc_id", "text", "source", "lang")
  }

  private def baseEmb: DataFrame = {
    import spark.implicits._
    (0 until 100).map { i =>
      (i.toLong, (0 until 16).map(j => ((i * 31 + j * 17) % 97) / 97.0f).toSeq)
    }.toDF("vec_id", "embedding")
  }

  private def docEmbDir(docFlavor: DataFrame => DataFrame,
      embFlavor: DataFrame => DataFrame): String = {
    val dir = Files.createTempDirectory("graft-drift-de")
    writeTable(dir, "documents", docFlavor(baseDocs))
    writeTable(dir, "embeddings", embFlavor(baseEmb))
    dir.toString
  }

  private lazy val deCanonical = docEmbDir(identity, identity)
  private lazy val deDrifted = docEmbDir(
    // doc_id shrunk to int32
    _.withColumn("doc_id", col("doc_id").cast("int")),
    // vec_id shrunk to int32, elements widened to float64
    _.withColumn("vec_id", col("vec_id").cast("int"))
      .withColumn("embedding", col("embedding").cast("array<double>")))
  private lazy val deNonNull = docEmbDir(
    // nullability flip: every field declared non-null (text nulls dropped)
    d => spark.createDataFrame(d.where(col("text").isNotNull).rdd,
      org.apache.spark.sql.types.StructType(d.schema.fields.map(_.copy(nullable = false)))),
    e => spark.createDataFrame(e.rdd,
      org.apache.spark.sql.types.StructType(e.schema.fields.map(_.copy(nullable = false)))))

  test("Tables normalizes drifted documents/embeddings types back to the contract") {
    val docs = ops.Tables(spark, deDrifted, "documents")
    assert(docs.schema("doc_id").dataType == org.apache.spark.sql.types.LongType)
    val emb = ops.Tables(spark, deDrifted, "embeddings")
    assert(emb.schema("vec_id").dataType == org.apache.spark.sql.types.LongType)
    assert(emb.schema("embedding").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, true))
  }

  test("minhash-LSH dedup runs identically on every documents flavor") {
    graft.ops.DedupOps.clearMemo() // fixture dirs must not reuse corpus memos
    val base = SparkEntry.queries("x02_minhash_lsh")(spark, deCanonical)
      .collect().map(_.toSeq).toSeq
    // docs i and i+60 are byte-identical by construction → real pairs exist,
    // so flavor equality below is never vacuous
    assert(base.nonEmpty)
    for ((name, dir) <- Seq("drifted" -> deDrifted)) {
      val got = SparkEntry.queries("x02_minhash_lsh")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(got == base, s"flavor $name diverges (${got.size} vs ${base.size} rows)")
    }
    // the non-null flavor drops null-text docs — identical because x02
    // filters them anyway
    val nn = SparkEntry.queries("x02_minhash_lsh")(spark, deNonNull)
      .collect().map(_.toSeq).toSeq
    assert(nn == base, "non-null flavor diverges")
    graft.ops.DedupOps.clearMemo()
  }

  test("brute-force cosine top-k runs identically on every embeddings flavor") {
    val base = SparkEntry.queries("x06_cosine_topk")(spark, deCanonical)
      .collect().map(_.toSeq).toSeq
    assert(base.nonEmpty)
    for ((name, dir) <- Seq("drifted" -> deDrifted, "non-null" -> deNonNull)) {
      val got = SparkEntry.queries("x06_cosine_topk")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(got == base, s"flavor $name diverges (${got.size} vs ${base.size} rows)")
    }
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
