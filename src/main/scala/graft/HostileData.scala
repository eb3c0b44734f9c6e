package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Hostile staging of a testdata directory: the null/empty/degenerate edge
  * corpus the round-11 verdict asked for (`runMain graft.HostileData
  * <srcDir> <destDir>`). Every table keeps its driver schema and single-file
  * layout; `documents`/`events`/`embeddings` additionally receive the edge
  * rows a real crawl delivers and the x39/x54 bug class hid behind:
  *
  *  - documents: all-null `text` / `n_chars` / `lang` / `source` slices, a
  *    SOURCE whose every row has null text (zero survivors of the standard
  *    `text IS NOT NULL` gate), empty and whitespace-only text, a fully-null
  *    metadata row, single-token and one-token-repeated degenerate docs.
  *  - events: null `props` / `value` / `event_type` / `user_id` rows (valid
  *    in-range timestamps, so watermark semantics stay exercised, not broken).
  *  - embeddings: zero-norm vectors (the cosine-division edge: Spark's
  *    non-ANSI `/` yields NULL where DuckDB float math yields NaN), a null
  *    embedding array, and a null label.
  *
  * The fixture exists to be DIFFED cross-engine: `tools/hostile_sweep.sh`
  * regenerates it, runs `graft.Verify` against it, and compares every
  * declared oracle pair in DuckDB — any divergence is a real bug of the
  * x39/x54 class (row-set or null-ordering drift between engines), caught
  * here instead of at the driver's gate. `HostileFixtureSpec` runs the whole
  * query surface against the committed copy (`fixtures/hostile/`) in CI.
  *
  * All injected rows are deterministic literals — same bytes every run.
  */
object HostileData {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: HostileData <srcDir> <destDir>")
    val Array(src, dest) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, dest)
    spark.stop()
  }

  /** Hostile document rows: (doc_id, text, lang, source, n_chars). Ids sit
    * far above any sf0.001/sf0.01 doc_id so joins/splits stay collision-free.
    */
  val hostileDocs: Seq[(Long, String, String, String, java.lang.Long)] = {
    val langs = Seq("en", "de", "fr", "es", "zh")
    val srcs = (0 until 8).map(i => s"src$i")
    val nullText = (0 until 8).map(i =>
      (10000L + i, null: String, langs(i % 5), srcs(i), java.lang.Long.valueOf(100L + i)))
    val nullChars = (0 until 4).map(i =>
      (10010L + i, "the quick brown fox jumps over the lazy dog", langs(i), srcs(i),
        null: java.lang.Long))
    val nullLang = (0 until 4).map(i =>
      (10020L + i, "null language slice row with plain lowercase words", null: String,
        srcs(i), java.lang.Long.valueOf(50L)))
    val nullSource = (0 until 4).map(i =>
      (10030L + i, "null source slice row with plain lowercase words", langs(i),
        null: String, java.lang.Long.valueOf(48L)))
    val emptyText = (0 until 4).map(i =>
      (10040L + i, "", langs(i), srcs(i), java.lang.Long.valueOf(0L)))
    val wsText = Seq(
      (10050L, " ", "en", "src0", java.lang.Long.valueOf(1L)),
      (10051L, "   ", "de", "src1", java.lang.Long.valueOf(3L)))
    // an entire source with ZERO rows surviving `text IS NOT NULL`
    val deadSource = (0 until 6).map(i =>
      (10060L + i, null: String, langs(i % 5), "srcnull", java.lang.Long.valueOf(10L + i)))
    val allNull = Seq(
      (10070L, null: String, null: String, null: String, null: java.lang.Long))
    val degenerate = Seq(
      (10080L, "zzz", "en", "src2", java.lang.Long.valueOf(3L)),
      (10081L, Seq.fill(50)("dup").mkString(" "), "en", "src3",
        java.lang.Long.valueOf(199L)))
    nullText ++ nullChars ++ nullLang ++ nullSource ++ emptyText ++ wsText ++
      deadSource ++ allNull ++ degenerate
  }

  def run(spark: SparkSession, src: String, dest: String): Unit = {
    import spark.implicits._
    Files.createDirectories(Paths.get(dest))

    def writeSingleFile(df: DataFrame, table: String): Unit = {
      val tmp = s"$dest/.tmp_$table"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = Files.list(Paths.get(tmp)).filter(_.getFileName.toString
        .matches("part-.*\\.parquet")).findFirst().get()
      Files.move(part, Paths.get(s"$dest/$table.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
      println(s"[hostile] $table written")
    }

    // untouched tables: copy through (keeps the single-file driver layout)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem"))
      writeSingleFile(ops.Tables(spark, src, t), t)

    val docs = ops.Tables(spark, src, "documents")
    val hostileDocsDf = hostileDocs
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    writeSingleFile(docs.unionByName(hostileDocsDf), "documents")

    val events = ops.Tables(spark, src, "events")
    val hostileEventsDf = Seq(
      // (event_id, ts, user_id, event_type, value, props)
      (100000L, "2024-01-15 12:00:00", j(1L), "view", jd(1.0), null: String),
      (100001L, "2024-01-15 12:01:00", j(2L), "click", jd(2.0), null: String),
      (100002L, "2024-01-15 12:02:00", j(3L), "view", jd(0.5), null: String),
      (100003L, "2024-01-15 12:03:00", j(4L), "purchase", jd(9.5), null: String),
      (100010L, "2024-01-15 12:10:00", j(1L), "view", null, """{"k":"v"}"""),
      (100011L, "2024-01-15 12:11:00", j(2L), "click", null, """{"k":"v"}"""),
      (100020L, "2024-01-15 12:20:00", j(3L), null, jd(1.5), """{"k":"v"}"""),
      (100021L, "2024-01-15 12:21:00", j(4L), null, jd(2.5), """{"k":"v"}"""),
      (100030L, "2024-01-15 12:30:00", null, "view", jd(3.0), """{"k":"v"}"""),
      (100031L, "2024-01-15 12:31:00", null, "click", jd(4.0), """{"k":"v"}"""),
      (100040L, "2024-01-15 12:40:00", null, null, null, null: String))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts")))
    writeSingleFile(events.unionByName(hostileEventsDf), "events")

    val embs = ops.Tables(spark, src, "embeddings")
    val zero = Seq.fill(64)(0.0f)
    val flat = Seq.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val hostileEmbsDf = Seq(
      (10000L, zero, j(0L)),               // zero-norm: cosine denominators hit 0
      (10001L, zero, null),                // zero-norm AND null label
      (10002L, null: Seq[Float], j(1L)),   // null embedding array
      (10003L, flat, null))                // null label, unit basis vector
      .toDF("vec_id", "embedding", "label")
      .withColumn("label", col("label").cast("int"))
    writeSingleFile(embs.unionByName(hostileEmbsDf), "embeddings")
  }

  private def j(v: Long): java.lang.Long = java.lang.Long.valueOf(v)
  private def jd(v: Double): java.lang.Double = java.lang.Double.valueOf(v)
}
