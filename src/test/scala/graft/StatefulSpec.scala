package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.KeyedEvent

/** O-28 stateful TTL cache semantics + custom-function registration. */
class StatefulSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-stateful-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("mapGroupsWithState keeps latest value per key and counts touches across batches") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft-state-src").toString
    val ck     = Files.createTempDirectory("graft-state-ck").toString

    def write(batch: Seq[KeyedEvent]): Unit =
      batch.toDS().write.mode("append").parquet(srcDir)

    def source = spark.readStream
      .schema(Seq.empty[KeyedEvent].toDS().schema)
      .parquet(srcDir).as[KeyedEvent]

    // run 1 seeds two keys and drains (AvailableNow)
    write(Seq(
      KeyedEvent("a", new Timestamp(1000), "v1"),
      KeyedEvent("a", new Timestamp(2000), "v2"),
      KeyedEvent("b", new Timestamp(1500), "w1")))
    val outDir = Files.createTempDirectory("graft-state-out").toString
    val q1 = StatefulOps.run(spark, source, ttlMs = 600000L, outDir, ck, withTtl = false)
    q1.awaitTermination()
    val after1 = spark.read.parquet(outDir).as[StatefulOps.CacheEntry]
      .collect().map(e => e.key -> e).toMap
    assert(after1("a").value == "v2" && after1("a").touches == 2)
    assert(after1("b").value == "w1" && after1("b").touches == 1)

    // run 2 from the same checkpoint: keyed state survives the restart
    write(Seq(KeyedEvent("a", new Timestamp(3000), "v3")))
    val q2 = StatefulOps.run(spark, source, ttlMs = 600000L, outDir, ck, withTtl = false)
    q2.awaitTermination()
    val entries = spark.read.parquet(outDir).as[StatefulOps.CacheEntry].collect()
    val lastA   = entries.filter(_.key == "a").maxBy(_.touches)
    assert(lastA.value == "v3" && lastA.touches == 3 && !lastA.evicted)
  }

  test("stateful query output is identical on the RocksDB state store provider") {
    // At 100 TB the join/session state exceeds executor heap — the scale
    // posture (SURVEY §9) is RocksDB-backed state partitioned by key. Run
    // the SAME keyed-state pipeline on both providers (fresh checkpoints:
    // the provider class is pinned per checkpoint in OffsetSeqMetadata)
    // and assert bit-identical results.
    import spark.implicits._
    val events = Seq(
      KeyedEvent("a", new Timestamp(1000), "v1"),
      KeyedEvent("a", new Timestamp(2000), "v2"),
      KeyedEvent("b", new Timestamp(1500), "w1"),
      KeyedEvent("c", new Timestamp(9000), "z9"))

    def runWith(provider: Option[String]): Map[String, (String, Long)] = {
      val srcDir = Files.createTempDirectory("graft-rdb-src").toString
      val ck     = Files.createTempDirectory("graft-rdb-ck").toString
      val outDir = Files.createTempDirectory("graft-rdb-out").toString
      events.toDS().write.mode("append").parquet(srcDir)
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      provider.foreach(spark.conf.set(key, _))
      try {
        val src = spark.readStream
          .schema(Seq.empty[KeyedEvent].toDS().schema)
          .parquet(srcDir).as[KeyedEvent]
        val q = StatefulOps.run(spark, src, ttlMs = 600000L, outDir, ck, withTtl = false)
        q.awaitTermination()
      } finally {
        provider.foreach(_ => prev.fold(spark.conf.unset(key))(spark.conf.set(key, _)))
      }
      spark.read.parquet(outDir).as[StatefulOps.CacheEntry]
        .collect().map(e => e.key -> (e.value, e.touches.toLong)).toMap
    }

    val rocks = runWith(Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    val hdfs = runWith(None)
    assert(rocks == hdfs, s"provider outputs diverge: rocks=$rocks default=$hdfs")
    assert(rocks("a") == (("v2", 2L)) && rocks("b") == (("w1", 1L)) && rocks("c") == (("z9", 1L)))
  }

  test("x103's transformWithState fold is batch-count independent") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val batch = graft.ops.Tables(spark, sfDir, "events")
      .select(col("user_id"),
        floor(col("value") * 1000 + 0.5).cast("long").as("milli"),
        unix_timestamp(col("ts")).as("ep"))
    val expect = batch.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum(col("milli")).as("sum_milli"),
        max(col("ep")).as("last_epoch"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // stage the backlog as 3 files and force one file per micro-batch —
    // the SAME processor must land the same totals across 3 batches as
    // x103's single-batch run (monotone counters + max post-aggregate)
    val srcDir = Files.createTempDirectory("graft-tws-src").toString
    batch.repartition(3).write.mode("overwrite").parquet(srcDir)
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
        .as[(Long, Long, Long)]
        .groupByKey(_._1)
        .transformWithState(new graft.streaming.UserProfileProcessor,
          TimeMode.None(), OutputMode.Update())
        .toDF("user_id", "n_events", "sum_milli", "last_epoch")
      val q = stream.writeStream.format("memory").queryName("tws_multi")
        .outputMode("update")
        .option("checkpointLocation", Files.createTempDirectory("graft-tws-ck").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
        "backlog replayed in one batch — the multi-batch path was not exercised")
      val got = spark.table("tws_multi")
        .groupBy("user_id")
        .agg(max(col("n_events")).as("n_events"), max(col("sum_milli")).as("sum_milli"),
          max(col("last_epoch")).as("last_epoch"))
        .orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got == expect)
    } finally spark.conf.unset(providerKey)
  }

  test("TtlCache builds once per key, expires on TTL, and fires the eviction hook (O-29)") {
    var built   = 0
    var evicted = 0
    val cache = new graft.streaming.TtlCache[String, String](
      ttlMs = 200, build = k => { built += 1; s"client-$k" }, onEvict = _ => evicted += 1)
    assert(cache.get("a") == "client-a")
    assert(cache.get("a") == "client-a")
    assert(cache.get("b") == "client-b")
    assert(built == 2 && cache.size == 2)
    Thread.sleep(300) // both idle past TTL
    assert(cache.get("a") == "client-a") // rebuilt; sweep evicted both stale entries
    assert(built == 3 && evicted == 2 && cache.size == 1)
  }

  test("AES-GCM round-trips payloads (O-31; reference icrypto.go GCM mode)") {
    val sp = spark
    import sp.implicits._
    val df = Seq("payload-one", "payload-two", "").toDF("s")
    val ok = df.selectExpr(
      """cast(aes_decrypt(aes_encrypt(cast(s as binary), '0123456789abcdef', 'GCM'),
        |'0123456789abcdef', 'GCM') as string) = s AS ok""".stripMargin)
      .collect().map(_.getBoolean(0))
    assert(ok.forall(identity))
  }

  test("dot_f32 registers into an existing session and evaluates in SQL") {
    assert(GraftExtensions.register(spark))
    val r = spark.sql(
      "SELECT dot_f32(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)), " +
        "array(CAST(4 AS FLOAT), CAST(0.5 AS FLOAT))) AS d").head().getDouble(0)
    assert(r == 7.0)
  }

  test("GraftExtensions wires into SparkSessionExtensions without error") {
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(exts) // injection list accepts the descriptor
  }

  test("simhash32 codegen expression is bit-identical to the HOF formulation") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    // edge cases the byte-splitter must match regex-split on: empty text
    // (one empty token), trailing/leading/double spaces (empties KEPT),
    // multi-byte UTF-8 (0x20 never splits inside a sequence)
    val texts = Seq("", " ", "a", "a ", " a", "a  b", "héllo wörld",
      "the quick brown fox", "a a a a", "ünïcode Ünïcode  ")
    val df = texts.toDF("text")
    val expr = graft.functions.SimHashFunctions.simhash32(col("text"))
    val bits = sequence(lit(1), lit(32))
    val contribs = aggregate(
      transform(split(col("text"), " "), w => md5(w)),
      array_repeat(lit(0), 32),
      (acc, h) => zip_with(acc, bits, (a, i) =>
        a + when(ascii(h.substr(i, lit(1))) % 2 === 1, 1).otherwise(-1)))
    val hof = aggregate(
      zip_with(contribs, bits, (a, i) =>
        when(a > 0, pow(lit(2), i - 1).cast("long")).otherwise(0L)),
      lit(0L), (acc, v) => acc + v)
    val rows = df.select(expr.as("e"), hof.as("h")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getLong(0) == r.getLong(1), s"simhash mismatch for '$t'")
    }
    // and via SQL registration
    assert(GraftExtensions.register(spark))
    val viaSql = spark.sql("SELECT simhash32('the quick brown fox') AS s").head().getLong(0)
    val direct = rows(texts.indexOf("the quick brown fox")).getLong(0)
    assert(viaSql == direct)
  }

  test("doc_fingerprint codegen expression is bit-identical to the HOF formulation") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    val texts = Seq("", " ", "short", "exactly8", "the quick brown fox jumps",
      "héllo wörld with ünïcode", "aaaaaaaaaaaaaaaaaaa", "a b c d e f g h i j")
    val df  = texts.toDF("text")
    val hof = concat_ws("|", slice(
      array_sort(array_distinct(
        transform(sequence(lit(1), greatest(length(col("text")) - 7, lit(1))),
          i => md5(col("text").substr(i, lit(8)))))),
      1, 4))
    val rows = df.select(
      graft.functions.DocFingerprintFunctions.docFingerprint(col("text")).as("e"),
      hof.as("h")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getString(0) == r.getString(1), s"fingerprint mismatch for '$t'")
    }
    assert(GraftExtensions.register(spark))
    val viaSql = spark.sql("SELECT doc_fingerprint('the quick brown fox jumps') AS f")
      .head().getString(0)
    assert(viaSql == rows(texts.indexOf("the quick brown fox jumps")).getString(0))
  }

  test("bigram_stats codegen expression is bit-identical to the HOF formulation") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions._
    val texts = Seq("", " ", "a", "a ", " a", "a  b", "a b a b a b", "x y",
      "héllo wörld héllo wörld", "the the the", "a b c d e f g")
    val df = texts.toDF("text")
    val w  = split(col("text"), " ")
    val bg = transform(sequence(lit(1), size(w) - 1), i =>
      concat(element_at(w, i), lit(" "), element_at(w, i + 1)))
    val hof = when(size(w) >= 2,
      struct(size(bg).cast("long").as("n_bigrams"),
        size(array_distinct(bg)).cast("long").as("n_unique")))
      .otherwise(struct(lit(0L).as("n_bigrams"), lit(0L).as("n_unique")))
    val rows = df.select(
      graft.functions.BigramStatsFunctions.bigramStats(col("text")).as("e"),
      hof.as("h")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getStruct(0).toSeq == r.getStruct(1).toSeq, s"bigram mismatch for '$t'")
    }
    assert(GraftExtensions.register(spark))
    val viaSql = spark.sql("SELECT bigram_stats('a b a b').n_unique AS u").head().getLong(0)
    assert(viaSql == 2L) // 'a b' and 'b a'
  }

  test("nfc_normalize and char_ngrams work via SQL registration") {
    assert(GraftExtensions.register(spark))
    // decomposed e + U+0301 must compose to precomposed é (one char shorter)
    val nfc = spark.sql("SELECT nfc_normalize('e\u0301x') AS n").head().getString(0)
    assert(nfc == "\u00e9x" && nfc.length == 2)
    val grams = spark.sql("SELECT char_ngrams('abcd', 3) AS g")
      .head().getSeq[String](0)
    assert(grams == Seq("abc", "bcd"))
    assert(spark.sql("SELECT char_ngrams('ab', 3) AS g").head().getSeq[String](0).isEmpty)
    // n must be a literal — a column reference is an analysis-time error
    val err = intercept[Exception] {
      spark.sql("SELECT char_ngrams('abc', id) FROM range(1)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("integer literal"))
    // a foldable NULL of integer type must hit the same error path, not NPE
    val errNull = intercept[Exception] {
      spark.sql("SELECT char_ngrams('abc', CAST(NULL AS INT))").collect()
    }
    assert(errNull.getMessage.toLowerCase.contains("integer literal"))
  }

  test("SQL function builders reject wrong arity with a real error, not head-of-empty-list") {
    assert(GraftExtensions.register(spark))
    for (bad <- Seq("SELECT simhash32()", "SELECT doc_fingerprint('a','b')",
        "SELECT dot_f32(array(CAST(1 AS FLOAT)))", "SELECT bigram_stats()")) {
      val e = intercept[Exception](spark.sql(bad).collect())
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("expects exactly"), s"for '$bad' got: $msgs")
    }
  }
}
