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
}
