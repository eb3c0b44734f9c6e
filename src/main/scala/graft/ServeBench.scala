package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}

import org.apache.spark.sql.SparkSession

import graft.serve.{BeamServer, Jwt}
import graft.store.InMemoryStore
import graft.topics.TopicTable

/** Serving-path latency envelope (r12 verdict item 6): StreamBench measures
  * pipeline cadence, but the serve layer's one implied reference SLA — the
  * e2e test's <121 s ingest→deliver bound (reference src/e2e/e2etest.go) —
  * had specs and no measured counterpart. This drives the REAL HTTP stack
  * (BeamServer routes, JWT auth, the 200-slot semaphore, TopicTable parquet
  * segments) with N concurrent pollers over M topics and reports per-op
  * latency quantiles, so BASELINE gets a p50/p99 row a reader can hold
  * against the reference's bound.
  *
  * Workload per poller iteration, round-robin over its topic:
  *   1. POST /v2/firehose (~120 B JSON payload) — ingest latency
  *   2. GET  /v2/poll?batchSize=10              — drain-poll latency (200)
  *   3. GET  /v2/poll on the now-empty topic    — empty-poll latency (204)
  * The destructive cursor makes each iteration self-cleaning, so the
  * segment directory stays bounded and every poll measures the same work.
  *
  * Env knobs: SERVE_BENCH_POLLERS (default 32), SERVE_BENCH_TOPICS (8),
  * SERVE_BENCH_ITERS (per poller, 50), SPARK_GRAFT_CPUS (32).
  * Output: one JSON line with p50/p90/p99/max microseconds per op and
  * throughput, plus a bench_runs/ artifact (same contract as Bench).
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nPollers = sys.env.getOrElse("SERVE_BENCH_POLLERS", "32").toInt
    val nTopics = sys.env.getOrElse("SERVE_BENCH_TOPICS", "8").toInt
    val iters = sys.env.getOrElse("SERVE_BENCH_ITERS", "50").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-serve-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val kp = Jwt.generateKeyPair()
    val topics = new TopicTable(spark, Files.createTempDirectory("graft-serve-bench").toString)
    val server = new BeamServer(topics, new InMemoryStore, kp)
    server.start()
    val base = s"http://localhost:${server.boundPort}"
    val token = Jwt.sign("tenant-a", kp.getPrivate)

    def loadavg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = loadavg

    // one client per poller thread — connection reuse mirrors a real
    // long-lived consumer, and sharing one client would serialize on its
    // internal connection pool locks rather than the server under test
    final class Poller(id: Int) extends Thread {
      val http = HttpClient.newHttpClient()
      val topic = s"persistent/tenant-a/ns/bench-t${id % nTopics}"
      val ingestUs = new java.util.ArrayDeque[Long]()
      val pollUs = new java.util.ArrayDeque[Long]()
      val emptyUs = new java.util.ArrayDeque[Long]()
      var bad = 0
      def timed(r: HttpRequest, wantAny: Set[Int], sink: java.util.ArrayDeque[Long]): Unit = {
        val t0 = System.nanoTime()
        val resp = http.send(r, HttpResponse.BodyHandlers.ofString())
        val us = (System.nanoTime() - t0) / 1000
        if (wantAny(resp.statusCode())) sink.add(us) else bad += 1
      }
      def post(): HttpRequest = HttpRequest.newBuilder(
          URI.create(s"$base/v2/firehose/$topic"))
        .header("Authorization", s"Bearer $token")
        .POST(HttpRequest.BodyPublishers.ofString(
          s"""{"poller":$id,"seq":${ingestUs.size},"pad":"xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx"}"""))
        .build()
      def get(): HttpRequest = HttpRequest.newBuilder(
          URI.create(s"$base/v2/poll/$topic?batchSize=10"))
        .header("Authorization", s"Bearer $token")
        .GET().build()
      override def run(): Unit = {
        for (_ <- 1 to iters) {
          timed(post(), Set(200), ingestUs)
          timed(get(), Set(200, 204), pollUs)
          timed(get(), Set(204, 200), emptyUs)
        }
      }
    }

    // warmup: exercise ingest + poll + the codegen/parquet paths once per
    // topic so the timed loop doesn't absorb first-touch JIT/IO costs
    {
      val w = new Poller(0)
      for (t <- 0 until nTopics) {
        val p = new Poller(t)
        p.timed(p.post(), Set(200), p.ingestUs)
        p.timed(p.get(), Set(200, 204), p.pollUs)
      }
      w.http.send(w.get(), HttpResponse.BodyHandlers.ofString())
    }

    val pollers = (0 until nPollers).map(new Poller(_))
    val t0 = System.nanoTime()
    pollers.foreach(_.start())
    pollers.foreach(_.join())
    val wallSec = (System.nanoTime() - t0) / 1e9
    val loadEnd = loadavg

    import scala.jdk.CollectionConverters._
    def q(all: Seq[Long]): String = {
      val s = all.sorted
      def at(p: Double): Long = if (s.isEmpty) -1 else s((p * (s.length - 1)).round.toInt)
      s"""{"n":${s.length},"p50_us":${at(0.50)},"p90_us":${at(0.90)},"p99_us":${at(0.99)},"max_us":${if (s.isEmpty) -1 else s.last}}"""
    }
    val ing = pollers.flatMap(_.ingestUs.asScala)
    val pol = pollers.flatMap(_.pollUs.asScala)
    val emp = pollers.flatMap(_.emptyUs.asScala)
    val bad = pollers.map(_.bad).sum
    val totalReqs = ing.size + pol.size + emp.size
    val rps = totalReqs / wallSec
    val line =
      s"""{"metric":"serve_latency","pollers":$nPollers,"topics":$nTopics,"iters":$iters,""" +
      s""""wall_sec":${f"$wallSec%.2f"},"req_per_sec":${f"$rps%.1f"},"bad":$bad,""" +
      s""""ingest":${q(ing)},"poll":${q(pol)},"empty_poll":${q(emp)},""" +
      s""""loadavg":[${f"$loadStart%.2f"},${f"$loadEnd%.2f"}]}"""
    val stamp = java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss")
      .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())
    val out = sys.env.getOrElse("SERVE_BENCH_OUT", s"bench_runs/serve_bench_$stamp.json")
    val outPath = java.nio.file.Paths.get(out)
    if (outPath.getParent != null) java.nio.file.Files.createDirectories(outPath.getParent)
    java.nio.file.Files.writeString(outPath, line + "\n")
    server.stop()
    spark.stop()
    println(line)
    if (bad > 0) sys.exit(1)
  }
}
