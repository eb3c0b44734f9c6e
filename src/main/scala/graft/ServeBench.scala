package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.serve.{BeamServer, Jwt}
import graft.store.InMemoryStore
import graft.topics.TopicTable

/** Serving-path latency envelope (r12 verdict item 6; extended round 14 per
  * the r13 verdict item 5): StreamBench measures pipeline cadence, but the
  * serve layer's one implied reference SLA — the e2e test's <121 s
  * ingest→deliver bound (reference src/e2e/e2etest.go) — had specs and no
  * measured counterpart. This drives the REAL HTTP stack (BeamServer routes,
  * JWT auth, the 200-slot semaphore, TopicTable parquet segments) with N
  * concurrent pollers over M topics and reports per-op latency quantiles.
  *
  * Workload per poller iteration, round-robin over its topic:
  *   1. POST /v2/firehose (~120 B JSON payload) — ingest latency
  *   2. GET  /v2/poll?batchSize=10              — drain-poll step
  *   3. GET  /v2/poll on the now-empty topic    — empty-poll step
  * The destructive cursor makes each iteration self-cleaning, so the
  * segment directory stays bounded and every poll measures the same work.
  *
  * Round-14 changes:
  *  - Per-STATUS quantiles (`poll_200` / `poll_204`) beside the per-step
  *    ones: with pollers > topics the drain and empty steps interleave
  *    across threads and both see {200, 204}, so the step labels alone
  *    don't measure what they claim (ADVICE r13 item 1).
  *  - 429s are COUNTED (`n_429`), not failures: the 200-slot semaphore's
  *    saturation point is the measurement, not an error (VERDICT r13 item
  *    5). `bad` keeps meaning "status nobody expected".
  *  - SERVE_BENCH_SWEEP="32,64,128,256" runs the loop at each concurrency
  *    against one server instance to locate the knee; one JSON line with a
  *    `levels` array.
  *  - SSE push path: publish→client-received latency through GET /v2/sse
  *    (the webhook/SSE delivery side the reference's e2e bound is about),
  *    SERVE_BENCH_PUSH_MSGS per topic (default 30, 0 disables).
  *
  * Env knobs: SERVE_BENCH_POLLERS (default 32), SERVE_BENCH_TOPICS (8),
  * SERVE_BENCH_ITERS (per poller, 50), SERVE_BENCH_SWEEP, SERVE_BENCH_PUSH_MSGS,
  * SPARK_GRAFT_CPUS (32).
  * Output: one JSON line (+ bench_runs/ artifact, same contract as Bench).
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nPollers = sys.env.getOrElse("SERVE_BENCH_POLLERS", "32").toInt
    val nTopics = sys.env.getOrElse("SERVE_BENCH_TOPICS", "8").toInt
    val iters = sys.env.getOrElse("SERVE_BENCH_ITERS", "50").toInt
    val sweep: Seq[Int] = sys.env.get("SERVE_BENCH_SWEEP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq)
      .getOrElse(Seq(nPollers))
    val pushMsgs = sys.env.getOrElse("SERVE_BENCH_PUSH_MSGS", "30").toInt
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
    final class Poller(id: Int, topicsN: Int) extends Thread {
      val http = HttpClient.newHttpClient()
      val topic = s"persistent/tenant-a/ns/bench-t${id % topicsN}"
      // (status, us) per step — statuses are classified AFTER the run so
      // the per-status quantiles describe what each request actually did
      val ingestS = new java.util.ArrayDeque[(Int, Long)]()
      val pollS = new java.util.ArrayDeque[(Int, Long)]()
      val emptyS = new java.util.ArrayDeque[(Int, Long)]()
      def timed(r: HttpRequest, sink: java.util.ArrayDeque[(Int, Long)]): Unit = {
        val t0 = System.nanoTime()
        val resp = http.send(r, HttpResponse.BodyHandlers.ofString())
        val us = (System.nanoTime() - t0) / 1000
        sink.add((resp.statusCode(), us)); ()
      }
      def post(): HttpRequest = HttpRequest.newBuilder(
          URI.create(s"$base/v2/firehose/$topic"))
        .header("Authorization", s"Bearer $token")
        .POST(HttpRequest.BodyPublishers.ofString(
          s"""{"poller":$id,"seq":${ingestS.size},"pad":"xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx"}"""))
        .build()
      def get(): HttpRequest = HttpRequest.newBuilder(
          URI.create(s"$base/v2/poll/$topic?batchSize=10"))
        .header("Authorization", s"Bearer $token")
        .GET().build()
      override def run(): Unit = {
        for (_ <- 1 to iters) {
          timed(post(), ingestS)
          timed(get(), pollS)
          timed(get(), emptyS)
        }
      }
    }

    // warmup: exercise ingest + poll + the codegen/parquet paths once per
    // topic so the timed loop doesn't absorb first-touch JIT/IO costs
    {
      val w = new Poller(0, nTopics)
      for (t <- 0 until nTopics) {
        val p = new Poller(t, nTopics)
        p.timed(p.post(), p.ingestS)
        p.timed(p.get(), p.pollS)
      }
      w.http.send(w.get(), HttpResponse.BodyHandlers.ofString())
    }

    import scala.jdk.CollectionConverters._
    def q(all: Seq[Long]): String = {
      val s = all.sorted
      def at(p: Double): Long = if (s.isEmpty) -1 else s((p * (s.length - 1)).round.toInt)
      s"""{"n":${s.length},"p50_us":${at(0.50)},"p90_us":${at(0.90)},"p99_us":${at(0.99)},"max_us":${if (s.isEmpty) -1 else s.last}}"""
    }

    /** One concurrency level against the shared server; returns the JSON
      * fragment for this level. 429s count toward n_429 (the semaphore
      * doing its job — the number the knee sweep exists to find); any other
      * unexpected status is `bad`.
      */
    def runLevel(n: Int): (String, Int) = {
      val pollers = (0 until n).map(new Poller(_, nTopics))
      val t0 = System.nanoTime()
      pollers.foreach(_.start())
      pollers.foreach(_.join())
      val wallSec = (System.nanoTime() - t0) / 1e9
      val ing = pollers.flatMap(_.ingestS.asScala)
      val pol = pollers.flatMap(_.pollS.asScala)
      val emp = pollers.flatMap(_.emptyS.asScala)
      val all = ing ++ pol ++ emp
      val n429 = all.count(_._1 == 429)
      val bad = ing.count(s => s._1 != 200 && s._1 != 429) +
        (pol ++ emp).count(s => s._1 != 200 && s._1 != 204 && s._1 != 429)
      val ok = all.filter(_._1 != 429)
      val rps = all.size / wallSec
      val frag =
        s"""{"pollers":$n,"wall_sec":${f"$wallSec%.2f"},"req_per_sec":${f"$rps%.1f"},""" +
        s""""n_429":$n429,"bad":$bad,""" +
        s""""ingest":${q(ing.filter(_._1 == 200).map(_._2))},""" +
        s""""poll":${q(pol.filter(s => s._1 == 200 || s._1 == 204).map(_._2))},""" +
        s""""empty_poll":${q(emp.filter(s => s._1 == 200 || s._1 == 204).map(_._2))},""" +
        s""""poll_200":${q((pol ++ emp).filter(_._1 == 200).map(_._2))},""" +
        s""""poll_204":${q((pol ++ emp).filter(_._1 == 204).map(_._2))}}"""
      val _ = ok
      (frag, bad)
    }

    val levelResults = sweep.map(n => (n, runLevel(n)))
    val levelsJson = levelResults.map { case (n, (frag, _)) => frag }.mkString("[", ",", "]")
    val badTotal = levelResults.map(_._2._2).sum

    // ---- SSE push path: publish→client-received latency ----------------
    // One subscriber per topic on GET /v2/sse (HttpURLConnection — streams
    // chunked bodies line-by-line); publisher embeds System.nanoTime() in
    // the payload, subscriber parses it back out of the `data:` line. A
    // warmup message per topic absorbs the hub's streaming-query start.
    def pushPhase(): String = {
      // schema-consistent with the measuring branch (ADVICE r14): same
      // members, -1 quantile sentinels, zero lost
      if (pushMsgs <= 0)
        return """{"n":0,"lost":0,"p50_us":-1,"p90_us":-1,"p99_us":-1,"max_us":-1}"""
      val deltas = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      var lost = 0
      val http = HttpClient.newHttpClient()
      for (t <- 0 until nTopics) {
        val topic = s"persistent/tenant-a/ns/push-t$t"
        val url = new java.net.URL(s"$base/v2/sse/$topic")
        val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestProperty("Authorization", s"Bearer $token")
        conn.setReadTimeout(15000)
        conn.connect()
        val reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(conn.getInputStream, java.nio.charset.StandardCharsets.UTF_8))
        val received = new java.util.concurrent.atomic.AtomicInteger(0)
        val warmSeen = new java.util.concurrent.CountDownLatch(1)
        val doneLatch = new java.util.concurrent.CountDownLatch(1)
        val sub = new Thread(() => {
          try {
            var line = reader.readLine()
            while (line != null && received.get() < pushMsgs) {
              if (line.startsWith("data: ")) {
                val body = line.substring(6)
                val m = """"t0":(\d+)""".r.findFirstMatchIn(body)
                if (body.contains("\"warm\":1")) warmSeen.countDown()
                else m.foreach { mm =>
                  deltas.add(System.nanoTime() - mm.group(1).toLong)
                  received.incrementAndGet()
                }
              }
              line = if (received.get() < pushMsgs) reader.readLine() else null
            }
          } catch { case _: java.io.IOException => () }
          doneLatch.countDown()
        })
        sub.setDaemon(true)
        sub.start()
        def publish(body: String): Int = {
          val r = HttpRequest.newBuilder(URI.create(s"$base/v2/firehose/$topic"))
            .header("Authorization", s"Bearer $token")
            .POST(HttpRequest.BodyPublishers.ofString(body)).build()
          http.send(r, HttpResponse.BodyHandlers.ofString()).statusCode()
        }
        // warmup rides the hub's query start; bounded wait so a wedged hub
        // surfaces as lost samples, not a hang
        publish("""{"warm":1}""")
        warmSeen.await(30, java.util.concurrent.TimeUnit.SECONDS)
        for (i <- 1 to pushMsgs) {
          publish(s"""{"i":$i,"t0":${System.nanoTime()}}""")
          Thread.sleep(50) // one message per trigger window, not one batch
        }
        doneLatch.await(20, java.util.concurrent.TimeUnit.SECONDS)
        // lost = published − received however the subscriber exited: an
        // IOException death used to count the latch down with lost still 0
        // despite missing samples (ADVICE r14)
        lost += math.max(0, pushMsgs - received.get())
        conn.disconnect()
      }
      val ds = deltas.asScala.toSeq.map(_ / 1000L)
      // q() without its leading "n" — the count here is ds.size under the
      // key "n" already; the old `q(ds).drop(1)` splice carried a DUPLICATE
      // "n" member (ADVICE r14)
      s"""{"n":${ds.size},"lost":$lost,${q(ds).drop(1).replaceFirst("\"n\":\\d+,", "")}"""
    }
    val pushJson = pushPhase()

    val loadEnd = loadavg
    val line =
      s"""{"metric":"serve_latency","topics":$nTopics,"iters":$iters,""" +
      s""""levels":$levelsJson,"push_sse":$pushJson,""" +
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
    if (badTotal > 0) sys.exit(1)
  }
}
