package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.serve.{BeamServer, Jwt}
import graft.store.InMemoryStore
import graft.topics.TopicTable

/** HTTP shim tests (SURVEY.md §2.C route surface; status-code contract from
  * ref src/docs/api.go:8-176 and unit-test/handlers_test.go).
  */
class ServeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-serve-test")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val kp     = Jwt.generateKeyPair()
  private lazy val topics = new TopicTable(spark, Files.createTempDirectory("graft-serve").toString)
  private lazy val store  = new InMemoryStore
  private lazy val server = new BeamServer(topics, store, kp)
  private lazy val base   = { server.start(); s"http://localhost:${server.boundPort}" }
  private val http        = HttpClient.newHttpClient()

  override def afterAll(): Unit = { server.stop(); spark.stop() }

  private def req(method: String, path: String, body: String = "",
      headers: Map[String, String] = Map.empty): HttpResponse[String] = {
    var b = HttpRequest.newBuilder(URI.create(base + path))
    // generic method() so GET/DELETE can carry a body (the reference's
    // key-less /v2/topic routes read {topicFullName, pulsarURL} from it)
    b = b.method(method,
      if (body.isEmpty) HttpRequest.BodyPublishers.noBody()
      else HttpRequest.BodyPublishers.ofString(body))
    headers.foreach { case (k, v) => b = b.header(k, v) }
    http.send(b.build(), HttpResponse.BodyHandlers.ofString())
  }

  private def auth(sub: String) = Map("Authorization" -> s"Bearer ${Jwt.sign(sub, kp.getPrivate)}")

  test("status requires an auth header (ref routes.go:86-92)") {
    assert(req("GET", "/status").statusCode() == 401)
    assert(req("GET", "/status", headers = Map("Authorization" -> "anything")).statusCode() == 200)
  }

  test("v1 firehose needs TopicFn; v2 firehose + poll round-trip with JWT") {
    assert(req("POST", "/v1/firehose", "x").statusCode() == 422)

    // unauthenticated + wrong-tenant rejections (ref handlers_test.go:96-111)
    assert(req("POST", "/v2/firehose/persistent/tenant-a/ns/t1", "x").statusCode() == 401)
    assert(req("POST", "/v2/firehose/persistent/tenant-a/ns/t1", "x",
      auth("tenant-b")).statusCode() == 403)

    // happy path: 2 ingests (one suffix-rule subject), then poll
    assert(req("POST", "/v2/firehose/persistent/tenant-a/ns/t1", """{"n":1}""",
      auth("tenant-a")).statusCode() == 200)
    assert(req("POST", "/v2/firehose/persistent/tenant-a/ns/t1", """{"n":2}""",
      auth("tenant-a-client0")).statusCode() == 200)

    val poll = req("GET", "/v2/poll/persistent/tenant-a/ns/t1?batchSize=5", headers = auth("tenant-a"))
    assert(poll.statusCode() == 200)
    assert(poll.body().contains(""""size":2"""))
    assert(poll.body().contains("""{\"n\":1}""")) // payload JSON-escaped in envelope

    // empty topic → 204 (ref docs/api.go:106-109)
    assert(req("GET", "/v2/poll/persistent/tenant-a/ns/empty", headers = auth("tenant-a"))
      .statusCode() == 204)
  }

  test("/metrics serves Prometheus text and counters move with traffic (O-34)") {
    def scrape(): String = {
      val r = req("GET", "/metrics")
      assert(r.statusCode() == 200)
      assert(r.headers().firstValue("Content-Type").orElse("").startsWith("text/plain"))
      r.body()
    }
    def counter(body: String, line: String): Long =
      body.linesIterator.collectFirst {
        case l if l.startsWith(line) => l.substring(l.lastIndexOf(' ') + 1).toLong
      }.getOrElse(0L)

    val before   = scrape()
    val ingested = counter(before, "graft_messages_ingested_total")
    val polled   = counter(before, "graft_messages_polled_total")

    assert(req("POST", "/v2/firehose/persistent/tenant-m/ns/mt", """{"m":1}""",
      auth("tenant-m")).statusCode() == 200)
    assert(req("GET", "/v2/poll/persistent/tenant-m/ns/mt?batchSize=5",
      headers = auth("tenant-m")).statusCode() == 200)

    val after = scrape()
    assert(counter(after, "graft_messages_ingested_total") == ingested + 1)
    assert(counter(after, "graft_messages_polled_total") == polled + 1)
    // the poll request itself was counted, with route + status labels
    assert(after.contains("""graft_http_requests_total{route="v2/poll",code="200"}"""))
    assert(after.contains("graft_streaming_queries_active"))
  }

  test("/api-docs documents every served route with its status codes") {
    val r = req("GET", "/api-docs")
    assert(r.statusCode() == 200)
    val body = r.body()
    // parses as JSON (the shim's writer escapes everything it emits)
    assert(body.startsWith("{") && body.contains("\"openapi\":\"3.0.0\""))
    // every route the server matches appears in the doc
    for (path <- Seq("/status", "/metrics", "/api-docs", "/debug/threads",
        "/debug/profile", "/debug/heap", "/v1/firehose",
        "/v2/firehose/{persistent}/{tenant}/{namespace}/{topic}",
        "/v2/poll/{persistent}/{tenant}/{namespace}/{topic}",
        "/v2/sse/{persistent}/{tenant}/{namespace}/{topic}",
        "/v2/topic", "/v2/topic/{key}", "/subject/{subject}"))
      assert(body.contains(graft.store.Json.str(path)), s"missing $path")
    // contract spot-checks against live behavior elsewhere in this suite:
    // poll documents 204-at-empty, token minting documents 403
    assert(graft.serve.ApiDocs.routes
      .find(r => r.method == "GET" && r.path.startsWith("/v2/poll")).get
      .responses.contains(204))
    assert(graft.serve.ApiDocs.routes
      .find(_.path == "/subject/{subject}").get.responses.contains(403))
  }

  test("poll honors the per-message gap timer (long poll, ref sse-broker.go:48-58)") {
    // empty topic: the batch assembly waits the full gap before 204
    val t0 = System.nanoTime()
    val empty = req("GET",
      "/v2/poll/persistent/tenant-a/ns/lp?batchSize=2&perMessageTimeoutMs=500",
      headers = auth("tenant-a"))
    val e0 = (System.nanoTime() - t0) / 1e6
    assert(empty.statusCode() == 204)
    assert(e0 >= 450, s"empty poll returned after only $e0 ms")

    // a message arriving INSIDE the window is picked up, and a full batch
    // returns at arrival rather than sitting out the timer
    val ing = new Thread(() => {
      Thread.sleep(300)
      req("POST", "/v2/firehose/persistent/tenant-a/ns/lp", "late-arrival",
        auth("tenant-a"))
    })
    ing.start()
    val t1 = System.nanoTime()
    val got = req("GET",
      "/v2/poll/persistent/tenant-a/ns/lp?batchSize=1&perMessageTimeoutMs=10000",
      headers = auth("tenant-a"))
    val e1 = (System.nanoTime() - t1) / 1e6
    ing.join()
    assert(got.statusCode() == 200 && got.body().contains("late-arrival"))
    assert(e1 < 9000, s"long poll should return at arrival, took $e1 ms")

    // explicit 0 restores the immediate local answer
    val t2 = System.nanoTime()
    assert(req("GET",
      "/v2/poll/persistent/tenant-a/ns/lp2?batchSize=1&perMessageTimeoutMs=0",
      headers = auth("tenant-a")).statusCode() == 204)
    assert((System.nanoTime() - t2) / 1e6 < 400)
  }

  test("run modes mount only their route groups (O-33, ref main_control.go + router.go)") {
    import graft.serve.RunMode
    // predicate table straight from the reference
    assert(RunMode.brokerRequired("broker") && RunMode.brokerRequired("hybrid"))
    assert(!RunMode.brokerRequired("http") && !RunMode.routerRequired("broker"))
    assert(!RunMode.isValid("bogus"))
    assertThrows[IllegalArgumentException](
      new BeamServer(topics, store, kp, mode = "bogus"))
    assertThrows[IllegalArgumentException](
      new BeamServer(topics, store, kp, mode = "broker"))

    // a tokenserver only mints tokens; receiver/rest routes are not mounted
    val ts = new BeamServer(topics, store, kp, mode = "tokenserver")
    ts.start()
    try {
      val b = s"http://localhost:${ts.boundPort}"
      def get(p: String) = http.send(
        java.net.http.HttpRequest.newBuilder(URI.create(b + p))
          .headers("Authorization", s"Bearer ${Jwt.sign("superuser", kp.getPrivate)}")
          .build(), HttpResponse.BodyHandlers.ofString())
      assert(get("/subject/someone").statusCode() == 200)
      assert(get("/status").statusCode() == 404)
      assert(get("/v2/topic/k1").statusCode() == 404)
      assert(get("/metrics").statusCode() == 200) // unconditional, like prom/pprof
    } finally ts.stop()

    // rest mode: topic CRUD mounted, ingest + token minting are not
    val rest = new BeamServer(topics, store, kp, mode = "rest")
    rest.start()
    try {
      val b = s"http://localhost:${rest.boundPort}"
      def req2(m: String, p: String) = http.send(
        java.net.http.HttpRequest.newBuilder(URI.create(b + p))
          .method(m, java.net.http.HttpRequest.BodyPublishers.ofString("x"))
          .headers("Authorization", s"Bearer ${Jwt.sign("tenant-a", kp.getPrivate)}")
          .build(), HttpResponse.BodyHandlers.ofString())
      assert(req2("GET", "/v2/topic/nope").statusCode() == 404) // mounted: real lookup miss
      assert(req2("POST", "/v1/firehose").statusCode() == 404)  // not mounted
      assert(req2("GET", "/subject/someone").statusCode() == 404)
      assert(req2("POST", "/v2/firehose/persistent/tenant-a/ns/t1").statusCode() == 404)
    } finally rest.stop()
  }

  test("CORS: allow-listed origin echoed with credentials; preflight answered (ref main.go:44-49)") {
    // preflight from an allowed origin
    val pre = req("OPTIONS", "/v2/topic", headers = Map(
      "Origin" -> "http://localhost:8080",
      "Access-Control-Request-Method" -> "POST"))
    assert(pre.statusCode() == 204)
    assert(pre.headers().firstValue("Access-Control-Allow-Origin").orElse("") ==
      "http://localhost:8080")
    assert(pre.headers().firstValue("Access-Control-Allow-Headers").orElse("")
      .contains("Authorization"))
    assert(pre.headers().firstValue("Access-Control-Allow-Methods").orElse("") == "POST")

    // normal request carries the allow header; disallowed origin gets none
    val ok = req("GET", "/status", headers = Map(
      "Origin" -> "http://localhost:8085", "Authorization" -> "x"))
    assert(ok.statusCode() == 200)
    assert(ok.headers().firstValue("Access-Control-Allow-Origin").orElse("") ==
      "http://localhost:8085")
    val bad = req("GET", "/status", headers = Map(
      "Origin" -> "http://evil.example", "Authorization" -> "x"))
    assert(bad.statusCode() == 200) // API itself stays open; browser enforces
    assert(bad.headers().firstValue("Access-Control-Allow-Origin").isEmpty)
  }

  test("/debug/threads is a superrole-gated thread dump (pprof analog)") {
    assert(req("GET", "/debug/threads").statusCode() == 401)
    assert(req("GET", "/debug/threads", headers = auth("tenant-a")).statusCode() == 403)
    val dump = req("GET", "/debug/threads", headers = auth("superuser"))
    assert(dump.statusCode() == 200)
    assert(dump.body().contains("graft-cert-reloader") || dump.body().contains("main"))
  }

  test("/debug/profile and /debug/heap are superrole-gated pprof analogs") {
    assert(req("GET", "/debug/profile").statusCode() == 401)
    assert(req("GET", "/debug/profile", headers = auth("tenant-a")).statusCode() == 403)
    // keep a thread busy so the RUNNABLE sampler has something to count
    @volatile var stop = false
    val burner = new Thread(() => { var x = 0L; while (!stop) x += 1 }, "graft-burn")
    burner.setDaemon(true); burner.start()
    try {
      val prof = req("GET", "/debug/profile?seconds=1", headers = auth("superuser"))
      assert(prof.statusCode() == 200)
      assert(prof.body().startsWith("samples="), prof.body().take(80))
      assert(prof.body().linesIterator.size >= 2, "no frames sampled")
    } finally { stop = true }
    // cap: seconds clamps to [1, 10]
    assert(req("GET", "/debug/profile?seconds=0", headers = auth("superuser")).statusCode() == 200)

    assert(req("GET", "/debug/heap", headers = auth("tenant-a")).statusCode() == 403)
    val heap = req("GET", "/debug/heap", headers = auth("superuser"))
    assert(heap.statusCode() == 200)
    assert(heap.body().contains("\"heap\"") && heap.body().contains("\"gc\""))
    assert(heap.body().contains("\"used\""))
  }

  test("topic CRUD over HTTP with tenant auth") {
    val cfgJson =
      """{"topicFullName":"persistent://tenant-c/ns/hooked","pulsarURL":"pulsar://broker0:6650",
        |"tenant":"tenant-c","notes":"via-http","webhooks":[
        |{"url":"http://localhost:1/nope","subscription":"sub-http","subscriptionType":"exclusive",
        |"initialPosition":"earliest","webhookStatus":1}]}""".stripMargin
    assert(req("POST", "/v2/topic", cfgJson).statusCode() == 401)
    assert(req("POST", "/v2/topic", cfgJson, auth("tenant-x")).statusCode() == 403)

    val created = req("POST", "/v2/topic", cfgJson, auth("tenant-c"))
    assert(created.statusCode() == 201)
    val key = """"key":"([0-9a-f]{40})"""".r.findFirstMatchIn(created.body()).get.group(1)

    val got = req("GET", s"/v2/topic/$key", headers = auth("tenant-c"))
    assert(got.statusCode() == 200)
    assert(got.body().contains("sub-http"))
    assert(req("GET", s"/v2/topic/$key", headers = auth("tenant-x")).statusCode() == 403)

    // superrole can read and delete any topic (ref O-25)
    assert(req("GET", s"/v2/topic/$key", headers = auth("superuser")).statusCode() == 200)
    assert(req("DELETE", s"/v2/topic/$key", headers = auth("tenant-c")).statusCode() == 200)
    assert(req("GET", s"/v2/topic/$key", headers = auth("tenant-c")).statusCode() == 404)

    // malformed body → 422 (ref handlers_test.go TestTopicHandler)
    assert(req("POST", "/v2/topic", """{"nope":1}""", auth("tenant-c")).statusCode() == 422)

    // key-less GET/DELETE derive the key from the body (ref GetTopicKey)
    val cfg2 =
      """{"topicFullName":"persistent://tenant-c/ns/bykey","pulsarURL":"pulsar://broker0:6650",
        |"tenant":"tenant-c","webhooks":[]}""".stripMargin
    assert(req("POST", "/v2/topic", cfg2, auth("tenant-c")).statusCode() == 201)
    val lookupBody =
      """{"topicFullName":"persistent://tenant-c/ns/bykey","pulsarURL":"pulsar://broker0:6650"}"""
    val byBody = req("GET", "/v2/topic", lookupBody, auth("tenant-c"))
    assert(byBody.statusCode() == 200)
    assert(byBody.body().contains("persistent://tenant-c/ns/bykey"))
    assert(req("GET", "/v2/topic", """{"oops":1}""", auth("tenant-c")).statusCode() == 422)
    assert(req("DELETE", "/v2/topic", lookupBody, auth("tenant-c")).statusCode() == 200)
    assert(req("GET", "/v2/topic", lookupBody, auth("tenant-c")).statusCode() == 404)
  }

  test("token minting is superrole-only (ref handlers.go:41-68)") {
    assert(req("GET", "/subject/newrole", headers = auth("tenant-a")).statusCode() == 403)
    val minted = req("GET", "/subject/newrole", headers = auth("superuser"))
    assert(minted.statusCode() == 200)
    val token = """"token":"([^"]+)"""".r.findFirstMatchIn(minted.body()).get.group(1)
    assert(Jwt.verify(token, kp.getPublic) == Right("newrole"))
  }

  test("SSE streams existing and new messages as id/data frames (O-8)") {
    val fn = "persistent://tenant-s/ns/ssetopic"
    assert(req("POST", "/v2/firehose/persistent/tenant-s/ns/ssetopic", "first",
      auth("tenant-s")).statusCode() == 200)

    val sseReq = HttpRequest.newBuilder(
        URI.create(base + "/v2/sse/persistent/tenant-s/ns/ssetopic?initialPosition=earliest"))
      .header("Authorization", s"Bearer ${Jwt.sign("tenant-s", kp.getPrivate)}")
      .GET().build()
    val resp = http.send(sseReq, HttpResponse.BodyHandlers.ofInputStream())
    assert(resp.statusCode() == 200)
    assert(resp.headers().firstValue("Content-Type").orElse("") == "text/event-stream")

    val reader = new java.io.BufferedReader(new java.io.InputStreamReader(resp.body()))
    def readFrame(): (String, String) = {
      var id = ""; var data = ""
      var line = reader.readLine()
      while (line != null && (line.isEmpty || line.startsWith(":"))) line = reader.readLine()
      while (line != null && line.nonEmpty) {
        if (line.startsWith("id: ")) id = line.drop(4)
        if (line.startsWith("data: ")) data = line.drop(6)
        line = reader.readLine()
      }
      (id, data)
    }
    val (id1, data1) = readFrame()
    assert(id1.nonEmpty && data1 == "first")

    // a message published while connected is pushed
    assert(req("POST", "/v2/firehose/persistent/tenant-s/ns/ssetopic", "second",
      auth("tenant-s")).statusCode() == 200)
    val (_, data2) = readFrame()
    assert(data2 == "second")
    resp.body().close() // disconnect ends the server-side loop
  }

  test("named-subscription poll is destructive: batch #2 is the NEXT batch, 204 at exhaustion (O-6/O-12)") {
    for (n <- 1 to 3)
      assert(req("POST", "/v2/firehose/persistent/tenant-d/ns/drain", s"msg$n",
        auth("tenant-d")).statusCode() == 200)

    val p1 = req("GET", "/v2/poll/persistent/tenant-d/ns/drain?batchSize=2&subscriptionName=drain-sub",
      headers = auth("tenant-d"))
    assert(p1.statusCode() == 200)
    assert(p1.body().contains(""""size":2"""))
    assert(p1.body().contains("msg1") && p1.body().contains("msg2") && !p1.body().contains("msg3"))

    // consumption advanced: second poll returns only the remaining message
    val p2 = req("GET", "/v2/poll/persistent/tenant-d/ns/drain?batchSize=2&subscriptionName=drain-sub",
      headers = auth("tenant-d"))
    assert(p2.statusCode() == 200)
    assert(p2.body().contains(""""size":1""") && p2.body().contains("msg3"))

    // exhausted subscription → 204 (ref docs/api.go:106-109)
    assert(req("GET", "/v2/poll/persistent/tenant-d/ns/drain?batchSize=2&subscriptionName=drain-sub",
      headers = auth("tenant-d")).statusCode() == 204)

    // an unnamed poll is a fresh non-resumable subscription: earliest again
    val fresh = req("GET", "/v2/poll/persistent/tenant-d/ns/drain?batchSize=5", headers = auth("tenant-d"))
    assert(fresh.statusCode() == 200)
    assert(fresh.body().contains(""""size":3"""))

    // short names rejected (ref handlers.go:455-459)
    assert(req("GET", "/v2/poll/persistent/tenant-d/ns/drain?subscriptionName=abc",
      headers = auth("tenant-d")).statusCode() == 422)

    // SSE validates the same consumer params (ref ConsumerConfigFromHTTPParts)
    assert(req("GET", "/v2/sse/persistent/tenant-d/ns/drain?subscriptionType=bogus",
      headers = auth("tenant-d")).statusCode() == 422)
    assert(req("GET", "/v2/sse/persistent/tenant-d/ns/drain?initialPosition=middle",
      headers = auth("tenant-d")).statusCode() == 422)
  }

  test("includeHeaders wraps the payload in the InfoRichMessage envelope (O-3)") {
    assert(req("POST", "/v1/firehose?includeHeaders=true", "plain-body",
      Map("TopicFn" -> "persistent://tenant-h/ns/rich", "X-Custom-Tag" -> "tag42"))
      .statusCode() == 200)
    val rows = topics.poll("persistent://tenant-h/ns/rich", 1).collect()
    val payload = new String(rows(0).getAs[Array[Byte]]("payload"))
    assert(payload.contains(""""body":"plain-body""""))
    assert(payload.contains(""""headers""""))
    assert(payload.contains("tag42"))
    // explicit false opts out (ref handlers.go:111)
    assert(req("POST", "/v1/firehose?includeHeaders=false", "bare",
      Map("TopicFn" -> "persistent://tenant-h/ns/rich2")).statusCode() == 200)
    val bare = topics.poll("persistent://tenant-h/ns/rich2", 1).collect()
    assert(new String(bare(0).getAs[Array[Byte]]("payload")) == "bare")
  }

  test("PulsarUrl header is enforced against allowed clusters (ref util.go:61-75)") {
    assert(req("POST", "/v1/firehose", "x",
      Map("TopicFn" -> "persistent://tenant-u/ns/t", "PulsarUrl" -> "pulsar://rogue:6650"))
      .statusCode() == 401)
    assert(req("POST", "/v1/firehose", "x",
      Map("TopicFn" -> "persistent://tenant-u/ns/t", "PulsarUrl" -> "pulsar://localhost:6650"))
      .statusCode() == 200)
    // ?mode=async accepted on the same route (O-5, ref handlers.go:131)
    assert(req("POST", "/v1/firehose?mode=async", "y",
      Map("TopicFn" -> "persistent://tenant-u/ns/t")).statusCode() == 200)
  }

  test("header TopicFn overrides the v2 route topic (ref handlers.go:128)") {
    assert(req("POST", "/v2/firehose/persistent/tenant-o/ns/routed", "overridden",
      auth("tenant-o") + ("TopicFn" -> "persistent://tenant-o/ns/actual")).statusCode() == 200)
    assert(topics.poll("persistent://tenant-o/ns/routed", 1).collect().isEmpty)
    val rows = topics.poll("persistent://tenant-o/ns/actual", 1).collect()
    assert(new String(rows(0).getAs[Array[Byte]]("payload")) == "overridden")

    // the override is authorized against the EFFECTIVE topic's tenant —
    // a tenant-o token cannot write into tenant-z through the header
    assert(req("POST", "/v2/firehose/persistent/tenant-o/ns/routed", "smuggled",
      auth("tenant-o") + ("TopicFn" -> "persistent://tenant-z/ns/leak")).statusCode() == 403)
    assert(topics.poll("persistent://tenant-z/ns/leak", 1).collect().isEmpty)
    // and a garbage header topic cannot be authorized at all
    assert(req("POST", "/v2/firehose/persistent/tenant-o/ns/routed", "x",
      auth("tenant-o") + ("TopicFn" -> "not-a-topic")).statusCode() == 403)
  }

  test("webhook delivery headers survive the topic-config POST (O-11)") {
    val cfg =
      """{"topicFullName":"persistent://tenant-w/ns/hdrs","pulsarURL":"pulsar://broker0:6650",
        |"tenant":"tenant-w","webhooks":[
        |{"url":"http://localhost:1/h","headers":["Authorization: Bearer wh-token","X-Trace: on"],
        |"subscription":"sub-hdr","subscriptionType":"exclusive",
        |"initialPosition":"earliest","webhookStatus":1}]}""".stripMargin
    val created = req("POST", "/v2/topic", cfg, auth("tenant-w"))
    assert(created.statusCode() == 201)
    assert(created.body().contains("Authorization: Bearer wh-token"))
    assert(created.body().contains("X-Trace: on"))
  }

  test("idle SSE connection launches no per-tick Spark jobs (shared hub push)") {
    assert(req("POST", "/v2/firehose/persistent/tenant-i/ns/idle", "seed",
      auth("tenant-i")).statusCode() == 200)
    val sseReq = HttpRequest.newBuilder(
        URI.create(base + "/v2/sse/persistent/tenant-i/ns/idle"))
      .header("Authorization", s"Bearer ${Jwt.sign("tenant-i", kp.getPrivate)}")
      .GET().build()
    val resp = http.send(sseReq, HttpResponse.BodyHandlers.ofInputStream())
    assert(resp.statusCode() == 200)
    val reader = new java.io.BufferedReader(new java.io.InputStreamReader(resp.body()))
    // first keepalive ⇒ subscription (and its registration jobs) completed
    assert(reader.readLine().startsWith(":keepalive"))

    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    Thread.sleep(3000) // ≥ 15 trigger intervals; the old poll loop ran a job per tick
    spark.sparkContext.removeSparkListener(listener)
    assert(jobs <= 2, s"idle SSE connection launched $jobs Spark jobs")
    resp.body().close()
  }

  test("gzip ingest decodes before publish (O-2)") {
    val bos = new java.io.ByteArrayOutputStream()
    val gz  = new java.util.zip.GZIPOutputStream(bos)
    gz.write("""{"zipped":true}""".getBytes); gz.close()
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(base + "/v2/firehose/persistent/tenant-g/ns/gz"))
        .POST(HttpRequest.BodyPublishers.ofByteArray(bos.toByteArray))
        .header("Content-Encoding", "gzip")
        .header("Authorization", s"Bearer ${Jwt.sign("tenant-g", kp.getPrivate)}")
        .build(),
      HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() == 200)
    val rows = topics.poll("persistent://tenant-g/ns/gz", 1).collect()
    assert(new String(rows(0).getAs[Array[Byte]]("payload")) == """{"zipped":true}""")
  }
}
