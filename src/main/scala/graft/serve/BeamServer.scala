package graft.serve

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.security.KeyPair
import java.util.concurrent.Semaphore
import java.util.zip.GZIPInputStream

import scala.util.Try

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.model._
import graft.store.{Json => J, TopicStore}
import graft.topics.TopicTable

/** Thin HTTP shim over the engine (SURVEY.md §2.C routes, §7.1 `serve/`):
  * all semantics live in `topics/`/`store/`/`streaming/` — this layer only
  * binds routes, auth (O-24/O-25), rate limiting (O-27), and JSON bodies.
  *
  * Implemented routes (ref src/route/routes.go:25-160):
  *  - POST /v1/firehose                 (header TopicFn, NoAuth — ref :93-99)
  *  - POST /v2/firehose/{p}/{t}/{ns}/{topic}        (JWT — ref :100-106)
  *  - GET  /v2/poll/{p}/{t}/{ns}/{topic}?batchSize= (JWT — ref :114-120)
  *  - GET/POST/DELETE /v2/topic[/{key}]             (JWT — ref :124-160)
  *  - GET  /subject/{sub}               (superrole mints a token — ref :25-33)
  *  - GET  /status                      (ref :86-92)
  *  - GET  /metrics                     (O-34 Prometheus text — ref :36-44)
  *  - GET  /api-docs                    (route contract JSON — ref src/docs/api.go)
  *
  * The SSE route's push semantics live in [[graft.streaming.WebhookEngine]]
  * (a webhook is the reference's push path); poll covers the pull path.
  */
final class BeamServer(
    topics: TopicTable,
    store: TopicStore,
    keys: KeyPair,
    superRoles: Set[String] = Set("superuser"),
    port: Int = 0,
    allowedClusters: Seq[String] = Seq("pulsar://localhost:6650"),
    // O-32: (PKCS12 keystore path, password) → HTTPS with cert hot-reload;
    // None → plain HTTP, the reference's len(certFile)<=1 fallback
    // (ref cert-loader.go:62-67)
    tls: Option[(String, Array[Char])] = None,
    // O-33: which route groups this process mounts (ref ProcessMode). The
    // reference binary defaults to "hybrid" because it also hosts the
    // broker; this class is ONLY the router (the broker is WebhookEngine,
    // wired behind RunMode.brokerRequired), so the all-routes "http" mode
    // is the default and pure "broker" is invalid here.
    mode: String = "http",
    // CORS allow-list (ref src/main.go:44-49 rs/cors defaults)
    corsOrigins: Set[String] =
      Set("http://localhost:8085", "http://localhost:8080")) {

  require(RunMode.isValid(mode), s"unsupported server mode $mode") // ref main.go:36
  require(RunMode.routerRequired(mode), "broker mode runs no HTTP router (ref main_control.go:32-35)")
  private val enabledGroups = RunMode.routeGroups(mode)

  private val sema = new Semaphore(200) // O-27, ref middleware.go:13-18
  private val certReloader = tls.map { case (ks, pw) => new CertReloader(ks, pw) }
  private val server = certReloader match {
    case Some(r) =>
      val s = com.sun.net.httpserver.HttpsServer.create(new InetSocketAddress(port), 0)
      s.setHttpsConfigurator(new com.sun.net.httpserver.HttpsConfigurator(r.context))
      r.start()
      s
    case None => HttpServer.create(new InetSocketAddress(port), 0)
  }
  // thread-per-request so a long-lived SSE connection can't starve routes
  server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())

  private val sseHub = new graft.streaming.SseHub(topics)

  /** O-34: request/message counters + streaming-query progress, served at
    * GET /metrics in Prometheus text format (ref src/route/routes.go:36-82).
    */
  val metrics = new Metrics
  metrics.observe(topics.session)

  def boundPort: Int = server.getAddress.getPort
  def start(): Unit  = server.start()
  def stop(): Unit = {
    certReloader.foreach(_.stop())
    metrics.unobserve(topics.session)
    sseHub.stopAll()
    server.stop(0)
  }

  /** Mint a token for tests/clients (O-26). */
  def mintToken(subject: String): String = Jwt.sign(subject, keys.getPrivate)

  /** CORS middleware (ref src/main.go:44-49): echo an allow-listed Origin
    * with credentials; answer preflights with the reference's allowed
    * headers. A disallowed Origin gets no CORS headers — the browser
    * blocks it, the API itself stays open (rs/cors behavior).
    */
  private def cors(ex: HttpExchange): Boolean = {
    val origin = Option(ex.getRequestHeaders.getFirst("Origin")).filter(corsOrigins)
    origin.foreach { o =>
      ex.getResponseHeaders.set("Access-Control-Allow-Origin", o)
      ex.getResponseHeaders.set("Access-Control-Allow-Credentials", "true")
    }
    if (ex.getRequestMethod == "OPTIONS") {
      origin.foreach { _ =>
        ex.getResponseHeaders.set("Access-Control-Allow-Headers",
          "Authorization, PulsarTopicUrl")
        ex.getResponseHeaders.set("Access-Control-Allow-Methods",
          Option(ex.getRequestHeaders.getFirst("Access-Control-Request-Method"))
            .getOrElse("GET, POST, DELETE"))
      }
      ex.sendResponseHeaders(204, -1)
      ex.close()
      true // preflight handled, skip routing
    } else false
  }

  /** Metric label for a request path: the first two segments when they
    * name a mounted route, else "other" — client-chosen paths must never
    * mint new label values (unbounded metric cardinality from 404 spam).
    */
  private def metricLabel(path: String): String = {
    val parts = path.stripPrefix("/").stripSuffix("/").split("/", -1).toList
    parts match {
      case p if routeGroup(p).isDefined       => p.take(2).mkString("/")
      case ("metrics" | "api-docs") :: Nil    => parts.head
      case _                                  => "other"
    }
  }

  server.createContext("/", (ex: HttpExchange) => {
    val t0 = System.nanoTime()
    val label = metricLabel(ex.getRequestURI.getPath)
    def observe(): Unit =
      if (ex.getResponseCode > 0) {
        metrics.record(label, ex.getResponseCode)
        metrics.recordLatency(label, (System.nanoTime() - t0) / 1000000L)
      }
    if (!sema.tryAcquire()) {
      // shed load IS the signal — 429s must show up in the request metrics
      respond(ex, 429, "too many requests")
      observe()
    } else
      try { if (!cors(ex)) route(ex) }
      catch { case e: Exception => respond(ex, 500, s"internal: ${e.getMessage}") }
      finally {
        sema.release()
        observe() // response committed by now (SSE: counted at disconnect)
      }
  })

  /** O-33: the reference's Routes-var grouping (routes.go:25-160) — which
    * group a path belongs to; None = unconditionally mounted (metrics,
    * api-docs — the reference's Prometheus/pprof equivalents).
    */
  private def routeGroup(parts: List[String]): Option[String] = parts match {
    case "status" :: Nil                                 => Some("receiver")
    case "v1" :: "firehose" :: _                         => Some("receiver")
    case "v2" :: ("firehose" | "sse" | "poll") :: _      => Some("receiver")
    case "v2" :: "topic" :: _                            => Some("rest")
    case "subject" :: _                                  => Some("token")
    case _                                               => None
  }

  private def route(ex: HttpExchange): Unit = {
    val path  = ex.getRequestURI.getPath.stripSuffix("/")
    val parts = path.stripPrefix("/").split("/", -1).toList
    // a route outside this mode's groups is simply not mounted (ref
    // router.go:17 iterates GetEffectiveRoutes(mode) only)
    if (routeGroup(parts).exists(g => !enabledGroups(g))) {
      respond(ex, 404, "no route")
      return
    }
    (ex.getRequestMethod, parts) match {
      case ("GET", "metrics" :: Nil) =>
        // NoAuth like the reference's promhttp mount — scrapers don't carry
        // tenant tokens (ref routes.go:36-44)
        val bytes = metrics.render.getBytes(UTF_8)
        ex.getResponseHeaders.set("Content-Type", "text/plain; version=0.0.4")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()

      case ("GET", "debug" :: "threads" :: Nil) =>
        // JVM analog of the reference's pprof listener (src/main.go:26-28):
        // a plain-text thread dump for stall diagnosis. Superrole-gated —
        // the reference's pprof binds localhost-only; an HTTP route needs
        // an equivalent barrier.
        withSubject(ex) { sub =>
          if (!superRoles(sub)) respond(ex, 403, "forbidden")
          else {
            val dump = java.lang.management.ManagementFactory.getThreadMXBean
              .dumpAllThreads(false, false)
              .map(_.toString).mkString("\n")
            val bytes = dump.getBytes(UTF_8)
            ex.getResponseHeaders.set("Content-Type", "text/plain")
            ex.sendResponseHeaders(200, bytes.length)
            ex.getResponseBody.write(bytes)
            ex.close()
          }
        }

      case ("GET", "debug" :: "profile" :: Nil) =>
        // JVM analog of pprof's CPU profile endpoint (the reference mounts
        // the full pprof mux, src/route/routes.go:45-82): sample every live
        // thread's top frames at 10 ms for `seconds` (default 1, cap 10)
        // and return the aggregated frame counts, hottest first. Same
        // superrole barrier as /debug/threads — pprof binds localhost-only
        // in the reference, so an HTTP route needs an equivalent gate.
        withSubject(ex) { sub =>
          if (!superRoles(sub)) respond(ex, 403, "forbidden")
          else {
            val seconds = queryParam(ex, "seconds").flatMap(_.toIntOption)
              .getOrElse(1).max(1).min(10)
            val bytes = Profiler.sample(seconds).getBytes(UTF_8)
            ex.getResponseHeaders.set("Content-Type", "text/plain")
            ex.sendResponseHeaders(200, bytes.length)
            ex.getResponseBody.write(bytes)
            ex.close()
          }
        }

      case ("GET", "debug" :: "heap" :: Nil) =>
        // pprof heap-profile analog: heap/non-heap usage, per-pool
        // occupancy, and GC counts/time from the platform MXBeans.
        withSubject(ex) { sub =>
          if (!superRoles(sub)) respond(ex, 403, "forbidden")
          else respond(ex, 200, Profiler.heapJson)
        }

      case ("GET", "api-docs" :: Nil) =>
        // route contract document (ref src/docs/api.go:8-176 swagger spec)
        respond(ex, 200, ApiDocs.json)

      case ("GET", "status" :: Nil) =>
        // AuthHeaderRequired (ref routes.go:86-92)
        if (Option(ex.getRequestHeaders.getFirst("Authorization")).isEmpty)
          respond(ex, 401, "unauthorized")
        else respond(ex, 200, """{"status":"ok"}""")

      case ("POST", "v1" :: "firehose" :: Nil) =>
        // NoAuth; topic from TopicFn header; PulsarUrl header validated
        // against the allowed clusters (ref handlers.go:100-105,122-128)
        receiverHeader(ex) match {
          case Left(err) => respond(ex, 401, err)
          case Right((topicHdr, _)) =>
            topicHdr match {
              case None          => respond(ex, 422, "missing TopicFn header")
              case Some(topicFn) => ingest(ex, topicFn)
            }
        }

      case ("POST", "v2" :: "firehose" :: p :: tenant :: ns :: topic :: Nil) =>
        receiverHeader(ex) match {
          case Left(err) => respond(ex, 401, err)
          case Right((topicHdr, _)) =>
            // header TopicFn overwrites the topic from the route (ref
            // handlers.go:128 util.AssignString) — so authorization runs
            // against the EFFECTIVE topic's tenant, never the route's: a
            // tenant-a token must not write into tenant-b via the header.
            val effective = topicHdr.map(Right(_)).getOrElse(TopicName.build(p, tenant, ns, topic))
            effective match {
              case Left(err) => respond(ex, 422, err)
              case Right(fn) =>
                withSubject(ex) { sub =>
                  if (authorized(fn, sub)) ingest(ex, fn)
                  else respond(ex, 403, "forbidden")
                }
            }
        }

      case ("GET", "v2" :: "poll" :: p :: tenant :: ns :: topic :: Nil) =>
        withAuthorizedTenant(ex, tenant) { _ =>
          TopicName.build(p, tenant, ns, topic) match {
            case Left(err) => respond(ex, 422, err)
            case Right(fn) =>
              val size = queryParam(ex, "batchSize").flatMap(s => Try(s.toInt).toOption)
                .getOrElse(10) // ref handlers.go:163
              // perMessageTimeoutMs (ref :164, default 300): the reference's
              // batch assembly waits up to this long for EACH next message
              // and returns what it has at the first gap (sse-broker.go:48-58).
              // Capped at 30 s: the wait holds a request thread and one of
              // the 200 admission permits, and each probe runs a (bounded)
              // scan — an uncapped client value would be a handle-exhaustion
              // lever (the reference blocks on an idle consumer channel, so
              // its wait is cheap; ours is not).
              val gapMs = math.min(
                queryParam(ex, "perMessageTimeoutMs")
                  .flatMap(s => Try(s.toInt).toOption).getOrElse(300),
                30000)
              // O-9 consumer params: validated name/type; absent name → a
              // fresh non-resumable subscription (ref handlers.go:440-461).
              val subType = ConsumerParams.subscriptionType(
                consumerParam(ex, "SubscriptionType", "subscriptionType").getOrElse(""))
              val subName = ConsumerParams.subscriptionName(
                consumerParam(ex, "SubscriptionName", "subscriptionName").getOrElse(""))
              (subName, subType) match {
                case (Left(err), _) => respond(ex, 422, err)
                case (_, Left(err)) => respond(ex, 422, err)
                case (Right(sub), Right(_)) =>
                  val rows = pollWithGapTimeout(fn, sub, size, gapMs)
                  metrics.polled.add(rows.length)
                  if (rows.isEmpty) respond(ex, 204, "") // ref docs/api.go:106-109
                  else {
                    val msgs = rows.map { r =>
                      J.obj(
                        "payload"     -> J.str(new String(r.getAs[Array[Byte]]("payload"), UTF_8)),
                        "topic"       -> J.str(r.getAs[String]("topic")),
                        "messageId"   -> J.str(r.getAs[String]("messageId")),
                        "publishTime" -> J.str(r.getAs[java.sql.Timestamp]("publishTime").toInstant.toString))
                    }
                    respond(ex, 200,
                      s"""{"limit":$size,"size":${rows.length},"messages":[${msgs.mkString(",")}]}""")
                  }
              }
          }
        }

      case ("GET", "v2" :: "sse" :: p :: tenant :: ns :: topic :: Nil) =>
        withAuthorizedTenant(ex, tenant) { _ =>
          // O-9: same consumer-param validation as poll (ref
          // ConsumerConfigFromHTTPParts, handlers.go:440-461) — the hub
          // keys subscriptions per connection, but bad params still 422
          val params = Seq(
            ConsumerParams.subscriptionName(
              consumerParam(ex, "SubscriptionName", "subscriptionName").getOrElse("")),
            ConsumerParams.subscriptionType(
              consumerParam(ex, "SubscriptionType", "subscriptionType").getOrElse("")),
            ConsumerParams.initialPosition(
              consumerParam(ex, "SubscriptionInitialPosition", "initialPosition").getOrElse("")))
          (TopicName.build(p, tenant, ns, topic), params.collectFirst { case Left(e) => e }) match {
            case (Left(err), _)        => respond(ex, 422, err)
            case (_, Some(err))        => respond(ex, 422, err)
            case (Right(fn), None)     => sse(ex, fn)
          }
        }

      case ("GET", "v2" :: "topic" :: key :: Nil) =>
        withSubject(ex) { sub => getTopic(ex, key, sub) }

      // key-less lookup/delete: key derived from {topicFullName, pulsarURL}
      // in the body (ref GetTopicKey, handlers.go:350-372)
      case ("GET", "v2" :: "topic" :: Nil) =>
        withSubject(ex) { sub =>
          bodyTopicKey(ex) match {
            case Left(err)  => respond(ex, 422, err)
            case Right(key) => getTopic(ex, key, sub)
          }
        }

      case ("DELETE", "v2" :: "topic" :: Nil) =>
        withSubject(ex) { sub =>
          bodyTopicKey(ex) match {
            case Left(err)  => respond(ex, 422, err)
            case Right(key) => deleteTopic(ex, key, sub)
          }
        }

      case ("POST", "v2" :: "topic" :: Nil) =>
        withSubject(ex) { sub =>
          val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          parseTopicConfig(body) match {
            case Left(err) => respond(ex, 422, err)
            case Right(cfg) =>
              if (!authorized(cfg.topicFullName, sub)) respond(ex, 403, "forbidden")
              else store.update(cfg) match {
                case Left(err)  => respond(ex, 422, err)
                case Right(key) => respond(ex, 201, topicJson(store.getByKey(key).get))
              }
          }
        }

      case ("DELETE", "v2" :: "topic" :: key :: Nil) =>
        withSubject(ex) { sub => deleteTopic(ex, key, sub) }

      case ("GET", "subject" :: sub :: Nil) =>
        // only a superrole mints tokens (ref handlers.go:41-68)
        withSubject(ex) { caller =>
          if (!superRoles(caller)) respond(ex, 403, "forbidden")
          else respond(ex, 200, s"""{"token":"${mintToken(sub)}"}""")
        }

      case _ => respond(ex, 404, "no route")
    }
  }

  /** `PulsarUrl` + `TopicFn` receiver headers with allowed-cluster
    * enforcement (ref src/util/util.go:61-75): a missing URL falls back to
    * the first allowed cluster; an unlisted URL is rejected.
    */
  private def receiverHeader(ex: HttpExchange): Either[String, (Option[String], String)] = {
    val topicFn = Option(ex.getRequestHeaders.getFirst("TopicFn")).filter(_.nonEmpty)
    val url     = Option(ex.getRequestHeaders.getFirst("PulsarUrl")).filter(_.nonEmpty)
    if (allowedClusters.exists(_.nonEmpty)) url match {
      case None                                   => Right((topicFn, allowedClusters.head))
      case Some(u) if allowedClusters.contains(u) => Right((topicFn, u))
      case Some(u)                                => Left(s"pulsar cluster $u is not allowed")
    }
    else url match {
      case None    => Left("missing configured Pulsar URL")
      case Some(u) => Right((topicFn, u))
    }
  }

  /** O-1/O-2: gzip-aware body read, then append to the topic table.
    * `?includeHeaders=true` wraps the payload in the `InfoRichMessage`
    * envelope `{"headers":{...},"body":"..."}` (ref handlers.go:76-80,
    * 107-120); `?mode=async` selects fire-and-forget (ref :131, sync is the
    * default).
    */
  private def ingest(ex: HttpExchange, topicFn: String): Unit = {
    val raw = ex.getRequestBody.readAllBytes()
    val body =
      if (Option(ex.getRequestHeaders.getFirst("Content-Encoding")).contains("gzip"))
        new GZIPInputStream(new java.io.ByteArrayInputStream(raw)).readAllBytes()
      else raw
    if (body.isEmpty) respond(ex, 422, "empty body")
    else {
      // ref :107-111: any value except the literal "false" opts in
      val withHeaders = queryParam(ex, "includeHeaders").exists(_ != "false")
      val payload =
        if (!withHeaders) body
        else {
          import scala.jdk.CollectionConverters._
          val hdrs = ex.getRequestHeaders.entrySet().asScala.toSeq.sortBy(_.getKey).map { e =>
            e.getKey -> J.arr(e.getValue.asScala.toSeq.map(J.str))
          }
          J.obj("headers" -> J.obj(hdrs: _*), "body" -> J.str(new String(body, UTF_8)))
            .getBytes(UTF_8)
        }
      topics.ingestPayload(payload, topicFn, async = queryParam(ex, "mode").contains("async"))
      metrics.ingested.increment()
      respond(ex, 200, """{"status":"published"}""")
    }
  }

  /** O-8 SSE: `id:`/`data:` frames per message, flushed per event, until the
    * client disconnects (ref src/route/handlers.go:188-237).
    * `?initialPosition=earliest` replays from the beginning (O-9 default is
    * latest). Delivery comes from the shared per-topic streaming hub
    * ([[graft.streaming.SseHub]]) — the HTTP thread only drains its queue,
    * so an idle connection costs no Spark jobs and N connections share one
    * delivery query per topic.
    */
  private def sse(ex: HttpExchange, topicFn: String): Unit = {
    val earliest = consumerParam(ex, "SubscriptionInitialPosition", "initialPosition")
      .contains("earliest")
    ex.getResponseHeaders.set("Content-Type", "text/event-stream")
    ex.getResponseHeaders.set("Cache-Control", "no-cache")
    ex.sendResponseHeaders(200, 0) // chunked
    val os = ex.getResponseBody
    val (subId, queue, backlog) = sseHub.subscribe(topicFn, earliest)
    metrics.sseOpen.incrementAndGet()
    try {
      // history first (socket-paced pages), then the live queue
      backlog.foreach { frame =>
        os.write(
          s"id: ${frame.messageId}\ndata: ${new String(frame.payload, UTF_8)}\n\n".getBytes(UTF_8))
        os.flush()
      }
      var open = true
      while (open) {
        val frame = queue.poll(1, java.util.concurrent.TimeUnit.SECONDS)
        if (frame == null) os.write(":keepalive\n\n".getBytes(UTF_8)) // detect disconnect
        else if (frame.messageId == null) {
          // Overflow sentinel: this connection fell behind and was dropped
          // by the hub — close so the client reconnects and resumes
          os.write(":overflow - closing\n\n".getBytes(UTF_8))
          open = false
        } else os.write(
          s"id: ${frame.messageId}\ndata: ${new String(frame.payload, UTF_8)}\n\n".getBytes(UTF_8))
        os.flush()
      }
    } catch {
      case _: java.io.IOException => () // client disconnected (ref :216-220)
    } finally {
      metrics.sseOpen.decrementAndGet()
      sseHub.unsubscribe(topicFn, subId)
      Try(ex.close())
    }
  }

  /** O-6/O-7 batch assembly with the reference's per-message gap timer
    * (sse-broker.go:48-58): keep draining the subscription cursor until the
    * batch is full or no new message arrives within `gapMs` of the last one.
    * A received message RESETS the timer (per-message, not per-batch);
    * gapMs ≤ 0 degrades to the immediate local answer.
    */
  private def pollWithGapTimeout(fn: String, sub: String, size: Int,
      gapMs: Int): Seq[org.apache.spark.sql.Row] = {
    val resumable =
      !sub.startsWith(graft.model.ConsumerParams.NonResumablePrefix)
    val first = topics.pollBatch(fn, sub, size)
    if (gapMs <= 0 || first.length >= size) first.toSeq
    else {
      val out = scala.collection.mutable.ArrayBuffer(first: _*)
      // each probe is a Spark job (bounded, but not free) — probe at 100 ms
      val probeMs = math.min(100L, math.max(1L, gapMs.toLong))
      var gapDeadline = System.nanoTime() + gapMs * 1000000L
      while (out.length < size && System.nanoTime() < gapDeadline) {
        Thread.sleep(probeMs)
        // a NON-RESUMABLE subscription drops its cursor after every call
        // (pollBatch restarts from earliest), so probes must re-request the
        // full batch and keep only rows past this request's high-water mark
        // — delivered order is deterministic (publishTime, messageId), so
        // the already-delivered rows are exactly a prefix. A resumable
        // subscription's durable cursor advances on its own.
        val more: Seq[org.apache.spark.sql.Row] =
          if (resumable) topics.pollBatch(fn, sub, size - out.length).toSeq
          else if (out.isEmpty) topics.pollBatch(fn, sub, size).toSeq
          else {
            val last  = out.last
            val lastT = last.getAs[java.sql.Timestamp]("publishTime")
            val lastM = last.getAs[String]("messageId")
            topics.pollBatch(fn, sub, size).iterator.filter { r =>
              val t = r.getAs[java.sql.Timestamp]("publishTime")
              t.after(lastT) ||
                (t == lastT && r.getAs[String]("messageId") > lastM)
            }.take(size - out.length).toSeq
          }
        if (more.nonEmpty) {
          out ++= more
          gapDeadline = System.nanoTime() + gapMs * 1000000L
        }
      }
      out.toSeq
    }
  }

  private def getTopic(ex: HttpExchange, key: String, sub: String): Unit =
    store.getByKey(key) match {
      case Some(cfg) if authorized(cfg.topicFullName, sub) => respond(ex, 200, topicJson(cfg))
      case Some(_)                                         => respond(ex, 403, "forbidden")
      case None                                            => respond(ex, 404, "not found")
    }

  private def deleteTopic(ex: HttpExchange, key: String, sub: String): Unit =
    store.getByKey(key) match {
      case Some(cfg) if authorized(cfg.topicFullName, sub) =>
        store.deleteByKey(key); respond(ex, 200, """{"deleted":true}""")
      case Some(_) => respond(ex, 403, "forbidden")
      case None    => respond(ex, 404, "not found")
    }

  /** Quoted-string field extraction shared by the config-body parsers. */
  private def strField(obj: String, name: String): Option[String] =
    (""""""" + name + """"\s*:\s*"((?:[^"\\]|\\.)*)"""").r.findFirstMatchIn(obj).map(_.group(1))

  /** Key from a `{topicFullName, pulsarURL}` request body — the same
    * trimmed + URL-validated derivation `update` stores under
    * (Keys.keyFromNames, ref model.GetKeyFromNames), so a body lookup
    * always finds what a create stored.
    */
  private def bodyTopicKey(ex: HttpExchange): Either[String, String] = {
    val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    (strField(body, "topicFullName"),
      strField(body, "pulsarURL").orElse(strField(body, "pulsarUrl"))) match {
      case (Some(fn), Some(url)) => Keys.keyFromNames(fn, url)
      case _                     => Left("missing topic key or topic names in body")
    }
  }

  /** O-24: JWT → subject ("injectedSubs" equivalent, ref middleware.go:32-44). */
  private def withSubject(ex: HttpExchange)(f: String => Unit): Unit =
    Option(ex.getRequestHeaders.getFirst("Authorization"))
      .map(_.stripPrefix("Bearer ").trim) match {
      case None => respond(ex, 401, "unauthorized")
      case Some(token) =>
        Jwt.verify(token, keys.getPublic) match {
          case Left(err)  => respond(ex, 401, err)
          case Right(sub) => f(sub)
        }
    }

  /** O-25 tenant authorization on a route's tenant segment. */
  private def withAuthorizedTenant(ex: HttpExchange, tenant: String)(f: String => Unit): Unit =
    withSubject(ex) { sub =>
      if (Auth.verifySubject(tenant, sub, superRoles)) f(sub)
      else respond(ex, 403, "forbidden")
    }

  private def queryParam(ex: HttpExchange, name: String): Option[String] =
    Option(ex.getRequestURI.getQuery).flatMap(_.split("&").collectFirst {
      case kv if kv.startsWith(name + "=") => kv.substring(name.length + 1)
    })

  /** Consumer params use the reference's capitalized names
    * (`SubscriptionName`, ref handlers.go:440-461); the lowercase forms are
    * kept as aliases for earlier clients of this shim.
    */
  private def consumerParam(ex: HttpExchange, refName: String, alias: String): Option[String] =
    queryParam(ex, refName).orElse(queryParam(ex, alias))

  private def authorized(topicFn: String, sub: String): Boolean =
    Auth.verifySubjectForTopic(topicFn, sub, superRoles)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    if (code == 204) ex.sendResponseHeaders(204, -1)
    else { ex.sendResponseHeaders(code, bytes.length); ex.getResponseBody.write(bytes) }
    ex.close()
  }

  private def topicJson(cfg: TopicConfig): String = {
    import graft.store.Json._
    obj(
      "topicFullName" -> str(cfg.topicFullName), "tenant" -> str(cfg.tenant),
      "key" -> str(cfg.key), "notes" -> str(cfg.notes),
      "topicStatus" -> num(cfg.topicStatus), "pulsarURL" -> str(cfg.pulsarURL),
      "webhooks" -> arr(cfg.webhooks.map(wh => obj(
        "url" -> str(wh.url), "headers" -> arr(wh.headers.map(str)),
        "subscription" -> str(wh.subscription),
        "subscriptionType" -> str(wh.subscriptionType),
        "initialPosition" -> str(wh.initialPosition),
        "webhookStatus" -> num(wh.webhookStatus)))))
  }

  /** Minimal JSON body binding for TopicConfig (flat fields + webhook
    * array) — regex-based field extraction; full schema-on-read lives in the
    * Spark path (`CompactedLogStore.log`).
    */
  private def parseTopicConfig(body: String): Either[String, TopicConfig] = {
    def numField(obj: String, name: String): Option[Int] =
      (""""""" + name + """"\s*:\s*(\d+)""").r.findFirstMatchIn(obj).map(_.group(1).toInt)
    val fn  = strField(body, "topicFullName")
    val url = strField(body, "pulsarURL").orElse(strField(body, "pulsarUrl"))
    (fn, url) match {
      case (Some(f), Some(u)) =>
        val whObjs = """\{[^{}]*"url"[^{}]*\}""".r.findAllIn(body).toSeq
        // delivery headers: "headers": ["Name: value", ...] (O-11 contract —
        // dropping them would silently strip auth headers from deliveries)
        def headerList(obj: String): Seq[String] =
          """"headers"\s*:\s*\[([^\]]*)\]""".r.findFirstMatchIn(obj)
            .map(m => """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)
            .getOrElse(Nil)
        val whs = whObjs.map { w =>
          WebhookConfig(
            strField(w, "url").getOrElse(""),
            headerList(w),
            strField(w, "subscription").getOrElse(""),
            strField(w, "subscriptionType").getOrElse(""),
            strField(w, "initialPosition").getOrElse(""),
            numField(w, "webhookStatus").getOrElse(Status.Activated))
        }
        Right(TopicConfig(f, strField(body, "token").getOrElse(""),
          strField(body, "tenant").getOrElse(""), "", strField(body, "notes").getOrElse(""),
          numField(body, "topicStatus").getOrElse(Status.Activated), u, whs))
      case _ => Left("topicFullName and pulsarURL are required")
    }
  }
}
