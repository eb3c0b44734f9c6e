package graft.streaming

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.time.Duration

import scala.jdk.CollectionConverters._
import scala.util.Try

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.{Status, TopicConfig, WebhookConfig}
import graft.store.TopicStore
import graft.topics.TopicTable

/** Webhook push pipeline (SURVEY.md §2 O-10..O-15, §7.1 `streaming/`):
  * one Structured Streaming query per Activated (topic, webhook) pair.
  *
  *  - fan-out (O-10): `readStream(topic) → foreachBatch → HTTP POST per row`
  *  - header enrichment (O-11): PulsarMessageId/PublishedTime/Topic/
  *    EventTime + flattened `PulsarProperties-*` + JSON content-type sniff
  *  - ack/at-least-once (O-12): the micro-batch checkpoint is the ack; a
  *    failed batch rethrows and is redelivered on restart. 2xx and 422 both
  *    count as delivered (ref src/broker/webhook.go:153-167)
  *  - retry (O-30): max 1 retry with bounded backoff
  *    (ref src/broker/webhook.go:99-101)
  *  - reply-sink (O-13): a 2xx response carrying `TopicFn` re-publishes the
  *    response body to that topic (ref src/broker/webhook.go:131-151)
  *  - reconcile (O-14): desired-vs-running set difference on subscription
  *    keys every tick (ref src/broker/webhook.go:243-273)
  *
  * Executor-vs-driver note: config rows are bounded (SURVEY §7.4), so the
  * per-batch `collect()` moves only the micro-batch being delivered — the
  * same per-message motion as the reference's consumer loop; the analytic
  * path never collects.
  */
final class WebhookEngine(
    spark: SparkSession,
    topics: TopicTable,
    store: TopicStore,
    checkpointRoot: String = Files.createTempDirectory("graft-wh").toString,
    retryBackoffMs: Long = 100, // ref 2-28s; compressed for tests
    triggerMs: Long = 500,
    /** 0 (default) = driver-side sequential delivery — the reference's
      * per-consumer ordered loop, fail-fast mid-batch. N > 0 = the scale
      * path: the micro-batch is repartitioned N ways and POSTed FROM THE
      * EXECUTORS (per-executor connection caches; partition-sequential and
      * fail-fast WITHIN each partition — after a failure, later messages in
      * that partition wait for the redelivery); only the small (messageId,
      * status, reply) result set returns to the driver, which acks
      * successes, ingests replies, and rethrows on any failure so the
      * checkpoint redelivers. Trade-off, stated: CROSS-partition delivery
      * order is not the topic order — same as any parallel webhook
      * consumer.
      */
    executorParallelism: Int = 0,
    /** When executorParallelism = 0, a micro-batch LARGER than this row
      * count still takes the executor path (at the session's default
      * parallelism): reference-parity ordered delivery for normal batches,
      * but a backlog drain can't pin the driver in a giant POST loop.
      * ≤ 0 disables the escape hatch (pure driver loop).
      */
    autoExecutorRows: Int = 10000) {

  /** O-29 keyed connection cache: one HttpClient (its own connection pool)
    * per webhook origin, TTL-evicted like the reference's producer cache
    * (ref pulsar-producer.go:15-20, default 900 s).
    */
  private val clients = new TtlCache[String, HttpClient](
    ttlMs = sys.env.getOrElse("GRAFT_CLIENT_CACHE_TTL_MS", "900000").toLong,
    build = _ => HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(30)).build())

  private def http(url: String): HttpClient = clients.get(URI.create(url).getAuthority)

  /** subscription key ≈ cfg.key + webhook url (ref webhook.go:249-259). */
  private def subKey(cfg: TopicConfig, wh: WebhookConfig): String =
    graft.model.Keys.sha1Hex(cfg.key + wh.url + wh.subscription)

  private val running = scala.collection.concurrent.TrieMap.empty[String, StreamingQuery]

  /** O-14 reconciliation: start queries for Activated webhooks not running,
    * stop running queries no longer desired. Declarative twin: the
    * `desired.except(actual)` / `actual.except(desired)` anti-joins.
    */
  def reconcile(): Unit = synchronized {
    val desired: Map[String, (TopicConfig, WebhookConfig)] = (for {
      cfg <- store.load()
      wh  <- cfg.webhooks
      if wh.webhookStatus == Status.Activated // O-15 status filter
    } yield subKey(cfg, wh) -> (cfg, wh)).toMap

    // failed/terminated queries are not running — restart them next diff
    // (query restart policy, ref webhook.go:193-216 consumer retry loop)
    for ((k, q) <- running.toMap if !q.isActive) running.remove(k)

    // actual \ desired → cancel (ref webhook.go:265-271)
    for ((k, q) <- running.toMap if !desired.contains(k)) {
      Try(q.stop())
      running.remove(k)
    }
    // desired \ actual → start (ref webhook.go:258-263)
    for ((k, (cfg, wh)) <- desired if !running.contains(k)) {
      running.put(k, startQuery(k, cfg, wh))
    }
  }

  def activeCount: Int = running.size

  /** Registered queries that are actually running (a failed one is not). */
  def liveCount: Int = running.values.count(_.isActive)

  def stopAll(): Unit = synchronized {
    running.values.foreach(q => Try(q.stop()))
    running.clear()
  }

  /** Blocks until every running query has processed all currently-available
    * input (test/bounded-replay helper).
    */
  def processAllAvailable(): Unit = running.values.foreach(_.processAllAvailable())

  /** Delivered-pair suppression (SURVEY.md §7.4): a redelivered micro-batch
    * (failure mid-batch → restart) must not re-POST messages already
    * acknowledged. The log is scoped to the micro-batch EPOCH: Structured
    * Streaming only ever redelivers the last uncommitted batch, so entries
    * from any earlier (committed) batch can never be replayed — they are
    * compacted away when the next epoch starts. Memory and disk are thus
    * bounded by one micro-batch per subscription on a stream of any length,
    * and the engine's at-least-once is still effectively-once per
    * (messageId, webhook) across restarts.
    */
  private val delivered = scala.collection.concurrent.TrieMap
    .empty[String, (Long, scala.collection.mutable.Set[String])]

  private def deliveredLog(key: String) = java.nio.file.Paths.get(s"$checkpointRoot/$key.delivered")

  /** Delivered messageIds for this (subscription, batch epoch). First call
    * per epoch hydrates from the log (restart case) and rewrites it keeping
    * only the current epoch's entries — the commit of epoch N-1 is implied
    * by the arrival of epoch N.
    */
  private def loadDelivered(key: String, batchId: Long): scala.collection.mutable.Set[String] =
    delivered.get(key) match {
      case Some((b, s)) if b == batchId => s
      case _ =>
        val p = deliveredLog(key)
        val s = scala.collection.mutable.Set.empty[String]
        if (java.nio.file.Files.exists(p))
          scala.jdk.CollectionConverters.ListHasAsScala(java.nio.file.Files.readAllLines(p))
            .asScala.foreach { line =>
              line.split(":", 2) match {
                case Array(b, mid) if b.nonEmpty && b.forall(_.isDigit) && b.toLong == batchId =>
                  s += mid
                case _ => ()
              }
            }
        java.nio.file.Files.write(p, s.map(mid => s"$batchId:$mid\n").mkString.getBytes,
          java.nio.file.StandardOpenOption.CREATE,
          java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
        delivered.put(key, (batchId, s))
        s
    }

  private def markDelivered(key: String, batchId: Long, messageId: String): Unit = {
    loadDelivered(key, batchId) += messageId
    java.nio.file.Files.write(deliveredLog(key), (s"$batchId:$messageId\n").getBytes,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }

  /** Test/introspection hook: current suppression-log line count for a
    * subscription key (bounded by the last epoch's size).
    */
  private[graft] def deliveredLogSize(key: String): Int = {
    val p = deliveredLog(key)
    if (java.nio.file.Files.exists(p)) java.nio.file.Files.readAllLines(p).size() else 0
  }

  private[graft] def runningKeys: Set[String] = running.keySet.toSet

  /** Number of completed micro-batches across running queries that moved at
    * least one row — StreamBench's cadence counter (recentProgress holds the
    * last ~100 progress records per query, enough for a bench window).
    */
  private[graft] def recentProgressCount: Int =
    running.values.map(_.recentProgress.count(_.numInputRows > 0)).sum

  private def startQuery(key: String, cfg: TopicConfig, wh: WebhookConfig): StreamingQuery = {
    // O-9 initial position: "latest" subscribes at the end of the topic;
    // anything else (incl. the reference's empty default at this layer)
    // replays from earliest — the pre-hub behavior every spec encodes.
    // "latest" is pinned to an explicit offset captured HERE, before
    // query.start(): the beam source resolves `latest` lazily on the
    // stream thread, so a message published right after startQuery()
    // returns could otherwise be counted into the already-seen prefix and
    // never POSTed (the same init race SseHub.Hub.start() pins away).
    // Checkpoint recovery ignores the pin and resumes from the committed
    // offset, so restarts don't re-pin to a later position.
    val startPos =
      if (wh.initialPosition == "latest") s"offset:${topics.endOffset(cfg.topicFullName)}"
      else "earliest"
    // maxSegmentsPerTrigger bounds the per-batch collect: an earliest
    // subscription on a deep topic drains its backlog in capped batches
    // instead of one whole-history micro-batch on the driver.
    val enriched = enrich(topics.readStream(cfg.topicFullName,
      startingPosition = startPos, maxSegmentsPerTrigger = Some(64)))
    enriched.writeStream
      .queryName(s"webhook-$key")
      .option("checkpointLocation", s"$checkpointRoot/$key") // exclusive sub identity (O-9)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (executorParallelism > 0) deliverOnExecutors(batch, batchId, key, wh, executorParallelism)
        else {
          // scale escape hatch: count BEFORE collecting — a backlog-drain
          // batch bigger than the threshold is delivered from the
          // executors (unchanged ack semantics) instead of being pulled
          // whole into a driver POST loop. The batch is persisted around
          // the decision so the threshold count and the actual delivery
          // read the source once, not twice per trigger.
          batch.persist()
          try {
            if (useExecutorPath(batch.count()))
              deliverOnExecutors(batch, batchId, key, wh,
                batch.sparkSession.sparkContext.defaultParallelism)
            else {
              // bounded micro-batch → per-message POST, ref ConsumeLoop webhook.go:171-241
              val seen = loadDelivered(key, batchId)
              batch.collect().foreach { row =>
                val mid = row.getAs[String]("messageId")
                if (!seen.contains(mid)) {
                  deliver(row, wh)
                  markDelivered(key, batchId, mid)
                }
              }
            }
          } finally { batch.unpersist(); () }
        }
      }
      .start()
  }

  /** Scale-path delivery: POSTs run on the executors, partition-sequential,
    * through per-executor-JVM connection caches; the driver only sees the
    * small (messageId, status, reply) result set. Successes are acked
    * (suppression log) and their replies ingested BEFORE any failure
    * rethrows, so a partly-failed batch redelivers only its failures —
    * identical at-least-once/effectively-once semantics to the driver loop.
    */
  /** Default-path routing: a batch bigger than autoExecutorRows leaves the
    * driver loop for the executors.
    */
  private[graft] def useExecutorPath(batchRows: Long): Boolean =
    autoExecutorRows > 0 && batchRows > autoExecutorRows

  /** Batches delivered via the executor path — observability + spec hook. */
  private[graft] val executorBatches = new java.util.concurrent.atomic.LongAdder

  private def deliverOnExecutors(batch: DataFrame, batchId: Long, key: String,
      wh: WebhookConfig, parallelism: Int): Unit = {
    executorBatches.increment()
    import WebhookEngine.DeliveryResult
    val seen = loadDelivered(key, batchId)
    // locals only — the executor closure must not capture the engine
    val seenSet = seen.toSet
    val whLocal = wh
    val backoff = retryBackoffMs
    implicit val enc: org.apache.spark.sql.Encoder[DeliveryResult] =
      org.apache.spark.sql.Encoders.product[DeliveryResult]
    val results = batch
      .repartition(parallelism)
      .mapPartitions { rows =>
        // Fail-fast WITHIN the partition, like the reference's ordered
        // consumer loop: after the first failed POST, later messages in
        // this partition are not attempted (absent from the results, so
        // never acked — the redelivered batch POSTs them in order). Only
        // CROSS-partition ordering is relaxed, as documented.
        var failed = false
        rows
          .filter(r => !seenSet(r.getAs[String]("messageId")))
          .flatMap { r =>
            if (failed) None
            else {
              val res = WebhookEngine.postOne(r, whLocal, backoff)
              if (!res.delivered) failed = true
              Some(res)
            }
          }
      }
      .collect()
    results.filter(_.delivered).foreach { r =>
      ingestReply(r)
      markDelivered(key, batchId, r.messageId)
    }
    val failures = results.filter(!_.delivered)
    if (failures.nonEmpty)
      throw new RuntimeException(
        s"webhook ${wh.url}: ${failures.length} deliveries failed (first: ${failures.head.describe})")
  }

  /** O-13 reply-sink ingest, shared by the driver and executor paths. */
  private def ingestReply(r: WebhookEngine.DeliveryResult): Unit =
    if (r.replyTopic != null && r.replyBody != null && r.replyBody.nonEmpty)
      topics.ingestPayload(r.replyBody, r.replyTopic, Option(r.replyProps).getOrElse(Map.empty))

  /** O-11 delivery header enrichment as a projection. */
  private def enrich(stream: DataFrame): DataFrame =
    stream.select(
      col("payload"), col("topic"), col("messageId"), col("publishTime"),
      col("eventTime"), col("props"),
      // JSON sniff (ref webhook.go:234-236): valid JSON payload → content-type
      when(try_parse_json(col("payload").cast("string")).isNotNull,
        lit("application/json")).otherwise(lit("text/plain")).as("contentType"))

  /** O-10/O-12/O-30 driver-side path: POST (shared [[WebhookEngine.postOne]]
    * logic, the driver's TTL client cache), then 2xx → reply-sink ingest
    * (O-13), 422 → ack without redelivery, anything else throws →
    * micro-batch redelivery.
    */
  private def deliver(row: Row, wh: WebhookConfig): Unit = {
    val r = WebhookEngine.post(row, wh, retryBackoffMs, http(wh.url))
    if (r.delivered) ingestReply(r)
    else throw new RuntimeException(s"webhook ${wh.url} delivery failed: ${r.describe}")
  }
}

object WebhookEngine {

  /** One delivery attempt's outcome, shipped executor→driver on the scale
    * path: the ack decision and the (optional) O-13 reply parts — topic
    * writes and suppression bookkeeping stay on the driver.
    */
  final case class DeliveryResult(
      messageId: String,
      status: Int, // HTTP status, or -1 on transport error
      error: String,
      replyTopic: String,
      replyBody: Array[Byte],
      replyProps: Map[String, String]) {
    def delivered: Boolean = (status >= 200 && status < 300) || status == 422
    /** Human-readable failure detail for logs/exceptions. */
    def describe: String =
      if (status > 0) s"HTTP $status" else s"transport error: $error"
  }

  /** Per-executor-JVM connection cache (O-29 on the scale path): one
    * HttpClient per webhook origin, same TTL contract (and the same
    * GRAFT_CLIENT_CACHE_TTL_MS override) as the driver's cache
    * (ref pulsar-producer.go:15-20, default 900 s).
    */
  private lazy val execClients = new TtlCache[String, HttpClient](
    ttlMs = sys.env.getOrElse("GRAFT_CLIENT_CACHE_TTL_MS", "900000").toLong,
    build = _ => HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(30)).build())

  /** Executor entry point: resolves the client from the executor-local
    * cache, then posts. Static so the mapPartitions closure captures no
    * engine state.
    */
  private[streaming] def postOne(row: Row, wh: WebhookConfig, backoffMs: Long): DeliveryResult =
    post(row, wh, backoffMs, execClients.get(URI.create(wh.url).getAuthority))

  /** O-10/O-11/O-30 request build + send with one retry; pure HTTP — no
    * topic writes, no driver state — so it runs identically on the driver
    * (sequential reference-parity path) and on executors (parallel path).
    */
  private[streaming] def post(row: Row, wh: WebhookConfig, backoffMs: Long,
      client: HttpClient): DeliveryResult = {
    val mid     = row.getAs[String]("messageId")
    val payload = row.getAs[Array[Byte]]("payload")
    val builder = HttpRequest.newBuilder(URI.create(wh.url))
      .timeout(Duration.ofSeconds(30))
      .POST(HttpRequest.BodyPublishers.ofByteArray(payload))
      .header("Content-Type", row.getAs[String]("contentType"))
      .header("PulsarMessageId", mid)
      .header("PulsarPublishedTime", row.getAs[java.sql.Timestamp]("publishTime").toInstant.toString)
      .header("PulsarTopic", row.getAs[String]("topic"))
    // conditional event time (non-zero only, ref webhook.go:225-228)
    Option(row.getAs[java.sql.Timestamp]("eventTime"))
      .foreach(t => builder.header("PulsarEventTime", t.toInstant.toString))
    // property flattening (ref webhook.go:229-231)
    Option(row.getAs[Map[String, String]]("props")).getOrElse(Map.empty)
      .foreach { case (k, v) => builder.header(s"PulsarProperties-$k", v) }
    // user-configured headers "K: V" (ref webhook.go:109-117 SplitAfterN)
    wh.headers.foreach { h =>
      h.split(":", 2) match {
        case Array(k, v) => builder.header(k.trim, v.trim)
        case _           => ()
      }
    }
    val req = builder.build()

    def send(): Either[Throwable, HttpResponse[Array[Byte]]] =
      try Right(client.send(req, HttpResponse.BodyHandlers.ofByteArray()))
      catch { case e: Exception => Left(e) }
    def ok(r: HttpResponse[Array[Byte]]): Boolean =
      (r.statusCode() >= 200 && r.statusCode() < 300) || r.statusCode() == 422

    // max 1 retry with backoff (ref webhook.go:99-101), then ack on
    // 2xx/422 (ref webhook.go:153-167) or report failure for redelivery
    val outcome = send() match {
      case Right(r) if ok(r) => Right(r)
      case _                 => Thread.sleep(backoffMs); send()
    }
    outcome match {
      case Right(r) if r.statusCode() >= 200 && r.statusCode() < 300 =>
        // O-13 reply parts: 2xx with TopicFn header + non-empty body
        val headers = r.headers()
        val topicFn = headers.firstValue("TopicFn")
        if (topicFn.isPresent && r.body().nonEmpty) {
          val props = headers.map().asScala.collect {
            case (k, vs) if k.toLowerCase.startsWith("pulsarproperties-") =>
              k.substring("PulsarProperties-".length) -> vs.asScala.mkString(",")
          }.toMap
          DeliveryResult(mid, r.statusCode(), null, topicFn.get(), r.body(), props)
        } else DeliveryResult(mid, r.statusCode(), null, null, null, null)
      case Right(r) => DeliveryResult(mid, r.statusCode(), null, null, null, null)
      case Left(e) =>
        // class name kept: getMessage alone is often null (ConnectException,
        // SSL handshake failures) and the exception object itself cannot
        // cross the executor→driver result boundary
        DeliveryResult(mid, -1, s"${e.getClass.getName}: ${e.getMessage}", null, null, null)
    }
  }
}
