package graft.streaming

import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap
import scala.util.Try

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.topics.TopicTable

/** Shared SSE push hub (O-8): ONE Structured Streaming query per topic
  * feeds every connected SSE client, replacing the round-1 per-connection
  * poll loop that ran a full read→sort→collect Spark job every 200 ms per
  * client (a driver-side bottleneck at fan-out).
  *
  * Fan-out model (same shape as the reference's consumer channel,
  * ref src/route/handlers.go:223-237): the topic's micro-batch stream
  * broadcasts each batch to per-connection bounded queues; the HTTP thread
  * blocks on its queue and writes frames. Steady-state cost is one
  * streaming query per topic regardless of connection count, and an idle
  * topic runs NO Spark jobs (empty micro-batches never launch one).
  *
  * Per-connection initial position (O-9): `earliest` replays the backlog via
  * a one-shot batch snapshot at subscribe time; `latest` (default) starts
  * from the current high-water mark. Each subscriber carries a
  * (publishTime, messageId) watermark, so the snapshot and the stream
  * compose without duplicates.
  */
final class SseHub(
    topics: TopicTable,
    checkpointRoot: String =
      java.nio.file.Files.createTempDirectory("graft-sse").toString,
    triggerMs: Long = 200,
    queueCapacity: Int = 1024) {

  final case class Frame(messageId: String, payload: Array[Byte])

  /** Sentinel telling the connection thread it was dropped for falling
    * behind — standard SSE slow-consumer policy (disconnect; the client
    * reconnects and resumes from its own position).
    */
  val Overflow: Frame = Frame(null, null)

  private final class Sub(val queue: LinkedBlockingQueue[Frame]) {
    // strictly-increasing delivery watermark, same cursor the reference's
    // ack advances; rows at or below it are already delivered
    @volatile var last: Option[(java.sql.Timestamp, String)] = None
  }

  private final class Hub(fn: String) {
    val subs = TrieMap.empty[Long, Sub]
    @volatile var query: StreamingQuery = _
    val checkpoint: String =
      s"$checkpointRoot/${graft.model.Keys.sha1Hex(fn)}-${System.nanoTime()}"

    private def afterLast(sub: Sub, t: java.sql.Timestamp, m: String): Boolean =
      sub.last match {
        case None         => true
        case Some((lt, lm)) =>
          t.after(lt) || (t.equals(lt) && m > lm)
      }

    /** Non-blocking enqueue under the hub lock: a full queue means the
      * client stopped reading — it is kicked (queue cleared, Overflow
      * sentinel delivered) rather than stalling the topic's single
      * delivery query or silently losing frames while pretending to
      * advance. Returns false when the subscriber was kicked.
      */
    def push(sub: Sub, rows: Iterable[org.apache.spark.sql.Row]): Boolean = {
      rows.foreach { r =>
        val t = r.getAs[java.sql.Timestamp]("publishTime")
        val m = r.getAs[String]("messageId")
        if (afterLast(sub, t, m)) {
          if (!sub.queue.offer(Frame(m, r.getAs[Array[Byte]]("payload")))) {
            sub.queue.clear()
            sub.queue.offer(Overflow)
            return false
          }
          sub.last = Some((t, m))
        }
      }
      true
    }

    def start(): Unit = {
      // startingPosition=latest: the hub never replays the backlog —
      // per-connection `earliest` is served by a one-shot snapshot in
      // subscribe(), so the stream only ever carries NEW segments, and a
      // deep topic history cannot land in the first micro-batch.
      // maxSegmentsPerTrigger bounds each batch's collect().
      query = topics.readStream(fn, startingPosition = "latest", maxSegmentsPerTrigger = Some(64))
        .writeStream
        .queryName(s"sse-${graft.model.Keys.sha1Hex(fn)}")
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.ProcessingTime(triggerMs))
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val rows = batch
            .select("publishTime", "messageId", "payload")
            .orderBy("publishTime", "messageId")
            .collect() // bounded: one micro-batch (same motion as WebhookEngine)
          if (rows.nonEmpty) Hub.this.synchronized {
            val kicked = subs.filter { case (_, sub) => !push(sub, rows) }
            kicked.keys.foreach(subs.remove)
          }
        }
        .start()
    }

    def stop(): Unit = {
      Try(query.stop())
      // per-start checkpoints would otherwise accumulate in the temp root
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(new java.io.File(checkpoint))
    }
  }

  private val hubs   = TrieMap.empty[String, Hub]
  private val nextId = new AtomicLong(0)

  /** Register a connection; returns (subscriberId, frame queue). The
    * caller polls the queue (timeout → keepalive) and MUST `unsubscribe`
    * on disconnect.
    *
    * The global lock is held only for hub creation/lookup — a deep-topic
    * backlog replay runs under the TOPIC's lock alone, so subscriptions to
    * other topics are never blocked behind it. If the hub is concurrently
    * stopped (last subscriber of another connection left between our
    * lookup and registration), the registration retries on a fresh hub.
    */
  @annotation.tailrec
  def subscribe(topicFn: String, earliest: Boolean): (Long, LinkedBlockingQueue[Frame]) = {
    val hub = synchronized {
      hubs.getOrElseUpdate(topicFn, {
        val h = new Hub(topicFn)
        h.start()
        h
      })
    }
    val sub = new Sub(new LinkedBlockingQueue[Frame](queueCapacity))
    val id  = nextId.incrementAndGet()
    val registered = {
      // per-TOPIC lock: serializes the splice against this hub's pushes
      hub.synchronized {
        if (earliest) {
          // Paged backlog replay: each page is a cursor-bounded top-k scan
          // (the publishTime predicate prunes already-replayed segments via
          // footer stats), so the driver never holds more than one page of
          // a topic however deep its history; the watermark then splices
          // into the stream.
          val PageRows = 1024
          var more = true
          while (more) {
            val base = topics.read(topicFn).select("publishTime", "messageId", "payload")
            val fresh = sub.last match {
              case None => base
              case Some((t, m)) =>
                base.where(col("publishTime") > t ||
                  (col("publishTime") === t && col("messageId") > m))
            }
            val page = fresh.orderBy("publishTime", "messageId").limit(PageRows).collect()
            more = page.nonEmpty && hub.push(sub, page) && page.length == PageRows
          }
        } else {
          // latest: start after the current high-water mark
          topics.read(topicFn)
            .select("publishTime", "messageId")
            .orderBy(col("publishTime").desc, col("messageId").desc)
            .limit(1).collect().headOption
            .foreach(r => sub.last =
              Some((r.getAs[java.sql.Timestamp]("publishTime"), r.getAs[String]("messageId"))))
        }
        hub.subs.put(id, sub)
      }
      // registration is valid only if the hub is still the live one
      synchronized { hubs.get(topicFn).contains(hub) }
    }
    if (registered) (id, sub.queue)
    else subscribe(topicFn, earliest)
  }

  /** Drop a connection; the topic's query stops when the last one leaves. */
  def unsubscribe(topicFn: String, id: Long): Unit = synchronized {
    hubs.get(topicFn).foreach { hub =>
      hub.subs.remove(id)
      if (hub.subs.isEmpty) {
        hub.stop()
        hubs.remove(topicFn)
      }
    }
  }

  def stopAll(): Unit = synchronized {
    hubs.values.foreach(_.stop())
    hubs.clear()
  }

  /** Active per-topic delivery queries (test hook). */
  def activeTopics: Set[String] = hubs.keySet.toSet
}
