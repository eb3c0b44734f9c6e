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
    /** Highest (publishTime, messageId) this hub has pushed to any
      * subscriber — monotone, advanced only under the hub lock. Lets
      * subscribe() close the gap between its (un-locked) high-water Spark
      * job and registration without re-running the job under the lock.
      */
    @volatile var delivered: Option[(java.sql.Timestamp, String)] = None
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
      // The stream starts at an EXPLICIT offset captured here, synchronously,
      // BEFORE query.start() — `latest` would resolve its initial offset on
      // the MicroBatchExecution thread after start() returns, so a message
      // published after a subscriber's high-water snapshot but before that
      // async resolution would be covered by neither the backlog (≤ H) nor
      // the stream (starts past its segment): a silent gap. With the offset
      // pinned first, every segment registered after hub start is in the
      // stream, and anything earlier is ≤ every subscriber's H by
      // construction. The hub still never replays deep history — segments
      // before the pinned offset are served per-connection by the
      // subscribe() backlog snapshot; maxSegmentsPerTrigger bounds each
      // batch's collect().
      val startOffset = topics.endOffset(fn)
      query = topics.readStream(fn, startingPosition = s"offset:$startOffset",
          maxSegmentsPerTrigger = Some(64))
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
            // advance the hub watermark even when no subscriber is
            // registered — subscribe() relies on it covering every frame
            // the stream has already carried past
            val last = rows.last
            delivered = laterOf(delivered,
              Some((last.getAs[java.sql.Timestamp]("publishTime"),
                last.getAs[String]("messageId"))))
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

  /** Later of two (publishTime, messageId) positions; None = −∞. */
  private def laterOf(a: Option[(java.sql.Timestamp, String)],
      b: Option[(java.sql.Timestamp, String)]): Option[(java.sql.Timestamp, String)] =
    (a, b) match {
      case (Some((at, am)), Some((bt, bm))) =>
        if (bt.after(at) || (bt.equals(at) && bm > am)) b else a
      case (x, y) => x.orElse(y)
    }

  private val hubs   = TrieMap.empty[String, Hub]
  private val nextId = new AtomicLong(0)

  /** Register a connection; returns (subscriberId, frame queue, backlog).
    * The caller MUST fully consume `backlog` (frames at or before the
    * subscription's high-water mark, produced as socket-paced cursor pages)
    * before draining the queue, and MUST `unsubscribe` on disconnect.
    *
    * Splice contract: under the topic's lock the subscriber registers with
    * its watermark at the CURRENT high-water mark H — the stream only ever
    * enqueues frames after H, and the backlog iterator only pages frames up
    * to H, so the two compose without duplicates or gaps. The backlog is
    * pulled by the HTTP thread itself (one bounded page per Spark job,
    * segment-pruned by the cursor bound), so a backlog deeper than the
    * queue capacity streams fine: the queue only absorbs LIVE traffic
    * while history drains, and only genuine slow-consumer pressure
    * triggers the overflow kick.
    *
    * The global lock covers hub creation/lookup only. If the hub is
    * concurrently stopped (another connection's unsubscribe), registration
    * retries on a fresh hub.
    */
  @annotation.tailrec
  def subscribe(topicFn: String, earliest: Boolean)
      : (Long, LinkedBlockingQueue[Frame], Iterator[Frame]) = {
    val hub = synchronized {
      hubs.getOrElseUpdate(topicFn, {
        val h = new Hub(topicFn)
        h.start()
        h
      })
    }
    val sub = new Sub(new LinkedBlockingQueue[Frame](queueCapacity))
    val id  = nextId.incrementAndGet()
    // High-water mark H0 is a full Spark job — run it OUTSIDE the hub lock
    // (under it, a slow job would stall frame delivery for every existing
    // subscriber of the topic, backing live queues up toward the overflow
    // kick). The H0→registration gap is closed under the lock with the
    // hub's own delivered watermark: any frame the stream carried past
    // while H0 was running advanced `delivered`, so H = max(H0, delivered)
    // restores the splice invariant — the stream only enqueues > H for this
    // subscriber, and the backlog pages ≤ H from durable segments.
    val h0 = topics.read(topicFn)
      .select("publishTime", "messageId")
      .orderBy(col("publishTime").desc, col("messageId").desc)
      .limit(1).collect().headOption
      .map(r => (r.getAs[java.sql.Timestamp]("publishTime"), r.getAs[String]("messageId")))
    val high = hub.synchronized {
      val h = laterOf(h0, hub.delivered)
      sub.last = h
      hub.subs.put(id, sub)
      h
    }
    val registered = synchronized { hubs.get(topicFn).contains(hub) }
    if (!registered) subscribe(topicFn, earliest)
    else {
      val backlog =
        if (!earliest || high.isEmpty) Iterator.empty
        else backlogPages(topicFn, high.get)
      (id, sub.queue, backlog)
    }
  }

  /** Cursor-paged frames from the earliest position up to (and including)
    * the high-water mark — each page one bounded, segment-pruned top-k
    * scan; no page is held longer than the caller takes to write it.
    */
  private def backlogPages(topicFn: String,
      high: (java.sql.Timestamp, String)): Iterator[Frame] = {
    val PageRows  = 1024
    val (ht, hm)  = high
    var cursor    = Option.empty[(java.sql.Timestamp, String)]
    var exhausted = false
    new Iterator[Array[Frame]] {
      def hasNext: Boolean = !exhausted
      def next(): Array[Frame] = {
        val base = topics.read(topicFn)
          .select("publishTime", "messageId", "payload")
          .where(col("publishTime") < ht ||
            (col("publishTime") === ht && col("messageId") <= hm))
        val fresh = cursor match {
          case None => base
          case Some((t, m)) =>
            base.where(col("publishTime") > t ||
              (col("publishTime") === t && col("messageId") > m))
        }
        val page = fresh.orderBy("publishTime", "messageId").limit(PageRows).collect()
        if (page.length < PageRows) exhausted = true
        page.lastOption.foreach(r => cursor =
          Some((r.getAs[java.sql.Timestamp]("publishTime"), r.getAs[String]("messageId"))))
        page.map(r => Frame(r.getAs[String]("messageId"), r.getAs[Array[Byte]]("payload")))
      }
    }.flatten
  }

  /** Drop a connection; the topic's query stops when the last one leaves.
    * The (potentially blocking) query stop runs OUTSIDE the global lock so
    * other topics' subscriptions never wait behind it.
    */
  def unsubscribe(topicFn: String, id: Long): Unit = {
    val toStop = synchronized {
      hubs.get(topicFn).flatMap { hub =>
        hub.subs.remove(id)
        if (hub.subs.isEmpty) { hubs.remove(topicFn); Some(hub) } else None
      }
    }
    toStop.foreach(_.stop())
  }

  def stopAll(): Unit = synchronized {
    hubs.values.foreach(_.stop())
    hubs.clear()
  }

  /** Active per-topic delivery queries (test hook). */
  def activeTopics: Set[String] = hubs.keySet.toSet
}
