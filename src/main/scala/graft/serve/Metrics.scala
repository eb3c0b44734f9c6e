package graft.serve

import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.atomic.LongAdder

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** O-34 observability. The reference wires Prometheus's promhttp handler at
  * `/metrics` plus request/latency middleware (ref src/route/routes.go:36-82,
  * src/middleware/middleware.go) and a pprof listener (src/main.go:26-28).
  * Spark-first equivalent: HTTP request/message counters from the shim plus
  * per-streaming-query progress captured by a [[StreamingQueryListener]]
  * (rows/sec, batch duration, active query count — Spark's own progress
  * objects, so the numbers are the engine's, not re-derived), rendered in
  * the Prometheus text exposition format a scraper ingests directly.
  */
final class Metrics {
  private val requests         = TrieMap.empty[(String, Int), LongAdder]
  private[serve] val ingested  = new LongAdder
  private[serve] val polled    = new LongAdder
  private[serve] val sseOpen   = new AtomicInteger
  private val activeQueries    = new AtomicInteger
  // query name -> (inputRowsPerSecond, batchDurationMs, numInputRows)
  private val progress = TrieMap.empty[String, (Double, Long, Long)]

  def record(route: String, code: Int): Unit =
    requests.getOrElseUpdate((route, code), new LongAdder).increment()

  // per-route latency (_sum ms / _count), the reference's request Logger
  // middleware (src/route/logger.go:10-24) as a scrapeable series
  private val durSumMs = TrieMap.empty[String, LongAdder]
  private val durCount = TrieMap.empty[String, LongAdder]

  def recordLatency(route: String, ms: Long): Unit = {
    durSumMs.getOrElseUpdate(route, new LongAdder).add(ms)
    durCount.getOrElseUpdate(route, new LongAdder).increment()
  }

  /** Attach the streaming listener to a session's query manager. */
  def observe(spark: SparkSession): Unit = spark.streams.addListener(listener)

  /** Detach again — a server's stop() must not leak its listener into the
    * (shared, longer-lived) session.
    */
  def unobserve(spark: SparkSession): Unit = spark.streams.removeListener(listener)

  /** Prometheus label-value escaping (backslash, quote, newline). */
  private def esc(v: String): String =
    v.flatMap {
      case '\\' => "\\\\"
      case '"'  => "\\\""
      case '\n' => "\\n"
      case c    => c.toString
    }

  private val listener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = {
      activeQueries.incrementAndGet(); ()
    }
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      progress.put(Option(p.name).getOrElse(p.id.toString),
        (p.inputRowsPerSecond, p.batchDuration, p.numInputRows))
      ()
    }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
      activeQueries.decrementAndGet(); ()
    }
  }

  /** Prometheus text exposition format (version 0.0.4). */
  def render: String = {
    val sb = new StringBuilder
    def gauge(name: String, v: Long): Unit = {
      sb.append(s"# TYPE $name gauge\n").append(s"$name $v\n"); ()
    }
    sb.append("# TYPE graft_http_requests_total counter\n")
    requests.toSeq.sortBy { case ((r, c), _) => (r, c) }.foreach { case ((r, c), n) =>
      sb.append(s"""graft_http_requests_total{route="${esc(r)}",code="$c"} ${n.sum}""").append('\n')
    }
    sb.append("# TYPE graft_messages_ingested_total counter\n")
      .append(s"graft_messages_ingested_total ${ingested.sum}\n")
    sb.append("# TYPE graft_messages_polled_total counter\n")
      .append(s"graft_messages_polled_total ${polled.sum}\n")
    sb.append("# TYPE graft_http_request_duration_ms summary\n")
    durSumMs.toSeq.sortBy(_._1).foreach { case (r, s) =>
      sb.append(s"""graft_http_request_duration_ms_sum{route="${esc(r)}"} ${s.sum}""").append('\n')
      sb.append(s"""graft_http_request_duration_ms_count{route="${esc(r)}"} ${durCount.get(r).map(_.sum).getOrElse(0L)}""").append('\n')
    }
    gauge("graft_sse_connections", sseOpen.get.toLong)
    gauge("graft_streaming_queries_active", activeQueries.get.toLong)
    val snap = progress.readOnlySnapshot().toSeq.sortBy(_._1)
    if (snap.nonEmpty) {
      sb.append("# TYPE graft_streaming_input_rows_per_second gauge\n")
      snap.foreach { case (q, (rps, _, _)) =>
        val v = if (rps.isNaN || rps.isInfinity) 0.0 else rps
        sb.append(s"""graft_streaming_input_rows_per_second{query="${esc(q)}"} $v""").append('\n')
      }
      sb.append("# TYPE graft_streaming_batch_duration_ms gauge\n")
      snap.foreach { case (q, (_, ms, _)) =>
        sb.append(s"""graft_streaming_batch_duration_ms{query="${esc(q)}"} $ms""").append('\n')
      }
      sb.append("# TYPE graft_streaming_last_batch_rows gauge\n")
      snap.foreach { case (q, (_, _, rows)) =>
        sb.append(s"""graft_streaming_last_batch_rows{query="${esc(q)}"} $rows""").append('\n')
      }
    }
    sb.toString
  }
}
