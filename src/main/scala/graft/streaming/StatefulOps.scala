package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary keyed state with TTL (SURVEY.md §2 O-28: the reference's TTL
  * cache with touch-extend and expiry eviction — ref src/util/ttlcache.go:
  * 28-137, producer cache src/pulsardriver/pulsar-producer.go:15-28),
  * re-expressed as `mapGroupsWithState` over a keyed stream.
  *
  * State per key = latest value + last-touch time; every event touches
  * (extends) the TTL exactly like `Cache.Get` (ttlcache.go:55-64); the
  * ProcessingTime timeout fires the eviction callback path.
  */
object StatefulOps {

  final case class KeyedEvent(key: String, ts: Timestamp, value: String)
  final case class CacheEntry(key: String, value: String, touches: Long, evicted: Boolean)

  /** Latest-value cache over a stream of keyed events: emits the state of a
    * key on every update, and a tombstone entry when the TTL expires.
    *
    * `withTtl = true` is the production mode (ProcessingTimeTimeout, a
    * no-data micro-batch fires the eviction branch after `ttlMs` idle);
    * `withTtl = false` disables expiry so a bounded drain (AvailableNow)
    * terminates — timeout-bearing streams legitimately never go idle: every
    * pending timeout schedules another no-data batch.
    */
  def ttlCache(events: Dataset[KeyedEvent], ttlMs: Long,
      withTtl: Boolean = true): Dataset[CacheEntry] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (withTtl) GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.key)
      .mapGroupsWithState[CacheEntry, CacheEntry](timeoutConf) {
        (key, rows, state: GroupState[CacheEntry]) =>
          if (state.hasTimedOut) {
            // eviction callback (ttlcache.go:97-111 close-on-expire)
            val last = state.get
            state.remove()
            last.copy(evicted = true)
          } else {
            val sorted  = rows.toSeq.sortBy(e => (e.ts.getTime, e.value))
            val prev    = state.getOption
            val touches = prev.map(_.touches).getOrElse(0L) + sorted.size
            val entry   = CacheEntry(key, sorted.last.value, touches, evicted = false)
            state.update(entry)
            if (withTtl) state.setTimeoutDuration(ttlMs) // touch-extends, ttlcache.go:55-64
            entry
          }
      }
  }

  /** Streaming driver for [[ttlCache]] (update mode — state entries are
    * emitted as they change), appending updates to a parquet log via
    * foreachBatch (checkpoint-recoverable, unlike the memory sink).
    * AvailableNow: drain what's available, then stop; restarting from the
    * same checkpoint resumes the keyed state.
    */
  def run(spark: SparkSession, source: Dataset[KeyedEvent], ttlMs: Long,
      outDir: String, checkpoint: String, withTtl: Boolean = true) = {
    ttlCache(source, ttlMs, withTtl).writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[CacheEntry], _: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .start()
  }
}
