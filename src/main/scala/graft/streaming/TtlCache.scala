package graft.streaming

import scala.collection.concurrent.TrieMap

/** Keyed TTL cache (O-29): the reference keeps per-(url, token) Pulsar
  * client/producer/consumer caches evicted after a TTL
  * (ref src/pulsardriver/pulsar-producer.go:15-20 `ProducerCacheTTL` 900 s,
  * pulsar-client.go cache). Same contract here for delivery-side HTTP
  * clients: build-on-miss, last-use TTL eviction with an eviction hook,
  * bounded by the live key set.
  */
final class TtlCache[K, V](ttlMs: Long, build: K => V, onEvict: V => Unit = (_: V) => ()) {

  private final class Entry(val v: V, @volatile var lastUsed: Long)

  private val m = TrieMap.empty[K, Entry]

  /** Entry for `key`, building if absent or expired; refreshes last-use and
    * sweeps every expired entry (the reference evicts on its housekeeping
    * tick; sweeping on access needs no background thread).
    */
  def get(key: K): V = synchronized {
    val now = System.currentTimeMillis()
    m.foreach { case (k, e) =>
      if (now - e.lastUsed > ttlMs) { m.remove(k); onEvict(e.v) }
    }
    val e = m.getOrElseUpdate(key, new Entry(build(key), now))
    e.lastUsed = now
    e.v
  }

  def size: Int = m.size
}
