package graft.serve

import java.lang.management.ManagementFactory

import scala.jdk.CollectionConverters._

/** Poor-man's pprof (O-34 adjunct): the reference mounts Go's full pprof
  * mux (`src/route/routes.go:45-82` — profile, heap, goroutine, block);
  * the JVM analogs here are a sampling CPU profile built from periodic
  * `ThreadMXBean` stack dumps and a heap report from the platform memory
  * MXBeans. Sampling (not instrumentation) keeps the endpoint safe to hit
  * on a live server — the cost is #threads stack walks per 10 ms tick,
  * the same trade pprof's profile endpoint makes.
  */
object Profiler {

  /** Aggregated top-frame counts from `seconds` of 10 ms samples across
    * all live threads, hottest first — `pprof -top`-shaped plain text.
    * RUNNABLE threads only: blocked/waiting threads are parked in a sense
    * a CPU profile must not attribute to their current frame.
    */
  def sample(seconds: Int): String = {
    val mx = ManagementFactory.getThreadMXBean
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    var ticks = 0
    val deadline = System.nanoTime() + seconds * 1000000000L
    while (System.nanoTime() < deadline) {
      mx.dumpAllThreads(false, false).foreach { ti =>
        if (ti.getThreadState == Thread.State.RUNNABLE) {
          val st = ti.getStackTrace
          if (st.nonEmpty) {
            val f = st(0)
            val key = s"${f.getClassName}.${f.getMethodName}"
            counts(key) = counts.getOrElse(key, 0L) + 1
          }
        }
      }
      ticks += 1
      Thread.sleep(10)
    }
    val total = counts.valuesIterator.sum.max(1L)
    val top = counts.toSeq.sortBy { case (k, c) => (-c, k) }.take(50)
    val header = s"samples=$total ticks=$ticks interval=10ms\n"
    header + top.map { case (k, c) =>
      f"$c%7d ${c * 100.0 / total}%5.1f%% $k"
    }.mkString("\n")
  }

  /** Heap/non-heap usage, per-pool occupancy, GC counts/time — the heap
    * profile's summary layer as JSON.
    */
  def heapJson: String = {
    val mem = ManagementFactory.getMemoryMXBean
    def usage(u: java.lang.management.MemoryUsage): String =
      s"""{"used":${u.getUsed},"committed":${u.getCommitted},"max":${u.getMax}}"""
    val pools = ManagementFactory.getMemoryPoolMXBeans.asScala.map { p =>
      s""""${p.getName}":${usage(p.getUsage)}"""
    }.mkString(",")
    val gcs = ManagementFactory.getGarbageCollectorMXBeans.asScala.map { g =>
      s""""${g.getName}":{"count":${g.getCollectionCount},"time_ms":${g.getCollectionTime}}"""
    }.mkString(",")
    s"""{"heap":${usage(mem.getHeapMemoryUsage)},""" +
      s""""non_heap":${usage(mem.getNonHeapMemoryUsage)},""" +
      s""""pools":{$pools},"gc":{$gcs}}"""
  }
}
