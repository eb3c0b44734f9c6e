package graft.streaming

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Arbitrary-state processor for x103 on Spark 4's `transformWithState`
  * API — the successor to `mapGroupsWithState` (which x28-era
  * `StatefulOps` keeps for the reference's TTL-cache semantics): typed
  * state handles (`ValueState`/`ListState`/`MapState`), per-state TTL,
  * and timers, all against the RocksDB state store the API requires.
  *
  * State per user: (n_events, sum_value_milli, max_event_epoch) — three
  * monotone counters folded over each micro-batch's rows; one updated
  * row per key per batch is emitted (Update mode). Monotonicity is what
  * makes the sink post-aggregate (`max` per column) batch-count-
  * independent: the final value is the same whether AvailableNow split
  * the backlog into one batch or fifty.
  *
  * Scale: state is 24 bytes per user key, partitioned by the grouping
  * key across state-store shards (`runStream` sizes shards by input
  * volume); each micro-batch touches only the keys present in it.
  */
final class UserProfileProcessor
    extends StatefulProcessor[Long, (Long, Long, Long), (Long, Long, Long, Long)] {

  @transient private var profile: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    profile = getHandle.getValueState[(Long, Long, Long)](
      "profile", ExpressionEncoder[(Long, Long, Long)](), TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    var (n, sumMilli, maxEp) =
      if (profile.exists()) profile.get() else (0L, 0L, Long.MinValue)
    rows.foreach { case (_, milli, ep) =>
      n += 1
      sumMilli += milli
      if (ep > maxEp) maxEp = ep
    }
    profile.update((n, sumMilli, maxEp))
    Iterator.single((key, n, sumMilli, maxEp))
  }
}
