package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Event-time windowing + Structured Streaming surface (SURVEY.md §2.B
  * "Streaming"): tumbling/sliding/session windows over `events`, plus two
  * genuine `readStream` pipelines (micro-batch with `Trigger.AvailableNow`,
  * memory sink) whose results are still deterministic and oracle-checked —
  * the same code shape that runs unbounded against a live topic table.
  *
  * Window starts are emitted as epoch seconds (BIGINT) to keep the oracle
  * comparison timezone-free.
  */
object StreamOps {

  private def events(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "events")

  /** Tumbling 1-hour event-time windows per event type (`window()` — the
    * same expression Structured Streaming aggregates under a watermark).
    */
  val tumbling: Q = Q(
    "x14_tumbling_window",
    """SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS win_start, event_type, count(*) AS n,
      |       CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY win_start NULLS FIRST, event_type NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    // sum_value in integer micro-units: double→decimal CAST ties round
    // half-up in Spark vs half-even in DuckDB; floor(x*1e6+0.5) is the same
    // IEEE arithmetic on both engines and the BIGINT sum is order-free.
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1000000 + 0.5).cast("long")).as("sum_value"))
      .select(unix_timestamp(col("win.start")).as("win_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy("win_start", "event_type")
  }

  /** Sliding windows: 1 hour wide, 30-minute slide — every event lands in
    * exactly two windows (the DuckDB twin materializes both memberships).
    */
  val sliding: Q = Q(
    "x15_sliding_window",
    """SELECT CAST((floor(epoch(ts) / 1800) - k) * 1800 AS BIGINT) AS win_start, count(*) AS n,
      |       count(DISTINCT user_id) AS n_users
      |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k)
      |GROUP BY 1 ORDER BY win_start""".stripMargin
  ) { (s, dir) =>
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("win"))
      .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"))
      .select(unix_timestamp(col("win.start")).as("win_start"), col("n"), col("n_users"))
      .orderBy("win_start")
  }

  /** Session windows per user, 30-minute gap (the sessionization every
    * events engine runs; the DuckDB twin is the classic lag/cumsum
    * sessionization).
    *
    * TWO-PHASE RE-PLAN (round 14, r13 verdict item 3 — the same time-bucket
    * medicine as x48/x51): the native `session_window` operator merges a
    * user's sessions in ONE task per user — the hot user's entire history
    * serialized (2.08× widest-task ratio on the 100× skew fixture, linear
    * in the hottest key forever). Re-keyed losslessly: with bucket width =
    * the 30-minute gap, consecutive same-session events land in the same or
    * ADJACENT tsu-buckets, so (1) a per-(user, bucket) lag plus a
    * bucket−1 last-event carry decides session STARTS exactly; (2) each
    * row's session key = the latest start at/before it — an in-bucket
    * running `last` plus, when a session began in an earlier bucket, a
    * carry over the user's per-BUCKET rows (bounded by bucket count, never
    * event count; a session's buckets are contiguous, so the latest start
    * in buckets < b is the right carry). (3) The session aggregate itself
    * becomes a (user, start-key) hash aggregate whose min/max/count
    * partial-aggregate map-side — the giant session that session_window
    * forces through one window task shrinks to one row per map partition
    * on the exchange. Oracle unchanged; equivalence proven by the hash
    * check on every fixture.
    */
  val session: Q = Q(
    "x16_session_window",
    """SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start,
      |       CAST(floor(epoch(max(ts))) + 1800 AS BIGINT) AS sess_end, count(*) AS n
      |FROM (SELECT user_id, ts,
      |        sum(CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) >= 1800 THEN 1 ELSE 0 END)
      |          OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess_id
      |      FROM (SELECT user_id, ts, event_id,
      |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |            FROM events))
      |GROUP BY user_id, sess_id ORDER BY user_id NULLS FIRST, sess_start NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val gapUs = 1800000000L // 30 min == bucket width (skew bound)
    val ev = events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        unix_micros(col("ts")).as("tsu"))
      .withColumn("bkt", expr(s"tsu div $gapUs"))
    // Round 15 (guide §2.4 — r14 verdict item 4): the r14 plan ran the
    // boundary-carry JOIN over every event and consumed its output twice
    // (running-last branch + per-bucket aggregate branch), re-executing
    // the windowed subtree. Re-derived with the cross-bucket decisions
    // moved ENTIRELY to summary rows:
    //  - ONE (user, bkt) window pass decides NON-FIRST in-bucket starts
    //    (is_ns — the in-bucket lag is all they need) and carries the
    //    latest such start to each row (run_ns).
    //  - a per-(user, bkt) aggregate (same partitioning, and its exchange
    //    subtree is identical to the window's, so ReuseExchange shares
    //    ONE shuffle of the events) summarizes first event key, last tsu,
    //    and the latest non-first start.
    //  - on SUMMARY rows (bucket-count-sized): lag(last_tsu) is the
    //    user's previous event before this bucket's first — the EXACT gap
    //    test decides first_is_start (no bucket-adjacency argument
    //    needed); the bucket's latest start = coalesce(non-first last,
    //    first if start); the carry = running last of that over earlier
    //    buckets. sk_base = first_key if the first event starts, else the
    //    carry.
    //  - each event's session key = coalesce(run_ns, sk_base) — one
    //    summary-sized join instead of r14's event-sized boundary join
    //    plus the double-computed carry subtree.
    // Equivalence: an event's latest start at-or-before it is either a
    // non-first in-bucket start (run_ns), the bucket's first event (when
    // it starts), or lives in an earlier bucket (the carry) — exactly the
    // r14 coalesce(inb_start, carry), with first_is_start now decided by
    // the exact gap instead of the adjacent-bucket carry join.
    val key = struct(col("tsu"), col("event_id"))
    val wb = Window.partitionBy("user_id", "bkt").orderBy("ts", "event_id")
    val wbRun = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // prev_key (never null-valued as a struct) detects "non-first row of
    // the bucket" even when tsu itself is null: in the null-tsu bucket the
    // r14 plan made EVERY row a session start (its carry was null there and
    // is_start fell through to prev_tsu IS NULL) — `bkt.isNull` keeps that
    // exact semantics; in real buckets prev_tsu_in is non-null whenever
    // prev_key is, so the clause reduces to the plain gap test.
    val e2 = ev
      .withColumn("prev_key_in", lag(key, 1).over(wb))
      .withColumn("prev_tsu_in", col("prev_key_in.tsu"))
      .withColumn("is_ns",
        col("prev_key_in").isNotNull &&
          (col("bkt").isNull || col("tsu") - col("prev_tsu_in") >= gapUs))
      .withColumn("run_ns", last(when(col("is_ns"), key), ignoreNulls = true).over(wbRun))
    val summ = e2.groupBy(col("user_id").as("su"), col("bkt").as("sb"))
      .agg(min(key).as("first_key"), max(col("tsu")).as("last_tsu"),
        max(when(col("is_ns"), key)).as("ns_last"))
    val wu = Window.partitionBy("su").orderBy("sb")
    val wuPrev = wu.rowsBetween(Window.unboundedPreceding, -1)
    val bres = summ
      .withColumn("prev_last_tsu", lag(col("last_tsu"), 1).over(wu))
      .withColumn("first_is_start",
        col("prev_last_tsu").isNull ||
          col("first_key.tsu") - col("prev_last_tsu") >= gapUs)
      .withColumn("own_last_start",
        coalesce(col("ns_last"), when(col("first_is_start"), col("first_key"))))
      .withColumn("carry", last(col("own_last_start"), ignoreNulls = true).over(wuPrev))
      .select(col("su"), col("sb"),
        when(col("first_is_start"), col("first_key")).otherwise(col("carry")).as("sk_base"))
    e2
      .join(bres, col("user_id") <=> col("su") && col("bkt") <=> col("sb"), "left")
      .groupBy(col("user_id"), coalesce(col("run_ns"), col("sk_base")).as("sk"))
      .agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"), count(lit(1)).as("n"))
      .select(col("user_id"),
        unix_timestamp(col("mn")).as("sess_start"),
        (unix_timestamp(col("mx")) + 1800L).as("sess_end"), col("n"))
      .orderBy("user_id", "sess_start")
  }

  /** The file streaming source wants a directory to list; testdata ships a
    * single parquet file, so stage it into a temp dir once per (process,
    * sfDir) — a real topic table is already a directory of append segments
    * (SURVEY.md §7.1 topics/).
    */
  /** Shard count the most recent [[runStream]] pinned into its checkpoint —
    * observable only for the spec that locks the sizing policy (the query is
    * already terminated when runStream returns, so progress is gone).
    */
  @volatile private[graft] var lastStateShards: Int = -1

  private val staged = scala.collection.concurrent.TrieMap.empty[(String, String), String]
  private def stagedDir(dir: String, table: String): String =
    staged.getOrElseUpdate((dir, table), {
      val d = Files.createTempDirectory(s"graft-$table-src")
      val src = java.nio.file.Paths.get(s"$dir/$table.parquet")
      // the corpus ships both layouts: a single parquet FILE (the driver's
      // pyarrow writer) and a part-file DIRECTORY (ScaleData's Spark
      // writer). Files.copy on a directory copies only the empty dir entry
      // — the stream then reads ZERO rows without erroring (caught in r6
      // s4: every sf1 streaming measurement before this fix consumed an
      // empty stream) — so stage each data file flat into the temp dir.
      var stagedFiles = 0
      if (Files.isDirectory(src)) {
        // walk, not list: a partitioned writer nests part files under
        // key=value subdirectories; flatten them (name collisions across
        // subdirs get an index prefix) so the file source lists them all
        val it = Files.walk(src).iterator()
        while (it.hasNext) {
          val f = it.next()
          val name = f.getFileName.toString
          // Hive-partitioned input would be silently corrupted by
          // flattening: the partition columns live in key=value DIR NAMES,
          // not in the part files, so the flattened stream would read them
          // as all-null with no error. Refuse loudly; the staging layer
          // supports flat and nested-but-unpartitioned layouts only.
          require(!(Files.isDirectory(f) && name.contains("=")),
            s"stream staging for $src hit Hive partition dir '$name' — " +
              "flattening would null out its partition column; " +
              "rewrite the source unpartitioned before streaming it")
          if (Files.isRegularFile(f) && name.endsWith(".parquet")) {
            val target = d.resolve(name)
            Files.copy(f, if (Files.exists(target)) d.resolve(s"$stagedFiles-$name") else target)
            stagedFiles += 1
          }
        }
      } else { Files.copy(src, d.resolve(s"$table.parquet")); stagedFiles = 1 }
      // fail LOUDLY on an empty staging — the r6 Files.copy-on-directory bug
      // produced a zero-row stream with no error, which silently voided
      // every sf1 streaming measurement before it was caught
      require(stagedFiles > 0,
        s"stream staging for $src copied zero data files — the stream would read 0 rows without erroring")
      d.toString
    })

  /** Runs a streaming transform of the events file source to completion
    * (AvailableNow) and returns the sink table. Checkpoint is a throwaway
    * temp dir — identity of the "subscription" in reference terms (O-8).
    */
  /** `fileSink = true` lands the stream's append output in a parquet
    * directory and reads it back as a batch frame, instead of the memory
    * sink. The memory sink COLLECTS every output row to the driver — fine
    * for the windowed/sessionized queries whose output is aggregate-sized,
    * but a stream-stream JOIN's output is data-sized: on the 100× hostile
    * fixture the hot user's legitimate view×click pairs overflowed
    * spark.driver.maxResultSize before any rollup ran (round 13). A real
    * deployment writes a join's firehose to storage/a topic and aggregates
    * downstream; the file sink is that shape — driver state stays at file
    * metadata, the batch rollup runs executor-side.
    */
  private def runStream(s: SparkSession, dir: String, sinkName: String, mode: String,
      table: String = "events", fileSink: Boolean = false)(
      transform: DataFrame => DataFrame): DataFrame = {
    // events.ts has shipped as both TIMESTAMP(NANOS) and timestamp[us]-NTZ;
    // the legacy nanos conf must be set BEFORE the schema read below —
    // queries run in Map iteration order, so this can be the process's first
    // parquet read (Tables sets the same conf, but only when a batch query
    // ran first). Tables.normalizeEventTime handles both flavors (NTZ cast
    // is lossless: session TZ is pinned UTC in every entrypoint).
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchSchema = s.read.parquet(s"$dir/$table.parquet").schema
    val srcDir = stagedDir(dir, table)
    val raw = s.readStream.schema(batchSchema).parquet(srcDir)
    val stream = Tables.normalizeEventTime(raw, "ts")
    // State shards sized like scan splits: shuffle partitions (which pin the
    // stateful operators' state-store shard count into the checkpoint at
    // first batch) are set to one shard per maxPartitionBytes of staged
    // input, capped at the session's parallelism. A bounded replay of a
    // small topic backlog stops paying sessionParallelism× state-store
    // open/commit/maintenance per micro-batch (measured: x51/x60 8.1/8.3 s
    // → ~2 s at sf0.1), while a 100 TB backlog saturates to the session
    // value, where a real cluster session declares its executor count.
    // The per-shard budget is 2 MiB of COMPRESSED input — far below the
    // scan-split size deliberately: stateful work per input byte (state
    // lookups, sort, per-key timers) dwarfs scan work per byte, and
    // parquet hides a ~10× decompression fan-out. The first sizing used
    // the 128 MiB scan budget and serialized sf1's 23 MiB / 1M-event
    // backlog onto ONE state shard: measured x52 14.9 → 6.0 s, x60 7.3 →
    // 3.7 s, x51 5.6 → 3.8 s under this budget (12 shards), while sf0.1
    // keeps 1 shard — the small-backlog win untouched. Restored after the
    // run so batch post-processing of the sink keeps the session
    // parallelism.
    val conf  = s.sessionState.conf
    val prev  = conf.numShufflePartitions
    val bytes = {
      // staged input may be one file or several flat part files (see
      // stagedDir) — shard sizing wants the total staged volume either way
      val it = Files.list(java.nio.file.Paths.get(srcDir)).iterator()
      var total = 0L
      while (it.hasNext) {
        val f = it.next()
        if (Files.isRegularFile(f)) total += Files.size(f)
      }
      total
    }
    val shards = math.max(1L, math.min(prev.toLong, bytes / (2L << 20) + 1)).toInt
    lastStateShards = shards
    s.conf.set("spark.sql.shuffle.partitions", shards)
    if (fileSink) {
      val outDir = Files.createTempDirectory(s"graft-$sinkName-out").toString
      try {
        val q = transform(stream).writeStream
          .format("parquet").option("path", outDir).outputMode(mode)
          .option("checkpointLocation", Files.createTempDirectory(s"graft-$sinkName").toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.read.parquet(outDir)
    } else {
      try {
        val q = transform(stream).writeStream
          .format("memory").queryName(sinkName).outputMode(mode)
          .option("checkpointLocation", Files.createTempDirectory(s"graft-$sinkName").toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(sinkName)
    }
  }

  /** Genuine micro-batch pipeline: readStream → event-time tumbling window
    * aggregate → complete-mode memory sink. Must equal the batch tumbling
    * result — the exactly-once contract of checkpointed micro-batching.
    */
  val streamTumbling: Q = Q(
    "x17_stream_tumbling",
    """SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS win_start, event_type, count(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY win_start NULLS FIRST, event_type NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    runStream(s, dir, "x17_sink", "complete") { ev =>
      ev.groupBy(window(col("ts"), "1 hour"), col("event_type")).agg(count(lit(1)).as("n"))
    }
      .select(unix_timestamp(col("window.start")).as("win_start"), col("event_type"), col("n"))
      .orderBy("win_start", "event_type")
  }

  /** Stateful streaming dedup (`dropDuplicates` keyed state, ref O-16's
    * latest-by-key semantics): emits each user_id once across micro-batches;
    * projecting the key alone keeps the output set deterministic.
    */
  val streamDedup: Q = Q(
    "x18_stream_dedup",
    "SELECT DISTINCT user_id FROM events ORDER BY user_id NULLS FIRST"
  ) { (s, dir) =>
    runStream(s, dir, "x18_sink", "append") { ev =>
      ev.select("user_id").dropDuplicates("user_id")
    }.distinct().orderBy("user_id")
  }

  /** Watermarked append-mode aggregation: 10-minute watermark, 1-hour
    * tumbling windows; append emits exactly the windows whose end the final
    * watermark (max event time − delay) has passed. The whole file arrives
    * in one micro-batch (single segment), so the emitted set is the windows
    * with `end <= max(ts) − 10 min` — which is what the oracle states.
    */
  val streamWatermark: Q = Q(
    "x19_stream_watermark",
    """SELECT win_start, count(*) AS n FROM (
      |  SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS win_start FROM events)
      |GROUP BY win_start
      |HAVING win_start + 3600 <= (SELECT CAST(floor(epoch(max(ts) - INTERVAL 10 MINUTE)) AS BIGINT) FROM events)
      |ORDER BY win_start NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    runStream(s, dir, "x19_sink", "append") { ev =>
      ev.withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
    }
      .select(unix_timestamp(col("window.start")).as("win_start"), col("n"))
      .orderBy("win_start")
  }

  /** Stream-static join (§2.B; the O-10 config⨝stream routing shape): the
    * stream side joins a static per-user aggregate — Catalyst broadcasts the
    * static side into every micro-batch, no stream-side state.
    */
  val streamStaticJoin: Q = Q(
    "x20_stream_static_join",
    """SELECT user_bucket, count(*) AS n, CAST(sum(n_user_events) AS BIGINT) AS weighted
      |FROM (SELECT e.user_id % 10 AS user_bucket, s.n_user_events
      |      FROM events e JOIN (SELECT user_id, count(*) AS n_user_events FROM events GROUP BY user_id) s
      |        ON e.user_id = s.user_id)
      |GROUP BY user_bucket ORDER BY user_bucket""".stripMargin
  ) { (s, dir) =>
    val static = events(s, dir).groupBy("user_id").agg(count(lit(1)).as("n_user_events"))
    runStream(s, dir, "x20_sink", "append") { ev =>
      ev.select(col("user_id")).join(broadcast(static), "user_id")
    }
      .groupBy((col("user_id") % 10).as("user_bucket"))
      .agg(count(lit(1)).as("n"), sum("n_user_events").as("weighted"))
      .orderBy("user_bucket")
  }

  /** The x23 cleaning funnel run INCREMENTALLY: documents stream through
    * the language/quality gates (stateless projections, shared with x23 via
    * [[TextOps.cleanFlags]]) into a STATEFUL per-(source, digest) dedup —
    * new micro-batches only ever pay for their own rows, and the dedup
    * state is the digest set, not the corpus. The per-source rollup runs on
    * the bounded sink output (x18's pattern).
    *
    * Deduping on (source, digest) rather than digest alone keeps the result
    * arrival-order independent: duplicates share n_words, so the per-source
    * counts don't depend on WHICH copy the stream saw first — the batch
    * oracle's min-doc_id choice and the stream's first-arrival choice
    * aggregate identically. NOTE the deliberate semantic difference from
    * x23: a duplicate text spanning TWO sources is kept once per source
    * here, but only under its min-doc_id source in x23 — a global-digest
    * streaming dedup would make the per-source counts depend on arrival
    * order, which no oracle could pin down.
    */
  val streamClean: Q = Q(
    "x32_stream_clean",
    s"""WITH ${TextOps.flagsSqlCtes},
       |elig AS (
       |  SELECT source, n_words,
       |    row_number() OVER (PARTITION BY source, md5(text) ORDER BY doc_id) AS rn
       |  FROM flags WHERE is_en AND score >= 0.5)
       |SELECT source, CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(sum(CASE WHEN rn = 1 THEN n_words ELSE 0 END) AS BIGINT) AS kept_tokens
       |FROM elig GROUP BY source ORDER BY source""".stripMargin
  ) { (s, dir) =>
    runStream(s, dir, "x32_sink", "append", table = "documents") { docsStream =>
      TextOps.cleanFlags(docsStream)
        .where(col("is_en") && col("score") >= 0.5)
        .select(col("source"), md5(col("text")).as("digest"), col("n_words"))
        .dropDuplicates("source", "digest")
    }
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum(col("n_words")).cast("long").as("kept_tokens"))
      .orderBy("source")
  }

  /** Streaming funnel (x42 run incrementally): per-user state is a
    * streaming complete-mode aggregate — the running min of view times
    * plus the click/purchase time SETS — and the funnel's chained
    * "min strictly after the previous stage" is row-local array math on
    * top. Keeping the time sets (not just running mins) is what makes the
    * result ARRIVAL-ORDER INDEPENDENT: a view arriving late can qualify
    * clicks that were previously too early, which a scalar
    * min-click-after-view state could never revise. State is O(events per
    * user) — bounded by per-user activity, the same envelope as the batch
    * shuffle; a production variant would prune times below the advancing
    * funnel frontier under a watermark.
    */
  val streamFunnel: Q = Q(
    "x44_stream_funnel",
    """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
      |           WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
      |SELECT 'view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
      |UNION ALL SELECT 'view>click' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM c
      |UNION ALL SELECT 'view>click>purchase' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM p
      |ORDER BY stage""".stripMargin
  ) { (s, dir) =>
    // a user-keyed funnel needs a user: NULL user_id rows are filtered on
    // BOTH engines — the oracle's stage joins could never advance a NULL
    // key anyway (null ≠ null), while the stateful aggregate would
    val perUser = runStream(s, dir, "x44_sink", "complete") { ev =>
      ev.where(col("user_id").isNotNull).groupBy("user_id").agg(
        min(when(col("event_type") === "view", col("ts"))).as("t1"),
        collect_list(when(col("event_type") === "click", col("ts"))).as("clicks"),
        collect_list(when(col("event_type") === "purchase", col("ts"))).as("purchases"))
    }
      .withColumn("t2", array_min(filter(col("clicks"), c => c > col("t1"))))
      .withColumn("t3", array_min(filter(col("purchases"), p => p > col("t2"))))
    perUser
      .agg(
        sum(when(col("t1").isNotNull, 1).otherwise(0)).cast("long").as("nv"),
        sum(when(col("t2").isNotNull, 1).otherwise(0)).cast("long").as("nc"),
        sum(when(col("t3").isNotNull, 1).otherwise(0)).cast("long").as("np"))
      .select(explode(array(
        struct(lit("view").as("stage"), col("nv").as("n_users")),
        struct(lit("view>click").as("stage"), col("nc").as("n_users")),
        struct(lit("view>click>purchase").as("stage"), col("np").as("n_users")))).as("r"))
      .select(col("r.stage").as("stage"), col("r.n_users").as("n_users"))
      .orderBy("stage")
  }

  /** STREAM-STREAM join (the join family x20's stream⨝static shape can't
    * cover): views joined to the clicks that follow them within 30 minutes
    * per user — both sides are the SAME unbounded source, so this is a
    * streaming self-join. Watermarks on both sides plus the time-range
    * predicate bound the join state: Spark derives, from `cts ∈ [vts,
    * vts+30m]`, exactly how long each side's rows must be retained, so
    * state is a sliding 30-minute band of each stream, not its history —
    * the shape that holds on an unbounded topic. Inner-join matches emit
    * in the micro-batch that completes them; the per-bucket rollup runs on
    * the bounded sink output (x18's pattern).
    *
    * TIME-BUCKETED equi-key (round 13 — the hot-key fix the full-surface
    * skew gate forced): Spark's symmetric hash join keys state on the
    * EQUALITY columns only and applies the time band as a per-row filter
    * over the key's whole retained state, so a hot user (the skew
    * fixture's 1-in-10 user_id=1 — a bot, a null-ish default key) turns
    * one state partition into |views|×|clicks| predicate evaluations in
    * ONE task: measured at 100×, task CPU exceeded 3,600 s on one core
    * with 31 idle (the run was killed, not finished). The fix is the
    * interval-join shape Flink applies internally: coarsen time into
    * 30-minute buckets ON the equi-key — each view explodes into its two
    * candidate CLICK buckets (band length == bucket width ⇒ any
    * qualifying click lies in bucket(vts) or bucket(vts)+1), clicks carry
    * their own bucket, and the hash key becomes (user, cbucket).
    * LOSSLESS and duplicate-free: buckets partition time, so every
    * qualifying (view, click) pair meets on exactly ONE key — the
    * bucket containing cts. The hot key's state shards across time
    * buckets (per-key pair work drops from |hot|² to Σ_b |v_b|·|c_b|,
    * and the buckets parallelize); the benign cost is a ×2 view-side
    * state row count. Same oracle, same output, spec-pinned.
    */
  val streamStreamJoin: Q = Q(
    "x51_stream_stream_join",
    """SELECT CAST(v.user_id % 10 AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n_pairs
      |FROM (SELECT user_id, ts FROM events WHERE event_type = 'view') v
      |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      |  ON v.user_id = c.user_id AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
      |GROUP BY bucket ORDER BY bucket""".stripMargin
  ) { (s, dir) =>
    runStream(s, dir, "x51_sink", "append", fileSink = true) { ev =>
      val v = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("vts"))
        .withWatermark("vts", "1 hour")
        .withColumn("cb", explode(array(
          expr("unix_micros(vts) div 1800000000"),
          expr("unix_micros(vts) div 1800000000 + 1"))))
      val c = ev.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("cts"))
        .withWatermark("cts", "1 hour")
        .withColumn("ccb", expr("unix_micros(cts) div 1800000000"))
      v.join(c,
        col("user_id") === col("c_user") &&
          col("cb") === col("ccb") &&
          col("cts") >= col("vts") &&
          col("cts") <= col("vts") + expr("INTERVAL 30 MINUTES"))
    }
      .groupBy((col("user_id") % 10).as("bucket"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("bucket")
  }

  /** Session windows under a watermark in STREAMING mode (x16 runs the
    * same operator in batch): per-user 30-minute-gap sessions, append mode
    * — a session emits only once the watermark (max event time − 10 min)
    * passes its end, i.e. once no late event could still extend or merge
    * it. Session-window state is the set of OPEN sessions per user,
    * bounded by the watermark; merges across micro-batches are handled by
    * the session-window state store. The oracle states exactly the
    * emission rule: sessions whose end ≤ final watermark.
    */
  val streamSession: Q = Q(
    "x52_stream_session",
    """SELECT user_id, sess_start, sess_end, n FROM (
      |  SELECT user_id, CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start,
      |         CAST(floor(epoch(max(ts))) + 1800 AS BIGINT) AS sess_end, count(*) AS n
      |  FROM (SELECT user_id, ts,
      |          sum(CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) >= 1800 THEN 1 ELSE 0 END)
      |            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess_id
      |        FROM (SELECT user_id, ts, event_id,
      |                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |              FROM events))
      |  GROUP BY user_id, sess_id)
      |WHERE sess_end <= (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) - 600 FROM events)
      |ORDER BY user_id NULLS FIRST, sess_start NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    runStream(s, dir, "x52_sink", "append") { ev =>
      ev.withWatermark("ts", "10 minutes")
        .groupBy(session_window(col("ts"), "30 minutes").as("sess"), col("user_id"))
        .agg(count(lit(1)).as("n"))
    }
      .select(col("user_id"),
        unix_timestamp(col("sess.start")).as("sess_start"),
        unix_timestamp(col("sess.end")).as("sess_end"), col("n"))
      .orderBy("user_id", "sess_start")
  }

  /** Stream-stream LEFT OUTER join: x51's view⨝click time-band join, but
    * views with no click in their 30-minute window are ALSO emitted (null
    * click) once the watermark proves no future click can match — i.e.
    * when `vts + 30min` falls behind the global watermark, which is
    * min(max view ts, max click ts) − 1h under Spark's default min-of-
    * watermarks policy. The oracle replays exactly that emission rule:
    * matched pairs are watermark-independent (bounded replay), unmatched
    * views require `vts + 30min < min(max_v, max_c) − 1h`. State stays
    * bounded by the same 30-minute band + 1-hour delay as x51.
    *
    * Carries x51's round-13 TIME-BUCKETED equi-key (see there for the
    * hot-key measurement and the losslessness argument). The outer-join
    * wrinkle the inner join doesn't have: each view's TWO bucket rows
    * emit independent null rows when unmatched, so the batch rollup
    * reconciles per (user_id, vts) — both rows null ⟺ the view is truly
    * unmatched (count nn/2); a null row beside a matched sibling is the
    * empty other bucket, dropped. Same oracle, same output.
    */
  val streamStreamLeftOuter: Q = Q(
    "x60_stream_outer_join",
    """WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
      |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
      |wm AS (SELECT least((SELECT max(ts) FROM v), (SELECT max(ts) FROM c))
      |              - INTERVAL 1 HOUR AS wm),
      |pairs AS (SELECT v.user_id FROM v JOIN c
      |          ON v.user_id = c.user_id AND c.ts >= v.ts
      |             AND c.ts <= v.ts + INTERVAL 30 MINUTE),
      |unmatched AS (SELECT v.user_id FROM v CROSS JOIN wm
      |  WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.user_id = v.user_id
      |                    AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE)
      |    AND v.ts + INTERVAL 30 MINUTE < wm.wm),
      |rows_ AS (SELECT user_id, 0 AS um FROM pairs
      |          UNION ALL SELECT user_id, 1 AS um FROM unmatched)
      |SELECT CAST(user_id % 10 AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(sum(um) AS BIGINT) AS n_unmatched
      |FROM rows_ GROUP BY bucket ORDER BY bucket NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    runStream(s, dir, "x60_sink", "append", fileSink = true) { ev =>
      val v = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("vts"))
        .withWatermark("vts", "1 hour")
        .withColumn("cb", explode(array(
          expr("unix_micros(vts) div 1800000000"),
          expr("unix_micros(vts) div 1800000000 + 1"))))
      val c = ev.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("cts"))
        .withWatermark("cts", "1 hour")
        .withColumn("ccb", expr("unix_micros(cts) div 1800000000"))
      v.join(c,
        col("user_id") === col("c_user") &&
          col("cb") === col("ccb") &&
          col("cts") >= col("vts") &&
          col("cts") <= col("vts") + expr("INTERVAL 30 MINUTES"),
        "leftOuter")
    }
      // Reconcile the ×2 bucket fan-out on the BOUNDED sink output (x18's
      // pattern — batch, not a second stateful op): per (user_id, vts)
      // group of d identical views, matched pairs pass through untouched
      // (each true pair met on exactly one bucket key), while null rows
      // need the pair of bucket rows collapsed — a view's two rows are
      // BOTH null iff no click matched anywhere in its band, so the true
      // unmatched count is nn/2 when no match exists and 0 otherwise (a
      // null row next to a matched sibling is just the empty other bucket).
      .groupBy(col("user_id"), col("vts"))
      .agg(
        sum(when(col("c_user").isNotNull, 1L).otherwise(0L)).as("nm"),
        sum(when(col("c_user").isNull, 1L).otherwise(0L)).as("nn"))
      // nn div 2 relies on an EMISSION invariant: a fully-unmatched view's
      // two bucket rows are both emitted (holds under AvailableNow — both
      // rows share vts). A trigger/checkpoint-resume change could emit them
      // asymmetrically and the div would silently undercount, so fail
      // loudly instead (ADVICE r13): assert_true is null on success, the
      // coalesce(+0) keeps the value path unchanged.
      .withColumn("_parity",
        coalesce(assert_true(col("nm") =!= 0 || col("nn") % 2 === 0,
          lit("x60 reconciliation: odd unmatched bucket-row count for a " +
            "(user_id, vts) group — the two-bucket emission invariant broke"))
          .cast("long"), lit(0L)))
      .select(col("user_id"),
        (col("nm") + when(col("nm") === 0, expr("nn div 2") + col("_parity")).otherwise(0L)).as("rows"),
        when(col("nm") === 0, expr("nn div 2") + col("_parity")).otherwise(0L).as("unm"))
      .groupBy((col("user_id") % 10).as("bucket"))
      .agg(sum(col("rows")).as("n_rows"), sum(col("unm")).as("n_unmatched"))
      .orderBy("bucket")
  }

  /** Watermark-bounded streaming dedup — the 100 TB-safe variant of x18:
    * `dropDuplicatesWithinWatermark` EVICTS a key's state once the
    * watermark passes its event time + delay, where x18's plain
    * `dropDuplicates` keeps every key ever seen (unbounded state on an
    * unbounded stream; x18 stands as the reference-parity global dedup,
    * this is the one a production deployment runs). Contract difference,
    * stated exactly: a duplicate arriving within the 30-minute delay of
    * its first occurrence is dropped; one arriving later MAY re-emit — the
    * single-segment test feed delivers every duplicate in one micro-batch,
    * so the emitted set here is exactly the distinct key set and the
    * oracle is x18's.
    */
  val streamDedupWatermark: Q = Q(
    "x74_stream_dedup_watermark",
    """SELECT user_id, event_type FROM (SELECT DISTINCT user_id, event_type FROM events)
      |ORDER BY user_id NULLS FIRST, event_type NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    runStream(s, dir, "x74_sink", "append") { ev =>
      ev.withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select("user_id", "event_type")
    }.distinct().orderBy("user_id", "event_type")
  }

  /** Per-user streaming profile on Spark 4's `transformWithState` — the
    * arbitrary-state API that supersedes `mapGroupsWithState` (typed
    * `ValueState` handles, per-state TTL, timers; RocksDB-backed by
    * requirement). The processor ([[graft.streaming.UserProfileProcessor]])
    * folds three MONOTONE counters per user — event count, Σ value-milli
    * (floor(v·1000+0.5), exact int64), max event epoch — and emits the
    * updated row each micro-batch; the sink post-aggregate takes `max`
    * per column, so the result is identical whether AvailableNow replays
    * the backlog as one batch or fifty (the batch-count-independence
    * contract a checkpoint-restart at 100 TB depends on). Oracle = the
    * plain batch per-user aggregate.
    */
  val streamTws: Q = Q(
    "x103_stream_tws",
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(sum(coalesce(CAST(floor(value * 1000 + 0.5) AS BIGINT), 0)) AS BIGINT) AS sum_milli,
      |       CAST(floor(epoch(max(ts))) AS BIGINT) AS last_epoch
      |FROM events WHERE user_id IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin
  ) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(providerKey)
    s.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // a profile needs a user key — null user_id rows are unattributable
      // (and would violate the non-nullable Long encoder); a null value
      // contributes 0 milli, mirrored by the oracle's coalesce
      runStream(s, dir, "x103_sink", "update") { ev =>
        ev.where(col("user_id").isNotNull)
          .select(col("user_id"),
            coalesce(floor(col("value") * 1000 + 0.5).cast("long"), lit(0L)).as("milli"),
            unix_timestamp(col("ts")).as("ep"))
          .as[(Long, Long, Long)]
          .groupByKey(_._1)
          .transformWithState(new graft.streaming.UserProfileProcessor,
            TimeMode.None(), OutputMode.Update())
          .toDF("user_id", "n_events", "sum_milli", "last_epoch")
      }
        .groupBy("user_id")
        .agg(max(col("n_events")).as("n_events"),
          max(col("sum_milli")).as("sum_milli"),
          max(col("last_epoch")).as("last_epoch"))
        .orderBy("user_id")
    } finally prev match {
      case Some(v) => s.conf.set(providerKey, v)
      case None    => s.conf.unset(providerKey)
    }
  }

  /** STREAMING COUNT-MIN — the f16 sketch maintained incrementally over a
    * micro-batch document stream: the cell build is the SAME shared
    * `cmCells` aggregate, run in complete mode, so streaming state does
    * the sketch's defining merge (cell-wise add of per-batch partials)
    * and the final matrix equals the batch build bit-for-bit — the oracle
    * IS f16's. This is the shape a 100 TB ingest pipeline runs: the
    * sketch absorbs each arriving shard as a micro-batch, the state is
    * 2048 cells regardless of history length, and any checkpoint is a
    * complete, queryable frequency summary. Estimates are computed
    * batch-side against the final matrix (monitoring reads the state, it
    * doesn't stream).
    */
  val streamCountmin: Q = Q(
    "x116_stream_countmin",
    graft.ops.FuncOps.countMin.oracle.get
  ) { (s, dir) =>
    val cells = runStream(s, dir, "x116_sink", "complete", table = "documents") { d =>
      FuncOps.cmCells(
        d.select(explode(split(col("text"), " ")).as("w"))
          .where(length(col("w")) >= 1))
    }
    FuncOps.cmEstimates(s, dir, cells)
  }

  val all: Seq[Q] = Seq(
    tumbling, sliding, session, streamTumbling, streamDedup,
    streamWatermark, streamStaticJoin, streamClean, streamFunnel,
    streamStreamJoin, streamSession, streamStreamLeftOuter,
    streamDedupWatermark, streamTws, streamCountmin)
}
