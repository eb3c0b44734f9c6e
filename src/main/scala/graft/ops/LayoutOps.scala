package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: the write-side decisions that make 100 TB reads
  * cheap. Neither query ships data anywhere new — they compute the layout
  * keys/diagnostics a planner acts on:
  *
  *  - x40: Morton (z-order) clustering. Interleaving the bits of two
  *    dimension keys gives a 1-D sort key whose contiguous ranges cover
  *    small 2-D rectangles, so file-level min/max stats prune BOTH
  *    dimensions (the Delta/Iceberg OPTIMIZE ZORDER layout). The query
  *    groups rows by z-prefix (the file-assignment rule — a bit-shift,
  *    not a global sort, so it parallelizes trivially) and reports each
  *    bucket's bounding box; tight boxes = effective pruning.
  *  - x41: pre-shuffle hot-key diagnostic. Buckets a join/aggregate key
  *    by a content hash (engine-portable md5 slice, same coin as x28)
  *    and reports per-bucket row/key counts — the skew histogram that
  *    decides whether a join needs salting (ops/Skew.scala) before it
  *    runs, instead of discovering a straggler at hour three.
  *
  * Both are exact integer arithmetic end to end (bit ops, counts) — no
  * float rounding anywhere.
  */
object LayoutOps {

  private def docs(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "documents")

  /** Bit-interleave terms for a 16-bit Morton code, generated once for
    * each dialect from the same loop so the two engines compute
    * identically by construction. Bits are disjoint, so summing the
    * shifted terms equals OR-ing them.
    */
  private def zTermsSpark(x: String, y: String): String =
    (0 until 16).flatMap(i => Seq(
      s"shiftleft(shiftright($x, $i) & 1, ${2 * i})",
      s"shiftleft(shiftright($y, $i) & 1, ${2 * i + 1})")).mkString(" + ")

  private def zTermsDuck(x: String, y: String): String =
    (0 until 16).flatMap(i => Seq(
      s"((($x >> $i) & 1) << ${2 * i})",
      s"((($y >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")

  /** Z-order layout preview over lineitem's (partkey, suppkey): rows are
    * assigned to files by z-prefix (top bits of the Morton code), and the
    * per-file bounding boxes show what a (partkey AND suppkey) predicate
    * could prune. 2^14-wide prefixes — sized so the sf key domain spreads across dozens of buckets.
    */
  val zorderLayout: Q = Q(
    "x40_zorder_layout",
    s"""WITH base AS (SELECT l_partkey % 65536 AS px, l_suppkey % 65536 AS sy FROM lineitem),
       |z AS (SELECT px, sy, ${zTermsDuck("px", "sy")} AS zval FROM base)
       |SELECT CAST(zval >> 14 AS BIGINT) AS zbucket, CAST(count(*) AS BIGINT) AS n,
       |       CAST(min(px) AS BIGINT) AS min_px, CAST(max(px) AS BIGINT) AS max_px,
       |       CAST(min(sy) AS BIGINT) AS min_sy, CAST(max(sy) AS BIGINT) AS max_sy
       |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin
  ) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .select((col("l_partkey") % 65536).as("px"), (col("l_suppkey") % 65536).as("sy"))
      .withColumn("zval", expr(zTermsSpark("px", "sy")))
      .groupBy(expr("zval >> 14").cast("long").as("zbucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("px")).cast("long").as("min_px"), max(col("px")).cast("long").as("max_px"),
        min(col("sy")).cast("long").as("min_sy"), max(col("sy")).cast("long").as("max_sy"))
      .orderBy("zbucket")
  }

  /** Hot-key histogram for events.user_id over 32 hash buckets: the
    * pre-flight skew check before a user-keyed join/aggregate. The bucket
    * coin is a content hash (md5 slice), not the engine's internal
    * partitioner, so the histogram is portable and deterministic.
    */
  val keySkew: Q = Q(
    "x41_key_skew",
    """SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_keys
      |FROM (SELECT user_id,
      |        CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4) AS INTEGER) % 32 AS bucket
      |      FROM events)
      |GROUP BY bucket ORDER BY bucket NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    Tables(s, dir, "events")
      .select(col("user_id"),
        (conv(substring(md5(col("user_id").cast("string")), 1, 4), 16, 10).cast("int") % 32)
          .as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("user_id")).as("n_keys"))
      .orderBy("bucket")
  }

  /** Salted skew join, executed end-to-end: events joined to a per-type
    * derived dim on `event_type` — 5 distinct keys, the worst join skew
    * possible (every row of a 100 TB fact lands on 5 reducers). The fact
    * side gets a deterministic 8-way salt (the x28/x41 md5 coin over the
    * row content), the dim side is exploded ×8, and the join runs on
    * (event_type, salt) — 40 balanced keys instead of 5 hot ones. The
    * merge hint forces the shuffle join this pattern exists for (unsalted
    * broadcast would hide the point at test scale; at 100 TB the dim side
    * of a skewed join is often itself too big to broadcast). The oracle is
    * the PLAIN unsalted join — salting must be invisible in the result.
    */
  val saltedJoin: Q = Q(
    "x61_salted_join",
    """WITH dim AS (SELECT event_type, min(value) AS floor_v FROM events GROUP BY event_type)
      |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n, round(min(d.floor_v), 6) AS floor_v
      |FROM events e JOIN dim d ON e.event_type = d.event_type
      |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin
  ) { (s, dir) =>
    val ev = Tables(s, dir, "events")
    val salted = ev.select(col("event_type"), col("value"),
      (conv(substring(md5(col("event_id").cast("string")), 1, 4), 16, 10).cast("int") % 8)
        .as("salt"))
    val dim = ev.groupBy(col("event_type").as("d_type"))
      .agg(min(col("value")).as("floor_v"))
      .withColumn("d_salt", explode(sequence(lit(0), lit(7))))
    salted.join(dim.hint("merge"),
        col("event_type") === col("d_type") && col("salt") === col("d_salt"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(min(col("floor_v")), 6).as("floor_v"))
      .orderBy("event_type")
  }

  /** Rendezvous (highest-random-weight) shard placement + the elastic
    * rebalance audit: every document picks the shard with the highest
    * md5(doc_id:shard) weight, for an 8-shard and a 9-shard ring, and the
    * query reports per-shard population plus how many documents MOVE when
    * the 9th shard joins. Rendezvous hashing's contract — the reason it
    * beats `hash % N` for 100 TB data placement — is that adding a shard
    * relocates ONLY the documents whose new argmax IS the new shard
    * (expected 1/9 of the corpus), where mod-hashing reshuffles ~8/9 of
    * every byte. The oracle proves the contract cross-engine: n_moved
    * equals n_docs on shard 8 and is 0 everywhere else (spec-asserted,
    * with the movement fraction near 1/9).
    *
    * Scale shape: placement itself is per-document local compute (17
    * hashes from a generated shard dimension — production swaps md5 for
    * xxhash); the rebalance AUDIT joins the two assignment tables on
    * doc_id — narrow (id, shard) rows, never the documents — and ends in
    * a 9-row aggregate.
    */
  val shardRebalance: Q = Q(
    "x75_shard_rebalance",
    """WITH s8 AS (SELECT doc_id, s AS shard FROM (
      |  SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
      |    ORDER BY md5(doc_id || ':' || s) DESC, s) AS rk
      |  FROM documents, (SELECT unnest(generate_series(0, 7)) AS s)) WHERE rk = 1),
      |s9 AS (SELECT doc_id, s AS shard FROM (
      |  SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id
      |    ORDER BY md5(doc_id || ':' || s) DESC, s) AS rk
      |  FROM documents, (SELECT unnest(generate_series(0, 8)) AS s)) WHERE rk = 1)
      |SELECT s9.shard, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(CASE WHEN s8.shard <> s9.shard THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
      |FROM s9 JOIN s8 ON s9.doc_id = s8.doc_id
      |GROUP BY s9.shard ORDER BY s9.shard""".stripMargin
  ) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    def assign(nShards: Int): DataFrame = {
      val w = Window.partitionBy("doc_id")
        .orderBy(col("weight").desc, col("s"))
      docs(s, dir).select(col("doc_id"),
          explode(sequence(lit(0), lit(nShards - 1))).as("s"))
        .withColumn("weight", md5(concat(col("doc_id"), lit(":"), col("s"))))
        .withColumn("rk", row_number().over(w)).where(col("rk") === 1)
        .select(col("doc_id"), col("s").as("shard"))
    }
    assign(9).as("s9")
      .join(assign(8).as("s8"), "doc_id")
      .groupBy(col("s9.shard").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("s8.shard") =!= col("s9.shard"), 1L).otherwise(0L)).as("n_moved"))
      .orderBy("shard")
  }

  /** Zone-map data-skipping evaluator: the write-side layout decision that
    * determines whether a 100 TB scan reads 100 TB or one file. Rows are
    * assigned to zones (the file/row-group unit whose min/max column stats
    * a reader consults — parquet row groups, Delta/Iceberg file stats)
    * under two layouts: `insertion` (zone = o_orderkey div 1024 — arrival
    * order, dates spread everywhere) and `datepart` (zone = calendar month
    * — the partition-by-date layout). For a literal one-month predicate
    * the query reports, per layout, how many zones/rows min-max pruning
    * would actually scan: skip_ppm (zones skipped) and read_amp_ppm (rows
    * scanned per matching row). The spec asserts the designed contrast —
    * datepart prunes to ≥100× fewer scanned rows — and that rows_match is
    * layout-invariant (pruning never changes the answer, only the cost).
    *
    * Scale shape: ONE orders scan, a row-local 2-way layout fan-out
    * (explode of two structs), then a zone-granularity aggregate — zone
    * maps are file-count-sized, thousands of times smaller than rows; the
    * layout report is 2 rows. No join, no window. rows_scanned·1e6 stays
    * int64 to ~9e12 scanned rows per layout zone-set (1e38 via the decimal
    * path is not needed at any plausible orders cardinality).
    */
  val zoneSkipping: Q = Q(
    "x100_zone_skipping",
    """WITH base AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders),
      |z AS (
      |  SELECT 'insertion' AS layout, o_orderkey // 1024 AS zone, d FROM base
      |  UNION ALL
      |  SELECT 'datepart' AS layout, CAST(year(d) * 12 + month(d) - 1 AS BIGINT) AS zone, d FROM base),
      |zm AS (SELECT layout, zone, count(*) AS n, min(d) AS min_d, max(d) AS max_d,
      |         sum(CASE WHEN d BETWEEN DATE '1995-03-01' AND DATE '1995-03-31'
      |             THEN 1 ELSE 0 END) AS n_match
      |       FROM z GROUP BY 1, 2)
      |SELECT layout,
      |  CAST(count(*) AS BIGINT) AS n_zones,
      |  CAST(sum(CASE WHEN min_d <= DATE '1995-03-31' AND max_d >= DATE '1995-03-01'
      |       THEN 1 ELSE 0 END) AS BIGINT) AS zones_scanned,
      |  CAST(sum(n) AS BIGINT) AS rows_total,
      |  CAST(sum(CASE WHEN min_d <= DATE '1995-03-31' AND max_d >= DATE '1995-03-01'
      |       THEN n ELSE 0 END) AS BIGINT) AS rows_scanned,
      |  CAST(sum(n_match) AS BIGINT) AS rows_match,
      |  CAST((count(*) - sum(CASE WHEN min_d <= DATE '1995-03-31' AND max_d >= DATE '1995-03-01'
      |       THEN 1 ELSE 0 END)) * 1000000 // count(*) AS BIGINT) AS skip_ppm,
      |  CAST(CAST(sum(CASE WHEN min_d <= DATE '1995-03-31' AND max_d >= DATE '1995-03-01'
      |       THEN n ELSE 0 END) AS HUGEINT) * 1000000
      |       // greatest(CAST(sum(n_match) AS HUGEINT), 1) AS BIGINT) AS read_amp_ppm
      |FROM zm GROUP BY layout ORDER BY layout""".stripMargin
  ) { (s, dir) =>
    val lo = lit(java.sql.Date.valueOf("1995-03-01"))
    val hi = lit(java.sql.Date.valueOf("1995-03-31"))
    val base = Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d"))
    val z = base.select(explode(array(
        struct(lit("insertion").as("layout"), expr("o_orderkey div 1024").as("zone")),
        struct(lit("datepart").as("layout"),
          (year(col("d")) * 12 + month(col("d")) - 1).cast("long").as("zone"))))
        .as("lz"), col("d"))
      .select(col("lz.layout").as("layout"), col("lz.zone").as("zone"), col("d"))
    val scanned = col("min_d") <= hi && col("max_d") >= lo
    z.groupBy("layout", "zone")
      .agg(count(lit(1)).as("n"), min(col("d")).as("min_d"), max(col("d")).as("max_d"),
        sum(when(col("d").between(lo, hi), 1L).otherwise(0L)).as("n_match"))
      .groupBy("layout")
      .agg(
        count(lit(1)).as("n_zones"),
        sum(when(scanned, 1L).otherwise(0L)).as("zones_scanned"),
        sum(col("n")).as("rows_total"),
        sum(when(scanned, col("n")).otherwise(0L)).as("rows_scanned"),
        sum(col("n_match")).as("rows_match"))
      .withColumn("skip_ppm", expr("(n_zones - zones_scanned) * 1000000 div n_zones"))
      .withColumn("read_amp_ppm", expr("rows_scanned * 1000000 div greatest(rows_match, 1)"))
      .orderBy("layout")
  }

  /** Output-shard manifest planner: assign every document of every
    * language to one of ceil(T_lang / 262144) ~256k-token output shards
    * by a content hash, and audit each shard's fill against the target —
    * the write-side plan of a corpus build (tokenizer shards, packed
    * training files, DataSourceV2 write partitions). The deliberate
    * contrast with x29: greedy packing emits perfectly filled bins but is
    * SEQUENTIAL per stream by identity (one task per source); hash
    * sharding is fully parallel — assignment is row-local after a
    * |languages|-row broadcast — and pays for it with binomial fill
    * variance, which is exactly what `fill_ppm` measures (the planner's
    * evidence for choosing shard count ≫ writer count so the variance
    * averages out across tasks).
    *
    * Determinism: shard = first-8-hex-of-md5(doc_id) mod n_shards (the
    * x28 coin idiom widened to 32 bits); n_shards = ⌈T/262144⌉ in pure
    * integer arithmetic; fill ppm widened before the ×1e6 (the x125
    * overflow lesson, HUGEINT on the DuckDB side).
    *
    * Scale shape: one per-language token aggregate (broadcast back as the
    * shard-count dimension), a row-local coin, and one (lang, shard) hash
    * aggregate — no window, no join wider than the |languages| dim.
    */
  val shardPlan: Q = Q(
    "x136_shard_plan",
    """WITH d AS (SELECT lang, doc_id, len(string_split(text, ' ')) AS tok
      |           FROM documents WHERE text IS NOT NULL),
      |t AS (SELECT lang, sum(tok) AS total FROM d GROUP BY lang),
      |ns AS (SELECT lang, greatest(1, (total + 262143) // 262144) AS n_shards FROM t),
      |a AS (SELECT d.lang, d.tok,
      |        CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
      |          % ns.n_shards AS shard
      |      FROM d JOIN ns ON d.lang = ns.lang)
      |SELECT lang, CAST(shard AS BIGINT) AS shard, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(tok) AS BIGINT) AS shard_tokens,
      |       CAST(CAST(sum(tok) AS HUGEINT) * 1000000 // 262144 AS BIGINT) AS fill_ppm
      |FROM a GROUP BY lang, shard ORDER BY lang, shard""".stripMargin
  ) { (s, dir) =>
    val d = docs(s, dir).where(col("text").isNotNull)
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tok"))
    val ns = d.groupBy("lang").agg(sum(col("tok")).as("total"))
      .select(col("lang").as("ns_lang"),
        greatest(lit(1L), expr("(total + 262143) div 262144")).as("n_shards"))
    d.join(broadcast(ns), col("lang") === col("ns_lang"))
      .withColumn("shard",
        conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10).cast("long")
          % col("n_shards"))
      .groupBy("lang", "shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("shard_tokens"),
        expr("cast(cast(sum(tok) as decimal(38,0)) * 1000000 div 262144 as bigint)")
          .as("fill_ppm"))
      .orderBy("lang", "shard")
  }

  val all: Seq[Q] = Seq(zorderLayout, keySkew, saltedJoin, shardRebalance, zoneSkipping,
    shardPlan)
}
