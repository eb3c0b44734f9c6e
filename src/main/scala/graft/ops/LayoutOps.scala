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
      |GROUP BY bucket ORDER BY bucket""".stripMargin
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

  val all: Seq[Q] = Seq(zorderLayout, keySkew, saltedJoin)
}
