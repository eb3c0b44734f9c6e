package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Histogram-boundary ntile: exact `ntile(n) OVER (PARTITION BY part
  * ORDER BY key, id)` bucket assignment WITHOUT a per-partition sort of
  * the data rows — the r9 re-plan for the per-language rank-window family
  * (x58 deciles, x130 terciles) the round-8 verdict flagged as the
  * engine's last single-hot-task plan shape.
  *
  * Why the direct window is a scale defect: `ntile(n) OVER (PARTITION BY
  * lang …)` caps parallelism at the partition-key cardinality (~5
  * languages), and on a real corpus one language is ~half the data — ONE
  * reducer sorts a multi-TB slice regardless of cluster size. The volume
  * argument ("only 28 B/doc shuffle") never addressed the partition-count
  * ceiling.
  *
  * The re-plan (t21 exactQuantiles machinery + x111's boundary-bin exact
  * sort, composed):
  *
  *  1. VALUE HISTOGRAM — one Tungsten hash aggregate on (part, key):
  *     map-side combined, spillable, parallelism = key cardinality ×
  *     part — the only corpus-sized exchange.
  *  2. CUMULATIVE COUNTS over the HISTOGRAM — a window partitioned by
  *     `part` whose row count is the value DOMAIN per partition (distinct
  *     lengths / ppm scores), not the corpus; the running count and the
  *     partition total ride ONE fused WindowExec (same spec trick as
  *     exactQuantiles). Each histogram cell now knows its 1-based row-
  *     index range [cum−c+1, cum] in the ntile order.
  *  3. ROW-LOCAL BUCKET ARITHMETIC — SQL-standard ntile semantics are
  *     pure integer functions of the row index i: with q = N div n,
  *     r = N mod n, the first r buckets take q+1 rows, the rest q, so
  *     bucket(i) = ⌈i/(q+1)⌉ when i ≤ r(q+1) else r + ⌈(i−r(q+1))/q⌉.
  *     A cell whose whole index range lands in one bucket (the common
  *     case — all but ≤ n−1 cells per partition) gets its bucket with NO
  *     per-row ordering at all.
  *  4. BOUNDARY CELLS ONLY — a cell straddling a bucket boundary (ties on
  *     `key` split by the id tiebreak) is resolved by an exact
  *     `row_number` window partitioned by (part, key): only the ≤ n−1
  *     straddling cells' rows enter it, and its partition key includes
  *     the VALUE, so a hot language no longer concentrates in one task —
  *     the hot unit is one tie-group on one boundary value.
  *
  * Equality with the direct window is structural: cells partition
  * disjoint (key) ranges in ntile order, cell index ranges are exact, and
  * the boundary window applies the same (id) order the global sort would
  * inside the one cell it touches. NtileSpec proves bit-equality against
  * Spark's own ntile on corpus data and on adversarial fixtures (ties
  * spanning boundaries, partitions smaller than n, single-value
  * partitions); the DuckDB oracles of x58/x130 remain the direct-window
  * formulation, so every correctness round re-proves the re-plan.
  */
object NtilePlan {

  /** Adds an exact ntile `bucket` (long, 1-based) to `rows`, equal to
    * `ntile(n) OVER (PARTITION BY partCol ORDER BY keyCol ASC, idCol
    * ASC)`. For a DESC key order, pass a negated key column. `keyCol`
    * must be non-null (both engines' ntile NULL placement differs; every
    * in-repo caller feeds derived non-null longs).
    */
  private[graft] def histNtile(rows: DataFrame, partCol: String, keyCol: String,
      idCol: String, n: Int): DataFrame = {
    require(n >= 1, s"ntile needs n >= 1, got $n")
    val hist = rows.groupBy(partCol, keyCol).agg(count(lit(1)).as("_c"))
    // running count + partition total fuse into ONE WindowExec over
    // domain-sized rows (the exactQuantiles spec-sharing trick)
    val w = Window.partitionBy(partCol).orderBy(keyCol)
    val cum = hist
      .withColumn("_cum", sum("_c").over(w))
      .withColumn("_n", sum("_c").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("_q", expr(s"_n div $n"))
      .withColumn("_r", expr(s"_n % $n"))
    // bucket of 1-based row index i under SQL-standard ntile fill order
    def bucketOf(i: String): String =
      s"""CASE WHEN $i <= _r * (_q + 1) THEN ($i + _q) DIV (_q + 1)
         |     ELSE _r + ($i - _r * (_q + 1) + _q - 1) DIV _q END""".stripMargin
    val cells = cum
      .withColumn("_bs", expr(bucketOf("_cum - _c + 1")))
      .withColumn("_be", expr(bucketOf("_cum")))
      // _q/_r ride along: the straddle branch re-evaluates bucketOf per row
      .select(partCol, keyCol, "_c", "_cum", "_q", "_r", "_bs", "_be")
    // cell map joins back on (part, key): Catalyst broadcasts it while it
    // is small; at corpus scale it is a high-cardinality equi join — no
    // hot partition either way
    val joined = rows.join(cells, Seq(partCol, keyCol))
    val whole = joined.where(col("_bs") === col("_be"))
      .withColumn("bucket", col("_bs"))
    // ≤ n−1 straddling cells per partition; the window's partition key
    // includes the VALUE, so the unit of serialization is one tie-group
    // on one boundary value — never a language's whole slice
    val straddleW = Window.partitionBy(partCol, keyCol).orderBy(idCol)
    val straddle = joined.where(col("_bs") =!= col("_be"))
      .withColumn("_rn", row_number().over(straddleW))
      .withColumn("bucket", expr(bucketOf("_cum - _c + _rn")))
      .drop("_rn")
    whole.unionByName(straddle)
      .drop("_c", "_cum", "_q", "_r", "_bs", "_be")
  }
}
