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
    // hot partition either way. NULL-SAFE on both keys: a plain equi join
    // would silently DROP null-keyed rows where the window formulation
    // keeps them (Spark's ntile orders nulls first under ASC, exactly
    // what the histogram window above does too, so in-engine equality
    // holds for nulls — only the cross-engine ORACLE seam needs non-null
    // keys, DuckDB defaulting to NULLS LAST)
    val cellsR = cells.withColumnRenamed(partCol, "_cp").withColumnRenamed(keyCol, "_ck")
    val joined = rows.join(cellsR,
        rows(partCol) <=> cellsR("_cp") && rows(keyCol) <=> cellsR("_ck"))
      .drop("_cp", "_ck")
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

  /** Bucket-level ntile STATISTICS straight from the histogram cells — for
    * consumers whose output depends only on the KEY (count per bucket,
    * min/max key), not on doc identity: the per-bucket contribution of a
    * cell is pure index arithmetic (the overlap of the cell's index range
    * [cum−c+1, cum] with the bucket's [end(b−1)+1, end(b)]), so NO second
    * corpus pass, NO join back to data rows, and NO doc-row sort even at
    * boundaries. One corpus-sized histogram aggregate; everything after is
    * domain-sized (cells explode over ≤ their bucket span — bounded by
    * n−1 extra rows per partition total). x58 rides this; x130 cannot
    * (tri_mass needs the doc-level split inside boundary tie groups) and
    * uses [[histNtile]].
    *
    * Returns (partCol, bucket, _n [count], keyCol+"_lo", keyCol+"_hi").
    */
  private[graft] def histNtileBucketStats(rows: DataFrame, partCol: String,
      keyCol: String, n: Int): DataFrame = {
    require(n >= 1, s"ntile needs n >= 1, got $n")
    val hist = rows.groupBy(partCol, keyCol).agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(partCol).orderBy(keyCol)
    val cum = hist
      .withColumn("_cum", sum("_c").over(w))
      .withColumn("_n", sum("_c").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("_q", expr(s"_n div $n"))
      .withColumn("_r", expr(s"_n % $n"))
    def bucketOf(i: String): String =
      s"""CASE WHEN $i <= _r * (_q + 1) THEN ($i + _q) DIV (_q + 1)
         |     ELSE _r + ($i - _r * (_q + 1) + _q - 1) DIV _q END""".stripMargin
    // 1-based END index of bucket b under the same fill order
    def endOf(b: String): String = s"($b) * _q + least($b, _r)"
    cum
      .withColumn("_bs", expr(bucketOf("_cum - _c + 1")))
      .withColumn("_be", expr(bucketOf("_cum")))
      .withColumn("bucket", explode(expr("sequence(_bs, _be)")))
      // overlap of the cell's index range with the bucket's index range
      .withColumn("_cnt",
        expr(s"least(_cum, ${endOf("bucket")}) - greatest(_cum - _c + 1, ${endOf("bucket - 1")} + 1) + 1"))
      .groupBy(partCol, "bucket")
      .agg(sum(col("_cnt")).as("_n"),
        min(col(keyCol)).as(s"${keyCol}_lo"),
        max(col(keyCol)).as(s"${keyCol}_hi"))
  }

  /** Bucket-level ntile statistics PLUS one doc-payload sum — for
    * consumers (x130) whose only doc-dependent aggregate is a SUM over an
    * attribute: whole cells contribute (count, payload sum, key) straight
    * from the histogram's own partials, so the corpus pays ONE aggregate
    * plus one row-local broadcast probe — the straddle cell map is at most
    * (n−1) rows per partition value (truly tiny at any scale, always
    * broadcastable), and only the rows of straddling tie groups shuffle
    * into the id-ordered boundary split. Compared to [[histNtile]] +
    * re-aggregation this removes the corpus-sized cell join AND the
    * corpus-sized final groupBy.
    *
    * Returns (partCol, bucket, _n [count], _sum [payload], keyCol+"_lo",
    * keyCol+"_hi").
    */
  private[graft] def histNtileSumStats(rows: DataFrame, partCol: String,
      keyCol: String, idCol: String, payloadCol: String, n: Int): DataFrame = {
    require(n >= 1, s"ntile needs n >= 1, got $n")
    val hist = rows.groupBy(partCol, keyCol)
      .agg(count(lit(1)).as("_c"), sum(payloadCol).as("_t"))
    val w = Window.partitionBy(partCol).orderBy(keyCol)
    val cum = hist
      .withColumn("_cum", sum("_c").over(w))
      .withColumn("_n", sum("_c").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("_q", expr(s"_n div $n"))
      .withColumn("_r", expr(s"_n % $n"))
    def bucketOf(i: String): String =
      s"""CASE WHEN $i <= _r * (_q + 1) THEN ($i + _q) DIV (_q + 1)
         |     ELSE _r + ($i - _r * (_q + 1) + _q - 1) DIV _q END""".stripMargin
    val cells = cum
      .withColumn("_bs", expr(bucketOf("_cum - _c + 1")))
      .withColumn("_be", expr(bucketOf("_cum")))
    val whole = cells.where(col("_bs") === col("_be"))
      .select(col(partCol), col(keyCol), col("_bs").as("bucket"),
        col("_c").as("_wn"), col("_t").as("_wsum"))
    // straddle cells: ≤ n−1 per partition value — broadcast them into a
    // row-local probe of the data rows; only matching tie-group rows
    // shuffle into the id-ordered split window
    val straddleCells = cells.where(col("_bs") =!= col("_be"))
      .select(col(partCol).as("_sp"), col(keyCol).as("_sk"),
        col("_c"), col("_cum"), col("_q"), col("_r"))
    val straddleW = Window.partitionBy(partCol, keyCol).orderBy(idCol)
    val straddle = rows.join(broadcast(straddleCells),
        rows(partCol) <=> straddleCells("_sp") && rows(keyCol) <=> straddleCells("_sk"))
      .withColumn("_rn", row_number().over(straddleW))
      .withColumn("bucket", expr(bucketOf("_cum - _c + _rn")))
      .groupBy(partCol, keyCol, "bucket")
      .agg(count(lit(1)).as("_wn"), sum(payloadCol).as("_wsum"))
      .select(col(partCol), col(keyCol), col("bucket"), col("_wn"), col("_wsum"))
    whole.unionByName(straddle)
      .groupBy(partCol, "bucket")
      .agg(sum(col("_wn")).as("_n"), sum(col("_wsum")).as("_sum"),
        min(col(keyCol)).as(s"${keyCol}_lo"),
        max(col(keyCol)).as(s"${keyCol}_hi"))
  }

  /** The DIRECT window formulations the r9 re-plan replaced — kept as the
    * single reference implementation shared by NtileDiag (before/after
    * timing), NtileSpec and SkewSpec (equality proofs), so the three
    * cannot drift from each other or from the DuckDB oracle SQL.
    */
  private[graft] def refLenDecilesWindow(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("n_chars"), col("doc_id"))
    docs.select(col("lang"), col("n_chars"), col("doc_id"))
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy("lang", "decile")
      .agg(count(lit(1)).as("n"), min(col("n_chars")).as("lo"), max(col("n_chars")).as("hi"))
      .orderBy("lang", "decile")
  }

  /** x30's production plan — the bounded-top-k twin of
    * [[refStratifiedTopKWindow]], factored HERE (r10) so the engine query,
    * NtileDiag, and the NtileSpec/SkewSpec equality fixtures all run the
    * ONE implementation (the same no-drift discipline as the window refs).
    *
    * Null text is a legal corpus shape (x136 filters it explicitly;
    * ScaleData can emit it), and under Spark 4's ANSI default
    * `size(split(NULL))` is NULL — which the replaced row_number window
    * ranked NULLS LAST (Spark's DESC default, matching DuckDB's
    * default_null_order) but the UDAF's primitive Long lane would THROW
    * on. Nulls therefore ride a rank-last sentinel through the aggregate
    * (Long.MinValue — strictly below any real distinct-word count, which
    * is ≥ 0) and decode back to NULL on output, so a null-text document
    * in a <5-row stratum is still picked, ranked, and reported exactly
    * as the window/oracle rank it (ADVICE r9 item 1; NtileSpec pins the
    * equality on a null-text fixture).
    */
  private[graft] def stratifiedTopKAgg(docs: DataFrame): DataFrame = {
    val nUnique = size(array_distinct(split(col("text"), " "))).cast("long")
    val topk = udaf(new graft.functions.TopKPairAgg(5),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
    docs
      .select(col("source"), col("lang"), col("doc_id"),
        coalesce(nUnique, lit(Long.MinValue)).as("n_unique"))
      .groupBy("source", "lang")
      .agg(topk(col("n_unique"), col("doc_id")).as("picked"))
      .select(col("source"), col("lang"),
        posexplode(col("picked")).as(Seq("pos", "pair")))
      .select(col("source"), col("lang"), (col("pos") + 1).cast("long").as("rn"),
        col("pair._2").as("doc_id"),
        when(col("pair._1") === lit(Long.MinValue), lit(null).cast("long"))
          .otherwise(col("pair._1")).as("n_unique"))
      .orderBy("source", "lang", "rn")
  }

  private[graft] def refStratifiedTopKWindow(docs: DataFrame): DataFrame = {
    val nUnique = size(array_distinct(split(col("text"), " "))).cast("long")
    val w = Window.partitionBy("source", "lang")
      .orderBy(col("n_unique").desc, col("doc_id"))
    docs.select(col("source"), col("lang"), col("doc_id"), nUnique.as("n_unique"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 5)
      .select("source", "lang", "rn", "doc_id", "n_unique")
      .orderBy("source", "lang", "rn")
  }

  private[graft] def refCcnetWindow(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy("lang").orderBy(col("mean_ppm").desc, col("doc_id"))
    scored
      .withColumn("bucket", ntile(3).over(w).cast("long"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tri")).as("tri_mass"),
        min(col("mean_ppm")).as("min_ppm"), max(col("mean_ppm")).as("max_ppm"))
      .orderBy("lang", "bucket")
  }
}
