package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function pack (SURVEY.md §2.B "Scalar functions"): the hash/
  * crypto, date/time, and math families as oracle-checked projections, plus
  * the approximate-distinct sketch (HLL++) as a rows-only query.
  *
  * Only functions with bit-identical cross-engine semantics go in oracle
  * queries (md5/sha256/base64 are specified byte-exact; sqrt is IEEE
  * correctly-rounded; floor/ceil/abs/sign/mod are exact). `pow`/`log`/`exp`
  * are NOT correctly-rounded by libm and may differ in the last ulp between
  * engines — deliberately excluded from oracle surface.
  */
object FuncOps {

  private def events(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "events")

  /** Hash + encode family (O-21/O-31 provenance: key derivation, AES/base64
    * utilities — ref src/model/topic.go:119-123, src/icrypto/util.go:23-45).
    */
  val hashFuncs: Q = Q(
    "f01_hash_funcs",
    """SELECT event_id,
      |  md5(props) AS h_md5,
      |  sha256(props) AS h_sha256,
      |  to_base64(encode(props)) AS b64,
      |  length(props) AS n
      |FROM events WHERE event_id % 97 = 0 ORDER BY event_id""".stripMargin
  ) { (s, dir) =>
    events(s, dir)
      .where(col("event_id") % 97 === 0)
      .select(
        col("event_id"),
        md5(col("props")).as("h_md5"),
        sha2(col("props"), 256).as("h_sha256"),
        base64(col("props").cast("binary")).as("b64"),
        length(col("props")).as("n"))
      .orderBy("event_id")
  }

  /** Date/time family (EventTime/PublishTime handling, TTL arithmetic —
    * ref src/pulsardriver/pulsar-producer.go:91, src/util/cache-item.go:31-43).
    * Weekday via ISO numbering (both engines agree); month-start via
    * date_trunc, emitted as epoch seconds.
    */
  val datetimeFuncs: Q = Q(
    "f02_datetime_funcs",
    """SELECT CAST(floor(epoch(date_trunc('month', ts))) AS BIGINT) AS month_start,
      |       isodow(ts) AS iso_dow, hour(ts) AS hr,
      |       count(*) AS n,
      |       min(datediff('day', TIMESTAMP '2024-01-01', ts)) AS min_day_off,
      |       max(datediff('day', TIMESTAMP '2024-01-01', ts)) AS max_day_off
      |FROM events GROUP BY 1, 2, 3 ORDER BY month_start, iso_dow, hr""".stripMargin
  ) { (s, dir) =>
    events(s, dir)
      .groupBy(
        unix_timestamp(date_trunc("month", col("ts"))).as("month_start"),
        (weekday(col("ts")) + 1).as("iso_dow"),
        hour(col("ts")).as("hr"))
      .agg(
        count(lit(1)).as("n"),
        min(datediff(col("ts"), lit("2024-01-01").cast("date"))).as("min_day_off"),
        max(datediff(col("ts"), lit("2024-01-01").cast("date"))).as("max_day_off"))
      .orderBy("month_start", "iso_dow", "hr")
  }

  /** Math family — exact/correctly-rounded subset (see object doc). */
  val mathFuncs: Q = Q(
    "f03_math_funcs",
    """SELECT event_type,
      |  CAST(sum(CAST(round(sqrt(abs(value)), 6) AS DECIMAL(18,6))) AS DOUBLE) AS sum_sqrt,
      |  CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor,
      |  CAST(sum(CAST(ceil(value) AS BIGINT)) AS BIGINT) AS sum_ceil,
      |  CAST(sum(CASE WHEN CAST(floor(value * 100 + 0.5) AS BIGINT) % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even_cents,
      |  CAST(sum(CAST(sign(value - 100) AS BIGINT)) AS BIGINT) AS sign_sum
      |FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    // 6-dp-rounded sqrt summed through decimal → aggregation-order-proof.
    // Integer sums CAST to BIGINT on the oracle side: DuckDB sum(int) is
    // HUGEINT, which pandas renders as float64 and the driver hash then
    // diverges from Spark's int64. floor(x+0.5) instead of round(): the
    // identical IEEE ops run on both engines, so .5-boundary ties agree.
    events(s, dir)
      .groupBy("event_type")
      .agg(
        sum(round(sqrt(abs(col("value"))), 6).cast("decimal(18,6)")).cast("double").as("sum_sqrt"),
        sum(floor(col("value")).cast("long")).as("sum_floor"),
        sum(ceil(col("value")).cast("long")).as("sum_ceil"),
        sum(when(floor(col("value") * 100 + 0.5).cast("long") % 2 === 0, 1).otherwise(0)).as("n_even_cents"),
        sum(signum(col("value") - 100).cast("long")).as("sign_sum"))
      .orderBy("event_type")
  }

  /** AES round-trip (O-31, ref src/icrypto/icrypto.go:44-94): encrypt and
    * decrypt every payload with a 128-bit key in deterministic ECB mode; the
    * oracle states the contract — every row round-trips.
    */
  val aesRoundtrip: Q = Q(
    "f04_aes_roundtrip",
    "SELECT event_type, count(*) AS n_ok, count(*) AS n FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST"
  ) { (s, dir) =>
    val key = lit("0123456789abcdef")
    val roundtrip = expr(
      "cast(aes_decrypt(aes_encrypt(cast(props as binary), '0123456789abcdef', 'ECB'), " +
        "'0123456789abcdef', 'ECB') as string)")
    events(s, dir)
      // null-safe <=>: a NULL payload round-trips to NULL, which IS the
      // intact round-trip — plain === would count it as a failure
      .select(col("event_type"), (roundtrip <=> col("props")).as("ok"))
      .groupBy("event_type")
      .agg(
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** Raw HLL++ output (estimate + exact alongside) — the spec-bounded
    * surface: QueriesSpec asserts the estimate within 4× the requested rsd.
    *
    * Deliberately NOT `agg(approx_count_distinct, countDistinct)` in one
    * aggregation: mixing a distinct aggregate with a non-distinct one makes
    * Spark's RewriteDistinctAggregates build a *partial HLL sketch per
    * (event_type, user_id) group* — at rsd 0.01 that is 1,639 LongType
    * buffer columns (~13 KB) per distinct user carried through two
    * exchanges, which at corpus scale shuffles sketch bytes proportional
    * to |distinct users|. HLL registers are duplicate-insensitive, so
    * deduplicating first and sketching the deduped rows yields the
    * bit-identical estimate while building sketches only per event_type
    * (one per group, not one per user); exact_users is then a plain
    * count(*). Same two exchanges, sketch payload shrunk by |users|×.
    */
  private[graft] def approxDistinctRaw(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      // count(DISTINCT user_id) semantics: distinct NON-NULL keys — the
      // count(*)-after-distinct rewrite would otherwise count a null row
      .where(col("user_id").isNotNull)
      .select("event_type", "user_id").distinct()
      .groupBy("event_type")
      .agg(
        approx_count_distinct("user_id", 0.01).as("approx_users"),
        count(lit(1)).as("exact_users"))
      .orderBy("event_type")

  /** Approximate distinct (HLL++). Sketch estimates are engine-specific, so
    * the DECLARED output is the hash-verifiable split: group keys + exact
    * counts (oracle-exact) + `approx_ok`, each engine's own sketch checked
    * against ITS exact count under a shared 5% (floor 5) band — both
    * engines' HLLs sit far inside it, so the boolean is deterministic and
    * the whole row hash-matches. The raw estimate itself stays covered by
    * the 4×-rsd spec on [[approxDistinctRaw]].
    */
  val approxDistinct: Q = Q(
    "f05_approx_distinct",
    """SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      |       (abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
      |          <= greatest(5.0, 0.05 * count(DISTINCT user_id))) AS approx_ok
      |FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    approxDistinctRaw(s, dir)
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users"))
          <= greatest(lit(5.0), lit(0.05) * col("exact_users"))).as("approx_ok"))
      .orderBy("event_type")
  }

  /** Edit distance (fuzzy matching for entity resolution / near-dup field
    * values): Spark's `levenshtein` against DuckDB's — an exact integer,
    * so parity is structural. Row-local, zero shuffle.
    */
  val editDistance: Q = Q(
    "f06_edit_distance",
    """SELECT p_partkey, CAST(levenshtein(p_name, p_type) AS INTEGER) AS d_type,
      |       CAST(levenshtein(p_name, p_brand) AS INTEGER) AS d_brand
      |FROM part WHERE p_partkey <= 100 ORDER BY p_partkey""".stripMargin
  ) { (s, dir) =>
    Tables(s, dir, "part")
      .where(col("p_partkey") <= 100)
      .select(col("p_partkey"),
        levenshtein(col("p_name"), col("p_type")).as("d_type"),
        levenshtein(col("p_name"), col("p_brand")).as("d_brand"))
      .orderBy("p_partkey")
  }

  /** Fixed-width value histogram (5-unit buckets, clamped to [0, 19]) —
    * the profiling pass behind range-filter selectivity estimates. Exact:
    * floor of an IEEE double division plus greatest/least, identical on
    * both engines (DuckDB lacks width_bucket; this is its portable form).
    */
  val valueHistogram: Q = Q(
    "f07_value_histogram",
    """SELECT event_type,
      |       CAST(greatest(least(CAST(floor(value / 5) AS BIGINT), 19), 0) AS BIGINT) AS bucket,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM events GROUP BY 1, 2 ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    events(s, dir)
      .groupBy(col("event_type"),
        greatest(least(floor(col("value") / 5).cast("long"), lit(19L)), lit(0L)).as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "bucket")
  }

  /** Typed-UDAF surface ([[graft.functions.TopKAgg]]): exact per-group
    * top-5 via a bounded-buffer Aggregator — partial aggregation reduces
    * every map task to ≤ k values before the exchange, unlike the
    * window-rank formulation which shuffles every row. Oracle: sorted
    * list slice.
    */
  val topkAgg: Q = Q(
    "f08_topk_agg",
    """SELECT event_type, top5[1] AS v1, top5[2] AS v2, top5[3] AS v3,
      |       top5[4] AS v4, top5[5] AS v5
      |FROM (SELECT event_type, list_slice(list_sort(list(value), 'DESC'), 1, 5) AS top5
      |      FROM events WHERE value IS NOT NULL GROUP BY event_type)
      |ORDER BY event_type NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    val topk = udaf(new graft.functions.TopKAgg(5), org.apache.spark.sql.Encoders.scalaDouble)
    // scalar columns rather than one array column: the driver's comparator
    // matches cell-by-cell and chokes on array-valued float cells.
    // value IS NOT NULL on BOTH engines: DuckDB's list() keeps NULLs where
    // collect-style aggregation drops them — rank k would drift by engine.
    events(s, dir)
      .where(col("value").isNotNull)
      .groupBy("event_type")
      .agg(topk(col("value")).as("top5"))
      .select(col("event_type") +: (1 to 5).map(i =>
        // try_element_at: a group with < 5 rows must NULL-pad like the
        // oracle's list slicing, not throw under ANSI mode
        try_element_at(col("top5"), lit(i)).as(s"v$i")): _*)
      .orderBy("event_type")
  }

  /** String family 2 — the byte-exact cross-engine subset beyond f01/r08:
    * reverse, lpad, repeat, 1-based substring position (Spark `instr` ≡
    * DuckDB `strpos`), left/right slices. Row-local projection.
    */
  val stringFuncs: Q = Q(
    "f09_string_funcs",
    """SELECT p_partkey, reverse(p_brand) AS rev,
      |       lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
      |       repeat(left(p_name, 2), 2) AS rep,
      |       CAST(strpos(p_name, 'a') AS BIGINT) AS pos_a,
      |       right(p_type, 3) AS tail
      |FROM part WHERE p_partkey <= 200 ORDER BY p_partkey""".stripMargin
  ) { (s, dir) =>
    Tables(s, dir, "part")
      .where(col("p_partkey") <= 200)
      .select(col("p_partkey"),
        reverse(col("p_brand")).as("rev"),
        lpad(col("p_size").cast("string"), 4, "0").as("padded"),
        expr("repeat(left(p_name, 2), 2)").as("rep"),
        instr(col("p_name"), "a").cast("long").as("pos_a"),
        expr("right(p_type, 3)").as("tail"))
      .orderBy("p_partkey")
  }

  /** Bitwise family: bit_and / bit_or / bit_xor aggregates per line number
    * plus a scalar shift-and-mask — integer-exact on both engines. The
    * xor aggregate is order-free (xor is associative/commutative), so the
    * partial-aggregate plan needs no ordering guarantee.
    */
  val bitwiseFuncs: Q = Q(
    "f10_bitwise_funcs",
    """SELECT CAST(l_linenumber AS BIGINT) AS ln,
      |       CAST(bit_and(l_orderkey) AS BIGINT) AS all_and,
      |       CAST(bit_or(l_partkey) AS BIGINT) AS any_or,
      |       CAST(bit_xor(l_suppkey) AS BIGINT) AS xsum,
      |       CAST(bit_xor(l_orderkey << 3) AS BIGINT) AS xshift,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY l_linenumber ORDER BY ln""".stripMargin
  ) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .groupBy(col("l_linenumber").cast("long").as("ln"))
      .agg(
        expr("cast(bit_and(l_orderkey) as bigint)").as("all_and"),
        expr("cast(bit_or(l_partkey) as bigint)").as("any_or"),
        expr("cast(bit_xor(l_suppkey) as bigint)").as("xsum"),
        expr("cast(bit_xor(shiftleft(l_orderkey, 3)) as bigint)").as("xshift"),
        count(lit(1)).as("n"))
      .orderBy("ln")
  }

  /** Raw approx-percentile output — the spec-bounded surface: QueriesSpec
    * pins the estimate between the exact p40/p60 per group.
    */
  private[graft] def approxPercentileRaw(s: SparkSession, dir: String): DataFrame = {
    // exact legs ride RelOps.exactQuantiles (r10): `events.value` is an
    // unbounded-cardinality double domain — exactly the shape whose
    // built-in `percentile` boxed-map buffer OOMed the round-8 2 GB sf1
    // proof (the t21/l_extendedprice class). The GK sketch keeps the
    // built-in approx aggregate: bounded mergeable state by construction.
    val ex = RelOps.exactQuantiles(
      events(s, dir).select("event_type", "value"), "event_type", "value",
      Seq("exact_p40" -> 0.4, "exact_med" -> 0.5, "exact_p60" -> 0.6))
    // null-safe LEFT join (x39/x54 bug class): a NULL group key must keep
    // its row — an inner equi-join would silently drop the null-key group,
    // and a group whose values are all NULL is absent from ex entirely
    events(s, dir)
      .groupBy("event_type")
      .agg(percentile_approx(col("value"), lit(0.5), lit(10000)).as("approx_med"),
        count(col("value")).as("n_vals"))
      .join(ex.withColumnRenamed("event_type", "et2"),
        col("event_type") <=> col("et2"), "left")
      .select(col("event_type"), col("approx_med"), col("n_vals"),
        col("exact_p40"), col("exact_med"), col("exact_p60"))
      .orderBy("event_type")
  }

  /** Approximate percentile (GK-style sketch, `approx_percentile`): sketch
    * internals are engine-specific (Spark GK vs DuckDB t-digest), so the
    * DECLARED output is the hash-verifiable split: exact interpolated
    * percentiles at 6 dp (oracle-exact, the t19-proven IEEE contract) plus
    * `approx_in_band` — each engine's own sketch median pinned between ITS
    * exact p40/p60, a window both sketches land far inside, making the
    * boolean deterministic. The raw estimate stays covered by the spec on
    * [[approxPercentileRaw]]. The scale story is unchanged: the sketch is
    * a bounded-memory mergeable aggregate, where exact `percentile` must
    * buffer every value of the group.
    */
  val approxPercentile: Q = Q(
    "f11_approx_percentile",
    """SELECT event_type,
      |       round(quantile_cont(value, 0.4), 6) AS exact_p40,
      |       round(median(value), 6) AS exact_med,
      |       round(quantile_cont(value, 0.6), 6) AS exact_p60,
      |       (count(value) < 10 OR approx_quantile(value, 0.5)
      |          BETWEEN quantile_cont(value, 0.4) AND quantile_cont(value, 0.6)) AS approx_in_band
      |FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    // n < 10 escape on BOTH engines: for a tiny group a rank-exact sketch
    // (GK returns an actual element) can legitimately sit outside the
    // INTERPOLATED p40..p60 band, so the boolean is only contracted where
    // the band is meaningful (hostile sweep)
    approxPercentileRaw(s, dir)
      .select(col("event_type"),
        round(col("exact_p40"), 6).as("exact_p40"),
        round(col("exact_med"), 6).as("exact_med"),
        round(col("exact_p60"), 6).as("exact_p60"),
        (col("n_vals") < 10 ||
          (col("approx_med") >= col("exact_p40") && col("approx_med") <= col("exact_p60")))
          .as("approx_in_band"))
      .orderBy("event_type")
  }

  /** Linear-regression aggregate family (slope / intercept / corr / r²)
    * computed from EXACT integer sufficient statistics: x = hour-of-day,
    * y = value in cents, and the five sums n·Σx·Σy·Σxy·Σx²·Σy² are int64
    * aggregates — order-free, so the result is partitioning-independent.
    * The built-in `regr_*`/`corr` aggregates merge running means in
    * floating point, where the merge ORDER (shuffle-fetch order — not even
    * deterministic run to run) perturbs the last ulps; deriving the same
    * quantities from exact sums is how a 1000-executor job gets the same
    * answer every run. QueriesSpec asserts the built-ins agree to 1e-6 at
    * this scale, covering the native family without putting its float
    * merges on the oracle contract. Both engines then run an identical
    * correctly-rounded IEEE chain (the casts to double round the same
    * way from the same exact integers), so the 6-dp values hash-match.
    * The SUMS stay int64 at any realistic scale (Σy² ≈ 4·10¹⁵ at 10M
    * rows), but the derived factors n·syy − sy² crossed 10²¹ at the sf10
    * measurement — ARITHMETIC_OVERFLOW under ANSI (caught by the round-7
    * 100× run; DuckDB silently promotes to hugeint). The factors
    * therefore ride decimal(19,0) inputs (product type decimal(38,0)),
    * exactly as the 100 TB posture always claimed: exact integer
    * arithmetic to ~10³⁸, one correctly-rounded cast to double at the
    * same point as the oracle.
    */
  val regressionStats: Q = Q(
    "f12_regression_stats",
    """WITH pts AS (
      |  SELECT event_type,
      |         CAST(hour(ts) AS BIGINT) AS x,
      |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
      |  FROM events WHERE value IS NOT NULL),
      |sums AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |         CAST(sum(x * y) AS BIGINT) AS sxy,
      |         CAST(sum(x * x) AS BIGINT) AS sxx,
      |         CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM pts GROUP BY event_type)
      |SELECT event_type, n,
      |       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
      |            ELSE round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS slope,
      |       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
      |            ELSE round((CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE)) / n, 6) END AS intercept,
      |       CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
      |            ELSE round(CAST(n * sxy - sx * sy AS DOUBLE) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6) END AS corr_xy,
      |       CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
      |            ELSE round(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE) / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6) END AS r2
      |FROM sums ORDER BY event_type NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    val pts = events(s, dir).where(col("value").isNotNull).select(
      col("event_type"),
      hour(col("ts")).cast("long").as("x"),
      floor(col("value") * 100 + 0.5).cast("long").as("y"))
    val sums = pts.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    // exact decimal(38,0) factors (int64 overflows past ~10^19 — see
    // scaladoc), cast to double at the same points as the oracle
    def dec(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      c.cast("decimal(19,0)")
    val numD = dec(col("n")) * dec(col("sxy")) - dec(col("sx")) * dec(col("sy"))
    val dxD  = dec(col("n")) * dec(col("sxx")) - dec(col("sx")) * dec(col("sx"))
    val dyD  = dec(col("n")) * dec(col("syy")) - dec(col("sy")) * dec(col("sy"))
    val num = numD.cast("double")
    val dx  = dxD.cast("double")
    val dy  = dyD.cast("double")
    // degenerate-variance guard (exact decimal compare): a group whose x or
    // y never varies has no defined slope/corr — NULL on both engines
    // instead of ANSI DIVIDE_BY_ZERO (Spark) vs silent inf/NaN (DuckDB)
    sums.select(
        col("event_type"), col("n"),
        when(dxD === 0, lit(null)).otherwise(round(num / dx, 6)).as("slope"),
        when(dxD === 0, lit(null)).otherwise(
          round((col("sy").cast("double") - num / dx * col("sx").cast("double")) / col("n"), 6))
          .as("intercept"),
        when(dxD === 0 || dyD === 0, lit(null)).otherwise(round(num / sqrt(dx * dy), 6))
          .as("corr_xy"),
        when(dxD === 0 || dyD === 0, lit(null)).otherwise(round(num * num / (dx * dy), 6))
          .as("r2"))
      .orderBy("event_type")
  }

  /** Higher-order array function surface (`transform` / `filter` / `exists`
    * / `aggregate` / `sort_array` / `slice` — DuckDB `list_*` twins) over
    * the 64-dim embedding column. Every output rides the determinism
    * contract: counts and the sign-sum are exact integers (order-free
    * folds), extrema and sorted heads are float VALUES (picked, not
    * computed — no accumulation) cast to double and rounded to 6 dp.
    * Row-local projection — HOFs run inside whole-stage codegen, one pass
    * per row over the array, no shuffle beyond the output sort.
    */
  val arrayFuncs: Q = Q(
    "f13_array_funcs",
    """SELECT vec_id,
      |       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
      |       CAST(list_sum(list_transform(embedding, x ->
      |         CASE WHEN x > 0 THEN 1 WHEN x < 0 THEN -1 ELSE 0 END)) AS BIGINT) AS sign_sum,
      |       round(CAST(list_max(embedding) AS DOUBLE), 6) AS mx,
      |       round(CAST(list_min(embedding) AS DOUBLE), 6) AS mn,
      |       round(CAST(list_sort(embedding, 'DESC')[2] AS DOUBLE), 6) AS top2,
      |       round(CAST(list_sort(embedding, 'DESC')[3] AS DOUBLE), 6) AS top3,
      |       (len(list_filter(embedding, x -> abs(x) > 0.5)) > 0) AS has_extreme
      |FROM embeddings ORDER BY vec_id""".stripMargin
  ) { (s, dir) =>
    val v    = col("embedding")
    val desc = reverse(sort_array(v))
    Tables(s, dir, "embeddings").select(
        col("vec_id"),
        size(filter(v, x => x > 0)).cast("long").as("n_pos"),
        aggregate(
          transform(v, x => when(x > 0, 1L).when(x < 0, -1L).otherwise(0L)),
          lit(0L), (acc, x) => acc + x).as("sign_sum"),
        round(array_max(v).cast("double"), 6).as("mx"),
        round(array_min(v).cast("double"), 6).as("mn"),
        round(element_at(desc, 2).cast("double"), 6).as("top2"),
        round(element_at(desc, 3).cast("double"), 6).as("top3"),
        exists(v, x => abs(x) > 0.5).as("has_extreme"))
      .orderBy("vec_id")
  }

  /** Null-handling / conditional scalar surface (`nullif` / `coalesce` /
    * `least` / `greatest` / CASE — the NVL2 shape): the functions every
    * dirty-data pipeline leans on first. All row-local, integer/string
    * exact; `least`/`greatest` here are the ROW-WISE variants (vs f03's
    * aggregates). One projection, no shuffle beyond the output sort.
    */
  val nullFuncs: Q = Q(
    "f14_null_funcs",
    """SELECT event_id,
      |       nullif(event_type, 'error') AS et_nn,
      |       coalesce(nullif(event_type, 'error'), 'scrubbed') AS et_fill,
      |       CAST(least(user_id % 7, user_id % 5, user_id % 3) AS BIGINT) AS lo,
      |       CAST(greatest(user_id % 7, user_id % 5, user_id % 3) AS BIGINT) AS hi,
      |       CASE WHEN nullif(event_type, 'error') IS NOT NULL
      |            THEN 'present' ELSE 'absent' END AS nvl2_shape
      |FROM events WHERE event_id <= 200 ORDER BY event_id""".stripMargin
  ) { (s, dir) =>
    val etNn = nullif(col("event_type"), lit("error"))
    events(s, dir).where(col("event_id") <= 200)
      .select(
        col("event_id"),
        etNn.as("et_nn"),
        coalesce(etNn, lit("scrubbed")).as("et_fill"),
        least(col("user_id") % 7, col("user_id") % 5, col("user_id") % 3)
          .cast("long").as("lo"),
        greatest(col("user_id") % 7, col("user_id") % 5, col("user_id") % 3)
          .cast("long").as("hi"),
        when(etNn.isNotNull, "present").otherwise("absent").as("nvl2_shape"))
      .orderBy("event_id")
  }

  /** Ordered string aggregation (LISTAGG / string_agg parity): per region,
    * the sorted nation roster and the sorted DISTINCT order-status set
    * reached through orders→customer→nation→region. Spark has no ordered
    * collect, so determinism comes from `array_sort(collect_list)` /
    * `array_sort(collect_set)` — sort AFTER collecting, which is the only
    * portable contract (collect order is partition-arrival order on any
    * distributed engine).
    *
    * Scale note: listagg over an UNBOUNDED group is an anti-pattern (one
    * row holds the group); both groups here are dimension-bounded (nations
    * per region, distinct statuses) — the shape where listagg is legitimate
    * at any corpus size.
    */
  val listAgg: Q = Q(
    "f15_listagg",
    """WITH rn AS (SELECT n_nationkey, n_name, r_name
      |            FROM nation JOIN region ON n_regionkey = r_regionkey),
      |na AS (SELECT r_name, array_to_string(list_sort(list(n_name)), ',') AS nations,
      |              CAST(count(DISTINCT n_nationkey) AS BIGINT) AS n_nations
      |       FROM rn GROUP BY r_name),
      |st AS (SELECT r_name, array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses
      |       FROM orders JOIN customer ON o_custkey = c_custkey
      |                   JOIN rn ON c_nationkey = rn.n_nationkey
      |       GROUP BY r_name)
      |SELECT na.r_name AS r_name, nations, n_nations, statuses
      |FROM na JOIN st USING (r_name) ORDER BY r_name""".stripMargin
  ) { (s, dir) =>
    val r  = Tables(s, dir, "region").select("r_regionkey", "r_name")
    val n  = Tables(s, dir, "nation")
    val rn = n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
    val nations = rn.groupBy("r_name").agg(
      concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"),
      countDistinct(col("n_nationkey")).as("n_nations"))
    val statuses = Tables(s, dir, "orders").select("o_custkey", "o_orderstatus")
      .join(Tables(s, dir, "customer").select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(rn.select("n_nationkey", "r_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("r_name")
      .agg(concat_ws(",", array_sort(collect_set(col("o_orderstatus")))).as("statuses"))
    nations.join(statuses, "r_name")
      .select("r_name", "nations", "n_nations", "statuses")
      .orderBy("r_name")
  }

  /** COUNT-MIN SKETCH (Cormode & Muthukrishnan, J.Alg'05) — the mergeable
    * fixed-size frequency summary: d=4 hash rows × w=512 counters; a key's
    * estimate is the MIN of its d counters, an upper bound on the true
    * count (collisions only inflate). Hashes are md5-derived (salt r per
    * row), so the sketch is fully deterministic and the DuckDB twin
    * rebuilds the IDENTICAL counter matrix — a hash-match oracle for a
    * sketch, like f05/f11's deterministic splits. Output: the top-20 true
    * heavy tokens with true count and CM estimate side by side (est ≥
    * true always; spec-asserted, plus the 2e/w error bound on average).
    *
    * Scale shape: the counter matrix is ONE hash aggregate of the token
    * stream over (r, bucket) — 2048 cells regardless of corpus size (this
    * is the point of a sketch: the shuffle reduces to fixed width);
    * per-partition partial aggregation does the heavy lifting map-side.
    * Estimates then ride a broadcast of the 2048-cell matrix against the
    * (bounded) query keys. Sketches from corpus shards merge by cell-wise
    * ADD — the partial-aggregate path IS that merge.
    */
  /** CM bucket for (row r, token w): md5 of the salted token, 16 bits,
    * mod 512 — shared by the batch sketch (f16) and the streaming sketch
    * (x116) so the two builds are the same hash family by construction.
    */
  private[graft] def cmBucket(r: org.apache.spark.sql.Column, w: org.apache.spark.sql.Column) =
    (conv(substring(md5(concat(r.cast("string"), lit(":"), w)), 1, 4), 16, 10)
      .cast("long") % 512).cast("int")

  /** Token stream → (r, b, c) counter cells, the map-side-combined sketch
    * build — works identically on a batch frame and a streaming frame
    * (streaming: complete-mode state IS the cell-wise shard merge).
    */
  private[graft] def cmCells(tw: DataFrame): DataFrame =
    tw.select(col("w"), explode(expr("sequence(0, 3)")).as("r"))
      .groupBy(col("r"), cmBucket(col("r"), col("w")).as("b"))
      .agg(count(lit(1)).as("c"))

  /** Estimates for the top-20 true heavy tokens against a counter matrix —
    * the f16 output contract, parameterized by where the cells came from.
    */
  private[graft] def cmEstimates(s: SparkSession, dir: String, cells: DataFrame): DataFrame = {
    val tw = Tables(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) >= 1)
    val truth = tw.groupBy("w").agg(count(lit(1)).as("true_cnt"))
      .orderBy(col("true_cnt").desc, col("w")).limit(20)
    truth
      .select(col("w"), col("true_cnt"), explode(expr("sequence(0, 3)")).as("qr"))
      .withColumn("qb", cmBucket(col("qr"), col("w")))
      .join(broadcast(cells), col("qr") === col("r") && col("qb") === col("b"))
      .groupBy("w", "true_cnt").agg(min(col("c")).as("cm_est"))
      .select("w", "true_cnt", "cm_est")
      .orderBy(col("true_cnt").desc, col("w"))
  }

  val countMin: Q = Q(
    "f16_countmin",
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |tw AS (SELECT w FROM tok WHERE len(w) >= 1),
      |cells AS (
      |  SELECT r, CAST('0x' || substr(md5(r || ':' || w), 1, 4) AS INTEGER) % 512 AS b,
      |         count(*) AS c
      |  FROM tw CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) rs
      |  GROUP BY 1, 2),
      |truth AS (SELECT w, count(*) AS true_cnt FROM tw GROUP BY w
      |          ORDER BY true_cnt DESC, w LIMIT 20),
      |est AS (
      |  SELECT t.w, t.true_cnt, min(c.c) AS cm_est
      |  FROM truth t CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) rs
      |  JOIN cells c ON c.r = rs.r
      |    AND c.b = CAST('0x' || substr(md5(rs.r || ':' || t.w), 1, 4) AS INTEGER) % 512
      |  GROUP BY t.w, t.true_cnt)
      |SELECT w, CAST(true_cnt AS BIGINT) AS true_cnt, CAST(cm_est AS BIGINT) AS cm_est
      |FROM est ORDER BY true_cnt DESC, w""".stripMargin
  ) { (s, dir) =>
    val tw = Tables(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) >= 1)
    cmEstimates(s, dir, cmCells(tw))
  }

  /** PRIORITY SAMPLING (Duffield, Lund & Thorup, JACM'07) — weighted
    * sampling with an UNBIASED subset-sum estimator: each item gets
    * priority w/u for a uniform coin u; the top-k by priority form the
    * sample, τ = the (k+1)-th priority, and Σ max(w_i, τ) over the sample
    * estimates the TRUE total weight of any subset, unbiased. The
    * weighted generalization of the x28/x101 hash-coin family: heavy docs
    * enter almost surely, light docs proportionally, and the estimator
    * corrects for both.
    *
    * Integer-pure: the coin is md5(doc_id) in (0, 65536]; priority
    * ordering w/u is evaluated as exact cross-multiplied integers where
    * needed, and materialized as prio = w·65536 div u (collision-free
    * enough at this scale; ties broken by doc_id both engines). Scale
    * shape: the top-(k+1) rides TakeOrderedAndProject — no global sort;
    * the estimator column is row-local against the broadcast τ.
    */
  val prioritySample: Q = {
    val K = 50
    Q(
      "f17_priority_sample",
      s"""WITH d AS (
         |  SELECT doc_id, n_chars AS w,
         |         (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS INTEGER) + 1) AS u
         |  FROM documents WHERE text IS NOT NULL),
         |p AS (SELECT doc_id, w, w * 65536 // u AS prio FROM d),
         |top AS (SELECT doc_id, w, prio FROM p ORDER BY prio DESC, doc_id LIMIT ${K + 1}),
         |tau AS (SELECT min(prio) AS tau FROM top),
         |smp AS (SELECT doc_id, w, prio FROM top ORDER BY prio DESC, doc_id LIMIT $K)
         |SELECT s.doc_id AS doc_id, CAST(s.w AS BIGINT) AS w,
         |       CAST(s.prio AS BIGINT) AS prio,
         |       CAST(greatest(s.w, t.tau) AS BIGINT) AS est_w
         |FROM smp s CROSS JOIN tau t
         |ORDER BY doc_id""".stripMargin
    ) { (s, dir) =>
      val d = Tables(s, dir, "documents").where(col("text").isNotNull)
        .select(col("doc_id"), col("n_chars").cast("long").as("w"),
          (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("long") + 1).as("u"))
      val p = d.select(col("doc_id"), col("w"), expr("w * 65536 div u").as("prio"))
      val top = p.orderBy(col("prio").desc, col("doc_id")).limit(K + 1)
      val tau = top.agg(min(col("prio")).as("tau"))
      val smp = top.orderBy(col("prio").desc, col("doc_id")).limit(K)
      smp.crossJoin(broadcast(tau))
        .select(col("doc_id"), col("w"), col("prio"),
          greatest(col("w"), col("tau")).as("est_w"))
        .orderBy("doc_id")
    }
  }

  val all: Seq[Q] =
    Seq(hashFuncs, datetimeFuncs, mathFuncs, aesRoundtrip, approxDistinct, editDistance,
      valueHistogram, topkAgg, stringFuncs, bitwiseFuncs, approxPercentile,
      regressionStats, arrayFuncs, nullFuncs, listAgg, countMin, prioritySample)
}
