package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational query surface (SURVEY.md §2.B: joins, aggregations, windows,
  * sorts/top-k, set ops) over the TPC-H-ish driver testdata.
  *
  * The reference has no relational engine (SURVEY §2.A end note); this pack is
  * the *(ext)* surface that makes the config⨝stream routing of O-10/O-14 and
  * the batch analytics mandated by the north star declarative.
  *
  * Determinism contract (SURVEY §7.5): money arithmetic goes through
  * decimal(18,2) (inputs are exact 2-dp values) so partial/final aggregation
  * order cannot perturb low bits; arbitrary doubles are compared via
  * `floor(x*1e6)` integer semantics; every query ends in a total ORDER BY.
  */
object RelOps {

  /** Exact money sum: decimal in, double out — identical across engines
    * regardless of aggregation order.
    */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")
  private val d2 = "decimal(18,2)"

  /** Exact interpolated quantiles (percentile_cont semantics) per group,
    * WITHOUT the built-in `percentile` aggregate. Spark's exact
    * `percentile`/`median` buffer is an OpenHashMap[value, count] per
    * (group × aggregate) held boxed in every partial-aggregation task —
    * O(distinct values) driver-style state inside the executor that
    * neither spills nor shrinks. At sf1 that is ~190k boxed doubles ×
    * groups × aggregates × 32 concurrent tasks ≈ 3 GB of buffers: the
    * round-8 2 GB-heap proof run OOMed inside
    * `TypedAggregateWithHashMapAsBuffer.serialize` on exactly this
    * (t29, two quantiles × 5 groups over lineitem prices).
    *
    * This formulation keeps every stage spillable and codegen'd:
    *  1. value histogram — ONE Tungsten hash aggregate on (group, value)
    *     (map-side partials, spills like any groupBy);
    *  2. per-group cumulative counts — a window over the HISTOGRAM,
    *     whose row count is the value DOMAIN per group (prices, lengths),
    *     not the corpus;
    *  3. order-statistic lookup — the target indices floor/ceil of
    *     q·(n−1) land in the one histogram row whose cumulative range
    *     covers them; a conditional aggregate picks both neighbors and
    *     interpolates with Spark's own formula
    *     v_lo·(hi−pos) + v_hi·(pos−lo), so results are bit-identical to
    *     the built-in (QueriesSpec asserts exact equality).
    *
    * At 100 TB the histogram aggregate is the only corpus-sized exchange;
    * the window + lookup ride domain-sized rows. `qs` maps output column
    * name → quantile in (0,1).
    */
  private[graft] def exactQuantiles(df: DataFrame, groupCol: String, valCol: String,
                                    qs: Seq[(String, Double)]): DataFrame = {
    // nulls are ignored, matching the built-in aggregate's contract
    val hist = df.where(col(valCol).isNotNull)
      .groupBy(groupCol, valCol).agg(count(lit(1)).as("c"))
    // both windows ride ONE group-partitioned exchange, and the final
    // per-group aggregate reuses that partitioning — 2 exchanges total
    // (the quantiles are literals, so the target indices floor/ceil of
    // q·(n−1) are row-local conditions, not a joined-in dimension)
    // same partitioning AND ordering for both frames — they fuse into ONE
    // WindowExec (one sort, one group buffer); a partition-only spec for n
    // would be a second WindowExec that re-buffers every group (measured
    // +30% on t29 at sf10)
    val w = Window.partitionBy(groupCol).orderBy(valCol)
    val cum = hist
      .withColumn("cum", sum("c").over(w))
      .withColumn("n", sum("c").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    def covers(i: Column) = i.between(col("cum") - col("c"), col("cum") - 1)
    val aggs = qs.flatMap { case (nm, q) =>
      val pos = lit(q) * (col("n") - 1)
      Seq(
        max(when(covers(floor(pos).cast("long")), col(valCol))).as(s"${nm}_lo"),
        max(when(covers(ceil(pos).cast("long")), col(valCol))).as(s"${nm}_hi"))
    } :+ max(col("n")).as("_n")
    val picked = cum.groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
    val out = qs.foldLeft(picked) { case (acc, (nm, q)) =>
      val pos = lit(q) * (col("_n") - 1)
      val loI = floor(pos).cast("long")
      val hiI = ceil(pos).cast("long")
      acc.withColumn(nm,
        when(loI === hiI, col(s"${nm}_lo"))
          .otherwise(col(s"${nm}_lo") * (hiI - pos) + col(s"${nm}_hi") * (pos - loI)))
    }
    out.select(col(groupCol) +: qs.map { case (nm, _) => col(nm) }: _*)
  }

  /** TPC-H Q1-style pricing summary: the canonical partial+final hash
    * aggregate; Catalyst plans HashAggregate(partial)→Exchange(2 keys)→
    * HashAggregate(final) — the shape that scales to 100 TB.
    */
  val pricingSummary: Q = Q(
    "t01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) { (s, dir) =>
    val li = Tables(s, dir, "lineitem").where(col("l_shipdate") <= lit("1998-09-01 00:00:00").cast("timestamp"))
    val ext  = col("l_extendedprice").cast(d2)
    val disc = col("l_discount").cast(d2)
    val tax  = col("l_tax").cast(d2)
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(ext * (lit(1) - disc)).cast("double").as("sum_disc_price"),
        sum(ext * (lit(1) - disc) * (lit(1) + tax)).cast("double").as("sum_charge"),
        round(dsum(col("l_quantity")) / count(lit(1)), 6).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q5-style revenue per region: 5-way join; `nation`/`region` are
    * broadcast (no shuffle of the fact table for dim joins at 100 TB).
    */
  val revenuePerRegion: Q = Q(
    "t02_revenue_region",
    """SELECT r_name, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue, count(*) AS n_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin
  ) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        sum(col("l_extendedprice").cast(d2) * (lit(1) - col("l_discount").cast(d2))).cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("r_name")
  }

  /** TPC-H Q3-style shipping priority: filter-pushdown join + top-k —
    * Catalyst plans TakeOrderedAndProject, no global sort at scale.
    */
  val shippingPriority: Q = Q(
    "t03_shipping_priority",
    """SELECT o_orderkey, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue, o_orderdate
      |FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15' AND l_shipdate > TIMESTAMP '1995-03-15'
      |GROUP BY o_orderkey, o_orderdate ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin
  ) { (s, dir) =>
    Tables(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
      .join(Tables(s, dir, "orders").where(col("o_orderdate") < lit("1998-03-15").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables(s, dir, "lineitem").where(col("l_shipdate") > lit("1995-03-15").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(sum(col("l_extendedprice").cast(d2) * (lit(1) - col("l_discount").cast(d2))).cast("double").as("revenue"))
      .select("o_orderkey", "revenue", "o_orderdate")
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q4-style order-priority count via EXISTS → left-semi join. */
  val orderPriority: Q = Q(
    "t04_order_priority",
    """SELECT o_orderpriority, count(*) AS order_count FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
      |AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1997-01-01')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  ) { (s, dir) =>
    Tables(s, dir, "orders")
      .where(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      .join(
        Tables(s, dir, "lineitem").where(col("l_shipdate") > lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q6-style forecast revenue: pure scan+filter+agg — the pushdown
    * showcase (predicates reach the parquet reader).
    */
  val forecastRevenue: Q = Q(
    "t05_forecast_revenue",
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue, count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24 ORDER BY n""".stripMargin
  ) { (s, dir) =>
    Tables(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg(
        sum(col("l_extendedprice").cast(d2) * col("l_discount").cast(d2)).cast("double").as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("n")
  }

  /** Per-group top-k via ranking window: top-3 spenders per nation. */
  val topSpendersPerNation: Q = Q(
    "t06_top_spenders",
    """SELECT n_name, c_custkey, spend, rk FROM (
      |  SELECT n_name, c_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend,
      |         row_number() OVER (PARTITION BY n_name ORDER BY CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) DESC, c_custkey) AS rk
      |  FROM customer JOIN orders ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name, c_custkey)
      |WHERE rk <= 3 ORDER BY n_name, rk""".stripMargin
  ) { (s, dir) =>
    val spend = Tables(s, dir, "customer")
      .join(Tables(s, dir, "orders"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name", "c_custkey")
      .agg(dsum(col("o_totalprice")).as("spend"))
    val w = Window.partitionBy("n_name").orderBy(col("spend").desc, col("c_custkey"))
    spend.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select("n_name", "c_custkey", "spend", "rk")
      .orderBy("n_name", "rk")
  }

  /** Analytic window frames: monthly revenue with running cumulative sum,
    * lag delta, and a 3-month moving average.
    */
  val monthlyRevenueWindow: Q = Q(
    "t07_monthly_window",
    """SELECT y, m, rev,
      |  round(sum(rev) OVER (PARTITION BY y ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_rev,
      |  round(coalesce(lag(rev) OVER (PARTITION BY y ORDER BY m), 0), 2) AS prev_rev,
      |  round(avg(rev) OVER (PARTITION BY y ORDER BY m ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov_avg3
      |FROM (SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
      |             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |      FROM orders GROUP BY 1, 2)
      |ORDER BY y, m""".stripMargin
  ) { (s, dir) =>
    val monthly = Tables(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(dsum(col("o_totalprice")).as("rev"))
    val wOrd = Window.partitionBy("y").orderBy("m")
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wMov = wOrd.rowsBetween(-2, Window.currentRow)
    monthly
      .withColumn("running_rev", round(sum("rev").over(wRun), 2))
      .withColumn("prev_rev", round(coalesce(lag("rev", 1).over(wOrd), lit(0)), 2))
      .withColumn("mov_avg3", round(avg("rev").over(wMov), 6))
      .orderBy("y", "m")
  }

  /** ROLLUP hierarchy totals (grouping sets family); NULL group keys
    * canonicalized to -1 for a total order.
    */
  val revenueRollup: Q = Q(
    "t08_revenue_rollup",
    """SELECT coalesce(y, -1) AS yr, coalesce(m, -1) AS mo,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev, count(*) AS n
      |FROM (SELECT year(o_orderdate) AS y, month(o_orderdate) AS m, o_totalprice FROM orders)
      |GROUP BY ROLLUP(y, m) ORDER BY yr, mo""".stripMargin
  ) { (s, dir) =>
    Tables(s, dir, "orders")
      .select(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"), col("o_totalprice"))
      .rollup("y", "m")
      .agg(dsum(col("o_totalprice")).as("rev"), count(lit(1)).as("n"))
      .select(coalesce(col("y"), lit(-1)).as("yr"), coalesce(col("m"), lit(-1)).as("mo"), col("rev"), col("n"))
      .orderBy("yr", "mo")
  }

  /** CUBE over two dims (full grouping-sets lattice). */
  val statusCube: Q = Q(
    "t09_status_cube",
    """SELECT coalesce(o_orderstatus, '@ALL') AS status, coalesce(o_orderpriority, '@ALL') AS priority,
      |       count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority) ORDER BY status, priority""".stripMargin
  ) { (s, dir) =>
    Tables(s, dir, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("rev"))
      .select(
        coalesce(col("o_orderstatus"), lit("@ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("@ALL")).as("priority"),
        col("n"), col("rev"))
      .orderBy("status", "priority")
  }

  /** Set operations: repeat customers (INTERSECT) and churned customers
    * (EXCEPT) between 1995 and 1996 order years, labeled and unioned.
    */
  val setOpsCustomers: Q = Q(
    "t10_setops_customers",
    """SELECT 'repeat' AS kind, c FROM (
      |  SELECT o_custkey AS c FROM orders WHERE year(o_orderdate) = 1995
      |  INTERSECT SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
      |UNION ALL
      |SELECT 'churned' AS kind, c FROM (
      |  SELECT o_custkey AS c FROM orders WHERE year(o_orderdate) = 1995
      |  EXCEPT SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
      |ORDER BY kind, c""".stripMargin
  ) { (s, dir) =>
    val o  = Tables(s, dir, "orders")
    val y95 = o.where(year(col("o_orderdate")) === 1995).select(col("o_custkey").as("c"))
    val y96 = o.where(year(col("o_orderdate")) === 1996).select(col("o_custkey").as("c"))
    y95.intersect(y96).select(lit("repeat").as("kind"), col("c"))
      .unionByName(y95.except(y96).select(lit("churned").as("kind"), col("c")))
      .orderBy("kind", "c")
  }

  /** Exact distinct-count aggregation (Catalyst expand+two-phase plan). */
  val distinctCounts: Q = Q(
    "t11_distinct_counts",
    """SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations, count(DISTINCT o_orderpriority) AS n_prios, count(*) AS n_orders
      |FROM customer JOIN orders ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  ) { (s, dir) =>
    Tables(s, dir, "customer")
      .join(Tables(s, dir, "orders"), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        countDistinct("c_nationkey").as("n_nations"),
        countDistinct("o_orderpriority").as("n_prios"),
        count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")
  }

  /** TPC-H Q17-style correlated scalar subquery, decorrelated to a join.
    * The `5 * qty * cnt < sum_qty` comparison keeps the 0.2·avg predicate in
    * exact integer arithmetic (quantities are integer-valued).
    */
  val smallQuantityRevenue: Q = Q(
    "t12_small_qty_revenue",
    """SELECT p_brand, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS rev, count(*) AS n
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |JOIN (SELECT l_partkey AS pk, sum(CAST(l_quantity AS BIGINT)) AS sum_qty, count(*) AS cnt FROM lineitem GROUP BY 1) agg
      |  ON pk = l_partkey
      |WHERE 5 * CAST(l_quantity AS BIGINT) * cnt < sum_qty
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin
  ) { (s, dir) =>
    val li  = Tables(s, dir, "lineitem")
    val agg = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity").cast("bigint")).as("sum_qty"), count(lit(1)).as("cnt"))
    li.join(Tables(s, dir, "part"), col("p_partkey") === col("l_partkey"))
      .join(agg, col("pk") === col("l_partkey"))
      .where(lit(5) * col("l_quantity").cast("bigint") * col("cnt") < col("sum_qty"))
      .groupBy("p_brand")
      .agg(dsum(col("l_extendedprice")).as("rev"), count(lit(1)).as("n"))
      .orderBy("p_brand")
  }

  /** Theta join (equi prefix + inequality residual): supplier/customer
    * account-balance dominance pairs per nation. Supplier side broadcast.
    * Declared BOUNDED-SIDE theta oracle: this shape is correct only while
    * one side stays broadcast-small (supplier is, by TPC-H contract — 100×
    * data grows it 100×, still dimension-sized next to customer). For
    * big⨝big band predicates the scale path is t26's cell-collapsed
    * window count, which never enumerates qualifying pairs.
    */
  val thetaBalancePairs: Q = Q(
    "t13_theta_balance",
    """SELECT s_nationkey AS nation, count(*) AS n_pairs
      |FROM supplier JOIN customer ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
      |GROUP BY s_nationkey ORDER BY nation""".stripMargin
  ) { (s, dir) =>
    broadcast(Tables(s, dir, "supplier"))
      .join(Tables(s, dir, "customer"),
        col("s_nationkey") === col("c_nationkey") && col("s_acctbal") < col("c_acctbal"))
      .groupBy(col("s_nationkey").as("nation"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("nation")
  }

  /** As-of join (events→events): for each purchase, the latest click of the
    * same user strictly before it (tie-break on event_id). Implemented
    * shuffle-once: single window over the time-ordered per-user stream —
    * no self-join, no range explosion at 100 TB.
    */
  val asofLastClick: Q = Q(
    "t14_asof_last_click",
    """SELECT p.event_id, p.user_id, p.ts,
      |  (SELECT c.event_id FROM events c WHERE c.user_id = p.user_id AND c.event_type = 'click'
      |    AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
      |   ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS last_click_id
      |FROM events p WHERE p.event_type = 'purchase' ORDER BY p.event_id""".stripMargin
  ) { (s, dir) =>
    val ev = Tables(s, dir, "events").where(col("event_type").isin("click", "purchase"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("last_click_id",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
      .where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts", "last_click_id")
      .orderBy("event_id")
  }

  /** Cross join (tiny×tiny): nation × region product with a derived label. */
  val crossNationRegion: Q = Q(
    "t15_cross_join",
    """SELECT n_nationkey, r_regionkey, concat(n_name, '/', r_name) AS pair
      |FROM nation CROSS JOIN region ORDER BY n_nationkey, r_regionkey""".stripMargin
  ) { (s, dir) =>
    Tables(s, dir, "nation")
      .crossJoin(broadcast(Tables(s, dir, "region")))
      .select(col("n_nationkey"), col("r_regionkey"), concat(col("n_name"), lit("/"), col("r_name")).as("pair"))
      .orderBy("n_nationkey", "r_regionkey")
  }

  /** Outer-join family in one result: per-nation customer/supplier counts via
    * FULL OUTER between two aggregates (nulls canonicalized).
    */
  val outerJoinCounts: Q = Q(
    "t16_outer_join",
    """SELECT coalesce(cn.k, sn.k) AS nation, coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
      |FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer WHERE c_acctbal > 9000 GROUP BY 1) cn
      |FULL OUTER JOIN (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier WHERE s_acctbal > 9000 GROUP BY 1) sn
      |  ON cn.k = sn.k
      |ORDER BY nation""".stripMargin
  ) { (s, dir) =>
    val cn = Tables(s, dir, "customer").where(col("c_acctbal") > 9000)
      .groupBy(col("c_nationkey").as("ck")).agg(count(lit(1)).as("n_cust"))
    val sn = Tables(s, dir, "supplier").where(col("s_acctbal") > 9000)
      .groupBy(col("s_nationkey").as("sk")).agg(count(lit(1)).as("n_supp"))
    cn.join(sn, col("ck") === col("sk"), "full_outer")
      .select(
        coalesce(col("ck"), col("sk")).as("nation"),
        coalesce(col("n_cust"), lit(0)).as("n_cust"),
        coalesce(col("n_supp"), lit(0)).as("n_supp"))
      .orderBy("nation")
  }

  /** collect_list over groups (the Webhooks-array-per-topic shape, §1.1):
    * per-nation sorted list of high-balance supplier names, serialized
    * deterministically (array_sort before join — SURVEY §2.B).
    */
  val collectSuppliers: Q = Q(
    "t17_collect_list",
    """SELECT n_name, array_to_string(list_sort(list(s_name)), ',') AS suppliers, count(*) AS n
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_acctbal > 5000
      |GROUP BY n_name ORDER BY n_name""".stripMargin
  ) { (s, dir) =>
    Tables(s, dir, "supplier").where(col("s_acctbal") > 5000)
      .join(broadcast(Tables(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        concat_ws(",", array_sort(collect_list(col("s_name")))).as("suppliers"),
        count(lit(1)).as("n"))
      .orderBy("n_name")
  }

  /** Ranking-function family in one result: rank, dense_rank, ntile(4),
    * lead — over per-clerk order totals.
    */
  val rankFamily: Q = Q(
    "t18_rank_family",
    """SELECT o_orderpriority AS prio, o_orderkey,
      |  rank() OVER w AS rk, dense_rank() OVER w AS drk, ntile(4) OVER w AS quartile,
      |  lead(o_orderkey) OVER w AS next_key
      |FROM orders WHERE o_orderkey % 50 = 0
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey)
      |ORDER BY prio, rk, o_orderkey""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").cast(d2).desc, col("o_orderkey"))
    Tables(s, dir, "orders").where(col("o_orderkey") % 50 === 0)
      .select(
        col("o_orderpriority").as("prio"), col("o_orderkey"),
        rank().over(w).as("rk"), dense_rank().over(w).as("drk"),
        ntile(4).over(w).as("quartile"), lead("o_orderkey", 1).over(w).as("next_key"))
      .orderBy("prio", "rk", "o_orderkey")
  }

  /** GROUPING SETS — the general form behind t08's ROLLUP / t09's CUBE
    * (Spark 4 `Dataset.groupingSets`). Null ordering pinned explicitly:
    * Spark ascending defaults to NULLS FIRST, DuckDB to NULLS LAST.
    */
  val groupingSetsRevenue: Q = Q(
    "t19_grouping_sets",
    """SELECT o_orderstatus, CAST(y AS BIGINT) AS y,
      |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM (SELECT o_orderstatus, year(o_orderdate) AS y, o_totalprice FROM orders)
      |GROUP BY GROUPING SETS ((o_orderstatus), (y), ())
      |ORDER BY o_orderstatus NULLS FIRST, y NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    Tables(s, dir, "orders")
      .select(col("o_orderstatus"), year(col("o_orderdate")).cast("long").as("y"),
        col("o_totalprice"))
      .groupingSets(Seq(Seq(col("o_orderstatus")), Seq(col("y")), Seq.empty),
        col("o_orderstatus"), col("y"))
      .agg(dsum(col("o_totalprice")).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("y").asc_nulls_first)
  }

  /** PIVOT: status columns from an explicit value list (both engines name
    * result columns by the pivot value, so the lists must match).
    */
  val pivotStatus: Q = Q(
    "t20_pivot_status",
    """SELECT y, CAST("F" AS DOUBLE) AS F, CAST("O" AS DOUBLE) AS O, CAST("P" AS DOUBLE) AS P FROM (
      |  PIVOT (SELECT CAST(year(o_orderdate) AS BIGINT) AS y, o_orderstatus,
      |                CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders)
      |  ON o_orderstatus IN ('F', 'O', 'P')
      |  USING sum(p)
      |  GROUP BY y)
      |ORDER BY y""".stripMargin
  ) { (s, dir) =>
    Tables(s, dir, "orders")
      .select(year(col("o_orderdate")).cast("long").as("y"), col("o_orderstatus"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("y")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(col("p")))
      .select(col("y"), col("F").cast("double").as("F"),
        col("O").cast("double").as("O"), col("P").cast("double").as("P"))
      .orderBy("y")
  }

  /** Exact percentiles: percentile_cont semantics matching DuckDB's
    * median/quantile_cont — both engines interpolate linearly between the
    * same two order statistics, so 6-dp rounding agrees. Engine side rides
    * [[exactQuantiles]] (the spillable histogram plan) for BOTH columns;
    * the built-in `median`/`percentile` aggregate is banned suite-wide
    * (PlanSweep) because its per-group boxed map buffer neither spills
    * nor shrinks (it OOMed the round-8 2 GB sf1 proof).
    */
  val percentiles: Q = Q(
    "t21_percentiles",
    """SELECT l_returnflag,
      |       round(median(l_quantity), 6) AS med_qty,
      |       round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  ) { (s, dir) =>
    val li = Tables(s, dir, "lineitem")
    // BOTH quantiles ride the histogram formulation (r10): med_qty's ~50
    // value domain made the built-in `median` buffer bounded, but keeping
    // ANY use of the non-spillable aggregate class alive meant the
    // suite-wide PlanSweep guard could not exist — and exactQuantiles is
    // spec-proved bit-identical, so the migration is free. For a ~50-value
    // domain the histogram is 50 rows per group: strictly cheaper than the
    // per-task boxed map it replaces.
    val med = exactQuantiles(li.select(col("l_returnflag"), col("l_quantity")),
      "l_returnflag", "l_quantity", Seq("med" -> 0.5))
      .select(col("l_returnflag"), round(col("med"), 6).as("med_qty"))
    val p90 = exactQuantiles(li.select(col("l_returnflag"), col("l_extendedprice")),
      "l_returnflag", "l_extendedprice", Seq("p90" -> 0.9))
      .select(col("l_returnflag"), round(col("p90"), 6).as("p90_price"))
    med.join(p90, "l_returnflag")
      .select("l_returnflag", "med_qty", "p90_price")
      .orderBy("l_returnflag")
  }

  /** Bag-semantics set ops: INTERSECT ALL / EXCEPT ALL keep multiplicity
    * (t10 covers the distinct variants).
    */
  val setOpsAll: Q = Q(
    "t22_setops_all",
    """SELECT 'ia' AS op, k, CAST(count(*) AS BIGINT) AS n FROM (
      |  SELECT c_custkey % 100 AS k FROM customer INTERSECT ALL SELECT s_suppkey % 100 AS k FROM supplier)
      |GROUP BY k
      |UNION ALL
      |SELECT 'ea' AS op, k, CAST(count(*) AS BIGINT) AS n FROM (
      |  SELECT c_custkey % 100 AS k FROM customer EXCEPT ALL SELECT s_suppkey % 100 AS k FROM supplier)
      |GROUP BY k
      |ORDER BY op, k""".stripMargin
  ) { (s, dir) =>
    val c  = Tables(s, dir, "customer").select((col("c_custkey") % 100).as("k"))
    val su = Tables(s, dir, "supplier").select((col("s_suppkey") % 100).as("k"))
    val ia = c.intersectAll(su).groupBy("k").agg(count(lit(1)).as("n"))
      .select(lit("ia").as("op"), col("k"), col("n"))
    val ea = c.exceptAll(su).groupBy("k").agg(count(lit(1)).as("n"))
      .select(lit("ea").as("op"), col("k"), col("n"))
    ia.unionAll(ea).orderBy("op", "k")
  }

  /** Correlated scalar subquery (TPC-H Q17 shape): small-quantity orders
    * against each part's own average — the decorrelation rewrite (Catalyst
    * turns the per-row subquery into one aggregate + equi-join; a naive
    * engine re-executes it per probe row, quadratic at 100 TB). ONE SQL
    * string serves both engines, through `spark.sql` — exercising the
    * parser/analyzer surface a SQL user actually hits. Determinism:
    * l_quantity is integer-valued, so sum/avg are exact in double
    * regardless of aggregation order, and revenue goes through the
    * floor(x*100+0.5) integer-cents contract.
    */
  private val q17Sql =
    """SELECT CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE p.p_size <= 5
      |  AND l.l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
      |                      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""".stripMargin

  /** Register views, analyze the SQL (spark.sql resolves eagerly), then
    * drop them — a lingering session-global view named after a base table
    * would silently shadow resolution for every later spark.sql caller.
    */
  private def sqlWithViews(s: SparkSession, dir: String, tables: Seq[String],
      sql: String): DataFrame = {
    tables.foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
    try s.sql(sql) finally tables.foreach(s.catalog.dropTempView(_))
  }

  val correlatedAvg: Q = Q("t23_correlated_avg", q17Sql) { (s, dir) =>
    sqlWithViews(s, dir, Seq("lineitem", "part"), q17Sql)
  }

  /** NOT EXISTS decorrelation (TPC-H Q21 family): per supplier, lineitems
    * whose order no other supplier touched. Catalyst plans the correlated
    * NOT EXISTS as a left-anti join on (orderkey, suppkey≠) — set
    * difference at join speed, never a per-row re-scan.
    */
  private val soloSql =
    """SELECT s.s_name, CAST(count(*) AS BIGINT) AS n_solo
      |FROM supplier s JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem l2
      |                  WHERE l2.l_orderkey = l1.l_orderkey
      |                    AND l2.l_suppkey <> l1.l_suppkey)
      |GROUP BY s.s_name ORDER BY s.s_name""".stripMargin

  val soloSupplier: Q = Q("t24_solo_supplier", soloSql) { (s, dir) =>
    sqlWithViews(s, dir, Seq("lineitem", "supplier"), soloSql)
  }

  /** Unpivot (melt) — the inverse of t20's PIVOT: wide per-brand metrics
    * to long (brand, metric, value) rows via `Dataset.unpivot`
    * (`UnpivotExec` — a row-local generator, zero shuffle added). The
    * oracle states the same reshape as a UNION ALL.
    */
  val unpivotMetrics: Q = Q(
    "t25_unpivot_metrics",
    """WITH m AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
      |                  CAST(count(DISTINCT p_type) AS BIGINT) AS n_types,
      |                  CAST(sum(p_size) AS BIGINT) AS sum_size
      |           FROM part GROUP BY p_brand)
      |SELECT p_brand, 'n_parts' AS metric, n_parts AS val FROM m
      |UNION ALL SELECT p_brand, 'n_types' AS metric, n_types AS val FROM m
      |UNION ALL SELECT p_brand, 'sum_size' AS metric, sum_size AS val FROM m
      |ORDER BY p_brand, metric""".stripMargin
  ) { (s, dir) =>
    Tables(s, dir, "part")
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n_parts"),
        countDistinct(col("p_type")).as("n_types"),
        sum(col("p_size")).as("sum_size"))
      .unpivot(Array(col("p_brand")),
        Array(col("n_parts"), col("n_types"), col("sum_size")), "metric", "val")
      .orderBy("p_brand", "metric")
  }

  /** Band-count range self-join: count pairs with |Δvalue| ≤ 0.5 per event
    * type — WITHOUT enumerating the pairs. The result is a tiny grouped
    * count, but in-band pair density is ∝ n² over a fixed value domain, so
    * any plan that materializes the qualifying pairs (nested loop, or the
    * earlier bucket-probe equi-join) is quadratic regardless of join
    * strategy (this one measured 401 s / exponent 1.84 over the sf1→sf10
    * decade). Counting needs only O(n log n):
    *
    *  1. Collapse rows to (type, value) CELLS with multiplicity m — one
    *     hash aggregate; everything after runs on |distinct values|, which
    *     is orders of magnitude below n for any bounded-granularity domain.
    *  2. Per cell: ties contribute C(m,2); cross-cell in-band pairs are
    *     counted once at the LATER cell via a value-RANGE window
    *     [v−0.5, v] over the cell stream: m·(sum(m) over frame − m).
    *  3. IEEE boundary repair: the oracle predicate fl(va−vb) ≤ 0.5 and the
    *     window bound vb ≥ fl(va−0.5) agree everywhere except within an
    *     ε-annulus of the band edge (|va−vb−0.5| ≤ ε, ε=1e-6 ≫ ulp). A
    *     bucketed equi-join enumerates only annulus CELL pairs (a handful
    *     per cell) and adds m_a·m_b·(oracle − window) per pair, making the
    *     count bit-exact against the double-arithmetic oracle — no
    *     grid/granularity assumption about `value`.
    *
    * Shuffles: one n-row aggregate + one cell-level window + one sparse
    * cell-level join. At 100 TB the aggregate is the only full-data
    * exchange and it carries 16-byte rows. (t13 keeps the enumerate-the-
    * pairs theta shape as the declared BOUNDED-SIDE oracle — its supplier
    * side is broadcast-small by contract; this query is the scale path.)
    */
  val rangeJoin: Q = Q(
    "t26_range_join",
    """SELECT a.event_type, CAST(count(*) AS BIGINT) AS n_pairs
      |FROM events a JOIN events b
      |  ON a.event_type = b.event_type AND a.event_id < b.event_id
      | AND abs(a.value - b.value) <= 0.5
      |GROUP BY a.event_type ORDER BY a.event_type""".stripMargin
  ) { (s, dir) =>
    val eps = 1e-6
    // join semantics of the oracle: a NULL event_type never equi-joins and a
    // NULL value never satisfies the band predicate — the windowed rewrite
    // must drop those rows explicitly or it invents a null-key partition
    val cells = Tables(s, dir, "events")
      .where(col("event_type").isNotNull && col("value").isNotNull)
      .groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).as("m"))
    // In-frame row count over [v-0.5, v]; Spark computes the lower bound as
    // fl(v - 0.5) (double subtract), the exact arithmetic the repair join
    // replicates below.
    val inFrame = expr(
      "sum(m) OVER (PARTITION BY event_type ORDER BY value " +
        "RANGE BETWEEN 0.5 PRECEDING AND CURRENT ROW)")
    val windowed = cells
      .select(col("event_type"),
        (col("m") * (inFrame - col("m")) + col("m") * (col("m") - 1) / 2)
          .as("pairs"))
    // ε-annulus repair: candidate cell pairs with vb ≈ va - 0.5, found by an
    // equi-join on ε-wide buckets of the shifted probe key (3-key probe
    // covers bucket-edge placement; each b-cell owns one bucket so no pair
    // is produced twice).
    val probeKey = floor((col("value") - 0.5) / (2 * eps)).cast("long")
    val aSide = cells.select(col("event_type"), col("value").as("va"),
      col("m").as("ma"),
      explode(array(probeKey - 1, probeKey, probeKey + 1)).as("bkt"))
    val bSide = cells.select(col("event_type"), col("value").as("vb"),
      col("m").as("mb"),
      floor(col("value") / (2 * eps)).cast("long").as("bkt"))
    val repair = aSide.join(bSide, Seq("event_type", "bkt"))
      .where(col("vb") < col("va") &&
        col("vb") >= col("va") - 0.5 - eps && col("vb") <= col("va") - 0.5 + eps)
      .select(col("event_type"),
        (col("ma") * col("mb") *
          (when(col("va") - col("vb") <= 0.5, 1L).otherwise(0L) -
           when(col("vb") >= col("va") - 0.5, 1L).otherwise(0L))).as("pairs"))
    windowed.unionByName(repair)
      .groupBy("event_type")
      .agg(sum(col("pairs")).cast("long").as("n_pairs"))
      .orderBy("event_type")
  }

  /** Value-based RANGE window frame (completing the frame family next to
    * t07's ROWS frames): per customer, order totals summed over a sliding
    * ±10-day window keyed by the ORDER DATE VALUE — ties in the ordering
    * column all join the frame, which a ROWS frame cannot express. Days
    * since a fixed epoch as an integer ordering key keeps the frame bound
    * arithmetic identical on both engines.
    */
  val rangeFrame: Q = Q(
    "t27_range_frame",
    """SELECT o_orderkey,
      |  CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY d
      |       RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS BIGINT) AS win_cents,
      |  CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY d
      |       RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) AS BIGINT) AS win_n
      |FROM (SELECT o_orderkey, o_custkey,
      |        CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
      |        datediff('day', DATE '1990-01-01', o_orderdate) AS d
      |      FROM orders)
      |ORDER BY o_orderkey""".stripMargin
  ) { (s, dir) =>
    val base = Tables(s, dir, "orders").select(
      col("o_orderkey"), col("o_custkey"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
      datediff(col("o_orderdate"), lit("1990-01-01").cast("date")).as("d"))
    val w = Window.partitionBy("o_custkey").orderBy("d").rangeBetween(-10, 0)
    base
      .select(col("o_orderkey"),
        sum(col("cents")).over(w).as("win_cents"),
        count(lit(1)).over(w).as("win_n"))
      .orderBy("o_orderkey")
  }

  /** Distribution window-function family (completing the ranking surface
    * next to t18): percent_rank, cume_dist, first_value and nth_value over
    * per-customer order totals. The ratios are single IEEE divisions of
    * small integers — bit-identical across engines — and the value
    * functions run over the default RANGE-to-CURRENT-ROW frame with a
    * unique (totalprice, orderkey) ordering, so frames are deterministic.
    */
  val windowDistribution: Q = Q(
    "t28_window_dist",
    """SELECT o_custkey, o_orderkey,
      |       round(percent_rank() OVER w, 6) AS pr,
      |       round(cume_dist() OVER w, 6) AS cd,
      |       first_value(o_orderkey) OVER w AS first_ok,
      |       nth_value(o_orderkey, 2) OVER w AS second_ok
      |FROM orders
      |WHERE o_custkey % 50 = 0
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    Tables(s, dir, "orders")
      .where(col("o_custkey") % 50 === 0)
      .select(col("o_custkey"), col("o_orderkey"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"),
        first_value(col("o_orderkey")).over(w).as("first_ok"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_ok"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Winsorized aggregation: revenue per order-priority with extended
    * prices clipped at the group's exact p05/p99 before summing — the
    * robust total a few mispriced lines cannot drag (the aggregate-level
    * complement of x54's MAD outlier GATE). Two passes by construction
    * (the bounds are an aggregate of the same group), but the bounds table
    * is group-cardinality-sized and BROADCASTS back — the fact side scans
    * twice and shuffles its clipped partials once. Money stays on the
    * decimal path; the clip compares decimals to the t21-proven exact
    * percentile values. Like t21, the EXACT percentile buffers each
    * group's values during the bounds pass — f11's approx_percentile
    * sketch is the declared fixed-memory path when a group outgrows an
    * executor.
    */
  val winsorizedRevenue: Q = Q(
    "t29_winsorized_revenue",
    """WITH b AS (SELECT o_orderpriority AS prio,
      |                  quantile_cont(l_extendedprice, 0.05) AS lo,
      |                  quantile_cont(l_extendedprice, 0.99) AS hi
      |           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |           GROUP BY 1)
      |SELECT o_orderpriority AS prio, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CASE WHEN l_extendedprice < lo OR l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
      |       round(sum(CAST(least(greatest(l_extendedprice, lo), hi) AS DECIMAL(18,2))), 2) AS wsum
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN b ON o_orderpriority = b.prio
      |GROUP BY 1 ORDER BY prio""".stripMargin
  ) { (s, dir) =>
    val li = Tables(s, dir, "lineitem").select("l_orderkey", "l_extendedprice")
    val o  = Tables(s, dir, "orders").select("o_orderkey", "o_orderpriority")
    val j  = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("prio"), col("l_extendedprice").as("p"))
    // both quantiles come out of ONE histogram pass (exactQuantiles) —
    // the built-in `percentile`'s per-(group × aggregate) boxed map
    // buffer is what OOMed the 2 GB-heap sf1 proof run here
    val bounds = exactQuantiles(j, "prio", "p", Seq("lo" -> 0.05, "hi" -> 0.99))
    j.join(broadcast(bounds), "prio")
      .groupBy("prio")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("p") < col("lo") || col("p") > col("hi"), 1L).otherwise(0L)).as("n_clipped"),
        round(sum(least(greatest(col("p"), col("lo")), col("hi")).cast(d2)), 2).as("wsum"))
      .orderBy("prio")
  }

  /** Deterministic mode (most frequent value) per group: the modal
    * hour-of-day per event type, ties broken by the SMALLEST hour — an
    * explicit count-window-rank formulation instead of the engines' native
    * `mode()` aggregates, whose tie-breaking is implementation-defined
    * (Spark picks an arbitrary survivor; portability requires the
    * tie-break to be IN the query). Two hash aggregates + a
    * group-cardinality-sized window — no corpus-sized window state.
    */
  val modalHour: Q = Q(
    "t30_modal_hour",
    """SELECT event_type, CAST(hr AS BIGINT) AS modal_hour, CAST(c AS BIGINT) AS n_events FROM (
      |  SELECT event_type, hr, c,
      |         row_number() OVER (PARTITION BY event_type ORDER BY c DESC, hr) AS rk
      |  FROM (SELECT event_type, hour(ts) AS hr, count(*) AS c
      |        FROM events GROUP BY 1, 2))
      |WHERE rk = 1 ORDER BY event_type NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    val counts = Tables(s, dir, "events")
      .groupBy(col("event_type"), hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("event_type").orderBy(col("c").desc, col("hr"))
    counts.withColumn("rk", row_number().over(w)).where(col("rk") === 1)
      .select(col("event_type"), col("hr").cast("long").as("modal_hour"),
        col("c").as("n_events"))
      .orderBy("event_type")
  }

  val all: Seq[Q] = Seq(
    pricingSummary, revenuePerRegion, shippingPriority, orderPriority,
    forecastRevenue, topSpendersPerNation, monthlyRevenueWindow, revenueRollup,
    statusCube, setOpsCustomers, distinctCounts, smallQuantityRevenue,
    thetaBalancePairs, asofLastClick, crossNationRegion, outerJoinCounts,
    collectSuppliers, rankFamily, groupingSetsRevenue, pivotStatus,
    percentiles, setOpsAll, correlatedAvg, soloSupplier, unpivotMetrics,
    rangeJoin, rangeFrame, windowDistribution, winsorizedRevenue, modalHour)
}
