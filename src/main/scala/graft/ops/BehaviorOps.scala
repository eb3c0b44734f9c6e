package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-behavior analytics over the `events` stream table: the two
  * canonical product-analytics queries every events engine must answer —
  * ordered conversion funnels and cohort retention. Both are user-keyed:
  * every join and aggregate shuffles on `user_id` only, so at 100 TB the
  * plan is a sequence of user-partitioned hash aggregates/joins with no
  * global operator anywhere (AQE handles per-user skew).
  */
object BehaviorOps {

  private def events(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "events")

  /** Ordered funnel view → click → purchase: a user advances a stage only
    * with a strictly LATER event (min-after-previous-stage semantics, not
    * mere event presence). Stage names sort in funnel order, giving the
    * total order for free.
    */
  val funnel: Q = Q(
    "x42_funnel",
    """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
      |           WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
      |SELECT 'view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
      |UNION ALL SELECT 'view>click' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM c
      |UNION ALL SELECT 'view>click>purchase' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM p
      |ORDER BY stage""".stripMargin
  ) { (s, dir) =>
    val e = events(s, dir)
    val v = e.where(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val c = e.where(col("event_type") === "click")
      .join(v, "user_id").where(col("ts") > col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val p = e.where(col("event_type") === "purchase")
      .join(c, "user_id").where(col("ts") > col("t2"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    v.agg(count(lit(1)).as("n_users")).select(lit("view").as("stage"), col("n_users"))
      .unionByName(c.agg(count(lit(1)).as("n_users"))
        .select(lit("view>click").as("stage"), col("n_users")))
      .unionByName(p.agg(count(lit(1)).as("n_users"))
        .select(lit("view>click>purchase").as("stage"), col("n_users")))
      .orderBy("stage")
  }

  /** Weekly cohort retention: users grouped by their first active ISO week,
    * counted in every week they return. The distinct (user, week) set is
    * the only exchange; the cohort join is user-keyed.
    */
  val retention: Q = Q(
    "x43_retention",
    """WITH wk AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events),
      |fw AS (SELECT user_id, min(w) AS cohort FROM wk GROUP BY user_id)
      |SELECT cohort, w AS active_week, CAST(count(*) AS BIGINT) AS n_users
      |FROM wk JOIN fw ON wk.user_id = fw.user_id
      |GROUP BY cohort, w ORDER BY cohort, active_week""".stripMargin
  ) { (s, dir) =>
    val wk = events(s, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
      .distinct()
    val fw = wk.groupBy("user_id").agg(min(col("w")).as("cohort"))
    wk.join(fw, "user_id")
      .groupBy(col("cohort"), col("w").as("active_week"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort", "active_week")
  }

  val all: Seq[Q] = Seq(funnel, retention)
}
