package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, MapType, StringType}

/** Reference-derived query surface (SURVEY.md §2.A → §2.B), each operator
  * re-expressed as a deterministic relational query over the driver testdata.
  * The `events` table stands in for a topic's message stream
  * (FIXTURES.md §B role mapping).
  */
object RefOps {

  private def events(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "events")

  /** O-6 bounded poll: earliest-position scan, arrival order, capped batch
    * (ref src/broker/sse-broker.go:34-61; batch cap src/model/message.go:37-52).
    * Catalyst plans this as TakeOrderedAndProject — no full sort at scale.
    */
  val pollBatch: Q = Q(
    "r01_poll_batch",
    "SELECT event_id, ts, user_id, event_type, value, props FROM events ORDER BY ts, event_id LIMIT 10"
  ) { (s, dir) =>
    events(s, dir)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .orderBy("ts", "event_id")
      .limit(10)
  }

  /** O-16 compacted-topic materialization: latest row per key
    * (ref src/db/pulsardb.go:86-127 — last JSON doc per key wins).
    */
  val latestByKey: Q = Q(
    "r02_latest_by_key",
    """SELECT user_id, event_id AS last_event_id, ts AS last_ts, event_type AS last_type
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      |WHERE rn = 1 ORDER BY user_id NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    events(s, dir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(
        col("user_id"),
        col("event_id").as("last_event_id"),
        col("ts").as("last_ts"),
        col("event_type").as("last_type"))
      .orderBy("user_id")
  }

  /** O-16 + O-20 tombstone semantics: a key whose latest row is a delete
    * marker disappears from the compacted view (ref src/db/pulsardb.go:117-121,
    * TopicStatus==Deleted). `error` plays the tombstone role here.
    */
  val tombstoneCompact: Q = Q(
    "r03_tombstone_compact",
    """SELECT user_id, event_id AS last_event_id, value AS last_value
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      |WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id""".stripMargin
  ) { (s, dir) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    events(s, dir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("event_id").as("last_event_id"), col("value").as("last_value"))
      .orderBy("user_id")
  }

  /** O-14 webhook reconciliation as a declarative set-difference: desired
    * minus actual via left_anti (ref src/broker/webhook.go:243-273).
    */
  val reconcileDiff: Q = Q(
    "r04_reconcile_diff",
    """SELECT DISTINCT user_id FROM events e WHERE event_type = 'signup'
      |AND NOT EXISTS (SELECT 1 FROM events a WHERE a.event_type = 'purchase' AND a.user_id = e.user_id)
      |ORDER BY user_id""".stripMargin
  ) { (s, dir) =>
    val ev      = events(s, dir)
    val desired = ev.where(col("event_type") === "signup").select("user_id").distinct()
    val actual  = ev.where(col("event_type") === "purchase").select("user_id")
    desired.join(actual, Seq("user_id"), "left_anti").orderBy("user_id")
  }

  /** O-15 status filter: only Activated rows drive consumers
    * (ref src/broker/webhook.go:253-262). Status synthesized as user_id % 4.
    */
  val statusFilter: Q = Q(
    "r05_status_filter",
    """SELECT event_type, count(*) AS n_activated FROM events
      |WHERE user_id % 4 = 1 GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, dir) =>
    events(s, dir)
      .where(col("user_id") % 4 === 1)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_activated"))
      .orderBy("event_type")
  }

  /** O-25 tenant authorization predicate: superrole OR exact tenant match OR
    * suffix rule `tenant == sub minus last "-"-part`
    * (ref src/route/handlers.go:375-421). Subjects synthesized per row.
    */
  val authTenant: Q = Q(
    "r06_auth_tenant",
    """SELECT tenant, CAST(sum(CASE WHEN sub = 'admin' OR tenant = sub OR tenant = regexp_extract(sub, '(.*)-[^-]*$', 1)
      |                        THEN 1 ELSE 0 END) AS BIGINT) AS n_authorized, count(*) AS n_total
      |FROM (SELECT CASE WHEN user_id % 50 = 0 THEN 'admin'
      |                  WHEN event_id % 3 = 0 THEN concat('tenant', CAST(user_id % 7 AS VARCHAR), '-client0')
      |                  ELSE concat('tenant', CAST(user_id % 7 AS VARCHAR)) END AS sub,
      |             concat('tenant', CAST(event_id % 7 AS VARCHAR)) AS tenant
      |      FROM events)
      |GROUP BY tenant ORDER BY tenant""".stripMargin
  ) { (s, dir) =>
    val withSubs = events(s, dir).select(
      when(col("user_id") % 50 === 0, lit("admin"))
        .when(col("event_id") % 3 === 0, concat(lit("tenant"), (col("user_id") % 7).cast(StringType), lit("-client0")))
        .otherwise(concat(lit("tenant"), (col("user_id") % 7).cast(StringType)))
        .as("sub"),
      concat(lit("tenant"), (col("event_id") % 7).cast(StringType)).as("tenant"))
    val authorized =
      col("sub") === "admin" ||
        col("tenant") === col("sub") ||
        col("tenant") === regexp_extract(col("sub"), "(.*)-[^-]*$", 1)
    withSubs
      .groupBy("tenant")
      .agg(
        sum(when(authorized, 1).otherwise(0)).as("n_authorized"),
        count(lit(1)).as("n_total"))
      .orderBy("tenant")
  }

  /** O-21 key derivation: hash of topicFullName ++ pulsarURL
    * (ref src/model/topic.go:119-123 uses sha1; md5 here because the DuckDB
    * oracle lacks sha1 — the sha1 path is unit-tested against the reference's
    * golden key instead). nation⨝region is a broadcast join.
    */
  val keyDerive: Q = Q(
    "r07_key_derive",
    """SELECT n_nationkey, concat('persistent://', n_name, '/ns/', r_name) AS topic_fn,
      |       md5(concat('persistent://', n_name, '/ns/', r_name, 'pulsar://broker0:6650')) AS cfg_key
      |FROM nation JOIN region ON n_regionkey = r_regionkey ORDER BY n_nationkey""".stripMargin
  ) { (s, dir) =>
    val n       = Tables(s, dir, "nation")
    val r       = Tables(s, dir, "region")
    val topicFn = concat(lit("persistent://"), col("n_name"), lit("/ns/"), col("r_name"))
    n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("n_nationkey"),
        topicFn.as("topic_fn"),
        md5(concat(topicFn, lit("pulsar://broker0:6650"))).as("cfg_key"))
      .orderBy("n_nationkey")
  }

  /** O-22 topic-name build/parse round-trip via regexp_extract
    * (ref src/util/util.go:78-86, 156-176).
    */
  val topicParse: Q = Q(
    "r08_topic_parse",
    """SELECT n_nationkey,
      |       regexp_extract(topic_fn, '^(persistent|non-persistent)://([^/]*)/([^/]*)/(.*)$', 1) AS persistence,
      |       regexp_extract(topic_fn, '^(persistent|non-persistent)://([^/]*)/([^/]*)/(.*)$', 2) AS tenant,
      |       regexp_extract(topic_fn, '^(persistent|non-persistent)://([^/]*)/([^/]*)/(.*)$', 3) AS namespace,
      |       regexp_extract(topic_fn, '^(persistent|non-persistent)://([^/]*)/([^/]*)/(.*)$', 4) AS topic
      |FROM (SELECT n_nationkey,
      |             concat(CASE WHEN n_nationkey % 2 = 0 THEN 'persistent' ELSE 'non-persistent' END,
      |                    '://', n_name, '/ns', CAST(n_regionkey AS VARCHAR), '/t', CAST(n_nationkey AS VARCHAR)) AS topic_fn
      |      FROM nation)
      |ORDER BY n_nationkey""".stripMargin
  ) { (s, dir) =>
    val pat = "^(persistent|non-persistent)://([^/]*)/([^/]*)/(.*)$"
    Tables(s, dir, "nation")
      .select(
        col("n_nationkey"),
        concat(
          when(col("n_nationkey") % 2 === 0, lit("persistent")).otherwise(lit("non-persistent")),
          lit("://"), col("n_name"),
          lit("/ns"), col("n_regionkey").cast(StringType),
          lit("/t"), col("n_nationkey").cast(StringType)).as("topic_fn"))
      .select(
        col("n_nationkey"),
        regexp_extract(col("topic_fn"), pat, 1).as("persistence"),
        regexp_extract(col("topic_fn"), pat, 2).as("tenant"),
        regexp_extract(col("topic_fn"), pat, 3).as("namespace"),
        regexp_extract(col("topic_fn"), pat, 4).as("topic"))
      .orderBy("n_nationkey")
  }

  /** O-11 JSON payload access: the reference sniffs/reads JSON payloads at
    * delivery (ref src/broker/webhook.go:234-236); here the `props` JSON
    * column is parsed and aggregated.
    */
  val jsonProps: Q = Q(
    "r09_json_props",
    """SELECT event_type, CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    events(s, dir)
      .groupBy("event_type")
      .agg(
        // try_cast: a crawl can deliver string-valued props.k — both engines
        // must skip it as NULL, not raise (ANSI) / error (DuckDB)
        sum(expr("try_cast(get_json_object(props, '$.k') as bigint)")).as("sum_k"),
        count(lit(1)).as("n"))
      .orderBy("event_type")
  }

  /** O-11 JSON-validity sniff (`json.Valid(payload)` →
    * `from_json(...).isNotNull`, ref src/broker/webhook.go:234-236). Every
    * 7th payload is mangled to exercise the invalid branch.
    */
  val jsonValid: Q = Q(
    "r10_json_valid",
    """SELECT event_type,
      |       CAST(sum(CASE WHEN json_valid(mangled) THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
      |       CAST(sum(CASE WHEN json_valid(mangled) THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid
      |FROM (SELECT event_type, CASE WHEN event_id % 7 = 0 THEN 'x' || props ELSE props END AS mangled FROM events)
      |GROUP BY event_type ORDER BY event_type NULLS FIRST""".stripMargin
  ) { (s, dir) =>
    // Leading-garbage corruption: Spark's variant parser accepts a complete
    // JSON value with TRAILING junk (`"k": 87}` parses as the string "k"),
    // DuckDB's json_valid does not — a leading-garbage mangle is rejected by
    // both engines, so the validity contract is engine-agnostic.
    val mangled = when(col("event_id") % 7 === 0, concat(lit("x"), col("props"))).otherwise(col("props"))
    // Syntax-only validity (matches DuckDB json_valid / Go json.Valid):
    // from_json(schema) would also reject schema-mismatched-but-valid JSON.
    val valid = try_parse_json(mangled).isNotNull
    events(s, dir)
      .select(col("event_type"), valid.as("is_valid"))
      .groupBy("event_type")
      .agg(
        sum(when(col("is_valid"), 1).otherwise(0)).as("n_valid"),
        sum(when(col("is_valid"), 0).otherwise(1)).as("n_invalid"))
      .orderBy("event_type")
  }

  /** O-23 duplicate-subscription detection: uniqueness via group-count > 1
    * (ref src/model/topic.go:161-178 exclusiveSubs set).
    */
  val dupSubscription: Q = Q(
    "r11_dup_subscription",
    """SELECT user_id, event_type, count(*) AS n FROM events
      |GROUP BY user_id, event_type HAVING count(*) > 1 ORDER BY user_id, event_type""".stripMargin
  ) { (s, dir) =>
    events(s, dir)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n"))
      .where(col("n") > 1)
      .orderBy("user_id", "event_type")
  }

  /** O-3 header-envelope projection: wrap selected fields as a JSON envelope
    * (`InfoRichMessage`, ref src/route/handlers.go:77-80,108-120).
    */
  val batchEnvelope: Q = Q(
    "r12_batch_envelope",
    """SELECT event_id, to_json(struct_pack(event_id := event_id, event_type := event_type)) AS envelope
      |FROM events ORDER BY event_id LIMIT 20""".stripMargin
  ) { (s, dir) =>
    events(s, dir)
      .select(
        col("event_id"),
        to_json(struct(col("event_id"), col("event_type"))).as("envelope"))
      .orderBy("event_id")
      .limit(20)
  }

  /** O-11 property flattening: each message property becomes one delivery
    * header row (`PulsarProperties-<k>`, ref src/broker/webhook.go:229-231);
    * the ingest-stamped PulsarBeamId (O-4, ref src/pulsardriver/
    * pulsar-producer.go:86) is made deterministic as md5(event_id).
    */
  val headerFlatten: Q = Q(
    "r13_header_flatten",
    """SELECT * FROM (
      |  SELECT event_id, 'PulsarBeamId' AS prop_key, md5(CAST(event_id AS VARCHAR)) AS prop_value FROM events
      |  UNION ALL
      |  SELECT event_id, 'k' AS prop_key, json_extract_string(props, '$.k') AS prop_value FROM events)
      |ORDER BY event_id, prop_key""".stripMargin
  ) { (s, dir) =>
    events(s, dir)
      .select(
        col("event_id"),
        explode(map(
          lit("PulsarBeamId"), md5(col("event_id").cast(StringType)),
          lit("k"), get_json_object(col("props"), "$.k"))).as(Seq("prop_key", "prop_value")))
      .orderBy("event_id", "prop_key")
  }

  val all: Seq[Q] = Seq(
    pollBatch, latestByKey, tombstoneCompact, reconcileDiff, statusFilter,
    authTenant, keyDerive, topicParse, jsonProps, jsonValid, dupSubscription,
    batchEnvelope, headerFlatten)
}
