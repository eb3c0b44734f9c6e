package graft.topics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Keys

/** Directory-backed topic tables: the engine's stand-in for Pulsar topics
  * (SURVEY.md §7.1 `topics/`; ref capabilities #1/#5 README.md:14,18).
  *
  * A topic is a directory of append-only parquet segments with the
  * [[graft.model.BeamMessage]] schema (§1.4). Batch reads, bounded polls
  * (O-6), and file-source `readStream` (O-8) all go through here, so Spark's
  * native parquet DSv2 path (vectorized reader, pushdown, partition listing)
  * serves every consumer. Writes hash-partition naturally: each executor
  * task appends its own segment file — no coordination, no driver data path.
  *
  * In the zero-egress sandbox the `pulsar://` URL from configs is honored as
  * an identity but served locally (SURVEY.md §4.2 BeamSource note).
  */
final class TopicTable(spark: SparkSession, baseDir: String) {

  /** Topic directory: sha1 of the full name keeps paths safe (O-21 reuse). */
  private def dir(topicFn: String): String = s"$baseDir/${Keys.sha1Hex(topicFn)}"

  val schema: StructType = StructType(Seq(
    StructField("payload", BinaryType),
    StructField("topic", StringType),
    StructField("eventTime", TimestampType),
    StructField("publishTime", TimestampType),
    StructField("messageId", StringType),
    StructField("key", StringType),
    StructField("props", MapType(StringType, StringType))))

  /** Ingest (O-1/O-4): stamp eventTime=now, a `PulsarBeamId` uuid property,
    * publishTime, and a per-row messageId, then append. `async` mirrors
    * O-5: fire-and-forget keeps default commit semantics; sync forces the
    * write to complete before returning (both are synchronous under local
    * parquet — the flag is the API contract, ref pulsar-producer.go:95-105).
    */
  def ingest(df: DataFrame, topicFn: String, async: Boolean = true): Unit = {
    val out = df
      .withColumn("topic", lit(topicFn))
      .withColumn("eventTime", coalesce(col("eventTime"), current_timestamp()))
      .withColumn("publishTime", current_timestamp())
      .withColumn("messageId",
        concat_ws(":", unix_millis(current_timestamp()), spark_partition_id(),
          monotonically_increasing_id()))
      .withColumn("key", coalesce(col("key"), lit("")))
      .withColumn("props",
        map_concat(coalesce(col("props"), map()), map(lit("PulsarBeamId"), expr("uuid()"))))
      .select("payload", "topic", "eventTime", "publishTime", "messageId", "key", "props")
    out.write.mode("append").parquet(dir(topicFn))
  }

  /** Ingest raw payload bytes (the HTTP POST body path, O-1). */
  def ingestPayload(payload: Array[Byte], topicFn: String,
      props: Map[String, String] = Map.empty): Unit = {
    import spark.implicits._
    val df = Seq((payload, Option.empty[java.sql.Timestamp], Option.empty[String], props))
      .toDF("payload", "eventTime", "key", "props")
    ingest(df, topicFn)
  }

  def exists(topicFn: String): Boolean =
    new java.io.File(dir(topicFn)).exists()

  /** Batch scan over everything published so far. */
  def read(topicFn: String): DataFrame =
    if (exists(topicFn)) spark.read.schema(schema).parquet(dir(topicFn))
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Bounded poll (O-6): earliest-position arrival order, capped batch —
    * Catalyst plans TakeOrderedAndProject (no global sort at scale).
    */
  def poll(topicFn: String, limit: Int = 10): DataFrame =
    read(topicFn).orderBy("publishTime", "messageId").limit(limit)

  /** Continuous subscription (O-8): micro-batch file stream. The
    * subscription's identity (exclusive-by-name, O-9) is the caller's
    * checkpoint location.
    */
  def readStream(topicFn: String): DataFrame = {
    val d = new java.io.File(dir(topicFn))
    if (!d.exists()) d.mkdirs() // subscribe-before-publish is legal (latest position)
    spark.readStream.schema(schema).parquet(d.toString)
  }
}
