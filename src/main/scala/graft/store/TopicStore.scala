package graft.store

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{Keys, Status, TopicConfig, Validation, WebhookConfig}

/** Config-table store (SURVEY.md §7.1 `store/`; one trait ≈ ref
  * src/db/interface.go:15-39): point lookup (O-17), full scan (O-18),
  * upsert (O-19), delete (O-20).
  */
trait TopicStore {
  def getByKey(key: String): Option[TopicConfig]
  def getByTopic(topicFullName: String, pulsarURL: String): Option[TopicConfig] =
    getByKey(Keys.genKey(topicFullName, pulsarURL))
  def load(): Seq[TopicConfig]

  /** Update-if-exists-else-create; returns the derived key (ref mongo.go:99-118). */
  def update(cfg: TopicConfig): Either[String, String]
  def deleteByKey(key: String): Boolean
}

/** ref src/db/in-memory.go — a keyed map. */
final class InMemoryStore extends TopicStore {
  private val m = TrieMap.empty[String, TopicConfig]

  def getByKey(key: String): Option[TopicConfig] = m.get(key)
  def load(): Seq[TopicConfig]                   = m.values.toSeq.sortBy(_.key)

  def update(cfg: TopicConfig): Either[String, String] =
    Validation.validateTopicConfig(cfg).map { key =>
      m.put(key, cfg.copy(key = key))
      key
    }

  def deleteByKey(key: String): Boolean = m.remove(key).isDefined
}

/** The reference's one genuinely interesting engine idea (SURVEY.md §3.4):
  * the config table is itself a stream with latest-by-key materialization
  * (ref src/db/pulsardb.go:19-26, 86-127).
  *
  * Writes append one JSON line per mutation (delete = Deleted-status
  * tombstone, ref pulsardb.go:272-297); the compacted view is the O-16
  * query — `row_number() over (partition by key order by seq desc) = 1`
  * then tombstone filter — evaluated in Spark, so the same code compacts a
  * 100-row config log or a 100-billion-row keyed stream. A driver-side map
  * caches the projection exactly like the reference's `dbListener`.
  */
final class CompactedLogStore(spark: SparkSession, logDir: String) extends TopicStore {

  private val logPath = Paths.get(logDir, "config-log.jsonl")
  Files.createDirectories(logPath.getParent)

  private val cache = TrieMap.empty[String, TopicConfig]

  private val rowSchema =
    StructType(StructField("seq", LongType) +: ConfigSerde.rowSchema.fields)

  /** The raw event log as a DataFrame (schema-on-read, bad lines dropped —
    * ref pulsardb.go:112-115 skips unmarshal errors).
    */
  def log(): DataFrame =
    if (Files.exists(logPath)) spark.read.schema(rowSchema).json(logPath.toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], rowSchema)

  /** O-16 compacted view: latest row per key, tombstones removed. */
  def compactedView(): DataFrame = {
    val w = Window.partitionBy("key").orderBy(col("seq").desc)
    log()
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1 && col("topicStatus") =!= Status.Deleted)
      .drop("rn", "seq")
  }

  def getByKey(key: String): Option[TopicConfig] = cache.get(key)
  def load(): Seq[TopicConfig]                   = cache.values.toSeq.sortBy(_.key)

  def update(cfg: TopicConfig): Either[String, String] =
    Validation.validateTopicConfig(cfg).map { key =>
      val stamped = cfg.copy(key = key)
      append(stamped, stamped.topicStatus)
      cache.put(key, stamped)
      key
    }

  def deleteByKey(key: String): Boolean =
    cache.remove(key) match {
      case Some(cfg) => append(cfg, Status.Deleted); true
      case None      => false
    }

  private var seq: Long = 0L

  private def append(cfg: TopicConfig, status: Int): Unit = synchronized {
    seq += 1
    val line = ConfigSerde.toJson(cfg,
      extra = Seq("seq" -> Json.num(seq)), statusOverride = Some(status))
    Files.write(logPath, (line + "\n").getBytes(UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Rewrite the log file to its compacted form — latest entry per key,
    * tombstones dropped (once nothing older remains to shadow, a Deleted
    * marker carries no information; same retirement rule as a compacted
    * Kafka topic). Keeps an unbounded-lifetime store's replay cost
    * proportional to the LIVE config set, not the mutation history. The
    * rewrite goes through write-then-ATOMIC_MOVE so a crash leaves the old
    * log, never a torn one; the sequence restarts densely from 1.
    */
  def compact(): Unit = synchronized {
    if (!Files.exists(logPath)) return
    val rows = compactedView().collect().map(ConfigSerde.fromRow).sortBy(_.key)
    var s = 0L
    val lines = rows.map { cfg =>
      s += 1
      ConfigSerde.toJson(cfg, extra = Seq("seq" -> Json.num(s)))
    }
    val tmp = Files.createTempFile(logPath.getParent, ".compact-", ".jsonl")
    try {
      Files.write(tmp, lines.map(_ + "\n").mkString.getBytes(UTF_8))
      Files.move(tmp, logPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } catch {
      case e: Throwable => Files.deleteIfExists(tmp); throw e
    }
    seq = s
  }

  /** Current log line count (test/introspection hook). */
  private[graft] def logSize: Long =
    if (!Files.exists(logPath)) 0L
    else {
      val lines = Files.lines(logPath)
      try lines.count() finally lines.close()
    }

  /** Rebuild the driver cache from the compacted view (restart path). */
  def replay(): Unit = {
    cache.clear()
    if (!Files.exists(logPath)) return
    val rows = compactedView().collect() // config table is bounded (SURVEY §7.4)
    var maxSeq = 0L
    rows.foreach { r => val cfg = ConfigSerde.fromRow(r); cache.put(cfg.key, cfg) }
    // continue the sequence after the largest logged seq
    val seqRow = log().agg(max("seq")).collect()(0)
    if (!seqRow.isNullAt(0)) maxSeq = seqRow.getLong(0)
    seq = maxSeq
  }

  replay() // hydrate like dbListener (ref pulsardb.go:86-127); must run after field init
}

/** Third backend, completing the reference's trio of Db implementations
  * (in-memory / pulsar-as-db / Mongo — ref src/db/mongo.go:1-262): a
  * document store keyed by config key, one JSON document per key, mirroring
  * the Mongo collection's upsert/delete-by-key/find-all surface. The
  * external store owns durability; a driver write-through cache mirrors the
  * reference's `dbListener` read path. Hydration is a Spark schema-on-read
  * scan over the document directory (bad documents dropped, like
  * mongo.go's unmarshal-error skip).
  */
final class DocumentStore(spark: SparkSession, dir: String) extends TopicStore {

  private val root = Paths.get(dir)
  Files.createDirectories(root)

  private val cache = TrieMap.empty[String, TopicConfig]

  private def docPath(key: String) = root.resolve(s"$key.json")

  def getByKey(key: String): Option[TopicConfig] = cache.get(key)
  def load(): Seq[TopicConfig]                   = cache.values.toSeq.sortBy(_.key)

  def update(cfg: TopicConfig): Either[String, String] =
    Validation.validateTopicConfig(cfg).map { key =>
      val stamped = cfg.copy(key = key)
      // replace-upsert, the FindOneAndReplace(upsert) shape (ref mongo.go:99-118)
      Files.write(docPath(key), (ConfigSerde.toJson(stamped) + "\n").getBytes(UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
      cache.put(key, stamped)
      key
    }

  def deleteByKey(key: String): Boolean = {
    val existed = cache.remove(key).isDefined
    Files.deleteIfExists(docPath(key))
    existed
  }

  /** Rebuild the cache from the document directory (restart path). */
  def hydrate(): Unit = {
    cache.clear()
    val listing = Files.list(root)
    val hasDocs = try listing.iterator().hasNext finally listing.close()
    if (!hasDocs) return
    spark.read.schema(ConfigSerde.rowSchema).json(root.toString)
      .where(col("key").isNotNull)
      .collect()
      .foreach { r => val cfg = ConfigSerde.fromRow(r); cache.put(cfg.key, cfg) }
  }

  hydrate() // must run after field init (constructor-order gotcha)
}

/** TopicConfig ⇄ JSON document serde shared by the log and document
  * backends (write: [[Json]]; read: Spark schema-on-read).
  */
private[store] object ConfigSerde {
  val whSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("url", StringType), StructField("headers", ArrayType(StringType)),
    StructField("subscription", StringType), StructField("subscriptionType", StringType),
    StructField("initialPosition", StringType), StructField("webhookStatus", IntegerType))))

  val rowSchema: StructType = StructType(Seq(
    StructField("topicFullName", StringType), StructField("token", StringType),
    StructField("tenant", StringType), StructField("key", StringType),
    StructField("notes", StringType), StructField("topicStatus", IntegerType),
    StructField("pulsarURL", StringType), StructField("webhooks", whSchema)))

  def toJson(cfg: TopicConfig, extra: Seq[(String, String)] = Nil,
      statusOverride: Option[Int] = None): String =
    Json.obj(extra ++ Seq(
      "topicFullName" -> Json.str(cfg.topicFullName),
      "token" -> Json.str(cfg.token), "tenant" -> Json.str(cfg.tenant),
      "key" -> Json.str(cfg.key), "notes" -> Json.str(cfg.notes),
      "topicStatus" -> Json.num(statusOverride.getOrElse(cfg.topicStatus).toLong),
      "pulsarURL" -> Json.str(cfg.pulsarURL),
      "webhooks" -> Json.arr(cfg.webhooks.map(wh => Json.obj(
        "url" -> Json.str(wh.url),
        "headers" -> Json.arr(wh.headers.map(Json.str)),
        "subscription" -> Json.str(wh.subscription),
        "subscriptionType" -> Json.str(wh.subscriptionType),
        "initialPosition" -> Json.str(wh.initialPosition),
        "webhookStatus" -> Json.num(wh.webhookStatus))))): _*)

  def fromRow(r: org.apache.spark.sql.Row): TopicConfig = {
    val whs = Option(r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("webhooks")))
      .getOrElse(Seq.empty).map { w =>
        WebhookConfig(w.getString(0), Option(w.getSeq[String](1)).getOrElse(Nil),
          w.getString(2), w.getString(3), w.getString(4), w.getInt(5))
      }
    TopicConfig(
      r.getAs[String]("topicFullName"), r.getAs[String]("token"),
      r.getAs[String]("tenant"), r.getAs[String]("key"), r.getAs[String]("notes"),
      r.getAs[Int]("topicStatus"), r.getAs[String]("pulsarURL"), whs)
  }
}

/** Tiny JSON writer for the config log (no external json lib in the
  * zero-egress build; read path is Spark's `from_json`).
  */
private[graft] object Json {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'          => "\\\""
    case '\\'         => "\\\\"
    case '\n'         => "\\n"
    case '\r'         => "\\r"
    case '\t'         => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c            => c.toString
  } + "\""
  def num(n: Long): String                         = n.toString
  def arr(xs: Seq[String]): String                 = xs.mkString("[", ",", "]")
  def obj(fields: (String, String)*): String       =
    fields.map { case (k, v) => s"${str(k)}:$v" }.mkString("{", ",", "}")
}
