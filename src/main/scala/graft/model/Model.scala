package graft.model

import java.sql.Timestamp

/** Core data model, re-expressed from the reference's two abstractions
  * (SURVEY.md §1): an unbounded message stream and a small config table.
  *
  * Reference provenance:
  *  - `PulsarMessage`  → [[BeamMessage]]   (ref src/model/message.go:11-18)
  *  - `PulsarMessages` → [[BeamBatch]]     (ref src/model/message.go:21-25)
  *  - `TopicConfig`    → [[TopicConfig]]   (ref src/model/topic.go:48-59)
  *  - `WebhookConfig`  → [[WebhookConfig]] (ref src/model/topic.go:33-43)
  *  - `Status` enum    → [[Status]]        (ref src/model/topic.go:21-30)
  */
final case class BeamMessage(
    payload: Array[Byte],
    topic: String,
    eventTime: Timestamp,
    publishTime: Timestamp,
    messageId: String,
    key: String,
    props: Map[String, String])

/** Bounded poll batch with capacity semantics (ref src/model/message.go:37-52).
  * The declarative Spark equivalent of `AddPulsarMessage`'s cap is `limit(n)`;
  * this class only models the REST response envelope.
  */
final case class BeamBatch(limit: Int, size: Int, messages: Seq[BeamMessage])

object Status {
  val Deactivated = 0
  val Activated   = 1
  val Suspended   = 2
  val Deleted     = 3 // acts as tombstone in the compacted config view (ref src/db/pulsardb.go:117-121)
  val all: Seq[Int] = Seq(Deactivated, Activated, Suspended, Deleted)
}

/** One webhook subscription of a topic (ref src/model/topic.go:33-43). */
final case class WebhookConfig(
    url: String,
    headers: Seq[String],
    subscription: String,
    subscriptionType: String,
    initialPosition: String,
    webhookStatus: Int)

/** One config-table row, keyed by sha1(topicFullName ++ pulsarURL)
  * (ref src/model/topic.go:48-59, key derivation :119-123).
  */
final case class TopicConfig(
    topicFullName: String,
    token: String,
    tenant: String,
    key: String,
    notes: String,
    topicStatus: Int,
    pulsarURL: String,
    webhooks: Seq[WebhookConfig])

/** Subscription parameter derivation defaults (ref src/route/handlers.go:440-461,
  * enums src/model/topic.go:126-151).
  */
object ConsumerParams {
  val NonResumablePrefix = "nonres" // ref model.NonResumable prefix semantics

  val subscriptionTypes: Set[String] = Set("exclusive", "shared", "keyshared", "failover")
  val initialPositions: Set[String]  = Set("latest", "earliest")

  /** ref src/model/topic.go:138-151: empty string defaults to exclusive. */
  def subscriptionType(s: String): Either[String, String] = {
    val v = Option(s).getOrElse("").toLowerCase
    if (v.isEmpty) Right("exclusive")
    else if (subscriptionTypes(v)) Right(v)
    else Left(s"unsupported subscription type $s")
  }

  /** ref src/model/topic.go:126-136: empty string defaults to latest. */
  def initialPosition(s: String): Either[String, String] = {
    val v = Option(s).getOrElse("").toLowerCase
    if (v.isEmpty) Right("latest")
    else if (initialPositions(v)) Right(v)
    else Left(s"invalid subscription initial position $s")
  }

  /** ref src/route/handlers.go:451-460: absent name → NonResumable+uuid;
    * names shorter than 5 chars rejected.
    */
  def subscriptionName(s: String): Either[String, String] = {
    val v = Option(s).getOrElse("")
    if (v.isEmpty) Right(NonResumablePrefix + java.util.UUID.randomUUID().toString)
    else if (v.length < 5) Left("subscription name must be more than 4 characters")
    else Right(v)
  }
}
