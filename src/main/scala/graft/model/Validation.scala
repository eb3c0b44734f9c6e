package graft.model

import java.net.URI

/** Config validation predicates (SURVEY.md §2 O-23;
  * ref src/model/topic.go:157-192).
  */
object Validation {

  /** ref src/model/topic.go:189-192 isURL — scheme and host both present. */
  def isUrl(s: String): Boolean =
    try {
      val u = new URI(s)
      u.getScheme != null && u.getScheme.nonEmpty && u.getHost != null && u.getHost.nonEmpty
    } catch { case _: Exception => false }

  /** ref src/model/topic.go:161-186 ValidateWebhookConfig: each webhook must
    * have a URL, a non-blank subscription, valid enum strings, and exclusive
    * subscription names must be unique across the topic's webhooks.
    */
  def validateWebhooks(whs: Seq[WebhookConfig]): Either[String, Unit] = {
    val seenExclusive = scala.collection.mutable.Set.empty[String]
    whs.foldLeft[Either[String, Unit]](Right(())) { (acc, wh) =>
      acc.flatMap { _ =>
        if (!isUrl(wh.url)) Left(s"not a URL ${wh.url}")
        else if (wh.subscription.trim.isEmpty) Left("subscription name is missing")
        else
          ConsumerParams.subscriptionType(wh.subscriptionType).flatMap { subType =>
            if (subType == "exclusive" && !seenExclusive.add(wh.subscription))
              Left(s"exclusive subscription ${wh.subscription} cannot be shared between multiple webhooks")
            else ConsumerParams.initialPosition(wh.initialPosition).map(_ => ())
          }
      }
    }
  }

  /** ref src/model/topic.go:179-186 ValidateTopicConfig → derived key. */
  def validateTopicConfig(cfg: TopicConfig): Either[String, String] =
    validateWebhooks(cfg.webhooks).flatMap(_ => Keys.keyFromNames(cfg.topicFullName, cfg.pulsarURL))
}
