package graft.model

/** Topic full-name build/parse (SURVEY.md §2 O-22).
  *
  * A topic full name is the 4-part structured string
  * `{persistent|non-persistent}://tenant/namespace/topic`
  * (ref src/util/util.go:78-86 BuildTopicFn, :156-176 TokenizeTopicFullName).
  */
object TopicName {

  final case class Parts(persistent: Boolean, tenant: String, namespace: String, topic: String)

  /** ref src/util/util.go:78-86 — accepts `p`/`np` aliases. */
  def build(persistent: String, tenant: String, namespace: String, topic: String): Either[String, String] =
    persistent match {
      case "persistent" | "p"      => Right(s"persistent://$tenant/$namespace/$topic")
      case "non-persistent" | "np" => Right(s"non-persistent://$tenant/$namespace/$topic")
      case _ => Left("supported persistent types are persistent, p, non-persistent, np")
    }

  /** ref src/util/util.go:156-176 — 2-part route tolerated (topic empty). */
  def parse(topicFn: String): Either[String, Parts] = {
    val (isPersistent, rest) =
      if (topicFn.startsWith("persistent://")) (true, topicFn.stripPrefix("persistent://"))
      else if (topicFn.startsWith("non-persistent://")) (false, topicFn.stripPrefix("non-persistent://"))
      else return Left("invalid persistent or non-persistent part")
    rest.split("/", -1) match {
      case Array(t, ns, topic) => Right(Parts(isPersistent, t, ns, topic))
      case Array(t, ns)        => Right(Parts(isPersistent, t, ns, ""))
      case _                   => Left("missing tenant, namespace, or topic name")
    }
  }
}
