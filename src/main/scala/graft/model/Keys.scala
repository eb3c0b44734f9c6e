package graft.model

import java.security.MessageDigest

/** Config-table key derivation (SURVEY.md §2 O-21).
  *
  * Key = hex(sha1(topicFullName ++ pulsarURL)) with the URL validated by a
  * scheme/host/port regex (ref src/model/topic.go:104-123).
  */
object Keys {

  /** ref src/model/topic.go:111 — scheme optional in the reference regex. */
  private val pulsarUrlRe =
    """^(pulsar|pulsar\+ssl)?://[a-zA-Z0-9]+([\-\.][a-zA-Z0-9]+)*(:[0-9]{0,6})?$""".r

  def isValidPulsarUrl(url: String): Boolean = pulsarUrlRe.matches(url.trim)

  /** ref src/model/topic.go:119-123 GenKey. */
  def genKey(topicFullName: String, pulsarURL: String): String =
    sha1Hex(topicFullName + pulsarURL)

  /** ref src/model/topic.go:104-116 GetKeyFromNames. */
  def keyFromNames(topicFullName: String, pulsarURL: String): Either[String, String] = {
    val url  = pulsarURL.trim
    val name = topicFullName.trim
    if (url.isEmpty || name.isEmpty) Left("missing PulsarURL or TopicFullName")
    else if (!isValidPulsarUrl(url)) Left(s"incorrect pulsar url format $url")
    else Right(genKey(name, url))
  }

  def sha1Hex(s: String): String =
    MessageDigest.getInstance("SHA-1")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
}
