package graft.serve

import java.nio.charset.StandardCharsets.UTF_8
import java.security.{KeyFactory, KeyPair, KeyPairGenerator, PrivateKey, PublicKey, Signature}
import java.security.spec.{PKCS8EncodedKeySpec, X509EncodedKeySpec}
import java.util.Base64

/** Minimal RS256 JWT compatible with Pulsar's token scheme (SURVEY.md §2
  * O-24/O-26; ref src/icrypto/pulsar-jwt.go:46-91). Only the `sub` claim is
  * modeled — exactly what the reference issues and checks.
  *
  * Pure `java.security` — no external dependency (zero-egress build).
  */
object Jwt {

  private val b64e = Base64.getUrlEncoder.withoutPadding
  private val b64d = Base64.getUrlDecoder

  def generateKeyPair(): KeyPair = {
    val kpg = KeyPairGenerator.getInstance("RSA")
    kpg.initialize(2048)
    kpg.generateKeyPair()
  }

  def encodePrivate(k: PrivateKey): String = b64e.encodeToString(k.getEncoded)
  def encodePublic(k: PublicKey): String   = b64e.encodeToString(k.getEncoded)

  def decodePrivate(s: String): PrivateKey =
    KeyFactory.getInstance("RSA").generatePrivate(new PKCS8EncodedKeySpec(b64d.decode(s)))
  def decodePublic(s: String): PublicKey =
    KeyFactory.getInstance("RSA").generatePublic(new X509EncodedKeySpec(b64d.decode(s)))

  /** ref src/icrypto/pulsar-jwt.go:34-43 NewRSAKeyPair — the reference
    * boots from RSA key FILES; PEM with PKCS#8 private / X.509-SPKI public
    * bodies (what `openssl genpkey` and `openssl rsa -pubout` emit).
    * Header/footer lines are stripped, body is MIME-base64.
    */
  def loadKeyPair(privatePemPath: String, publicPemPath: String): KeyPair = {
    def der(path: String): Array[Byte] = {
      val pem = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
      Base64.getMimeDecoder.decode(
        pem.linesIterator.filterNot(_.startsWith("-----")).mkString)
    }
    new KeyPair(
      KeyFactory.getInstance("RSA").generatePublic(new X509EncodedKeySpec(der(publicPemPath))),
      KeyFactory.getInstance("RSA").generatePrivate(new PKCS8EncodedKeySpec(der(privatePemPath))))
  }

  /** PEM writer twin of [[loadKeyPair]] (key provisioning + tests). */
  def writePem(kp: KeyPair, privatePemPath: String, publicPemPath: String): Unit = {
    def pem(tag: String, der: Array[Byte]): String =
      s"-----BEGIN $tag-----\n" +
        Base64.getMimeEncoder(64, "\n".getBytes(UTF_8)).encodeToString(der) +
        s"\n-----END $tag-----\n"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(privatePemPath),
      pem("PRIVATE KEY", kp.getPrivate.getEncoded))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(publicPemPath),
      pem("PUBLIC KEY", kp.getPublic.getEncoded))
    ()
  }

  /** ref src/icrypto/pulsar-jwt.go:46-58 GenerateToken — RS256, {"sub": subject}. */
  def sign(subject: String, key: PrivateKey): String = {
    val header  = b64e.encodeToString("""{"alg":"RS256","typ":"JWT"}""".getBytes(UTF_8))
    val payload = b64e.encodeToString(s"""{"sub":"$subject"}""".getBytes(UTF_8))
    val signing = s"$header.$payload"
    val sig     = Signature.getInstance("SHA256withRSA")
    sig.initSign(key)
    sig.update(signing.getBytes(UTF_8))
    s"$signing.${b64e.encodeToString(sig.sign())}"
  }

  /** ref src/icrypto/pulsar-jwt.go:61-91 DecodeToken — verify signature,
    * extract `sub`. Returns Left(reason) on any failure.
    */
  def verify(token: String, key: PublicKey): Either[String, String] =
    token.split("\\.", -1) match {
      case Array(h, p, s) =>
        try {
          val sig = Signature.getInstance("SHA256withRSA")
          sig.initVerify(key)
          sig.update(s"$h.$p".getBytes(UTF_8))
          if (!sig.verify(b64d.decode(s))) Left("invalid signature")
          else {
            val json = new String(b64d.decode(p), UTF_8)
            subPattern.findFirstMatchIn(json)
              .map(m => Right(m.group(1)))
              .getOrElse(Left("missing sub claim"))
          }
        } catch { case e: Exception => Left(s"malformed token: ${e.getMessage}") }
      case _ => Left("token must have 3 segments")
    }

  private val subPattern = """"sub"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
}
