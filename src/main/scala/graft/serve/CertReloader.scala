package graft.serve

import java.io.FileInputStream
import java.net.Socket
import java.nio.file.{Files, Path, Paths}
import java.security.{KeyStore, Principal, PrivateKey}
import java.security.cert.X509Certificate
import java.util.concurrent.atomic.AtomicReference

import javax.net.ssl.{KeyManagerFactory, SSLContext, SSLEngine, X509ExtendedKeyManager}

import scala.util.Try

/** O-32 TLS certificate hot-reload (ref src/util/cert-loader.go:39-125):
  * the reference stat-polls the cert/key files once per second and swaps
  * the parsed key pair into an atomic store that `GetCertificate` reads on
  * every TLS handshake, so new connections pick up a rotated certificate
  * with no restart or dropped listener.
  *
  * JVM shape: the JDK's SSLContext binds its KeyManager once, so the swap
  * point moves one level down — a delegating [[X509ExtendedKeyManager]]
  * forwards every call to an [[AtomicReference]] target that the watcher
  * thread replaces after reloading the keystore. One PKCS12 keystore file
  * carries both cert and key, so the reference's "only reload when BOTH
  * files changed" dance collapses to a single-file watch; a half-written
  * file fails the keystore load and the old certificate stays active until
  * the next tick (same recover-by-retry as the reference's ignored
  * `loadCert` error).
  */
final class CertReloader(keystorePath: String, password: Array[Char],
    pollMillis: Long = 1000L) {

  private val path: Path = Paths.get(keystorePath)
  private val current    = new AtomicReference[X509ExtendedKeyManager](loadKeyManager())
  // change baseline captured AT LOAD TIME — a rotation in the window
  // between construction and watcher start must still be detected
  @volatile private var lastStat: (Long, Long) = stat()
  @volatile private var running = true

  /** (size, mtime) — the reference's change predicate (cert-loader.go:50-58). */
  private def stat(): (Long, Long) =
    (Try(Files.size(path)).getOrElse(-1L),
      Try(Files.getLastModifiedTime(path).toMillis).getOrElse(-1L))

  private def loadKeyManager(): X509ExtendedKeyManager = {
    val ks = KeyStore.getInstance("PKCS12")
    val in = new FileInputStream(keystorePath)
    try ks.load(in, password)
    finally in.close()
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, password)
    kmf.getKeyManagers.collectFirst { case km: X509ExtendedKeyManager => km }
      .getOrElse(throw new IllegalStateException(s"no X509 key manager in $keystorePath"))
  }

  /** The certificate the next handshake will present (tests read its serial). */
  def currentCertificate: X509Certificate = {
    val km = current.get
    def aliases(kt: String) = Option(km.getServerAliases(kt, null)).toSeq.flatten
    val alias = (aliases("RSA") ++ aliases("EC")).headOption
      .getOrElse(throw new IllegalStateException("keystore has no server alias"))
    km.getCertificateChain(alias)(0)
  }

  /** SSLContext whose key material follows the atomic reference — build it
    * once, hand it to HttpsConfigurator, and every handshake sees the
    * freshest keystore.
    */
  val context: SSLContext = {
    val delegating = new X509ExtendedKeyManager {
      private def d = current.get
      override def getClientAliases(kt: String, is: Array[Principal]) = d.getClientAliases(kt, is)
      override def chooseClientAlias(kt: Array[String], is: Array[Principal], s: Socket) =
        d.chooseClientAlias(kt, is, s)
      override def getServerAliases(kt: String, is: Array[Principal]) = d.getServerAliases(kt, is)
      override def chooseServerAlias(kt: String, is: Array[Principal], s: Socket) =
        d.chooseServerAlias(kt, is, s)
      override def getCertificateChain(a: String) = d.getCertificateChain(a)
      override def getPrivateKey(a: String): PrivateKey = d.getPrivateKey(a)
      override def chooseEngineClientAlias(kt: Array[String], is: Array[Principal], e: SSLEngine) =
        d.chooseEngineClientAlias(kt, is, e)
      override def chooseEngineServerAlias(kt: String, is: Array[Principal], e: SSLEngine) =
        d.chooseEngineServerAlias(kt, is, e)
    }
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(Array(delegating), null, null)
    ctx
  }

  private val watcher = new Thread(() => {
    while (running) {
      try Thread.sleep(pollMillis)
      catch { case _: InterruptedException => () }
      val now = stat()
      if (now != lastStat && now._1 >= 0) {
        lastStat = now
        // a torn read keeps the old manager; the next tick retries
        Try(loadKeyManager()).foreach(current.set)
      }
    }
  }, "graft-cert-reloader")
  watcher.setDaemon(true)

  def start(): Unit = watcher.start()
  def stop(): Unit  = { running = false; watcher.interrupt() }
}
