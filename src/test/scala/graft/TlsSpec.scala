package graft

import java.io.FileInputStream
import java.net.Socket
import java.nio.file.{Files, Path, StandardCopyOption}
import java.security.KeyStore
import java.security.cert.X509Certificate

import javax.net.ssl.{SSLContext, SSLSocket, X509ExtendedTrustManager}

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.serve.{BeamServer, Jwt}
import graft.store.InMemoryStore
import graft.topics.TopicTable

/** O-32 TLS + certificate hot-reload (ref src/util/cert-loader.go:39-125):
  * the server must present a rotated certificate to NEW connections without
  * a restart — the reference stat-polls the cert files once per second and
  * swaps atomically; here the keystore file is overwritten in place and the
  * next handshake must show the new serial.
  */
class TlsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val pass = "changeit"

  private def genKeystore(dir: Path, cn: String): Path = {
    val ks = dir.resolve(s"$cn.p12")
    val cmd = Seq("keytool", "-genkeypair", "-alias", "srv", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "1", "-dname", s"CN=$cn",
      "-keystore", ks.toString, "-storetype", "PKCS12", "-storepass", pass)
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    assert(p.waitFor() == 0, s"keytool failed: ${new String(p.getInputStream.readAllBytes())}")
    ks
  }

  private def serialOf(ks: Path): BigInt = {
    val store = KeyStore.getInstance("PKCS12")
    val in    = new FileInputStream(ks.toFile)
    try store.load(in, pass.toCharArray)
    finally in.close()
    BigInt(store.getCertificate("srv").asInstanceOf[X509Certificate].getSerialNumber)
  }

  private val trustAll: SSLContext = {
    val tm = new X509ExtendedTrustManager {
      override def checkClientTrusted(c: Array[X509Certificate], a: String): Unit = ()
      override def checkServerTrusted(c: Array[X509Certificate], a: String): Unit = ()
      override def checkClientTrusted(c: Array[X509Certificate], a: String, s: Socket): Unit = ()
      override def checkServerTrusted(c: Array[X509Certificate], a: String, s: Socket): Unit = ()
      override def checkClientTrusted(c: Array[X509Certificate], a: String,
          e: javax.net.ssl.SSLEngine): Unit = ()
      override def checkServerTrusted(c: Array[X509Certificate], a: String,
          e: javax.net.ssl.SSLEngine): Unit = ()
      override def getAcceptedIssuers: Array[X509Certificate] = Array.empty
    }
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, Array(tm), null)
    ctx
  }

  /** Serial presented on a fresh handshake against localhost:port. */
  private def handshakeSerial(port: Int): BigInt = {
    val sock = trustAll.getSocketFactory.createSocket("localhost", port)
      .asInstanceOf[SSLSocket]
    try {
      sock.startHandshake()
      BigInt(sock.getSession.getPeerCertificates.head
        .asInstanceOf[X509Certificate].getSerialNumber)
    } finally sock.close()
  }

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-tls-test")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("HTTPS serves the API and hot-reloads a rotated certificate (O-32)") {
    val dir  = Files.createTempDirectory("graft-tls")
    val ksA  = genKeystore(dir, "cert-a")
    val live = dir.resolve("live.p12")
    Files.copy(ksA, live, StandardCopyOption.REPLACE_EXISTING)

    val kp     = Jwt.generateKeyPair()
    val topics = new TopicTable(spark, Files.createTempDirectory("graft-tls-t").toString)
    val server = new BeamServer(topics, new InMemoryStore, kp,
      tls = Some((live.toString, pass.toCharArray)))
    server.start()
    try {
      val port = server.boundPort
      assert(handshakeSerial(port) == serialOf(ksA), "initial cert should be keystore A's")

      // the API answers over TLS
      val http = java.net.http.HttpClient.newBuilder().sslContext(trustAll).build()
      val resp = http.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"https://localhost:$port/status"))
          .header("Authorization", "x").build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200)

      // rotate: overwrite the live keystore with a fresh keypair; the 1 s
      // watcher must swap it in for NEW handshakes, old connections
      // untouched, server never restarted
      val ksB = genKeystore(dir, "cert-b")
      assert(serialOf(ksB) != serialOf(ksA))
      Files.copy(ksB, live, StandardCopyOption.REPLACE_EXISTING)

      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      var seen     = handshakeSerial(port)
      while (seen != serialOf(ksB) && System.nanoTime() < deadline) {
        Thread.sleep(300)
        seen = handshakeSerial(port)
      }
      assert(seen == serialOf(ksB), "new handshake still presents the old certificate")
    } finally server.stop()
  }
}
