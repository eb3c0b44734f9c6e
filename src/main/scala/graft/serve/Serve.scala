package graft.serve

import org.apache.spark.sql.SparkSession

/** Deployment entrypoint — the reference binary's boot sequence
  * (ref src/main.go:20-62: read ProcessMode, start the broker when the
  * mode wants one, mount the router, serve TLS when cert files are set).
  *
  * Environment (reference config names where they exist):
  *   GRAFT_MODE        ProcessMode (default hybrid; "broker" = no router)
  *   GRAFT_PORT        router port (default 8085, ref config PORT)
  *   GRAFT_DATA_DIR    topic-table base directory (default ./graft-data)
  *   GRAFT_CERT_FILE   PKCS12 keystore → HTTPS + hot reload (O-32)
  *   GRAFT_CERT_PASS   keystore password
  *   GRAFT_JWT_KEY / GRAFT_JWT_PUB   RSA PEM paths (ref NewRSAKeyPair);
  *                     absent = fresh in-memory keypair
  *
  * `sbt "runMain graft.serve.Serve"` boots the full stack on local[*];
  * in a real deployment the same wiring runs under spark-submit against
  * a cluster master.
  */
object Serve {
  def main(args: Array[String]): Unit = {
    val mode = sys.env.getOrElse("GRAFT_MODE", "hybrid")
    require(RunMode.isValid(mode), s"unsupported server mode $mode") // ref main.go:36

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-beam")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val topics = new graft.topics.TopicTable(spark,
      sys.env.getOrElse("GRAFT_DATA_DIR", "graft-data"))
    val store = new graft.store.CompactedLogStore(spark,
      sys.env.getOrElse("GRAFT_CONFIG_DIR", "graft-config"))

    val engine =
      if (RunMode.brokerRequired(mode)) {
        val e = new graft.streaming.WebhookEngine(spark, topics, store)
        e.reconcile() // O-14: start queries for Activated webhooks
        Some(e)
      } else None

    val server =
      if (RunMode.routerRequired(mode)) {
        val keys = (sys.env.get("GRAFT_JWT_KEY"), sys.env.get("GRAFT_JWT_PUB")) match {
          case (Some(priv), Some(pub)) => Jwt.loadKeyPair(priv, pub)
          case _                       => Jwt.generateKeyPair()
        }
        val tls = sys.env.get("GRAFT_CERT_FILE").map(ks =>
          (ks, sys.env.getOrElse("GRAFT_CERT_PASS", "").toCharArray))
        val s = new BeamServer(topics, store, keys,
          port = sys.env.getOrElse("GRAFT_PORT", "8085").toInt, // ref PORT default
          tls = tls, mode = mode)
        s.start()
        println(s"graft beam serving mode=$mode port=${s.boundPort}" +
          (if (tls.isDefined) " (TLS + hot reload)" else ""))
        Some(s)
      } else None

    sys.addShutdownHook {
      server.foreach(_.stop())
      engine.foreach(_.stopAll())
      spark.stop()
    }
    // ref main.go:57-61 parks on a channel / blocks in ListenAndServe;
    // HttpServer's cached-pool threads are idle-reaped, so park the main
    // thread unconditionally to keep the process alive
    while (true) Thread.sleep(60000)
  }
}
