package graft.serve

/** O-33 run modes (ref src/util/main_control.go:6-46, src/main.go:38-62,
  * src/route/router.go:38-57): one deployment binary, seven modes choosing
  * which route groups the HTTP router mounts and whether the webhook broker
  * engine runs. The groups mirror the reference's Routes vars —
  * `receiver` = status/firehose/sse/poll, `rest` = topic CRUD,
  * `token` = /subject — with metrics + api-docs always mounted (the
  * reference's Prometheus/pprof routes are likewise unconditional).
  */
object RunMode {

  /** ref main_control.go:6-24 constants. */
  val All: Set[String] =
    Set("broker", "receiver", "http", "hybrid", "tokenserver", "http2", "rest")

  def isValid(mode: String): Boolean = All(mode)

  /** Broker (webhook engine) runs in broker|hybrid (ref :27-29) — callers
    * wire `WebhookEngine.reconcile()` behind this.
    */
  def brokerRequired(mode: String): Boolean = mode == "broker" || mode == "hybrid"

  /** Every mode but pure broker mounts the router (ref :32-35). */
  def routerRequired(mode: String): Boolean = mode != "broker"

  /** ref router.go:42-57 getRoutes — note `rest` is the default branch. */
  def routeGroups(mode: String): Set[String] = mode match {
    case "hybrid"      => Set("receiver", "rest")
    case "receiver"    => Set("receiver")
    case "http"        => Set("receiver", "rest", "token")
    case "http2"       => Set("receiver", "token")
    case "tokenserver" => Set("token")
    case _             => Set("rest")
  }
}
