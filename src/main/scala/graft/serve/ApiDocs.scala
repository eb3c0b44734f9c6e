package graft.serve

import graft.store.{Json => J}

/** API contract surface (ref src/docs/api.go:8-176 — swagger annotations
  * per route documenting params and status codes, served by the reference
  * as a swagger spec). Here the route table is data: one descriptor per
  * BeamServer route, rendered as a minimal OpenAPI-3-shaped JSON document
  * at GET /api-docs. ServeSpec cross-checks the table against the live
  * server, so the doc can't drift from the implementation silently.
  */
object ApiDocs {

  final case class Param(name: String, in: String, desc: String, required: Boolean = false)
  final case class Route(
      method: String,
      path: String,
      summary: String,
      auth: String, // "none" | "jwt" | "jwt-superrole" | "header-presence"
      params: Seq[Param],
      responses: Map[Int, String])

  private val consumerParams = Seq(
    Param("SubscriptionName", "query",
      "subscription name, min 5 chars; absent = fresh non-resumable (lowercase alias: subscriptionName)"),
    Param("SubscriptionType", "query",
      "exclusive | shared | keyshared | failover, default exclusive (alias: subscriptionType)"),
    Param("SubscriptionInitialPosition", "query",
      "latest | earliest, default latest (alias: initialPosition)"))

  val routes: Seq[Route] = Seq(
    Route("GET", "/status", "liveness probe", "header-presence", Nil,
      Map(200 -> "ok", 401 -> "missing Authorization header")),
    Route("GET", "/metrics", "Prometheus text metrics (O-34)", "none", Nil,
      Map(200 -> "text/plain exposition")),
    Route("GET", "/api-docs", "this document", "none", Nil,
      Map(200 -> "OpenAPI-shaped JSON")),
    Route("GET", "/debug/threads", "JVM thread dump (pprof analog)", "jwt-superrole", Nil,
      Map(200 -> "text/plain dump", 401 -> "bad/missing JWT", 403 -> "caller not a superrole")),
    Route("GET", "/debug/profile", "sampling CPU profile, hottest frames first (pprof -top analog)",
      "jwt-superrole",
      Seq(Param("seconds", "query", "sampling window, clamped to 1-10 (default 1)")),
      Map(200 -> "text/plain frame counts", 401 -> "bad/missing JWT",
        403 -> "caller not a superrole")),
    Route("GET", "/debug/heap", "heap/pool/GC MXBean report (pprof heap-summary analog)",
      "jwt-superrole", Nil,
      Map(200 -> "JSON usage report", 401 -> "bad/missing JWT",
        403 -> "caller not a superrole")),
    Route("POST", "/v1/firehose", "ingest a message; topic from TopicFn header", "none",
      Seq(Param("TopicFn", "header", "full topic name", required = true),
        Param("PulsarUrl", "header", "target cluster; must be in the allowed list"),
        Param("includeHeaders", "query", "any value but 'false' wraps payload in the headers envelope"),
        Param("mode", "query", "async = fire-and-forget (default sync)")),
      Map(200 -> "published", 401 -> "receiver header rejected",
        422 -> "missing TopicFn / empty body")),
    Route("POST", "/v2/firehose/{persistent}/{tenant}/{namespace}/{topic}",
      "ingest a message into the route's topic (TopicFn header overrides)", "jwt",
      Seq(Param("TopicFn", "header", "overrides the route topic"),
        Param("PulsarUrl", "header", "target cluster; must be in the allowed list"),
        Param("includeHeaders", "query", "headers envelope opt-in"),
        Param("mode", "query", "async = fire-and-forget")),
      Map(200 -> "published", 401 -> "bad/missing JWT", 403 -> "tenant mismatch",
        422 -> "bad topic name / empty body")),
    Route("GET", "/v2/poll/{persistent}/{tenant}/{namespace}/{topic}",
      "destructive bounded poll (per-subscription cursor)", "jwt",
      Param("batchSize", "query", "max messages (default 10)") +:
        Param("perMessageTimeoutMs", "query", "wait this long for each next message before returning the batch (default 300; 0 = immediate)") +:
        consumerParams,
      Map(200 -> "message batch", 204 -> "no messages", 401 -> "bad/missing JWT",
        403 -> "tenant mismatch", 422 -> "bad topic/params")),
    Route("GET", "/v2/sse/{persistent}/{tenant}/{namespace}/{topic}",
      "server-sent-events stream of new messages", "jwt", consumerParams,
      Map(200 -> "text/event-stream frames", 401 -> "bad/missing JWT",
        403 -> "tenant mismatch", 422 -> "bad topic/params")),
    Route("GET", "/v2/topic/{key}", "fetch a topic config by key", "jwt", Nil,
      Map(200 -> "config", 401 -> "bad/missing JWT", 403 -> "not your tenant",
        404 -> "unknown key")),
    Route("GET", "/v2/topic", "fetch by {topicFullName, pulsarURL} body", "jwt",
      Seq(Param("body", "body", "{topicFullName, pulsarURL}", required = true)),
      Map(200 -> "config", 401 -> "bad/missing JWT", 403 -> "not your tenant",
        404 -> "unknown key", 422 -> "missing names")),
    Route("POST", "/v2/topic", "create/update a topic config (webhooks included)", "jwt",
      Seq(Param("body", "body", "TopicConfig JSON", required = true)),
      Map(201 -> "stored", 401 -> "bad/missing JWT", 403 -> "not your tenant",
        422 -> "invalid config")),
    Route("DELETE", "/v2/topic/{key}", "delete a topic config by key", "jwt", Nil,
      Map(200 -> "deleted", 401 -> "bad/missing JWT", 403 -> "not your tenant",
        404 -> "unknown key")),
    Route("DELETE", "/v2/topic", "delete by {topicFullName, pulsarURL} body", "jwt",
      Seq(Param("body", "body", "{topicFullName, pulsarURL}", required = true)),
      Map(200 -> "deleted", 401 -> "bad/missing JWT", 403 -> "not your tenant",
        404 -> "unknown key", 422 -> "missing names")),
    Route("GET", "/subject/{subject}", "mint a JWT for a subject", "jwt-superrole", Nil,
      Map(200 -> "token", 401 -> "bad/missing JWT", 403 -> "caller not a superrole")))

  /** OpenAPI-3-shaped JSON (paths → method → summary/auth/params/responses). */
  lazy val json: String = {
    val paths = routes.groupBy(_.path).toSeq.sortBy(_._1).map { case (path, rs) =>
      path -> J.obj(rs.sortBy(_.method).map { r =>
        r.method.toLowerCase -> J.obj(
          "summary"   -> J.str(r.summary),
          "security"  -> J.str(r.auth),
          "parameters" -> J.arr(r.params.map(p => J.obj(
            "name" -> J.str(p.name), "in" -> J.str(p.in),
            "required" -> (if (p.required) "true" else "false"),
            "description" -> J.str(p.desc)))),
          "responses" -> J.obj(r.responses.toSeq.sortBy(_._1).map {
            case (code, desc) => code.toString -> J.obj("description" -> J.str(desc))
          }: _*))
      }: _*)
    }
    J.obj(
      "openapi" -> J.str("3.0.0"),
      "info" -> J.obj("title" -> J.str("graft beam API"), "version" -> J.str("v2")),
      "paths" -> J.obj(paths: _*))
  }
}
