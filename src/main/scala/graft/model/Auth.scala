package graft.model

/** Tenant authorization predicate (SURVEY.md §2 O-25;
  * ref src/route/handlers.go:375-421).
  *
  * A token subject is authorized for a topic when any comma-separated subject
  * value is a superrole, equals the topic's tenant, or — the suffix rule —
  * equals the tenant after dropping its last `-`-separated part
  * (`ExtractEvalTenant`, ref src/route/handlers.go:407-421).
  */
object Auth {

  private val subDelimiter = "-"

  /** ref src/route/handlers.go:407-421: "tenant-client0" authorizes "tenant";
    * a delimiter-free subject never matches via this rule.
    */
  def extractEvalTenant(requiredSubject: String, tokenSub: String): Boolean = {
    val parts = tokenSub.split(subDelimiter, -1)
    val sub   = parts.dropRight(1).mkString(subDelimiter)
    sub.nonEmpty && requiredSubject == sub
  }

  /** ref src/route/handlers.go:389-404 VerifySubject. */
  def verifySubject(requiredSubject: String, tokenSubjects: String, superRoles: Set[String]): Boolean =
    tokenSubjects.split(",", -1).exists { v =>
      superRoles.contains(v) || requiredSubject == v || extractEvalTenant(requiredSubject, v)
    }

  /** ref src/route/handlers.go:375-387 VerifySubjectBasedOnTopic — tenant is
    * part 3 (index 2) of `scheme://tenant/ns/topic`.
    */
  def verifySubjectForTopic(topicFn: String, tokenSub: String, superRoles: Set[String]): Boolean = {
    val parts = topicFn.split("/", -1)
    if (parts.length < 4) false
    else {
      val tenant = parts(2)
      tenant.nonEmpty && verifySubject(tenant, tokenSub, superRoles)
    }
  }
}
