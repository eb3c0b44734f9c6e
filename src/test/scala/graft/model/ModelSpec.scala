package graft.model

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Mirrors the reference's unit coverage (SURVEY.md §5.2):
  * key derivation golden value (ref src/unit-test/handlers_test.go:75-77),
  * the O-25 subject-match truth table (ref handlers_test.go:221-240),
  * topic-name build∘parse round-trip, consumer-param defaults, validation.
  *
  * Property checks sample scalacheck generators with a fixed seed (the
  * scalatestplus bridge is not in the offline cache).
  */
class ModelSpec extends AnyFunSuite {

  /** 100 deterministic samples of `gen`. */
  private def samples[A](gen: Gen[A]): Seq[A] =
    (0 until 100).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  // --- Keys (O-21) ---

  test("genKey matches the reference golden SHA1") {
    // ref src/unit-test/handlers_test.go:75-77
    assert(Keys.keyFromNames(
      "persistent://picasso/local-useast1-gcp/yet-another-test-topic",
      "pulsar+ssl://useast1.gcp.kafkaesque.io:6651")
      == Right("075fcf0870662590aa4b24939287f193a697ab26"))
  }

  test("keyFromNames rejects blank names and bad urls") {
    // ref src/unit-test/handlers_test.go:79-81
    assert(Keys.keyFromNames(" ", " test ").isLeft)
    assert(Keys.keyFromNames("persistent://a/b/c", "http://host:6650").isLeft)
    assert(Keys.keyFromNames("persistent://a/b/c", "pulsar://host:6650").isRight)
  }

  test("key derivation is injective on distinct (name, url) concats") {
    val gen = for {
      a <- Gen.alphaNumStr.suchThat(_.nonEmpty)
      b <- Gen.alphaNumStr.suchThat(_.nonEmpty)
    } yield (a, b)
    val xs = samples(gen)
    for (x <- xs; y <- xs.take(20) if x._1 + x._2 != y._1 + y._2)
      assert(Keys.genKey(x._1, x._2) != Keys.genKey(y._1, y._2))
  }

  // --- TopicName (O-22) ---

  test("build accepts aliases and parse round-trips") {
    assert(TopicName.build("p", "t", "ns", "top") == Right("persistent://t/ns/top"))
    assert(TopicName.build("np", "t", "ns", "top") == Right("non-persistent://t/ns/top"))
    assert(TopicName.build("bogus", "t", "ns", "top").isLeft)
    val segment = Gen.alphaNumStr.suchThat(_.nonEmpty)
    for {
      t   <- samples(segment)
      ns  <- samples(segment).take(3)
      top <- samples(segment).take(3)
    } {
      val Right(fn) = TopicName.build("persistent", t, ns, top)
      assert(TopicName.parse(fn) == Right(TopicName.Parts(true, t, ns, top)))
    }
  }

  test("parse tolerates 2-part names and rejects malformed ones") {
    assert(TopicName.parse("persistent://t/ns") == Right(TopicName.Parts(true, "t", "ns", "")))
    assert(TopicName.parse("t/ns/topic").isLeft)
    assert(TopicName.parse("persistent://only-tenant").isLeft)
  }

  // --- Auth (O-25) — truth table from ref handlers_test.go:221-240 ---

  test("subject match truth table") {
    def v(topic: String, sub: String, roles: Set[String] = Set.empty) =
      Auth.verifySubjectForTopic(topic, sub, roles)
    val topic = "persistent://picasso/local-useast1-gcp/yet-another-test-topic"
    assert(!v("picasso", "picasso"))
    assert(v("persistent://picasso/local-useast1-gcp", "picasso"))
    assert(!v("picasso/local-useast1-gcp/yet-another-test-topic", "picasso"))
    assert(v(topic, "picasso"))
    assert(v("persistent://picasso-monet/local-useast1-gcp/yet-another-test-topic", "picasso-monet"))
    assert(v("persistent://picasso-monet/local-useast1-gcp/yet-another-test-topic", "picasso-monet-1234"))
    assert(!v(topic, "myadmin"))
    assert(v(topic, "picasso-1234"))
    assert(v(topic, "picasso-1234,myadmin"))
    assert(!v(topic, "picaso-1234,myadmin"))
    assert(!v(topic, "superuser"))
    assert(v(topic, "superuser", Set("superuser", "admin")))
    assert(v(topic, "admin", Set("superuser", "admin")))
  }

  // --- ConsumerParams (O-9) ---

  test("consumer param defaults and rejection") {
    assert(ConsumerParams.subscriptionType("") == Right("exclusive"))
    assert(ConsumerParams.subscriptionType("KeyShared") == Right("keyshared"))
    assert(ConsumerParams.subscriptionType("nope").isLeft)
    assert(ConsumerParams.initialPosition("") == Right("latest"))
    assert(ConsumerParams.initialPosition("Earliest") == Right("earliest"))
    assert(ConsumerParams.initialPosition("middle").isLeft)
    assert(ConsumerParams.subscriptionName("abcd").isLeft) // < 5 chars (ref handlers.go:457-458)
    assert(ConsumerParams.subscriptionName("abcde") == Right("abcde"))
    val Right(generated) = ConsumerParams.subscriptionName("")
    assert(generated.startsWith(ConsumerParams.NonResumablePrefix))
  }

  // --- Validation (O-23) ---

  private def wh(url: String = "http://example.com/hook", sub: String = "sub-ok",
      subType: String = "exclusive") =
    WebhookConfig(url, Nil, sub, subType, "latest", Status.Activated)

  test("webhook validation enforces url, sub name, and exclusive uniqueness") {
    assert(Validation.validateWebhooks(Seq(wh())).isRight)
    assert(Validation.validateWebhooks(Seq(wh(url = "not a url"))).isLeft)
    assert(Validation.validateWebhooks(Seq(wh(sub = " "))).isLeft)
    // duplicate exclusive sub rejected; shared duplicate allowed (ref topic.go:161-178)
    assert(Validation.validateWebhooks(Seq(wh(), wh())).isLeft)
    assert(Validation.validateWebhooks(
      Seq(wh(subType = "shared"), wh(subType = "shared"))).isRight)
  }

  test("topic config validation derives the key") {
    val cfg = TopicConfig(
      "persistent://picasso/local-useast1-gcp/yet-another-test-topic", "", "picasso",
      "", "", Status.Activated, "pulsar+ssl://useast1.gcp.kafkaesque.io:6651", Seq(wh()))
    assert(Validation.validateTopicConfig(cfg)
      == Right("075fcf0870662590aa4b24939287f193a697ab26"))
  }
}
