package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

class HttpAuthSpec extends AnyFunSuite {

  test("jwt: authenticates once, refreshes before expiry, re-authenticates on dead refresh") {
    val calls = ArrayBuffer[Map[String, String]]()
    var now = 1000000L
    var refreshDead = false
    val post = (url: String, form: Map[String, String]) => {
      calls += form
      if (form.get("grant_type").contains("refresh_token")) {
        if (refreshDead) throw new RuntimeException("401")
        """{"access_token":"acc2","refresh_token":"ref2","expires_in":60}"""
      } else """{"access_token":"acc1","refresh_token":"ref1","expires_in":60}"""
    }
    val jwt = new HttpAuth.Jwt("http://auth", "u", "p", earlySkewMs = 10000L,
      post = post, clock = () => now)

    assert(jwt() == Map("Authorization" -> "Bearer acc1"))
    assert(jwt() == Map("Authorization" -> "Bearer acc1")) // cached, no extra call
    assert(calls.length == 1 && calls.head("username") == "u")

    now += 55000L // within skew window → refresh
    assert(jwt() == Map("Authorization" -> "Bearer acc2"))
    assert(calls.length == 2 && calls(1)("refresh_token") == "ref1")

    now += 55000L
    refreshDead = true // refresh fails → full re-auth
    assert(jwt() == Map("Authorization" -> "Bearer acc1"))
    assert(calls.length == 4 && calls(3).contains("username"))
  }

  test("oauth2 client-credentials: caches until near expiry") {
    val calls = ArrayBuffer[Map[String, String]]()
    var now = 0L
    var n = 0
    val post = (url: String, form: Map[String, String]) => {
      calls += form; n += 1
      s"""{"access_token":"tok$n","token_type":"bearer","expires_in":100}"""
    }
    val oauth = new HttpAuth.OAuth2ClientCredentials("http://token", "cid", "sec",
      scope = Some("cdc"), earlySkewMs = 10000L, post = post, clock = () => now)
    assert(oauth() == Map("Authorization" -> "Bearer tok1"))
    assert(oauth() == Map("Authorization" -> "Bearer tok1"))
    assert(calls.length == 1 && calls.head("grant_type") == "client_credentials"
      && calls.head("scope") == "cdc")
    now = 95000L // inside skew
    assert(oauth() == Map("Authorization" -> "Bearer tok2"))
  }

  test("standard webhooks: deterministic HMAC signature over id.timestamp.payload") {
    val secret = java.util.Base64.getEncoder.encodeToString("whsec-test-key".getBytes)
    val signer = new HttpAuth.StandardWebhooksSigner(secret,
      idGen = () => "fixed", clock = () => 1700000000000L)
    val h = signer.headersFor("""{"a":1}""")
    assert(h("webhook-id") == "msg_fixed")
    assert(h("webhook-timestamp") == "1700000000")
    // independently computed HMAC must match
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec("whsec-test-key".getBytes, "HmacSHA256"))
    val expected = java.util.Base64.getEncoder.encodeToString(
      mac.doFinal("""msg_fixed.1700000000.{"a":1}""".getBytes))
    assert(h("webhook-signature") == s"v1,$expected")
  }

  test("endpoint resolution prefers K_SINK; content type follows value format") {
    assert(HttpAuth.resolveEndpoint(Some("http://cfg"), Map.empty) == "http://cfg")
    assert(HttpAuth.resolveEndpoint(Some("http://cfg"), Map("K_SINK" -> "http://knative")) == "http://knative")
    intercept[IllegalArgumentException](HttpAuth.resolveEndpoint(None, Map.empty))
    assert(HttpAuth.contentTypeFor("json") == "application/json")
    assert(HttpAuth.contentTypeFor("avro") == "application/octet-stream")
    assert(HttpAuth.contentTypeFor("cloudevents") == "application/cloudevents+json")
  }
}
