package graft.sinks

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** HTTP sink authentication flows — the reference's three authenticator
  * families (debezium-server-http):
  *
  *  - JWT with refresh-token lifecycle (jwt/JWTAuthenticator.java):
  *    authenticate once with username/password, then REFRESH with the
  *    refresh token before the access token expires;
  *  - OAuth2 client-credentials (oauth2/OAuth2Authenticator.java):
  *    POST client_id/client_secret to the token endpoint, cache the
  *    access token until near expiry;
  *  - Standard Webhooks HMAC signing
  *    (webhooks/StandardWebhooksAuthenticator.java): per-request
  *    `webhook-id` / `webhook-timestamp` / `webhook-signature` headers,
  *    signature = base64(HMAC-SHA256(secret, "id.timestamp.payload")).
  *
  * Each is an `HttpSink.authHeaders`-compatible provider; the token
  * flows are written against a pluggable `post` function so tests run
  * them against an in-process endpoint (and so no real client secrets
  * ever sit in test code).
  */
object HttpAuth {

  /** Minimal JSON field extraction for token responses. */
  private def field(json: String, name: String): Option[String] = {
    val m = ("\"" + java.util.regex.Pattern.quote(name) + "\"\\s*:\\s*(?:\"([^\"]*)\"|([0-9.]+))").r
    m.findFirstMatchIn(json).map(g => Option(g.group(1)).getOrElse(g.group(2)))
  }

  /** Shared token-endpoint POST (form-encoded), overridable in tests. */
  def defaultPost(url: String, form: Map[String, String]): String = {
    val body = form.map { case (k, v) =>
      java.net.URLEncoder.encode(k, "UTF-8") + "=" + java.net.URLEncoder.encode(v, "UTF-8")
    }.mkString("&")
    val client = HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(url))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"token endpoint ${resp.statusCode()}: ${resp.body().take(200)}")
    resp.body()
  }

  /** JWT authenticate-then-refresh lifecycle. Thread-safe; refreshes
    * `earlySkewMs` before expiry like the reference's
    * renewal-before-expiry window. */
  final class Jwt(authUrl: String, username: String, password: String,
                  earlySkewMs: Long = 30000L,
                  post: (String, Map[String, String]) => String = defaultPost,
                  clock: () => Long = System.currentTimeMillis)
      extends (() => Map[String, String]) with Serializable {
    @transient private var access: String = _
    @transient private var refresh: String = _
    @transient private var expiresAt: Long = 0L

    override def apply(): Map[String, String] = synchronized {
      val now = clock()
      if (access == null || refresh == null) authenticate(now)
      else if (now >= expiresAt - earlySkewMs) refreshToken(now)
      Map("Authorization" -> s"Bearer $access")
    }

    private def take(json: String, now: Long): Unit = {
      access = field(json, "access_token").getOrElse(
        throw new RuntimeException("token response missing access_token"))
      refresh = field(json, "refresh_token").getOrElse(refresh)
      val ttlSec = field(json, "expires_in").map(_.toDouble.toLong).getOrElse(300L)
      expiresAt = now + ttlSec * 1000L
    }
    private def authenticate(now: Long): Unit =
      take(post(authUrl, Map("username" -> username, "password" -> password)), now)
    private def refreshToken(now: Long): Unit =
      try take(post(authUrl, Map("grant_type" -> "refresh_token", "refresh_token" -> refresh)), now)
      catch { case _: Exception => authenticate(now) } // expired refresh → full re-auth
  }

  /** OAuth2 client-credentials grant with token caching. */
  final class OAuth2ClientCredentials(tokenUrl: String, clientId: String, clientSecret: String,
                                      scope: Option[String] = None,
                                      earlySkewMs: Long = 30000L,
                                      post: (String, Map[String, String]) => String = defaultPost,
                                      clock: () => Long = System.currentTimeMillis)
      extends (() => Map[String, String]) with Serializable {
    @transient private var access: String = _
    @transient private var expiresAt: Long = 0L

    override def apply(): Map[String, String] = synchronized {
      val now = clock()
      if (access == null || now >= expiresAt - earlySkewMs) {
        val form = Map("grant_type" -> "client_credentials",
          "client_id" -> clientId, "client_secret" -> clientSecret) ++
          scope.map("scope" -> _)
        val json = post(tokenUrl, form)
        access = field(json, "access_token").getOrElse(
          throw new RuntimeException("token response missing access_token"))
        expiresAt = now + field(json, "expires_in").map(_.toDouble.toLong).getOrElse(300L) * 1000L
      }
      Map("Authorization" -> s"Bearer $access")
    }
  }

  /** Standard Webhooks HMAC-SHA256 signer. The signature covers
    * "<id>.<timestamp>.<payload>" and is emitted as `v1,<base64>`. */
  final class StandardWebhooksSigner(secretBase64: String,
                                     idGen: () => String = () =>
                                       java.util.UUID.randomUUID().toString,
                                     clock: () => Long = System.currentTimeMillis)
      extends Serializable {
    def headersFor(payload: String): Map[String, String] = {
      val id = s"msg_${idGen()}"
      val ts = (clock() / 1000L).toString
      Map("webhook-id" -> id, "webhook-timestamp" -> ts,
          "webhook-signature" -> s"v1,${sign(s"$id.$ts.$payload")}")
    }
    def sign(toSign: String): String = {
      val mac = Mac.getInstance("HmacSHA256")
      mac.init(new SecretKeySpec(Base64.getDecoder.decode(secretBase64), "HmacSHA256"))
      Base64.getEncoder.encodeToString(mac.doFinal(toSign.getBytes(StandardCharsets.UTF_8)))
    }
  }

  /** Knative sink-binding resolution: the endpoint comes from the
    * `K_SINK` env when present (HttpChangeConsumer.java:96-103). */
  def resolveEndpoint(configured: Option[String],
                      env: Map[String, String] = sys.env): String =
    env.get("K_SINK").orElse(configured).getOrElse(
      throw new IllegalArgumentException("no HTTP endpoint: set debezium.sink.http.url or K_SINK"))

  /** Content type from the configured value format
    * (HttpChangeConsumer.java:105-111). */
  def contentTypeFor(valueFormat: String): String = valueFormat match {
    case "avro" | "binary" | "jsonbytearray" => "application/octet-stream"
    case "cloudevents"                       => "application/cloudevents+json"
    case _                                   => "application/json"
  }
}
