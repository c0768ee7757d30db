package graft.formats

import org.apache.avro.Schema
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

/** HTTP schema-registry client speaking the public Apicurio Registry
  * v2 REST protocol — the second registry dialect the reference
  * integrates (DebeziumServerWithApicurioIT.java;
  * [[HttpSchemaRegistryClient]] is the Confluent dialect) behind the
  * same [[AvroFormat.SchemaRegistryClient]] seam.
  *
  *  - register: `POST /groups/{group}/artifacts?ifExists=RETURN_OR_UPDATE&canonical=true`
  *    with headers `X-Registry-ArtifactId: <subject>` and
  *    `Content-Type: application/json; artifactType=AVRO`, body = the
  *    RAW schema JSON (no Confluent-style `{"schema": ...}` wrapper)
  *    → artifact metadata JSON carrying `contentId` (and `globalId`);
  *  - byId: `GET /ids/contentIds/{id}` → the raw schema document.
  *
  * Ids are CONTENT ids (`apicurio.registry.use-id=contentId` in the
  * serde's terms): the same canonical schema registered under two
  * subjects shares one id, which is the dedup-friendly choice for a
  * fleet of per-table subjects with identical envelope schemas.
  * Framing on the wire is either Confluent-compat 4-byte
  * ([[AvroFormat.framedEncoder]]) or Apicurio-legacy 8-byte
  * ([[AvroFormat.framedEncoderApicurioLegacy]]). Driver-side only:
  * one registration at configure time, cached id resolution
  * consumer-side — no registry traffic on the per-record path.
  */
final class ApicurioRegistryClient(baseUrl: String,
                                   group: String = "default",
                                   timeoutMs: Long = 10000)
    extends AvroFormat.SchemaRegistryClient {

  private val http = HttpClient.newHttpClient()
  private val base = baseUrl.stripSuffix("/")
  private val byIdCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Schema]()

  private def pathEnc(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8).replace("+", "%20")

  override def register(subject: String, schema: Schema): Int = {
    val uri = URI.create(s"$base/groups/${pathEnc(group)}/artifacts" +
      "?ifExists=RETURN_OR_UPDATE&canonical=true")
    val node = graft.sources.cdc.JsonRows.parse(
      send(HttpRequest.newBuilder(uri)
        .timeout(java.time.Duration.ofMillis(timeoutMs))
        .header("X-Registry-ArtifactId", subject)
        .header("Content-Type", "application/json; artifactType=AVRO")
        .POST(HttpRequest.BodyPublishers.ofString(schema.toString)).build()))
    val cid = node.get("contentId")
    require(cid != null, s"apicurio register: no contentId in ${node.toString.take(200)}")
    cid.asInt()
  }

  override def byId(id: Int): Schema =
    byIdCache.computeIfAbsent(Integer.valueOf(id), { _ =>
      new Schema.Parser().parse(
        send(HttpRequest.newBuilder(URI.create(s"$base/ids/contentIds/$id"))
          .timeout(java.time.Duration.ofMillis(timeoutMs))
          .GET().build()))
    })

  private def send(req: HttpRequest): String = {
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new IllegalStateException(
        s"apicurio registry ${req.uri()} → HTTP ${resp.statusCode()}: ${resp.body()}")
    resp.body()
  }
}
