package graft.formats

import org.apache.avro.Schema
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

/** HTTP schema-registry client speaking the public Confluent REST
  * wire protocol — the live counterpart of
  * [[AvroFormat.InMemorySchemaRegistry]] behind the same
  * [[AvroFormat.SchemaRegistryClient]] seam (the reference wires the
  * Confluent/Apicurio serdes the same way:
  * DebeziumServerWithSchemaRegistryIT.java,
  * DebeziumServerWithApicurioIT.java).
  *
  *  - register: `POST /subjects/{subject}/versions` with
  *    `{"schema": "<canonical avro json>"}` → `{"id": N}`
  *    (idempotent server-side: same schema text → same id)
  *  - byId:     `GET /schemas/ids/{id}` → `{"schema": "<json>"}`
  *
  * Both run DRIVER-side only: the producer registers once at
  * configure time ([[AvroFormat.framedEncoder]]), the consumer
  * resolves each id once and caches — no registry traffic on the
  * per-record path.
  */
final class HttpSchemaRegistryClient(baseUrl: String,
                                     timeoutMs: Long = 10000)
    extends AvroFormat.SchemaRegistryClient {

  private val http = HttpClient.newHttpClient()
  private val base = baseUrl.stripSuffix("/")
  private val byIdCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, Schema]()

  override def register(subject: String, schema: Schema): Int = {
    // URLEncoder does FORM encoding: a space becomes '+', which a
    // registry server decodes as a literal '+' in the path segment and
    // registers under the wrong subject — re-encode as %20.
    val enc = java.net.URLEncoder.encode(subject, StandardCharsets.UTF_8)
      .replace("+", "%20")
    val body = s"""{"schema":${jsonQuote(schema.toString)}}"""
    val node = graft.sources.cdc.JsonRows.parse(
      send(HttpRequest.newBuilder(URI.create(s"$base/subjects/$enc/versions"))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
        .header("Content-Type", "application/vnd.schemaregistry.v1+json")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build()))
    node.get("id").asInt()
  }

  override def byId(id: Int): Schema =
    byIdCache.computeIfAbsent(Integer.valueOf(id), { _ =>
      val node = graft.sources.cdc.JsonRows.parse(
        send(HttpRequest.newBuilder(URI.create(s"$base/schemas/ids/$id"))
          .timeout(java.time.Duration.ofMillis(timeoutMs))
          .GET().build()))
      new Schema.Parser().parse(node.get("schema").asText())
    })

  private def send(req: HttpRequest): String = {
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new IllegalStateException(
        s"schema registry ${req.uri()} → HTTP ${resp.statusCode()}: ${resp.body()}")
    resp.body()
  }

  private def jsonQuote(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
