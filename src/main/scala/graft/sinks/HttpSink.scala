package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.services.{Retry, RetryPolicy}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** HTTP webhook sink — semantics of debezium-server-http
  * (HttpChangeConsumer.java): POST records to one endpoint, either one
  * request per record or a JSON-array batch `[v1,v2,...]`
  * (HttpChangeConsumer.java:155-199), with fixed-interval retry on
  * non-2xx (:143-149) and pluggable auth headers (JWT/OAuth2/HMAC in
  * the reference — here a header-provider function so tests can
  * exercise the flow without a token service).
  *
  * The JSON-array join happens distributed (per partition chunk) and
  * only the HTTP calls run on executors — but as a test sink we post
  * from the driver over collected chunks: batch sizes at the HTTP sink
  * are protocol-bounded (the reference chunks too), not data-bounded.
  */
final class HttpSink(endpoint: String,
                     batchMode: Boolean = true,
                     chunkSize: Int = 500,
                     retry: RetryPolicy = RetryPolicy(maxAttempts = 3, initialIntervalMs = 10),
                     authHeaders: () => Map[String, String] = () => Map.empty,
                     sleeper: Long => Unit = Thread.sleep)
    extends SinkConnector {

  override def name: String = "http"
  override def tombstoneSupport: Boolean = false

  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()

  override def validate(): Unit = {
    require(endpoint.startsWith("http"), s"bad endpoint $endpoint")
  }

  override def write(batch: DataFrame, epochId: Long): Unit = {
    val values = batch
      .select(to_json(col("value")).as("v"))
      .collect().map(_.getString(0))
    if (batchMode)
      values.grouped(chunkSize).foreach(chunk => post(chunk.mkString("[", ",", "]")))
    else
      values.foreach(post)
  }

  private def post(body: String): Unit =
    Retry(retry, sleeper) { _ =>
      val builder = HttpRequest.newBuilder(URI.create(endpoint))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body))
      authHeaders().foreach { case (k, v) => builder.header(k, v) }
      val resp = client.send(builder.build(), HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new RuntimeException(s"HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    }
}
