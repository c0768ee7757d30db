package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
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
  * Fully distributed: the JSON serialization is Column algebra and the
  * POSTs run on EXECUTORS via foreachPartition — one HttpClient per
  * partition, chunked bodies, no driver collect (at 100 TB the driver
  * never sees a record). Record order is preserved within a partition,
  * matching the reference's per-batch ordering guarantee, which is
  * per-key once upstream routing keys the partitions.
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

  override def validate(): Unit = {
    require(endpoint.startsWith("http"), s"bad endpoint $endpoint")
  }

  override def write(batch: DataFrame, epochId: Long): Unit = {
    // capture only serializable leaves, not `this`
    val (ep, bm, cs, rp, ah, sl) = (endpoint, batchMode, chunkSize, retry, authHeaders, sleeper)
    batch.select(to_json(col("value")).as("v"))
      .foreachPartition { (rows: Iterator[Row]) =>
        if (rows.hasNext) {
          val client = HttpClient.newBuilder()
            .connectTimeout(Duration.ofSeconds(10)).build()
          val values = rows.map(_.getString(0))
          if (bm) values.grouped(cs).foreach(chunk =>
            HttpSink.post(client, ep, chunk.mkString("[", ",", "]"), rp, ah, sl))
          else values.foreach(v => HttpSink.post(client, ep, v, rp, ah, sl))
        }
      }
  }
}

object HttpSink {
  private[sinks] def post(client: HttpClient, endpoint: String, body: String,
                          retry: RetryPolicy, authHeaders: () => Map[String, String],
                          sleeper: Long => Unit): Unit =
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
