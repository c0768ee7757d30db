package graft.services

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** REST signals — the reference's control path
  * (rest/signal/SignalResource.java:32-47: POST /api/signals
  * {id,type,data} → engine signaler, gated by `debezium.api.enabled`,
  * default OFF, DebeziumServerConfig.java:15-18).
  *
  * Spark rebuild (SURVEY.md §3.3): the endpoint appends signals to a
  * CONTROL DIRECTORY; the pipeline polls the channel between batches
  * (or a control loop acts on them) — the HTTP thread never touches
  * the running query directly, mirroring the reference's
  * HTTP-thread → engine-thread boundary.
  */
object Signals {
  final case class Signal(id: String, `type`: String, data: String)

  /** Durable file-per-signal channel. */
  final class Channel(dir: Path) {
    Files.createDirectories(dir)

    def send(s: Signal): Unit = {
      val json =
        s"""{"id":${q(s.id)},"type":${q(s.`type`)},"data":${q(s.data)}}"""
      val tmp = Files.createTempFile(dir, "sig-", ".tmp")
      Files.writeString(tmp, json)
      Files.move(tmp, dir.resolve(s"sig-${System.nanoTime()}-${s.id.hashCode.toHexString}.json"))
    }

    /** Read and CONSUME all pending signals, oldest first. */
    def poll(): Seq[Signal] = {
      val files = graft.Fs.children(dir)
        .filter(_.getFileName.toString.endsWith(".json")).sortBy(_.toString)
      files.map { f =>
        val n = graft.sources.cdc.JsonRows.parse(Files.readString(f))
        Files.delete(f)
        Signal(text(n, "id"), text(n, "type"), text(n, "data"))
      }
    }

    private def text(n: com.fasterxml.jackson.databind.JsonNode, f: String): String =
      Option(n.get(f)).filterNot(_.isNull).map(_.asText()).getOrElse("")
    private def q(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
  }

  /** Minimal JDK HTTP endpoint: POST /api/signals → channel. Disabled
    * by default like the reference; start() only when enabled. Returns
    * the bound port. */
  final class Server(channel: Channel, enabled: Boolean = false, port: Int = 0) {
    private var server: Option[HttpServer] = None

    def start(): Int = {
      require(enabled, "signals API is disabled (debezium.api.enabled=false)")
      val s = HttpServer.create(new InetSocketAddress(port), 0)
      s.createContext("/api/signals", new HttpHandler {
        override def handle(x: HttpExchange): Unit = {
          if (x.getRequestMethod == "POST") {
            val n = graft.sources.cdc.JsonRows.parse(new String(x.getRequestBody.readAllBytes()))
            def t(f: String) = Option(n.get(f)).filterNot(_.isNull).map(_.asText()).getOrElse("")
            channel.send(Signal(t("id"), t("type"), t("data")))
            x.sendResponseHeaders(202, -1)
          } else x.sendResponseHeaders(405, -1)
          x.close()
        }
      })
      s.start()
      server = Some(s)
      s.getAddress.getPort
    }
    def stop(): Unit = server.foreach(_.stop(0))
  }
}
