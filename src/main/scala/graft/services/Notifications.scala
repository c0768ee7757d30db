package graft.services

import java.nio.file.{Files, Path}
import java.util.concurrent.CopyOnWriteArrayList
import scala.jdk.CollectionConverters._

/** Notifications — the upstream engine's progress-reporting path the
  * reference exposes via config pass-through (the server forwards all
  * `debezium.source.*` keys to the engine,
  * DebeziumServerConfigSourceFactory.java:127-135; the engine's public
  * notification surface is `notification.enabled.channels` with
  * channels `log` / `sink` / `jmx`, and incremental snapshots report
  * STARTED / IN_PROGRESS / TABLE_SCAN_COMPLETED / COMPLETED / ABORTED /
  * PAUSED / RESUMED under aggregate type "Incremental Snapshot").
  *
  * Spark rebuild: a notification is a small control-plane record —
  * never a data-plane row — so channels are driver-side and cheap.
  * The `sink` channel is durable (file-per-notification, same
  * pattern as [[Signals.Channel]]) so an external operator can tail
  * progress without touching the running query.
  */
object Notifications {
  final case class Notification(id: String,
                                aggregateType: String,
                                `type`: String,
                                additionalData: Map[String, String],
                                timestamp: Long)

  val AggregateIncrementalSnapshot = "Incremental Snapshot"
  val AggregateInitialSnapshot = "Initial Snapshot"

  trait Channel {
    def send(n: Notification): Unit
    def close(): Unit = ()
  }

  /** `log` channel — one INFO line per notification. */
  final class LogChannel extends Channel {
    private val log = org.slf4j.LoggerFactory.getLogger(classOf[LogChannel])
    override def send(n: Notification): Unit =
      log.info(s"[notification] ${json(n)}")
  }

  /** `sink` channel — durable file-per-notification under `dir`,
    * atomic rename like [[Signals.Channel]]. `poll()` consumes. */
  final class SinkChannel(dir: Path) extends Channel {
    Files.createDirectories(dir)
    private val seq = new java.util.concurrent.atomic.AtomicLong()

    override def send(n: Notification): Unit = {
      val tmp = Files.createTempFile(dir, "ntf-", ".tmp")
      Files.writeString(tmp, json(n))
      Files.move(tmp, dir.resolve(
        f"ntf-${n.timestamp}%020d-${seq.getAndIncrement()}%06d.json"))
    }

    /** Read and CONSUME pending notifications, oldest first. */
    def poll(): Seq[Notification] = {
      val files = graft.Fs.children(dir)
        .filter(_.getFileName.toString.endsWith(".json")).sortBy(_.toString)
      files.map { f =>
        val n = graft.sources.cdc.JsonRows.parse(Files.readString(f))
        Files.delete(f)
        def t(k: String) =
          Option(n.get(k)).filterNot(_.isNull).map(_.asText()).getOrElse("")
        val extra = Option(n.get("additional_data")).filterNot(_.isNull)
          .map(_.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap)
          .getOrElse(Map.empty[String, String])
        Notification(t("id"), t("aggregate_type"), t("type"), extra,
          Option(n.get("timestamp")).map(_.asLong()).getOrElse(0L))
      }
    }
  }

  /** In-memory channel for specs and embedded use. */
  final class MemoryChannel extends Channel {
    private val buf = new CopyOnWriteArrayList[Notification]()
    override def send(n: Notification): Unit = buf.add(n)
    def all: Seq[Notification] = buf.asScala.toSeq
  }

  /** Fan-out dispatcher over the enabled channels
    * (`notification.enabled.channels`, comma-separated; unknown names
    * fail at startup like every other config error in the pipeline). */
  final class Dispatcher(channels: Seq[Channel]) {
    private val ids = new java.util.concurrent.atomic.AtomicLong()
    def emit(aggregateType: String, `type`: String,
             additionalData: Map[String, String] = Map.empty): Notification = {
      val n = Notification(s"ntf-${ids.getAndIncrement()}", aggregateType,
        `type`, additionalData, System.currentTimeMillis())
      channels.foreach(_.send(n))
      n
    }
    def close(): Unit = channels.foreach(_.close())
  }

  object Dispatcher {
    /** No channels enabled — emits are dropped (engine default). */
    val disabled = new Dispatcher(Nil)
  }

  /** Build from `debezium.source.notification.enabled.channels` +
    * `…notification.sink.topic.name` (here: a directory path for the
    * durable channel). */
  def fromProperties(props: Map[String, String],
                     memory: Option[MemoryChannel] = None): Dispatcher = {
    val enabled = props.getOrElse("debezium.source.notification.enabled.channels", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val channels = enabled.map {
      case "log" => new LogChannel
      case "sink" =>
        val dir = props.getOrElse("debezium.source.notification.sink.topic.name",
          sys.error("notification channel 'sink' needs " +
            "debezium.source.notification.sink.topic.name (a directory)"))
        new SinkChannel(java.nio.file.Paths.get(dir))
      case "memory" => memory.getOrElse(sys.error(
        "notification channel 'memory' needs an injected MemoryChannel"))
      case other => sys.error(s"unknown notification channel '$other' " +
        "(supported: log, sink, memory)")
    }
    new Dispatcher(channels)
  }

  private def json(n: Notification): String = {
    val extra = n.additionalData.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    s"""{"id":${q(n.id)},"aggregate_type":${q(n.aggregateType)},""" +
      s""""type":${q(n.`type`)},"additional_data":$extra,""" +
      s""""timestamp":${n.timestamp}}"""
  }
  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
}
