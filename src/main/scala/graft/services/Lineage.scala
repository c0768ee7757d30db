package graft.services

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.nio.file.{Files, Path, StandardOpenOption}

/** OpenLineage-style run events for streaming pipelines — the
  * reference emits an output-dataset event per delivered batch
  * (DefaultChangeConsumer.java:79-100, kafka sink only); here every
  * query emits START on query start, RUNNING per progress (with input
  * sources and sink as datasets), COMPLETE/FAIL on termination, as
  * JSON lines in a spool directory (a real deployment posts them to an
  * OpenLineage endpoint instead of a file).
  */
final class LineageListener(spoolDir: Path,
                            clock: () => Long = System.currentTimeMillis)
    extends StreamingQueryListener {
  Files.createDirectories(spoolDir)

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    emit("START", Option(e.name).getOrElse(e.id.toString), e.runId.toString, Nil, None)

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    emit("RUNNING", Option(p.name).getOrElse(p.id.toString), p.runId.toString,
      p.sources.toSeq.map(_.description), Option(p.sink).map(_.description))
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
    emit(if (e.exception.isDefined) "FAIL" else "COMPLETE",
      e.id.toString, e.runId.toString, Nil, None)

  private def emit(eventType: String, job: String, runId: String,
                   inputs: Seq[String], output: Option[String]): Unit = {
    def q(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val json = s"""{"eventType":${q(eventType)},"eventTimeMs":${clock()},""" +
      s""""run":{"runId":${q(runId)}},"job":{"name":${q(job)}},""" +
      s""""inputs":[${inputs.map(q).mkString(",")}],""" +
      s""""outputs":[${output.map(q).toSeq.mkString(",")}]}"""
    val f = spoolDir.resolve("lineage.jsonl")
    // single-writer listener thread; append is ordered
    Files.writeString(f, json + "\n", StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}
