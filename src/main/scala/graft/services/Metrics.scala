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
object Metrics {
  /** Name of the observed-metrics block [[observePipeline]] attaches. */
  val ObservationName = "graft_pipeline"

  /** Attach the reference's MBean observables to the record stream
    * (before shaping): max source ts_ms → MilliSecondsBehindSource
    * (DebeziumMetrics.java:146-153), snapshot-row count → snapshot
    * running/completed (:115-131). Computed by `observe` inside the
    * running query — zero extra passes. */
  def observePipeline(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    df.observe(ObservationName,
      max(col("value.source.ts_ms")).as("max_source_ts_ms"),
      count(when(col("value.source.snapshot") === "true", 1)).as("snapshot_rows"),
      count(lit(1)).as("rows"))
  }
}

final class GraftMetricsListener(clock: () => Long = System.currentTimeMillis)
    extends StreamingQueryListener {
  import GraftMetricsListener.QueryMetrics

  private val state = new ConcurrentHashMap[java.util.UUID, QueryMetrics]()

  override def onQueryStarted(e: QueryStartedEvent): Unit =
    state.put(e.id, QueryMetrics(Option(e.name).getOrElse(e.id.toString), 0, 0, 0, -1, running = true))

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    val prev = Option(state.get(p.id))
    // MilliSecondsBehindSource + snapshot phase from the observed block
    val obs = Option(p.observedMetrics.get(Metrics.ObservationName))
    val msBehind = obs.flatMap(r => Option(r.getAs[Any]("max_source_ts_ms")))
      .collect { case ts: Long => math.max(0L, clock() - ts) }
      .getOrElse(prev.map(_.msBehindSource).getOrElse(-1L))
    val snapRows = obs.map(_.getAs[Long]("snapshot_rows")).getOrElse(0L)
    val hadSnapshot = prev.exists(m => m.snapshotRunning || m.snapshotCompleted)
    // completed is sticky: once snapshot rows were seen and a batch
    // arrives without any, the snapshot phase is over
    val snapshotCompleted = prev.exists(_.snapshotCompleted) || (hadSnapshot && snapRows == 0)
    state.put(p.id, QueryMetrics(
      Option(p.name).getOrElse(p.id.toString),
      Option(p.inputRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
      Option(p.processedRowsPerSecond).filterNot(_.isNaN).getOrElse(0.0),
      p.numInputRows, p.batchId, running = true,
      msBehindSource = msBehind,
      snapshotRunning = snapRows > 0 && !snapshotCompleted,
      snapshotCompleted = snapshotCompleted))
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

object GraftMetricsListener {
  final case class QueryMetrics(name: String,
                                inputRowsPerSecond: Double,
                                processedRowsPerSecond: Double,
                                numInputRows: Long,
                                batchId: Long,
                                running: Boolean,
                                msBehindSource: Long = -1L,
                                snapshotRunning: Boolean = false,
                                snapshotCompleted: Boolean = false)
}
