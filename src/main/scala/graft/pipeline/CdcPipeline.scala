package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.model.Envelope
import graft.operators.EventShaping
import graft.sinks.SinkConnector
import graft.sources.EnvelopeLogSource

/** Pipeline assembly — the Spark rebuild of the reference's boot path
  * (SURVEY.md §3.1): config → source → SMT chain → sink, where the
  * engine's offset store becomes the Spark checkpoint and the batch
  * handler boundary becomes foreachBatch.
  *
  * Property names keep `debezium.*` shapes for parity
  * (FIXTURES.md §4); the per-stream schemas are passed programmatically
  * (per-record schema variance collapses to per-stream, SURVEY.md §1.4).
  */
final case class PipelineSpec(
    sourcePath: String,
    keySchema: StructType,
    rowSchema: StructType,
    sink: SinkConnector,
    transforms: Seq[EventShaping.Smt] = Nil,
    tableIncludeList: Seq[String] = Nil,
    streamNameMapper: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = None,
    checkpointDir: Option[String] = None,
    maxFilesPerTrigger: Option[Int] = None,
    /** "envelope-log" (JSON-lines replay) or "graft-cdc" (the DSv2
      * snapshot+WAL source with LSN offsets). */
    sourceType: String = "envelope-log",
    /** The reference's `snapshot.mode`: `initial` (default) /
      * `when_needed` — snapshot data on first start; `no_data` /
      * `never` / `schema_only` — record the start point only,
      * existing rows are never delivered; `initial_only` — snapshot,
      * then no streaming phase. */
    snapshotMode: String = "initial")

object PipelineSpec {
  /** Build from debezium-style properties + schemas + sink registry.
    * Mirrors the config assembly in
    * DebeziumServerConfigSourceFactory.java:74-155; the SMT chain
    * comes from `debezium.transforms.*` via SmtFactory. */
  def fromProperties(props: Map[String, String],
                     keySchema: StructType, rowSchema: StructType,
                     registry: graft.sinks.SinkRegistry): PipelineSpec = {
    val sinkType = props.getOrElse("debezium.sink.type",
      throw new IllegalArgumentException("debezium.sink.type is required"))
    PipelineSpec(
      sourcePath = props.getOrElse("debezium.source.path",
        throw new IllegalArgumentException("debezium.source.path is required")),
      keySchema = keySchema,
      rowSchema = rowSchema,
      sink = registry.resolve(sinkType),
      transforms = graft.operators.SmtFactory.fromProperties(props),
      tableIncludeList = props.get("debezium.source.table.include.list")
        .map(_.split(",").map(_.trim).toSeq).getOrElse(Nil),
      checkpointDir = props.get("debezium.checkpoint.dir"),
      sourceType = props.getOrElse("debezium.source.type", "envelope-log"),
      snapshotMode = props.getOrElse("debezium.source.snapshot.mode", "initial"))
  }

  /** Boot from a provider-resolved config ([[PipelineConfig.load]]):
    * the spec is assembled from the RESOLVED properties — placeholders
    * like `${file:…:password}` already swapped for their secrets — so
    * a deployment's credentials never sit in the property map that
    * configured the JVM, and the paired `masked` view is the only
    * rendering observability may print. This is the reference's whole
    * configuration story end-to-end: MicroProfile sources →
    * config-provider indirection → engine boot
    * (DebeziumServerConfigProvidersIT.java:39). */
  def fromResolved(r: ResolvedConfig,
                   keySchema: StructType, rowSchema: StructType,
                   registry: graft.sinks.SinkRegistry): PipelineSpec =
    fromProperties(r.props, keySchema, rowSchema, registry)
}

object CdcPipeline {

  /** The shared shaping applied between source and sink: heartbeat
    * skip always (heartbeats only keep the connection alive,
    * RedisStreamChangeConsumer.java:199-204), then the configured SMT
    * chain, then stream-name mapping. Tombstone gating happens in the
    * sink adapter (per-sink capability). */
  def shape(records: DataFrame, spec: PipelineSpec): DataFrame = {
    val noHb = EventShaping.dropHeartbeats(records)
    val transformed = EventShaping.applyChain(noHb, spec.transforms)
    spec.streamNameMapper.fold(transformed)(f => EventShaping.mapStreamName(transformed, f))
  }

  private def batchSource(spark: SparkSession, spec: PipelineSpec): DataFrame =
    spec.sourceType match {
      case "graft-cdc" =>
        var r = spark.read.format("graft-cdc")
          .option("path", spec.sourcePath)
          .option("keySchema", spec.keySchema.toDDL)
          .option("rowSchema", spec.rowSchema.toDDL)
        if (spec.tableIncludeList.nonEmpty)
          r = r.option("table.include.list", spec.tableIncludeList.mkString(","))
        r.load()
      case _ =>
        EnvelopeLogSource.read(spark, spec.sourcePath,
          spec.keySchema, spec.rowSchema, spec.tableIncludeList)
    }

  private def streamSource(spark: SparkSession, spec: PipelineSpec): DataFrame =
    spec.sourceType match {
      case "graft-cdc" =>
        var r = spark.readStream.format("graft-cdc")
          .option("path", spec.sourcePath)
          .option("keySchema", spec.keySchema.toDDL)
          .option("rowSchema", spec.rowSchema.toDDL)
        if (spec.tableIncludeList.nonEmpty)
          r = r.option("table.include.list", spec.tableIncludeList.mkString(","))
        r.load()
      case _ =>
        EnvelopeLogSource.readStream(spark, spec.sourcePath,
          spec.keySchema, spec.rowSchema, spec.tableIncludeList, spec.maxFilesPerTrigger)
    }

  /** One-shot batch run (testing / bounded replay): the snapshot phase
    * of the reference collapses to this. */
  def runBatch(spark: SparkSession, spec: PipelineSpec): Unit = {
    spec.sink.validate()
    spec.sink.foreachBatchFn(shape(batchSource(spark, spec), spec), 0L)
  }

  /** Continuous run: Structured Streaming file source → foreachBatch
    * sink, exactly-once via checkpoint + idempotent sinks. The record
    * stream carries the MBean observables (lag + snapshot phase,
    * graft.services.Metrics.observePipeline) and the sink's close()
    * hook fires on query termination (DebeziumServerSink lifecycle,
    * api/DebeziumServerSink.java:32-87). */
  def start(spark: SparkSession, spec: PipelineSpec,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    spec.sink.validate()
    val records = streamSource(spark, spec)
    val observed = graft.services.Metrics.observePipeline(records)
    var writer = observed.transform(shape(_, spec)).writeStream
      .foreachBatch(spec.sink.foreachBatchFn)
      .trigger(trigger)
    spec.checkpointDir.foreach(d => writer = writer.option("checkpointLocation", d))
    val q = writer.start()
    registerCloseHook(spark, q, spec.sink)
    q
  }

  /** Live end-to-end pipeline: JDBC database → polling tailer daemon →
    * `graft-cdc` DSv2 stream → shaping → sink. The tailer snapshots on
    * FIRST start (no persisted tailer state at the layout path), then
    * polls on `pollIntervalMs`; the daemon's lifetime is tied to the
    * query (closed by the termination hook, like the sink). This is
    * the reference's whole runtime shape — connector thread + engine
    * loop + consumer — as one call. */
  def startLive(spark: SparkSession, spec: PipelineSpec,
                tailer: graft.sources.cdc.JdbcPollingTailer,
                pollIntervalMs: Long = 1000L,
                trigger: Trigger = Trigger.ProcessingTime(1000L)): StreamingQuery = {
    import java.nio.file.{Files, Paths}
    if (!Files.exists(Paths.get(spec.sourcePath, "_tailer_state")))
      spec.snapshotMode match {
        case "initial" | "when_needed" | "initial_only" => tailer.snapshot()
        case "no_data" | "never" | "schema_only" => tailer.snapshotSchemaOnly()
        case other => throw new IllegalArgumentException(
          s"unknown snapshot.mode '$other' (initial / when_needed / initial_only / " +
          "no_data / never / schema_only)")
      }
    val q = start(spark, spec.copy(sourceType = "graft-cdc"), trigger)
    // initial_only: the reference stops after the snapshot phase — no
    // polling daemon; the stream serves the snapshot and then idles
    if (spec.snapshotMode != "initial_only") {
      val daemon = new graft.sources.cdc.JdbcPollingTailer.Daemon(tailer, pollIntervalMs).start()
      registerTerminationHook(spark, q, () => daemon.close())
    }
    q
  }

  /** Live end-to-end pipeline over a LOG-PROTOCOL capture: replication
    * feed → decoder → WAL segments → `graft-cdc` DSv2 stream →
    * shaping → sink. The protocol sibling of [[startLive]]: when log
    * access exists (pgoutput slot, binlog dump — or their file-capture
    * form via `FileReplicationFeed`), the polling tailer retires and
    * hard deletes + before images flow; everything downstream is
    * unchanged. The drain daemon's lifetime is tied to the query, and
    * the feed closes with it. */
  def startReplication(spark: SparkSession, spec: PipelineSpec,
                       tailer: graft.sources.cdc.ReplicationTailer,
                       drainIntervalMs: Long = 1000L,
                       trigger: Trigger = Trigger.ProcessingTime(1000L)): StreamingQuery = {
    val daemon = tailer.daemon(drainIntervalMs).start()
    val q = start(spark, spec.copy(sourceType = "graft-cdc"), trigger)
    registerTerminationHook(spark, q, () => { daemon.close(); tailer.close() })
    q
  }

  /** Live pipeline over a database's native change bookkeeping (SQL
    * Server change tables, Oracle LogMiner, DB2 CD tables): same
    * snapshot-mode dispatch and daemon lifecycle as [[startLive]], but
    * the change feed carries hard deletes and before images (the
    * native capture retains both). */
  def startNativeCdc(spark: SparkSession, spec: PipelineSpec,
                     tailer: graft.sources.cdc.NativeCdcTailer,
                     pollIntervalMs: Long = 1000L,
                     trigger: Trigger = Trigger.ProcessingTime(1000L)): StreamingQuery = {
    import java.nio.file.{Files, Paths}
    if (!Files.exists(Paths.get(spec.sourcePath, tailer.stateFileName)))
      spec.snapshotMode match {
        case "initial" | "when_needed" | "initial_only" => tailer.snapshot()
        case "no_data" | "never" | "schema_only" => tailer.snapshotSchemaOnly()
        case other => throw new IllegalArgumentException(
          s"unknown snapshot.mode '$other' (initial / when_needed / initial_only / " +
          "no_data / never / schema_only)")
      }
    val q = start(spark, spec.copy(sourceType = "graft-cdc"), trigger)
    if (spec.snapshotMode != "initial_only") {
      val daemon = new graft.sources.cdc.NativeCdc.Daemon(tailer, pollIntervalMs).start()
      registerTerminationHook(spark, q, () => daemon.close())
    }
    q
  }

  /** Config-dispatched live pipeline — the reference's
    * `debezium.source.connector.class` selection as one call: build
    * the capture with `CaptureFactory.fromProperties`, then run
    * whichever live mode it selected (polling tailer vs log-protocol
    * decoder vs change-table capture), identical downstream either
    * way. */
  def startCapture(spark: SparkSession, spec: PipelineSpec,
                   capture: graft.sources.cdc.CaptureFactory.Capture,
                   intervalMs: Long = 1000L,
                   trigger: Trigger = Trigger.ProcessingTime(1000L)): StreamingQuery =
    capture match {
      case graft.sources.cdc.CaptureFactory.PollingCapture(t) =>
        startLive(spark, spec, t, intervalMs, trigger)
      case graft.sources.cdc.CaptureFactory.ProtocolCapture(t) =>
        startReplication(spark, spec, t, intervalMs, trigger)
      case graft.sources.cdc.CaptureFactory.NativeCapture(t) =>
        startNativeCdc(spark, spec, t, intervalMs, trigger)
    }

  /** Close the sink exactly once when ITS query terminates
    * (@PreDestroy analog; the listener deregisters itself). */
  private[pipeline] def registerCloseHook(spark: SparkSession,
                                          q: StreamingQuery,
                                          sink: SinkConnector): Unit =
    registerTerminationHook(spark, q, () => sink.close())

  private def registerTerminationHook(spark: SparkSession, q: StreamingQuery,
                                      onTerminate: () => Unit): Unit = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        if (e.id == q.id) {
          try onTerminate() finally spark.streams.removeListener(this)
        }
    }
    spark.streams.addListener(listener)
  }

  /** Ad-hoc bounded re-snapshot of one table — the reference's
    * headline `execute-snapshot` signal (SignalResource.java:32-43,
    * exercised in DebeziumServerIT.java:109-141: incremental snapshot
    * events re-deliver the table's rows). Spark analog (SURVEY §3.3):
    * a TRIGGERED BATCH READ of the table's current state — the change
    * log replayed to latest via ApplyChanges — reshaped to op='r'
    * envelopes with source.snapshot='incremental', run through the
    * SAME shaping chain, and delivered to the sink as one ad-hoc
    * epoch derived from the signal id. The streaming query is never
    * touched (signals act between batches, like the reference's
    * HTTP-thread → engine-thread boundary); epoch-idempotent sinks
    * make a replayed signal id exactly-once. Returns rows delivered. */
  def executeSnapshot(spark: SparkSession, spec: PipelineSpec,
                      table: String, signalId: String): Long = {
    import org.apache.spark.sql.functions._
    val log = batchSource(spark, spec)
      .filter(col("destination").endsWith("." + table))
      .filter(col("value").isNotNull) // tombstones carry no state
    val state = graft.operators.ApplyChanges.latestState(log,
      keyCols = Seq(col("key")),
      orderCols = Seq(coalesce(col("value.source.lsn"), lit(-1L))),
      opCol = col("value.op"))
    val reshaped = state.withColumn("value", struct(
      lit(Envelope.OpRead).as("op"),
      lit(null).cast(spec.rowSchema).as("before"),
      col("value.after").as("after"),
      struct(
        col("value.source.connector").as("connector"),
        col("value.source.db").as("db"),
        col("value.source.schema").as("schema"),
        col("value.source.table").as("table"),
        col("value.source.lsn").as("lsn"),
        lit("incremental").as("snapshot"),
        col("value.source.ts_ms").as("ts_ms")).as("source"),
      col("value.ts_ms").as("ts_ms")))
    // persist so the bounded snapshot evaluates ONCE for both the
    // count and the delivery (not two full replays of the change log)
    val shaped = shape(reshaped, spec).persist()
    try {
      val n = shaped.count()
      spec.sink.foreachBatchFn(shaped,
        graft.functions.Portable.hash64Jvm(s"execute-snapshot:$signalId"))
      n
    } finally shaped.unpersist()
  }

  /** Act on pending control signals (SignalResource semantics): "stop"
    * gracefully stops the named query; "log" records its data field;
    * "execute-snapshot" snapshots the named table — with a NATIVE
    * capture attached, as a DBLog incremental snapshot flowing
    * through the normal stream (chunked, watermark-deduped,
    * `NativeCdcTailer.incrementalSnapshot` — the reference's actual
    * incremental-signal mechanism); otherwise as a layout replay
    * into the sink (needs `spec`). Unknown types are returned for
    * caller-specific handling. */
  def processSignals(spark: SparkSession,
                     channel: graft.services.Signals.Channel,
                     queries: Map[String, StreamingQuery],
                     spec: Option[PipelineSpec] = None,
                     native: Option[graft.sources.cdc.NativeCdcTailer] = None)
      : Seq[graft.services.Signals.Signal] =
    channel.poll().flatMap { sig =>
      sig.`type` match {
        case "stop" =>
          queries.get(sig.data).orElse(queries.values.headOption).foreach(_.stop())
          None
        case "log" =>
          org.slf4j.LoggerFactory.getLogger(getClass).info(s"signal log: ${sig.data}")
          None
        case "execute-snapshot" =>
          val (colls, typ) = parseSnapshotData(sig.data)
          // incremental (the default) prefers the native DBLog path
          // when the capture owns every named collection; "blocking"
          // — and any collection outside the native capture — runs as
          // the ad-hoc bounded layout replay
          val nativeAll = native.filter(n => colls.nonEmpty && typ == "incremental" &&
            colls.forall(c => n.tableSpecs.exists(t => t.qualified == c || t.table == c)))
          if (nativeAll.isDefined) {
            colls.foreach(c => nativeAll.get.incrementalSnapshot(only = Some(c)))
            None
          } else if (spec.isDefined && colls.nonEmpty) {
            colls.foreach(c => executeSnapshot(spark, spec.get, c,
              if (colls.size == 1) sig.id else s"${sig.id}:$c"))
            None
          } else Some(sig)
        case "stop-snapshot" if native.isDefined =>
          val (colls, _) = parseSnapshotData(sig.data)
          if (colls.isEmpty) native.get.stopIncrementalSnapshot(None)
          else colls.foreach(c => native.get.stopIncrementalSnapshot(Some(c)))
          None
        case "pause-snapshot" if native.isDefined =>
          native.get.pauseIncrementalSnapshot()
          None
        case "resume-snapshot" if native.isDefined =>
          native.get.resumeIncrementalSnapshot()
          None
        case _ => Some(sig)
      }
    }

  /** Snapshot-signal `data` payloads: the reference's JSON object
    * (`{"data-collections": ["s.t", …], "type": "incremental"|"blocking"}`,
    * SignalResource's DSSignal data field) or — as a convenience — a
    * bare collection name. Type defaults to incremental. */
  private[pipeline] def parseSnapshotData(data: String): (Seq[String], String) =
    if (data.trim.startsWith("{")) {
      import scala.jdk.CollectionConverters._
      val n = graft.sources.cdc.JsonRows.parse(data)
      val colls = Option(n.get("data-collections")).filterNot(_.isNull)
        .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
      val typ = Option(n.get("type")).filterNot(_.isNull)
        .map(_.asText().toLowerCase).getOrElse("incremental")
      (colls, typ)
    } else (Seq(data.trim).filter(_.nonEmpty), "incremental")
}
