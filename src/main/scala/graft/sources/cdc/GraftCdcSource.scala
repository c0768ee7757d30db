package graft.sources.cdc

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, StringEndsWith, StringStartsWith}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.model.Envelope
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** DataSource V2 CDC source (`format("graft-cdc")`) — the Spark-native
  * rebuild of the reference's connector left half (SURVEY.md §2.1):
  * snapshot phase then WAL streaming with LSN offsets, as a real
  * `MicroBatchStream` whose offsets ARE log positions, not file names.
  *
  * The "database" is an on-disk layout standing in for a live server
  * (no DB daemons in this environment — a production deployment
  * implements the same contract against pgoutput/binlog):
  *
  *   <db>/snapshot/_lsn                     LSN the snapshot is consistent at
  *   <db>/snapshot/<schema>.<table>.jsonl   row dumps (one JSON object/line)
  *   <db>/wal/wal-….jsonl                   envelope records, value.source.lsn
  *                                          strictly increasing across the log
  *
  * Phases (DebeziumMetrics.java:115-131 semantics):
  *  - initial offset = LSN -1; the FIRST micro-batch advances to the
  *    snapshot LSN and delivers every snapshot row as op='r' with
  *    source.snapshot='true' (the reference's snapshot read events);
  *  - subsequent batches advance through WAL LSN ranges `(start, end]`
  *    — replaying a checkpointed offset range yields identical rows,
  *    which is what makes downstream epoch-idempotent sinks
  *    exactly-once.
  *
  * Scale + pushdown:
  *  - one InputPartition per WAL file (files are the log's natural
  *    parallelism unit; a pgoutput tailer partitions by slot);
  *  - `table.include.list` AND Catalyst-pushed destination filters
  *    (EqualTo / StartsWith / EndsWith via SupportsPushDownFilters)
  *    are evaluated in the partition reader BEFORE rows surface, so
  *    excluded tables never leave the scan (the reference pushes its
  *    include list into the connector the same way,
  *    DebeziumServerTest.java:70-79).
  */
final class GraftCdcSource extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-cdc"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftCdcSource.recordSchema(options.asScala.toMap)

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new CdcTable(properties.asScala.toMap)
}

object GraftCdcSource {
  def recordSchema(options: Map[String, String]): StructType = {
    val key = StructType.fromDDL(req(options, "keyschema"))
    val row = StructType.fromDDL(req(options, "rowschema"))
    Envelope.recordSchema(key, row)
  }
  private[cdc] def req(options: Map[String, String], k: String): String =
    options.getOrElse(k, throw new IllegalArgumentException(s"graft-cdc: option '$k' required"))
}

private[cdc] final class CdcTable(options0: Map[String, String]) extends Table with SupportsRead {
  private val options = options0.map { case (k, v) => k.toLowerCase -> v }
  override def name(): String = s"graft-cdc:${options.getOrElse("path", "?")}"
  override def schema(): StructType = GraftCdcSource.recordSchema(options)
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(caseInsensitive: CaseInsensitiveStringMap): ScanBuilder =
    new CdcScanBuilder(options ++ caseInsensitive.asScala.map { case (k, v) => k.toLowerCase -> v })
}

private[cdc] final class CdcScanBuilder(options: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters {
  private var pushed: Array[Filter] = Array.empty

  /** Accept destination-column filters; everything else stays in Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("destination", _: String)          => true
      case StringStartsWith("destination", _)         => true
      case StringEndsWith("destination", _)           => true
      case _                                          => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new CdcScan(options, pushed)
}

private[cdc] final class CdcScan(options: Map[String, String], pushed: Array[Filter])
    extends Scan {
  override def readSchema(): StructType = GraftCdcSource.recordSchema(options)
  override def description(): String =
    s"GraftCdcScan(pushed=[${pushed.mkString(", ")}])"
  override def toBatch: Batch = new CdcBatch(options, pushed)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new CdcMicroBatchStream(options, pushed)
}

/** LSN position offset — the stream's notion of progress is the log
  * position, exactly like the reference's connector offsets. */
private[cdc] final case class CdcOffset(lsn: Long) extends Offset {
  override def json(): String = s"""{"lsn":$lsn}"""
}
private[cdc] object CdcOffset {
  def fromJson(s: String): CdcOffset =
    CdcOffset("""-?\d+""".r.findFirstIn(s).map(_.toLong)
      .getOrElse(throw new IllegalArgumentException(s"bad offset: $s")))
}

private[cdc] object CdcLayout {
  def dbDir(options: Map[String, String]): Path =
    Paths.get(GraftCdcSource.req(options, "path"))

  def snapshotLsn(db: Path): Long = {
    val f = db.resolve("snapshot").resolve("_lsn")
    if (Files.exists(f)) Files.readString(f).trim.toLong else -1L
  }

  /** Snapshot dump units: a table's dump is either one FILE
    * `<schema>.<table>.jsonl` (driver-written) or a DIRECTORY of part
    * files under `<schema>.<table>.jsonl/` (a distributed snapshot,
    * e.g. Spark's partitioned JDBC read) — each part becomes its own
    * input partition, so big snapshots scan in parallel. */
  def snapshotTables(db: Path): Seq[Path] = {
    val d = db.resolve("snapshot")
    if (!Files.exists(d)) Nil
    else graft.Fs.children(d)
      .filter(p => p.getFileName.toString.endsWith(".jsonl")).sortBy(_.toString)
      .flatMap { p =>
        if (Files.isDirectory(p))
          graft.Fs.children(p).filter { f =>
            val n = f.getFileName.toString
            Files.isRegularFile(f) && !n.startsWith("_") && !n.startsWith(".")
          }.sortBy(_.toString)
        else Seq(p)
      }
  }

  def walFiles(db: Path): Seq[Path] = {
    val d = db.resolve("wal")
    if (!Files.exists(d)) Nil
    else graft.Fs.children(d)
      .filter { p =>
        val n = p.getFileName.toString
        Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith(".")
      }.sortBy(_.toString)
  }

  /** Current end of the log, computed through a per-segment stats
    * function — a real tailer asks the server (pg_current_wal_lsn())
    * and never re-reads the log; the fixture equivalent is the stream's
    * immutable-segment stats CACHE, so each trigger pays one directory
    * listing plus a scan of only the segments it has never seen. */
  def maxLsn(db: Path, stats: Path => SegStats): Long =
    walFiles(db).foldLeft(snapshotLsn(db))((m, f) => math.max(m, stats(f).maxRaw))

  /** Uncached variant for one-shot (non-streaming) callers. */
  def maxLsn(db: Path): Long = maxLsn(db, segmentStats)

  /** Per-segment LSN statistics, one pass over the file:
    *  - (lo, hi): effective bounds mirroring the reader's anchoring
    *    exactly — lsn-less records (heartbeats, tombstones) take their
    *    predecessor's position (0 at file start); an empty segment
    *    yields (-1, MaxValue): never pruned;
    *  - maxRaw: max RAW lsn (-1 if none), the segment's contribution to
    *    the log end.
    * Segments are IMMUTABLE once visible (the tailer moves them in
    * atomically), so streams cache stats forever — without this, a
    * long-running stream reopens every segment ever written on every
    * trigger, both when pruning micro-batch plans and when answering
    * latestOffset/metrics. */
  final case class SegStats(lo: Long, hi: Long, maxRaw: Long)

  /** Count of full segment scans ever performed — observability for the
    * read-each-segment-at-most-once property (asserted in tests). */
  val segmentScans = new java.util.concurrent.atomic.LongAdder

  def segmentStats(f: Path): SegStats = {
    segmentScans.increment()
    var last = 0L
    var lo = Long.MaxValue
    var hi = Long.MinValue
    var maxRaw = -1L
    val s = Files.lines(f)
    try s.iterator().asScala.filter(_.trim.nonEmpty).foreach { line =>
      val raw = lsnOf(line)
      val eff = if (raw >= 0) { last = raw; raw } else last
      lo = math.min(lo, eff); hi = math.max(hi, eff)
      maxRaw = math.max(maxRaw, raw)
    } finally s.close()
    if (hi == Long.MinValue) SegStats(-1L, Long.MaxValue, -1L) else SegStats(lo, hi, maxRaw)
  }

  def segmentBounds(f: Path): (Long, Long) = {
    val st = segmentStats(f)
    (st.lo, st.hi)
  }

  def lsnOf(line: String): Long = {
    val n = JsonRows.parse(line)
    val v = n.get("value")
    if (v == null || v.isNull) -1L
    else {
      val s = v.get("source")
      if (s == null || s.isNull || s.get("lsn") == null) -1L else s.get("lsn").asLong()
    }
  }
}

/** Batch scan: snapshot + entire WAL (bounded replay). */
private[cdc] final class CdcBatch(options: Map[String, String], pushed: Array[Filter])
    extends Batch {
  override def planInputPartitions(): Array[InputPartition] = {
    val db = CdcLayout.dbDir(options)
    val snapLsn = CdcLayout.snapshotLsn(db)
    // bounded point-in-time replay: `ending.lsn` caps the batch read at
    // a log position (inclusive) — the source-level half of time travel
    // (cdc14 is the operator-level half). The snapshot is the base
    // state at snapLsn, so a bound that predates it has no consistent
    // answer and fails loudly.
    val endLsn = options.get("ending.lsn").map(_.toLong)
    endLsn.foreach(e => require(e >= snapLsn,
      s"ending.lsn $e predates the snapshot position $snapLsn — no consistent state exists there"))
    // resume-from-offset: `starting.lsn` reads ONLY changes strictly
    // after the given position — no snapshot rows, no earlier WAL.
    // The batch half of a backfill handoff: state-at-X (an ending.lsn
    // read, or a delivered table) + changes-after-X composes gap-free
    // to the full replay. Below the snapshot position no per-change
    // history exists, so resuming there fails loudly.
    val startLsn = options.get("starting.lsn").map(_.toLong)
    startLsn.foreach(st => require(st >= snapLsn,
      s"starting.lsn $st predates the snapshot position $snapLsn — changes before the snapshot are not retained"))
    startLsn.foreach(st => endLsn.foreach(e => require(e >= st,
      s"ending.lsn $e precedes starting.lsn $st — empty, inverted range")))
    val to = endLsn.getOrElse(Long.MaxValue)
    val from = startLsn.getOrElse(snapLsn)
    val snaps =
      if (startLsn.isEmpty)
        CdcLayout.snapshotTables(db).map(p =>
          CdcPartition(p.toString, isSnapshot = true, snapLsn, to): InputPartition)
      else Nil
    val wals = CdcLayout.walFiles(db).map(p =>
      CdcPartition(p.toString, isSnapshot = false, from, to): InputPartition)
    (snaps ++ wals).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReaderFactory(options, pushed)
}

/** Micro-batch stream over LSN ranges. */
private[cdc] final class CdcMicroBatchStream(options: Map[String, String], pushed: Array[Filter])
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow
    with org.apache.spark.sql.connector.read.streaming.ReportsSourceMetrics {
  import org.apache.spark.sql.connector.read.streaming.ReadLimit
  private val db = CdcLayout.dbDir(options)
  private val snapLsn = CdcLayout.snapshotLsn(db)
  /** Admission control — the engine-queue-capacity analog
    * (DebeziumMetrics.java:106-144 / maxOffsetsPerTrigger): each
    * micro-batch advances at most this many LSNs past the start, so a
    * huge backlog drains in bounded batches instead of one giant one. */
  private val maxLsnsPerTrigger: Option[Long] = options.get("maxlsnspertrigger").map(_.toLong)
  /** Streaming half of `ending.lsn` (batch: CdcBatch): the stream
    * never advances past the bound — a bounded backfill that stops
    * delivering once the log reaches the target position (combine
    * with Trigger.AvailableNow for "replay up to X and exit"). */
  private val endLsn: Option[Long] = options.get("ending.lsn").map(_.toLong)
  endLsn.foreach(e => require(e >= snapLsn,
    s"ending.lsn $e predates the snapshot position $snapLsn — no consistent state exists there"))
  /** Resume-from-offset (streaming half of the batch `starting.lsn`):
    * the stream's initial offset is the given position instead of
    * log-start, so the snapshot phase is skipped and only changes
    * strictly after it deliver — the handoff point after a batch
    * backfill, or a externally-tracked offset à la the reference's
    * offset store. Ignored once a checkpoint exists (Spark resumes
    * from the checkpointed offset, which is the correct precedence). */
  private val startLsn: Option[Long] = options.get("starting.lsn").map(_.toLong)
  startLsn.foreach(st => require(st >= snapLsn,
    s"starting.lsn $st predates the snapshot position $snapLsn — changes before the snapshot are not retained"))
  startLsn.foreach(st => endLsn.foreach(e => require(e >= st,
    s"ending.lsn $e precedes starting.lsn $st — empty, inverted range")))
  private def boundTo(lsn: Long): Long = endLsn.fold(lsn)(math.min(lsn, _))
  /** The reported log end never drops below `starting.lsn`: a resume
    * position ahead of the current log end (an externally-tracked
    * offset racing a lagging copy) would otherwise CHECKPOINT the
    * smaller offset, and later log growth would re-open the range
    * below the declared strictly-after position — an overlap the
    * handoff contract forbids. Flooring makes the early triggers empty
    * instead. */
  private def floorStart(lsn: Long): Long = math.max(lsn, startLsn.getOrElse(-1L))
  // Trigger.AvailableNow: pin the end of the log at query start so the
  // query drains exactly to that position and stops
  private var availableNowTarget: Option[CdcOffset] = None

  override def initialOffset(): Offset = CdcOffset(startLsn.getOrElse(-1L))
  override def deserializeOffset(json: String): Offset = CdcOffset.fromJson(json)
  override def latestOffset(): Offset =
    availableNowTarget.getOrElse(CdcOffset(boundTo(floorStart(maxLsnCached()))))
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(CdcOffset(boundTo(floorStart(maxLsnCached()))))
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val target = latestOffset().asInstanceOf[CdcOffset].lsn
    val s = start.asInstanceOf[CdcOffset].lsn
    // the snapshot phase always completes whole (a partial snapshot is
    // not a consistent state); rate limiting applies to the WAL tail
    val capped = maxLsnsPerTrigger match {
      case Some(cap) if s >= snapLsn => math.min(target, s + cap)
      case Some(cap)                 => math.min(target, math.max(snapLsn, s + cap))
      case None                      => target
    }
    CdcOffset(capped)
  }
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def reportLatestOffset(): Offset = CdcOffset(maxLsnCached())
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  /** The DebeziumMetrics queue/position analog
    * (DebeziumMetrics.java:106-153) surfaced per progress event:
    * current log end, consumed position, and the LSN backlog between
    * them (the "queue remaining" of a log-backed source). */
  override def metrics(latestConsumed: java.util.Optional[Offset]): java.util.Map[String, String] = {
    val maxLsn = maxLsnCached()
    val consumed = if (latestConsumed.isPresent)
      latestConsumed.get.asInstanceOf[CdcOffset].lsn else -1L
    java.util.Map.of(
      "maxLsn", maxLsn.toString,
      "consumedLsn", consumed.toString,
      "pendingLsns", math.max(0L, maxLsn - math.max(consumed, 0L)).toString,
      "snapshotLsn", snapLsn.toString)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CdcOffset].lsn
    val e = end.asInstanceOf[CdcOffset].lsn
    // snapshot phase: everything at or below the snapshot LSN comes from
    // the row dumps, not the WAL (the reference streams from the
    // snapshot-consistent LSN after its initial snapshot)
    val snaps =
      if (s < snapLsn && e >= snapLsn)
        CdcLayout.snapshotTables(db).map(p =>
          CdcPartition(p.toString, isSnapshot = true, snapLsn, e): InputPartition)
      else Nil
    val from = math.max(s, snapLsn)
    val wals =
      if (e > from)
        CdcLayout.walFiles(db)
          // prune segments wholly outside (from, e] via cached bounds —
          // segments are immutable, so bounds are computed once ever
          .filter { p =>
            val st = statsOf(p)
            st.hi > from && st.lo <= e
          }
          .map(p =>
            CdcPartition(p.toString, isSnapshot = false, from, e): InputPartition)
      else Nil
    (snaps ++ wals).toArray
  }

  /** ONE stats cache shared by planning, latestOffset, reportLatestOffset
    * and metrics: driver I/O per trigger is O(segments never seen before),
    * not O(total log) — the tailer analog of asking the server for
    * pg_current_wal_lsn() instead of re-reading the log. */
  private val statsCache = scala.collection.concurrent.TrieMap.empty[String, CdcLayout.SegStats]
  private def statsOf(p: Path): CdcLayout.SegStats =
    statsCache.getOrElseUpdate(p.toString, CdcLayout.segmentStats(p))
  private def maxLsnCached(): Long = CdcLayout.maxLsn(db, statsOf)
  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReaderFactory(options, pushed)
}

/** One file of the snapshot or WAL, bounded to an LSN range
  * `(fromLsn, toLsn]` (snapshot partitions deliver at fromLsn). */
private[cdc] final case class CdcPartition(file: String, isSnapshot: Boolean,
                                           fromLsn: Long, toLsn: Long) extends InputPartition

private[cdc] final class CdcReaderFactory(options: Map[String, String], pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdcPartition]
    new CdcPartitionReader(p, options, pushed)
  }
}

private[cdc] final class CdcPartitionReader(p: CdcPartition,
                                            options: Map[String, String],
                                            pushed: Array[Filter])
    extends PartitionReader[InternalRow] {
  private val keySchema = StructType.fromDDL(GraftCdcSource.req(options, "keyschema"))
  private val rowSchema = StructType.fromDDL(GraftCdcSource.req(options, "rowschema"))
  private val recordSchema = Envelope.recordSchema(keySchema, rowSchema)
  private val includes: Seq[String] =
    options.get("table.include.list").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)

  private val lines = Files.lines(Paths.get(p.file))
  private val it = lines.iterator().asScala.filter(_.trim.nonEmpty)
  private var current: InternalRow = _
  // LSN position of the last seen WAL record: records WITHOUT an lsn
  // (tombstones, heartbeats) are anchored to their predecessor's
  // position so each is delivered in exactly one micro-batch
  private var lastLsn: Long = 0L

  // destination for snapshot rows: <prefix>.<table-name>, where the
  // table name comes from the dump file OR its parent directory (a
  // distributed snapshot writes part files under <table>.jsonl/)
  private val topicPrefix = options.getOrElse("topic.prefix", "testc")
  private val snapTable = {
    val f = Paths.get(p.file)
    val parent = Option(f.getParent).map(_.getFileName.toString).getOrElse("")
    val base = if (parent.endsWith(".jsonl")) parent else f.getFileName.toString
    base.stripSuffix(".jsonl")
  }

  override def next(): Boolean = {
    current = null
    while (current == null && it.hasNext) {
      val line = it.next()
      val row = if (p.isSnapshot) snapshotRow(line) else walRow(line)
      if (row != null) current = row
    }
    current != null
  }
  override def get(): InternalRow = current
  override def close(): Unit = lines.close()

  private def destOk(dest: String): Boolean = {
    val incl = includes.isEmpty || includes.exists(t => dest.endsWith("." + t)) ||
      dest.startsWith(Envelope.HeartbeatPrefix)
    incl && pushed.forall {
      case EqualTo("destination", v: String)  => dest == v
      case StringStartsWith("destination", v) => dest.startsWith(v)
      case StringEndsWith("destination", v)   => dest.endsWith(v)
      case _                                  => true
    }
  }

  /** Snapshot dump line = plain row object → op='r' envelope at the
    * snapshot LSN with source.snapshot='true'. */
  private def snapshotRow(line: String): InternalRow = {
    if (p.fromLsn > p.toLsn) return null
    val dest = s"$topicPrefix.$snapTable"
    if (!destOk(dest)) return null
    val node = JsonRows.parse(line)
    val after = JsonRows.toInternalRow(node, rowSchema)
    val key = JsonRows.toInternalRow(node, keySchema)
    val source = new GenericInternalRow(Array[Any](
      UTF8String.fromString("snapshot"), null,
      UTF8String.fromString(schemaOf(snapTable)), UTF8String.fromString(tableOf(snapTable)),
      p.fromLsn, UTF8String.fromString("true"), 0L))
    val value = new GenericInternalRow(Array[Any](
      UTF8String.fromString(Envelope.OpRead), null, after, source, 0L))
    new GenericInternalRow(Array[Any](UTF8String.fromString(dest), key, value, null))
  }

  private def schemaOf(table: String): String =
    table.split("\\.").dropRight(1).mkString(".")
  private def tableOf(table: String): String = table.split("\\.").last

  /** WAL line = full change record; delivered iff lsn ∈ (fromLsn, toLsn]
    * (lsn-less records use their predecessor's position). */
  private def walRow(line: String): InternalRow = {
    val rawLsn = CdcLayout.lsnOf(line)
    val lsn = if (rawLsn >= 0) { lastLsn = rawLsn; rawLsn } else lastLsn
    if (lsn <= p.fromLsn || lsn > p.toLsn) return null
    val node = JsonRows.parse(line)
    val destNode = node.get("destination")
    if (destNode == null || destNode.isNull) return null
    val dest = destNode.asText()
    if (!destOk(dest)) return null
    JsonRows.toInternalRow(node, recordSchema)
  }
}
