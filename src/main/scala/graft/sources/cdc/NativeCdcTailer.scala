package graft.sources.cdc

import java.nio.file.{Files, Path, StandardCopyOption}
import java.sql.{DriverManager, ResultSet}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Shared machinery for native-CDC change captures that read a
  * database's OWN change bookkeeping over plain SQL — SQL Server
  * change tables, Oracle LogMiner, DB2 SQL-Replication CD tables
  * (reference connector matrix: debezium-server-dist/pom.xml:359-389).
  * These sit between watermark polling (no hard deletes, no before
  * images) and a log-wire decoder (needs a socket protocol): the
  * change feed is a SQL query, but it carries the full d/c/u surface.
  *
  * Every tailer here shares the same lifecycle, extracted into
  * [[NativeCdcTailer]]:
  *
  *  - [[NativeCdcTailer.snapshot]]: one repeatable-read transaction
  *    dumps every table to `snapshot/<schema>.<table>.jsonl` and
  *    records each table's CURRENT change position — changes at or
  *    below it are part of the snapshot, polling starts strictly
  *    after;
  *  - [[NativeCdcTailer.poll]]: per table, decode change rows past the
  *    stored position into envelopes (the connector-specific
  *    [[NativeCdcTailer.forEachChange]]), append bounded WAL segments
  *    to the shared [[CdcLayout]] the DSv2 `graft-cdc` source reads;
  *  - position state per table persisted as hex `lsn:seq` pairs,
  *    advancing with every segment flush — a crash replays only past
  *    the last flushed position (at-least-once; the epoch-idempotent
  *    downstream converges).
  */
object NativeCdc {

  /** One captured table. `captureInstance` defaults to the common
    * `<schema>_<table>` naming. */
  final case class TableSpec(schema: String, table: String, keyCols: Seq[String],
                             captureInstance: Option[String] = None) {
    def qualified: String = s"$schema.$table"
    def ci: String = captureInstance.getOrElse(s"${schema}_$table")
  }

  /** Change position: (commit LSN/SCN, intra-transaction sequence),
    * both unsigned big-endian. Total order = (lsn, seq). */
  final case class Position(lsn: BigInt, seq: BigInt) {
    def >(o: Position): Boolean = lsn > o.lsn || (lsn == o.lsn && seq > o.seq)
    def render: String = s"${lsn.toString(16)}:${seq.toString(16)}"
  }
  object Position {
    val Min: Position = Position(BigInt(-1), BigInt(-1))
    def parse(s: String): Position = s.split(":", 2) match {
      case Array(l, q) => Position(BigInt(l, 16), BigInt(q, 16))
      case _ => throw new IllegalArgumentException(s"bad position '$s'")
    }
  }

  /** One complete decoded change event (an update's before/after pair
    * arrives as ONE event — pairing is the connector's job). */
  final case class Change(op: String, before: Option[Map[String, Any]],
                          after: Option[Map[String, Any]], keyFrom: Map[String, Any])

  /** Thread-safe skip counter with a per-table high-water. A skipped
    * record never advances the durable position, so trailing skips
    * re-read on later polls — the high-water keeps the COUNT exact
    * across re-scans, and the synchronized check-then-count keeps the
    * (count, high-water) pair consistent even if a tailer is ever
    * polled concurrently (the former @volatile-increment +
    * unsynchronized-Map pair could corrupt counts). */
  final class SkipCounter[P](gt: (P, P) => Boolean) {
    private val highWater = scala.collection.mutable.Map.empty[String, P]
    private var n = 0L
    def countOnce(table: String, pos: P): Unit = synchronized {
      if (highWater.get(table).forall(p => gt(pos, p))) {
        n += 1
        highWater(table) = pos
      }
    }
    def count: Long = synchronized(n)
  }

  /** Parse `schema.table:key1+key2[:captureInstance][,…]` specs (the
    * shared `debezium.source.<connector>.tables` syntax). */
  def parseTableSpecs(spec: String): Seq[TableSpec] =
    spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { one =>
      one.split(":") match {
        case Array(qual, keys, rest @ _*) if rest.size <= 1 =>
          val Array(schema, table) = qual.split("\\.", 2)
          TableSpec(schema, table, keys.split("\\+").toSeq, rest.headOption)
        case _ => throw new IllegalArgumentException(
          s"bad table spec '$one' (want schema.table:key1+key2[:captureInstance])")
      }
    }

  private[sources] def bigIntOf(v: Any): BigInt = v match {
    case null => BigInt(-1)
    case b: Array[Byte] => BigInt(1, b)
    case n: java.math.BigDecimal => BigInt(n.toBigInteger)
    case n: Number => BigInt(n.longValue())
    case other => throw new IllegalArgumentException(s"unreadable LSN value: $other")
  }

  /** One JSON object rendered as a column map — the decode for
    * connectors whose change feed carries row images as JSON text
    * (Spanner mods, IBMi emulated entry data). Missing/null nodes
    * are empty maps; scalar conversion mirrors the other decoders:
    * integral → Long, fractional → BigDecimal (exact text), bool →
    * Boolean, string (and any nested shape, rendered) → String. */
  private[cdc] def jsonCols(n: com.fasterxml.jackson.databind.JsonNode): Map[String, Any] = {
    import scala.jdk.CollectionConverters._
    if (n == null || n.isNull) Map.empty
    else n.properties().asScala.map { e =>
      val v = e.getValue
      val value: Any =
        if (v.isNull) null
        else if (v.isIntegralNumber) v.longValue()
        else if (v.isNumber) new java.math.BigDecimal(v.asText())
        else if (v.isBoolean) java.lang.Boolean.valueOf(v.booleanValue())
        else if (v.isTextual) v.textValue()
        else v.toString
      e.getKey.toLowerCase -> value
    }.toMap
  }

  /** Background poll loop — the connector-task thread (same shape as
    * [[JdbcPollingTailer.Daemon]]): errors count and retry next tick. */
  final class Daemon(tailer: NativeCdcTailer, intervalMs: Long,
                     onPoll: Int => Unit = _ => ()) extends AutoCloseable {
    private val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    @volatile private var errors = 0L
    private val thread = new Thread(() => {
      while (!stop.get()) {
        try onPoll(tailer.poll())
        catch { case _: Throwable if !stop.get() => errors += 1 }
        try Thread.sleep(intervalMs) catch { case _: InterruptedException => () }
      }
    }, s"graft-${tailer.connectorName}-tailer")
    thread.setDaemon(true)

    def start(): this.type = { thread.start(); this }
    def errorCount: Long = errors
    override def close(): Unit =
      if (stop.compareAndSet(false, true)) { thread.interrupt(); thread.join(5000) }
  }
}

abstract class NativeCdcTailer(jdbcUrl: String, dbDir: Path,
                               tables: Seq[NativeCdc.TableSpec],
                               topicPrefix: String,
                               dbName: String,
                               /** Compaction tombstone after each
                                 * delete — `tombstones.on.delete`,
                                 * matching the log decoders. */
                               emitTombstones: Boolean) {
  import NativeCdc._

  /** `source.connector` envelope field + daemon thread name. */
  def connectorName: String
  /** Per-connector state file name under `dbDir` (e.g.
    * `_sqlserver_state`) — [[graft.pipeline.CdcPipeline]] keys
    * snapshot-mode dispatch off its existence. */
  def stateFileName: String
  /** Current end-of-log position at snapshot time — changes at or
    * below it are already IN the snapshot. */
  protected def currentPosition(conn: java.sql.Connection, t: TableSpec): Position
  /** Decode all change rows of `t` STRICTLY PAST `from` into complete
    * [[NativeCdc.Change]] events, in (position) order. Re-fetch
    * overlap at/below `from` must be filtered by the implementation. */
  protected def forEachChange(conn: java.sql.Connection, t: TableSpec, from: Position)
                             (emit: (Position, Change) => Unit): Unit

  def tableSpecs: Seq[TableSpec] = tables

  private def stateFile = dbDir.resolve(stateFileName)

  // ------------------------------------------------------------------
  // Schema-change detection: the change feed itself announces column
  // drift (a change table / journal / stream record carries the NEW
  // column set after an ALTER). Track the observed after-image column
  // set per capture instance; on drift, record a DDL entry into the
  // attached SchemaHistory (the reference's schema-change-topic
  // analog) and persist the new set so a restart doesn't re-announce.

  private var schemaHistory: Option[graft.services.SchemaHistory] = None
  private val knownColumns = mutable.Map.empty[String, Seq[String]]
  private def columnsFile = dbDir.resolve(s"$stateFileName.columns")

  /** Attach the durable schema history that column-drift DDL entries
    * append to. Returns this for chaining. */
  def withSchemaHistory(h: graft.services.SchemaHistory): this.type = {
    schemaHistory = Some(h)
    if (Files.exists(columnsFile))
      Files.readAllLines(columnsFile).asScala.filter(_.nonEmpty).foreach { l =>
        val Array(ci, cols) = l.split(" ", 2)
        knownColumns(ci) = cols.split(",").toSeq
      }
    this
  }

  private def observeColumns(t: TableSpec, ch: Change, lsn: Long): Unit =
    schemaHistory.foreach { h =>
      ch.after.orElse(ch.before).foreach { image =>
        val cols = image.keys.toSeq.sorted
        if (!knownColumns.get(t.ci).contains(cols)) {
          knownColumns(t.ci) = cols
          h.recordDdl(s"$topicPrefix.${t.qualified}.schema-changes", lsn,
            s"""{"table":"${t.qualified}","columns":"${cols.mkString(",")}"}""")
          val tmp = dbDir.resolve(s"$stateFileName.columns.tmp")
          Files.writeString(tmp,
            knownColumns.toSeq.sortBy(_._1)
              .map { case (ci, cs) => s"$ci ${cs.mkString(",")}" }
              .mkString("", "\n", "\n"))
          Files.move(tmp, columnsFile,
            StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        }
      }
    }

  // ------------------------------------------------------------------
  // Source-table signal channel (`signal.data.collection`): a table in
  // the SOURCE database whose inserted rows are control messages
  // {id, type, data}. Its changes ride the same change feed as data
  // tables — totally ordered with them — but never reach the WAL:
  // each insert decodes to a Signal and routes to the handler.
  // Delivery is at-least-once (position persists with the poll's
  // state write), matching the engine's semantics.

  private var signalTable: Option[(TableSpec, graft.services.Signals.Signal => Unit)] = None

  /** Watch `t` as the signal collection; `onSignal` fires per insert.
    * Attach BEFORE snapshot()/snapshotSchemaOnly() so the watch
    * starts at the snapshot position (historical rows never replay as
    * signals). */
  def withSignalTable(t: TableSpec,
                      onSignal: graft.services.Signals.Signal => Unit): this.type = {
    signalTable = Some((t, onSignal))
    this
  }

  private def decodeSignal(after: Map[String, Any]): graft.services.Signals.Signal = {
    def s(k: String) = after.get(k).flatMap(Option(_)).map(String.valueOf).getOrElse("")
    graft.services.Signals.Signal(s("id"), s("type"), s("data"))
  }

  /** Consistent snapshot: one repeatable-read transaction dumps every
    * table and records each table's current change position. */
  def snapshot(): Unit = {
    val snapDir = Files.createDirectories(dbDir.resolve("snapshot"))
    Files.createDirectories(dbDir.resolve("wal"))
    val conn = DriverManager.getConnection(jdbcUrl)
    try {
      conn.setAutoCommit(false)
      conn.setTransactionIsolation(java.sql.Connection.TRANSACTION_REPEATABLE_READ)
      val positions = mutable.Map.empty[String, Position]
      tables.foreach { t =>
        positions(t.ci) = currentPosition(conn, t)
        val tmp = snapDir.resolve(s".${t.qualified}.jsonl.tmp")
        val st = conn.createStatement()
        // a snapshot table can be arbitrarily large — stream rows to
        // the file as the ResultSet iterates (never a table image on
        // the driver; poll() already flushes per segment the same way)
        st.setFetchSize(1000)
        try {
          val rs = st.executeQuery(s"SELECT * FROM ${t.qualified}")
          val out = Files.newBufferedWriter(tmp)
          try writeSnapshotRows(rs, out) finally out.close()
        } finally st.close()
        Files.move(tmp, snapDir.resolve(s"${t.qualified}.jsonl"),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      }
      // the signal collection's watch anchors here too: rows inserted
      // before the snapshot are history, not pending control messages
      signalTable.foreach { case (t, _) =>
        positions(t.ci) = currentPosition(conn, t) }
      conn.commit()
      Files.writeString(snapDir.resolve("_lsn"), "0")
      writeState(0L, positions.toMap)
    } finally conn.close()
  }

  /** `no_data`/`never`/`schema_only` modes: record the current
    * position only — existing rows are never delivered. */
  def snapshotSchemaOnly(): Unit = {
    val snapDir = Files.createDirectories(dbDir.resolve("snapshot"))
    Files.createDirectories(dbDir.resolve("wal"))
    val conn = DriverManager.getConnection(jdbcUrl)
    try {
      val positions = mutable.Map.empty[String, Position]
      tables.foreach { t =>
        positions(t.ci) = currentPosition(conn, t)
        val tmp = snapDir.resolve(s".${t.qualified}.jsonl.tmp")
        Files.writeString(tmp, "")
        Files.move(tmp, snapDir.resolve(s"${t.qualified}.jsonl"),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      }
      signalTable.foreach { case (t, _) =>
        positions(t.ci) = currentPosition(conn, t) }
      Files.writeString(snapDir.resolve("_lsn"), "0")
      writeState(0L, positions.toMap)
    } finally conn.close()
  }

  /** Serializes WAL-segment producers: the poll loop (daemon thread)
    * and the incremental snapshot (signal thread) both allocate
    * `wal-<seq>` names from the directory listing and advance the
    * state file — unsynchronized interleaving would overwrite a
    * segment and lose its changes. Chunk-grained: the snapshot holds
    * it per chunk cycle, so capture keeps flowing between chunks. */
  private val pollLock = new Object

  /** One poll: per table, decode change rows past the stored position
    * into envelope lines, append bounded WAL segments. State advances
    * with every flush. Returns envelope lines written. */
  def poll(maxSegmentRecords: Int = 10000): Int =
    pollWith(maxSegmentRecords)((_, _, _) => ())

  /** [[poll]] with an observer invoked for every decoded change —
    * the incremental-snapshot path watches the keys changing inside
    * a watermark window without a second decode pass (and passes its
    * already-open connection via `reuse`). */
  private def pollWith(maxSegmentRecords: Int = 10000,
                       reuse: Option[java.sql.Connection] = None)
                      (onChange: (TableSpec, Position, Change) => Unit): Int = pollLock.synchronized {
    require(Files.exists(stateFile),
      s"$connectorName tailer: snapshot() must run before poll()")
    require(maxSegmentRecords > 0, "maxSegmentRecords must be positive")
    val (lsn0, pos0) = readState()
    var lsn = lsn0
    val positions = mutable.Map(pos0.toSeq: _*)
    val buf = mutable.ArrayBuffer.empty[String]
    var total = 0
    val walDir = Files.createDirectories(dbDir.resolve("wal"))
    var seq = CdcLayout.walFiles(dbDir).size
    def flush(): Unit = if (buf.nonEmpty) {
      val tmp = walDir.resolve(f".wal-$seq%06d.jsonl.tmp")
      Files.writeString(tmp, buf.mkString("", "\n", "\n"))
      Files.move(tmp, walDir.resolve(f"wal-$seq%06d.jsonl"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      seq += 1
      writeState(lsn, positions.toMap)
      total += buf.size
      buf.clear()
    }
    var signalsSeen = false
    val conn = reuse.getOrElse(DriverManager.getConnection(jdbcUrl))
    try {
      tables.foreach { t =>
        val from = positions.getOrElse(t.ci, Position.Min)
        forEachChange(conn, t, from) { (pos, ch) =>
          lsn += 1
          observeColumns(t, ch, lsn)
          buf += envelope(t, ch.op, ch.before, ch.after, ch.keyFrom, lsn)
          if (ch.op == "d" && emitTombstones) buf += tombstone(t, ch.keyFrom)
          positions(t.ci) = pos
          onChange(t, pos, ch)
          if (buf.size >= maxSegmentRecords) flush()
        }
      }
      // signal collection: control, not data — inserts decode to
      // signals, nothing reaches the WAL, updates/deletes are ignored
      // (the reference's signal table is insert-only)
      signalTable.foreach { case (t, onSignal) =>
        val from = positions.getOrElse(t.ci, Position.Min)
        forEachChange(conn, t, from) { (pos, ch) =>
          if (ch.op == "c") ch.after.foreach(a => onSignal(decodeSignal(a)))
          positions(t.ci) = pos
          signalsSeen = true
        }
      }
    } finally if (reuse.isEmpty) conn.close()
    flush()
    // signal-only polls still advance durable state, or every later
    // poll would re-deliver the same control messages
    if (signalsSeen) writeState(lsn, positions.toMap)
    total
  }

  /** DBLog-style incremental snapshot (Design Document: "DBLog: A
    * Watermark Based Change-Data-Capture Framework", Netflix 2019 —
    * the algorithm behind the reference's `execute-snapshot`
    * incremental signal): read each table in primary-key-ordered
    * chunks WHILE the change stream keeps flowing, and for every
    * chunk drain the change feed as the high-watermark step — a
    * chunk row whose key changed inside the window is DROPPED (the
    * change event, which is newer and already in the layout, wins);
    * surviving rows append as op='r' `snapshot="incremental"`
    * envelopes AFTER the window's changes, so latest-state-by-LSN
    * downstream converges to the live table without ever pausing
    * capture.
    *
    * Memory is bounded by `chunkSize` rows plus the keys that
    * changed inside one window — never a table image. Keyset
    * pagination (lexicographic key predicate, no OFFSET) keeps each
    * chunk query an index range scan at any table size.
    *
    * Returns the number of snapshot rows emitted (dropped chunk rows
    * are not counted; their state flowed through the change
    * events). */
  def incrementalSnapshot(chunkSize: Int = 1024, maxSegmentRecords: Int = 10000,
                          /** Restrict to one table — the
                            * `execute-snapshot` signal's
                            * data-collection field (`schema.table`
                            * or bare table name). */
                          only: Option[String] = None): Int = {
    require(Files.exists(stateFile),
      s"$connectorName tailer: snapshot()/snapshotSchemaOnly() must run before " +
      "incrementalSnapshot()")
    require(chunkSize > 0, "chunkSize must be positive")
    val selected = tables.filter(t =>
      only.forall(o => t.qualified == o || t.table == o))
    require(only.isEmpty || selected.nonEmpty,
      s"$connectorName tailer: no captured table matches '${only.get}' " +
      s"(captured: ${tables.map(_.qualified).mkString(", ")})")
    val conn = DriverManager.getConnection(jdbcUrl)
    var emitted = 0
    // a prior ABORT clears; a standing PAUSE holds (resume-snapshot
    // releases it) — pause/stop target whichever snapshot is in flight
    snapState.compareAndSet(SnapStopped, SnapRunning)
    snapExcluded.clear()
    notifier.emit(graft.services.Notifications.AggregateIncrementalSnapshot,
      "STARTED", Map("data_collections" -> selected.map(_.qualified).mkString(",")))
    var aborted = false
    try {
      selected.foreach { t =>
        if (!aborted && !snapExcluded.contains(t.qualified)) {
          val keyCols = t.keyCols.map(_.toLowerCase)
          var lastKey: Option[Seq[Any]] = None
          var scanned = 0
          var done = false
          while (!done) {
            // signals act BETWEEN chunk cycles (never inside pollLock,
            // so a paused snapshot can't starve the poll daemon)
            while (snapState.get() == SnapPaused) Thread.sleep(10)
            if (snapState.get() == SnapStopped || snapExcluded.contains(t.qualified)) {
              done = true
              if (snapState.get() == SnapStopped) aborted = true
            } else
            // one chunk cycle is ATOMIC wrt the poll daemon: if a
            // concurrent poll drained the window's changes between our
            // chunk read and our own drain, `changed` would miss them
            // and a stale chunk row would outrank the newer change
            pollLock.synchronized {
              val chunk = readChunk(conn, t, keyCols, lastKey, chunkSize)
              if (chunk.isEmpty) done = true
              else {
                // high watermark: drain the live feed — every change in
                // the window lands in the layout BEFORE the chunk rows,
                // and its keys supersede their chunk reads
                val changed = mutable.Set.empty[Seq[String]]
                pollWith(maxSegmentRecords, reuse = Some(conn)) { (ct, _, ch) =>
                  if (ct.ci == t.ci)
                    changed += keyCols.map(k => keyNorm(ch.keyFrom(k)))
                }
                val survivors = chunk.filterNot(m =>
                  changed.contains(keyCols.map(k => keyNorm(m(k)))))
                appendReadSegment(t, survivors, snapshot = "incremental", maxSegmentRecords)
                emitted += survivors.size
                scanned += chunk.size
                lastKey = Some(keyCols.map(chunk.last))
              }
            }
          }
          if (!aborted && !snapExcluded.contains(t.qualified))
            notifier.emit(graft.services.Notifications.AggregateIncrementalSnapshot,
              "TABLE_SCAN_COMPLETED",
              Map("data_collection" -> t.qualified,
                  "scanned_rows" -> scanned.toString,
                  "emitted_rows" -> emitted.toString))
        }
      }
    } finally conn.close()
    notifier.emit(graft.services.Notifications.AggregateIncrementalSnapshot,
      if (aborted) "ABORTED" else "COMPLETED",
      Map("emitted_rows" -> emitted.toString))
    emitted
  }

  // ------------------------------------------------------------------
  // Incremental-snapshot control — the upstream signal surface beyond
  // execute-snapshot: stop-snapshot (whole run or named collections),
  // pause-snapshot, resume-snapshot. Signals arrive on another thread
  // (REST/file channel → CdcPipeline.processSignals) while
  // incrementalSnapshot runs; the loop observes state between chunk
  // cycles, so a chunk is never torn.

  private val SnapRunning = 0; private val SnapPaused = 1; private val SnapStopped = 2
  private val snapState = new java.util.concurrent.atomic.AtomicInteger(SnapRunning)
  private val snapExcluded =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]().asScala
  private var notifier: graft.services.Notifications.Dispatcher =
    graft.services.Notifications.Dispatcher.disabled

  /** Attach the notification dispatcher progress events fan out to. */
  def withNotifications(d: graft.services.Notifications.Dispatcher): this.type = {
    notifier = d; this
  }

  /** `pause-snapshot`: the chunk loop parks before its next cycle. */
  def pauseIncrementalSnapshot(): Unit =
    if (snapState.compareAndSet(SnapRunning, SnapPaused))
      notifier.emit(graft.services.Notifications.AggregateIncrementalSnapshot, "PAUSED")

  /** `resume-snapshot`. */
  def resumeIncrementalSnapshot(): Unit =
    if (snapState.compareAndSet(SnapPaused, SnapRunning))
      notifier.emit(graft.services.Notifications.AggregateIncrementalSnapshot, "RESUMED")

  /** `stop-snapshot`: with a collection named, only that table leaves
    * the run (rows already emitted stand — they are op='r' state the
    * downstream converges over); with none, the whole run aborts. */
  def stopIncrementalSnapshot(collection: Option[String] = None): Unit =
    collection match {
      case Some(c) =>
        tables.filter(t => t.qualified == c || t.table == c)
          .foreach(t => snapExcluded += t.qualified)
      case None =>
        snapState.set(SnapStopped)
    }

  /** Canonical string form of a key value for watermark matching —
    * the chunk side (JDBC `getObject`) and the change side (dialect
    * decode) may yield different runtime types for the same key:
    * DECIMAL scales differ (`5.00` vs `5`), integral widths differ
    * (Integer vs Long), byte arrays compare by identity. Numbers
    * normalize through scale-stripped BigDecimal; bytes through hex. */
  private def keyNorm(v: Any): String = v match {
    case null => "\u0000null"
    case b: Array[Byte] => b.map(x => f"$x%02x").mkString
    case n: java.math.BigDecimal => n.stripTrailingZeros.toPlainString
    case n: Number => new java.math.BigDecimal(n.toString).stripTrailingZeros.toPlainString
    case other => String.valueOf(other)
  }

  /** Chunk query text — `FETCH FIRST` is the SQL-standard row limit
    * (Derby/Oracle/DB2/CockroachDB); dialects that spell it
    * differently (T-SQL `TOP`, GoogleSQL `LIMIT`) override. */
  protected def chunkQuery(t: TableSpec, where: String, order: String,
                           chunkSize: Int): String =
    s"SELECT * FROM ${t.qualified} $where" +
      s"ORDER BY $order FETCH FIRST $chunkSize ROWS ONLY"

  /** One keyset-paginated chunk: rows with key lexicographically
    * after `lastKey`, in key order. The predicate expands to
    * `(k1 > ?) OR (k1 = ? AND k2 > ?) OR …` — an index range scan,
    * never OFFSET. */
  private def readChunk(conn: java.sql.Connection, t: TableSpec,
                        keyCols: Seq[String], lastKey: Option[Seq[Any]],
                        chunkSize: Int): Seq[Map[String, Any]] = {
    val order = keyCols.mkString(", ")
    val where = lastKey.fold("") { _ =>
      val disjuncts = keyCols.indices.map { i =>
        val eqs = (0 until i).map(j => s"${keyCols(j)} = ?")
        (eqs :+ s"${keyCols(i)} > ?").mkString("(", " AND ", ")")
      }
      disjuncts.mkString("WHERE ", " OR ", " ")
    }
    val sql = chunkQuery(t, where, order, chunkSize)
    val ps = conn.prepareStatement(sql)
    try {
      lastKey.foreach { lk =>
        var bind = 1
        keyCols.indices.foreach { i =>
          (0 to i).foreach { j => ps.setObject(bind, lk(j)); bind += 1 }
        }
      }
      val rs = ps.executeQuery()
      val out = mutable.ArrayBuffer.empty[Map[String, Any]]
      while (rs.next()) out += rowMap(rs)
      out.toSeq
    } finally ps.close()
  }

  /** Append `rows` as op='r' envelopes in bounded WAL segments. */
  private def appendReadSegment(t: TableSpec, rows: Seq[Map[String, Any]],
                                snapshot: String, maxSegmentRecords: Int): Unit = {
    if (rows.isEmpty) return
    val (lsn0, positions) = readState()
    var lsn = lsn0
    val walDir = Files.createDirectories(dbDir.resolve("wal"))
    var seq = CdcLayout.walFiles(dbDir).size
    rows.grouped(maxSegmentRecords).foreach { group =>
      val lines = group.map { m =>
        lsn += 1
        envelope(t, "r", None, Some(m), keyFrom = m, lsn, snapshot = snapshot)
      }
      val tmp = walDir.resolve(f".wal-$seq%06d.jsonl.tmp")
      Files.writeString(tmp, lines.mkString("", "\n", "\n"))
      Files.move(tmp, walDir.resolve(f"wal-$seq%06d.jsonl"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      seq += 1
      writeState(lsn, positions)
    }
  }

  /** Stream every ResultSet row to `out`, one envelope line at a
    * time — the write granularity is ONE row, independent of table
    * size (footprint-asserted by NativeCdcSnapshotSpec). */
  protected[cdc] def writeSnapshotRows(rs: ResultSet, out: java.io.Writer): Long = {
    var n = 0L
    while (rs.next()) { out.write(CdcJson.obj(rowMap(rs))); out.write("\n"); n += 1 }
    n
  }

  protected def rowMap(rs: ResultSet): Map[String, Any] = {
    val md = rs.getMetaData
    (1 to md.getColumnCount).map { i =>
      md.getColumnLabel(i).toLowerCase -> rs.getObject(i)
    }.toMap
  }

  private def envelope(t: TableSpec, op: String,
                       before: Option[Map[String, Any]], after: Option[Map[String, Any]],
                       keyFrom: Map[String, Any], lsn: Long,
                       snapshot: String = "false"): String = {
    val key = CdcJson.obj(t.keyCols.map(k => k.toLowerCase -> keyFrom(k.toLowerCase)).toMap)
    s"""{"destination":"$topicPrefix.${t.qualified}","key":$key,""" +
      s""""value":{"op":"$op","before":${before.fold("null")(CdcJson.obj)},""" +
      s""""after":${after.fold("null")(CdcJson.obj)},""" +
      s""""source":{"connector":"$connectorName","db":"$dbName","schema":"${t.schema}",""" +
      s""""table":"${t.table}","lsn":$lsn,"snapshot":"$snapshot","ts_ms":0},"ts_ms":0},"headers":{}}"""
  }

  private def tombstone(t: TableSpec, keyFrom: Map[String, Any]): String = {
    val key = CdcJson.obj(t.keyCols.map(k => k.toLowerCase -> keyFrom(k.toLowerCase)).toMap)
    s"""{"destination":"$topicPrefix.${t.qualified}","key":$key,"value":null,"headers":{}}"""
  }

  /** State file: "lsn <counter>" + "pos <captureInstance> <lsn>:<seq>"
    * hex lines, written atomically. */
  private def writeState(lsn: Long, positions: Map[String, Position]): Unit = {
    val tmp = dbDir.resolve(s"$stateFileName.tmp")
    Files.writeString(tmp,
      (s"lsn $lsn" +: positions.toSeq.sortBy(_._1).map { case (ci, p) =>
        s"pos $ci ${p.render}" }).mkString("", "\n", "\n"))
    Files.move(tmp, stateFile,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def readState(): (Long, Map[String, Position]) = {
    val lines = Files.readAllLines(stateFile).asScala.filter(_.nonEmpty)
    val lsn = lines.head.stripPrefix("lsn ").trim.toLong
    val positions = lines.tail.filter(_.startsWith("pos ")).map { l =>
      val Array(_, ci, p) = l.split(" ", 3); ci -> Position.parse(p)
    }.toMap
    (lsn, positions)
  }
}
