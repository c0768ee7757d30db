package graft.sources.cdc

import java.nio.file.{Files, Path, StandardCopyOption}
import java.sql.{DriverManager, PreparedStatement, ResultSet}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** SQL Server CDC change-table capture — the native-CDC middle ground
  * between watermark polling and a log-protocol decoder (reference
  * connector matrix: debezium-server-dist/pom.xml:359-389). When CDC
  * is enabled, SQL Server materializes every table's changes into a
  * change table `cdc.<capture_instance>_CT` whose public shape is
  * plain SQL — no socket protocol needed:
  *
  *  - `__$start_lsn binary(10)` — commit LSN of the change's
  *    transaction (the log's total order);
  *  - `__$seqval binary(10)` — orders changes WITHIN a transaction;
  *  - `__$operation int` — 1=delete, 2=insert, 3=update BEFORE image,
  *    4=update AFTER image;
  *  - then the captured source columns (the row image).
  *
  * Polling the documented TVF
  * `cdc.fn_cdc_get_all_changes_<capture_instance>(@from, @to,
  * N'all update old')` yields exactly those rows — including the two
  * change shapes the generic [[JdbcPollingTailer]] can never observe:
  * HARD deletes (op 1 carries the deleted row image) and UPDATE BEFORE
  * images (op 3 rows, requested by the `all update old` row filter,
  * pair with their op 4 row on equal (`__$start_lsn`,`__$seqval`)).
  *
  * The tailer writes the same on-disk [[CdcLayout]] the DSv2
  * `graft-cdc` source reads: snapshot dump + `_lsn` + WAL segments of
  * envelope lines, so include lists, LSN offsets, pushed filters and
  * every sink are unchanged downstream.
  *
  * Dialects: [[SqlServerCdcTailer.SqlServerDialect]] emits the real
  * T-SQL (TVF call bounded by `sys.fn_cdc_get_max_lsn()`, binary(10)
  * LSN binds) — composable and string-asserted in-sandbox, runnable
  * only against a live SQL Server.
  * [[SqlServerCdcTailer.EmulatedDialect]] polls a change TABLE of the
  * same public shape directly with integer LSN binds — the
  * fixture-testable form (Derby hosts `cdc."<ci>_CT"` with the
  * `__$...` columns verbatim), and also a legitimate capture path
  * (querying `cdc.<ci>_CT` directly is how SQL Server's own
  * `sys.sp_cdc_scan` consumers read at scale).
  *
  * Position state is (`__$start_lsn`,`__$seqval`) per capture
  * instance, persisted as hex (binary(10) and bigint both order
  * correctly as unsigned big-endian), advancing with every segment
  * flush — a crash replays only past the last flushed position
  * (at-least-once; the epoch-idempotent / latest-state-by-LSN
  * downstream converges).
  */
object SqlServerCdcTailer {

  /** One captured table. `captureInstance` defaults to SQL Server's
    * own default naming, `<schema>_<table>`. */
  final case class TableSpec(schema: String, table: String, keyCols: Seq[String],
                             captureInstance: Option[String] = None) {
    def qualified: String = s"$schema.$table"
    def ci: String = captureInstance.getOrElse(s"${schema}_$table")
  }

  /** Change position: (commit LSN, intra-transaction sequence), both
    * unsigned big-endian (SQL Server binary(10) or an emulated
    * integer). Total order = (lsn, seq). */
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

  /** The SQL surface of a change-table source — where a live SQL
    * Server and the in-sandbox emulation differ. Both return rows of
    * the SAME public change-table shape, ordered by
    * (`__$start_lsn`,`__$seqval`,`__$operation`) so an update's
    * BEFORE row (op 3) immediately precedes its AFTER row (op 4). */
  trait Dialect {
    /** Query for all change rows of `t` at position STRICTLY AFTER the
      * bound parameters (re-fetch overlap is fine — the client filters
      * by position again). */
    def changesSql(t: TableSpec): String
    def bindFrom(ps: PreparedStatement, from: Position): Unit
    /** Current end-of-log position at snapshot time — changes at or
      * below it are already IN the snapshot. */
    def currentPosition(conn: java.sql.Connection, t: TableSpec): Position
  }

  /** Live SQL Server T-SQL: the documented all-changes TVF, lower
    * bound = last consumed commit LSN (inclusive — the client's
    * position filter drops the already-consumed prefix; `increment_lsn`
    * would skip a partially consumed transaction), upper bound = the
    * current log high-water. binary(10) binds. */
  object SqlServerDialect extends Dialect {
    override def changesSql(t: TableSpec): String =
      s"SELECT * FROM cdc.fn_cdc_get_all_changes_${t.ci}(?, sys.fn_cdc_get_max_lsn(), " +
        "N'all update old') " +
        "ORDER BY __$start_lsn, __$seqval, __$operation"
    override def bindFrom(ps: PreparedStatement, from: Position): Unit =
      ps.setBytes(1, lsnBytes(if (from.lsn.signum < 0) BigInt(0) else from.lsn))
    override def currentPosition(conn: java.sql.Connection, t: TableSpec): Position = {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery("SELECT sys.fn_cdc_get_max_lsn()")
        if (rs.next()) Position(bigIntOf(rs.getObject(1)), BigInt(Array.fill(10)(0xff.toByte)))
        else Position.Min
      } finally st.close()
    }
    /** binary(10) big-endian encoding of an LSN value. */
    private[sources] def lsnBytes(v: BigInt): Array[Byte] = {
      val raw = v.toByteArray.dropWhile(_ == 0)
      require(raw.length <= 10, s"LSN wider than binary(10): $v")
      Array.fill[Byte](10 - raw.length)(0) ++ raw
    }
  }

  /** Emulated/direct change-table polling: the same public columns and
    * op codes, read straight off `cdc.<ci>_CT` with integer position
    * binds — Derby hosts this shape verbatim for fixtures, and on a
    * live server the direct read is the documented shape of the
    * change table itself. */
  object EmulatedDialect extends Dialect {
    override def changesSql(t: TableSpec): String =
      s"""SELECT * FROM cdc."${t.ci}_CT" """ +
        """WHERE "__$start_lsn" > ? OR ("__$start_lsn" = ? AND "__$seqval" > ?) """ +
        """ORDER BY "__$start_lsn", "__$seqval", "__$operation""""
    override def bindFrom(ps: PreparedStatement, from: Position): Unit = {
      ps.setLong(1, from.lsn.toLong); ps.setLong(2, from.lsn.toLong)
      ps.setLong(3, from.seq.toLong)
    }
    override def currentPosition(conn: java.sql.Connection, t: TableSpec): Position = {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          s"""SELECT max("__$$start_lsn") FROM cdc."${t.ci}_CT"""")
        if (rs.next() && rs.getObject(1) != null)
          Position(bigIntOf(rs.getObject(1)), BigInt(Long.MaxValue))
        else Position.Min
      } finally st.close()
    }
  }

  private[sources] def bigIntOf(v: Any): BigInt = v match {
    case null => BigInt(-1)
    case b: Array[Byte] => BigInt(1, b)
    case n: java.math.BigDecimal => BigInt(n.toBigInteger)
    case n: Number => BigInt(n.longValue())
    case other => throw new IllegalArgumentException(s"unreadable LSN value: $other")
  }

  /** Config construction under the `debezium.source.*` namespace:
    *
    *   debezium.source.jdbc.url         = jdbc:...
    *   debezium.source.sqlserver.tables = schema.table:key1+key2[:captureInstance][,…]
    *   debezium.source.sqlserver.emulated = true|false (default false —
    *     true polls `cdc.<ci>_CT` directly instead of the TVF)
    */
  def fromProperties(props: Map[String, String]): SqlServerCdcTailer = {
    def req(k: String) = props.getOrElse(k,
      throw new IllegalArgumentException(s"missing $k"))
    val tables = req("debezium.source.sqlserver.tables")
      .split(",").map(_.trim).filter(_.nonEmpty).map { spec =>
        spec.split(":") match {
          case Array(qual, keys, rest @ _*) if rest.size <= 1 =>
            val Array(schema, table) = qual.split("\\.", 2)
            TableSpec(schema, table, keys.split("\\+").toSeq, rest.headOption)
          case _ => throw new IllegalArgumentException(
            s"bad table spec '$spec' (want schema.table:key1+key2[:captureInstance])")
        }
      }.toSeq
    new SqlServerCdcTailer(req("debezium.source.jdbc.url"),
      java.nio.file.Paths.get(req("debezium.source.path")), tables,
      dialect = if (props.get("debezium.source.sqlserver.emulated").contains("true"))
        EmulatedDialect else SqlServerDialect,
      topicPrefix = props.getOrElse("debezium.source.topic.prefix", "testc"))
  }

  /** Background poll loop — the connector-task thread (same shape as
    * [[JdbcPollingTailer.Daemon]]): errors count and retry next tick. */
  final class Daemon(tailer: SqlServerCdcTailer, intervalMs: Long,
                     onPoll: Int => Unit = _ => ()) extends AutoCloseable {
    private val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    @volatile private var errors = 0L
    private val thread = new Thread(() => {
      while (!stop.get()) {
        try onPoll(tailer.poll())
        catch { case _: Throwable if !stop.get() => errors += 1 }
        try Thread.sleep(intervalMs) catch { case _: InterruptedException => () }
      }
    }, "graft-sqlserver-tailer")
    thread.setDaemon(true)

    def start(): this.type = { thread.start(); this }
    def errorCount: Long = errors
    override def close(): Unit =
      if (stop.compareAndSet(false, true)) { thread.interrupt(); thread.join(5000) }
  }
}

final class SqlServerCdcTailer(jdbcUrl: String, dbDir: Path,
                               tables: Seq[SqlServerCdcTailer.TableSpec],
                               dialect: SqlServerCdcTailer.Dialect =
                                 SqlServerCdcTailer.SqlServerDialect,
                               topicPrefix: String = "testc",
                               dbName: String = "db",
                               /** Compaction tombstone after each
                                 * delete — `tombstones.on.delete`,
                                 * matching the log decoders. */
                               emitTombstones: Boolean = true) {
  import SqlServerCdcTailer._

  def tableSpecs: Seq[TableSpec] = tables
  /** The exact change-polling SQL per table (asserted by the spec —
    * the live dialect's TVF text is the deployable artifact). */
  def changesSqlFor(t: TableSpec): String = dialect.changesSql(t)

  private val stateFile = dbDir.resolve("_sqlserver_state")

  /** Consistent snapshot: one repeatable-read transaction dumps every
    * table to `snapshot/<schema>.<table>.jsonl` and records each
    * capture instance's CURRENT change-table position — changes at or
    * below it are part of the snapshot; polling starts strictly
    * after. */
  def snapshot(): Unit = {
    val snapDir = Files.createDirectories(dbDir.resolve("snapshot"))
    Files.createDirectories(dbDir.resolve("wal"))
    val conn = DriverManager.getConnection(jdbcUrl)
    try {
      conn.setAutoCommit(false)
      conn.setTransactionIsolation(java.sql.Connection.TRANSACTION_REPEATABLE_READ)
      val positions = mutable.Map.empty[String, Position]
      tables.foreach { t =>
        positions(t.ci) = dialect.currentPosition(conn, t)
        val rows = mutable.ArrayBuffer.empty[String]
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(s"SELECT * FROM ${t.qualified}")
          while (rs.next()) rows += CdcJson.obj(rowMap(rs))
        } finally st.close()
        val tmp = snapDir.resolve(s".${t.qualified}.jsonl.tmp")
        Files.writeString(tmp, rows.mkString("", "\n", "\n"))
        Files.move(tmp, snapDir.resolve(s"${t.qualified}.jsonl"),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      }
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
        positions(t.ci) = dialect.currentPosition(conn, t)
        val tmp = snapDir.resolve(s".${t.qualified}.jsonl.tmp")
        Files.writeString(tmp, "")
        Files.move(tmp, snapDir.resolve(s"${t.qualified}.jsonl"),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      }
      Files.writeString(snapDir.resolve("_lsn"), "0")
      writeState(0L, positions.toMap)
    } finally conn.close()
  }

  /** One poll: per capture instance, read change rows past the stored
    * position, decode op codes into envelopes (2→'c'; 3+4 pair→'u'
    * with the before image; 1→'d' + tombstone), append bounded WAL
    * segments. State advances with every flush. Returns envelope
    * lines written. */
  def poll(maxSegmentRecords: Int = 10000): Int = {
    require(Files.exists(stateFile), "sqlserver tailer: snapshot() must run before poll()")
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
    val conn = DriverManager.getConnection(jdbcUrl)
    try {
      tables.foreach { t =>
        val from = positions.getOrElse(t.ci, Position.Min)
        val ps = conn.prepareStatement(dialect.changesSql(t))
        try {
          dialect.bindFrom(ps, from)
          val rs = ps.executeQuery()
          // the op-3 BEFORE image riding just ahead of its op-4 row
          var pendingBefore: Option[(Position, Map[String, Any])] = None
          while (rs.next()) {
            val m = rowMap(rs)
            val pos = Position(bigIntOf(m("__$start_lsn")), bigIntOf(m("__$seqval")))
            if (pos > from) {
              val op = m("__$operation") match {
                case n: Number => n.intValue()
                case other => throw new IllegalArgumentException(s"bad __\\$$operation: $other")
              }
              val row = m.view.filterKeys(!_.startsWith("__$")).toMap
              op match {
                case 3 => // update BEFORE image: held for its op-4 partner
                  pendingBefore = Some((pos, row))
                case 4 =>
                  val before = pendingBefore.collect { case (p, r) if p == pos => r }
                  pendingBefore = None
                  lsn += 1
                  buf += envelope(t, "u", before, Some(row), keyFrom = row, lsn)
                case 2 =>
                  lsn += 1
                  buf += envelope(t, "c", None, Some(row), keyFrom = row, lsn)
                case 1 =>
                  lsn += 1
                  buf += envelope(t, "d", Some(row), None, keyFrom = row, lsn)
                  if (emitTombstones) buf += tombstone(t, row)
                case other => throw new IllegalArgumentException(
                  s"sqlserver cdc: unknown __\\$$operation $other at $pos " +
                  "(1=delete, 2=insert, 3=update-before, 4=update-after)")
              }
              positions(t.ci) = pos
              if (buf.size >= maxSegmentRecords && pendingBefore.isEmpty) flush()
            }
          }
        } finally ps.close()
      }
    } finally conn.close()
    flush()
    total
  }

  private def rowMap(rs: ResultSet): Map[String, Any] = {
    val md = rs.getMetaData
    (1 to md.getColumnCount).map { i =>
      md.getColumnLabel(i).toLowerCase -> rs.getObject(i)
    }.toMap
  }

  private def envelope(t: TableSpec, op: String,
                       before: Option[Map[String, Any]], after: Option[Map[String, Any]],
                       keyFrom: Map[String, Any], lsn: Long): String = {
    val key = CdcJson.obj(t.keyCols.map(k => k.toLowerCase -> keyFrom(k.toLowerCase)).toMap)
    s"""{"destination":"$topicPrefix.${t.qualified}","key":$key,""" +
      s""""value":{"op":"$op","before":${before.fold("null")(CdcJson.obj)},""" +
      s""""after":${after.fold("null")(CdcJson.obj)},""" +
      s""""source":{"connector":"sqlserver","db":"$dbName","schema":"${t.schema}",""" +
      s""""table":"${t.table}","lsn":$lsn,"snapshot":"false","ts_ms":0},"ts_ms":0},"headers":{}}"""
  }

  private def tombstone(t: TableSpec, keyFrom: Map[String, Any]): String = {
    val key = CdcJson.obj(t.keyCols.map(k => k.toLowerCase -> keyFrom(k.toLowerCase)).toMap)
    s"""{"destination":"$topicPrefix.${t.qualified}","key":$key,"value":null,"headers":{}}"""
  }

  /** State file: "lsn <counter>" + "pos <captureInstance> <lsn>:<seq>"
    * hex lines, written atomically. */
  private def writeState(lsn: Long, positions: Map[String, Position]): Unit = {
    val tmp = dbDir.resolve("_sqlserver_state.tmp")
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
