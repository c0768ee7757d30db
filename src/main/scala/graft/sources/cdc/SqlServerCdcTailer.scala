package graft.sources.cdc

import java.nio.file.Path
import java.sql.PreparedStatement

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
  * Snapshot / WAL-segment / position lifecycle is the shared
  * [[NativeCdcTailer]]; this class contributes the change-table
  * dialects and the op-code pairing.
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
  */
object SqlServerCdcTailer {

  type TableSpec = NativeCdc.TableSpec
  val TableSpec: NativeCdc.TableSpec.type = NativeCdc.TableSpec
  type Position = NativeCdc.Position
  val Position: NativeCdc.Position.type = NativeCdc.Position
  type Daemon = NativeCdc.Daemon
  private[sources] def bigIntOf(v: Any): BigInt = NativeCdc.bigIntOf(v)

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
    val tables = NativeCdc.parseTableSpecs(req("debezium.source.sqlserver.tables"))
    new SqlServerCdcTailer(req("debezium.source.jdbc.url"),
      java.nio.file.Paths.get(req("debezium.source.path")), tables,
      dialect = if (props.get("debezium.source.sqlserver.emulated").contains("true"))
        EmulatedDialect else SqlServerDialect,
      topicPrefix = props.getOrElse("debezium.source.topic.prefix", "testc"))
  }
}

final class SqlServerCdcTailer(jdbcUrl: String, dbDir: Path,
                               tables: Seq[SqlServerCdcTailer.TableSpec],
                               dialect: SqlServerCdcTailer.Dialect =
                                 SqlServerCdcTailer.SqlServerDialect,
                               topicPrefix: String = "testc",
                               dbName: String = "db",
                               emitTombstones: Boolean = true)
    extends NativeCdcTailer(jdbcUrl, dbDir, tables, topicPrefix, dbName, emitTombstones) {
  import NativeCdc._
  import SqlServerCdcTailer.bigIntOf

  override def connectorName: String = "sqlserver"

  /** T-SQL has no bare `FETCH FIRST` (it requires OFFSET); `TOP` is
    * the native row limit. */
  override protected def chunkQuery(t: TableSpec, where: String, order: String,
                                    chunkSize: Int): String =
    s"SELECT TOP ($chunkSize) * FROM ${t.qualified} ${where}ORDER BY $order"
  override def stateFileName: String = "_sqlserver_state"

  /** The exact change-polling SQL per table (asserted by the spec —
    * the live dialect's TVF text is the deployable artifact). */
  def changesSqlFor(t: TableSpec): String = dialect.changesSql(t)

  override protected def currentPosition(conn: java.sql.Connection,
                                         t: TableSpec): Position =
    dialect.currentPosition(conn, t)

  /** Decode op codes into complete events: 2→'c'; the op-3 BEFORE
    * image rides just ahead of its op-4 partner on equal
    * (`__$start_lsn`,`__$seqval`) and pairs into one 'u'; 1→'d'. */
  override protected def forEachChange(conn: java.sql.Connection, t: TableSpec,
                                       from: Position)
                                      (emit: (Position, Change) => Unit): Unit = {
    val ps = conn.prepareStatement(dialect.changesSql(t))
    try {
      dialect.bindFrom(ps, from)
      val rs = ps.executeQuery()
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
              emit(pos, Change("u", before, Some(row), keyFrom = row))
            case 2 =>
              emit(pos, Change("c", None, Some(row), keyFrom = row))
            case 1 =>
              emit(pos, Change("d", Some(row), None, keyFrom = row))
            case other => throw new IllegalArgumentException(
              s"sqlserver cdc: unknown __\\$$operation $other at $pos " +
              "(1=delete, 2=insert, 3=update-before, 4=update-after)")
          }
        }
      }
    } finally ps.close()
  }
}
