package graft.sources.cdc

import java.nio.file.Path
import java.sql.PreparedStatement

/** Oracle LogMiner redo capture — the second native-CDC family
  * (reference connector matrix: debezium-server-dist/pom.xml:359-389).
  * A CDC deployment enables supplemental logging of ALL columns and
  * mines the redo stream with the documented `DBMS_LOGMNR` package;
  * each mined change surfaces as one `V$LOGMNR_CONTENTS` row whose
  * public shape is plain SQL — no socket protocol:
  *
  *  - `SCN number` — system change number of the change (the redo
  *    log's total order);
  *  - `SSN number` — SQL sequence number, ordering the statements a
  *    single operation splits into;
  *  - `OPERATION varchar2` — INSERT / UPDATE / DELETE (plus DDL and
  *    internal rows, filtered out in SQL);
  *  - `SQL_REDO varchar2` — the reconstructed DML statement, carrying
  *    the full row image ([[OracleRedoParser]] decodes it).
  *
  * With ALL-column supplemental logging an UPDATE/DELETE's WHERE
  * clause is the complete BEFORE image, so redo SQL recovers exactly
  * the envelope surface a change table provides — the two shapes the
  * generic [[JdbcPollingTailer]] can never observe: HARD deletes (the
  * deleted row rides the WHERE predicate) and UPDATE BEFORE images
  * (WHERE = before, SET over it = after).
  *
  * Snapshot / WAL-segment / position lifecycle is the shared
  * [[NativeCdcTailer]]; this class contributes the LogMiner dialects
  * and the redo-SQL decode.
  *
  * Dialects: [[OracleLogMinerTailer.LogMinerDialect]] emits the real
  * Oracle SQL (a `DBMS_LOGMNR.START_LOGMNR` session block plus the
  * `V$LOGMNR_CONTENTS` poll with numeric SCN binds) — composable and
  * string-asserted in-sandbox, runnable only against a live Oracle.
  * [[OracleLogMinerTailer.EmulatedDialect]] polls a mined-contents
  * TABLE of the same public shape (Derby hosts
  * `logmnr."<ci>_CONTENTS"` with `SCN`/`SSN`/`OPERATION`/`SQL_REDO`
  * verbatim) — the fixture-testable form, and also the shape of an
  * offline mine (`DBMS_LOGMNR` sessions are routinely spooled into
  * plain tables for exactly this kind of downstream consumption).
  */
object OracleLogMinerTailer {

  type TableSpec = NativeCdc.TableSpec
  val TableSpec: NativeCdc.TableSpec.type = NativeCdc.TableSpec
  type Position = NativeCdc.Position
  val Position: NativeCdc.Position.type = NativeCdc.Position
  type Daemon = NativeCdc.Daemon
  private[sources] def bigIntOf(v: Any): BigInt = NativeCdc.bigIntOf(v)

  /** The SQL surface of a LogMiner source — where a live Oracle and
    * the in-sandbox emulation differ. Both return rows of the SAME
    * public mined-contents shape (`SCN`,`SSN`,`OPERATION`,`SQL_REDO`),
    * ordered by (`SCN`,`SSN`) — redo order. */
  trait Dialect {
    /** Query for the mined change rows of `t` at position STRICTLY
      * AFTER the bound parameters (re-fetch overlap is fine — the
      * client filters by position again). */
    def changesSql(t: TableSpec): String
    def bindFrom(ps: PreparedStatement, from: Position): Unit
    /** Current end-of-log position at snapshot time — changes at or
      * below it are already IN the snapshot. */
    def currentPosition(conn: java.sql.Connection, t: TableSpec): Position
    /** Per-poll session setup to run before [[changesSql]] (the
      * `START_LOGMNR` block on a live Oracle; none when the mined
      * contents are already materialized). */
    def sessionSetupSql(from: Position): Option[String] = None
  }

  /** Live Oracle: start a CONTINUOUS_MINE-less mining session from the
    * last consumed SCN (inclusive — the client's position filter drops
    * the consumed prefix; starting past it would skip a partially
    * consumed SCN), then poll `V$LOGMNR_CONTENTS` for the captured
    * table's DML with numeric SCN binds. */
  object LogMinerDialect extends Dialect {
    override def changesSql(t: TableSpec): String =
      "SELECT SCN, SSN, OPERATION, SQL_REDO FROM V$LOGMNR_CONTENTS " +
        s"WHERE SEG_OWNER = '${t.schema.toUpperCase}' " +
        s"AND TABLE_NAME = '${t.table.toUpperCase}' " +
        "AND OPERATION IN ('INSERT','UPDATE','DELETE') " +
        "AND (SCN > ? OR (SCN = ? AND SSN > ?)) " +
        "ORDER BY SCN, SSN"
    override def bindFrom(ps: PreparedStatement, from: Position): Unit = {
      val lsn = if (from.lsn.signum < 0) BigInt(0) else from.lsn
      val seq = if (from.seq.signum < 0) BigInt(-1) else from.seq
      ps.setBigDecimal(1, new java.math.BigDecimal(lsn.bigInteger))
      ps.setBigDecimal(2, new java.math.BigDecimal(lsn.bigInteger))
      ps.setBigDecimal(3, new java.math.BigDecimal(seq.bigInteger))
    }
    override def currentPosition(conn: java.sql.Connection, t: TableSpec): Position = {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery("SELECT CURRENT_SCN FROM V$DATABASE")
        if (rs.next()) Position(bigIntOf(rs.getObject(1)), BigInt(Long.MaxValue))
        else Position.Min
      } finally st.close()
    }
    /** The documented mining-session block: redo dictionary from the
      * online catalog, logs auto-added from the start SCN. */
    override def sessionSetupSql(from: Position): Option[String] = {
      val start = if (from.lsn.signum < 0) BigInt(0) else from.lsn
      Some("BEGIN DBMS_LOGMNR.START_LOGMNR(" +
        s"STARTSCN => $start, " +
        "OPTIONS => DBMS_LOGMNR.DICT_FROM_ONLINE_CATALOG + " +
        "DBMS_LOGMNR.COMMITTED_DATA_ONLY); END;")
    }
  }

  /** Emulated/offline mined contents: the same public columns read
    * straight off `logmnr."<ci>_CONTENTS"` with integer position
    * binds — Derby hosts this shape verbatim for fixtures. */
  object EmulatedDialect extends Dialect {
    override def changesSql(t: TableSpec): String =
      s"""SELECT * FROM logmnr."${t.ci}_CONTENTS" """ +
        "WHERE scn > ? OR (scn = ? AND ssn > ?) " +
        "ORDER BY scn, ssn"
    override def bindFrom(ps: PreparedStatement, from: Position): Unit = {
      ps.setLong(1, from.lsn.toLong); ps.setLong(2, from.lsn.toLong)
      ps.setLong(3, from.seq.toLong)
    }
    override def currentPosition(conn: java.sql.Connection, t: TableSpec): Position = {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(s"""SELECT max(scn) FROM logmnr."${t.ci}_CONTENTS"""")
        if (rs.next() && rs.getObject(1) != null)
          Position(bigIntOf(rs.getObject(1)), BigInt(Long.MaxValue))
        else Position.Min
      } finally st.close()
    }
  }

  /** Config construction under the `debezium.source.*` namespace:
    *
    *   debezium.source.jdbc.url       = jdbc:...
    *   debezium.source.oracle.tables  = schema.table:key1+key2[:captureInstance][,…]
    *   debezium.source.oracle.emulated = true|false (default false —
    *     true polls `logmnr."<ci>_CONTENTS"` directly instead of a
    *     live `DBMS_LOGMNR` session)
    */
  def fromProperties(props: Map[String, String]): OracleLogMinerTailer = {
    def req(k: String) = props.getOrElse(k,
      throw new IllegalArgumentException(s"missing $k"))
    val tables = NativeCdc.parseTableSpecs(req("debezium.source.oracle.tables"))
    new OracleLogMinerTailer(req("debezium.source.jdbc.url"),
      java.nio.file.Paths.get(req("debezium.source.path")), tables,
      dialect = if (props.get("debezium.source.oracle.emulated").contains("true"))
        EmulatedDialect else LogMinerDialect,
      topicPrefix = props.getOrElse("debezium.source.topic.prefix", "testc"))
  }
}

final class OracleLogMinerTailer(jdbcUrl: String, dbDir: Path,
                                 tables: Seq[OracleLogMinerTailer.TableSpec],
                                 dialect: OracleLogMinerTailer.Dialect =
                                   OracleLogMinerTailer.LogMinerDialect,
                                 topicPrefix: String = "testc",
                                 dbName: String = "db",
                                 emitTombstones: Boolean = true)
    extends NativeCdcTailer(jdbcUrl, dbDir, tables, topicPrefix, dbName, emitTombstones) {
  import NativeCdc._
  import OracleLogMinerTailer.bigIntOf

  override def connectorName: String = "oracle"
  override def stateFileName: String = "_oracle_state"

  /** The exact change-polling SQL per table (asserted by the spec —
    * the live dialect's V$LOGMNR_CONTENTS text is the deployable
    * artifact). */
  def changesSqlFor(t: TableSpec): String = dialect.changesSql(t)
  /** The live dialect's mining-session block (None when emulated). */
  def sessionSetupFor(from: Position): Option[String] = dialect.sessionSetupSql(from)

  override protected def currentPosition(conn: java.sql.Connection,
                                         t: TableSpec): Position =
    dialect.currentPosition(conn, t)

  /** Decode each mined row's `SQL_REDO` via [[OracleRedoParser]]:
    * INSERT → 'c' (after = VALUES image); UPDATE → 'u' (before = the
    * WHERE predicate image — complete under ALL-column supplemental
    * logging — after = before overlaid with SET); DELETE → 'd'
    * (before = WHERE image). Column names fold to lower case, the
    * layout's canonical form. */
  override protected def forEachChange(conn: java.sql.Connection, t: TableSpec,
                                       from: Position)
                                      (emit: (Position, Change) => Unit): Unit = {
    dialect.sessionSetupSql(from).foreach { setup =>
      val st = conn.createStatement()
      try st.execute(setup) finally st.close()
    }
    val ps = conn.prepareStatement(dialect.changesSql(t))
    try {
      dialect.bindFrom(ps, from)
      val rs = ps.executeQuery()
      while (rs.next()) {
        val m = rowMap(rs)
        val pos = Position(bigIntOf(m("scn")), bigIntOf(m("ssn")))
        if (pos > from) {
          val sqlRedo = m("sql_redo") match {
            case s: String => s
            case other => throw new IllegalArgumentException(
              s"oracle logminer: unreadable SQL_REDO at $pos: $other")
          }
          val dml = OracleRedoParser.parse(sqlRedo)
          // the mined row's own OPERATION must agree with the parsed
          // statement — a mismatch means the mine is corrupt, not data
          val op = m("operation") match {
            case s: String => s.toUpperCase
            case other => throw new IllegalArgumentException(
              s"oracle logminer: unreadable OPERATION at $pos: $other")
          }
          val expected = Map("INSERT" -> "c", "UPDATE" -> "u", "DELETE" -> "d")(op)
          require(dml.op == expected,
            s"oracle logminer: OPERATION $op but SQL_REDO parsed as '${dml.op}' at $pos")
          require(dml.owner.equalsIgnoreCase(t.schema) && dml.table.equalsIgnoreCase(t.table),
            s"oracle logminer: redo for ${dml.owner}.${dml.table} in ${t.qualified}'s feed at $pos")
          def lc(mm: Map[String, Any]): Map[String, Any] =
            mm.map { case (k, v) => k.toLowerCase -> v }
          dml.op match {
            case "c" =>
              val after = lc(dml.set)
              emit(pos, Change("c", None, Some(after), keyFrom = after))
            case "u" =>
              val before = lc(dml.where)
              val after = before ++ lc(dml.set)
              emit(pos, Change("u", Some(before), Some(after), keyFrom = after))
            case "d" =>
              val before = lc(dml.where)
              emit(pos, Change("d", Some(before), None, keyFrom = before))
          }
        }
      }
    } finally ps.close()
  }
}
