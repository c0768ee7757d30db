package graft.sources.cdc

import java.nio.file.Path
import java.sql.PreparedStatement

/** DB2 SQL-Replication CD-table capture — the third native-CDC family
  * (reference connector matrix: debezium-server-dist/pom.xml;
  * scaladoc plan: [[NativeCdcTailer]]). When a DB2 table is registered
  * for SQL Replication, the Capture program materializes its changes
  * into a change-data (CD) table whose public shape is plain SQL:
  *
  *  - `IBMSNAP_COMMITSEQ` — log sequence of the change's COMMIT (the
  *    log's total order; `char(10) for bit data` on a live DB2);
  *  - `IBMSNAP_INTENTSEQ` — log sequence of the change itself, which
  *    orders changes WITHIN a transaction;
  *  - `IBMSNAP_OPERATION char(1)` — 'I' insert, 'U' update,
  *    'D' delete;
  *  - then the captured source columns (the AFTER image for I/U, the
  *    deleted row for D), and — when the registration requested
  *    before images — one `<prefix><column>` before-image column per
  *    captured column (IBM's documented BEFORE_IMG_PREFIX, default
  *    'X').
  *
  * That surface carries exactly what watermark polling cannot see:
  * HARD deletes (the 'D' row image) and UPDATE BEFORE images (the
  * prefixed columns of a 'U' row).
  *
  * Snapshot / WAL-segment / position lifecycle is the shared
  * [[NativeCdcTailer]]; this class contributes the CD-table dialects
  * and the I/U/D + before-image-prefix decode.
  *
  * Dialects: [[Db2CdTailer.Db2Dialect]] emits the real DB2 SQL (the
  * ASN-schema CD table with `char(10) for bit data` sequence binds,
  * high-water from `ASN.IBMSNAP_REGISTER.SYNCHPOINT`) — composable
  * and string-asserted in-sandbox, runnable only against a live DB2.
  * [[Db2CdTailer.EmulatedDialect]] polls a CD TABLE of the same
  * public shape with integer sequence binds (Derby hosts
  * `asn."<ci>_CD"` with the `IBMSNAP_*` columns verbatim) — the
  * fixture-testable form.
  */
object Db2CdTailer {

  type TableSpec = NativeCdc.TableSpec
  val TableSpec: NativeCdc.TableSpec.type = NativeCdc.TableSpec
  type Position = NativeCdc.Position
  val Position: NativeCdc.Position.type = NativeCdc.Position
  type Daemon = NativeCdc.Daemon
  private[sources] def bigIntOf(v: Any): BigInt = NativeCdc.bigIntOf(v)

  /** The SQL surface of a CD-table source — where a live DB2 and the
    * in-sandbox emulation differ. Both return rows of the SAME public
    * CD shape, ordered by (`IBMSNAP_COMMITSEQ`,`IBMSNAP_INTENTSEQ`) —
    * commit order, then intra-transaction order. */
  trait Dialect {
    /** Query for all CD rows of `t` at position STRICTLY AFTER the
      * bound parameters (re-fetch overlap is fine — the client
      * filters by position again). */
    def changesSql(t: TableSpec): String
    def bindFrom(ps: PreparedStatement, from: Position): Unit
    /** Current end-of-log position at snapshot time — changes at or
      * below it are already IN the snapshot. */
    def currentPosition(conn: java.sql.Connection, t: TableSpec): Position
  }

  /** Live DB2: the ASN-schema CD table with binary sequence binds;
    * the capture high-water is the Capture program's SYNCHPOINT in
    * the register table. */
  object Db2Dialect extends Dialect {
    override def changesSql(t: TableSpec): String =
      s"""SELECT * FROM ASN."${t.ci}_CD" """ +
        "WHERE IBMSNAP_COMMITSEQ > ? OR (IBMSNAP_COMMITSEQ = ? AND IBMSNAP_INTENTSEQ > ?) " +
        "ORDER BY IBMSNAP_COMMITSEQ, IBMSNAP_INTENTSEQ"
    override def bindFrom(ps: PreparedStatement, from: Position): Unit = {
      val lsn = seqBytes(if (from.lsn.signum < 0) BigInt(0) else from.lsn)
      val seq = seqBytes(if (from.seq.signum < 0) BigInt(0) else from.seq)
      ps.setBytes(1, lsn); ps.setBytes(2, lsn); ps.setBytes(3, seq)
    }
    override def currentPosition(conn: java.sql.Connection, t: TableSpec): Position = {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          "SELECT MAX(SYNCHPOINT) FROM ASN.IBMSNAP_REGISTER " +
          s"WHERE SOURCE_OWNER = '${t.schema.toUpperCase}' " +
          s"AND SOURCE_TABLE = '${t.table.toUpperCase}'")
        if (rs.next() && rs.getObject(1) != null)
          // UNSIGNED max: the signed BigInt(Array) constructor would
          // read ten 0xff bytes as -1 and re-deliver in-snapshot rows
          Position(bigIntOf(rs.getObject(1)), BigInt(1, Array.fill(10)(0xff.toByte)))
        else Position.Min
      } finally st.close()
    }
    /** `char(10) for bit data` big-endian encoding of a sequence. */
    private[sources] def seqBytes(v: BigInt): Array[Byte] = {
      val raw = v.toByteArray.dropWhile(_ == 0)
      require(raw.length <= 10, s"sequence wider than char(10): $v")
      Array.fill[Byte](10 - raw.length)(0) ++ raw
    }
  }

  /** Emulated CD-table polling: the same public columns with integer
    * sequence binds — Derby hosts this shape verbatim for fixtures. */
  object EmulatedDialect extends Dialect {
    override def changesSql(t: TableSpec): String =
      s"""SELECT * FROM asn."${t.ci}_CD" """ +
        "WHERE ibmsnap_commitseq > ? OR (ibmsnap_commitseq = ? AND ibmsnap_intentseq > ?) " +
        "ORDER BY ibmsnap_commitseq, ibmsnap_intentseq"
    override def bindFrom(ps: PreparedStatement, from: Position): Unit = {
      ps.setLong(1, from.lsn.toLong); ps.setLong(2, from.lsn.toLong)
      ps.setLong(3, from.seq.toLong)
    }
    override def currentPosition(conn: java.sql.Connection, t: TableSpec): Position = {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(s"""SELECT max(ibmsnap_commitseq) FROM asn."${t.ci}_CD"""")
        if (rs.next() && rs.getObject(1) != null)
          Position(bigIntOf(rs.getObject(1)), BigInt(Long.MaxValue))
        else Position.Min
      } finally st.close()
    }
  }

  /** Config construction under the `debezium.source.*` namespace:
    *
    *   debezium.source.jdbc.url          = jdbc:...
    *   debezium.source.db2.tables        = schema.table:key1+key2[:captureInstance][,…]
    *   debezium.source.db2.emulated      = true|false (default false)
    *   debezium.source.db2.before.prefix = before-image column prefix
    *     (default "X" — IBM's BEFORE_IMG_PREFIX default)
    */
  def fromProperties(props: Map[String, String]): Db2CdTailer = {
    def req(k: String) = props.getOrElse(k,
      throw new IllegalArgumentException(s"missing $k"))
    val tables = NativeCdc.parseTableSpecs(req("debezium.source.db2.tables"))
    new Db2CdTailer(req("debezium.source.jdbc.url"),
      java.nio.file.Paths.get(req("debezium.source.path")), tables,
      dialect = if (props.get("debezium.source.db2.emulated").contains("true"))
        EmulatedDialect else Db2Dialect,
      topicPrefix = props.getOrElse("debezium.source.topic.prefix", "testc"),
      beforePrefix = props.getOrElse("debezium.source.db2.before.prefix", "X"))
  }
}

final class Db2CdTailer(jdbcUrl: String, dbDir: Path,
                        tables: Seq[Db2CdTailer.TableSpec],
                        dialect: Db2CdTailer.Dialect = Db2CdTailer.Db2Dialect,
                        topicPrefix: String = "testc",
                        dbName: String = "db",
                        emitTombstones: Boolean = true,
                        /** Before-image column prefix (IBM's
                          * BEFORE_IMG_PREFIX, default 'X'). */
                        beforePrefix: String = "X")
    extends NativeCdcTailer(jdbcUrl, dbDir, tables, topicPrefix, dbName, emitTombstones) {
  import NativeCdc._
  import Db2CdTailer.bigIntOf

  override def connectorName: String = "db2"
  override def stateFileName: String = "_db2_state"

  /** The exact change-polling SQL per table (asserted by the spec —
    * the live dialect's ASN CD-table text is the deployable
    * artifact). */
  def changesSqlFor(t: TableSpec): String = dialect.changesSql(t)

  override protected def currentPosition(conn: java.sql.Connection,
                                         t: TableSpec): Position =
    dialect.currentPosition(conn, t)

  /** Decode CD rows into complete events: 'I' → 'c' (after = row
    * image); 'U' → 'u' (after = row image, before = the prefixed
    * before-image columns overlaid on it); 'D' → 'd' (before = row
    * image). Prefixed columns are recognized as before-image ONLY
    * when the unprefixed column also exists in the CD row — a real
    * column that merely starts with the prefix letter is untouched. */
  override protected def forEachChange(conn: java.sql.Connection, t: TableSpec,
                                       from: Position)
                                      (emit: (Position, Change) => Unit): Unit = {
    val ps = conn.prepareStatement(dialect.changesSql(t))
    try {
      dialect.bindFrom(ps, from)
      val rs = ps.executeQuery()
      val pfx = beforePrefix.toLowerCase
      while (rs.next()) {
        val m = rowMap(rs)
        val pos = Position(bigIntOf(m("ibmsnap_commitseq")), bigIntOf(m("ibmsnap_intentseq")))
        if (pos > from) {
          val op = m("ibmsnap_operation") match {
            case s: String => s.trim.toUpperCase
            case other => throw new IllegalArgumentException(
              s"db2 cd: unreadable IBMSNAP_OPERATION at $pos: $other")
          }
          val data = m.view.filterKeys(!_.startsWith("ibmsnap_")).toMap
          val beforeCols = data.keySet.filter(k =>
            k.startsWith(pfx) && data.contains(k.stripPrefix(pfx)))
          val image = (data -- beforeCols)
          op match {
            case "I" =>
              emit(pos, Change("c", None, Some(image), keyFrom = image))
            case "U" =>
              val before = image ++ beforeCols.map(k => k.stripPrefix(pfx) -> data(k))
              emit(pos, Change("u", Some(before), Some(image), keyFrom = image))
            case "D" =>
              emit(pos, Change("d", Some(image), None, keyFrom = image))
            case other => throw new IllegalArgumentException(
              s"db2 cd: unknown IBMSNAP_OPERATION '$other' at $pos (I/U/D)")
          }
        }
      }
    } finally ps.close()
  }
}
