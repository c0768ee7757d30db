package graft.sources.cdc

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.Path
import java.sql.PreparedStatement

/** IBM i (AS/400) journal capture — the sixth native-CDC family
  * (reference connector matrix: debezium-server-dist/pom.xml:856,
  * `debezium-connector-ibmi`). Every journaled physical file's
  * changes land in a journal whose entries are queryable over plain
  * SQL via the `QSYS2.DISPLAY_JOURNAL` table function — the public,
  * documented surface:
  *
  *  - `SEQUENCE_NUMBER` — the journal's total order;
  *  - `JOURNAL_CODE` `'R'` — record-level operations;
  *  - `JOURNAL_ENTRY_TYPE` — `PT`/`PX` put (insert), `UB` update
  *    BEFORE image, `UP` update AFTER image, `DL` delete;
  *  - `OBJECT` — the library/file the entry belongs to;
  *  - `ENTRY_DATA` — the record image.
  *
  * With `IMAGES(*BOTH)` journaling (what a CDC deployment enables —
  * the reference connector requires it), each update writes a `UB`
  * entry immediately followed by its `UP` entry: pairing them
  * recovers the full before/after surface, and `DL` carries the
  * deleted row — exactly what watermark polling cannot see.
  *
  * Snapshot / WAL-segment / position lifecycle is the shared
  * [[NativeCdcTailer]]; this class contributes the journal dialects,
  * the entry-type decode, and the UB→UP pairing.
  *
  * Dialects: [[IbmiJournalTailer.IbmiDialect]] emits the real
  * `QSYS2.DISPLAY_JOURNAL` TVF SQL (library/journal arguments,
  * record-code filter, sequence bind) — composable and
  * string-asserted in-sandbox, runnable only against a live IBM i.
  * [[IbmiJournalTailer.EmulatedDialect]] polls a journal TABLE of
  * the same public shape with the entry data as JSON text (Derby
  * hosts `jrn."<ci>_JOURNAL"`) — the fixture-testable form.
  */
object IbmiJournalTailer {

  type TableSpec = NativeCdc.TableSpec
  val TableSpec: NativeCdc.TableSpec.type = NativeCdc.TableSpec
  type Position = NativeCdc.Position
  val Position: NativeCdc.Position.type = NativeCdc.Position
  type Daemon = NativeCdc.Daemon
  private[sources] def bigIntOf(v: Any): BigInt = NativeCdc.bigIntOf(v)

  /** The SQL surface of a journal source — where a live IBM i and
    * the in-sandbox emulation differ. Both return record entries
    * ordered by `SEQUENCE_NUMBER`. */
  trait Dialect {
    def changesSql(t: TableSpec): String
    def bindFrom(ps: PreparedStatement, from: Position): Unit
    def currentPosition(conn: java.sql.Connection, t: TableSpec): Position
  }

  /** Live IBM i: the `QSYS2.DISPLAY_JOURNAL` table function over the
    * journal named by the capture instance (`library_journal`),
    * filtered to record-level entries of the journaled file. */
  object IbmiDialect extends Dialect {
    private def journalArgs(t: TableSpec): (String, String) =
      t.ci.split("_", 2) match {
        case Array(lib, jrn) => (lib.toUpperCase, jrn.toUpperCase)
        case _ => (t.schema.toUpperCase, "QSQJRN")
      }
    override def changesSql(t: TableSpec): String = {
      val (lib, jrn) = journalArgs(t)
      "SELECT SEQUENCE_NUMBER, JOURNAL_CODE, JOURNAL_ENTRY_TYPE, ENTRY_DATA " +
        s"FROM TABLE(QSYS2.DISPLAY_JOURNAL('$lib', '$jrn', " +
        s"OBJECT_LIBRARY => '${t.schema.toUpperCase}', " +
        s"OBJECT_NAME => '${t.table.toUpperCase}', OBJECT_OBJTYPE => '*FILE', " +
        "JOURNAL_CODES => 'R')) " +
        "WHERE SEQUENCE_NUMBER > ? ORDER BY SEQUENCE_NUMBER"
    }
    override def bindFrom(ps: PreparedStatement, from: Position): Unit =
      ps.setLong(1, if (from.lsn.signum < 0) 0L else from.lsn.toLong)
    override def currentPosition(conn: java.sql.Connection, t: TableSpec): Position = {
      val (lib, jrn) = journalArgs(t)
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery("SELECT MAX(SEQUENCE_NUMBER) FROM " +
          s"TABLE(QSYS2.DISPLAY_JOURNAL('$lib', '$jrn'))")
        if (rs.next() && rs.getObject(1) != null)
          Position(bigIntOf(rs.getObject(1)), BigInt(0))
        else Position.Min
      } finally st.close()
    }
  }

  /** Emulated journal polling: the same public entry columns as a
    * table, entry data as JSON — Derby hosts this shape verbatim. */
  object EmulatedDialect extends Dialect {
    override def changesSql(t: TableSpec): String =
      s"""SELECT * FROM jrn."${t.ci}_JOURNAL" """ +
        "WHERE sequence_number > ? AND journal_code = 'R' " +
        "ORDER BY sequence_number"
    override def bindFrom(ps: PreparedStatement, from: Position): Unit =
      ps.setLong(1, if (from.lsn.signum < 0) 0L else from.lsn.toLong)
    override def currentPosition(conn: java.sql.Connection, t: TableSpec): Position = {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          s"""SELECT max(sequence_number) FROM jrn."${t.ci}_JOURNAL"""")
        if (rs.next() && rs.getObject(1) != null)
          Position(bigIntOf(rs.getObject(1)), BigInt(0))
        else Position.Min
      } finally st.close()
    }
  }

  /** Config construction under the `debezium.source.*` namespace:
    *
    *   debezium.source.jdbc.url       = jdbc:...
    *   debezium.source.ibmi.tables    = schema.table:key1+key2[:lib_journal][,…]
    *     (the optional third field names `library_journal`; default
    *     `<schema>_<table>`)
    *   debezium.source.ibmi.emulated  = true|false (default false)
    */
  def fromProperties(props: Map[String, String]): IbmiJournalTailer = {
    def req(k: String) = props.getOrElse(k,
      throw new IllegalArgumentException(s"missing $k"))
    val tables = NativeCdc.parseTableSpecs(req("debezium.source.ibmi.tables"))
    new IbmiJournalTailer(req("debezium.source.jdbc.url"),
      java.nio.file.Paths.get(req("debezium.source.path")), tables,
      dialect = if (props.get("debezium.source.ibmi.emulated").contains("true"))
        EmulatedDialect else IbmiDialect,
      topicPrefix = props.getOrElse("debezium.source.topic.prefix", "testc"))
  }
}

final class IbmiJournalTailer(jdbcUrl: String, dbDir: Path,
                              tables: Seq[IbmiJournalTailer.TableSpec],
                              dialect: IbmiJournalTailer.Dialect =
                                IbmiJournalTailer.IbmiDialect,
                              topicPrefix: String = "testc",
                              dbName: String = "db",
                              emitTombstones: Boolean = true)
    extends NativeCdcTailer(jdbcUrl, dbDir, tables, topicPrefix, dbName, emitTombstones) {
  import NativeCdc._
  import IbmiJournalTailer.bigIntOf

  override def connectorName: String = "ibmi"
  override def stateFileName: String = "_ibmi_state"

  /** The exact change-polling SQL per table (asserted by the spec —
    * the live dialect's DISPLAY_JOURNAL TVF text is the deployable
    * artifact). */
  def changesSqlFor(t: TableSpec): String = dialect.changesSql(t)

  override protected def currentPosition(conn: java.sql.Connection,
                                         t: TableSpec): Position =
    dialect.currentPosition(conn, t)

  private val mapper = new ObjectMapper()

  private def entryCols(text: String): Map[String, Any] =
    jsonCols(mapper.readTree(text))

  /** Decode journal entries into complete events: `PT`/`PX` → 'c';
    * `UB` stashes the BEFORE image that its immediately-following
    * `UP` pairs into a 'u' (IMAGES(*BOTH) journaling — an `UP`
    * without a pending `UB` decodes as an after-only update, the
    * IMAGES(*AFTER) shape); `DL` → 'd' with the deleted row. A `UB`
    * left unpaired at the end of the batch fails loudly — half an
    * update must never advance the position. */
  override protected def forEachChange(conn: java.sql.Connection, t: TableSpec,
                                       from: Position)
                                      (emit: (Position, Change) => Unit): Unit = {
    val ps = conn.prepareStatement(dialect.changesSql(t))
    try {
      dialect.bindFrom(ps, from)
      val rs = ps.executeQuery()
      var pendingBefore: Option[(BigInt, Map[String, Any])] = None
      while (rs.next()) {
        val m = rowMap(rs)
        val seq = bigIntOf(m("sequence_number"))
        val pos = Position(seq, BigInt(0))
        if (pos > from) {
          val entryType = m("journal_entry_type") match {
            case s: String => s.trim.toUpperCase
            case other => throw new IllegalArgumentException(
              s"ibmi journal: unreadable JOURNAL_ENTRY_TYPE at $seq: $other")
          }
          val dataText = m("entry_data") match {
            case s: String => s
            case c: java.sql.Clob => c.getSubString(1, c.length().toInt)
            case other => throw new IllegalArgumentException(
              s"ibmi journal: unreadable ENTRY_DATA at $seq: $other")
          }
          val image = entryCols(dataText)
          entryType match {
            case "PT" | "PX" =>
              require(pendingBefore.isEmpty,
                s"ibmi journal: UB at ${pendingBefore.get._1} not followed by UP (saw $entryType)")
              emit(pos, Change("c", None, Some(image), keyFrom = image))
            case "UB" =>
              require(pendingBefore.isEmpty,
                s"ibmi journal: consecutive UB entries (${pendingBefore.get._1}, $seq)")
              pendingBefore = Some((seq, image))
            case "UP" =>
              val before = pendingBefore.map(_._2)
              pendingBefore = None
              emit(pos, Change("u", before, Some(image), keyFrom = image))
            case "DL" =>
              require(pendingBefore.isEmpty,
                s"ibmi journal: UB at ${pendingBefore.get._1} not followed by UP (saw DL)")
              emit(pos, Change("d", Some(image), None, keyFrom = image))
            case other => throw new IllegalArgumentException(
              s"ibmi journal: unknown JOURNAL_ENTRY_TYPE '$other' at $seq " +
              "(PT/PX/UB/UP/DL)")
          }
        }
      }
      require(pendingBefore.isEmpty,
        s"ibmi journal: batch ended with unpaired UB at ${pendingBefore.map(_._1).orNull} — " +
        "refusing to advance past half an update")
    } finally ps.close()
  }
}
