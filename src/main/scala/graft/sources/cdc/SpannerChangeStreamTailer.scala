package graft.sources.cdc

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.nio.file.Path
import java.sql.PreparedStatement
import scala.jdk.CollectionConverters._

/** Cloud Spanner change-stream capture — the fourth native-CDC family
  * (reference connector matrix: debezium-server-dist/pom.xml:844,
  * `debezium-connector-spanner`). A Spanner change stream is consumed
  * by QUERYING it: the `READ_<stream>` table-valued function returns
  * DataChangeRecords of a public, documented shape —
  *
  *  - `commit_timestamp` — the change's commit time (the stream's
  *    total order across partitions of one key range);
  *  - `record_sequence` — orders records WITHIN a
  *    (commit_timestamp, transaction) pair;
  *  - `mod_type` — INSERT / UPDATE / DELETE;
  *  - `mods[]` — one entry per modified row: `keys` (primary-key
  *    JSON), `new_values`, `old_values` (column→value JSON);
  *  - `value_capture_type` — which images the stream carries. This
  *    tailer assumes `NEW_ROW_AND_OLD_VALUES` (the CDC-complete
  *    mode): `new_values` = the full non-key row after the change,
  *    `old_values` = the pre-change values of modified columns for
  *    UPDATE and the full non-key row for DELETE.
  *
  * That surface carries exactly what watermark polling cannot see:
  * HARD deletes (`old_values` of a DELETE mod) and UPDATE BEFORE
  * images (`old_values` overlaid on the after image).
  *
  * Snapshot / WAL-segment / position lifecycle is the shared
  * [[NativeCdcTailer]]; this class contributes the change-stream
  * dialects and the mods[] JSON decode.
  *
  * Dialects: [[SpannerChangeStreamTailer.SpannerDialect]] emits the
  * real GoogleSQL (`READ_<stream>` TVF with `start_timestamp` /
  * `heartbeat_milliseconds` arguments) — composable and
  * string-asserted in-sandbox, runnable only against a live Spanner.
  * [[SpannerChangeStreamTailer.EmulatedDialect]] polls a
  * change-record TABLE of the same public shape (Derby hosts
  * `cs."<ci>_CHANGE_RECORDS"` carrying commit micros, record
  * sequence, mod type, and the mods array as JSON text) — the
  * fixture-testable form.
  */
object SpannerChangeStreamTailer {

  type TableSpec = NativeCdc.TableSpec
  val TableSpec: NativeCdc.TableSpec.type = NativeCdc.TableSpec
  type Position = NativeCdc.Position
  val Position: NativeCdc.Position.type = NativeCdc.Position
  type Daemon = NativeCdc.Daemon
  private[sources] def bigIntOf(v: Any): BigInt = NativeCdc.bigIntOf(v)

  /** The SQL surface of a change-stream source — where a live Spanner
    * and the in-sandbox emulation differ. Both return rows ordered by
    * (`commit_timestamp`,`record_sequence`). */
  trait Dialect {
    /** Query for change records of `t` at position STRICTLY AFTER the
      * bound parameters (re-fetch overlap is fine — the client
      * filters by position again). */
    def changesSql(t: TableSpec): String
    def bindFrom(ps: PreparedStatement, from: Position): Unit
    /** Current end-of-stream position at snapshot time — changes at
      * or below it are already IN the snapshot. */
    def currentPosition(conn: java.sql.Connection, t: TableSpec): Position
  }

  /** Live Spanner: the `READ_<stream>` TVF. `start_timestamp` is the
    * resume cursor (micros → TIMESTAMP); the end is left open and
    * heartbeats keep the cursor advancing through quiet ranges.
    * `record_sequence` is a zero-padded string in the real record —
    * its numeric value binds as the intra-commit order. */
  object SpannerDialect extends Dialect {
    override def changesSql(t: TableSpec): String =
      s"SELECT * FROM READ_${t.ci}(" +
        "start_timestamp => TIMESTAMP_MICROS(?), " +
        "end_timestamp => NULL, " +
        "partition_token => NULL, " +
        "heartbeat_milliseconds => 10000)"
    override def bindFrom(ps: PreparedStatement, from: Position): Unit =
      ps.setLong(1, if (from.lsn.signum < 0) 0L else from.lsn.toLong)
    override def currentPosition(conn: java.sql.Connection, t: TableSpec): Position = {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery("SELECT UNIX_MICROS(CURRENT_TIMESTAMP())")
        rs.next()
        Position(bigIntOf(rs.getObject(1)), BigInt(Long.MaxValue))
      } finally st.close()
    }
  }

  /** Emulated change-record polling: the same public record fields as
    * table columns (`commit_micros`,`record_sequence`,`mod_type`,
    * `mods` JSON array) — Derby hosts this shape for fixtures. */
  object EmulatedDialect extends Dialect {
    override def changesSql(t: TableSpec): String =
      s"""SELECT * FROM cs."${t.ci}_CHANGE_RECORDS" """ +
        "WHERE commit_micros > ? OR (commit_micros = ? AND record_sequence > ?) " +
        "ORDER BY commit_micros, record_sequence"
    override def bindFrom(ps: PreparedStatement, from: Position): Unit = {
      ps.setLong(1, from.lsn.toLong); ps.setLong(2, from.lsn.toLong)
      ps.setLong(3, from.seq.toLong)
    }
    override def currentPosition(conn: java.sql.Connection, t: TableSpec): Position = {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          s"""SELECT max(commit_micros) FROM cs."${t.ci}_CHANGE_RECORDS"""")
        if (rs.next() && rs.getObject(1) != null)
          Position(bigIntOf(rs.getObject(1)), BigInt(Long.MaxValue))
        else Position.Min
      } finally st.close()
    }
  }

  /** Config construction under the `debezium.source.*` namespace:
    *
    *   debezium.source.jdbc.url         = jdbc:...
    *   debezium.source.spanner.tables   = schema.table:key1+key2[:stream][,…]
    *     (the optional third field names the change stream / capture
    *     instance; default `<schema>_<table>`)
    *   debezium.source.spanner.emulated = true|false (default false)
    */
  def fromProperties(props: Map[String, String]): SpannerChangeStreamTailer = {
    def req(k: String) = props.getOrElse(k,
      throw new IllegalArgumentException(s"missing $k"))
    val tables = NativeCdc.parseTableSpecs(req("debezium.source.spanner.tables"))
    new SpannerChangeStreamTailer(req("debezium.source.jdbc.url"),
      java.nio.file.Paths.get(req("debezium.source.path")), tables,
      dialect = if (props.get("debezium.source.spanner.emulated").contains("true"))
        EmulatedDialect else SpannerDialect,
      topicPrefix = props.getOrElse("debezium.source.topic.prefix", "testc"))
  }
}

final class SpannerChangeStreamTailer(jdbcUrl: String, dbDir: Path,
                                      tables: Seq[SpannerChangeStreamTailer.TableSpec],
                                      dialect: SpannerChangeStreamTailer.Dialect =
                                        SpannerChangeStreamTailer.SpannerDialect,
                                      topicPrefix: String = "testc",
                                      dbName: String = "db",
                                      emitTombstones: Boolean = true)
    extends NativeCdcTailer(jdbcUrl, dbDir, tables, topicPrefix, dbName, emitTombstones) {
  import NativeCdc._
  import SpannerChangeStreamTailer.bigIntOf

  override def connectorName: String = "spanner"

  /** GoogleSQL spells the row limit `LIMIT`. */
  override protected def chunkQuery(t: TableSpec, where: String, order: String,
                                    chunkSize: Int): String =
    s"SELECT * FROM ${t.qualified} ${where}ORDER BY $order LIMIT $chunkSize"
  override def stateFileName: String = "_spanner_state"

  /** The exact change-polling SQL per table (asserted by the spec —
    * the live dialect's `READ_<stream>` TVF text is the deployable
    * artifact). */
  def changesSqlFor(t: TableSpec): String = dialect.changesSql(t)

  override protected def currentPosition(conn: java.sql.Connection,
                                         t: TableSpec): Position =
    dialect.currentPosition(conn, t)

  private val mapper = new ObjectMapper()

  /** One JSON object (`keys`/`new_values`/`old_values` entries of a
    * mod) → column map ([[NativeCdc.jsonCols]]). */
  private def jsonCols(n: JsonNode): Map[String, Any] = NativeCdc.jsonCols(n)

  /** Decode change records into complete events, one per mods[]
    * entry: INSERT → 'c' (after = keys + new_values); UPDATE → 'u'
    * (after = keys + new_values, before = old_values overlaid on the
    * after image — NEW_ROW_AND_OLD_VALUES carries the pre-change
    * values of exactly the modified columns); DELETE → 'd' (before =
    * keys + old_values). Mods of one record share its position: a
    * crash replays the whole record, at-least-once. */
  override protected def forEachChange(conn: java.sql.Connection, t: TableSpec,
                                       from: Position)
                                      (emit: (Position, Change) => Unit): Unit = {
    val ps = conn.prepareStatement(dialect.changesSql(t))
    try {
      dialect.bindFrom(ps, from)
      val rs = ps.executeQuery()
      while (rs.next()) {
        val m = rowMap(rs)
        val pos = Position(bigIntOf(m("commit_micros")), bigIntOf(m("record_sequence")))
        if (pos > from) {
          val modType = m("mod_type") match {
            case s: String => s.trim.toUpperCase
            case other => throw new IllegalArgumentException(
              s"spanner change stream: unreadable mod_type at $pos: $other")
          }
          val modsText = m("mods") match {
            case s: String => s
            case c: java.sql.Clob => c.getSubString(1, c.length().toInt)
            case other => throw new IllegalArgumentException(
              s"spanner change stream: unreadable mods at $pos: $other")
          }
          val mods = mapper.readTree(modsText)
          require(mods.isArray, s"spanner change stream: mods must be a JSON " +
            s"array at $pos, got: $modsText")
          mods.elements().asScala.foreach { mod =>
            val keys = jsonCols(mod.get("keys"))
            val newVals = jsonCols(mod.get("new_values"))
            val oldVals = jsonCols(mod.get("old_values"))
            modType match {
              case "INSERT" =>
                val after = keys ++ newVals
                emit(pos, Change("c", None, Some(after), keyFrom = after))
              case "UPDATE" =>
                val after = keys ++ newVals
                emit(pos, Change("u", Some(after ++ oldVals), Some(after), keyFrom = after))
              case "DELETE" =>
                val before = keys ++ oldVals
                emit(pos, Change("d", Some(before), None, keyFrom = before))
              case other => throw new IllegalArgumentException(
                s"spanner change stream: unknown mod_type '$other' at $pos " +
                "(INSERT/UPDATE/DELETE)")
            }
          }
        }
      }
    } finally ps.close()
  }
}
