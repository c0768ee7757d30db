package graft.sources.cdc

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.Path
import java.sql.PreparedStatement

/** CockroachDB changefeed capture — the seventh native-CDC family
  * (reference connector matrix: debezium-server-dist/pom.xml:860,
  * `debezium-connector-cockroachdb`). A core changefeed is a SQL
  * statement whose result set streams change rows — the public,
  * documented surface:
  *
  *  - each row is `(table, key, value)`: `key` a JSON ARRAY of the
  *    primary-key values, `value` the wrapped envelope
  *    `{"after": {...}|null, "before": {...}|null, "updated": hlc}`
  *    (the `diff` option adds `before`, `updated` the HLC commit
  *    timestamp `wall.logical`);
  *  - `after`-only = insert-or-update upsert; with `diff`,
  *    `before`+`after` = update, `before`-only (`after` null) =
  *    hard DELETE;
  *  - resume = re-issue the statement with `cursor = <hlc>`.
  *
  * Snapshot / WAL-segment / position lifecycle is the shared
  * [[NativeCdcTailer]]; this class contributes the changefeed
  * dialects and the envelope decode.
  *
  * Dialects: [[CockroachChangefeedTailer.CockroachDialect]] emits
  * the real `EXPERIMENTAL CHANGEFEED FOR TABLE` statement (`updated,
  * diff, cursor = $1` — the streaming result IS the poll surface) —
  * composable and string-asserted in-sandbox, runnable only against
  * a live cluster. [[CockroachChangefeedTailer.EmulatedDialect]]
  * polls a changefeed-record TABLE of the same public shape (Derby
  * hosts `cf."<ci>_CHANGEFEED"` with the HLC split into wall/logical
  * columns) — the fixture-testable form.
  */
object CockroachChangefeedTailer {

  type TableSpec = NativeCdc.TableSpec
  val TableSpec: NativeCdc.TableSpec.type = NativeCdc.TableSpec
  type Position = NativeCdc.Position
  val Position: NativeCdc.Position.type = NativeCdc.Position
  type Daemon = NativeCdc.Daemon
  private[sources] def bigIntOf(v: Any): BigInt = NativeCdc.bigIntOf(v)

  /** The SQL surface of a changefeed source. Both dialects return
    * rows ordered by the HLC (wall, logical) commit timestamp. */
  trait Dialect {
    def changesSql(t: TableSpec): String
    def bindFrom(ps: PreparedStatement, from: Position): Unit
    def currentPosition(conn: java.sql.Connection, t: TableSpec): Position
  }

  /** Live CockroachDB: the changefeed statement itself. The cursor
    * bind is the HLC rendered `wall.logical`; the statement's
    * streaming result set delivers rows as they commit. */
  object CockroachDialect extends Dialect {
    override def changesSql(t: TableSpec): String =
      s"EXPERIMENTAL CHANGEFEED FOR TABLE ${t.schema}.${t.table} " +
        "WITH updated, diff, cursor = $1"
    override def bindFrom(ps: PreparedStatement, from: Position): Unit = {
      val wall = if (from.lsn.signum < 0) BigInt(0) else from.lsn
      val logical = if (from.seq.signum < 0) BigInt(0) else from.seq
      ps.setString(1, s"$wall.$logical")
    }
    override def currentPosition(conn: java.sql.Connection, t: TableSpec): Position = {
      val st = conn.createStatement()
      try {
        // HLC now: decimal `wall.logical` (nanoseconds.logical-count)
        val rs = st.executeQuery("SELECT cluster_logical_timestamp()")
        rs.next()
        val Array(wall, logical) = rs.getString(1).split("\\.", 2)
        Position(BigInt(wall), BigInt(logical.takeWhile(_.isDigit)))
      } finally st.close()
    }
  }

  /** Emulated changefeed polling: the same record fields as table
    * columns, the HLC split into integer wall/logical — Derby hosts
    * this shape for fixtures. */
  object EmulatedDialect extends Dialect {
    override def changesSql(t: TableSpec): String =
      s"""SELECT * FROM cf."${t.ci}_CHANGEFEED" """ +
        "WHERE updated_wall > ? OR (updated_wall = ? AND updated_logical > ?) " +
        "ORDER BY updated_wall, updated_logical"
    override def bindFrom(ps: PreparedStatement, from: Position): Unit = {
      ps.setLong(1, from.lsn.toLong); ps.setLong(2, from.lsn.toLong)
      ps.setLong(3, from.seq.toLong)
    }
    override def currentPosition(conn: java.sql.Connection, t: TableSpec): Position = {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          s"""SELECT max(updated_wall) FROM cf."${t.ci}_CHANGEFEED"""")
        if (rs.next() && rs.getObject(1) != null)
          Position(bigIntOf(rs.getObject(1)), BigInt(Long.MaxValue))
        else Position.Min
      } finally st.close()
    }
  }

  /** Config construction under the `debezium.source.*` namespace:
    *
    *   debezium.source.jdbc.url            = jdbc:...
    *   debezium.source.cockroachdb.tables  = schema.table:key1+key2[:ci][,…]
    *   debezium.source.cockroachdb.emulated = true|false (default false)
    */
  def fromProperties(props: Map[String, String]): CockroachChangefeedTailer = {
    def req(k: String) = props.getOrElse(k,
      throw new IllegalArgumentException(s"missing $k"))
    val tables = NativeCdc.parseTableSpecs(req("debezium.source.cockroachdb.tables"))
    new CockroachChangefeedTailer(req("debezium.source.jdbc.url"),
      java.nio.file.Paths.get(req("debezium.source.path")), tables,
      dialect = if (props.get("debezium.source.cockroachdb.emulated").contains("true"))
        EmulatedDialect else CockroachDialect,
      topicPrefix = props.getOrElse("debezium.source.topic.prefix", "testc"))
  }
}

final class CockroachChangefeedTailer(jdbcUrl: String, dbDir: Path,
                                      tables: Seq[CockroachChangefeedTailer.TableSpec],
                                      dialect: CockroachChangefeedTailer.Dialect =
                                        CockroachChangefeedTailer.CockroachDialect,
                                      topicPrefix: String = "testc",
                                      dbName: String = "db",
                                      emitTombstones: Boolean = true)
    extends NativeCdcTailer(jdbcUrl, dbDir, tables, topicPrefix, dbName, emitTombstones) {
  import NativeCdc._
  import CockroachChangefeedTailer.bigIntOf

  override def connectorName: String = "cockroachdb"
  override def stateFileName: String = "_cockroachdb_state"

  /** The exact change-polling SQL per table (asserted by the spec —
    * the live dialect's CHANGEFEED statement is the deployable
    * artifact). */
  def changesSqlFor(t: TableSpec): String = dialect.changesSql(t)

  override protected def currentPosition(conn: java.sql.Connection,
                                         t: TableSpec): Position =
    dialect.currentPosition(conn, t)

  private val mapper = new ObjectMapper()

  /** Decode changefeed records into complete events: the wrapped
    * envelope's `after`/`before` pair maps to 'c' (after only),
    * 'u' (both), 'd' (before only, after null). The key array zips
    * with the spec's key columns positionally — the changefeed key
    * IS the primary key rendered as a JSON array. */
  override protected def forEachChange(conn: java.sql.Connection, t: TableSpec,
                                       from: Position)
                                      (emit: (Position, Change) => Unit): Unit = {
    val ps = conn.prepareStatement(dialect.changesSql(t))
    try {
      dialect.bindFrom(ps, from)
      val rs = ps.executeQuery()
      while (rs.next()) {
        val m = rowMap(rs)
        val pos = Position(bigIntOf(m("updated_wall")), bigIntOf(m("updated_logical")))
        if (pos > from) {
          def jsonText(col: String): String = m(col) match {
            case s: String => s
            case c: java.sql.Clob => c.getSubString(1, c.length().toInt)
            case other => throw new IllegalArgumentException(
              s"cockroachdb changefeed: unreadable $col at $pos: $other")
          }
          val value = mapper.readTree(jsonText("value"))
          val after = jsonCols(value.get("after"))
          val before = jsonCols(value.get("before"))
          val keyNode = mapper.readTree(jsonText("key"))
          require(keyNode.isArray && keyNode.size() == t.keyCols.size,
            s"cockroachdb changefeed: key must be a JSON array of the " +
            s"${t.keyCols.size} primary-key values at $pos, got: ${jsonText("key")}")
          val keyFrom = t.keyCols.zipWithIndex.map { case (k, i) =>
            val v = keyNode.get(i)
            k.toLowerCase -> (if (v.isIntegralNumber) v.longValue(): Any
                              else if (v.isTextual) v.textValue()
                              else v.toString)
          }.toMap
          (after.nonEmpty, before.nonEmpty) match {
            case (true, false)  => emit(pos, Change("c", None, Some(after), keyFrom))
            case (true, true)   => emit(pos, Change("u", Some(before), Some(after), keyFrom))
            case (false, true)  => emit(pos, Change("d", Some(before), None, keyFrom))
            case (false, false) => throw new IllegalArgumentException(
              s"cockroachdb changefeed: envelope with neither image at $pos")
          }
        }
      }
    } finally ps.close()
  }
}
