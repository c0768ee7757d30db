package graft.sources.cdc

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.Path
import java.sql.PreparedStatement

/** Cassandra commitlog-CDC capture — the eighth native-CDC family
  * (reference connector matrix: `debezium-server-dist/pom.xml:547`
  * `debezium-connector-cassandra-3`, `:693` `-4`, `:620` `-5`).
  * Cassandra's CDC feature archives commitlog segments into the
  * `cdc_raw` directory; the reference's connector parses them with
  * the server's own `cassandra-all` artifact (`pom.xml:561-562`) and
  * emits one event per mutation. The documented event semantics are
  * UNLIKE every row-image family, and this tailer carries them
  * faithfully:
  *
  *  - NO before images, ever: a commitlog records mutations, not
  *    prior state, and the connector never read-before-writes —
  *    `before` is null on every op including deletes;
  *  - INSERT and UPDATE are both upserts, distinguished by the
  *    mutation's row-liveness marker; an UPDATE carries ONLY the
  *    cells present in the write (a PARTIAL after image — absent
  *    columns are unknown, not null-ed);
  *  - a row delete carries the primary key only; a PARTITION delete
  *    arrives with the partition key and NULL clustering columns;
  *  - RANGE tombstones (clustering-range deletes) are skipped — the
  *    reference connector's own documented limitation — and counted
  *    on [[CassandraCommitlogTailer.skippedRangeTombstones]] so the
  *    gap is observable, not silent;
  *  - ordering = (commitlog segment id, position in segment).
  *
  * The binary segment format itself is a Cassandra server internal —
  * the reference links the server's full `cassandra-all` to read it,
  * which is the declared out-of-scope boundary here (COVERAGE.md,
  * same class as TLS). The capture therefore ships the
  * [[CassandraCommitlogTailer.EmulatedDialect]]: a mutation TABLE of
  * the same public event shape (kind, JSON key object, JSON mutated
  * cells, segment/position), Derby-hosted for fixtures; the `Dialect`
  * seam is where a `cassandra-all`-backed `cdc_raw` reader plugs in.
  * Snapshot / WAL-segment / position lifecycle is the shared
  * [[NativeCdcTailer]].
  */
object CassandraCommitlogTailer {

  type TableSpec = NativeCdc.TableSpec
  val TableSpec: NativeCdc.TableSpec.type = NativeCdc.TableSpec
  type Position = NativeCdc.Position
  val Position: NativeCdc.Position.type = NativeCdc.Position
  type Daemon = NativeCdc.Daemon
  private[sources] def bigIntOf(v: Any): BigInt = NativeCdc.bigIntOf(v)

  /** The poll surface of a commitlog mutation source: rows ordered by
    * (segment, position). */
  trait Dialect {
    def changesSql(t: TableSpec): String
    def bindFrom(ps: PreparedStatement, from: Position): Unit
    def currentPosition(conn: java.sql.Connection, t: TableSpec): Position
  }

  /** Emulated commitlog polling: one row per mutation in a table of
    * the connector's public event shape —
    * `cl."<ci>_COMMITLOG"(segment_id, "pos", kind, "mkey", cells)`
    * with `kind` one of INSERT / UPDATE / ROW_DELETE /
    * PARTITION_DELETE / RANGE_TOMBSTONE, `"mkey"` the primary-key
    * JSON OBJECT (partition + clustering columns by name — Cassandra
    * keys are named, unlike a changefeed's positional array), and
    * `cells` the mutated-cell JSON object (null for deletes). */
  object EmulatedDialect extends Dialect {
    override def changesSql(t: TableSpec): String =
      s"""SELECT * FROM cl."${t.ci}_COMMITLOG" """ +
        """WHERE segment_id > ? OR (segment_id = ? AND "pos" > ?) """ +
        """ORDER BY segment_id, "pos""""
    override def bindFrom(ps: PreparedStatement, from: Position): Unit = {
      ps.setLong(1, from.lsn.toLong); ps.setLong(2, from.lsn.toLong)
      ps.setLong(3, from.seq.toLong)
    }
    override def currentPosition(conn: java.sql.Connection, t: TableSpec): Position = {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          s"""SELECT segment_id, "pos" FROM cl."${t.ci}_COMMITLOG" """ +
            """ORDER BY segment_id DESC, "pos" DESC FETCH FIRST 1 ROWS ONLY""")
        if (rs.next()) Position(bigIntOf(rs.getObject(1)), bigIntOf(rs.getObject(2)))
        else Position.Min
      } finally st.close()
    }
  }

  /** Config construction under the `debezium.source.*` namespace:
    *
    *   debezium.source.jdbc.url          = jdbc:...   (fixture host)
    *   debezium.source.cassandra.tables  = keyspace.table:pk1+ck1[:ci][,…]
    */
  def fromProperties(props: Map[String, String]): CassandraCommitlogTailer = {
    def req(k: String) = props.getOrElse(k,
      throw new IllegalArgumentException(s"missing $k"))
    val tables = NativeCdc.parseTableSpecs(req("debezium.source.cassandra.tables"))
    new CassandraCommitlogTailer(req("debezium.source.jdbc.url"),
      java.nio.file.Paths.get(req("debezium.source.path")), tables,
      topicPrefix = props.getOrElse("debezium.source.topic.prefix", "testc"))
  }
}

final class CassandraCommitlogTailer(jdbcUrl: String, dbDir: Path,
                                     tables: Seq[CassandraCommitlogTailer.TableSpec],
                                     dialect: CassandraCommitlogTailer.Dialect =
                                       CassandraCommitlogTailer.EmulatedDialect,
                                     topicPrefix: String = "testc",
                                     dbName: String = "db",
                                     emitTombstones: Boolean = true)
    extends NativeCdcTailer(jdbcUrl, dbDir, tables, topicPrefix, dbName, emitTombstones) {
  import NativeCdc._
  import CassandraCommitlogTailer.bigIntOf

  override def connectorName: String = "cassandra"
  override def stateFileName: String = "_cassandra_state"

  /** The exact change-polling SQL per table (spec-asserted). */
  def changesSqlFor(t: TableSpec): String = dialect.changesSql(t)

  /** Range tombstones seen and skipped — the reference connector's
    * documented limitation, surfaced as a counter instead of silence.
    * A skipped record never advances the durable position (only
    * emitted changes do), so a trailing tombstone is re-read by later
    * polls; the per-table high-water below keeps the COUNT exact. */
  private val rangeTombstones = new NativeCdc.SkipCounter[NativeCdc.Position](_ > _)
  def skippedRangeTombstones: Long = rangeTombstones.count

  override protected def currentPosition(conn: java.sql.Connection,
                                         t: TableSpec): Position =
    dialect.currentPosition(conn, t)

  private val mapper = new ObjectMapper()

  /** Decode mutation records into events. The key object zips by NAME
    * against the spec's key columns; a partition delete's missing
    * clustering columns surface as nulls. Cell maps are taken as
    * written — an UPDATE's after image contains exactly the mutated
    * cells plus the key (partial images are the family's contract). */
  override protected def forEachChange(conn: java.sql.Connection, t: TableSpec,
                                       from: Position)
                                      (emit: (Position, Change) => Unit): Unit = {
    val ps = conn.prepareStatement(dialect.changesSql(t))
    try {
      dialect.bindFrom(ps, from)
      val rs = ps.executeQuery()
      while (rs.next()) {
        val m = rowMap(rs)
        val pos = Position(bigIntOf(m("segment_id")), bigIntOf(m("pos")))
        if (pos > from) {
          def jsonText(col: String): Option[String] = m.get(col).flatMap {
            case null => None
            case s: String => Some(s)
            case c: java.sql.Clob => Some(c.getSubString(1, c.length().toInt))
            case other => throw new IllegalArgumentException(
              s"cassandra commitlog: unreadable $col at $pos: $other")
          }
          val rawKey = jsonCols(mapper.readTree(jsonText("mkey").getOrElse(
            throw new IllegalArgumentException(
              s"cassandra commitlog: mutation without a key at $pos"))))
          // every spec'd key column is present in the event key — a
          // partition delete simply has null clustering values
          val keyFrom = t.keyCols.map(k =>
            k.toLowerCase -> rawKey.getOrElse(k.toLowerCase, null)).toMap
          val cells = jsonText("cells")
            .map(c => jsonCols(mapper.readTree(c))).getOrElse(Map.empty)
          def kindText = m("kind") match {
            case s: String => s
            case other => throw new IllegalArgumentException(
              s"cassandra commitlog: unreadable kind at $pos: $other")
          }
          kindText match {
            case "INSERT" => emit(pos, Change("c", None, Some(keyFrom ++ cells), keyFrom))
            case "UPDATE" => emit(pos, Change("u", None, Some(keyFrom ++ cells), keyFrom))
            case "ROW_DELETE" | "PARTITION_DELETE" =>
              emit(pos, Change("d", None, None, keyFrom))
            case "RANGE_TOMBSTONE" =>
              rangeTombstones.countOnce(t.ci, pos)
            case other => throw new IllegalArgumentException(
              s"cassandra commitlog: unknown mutation kind '$other' at $pos")
          }
        }
      }
    } finally ps.close()
  }
}
