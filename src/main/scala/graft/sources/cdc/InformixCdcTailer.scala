package graft.sources.cdc

import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.file.Path
import java.sql.PreparedStatement

/** Informix Change-Streams capture — the ninth native-CDC family
  * (reference connector matrix: `debezium-server-dist/pom.xml`
  * `debezium-connector-informix`). Informix's CDC API is a session
  * opened against the `syscdcv1` database over plain SQL-callable
  * functions; the session streams typed change records — the public,
  * documented surface:
  *
  *  - record types `CDC_REC_INSERT` / `CDC_REC_DELETE` /
  *    `CDC_REC_UPDBEF` / `CDC_REC_UPDAFT` (an update writes its
  *    BEFORE record immediately followed by its AFTER record) plus
  *    the transaction markers `CDC_REC_BEGINTX` / `CDC_REC_COMMTX` /
  *    `CDC_REC_RBTX` and `CDC_REC_TRUNCATE`;
  *  - records stream IN LOG ORDER AS THEY ARE WRITTEN — before the
  *    transaction's outcome is known. The consumer buffers each
  *    transaction and emits it only at `COMMTX`; `RBTX` discards the
  *    buffer (the reference connector does exactly this);
  *  - positions are log sequence numbers; committed work is emitted
  *    in commit order as (commit seqnum, intra-transaction index);
  *  - `TRUNCATE` records are skipped-and-counted — the reference's
  *    default `skipped.operations=t` — never silently dropped.
  *
  * The poll emulation requires SERIAL transactions (a `BEGINTX` while
  * another transaction is open fails loudly): with serial
  * transactions every record of a later transaction sits past the
  * previous commit's seqnum, so resuming from the last emitted commit
  * position is sound, and a transaction left open at batch end simply
  * re-reads next poll. Interleaved transactions need the real
  * session's restartable-LSN bookkeeping — that (like the
  * smart-large-object record transport) lives behind the `Dialect`
  * seam with the [[InformixCdcTailer.sessionSetupCalls]] artifact
  * documenting the live call sequence.
  *
  * Snapshot / WAL-segment / position lifecycle is the shared
  * [[NativeCdcTailer]]; this class contributes the record decode,
  * UPDBEF→UPDAFT pairing, and transaction buffering.
  */
object InformixCdcTailer {

  type TableSpec = NativeCdc.TableSpec
  val TableSpec: NativeCdc.TableSpec.type = NativeCdc.TableSpec
  type Position = NativeCdc.Position
  val Position: NativeCdc.Position.type = NativeCdc.Position
  type Daemon = NativeCdc.Daemon
  private[sources] def bigIntOf(v: Any): BigInt = NativeCdc.bigIntOf(v)

  /** The documented live-session call sequence against `syscdcv1` —
    * the deployable artifact (string-asserted in spec); the record
    * stream it opens is read through the Informix smart-large-object
    * API, which is the declared out-of-scope transport boundary. */
  def sessionSetupCalls(t: TableSpec, timeoutSec: Int = 60): Seq[String] = Seq(
    s"EXECUTE FUNCTION informix.cdc_opensess('syscdcv1', 0, $timeoutSec, 1, 1, 1)",
    s"EXECUTE FUNCTION informix.cdc_set_fullrowlogging('${t.qualified}', 1)",
    s"EXECUTE FUNCTION informix.cdc_startcapture(?, 0, '${t.qualified}', " +
      s"'${t.keyCols.mkString(",")}', 0)",
    "EXECUTE FUNCTION informix.cdc_activatesess(?, 0)")

  /** The poll surface of a change-record source: rows ordered by
    * seqnum. */
  trait Dialect {
    def changesSql(t: TableSpec): String
    def bindFrom(ps: PreparedStatement, from: Position): Unit
    def currentPosition(conn: java.sql.Connection, t: TableSpec): Position
  }

  /** Emulated change-record polling: one row per CDC record in a
    * table of the session's public record shape —
    * `ifx."<ci>_CDCRECORDS"(seqnum, txid, rectype, data)` with
    * `rectype` one of INSERT / DELETE / UPDBEF / UPDAFT / BEGINTX /
    * COMMTX / RBTX / TRUNCATE and `data` the row image as JSON
    * (null for transaction markers). */
  object EmulatedDialect extends Dialect {
    override def changesSql(t: TableSpec): String =
      s"""SELECT * FROM ifx."${t.ci}_CDCRECORDS" """ +
        "WHERE seqnum > ? ORDER BY seqnum"
    override def bindFrom(ps: PreparedStatement, from: Position): Unit =
      ps.setLong(1, if (from.lsn.signum < 0) 0L else from.lsn.toLong)
    override def currentPosition(conn: java.sql.Connection, t: TableSpec): Position = {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          s"""SELECT max(seqnum) FROM ifx."${t.ci}_CDCRECORDS"""")
        if (rs.next() && rs.getObject(1) != null)
          Position(bigIntOf(rs.getObject(1)), BigInt(Long.MaxValue))
        else Position.Min
      } finally st.close()
    }
  }

  /** Config construction under the `debezium.source.*` namespace:
    *
    *   debezium.source.jdbc.url          = jdbc:...   (fixture host)
    *   debezium.source.informix.tables   = schema.table:key1+key2[:ci][,…]
    */
  def fromProperties(props: Map[String, String]): InformixCdcTailer = {
    def req(k: String) = props.getOrElse(k,
      throw new IllegalArgumentException(s"missing $k"))
    val tables = NativeCdc.parseTableSpecs(req("debezium.source.informix.tables"))
    new InformixCdcTailer(req("debezium.source.jdbc.url"),
      java.nio.file.Paths.get(req("debezium.source.path")), tables,
      topicPrefix = props.getOrElse("debezium.source.topic.prefix", "testc"))
  }
}

final class InformixCdcTailer(jdbcUrl: String, dbDir: Path,
                              tables: Seq[InformixCdcTailer.TableSpec],
                              dialect: InformixCdcTailer.Dialect =
                                InformixCdcTailer.EmulatedDialect,
                              topicPrefix: String = "testc",
                              dbName: String = "db",
                              emitTombstones: Boolean = true)
    extends NativeCdcTailer(jdbcUrl, dbDir, tables, topicPrefix, dbName, emitTombstones) {
  import NativeCdc._
  import InformixCdcTailer.bigIntOf

  override def connectorName: String = "informix"
  override def stateFileName: String = "_informix_state"

  /** The exact change-polling SQL per table (spec-asserted). */
  def changesSqlFor(t: TableSpec): String = dialect.changesSql(t)

  /** Rolled-back transactions discarded (each buffered then dropped
    * at its `RBTX`) — observable, like the reference's metrics.
    * Positions only advance on COMMITTED work, so a rolled-back tx
    * re-scans on every poll until a later commit moves past it (a
    * no-op: nothing emits); the high-water below keeps the COUNT
    * exact across those re-scans. */
  @volatile private var rolledBack = 0L
  private val rbHighWater = scala.collection.mutable.Map.empty[String, BigInt]
  def discardedTransactions: Long = rolledBack

  /** `TRUNCATE` records skipped — the reference's default
    * `skipped.operations=t`, surfaced as a counter (same re-scan
    * high-water discipline as the rollback counter). */
  @volatile private var truncates = 0L
  private val trHighWater = scala.collection.mutable.Map.empty[String, BigInt]
  def skippedTruncates: Long = truncates

  override protected def currentPosition(conn: java.sql.Connection,
                                         t: TableSpec): Position =
    dialect.currentPosition(conn, t)

  private val mapper = new ObjectMapper()

  /** Decode the record stream. Data records buffer under their open
    * transaction (UPDBEF stashing its AFTER pair); `COMMTX` emits the
    * buffer in order at (commit seqnum, index); `RBTX` discards it.
    * A data record outside a transaction, interleaved `BEGINTX`s, an
    * unpaired `UPDBEF`, and unknown record types all fail loudly. A
    * transaction still open at batch end emits nothing — its records
    * sit past the last commit position and re-read next poll. */
  override protected def forEachChange(conn: java.sql.Connection, t: TableSpec,
                                       from: Position)
                                      (emit: (Position, Change) => Unit): Unit = {
    val ps = conn.prepareStatement(dialect.changesSql(t))
    try {
      dialect.bindFrom(ps, from)
      val rs = ps.executeQuery()
      // open transaction: (txid, buffered changes, pending UPDBEF image)
      var open: Option[(BigInt, Vector[Change], Option[Map[String, Any]])] = None
      while (rs.next()) {
        val m = rowMap(rs)
        val seq = bigIntOf(m("seqnum"))
        val txid = bigIntOf(m("txid"))
        val recType = m("rectype") match {
          case s: String => s.trim.toUpperCase
          case other => throw new IllegalArgumentException(
            s"informix cdc: unreadable rectype at $seq: $other")
        }
        def image: Map[String, Any] = jsonCols(mapper.readTree(m("data") match {
          case s: String => s
          case c: java.sql.Clob => c.getSubString(1, c.length().toInt)
          case other => throw new IllegalArgumentException(
            s"informix cdc: unreadable data at $seq: $other")
        }))
        def inTx(f: (BigInt, Vector[Change], Option[Map[String, Any]]) =>
                    (Vector[Change], Option[Map[String, Any]])): Unit = open match {
          case Some((id, buf, pend)) =>
            require(id == txid,
              s"informix cdc: record of tx $txid inside open tx $id at $seq " +
              "(interleaved transactions need the live session's restartable LSN)")
            val (b2, p2) = f(id, buf, pend)
            open = Some((id, b2, p2))
          case None => throw new IllegalArgumentException(
            s"informix cdc: $recType outside a transaction at $seq")
        }
        recType match {
          case "BEGINTX" =>
            require(open.isEmpty,
              s"informix cdc: BEGINTX $txid while tx ${open.get._1} is open at $seq " +
              "(interleaved transactions need the live session's restartable LSN)")
            open = Some((txid, Vector.empty, None))
          case "INSERT" => inTx { (_, buf, pend) =>
            require(pend.isEmpty, s"informix cdc: UPDBEF not followed by UPDAFT at $seq")
            (buf :+ Change("c", None, Some(image), keyFrom = image), None)
          }
          case "DELETE" => inTx { (_, buf, pend) =>
            require(pend.isEmpty, s"informix cdc: UPDBEF not followed by UPDAFT at $seq")
            (buf :+ Change("d", Some(image), None, keyFrom = image), None)
          }
          case "UPDBEF" => inTx { (_, buf, pend) =>
            require(pend.isEmpty, s"informix cdc: consecutive UPDBEF records at $seq")
            (buf, Some(image))
          }
          case "UPDAFT" => inTx { (_, buf, pend) =>
            val img = image
            (buf :+ Change("u", pend, Some(img), keyFrom = img), None)
          }
          case "TRUNCATE" => inTx { (_, buf, pend) =>
            require(pend.isEmpty, s"informix cdc: UPDBEF not followed by UPDAFT at $seq")
            if (trHighWater.get(t.ci).forall(seq > _)) {
              truncates += 1
              trHighWater(t.ci) = seq
            }
            (buf, None)
          }
          case "COMMTX" =>
            val (id, buf, pend) = open.getOrElse(throw new IllegalArgumentException(
              s"informix cdc: COMMTX without an open transaction at $seq"))
            require(id == txid, s"informix cdc: COMMTX of $txid inside open tx $id at $seq")
            require(pend.isEmpty,
              s"informix cdc: transaction $id committed with an unpaired UPDBEF")
            open = None
            val commitPos = Position(seq, BigInt(-1))
            if (commitPos > from)
              buf.zipWithIndex.foreach { case (ch, i) =>
                emit(Position(seq, BigInt(i)), ch)
              }
          case "RBTX" =>
            val (id, _, _) = open.getOrElse(throw new IllegalArgumentException(
              s"informix cdc: RBTX without an open transaction at $seq"))
            require(id == txid, s"informix cdc: RBTX of $txid inside open tx $id at $seq")
            open = None
            if (rbHighWater.get(t.ci).forall(seq > _)) {
              rolledBack += 1
              rbHighWater(t.ci) = seq
            }
          case other => throw new IllegalArgumentException(
            s"informix cdc: unknown record type '$other' at $seq " +
            "(INSERT/DELETE/UPDBEF/UPDAFT/BEGINTX/COMMTX/RBTX/TRUNCATE)")
        }
      }
      // a transaction still open at batch end re-reads next poll (its
      // records all sit past the last emitted commit seqnum) — nothing
      // to do, and nothing advanced past it
    } finally ps.close()
  }
}
