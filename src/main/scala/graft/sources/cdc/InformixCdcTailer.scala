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
  * transactions every record of a later transaction sits past every
  * record of the previous one. Committed changes emit at their OWN
  * record seqnums (in commit order — positions stay monotone), which
  * makes every durably-flushed position exactly resumable: a crash
  * mid-way through emitting a committed transaction restarts at the
  * last flushed record and the decoder accepts the headless tail
  * (records arriving before any `BEGINTX` right after a resume belong
  * to the transaction the crash interrupted). The snapshot anchor is
  * the last TERMINATOR (`COMMTX`/`RBTX`) seqnum — never a data
  * record's — so a transaction open while the snapshot runs (its rows
  * invisible to the snapshot read) replays WHOLE when it commits.
  * Interleaved transactions need the real session's restartable-LSN
  * bookkeeping — that (like the smart-large-object record transport)
  * lives behind the `Dialect` seam with the
  * [[InformixCdcTailer.sessionSetupCalls]] artifact documenting the
  * live call sequence.
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
    // -1 (Position.Min) binds AS IS: seqnum 0 is a valid record
    override def bindFrom(ps: PreparedStatement, from: Position): Unit =
      ps.setLong(1, from.lsn.toLong)
    // snapshot anchor = the last TERMINATOR seqnum: a transaction
    // open while the snapshot runs is invisible to the snapshot read,
    // so its records must stay ABOVE the anchor and replay when the
    // commit arrives (a max over ALL records would wedge the tailer
    // at a dangling COMMTX and silently lose the transaction)
    override def currentPosition(conn: java.sql.Connection, t: TableSpec): Position = {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(
          s"""SELECT max(seqnum) FROM ifx."${t.ci}_CDCRECORDS" """ +
            "WHERE rectype IN ('COMMTX', 'RBTX')")
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
  private val rolledBack = new NativeCdc.SkipCounter[BigInt](_ > _)
  def discardedTransactions: Long = rolledBack.count

  /** `TRUNCATE` records skipped — the reference's default
    * `skipped.operations=t`, surfaced as a counter. Counted at
    * COMMIT, never at read: a truncate inside a rolled-back
    * transaction never happened and must not report as skipped work
    * (same re-scan high-water discipline as the rollback counter,
    * keyed by the truncate record's own seqnum). */
  private val truncates = new NativeCdc.SkipCounter[BigInt](_ > _)
  def skippedTruncates: Long = truncates.count

  override protected def currentPosition(conn: java.sql.Connection,
                                         t: TableSpec): Position =
    dialect.currentPosition(conn, t)

  private val mapper = new ObjectMapper()

  /** One buffering transaction: buffered changes carry their own
    * record seqnums (the emitted positions), UPDBEF stashes its AFTER
    * pair, truncate seqs count at commit. `implicitTail` marks the
    * headless transaction a resume may open (see below). */
  private final case class OpenTx(txid: BigInt,
                                  buf: Vector[(BigInt, Change)] = Vector.empty,
                                  pend: Option[Map[String, Any]] = None,
                                  truncSeqs: Vector[BigInt] = Vector.empty,
                                  implicitTail: Boolean = false)

  /** Decode the record stream. Data records buffer under their open
    * transaction; `COMMTX` emits the buffer in record order, each
    * change at its OWN seqnum (exactly-resumable positions: a crash
    * after a mid-transaction durable flush restarts at the last
    * flushed record and the tail re-reads); `RBTX` discards the
    * buffer. Records arriving before any `BEGINTX` are accepted ONLY
    * directly after a resume (`from` past Min) as the interrupted
    * transaction's tail — in any other spot an orphan record,
    * interleaved `BEGINTX`s, an unpaired `UPDBEF`, and unknown record
    * types all fail loudly. `TRUNCATE` records count at COMMIT (a
    * rolled-back transaction's truncate never happened), keyed by
    * their own seqnum so re-reads can't double-count. A transaction
    * still open at batch end emits nothing — every record of it sits
    * past the last emitted position and re-reads next poll. */
  override protected def forEachChange(conn: java.sql.Connection, t: TableSpec,
                                       from: Position)
                                      (emit: (Position, Change) => Unit): Unit = {
    val ps = conn.prepareStatement(dialect.changesSql(t))
    try {
      dialect.bindFrom(ps, from)
      val rs = ps.executeQuery()
      var open: Option[OpenTx] = None
      // a resumed poll may start mid-transaction; once ANY structural
      // record (BEGINTX or a terminator) is seen the stream is aligned
      // and headless records are orphans again
      var tailWindow = from.lsn.signum >= 0
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
        def inTx(f: OpenTx => OpenTx): Unit = open match {
          case Some(tx) =>
            require(tx.txid == txid,
              s"informix cdc: record of tx $txid inside open tx ${tx.txid} at $seq " +
              "(interleaved transactions need the live session's restartable LSN)")
            open = Some(f(tx))
          case None if tailWindow =>
            // the resumed transaction's headless tail
            open = Some(f(OpenTx(txid, implicitTail = true)))
          case None => throw new IllegalArgumentException(
            s"informix cdc: $recType outside a transaction at $seq")
        }
        recType match {
          case "BEGINTX" =>
            require(open.isEmpty,
              s"informix cdc: BEGINTX $txid while tx ${open.get.txid} is open at $seq " +
              "(interleaved transactions need the live session's restartable LSN)")
            tailWindow = false
            open = Some(OpenTx(txid))
          case "INSERT" => inTx { tx =>
            require(tx.pend.isEmpty, s"informix cdc: UPDBEF not followed by UPDAFT at $seq")
            tx.copy(buf = tx.buf :+ (seq, Change("c", None, Some(image), keyFrom = image)))
          }
          case "DELETE" => inTx { tx =>
            require(tx.pend.isEmpty, s"informix cdc: UPDBEF not followed by UPDAFT at $seq")
            tx.copy(buf = tx.buf :+ (seq, Change("d", Some(image), None, keyFrom = image)))
          }
          case "UPDBEF" => inTx { tx =>
            require(tx.pend.isEmpty, s"informix cdc: consecutive UPDBEF records at $seq")
            tx.copy(pend = Some(image))
          }
          case "UPDAFT" => inTx { tx =>
            val img = image
            tx.copy(buf = tx.buf :+ (seq, Change("u", tx.pend, Some(img), keyFrom = img)),
              pend = None)
          }
          case "TRUNCATE" => inTx { tx =>
            require(tx.pend.isEmpty, s"informix cdc: UPDBEF not followed by UPDAFT at $seq")
            tx.copy(truncSeqs = tx.truncSeqs :+ seq)
          }
          case "COMMTX" =>
            val tx = open.getOrElse {
              if (tailWindow) OpenTx(txid, implicitTail = true) // fully-emitted resume tail
              else throw new IllegalArgumentException(
                s"informix cdc: COMMTX without an open transaction at $seq")
            }
            require(tx.txid == txid,
              s"informix cdc: COMMTX of $txid inside open tx ${tx.txid} at $seq")
            require(tx.pend.isEmpty,
              s"informix cdc: transaction ${tx.txid} committed with an unpaired UPDBEF")
            open = None
            tailWindow = false
            tx.buf.foreach { case (recSeq, ch) =>
              val p = Position(recSeq, BigInt(0))
              if (p > from) emit(p, ch)
            }
            // truncates count only in COMMITTED work, exactly once
            tx.truncSeqs.foreach(ts => truncates.countOnce(t.ci, ts))
          case "RBTX" =>
            val tx = open.getOrElse {
              if (tailWindow) OpenTx(txid, implicitTail = true)
              else throw new IllegalArgumentException(
                s"informix cdc: RBTX without an open transaction at $seq")
            }
            require(tx.txid == txid,
              s"informix cdc: RBTX of $txid inside open tx ${tx.txid} at $seq")
            open = None
            tailWindow = false
            rolledBack.countOnce(t.ci, seq)
          case other => throw new IllegalArgumentException(
            s"informix cdc: unknown record type '$other' at $seq " +
            "(INSERT/DELETE/UPDBEF/UPDAFT/BEGINTX/COMMTX/RBTX/TRUNCATE)")
        }
      }
    } finally ps.close()
  }
}
