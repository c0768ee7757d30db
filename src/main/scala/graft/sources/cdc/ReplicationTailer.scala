package graft.sources.cdc

import java.nio.file.{Files, Path}

/** A replication message feed — the seam between a live server session
  * and a protocol decoder. A production implementation wraps the
  * socket stream (PostgreSQL `START_REPLICATION` on a logical slot,
  * MySQL `COM_BINLOG_DUMP`); tests use in-memory fixtures. `poll()`
  * returns the next batch of raw protocol messages (empty = nothing
  * new); messages must be returned in log order, each exactly once per
  * session (re-delivery after a crash is fine — the downstream layout
  * is at-least-once and LSN-converged). */
trait ReplicationFeed extends AutoCloseable {
  def poll(): Seq[Array[Byte]]
  /** Acknowledge the messages returned by the LAST [[poll]] — only now
    * may the feed advance its (durable) position. A poll that is never
    * committed (the decoder threw, the process died) is re-delivered
    * by the next poll, so a decode failure can never LOSE messages;
    * it can only re-deliver them (at-least-once, converged
    * downstream). */
  def commit(): Unit = ()
  override def close(): Unit = ()
}

/** File-based [[ReplicationFeed]]: reads raw protocol-message files
  * from a directory in name order (one message per file; writers use
  * tmp+rename so a partial file is never visible) — the replayable
  * fixture/capture form of a replication session, and the config
  * surface (`debezium.source.protocol.dir`) for driving a decoder
  * without a live socket. `offsetFile` persists consumed file names so
  * a restarted feed resumes instead of re-delivering (re-delivery is
  * still safe downstream — at-least-once). New files appearing later
  * ARE picked up: each poll lists the directory and returns only
  * not-yet-consumed names. */
final class FileReplicationFeed(dir: Path, offsetFile: Option[Path] = None)
    extends ReplicationFeed {
  import scala.jdk.CollectionConverters._
  private var consumed: Set[String] =
    offsetFile.filter(Files.exists(_))
      .map(f => Files.readAllLines(f).asScala.filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
  private var pending: Seq[String] = Nil

  override def poll(): Seq[Array[Byte]] = {
    if (!Files.exists(dir)) return Nil
    // un-committed names from the previous poll are INCLUDED again —
    // a failed decode re-delivers instead of losing them
    val fresh = graft.Fs.children(dir)
      .filter { p =>
        val n = p.getFileName.toString
        Files.isRegularFile(p) && !n.startsWith(".") && !n.startsWith("_") &&
          !consumed.contains(n)
      }
      .sortBy(_.getFileName.toString)
    pending = fresh.map(_.getFileName.toString)
    fresh.map(Files.readAllBytes)
  }

  override def commit(): Unit = if (pending.nonEmpty) {
    consumed ++= pending
    pending = Nil
    offsetFile.foreach { f =>
      val tmp = f.resolveSibling("." + f.getFileName.toString + ".tmp")
      Files.writeString(tmp, consumed.toSeq.sorted.mkString("", "\n", "\n"))
      Files.move(tmp, f, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }
}

/** Drains a [[ReplicationFeed]] through a protocol decoder into the
  * [[CdcLayout]] WAL of `db` — the deployment shape that REPLACES
  * [[JdbcPollingTailer]]'s polling loop when log access exists: same
  * layout, same DSv2 source, same sinks downstream; only the capture
  * mechanism changes (and with it, hard deletes + before images
  * appear).
  *
  * `decode` is any bytes→envelopes function — [[PgOutputDecoder]] and
  * [[BinlogDecoder]] both fit (`dec.decode`). Decoded lines append as
  * immutable WAL segments of at most `maxSegmentRecords` lines each
  * (atomic tmp+move, the tailer's protocol), so a large backlog after
  * downtime becomes many bounded segments, never one driver-resident
  * buffer.
  */
final class ReplicationTailer(feed: ReplicationFeed,
                              decode: Array[Byte] => Seq[String],
                              db: Path,
                              maxSegmentRecords: Int = 10000) extends AutoCloseable {
  require(maxSegmentRecords > 0, "maxSegmentRecords must be positive")

  Files.createDirectories(db.resolve("wal"))

  /** One drain: poll the feed once, decode, append segments, COMMIT
    * the feed position. Returns the number of envelope lines written.
    * Failure ordering is the at-least-once contract: a malformed frame
    * throws BEFORE any segment from the batch lands and the feed is
    * never committed, so the next drain re-delivers the whole poll —
    * messages can be re-decoded, never lost. (A crash between
    * appendSegment and commit re-appends the batch at new LSNs; the
    * epoch-idempotent / latest-state-by-LSN downstream converges.) */
  def drainOnce(): Int = {
    val msgs = feed.poll()
    if (msgs.isEmpty) 0
    else {
      var written = 0
      val lines = msgs.flatMap(decode)
      lines.grouped(maxSegmentRecords).foreach { chunk =>
        PgOutputDecoder.appendSegment(db, chunk)
        written += chunk.size
      }
      feed.commit()
      written
    }
  }

  /** Background drain loop on a daemon thread — the deployment shape of
    * the reference's connector task. Errors count and retry next tick
    * (a transient server hiccup must not kill capture). */
  def daemon(intervalMs: Long, onDrain: Int => Unit = _ => ()): Daemon =
    new Daemon(intervalMs, onDrain)

  final class Daemon(intervalMs: Long, onDrain: Int => Unit) extends AutoCloseable {
    private val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    @volatile private var errors = 0L
    private val thread = new Thread(() => {
      while (!stop.get()) {
        try onDrain(drainOnce())
        catch { case _: Throwable if !stop.get() => errors += 1 }
        try Thread.sleep(intervalMs) catch { case _: InterruptedException => () }
      }
    }, "graft-replication-tailer")
    thread.setDaemon(true)

    def start(): this.type = { thread.start(); this }
    def errorCount: Long = errors
    override def close(): Unit =
      if (stop.compareAndSet(false, true)) { thread.interrupt(); thread.join(5000) }
  }

  override def close(): Unit = feed.close()
}
