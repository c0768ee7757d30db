package graft.sources.cdc

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.sql.{DriverManager, ResultSet}

/** The native-CDC snapshot path must stream rows to disk as the
  * ResultSet iterates — a 100-TB-scale table buffered on the driver
  * (plus a second full copy through mkString) is an OOM. The write
  * granularity is asserted to be ONE row, independent of table size. */
class NativeCdcSnapshotSpec extends AnyFunSuite {
  import NativeCdc._

  /** Minimal concrete tailer: snapshot machinery only. */
  private final class SnapshotOnlyTailer(url: String, db: java.nio.file.Path,
                                         specs: Seq[TableSpec])
      extends NativeCdcTailer(url, db, specs, "testc", "db", emitTombstones = true) {
    override def connectorName: String = "test"
    override def stateFileName: String = "_test_state"
    override protected def currentPosition(conn: java.sql.Connection,
                                           t: TableSpec): Position = Position.Min
    override protected def forEachChange(conn: java.sql.Connection, t: TableSpec,
                                         from: Position)
                                        (emit: (Position, Change) => Unit): Unit = ()
  }

  /** Records per-call write sizes — the proxy for driver footprint. */
  private final class TrackingWriter extends java.io.Writer {
    var calls = 0L
    var maxChunk = 0
    override def write(cbuf: Array[Char], off: Int, len: Int): Unit = {
      calls += 1; maxChunk = math.max(maxChunk, len)
    }
    override def flush(): Unit = ()
    override def close(): Unit = ()
  }

  private def fixture(rows: Int): (String, java.sql.Connection) = {
    val url = s"jdbc:derby:memory:snap${java.util.UUID.randomUUID().toString.take(8)};create=true"
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE SCHEMA src")
    st.execute("CREATE TABLE src.docs (id INT PRIMARY KEY, body VARCHAR(256))")
    val ps = conn.prepareStatement("INSERT INTO src.docs VALUES (?, ?)")
    (1 to rows).foreach { i =>
      ps.setInt(1, i); ps.setString(2, s"document body $i " + ("x" * 100))
      ps.addBatch()
      if (i % 1000 == 0) ps.executeBatch()
    }
    ps.executeBatch(); ps.close(); st.close()
    (url, conn)
  }

  test("snapshot write granularity is one row — bounded chunks regardless of table size") {
    def maxChunkFor(rows: Int): (Long, Int) = {
      val (url, conn) = fixture(rows)
      val db = Files.createTempDirectory("graft-snapspec")
      val tailer = new SnapshotOnlyTailer(url, db, Seq(TableSpec("src", "docs", Seq("id"))))
      val st = conn.createStatement()
      try {
        val rs: ResultSet = st.executeQuery("SELECT * FROM src.docs")
        val w = new TrackingWriter
        val n = tailer.writeSnapshotRows(rs, w)
        assert(n == rows)
        // one write per row + one per newline — never a table image
        assert(w.calls == 2L * rows)
        (w.calls, w.maxChunk)
      } finally { st.close(); conn.close() }
    }
    val (_, small) = maxChunkFor(100)
    val (_, large) = maxChunkFor(20000)
    // the footprint proxy: the largest single write is a row, and it
    // does NOT grow with the table (200× the rows, same bound)
    assert(large <= small * 2, s"chunk grew with table size: $small -> $large")
    assert(large < 4096, s"single-row write unexpectedly large: $large")
  }

  test("full snapshot() streams to the .tmp file and lands the atomic rename") {
    val rows = 20000
    val (url, conn) = fixture(rows)
    val db = Files.createTempDirectory("graft-snapspec2")
    val tailer = new SnapshotOnlyTailer(url, db, Seq(TableSpec("src", "docs", Seq("id"))))
    tailer.snapshot()
    val f = db.resolve("snapshot/src.docs.jsonl")
    assert(Files.exists(f))
    val lineCount = Files.lines(f).count()
    assert(lineCount == rows)
    assert(!Files.exists(db.resolve("snapshot/.src.docs.jsonl.tmp")))
    conn.close()
  }
}
