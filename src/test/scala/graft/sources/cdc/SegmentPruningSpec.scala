package graft.sources.cdc

import graft.SparkSpec
import java.nio.file.{Files, Path}

/** WAL segment pruning: micro-batches must only open segments whose
  * cached LSN bounds overlap the batch range — the long-running-stream
  * scale property (thousands of immutable segments, each read by the
  * batches that cover it and never again). */
class SegmentPruningSpec extends SparkSpec {

  private def line(id: Int, lsn: Long): String =
    s"""{"destination":"testc.s.t","key":{"id":$id},"value":{"op":"c","before":null,"after":{"id":$id},"source":{"connector":"pg","db":"d","schema":"s","table":"t","lsn":$lsn,"snapshot":"false","ts_ms":0},"ts_ms":0},"headers":{}}"""

  private def db3(): Path = {
    val db = Files.createTempDirectory("graft-prune")
    val wal = Files.createDirectories(db.resolve("wal"))
    Files.writeString(wal.resolve("wal-000.jsonl"),
      Seq(line(1, 1), line(2, 2), line(3, 3)).mkString("\n") + "\n")
    Files.writeString(wal.resolve("wal-001.jsonl"),
      Seq(line(4, 5),
          // lsn-less tombstone anchors to predecessor (5)
          """{"destination":"testc.s.t","key":{"id":4},"value":null,"headers":{}}""",
          line(5, 7)).mkString("\n") + "\n")
    Files.writeString(wal.resolve("wal-002.jsonl"),
      Seq(line(6, 9)).mkString("\n") + "\n")
    db
  }

  test("segmentBounds mirror the reader's lsn anchoring") {
    val db = db3()
    val wals = CdcLayout.walFiles(db)
    assert(CdcLayout.segmentBounds(wals(0)) == (1L, 3L))
    assert(CdcLayout.segmentBounds(wals(1)) == (5L, 7L)) // tombstone anchored inside
    assert(CdcLayout.segmentBounds(wals(2)) == (9L, 9L))
  }

  test("latestOffset/metrics never re-scan a segment: driver I/O is O(new segments) per trigger") {
    val db = db3()
    val opts = Map("path" -> db.toString,
      "keyschema" -> "id INT", "rowschema" -> "id INT")
    val stream = new CdcMicroBatchStream(opts, Array.empty)

    val before = CdcLayout.segmentScans.sum()
    // a long-running stream: many idle triggers, each asking for the log
    // end (latestOffset), the progress report (reportLatestOffset) and
    // metrics — with 3 immutable segments this must cost exactly 3 scans
    // TOTAL, not 3 per call
    (1 to 10).foreach { _ =>
      assert(stream.latestOffset().asInstanceOf[CdcOffset].lsn == 9L)
      assert(stream.reportLatestOffset().asInstanceOf[CdcOffset].lsn == 9L)
      stream.metrics(java.util.Optional.empty())
      stream.planInputPartitions(CdcOffset(-1L), CdcOffset(9L))
    }
    assert(CdcLayout.segmentScans.sum() - before == 3L)

    // a NEW segment appears: the next trigger scans only it
    java.nio.file.Files.writeString(db.resolve("wal").resolve("wal-003.jsonl"),
      line(7, 11) + "\n")
    assert(stream.latestOffset().asInstanceOf[CdcOffset].lsn == 11L)
    stream.metrics(java.util.Optional.empty())
    assert(CdcLayout.segmentScans.sum() - before == 4L)
  }

  test("planInputPartitions opens only segments overlapping the LSN range") {
    val db = db3()
    val opts = Map("path" -> db.toString,
      "keyschema" -> "id INT", "rowschema" -> "id INT")
    val stream = new CdcMicroBatchStream(opts, Array.empty)

    def files(s: Long, e: Long): Seq[String] =
      stream.planInputPartitions(CdcOffset(s), CdcOffset(e))
        .map(_.asInstanceOf[CdcPartition]).filterNot(_.isSnapshot)
        .map(p => java.nio.file.Paths.get(p.file).getFileName.toString).sorted.toSeq

    assert(files(-1L, 9L) == Seq("wal-000.jsonl", "wal-001.jsonl", "wal-002.jsonl"))
    assert(files(3L, 7L) == Seq("wal-001.jsonl"))  // middle segment only
    assert(files(7L, 9L) == Seq("wal-002.jsonl"))  // tail only
    assert(files(9L, 9L) == Seq.empty)             // drained: nothing to open
    // rows delivered are unchanged by pruning (the end-to-end check)
    val df = spark.read.format("graft-cdc")
      .option("path", db.toString)
      .option("keySchema", "id INT").option("rowSchema", "id INT")
      .load()
    assert(df.count() == 7) // 6 changes + 1 tombstone
  }
}
