package graft.sources.cdc

import java.nio.file.{Files, Path, StandardCopyOption}
import java.sql.{DriverManager, ResultSet}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

object JdbcPollingTailer {
  /** One captured table: JDBC schema.table, its key columns, and a
    * strictly-increasing integer watermark column that orders changes.
    *
    * Capture modes by watermark choice (the JDBC-source trade-offs):
    *  - serial id → INSERT-only capture;
    *  - monotonic version/updated-at column → inserts AND updates
    *    (an updated row re-crosses the watermark, re-emits with a
    *    higher LSN, and latest-state-by-LSN downstream upserts it);
    *  - plus `softDeleteCol` (a boolean) → DELETEs too: rows flagged
    *    true emit op='d' (before = row, after = null), completing
    *    C/U/D over polling. Hard deletes still need the log protocol.
    *
    * `serialKeyOps` opts IN to the insert/update op-code discriminator
    * for tables whose single numeric key is assigned monotonically
    * (serial/identity): a polled row whose key is at/below the key
    * high-water recorded at poll start emits op='u', new keys emit
    * op='c'. It is OFF by default because the heuristic is silently
    * wrong for non-serial keys — an explicit insert at a low key, key
    * reuse after delete, or crash-replayed rows would flip 'c'→'u';
    * without it every non-soft-deleted polled row emits 'c' and
    * downstream latest-state still converges.
    *
    * `snapshotOverride`: per-table snapshot SELECT pushed to the
    * source database instead of `SELECT * FROM schema.table` — the
    * reference's `snapshot.select.statement.overrides.<table>` knob
    * (debezium-server-core DebeziumServerTest.java:77-79): snapshot
    * only a filtered/projected slice of a huge table while streaming
    * still captures every change. The statement SHOULD return the
    * watermark column — without it the table's snapshot watermark
    * stays unset and the first poll re-captures all rows (converged
    * downstream, but wasteful); the distributed snapshot REQUIRES it
    * (partitioned read splits on the watermark). */
  final case class TableSpec(schema: String, table: String,
                             keyCols: Seq[String], watermarkCol: String,
                             softDeleteCol: Option[String] = None,
                             serialKeyOps: Boolean = false,
                             snapshotOverride: Option[String] = None) {
    def qualified: String = s"$schema.$table"
  }

  /** Config-driven construction — the `debezium.source.*` namespace
    * for the polling connector:
    *
    *   debezium.source.jdbc.url    = jdbc:...
    *   debezium.source.jdbc.tables = schema.table:key1+key2:wmCol[,…]
    *   debezium.source.path        = <CdcLayout dir the DSv2 source reads>
    *   debezium.source.snapshot.select.statement.overrides.<schema>.<table>
    *                               = SELECT … (per-table snapshot SQL;
    *                                 the upstream list-form key is
    *                                 accepted and ignored — presence of
    *                                 the per-table key is what binds)
    */
  def fromProperties(props: Map[String, String]): JdbcPollingTailer = {
    val overridePrefix = "debezium.source.snapshot.select.statement.overrides."
    def req(k: String) = props.getOrElse(k,
      throw new IllegalArgumentException(s"missing $k"))
    val tables = req("debezium.source.jdbc.tables").split(",").map(_.trim).filter(_.nonEmpty)
      .map { spec =>
        spec.split(":") match {
          case Array(qual, keys, wm, rest @ _*) if rest.size <= 2 =>
            val Array(schema, table) = qual.split("\\.", 2)
            // trailing segments in the documented order
            // [:softDeleteCol][:serial] — the LAST segment `serial` is
            // the reserved flag token opting into the serial-key op
            // discriminator. A soft-delete column literally named
            // `serial` is written `:serial:serial`.
            val (serial, softRest) =
              if (rest.lastOption.contains("serial")) (true, rest.dropRight(1))
              else (false, rest)
            if (softRest.size > 1) throw new IllegalArgumentException(
              s"bad table spec '$spec' (want schema.table:key1+key2:watermarkCol[:softDeleteCol][:serial])")
            TableSpec(schema, table, keys.split("\\+").toSeq, wm, softRest.headOption, serial,
              snapshotOverride = props.get(overridePrefix + qual))
          case _ => throw new IllegalArgumentException(
            s"bad table spec '$spec' (want schema.table:key1+key2:watermarkCol[:softDeleteCol][:serial])")
        }
      }.toSeq
    new JdbcPollingTailer(req("debezium.source.jdbc.url"),
      java.nio.file.Paths.get(req("debezium.source.path")), tables,
      topicPrefix = props.getOrElse("debezium.source.topic.prefix", "testc"))
  }

  /** Background poll loop for a live pipeline: calls `tailer.poll()`
    * every `intervalMs` on a daemon thread until closed — the Spark
    * deployment shape of the reference's connector thread. Errors are
    * counted and retried next tick (transient DB hiccups must not
    * kill capture); `close()` is idempotent and joins the thread. */
  final class Daemon(tailer: JdbcPollingTailer, intervalMs: Long,
                     onPoll: Int => Unit = _ => ()) extends AutoCloseable {
    private val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    @volatile private var errors = 0L
    private val thread = new Thread(() => {
      while (!stop.get()) {
        try onPoll(tailer.poll())
        catch { case _: Throwable if !stop.get() => errors += 1 }
        try Thread.sleep(intervalMs) catch { case _: InterruptedException => () }
      }
    }, "graft-jdbc-tailer")
    thread.setDaemon(true)

    def start(): this.type = { thread.start(); this }
    def errorCount: Long = errors
    override def close(): Unit =
      if (stop.compareAndSet(false, true)) { thread.interrupt(); thread.join(5000) }
  }
}

/** JDBC polling tailer — the live "left half" of the CDC connector
  * (the reference selects a connector per database in
  * debezium-server-dist/pom.xml:359-389): takes a consistent SNAPSHOT
  * of the configured tables over any JDBC connection, then POLLS each
  * table's high watermark incrementally, appending change records as
  * WAL segments in the SAME on-disk `CdcLayout` the `graft-cdc` DSv2
  * source reads. Everything downstream — LSN offsets, include lists,
  * pushed filters, the upsert sink — is unchanged; a production
  * deployment swaps the polling loop for a protocol decoder
  * (pgoutput/binlog) writing the identical contract.
  *
  * Semantics:
  *  - [[snapshot]] runs in ONE repeatable-read transaction: every
  *    table's rows dump to `snapshot/<schema>.<table>.jsonl`, the
  *    snapshot LSN is written to `snapshot/_lsn`, and each table's
  *    max watermark is recorded so polling starts exactly where the
  *    snapshot ended (the reference's snapshot→streaming handoff).
  *  - [[poll]] selects rows with watermark beyond the stored one,
  *    assigns each the next LSN from a global counter (the log's
  *    total order), and streams them into bounded immutable WAL
  *    segments, each written atomically (tmp + ATOMIC_MOVE — the DSv2
  *    reader never sees a partial file). Single-numeric-key tables
  *    get insert/update discrimination via the tracked key high-water
  *    (op='c' vs op='u' with before=null — default-replica-identity
  *    shape); soft-delete columns yield op='d'. HARD deletes and the
  *    prior row image still need the protocol decoder — the classic
  *    JDBC polling capture boundary, declared in COVERAGE.md.
  *  - Crash between segment write and state write replays rows into a
  *    later segment at higher LSNs — at-least-once, which the
  *    epoch-idempotent / latest-state-by-LSN downstream converges.
  */
final class JdbcPollingTailer(jdbcUrl: String, dbDir: Path,
                              tables: Seq[JdbcPollingTailer.TableSpec],
                              topicPrefix: String = "testc",
                              connectorName: String = "jdbc",
                              dbName: String = "db") {
  import JdbcPollingTailer.TableSpec

  /** The configured capture list (read-only view for config tests). */
  def tableSpecs: Seq[TableSpec] = tables

  private val stateFile = dbDir.resolve("_tailer_state")

  /** Consistent snapshot of all configured tables → CdcLayout
    * snapshot dir + initial tailer state. */
  def snapshot(): Unit = {
    val snapDir = Files.createDirectories(dbDir.resolve("snapshot"))
    Files.createDirectories(dbDir.resolve("wal"))
    val conn = DriverManager.getConnection(jdbcUrl)
    try {
      conn.setAutoCommit(false)
      conn.setTransactionIsolation(java.sql.Connection.TRANSACTION_REPEATABLE_READ)
      val watermarks = mutable.Map.empty[String, Long]
      val maxKeys = mutable.Map.empty[String, Long]
      tables.foreach { t =>
        val rows = mutable.ArrayBuffer.empty[String]
        var wm = Long.MinValue
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(t.snapshotOverride.getOrElse(
            s"SELECT * FROM ${t.qualified} ORDER BY ${t.watermarkCol}"))
          while (rs.next()) {
            val m = rowMap(rs)
            // the watermark advances over soft-deleted rows, but a
            // snapshot is CURRENT state — deleted rows don't appear.
            // An override statement may project the watermark away —
            // then wm stays unset and the first poll re-captures.
            m.get(t.watermarkCol.toLowerCase).foreach(v => wm = math.max(wm, longOf(v)))
            // key high-water (soft-deleted rows still occupy keys)
            serialKey(t, m).foreach(k =>
              maxKeys(t.qualified) = math.max(maxKeys.getOrElse(t.qualified, Long.MinValue), k))
            if (!isSoftDeleted(t, m)) rows += jsonObject(m)
          }
        } finally st.close()
        watermarks(t.qualified) = wm
        val tmp = snapDir.resolve(s".${t.qualified}.jsonl.tmp")
        Files.writeString(tmp, rows.mkString("", "\n", "\n"))
        Files.move(tmp, snapDir.resolve(s"${t.qualified}.jsonl"),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      }
      conn.commit()
      // the snapshot is consistent at LSN 0; polled changes follow at 1…
      Files.writeString(snapDir.resolve("_lsn"), "0")
      writeState(0L, watermarks.toMap, maxKeys.toMap)
    } finally conn.close()
  }

  /** The `no_data`/`never` snapshot modes (the reference's
    * `snapshot.mode` values that skip the data phase): record each
    * table's CURRENT watermark and key high-water as the streaming
    * start point WITHOUT dumping any rows — existing data is never
    * delivered, polling captures only changes committed after this
    * point. Empty dump files keep the layout contract (the DSv2
    * source expects the snapshot dir). One aggregate query per table
    * instead of a full scan — this is what makes `no_data` the fast
    * path on a huge pre-existing table. */
  def snapshotSchemaOnly(): Unit = {
    val snapDir = Files.createDirectories(dbDir.resolve("snapshot"))
    Files.createDirectories(dbDir.resolve("wal"))
    val conn = DriverManager.getConnection(jdbcUrl)
    try {
      conn.setAutoCommit(false)
      conn.setTransactionIsolation(java.sql.Connection.TRANSACTION_REPEATABLE_READ)
      val watermarks = mutable.Map.empty[String, Long]
      val maxKeys = mutable.Map.empty[String, Long]
      tables.foreach { t =>
        val rel = t.snapshotOverride.map(o => s"($o) ovr").getOrElse(t.qualified)
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(s"SELECT max(${t.watermarkCol}) FROM $rel")
          watermarks(t.qualified) =
            if (rs.next()) rs.getObject(1) match {
              case n: Number => n.longValue()
              case _ => Long.MinValue
            } else Long.MinValue
          singleKeyCol(t).foreach { k =>
            val krs = st.executeQuery(s"SELECT max($k) FROM ${t.qualified}")
            if (krs.next()) krs.getObject(1) match {
              case n: Number => maxKeys(t.qualified) = n.longValue()
              case _ => ()
            }
          }
        } finally st.close()
        val tmp = snapDir.resolve(s".${t.qualified}.jsonl.tmp")
        Files.writeString(tmp, "")
        Files.move(tmp, snapDir.resolve(s"${t.qualified}.jsonl"),
          StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      }
      conn.commit()
      Files.writeString(snapDir.resolve("_lsn"), "0")
      writeState(0L, watermarks.toMap, maxKeys.toMap)
    } finally conn.close()
  }

  /** DISTRIBUTED snapshot — the 100 TB path: each table reads through
    * Spark's partitioned JDBC source (`numPartitions` parallel
    * executor-side connections split on the watermark column) instead
    * of one driver-side loop. Consistency WITHOUT a cross-connection
    * transaction comes from the watermark bound: `max(watermark)` is
    * read FIRST and the snapshot takes only rows at or below it — any
    * row committed later has a higher watermark and belongs to the
    * first poll. The dump for table T is a DIRECTORY `T.jsonl/` of
    * part files; the DSv2 source scans each part as its own input
    * partition. */
  def snapshotDistributed(spark: org.apache.spark.sql.SparkSession,
                          numPartitions: Int = 8): Unit = {
    import org.apache.spark.sql.functions.{col, struct, to_json}
    val snapDir = Files.createDirectories(dbDir.resolve("snapshot"))
    Files.createDirectories(dbDir.resolve("wal"))
    val watermarks = mutable.Map.empty[String, Long]
    val maxKeys = mutable.Map.empty[String, Long]
    tables.foreach { t =>
      // an override statement replaces the base relation everywhere in
      // the snapshot path (bounds, key high-water, partitioned read) —
      // it MUST return the watermark column here, since the
      // distributed read splits on it
      val rel = t.snapshotOverride.map(o => s"($o) ovr").getOrElse(t.qualified)
      // bound first: the snapshot's consistency point on the watermark
      val conn = DriverManager.getConnection(jdbcUrl)
      val (lo, hi) = try {
        val rs = conn.createStatement().executeQuery(
          s"SELECT min(${t.watermarkCol}), max(${t.watermarkCol}) FROM $rel")
        val bounds = if (rs.next() && rs.getObject(2) != null) (rs.getLong(1), rs.getLong(2))
          else (0L, -1L) // empty table
        // key high-water at the same consistency point (single
        // numeric-key tables only — the insert/update discriminator).
        // NOTE: reads the BASE table, not the override — keys outside
        // the snapshot slice still occupy key space.
        singleKeyCol(t).foreach { k =>
          val krs = conn.createStatement().executeQuery(
            s"SELECT max($k) FROM ${t.qualified} WHERE ${t.watermarkCol} <= ${bounds._2}")
          if (krs.next()) krs.getObject(1) match {
            case n: Number => maxKeys(t.qualified) = n.longValue()
            case _ => ()
          }
        }
        bounds
      } finally conn.close()
      watermarks(t.qualified) = if (hi < lo) Long.MinValue else hi
      val target = snapDir.resolve(s"${t.qualified}.jsonl")
      if (hi < lo) {
        Files.writeString(target, "") // empty dump file
      } else {
        val df = spark.read.format("jdbc")
          .option("url", jdbcUrl)
          .option("dbtable",
            s"(SELECT * FROM $rel WHERE ${t.watermarkCol} <= $hi) snap")
          .option("partitionColumn", t.watermarkCol)
          .option("lowerBound", lo.toString).option("upperBound", (hi + 1).toString)
          .option("numPartitions", numPartitions.toString)
          .load()
        val lowered = df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, c.toLowerCase))
        val live = t.softDeleteCol match {
          case Some(c) => lowered.filter(!org.apache.spark.sql.functions
            .coalesce(col(c.toLowerCase).cast("boolean"),
              org.apache.spark.sql.functions.lit(false)))
          case None => lowered
        }
        live.select(to_json(struct(live.columns.sorted.map(col).toIndexedSeq: _*)).as("value"))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite).text(target.toString)
      }
    }
    Files.writeString(snapDir.resolve("_lsn"), "0")
    writeState(0L, watermarks.toMap, maxKeys.toMap)
  }

  /** One incremental poll: captures rows past each table's stored
    * watermark into new WAL segments. Returns the number of captured
    * changes (0 writes no segment).
    *
    * Bounded memory: rows stream from the result set into segments of
    * at most `maxSegmentRecords` lines — a large backlog after
    * downtime becomes MANY segments, never one driver-resident
    * buffer. The state file advances after EVERY segment flush, so a
    * crash mid-backlog replays only rows past the last flushed
    * segment's watermark (at-least-once, converged downstream).
    *
    * Op fidelity: for tables whose key is a single numeric column,
    * the snapshot/last-poll key high-water discriminates inserts from
    * updates — a polled row whose key is at or below the high-water
    * existed before, so it emits op='u' (before=null, the shape a
    * Postgres decoder emits under default REPLICA IDENTITY — no prior
    * image retained); a higher key is new → op='c'. Composite or
    * non-numeric keys fall back to 'c' (latest-state downstream is
    * unaffected; only op-code consumers see the difference). */
  def poll(maxSegmentRecords: Int = 10000): Int = {
    require(Files.exists(stateFile), "tailer: snapshot() must run before poll()")
    require(maxSegmentRecords > 0, "maxSegmentRecords must be positive")
    val (lsn0, wms0, mks0) = readState()
    var lsn = lsn0
    val wms = mutable.Map(wms0.toSeq: _*)
    val mks = mutable.Map(mks0.toSeq: _*)
    val buf = mutable.ArrayBuffer.empty[String]
    var total = 0
    val walDir = Files.createDirectories(dbDir.resolve("wal"))
    var seq = CdcLayout.walFiles(dbDir).size
    def flush(): Unit = if (buf.nonEmpty) {
      val tmp = walDir.resolve(f".wal-$seq%06d.jsonl.tmp")
      Files.writeString(tmp, buf.mkString("", "\n", "\n"))
      Files.move(tmp, walDir.resolve(f"wal-$seq%06d.jsonl"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      seq += 1
      writeState(lsn, wms.toMap, mks.toMap)
      total += buf.size
      buf.clear()
    }
    val conn = DriverManager.getConnection(jdbcUrl)
    try {
      tables.foreach { t =>
        val from = wms.getOrElse(t.qualified, Long.MinValue)
        // fixed at poll start: keys at/below this existed before
        val keyHighWater = mks.getOrElse(t.qualified, Long.MinValue)
        val ps = conn.prepareStatement(
          s"SELECT * FROM ${t.qualified} WHERE ${t.watermarkCol} > ? ORDER BY ${t.watermarkCol}")
        try {
          ps.setLong(1, from)
          val rs = ps.executeQuery()
          while (rs.next()) {
            val m = rowMap(rs)
            lsn += 1
            wms(t.qualified) = math.max(
              wms.getOrElse(t.qualified, Long.MinValue), longOf(m(t.watermarkCol.toLowerCase)))
            val k = serialKey(t, m)
            val existedBefore = t.serialKeyOps && k.exists(_ <= keyHighWater)
            k.foreach(v => mks(t.qualified) =
              math.max(mks.getOrElse(t.qualified, Long.MinValue), v))
            buf += envelopeLine(t, m, lsn, existedBefore)
            if (buf.size >= maxSegmentRecords) flush()
          }
        } finally ps.close()
      }
    } finally conn.close()
    flush()
    total
  }

  /** lowercased column → value map for the current result-set row. */
  private def rowMap(rs: ResultSet): Map[String, Any] = {
    val md = rs.getMetaData
    (1 to md.getColumnCount).map { i =>
      md.getColumnLabel(i).toLowerCase -> rs.getObject(i)
    }.toMap
  }

  private def longOf(v: Any): Long = v match {
    case n: Number => n.longValue()
    case other => throw new IllegalArgumentException(
      s"tailer: watermark column must be integer-typed, got $other")
  }

  /** The single key column, when there is exactly one — the
    * insert/update discriminator only works for serial-style keys. */
  private def singleKeyCol(t: TableSpec): Option[String] =
    t.keyCols match { case Seq(k) => Some(k.toLowerCase); case _ => None }

  /** This row's key as a Long, when the table has a single numeric
    * key column. */
  private def serialKey(t: TableSpec, row: Map[String, Any]): Option[Long] =
    singleKeyCol(t).flatMap(k => row.get(k)).collect { case n: Number => n.longValue() }

  private def isSoftDeleted(t: TableSpec, row: Map[String, Any]): Boolean =
    t.softDeleteCol.exists(c => row.get(c.toLowerCase) match {
      case Some(b: java.lang.Boolean) => b.booleanValue()
      case Some(n: Number)            => n.longValue() != 0L
      case _                          => false
    })

  private def envelopeLine(t: TableSpec, row: Map[String, Any], lsn: Long,
                           existedBefore: Boolean): String = {
    val key = jsonObject(t.keyCols.map(k => k.toLowerCase -> row(k.toLowerCase)).toMap)
    val (op, before, after) =
      if (isSoftDeleted(t, row)) ("d", jsonObject(row), "null")
      else if (existedBefore) ("u", "null", jsonObject(row))
      else ("c", "null", jsonObject(row))
    s"""{"destination":"$topicPrefix.${t.qualified}","key":$key,""" +
      s""""value":{"op":"$op","before":$before,"after":$after,""" +
      s""""source":{"connector":"$connectorName","db":"$dbName","schema":"${t.schema}",""" +
      s""""table":"${t.table}","lsn":$lsn,"snapshot":"false","ts_ms":0},"ts_ms":0},"headers":{}}"""
  }

  private def jsonObject(m: Map[String, Any]): String = CdcJson.obj(m)

  /** State file: "lsn <n>" + "wm <schema.table> <watermark>" +
    * "mk <schema.table> <max key>" lines. */
  private def writeState(lsn: Long, wms: Map[String, Long],
                         mks: Map[String, Long]): Unit = {
    val tmp = dbDir.resolve("_tailer_state.tmp")
    Files.writeString(tmp,
      (s"lsn $lsn" +:
        (wms.toSeq.sorted.map { case (t, w) => s"wm $t $w" } ++
         mks.toSeq.sorted.map { case (t, k) => s"mk $t $k" }))
        .mkString("", "\n", "\n"))
    Files.move(tmp, stateFile,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def readState(): (Long, Map[String, Long], Map[String, Long]) = {
    val lines = Files.readAllLines(stateFile).asScala.filter(_.nonEmpty)
    val lsn = lines.head.stripPrefix("lsn ").trim.toLong
    def section(tag: String) = lines.tail.filter(_.startsWith(tag + " ")).map { l =>
      val Array(_, t, w) = l.split(" ", 3); t -> w.toLong
    }.toMap
    (lsn, section("wm"), section("mk"))
  }
}
