package graft.services

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Durable schema history — the reference's
  * `debezium.source.schema.history.internal.*` subsystem (file/Redis
  * backed stores, e.g. debezium-server-redis/.../RedisSchemaHistory.java;
  * config namespace mirrored by PipelineConfig.reuseSinkConfig):
  * an APPEND-ONLY log of schema-change (DDL) events that a restarting
  * pipeline replays to reconstruct each table's current schema before
  * touching the WAL.
  *
  * Spark rebuild: schema-change records ride the control stream
  * (EventShaping.splitSchemaChanges); [[record]] appends them here.
  * DDL rate is human-scale — a driver-side append of the tiny control
  * slice is the honest design, not a distributed write. Entries are
  * JSON lines ordered by (lsn, arrival); [[currentSchemas]] folds the
  * log to the latest schema per table. The append is atomic-per-line
  * (single `write` with CREATE+APPEND), so a crash never corrupts
  * prior history — the same guarantee the reference's file store gives.
  */
final class SchemaHistory(dir: Path) {
  Files.createDirectories(dir)
  private val log = dir.resolve("schema-history.jsonl")

  /** Append the batch's schema-change records (the control slice of a
    * shaped stream). Expects canonical record columns; the DDL payload
    * is carried as the serialized value struct. */
  def record(schemaChanges: DataFrame): Unit = {
    // collect() returns rows in PARTITION order, not lsn order — a
    // multi-partition control batch can hand back two DDLs for one
    // table reversed, and the latest-wins fold in currentSchemas would
    // resurrect the stale schema. Stable-sort by lsn (ties keep
    // arrival order) before appending.
    val rows = schemaChanges.select(
        col("destination"),
        coalesce(col("value.source.lsn"), lit(-1L)).as("lsn"),
        to_json(col("value")).as("ddl"))
      .collect() // control stream: DDL-rate, driver-side by design
      .sortBy(_.getLong(1))
    if (rows.nonEmpty) {
      val lines = rows.map { r =>
        s"""{"destination":${q(r.getString(0))},"lsn":${r.getLong(1)},"ddl":${q(r.getString(2))}}"""
      }
      Files.write(log, (lines.mkString("", "\n", "\n")).getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  /** Append one DDL entry directly — the native-CDC tailers' path:
    * a capture daemon observes a table's column set drifting and
    * records it here without a round-trip through the stream
    * (DDL-rate, driver-side, same atomic-per-line append). */
  def recordDdl(destination: String, lsn: Long, ddl: String): Unit =
    Files.write(log,
      s"""{"destination":${q(destination)},"lsn":$lsn,"ddl":${q(ddl)}}\n""".getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  /** The full ordered history (replay order = append order). */
  def replay(): Seq[SchemaHistory.Entry] =
    if (!Files.exists(log)) Nil
    else Files.readAllLines(log).asScala.filter(_.nonEmpty).toSeq.map { line =>
      val n = graft.sources.cdc.JsonRows.parse(line)
      SchemaHistory.Entry(n.get("destination").asText(), n.get("lsn").asLong(),
        n.get("ddl").asText())
    }

  /** Latest schema-change payload per destination — what a restarting
    * connector needs before reading the WAL. */
  def currentSchemas(): Map[String, String] =
    replay().foldLeft(Map.empty[String, String]) { (m, e) =>
      m.updated(e.destination, e.ddl)
    }

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
}

object SchemaHistory {
  final case class Entry(destination: String, lsn: Long, ddl: String)
}
