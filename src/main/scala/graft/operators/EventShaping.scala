package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.Envelope

/** Event-shaping operators (SURVEY.md §2.2) — the SMT layer, rebuilt as
  * composable `DataFrame => DataFrame` stages. Each stage is pure
  * Column algebra, so Catalyst folds the whole chain into one projection
  * and keeps it inside WholeStageCodegen: at 100 TB this layer costs one
  * pass over the scan, no shuffle.
  */
object EventShaping {

  /** A single-message-transform stage, optionally gated by a predicate —
    * the reference's `debezium.transforms.*` + `debezium.predicates.*`
    * pairing (debezium-server-core/.../DebeziumServerConfigSourceFactory.java:107-117).
    * When gated, un-matching rows pass through unchanged.
    */
  final case class Smt(name: String,
                       transform: DataFrame => DataFrame,
                       predicate: Option[Column] = None,
                       negate: Boolean = false)

  object Smt {
    /** Predicated COLUMN-LEVEL transform: each (column → expression)
      * pair is wrapped in `when(pred, expr).otherwise(original)`, so
      * the whole gated stage stays ONE projection — single scan, fully
      * codegen'd. Prefer this over a predicated whole-frame transform
      * whenever the SMT only rewrites columns (routing, renames,
      * masking — most of the reference's SMT catalog). */
    def columnLevel(name: String, columns: Map[String, Column],
                    predicate: Column, negate: Boolean = false): Smt = {
      val p0 = if (negate) !predicate else predicate
      val p = coalesce(p0, lit(false))
      Smt(name, df => columns.foldLeft(df) { case (d, (c, expr)) =>
        d.withColumn(c, when(p, expr).otherwise(col(c)))
      })
    }
  }

  /** Apply an ordered SMT chain. Column-level predicated stages
    * (Smt.columnLevel) fold into a single projection. A predicated
    * WHOLE-FRAME transform is the rare path: it splits on the
    * predicate and re-unions, which evaluates the upstream plan twice
    * and does not preserve row order — chain several and the scan
    * count grows per stage. Use Smt.columnLevel when possible, or
    * cache the input frame before a predicated whole-frame stage. */
  def applyChain(df: DataFrame, chain: Seq[Smt]): DataFrame =
    chain.foldLeft(df) { (d, smt) =>
      smt.predicate match {
        case None => smt.transform(d)
        case Some(p0) =>
          val p = if (smt.negate) !p0 else p0
          val matched = smt.transform(d.filter(p))
          val rest    = d.filter(!coalesce(p, lit(false)))
          matched.unionByName(rest, allowMissingColumns = true)
      }
    }

  /** ExtractNewRecordState: flatten envelope → after-state row
    * (the reference ships this SMT from upstream; flattened events are
    * recognized at FlussChangeConsumer.java:195-199). Deletes are
    * dropped unless `keepDeletes` (then before-state is surfaced with a
    * `__deleted` marker, mirroring the SMT's delete.handling.mode). */
  def extractNewRecordState(df: DataFrame, keepDeletes: Boolean = false): DataFrame = {
    val isDelete = col("value.op") === Envelope.OpDelete
    val base =
      if (keepDeletes)
        df.withColumn("__deleted", isDelete)
          .withColumn("__row", when(isDelete, col("value.before")).otherwise(col("value.after")))
      else
        df.filter(!coalesce(isDelete, lit(false)))
          .withColumn("__deleted", lit(false))
          .withColumn("__row", col("value.after"))
    base.select(col("destination"), col("__row.*"), col("__deleted"))
  }

  /** Heartbeat skip (RedisStreamChangeConsumer.java:199-204). */
  def dropHeartbeats(df: DataFrame, prefix: String = Envelope.HeartbeatPrefix): DataFrame =
    df.filter(!col("destination").startsWith(prefix))

  /** Schema-change (DDL) events travel on a side stream the data path
    * must not apply (vector sinks skip them,
    * MilvusChangeConsumer.java:119-123,217-220; SURVEY.md §7.5 item 3
    * models them as a control stream). Split on the destination
    * suffix: (data records, schema-change records). */
  val SchemaChangeSuffix = ".schema-changes"
  def splitSchemaChanges(df: DataFrame): (DataFrame, DataFrame) = {
    val isDdl = col("destination").endsWith(SchemaChangeSuffix)
    (df.filter(!isDdl), df.filter(isDdl))
  }

  /** Tombstone handling: keep null-value records only when the sink
    * supports them (TombstoneSupportProducer.java:33-42). */
  def filterTombstones(df: DataFrame, sinkSupportsTombstones: Boolean): DataFrame =
    if (sinkSupportsTombstones) df else df.filter(col("value").isNotNull)

  /** StreamNameMapper (BaseChangeConsumer.java:35-46): logical → physical
    * stream name, default identity. */
  def mapStreamName(df: DataFrame, f: Column => Column): DataFrame =
    df.withColumn("destination", f(col("destination")))

  /** Fluss-style physical name sanitization: [^a-zA-Z0-9_-] → "_"
    * (FlussChangeConsumer.java:236-240). */
  def sanitizeFluss(name: Column): Column =
    regexp_replace(name, "[^a-zA-Z0-9_\\-]", "_")

  /** Milvus-style: dots → underscores (MilvusChangeConsumer.java:115-117). */
  def sanitizeMilvus(name: Column): Column =
    regexp_replace(name, "\\.", "_")

  /** Content-based router: recompute destination from row content —
    * the reference's ContentBasedRouter SMT. */
  def route(df: DataFrame, destination: Column): DataFrame =
    df.withColumn("destination", destination)

  /** Outbox EventRouter (debezium's
    * io.debezium.transforms.outbox.EventRouter, shipped with the
    * reference distribution): turn change events captured from an
    * insert-only outbox table into domain events — the destination is
    * the route-by field (default `aggregatetype`) spliced into the
    * topic template, the key is rebuilt from the aggregate-id field so
    * partitioning follows the AGGREGATE not the outbox row, and the
    * value is replaced by the raw payload the writer serialized.
    * Snapshot reads ride along with inserts (op 'r' — the upstream SMT
    * routes snapshotted outbox rows too); updates/deletes/tombstones
    * are dropped (outbox rows are written once, then purged). One
    * filter + one projection — no shuffle, stays in codegen. */
  def outboxRoute(df: DataFrame,
                  routeByField: String = "aggregatetype",
                  keyField: String = "aggregateid",
                  payloadField: String = "payload",
                  topicTemplate: String = "outbox.event.${routedByValue}"): DataFrame = {
    val routedBy = col(s"value.after.$routeByField").cast("string")
    val placeholder = "${routedByValue}"
    val i = topicTemplate.indexOf(placeholder)
    val dest =
      if (i < 0) lit(topicTemplate)
      else concat(lit(topicTemplate.substring(0, i)), routedBy,
                  lit(topicTemplate.substring(i + placeholder.length)))
    df.filter(col("value").isNotNull &&
              (col("value.op") === Envelope.OpCreate || col("value.op") === Envelope.OpRead))
      .withColumn("destination", dest)
      .withColumn("key",
        struct(col(s"value.after.$keyField").cast("string").as(keyField)))
      .withColumn("value", col(s"value.after.$payloadField"))
  }

  /** Header projection to sink metadata: uppercased keys + optional
    * prefix (BaseChangeConsumer.java:101-108; HTTP adds a prefix,
    * HttpChangeConsumer.java:336-346). */
  def projectHeaders(headers: Column, prefix: String = ""): Column =
    map_from_entries(transform(map_entries(headers),
      e => struct(concat(lit(prefix), upper(e.getField("key"))).as("key"),
                  e.getField("value").as("value"))))

  /** Schema-drift TIMELINE over a raw envelope log: for every
    * (destination, after-image column), the first log position that
    * carried it and how many events did — the queryable face of what
    * [[graft.services.SchemaHistory]] records imperatively (the
    * reference's schema-history store + schema-change topic concern,
    * DebeziumProperties.java schema.history.internal.*). Reads the
    * SCHEMALESS JSON lines (drift is exactly what a declared schema
    * cannot see): per event, `json_object_keys` of the after image —
    * deletes carry no after image and contribute nothing. One scan,
    * one (destination, column) aggregate; at 100 TB the group count
    * is tables × columns, so the shuffle is trivially small. */
  def columnTimeline(rawJsonLines: DataFrame): DataFrame =
    rawJsonLines.select(
        get_json_object(col("value"), "$.destination").as("destination"),
        get_json_object(col("value"), "$.value.source.lsn").cast("long").as("lsn"),
        json_object_keys(get_json_object(col("value"), "$.value.after")).as("cols"))
      .filter(col("cols").isNotNull)
      .select(col("destination"), col("lsn"), explode(col("cols")).as("col_name"))
      .groupBy(col("destination"), col("col_name"))
      .agg(min(col("lsn")).as("first_lsn"), count(lit(1)).as("n_events"))
}
