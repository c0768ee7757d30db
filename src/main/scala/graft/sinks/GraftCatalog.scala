package graft.sinks

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.nio.file.{Files, Paths}

/** Read-only DataSource V2 `TableCatalog` over a [[ParquetUpsertSink]]
  * root: the CDC-materialized live state becomes SQL-addressable —
  *
  *   spark.sql.catalog.cdc      = graft.sinks.GraftCatalog
  *   spark.sql.catalog.cdc.root = /data/tables
  *   SELECT * FROM cdc.testc_dbo_customers
  *
  * — the query-side face of the reference's jdbc/fluss sinks, whose
  * whole point is that downstream consumers query the delivered
  * state (FlussChangeConsumer.java:284-313 auto-creates the table it
  * delivers into; here the engine IS the query side too).
  *
  * Each `loadTable` re-reads the destination's manifest and plans a
  * stock parquet table over exactly the CURRENT live bucket dirs, so
  * a query sees one committed epoch — never a half-merged epoch
  * (the manifest swap is atomic) — and gets the full native reader:
  * pushed filters, column pruning, vectorization. Writes go through
  * the sink's MERGE path, never SQL — every mutation op throws. */
class GraftCatalog extends TableCatalog {
  private var catalogName: String = _
  private var root: java.nio.file.Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Paths.get(Option(options.get("root")).getOrElse(throw new IllegalArgumentException(
      s"catalog '$name' needs spark.sql.catalog.$name.root (the upsert-sink base dir)")))
  }

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)
    graft.Fs.children(root)
      .filter(p => Files.exists(p.resolve("_manifest")))
      .map(p => Identifier.of(Array.empty, p.getFileName.toString))
      .toArray
  }

  override def loadTable(ident: Identifier): Table = {
    if (ident.namespace.nonEmpty) throw new NoSuchTableException(ident)
    // accept the raw destination too — same sanitization the sink uses
    val dir = root.resolve(ParquetUpsertSink.sanitize(ident.name))
    val paths = if (Files.exists(dir.resolve("_manifest")))
      ParquetUpsertSink.livePaths(dir) else Seq.empty
    if (paths.isEmpty) throw new NoSuchTableException(ident)
    ParquetTable(ident.name, SparkSession.active, CaseInsensitiveStringMap.empty(),
      paths, None, classOf[ParquetFileFormat])
  }

  private def readOnly = new UnsupportedOperationException(
    s"catalog '$catalogName' is read-only: writes go through ParquetUpsertSink's MERGE path")
  override def createTable(ident: Identifier, schema: org.apache.spark.sql.types.StructType,
                           partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
                           properties: java.util.Map[String, String]): Table = throw readOnly
  override def alterTable(ident: Identifier, changes: TableChange*): Table = throw readOnly
  override def dropTable(ident: Identifier): Boolean = throw readOnly
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = throw readOnly
}
