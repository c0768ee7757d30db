package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.model.Envelope

/** Replayable CDC envelope log — the rebuild's canonical test source
  * (FIXTURES.md §3): one JSON object per line with
  * {destination, key, value(envelope), headers}.
  *
  * This models the reference's source side (embedded engine emitting
  * SourceRecords) as data-at-rest: a real deployment swaps in a Kafka
  * topic or a DSv2 WAL tailer producing the SAME record schema, so the
  * whole transform/sink stack is source-agnostic.
  *
  * Both paths produce per-stream (per-table) typed records; the
  * snapshot-then-stream phase machine of the reference collapses to
  * "batch DataFrame union'd ahead of the stream" (SURVEY.md §2.1).
  */
object EnvelopeLogSource {

  /** Batch read: whole log as one DataFrame of change records. */
  def read(spark: SparkSession, path: String,
           keySchema: StructType, rowSchema: StructType,
           tableIncludeList: Seq[String] = Nil): DataFrame = {
    val df = spark.read.schema(Envelope.recordSchema(keySchema, rowSchema)).json(path)
    applyIncludeList(df, tableIncludeList)
  }

  /** Streaming read of a directory of JSON-lines files — Structured
    * Streaming's file source gives replay + exactly-once bookkeeping
    * via the checkpoint, replacing the reference's offset store
    * (DebeziumServerConfigSourceFactory.java:101-104). */
  def readStream(spark: SparkSession, dir: String,
                 keySchema: StructType, rowSchema: StructType,
                 tableIncludeList: Seq[String] = Nil,
                 maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    var reader = spark.readStream.schema(Envelope.recordSchema(keySchema, rowSchema))
    maxFilesPerTrigger.foreach(n => reader = reader.option("maxFilesPerTrigger", n))
    applyIncludeList(reader.json(dir), tableIncludeList)
  }

  /** `table.include.list` semantics (DebeziumServerTest.java:70-79):
    * destination is `<prefix>.<schema>.<table>`; include entries are
    * `<schema>.<table>` suffixes. Applied at the source so it pushes
    * into the scan (partition/file pruning on real sources). */
  private def applyIncludeList(df: DataFrame, includes: Seq[String]): DataFrame =
    if (includes.isEmpty) df
    else {
      import org.apache.spark.sql.functions._
      val cond = includes.map(t => col("destination").endsWith("." + t))
        .reduce(_ || _) || col("destination").startsWith(Envelope.HeartbeatPrefix)
      df.filter(cond)
    }
}
