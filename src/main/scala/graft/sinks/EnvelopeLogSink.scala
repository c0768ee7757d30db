package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Envelope-log file sink: serializes change records back to the
  * JSON-lines envelope layout that `EnvelopeLogSource` and the
  * `graft-cdc` WAL reader consume — pipelines become CHAINABLE
  * (capture → shape → log → replay elsewhere), and a directory of
  * epoch-stamped segments is a durable, replayable export of any
  * stream. One dir per epoch keeps replays idempotent (an epoch
  * overwrite is a byte-identical rewrite of the same rows).
  */
final class EnvelopeLogSink(baseDir: String) extends SinkConnector {
  override def name: String = "envelope-log"
  override def tombstoneSupport: Boolean = true

  override def validate(): Unit =
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(baseDir))

  override def write(batch: DataFrame, epochId: Long): Unit =
    batch.select(to_json(struct(
        col("destination"), col("key"), col("value"), col("headers"))).as("value"))
      .write.mode(SaveMode.Overwrite)
      .text(s"$baseDir/epoch=$epochId")
}
