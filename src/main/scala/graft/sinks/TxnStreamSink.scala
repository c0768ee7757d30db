package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Transactional stream sink — the Pravega pattern
  * (PravegaChangeConsumer.java:120-165): per batch, ONE transaction per
  * stream; write every event into its stream's open transaction, then
  * commit them all; any failure aborts every open transaction so the
  * batch is all-or-nothing per stream.
  *
  * In Spark the unit of delivery is the partition: each partition opens
  * one transaction per stream it encounters, writes in order, and
  * commits at partition end (abort on error → Spark retries the task →
  * the replayed writes land in a NEW transaction; committed ones are
  * final, so route one stream to one partition upstream —
  * Portable.partitionFor — for strict stream-level atomicity).
  */
object TxnStreamSink {
  trait Txn {
    def write(event: String): Unit
    def commit(): Unit
    def abort(): Unit
  }
  trait TxnClient extends AutoCloseable {
    def begin(stream: String): Txn
  }
}

final class TxnStreamSink(clientFactory: () => TxnStreamSink.TxnClient)
    extends SinkConnector {
  import TxnStreamSink._

  override def name: String = "txn-stream"
  override def tombstoneSupport: Boolean = false

  override def write(batch: DataFrame, epochId: Long): Unit = {
    val cf = clientFactory
    batch.select(col("destination"), to_json(col("value")).as("v"))
      .foreachPartition { (rows: Iterator[Row]) =>
        if (rows.hasNext) {
          val client = cf()
          val open = scala.collection.mutable.LinkedHashMap[String, Txn]()
          try {
            try {
              rows.foreach { r =>
                val txn = open.getOrElseUpdate(r.getString(0), client.begin(r.getString(0)))
                txn.write(r.getString(1))
              }
              open.values.foreach(_.commit()) // write all, then commit all
            } catch {
              case e: Throwable =>
                open.values.foreach(t => try t.abort() catch { case _: Throwable => () })
                throw e
            }
          } finally client.close()
        }
      }
  }
}
