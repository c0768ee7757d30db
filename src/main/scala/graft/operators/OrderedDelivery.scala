package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key ordered delivery — SURVEY.md §7.5 known-hard #1: the
  * reference preserves per-key total order end-to-end because one
  * thread drains one queue; Spark shuffles freely, so order must be
  * re-established structurally:
  *
  *  1. hash-partition on the RECORD KEY (every change for a key lands
  *     in one partition — the EventHubs/RocketMQ routing,
  *     Portable.partitionFor, as a physical repartition);
  *  2. sort WITHIN partitions by the source position (LSN, with the
  *     envelope ts_ms fallback), never globally — no global sort
  *     barrier at 100 TB;
  *  3. sinks that iterate partitions (queue/kafka/http/txn) then see
  *     every key's changes in log order.
  *
  * Cross-key order is NOT preserved (keys interleave arbitrarily) —
  * the same relaxation every partitioned queue in the reference makes.
  */
object OrderedDelivery {

  def lsnCol: Column = coalesce(col("value.source.lsn"), col("value.ts_ms"), lit(0L))

  /** Route by key and order each partition by log position. */
  def keyOrdered(records: DataFrame, numPartitions: Int): DataFrame =
    records
      .repartition(numPartitions, col("key"))
      .sortWithinPartitions(col("key"), lsnCol)
}
