package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Transaction metadata — the upstream engine's
  * `provide.transaction.metadata` surface the reference forwards via
  * config pass-through (DebeziumServerConfigSourceFactory.java:127-135):
  * data events gain a `transaction` block
  * `{id, total_order, data_collection_order}`, and a dedicated
  * `<topic.prefix>.transaction` stream carries BEGIN/END boundary
  * events (END with the per-collection event counts).
  *
  * Spark-first shapes:
  *
  *  - [[enrich]] is two stacked `row_number` windows. The tx-id-only
  *    window runs FIRST (one hash exchange on tx id); the
  *    (tx id, destination) window stacks ABOVE it exchange-free,
  *    because clustering by tx id already co-locates every
  *    (tx id, destination) pair — at 100 TB the operator costs ONE
  *    shuffle of the event stream, guarded by PlanSpec.
  *  - [[boundaries]] is a two-level aggregation (map-side partial on
  *    (tx id, destination), then per-tx rollup) — the BEGIN/END
  *    stream is tiny (2 rows per transaction) and never carries row
  *    payloads.
  */
object TransactionMetadata {

  /** Add the `transaction` struct to each event. `order` must be a
    * total order within a transaction (the envelope's source.lsn /
    * (ts, event id)). */
  def enrich(df: DataFrame, txId: Column, destination: Column,
             order: Seq[Column]): DataFrame =
    df
      // tx-id-only window FIRST: it plants the single exchange
      .withColumn("__total_order",
        row_number().over(Window.partitionBy(txId).orderBy(order: _*))
          .cast("long"))
      .withColumn("__dc_order",
        row_number().over(Window.partitionBy(txId, destination).orderBy(order: _*))
          .cast("long"))
      .withColumn("transaction", struct(
        txId.cast("string").as("id"),
        col("__total_order").as("total_order"),
        col("__dc_order").as("data_collection_order")))
      .drop("__total_order", "__dc_order")

  /** The BEGIN/END boundary stream for the
    * `<topicPrefix>.transaction` destination: one BEGIN and one END
    * row per transaction; END carries the total event count and the
    * per-collection counts rendered `dc1:n1,dc2:n2` (collection-name
    * ordered — the deterministic form of the upstream END event's
    * `data_collections` array). */
  def boundaries(df: DataFrame, txId: Column, destination: Column,
                 topicPrefix: String): DataFrame = {
    val perDc = df.groupBy(txId.as("tx_id"), destination.as("dc"))
      .agg(count(lit(1)).as("n"))
    val perTx = perDc.groupBy(col("tx_id"))
      .agg(sum(col("n")).as("event_count"),
           concat_ws(",",
             transform(sort_array(collect_list(struct(col("dc"), col("n")))),
               x => concat(x("dc"), lit(":"), x("n"))))
             .as("data_collections"))
    val begin = perTx.select(
      col("tx_id"),
      lit("BEGIN").as("status"),
      lit(null).cast("long").as("event_count"),
      lit(null).cast("string").as("data_collections"))
    val end = perTx.select(
      col("tx_id"),
      lit("END").as("status"),
      col("event_count"),
      col("data_collections"))
    begin.unionAll(end)
      .withColumn("destination", lit(s"$topicPrefix.transaction"))
  }
}
