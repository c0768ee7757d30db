package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.model.Envelope

/** Materialize the *final state* of a keyed change stream — the batch
  * analog of what every upsert sink in the reference does record-by-record
  * (envelope op routing: FlussChangeConsumer.java:170-220,
  * MilvusChangeConsumer.java:133-151: CREATE/READ/UPDATE → upsert,
  * DELETE → delete).
  *
  * Scale notes: one hash shuffle on the key, then a per-partition sort —
  * `row_number` over (key, orderCols desc) keeps only the latest change
  * per key. At 100 TB this is the canonical "compact a CDC log" job:
  * AQE handles skewed keys; no driver-side state. For streaming, the same
  * semantics run under `flatMapGroupsWithState` (see graft.streaming).
  */
object ApplyChanges {

  /** Keep the newest record per key (by orderCols, e.g. source.lsn or
    * ts + a unique tiebreaker), then drop keys whose newest op is a
    * delete. Input columns are preserved minus the ordering helper. */
  def latestState(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column],
                  opCol: Column, deleteOp: String = Envelope.OpDelete): DataFrame = {
    val w = Window.partitionBy(keyCols: _*).orderBy(orderCols.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && opCol =!= deleteOp)
      .drop("__rn")
  }

  /** Materialize the FULL history of a keyed change stream as an
    * SCD-type-2 dimension table: one validity interval per non-delete
    * change, `valid_from` = the change's own event time, `valid_to` =
    * the NEXT change's event time for the key (any op — a delete
    * closes its predecessor's interval without producing a version),
    * `is_current` = no later change exists. [[latestState]] answers
    * "what is true now"; this answers "what was true when" — the
    * warehouse-dimension form every as-of join consumes.
    *
    * Same scale shape as latestState: ONE hash shuffle on the key and
    * one per-partition sort serve both the lead() and the version
    * numbering (two window functions over the identical
    * (key, orderCols) spec — Spark plans a single Window operator).
    * `tsCol` must be monotone in `orderCols` per key (event time of
    * the change); `valid_to` is NULL on the open interval. */
  def scdType2(df: DataFrame, keyCols: Seq[Column], orderCols: Seq[Column],
               tsCol: Column, opCol: Column,
               deleteOp: String = Envelope.OpDelete): DataFrame = {
    val w = Window.partitionBy(keyCols: _*).orderBy(orderCols.map(_.asc): _*)
    df.withColumn("valid_from", tsCol)
      .withColumn("valid_to", lead(tsCol, 1).over(w))
      // version numbers count ALL changes (a delete consumes a version
      // slot — re-created keys don't restart at 1), but only
      // non-delete changes emit a row
      .withColumn("ver", row_number().over(w))
      .filter(opCol =!= deleteOp)
      .withColumn("is_current", col("valid_to").isNull)
  }
}
