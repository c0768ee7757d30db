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
}
