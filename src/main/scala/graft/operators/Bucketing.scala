package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-location for repeated large joins — the 100 TB
  * path for "this join runs every batch on the same key": write both
  * sides bucketed (and sorted) by the join key once, and every
  * subsequent join on that key is SHUFFLE-FREE (sort-merge join over
  * pre-bucketed files; verified in PlanSpec).
  *
  * The reference has no analog (single JVM, no shuffles); this is the
  * Spark-native answer to its per-key ordering invariant at scale:
  * hash(key) → bucket is the same routing the EventHubs/RocketMQ sinks
  * compute per record (Portable.partitionFor), made durable in the
  * table layout.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted table (external at `path` when
    * given, else managed under spark.sql.warehouse.dir). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    path: Option[String] = None): Unit = {
    var w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
    path.foreach(p => w = w.option("path", p))
    w.saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key — planner emits
    * no Exchange on either side when bucket counts match. */
  def cooperativeJoin(spark: SparkSession, left: String, right: String,
                      key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
