package graft.streaming

import graft.SparkSpec

/** Pins the CDC→training-data capstone's batch-split invariance: the
  * curated output of cdc39's one streaming pipeline (envelope → ENRS →
  * quality/dedup gates as tombstones → pack → apply-changes) must be
  * IDENTICAL whether the WAL drains in one micro-batch or many. The
  * gates are stateless and the state fold is LSN-ordered, so batch
  * boundaries cannot change the final per-doc rows — this spec is the
  * executable form of that claim. */
class StreamingCapstoneSpec extends SparkSpec {

  test("capstone output is invariant under micro-batch split") {
    val dir = sfSmoke
    val maxLsn = graft.Tables.documents(spark, dir)
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.col("doc_id") * 3 + 3)).head().getLong(0)
    def rows(lsnsPerTrigger: Long) =
      graft.QueriesCdc.cdc39Pipeline(spark, dir, lsnsPerTrigger)
        .orderBy("doc_id").collect().map(_.toSeq.toList).toList
    try {
      val oneBatch = rows(maxLsn + 1)          // whole WAL in a single trigger
      val manyBatches = rows(math.max(maxLsn / 7, 1L)) // ≥7 micro-batches
      assert(oneBatch.nonEmpty)
      assert(oneBatch === manyBatches)
    } finally graft.QueriesCdc.cdc39Reap()
  }
}
