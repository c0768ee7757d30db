package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the interleave: stride placement, unequal source sizes, and
  * the run audit on clumped vs interleaved orderings. */
class InterleaveSpec extends SparkSpec {
  import spark.implicits._

  test("positions stride by source count; unequal sources stay spread") {
    val docs = Seq((1L, 0), (2L, 0), (3L, 0), (10L, 1)).toDF("id", "si")
    val out = Sampling.interleaveBySource(docs, col("id"), col("si"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 2L -> 2L, 3L -> 4L, 10L -> 1L))
  }

  test("run audit: clumped reads block lengths, interleave reads 1") {
    val docs = (1L to 6L).map(i => (i, ((i - 1) / 3).toInt)).toDF("id", "si")
    val inter = Sampling.interleaveBySource(docs, col("id"), col("si"), 2)
      .join(docs.withColumnRenamed("id", "doc_id"), "doc_id")
    val interStats = Sampling.sourceRunStats(inter, col("position"), col("si"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(interStats == Map(0 -> 1L, 1 -> 1L))
    val clump = docs.withColumn("position", col("id"))
    val clumpStats = Sampling.sourceRunStats(clump, col("position"), col("si"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(clumpStats == Map(0 -> 3L, 1 -> 3L))
  }
}
