package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-prefiltered incremental dedup: must be value-identical to the
  * plain anti-join form (no false negatives; false positives re-checked),
  * and the probe must be Spark's native codegen'd bloom expression, not
  * a UDF. */
class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val seen = (1L to 200L).map(i => (i, s"seen doc number $i")).toDF("doc_id", "text")
    // batch: 50 replays of seen content, 100 fresh docs, plus
    // within-batch duplicate pairs of 10 fresh docs
    val batch = (1L to 50L).map(i => (1000L + i, s"seen doc number $i"))
      .++((1L to 100L).map(i => (2000L + i, s"fresh doc number $i")))
      .++((1L to 10L).map(i => (3000L + i, s"fresh doc number $i")))
      .toDF("doc_id", "text")
    (seen, batch)
  }

  test("bloom-prefiltered dedup equals the plain incremental form") {
    val (seen, batch) = fixture
    val plain = Dedup.incrementalExact(batch, col("text"), col("doc_id"),
        seen, col("text")).orderBy("keep_id").collect().toSeq
    val bloomed = Dedup.incrementalExactBloom(batch, col("text"), col("doc_id"),
        seen, col("text"), expectedItems = 200L, fpp = 0.01)
      .orderBy("keep_id").collect().toSeq
    assert(bloomed == plain)
    // replays dropped, 100 distinct fresh contents kept, dup pairs collapsed
    assert(plain.size == 100)
    assert(plain.count(_.getLong(2) == 2L) == 10)
  }

  test("a saturated bloom (forced false positives) still yields exact results") {
    val (seen, batch) = fixture
    // 8-item sizing for a 200-item index: nearly every probe reads
    // "maybe", so the exact verify path carries the correctness
    val bloomed = Dedup.incrementalExactBloom(batch, col("text"), col("doc_id"),
        seen, col("text"), expectedItems = 8L, fpp = 0.5)
      .orderBy("keep_id").collect().toSeq
    val plain = Dedup.incrementalExact(batch, col("text"), col("doc_id"),
        seen, col("text")).orderBy("keep_id").collect().toSeq
    assert(bloomed == plain)
  }

  test("probe is the native bloom expression in-plan (no UDF boundary)") {
    val (seen, batch) = fixture
    val df = Dedup.incrementalExactBloom(batch, col("text"), col("doc_id"),
      seen, col("text"), expectedItems = 200L)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), s"expected native bloom probe in:\n$plan")
    assert(plan.contains("bloom_filter_agg"), s"expected distributed bloom build in:\n$plan")
  }
}
