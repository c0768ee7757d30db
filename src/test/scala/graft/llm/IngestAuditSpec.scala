package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the embedding ingestion audit: zero detection, exact-dup
  * census on the quantized grid, and the clean path. */
class IngestAuditSpec extends SparkSpec {
  import spark.implicits._

  test("zeros and duplicate vectors are counted; near-misses are not") {
    val rows = Seq(
      ("a", Seq(0L, 0L, 0L)),        // zero
      ("a", Seq(1L, 2L, 3L)),        // dup pair member
      ("a", Seq(1L, 2L, 3L)),        // dup pair member
      ("a", Seq(1L, 2L, 4L)),        // near-miss: NOT a dup
      ("b", Seq(5L, -5L, 5L))).toDF("label", "qv")
    val out = Similarity.ingestionAudit(rows, col("label"), col("qv"), d = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out("a") == (4L, 1L, 2L, (0L + 6 + 6 + 7) / (4 * 3)))
    assert(out("b") == (1L, 0L, 0L, 5L)) // L1 = 15 over 3 dims
  }
}
