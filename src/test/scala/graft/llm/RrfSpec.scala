package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins reciprocal-rank fusion: the integer contribution formula,
  * cross-system boost, tie-breaks, topK, and single-system input. */
class RrfSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, Long, Int)*) =
    rows.toDF("qid", "doc_id", "rank")

  test("a doc ranked in both systems outranks single-system leaders") {
    val a = df((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
    val b = df((1L, 99L, 1), (1L, 20L, 2), (1L, 40L, 3))
    val out = Retrieval.rrfFuse(Seq(a, b), kConst = 60, topK = 10)
      .orderBy("fused_rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 20: 2 systems at rank 2 -> 2 * (1e9 div 62) = 32258064
    assert(out.head == (20L, 2L, 2L * (1000000000L / 62L)))
    // rank-1 singles tie at 1e9 div 61; doc id breaks the tie
    assert(out(1)._1 == 10L && out(2)._1 == 99L)
    assert(out(1)._3 == 1000000000L / 61L)
  }

  test("topK truncates per query; queries stay independent") {
    val a = df((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3), (2L, 7L, 1))
    val out = Retrieval.rrfFuse(Seq(a), kConst = 60, topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 1L), (1L, 2L), (2L, 7L)))
  }
}
