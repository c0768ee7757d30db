package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the generation-loop audit: period detection, the argmax
  * tie-break, clean-prose negatives, and the diversity leg. */
class DegeneracySpec extends SparkSpec {
  import spark.implicits._

  private def audit(rows: Seq[(String, String)], threshold: Int = 30) =
    TextAnalysis.degeneracyAudit(rows.toDF("source", "t"),
        col("source"), col("t"), maxPeriod = 4, threshold = threshold)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap

  test("pure loops flag at their period; varied prose does not flag") {
    val out = audit(Seq(
      "p1" -> ("buy " * 50).trim,                    // period-1 loop
      "p2" -> ("spam ham " * 40).trim,               // period-2 loop
      "ok" -> "every word here differs from all neighbours in this line of text"))
    val (n1, d1, dp1, lp1, _) = out("p1")
    assert(d1 == 1L && dp1 == 1L && lp1 > 90)
    val (_, d2, dp2, lp2, _) = out("p2")
    assert(d2 == 1L && dp2 == 0L && lp2 > 90) // flagged but NOT period 1
    val (_, dOk, _, lpOk, divOk) = out("ok")
    assert(dOk == 0L && lpOk < 30 && divOk == 100) // all bigrams distinct
  }

  test("a period-1 loop also matches period 2..4: argmax stays 1 (first max wins)") {
    val out = audit(Seq("s" -> ("go " * 30).trim))
    assert(out("s")._3 == 1L) // deg_p1
  }

  test("diversity collapses when the set repeats one doc") {
    val doc = "quite distinct words arranged once without repeats"
    val out = audit(Seq("s" -> doc, "s" -> doc, "s" -> doc, "s" -> doc))
    // 4 copies: each bigram appears 4x -> distinct2_pct = 25
    assert(out("s")._5 == 25L && out("s")._2 == 0L)
  }
}
