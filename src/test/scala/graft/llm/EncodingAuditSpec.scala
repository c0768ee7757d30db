package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the mojibake audit's three damage signatures and the
  * clean path: U+FFFD, C1 controls, and double-encoded UTF-8. */
class EncodingAuditSpec extends SparkSpec {
  import spark.implicits._

  private def audit(rows: Seq[(String, String)]) =
    TextAnalysis.encodingAudit(rows.toDF("source", "t"), col("source"), col("t"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap

  test("each signature counts separately; clean text stays clean") {
    val out = audit(Seq(
      "a" -> "caf\uFFFD and more caf\uFFFD",        // 2 replacement chars
      "a" -> "line one\u0085line two\u0088x",       // 2 C1 controls
      "a" -> "caf\u00C3\u00A9 na\u00C3\u00AFve",    // 2 double-encode pairs
      "b" -> "perfectly clean ascii text"))
    // (n_docs, damaged, repl, c1, dbl)
    assert(out("a") == (3L, 3L, 2L, 2L, 2L))
    assert(out("b") == (1L, 0L, 0L, 0L, 0L))
  }

  test("genuine Latin-1-block text is NOT flagged as double-encode") {
    // é alone (U+00E9) or Ã at end-of-string: no continuation pair
    val out = audit(Seq("s" -> "café résumé ends with Ã"))
    assert(out("s") == (1L, 0L, 0L, 0L, 0L))
  }
}
