package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the blocklist gate's obfuscation folds: leet substitution,
  * zero-width insertion, case folding, tokenization boundaries, and
  * the no-hit path. */
class BlocklistSpec extends SparkSpec {
  import spark.implicits._

  private val bl = Seq("model", "toxic", "gpu")

  private def gate(rows: Seq[(String, String)]) =
    TextAnalysis.blocklistGate(rows.toDF("source", "t"),
        col("source"), col("t"), bl)
      .orderBy("source").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("leet and zero-width obfuscations fold onto the blocklist") {
    val out = gate(Seq(
      "a" -> "a plain MODEL mention",          // case fold
      "a" -> "runs m0d3l and 7oxic stuff",     // leet fold, 2 hits
      "a" -> "gp\u200bu and g\u200cp\ufeffu",  // zero-width strip, 2 hits
      "b" -> "nothing blocked here"))
    assert(out("a") == (3L, 3L, 5L, 3L)) // n_docs, flagged, hits, n_terms
    assert(out("b") == (1L, 0L, 0L, 0L))
  }

  test("substrings do not match: token boundaries are real") {
    val out = gate(Seq("s" -> "modeling gpus remodel untoxic"))
    assert(out("s") == (1L, 0L, 0L, 0L))
  }

  test("hits count duplicates; matched terms dedup") {
    val out = gate(Seq("s" -> "model model m0del MODEL"))
    assert(out("s") == (1L, 1L, 4L, 1L))
  }
}
