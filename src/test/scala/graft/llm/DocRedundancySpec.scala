package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins doc-grain internal redundancy: a pasted block flags its doc,
  * offset shift does not defeat it, and unique text stays clean. */
class DocRedundancySpec extends SparkSpec {
  import spark.implicits._

  private val para =
    "the quick brown fox jumps over the lazy dog while the cat watches from a sunny windowsill nearby today"

  private def audit(rows: Seq[(Long, String, String)]) =
    Chunking.docRedundancy(rows.toDF("id", "t", "src"),
        col("id"), col("t"), col("src"), win = 8, modulus = 11, minDupPct = 15)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap

  test("a block pasted twice flags; a shifted paste still flags; unique text does not") {
    val out = audit(Seq(
      (1L, s"intro $para and then $para closing words", "dup"),
      (2L, s"$para totally different trailing content here that repeats nothing", "clean")))
    val (fDup, pDup) = out("dup")
    assert(fDup == 1L && pDup >= 15L, s"pasted doc must flag, got pct=$pDup")
    val (fClean, pClean) = out("clean")
    assert(fClean == 0L, s"unique doc must not flag, got pct=$pClean")
  }
}
