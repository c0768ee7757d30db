package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins language-run segmentation: consecutiveness, the minRun
  * floor, interleaving, and positions. */
class LanguageRunsSpec extends SparkSpec {
  import spark.implicits._

  private def runs(text: String, minRun: Int = 3) =
    TextAnalysis.languageRuns(Seq((1L, text)).toDF("id", "t"),
        col("id"), col("t"), minRun)
      .orderBy("start_pos").collect()
      .map(r => (r.getString(1), r.getInt(2), r.getLong(3), r.getInt(4))).toSeq

  test("contiguous marker runs segment with positions; short runs drop") {
    // tokens:    1   2   3   4    5  6  7   8    9
    val out = runs("der und die filler le et les filler the")
    assert(out == Seq(("de", 1, 3L, 1), ("fr", 5, 3L, 2)))
  }

  test("a non-marker token breaks consecutiveness") {
    // german markers at positions 1,2 | 4,5,6: only the second
    // island reaches minRun=3
    assert(runs("der und x die der und") == Seq(("de", 4, 3L, 1)))
  }

  test("unbroken six-marker run survives an embedded same-language marker") {
    val out = runs("le et les le et les")
    assert(out == Seq(("fr", 1, 6L, 1)))
  }
}
