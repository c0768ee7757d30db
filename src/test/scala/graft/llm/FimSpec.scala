package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the FIM transform: lossless reassembly, non-empty segments,
  * determinism, and the eligibility floor. */
class FimSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and keeps running far"),
    (2L, "short"),
    (3L, "another reasonably long document used to exercise the cut points"))

  test("PSM reassembles losslessly and every segment is non-empty") {
    val out = Sft.fimTransform(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toMap
    assert(!out.contains(2L)) // below minLen
    for ((id, (p, m, sfx, fim)) <- out) {
      val orig = docs.find(_._1 == id).get._2
      assert(p >= 1 && m >= 1 && sfx >= 0 && p + m + sfx == orig.length)
      val pre = fim.substring(5, fim.indexOf("<SUF>"))
      val suf = fim.substring(fim.indexOf("<SUF>") + 5, fim.indexOf("<MID>"))
      val mid = fim.substring(fim.indexOf("<MID>") + 5)
      assert(pre + mid + suf == orig, s"doc $id must reassemble")
    }
  }

  test("the transform is deterministic") {
    def run() = Sft.fimTransform(docs.toDF("doc_id", "text"),
      col("doc_id"), col("text")).collect().map(_.toSeq).toSeq
    assert(run() == run())
  }
}
