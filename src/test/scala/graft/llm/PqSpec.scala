package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product quantization: seed codebooks, subspace encode, ADC top-k. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  // 4-dim vectors, 2 subspaces of 2 dims, 2 codewords (vectors 1, 2)
  private def corpus =
    Seq((1L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
        (2L, Seq(1.0f, 1.0f, 1.0f, 1.0f)),
        (3L, Seq(0.1f, 0.1f, 0.9f, 0.9f)), // sub0 → code 0, sub1 → code 1
        (4L, Seq(0.9f, 0.9f, 0.1f, 0.1f))) // sub0 → code 1, sub1 → code 0
      .toDF("vec_id", "embedding")

  test("seed codebooks slice the k lowest-id vectors per subspace") {
    val cb = Pq.seedCodebooks(corpus, col("vec_id"), col("embedding"),
      dims = 4, m = 2, k = 2)
    assert(cb.sub == 2)
    assert(cb.books == Seq(
      Seq(Seq(0L, 0L), Seq(1000000L, 1000000L)),
      Seq(Seq(0L, 0L), Seq(1000000L, 1000000L))))
    intercept[IllegalArgumentException](
      Pq.seedCodebooks(corpus, col("vec_id"), col("embedding"), dims = 4, m = 3, k = 2))
  }

  test("encode assigns each subspace to its nearest codeword; malformed vectors null out") {
    val cb = Pq.seedCodebooks(corpus, col("vec_id"), col("embedding"),
      dims = 4, m = 2, k = 2)
    val bad = Seq((9L, Seq(0.5f))).toDF("vec_id", "embedding")
    val got = Pq.encode(corpus.unionAll(bad), col("embedding"), cb)
      .select(col("vec_id"), col("code_0"), col("code_1"))
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Int]),
        Option(r.get(2)).map(_.asInstanceOf[Int])))
    assert(got.toSeq == Seq(
      (1L, Some(0), Some(0)), (2L, Some(1), Some(1)),
      (3L, Some(0), Some(1)), (4L, Some(1), Some(0)),
      (9L, None, None)))
  }

  test("adcTopK ranks by the summed per-subspace lookup distances, ties to lowest id") {
    val cb = Pq.seedCodebooks(corpus, col("vec_id"), col("embedding"),
      dims = 4, m = 2, k = 2)
    val q = Pq.quantize(Seq(0.0f, 0.0f, 0.0f, 0.0f), 4) // = vector 1
    val got = Pq.adcTopK(
        Pq.encode(corpus.filter(col("vec_id") =!= 1L), col("embedding"), cb),
        col("vec_id"), q, cb, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // codes: v3 (0,1), v4 (1,0) → adist = 0 + 2·10¹² each; v2 (1,1) → 4·10¹²
    val e12 = 2L * 1000000L * 1000000L
    assert(got.toSeq == Seq((3L, e12), (4L, e12), (2L, 2 * e12)))
  }

  test("adcRerankTopK: full-corpus shortlist reproduces exact cosine top-k bit-for-bit") {
    val cb = Pq.seedCodebooks(corpus, col("vec_id"), col("embedding"),
      dims = 4, m = 2, k = 2)
    val query = Seq(0.9f, 0.8f, 0.2f, 0.1f)
    // drop the all-zero vector: its cosine is 0/0 = NaN (degenerate input)
    val live = corpus.filter(col("vec_id") =!= 1L)
    val enc = Pq.encode(live, col("embedding"), cb)
    val got = Pq.adcRerankTopK(enc, col("vec_id"), col("embedding"), query, cb,
        shortlist = 3, topK = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val qLit = array(query.map(lit(_)): _*)
    val want = live.select(col("vec_id"),
        Similarity.cosineExact(col("embedding"), qLit).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == want.toSeq)
    intercept[IllegalArgumentException](
      Pq.adcRerankTopK(enc, col("vec_id"), col("embedding"), query, cb,
        shortlist = 1, topK = 2))
  }

  test("adcRerankTopK: a zero-norm vector in the shortlist is dropped, never ranked first by NaN") {
    val cb = Pq.seedCodebooks(corpus, col("vec_id"), col("embedding"),
      dims = 4, m = 2, k = 2)
    // keep the all-zero v1 IN the corpus: its codes are valid (0,0) so it
    // survives the ADC stage; its cosine is NaN which Spark would sort FIRST
    val enc = Pq.encode(corpus, col("embedding"), cb)
    val got = Pq.adcRerankTopK(enc, col("vec_id"), col("embedding"),
        Seq(0.9f, 0.8f, 0.2f, 0.1f), cb, shortlist = 4, topK = 4)
      .collect().map(_.getLong(0))
    assert(!got.contains(1L), s"zero-norm vector ranked: ${got.mkString(",")}")
    assert(got.length == 3)
  }

  test("adcRerankTopK: a narrow shortlist bounds the candidate set (recall trade is stage 1 only)") {
    val cb = Pq.seedCodebooks(corpus, col("vec_id"), col("embedding"),
      dims = 4, m = 2, k = 2)
    // query = v2's direction: ADC distance 0 only for code (1,1) = v2
    val enc = Pq.encode(corpus.filter(col("vec_id") =!= 1L), col("embedding"), cb)
    val got = Pq.adcRerankTopK(enc, col("vec_id"), col("embedding"),
        Seq(1.0f, 1.0f, 1.0f, 1.0f), cb, shortlist = 1, topK = 1)
      .collect().map(_.getLong(0))
    assert(got.toSeq == Seq(2L))
  }
}
