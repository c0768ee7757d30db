package graft.llm

import graft.SparkSpec
import graft.functions.Portable
import org.apache.spark.sql.functions._

/** Pins content-defined chunking's contract: boundary positions match
  * a literal reference scan, an offset-shifted shared passage chunks
  * identically in both carriers (the property fixed-size blocking
  * lacks), and short/degenerate docs chunk whole. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private val W = 8; private val M = 47

  /** Literal reference: chunk hash list for one text. */
  private def chunksRef(text: String): Seq[(Long, Long)] = {
    if (text.isEmpty) return Seq.empty
    val cuts = (1 to text.length - W + 1)
      .filter(p => Portable.hash64Jvm(text.substring(p - 1, p - 1 + W)) % M == 0)
      .map(_ + W - 1)
    val bounds = (0 +: cuts :+ text.length).distinct
    bounds.sliding(2).map { case Seq(s, e) =>
      (Portable.hash64Jvm(text.substring(s, e)), (e - s).toLong)
    }.toSeq
  }

  private def run(docs: Seq[(Long, String)]) =
    Chunking.chunkHashes(docs.toDF("doc_id", "text").withColumn("source", lit("s")),
        col("doc_id"), col("text"), col("source"), W, M)
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap

  test("chunk hashes match the literal reference scan") {
    val texts = Seq(
      1L -> ("the quick brown fox jumps over the lazy dog " * 8),
      2L -> "tiny",                       // shorter than the window: one chunk
      3L -> "exactly8",                   // exactly one window
      4L -> (1 to 400).map(i => ('a' + (Portable.hash64Jvm(s"c$i") % 26)).toChar).mkString)
    val got = run(texts)
    texts.foreach { case (id, t) =>
      assert(got(id) === chunksRef(t).sorted, s"doc $id chunk set diverged")
    }
  }

  test("JVM scan equals the composed column form, incl. multi-byte code points") {
    // Spark substr/length count CODE POINTS — the byte-sliced JVM scan
    // must agree on 2/3/4-byte chars, where String.substring (UTF-16
    // units) would NOT be a valid reference
    val docs = Seq(
      1L -> ("the quick brown fox jumps over the lazy dog " * 6),
      2L -> "héllo wörld with àccénts répéated many many times héllo wörld",
      3L -> ("emoji 😀 inside 🌀 the text " * 5),
      4L -> ("日本語のテキストとasciiの混在したやや長い行です" * 3),
      5L -> "tiny")
      .toDF("doc_id", "text").withColumn("source", lit("s"))
    def collectChunks(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
    val got = collectChunks(Chunking.chunkHashes(docs,
      col("doc_id"), col("text"), col("source"), W, M))
    val want = collectChunks(Chunking.chunkHashesComposed(docs,
      col("doc_id"), col("text"), col("source"), W, M))
    assert(got === want)
  }

  test("content locality: an offset-shifted shared passage chunks identically") {
    val passage = (1 to 300).map(i => ('a' + (Portable.hash64Jvm(s"p$i") % 26)).toChar).mkString
    val a = s"PREFIX-OF-DOC-A $passage"
    val b = s"a completely different and much longer prologue for document b: $passage"
    val Seq(ca, cb) = Seq(a, b).map(t => chunksRef(t).map(_._1))
    // after the first in-passage boundary, every interior chunk is shared
    val shared = ca.toSet.intersect(cb.toSet)
    assert(shared.size >= 3,
      s"shifted shared passage must produce shared chunks (got ${shared.size})")
    // and the operator agrees with the reference on both docs
    val got = run(Seq(1L -> a, 2L -> b))
    assert(got(1L) === chunksRef(a).sorted && got(2L) === chunksRef(b).sorted)
  }

  test("per-source stats fold occurrence, distinct, and cross-doc grains") {
    val docs = Seq((1L, "shared-chunk-body-one two three", "sA"),
                   (2L, "shared-chunk-body-one two three", "sA"),
                   (3L, "entirely unrelated content here", "sB"))
      .toDF("doc_id", "text", "source")
    val out = Chunking.chunkDedupStats(docs, col("doc_id"), col("text"),
        col("source"), W, M).orderBy("source").collect()
    val sA = out(0)
    assert(sA.getAs[String]("source") == "sA")
    // docs 1 and 2 are identical: every sA chunk occurrence is cross-doc dup
    assert(sA.getAs[Long]("dup_chunks") == sA.getAs[Long]("n_chunks"))
    assert(sA.getAs[Long]("dup_pct") == 100L)
    val sB = out(1)
    assert(sB.getAs[Long]("dup_chunks") == 0L && sB.getAs[Long]("dup_pct") == 0L)
  }
}
