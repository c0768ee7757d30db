package graft.llm

import graft.SparkSpec
import graft.functions.Portable
import org.apache.spark.sql.functions._

/** Pins the winnowing algorithm's contract (Schleimer et al. 2003):
  * selection matches a reference JVM implementation exactly (incl. the
  * rightmost-min tie rule), the w+k-1 detection guarantee holds, and
  * density lands near the theoretical 2/(w+1). */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation: literal windows-of-w scan. */
  private def winnowRef(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    if (text.length < k) return Set.empty
    val hs = (1 to text.length - k + 1)
      .map(p => p -> Portable.hash64Jvm(text.substring(p - 1, p - 1 + k))).toArray
    val m = hs.length
    val starts = 1 to math.max(m - w + 1, 1)
    starts.flatMap { i =>
      val win = hs.slice(i - 1, math.min(i - 1 + w, m))
      val mn = win.map(_._2).min
      win.filter(_._2 == mn).lastOption.map { case (p, h) => (p, h) } // rightmost
    }.toSet
  }

  test("fingerprints match the reference scan, rightmost tie included") {
    val docs = Seq(
      (1L, "abcabcabcabcabcabcabcabc"),           // periodic: forces hash ties in-window
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "short"),                               // shorter than k -> no fingerprints
      (4L, "exactlyeightch"),                      // fewer grams than w -> one window
      (5L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz")     // all grams identical
    ).toDF("doc_id", "text")
    val k = 8; val w = 4
    val got = Winnowing.fingerprints(docs, col("doc_id"), col("text"), k, w)
      .collect().map(r => (r.getLong(0), (r.getLong(1).toInt, r.getLong(2)))).toSet
    val want = Seq(
      (1L, "abcabcabcabcabcabcabcabc"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "short"),
      (4L, "exactlyeightch"),
      (5L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"))
      .flatMap { case (id, t) => winnowRef(t, k, w).map(id -> _) }.toSet
    assert(got === want)
  }

  test("guarantee: a shared substring of length >= w+k-1 shares a fingerprint") {
    val shared = "GUARANTEED-SHARED-RUN-OF-CHARS" // 30 chars >= w+k-1 = 27
    val docs = Seq(
      (1L, s"left padding text before ${shared} and unrelated tail one"),
      (2L, s"completely different prologue ${shared} other epilogue text")
    ).toDF("doc_id", "text")
    val fps = Winnowing.fingerprints(docs, col("doc_id"), col("text"), k = 16, w = 12)
    val pairs = Winnowing.overlapPairs(fps, minShared = 1).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "docs sharing a >= w+k-1 substring must share at least one fingerprint")
  }

  test("density is near 2/(w+1) on hash-random text") {
    // pseudo-random text: hash-derived chars, no structure
    val txt = (0 until 4000).map(i => ('a' + (Portable.hash64Jvm(s"d$i") % 26)).toChar).mkString
    val docs = Seq((1L, txt)).toDF("doc_id", "text")
    val w = 8
    val n = Winnowing.fingerprints(docs, col("doc_id"), col("text"), k = 16, w = w).count()
    val grams = txt.length - 15
    val density = n.toDouble / grams
    val expected = 2.0 / (w + 1)
    assert(density > expected * 0.7 && density < expected * 1.4,
      s"density $density should be near $expected")
  }
}
