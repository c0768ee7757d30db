package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real BPE: merges.txt parsing, the merge loop's rank discipline,
  * code-point splitting, and the distributed (broadcast, map-only)
  * application. */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  private val mergesText =
    """#version: 0.2
      |t h
      |r e
      |s t
      |th e
      |re st""".stripMargin

  test("merges.txt parses in rank order; the loop merges best-rank-first, leftmost on re-selection") {
    val bpe = Tokenizer.fromMergesText(mergesText)
    assert(bpe.merges == IndexedSeq(("t","h"), ("r","e"), ("s","t"), ("th","e"), ("re","st")))
    // "therest": t h → th; r e → re; s t → st; th e → the; re st → rest
    // (rank order, not textual order); ids: the=256+3, rest=256+4
    assert(bpe.encodeWord("therest").toSeq == Seq(259, 260))
    // unknown chars pass through as code points
    assert(bpe.encodeWord("xy").toSeq == Seq('x'.toInt, 'y'.toInt))
    // leftmost occurrence among equal candidates: "thth" → th th
    assert(bpe.encodeWord("thth").toSeq == Seq(256, 256))
    // whole-text encode pre-tokenizes: letters runs / digit runs /
    // single punctuation, lowercased
    assert(bpe.encode("The REST!").toSeq == Seq(259, 260, '!'.toInt))
    // malformed line fails loudly
    intercept[IllegalArgumentException] { Tokenizer.fromMergesText("a b c") }
  }

  test("astral characters split by code point, not UTF-16 unit") {
    val bpe = Tokenizer.fromMergesText("#v\nt h")
    val clef = new String(Character.toChars(0x1D11E)) // 𝄞, outside the BMP
    assert(bpe.encode(s"th$clef").toSeq == Seq(256, 0x1D11E))
  }

  test("fixture merge table satisfies the trained-table rank property (single-step == batch loop)") {
    val merges = graft.QueriesLlm.bpeMergesFixture
    val producedAt = merges.iterator.zipWithIndex
      .map { case ((x, y), i) => (x + y) -> i }.toMap
    merges.zipWithIndex.foreach { case ((x, y), r) =>
      for (part <- Seq(x, y) if part.length > 1)
        assert(producedAt.getOrElse(part, Int.MaxValue) < r,
          s"merge $r ($x,$y): component '$part' not produced by an earlier merge")
    }
    // products are unique (an id collision would alias two tokens)
    assert(producedAt.size == merges.size)
  }

  test("distributed tokenization is map-only: no shuffle, broadcast table") {
    val bpe = Tokenizer.fromMergesText(mergesText)
    val df = Seq((1L, "the rest"), (2L, "th th"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"), Tokenizer.tokenIds(spark, bpe)(col("text")).as("ids"))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "tokenization must not shuffle")
    val rows = out.orderBy("doc_id").collect()
    assert(rows(0).getSeq[Int](1) == Seq(259, 260))
    assert(rows(1).getSeq[Int](1) == Seq(256, 256))
    assert(rows(2).getSeq[Int](1).isEmpty) // null text → no tokens
  }

  test("training iteration: empty table counts code-point pairs; learned merge changes the stats") {
    import spark.implicits._
    // corpus where 'a b' dominates: "abab abc" → words abab(×2), abc
    val df = Seq("abab abab abc").toDF("text")
    val p1 = Tokenizer.symbolPairStats(spark, df, col("text"),
        Tokenizer.Bpe(IndexedSeq.empty))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // abab (f=2): pairs a-b ×2, b-a ×1 → 4 + 2; abc (f=1): a-b, b-c
    assert(p1 == Map("a b" -> 5L, "b a" -> 2L, "b c" -> 1L))
    val p2 = Tokenizer.symbolPairStats(spark, df, col("text"),
        Tokenizer.Bpe(IndexedSeq(("a", "b"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // abab → [ab, ab]; abc → [ab, c]
    assert(p2 == Map("ab ab" -> 2L, "ab c" -> 1L))
    // symbol view matches the id path's segmentation
    assert(Tokenizer.Bpe(IndexedSeq(("a", "b"))).encodeWordSymbols("abab")
      == Vector("ab", "ab"))
  }

  test("tokenGramHashes equals xxhash64 over tokenGramStrings (round-21 llm157 floor)") {
    val bpe = Tokenizer.fromMergesText(mergesText)
    val clef = new String(Character.toChars(0x1D11E))
    val df = Seq(
      (1L, "the rest of the rest and then the rest again"),
      (2L, "th"),                      // fewer tokens than n → one whole-sequence gram
      (3L, ""),                        // empty → no grams
      (4L, null.asInstanceOf[String]), // null → no grams
      (5L, s"café $clef 日本 the rest"), // multi-byte + astral code points
      (6L, "a"))                       // single 1-char token
      .toDF("doc_id", "text")
    for (n <- Seq(2, 8)) {
      val got = df.select(col("doc_id"),
          Tokenizer.tokenGramHashes(spark, bpe, n)(col("text")).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      val want = df.select(col("doc_id"),
          transform(Tokenizer.tokenGramStrings(spark, bpe, n)(col("text")),
            g => xxhash64(g)).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
      assert(got == want, s"n=$n")
    }
  }
}
