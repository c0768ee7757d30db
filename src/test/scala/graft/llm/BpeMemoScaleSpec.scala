package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Scale measurement for the BPE memo under a realistic ~50k-merge
  * vocabulary and a 100-TB-shaped word stream: a Zipf HEAD (a few
  * thousand words carrying most of the mass) plus an unbounded cold
  * tail of distinct words that overflows any fixed cache cap
  * continuously. The earlier clear-on-overflow memo wiped the head
  * with the tail on every overflow; the two-generation memo
  * re-promotes head words across rotations, so the hit path keeps
  * dominating while memory stays bounded. Measured numbers are
  * recorded in SCALE.md. */
class BpeMemoScaleSpec extends AnyFunSuite {

  /** ~50k merges, GPT-2-shaped: all letter pairs first (the ranks BPE
    * training learns earliest), then products chain-extended by one
    * letter — every rank references a token formable at a lower rank,
    * matching a genuinely trained table's invariant. */
  private def bigMergeTable(n: Int): Tokenizer.Bpe = {
    val letters = ('a' to 'z').map(_.toString)
    val merges = IndexedSeq.newBuilder[(String, String)]
    for (x <- letters; y <- letters) merges += ((x, y))
    var products = (for (x <- letters; y <- letters) yield x + y).toIndexedSeq
    var rank = 26 * 26
    while (rank < n) {
      val next = IndexedSeq.newBuilder[String]
      var i = 0
      while (i < products.length && rank < n) {
        val p = products(i)
        val l = letters((rank * 7) % 26)
        merges += ((p, l)); next += (p + l)
        rank += 1; i += 1
      }
      products = next.result()
    }
    Tokenizer.Bpe(merges.result())
  }

  /** Deterministic LCG (no global RNG in tests that assert numbers). */
  private final class Lcg(seed0: Long) {
    private var s = seed0
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s >>> 11 }
    def nextInt(bound: Int): Int = (next() % bound).toInt
  }

  private def headWord(i: Int): String = {
    // pseudo-words over letters, 4-9 chars, deterministic per index
    val r = new Lcg(i * 2654435761L + 17)
    val len = 4 + r.nextInt(6)
    val sb = new StringBuilder
    (0 until len).foreach(_ => sb += ('a' + r.nextInt(26)).toChar)
    sb.toString
  }

  test("50k-merge vocab: the memo hit path dominates a Zipf head + unbounded-tail stream, memory stays bounded") {
    val bpe = bigMergeTable(50000)
    val headVocab = (0 until 2000).map(headWord).distinct.toArray
    val draws = 500000
    val tailShare = 0.3 // 30% of occurrences are first-seen words (the cold tail)
    val r = new Lcg(42)
    var tailIdx = 0
    val t0 = System.nanoTime()
    var tokens = 0L
    (0 until draws).foreach { _ =>
      val w =
        if (r.next() % 1000 < (tailShare * 1000).toInt) { tailIdx += 1; s"tail${tailIdx}word" }
        else {
          // skew within the head: quadratic ramp concentrates mass on
          // the first few hundred words, the Zipf shape
          val u = r.nextInt(headVocab.length * headVocab.length)
          headVocab(math.sqrt(u.toDouble).toInt.min(headVocab.length - 1))
        }
      tokens += bpe.encodeWord(w).length
    }
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    val (hits, misses) = bpe.memoStats
    val hitRate = hits.toDouble / (hits + misses)
    info(f"draws=$draws tail=$tailIdx hits=$hits misses=$misses hitRate=$hitRate%.3f " +
         f"resident=${bpe.memoSize} elapsed=${elapsedMs}ms tokens=$tokens")
    // ~30% of draws are unavoidable first-seen misses; everything the
    // head contributes must be served from the memo even though the
    // tail (~150k distinct) overflows the 64k-entry budget repeatedly
    assert(hitRate > 0.65, f"memo hit path no longer dominates: $hitRate%.3f")
    // the bound: two generations of ≤32k entries (+ in-flight slack)
    assert(bpe.memoSize <= (1 << 16) + 1024, s"memo exceeded its bound: ${bpe.memoSize}")
    // rotation happened (the tail DID overflow the cap — else this
    // spec isn't testing the regime it claims to)
    assert(tailIdx > (1 << 16), s"stream too small to overflow the cap: $tailIdx")
  }

  test("head words survive rotation: re-tokenizations of the hot head stay O(head), not O(rotations x head)") {
    val bpe = bigMergeTable(50000)
    val head = (0 until 1000).map(headWord).distinct.toArray
    // warm the head, then a tail flood big enough to rotate both
    // generations several times over, with the head touched at its
    // realistic Zipf cadence (every ~16th occurrence — far more often
    // than a 32k-insert rotation period), then a final head sweep
    head.foreach(w => bpe.encodeWord(w))
    val (_, missesAfterWarm) = bpe.memoStats
    (0 until (1 << 17)).foreach { i =>
      bpe.encodeWord(s"flood${i}word")
      if (i % 16 == 0) bpe.encodeWord(head((i / 16) % head.length))
    }
    head.foreach(w => bpe.encodeWord(w))
    val (_, missesEnd) = bpe.memoStats
    val headRemisses = missesEnd - missesAfterWarm - (1 << 17)
    info(s"head=${head.length} headRemisses=$headRemisses (clear-on-overflow would re-miss " +
         "the whole head after every wipe)")
    // the flood rotates the cache repeatedly, yet most of the head is
    // still served from the memo: re-promotion keeps the Zipf head
    // resident. Allow some casualties (a head word whose generation
    // rotated out between touches), but re-missing most of the head
    // means the policy regressed to wipe-everything
    assert(headRemisses < head.length / 2,
      s"head did not survive rotation: $headRemisses of ${head.length} re-missed")
    // determinism across rotation: same ids before and after
    val w = head(7)
    val ids1 = bpe.encodeWord(w).toSeq
    (0 until (1 << 16)).foreach(i => bpe.encodeWord(s"flood2x${i}word"))
    assert(bpe.encodeWord(w).toSeq == ids1)
  }
}
