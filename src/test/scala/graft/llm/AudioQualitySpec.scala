package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Pins the audio quality probe against the planted-defect WAV
  * fixture: exact silence/clip counts through the real decode. */
class AudioQualitySpec extends AnyFunSuite {

  private def probe(id: Long, sil: Boolean, clp: Boolean) =
    Multimodal.audioQualityQ(
      Multimodal.fixtureWavQuality(id, sil, clp), 256L, 32700L).get

  test("planted silence and clipping come back as exact counts") {
    val (n, s0, c0, _) = probe(42L, sil = false, clp = false)
    assert(n == 2000L && s0 < 40L && c0 < 20L) // natural baselines are tiny
    val (_, s1, _, _) = probe(42L, sil = true, clp = false)
    assert(s1 >= 500L && s1 <= 500L + s0)       // 25% plant + baseline outside band
    val (_, _, c2, _) = probe(42L, sil = false, clp = true)
    assert(c2 >= 100L && c2 <= 100L + c0)       // 5% plant + baseline
  }

  test("defects change loudness in the expected direction") {
    val (_, _, _, base) = probe(7L, sil = false, clp = false)
    val (_, _, _, quiet) = probe(7L, sil = true, clp = false)
    assert(quiet < base)
  }

  test("garbage bytes decode to None, not a crash") {
    assert(Multimodal.audioQualityQ("not a wav".getBytes, 256L, 32700L).isEmpty)
    assert(Multimodal.audioQualityQ(null, 256L, 32700L).isEmpty)
  }
}
