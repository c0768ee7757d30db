package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Pins the image quality probe against planted-defect PNGs: exact
  * luma census through the real ImageIO decode. */
class ImageQualitySpec extends AnyFunSuite {

  private def probe(id: Long, dark: Boolean, gray: Boolean) =
    Multimodal.imageQualityQ(
      Multimodal.fixturePngQuality(id, dark, gray)).get

  test("dark plants collapse mean luma and variance; gray plants census as gray") {
    val (n, sl, sl2, g0) = probe(11L, dark = false, gray = false)
    assert(n == 384L && sl / n > 80L && g0 < n)
    val varBase = n * sl2 - sl * sl
    val (_, dsl, dsl2, _) = probe(11L, dark = true, gray = false)
    assert(dsl / n < 32L && (n * dsl2 - dsl * dsl) * 32 < varBase)
    val (_, _, _, gg) = probe(11L, dark = false, gray = true)
    assert(gg == n) // every pixel r=g=b
  }

  test("garbage bytes decode to None") {
    assert(Multimodal.imageQualityQ("nope".getBytes).isEmpty)
    assert(Multimodal.imageQualityQ(null).isEmpty)
  }
}
