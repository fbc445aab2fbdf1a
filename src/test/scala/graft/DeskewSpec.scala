package graft

import graft.img.{Bin, Deskew}
import graft.kernel.{CropConfig, Recognize}
import graft.synth.PageRenderer
import org.scalatest.funsuite.AnyFunSuite

/** Small-angle deskew (north_star stage): planted integer-shear fixture
  * pages must roundtrip to their goldens exactly, and unskewed pages must
  * come back with slope 0 (a spurious correction would corrupt them). */
class DeskewSpec extends AnyFunSuite {

  test("forward shear then unshear is the identity on the content band") {
    val rng = new graft.synth.Rng(31L)
    val w = 200
    val h = 240
    for (s <- Seq(-9, -5, -1, 1, 4, 9)) {
      val o = new Array[Boolean](w * h)
      for (_ <- 0 until 800) // ink away from the vertical edges
        o(rng.between(20, h - 21) * w + rng.nextInt(w)) = true
      val orig = new Bin(w, h, o)
      // forward: S(x, y) = O(x, y - dy(x)) (renderer's shear)
      val sArr = new Array[Boolean](w * h)
      for (x <- 0 until w; y <- 0 until h) {
        val sy = y - Deskew.shearDy(x, w, s)
        if (sy >= 0 && sy < h && o(sy * w + x)) sArr(y * w + x) = true
      }
      val back = Deskew.applyUnshear(new Bin(w, h, sArr), s)
      assert(back == orig, s"slope $s roundtrip failed")
    }
  }

  test("estimator recovers the exact planted slope on rendered pages") {
    var skewed = 0
    var clean = 0
    for (i <- 0 until 40; page <- 1 to 4
         if PageRenderer.storedRotation(graft.synth.CorpusGen.docIdFor(i), page) == 0
         if skewed < 8 || clean < 8) {
      val docId = graft.synth.CorpusGen.docIdFor(i)
      val want = PageRenderer.skewSlope(docId, page)
      if ((want != 0 && skewed < 8) || (want == 0 && clean < 8)) {
        val stored = PageRenderer.render(docId, page)
        val logical = stored.downsample(Recognize.PageScale)
        val bin = graft.img.Otsu.binarizeInv(logical)
        val got = Deskew.estimateSlope(bin)
        assert(got == want, s"$docId p$page: estimated $got, planted $want")
        if (want != 0) skewed += 1 else clean += 1
      }
    }
    assert(skewed >= 8, s"only $skewed skewed pages found")
    assert(clean >= 8)
  }

  test("skewed pages roundtrip to their goldens exactly") {
    var checked = 0
    for (i <- 0 until 60; page <- 1 to 4 if checked < 6) {
      val docId = graft.synth.CorpusGen.docIdFor(i)
      if (PageRenderer.skewSlope(docId, page) != 0) {
        val crop = CropConfig.lookup(docId)
        val got = Recognize.recognizeStored(PageRenderer.render(docId, page), crop)
        assert(got.text == PageRenderer.bodyText(docId, page),
               s"skewed page $docId p$page mismatch")
        checked += 1
      }
    }
    assert(checked == 6, s"only $checked skewed pages exercised")
  }
}
