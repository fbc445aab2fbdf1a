package graft

import graft.core.{BBox, TextLine}
import graft.kernel.{CropConfig, Recognize, TokenCrop}
import graft.synth.PageRenderer
import org.scalatest.funsuite.AnyFunSuite

/** J7 — objects_to_crops semantics (TATR notebook cell 27): IoB >= 0.5
  * token selection, crop-frame translation, rotated-table remap. */
class TokenCropSpec extends AnyFunSuite {

  private def tok(x1: Int, y1: Int, x2: Int, y2: Int, t: String) =
    TextLine(BBox(x1, y1, x2, y2), t, 1.0)

  test("IoB >= 0.5 selects exactly the crop's tokens; coords translate " +
       "into the crop frame") {
    val table = BBox(100, 100, 300, 200)
    val tokens = Seq(
      tok(110, 110, 150, 120, "inside"),
      tok(85, 110, 95, 120, "in-pad"),        // inside the 10px padded crop
      tok(60, 110, 85, 120, "half-out"),      // iob < 0.5 vs padded crop
      tok(400, 400, 440, 410, "outside"))
    val (crop, out) = TokenCrop.tokensToCrop(tokens, table, 720, 960)
    assert(crop == BBox(90, 90, 310, 210))
    assert(out.map(_.text) == Vector("inside", "in-pad"))
    assert(out.head.bbox == BBox(20, 20, 60, 30)) // minus crop origin
  }

  test("edge-of-page table: the pad is UNCLAMPED (TATR cell 27) — the " +
       "crop origin goes negative and tokens translate by it") {
    val table = BBox(0, 0, 200, 100) // flush with the page corner
    val tokens = Seq(tok(5, 5, 45, 15, "corner"))
    val (crop, out) = TokenCrop.tokensToCrop(tokens, table, 720, 960)
    assert(crop == BBox(-10, -10, 210, 110)) // not clamped to the page
    // token minus the UNCLAMPED origin: 5 - (-10) = 15
    assert(out.head.bbox == BBox(15, 15, 55, 25))
    // rotated remap uses w' = crop.h of the unclamped crop (120, not 110)
    val (_, rot) = TokenCrop.tokensToCrop(tokens, table, 720, 960, rotated = true)
    assert(rot.head.bbox == BBox(120 - 25 - 1, 15, 120 - 15 - 1, 55))
  }

  test("iob is intersection over the TOKEN area, not IoU") {
    val a = BBox(0, 0, 10, 10)
    val b = BBox(5, 0, 100, 100)
    assert(TokenCrop.iob(a, b) == 0.5)
    assert(TokenCrop.iob(b, a) < 0.01) // asymmetric
  }

  test("rotated remap follows the notebook formula on a planted rotated " +
       "table page") {
    // a real rendered page with a planted ruled table, recognized tokens
    // scaled to the stored 2x frame the table bbox lives in
    val found = (0 until 80).iterator.flatMap { i =>
      val docId = graft.synth.CorpusGen.docIdFor(i)
      (1 to 4).collectFirst {
        case p if PageRenderer.layoutFor(docId, p).table.isDefined &&
                  PageRenderer.storedRotation(docId, p) == 0 => (docId, p)
      }
    }.take(1).toVector
    val (docId, page) = found.head
    val spec = PageRenderer.layoutFor(docId, page).table.get
    val img = PageRenderer.render(docId, page)
    val lines = Recognize.segmentPageFull(img, CropConfig.lookup(docId))._2
    val tokens2x = lines.map(t => t.copy(bbox = BBox(
      2 * t.bbox.x1, 2 * t.bbox.y1, 2 * t.bbox.x2, 2 * t.bbox.y2)))
    val gt = spec.bbox2x
    val (crop, upright) =
      TokenCrop.tokensToCrop(tokens2x, gt, img.w, img.h, rotated = false)
    val (_, rotated) =
      TokenCrop.tokensToCrop(tokens2x, gt, img.w, img.h, rotated = true)
    // all planted cell digits are selected (rows x cols numeric tokens)
    val digits = upright.filter(_.text.forall(_.isDigit))
    assert(digits.size == spec.rows * spec.cols,
           s"kept ${digits.size} of ${spec.rows * spec.cols} cell tokens")
    // the rotated remap is exactly [w' - y2 - 1, x1, w' - y1 - 1, x2]
    val wPrime = crop.h
    assert(rotated.size == upright.size)
    for ((u, r) <- upright.zip(rotated)) {
      assert(r.bbox == BBox(wPrime - u.bbox.y2 - 1, u.bbox.x1,
                            wPrime - u.bbox.y1 - 1, u.bbox.x2),
             s"remap mismatch: $u -> $r")
      // remapped boxes live in the rotated crop frame (crop.h x crop.w)
      assert(r.bbox.x1 >= 0 && r.bbox.x2 <= wPrime && r.bbox.y1 >= 0 &&
             r.bbox.y2 <= crop.w, s"out of rotated frame: ${r.bbox}")
    }
  }
}
