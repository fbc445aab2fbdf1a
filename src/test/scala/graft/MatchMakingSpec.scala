package graft

import graft.core.{BBox, LayoutBox, TextLine}
import graft.kernel.{LayoutSegment, MatchMaking, Recognize}
import graft.synth.PageRenderer
import org.scalatest.funsuite.AnyFunSuite

class MatchMakingSpec extends AnyFunSuite {
  private def tl(x1: Int, y1: Int, x2: Int, y2: Int, s: String) =
    TextLine(BBox(x1, y1, x2, y2), s, 1.0)

  test("J2: containment with margin expansion, (y,x) sort inside layout") {
    val layout = LayoutBox(BBox(10, 10, 100, 100), "Text", 0, 1.0)
    val texts = Seq(
      tl(12, 50, 90, 57, "second"),
      tl(12, 20, 90, 27, "first"),
      tl(5, 15, 95, 22, "margin-covered"), // x1=5 >= 10-10 → contained
      tl(200, 20, 300, 27, "outside"))
    val r = MatchMaking.matchTextsToLayouts(Seq(layout), texts, margin = 10)
    assert(r.matched.size == 1)
    assert(r.matched.head.texts.map(_.text) ==
      Vector("margin-covered", "first", "second"))
    assert(r.rest.map(_.text) == Vector("outside"))
  }

  test("J2: a text may match multiple layouts; J3 rest only for unmatched") {
    val l1 = LayoutBox(BBox(0, 0, 100, 100), "Text", 0, 1.0)
    val l2 = LayoutBox(BBox(0, 0, 100, 100), "SectionHeader", 1, 1.0)
    val texts = Seq(tl(10, 10, 90, 17, "shared"))
    val r = MatchMaking.matchTextsToLayouts(Seq(l1, l2), texts)
    assert(r.matched.size == 2) // emitted under both layouts (reference :228-246)
    assert(r.rest.isEmpty)
  }

  test("J2: empty layouts are not emitted (image_builder.py:246)") {
    val l1 = LayoutBox(BBox(0, 0, 10, 10), "Text", 0, 1.0)
    val texts = Seq(tl(50, 50, 90, 57, "far"))
    val r = MatchMaking.matchTextsToLayouts(Seq(l1), texts)
    assert(r.matched.isEmpty && r.rest.map(_.text) == Vector("far"))
  }

  test("layout segmentation: gutter split, left column first") {
    val left = (0 until 5).map(i => tl(8, i * 12, 148, i * 12 + 7, s"L$i"))
    val right = (0 until 5).map(i => tl(170, i * 12, 310, i * 12 + 7, s"R$i"))
    val segs = LayoutSegment.segment(left ++ right, bodyW = 320, bodyH = 400)
    assert(segs.size == 2)
    assert(segs(0).position == 0 && segs(1).position == 1)
    assert(segs(0).bbox.x2 <= segs(1).bbox.x1)
  }

  test("layout segmentation: full-width lines stay one block") {
    val lines = (0 until 5).map(i => tl(8, i * 12, 310, i * 12 + 7, s"l$i"))
    assert(LayoutSegment.segment(lines, 320, 400).size == 1)
  }

  test("F8 wide-Text probe: zero wide blocks on two-column goldens") {
    // the reference's data-quality query flags Text blocks wider than the
    // column width as missed 2-column splits (textheight-median.py:260-263,
    // visualizer-test.py:152-156); on our goldens the count must be zero
    val docId = "F1999100"
    val crop = graft.kernel.CropConfig.lookup(docId)
    val bodyW = PageRenderer.LogicalW - crop.left - crop.right
    var checked = 0
    for (page <- 1 to 120 if checked < 6) {
      if (PageRenderer.layoutFor(docId, page).twoCol.isDefined &&
          PageRenderer.storedRotation(docId, page) == 0) {
        val pr = Recognize.recognizeStored(PageRenderer.render(docId, page), crop)
        val blocks = LayoutSegment.segment(pr.lines, bodyW,
          PageRenderer.LogicalH - crop.top - crop.bottom)
        assert(blocks.size >= 2, s"page $page merged into one block")
        val wide = blocks.filter(b => b.bbox.w > (bodyW * 8) / 10)
        assert(wide.isEmpty, s"page $page wide-Text blocks: $wide")
        checked += 1
      }
    }
    assert(checked == 6, s"only $checked two-col pages probed")
  }

  test("two-column page roundtrip: column reading order recovered") {
    val docId = "F1999100"
    val crop = graft.kernel.CropConfig.lookup(docId)
    var checked = 0
    for (page <- 1 to 120 if checked < 3) {
      val layout = PageRenderer.layoutFor(docId, page)
      if (layout.twoCol.isDefined && PageRenderer.storedRotation(docId, page) == 0) {
        val got = Recognize.recognizeStored(PageRenderer.render(docId, page), crop)
        assert(got.text == PageRenderer.bodyText(docId, page),
               s"two-col mismatch on page $page")
        checked += 1
      }
    }
    assert(checked == 3, s"only $checked two-col pages found")
  }
}
