package graft

import graft.kernel.{CropConfig, MatchMaking, Recognize}
import graft.synth.PageRenderer
import org.scalatest.funsuite.AnyFunSuite

/** T7 layout-label taxonomy (reference label set ocr_processor.py:78-97 +
  * top_k map, live sample results/surya/capture/results.json): planted
  * fixture pages must come back with the right labels, and the golden
  * span text must be unaffected by the richer segmentation. */
class LayoutTaxonomySpec extends AnyFunSuite with SparkSessionTestWrapper {

  /** First `n` upright pages of doc satisfying p. */
  private def pagesWhere(docId: String, n: Int)(p: Int => Boolean): Vector[Int] =
    (1 to 400).iterator
      .filter(pg => PageRenderer.storedRotation(docId, pg) == 0 && p(pg))
      .take(n).toVector

  private def fullPage(docId: String, page: Int) =
    Recognize.segmentPageFull(PageRenderer.render(docId, page),
                              CropConfig.lookup(docId))

  test("section-header pages: golden text roundtrips and the short line " +
       "is labeled SectionHeader") {
    val docId = "F1988005"
    val pages = pagesWhere(docId, 4)(
      PageRenderer.sectionHeaderLine(docId, _).isDefined)
    assert(pages.size == 4, s"found only ${pages.size} section-header pages")
    for (page <- pages) {
      val crop = CropConfig.lookup(docId)
      val got = Recognize.recognizeStored(PageRenderer.render(docId, page), crop)
      assert(got.text == PageRenderer.bodyText(docId, page),
             s"golden mismatch on section-header page $page")
      val (layouts, lines) = fullPage(docId, page)
      val hdrIdx = PageRenderer.sectionHeaderLine(docId, page).get
      val hdrText = PageRenderer.bodyLines(docId, page)(hdrIdx)
      val secs = layouts.filter(_.label == "SectionHeader")
      assert(secs.size == 1, s"page $page SectionHeader blocks: ${secs.size}")
      val mm = MatchMaking.matchTextsToLayouts(secs, lines)
      assert(mm.matched.head.texts.map(_.text) == Vector(hdrText),
             s"page $page header text mismatch")
    }
  }

  test("page bands: PageHeader first, PageFooter last, both outside the " +
       "crop body") {
    val docId = "F2017002"
    val crop = CropConfig.lookup(docId)
    for (page <- pagesWhere(docId, 3)(_ => true)) {
      val (layouts, _) = fullPage(docId, page)
      assert(layouts.head.label == "PageHeader", s"page $page: ${layouts.head}")
      assert(layouts.last.label == "PageFooter", s"page $page: ${layouts.last}")
      assert(layouts.head.bbox.y2 <= crop.top)
      assert(layouts.last.bbox.y1 >= PageRenderer.LogicalH - crop.bottom)
      assert(layouts.head.position == 0 &&
             layouts.last.position == layouts.size - 1)
    }
  }

  test("nested indented blocks are labeled ListItem") {
    val docId = "F1975001"
    val pages = pagesWhere(docId, 3)(
      PageRenderer.nestedBlock(docId, _).isDefined)
    assert(pages.size == 3, s"found only ${pages.size} nested pages")
    for (page <- pages) {
      val (layouts, lines) = fullPage(docId, page)
      val (_, len, _) = PageRenderer.nestedBlock(docId, page).get
      val items = layouts.filter(_.label == "ListItem")
      assert(items.size == 1, s"page $page ListItem blocks: ${items.size}")
      val mm = MatchMaking.matchTextsToLayouts(items, lines)
      assert(mm.matched.head.texts.size == len,
             s"page $page ListItem line count")
    }
  }

  test("planted ruled tables produce one Table-labeled block covering the " +
       "cell grid") {
    val docId = "F2003007"
    val pages = pagesWhere(docId, 3)(
      PageRenderer.layoutFor(docId, _).table.isDefined)
    assert(pages.size == 3, s"found only ${pages.size} table pages")
    for (page <- pages) {
      val (layouts, _) = fullPage(docId, page)
      val spec = PageRenderer.layoutFor(docId, page).table.get
      val tables = layouts.filter(_.label == "Table")
      assert(tables.size == 1, s"page $page Table blocks: ${tables.size}")
      // logical-coords table zone contains the block (digits sit inside
      // the ruled frame)
      val zone = graft.core.BBox(spec.x, spec.y, spec.x + spec.w, spec.y + spec.h)
      assert(zone.contains(tables.head.bbox),
             s"page $page table block ${tables.head.bbox} outside $zone")
    }
  }

  test("figure pages: Picture block + Caption line labeled, golden text " +
       "unaffected (figure draws no text)") {
    val docId = "F1966002"
    val pages = pagesWhere(docId, 3)(
      PageRenderer.figureSpec(docId, _).isDefined)
    assert(pages.size == 3, s"found only ${pages.size} figure pages")
    for (page <- pages) {
      val crop = CropConfig.lookup(docId)
      val got = Recognize.recognizeStored(PageRenderer.render(docId, page), crop)
      assert(got.text == PageRenderer.bodyText(docId, page),
             s"golden mismatch on figure page $page")
      val (layouts, lines) = fullPage(docId, page)
      val pics = layouts.filter(_.label == "Picture")
      val caps = layouts.filter(_.label == "Caption")
      assert(pics.size == 1, s"page $page Picture blocks: ${pics.size}")
      assert(caps.size == 1, s"page $page Caption blocks: ${caps.size}")
      // caption reads directly after its picture
      assert(caps.head.position == pics.head.position + 1,
             s"page $page caption not adjacent to picture")
      // the caption text is the planted caption slot
      val f0 = PageRenderer.figureSpec(docId, page).get
      val capText = PageRenderer.bodySlots(docId, page)
        .collectFirst { case (slot, _, t)
          if slot == f0 + PageRenderer.FigureLines => t }.get
      val mm = MatchMaking.matchTextsToLayouts(caps, lines)
      assert(mm.matched.head.texts.map(_.text) == Vector(capText))
    }
  }

  test("inline-math pages: golden text roundtrips ('+'/'=' glyphs " +
       "recognized) and the block is labeled TextInlineMath") {
    val docId = "F1994003"
    val pages = pagesWhere(docId, 3)(
      PageRenderer.mathLine(docId, _).isDefined)
    assert(pages.size == 3, s"found only ${pages.size} math pages")
    for (page <- pages) {
      val crop = CropConfig.lookup(docId)
      val got = Recognize.recognizeStored(PageRenderer.render(docId, page), crop)
      assert(got.text == PageRenderer.bodyText(docId, page),
             s"golden mismatch on math page $page")
      val (layouts, lines) = fullPage(docId, page)
      val maths = layouts.filter(_.label == "TextInlineMath")
      assert(maths.size == 1, s"page $page TextInlineMath blocks: ${maths.size}")
      // the planted expression's line is inside the labeled block
      val mm = MatchMaking.matchTextsToLayouts(maths, lines)
      val expr = PageRenderer.mathText(docId, page)
      assert(mm.matched.head.texts.map(_.text).contains(expr),
             s"page $page math line '$expr' not in block")
    }
  }

  test("top_k: every block carries a score map whose argmax is its label") {
    val docId = "F1988005"
    for (page <- pagesWhere(docId, 6)(_ => true)) {
      val (layouts, _) = fullPage(docId, page)
      assert(layouts.nonEmpty)
      for (b <- layouts) {
        assert(b.topK.nonEmpty, s"empty top_k on $b")
        assert(b.topK.values.forall(s => s >= 0.0 && s <= 1.0))
        val argmax = b.topK.maxBy { case (l, s) => (s, l) }._1
        assert(argmax == b.label, s"top_k argmax $argmax != label ${b.label}")
        assert(math.abs(b.topK(b.label) - b.confidence) < 1e-9)
      }
    }
  }

  test("x3 query emits more than one distinct label (driver-visible " +
       "taxonomy surface) and every planted fixture label is found " +
       "(fixture_found = 1 on all rows)") {
    import org.apache.spark.sql.functions.col
    val df = SparkEntry.queries("x3_layout_segment")(spark, "unused")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val distinct = df.select("label").distinct()
      .collect().map(_.getString(0)).toSet
    assert(distinct.size > 1, s"labels: $distinct")
    assert(distinct.contains("PageHeader") && distinct.contains("Text"),
           s"labels: $distinct")
    val bad = df.filter(col("fixture_found") =!= 1)
      .select("doc_id", "page", "expected_fixture").distinct().collect()
    assert(bad.isEmpty,
      s"pages missing their planted fixture label: ${bad.mkString(", ")}")
    // the fixture surface itself is exercised: several classes planted
    val fixtures = df.select("expected_fixture").distinct()
      .collect().map(_.getString(0)).toSet
    assert(fixtures.size >= 4, s"fixture classes seen: $fixtures")
    df.unpersist()
  }
}
