package graft

import graft.core.BBox
import graft.img.Gray
import graft.kernel.TableDetect
import graft.kernel.TableDetect.TLine
import graft.synth.PageRenderer
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's own test suite (tests/test_table_detection.py)
  * plus the IoU best-match evaluation harness (J4, test_tables.py:279-410).
  */
class TableDetectSpec extends AnyFunSuite {

  /** J4: best-IoU matching with threshold 0.5 → (tp, fp, fn). */
  private def iouMatch(preds: Seq[BBox], gts: Seq[BBox]): (Int, Int, Int) = {
    var tp = 0
    var fp = 0
    val matched = scala.collection.mutable.Set[Int]()
    for (p <- preds) {
      var bestIou = 0.0
      var bestIdx = -1
      for ((g, i) <- gts.zipWithIndex) {
        val iou = p.iou(g)
        if (iou > bestIou) { bestIou = iou; bestIdx = i }
      }
      if (bestIou >= 0.5 && bestIdx >= 0 && !matched(bestIdx)) {
        tp += 1; matched += bestIdx
      } else fp += 1
    }
    (tp, fp, gts.size - matched.size)
  }

  test("TLine properties (reference test_table_detection.py:16-31)") {
    val h = TLine(10, 20, 100, 3)
    val v = TLine(10, 20, 3, 100)
    assert(h.isHorizontal && !h.isVertical && h.length == 100 && h.center == 60)
    assert(v.isVertical && !v.isHorizontal && v.length == 100 && v.center == 70)
    assertThrows[IllegalArgumentException](TLine(0, 0, 5, 5).center)
  }

  test("line gap clustering (test_table_detection.py:35-72)") {
    val lines = Vector(
      TLine(10, 0, 3, 50), TLine(14, 0, 3, 50), // cluster 1
      TLine(100, 0, 3, 50),                      // cluster 2
      TLine(200, 0, 3, 50), TLine(205, 0, 3, 50)) // cluster 3
    val cl = TableDetect.findLinesClusters(lines, gapThreshold = 10)
    assert(cl.size == 3)
    assert(cl(0).map(_.x) == Vector(10, 14))
    assert(cl(1).map(_.x) == Vector(100))
    assert(cl(2).map(_.x) == Vector(200, 205))
  }

  test("synthetic-image line detection (test_table_detection.py:77-127)") {
    // white page with one long horizontal and one long vertical black line
    val w = 400; val h = 300
    val px = Array.fill(w * h)(240)
    for (x <- 50 until 350; dy <- 0 to 1) px((100 + dy) * w + x) = 20 // h-line
    for (y <- 40 until 260; dx <- 0 to 1) px(y * w + 150 + dx) = 20   // v-line
    // noise specks that morphology must remove
    for (i <- 0 until 30) px((i * 997 % h) * w + (i * 613 % w)) = 20
    val g = Gray.fromInts(w, h, px)
    val (_, vLines, hLines) = TableDetect.coreLineDetection(g, 5, 0.05)
    assert(hLines.exists(l => l.length > 250 && math.abs(l.y - 100) <= 3))
    assert(vLines.exists(l => l.length > 180 && math.abs(l.x - 150) <= 3))
  }

  test("central v-line filter drops the gutter cluster (:133-178)") {
    val w = 800
    val gutter = Vector(TLine(398, 10, 2, 200), TLine(401, 220, 2, 300))
    val tableLine = Vector(TLine(100, 10, 2, 200))
    val kept = TableDetect.filterCentralVLine(gutter ++ tableLine, w)
    assert(kept == tableLine)
    // no central cluster → everything kept
    assert(TableDetect.filterCentralVLine(tableLine, w) == tableLine)
  }

  test("duplicate-line removal keeps distinct starts (:181-210) with the prev-always-updates quirk") {
    // vertical lines in one cluster, sorted by y: 0, 4, 7, 20
    // quirk: 4 dropped (|4-0|<=5), 7 KEPT (|7-4|>... no: |7-4|=3<=5 dropped
    // vs prev=4, not prev-kept=0), 20 kept
    val cluster = Vector(
      TLine(10, 0, 2, 50), TLine(11, 4, 2, 50),
      TLine(12, 7, 2, 50), TLine(13, 20, 2, 50))
    val out = TableDetect.removeLineDuplicates(Vector(cluster))
    assert(out.head.map(_.y) == Vector(0, 20))
  }

  test("minimal line diff distance over cluster representatives (A4, :547-563)") {
    val v = Vector(Vector(TLine(10, 0, 2, 50)), Vector(TLine(50, 0, 2, 50)),
                   Vector(TLine(75, 0, 2, 50)))
    val h = Vector(Vector(TLine(0, 10, 50, 2)), Vector(TLine(0, 100, 50, 2)))
    assert(TableDetect.minimalLineDiffDistance(v, h) == 25)
  }

  /** Find a rotation-0 page with a table in the synthetic corpus. */
  private def tablePage: (String, Int, PageRenderer.TableSpec) = {
    val docId = "F1985003"
    (1 to 200).iterator.flatMap { p =>
      PageRenderer.layoutFor(docId, p).table
        .filter(_ => PageRenderer.storedRotation(docId, p) == 0)
        .map(t => (docId, p, t))
    }.next()
  }

  test("end-to-end: planted table detected at IoU >= 0.5 (J4)") {
    val (docId, page, spec) = tablePage
    val stored = PageRenderer.render(docId, page) // 2x upright
    val tables = TableDetect.detectTables(stored)
    assert(tables.nonEmpty, "no table detected")
    val (tp, _, fn) = iouMatch(tables, Seq(spec.bbox2x))
    assert(tp == 1 && fn == 0,
      s"table gt=${spec.bbox2x} got=${tables.mkString(",")}")
  }

  test("end-to-end: planted cells recovered (precision/recall, A8 gates)") {
    val (docId, page, spec) = tablePage
    val stored = PageRenderer.render(docId, page)
    val tables = TableDetect.detectTables(stored)
    assert(tables.nonEmpty)
    val cells = TableDetect.detectTableCells(stored, tables.head)
    val (tp, fp, fn) = iouMatch(cells, spec.cells2x)
    val precision = tp.toDouble / math.max(1, tp + fp)
    val recall = tp.toDouble / math.max(1, tp + fn)
    assert(precision > 0 && recall > 0, s"tp=$tp fp=$fp fn=$fn")
    assert(recall >= 0.75, s"recall $recall (tp=$tp fp=$fp fn=$fn, " +
      s"gt=${spec.cells2x.take(3)}..., got=${cells.take(3)}...)")
    assert(precision >= 0.75, s"precision $precision (tp=$tp fp=$fp fn=$fn)")
  }

  test("table OCR: planted cell values recovered in a padded row grid (A7)") {
    val (docId, page, spec) = tablePage
    val stored = PageRenderer.render(docId, page)
    val tables = TableDetect.detectTables(stored)
    assert(tables.nonEmpty)
    val cells = TableDetect.detectTableCells(stored, tables.head)
    val grid = graft.kernel.TableOcr.extractGrid(stored, cells)
    val want = Vector.tabulate(spec.rows, spec.cols)((i, j) =>
      PageRenderer.cellValue(docId, page, i, j).toString)
    assert(grid == want, s"grid=$grid want=$want")
  }

  test("apply_ocr row padding: shorter rows padded with empty strings (A7)") {
    val grid = Vector(Vector("a", "b", "c"), Vector("d"), Vector("e", "f"))
    assert(graft.kernel.TableOcr.padRows(grid) ==
      Vector(Vector("a", "b", "c"), Vector("d", "", ""), Vector("e", "f", "")))
  }

  test("text recognition is undisturbed by a planted table (graphics gate)") {
    val (docId, page, _) = tablePage
    val crop = graft.kernel.CropConfig.lookup(docId)
    val got = graft.kernel.Recognize.recognizeStored(
      PageRenderer.render(docId, page), crop)
    assert(got.text == PageRenderer.bodyText(docId, page))
  }
}
