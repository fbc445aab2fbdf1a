package graft.tools

import graft.core.{BBox, Crop}
import graft.img.{Morph, Otsu, Gray}
import graft.kernel.{TableDetect, TableOcr}
import graft.synth.PageRenderer

/** Scratch diagnostic: trace detectTableCells stage-by-stage on one page.
  * Usage: runMain graft.tools.DebugCells <docId> <page>
  */
object DebugCells {
  def main(args: Array[String]): Unit = {
    val docId = if (args.nonEmpty) args(0) else "F1985000"
    val page = if (args.length > 1) args(1).toInt else 3
    val spec = PageRenderer.layoutFor(docId, page).table.get
    println(s"spec=$spec bbox2x=${spec.bbox2x} rot=${PageRenderer.storedRotation(docId, page)}")
    println(s"gt cells2x:\n  ${spec.cells2x.mkString("\n  ")}")
    val stored = PageRenderer.render(docId, page)
    val tables = TableDetect.detectTables(stored)
    println(s"detected tables: $tables")
    val table = tables.head
    val tW = table.w; val tH = table.h
    println(s"crop dims ${tW}x$tH")

    val cropped = stored.crop(Crop(
      top = table.y1, left = table.x1,
      right = stored.w - table.x2, bottom = stored.h - table.y2))
    val thresh = Otsu.binarizeInv(cropped)
    val hClean = Morph.open(thresh, 15, 1)
    val vClean = Morph.open(thresh, 1, 15)
    val cleaned = Morph.or(hClean, vClean)
    val asGray = {
      val px = new Array[Byte](cleaned.b.length)
      var i = 0
      while (i < px.length) { px(i) = if (cleaned.b(i)) 255.toByte else 0; i += 1 }
      new Gray(cleaned.w, cleaned.h, px)
    }
    val (_, vRaw, hRaw) = TableDetect.coreLineDetection(asGray, kernelSize = 3,
      minLineRatio = 0.03, closeGaps = true)
    println(s"raw v lines (${vRaw.size}): ${vRaw.sortBy(_.x).mkString(", ")}")
    println(s"raw h lines (${hRaw.size}): ${hRaw.sortBy(_.y).mkString(", ")}")

    val cells = TableDetect.detectTableCells(stored, table)
    println(s"detected cells (${cells.size}):")
    cells.foreach(c => println(s"  $c -> '${TableOcr.cellText(stored, c)}'"))
  }
}
