package graft.tools

import graft.kernel.{TableDetect, TableOcr}
import graft.synth.PageRenderer

object DebugCells {
  def main(args: Array[String]): Unit = {
    val docId = "F1985003"
    val (page, spec) = (1 to 200).iterator.flatMap { p =>
      PageRenderer.layoutFor(docId, p).table
        .filter(_ => PageRenderer.storedRotation(docId, p) == 0)
        .map(t => (p, t))
    }.next()
    println(s"page=$page spec=$spec bbox2x=${spec.bbox2x}")
    println(s"gt cells2x=${spec.cells2x.mkString("\n  ")}")
    val stored = PageRenderer.render(docId, page)
    val tables = TableDetect.detectTables(stored)
    println(s"detected tables: $tables")
    val cells = TableDetect.detectTableCells(stored, tables.head)
    println(s"detected cells (${cells.size}):")
    cells.foreach(c => println(s"  $c -> '${TableOcr.cellText(stored, c)}'"))
    // ground truth cell (0,0) recognized directly
    println(s"gt cell(0,0) -> '${TableOcr.cellText(stored, spec.cells2x.head)}'")
    // ink row profile of the logical page, rows 130..210
    val logical = stored.downsample(2)
    val bin = graft.img.Otsu.binarizeInv(logical)
    for (y <- 130 to 210) {
      var c = 0
      for (x <- 0 until bin.w) if (bin(x, y)) c += 1
      if (c > 0) println(f"row $y%3d ink $c")
    }
  }
}
