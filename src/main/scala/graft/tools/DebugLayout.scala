package graft.tools

import graft.kernel.{CropConfig, Recognize}
import graft.synth.PageRenderer

/** Dev probe: dump labeled layout blocks + lines for one page. */
object DebugLayout {
  def main(args: Array[String]): Unit = {
    val docId = if (args.length > 0) args(0) else "F2003007"
    val page = if (args.length > 1) args(1).toInt else 12
    val layout = PageRenderer.layoutFor(docId, page)
    println(s"DBG layout=$layout rot=${PageRenderer.storedRotation(docId, page)}")
    val (blocks, lines) = Recognize.segmentPageFull(
      PageRenderer.render(docId, page), CropConfig.lookup(docId))
    for (b <- blocks) println(s"DBG block $b")
    for (l <- lines) println(s"DBG line ${l.bbox} '${l.text}'")
  }
}
