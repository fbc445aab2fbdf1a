package graft.kernel

import graft.core.{BBox, LayoutBox, TextLine}

/** Layout segmentation — the classical stand-in for the reference's Surya
  * LayoutPredictor (classes/ocr_processor.py:77-100; SURVEY §7.3
  * "Layout"). v1 segments text columns: the 2-column gutter rule reuses
  * the same center-zone logic as the table detector's F4
  * (table_detection.py:218-254); `position` is the reading order the
  * reference's LayoutBox carries (ocr_processor.py:88).
  */
object LayoutSegment {

  /** Minimum clear vertical band (px) that splits two columns. */
  val MinGutterWidth = 8
  /** The gutter must sit within centre ± this fraction of the body width
    * (the reference's gutter tolerance is a centre zone, F4). */
  val CentreZoneFrac = 0.22

  /** Segment recognized lines into column layout blocks in reading order:
    * left column first, then right; single block when no gutter found. */
  def segment(lines: Seq[TextLine], bodyW: Int, bodyH: Int): Vector[LayoutBox] = {
    if (lines.isEmpty) return Vector.empty
    gutterX(lines, bodyW) match {
      case Some(gx) =>
        val (left, right) = lines.partition(_.bbox.cx < gx)
        val blocks = Vector(left, right).filter(_.nonEmpty)
        blocks.zipWithIndex.map { case (ls, i) =>
          LayoutBox(union(ls), "Text", i, 1.0)
        }
      case None =>
        Vector(LayoutBox(union(lines), "Text", 0, 1.0))
    }
  }

  /** Centre x of the widest clear vertical band within the centre zone
    * that no line crosses, if wide enough; the 2-column gutter. */
  def gutterX(lines: Seq[TextLine], bodyW: Int): Option[Int] = {
    val lo = (bodyW * (0.5 - CentreZoneFrac)).toInt
    val hi = (bodyW * (0.5 + CentreZoneFrac)).toInt
    if (hi <= lo) return None
    val covered = new Array[Boolean](hi - lo)
    for (l <- lines) {
      var x = math.max(lo, l.bbox.x1)
      while (x < math.min(hi, l.bbox.x2)) { covered(x - lo) = true; x += 1 }
    }
    // widest uncovered run
    var bestStart = -1
    var bestLen = 0
    var runStart = -1
    var i = 0
    while (i <= covered.length) {
      if (i < covered.length && !covered(i)) {
        if (runStart < 0) runStart = i
      } else if (runStart >= 0) {
        val len = i - runStart
        if (len > bestLen) { bestLen = len; bestStart = runStart }
        runStart = -1
      }
      i += 1
    }
    // a true gutter has lines on BOTH sides of the band
    if (bestLen >= MinGutterWidth) {
      val gx = lo + bestStart + bestLen / 2
      val leftN = lines.count(_.bbox.cx < gx)
      val rightN = lines.size - leftN
      if (leftN > 0 && rightN > 0) Some(gx) else None
    } else None
  }

  private def union(ls: Seq[TextLine]): BBox =
    ls.map(_.bbox).reduce(_.union(_))
}
