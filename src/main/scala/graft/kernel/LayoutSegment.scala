package graft.kernel

import graft.core.{BBox, LayoutBox, TextLine}

/** Layout segmentation — the classical stand-in for the reference's Surya
  * LayoutPredictor (classes/ocr_processor.py:77-100; SURVEY §7.3
  * "Layout"). Two stages:
  *
  *  1. column split: the 2-column gutter rule reusing the same center-zone
  *     logic as the table detector's F4 (table_detection.py:218-254);
  *  2. within each column, blocks split at wide vertical gaps and indent
  *     runs, then labeled with the reference's taxonomy
  *     (ocr_processor.py:78-97 label set): `SectionHeader` (single short
  *     line with extra whitespace), `ListItem` (indented run), `Table`
  *     (grid of numeric cells), `TextInlineMath` (a line carrying a math
  *     glyph), `Text` (default); the full-page path adds
  *     `PageHeader`/`PageFooter` (Recognize.segmentPageFull). Every box
  *     carries a `top_k` label→score map like the reference's LayoutBox
  *     (live sample results/surya/capture/results.json) — scores here are
  *     deterministic rule strengths, not softmax outputs.
  *
  * `position` is the reading order the reference's LayoutBox carries
  * (ocr_processor.py:88): columns left→right, blocks top→bottom.
  */
object LayoutSegment {

  /** Minimum clear vertical band (px) that splits two columns. */
  val MinGutterWidth = 8
  /** The gutter must sit within centre ± this fraction of the body width
    * (the reference's gutter tolerance is a centre zone, F4). */
  val CentreZoneFrac = 0.22
  /** Vertical gap (px between line boxes) at or above which two lines are
    * separate blocks. Normal leading is 5 px, the section-header extra gap
    * 17 px, the table-zone gap 19 px; the value must stay ABOVE the J2
    * containment margin (10) or adjacent blocks' expanded boxes would
    * swallow each other's border lines (MatchMaking margin semantics). */
  val BlockSplitGap = 13
  /** Left-indent (px vs the column's left edge) at or above which a run of
    * lines splits out as a ListItem block. */
  val IndentMin = 15
  /** A numeric block needs at least this many digit-only lines. */
  val TableMinNumeric = 3

  /** Segment recognized lines into labeled layout blocks in reading order:
    * left column first, then right; blocks top→bottom inside a column. */
  def segment(lines: Seq[TextLine], bodyW: Int, bodyH: Int): Vector[LayoutBox] = {
    if (lines.isEmpty) return Vector.empty
    val columns: Vector[Seq[TextLine]] = gutterX(lines, bodyW) match {
      case Some(gx) =>
        val (left, right) = lines.partition(_.bbox.cx < gx)
        Vector(left, right).filter(_.nonEmpty)
      case None => Vector(lines)
    }
    val blocks = columns.flatMap { col =>
      val colMinX = col.map(_.bbox.x1).min
      val colW = math.max(1, col.map(_.bbox.x2).max - colMinX)
      val labeled = gapBlocks(col)
        // a numeric grid row has cells at staggered x — indent splitting
        // must not shred it before the Table rule can see it
        .flatMap(b => if (isNumericGrid(b)) Vector(b) else indentRuns(b))
        .map(ls => label(ls, colW, colMinX))
      // merge runs PER COLUMN: a table ending column 1 and another
      // starting column 2 must never fuse into one box spanning the gutter
      mergeAdjacentTables(labeled)
    }
    blocks.zipWithIndex.map { case ((bb, lab, conf, tk), i) =>
      LayoutBox(bb, lab, i, conf, tk)
    }
  }

  /** One labeled block: (bbox, label, confidence, top_k). */
  private type Block = (BBox, String, Double, Map[String, Double])

  /** Split a (y,x)-sorted column into blocks at wide vertical gaps. */
  private def gapBlocks(col: Seq[TextLine]): Vector[Vector[TextLine]] = {
    val sorted = col.sortBy(l => (l.bbox.y1, l.bbox.x1)).toVector
    val out = Vector.newBuilder[Vector[TextLine]]
    var cur = Vector.newBuilder[TextLine]
    var curMaxY2 = Int.MinValue
    for (l <- sorted) {
      if (curMaxY2 != Int.MinValue && l.bbox.y1 - curMaxY2 >= BlockSplitGap) {
        out += cur.result()
        cur = Vector.newBuilder[TextLine]
        curMaxY2 = Int.MinValue
      }
      cur += l
      curMaxY2 = math.max(curMaxY2, l.bbox.y2)
    }
    val last = cur.result()
    if (last.nonEmpty) out += last
    out.result()
  }

  /** Split indent runs (>= 2 consecutive lines indented >= IndentMin vs
    * the block's left edge) out of a gap-block — the `Layouts Imbriqués`
    * nested-block fixture becomes its own ListItem candidate. */
  private def indentRuns(block: Vector[TextLine]): Vector[Vector[TextLine]] = {
    val minX = block.map(_.bbox.x1).min
    val flags = block.map(_.bbox.x1 - minX >= IndentMin)
    // single-line indented runs are NOT split out (a lone indented line —
    // e.g. a paragraph's stray start — stays with its Text neighbours;
    // only >= 2-line runs can become ListItem blocks)
    val runFlags = Array.tabulate(block.length) { i =>
      flags(i) &&
      ((i > 0 && flags(i - 1)) || (i < block.length - 1 && flags(i + 1)))
    }
    if (!runFlags.contains(true)) return Vector(block)
    val out = Vector.newBuilder[Vector[TextLine]]
    var i = 0
    while (i < block.length) {
      var j = i
      while (j < block.length && runFlags(j) == runFlags(i)) j += 1
      out += block.slice(i, j)
      i = j
    }
    out.result()
  }

  private def isNumericGrid(ls: Seq[TextLine]): Boolean =
    ls.lengthCompare(TableMinNumeric) >= 0 &&
    ls.forall(l => l.text.nonEmpty && l.text.forall(_.isDigit))

  /** Characters only the planted inline-math expressions draw (the math
    * glyphs of GlyphFont); a block containing any of them is
    * `TextInlineMath` — the reference's Text-with-inline-math label. */
  private val MathChars: Set[Char] = Set('+', '=')

  /** Label one block of lines. Rule order: Table (all-numeric grid) →
    * ListItem (indented run of >= 2 lines) → TextInlineMath (any line with
    * a math glyph) → SectionHeader (single short line) → Text. Scores are
    * integer-ratio rule strengths (deterministic doubles), carried in the
    * top_k map with Text as the runner-up. */
  /** Rule strength floored at 0.51: a fired rule OWNS the label, so its
    * top_k score must strictly beat the Text runner-up even at the rule's
    * admission boundary (e.g. a 0.55·colW header line or an exactly
    * IndentMin-indented run would otherwise score <= 0.5 and the top_k
    * argmax would contradict the label column). */
  private def ruleScore(e2: Long): Double =
    math.min(100L, math.max(51L, e2)).toDouble / 100.0

  private def label(ls: Vector[TextLine], colW: Int, colMinX: Int): Block = {
    val bb = union(ls)
    val numeric = ls.count(l => l.text.nonEmpty && l.text.forall(_.isDigit))
    if (numeric == ls.length && numeric >= TableMinNumeric) {
      val s = ruleScore(100L * numeric / 6)
      (bb, "Table", s, Map("Table" -> s, "Text" -> (1.0 - s)))
    } else if (ls.length >= 2 && bb.x1 - colMinX >= IndentMin) {
      val s = ruleScore(100L * (bb.x1 - colMinX) / 30)
      (bb, "ListItem", s, Map("ListItem" -> s, "Text" -> (1.0 - s)))
    } else if (ls.exists(_.text.exists(MathChars))) {
      val mathLines = ls.count(_.text.exists(MathChars))
      val s = ruleScore(51L + 49L * mathLines / ls.length)
      (bb, "TextInlineMath", s, Map("TextInlineMath" -> s, "Text" -> (1.0 - s)))
    } else if (ls.length == 1 && bb.w.toLong * 100 <= 55L * colW) {
      val s = ruleScore(100L - 100L * bb.w / colW)
      (bb, "SectionHeader", s, Map("SectionHeader" -> s, "Text" -> (1.0 - s)))
    } else (bb, "Text", 1.0, Map("Text" -> 1.0))
  }

  /** Merge consecutive Table blocks of ONE column (each ruled-table row
    * arrives as its own numeric block; the reference emits ONE Table
    * region per table). Callers pass a single column's block run — merging
    * across columns would fuse tables on either side of the gutter into
    * one box spanning it. */
  private def mergeAdjacentTables(blocks: Vector[Block]): Vector[Block] = {
    val out = Vector.newBuilder[Block]
    var i = 0
    while (i < blocks.length) {
      val b = blocks(i)
      if (b._2 == "Table") {
        var bb = b._1
        var nRows = 1
        var j = i + 1
        while (j < blocks.length && blocks(j)._2 == "Table") {
          bb = bb.union(blocks(j)._1)
          nRows += 1
          j += 1
        }
        val s = math.min(100L, 100L * nRows / 3 + 40).toDouble / 100.0
        out += ((bb, "Table", s, Map("Table" -> s, "Text" -> (1.0 - s))))
        i = j
      } else {
        out += b
        i += 1
      }
    }
    out.result()
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
