package graft.kernel

import graft.core.BBox
import graft.img._

/** Classical ruled-table detection — the most faithful 1:1 algorithmic port
  * in this engine (SURVEY §7.3): semantics from
  * /root/reference/table_detection/table_detection.py (T11/T12, F3-F7,
  * A2-A4 in SURVEY §2). Deliberately ported quirks, each pinned by a test:
  *  - the v-line min-length "ratio" is compared to the RAW constant 0.087,
  *    not 0.087*height (table_detection.py:307) — effectively always true;
  *  - remove_line_duplicates compares each line to the immediately
  *    PREVIOUS line, not the previous KEPT line (:480 updates prev always);
  *  - border-line injection uses list.insert(-1, x), which puts the
  *    right/bottom borders SECOND-TO-LAST (:542-543);
  *  - vertical lines are gap-clustered with 0.01*table HEIGHT and
  *    horizontal with 0.01*table WIDTH (:566-567 — axes crossed as-is).
  */
object TableDetect {

  /** Detected rule line (table_detection.py:13-77): bbox (x, y, w, h). */
  final case class TLine(x: Int, y: Int, w: Int, h: Int) {
    def length: Int = if (w > h) w else h          // :35-36
    def isHorizontal: Boolean = w > h              // :38-39
    def isVertical: Boolean = h > w                // :41-42
    def center: Int =                              // :68-77
      if (isVertical) y + h / 2
      else if (isHorizontal) x + w / 2
      else throw new IllegalArgumentException(s"line neither v nor h: $this")
  }

  /** core_line_detection (:134-215): Sobel x/y → threshold>200 →
    * directional open; optional close; connected regions → lines
    * (squares filtered :205-214). Returns (combined grid, vLines, hLines).
    */
  def coreLineDetection(gray: Gray, kernelSize: Int, minLineRatio: Double,
                        closeGaps: Boolean = false,
                        closeGapsKernel: Int = 10)
      : (Bin, Vector[TLine], Vector[TLine]) = {
    val threshX = Sobel.thresholdAbove(Sobel.absX(gray, kernelSize), 200)
    val threshY = Sobel.thresholdAbove(Sobel.absY(gray, kernelSize), 200)
    val hKernelLen = (gray.w * minLineRatio).toInt
    val vKernelLen = (gray.h * minLineRatio).toInt
    var morphedH = Morph.open(threshY, math.max(1, hKernelLen), 1)
    var morphedV = Morph.open(threshX, 1, math.max(1, vKernelLen))
    if (closeGaps) {
      morphedV = Morph.close(morphedV, closeGapsKernel, closeGapsKernel)
      morphedH = Morph.close(morphedH, closeGapsKernel, closeGapsKernel)
    }
    val grid = Morph.or(morphedH, morphedV)
    def lines(b: Bin): Vector[TLine] =
      ConnectedComponents.label(b).iterator
        .map(c => TLine(c.bbox.x1, c.bbox.y1, c.bbox.w, c.bbox.h))
        .filter(l => l.w != l.h) // square filter :205-214
        .toVector
    (grid, lines(morphedV), lines(morphedH))
  }

  /** find_lines_clusters (:387-441): sort by the first line's axis, break
    * clusters at gaps > threshold. Returned in cluster-id order. */
  def findLinesClusters(data: Seq[TLine], gapThreshold: Double): Vector[Vector[TLine]] = {
    if (data.isEmpty) return Vector.empty
    val sorted =
      if (data.head.isVertical) data.sortBy(_.x)
      else if (data.head.isHorizontal) data.sortBy(_.y)
      else data
    val out = Vector.newBuilder[Vector[TLine]]
    var cur = Vector.newBuilder[TLine]
    cur += sorted.head
    for (i <- 0 until sorted.length - 1) {
      val gap =
        if (sorted(i).isVertical) sorted(i + 1).x - sorted(i).x
        else if (sorted(i).isHorizontal) sorted(i + 1).y - sorted(i).y
        else throw new IllegalArgumentException(s"line neither v nor h: ${sorted(i)}")
      if (gap > gapThreshold) {
        out += cur.result()
        cur = Vector.newBuilder[TLine]
      }
      cur += sorted(i + 1)
    }
    out += cur.result()
    out.result()
  }

  /** filter_central_v_line (:218-254): drop vertical-line clusters that lie
    * entirely within width/2 ± 100 — the 2-column gutter rule (F4). */
  def filterCentralVLine(vLines: Vector[TLine], imgWidth: Int): Vector[TLine] = {
    val clusters = findLinesClusters(vLines, gapThreshold = 10)
    val centre = clusters.filter(_.forall(l =>
      imgWidth / 2.0 - 100 < l.x && l.x < imgWidth / 2.0 + 100)).flatten.toSet
    if (centre.isEmpty) vLines else vLines.filterNot(centre.contains)
  }

  /** find_table_bounding_boxes (:80-131): close(10,10) the grid, take
    * connected blobs with w>185 && h>100 (F6). */
  def findTableBoundingBoxes(grid: Bin): Vector[BBox] = {
    val closed = Morph.close(grid, 10, 10)
    ConnectedComponents.label(closed).iterator
      .map(_.bbox)
      .filter(b => b.w > 185 && b.h > 100)
      .toVector
  }

  /** detect_table_from_image_data (:257-384): page-level table boxes.
    * Deterministic output order (y, x) replaces the reference's uuid keys. */
  def detectTables(gray: Gray): Vector[BBox] = {
    val W = gray.w
    val H = gray.h
    val (grid, vRaw, hRaw) = coreLineDetection(gray, kernelSize = 5, minLineRatio = 0.05)
    // F3 size/border filters (:292-312) — v-line ratio bug kept as-is
    val hLines = hRaw.filter(l =>
      l.length > 0.137 * W &&
      0.003 * H < l.y && l.y < H * (1 - 0.003))
    val vLines0 = vRaw.filter(l =>
      l.length > 0.087 && // quirk: raw constant, not * H (:307)
      0.0048 * W < l.x && l.x < W * (1 - 0.0048))
    val vLines = filterCentralVLine(vLines0, W)
    // mask the grid to surviving lines (:325-330)
    val mask = new Array[Boolean](W * H)
    def paint(l: TLine): Unit = {
      var y = l.y
      while (y < l.y + l.h) {
        var x = l.x
        while (x < l.x + l.w) { mask(y * W + x) = true; x += 1 }
        y += 1
      }
    }
    hLines.foreach(paint)
    vLines.foreach(paint)
    val masked = new Array[Boolean](W * H)
    var i = 0
    while (i < masked.length) { masked(i) = grid.b(i) && mask(i); i += 1 }
    val tableBoxes = findTableBoundingBoxes(new Bin(W, H, masked))
    // F5 line-count admission (:336-367)
    tableBoxes.filter { b =>
      val (bx, by, bw, bh) = (b.x1, b.y1, b.w, b.h)
      val hCount = hLines.count(l =>
        bx < l.center && l.center < bx + bw &&
        by < l.y && l.y < by + bh &&
        by + 15 < l.y && l.y < by + bh - 15)
      val vCount = vLines.count(l =>
        bx < l.x && l.x < bx + bw &&
        by < l.center && l.center < by + bh &&
        l.length.toDouble / bh > 0.5 &&
        bx + 15 < l.x && l.x < bx + bw - 15)
      (hCount >= 1 && vCount >= 1) || hCount + vCount > 4
    }.sortBy(b => (b.y1, b.x1))
  }

  /** remove_line_duplicates (:461-481): within each cluster (sorted by the
    * secondary axis) keep a line only if it differs from the immediately
    * previous line by more than tolerance. prev updates on every element —
    * the reference's exact (quirky) semantics. */
  def removeLineDuplicates(clusters: Vector[Vector[TLine]], tolerance: Int = 5)
      : Vector[Vector[TLine]] =
    clusters.map { cluster =>
      if (cluster.size <= 1) cluster
      else {
        val sorted = cluster.sortBy(l => if (l.isVertical) l.y else l.x)
        val out = Vector.newBuilder[TLine]
        out += sorted.head
        var prev = sorted.head
        for (l <- sorted.tail) {
          val keep =
            if (l.isVertical) math.abs(l.y - prev.y) > tolerance
            else math.abs(l.x - prev.x) > tolerance
          if (keep) out += l
          prev = l // quirk: updates even when dropped (:480)
        }
        out.result()
      }
    }

  /** get_minimal_line_diff_distance (:547-563): min gap between consecutive
    * CLUSTER REPRESENTATIVES (first line of each cluster), across both
    * orientations; seeded with 1000. */
  def minimalLineDiffDistance(vClusters: Vector[Vector[TLine]],
                              hClusters: Vector[Vector[TLine]]): Int = {
    require(hClusters.size > 1 && vClusters.size > 1,
            "need at least 2 clusters per orientation")
    var cur = 1000
    for (i <- 1 until vClusters.length)
      cur = math.min(cur, math.abs(vClusters(i - 1).head.x - vClusters(i).head.x))
    for (i <- 1 until hClusters.length)
      cur = math.min(cur, math.abs(hClusters(i - 1).head.y - hClusters(i).head.y))
    cur
  }

  /** detect_table_cells (:484-638): T11 Otsu preprocess → line detection
    * with close-gaps → border injection → gap clustering (A2) → proximity
    * dedup (A3) → adaptive close kernel from min line distance (A4) →
    * connected regions and their holes → F7 size filter. Returns cell
    * boxes in page coordinates, sorted (y, x). */
  def detectTableCells(gray: Gray, table: BBox): Vector[BBox] = {
    val tW = table.w
    val tH = table.h
    val cropped = gray.crop(graft.core.Crop(
      top = table.y1, left = table.x1,
      right = gray.w - table.x2, bottom = gray.h - table.y2))

    // preprocess_for_lines (:507-529)
    val thresh = Otsu.binarizeInv(cropped)
    val hClean = Morph.open(thresh, 15, 1)
    val vClean = Morph.open(thresh, 1, 15)
    val cleaned = Morph.or(hClean, vClean)
    // feed as 0/255 grayscale into the line detector (:530-534)
    val asGray = {
      val px = new Array[Byte](cleaned.b.length)
      var i = 0
      while (i < px.length) { px(i) = if (cleaned.b(i)) 255.toByte else 0; i += 1 }
      new Gray(cleaned.w, cleaned.h, px)
    }
    val (_, vRaw, hRaw) = coreLineDetection(asGray, kernelSize = 3,
      minLineRatio = 0.03, closeGaps = true)

    var v = vRaw.sortBy(_.x)
    var h = hRaw.sortBy(_.y)
    // border-line injection (:490-497, :540-543); insert(-1, x) puts the
    // right/bottom border second-to-last (python quirk, kept)
    val left = TLine(0, 0, 5, tH)
    val top = TLine(0, 0, tW, 5)
    val right = TLine(tW - 10, 0, 5, tH)
    val bottom = TLine(0, tH - 10, tW, 5)
    v = left +: v
    h = top +: h
    v = if (v.size <= 1) v :+ right else (v.init :+ right) :+ v.last
    h = if (h.size <= 1) h :+ bottom else (h.init :+ bottom) :+ h.last

    // A2 gap clustering — axes crossed exactly as the reference (:566-567)
    val vClusters0 = findLinesClusters(v, 0.01 * tH)
    val hClusters0 = findLinesClusters(h, 0.01 * tW)
    // A3 proximity dedup (:576-577)
    val vClusters = removeLineDuplicates(vClusters0)
    val hClusters = removeLineDuplicates(hClusters0)

    val allLines = vClusters.flatten ++ hClusters.flatten
    // display_lines (:444-458): each line drawn as (length x 5) / (5 x length)
    val linesImg = new Array[Boolean](tW * tH)
    for (l <- allLines) {
      val lw = if (l.isHorizontal) l.length else 5
      val lh = if (l.isVertical) l.length else 5
      var y = l.y
      while (y < math.min(tH, l.y + lh)) {
        var x = l.x
        while (x < math.min(tW, l.x + lw)) {
          if (x >= 0 && y >= 0) linesImg(y * tW + x) = true
          x += 1
        }
        y += 1
      }
    }

    // A4 adaptive close kernel (:597-616)
    var minDist = minimalLineDiffDistance(vClusters, hClusters)
    if (minDist <= 10) minDist = 15
    val k = math.abs(minDist - 10)
    val closed = Morph.close(new Bin(tW, tH, linesImg), k, k)

    // RETR_LIST contours = white blobs AND their holes; the cells are the
    // holes of the closed lattice. Holes = black components not touching
    // the border, bbox expanded 1px (contour sits on the white boundary).
    val blobs = ConnectedComponents.label(closed).map(_.bbox)
    val invB = new Array[Boolean](closed.b.length)
    var i = 0
    while (i < invB.length) { invB(i) = !closed.b(i); i += 1 }
    val holes = ConnectedComponents.label(new Bin(tW, tH, invB)).iterator
      .map(_.bbox)
      .filterNot(b => b.x1 == 0 || b.y1 == 0 || b.x2 == tW || b.y2 == tH)
      .map(b => BBox(math.max(0, b.x1 - 1), math.max(0, b.y1 - 1),
                     math.min(tW, b.x2 + 1), math.min(tH, b.y2 + 1)))
      .toVector

    // F7 size filters (:629-634) + translate back to page coords (:633)
    (blobs.toVector ++ holes)
      .filterNot(b => b.w.toDouble / tW < 0.025 || b.h.toDouble / tH < 0.015)
      .filter(b => b.w < tW * 0.95 || b.h < tH * 0.95)
      .map(b => BBox(b.x1 + table.x1, b.y1 + table.y1,
                     b.x2 + table.x1, b.y2 + table.y1))
      .sortBy(b => (b.y1, b.x1))
  }
}
