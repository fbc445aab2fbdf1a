package graft.img

import graft.core.BBox
import scala.collection.mutable.ArrayBuffer

/** A labeled connected component: tight bbox + pixel count. */
case class Comp(bbox: BBox, area: Int)

/** Two-pass 8-connectivity connected-component labeling with union-find.
  * The classical stand-in for cv2.findContours-based region extraction
  * (table_detection.py:120-126, :205-214) and the basis of line/word
  * segmentation in the recognition kernel (north_star: "connected-component
  * line/word segmentation").
  */
object ConnectedComponents {

  def label(src: Bin): IndexedSeq[Comp] = {
    val w = src.w; val h = src.h
    val lab = new Array[Int](w * h) // 0 = background
    var next = 1
    var parent = new Array[Int](1024)

    @inline def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    @inline def union(a: Int, b: Int): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }

    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        if (src.b(y * w + x)) {
          // neighbors already visited in raster order: W, NW, N, NE
          var m = 0
          @inline def consider(l: Int): Unit =
            if (l != 0) { if (m == 0) m = l else union(m, l) }
          if (x > 0) consider(lab(y * w + x - 1))
          if (y > 0) {
            if (x > 0) consider(lab((y - 1) * w + x - 1))
            consider(lab((y - 1) * w + x))
            if (x < w - 1) consider(lab((y - 1) * w + x + 1))
          }
          if (m == 0) {
            if (next >= parent.length) parent = java.util.Arrays.copyOf(parent, parent.length * 2)
            parent(next) = next
            m = next
            next += 1
          }
          lab(y * w + x) = m
        }
        x += 1
      }
      y += 1
    }

    // second pass: resolve roots, accumulate bbox + area per root
    val minX = new Array[Int](next); java.util.Arrays.fill(minX, Int.MaxValue)
    val minY = new Array[Int](next); java.util.Arrays.fill(minY, Int.MaxValue)
    val maxX = new Array[Int](next); java.util.Arrays.fill(maxX, -1)
    val maxY = new Array[Int](next); java.util.Arrays.fill(maxY, -1)
    val cnt = new Array[Int](next)
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val l = lab(y * w + x)
        if (l != 0) {
          val r = find(l)
          if (x < minX(r)) minX(r) = x
          if (x > maxX(r)) maxX(r) = x
          if (y < minY(r)) minY(r) = y
          if (y > maxY(r)) maxY(r) = y
          cnt(r) += 1
        }
        x += 1
      }
      y += 1
    }
    val out = new ArrayBuffer[Comp]
    var i = 1
    while (i < next) {
      if (cnt(i) > 0)
        out += Comp(BBox(minX(i), minY(i), maxX(i) + 1, maxY(i) + 1), cnt(i))
      i += 1
    }
    // deterministic order: raster by (y1, x1, x2, y2)
    out.sortBy(c => (c.bbox.y1, c.bbox.x1, c.bbox.x2, c.bbox.y2)).toIndexedSeq
  }
}
