package graft.img

/** Binary morphology with rectangular structuring elements, implemented as
  * separable 1-D passes (O(w*h) via sliding run counting). Matches the
  * semantics of the reference's cv2.morphologyEx(MORPH_OPEN/MORPH_CLOSE,
  * rect kernel) calls in table_detection.py:167-192, 507-529.
  */
object Morph {

  /** Erode: output true iff every IN-BOUNDS pixel under the (kw x kh)
    * kernel is true — out-of-bounds counts as WHITE, exactly OpenCV's
    * erode default (BORDER_CONSTANT with morphologyDefaultBorderValue()
    * = +inf). The border semantics are load-bearing: the reference's
    * adaptive cell-lattice close (table_detection.py:616) relies on its
    * injected border lines SURVIVING the erode half of a large-kernel
    * close; a black-padded erode (the previous behavior here) wipes a
    * k/2 band at every border, eats the lattice frame, and every
    * peripheral cell hole then touches the image edge and is dropped —
    * observed as a 5x4 table collapsing to 6 interior cells. Dilate pads
    * black (OpenCV's -inf default), as before. */
  def erode(src: Bin, kw: Int, kh: Int): Bin = {
    val mid = horiz(src, kw, all = true, pooled = kh > 1)
    vert(mid, kh, all = true)
  }

  def dilate(src: Bin, kw: Int, kh: Int): Bin = {
    val mid = horiz(src, kw, all = false, pooled = kh > 1)
    vert(mid, kh, all = false)
  }

  /** Morphological open: erode then dilate. Removes features smaller than
    * the kernel; used to isolate horizontal/vertical rule lines with
    * (len,1)/(1,len) kernels (table_detection.py:167-179, 515-529). */
  def open(src: Bin, kw: Int, kh: Int): Bin = dilate(erode(src, kw, kh), kw, kh)

  /** Morphological close: dilate then erode. Bridges gaps up to kernel size
    * (close_gaps in table_detection.py:180-192, adaptive close :616). */
  def close(src: Bin, kw: Int, kh: Int): Bin = erode(dilate(src, kw, kh), kw, kh)

  // 1-D pass along rows: all=true → erosion (min), all=false → dilation (max).
  // Kernel window centered: [x - (k-1)/2, x + k/2] like OpenCV default anchor.
  // `pooled` (r6): when a real vertical pass follows, the horizontal
  // output is a dead intermediate the moment vert returns — a pooled
  // plane saves the alloc+zeroing bandwidth per call (SURVEY §7.5 item
  // 5). When kh <= 1 the "intermediate" IS the returned plane and must
  // stay fresh (vert k<=1 passes it through), so callers set pooled
  // only when vert will allocate. Every cell is overwritten below.
  private def horiz(src: Bin, k: Int, all: Boolean,
                    pooled: Boolean = false): Bin = {
    if (k <= 1) return src
    val w = src.w; val h = src.h
    val out = if (pooled) PlanePool.bools("morph.mid", w * h)
              else new Array[Boolean](w * h)
    val lo = (k - 1) / 2
    val hi = k / 2
    // r6: the slide loop is split into border segments (window clipped,
    // per-access bounds checks as before) and an interior segment where
    // the window is fully inside the row — win == k, both slide indices
    // in-bounds — so the hot span runs without min/max or bounds tests.
    // Same counts, identical output.
    val mainEnd = w - 1 - hi // for x < mainEnd, x+1+hi <= w-1
    var y = 0
    while (y < h) {
      val base = y * w
      // count of true in window
      var cnt = 0
      // init window for x=0: [-lo, hi]
      var j = 0
      while (j <= hi && j < w) { if (src.b(base + j)) cnt += 1; j += 1 }
      var x = 0
      while (x < w && x < lo) { // left border: window clipped at 0
        val win = math.min(w - 1, x + hi) + 1
        out(base + x) = if (all) cnt == win else cnt > 0
        val add = x + 1 + hi
        if (add < w && src.b(base + add)) cnt += 1
        x += 1
      }
      if (all) {
        while (x < mainEnd) {
          out(base + x) = cnt == k
          if (src.b(base + x - lo)) cnt -= 1
          if (src.b(base + x + 1 + hi)) cnt += 1
          x += 1
        }
      } else {
        while (x < mainEnd) {
          out(base + x) = cnt > 0
          if (src.b(base + x - lo)) cnt -= 1
          if (src.b(base + x + 1 + hi)) cnt += 1
          x += 1
        }
      }
      while (x < w) { // right border: window clipped at w-1
        val win = (w - 1) - math.max(0, x - lo) + 1
        out(base + x) = if (all) cnt == win else cnt > 0
        val rem = x - lo
        if (rem >= 0 && src.b(base + rem)) cnt -= 1
        x += 1
      }
      y += 1
    }
    new Bin(w, h, out)
  }

  // r6: row-sequential form of the same sliding-count pass — the old
  // column-major walk strided by `w` on every access (cache-hostile on
  // full-page planes); this keeps one pooled count per column and slides
  // the whole window down one row at a time, so every array access is
  // linear. Identical counts → identical output.
  private def vert(src: Bin, k: Int, all: Boolean): Bin = {
    if (k <= 1) return src
    val w = src.w; val h = src.h
    val out = new Array[Boolean](w * h)
    val lo = (k - 1) / 2
    val hi = k / 2
    val cnt = PlanePool.ints("morph.vcnt", w)
    java.util.Arrays.fill(cnt, 0, w, 0)
    // init window for y=0: rows [−lo, hi] ∩ [0, h)
    var j = 0
    while (j <= hi && j < h) {
      val base = j * w
      var x = 0
      while (x < w) { if (src.b(base + x)) cnt(x) += 1; x += 1 }
      j += 1
    }
    var y = 0
    while (y < h) {
      val win = math.min(h - 1, y + hi) - math.max(0, y - lo) + 1
      val base = y * w
      var x = 0
      if (all) {
        while (x < w) { out(base + x) = cnt(x) == win; x += 1 }
      } else {
        while (x < w) { out(base + x) = cnt(x) > 0; x += 1 }
      }
      val rem = y - lo
      if (rem >= 0 && rem < h) {
        val rb = rem * w
        x = 0
        while (x < w) { if (src.b(rb + x)) cnt(x) -= 1; x += 1 }
      }
      val add = y + 1 + hi
      if (add >= 0 && add < h) {
        val ab = add * w
        x = 0
        while (x < w) { if (src.b(ab + x)) cnt(x) += 1; x += 1 }
      }
      y += 1
    }
    new Bin(w, h, out)
  }

  /** OR of two planes (grid = h-lines + v-lines, table_detection.py:197). */
  def or(a: Bin, b: Bin): Bin = {
    require(a.w == b.w && a.h == b.h)
    val out = new Array[Boolean](a.b.length)
    var i = 0
    while (i < out.length) { out(i) = a.b(i) || b.b(i); i += 1 }
    new Bin(a.w, a.h, out)
  }
}
