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
    val mid = horiz(src, kw, all = true)
    vert(mid, kh, all = true)
  }

  def dilate(src: Bin, kw: Int, kh: Int): Bin = {
    val mid = horiz(src, kw, all = false)
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
  private def horiz(src: Bin, k: Int, all: Boolean): Bin = {
    if (k <= 1) return src
    val w = src.w; val h = src.h
    val out = new Array[Boolean](w * h)
    val lo = (k - 1) / 2
    val hi = k / 2
    var y = 0
    while (y < h) {
      val base = y * w
      // count of true in window
      var cnt = 0
      var x = -lo
      // init window for x=0: [-lo, hi]
      var j = -lo
      while (j <= hi) { if (j >= 0 && j < w && src.b(base + j)) cnt += 1; j += 1 }
      x = 0
      while (x < w) {
        val win = math.min(w - 1, x + hi) - math.max(0, x - lo) + 1
        out(base + x) = if (all) cnt == win else cnt > 0
        // slide: remove x-lo, add x+1+hi
        val rem = x - lo
        if (rem >= 0 && rem < w && src.b(base + rem)) cnt -= 1
        val add = x + 1 + hi
        if (add >= 0 && add < w && src.b(base + add)) cnt += 1
        x += 1
      }
      y += 1
    }
    new Bin(w, h, out)
  }

  private def vert(src: Bin, k: Int, all: Boolean): Bin = {
    if (k <= 1) return src
    val w = src.w; val h = src.h
    val out = new Array[Boolean](w * h)
    val lo = (k - 1) / 2
    val hi = k / 2
    var x = 0
    while (x < w) {
      var cnt = 0
      var j = -lo
      while (j <= hi) { if (j >= 0 && j < h && src.b(j * w + x)) cnt += 1; j += 1 }
      var y = 0
      while (y < h) {
        val win = math.min(h - 1, y + hi) - math.max(0, y - lo) + 1
        out(y * w + x) = if (all) cnt == win else cnt > 0
        val rem = y - lo
        if (rem >= 0 && rem < h && src.b(rem * w + x)) cnt -= 1
        val add = y + 1 + hi
        if (add >= 0 && add < h && src.b(add * w + x)) cnt += 1
        y += 1
      }
      x += 1
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
