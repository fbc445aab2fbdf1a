package graft.img

import graft.core.Crop

/** 8-bit grayscale plane; px(y*w + x) ∈ [0,255]. Primitive Array[Int] —
  * no boxing in the kernel hot path (SURVEY.md §4 "codegen/vectorization").
  */
final class Gray(val w: Int, val h: Int, val px: Array[Int]) {
  require(px.length == w * h, s"plane size ${px.length} != ${w}x$h")

  @inline def apply(x: Int, y: Int): Int = px(y * w + x)

  /** Rotate counter-clockwise by deg ∈ {0, 90, 180, 270}. */
  def rotateCCW(deg: Int): Gray = deg match {
    case 0 => this
    case 90 =>
      val out = new Array[Int](px.length)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out((w - 1 - x) * h + y) = px(y * w + x); x += 1 }
        y += 1
      }
      new Gray(h, w, out)
    case 180 =>
      val out = new Array[Int](px.length)
      var i = 0
      while (i < px.length) { out(px.length - 1 - i) = px(i); i += 1 }
      new Gray(w, h, out)
    case 270 =>
      val out = new Array[Int](px.length)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(x * h + (h - 1 - y)) = px(y * w + x); x += 1 }
        y += 1
      }
      new Gray(h, w, out)
    case d => throw new IllegalArgumentException(s"rotation $d")
  }

  /** Crop margins, bounds-validated (classes/pdf_parser.py:386-409). */
  def crop(c: Crop): Gray = {
    val nw = w - c.left - c.right
    val nh = h - c.top - c.bottom
    require(nw > 0 && nh > 0, s"crop $c exceeds image ${w}x$h")
    val out = new Array[Int](nw * nh)
    var y = 0
    while (y < nh) {
      System.arraycopy(px, (y + c.top) * w + c.left, out, y * nw, nw)
      y += 1
    }
    new Gray(nw, nh, out)
  }

  /** Integer box-mean downsample by exact factor k — the deterministic
    * replacement for the reference's LANCZOS resize-to-height
    * (classes/pdf_parser.py:44-59; SURVEY §7.5 item 1: bit-exact resize).
    * Requires w % k == 0 && h % k == 0.
    */
  def downsample(k: Int): Gray = {
    require(w % k == 0 && h % k == 0, s"${w}x$h not divisible by $k")
    val nw = w / k
    val nh = h / k
    val out = new Array[Int](nw * nh)
    val area = k * k
    var oy = 0
    while (oy < nh) {
      var ox = 0
      while (ox < nw) {
        var s = 0
        var dy = 0
        while (dy < k) {
          var dx = 0
          val base = (oy * k + dy) * w + ox * k
          while (dx < k) { s += px(base + dx); dx += 1 }
          dy += 1
        }
        out(oy * nw + ox) = s / area
        ox += 1
      }
      oy += 1
    }
    new Gray(nw, nh, out)
  }

  /** Resize to target height by integer factor (height must be an exact
    * multiple). The reference scales every page to height 1500
    * (pdf_parser.py:54); our synthetic pages are rendered at 2x and come
    * back down through here.
    */
  def resizeToHeight(target: Int): Gray = {
    require(h % target == 0, s"height $h not an integer multiple of $target")
    downsample(h / target)
  }

  override def equals(o: Any): Boolean = o match {
    case g: Gray => g.w == w && g.h == h && java.util.Arrays.equals(g.px, px)
    case _ => false
  }
  override def hashCode: Int = (w, h, java.util.Arrays.hashCode(px)).hashCode
}

object Gray {
  def fill(w: Int, h: Int, v: Int): Gray = {
    val a = new Array[Int](w * h)
    java.util.Arrays.fill(a, v)
    new Gray(w, h, a)
  }
}
