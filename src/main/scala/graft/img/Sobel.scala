package graft.img

/** Integer Sobel gradients + absolute threshold, the core of the classical
  * rule-line detector (cv2.Sobel → abs → threshold@200,
  * table_detection/table_detection.py:134-165). Border pixels use clamped
  * (replicated) coordinates, matching cv2.BORDER_REPLICATE behavior closely
  * enough for our fixtures; all arithmetic is integer → bit-stable.
  */
object Sobel {

  /** |d/dx| with the 3x3 Sobel kernel, saturated to [0,255]*scale domain. */
  def absX(g: Gray): Gray = conv(g, vertical = false)

  /** |d/dy| with the 3x3 Sobel kernel. */
  def absY(g: Gray): Gray = conv(g, vertical = true)

  private def conv(g: Gray, vertical: Boolean): Gray = {
    val w = g.w; val h = g.h
    val out = new Array[Byte](w * h)
    @inline def p(x: Int, y: Int): Int = {
      val cx = if (x < 0) 0 else if (x >= w) w - 1 else x
      val cy = if (y < 0) 0 else if (y >= h) h - 1 else y
      g.px(cy * w + cx) & 0xFF
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v =
          if (!vertical)
            -p(x - 1, y - 1) + p(x + 1, y - 1) +
            -2 * p(x - 1, y) + 2 * p(x + 1, y) +
            -p(x - 1, y + 1) + p(x + 1, y + 1)
          else
            -p(x - 1, y - 1) - 2 * p(x, y - 1) - p(x + 1, y - 1) +
            p(x - 1, y + 1) + 2 * p(x, y + 1) + p(x + 1, y + 1)
        val a = math.abs(v)
        out(y * w + x) = (if (a > 255) 255 else a).toByte
        x += 1
      }
      y += 1
    }
    new Gray(w, h, out)
  }

  /** threshold: ink = px >= t (table_detection.py:148 uses 200). */
  def thresholdAbove(g: Gray, t: Int): Bin = {
    val out = new Array[Boolean](g.px.length)
    var i = 0
    while (i < out.length) { out(i) = (g.px(i) & 0xFF) >= t; i += 1 }
    new Bin(g.w, g.h, out)
  }
}
