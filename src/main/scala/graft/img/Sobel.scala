package graft.img

/** Integer Sobel gradients + absolute threshold, the core of the classical
  * rule-line detector (cv2.Sobel → abs → threshold@200,
  * table_detection/table_detection.py:134-165; ksize 5 for page-level
  * detection :276, ksize 3 for cells :533). Border pixels use clamped
  * (replicated) coordinates like cv2.BORDER_REPLICATE; magnitudes saturate
  * at 255, which preserves the only downstream test (> 200). All integer →
  * bit-stable.
  */
object Sobel {

  /** |d/dx| with the ksize x ksize Sobel kernel (ksize ∈ {3, 5}). */
  def absX(g: Gray, ksize: Int = 3): Gray = conv(g, vertical = false, ksize)

  /** |d/dy| with the ksize x ksize Sobel kernel. */
  def absY(g: Gray, ksize: Int = 3): Gray = conv(g, vertical = true, ksize)

  // separable kernels as in cv2.getDerivKernels(1, 0, ksize)
  private def derivK(ksize: Int): Array[Int] = ksize match {
    case 3 => Array(-1, 0, 1)
    case 5 => Array(-1, -2, 0, 2, 1)
    case k => throw new IllegalArgumentException(s"ksize $k")
  }
  private def smoothK(ksize: Int): Array[Int] = ksize match {
    case 3 => Array(1, 2, 1)
    case 5 => Array(1, 4, 6, 4, 1)
    case k => throw new IllegalArgumentException(s"ksize $k")
  }

  private def conv(g: Gray, vertical: Boolean, ksize: Int): Gray = {
    val w = g.w; val h = g.h
    val out = new Array[Byte](w * h)
    val kx = if (vertical) smoothK(ksize) else derivK(ksize)
    val ky = if (vertical) derivK(ksize) else smoothK(ksize)
    val r = ksize / 2
    @inline def p(x: Int, y: Int): Int = {
      val cx = if (x < 0) 0 else if (x >= w) w - 1 else x
      val cy = if (y < 0) 0 else if (y >= h) h - 1 else y
      g.px(cy * w + cx) & 0xFF
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var v = 0
        var dy = -r
        while (dy <= r) {
          var rowSum = 0
          var dx = -r
          while (dx <= r) {
            rowSum += kx(dx + r) * p(x + dx, y + dy)
            dx += 1
          }
          v += ky(dy + r) * rowSum
          dy += 1
        }
        val a = math.abs(v)
        out(y * w + x) = (if (a > 255) 255 else a).toByte
        x += 1
      }
      y += 1
    }
    new Gray(w, h, out)
  }

  /** cv2.threshold(..., t, 255, THRESH_BINARY): ink = px > t (strictly,
    * like OpenCV; table_detection.py:148 uses t=200). */
  def thresholdAbove(g: Gray, t: Int): Bin = {
    val out = new Array[Boolean](g.px.length)
    var i = 0
    while (i < out.length) { out(i) = (g.px(i) & 0xFF) > t; i += 1 }
    new Bin(g.w, g.h, out)
  }
}
