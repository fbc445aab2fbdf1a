package graft.img

/** Integer Sobel gradients + absolute threshold, the core of the classical
  * rule-line detector (cv2.Sobel → abs → threshold@200,
  * table_detection/table_detection.py:134-165; ksize 5 for page-level
  * detection :276, ksize 3 for cells :533). Border pixels use clamped
  * (replicated) coordinates like cv2.BORDER_REPLICATE; magnitudes saturate
  * at 255, which preserves the only downstream test (> 200). All integer →
  * bit-stable.
  *
  * r6: the convolution runs as the SEPARABLE two-pass form (horizontal
  * kx pass into a pooled int plane, then vertical ky pass) — ksize² MACs
  * per pixel drop to 2·ksize, and the interior skips the per-access
  * clamp branches. Bit-identical to the direct 2-D form: the kernel is
  * an outer product kx⊗ky, integer addition is associative, and
  * BORDER_REPLICATE clamps x and y independently, so
  * Σ_dy ky·Σ_dx kx·p(clampX(x+dx), clampY(y+dy)) factors exactly.
  * Intermediate magnitudes are ≤ 255·16·6 — far inside int range, no
  * saturation before the final abs.
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
    val px = g.px
    // pass 1: horizontal kx over clamped x, per actual row → int plane
    // (pooled: conv output is consumed immediately by thresholdAbove, and
    // the tmp plane is dead once pass 2 ends)
    val tmp = PlanePool.ints("sobel.tmp", w * h)
    val xInteriorEnd = w - r // interior = [r, w-r): no clamping needed
    var y = 0
    while (y < h) {
      val base = y * w
      var x = 0
      while (x < w && x < r) { // left border (clamped)
        var v = 0; var i = 0
        while (i < ksize) {
          var cx = x + i - r
          if (cx < 0) cx = 0 else if (cx >= w) cx = w - 1
          v += kx(i) * (px(base + cx) & 0xFF)
          i += 1
        }
        tmp(base + x) = v
        x += 1
      }
      if (ksize == 5) { // interior, taps in scalars (r6: JIT-friendly)
        val k0 = kx(0); val k1 = kx(1); val k2 = kx(2)
        val k3 = kx(3); val k4 = kx(4)
        while (x < xInteriorEnd) {
          val i0 = base + x - 2
          tmp(base + x) =
            k0 * (px(i0) & 0xFF) + k1 * (px(i0 + 1) & 0xFF) +
            k2 * (px(i0 + 2) & 0xFF) + k3 * (px(i0 + 3) & 0xFF) +
            k4 * (px(i0 + 4) & 0xFF)
          x += 1
        }
      } else { // ksize == 3
        val k0 = kx(0); val k1 = kx(1); val k2 = kx(2)
        while (x < xInteriorEnd) {
          val i0 = base + x - 1
          tmp(base + x) =
            k0 * (px(i0) & 0xFF) + k1 * (px(i0 + 1) & 0xFF) +
            k2 * (px(i0 + 2) & 0xFF)
          x += 1
        }
      }
      while (x < w) { // right border (clamped)
        var v = 0; var i = 0
        while (i < ksize) {
          var cx = x + i - r
          if (cx < 0) cx = 0 else if (cx >= w) cx = w - 1
          v += kx(i) * (px(base + cx) & 0xFF)
          i += 1
        }
        tmp(base + x) = v
        x += 1
      }
      y += 1
    }
    // pass 2: vertical ky over clamped y, row-sequential (each output row
    // reads ksize source rows linearly), then abs + saturate
    val rowBase = new Array[Int](ksize)
    y = 0
    while (y < h) {
      val base = y * w
      var i = 0
      while (i < ksize) {
        var cy = y + i - r
        if (cy < 0) cy = 0 else if (cy >= h) cy = h - 1
        rowBase(i) = cy * w
        i += 1
      }
      var x = 0
      if (ksize == 5) { // taps + row bases in scalars (r6)
        val k0 = ky(0); val k1 = ky(1); val k2 = ky(2)
        val k3 = ky(3); val k4 = ky(4)
        val r0 = rowBase(0); val r1 = rowBase(1); val r2 = rowBase(2)
        val r3 = rowBase(3); val r4 = rowBase(4)
        while (x < w) {
          val v = k0 * tmp(r0 + x) + k1 * tmp(r1 + x) + k2 * tmp(r2 + x) +
                  k3 * tmp(r3 + x) + k4 * tmp(r4 + x)
          val a = if (v < 0) -v else v
          out(base + x) = (if (a > 255) 255 else a).toByte
          x += 1
        }
      } else { // ksize == 3
        val k0 = ky(0); val k1 = ky(1); val k2 = ky(2)
        val r0 = rowBase(0); val r1 = rowBase(1); val r2 = rowBase(2)
        while (x < w) {
          val v = k0 * tmp(r0 + x) + k1 * tmp(r1 + x) + k2 * tmp(r2 + x)
          val a = if (v < 0) -v else v
          out(base + x) = (if (a > 255) 255 else a).toByte
          x += 1
        }
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
