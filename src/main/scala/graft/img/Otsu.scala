package graft.img

/** Histogram-based Otsu thresholding, inverse-binary convention:
  * pixels <= threshold (dark/ink) become foreground. Semantics contract
  * from the reference's cv2.threshold(gray, 0, 255,
  * THRESH_BINARY_INV + THRESH_OTSU) at table_detection.py:513.
  * Pure integer arithmetic on the between-class variance numerator —
  * bit-stable across JVMs and partition counts (SURVEY §7.5 item 1).
  */
object Otsu {

  /** Otsu threshold t: maximizes between-class variance; first maximum
    * wins (deterministic tie-break). */
  def threshold(g: Gray): Int = {
    val hist = new Array[Long](256)
    var i = 0
    while (i < g.px.length) { hist(g.px(i) & 0xFF) += 1; i += 1 }
    val total = g.px.length.toLong
    var sumAll = 0L
    i = 0
    while (i < 256) { sumAll += i.toLong * hist(i); i += 1 }
    var wB = 0L      // background (dark class) weight
    var sumB = 0L
    var best = -1.0
    var bestT = 0
    var t = 0
    while (t < 256) {
      wB += hist(t)
      if (wB != 0L && wB != total) {
        sumB += t.toLong * hist(t)
        val wF = total - wB
        val mB = sumB.toDouble / wB
        val mF = (sumAll - sumB).toDouble / wF
        val between = wB.toDouble * wF.toDouble * (mB - mF) * (mB - mF)
        if (between > best) { best = between; bestT = t }
      } else if (wB != 0L) {
        sumB += t.toLong * hist(t)
      }
      t += 1
    }
    bestT
  }

  /** THRESH_BINARY_INV + THRESH_OTSU: ink = px <= t. */
  def binarizeInv(g: Gray, out0: Array[Boolean] = null): Bin = {
    val t = threshold(g)
    val out = if (out0 != null) out0 else new Array[Boolean](g.px.length)
    var i = 0
    while (i < g.px.length) { out(i) = (g.px(i) & 0xFF) <= t; i += 1 }
    new Bin(g.w, g.h, out)
  }
}
