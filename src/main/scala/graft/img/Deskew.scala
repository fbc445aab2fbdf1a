package graft.img

/** Small-angle deskew (north_star "deskew" stage; SURVEY §7.3
  * "Recognition"): scanned pages arrive with a small shear — the
  * small-angle model of page rotation (sin θ ≈ tan θ for |θ| <= ~2°),
  * which real deskewers exploit because a shear, unlike a rotation, is
  * exactly invertible on the pixel grid. Slopes are integers in units of
  * 1/256 (slope s ⟺ tan θ = s/256; ±9 ≈ ±2.0°).
  *
  * Estimation is the classical projection-profile sharpness search: for
  * each candidate slope remove the shear and score the row-ink histogram
  * by Σ count² — text rows snap into narrow bands exactly at the true
  * slope. Integer-only; ties prefer the smaller |slope| (an unskewed page
  * must come back 0, SURVEY §7.5 determinism).
  */
object Deskew {

  /** Search range in 1/256 slope units. */
  val MaxSlope = 9

  /** Vertical displacement of column x under slope s, centered so the
    * page midline is the rotation axis (keeps |dy| within the crop
    * margins). The renderer and the inverse below share this exact
    * integer formula — that is what makes deskew lossless. */
  @inline def shearDy(x: Int, w: Int, s: Int): Int =
    Math.floorDiv((x - w / 2) * s, 256)

  /** Estimated slope of `b` (the value to pass to [[unshear]]). */
  def estimateSlope(b: Bin): Int = {
    // ink coordinates once; each candidate is then a cheap histogram pass
    val n = b.inkCount
    if (n == 0) return 0
    val xs = new Array[Int](n)
    val ys = new Array[Int](n)
    var i = 0
    var k = 0
    while (i < b.b.length) {
      if (b.b(i)) { xs(k) = i % b.w; ys(k) = i / b.w; k += 1 }
      i += 1
    }
    val hist = new Array[Int](b.h + 2 * MaxSlope * 2 + 4)
    val off = MaxSlope * 2 + 2 // dy range is well inside ±2*MaxSlope
    var best = 0
    var bestScore = -1L
    var s = -MaxSlope
    while (s <= MaxSlope) {
      java.util.Arrays.fill(hist, 0)
      var j = 0
      while (j < n) {
        hist(ys(j) - shearDy(xs(j), b.w, s) + off) += 1
        j += 1
      }
      var score = 0L
      var r = 0
      while (r < hist.length) { val c = hist(r); score += c.toLong * c; r += 1 }
      if (score > bestScore ||
          (score == bestScore && math.abs(s) < math.abs(best))) {
        bestScore = score
        best = s
      }
      s += 1
    }
    best
  }

  /** Remove shear of slope `s`: out(x, y) = b(x, y + dy(x)) — the exact
    * inverse of the forward shear S(x, y') = O(x, y' - dy(x)); rows
    * shifted out of range read as blank. */
  def applyUnshear(b: Bin, s: Int, out0: Array[Boolean] = null): Bin = {
    if (s == 0) return b
    val out = if (out0 != null) out0 else new Array[Boolean](b.b.length)
    var x = 0
    while (x < b.w) {
      val dy = shearDy(x, b.w, s)
      var y = 0
      while (y < b.h) {
        val sy = y + dy
        out(y * b.w + x) =
          sy >= 0 && sy < b.h && b.b(sy * b.w + x)
        y += 1
      }
      x += 1
    }
    new Bin(b.w, b.h, out)
  }

  /** Estimate + remove: the deskew stage. */
  def unshear(b: Bin, out0: Array[Boolean] = null): Bin =
    applyUnshear(b, estimateSlope(b), out0)
}
