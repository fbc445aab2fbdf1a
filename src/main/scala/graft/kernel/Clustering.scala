package graft.kernel

/** 1-D gap-threshold clustering + proximity dedup — direct semantic ports
  * of the reference's sorting-based helpers (A2/A3 in SURVEY §2.5):
  *  - cluster: table_detection/table_detection.py:387-441 (sort by axis
  *    coord :409-412; break cluster when next - cur > gap :419-438)
  *  - dedupByProximity: table_detection.py:461-481 (within a sorted run,
  *    keep an element only if it differs from the previously kept one by
  *    more than the tolerance)
  * Also exactly Spark's session_window gap semantics; the relational form
  * (lag + cumulative sum) is exposed as the q7_gap_cluster query.
  */
object Clustering {

  /** Group sorted-by-key elements into clusters broken at gaps > gap.
    * Input order does not matter (internally sorted, like the reference). */
  def cluster[T](xs: Seq[T], gap: Int)(key: T => Int): Vector[Vector[T]] = {
    if (xs.isEmpty) return Vector.empty
    val sorted = xs.sortBy(key) // scala stable sort — matches Python sorted()
    val out = Vector.newBuilder[Vector[T]]
    var cur = Vector.newBuilder[T]
    var prev = key(sorted.head)
    cur += sorted.head
    for (x <- sorted.tail) {
      val k = key(x)
      if (k - prev > gap) {
        out += cur.result()
        cur = Vector.newBuilder[T]
      }
      cur += x
      prev = k
    }
    out += cur.result()
    out.result()
  }

  /** Keep an element only if its key differs from the previously *kept*
    * element's key by more than tol (elements must be pre-sorted by key). */
  def dedupByProximity[T](sorted: Seq[T], tol: Int)(key: T => Int): Vector[T] = {
    if (sorted.isEmpty) return Vector.empty
    val out = Vector.newBuilder[T]
    out += sorted.head
    var prev = key(sorted.head)
    for (x <- sorted.tail) {
      val k = key(x)
      if (math.abs(k - prev) > tol) { out += x; prev = k }
    }
    out.result()
  }
}
