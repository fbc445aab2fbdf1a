package graft.img

/** Per-thread exact-size plane buffers for the kernel hot path. The page
  * kernel is memory-bandwidth-bound; fresh allocation doubles the traffic
  * (JVM zeroing) and feeds the GC at multi-GB/s under 32 threads, which is
  * what kills N→4N scaling (SURVEY §7.5 item 5). Buffers are keyed by
  * (site, length) so each call site reuses one buffer per thread; page
  * geometries are fixed per crop config, so the pool stays bounded.
  *
  * Contract: a plane obtained here is valid until the same (key, length)
  * is requested again on the same thread — callers must fully overwrite it
  * (or clear it) before use.
  */
object PlanePool {
  private val tl = new ThreadLocal[java.util.HashMap[String, AnyRef]] {
    override def initialValue() = new java.util.HashMap[String, AnyRef]
  }

  def bytes(key: String, len: Int): Array[Byte] = {
    val m = tl.get
    val k = key + ":" + len
    m.get(k) match {
      case a: Array[Byte] => a
      case _ => val a = new Array[Byte](len); m.put(k, a); a
    }
  }

  def bools(key: String, len: Int): Array[Boolean] = {
    val m = tl.get
    val k = key + ":" + len
    m.get(k) match {
      case a: Array[Boolean] => a
      case _ => val a = new Array[Boolean](len); m.put(k, a); a
    }
  }

  def chars(key: String, len: Int): Array[Char] = {
    val m = tl.get
    val k = key + ":" + len
    m.get(k) match {
      case a: Array[Char] => a
      case _ => val a = new Array[Char](len); m.put(k, a); a
    }
  }

  def ints(key: String, len: Int): Array[Int] = {
    val m = tl.get
    val k = key + ":" + len
    m.get(k) match {
      case a: Array[Int] => a
      case _ => val a = new Array[Int](len); m.put(k, a); a
    }
  }

  /** A growable int scratch array (contents NOT cleared). */
  def intScratch(key: String, minLen: Int): Array[Int] = {
    val m = tl.get
    m.get(key) match {
      case a: Array[Int] if a.length >= minLen => a
      case old: Array[Int] =>
        val a = new Array[Int](math.max(minLen, old.length * 2))
        m.put(key, a); a
      case _ =>
        val a = new Array[Int](math.max(minLen, 1 << 14)); m.put(key, a); a
    }
  }
}
