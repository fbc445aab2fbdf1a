package graft.synth

import graft.img.Gray

/** Minimal deterministic image codec for the opaque-binary multimodal
  * column path: `GP1 | w:int32BE | h:int32BE | pixels`. The container
  * ships no real image libraries (SURVEY env facts), so this stands in
  * for JPEG/PNG at the decode SEAM — the Spark-side plumbing an engine
  * needs for binary media columns (schema, typed metadata, per-partition
  * decode) is identical whichever codec sits behind it. */
object GrayPack {
  val Magic: Array[Byte] = "GP1".getBytes("US-ASCII")

  def encode(g: Gray): Array[Byte] = {
    val out = new Array[Byte](3 + 8 + g.px.length)
    System.arraycopy(Magic, 0, out, 0, 3)
    writeInt(out, 3, g.w)
    writeInt(out, 7, g.h)
    System.arraycopy(g.px, 0, out, 11, g.px.length)
    out
  }

  def decode(bytes: Array[Byte]): Gray = {
    require(bytes.length >= 11 &&
            bytes(0) == Magic(0) && bytes(1) == Magic(1) && bytes(2) == Magic(2),
            s"not a GP1 payload (${bytes.take(3).mkString(",")})")
    val w = readInt(bytes, 3)
    val h = readInt(bytes, 7)
    require(bytes.length == 11 + w * h, s"truncated GP1 payload ${w}x$h")
    val px = new Array[Byte](w * h)
    System.arraycopy(bytes, 11, px, 0, px.length)
    new Gray(w, h, px)
  }

  private def writeInt(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >>> 24).toByte; a(off + 1) = (v >>> 16).toByte
    a(off + 2) = (v >>> 8).toByte; a(off + 3) = v.toByte
  }
  private def readInt(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xFF) << 24) | ((a(off + 1) & 0xFF) << 16) |
    ((a(off + 2) & 0xFF) << 8) | (a(off + 3) & 0xFF)
}
