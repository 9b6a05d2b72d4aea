package graft.dom

/** Reusable UTF-8 output buffer: the extraction hot path encodes text
  * straight from arena chars to UTF-8 bytes, skipping the
  * StringBuilder -> String -> UTF8String re-encoding passes (each a full
  * walk over the output). */
final class Utf8Builder(initial: Int = 1 << 14) {
  var buf: Array[Byte] = new Array[Byte](initial)
  var len: Int = 0

  def reset(): Unit = len = 0

  private def ensure(extra: Int): Unit = {
    val need = len + extra
    if (need > buf.length) {
      var cap = buf.length * 2
      while (cap < need) cap *= 2
      buf = java.util.Arrays.copyOf(buf, cap)
    }
  }

  def appendCodePoint(cp: Int): Unit = {
    ensure(4)
    if (cp < 0x80) { buf(len) = cp.toByte; len += 1 }
    else if (cp < 0x800) {
      buf(len) = (0xc0 | (cp >> 6)).toByte
      buf(len + 1) = (0x80 | (cp & 0x3f)).toByte
      len += 2
    } else if (cp < 0x10000) {
      buf(len) = (0xe0 | (cp >> 12)).toByte
      buf(len + 1) = (0x80 | ((cp >> 6) & 0x3f)).toByte
      buf(len + 2) = (0x80 | (cp & 0x3f)).toByte
      len += 3
    } else {
      buf(len) = (0xf0 | (cp >> 18)).toByte
      buf(len + 1) = (0x80 | ((cp >> 12) & 0x3f)).toByte
      buf(len + 2) = (0x80 | ((cp >> 6) & 0x3f)).toByte
      buf(len + 3) = (0x80 | (cp & 0x3f)).toByte
      len += 4
    }
  }

  /** append UTF-16 chars [from, until) encoding to UTF-8. */
  def appendChars(s: Array[Char], from: Int, until: Int): Unit = {
    ensure((until - from) * 3 + 4)
    var i = from
    var o = len
    val b = buf
    while (i < until) {
      val c = s(i)
      if (c < 0x80) { b(o) = c.toByte; o += 1; i += 1 }
      else if (c < 0x800) {
        b(o) = (0xc0 | (c >> 6)).toByte
        b(o + 1) = (0x80 | (c & 0x3f)).toByte
        o += 2; i += 1
      } else if (Character.isHighSurrogate(c) && i + 1 < until && Character.isLowSurrogate(s(i + 1))) {
        val cp = Character.toCodePoint(c, s(i + 1))
        b(o) = (0xf0 | (cp >> 18)).toByte
        b(o + 1) = (0x80 | ((cp >> 12) & 0x3f)).toByte
        b(o + 2) = (0x80 | ((cp >> 6) & 0x3f)).toByte
        b(o + 3) = (0x80 | (cp & 0x3f)).toByte
        o += 4; i += 2
      } else {
        b(o) = (0xe0 | (c >> 12)).toByte
        b(o + 1) = (0x80 | ((c >> 6) & 0x3f)).toByte
        b(o + 2) = (0x80 | (c & 0x3f)).toByte
        o += 3; i += 1
      }
    }
    len = o
  }

  def appendString(s: String): Unit = {
    val arr = s.toCharArray
    appendChars(arr, 0, arr.length)
  }

  /** raw UTF-8 bytes — memcpy (hot path for entity-free text runs). */
  def appendBytes(src: Array[Byte], off: Int, count: Int): Unit = {
    ensure(count)
    System.arraycopy(src, off, buf, len, count)
    len += count
  }

  def toBytes: Array[Byte] = java.util.Arrays.copyOf(buf, len)
}
