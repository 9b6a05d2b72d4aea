package graft.spark

import java.nio.charset.StandardCharsets.ISO_8859_1
import scala.collection.mutable

/** Minimal PDF 1.5+ object model: a tolerant lexer for PDF objects, both
  * cross-reference flavors (classic `xref` tables AND cross-reference
  * streams, `/Type /XRef` with `/W` field widths + PNG predictors), and
  * object streams (`/ObjStm`) — the structural tier most post-2005 PDFs
  * require before any content stream is even locatable. Used by
  * [[PdfOps.extractPdfText]] as the primary path (page-tree-ordered
  * extraction); PdfOps falls back to its tolerant stream scan when the
  * structure is broken, so crawl-grade garbage still degrades per-row
  * instead of failing.
  *
  * Pure JVM (java.util.zip only). All entry points throw on malformed
  * input; callers catch and fall back — nothing here is a task-failure
  * path. Bounded everywhere: parse depth, page-tree size, /Prev chain
  * length, and object-load recursion all carry explicit caps.
  */
private[spark] object PdfModel {

  /** indirect reference `num gen R`. */
  final case class Ref(num: Int, gen: Int)

  /** a stream object: its dict + the RAW (still-encoded) data bytes. */
  final case class PStream(dict: Map[String, Any], data: Array[Byte])

  private final class Malformed(msg: String) extends RuntimeException(msg)
  private def fail(msg: String): Nothing = throw new Malformed(msg)

  private def isWs(c: Int): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == 0 || c == '\f'
  private def isDelim(c: Int): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  /** lexer/parser over the whole file's bytes (PDF is a byte format;
    * ISO-8859-1 maps bytes 1:1 to chars). `pos` is mutable — parse methods
    * consume. */
  final class Lexer(val bytes: Array[Byte], var pos: Int) {
    private def len = bytes.length
    private def at(i: Int): Int = bytes(i) & 0xFF

    def skipWs(): Unit = {
      var going = true
      while (going && pos < len) {
        val c = at(pos)
        if (isWs(c)) pos += 1
        else if (c == '%') { // comment to EOL
          while (pos < len && bytes(pos) != '\n' && bytes(pos) != '\r') pos += 1
        } else going = false
      }
    }

    def matches(s: String): Boolean = {
      if (pos + s.length > len) return false
      var k = 0
      while (k < s.length && bytes(pos + k) == s.charAt(k).toByte) k += 1
      k == s.length
    }

    /** consume `s` if present at pos (post-skipWs). */
    def eat(s: String): Boolean = {
      if (matches(s)) { pos += s.length; true } else false
    }

    def parseName(): String = {
      if (pos >= len || bytes(pos) != '/') fail("name expected")
      pos += 1
      val sb = new java.lang.StringBuilder(16)
      while (pos < len && !isWs(at(pos)) && !isDelim(at(pos))) {
        val c = at(pos)
        if (c == '#' && pos + 2 < len) { // #xx hex escape in names
          val h = Character.digit(bytes(pos + 1), 16)
          val l = Character.digit(bytes(pos + 2), 16)
          if (h >= 0 && l >= 0) { sb.append(((h << 4) | l).toChar); pos += 3 }
          else { sb.append(c.toChar); pos += 1 }
        } else { sb.append(c.toChar); pos += 1 }
      }
      sb.toString
    }

    private def parseNumberToken(): (Double, Boolean) = { // (value, isInt)
      val s = pos
      if (pos < len && (bytes(pos) == '+' || bytes(pos) == '-')) pos += 1
      var isInt = true
      while (pos < len && { val c = at(pos)
        if (c == '.') { isInt = false; true } else c >= '0' && c <= '9' }) pos += 1
      if (pos == s) fail("number expected")
      val str = new String(bytes, s, pos - s, ISO_8859_1)
      if (pos - s > 24) fail("oversized number token") // hostile input cap
      try (str.toDouble, isInt && !str.contains('.'))
      catch { case _: NumberFormatException => fail("bad number") }
    }

    private def parseLiteralString(): String = {
      // '(' already peeked
      pos += 1
      val sb = new java.lang.StringBuilder(32)
      var depth = 1
      while (pos < len && depth > 0) {
        val c = at(pos)
        if (c == '\\' && pos + 1 < len) {
          val e = at(pos + 1)
          e match {
            case 'n' => sb.append('\n'); pos += 2
            case 'r' => sb.append('\r'); pos += 2
            case 't' => sb.append('\t'); pos += 2
            case 'b' => sb.append('\b'); pos += 2
            case 'f' => sb.append('\f'); pos += 2
            case '(' | ')' | '\\' => sb.append(e.toChar); pos += 2
            case d if d >= '0' && d <= '7' =>
              var v = 0; var k = 0
              pos += 1
              while (k < 3 && pos < len && bytes(pos) >= '0' && bytes(pos) <= '7') {
                v = v * 8 + (bytes(pos) - '0'); pos += 1; k += 1
              }
              sb.append((v & 0xFF).toChar)
            case '\n' => pos += 2 // line continuation
            case '\r' =>
              pos += 2
              if (pos < len && bytes(pos) == '\n') pos += 1
            case other => sb.append(other.toChar); pos += 2
          }
        } else if (c == '(') { depth += 1; sb.append('('); pos += 1 }
        else if (c == ')') { depth -= 1; if (depth > 0) sb.append(')'); pos += 1 }
        else { sb.append(c.toChar); pos += 1 }
      }
      sb.toString
    }

    private def parseHexString(): String = {
      // '<' already peeked (and next is not '<')
      pos += 1
      val sb = new java.lang.StringBuilder(32)
      var hi = -1
      var going = true
      while (going && pos < len) {
        val c = at(pos)
        if (c == '>') { pos += 1; going = false }
        else {
          val d = Character.digit(c, 16)
          if (d >= 0) { if (hi < 0) hi = d else { sb.append(((hi << 4) | d).toChar); hi = -1 } }
          else if (!isWs(c)) fail("bad hex string")
          pos += 1
        }
      }
      if (hi >= 0) sb.append((hi << 4).toChar) // odd final digit: low nibble 0
      sb.toString
    }

    /** parse ONE PDF object at pos (post-skipWs not assumed — we skip). */
    def parseObject(depth: Int = 0): Any = {
      if (depth > 64) fail("object nesting too deep")
      skipWs()
      if (pos >= len) fail("eof")
      val c = at(pos)
      if (c == '<') {
        if (pos + 1 < len && bytes(pos + 1) == '<') { // dict
          pos += 2
          val m = mutable.LinkedHashMap.empty[String, Any]
          var going = true
          while (going) {
            skipWs()
            if (pos + 1 < len && bytes(pos) == '>' && bytes(pos + 1) == '>') {
              pos += 2; going = false
            } else {
              val k = parseName()
              val v = parseObject(depth + 1)
              m(k) = v
            }
          }
          m.toMap
        } else parseHexString()
      } else if (c == '(') parseLiteralString()
      else if (c == '/') parseName()
      else if (c == '[') {
        pos += 1
        val arr = Vector.newBuilder[Any]
        var going = true
        var n = 0
        while (going) {
          skipWs()
          if (pos < len && bytes(pos) == ']') { pos += 1; going = false }
          else if (pos >= len) fail("unterminated array")
          else {
            arr += parseObject(depth + 1)
            n += 1
            if (n > 100000) fail("oversized array") // hostile input cap
          }
        }
        arr.result()
      } else if (c == 't' && eat("true")) java.lang.Boolean.TRUE
      else if (c == 'f' && eat("false")) java.lang.Boolean.FALSE
      else if (c == 'n' && eat("null")) null
      else if (c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        val save = pos
        val (v, isInt) = parseNumberToken()
        if (isInt && v >= 0 && v <= Int.MaxValue) {
          // lookahead for `gen R` → indirect reference
          val afterFirst = pos
          skipWs()
          val genOk = pos < len && bytes(pos) >= '0' && bytes(pos) <= '9'
          if (genOk) {
            try {
              val (g, gInt) = parseNumberToken()
              skipWs()
              if (gInt && g >= 0 && g <= 65535 && pos < len && bytes(pos) == 'R' &&
                (pos + 1 >= len || isWs(at(pos + 1)) || isDelim(at(pos + 1)))) {
                pos += 1
                return Ref(v.toInt, g.toInt)
              }
            } catch { case _: Malformed => () }
          }
          pos = afterFirst
          java.lang.Long.valueOf(v.toLong)
        } else if (isInt) { pos = save; parseNumberToken(); java.lang.Long.valueOf(v.toLong) }
        else java.lang.Double.valueOf(v)
      } else fail(s"unexpected byte $c")
    }
  }

  // ---------- filters ----------

  private def inflate(body: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(body)
      val out = new java.io.ByteArrayOutputStream(math.max(64, body.length * 4))
      val buf = new Array[Byte](1024)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return out.toByteArray
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally inf.end()
  }

  /** PNG unpredictor (PDF 32000 7.4.4.4): Predictor >= 10 means every row
    * is prefixed with a per-row PNG filter tag (0 none, 1 sub, 2 up,
    * 3 average, 4 paeth); bpp = ceil(colors*bpc/8). */
  private def pngUnpredict(data: Array[Byte], columns: Int, colors: Int, bpc: Int): Array[Byte] = {
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = columns * colors * bpc / 8
    if (rowLen <= 0 || rowLen > (1 << 20)) fail("bad predictor columns")
    val rows = data.length / (rowLen + 1)
    val out = new Array[Byte](rows * rowLen)
    val prior = new Array[Byte](rowLen)
    var r = 0
    while (r < rows) {
      val base = r * (rowLen + 1)
      val tag = data(base) & 0xFF
      var i = 0
      while (i < rowLen) {
        val raw = data(base + 1 + i) & 0xFF
        val left = if (i >= bpp) out(r * rowLen + i - bpp) & 0xFF else 0
        val up = prior(i) & 0xFF
        val upLeft = if (i >= bpp) prior(i - bpp) & 0xFF else 0
        val v = tag match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + ((left + up) / 2)
          case 4 => // paeth
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - upLeft)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
          case _ => fail(s"unknown PNG filter $tag")
        }
        out(r * rowLen + i) = (v & 0xFF).toByte
        i += 1
      }
      System.arraycopy(out, r * rowLen, prior, 0, rowLen)
      r += 1
    }
    out
  }

  private def asLong(v: Any): Long = v match {
    case l: java.lang.Long => l.longValue()
    case d: java.lang.Double => d.longValue()
    case _ => fail("number expected")
  }

  /** decode a stream's data per its /Filter (+ /DecodeParms). FlateDecode
    * only — anything else throws so the caller can skip/fall back; `resolve`
    * dereferences indirect /Length, /Filter, /DecodeParms values. */
  def decodeStream(s: PStream, resolve: Any => Any): Array[Byte] = {
    val filters: Seq[Any] = resolve(s.dict.getOrElse("Filter", null)) match {
      case null => Nil
      case n: String => Seq(n)
      case v: Vector[_] => v.map(resolve)
      case _ => fail("bad /Filter")
    }
    val parms: Seq[Any] = resolve(s.dict.getOrElse("DecodeParms", s.dict.getOrElse("DP", null))) match {
      case null => Seq.fill(filters.length)(null)
      case m: Map[_, _] => Seq(m)
      case v: Vector[_] => v.map(resolve).padTo(filters.length, null)
      case _ => Seq.fill(filters.length)(null)
    }
    var data = s.data
    filters.zip(parms).foreach {
      case ("ASCIIHexDecode" | "AHx", _) =>
        // hex pairs, whitespace ignored, '>' EOD, odd final digit pads 0
        val out = new java.io.ByteArrayOutputStream(data.length / 2 + 1)
        var hi = -1
        var i = 0
        var done = false
        while (i < data.length && !done) {
          val c = data(i) & 0xFF
          if (c == '>') done = true
          else {
            val d = Character.digit(c, 16)
            if (d >= 0) { if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 } }
            else if (!isWs(c)) fail("bad ASCIIHex data")
          }
          i += 1
        }
        if (hi >= 0) out.write(hi << 4)
        data = out.toByteArray
      case ("ASCII85Decode" | "A85", _) =>
        // 5 chars '!'..'u' -> 4 bytes base 85; 'z' -> 4 zero bytes;
        // '~>' EOD; a partial group of n chars yields n-1 bytes
        val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5 + 4)
        val group = new Array[Int](5)
        var k = 0
        var i = 0
        var done = false
        def flush(n: Int): Unit = {
          var v = 0L
          var j = 0
          while (j < 5) { v = v * 85 + (if (j < n) group(j) else 84); j += 1 }
          val emit = n - 1
          if (emit >= 1) out.write(((v >> 24) & 0xFF).toInt)
          if (emit >= 2) out.write(((v >> 16) & 0xFF).toInt)
          if (emit >= 3) out.write(((v >> 8) & 0xFF).toInt)
          if (emit >= 4) out.write((v & 0xFF).toInt)
        }
        while (i < data.length && !done) {
          val c = data(i) & 0xFF
          if (c == '~') done = true
          else if (c == 'z' && k == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
          else if (c >= '!' && c <= 'u') {
            group(k) = c - '!'
            k += 1
            if (k == 5) { flush(5); k = 0 }
          } else if (!isWs(c)) fail("bad ASCII85 data")
          i += 1
        }
        if (k == 1) fail("dangling ASCII85 digit")
        if (k > 1) flush(k)
        data = out.toByteArray
      case ("FlateDecode" | "Fl", p) =>
        data = inflate(data)
        p match {
          case m: Map[_, _] =>
            val pm = m.asInstanceOf[Map[String, Any]]
            val pred = pm.get("Predictor").map(v => asLong(resolve(v)).toInt).getOrElse(1)
            if (pred >= 10) {
              val cols = pm.get("Columns").map(v => asLong(resolve(v)).toInt).getOrElse(1)
              val colors = pm.get("Colors").map(v => asLong(resolve(v)).toInt).getOrElse(1)
              val bpc = pm.get("BitsPerComponent").map(v => asLong(resolve(v)).toInt).getOrElse(8)
              data = pngUnpredict(data, cols, colors, bpc)
            } else if (pred != 1) fail(s"unsupported predictor $pred")
          case _ => ()
        }
      case (other, _) => fail(s"unsupported filter $other")
    }
    data
  }

  // ---------- document: xref + object access ----------

  /** type 1 = at byte offset `a`; type 2 = object `b`-th inside ObjStm `a`. */
  private final case class XEntry(tpe: Int, a: Long, b: Int)

  /** parsed document: merged cross-reference map (newest-first across the
    * /Prev chain), trailer dict, cached object loads. Construction throws
    * on a document with no usable xref at startxref. */
  final class Doc(bytes: Array[Byte]) {
    private val entries = mutable.HashMap.empty[Int, XEntry]
    private var trailerDict = Map.empty[String, Any]
    private val objCache = mutable.HashMap.empty[Int, Any]
    private val loading = mutable.HashSet.empty[Int] // cycle guard
    private val objStmCache = mutable.HashMap.empty[Int, (Lexer, Vector[(Int, Int)], Int)]

    /** empty-user-password decryption (PDF 32000 §7.6): set AFTER the xref
      * loads, so the xref phase and the /Encrypt dict itself (whose /O and
      * /U strings are never encrypted) parse untouched. Null = plaintext
      * document. Unsupported handlers/passwords throw — the caller's
      * tolerant-scan fallback owns that row. */
    private var fileKey: PdfCrypto.FileKey = null

    locally {
      val tail = math.max(0, bytes.length - 2048)
      val sx = lastIndexOf(bytes, "startxref", tail)
      if (sx < 0) fail("no startxref")
      val lx = new Lexer(bytes, sx + "startxref".length)
      lx.skipWs()
      val off = lx.parseObject() match {
        case l: java.lang.Long => l.longValue()
        case _ => fail("bad startxref offset")
      }
      loadXrefAt(off, mutable.HashSet.empty, 0)
      if (entries.isEmpty) fail("empty xref")
      resolve(trailerDict.getOrElse("Encrypt", null)) match {
        case enc: Map[_, _] =>
          val id0 = resolve(trailerDict.getOrElse("ID", null)) match {
            case v: Vector[_] if v.nonEmpty => v.head match {
              case s: String => s.getBytes(ISO_8859_1)
              case _ => Array.emptyByteArray
            }
            case _ => Array.emptyByteArray
          }
          fileKey = PdfCrypto.standardFileKey(
            enc.asInstanceOf[Map[String, Any]], id0, resolve)
          // objects parsed while deriving the key (the Encrypt dict chain)
          // were loaded plaintext-correct, but any cached STREAM would have
          // skipped decryption — drop the cache so re-loads decrypt
          objCache.clear()
          objStmCache.clear()
        case _ => ()
      }
    }

    def trailer: Map[String, Any] = trailerDict
    def knownObjects: Int = entries.size

    private def lastIndexOf(hay: Array[Byte], needle: String, from: Int): Int = {
      val n = needle.getBytes(ISO_8859_1)
      var best = -1
      var i = from
      val lim = hay.length - n.length
      while (i <= lim) {
        var k = 0
        while (k < n.length && hay(i + k) == n(k)) k += 1
        if (k == n.length) best = i
        i += 1
      }
      best
    }

    private def mergeTrailer(d: Map[String, Any]): Unit =
      d.foreach { case (k, v) => if (!trailerDict.contains(k)) trailerDict += k -> v }

    private def loadXrefAt(off: Long, seen: mutable.Set[Long], depth: Int): Unit = {
      if (depth > 32 || off < 0 || off >= bytes.length || !seen.add(off)) return
      val lx = new Lexer(bytes, off.toInt)
      lx.skipWs()
      if (lx.eat("xref")) { // classic table
        var going = true
        while (going) {
          lx.skipWs()
          if (lx.eat("trailer")) {
            val d = lx.parseObject() match {
              case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
              case _ => fail("bad trailer")
            }
            mergeTrailer(d)
            // hybrid-reference files: /XRefStm points at an xref STREAM
            // carrying the entries 1.4 consumers can't see
            d.get("XRefStm").foreach(v => loadXrefAt(asLong(v), seen, depth + 1))
            d.get("Prev").foreach(v => loadXrefAt(asLong(v), seen, depth + 1))
            going = false
          } else {
            val start = asLong(lx.parseObject()).toInt
            val count = asLong(lx.parseObject()).toInt
            if (count < 0 || count > (1 << 22)) fail("bad xref subsection")
            var k = 0
            while (k < count) {
              lx.skipWs()
              val o = asLong(lx.parseObject())
              val g = asLong(lx.parseObject()).toInt
              lx.skipWs()
              val kind = lx.bytes(lx.pos); lx.pos += 1
              if (kind == 'n')
                entries.getOrElseUpdate(start + k, XEntry(1, o, g))
              k += 1
            }
          }
        }
      } else { // cross-reference stream
        parseIndirectAt(off.toInt) match {
          case s: PStream if s.dict.get("Type").contains("XRef") =>
            val data = decodeStream(s, identity) // XRef stream values are direct
            val w = s.dict.get("W") match {
              case Some(v: Vector[_]) if v.length >= 3 => v.map(asLong(_).toInt)
              case _ => fail("missing /W")
            }
            if (w.exists(x => x < 0 || x > 8)) fail("bad /W widths")
            val size = asLong(s.dict.getOrElse("Size", fail("missing /Size"))).toInt
            val index: Vector[Long] = s.dict.get("Index") match {
              case Some(v: Vector[_]) => v.map(asLong)
              case _ => Vector(0L, size.toLong)
            }
            val rowLen = w.sum
            if (rowLen <= 0) fail("zero-width xref rows")
            var p = 0
            var ii = 0
            while (ii + 1 < index.length) {
              val start = index(ii).toInt
              val count = index(ii + 1).toInt
              var k = 0
              while (k < count && p + rowLen <= data.length) {
                def field(width: Int, at: Int): Long = {
                  var v = 0L; var j = 0
                  while (j < width) { v = (v << 8) | (data(at + j) & 0xFF); j += 1 }
                  v
                }
                val f1 = if (w(0) == 0) 1L else field(w(0), p)
                val f2 = field(w(1), p + w(0))
                val f3 = field(w(2), p + w(0) + w(1))
                if (f1 == 1L) entries.getOrElseUpdate(start + k, XEntry(1, f2, f3.toInt))
                else if (f1 == 2L) entries.getOrElseUpdate(start + k, XEntry(2, f2, f3.toInt))
                p += rowLen
                k += 1
              }
              ii += 2
            }
            mergeTrailer(s.dict)
            s.dict.get("Prev").foreach(v => loadXrefAt(asLong(v), seen, depth + 1))
          case _ => fail("startxref points at neither xref table nor XRef stream")
        }
      }
    }

    /** parse `num gen obj <object> [stream...]` at a byte offset. */
    private def parseIndirectAt(off: Int): Any = {
      if (off < 0 || off >= bytes.length) fail("offset out of range")
      val lx = new Lexer(bytes, off)
      // num/gen kept for the per-object decryption key (otherwise tolerant:
      // a mismatch with the xref slot is the file's problem, not ours)
      lx.skipWs()
      val numTok = lx.parseObject()
      lx.skipWs()
      val genTok = lx.parseObject()
      val objNum = numTok match { case l: java.lang.Long => l.toInt; case _ => 0 }
      val objGen = genTok match { case l: java.lang.Long => l.toInt; case _ => 0 }
      lx.skipWs()
      if (!lx.eat("obj")) fail("obj keyword missing")
      val o = lx.parseObject()
      lx.skipWs()
      if (lx.matches("stream")) {
        val dict = o match {
          case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
          case _ => fail("stream without dict")
        }
        lx.pos += "stream".length
        if (lx.pos < bytes.length && bytes(lx.pos) == '\r') lx.pos += 1
        if (lx.pos < bytes.length && bytes(lx.pos) == '\n') lx.pos += 1
        val body = lx.pos
        // /Length when direct and sane (it may be an indirect ref we cannot
        // resolve mid-xref-load); else tolerant endstream scan
        val end = dict.get("Length") match {
          case Some(l: java.lang.Long)
            if l >= 0 && body + l <= bytes.length &&
              nearEndstream(body + l.toInt) => body + l.toInt
          case _ =>
            val e = indexOfFrom(body, "endstream")
            if (e < 0) fail("unterminated stream")
            var t = e
            if (t > body && bytes(t - 1) == '\n') t -= 1
            if (t > body && bytes(t - 1) == '\r') t -= 1
            t
        }
        val raw = java.util.Arrays.copyOfRange(bytes, body, end)
        // cross-reference streams are NEVER encrypted (PDF 32000 7.5.8.2);
        // everything else (content, ObjStm, ToUnicode, ...) decrypts here,
        // BEFORE decodeStream's filters — the spec's writer order reversed
        val data =
          if (fileKey == null || dict.get("Type").contains("XRef")) raw
          else fileKey.decryptStream(objNum, objGen, raw)
        PStream(dict, data)
      } else o
    }

    private def nearEndstream(at: Int): Boolean = {
      var i = at
      val lim = math.min(bytes.length, at + 4)
      while (i < lim && (bytes(i) == '\r' || bytes(i) == '\n' || bytes(i) == ' ')) i += 1
      i + 9 <= bytes.length && new String(bytes, i, 9, ISO_8859_1) == "endstream"
    }

    private def indexOfFrom(from: Int, needle: String): Int = {
      val n = needle.getBytes(ISO_8859_1)
      var i = from
      val lim = bytes.length - n.length
      while (i <= lim) {
        var k = 0
        while (k < n.length && bytes(i + k) == n(k)) k += 1
        if (k == n.length) return i
        i += 1
      }
      -1
    }

    /** load object `num` through the xref (cached; cycles load as null). */
    def obj(num: Int): Any = objCache.get(num) match {
      case Some(v) => v
      case None =>
        if (!loading.add(num)) return null
        val v = try entries.get(num) match {
          case Some(XEntry(1, off, _)) => parseIndirectAt(off.toInt)
          case Some(XEntry(2, stm, idx)) => objFromStream(stm.toInt, idx)
          case _ => null
        } finally loading.remove(num)
        objCache(num) = v
        v
    }

    /** object `idx` inside object stream `stmNum` (PDF 32000 7.5.7): the
      * decoded stream opens with /N pairs of `objnum offset`, objects
      * follow from /First. */
    private def objFromStream(stmNum: Int, idx: Int): Any = {
      val (lx, pairs, first) = objStmCache.getOrElseUpdate(stmNum, {
        obj(stmNum) match {
          case s: PStream if s.dict.get("Type").contains("ObjStm") =>
            val data = decodeStream(s, resolve)
            val n = asLong(resolve(s.dict.getOrElse("N", fail("ObjStm missing /N")))).toInt
            val f = asLong(resolve(s.dict.getOrElse("First", fail("ObjStm missing /First")))).toInt
            if (n < 0 || n > (1 << 20) || f < 0 || f > data.length) fail("bad ObjStm header")
            val hl = new Lexer(data, 0)
            val ps = Vector.newBuilder[(Int, Int)]
            var k = 0
            while (k < n) {
              val on = asLong(hl.parseObject()).toInt
              val oo = asLong(hl.parseObject()).toInt
              ps += ((on, oo))
              k += 1
            }
            (new Lexer(data, 0), ps.result(), f)
          case _ => fail(s"object $stmNum is not an ObjStm")
        }
      })
      if (idx < 0 || idx >= pairs.length) fail("ObjStm index out of range")
      lx.pos = first + pairs(idx)._2
      if (lx.pos > lx.bytes.length) fail("ObjStm offset out of range")
      lx.parseObject()
    }

    /** dereference (one indirection level per call, chain-capped). */
    def resolve(v: Any): Any = {
      var cur = v
      var hops = 0
      while (cur.isInstanceOf[Ref] && hops < 32) {
        cur = obj(cur.asInstanceOf[Ref].num)
        hops += 1
      }
      cur
    }

    /** page dicts in PAGE-TREE order (depth-first over /Kids). */
    def pages(): Vector[Map[String, Any]] = {
      val root = resolve(trailerDict.getOrElse("Root", fail("no /Root"))) match {
        case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
        case _ => fail("bad catalog")
      }
      val acc = Vector.newBuilder[Map[String, Any]]
      var count = 0
      val seen = mutable.HashSet.empty[Int]
      def walk(node: Any, depth: Int): Unit = {
        if (depth > 64 || count > 100000) fail("page tree too large")
        (node match {
          case r: Ref => if (seen.add(r.num)) resolve(r) else null
          case x => x
        }) match {
          case m: Map[_, _] =>
            val d = m.asInstanceOf[Map[String, Any]]
            d.get("Type") match {
              case Some("Pages") =>
                resolve(d.getOrElse("Kids", Vector.empty)) match {
                  case kids: Vector[_] => kids.foreach(walk(_, depth + 1))
                  case _ => ()
                }
              case Some("Page") => acc += d; count += 1
              case _ => ()
            }
          case _ => ()
        }
      }
      walk(root.getOrElse("Pages", fail("no /Pages")), 0)
      acc.result()
    }

    /** a page's decoded content stream(s), in order; corrupt streams skip. */
    def pageContents(page: Map[String, Any]): Seq[Array[Byte]] = {
      val refs: Seq[Any] = resolve(page.getOrElse("Contents", null)) match {
        case null => Nil
        case v: Vector[_] => v
        case one => Seq(one)
      }
      refs.flatMap { r =>
        try resolve(r) match {
          case s: PStream => Some(decodeStream(s, resolve))
          case _ => None
        } catch { case scala.util.control.NonFatal(_) => None }
      }
    }
  }
}
