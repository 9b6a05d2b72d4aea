package graft.html

import graft.dom.Arena

/** Parse options mirroring the profile visdom uses for `Vis::load`
  * (reference `src/lib.rs:1212-1222`): the "most compatible" profile turns
  * all five fixes on; rphtml's strict defaults make malformed HTML
  * (`<aa></a>`) a hard error (reference `tests/error.rs:5-33`).
  */
final case class ParseOptions(
    autoFixUnclosedTag: Boolean = false,
    autoFixUnexpectedEndtag: Boolean = false,
    autoFixUnescapedLt: Boolean = false,
    allowSelfClosing: Boolean = false,
    allowAttrKeyStartsWithEqualSign: Boolean = false)

object ParseOptions {
  /** visdom `Vis::options()` */
  val compat: ParseOptions = ParseOptions(
    autoFixUnclosedTag = true,
    autoFixUnexpectedEndtag = true,
    autoFixUnescapedLt = true,
    allowSelfClosing = true,
    allowAttrKeyStartsWithEqualSign = true)
  val strict: ParseOptions = ParseOptions()
}

final case class ParseError(message: String, position: Int) extends RuntimeException(message)

/** Streaming HTML tokenizer + tree builder re-deriving the behaviors visdom
  * observes from the external `rphtml` crate (behavior pinned by the
  * reference test corpus — see FIXTURES.md §3):
  *
  *  - no implicit html/head/body insertion, no spec tree-construction moves:
  *    the tree is exactly the tags present (fragments query fine,
  *    `tests/selector.rs:66-89`)
  *  - content tags (script/style/title/textarea) hold raw text until their
  *    case-insensitive close tag (`src/lib.rs:141-143,249-296`)
  *  - whitespace-only text between tags is a distinct SpacesBetweenTag node
  *    kind (maps to the Text node type, `src/lib.rs:193`)
  *  - duplicate attribute names: first occurrence wins, later dropped
  *    (`tests/attr.rs:40-56`), case-insensitive lookup (issue #2)
  *  - void elements never take children (`tests/insertion.rs:110-122`)
  *  - source re-render is byte-identical for well-formed input
  *    (`tests/trait.rs:48`)
  */
object Parser {

  val voidTags: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr")

  val contentTags: Set[String] = Set("script", "style", "title", "textarea")

  def parseInto(arena: Arena, html: String, opts: ParseOptions): Option[ParseError] = {
    arena.reset(html)
    val p = new Parser(arena, opts)
    p.run()
  }

  /** executor hot path: UTF-8 bytes decoded straight into the arena. */
  def parseIntoUtf8(arena: Arena, html: Array[Byte], opts: ParseOptions): Option[ParseError] = {
    arena.resetFromUtf8(html)
    val p = new Parser(arena, opts)
    p.run()
  }

  // byte-level classifiers: UTF-8 continuation bytes are negative and fall
  // out of every ASCII class naturally
  // byte-class table: one load replaces 4-7 comparisons in the hot scan
  // loops (indexed by widened-byte & 0xFF; >=0x80 classifies as nothing,
  // which is correct for raw UTF-8 continuation/lead bytes)
  private final val CtName = 1
  private final val CtWs = 2
  private final val CtKeyStop = 4 // ws = > / : terminates an attr key scan
  private final val CtValStop = 8 // ws > /   : terminates a bare attr value
  private val ctab: Array[Byte] = {
    val t = new Array[Byte](256)
    def add(c: Char, bit: Int): Unit = t(c & 0xFF) = (t(c & 0xFF) | bit).toByte
    ('a' to 'z').foreach(add(_, CtName)); ('A' to 'Z').foreach(add(_, CtName))
    ('0' to '9').foreach(add(_, CtName))
    "-_:.".foreach(add(_, CtName))
    " \t\n\r\f".foreach { c => add(c, CtWs); add(c, CtKeyStop); add(c, CtValStop) }
    add('=', CtKeyStop)
    add('>', CtKeyStop); add('>', CtValStop)
    add('/', CtKeyStop); add('/', CtValStop)
    t
  }
  private def isNameChar(c: Int): Boolean = (ctab(c & 0xFF) & CtName) != 0
  private def isWs(c: Int): Boolean = (ctab(c & 0xFF) & CtWs) != 0
  private def isKeyStop(c: Int): Boolean = (ctab(c & 0xFF) & CtKeyStop) != 0
  private def isValStop(c: Int): Boolean = (ctab(c & 0xFF) & CtValStop) != 0

  private final class Parser(a: Arena, opts: ParseOptions) {
    private val buf = a.buf
    private val len = a.bufLen
    // word view for the SWAR '<' scan (the buffer never grows during parse:
    // the source is fully copied in by resetFromUtf8; overflow appends
    // happen only in mutations)
    private val words =
      java.nio.ByteBuffer.wrap(buf).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    private var i = 0

    /** first index >= from holding '<', or len — 8 bytes per step (SWAR
      * zero-byte trick on x ^ '<<<<<<<<'); the tokenizer's hottest loop. */
    private def scanToLt(from: Int): Int = {
      var j = from
      val n8 = len - 8
      while (j <= n8) {
        val x = words.getLong(j) ^ 0x3C3C3C3C3C3C3C3CL
        val hit = (x - 0x0101010101010101L) & ~x & 0x8080808080808080L
        if (hit != 0L) return j + (java.lang.Long.numberOfTrailingZeros(hit) >> 3)
        j += 8
      }
      while (j < len && buf(j) != '<') j += 1
      j
    }
    // open-element stack (node ids); root implicit at bottom
    private var stack = new Array[Int](32)
    private var sp = 0

    private def cur: Int = if (sp == 0) 0 else stack(sp - 1)
    private def push(id: Int): Unit = {
      if (sp == stack.length) stack = java.util.Arrays.copyOf(stack, sp * 2)
      stack(sp) = id; sp += 1
    }

    /** pathological-nesting bound: render/extract walk the tree recursively,
      * so a crawler bomb (100k nested divs) must not overflow task stacks at
      * corpus scale. Tags beyond this depth stay childless leaves (lenient
      * mode) / error (strict). */
    private val maxDepth = 2048

    def run(): Option[ParseError] = {
      try {
        loop()
        // EOF: unclosed tags
        if (sp > 0 && !opts.autoFixUnclosedTag)
          return Some(ParseError(s"unclosed tag <${a.lowerName(stack(0))}>", len))
        sp = 0
        // document vs fragment: has doctype child or an <html> element child
        var c = a.firstChild(0)
        while (c >= 0 && !a.isDocument) {
          if (a.kind(c) == a.DOCTYPE) a.isDocument = true
          else if (a.kind(c) == a.ELEM && a.spanEqIgnoreCase(a.nameOff(c), a.nameLen(c), "html"))
            a.isDocument = true
          c = a.nextSib(c)
        }
        None
      } catch {
        case e: ParseError => Some(e)
      }
    }

    private def err(msg: String): Nothing = throw ParseError(msg, i)

    private def loop(): Unit = {
      var textStart = i
      while (i < len) {
        i = scanToLt(i)
        if (i < len) {
          // classify inlined: 1 = start tag, 2 = end tag, 3 = markup decl,
          // 0 = plain-text '<' (JFR showed the call boundary itself hot)
          var kindAt = 0
          if (i + 1 < len) {
            val c1: Int = buf(i + 1)
            if ((c1 >= 'a' && c1 <= 'z') || (c1 >= 'A' && c1 <= 'Z')) kindAt = 1
            else if (c1 == '/') {
              if (i + 2 < len) {
                val c2: Int = buf(i + 2)
                if ((c2 >= 'a' && c2 <= 'z') || (c2 >= 'A' && c2 <= 'Z')) kindAt = 2
              }
            } else if (c1 == '!') kindAt = 3
          }
          if (kindAt == 0) {
            // not a tag start: unescaped '<'
            if (!opts.autoFixUnescapedLt) err("unescaped '<' in text")
            i += 1
          } else {
            flushText(textStart, i)
            kindAt match {
              case 1 => startTag()
              case 2 => endTag()
              case 3 => markupDecl()
            }
            textStart = i
          }
        }
      }
      flushText(textStart, i)
    }

    private def flushText(from: Int, until: Int): Unit = {
      if (until <= from) return
      var allWs = true
      var j = from
      while (j < until && allWs) { if (!isWs(buf(j))) allWs = false; j += 1 }
      val id = a.allocChild(if (allWs) a.SPACES else a.TEXT, cur)
      a.textOff(id) = from; a.textLen(id) = until - from
    }

    /** span-based lowercase compare avoiding per-tag String allocation. */
    private def spanIsLower(off: Int, l: Int, w: String): Boolean =
      l == w.length && a.spanEqIgnoreCase(off, l, w)

    // first-char discrimination before the span compare: one branch kills
    // the whole candidate list for the common non-void/non-content tags
    private def spanIsVoid(off: Int, l: Int): Boolean = {
      val c0 = (buf(off) | 0x20).toChar
      l match {
        case 2 =>
          (c0 == 'b' && spanIsLower(off, l, "br")) ||
            (c0 == 'h' && spanIsLower(off, l, "hr"))
        case 3 =>
          (c0 == 'i' && spanIsLower(off, l, "img")) ||
            (c0 == 'c' && spanIsLower(off, l, "col")) ||
            (c0 == 'w' && spanIsLower(off, l, "wbr"))
        case 4 =>
          (c0 == 'b' && spanIsLower(off, l, "base")) ||
            (c0 == 'a' && spanIsLower(off, l, "area")) ||
            (c0 == 'l' && spanIsLower(off, l, "link")) ||
            (c0 == 'm' && spanIsLower(off, l, "meta"))
        case 5 =>
          (c0 == 'i' && spanIsLower(off, l, "input")) ||
            (c0 == 'e' && spanIsLower(off, l, "embed")) ||
            (c0 == 'p' && spanIsLower(off, l, "param")) ||
            (c0 == 't' && spanIsLower(off, l, "track"))
        case 6 => c0 == 's' && spanIsLower(off, l, "source")
        case _ => false
      }
    }

    private def spanIsContent(off: Int, l: Int): Boolean = {
      val c0 = (buf(off) | 0x20).toChar
      l match {
        case 5 =>
          (c0 == 's' && spanIsLower(off, l, "style")) ||
            (c0 == 't' && spanIsLower(off, l, "title"))
        case 6 => c0 == 's' && spanIsLower(off, l, "script")
        case 8 => c0 == 't' && spanIsLower(off, l, "textarea")
        case _ => false
      }
    }

    private def startTag(): Unit = {
      i += 1 // '<'
      val nameStart = i
      while (i < len && isNameChar(buf(i))) i += 1
      val nameEnd = i
      val nlen = nameEnd - nameStart
      // fused: link into the tree at alloc (appendChild overwrites fold away);
      // nothing between here and the old link point reads sibling structure
      val id = a.allocChild(a.ELEM, cur)
      a.nameOff(id) = nameStart; a.nameLen(id) = nlen
      val isVoid = spanIsVoid(nameStart, nlen)
      val isContent = !isVoid && spanIsContent(nameStart, nlen)
      if (isVoid) a.flags(id) |= a.F_VOID
      if (isContent) a.flags(id) |= a.F_CONTENT_TAG
      // attributes
      var selfClosed = false
      var selfSpace = false
      var done = false
      while (!done) {
        // skip whitespace
        var sawWs = false
        while (i < len && isWs(buf(i))) { i += 1; sawWs = true }
        if (i >= len) {
          if (!opts.autoFixUnclosedTag) err(s"unexpected EOF in tag <${a.lowerName(id)}>")
          done = true
        } else buf(i) match {
          case '>' => i += 1; done = true
          case '/' if i + 1 < len && buf(i + 1) == '>' =>
            if (!opts.allowSelfClosing && !isVoid) err(s"self-closing not allowed: <${a.lowerName(id)}/>")
            selfClosed = true; selfSpace = sawWs
            i += 2; done = true
          case _ => parseAttr(id)
        }
      }
      if (selfClosed) {
        a.flags(id) |= a.F_SELF_CLOSED
        if (selfSpace) a.flags(id) |= a.F_SELF_SPACE
      } else if (isContent) {
        // raw content until the matching case-insensitive close tag
        val cStart = i
        var cEnd = -1
        var closeEnd = -1
        var j = i
        while (j < len && cEnd < 0) {
          j = scanToLt(j) // raw content skips to candidate '<' 8 bytes/step
          if (j < len) {
            if (j + 1 < len && buf(j + 1) == '/' &&
              j + 2 + nlen <= len && eqSpansIgnoreCase(nameStart, j + 2, nlen)) {
              var k = j + 2 + nlen
              while (k < len && isWs(buf(k))) k += 1
              if (k < len && buf(k) == '>') { cEnd = j; closeEnd = k + 1 }
              else j += 1
            } else j += 1
          }
        }
        if (cEnd < 0) {
          if (!opts.autoFixUnclosedTag) err(s"unclosed content tag <${a.lowerName(id)}>")
          a.textOff(id) = cStart; a.textLen(id) = len - cStart
          i = len
        } else {
          a.textOff(id) = cStart; a.textLen(id) = cEnd - cStart
          a.flags(id) |= a.F_END_TAG
          i = closeEnd
        }
      } else if (!isVoid) {
        if (sp < maxDepth) push(id)
        else if (!opts.autoFixUnclosedTag) err("nesting depth limit exceeded")
        // else: depth-capped element stays a leaf
      }
    }

    private def parseAttr(id: Int): Unit = {
      val keyStart = i
      if (buf(i) == '=') {
        if (!opts.allowAttrKeyStartsWithEqualSign) err("attribute key starts with '='")
        i += 1
      }
      var scanning = true
      while (scanning) {
        while (i < len && !isKeyStop(buf(i))) i += 1
        // '/' not followed by '>' is part of the key
        if (i < len && buf(i) == '/' && !(i + 1 < len && buf(i + 1) == '>')) i += 1
        else scanning = false
      }
      val keyEnd = i
      if (keyEnd == keyStart) { i += 1; return } // skip stray char
      // lookahead for '='
      var j = i
      while (j < len && isWs(buf(j))) j += 1
      var valOff = -1
      var valLen = 0
      var quote: Char = 0
      if (j < len && buf(j) == '=' && buf(keyStart) != '=') {
        j += 1
        while (j < len && isWs(buf(j))) j += 1
        if (j < len && (buf(j) == '"' || buf(j) == '\'')) {
          quote = buf(j).toChar
          j += 1
          val vs = j
          while (j < len && buf(j) != quote) j += 1
          valOff = vs; valLen = j - vs
          if (j < len) j += 1 // closing quote
        } else {
          val vs = j
          var vScan = true
          while (vScan) {
            while (j < len && !isValStop(buf(j))) j += 1
            if (j < len && buf(j) == '/' && !(j + 1 < len && buf(j + 1) == '>')) j += 1
            else vScan = false
          }
          valOff = vs; valLen = j - vs
        }
        i = j
      }
      // duplicate attribute names: first wins, later dropped entirely
      // (span-vs-span compare — no per-attribute String allocation). The
      // walk doubles as the tail finder, so the append is O(1) — no second
      // chain walk in appendAttr.
      val keyLen = keyEnd - keyStart
      var lastAttr = -1
      var dup = a.attrHead(id)
      while (dup >= 0) {
        if (a.aKeyLen(dup) == keyLen && eqSpansIgnoreCase(a.aKeyOff(dup), keyStart, keyLen))
          return
        lastAttr = dup
        dup = a.aNext(dup)
      }
      val at = a.allocAttrRaw()
      a.aKeyOff(at) = keyStart; a.aKeyLen(at) = keyLen
      a.aValOff(at) = valOff; a.aValLen(at) = valLen
      a.aQuote(at) = quote
      if (lastAttr >= 0) a.aNext(lastAttr) = at else a.attrHead(id) = at
      if (keyLen == 2 && a.spanEqIgnoreCase(keyStart, 2, "id") && valOff >= 0 && valLen > 0)
        a.registerId(a.str(valOff, valLen), id)
    }

    private def endTag(): Unit = {
      i += 2 // '</'
      val nameStart = i
      while (i < len && isNameChar(buf(i))) i += 1
      val nameEnd = i
      while (i < len && isWs(buf(i))) i += 1
      if (i < len && buf(i) == '>') i += 1
      else if (i >= len) {
        if (!opts.autoFixUnclosedTag) err("unexpected EOF in end tag")
      } else {
        // junk between end-tag name and '>' is consumed and discarded
        // (HTML5 end tags can't carry attributes)
        if (!opts.autoFixUnexpectedEndtag) err("malformed end tag")
        while (i < len && buf(i) != '>') i += 1
        if (i < len) i += 1
      }
      val nlen = nameEnd - nameStart
      // find matching open tag on the stack (case-insensitive)
      var match_ = -1
      var s = sp - 1
      while (s >= 0 && match_ < 0) {
        val nid = stack(s)
        if (a.nameLen(nid) == nlen && eqSpansIgnoreCase(a.nameOff(nid), nameStart, nlen))
          match_ = s
        s -= 1
      }
      if (match_ < 0) {
        if (!opts.autoFixUnexpectedEndtag)
          err(s"unexpected end tag </${new String(buf, nameStart, nlen)}>")
        // ignore
      } else {
        if (match_ != sp - 1 && !opts.autoFixUnclosedTag)
          err(s"unclosed tag <${a.lowerName(stack(sp - 1))}>")
        a.flags(stack(match_)) |= a.F_END_TAG
        sp = match_
      }
    }

    private def eqSpansIgnoreCase(o1: Int, o2: Int, l: Int): Boolean = {
      var k = 0
      while (k < l) {
        val c1: Int = buf(o1 + k); val c2: Int = buf(o2 + k)
        val lc1 = if (c1 >= 'A' && c1 <= 'Z') c1 + 32 else c1
        val lc2 = if (c2 >= 'A' && c2 <= 'Z') c2 + 32 else c2
        if (lc1 != lc2) return false
        k += 1
      }
      true
    }

    private def markupDecl(): Unit = {
      // at '<!'
      if (startsWith(i, "<!--")) {
        val cs = i + 4
        var j = cs
        var end = -1
        while (j + 2 < len && end < 0) {
          if (buf(j) == '-' && buf(j + 1) == '-' && buf(j + 2) == '>') end = j
          else j += 1
        }
        val id = a.allocChild(a.COMMENT, cur)
        if (end < 0) {
          if (!opts.autoFixUnclosedTag) err("unclosed comment")
          a.textOff(id) = cs; a.textLen(id) = len - cs
          i = len
        } else {
          a.textOff(id) = cs; a.textLen(id) = end - cs
          i = end + 3
        }
      } else if (startsWith(i, "<![CDATA[")) {
        val cs = i + 9
        var j = cs
        var end = -1
        while (j + 2 < len && end < 0) {
          if (buf(j) == ']' && buf(j + 1) == ']' && buf(j + 2) == '>') end = j
          else j += 1
        }
        val id = a.allocChild(a.CDATA, cur)
        if (end < 0) {
          if (!opts.autoFixUnclosedTag) err("unclosed CDATA")
          a.textOff(id) = cs; a.textLen(id) = len - cs
          i = len
        } else {
          a.textOff(id) = cs; a.textLen(id) = end - cs
          i = end + 3
        }
      } else {
        // doctype or other <!...>: stored raw including markers
        val ds = i
        var j = i
        while (j < len && buf(j) != '>') j += 1
        val id = a.allocChild(a.DOCTYPE, cur)
        val de = if (j < len) j + 1 else len
        a.textOff(id) = ds; a.textLen(id) = de - ds
        i = de
      }
    }

    private def startsWith(at: Int, s: String): Boolean = {
      if (at + s.length > len) return false
      var k = 0
      while (k < s.length) {
        if (buf(at + k) != s.charAt(k)) return false
        k += 1
      }
      true
    }
  }
}
