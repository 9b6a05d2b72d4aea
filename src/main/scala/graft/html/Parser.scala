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
    allowAttrKeyStartsWithEqualSign: Boolean = false,
    /** OPT-IN HTML5 implicit tree construction for real crawl pages:
      * implied html/head/body elements (synthesized, marked F_IMPLIED —
      * they render transparently so re-render stays byte-identical) and
      * the common auto-close rules (`<li>` closes `<li>`, `<p>` closed by
      * block starts, dt/dd, table rows/cells, option/optgroup). OFF by
      * default: the default tree is exact reference parity (naive
      * nesting, no implicit elements — reference tests/selector.rs:66-89). */
    html5Tree: Boolean = false)

object ParseOptions {
  /** visdom `Vis::options()` */
  val compat: ParseOptions = ParseOptions(
    autoFixUnclosedTag = true,
    autoFixUnexpectedEndtag = true,
    autoFixUnescapedLt = true,
    allowSelfClosing = true,
    allowAttrKeyStartsWithEqualSign = true)
  val strict: ParseOptions = ParseOptions()
  /** the crawl profile: every compat fix plus HTML5 implicit-tree mode —
    * what a real Common-Crawl extraction job wants (`body > *` selectors
    * work on pages that never wrote `<body>`). */
  val crawl: ParseOptions = compat.copy(html5Tree = true)
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
    val p = new Parser(arena, opts, prepImplied(arena, opts))
    p.run()
  }

  /** executor hot path: UTF-8 bytes decoded straight into the arena. */
  def parseIntoUtf8(arena: Arena, html: Array[Byte], opts: ParseOptions): Option[ParseError] = {
    arena.resetFromUtf8(html)
    val p = new Parser(arena, opts, prepImplied(arena, opts))
    p.run()
  }

  /** html5Tree mode: append the implied-element names ("htmlheadbody")
    * past the source span BEFORE the Parser captures buf/len — the append
    * may grow (realloc) the arena buffer, and the tokenizer must neither
    * scan the appended bytes nor hold a stale buffer reference. Returns
    * the offset of "html" (head/body follow at +4/+8), or -1. */
  private def prepImplied(arena: Arena, opts: ParseOptions): Int =
    if (opts.html5Tree) arena.appendStr("htmlheadbody") else -1

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

  private final class Parser(a: Arena, opts: ParseOptions, impliedOff: Int) {
    private val buf = a.buf
    // impliedOff (the pre-append bufLen) is the SOURCE length in html5Tree
    // mode: the appended implied-element names must never be tokenized
    private val len = if (impliedOff >= 0) impliedOff else a.bufLen
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

    // ---- html5Tree implicit-tree state (only touched when opts.html5Tree):
    // the document's html/head/body element ids, explicit or implied ----
    private var htmlId = -1
    private var headId = -1
    private var bodyId = -1

    def run(): Option[ParseError] = {
      try {
        loop()
        // EOF: unclosed tags (implied html/head/body never had close tags —
        // they don't count)
        if (sp > 0 && !opts.autoFixUnclosedTag) {
          var s = 0
          while (s < sp && (a.flags(stack(s)) & a.F_IMPLIED) != 0) s += 1
          if (s < sp)
            return Some(ParseError(s"unclosed tag <${a.lowerName(stack(s))}>", len))
        }
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
      // html5Tree: non-whitespace text at root / html / head level belongs
      // to the body (whitespace may sit anywhere, as in the spec)
      if (!allWs && opts.html5Tree) {
        val c = cur
        if (c == 0 || c == htmlId || c == headId) ensureBody()
      }
      val id = a.allocChild(if (allWs) a.SPACES else a.TEXT, cur)
      a.textOff(id) = from; a.textLen(id) = until - from
    }

    // ---------- html5Tree implicit tree construction ----------

    private def onStack(id: Int): Boolean = {
      var s = sp - 1
      while (s >= 0) { if (stack(s) == id) return true; s -= 1 }
      false
    }

    private def popToHtml(): Unit = {
      while (sp > 0 && stack(sp - 1) != htmlId) sp -= 1
    }

    /** implied `html`: created only at root level (a fragment mid-element
      * stays a fragment); re-pushed if explicitly closed. */
    private def ensureHtml(): Unit = {
      if (htmlId < 0) {
        if (sp == 0) {
          htmlId = a.allocChild(a.ELEM, 0)
          a.nameOff(htmlId) = impliedOff; a.nameLen(htmlId) = 4
          a.flags(htmlId) |= a.F_IMPLIED
          push(htmlId)
        }
      } else if (!onStack(htmlId)) { sp = 0; push(htmlId) }
    }

    /** implied `head` (or re-entry into an explicitly closed one) for
      * head-phase metadata elements. */
    private def ensureHead(): Unit = {
      ensureHtml()
      if (htmlId < 0) return
      if (headId < 0) {
        popToHtml()
        headId = a.allocChild(a.ELEM, htmlId)
        a.nameOff(headId) = impliedOff + 4; a.nameLen(headId) = 4
        a.flags(headId) |= a.F_IMPLIED
        push(headId)
      } else if (!onStack(headId)) { popToHtml(); push(headId) }
    }

    /** implied `body`; content after `</body>` re-enters it (HTML5 "after
      * body" insertion mode re-processes in body). */
    private def ensureBody(): Unit = {
      if (bodyId >= 0) {
        if (sp >= 2 && stack(1) == bodyId) return // hot path: [html, body, ...]
        if (!onStack(bodyId)) {
          ensureHtml()
          if (htmlId >= 0) popToHtml()
          push(bodyId)
        }
        return
      }
      ensureHtml()
      if (htmlId < 0) return // fragment mid-element: no implied structure
      popToHtml()
      bodyId = a.allocChild(a.ELEM, htmlId)
      a.nameOff(bodyId) = impliedOff + 8; a.nameLen(bodyId) = 4
      a.flags(bodyId) |= a.F_IMPLIED
      push(bodyId)
    }

    private def nameIs(nid: Int, w: String): Boolean =
      spanIsLower(a.nameOff(nid), a.nameLen(nid), w)
    private def curIs(w: String): Boolean = sp > 0 && nameIs(cur, w)

    /** inline formatting elements an auto-close may pop through (the
      * button-scope approximation: `<p><b>x<p>` closes the outer p). */
    private def isFormatting(nid: Int): Boolean = {
      val off = a.nameOff(nid)
      val l = a.nameLen(nid)
      l match {
        case 1 => nameIs(nid, "b") || nameIs(nid, "i") || nameIs(nid, "u") ||
          nameIs(nid, "s") || nameIs(nid, "a")
        case 2 => nameIs(nid, "em") || nameIs(nid, "tt")
        case 4 => nameIs(nid, "font") || nameIs(nid, "code") ||
          nameIs(nid, "span") || nameIs(nid, "nobr")
        case 5 => nameIs(nid, "small")
        case 6 => nameIs(nid, "strong")
        case _ => false
      }
    }

    /** pop through formatting elements to (and including) the nearest stack
      * entry matching `m`; no-op when a non-formatting element intervenes.
      * The walk is naturally bounded by the first non-formatting ancestor;
      * the 64-step cap only guards a pathological all-formatting bomb
      * (real tag soup opens far fewer than 64 inline tags). */
    private def closeThrough(m: Int => Boolean): Unit = {
      var s = sp - 1
      var steps = 0
      while (s >= 0 && steps < 64) {
        val nid = stack(s)
        if (m(nid)) { sp = s; return }
        if (!isFormatting(nid)) return
        s -= 1
        steps += 1
      }
    }

    private def isHeading(off: Int, l: Int): Boolean =
      l == 2 && (buf(off) | 0x20) == 'h' && buf(off + 1) >= '1' && buf(off + 1) <= '6'

    /** start tags that close an open `<p>` (HTML5 8.2.5.4.7 in-body). */
    private def isPCloser(off: Int, l: Int): Boolean = {
      def is(w: String) = spanIsLower(off, l, w)
      l match {
        case 1 => is("p")
        case 2 => isHeading(off, l) || is("dl") || is("ol") || is("ul") || is("hr")
        case 3 => is("div") || is("nav") || is("pre")
        case 4 => is("form") || is("main") || is("menu")
        case 5 => is("aside") || is("table")
        case 6 => is("figure") || is("footer") || is("header") || is("hgroup")
        case 7 => is("address") || is("article") || is("details") || is("section")
        case 8 => is("fieldset")
        case 10 => is("blockquote") || is("figcaption")
        case _ => false
      }
    }

    private def isHeadish(off: Int, l: Int): Boolean = {
      def is(w: String) = spanIsLower(off, l, w)
      l match {
        case 4 => is("base") || is("link") || is("meta")
        case 5 => is("title") || is("style")
        case 6 => is("script")
        case 7 => is("bgsound")
        case 8 => is("noscript") || is("noframes") || is("basefont") || is("template")
        case _ => false
      }
    }

    /** the common HTML5 auto-close rules, applied before inserting a body
      * start tag. */
    private def h5AutoClose(off: Int, l: Int): Unit = {
      def is(w: String) = spanIsLower(off, l, w)
      if (l == 2 && is("li")) closeThrough(nameIs(_, "li"))
      else if (l == 2 && (is("dt") || is("dd")))
        closeThrough(nid => nameIs(nid, "dt") || nameIs(nid, "dd"))
      else if (l == 2 && (is("td") || is("th")))
        closeThrough(nid => nameIs(nid, "td") || nameIs(nid, "th"))
      else if (l == 2 && is("tr")) {
        while (curIs("td") || curIs("th")) sp -= 1
        if (curIs("tr")) sp -= 1
      } else if (l == 5 && (is("thead") || is("tbody") || is("tfoot"))) {
        while (curIs("td") || curIs("th") || curIs("tr")) sp -= 1
        if (curIs("thead") || curIs("tbody") || curIs("tfoot")) sp -= 1
      } else if (l == 6 && is("option")) closeThrough(nameIs(_, "option"))
      else if (l == 8 && is("optgroup")) {
        if (curIs("option")) sp -= 1
        if (curIs("optgroup")) sp -= 1
      } else {
        // order matters: an open <p> closes first, THEN a current heading
        // pops (h-in-h), matching the in-body insertion rules
        if (isPCloser(off, l)) closeThrough(nameIs(_, "p"))
        if (isHeading(off, l) && sp > 0 && isHeading(a.nameOff(cur), a.nameLen(cur)))
          sp -= 1
      }
    }

    /** html5Tree pre-insertion: arrange the stack so `cur` is the correct
      * parent for the incoming start tag. Returns the structural slot this
      * element claims: 1 html, 2 head, 3 body, 0 ordinary. */
    private def h5Pre(off: Int, l: Int): Int = {
      def is(w: String) = spanIsLower(off, l, w)
      if (l == 4 && is("html") && htmlId < 0 && sp == 0) return 1
      if (l == 4 && is("head") && headId < 0 && bodyId < 0) {
        ensureHtml()
        if (htmlId >= 0) { popToHtml(); return 2 }
      }
      if (l == 4 && is("body") && bodyId < 0) {
        ensureHtml()
        if (htmlId >= 0) { popToHtml(); return 3 }
      }
      if (bodyId < 0 && isHeadish(off, l)) {
        // metadata element in the head phase (ensureHead no-ops inside an
        // open fragment element — the tag stays where it is)
        ensureHead()
        return 0
      }
      ensureBody()
      h5AutoClose(off, l)
      0
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
      // html5Tree: arrange implied parents / auto-closes BEFORE the alloc
      // so `cur` is the spec insertion point
      val spBeforeH5 = sp
      val h5Slot = if (opts.html5Tree) h5Pre(nameStart, nlen) else 0
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
      // html5Tree: claim the html/head/body slot only now that selfClosed
      // is known — a self-closed <body/> must NOT become the insertion
      // parent (F_SELF_CLOSED renders without children, so content routed
      // into it would vanish from re-render); it stays an ordinary leaf
      // and later content opens an implied body
      if (h5Slot != 0 && !selfClosed) {
        if (h5Slot == 1) htmlId = id
        else if (h5Slot == 2) headId = id
        else if (h5Slot == 3) bodyId = id
      } else if (h5Slot != 0 && selfClosed) {
        // the slot was claimed BEFORE selfClosed was knowable: h5Pre's
        // popToHtml must not stand for what ends up an ordinary leaf —
        // restore the stack (entries above sp are untouched: a leaf alloc
        // pushes nothing), so open elements stay open
        sp = spBeforeH5
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
      val tagStart = i
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
        val m = stack(match_)
        if (opts.html5Tree && (m == htmlId || m == headId || m == bodyId)) {
          // crawl mode: the html/head/body close tag becomes a RAWSPAN
          // child holding its exact source bytes — content arriving later
          // re-enters the element AFTER it, so re-render stays
          // byte-identical ('<p>a</body>b' keeps b after the close; the
          // F_END_TAG flag would render it before)
          val raw = a.allocChild(a.RAWSPAN, m)
          a.textOff(raw) = tagStart; a.textLen(raw) = i - tagStart
        } else a.flags(m) |= a.F_END_TAG
        // formatting reconstruction LITE (crawl mode): a mismatched
        // formatting close (<b><i></b>text) pops the inner formatting
        // elements; re-open them as IMPLIED clones (transparent render =
        // byte identity kept) so following content keeps its formatting
        // ancestry — the common-case approximation of the HTML5 adoption
        // agency. Only when EVERYTHING popped through is formatting, and
        // bounded (8) against pathological nesting bombs.
        var reopen: List[Int] = Nil
        if (opts.html5Tree && isFormatting(m) && match_ < sp - 1 && sp - match_ - 1 <= 8) {
          var s = match_ + 1
          var all = true
          while (s < sp && all) { if (!isFormatting(stack(s))) all = false; s += 1 }
          if (all) reopen = (match_ + 1 until sp).map(stack(_)).toList
        }
        sp = match_
        reopen.foreach { orig =>
          val c = a.allocChild(a.ELEM, cur)
          a.nameOff(c) = a.nameOff(orig); a.nameLen(c) = a.nameLen(orig)
          a.flags(c) = a.F_IMPLIED
          var at = a.attrHead(orig) // clones keep the attributes (selectors)
          while (at >= 0) {
            if (!a.aRemoved(at)) {
              val na = a.allocAttr()
              a.aKeyOff(na) = a.aKeyOff(at); a.aKeyLen(na) = a.aKeyLen(at)
              a.aValOff(na) = a.aValOff(at); a.aValLen(na) = a.aValLen(at)
              a.aQuote(na) = a.aQuote(at)
              a.appendAttr(c, na)
            }
            at = a.aNext(at)
          }
          if (sp < maxDepth) push(c)
        }
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
