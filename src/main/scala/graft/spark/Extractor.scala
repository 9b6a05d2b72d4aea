package graft.spark

import graft.dom.Arena
import graft.html.{ParseOptions, Parser}
import graft.query.{Elems, VDoc}
import graft.selector.Selector
import java.util.concurrent.ConcurrentHashMap

/** Per-row extraction entry point for Spark executors.
  *
  * Design for scale (north rule): one reusable [[Arena]] per executor thread
  * — parsing a page touches only pre-grown primitive arrays, so a long
  * `mapPartitions` loop allocates close to nothing per row and GC pressure
  * stays flat at 10^12-document scale. Selectors are parsed once per JVM and
  * cached (the reference parses per query too — `mesdoc::init` + lazy_static
  * caches, reference `src/mesdoc/selector/rule.rs:10-12`).
  */
object Extractor extends Serializable {

  /** selector-driven boilerplate-strip recipe (north star: "nav/ads/script/
    * style removal, main-content DOM heuristics"). */
  final case class Recipe(
      remove: String = Recipe.DefaultRemove,
      mainCandidates: Seq[String] = Recipe.DefaultMain)

  object Recipe {
    val DefaultRemove = "script,style,nav,aside,header,footer,[hidden]"
    val DefaultMain: Seq[String] = Seq("main", "[role='main']", "#content", "body")
    val default: Recipe = Recipe()
  }

  private val arenas = new ThreadLocal[Arena] {
    override def initialValue(): Arena = new Arena(1024)
  }

  private val selectorCache = new ConcurrentHashMap[String, Either[String, Selector]]()
  // extract_text's selector operand is an arbitrary expression: a per-row
  // dynamic selector must not grow executor memory without bound
  private final val SelectorCacheCap = 4096

  def compiled(sel: String): Either[String, Selector] = {
    val hit = selectorCache.get(sel)
    if (hit != null) return hit
    val parsed = Selector.parse(sel, useLookup = true)
    if (selectorCache.size < SelectorCacheCap) selectorCache.putIfAbsent(sel, parsed)
    parsed
  }

  /** parse into the thread-local arena; null on parse failure. Same
    * giant-page shrink guard as [[parseBytes]] — STRING-column workloads
    * must not pin a rare huge page's buffers either. */
  def parse(html: String): VDoc = {
    var arena = arenas.get()
    if (arena.buf.length > ArenaShrinkChars && html.length < (ArenaShrinkChars >> 3)) {
      arena = new graft.dom.Arena(1024)
      arenas.set(arena)
    }
    Parser.parseInto(arena, html, ParseOptions.compat) match {
      case Some(_) => null
      case None => new VDoc(arena)
    }
  }

  /** [[parse]] under the CRAWL profile (compat fixes + HTML5 implicit
    * tree): implied html/head/body + auto-close, for real crawl pages
    * that never wrote `<body>`. */
  def parseCrawl(html: String): VDoc = {
    var arena = arenas.get()
    if (arena.buf.length > ArenaShrinkChars && html.length < (ArenaShrinkChars >> 3)) {
      arena = new graft.dom.Arena(1024)
      arenas.set(arena)
    }
    Parser.parseInto(arena, html, ParseOptions.crawl) match {
      case Some(_) => null
      case None => new VDoc(arena)
    }
  }

  /** a rare giant page must not pin executor memory forever: drop the
    * thread-local arena back to a fresh one when its buffers grew far beyond
    * what the current row needs. */
  private final val ArenaShrinkChars = 32 << 20

  /** parse UTF-8 bytes into the thread-local arena (no intermediate String /
    * char[] garbage); null on parse failure. */
  def parseBytes(html: Array[Byte]): VDoc = parseBytesWith(html, ParseOptions.compat)

  private def parseBytesWith(html: Array[Byte], opts: ParseOptions): VDoc = {
    var arena = arenas.get()
    if (arena.buf.length > ArenaShrinkChars && html.length < (ArenaShrinkChars >> 3)) {
      arena = new graft.dom.Arena(1024)
      arenas.set(arena)
    }
    Parser.parseIntoUtf8(arena, html, opts) match {
      case Some(_) => null
      case None => new VDoc(arena)
    }
  }

  /** node-local simples (tag/class/id/attr): match is independent of the
    * rest of the tree, so it can be evaluated mid-walk regardless of
    * pending removals. */
  private def nodeLocal(s: graft.selector.Simple): Boolean = s match {
    case graft.selector.Simple.All => true
    case _: graft.selector.Simple.Tag => true
    case _: graft.selector.Simple.Cls => true
    case _: graft.selector.Simple.Id => true
    case _: graft.selector.Simple.Attr => true
    case _ => false
  }

  /** simple single-compound descendant predicates of the candidate
    * selectors (node-local only — they are evaluated during the fused
    * strip walk, before removal executes), or null if any candidate needs
    * the general engine. */
  private def candidateCompounds(recipe: Recipe): Array[Array[graft.selector.Simple]] = {
    val out = new Array[Array[graft.selector.Simple]](recipe.mainCandidates.length)
    var i = 0
    recipe.mainCandidates.foreach { s =>
      compiled(s) match {
        case Right(sel) if sel.process.lengthCompare(1) == 0 &&
          sel.process.head.shouldIn.isEmpty &&
          sel.process.head.query.lengthCompare(1) == 0 &&
          sel.process.head.query.head.comb == graft.selector.Combinator.ChildrenAll &&
          sel.process.head.query.head.simples.forall(nodeLocal) =>
          out(i) = sel.process.head.query.head.simples.toArray
        case _ => return null
      }
      i += 1
    }
    out
  }

  /** a selector's comma groups as flat compounds when every group is a
    * single-segment descendant predicate of non-positional simples
    * (matching is done on the intact tree, exactly like find): these
    * qualify for the fused one-pass tree walk instead of the general
    * engine. Null when any group needs the engine. */
  private def simpleCompounds(sel: graft.selector.Selector): Array[Array[graft.selector.Simple]] =
    if (sel.process.forall(p =>
      p.shouldIn.isEmpty && p.query.lengthCompare(1) == 0 &&
        p.query.head.comb == graft.selector.Combinator.ChildrenAll &&
        !p.query.head.simples.exists(graft.query.Engine.isPositional)))
      sel.process.iterator.map(_.query.head.simples.toArray).toArray
    else null

  private def stripCompounds(recipe: Recipe): Array[Array[graft.selector.Simple]] =
    compiledCompounds(recipe.remove) // per-JVM cached (hot path: per row)

  /** per-Recipe cache of (strip, candidate) fused-walk compounds:
    * selectMain runs per ROW, and re-deriving the compound arrays there
    * allocated per-row garbage for a value that is constant per recipe.
    * The sentinel pairs a null slot for "needs the general engine". */
  private val recipeCache =
    new ConcurrentHashMap[Recipe, (Array[Array[graft.selector.Simple]], Array[Array[graft.selector.Simple]])]()

  private def recipeCompounds(recipe: Recipe): (Array[Array[graft.selector.Simple]], Array[Array[graft.selector.Simple]]) = {
    val hit = recipeCache.get(recipe)
    if (hit != null) return hit
    val computed = (stripCompounds(recipe), candidateCompounds(recipe))
    if (recipeCache.size < SelectorCacheCap) recipeCache.putIfAbsent(recipe, computed)
    computed
  }

  /** cached fused-walk compounds per selector string (null entries mean
    * "needs the general engine"); same cap discipline as the selector
    * cache. */
  private val compoundCache =
    new ConcurrentHashMap[String, Array[Array[graft.selector.Simple]]]()
  private val NoCompounds = new Array[Array[graft.selector.Simple]](0)

  private def compiledCompounds(selStr: String): Array[Array[graft.selector.Simple]] = {
    val hit = compoundCache.get(selStr)
    if (hit != null) return if (hit.length == 0) null else hit
    val computed = compiled(selStr) match {
      case Right(sel) => simpleCompounds(sel)
      case _ => null
    }
    if (compoundCache.size < SelectorCacheCap)
      compoundCache.putIfAbsent(selStr, if (computed == null) NoCompounds else computed)
    computed
  }

  @inline private def matchesCompound(doc: VDoc, c: Int,
      simples: Array[graft.selector.Simple]): Boolean = {
    var all = true
    var si = 0
    while (all && si < simples.length) {
      all = graft.query.Engine.matchOne(doc, c, simples(si))
      si += 1
    }
    all
  }

  @inline private def matchesAnyCompound(doc: VDoc, c: Int,
      compounds: Array[Array[graft.selector.Simple]]): Boolean = {
    var pi = 0
    while (pi < compounds.length) {
      if (matchesCompound(doc, c, compounds(pi))) return true
      pi += 1
    }
    false
  }

  /** pick the recipe's main-content element set after boilerplate removal;
    * selectors come from the per-JVM parse cache.
    *
    * Fast path (the default recipe shape): ONE fused tree pass does both
    * the strip match and the candidate match — a strip-matched element is
    * recorded for removal and its subtree is NOT entered (removing the
    * root detaches everything below, and candidates must not come from
    * stripped subtrees), which skips the bulk of a boilerplate-heavy page.
    * Candidate simples are node-local (tag/class/id/attr), so evaluating
    * them before the batched removal is indistinguishable from
    * remove-then-find. Falls back to the general engine otherwise. */
  private def selectMain(doc: VDoc, recipe: Recipe): Elems = {
    val root = doc.rootElems
    val (strip, cands) = recipeCompounds(recipe)
    if (strip != null && cands != null) {
      val a = doc.arena
      val firstMatch = Array.fill(cands.length)(-1)
      val toRemove = new scala.collection.mutable.ArrayBuffer[Int](8)
      def rec(node: Int): Unit = {
        var c = a.firstChild(node)
        while (c >= 0) {
          if (a.kind(c) == a.ELEM) {
            if (matchesAnyCompound(doc, c, strip)) toRemove += c
            else {
              var i = 0
              while (i < cands.length) {
                if (firstMatch(i) < 0 && matchesCompound(doc, c, cands(i))) firstMatch(i) = c
                i += 1
              }
              if (a.firstChild(c) >= 0) rec(c)
            }
          }
          c = a.nextSib(c)
        }
      }
      rec(0)
      if (toRemove.nonEmpty) new Elems(doc, toRemove.toArray).remove()
      var i = 0
      while (i < firstMatch.length) {
        if (firstMatch(i) >= 0) return new Elems(doc, Array(firstMatch(i)))
        i += 1
      }
      return root
    }
    root.find(recipe.remove).remove()
    var main: Elems = null
    val it = recipe.mainCandidates.iterator
    while (main == null && it.hasNext) {
      val found = root.find(it.next())
      if (found.nonEmpty) main = found.first()
    }
    if (main == null) root else main
  }

  private def extractMainFrom(doc: VDoc, recipe: Recipe): String = {
    if (doc == null) return null
    selectMain(doc, recipe).text()
  }

  /** [[parseBytes]] under the CRAWL profile — see [[parseCrawl]]. */
  def parseBytesCrawl(html: Array[Byte]): VDoc = parseBytesWith(html, ParseOptions.crawl)

  /** main-content extraction: remove boilerplate, pick the first matching
    * main-content candidate, return its text(). Null on parse failure. */
  def extractMain(html: String, recipe: Recipe): String =
    extractMainFrom(parse(html), recipe)

  def extractMain(htmlBytes: Array[Byte], recipe: Recipe): String =
    if (htmlBytes == null) null
    else extractMainFrom(parseBytes(htmlBytes), recipe)

  /** generic `extract_text(html, selector)` — text() of all matches. */
  def extractText(html: String, selector: String): String = {
    val doc = parse(html)
    if (doc == null) return null
    compiled(selector) match {
      case Left(_) => null
      case Right(sel) =>
        import scala.collection.mutable.ArrayBuffer
        val found = graft.query.Engine.findSelector(doc, ArrayBuffer(0), sel)
        val sb = new java.lang.StringBuilder(64)
        found.foreach(e => doc.arena.textContent(e, sb))
        sb.toString
    }
  }

  /** static entry used from generated code (ExtractText.doGenCode).
    * Defensive like every BINARY entry: ANY per-row failure yields null —
    * the same bytes must have the same fate whether the column is STRING
    * or BINARY. */
  def extractTextCodegen(html: org.apache.spark.unsafe.types.UTF8String,
      selector: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String =
    if (html == null) null else extractTextCodegenBinary(html.getBytes, selector)

  private val utf8Out = new ThreadLocal[graft.dom.Utf8Builder] {
    override def initialValue(): graft.dom.Utf8Builder = new graft.dom.Utf8Builder()
  }

  /** the output slab gets the same pin-guard as the arena: one rare giant
    * extracted text must not hold executor memory for the thread's
    * lifetime. */
  private def outBuilder(): graft.dom.Utf8Builder = {
    val b = utf8Out.get()
    if (b.buf.length > ArenaShrinkChars) {
      val fresh = new graft.dom.Utf8Builder()
      utf8Out.set(fresh)
      fresh
    } else b
  }

  /** hot path: bytes in, UTF-8 bytes out — no UTF-16 String round trip.
    * Defensive: ANY per-row failure (parse error, pathological input) yields
    * null — a lineage `failure_count` increment, never a task failure. */
  def extractMainCodegen(html: Array[Byte]): org.apache.spark.unsafe.types.UTF8String = {
    if (html == null) return null
    try {
      val doc = parseBytes(html)
      if (doc == null) return null
      val main = selectMain(doc, Recipe.default)
      val ub = outBuilder()
      ub.reset()
      main.ids.foreach(e => doc.arena.textContentUtf8(e, ub))
      org.apache.spark.unsafe.types.UTF8String.fromBytes(ub.toBytes)
    } catch {
      case scala.util.control.NonFatal(_) => null
      // belt over the parser's maxDepth=2048 cap: should a recursive walk
      // ever overflow the task stack anyway, the row degrades to null
      // after full unwind instead of failing the task (NonFatal does not
      // match StackOverflowError)
      case _: StackOverflowError => null
    }
  }

  /** zero-copy variant of [[extractMainCodegen]]: wraps the thread-local
    * builder slab directly (`UTF8String.fromBytes(buf, 0, len)`) instead of
    * copying it out. The result is valid ONLY until this thread's next
    * extraction resets the slab — safe for consumers that materialize
    * immediately (UnsafeRowWriter projections copy the bytes into the row
    * buffer before the next expression evaluates), UNSAFE for
    * reference-retaining consumers (TypedImperativeAggregate results like
    * collect_list hold expression outputs across rows). Measurement entry
    * for the output-copy lever (BASELINE.md) — the shipped expressions use
    * the copying path unless the measured win justifies the hazard. */
  def extractMainCodegenView(html: Array[Byte]): org.apache.spark.unsafe.types.UTF8String = {
    if (html == null) return null
    try {
      val doc = parseBytes(html)
      if (doc == null) return null
      val main = selectMain(doc, Recipe.default)
      val ub = outBuilder()
      ub.reset()
      main.ids.foreach(e => doc.arena.textContentUtf8(e, ub))
      org.apache.spark.unsafe.types.UTF8String.fromBytes(ub.buf, 0, ub.len)
    } catch {
      case scala.util.control.NonFatal(_) => null
      case _: StackOverflowError => null // row degrades, task survives (see first belt note)
    }
  }

  /** STRING entries delegate to the byte-native paths via the UTF8String's
    * underlying UTF-8 bytes: no UTF-16 round trip of the page, and STRING
    * and BINARY columns give the same bytes the same fate by construction
    * (the round-4 interpreted-vs-codegen unification, now structural). */
  def extractMainCodegenStr(html: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String =
    if (html == null) null else extractMainCodegen(html.getBytes)

  /** `extract_main_crawl` static entries: the SAME boilerplate-strip
    * recipe over the CRAWL parse profile — on fragment pages the implied
    * `body` gives the recipe's `body` candidate something to match, so
    * extraction returns main content instead of falling back to the whole
    * root (titles and all). Defensive null-on-failure like every entry. */
  def extractMainCrawlCodegen(html: Array[Byte]): org.apache.spark.unsafe.types.UTF8String = {
    if (html == null) return null
    try {
      val doc = parseBytesCrawl(html)
      if (doc == null) return null
      val main = selectMain(doc, Recipe.default)
      val ub = outBuilder()
      ub.reset()
      main.ids.foreach(e => doc.arena.textContentUtf8(e, ub))
      org.apache.spark.unsafe.types.UTF8String.fromBytes(ub.toBytes)
    } catch {
      case scala.util.control.NonFatal(_) => null
      case _: StackOverflowError => null // row degrades, task survives (see first belt note)
    }
  }

  def extractMainCrawlCodegenStr(html: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String =
    if (html == null) null else extractMainCrawlCodegen(html.getBytes)

  /** byte-native hot path for BINARY input: UTF-8 in (parseBytes), UTF-8 out
    * (Utf8Builder) — no UTF-16 String round trip of the page, same as
    * extract_main's path. */
  def extractTextCodegenBinary(html: Array[Byte],
      selector: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    if (html == null || selector == null) return null
    try {
      val doc = parseBytes(html)
      if (doc == null) return null
      val selStr = selector.toString
      val compounds = compiledCompounds(selStr)
      val ub = outBuilder()
      ub.reset()
      if (compounds != null) {
        // fused fast path: find()'s doc-order union-with-dedup over simple
        // comma groups IS one doc-order walk testing each element once
        // (nested matches included, exactly like the general engine)
        val a = doc.arena
        def rec(node: Int): Unit = {
          var c = a.firstChild(node)
          while (c >= 0) {
            if (a.kind(c) == a.ELEM) {
              if (matchesAnyCompound(doc, c, compounds)) a.textContentUtf8(c, ub)
              rec(c)
            }
            c = a.nextSib(c)
          }
        }
        rec(0)
      } else compiled(selStr) match {
        case Left(_) => return null
        case Right(sel) =>
          import scala.collection.mutable.ArrayBuffer
          val found = graft.query.Engine.findSelector(doc, ArrayBuffer(0), sel)
          found.foreach(e => doc.arena.textContentUtf8(e, ub))
      }
      org.apache.spark.unsafe.types.UTF8String.fromBytes(ub.toBytes)
    } catch {
      case scala.util.control.NonFatal(_) => null
      case _: StackOverflowError => null // row degrades, task survives (see first belt note)
    }
  }

  /** outerHtml() of every selector match in document order (the reference
    * flow find(sel) + outer_html, reference elements.rs render path). */
  private def extractOuterHtmlFrom(doc: VDoc, selector: String): Array[String] =
    compiled(selector) match {
      case Left(_) => null
      case Right(sel) =>
        import scala.collection.mutable.ArrayBuffer
        val found = graft.query.Engine.findSelector(doc, ArrayBuffer(0), sel)
        val out = new Array[String](found.length)
        var i = 0
        while (i < found.length) {
          out(i) = new graft.query.Elems(doc, Array(found(i))).outerHtml()
          i += 1
        }
        out
    }

  def extractOuterHtmlCodegen(html: org.apache.spark.unsafe.types.UTF8String,
      sel: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    if (html == null) null else extractOuterHtmlCodegenBinary(html.getBytes, sel)

  /** byte-native BINARY path (parseBytes; only the matched snippets
    * materialize as Strings). */
  def extractOuterHtmlCodegenBinary(html: Array[Byte],
      sel: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (html == null || sel == null) return null
    try {
      val doc = parseBytes(html)
      if (doc == null) return null
      attrsToArrayData(extractOuterHtmlFrom(doc, sel.toString))
    } catch {
      case scala.util.control.NonFatal(_) => null
      case _: StackOverflowError => null // row degrades, task survives (see first belt note)
    }
  }

  /** `attr(name)` of every selector match, in document order (the reference
    * flow `find(sel)` + per-element `attr`, reference elements.rs:3191);
    * null on parse/selector failure, null entries never emitted —
    * boolean attributes yield "" (IAttrValue::True analog). */
  def extractAttrs(html: String, selector: String, attrName: String): Array[String] = {
    val doc = parse(html)
    if (doc == null) return null
    extractAttrsFrom(doc, selector, attrName)
  }

  private def extractAttrsFrom(doc: VDoc, selector: String, attrName: String): Array[String] =
    compiled(selector) match {
      case Left(_) => null
      case Right(sel) =>
        import scala.collection.mutable.ArrayBuffer
        val found = graft.query.Engine.findSelector(doc, ArrayBuffer(0), sel)
        val out = new ArrayBuffer[String](found.length)
        found.foreach { e =>
          new graft.query.Elems(doc, Array(e)).attr(attrName).foreach(v => out += v.value)
        }
        out.toArray
    }

  /** codegen entries for extract_attrs / extract_count (static calls from
    * generated code; null propagates as SQL NULL). */
  def extractAttrsCodegen(html: org.apache.spark.unsafe.types.UTF8String,
      sel: org.apache.spark.unsafe.types.UTF8String,
      attr: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    if (html == null) null else extractAttrsCodegenBinary(html.getBytes, sel, attr)

  /** byte-native BINARY path: the page parses straight from UTF-8 (no
    * UTF-16 inflation); only the small matched attr values materialize as
    * Strings. */
  def extractAttrsCodegenBinary(html: Array[Byte],
      sel: org.apache.spark.unsafe.types.UTF8String,
      attr: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (html == null || sel == null || attr == null) return null
    try {
      val doc = parseBytes(html)
      if (doc == null) return null
      val selStr = sel.toString
      val attrName = attr.toString
      val compounds = compiledCompounds(selStr)
      if (compounds != null) {
        // fused walk (same contract as extract_text: doc order, each node
        // tested once); only matched elements' attr values materialize
        val a = doc.arena
        val out = new scala.collection.mutable.ArrayBuffer[String](8)
        def rec(node: Int): Unit = {
          var c = a.firstChild(node)
          while (c >= 0) {
            if (a.kind(c) == a.ELEM) {
              if (matchesAnyCompound(doc, c, compounds))
                new graft.query.Elems(doc, Array(c)).attr(attrName).foreach(v => out += v.value)
              rec(c)
            }
            c = a.nextSib(c)
          }
        }
        rec(0)
        attrsToArrayData(out.toArray)
      } else attrsToArrayData(extractAttrsFrom(doc, selStr, attrName))
    } catch {
      case scala.util.control.NonFatal(_) => null
      case _: StackOverflowError => null // row degrades, task survives (see first belt note)
    }
  }

  private def attrsToArrayData(out: Array[String]): org.apache.spark.sql.catalyst.util.ArrayData =
    if (out == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.map(v => org.apache.spark.unsafe.types.UTF8String.fromString(v).asInstanceOf[Any]))

  def extractCountCodegen(html: org.apache.spark.unsafe.types.UTF8String,
      sel: org.apache.spark.unsafe.types.UTF8String): java.lang.Long =
    if (html == null) null else extractCountCodegenBinary(html.getBytes, sel)

  /** byte-native BINARY path: parseBytes, never a page-sized String. */
  def extractCountCodegenBinary(html: Array[Byte],
      sel: org.apache.spark.unsafe.types.UTF8String): java.lang.Long = {
    if (html == null || sel == null) return null
    try {
      val doc = parseBytes(html)
      if (doc == null) return null
      val selStr = sel.toString
      val compounds = compiledCompounds(selStr)
      if (compounds != null) {
        val a = doc.arena
        var count = 0L
        def rec(node: Int): Unit = {
          var c = a.firstChild(node)
          while (c >= 0) {
            if (a.kind(c) == a.ELEM) {
              if (matchesAnyCompound(doc, c, compounds)) count += 1
              rec(c)
            }
            c = a.nextSib(c)
          }
        }
        rec(0)
        java.lang.Long.valueOf(count)
      } else compiled(selStr) match {
        case Left(_) => null
        case Right(s) =>
          import scala.collection.mutable.ArrayBuffer
          java.lang.Long.valueOf(
            graft.query.Engine.findSelector(doc, ArrayBuffer(0), s).length.toLong)
      }
    } catch {
      case scala.util.control.NonFatal(_) => null
      case _: StackOverflowError => null // row degrades, task survives (see first belt note)
    }
  }

  /** number of selector matches (find(sel).length at SQL level); -1 is
    * never emitted — null on parse/selector failure. */
  def extractCount(html: String, selector: String): java.lang.Long = {
    val doc = parse(html)
    if (doc == null) return null
    compiled(selector) match {
      case Left(_) => null
      case Right(sel) =>
        import scala.collection.mutable.ArrayBuffer
        java.lang.Long.valueOf(
          graft.query.Engine.findSelector(doc, ArrayBuffer(0), sel).length.toLong)
    }
  }

  /** `extract_links(html, base_url)` static entries: every `a[href]` in
    * document order, resolved per RFC 3986 against the page's effective
    * base and normalized to crawl identity ([[UrlOps.normalize]]). The
    * effective base is the first `base[href]` element resolved against
    * `base_url` (HTML's document-base rule — one base per document,
    * first wins), else `base_url` itself. Unresolvable / unnormalizable
    * hrefs are skipped (crawl tolerance); parse failure yields null. */
  def extractLinksCodegen(html: org.apache.spark.unsafe.types.UTF8String,
      base: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    if (html == null) null else extractLinksCodegenBinary(html.getBytes, base)

  /** the page's effective base URL: HTML's document-base rule — the
    * first `base[href]` element wins, itself resolved against the page
    * URL; the page URL otherwise. Hrefs are entity-decoded here (attr()
    * returns raw source bytes, reference parity — links are the one
    * place the HTML-level value matters). */
  private def effectiveBase(doc: VDoc, pageUrl: String): String = {
    val baseHrefs = extractAttrsFrom(doc, "base[href]", "href")
    val b =
      if (baseHrefs != null && baseHrefs.nonEmpty)
        UrlOps.resolve(pageUrl, graft.dom.Entities.decode(baseHrefs(0)))
      else null
    if (b != null) b else pageUrl
  }

  /** byte-native BINARY path: parseBytes, only hrefs materialize as
    * Strings. */
  def extractLinksCodegenBinary(html: Array[Byte],
      base: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (html == null || base == null) return null
    try {
      val doc = parseBytes(html)
      if (doc == null) return null
      val pageUrl = base.toString
      val effBase = effectiveBase(doc, pageUrl)
      val hrefs = extractAttrsFrom(doc, "a[href]", "href")
      if (hrefs == null) return null
      // split the base ONCE per page, not per href (pages carry
      // thousands of links at crawl scale)
      val bSplit = UrlOps.split(UrlOps.preClean(effBase))
      val out = new scala.collection.mutable.ArrayBuffer[String](hrefs.length)
      var i = 0
      while (i < hrefs.length) {
        val r = UrlOps.resolveParsed(bSplit, graft.dom.Entities.decode(hrefs(i)))
        if (r != null) {
          val n = UrlOps.normalize(r)
          if (n != null) out += n
        }
        i += 1
      }
      attrsToArrayData(out.toArray)
    } catch {
      case scala.util.control.NonFatal(_) => null
      case _: StackOverflowError => null // row degrades, task survives (see first belt note)
    }
  }

  /** `extract_anchors(html, base_url)` static entries: every `a[href]`
    * in document order as STRUCT<href, text> — the WAT-style anchor
    * signal (inbound anchor text is a page-quality / relevance feature a
    * links-only extraction throws away). `href` resolves and normalizes
    * exactly like [[extractLinksCodegenBinary]]; `text` is the anchor's
    * extracted text (the parity `text()`). Unresolvable hrefs are
    * skipped; parse failure yields null. */
  def extractAnchorsCodegen(html: org.apache.spark.unsafe.types.UTF8String,
      base: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    if (html == null) null else extractAnchorsCodegenBinary(html.getBytes, base)

  def extractAnchorsCodegenBinary(html: Array[Byte],
      base: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (html == null || base == null) return null
    try {
      val doc = parseBytes(html)
      if (doc == null) return null
      val effBase = effectiveBase(doc, base.toString)
      val bSplit = UrlOps.split(UrlOps.preClean(effBase))
      compiled("a[href]") match {
        case Left(_) => null
        case Right(sel) =>
          import scala.collection.mutable.ArrayBuffer
          val found = graft.query.Engine.findSelector(doc, ArrayBuffer(0), sel)
          val out = new ArrayBuffer[org.apache.spark.sql.catalyst.InternalRow](found.length)
          found.foreach { e =>
            val el = new graft.query.Elems(doc, Array(e))
            el.attr("href").foreach { v =>
              val r = UrlOps.resolveParsed(bSplit, graft.dom.Entities.decode(v.value))
              if (r != null) {
                val n = UrlOps.normalize(r)
                if (n != null) out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
                  Array[Any](
                    org.apache.spark.unsafe.types.UTF8String.fromString(n),
                    org.apache.spark.unsafe.types.UTF8String.fromString(el.text())))
              }
            }
          }
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            out.toArray[Any])
      }
    } catch {
      case scala.util.control.NonFatal(_) => null
      case _: StackOverflowError => null
    }
  }

  /** `extract_canonical(html, base_url)`: the first
    * `link[rel~=canonical][href]` (rel is a case-insensitive token
    * list), resolved against the document base and normalized — the
    * dedup-cluster key a crawl keeps per page. Null when absent. */
  def extractCanonicalCodegen(html: org.apache.spark.unsafe.types.UTF8String,
      base: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String =
    if (html == null) null else extractCanonicalCodegenBinary(html.getBytes, base)

  def extractCanonicalCodegenBinary(html: Array[Byte],
      base: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    if (html == null || base == null) return null
    try {
      val doc = parseBytes(html)
      if (doc == null) return null
      val url = findRelUrl(doc, base.toString)
      if (url == null) null else org.apache.spark.unsafe.types.UTF8String.fromString(url)
    } catch {
      case scala.util.control.NonFatal(_) => null
      case _: StackOverflowError => null
    }
  }

  private def findRelUrl(doc: VDoc, pageUrl: String): String = {
    val compiledSel = compiled("link[href]")
    compiledSel match {
      case Left(_) => null
      case Right(sel) =>
        import scala.collection.mutable.ArrayBuffer
        val found = graft.query.Engine.findSelector(doc, ArrayBuffer(0), sel)
        // one base[href] scan per DOCUMENT, not per candidate link
        lazy val effBase = effectiveBase(doc, pageUrl)
        var i = 0
        while (i < found.length) {
          val el = new graft.query.Elems(doc, Array(found(i)))
          val rel = el.attr("rel")
          // rel matches on the HTML-level (entity-decoded) value, like
          // href — attr() itself stays raw-source
          if (rel.isDefined && hasToken(graft.dom.Entities.decode(rel.get.value), "canonical")) {
            val href = el.attr("href")
            if (href.isDefined) {
              val r = UrlOps.resolve(effBase, graft.dom.Entities.decode(href.get.value))
              if (r != null) {
                val n = UrlOps.normalize(r)
                if (n != null) return n
              }
            }
          }
          i += 1
        }
        null
    }
  }

  /** case-insensitive membership in an HTML space-separated token list
    * (the rel attribute's grammar). */
  private def hasToken(list: String, token: String): Boolean = {
    var i = 0
    val n = list.length
    while (i < n) {
      while (i < n && Character.isWhitespace(list.charAt(i))) i += 1
      var j = i
      while (j < n && !Character.isWhitespace(list.charAt(j))) j += 1
      if (j - i == token.length && list.regionMatches(true, i, token, 0, token.length))
        return true
      i = j
    }
    false
  }

  /** `extract_refresh(html, base_url)`: the redirect target of a
    * `meta[http-equiv=refresh]` (WHATWG content grammar:
    * `delay [;,] [url=] TARGET`, quotes optional, all case-insensitive),
    * resolved + normalized. Null when absent or the refresh has no URL
    * part (self-refresh). */
  def extractRefreshCodegen(html: org.apache.spark.unsafe.types.UTF8String,
      base: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String =
    if (html == null) null else extractRefreshCodegenBinary(html.getBytes, base)

  def extractRefreshCodegenBinary(html: Array[Byte],
      base: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    if (html == null || base == null) return null
    try {
      val doc = parseBytes(html)
      if (doc == null) return null
      val url = findRefreshUrl(doc, base.toString)
      if (url == null) null else org.apache.spark.unsafe.types.UTF8String.fromString(url)
    } catch {
      case scala.util.control.NonFatal(_) => null
      case _: StackOverflowError => null
    }
  }

  private def findRefreshUrl(doc: VDoc, pageUrl: String): String = {
    compiled("meta[http-equiv][content]") match {
      case Left(_) => null
      case Right(sel) =>
        import scala.collection.mutable.ArrayBuffer
        val found = graft.query.Engine.findSelector(doc, ArrayBuffer(0), sel)
        lazy val effBase = effectiveBase(doc, pageUrl)
        var i = 0
        while (i < found.length) {
          val el = new graft.query.Elems(doc, Array(found(i)))
          val he = el.attr("http-equiv")
          if (he.isDefined &&
            graft.dom.Entities.decode(he.get.value).equalsIgnoreCase("refresh")) {
            val content = el.attr("content")
            if (content.isDefined) {
              val target = parseRefreshContent(graft.dom.Entities.decode(content.get.value))
              if (target != null) {
                val r = UrlOps.resolve(effBase, target)
                if (r != null) {
                  val n = UrlOps.normalize(r)
                  if (n != null) return n
                }
              }
            }
          }
          i += 1
        }
        null
    }
  }

  /** WHATWG shared-declarative-refresh steps: leading ws, REQUIRED delay
    * digits (no digits = invalid, not a redirect), optional fraction,
    * then a ws / ';' / ',' separator (plain whitespace is valid — no
    * other char is), optional case-insensitive `url` `=` prefix, and a
    * quoted target TRUNCATED at its close quote. Null when invalid or
    * delay-only (self-refresh carries no redirect edge). */
  private[spark] def parseRefreshContent(content: String): String = {
    val n = content.length
    var i = 0
    while (i < n && Character.isWhitespace(content.charAt(i))) i += 1
    val digitStart = i
    while (i < n && content.charAt(i) >= '0' && content.charAt(i) <= '9') i += 1
    if (i == digitStart) return null
    if (i < n && content.charAt(i) == '.') {
      i += 1
      while (i < n && content.charAt(i) >= '0' && content.charAt(i) <= '9') i += 1
    }
    if (i >= n) return null
    val sep = content.charAt(i)
    if (!(Character.isWhitespace(sep) || sep == ';' || sep == ',')) return null
    while (i < n && Character.isWhitespace(content.charAt(i))) i += 1
    if (i < n && (content.charAt(i) == ';' || content.charAt(i) == ',')) i += 1
    while (i < n && Character.isWhitespace(content.charAt(i))) i += 1
    if (i >= n) return null
    val mark = i
    if (n - i >= 3 && content.regionMatches(true, i, "url", 0, 3)) {
      var j = i + 3
      while (j < n && Character.isWhitespace(content.charAt(j))) j += 1
      if (j < n && content.charAt(j) == '=') {
        j += 1
        while (j < n && Character.isWhitespace(content.charAt(j))) j += 1
        i = j
      } else i = mark // "url" without '=' is part of the target itself
    }
    if (i >= n) return null
    val q = content.charAt(i)
    val s = (if (q == '"' || q == '\'') {
      val close = content.indexOf(q, i + 1)
      if (close >= 0) content.substring(i + 1, close) else content.substring(i + 1)
    } else content.substring(i)).trim
    if (s.isEmpty) null else s
  }
}
