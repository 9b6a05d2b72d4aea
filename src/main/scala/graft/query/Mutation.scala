package graft.query

import graft.dom.Arena
import graft.html.{ParseOptions, Parser}
import scala.collection.mutable.ArrayBuffer

/** Node mutation — insertions, replacement, set_html, set_attribute
  * (reference `src/lib.rs:786-992,665-731`). Nodes MOVE (not copy) on
  * insertion, matching the reference's shared-`Rc` semantics
  * (`tests/insertion.rs:47-94`): handles in the inserted set are rebound to
  * the destination tree when the source was another document.
  */
object Mutation {

  sealed trait Pos
  case object BeforeBegin extends Pos
  case object AfterBegin extends Pos
  case object BeforeEnd extends Pos
  case object AfterEnd extends Pos

  /** guards (reference validate_dom_change, src/lib.rs:77-117). */
  private def validate(doc: VDoc, target: Int, nodeDoc: VDoc, node: Int, method: String): Boolean = {
    val a = doc.arena
    if (a.kind(target) != a.ELEM) {
      doc.reportError(s"$method: can't $method for this node type")
      return false
    }
    if (nodeDoc.arena.kind(node) == nodeDoc.arena.ROOT && nodeDoc.isDocument) {
      doc.reportError(s"$method: can't $method a document type")
      return false
    }
    if ((nodeDoc eq doc) && node == target) {
      doc.reportError(s"$method: can't $method a dom that contains itself")
      return false
    }
    if ((nodeDoc eq doc) && nodeDoc.arena.isAncestor(node, target)) {
      doc.reportError(s"$method: can't $method a dom that contains it's parent")
      return false
    }
    true
  }

  /** can `childKind` be inserted under `lowerTag`? (rphtml allow_insert —
    * behavior pinned by tests/insertion.rs:110-143: void tags accept
    * nothing; content tags accept only text). */
  private def allowInsert(a: Arena, lowerTag: String, child: Int, childArena: Arena): Boolean = {
    if (Parser.voidTags.contains(lowerTag)) false
    else if (Parser.contentTags.contains(lowerTag))
      childArena.kind(child) == childArena.TEXT || childArena.kind(child) == childArena.SPACES
    else true
  }

  /** insert `nodes` into each element of `targets` at `pos`, exactly like
    * the reference (elements.rs insert: `for ele in self` FORWARD over
    * targets, `dest.iter().rev()` over the TOP-LEVEL dest list) — so with
    * several targets the moved nodes end up owned by the LAST target, and
    * a multi-element (non-fragment) dest set lands in the order the
    * per-node insert_adjacent chain produces. A loaded fragment is ONE
    * dest entry whose children splice in document order as a group
    * (src/lib.rs:816-823). Rebinds `nodes` handles to the destination
    * document. */
  def insert(targets: Elems, nodes: Elems, pos: Pos): Unit = {
    if (targets.isEmpty) return
    val tdoc = targets.doc
    // per top-level dest entry: (doc, group ids) — groups move as units
    var groups: Array[(VDoc, Array[Int])] =
      nodes.ids.map(e => (nodes.doc, expandFragmentRoots(nodes.doc, Array(e))))
    var t = 0
    while (t < targets.ids.length) {
      val target = targets.ids(t)
      groups = groups.reverse.map { case (gdoc, gids) =>
        val moved = insertInto(tdoc, target, gdoc, gids, pos)
        if (moved != null) (tdoc, moved) else (gdoc, gids)
      }.reverse
      t += 1
    }
    if (groups.forall(_._1 eq tdoc)) {
      nodes.doc = tdoc
      nodes.ids = groups.flatMap(_._2)
    }
  }

  /** a loaded fragment's abstract root stands for its children; a DOCUMENT
    * root does not — inserting a document is an error caught by validate
    * (reference insert_adjacent DocumentFragement arm, src/lib.rs:816-823). */
  private def expandFragmentRoots(doc: VDoc, ids: Array[Int]): Array[Int] = {
    val a = doc.arena
    val out = new ArrayBuffer[Int]()
    ids.foreach { e =>
      if (a.kind(e) == a.ROOT && !doc.isDocument) {
        var c = a.firstChild(e)
        while (c >= 0) { out += c; c = a.nextSib(c) }
      } else out += e
    }
    out.toArray
  }

  /** insert nodes (from curDoc) into target (in tdoc); returns the node ids
    * in tdoc (possibly copies) or null when nothing was inserted. */
  private def insertInto(tdoc: VDoc, target: Int, curDoc: VDoc, curIds: Array[Int], pos: Pos): Array[Int] = {
    val a = tdoc.arena
    // validation per node
    val valid = curIds.filter(n => validate(tdoc, target, curDoc, n, posName(pos)))
    if (valid.isEmpty) return null
    // child-position inserts filter disallowed node kinds
    val filtered = pos match {
      case AfterBegin | BeforeEnd =>
        val tag = a.lowerName(target)
        valid.filter(n => allowInsert(a, tag, n, curDoc.arena))
      case _ => valid
    }
    if (filtered.isEmpty) return null // nothing inserted; nodes keep their tree
    // move into this arena (cross-document => deep copy + detach source)
    val local: Array[Int] = filtered.map { n =>
      if (curDoc eq tdoc) { tdoc.arena.detach(n); n }
      else { curDoc.arena.detach(n); deepCopy(curDoc, n, tdoc) }
    }
    // one insert_adjacent call's group lands in document order at every
    // position (the reference splices the nodes vec in order)
    pos match {
      case BeforeEnd => local.foreach(n => a.appendChild(target, n))
      case AfterBegin =>
        var i = local.length - 1
        while (i >= 0) { a.prependChild(target, local(i)); i -= 1 }
      case BeforeBegin =>
        if (a.parent(target) < 0) return null
        local.foreach(n => a.insertBefore(target, n))
      case AfterEnd =>
        if (a.parent(target) < 0) return null
        var i = local.length - 1
        while (i >= 0) { a.insertAfter(target, local(i)); i -= 1 }
    }
    tdoc.arena.idMapDirty = true
    local
  }

  private def posName(p: Pos): String = p match {
    case BeforeBegin => "insert_before"
    case AfterBegin => "prepend"
    case BeforeEnd => "append"
    case AfterEnd => "insert_after"
  }

  /** replace each element of `self` with `nodes`, exactly like the
    * reference's `replace` + `replace_with` chain (elements.rs `for ele in
    * self { for inserted in dest.rev() { ele.replace_with(inserted) } }`,
    * src/lib.rs:926-992): the handle REBINDS to each single-node
    * replacement, so a multi-element dest set chains — the target is
    * replaced by the last dest entry, which is then replaced by the one
    * before it, leaving only the FIRST dest entry in the tree. A fragment
    * with several children splices them all and DOESN'T rebind (the
    * detached handle makes further chain steps no-ops), matching
    * `replace_ele` being set only for single-child fragments. */
  def replaceWith(self: Elems, nodes: Elems): Unit = {
    if (self.isEmpty) return
    val tdoc = self.doc
    var groups: Array[(VDoc, Array[Int])] =
      nodes.ids.map(e => (nodes.doc, expandFragmentRoots(nodes.doc, Array(e))))
    val newIds = new ArrayBuffer[Int]()
    self.ids.foreach { e =>
      val a = tdoc.arena
      var cur = e // the rebinding handle
      groups = groups.reverse.map { case (gdoc, gids) =>
        if (a.parent(cur) >= 0 && gids.nonEmpty) {
          val local: Array[Int] = gids.map { n =>
            if (gdoc eq tdoc) { tdoc.arena.detach(n); n }
            else { gdoc.arena.detach(n); deepCopy(gdoc, n, tdoc) }
          }
          local.foreach(n => a.insertBefore(cur, n))
          a.detach(cur)
          if (local.length == 1) cur = local(0) // rebind (reference replace_ele)
          tdoc.arena.idMapDirty = true
          (tdoc, local)
        } else (gdoc, gids)
      }.reverse
      if (cur != e) newIds += cur
    }
    if (newIds.nonEmpty) { self.ids = newIds.toArray }
    if (groups.forall(_._1 eq tdoc)) {
      nodes.doc = tdoc
      nodes.ids = groups.flatMap(_._2)
    }
  }

  /** set_html (reference src/lib.rs:298-393): content tags store raw;
    * elements re-parse with the lenient sub-profile (without
    * auto_fix_unclosed_tag) and splice allowed nodes; text nodes are
    * replaced in place by the parsed nodes. */
  def setHtmlOn(doc: VDoc, node: Int, content: String): Unit = {
    val a = doc.arena
    val kind = a.kind(node)
    val isText = kind == a.TEXT || kind == a.SPACES
    val targetEle = if (isText) a.parent(node) else node
    if (targetEle < 0 || (a.kind(targetEle) != a.ELEM && a.kind(targetEle) != a.ROOT)) return
    if (a.kind(targetEle) == a.ELEM && a.isContentTag(targetEle) && !isText) {
      if (content.isEmpty) { a.textOff(targetEle) = 0; a.textLen(targetEle) = 0 }
      else a.setTextSpan(targetEle, content)
      return
    }
    val subOpts = ParseOptions(
      autoFixUnexpectedEndtag = true,
      autoFixUnescapedLt = true,
      allowSelfClosing = true,
      allowAttrKeyStartsWithEqualSign = true)
    val frag = new Arena(64)
    Parser.parseInto(frag, content, subOpts) match {
      case Some(e) => doc.reportError(s"set_html: ${e.message}"); return
      case None => ()
    }
    val fragDoc = new VDoc(frag)
    // collect the fragment's top-level nodes, filtered by allow_insert
    val tag = a.lowerName(targetEle)
    val tops = new ArrayBuffer[Int]()
    var c = frag.firstChild(0)
    while (c >= 0) {
      if (a.kind(targetEle) == a.ROOT || allowInsert(a, tag, c, frag)) tops += c
      c = frag.nextSib(c)
    }
    val copies = tops.map(n => deepCopy(fragDoc, n, doc))
    if (!isText) {
      a.clearChildren(targetEle)
      copies.foreach(n => a.appendChild(targetEle, n))
    } else {
      copies.foreach(n => a.insertBefore(node, n))
      a.detach(node)
    }
    a.idMapDirty = true
  }

  /** set_attribute with quote auto-selection and same-quote entity escaping
    * (reference src/lib.rs:665-731, tests/attr.rs:62-70). */
  def setAttribute(doc: VDoc, e: Int, name: String, value: Option[String]): Unit = {
    val a = doc.arena
    var quote = '"'
    val encoded: Option[String] = value.map { v =>
      var findQuote = false
      val sb = new java.lang.StringBuilder(v.length)
      v.foreach { ch =>
        if (ch == '"' || ch == '\'') {
          if (findQuote) {
            if (quote == ch) sb.append(if (ch == '"') "&quot;" else "&apos;")
            else sb.append(ch)
          } else {
            findQuote = true
            if (ch == '"') quote = '\''
            sb.append(ch)
          }
        } else sb.append(ch)
      }
      sb.toString
    }
    val lower = name.toLowerCase
    val existing = a.findAttr(e, lower)
    if (existing >= 0) {
      encoded match {
        case Some(s) =>
          val span = a.appendStrSpan(s)
          a.aValOff(existing) = (span >> 32).toInt
          a.aValLen(existing) = (span & 0xffffffffL).toInt
          if (a.aQuote(existing) == 0) a.aQuote(existing) = quote
        case None =>
          a.aValOff(existing) = -1; a.aValLen(existing) = 0; a.aQuote(existing) = 0
      }
    } else {
      val idx = a.allocAttr()
      val keySpan = a.appendStrSpan(name)
      a.aKeyOff(idx) = (keySpan >> 32).toInt
      a.aKeyLen(idx) = (keySpan & 0xffffffffL).toInt
      encoded match {
        case Some(s) =>
          val span = a.appendStrSpan(s)
          a.aValOff(idx) = (span >> 32).toInt
          a.aValLen(idx) = (span & 0xffffffffL).toInt
          a.aQuote(idx) = quote
        case None =>
          a.aValOff(idx) = -1
      }
      a.appendAttr(e, idx)
    }
    if (lower == "id") a.idMapDirty = true
  }

  /** deep copy of a subtree into (possibly another) arena; spans are shared
    * when source and destination arenas coincide. */
  def deepCopy(srcDoc: VDoc, node: Int, dstDoc: VDoc): Int = {
    val s = srcDoc.arena
    val d = dstDoc.arena
    val same = s eq d
    def copySpan(off: Int, len: Int): Int =
      if (same || len == 0) off else d.appendFrom(s, off, len)
    def rec(n: Int): Int = {
      val id = d.alloc(s.kind(n))
      d.flags(id) = s.flags(n)
      if (s.kind(n) == s.ELEM) {
        val no = copySpan(s.nameOff(n), s.nameLen(n))
        d.nameOff(id) = no; d.nameLen(id) = s.nameLen(n)
        // attrs
        var aIdx = s.attrHead(n)
        while (aIdx >= 0) {
          if (!s.aRemoved(aIdx)) {
            val na = d.allocAttr()
            val ko = copySpan(s.aKeyOff(aIdx), s.aKeyLen(aIdx))
            d.aKeyOff(na) = ko; d.aKeyLen(na) = s.aKeyLen(aIdx)
            if (s.aValOff(aIdx) >= 0) {
              val vo = copySpan(s.aValOff(aIdx), s.aValLen(aIdx))
              d.aValOff(na) = vo; d.aValLen(na) = s.aValLen(aIdx)
            }
            d.aQuote(na) = s.aQuote(aIdx)
            d.appendAttr(id, na)
          }
          aIdx = s.aNext(aIdx)
        }
      }
      if (s.textLen(n) > 0) {
        val to = copySpan(s.textOff(n), s.textLen(n))
        d.textOff(id) = to; d.textLen(id) = s.textLen(n)
      }
      var c = s.firstChild(n)
      while (c >= 0) {
        val cc = rec(c)
        d.appendChild(id, cc)
        c = s.nextSib(c)
      }
      id
    }
    val out = rec(node)
    d.idMapDirty = true
    out
  }
}
