package graft.dom

/** HTML entity decode/encode over UTF-8 byte spans.
  *
  * Re-derives the behavior visdom gets from the external `htmlentity` crate
  * (re-exported at reference `src/lib.rs:30-36`): decode of named / decimal /
  * hex entities for `text()` (reference `src/lib.rs:228-236`, RenderOptions
  * decode_entity=true) and `NamedOrDecimal` encoding of special characters
  * for `set_text` (reference `src/lib.rs:251-296`).
  *
  * Entity syntax is pure ASCII, so scanning byte spans is exact; multi-byte
  * UTF-8 runs between entities pass through untouched (memcpy on the UTF-8
  * output path).
  *
  * Named table: HTML4/Latin-1 + common HTML5 names (the subset that can
  * appear in this repo's deterministic fixture corpus; decode requires a
  * terminating `;`).
  */
object Entities {
  // name -> replacement string. Kept sorted logically by group for review.
  private val named: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](1024)
    def p(n: String, cp: Int): Unit = m.put(n, new String(Character.toChars(cp)))
    // XML / basics
    p("amp", '&'); p("lt", '<'); p("gt", '>'); p("quot", '"'); p("apos", '\'')
    // Latin-1 (160..255)
    val latin1 = Array(
      "nbsp", "iexcl", "cent", "pound", "curren", "yen", "brvbar", "sect",
      "uml", "copy", "ordf", "laquo", "not", "shy", "reg", "macr",
      "deg", "plusmn", "sup2", "sup3", "acute", "micro", "para", "middot",
      "cedil", "sup1", "ordm", "raquo", "frac14", "frac12", "frac34", "iquest",
      "Agrave", "Aacute", "Acirc", "Atilde", "Auml", "Aring", "AElig", "Ccedil",
      "Egrave", "Eacute", "Ecirc", "Euml", "Igrave", "Iacute", "Icirc", "Iuml",
      "ETH", "Ntilde", "Ograve", "Oacute", "Ocirc", "Otilde", "Ouml", "times",
      "Oslash", "Ugrave", "Uacute", "Ucirc", "Uuml", "Yacute", "THORN", "szlig",
      "agrave", "aacute", "acirc", "atilde", "auml", "aring", "aelig", "ccedil",
      "egrave", "eacute", "ecirc", "euml", "igrave", "iacute", "icirc", "iuml",
      "eth", "ntilde", "ograve", "oacute", "ocirc", "otilde", "ouml", "divide",
      "oslash", "ugrave", "uacute", "ucirc", "uuml", "yacute", "thorn", "yuml")
    var cp = 160
    latin1.foreach { n => p(n, cp); cp += 1 }
    // Latin extended / ligatures
    p("OElig", 0x152); p("oelig", 0x153); p("Scaron", 0x160); p("scaron", 0x161)
    p("Yuml", 0x178); p("fnof", 0x192); p("circ", 0x2C6); p("tilde", 0x2DC)
    // Greek
    val greekU = Array("Alpha", "Beta", "Gamma", "Delta", "Epsilon", "Zeta",
      "Eta", "Theta", "Iota", "Kappa", "Lambda", "Mu", "Nu", "Xi", "Omicron",
      "Pi", "Rho", "", "Sigma", "Tau", "Upsilon", "Phi", "Chi", "Psi", "Omega")
    var g = 0x391
    greekU.foreach { n => if (n.nonEmpty) p(n, g); g += 1 }
    val greekL = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron",
      "pi", "rho", "sigmaf", "sigma", "tau", "upsilon", "phi", "chi", "psi",
      "omega")
    g = 0x3B1
    greekL.foreach { n => p(n, g); g += 1 }
    p("thetasym", 0x3D1); p("upsih", 0x3D2); p("piv", 0x3D6)
    // punctuation / typographic
    p("ensp", 0x2002); p("emsp", 0x2003); p("thinsp", 0x2009)
    p("zwnj", 0x200C); p("zwj", 0x200D); p("lrm", 0x200E); p("rlm", 0x200F)
    p("ndash", 0x2013); p("mdash", 0x2014)
    p("lsquo", 0x2018); p("rsquo", 0x2019); p("sbquo", 0x201A)
    p("ldquo", 0x201C); p("rdquo", 0x201D); p("bdquo", 0x201E)
    p("dagger", 0x2020); p("Dagger", 0x2021); p("bull", 0x2022)
    p("hellip", 0x2026); p("permil", 0x2030); p("prime", 0x2032)
    p("Prime", 0x2033); p("lsaquo", 0x2039); p("rsaquo", 0x203A)
    p("oline", 0x203E); p("frasl", 0x2044); p("euro", 0x20AC)
    // letterlike / arrows
    p("alefsym", 0x2135); p("weierp", 0x2118); p("image", 0x2111); p("real", 0x211C)
    p("trade", 0x2122)
    p("larr", 0x2190); p("uarr", 0x2191); p("rarr", 0x2192); p("darr", 0x2193)
    p("harr", 0x2194); p("crarr", 0x21B5)
    p("lArr", 0x21D0); p("uArr", 0x21D1); p("rArr", 0x21D2); p("dArr", 0x21D3)
    p("hArr", 0x21D4)
    // math
    p("forall", 0x2200); p("part", 0x2202); p("exist", 0x2203); p("empty", 0x2205)
    p("nabla", 0x2207); p("isin", 0x2208); p("notin", 0x2209); p("ni", 0x220B)
    p("prod", 0x220F); p("sum", 0x2211); p("minus", 0x2212); p("lowast", 0x2217)
    p("radic", 0x221A); p("prop", 0x221D); p("infin", 0x221E); p("ang", 0x2220)
    p("and", 0x2227); p("or", 0x2228); p("cap", 0x2229); p("cup", 0x222A)
    p("int", 0x222B); p("there4", 0x2234); p("sim", 0x223C); p("cong", 0x2245)
    p("asymp", 0x2248); p("ne", 0x2260); p("equiv", 0x2261); p("le", 0x2264)
    p("ge", 0x2265); p("sub", 0x2282); p("sup", 0x2283); p("nsub", 0x2284)
    p("sube", 0x2286); p("supe", 0x2287); p("oplus", 0x2295); p("otimes", 0x2297)
    p("perp", 0x22A5); p("sdot", 0x22C5)
    // misc shapes
    p("lceil", 0x2308); p("rceil", 0x2309); p("lfloor", 0x230A); p("rfloor", 0x230B)
    p("lang", 0x2329); p("rang", 0x232A); p("loz", 0x25CA)
    p("spades", 0x2660); p("clubs", 0x2663); p("hearts", 0x2665); p("diams", 0x2666)
    m
  }

  /** append UTF-8 bytes [from, until) to a UTF-16 builder. */
  private def appendRun(s: Array[Byte], from: Int, until: Int, out: java.lang.StringBuilder): Unit = {
    var i = from
    var ascii = true
    while (i < until && ascii) { if (s(i) < 0) ascii = false else i += 1 }
    if (ascii) {
      i = from
      while (i < until) { out.append(s(i).toChar); i += 1 }
    } else out.append(new String(s, from, until - from, java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Decode entities in `s[from, until)` appending the result to `out`.
    * Unknown / malformed entities are kept verbatim. Bulk-copies the
    * entity-free stretches (the common case on real pages). */
  def decodeTo(s: Array[Byte], from: Int, until: Int, out: java.lang.StringBuilder): Unit = {
    var i = from
    var runStart = from
    while (i < until) {
      if (s(i) == '&') {
        if (i > runStart) appendRun(s, runStart, i, out)
        val end = decodeOne(s, i, until, out)
        if (end > i) i = end
        else { out.append('&'); i += 1 }
        runStart = i
      } else i += 1
    }
    if (i > runStart) appendRun(s, runStart, i, out)
  }

  /** decode straight to UTF-8 (mirrors decodeTo; the extraction hot path —
    * entity-free runs are raw memcpy). */
  def decodeToUtf8(s: Array[Byte], from: Int, until: Int, out: Utf8Builder): Unit = {
    var i = from
    var runStart = from
    val tmp = new java.lang.StringBuilder(8)
    while (i < until) {
      if (s(i) == '&') {
        if (i > runStart) out.appendBytes(s, runStart, i - runStart)
        tmp.setLength(0)
        val end = decodeOne(s, i, until, tmp)
        if (end > i) {
          var k = 0
          while (k < tmp.length) {
            val cp = tmp.codePointAt(k)
            out.appendCodePoint(cp)
            k += Character.charCount(cp)
          }
          i = end
        } else { out.appendCodePoint('&'); i += 1 }
        runStart = i
      } else i += 1
    }
    if (i > runStart) out.appendBytes(s, runStart, i - runStart)
  }

  /** Try to decode one entity starting at `i` (s(i)=='&'); returns the index
    * after the entity, or `i` if not a valid entity. Entity syntax is ASCII. */
  private def decodeOne(s: Array[Byte], i: Int, until: Int, out: java.lang.StringBuilder): Int = {
    var j = i + 1
    if (j >= until) return i
    if (s(j) == '#') {
      j += 1
      var hex = false
      if (j < until && (s(j) == 'x' || s(j) == 'X')) { hex = true; j += 1 }
      val digStart = j
      var cp = 0L
      while (j < until && isDigitOf(s(j), hex) && j - digStart < 8) {
        cp = cp * (if (hex) 16 else 10) + digitVal(s(j))
        j += 1
      }
      if (j == digStart || j >= until || s(j) != ';') return i
      if (cp <= 0 || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) return i
      out.appendCodePoint(cp.toInt)
      j + 1
    } else {
      val nameStart = j
      while (j < until && j - nameStart < 32 && isEntityNameByte(s(j))) j += 1
      if (j == nameStart || j >= until || s(j) != ';') return i
      val name = new String(s, nameStart, j - nameStart, java.nio.charset.StandardCharsets.US_ASCII)
      val rep = named.get(name)
      if (rep == null) i
      else { out.append(rep); j + 1 }
    }
  }

  private def isEntityNameByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')

  private def isDigitOf(c: Byte, hex: Boolean): Boolean =
    if (hex) (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
    else c >= '0' && c <= '9'
  private def digitVal(c: Byte): Int =
    if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10

  def decode(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val arr = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new java.lang.StringBuilder(s.length)
    decodeTo(arr, 0, arr.length, out)
    out.toString
  }

  /** Encode the five special characters as named entities — the observable
    * behavior of `set_text`'s `EncodeType::NamedOrDecimal` on the fixture
    * corpus (reference `src/lib.rs:260-264`, `tests/content.rs:213-235`). */
  def encodeSpecial(s: String): String = {
    var needs = false
    var i = 0
    while (i < s.length && !needs) {
      val c = s.charAt(i)
      needs = c == '&' || c == '<' || c == '>' || c == '"' || c == '\''
      i += 1
    }
    if (!needs) return s
    val out = new java.lang.StringBuilder(s.length + 16)
    i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => out.append("&amp;")
        case '<' => out.append("&lt;")
        case '>' => out.append("&gt;")
        case '"' => out.append("&quot;")
        case '\'' => out.append("&apos;")
        case c => out.append(c)
      }
      i += 1
    }
    out.toString
  }
}
