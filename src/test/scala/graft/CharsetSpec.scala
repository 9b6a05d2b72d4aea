package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spark.CharsetOps
import java.nio.charset.{Charset, StandardCharsets}

/** Charset sniffing + transcoding (CharsetOps): WHATWG precedence
  * (BOM > Content-Type > meta prescan > content heuristic), label
  * normalization, the HTML5 meta prescan, strict UTF-8 validity, and the
  * zero-copy transcode fast path. */
class CharsetSpec extends AnyFunSuite {

  private def b(s: String, cs: String = "ISO-8859-1"): Array[Byte] =
    s.getBytes(Charset.forName(cs))
  private def utf8(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)
  private def str(a: Array[Byte]): String = new String(a, StandardCharsets.UTF_8)

  // ------------------------------------------------------------ label table

  test("normalizeLabel folds WHATWG labels to canonical names") {
    assert(CharsetOps.normalizeLabel("UTF8") == "utf-8")
    assert(CharsetOps.normalizeLabel(" utf-8 ") == "utf-8")
    assert(CharsetOps.normalizeLabel("ISO-8859-1") == "windows-1252")
    assert(CharsetOps.normalizeLabel("latin1") == "windows-1252")
    assert(CharsetOps.normalizeLabel("us-ascii") == "windows-1252")
    assert(CharsetOps.normalizeLabel("x-user-defined") == "windows-1252")
    assert(CharsetOps.normalizeLabel("ISO-8859-9") == "windows-1254")
    assert(CharsetOps.normalizeLabel("tis-620") == "windows-874")
    assert(CharsetOps.normalizeLabel("Shift-JIS") == "shift_jis")
    assert(CharsetOps.normalizeLabel("SJIS") == "shift_jis")
    assert(CharsetOps.normalizeLabel("GB2312") == "gbk")
    assert(CharsetOps.normalizeLabel("gb18030") == "gb18030")
    assert(CharsetOps.normalizeLabel("Big5") == "big5")
    assert(CharsetOps.normalizeLabel("korean") == "euc-kr")
    assert(CharsetOps.normalizeLabel("KOI8") == "koi8-r")
    assert(CharsetOps.normalizeLabel("cyrillic") == "iso-8859-5")
    assert(CharsetOps.normalizeLabel("utf-16") == "utf-16le") // WHATWG: le
    assert(CharsetOps.normalizeLabel("\"utf-8\"") == "utf-8") // quoted
    assert(CharsetOps.normalizeLabel("'euc-jp'") == "euc-jp")
    assert(CharsetOps.normalizeLabel("bogus-encoding") == null)
    assert(CharsetOps.normalizeLabel(null) == null)
  }

  test("charsetParam extracts from real-world Content-Type shapes") {
    assert(CharsetOps.charsetParam("text/html; charset=utf-8") == "utf-8")
    assert(CharsetOps.charsetParam("text/html;charset=ISO-8859-1") == "ISO-8859-1")
    assert(CharsetOps.charsetParam("text/html; charset = gbk ") == "gbk")
    assert(CharsetOps.charsetParam("text/html; Charset=UTF-8; foo=bar") == "UTF-8")
    assert(CharsetOps.charsetParam("text/html") == null)
    assert(CharsetOps.charsetParam("text/html; charset=") == null)
    assert(CharsetOps.charsetParam(null) == null)
    // WHATWG loop: a charset-prefixed token without '=' must not end the
    // search before the real parameter
    assert(CharsetOps.charsetParam("text/html; charsetx; charset=gbk") == "gbk")
    assert(CharsetOps.charsetParam("text/html; charsetcharset=big5") == "big5")
  }

  test("label folding is locale-independent (tr dotless-i hazard)") {
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      assert(CharsetOps.normalizeLabel("SHIFT_JIS") == "shift_jis")
      assert(CharsetOps.normalizeLabel("ISO-8859-1") == "windows-1252")
      assert(CharsetOps.charsetParam("text/html; CHARSET=UTF-8") == "UTF-8")
      assert(CharsetOps.sniff(utf8("x"), "text/html; CHARSET=KOI8-R") == "koi8-r")
    } finally java.util.Locale.setDefault(saved)
  }

  // ---------------------------------------------------------------- prescan

  test("meta charset prescan finds the declaration") {
    assert(CharsetOps.prescanMeta(b("<html><head><meta charset=\"windows-1251\"></head>")) == "windows-1251")
    assert(CharsetOps.prescanMeta(b("<meta charset=utf-8>")) == "utf-8")
    assert(CharsetOps.prescanMeta(b("<META CHARSET='Shift_JIS'>")) == "shift_jis")
  }

  test("meta http-equiv content-type requires the pragma") {
    // content with charset + the pragma: accepted
    assert(CharsetOps.prescanMeta(b(
      "<meta http-equiv=\"Content-Type\" content=\"text/html; charset=gbk\">")) == "gbk")
    // content with charset but NO pragma: rejected (HTML5 prescan rule)
    assert(CharsetOps.prescanMeta(b(
      "<meta content=\"text/html; charset=gbk\">")) == null)
    // attribute order doesn't matter
    assert(CharsetOps.prescanMeta(b(
      "<meta content=\"text/html; charset=big5\" http-equiv=content-type>")) == "big5")
  }

  test("prescan skips comments and other tags' attribute values") {
    assert(CharsetOps.prescanMeta(b(
      "<!-- <meta charset=koi8-r> --><meta charset=utf-8>")) == "utf-8")
    // a charset-looking attr on a non-meta tag must not leak
    assert(CharsetOps.prescanMeta(b(
      "<div data-x=\"<meta charset=koi8-r>\"></div><meta charset=euc-jp>")) == "euc-jp")
    assert(CharsetOps.prescanMeta(b("<!DOCTYPE html><p>plain</p>")) == null)
  }

  test("prescan only reads the first 1024 bytes") {
    val pad = "<p>" + ("x" * 1100) + "</p>"
    assert(CharsetOps.prescanMeta(b(pad + "<meta charset=gbk>")) == null)
    val early = "<meta charset=gbk>" + pad
    assert(CharsetOps.prescanMeta(b(early)) == "gbk")
  }

  test("prescan: first meta with a valid charset wins; duplicate attrs ignored") {
    assert(CharsetOps.prescanMeta(b(
      "<meta charset=koi8-r><meta charset=utf-8>")) == "koi8-r")
    assert(CharsetOps.prescanMeta(b(
      "<meta charset=koi8-r charset=utf-8>")) == "koi8-r")
  }

  // --------------------------------------------------------------- validity

  test("isValidUtf8: strict RFC 3629") {
    assert(CharsetOps.isValidUtf8(utf8("hello")))
    assert(CharsetOps.isValidUtf8(utf8("héllo ✓ 文 𝄞")))
    assert(!CharsetOps.isValidUtf8(Array(0xE9.toByte))) // lone latin-1 é
    assert(!CharsetOps.isValidUtf8(Array(0xC0.toByte, 0xAF.toByte))) // overlong /
    assert(!CharsetOps.isValidUtf8(Array(0xE0.toByte, 0x80.toByte, 0x80.toByte))) // overlong
    assert(!CharsetOps.isValidUtf8(Array(0xED.toByte, 0xA0.toByte, 0x80.toByte))) // surrogate
    assert(!CharsetOps.isValidUtf8(Array(0xF4.toByte, 0x90.toByte, 0x80.toByte, 0x80.toByte))) // > U+10FFFF
    assert(!CharsetOps.isValidUtf8(Array(0xF5.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte)))
    assert(!CharsetOps.isValidUtf8(utf8("trunc") :+ 0xC3.toByte)) // truncated pair
  }

  // ------------------------------------------------------------------ sniff

  test("sniff precedence: BOM > header > meta > heuristic") {
    val bomUtf8 = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ utf8("<meta charset=gbk>hi")
    assert(CharsetOps.sniff(bomUtf8, "text/html; charset=big5") == "utf-8")
    val headerVsMeta = b("<meta charset=gbk><p>x</p>")
    assert(CharsetOps.sniff(headerVsMeta, "text/html; charset=koi8-r") == "koi8-r")
    assert(CharsetOps.sniff(headerVsMeta, null) == "gbk")
    assert(CharsetOps.sniff(headerVsMeta, "text/html") == "gbk") // no charset param
    // undeclared: valid UTF-8 -> utf-8, else windows-1252
    assert(CharsetOps.sniff(utf8("<p>héllo</p>"), null) == "utf-8")
    assert(CharsetOps.sniff(b("<p>héllo</p>"), null) == "windows-1252")
  }

  test("sniff: UTF-16 BOMs; utf-16 meta label is read as utf-8") {
    assert(CharsetOps.sniff(Array(0xFF.toByte, 0xFE.toByte, 'h'.toByte, 0), null) == "utf-16le")
    assert(CharsetOps.sniff(Array(0xFE.toByte, 0xFF.toByte, 0, 'h'.toByte), null) == "utf-16be")
    // HTML5 14.2.3.2: an ASCII-readable meta claiming utf-16 is lying
    assert(CharsetOps.sniff(utf8("<meta charset=utf-16>x"), null) == "utf-8")
    // but a Content-Type header claiming utf-16 is honored as the label maps
    assert(CharsetOps.sniff(utf8("x"), "text/html; charset=utf-16") == "utf-16le")
  }

  test("sniff: unknown labels fall through to the next stage") {
    assert(CharsetOps.sniff(utf8("<p>ok</p>"), "text/html; charset=bogus") == "utf-8")
    assert(CharsetOps.sniff(utf8("<meta charset=bogus><p>x</p>"), null) == "utf-8")
    assert(CharsetOps.sniff(null, "text/html; charset=utf-8") == null)
  }

  // -------------------------------------------------------------- transcode

  test("toUtf8: zero-copy for valid UTF-8 without BOM") {
    val in = utf8("<p>héllo 文</p>")
    assert(CharsetOps.toUtf8(in, null) eq in) // SAME array
    assert(CharsetOps.toUtf8(in, "text/html; charset=utf-8") eq in)
  }

  test("toUtf8: BOM stripped, UTF-16 decoded") {
    val bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ utf8("hi")
    assert(str(CharsetOps.toUtf8(bom, null)) == "hi")
    val le = Array(0xFF.toByte, 0xFE.toByte) ++ "héllo".getBytes(StandardCharsets.UTF_16LE)
    assert(str(CharsetOps.toUtf8(le, null)) == "héllo")
    val be = Array(0xFE.toByte, 0xFF.toByte) ++ "日本".getBytes(StandardCharsets.UTF_16BE)
    assert(str(CharsetOps.toUtf8(be, null)) == "日本")
  }

  test("toUtf8: BOM-less UTF-16 starting with U+00FF/U+00FE keeps its first char") {
    // declared utf-16le, body begins 'ÿ' = FF 00: only the exact BOM pair
    // (FF FE) may be stripped — first-byte-only stripping ate a character
    val le = "ÿes".getBytes(StandardCharsets.UTF_16LE)
    assert(str(CharsetOps.toUtf8(le, "text/html; charset=utf-16")) == "ÿes")
    // utf-16be body beginning U+FE30 (︰): bytes FE 30 — FE-first but not
    // the FE FF pair, must survive intact
    val be = "︰x".getBytes(StandardCharsets.UTF_16BE)
    assert(str(CharsetOps.toUtf8As(be, "utf-16be")) == "︰x")
  }

  test("toUtf8: legacy single-byte and CJK pages transcode correctly") {
    val w1252 = "<p>café — naïve</p>" // é, em-dash, ï
    assert(str(CharsetOps.toUtf8(w1252.getBytes("windows-1252"),
      "text/html; charset=iso-8859-1")) == w1252)
    val ru = "<p>привет</p>"
    assert(str(CharsetOps.toUtf8(ru.getBytes("windows-1251"),
      "text/html; charset=windows-1251")) == ru)
    val sjis = "<meta charset=shift_jis><p>日本語</p>"
    assert(str(CharsetOps.toUtf8(sjis.getBytes("windows-31j"), null)) == sjis)
    val gbk = "<p>中文</p>"
    assert(str(CharsetOps.toUtf8(gbk.getBytes("GBK"),
      "text/html; charset=gb2312")) == gbk)
    val kr = "<p>한국어</p>"
    assert(str(CharsetOps.toUtf8(kr.getBytes("x-windows-949"),
      "text/html; charset=euc-kr")) == kr)
  }

  test("toUtf8: malformed input becomes U+FFFD, never a throw") {
    val broken = utf8("ok") ++ Array(0xED.toByte, 0xA0.toByte, 0x80.toByte) ++ utf8("end")
    val out = str(CharsetOps.toUtf8(broken, "text/html; charset=utf-8"))
    assert(out.startsWith("ok") && out.endsWith("end") && out.contains('�'))
    // declared CJK over garbage bytes: replacement, not a crash
    val junk = Array.tabulate(64)(i => (0x80 + i % 64).toByte)
    assert(CharsetOps.toUtf8(junk, "text/html; charset=shift_jis") != null)
  }

  test("toUtf8: undeclared non-UTF-8 falls back to windows-1252") {
    val raw = "café".getBytes("windows-1252")
    assert(str(CharsetOps.toUtf8(raw, null)) == "café")
  }

  test("toUtf8As: sniff-once callers get the same transcode") {
    val raw = "пример".getBytes("KOI8-R")
    val name = CharsetOps.sniff(raw, "text/html; charset=koi8-r")
    assert(name == "koi8-r")
    assert(str(CharsetOps.toUtf8As(raw, name)) == "пример")
    assert(CharsetOps.toUtf8As(null, "utf-8") == null)
  }

  test("every canonical name is mapped, and every mapped decoder exists in this runtime") {
    // ISO-8859-10/14 (Latin-6 Nordic / Latin-8 Celtic) are recognized
    // labels but have no decoder in this JDK — the documented tolerant
    // fallback covers them; anything else missing would silently fall back
    // to the heuristic for a DECLARED encoding, so pin the whole table
    val knownAbsent = Set("iso-8859-10", "iso-8859-14")
    for (canon <- CharsetOps.canonicalNames) {
      val jdk = CharsetOps.jdkFor(canon)
      assert(jdk != null, s"canon=$canon has no JDK mapping")
      if (knownAbsent(canon)) assert(!Charset.isSupported(jdk), s"$canon now supported — drop the exemption")
      else assert(Charset.isSupported(jdk), s"canon=$canon -> $jdk missing in this runtime")
    }
  }

  test("iso-8859-10/14 labels are recognized but absent from this JDK: tolerant fallback") {
    // a DECLARED page in them must still come out as text, never a throw
    assert(CharsetOps.normalizeLabel("latin6") == "iso-8859-10")
    val ascii = CharsetOps.toUtf8As(utf8("plain text"), "iso-8859-10")
    assert(str(ascii) == "plain text")
    val highBytes = Array('x'.toByte, 0xE9.toByte)
    assert(CharsetOps.toUtf8As(highBytes, "iso-8859-14") != null) // cp1252 fallback
  }
}
