package graft

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import graft.spark.TextNorm

import org.scalatest.funsuite.AnyFunSuite

/** fix_text semantics: UTF-8 misdecodes carried by BOTH real damage paths
  * (cp1252 and latin-1), double encodes, never-false-positive on clean
  * Latin-1, NFC, control strip, idempotency. */
class TextNormSpec extends AnyFunSuite {

  /** cp1252 decode table for 0x80–0x9F (undefined bytes pass through as
    * C1 chars — the "sloppy" form actual pipelines produce). */
  private val hi = Array[Int](
    0x20AC, 0x0081, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
    0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008D, 0x017D, 0x008F,
    0x0090, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
    0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x009D, 0x017E, 0x0178)

  /** the cp1252 damage path: UTF-8 bytes read as windows-1252. */
  private def mojibake(s: String): String = {
    val b = s.getBytes(UTF_8)
    val sb = new java.lang.StringBuilder(b.length)
    b.foreach { x =>
      val u = x & 0xff
      sb.append(if (u >= 0x80 && u <= 0x9f) hi(u - 0x80).toChar else
        new String(Array(x), ISO_8859_1).charAt(0))
    }
    sb.toString
  }

  /** the latin-1 damage path: UTF-8 bytes read as ISO-8859-1. */
  private def mojibakeL1(s: String): String = new String(s.getBytes(UTF_8), ISO_8859_1)

  test("single misdecode repaired - cp1252 path") {
    assert(TextNorm.fixText(mojibake("café")) == "café")
    assert(TextNorm.fixText(mojibake("don’t — “quotes” …")) == "don’t — “quotes” …")
    assert(TextNorm.fixText(mojibake("Übergröße straße")) == "Übergröße straße")
  }

  test("single misdecode repaired - latin-1 path (raw C1 chars)") {
    assert(TextNorm.fixText(mojibakeL1("café")) == "café")
    assert(TextNorm.fixText(mojibakeL1("don’t — “quotes” …")) == "don’t — “quotes” …")
  }

  test("double misdecode repaired via the second round") {
    assert(TextNorm.fixText(mojibake(mojibake("café"))) == "café")
    assert(TextNorm.fixText(mojibakeL1(mojibake("n’est-ce pas"))) == "n’est-ce pas")
  }

  test("clean text is never falsely repaired") {
    // legitimate Latin-1-range text: a lone é encodes to one 0xE9 byte,
    // malformed as UTF-8 -> untouched
    assert(TextNorm.fixText("plain café text") == "plain café text")
    assert(TextNorm.fixText("schön, naïve, Zürich") == "schön, naïve, Zürich")
    assert(TextNorm.fixText("pure ascii stays") == "pure ascii stays")
    // CJK/emoji (not 1-byte-encodable) -> untouched
    assert(TextNorm.fixText("日本語テキスト") == "日本語テキスト")
  }

  test("NFC composition") {
    assert(TextNorm.fixText("cléan é") == "cléan é")
    assert(TextNorm.fixText("å") == "å")
  }

  test("control strip keeps tab/newline/CR, drops C0/C1/DEL") {
    assert(TextNorm.fixText("abcd") == "abcd")
    assert(TextNorm.fixText("keep\tthese\nlines\r\n") == "keep\tthese\nlines\r\n")
    assert(TextNorm.fixText("nelgonex") == "nelgonex")
  }

  test("null and empty") {
    assert(TextNorm.fixText(null) == null)
    assert(TextNorm.fixText("") == "")
  }

  test("scrubPii: emails, IPv4, phones, ordering, passthrough") {
    assert(TextNorm.scrubPii("mail a.b+c@d-e.co.uk now") == "mail |||EMAIL||| now")
    assert(TextNorm.scrubPii("ip 10.0.0.1 end") == "ip |||IP||| end")
    assert(TextNorm.scrubPii("call +1 (555) 123-4567 or 555.123.4567") ==
      "call |||PHONE||| or |||PHONE|||")
    // email digits never feed the phone pass; IP octets never feed it either
    assert(TextNorm.scrubPii("x 12345678901@mail.com y") == "x |||EMAIL||| y")
    assert(TextNorm.scrubPii("a@b.io and 10.0.0.45 and 555-123-4567") ==
      "|||EMAIL||| and |||IP||| and |||PHONE|||")
    // clean text: identity (and the fast path returns the same instance)
    val clean = "no personal data in this sentence"
    assert(TextNorm.scrubPii(clean) eq clean)
    assert(TextNorm.scrubPii(null) == null)
    // \b guard: a dotted quad glued to a word char is a version string,
    // not an address - stays; a free-standing one still scrubs
    assert(TextNorm.scrubPii("v1.2.3.4 release") == "v1.2.3.4 release")
    assert(TextNorm.scrubPii("see 1.2.3.4 release") == "see |||IP||| release")
  }

  test("scrubCards: Luhn gate, separator groups, boundaries") {
    assert(TextNorm.scrubCards("pay 4111111111111111 now") == "pay |||CARD||| now")
    assert(TextNorm.scrubCards("pay 4111 1111 1111 1111 now") == "pay |||CARD||| now")
    assert(TextNorm.scrubCards("mc 5500-0000-0000-0004.") == "mc |||CARD|||.")
    assert(TextNorm.scrubCards("amex 378282246310005") == "amex |||CARD|||")
    // Luhn fails -> untouched; short runs untouched; glued to word chars untouched
    assert(TextNorm.scrubCards("ref 4111111111111112 kept") == "ref 4111111111111112 kept")
    assert(TextNorm.scrubCards("build 12345 ok") == "build 12345 ok")
    assert(TextNorm.scrubCards("id4111111111111111 stays") == "id4111111111111111 stays")
    assert(TextNorm.scrubCards("4111111111111111x stays") == "4111111111111111x stays")
    // double separators break a candidate; 20+ digits are not cards
    assert(TextNorm.scrubCards("a 4111  1111 1111 1111 b") == "a 4111  1111 1111 1111 b")
    assert(TextNorm.scrubCards("n 41111111111111110000 m") == "n 41111111111111110000 m")
    // two cards in one line; start/end of string boundaries
    assert(TextNorm.scrubCards("4111111111111111 and 5500000000000004") ==
      "|||CARD||| and |||CARD|||")
    // an over-joined reject must not eat a following valid card
    assert(TextNorm.scrubCards("order 12345 4111111111111111 tail") ==
      "order 12345 |||CARD||| tail")
    assert(TextNorm.scrubCards(null) == null)
    val clean = "no digits at all here"
    assert(TextNorm.scrubCards(clean) eq clean)
  }

  test("luhnOk vectors") {
    assert(TextNorm.luhnOk("4111111111111111"))
    assert(TextNorm.luhnOk("378282246310005"))
    assert(TextNorm.luhnOk("5500000000000004"))
    assert(!TextNorm.luhnOk("4111111111111112"))
    assert(!TextNorm.luhnOk("1234567890123"))
  }

  test("repair-roundtrip property over generated unicode words, both paths") {
    val words = Seq("résumé", "Ångström", "œuvre", "für", "piñata",
      "smörgåsbord", "déjà-vu", "español", "†‡•", "¼½¾", "£€¥")
    words.foreach { w =>
      val nfc = java.text.Normalizer.normalize(w, java.text.Normalizer.Form.NFC)
      assert(TextNorm.fixText(mojibake(nfc)) == nfc, s"cp1252 path: $w")
      assert(TextNorm.fixText(mojibakeL1(nfc)) == nfc, s"latin-1 path: $w")
    }
    // idempotency: fixing fixed text changes nothing
    (words ++ Seq("plain", "á", "x#y")).foreach { w =>
      val once = TextNorm.fixText(w)
      assert(TextNorm.fixText(once) == once, s"idempotency $w")
    }
  }
}
