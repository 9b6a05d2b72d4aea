package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spark.PdfOps

/** PDF text/layout extraction: synthesized real PDFs (xref + trailer +
  * Flate or raw content streams) round-trip through the pure-JVM
  * extractor; layout ordering, escapes, and TJ concatenation pinned. */
class PdfOpsSpec extends AnyFunSuite {

  test("synthesized PDFs round-trip: text in layout order, pages counted") {
    (0L until 120L).foreach { id =>
      val bytes = PdfOps.synthPdf(id)
      // a real PDF shell
      assert(new String(bytes.take(8), "ISO-8859-1").startsWith("%PDF-1."))
      assert(new String(bytes, "ISO-8859-1").contains("startxref"))
      assert(PdfOps.extractPdfText(bytes) == PdfOps.expectedText(id), s"id=$id")
      assert(PdfOps.pageCount(bytes) == PdfOps.pagesOf(id), s"id=$id")
    }
  }

  test("both classic stream encodings decode: Flate (v0) and raw (v1)") {
    val flate = PdfOps.synthPdf(0L) // id%7==0 -> classic + Flate
    val raw = PdfOps.synthPdf(8L)   // id%7==1 -> classic + raw
    assert(new String(flate, "ISO-8859-1").contains("/FlateDecode"))
    assert(!new String(raw, "ISO-8859-1").contains("/FlateDecode"))
    assert(PdfOps.extractPdfText(flate) == PdfOps.expectedText(0L))
    assert(PdfOps.extractPdfText(raw) == PdfOps.expectedText(8L))
  }

  test("modern variants are REAL post-2005 structure: xref stream + ObjStm, no classic table") {
    for (id <- Seq(2L, 3L, 9L, 10L, 16L, 17L)) {
      val s = new String(PdfOps.synthPdf(id), "ISO-8859-1")
      assert(s.contains("/Type /XRef"), s"id=$id")
      assert(s.contains("/Type /ObjStm"), s"id=$id")
      assert(s.contains("/W ["), s"id=$id")
      assert(!s.contains("trailer"), s"id=$id: xref-stream PDFs have no classic trailer")
      assert(!s.contains("xref\n0 "), s"id=$id: no classic xref table")
    }
    // v2 exercises the PNG Up predictor; v3 plain [1 3 1] widths
    assert(new String(PdfOps.synthPdf(2L), "ISO-8859-1").contains("/Predictor 12"))
    assert(new String(PdfOps.synthPdf(3L), "ISO-8859-1").contains("/W [1 3 1]"))
    // the catalog/pages/page dicts are INSIDE the ObjStm: invisible to a
    // naive raw-byte scan, so page counting must go through the model
    assert(!new String(PdfOps.synthPdf(2L), "ISO-8859-1").contains("/Type /Catalog"))
  }

  test("v2: the ' operator's leading advance is load-bearing for layout order") {
    // the bottom line is drawn FIRST via (str) ' after 40 TL — if ' failed
    // to move down, layout sort could not put the top line first
    for (id <- Seq(2L, 9L, 16L)) {
      val t = PdfOps.extractPdfText(PdfOps.synthPdf(id))
      assert(t == PdfOps.expectedText(id), s"id=$id got '$t'")
      assert(t.split("\n")(0).endsWith("top (x)"), s"id=$id")
    }
  }

  test("v3: hex strings <..> Tj and the \" operator decode") {
    for (id <- Seq(3L, 10L, 17L)) {
      val s = new String(PdfOps.synthPdf(id), "ISO-8859-1")
      val t = PdfOps.extractPdfText(PdfOps.synthPdf(id))
      assert(t == PdfOps.expectedText(id), s"id=$id got '$t'")
    }
  }

  test("filter tier: ASCII85+Flate chain on v3 content; ASCIIHexDecode end-to-end") {
    // v3 content streams are armored with a real chained filter
    val v3 = new String(PdfOps.synthPdf(3L), "ISO-8859-1")
    assert(v3.contains("[/ASCII85Decode /FlateDecode]"))
    assert(PdfOps.extractPdfText(PdfOps.synthPdf(3L)) == PdfOps.expectedText(3L))
    // hand-built classic PDF with an ASCIIHexDecode content stream: only
    // the structured path (xref + page tree + filter decode) can read it
    val content = "BT /F1 12 Tf 72 700 Td (hexed) Tj ET"
    val hex = content.getBytes("ISO-8859-1").map(b => f"${b & 0xFF}%02x").mkString + ">"
    val objs = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>")
    val sb = new StringBuilder("%PDF-1.4\n")
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    objs.zipWithIndex.foreach { case (o, i) =>
      offs += sb.length
      sb.append(s"${i + 1} 0 obj\n$o\nendobj\n")
    }
    offs += sb.length
    sb.append(s"4 0 obj\n<< /Length ${hex.length} /Filter /ASCIIHexDecode >>\nstream\n")
    sb.append(hex).append("\nendstream\nendobj\n")
    val xrefAt = sb.length
    sb.append(s"xref\n0 5\n0000000000 65535 f \n")
    offs.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%%%EOF\n")
    val pdf = sb.toString.getBytes("ISO-8859-1")
    assert(PdfOps.extractPdfText(pdf) == "hexed")
    assert(PdfOps.pageCount(pdf) == 1)
  }

  test("classic PDFs also resolve through the structured path (page-tree pageCount)") {
    // pageCount prefers the page-tree walk; for classic files the /Count
    // regex fallback must agree with it
    (0L until 40L).foreach { id =>
      assert(PdfOps.pageCount(PdfOps.synthPdf(id)) == PdfOps.pagesOf(id), s"id=$id")
    }
  }

  test("broken xref on a modern PDF falls back to the tolerant scan") {
    val pdf = PdfOps.synthPdf(2L)
    val s = new String(pdf, "ISO-8859-1")
    // corrupt the startxref offset -> structured path unusable
    val sx = s.lastIndexOf("startxref")
    val broken = pdf.clone()
    broken(sx + 10) = '9'; broken(sx + 11) = '9'
    val t = PdfOps.extractPdfText(broken)
    // content streams are still top-level Flate streams the scan finds,
    // and the ObjStm/XRef streams are SKIPPED as text sources. The /F1
    // bottom lines survive verbatim; the /F2 top line needs the
    // /ToUnicode CMap, which only the structured path can resolve — in
    // the fallback its 2-byte codes degrade to raw bytes (by design).
    assert(t != null)
    (0 until 3).foreach(p => assert(t.contains(s"d2 p$p bot"), s"page $p: '$t'"))
    assert(t.contains("\u0000d"), "raw 2-byte codes expected in fallback")
    // the intact document extracts perfectly (CMap resolved)
    assert(PdfOps.extractPdfText(pdf) == PdfOps.expectedText(2L))
  }

  test("inline BDC property-list dict strings never leak into extracted text") {
    val content = "BT 72 700 Td /Span << /Alt (SECRET) >> BDC (ok) Tj EMC ET"
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Length " + content.length + " >>\nstream\n" + content +
      "\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    val t = PdfOps.extractPdfText(pdf)
    assert(t == "ok", s"got '$t'")
  }

  test("layout ordering fixes stream draw order; escapes and TJ handled") {
    // the generator draws the BOTTOM line first — layout order must flip it
    val t = PdfOps.extractPdfText(PdfOps.synthPdf(1L))
    val lines = t.split("\n")
    assert(lines(0).endsWith("top (x)")) // escaped \( \) decoded
    assert(lines(1).endsWith("bot"))     // TJ array parts concatenated
  }

  test("nested dict before stream: FlateDecode still detected past /DecodeParms") {
    val body = { // deflate the content stream (PdfOps' helper is private)
      val d = new java.util.zip.Deflater()
      val raw = "BT /F1 12 Tf 72 700 Td (hi) Tj ET".getBytes("ISO-8859-1")
      d.setInput(raw); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    }
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /DecodeParms " +
      "<< /Predictor 12 >> /Length " + body.length + " >>\nstream\n").getBytes("ISO-8859-1") ++
      body ++ "\nendstream\nendobj\n%%EOF".getBytes("ISO-8859-1")
    val text = PdfOps.extractPdfText(pdf)
    assert(text != null && text.contains("hi"),
      s"nested dict truncated the filter capture: got '$text'")
  }

  test("string escapes: backslash-EOL continuation elided, octal overflow mod 256") {
    def raw(content: String): Array[Byte] =
      ("%PDF-1.4\n1 0 obj\n<< /Length " + content.length + " >>\nstream\n" + content +
        "\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    val cont = PdfOps.extractPdfText(raw("BT 72 700 Td (ab\\\ncd) Tj ET"))
    assert(cont != null && cont.contains("abcd"), s"line continuation: got '$cont'")
    val octal = PdfOps.extractPdfText(raw("BT 72 700 Td (\\777x) Tj ET"))
    assert(octal != null && octal.contains("ÿx"), s"octal mod 256: got '$octal'")
  }

  test("pageCount: hostile /Count never throws; outline /Count does not beat the page tree") {
    val huge = "%PDF-1.4 << /Type /Pages /Count 99999999999 >>".getBytes("ISO-8859-1")
    assert(PdfOps.pageCount(huge) == 0) // >9 digits rejected by the bounded regex
    val outlineFirst = ("%PDF-1.4 1 0 obj << /Type /Outlines /Count 3 >> endobj " +
      "2 0 obj << /Type /Pages /Kids [] /Count 2 >> endobj").getBytes("ISO-8859-1")
    assert(PdfOps.pageCount(outlineFirst) == 2,
      "the outlines dict's /Count must not win over the page tree")
    assert(PdfOps.pageCount(null) == 0)
  }

  test("scan fallback: a stream AFTER an ObjStm is still interpreted (dict scan bounded)") {
    // the pre-fix backward dict walk treated the dict's own >> as a nested
    // close and captured the whole file prefix — after one /ObjStm, every
    // later stream's dict "contained" /ObjStm and was skipped as a text
    // source. No xref here, so only the tolerant scan runs.
    val objstm = "1 0 obj\n<< /Type /ObjStm /N 0 /First 0 /Length 4 >>\nstream\nZZZZ\nendstream\nendobj\n"
    val content = "BT 72 700 Td (after-objstm) Tj ET"
    val pdf = ("%PDF-1.4\n" + objstm +
      s"2 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
      .getBytes("ISO-8859-1")
    val t = PdfOps.extractPdfText(pdf)
    assert(t == "after-objstm", s"got '$t'")
  }

  test("structured path with unresolvable /Contents falls back to the scan") {
    // valid xref + page tree, but the page's /Contents ref points at a
    // missing object; an unreferenced content stream exists in the file.
    // Zero structured segments must yield the scan's answer, not "".
    val content = "BT 72 700 Td (orphan) Tj ET"
    val objs = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /Contents 9 0 R >>")
    val sb = new StringBuilder("%PDF-1.4\n")
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    objs.zipWithIndex.foreach { case (o, i) =>
      offs += sb.length
      sb.append(s"${i + 1} 0 obj\n$o\nendobj\n")
    }
    offs += sb.length
    sb.append(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n")
    val xrefAt = sb.length
    sb.append("xref\n0 5\n0000000000 65535 f \n")
    offs.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%%%EOF\n")
    val t = PdfOps.extractPdfText(sb.toString.getBytes("ISO-8859-1"))
    assert(t == "orphan", s"got '$t'")
  }

  test("malformed inputs yield null/0, never throw") {
    assert(PdfOps.extractPdfText(null) == null)
    assert(PdfOps.extractPdfText(Array[Byte](1, 2, 3)) == null)
    assert(PdfOps.extractPdfText("not a pdf at all".getBytes) == null)
    // declared Flate but garbage body: tolerated (no text), not a crash
    val bogus = ("%PDF-1.4\n1 0 obj\n<< /Length 4 /Filter /FlateDecode >>\n" +
      "stream\nZZZZ\nendstream\nendobj\n").getBytes("ISO-8859-1")
    assert(PdfOps.extractPdfText(bogus) != null)
    assert(PdfOps.pageCount(null) == 0)
  }

  test("encrypted variants REALLY encrypt: planted text invisible in raw bytes, still extracts") {
    // v4 = RC4-128 R3, v5 = AES-128 V4, v6 = AES-256 V5 R6 (encrypted ObjStm)
    for (id <- Seq(4L, 11L, 18L, 5L, 12L, 19L, 6L, 13L, 20L)) {
      val bytes = PdfOps.synthPdf(id)
      val s = new String(bytes, "ISO-8859-1")
      assert(s.contains("/Encrypt"), s"id=$id")
      // the planted text must not appear in the file: streams are Flate'd
      // AND ciphered, so even the deflate of the plaintext is absent
      assert(!s.contains(s"d$id p0"), s"id=$id leaks plaintext")
      assert(PdfOps.extractPdfText(bytes) == PdfOps.expectedText(id), s"id=$id")
      assert(PdfOps.pageCount(bytes) == PdfOps.pagesOf(id), s"id=$id")
    }
    // v6's catalog lives inside the ENCRYPTED ObjStm: invisible to a scan
    assert(!new String(PdfOps.synthPdf(6L), "ISO-8859-1").contains("/Type /Catalog"))
    // scheme witness strings
    assert(new String(PdfOps.synthPdf(4L), "ISO-8859-1").contains("/V 2 /R 3"))
    assert(new String(PdfOps.synthPdf(5L), "ISO-8859-1").contains("/CFM /AESV2"))
    assert(new String(PdfOps.synthPdf(6L), "ISO-8859-1").contains("/CFM /AESV3"))
  }

  test("a NON-empty user password degrades per-row (no text), never throws") {
    // tamper the /U validation bytes: the empty-password check must fail,
    // the structured path bows out, and the scan sees only ciphertext
    for (id <- Seq(4L, 5L, 6L)) {
      val bytes = PdfOps.synthPdf(id)
      val s = new String(bytes, "ISO-8859-1")
      val uAt = s.indexOf("/U <")
      assert(uAt > 0)
      val t = bytes.clone()
      t(uAt + 4) = (if (t(uAt + 4) == 'f') '0' else 'f').toByte // corrupt hex
      t(uAt + 5) = (if (t(uAt + 5) == 'f') '0' else 'f').toByte
      val got = PdfOps.extractPdfText(t) // must not throw
      assert(got != PdfOps.expectedText(id), s"id=$id decrypted with a bad /U?")
    }
  }

  test("inline image payloads (BI..ID..EI) never desynchronize the operator walk") {
    def pdf(content: String): Array[Byte] =
      ("%PDF-1.4\n1 0 obj\n<< /Length " + content.length + " >>\nstream\n" + content +
        "\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    // payload carries ET, (, Tj bytes — interpreting any of them corrupts
    val evil = "q BI /W 2 /H 2 /CS /G /BPC 8 ID  ET(Tj þ EI Q BT 72 700 Td (after) Tj ET"
    assert(PdfOps.extractPdfText(pdf(evil)) == "after")
    // ID missing: tolerated (rest of stream skipped), no throw
    val noId = "BI /W 2 /H 2 BT 72 700 Td (lost) Tj ET"
    assert(PdfOps.extractPdfText(pdf(noId)) != null)
    // EI missing: payload runs to end of stream, no throw
    val noEi = "BT 72 700 Td (kept) Tj ET BI /W 1 /H 1 ID  "
    assert(PdfOps.extractPdfText(pdf(noEi)) == "kept")
    // BI as a substring of a name must NOT trigger the skip
    val fake = "BT 72 700 Td /XBI 1 Tf (named) Tj ET"
    assert(PdfOps.extractPdfText(pdf(fake)) == "named")
  }

  test("octal and control escapes in PDF strings") {
    val content = "BT 72 700 Td (A\\101\\40B\\tC) Tj ET".getBytes("ISO-8859-1")
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Length " + content.length + " >>\nstream\n")
      .getBytes("ISO-8859-1") ++ content ++ "\nendstream\nendobj\n".getBytes("ISO-8859-1")
    assert(PdfOps.extractPdfText(pdf) == "AA B\tC")
  }
}
