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
      assert(new String(bytes.take(8), "ISO-8859-1").startsWith("%PDF-1.4"))
      assert(new String(bytes, "ISO-8859-1").contains("startxref"))
      assert(PdfOps.extractPdfText(bytes) == PdfOps.expectedText(id), s"id=$id")
      assert(PdfOps.pageCount(bytes) == PdfOps.pagesOf(id), s"id=$id")
    }
  }

  test("both stream encodings decode: Flate (even ids) and raw (odd ids)") {
    val flate = PdfOps.synthPdf(2L)
    val raw = PdfOps.synthPdf(3L)
    assert(new String(flate, "ISO-8859-1").contains("/FlateDecode"))
    assert(!new String(raw, "ISO-8859-1").contains("/FlateDecode"))
    assert(PdfOps.extractPdfText(flate) == PdfOps.expectedText(2L))
    assert(PdfOps.extractPdfText(raw) == PdfOps.expectedText(3L))
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

  test("octal and control escapes in PDF strings") {
    val content = "BT 72 700 Td (A\\101\\40B\\tC) Tj ET".getBytes("ISO-8859-1")
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Length " + content.length + " >>\nstream\n")
      .getBytes("ISO-8859-1") ++ content ++ "\nendstream\nendobj\n".getBytes("ISO-8859-1")
    assert(PdfOps.extractPdfText(pdf) == "AA B\tC")
  }
}
