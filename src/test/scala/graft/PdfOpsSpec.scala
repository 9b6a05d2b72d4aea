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
