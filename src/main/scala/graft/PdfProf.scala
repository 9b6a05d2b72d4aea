package graft
object PdfProf {
  def main(args: Array[String]): Unit = {
    import graft.spark.PdfOps
    (0L until 70L).foreach(id => PdfOps.extractPdfText(PdfOps.synthPdf(id)))
    // value-identity: extractPdfDoc == (extractPdfText, pageCount) over all variants
    var bad = 0
    (0L until 700L).foreach { id =>
      val b = PdfOps.synthPdf(id)
      val (t, n) = PdfOps.extractPdfDoc(b)
      if (t != PdfOps.extractPdfText(b) || n != PdfOps.pageCount(b)) { bad += 1; println(s"MISMATCH id=$id") }
    }
    println(s"identity check: $bad mismatches over 700 docs")
    for (v <- Seq(2, 6)) {
      val ids = (0L until 7000L).filter(_ % 7 == v).take(500)
      val bytes = ids.map(PdfOps.synthPdf)
      val t0 = System.nanoTime()
      bytes.foreach(PdfOps.extractPdfDoc)
      println(f"variant $v: combined=${(System.nanoTime()-t0)/1e6/500}%.3f ms/doc")
    }
  }
}
