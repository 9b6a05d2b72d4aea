package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.{Deflater, Inflater}
import scala.collection.mutable.ArrayBuffer

/** PDF text / layout extraction (north rule: "HTML boilerplate strip,
  * PDF/layout parse, DOM heuristics") — a pure-JVM extractor, no codec
  * libraries:
  *
  *   - STRUCTURED path first ([[PdfModel]]): real cross-reference
  *     resolution (classic tables AND /Type /XRef streams), /ObjStm,
  *     page-tree-ordered extraction, /Resources /Font -> /ToUnicode CMap
  *     mapping for Type0 show strings, filter chains (Flate + predictors,
  *     ASCIIHex, ASCII85);
  *   - tolerant fallback: content streams located by `stream`/`endstream`
  *     spans in byte order when the structure is broken (crawl reality);
  *   - the text operators are interpreted: `Td`/`TD`/`Tm`/`TL`/`T*`
  *     position state, `(...) Tj`, `<hex> Tj`, `[..] TJ`, and the
  *     `'`/`"` next-line shows (PDF string escapes incl. octal and
  *     line continuations);
  *   - LAYOUT ordering, not stream ordering: segments within a page are
  *     emitted top-to-bottom then left-to-right (y desc, x asc) regardless
  *     of the order the content stream drew them.
  *
  * Deterministic synthetic PDFs (seven REAL structural variants by id%7:
  * classic Flate / classic raw / xref-stream+ObjStm+Predictor-12+quote /
  * xref-stream+ASCII85-chain+hex+dquote (with a /ToUnicode'd Type0 font
  * on the quote variant) / encrypted RC4-128 R3 / encrypted AES-128 V4 /
  * encrypted AES-256 V5 R6 with an encrypted ObjStm — the last three with
  * inline images planted in the content) make every output a closed-form
  * function of the id — the DuckDB oracle recomputes the expected text
  * independently. Per-row failure yields null, never a task failure. */
object PdfOps extends Serializable {

  // ---------- synthesis (a real, openable PDF) ----------

  def pagesOf(id: Long): Int = 1 + (id % 3).toInt

  /** structural variant: 0 = classic xref + Flate content, 1 = classic
    * xref + raw content, 2 = xref STREAM (/W [1 2 1], Predictor 12) +
    * ObjStm + `'` show operator, 3 = xref stream (/W [1 3 1]) + ObjStm +
    * hex strings + `"` show operator, 4 = classic ENCRYPTED RC4-128
    * (R3, empty passwords) + an inline image in the content, 5 = classic
    * ENCRYPTED AES-128 (V4 /AESV2 crypt filter, R4) + inline image,
    * 6 = modern xref-stream/ObjStm structure ENCRYPTED AES-256 (V5 R6,
    * the hardened 2.B hash) — the encrypted-ObjStm case. The EXTRACTED
    * TEXT is identical across variants — the oracle stays closed-form in
    * the id. */
  def variantOf(id: Long): Int = (id % 7).toInt

  /** the planted per-page text, in LAYOUT order (top then bottom). */
  def expectedPageText(id: Long, p: Int): String =
    s"d$id p$p top (x)\nd$id p$p bot"

  def expectedText(id: Long): String =
    (0 until pagesOf(id)).map(p => expectedPageText(id, p)).mkString("\n")

  /** one page's content stream: the BOTTOM segment is drawn FIRST (layout
    * ordering must fix it), uses a TJ array (part concatenation), while the
    * top segment uses Tj with escaped parens. */
  private def pageContent(id: Long, p: Int): Array[Byte] = {
    val ops =
      s"BT /F1 12 Tf 72 680 Td [(d$id) ( p$p) ( bot)] TJ ET\n" +
        s"BT /F1 12 Tf 72 720 Td (d$id p$p top \\(x\\)) Tj ET\n"
    ops.getBytes(ISO_8859_1)
  }

  /** variant-2 page content: the bottom line is drawn FIRST via the `'`
    * (next-line-show) operator — `'` must apply the 40pt /TL leading
    * (720 → 680) or the layout sort emits the lines in the wrong order.
    * The top line shows through /F2, a Type0 font whose /ToUnicode CMap
    * maps 2-BYTE codes — without the CMap the raw fallback would
    * interleave NUL bytes into the text, so the oracle pins the mapping. */
  private def pageContentQuote(id: Long, p: Int): Array[Byte] = {
    val hex2 = s"d$id p$p top (x)".map(c => f"${c.toInt}%04x").mkString
    (s"BT /F1 12 Tf 72 720 Td 40 TL (d$id p$p bot) ' ET\n" +
      s"BT /F2 12 Tf 72 720 Td <$hex2> Tj ET\n").getBytes(ISO_8859_1)
  }

  /** variant-3 page content: bottom first via `"` (spacing + next-line
    * show), top as a HEX string — both PDF 32000 7.3.4.3 / 9.4.3 forms a
    * real crawl PDF uses. */
  private def pageContentHex(id: Long, p: Int): Array[Byte] = {
    val hex = s"d$id p$p top (x)".getBytes(ISO_8859_1)
      .map(b => f"${b & 0xFF}%02x").mkString
    (s"""BT /F1 12 Tf 72 720 Td 40 TL 0 0 (d$id p$p bot) " ET\n""" +
      s"BT /F1 12 Tf 72 720 Td <$hex> Tj ET\n").getBytes(ISO_8859_1)
  }

  /** [[pageContent]] preceded by an INLINE IMAGE whose 4-byte raw payload
    * is exactly the operator bytes `ET(\xfe` — if the interpreter fails to
    * skip BI..ID..EI as a unit, the stray `(` opens a string and the
    * planted text corrupts, failing the oracle. */
  private def inlineImageOps: Array[Byte] =
    "q BI /W 2 /H 2 /CS /G /BPC 8 ID ".getBytes(ISO_8859_1) ++
      Array[Byte]('E', 'T', '(', 0xFE.toByte) ++
      " EI Q\n".getBytes(ISO_8859_1)

  private def pageContentWithImage(id: Long, p: Int): Array[Byte] =
    inlineImageOps ++ pageContent(id, p)

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream(raw.length)
    val buf = new Array[Byte](512)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** a complete PDF in the structural variant of [[variantOf]]: classic
    * xref table (v0 Flate / v1 raw content), post-2005 structure — xref
    * stream + object stream (v2/v3) — or the ENCRYPTED tiers (v4 RC4,
    * v5 AES-128, v6 AES-256 over the modern structure). */
  def synthPdf(id: Long): Array[Byte] = variantOf(id) match {
    case 2 => synthModernPdf(id, hexVariant = false)
    case 3 => synthModernPdf(id, hexVariant = true)
    case 4 => synthClassicPdf(id, encrypt = 3)
    case 5 => synthClassicPdf(id, encrypt = 4)
    case 6 => synthModernPdf(id, hexVariant = false, encrypt256 = true)
    case _ => synthClassicPdf(id)
  }

  private def hexStr(b: Array[Byte]): String =
    "<" + b.map(x => f"${x & 0xFF}%02x").mkString + ">"

  /** deterministic per-document first-/ID element (16 bytes). */
  private def synthId0(id: Long): Array[Byte] =
    PdfCrypto.md5(s"graft-pdf-id0-$id".getBytes(ISO_8859_1))

  /** deterministic per-object AES IV for synthesis. */
  private def synthIv(id: Long, obj: Int): Array[Byte] =
    PdfCrypto.md5(s"graft-pdf-iv-$id-$obj".getBytes(ISO_8859_1))

  /** classic: catalog, page tree, one content stream per page (FlateDecode
    * for v0, raw for v1), font, `xref` table, trailer. `encrypt` = 0 plain,
    * 3 = RC4-128 R3, 4 = AES-128 V4 R4 — both with EMPTY user and owner
    * passwords (the crawl norm: "encryption" as permission bits only);
    * encrypted variants also plant an inline image (BI..ID..EI with
    * operator bytes in the payload) in every content stream. */
  def synthClassicPdf(id: Long, encrypt: Int = 0): Array[Byte] = {
    val np = pagesOf(id)
    // encryption material (empty passwords): O, file key, U, Encrypt dict
    val id0 = synthId0(id)
    val fk: Array[Byte] =
      if (encrypt == 0) null
      else PdfCrypto.fileKeyR234(PdfCrypto.computeOwnerEntry(encrypt, 16), -44L,
        id0, encrypt, 16, encryptMetadata = true)
    def encBody(objNum: Int, plain: Array[Byte]): Array[Byte] = encrypt match {
      case 0 => plain
      case 3 => PdfCrypto.rc4(PdfCrypto.objectKey(fk, objNum, 0, aes = false), plain)
      case _ => PdfCrypto.aesStreamEncrypt(
        PdfCrypto.objectKey(fk, objNum, 0, aes = true), synthIv(id, objNum), plain)
    }

    // objects in document order: dict source + optional stream body
    val objs = ArrayBuffer.empty[(String, Option[Array[Byte]])]
    val kids = (0 until np).map(p => s"${3 + 2 * p} 0 R").mkString(" ")
    objs += (("<< /Type /Catalog /Pages 2 0 R >>", None))
    objs += ((s"<< /Type /Pages /Kids [$kids] /Count $np >>", None))
    for (p <- 0 until np) {
      val contentObj = 3 + 2 * p + 1
      objs += ((s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Contents $contentObj 0 R /Resources << /Font << /F1 ${3 + 2 * np} 0 R >> >> >>", None))
      val raw =
        if (encrypt == 0) pageContent(id, p) else pageContentWithImage(id, p)
      val (body, filter) =
        if (variantOf(id) == 0 || encrypt > 0)
          (encBody(contentObj, deflate(raw)), " /Filter /FlateDecode")
        else (raw, "")
      objs += ((s"<< /Length ${body.length}$filter >>", Some(body)))
    }
    objs += (("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>", None))
    if (encrypt > 0) {
      val o = PdfCrypto.computeOwnerEntry(encrypt, 16)
      val u = PdfCrypto.computeUserEntry(fk, id0, encrypt)
      val dict =
        if (encrypt == 3)
          s"<< /Filter /Standard /V 2 /R 3 /Length 128 /O ${hexStr(o)} " +
            s"/U ${hexStr(u)} /P -44 >>"
        else
          s"<< /Filter /Standard /V 4 /R 4 /Length 128 " +
            s"/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF " +
            s"/O ${hexStr(o)} /U ${hexStr(u)} /P -44 >>"
      objs += ((dict, None))
    }

    val out = new ByteArrayOutputStream(1024)
    def w(str: String): Unit = out.write(str.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    val offsets = ArrayBuffer.empty[Int]
    objs.zipWithIndex.foreach { case ((dict, stream), i) =>
      offsets += out.size()
      w(s"${i + 1} 0 obj\n")
      w(dict)
      stream.foreach { body =>
        w("\nstream\n")
        out.write(body)
        w("\nendstream")
      }
      w("\nendobj\n")
    }
    val xrefAt = out.size()
    w(s"xref\n0 ${objs.length + 1}\n")
    w("0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    val encTrailer =
      if (encrypt == 0) ""
      else s" /Encrypt ${objs.length} 0 R /ID [${hexStr(id0)} ${hexStr(id0)}]"
    w(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R$encTrailer >>\nstartxref\n$xrefAt\n%%EOF\n")
    out.toByteArray
  }

  /** ASCII85 (base-85) encode with `~>` EOD, per PDF 32000 7.4.3: groups
    * of 4 bytes -> 5 chars '!'..'u', all-zero group -> 'z', partial group
    * of n bytes -> n+1 chars. */
  private def ascii85(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length * 5 / 4 + 8)
    var i = 0
    while (i < data.length) {
      val n = math.min(4, data.length - i)
      var v = 0L
      var j = 0
      while (j < 4) {
        v = (v << 8) | (if (j < n) data(i + j) & 0xFF else 0)
        j += 1
      }
      if (v == 0L && n == 4) out.write('z')
      else {
        val cs = new Array[Int](5)
        var k = 4
        while (k >= 0) { cs(k) = (v % 85).toInt + '!'; v /= 85; k -= 1 }
        var e = 0
        while (e <= n) { out.write(cs(e)); e += 1 }
      }
      i += n
    }
    out.write('~'); out.write('>')
    out.toByteArray
  }

  /** PNG Up-filter predictor (tag 2) encode, for the v2 xref stream:
    * each row = 0x02 then (raw - priorRow) bytes. */
  private def pngUpEncode(rows: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var prior = new Array[Byte](if (rows.isEmpty) 0 else rows.head.length)
    rows.foreach { r =>
      out.write(2)
      var i = 0
      while (i < r.length) { out.write((r(i) - prior(i)) & 0xFF); i += 1 }
      prior = r
    }
    out.toByteArray
  }

  /** post-2005 structure: every DICT object (catalog, page tree, pages,
    * font) lives inside a Flate'd /ObjStm; content streams are top-level
    * Flate streams; the cross-reference is a /Type /XRef STREAM with
    * type-2 entries pointing into the ObjStm — `/W [1 2 1]` behind a PNG
    * Predictor 12 for the `'`-operator variant, plain `/W [1 3 1]` for the
    * hex-string/`"` variant. No classic trailer: the xref stream dict IS
    * the trailer (PDF 32000 7.5.8). */
  def synthModernPdf(id: Long, hexVariant: Boolean,
      encrypt256: Boolean = false): Array[Byte] = {
    val np = pagesOf(id)
    val fontObj = 3 + 2 * np
    val font2Obj = 4 + 2 * np // Type0 font with /ToUnicode (in the ObjStm)
    val cmapObj = 5 + 2 * np  // the /ToUnicode CMap stream (top-level)
    val stmObj = 6 + 2 * np   // the ObjStm
    val xrefObj = 7 + 2 * np  // the XRef stream
    val encObj = 8 + 2 * np   // the /Encrypt dict (NEVER inside the ObjStm)

    // AES-256 V5 R6 (hardened 2.B hash), empty user password: every stream
    // except the xref stream encrypts with the FILE key (V5 has no
    // per-object derivation) — including the ObjStm, the case where a
    // non-decrypting reader cannot even locate the catalog
    val fileKey: Array[Byte] =
      if (!encrypt256) null
      else PdfCrypto.md5(s"graft-k1-$id".getBytes(ISO_8859_1)) ++
        PdfCrypto.md5(s"graft-k2-$id".getBytes(ISO_8859_1))
    def enc(objNum: Int, plain: Array[Byte]): Array[Byte] =
      if (!encrypt256) plain
      else PdfCrypto.aesStreamEncrypt(fileKey, synthIv(id, objNum), plain)

    // --- objects packed into the ObjStm: catalog, pages, page dicts, fonts
    val kids = (0 until np).map(p => s"${3 + 2 * p} 0 R").mkString(" ")
    val packed: Seq[(Int, String)] =
      Seq(1 -> "<< /Type /Catalog /Pages 2 0 R >>",
        2 -> s"<< /Type /Pages /Kids [$kids] /Count $np >>") ++
        (0 until np).map { p =>
          (3 + 2 * p) -> (s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
            s"/Contents ${4 + 2 * p} 0 R /Resources << /Font << " +
            s"/F1 $fontObj 0 R /F2 $font2Obj 0 R >> >> >>")
        } ++ Seq(
          fontObj -> "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
          font2Obj -> ("<< /Type /Font /Subtype /Type0 /BaseFont /Synth-CID " +
            s"/ToUnicode $cmapObj 0 R >>"))
    val bodies = packed.map(_._2.getBytes(ISO_8859_1))
    val offs = bodies.scanLeft(0)((a, b) => a + b.length + 1).init // +1 = separator space
    val header = packed.map(_._1).zip(offs).map { case (n, o) => s"$n $o" }.mkString(" ") + "\n"
    val first = header.getBytes(ISO_8859_1).length
    val objStmRaw = header.getBytes(ISO_8859_1) ++
      bodies.flatMap(b => b :+ ' '.toByte)
    val objStmBody0 = deflate(objStmRaw)

    val out = new ByteArrayOutputStream(1024)
    def w(str: String): Unit = out.write(str.getBytes(ISO_8859_1))
    w("%PDF-1.5\n")

    // --- top-level content streams, offsets recorded for the xref: plain
    // Flate for the ' variant; a CHAINED /Filter [/ASCII85Decode
    // /FlateDecode] (deflate then ascii85-armor — the order a real writer
    // uses) for the hex-string variant
    val contentOff = new Array[Int](np)
    for (p <- 0 until np) {
      val raw0 = if (hexVariant) pageContentHex(id, p) else pageContentQuote(id, p)
      // the encrypted modern tier also plants an inline image, so the
      // BI..ID..EI skip is exercised under the ObjStm+AES-256 structure too
      val raw = if (encrypt256) inlineImageOps ++ raw0 else raw0
      val (body, filter) =
        if (hexVariant) (ascii85(deflate(raw)), "[/ASCII85Decode /FlateDecode]")
        else (enc(4 + 2 * p, deflate(raw)), "/FlateDecode")
      contentOff(p) = out.size()
      w(s"${4 + 2 * p} 0 obj\n<< /Length ${body.length} /Filter $filter >>\nstream\n")
      out.write(body)
      w("\nendstream\nendobj\n")
    }

    // --- the /ToUnicode CMap stream (2-byte identity over printable
    // ASCII via one bfrange, plus a bfchar entry — the forms a real
    // subset-embedded font writes)
    // every entry FORM is load-bearing for the planted text: 'd' resolves
    // only through the ARRAY bfrange, 'p' only through the bfchar, the
    // rest through consecutive bfranges — a parser that skips any form
    // corrupts the text and fails the oracle
    val cmapRaw = ("/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n" +
      "1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
      "4 beginbfrange\n" +
      "<0020> <0063> <0020>\n" +
      "<0064> <0065> [<0064> <0065>]\n" +
      "<0066> <006f> <0066>\n" +
      "<0071> <007e> <0071>\n" +
      "endbfrange\n" +
      "1 beginbfchar\n<0070> <0070>\nendbfchar\n" +
      "endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n")
      .getBytes(ISO_8859_1)
    val cmapBody = enc(cmapObj, deflate(cmapRaw))
    val cmapOff = out.size()
    w(s"$cmapObj 0 obj\n<< /Length ${cmapBody.length} /Filter /FlateDecode >>\nstream\n")
    out.write(cmapBody)
    w("\nendstream\nendobj\n")

    // --- the ObjStm (encrypted when the V5 tier is on)
    val objStmBody = enc(stmObj, objStmBody0)
    val objStmOff = out.size()
    w(s"$stmObj 0 obj\n<< /Type /ObjStm /N ${packed.length} /First $first " +
      s"/Length ${objStmBody.length} /Filter /FlateDecode >>\nstream\n")
    out.write(objStmBody)
    w("\nendstream\nendobj\n")

    // --- the /Encrypt dict: a TOP-LEVEL object (PDF 32000 7.5.7 forbids
    // it inside an object stream — readers must parse it before any
    // decryption exists). /O and /OE are placeholders: empty-user-password
    // opening never consults the owner entries.
    val encOff = out.size()
    if (encrypt256) {
      val vsalt = java.util.Arrays.copyOf(
        PdfCrypto.md5(s"graft-vs-$id".getBytes(ISO_8859_1)), 8)
      val ksalt = java.util.Arrays.copyOf(
        PdfCrypto.md5(s"graft-ks-$id".getBytes(ISO_8859_1)), 8)
      val (u, ue) = PdfCrypto.computeUserEntryV5(fileKey, vsalt, ksalt, r = 6)
      w(s"$encObj 0 obj\n<< /Filter /Standard /V 5 /R 6 /Length 256 " +
        s"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF " +
        s"/O ${hexStr(new Array[Byte](48))} /OE ${hexStr(new Array[Byte](32))} " +
        s"/U ${hexStr(u)} /UE ${hexStr(ue)} /P -44 >>\nendobj\n")
    }

    // --- the XRef stream (entries for objects 0..xrefObj)
    val xrefOff = out.size()
    val w123: (Int, Int, Int) = if (hexVariant) (1, 3, 1) else (1, 2, 1)
    def row(f1: Int, f2: Long, f3: Int): Array[Byte] = {
      val (w1, w2, w3) = w123
      val b = new Array[Byte](w1 + w2 + w3)
      var i = 0
      var k = w1 - 1
      while (k >= 0) { b(i) = ((f1 >> (8 * k)) & 0xFF).toByte; i += 1; k -= 1 }
      k = w2 - 1
      while (k >= 0) { b(i) = ((f2 >> (8 * k)) & 0xFF).toByte; i += 1; k -= 1 }
      k = w3 - 1
      while (k >= 0) { b(i) = ((f3 >> (8 * k)) & 0xFF).toByte; i += 1; k -= 1 }
      b
    }
    val rows: Seq[Array[Byte]] =
      Seq(row(0, 0, 0), // obj 0: free
        row(2, stmObj, 0), // catalog  -> ObjStm idx 0
        row(2, stmObj, 1)) ++ // pages -> idx 1
        (0 until np).flatMap { p =>
          Seq(row(2, stmObj, 2 + p), // page dict
            row(1, contentOff(p), 0)) // content stream
        } ++
        Seq(row(2, stmObj, 2 + np), // font F1
          row(2, stmObj, 3 + np), // font F2 (/ToUnicode)
          row(1, cmapOff, 0), // the CMap stream
          row(1, objStmOff, 0), // the ObjStm itself
          row(1, xrefOff, 0)) ++ // this XRef stream
        (if (encrypt256) Seq(row(1, encOff, 0)) else Nil) // the Encrypt dict
    val (xrefData, parms) =
      if (hexVariant) (rows.flatten.toArray, "")
      else (pngUpEncode(rows),
        s" /DecodeParms << /Predictor 12 /Columns ${w123._1 + w123._2 + w123._3} >>")
    val xrefBody = deflate(xrefData)
    val (w1, w2, w3) = w123
    val size = if (encrypt256) encObj + 1 else xrefObj + 1
    val encEntry =
      if (encrypt256) s" /Encrypt $encObj 0 R /ID [${hexStr(synthId0(id))} ${hexStr(synthId0(id))}]"
      else ""
    w(s"$xrefObj 0 obj\n<< /Type /XRef /Size $size /W [$w1 $w2 $w3] " +
      s"/Root 1 0 R$encEntry /Length ${xrefBody.length} /Filter /FlateDecode$parms >>\nstream\n")
    out.write(xrefBody)
    w("\nendstream\nendobj\n")
    w(s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  // ---------- extraction ----------

  private def inflate(body: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    // end() on EVERY path (truncated early return, DataFormatException):
    // a leaked Inflater holds native zlib memory until finalization — at
    // corpus scale over many corrupt PDFs that outruns heap pressure
    try {
      inf.setInput(body)
      val out = new ByteArrayOutputStream(body.length * 4)
      val buf = new Array[Byte](1024)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return out.toByteArray // truncated
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally inf.end()
  }

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val n = needle.getBytes(ISO_8859_1)
    var i = from
    val lim = hay.length - n.length
    while (i <= lim) {
      var k = 0
      while (k < n.length && hay(i + k) == n(k)) k += 1
      if (k == n.length) return i
      i += 1
    }
    -1
  }

  /** the dict source immediately preceding a `stream` keyword at `s`:
    * whitespace walks back from s onto the dict's OWN `>>`, then a
    * backward depth scan finds its MATCHING `<<` (nested dicts like
    * /DecodeParms << .. >> handled). Empty when no dict directly precedes
    * (a "stream" byte-match inside binary data) — the old walk treated
    * the dict's own `>>` as a nested close and captured the whole file
    * prefix, misclassifying every stream after the first /ObjStm. */
  private def dictBefore(bytes: Array[Byte], s: Int): String = {
    var e = s - 1
    while (e > 0 && (bytes(e) == '\r' || bytes(e) == '\n' || bytes(e) == ' ' ||
      bytes(e) == '\t')) e -= 1
    if (e < 1 || bytes(e) != '>' || bytes(e - 1) != '>') return ""
    var i = e - 2
    var depth = 0
    while (i > 0) {
      if (bytes(i - 1) == '>' && bytes(i) == '>') { depth += 1; i -= 2 }
      else if (bytes(i - 1) == '<' && bytes(i) == '<') {
        if (depth == 0) return new String(bytes, i - 1, e + 2 - (i - 1), ISO_8859_1)
        depth -= 1; i -= 2
      } else i -= 1
    }
    ""
  }

  private final case class Seg(stream: Int, y: Double, x: Double, text: String)

  private def isWsByte(b: Byte): Boolean =
    b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == 0 || b == '\f'
  private def isWsOrDelim(b: Byte): Boolean =
    isWsByte(b) || b == '(' || b == ')' || b == '<' || b == '>' || b == '[' ||
      b == ']' || b == '{' || b == '}' || b == '/' || b == '%'

  /** a font's /ToUnicode mapping: code width in bytes (from the CMap's
    * codespace range) and code -> unicode string. */
  private[spark] final case class PdfFont(codeBytes: Int, cmap: Map[Int, String])

  /** parse a decoded /ToUnicode CMap stream: codespacerange width,
    * bfchar pairs, bfrange runs (consecutive-dst and array forms).
    * CMaps are tiny — regex scanning is fine. */
  private[spark] def parseCMap(bytes: Array[Byte]): PdfFont = {
    val s = new String(bytes, ISO_8859_1)
    def hexToInt(h: String): Int = java.lang.Integer.parseInt(h, 16)
    def hexToStr(h: String): String = {
      val bs = h.grouped(2).map(p => java.lang.Integer.parseInt(p, 16).toByte).toArray
      new String(bs, java.nio.charset.StandardCharsets.UTF_16BE)
    }
    val codeBytes = {
      val m = java.util.regex.Pattern
        .compile("begincodespacerange\\s*<([0-9a-fA-F]+)>").matcher(s)
      if (m.find()) math.max(1, m.group(1).length / 2) else 1
    }
    val map = scala.collection.mutable.HashMap.empty[Int, String]
    // bfchar: <src> <dst> pairs
    val bfchar = java.util.regex.Pattern
      .compile("beginbfchar(.*?)endbfchar", java.util.regex.Pattern.DOTALL).matcher(s)
    val pair = java.util.regex.Pattern.compile("<([0-9a-fA-F]+)>\\s*<([0-9a-fA-F]+)>")
    while (bfchar.find()) {
      val pm = pair.matcher(bfchar.group(1))
      while (pm.find()) map(hexToInt(pm.group(1))) = hexToStr(pm.group(2))
    }
    // bfrange: <lo> <hi> <dstStart>  |  <lo> <hi> [<d0> <d1> ...]
    val bfrange = java.util.regex.Pattern
      .compile("beginbfrange(.*?)endbfrange", java.util.regex.Pattern.DOTALL).matcher(s)
    val run = java.util.regex.Pattern.compile(
      "<([0-9a-fA-F]+)>\\s*<([0-9a-fA-F]+)>\\s*(<([0-9a-fA-F]+)>|\\[([^\\]]*)\\])")
    while (bfrange.find()) {
      val rm = run.matcher(bfrange.group(1))
      while (rm.find()) {
        val lo = hexToInt(rm.group(1))
        val hi = hexToInt(rm.group(2))
        if (hi >= lo && hi - lo < (1 << 16)) {
          if (rm.group(4) != null) { // consecutive form: dst start increments
            val dstHex = rm.group(4)
            val base = hexToInt(dstHex.takeRight(4))
            val prefix = dstHex.dropRight(4)
            var c = lo
            while (c <= hi) {
              map(c) = hexToStr(prefix + f"${base + (c - lo)}%04x")
              c += 1
            }
          } else { // array form: one dst per code
            val am = java.util.regex.Pattern.compile("<([0-9a-fA-F]+)>").matcher(rm.group(5))
            var c = lo
            while (am.find() && c <= hi) { map(c) = hexToStr(am.group(1)); c += 1 }
          }
        }
      }
    }
    PdfFont(codeBytes, map.toMap)
  }

  /** map a raw show-string (chars = code bytes) through a font's CMap,
    * consuming codeBytes per code; unmapped codes fall back to their raw
    * bytes (crawl tolerance). */
  private def applyCMap(raw: String, font: PdfFont): String = {
    if (font == null || font.cmap.isEmpty) return raw
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      if (i + font.codeBytes <= raw.length) {
        var code = 0
        var j = 0
        while (j < font.codeBytes) { code = (code << 8) | (raw.charAt(i + j) & 0xFF); j += 1 }
        font.cmap.get(code) match {
          case Some(u) => sb.append(u)
          case None => sb.append(raw, i, i + font.codeBytes)
        }
        i += font.codeBytes
      } else { sb.append(raw.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** interpret one decoded content stream's text operators: `Td`/`TD`/`Tm`
    * position state, `TL` leading + `T*` next-line, `(..) Tj` / `<hex> Tj`
    * / `[..] TJ` shows, and the `'` and `"` next-line-show operators
    * (PDF 32000 9.4.3). */
  private def readOps(content: Array[Byte], streamNo: Int, segs: ArrayBuffer[Seg],
      fonts: Map[String, PdfFont] = Map.empty): Unit = {
    var i = 0
    var x = 0.0
    var y = 0.0
    var leading = 0.0
    var lastName: String = ""
    var curFont: PdfFont = null
    val nums = new ArrayBuffer[Double](6)
    val parts = new ArrayBuffer[String](4)
    def push(raw: String): Unit =
      parts += (if (curFont != null) applyCMap(raw, curFont) else raw)
    def flushText(): Unit = {
      if (parts.nonEmpty) { segs += Seg(streamNo, y, x, parts.mkString("")); parts.clear() }
    }
    while (i < content.length) {
      val c = content(i).toChar
      if (c == '(') {
        // PDF string with escapes
        val sb = new java.lang.StringBuilder()
        i += 1
        var depth = 1
        while (i < content.length && depth > 0) {
          val ch = content(i).toChar
          if (ch == '\\' && i + 1 < content.length) {
            val e = content(i + 1).toChar
            e match {
              case 'n' => sb.append('\n'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case 't' => sb.append('\t'); i += 2
              case '(' | ')' | '\\' => sb.append(e); i += 2
              case d if d >= '0' && d <= '7' =>
                var v = 0; var k = 0
                i += 1
                while (k < 3 && i < content.length &&
                  content(i) >= '0' && content(i) <= '7') { v = v * 8 + (content(i) - '0'); i += 1; k += 1 }
                sb.append((v & 0xFF).toChar) // PDF 32000 7.3.4.2: high overflow bits ignored
              case '\n' => i += 2 // backslash-EOL = line continuation: no character
              case '\r' =>
                i += 2
                if (i < content.length && content(i) == '\n') i += 1
              case other => sb.append(other); i += 2
            }
          } else if (ch == '(') { depth += 1; sb.append(ch); i += 1 }
          else if (ch == ')') { depth -= 1; if (depth > 0) sb.append(ch); i += 1 }
          else { sb.append(ch); i += 1 }
        }
        push(sb.toString)
      } else if (c == '/') {
        // name token: remembered for the next Tf (font selection)
        val ns = i + 1
        i += 1
        while (i < content.length && {
          val ch = content(i).toChar
          ch.isLetterOrDigit || ch == '_' || ch == '-' || ch == '.' || ch == '+'
        }) i += 1
        lastName = new String(content, ns, i - ns, ISO_8859_1)
      } else if (c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        val s = i
        i += 1
        while (i < content.length && { val ch = content(i).toChar
          ch == '.' || (ch >= '0' && ch <= '9') }) i += 1
        try nums += new String(content, s, i - s, ISO_8859_1).toDouble
        catch { case _: NumberFormatException => }
      } else if (c == 'T' && i + 1 < content.length) {
        val op = content(i + 1).toChar
        op match {
          case 'd' => // x y Td
            if (nums.length >= 2) { x += nums(nums.length - 2); y += nums(nums.length - 1) }
            nums.clear(); i += 2
          case 'D' => // x y TD: Td + set leading to -ty (PDF 32000 9.4.2)
            if (nums.length >= 2) {
              x += nums(nums.length - 2); y += nums(nums.length - 1)
              leading = -nums(nums.length - 1)
            }
            nums.clear(); i += 2
          case 'L' => // n TL: set text leading
            if (nums.nonEmpty) leading = nums.last
            nums.clear(); i += 2
          case '*' => // T*: next line (0 -TL Td)
            y -= leading; nums.clear(); i += 2
          case 'f' => // /Name size Tf: select the font (CMap scope)
            curFont = fonts.getOrElse(lastName, null)
            nums.clear(); i += 2
          case 'm' => // a b c d e f Tm: take the translation
            if (nums.length >= 6) { x = nums(nums.length - 2); y = nums(nums.length - 1) }
            nums.clear(); i += 2
          case 'j' => flushText(); nums.clear(); i += 2 // Tj
          case 'J' => flushText(); nums.clear(); i += 2 // TJ (array parts already gathered)
          case _ => nums.clear(); i += 2
        }
      } else if (c == '\'' || c == '"') {
        // next-line-show: T* first, then show the gathered string; `"` also
        // carries aw/ac spacing operands (irrelevant to extracted text)
        y -= leading; flushText(); nums.clear(); i += 1
      } else if (c == '<') {
        if (i + 1 < content.length && content(i + 1) == '<') {
          // inline dict (BDC/DP property lists): skip to the MATCHING '>>'
          // so dict strings like /Alt (alternate text) never leak into the
          // extracted text, string escapes honored
          var depth = 1
          i += 2
          while (i < content.length && depth > 0) {
            val ch = content(i)
            if (ch == '<' && i + 1 < content.length && content(i + 1) == '<') { depth += 1; i += 2 }
            else if (ch == '>' && i + 1 < content.length && content(i + 1) == '>') { depth -= 1; i += 2 }
            else if (ch == '(') {
              var pd = 1
              i += 1
              while (i < content.length && pd > 0) {
                if (content(i) == '\\') i += 2
                else {
                  if (content(i) == '(') pd += 1
                  else if (content(i) == ')') pd -= 1
                  i += 1
                }
              }
            } else i += 1
          }
        } else {
          // hex string <48656c6c6f>: pairs of hex digits, whitespace
          // allowed, odd final digit takes a 0 low nibble
          val sb = new java.lang.StringBuilder()
          i += 1
          var hi = -1
          while (i < content.length && content(i) != '>') {
            val d = Character.digit(content(i), 16)
            if (d >= 0) { if (hi < 0) hi = d else { sb.append(((hi << 4) | d).toChar); hi = -1 } }
            i += 1
          }
          if (hi >= 0) sb.append((hi << 4).toChar)
          if (i < content.length) i += 1 // consume '>'
          push(sb.toString)
        }
      } else if (c == 'B' && i + 1 < content.length && content(i + 1) == 'I' &&
        (i == 0 || isWsOrDelim(content(i - 1))) &&
        (i + 2 >= content.length || isWsByte(content(i + 2)) || content(i + 2) == '/')) {
        // inline image (BI <dict> ID <binary> EI, PDF 32000 8.9.7): the
        // payload is raw unescaped binary that can contain every text-
        // operator byte — skip the whole construct or the operator walk
        // desynchronizes (the same failure mode as unframed WARC payloads).
        i += 2
        var idEnd = -1 // the ws-delimited ID token closing the image dict
        while (idEnd < 0 && i + 1 < content.length) {
          if (content(i) == 'I' && content(i + 1) == 'D' && isWsByte(content(i - 1)) &&
            (i + 2 >= content.length || isWsByte(content(i + 2)))) idEnd = i + 2
          else i += 1
        }
        if (idEnd < 0) i = content.length
        else {
          i = idEnd + 1 // exactly ONE whitespace byte separates ID from data
          var ei = -1 // payload ends at ws + EI + (ws | EOF)
          while (ei < 0 && i + 1 < content.length) {
            if (content(i) == 'E' && content(i + 1) == 'I' && isWsByte(content(i - 1)) &&
              (i + 2 >= content.length || isWsByte(content(i + 2)))) ei = i + 2
            else i += 1
          }
          i = if (ei < 0) content.length else ei
        }
        nums.clear()
      } else if (c == 'B' && i + 1 < content.length && content(i + 1) == 'T') {
        x = 0.0; y = 0.0; nums.clear(); parts.clear(); i += 2 // BT resets the text matrix
      } else if (c == 'E' && i + 1 < content.length && content(i + 1) == 'T') {
        flushText(); nums.clear(); i += 2
      } else i += 1
    }
    flushText()
  }

  private def renderSegs(segs: ArrayBuffer[Seg]): String = {
    if (segs.isEmpty) ""
    else segs.groupBy(_.stream).toSeq.sortBy(_._1)
      .map { case (_, ss) =>
        ss.sortBy(s => (-s.y, s.x)).map(_.text).mkString("\n")
      }.mkString("\n")
  }

  /** structured extraction: resolve the cross-reference (classic table OR
    * xref stream, ObjStm-aware), walk the page tree in order, interpret
    * each page's content streams. None when the structure is unusable —
    * the caller falls back to the tolerant scan. */
  /** a page's /Resources /Font entries that carry a /ToUnicode CMap,
    * parsed and cached per font object across pages. Best-effort: a
    * broken font contributes nothing (shows fall back to raw bytes). */
  private def pageFonts(doc: PdfModel.Doc, page: Map[String, Any],
      cache: scala.collection.mutable.HashMap[Any, PdfFont]): Map[String, PdfFont] = {
    doc.resolve(page.getOrElse("Resources", null)) match {
      case res: Map[_, _] =>
        doc.resolve(res.asInstanceOf[Map[String, Any]].getOrElse("Font", null)) match {
          case fd: Map[_, _] =>
            fd.asInstanceOf[Map[String, Any]].flatMap { case (name, fref) =>
              val font = cache.getOrElseUpdate(fref, {
                try doc.resolve(fref) match {
                  case f: Map[_, _] =>
                    doc.resolve(f.asInstanceOf[Map[String, Any]].getOrElse("ToUnicode", null)) match {
                      case s: PdfModel.PStream =>
                        parseCMap(PdfModel.decodeStream(s, doc.resolve))
                      case _ => null
                    }
                  case _ => null
                } catch { case scala.util.control.NonFatal(_) => null }
              })
              if (font == null) None else Some(name -> font)
            }
          case _ => Map.empty[String, PdfFont]
        }
      case _ => Map.empty[String, PdfFont]
    }
  }

  private def structuredText(bytes: Array[Byte]): Option[String] = {
    try {
      val doc = new PdfModel.Doc(bytes)
      structuredFrom(doc, doc.pages())
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** the interpretation half of the structured path, over an
    * already-opened document — lets [[extractPdfDoc]] share one xref
    * resolution + key derivation between text and page count. */
  private def structuredFrom(doc: PdfModel.Doc,
      pages: Seq[Map[String, Any]]): Option[String] = {
    try {
      if (pages.isEmpty) None
      else {
        val segs = ArrayBuffer.empty[Seg]
        val fontCache = scala.collection.mutable.HashMap.empty[Any, PdfFont]
        pages.zipWithIndex.foreach { case (pg, pi) =>
          val fonts = try pageFonts(doc, pg, fontCache)
            catch { case scala.util.control.NonFatal(_) => Map.empty[String, PdfFont] }
          doc.pageContents(pg).foreach { content =>
            // per-stream tolerance, same contract as the scan path
            try readOps(content, pi, segs, fonts)
            catch { case scala.util.control.NonFatal(_) => }
          }
        }
        // zero segments = the page tree parsed but NO content resolved
        // (stale incremental-update xref is the classic cause): let the
        // tolerant byte-order scan have its shot instead of reporting ""
        if (segs.isEmpty) None else Some(renderSegs(segs))
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** extracted text of a PDF in layout order, pages/blocks joined with
    * newlines. Structured path first (real xref resolution → page-tree
    * page ORDER, not byte order); tolerant whole-file stream scan when the
    * structure is broken (crawl reality). Null on anything unparseable. */
  def extractPdfText(bytes: Array[Byte]): String = {
    if (bytes == null || bytes.length < 8) return null
    if (!(bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' && bytes(3) == 'F')) return null
    structuredText(bytes) match {
      case Some(t) => t
      case None => scanText(bytes)
    }
  }

  /** text AND page count from ONE parse: the document (xref resolution,
    * encryption key derivation — the expensive part for AES-256/R6 files)
    * is opened once and shared, where [[extractPdfText]] + [[pageCount]]
    * each open it independently. Value-identical to calling the two
    * single-purpose entry points (the gate oracle pins this). */
  def extractPdfDoc(bytes: Array[Byte]): (String, Int) = {
    if (bytes == null) return (null, 0)
    val parsed =
      try {
        val doc = new PdfModel.Doc(bytes)
        Some((doc, doc.pages()))
      } catch { case scala.util.control.NonFatal(_) => None }
    val text =
      if (bytes.length < 8 ||
          !(bytes(0) == '%' && bytes(1) == 'P' && bytes(2) == 'D' && bytes(3) == 'F')) null
      else parsed.flatMap { case (doc, pages) => structuredFrom(doc, pages) }
        .getOrElse(scanText(bytes))
    val n = parsed.map(_._2.length).getOrElse(0)
    (text, if (n > 0) n else pageCountScan(bytes))
  }

  /** the tolerant path: interpret every located stream span as content,
    * skipping xref/object streams (binary tables / packed dicts, not text
    * operators). */
  private def scanText(bytes: Array[Byte]): String = {
    try {
      val segs = ArrayBuffer.empty[Seg]
      var at = 0
      var streamNo = 0
      var more = true
      while (more) {
        val s = indexOf(bytes, "stream", at)
        if (s < 0) more = false
        else {
          val dict = dictBefore(bytes, s)
          var body = s + "stream".length
          if (body < bytes.length && bytes(body) == '\r') body += 1
          if (body < bytes.length && bytes(body) == '\n') body += 1
          val e = indexOf(bytes, "endstream", body)
          if (e < 0) more = false
          else {
            var end = e
            // the generator writes "\nendstream"; strip one trailing EOL
            if (end > body && bytes(end - 1) == '\n') end -= 1
            if (end > body && bytes(end - 1) == '\r') end -= 1
            val raw = java.util.Arrays.copyOfRange(bytes, body, end)
            // per-stream tolerance: one corrupt stream (bad Flate data,
            // garbage operators) skips, it never nulls the whole document
            try {
              if (!dict.contains("/ObjStm") && !dict.contains("/XRef")) {
                val content = if (dict.contains("/FlateDecode")) inflate(raw) else raw
                readOps(content, streamNo, segs)
              }
            } catch { case scala.util.control.NonFatal(_) => }
            streamNo += 1
            at = e + "endstream".length
          }
        }
      }
      renderSegs(segs)
    } catch {
      case scala.util.control.NonFatal(_) => null
    }
  }

  /** page count via the page-tree /Count when present, else /Type /Page
    * object occurrences. Hardened: the /Count is taken from a dict that
    * also names /Type /Pages (an outline dict carries /Count too — PDF
    * 32000 12.3.3 — and must not win), digits are length-capped so a
    * hostile '/Count 99999999999' can never throw NumberFormatException,
    * and any residual parse failure yields 0, never a task failure. */
  def pageCount(bytes: Array[Byte]): Int = {
    if (bytes == null) return 0
    val structured =
      try new PdfModel.Doc(bytes).pages().length
      catch { case scala.util.control.NonFatal(_) => 0 }
    if (structured > 0) structured else pageCountScan(bytes)
  }

  /** the tolerant fallback half of [[pageCount]] (regex over raw bytes +
    * inflated /ObjStm bodies). */
  private def pageCountScan(bytes: Array[Byte]): Int = {
    try {
      // regex fallback over the raw bytes PLUS every inflated /ObjStm body
      // (a modern PDF's /Type /Pages /Count lives inside one)
      val s = new String(bytes, ISO_8859_1) + objStmTexts(bytes)
      val pagesDict = java.util.regex.Pattern
        .compile("/Type\\s*/Pages[^>]{0,200}?/Count\\s+(\\d{1,9})(?!\\d)|/Count\\s+(\\d{1,9})(?!\\d)[^>]{0,200}?/Type\\s*/Pages")
        .matcher(s)
      if (pagesDict.find()) {
        val g = if (pagesDict.group(1) != null) pagesDict.group(1) else pagesDict.group(2)
        g.toInt
      } else {
        val any = java.util.regex.Pattern.compile("/Count\\s+(\\d{1,9})(?!\\d)").matcher(s)
        if (any.find()) any.group(1).toInt
        else java.util.regex.Pattern.compile("/Type\\s*/Page(?!s)").matcher(s)
          .results().count().toInt
      }
    } catch { case scala.util.control.NonFatal(_) => 0 }
  }

  /** concatenated inflated bodies of every /ObjStm stream span, for the
    * tolerant pageCount fallback. Best-effort: any failure contributes
    * nothing. */
  private def objStmTexts(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder()
    try {
      var at = 0
      var more = true
      while (more) {
        val s = indexOf(bytes, "stream", at)
        if (s < 0) more = false
        else {
          val dict = dictBefore(bytes, s)
          var body = s + "stream".length
          if (body < bytes.length && bytes(body) == '\r') body += 1
          if (body < bytes.length && bytes(body) == '\n') body += 1
          val e = indexOf(bytes, "endstream", body)
          if (e < 0) more = false
          else {
            if (dict.contains("/ObjStm")) {
              var end = e
              if (end > body && bytes(end - 1) == '\n') end -= 1
              if (end > body && bytes(end - 1) == '\r') end -= 1
              try {
                val raw = java.util.Arrays.copyOfRange(bytes, body, end)
                val content = if (dict.contains("/FlateDecode")) inflate(raw) else raw
                sb.append('\n').append(new String(content, ISO_8859_1))
              } catch { case scala.util.control.NonFatal(_) => }
            }
            at = e + "endstream".length
          }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => }
    sb.toString
  }

  /** materialize the per-doc PDF bytes to parquet once per (doc count,
    * synth version) so the timed bench span measures decrypt+parse+extract
    * instead of per-trial synthesis — the AES-256/R6 variants pay the
    * iterated key-derivation hash on the ENCRYPT side too, which is
    * fixture-building, not engine work (same hygiene as
    * [[WarcOps.warcBytesPath]]). Contents are a pure function of doc_id,
    * so cross-session reuse is exact; the version tag guards staleness. */
  private def pdfBytesPath(spark: SparkSession, sfDir: String): String = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val n = docs.count()
    // v8: the v7 cache inherited the documents scan's task count (7 files
    // at sf0.1) and parquet row groups are the split floor — so the
    // EXTRACTION stage ran 7-wide on 32 cores (guide §6: file count sets
    // task granularity). Hash-repartition the ids into ≤256 deterministic
    // files so every core gets work at any SPARK_GRAFT_CPUS.
    val dir = s"/tmp/graft_pdf_bytes/n$n-v8"
    if (!new java.io.File(s"$dir/_SUCCESS").isFile) {
      docs.select(col("doc_id"))
        .repartition(math.min(n, 256L).toInt, col("doc_id")).as[Long]
        .map(id => (id, synthPdf(id)))
        .toDF("doc_id", "pdf")
        .write.mode("overwrite").parquet(dir)
    }
    dir
  }

  /** deterministic PDF pipeline over the documents table: a real PDF per
    * row (pre-materialized, see [[pdfBytesPath]]; structural variant by
    * id%7: classic / xref-stream+ObjStm / encrypted RC4 / AES-128 /
    * AES-256-R6), extract text + page count per partition — every column
    * closed-form for the DuckDB oracle. */
  def pdfTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(pdfBytesPath(spark, sfDir))
      .select(col("doc_id").as[Long], col("pdf").as[Array[Byte]])
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (text, n) = extractPdfDoc(bytes)
          (id, text, n.toLong)
        }
      }.toDF("doc_id", "pdf_text", "n_pages")
  }
}
