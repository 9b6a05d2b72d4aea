package graft.spark

/** Deterministic planted-ground-truth corpora for the training-data ops,
  * derived purely from `doc_id` (same pattern as [[PagesGen]] for the HTML
  * queries): the DuckDB oracle recomputes the expected answer with plain
  * SQL arithmetic on `doc_id`, so a value match proves the operator
  * end-to-end.
  */
object TextFixtures extends Serializable {

  private def mix(x: Long): Long = PagesGen.mix(x)

  /** deterministic language-neutral filler token (never a stopword). */
  def word(h: Long): String = "w" + java.lang.Long.toHexString(mix(h) & 0xffffffffL)

  // ---------- language-id corpus ----------

  /** stopwords UNIQUE to one language's langId set (no cross-set overlap),
    * so the planted text's argmax language is unambiguous. */
  private val langMarkers: Map[String, Array[String]] = Map(
    "en" -> Array("the", "and", "that", "with", "for", "it"),
    "de" -> Array("und", "der", "nicht", "ein", "mit", "auf"),
    "es" -> Array("que", "los", "del", "se", "por", "y"),
    "fr" -> Array("les", "et", "est", "un", "une", "dans"))

  private val langCycle = Array("en", "de", "es", "fr", "zh", "ja", "ko", "ru", "ar")

  def plantedLang(id: Long): String = langCycle((id % langCycle.length).toInt)

  /** script-run generators for the non-Latin planted languages. */
  private val scriptBase: Map[String, (Int, Int)] = Map(
    "zh" -> (0x4E00, 0xFFF), // CJK unified
    "ja" -> (0x3041, 0x55), // hiragana+katakana span
    "ko" -> (0xAC00, 0xFFF), // hangul syllables
    "ru" -> (0x410, 0x3F), // cyrillic letters
    "ar" -> (0x621, 0x29)) // arabic letters

  /** planted-language text: 12 marker stopwords + 6 neutral filler tokens
    * (non-Latin: a script run — the script-ratio rule fires before
    * stopword scoring). */
  def langText(id: Long): String = {
    val lang = plantedLang(id)
    scriptBase.get(lang) match {
      case Some((base, span)) =>
        val sb = new java.lang.StringBuilder(48)
        var j = 0
        while (j < 40) {
          sb.append((base + java.lang.Math.floorMod(mix(id * 41L + j), (span + 1).toLong).toInt).toChar)
          if (j % 8 == 7) sb.append(' ')
          j += 1
        }
        sb.toString
      case None =>
        val markers = langMarkers(lang)
        val toks = new Array[String](18)
        var j = 0
        while (j < 12) { toks(j) = markers(((id + j) % markers.length).toInt); j += 1 }
        while (j < 18) { toks(j) = word(id * 131L + j); j += 1 }
        toks.mkString(" ")
    }
  }

  // ---------- near-dup corpora ----------

  /** MinHash corpus: docs pair up as (2k, 2k+1).
    *  - even k: the odd partner has IDENTICAL tokens joined with doubled
    *    whitespace — raw bytes differ (exact dedup misses it) but the
    *    shingle set is identical, so the LSH band keys collide
    *    deterministically and exact Jaccard is 1.0;
    *  - odd k: the odd partner has one mutated token — Jaccard ~0.76, below
    *    the 0.9 verification threshold, so the pair NEVER reaches the
    *    output (whether or not a band happened to collide).
    * Expected pairs therefore = {(2k, 2k+1) : k even}, closed form in SQL. */
  def nearDupText(id: Long): String = {
    val g = id >>> 1
    val toks = Array.tabulate(24)(j => word(g * 31L + j))
    if ((id & 1L) == 0L) toks.mkString(" ")
    else if ((g & 1L) == 0L) toks.mkString("  ")
    else { toks(7) = word(g * 31L + 7001L); toks.mkString(" ") }
  }

  /** fingerprint/SimHash corpus: pairs (2k, 2k+1) have byte-identical text
    * when k is even (equal fingerprint, Hamming 0) and unrelated text when k
    * is odd (distinct fingerprints, Hamming ~32). */
  def fpText(id: Long): String = {
    val g = id >>> 1
    val seed = if ((g & 1L) == 0L) g * 97L else g * 97L + (id & 1L) * 7919L + 13L
    Array.tabulate(20)(j => word(seed * 131L + j)).mkString(" ")
  }

  /** embedding-dedup corpus: pairs (2k, 2k+1) carry the IDENTICAL unit-ish
    * vector when k is even (cosine 1.0) and independent random vectors when
    * k is odd (|cosine| ~ 1/sqrt(dim) << threshold). */
  def pairVec(id: Long, dim: Int = 16): Array[Float] = {
    val g = id >>> 1
    val seed = if ((g & 1L) == 0L) g * 53L else g * 53L + (id & 1L) * 6007L + 11L
    Array.tabulate(dim) { j =>
      (((mix(seed * 257L + j) & 0xffff) / 32768.0) - 1.0).toFloat
    }
  }
}
