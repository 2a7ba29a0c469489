package graft.functions

/** OMIM title normalization (OMIM.py:815-864 `_cleanup_label` +
  * :866-890 `_get_alt_labels`): the reference reformats the ALL-CAPS
  * OMIM labels — drop the `;`-suffixed abbreviation, convert interior
  * roman numerals under 100 to integers (keeping any non-roman suffix,
  * e.g. IIIB → 3B), title-case every word except interior conjunctions
  * / short prepositions / articles.
  */
object OmimLabel {

  private val small = Set(
    "and", "but", "yet", "for", "nor", "so", // conjunctions
    "at", "by", "in", "of", "on", "to", "up", "as", "it", "or", // preps
    "a", "an", "the") // articles

  /** romanplus.py:54-66 — a word "is roman" when it is a (possibly
    * non-canonical) numeral plus at most one trailing capital; the
    * backtracking regex lets the last numeral letter serve as that
    * suffix, so bare 'V' or 'IV' match too. */
  private val RomanWord =
    "^M{0,4}(?:CM|CD|D?C{0,3})(?:XC|XL|L?X{0,3})(?:IX|IV|V?I{0,3})[A-Z]$".r

  /** Python str.title(): uppercase each letter that follows a
    * non-letter, lowercase the rest (the reference title-cases word by
    * word, so digit-led suffixes like "3B" keep the capital). */
  private def pyTitle(s: String): String = {
    val sb = new StringBuilder(s.length)
    var prevLetter = false
    s.foreach { c =>
      if (c.isLetter) {
        sb.append(if (prevLetter) c.toLower else c.toUpper)
        prevLetter = true
      } else { sb.append(c); prevLetter = false }
    }
    sb.toString
  }

  def cleanupLabel(label: String): String = {
    val lbl = label.split(";")(0).trim
    lbl.split("\\s+").toSeq.zipWithIndex.map { case (w0, i) =>
      // first word is exempt ("X inactivation" stays); a roman word
      // under 100 converts, keeping the non-roman suffix (IIIB → 3B);
      // ≥100 stays ("SYNDROME C" survives) — OMIM.py:836-851
      val w =
        if (i > 0 && RomanWord.pattern.matcher(w0).matches()) {
          val n = Roman.prefixValue(w0)
          if (n > 0 && n < 100)
            s"$n${w0.replaceFirst(java.util.regex.Pattern.quote(Roman.toRoman(n)), "")}"
          else w0
        } else w0
      val titled = pyTitle(w)
      if (i > 0 && small(titled.toLowerCase)) titled.toLowerCase else titled
    }.mkString(" ")
  }

  /** Double-semicolon-delimited alternative/included titles → cleaned
    * labels; the `, INCLUDED` marker is stripped first (case-sensitive,
    * matching the reference's actual re.sub call — its IGNORECASE flag
    * lands in the `count` argument). */
  def altLabels(titles: String): Seq[String] =
    titles.split(";;").toSeq.map(t =>
      cleanupLabel(t.trim.replaceAll(",\\s*INCLUDED", "")))
}
