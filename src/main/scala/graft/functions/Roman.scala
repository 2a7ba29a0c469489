package graft.functions

/** Roman-numeral ↔ int conversion for identifier normalization
  * (the reference normalizes roman-numeral chromosome/locus names via
  * dipper/utils/romanplus.py; used from GenomicFeature identifier
  * cleanup). Pure functions; registered as a UDF for the (cold)
  * normalization path — identifier scrubbing runs once per dimension row,
  * not per fact row, so UDF overhead is acceptable there.
  */
object Roman {

  private val values = Seq(
    1000 -> "M", 900 -> "CM", 500 -> "D", 400 -> "CD", 100 -> "C",
    90 -> "XC", 50 -> "L", 40 -> "XL", 10 -> "X", 9 -> "IX",
    5 -> "V", 4 -> "IV", 1 -> "I")

  def toRoman(n: Int): String = {
    require(n > 0 && n < 5000, s"out of roman range: $n")
    val sb = new StringBuilder
    var rest = n
    values.foreach { case (v, sym) =>
      while (rest >= v) { sb.append(sym); rest -= v }
    }
    sb.toString
  }

  private val charVal = Map('I' -> 1, 'V' -> 5, 'X' -> 10, 'L' -> 50,
    'C' -> 100, 'D' -> 500, 'M' -> 1000)

  /** Greedy descending-map prefix walk (romanplus.py fromRoman:68-83
    * semantics): consume numerals in M..I order from the front, ignore
    * any unconsumed tail — 'IIIB' → 3. The canonical strict parser below
    * is the identifier-normalization path; this is the label-cleanup
    * path. */
  def prefixValue(s: String): Int = {
    var idx = 0
    var total = 0
    values.foreach { case (v, sym) =>
      while (s.startsWith(sym, idx)) { total += v; idx += sym.length }
    }
    total
  }

  /** Parse a roman numeral; None for malformed/non-canonical input. */
  def fromRoman(s: String): Option[Int] = {
    if (s == null || s.isEmpty) return None
    val up = s.toUpperCase
    if (!up.forall(charVal.contains)) return None
    var total = 0
    var i = 0
    while (i < up.length) {
      val v = charVal(up(i))
      if (i + 1 < up.length && charVal(up(i + 1)) > v) { total -= v }
      else total += v
      i += 1
    }
    // canonical check: re-render must round-trip
    if (total > 0 && total < 5000 && toRoman(total) == up) Some(total) else None
  }
}
