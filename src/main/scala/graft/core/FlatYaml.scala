package graft.core

/** Minimal parser for the flat scalar-map YAML subset the reference uses
  * for ALL of its config tables — the CURIE prefix map
  * (dipper/curie_map.yaml, loaded by dipper/curie_map.py:1-33) and the
  * translation tables (the translationtable directory, loaded by
  * dipper/sources/Source.py:718-796): one `'key': 'value'` mapping per
  * line, single- or double-quoted (or bare) scalars, `#` comments, no
  * nesting. Dependency-free by design — the build has no YAML library,
  * and the subset is regular.
  */
object FlatYaml {

  private val Entry =
    """^\s*(?:"([^"]*)"|'([^']*)'|([A-Za-z0-9_.\-]+))\s*:\s*(?:"([^"]*)"|'([^']*)'|([^#\s][^#]*?))?\s*(?:#.*)?$""".r

  /** Parse `lines` into an insertion-ordered key→value map. Lines that are
    * blank, comments, or document markers (`---`) are skipped; anything
    * else that fails to parse is a hard error (a silently dropped prefix
    * would corrupt every CURIE expansion downstream). */
  def parse(lines: Iterator[String]): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    lines.zipWithIndex.foreach { case (line, i) =>
      val t = line.trim
      if (t.nonEmpty && !t.startsWith("#") && t != "---") {
        t match {
          case Entry(k1, k2, k3, v1, v2, v3) =>
            val k = Seq(k1, k2, k3).find(_ != null).get
            val v = Seq(v1, v2, v3).find(_ != null).map(_.trim).getOrElse("")
            out(k) = v
          case _ =>
            throw new IllegalArgumentException(
              s"unparseable flat-YAML line ${i + 1}: $t")
        }
      }
    }
    out.toMap
  }

  def parseString(s: String): Map[String, String] =
    parse(s.linesIterator)

  /** Load and parse a classpath resource (e.g. "/graft/curie_map.yaml"). */
  def fromResource(name: String): Map[String, String] = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"missing classpath resource $name")
    try parse(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** Load and parse a filesystem path. */
  def fromFile(path: String): Map[String, String] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }
}
