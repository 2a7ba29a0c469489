package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.NT

/** Graphviz dot export for eyeballing small (test) graphs —
  * the reference's rdf2dot utility (dipper/utils/rdf2dot.py:1-122, used
  * from tests). Debug sink: collect guarded by a row cap.
  */
object DotExport {

  def toDot(triples: DataFrame, maxTriples: Int = 500): String = {
    val rows = triples.select("s", "p", "o", "lit").limit(maxTriples + 1).collect()
    require(rows.length <= maxTriples, s"graph too large for dot export (> $maxTriples)")
    def q(s: String) = "\"" + NT.escape(s) + "\""
    val edges = rows.map { r =>
      val (s, p, o, isLit) =
        (r.getString(0), r.getString(1), r.getString(2), r.getBoolean(3))
      val oNode = if (isLit) q(s"$s|$p|lit") else q(o)
      val extra = if (isLit) s"  ${oNode} [shape=box,label=${q(o)}];\n" else ""
      s"$extra  ${q(s)} -> $oNode [label=${q(p)}];"
    }
    edges.mkString("digraph g {\n  rankdir=LR;\n", "\n", "\n}\n")
  }
}
