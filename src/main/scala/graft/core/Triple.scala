package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine's core relation: one RDF triple.
  *
  * Mirrors the reference's abstract graph op
  * `Graph.addTriple(subject, predicate, obj, object_is_literal, literal_type)`
  * (reference: dipper/graph/Graph.py:23-33). The reference materializes
  * triples into an in-memory rdflib store with set semantics
  * (dipper/graph/RDFGraph.py:36-40) or streams N-Triples lines
  * (dipper/graph/StreamedGraph.py:92-132); here the graph IS a
  * `Dataset[Triple]` and dedup is an explicit `dropDuplicates` before a sink.
  *
  * @param s   subject — CURIE, IRI, or blank node (`_:` prefix)
  * @param p   predicate — CURIE or IRI
  * @param o   object — CURIE/IRI/bnode, or the lexical form of a literal
  * @param lit true when `o` is a literal
  * @param dt  optional XSD datatype CURIE (e.g. `xsd:integer`); null = plain
  */
final case class Triple(s: String, p: String, o: String, lit: Boolean, dt: String)

object Triple {
  def res(s: String, p: String, o: String): Triple = Triple(s, p, o, lit = false, null)
  def str(s: String, p: String, o: String): Triple = Triple(s, p, o, lit = true, null)
  def typed(s: String, p: String, o: String, dt: String): Triple =
    Triple(s, p, o, lit = true, dt)
  def int(s: String, p: String, o: Long): Triple =
    Triple(s, p, o.toString, lit = true, "xsd:integer")
  def dbl(s: String, p: String, o: Double): Triple =
    Triple(s, p, o.toString, lit = true, "xsd:double")
  def bool(s: String, p: String, o: Boolean): Triple =
    Triple(s, p, o.toString, lit = true, "xsd:boolean")

  /** The reference's CURIE shape (dipper/graph/Graph.py:20-22, RDFa-core
    * CURIE grammar plus an embedded hyphen). Shared by [[auto]] and the
    * column twin `ColumnEmit.isCurieShaped`. */
  val CurieShape = "^[a-zA-Z_]?[a-zA-Z_0-9-]*:[A-Za-z0-9_][A-Za-z0-9_.-]*[A-Za-z0-9_]*$"
  private val curieRe = CurieShape.r

  /** True when `v` would be treated as a resource by the reference's
    * `RDFGraph._is_literal` inference (dipper/graph/RDFGraph.py:67-79):
    * CURIE-shaped, or an http/https/ftp URL. */
  def isResourceShaped(v: String): Boolean =
    curieRe.findFirstIn(v).isDefined ||
      Set("http", "https", "ftp").contains(v.split(":", 2)(0).toLowerCase)

  /** The reference's `addTriple` with no explicit literal flag: infer
    * resource vs literal from the object's shape. */
  def auto(s: String, p: String, o: String): Triple =
    if (isResourceShaped(o)) res(s, p, o) else str(s, p, o)
}

/** Canonical N-Triples formatting.
  *
  * String escaping per the N-Triples grammar; the reference's version is
  * dipper/graph/StreamedGraph.py:168-180. Provided both as plain Scala
  * (driver-side, tests) and as codegen-friendly Column expressions built
  * exclusively from `org.apache.spark.sql.functions` (no UDF in the hot
  * path — this runs once per triple at 100 TB).
  */
object NT {

  def escape(v: String): String = {
    val sb = new StringBuilder(v.length + 8)
    v.foreach {
      case '\\' => sb.append("\\\\")
      case '"'  => sb.append("\\\"")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c    => sb.append(c)
    }
    sb.toString
  }

  /** Column form of [[escape]] — a chain of literal (non-regex) replaces. */
  def escapeCol(c: Column): Column = {
    // Order matters: backslash first.
    val esc = Seq("\\" -> "\\\\", "\"" -> "\\\"", "\n" -> "\\n", "\r" -> "\\r", "\t" -> "\\t")
    esc.foldLeft(c) { case (acc, (from, to)) => replace(acc, lit(from), lit(to)) }
  }

  /** Render one term (already-expanded IRI, bnode, or literal) as NT. */
  def term(o: String, isLit: Boolean, dtIri: String): String =
    if (!isLit) {
      if (o.startsWith("_:")) o else s"<$o>"
    } else if (dtIri == null) "\"" + escape(o) + "\""
    else "\"" + escape(o) + "\"^^<" + dtIri + ">"

  private def subjTerm(s: Column): Column =
    when(s.startsWith("_:"), s).otherwise(concat(lit("<"), s, lit(">")))

  private def objTerm(o: Column, isLit: Column, dtIri: Column): Column =
    when(!isLit,
        when(o.startsWith("_:"), o).otherwise(concat(lit("<"), o, lit(">"))))
      .when(dtIri.isNull, concat(lit("\""), escapeCol(o), lit("\"")))
      .otherwise(concat(lit("\""), escapeCol(o), lit("\"^^<"), dtIri, lit(">")))

  /** Column form: render (s,p,o,lit,dt) — IRIs pre-expanded — to one NT line. */
  def lineCol(s: Column, p: Column, o: Column, isLit: Column, dtIri: Column): Column =
    concat_ws(" ", subjTerm(s), concat(lit("<"), p, lit(">")),
      objTerm(o, isLit, dtIri), lit("."))

  def unescape(v: String): String = {
    val sb = new StringBuilder(v.length)
    var i = 0
    while (i < v.length) {
      val c = v(i)
      if (c == '\\' && i + 1 < v.length) {
        v(i + 1) match {
          case '\\' => sb.append('\\')
          case '"'  => sb.append('"')
          case 'n'  => sb.append('\n')
          case 'r'  => sb.append('\r')
          case 't'  => sb.append('\t')
          case other => sb.append('\\').append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private val Line = """^\s*(<[^>]*>|_:\S+)\s+<([^>]+)>\s+(.+?)\s*\.\s*$""".r
  private val LitObj = """^"(.*)"(?:\^\^<([^>]+)>)?$""".r

  /** Parse one N-Triples line back to a [[Triple]] (IRIs stay expanded;
    * the write side is [[lineCol]]/[[term]]). None for blank/comment
    * lines; malformed lines are a hard error — a silently dropped line
    * would make a golden-file compare pass vacuously. */
  def parseLine(line: String): Option[Triple] = line.trim match {
    case "" => None
    case c if c.startsWith("#") => None
    case Line(st, p, ot) =>
      val s = if (st.startsWith("<")) st.substring(1, st.length - 1) else st
      ot match {
        case o if o.startsWith("<") && o.endsWith(">") =>
          Some(Triple(s, p, o.substring(1, o.length - 1), lit = false, null))
        case o if o.startsWith("_:") =>
          Some(Triple(s, p, o, lit = false, null))
        case LitObj(v, dt) =>
          Some(Triple(s, p, unescape(v), lit = true, dt))
        case other =>
          throw new IllegalArgumentException(s"unparseable NT object: $other")
      }
    case other =>
      throw new IllegalArgumentException(s"unparseable NT line: $other")
  }

  /** N-Quads line: an NT line with a graph label term before the dot
    * (W3C N-Quads grammar; the reference's `nquads` output format —
    * dipper/sources/Source.py:192-198). */
  def quadLineCol(s: Column, p: Column, o: Column, isLit: Column,
                  dtIri: Column, graph: Column): Column =
    concat_ws(" ", subjTerm(s), concat(lit("<"), p, lit(">")),
      objTerm(o, isLit, dtIri), subjTerm(graph), lit("."))
}
