package graft.sinks

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.CurieMap

/** The reference's stand-alone ClinVar executor builds raw NT lines with
  * functional emitters, bypassing the graph model entirely
  * (ClinVar.py:88-232 `make_spo`/`write_spo`; SURVEY §3.4). It proves
  * the engine's minimal contract — anything producing canonical NT
  * lines is a valid executor. This is the column-level twin: ONE
  * codegen'd string expression per line, so a 100 TB emission never
  * materializes a triple relation, never shuffles, and streams straight
  * from the scan to the text sink.
  *
  * `make_spo` semantics reproduced here:
  *  - predicate `'a'` is sugar for `rdf:type` (ClinVar.py:99-100);
  *  - an object matching the CURIE shape expands to an IRI, except
  *    bnodes (`_:`…) which stay unexpanded (ClinVar.py:129-139);
  *  - an all-digit object becomes an `xsd:integer` literal, a decimal
  *    one an `xsd:double` (ClinVar.py:140-144);
  *  - anything else is a string literal with the reference's exact
  *    escaping: backslash doubled, inner double-quotes flattened to
  *    apostrophes, LF/CR/TAB escaped (ClinVar.py:145-151).
  */
object NtDirect {

  /** ClinVar.py:85 CURIERE. */
  private val CurieRe = "^.*:[A-Za-z0-9_][A-Za-z0-9_.]*[A-Za-z0-9_]*$"

  /** One canonical NT line from CURIE/literal columns. */
  def spo(cm: CurieMap)(sub: Column, prd: Column, obj: Column): Column = {
    val p = when(prd === "a", lit("rdf:type")).otherwise(prd)
    concat(iri(cm, sub), lit(" "), iri(cm, p), lit(" "), objTerm(cm, obj),
      lit(" ."))
  }

  /** Subject/predicate position: always an IRI — except bnodes, which
    * the reference leaves unexpanded (ClinVar.py:152-158). */
  def iri(cm: CurieMap, c: Column): Column =
    when(c.startsWith("_:"), c)
      .otherwise(concat(lit("<"), expand(cm, c), lit(">")))

  /** Object position with make_spo's literal inference. */
  def objTerm(cm: CurieMap, o: Column): Column =
    when(o.startsWith("_:"), o)
      .when(o.rlike(CurieRe), concat(lit("<"), expand(cm, o), lit(">")))
      .when(o.rlike("^[0-9]+$"), concat(lit("\""), o,
        lit("\"^^<http://www.w3.org/2001/XMLSchema#integer>")))
      .when(o.rlike("^[0-9]*\\.[0-9]+$"), concat(lit("\""), o,
        lit("\"^^<http://www.w3.org/2001/XMLSchema#double>")))
      .otherwise(concat(lit("\""), escaped(o), lit("\"")))

  /** Literal escaping, ClinVar.py:145-151: strip enclosing quotes,
    * double backslashes, flatten inner quotes to apostrophes, escape
    * control characters. */
  private def escaped(o: Column): Column = {
    val stripped = regexp_replace(regexp_replace(o, "^\"+", ""), "\"+$", "")
    val bs = regexp_replace(stripped, "\\\\", "\\\\\\\\")
    val qt = regexp_replace(bs, "\"", "'")
    regexp_replace(regexp_replace(regexp_replace(qt,
      "\n", "\\\\n"), "\r", "\\\\r"), "\t", "\\\\t")
  }

  /** Plain CURIE→IRI expansion (CURIEMAP lookup, ClinVar.py:129-135);
    * the production prefix map is broadcast as a literal map. */
  private def expand(cm: CurieMap, c: Column): Column = cm.expandCol(c)
}
