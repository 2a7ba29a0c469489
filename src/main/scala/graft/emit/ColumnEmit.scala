package graft.emit

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Digest, Vocab}

/** Column-native triple emission — the codegen fast path for fixed
  * patterns (SURVEY §2.11: "implementable as explode(transform(...)) for
  * simple patterns").
  *
  * The `Row => Seq[Triple]` emitters in this package are the general
  * library; for hot pipelines that emit billions of triples, building the
  * pattern as an `array(struct(...))` of Columns and exploding keeps the
  * whole emission inside whole-stage codegen — no Dataset encoder
  * round-trip, no per-row Scala allocation. Measured ~2-3x on the
  * reified-association pipeline at 10M triples.
  */
object ColumnEmit {

  private val nullDt = lit(null).cast("string")

  def res(s: Column, p: Column, o: Column): Column =
    struct(s.as("s"), p.as("p"), o.as("o"), lit(false).as("lit"), nullDt.as("dt"))

  def str(s: Column, p: Column, o: Column): Column =
    struct(s.as("s"), p.as("p"), o.as("o"), lit(true).as("lit"), nullDt.as("dt"))

  def typed(s: Column, p: Column, o: Column, dt: String): Column =
    struct(s.as("s"), p.as("p"), o.as("o"), lit(true).as("lit"),
      lit(dt).cast("string").as("dt"))

  /** Column twin of [[graft.core.Triple.isResourceShaped]] — the
    * reference's literal/CURIE inference (RDFGraph.py:67-79). */
  def isCurieShaped(o: Column): Column =
    o.rlike(graft.core.Triple.CurieShape) ||
      lower(split(o, ":", 2).getItem(0)).isin("http", "https", "ftp")

  /** Column twin of [[graft.core.Triple.auto]]: emit as resource when the
    * object is CURIE/URL-shaped, literal otherwise. */
  def auto(s: Column, p: Column, o: Column): Column =
    struct(s.as("s"), p.as("p"), o.as("o"), (!isCurieShaped(o)).as("lit"),
      nullDt.as("dt"))

  /** Explode a fixed pattern of triple structs into (s,p,o,lit,dt) rows. */
  def emit(df: DataFrame, triples: Column*): DataFrame =
    df.select(explode(array(triples: _*)).as("t")).select("t.*")

  /** Like [[emit]] for patterns with row-conditional triples: a struct
    * whose subject or object is null (an absent qualifier) is dropped
    * inside the codegen'd `filter(array(...))` — no extra stage, no UDF. */
  def emitFiltered(df: DataFrame, triples: Column*): DataFrame =
    df.select(explode(filter(array(triples: _*),
        t => t.getField("s").isNotNull && t.getField("o").isNotNull)).as("t"))
      .select("t.*")

  /** OBAN reified association pattern (column twin of [[Association]]
    * with an md5 digest id — same triples as the flatMap form). */
  def assocReified(df: DataFrame, definedBy: String,
                   sub: Column, pred: Column, obj: Column,
                   source: Option[String] = None,
                   score: Option[Column] = None): DataFrame = {
    val aid = concat(lit("_:"),
      Digest.md5Id(concat_ws("+", lit(definedBy), sub, pred, obj)))
    val base = Seq(
      res(sub, pred, obj),
      res(aid, lit(Vocab.a), lit(Vocab.association)),
      res(aid, lit(Vocab.assocHasSubject), sub),
      res(aid, lit(Vocab.assocHasPredicate), pred),
      res(aid, lit(Vocab.assocHasObject), obj)) ++
      source.map(s => res(aid, lit(Vocab.source), lit(s))) ++
      score.map(v => typed(aid, lit("EXP:score"), v.cast("string"), "xsd:double"))
    emit(df, base: _*)
  }

  /** Column twin of [[Assoc.g2p]] (reference G2PAssoc.py:74-150): OBAN
    * base + stage-process bnode ("start-end" digest, developmental-process
    * type, label, starts/ends-during) + has_qualifier links, with the
    * [environment, start, end] digest attribute order of make_g2p_id.
    * Optional qualifier columns are per-ROW optional (null → triple
    * dropped by [[emitFiltered]]) — this is what makes the pattern usable
    * on a real ingest where only some rows carry stage/environment. */
  def g2pAssoc(df: DataFrame, definedBy: String,
               genotype: Column, phenotype: Column,
               startStage: Column, endStage: Column,
               environment: Column): DataFrame = {
    val pred = lit(Vocab.hasPhenotype)
    val aid = concat(lit("_:"), Digest.md5Id(concat_ws("+",
      lit(definedBy), genotype, pred, phenotype,
      environment, startStage, endStage)))
    val hasStage = startStage.isNotNull || endStage.isNotNull
    // str(None) → "None" mirrors the reference's '-'.join((str(a),str(b)))
    val stageLabel = when(hasStage, concat(
      coalesce(startStage, lit("None")), lit("-"),
      coalesce(endStage, lit("None"))))
    val sid = when(hasStage, concat(lit("_:"), Digest.md5Id(stageLabel)))
    emitFiltered(df,
      res(genotype, pred, phenotype),
      res(aid, lit(Vocab.a), lit(Vocab.association)),
      res(aid, lit(Vocab.assocHasSubject), genotype),
      res(aid, lit(Vocab.assocHasPredicate), pred),
      res(aid, lit(Vocab.assocHasObject), phenotype),
      res(sid, lit(Vocab.a), lit(Vocab.developmentalProcess)),
      str(sid, lit(Vocab.label), stageLabel),
      res(sid, lit(Vocab.startsDuring), startStage),
      res(sid, lit(Vocab.endsDuring), endStage),
      res(aid, lit(Vocab.hasQualifier), sid),
      res(aid, lit(Vocab.hasQualifier), environment))
  }

  /** Column twin of [[Assoc.d2p]] (reference D2PAssoc.py:57-105): OBAN
    * base + onset/frequency through the reference's addTriple literal
    * inference (a CURIE-valued frequency — e.g. an HP frequency term —
    * becomes a resource, free text like "12/45" a literal), digest over
    * [onset, frequency]. */
  def d2pAssoc(df: DataFrame, definedBy: String,
               disease: Column, phenotype: Column,
               onset: Column, frequency: Column,
               evidence: Column = nullDt): DataFrame = {
    val pred = lit(Vocab.hasPhenotype)
    // evidence decorates the association but is NOT folded into the
    // digest (make_d2p_id folds [onset, frequency] only, D2PAssoc.py:90-105)
    val aid = concat(lit("_:"), Digest.md5Id(concat_ws("+",
      lit(definedBy), disease, pred, phenotype, onset, frequency)))
    emitFiltered(df,
      res(disease, pred, phenotype),
      res(aid, lit(Vocab.a), lit(Vocab.association)),
      res(aid, lit(Vocab.assocHasSubject), disease),
      res(aid, lit(Vocab.assocHasPredicate), pred),
      res(aid, lit(Vocab.assocHasObject), phenotype),
      res(aid, lit(Vocab.hasEvidence), evidence),
      auto(aid, lit(Vocab.onset), onset),
      auto(aid, lit(Vocab.frequency), frequency))
  }

  /** Class-pattern column twin of Model.classTriples. */
  def classPattern(df: DataFrame, id: Column, label: Column,
                   subClassOf: Option[Column] = None): DataFrame = {
    val base = Seq(
      res(id, lit(Vocab.a), lit(Vocab.owlClass)),
      str(id, lit(Vocab.label), label)) ++
      subClassOf.map(p => res(id, lit(Vocab.subClassOf), p))
    emit(df, base: _*)
  }
}
