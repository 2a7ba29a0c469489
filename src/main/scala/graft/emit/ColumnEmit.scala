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
    * whose subject or object is null (an absent qualifier) is dropped by a
    * plain predicate AFTER the explode. Deliberately NOT a higher-order
    * `filter(array(...))`: HOF expressions carry no `doGenCode`, so a
    * lambda over the struct array forces the whole pattern — digests,
    * conditionals, concats — out of whole-stage codegen into interpreted
    * eval (measured 26× slower per row on the G2P pattern at sf0.1).
    * explode + struct + when + a row filter all stay codegen'd. */
  def emitFiltered(df: DataFrame, triples: Column*): DataFrame =
    df.select(explode(array(triples: _*)).as("t"))
      .select("t.*")
      .where(col("s").isNotNull && col("o").isNotNull)

  /** OBAN reified association pattern (column twin of [[Association]]
    * with an md5 digest id — same triples as the flatMap form). */
  def assocReified(df: DataFrame, definedBy: String,
                   sub: Column, pred: Column, obj: Column,
                   source: Option[String] = None,
                   score: Option[Column] = None): DataFrame = {
    // digest hoisted below the explode — computed once per row, not once
    // per referencing struct (see g2pAssoc)
    val pre = df.select(sub.as("__s"), pred.as("__pr"), obj.as("__o"),
      concat(lit("_:"),
        Digest.md5Id(concat_ws("+", lit(definedBy), sub, pred, obj))).as("__aid"),
      score.getOrElse(nullDt).as("__sc"))
    val (s, p, o, aid) = (col("__s"), col("__pr"), col("__o"), col("__aid"))
    val base = Seq(
      res(s, p, o),
      res(aid, lit(Vocab.a), lit(Vocab.association)),
      res(aid, lit(Vocab.assocHasSubject), s),
      res(aid, lit(Vocab.assocHasPredicate), p),
      res(aid, lit(Vocab.assocHasObject), o)) ++
      source.map(v => res(aid, lit(Vocab.source), lit(v))) ++
      score.map(_ => typed(aid, lit("EXP:score"), col("__sc").cast("string"), "xsd:double"))
    emit(pre, base: _*)
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
    val hasStage = startStage.isNotNull || endStage.isNotNull
    // str(None) → "None" mirrors the reference's '-'.join((str(a),str(b)))
    val stageLabel = when(hasStage, concat(
      coalesce(startStage, lit("None")), lit("-"),
      coalesce(endStage, lit("None"))))
    // Digests are hoisted into a projection BELOW the explode so each md5
    // is computed once per input row, not once per struct that references
    // it (aid appears in 6 of the 11 structs). CollapseProject keeps the
    // hoist: it refuses to inline non-cheap expressions referenced more
    // than once.
    val pre = df.select(genotype.as("__g"), phenotype.as("__p"),
        startStage.as("__st"), endStage.as("__en"), environment.as("__env"),
        stageLabel.as("__slabel"),
        concat(lit("_:"), Digest.md5Id(concat_ws("+",
          lit(definedBy), genotype, pred, phenotype,
          environment, startStage, endStage))).as("__aid"))
      .withColumn("__sid",
        when(col("__slabel").isNotNull,
          concat(lit("_:"), Digest.md5Id(col("__slabel")))))
    val (g, p, st, en, env) = (col("__g"), col("__p"), col("__st"),
      col("__en"), col("__env"))
    val (aid, sid, slabel) = (col("__aid"), col("__sid"), col("__slabel"))
    emitFiltered(pre,
      res(g, pred, p),
      res(aid, lit(Vocab.a), lit(Vocab.association)),
      res(aid, lit(Vocab.assocHasSubject), g),
      res(aid, lit(Vocab.assocHasPredicate), pred),
      res(aid, lit(Vocab.assocHasObject), p),
      res(sid, lit(Vocab.a), lit(Vocab.developmentalProcess)),
      str(sid, lit(Vocab.label), slabel),
      res(sid, lit(Vocab.startsDuring), st),
      res(sid, lit(Vocab.endsDuring), en),
      res(aid, lit(Vocab.hasQualifier), sid),
      res(aid, lit(Vocab.hasQualifier), env))
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
    // digest (make_d2p_id folds [onset, frequency] only, D2PAssoc.py:90-105).
    // Digest hoisted below the explode — computed once per row (see g2pAssoc).
    val pre = df.select(disease.as("__d"), phenotype.as("__p"),
      onset.as("__on"), frequency.as("__fr"), evidence.as("__ev"),
      concat(lit("_:"), Digest.md5Id(concat_ws("+",
        lit(definedBy), disease, pred, phenotype, onset, frequency))).as("__aid"))
    val (d, p, on, fr, ev, aid) = (col("__d"), col("__p"), col("__on"),
      col("__fr"), col("__ev"), col("__aid"))
    emitFiltered(pre,
      res(d, pred, p),
      res(aid, lit(Vocab.a), lit(Vocab.association)),
      res(aid, lit(Vocab.assocHasSubject), d),
      res(aid, lit(Vocab.assocHasPredicate), pred),
      res(aid, lit(Vocab.assocHasObject), p),
      res(aid, lit(Vocab.hasEvidence), ev),
      auto(aid, lit(Vocab.onset), on),
      auto(aid, lit(Vocab.frequency), fr))
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
