package graft.emit

import graft.core.{Digest, Triple, Vocab}

/** OBAN-reified association (the reference's Assoc family,
  * dipper/models/assoc/Association.py:94-163,260-290).
  *
  * One association expands to the direct `s p o` triple plus a reified
  * node carrying subject/predicate/object plus evidence, source,
  * provenance, score, and date triples. The association id is a
  * deterministic content digest of `definedBy+sub+pred+obj(+attrs)` —
  * partition-safe by construction.
  */
final case class Association(
    definedBy: String,
    sub: String,
    pred: String,
    obj: String,
    evidence: Seq[String] = Nil,
    sources: Seq[String] = Nil,
    provenance: Seq[String] = Nil,
    score: Option[Double] = None,
    date: Option[String] = None,
    attributes: Seq[String] = Nil,
    explicitId: Option[String] = None) {

  def id: String = explicitId.getOrElse(
    "_:" + Digest.assocIdScala(definedBy, (Seq(sub, pred, obj) ++ attributes): _*))

  def triples: Seq[Triple] = {
    val a = id
    Seq(
      Triple.res(sub, pred, obj),
      Triple.res(a, Vocab.a, Vocab.association),
      Triple.res(a, Vocab.assocHasSubject, sub),
      Triple.res(a, Vocab.assocHasPredicate, pred),
      Triple.res(a, Vocab.assocHasObject, obj)) ++
      evidence.map(e => Triple.res(a, Vocab.hasEvidence, e)) ++
      sources.map(s => Triple.res(a, Vocab.source, s)) ++
      provenance.map(p => Triple.res(a, "EXP:has_provenance", p)) ++
      score.toSeq.map(v => Triple.typed(a, "EXP:score", v.toString, "xsd:double")) ++
      date.toSeq.map(d => Triple.typed(a, "dc:date", d, "xsd:date"))
  }
}

object Assoc {

  /** Genotype→phenotype with developmental-stage and environment
    * qualifiers (assoc/G2PAssoc.py:74-150).
    *
    * Faithful to the reference's full fan-out: when either stage bound is
    * set, a stage-process bnode is minted from the digest of
    * "start-end" (absent bound → "None", G2PAssoc.py:95-99), typed as a
    * developmental process, labeled, linked to its bounds via
    * starts/ends-during, and attached to the association with
    * has_qualifier; an environment attaches with has_qualifier directly
    * (py:113-120). The association digest folds the qualifiers in
    * [environment, start, end] order (make_g2p_id, py:140-146).
    *
    * `digest` defaults to the reference's sha1 scheme; pass
    * [[graft.core.Digest.md5IdScala]] where a DuckDB oracle must
    * reproduce the ids. */
  def g2p(definedBy: String, genotype: String, phenotype: String,
          startStage: Option[String] = None, endStage: Option[String] = None,
          environment: Option[String] = None,
          evidence: Seq[String] = Nil, sources: Seq[String] = Nil,
          digest: String => String = Digest.sha1IdScala): Seq[Triple] = {
    val attrs = environment.toSeq ++ startStage.toSeq ++ endStage.toSeq
    val a = "_:" + digest(
      (Seq(definedBy, genotype, Vocab.hasPhenotype, phenotype) ++ attrs).mkString("+"))
    val base = Association(definedBy, genotype, Vocab.hasPhenotype, phenotype,
      evidence = evidence, sources = sources, explicitId = Some(a))
    val stage =
      if (startStage.isDefined || endStage.isDefined) {
        // str(None) → "None" mirrors the reference's '-'.join((str(a),str(b)))
        val label = s"${startStage.getOrElse("None")}-${endStage.getOrElse("None")}"
        val sid = "_:" + digest(label)
        Seq(
          Triple.res(sid, Vocab.a, Vocab.developmentalProcess),
          Triple.str(sid, Vocab.label, label)) ++
          startStage.toSeq.map(st => Triple.res(sid, Vocab.startsDuring, st)) ++
          endStage.toSeq.map(st => Triple.res(sid, Vocab.endsDuring, st)) ++
          Seq(Triple.res(a, Vocab.hasQualifier, sid))
      } else Nil
    base.triples ++ stage ++
      environment.toSeq.map(e => Triple.res(a, Vocab.hasQualifier, e))
  }

  /** Disease→phenotype with onset + frequency (assoc/D2PAssoc.py:57-105;
    * digest folds [onset, frequency] — make_d2p_id, py:90-105). Onset and
    * frequency go through the reference's addTriple literal inference
    * (RDFGraph.py:67-79): a CURIE-valued frequency (e.g. an HP frequency
    * term in HPOA rows) becomes a resource, free text like "12/45" a
    * literal. */
  def d2p(definedBy: String, disease: String, phenotype: String,
          onset: Option[String] = None, frequency: Option[String] = None,
          evidence: Seq[String] = Nil, sources: Seq[String] = Nil,
          digest: String => String = Digest.sha1IdScala): Seq[Triple] = {
    val attrs = onset.toSeq ++ frequency.toSeq
    val a = "_:" + digest(
      (Seq(definedBy, disease, Vocab.hasPhenotype, phenotype) ++ attrs).mkString("+"))
    val base = Association(definedBy, disease, Vocab.hasPhenotype, phenotype,
      evidence = evidence, sources = sources, explicitId = Some(a))
    base.triples ++
      onset.toSeq.map(o => Triple.auto(a, Vocab.onset, o)) ++
      frequency.toSeq.map(f => Triple.auto(a, Vocab.frequency, f))
  }

  /** Gene↔gene homology + family membership
    * (assoc/OrthologyAssoc.py:12-74). */
  def orthology(definedBy: String, geneA: String, geneB: String,
                rel: String = Vocab.inOrthologyRelationshipWith,
                family: Option[String] = None): Seq[Triple] = {
    val base = Association(definedBy, geneA, rel, geneB)
    base.triples ++ family.toSeq.flatMap { fam =>
      Seq(
        Triple.res(fam, Vocab.a, "SO:0000854"),
        Triple.res(fam, Vocab.hasMember, geneA),
        Triple.res(fam, Vocab.hasMember, geneB))
    }
  }

  /** Default `interacts with` (assoc/InteractionAssoc.py:6-15). */
  def interaction(definedBy: String, a: String, b: String): Seq[Triple] =
    Association(definedBy, a, Vocab.interactsWith, b).triples

  /** Chemical→disease, therapeutic vs marker dispatch
    * (assoc/Chem2DiseaseAssoc.py:4-48 + CTD.py:273-311 routing). */
  def chem2disease(definedBy: String, chem: String, disease: String,
                   relLabel: String): Seq[Triple] = {
    val rel = relLabel match {
      case "therapeutic" => Vocab.substanceThatTreats
      case "marker/mechanism" | "marker" => Vocab.isMarkerFor
      case other => other
    }
    Association(definedBy, chem, rel, disease).triples
  }
}
