package graft.emit

import graft.core.{Triple, Vocab}

/** Evidence / Provenance / Reference / Family / Environment / Pathway
  * pattern families (dipper/models/{Evidence,Provenance,Reference,Family,
  * Environment,Pathway}.py) — the long tail of the §2.4 emitter library.
  */
object Evidence {

  def hasEvidenceLine(assoc: String, line: String,
                      evidenceType: String): Seq[Triple] =
    Seq(
      Triple.res(assoc, Vocab.hasEvidenceLine, line),
      Triple.res(line, Vocab.a, evidenceType))

  def hasSupportingEvidence(line: String, evidenceItem: String): Seq[Triple] =
    Seq(Triple.res(line, Vocab.hasSupportingEvidence, evidenceItem))

  def supportingPublication(item: String, publication: String): Seq[Triple] =
    Seq(
      Triple.res(item, Vocab.source, publication),
      Triple.res(publication, Vocab.a, Vocab.publication))

  /** Measurement-dict fan-out (Evidence.add_supporting_data:88-103):
    * one typed literal triple per (measure, value). */
  def supportingData(item: String, measurements: Map[String, Double]): Seq[Triple] =
    measurements.toSeq.sortBy(_._1).map { case (measure, value) =>
      Triple.typed(item, measure, value.toString, "xsd:double")
    }
}

object Provenance {

  def assertion(id: String, agent: String, description: String): Seq[Triple] =
    Seq(Triple.res(id, Vocab.a, "SEPIO:0000001")) ++
      Model.addDescription(id, description) ++
      Seq(Triple.res(id, "SEPIO:0000017", agent))

  def agent(id: String, label: String,
            agentType: String = "SEPIO:0000090"): Seq[Triple] =
    Model.addType(id, agentType) ++ Model.addLabel(id, label)

  def assay(id: String, label: String, description: String): Seq[Triple] =
    Model.addType(id, "OBI:0000070") ++ Model.addLabel(id, label) ++
      Model.addDescription(id, description)

  def studyMeasure(study: String, measure: String): Seq[Triple] =
    Seq(Triple.res(study, Vocab.hasPart, measure))
}

object Reference {

  /** Publication typing/label/pages (dipper/models/Reference.py:23-122). */
  def triples(id: String, refType: String = Vocab.publication,
              title: String = null, pages: String = null): Seq[Triple] =
    Model.addType(id, refType) ++
      Model.addLabel(id, title) ++
      (if (pages == null) Nil else Seq(Triple.str(id, "EXP:pages", pages)))
}

object Family {
  def hasMember(family: String, member: String): Seq[Triple] =
    Seq(
      Triple.res(family, Vocab.hasMember, member),
      Triple.res(member, Vocab.memberOf, family))
}

object Environment {
  def environment(id: String, label: String): Seq[Triple] =
    Model.addType(id, "ENVO:01000254") ++ Model.addLabel(id, label)

  def condition(id: String, label: String,
                conditionType: String = "XCO:0000000"): Seq[Triple] =
    Model.addType(id, conditionType) ++ Model.addLabel(id, label)

  def hasPart(env: String, part: String): Seq[Triple] =
    Seq(Triple.res(env, Vocab.hasPart, part))
}

object Pathway {
  /** Pathway class + gene-product bnode + involvement
    * (dipper/models/Pathway.py:30-85). */
  def pathwayTriples(id: String, label: String): Seq[Triple] =
    Model.classTriples(id, label, subClassOf = Some("GO:0008150")) ++
      Model.addType(id, "PW:0000001")

  def addGeneToPathway(gene: String, pathway: String,
                       digest: String => String =
                         graft.core.Digest.sha1IdScala): Seq[Triple] = {
    val product = "_:" + digest(s"product+$gene")
    Seq(
      Triple.res(product, "RO:0002204", gene),
      Triple.res(product, Vocab.a, "CHEBI:33695"),
      Triple.res(product, Vocab.involvedIn, pathway))
  }
}
