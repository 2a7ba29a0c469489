package graft.emit

import graft.core.{Digest, Triple, Vocab}

/** Core OWL/SKOS triple patterns — the engine's equivalent of the
  * reference's `Model` operator library (dipper/models/Model.py:28-484).
  *
  * Each op is a pure `args => Seq[Triple]` function; pipelines apply them
  * with `Dataset.flatMap` (the moral equivalent of a generator/UDTF —
  * SURVEY §2.11). Null/empty guards mirror the reference's
  * (Model.py:109,121): absent optional fields emit nothing rather than
  * null-subject triples.
  */
object Model {

  def addTriple(s: String, p: String, o: String, isLiteral: Boolean = false,
                dt: String = null): Seq[Triple] =
    if (s == null || p == null || o == null) Nil
    else Seq(Triple(s, p, o, isLiteral, dt))

  def addType(s: String, t: String): Seq[Triple] = addTriple(s, Vocab.a, t)

  def addLabel(s: String, label: String): Seq[Triple] =
    if (label == null || label.isEmpty) Nil
    else Seq(Triple.str(s, Vocab.label, label))

  /** addClassToGraph: type owl:Class + label + optional subClassOf +
    * description (Model.py addClassToGraph). */
  def classTriples(id: String, label: String,
                   subClassOf: Option[String] = None,
                   description: Option[String] = None): Seq[Triple] =
    addType(id, Vocab.owlClass) ++
      addLabel(id, label) ++
      subClassOf.toSeq.map(p => Triple.res(id, Vocab.subClassOf, p)) ++
      description.toSeq.map(d => Triple.str(id, Vocab.description, d))

  def individualTriples(id: String, label: String,
                        indType: Option[String] = None): Seq[Triple] =
    addType(id, Vocab.namedIndividual) ++
      addLabel(id, label) ++
      indType.toSeq.flatMap(t => addType(id, t))

  def addEquivalentClass(a: String, b: String): Seq[Triple] =
    addTriple(a, Vocab.equivalentClass, b)

  def addSameIndividual(a: String, b: String): Seq[Triple] =
    addTriple(a, Vocab.sameAs, b)

  /** Deprecation with `term replaced by` / `consider` fan-out
    * (Model.py addDeprecatedClass/Individual). */
  def deprecatedTriples(id: String, replacedBy: Seq[String] = Nil,
                        consider: Seq[String] = Nil): Seq[Triple] =
    Seq(Triple.bool(id, Vocab.deprecated, o = true)) ++
      replacedBy.map(r => Triple.res(id, Vocab.termReplacedBy, r)) ++
      consider.map(c => Triple.res(id, Vocab.consider, c))

  def addSubClass(child: String, parent: String): Seq[Triple] =
    addTriple(child, Vocab.subClassOf, parent)

  def addSynonym(id: String, syn: String,
                 synType: String = Vocab.hasExactSynonym): Seq[Triple] =
    if (syn == null || syn.isEmpty) Nil else Seq(Triple.str(id, synType, syn))

  def addDefinition(id: String, definition: String): Seq[Triple] =
    if (definition == null) Nil
    else Seq(Triple.str(id, "IAO:0000115", definition))

  def addXref(id: String, xref: String, asLiteral: Boolean = true): Seq[Triple] =
    addTriple(id, Vocab.hasDbXref, xref, isLiteral = asLiteral)

  def addDepiction(id: String, imageIri: String): Seq[Triple] =
    addTriple(id, Vocab.depiction, imageIri)

  def addComment(id: String, comment: String): Seq[Triple] =
    addTriple(id, Vocab.comment, comment, isLiteral = true)

  def addDescription(id: String, desc: String): Seq[Triple] =
    addTriple(id, Vocab.description, desc, isLiteral = true)

  def addPerson(id: String, name: String): Seq[Triple] =
    addType(id, Vocab.person) ++ addLabel(id, name)

  def addOntologyDeclaration(iri: String): Seq[Triple] =
    addType(iri, Vocab.ontology)

  def addOwlVersionIri(ontology: String, versionIri: String): Seq[Triple] =
    addTriple(ontology, Vocab.versionIri, versionIri)

  def addOwlVersionInfo(ontology: String, info: String): Seq[Triple] =
    addTriple(ontology, Vocab.versionInfo, info, isLiteral = true)

  /** OWL someValuesFrom restriction via a deterministic digest bnode
    * (Model.py addOWLPropertyClassRestriction — bnode restriction). */
  def owlRestriction(subject: String, onProperty: String,
                     someValuesFrom: String): Seq[Triple] = {
    val bnode = "_:" + Digest.sha1IdScala(s"restriction+$subject+$onProperty+$someValuesFrom")
    Seq(
      Triple.res(bnode, Vocab.a, Vocab.restriction),
      Triple.res(bnode, Vocab.onProperty, onProperty),
      Triple.res(bnode, Vocab.someValuesFrom, someValuesFrom),
      Triple.res(subject, Vocab.subClassOf, bnode))
  }

  /** Sex-specificity qualifier on a digest bnode (Model._addSexSpecificity). */
  def addSexSpecificity(subject: String, sex: String): Seq[Triple] =
    addTriple(subject, "EXP:has_sex_specificity", sex)
}
