package graft.core

/** Closed output vocabulary used by the triple-pattern emitters.
  *
  * The reference closes its vocabulary over translationtable/
  * GLOBAL_TERMS.yaml (819 label→CURIE lines, loaded at
  * dipper/graph/RDFGraph.py:29-34). This engine keeps the same *mechanism*
  * (a label→CURIE map consulted by emitters, see [[TranslationTable]]) with
  * a freshly-authored core term set sufficient for the §2.4 pattern
  * library.
  */
object Vocab {
  // RDF/RDFS/OWL core
  val a = "rdf:type"
  val label = "rdfs:label"
  val subClassOf = "rdfs:subClassOf"
  val subPropertyOf = "rdfs:subPropertyOf"
  val comment = "rdfs:comment"
  val description = "dc:description"
  val owlClass = "owl:Class"
  val namedIndividual = "owl:NamedIndividual"
  val sameAs = "owl:sameAs"
  val equivalentClass = "owl:equivalentClass"
  val deprecated = "owl:deprecated"
  val onProperty = "owl:onProperty"
  val someValuesFrom = "owl:someValuesFrom"
  val restriction = "owl:Restriction"
  val ontology = "owl:Ontology"
  val versionIri = "owl:versionIRI"
  val versionInfo = "owl:versionInfo"
  val termReplacedBy = "IAO:0100001"
  val consider = "oboInOwl:consider"
  val hasExactSynonym = "oboInOwl:hasExactSynonym"
  val hasRelatedSynonym = "oboInOwl:hasRelatedSynonym"
  val hasDbXref = "oboInOwl:hasDbXref"
  val inSubset = "oboInOwl:inSubset"
  val depiction = "foaf:depiction"
  val page = "foaf:page"
  val person = "foaf:Person"

  // OBAN association reification
  val association = "OBAN:association"
  val assocHasSubject = "OBAN:association_has_subject"
  val assocHasPredicate = "OBAN:association_has_predicate"
  val assocHasObject = "OBAN:association_has_object"

  // Relations (RO / SEPIO-ish, public OBO ids)
  val inTaxon = "RO:0002162"
  val hasPhenotype = "RO:0002200"
  val contributesToCondition = "RO:0003304"
  val snp = "SO:0000694"
  val isModelOf = "RO:0003301"
  val interactsWith = "RO:0002434"
  val inOrthologyRelationshipWith = "RO:HOM0000017"
  val inParalogyRelationshipWith = "RO:HOM0000011"
  val hasMember = "RO:0002351"
  val memberOf = "RO:0002350"
  val involvedIn = "RO:0002331"
  val hasParticipant = "RO:0000057"
  val isSubsequenceOf = "RO:0002525"
  val hasSubsequence = "RO:0002524"
  val substanceThatTreats = "RO:0002606"
  val isMarkerFor = "RO:0002607"
  val causesCondition = "RO:0003303"

  // GENO genotype partonomy
  val genotype = "GENO:0000536"
  val gvc = "GENO:0000009" // genomic variation complement
  val allele = "GENO:0000512"
  val gene = "SO:0000704"
  val variantLocus = "GENO:0000002"
  val vslc = "GENO:0000030"
  val genomicBackground = "GENO:0000611"
  val hasVariantPart = "GENO:0000382"
  val hasAlleleAt = "GENO:0000413"  // is_allele_of inverse family
  val isAlleleOf = "GENO:0000408"
  val hasAffectedLocus = "GENO:0000418"
  val hasZygosity = "GENO:0000608"
  val homozygous = "GENO:0000136"
  val heterozygous = "GENO:0000135"
  val hemizygous = "GENO:0000134"
  val indeterminate = "GENO:0000137"
  val compoundHeterozygous = "GENO:0000402"
  val simpleHeterozygous = "GENO:0000458"
  val hasReferencePart = "GENO:0000385"
  val genome = "SO:0001026"
  val chromosome = "SO:0000340"
  val sequenceAlteration = "SO:0001059"
  val hasPart = "BFO:0000051"
  val partOf = "BFO:0000050"
  val derivesFrom = "RO:0001000"
  val sequenceDerivesFrom = "RO:0002510"

  // FALDO
  val faldoLocation = "faldo:location"
  val faldoBegin = "faldo:begin"
  val faldoEnd = "faldo:end"
  val faldoPosition = "faldo:position"
  val faldoReference = "faldo:reference"
  val faldoRegion = "faldo:Region"
  val faldoExactPosition = "faldo:ExactPosition"
  val faldoBothStrand = "faldo:BothStrandsPosition"
  val faldoPlusStrand = "faldo:ForwardStrandPosition"
  val faldoMinusStrand = "faldo:ReverseStrandPosition"

  // Association qualifiers (G2P stage/environment, D2P onset/frequency —
  // the reference's two most-used association decorations)
  val hasQualifier = "GENO:0000580"
  val developmentalProcess = "GO:0032502"
  val startsDuring = "RO:0002091"
  val endsDuring = "RO:0002093"
  val onset = "EXP:onset"
  val frequency = "EXP:frequency"
  val hasDisposition = "RO:0000091"
  val hasSexSpecificity = "EXP:has_sex_specificity"
  val journalArticle = "IAO:0000013"
  val webPage = "SIO:000302"
  val sexMale = "PATO:0000384"
  val sexFemale = "PATO:0000383"

  // Evidence / provenance
  val hasEvidence = "RO:0002558"
  val hasEvidenceLine = "SEPIO:0000002"
  val hasSupportingEvidence = "SEPIO:0000110"
  val isEvidenceSupportedBy = "SEPIO:0000111"
  val hasSupportingEvidenceLine = "SEPIO:0000007"
  val hasEvidenceItem = "SEPIO:0000084"
  val hasSupportingActivity = "SEPIO:0000085"
  val hasAgent = "SEPIO:0000017"
  val createdBy = "SEPIO:0000018"
  val isAssertedIn = "SEPIO:0000015"
  val source = "dc:source"
  val isAbout = "IAO:0000136"
  val publication = "IAO:0000311"
  val retrievedOn = "pav:retrievedOn"
  val createdWith = "pav:createdWith"
  val version = "pav:version"

  // VoID / dataset metadata
  val voidDataset = "void:Dataset"
  val voidTriples = "void:triples"
  val voidDistinctSubjects = "void:distinctSubjects"
  val voidDistinctObjects = "void:distinctObjects"
  val voidProperties = "void:properties"
  val dcatDistribution = "dcat:Distribution"

  /** Global label→CURIE table (the GLOBAL_TERMS mechanism, fresh content). */
  val globalTerms: Map[String, String] = Map(
    "label" -> label, "type" -> a, "subclass_of" -> subClassOf,
    "class" -> owlClass, "named_individual" -> namedIndividual,
    "same_as" -> sameAs, "equivalent_class" -> equivalentClass,
    "in_taxon" -> inTaxon, "has_phenotype" -> hasPhenotype,
    "is_model_of" -> isModelOf, "interacts_with" -> interactsWith,
    "in_orthology_relationship_with" -> inOrthologyRelationshipWith,
    "has_part" -> hasPart, "part_of" -> partOf,
    "homozygous" -> homozygous, "heterozygous" -> heterozygous,
    "genotype" -> genotype, "allele" -> allele, "gene" -> gene,
    "has_evidence" -> hasEvidence, "association" -> association
  )
}
