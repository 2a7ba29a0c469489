package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Digest, Triple, Vocab}
import graft.emit._

class EmitSpec extends AnyFunSuite {

  test("Model.classTriples golden (addClassToGraph pattern)") {
    val got = Model.classTriples("HP:1", "Phenotype A", Some("HP:0"), Some("a desc"))
    assert(got == Seq(
      Triple.res("HP:1", "rdf:type", "owl:Class"),
      Triple.str("HP:1", "rdfs:label", "Phenotype A"),
      Triple.res("HP:1", "rdfs:subClassOf", "HP:0"),
      Triple.str("HP:1", "dc:description", "a desc")))
  }

  test("null/empty guards: no triples from absent fields (Model.py:109,121)") {
    assert(Model.addLabel("X:1", null).isEmpty)
    assert(Model.addLabel("X:1", "").isEmpty)
    assert(Model.addTriple(null, "p", "o").isEmpty)
    assert(Model.classTriples("X:1", null).size == 1) // just the type triple
  }

  test("deprecation fan-out (term replaced by / consider)") {
    val got = Model.deprecatedTriples("X:old", Seq("X:new"), Seq("X:c1", "X:c2"))
    assert(got.head == Triple.bool("X:old", "owl:deprecated", o = true))
    assert(got.count(_.p == "IAO:0100001") == 1)
    assert(got.count(_.p == "oboInOwl:consider") == 2)
  }

  test("OBAN reified association: direct + 4 reification + payload triples") {
    val a = Association("EX:src", "G:1", "RO:0002200", "P:9",
      evidence = Seq("ECO:1"), sources = Seq("PMID:7"), score = Some(0.9))
    val ts = a.triples
    assert(ts.head == Triple.res("G:1", "RO:0002200", "P:9"))
    assert(ts.count(_.s == a.id) == ts.size - 1)
    assert(ts.exists(t => t.p == "OBAN:association_has_subject" && t.o == "G:1"))
    assert(ts.exists(t => t.p == "OBAN:association_has_object" && t.o == "P:9"))
    assert(ts.exists(t => t.p == "EXP:score" && t.o == "0.9" && t.dt == "xsd:double"))
    // id is the reference digest scheme over definedBy+s+p+o
    assert(a.id == "_:" + Digest.sha1IdScala("EX:src+G:1+RO:0002200+P:9"))
  }

  test("G2P stage/environment qualifiers change the association id (G2PAssoc digest)") {
    val plain = Association("S", "g", Vocab.hasPhenotype, "p").id
    val staged = Assoc.g2p("S", "g", "p", startStage = Some("ST:1"))
    assert(!staged.exists(_.s == plain), "qualified assoc must not reuse unqualified id")
    // stage-process bnode fan-out (G2PAssoc.py:93-112): digest of
    // "start-end" (str(None) for the absent bound), typed + labeled,
    // linked via starts_during, attached with has_qualifier
    val sid = "_:" + Digest.sha1IdScala("ST:1-None")
    assert(staged.contains(Triple.res(sid, Vocab.a, Vocab.developmentalProcess)))
    assert(staged.contains(Triple.str(sid, Vocab.label, "ST:1-None")))
    assert(staged.contains(Triple.res(sid, Vocab.startsDuring, "ST:1")))
    assert(!staged.exists(_.p == Vocab.endsDuring), "no end bound → no ends_during")
    assert(staged.exists(t => t.p == Vocab.hasQualifier && t.o == sid))
  }

  test("G2P digest folds qualifiers in [environment, start, end] order (make_g2p_id)") {
    val ts = Assoc.g2p("S", "g", "p", startStage = Some("ST:1"),
      endStage = Some("ST:2"), environment = Some("ENV:9"))
    val aid = "_:" + Digest.sha1IdScala("S+g+RO:0002200+p+ENV:9+ST:1+ST:2")
    assert(ts.exists(t => t.s == aid && t.p == "rdf:type" && t.o == Vocab.association))
    assert(ts.exists(t => t.s == aid && t.p == Vocab.hasQualifier && t.o == "ENV:9"))
  }

  test("zygosity inference (Genotype.py:280-288)") {
    assert(Genotype.inferZygosity("a1", "a1") == Vocab.homozygous)
    assert(Genotype.inferZygosity("a1", "a2") == Vocab.heterozygous)
    assert(Genotype.inferZygosity("a1", "") == Vocab.hemizygous)
    val ts = Genotype.addPartsToVslc("v", "a1", "a2")
    assert(ts.count(_.p == Vocab.hasVariantPart) == 2)
    assert(ts.exists(t => t.p == Vocab.hasZygosity && t.o == Vocab.heterozygous))
  }

  test("VSLC label synthesis sorts allele labels (make_vslc_label)") {
    assert(Genotype.makeVslcLabel("b<x>", "a<y>") == "<a<y>/b<x>>")
    assert(Genotype.makeVslcLabel("a", null) == "<a>")
    assert(Genotype.makeVslcLabel(null, null) == "")
  }

  test("FALDO feature pattern: 14 triples, digest bnodes, strand typing") {
    val ts = Feature.featureTriples("F:1", "feat", "SO:0000704", "chr:1", 100L, 200L, "-")
    assert(ts.size == 14)
    val region = ts.find(_.p == Vocab.faldoLocation).get.o
    assert(region.startsWith("_:b"))
    assert(ts.count(t => t.p == Vocab.faldoPosition && t.dt == "xsd:integer") == 2)
    assert(ts.exists(t => t.p == "rdf:type" && t.o == Vocab.faldoMinusStrand))
    // determinism
    assert(ts == Feature.featureTriples("F:1", "feat", "SO:0000704", "chr:1", 100L, 200L, "-"))
  }

  test("subsequence emits the reciprocal pair (GenomicFeature.py:347-374)") {
    val ts = Feature.subsequenceOf("child", "parent")
    assert(ts.toSet == Set(
      Triple.res("child", "RO:0002525", "parent"),
      Triple.res("parent", "RO:0002524", "child")))
  }

  test("chrom id/label minting scrubs the chr prefix (GenomicFeature.py:402-434)") {
    assert(Feature.makeChromId("chr12", "B:GRCh38") == "B:GRCh38#chr12")
    assert(Feature.makeChromId("12", "B:GRCh38") == "B:GRCh38#chr12")
    assert(Feature.makeChromLabel("CHRX", "GRCh38") == "chrX (GRCh38)")
  }

  test("family membership is bidirectional") {
    assert(Family.hasMember("fam", "m").map(_.p).toSet ==
      Set(Vocab.hasMember, Vocab.memberOf))
  }

  test("evidence chain + measurement fan-out (Evidence.py patterns)") {
    val chain = Evidence.hasEvidenceLine("_:a1", "_:line1", "ECO:0000006") ++
      Evidence.hasSupportingEvidence("_:line1", "_:item1") ++
      Evidence.supportingPublication("_:item1", "PMID:123")
    assert(chain.map(_.p).toSet == Set("SEPIO:0000002", "rdf:type",
      "SEPIO:0000110", "dc:source"))
    // measurement dict fan-out: one typed literal per measure, sorted
    val data = Evidence.supportingData("_:item1",
      Map("EXP:pvalue" -> 0.03, "EXP:effect" -> 1.5))
    assert(data.map(_.p) == Seq("EXP:effect", "EXP:pvalue"))
    assert(data.forall(t => t.lit && t.dt == "xsd:double"))
  }

  test("provenance assertion/agent/assay triples") {
    val ts = Provenance.assertion("_:as1", "EX:agent1", "computed") ++
      Provenance.agent("EX:agent1", "pipeline v1") ++
      Provenance.assay("EX:assay1", "grip strength", "measures grip")
    assert(ts.exists(t => t.s == "_:as1" && t.p == "SEPIO:0000017" && t.o == "EX:agent1"))
    assert(ts.exists(t => t.s == "EX:agent1" && t.p == "rdfs:label"))
    assert(ts.exists(t => t.s == "EX:assay1" && t.o == "OBI:0000070"))
  }

  test("reference/pathway/environment emitters") {
    val ref = Reference.triples("PMID:9", title = "A paper", pages = "1-5")
    assert(ref.exists(t => t.p == "rdfs:label" && t.o == "A paper"))
    assert(ref.exists(t => t.p == "EXP:pages" && t.o == "1-5"))

    val pw = Pathway.pathwayTriples("KEGG:hsa00010", "Glycolysis") ++
      Pathway.addGeneToPathway("NCBIGene:7", "KEGG:hsa00010")
    val product = pw.find(_.p == "RO:0002204").get.s
    assert(product.startsWith("_:b"))
    assert(pw.exists(t => t.s == product && t.p == Vocab.involvedIn))
    // digest bnode deterministic
    assert(Pathway.addGeneToPathway("NCBIGene:7", "KEGG:hsa00010") ==
      Pathway.addGeneToPathway("NCBIGene:7", "KEGG:hsa00010"))

    val env = Environment.environment("ENVO:1", "lab") ++
      Environment.condition("XCO:1", "high fat diet") ++
      Environment.hasPart("ENVO:1", "XCO:1")
    assert(env.exists(t => t.p == Vocab.hasPart && t.o == "XCO:1"))
  }

  test("HCLS dataset metadata: summary/version/distribution levels") {
    val ts = DatasetMeta.describe("EX:ds", "My DS", "2026-08", "http://x/d.nt", "2026-08-12")
    assert(ts.exists(t => t.s == "EX:ds/2026-08" && t.p == "dcterms:isVersionOf"))
    assert(ts.exists(t => t.s == "EX:ds/2026-08.nt" && t.p == "dcat:downloadURL"))
    assert(DatasetMeta.voidStatTriples("d", 1, 2, 3, 4).map(_.p) ==
      Seq("void:triples", "void:distinctSubjects", "void:distinctObjects", "void:properties"))
  }
}
