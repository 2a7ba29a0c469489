package graft

import java.nio.file.{Files, Paths}

import graft.core.{CurieMap, Digest, Triple}
import graft.emit.{Assoc, Association}
import graft.engine.Runner
import graft.testing.GraphEquality

/** Inline golden-triple tests in the reference's primary style
  * (tests/test_ctd.py:18-64: one hand-written input row, assert the
  * exact expected triple set with two-sided set difference). */
class GoldenSpec extends SparkSpec {
  import spark.implicits._

  test("chem2disease therapeutic row expands to the exact golden graph (test_ctd style)") {
    val triples = Assoc.chem2disease("EX:ctd", "MESH:D009538", "OMIM:309400",
      "therapeutic")
    val aid = "_:" + Digest.assocIdScala("EX:ctd+MESH:D009538+RO:0002606+OMIM:309400")
    GraphEquality.assertEqual(triples.toDF(), Seq(
      Triple.res("MESH:D009538", "RO:0002606", "OMIM:309400"),
      Triple.res(aid, "rdf:type", "OBAN:association"),
      Triple.res(aid, "OBAN:association_has_subject", "MESH:D009538"),
      Triple.res(aid, "OBAN:association_has_predicate", "RO:0002606"),
      Triple.res(aid, "OBAN:association_has_object", "OMIM:309400")))
  }

  test("set-difference reporting shows both directions (TestUtils.py:44-57)") {
    val actual = Seq(Triple.res("a", "p", "x")).toDF()
    val expected = Seq(Triple.res("a", "p", "y")).toDF()
    val d = GraphEquality.diff(actual, expected)
    assert(!d.isEqual)
    assert(d.onlyLeft.map(_.o) == Seq("x") && d.onlyRight.map(_.o) == Seq("y"))
    assert(d.report.contains("only in actual (1)"))
  }

  test("D2P association with onset+frequency matches golden (HPOA shape)") {
    val ts = Assoc.d2p("EX:hpoa", "OMIM:119600", "HP:0000175",
      onset = Some("HP:0003577"), frequency = Some("12/45"),
      evidence = Seq("ECO:0000304"))
    val aid = "_:" + Digest.assocIdScala(
      "EX:hpoa+OMIM:119600+RO:0002200+HP:0000175+HP:0003577+12/45")
    GraphEquality.assertEqual(ts.toDF(), Seq(
      Triple.res("OMIM:119600", "RO:0002200", "HP:0000175"),
      Triple.res(aid, "rdf:type", "OBAN:association"),
      Triple.res(aid, "OBAN:association_has_subject", "OMIM:119600"),
      Triple.res(aid, "OBAN:association_has_predicate", "RO:0002200"),
      Triple.res(aid, "OBAN:association_has_object", "HP:0000175"),
      Triple.res(aid, "RO:0002558", "ECO:0000304"),
      Triple.res(aid, "EXP:onset", "HP:0003577"),
      Triple.str(aid, "EXP:frequency", "12/45")))
  }

  test("conditional fetch: fresh cache skipped, stale refetched, integrity checked") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fetch")
    val origin = dir.resolve("remote.tsv")
    java.nio.file.Files.writeString(origin, "id\tv\n1\t2\n")
    val cache = dir.resolve("raw").toString

    val first = graft.sources.Fetch.fetch(s"file://$origin", cache)
    assert(first.refetched)
    graft.sources.Fetch.verifySize(first, java.nio.file.Files.size(origin))
    val md5a = graft.sources.Fetch.fileMd5(first.path)

    // unchanged origin → cache hit
    assert(!graft.sources.Fetch.fetch(s"file://$origin", cache).refetched)

    // modified origin → stale → refetch, new digest
    Thread.sleep(10)
    java.nio.file.Files.writeString(origin, "id\tv\n1\t2\n3\t4\n")
    val third = graft.sources.Fetch.fetch(s"file://$origin", cache)
    assert(third.refetched)
    assert(graft.sources.Fetch.fileMd5(third.path) != md5a)

    // mirror preferred when present (DipperCache semantics)
    val mirror = dir.resolve("mirror.tsv")
    java.nio.file.Files.writeString(mirror, "mirrored\n")
    val viaMirror = graft.sources.Fetch.fetch(s"file://$origin", cache,
      mirrorUrl = Some(s"file://$mirror"))
    assert(viaMirror.path.getFileName.toString == "mirror.tsv")
  }

  test("SQL over produced triples: phenotypes of OMIM:119600 with evidence + onset") {
    // SURVEY §7 first-milestone query, answered SPARQL-style with plain
    // self-joins over the triple relation the ingest produced: find the
    // OBAN association nodes whose subject is the disease, then walk
    // object/evidence/onset off the association node.
    val dir = Files.createTempDirectory("graft-hpoa-sql").toString
    Files.writeString(Paths.get(s"$dir/annotations.tsv"),
      "DatabaseID\tDiseaseName\tQualifier\tHPO_ID\tReference\tEvidence\t" +
        "Onset\tFrequency\tSex\tModifier\tAspect\tBiocuration\n" +
      "OMIM:119600\tdz\t\tHP:0000175\tPMID:1\tIEA\tHP:0003577\t12/45\t\t\tP\tc\n" +
      "OMIM:119600\tdz\t\tHP:0001249\tPMID:2\tTAS\t\t\t\t\tP\tc\n" +
      "OMIM:999999\tdz\t\tHP:0000001\tPMID:3\tIEA\t\t\t\t\tP\tc\n")
    val src = graft.engine.DiseasePhenotypeSource
    val triples = src.transform(spark, src.read(spark, dir))
    triples.createOrReplaceTempView("t")
    val got = spark.sql(
      """SELECT obj.o AS phenotype, ev.o AS evidence, onset.o AS onset
         FROM t sub
         JOIN t obj ON obj.s = sub.s AND obj.p = 'OBAN:association_has_object'
         JOIN t ev  ON ev.s  = sub.s AND ev.p  = 'RO:0002558'
         LEFT JOIN t onset ON onset.s = sub.s AND onset.p = 'EXP:onset'
         WHERE sub.p = 'OBAN:association_has_subject'
           AND sub.o = 'OMIM:119600'""")
      .as[(String, String, Option[String])].collect().toSet
    assert(got == Set(
      ("HP:0000175", "ECO:0000501", Some("HP:0003577")),
      ("HP:0001249", "ECO:0000304", None)))
  }

  test("chem_disease ingest: raw CTD TSV through Runner matches golden NT") {
    // tests/test_ctd.py:41-63 driven end-to-end on the engine's CTD-shape
    // source: inferred row dropped, '|'-split DirectEvidence routed to
    // substance_that_treats / is_marker_for, chemical class labeled,
    // disease class bare, PMID references typed + attached as dc:source.
    val dir = Files.createTempDirectory("graft-ctd").toString
    Files.writeString(Paths.get(s"$dir/chemicals_diseases.tsv"),
      "ChemicalName\tChemicalID\tCasRN\tDiseaseName\tDiseaseID\tDirectEvidence\tInferenceGeneSymbol\tInferenceScore\tOmimIDs\tPubMedIDs\n" +
      "Warfarin\tD014635\t81-81-2\tHemorrhage\tMESH:D006470\ttherapeutic\t\t\t\t16786605|17042727\n" +
      "Cadmium\tD002104\t7440-43-9\tKidney Disease\tMESH:D007674\tmarker/mechanism\t\t\t\t1234567\n" +
      "Aspirin\tD001241\t50-78-2\tStroke\tMESH:D020521\t\tF2\t4.21\t\t7654321\n")
    val out = Files.createTempDirectory("graft-ctd-out").toString
    val res = Runner.run(spark,
      Runner.RunConfig(Seq("chem_disease"), out), dir)
    assert(res.head.triples > 0)
    val nt = spark.read.text(s"$out/chem_disease.nt").as[String].collect().toSet
    val cm = Runner.curieMap
    def t(c: String) = "<" + cm.expand(c) + ">"
    def line(s0: String, p0: String, o0: String) = s"${t(s0)} ${t(p0)} ${t(o0)} ."
    def lineLit(s0: String, p0: String, o0: String) = s"${t(s0)} ${t(p0)} \"$o0\" ."
    val a1 = "_:" + Digest.md5IdScala(
      "EX:ctd+MESH:D014635+RO:0002606+MESH:D006470")
    val a2 = "_:" + Digest.md5IdScala(
      "EX:ctd+MESH:D002104+RO:0002607+MESH:D007674")
    val expected = Set(
      line("MESH:D014635", "RO:0002606", "MESH:D006470"),
      line(a1, "rdf:type", "OBAN:association"),
      line(a1, "OBAN:association_has_subject", "MESH:D014635"),
      line(a1, "OBAN:association_has_predicate", "RO:0002606"),
      line(a1, "OBAN:association_has_object", "MESH:D006470"),
      line(a1, "dc:source", "PMID:16786605"),
      line(a1, "dc:source", "PMID:17042727"),
      line("PMID:16786605", "rdf:type", "IAO:0000013"),
      line("PMID:17042727", "rdf:type", "IAO:0000013"),
      line("MESH:D014635", "rdf:type", "owl:Class"),
      lineLit("MESH:D014635", "rdfs:label", "Warfarin"),
      line("MESH:D006470", "rdf:type", "owl:Class"),
      line("MESH:D002104", "RO:0002607", "MESH:D007674"),
      line(a2, "rdf:type", "OBAN:association"),
      line(a2, "dc:source", "PMID:1234567"))
    val missing = expected -- nt
    assert(missing.isEmpty, s"missing golden lines: $missing")
    // the inferred (empty DirectEvidence) row contributes nothing
    assert(!nt.exists(_.contains("D001241")))
    assert(!nt.exists(_.contains("D020521")))
    assert(!nt.exists(_.contains("7654321")))
  }

  test("string_interactions ingest: threshold + 2-endpoint join + canonical pairs") {
    // StringDB.py driven end-to-end: score ≤ 700 dropped, unmapped
    // endpoint dropped (inner-join semantics), the symmetric duplicate
    // row collapses onto one canonical (least, greatest) gene pair.
    val dir = Files.createTempDirectory("graft-string").toString
    Files.writeString(Paths.get(s"$dir/protein_links.tsv"),
      "protein1\tprotein2\tcombined_score\n" +
      "9606.ENSP1\t9606.ENSP2\t900\n" +
      "9606.ENSP2\t9606.ENSP1\t800\n" +   // symmetric dup of the first pair
      "9606.ENSP1\t9606.ENSP3\t950\n" +   // ENSP3 unmapped -> dropped
      "9606.ENSP2\t9606.ENSP4\t500\n")    // below threshold -> dropped
    Files.writeString(Paths.get(s"$dir/protein_gene_map.tsv"),
      "protein_id\tgene_id\n" +
      "9606.ENSP1\tNCBIGene:1017\n" +
      "9606.ENSP2\tNCBIGene:1029\n" +
      "9606.ENSP4\tNCBIGene:5566\n")
    val out = Files.createTempDirectory("graft-string-out").toString
    val res = Runner.run(spark,
      Runner.RunConfig(Seq("string_interactions"), out), dir)
    assert(res.head.triples > 0)
    val nt = spark.read.text(s"$out/string_interactions.nt").as[String].collect().toSet
    val cm = Runner.curieMap
    def t(c: String) = "<" + cm.expand(c) + ">"
    def line(s0: String, p0: String, o0: String) = s"${t(s0)} ${t(p0)} ${t(o0)} ."
    val aid = "_:" + Digest.md5IdScala(
      "EX:string+NCBIGene:1017+RO:0002434+NCBIGene:1029")
    val expected = Set(
      line("NCBIGene:1017", "RO:0002434", "NCBIGene:1029"),
      line(aid, "rdf:type", "OBAN:association"),
      line(aid, "OBAN:association_has_subject", "NCBIGene:1017"),
      line(aid, "OBAN:association_has_predicate", "RO:0002434"),
      line(aid, "OBAN:association_has_object", "NCBIGene:1029"),
      line("NCBIGene:1017", "rdf:type", "owl:Class"),
      line("NCBIGene:1029", "rdf:type", "owl:Class"))
    val missing = expected -- nt
    assert(missing.isEmpty, s"missing golden lines: $missing")
    // sub-threshold and unmapped endpoints contribute nothing
    // match the full tokens, not bare digits: the dataset-metadata graph
    // carries dcat:downloadURL file://<random temp dir>, whose random
    // digits can contain "5566" by chance (observed flake ~1.6e-3/run)
    assert(!nt.exists(_.contains("NCBIGene:5566")) &&
      !nt.exists(_.contains("9606.ENSP3")))
    // the symmetric row produced no reversed-direction association
    val revAid = "_:" + Digest.md5IdScala(
      "EX:string+NCBIGene:1029+RO:0002434+NCBIGene:1017")
    assert(!nt.exists(_.contains(revAid)))
  }

  test("disease_phenotype ingest: raw TSV through Runner matches golden NT") {
    // The reference's primary ingest test shape (tests/test_ctd.py:41-63)
    // driven END-TO-END over the full 12-column phenotype.hpoa format
    // (HPOAnnotations.py:60-78): declared-schema scan of a landed raw
    // file, NOT-qualifier filter, two-layer evidence translation from
    // the SHIPPED production tables, aspect routing, sex-specificity,
    // publication fan-out, D2P emit, set-dedup, NT through the
    // full-size prefix map.
    val hdr = "DatabaseID\tDiseaseName\tQualifier\tHPO_ID\tReference\t" +
      "Evidence\tOnset\tFrequency\tSex\tModifier\tAspect\tBiocuration\n"
    val dir = Files.createTempDirectory("graft-hpoa").toString
    Files.writeString(Paths.get(s"$dir/annotations.tsv"),
      hdr +
      "OMIM:119600\tdz A\t\tHP:0000175\tPMID:1363781;OMIM:119600\tIEA\t" +
        "HP:0003577\t12/45\tMALE\t\tP\tHPO:probe[2020-01-01]\n" +
      "OMIM:119600\tdz A\tNOT\tHP:0001249\tPMID:1363781\tIEA\t\t\t\t\tP\t" +
        "HPO:probe[2020-01-01]\n" +
      "OMIM:100100\tdz B\t\tHP:0001382\tPMID:2\tTAS\t\t5/13\t\t\tP\t" +
        "HPO:probe[2020-01-02]\n" +
      "OMIM:100100\tdz B\t\tHP:0000006\tOMIM:100100\tTAS\t\t\t\t\tI\t" +
        "HPO:probe[2020-01-03]\n" +
      "OMIM:200150\tdz C\t\tHP:0000510\tnot a reference\tTAS\t\t\tfemale\t\tP\t" +
        "HPO:probe[2020-01-04]\n")
    val out = Files.createTempDirectory("graft-hpoa-out").toString
    val res = Runner.run(spark,
      Runner.RunConfig(Seq("disease_phenotype"), out), dir)
    assert(res.head.triples > 0)
    val nt = spark.read.text(s"$out/disease_phenotype.nt").as[String].collect().toSet

    val cm = Runner.curieMap
    def t(c: String) = "<" + cm.expand(c) + ">"
    def line(s0: String, p0: String, o0: String) = s"${t(s0)} ${t(p0)} ${t(o0)} ."
    def lineLit(s0: String, p0: String, o0: String) = s"${t(s0)} ${t(p0)} \"$o0\" ."
    val a1 = "_:" + Digest.md5IdScala(
      "EX:hpoa+OMIM:119600+RO:0002200+HP:0000175+HP:0003577+12/45")
    val a2 = "_:" + Digest.md5IdScala(
      "EX:hpoa+OMIM:100100+RO:0002200+HP:0001382+5/13")
    val a3 = "_:" + Digest.md5IdScala(          // I aspect -> has disposition,
      "EX:hpoa+OMIM:100100+RO:0000091+HP:0000006") // no onset/freq in digest
    val a4 = "_:" + Digest.md5IdScala(
      "EX:hpoa+OMIM:200150+RO:0002200+HP:0000510")
    val expected = Set(
      line("OMIM:119600", "RO:0002200", "HP:0000175"),
      line(a1, "rdf:type", "OBAN:association"),
      line(a1, "OBAN:association_has_subject", "OMIM:119600"),
      line(a1, "OBAN:association_has_predicate", "RO:0002200"),
      line(a1, "OBAN:association_has_object", "HP:0000175"),
      line(a1, "RO:0002558", "ECO:0000501"),        // IEA via local+global tt
      line(a1, "EXP:onset", "HP:0003577"),          // CURIE -> resource
      lineLit(a1, "EXP:frequency", "12/45"),        // free text -> literal
      line(a1, "MONARCH:has_sex_specificity", "PATO:0000384"), // MALE lowercased
      line(a1, "dc:source", "PMID:1363781"),
      line("PMID:1363781", "rdf:type", "IAO:0000013"),
      line("OMIM:119600", "rdf:type", "owl:Class"),
      line("OMIM:100100", "RO:0002200", "HP:0001382"),
      line(a2, "rdf:type", "OBAN:association"),
      line(a2, "OBAN:association_has_subject", "OMIM:100100"),
      line(a2, "OBAN:association_has_predicate", "RO:0002200"),
      line(a2, "OBAN:association_has_object", "HP:0001382"),
      line(a2, "RO:0002558", "ECO:0000304"),        // TAS
      lineLit(a2, "EXP:frequency", "5/13"),
      // inheritance aspect: has-disposition rel, qualifier-free digest
      line("OMIM:100100", "RO:0000091", "HP:0000006"),
      line(a3, "OBAN:association_has_predicate", "RO:0000091"))
    val missing = expected -- nt
    assert(missing.isEmpty, s"missing golden lines: $missing")
    // the OMIM reference is rewritten to its entry URL and typed web page
    assert(nt.contains(s"${t(a1)} ${t("dc:source")} " +
      "<http://omim.org/entry/119600> ."))
    assert(nt.contains("<http://omim.org/entry/119600> " +
      s"${t("rdf:type")} ${t("SIO:000302")} ."))
    // pin one full line against the production prefix map expansions
    assert(nt.contains("<http://identifiers.org/mim/119600> " +
      "<http://purl.obolibrary.org/obo/RO_0002200> " +
      "<http://purl.obolibrary.org/obo/HP_0000175> ."))
    // the NOT-qualified annotation must not surface anywhere
    assert(!nt.exists(_.contains("HP_0001249")))
    // no onset triple for the onset-less row
    assert(!nt.exists(l => l.contains(cm.expand(a2)) && l.contains("onset")))
    // malformed-reference row: no association core, but the sex triple
    // still decorates the (dangling) association id — the reference's
    // in-loop add_association_to_graph quirk
    assert(!nt.contains(line("OMIM:200150", "RO:0002200", "HP:0000510")))
    assert(nt.contains(
      line(a4, "MONARCH:has_sex_specificity", "PATO:0000383")))
  }

  test("zfin_genotypes ingest: multi-locus genotype assembly through Runner") {
    // one genotype with TWO loci (compound het at fgf8a + homozygous at
    // shha → GVC rollup), single-locus homozygous (VSLC doubles as GVC,
    // missing background → placeholder), unlocated hemizygous (alleles
    // attach to the VSLC directly), wild-type pairing (simple het), and
    // an unknown-zygosity row (indeterminate)
    val dir = Files.createTempDirectory("graft-zfin").toString
    Files.writeString(Paths.get(s"$dir/genotype_features.tsv"),
      "GenotypeID\tGenotypeName\tAlleleID\tAlleleName\tGeneID\tGeneSymbol\tZygosity\n" +
      "ZDB-GENO-1\tfgf8a-comp\tZDB-ALT-1\tti282a\tZDB-GENE-1\tfgf8a\theterozygous\n" +
      "ZDB-GENO-1\tfgf8a-comp\tZDB-ALT-2\ttbx392\tZDB-GENE-1\tfgf8a\theterozygous\n" +
      "ZDB-GENO-1\tfgf8a-comp\tZDB-ALT-5\tzf99\tZDB-GENE-2\tshha\thomozygous\n" +
      "ZDB-GENO-2\tshha-hom\tZDB-ALT-3\tla014\tZDB-GENE-2\tshha\thomozygous\n" +
      "ZDB-GENO-3\tpax2a-hemi\tZDB-ALT-4\tzf145\t\t\themizygous\n" +
      "ZDB-GENO-4\twt-het\tZDB-ALT-6\ttm12\tZDB-GENE-3\tpax2a\theterozygous\n" +
      "ZDB-GENO-5\tunk\tZDB-ALT-7\ttm13\tZDB-GENE-3\tpax2a\tunknown\n")
    Files.writeString(Paths.get(s"$dir/genotype_backgrounds.tsv"),
      "GenotypeID\tBackgroundID\tBackgroundName\n" +
      "ZDB-GENO-1\tZDB-GENO-BG1\tAB\n")
    val out = Files.createTempDirectory("graft-zfin-out").toString
    val res = Runner.run(spark,
      Runner.RunConfig(Seq("zfin_genotypes"), out), dir)
    assert(res.head.triples > 0)
    val nt = spark.read.text(s"$out/zfin_genotypes.nt").as[String].collect().toSet

    val cm = Runner.curieMap
    def t(c: String) = "<" + cm.expand(c) + ">"
    def line(s0: String, p0: String, o0: String) = s"${t(s0)} ${t(p0)} ${t(o0)} ."
    def lineLit(s0: String, p0: String, o0: String) = s"${t(s0)} ${t(p0)} \"$o0\" ."
    // digest inputs are the reference's ZFIN:-stripped '-'-joins
    // (gene-allele1-allele2 for VSLCs, gene-allele for variant loci,
    // ZFIN.py:1066-1068, 2900-2903)
    val v11 = "_:" + Digest.md5IdScala("ZDB-GENE-1-ZDB-ALT-1-ZDB-ALT-2")
    val v12 = "_:" + Digest.md5IdScala("ZDB-GENE-2-ZDB-ALT-5-ZDB-ALT-5")
    val v2 = "_:" + Digest.md5IdScala("ZDB-GENE-2-ZDB-ALT-3-ZDB-ALT-3")
    val v3 = "_:" + Digest.md5IdScala("UN-ZDB-ALT-4-0")
    val v4 = "_:" + Digest.md5IdScala("ZDB-GENE-3-ZDB-ALT-6-WT")
    val v5 = "_:" + Digest.md5IdScala("ZDB-GENE-3-ZDB-ALT-7-UN")
    val vl1 = "_:" + Digest.md5IdScala("ZDB-GENE-1-ZDB-ALT-1")
    val gvc1 = "_:" + Digest.md5IdScala(Seq(v11, v12).sorted.mkString("-")
      .replace(":", "").replaceFirst("^_+", ""))
    val gvc1Label =
      "fgf8a<ti282a>/fgf8a<tbx392>; shha<zf99>/shha<zf99>"
    val expected = Set(
      // compound het locus: variant-locus bnodes between allele and VSLC
      line(vl1, "rdf:type", "GENO:0000002"),
      lineLit(vl1, "rdfs:label", "fgf8a<ti282a>"),
      line(vl1, "GENO:0000408", "ZFIN:ZDB-GENE-1"),
      line(vl1, "GENO:0000382", "ZFIN:ZDB-ALT-1"),
      line(v11, "GENO:0000382", vl1),
      line(v11, "GENO:0000608", "GENO:0000402"),
      lineLit(v11, "rdfs:label", "fgf8a<ti282a>/fgf8a<tbx392>"),
      line("ZFIN:ZDB-GENE-1", "rdf:type", "SO:0000704"),
      lineLit("ZFIN:ZDB-GENE-1", "rdfs:label", "fgf8a"),
      // two loci roll up into a GVC with composite id + joined label
      line(gvc1, "rdf:type", "GENO:0000009"),
      lineLit(gvc1, "rdfs:label", gvc1Label),
      line(gvc1, "GENO:0000382", v11),
      line(gvc1, "GENO:0000382", v12),
      line("ZFIN:ZDB-GENO-1", "GENO:0000382", gvc1),
      lineLit("ZFIN:ZDB-GENO-1", "rdfs:label", "fgf8a-comp (AB)"),
      lineLit("ZFIN:ZDB-GENO-1", "oboInOwl:hasExactSynonym", "fgf8a-comp"),
      lineLit("ZFIN:ZDB-GENO-1", "oboInOwl:hasExactSynonym",
        s"$gvc1Label [AB]"),
      line("ZFIN:ZDB-GENO-1", "GENO:0000385", "ZFIN:ZDB-GENO-BG1"),
      line("ZFIN:ZDB-GENO-BG1", "RO:0002162", "NCBITaxon:7955"),
      // homozygous single locus: VSLC doubles as the GVC; missing
      // background becomes the reference's placeholder bnode
      line(v2, "GENO:0000608", "GENO:0000136"),
      lineLit(v2, "rdfs:label", "shha<la014>/shha<la014>"),
      line(v2, "rdf:type", "GENO:0000030"),
      line(v2, "rdf:type", "GENO:0000009"),
      line("ZFIN:ZDB-GENO-2", "GENO:0000382", v2),
      lineLit("ZFIN:ZDB-GENO-2", "rdfs:label",
        "shha-hom (unspecified background)"),
      lineLit("_:" + Digest.md5IdScala("bkgd-ZDB-GENO-2"), "rdfs:label",
        "unspecified background (ZDB-GENO-2)"),
      line("ZFIN:ZDB-GENO-2", "GENO:0000385",
        "_:" + Digest.md5IdScala("bkgd-ZDB-GENO-2")),
      // unlocated hemizygous: allele attached directly, '0' second slot
      line(v3, "GENO:0000608", "GENO:0000134"),
      lineLit(v3, "rdfs:label", "<zf145>/<0>"),
      line(v3, "GENO:0000382", "ZFIN:ZDB-ALT-4"),
      // wild-type pairing and indeterminate zygosity
      line(v4, "GENO:0000608", "GENO:0000458"),
      lineLit(v4, "rdfs:label", "pax2a<tm12>/pax2a<+>"),
      line(v5, "GENO:0000608", "GENO:0000137"),
      lineLit(v5, "rdfs:label", "pax2a<tm13>/pax2a<?>"))
    val missing = expected -- nt
    assert(missing.isEmpty, s"missing golden lines: $missing")
    // the unlocated locus must NOT mint a variant-locus bnode layer:
    // its VSLC links the allele directly
    assert(!nt.contains(line("_:" + Digest.md5IdScala("UN-ZDB-ALT-4"),
      "rdf:type", "GENO:0000002")))
  }

  test("file-driven golden corpus: {input,expected} dirs via GraphEquality") {
    // the reference's per-source golden layout
    // (tests/resources/gwascatalog/{input,expected},
    // tests/test_gwascatalog.py:20-82): raw input files + an expected
    // serialization on disk, compared as triple SETS. Regenerate after
    // an intentional change with `runMain graft.testing.GoldenGen` and
    // review the git diff.
    import org.apache.spark.sql.functions._
    import graft.core.NT
    val root = new java.io.File("src/test/resources/golden")
    val dirs = root.listFiles().filter(_.isDirectory).sortBy(_.getName)
    assert(dirs.length >= 3, "golden corpus missing")
    dirs.foreach { dir =>
      val source = Runner.registry(dir.getName)
      val cm = Runner.curieMap
      val actual = source
        .transform(spark, source.read(spark, s"${dir.getPath}/input"))
        .select(
          cm.expandCol(col("s")).as("s"), cm.expandCol(col("p")).as("p"),
          when(col("lit"), col("o")).otherwise(cm.expandCol(col("o"))).as("o"),
          col("lit"),
          when(col("dt").isNull, lit(null).cast("string"))
            .otherwise(cm.expandCol(col("dt"))).as("dt"))
      val src = scala.io.Source.fromFile(
        s"${dir.getPath}/expected/expected.nt", "UTF-8")
      val expected = try src.getLines().flatMap(NT.parseLine).toVector
                     finally src.close()
      assert(expected.nonEmpty, s"${dir.getName}: empty expected file")
      val diff = GraphEquality.diff(actual, expected.toDF())
      assert(diff.isEqual, s"${dir.getName}: ${diff.report}")
    }
  }

  test("NT lines round-trip through the parser (parseLine ∘ term = id)") {
    import graft.core.NT
    val cases = Seq(
      Triple.res("http://x/s", "http://x/p", "http://x/o"),
      Triple.res("_:b1", "http://x/p", "_:b2"),
      Triple.str("http://x/s", "http://x/p", "line\nbreak \"quoted\" \\slash\ttab"),
      Triple.typed("http://x/s", "http://x/p", "42",
        "http://www.w3.org/2001/XMLSchema#integer"))
    cases.foreach { t =>
      val line = NT.term(t.s, isLit = false, null) + s" <${t.p}> " +
        NT.term(t.o, t.lit, t.dt) + " ."
      assert(NT.parseLine(line).contains(t), s"round-trip failed: $line")
    }
    assert(NT.parseLine("").isEmpty && NT.parseLine("# comment").isEmpty)
    intercept[IllegalArgumentException](NT.parseLine("not a triple"))
  }

  test("omia_phenes ingest: XML dump through Runner with taxon constraint") {
    // wave-4 mechanism: MySQL-style XML dump → StAX scan → species-
    // specific phene subclasses; the --taxon constraint prunes at scan
    val dir = Files.createTempDirectory("graft-omia").toString
    Files.writeString(Paths.get(s"$dir/omia_dump.xml"),
      """<mysqldump><database><table_data name="Phene">
        |<row><field name="phene_id">10</field><field name="omia_id">001445</field>
        |  <field name="phene_name">Hip dysplasia</field>
        |  <field name="gb_species_id">9913</field>
        |  <field name="summary">Canine-type hip laxity in cattle.</field></row>
        |<row><field name="phene_id">11</field><field name="omia_id">000419</field>
        |  <field name="phene_name">Gait anomaly</field>
        |  <field name="gb_species_id">9796</field>
        |  <field name="summary"></field></row>
        |<row><field name="phene_id">12</field><field name="omia_id">000420</field>
        |  <field name="phene_name">No species row</field>
        |  <field name="gb_species_id"></field>
        |  <field name="summary">dropped</field></row>
        |</table_data></database></mysqldump>""".stripMargin)
    val out = Files.createTempDirectory("graft-omia-out").toString
    val res = Runner.run(spark,
      Runner.RunConfig(Seq("omia_phenes"), out, taxa = Seq("9913")), dir)
    assert(res.head.triples > 0)
    val nt = spark.read.text(s"$out/omia_phenes.nt").as[String].collect().toSet

    val cm = Runner.curieMap
    def t(c: String) = "<" + cm.expand(c) + ">"
    def line(s0: String, p0: String, o0: String) = s"${t(s0)} ${t(p0)} ${t(o0)} ."
    def lineLit(s0: String, p0: String, o0: String) = s"${t(s0)} ${t(p0)} \"$o0\" ."
    val sp = "OMIA:001445-9913"
    val expected = Set(
      line(sp, "rdf:type", "owl:Class"),
      lineLit(sp, "rdfs:label", "Hip dysplasia"),
      line(sp, "rdfs:subClassOf", "OMIA:001445"),
      lineLit(sp, "dc:description", "Canine-type hip laxity in cattle."),
      line(sp, "RO:0002162", "NCBITaxon:9913"))
    val missing = expected -- nt
    assert(missing.isEmpty, s"missing golden lines: $missing")
    // taxon 9796 pruned by the constraint; species-less row dropped
    assert(!nt.exists(_.contains("000419")) && !nt.exists(_.contains("000420")))

    // unconstrained run keeps the other species and drops only the
    // species-less row (the reference's early return)
    val out2 = Files.createTempDirectory("graft-omia-out2").toString
    Runner.run(spark, Runner.RunConfig(Seq("omia_phenes"), out2), dir)
    val nt2 = spark.read.text(s"$out2/omia_phenes.nt").as[String].collect().toSet
    assert(nt2.contains(line("OMIA:000419-9796", "rdf:type", "owl:Class")))
    assert(!nt2.exists(_.contains("000420")))
  }

  test("zfin_fish ingest: extrinsic assembly, G2P env associations, markers") {
    val dir = "src/test/resources/golden/zfin_fish/input"
    val out = Files.createTempDirectory("graft-zfish-out").toString
    val res = Runner.run(spark, Runner.RunConfig(Seq("zfin_fish"), out), dir)
    assert(res.head.triples > 0)
    val nt = spark.read.text(s"$out/zfin_fish.nt").as[String].collect().toSet

    val cm = Runner.curieMap
    def t(c: String) = "<" + cm.expand(c) + ">"
    def line(s0: String, p0: String, o0: String) = s"${t(s0)} ${t(p0)} ${t(o0)} ."
    def lineLit(s0: String, p0: String, o0: String) = s"${t(s0)} ${t(p0)} \"$o0\" ."

    // FISH-1: affectors {ALT-1, MRPHLNO-1, MRPHLNO-2} − intrinsic {ALT-1}
    // → extrinsic reagents MO1 (targets GENE-1 via the reagent file) and
    // MO2 (targets GENE-2 via a gene_marker_rel knockdown row)
    val tg1 = "_:" + Digest.md5IdScala("ZDB-GENE-1-ZDB-MRPHLNO-1")
    val tg2 = "_:" + Digest.md5IdScala("ZDB-GENE-2-ZDB-MRPHLNO-2")
    val sorted = Seq(tg1, tg2).sorted
    val ex1 = "_:" + Digest.md5IdScala(
      sorted.map(_.stripPrefix("_:")).mkString("-"))
    val labelOf = Map(tg1 -> "fgf8a<MO1-fgf8a>", tg2 -> "shha<MO2-shha>")
    assert(nt.contains(line(tg1, "rdf:type", "GENO:0000504")))
    assert(nt.contains(line(tg1, "GENO:0000639", "ZFIN:ZDB-GENE-1")))
    assert(nt.contains(line(tg1, "GENO:0000634", "ZFIN:ZDB-MRPHLNO-1")))
    assert(nt.contains(lineLit(tg1, "rdfs:label", "fgf8a<MO1-fgf8a>")))
    assert(nt.contains(line(ex1, "rdf:type", "GENO:0000524")))
    assert(nt.contains(
      lineLit(ex1, "rdfs:label", sorted.map(labelOf).mkString("; "))))
    assert(nt.contains(line(ex1, "GENO:0000382", tg1)))
    assert(nt.contains(line(ex1, "GENO:0000382", tg2)))
    assert(nt.contains(line("ZFIN:ZDB-FISH-1", "GENO:0000382", ex1)))
    // intrinsic attach: GENO-1 is not wildtype → variant part, intrinsic
    // genotype type; the fish is an effective genotype in taxon 7955
    assert(nt.contains(line("ZFIN:ZDB-FISH-1", "GENO:0000382", "ZFIN:ZDB-GENO-1")))
    assert(nt.contains(line("ZFIN:ZDB-GENO-1", "rdf:type", "GENO:0000719")))
    assert(nt.contains(line("ZFIN:ZDB-FISH-1", "rdf:type", "GENO:0000525")))
    assert(nt.contains(line("ZFIN:ZDB-FISH-1", "RO:0002162", "NCBITaxon:7955")))
    assert(nt.contains(
      lineLit("ZFIN:ZDB-FISH-1", "oboInOwl:hasExactSynonym", "fgf8a+MO")))

    // FISH-2: wildtype intrinsic → has_reference_part + genomic background;
    // single-reagent extrinsic digest chains off tg1 alone
    val ex2 = "_:" + Digest.md5IdScala(tg1.stripPrefix("_:"))
    assert(nt.contains(line("ZFIN:ZDB-FISH-2", "GENO:0000385", "ZFIN:ZDB-GENO-2")))
    assert(nt.contains(line("ZFIN:ZDB-GENO-2", "rdf:type", "GENO:0000611")))
    assert(nt.contains(line("ZFIN:ZDB-FISH-2", "GENO:0000382", ex2)))

    // FISH-3: its only extrinsic affector is an ALT → skipped in the
    // reagent walk → no extrinsic genotype part on the fish
    assert(!nt.exists(l => l.startsWith(t("ZFIN:ZDB-FISH-3")) &&
      l.contains("GENO_0000382") && l.contains("_:b")))

    // wildtypes tier: abbreviation label + description + fish has_genotype
    assert(nt.contains(lineLit("ZFIN:ZDB-GENO-2", "rdfs:label", "INDO")))
    assert(nt.contains(
      lineLit("ZFIN:ZDB-GENO-2", "dc:description", "INDO wildtype")))
    assert(nt.contains(
      line("ZFIN:ZDB-FISH-WT-1", "GENO:0000222", "ZFIN:ZDB-GENO-2")))

    // allele→construct provenance + transgenic parts: the coding part
    // attaches as variant part, the promoter part as plain has_part
    assert(nt.contains(line("ZFIN:ZDB-ALT-1", "RO:0002510",
      "ZFIN:ZDB-TGCONSTRCT-1")))
    val coding = "_:" + Digest.md5IdScala(
      "ZDB-TGCONSTRCT-1-ZDB-GENE-3-coding-sequence-of")
    val promoter = "_:" + Digest.md5IdScala(
      "ZDB-TGCONSTRCT-1-ZDB-GENE-4-promoter-of")
    assert(nt.contains(line("ZFIN:ZDB-ALT-1", "GENO:0000382", coding)))
    assert(nt.contains(line("ZFIN:ZDB-ALT-1", "BFO:0000051", promoter)))
    assert(nt.contains(line(coding, "rdf:type", "GENO:0000638")))
    assert(nt.contains(line(promoter, "rdf:type", "GENO:0000637")))
    assert(nt.contains(line(coding, "RO:0002510", "ZFIN:ZDB-GENE-3")))

    // gene_marker_rel: miRNA targets-gene row kept, unconsumed
    // relationship dropped entirely
    assert(nt.contains(line("ZFIN:ZDB-MIR-1", "EXP:targets_gene",
      "ZFIN:ZDB-GENE-5")))
    assert(!nt.exists(_.contains("ZDB-MRK-1")))

    // reagents tier: pub mentions + note comment
    assert(nt.contains(line("ZFIN:ZDB-PUB-1", "IAO:0000142",
      "ZFIN:ZDB-MRPHLNO-1")))
    assert(nt.contains(line("ZFIN:ZDB-PUB-2", "IAO:0000142",
      "ZFIN:ZDB-MRPHLNO-1")))
    assert(nt.contains(lineLit("ZFIN:ZDB-MRPHLNO-1", "rdfs:comment",
      "works well")))

    // environments: composed label over sorted ZECO component names
    assert(nt.contains(lineLit("ZFIN:ZDB-EXP-1", "rdfs:label",
      "Environment that includes: chemical treatment; temperature exposure")))
    assert(nt.contains(line("ZFIN:ZDB-EXP-1", "rdf:type", "ENVO:01000254")))
    assert(nt.contains(line("ZFIN:ZDB-EXP-1", "BFO:0000051", "ZECO:0000111")))
    assert(nt.contains(lineLit("ZECO:0000111", "rdfs:label",
      "chemical treatment")))

    // G2P row 1: mapped octuple, known environment → qualified assoc
    val a1 = "_:" + Digest.md5IdScala(Seq("EX:zfin", "ZFIN:ZDB-FISH-1",
      "RO:0002200", "ZP:0000001", "ZFIN:ZDB-EXP-1", "ZFIN:ZDB-STAGE-1",
      "ZFIN:ZDB-STAGE-2").mkString("+"))
    assert(nt.contains(line("ZFIN:ZDB-FISH-1", "RO:0002200", "ZP:0000001")))
    assert(nt.contains(line(a1, "GENO:0000580", "ZFIN:ZDB-EXP-1")))
    assert(nt.contains(line(a1, "RO:0002558", "ECO:0000059")))
    assert(nt.contains(line(a1, "dc:source", "ZFIN:ZDB-PUB-1")))
    assert(nt.contains(lineLit(a1, "rdfs:comment",
      "Legacy environment id ZFIN:ZDB-EXP-1")))
    // stage bnode bridges both bounds
    val stg = "_:" + Digest.md5IdScala("ZFIN:ZDB-STAGE-1-ZFIN:ZDB-STAGE-2")
    assert(nt.contains(line(a1, "GENO:0000580", stg)))
    assert(nt.contains(line(stg, "RO:0002091", "ZFIN:ZDB-STAGE-1")))
    assert(nt.contains(line(stg, "RO:0002093", "ZFIN:ZDB-STAGE-2")))

    // G2P row 2 (normal tag): demoted to pub-mentions-fish, no assoc
    assert(nt.contains(line("ZFIN:ZDB-PUB-2", "IAO:0000142",
      "ZFIN:ZDB-FISH-2")))
    assert(!nt.contains(line("ZFIN:ZDB-FISH-2", "RO:0002200", "ZP:0000001")))

    // G2P row 3: unknown environment → assoc WITHOUT env qualifier but
    // WITH the legacy-id comment
    val a3 = "_:" + Digest.md5IdScala(Seq("EX:zfin", "ZFIN:ZDB-FISH-2",
      "RO:0002200", "ZP:0000002").mkString("+"))
    assert(nt.contains(line("ZFIN:ZDB-FISH-2", "RO:0002200", "ZP:0000002")))
    assert(!nt.exists(l => l.startsWith(t(a3)) && l.contains("ZDB-EXP-9") &&
      l.contains("GENO_0000580")))
    assert(nt.contains(lineLit(a3, "rdfs:comment",
      "Legacy environment id ZFIN:ZDB-EXP-9")))

    // G2P row 4: unmapped octuple → nothing emitted for that fish
    assert(!nt.exists(l => l.startsWith(t("ZFIN:ZDB-FISH-3")) &&
      l.contains("RO_0002200")))

    // wave 2 — gene dictionary: NCBI equivalence + taxon
    assert(nt.contains(line("ZFIN:ZDB-GENE-1", "owl:equivalentClass",
      "NCBIGene:30538")))
    assert(nt.contains(line("ZFIN:ZDB-GENE-1", "RO:0002162",
      "NCBITaxon:7955")))
    // stages: class + ZFS equivalence
    assert(nt.contains(lineLit("ZFIN:ZDB-STAGE-1", "rdfs:label",
      "Pharyngula:Prim-5")))
    assert(nt.contains(line("ZFIN:ZDB-STAGE-1", "owl:equivalentClass",
      "ZFS:0000016")))
    // uniprot: polypeptide individual + has-gene-product
    assert(nt.contains(line("UniProtKB:Q99P47", "rdf:type", "SO:0000104")))
    assert(nt.contains(line("ZFIN:ZDB-GENE-1", "RO:0002205",
      "UniProtKB:Q99P47")))
    // human orthology: default rel, pub source, AA→ECO evidence;
    // NS evidence and a non-ZDB-PUB source add nothing
    val oa = "_:" + Digest.assocIdScalaMd5("EX:zfin", "ZFIN:ZDB-GENE-1",
      "RO:HOM0000017", "NCBIGene:2253")
    assert(nt.contains(line("ZFIN:ZDB-GENE-1", "RO:HOM0000017",
      "NCBIGene:2253")))
    assert(nt.contains(line(oa, "RO:0002558", "ECO:0000031")))
    assert(nt.contains(line(oa, "dc:source", "ZFIN:ZDB-PUB-1")))
    assert(nt.contains(
      lineLit("NCBIGene:2253", "dc:description", "fibroblast growth factor 8")))
    val ob = "_:" + Digest.assocIdScalaMd5("EX:zfin", "ZFIN:ZDB-GENE-2",
      "RO:HOM0000017", "NCBIGene:6469")
    assert(!nt.exists(l => l.startsWith(t(ob)) && l.contains("RO_0002558")))
    assert(!nt.exists(l => l.startsWith(t(ob)) && l.contains("source")))
    // fish disease model: experimental-model animal bnode, is-model-of
    // assoc with description, PMID equivalence + clique leadership
    val animal = "_:" + Digest.md5IdScala("NCBITaxon7955-with-ZFINZDB-FISH-1")
    assert(nt.contains(line(animal, "rdf:type", "NCBITaxon:7955")))
    assert(nt.contains(line(animal, "GENO:0000222", "ZFIN:ZDB-FISH-1")))
    assert(nt.contains(line("ZFIN:ZDB-FISH-1", "RO:0003301", "DOID:5603")))
    val ma = "_:" + Digest.assocIdScalaMd5("EX:zfin", "ZFIN:ZDB-FISH-1",
      "RO:0003301", "DOID:5603")
    assert(nt.contains(lineLit(ma, "dc:description",
      "A fish with genotype ZFIN:ZDB-FISH-1 is a model for disease " +
        "acute T cell leukemia under the condition of ZFIN:ZDB-EXP-1")))
    assert(nt.contains(line("ZFIN:ZDB-PUB-3", "owl:sameAs", "PMID:21552289")))
    assert(nt.exists(l => l.startsWith(t("PMID:21552289")) &&
      l.contains("cliqueLeader")))
    // gene coordinates: FALDO interval on the danRer10 build instance
    assert(nt.contains(line("UCSC:danRer10#chr5", "rdf:type",
      "CHR:NCBITaxon-79555")))
    val region = "_:" + Digest.md5IdScala(
      "region+ZFIN:ZDB-GENE-1+100+2000+UCSC:danRer10#chr5")
    assert(nt.contains(line("ZFIN:ZDB-GENE-1", "faldo:location", region)))
    val begin = "_:" + Digest.md5IdScala(s"pos+$region+begin+100")
    assert(nt.contains(line(begin, "rdf:type", "faldo:ForwardStrandPosition")))

    // wave 3 — features: SO-typed individual + synonym; construct branch
    assert(nt.contains(line("ZFIN:ZDB-ALT-1", "rdf:type", "SO:1000008")))
    assert(nt.contains(lineLit("ZFIN:ZDB-ALT-1",
      "oboInOwl:hasExactSynonym", "fgf8a^ti282")))
    assert(nt.contains(line("ZFIN:ZDB-TGCONSTRCT-1", "rdf:type",
      "SO:0000902")))
    assert(nt.contains(line("ZFIN:ZDB-ALT-1", "RO:0002510",
      "ZFIN:ZDB-TGCONSTRCT-1")))
    // feature-affected-genes: 'is allele of' mints the variant locus,
    // other relationships don't
    val vl3 = "_:" + Digest.md5IdScala("ZDB-GENE-1-ZDB-ALT-1")
    assert(nt.contains(line(vl3, "rdf:type", "GENO:0000002")))
    assert(nt.contains(line(vl3, "GENO:0000382", "ZFIN:ZDB-ALT-1")))
    assert(nt.contains(line(vl3, "GENO:0000408", "ZFIN:ZDB-GENE-1")))
    assert(nt.contains(lineLit(vl3, "rdfs:label", "fgf8a<fgf8a^ti282>")))
    assert(!nt.contains(line(
      "_:" + Digest.md5IdScala("ZDB-GENE-2-ZDB-ALT-9"),
      "rdf:type", "GENO:0000002")))
    // pubinfo: et-al citation label, dc:title, PMID same-as + leader;
    // the no-PMID pub stays a plain document
    assert(nt.contains(lineLit("ZFIN:ZDB-PUB-1", "rdfs:label",
      "Smith J et al; Fish fins; Dev Biol; 2011; 352; 10-20")))
    assert(nt.contains(lineLit("ZFIN:ZDB-PUB-1", "dc:title", "Fish fins")))
    assert(nt.contains(line("ZFIN:ZDB-PUB-1", "rdf:type", "IAO:0000013")))
    assert(nt.contains(line("ZFIN:ZDB-PUB-9", "rdf:type", "IAO:0000310")))
    // pub2pubmed: supplementary link types both ends journal article
    assert(nt.contains(line("ZFIN:ZDB-PUB-9", "owl:sameAs",
      "PMID:11111111")))
    assert(nt.contains(line("PMID:11111111", "rdf:type", "IAO:0000013")))
    // mappings: panel as reference genome, panel chromosome instance,
    // feature subsequence-of; the EST row is skipped
    assert(nt.contains(lineLit("ZFIN:ZDB-REFCROSS-000320-1", "rdfs:label",
      "HS meiotic map")))
    assert(nt.contains(line("ZFIN:ZDB-REFCROSS-000320-1#chr13",
      "RO:0002525", "ZFIN:ZDB-REFCROSS-000320-1")))
    assert(nt.contains(line("ZFIN:ZDB-GENE-1", "RO:0002525",
      "ZFIN:ZDB-REFCROSS-000320-1#chr13")))
    assert(nt.contains(line("ZFIN:ZDB-ALT-1", "RO:0002525",
      "ZFIN:ZDB-REFCROSS-990707-1#chr13")))
    assert(!nt.exists(_.contains("ZDB-EST-5")))
    // zmine orthology evidence: same assoc-id convention as human_orthos,
    // decorated with the CL→ECO evidence and BOTH sources (ZFIN pub as
    // document, PMID as journal article); the gene-less row is dropped
    val oz = "_:" + Digest.assocIdScalaMd5("EX:zfin", "ZFIN:ZDB-GENE-3",
      "RO:HOM0000017", "NCBIGene:5076")
    assert(nt.contains(line("ZFIN:ZDB-GENE-3", "RO:HOM0000017",
      "NCBIGene:5076")))
    assert(nt.contains(line(oz, "RO:0002558", "ECO:0000044")))
    assert(nt.contains(line(oz, "dc:source", "ZFIN:ZDB-PUB-1")))
    assert(nt.contains(line(oz, "dc:source", "PMID:21552289")))
    assert(!nt.exists(_.contains("NCBIGene:123")))
  }
}
