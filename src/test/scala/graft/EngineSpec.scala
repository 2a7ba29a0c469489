package graft

import java.nio.file.Files

import graft.engine.{PropertyAxioms, Runner}

class EngineSpec extends SparkSpec {
  import spark.implicits._

  test("cross-source integration floor (omia-integration.py shape)") {
    // The reference's integration gate loads the produced serialization
    // and asserts a semantic floor across sources (≥175 `is model of`,
    // tests/omia-integration.py:16,44-60). Same shape here: run two
    // sources end-to-end, read the landed NT back, and hold floors on
    // cross-source patterns rather than exact counts.
    val out = Files.createTempDirectory("graft-integ").toString
    Runner.run(spark, Runner.RunConfig(
      Seq("nation_classes", "order_assocs"), out,
      destFmt = Seq("nt", "nquads")), sf)
    val nt = spark.read.text(s"$out/nation_classes.nt").as[String].collect() ++
      spark.read.text(s"$out/order_assocs.nt").as[String].collect()
    // every nation subclasses a region (25 at any sf) — the partonomy floor
    assert(nt.count(_.contains("rdf-schema#subClassOf")) >= 25)
    // reified associations from the second source — the association floor
    assert(nt.count(_.contains("oban/association_has_subject")) >= 100)
    // both sources' dataset-metadata graphs landed
    assert(nt.count(_.contains("void#Dataset")) >= 2)
    // nquads sink: same triples tagged with the per-source graph label
    val nq = spark.read.text(s"$out/order_assocs.nq").as[String].collect()
    assert(nq.nonEmpty && nq.forall(_.contains("<https://example.org/id/graph/order_assocs> .")))
  }

  test("omia×ncbi×omim integration: model-of floor + named pair + ortholog augmentation") {
    // The reference's only multi-source E2E gate: OMIA × OMIM × NCBI must
    // yield the model-of pairs plus one NAMED breed→disease pair
    // (tests/omia-integration.py:16,44-60, wired Makefile:88-89). Here the
    // same composed run goes through ONE RunConfig: the omia source's
    // model-of map is typed by the OMIM mimTitles sidecar, and the
    // Runner-level augmentation joins omia's OUTPUT graph (annotated
    // genes) against ncbi_gene's gene_group input (OMIA.py:170-172).
    val dir = "src/test/resources/golden/omia/input"
    val out = Files.createTempDirectory("graft-omia-integ").toString
    val results = Runner.run(spark,
      Runner.RunConfig(Seq("omia", "ncbi_gene"), out), dir)
    assert(results.map(_.name) == Seq("omia", "ncbi_gene"))
    val cm = Runner.curieMap
    val nt = spark.read.text(s"$out/omia.nt").as[String].collect()

    // ---- integration floor (corpus-scaled EXPECTED_PAIRS) ----
    val isModelOf = "<" + cm.expand("RO:0003301") + ">"
    val pairs = nt.filter(_.contains(isModelOf))
      .map(l => { val t = l.split(" "); (t(0), t(2)) }).distinct
    assert(pairs.length >= 3, s"model-of floor: ${pairs.toSeq}")
    // the named pair: breed 758 models EXACTLY OMIM:305100
    // (omia-integration.py:56-60 list-equality check)
    val b758 = "<" + cm.expand("OMIA-breed:758") + ">"
    assert(pairs.filter(_._1 == b758).map(_._2).toSeq ==
      Seq("<" + cm.expand("OMIM:305100") + ">"))
    // the Asterisk-typed (gene) omim never becomes a model target…
    assert(!pairs.exists(_._2.contains("603470")))
    // …but its xref survives (cleaning narrows the MAP, not the xrefs)
    assert(nt.exists(l => l.contains("omia/000162") && l.contains("hasDbXref")
      && l.contains("OMIM:603470")))
    // model-of association carries descendant evidence + description;
    // with a common name in the dump, the breed label's parenthesized
    // species is 'dog', so the sci-name phene suffix does NOT strip —
    // exactly the reference's sp_label mechanics (OMIA.py:611-630)
    assert(nt.exists(_.contains(cm.expand("ECO:0000214"))))
    assert(nt.exists(_.contains("High incidence of Ectodermal dysplasia " +
      "in Canis lupus familiaris in German Shepherd Dog (dog) suggests " +
      "it to be a model of disease OMIM:305100.")))

    // ---- ortholog augmentation landed in omia's graph ----
    val orthRel = "<" + cm.expand("RO:HOM0000017") + ">"
    val orth = nt.filter(_.contains(orthRel))
      .map(l => { val t = l.split(" "); (t(0), t(2)) }).distinct
    // dog EDA → mouse Eda and human EDA through the gene_group walk
    def g(n: String) = "<" + cm.expand(s"NCBIGene:$n") + ">"
    assert(orth.contains((g("403423"), g("13607"))))
    assert(orth.contains((g("403423"), g("1896"))))
    assert(orth.contains((g("280717"), g("445"))))
    // non-Ortholog relationship rows never join
    assert(!nt.exists(_.contains("gene/999")))
    // every orthology association carries the PMID source
    assert(nt.exists(_.contains("pubmed/24063302")))
    // ortholog members typed with their taxon
    assert(nt.exists(l => l.contains("gene/13607") &&
      l.contains(cm.expand("NCBITaxon:10090"))))

    // ---- the solo ncbi_gene dimension graph ----
    val gnt = spark.read.text(s"$out/ncbi_gene.nt").as[String].collect()
    assert(gnt.exists(l => l.contains("gene/1896") &&
      l.contains(cm.expand("SO:0001217")))) // typed protein-coding
    assert(gnt.exists(l => l.contains("gene/1896") &&
      l.contains("\"ectodysplasin A\"")))
    assert(!gnt.exists(_.contains("NEWENTRY"))) // placeholder unlabeled
  }

  test("kegg ingest: pairwise x-ref composition through Runner") {
    val dir = "src/test/resources/golden/kegg/input"
    val out = Files.createTempDirectory("graft-kegg").toString
    val results = Runner.run(spark, Runner.RunConfig(Seq("kegg"), out), dir)
    assert(results.head.triples > 0)
    val nt = spark.read.text(s"$out/kegg.nt").as[String].collect()
    // 1:1 omim↔disease equivalence kept; the 2-row H00409 side dropped
    assert(nt.exists(l => l.contains("kegg.disease/H00056") &&
      l.contains("equivalentClass") && l.contains("mim/104300")))
    assert(!nt.exists(l => l.contains("H00409") && l.contains("equivalentClass")))
    // kegg↔ncbi gene equivalence with the prefix rewrite
    assert(nt.exists(l => l.contains("kegg.genes/hsa:100") &&
      l.contains("equivalentClass") && l.contains("ncbigene/100")))
    // embedded EC numbers extracted as xrefs (both from one bracket)
    assert(nt.exists(l => l.contains("K00010") && l.contains("\"EC:1.1.1.18\"")))
    assert(nt.exists(l => l.contains("K00010") && l.contains("\"EC:1.1.1.369\"")))
    // KO → digest gene-product bnode → involved-in pathway
    assert(nt.exists(l => l.contains("genid") && l.contains("RO_0002331") &&
      l.contains("kegg.pathway/map04130")))
    // pathway causally upstream of or within the disease process
    assert(nt.exists(l => l.contains("RO_0002418") &&
      l.contains("kegg.disease/H00056")))
    // journal-article reference is_about the pathway
    assert(nt.exists(l => l.contains("pubmed/10025401") &&
      l.contains("IAO_0000136")))
    // first symbol is the label, later symbols synonyms only
    assert(nt.exists(l => l.contains("hsa:9475") && l.contains("rdf-schema#label")
      && l.contains("\"ROCK2\"")))
    assert(nt.exists(l => l.contains("hsa:9475") && l.contains("ExactSynonym")
      && l.contains("\"ROCK-II\"")))
    // dormant-pass tiers: disease2gene alt-locus association only for
    // no-omim, non-grouping diseases
    val alt = "_:" + graft.core.Digest.md5IdScala("KEGG-hsa101-KEGG-dsH00999-VL")
    assert(nt.exists(l => l.contains(alt.drop(2)) &&
      l.contains("\"some variant of SINGLE that is associated with Solo disease\"")))
    assert(nt.exists(l => l.contains(alt.drop(2)) && l.contains("RO_0002607") &&
      l.contains("kegg.disease/H00999")))
    // omim-mapped disease H00056 and grouping-labeled H00888 are excluded
    assert(!nt.exists(l => l.contains("RO_0002607") && l.contains("H00056")))
    assert(!nt.exists(l => l.contains("H00888") && l.contains("RO_0002607")))
    // omim2gene: equivalence only when the OMIM entry type is gene
    assert(nt.exists(l => l.contains("kegg.genes/hsa:100") &&
      l.contains("equivalentClass") && l.contains("mim/608958")))
    assert(!nt.exists(l => l.contains("equivalentClass") && l.contains("102700")))
    // reverse link → alt-locus marker association against the OMIM id
    val altRev = "_:" + graft.core.Digest.md5IdScala("KEGG-hsa100-OMIM300100-VL")
    assert(nt.exists(l => l.contains(altRev.drop(2)) && l.contains("RO_0002607") &&
      l.contains("mim/300100")))
    // original links are skipped
    assert(!nt.exists(l => l.contains("604002")))
  }

  test("mychem ingest: nested-JSON navigation through Runner") {
    val dir = "src/test/resources/golden/mychem/input"
    val out = Files.createTempDirectory("graft-mychem").toString
    val results = Runner.run(spark, Runner.RunConfig(Seq("mychem"), out), dir)
    assert(results.head.triples > 0)
    val nt = spark.read.text(s"$out/mychem.nt").as[String].collect()
    // array-shaped targets with array actions
    assert(nt.exists(l => l.contains("MONARCH_direct_thrombin_inhibitor") &&
      l.contains("uniprot/P00734")))
    // string-form actions scrub: '/' join
    assert(nt.exists(_.contains("MONARCH_cofactor_partner")))
    // singleton-dict targets (return_target_list) + space join
    assert(nt.exists(l => l.contains("MONARCH_inhibitor_of_cyclooxygenase") &&
      l.contains("uniprot/P23219")))
    // pipe-separated uniprot fan-out
    assert(nt.exists(l => l.contains("unii/R16CO5Y76E") &&
      l.contains("uniprot/P35354")))
    // record without unii skipped entirely
    assert(!nt.exists(_.contains("DB99999")))
    // elif: drug_use ignored when bioactivity present
    assert(!nt.exists(_.contains("91613004")))
    // contraindication dropped, indication kept with label
    assert(!nt.exists(_.contains("13645005")))
    assert(nt.exists(l => l.contains("SNOMEDCT/194828000") &&
      l.contains("\"Angina pectoris\"")))
  }

  test("asOfDate pin: two runs of the same config are byte-identical") {
    // Runner stamps retrievedOn with LocalDate.now by default (the
    // reference's provenance semantics); RunConfig.asOfDate pins it so a
    // reproducible-output deployment gets identical bytes on rerun.
    def runOnce(): Seq[String] = {
      val out = Files.createTempDirectory("graft-asof").toString
      Runner.run(spark, Runner.RunConfig(Seq("nation_classes"), out,
        asOfDate = Some("2026-01-01")), sf)
      spark.read.text(s"$out/nation_classes.nt").as[String].collect()
        .toSeq.sorted
    }
    val a = runOnce()
    assert(a == runOnce())
    assert(a.exists(s => s.toLowerCase.contains("retrievedon")
      && s.contains("2026-01-01")))
    // CLI flag reaches the config
    val (cfg, _) = Runner.parseArgs(Seq(
      "-s", "nation_classes", "--as_of_date", "2026-01-01"))
    assert(cfg.asOfDate.contains("2026-01-01"))
  }

  test("CLI arg surface (dipper-etl.py:64-128 twin)") {
    val (cfg, data) = Runner.parseArgs(Seq(
      "--sources", "nation_classes,order_assocs", "--limit", "7",
      "--dest_fmt", "nt,rdfxml", "--taxon", "9606,10090",
      "--test_only", "--out", "/tmp/o", "--data", "/tmp/d",
      "--data_release_version", "202608"))
    assert(cfg.sources == Seq("nation_classes", "order_assocs"))
    assert(cfg.limit.contains(7) && cfg.testOnly)
    assert(cfg.destFmt == Seq("nt", "rdfxml"))
    assert(cfg.taxa == Seq("9606", "10090"))
    assert(cfg.version == "202608" && cfg.outDir == "/tmp/o" && data == "/tmp/d")
    // short flags parse too
    val (cfg2, _) = Runner.parseArgs(Seq("-s", "nation_classes", "-l", "3"))
    assert(cfg2.sources == Seq("nation_classes") && cfg2.limit.contains(3))
    intercept[IllegalArgumentException](Runner.parseArgs(Seq("--limit", "3")))
  }

  test("runner: sources → NT + metadata + axioms + test subset (etl lifecycle)") {
    val out = Files.createTempDirectory("graft-run").toString
    val results = Runner.run(spark,
      Runner.RunConfig(Seq("nation_classes", "order_assocs"), out), sf)
    assert(results.map(_.name) == Seq("nation_classes", "order_assocs"))
    assert(results.forall(_.triples > 0))

    val nt = spark.read.text(s"$out/nation_classes.nt").as[String].collect()
    // class triples present and IRIs expanded
    assert(nt.exists(_.contains("<http://www.w3.org/2002/07/owl#Class>")))
    // dataset metadata graph unioned in (HCLS pattern)
    assert(nt.exists(_.contains("void#Dataset")))
    // property axioms post-pass typed the used predicates
    assert(nt.exists(l => l.contains("rdf-schema#label") &&
      l.contains("AnnotationProperty")))
    // test-subset graph written and restricted
    val sub = spark.read.text(s"$out/nation_classes_test.nt").as[String].collect()
    assert(sub.nonEmpty && sub.forall(l =>
      l.startsWith("<https://example.org/id/nation0>") ||
      l.startsWith("<https://example.org/id/region0>")))
  }

  test("mgi JDBC multi-view ingest runs the full lifecycle (MGI.py shape)") {
    // the one §2.1 mechanism with a database (not file) fetch stage:
    // four Derby views → idhash broadcast joins → VSLC/GVC assembly →
    // publication equivalences → NT, via the registered source
    val out = Files.createTempDirectory("graft-mgi").toString
    val results = Runner.run(spark,
      Runner.RunConfig(Seq("mgi_genotypes"), out), sf)
    assert(results.head.triples > 0)
    val nt = spark.read.text(s"$out/mgi_genotypes.nt").as[String].collect()
    // genotype individuals with expanded MGI prefix
    assert(nt.exists(l => l.contains("<http://identifiers.org/MGI:G4>") &&
      l.contains("GENO_0000536")))
    // VSLC bnodes carry zygosity resolved through tt/mgi.yaml
    assert(nt.exists(l => l.contains("GENO_0000608")))
    // publication equivalence pass landed
    assert(nt.exists(_.contains("owl#sameAs")))
    // test-subset graph restricted to the curated genotype id
    val sub = spark.read.text(s"$out/mgi_genotypes_test.nt").as[String].collect()
    assert(sub.nonEmpty &&
      sub.forall(_.startsWith("<http://identifiers.org/MGI:G4>")))
  }

  test("omim API-shape ingest: landed JSON → classes/synonyms/deprecations") {
    val out = Files.createTempDirectory("graft-omim").toString
    val results = Runner.run(spark,
      Runner.RunConfig(Seq("omim_api"), out), sf)
    assert(results.head.triples > 0)
    val nt = spark.read.text(s"$out/omim_api.nt").as[String].collect()
    // cleaned title-case labels with roman numerals converted
    assert(nt.exists(_.contains("\"Disease of Type 3\"")))
    // raw ALL-CAPS title kept as exact synonym
    assert(nt.exists(l => l.contains("hasExactSynonym") &&
      l.contains("DISEASE OF TYPE")))
    // alternative titles landed as related synonyms, ', INCLUDED' stripped
    assert(nt.exists(l => l.contains("hasRelatedSynonym") &&
      l.contains("\"Old Name for Type")))
    assert(!nt.exists(_.contains("INCLUDED")))
    // replaced records deprecated with IAO:0100001 link
    assert(nt.exists(_.contains("owl#deprecated")))
    assert(nt.exists(_.contains("IAO_0100001")))
  }

  test("bgee / ucsc_bands / udp_variants registered sources run end-to-end") {
    val out = Files.createTempDirectory("graft-region").toString
    val results = Runner.run(spark, Runner.RunConfig(
      Seq("bgee", "ucsc_bands", "udp_variants"), out), sf)
    assert(results.size == 3 && results.forall(_.triples > 0))
    val bgee = spark.read.text(s"$out/bgee.nt").as[String].collect()
    assert(bgee.exists(_.contains("RO_0002206"))) // expressed-in assocs
    val bands = spark.read.text(s"$out/ucsc_bands.nt").as[String].collect()
    assert(bands.exists(_.contains("SO_0000341"))) // chromosome-band class
    assert(bands.exists(_.contains("faldo#position"))) // extent positions
    assert(bands.exists(_.contains("RO_0002525"))) // containment partonomy
    assert(bands.exists(_.contains("CHR_9606chr"))) // per-taxon class space
    assert(bands.exists(_.contains("MONARCH_hg19chr"))) // per-build features
    assert(bands.exists(_.contains("GENO_0000207"))) // Giemsa stain attribute
    assert(bands.exists(_.contains("SO_0000577"))) // acen rows -> centromere
    assert(bands.exists(_.contains("SO_0001505"))) // build as reference genome
    val udp = spark.read.text(s"$out/udp_variants.nt").as[String].collect()
    assert(udp.exists(_.contains("GENO_0000418"))) // variant → gene
  }

  test("gwas_catalog ingest runs the full lifecycle (GWASCatalog.py shape)") {
    val out = Files.createTempDirectory("graft-gwas").toString
    val results = Runner.run(spark, Runner.RunConfig(
      Seq("gwas_catalog"), out),
      "src/test/resources/golden/gwas_catalog/input")
    assert(results.head.triples > 0)
    val nt = spark.read.text(s"$out/gwas_catalog.nt").as[String].collect()
    assert(nt.exists(_.contains("SO_0000694"))) // SNP features
    assert(nt.exists(_.contains("SO_0001024"))) // haplotype individual
    assert(nt.exists(_.contains("RO_0003304"))) // contributes-to assocs
    assert(nt.exists(_.contains("IAO_0100001"))) // dbSNP merge deprecation
    assert(nt.exists(_.contains("faldo"))) // point locations
    // the 'rs x rs' interaction format is not parseable — dropped
    assert(!nt.exists(_.contains("rs11209026")))
    // the curated-id test subset is written alongside the main graph
    val tnt = spark.read.text(s"$out/gwas_catalog_test.nt")
      .as[String].collect()
    assert(tnt.nonEmpty && tnt.forall(_.contains("rs1329573")))
  }

  test("panther ingest: tar.gz member through the full lifecycle with --taxon") {
    val dir = "src/test/resources/golden/panther/input"
    val out = Files.createTempDirectory("graft-panther").toString
    val results = Runner.run(spark,
      Runner.RunConfig(Seq("panther"), out), dir)
    assert(results.head.triples > 0)
    val nt = spark.read.text(s"$out/panther.nt").as[String].collect()
    assert(nt.exists(_.contains("RO_HOM0000020"))) // 1:1 orthology (LDO)
    assert(nt.exists(_.contains("RO_HOM0000011"))) // paralogy
    assert(nt.exists(_.contains("panther.family"))) // family grouping
    assert(nt.exists(_.contains("ECO_0000080"))) // phylogenetic evidence
    assert(!nt.exists(_.contains("Huwe1"))) // unmapped gene id dropped
    // --taxon some-filter: keep pairs where EITHER side matches
    val out2 = Files.createTempDirectory("graft-panther-tax").toString
    Runner.run(spark, Runner.RunConfig(Seq("panther"), out2,
      taxa = Seq("7955")), dir)
    val zf = spark.read.text(s"$out2/panther.nt").as[String].collect()
    assert(zf.exists(_.contains("ENSDARG"))) // zebrafish pair kept
    assert(!zf.exists(_.contains("wormbase"))) // worm-human pair dropped
  }

  test("go_gaf ingest: GAF scan + idmapping dimension through Runner with --taxon") {
    val dir = "src/test/resources/golden/go_gaf/input"
    val out = Files.createTempDirectory("graft-gaf").toString
    val results = Runner.run(spark, Runner.RunConfig(Seq("go_gaf"), out), dir)
    assert(results.head.triples > 0)
    val nt = spark.read.text(s"$out/go_gaf.nt").as[String].collect()
    assert(nt.exists(_.contains("ncbigene/672")))   // UniProt->GeneID mapping
    assert(nt.exists(_.contains("ENSG00000181544"))) // Ensembl fallback
    assert(!nt.exists(_.contains("CYCS")))          // unmapped UniProt dropped
    assert(!nt.exists(_.contains("Bmp4")))          // NOT qualifier dropped
    assert(nt.exists(_.contains("GENO_0000504")))   // reagent-targeted gene
    assert(nt.exists(_.contains("ECO_0000059")))    // exp phenotypic evidence
    // --taxon: only the worm GAF row (and no human idmapping rows) survive
    val out2 = Files.createTempDirectory("graft-gaf-tax").toString
    Runner.run(spark, Runner.RunConfig(Seq("go_gaf"), out2,
      taxa = Seq("6239")), dir)
    val worm = spark.read.text(s"$out2/go_gaf.nt").as[String].collect()
    assert(worm.exists(_.contains("WBGene00000912")))
    assert(!worm.exists(_.contains("ncbigene/672")) &&
      !worm.exists(_.contains("pax2a")))
  }

  test("impc ingest: statistical evidence chain through Runner") {
    val dir = "src/test/resources/golden/impc/input"
    val out = Files.createTempDirectory("graft-impc").toString
    val results = Runner.run(spark, Runner.RunConfig(Seq("impc"), out), dir)
    assert(results.head.triples > 0)
    val nt = spark.read.text(s"$out/impc.nt").as[String].collect()
    assert(nt.exists(_.contains("SEPIO_0000007")))  // has_supporting_evidence_line
    assert(nt.exists(_.contains("OBI_0000175")))    // p-value individual
    assert(nt.exists(_.contains("STATO_0000085")))  // effect size estimate
    assert(nt.exists(_.contains("STATO_0000464")))  // LMM statistical method
    assert(nt.exists(_.contains("2.1500e-07")))     // {:.4e} p-value format
    assert(nt.exists(_.contains("0.45679")))        // round(effect, 5)
    assert(nt.exists(_.contains("(p = NS )")))      // raw fallback
    assert(nt.exists(_.contains("GENO_0000646")))   // male sex specificity
    assert(nt.exists(l => l.contains("OBI_0000471"))) // study node
    assert(!nt.exists(_.contains("Dnajc5")))        // no-phenotype row dropped
  }

  test("orphanet ingest: nested JDBOR XML through Runner") {
    val dir = "src/test/resources/golden/orphanet/input"
    val out = Files.createTempDirectory("graft-orpha").toString
    val results = Runner.run(spark, Runner.RunConfig(Seq("orphanet"), out), dir)
    assert(results.head.triples > 0)
    val nt = spark.read.text(s"$out/orphanet.nt").as[String].collect()
    assert(nt.exists(_.contains("hgnc/30497")))      // HGNC preferred
    assert(nt.exists(l => l.contains("ENSG00000160789") &&
      l.contains("equivalentClass")))                // clique equivalents
    assert(nt.exists(_.contains("RO_0004013")))      // causal germline mutation
    assert(nt.exists(_.contains("ECO_0000323")))     // Not-yet-assessed evidence
    assert(nt.exists(_.contains("orphanet.ordo/93262"))) // no-gene disorder class
    assert(nt.exists(_.contains("fiche.php?symbol=LOCX"))) // settle-for-first
  }

  test("biogrid ingest: zip mitab member through Runner with --taxon") {
    val dir = "src/test/resources/golden/biogrid/input"
    val out = Files.createTempDirectory("graft-biogrid").toString
    val results = Runner.run(spark, Runner.RunConfig(Seq("biogrid"), out), dir)
    assert(results.head.triples > 0)
    val nt = spark.read.text(s"$out/biogrid.nt").as[String].collect()
    assert(nt.exists(_.contains("thebiogrid.org/200001"))) // biogrid: routing
    assert(nt.exists(_.contains("uniprot/P38398")))        // swiss-prot routing
    assert(nt.exists(_.contains("ECO_0000068")))           // y2h evidence
    assert(nt.exists(_.contains("pubmed/14976165")))       // pubmed->PMID
    assert(!nt.exists(_.contains("NM_000546")))            // unroutable dropped
    // --taxon 9606: both endpoints must match — the mouse pair drops
    val out2 = Files.createTempDirectory("graft-biogrid-tax").toString
    Runner.run(spark, Runner.RunConfig(Seq("biogrid"), out2,
      taxa = Seq("9606")), dir)
    val hum = spark.read.text(s"$out2/biogrid.nt").as[String].collect()
    assert(hum.exists(_.contains("ncbigene/351")) &&
      !hum.exists(_.contains("P38398")))
  }

  test("streamed-graph mode: streamed NT set-equals the batch NT") {
    // the reference's `-g streamed_graph` (Source.py:118-121): same
    // graph, incremental serialization — here via the Structured
    // Streaming sink with an AvailableNow trigger through Runner
    val out = Files.createTempDirectory("graft-streamrun").toString
    Runner.run(spark, Runner.RunConfig(Seq("nation_classes"), out,
      destFmt = Seq("nt", "streamed_nt")), sf)
    val batchNt = spark.read.text(s"$out/nation_classes.nt")
      .as[String].collect().toSet
    val streamNt = spark.read.text(s"$out/nation_classes.stream.nt")
      .as[String].collect().toSet
    assert(streamNt == batchNt && batchNt.nonEmpty)
    // rerun into the SAME outDir: overwrite semantics, not append — a
    // kept checkpoint would see the overwritten stage's renamed part
    // files as new input and duplicate every line
    Runner.run(spark, Runner.RunConfig(Seq("nation_classes"), out,
      destFmt = Seq("streamed_nt")), sf)
    val rerun = spark.read.text(s"$out/nation_classes.stream.nt")
      .as[String].collect()
    assert(rerun.length == rerun.toSet.size && rerun.toSet == batchNt)
  }

  test("limit pushdown caps every input scan (--limit N)") {
    val out = Files.createTempDirectory("graft-run-lim").toString
    val results = Runner.run(spark,
      Runner.RunConfig(Seq("order_assocs"), out, limit = Some(5)), sf)
    // 5 orders × 7 triples + metadata(9) + axioms — well under unlimited
    assert(results.head.triples < 70)
  }

  test("unknown source name fails like dipper-etl source validation") {
    intercept[IllegalArgumentException] {
      Runner.run(spark, Runner.RunConfig(Seq("nope"), "/tmp/x"), sf)
    }
  }

  test("driver contract: oracle keys ⊆ query keys, flagship returns rows") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
    // every registered query is value-checked — the former rows-only
    // hash-family trio graduated to md5-arithmetic oracle families
    val rowsOnly = qs -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"undocumented rows-only queries: $rowsOnly")
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("axiom classification covers annotation/datatype/object splits") {
    val t = SparkEntry.queries("r02_assoc_reified")(spark, sf)
    val ax = PropertyAxioms.axiomTriples(t)
      .select("s", "o").as[(String, String)].collect().toMap
    assert(ax("EXP:score") == "owl:DatatypeProperty")
    assert(ax("dc:source") == "owl:AnnotationProperty")
    assert(ax("OBAN:association_has_subject") == "owl:ObjectProperty")
  }

  test("round-5 coverage wave: mmrrc/animalqtldb/flybase/wormbase through Runner") {
    // end-to-end over the golden inputs: registry wiring, scan, emit,
    // NT sink — semantic spot checks per source (the exact triple sets
    // are locked by GoldenSpec's corpus compare)
    def run(name: String): Set[String] = {
      val out = Files.createTempDirectory(s"graft-$name").toString
      val res = Runner.run(spark, Runner.RunConfig(Seq(name), out),
        s"src/test/resources/golden/$name/input")
      assert(res.head.triples > 0, name)
      spark.read.text(s"$out/$name.nt").as[String].collect().toSet
    }

    val mmrrc = run("mmrrc")
    // two alleles on one strain: GVC assembled over two VSLCs
    assert(mmrrc.exists(l => l.contains("GENO_0000009")))
    // MP association with dc:source PMID fan-out
    assert(mmrrc.exists(l => l.contains("MP_0001393")))
    assert(mmrrc.exists(l => l.contains("dc/elements/1.1/source") &&
      l.contains("pubmed/8356452")))

    val aqtl = run("animalqtldb")
    // cm-tier QTL on the linkage map; bp-tier on the UCSC build
    assert(aqtl.exists(l => l.contains("cattle-linkagechr14")))
    assert(aqtl.exists(l => l.contains("bosTau7chr14")))
    // is-marker-for association with the p-value digit-survival quirk
    assert(aqtl.exists(l => l.contains("RO_0002607")))
    assert(aqtl.exists(l => l.contains("\"5.0\"") &&
      l.contains("XMLSchema#double")))

    val fb = run("flybase")
    // foreign transgenic allele excluded from the allele tier but alive
    // as a qualifier on the phenotype association
    assert(!fb.exists(l =>
      l.contains("flybase/FBal0130657> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type>")))
    assert(fb.exists(l => l.contains("GENO_0000580") &&
      l.contains("FBal0130657")))
    // FBrf→PMID reroute in the disease tier
    assert(fb.exists(l => l.contains("DOID_5555")) &&
      fb.exists(l => l.contains("pubmed/30328653")))

    val wb = run("wormbase")
    // REF⇄WITH unswap: the person lands as a typed source
    assert(wb.exists(l => l.contains("WBPerson557") &&
      l.contains("foaf/0.1/Person")))
    // Dead gene deprecated; RNAi reagent targets its gene
    assert(wb.exists(l => l.contains("WBGene00000003") &&
      l.contains("owl#deprecated")))
    assert(wb.exists(l => l.contains("WBRNAi00025129") &&
      l.contains("GENO_0000414")))
  }
}
