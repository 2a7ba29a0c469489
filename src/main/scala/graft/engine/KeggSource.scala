package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.{Digest, Vocab}
import graft.emit.ColumnEmit
import graft.emit.ColumnEmit.{res, str}

/** The KEGG-shape ingest (dipper/sources/KEGG.py) — the most
  * interconnected of the reference's pairwise-mapping parsers: ~8
  * two/three-column flat files composed into pathway, disease, gene,
  * orthology-class and cross-reference triples. The live `parse()`
  * families (KEGG.py:126-152; `_process_omim2gene` and
  * `_process_kegg_disease2gene` are commented out there and therefore
  * not re-modeled) map 1:1 onto the columnar emitters below.
  *
  * Deliberate divergences from reference *typos* (documented, not
  * replicated): the gene-name split uses ';' where KEGG.py:290 splits on
  * the literal two-character string `'r;'` (an apparent typo for
  * `r';'`), and the KO-membership branch (KEGG.py:311-316) is dead code
  * upstream (`re.search(r'K\d+', …)` has no capture groups, so
  * `len(match.groups()) == 1` is never true) — not emitted here either.
  *
  * Scale shape: zero joins except the windowed 1:1 filter over the
  * omim↔disease mapping (a dimension-sized relation); every other family
  * is a single codegen'd projection + explode over its own file scan.
  */
object KeggSource extends GraftSource {
  val name = "kegg"

  private def schemaOf(cols: String*): StructType =
    StructType(cols.map(StructField(_, StringType)))

  /** The reference's `files` manifest (KEGG.py:33-108), headerless
    * dbget flat files. */
  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] =
    graft.sources.DelimitedSource.readManifest(spark, Map(
      "pathway" -> graft.sources.SourceFile(s"$dataDir/kegg_pathway.tsv",
        schemaOf("pathway_id", "pathway_name"), hasHeader = false),
      "disease" -> graft.sources.SourceFile(s"$dataDir/kegg_disease.tsv",
        schemaOf("disease_id", "disease_name"), hasHeader = false),
      "hsa_genes" -> graft.sources.SourceFile(s"$dataDir/kegg_hsa_genes.tsv",
        schemaOf("gene_id", "gene_name"), hasHeader = false),
      "ortholog_classes" -> graft.sources.SourceFile(
        s"$dataDir/kegg_ortholog_classes.tsv",
        schemaOf("orthology_class_id", "orthology_class_name"),
        hasHeader = false),
      "omim" -> graft.sources.SourceFile(s"$dataDir/kegg_omim.tsv",
        schemaOf("omim_disease_id", "kegg_disease_id", "link_type"),
        hasHeader = false),
      "ncbi" -> graft.sources.SourceFile(s"$dataDir/kegg_ncbi.tsv",
        schemaOf("kegg_gene_id", "ncbi_gene_id", "link_type"),
        hasHeader = false),
      "pubmed" -> graft.sources.SourceFile(s"$dataDir/kegg_pubmed.tsv",
        schemaOf("pubmed_id", "kegg_pathway_num"), hasHeader = false),
      "ds" -> graft.sources.SourceFile(s"$dataDir/kegg_pathway_disease.tsv",
        schemaOf("disease_id", "kegg_pathway_num"), hasHeader = false),
      "ko" -> graft.sources.SourceFile(s"$dataDir/kegg_pathway_ko.tsv",
        schemaOf("ko_id", "pathway_id"), hasHeader = false),
      // the two dormant mapping files (their _process methods exist at
      // KEGG.py:392-559 but are commented out of parse() at
      // KEGG.py:147-149) — landed and parsed here so a consumer who
      // re-enables them gets identical semantics; `hsa_gene2pathway`
      // stays unlanded because the reference fetches it and never
      // parses it at all (manifest KEGG.py:53-56, no _process)
      "disease_gene" -> graft.sources.SourceFile(
        s"$dataDir/kegg_disease_gene.tsv",
        schemaOf("gene_id", "disease_id"), hasHeader = false),
      "omim2gene" -> graft.sources.SourceFile(
        s"$dataDir/kegg_omim2gene.tsv",
        schemaOf("kegg_gene_id", "omim_id", "link_type"),
        hasHeader = false),
      // stand-in for the reference's cross-source omim_type hash (OMIM
      // mimTitles-derived entry types consulted at KEGG.py:518-526)
      "omim_types" -> graft.sources.SourceFile(
        s"$dataDir/kegg_omim_types.tsv",
        schemaOf("omim_id", "omim_type"), hasHeader = false)))

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    val tt = graft.core.TranslationTable.default

    // _process_pathways (KEGG.py:155-198): pathway classes subtyped
    // cellular_process + pathway, with the 1:1 map depiction
    val pathways = in("pathway")
      .filter(coalesce(col("pathway_id"), lit("")) =!= "")
      .select(concat(lit("KEGG-"), trim(col("pathway_id"))).as("pid"),
        col("pathway_name").as("plabel"))
      .withColumn("img", concat(lit("http://www.genome.jp/kegg/pathway/map/"),
        regexp_replace(col("pid"), "KEGG-path:", ""), lit(".png")))
    val pathwayTriples = ColumnEmit.emitFiltered(pathways,
      res(col("pid"), lit(Vocab.a), lit(Vocab.owlClass)),
      str(col("pid"), lit(Vocab.label), col("plabel")),
      res(col("pid"), lit(Vocab.subClassOf), lit(tt.resolve("cellular_process"))),
      res(col("pid"), lit(Vocab.subClassOf), lit(tt.resolve("pathway"))),
      res(col("pid"), lit(Vocab.depiction), col("img")))

    // _process_diseases (py:200-243): plain labeled disease classes
    val diseases = in("disease")
      .filter(coalesce(col("disease_id"), lit("")) =!= "")
      .select(concat(lit("KEGG-"), trim(col("disease_id"))).as("did"),
        col("disease_name").as("dlabel"))
    val diseaseTriples = ColumnEmit.emitFiltered(diseases,
      res(col("did"), lit(Vocab.a), lit(Vocab.owlClass)),
      str(col("did"), lit(Vocab.label), col("dlabel")))

    // _process_genes (py:245-323): first symbol = label, long name =
    // definition, every symbol a synonym (the reference's enumerate loop
    // does NOT skip the first — its own 'todo skip the first')
    val genes = in("hsa_genes")
      .filter(coalesce(col("gene_id"), lit("")) =!= "")
      .select(concat(lit("KEGG-"), trim(col("gene_id"))).as("gid"),
        split(col("gene_name"), ";").as("parts"))
      .select(col("gid"),
        split(element_at(col("parts"), 1), ",").as("symbols"),
        when(size(col("parts")) > 1, trim(element_at(col("parts"), 2)))
          .as("defn"))
    val geneTriples = ColumnEmit.emitFiltered(genes,
      res(col("gid"), lit(Vocab.a), lit(Vocab.gene)),
      str(col("gid"), lit(Vocab.label), trim(element_at(col("symbols"), 1))),
      str(col("gid"), lit("IAO:0000115"), col("defn")))
    val geneSynonyms = ColumnEmit.emit(
      genes.select(col("gid"), explode(col("symbols")).as("syn")),
      str(col("gid"), lit(Vocab.hasExactSynonym), trim(col("syn"))))

    // _process_ortholog_classes (py:325-390): gene-family classes; when
    // labels are compound the tail is the description, every piece a
    // synonym, and embedded EC numbers become literal xrefs
    val okc = in("ortholog_classes")
      .filter(coalesce(col("orthology_class_id"), lit("")) =!= "")
      .select(concat(lit("KEGG-"), trim(col("orthology_class_id"))).as("kid"),
        split(col("orthology_class_name"), "[;,]").as("labels"))
      .withColumn("klabel", element_at(col("labels"), 1))
      .withColumn("kdesc", when(size(col("labels")) > 1,
        element_at(col("labels"), size(col("labels")))))
    val okcTriples = ColumnEmit.emitFiltered(okc,
      res(col("kid"), lit(Vocab.a), lit(Vocab.owlClass)),
      str(col("kid"), lit(Vocab.label), col("klabel")),
      res(col("kid"), lit(Vocab.subClassOf), lit(tt.resolve("gene_family"))),
      str(col("kid"), lit(Vocab.description), trim(col("kdesc"))))
    val okcSynonyms = ColumnEmit.emit(
      okc.filter(size(col("labels")) > 1)
        .select(col("kid"), explode(col("labels")).as("syn")),
      str(col("kid"), lit(Vocab.hasExactSynonym), trim(col("syn"))))
    val okcXrefs = ColumnEmit.emit(
      okc.filter(col("kdesc").isNotNull)
        .select(col("kid"), explode(expr(
          """regexp_extract_all(kdesc, '((\\d+|\\.|-){5,7})', 1)""")).as("ec")),
      str(col("kid"), lit(Vocab.hasDbXref), concat(lit("EC:"), col("ec"))))

    // _process_genes_kegg2ncbi (py:636-687): gene-id equivalence
    val k2n = in("ncbi")
      .filter(coalesce(col("kegg_gene_id"), lit("")) =!= "")
      .select(concat(lit("KEGG-"), col("kegg_gene_id")).as("kegg"),
        regexp_replace(col("ncbi_gene_id"), "ncbi-geneid", "NCBIGene").as("ncbi"))
    val k2nTriples = ColumnEmit.emit(k2n,
      res(col("kegg"), lit(Vocab.a), lit(Vocab.owlClass)),
      res(col("ncbi"), lit(Vocab.a), lit(Vocab.owlClass)),
      res(col("kegg"), lit(Vocab.equivalentClass), col("ncbi")))

    // _process_pathway_pubmed (py:689-721): journal-article reference
    // is_about the pathway
    val pub = in("pubmed")
      .filter(coalesce(col("pubmed_id"), lit("")) =!= "")
      .select(upper(col("pubmed_id")).as("pmid"),
        concat(lit("KEGG-"), col("kegg_pathway_num")).as("path"))
    val pubTriples = ColumnEmit.emit(pub,
      res(col("pmid"), lit(Vocab.a), lit(Vocab.journalArticle)),
      res(col("pmid"), lit(tt.resolve("is_about")), col("path")))

    // _process_pathway_disease (py:722-760): pathway causally upstream
    // of or within the disease process
    val pd = in("ds")
      .filter(coalesce(col("disease_id"), lit("")) =!= "")
      .select(concat(lit("KEGG-"), col("kegg_pathway_num")).as("path"),
        concat(lit("KEGG-"), col("disease_id")).as("did"))
    val pdTriples = ColumnEmit.emit(pd,
      res(col("path"), lit(tt.resolve("causally upstream of or within")),
        col("did")))

    // _process_pathway_ko (py:762-792) through the Pathway model
    // (models/Pathway.py:30-86): KO class → digest gene-product bnode →
    // involved-in pathway; the bnode's rdfs:label points at the pathway
    // RESOURCE (Pathway.py:69-70 addTriple without literal flag)
    val ko = in("ko")
      .filter(coalesce(col("ko_id"), lit("")) =!= "")
      .select(concat(lit("KEGG-"), col("ko_id")).as("ko"),
        concat(lit("KEGG-"), col("pathway_id")).as("path"))
      .withColumn("gp", concat(lit("_:"), Digest.md5Id(
        concat(regexp_replace(col("ko"), ":", ""), lit("product")))))
    val koTriples = ColumnEmit.emit(ko,
      res(col("gp"), lit(Vocab.a), lit(tt.resolve("gene_product"))),
      res(col("gp"), lit(Vocab.label), col("path")),
      res(col("ko"), lit("RO:0002205"), col("gp")),
      res(col("gp"), lit(Vocab.involvedIn), col("path")))

    // _process_omim2disease (py:560-634): only 1:1 omim↔kegg disease
    // rows become equivalences — both sides' ROW counts must be exactly 1
    val o2d = in("omim")
      .filter(coalesce(col("kegg_disease_id"), lit("")) =!= "")
      .select(regexp_replace(col("omim_disease_id"), "omim", "OMIM").as("omim"),
        concat(lit("KEGG-"), trim(col("kegg_disease_id"))).as("kegg"))
    import org.apache.spark.sql.expressions.Window
    val oneToOne = o2d
      .withColumn("no", count(lit(1)).over(Window.partitionBy("omim")))
      .withColumn("nk", count(lit(1)).over(Window.partitionBy("kegg")))
      .filter(col("no") === 1 && col("nk") === 1)
    val o2dTriples = ColumnEmit.emit(oneToOne,
      res(col("kegg"), lit(Vocab.a), lit(Vocab.owlClass)),
      res(col("omim"), lit(Vocab.a), lit(Vocab.owlClass)),
      res(col("kegg"), lit(Vocab.equivalentClass), col("omim")))

    // ---- dormant-pass tiers (round-6 depth wave) ----------------------

    // label hashes consulted by _make_variant_locus_id (KEGG.py:794-822)
    val geneLabels = genes.select(col("gid"),
      trim(element_at(col("symbols"), 1)).as("glabel"))

    def altLocus(gid: Column, target: Column): Column =
      concat(lit("_:"), Digest.md5Id(concat_ws("-",
        regexp_replace(gid, ":", ""), regexp_replace(target, ":", ""),
        lit("VL"))))

    def altTriples(rows: DataFrame, target: Column): DataFrame = {
      val withIds = rows
        .withColumn("alt", altLocus(col("gid"), target))
        .withColumn("altLabel",
          when(coalesce(col("glabel"), lit("")) =!= "",
            concat(lit("some variant of "), col("glabel"),
              when(coalesce(col("dlabel"), lit("")) =!= "",
                concat(lit(" that is associated with "), col("dlabel")))
                .otherwise(lit("")))))
        .withColumn("aid", concat(lit("_:"), Digest.assocIdMd5("EX:kegg",
          col("alt"), lit(tt.resolve("is marker for")), target)))
      ColumnEmit.emitFiltered(withIds,
        res(col("alt"), lit(Vocab.a), lit(Vocab.namedIndividual)),
        str(col("alt"), lit(Vocab.label), col("altLabel")),
        res(col("alt"), lit(Vocab.a), lit(Vocab.variantLocus)),
        res(col("alt"), lit(Vocab.hasAffectedLocus), col("gid")),
        ColumnEmit.typed(col("alt"), lit(tt.resolve("is_anonymous")),
          lit("true"), "xsd:boolean"),
        res(col("alt"), lit(tt.resolve("is marker for")), target),
        res(col("aid"), lit(Vocab.a), lit(Vocab.association)),
        res(col("aid"), lit(Vocab.assocHasSubject), col("alt")),
        res(col("aid"), lit(Vocab.assocHasPredicate),
          lit(tt.resolve("is marker for"))),
        res(col("aid"), lit(Vocab.assocHasObject), target))
    }

    // _process_kegg_disease2gene (KEGG.py:392-464): disease→gene rows
    // for diseases with NO omim mapping (the kegg_disease_hash guard)
    // and no 'includ'-marked grouping label; the association subject is
    // the anonymous alternate variant locus, not the wildtype gene
    val d2gTriples = in.get("disease_gene").map { dg =>
      val keggWithOmim = o2d.select(col("kegg").as("did")).distinct()
      val rows = dg.filter(coalesce(col("gene_id"), lit("")) =!= "")
        .select(concat(lit("KEGG-"), trim(col("gene_id"))).as("gid"),
          concat(lit("KEGG-"), trim(col("disease_id"))).as("did"))
        .join(broadcast(keggWithOmim), Seq("did"), "left_anti")
        .join(broadcast(diseases), Seq("did"), "left")
        .join(broadcast(geneLabels), Seq("gid"), "left")
        .filter(!coalesce(col("dlabel"), lit("")).contains("includ"))
      ColumnEmit.emitFiltered(rows,
        res(col("did"), lit(Vocab.a), lit(Vocab.owlClass)),
        str(col("did"), lit(Vocab.label), col("dlabel")))
        .union(altTriples(rows, col("did")))
    }

    // _process_omim2gene (KEGG.py:466-559): equivalent links become
    // gene x-refs gated on the OMIM entry type being a gene; reverse
    // links become disease→alt-locus marker associations; original
    // links are logged and skipped (the omim_replaced remap needs the
    // OMIM source's moved-id state and is documented as absent)
    val o2gTriples = in.get("omim2gene").map { og =>
      val omimGeneSet = in.get("omim_types")
        .map(_.filter(col("omim_type") === Vocab.gene)
          .select(col("omim_id").as("omim0")).distinct()
          .withColumn("isGene", lit(true)))
      val base = og.filter(coalesce(col("kegg_gene_id"), lit("")) =!= "")
        .select(concat(lit("KEGG-"), trim(col("kegg_gene_id"))).as("gid"),
          regexp_replace(col("omim_id"), "omim", "OMIM").as("omim"),
          col("link_type"))
      val equiv0 = base.filter(col("link_type") === "equivalent")
      val equiv = omimGeneSet match {
        case Some(g) => equiv0.join(broadcast(g),
          equiv0("omim") === g("omim0"), "left")
        case None => equiv0.withColumn("isGene", lit(false))
      }
      val equivTriples = ColumnEmit.emitFiltered(equiv,
        res(col("omim"), lit(Vocab.a), lit(Vocab.owlClass)),
        res(col("gid"), lit(Vocab.a), lit(Vocab.gene)),
        res(col("gid"), lit(Vocab.equivalentClass),
          when(col("isGene") === true, col("omim"))))
      val reverse = base.filter(col("link_type") === "reverse")
        .join(broadcast(geneLabels), Seq("gid"), "left")
        .withColumn("dlabel", lit(null).cast("string"))
      equivTriples.union(altTriples(reverse, col("omim")))
    }

    val core = pathwayTriples.union(diseaseTriples)
      .union(geneTriples).union(geneSynonyms)
      .union(okcTriples).union(okcSynonyms).union(okcXrefs)
      .union(k2nTriples).union(pubTriples).union(pdTriples)
      .union(koTriples).union(o2dTriples)
    (d2gTriples.toSeq ++ o2gTriples.toSeq).foldLeft(core)(_ union _)
  }

  override def testIds: Seq[String] = Seq("KEGG-ds:H00409", "KEGG-path:map04130")
}
