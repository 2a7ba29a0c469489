package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.{Digest, Vocab}
import graft.emit.ColumnEmit
import graft.emit.ColumnEmit.{res, str}

/** The NCBIGene-shape ingest (dipper/sources/NCBIGene.py): the gene
  * dimension every other ingest joins against. `gene_info` rows become
  * typed gene classes (`type_of_gene` resolved through the ncbigene
  * local table, NCBIGene.py:269-291) with label/description/taxon; the
  * `gene_group` sidecar is the vertebrate-orthology relation consumed by
  * the cross-source augmentation ([[Runner.augmentations]]) — the
  * reference exposes it as `add_orthologs_by_gene_group`
  * (NCBIGene.py:676-769), a convenience method *other* parsers call.
  *
  * Scale shape: the solo transform is a single pass over gene_info
  * (no shuffle — emission is an explode over projected columns);
  * orthology derivation is two joins where the annotated-gene side is
  * broadcast (see [[orthologTriples]]).
  */
object NcbiGeneSource extends GraftSource {
  val name = "ncbi_gene"

  private def schemaOf(cols: String*): StructType =
    StructType(cols.map(StructField(_, StringType)))

  /** gene_info / gene_group column lists: NCBIGene.py:46-100. */
  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] =
    graft.sources.DelimitedSource.readManifest(spark, Map(
      "gene_info" -> graft.sources.SourceFile(s"$dataDir/gene_info.tsv",
        schemaOf("tax_id", "GeneID", "Symbol", "description", "type_of_gene")),
      "gene_group" -> graft.sources.SourceFile(s"$dataDir/gene_group.tsv",
        schemaOf("tax_id", "GeneID", "relationship",
          "Other_tax_id", "Other_GeneID"))))

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame =
    transform(spark, in, Nil)

  /** Gene dimension: class + subClassOf(resolved type) + label (NEWENTRY
    * rows unlabeled, NCBIGene.py:272-275) + description + in_taxon, with
    * the reference's taxon constraint pushed into the scan
    * (NCBIGene.py:265-266 `tax_num not in self.tax_ids → skip`). */
  override def transform(spark: SparkSession, in: Map[String, DataFrame],
                         taxa: Seq[String]): DataFrame = {
    val tt = graft.core.TranslationTable.forSource("ncbigene")
    val base = in("gene_info")
      .filter(coalesce(col("GeneID"), lit("")) =!= "")
    val scoped =
      if (taxa.isEmpty) base else base.filter(col("tax_id").isin(taxa: _*))
    val rows = scoped.select(
      concat(lit("NCBIGene:"), col("GeneID")).as("gid"),
      when(col("Symbol") === "NEWENTRY", lit(null).cast("string"))
        .otherwise(col("Symbol")).as("symbol"),
      when(coalesce(col("description"), lit("-")) === "-",
        lit(null).cast("string")).otherwise(col("description")).as("desc"),
      tt.resolveCol(col("type_of_gene")).as("gtype"),
      concat(lit("NCBITaxon:"), col("tax_id")).as("tax"))
    ColumnEmit.emitFiltered(rows,
      res(col("gid"), lit(Vocab.a), lit(Vocab.owlClass)),
      res(col("gid"), lit(Vocab.subClassOf), col("gtype")),
      str(col("gid"), lit(Vocab.label), col("symbol")),
      str(col("gid"), lit(Vocab.description), col("desc")),
      res(col("gid"), lit(Vocab.inTaxon), col("tax")),
      res(col("tax"), lit(Vocab.a), lit(Vocab.owlClass)))
  }

  /** The ortholog augmentation (NCBIGene.py:676-769): for each annotated
    * gene, walk gene → group lead(s) → group members and emit a reified
    * `in orthology relationship with` association per (gene, member)
    * pair, typing each member and its taxon; the group lead is a member
    * of its own group (py:742-743) and `PMID:24063302` decorates every
    * association (py:760).
    *
    * Join shape for 100 TB posture: `annotated` is the bounded small
    * side (the genes one source's phene table mentions — thousands, not
    * the full gene universe), so it is broadcast into the gene→group
    * probe; the (annotated × group) product stays |annotated|-bounded
    * and is broadcast again into the member expansion — gene_group
    * (~10⁷ rows in production) is never shuffled.
    *
    * @param annotated one column `gene` of NCBIGene CURIEs
    */
  def orthologTriples(spark: SparkSession, annotated: DataFrame,
                      geneGroup: DataFrame): DataFrame = {
    val ortho = geneGroup
      .filter(col("relationship") === "Ortholog")
      .select(col("GeneID").as("grp"), col("tax_id").as("gtax"),
        col("Other_GeneID").as("member"), col("Other_tax_id").as("mtax"))
    // group lead is a member of its own group (group_to_orthology[gene_a]
    // gains gene_a, NCBIGene.py:742-743)
    val members = ortho.select(col("grp"), col("member"), col("mtax"))
      .union(ortho.select(col("grp"), col("grp").as("member"),
        col("gtax").as("mtax")))
      .distinct()
    // gene_to_group is keyed by the non-lead side only (py:734-736)
    val geneToGroup = ortho.select(col("member").as("gnum"), col("grp")).distinct()
    val ann = annotated
      .select(regexp_replace(col("gene"), "^NCBIGene:", "").as("gnum"))
      .distinct()
    val pairs = geneToGroup.join(broadcast(ann), "gnum")
    val expanded = members.join(broadcast(pairs), "grp")
      .select(concat(lit("NCBIGene:"), col("gnum")).as("gid"),
        concat(lit("NCBIGene:"), col("member")).as("oid"),
        concat(lit("NCBITaxon:"), col("mtax")).as("otax"))
      .distinct()
    val assoc = ColumnEmit.assocReified(expanded, "EX:omia",
      col("gid"), lit(Vocab.inOrthologyRelationshipWith), col("oid"),
      source = Some("PMID:24063302"))
    val classes = ColumnEmit.emit(expanded.select("oid", "otax").distinct(),
      res(col("oid"), lit(Vocab.a), lit(Vocab.owlClass)),
      res(col("oid"), lit(Vocab.inTaxon), col("otax")))
    assoc.union(classes)
  }

  override def testIds: Seq[String] = Seq("NCBIGene:493963")
}

/** The full OMIA-shape ingest (dipper/sources/OMIA.py) — the reference's
  * only THREE-SOURCE integration: OMIA's XML dump drives breeds, phenes
  * and associations; the OMIM mimTitles sidecar types the omim ids so
  * only disease/phenotype entries survive into `is model of`
  * associations (clean_up_omim_genes, OMIA.py:718-768); and the NCBI
  * gene_group sidecar adds orthology for the annotated genes — wired
  * through [[Runner.augmentations]] the way the reference wires
  * `self.ncbi.add_orthologs_by_gene_group(self.graph, self.annotated_genes)`
  * (OMIA.py:172). The cross-source floor (`tests/omia-integration.py`:
  * ≥175 model-of pairs + the named OMIA-breed:758 → OMIM:305100 pair) is
  * asserted in EngineSpec against the golden corpus.
  *
  * Scale shape: every join keys on a dimension (species, phene, breed,
  * kept-omim set — all bounded), so each is broadcast-able and the fact
  * relations (Breed_Phene, Phene_Gene) stream map-side; emission is
  * columnar (whole-stage codegen, digests hoisted).
  */
object OmiaSource extends GraftSource {
  val name = "omia"

  private def schemaOf(cols: String*): StructType =
    StructType(cols.map(StructField(_, StringType)))

  /** Widen-and-share barrier (the p08 ScanStats guard): joined fact
    * relations inherit the scan's split count, serializing the emit
    * stages at test SF; the repartition also becomes the one Exchange
    * every downstream consumer reuses. */
  private def widen(df: DataFrame): DataFrame =
    graft.operators.ScanStats.widen(df)

  /** XML dump tables (OMIA.py:140-143 table list; the same landed
    * `omia_dump.xml` the omia_phenes source scans) + the OMIM mimTitles
    * sidecar (OMIMSource.py:126-236 — landed by the OMIM fetch stage,
    * read here the way the reference reads `self.omim.omim_type`). */
  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = {
    val dump = Seq(s"$dataDir/omia_dump.xml")
    def xml(table: String, cols: String*): DataFrame =
      graft.sources.XmlDumpSource.read(spark, dump, table, cols)
    Map(
      "species" -> xml("Species_gb", "gb_species_id", "sci_name",
        "com_name"),
      "articles" -> xml("Articles", "article_id", "title", "year",
        "journal", "pubmed_id"),
      "article_breed" -> xml("Article_Breed", "article_id", "breed_id"),
      "article_phene" -> xml("Article_Phene", "article_id", "phene_id"),
      "lida_links" -> xml("Lida_Links", "omia_id", "lidaurl"),
      "omia_group" -> xml("OMIA_Group", "omia_id", "group_name",
        "group_summary", "group_category"),
      "group_mpo" -> xml("Group_MPO", "omia_id", "MPO_no"),
      "breed" -> xml("Breed", "breed_id", "breed_name", "gb_species_id"),
      "phene" -> xml("Phene", "phene_id", "omia_id", "phene_name",
        "gb_species_id", "summary"),
      "breed_phene" -> xml("Breed_Phene", "breed_id", "phene_id"),
      "omim_xref" -> xml("Omim_Xref", "omia_id", "omim_id"),
      "phene_gene" -> xml("Phene_Gene", "phene_id", "gene_id"),
      "genes" -> xml("Genes_gb", "gene_id", "gb_species_id", "symbol",
        "gene_type"),
      "omim_types" -> graft.sources.DelimitedSource.read(spark,
        graft.sources.SourceFile(s"$dataDir/mimTitles.tsv",
          schemaOf("prefix", "mim_number", "preferred_title"))))
  }

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame =
    transform(spark, in, Nil)

  override def transform(spark: SparkSession, in: Map[String, DataFrame],
                         taxa: Seq[String]): DataFrame = {
    def scope(df: DataFrame): DataFrame =
      if (taxa.isEmpty) df else df.filter(col("gb_species_id").isin(taxa: _*))

    val species0 = in("species")
      .filter(coalesce(col("gb_species_id"), lit("")) =!= "")
    // com_name arrived with the wave-2 dump read; partial input maps
    // (the p11 derivation) may omit the column entirely
    val comName =
      if (species0.columns.contains("com_name"))
        when(coalesce(col("com_name"), lit("")) =!= "", col("com_name"))
      else lit(null).cast("string")
    val species = species0.select(col("gb_species_id").as("spid"),
      col("sci_name"), comName.as("com_name"),
      coalesce(comName, col("sci_name")).as("slabel"))

    // species classes with scientific-name labels + common-name synonym;
    // the reference's label_hash — which the breed labels read — prefers
    // the common name (_process_species_table_row OMIA.py:293-307)
    val speciesTriples = ColumnEmit.emitFiltered(species,
      res(concat(lit("NCBITaxon:"), col("spid")), lit(Vocab.a),
        lit(Vocab.owlClass)),
      str(concat(lit("NCBITaxon:"), col("spid")), lit(Vocab.label),
        col("sci_name")),
      str(concat(lit("NCBITaxon:"), col("spid")),
        lit(Vocab.hasExactSynonym), col("com_name")))

    // breeds: named individuals typed by taxon, labeled
    // "breed (species sci name)" (_process_breed_row OMIA.py:309-333)
    val breeds = scope(in("breed"))
      .filter(coalesce(col("breed_id"), lit("")) =!= "")
      .join(species, col("gb_species_id") === col("spid"), "left")
      .select(col("breed_id").as("bkey"),
        concat(lit("OMIA-breed:"), col("breed_id")).as("breed"),
        when(col("slabel").isNotNull,
          concat(col("breed_name"), lit(" ("), col("slabel"), lit(")")))
          .otherwise(col("breed_name")).as("blabel"),
        concat(lit("NCBITaxon:"), col("gb_species_id")).as("btax"))
    val breedTriples = ColumnEmit.emitFiltered(breeds,
      res(col("breed"), lit(Vocab.a), lit(Vocab.namedIndividual)),
      res(col("breed"), lit(Vocab.a), col("btax")),
      str(col("breed"), lit(Vocab.label), col("blabel")))

    // species-specific phene classes (_process_phene_row; the same shape
    // omia_phenes proves solo — re-derived here because every
    // association below joins through this relation)
    val phene = scope(in("phene"))
      .filter(coalesce(col("omia_id"), lit("")) =!= "" &&
        coalesce(col("gb_species_id"), lit("")) =!= "")
      .select(col("phene_id").as("pkey"),
        concat(lit("OMIA:"), col("omia_id")).as("omia"),
        concat(lit("OMIA:"), col("omia_id"), lit("-"),
          col("gb_species_id")).as("spPhene"),
        when(length(coalesce(col("phene_name"), lit(""))) > 0,
          col("phene_name")).as("plabel"),
        when(length(coalesce(col("summary"), lit(""))) > 0,
          col("summary")).as("psummary"),
        concat(lit("NCBITaxon:"), col("gb_species_id")).as("ptax"))
    val pheneTriples = ColumnEmit.emitFiltered(phene,
      res(col("spPhene"), lit(Vocab.a), lit(Vocab.owlClass)),
      str(col("spPhene"), lit(Vocab.label), col("plabel")),
      res(col("spPhene"), lit(Vocab.subClassOf), col("omia")),
      str(col("spPhene"), lit(Vocab.description), col("psummary")),
      res(col("spPhene"), lit(Vocab.inTaxon), col("ptax")))

    // omia → omim xrefs: ALL mappings xref (py:701), only
    // phenotype-typed omims survive into the model-of map
    // (clean_up_omim_genes py:718-768: mimTitles prefix Plus /
    // Number Sign / Percent resolve to has_affected_feature / phenotype
    // / heritable_phenotypic_marker — the kept trio; Asterisk=gene,
    // NULL=Suspected and Caret=obsolete drop. The reference's MOVED-TO
    // replacement pass is observably a no-op on the emitted map — a
    // moved id is never re-added — so it is not re-modeled here.)
    // Omim_Xref is a MAPPING relation — distinct before anything joins
    // it: duplicated xref rows multiply straight through the breed-phene
    // ⋈ xref model-of join below (measured 9× redundant pre-dedup volume
    // on the p11 derivation, ~10M junk triples at sf0.1), and the graph
    // is a set either way
    val xref = in("omim_xref")
      .filter(coalesce(col("omia_id"), lit("")) =!= "" &&
        coalesce(col("omim_id"), lit("")) =!= "")
      .select(concat(lit("OMIA:"), col("omia_id")).as("omia"),
        col("omim_id").as("omim_num"))
      .distinct()
    val xrefTriples = ColumnEmit.emit(xref,
      str(col("omia"), lit(Vocab.hasDbXref),
        concat(lit("OMIM:"), col("omim_num"))))
    val keptOmims = in("omim_types")
      .filter(col("prefix").isin("Plus", "Number Sign", "Percent"))
      .select(col("mim_number").as("omim_num"))
      .distinct()
    val cleaned = xref.join(broadcast(keptOmims), "omim_num")
      .select(col("omia"), concat(lit("OMIM:"), col("omim_num")).as("omim"))

    // breed–phene associations (_process_breed_phene_row py:566-633):
    // breed has_phenotype spPhene, plus breed IS MODEL OF each cleaned
    // omim of the phene's omia id, with descendant-evidence and the
    // "High incidence of ..." description. The widen barrier after the
    // broadcast joins does double duty: (1) the probe side inherits the
    // fact scan's split count, so without it every downstream emit
    // (concat + md5 per triple) serializes on 1-2 cores at test SF;
    // (2) the repartition is an Exchange the two consumers (bpAssoc and
    // the model-of join) share via ReuseExchange — the join tree runs
    // once, not per branch.
    // persisted as well as widened: bpAssoc and the model-of join are
    // separate union arms — without the materialization each re-runs
    // the join tree from the scans
    val bp = widen(in("breed_phene")
      .select(col("breed_id").as("bkey"), col("phene_id").as("pkey"))
      .join(breeds, "bkey").join(phene, "pkey")).persist()
    val bpAssoc = ColumnEmit.assocReified(bp, "EX:omia",
      col("breed"), lit(Vocab.hasPhenotype), col("spPhene"))
    val mo = bp.join(cleaned, "omia")
    val pred = lit(Vocab.isModelOf)
    val spLabel = regexp_extract(col("blabel"), "\\((.*)\\)", 1)
    // strip " in <species>" from the phene label when it ends with the
    // breed's parenthesized species (py:614-620; literal replace rather
    // than the reference's regex substitution — identical on real labels)
    val plabelClean = when(length(spLabel) > 0 &&
        col("plabel").endsWith(spLabel),
      replace(col("plabel"), concat(lit(" in "), spLabel), lit("")))
      .otherwise(col("plabel"))
    val desc = concat(lit("High incidence of "),
      coalesce(plabelClean, lit("phenotype")), lit(" in "),
      coalesce(col("blabel"), lit("this breed")),
      lit(" suggests it to be a model of disease "), col("omim"), lit("."))
    // dedup the model-of relation BEFORE the 7-triple explode: distinct
    // breed-phene rows sharing (breed, omia-label) collapse to the same
    // (breed, omim, desc) association, and deduping 1/7th of the rows on
    // narrow columns here is strictly cheaper than pushing the repeats
    // through the emit into the graph-level set-dedup
    val moPre = mo.select(col("breed").as("__s"), col("omim").as("__o"),
      desc.as("__d"),
      concat(lit("_:"), Digest.md5Id(concat_ws("+",
        lit("EX:omia"), col("breed"), pred, col("omim")))).as("__aid"))
      .dropDuplicates("__s", "__o", "__d")
    val moTriples = ColumnEmit.emit(moPre,
      res(col("__s"), pred, col("__o")),
      res(col("__aid"), lit(Vocab.a), lit(Vocab.association)),
      res(col("__aid"), lit(Vocab.assocHasSubject), col("__s")),
      res(col("__aid"), lit(Vocab.assocHasPredicate), pred),
      res(col("__aid"), lit(Vocab.assocHasObject), col("__o")),
      res(col("__aid"), lit(Vocab.hasEvidence), lit("ECO:0000214")),
      str(col("__aid"), lit(Vocab.description), col("__d")))

    // gene classes (_process_gene_row py:513-526: Genes_gb.gene_id IS
    // the NCBI gene number)
    val tt = graft.core.TranslationTable.forSource("ncbigene")
    val genes = in("genes")
      .filter(coalesce(col("gene_id"), lit("")) =!= "")
      .select(col("gene_id").as("gkey"),
        concat(lit("NCBIGene:"), col("gene_id")).as("gid"),
        col("symbol"),
        when(coalesce(col("gene_type"), lit("")) =!= "",
          tt.resolveCol(col("gene_type"))).as("gtype"),
        concat(lit("NCBITaxon:"), col("gb_species_id")).as("gtax"))
    val geneTriples = ColumnEmit.emitFiltered(genes,
      res(col("gid"), lit(Vocab.a), lit(Vocab.owlClass)),
      str(col("gid"), lit(Vocab.label), col("symbol")),
      res(col("gid"), lit(Vocab.subClassOf), col("gtype")),
      res(col("gid"), lit(Vocab.inTaxon), col("gtax")))

    // phene–gene associations (_process_phene_gene_row py:647-679):
    // a "some variant of <gene>" allele bnode, allele-of + affected-locus
    // links, and a G2P association to the species phene. The affected-
    // locus objects are the `annotated_genes` set the NCBI ortholog
    // augmentation consumes (py:679 + py:172).
    val pg = widen(in("phene_gene")
      .select(col("phene_id").as("pkey"), col("gene_id").as("gkey"))
      .join(genes, "gkey").join(phene, "pkey"))
      .withColumn("vid", concat(lit("_:"),
        Digest.md5Id(concat(col("gkey"), lit("VL")))))
    val pgTriples = ColumnEmit.emitFiltered(pg,
      res(col("vid"), lit(Vocab.a), lit(Vocab.allele)),
      str(col("vid"), lit(Vocab.label),
        concat(lit("some variant of "), col("symbol"))),
      res(col("vid"), lit(Vocab.isAlleleOf), col("gid")),
      res(col("vid"), lit(Vocab.hasAffectedLocus), col("gid")))
    val pgAssoc = ColumnEmit.assocReified(pg, "EX:omia",
      col("vid"), lit(Vocab.hasPhenotype), col("spPhene"))

    // ---- wave 2: article dictionary, group taxonomy, literature links,
    // LIDA xrefs, group-MP associations (round-6 extension) --------------

    val extra = Seq.newBuilder[DataFrame]

    // article dictionary (_process_article_row OMIA.py:447-471):
    // internal '_:omiaarticlekey<id>' bnodes (the reference's literal
    // _make_internal_id concatenation, OMIA.py:790-792 — NOT a digest),
    // journal-article typing when a journal is named, title-as-label,
    // PMID equivalence with the internal key echoed as a comment. The
    // id_hash that the is-about passes read prefers the PMID.
    val articles = in.get("articles").map { a =>
      a.filter(coalesce(col("article_id"), lit("")) =!= "")
        .select(col("article_id").as("akey"),
          concat(lit("_:omiaarticlekey"), col("article_id")).as("iart"),
          when(coalesce(col("title"), lit("")) =!= "",
            trim(col("title"))).as("title"),
          (coalesce(col("journal"), lit("")) =!= "").as("isJournal"),
          when(coalesce(col("pubmed_id"), lit("")) =!= "",
            concat(lit("PMID:"), col("pubmed_id"))).as("pmid"))
        .withColumn("aref", coalesce(col("pmid"), col("iart")))
    }
    articles.foreach { art =>
      extra += ColumnEmit.emitFiltered(art,
        res(col("iart"), lit(Vocab.a), lit(Vocab.namedIndividual)),
        res(col("iart"), lit(Vocab.a),
          when(col("isJournal"), lit(Vocab.journalArticle))
            .otherwise(lit("IAO:0000310"))),
        str(col("iart"), lit(Vocab.label), col("title")),
        str(col("iart"), lit("dc:title"), col("title")),
        res(col("iart"), lit(Vocab.sameAs), col("pmid")),
        str(col("pmid"), lit(Vocab.comment),
          when(col("pmid").isNotNull,
            concat(lit("omiaarticlekey"), col("akey")))))
    }

    // article → breed literature links (_process_article_breed_row
    // OMIA.py:528-544): is-about through the article id_hash
    for (art <- articles; ab <- in.get("article_breed"))
      extra += ColumnEmit.emit(ab
        .select(col("article_id").as("akey"), col("breed_id").as("bkey"))
        .join(broadcast(art.select(col("akey"), col("aref"))), Seq("akey"))
        .join(broadcast(breeds.select(col("bkey"), col("breed"))),
          Seq("bkey")),
        res(col("aref"), lit("IAO:0000136"), col("breed")))

    // article → species-phene links (_process_article_phene_row
    // OMIA.py:546-564). The reference's guard reads `if self.test_mode
    // or omia_id not in self.test_ids[...]` — an inverted conjunction
    // that suppresses the pass outside its test fixture; the documented
    // intent (article is-about phene) is emitted here.
    for (art <- articles; ap <- in.get("article_phene"))
      extra += ColumnEmit.emit(ap
        .select(col("article_id").as("akey"), col("phene_id").as("pkey"))
        .join(broadcast(art.select(col("akey"), col("aref"))), Seq("akey"))
        .join(broadcast(phene.select(col("pkey"), col("spPhene"))),
          Seq("pkey")),
        res(col("aref"), lit("IAO:0000136"), col("spPhene")))

    // LIDA links (_process_lida_links_row OMIA.py:635-646): the URL
    // rides as a urllib-quoted literal xref
    in.get("lida_links").foreach { ll =>
      import spark.implicits._
      val ts = ll.filter(coalesce(col("omia_id"), lit("")) =!= "" &&
          coalesce(col("lidaurl"), lit("")) =!= "")
        .select(col("omia_id"), col("lidaurl"))
        .as[(String, String)]
        .map { case (omiaId, url) =>
          // urllib.parse.quote semantics (safe='/'): '/' and '~' stay,
          // ':' → %3A, '*' → %2A, space → %20 — so 'http://x' becomes
          // 'http%3A//x', exactly the reference's literal
          val quoted = java.net.URLEncoder.encode(url, "UTF-8")
            .replace("+", "%20").replace("%2F", "/")
            .replace("*", "%2A").replace("%7E", "~")
          graft.core.Triple.str(s"OMIA:$omiaId", Vocab.hasDbXref, quoted)
        }
      extra += ts.toDF()
    }

    // OMIA group taxonomy (_process_omia_group_row OMIA.py:472-511):
    // the group class with name/summary under its category's disease
    // superclass (group_category → localtt → global, defaulting to
    // 'disease or disorder'); an embryonic-lethality category adds a
    // D2P association on top of the subclass edge
    in.get("omia_group").foreach { og =>
      val localTt = graft.core.TranslationTable.forSource("omia")
      val catCol = concat(lit("group_category:"),
        when(coalesce(col("group_category"), lit("")) === "", lit("None"))
          .otherwise(col("group_category")))
      val groups = og.filter(coalesce(col("omia_id"), lit("")) =!= "")
        .select(concat(lit("OMIA:"), col("omia_id")).as("omia"),
          when(coalesce(col("group_name"), lit("")) =!= "",
            col("group_name")).as("gname"),
          when(coalesce(col("group_summary"), lit("")) =!= "",
            col("group_summary")).as("gsummary"),
          coalesce(localTt.resolveCol(catCol),
            lit("MONDO:0000001")).as("disease"))
        .withColumn("disease",
          when(col("disease").startsWith("group_category:"),
            lit("MONDO:0000001")).otherwise(col("disease")))
      extra += ColumnEmit.emitFiltered(groups,
        res(col("disease"), lit(Vocab.a), lit(Vocab.owlClass)),
        res(col("omia"), lit(Vocab.a), lit(Vocab.owlClass)),
        str(col("omia"), lit(Vocab.label), col("gname")),
        str(col("omia"), lit(Vocab.description), col("gsummary")),
        res(col("omia"), lit(Vocab.subClassOf), col("disease")))
      extra += ColumnEmit.assocReified(
        groups.filter(col("disease") === "MP:0008762"), "EX:omia",
        col("omia"), lit(Vocab.hasPhenotype), col("disease"))
    }

    // group → MP associations (_process_group_mpo_row OMIA.py:681-692):
    // zero-padded MP ids through the default D2P association
    in.get("group_mpo").foreach { gm =>
      extra += ColumnEmit.assocReified(
        gm.filter(coalesce(col("omia_id"), lit("")) =!= "" &&
            coalesce(col("MPO_no"), lit("")) =!= "")
          .select(concat(lit("OMIA:"), col("omia_id")).as("omia"),
            concat(lit("MP:"), lpad(col("MPO_no"), 7, "0")).as("mpo")),
        "EX:omia", col("omia"), lit(Vocab.hasPhenotype), col("mpo"))
    }

    (Seq(speciesTriples, breedTriples, pheneTriples, xrefTriples,
      bpAssoc, moTriples, geneTriples, pgTriples, pgAssoc) ++
      extra.result()).reduce(_ union _)
  }

  override def testIds: Seq[String] = Seq("OMIA-breed:758", "OMIA:000419")
}
