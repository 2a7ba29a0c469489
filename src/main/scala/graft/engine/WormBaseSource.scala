package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.{Digest, FlatYaml, TranslationTable, Vocab}
import graft.emit.ColumnEmit
import graft.emit.ColumnEmit.{res, str => strT, typed => typedT}

/** The WormBase ingest (dipper/sources/WormBase.py) — the five tiers the
  * reference's `parse` actually runs (py:304-311; pub_xrefs and
  * gene_interaction are present-but-disabled there and likewise omitted):
  *
  *  - `geneIDs` (py:316-362): the gene dimension — class + symbol (with
  *    synonym fallback), synonym, taxon, Dead→deprecation;
  *  - `phenotype_association.wb` GAF (py:411-572): variant/RNAi
  *    phenotype annotations with the reference's REF⇄WITH unswap (GOA
  *    forbids persons in the reference column, so WBVar/WBRNAi ids and
  *    WBPerson refs arrive swapped), pipe fan-out over the allele list,
  *    WBRNAi→reagent-targeted-gene vs WBVar→sequence-alteration routing,
  *    gaf-eco evidence, person refs typed foaf:Person with
  *    background-knowledge evidence;
  *  - `rnai_phenotypes.wb` (py:574-649): space-separated
  *    `WBRNAi|WBPaper` sets per gene → RNAi reagent individuals
  *    targeting the gene, digest reagent-targeted-gene alleles
  *    (`make_reagent_targeted_gene_id`), and their phenotype
  *    associations;
  *  - `annotations.gff3` (py:689-853): the 12 kept feature types —
  *    attribute-bag ids (`ID` → WBGene/WBVar/WBsf rewrite, `variation`
  *    fallback with substitution/insertion descriptions, `Name` WBsf
  *    fallback), polymorphism skip, biotype-resolved gene classes vs
  *    individually-typed features, chromosome instances in the WS build,
  *    and FALDO positions — the reference anchors BOTH ends at `start`
  *    (py:830-831), kept verbatim;
  *  - `disease_association.wb` GAF (py:854-901): gene-level
  *    `is model of` associations.
  *
  * Deviations (documented): rows the reference crashes on (person-swap
  * leaving no allele column, non-2-part RNAi pairs, gaf-eco misses in
  * the disease tier) are dropped or lose only the broken decoration;
  * the `Name`-vs-id containment test uses substring containment where
  * the reference interprets the name as a regex; the GFF `Alias`
  * synonym loop is the reference's other_name-only bug, mirrored;
  * region bnodes use the engine digest scheme without region labels.
  *
  * Scale shape: every tier is scan → project → explode; the only
  * non-map stage is the final set-dedup. The gene dimension is NOT
  * joined against (the reference never needs it either) — tiers stay
  * independently parallel over arbitrarily large files.
  */
object WormBaseSource extends GraftSource {
  val name = "wormbase"
  private val definedBy = "EX:wormbase"

  val gafColumns: Seq[String] = Seq("DB", "DB_Object_ID", "DB_Object_Symbol",
    "Qualifier", "GO_ID", "DB_Reference", "Evidence_Code", "With_or_From",
    "Aspect", "DB_Object_Name", "DB_Object_Synonym", "DB_Object_Type",
    "Taxon", "Date", "Assigned_By", "Annotation_Extension",
    "Gene_Product_Form_ID")

  private val keptFeatureTypes = Seq("gene", "point_mutation", "deletion",
    "RNAi_reagent", "duplication", "enhancer", "binding_site",
    "biological_region", "complex_substitution", "substitution",
    "insertion", "inverted_repeat")

  private def schemaOf(names: Seq[String]) =
    StructType(names.map(StructField(_, StringType)))

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = {
    def scan(glob: String, sep: String, cols: Seq[String],
             comment: Option[Char] = None) = {
      val r = spark.read.option("sep", sep).schema(schemaOf(cols))
      comment.fold(r)(c => r.option("comment", c.toString))
        .csv(s"$dataDir/$glob")
    }
    // WS build number probed from the CHECKSUMS file (py:279-287)
    val checksums = new java.io.File(dataDir, "CHECKSUMS")
    val build =
      if (checksums.exists())
        "\\.(WS\\d+)".r.findFirstMatchIn(
          java.nio.file.Files.readString(checksums.toPath))
          .map(_.group(1)).getOrElse("WScurrent")
      else "WScurrent"
    Map(
      "gene_ids" -> scan("*geneIDs*", ",",
        Seq("taxon_num", "gene_num", "gene_symbol", "gene_synonym", "live",
          "gene_type")),
      "allele_pheno" -> scan("phenotype_association*", "\t", gafColumns,
        comment = Some('!')),
      "rnai_pheno" -> scan("rnai_phenotypes*", "\t",
        Seq("gene_num", "gene_alt_symbol", "phenotype_label", "phenotype_id",
          "rnai_and_refs")),
      "feature_loc" -> scan("*annotations.gff3*", "\t",
        Seq("seqid", "source", "ftype", "start", "end", "score", "strand",
          "phase", "attributes"), comment = Some('#'))
        .withColumn("build", lit(build)),
      "disease_assoc" -> scan("disease_association*", "\t", gafColumns,
        comment = Some('!'))) ++
      // pub_xrefs is present-but-disabled in the reference's parse
      // (WormBase.py:650-688, commented out of py:306-313) — exposed
      // here as an OPT-IN input: the tier runs only when the file is
      // landed, so default runs match the reference's output exactly
      (if (new java.io.File(dataDir, "pub_xrefs.txt").exists())
         Map("pub_xrefs" -> scan("pub_xrefs.txt", "\t",
           Seq("wb_ref", "xref")))
       else Map.empty) ++
      // gene_interaction is IN-PROGRESS upstream (py:903-981) and
      // gene_desc 'currently unsupported' (py:364-409) — both landed as
      // OPT-IN tiers like pub_xrefs: present file ⇒ reference-faithful
      // emission, absent ⇒ byte-identical default output. The 12th
      // interaction column exists only to detect >2-participant rows
      // (the reference's num_interactors != 2 skip).
      (if (new java.io.File(dataDir, "gene_interactions.txt").exists())
         Map("gene_interaction" -> scan("gene_interactions.txt", "\t",
           Seq("interaction_num", "interaction_type",
             "interaction_subtype", "summary", "citation", "a_id",
             "a_name", "a_role", "b_id", "b_name", "b_role", "overflow"),
           comment = Some('#')))
       else Map.empty) ++
      (if (new java.io.File(dataDir, "gene_descriptions.txt").exists())
         Map("gene_desc" -> scan("gene_descriptions.txt", "\t",
           Seq("gene_num", "public_name", "molecular_name",
             "concise_description", "provisional_description",
             "detailed_description", "automated_description",
             "gene_class_description"), comment = Some('#')))
       else Map.empty)
  }

  private lazy val gafEco: Map[String, String] =
    FlatYaml.fromResource("/graft/gaf_eco.yaml")

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    val g = TranslationTable.default
    val tt = TranslationTable.forSource("wormbase")
    val ecoM = typedLit(gafEco)
    val rtgType = g.resolve("reagent_targeted_gene")
    val exprVariantOf = g.resolve("is_expression_variant_of")
    val targetsGene = g.resolve("targets_gene")
    val isTargetedBy = g.resolve("is_targeted_by")
    val rnaiReagent = g.resolve("RNAi_reagent")
    val bgKnowledge = g.resolve("inference from background scientific knowledge")

    def clean(c: Column) = trim(coalesce(c, lit("")))

    // ---- geneIDs tier (py:316-362) --------------------------------------
    val genes = graft.operators.ScanStats.widen(in("gene_ids"))
      .filter(clean(col("gene_num")) =!= "")
      .select(clean(col("taxon_num")).as("taxNum"),
        clean(col("gene_num")).as("gnum"),
        clean(col("gene_symbol")).as("sym"),
        clean(col("gene_synonym")).as("syn"),
        clean(col("live")).as("live"))
      .withColumn("gene", concat(lit("WormBase:"), col("gnum")))
      .withColumn("label",
        when(col("sym") =!= "", col("sym"))
          .when(col("syn") =!= "", col("syn")))
    val geneTriples = ColumnEmit.emitFiltered(genes,
      res(col("gene"), lit(Vocab.a), lit(Vocab.owlClass)),
      strT(col("gene"), lit(Vocab.label), col("label")),
      res(col("gene"), lit(Vocab.subClassOf), lit(Vocab.gene)),
      typedT(when(col("live") === "Dead", col("gene")),
        lit(Vocab.deprecated), lit("true"), "xsd:boolean"),
      res(col("gene"), lit(Vocab.inTaxon),
        concat(lit("NCBITaxon:"), col("taxNum"))),
      strT(col("gene"), lit(Vocab.hasExactSynonym),
        when(col("syn") =!= "", col("syn"))))

    // ---- allele/RNAi phenotype GAF tier (py:411-572) --------------------
    val ap0 = graft.operators.ScanStats.widen(in("allele_pheno"))
      .filter(!coalesce(col("DB"), lit("")).startsWith("!") &&
        clean(col("DB_Object_ID")) =!= "" &&
        coalesce(col("Qualifier"), lit("")) =!= "NOT")
      .select(clean(col("DB_Object_ID")).as("gnum"),
        clean(col("GO_ID")).as("pheno"),
        clean(col("DB_Reference")).as("ref0"),
        clean(col("Evidence_Code")).as("eco0"),
        clean(col("With_or_From")).as("wf0"))
      // the REF⇄WITH unswap (py:470-481)
      .withColumn("refHasVar", col("ref0").rlike("WBVar|WBRNAi"))
      .withColumn("wfHasPerson", col("wf0").rlike("WBPerson"))
      .withColumn("wf",
        when(col("refHasVar") || col("wfHasPerson"),
          when(col("refHasVar"), col("ref0"))).otherwise(col("wf0")))
      .withColumn("ref1",
        when(col("refHasVar") || col("wfHasPerson"),
          when(col("wfHasPerson"), col("wf0"))).otherwise(col("ref0")))
      .withColumn("ref",
        when(coalesce(col("ref1"), lit("")) =!= "",
          regexp_replace(col("ref1"), "WB:|WB_REF:", "WormBase:")))
      .withColumn("eco", element_at(ecoM, col("eco0")))
      .withColumn("gene", concat(lit("WormBase:"), col("gnum")))
    val alleles = ap0
      .select(col("gene"), col("pheno"), col("ref"), col("eco"),
        explode(split(col("wf"), "\\|")).as("a0"))
      .withColumn("anum", regexp_replace(trim(col("a0")), "WB:", ""))
      .withColumn("allele", concat(lit("WormBase:"), col("anum")))
      .withColumn("isRnai", col("anum").rlike("WBRNAi"))
      .withColumn("isVar", !col("isRnai") && col("anum").rlike("WBVar"))
      .filter(col("isRnai") || col("isVar"))
      .withColumn("aid", concat(lit("_:"), Digest.md5Id(concat_ws("+",
        lit(definedBy), col("allele"), lit(Vocab.hasPhenotype),
        col("pheno")))))
      .withColumn("isPerson",
        coalesce(col("ref"), lit("")).contains("Person"))
    val apTriples = ColumnEmit.emitFiltered(alleles,
      res(when(col("isRnai"), col("allele")), lit(Vocab.a), lit(rtgType)),
      res(when(col("isRnai"), col("allele")), lit(exprVariantOf),
        col("gene")),
      res(when(col("isVar"), col("allele")), lit(Vocab.a),
        lit(Vocab.sequenceAlteration)),
      res(when(col("isVar"), col("allele")), lit(Vocab.isAlleleOf),
        col("gene")),
      res(col("allele"), lit(Vocab.hasPhenotype), col("pheno")),
      res(col("aid"), lit(Vocab.a), lit(Vocab.association)),
      res(col("aid"), lit(Vocab.assocHasSubject), col("allele")),
      res(col("aid"), lit(Vocab.assocHasPredicate), lit(Vocab.hasPhenotype)),
      res(col("aid"), lit(Vocab.assocHasObject), col("pheno")),
      res(col("aid"), lit(Vocab.hasEvidence), col("eco")),
      res(col("aid"), lit(Vocab.source), col("ref")),
      res(when(col("isPerson"), col("ref")), lit(Vocab.a),
        lit(Vocab.person)),
      res(when(col("isPerson"), col("aid")), lit(Vocab.hasEvidence),
        lit(bgKnowledge)),
      res(when(!col("isPerson"), col("ref")), lit(Vocab.a),
        lit(Vocab.publication)))

    // ---- rnai_phenotypes tier (py:574-649) ------------------------------
    val rp = graft.operators.ScanStats.widen(in("rnai_pheno"))
      .filter(clean(col("gene_num")) =!= "")
      .select(clean(col("gene_num")).as("gnum"),
        clean(col("gene_alt_symbol")).as("altSym"),
        clean(col("phenotype_id")).as("pheno"),
        explode(split(clean(col("rnai_and_refs")), " ")).as("pair"))
      .withColumn("parts", split(col("pair"), "\\|"))
      .filter(size(col("parts")) === 2)
      .withColumn("rn", element_at(col("parts"), 1))
      .withColumn("rf", element_at(col("parts"), 2))
      .withColumn("gene", concat(lit("WormBase:"), col("gnum")))
      .withColumn("rnai", concat(lit("WormBase:"), col("rn")))
      // make_reagent_targeted_gene_id (py:985-987)
      .withColumn("rtg", concat(lit("_:"), Digest.md5Id(
        concat(col("gnum"), lit("-"), col("rn")))))
      .withColumn("rtgLabel",
        concat(col("altSym"), lit("<"), col("rn"), lit(">")))
      .withColumn("aid", concat(lit("_:"), Digest.md5Id(concat_ws("+",
        lit(definedBy), col("rtg"), lit(Vocab.hasPhenotype), col("pheno")))))
    val rpTriples = ColumnEmit.emitFiltered(rp,
      res(col("rnai"), lit(Vocab.a), lit(rnaiReagent)),
      res(col("rnai"), lit(targetsGene), col("gene")),
      res(col("rtg"), lit(Vocab.a), lit(rtgType)),
      strT(col("rtg"), lit(Vocab.label), col("rtgLabel")),
      res(col("rtg"), lit(exprVariantOf), col("gene")),
      res(col("rtg"), lit(isTargetedBy), col("rnai")),
      res(col("rtg"), lit(Vocab.hasPhenotype), col("pheno")),
      res(col("aid"), lit(Vocab.a), lit(Vocab.association)),
      res(col("aid"), lit(Vocab.assocHasSubject), col("rtg")),
      res(col("aid"), lit(Vocab.assocHasPredicate), lit(Vocab.hasPhenotype)),
      res(col("aid"), lit(Vocab.assocHasObject), col("pheno")),
      res(col("aid"), lit(Vocab.source),
        concat(lit("WormBase:"), col("rf"))))

    // ---- GFF feature tier (py:689-853) ----------------------------------
    def attr(k: String): Column = {
      val c = regexp_extract(col("attributes"),
        "(?:^|;)" + k + "=([^;]*)", 1)
      when(c =!= "", c)
    }
    val typeM = typedLit(keptFeatureTypes.filter(_ != "gene")
      .map(t => t -> g.resolve(t)).toMap)
    val fl0 = graft.operators.ScanStats.widen(in("feature_loc"))
      .filter(clean(col("ftype")).isin(keptFeatureTypes: _*))
      .select(col("build"), clean(col("seqid")).as("chrom0"),
        clean(col("ftype")).as("ftl"), clean(col("start")).as("startRaw"),
        clean(col("strand")).as("strand"),
        coalesce(col("attributes"), lit("")).as("attributes"))
      .withColumn("idAttr", attr("ID"))
      .withColumn("variation", attr("variation"))
      .withColumn("nameAttr", attr("Name"))
      .filter(col("idAttr").isNull ||
        !col("idAttr").rlike("^(gmap|landmark)"))
      .filter(attr("polymorphism").isNull)
      .withColumn("fidFromId",
        when(col("idAttr").isNotNull && col("idAttr").rlike("WB(Gene|Var|sf)"),
          regexp_replace(col("idAttr"), "^\\w+:WB", "WormBase:WB")))
      .withColumn("fromVariation",
        col("idAttr").isNull && col("variation").isNotNull)
      .withColumn("fid0", coalesce(col("fidFromId"),
        when(col("fromVariation"),
          concat(lit("WormBase:"), col("variation")))))
      .withColumn("fromName",
        col("fid0").isNull && coalesce(col("nameAttr"), lit(""))
          .rlike("^WBsf"))
      .withColumn("fid", coalesce(col("fid0"),
        when(col("fromName"), concat(lit("WormBase:"), col("nameAttr")))))
      .filter(col("fid").isNotNull)
      .withColumn("name", when(!col("fromName"), col("nameAttr")))
      .withColumn("flabel0",
        when(col("fromVariation"), attr("public_name")))
      // insertion overwrites substitution (py:760-765)
      .withColumn("desc", when(col("fromVariation"),
        coalesce(
          when(attr("insertion").isNotNull,
            concat(lit("insertion="), attr("insertion"))),
          when(attr("substitution").isNotNull,
            concat(lit("substitution="), attr("substitution"))))))
      .withColumn("nameIsNew",
        col("name").isNotNull && !col("fid").contains(col("name")))
      .withColumn("flabel", coalesce(col("flabel0"),
        when(col("nameIsNew"), col("name"))))
      .withColumn("ftype",
        when(col("ftl") === "gene", tt.resolveCol(attr("biotype")))
          .otherwise(element_at(typeM, col("ftl"))))
      .withColumn("chrom", regexp_replace(col("chrom0"), "ch(r?)[omse]*", ""))
      .withColumn("chrId",
        concat(lit("CHR:"), col("build"), lit("chr"), col("chrom")))
      .withColumn("cin",
        concat(lit("MONARCH:"), col("build"), lit("chr"), col("chrom")))
      .withColumn("buildId", concat(lit("WormBase:"), col("build")))
      .withColumn("start",
        when(col("startRaw").rlike("^[0-9]+$"), col("startRaw").cast("long")))
      .withColumn("strandT",
        when(col("strand") === "+", lit(Vocab.faldoPlusStrand))
          .when(col("strand") === "-", lit(Vocab.faldoMinusStrand))
          .otherwise(lit(Vocab.faldoBothStrand)))
      // both ends anchored at `start` (py:830-831, kept verbatim)
      .withColumn("region", when(col("start").isNotNull,
        concat(lit("_:"), Digest.md5Id(concat_ws("+", lit("region"),
          col("fid"), col("start"), col("start"), col("chrId"))))))
      .withColumn("beginP", when(col("region").isNotNull,
        concat(lit("_:"), Digest.md5Id(concat(lit("pos+"), col("region"),
          lit("+begin+"), col("start"))))))
      .withColumn("endP", when(col("region").isNotNull,
        concat(lit("_:"), Digest.md5Id(concat(lit("pos+"), col("region"),
          lit("+end+"), col("start"))))))

    // chromosome instances in the WS build (py:822-824) — a
    // karyotype-bounded dimension, emitted once per (build, chrom)
    val cinDim = ColumnEmit.emit(
      fl0.select("cin", "chrom", "build", "buildId").distinct(),
      res(col("cin"), lit(Vocab.a), lit(Vocab.chromosome)),
      strT(col("cin"), lit(Vocab.label),
        concat(lit("chr"), col("chrom"), lit(" ("), col("build"), lit(")"))),
      res(col("buildId"), lit(Vocab.hasMember), col("cin")),
      res(col("cin"), lit(Vocab.memberOf), col("buildId")))

    val isGene = col("ftl") === "gene"
    val flTriples = ColumnEmit.emitFiltered(fl0,
      // typing: gene → class with subClassOf biotype; else individual
      res(col("fid"), lit(Vocab.a),
        when(isGene, lit(Vocab.owlClass)).otherwise(col("ftype"))),
      res(when(isGene, col("fid")), lit(Vocab.subClassOf), col("ftype")),
      strT(col("fid"), lit(Vocab.label), col("flabel")),
      strT(when(col("flabel0").isNotNull && col("nameIsNew"), col("fid")),
        lit(Vocab.hasExactSynonym), col("name")),
      strT(col("fid"), lit(Vocab.hasExactSynonym), attr("other_name")),
      strT(col("fid"), lit(Vocab.description), col("desc")),
      strT(col("fid"), lit(Vocab.description), attr("Note")),
      // FALDO (engine digest scheme)
      res(col("fid"), lit(Vocab.faldoLocation), col("region")),
      res(col("region"), lit(Vocab.a), lit(Vocab.faldoRegion)),
      res(col("region"), lit(Vocab.faldoBegin), col("beginP")),
      res(col("region"), lit(Vocab.faldoEnd), col("endP")),
      res(col("beginP"), lit(Vocab.a), lit(Vocab.faldoExactPosition)),
      res(col("beginP"), lit(Vocab.a), col("strandT")),
      typedT(col("beginP"), lit(Vocab.faldoPosition),
        col("start").cast("string"), "xsd:integer"),
      res(col("beginP"), lit(Vocab.faldoReference), col("chrId")),
      res(col("endP"), lit(Vocab.a), lit(Vocab.faldoExactPosition)),
      res(col("endP"), lit(Vocab.a), col("strandT")),
      typedT(col("endP"), lit(Vocab.faldoPosition),
        col("start").cast("string"), "xsd:integer"),
      res(col("endP"), lit(Vocab.faldoReference), col("chrId")))

    // ---- disease GAF tier (py:854-901) ----------------------------------
    val da = graft.operators.ScanStats.widen(in("disease_assoc"))
      .filter(!coalesce(col("DB"), lit("")).startsWith("!") &&
        clean(col("DB_Object_ID")) =!= "" &&
        coalesce(col("Qualifier"), lit("")) =!= "NOT")
      .select(clean(col("DB_Object_ID")).as("gnum"),
        clean(col("GO_ID")).as("doid"),
        clean(col("DB_Reference")).as("ref0"),
        clean(col("Evidence_Code")).as("eco0"))
      .withColumn("gene", concat(lit("WormBase:"), col("gnum")))
      .withColumn("ref", when(col("ref0") =!= "",
        regexp_replace(col("ref0"), "WB_REF:", "WormBase:")))
      .withColumn("eco", element_at(ecoM, col("eco0")))
      .withColumn("aid", concat(lit("_:"), Digest.md5Id(concat_ws("+",
        lit(definedBy), col("gene"), lit(Vocab.isModelOf), col("doid")))))
    val daTriples = ColumnEmit.emitFiltered(da,
      res(col("gene"), lit(Vocab.isModelOf), col("doid")),
      res(col("aid"), lit(Vocab.a), lit(Vocab.association)),
      res(col("aid"), lit(Vocab.assocHasSubject), col("gene")),
      res(col("aid"), lit(Vocab.assocHasPredicate), lit(Vocab.isModelOf)),
      res(col("aid"), lit(Vocab.assocHasObject), col("doid")),
      res(col("aid"), lit(Vocab.source), col("ref")),
      res(col("aid"), lit(Vocab.hasEvidence), col("eco")))

    // ---- optional pub_xrefs tier (py:650-688; opt-in, see read) ---------
    val pubXrefTriples = in.get("pub_xrefs").map { px =>
      val rows = px
        .select(trim(coalesce(col("wb_ref"), lit(""))).as("wbref"),
          // strip the trailing '<BR>' (py:661 `strip()[:-4]`)
          expr("substring(trim(coalesce(xref, '')), 1, " +
            "greatest(length(trim(coalesce(xref, ''))) - 4, 0))").as("x"))
        .filter(col("wbref") =!= "")
        .withColumn("dbxref",
          when(col("x").startsWith("pmid"),
            concat(lit("PMID:"), substring(col("x"), 5, Int.MaxValue)))
            .when(col("x").rlike("[\\(\\)<>\\[\\]\\s]"),
              lit(null).cast("string"))
            .when(col("x").startsWith("doi"),
              concat(lit("DOI:"), substring(col("x"), 4, Int.MaxValue))))
        .filter(col("dbxref").isNotNull)
        .withColumn("refCurie", concat(lit("WormBase:"), col("wbref")))
      ColumnEmit.emit(rows,
        res(col("dbxref"), lit(Vocab.a),
          when(col("dbxref").startsWith("PMID:"),
            lit(g.resolve("journal article")))
            .otherwise(lit(Vocab.publication))),
        res(col("refCurie"), lit(Vocab.sameAs), col("dbxref")))
    }

    // ---- optional gene_interaction tier (py:903-981; opt-in): kept to
    // 2-participant rows (overflow column null), association id is the
    // EXPLICIT WormBase interaction id (set_association_id py:975) typed
    // by the Genetic/Physical/Regulatory dispatch with the
    // InteractionAssoc 'interacts with' default for anything else
    val interactionTriples = in.get("gene_interaction").map { gi =>
      val rows = gi
        .filter(coalesce(col("interaction_num"), lit("")) =!= "" &&
          col("overflow").isNull &&
          coalesce(col("b_id"), lit("")) =!= "")
        .select(
          concat(lit("WormBase:"), col("interaction_num")).as("iid"),
          when(col("interaction_type") === "Genetic", lit("RO:0002435"))
            .when(col("interaction_type") === "Physical",
              lit("RO:0002436"))
            .when(col("interaction_type") === "Regulatory",
              lit("RO:0002448"))
            .otherwise(lit("RO:0002434")).as("rel"),
          concat(lit("WormBase:"), col("a_id")).as("ga"),
          concat(lit("WormBase:"), col("b_id")).as("gb"),
          when(coalesce(col("summary"), lit("")) =!= "", col("summary"))
            .as("summary"))
      ColumnEmit.emitFiltered(rows,
        res(col("ga"), col("rel"), col("gb")),
        res(col("iid"), lit(Vocab.a), lit(Vocab.association)),
        res(col("iid"), lit(Vocab.assocHasSubject), col("ga")),
        res(col("iid"), lit(Vocab.assocHasPredicate), col("rel")),
        res(col("iid"), lit(Vocab.assocHasObject), col("gb")),
        strT(col("iid"), lit(Vocab.description), col("summary")))
    }

    // ---- optional gene_desc tier (py:364-409; opt-in): concise
    // description → definition; the four other variants land
    // ' [tag]'-suffixed unless duplicate of concise / 'none…' / empty
    val geneDescTriples = in.get("gene_desc").map { gd =>
      def cleanCol(c: String) = trim(coalesce(col(c), lit("")))
      val rows = gd
        // the reference skips one header row (py:374 next(reader))
        .filter(cleanCol("gene_num") =!= "" &&
          col("gene_num") =!= "gene_num")
        .select(
          concat(lit("WormBase:"), trim(col("gene_num"))).as("gene"),
          cleanCol("concise_description").as("concise"),
          cleanCol("provisional_description").as("provisional"),
          cleanCol("detailed_description").as("detailed"),
          cleanCol("automated_description").as("automated"),
          cleanCol("gene_class_description").as("gene_class"))
      def descArm(name: String, tag: String) =
        strT(when(col(name) =!= col("concise") &&
            !col(name).startsWith("none") && col(name) =!= "",
          col("gene")), lit(Vocab.description),
          concat(col(name), lit(s" [$tag]")))
      ColumnEmit.emitFiltered(rows,
        strT(when(!col("concise").isin("none available", ""),
          col("gene")), lit("IAO:0000115"), col("concise")),
        descArm("provisional", "provisional"),
        descArm("detailed", "detailed"),
        descArm("automated", "automated"),
        descArm("gene_class", "gene class"))
    }

    (pubXrefTriples.toSeq ++ interactionTriples ++ geneDescTriples)
      .foldLeft(
        geneTriples
          .union(apTriples)
          .union(rpTriples)
          .union(cinDim)
          .union(flTriples)
          .union(daTriples))(_.union(_))
  }

  override def testIds: Seq[String] =
    Seq("WormBase:WBGene00000001", "WormBase:WBVar00143949")
}
