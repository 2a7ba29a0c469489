package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.{Digest, TranslationTable, Vocab}
import graft.emit.ColumnEmit
import graft.emit.ColumnEmit.{res, str => strT}

/** The FlyBase ingest (dipper/sources/FlyBase.py): the reference fetches
  * two Chado SQL dumps (resources/sql/fb/{allele_phenotype,gene_xref}.sql
  * — the JDBC-manifest mechanism pipeline-proven by [[MgiSource]]) plus
  * four precomputed FTP files, then parses the landed TSVs. This source
  * consumes the same landed shapes:
  *
  *  - `allele_phenotype.tsv`: `@FBcv0000351:lethal@ | @FBcv0000308:...@`
  *    phenotype descriptors — first `@id:label@` term is the FBcv
  *    phenotype, the rest become association qualifiers and fold into
  *    the association digest (py:215-345, the reference's
  *    disambiguation-by-qualifier id); FlyBase-internal qualifier ids
  *    (FBal/FBti/FBab/FBba/FBtp) map to the FlyBase namespace, others
  *    to their own prefix; `derived_pheno_manifest` rows are skipped.
  *  - `fbal_to_fbgn` allele↔gene: species prefixes (`Hsap\\...`) resolve
  *    through the `species.ab` dimension; non-drosophilid (foreign
  *    transgenic) alleles are excluded here AND from the phenotype and
  *    disease tiers (py:457-497); affected-locus links between matching
  *    prefixes.
  *  - `disease_model_annotations`: `model of` rows to DOID diseases with
  *    FBrf→PMID rerouting through the `fbrf_pmid` dimension and
  *    mutant-phenotype evidence vs free-text description (py:684-765).
  *  - `gene_xref.tsv`: EntrezGene/HGNC equivalence cliques (py:499-545).
  *
  * Spark shape: the species and ref-pubmed dimensions broadcast; the
  * transgenic-allele set is a derived relation consumed by LEFT ANTI
  * joins (the reference's in-memory list probe); everything else is
  * scan → project → explode. Deviations (documented): rows the reference
  * crashes on (unparseable first term id, mismatched allele/gene species
  * prefixes) are dropped instead; association ids are the engine's
  * `_:` md5 digests rather than `MONARCH:` sha1 curies.
  */
object FlyBaseSource extends GraftSource {
  val name = "flybase"
  private val definedBy = "EX:flybase"

  private val flyPrefixes = Seq("FBal", "FBti", "FBab", "FBba", "FBtp")

  private def schemaOf(names: String*) =
    StructType(names.map(StructField(_, StringType)))

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = {
    import graft.sources.{DelimitedSource, SourceFile}
    def tsv(file: String, cols: String*) =
      DelimitedSource.read(spark,
        SourceFile(s"$dataDir/$file", schemaOf(cols: _*)))
    def headerless(glob: String, cols: String*) =
      spark.read.option("sep", "\t").schema(schemaOf(cols: _*))
        .csv(s"$dataDir/$glob")

    // species.ab: ' | '-separated with a commented header block; keep
    // rows with an abbreviation and a taxon id (py:349-409)
    val species = spark.read.option("sep", "|")
      .schema(schemaOf("internal_id", "taxgroup", "abbreviation", "genus",
        "species_name", "common_name", "comment", "ncbi_taxon_id"))
      .csv(s"$dataDir/species.ab*")
      .select(trim(coalesce(col("abbreviation"), lit(""))).as("prefix"),
        trim(coalesce(col("taxgroup"), lit(""))).as("taxgroup"),
        regexp_replace(trim(coalesce(col("ncbi_taxon_id"), lit(""))),
          "taxon", "NCBITaxon").as("taxon"))
      .filter(col("prefix") =!= "" && col("taxon").startsWith("NCBITaxon"))

    Map(
      "allele_phenotype" -> tsv("allele_phenotype.tsv", "allele_id",
        "pheno_desc", "pheno_type", "pub_id", "pub_title", "pmid_id"),
      "gene_xref" -> tsv("gene_xref.tsv", "gene_id", "xref_id",
        "xref_source"),
      "species_map" -> species,
      "allele_gene" ->
        headerless("fbal_to_fbgn*", "AlleleID", "AlleleSymbol", "GeneID",
          "GeneSymbol")
          .filter(col("AlleleID").rlike("^FBal")),
      "ref_pubmed" ->
        headerless("fbrf_pmid*", "FBrf", "PMID", "PMCID", "DOI",
          "pub_type", "miniref", "pmid_added")
          .filter(col("FBrf").rlike("^FBrf") && col("PMID").rlike("^[0-9]+$")),
      "disease_model" ->
        headerless("disease_model_annotations*", "fbgn", "gene_symbol",
          "hgnc", "do_qualifier", "do_id", "do_term", "allele_id",
          "allele_symbol", "ortho_hgnc", "ortho_symbol", "evidence", "fbrf")
          .filter(col("fbgn").rlike("^FBgn")))
  }

  private def speciesPrefix(label: Column): Column =
    regexp_extract(label, "^(\\w*)\\\\", 1)

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    val g = TranslationTable.default
    val dmel = g.resolve("Drosophila melanogaster")

    // species dimension + the reference's hard-coded additions where the
    // file lacks the prefix (py:373-376,400-404)
    val fileSpecies = in("species_map")
      .select("prefix", "taxgroup", "taxon").distinct()
    val added = spark.createDataFrame(Seq(
      ("P", "drosophilid", dmel),
      ("Drer", "non-drosophilid eukaryote", g.resolve("Danio rerio"))))
      .toDF("prefix", "taxgroup", "taxon")
      .join(fileSpecies.select("prefix"), Seq("prefix"), "left_anti")
    val species = broadcast(fileSpecies.union(added))

    val ag = graft.operators.ScanStats.widen(in("allele_gene")).select(
      col("AlleleID").as("aid0"), col("AlleleSymbol").as("alabel"),
      col("GeneID").as("gid0"), col("GeneSymbol").as("glabel"))
      .withColumn("aprefix", speciesPrefix(col("alabel")))
      .withColumn("gprefix", speciesPrefix(col("glabel")))

    // foreign transgenic alleles: prefixed and not drosophilid, or
    // prefixed and unknown (py:457-497)
    val transgenic = ag.filter(col("aprefix") =!= "")
      .join(species.withColumnRenamed("prefix", "aprefix"),
        Seq("aprefix"), "left")
      .filter(col("taxgroup").isNull || col("taxgroup") =!= "drosophilid")
      .select(col("aid0").as("allele_id")).distinct()

    // ---- allele_phenotype tier (py:215-345) -----------------------------
    val termRe = "@(\\w*):[^:@]*@"
    val pheno0 = graft.operators.ScanStats.widen(in("allele_phenotype"))
      .select(trim(col("allele_id")).as("allele_id"),
        coalesce(col("pheno_desc"), lit("")).as("desc"),
        coalesce(col("pheno_type"), lit("")).as("ptype"),
        trim(coalesce(col("pub_id"), lit(""))).as("pubId"),
        coalesce(col("pub_title"), lit("")).as("pubTitle"),
        trim(coalesce(col("pmid_id"), lit(""))).as("pmid"))
      .filter(col("ptype") === "derived_pheno_class")
      .join(transgenic, Seq("allele_id"), "left_anti")
      .withColumn("ids", regexp_extract_all(col("desc"), lit(termRe), lit(1)))
      .filter(size(col("ids")) > 0)
      .withColumn("first", element_at(col("ids"), 1))
      .withColumn("prefix", regexp_extract(col("first"), "^([a-zA-Z]+)(\\d+)", 1))
      .withColumn("localId", regexp_extract(col("first"), "^([a-zA-Z]+)(\\d+)", 2))
      .filter(col("prefix") === "FBcv")
      .withColumn("allele", concat(lit("FlyBase:"), col("allele_id")))
      .withColumn("pheno", concat(col("prefix"), lit(":"), col("localId")))
      .withColumn("ref",
        when(col("pmid") =!= "", concat(lit("PMID:"), col("pmid")))
          .otherwise(concat(lit("FlyBase:"), col("pubId"))))
      .withColumn("quals", slice(col("ids"), 2, 1000000))
      // qualifier ids (raw, empties kept) fold into the digest (py:316-323)
      .withColumn("aid", concat(lit("_:"), Digest.md5Id(
        when(size(col("quals")) > 0,
          concat_ws("+", lit(definedBy), col("allele"),
            lit(Vocab.hasPhenotype), col("pheno"),
            array_join(col("quals"), "+")))
        .otherwise(concat_ws("+", lit(definedBy), col("allele"),
          lit(Vocab.hasPhenotype), col("pheno"))))))

    val phenoAssoc = ColumnEmit.emitFiltered(pheno0,
      res(col("allele"), lit(Vocab.hasPhenotype), col("pheno")),
      res(col("aid"), lit(Vocab.a), lit(Vocab.association)),
      res(col("aid"), lit(Vocab.assocHasSubject), col("allele")),
      res(col("aid"), lit(Vocab.assocHasPredicate), lit(Vocab.hasPhenotype)),
      res(col("aid"), lit(Vocab.assocHasObject), col("pheno")),
      res(col("aid"), lit(Vocab.source), col("ref")),
      // FlyBase-internal pubs get typed + titled (py:303-308)
      res(when(col("pmid") === "", col("ref")), lit(Vocab.a),
        lit(Vocab.publication)),
      strT(when(col("pmid") === "" && col("pubTitle") =!= "", col("ref")),
        lit(Vocab.label), col("pubTitle")))

    val qualTriples = ColumnEmit.emit(
      pheno0.select(col("aid"), explode(col("quals")).as("term"))
        .filter(col("term") =!= "")
        .withColumn("qprefix",
          regexp_extract(col("term"), "^([a-zA-Z]+)(\\d+)", 1))
        .withColumn("qlocal",
          regexp_extract(col("term"), "^([a-zA-Z]+)(\\d+)", 2))
        .filter(col("qprefix") =!= "")
        .withColumn("qcurie",
          when(col("qprefix").isin(flyPrefixes: _*),
            concat(lit("FlyBase:"), col("term")))
            .otherwise(concat(col("qprefix"), lit(":"), col("qlocal")))),
      res(col("aid"), lit(Vocab.hasQualifier), col("qcurie")))

    // ---- allele_gene tier (py:547-682) ----------------------------------
    val agS = ag
      .join(species.select(col("prefix").as("aprefix"),
        col("taxgroup").as("atg"), col("taxon").as("atax")),
        Seq("aprefix"), "left")
      .join(species.select(col("prefix").as("gprefix"),
        col("taxgroup").as("gtg"), col("taxon").as("gtax")),
        Seq("gprefix"), "left")
      // prefixed alleles that are foreign or unknown skip the whole row
      .filter(col("aprefix") === "" ||
        (col("atg").isNotNull && col("atg") === "drosophilid"))
      .withColumn("allele", concat(lit("FlyBase:"), col("aid0")))
      .withColumn("gene", concat(lit("FlyBase:"), col("gid0")))

    val agTriples = ColumnEmit.emitFiltered(agS,
      res(col("allele"), lit(Vocab.a), lit(Vocab.allele)),
      strT(col("allele"), lit(Vocab.label), col("alabel")),
      res(col("allele"), lit(Vocab.inTaxon),
        when(col("aprefix") === "", lit(dmel)).otherwise(col("atax"))),
      // gene taxon only for prefixed genes known to the dimension; the
      // reference's prefix-less branch re-taxons the ALLELE (py:661-666)
      res(when(col("gprefix") =!= "" && col("gtax").isNotNull, col("gene")),
        lit(Vocab.inTaxon), col("gtax")),
      res(col("gene"), lit(Vocab.a), lit(Vocab.owlClass)),
      res(col("gene"), lit(Vocab.subClassOf), lit(Vocab.gene)),
      strT(when(col("gprefix") === "" ||
          coalesce(col("gtg"), lit("")) === "drosophilid", col("gene")),
        lit(Vocab.label), col("glabel")),
      res(when(col("aprefix") === col("gprefix"), col("allele")),
        lit(Vocab.hasAffectedLocus), col("gene")))

    // ---- disease_model tier (py:684-765) --------------------------------
    val pubMap = broadcast(in("ref_pubmed")
      .select(trim(col("FBrf")).as("fbrf_key"),
        concat(lit("PMID:"), trim(col("PMID"))).as("pmidCurie"))
      .dropDuplicates("fbrf_key"))
    val dm = graft.operators.ScanStats.widen(in("disease_model"))
      .select(trim(coalesce(col("allele_id"), lit(""))).as("allele_id"),
        trim(coalesce(col("fbrf"), lit(""))).as("fbrf"),
        coalesce(col("evidence"), lit("")).as("evidence"),
        trim(coalesce(col("do_id"), lit(""))).as("doid"),
        trim(coalesce(col("do_qualifier"), lit(""))).as("qual"))
      .filter(col("allele_id") =!= "" && col("qual") === "model of")
      .join(transgenic, Seq("allele_id"), "left_anti")
      .join(pubMap, col("fbrf") === col("fbrf_key"), "left")
      .withColumn("allele", concat(lit("FlyBase:"), col("allele_id")))
      .withColumn("ref",
        when(col("fbrf") === "", lit(null).cast("string"))
          .otherwise(coalesce(col("pmidCurie"),
            concat(lit("FlyBase:"), col("fbrf")))))
      .withColumn("aid", concat(lit("_:"), Digest.md5Id(concat_ws("+",
        lit(definedBy), col("allele"), lit(Vocab.isModelOf), col("doid")))))

    val eco = g.resolve("mutant phenotype evidence")
    val dmTriples = ColumnEmit.emitFiltered(dm,
      res(col("allele"), lit(Vocab.isModelOf), col("doid")),
      res(col("aid"), lit(Vocab.a), lit(Vocab.association)),
      res(col("aid"), lit(Vocab.assocHasSubject), col("allele")),
      res(col("aid"), lit(Vocab.assocHasPredicate), lit(Vocab.isModelOf)),
      res(col("aid"), lit(Vocab.assocHasObject), col("doid")),
      res(col("aid"), lit(Vocab.source), col("ref")),
      res(when(col("evidence") === "inferred from mutant phenotype",
        col("aid")), lit(Vocab.hasEvidence), lit(eco)),
      strT(when(col("evidence") =!= "inferred from mutant phenotype" &&
          col("evidence") =!= "", col("aid")),
        lit(Vocab.description), col("evidence")))

    // ---- gene_xref tier (py:499-545) ------------------------------------
    val xr = graft.operators.ScanStats.widen(in("gene_xref"))
      .select(trim(col("gene_id")).as("gene_id"),
        trim(col("xref_id")).as("xref_id"),
        trim(col("xref_source")).as("src"))
      .withColumn("xprefix",
        when(col("src") === "EntrezGene", lit("NCBIGene"))
          .when(col("src") === "HGNC", lit("HGNC")))
      .filter(col("xprefix").isNotNull)
    val xrefTriples = ColumnEmit.emit(xr,
      res(concat(lit("FlyBase:"), col("gene_id")),
        lit(Vocab.equivalentClass),
        concat(col("xprefix"), lit(":"), col("xref_id"))))

    phenoAssoc
      .union(qualTriples)
      .union(agTriples)
      .union(dmTriples)
      .union(xrefTriples)
  }

  override def testIds: Seq[String] =
    Seq("FlyBase:FBal0257663", "FlyBase:FBal0000017")
}
