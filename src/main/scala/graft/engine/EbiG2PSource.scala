package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.{Digest, Vocab}
import graft.emit.ColumnEmit
import graft.emit.ColumnEmit.{res, str}

/** The EBI gene2phenotype ingest (dipper/sources/EBIGene2Phen.py): the
  * DDG2P developmental-disorders table → gene/variant→disease models.
  *
  * Faithful routing (py:154-283): a row whose disease has no OMIM id
  * falls back to the curated label→MONDO sidecar and is dropped when
  * unmapped; the DDD confidence category resolves to the G2P relation
  * (confirmed→pathogenic_for, probable→likely_pathogenic_for, the
  * rest→contributes-to, tt/ebi_g2p.yaml); a known mutation consequence
  * mints an anonymous variant locus — digest of the consequence-prefixed
  * "… variant of SYMBOL" label — typed GENO:0000002, linked to its gene
  * with has_affected_feature, marked pseudo-blank, and carrying the
  * consequence via has_molecular_consequence (UTR/missense/cis-reg/
  * contiguous-dup) or has_functional_consequence (activating/dominant-
  * negative/dosage/LoF) per the static split of py:286-306; base-
  * prefixed consequence terms get the underscores-to-spaces label hack
  * (py:251-257). The OBAN association subject is the variant when one
  * exists, else the gene; allelic requirement decorates the association
  * ONLY on the gene-subject path (py:273-281). An 'uncertain'/empty —
  * or, divergence: any unlisted — consequence emits no variant (the
  * reference would resolve the literal word 'uncertain' and raise).
  *
  * Scale shape: one fact scan; the only join is the broadcast-sized
  * MONDO sidecar (left join + null-filter); digests and routing are
  * codegen'd; PMID fan-out explodes after the scan.
  */
object EbiG2PSource extends GraftSource {
  val name = "ebi_g2p"
  private val definedBy = "EX:ebi_g2p"

  private val columns = Seq("gene_symbol", "gene_omim_id", "disease_label",
    "disease_omim_id", "g2p_relation_label", "allelic_requirement",
    "mutation_consequence", "phenotypes", "organ_specificity_list", "pmids",
    "panel", "prev_symbols", "hgnc_id", "entry_date")

  private def schemaOf(cols: Seq[String]): StructType =
    StructType(cols.map(StructField(_, StringType)))

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = Map(
    // DDG2P is COMMA-separated (csv.reader default, py:143-146)
    "developmental_disorders" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/DDG2P.csv", schemaOf(columns),
        delimiter = ",")),
    // curated unmapped-disease sidecar (map_files, py:69-99), headerless
    "mondo_map" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/unmapped_ebi_diseases.tsv",
        schemaOf(Seq("disease_label", "mondo_id")), hasHeader = false)))

  private val functionalConsequences = Seq("activating", "dominant negative",
    "increased gene dosage", "loss of function")
  private val molecularConsequences = Seq("5_prime or 3_prime UTR mutation",
    "all missense/in frame", "cis-regulatory or promotor mutation",
    "part of contiguous gene duplication")

  /** The reference's label hack for base-prefixed terms (py:251-257,
    * 276-281): strip the base prefix, underscores → spaces. */
  private def baseLabel(c: Column): Column =
    regexp_replace(regexp_replace(c, "^MONARCH:", ""), "_", " ")

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    val tt = graft.core.TranslationTable.forSource("ebi_g2p")
    val g = graft.core.TranslationTable.default

    val mondo = in("mondo_map")
      .select(col("disease_label"), col("mondo_id")).distinct()

    val rows = graft.operators.ScanStats.widen(in("developmental_disorders"))
      .filter(coalesce(col("hgnc_id"), lit("")) =!= "")
      .join(mondo, Seq("disease_label"), "left")
      .select(
        concat(lit("HGNC:"), col("hgnc_id")).as("gene"),
        when(col("disease_omim_id") =!= "No disease mim",
          concat(lit("OMIM:"), col("disease_omim_id")))
          .otherwise(col("mondo_id")).as("disease"),
        tt.resolveCol(col("g2p_relation_label")).as("rel"),
        coalesce(col("mutation_consequence"), lit("")).as("cons"),
        coalesce(col("allelic_requirement"), lit("")).as("alreq"),
        coalesce(col("pmids"), lit("")).as("pmids"),
        col("gene_symbol").as("symbol"))
      .filter(col("disease").isNotNull)
      .withColumn("consRel",
        when(col("cons").isin(molecularConsequences: _*),
          lit(g.resolve("has_molecular_consequence")))
          .when(col("cons").isin(functionalConsequences: _*),
            lit(g.resolve("has_functional_consequence"))))
      .withColumn("conseq",
        when(col("consRel").isNotNull, tt.resolveCol(col("cons"))))
      .withColumn("vlabel",
        when(col("consRel").isNotNull,
          concat(col("cons"), lit(" variant of "), col("symbol")))
          .otherwise(concat(lit("variant of "), col("symbol"))))
      .withColumn("vnode", concat(lit("_:"), Digest.md5Id(col("vlabel"))))
      .withColumn("subj",
        when(col("consRel").isNotNull, col("vnode")).otherwise(col("gene")))
      .withColumn("aid", concat(lit("_:"), Digest.md5Id(concat_ws("+",
        lit(definedBy), col("subj"), col("rel"), col("disease")))))

    val varRows = rows.filter(col("consRel").isNotNull)
    val variantTriples = ColumnEmit.emitFiltered(varRows,
      res(col("vnode"), col("consRel"), col("conseq")),
      str(col("conseq"), lit(Vocab.label),
        when(col("conseq").startsWith("MONARCH:"), baseLabel(col("conseq")))),
      str(col("vnode"), lit(Vocab.label), col("vlabel")),
      res(col("vnode"), lit(Vocab.a), lit(g.resolve("variant locus"))),
      res(col("vnode"), lit(Vocab.hasAffectedLocus), col("gene")),
      ColumnEmit.typed(col("vnode"), lit(g.resolve("is_anonymous")),
        lit("true"), "xsd:boolean"))

    val assocTriples = ColumnEmit.emit(rows,
      res(col("subj"), col("rel"), col("disease")),
      res(col("aid"), lit(Vocab.a), lit(Vocab.association)),
      res(col("aid"), lit(Vocab.assocHasSubject), col("subj")),
      res(col("aid"), lit(Vocab.assocHasPredicate), col("rel")),
      res(col("aid"), lit(Vocab.assocHasObject), col("disease")))
    val pmidTriples = ColumnEmit.emit(
      rows.filter(col("pmids") =!= "")
        .select(col("aid"), explode(split(col("pmids"), ";")).as("pm"))
        .filter(trim(col("pm")) =!= ""),
      res(col("aid"), lit(Vocab.source),
        concat(lit("PMID:"), trim(col("pm")))))

    // allelic requirement decorates the association only when the
    // subject is the GENE (is_variant false, py:273-281)
    val reqRows = rows
      .filter(col("consRel").isNull && col("alreq") =!= "")
      .withColumn("req", tt.resolveCol(col("alreq")))
    val reqTriples = ColumnEmit.emitFiltered(reqRows,
      res(col("aid"), lit(g.resolve("has_allelic_requirement")), col("req")),
      str(col("req"), lit(Vocab.label),
        when(col("req").startsWith("MONARCH:"), baseLabel(col("req")))))

    variantTriples.union(assocTriples).union(pmidTriples).union(reqTriples)
  }

  override def testIds: Seq[String] = Seq("HGNC:16636", "HGNC:1071")
}
