package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.Vocab
import graft.emit.ColumnEmit
import graft.emit.ColumnEmit.{res, str => strT}

/** The Ensembl biomart ingest (dipper/sources/Ensembl.py): the per-taxon
  * biomart TSV replies (`ensembl_<taxid>.txt` — the POST fetch is
  * driver-side, sources/Biomart.scala holds the query-document builder)
  * parsed into gene identity cliques.
  *
  * One globbed scan covers every landed taxon file; the taxon comes from
  * the FILENAME (`input_file_name`), mirroring the reference's per-taxon
  * loop (py:296-316). Human files carry an extra hgnc_id column; the
  * shorter non-human rows read null there.
  *
  * Per row (py:316-377): a gene class labeled and subclassed under the
  * biotype's SO class (local tt, polypeptide fallback); NCBIGene
  * equivalence — hasDbXref for human (HGNC is the human clique leader),
  * owl:equivalentClass otherwise; HGNC equivalence for human; taxon;
  * peptide + uniprot typed individuals as gene products with a
  * peptide→uniprot xref.
  *
  * Scale shape: single multi-file scan (per-file splits), zero joins,
  * one vocabulary map literal; taxa prune at the filename predicate.
  */
object EnsemblSource extends GraftSource {
  val name = "ensembl"

  private val columns = Seq("Gene stable ID", "Gene name", "Gene description",
    "Gene type", "NCBI gene (formerly Entrezgene) ID", "Protein stable ID",
    "UniProtKB/Swiss-Prot ID", "HGNC ID")

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = {
    val path = s"$dataDir/ensembl_*.txt"
    // header widths differ per taxon (human carries the extra hgnc_id,
    // Ensembl.py:305-310), so validate only the 7 shared columns — the
    // peek may land on either file shape and the extra human column is
    // tolerated by checkFileHeader's new-column warning path
    val peek = spark.read.option("sep", "\t").option("header", "true").csv(path)
    graft.sources.DelimitedSource.checkFileHeader(columns.dropRight(1),
      peek.columns.toSeq)
    val df = spark.read.option("sep", "\t").option("header", "true")
      .schema(StructType(columns.map(StructField(_, StringType))))
      .csv(path)
    Map("genes" -> df.withColumn("taxid",
      regexp_extract(input_file_name(), "ensembl_([0-9]+)\\.txt", 1)))
  }

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame =
    transform(spark, in, Nil)

  override def transform(spark: SparkSession, in: Map[String, DataFrame],
                         taxa: Seq[String]): DataFrame = {
    val tt = graft.core.TranslationTable.forSource("ensembl")
    val g = graft.core.TranslationTable.default
    val c = (n: String) => col(s"`$n`")

    val rows0 = graft.operators.ScanStats.widen(in("genes"))
      .filter(coalesce(trim(c("Gene stable ID")), lit("")) =!= "")
    val rows = (if (taxa.isEmpty) rows0
                else rows0.filter(col("taxid").isin(taxa: _*)))
      .select(
        col("taxid"),
        concat(lit("ENSEMBL:"), trim(c("Gene stable ID"))).as("gene"),
        trim(coalesce(c("Gene name"), lit(""))).as("gname"),
        trim(coalesce(c("Gene description"), lit(""))).as("gdesc"),
        tt.resolveCol(trim(coalesce(c("Gene type"), lit(""))),
          default = Some(g.resolve("polypeptide"))).as("gtype"),
        trim(coalesce(c("NCBI gene (formerly Entrezgene) ID"), lit("")))
          .as("entrez"),
        trim(coalesce(c("Protein stable ID"), lit(""))).as("pep"),
        trim(coalesce(c("UniProtKB/Swiss-Prot ID"), lit(""))).as("uniprot"),
        trim(coalesce(c("HGNC ID"), lit(""))).as("hgnc"))
      .withColumn("pepId",
        when(col("pep") =!= "", concat(lit("ENSEMBL:"), col("pep"))))
      .withColumn("uniId",
        when(col("pep") =!= "" && col("uniprot") =!= "",
          concat(lit("UniProtKB:"), col("uniprot"))))

    ColumnEmit.emitFiltered(rows,
      res(col("gene"), lit(Vocab.a), lit(Vocab.owlClass)),
      strT(col("gene"), lit(Vocab.label),
        when(col("gname") =!= "", col("gname"))),
      res(col("gene"), lit(Vocab.subClassOf), col("gtype")),
      strT(col("gene"), lit(Vocab.description),
        when(col("gdesc") =!= "", col("gdesc"))),
      // human keeps HGNC as the equivalence leader: entrez is an xref
      // (py:348-360)
      res(col("gene"), lit(Vocab.hasDbXref),
        when(col("entrez") =!= "" && col("taxid") === "9606",
          concat(lit("NCBIGene:"), col("entrez")))),
      res(col("gene"), lit(Vocab.equivalentClass),
        when(col("entrez") =!= "" && col("taxid") =!= "9606",
          concat(lit("NCBIGene:"), col("entrez")))),
      res(col("gene"), lit(Vocab.equivalentClass),
        when(col("hgnc") =!= "" && col("taxid") === "9606", col("hgnc"))),
      res(col("gene"), lit(Vocab.inTaxon),
        concat(lit("NCBITaxon:"), col("taxid"))),
      res(col("pepId"), lit(Vocab.a), col("gtype")),
      res(col("gene"), lit(g.resolve("has gene product")), col("pepId")),
      res(col("uniId"), lit(Vocab.a), col("gtype")),
      res(col("gene"), lit(g.resolve("has gene product")), col("uniId")),
      res(col("pepId"), lit(Vocab.hasDbXref), col("uniId")))
  }

  override def testIds: Seq[String] = Seq("ENSEMBL:ENSG00000149527")
}
