package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.{Digest, Vocab}
import graft.emit.ColumnEmit
import graft.emit.ColumnEmit.{res, str}

/** The Reactome-shape pathway-membership ingest (dipper/sources/
  * Reactome.py): two headerless 6-column association dumps
  * (Ensembl2Reactome, ChEBI2Reactome) through the Pathway model —
  * pathway classes subtyped cellular_process + pathway
  * (models/Pathway.py:30-47), direct component involvement
  * (addComponentToPathway, py:73-85) — plus a reified OBAN association
  * per row with the GAF evidence code resolved through the shipped
  * gaf-eco map (Reactome.py:91-146; an unmapped code logs an error and
  * the association ships without an evidence triple).
  *
  * Scale shape: two independent scan→project→explode families with no
  * joins at all — the eco map is a codegen'd map literal shipped with
  * the plan. The 17M-row production dumps stream straight through
  * whole-stage codegen; dedup happens once in the graph-level set-dedup.
  */
object ReactomeSource extends GraftSource {
  val name = "reactome"
  private val definedBy = "EX:reactome"

  private val cols = Seq("component", "pathway_id", "pathway_iri",
    "pathway_label", "go_ecode", "species_nam")
  private val schema =
    StructType(cols.map(StructField(_, StringType)))

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = Map(
    "ensembl2pathway" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/Ensembl2Reactome.tsv", schema,
        hasHeader = false)),
    "chebi2pathway" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/ChEBI2Reactome.tsv", schema,
        hasHeader = false)))

  /** One association file → pathway class + involvement + reified
    * association (the `_parse_reactome_association_file` /
    * `_add_component_pathway_association` pair, Reactome.py:107-163). */
  private def family(df: DataFrame, subjectPrefix: String,
                     ecoMap: Map[String, String]): DataFrame = {
    val g = graft.core.TranslationTable.default
    val pred = Vocab.involvedIn
    val rows = df
      .filter(coalesce(col("component"), lit("")) =!= "" &&
        coalesce(col("pathway_id"), lit("")) =!= "")
      .select(
        concat(lit(subjectPrefix + ":"), trim(col("component"))).as("gene"),
        concat(lit("REACT:"), trim(col("pathway_id"))).as("path"),
        trim(col("pathway_label")).as("plabel"),
        element_at(typedLit(ecoMap), trim(col("go_ecode"))).as("eco"))
      .withColumn("aid", concat(lit("_:"),
        Digest.md5Id(concat_ws("+", lit(definedBy), col("gene"), lit(pred),
          col("path")))))
    ColumnEmit.emitFiltered(rows,
      res(col("path"), lit(Vocab.a), lit(Vocab.owlClass)),
      str(col("path"), lit(Vocab.label), col("plabel")),
      res(col("path"), lit(Vocab.subClassOf),
        lit(g.resolve("cellular_process"))),
      res(col("path"), lit(Vocab.subClassOf), lit(g.resolve("pathway"))),
      res(col("gene"), lit(pred), col("path")),
      res(col("aid"), lit(Vocab.a), lit(Vocab.association)),
      res(col("aid"), lit(Vocab.assocHasSubject), col("gene")),
      res(col("aid"), lit(Vocab.assocHasPredicate), lit(pred)),
      res(col("aid"), lit(Vocab.assocHasObject), col("path")),
      res(col("aid"), lit(Vocab.hasEvidence), col("eco")))
  }

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    val ecoMap = graft.core.FlatYaml.fromResource("/graft/gaf_eco.yaml")
    family(graft.operators.ScanStats.widen(in("ensembl2pathway")), "ENSEMBL", ecoMap)
      .union(family(graft.operators.ScanStats.widen(in("chebi2pathway")), "CHEBI", ecoMap))
  }

  override def testIds: Seq[String] = Seq("REACT:R-HSA-201688")
}
