package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.{Digest, Vocab}
import graft.emit.ColumnEmit
import graft.emit.ColumnEmit.{res, typed => typedT}

/** The RGD-shape gene→phenotype GAF ingest (dipper/sources/RGD.py):
  * the rat gene ↔ mammalian-phenotype annotation file (GAF v2.1)
  * re-expressed as a columnar plan instead of the reference's ontobio
  * GafParser loop.
  *
  * Per annotation (RGD.py:104-151): subject `DB:DB_Object_ID`
  * has-phenotype the MP term in the GO-ID column; the pipe-split
  * reference list is rewritten so non-PMID RGD report ids route
  * through the RGDRef prefix (py:122-126), the FIRST reference becomes
  * the association's dc:source and a typed publication, and every
  * further reference is owl:sameAs the first (py:128-143); the GAF
  * date decorates the association as an xsd:date literal and the
  * evidence code resolves through the two-layer rgd table
  * (tt/rgd.yaml). NOT-qualified rows drop (the ontobio parse yields no
  * relation for them). The reference resolves `has phenotype` per row
  * (py:112) — a constant here.
  *
  * Scale shape: single scan, zero joins; reference fan-out explodes
  * after the scan; digests and routing codegen'd end to end.
  */
object RgdSource extends GraftSource {
  val name = "rgd"
  private val definedBy = "EX:rgd"

  /** GAF v2.1 columns (RGD.py:25-44). */
  private val columns = Seq("DB", "DB_Object_ID", "DB_Object_Symbol",
    "Qualifier", "GO_ID", "DB_Reference", "Evidence_Code", "With_From",
    "Aspect", "DB_Object_Name", "DB_Object_Synonym", "DB_Object_Type",
    "Taxon", "Date", "Assigned_By", "Annotation_Extension",
    "Gene_Product_Form_ID")

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = Map(
    "rat_gene2mammalian_phenotype" -> graft.sources.DelimitedSource.read(
      spark, graft.sources.SourceFile(s"$dataDir/rattus_genes_mp.gaf",
        StructType(columns.map(StructField(_, StringType))),
        hasHeader = false, comment = Some('!'))))

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    val tt = graft.core.TranslationTable.forSource("rgd")
    val pred = Vocab.hasPhenotype

    // non-PMID references route through the RGD report prefix
    // (py:122-126) — applied SCALAR-wise (on ref0 and the exploded
    // tail), not via a higher-order array transform: HOF expressions
    // carry no doGenCode and would drop the scan projection out of
    // whole-stage codegen (see ColumnEmit.emitFiltered)
    def reroute(c: org.apache.spark.sql.Column) =
      when(c.contains("PMID"), c).otherwise(regexp_replace(c, "RGD", "RGDRef"))

    val rows = graft.operators.ScanStats.widen(in("rat_gene2mammalian_phenotype"))
      .filter(Seq("DB", "DB_Object_ID", "GO_ID", "Evidence_Code")
        .map(c => coalesce(col(c), lit("")) =!= "").reduce(_ && _))
      .filter(!coalesce(col("Qualifier"), lit("")).rlike("NOT"))
      .select(
        concat(col("DB"), lit(":"), col("DB_Object_ID")).as("gene"),
        col("GO_ID").as("phenotype"),
        tt.resolveCol(col("Evidence_Code")).as("eco"),
        coalesce(col("Date"), lit("")).as("gdate"),
        split(coalesce(col("DB_Reference"), lit("")), "\\|").as("refs"))
      .withColumn("aid", concat(lit("_:"), Digest.md5Id(concat_ws("+",
        lit(definedBy), col("gene"), lit(pred), col("phenotype")))))
      .withColumn("ref0",
        when(element_at(col("refs"), 1) =!= "",
          reroute(element_at(col("refs"), 1))))

    val assocTriples = ColumnEmit.emitFiltered(rows,
      res(col("gene"), lit(pred), col("phenotype")),
      res(col("aid"), lit(Vocab.a), lit(Vocab.association)),
      res(col("aid"), lit(Vocab.assocHasSubject), col("gene")),
      res(col("aid"), lit(Vocab.assocHasPredicate), lit(pred)),
      res(col("aid"), lit(Vocab.assocHasObject), col("phenotype")),
      res(col("aid"), lit(Vocab.hasEvidence), col("eco")),
      typedT(col("aid"), lit("dc:date"),
        when(col("gdate") =!= "", col("gdate")), "xsd:date"),
      res(col("aid"), lit(Vocab.source), col("ref0")),
      res(col("ref0"), lit(Vocab.a),
        lit(graft.core.TranslationTable.default.resolve("publication"))))

    // every non-first reference is owl:sameAs the first (RGD.py:137-143)
    val sameAs = ColumnEmit.emit(
      rows.filter(size(col("refs")) > 1)
        .select(col("ref0"),
          explode(slice(col("refs"), 2, Int.MaxValue)).as("refN"))
        .filter(col("refN") =!= "" && col("ref0").isNotNull),
      res(col("ref0"), lit(Vocab.sameAs), reroute(col("refN"))))

    assocTriples.union(sameAs)
  }

  override def testIds: Seq[String] = Seq("RGD:2004")
}
