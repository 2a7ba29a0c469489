package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.{Digest, Vocab}
import graft.emit.ColumnEmit
import graft.emit.ColumnEmit.{res, str => strT}

/** The Monarch-curated OMIA disease→phenotype ingest
  * (dipper/sources/Monarch.py:93-202): a DIRECTORY of per-disease
  * six-digit .txt files — the reference lists the dir and loops files
  * (py:109-120); here one globbed scan reads every file in a single
  * distributed pass (each file carries its own header row, dropped by
  * the header option per file).
  *
  * Per row (py:131-193): rows with an empty Phenotype ID drop; the
  * disease id is the zero-filled OMIA number, suffixed `-<species>`
  * when a species id is present; the pubmed cell comma/semicolon-splits
  * with non-digits scrubbed into one dc:source per PMID, falling back
  * to the expanded OMIA URL + species path when empty (py:171-179);
  * pub-description / breed `[observed in]` / assay `[assay]` decorate
  * the association as dc:description and curator notes as rdfs:comment.
  *
  * Scale shape: single multi-file scan (splittable per file), zero
  * joins; the pubmed fan-out explodes after the scan.
  */
object MonarchSource extends GraftSource {
  val name = "monarch"
  private val definedBy = "EX:monarch"

  private val columns = Seq("Disease ID", "Species ID", "Breed Name",
    "Variant", "Inheritance", "Phenotype ID", "Phenotype Name", "Entity ID",
    "Entity Name", "Quality ID", "Quality Name", "Related Entity ID",
    "Related Entity Name", "Abnormal ID", "Abnormal Name", "Phenotype Desc",
    "Assay", "Frequency", "Pubmed ID", "Pub Desc", "Curator Notes",
    "Date Created")

  /** OMIA namespace for the no-pub fallback source IRI (Monarch.py:177-179
    * expands through curie_map['OMIA']). */
  private val omiaNs = "http://identifiers.org/omia/"

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = Map(
    "omia_d2p" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/OMIA-disease-phenotype/*.txt",
        StructType(columns.map(StructField(_, StringType))))))

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    val pred = Vocab.hasPhenotype
    val c = (n: String) => col(s"`$n`")

    val rows = graft.operators.ScanStats.widen(in("omia_d2p"))
      .filter(coalesce(trim(c("Phenotype ID")), lit("")) =!= "")
      .select(
        // zfill only when short (py:165-166) — Spark lpad would TRUNCATE
        // an over-long id, which the reference never does
        when(length(trim(c("Disease ID"))) < 6,
          lpad(trim(c("Disease ID")), 6, "0"))
          .otherwise(trim(c("Disease ID"))).as("dnum"),
        trim(coalesce(c("Species ID"), lit(""))).as("species"),
        trim(c("Phenotype ID")).as("phenotype"),
        trim(coalesce(c("Breed Name"), lit(""))).as("breed"),
        trim(coalesce(c("Assay"), lit(""))).as("assay"),
        trim(coalesce(c("Pubmed ID"), lit(""))).as("pubmed"),
        trim(coalesce(c("Pub Desc"), lit(""))).as("pubdesc"),
        trim(coalesce(c("Curator Notes"), lit(""))).as("notes"))
      .withColumn("disease",
        when(col("species") =!= "",
          concat(lit("OMIA:"), col("dnum"), lit("-"), col("species")))
        .otherwise(concat(lit("OMIA:"), col("dnum"))))
      .withColumn("aid", concat(lit("_:"), Digest.md5Id(concat_ws("+",
        lit(definedBy), col("disease"), lit(pred), col("phenotype")))))

    val assocTriples = ColumnEmit.emitFiltered(rows,
      res(col("disease"), lit(pred), col("phenotype")),
      res(col("aid"), lit(Vocab.a), lit(Vocab.association)),
      res(col("aid"), lit(Vocab.assocHasSubject), col("disease")),
      res(col("aid"), lit(Vocab.assocHasPredicate), lit(pred)),
      res(col("aid"), lit(Vocab.assocHasObject), col("phenotype")),
      strT(col("aid"), lit(Vocab.description),
        when(col("pubdesc") =!= "", col("pubdesc"))),
      strT(col("aid"), lit(Vocab.description),
        when(col("breed") =!= "", concat(col("breed"), lit(" [observed in]")))),
      strT(col("aid"), lit(Vocab.description),
        when(col("assay") =!= "", concat(col("assay"), lit(" [assay]")))),
      strT(col("aid"), lit(Vocab.comment),
        when(col("notes") =!= "", col("notes"))),
      // no-pub fallback: the expanded OMIA URL + species path (py:176-179)
      res(col("aid"), lit(Vocab.source),
        when(col("pubmed") === "",
          concat(lit(omiaNs), col("dnum"), lit("/"), col("species")))))

    // pubmed fan-out: comma/semicolon split, digits only (py:171-175)
    val sources = ColumnEmit.emit(
      rows.filter(col("pubmed") =!= "")
        .select(col("aid"),
          explode(split(col("pubmed"), "[,;]")).as("pnum"))
        .withColumn("pm", regexp_replace(col("pnum"), "[^0-9]", ""))
        .filter(col("pm") =!= ""),
      res(col("aid"), lit(Vocab.source), concat(lit("PMID:"), col("pm"))))

    assocTriples.union(sources)
  }

  override def testIds: Seq[String] = Seq("OMIA:000402-9615")
}
