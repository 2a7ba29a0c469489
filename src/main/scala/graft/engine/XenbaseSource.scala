package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.{Digest, Vocab}
import graft.emit.ColumnEmit
import graft.emit.ColumnEmit.{res, str => strT}

/** The Xenbase ingest (dipper/sources/Xenbase.py): three files —
  * the OBAN-shaped gene→XPO assertion dump, the genepage→gene trio
  * mapping, and the literature-matched-genes report.
  *
  * - g2p (py:106-166): each row is a ready-made OBAN assertion — the
  *   underscore relation repairs to a CURIE, the gene types + labels as
  *   an SO gene in its taxon, evidence and a journal-article source
  *   decorate the reified association;
  * - genepage2gene (py:168-213): every page lists the tropicalis /
  *   laevis-L / laevis-S gene triple, each typed + labeled;
  * - literature (py:215-257): the comma-split gene-page cell (token
  *   before the space is the id) joins the page dimension and every
  *   one of the page's three genes gets a PMID `mentions` link;
  *   pages missing from the mapping drop (the reference's KeyError →
  *   continue).
  *
  * Scale shape: three scans; the literature pass is one explode + one
  * broadcast join against the page dimension (gene-page count is
  * bounded); no other shuffles before the final distinct.
  */
object XenbaseSource extends GraftSource {
  val name = "xenbase"
  private val definedBy = "EX:xenbase"

  private val obanCols = Seq("SUBJECT", "SUBJECT_LABEL", "SUBJECT_TAXON",
    "SUBJECT_TAXON_LABEL", "OBJECT", "OBJECT_LABEL", "RELATION",
    "RELATION_LABEL", "EVIDENCE", "EVIDENCE_LABEL", "SOURCE",
    "IS_DEFINED_BY", "QUALIFIER")

  private def schemaOf(cols: Seq[String]) =
    StructType(cols.map(StructField(_, StringType)))

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = Map(
    "g2p_assertions" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/xb_xpo_spo_v_v1.tab",
        schemaOf(obanCols))),
    "genepage2gene" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/XenbaseGenepageToGeneIdMapping.txt",
        schemaOf(Seq("gene_page_id", "gene_page_label", "tropicalis_id",
          "tropicalis_label", "laevis_l_id", "laevis_l_label", "laevis_s_id",
          "laevis_s_label")), hasHeader = false)),
    "gene_literature" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/LiteratureMatchedGenesByPaper.txt",
        schemaOf(Seq("xb_article", "pmid", "gene_pages")),
        hasHeader = false)))

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    val g = graft.core.TranslationTable.default

    val g2p = graft.operators.ScanStats.widen(in("g2p_assertions"))
      .filter(coalesce(trim(col("SUBJECT")), lit("")) =!= "")
      .select(
        trim(col("SUBJECT")).as("gene"),
        trim(coalesce(col("SUBJECT_LABEL"), lit(""))).as("glabel"),
        trim(coalesce(col("SUBJECT_TAXON"), lit(""))).as("taxon"),
        trim(col("OBJECT")).as("phenotype"),
        translate(trim(col("RELATION")), "_", ":").as("rel"),
        trim(coalesce(col("EVIDENCE"), lit(""))).as("evidence"),
        trim(coalesce(col("SOURCE"), lit(""))).as("source"))
      .withColumn("aid", concat(lit("_:"), Digest.md5Id(concat_ws("+",
        lit(definedBy), col("gene"), col("rel"), col("phenotype")))))

    val g2pTriples = ColumnEmit.emitFiltered(g2p,
      res(col("gene"), lit(Vocab.a), lit(Vocab.gene)),
      strT(col("gene"), lit(Vocab.label),
        when(col("glabel") =!= "", col("glabel"))),
      res(col("gene"), lit(Vocab.inTaxon),
        when(col("taxon") =!= "", col("taxon"))),
      res(col("gene"), col("rel"), col("phenotype")),
      res(col("aid"), lit(Vocab.a), lit(Vocab.association)),
      res(col("aid"), lit(Vocab.assocHasSubject), col("gene")),
      res(col("aid"), lit(Vocab.assocHasPredicate), col("rel")),
      res(col("aid"), lit(Vocab.assocHasObject), col("phenotype")),
      res(col("aid"), lit(Vocab.hasEvidence),
        when(col("evidence") =!= "", col("evidence"))),
      res(col("aid"), lit(Vocab.source),
        when(col("source") =!= "", col("source"))),
      res(when(col("source") =!= "", col("source")), lit(Vocab.a),
        lit(g.resolve("journal article"))))

    val pages = in("genepage2gene")
      .filter(coalesce(trim(col("gene_page_id")), lit("")) =!= "")
      .select(trim(col("gene_page_id")).as("page"),
        concat(lit("Xenbase:"), trim(col("tropicalis_id"))).as("trop"),
        trim(coalesce(col("tropicalis_label"), lit(""))).as("tropL"),
        concat(lit("Xenbase:"), trim(col("laevis_l_id"))).as("lvl"),
        trim(coalesce(col("laevis_l_label"), lit(""))).as("lvlL"),
        concat(lit("Xenbase:"), trim(col("laevis_s_id"))).as("lvs"),
        trim(coalesce(col("laevis_s_label"), lit(""))).as("lvsL"))

    val pageGenes = pages.select(col("page"), explode(array(
      struct(col("trop").as("gid"), col("tropL").as("glabel")),
      struct(col("lvl").as("gid"), col("lvlL").as("glabel")),
      struct(col("lvs").as("gid"), col("lvsL").as("glabel")))).as("t"))
      .select(col("page"), col("t.gid"), col("t.glabel"))

    val pageGeneTriples = ColumnEmit.emitFiltered(pageGenes,
      res(col("gid"), lit(Vocab.a), lit(Vocab.gene)),
      strT(col("gid"), lit(Vocab.label),
        when(col("glabel") =!= "", col("glabel"))))

    // literature: comma-split pages, id = token before ' ', KeyError-
    // style drop via inner join (py:238-252)
    val mentions = graft.operators.ScanStats.widen(in("gene_literature"))
      .filter(coalesce(trim(col("pmid")), lit("")) =!= "")
      .select(concat(lit("PMID:"), trim(col("pmid"))).as("pmid"),
        explode(split(coalesce(col("gene_pages"), lit("")), ",")).as("gp"))
      .withColumn("page", split(trim(col("gp")), " ")(0))
      .filter(col("page") =!= "")
      .join(pageGenes.select(col("page"), col("gid")), "page")

    val mentionTriples = ColumnEmit.emit(mentions,
      res(col("pmid"), lit(g.resolve("mentions")), col("gid")))

    g2pTriples.union(pageGeneTriples).union(mentionTriples)
  }

  override def testIds: Seq[String] = Seq("Xenbase:XB-GENE-1000632")
}
