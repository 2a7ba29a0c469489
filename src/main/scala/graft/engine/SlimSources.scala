package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.{Digest, Vocab}
import graft.emit.ColumnEmit
import graft.emit.ColumnEmit.{res, str => strT, typed => typedT}

/** The two "slim" gene→phenotype ingests (dipper/sources/ZFINSlim.py,
  * dipper/sources/MGISlim.py): deliberately minimal G2P models that the
  * reference derives from one clean file (ZFIN) or a mousemine API query
  * (MGI), re-expressed as single-scan columnar plans.
  */

/** ZFINSlim (ZFINSlim.py:82-163): the phenoGeneCleanData file joined
  * against the curated EQ-octuple→ZP mapping dimension.
  *
  * The reference loads `id_map_zfin.tsv` into a dict keyed by a digest of
  * the hyphen-joined octuple with empty slots written '0'
  * (ZFIN.py:2765-2772) and probes it per row
  * (`_map_octuple_to_phenotype`, ZFIN.py:2721-2752). Here both sides
  * derive the same join key and Catalyst broadcasts the mapping (a
  * curated file, thousands of rows — far under the broadcast threshold;
  * no hint needed, size stats suffice).
  *
  * Row semantics (ZFINSlim.py:134-163): rows whose Phenotype Tag is not
  * 'abnormal' are skipped; the modifier resolves to the PATO abnormal
  * class before keying (ZFIN.py:2743); unmapped octuples drop (zp_id
  * None). Each mapped row emits the gene as clique leader, the G2P
  * association with experimental-phenotypic evidence, and — when a
  * publication is present — a document-typed reference as dc:source.
  */
object ZfinSlimSource extends GraftSource {
  val name = "zfinslim"
  private val definedBy = "EX:zfinslim"

  /** phenoGeneCleanData_fish.txt columns (ZFINSlim.py:19-49). */
  private val g2pColumns = Seq("ID", "Gene Symbol", "Gene ID",
    "Affected Structure or Process 1 subterm ID",
    "Affected Structure or Process 1 subterm Name",
    "Post-composed Relationship ID", "Post-composed Relationship Name",
    "Affected Structure or Process 1 superterm ID",
    "Affected Structure or Process 1 superterm Name",
    "Phenotype Keyword ID", "Phenotype Keyword Name", "Phenotype Tag",
    "Affected Structure or Process 2 subterm ID",
    "Affected Structure or Process 2 subterm name",
    "Post-composed Relationship (rel) ID",
    "Post-composed Relationship (rel) Name",
    "Affected Structure or Process 2 superterm ID",
    "Affected Structure or Process 2 superterm name",
    "Fish ID", "Fish Display Name", "Start Stage ID", "End Stage ID",
    "Fish Environment ID", "Publication ID", "Figure ID")

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = Map(
    "g2p_clean" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/phenoGeneCleanData_fish.txt",
        StructType(g2pColumns.map(StructField(_, StringType))),
        hasHeader = false)),
    "zpmap" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/id_map_zfin.tsv",
        StructType(Seq(StructField("iri", StringType),
          StructField("id", StringType))),
        hasHeader = false)))

  /** PATO class of the only modifier the clean file carries
    * (ZFIN.py:2799 — "id_map_zfin.tsv only contains data for abnormal
    * phenotypes"; resolve('abnormal'), ZFIN.py:2743). */
  private val abnormal = graft.core.TranslationTable.default.resolve("abnormal")

  private def zeroed(c: Column): Column =
    when(coalesce(trim(c), lit("")) === "", lit("0")).otherwise(trim(c))

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    // mapping side: the id column is the hyphen-joined 7-slot EQ tuple
    // (empties already '0' in the curated file); the modifier slot the
    // reference appends is constant, so it cancels on both sides
    val zpDim = in("zpmap")
      .select(col("iri").as("zp_id"), col("id").as("zpkey"))
      .filter(col("zpkey").isNotNull)

    val c = (n: String) => col(s"`$n`")
    val rows = graft.operators.ScanStats.widen(in("g2p_clean"))
      .filter(trim(coalesce(c("Phenotype Tag"), lit(""))) === "abnormal")
      .select(
        concat(lit("ZFIN:"), trim(c("Gene ID"))).as("gene"),
        concat_ws("-",
          zeroed(c("Affected Structure or Process 1 subterm ID")),
          zeroed(c("Post-composed Relationship ID")),
          zeroed(c("Affected Structure or Process 1 superterm ID")),
          zeroed(c("Phenotype Keyword ID")),
          zeroed(c("Affected Structure or Process 2 subterm ID")),
          zeroed(c("Post-composed Relationship (rel) ID")),
          zeroed(c("Affected Structure or Process 2 superterm ID"))).as("zpkey"),
        trim(coalesce(c("Publication ID"), lit(""))).as("pubid"))
      .join(zpDim, "zpkey") // inner: unmapped octuples drop (ZFINSlim.py:152)
      .withColumn("aid", concat(lit("_:"), Digest.md5Id(concat_ws("+",
        lit(definedBy), col("gene"), lit(Vocab.hasPhenotype), col("zp_id")))))
      .withColumn("pub",
        when(col("pubid") =!= "", concat(lit("ZFIN:"), col("pubid"))))

    val g = graft.core.TranslationTable.default
    ColumnEmit.emitFiltered(rows,
      res(col("gene"), lit(Vocab.hasPhenotype), col("zp_id")),
      res(col("aid"), lit(Vocab.a), lit(Vocab.association)),
      res(col("aid"), lit(Vocab.assocHasSubject), col("gene")),
      res(col("aid"), lit(Vocab.assocHasPredicate), lit(Vocab.hasPhenotype)),
      res(col("aid"), lit(Vocab.assocHasObject), col("zp_id")),
      res(col("aid"), lit(Vocab.hasEvidence),
        lit(g.resolve("experimental phenotypic evidence"))),
      // gene is the clique leader (Model.makeLeader, ZFINSlim.py:150)
      typedT(col("gene"), lit(g.resolve("clique_leader")), lit("true"),
        "xsd:boolean"),
      res(col("aid"), lit(Vocab.source), col("pub")),
      res(col("pub"), lit(Vocab.a), lit(g.resolve("document"))))
  }

  override def testIds: Seq[String] = Seq("ZFIN:ZDB-GENE-980526-166")
}

/** MGISlim (MGISlim.py:45-98): the mousemine OntologyAnnotation query —
  * gene/MP-term/publication rows — over the landed API reply (the
  * intermine fetch is driver-side; executors read the landed TSV, the
  * same posture as the OMIM keyed API, OmimApiSource).
  *
  * Per row (MGISlim.py:72-88): the gene types as SO gene and into the
  * mouse taxon; the G2P association carries experimental-phenotypic
  * evidence and — when the evidence row has a PubMed id — a
  * journal-article-typed PMID as dc:source.
  */
object MgiSlimSource extends GraftSource {
  val name = "mgislim"
  private val definedBy = "EX:mgislim"

  /** The add_view column list of the intermine query (MGISlim.py:60-65). */
  private val columns = Seq("subject.primaryIdentifier", "subject.symbol",
    "subject.sequenceOntologyTerm.name", "ontologyTerm.identifier",
    "ontologyTerm.name", "evidence.publications.pubMedId",
    "evidence.comments.type", "evidence.comments.description")

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = Map(
    "annotations" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/mousemine_annotations.tsv",
        StructType(columns.map(StructField(_, StringType))),
        hasHeader = false)))

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    val g = graft.core.TranslationTable.default
    val mouse = g.resolve("Mus musculus")

    val rows = graft.operators.ScanStats.widen(in("annotations"))
      .select(
        trim(col("`subject.primaryIdentifier`")).as("gene"),
        trim(col("`ontologyTerm.identifier`")).as("mp"),
        trim(coalesce(col("`evidence.publications.pubMedId`"), lit("")))
          .as("pmid"))
      .filter(col("gene") =!= "" && col("mp") =!= "")
      .withColumn("aid", concat(lit("_:"), Digest.md5Id(concat_ws("+",
        lit(definedBy), col("gene"), lit(Vocab.hasPhenotype), col("mp")))))
      .withColumn("pub",
        when(col("pmid") =!= "", concat(lit("PMID:"), col("pmid"))))

    ColumnEmit.emitFiltered(rows,
      res(col("gene"), lit(Vocab.a), lit(Vocab.gene)),
      res(col("gene"), lit(Vocab.inTaxon), lit(mouse)),
      res(col("gene"), lit(Vocab.hasPhenotype), col("mp")),
      res(col("aid"), lit(Vocab.a), lit(Vocab.association)),
      res(col("aid"), lit(Vocab.assocHasSubject), col("gene")),
      res(col("aid"), lit(Vocab.assocHasPredicate), lit(Vocab.hasPhenotype)),
      res(col("aid"), lit(Vocab.assocHasObject), col("mp")),
      res(col("aid"), lit(Vocab.hasEvidence),
        lit(g.resolve("experimental phenotypic evidence"))),
      res(col("aid"), lit(Vocab.source), col("pub")),
      res(col("pub"), lit(Vocab.a), lit(g.resolve("journal article"))))
  }

  override def testIds: Seq[String] = Seq("MGI:97486")
}
