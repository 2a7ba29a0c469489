package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.Vocab
import graft.emit.ColumnEmit
import graft.emit.ColumnEmit.{res, str => strT}

/** The Elements-of-Morphology ingest (dipper/sources/EOM.py): the
  * crawled `dvp.pr_nlx_157874_1` view (landed as TSV by the Postgres
  * fetch — PostgreSQLSource COPY, same posture as MgiSource) plus the
  * curated HP↔EOM mapping file.
  *
  * Per term row (EOM.py:149-282): a labeled class whose definition
  * concatenates the objective and subjective definitions (each given a
  * trailing period when missing — py:225-235, two-space join), small
  * and large figure depictions, a comment, semicolon-split exact
  * synonyms plus related synonyms from `replaces` (skipped when equal
  * to the synonyms cell), a web-page typing and a foaf:page link.
  * Mapping rows (py:283-325): underscore→colon repair on the HP id,
  * then an owl:equivalentClass bridge (non-HP rows logged + dropped).
  *
  * Deviation: the reference appends the UNstripped tail tokens of
  * `replaces` (the `syn.strip()` result is discarded, py:262-268);
  * this engine strips them — same policy as SURVEY §1.3's note on not
  * replicating the streamed-writer default bug.
  */
object EomSource extends GraftSource {
  val name = "eom"

  private val tableColumns = Seq("morphology_term_id", "morphology_term_num",
    "morphology_term_label", "morphology_term_url",
    "terminology_category_label", "terminology_category_url", "subcategory",
    "objective_definition", "subjective_definition", "comments", "synonyms",
    "replaces", "small_figure_url", "large_figure_url", "e_uid", "v_uid",
    "v_uuid", "v_lastmodified", "v_status", "v_lastmodified_epoch")

  private def schemaOf(cols: Seq[String]) =
    StructType(cols.map(StructField(_, StringType)))

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = Map(
    "terms" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/dvp.pr_nlx_157874_1",
        schemaOf(tableColumns))),
    "hp_map" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/hp-to-eom-mapping.tsv",
        schemaOf(Seq("morphology_term_id", "morphology_term_label",
          "HP ID", "HP Label", "Notes")))))

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    val g = graft.core.TranslationTable.default

    def clean(c: Column): Column = trim(coalesce(c, lit("")))
    // trailing-period repair (EOM.py:225-235)
    def dotted(c: Column): Column =
      when(c =!= "" && !c.rlike("\\.$"), concat(c, lit("."))).otherwise(c)

    val terms = graft.operators.ScanStats.widen(in("terms")).select(
      clean(col("morphology_term_id")).as("id"),
      clean(col("morphology_term_label")).as("tlabel"),
      clean(col("morphology_term_url")).as("turl"),
      concat(dotted(clean(col("objective_definition"))), lit("  "),
        dotted(clean(col("subjective_definition")))).as("definition"),
      clean(col("comments")).as("comments"),
      clean(col("synonyms")).as("synonyms"),
      clean(col("replaces")).as("replaces"),
      clean(col("small_figure_url")).as("small_fig"),
      clean(col("large_figure_url")).as("large_fig"))
      .filter(col("id") =!= "")

    val termTriples = ColumnEmit.emitFiltered(terms,
      res(col("id"), lit(Vocab.a), lit(Vocab.owlClass)),
      strT(col("id"), lit(Vocab.label), col("tlabel")),
      strT(col("id"), lit(g.resolve("definition")), col("definition")),
      res(col("id"), lit(Vocab.depiction),
        when(col("small_fig") =!= "", col("small_fig"))),
      res(col("id"), lit(Vocab.depiction),
        when(col("large_fig") =!= "", col("large_fig"))),
      strT(col("id"), lit(Vocab.comment),
        when(col("comments") =!= "", col("comments"))),
      res(col("id"), lit(Vocab.a), lit(g.resolve("web page"))),
      res(col("id"), lit(Vocab.page),
        when(col("turl") =!= "", col("turl"))))

    val exactSyns = ColumnEmit.emit(
      terms.select(col("id"), explode(split(col("synonyms"), ";")).as("syn"))
        .withColumn("synT", trim(col("syn"))).filter(col("synT") =!= ""),
      strT(col("id"), lit(Vocab.hasExactSynonym), col("synT")))

    // replaces → related synonyms, skipped when identical to synonyms
    // (EOM.py:260-268)
    val relatedSyns = ColumnEmit.emit(
      terms.filter(col("replaces") =!= "" && col("replaces") =!= col("synonyms"))
        .select(col("id"), explode(split(col("replaces"), ";")).as("syn"))
        .withColumn("synT", trim(col("syn"))).filter(col("synT") =!= ""),
      strT(col("id"), lit(Vocab.hasRelatedSynonym), col("synT")))

    // HP equivalence: underscore repair, non-HP rows drop (EOM.py:305-321)
    val mapTriples = ColumnEmit.emit(
      in("hp_map").select(
          clean(col("morphology_term_id")).as("id"),
          translate(clean(col("`HP ID`")), "_", ":").as("hp"))
        .filter(col("hp").rlike("HP:")),
      res(col("hp"), lit(Vocab.a), lit(Vocab.owlClass)),
      res(col("id"), lit(Vocab.equivalentClass), col("hp")))

    termTriples.union(exactSyns).union(relatedSyns).union(mapTriples)
  }

  override def testIds: Seq[String] = Seq("EOM:0000061")
}
