package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.Vocab
import graft.emit.ColumnEmit
import graft.emit.ColumnEmit.{res, str => strT}

/** The GeneReviews ingest (dipper/sources/GeneReviews.py:97-231): the
  * NBK title/shortname file plus the NBK→OMIM id map, with the OMIM
  * mimTitles sidecar standing in for `self.omim_type` (the reference
  * holds the whole OMIM type dict in memory; here it's a prefix-typed
  * dimension the other sources already share).
  *
  * Semantics:
  * - titles rows type each GeneReviews book as a labeled class with its
  *   shortname as exact synonym (py:263-274);
  * - idmap rows re-assert the class + synonym and collect the book's
  *   OMIM ids, skipping malformed non-6-digit mims (py:146-181);
  * - every book subclasses 'disease or disorder' (py:230-231);
  * - an OMIM id subclasses its book ONLY when OMIM types it as a
  *   phenotype — mimTitles prefix Number Sign / Plus / Percent
  *   (py:184-229: replaced Caret mims are removed from the candidate
  *   set and gene-typed Asterisk mims filtered out, which reduces to
  *   exactly the phenotype-prefix gate);
  * - the manually-acquired book HTML is out of hermetic reach
  *   (NCBI Bookshelf prohibits scripted download, py:41-43); its
  *   clinical-description/PMID scrape is not modeled.
  *
  * Scale shape: two scans + one broadcast-dimension join; no shuffles
  * beyond the final distinct.
  */
object GeneReviewsSource extends GraftSource {
  val name = "genereviews"

  private def schemaOf(cols: Seq[String]) =
    StructType(cols.map(StructField(_, StringType)))

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = Map(
    // leading-'#' headers (py:141-143,258-259): read headerless + drop
    "titles" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/GRtitle_shortname_NBKid.txt",
        schemaOf(Seq("GR_shortname", "GR_Title", "NBK_id", "PMID")),
        hasHeader = false, comment = Some('#'))),
    "idmap" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/NBKid_shortname_OMIM.txt",
        schemaOf(Seq("NBK_id", "GR_shortname", "OMIM")),
        hasHeader = false, comment = Some('#'))),
    "omim_types" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/mimTitles.tsv",
        schemaOf(Seq("prefix", "mim_number", "preferred_title")),
        hasHeader = false)))

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    val g = graft.core.TranslationTable.default

    val titles = graft.operators.ScanStats.widen(in("titles"))
      .filter(coalesce(trim(col("NBK_id")), lit("")) =!= "")
      .select(concat(lit("GeneReviews:"), trim(col("NBK_id"))).as("gr_id"),
        trim(col("GR_Title")).as("title"),
        trim(col("GR_shortname")).as("shortname"))

    val titleTriples = ColumnEmit.emitFiltered(titles,
      res(col("gr_id"), lit(Vocab.a), lit(Vocab.owlClass)),
      strT(col("gr_id"), lit(Vocab.label), col("title")),
      strT(col("gr_id"), lit(Vocab.hasExactSynonym), col("shortname")),
      // addSubClass(gr_id, 'disease or disorder') per book (py:230-231)
      res(col("gr_id"), lit(Vocab.subClassOf),
        lit(g.resolve("disease or disorder"))))

    val idmap = graft.operators.ScanStats.widen(in("idmap"))
      .filter(coalesce(trim(col("NBK_id")), lit("")) =!= "")
      .select(trim(col("NBK_id")).as("nbk"),
        concat(lit("GeneReviews:"), trim(col("NBK_id"))).as("gr_id"),
        trim(col("GR_shortname")).as("shortname"),
        trim(col("OMIM")).as("omim_num"))
      // malformed mims skip the row entirely (py:160-166)
      .filter(col("omim_num").rlike("^[0-9]{6}$"))

    val idmapTriples = ColumnEmit.emitFiltered(idmap,
      res(col("gr_id"), lit(Vocab.a), lit(Vocab.owlClass)),
      strT(col("gr_id"), lit(Vocab.hasExactSynonym), col("shortname")))

    // phenotype-typed mims subclass their book; emission additionally
    // requires the book to exist in the titles file (the reference loops
    // over self.book_ids, py:219-229)
    val phenoMims = in("omim_types")
      .filter(col("prefix").isin("Number Sign", "Plus", "Percent"))
      .select(trim(col("mim_number")).as("pmim")).distinct()
    val books = titles.select(col("gr_id")).distinct()
    val subclassTriples = ColumnEmit.emit(
      idmap.join(phenoMims, idmap("omim_num") === phenoMims("pmim"))
        .join(books, "gr_id")
        .select(col("gr_id"), concat(lit("OMIM:"), col("omim_num")).as("omim")),
      res(col("omim"), lit(Vocab.a), lit(Vocab.owlClass)),
      res(col("omim"), lit(Vocab.subClassOf), col("gr_id")))

    titleTriples.union(idmapTriples).union(subclassTriples)
  }

  override def testIds: Seq[String] = Seq("GeneReviews:NBK1103")
}
