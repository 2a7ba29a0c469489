package graft.engine

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.{Digest, TranslationTable, Vocab}
import graft.emit.ColumnEmit

/** BioGRID-shape zip-member ingest (dipper/sources/BioGrid.py — the
  * PSI-MI TAB archetype): `read` unpacks the mitab member from the zip
  * archive driver-stage into the fetch cache (py:126-131 `ZipFile` +
  * first-entry convention; the zip row of SURVEY §2.1's archive
  * formats), then scans the 15-column headerless mitab TSV
  * (`#`-comment header). Interactor ids route by regex —
  * `locuslink:` → NCBIGene, `biogrid:` → BIOGRID, `swiss-prot:` →
  * UniProtKB, anything else drops the row (py:209-233) — the PSI-MI
  * interaction-type code resolves to an RO relation and the
  * detection-method code to an ECO evidence class through the local
  * table with the reference's fallbacks (interacts-with /
  * experimental-evidence, py:174-190), `pubmed:` references rewrite to
  * PMID (py:183-185), and the taxon constraint keeps rows where BOTH
  * endpoints match (py:167-172).
  *
  * Scale shape: fully column-native — regex routing, map-literal
  * translation, and the reified-association fan-out all run inside
  * whole-stage codegen with zero joins; the graph set-dedup is the only
  * shuffle. This is the ColumnEmit scale tier (contrast the flatMap
  * emitter tier of GoGafSource/ImpcSource).
  */
object BiogridSource extends GraftSource {
  val name = "biogrid"

  private val cols = Seq("interactor_a", "interactor_b", "alt_ids_a",
    "alt_ids_b", "aliases_a", "aliases_b", "detection_method", "pub_author",
    "pub_id", "taxid_a", "taxid_b", "interaction_type", "source_db",
    "interaction_id", "confidence_val")
  private val schema = StructType(cols.map(StructField(_, StringType)))

  private lazy val tt = TranslationTable.forSource("biogrid")

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = {
    val zip = s"$dataDir/BIOGRID-ALL-LATEST.mitab.zip"
    val member =
      Paths.get(graft.sources.ZipSource.list(zip).head).getFileName.toString
    val extracted = graft.sources.ArchiveCache.cachedExtract(
      zip, "graft_biogrid", member)(
      scratch => graft.sources.ZipSource.extractMember(zip, scratch))
    Map("interactions" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(extracted.toString, schema,
        hasHeader = false, comment = Some('#'))))
  }

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame =
    transform(spark, in, Nil)

  override def transform(spark: SparkSession, in: Map[String, DataFrame],
                         taxa: Seq[String]): DataFrame = {
    val table = tt
    // interactor → gene curie routing (py:209-233): first matching regex
    // wins, unroutable interactors null out and drop the row
    def toCurie(c: org.apache.spark.sql.Column) = {
      val locus = regexp_extract(c, "locuslink:(\\d+)", 1)
      val bg = regexp_extract(c, "biogrid:(\\d+)", 1)
      val sp = regexp_extract(c, "swiss-prot:(\\S+?)(\\||$)", 1)
      when(locus =!= "", concat(lit("NCBIGene:"), locus))
        .when(bg =!= "", concat(lit("BIOGRID:"), bg))
        .when(sp =!= "", concat(lit("UniProtKB:"), sp))
    }
    val base = in("interactions").select(
      toCurie(col("interactor_a")).as("ga"),
      toCurie(col("interactor_b")).as("gb"),
      regexp_extract(col("interaction_type"), "MI:\\d+", 0).as("mi_type"),
      regexp_extract(col("detection_method"), "MI:\\d+", 0).as("mi_det"),
      trim(regexp_replace(col("pub_id"), "pubmed", "PMID")).as("pub"),
      regexp_extract(col("taxid_a"), "[^:]*$", 0).as("taxa_a"),
      regexp_extract(col("taxid_b"), "[^:]*$", 0).as("taxa_b"))
      .filter(col("ga").isNotNull && col("gb").isNotNull)
    val scoped =
      if (taxa.isEmpty) base
      else base.filter(col("taxa_a").isin(taxa: _*) &&
        col("taxa_b").isin(taxa: _*))
    val rows = scoped.select(col("ga"),
      table.resolveCol(col("mi_type"),
        default = Some(Vocab.interactsWith)).as("rel"),
      col("gb"),
      table.resolveCol(col("mi_det"),
        default = Some(TranslationTable.default
          .resolve("experimental evidence"))).as("ev"),
      col("pub"))
    val pre = rows.select(col("ga"), col("rel"), col("gb"), col("ev"),
      col("pub"),
      concat(lit("_:"), Digest.md5Id(concat_ws("+", lit("EX:biogrid"),
        col("ga"), col("rel"), col("gb")))).as("aid"))
    ColumnEmit.emit(pre,
      ColumnEmit.res(col("ga"), col("rel"), col("gb")),
      ColumnEmit.res(col("aid"), lit(Vocab.a), lit(Vocab.association)),
      ColumnEmit.res(col("aid"), lit(Vocab.assocHasSubject), col("ga")),
      ColumnEmit.res(col("aid"), lit(Vocab.assocHasPredicate), col("rel")),
      ColumnEmit.res(col("aid"), lit(Vocab.assocHasObject), col("gb")),
      ColumnEmit.res(col("aid"), lit(Vocab.hasEvidence), col("ev")),
      ColumnEmit.res(col("aid"), lit(Vocab.source), col("pub")))
  }

  override def testIds: Seq[String] = Seq("NCBIGene:351")
}
