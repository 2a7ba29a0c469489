package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Digest, TranslationTable, Triple, Vocab}
import graft.emit.{Assoc, Model}

/** Panther-shape real ingest (dipper/sources/Panther.py — the tar.gz
  * member archetype): the pairwise-ortholog dump ships as a member of
  * `RefGenomeOrthologs.tar.gz`. `read` unpacks the member driver-stage
  * into the fetch cache (Panther.py:178-182 `tarfile.open` +
  * `extractfile`; SURVEY §2.1 gzip/tar row), then scans the headerless
  * TSV with a declared schema. Each row's pipe-packed gene fields
  * (`HUMAN|Ensembl=ENSG..|UniProtKB=Q..`) are split in-plan; species
  * abbreviations and orthology-type codes resolve through the panther
  * localtt (Panther.py:213-215, 250); gene ids get the reference's
  * rewrite rules (`_clean_up_gene_id` py:287-332: keep last two colon
  * tokens, Ensembl→ENSEMBL, GeneID→NCBIGene, unknown prefixes drop the
  * row); the `--taxon` constraint keeps rows where EITHER side matches
  * (the reference's some-filter, py:221-226).
  *
  * Scale shape: pure per-row column work + one flatMap emission — no
  * aggregation, no shuffle; the tar unpack is a one-time driver stage
  * exactly like the reference's fetch phase.
  */
object PantherSource extends GraftSource {
  val name = "panther"

  import org.apache.spark.sql.types.{StringType, StructField, StructType}
  private val schema = StructType(Seq(
    "Gene", "Ortholog", "OrthologType", "CommonAncestor", "PantherID")
    .map(StructField(_, StringType)))

  private val Member = "RefGenomeOrthologs"

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = {
    val tar = s"$dataDir/RefGenomeOrthologs.tar.gz"
    val extracted = graft.sources.ArchiveCache.cachedExtract(
      tar, "graft_panther", Member)(
      scratch => graft.sources.TarSource.extractMember(tar, Member, scratch))
    Map("ref_genome_orthologs" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(extracted.toString, schema,
        hasHeader = false)))
  }

  private lazy val tt = TranslationTable.forSource("panther")

  /** _clean_up_gene_id py:287-332 (the common branch; model-organism
    * special cases route by species). Returns None for prefixes outside
    * the curie map — the reference drops those rows. */
  private[engine] def cleanGeneId(raw: String, species: String,
                                  cm: graft.core.CurieMap): Option[String] = {
    val id0 = raw.replace("=", ":")
    val id1 = id0.split(":").takeRight(2).mkString(":")
    val id = species match {
      case "CAEEL" if id1.startsWith("EnsemblGenome:") =>
        "WormBase:" + id1.stripPrefix("EnsemblGenome:")
      case "DROME" if id1.startsWith("EnsemblGenome:") =>
        "FlyBase:" + id1.stripPrefix("EnsemblGenome:")
      case _ if id1.startsWith("Ensembl:") =>
        "ENSEMBL:" + id1.stripPrefix("Ensembl:")
      case _ if id1.startsWith("GeneID:") =>
        "NCBIGene:" + id1.stripPrefix("GeneID:")
      case _ if id1.startsWith("Gene:ENS") => id1.stripPrefix("Gene:") match {
        case e => "ENSEMBL:" + e
      }
      case _ => id1
    }
    Some(id).filter(g => cm.prefixes.contains(g.takeWhile(_ != ':')))
  }

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame =
    transform(spark, in, Nil)

  override def transform(spark: SparkSession, in: Map[String, DataFrame],
                         taxa: Seq[String]): DataFrame = {
    import spark.implicits._
    val cm = Runner.curieMap
    val evidence = TranslationTable.default.resolve("phylogenetic evidence")
    val rows = in("ref_genome_orthologs").select(
      split(col("Gene"), "\\|").as("g1"),
      split(col("Ortholog"), "\\|").as("g2"),
      col("OrthologType").as("otype"),
      col("PantherID").as("pid"))
    rows
      .select(element_at(col("g1"), 1).as("sp1"),
        element_at(col("g1"), 2).as("gene1"),
        element_at(col("g2"), 1).as("sp2"),
        element_at(col("g2"), 2).as("gene2"),
        col("otype"), col("pid"))
      .as[(String, String, String, String, String, String)]
      .flatMap { case (sp1, g1raw, sp2, g2raw, otype, pid) =>
        val taxonA = tt.resolve(sp1, mandatory = false)
        val taxonB = tt.resolve(sp2, mandatory = false)
        // some-filter: keep the pair when either side's taxon matches
        val keep = taxa.isEmpty ||
          taxa.exists(t => t == taxonA || t == taxonB ||
            taxonA.endsWith(":" + t) || taxonB.endsWith(":" + t))
        if (!keep) Nil
        else (cleanGeneId(g1raw, sp1, cm), cleanGeneId(g2raw, sp2, cm)) match {
          case (Some(geneA), Some(geneB)) =>
            val rel = tt.resolve(otype, mandatory = false,
              default = Some(Vocab.inOrthologyRelationshipWith))
            val fam = Option(pid).filter(_.nonEmpty).map("PANTHER:" + _)
            val assocId = "_:" + Digest.assocIdScala("EX:panther",
              geneA, rel, geneB)
            Assoc.orthology("EX:panther", geneA, geneB, rel, family = fam) ++
              Model.addType(geneA, Vocab.gene) ++
              Model.addType(geneB, Vocab.gene) :+
              Triple.res(assocId, Vocab.hasEvidence, evidence)
          case _ => Nil // unmapped gene id — the reference skips the row
        }
      }.toDF()
  }
  override def testIds: Seq[String] = Seq("NCBIGene:1017")
}
