package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.{Digest, TranslationTable, Triple, Vocab}
import graft.emit.{Assoc, Genotype, Model, Provenance}

/** MPD-shape ingest (dipper/sources/MPD.py — the statistical-threshold
  * source): per-strain phenotype measurements become G2P associations
  * only where the strain's mean is an OUTLIER among all strains measured
  * on the same (assay, sex) — |z| ≥ 2 standard deviations
  * (MPD.py:35,138 `stdevthreshold`). The four-file manifest mirrors the
  * reference's (strainmeans / assay metadata / ontology mappings /
  * straininfo, py:80-120); only assays with ontology mappings emit
  * (py:440-447), each passing score producing assay provenance
  * (py:442-445), a strain genotype + sex-specific genotype bnode pair
  * (py:459-505 `_add_g2p_assoc`), and per-phenotype associations
  * carrying the assay and experimental-phenotypic-evidence codes, a
  * zscore comment, and sex specificity (py:507-521).
  *
  * Spark-first re-derivation, the one deliberate divergence: the
  * reference consumes the file's PRECOMPUTED `zscore` column (py:363);
  * here the z-score is computed in-engine — groupBy (assay, sex) →
  * avg/stddev over the strain means → broadcast back — which is the
  * aggregation a 100 TB measurement corpus needs (the tiny per-assay
  * stats frame broadcasts; no shuffle touches the wide side twice).
  * Zero-variance assays are skipped (a guard the reference never needs).
  * EngineSpec cross-checks the computed z against the file column on
  * the fixture. The zscore comment formats with `%.2f` (the reference
  * prints Python float repr, py:429-430).
  */
object MpdSource extends GraftSource {
  val name = "mpd"

  private def schemaOf(names: String*) =
    StructType(names.map(StructField(_, StringType)))

  private val strainmeansSchema = schemaOf("measnum", "varname", "strain",
    "strainid", "sex", "mean", "nmice", "sd", "sem", "cv", "minval",
    "maxval", "zscore")
  private val metaSchema = schemaOf("measnum", "descrip", "units", "method")
  private val ontSchema = schemaOf("measnum", "ont_term")
  private val strainSchema = schemaOf("strainid", "strainname")

  private lazy val tt = TranslationTable.forSource("mpd")

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = {
    import graft.sources.{DelimitedSource, SourceFile}
    Map(
      "strainmeans" -> DelimitedSource.read(spark,
        SourceFile(s"$dataDir/strainmeans.csv*", strainmeansSchema, ",")),
      "assay_metadata" -> DelimitedSource.read(spark,
        SourceFile(s"$dataDir/measurements.csv", metaSchema, ",")),
      "ontology_mappings" -> DelimitedSource.read(spark,
        SourceFile(s"$dataDir/ontology_mappings.csv", ontSchema, ",")),
      "straininfo" -> DelimitedSource.read(spark,
        SourceFile(s"$dataDir/straininfo.csv", strainSchema, ",")))
  }

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame =
    transformDigest(spark, in, Digest.sha1IdScala)

  case class MpdRow(measnum: String, strainid: String, sex: String, z: Double,
                    phenotypes: Seq[String], descrip: String, units: String,
                    method: String, strainname: String)

  private[graft] def transformDigest(spark: SparkSession,
                                     in: Map[String, DataFrame],
                                     digest: String => String): DataFrame = {
    import spark.implicits._
    val table = tt
    val eco = TranslationTable.default.resolve("experimental phenotypic evidence")
    val sm = in("strainmeans").select(col("measnum"), col("strainid"),
      col("sex"), col("mean").cast("double").as("mean"))
    // per-(assay, sex) population stats over strain means — the stats
    // frame is assay-count-sized, so it broadcasts back to the wide side
    val stats = sm.groupBy("measnum", "sex")
      .agg(avg("mean").as("mu"), stddev_samp("mean").as("sigma"))
    val scored = sm.join(broadcast(stats), Seq("measnum", "sex"))
      .filter(col("sigma") > 0)
      .withColumn("z", (col("mean") - col("mu")) / col("sigma"))
      .filter(abs(col("z")) >= 2.0)
    val onts = in("ontology_mappings")
      .groupBy("measnum").agg(collect_list("ont_term").as("phenotypes"))
    val rows = scored
      .join(broadcast(onts), Seq("measnum")) // only with-ontologies emit
      .join(broadcast(in("assay_metadata")), Seq("measnum"))
      .join(broadcast(in("straininfo")), Seq("strainid"))
      .select(col("measnum"), col("strainid"), col("sex"), col("z"),
        col("phenotypes"), col("descrip"), col("units"), col("method"),
        col("strainname"))
    rows.as[MpdRow].flatMap { r =>
      val assayId = s"MPD-assay:${r.measnum}"
      val strainCurie = s"MPD-strain:${r.strainid}"
      val gtId = "_:" + digest(s"MPD-strain${r.strainid}-genotype")
      val ssgId = "_:" + digest(s"MPD-strain${r.strainid}-${r.sex}-genotype")
      val ssgType = r.sex match {
        case "m" => TranslationTable.default.resolve("male intrinsic genotype")
        case "f" => TranslationTable.default.resolve("female intrinsic genotype")
        case _ => TranslationTable.default.resolve("sex_qualified_genotype")
      }
      val comment = f"${r.descrip} (zscore=${r.z}%.2f)"
      Provenance.assay(assayId, s"${r.descrip} (${r.measnum})",
        s"${r.descrip} [${r.units}] via ${r.method}") ++
        Genotype.addGenotype(gtId, s"[${r.strainname}]",
          TranslationTable.default.resolve("genomic_background")) ++
        Model.addTriple(strainCurie,
          TranslationTable.default.resolve("has_genotype"), gtId) ++
        Genotype.addGenotype(ssgId, s"${r.strainname} (${r.sex})", ssgType) ++
        Model.addTriple(ssgId,
          TranslationTable.default.resolve("has_sex_agnostic_part"), gtId) ++
        r.phenotypes.flatMap { ph =>
          val aid = "_:" + digest(
            Seq("EX:mpd", ssgId, Vocab.hasPhenotype, ph).mkString("+"))
          Assoc.g2p("EX:mpd", ssgId, ph,
            evidence = Seq(assayId, eco), digest = digest) ++
            Model.addComment(aid, comment) ++
            Model.addSexSpecificity(aid,
              table.resolve(r.sex, mandatory = false))
        }
    }.toDF()
  }

  override def testIds: Seq[String] = Seq("MPD-strain:9")
}
