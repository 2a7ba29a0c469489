package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.{Digest, TranslationTable, Triple, Vocab}
import graft.emit.{Assoc, Genotype, Model}

/** IMPC-shape statistical-evidence ingest (dipper/sources/IMPC.py — the
  * one reference source whose evidence is quantitative): the
  * genotype-phenotype assertion dump (28-column csv.gz manifest,
  * IMPC.py:68-96) becomes sex-qualified-genotype→phenotype associations
  * decorated with a full SEPIO chain — a study bnode digested from its
  * eight defining fields (py:593-637), procedure/parameter/pipeline
  * IMPRESS individuals, the phenotyping-center agent and project links
  * resolved through the local table, an evidence line per
  * (association, study) carrying p-value / percentage-change /
  * effect-size measurement bnodes (py:697-765), and assertion-level
  * provenance naming the consortium (py:561-591). The free-text
  * description reproduces the reference's number formatting: effect size
  * rounded to 5 places, p-value in `{:.4e}` scientific form, raw-string
  * fallback for unparseable values (py:525-539).
  *
  * Shape simplification (documented like ZfinGenotypeSource's two-allele
  * note): the colony/ES-cell/GVC intermediate assembly of IMPC.py:281-495
  * is compressed to gene → allele(variant locus) → genotype →
  * sex-qualified genotype, with the genomic background and colony
  * attached at the genotype level; ids follow the reference's digest
  * discipline (every synthetic node is a content-digest bnode), so the
  * chain stays deterministic and partition-safe.
  *
  * Scale shape: no joins at all — one declared scan, per-row column work
  * and a flatMap emission; every bnode id is minted from row content, so
  * the emission parallelizes embarrassingly and the graph set-dedup is
  * the only shuffle.
  */
object ImpcSource extends GraftSource {
  val name = "impc"

  private val cols = Seq("marker_accession_id", "marker_symbol",
    "phenotyping_center", "colony_id", "sex", "zygosity",
    "allele_accession_id", "allele_symbol", "allele_name",
    "strain_accession_id", "strain_name", "project_name", "project_fullname",
    "pipeline_name", "pipeline_stable_id", "procedure_stable_id",
    "procedure_name", "parameter_stable_id", "parameter_name",
    "top_level_mp_term_id", "top_level_mp_term_name", "mp_term_id",
    "mp_term_name", "p_value", "percentage_change", "effect_size",
    "statistical_method", "resource_name")
  private val schema = StructType(cols.map(StructField(_, StringType)))

  private lazy val tt = TranslationTable.forSource("impc")

  /** Center/consortium/project agent IRIs (the agent-IRI half of the
    * reference's impc localtt, IMPC.py:656-695,574-580). */
  private[engine] lazy val agents: Map[String, String] =
    graft.core.FlatYaml.fromResource("/graft/impc_agents.yaml")

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = Map(
    "g2p_assertions" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(
        s"$dataDir/genotype-phenotype-assertions-ALL.csv*", schema,
        delimiter = ",")))

  case class ImpcRow(marker: String, markerSymbol: String, center: String,
                     colony: String, sex: String, zygosity: String,
                     allele: String, alleleSymbol: String, strain: String,
                     strainName: String, project: String, pipelineName: String,
                     pipelineId: String, procedureId: String,
                     procedureName: String, parameterId: String,
                     parameterName: String, mp: String, mpName: String,
                     pValue: String, pctChange: String, effectSize: String,
                     statMethod: String, resourceName: String)

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame =
    transformDigest(spark, in, Digest.sha1IdScala)

  /** Digest-parameterized twin: the reference's sha1 `make_id` by
    * default; the p09 oracle passes [[Digest.md5IdScala]] so DuckDB can
    * re-derive every bnode in the chain. */
  private[graft] def transformDigest(spark: SparkSession,
                                     in: Map[String, DataFrame],
                                     digest: String => String): DataFrame = {
    import spark.implicits._
    val local = agents
    val taxonId = TranslationTable.default.resolve("Mus musculus")
    val ecoId = TranslationTable.default.resolve("mutant phenotype evidence")
    def bnode(s: String): String = "_:" + digest(s)

    in("g2p_assertions")
      // rows without a phenotype id are skipped (py:500-503)
      .filter(coalesce(col("mp_term_id"), lit("")) =!= "")
      .select(col("marker_accession_id").as("marker"),
        col("marker_symbol").as("markerSymbol"),
        col("phenotyping_center").as("center"), col("colony_id").as("colony"),
        col("sex"), col("zygosity"), col("allele_accession_id").as("allele"),
        col("allele_symbol").as("alleleSymbol"),
        col("strain_accession_id").as("strain"),
        col("strain_name").as("strainName"), col("project_name").as("project"),
        col("pipeline_name").as("pipelineName"),
        col("pipeline_stable_id").as("pipelineId"),
        col("procedure_stable_id").as("procedureId"),
        col("procedure_name").as("procedureName"),
        col("parameter_stable_id").as("parameterId"),
        col("parameter_name").as("parameterName"), col("mp_term_id").as("mp"),
        col("mp_term_name").as("mpName"), col("p_value").as("pValue"),
        col("percentage_change").as("pctChange"),
        col("effect_size").as("effectSize"),
        col("statistical_method").as("statMethod"),
        col("resource_name").as("resourceName"))
      .as[ImpcRow]
      .flatMap { r =>
        def nz(s: String): String = if (s == null) "" else s.trim

        // ##### identifier cleanup (py:240-258) #####
        val zygosityId = {
          val z = tt.resolve(nz(r.zygosity), mandatory = false)
          if (z == nz(r.zygosity))
            TranslationTable.default.resolve("indeterminate")
          else z
        }
        val alleleId =
          if (nz(r.allele).startsWith("MGI:")) nz(r.allele)
          else bnode("IMPC-" + nz(r.allele))
        val strainId =
          if (nz(r.strain).startsWith("IMPC-CURATE-")) bnode(nz(r.strain))
          else if (nz(r.strain).startsWith("MGI:")) nz(r.strain)
          else bnode("IMPC:" + nz(r.strain))

        // ##### compact genotype chain (see scaladoc) #####
        val gene = Genotype.addGene(nz(r.marker), nz(r.markerSymbol))
        val variantLocus =
          Genotype.addAllele(alleleId, nz(r.alleleSymbol),
            TranslationTable.default.resolve("variant locus")) ++
            Genotype.addAffectedLocus(alleleId, nz(r.marker))
        val colonyBnode = bnode(nz(r.colony))
        val genotypeId = bnode(nz(r.colony) + strainId + zygosityId + alleleId)
        val genotypeName =
          s"${nz(r.alleleSymbol)}/${nz(r.alleleSymbol)} [${nz(r.strainName)}]"
        val genotype =
          Genotype.addGenotype(genotypeId, genotypeName) ++
            Genotype.addSequenceDerivesFrom(genotypeId, colonyBnode) ++
            Genotype.addGenotype(strainId, nz(r.strainName),
              TranslationTable.default.resolve("genomic_background")) ++
            Genotype.addGenomicBackgroundToGenotype(strainId, genotypeId) ++
            Genotype.addTaxon(taxonId, strainId) ++
            Model.addType(taxonId, Vocab.owlClass)

        // sex-qualified genotype (py:466-495): digest of the exact
        // reference composition, type from the sex qualifier
        val sqgId = bnode(
          colonyBnode + nz(r.center) + nz(r.zygosity) + nz(r.strain) + nz(r.sex))
        val sqType = {
          val t = tt.resolve(nz(r.sex), mandatory = false)
          if (t == nz(r.sex))
            TranslationTable.default.resolve("intrinsic genotype")
          else t
        }
        val sqg =
          Genotype.addGenotype(sqgId, s"$genotypeName (${nz(r.sex)})", sqType) ++
            Genotype.addParts(genotypeId, sqgId,
              TranslationTable.default.resolve("has_variant_part"))

        // ##### G2P association + sex specificity (py:506-526) #####
        val assocId = "_:" + digest(
          Seq("EX:impc", sqgId, Vocab.hasPhenotype, nz(r.mp)).mkString("+"))
        val g2p = Assoc.g2p("EX:impc", sqgId, nz(r.mp),
          evidence = Seq(ecoId), digest = digest) ++
          Model.addSexSpecificity(assocId, sqType)

        // free-text description with the reference's number formatting
        // (py:525-539): round-to-5 effect size, {:.4e} p-value, raw
        // passthrough when either fails to parse
        val description = {
          val parsed = for {
            es <- nz(r.effectSize).toDoubleOption
            p <- nz(r.pValue).toDoubleOption
          } yield {
            val esStr = {
              val d = BigDecimal(es).setScale(5, BigDecimal.RoundingMode.HALF_EVEN)
                .toDouble
              if (d == d.toLong) d.toLong.toString + ".0" else d.toString
            }
            (esStr, "%.4e".format(p))
          }
          val (esStr, pStr) =
            parsed.getOrElse((nz(r.effectSize), nz(r.pValue)))
          Seq(nz(r.mpName), "phenotype determined by", nz(r.center), "in an",
            nz(r.procedureName), "assay where", nz(r.parameterName),
            "was measured with an effect_size of", esStr,
            "(p =", pStr, ").").mkString(" ")
        }

        // ##### study provenance (py:593-695) #####
        val studyBnode = bnode(nz(r.center) + nz(r.colony) + nz(r.project) +
          nz(r.pipelineId) + nz(r.procedureId) + nz(r.parameterId) +
          nz(r.statMethod) + nz(r.resourceName))
        val procedureCurie = "IMPC-proc:" + nz(r.procedureId)
        val parameterCurie =
          "IMPC-param:" + nz(r.procedureId) + "#" + nz(r.parameterId)
        val pipelineCurie = "IMPC-pipe:" + nz(r.pipelineId)
        val statMethodId = tt.resolve(nz(r.statMethod), mandatory = false)
        val centerId = local.getOrElse(nz(r.center), nz(r.center))
        val study =
          Model.individualTriples(studyBnode, null,
            Some(TranslationTable.default.resolve("study"))) ++
            Model.individualTriples(procedureCurie, nz(r.procedureName)) ++
            Seq(Triple.res(studyBnode, Vocab.hasPart, procedureCurie),
              Triple.res(studyBnode, Vocab.hasPart, statMethodId)) ++
            Model.individualTriples(parameterCurie,
              s"${nz(r.parameterName)} (${nz(r.procedureName)})") ++
            Seq(Triple.res(studyBnode, "SEPIO:0000114", parameterCurie)) ++
            Model.individualTriples(colonyBnode, nz(r.colony)) ++
            Model.individualTriples(centerId, nz(r.center),
              Some(TranslationTable.default.resolve("organization"))) ++
            Seq(Triple.res(studyBnode, Vocab.hasAgent, centerId)) ++
            Model.individualTriples(pipelineCurie, nz(r.pipelineName)) ++
            Seq(Triple.res(studyBnode, Vocab.partOf, pipelineCurie)) ++
            nz(r.project).split(',').toSeq.map(_.trim)
              .flatMap(p => local.get(p).toSeq.flatMap { pid =>
                Model.individualTriples(pid, nz(r.project),
                  Some(TranslationTable.default.resolve("project"))) :+
                  Triple.res(studyBnode, Vocab.partOf, pid)
              })

        // ##### evidence line + measurements (py:697-765) #####
        val lineBnode = bnode(assocId + studyBnode)
        // p-value and effect-size bnodes are unconditional (the
        // reference's `is not None or != ""` gate is always true);
        // percentage_change is correctly gated on non-empty
        val pBnode = bnode(lineBnode + "p_value" + nz(r.pValue))
        val esBnode = bnode(lineBnode + "effect_size" + nz(r.effectSize))
        val pcBnode = bnode(lineBnode + "percentage_change" + nz(r.pctChange))
        def measured(mb: String, raw: String): Seq[Triple] =
          if (raw.isEmpty) Nil
          else raw.toDoubleOption match {
            case Some(d) =>
              Seq(Triple.typed(mb, "STATO:0000129", d.toString, "xsd:double"))
            case None => Seq(Triple.str(mb, "STATO:0000129", raw))
          }
        val measurements =
          Seq(pBnode, esBnode) ++
            (if (nz(r.pctChange).nonEmpty) Seq(pcBnode) else Nil)
        val evidence =
          Seq(Triple.res(assocId, Vocab.hasSupportingEvidenceLine, lineBnode)) ++
            Model.individualTriples(lineBnode, null, Some(ecoId)) ++
            Model.individualTriples(pBnode, null,
              Some(TranslationTable.default.resolve("p-value"))) ++
            measured(pBnode, nz(r.pValue)) ++
            Model.individualTriples(esBnode, null,
              Some(TranslationTable.default.resolve("effect size estimate"))) ++
            measured(esBnode, nz(r.effectSize)) ++
            (if (nz(r.pctChange).nonEmpty)
               Model.individualTriples(pcBnode, null,
                 Some(tt.resolve("percentage_change"))) ++
                 measured(pcBnode, nz(r.pctChange))
             else Nil) ++
            measurements.map(m =>
              Triple.res(lineBnode, Vocab.hasEvidenceItem, m)) ++
            measurements.map(m =>
              Triple.res(m, TranslationTable.default.resolve("output of"),
                studyBnode)) ++
            Seq(Triple.res(lineBnode, Vocab.hasSupportingActivity, studyBnode)) ++
            Model.addDescription(lineBnode, description)

        // ##### assertion provenance (py:561-591) #####
        val impcAgent = local("IMPC")
        val assertionBnode = bnode("assertion" + assocId + impcAgent)
        val assertion =
          Model.individualTriples(assertionBnode, null,
            Some(TranslationTable.default.resolve("assertion"))) ++
            Model.individualTriples(impcAgent,
              "International Mouse Phenotyping Consortium",
              Some(TranslationTable.default.resolve("organization"))) ++
            Seq(
              Triple.res(assertionBnode, Vocab.createdBy, impcAgent),
              Triple.res(assocId, Vocab.isAssertedIn, assertionBnode),
              Triple.res(assertionBnode, "SEPIO:0000111", lineBnode))

        gene ++ variantLocus ++ genotype ++ sqg ++ g2p ++ study ++
          evidence ++ assertion
      }.toDF()
  }

  override def testIds: Seq[String] = Seq("MGI:1920145")
}
