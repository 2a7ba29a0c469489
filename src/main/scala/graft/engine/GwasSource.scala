package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Digest, TranslationTable, Triple, Vocab}
import graft.emit.{Feature, Model, Reference, Association, Genotype => G}

/** GWASCatalog-shape real ingest (dipper/sources/GWASCatalog.py — the
  * reference's golden-file exemplar, tests/test_gwascatalog.py): one
  * association dump row → a routed variant (SNP / haplotype / skip,
  * _get_curie_and_type_from_id py:578-625), the SNP feature with FALDO
  * point location on the assembly chromosome, consequence typing from
  * the CONTEXT column through the localtt, up/downstream gene
  * relations, dbSNP merge deprecations, and the variant→trait
  * `contributes to condition` association with study description,
  * PubMed source, and combinatorial ECO evidence
  * (_add_variant_trait_association py:508-557).
  *
  * Scale shape: a pure per-row flatMap over the scan — no aggregation,
  * no shuffle, embarrassingly parallel at any corpus size. Haplotypes
  * fan out to their member SNPs inside the same row.
  */
object GwasCatalogSource extends GraftSource {
  val name = "gwas_catalog"

  import org.apache.spark.sql.types.{StringType, StructField, StructType}
  private val schema = StructType(Seq(
    "PUBMEDID", "DISEASE_TRAIT", "INITIAL_SAMPLE_SIZE",
    "REPLICATION_SAMPLE_SIZE", "CHR_ID", "CHR_POS", "SNP_GENE_IDS",
    "UPSTREAM_GENE_ID", "DOWNSTREAM_GENE_ID", "STRONGEST_SNP_RISK_ALLELE",
    "MERGED", "SNP_ID_CURRENT", "CONTEXT", "RISK_ALLELE_FREQUENCY",
    "P_VALUE", "PLATFORM", "MAPPED_TRAIT", "MAPPED_TRAIT_URI")
    .map(StructField(_, StringType)))

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = Map(
    "gwas_associations" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/gwas_associations.tsv", schema)))

  /** The build tag the reference parameterizes via its localtt
    * ('reference assembly', gwascatalog.yaml). */
  private val Assembly = "GRCh38"
  private val DefinedBy = "EX:gwascatalog"

  private lazy val tt = TranslationTable.forSource("gwascatalog")

  /** _get_curie_and_type_from_id py:578-625: (curie, type) or None. */
  private[engine] def routeVariant(raw: String): Option[(String, String)] = {
    val id = raw.replace(" -", "-").trim
    if (id.isEmpty || id.contains(" x ") || id.contains(",")) None
    else if (id.contains(";"))
      // the reference mints ':haplotype_<hash>' (a deliberate 404); the
      // engine uses its bnode convention for the same digest
      Some(("_:" + Digest.md5IdScala(id), "haplotype"))
    else if (id.startsWith("rs"))
      Some(("dbSNP:" + id.split("-")(0).replace(" ", ""), "snp"))
    else if (id.startsWith("kgp"))
      Some(("GWAS:" + id.split("-")(0), "snp"))
    else None
  }

  /** _add_snp_to_graph py:395-446: feature + location + context types. */
  private def snpTriples(curie: String, label: String, chrom: String,
                         pos: String, context: String,
                         freq: String): Seq[Triple] = {
    val located = chrom.nonEmpty && pos.nonEmpty && pos.forall(_.isDigit)
    val feature =
      if (located)
        Feature.featureTriples(curie, label.trim, Vocab.snp,
          Feature.makeChromId(chrom, Assembly), pos.toLong, pos.toLong,
          digest = Digest.md5IdScala)
      else Model.addType(curie, Vocab.snp) ++ Model.addLabel(curie, label.trim)
    val desc =
      if (freq.nonEmpty && freq != "NR")
        Model.addDescription(curie, s"$freq [risk allele frequency]")
      else Nil
    val ctxTypes = context.split(";").map(_.trim).filter(_.nonEmpty).toSeq
      .flatMap { ctx =>
        val cid = tt.resolve(ctx, mandatory = false)
        if (cid != ctx) Model.addType(curie, cid) else Nil
      }
    feature ++ desc ++ ctxTypes :+
      Triple.res(curie, Vocab.inTaxon, "NCBITaxon:9606")
  }

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    import spark.implicits._
    val upstreamRel = tt.resolve("upstream_gene_variant")
    val downstreamRel = tt.resolve("downstream_gene_variant")
    val evidence = TranslationTable.default.resolve(
      "computational combinatorial evidence used in automatic assertion")
    in("gwas_associations")
      .na.fill("")
      .as[(String, String, String, String, String, String, String, String,
           String, String, String, String, String, String, String, String,
           String, String)]
      .flatMap { case (pubmed, trait0, initial, replication, chrom, pos,
                       geneIds, upstream, downstream, allele, merged,
                       current, context, freq, pvalue, platform,
                       mappedTrait, mappedUri) =>
        routeVariant(allele) match {
          case None => Nil
          case Some((curie, vtype)) =>
            val variant: Seq[Triple] = vtype match {
              case "snp" =>
                val dep =
                  if (merged == "1" && current.nonEmpty)
                    Model.deprecatedTriples(curie,
                      replacedBy = Seq("dbSNP:rs" + current.split(" ")(0)))
                  else Nil
                val genes = geneIds.split(",").map(_.trim)
                  .filter(_.nonEmpty).toSeq
                  .flatMap(g => G.addAffectedLocus(curie, "ENSEMBL:" + g))
                // py:496-507: the SNP is upstream of its DOWNSTREAM
                // gene and downstream of its UPSTREAM gene
                val updown =
                  (if (downstream.nonEmpty)
                     Seq(Triple.res(curie, upstreamRel,
                       "ENSEMBL:" + downstream)) else Nil) ++
                  (if (upstream.nonEmpty)
                     Seq(Triple.res(curie, downstreamRel,
                       "ENSEMBL:" + upstream)) else Nil)
                snpTriples(curie, allele, chrom, pos, context, freq) ++
                  dep ++ genes ++ updown
              case _ => // haplotype, _process_haplotype py:300-393
                val snps = allele.split(";").map(_.trim).toSeq
                val chroms = chrom.split(";").map(_.trim).toSeq
                val poss = pos.split(";").map(_.trim).toSeq
                val ctxs = context.split(";").map(_.trim).toSeq
                val desc =
                  if (freq.nonEmpty && freq != "NR")
                    Model.addDescription(curie,
                      s"$freq [risk allele frequency]")
                  else Nil
                val members = snps.zipWithIndex.flatMap { case (s0, i) =>
                  routeVariant(s0) match {
                    case Some((sc, "snp")) =>
                      // per-member features only when the ;-lists align
                      // (the reference's all-lengths-equal check)
                      val feats =
                        if (chroms.size == snps.size && poss.size == snps.size)
                          snpTriples(sc, s0, chroms(i), poss(i),
                            if (ctxs.size == snps.size) ctxs(i) else "", "")
                        else Nil
                      feats :+ Triple.res(curie, Vocab.hasVariantPart, sc)
                    case _ =>
                      val bn = "_:" + Digest.md5IdScala(s0)
                      Model.addLabel(bn, s0) :+
                        Triple.res(curie, Vocab.hasVariantPart, bn)
                  }
                }
                Model.addType(curie, "SO:0001024") ++
                  Model.addLabel(curie, allele.trim) ++ desc ++ members :+
                  Triple.res(curie, Vocab.inTaxon, "NCBITaxon:9606")
            }
            // _make_description py:563-575
            var studyDesc = s"A study of $trait0 in $initial"
            if (replication.nonEmpty) studyDesc += s" with $replication"
            if (platform.nonEmpty) studyDesc += s" on platform $platform"
            studyDesc += s" (p=$pvalue)"
            val traits = mappedUri.split(",").map(_.trim).filter(_.nonEmpty)
            val labels = mappedTrait.split(",").map(_.trim)
            val assocs = traits.zipWithIndex.toSeq.flatMap { case (uri, i) =>
              val tcurie =
                uri.replace("http://www.ebi.ac.uk/efo/EFO_", "EFO:")
              val traitClass =
                if (tcurie.startsWith("EFO:"))
                  Model.classTriples(tcurie, labels.lift(i).getOrElse(""),
                    subClassOf = Some("UPHENO:0001001"))
                else Nil
              val pmid = s"PMID:$pubmed"
              val assoc = Association(DefinedBy, curie,
                Vocab.contributesToCondition, tcurie,
                evidence = Seq(evidence), sources = Seq(pmid))
              traitClass ++
                Reference.triples(pmid, refType = Vocab.journalArticle) ++
                assoc.triples :+
                Triple.str(assoc.id, Vocab.description, studyDesc)
            }
            variant ++ assocs
        }
      }.toDF()
  }
  override def testIds: Seq[String] = Seq("dbSNP:rs1329573")
}
