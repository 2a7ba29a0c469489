package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Digest, Triple, Vocab}
import graft.emit.{Assoc, Environment, Model, Reference,
  Association => Assoc0, Genotype => G}

/** ZFIN depth wave: the fish/extrinsic-genotype assembly, gene-marker
  * relationships, knockdown reagents, environments, and the
  * fish-to-phenotype (G2P) associations — the passes of the reference's
  * largest source that sit ABOVE the intrinsic-genotype core already
  * covered by [[ZfinGenotypeSource]].
  *
  * Reference provenance (all `/root/reference/dipper/sources/ZFIN.py`):
  *  - `process_fish` (ZFIN.py:522-768): a fish is an *effective
  *    genotype* = intrinsic genotype + a set of affectors; the extrinsic
  *    genotype is assembled from `affectors − intrinsic alleles` (the
  *    set difference this tier exists for), with each reagent-targeted
  *    gene minted as a bnode `md5(gene-reagent…)`, reagents grouped
  *    per targeted gene, and the extrinsic id digested from the sorted
  *    targeted-gene list. Allele→construct provenance rides the same
  *    file (`sequence derives from` + transgenic-part partonomy).
  *  - `_process_wildtypes` (ZFIN.py:1264-1328): wildtype genotypes are
  *    genomic backgrounds; a fish whose intrinsic genotype is wildtype
  *    attaches it with `has_reference_part` instead of
  *    `has_variant_part`.
  *  - `_process_gene_marker_relationships` (ZFIN.py:1785-1933): of the
  *    ~13 relationship kinds only four are consumed — knockdown
  *    targeting, coding-sequence / promoter transgene parts, and
  *    miRNA `transcript targets gene`.
  *  - `_process_targeting_reagents` (ZFIN.py:2069-2199): morpholino /
  *    TALEN / CRISPR reagent declarations + publication mentions; one
  *    unified input frame here (the three reference files share the
  *    normalized `kol` column shape the reference itself defines).
  *  - `_process_pheno_enviro` (ZFIN.py:2201-2332): environments with
  *    ZECO condition components and the composed
  *    "Environment that includes: …" label (this engine emits the
  *    per-component partonomy the reference's refactor left TODO —
  *    component = the ZECO condition itself).
  *  - `_process_g2p` (ZFIN.py:1376-1521) + `_load_zp_mappings`
  *    (ZFIN.py:2774-2820): the EQ octuple → ZP mapping is a broadcast
  *    join against the zp-map table (the reference's dict probe,
  *    re-expressed); abnormal rows become stage/environment-qualified
  *    OBAN associations, `normal`-tagged rows demote to a publication
  *    `mentions` link, unmapped octuples drop (the reference's warn
  *    path).
  *
  * Scale shape: every mapping relation (reagent→gene, construct→part,
  * zp-map, environment components, wildtype set) is dimension-sized and
  * broadcast; the two fact aggregations (per-genotype intrinsic-allele
  * set, per-fish affector set) are single-shuffle hash aggregates keyed
  * by their natural keys; the per-fish assembly is ONE further shuffle
  * (groupByKey on fish) over the exploded extrinsic rows; G2P and all
  * declaration tiers are shuffle-free map-side flatMaps. Ids are md5
  * content digests (sha1 in the reference) so the DuckDB oracle can
  * reproduce them and so emission stays deterministic under partition
  * retries at cluster scale.
  */
object ZfinFishSource extends GraftSource {
  val name = "zfin_fish"
  private val definedBy = "EX:zfin"

  private val taxonId = "NCBITaxon:7955"
  private val extrinsicGenotype = "GENO:0000524"
  private val effectiveGenotype = "GENO:0000525"
  private val intrinsicGenotype = "GENO:0000719"
  private val unspecifiedBackground = "GENO:0000649"
  private val codingTransgeneFeature = "GENO:0000638"
  private val regulatoryTransgeneFeature = "GENO:0000637"
  private val mentions = "IAO:0000142"
  private val expPhenoEvidence = "ECO:0000059"
  private val abnormal = "PATO:0000460"
  private val hasGenotype = "GENO:0000222"

  import org.apache.spark.sql.types.{StringType, StructField, StructType}
  private def schemaOf(cols: String*): StructType =
    StructType(cols.map(StructField(_, StringType)))

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] =
    graft.sources.DelimitedSource.readManifest(spark, Map(
      "fish_components" -> graft.sources.SourceFile(
        s"$dataDir/fish_components.tsv",
        schemaOf("FishID", "FishName", "AffectorID", "ConstructID",
          "GenotypeID")),
      "genotype_features" -> graft.sources.SourceFile(
        s"$dataDir/genotype_features.tsv",
        schemaOf("GenotypeID", "GenotypeName", "AlleleID", "AlleleName",
          "GeneID", "GeneSymbol", "Zygosity")),
      "wildtypes" -> graft.sources.SourceFile(
        s"$dataDir/wildtypes.tsv",
        schemaOf("FishID", "FishName", "FishAbbreviation", "GenotypeID")),
      "gene_marker_rel" -> graft.sources.SourceFile(
        s"$dataDir/gene_marker_rel.tsv",
        schemaOf("GeneID", "GeneSOID", "GeneSymbol", "MarkerID",
          "MarkerSOID", "MarkerSymbol", "Relationship")),
      "reagents" -> graft.sources.SourceFile(
        s"$dataDir/reagents.tsv",
        schemaOf("GeneID", "GeneSOID", "GeneSymbol", "ReagentID",
          "ReagentSOID", "ReagentSymbol", "Publications", "Note")),
      "pheno_environment" -> graft.sources.SourceFile(
        s"$dataDir/pheno_environment.tsv",
        schemaOf("EnvironmentID", "ZecoTermID", "ZecoTermName")),
      "pheno" -> graft.sources.SourceFile(
        s"$dataDir/pheno.tsv",
        schemaOf("FishID", "StartStageID", "EndStageID",
          "Subterm1ID", "Subterm1Name", "Postcomp1RelID", "Superterm1ID",
          "Superterm1Name", "QualityID", "QualityName", "Tag",
          "Subterm2ID", "Subterm2Name", "Postcomp2RelID", "Superterm2ID",
          "Superterm2Name", "PublicationID", "EnvironmentID")),
      "zp_map" -> graft.sources.SourceFile(
        s"$dataDir/zp_map.tsv",
        schemaOf("ZpID", "OctupleID")),
      "genes" -> graft.sources.SourceFile(
        s"$dataDir/genes.tsv",
        schemaOf("ZfinID", "SoID", "Symbol", "NcbiGeneID")),
      "stages" -> graft.sources.SourceFile(
        s"$dataDir/stages.tsv",
        schemaOf("StageID", "StageOboID", "StageName")),
      "uniprot" -> graft.sources.SourceFile(
        s"$dataDir/uniprot.tsv",
        schemaOf("ZfinID", "SoID", "Symbol", "UniProtID")),
      "human_orthos" -> graft.sources.SourceFile(
        s"$dataDir/human_orthos.tsv",
        schemaOf("ZfinID", "ZfinSymbol", "ZfinName", "HumanSymbol",
          "HumanName", "OmimID", "GeneID", "HgncID", "Evidence", "PubID")),
      "fish_disease_models" -> graft.sources.SourceFile(
        s"$dataDir/fish_disease_models.tsv",
        schemaOf("FishID", "EnvironmentID", "Rel", "DoTermID", "DoTermName",
          "PubID", "PubMedID", "EvidenceCode")),
      // GFF3 — headerless; the '##gff-version' pragma and comment lines
      // are filtered in the transform (the reference's two next() calls)
      "gene_coordinates" -> graft.sources.SourceFile(
        s"$dataDir/gene_coordinates.gff3",
        schemaOf("Chromosome", "Source", "Type", "Start", "End", "Score",
          "Strand", "Phase", "Attributes"), hasHeader = false),
      "features" -> graft.sources.SourceFile(
        s"$dataDir/features.tsv",
        schemaOf("GenomicFeatureID", "FeatureSoID", "Abbreviation",
          "Name", "ConstructID", "ConstructName", "ConstructSoID")),
      "features_affected_genes" -> graft.sources.SourceFile(
        s"$dataDir/features_affected_genes.tsv",
        schemaOf("GenomicFeatureID", "FeatureSoID", "Abbreviation",
          "GeneSymbol", "GeneID", "GeneSoID", "Relationship")),
      "pubs" -> graft.sources.SourceFile(
        s"$dataDir/pubs.tsv",
        schemaOf("PubID", "PubMedID", "Authors", "Title", "Journal",
          "Year", "Volume", "Pages")),
      "pub2pubmed" -> graft.sources.SourceFile(
        s"$dataDir/pub2pubmed.tsv",
        schemaOf("PubID", "PubMedID")),
      "mappings" -> graft.sources.SourceFile(
        s"$dataDir/mappings.tsv",
        schemaOf("ZfinID", "Symbol", "PanelSymbol", "Chromosome",
          "Location", "Metric")),
      "zmine_ortho_evidence" -> graft.sources.SourceFile(
        s"$dataDir/zmine_ortho_evidence.tsv",
        schemaOf("zfin_gene_num", "zfin_gene_symbol",
          "ortholog_gene_symbol", "ortholog_ncbigene_num", "evidence_code",
          "zfin_pub_num", "pubmed_num"))))

  private def strip(s: String): String = s.replaceAll("(ZFIN)?:", "")
  private def nzc(c: Column): Column =
    when(coalesce(c, lit("")) === "", lit(null)).otherwise(c)
  /** Null/blank-safe trim: Spark CSV reads empty unquoted fields as
    * null — an unguarded `.trim` would fail the whole ingest where the
    * reference's ''-valued csv fields pass through harmlessly. */
  private def nzs(s: String): Option[String] =
    Option(s).map(_.trim).filter(_.nonEmpty)

  /** The four gene_marker_rel relationship kinds the reference consumes
    * (ZFIN.py:1846-1852; 'gene product recognized by antibody' is a
    * reference TODO and is filtered with the rest). */
  private val keptRels = Seq("knockdown reagent targets gene",
    "coding sequence of", "promoter of", "transcript targets gene")

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    import spark.implicits._

    val tiers = scala.collection.mutable.ArrayBuffer[DataFrame]()
    def df(ts: org.apache.spark.sql.Dataset[Triple]): DataFrame = ts.toDF()

    // ---- dimension relations shared across tiers ----------------------
    // (NOT cached: both shared relations are dimension-sized scans that
    // recompute for pennies, and a session-lifetime cache entry per run
    // would accumulate across the Runner's multi-source sessions)
    val gmr = in.get("gene_marker_rel").map(_.filter(
      col("Relationship").isin(keptRels: _*)))

    // reagent/allele → affected genes (the reference's variant_loci_genes
    // hash, built from genotype_features ZFIN.py:898-901, the reagent
    // files ZFIN.py:2190-2194, and gene_marker_rel knockdown rows).
    // Dimension-sized (bounded by alleles+reagents) → broadcast.
    val vlgParts = Seq(
      in.get("genotype_features").map(_
        .filter(nzc(col("GeneID")).isNotNull && nzc(col("AlleleID")).isNotNull)
        .select(col("AlleleID").as("aff"), col("AlleleName").as("affLabel"),
          col("GeneID").as("gene"), col("GeneSymbol").as("geneLabel"))),
      in.get("reagents").map(_
        .filter(nzc(col("GeneID")).isNotNull)
        .select(col("ReagentID").as("aff"), col("ReagentSymbol").as("affLabel"),
          col("GeneID").as("gene"), col("GeneSymbol").as("geneLabel"))),
      gmr.map(_.filter(col("Relationship") === "knockdown reagent targets gene")
        .select(col("MarkerID").as("aff"), col("MarkerSymbol").as("affLabel"),
          col("GeneID").as("gene"), col("GeneSymbol").as("geneLabel")))
    ).flatten
    val vlg = vlgParts.reduceOption(_ unionByName _).map(
      _.groupBy(col("aff"), col("gene"))
        .agg(max(col("affLabel")).as("affLabel"),
          max(col("geneLabel")).as("geneLabel")))

    // construct → transgenic parts (coding / promoter rows;
    // ZFIN.py:1869-1906 build, 744-768 attach)
    val tgParts = gmr.map(_
      .filter(col("Relationship").isin("coding sequence of", "promoter of"))
      .select(col("MarkerID").as("construct"),
        col("GeneID").as("pgene"), col("Relationship").as("prel")))

    // ---- fish / extrinsic-genotype assembly (process_fish) ------------
    for {
      fishes <- in.get("fish_components")
      feats <- in.get("genotype_features")
    } {
      val intrinsic = feats
        .filter(nzc(col("AlleleID")).isNotNull)
        .groupBy(col("GenotypeID").as("gid"))
        .agg(max(col("GenotypeName")).as("gname"),
          collect_set(col("AlleleID")).as("intrinsicAlleles"))
      val wildSet = in.get("wildtypes")
        .map(_.select(col("GenotypeID").as("gid")).distinct()
          .withColumn("isWt", lit(true)))
        .getOrElse(spark.emptyDataset[(String, Boolean)].toDF("gid", "isWt"))

      val fishAgg = fishes
        .groupBy(col("FishID").as("fish"))
        .agg(max(col("FishName")).as("fishName"),
          max(col("GenotypeID")).as("gid"),
          collect_set(col("AffectorID")).as("affectors"))
        .join(intrinsic, Seq("gid"), "left")
        .join(broadcast(wildSet), Seq("gid"), "left")
        .select(col("fish"), col("fishName"), col("gid"),
          coalesce(col("gname"), lit("")).as("gname"),
          coalesce(col("isWt"), lit(false)).as("isWt"),
          array_sort(array_except(col("affectors"),
            coalesce(col("intrinsicAlleles"),
              array().cast("array<string>")))).as("extrinsic"))

      // the reference skips 'ALT' ids inside the reagent walk
      // (ZFIN.py:631-633): ALT extrinsics stay out of the gene join but
      // must not drop the fish row — explode_outer + null-gene carry
      val exploded = fishAgg
        .select(col("fish"), col("fishName"), col("gid"), col("gname"),
          col("isWt"), explode_outer(col("extrinsic")).as("aff"))
        .withColumn("effAff",
          when(col("aff").isNull || col("aff").contains("ALT"), lit(null))
            .otherwise(col("aff")))
      val joined = vlg match {
        case Some(m) => exploded.join(broadcast(m),
          exploded("effAff") === m("aff"), "left")
          .select(exploded("fish"), exploded("fishName"), exploded("gid"),
            exploded("gname"), exploded("isWt"), col("effAff"),
            coalesce(col("affLabel"), col("effAff")).as("affLabel"),
            col("gene"), col("geneLabel"))
        case None => exploded
          .select(col("fish"), col("fishName"), col("gid"), col("gname"),
            col("isWt"), col("effAff"), col("effAff").as("affLabel"),
            lit(null).cast("string").as("gene"),
            lit(null).cast("string").as("geneLabel"))
      }
      val fishTriples = joined
        .as[(String, String, String, String, Boolean, String, String,
             String, String)]
        .groupByKey(_._1)
        .flatMapGroups { (fishNum, it) =>
          val rows = it.toSeq.sortBy(r => (Option(r._6).getOrElse(""),
            Option(r._8).getOrElse("")))
          val head = rows.head
          val (fishName, gid, gname, isWt) = (head._2, head._3, head._4,
            head._5)
          val fish = s"ZFIN:$fishNum"
          val gt = s"ZFIN:$gid"

          // gene → sorted reagent list (the inside-out inversion,
          // ZFIN.py:640-651)
          val geneReagents = rows
            .filter(r => r._8 != null && r._6 != null)
            // keyed by gene ALONE (gene_to_reagent_hash, ZFIN.py:646-651)
            // — grouping by (gene, label) would split one targeted gene
            // in two when the reagent and marker files disagree on the
            // symbol; label choice is the sorted-first non-null (the
            // reference's id_label_map holds one file-order-dependent
            // symbol per gene)
            .groupBy(_._8)
            .toSeq
            .map { case (gene, rs) =>
              val reag = rs.map(r => (r._6, r._7)).distinct.sortBy(_._1)
              val eid = reag.map(_._1).mkString("-")
              val tgId = "_:" + Digest.md5IdScala(strip(s"$gene-$eid"))
              val elabel = reag.map(_._2).mkString(", ")
              val geneLabel = rs.flatMap(r => Option(r._9)).sorted.headOption
              (tgId, s"${geneLabel.getOrElse(gene)}<$elabel>",
                s"ZFIN:$gene", reag)
            }
            .sortBy(_._1)

          val targetedTriples = geneReagents.flatMap {
            case (tgId, tgLabel, geneCurie, reag) =>
              Model.addLabel(tgId, tgLabel) ++
                reag.flatMap { case (rid, _) =>
                  G.addReagentTargetedGene(s"ZFIN:$rid", geneCurie, tgId)
                }
          }

          val (extrinsicTriples, extLabelOpt) =
            if (geneReagents.isEmpty) (Nil, None)
            else {
              val src = geneReagents.map(_._1.stripPrefix("_:"))
                .mkString("-")
              val exId = "_:" + Digest.md5IdScala(src)
              val exLabel = geneReagents.map(_._2).mkString("; ")
              val ts = G.addGenotype(exId, exLabel, extrinsicGenotype) ++
                geneReagents.flatMap(tg =>
                  G.addParts(tg._1, exId, Vocab.hasVariantPart)) ++
                G.addParts(exId, fish, Vocab.hasVariantPart)
              (ts, Some(exLabel))
            }

          // intrinsic attach: wildtype → reference part of a genomic
          // background; otherwise variant part of an intrinsic genotype
          // (ZFIN.py:706-718)
          val (intRel, intType) =
            if (isWt) (Vocab.hasReferencePart, Vocab.genomicBackground)
            else (Vocab.hasVariantPart, intrinsicGenotype)
          val intrinsicTriples =
            G.addGenotype(gt, gname, intType) ++
              G.addParts(gt, fish, intRel)

          val fishLevel =
            G.addGenotype(fish, gname, effectiveGenotype) ++
              G.addTaxon(taxonId, fish) ++
              (if (fishName != null && fishName.nonEmpty)
                 Model.addSynonym(fish, fishName) else Nil)

          targetedTriples ++ extrinsicTriples ++ intrinsicTriples ++
            fishLevel
        }
      tiers += df(fishTriples)

      // allele → construct provenance + transgenic-part partonomy
      // (ZFIN.py:744-768): file-global, independent of the per-fish walk
      val alleleConstruct = fishes
        .filter(nzc(col("ConstructID")).isNotNull &&
          nzc(col("AffectorID")).isNotNull)
        .select(col("AffectorID").as("aff"), col("ConstructID").as("construct"))
        .distinct()
      val derives = alleleConstruct
        .as[(String, String)]
        .flatMap { case (aff, c) =>
          G.addSequenceDerivesFrom(s"ZFIN:$aff", s"ZFIN:$c")
        }
      tiers += df(derives)
      tgParts.foreach { parts =>
        val attach = alleleConstruct
          .join(broadcast(parts),
            alleleConstruct("construct") === parts("construct"))
          .select(col("aff"), col("pgene"), col("prel"),
            alleleConstruct("construct").as("c"))
          .distinct()
          .as[(String, String, String, String)]
          .flatMap { case (aff, pgene, prel, c) =>
            val partId = transgenePartId(s"ZFIN:$c", s"ZFIN:$pgene", prel)
            // promoter parts attach with plain has_part (the reference's
            // in-code HACK, ZFIN.py:761-766)
            val rel = if (prel == "promoter of") Vocab.hasPart
                      else Vocab.hasVariantPart
            G.addParts(partId, s"ZFIN:$aff", rel)
          }
        tiers += df(attach)
      }
    }

    // ---- wildtype genomic backgrounds (_process_wildtypes) ------------
    in.get("wildtypes").foreach { wt =>
      val ts = wt.select(col("FishID"), col("FishName"),
          col("FishAbbreviation"), col("GenotypeID"))
        .as[(String, String, String, String)]
        .flatMap { case (fishNum, fishName, abbrev, gid) =>
          val gt = s"ZFIN:$gid"
          val bgType = if (gid == "ZDB-GENO-030619-2") unspecifiedBackground
                       else Vocab.genomicBackground
          Model.addType(gt, bgType) ++ Model.addLabel(gt, abbrev) ++
            Model.addDescription(gt, fishName) ++
            Model.addTriple(s"ZFIN:$fishNum", hasGenotype, gt)
        }
      tiers += df(ts)
    }

    // ---- gene-marker relationships ------------------------------------
    gmr.foreach { rel =>
      val ts = rel.select(col("GeneID"), col("GeneSOID"), col("GeneSymbol"),
          col("MarkerID"), col("MarkerSOID"), col("MarkerSymbol"),
          col("Relationship"))
        .as[(String, String, String, String, String, String, String)]
        .flatMap { case (g, gSo, gSym, m, mSo, mSym, r) =>
          val gene = s"ZFIN:$g"
          val marker = s"ZFIN:$m"
          val geneTs = G.addGene(gene, gSym,
            Option(gSo).filter(_.nonEmpty).getOrElse(Vocab.gene))
          val relTs = r match {
            case "knockdown reagent targets gene" =>
              G.addGeneTargetingReagent(marker, mSym,
                Option(mSo).filter(_.nonEmpty).getOrElse("SO:0000695"),
                Some(gene))
            case "coding sequence of" | "promoter of" =>
              val partType = if (r == "promoter of")
                regulatoryTransgeneFeature else codingTransgeneFeature
              val partId = transgenePartId(marker, gene, r)
              G.addConstruct(marker, mSym) ++
                Model.individualTriples(partId, s"Tg($r $gSym)",
                  Some(partType)) ++
                G.addSequenceDerivesFrom(partId, gene)
            case "transcript targets gene" =>
              Model.individualTriples(marker, mSym,
                Option(mSo).filter(_.nonEmpty)) ++
                Model.addTriple(marker, "EXP:targets_gene", gene)
            case _ => Nil
          }
          geneTs ++ relTs
        }
      tiers += df(ts)
    }

    // ---- knockdown reagents (morph/talen/crispr) -----------------------
    in.get("reagents").foreach { reag =>
      val ts = reag.select(col("GeneID"), col("GeneSymbol"),
          col("ReagentID"), col("ReagentSOID"), col("ReagentSymbol"),
          col("Publications"), col("Note"))
        .as[(String, String, String, String, String, String, String)]
        .flatMap { case (g, _, rid, rSo, rSym, pubs, note) =>
          val reagent = s"ZFIN:$rid"
          val geneOpt = Option(g).filter(_.nonEmpty).map("ZFIN:" + _)
          G.addGeneTargetingReagent(reagent, rSym,
            Option(rSo).filter(_.nonEmpty).getOrElse("SO:0000695"),
            geneOpt) ++
            Option(pubs).filter(_.nonEmpty).toSeq
              .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
              .flatMap { p =>
                val pub = s"ZFIN:$p"
                Reference.triples(pub) ++
                  Model.addTriple(pub, mentions, reagent)
              } ++
            Option(note).filter(_.nonEmpty).toSeq
              .flatMap(n => Model.addComment(reagent, n))
        }
      tiers += df(ts)
    }

    // ---- environments (_process_pheno_enviro) ---------------------------
    val envRows = in.get("pheno_environment").map(_
      .filter(nzc(col("ZecoTermID")).isNotNull)
      .select(col("EnvironmentID").as("env"), col("ZecoTermID").as("zeco"),
        col("ZecoTermName").as("zecoName"))
      .distinct())
    envRows.foreach { er =>
      val compTs = er.select(col("zeco"), col("zecoName")).distinct()
        .as[(String, String)]
        .flatMap { case (z, zn) => Environment.condition(z, zn) }
      val partTs = er.as[(String, String, String)]
        .flatMap { case (env, z, _) =>
          Environment.hasPart(s"ZFIN:$env", z)
        }
      val envTs = er.groupBy(col("env"))
        .agg(sort_array(collect_set(col("zecoName"))).as("names"))
        .as[(String, Seq[String])]
        .flatMap { case (env, names) =>
          Environment.environment(s"ZFIN:$env",
            "Environment that includes: " + names.mkString("; "))
        }
      tiers += df(compTs); tiers += df(partTs); tiers += df(envTs)
    }

    // ---- G2P (fish → phenotype, _process_g2p) ---------------------------
    in.get("pheno").foreach { pheno =>
      val key7 = concat_ws("-",
        Seq("Subterm1ID", "Postcomp1RelID", "Superterm1ID", "QualityID",
          "Subterm2ID", "Postcomp2RelID", "Superterm2ID")
          .map(c => coalesce(nzc(col(c)), lit("0"))): _*)
      // free-text modifier → PATO (the reference's resolve() step,
      // ZFIN.py:2742-2746); zp-map rows all carry the implicit abnormal
      // modifier (ZFIN.py:2799-2801), so only abnormal-resolving rows
      // can match
      val modId = when(col("Tag") === "abnormal", lit(abnormal))
        .otherwise(lit(null).cast("string"))
      val withKey = pheno.withColumn("key7", key7).withColumn("mod", modId)
      val mapped = in.get("zp_map") match {
        case Some(zp) => withKey.join(
          broadcast(zp.select(col("ZpID").as("zp"),
            col("OctupleID").as("okey")).distinct()),
          withKey("key7") === col("okey") && withKey("mod") === abnormal,
          "left")
        case None => withKey.withColumn("zp", lit(null).cast("string"))
      }
      val envKnown = envRows
        .map(_.select(col("env")).distinct()
          .withColumn("envHasComp", lit(true)))
        .getOrElse(spark.emptyDataset[(String, Boolean)]
          .toDF("env", "envHasComp"))
      val rows = mapped.join(broadcast(envKnown),
          mapped("EnvironmentID") === envKnown("env"), "left")
        .select(col("FishID"), col("StartStageID"), col("EndStageID"),
          col("Tag"), col("PublicationID"), col("EnvironmentID"),
          col("zp"), coalesce(col("envHasComp"), lit(false)).as("envOk"))
        .as[(String, String, String, String, String, String, String,
             Boolean)]
      val ts = rows.flatMap {
        case (fishNum, start, end, tag, pub, envId, zp, envOk) =>
          val fish = s"ZFIN:$fishNum"
          val pubOpt = Option(pub).filter(_.nonEmpty).map("ZFIN:" + _)
          val pubTs = pubOpt.toSeq.flatMap(p => Reference.triples(p))
          if (tag != null && tag.startsWith("normal")) {
            // normal phenotypes demote to pub-mentions-fish
            // (ZFIN.py:1500-1516)
            pubTs ++ pubOpt.toSeq.flatMap(p =>
              Model.addTriple(p, mentions, fish))
          } else if (zp == null) {
            // unmapped octuple: reference warns and skips (ZFIN.py:1479)
            pubTs
          } else {
            val startOpt = Option(start).filter(_.nonEmpty).map("ZFIN:" + _)
            val endOpt = Option(end).filter(_.nonEmpty).map("ZFIN:" + _)
            val envOpt = if (envOk) Some(s"ZFIN:$envId") else None
            val attrs = envOpt.toSeq ++ startOpt.toSeq ++ endOpt.toSeq
            val assocId = "_:" + Digest.md5IdScala(
              (Seq(definedBy, fish, Vocab.hasPhenotype, zp) ++ attrs)
                .mkString("+"))
            pubTs ++
              Assoc.g2p(definedBy, fish, zp, startOpt, endOpt, envOpt,
                evidence = Seq(expPhenoEvidence), sources = pubOpt.toSeq,
                digest = Digest.md5IdScala) ++
              Option(envId).filter(_.nonEmpty).toSeq.flatMap(e =>
                Model.addComment(assocId, s"Legacy environment id ZFIN:$e"))
          }
      }
      tiers += df(ts)
    }

    // ---- gene dictionary (_process_genes, ZFIN.py:1522-1575) ----------
    in.get("genes").foreach { g =>
      val ts = g.select(col("ZfinID"), col("Symbol"), col("NcbiGeneID"))
        .as[(String, String, String)]
        .flatMap { case (gid, sym, ncbi) =>
          nzs(gid).toSeq.flatMap { g =>
            val gene = s"ZFIN:$g"
            G.addGene(gene, sym) ++
              nzs(ncbi).toSeq.flatMap(n =>
                Model.addEquivalentClass(gene, s"NCBIGene:$n")) ++
              G.addTaxon(taxonId, gene)
          }
        }
      tiers += df(ts)
    }

    // ---- developmental stages (_process_stages, ZFIN.py:1329-1374) ----
    in.get("stages").foreach { st =>
      val ts = st.select(col("StageID"), col("StageOboID"), col("StageName"))
        .as[(String, String, String)]
        .flatMap { case (sid, obo, name) =>
          nzs(sid).toSeq.flatMap { sn =>
            val stage = s"ZFIN:$sn"
            Model.classTriples(stage, name) ++
              nzs(obo).toSeq.flatMap(Model.addEquivalentClass(stage, _))
          }
        }
      tiers += df(ts)
    }

    // ---- UniProt gene products (_process_uniprot_ids,
    // ZFIN.py:2427-2484) ------------------------------------------------
    in.get("uniprot").foreach { up =>
      val ts = up.select(col("ZfinID"), col("Symbol"), col("UniProtID"))
        .as[(String, String, String)]
        .flatMap { case (gid, sym, prot) =>
          (nzs(gid), nzs(prot)) match {
            case (Some(g), Some(p)) =>
              val gene = s"ZFIN:$g"
              val protein = s"UniProtKB:$p"
              G.addGene(gene, sym) ++
                Model.individualTriples(protein, null,
                  Some("SO:0000104")) ++
                Model.addTriple(gene, "RO:0002205", protein)
            case _ => Nil
          }
        }
      tiers += df(ts)
    }

    // ---- ZFIN-curated human orthology (_process_human_orthos,
    // ZFIN.py:2485-2563): both genes declared with descriptions, the
    // default orthology association decorated with the ZFIN publication
    // and the abbreviation→ECO evidence map
    // (get_orthology_evidence_code, ZFIN.py:3040-3083) -------------------
    in.get("human_orthos").foreach { ho =>
      val ts = ho.select(col("ZfinID"), col("ZfinSymbol"), col("ZfinName"),
          col("HumanSymbol"), col("HumanName"), col("GeneID"),
          col("Evidence"), col("PubID"))
        .as[(String, String, String, String, String, String, String,
             String)]
        .filter(t => nzs(t._1).isDefined && nzs(t._6).isDefined)
        .flatMap { case (zid, zsym, zname, hsym, hname, ncbi, ev, pub) =>
          val zfin = s"ZFIN:${zid.trim}"
          val human = s"NCBIGene:${ncbi.trim}"
          val sources = Option(pub).filter(_.startsWith("ZDB-PUB-"))
            .map("ZFIN:" + _).toSeq
          val evidence = orthoEvidence.get(ev).flatten.toSeq
          G.addGene(zfin, zsym) ++ Model.addDescription(zfin, zname) ++
            G.addGene(human, hsym) ++ Model.addDescription(human, hname) ++
            Assoc0(definedBy, zfin, Vocab.inOrthologyRelationshipWith,
              human, evidence = evidence, sources = sources,
              explicitId = Some("_:" + Digest.assocIdScalaMd5(definedBy,
                zfin, Vocab.inOrthologyRelationshipWith, human))).triples
        }
      tiers += df(ts)
    }

    // ---- fish disease models (process_fish_disease_models,
    // ZFIN.py:2631-2720): the experimental-model animal bnode
    // (make_experimental_model_with_genotype, Genotype.py:689-703), an
    // is-model-of association with the composed description, ZFIN
    // publication source, and PMID equivalence with clique leadership.
    // Labels fall back to curies — the reference's id_label_map fallback
    // path (ZFIN.py:2685-2692); the synthesized fish labels live in the
    // fish tier's per-group state, not a cross-tier hash. ---------------
    in.get("fish_disease_models").foreach { fdm =>
      val ts = fdm.filter(coalesce(col("FishID"), lit("")) =!= "" &&
          coalesce(col("DoTermID"), lit("")) =!= "")
        .select(col("FishID"), col("EnvironmentID"), col("DoTermID"),
          col("DoTermName"), col("PubID"), col("PubMedID"))
        .as[(String, String, String, String, String, String)]
        .flatMap { case (fishNum, envId, doId, doName, pub, pmid) =>
          val fish = s"ZFIN:${fishNum.trim}"
          val envLabel = Option(envId).filter(_.nonEmpty)
            .map("ZFIN:" + _).getOrElse("ZFIN:")
          val animal = "_:" + Digest.md5IdScala(
            s"$taxonId-with-$fish".replace(":", ""))
          val pubOpt = Option(pub).filter(_.nonEmpty).map("ZFIN:" + _)
          val desc = s"A fish with genotype $fish is a model for disease " +
            s"$doName under the condition of $envLabel"
          val aid = "_:" + Digest.assocIdScalaMd5(definedBy, fish,
            Vocab.isModelOf, doId)
          Model.individualTriples(animal, s"$fish zebrafish",
            Some(taxonId)) ++
            Model.addTriple(animal, hasGenotype, fish) ++
            Assoc0(definedBy, fish, Vocab.isModelOf, doId,
              sources = pubOpt.toSeq, explicitId = Some(aid)).triples ++
            Model.addDescription(aid, desc) ++
            Option(pmid).filter(_.nonEmpty).toSeq.flatMap { p =>
              val pm = s"PMID:${p.trim}"
              pubOpt.toSeq.flatMap(z => Model.addSameIndividual(z, pm)) ++
                Seq(Triple.typed(pm, "MONARCH:cliqueLeader", "true",
                  "xsd:boolean"))
            }
        }
      tiers += df(ts)
    }

    // ---- gene coordinates (_process_gene_coordinates,
    // ZFIN.py:2565-2630): GFF3 rows → FALDO intervals on the hardcoded
    // danRer10 build (the reference's own FIXME), gene_id pulled from
    // the attributes column ----------------------------------------------
    in.get("gene_coordinates").foreach { gc =>
      val build = "UCSC:danRer10"
      val rows = gc
        .filter(!col("Chromosome").startsWith("#") &&
          coalesce(col("Attributes"), lit("")) =!= "")
        .withColumn("gene_id", regexp_extract(
          regexp_replace(col("Attributes"), "\"", ""),
          "gene_id=([^;]+)", 1))
        .filter(col("gene_id") =!= "")
        .select(col("Chromosome"), col("Start").cast("long"),
          col("End").cast("long"), col("Strand"), col("gene_id"))
      val ts = rows.as[(String, Long, Long, String, String)]
        .flatMap { case (chrom, start, end, strand, gid) =>
          val gene = s"ZFIN:$gid"
          val chromClass = s"CHR:${taxonId.replace(":", "-")}$chrom"
          val chromInBuild = s"$build#chr$chrom"
          Model.addType(chromClass, Vocab.owlClass) ++
            G.addChromosomeInstance(chrom, build, chromClass) ++
            graft.emit.Feature.featureTriples(gene, null, null,
              chromInBuild, start, end, strand,
              digest = Digest.md5IdScala)
        }
      tiers += df(ts)
    }

    // ---- sequence-alteration dictionary (_process_features,
    // ZFIN.py:1576-1650): every alteration is an individual of its SO
    // type; construct-derived alterations get the construct declaration
    // + `sequence derives from` provenance -------------------------------
    in.get("features").foreach { f =>
      val ts = f
        .filter(coalesce(col("GenomicFeatureID"), lit("")) =!= "")
        .select(col("GenomicFeatureID"), col("FeatureSoID"),
          col("Abbreviation"), col("Name"), col("ConstructID"),
          col("ConstructName"), col("ConstructSoID"))
        .as[(String, String, String, String, String, String, String)]
        .flatMap { case (fid, soId, abbrev, name, cid, cname, cso) =>
          val feat = s"ZFIN:${fid.trim}"
          Model.individualTriples(feat, name, Some(soId)) ++
            Option(abbrev).filter(_.nonEmpty).toSeq
              .flatMap(Model.addSynonym(feat, _)) ++
            Option(cid).map(_.trim).filter(_.nonEmpty).toSeq.flatMap { c =>
              val construct = s"ZFIN:$c"
              G.addConstruct(construct, cname,
                Option(cso).filter(_.nonEmpty).getOrElse("SO:0000804")) ++
                G.addSequenceDerivesFrom(feat, construct)
            }
        }
      tiers += df(ts)
    }

    // ---- alteration → affected gene (_process_feature_affected_genes,
    // ZFIN.py:1651-1784): 'is allele of' rows mint the variant locus
    // (same digest form as the genotype-feature walk,
    // _make_variant_locus_id ZFIN.py:2890-2904) between the alteration
    // and its gene; deficiencies/translocations spanning several genes
    // stay locus-less. The reference's literal gate compares
    // `globaltcid[feature_so_id]` — an SO TYPE, so its variant-locus
    // branch is dead code; this engine applies the documented intent
    // (the Genomic Feature - Marker Relationship column). ----------------
    in.get("features_affected_genes").foreach { fg =>
      val ts = fg
        .filter(coalesce(col("GenomicFeatureID"), lit("")) =!= "" &&
          coalesce(col("GeneID"), lit("")) =!= "")
        .select(col("GenomicFeatureID"), col("FeatureSoID"),
          col("Abbreviation"), col("GeneSymbol"), col("GeneID"),
          col("GeneSoID"), col("Relationship"))
        .as[(String, String, String, String, String, String, String)]
        .flatMap { case (fid, soId, abbrev, gsym, gid, gso, rel) =>
          val feat = s"ZFIN:${fid.trim}"
          val gene = s"ZFIN:${gid.trim}"
          G.addGene(gene, gsym,
            Option(gso).filter(_.nonEmpty).getOrElse(Vocab.gene)) ++
            G.addSequenceAlteration(feat, abbrev,
              Option(soId).filter(_.nonEmpty)
                .getOrElse(Vocab.sequenceAlteration)) ++
            (if (rel == "is allele of") {
              val vl = "_:" + Digest.md5IdScala(strip(s"$gene-$feat"))
              G.addParts(feat, vl, Vocab.hasVariantPart) ++
                Model.individualTriples(vl,
                  G.makeVariantLocusLabel(gsym, abbrev),
                  Some(Vocab.variantLocus)) ++
                G.addAlleleOfGene(vl, gene)
            } else Nil)
        }
      tiers += df(ts)
    }

    // ---- publication dictionary (_process_pubinfo, ZFIN.py:1935-2013):
    // the et-al-shortened citation label, dc:title, journal-article
    // typing when a PMID exists (document otherwise), PMID equivalence
    // with clique leadership ---------------------------------------------
    in.get("pubs").foreach { p =>
      val ts = p
        .filter(coalesce(col("PubID"), lit("")) =!= "")
        .select(col("PubID"), col("PubMedID"), col("Authors"),
          col("Title"), col("Journal"), col("Year"), col("Volume"),
          col("Pages"))
        .as[(String, String, String, String, String, String, String,
             String)]
        .flatMap { case (pid, pmid, authors, title, journal, year, vol,
                         pages) =>
          val pub = s"ZFIN:${pid.trim}"
          val alist = Option(authors).getOrElse("").split(",")
          val astring =
            if (alist.length > 1) alist(0).trim + " et al" else authors
          val label = Seq(astring, title, journal, year, vol, pages)
            .map(Option(_).getOrElse("")).mkString("; ")
          val pm = Option(pmid).map(_.trim).filter(_.nonEmpty)
          val refType = if (pm.isDefined) journalArticle else "IAO:0000310"
          Model.individualTriples(pub, label, Some(refType)) ++
            Option(title).filter(_.nonEmpty).toSeq
              .map(t => Triple.str(pub, "dc:title", t)) ++
            pm.toSeq.flatMap { n =>
              val pmCurie = s"PMID:$n"
              Model.individualTriples(pmCurie, null, Some(journalArticle)) ++
                Model.addSameIndividual(pub, pmCurie) ++
                Seq(Triple.typed(pmCurie, "MONARCH:cliqueLeader", "true",
                  "xsd:boolean"))
            }
        }
      tiers += df(ts)
    }

    // ---- supplementary PMID links (_process_pub2pubmed,
    // ZFIN.py:2014-2068): blank PMIDs drop; both ends typed journal
    // article, no leader bit (the reference emits none here) -------------
    in.get("pub2pubmed").foreach { pp =>
      val ts = pp
        .filter(trim(coalesce(col("PubMedID"), lit(""))) =!= "" &&
          coalesce(col("PubID"), lit("")) =!= "")
        .select(col("PubID"), col("PubMedID"))
        .as[(String, String)]
        .flatMap { case (pid, pmid) =>
          val pub = s"ZFIN:${pid.trim}"
          val pm = s"PMID:${pmid.trim}"
          Model.individualTriples(pub, null, Some(journalArticle)) ++
            Model.individualTriples(pm, null, Some(journalArticle)) ++
            Model.addSameIndividual(pub, pm)
        }
      tiers += df(ts)
    }

    // ---- linkage-panel mappings (_process_mappings, ZFIN.py:2333-2426):
    // genes stay classes / alleles individuals (typed elsewhere), both
    // clique leaders in-taxon; the panel is a reference genome (the
    // static six-panel hash, _get_mapping_panel_info ZFIN.py:2853-2888)
    // carrying a panel chromosome instance the feature is a
    // subsequence of -----------------------------------------------------
    in.get("mappings").foreach { mp =>
      val taxonLabel = "Danio rerio"
      tiers += df(spark.createDataset(G.addGenome(taxonId, taxonLabel)))
      val ts = mp
        .filter(coalesce(col("ZfinID"), lit("")) =!= "" &&
          coalesce(col("Chromosome"), lit("")) =!= "")
        .select(col("ZfinID"), col("PanelSymbol"),
          col("Chromosome"))
        .as[(String, String, String)]
        .flatMap { case (znum0, panel0, chrom0) =>
          val znum = znum0.trim
          val chrom = chrom0.trim
          val panel = Option(panel0).map(_.trim).getOrElse("")
          val zfin = s"ZFIN:$znum"
          val entity =
            if (znum.startsWith("ZDB-GENE-"))
              Some(Model.addType(zfin, Vocab.owlClass))
            else if (znum.startsWith("ZDB-ALT-"))
              Some(Model.addType(zfin, Vocab.namedIndividual))
            else None // BAC ends, ESTs, SSLPs… skipped (the reference's else)
          entity.toSeq.flatMap { base =>
            val chrClass = s"CHR:${taxonId.replace(":", "-")}$chrom"
            base ++ G.addTaxon(taxonId, zfin) ++
              Seq(Triple.typed(zfin, "MONARCH:cliqueLeader", "true",
                "xsd:boolean")) ++
              G.addChromosomeClass(chrom, taxonId, taxonLabel) ++
              mappingPanels.get(panel).toSeq.flatMap {
                case (pid, pname, ptype) =>
                  val panelCurie = s"ZFIN:$pid"
                  G.addReferenceGenome(panelCurie, s"$panel $ptype map",
                    taxonId) ++
                    Model.addSynonym(panelCurie, panel) ++
                    Model.addDescription(panelCurie, pname) ++
                    G.addChromosomeInstance(chrom, panelCurie, chrClass) ++
                    graft.emit.Feature.subsequenceOf(zfin,
                      s"$panelCurie#chr$chrom")
              }
          }
        }
      tiers += df(ts)
    }

    // ---- ZebrafishMine orthology evidence (process_orthology_evidence,
    // ZFIN.py:2981-3038): the same default orthology association as
    // human_orthos, but sourced from BOTH the ZFIN publication (typed
    // document) and the PMID (typed journal article), evidence via the
    // shared abbreviation→ECO map ----------------------------------------
    in.get("zmine_ortho_evidence").foreach { oe =>
      val ts = oe.filter(coalesce(col("zfin_gene_num"), lit("")) =!= "" &&
          coalesce(col("ortholog_ncbigene_num"), lit("")) =!= "")
        .select(col("zfin_gene_num"), col("ortholog_ncbigene_num"),
          col("evidence_code"), col("zfin_pub_num"), col("pubmed_num"))
        .as[(String, String, String, String, String)]
        .flatMap { case (znum, onum, ev, zpub, pmid) =>
          val zfin = s"ZFIN:${znum.trim}"
          val ortho = s"NCBIGene:${onum.trim}"
          val zpubOpt = Option(zpub).map(_.trim).filter(_.nonEmpty)
            .map("ZFIN:" + _)
          val pmOpt = Option(pmid).map(_.trim).filter(_.nonEmpty)
            .map("PMID:" + _)
          val evidence = Option(ev).filter(_.nonEmpty).toSeq
            .flatMap(e => orthoEvidence.get(e).flatten)
          zpubOpt.toSeq.flatMap(p =>
            Model.individualTriples(p, null, Some("IAO:0000310"))) ++
            pmOpt.toSeq.flatMap(p =>
              Model.individualTriples(p, null, Some(journalArticle))) ++
            Assoc0(definedBy, zfin, Vocab.inOrthologyRelationshipWith,
              ortho, evidence = evidence,
              sources = zpubOpt.toSeq ++ pmOpt.toSeq,
              explicitId = Some("_:" + Digest.assocIdScalaMd5(definedBy,
                zfin, Vocab.inOrthologyRelationshipWith, ortho))).triples
        }
      tiers += df(ts)
    }

    tiers.reduceOption(_ unionByName _)
      .getOrElse(spark.emptyDataset[Triple].toDF())
  }

  private val journalArticle = "IAO:0000013"

  /** The six ZFIN mapping panels → (refcross id, name, map type)
    * (_get_mapping_panel_info, ZFIN.py:2853-2888). */
  private val mappingPanels: Map[String, (String, String, String)] = Map(
    "HS" -> (("ZDB-REFCROSS-000320-1", "Heat Shock", "meiotic")),
    "GAT" -> (("ZDB-REFCROSS-990308-7", "Gates et al", "meiotic")),
    "LN54" -> (("ZDB-REFCROSS-990426-6", "Loeb/NIH/5000/4000",
      "Radiation Hybrid")),
    "MGH" -> (("ZDB-REFCROSS-980521-11", "Boston MGH Cross", "meiotic")),
    "MOP" -> (("ZDB-REFCROSS-980526-5", "Mother of Pearl", "meiotic")),
    "T51" -> (("ZDB-REFCROSS-990707-1", "Goodfellow T51",
      "Radiation Hybrid")))

  /** Orthology-evidence abbreviation → ECO
    * (get_orthology_evidence_code, ZFIN.py:3040-3083; NS/OT unmapped). */
  private val orthoEvidence: Map[String, Option[String]] = Map(
    "AA" -> Some("ECO:0000031"), "CE" -> Some("ECO:0000008"),
    "CL" -> Some("ECO:0000044"), "FC" -> Some("ECO:0000012"),
    "FH" -> Some("ECO:0000064"), "IX" -> Some("ECO:0000040"),
    "NS" -> None, "NT" -> Some("ECO:0000032"),
    "SI" -> Some("ECO:0000094"), "SL" -> Some("ECO:0000122"),
    "SS" -> Some("ECO:0000024"), "SU" -> Some("ECO:0000027"),
    "XH" -> Some("ECO:0000002"), "PT" -> Some("ECO:0000080"),
    "OT" -> None)

  /** `_make_transgene_part_id` (ZFIN.py:1928-1933): digest of
    * `construct-gene-relationship` with non-word runs hyphenated and
    * ZFIN: prefixes stripped. */
  private def transgenePartId(construct: String, gene: String,
                              rel: String): String =
    "_:" + Digest.md5IdScala(strip(
      s"$construct-$gene-${rel.replaceAll("\\W+", "-")}"))

  override def testIds: Seq[String] = Seq("ZFIN:ZDB-FISH-150901-10750")
}
