package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.{Digest, FlatYaml, TranslationTable, Triple, Vocab}
import graft.emit.{Assoc, Association, Genotype, Model}
import graft.sources.{DelimitedSource, SourceFile}

/** GAF-format annotation ingest (dipper/sources/GeneOntology.py — the
  * gene-annotation archetype shared with RGD/WormBase/SGD): comment-aware
  * headerless 17-column scan of per-taxon `*.gaf(.gz)` files
  * (GeneOntology.py:52-70 column list, py:288-295 `!`-comment skip),
  * UniProt→Entrez/ENSEMBL identifier mapping via the idmapping sidecar
  * (py:503-570: GeneID preferred, Ensembl fallback, multi-valued `;`
  * entries unmapped; unmapped UniProt rows DROP, py:344-347), GAF-prefix
  * rewrites and aspect→relation routing through the local table
  * (translationtable/go.yaml), evidence-code→ECO via the gaf-eco map
  * (py:392-396), pipe-split references with the `MGI:MGI:` second-to-last
  * prefix sidestep and PMID journal-article typing (py:398-410), synonym
  * fan-out where `UniProtKB:` synonyms become gene products
  * (py:367-380), and the IMP With/From branch deriving reagent-targeted
  * G2P phenotype associations (py:442-490).
  *
  * Scale shape: the idmapping sidecar is the join dimension (the
  * reference loads its 10 GB unzipped form into a driver dict; here it
  * is a pruned two-column frame that Catalyst broadcasts only when its
  * size stats clear the threshold — no forced hint, so a fact-sized
  * unpruned sidecar degrades to a shuffle join instead of a driver
  * OOM), everything else is per-row
  * column work and one flatMap emission — no shuffle before the final
  * graph set-dedup. The per-taxon file manifest of the reference
  * (files ∩ tax_ids, py:269) is a scan-level partition prune; the same
  * constraint lands here as leading filters on both scans, pushed down
  * by Catalyst.
  */
object GoGafSource extends GraftSource {
  val name = "go_gaf"

  private val gafCols = Seq("DB", "DB_Object_ID", "DB_Object_Symbol",
    "Qualifier", "GO_ID", "DB_Reference", "Evidence_Code", "With_From",
    "Aspect", "DB_Object_Name", "DB_Object_Synonym", "DB_Object_Type",
    "Taxon", "Date", "Assigned_By", "Annotation_Extension",
    "Gene_Product_Form_ID")
  private val gafSchema = StructType(gafCols.map(StructField(_, StringType)))

  // idmapping_selected.tab column list (GeneOntology.py:166-188)
  private val idmapCols = Seq("UniProtKB_AC", "UniProtKB_ID", "GeneID",
    "RefSeq", "GI", "PDB", "GO", "UniRef100", "UniRef90", "UniRef50",
    "UniParc", "PIR", "NCBI_taxon", "MIM", "UniGene", "PubMed", "EMBL",
    "EMBL_CDS", "Ensembl", "Ensembl_TRS", "Ensembl_PRO", "Additional_PubMed")
  private val idmapSchema = StructType(idmapCols.map(StructField(_, StringType)))

  /** gaf-eco-mapping.yaml shape (GeneOntology.py:259-260). */
  private[engine] lazy val gafEco: Map[String, String] =
    FlatYaml.fromResource("/graft/gaf_eco.yaml")

  /** GAF prefix rewrites (the prefix half of the reference's go localtt,
    * GeneOntology.py:332-333,402-404,453-455). */
  private[engine] lazy val prefixRewrites: Map[String, String] =
    FlatYaml.fromResource("/graft/go_prefix_rewrites.yaml")

  private lazy val tt = TranslationTable.forSource("go")

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = Map(
    "gaf" -> DelimitedSource.read(spark, SourceFile(s"$dataDir/*.gaf*",
      gafSchema, hasHeader = false, comment = Some('!'))),
    "idmapping" -> DelimitedSource.read(spark,
      SourceFile(s"$dataDir/idmapping_selected.tab*", idmapSchema,
        hasHeader = false)))

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame =
    transform(spark, in, Nil)

  case class GafRow(db: String, objId: String, symbol: String,
                    qualifier: String, goId: String, ref: String,
                    evCode: String, withFrom: String, aspect: String,
                    objName: String, objSyn: String, taxon: String,
                    mapped: Option[String])

  override def transform(spark: SparkSession, in: Map[String, DataFrame],
                         taxa: Seq[String]): DataFrame =
    transformDigest(spark, in, taxa, Digest.sha1IdScala)

  /** Digest-parameterized twin (reference sha1 `make_id` by default; the
    * p10 oracle passes [[Digest.md5IdScala]] so DuckDB can re-derive the
    * association and reagent bnodes). */
  private[graft] def transformDigest(spark: SparkSession,
                                     in: Map[String, DataFrame],
                                     taxa: Seq[String],
                                     digest: String => String): DataFrame = {
    import spark.implicits._
    val cm = Runner.curieMap
    // UniProt AC -> gene id dimension: GeneID preferred, Ensembl fallback,
    // `;`-multivalued entries yield no mapping (py:556-561); the
    // reference's tax_ids row filter (py:552-553) is the leading prune.
    val nonList = (c: String) =>
      coalesce(col(c), lit("")) =!= "" && !col(c).contains(";")
    val idm0 = in("idmapping").select(
      col("UniProtKB_AC").as("__ac"),
      when(nonList("GeneID"), concat(lit("NCBIGene:"), col("GeneID")))
        .when(nonList("Ensembl"), concat(lit("ENSEMBL:"), col("Ensembl")))
        .as("__mapped"),
      col("NCBI_taxon").as("__ntax"))
    val idm = (if (taxa.isEmpty) idm0
               else idm0.filter(col("__ntax").isin(taxa: _*)))
      .filter(col("__mapped").isNotNull)
      .select("__ac", "__mapped")

    // required-field gate: the reference intends the first ten columns
    // plus taxon (py:321-326; the literal expression there only enforces
    // taxon) — enforce the fields the emission dereferences, plus the
    // NOT-qualifier drop (py:329-331)
    val taxFirst = regexp_replace(
      element_at(split(coalesce(col("Taxon"), lit("")), "\\|"), 1),
      "taxon", "NCBITaxon")
    val rows0 = in("gaf")
      .filter(Seq("DB", "DB_Object_ID", "GO_ID", "Evidence_Code", "Aspect",
        "Taxon").map(c => coalesce(col(c), lit("")) =!= "").reduce(_ && _))
      .filter(!coalesce(col("Qualifier"), lit("")).rlike("NOT"))
    // NO broadcast hint on the idmapping dimension: the UniProt sidecar
    // is ~10 GB unpruned in production and with `taxa = Nil` the pruned
    // two-column frame can still be hundreds of millions of rows — a
    // forced hint would bypass Catalyst's size check and OOM the driver
    // at exactly the scale this engine targets. Catalyst's own stats see
    // the column-pruned scan size, so a genuinely small dimension (the
    // per-taxon prune, or a test corpus) still broadcasts on its own;
    // past the autoBroadcastJoinThreshold this becomes a shuffle join
    // on __ac, which is the right plan for a fact-sized dimension.
    val rows = (if (taxa.isEmpty) rows0
                else rows0.filter(
                  taxa.map(t => taxFirst === s"NCBITaxon:$t").reduce(_ || _)))
      .join(idm, col("DB_Object_ID") === col("__ac"), "left")

    val local = prefixRewrites
    val eco = gafEco
    rows.select(col("DB").as("db"), col("DB_Object_ID").as("objId"),
        col("DB_Object_Symbol").as("symbol"), col("Qualifier").as("qualifier"),
        col("GO_ID").as("goId"), col("DB_Reference").as("ref"),
        col("Evidence_Code").as("evCode"), col("With_From").as("withFrom"),
        col("Aspect").as("aspect"), col("DB_Object_Name").as("objName"),
        col("DB_Object_Synonym").as("objSyn"), col("Taxon").as("taxon"),
        col("__mapped").as("mapped"))
      .as[GafRow]
      .flatMap { r =>
        def nz(s: String): String = if (s == null) "" else s.trim
        val dbase = local.getOrElse(nz(r.db), nz(r.db))
        // UniProtKB rows resolve through the idmapping dimension or drop
        // (py:335-353); everything else keeps the last `:` token
        val resolved: Option[(String, Option[String])] =
          if (dbase == "UniProtKB")
            r.mapped.map(m => (m, Some("UniProtKB:" + nz(r.objId))))
          else Some((dbase + ":" + nz(r.objId).split(':').last, None))
        resolved.toSeq.flatMap { case (geneId, uniprotId) =>
          val taxCurie =
            nz(r.taxon).split('|').head.replace("taxon", "NCBITaxon")
          // pipe-split references, second-to-last-prefix normalization
          // (py:398-410); PMIDs are typed journal articles
          def cleanRef(raw: String): Option[String] = {
            val t = raw.trim
            if (t.isEmpty) None
            else {
              val toks = t.split(':')
              if (toks.length < 2) Some(t)
              else {
                val pfx0 = toks(toks.length - 2)
                Some(local.getOrElse(pfx0, pfx0) + ":" + toks.last)
              }
            }
          }
          val refs = nz(r.ref).split('|').toSeq.flatMap(cleanRef)
          val refTypes = refs.filter(_.startsWith("PMID:"))
            .flatMap(p => Model.addType(p, Vocab.journalArticle))

          val geneCore =
            Model.addLabel(geneId, nz(r.symbol)) ++
              Model.addType(geneId, Vocab.gene) ++
              (if (nz(r.objName).nonEmpty)
                 Model.addDescription(geneId, nz(r.objName)) else Nil) ++
              nz(r.objSyn).split('|').toSeq.map(_.trim).filter(_.nonEmpty)
                .flatMap { syn =>
                  if (syn.startsWith("UniProtKB:"))
                    Seq(Triple.res(geneId, "RO:0002205", syn))
                  else Model.addSynonym(geneId, syn)
                } ++
              (if (taxCurie.nonEmpty) Genotype.addTaxon(taxCurie, geneId)
               else Nil)

          // aspect routing (py:413-426): resolved relation or the
          // contributes_to fallback; otherwise no association
          val aspect = nz(r.aspect)
          val rel: Option[String] = {
            val a = tt.resolve(aspect, mandatory = false)
            if (a != aspect) Some(a)
            else if (aspect == "F" && nz(r.qualifier).contains("contributes_to"))
              Some(TranslationTable.default.resolve("contributes to"))
            else None
          }
          val assoc = rel.toSeq.flatMap { p =>
            val a = Association("EX:go", geneId, p, nz(r.goId),
              evidence = eco.get(nz(r.evCode)).toSeq, sources = refs,
              explicitId = Some("_:" + digest(
                Seq("EX:go", geneId, p, nz(r.goId)).mkString("+"))))
            // set_description('Mapped from …') on the assoc node (py:428-429)
            a.triples ++ uniprotId.map(u =>
              Triple.str(a.id, Vocab.description, "Mapped from " + u))
          }

          // IMP With/From phenotype derivation (py:442-490): each item
          // becomes the G2P subject; MRPHLNO/CRISPR/TALEN and WBRNAi
          // reagents first mint a reagent-targeted gene
          val g2p =
            if (nz(r.evCode) == "IMP" && nz(r.withFrom).nonEmpty) {
              val phenotypeId = nz(r.goId) + "PHENOTYPE"
              nz(r.withFrom).split("[|,]").toSeq.map(_.trim)
                .filter(i => i.nonEmpty &&
                  !Seq("UniProtKB", "WBPhenotype", "InterPro", "HGNC")
                    .exists(i.startsWith))
                .flatMap { itm0 =>
                  val toks = itm0.split(':')
                  val pfx0 =
                    if (toks.length < 2) itm0 else toks(toks.length - 2)
                  val itm =
                    if (toks.length < 2) itm0
                    else local.getOrElse(pfx0, pfx0) + ":" + toks.last
                  val (subject, reagentTriples) =
                    if (Seq("MRPHLNO", "CRISPR", "TALEN").exists(itm.contains)) {
                      // ZFIN.make_targeted_gene_id py:3085-3092: strip
                      // every (ZFIN-prefixed) colon, then bnode-digest
                      val tg = "_:" + digest(
                        (geneId + "-" + itm).replaceAll("(ZFIN)?:", ""))
                      (tg, Genotype.addReagentTargetedGene(itm, geneId, tg))
                    } else if (itm.contains("WBRNAi")) {
                      // WormBase.make_reagent_targeted_gene_id py:985-986
                      val tg = "_:" + digest(geneId + "-" + itm)
                      (tg, Genotype.addReagentTargetedGene(itm, geneId, tg))
                    } else (itm, Nil)
                  reagentTriples ++ Assoc.g2p("EX:go", subject, phenotypeId,
                    evidence = if (refs.nonEmpty)
                      Seq(TranslationTable.default
                        .resolve("experimental phenotypic evidence")) else Nil,
                    sources = refs, digest = digest)
                }
            } else Nil

          geneCore ++ refTypes ++ assoc ++ g2p
        }
      }.toDF()
  }

  override def testIds: Seq[String] = Seq("NCBIGene:8644")
}
