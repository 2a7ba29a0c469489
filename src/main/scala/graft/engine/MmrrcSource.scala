package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.{Digest, Vocab}
import graft.emit.ColumnEmit
import graft.emit.ColumnEmit.{res, str => strT}

/** The MMRRC mutant-mouse strain catalog ingest
  * (dipper/sources/MMRRC.py): one CSV, two tiers —
  *
  * Row tier: the strain individual (typed mouse, or stem cell when
  * STATE is ES; clique leader; optional research-areas description),
  * journal-article nodes for the comma-separated PMID list, and
  * allele→MP-phenotype OBAN associations with each PMID as dc:source
  * (MMRRC.py:273-291) — MP ids recognized by the reference's trailing
  * `[MP:` bracket check.
  *
  * Strain tier (the reference's post-loop `strain_hash` walk,
  * MMRRC.py:325-409): per-strain variant/gene sets → variant loci
  * (synthetic `<gene>-VL` bnodes when only genes are known), one
  * indeterminate-zygosity VSLC per locus, a GVC when more than one,
  * and the assembled genotype on an unspecified genomic background.
  * The dict walk becomes one `groupBy(strain)` with sorted-distinct
  * `collect_list` sets; the per-locus loops are `transform`/`explode`
  * over the aggregated arrays — a single shuffle for the whole tier.
  *
  * Documented deviations: (a) the reference's phenotype-id slice
  * `lb_mp[-11:-2]` drops the last digit of every 7-digit MP local id
  * (MMRRC.py:246-248) — we keep the full id (same bracket check, full
  * capture), the truncation being an off-by-one no consumer can want;
  * (b) an allele id that appears with two different symbols keeps both
  * labels (set semantics) where the reference's `id_label_hash` keeps
  * the last-parsed one — file-order dependence we do not reproduce.
  */
object MmrrcSource extends GraftSource {
  val name = "mmrrc"
  private val definedBy = "EX:mmrrc"

  private val columns = Seq("STRAIN/STOCK_ID", "STRAIN/STOCK_DESIGNATION",
    "STRAIN_TYPE", "STATE", "MGI_ALLELE_ACCESSION_ID", "ALLELE_SYMBOL",
    "ALLELE_NAME", "MUTATION_TYPE", "CHROMOSOME", "MGI_GENE_ACCESSION_ID",
    "GENE_SYMBOL", "GENE_NAME", "SDS_URL", "ACCEPTED_DATE", "MPT_IDS",
    "PUBMED_IDS", "RESEARCH_AREAS")

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = Map(
    "catalog" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/mmrrc_catalog_data.csv",
        StructType(columns.map(StructField(_, StringType))),
        delimiter = ",")))

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    val g = graft.core.TranslationTable.default
    val mouse = g.resolve("Mus musculus")
    val stemCell = g.resolve("stem cell")
    val leaderPred = g.resolve("clique_leader")
    val journalArticle = g.resolve("journal article")
    val intrinsicGenotype = g.resolve("intrinsic genotype")
    val unspecifiedBkgd = g.resolve("unspecified_genomic_background")
    val hasGenotype = g.resolve("has_genotype")

    def clean(c: Column) = trim(coalesce(c, lit("")))

    val rows = graft.operators.ScanStats.widen(in("catalog"))
      // the reference's only row skip outside test mode (MMRRC.py:174-176)
      .filter(coalesce(col("GENE_NAME"), lit("")) =!= "withdrawn")
      .select(
        regexp_replace(clean(col("`STRAIN/STOCK_ID`")), "-\\w+$", "")
          .as("strain"),
        coalesce(col("`STRAIN/STOCK_DESIGNATION`"), lit(""))
          .as("strainLabel"),
        clean(col("STATE")).as("state"),
        clean(col("MGI_ALLELE_ACCESSION_ID")).as("allele0"),
        coalesce(col("ALLELE_SYMBOL"), lit("")).as("alleleSym"),
        regexp_replace(clean(col("MGI_GENE_ACCESSION_ID")), "\\s+", "")
          .as("gene0"),
        clean(col("GENE_SYMBOL")).as("geneSym"),
        clean(col("MPT_IDS")).as("mpts"),
        clean(col("PUBMED_IDS")).as("pubs"),
        clean(col("RESEARCH_AREAS")).as("research"))
      // erroneous allele-id fixes (MMRRC.py:192-199): MG: → MGI:, other
      // non-MGI prefixes dropped
      .withColumn("allele",
        when(col("allele0").startsWith("MGI:"), col("allele0"))
          .when(col("allele0").startsWith("MG:"),
            concat(lit("MGI:"), substring(col("allele0"), 4, Int.MaxValue)))
          .otherwise(lit("")))
      // NULL / GeneID: gene-id normalization (MMRRC.py:219-224)
      .withColumn("gene",
        when(col("gene0") === "NULL", lit(""))
          .when(col("gene0").startsWith("GeneID:"),
            concat(lit("NCBIGene:"),
              substring(col("gene0"), 8, Int.MaxValue)))
          .otherwise(col("gene0")))

    // ---- row tier -------------------------------------------------------
    // strain-level triples from the DISTINCT strain projection: the
    // catalog repeats a strain across its mutation rows (the reference
    // re-adds the individual per row and relies on store dedup); the
    // distinct is strain-dimension-bounded and keeps the per-row emit
    // volume proportional to what actually survives the set-dedup
    val strainTriples = ColumnEmit.emitFiltered(
      rows.select("strain", "state", "strainLabel", "research").distinct(),
      res(col("strain"), lit(Vocab.a),
        when(col("state") === "ES", lit(stemCell)).otherwise(lit(mouse))),
      strT(col("strain"), lit(Vocab.label),
        when(col("strainLabel") =!= "", col("strainLabel"))),
      strT(col("strain"), lit(Vocab.description),
        when(col("research") =!= "",
          concat(lit("Research Areas: "), col("research")))),
      ColumnEmit.typed(col("strain"), lit(leaderPred), lit("true"),
        "xsd:boolean"))

    val taxonClass = ColumnEmit.emit(
      spark.range(1).toDF("one"),
      res(lit(mouse), lit(Vocab.a), lit(Vocab.owlClass)))

    // "PMID: 8356452, PMID: 8825288" → PMID:8356452 … (MMRRC.py:259-266)
    val pubRows = rows.filter(col("pubs") =!= "")
      .select(col("strain"),
        explode(split(col("pubs"), ",")).as("pm"))
      .withColumn("pmid", regexp_replace(col("pm"), "\\s+", ""))
      .filter(col("pmid") =!= "")
    val pubTriples = ColumnEmit.emit(pubRows.select("pmid").distinct(),
      res(col("pmid"), lit(Vocab.a), lit(journalArticle)))

    // MP ids from "label [MP:0001393]" entries; the bracket check is the
    // reference's, the capture keeps all 7 local digits (deviation (a))
    val phenoRows = rows.filter(col("mpts") =!= "")
      .select(col("allele"), col("pubs"),
        explode(split(col("mpts"), ",")).as("mp0"))
      .withColumn("pid",
        regexp_extract(trim(col("mp0")), "\\[(MP:.{7})\\]$", 1))
      .filter(col("pid") =!= "")
    // phenotype vocabulary is MP-bounded — emit classes once per term
    val phenoClassTriples = ColumnEmit.emit(
      phenoRows.select("pid").distinct(),
      res(col("pid"), lit(Vocab.a), lit(Vocab.owlClass)))

    val assocRows = phenoRows.filter(col("allele") =!= "")
      .withColumn("aid", concat(lit("_:"), Digest.md5Id(concat_ws("+",
        lit(definedBy), col("allele"), lit(Vocab.hasPhenotype),
        col("pid")))))
    val assocTriples = ColumnEmit.emit(
      assocRows.select("allele", "pid", "aid").distinct(),
      res(col("allele"), lit(Vocab.hasPhenotype), col("pid")),
      res(col("aid"), lit(Vocab.a), lit(Vocab.association)),
      res(col("aid"), lit(Vocab.assocHasSubject), col("allele")),
      res(col("aid"), lit(Vocab.assocHasPredicate), lit(Vocab.hasPhenotype)),
      res(col("aid"), lit(Vocab.assocHasObject), col("pid")))
    val assocSourceTriples = ColumnEmit.emit(
      assocRows.filter(col("pubs") =!= "")
        .select(col("aid"), explode(split(col("pubs"), ",")).as("pm"))
        .withColumn("pmid", regexp_replace(col("pm"), "\\s+", ""))
        .filter(col("pmid") =!= "")
        // (aid, pmid)-bounded: the catalog repeats an (allele, MP, pubs)
        // combination across its strain rows (measured 87 k raw → 400
        // surviving at sf0.1); distinct here keeps the emit volume at
        // what the set-dedup would keep anyway
        .select("aid", "pmid").distinct(),
      res(col("aid"), lit(Vocab.source), col("pmid")))

    // ---- strain tier (strain_hash walk, MMRRC.py:325-409) ---------------
    val perStrain = rows
      .groupBy(col("strain"))
      .agg(
        array_sort(array_distinct(collect_list(
          when(col("allele") =!= "",
            struct(col("allele").as("id"), col("alleleSym").as("sym"))))))
          .as("vars"),
        array_sort(array_distinct(collect_list(
          when(col("gene") =!= "",
            struct(col("gene").as("id"), col("geneSym").as("sym"))))))
          .as("genes"))
      .withColumn("nv", size(col("vars")))
      .withColumn("ng", size(col("genes")))
      // variant loci: the real alleles, else one synthetic `<gene>-VL`
      // bnode per known gene (MMRRC.py:325-341); re-sorted by locus id
      // to mirror `sorted(vl_set)`
      .withColumn("vls", array_sort(
        when(col("nv") > 0, org.apache.spark.sql.functions.transform(
          col("vars"), v => struct(v("id").as("id"), v("sym").as("sym"),
            lit(null).cast("string").as("gene"),
            lit(null).cast("string").as("geneSym"))))
        .otherwise(org.apache.spark.sql.functions.transform(
          col("genes"), gn => struct(
            concat(lit("_:"), Digest.md5Id(
              concat(translate(gn("id"), ":", ""), lit("-VL")))).as("id"),
            concat(gn("sym"), lit("<?>")).as("sym"),
            gn("id").as("gene"), gn("sym").as("geneSym"))))))
      .filter(size(col("vls")) > 0)
      // one unknown-zygosity VSLC per locus (MMRRC.py:343-365)
      .withColumn("vslcs", org.apache.spark.sql.functions.transform(
        col("vls"), v => struct(
          concat(lit("_:"), Digest.md5Id(concat(
            translate(regexp_replace(v("id"), "^_", ""), ":", ""),
            lit("U")))).as("id"),
          concat(v("sym"), lit("/?")).as("sym"),
          v("id").as("vl"))))
      .withColumn("vslcIds", org.apache.spark.sql.functions.transform(
        col("vslcs"), v => v("id")))
      // GVC over >1 VSLC: digest of the python `str(list)` rendering,
      // re-digested after the `_`/`:` strip (MMRRC.py:366-381)
      .withColumn("gvc",
        when(size(col("vslcIds")) > 1,
          concat(lit("_:"), Digest.md5Id(Digest.md5Id(
            concat(lit("['"), array_join(col("vslcIds"), "', '"),
              lit("']"))))))
        .otherwise(element_at(col("vslcIds"), 1)))
      .withColumn("gvcLabel",
        array_join(org.apache.spark.sql.functions.transform(
          col("vslcs"), v => v("sym")), "; "))
      // the unspecified background + genotype (MMRRC.py:384-406)
      .withColumn("bkgdStr", concat(
        translate(lit(unspecifiedBkgd), ":", ""), lit("-"),
        translate(col("strain"), ":", "")))
      .withColumn("bkgdId", concat(lit("_:"), Digest.md5Id(col("bkgdStr"))))
      .withColumn("genoId", concat(col("gvc"), lit("-"), col("bkgdStr")))
      // three tiers (vl, vslc, genotype) consume this strain-bounded
      // aggregate; without a persist each re-runs the full catalog scan
      // + groupBy + digest chain (measured 3×~1.5 s at sf0.1), and a
      // LAZY persist doesn't help because the branches race within one
      // job — force it eagerly (the Dedup.materialize discipline). The
      // relation is strain-catalog-sized (one row per stock id), so the
      // cached footprint is dimension-bounded at any corpus scale.
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    perStrain.count()

    // locus/VSLC dimension rows are allele-catalog-bounded, not
    // strain-bounded: the same MGI allele appears in many strains with
    // an identical emission context, so distinct the projected context
    // before emitting (measured 120 k/199 k raw → 120/200 surviving).
    // The distinct must run over emission-relevant SCALARS — carrying
    // the per-strain `genes` array through it keeps every strain's rows
    // distinct and collapses nothing
    val vlRows = perStrain
      .select(col("nv"), col("ng"), col("genes"),
        explode(col("vls")).as("v"))
      .select(
        (col("nv") === 1 && col("ng") === 1).as("oneToOne"),
        when(col("ng") === 1, element_at(col("genes"), 1)("id")).as("gene1"),
        col("v")("id").as("vl"), col("v")("sym").as("sym"),
        col("v")("gene").as("sgene"), col("v")("geneSym").as("sgeneSym"))
      .distinct()
    val vlTriples = ColumnEmit.emitFiltered(vlRows,
      res(col("vl"), lit(Vocab.a), lit(Vocab.variantLocus)),
      strT(col("vl"), lit(Vocab.label), when(col("sym") =!= "", col("sym"))),
      // real allele, unambiguous 1:1 → is_allele_of the single gene;
      // ambiguous → typed a plain allele too (the reference's re-call of
      // addAllele with the default type, MMRRC.py:332-337)
      res(when(col("sgene").isNull && col("oneToOne"), col("vl")),
        lit(Vocab.isAlleleOf), col("gene1")),
      res(when(col("sgene").isNull && !col("oneToOne"),
        col("vl")), lit(Vocab.a), lit(Vocab.allele)),
      // synthetic locus: the gene class + is_allele_of (MMRRC.py:331-341)
      res(col("sgene"), lit(Vocab.a), lit(Vocab.owlClass)),
      strT(col("sgene"), lit(Vocab.label),
        when(col("sgeneSym") =!= "", col("sgeneSym"))),
      res(col("sgene"), lit(Vocab.subClassOf), lit(Vocab.gene)),
      res(when(col("sgene").isNotNull, col("vl")), lit(Vocab.isAlleleOf),
        col("sgene")))

    val vslcRows = perStrain
      .select(col("gvc"), explode(col("vslcs")).as("v"))
      .select(col("gvc"), col("v")("id").as("vslc"),
        col("v")("sym").as("sym"), col("v")("vl").as("vl"))
      .distinct()
    val vslcTriples = ColumnEmit.emitFiltered(vslcRows,
      res(col("vslc"), lit(Vocab.a), lit(Vocab.vslc)),
      strT(col("vslc"), lit(Vocab.label), col("sym")),
      res(col("vslc"), lit(Vocab.hasZygosity), lit(Vocab.indeterminate)),
      res(col("vslc"), lit(Vocab.hasVariantPart), col("vl")),
      // VSLC into the GVC only when a distinct GVC exists
      res(when(col("gvc") =!= col("vslc"), col("gvc")),
        lit(Vocab.hasVariantPart), col("vslc")))

    val genotypeTriples = ColumnEmit.emitFiltered(perStrain,
      res(when(col("gvc") =!= element_at(col("vslcIds"), 1), col("gvc")),
        lit(Vocab.a), lit(Vocab.gvc)),
      strT(when(col("gvc") =!= element_at(col("vslcIds"), 1), col("gvc")),
        lit(Vocab.label), col("gvcLabel")),
      res(col("bkgdId"), lit(Vocab.inTaxon), lit(mouse)),
      res(col("bkgdId"), lit(Vocab.a), lit(unspecifiedBkgd)),
      strT(col("bkgdId"), lit(Vocab.label),
        concat(lit("unspecified ("), col("strain"), lit(")"))),
      strT(col("bkgdId"), lit(Vocab.description),
        concat(lit("A placeholder for the unspecified genetic background for "),
          col("strain"))),
      res(col("genoId"), lit(Vocab.hasReferencePart), col("bkgdId")),
      res(col("genoId"), lit(Vocab.hasVariantPart), col("gvc")),
      res(col("genoId"), lit(Vocab.a), lit(intrinsicGenotype)),
      strT(col("genoId"), lit(Vocab.label),
        concat(col("gvcLabel"), lit(" [n.s.]"))),
      res(col("strain"), lit(hasGenotype), col("genoId")))

    // force the union while perStrain is still cached, then release it —
    // the Dedup.finalized discipline; without this every transform call
    // leaks a MEMORY_AND_DISK entry for the session's lifetime. The
    // persisted result is triples-of-the-strain-catalog sized (small);
    // callers may drop it with result.unpersist() when done.
    val result = strainTriples
      .union(taxonClass)
      .union(pubTriples)
      .union(phenoClassTriples)
      .union(assocTriples)
      .union(assocSourceTriples)
      .union(vlTriples)
      .union(vslcTriples)
      .union(genotypeTriples)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    result.count()
    perStrain.unpersist(false)
    result
  }

  override def testIds: Seq[String] =
    Seq("MMRRC:037507", "MMRRC:041175", "MMRRC:036933")
}
