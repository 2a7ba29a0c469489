package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.Vocab
import graft.emit.ColumnEmit
import graft.emit.ColumnEmit.{res, str}

/** The HGNC-shape gene-dimension ingest (dipper/sources/HGNC.py:140-305):
  * the authoritative human gene-symbol table → typed gene classes with
  * clique-leader marking, NCBIGene/Ensembl/OMIM equivalences, taxon,
  * publication `is about` links, and cytoband feature placement.
  *
  * Faithful routing (HGNC.py:225-305): non-Approved rows drop; a
  * `withdrawn` locus_type becomes a deprecated class; an `@`-suffixed
  * symbol (region/cluster loci) skips the row entirely; otherwise the
  * locus_type resolves through the two-layer table (tt/hgnc.yaml over
  * the global table) and ONLY a successful resolution emits the typed
  * class quad — but the clique-leader marker is unconditional, the
  * reference's `makeLeader` being outside the resolve guard. The OMIM
  * equivalence is gated on the mimTitles sidecar: Asterisk-typed mims
  * only, with Caret rows redirecting through their MOVED TO
  * replacements (the LAST gene-typed replacement wins, OMIMSource.py:
  * 196-230 + HGNC.py:253-263). Cytogenic locations parse with the
  * reference's regexes (chr `(\d+|X|Y|Z|W|MT)[pq$]` anchored, band
  * `[pq][A-H\d]?\d?(\.\d+)?` searched) into CHR:9606chr… ids with the
  * reciprocal subsequence pair.
  *
  * Scale shape: one fact scan; the only joins are against the
  * mimTitles dimension (mim-count sized — Catalyst broadcasts it from
  * size stats, no forced hint), everything else is codegen'd
  * projection + explode. The pipe-split omim/pubmed fan-outs explode
  * AFTER the scan so the fact relation is read once.
  */
object HgncSource extends GraftSource {
  val name = "hgnc"
  private val taxon = "NCBITaxon:9606"

  /** The reference's 49-column hgnc_complete_set manifest
    * (HGNC.py:30-88); only the columns the parse touches are projected,
    * but the full header is validated like the reference's
    * check_fileheader. */
  private val columns = Seq(
    "hgnc_id", "symbol", "name", "locus_group", "locus_type", "status",
    "location", "location_sortable", "alias_symbol", "alias_name",
    "prev_symbol", "prev_name", "gene_family", "gene_family_id",
    "date_approved_reserved", "date_symbol_changed", "date_name_changed",
    "date_modified", "entrez_id", "ensembl_gene_id", "vega_id", "ucsc_id",
    "ena", "refseq_accession", "ccds_id", "uniprot_ids", "pubmed_id",
    "mgd_id", "rgd_id", "lsdb", "cosmic", "omim_id", "mirbase", "homeodb",
    "snornabase", "bioparadigms_slc", "orphanet", "pseudogene.org",
    "horde_id", "merops", "imgt", "iuphar", "kznf_gene_catalog",
    "mamit-trnadb", "cd", "lncrnadb", "enzyme_id",
    "intermediate_filament_db", "rna_central_ids", "lncipedia", "gtrnadb",
    "agr")

  private def schemaOf(cols: Seq[String]): StructType =
    StructType(cols.map(StructField(_, StringType)))

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = Map(
    "genes" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/hgnc_complete_set.tsv",
        schemaOf(columns))),
    // the OMIMSource mimTitles sidecar (same landed shape OmiaSource
    // reads — prefix routes the mim's type, Caret titles carry MOVED TO)
    "omim_types" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/mimTitles.tsv",
        schemaOf(Seq("prefix", "mim_number", "preferred_title")))))

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    val tt = graft.core.TranslationTable.forSource("hgnc")
    val g = graft.core.TranslationTable.default
    val leaderPred = g.resolve("clique_leader")

    val rows0 = graft.operators.ScanStats.widen(in("genes"))
      .filter(col("status") === "Approved")
      .select(col("hgnc_id").as("id"), col("symbol"),
        when(coalesce(col("name"), lit("")) =!= "", col("name")).as("gname"),
        coalesce(col("locus_type"), lit("")).as("ltype"),
        coalesce(col("location"), lit("")).as("loc"),
        coalesce(col("entrez_id"), lit("")).as("entrez"),
        coalesce(col("ensembl_gene_id"), lit("")).as("ensembl"),
        coalesce(col("omim_id"), lit("")).as("omims"),
        coalesce(col("pubmed_id"), lit("")).as("pubs"))
      // '@'-suffixed symbols (HOX regions, RNA clusters) skip the whole
      // row — the reference's `continue` sits above every later family
      // EXCEPT the withdrawn branch, which precedes it (HGNC.py:238-243)
      .filter(col("ltype") === "withdrawn" || !col("symbol").endsWith("@"))

    // Row-level tiers fused into ONE emit pass over rows0 (null-gated
    // patterns through emitFiltered): withdrawn flags, typed class
    // quads, clique leaders, x-ref equivalences, taxon, and cytogenic
    // location all project off the same scan — nine union branches were
    // nine scans of the landed file, each paying its own stage floor
    // (measured: over half of p15's wall was branch scheduling, not
    // work). Same triple set row-for-row; the set-dedup sees no change.
    val isW = col("ltype") === "withdrawn"
    val typedOk = !isW && col("gtype") =!= col("ltype")
    val aug = rows0
      .withColumn("gtype", tt.resolveCol(col("ltype")))
      // cytogenic location (HGNC.py:278-305): anchored chromosome match,
      // searched band match, CHR:9606chr… ids, reciprocal subsequence
      .withColumn("chrom",
        regexp_extract(col("loc"), "^(\\d+|X|Y|Z|W|MT)[pq$]", 1))
      .withColumn("parent", when(col("chrom") =!= "",
        concat(lit("CHR:9606chr"), col("chrom"),
          regexp_extract(col("loc"), "([pq][A-H\\d]?\\d?(?:\\.\\d+)?)", 1))))

    val rowTriples = ColumnEmit.emitFiltered(aug,
      // withdrawn branch (HGNC.py:238-243)
      res(when(isW, col("id")), lit(Vocab.a), lit(Vocab.owlClass)),
      ColumnEmit.typed(when(isW, col("id")), lit(Vocab.deprecated),
        lit("true"), "xsd:boolean"),
      // typed class quad only when the locus_type resolves
      // (HGNC.py:245-248); the clique-leader marker is unconditional
      // (py:249)
      res(when(typedOk, col("id")), lit(Vocab.a), lit(Vocab.owlClass)),
      str(when(typedOk, col("id")), lit(Vocab.label), col("symbol")),
      res(when(typedOk, col("id")), lit(Vocab.subClassOf), col("gtype")),
      str(when(typedOk, col("id")), lit(Vocab.description), col("gname")),
      ColumnEmit.typed(when(!isW, col("id")), lit(leaderPred),
        lit("true"), "xsd:boolean"),
      // plain x-ref equivalences (HGNC.py:250-252)
      res(when(col("entrez") =!= "", col("id")), lit(Vocab.equivalentClass),
        concat(lit("NCBIGene:"), col("entrez"))),
      res(when(col("ensembl") =!= "", col("id")), lit(Vocab.equivalentClass),
        concat(lit("ENSEMBL:"), col("ensembl"))),
      // taxon (geno.addTaxon + the duplicate addTriple, HGNC.py:265,276)
      res(col("id"), lit(Vocab.inTaxon), lit(taxon)),
      // location triples; null parent (no anchored chromosome) drops all
      res(col("parent"), lit(Vocab.a), lit(Vocab.owlClass)),
      res(when(col("parent").isNotNull, col("id")),
        lit(Vocab.isSubsequenceOf), col("parent")),
      res(col("parent"), lit(Vocab.hasSubsequence), col("id")))

    // OMIM equivalence through the mimTitles sidecar (HGNC.py:253-263):
    // Caret mims redirect to their last gene-typed MOVED TO replacement;
    // only gene-typed (Asterisk) mims equate
    val mims = in("omim_types")
    val geneMims = mims.filter(col("prefix") === "Asterisk")
      .select(col("mim_number").as("gmim")).distinct()
    // MOVED TO nnnnnn [AND mmmmmm] — token 3 and optional token 5
    // (OMIMSource.py:203-217; the malformed-id repairs concern live OMIM
    // dumps, the clean 6-digit form is what the title grammar produces)
    val replRaw = mims.filter(col("prefix") === "Caret" &&
        col("preferred_title").startsWith("MOVED TO "))
      .select(col("mim_number").as("from_mim"), posexplode(array(
        // get() (not getItem): a short 'MOVED TO nnnnnn' title has no
        // AND token, and ANSI mode makes an out-of-bounds index an error
        get(split(col("preferred_title"), " "), lit(2)),
        get(split(col("preferred_title"), " "), lit(4)))))
      .filter(col("col").rlike("^[0-9]{6}$"))
    // last gene-typed replacement wins — max(pos) over the ≤2 candidates
    val replPick = replRaw
      .join(geneMims.withColumnRenamed("gmim", "col"), Seq("col"))
      .groupBy("from_mim")
      .agg(max_by(col("col"), col("pos")).as("picked"))
    val omimX = rows0.filter(col("omims") =!= "")
      .select(col("id"), explode(split(col("omims"), "\\|")).as("mim"))
      .filter(col("mim") =!= "")
      .join(replPick.withColumnRenamed("from_mim", "mim"), Seq("mim"), "left")
      .select(col("id"), coalesce(col("picked"), col("mim")).as("mim"))
      .join(geneMims.withColumnRenamed("gmim", "mim"), Seq("mim"), "left_semi")
    val omimTriples = ColumnEmit.emit(omimX,
      res(col("id"), lit(Vocab.equivalentClass),
        concat(lit("OMIM:"), col("mim"))))

    // publications about the gene (HGNC.py:267-273)
    val pubTriples = ColumnEmit.emit(
      rows0.filter(col("pubs") =!= "")
        .select(col("id"), explode(split(col("pubs"), "\\|")).as("pm"))
        .filter(trim(col("pm")) =!= ""),
      res(concat(lit("PMID:"), trim(col("pm"))), lit(g.resolve("is_about")),
        col("id")))

    rowTriples.union(omimTriples).union(pubTriples)
  }

  override def testIds: Seq[String] = Seq("HGNC:6407", "HGNC:5")
}
