package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.{Digest, TranslationTable, Vocab}
import graft.emit.ColumnEmit
import graft.emit.ColumnEmit.{res, str => strT, typed => typedT}

/** The Animal QTLdb ingest (dipper/sources/AnimalQTLdb.py): three tiers —
  *
  *  - `trait_mappings.csv`: the ATO trait vocabulary with VT equivalence
  *    and LPT/CMO cross-references (py:788-846);
  *  - `<species>_QTLdata.txt` (genetic/cM tier, py:380-629): per-species
  *    headerless QTL tables → the QTL feature on a per-species LINKAGE
  *    map chromosome (FALDO fuzzy positions from the cM range, or the
  *    dotted peak position), dbSNP peak markers as sequence alterations
  *    xref'd to the QTL, NCBI candidate genes as the QTL's affected
  *    locus (with a digest variant locus bridging marker and gene), and
  *    the QTL→trait `is marker for` OBAN association with QTL-analysis
  *    evidence, publication source, and p-value score;
  *  - `QTL_<build>.gff.txt[.gz]` (genomic/bp tier, py:632-786): GFF rows
  *    with an attribute bag → the same QTL on the UCSC build chromosome
  *    with stranded fuzzy positions and the same association pattern.
  *
  * Reference-faithful quirks kept: the cM tier mints trait ids in the
  * per-species `<species>QTL:` namespace while the bp tier uses
  * `AQTLTrait:` (the files-dict `curie` vs the attribute path); p-value
  * scores survive only for all-digit strings (`str.isnumeric` rejects
  * decimals, py:592-595); `int(float(cM))` truncation; the `Chr.`/
  * `ch(r?)[omse]*` chromosome scrubs. The `<Species>.gene_info.gz`
  * sidecars affect only reference-side logging (both membership branches
  * assign `NCBIgene`, py:525-539) and are not inputs here. Deviations
  * (documented): region/position bnodes use the engine's digest scheme
  * ([[graft.emit.Feature]] md5 twin) rather than the reference's
  * label-derived region ids; coordinate-less position nodes are not
  * emitted; the reference's cross-row `pub_id` variable leak for empty
  * PUBMED_ID cells (py:560-577) is not reproduced.
  *
  * Scale shape: every tier is scan → project → explode; no joins, no
  * aggregation — per-row emission over arbitrarily large QTL tables.
  */
object AnimalQtlSource extends GraftSource {
  val name = "animalqtldb"
  private val definedBy = "EX:animalqtldb"

  val qtlColumns: Seq[String] = Seq("QTL_ID", "QTL_symbol", "Trait_name",
    "assotype", "empty", "Chromosome", "Position_cm", "range_cm",
    "FlankMark_A2", "FlankMark_A1", "Peak_Mark", "FlankMark_B1",
    "FlankMark_B2", "Exp_ID", "Model", "testbase", "siglevel", "LOD_score",
    "LS_mean", "P_values", "F_Statistics", "VARIANCE", "Bayes_value",
    "LikelihoodR", "TRAIT_ID", "Dom_effect", "Add_effect", "PUBMED_ID",
    "geneID", "geneIDsrc", "geneIDtype")

  val gffColumns: Seq[String] = Seq("SEQNAME", "SOURCE", "FEATURE", "START",
    "END", "SCORE", "STRAND", "FRAME", "ATTRIBUTE")

  private val traitColumns = Seq("VT", "LPT", "CMO", "ATO", "Species",
    "Class", "Type", "QTL_Count")

  /** GFF build token → species (the reference's `<species>_bp` files
    * dict, AnimalQTLdb.py:135-199). */
  private[engine] val buildSpecies = Map(
    "Btau_4.6" -> "cattle", "GG_5.0" -> "chicken", "SS_11.1" -> "pig",
    "OAR_4.0" -> "sheep", "EquCab2.0" -> "horse")

  /** GFF build token → preferred UCSC build curie (the reference keeps
    * these in its local table; they are terminal curie VALUES that never
    * re-resolve through the global table, so like CoriellSource's
    * collection map they live in code — the tt lint requires local
    * values to be global labels). */
  private[engine] val buildCurie = Map(
    "Btau_4.6" -> "UCSCBuild:bosTau7", "GG_5.0" -> "UCSCBuild:galGal5",
    "SS_11.1" -> "UCSCBuild:susScr11", "OAR_4.0" -> "UCSCBuild:oviAri4",
    "EquCab2.0" -> "UCSCBuild:equCab2")

  private def schemaOf(names: Seq[String]) =
    StructType(names.map(StructField(_, StringType)))

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = {
    val dir = Option(new java.io.File(dataDir).listFiles()).toSeq.flatten
    val cmFiles = dir.filter(_.getName.matches("[a-z_]+_QTLdata\\.txt"))
      .map(_.getPath)
    val gffFiles = dir.filter(_.getName.matches("QTL_.+\\.gff\\.txt(\\.gz)?"))
      .map(_.getPath)
    val traitsFile = new java.io.File(dataDir, "trait_mappings.csv")
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      schemaOf(Seq("placeholder")))
    Map(
      "traits" ->
        (if (traitsFile.exists())
           graft.sources.DelimitedSource.read(spark,
             graft.sources.SourceFile(traitsFile.getPath,
               schemaOf(traitColumns), delimiter = ","))
         else empty),
      "qtl_cm" ->
        (if (cmFiles.nonEmpty)
           spark.read.option("sep", "\t").option("quote", "\"")
             .schema(schemaOf(qtlColumns)).csv(cmFiles: _*)
             .withColumn("species", regexp_extract(input_file_name(),
               "([a-z_]+)_QTLdata", 1))
         else empty),
      "qtl_bp" ->
        (if (gffFiles.nonEmpty)
           spark.read.option("sep", "\t").option("comment", "#")
             .schema(schemaOf(gffColumns)).csv(gffFiles: _*)
             .withColumn("build", regexp_extract(input_file_name(),
               "QTL_(.+?)\\.gff", 1))
         else empty))
  }

  /** Hoist the FALDO region/position digests into a projection BELOW the
    * explode — each md5 computed once per row, not once per struct field
    * that references it (the ColumnEmit.g2pAssoc hoist discipline; an
    * inlined version measured ~6× slower on the cm tier: the begin/end
    * digests each re-embed the region digest, so one row paid ~20 md5
    * evaluations and the generate expression fell out of codegen). */
  private def withFuzzyLocation(df: DataFrame, qtl: Column, cin: Column,
                                start: Column, stop: Column): DataFrame =
    df.withColumn("__region",
        when(start.isNotNull || stop.isNotNull,
          concat(lit("_:"), Digest.md5Id(concat_ws("+",
            lit("region"), qtl, coalesce(start.cast("string"), lit("UN")),
            coalesce(stop.cast("string"), lit("UN")), cin)))))
      .withColumn("__begin",
        when(start.isNotNull, concat(lit("_:"), Digest.md5Id(
          concat(lit("pos+"), col("__region"), lit("+begin+"), start)))))
      .withColumn("__end",
        when(stop.isNotNull, concat(lit("_:"), Digest.md5Id(
          concat(lit("pos+"), col("__region"), lit("+end+"), stop)))))

  /** Struct patterns over the hoisted `__region`/`__begin`/`__end`
    * columns. Both sides null → the feature itself typed faldo:Region
    * (the reference's add_region=False branch, GenomicFeature.py
    * addFeatureToGraph); a coordinate-less side emits no position node. */
  private def fuzzyLocation(qtl: Column, cin: Column, start: Column,
                            stop: Column, strandT: Column): Seq[Column] = {
    val (region, begin, endN) = (col("__region"), col("__begin"), col("__end"))
    val fuzzy = lit("faldo:FuzzyPosition")
    Seq(
      res(when(region.isNull, qtl), lit(Vocab.a), lit(Vocab.faldoRegion)),
      res(qtl, lit(Vocab.faldoLocation), region),
      res(region, lit(Vocab.a), lit(Vocab.faldoRegion)),
      res(region, lit(Vocab.faldoBegin), begin),
      res(region, lit(Vocab.faldoEnd), endN),
      res(begin, lit(Vocab.a), fuzzy),
      res(begin, lit(Vocab.a), strandT),
      typedT(begin, lit(Vocab.faldoPosition), start.cast("string"),
        "xsd:integer"),
      res(begin, lit(Vocab.faldoReference), cin),
      res(endN, lit(Vocab.a), fuzzy),
      res(endN, lit(Vocab.a), strandT),
      typedT(endN, lit(Vocab.faldoPosition), stop.cast("string"),
        "xsd:integer"),
      res(endN, lit(Vocab.faldoReference), cin))
  }

  /** Hoist an association digest (same discipline as above); gated on
    * both endpoints — a null subject or trait must null the whole
    * pattern (concat_ws would silently skip the null part and mint a
    * ghost association node). */
  private def withAssocId(df: DataFrame, aidCol: String, sub: Column,
                          trait0: Column): DataFrame =
    df.withColumn(aidCol, when(sub.isNotNull && trait0.isNotNull,
      concat(lit("_:"), Digest.md5Id(concat_ws("+",
        lit(definedBy), sub, lit(Vocab.isMarkerFor), trait0)))))

  /** The `is marker for` OBAN association with evidence/source/score
    * (G2PAssoc through py:574-596), over a hoisted aid column. */
  private def markerAssoc(aid: Column, sub: Column, trait0: Column,
                          pub: Column, score: Column): Seq[Column] = {
    val pred = lit(Vocab.isMarkerFor)
    val eco = lit(TranslationTable.default
      .resolve("quantitative trait analysis evidence"))
    Seq(
      res(sub, pred, trait0),
      res(aid, lit(Vocab.a), lit(Vocab.association)),
      res(aid, lit(Vocab.assocHasSubject), sub),
      res(aid, lit(Vocab.assocHasPredicate), pred),
      res(aid, lit(Vocab.assocHasObject), trait0),
      res(aid, lit(Vocab.hasEvidence), eco),
      res(aid, lit(Vocab.source), pub),
      typedT(aid, lit("EXP:score"), score.cast("string"), "xsd:double"))
  }

  /** `ISU...` ids route to the AQTLPub namespace untyped-publication,
    * anything else to PMID journal articles (py:560-567). */
  private def pubCol(raw: Column): Column =
    when(raw.rlike("^ISU"), concat(lit("AQTLPub:"), raw))
      .when(raw =!= "", concat(lit("PMID:"), raw))

  private def pubTypeTriples(pub: Column): Seq[Column] = Seq(
    res(when(pub.startsWith("AQTLPub:"), pub), lit(Vocab.a),
      lit(Vocab.publication)),
    res(when(pub.startsWith("PMID:"), pub), lit(Vocab.a),
      lit(TranslationTable.default.resolve("journal article"))))

  /** `str.isnumeric` twin: score kept only for all-digit strings after
    * the `<` strip and `,`→`.` swap (py:590-595). */
  private def scoreCol(raw: Column): Column = {
    val scr = translate(regexp_replace(raw, "<", ""), ",", ".")
    when(scr.rlike("^[0-9]+$"), scr.cast("double"))
  }

  /** makeChromID's chr-prefix scrub (GenomicFeature.py:402-434). */
  private def chromScrub(c: Column): Column =
    regexp_replace(c, "ch(r?)[omse]*", "")

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    val tt = TranslationTable.forSource("animalqtldb")
    val g = TranslationTable.default
    val localM = typedLit(tt.local)

    // ---- trait_mappings tier (py:788-846) -------------------------------
    val traitTriples = in.get("traits").filter(_.columns.contains("ATO"))
      .map { traits =>
        val rows = traits.select(
          trim(coalesce(col("VT"), lit(""))).as("vt"),
          trim(coalesce(col("LPT"), lit(""))).as("lpt"),
          trim(coalesce(col("CMO"), lit(""))).as("cmo"),
          trim(coalesce(col("ATO"), lit(""))).as("ato0"))
          .withColumn("ato", trim(regexp_replace(regexp_replace(
            regexp_replace(col("ato0"), "\\[", ""), "\\].*", ""),
            "ATO #", "AQTLTrait:")))
          .withColumn("atoLabel",
            trim(regexp_replace(col("ato0"), ".*\\]\\s*", "")))
        ColumnEmit.emitFiltered(rows,
          res(col("ato"), lit(Vocab.a), lit(Vocab.owlClass)),
          strT(col("ato"), lit(Vocab.label),
            when(col("atoLabel") =!= "", col("atoLabel"))),
          res(when(col("vt").rlike("^VT:"), col("vt")), lit(Vocab.a),
            lit(Vocab.owlClass)),
          res(col("ato"), lit(Vocab.equivalentClass),
            when(col("vt").rlike("^VT:"), col("vt"))),
          res(when(col("lpt").rlike("^LPT:"), col("lpt")), lit(Vocab.a),
            lit(Vocab.owlClass)),
          res(col("ato"), lit(Vocab.hasDbXref),
            when(col("lpt").rlike("^LPT:"), col("lpt"))),
          res(when(col("cmo").rlike("^CMO:"), col("cmo")), lit(Vocab.a),
            lit(Vocab.owlClass)),
          res(col("ato"), lit(Vocab.hasDbXref),
            when(col("cmo").rlike("^CMO:"), col("cmo"))))
      }

    // ---- genetic (cM) tier (py:380-629) ---------------------------------
    val cmTriples = in.get("qtl_cm").filter(_.columns.contains("QTL_ID"))
      .map { cm0 =>
        val cm = graft.operators.ScanStats.widen(cm0)
        val rows = cm
          .filter(trim(coalesce(col("QTL_ID"), lit(""))) =!= "")
          .select(col("species"),
            trim(col("QTL_ID")).as("qid"),
            trim(coalesce(col("QTL_symbol"), lit(""))).as("symbol"),
            trim(coalesce(col("Trait_name"), lit(""))).as("traitName"),
            trim(coalesce(col("Chromosome"), lit(""))).as("chrom0"),
            trim(coalesce(col("Position_cm"), lit(""))).as("posCm"),
            trim(coalesce(col("range_cm"), lit(""))).as("rangeCm0"),
            trim(coalesce(col("Peak_Mark"), lit(""))).as("peak"),
            trim(coalesce(col("P_values"), lit(""))).as("pvals"),
            trim(coalesce(col("TRAIT_ID"), lit(""))).as("tid"),
            trim(coalesce(col("PUBMED_ID"), lit(""))).as("pm"),
            trim(coalesce(col("geneID"), lit(""))).as("geneRaw"),
            trim(coalesce(col("geneIDsrc"), lit(""))).as("geneSrc"))
          .withColumn("taxon", g.resolveCol(element_at(localM, col("species"))))
          .withColumn("taxNum", split(col("taxon"), ":")(1))
          .withColumn("qtl", concat(col("species"), lit("QTL:"), col("qid")))
          // the aql_curie quirk: cm traits live in the species namespace
          .withColumn("trait", concat(col("species"), lit("QTL:"), col("tid")))
          .withColumn("buildId",
            concat(lit("MONARCH:"), col("species"), lit("-linkage")))
          .withColumn("buildLabel",
            concat(col("species"), lit(" genetic map")))
          .withColumn("chrom", chromScrub(col("chrom0")))
          .withColumn("cin", concat(lit("MONARCH:"), col("species"),
            lit("-linkagechr"), col("chrom")))
          .withColumn("chromClass",
            concat(lit("CHR:"), col("taxNum"), lit("chr"), col("chrom")))
          // "(Mb)"-suffixed ranges keep only the cM half (py:473-476)
          .withColumn("rangeCm", split(col("rangeCm0"), "\\(")(0))
          .withColumn("parts", org.apache.spark.sql.functions.transform(
            split(col("rangeCm"), "-"), p => trim(p)))
          .withColumn("hasRange",
            col("rangeCm").rlike("[0-9].*-.*[0-9]") &&
              size(col("parts")) === 2 &&
              element_at(col("parts"), 1) =!= "" &&
              element_at(col("parts"), 2) =!= "")
          .withColumn("peakPos",
            regexp_extract(col("posCm"), "^([0-9]*\\.[0-9]*)", 1))
          .withColumn("start",
            when(col("hasRange"),
              element_at(col("parts"), 1).cast("double").cast("long"))
            .when(col("posCm") =!= "" && col("peakPos").rlike("[0-9]"),
              col("peakPos").cast("double").cast("long")))
          .withColumn("stop",
            when(col("hasRange"),
              element_at(col("parts"), 2).cast("double").cast("long"))
            .when(col("posCm") =!= "" && col("peakPos").rlike("[0-9]"),
              col("peakPos").cast("double").cast("long")))
          .withColumn("dbsnp",
            when(col("peak") =!= "" && col("peak") =!= "." &&
              col("peak").rlike("^rs"), concat(lit("dbSNP:"), col("peak"))))
          // gene-id cleanup chain (py:521-544)
          .withColumn("gclean", regexp_replace(regexp_replace(
            col("geneRaw"), "uncharacterized ", ""), "^,+|,+$", ""))
          .withColumn("gene",
            when(col("gclean") =!= "" && col("gclean") =!= "." &&
              !col("gclean").contains(" ") &&
              (col("geneSrc") === "NCBIgene" ||
                (col("geneSrc") === "" && col("gclean").rlike("^[0-9]+$"))),
              concat(lit("NCBIGene:"), col("gclean"))))
          .withColumn("vl",
            when(col("dbsnp").isNotNull && col("gene").isNotNull,
              concat(lit("_:"), Digest.md5Id(concat(
                translate(col("gene"), ":", ""), lit("-"), col("peak"))))))
          .withColumn("pub", pubCol(col("pm")))
          .withColumn("score", scoreCol(col("pvals")))

        // Dimension tiers from DISTINCT projections — the linkage builds,
        // chromosome instances, and trait vocabulary are bounded by
        // species × karyotype × trait-catalog size, never by QTL-table
        // volume; emitting them per fact row just feeds the set-dedup
        // (measured: the inline version generated ~2× the struct volume
        // at sf0.1 for identical output)
        val buildDim = ColumnEmit.emit(
          rows.select("buildId", "buildLabel", "taxon").distinct(),
          res(col("buildId"), lit(Vocab.a), lit("SO:0001505")),
          strT(col("buildId"), lit(Vocab.label), col("buildLabel")),
          res(col("buildId"), lit(Vocab.inTaxon), col("taxon")))
        val cinDim = ColumnEmit.emit(
          rows.select("cin", "chrom", "buildId", "buildLabel", "chromClass")
            .distinct(),
          res(col("cin"), lit(Vocab.a), lit(Vocab.chromosome)),
          res(col("cin"), lit(Vocab.a), col("chromClass")),
          strT(col("cin"), lit(Vocab.label), concat(lit("chr"),
            col("chrom"), lit(" ("), col("buildLabel"), lit(")"))),
          res(col("buildId"), lit(Vocab.hasMember), col("cin")),
          res(col("cin"), lit(Vocab.memberOf), col("buildId")))
        val traitDim = ColumnEmit.emitFiltered(
          rows.select("trait", "traitName").distinct(),
          res(col("trait"), lit(Vocab.a), lit(Vocab.owlClass)),
          strT(col("trait"), lit(Vocab.label),
            when(col("traitName") =!= "", col("traitName"))))

        val hoisted = withAssocId(
          withFuzzyLocation(rows, col("qtl"), col("cin"), col("start"),
            col("stop")),
          "__aid1", col("qtl"), col("trait"))
        val qtlCore = ColumnEmit.emitFiltered(hoisted,
          Seq(
            res(col("qtl"), lit(Vocab.a), lit(g.resolve("QTL"))),
            strT(col("qtl"), lit(Vocab.label),
              when(col("symbol") =!= "", col("symbol"))),
            res(col("qtl"), lit(Vocab.inTaxon), col("taxon"))) ++
            pubTypeTriples(col("pub")) ++
            fuzzyLocation(col("qtl"), col("cin"), col("start"), col("stop"),
              lit(null).cast("string")) ++
            markerAssoc(col("__aid1"), col("qtl"), col("trait"), col("pub"),
              col("score")): _*)

        // peak-marker subtree only over rows that HAVE one (py:505-516);
        // same for candidate genes — structs gated by a row filter, not
        // emitted-null-then-dropped
        val dbsnpRows = withAssocId(rows.filter(col("dbsnp").isNotNull),
          "__aid2", col("dbsnp"), col("trait"))
        val dbsnpTriples = ColumnEmit.emitFiltered(dbsnpRows,
          Seq(
            res(col("dbsnp"), lit(Vocab.a), lit(Vocab.sequenceAlteration)),
            res(col("qtl"), lit(Vocab.hasDbXref), col("dbsnp")),
            res(col("vl"), lit(Vocab.hasVariantPart), col("dbsnp")),
            res(col("vl"), lit(Vocab.hasAffectedLocus), col("gene"))) ++
            markerAssoc(col("__aid2"), col("dbsnp"), col("trait"),
              col("pub"), col("score")): _*)
        val geneTriples = ColumnEmit.emit(
          rows.filter(col("gene").isNotNull),
          res(col("gene"), lit(Vocab.a), lit(Vocab.owlClass)),
          res(col("gene"), lit(Vocab.subClassOf), lit(Vocab.gene)),
          res(col("qtl"), lit(Vocab.hasAffectedLocus), col("gene")))

        buildDim.union(cinDim).union(traitDim)
          .union(qtlCore).union(dbsnpTriples).union(geneTriples)
      }

    // ---- genomic (bp) tier (py:632-786) ---------------------------------
    val bpTriples = in.get("qtl_bp").filter(_.columns.contains("ATTRIBUTE"))
      .map { bp0 =>
        val bp = graft.operators.ScanStats.widen(bp0)
        val speciesM = typedLit(buildSpecies)
        def attr(k: String) = {
          val c = regexp_extract(col("attrClean"),
            "(?:^|;)" + k + "=([^;]*)", 1)
          when(c =!= "", c)
        }
        val rows = bp
          .filter(element_at(speciesM, col("build")).isNotNull)
          .select(col("build"),
            element_at(speciesM, col("build")).as("species"),
            trim(coalesce(col("SEQNAME"), lit(""))).as("chrom0"),
            trim(coalesce(col("START"), lit(""))).as("startRaw"),
            trim(coalesce(col("END"), lit(""))).as("stopRaw"),
            trim(coalesce(col("STRAND"), lit(""))).as("strand"),
            regexp_replace(trim(coalesce(col("ATTRIBUTE"), lit(""))),
              "\"", "").as("attrClean"))
          .withColumn("qnum", attr("QTL_ID"))
          .filter(col("qnum").isNotNull)
          .withColumn("taxon", g.resolveCol(element_at(localM, col("species"))))
          .withColumn("taxNum", split(col("taxon"), ":")(1))
          .withColumn("qtl", concat(col("species"), lit("QTL:"), col("qnum")))
          .withColumn("trait", concat(lit("AQTLTrait:"), attr("trait_ID")))
          .withColumn("pub", pubCol(coalesce(attr("PUBMED_ID"), lit(""))))
          .withColumn("score", scoreCol(coalesce(attr("P-value"), lit(""))))
          .withColumn("buildLocal", element_at(typedLit(buildCurie), col("build")))
          .withColumn("buildShort", split(col("buildLocal"), ":")(1))
          .withColumn("chrom",
            chromScrub(regexp_replace(col("chrom0"), "Chr\\.", "")))
          .withColumn("cin", concat(lit("MONARCH:"), col("buildShort"),
            lit("chr"), col("chrom")))
          .withColumn("chromClass",
            concat(lit("CHR:"), col("taxNum"), lit("chr"), col("chrom")))
          .withColumn("start",
            when(col("startRaw").rlike("^[0-9]+$"),
              col("startRaw").cast("long")))
          .withColumn("stop",
            when(col("stopRaw").rlike("^[0-9]+$"),
              col("stopRaw").cast("long")))
          .withColumn("strandT",
            when(col("strand") === "+", lit(Vocab.faldoPlusStrand))
              .when(col("strand") === "-", lit(Vocab.faldoMinusStrand)))

        // chromosome-instance dimension (see the cm tier note)
        val cinDim = ColumnEmit.emit(
          rows.select("cin", "chrom", "build", "buildLocal", "chromClass")
            .distinct(),
          res(col("cin"), lit(Vocab.a), lit(Vocab.chromosome)),
          res(col("cin"), lit(Vocab.a), col("chromClass")),
          strT(col("cin"), lit(Vocab.label), concat(lit("chr"),
            col("chrom"), lit(" ("), col("build"), lit(")"))),
          res(col("buildLocal"), lit(Vocab.hasMember), col("cin")),
          res(col("cin"), lit(Vocab.memberOf), col("buildLocal")))
        val hoisted = withAssocId(
          withFuzzyLocation(rows, col("qtl"), col("cin"), col("start"),
            col("stop")),
          "__aid1", col("qtl"), col("trait"))
        cinDim.union(ColumnEmit.emitFiltered(hoisted,
          Seq(
            res(col("qtl"), lit(Vocab.a), lit(g.resolve("QTL"))),
            res(col("qtl"), lit(Vocab.inTaxon), col("taxon"))) ++
            pubTypeTriples(col("pub")) ++
            fuzzyLocation(col("qtl"), col("cin"), col("start"), col("stop"),
              col("strandT")) ++
            markerAssoc(col("__aid1"), col("qtl"), col("trait"), col("pub"),
              col("score")): _*))
      }

    (traitTriples.toSeq ++ cmTriples.toSeq ++ bpTriples.toSeq)
      .reduceOption(_.union(_))
      .getOrElse(throw new IllegalArgumentException(
        "animalqtldb: no recognized inputs"))
  }

  override def testIds: Seq[String] =
    Seq("cattleQTL:28483", "chickenQTL:29016")
}
