package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.{Digest, TranslationTable, Triple, Vocab}
import graft.emit.{ColumnEmit, Feature, Genotype, Model}
import graft.operators.RangeJoin

/** The Bgee-shape ingest: per-gene top-k anatomy expression calls by
  * rank score (Bgee.py:196-200 — lower rank is stronger, ties broken on
  * the anatomy id), reified with the score. The rank-limit window
  * compiles to WindowGroupLimit, so each gene's group is cut map-side
  * before the sort — the property that lets the ingest run over a
  * full-corpus expression matrix. Shares its plan with the p02 oracle
  * query, which calls straight through this source.
  */
object BgeeSource extends GraftSource {
  val name = "bgee"

  /** Dual-mode read into the shaped (gene, anat, score) relation: a real
    * `bgee_expression.tsv` call file when present (gene id → ENSEMBL
    * curie, anatomy already a UBERON curie, rank score — the reference's
    * expression-call columns), else derived from lineitem for the p02
    * oracle. */
  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = {
    import graft.sources.{DelimitedSource, SourceFile}
    import org.apache.spark.sql.types._
    val real = new java.io.File(dataDir, "bgee_expression.tsv")
    val shaped =
      if (real.exists()) DelimitedSource.read(spark, SourceFile(real.getPath,
          StructType(Seq(StructField("gene_id", StringType),
            StructField("anat_id", StringType),
            StructField("rank", StringType)))))
        .select(concat(lit("ENSEMBL:"), col("gene_id")).as("gene"),
          col("anat_id").as("anat"),
          col("rank").cast("double").as("score"))
      else Tables.lineitem(spark, dataDir).select(
        concat(lit("ENSEMBL:"), col("l_suppkey").cast("string")).as("gene"),
        concat(lit("UBERON:"), col("l_partkey").cast("string")).as("anat"),
        col("l_extendedprice").as("score"))
    Map("expression" -> shaped)
  }

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    val ranked = in("expression")
      .groupBy("gene", "anat").agg(min("score").as("score"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("gene").orderBy(col("score").asc, col("anat").asc)))
      .filter(col("rk") <= 3).drop("rk")
    ColumnEmit.assocReified(ranked, "EX:bgee",
      col("gene"), lit("RO:0002206"), col("anat"),
      source = Some("EX:bgee"), score = Some(col("score")))
  }

  override def testIds: Seq[String] = Seq("ENSEMBL:1")
}

/** The UCSCBands/Monochrom-shape ingest: cytoband rows with real
  * karyotype band names (`13q21.31`) → the per-build band partonomy
  * (UCSCBands.py:271-544, Monochrom.py:120-368).
  *
  * Semantics, reference-faithful:
  *   - band names walk to parents by the prefix rule with trailing-dot
  *     strip: 13q21.31 ⊂ 13q21.3 ⊂ 13q21 ⊂ 13q2 ⊂ 13q ⊂ chr13
  *     (`make_parent_bands`, Monochrom.py:348-368);
  *   - two id spaces: a build-independent class per band
  *     (`CHR:9606chr13q21.31`, Monochrom docstring) and a build-specific
  *     feature instance typed by it (`MONARCH:hg19chr13q21.31`,
  *     UCSCBands.py:501-546 `makeChromID(bnd, build_num, 'MONARCH')`);
  *   - leaf rows are TYPED BY THEIR STAIN (`globaltt[rtype]`,
  *     UCSCBands.py:440, with acen → centromere via the local table);
  *     generated parents by karyotype notation (p → stalk, q → long
  *     arm, one place → chromosome_region, deeper → chromosome_band —
  *     `getChrPartTypeByNotation`'s reachable branches, the subband arm
  *     is dead code behind the unanchored band regex);
  *   - g-stained leaves also carry `has_sequence_attribute`
  *     (Monochrom.py:272-287);
  *   - every node's FALDO extent is the min-start/max-end of all leaf
  *     rows beneath it (chromosome floor 0, UCSCBands.py:387-391), with
  *     the build-specific chromosome as `faldo:reference`.
  *
  * Spark-first: the python per-chromosome dict accumulation (first-
  * writer-wins, order-dependent — UCSCBands.py:465-492) becomes ONE
  * prefix explode + hash aggregation; leaf typing joins back on the
  * aggregated node relation (deterministic min-stain on collision
  * instead of last-writer-wins — documented deviation). The node
  * relation is the band ontology itself — bounded by karyotype
  * vocabulary × builds, never by corpus size — so the terminal emit
  * flatMap is dimension-sized at any scale.
  *
  * Dual-mode read: real `<taxon>cytoBand.txt[.gz]` files when present
  * (the reference's file manifest, Monochrom.py:72-127, taxon from the
  * filename), else rows derived deterministically from the part table
  * so the p06 oracle can re-predict the graph in SQL.
  */
object UcscBandsSource extends GraftSource {
  val name = "ucsc_bands"

  /** taxon → (UCSC build, genome label): the reference's `files` dict
    * rows exercised here (Monochrom.py:72-127). */
  private[engine] val builds = Map(
    "9606" -> ("hg19", "Human"), "10090" -> ("mm10", "Mouse"),
    "7955" -> ("danRer10", "Zebrafish"), "10116" -> ("rn6", "Rat"))

  private[engine] lazy val tt = TranslationTable.forSource("monochrom")
  private[engine] lazy val stainTerm: Map[String, String] =
    Seq("gneg", "gpos25", "gpos33", "gpos50", "gpos66", "gpos75",
      "gpos100", "gvar", "stalk", "acen").map(s => s -> tt.resolve(s)).toMap

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = {
    val real = Option(new java.io.File(dataDir).listFiles()).toSeq.flatten
      .filter(_.getName.matches("""\d+cytoBand\.txt(\.gz)?"""))
    Map("cytobands" ->
      (if (real.nonEmpty) readCytoBands(spark, real.map(_.getPath))
       else derive(Tables.part(spark, dataDir))))
  }

  /** Real cytoband TSV scan: `chrom start stop band gieStain`, headerless,
    * taxon from the `<taxon>cytoBand.txt` filename; placed scaffolds only
    * (UCSCBands.py:330 `placed_scaffold_pattern`); band rows without a
    * stain never become leaves (UCSCBands.py:430-431). */
  private def readCytoBands(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("chrom", StringType), StructField("start", LongType),
      StructField("stop", LongType), StructField("band", StringType),
      StructField("stain", StringType)))
    val buildCol = typedLit(builds.map { case (t, (b, _)) => t -> b })
    val labelCol = typedLit(builds.map { case (t, (_, g)) => t -> g })
    spark.read.option("sep", "\t").schema(schema).csv(paths: _*)
      .withColumn("taxon",
        regexp_extract(input_file_name(), """(\d+)cytoBand""", 1))
      .filter(col("chrom").rlike("^chr(\\d+|X|Y|Z|W|MT|M)$") &&
        element_at(buildCol, col("taxon")).isNotNull)
      .filter(coalesce(col("band"), lit("")) === "" ||
        coalesce(col("stain"), lit("")) =!= "")
      .select(col("taxon"),
        element_at(buildCol, col("taxon")).as("build"),
        element_at(labelCol, col("taxon")).as("glabel"),
        regexp_replace(col("chrom"), "^chr", "").as("chrom"),
        coalesce(col("band"), lit("")).as("band"),
        coalesce(col("stain"), lit("")).as("stain"),
        col("start").as("s"), col("stop").as("e"))
  }

  /** Deterministic real-shaped rows from the part table (oracle path):
    * taxon/build from pk%4, chromosome from pk%24 (incl. X/Y), arm from
    * pk div 24, band depth from pk%5 spanning chromosome-only rows up to
    * dotted sub-bands, stain cycling all ten codes from p_size. */
  private def derive(part: DataFrame): DataFrame =
    part.select(col("p_partkey").as("pk"), col("p_size").as("sz"))
      .select(
        expr("element_at(array('9606','10090','7955','10116'), cast(pk % 4 as int) + 1)").as("taxon"),
        expr("element_at(array('hg19','mm10','danRer10','rn6'), cast(pk % 4 as int) + 1)").as("build"),
        expr("element_at(array('Human','Mouse','Zebrafish','Rat'), cast(pk % 4 as int) + 1)").as("glabel"),
        expr("CASE WHEN pk % 24 = 22 THEN 'X' WHEN pk % 24 = 23 THEN 'Y' " +
          "ELSE cast(pk % 24 + 1 as string) END").as("chrom"),
        expr("""CASE cast(pk % 5 as int)
                WHEN 0 THEN ''
                WHEN 1 THEN IF((pk div 24) % 2 = 0, 'p', 'q')
                WHEN 2 THEN concat(IF((pk div 24) % 2 = 0, 'p', 'q'), sz % 9 + 1)
                WHEN 3 THEN concat(IF((pk div 24) % 2 = 0, 'p', 'q'), sz % 9 + 1, pk % 10)
                ELSE concat(IF((pk div 24) % 2 = 0, 'p', 'q'), sz % 9 + 1, pk % 10, '.', sz % 10)
                END""").as("band"),
        expr("element_at(array('gneg','gpos25','gpos33','gpos50','gpos66'," +
          "'gpos75','gpos100','gvar','stalk','acen'), cast(sz % 10 as int) + 1)").as("stain"),
        (col("sz") * 1000).cast("long").as("s"),
        (col("sz") * 1000 + 999).cast("long").as("e"))

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    import spark.implicits._
    val src = in("cytobands")
    // the prefix chain, longest→shortest, trailing dots stripped, with
    // the chromosome ('' node) closing every chain (make_parent_bands)
    val chain = expr(
      """CASE WHEN band = '' THEN array('')
         ELSE array_distinct(concat(
           transform(sequence(length(band), 1, -1),
             n -> regexp_replace(substring(band, 1, n), '\\.$', '')),
           array('')))
         END""")
    val exploded = src.select(col("taxon"), col("build"), col("glabel"),
      col("chrom"), explode(chain).as("node"), col("s"), col("e"))
    val leaves = src.filter(col("band") =!= "")
      .groupBy("taxon", "chrom", "band").agg(min("stain").as("stain"))
      .withColumnRenamed("taxon", "ltaxon")
      .withColumnRenamed("chrom", "lchrom")
    val nodes = exploded
      .groupBy("taxon", "build", "glabel", "chrom", "node")
      .agg(min("s").as("mn"), max("e").as("hi"))
      .withColumn("lo", when(col("node") === "", lit(0L)).otherwise(col("mn")))
      .join(leaves,
        col("node") === col("band") && col("taxon") === col("ltaxon") &&
          col("chrom") === col("lchrom"), "left")

    val stains = stainTerm
    val regionT = tt.resolve("chromosome_region")
    val bandT = tt.resolve("chromosome_band")
    val stalkT = tt.resolve("stalk")
    val longArmT = tt.resolve("long_chromosome_arm")
    val seqAttrP = tt.resolve("has_sequence_attribute")

    val bandTriples = nodes
      .select(col("taxon"), col("build"), col("glabel"), col("chrom"),
        col("node"), col("lo"), col("hi"), col("stain"))
      .as[(String, String, String, String, String, Long, Long, Option[String])]
      .flatMap { case (taxon, build, glabel, chrom, node, lo, hi, stain) =>
        val classId = s"CHR:${taxon}chr$chrom$node"
        val buildId = s"MONARCH:${build}chr$chrom$node"
        val ref = s"MONARCH:${build}chr$chrom"
        val typ =
          if (node.isEmpty) Vocab.chromosome
          else stain.map(stains) getOrElse {
            if (node == "p") stalkT
            else if (node == "q") longArmT
            else if (node.length == 2) regionT
            else bandT
          }
        val partonomy =
          if (node.isEmpty)
            Seq(Triple.res(ref, Vocab.memberOf, s"UCSCBuild:$build"))
          else {
            val parent = node.dropRight(1).stripSuffix(".")
            Feature.subsequenceOf(classId, s"CHR:${taxon}chr$chrom$parent")
          }
        val stained = stain.filter(_.startsWith("g")).toSeq
          .map(s0 => Triple.res(classId, seqAttrP, stains(s0)))
        Model.addType(classId, typ) ++
          Model.addLabel(classId, s"chr$chrom$node ($glabel)") ++
          Feature.featureTriples(buildId, s"chr$chrom$node ($build)", classId,
            ref, lo, hi, ".", Digest.md5IdScala) ++
          partonomy ++ stained
      }

    // per-genome header: taxon class + synonym, genome, UCSC build as
    // reference genome in taxon (Monochrom.py:196-207, UCSCBands
    // _create_genome_builds)
    val genomes = src.select("taxon", "build", "glabel").distinct()
      .as[(String, String, String)]
      .flatMap { case (taxon, build, glabel) =>
        val tax = s"NCBITaxon:$taxon"
        Model.addType(tax, Vocab.owlClass) ++
          Model.addSynonym(tax, glabel) ++
          Genotype.addGenome(tax, glabel) ++
          Genotype.addReferenceGenome(s"UCSCBuild:$build", build, tax)
      }
    bandTriples.union(genomes).toDF()
  }

  override def testIds: Seq[String] = Seq("CHR:9606chr1")
}

/** The Monochrom-shape ingest (dipper/sources/Monochrom.py:120-368):
  * the ONTOLOGY tier of the cytoband partonomy — where [[UcscBandsSource]]
  * emits build-specific FALDO'd feature instances, this source emits the
  * build-independent CLASS scaffold the reference's Monochrom parser
  * builds: every band/arm/chromosome as an owl:Class subClassOf its
  * karyotype-notation type, with the containment structure expressed as
  * OWL someValuesFrom RESTRICTION bnodes (`addOWLPropertyClassRestriction`,
  * Model.py — restriction node digested from `property-value` alone, so
  * one shared restriction node per (property, value) pair across all
  * subjects, each carrying a type/label/onProperty/someValuesFrom quad):
  *   - chromosome classes `member of` the species genome;
  *   - band ⊂ parent chains as `is subsequence of` / `has subsequence`
  *     restriction pairs down each karyotype prefix (13q21.31 ⊂ 13q21.3
  *     ⊂ 13q21 ⊂ 13q2 ⊂ 13q ⊂ 13, make_parent_bands Monochrom.py:348-368);
  *   - Giemsa-stained bands `has_sequence_attribute` their stain class;
  *   - the genome class restricted `in taxon` to its species
  *     (Monochrom.py:196-207).
  * Leaf classes are typed by their stain term, generated parents by
  * notation (p → stalk, q → long arm, one place → region, deeper →
  * band; the reference's subband arm is dead code behind its unanchored
  * regex and stays dead here) — the same typing rules as
  * [[UcscBandsSource]], whose localtt choice (only `acen` local, stains
  * through the global GENO terms) this source shares. Restriction-node
  * digests use the engine's md5 twin of the reference's sha1 scheme.
  *
  * Shares [[UcscBandsSource.read]] (same cytoband manifest,
  * Monochrom.py:72-127), honors the reference's `tax_ids` constraint
  * through the taxa-aware transform. Everything is dimension-sized:
  * one distinct over the exploded prefix chain, no corpus-scale state.
  */
object MonochromSource extends GraftSource {
  val name = "monochrom"

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] =
    UcscBandsSource.read(spark, dataDir)

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame =
    transform(spark, in, Nil)

  override def transform(spark: SparkSession, in: Map[String, DataFrame],
                         taxa: Seq[String]): DataFrame = {
    import graft.emit.ColumnEmit.{res, str => strT}
    val tt = UcscBandsSource.tt
    val stainM = typedLit(UcscBandsSource.stainTerm)
    val genomeT = TranslationTable.default.resolve("genome")
    val seqAttrP = tt.resolve("has_sequence_attribute")
    val src0 = in("cytobands")
    val src = if (taxa.isEmpty) src0 else src0.filter(col("taxon").isin(taxa: _*))

    // one shared restriction bnode per (property, value): 4 node triples
    // + the subject's subClassOf link (Model.py addOWLPropertyClassRestriction)
    def restr(subject: Column, prop: String, value: Column): Seq[Column] = {
      val ustr = concat(lit(prop + "-"), value)
      val b = concat(lit("_:"), Digest.md5Id(ustr))
      Seq(
        res(b, lit(Vocab.a), lit(Vocab.restriction)),
        strT(b, lit(Vocab.label), ustr),
        res(b, lit(Vocab.onProperty), lit(prop)),
        res(b, lit(Vocab.someValuesFrom), value),
        res(subject, lit(Vocab.subClassOf), b))
    }

    val chain = expr(
      """CASE WHEN band = '' THEN array('')
         ELSE array_distinct(concat(
           transform(sequence(length(band), 1, -1),
             n -> regexp_replace(substring(band, 1, n), '\\.$', '')),
           array('')))
         END""")
    val leaves = src.filter(col("band") =!= "")
      .groupBy("taxon", "chrom", "band").agg(min("stain").as("stain"))
      .withColumnRenamed("taxon", "ltaxon")
      .withColumnRenamed("chrom", "lchrom")
    val nodes = src
      .select(col("taxon"), col("glabel"), col("chrom"),
        explode(chain).as("node"))
      .distinct()
      .join(leaves,
        col("node") === col("band") && col("taxon") === col("ltaxon") &&
          col("chrom") === col("lchrom"), "left")
      .withColumn("typ",
        when(col("node") === "", lit(Vocab.chromosome))
          .when(col("stain").isNotNull, element_at(stainM, col("stain")))
          .when(col("node") === "p", lit(tt.resolve("stalk")))
          .when(col("node") === "q", lit(tt.resolve("long_chromosome_arm")))
          .when(length(col("node")) === 2, lit(tt.resolve("chromosome_region")))
          .otherwise(lit(tt.resolve("chromosome_band"))))
      .withColumn("classId",
        concat(lit("CHR:"), col("taxon"), lit("chr"), col("chrom"),
          col("node")))
      .withColumn("parentId",
        concat(lit("CHR:"), col("taxon"), lit("chr"), col("chrom"),
          regexp_replace(expr("substring(node, 1, length(node)-1)"),
            "\\.$", "")))
      .withColumn("genomeId",
        concat(lit("NCBITaxon:"), col("taxon"), lit("#genome")))
      .withColumn("gstain",
        when(coalesce(col("stain"), lit("")).rlike("^g(neg|pos|var)"),
          element_at(stainM, col("stain"))))

    val classTriples = ColumnEmit.emit(nodes,
      res(col("classId"), lit(Vocab.a), lit(Vocab.owlClass)),
      strT(col("classId"), lit(Vocab.label),
        concat(lit("chr"), col("chrom"), col("node"), lit(" ("),
          col("glabel"), lit(")"))),
      res(col("classId"), lit(Vocab.subClassOf), col("typ")))

    val chromRestr = ColumnEmit.emit(nodes.filter(col("node") === ""),
      restr(col("classId"), Vocab.memberOf, col("genomeId")): _*)

    val subseq = nodes.filter(col("node") =!= "")
    val subseqRestr = ColumnEmit.emit(subseq,
      restr(col("classId"), Vocab.isSubsequenceOf, col("parentId")) ++
        restr(col("parentId"), Vocab.hasSubsequence, col("classId")): _*)

    val stainRestr = ColumnEmit.emit(nodes.filter(col("gstain").isNotNull),
      restr(col("classId"), seqAttrP, col("gstain")): _*)

    val genomes0 = src.select(col("taxon"), col("glabel")).distinct()
      .withColumn("tax", concat(lit("NCBITaxon:"), col("taxon")))
      .withColumn("genomeId", concat(col("tax"), lit("#genome")))
    val genomeTriples = ColumnEmit.emit(genomes0,
      Seq(
        res(col("tax"), lit(Vocab.a), lit(Vocab.owlClass)),
        strT(col("tax"), lit(Vocab.hasExactSynonym), col("glabel")),
        res(col("genomeId"), lit(Vocab.a), lit(Vocab.owlClass)),
        res(col("genomeId"), lit(Vocab.subClassOf), lit(genomeT)),
        strT(col("genomeId"), lit(Vocab.label),
          concat(col("glabel"), lit(" genome")))) ++
        restr(col("genomeId"), Vocab.inTaxon, col("tax")): _*)

    classTriples
      .union(chromRestr)
      .union(subseqRestr)
      .union(stainRestr)
      .union(genomeTriples)
  }

  override def testIds: Seq[String] = Seq("CHR:9606chr1")
}

/** The UDP-shape ingest: patient variant calls located inside gene
  * regions via the range containment join (UDP.py:330-447 assigns each
  * variant to the genes whose span contains its position). The join is
  * the bucketed [[RangeJoin.pointInInterval]] — never |points|×|genes|
  * — and the emission is map-side over the matches; the set-dedup
  * collapses the per-match repetition of variant/gene typing.
  */
object UdpSource extends GraftSource {
  val name = "udp_variants"

  /** Dual-mode read into shaped (okey, lnum, pos) variant calls and
    * (skey, lo, hi) gene regions: real `udp_variant_calls.tsv` /
    * `udp_gene_regions.tsv` files when present (patient + variant ids
    * and positions, gene spans — the reference's per-patient call
    * shape), else derived from lineitem/supplier for the p07 oracle. */
  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = {
    import graft.sources.{DelimitedSource, SourceFile}
    import org.apache.spark.sql.types._
    def schemaOf(names: String*) =
      StructType(names.map(StructField(_, StringType)))
    val calls = new java.io.File(dataDir, "udp_variant_calls.tsv")
    val regions = new java.io.File(dataDir, "udp_gene_regions.tsv")
    val points =
      if (calls.exists()) DelimitedSource.read(spark, SourceFile(calls.getPath,
          schemaOf("patient_id", "variant_id", "position")))
        .select(col("patient_id").as("okey"), col("variant_id").as("lnum"),
          col("position").cast("long").as("pos"))
      else Tables.lineitem(spark, dataDir).select(
        col("l_orderkey").as("okey"), col("l_linenumber").as("lnum"),
        col("l_partkey").as("pos"))
    val genes =
      if (regions.exists()) DelimitedSource.read(spark,
          SourceFile(regions.getPath, schemaOf("gene_id", "start", "end")))
        .select(col("gene_id").as("skey"),
          col("start").cast("long").as("lo"), col("end").cast("long").as("hi"))
      else Tables.supplier(spark, dataDir).select(
        col("s_suppkey").as("skey"),
        (col("s_suppkey") * 20).cast("long").as("lo"),
        (col("s_suppkey") * 20 + 50).cast("long").as("hi"))
    Map("variant_calls" -> points, "gene_regions" -> genes)
  }

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    import spark.implicits._
    // keep the join/dedup keys NUMERIC through the shuffle (okey/lnum/
    // skey longs in the oracle derivation, not the concat'd display
    // ids — the r2 hash-to-long lesson); the id strings are built after
    // each branch's dedup
    val points = in("variant_calls")
    val genes = in("gene_regions")
    val vid = concat(lit("EX:var"), col("okey"), lit("_"), col("lnum"))
    val gene = concat(lit("EX:g"), col("skey"))
    // Emission WITHOUT a global graph dedup: the naive shape
    // (explode 3 triples per match, then distinct) shuffles 3× the match
    // relation in wide 3-string rows — measured 8 s of a 9 s total at
    // sf0.1, and the one piece of the plan that scales with matches ×
    // triples-per-match at 100 TB. Instead each triple family dedups on
    // its OWN minimal key, and the branches are predicate-disjoint so
    // their union needs no further dedup:
    //   pairs    (vid GENO:0000418 gene) — distinct over the 2-column
    //            match relation (vid is not guaranteed unique upstream);
    //   vid type (vid a SO:0001059)     — left-semi range join (keeps
    //            each point row once, broadcast, zero shuffle), then a
    //            single-column distinct;
    //   gene type (gene a SO:0000704)   — interval-side semi,
    //            |genes|-bounded dedup inside the operator.
    // The two scans per side are pruned-columnar re-reads — cheaper at
    // scale than materializing a matches× intermediate.
    def t(s: Column, p: String, o: Column): DataFrame => DataFrame =
      _.select(s.as("s"), lit(p).as("p"), o.as("o"),
        lit(false).as("lit"), lit(null).cast("string").as("dt"))
    val pairs = t(vid, Vocab.hasAffectedLocus, gene)(
      RangeJoin.pointInInterval(points, genes, "pos", "lo", "hi", bucketWidth = 64)
        .select("okey", "lnum", "skey").distinct())
    val vidTypes = t(vid, Vocab.a, lit(Vocab.sequenceAlteration))(
      RangeJoin.pointsInAnyInterval(points, genes, "pos", "lo", "hi", bucketWidth = 64)
        .select("okey", "lnum").distinct())
    val geneTypes = t(gene, Vocab.a, lit(Vocab.gene))(
      RangeJoin.intervalsWithAnyPoint(genes, points, "pos", "lo", "hi", bucketWidth = 64))
    pairs.unionAll(vidTypes).unionAll(geneTypes)
  }

  override def testIds: Seq[String] = Seq("EX:g1")
}
