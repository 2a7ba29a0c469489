package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.{Digest, Vocab}
import graft.emit.ColumnEmit
import graft.emit.ColumnEmit.{res, str => strT}

/** The Coriell cell-line catalog ingest (dipper/sources/Coriell.py):
  * four repository CSVs (NINDS/NIGMS/NIA/NHGRI) building, per line —
  * the typed cell line deriving from an anonymous patient and a CL cell
  * type; the patient (person) with an affected/gender/proband label, a
  * family membership, and a taxon; the genotype assembly (karyotype
  * complement with per-chromosome FALDO'd alteration features, GVC,
  * per-OMIM-locus VSLCs of indeterminate zygosity); affected patients'
  * OMIM diseases (variant loci excluded) as G2P associations with the
  * line as disease model; and PMID `mentions` links.
  *
  * The karyotype aberration walk (py:808-843) is columnar:
  * `regexp_extract_all` pulls the add/del/der/... groups, a second
  * extract explodes their chromosomes, and the sex-anomaly regex adds
  * X/Y — no per-row Scala.
  *
  * Scale shape: one 4-file scan; the only shuffle before the final
  * distinct is the per-(line, locus) VSLC rollup; everything else is
  * scan-local explodes.
  */
object CoriellSource extends GraftSource {
  val name = "coriell"
  private val definedBy = "EX:coriell"

  private val columns = Seq("catalog_id", "description", "omim_num",
    "sample_type", "cell_line_available", "dna_instock", "dna_ref", "gender",
    "age", "race", "ethnicity", "affected", "karyotype", "relprob",
    "mutation", "gene", "fam", "collection", "url", "cat_remark",
    "pubmed_ids", "fammember", "variant_id", "dbsnp_id", "species")

  /** Repository manifest (files dict id/label/page, Coriell.py:88-112). */
  val collections: Seq[(String, String, String)] = Seq(
    ("NINDS", "NINDS Human Genetics DNA and Cell line Repository",
      "https://catalog.coriell.org/1/NINDS"),
    ("NIGMS", "NIGMS Human Genetic Cell Repository",
      "https://catalog.coriell.org/1/NIGMS"),
    ("NIA", "NIA Aging Cell Repository",
      "https://catalog.coriell.org/1/NIA"),
    ("NHGRI", "NHGRI Sample Repository for Human Genetic Research",
      "https://catalog.coriell.org/1/NHGRI"))

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = Map(
    "lines" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/{NINDS,NIGMS,NIA,NHGRI}.csv",
        StructType(columns.map(StructField(_, StringType))),
        delimiter = ",")))

  /** Python str.capitalize(): first char upper, rest LOWER. */
  private def pyCapitalize(c: Column): Column =
    concat(upper(substring(c, 1, 1)), lower(substring(c, 2, Int.MaxValue)))

  /** Direct-probe maps the reference also keeps in its localtt
    * (translationtable/coriell.yaml affected/collection sections) —
    * never composed through the global table, so held as code maps. */
  private val affectedMap = Map("Yes" -> "affected", "No" -> "unaffected")
  private val collectionMap = collections.map { case (id, label, _) =>
    (if (id == "NINDS") "NINDS Repository"
     else if (id == "NIA") "NIA Aging Cell Culture Repository"
     else label) -> s"CoriellCollection:$id"
  }.toMap

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    val tt = graft.core.TranslationTable.forSource("coriell")
    val g = graft.core.TranslationTable.default
    val local = typedLit(tt.local)
    val affectedM = typedLit(affectedMap)
    val collectionM = typedLit(collectionMap)

    def clean(c: Column) = trim(coalesce(c, lit("")))

    val rows = graft.operators.ScanStats.widen(in("lines"))
      .filter(clean(col("catalog_id")) =!= "")
      .select(
        clean(col("catalog_id")).as("catalog"),
        clean(col("description")).as("descr"),
        clean(col("omim_num")).as("omims"),
        tt.resolveCol(clean(col("sample_type"))).as("cellType"),
        clean(col("dna_ref")).as("dnaRef"),
        lower(clean(col("gender"))).as("gender"),
        clean(col("affected")).as("affected0"),
        // control-char scrub (remove_control_characters, py:541-543)
        regexp_replace(clean(col("karyotype")),
          "[\\x00-\\x1f\\x7f-\\x9f]", "").as("karyo"),
        clean(col("relprob")).as("relprob"),
        clean(col("mutation")).as("mutation"),
        clean(col("gene")).as("gene"),
        clean(col("fam")).as("fam"),
        clean(col("collection")).as("collection"),
        clean(col("cat_remark")).as("remark"),
        clean(col("pubmed_ids")).as("pubs"),
        clean(col("variant_id")).as("varRaw"),
        clean(col("dbsnp_id")).as("dbsnp"),
        clean(col("species")).as("species0"))
      .withColumn("line", concat(lit("Coriell:"), col("catalog")))
      .withColumn("lineLabel",
        concat(split(col("collection"), " ")(0), lit("-"), col("catalog")))
      .withColumn("repo", element_at(collectionM, col("collection")))
      .withColumn("patient", concat(lit("_:"),
        Digest.md5Id(concat(lit("anonymous_patient_"), col("catalog")))))
      .withColumn("shortDesc", pyCapitalize(split(col("descr"), ";")(0)))
      .withColumn("affected",
        when(col("affected0") === "", lit("unspecified"))
          .otherwise(coalesce(element_at(affectedM, col("affected0")),
            col("affected0"))))
      .withColumn("patientLabel", concat(
        trim(concat_ws(" ", col("affected"), col("gender"), col("relprob"))),
        when(col("relprob") === "proband", lit(" with "))
          .otherwise(lit(" of proband with ")),
        col("shortDesc")))
      .withColumn("taxon", g.resolveCol(
        coalesce(element_at(local,
          when(col("species0") === "", lit("Homo sapiens"))
            .otherwise(col("species0"))),
          when(col("species0") === "", lit("Homo sapiens"))
            .otherwise(col("species0")))))
      // sorted-distinct variant list (py:584-586)
      .withColumn("vids", array_sort(array_distinct(
        filter(split(col("varRaw"), ";"), v => v =!= ""))))
      .withColumn("vid", array_join(col("vids"), ";"))
      .withColumn("isNormalKaryo",
        col("karyo").isin("46;XX", "46;XY", ""))
      .withColumn("kinner", Digest.md5Id(col("karyo")))
      .withColumn("kid", when(col("karyo") =!= "",
        concat(lit("_:"), Digest.md5Id(col("kinner")))))
      .withColumn("varl",
        concat(col("gene"), lit("("), col("mutation"), lit(")")))
      .withColumn("gvc",
        when(col("karyo") =!= "" && !col("isNormalKaryo"),
          when(col("vid") =!= "", concat(lit("_:"), Digest.md5Id(
            concat(translate(col("vid"), ";", "-"), lit("-"),
              Digest.md5Id(col("kinner"))))))
          .otherwise(col("kid")))
        .when(col("vid") =!= "",
          concat(lit("_:"), Digest.md5Id(translate(col("vid"), ";", "-")))))
      .withColumn("gvcLabel",
        when(col("karyo") =!= "" && !col("isNormalKaryo"),
          when(col("mutation") =!= "",
            concat(col("varl"), lit("; "), col("karyo")))
          .otherwise(col("karyo")))
        .when(col("vid") =!= "", col("varl")))
      // genotype id: dbSNP individual, else a bnode for non-wildtype
      // patients (py:675-681); the normal-karyotype fallback to the
      // karyotype node happens below
      .withColumn("genoId0",
        when(col("dbsnp") =!= "",
          concat(lit("dbSNPIndividual:"), col("dbsnp")))
        .when(col("affected") =!= "unaffected",
          concat(lit("_:"), Digest.md5Id(concat(lit("geno"), col("catalog"))))))
      .withColumn("genoId",
        when(col("gvc").isNotNull && col("genoId0").isNull &&
          col("kid").isNotNull && col("isNormalKaryo"), col("kid"))
        .otherwise(col("genoId0")))
      .withColumn("genoLabel", concat(
        when(col("kid").isNotNull && col("isNormalKaryo"),
          when(coalesce(col("gvcLabel"), lit("")) =!= "",
            concat(col("gvcLabel"), lit("; "), col("karyo")))
          .otherwise(col("karyo")))
        .otherwise(col("gvcLabel")),
        lit(" ["), col("catalog"), lit("]")))
    // NOTE: the 6 consumers below each re-derive this projection from the
    // scan — cheap (map-only) and cluster-safe, vs localCheckpoint which
    // dies with an executor (see Dedup.scala:338 for the policy)

    val lineTriples = ColumnEmit.emitFiltered(rows,
      strT(col("line"), lit(Vocab.label), col("lineLabel")),
      res(col("line"), lit(Vocab.a), lit(g.resolve("cell line"))),
      res(when(col("dnaRef") =!= "" && col("dnaRef") =!= col("catalog"),
        concat(lit("Coriell:"), col("dnaRef"))), lit(Vocab.a),
        lit(g.resolve("cell line"))),
      res(col("line"), lit(Vocab.sameAs),
        when(col("dnaRef") =!= "" && col("dnaRef") =!= col("catalog"),
          concat(lit("Coriell:"), col("dnaRef")))),
      res(col("line"), lit(Vocab.derivesFrom), col("patient")),
      res(col("line"), lit(Vocab.derivesFrom), col("cellType")),
      res(col("repo"), lit(Vocab.hasMember), col("line")),
      strT(col("line"), lit(Vocab.description),
        when(col("remark") =!= "", col("remark"))),
      // patient
      res(col("patient"), lit(Vocab.a), lit(Vocab.person)),
      strT(col("patient"), lit(Vocab.label), col("patientLabel")),
      res(when(col("fam") =!= "",
        concat(lit("CoriellFamily:"), col("fam"))), lit(Vocab.a),
        lit(g.resolve("family"))),
      strT(when(col("fam") =!= "",
        concat(lit("CoriellFamily:"), col("fam"))), lit(Vocab.label),
        concat(lit("Family of proband with "), col("shortDesc"))),
      res(col("patient"), lit(Vocab.memberOf),
        when(col("fam") =!= "",
          concat(lit("CoriellFamily:"), col("fam")))),
      // wildtype typing for unaffected patients (py:675-677)
      res(when(col("affected") === "unaffected", col("patient")),
        lit(Vocab.a), lit(g.resolve("wildtype"))),
      // karyotype variation complement (py:544-553)
      res(col("kid"), lit(Vocab.a),
        lit(g.resolve("karyotype_variation_complement"))),
      strT(col("kid"), lit(Vocab.label), col("karyo")),
      // karyotype into the gvc (py:617-625)
      res(when(col("kid").isNotNull && !col("isNormalKaryo") &&
          col("gvc").isNotNull && col("kid") =!= col("gvc"), col("gvc")),
        lit(Vocab.hasVariantPart), col("kid")),
      // gvc node (py:683-689)
      res(col("gvc"), lit(Vocab.a), lit(Vocab.gvc)),
      strT(col("gvc"), lit(Vocab.label), col("gvcLabel")),
      // gvc into the genotype (py:691-697)
      res(when(col("gvc").isNotNull && col("genoId0").isNotNull,
          col("genoId0")),
        when(col("affected") === "unaffected", lit(Vocab.hasReferencePart))
          .otherwise(lit(Vocab.hasVariantPart)),
        col("gvc")),
      // normal karyotype joins the genotype as reference part (py:699-712)
      res(when(col("gvc").isNotNull && col("kid").isNotNull &&
          col("isNormalKaryo") && col("genoId0").isNotNull, col("genoId0")),
        lit(Vocab.hasReferencePart), col("kid")),
      // the assembled genotype (py:718-729)
      res(when(col("gvc").isNotNull, col("genoId")), lit(Vocab.a),
        lit(g.resolve("intrinsic genotype"))),
      strT(when(col("gvc").isNotNull, col("genoId")), lit(Vocab.label),
        col("genoLabel")),
      res(when(col("gvc").isNotNull, col("genoId")), lit(Vocab.inTaxon),
        col("taxon")),
      res(when(col("gvc").isNotNull && col("genoId").isNotNull,
        col("patient")), lit(g.resolve("has_genotype")), col("genoId")),
      res(when(col("gvc").isNull || col("genoId").isNull, col("patient")),
        lit(Vocab.inTaxon), col("taxon")))

    // per-chromosome karyotype alteration features (py:554-581)
    val aberrRe = "(?:add|del|der|i|idic|inv|r|rec|t)\\([\\w;]+\\)"
    val sexRe = "(?:;)(X{2,}Y+|X?Y{2,}|X{3,}|X|Y)(?:;|$)"
    val chrFromAberr = rows
      .filter(col("kid").isNotNull)
      .select(col("kid"), col("taxon"),
        explode(regexp_extract_all(col("karyo"), lit(aberrRe), lit(0)))
          .as("aberr"))
      .select(col("kid"), col("taxon"),
        explode(regexp_extract_all(col("aberr"),
          lit("(\\d+|X|Y|M|\\?);?"), lit(1))).as("chrom"))
      .filter(col("chrom") =!= "?")
    val chrFromSex = rows
      .filter(col("kid").isNotNull &&
        regexp_extract(col("karyo"), sexRe, 1) =!= "")
      .select(col("kid"), col("taxon"),
        when(regexp_extract(col("karyo"), sexRe, 1).rlike("X?Y{2,}"),
          lit("Y")).otherwise(lit("X")).as("chrom"))
    val karyoChrs = chrFromAberr.union(chrFromSex).distinct()
      .withColumn("fid", concat(col("kid"), lit("-"), col("chrom")))
      .withColumn("chrId", concat(lit("CHR:"),
        split(col("taxon"), ":")(1), lit("chr"), col("chrom")))
      .withColumn("region", concat(lit("_:"),
        Digest.md5Id(concat(lit("region+"), col("fid")))))
      .withColumn("begin", concat(lit("_:"),
        Digest.md5Id(concat(lit("pos+"), col("region"), lit("+begin")))))

    val featureTriples = ColumnEmit.emit(karyoChrs,
      res(col("fid"), lit(Vocab.a), lit(Vocab.sequenceAlteration)),
      strT(col("fid"), lit(Vocab.label),
        concat(lit("some karyotype alteration on chr"), col("chrom"))),
      res(col("fid"), lit(Vocab.faldoLocation), col("region")),
      res(col("region"), lit(Vocab.a), lit(Vocab.faldoRegion)),
      res(col("region"), lit(Vocab.faldoBegin), col("begin")),
      res(col("begin"), lit(Vocab.a), lit(Vocab.faldoExactPosition)),
      res(col("begin"), lit(Vocab.faldoReference), col("chrId")),
      res(col("kid"), lit(Vocab.hasVariantPart), col("fid")))

    // per-locus VSLC assembly (py:627-675): vids like 610661.p.R401X
    // group by their OMIM locus; the vslc digest joins locus.var in the
    // sorted order of the deduped variant list
    val vslcBase = rows
      .filter(size(col("vids")) > 0)
      .select(col("line"), col("gvc"), col("varl"),
        posexplode(col("vids")).as(Seq("pos", "var")))
      .select(col("line"), col("gvc"), col("varl"), col("pos"),
        regexp_extract(col("var"), "^(\\d+)\\.+(.*)$", 1).as("locus"),
        regexp_extract(col("var"), "^(\\d+)\\.+(.*)$", 2).as("varNum"))
      .filter(col("locus") =!= "")
    val vslcs = vslcBase
      .groupBy(col("line"), col("gvc"), col("varl"), col("locus"))
      .agg(array_sort(collect_list(struct(col("pos"), col("varNum"))))
        .as("vs"))
      .withColumn("vars", org.apache.spark.sql.functions.transform(
        col("vs"), v => v("varNum")))
      .withColumn("vslc", concat(lit("_:"), Digest.md5Id(
        array_join(org.apache.spark.sql.functions.transform(col("vars"),
          v => concat(col("locus"), lit("."), v)), "-"))))

    val vslcTriples = ColumnEmit.emitFiltered(vslcs,
      res(col("vslc"), lit(Vocab.a), lit(Vocab.vslc)),
      strT(col("vslc"), lit(Vocab.label), col("varl")),
      res(col("vslc"), lit(Vocab.hasZygosity), lit(Vocab.indeterminate)),
      res(when(col("vslc") =!= col("gvc"), col("gvc")),
        lit(Vocab.hasVariantPart), col("vslc")))

    val alleleTriples = ColumnEmit.emit(
      vslcs.select(col("vslc"), col("locus"), explode(col("vars")).as("v"))
        .withColumn("allele",
          concat(lit("OMIM:"), col("locus"), lit("."), col("v"))),
      res(col("allele"), lit(Vocab.a), lit(Vocab.sequenceAlteration)),
      res(col("vslc"), lit(Vocab.hasVariantPart), col("allele")))

    // diseases for affected patients, variant loci excluded (py:735-768)
    val lociPerRow = rows.select(col("line"), col("patient"), col("affected"),
      col("omims"),
      org.apache.spark.sql.functions.transform(col("vids"),
        v => regexp_extract(v, "^(\\d+)\\.+(.*)$", 1)).as("loci"))
    val diseases = lociPerRow
      .filter(col("affected") === "affected" && col("omims") =!= "")
      .select(col("line"), col("patient"),
        explode(split(col("omims"), ";")).as("d0"), col("loci"))
      .withColumn("d", trim(col("d0")))
      .filter(col("d") =!= "" && !array_contains(col("loci"), col("d")))
      .withColumn("disease", concat(lit("OMIM:"), col("d")))
      .withColumn("aid", concat(lit("_:"), Digest.md5Id(concat_ws("+",
        lit(definedBy), col("patient"), lit(Vocab.hasPhenotype),
        col("disease")))))

    val diseaseTriples = ColumnEmit.emit(diseases,
      res(col("disease"), lit(Vocab.a), lit(Vocab.owlClass)),
      res(col("patient"), lit(Vocab.hasPhenotype), col("disease")),
      res(col("aid"), lit(Vocab.a), lit(Vocab.association)),
      res(col("aid"), lit(Vocab.assocHasSubject), col("patient")),
      res(col("aid"), lit(Vocab.assocHasPredicate), lit(Vocab.hasPhenotype)),
      res(col("aid"), lit(Vocab.assocHasObject), col("disease")),
      res(col("line"), lit(Vocab.isModelOf), col("disease")))

    val pubTriples = ColumnEmit.emit(
      rows.filter(col("pubs") =!= "")
        .select(col("line"), explode(split(col("pubs"), ";")).as("p0"))
        .withColumn("pmid", concat(lit("PMID:"), trim(col("p0"))))
        .filter(trim(col("p0")) =!= ""),
      res(col("pmid"), lit(Vocab.a), lit(g.resolve("journal article"))),
      res(col("pmid"), lit(g.resolve("mentions")), col("line")))

    // the four repository nodes (_process_collection, py:786-815)
    val repoDf = spark.createDataFrame(collections)
      .toDF("cid", "clabel", "cpage")
      .withColumn("rid", concat(lit("CoriellCollection:"), col("cid")))
    val repoTriples = ColumnEmit.emit(repoDf,
      res(col("rid"), lit(Vocab.a), lit(g.resolve("collection"))),
      strT(col("rid"), lit(Vocab.label), col("clabel")),
      res(col("rid"), lit(Vocab.page), col("cpage")))

    lineTriples
      .union(featureTriples)
      .union(vslcTriples)
      .union(alleleTriples)
      .union(diseaseTriples)
      .union(pubTriples)
      .union(repoTriples)
  }

  override def testIds: Seq[String] = Seq("Coriell:GM00325")
}
