package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.core.{Digest, Vocab}
import graft.emit.ColumnEmit
import graft.emit.ColumnEmit.{res, str => strT}

/** The SGD yeast phenotype ingest (dipper/sources/SGD.py): the
  * phenotype_data.tab pandas scan re-expressed as a columnar plan, with
  * the APO ontology label→id map (make_apo_map, SGD.py:231-242) as a
  * broadcast-joined dimension instead of an in-memory dict.
  *
  * Per record (SGD.py:106-228):
  * - the `Phenotype` column either names one APO entity or composes
  *   `entity: quality`; composed phenotypes mint a
  *   `MONARCH:<entity-apo>_<quality-apo>` class (SGD.py:158-165) while
  *   plain ones use the APO id directly — and only the PLAIN branch
  *   overrides the association id with the `yeastgenome.org` definedBy
  *   (SGD.py:175-177), a reference quirk kept here;
  * - `Experiment Type` strips a parenthesized suffix and comma-splits
  *   into one-or-more APO evidence terms, each fanned out as
  *   RO:0002558 + label (SGD.py:114-123,221-223);
  * - the pipe-split reference list: first becomes dc:source + a typed
  *   publication, the tail owl:sameAs the first (SGD.py:201-218);
  * - a pipe-joined key:value description decorates the association
  *   (SGD.py:244-256; pandas renders missing cells as 'nan' — that
  *   quirk is reproduced by coalescing empties to 'nan').
  *
  * APO lookups are inner joins: a term missing from the map is a hard
  * KeyError in the reference; here the row drops (the Spark-idiomatic
  * missing-key posture, countable via anti join).
  *
  * Scale shape: one fact scan, three broadcast-dimension joins (the APO
  * ontology is bounded vocabulary), fan-outs explode after the joins.
  */
object SgdSource extends GraftSource {
  val name = "sgd"
  private val definedBy = "EX:sgd"

  private val columns = Seq("Feature Name", "Feature Type", "Gene Name",
    "SGDID", "Reference", "Experiment Type", "Mutant Type", "Allele",
    "Strain Background", "Phenotype", "Chemical", "Condition", "Details",
    "Reporter")

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = Map(
    "sgd_phenotype" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/phenotype_data.tab",
        StructType(columns.map(StructField(_, StringType))),
        hasHeader = false)),
    // the APO label→id dimension (the reference materializes the whole
    // ontology into a dict at construction, SGD.py:231-242)
    "apo" -> graft.sources.DelimitedSource.read(spark,
      graft.sources.SourceFile(s"$dataDir/apo_terms.tsv",
        StructType(Seq(StructField("apo_id", StringType),
          StructField("apo_label", StringType))),
        hasHeader = false)))

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    val g = graft.core.TranslationTable.default
    val pred = Vocab.hasPhenotype
    val apo = in("apo").select(col("apo_id"), col("apo_label"))

    val c = (n: String) => col(s"`$n`")
    def nan(x: Column): Column =
      when(coalesce(trim(x), lit("")) === "", lit("nan")).otherwise(trim(x))

    val base = graft.operators.ScanStats.widen(in("sgd_phenotype"))
      .filter(coalesce(trim(c("Gene Name")), lit("")) =!= "")
      .select(
        concat(lit("SGD:"), trim(c("SGDID"))).as("gene"),
        trim(c("Gene Name")).as("gene_label"),
        trim(c("Phenotype")).as("phenotype"),
        trim(c("Experiment Type")).as("exp_raw"),
        regexp_replace(coalesce(c("Reference"), lit("")), " ", "").as("refs_raw"),
        concat_ws(" | ",
          concat(lit("genomic_background: "), nan(c("Strain Background"))),
          concat(lit("allele: "), nan(c("Allele"))),
          concat(lit("chemical: "), nan(c("Chemical"))),
          concat(lit("condition: "), nan(c("Condition"))),
          concat(lit("details: "), nan(c("Details"))),
          concat(lit("feature_name: "), nan(c("Feature Name"))),
          concat(lit("gene_name: "), nan(c("Gene Name"))),
          concat(lit("mutant_type: "), nan(c("Mutant Type"))),
          concat(lit("reporter: "), nan(c("Reporter")))).as("description"))

    // phenotype branch: 'entity: quality' composes a MONARCH class from
    // both APO ids; a plain label uses its APO id directly
    val hasQuality = col("phenotype").contains(": ")
    val entityLabel = when(hasQuality, split(col("phenotype"), ": ", 2)(0))
      .otherwise(col("phenotype"))
    val qualityLabel = when(hasQuality, split(col("phenotype"), ": ", 2)(1))

    val entApo = apo.select(col("apo_id").as("ent_apo"),
      col("apo_label").as("ent_label"))
    val quaApo = apo.select(col("apo_id").as("qua_apo"),
      col("apo_label").as("qua_label"))

    val resolved = base
      .withColumn("ent_l", entityLabel)
      .withColumn("qua_l", qualityLabel)
      .join(entApo, col("ent_l") === col("ent_label"))
      .join(quaApo, col("qua_l") === col("qua_label"), "left")
      .filter(col("qua_l").isNull || col("qua_apo").isNotNull)
      .withColumn("pheno_id",
        when(col("qua_l").isNotNull, concat(lit("MONARCH:"),
          translate(col("ent_apo"), ":", "_"), lit("_"),
          translate(col("qua_apo"), ":", "_")))
        .otherwise(col("ent_apo")))
      .withColumn("pheno_label",
        when(col("qua_l").isNotNull,
          concat(col("ent_l"), lit(":"), col("qua_l")))
        .otherwise(col("ent_l")))
      // only the plain branch swaps in the yeastgenome.org definedBy
      // (SGD.py:175-177)
      .withColumn("aid", concat(lit("_:"), Digest.md5Id(concat_ws("+",
        when(col("qua_l").isNotNull, lit(definedBy))
          .otherwise(lit("EX:yeastgenome.org")),
        col("gene"), lit(pred), col("pheno_id")))))
      .withColumn("refs", split(col("refs_raw"), "\\|"))
      .withColumn("ref0", when(element_at(col("refs"), 1) =!= "",
        element_at(col("refs"), 1)))

    val assocTriples = ColumnEmit.emitFiltered(resolved,
      res(col("gene"), lit(pred), col("pheno_id")),
      strT(col("gene"), lit(Vocab.label), col("gene_label")),
      res(col("aid"), lit(Vocab.a), lit(Vocab.association)),
      res(col("aid"), lit(Vocab.assocHasSubject), col("gene")),
      res(col("aid"), lit(Vocab.assocHasPredicate), lit(pred)),
      res(col("aid"), lit(Vocab.assocHasObject), col("pheno_id")),
      strT(col("aid"), lit(Vocab.description), col("description")),
      res(col("pheno_id"), lit(Vocab.subClassOf),
        lit(g.resolve("phenotype"))),
      strT(col("pheno_id"), lit(Vocab.label), col("pheno_label")),
      res(col("aid"), lit(Vocab.source), col("ref0")),
      res(col("ref0"), lit(Vocab.a), lit(g.resolve("publication"))))

    val sameAs = ColumnEmit.emit(
      resolved.filter(size(col("refs")) > 1 && col("ref0").isNotNull)
        .select(col("ref0"),
          explode(slice(col("refs"), 2, Int.MaxValue)).as("refN"))
        .filter(col("refN") =!= ""),
      res(col("ref0"), lit(Vocab.sameAs), col("refN")))

    // experiment-type fan-out: strip '(...)' suffix, comma-split, trim,
    // resolve each through the APO dimension (SGD.py:114-123,221-223)
    val expApo = apo.select(col("apo_id").as("exp_apo"),
      col("apo_label").as("exp_label"))
    val evidence = ColumnEmit.emit(
      resolved.select(col("aid"),
          explode(split(split(col("exp_raw"), "\\(", 2)(0), ","))
            .as("exp_term"))
        .withColumn("exp_t", trim(col("exp_term")))
        .filter(col("exp_t") =!= "")
        .join(expApo, col("exp_t") === col("exp_label")),
      res(col("aid"), lit(Vocab.hasEvidence), col("exp_apo")),
      strT(col("exp_apo"), lit(Vocab.label), col("exp_t")))

    assocTriples.union(sameAs).union(evidence)
  }

  override def testIds: Seq[String] = Seq("SGD:S000003609")
}
