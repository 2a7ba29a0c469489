package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Digest, Vocab}
import graft.emit.ColumnEmit
import graft.emit.ColumnEmit.{res, str => strT}

/** The MyDrug/BioThings AEOLUS ingest (dipper/sources/MyDrug.py): the
  * batched-API landing (`aeolus.json`) parsed as a nested-JSON scan —
  * drug identity (RXCUI ↔ UNII sameAs + InChIKey), and one
  * drug→adverse-outcome association per outcome whose reporting odds
  * ratio clears the cut-off (`or_limit`, py:121-123, default 1), each
  * carrying the full SEPIO evidence chain: clinical-study evidence
  * line, the Dryad dataset + PMID as supporting source/reference, and
  * count/PRR/ROR measurement individuals with STATO values
  * (py:160-215), plus the asserted-by provenance agent (py:148-158).
  *
  * Engine ids are md5 digests (the repo-wide oracle-checkable digest
  * family; the reference uses sha1 via make_id — same mechanism).
  *
  * Scale shape: one JSON scan, outcomes explode after the scan, zero
  * joins; every digest/format stays in codegen.
  */
object MyDrugSource extends GraftSource {
  val name = "mydrug"
  private val definedBy = "EX:mydrug"

  /** ror cut-off (MyDrug.py:83 `or_limit=1`). */
  val orLimit = 1.0

  private val outcomeType = StructType(Seq(
    StructField("id", StringType), StructField("code", StringType),
    StructField("name", StringType), StructField("ror", DoubleType),
    StructField("prr", DoubleType), StructField("case_count", LongType)))

  private val schema = StructType(Seq(
    StructField("aeolus", StructType(Seq(
      StructField("rxcui", StringType), StructField("unii", StringType),
      StructField("drug_name", StringType),
      StructField("outcomes", ArrayType(outcomeType))))),
    StructField("unii", StructType(Seq(StructField("inchikey", StringType))))))

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = Map(
    "aeolus" -> graft.sources.JsonSource.read(spark,
      s"$dataDir/aeolus.json", Some(schema), multiLine = true))

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    val g = graft.core.TranslationTable.default
    val rel = g.resolve("causes_or_contributes")
    // the Monarch agent is the prefix-map base (MyDrug.py:155-157)
    val base = "EX:"

    val docs = graft.operators.ScanStats.widen(in("aeolus"))
      .filter(col("aeolus.rxcui").isNotNull)
      .select(
        concat(lit("RXCUI:"), col("aeolus.rxcui")).as("rxcui"),
        concat(lit("UNII:"), col("aeolus.unii")).as("unii"),
        col("aeolus.drug_name").as("drug_name"),
        col("unii.inchikey").as("inchikey"),
        col("aeolus.outcomes").as("outcomes"))

    val drugTriples = ColumnEmit.emitFiltered(docs,
      strT(col("rxcui"), lit(Vocab.label), col("drug_name")),
      strT(col("unii"), lit(Vocab.label), col("drug_name")),
      res(col("rxcui"), lit(Vocab.sameAs), col("unii")),
      strT(col("rxcui"), lit(g.resolve("inchi_key")), col("inchikey")))

    val desc = "A proportional reporting ratio or odds ratio greater " +
      "than or equal to 1 in the AEOLUS data was the significance " +
      s"cut-off used for creating drug-outcome associations"

    val out = docs
      .select(col("rxcui"), explode(col("outcomes")).as("oc"))
      .filter(col("oc.ror").isNotNull && col("oc.ror") >= orLimit)
      .select(col("rxcui"),
        concat(lit("MEDDRA:"), col("oc.code")).as("meddra"),
        col("oc.name").as("oname"),
        col("oc.ror").cast("string").as("ror"),
        col("oc.prr").cast("string").as("prr"),
        col("oc.case_count").cast("string").as("cnt"),
        col("oc.id").as("oid"))
      .withColumn("aid", concat(lit("_:"), Digest.md5Id(concat_ws("+",
        lit(definedBy), col("rxcui"), lit(rel), col("meddra")))))
      // evidence id digests assoc+outcome-id+source (MyDrug.py:178-180)
      .withColumn("evid", concat(lit("MONARCH:"), Digest.md5Id(
        concat(col("aid"), col("oid"), lit(name)))))
      .withColumn("cntB", concat(lit("_:"), Digest.md5Id(
        concat(col("evid"), col("cnt"), lit(name)))))
      .withColumn("prrB", concat(lit("_:"), Digest.md5Id(
        concat(col("evid"), col("prr"), lit(name), lit("prr")))))
      .withColumn("rorB", concat(lit("_:"), Digest.md5Id(
        concat(col("evid"), col("ror"), lit(name), lit("ror")))))

    val outcomeTriples = ColumnEmit.emitFiltered(out,
      res(col("rxcui"), lit(rel), col("meddra")),
      strT(col("meddra"), lit(Vocab.label), col("oname")),
      res(col("aid"), lit(Vocab.a), lit(Vocab.association)),
      res(col("aid"), lit(Vocab.assocHasSubject), col("rxcui")),
      res(col("aid"), lit(Vocab.assocHasPredicate), lit(rel)),
      res(col("aid"), lit(Vocab.assocHasObject), col("meddra")),
      strT(col("aid"), lit(Vocab.description), lit(desc)),
      strT(col("aid"), lit(g.resolve("probabalistic_quantifier")), col("ror")),
      // provenance: asserted by the Monarch agent (py:148-158)
      res(col("aid"), lit(g.resolve("asserted_by")), lit(base)),
      // SEPIO chain (py:160-214)
      res(col("aid"), lit(Vocab.hasSupportingEvidenceLine), col("evid")),
      res(col("evid"), lit(Vocab.a), lit(g.resolve("clinical study evidence"))),
      res(col("evid"), lit(g.resolve("has_supporting_reference")),
        lit("PMID:27193236")),
      res(lit("PMID:27193236"), lit(Vocab.a), lit(Vocab.publication)),
      res(col("evid"), lit(Vocab.source), lit("DOI:10.5061/dryad.8q0s4/1")),
      res(lit("DOI:10.5061/dryad.8q0s4/1"), lit(Vocab.a),
        lit(g.resolve("data set"))),
      strT(lit("DOI:10.5061/dryad.8q0s4/1"), lit(Vocab.label),
        lit("Data from: A curated and standardized adverse drug event " +
          "resource to accelerate drug safety research")),
      res(col("cntB"), lit(Vocab.a), lit(g.resolve("count"))),
      res(col("prrB"), lit(Vocab.a),
        lit(g.resolve("proportional_reporting_ratio"))),
      res(col("rorB"), lit(Vocab.a), lit(g.resolve("odds_ratio"))),
      res(col("evid"), lit(Vocab.hasEvidenceItem), col("cntB")),
      res(col("evid"), lit(Vocab.hasEvidenceItem), col("prrB")),
      res(col("evid"), lit(Vocab.hasEvidenceItem), col("rorB")),
      strT(col("cntB"), lit(g.resolve("has_value")), col("cnt")),
      strT(col("prrB"), lit(g.resolve("has_value")), col("prr")),
      strT(col("rorB"), lit(g.resolve("has_value")), col("ror")))

    val agentTriples = ColumnEmit.emit(
      out.select(col("rxcui")).limit(1),
      res(lit(base), lit(Vocab.a), lit(g.resolve("organization"))),
      strT(lit(base), lit(Vocab.label), lit("Monarch Initiative")))

    drugTriples.union(outcomeTriples).union(agentTriples)
  }

  override def testIds: Seq[String] = Seq("RXCUI:5640")
}
