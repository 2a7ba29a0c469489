package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}

import graft.core.Vocab
import graft.emit.ColumnEmit
import graft.emit.ColumnEmit.{res, str}

/** The BioThings/MyChem-shape ingest (dipper/sources/MyChem.py:40-198):
  * deep-nested JSON drug-annotation records — 4-5 levels of array/struct
  * navigation (`record.drugbank.targets[].actions[]`,
  * `record.drugcentral.bioactivity[].uniprot_id` pipe-lists,
  * `record.drugcentral.drug_use[].snomed_id`) — into drug→protein
  * interaction and drug→disease indication triples.
  *
  * Navigation is pure `from_json` + `explode`/`inline` over declared
  * nested schemas — no flatMap, no UDF; the whole parse stays in
  * whole-stage codegen. The BioThings dict-OR-list polymorphism
  * (`return_target_list`, MyChem.py:286-292) is expressed as a coalesce
  * of two `from_json` parses — one with plural (array) fields, one with
  * singleton (struct) fields — and the string-OR-list `actions` field
  * (format_actions, py:259-277) is normalized by a scrubbing pre-pass on
  * the raw line (the reference's scrub-then-parse lifecycle), safe
  * because the scalar form is a flat quoted string.
  *
  * Key-membership semantics approximated as non-null fields (a JSON
  * `"unii": null` and an absent key both land as SQL null); records
  * without a unii struct are skipped like the reference's `continue`
  * (py:50-53, 75-79).
  *
  * Scale shape: one file scan, two codegen'd JSON parses per line,
  * zero joins, zero shuffles before the graph-level set-dedup.
  */
object MyChemSource extends GraftSource {
  val name = "mychem"

  private def target(plural: Boolean): DataType = {
    val t = StructType(Seq(
      StructField("uniprot", StringType), StructField("name", StringType),
      StructField("actions", ArrayType(StringType))))
    if (plural) ArrayType(t) else t
  }
  private def bioact(plural: Boolean): DataType = {
    val t = StructType(Seq(
      StructField("uniprot_id", StringType),
      StructField("target_class", StringType),
      StructField("target", StringType)))
    if (plural) ArrayType(t) else t
  }
  private def druguse(plural: Boolean): DataType = {
    val t = StructType(Seq(
      StructField("relation", StringType),
      StructField("snomed_id", StringType),
      StructField("snomed_name", StringType)))
    if (plural) ArrayType(t) else t
  }
  private def recordSchema(plural: Boolean): StructType = StructType(Seq(
    StructField("unii", StructType(Seq(StructField("unii", StringType)))),
    StructField("drugbank", StructType(Seq(
      StructField("drugbank_id", StringType),
      StructField("targets", target(plural))))),
    StructField("drugcentral", StructType(Seq(
      StructField("bioactivity", bioact(plural)),
      StructField("drug_use", druguse(plural)))))))

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] =
    Map("drugs" -> spark.read.text(s"$dataDir/mychem_drugs.json"))

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    val tt = graft.core.TranslationTable.default
    val molecularEntity = tt.resolve("molecular entity")          // CHEBI:23367
    val interactsWith = tt.resolve("molecularly interacts with")  // RO:0002436
    val polypeptide = tt.resolve("polypeptide")                   // SO:0000104
    val treats = Vocab.substanceThatTreats                        // RO:0002606
    val diseaseOrDisorder = tt.resolve("disease or disorder")     // MONDO:0000001

    // scrub: string-form actions → singleton array (format_actions'
    // isinstance(str) branch), flat quoted scalar so the rewrite is exact
    val scrubbed = regexp_replace(col("value"),
      """"actions"\s*:\s*"([^"]*)"""", "\"actions\": [\"$1\"]")

    // Parse layout for cost, not just correctness. from_json is
    // CodegenFallback — the single most cpu-expensive expression here,
    // with NO common-subexpression elimination — so the plan must make
    // each parse happen exactly once: (1) widen the line scan first (a
    // narrow text scan serializes the parse — the p08 lesson); (2) parse
    // into TWO struct columns only (every field access above is a cheap
    // struct get, not a re-parse); (3) close the parsed relation with a
    // repartition so the three downstream branches collapse no further —
    // ReuseExchange then executes scan+parse ONCE instead of once per
    // branch (measured 3× parse redundancy × ~10 inlined from_json
    // occurrences = 58 cpu-s at sf0.1 before this layout; ~4 cpu-s
    // after). The shuffled relation is the compact parsed struct pair,
    // never the raw JSON.
    val wide = {
      val target = spark.sparkContext.defaultParallelism
      val lines = graft.operators.ScanStats.widen(in("drugs"))
      if (graft.operators.ScanStats.estimatedScanPartitions(lines) < target)
        lines.repartition(target) else lines
    }
    val parsed = wide.select(
        from_json(scrubbed, recordSchema(plural = true)).as("pa"),
        from_json(scrubbed, recordSchema(plural = false)).as("pb"))
      .repartition(col("pa.unii"), col("pb.unii"))
    val a = col("pa")
    val b = col("pb")
    def plural(path: String): Column = {
      val pa = path.split("\\.").foldLeft(a)(_ getField _)
      val pb = path.split("\\.").foldLeft(b)(_ getField _)
      coalesce(pa, when(pb.isNotNull, array(pb)))
    }
    val rec = parsed.select(
      concat(lit("UNII:"),
        coalesce(a.getField("unii").getField("unii"),
          b.getField("unii").getField("unii"))).as("unii"),
      concat(lit("DrugBank:"),
        coalesce(a.getField("drugbank").getField("drugbank_id"),
          b.getField("drugbank").getField("drugbank_id"))).as("drugbank_id"),
      plural("drugbank.targets").as("targets"),
      plural("drugcentral.bioactivity").as("bioactivity"),
      plural("drugcentral.drug_use").as("drug_use"))
      // persist the parsed relation BEFORE any parsed-field filter: the
      // three emit branches below are separate union arms, and without a
      // materialization each re-runs the scan+parse — worse, filters on
      // parsed fields push DOWN through the widen exchange, landing the
      // re-parses on the narrow scan's 1-2 splits (measured 58 cpu-s /
      // 19 s wall at sf0.1). The InMemoryRelation is both the reuse
      // point and the pushdown barrier, so the parse runs wide and
      // exactly once. The cached relation is the compact parsed struct
      // row — |records| × ~300 B; the bench's inter-query cache hygiene
      // (Bench.scala) / Runner's per-source lifecycle bound its life.
      .persist()
      .filter(col("unii").isNotNull) // no-unii records skipped (py:50-53)

    // drugbank branch (py:40-69 + make_triples py:120-151): per
    // (target, action) — action tokens joined with '_' (space form
    // first, else '/' form), MONARCH-prefixed as the predicate itself
    val dbTargets = rec
      .filter(col("targets").isNotNull)
      .select(col("unii"), col("drugbank_id"),
        explode(col("targets")).as("t"))
      .filter(col("t.uniprot").isNotNull)
      .select(col("unii"), col("drugbank_id"),
        concat(lit("UniProtKB:"), col("t.uniprot")).as("uniprot"),
        col("t.name").as("tname"), explode(col("t.actions")).as("act"))
      .withColumn("pred", concat(lit("MONARCH:"),
        when(col("act").contains(" "),
          regexp_replace(trim(col("act")), "\\s+", "_"))
          .when(col("act").contains("/"),
            regexp_replace(col("act"), "/", "_"))
          .otherwise(col("act"))))
    val dbTriples = ColumnEmit.emitFiltered(dbTargets,
      res(col("unii"), col("pred"), col("uniprot")),
      str(col("uniprot"), lit(Vocab.label), col("tname")),
      res(col("uniprot"), lit(Vocab.subClassOf), lit(polypeptide)),
      res(col("drugbank_id"), lit(Vocab.equivalentClass), col("unii")),
      res(col("pred"), lit(Vocab.subPropertyOf), lit(interactsWith)),
      res(col("unii"), lit(Vocab.subClassOf), lit(molecularEntity)))

    // drugcentral bioactivity branch (py:80-99 + make_triples
    // py:169-198): pipe-separated uniprot lists fan out
    val interactions = rec
      .filter(col("bioactivity").isNotNull)
      .select(col("unii"), explode(col("bioactivity")).as("bio"))
      .filter(col("bio.uniprot_id").isNotNull)
      .select(col("unii"), col("bio.target_class").as("tclass"),
        col("bio.target").as("tname"),
        explode(split(col("bio.uniprot_id"), "\\|")).as("up"))
      .withColumn("uniprot", concat(lit("UniProtKB:"), col("up")))
    val dcTriples = ColumnEmit.emitFiltered(interactions,
      res(col("unii"), lit(interactsWith), col("uniprot")),
      str(col("uniprot"), lit(Vocab.label), col("tname")),
      res(col("unii"), lit(Vocab.subClassOf), lit(molecularEntity)),
      str(col("uniprot"), lit(Vocab.description), col("tclass")),
      res(col("uniprot"), lit(Vocab.subClassOf), lit(polypeptide)))

    // drug_use branch — ELIF semantics: only records with NO bioactivity
    // (py:100-112); contraindications dropped
    val indications = rec
      .filter(col("bioactivity").isNull && col("drug_use").isNotNull)
      .select(col("unii"), explode(col("drug_use")).as("du"))
      .filter(col("du.relation") =!= "contraindication" &&
        col("du.snomed_id").isNotNull)
      .select(col("unii"),
        concat(lit("SNOMED:"), col("du.snomed_id")).as("snomed"),
        col("du.snomed_name").as("sname"))
    val duTriples = ColumnEmit.emitFiltered(indications,
      res(col("unii"), lit(treats), col("snomed")),
      res(col("unii"), lit(Vocab.subClassOf), lit(molecularEntity)),
      res(col("snomed"), lit(Vocab.subClassOf), lit(diseaseOrDisorder)),
      str(col("snomed"), lit(Vocab.label), col("sname")))

    dbTriples.union(dcTriples).union(duTriples)
  }

  override def testIds: Seq[String] = Seq("UNII:68X13J106N")
}
