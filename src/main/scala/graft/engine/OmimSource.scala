package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.core.{Digest, Triple, Vocab}
import graft.emit.{Genotype => G, Model}
import graft.functions.OmimLabel
import graft.sources.JsonSource

/** The OMIM-shape ingest: the reference's API-backed source fetches
  * keyed JSON in batches of 20 on the driver (OMIM.py:188-254), lands
  * the payloads, then per-entry emits a disease/gene class with the
  * cleaned-up title, the raw title as exact synonym, alternative titles
  * as related synonyms, and deprecation links for replaced records
  * (`_transform_entry` OMIM.py:307-420, `_process_all`:269-316).
  *
  * Spark-first re-expression: the fetch stays a driver-side landing
  * stage (never network from executors — SURVEY §7); the landed
  * payloads are ONE distributed JSON scan with an explicit schema, and
  * the per-entry transform is a flatMap over the parsed entry relation.
  * Label cleanup (roman-numeral conversion, title-casing) runs in the
  * same codegen'd stage — no second pass over the corpus.
  *
  * [[OmimApiLanding]] stands in for the API fetch the hermetic
  * environment can't make, deriving entries deterministically from the
  * parquet tables so the p05 oracle re-predicts the graph in SQL. The
  * landing is fetch scaffolding; the measured operator is the JSON
  * scan + entry transform.
  */
object OmimApiSource extends GraftSource {
  val name = "omim_api"

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = {
    val path = OmimApiLanding.ensure(spark, dataDir)
    val schema = StructType(Seq(StructField("entry", StructType(Seq(
      StructField("mimNumber", LongType),
      StructField("prefix", StringType),
      StructField("titles", StructType(Seq(
        StructField("preferredTitle", StringType),
        StructField("alternativeTitles", StringType)))),
      StructField("movedTo", StringType))))))
    Map("entries" -> JsonSource.read(spark, path, Some(schema)))
  }

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    import spark.implicits._
    val entryTriples = in("entries")
      .select(
        col("entry.mimNumber").as("mim"),
        col("entry.prefix").as("prefix"),
        col("entry.titles.preferredTitle").as("title"),
        col("entry.titles.alternativeTitles").as("alts"),
        col("entry.movedTo").as("movedTo"))
      .as[(Long, String, Option[String], Option[String], Option[String])]
      .flatMap { case (mim, prefix, title, alts, movedTo) =>
        val curie = s"OMIM:$mim"
        if (prefix == "^") {
          // replaced record (mimTitles '^' rows, _process_all:313-316):
          // deprecate and link each replacement
          Model.addType(curie, Vocab.owlClass) ++
            Model.deprecatedTriples(curie, replacedBy = movedTo.toSeq)
        } else {
          val raw = title.getOrElse("")
          val newlabel = OmimLabel.cleanupLabel(raw)
          val parts = raw.split(";")
          val abbrev = if (parts.length > 1) Some(parts(1).trim) else None
          val classT =
            if (prefix == "*") // gene entry: abbrev label, typed as gene
              Model.classTriples(curie, abbrev.getOrElse(newlabel),
                subClassOf = Some(Vocab.gene), description = Some(newlabel))
            else // phenotype / heritable marker: cleaned label + description
              Model.classTriples(curie, newlabel, description = Some(newlabel))
          classT ++
            Model.addSynonym(curie, raw) ++
            alts.toSeq.flatMap(a => OmimLabel.altLabels(a).flatMap(l =>
              Model.addSynonym(curie, l, Vocab.hasRelatedSynonym)))
        }
      }
    // the per-run header (_process_all:303-306): human taxon + genome
    val header = spark.createDataset(
      Model.classTriples("NCBITaxon:9606", "Homo sapiens") ++
        G.addGenome("NCBITaxon:9606", "Homo sapiens"))
    entryTriples.union(header)
      .toDF().dropDuplicates("s", "p", "o", "lit", "dt")
  }

  override def testIds: Seq[String] = Seq("OMIM:5")
}

/** Deterministic stand-in for the OMIM API fetch: entries derived from
  * the customer table land as JSON lines once per (JVM, data dir) —
  * every 7th-mod-0 key is a gene record ('*'), every 7th-mod-2 a
  * replaced record ('^'), the rest phenotypes ('#'); every 3rd key
  * carries a `; ABBREV` title suffix and every 5th an
  * alternative-titles string with an `, INCLUDED` marker — the exact
  * label shapes `_cleanup_label` / `_get_alt_labels` exist for.
  */
object OmimApiLanding {

  private val landed = scala.collection.concurrent.TrieMap[String, String]()

  def ensure(spark: SparkSession, dataDir: String): String = {
    // a real landed payload (the API fetch's on-disk shape — one JSON
    // entry envelope per line, OMIM.py:269-306) takes precedence: the
    // golden corpus and any production landing read it directly
    val real = new java.io.File(dataDir, "omim_entries.json")
    if (real.exists()) return real.getPath
    landed.getOrElseUpdate(dataDir, synchronized {
      val dir = s"${sys.props("java.io.tmpdir")}/graft_omim_api/" +
        Digest.md5IdScala(dataDir)
      if (!new java.io.File(dir, "_SUCCESS").exists()) {
        val rom = expr("CASE c_custkey % 4 WHEN 0 THEN 'II' WHEN 1 THEN 'III' " +
          "WHEN 2 THEN 'IV' ELSE 'V' END")
        val m = col("c_custkey") % 7
        Tables.customer(spark, dataDir)
          .select(struct(
            col("c_custkey").as("mimNumber"),
            when(m === 0, "*").when(m === 2, "^").otherwise("#").as("prefix"),
            struct(
              concat(lit("DISEASE OF TYPE "), rom,
                when(col("c_custkey") % 3 === 0,
                  concat(lit("; D"), col("c_custkey"))).otherwise(lit("")))
                .as("preferredTitle"),
              when(col("c_custkey") % 5 === 0,
                concat(lit("OLD NAME FOR TYPE "), rom, lit(", INCLUDED;;ALIAS "), rom))
                .as("alternativeTitles")).as("titles"),
            when(m === 2, concat(lit("OMIM:"), col("c_custkey") + 1))
              .as("movedTo")).as("entry"))
          .write.mode("overwrite").json(dir)
      }
      dir
    })
  }
}
