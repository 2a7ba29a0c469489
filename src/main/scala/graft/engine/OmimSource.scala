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

  /** The landed entry-envelope schema (one JSON entry per line,
    * OMIM.py:269-306). Public so query derivations can build an empty
    * entries relation when exercising only the flat-file tiers. */
  val entriesSchema: StructType = StructType(Seq(StructField("entry",
    StructType(Seq(
      StructField("mimNumber", LongType),
      StructField("prefix", StringType),
      StructField("titles", StructType(Seq(
        StructField("preferredTitle", StringType),
        StructField("alternativeTitles", StringType)))),
      StructField("movedTo", StringType))))))

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = {
    val path = OmimApiLanding.ensure(spark, dataDir)
    val schema = entriesSchema
    Map("entries" -> JsonSource.read(spark, path, Some(schema))) ++
      // the two OMIM flat-file passes (_process_morbidmap OMIM.py:512-705,
      // _process_phenotypicseries OMIM.py:867-943) — OPT-IN like the
      // engine's other dormant tiers: present file ⇒ reference-faithful
      // emission, absent ⇒ identical default output. mim2gene stands in
      // for the omim→ncbigene idmap the reference accumulates from the
      // API entries' externalLinks.geneIDs (OMIM.py:1019-1035).
      (if (new java.io.File(dataDir, "morbidmap.txt").exists())
         Map("morbidmap" -> spark.read.option("sep", "\t")
           .option("comment", "#")
           .schema(StructType(Seq("phenotype", "gene_symbols",
             "mim_number", "cyto_location")
             .map(StructField(_, StringType))))
           .csv(s"$dataDir/morbidmap.txt"))
       else Map.empty) ++
      (if (new java.io.File(dataDir, "phenotypicSeries.txt").exists())
         Map("phenotypic_series" -> spark.read.option("sep", "\t")
           .schema(StructType(Seq("ps_title", "ps_number")
             .map(StructField(_, StringType))))
           .csv(s"$dataDir/phenotypicSeries.txt"))
       else Map.empty) ++
      (if (new java.io.File(dataDir, "mim2gene.tsv").exists())
         Map("mim2gene" -> spark.read.option("sep", "\t")
           .option("comment", "#")
           .schema(StructType(Seq("mim_number", "mim_type", "entrez_id",
             "hgnc", "ensembl").map(StructField(_, StringType))))
           .csv(s"$dataDir/mim2gene.tsv"))
       else Map.empty)
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

    // ---- optional morbidmap tier (_process_morbidmap OMIM.py:512-705):
    // gene→disorder rows through the disorder regex (label, 6-digit mim,
    // optional phene key); nogene rows resolve through the mim2gene
    // idmap — one association per mapped NCBI gene, an anonymous
    // '_:feature<mim>' otherwise; the bracket/brace/question-mark label
    // prefixes pick the relation, the phene key the ECO evidence
    val morbidTriples = in.get("morbidmap").map { mm =>
      val tt = graft.core.TranslationTable.forSource("omim")
      // the reference's omim→ncbigene idmap as a RELATION, not a driver
      // hash: mim2gene is dimension-sized, so the per-mim gene list
      // broadcasts as a left join against the morbidmap fact rows — no
      // collect, no driver path, holds at any morbidmap volume
      val idmapDf = in.get("mim2gene") match {
        case Some(m2g) =>
          m2g.filter(coalesce(col("entrez_id"), lit("")) =!= "")
            .groupBy(trim(col("mim_number")).as("mim_number"))
            .agg(collect_list(trim(col("entrez_id"))).as("gene_ids"))
        case None =>
          spark.emptyDataset[(String, Seq[String])]
            .toDF("mim_number", "gene_ids")
      }
      // pattern objects hoisted OUT of the per-row lambda — compiling
      // them per row costs more than the whole match at fact volume
      val disorderRe = """(.*), (\d{6})\s*(?:\((\d+)\))?""".r
      val nogeneRe = """(.*)\s+\((\d+)\)""".r
      // widen barrier: a single-split morbidmap scan would serialize
      // the per-row regex walk on one core (the ScanStats guard the
      // other fact pipelines use); no-op on wide production scans
      val ts = graft.operators.ScanStats.widen(mm
        .filter(coalesce(col("phenotype"), lit("")) =!= "" &&
          coalesce(col("mim_number"), lit("")) =!= "")
        .select(col("phenotype"), trim(col("mim_number")).as("mim_number")))
        .join(broadcast(idmapDf), Seq("mim_number"), "left")
        .select(col("phenotype"), col("mim_number"), col("gene_ids"))
        .as[(String, String, Option[Seq[String]])]
        .flatMap { case (disorder, geneNum, geneIds) =>
          def assoc(subj: String, disorderNum: String, label: String,
                    pheneKey: String): Seq[Triple] = {
            val disorderId = s"OMIM:$disorderNum"
            val rel =
              if (label.startsWith("[")) Vocab.isMarkerFor
              else if (label.startsWith("{")) "RO:0002326"
              else if (label.startsWith("?")) "RO:0002326"
              else "RO:0003303"
            val evidence = Option(pheneKey).filter(_.nonEmpty)
              .map(k => tt.resolve(k, mandatory = false))
              .filter(e => e != pheneKey).toSeq
            graft.emit.Association("EX:omim", subj, rel, disorderId,
              evidence = evidence,
              explicitId = Some("_:" + Digest.assocIdScalaMd5("EX:omim",
                subj, rel, disorderId))).triples
          }
          disorder match {
            case disorderRe(label, num, key) =>
              assoc(s"OMIM:$geneNum", num, label,
                Option(key).getOrElse(""))
            case nogeneRe(label, key) =>
              geneIds.filter(_.nonEmpty) match {
                case Some(genes) =>
                  genes.flatMap(g =>
                    assoc(s"NCBIGene:$g", geneNum, label, key))
                case None =>
                  assoc(s"_:feature$geneNum", geneNum, label, key)
              }
            case _ => Nil // misformatted row (reference warns)
          }
        }
      ts.toDF()
    }

    // ---- optional phenotypic-series tier (_process_phenotypicseries
    // OMIM.py:867-910): OMIMPS grouping classes; the file's 4 prose
    // header lines + the column header are not PS rows and filter out
    val psTriples = in.get("phenotypic_series").map { ps =>
      ps.filter(coalesce(col("ps_number"), lit("")).rlike("^PS\\d+"))
        .select(col("ps_title"), col("ps_number"))
        .as[(String, String)]
        .flatMap { case (title, num) =>
          // the full 'PS…' token stays in the local part
          // (curie_map 'OMIMPS' → …/phenotypicSeries/, OMIM.py:908)
          Model.classTriples(s"OMIMPS:${num.trim}", title.trim)
        }
        .toDF()
    }

    (morbidTriples.toSeq ++ psTriples)
      .foldLeft(entryTriples.union(header).toDF())(_ union _)
      .dropDuplicates("s", "p", "o", "lit", "dt")
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
