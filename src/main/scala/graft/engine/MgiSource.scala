package graft.engine

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.{Digest, TranslationTable, Triple, Vocab}
import graft.emit.{Genotype => G, Model}
import graft.sources.JdbcSource
import graft.sources.JdbcSource.JdbcConf

/** The MGI-shape ingest: the reference's second-largest source reads no
  * files at all — it pulls 20+ views straight from MGI's Postgres via a
  * per-view SQL manifest (MGI.py:52-66 + resources/sql/mgi, one .sql
  * file per view), then
  * "joins" them in application space through `idhash` maps keyed on the
  * database's internal integer keys (MGI.py:308-326: allele / marker /
  * publication / strain / genotype key → public MGI id).
  *
  * Spark-first re-expression: every idhash becomes a broadcast dimension
  * and every hash lookup an equi-join; the per-genotype GVC assembly
  * (the geno_hash accumulation at MGI.py:1041-1085) becomes ONE
  * aggregation over the pair relation. Four views reproduce the
  * topology:
  *
  *  - `gxd_genotype_view` (genotype key → mgiid, background strain;
  *    _process_gxd_genotype_view MGI.py:484-586)
  *  - `all_summary_view` (allele key → mgiid, label, description,
  *    `preferred = 1` filter; _process_all_summary_view MGI.py:668-749)
  *  - `gxd_allelepair_view` (VSLC per allele pair with zygosity
  *    translation and the reference's exact label synthesis;
  *    _process_gxd_allele_pair_view MGI.py:916-1087)
  *  - `bib_acc_view` (J-number publication idhash first pass, then
  *    PMID/MGI equivalences; _process_bib_acc_view MGI.py:1372-1484)
  *
  * Scale shape: the three dimension views broadcast (genotype and
  * allele dims are bounded by the organism's genotype/allele count); the
  * pair relation is the fact side read through the partitionable JDBC
  * scan ([[JdbcSource.Stride]] in production); one shuffle total — the
  * per-genotype GVC aggregation. A pair whose genotype key misses the
  * genotype dim is dropped, matching the reference's logged skip
  * (MGI.py:974-977); an allele key that misses the preferred-allele dim
  * emits no part edge, matching the None-guard in addPartsToVSLC.
  *
  * The embedded-Derby database this source reads in tests stands in for
  * the remote MGI Postgres (same JDBC options either way, proven in
  * JdbcSpec); [[MgiDb]] seeds it deterministically from the TPC-H
  * parquet tables so the p04 oracle can re-derive the expected graph in
  * SQL. The seeding is test scaffolding for the missing network database
  * — the measured operator is the JDBC scan + join topology.
  */
object MgiGenotypeSource extends GraftSource {
  val name = "mgi_genotypes"

  /** Zygosity CURIEs that render the second VSLC-label slot as '0'
    * (the hemizygous family branch at MGI.py:994-1000). */
  private val hemiZygosities = Set(
    "GENO:0000134", "GENO:0000604", "GENO:0000605", "GENO:0000606")

  private lazy val tt = TranslationTable.forSource("mgi")

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = {
    val conf = MgiDb.conf(spark, dataDir)
    // one entry per .sql manifest file (resources/sql/mgi/*.sql shape);
    // Derby uppercases result identifiers — normalize to the manifest's.
    // The views are NOT persisted here: per-view caching was tried in
    // r15 and measured SLOWER under the bench's own methodology
    // (cached 11.67 s vs uncached 8.44 s min-of-passes — rebuilding 17
    // cached views per run costs more than warm embedded-Derby rescans
    // save at this scale; against a remote production Postgres the
    // trade reverses, which stays a deployment note). The rescan dedup
    // is handled STRUCTURALLY in [[transform]] instead (r16): the
    // multi-consumer DERIVED relations persist lazily and the
    // double-consumed emit branches were merged, so each view is
    // scanned a bounded number of times per run.
    def view(sql: String): DataFrame = {
      val df = JdbcSource.query(spark, conf, sql)
      df.toDF(df.columns.map(_.toLowerCase): _*)
    }
    Map(
      "gxd_genotype_view" -> view(
        "SELECT genotype_key, strain_key, strain, mgiid FROM gxd_genotype_view"),
      "all_summary_view" -> view(
        "SELECT object_key, preferred, mgiid, description, short_description FROM all_summary_view"),
      "gxd_allelepair_view" -> view(
        "SELECT allelepair_key, genotype_key, allele_key_1, allele_key_2, allele1, allele2, allelestate FROM gxd_allelepair_view"),
      "bib_acc_view" -> view(
        "SELECT accid, prefixpart, numericpart, object_key, logicaldb, logicaldb_key FROM bib_acc_view"),
      "mrk_acc_view" -> view(
        "SELECT accid, prefixpart, object_key, preferred, logicaldb_key, organism_key FROM mrk_acc_view"),
      "mrk_marker_view" -> view(
        "SELECT marker_key, organism_key, marker_status_key, symbol, name, latin_name, marker_type FROM mrk_marker_view"),
      "mrk_summary_view" -> view(
        "SELECT accid, logicaldb_key, object_key, preferred, mgiid, subtype FROM mrk_summary_view"),
      "mrk_location_cache" -> view(
        "SELECT marker_key, organism_key, chromosome, startcoordinate, endcoordinate, strand, version FROM mrk_location_cache"),
      "gxd_genotype_summary_view" -> view(
        "SELECT object_key, preferred, mgiid, subtype, short_description FROM gxd_genotype_summary_view"),
      "prb_strain_view" -> view(
        "SELECT strain_key, strain, species FROM prb_strain_view"),
      "prb_strain_acc_view" -> view(
        "SELECT accid, prefixpart, logicaldb_key, object_key, preferred FROM prb_strain_acc_view"),
      "prb_strain_genotype_view" -> view(
        "SELECT strain_key, genotype_key FROM prb_strain_genotype_view"),
      "all_allele_view" -> view(
        "SELECT allele_key, marker_key, strain_key, symbol, name, iswildtype FROM all_allele_view"),
      "all_allele_mutation_view" -> view(
        "SELECT allele_key, mutation FROM all_allele_mutation_view"),
      "voc_annot_view" -> view(
        "SELECT annot_key, annottype, object_key, term_key, qualifier_key, qualifier, accid FROM voc_annot_view"),
      "evidence_view" -> view(
        "SELECT annotevidence_key, annot_key, evidencecode, jnumid, term, value FROM evidence_view"),
      "mgi_note_vocevidence_view" -> view(
        "SELECT object_key, note FROM mgi_note_vocevidence_view"))
  }

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    import spark.implicits._
    val localTt = tt

    // Multi-consumer relations persist LAZILY (r16, guide §2.4/§5):
    // every reference below re-plans its whole subtree, so a relation
    // consumed k times re-ran its serial JDBC scans and joins k times —
    // p04's r15 plan carried 118 scans for 17 views. Caching the raw
    // views was tried in r15 and measured slower (see read()); caching
    // the narrower DERIVED dims and fact joins keeps the rescan dedup
    // without 17 rebuilt view caches. All lazy — the single final
    // action's first pass over each fills it — and released with the
    // session/bench clearCache (the transform returns a lazy relation,
    // so it cannot know when its consumer is done).
    def shared(df: DataFrame): DataFrame =
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val genoDim = shared(in("gxd_genotype_view").select(
      col("genotype_key"), col("mgiid").as("gt"),
      col("strain_key"), col("strain")))
    val alleleDim = shared(in("all_summary_view")
      .filter(col("preferred") === 1)
      .select(col("object_key"), col("mgiid").as("aid"),
        col("short_description"), col("description")))

    // genotype individuals + internal-id strain backgrounds
    // (_process_gxd_genotype_view; strain ids are the reference's
    // make_internal_identifier bnodes, MGI.py:546-556)
    val genoTriples = genoDim
      .as[(Int, String, Int, String)]
      .flatMap { case (_, gt, sk, strain) =>
        val strainId = "_:" + Digest.md5IdScala(s"mgistrain+$sk")
        G.addGenotype(gt, null) ++
          G.addGenomicBackground(strainId, strain) ++
          G.addGenomicBackgroundToGenotype(strainId, gt)
      }

    // preferred-allele individuals with label + description
    val alleleTriples = alleleDim
      .as[(Int, String, String, String)]
      .flatMap { case (_, aid, short, desc) =>
        Model.addType(aid, Vocab.allele) ++
          Model.addLabel(aid, short) ++
          Model.addDescription(aid, desc)
      }

    // idhash joins: genotype key (inner → reference's logged skip),
    // allele keys (left → missing part edges are simply not emitted)
    val pairs = in("gxd_allelepair_view")
      .join(broadcast(genoDim.select(col("genotype_key"), col("gt"))),
        Seq("genotype_key"))
      .join(broadcast(alleleDim.select(
        col("object_key").as("allele_key_1"), col("aid").as("a1id"))),
        Seq("allele_key_1"), "left")
      .join(broadcast(alleleDim.select(
        col("object_key").as("allele_key_2"), col("aid").as("a2id"))),
        Seq("allele_key_2"), "left")
      .select(col("allelepair_key"), col("gt"), col("a1id"), col("a2id"),
        col("allele1"), col("allele2"), col("allelestate"))
      .as[(Int, String, Option[String], Option[String], String, String, String)]
      .map { case (apk, gt, a1id, a2id, allele1, allele2, state) =>
        val zyg = localTt.resolve(state)
        val vslc = "_:" + Digest.md5IdScala(s"mgivslc+$apk")
        // exact label rules of MGI.py:990-1017: the branch is on the
        // RESOLVED second allele id (idhash miss ⇒ placeholder), the
        // else-arm uses the raw symbol column
        val slot2 =
          if (a2id.isDefined) allele2
          else if (hemiZygosities(zyg)) "0"
          else if (zyg == "GENO:0000135") "+"
          else if (zyg == "GENO:0000137") "?"
          else if (zyg == "GENO:0000136") allele1
          else "?"
        (gt, vslc, s"$allele1/$slot2", a1id, a2id, zyg)
      }
      .toDF("gt", "vslc", "vlabel", "a1id", "a2id", "zyg")

    // VSLC + GVC assembly in ONE pass over the pair relation (r16,
    // guide §2.4): the former two consumers — a per-row VSLC flatMap
    // and the geno_hash aggregation (MGI.py:1041-1085) — each replayed
    // the pair join subtree; collecting the full pair rows per genotype
    // lets one aggregate feed both emit groups. Group sizes are bounded
    // by alleles-per-genotype (single digits). Set-equivalent to the
    // former two branches: the final dropDuplicates collapses emission
    // multiplicity, `vs` is the identical sorted collect_set, and the
    // VSLC triples are emitted once per collected pair row exactly as
    // the per-row flatMap did.
    val vslcAndGvcTriples = pairs
      .groupBy(col("gt"))
      .agg(sort_array(collect_set(struct(col("vslc"), col("vlabel")))).as("vs"),
        collect_list(struct(col("vslc"), col("vlabel"), col("a1id"),
          col("a2id"), col("zyg"))).as("rows"))
      .as[(String, Seq[(String, String)],
           Seq[(String, String, Option[String], Option[String], String)])]
      .flatMap { case (gt, vs, rows) =>
        val vslcTs = rows.flatMap { case (vslc, vlabel, a1id, a2id, zyg) =>
          Model.addType(vslc, Vocab.vslc) ++
            Model.addLabel(vslc, vlabel) ++
            (a1id.toSeq ++ a2id.toSeq)
              .map(Triple.res(vslc, Vocab.hasVariantPart, _)) :+
            Triple.res(vslc, Vocab.hasZygosity, zyg)
        }
        val gvcTs = if (vs.size > 1) {
          val joined = vs.map(_._1).mkString("-").replaceAll("[_:]", "")
          val gvcId = "_:" + Digest.md5IdScala(joined)
          val gvcLabel = vs.map(_._2).mkString("; ")
          Model.addType(gvcId, Vocab.gvc) ++
            Model.addLabel(gvcId, gvcLabel) ++
            vs.map(v => Triple.res(gvcId, Vocab.hasVariantPart, v._1)) :+
            Triple.res(gt, Vocab.hasVariantPart, gvcId)
        } else {
          Model.addType(vs.head._1, Vocab.gvc) :+
            Triple.res(gt, Vocab.hasVariantPart, vs.head._1)
        }
        vslcTs ++ gvcTs
      }

    // publications: J-number idhash first pass, PMID / MGI-id
    // equivalence second pass (two passes over one cached scan in the
    // reference; one scan + a broadcast self-join here)
    val bib = in("bib_acc_view")
    val jNumbers = shared(bib.filter(col("prefixpart") === "J:")
      .select(col("object_key"), col("accid").as("jid")))
    val jTriples = jNumbers.as[(Int, String)]
      .flatMap(j => Model.addType(j._2, Vocab.publication))
    val pubTriples = bib
      .filter(col("logicaldb_key") === 29 ||
        (col("logicaldb_key") === 1 && col("prefixpart") === "MGI:"))
      .withColumn("pub_id",
        when(col("logicaldb_key") === 29, concat(lit("PMID:"), col("accid")))
          .otherwise(col("accid")))
      .withColumn("is_pmid", col("logicaldb_key") === 29)
      .join(broadcast(jNumbers), Seq("object_key"))
      .select(col("pub_id"), col("is_pmid"), col("jid"))
      .as[(String, Boolean, String)]
      .flatMap { case (pubId, isPmid, jid) =>
        Model.addType(pubId,
          if (isPmid) Vocab.journalArticle else Vocab.publication) :+
          Triple.res(jid, Vocab.sameAs, pubId)
      }

    // ---- depth wave: marker dim, allele/seq-alteration, annotation,
    // evidence, and note views (round-6 extension) -----------------------

    // marker idhash (_process_mrk_acc_view MGI.py:1738-1776): preferred
    // MGI-prefixed accession per marker key; dimension → broadcast
    val markerDim = shared(in("mrk_acc_view")
      .filter(col("preferred") === 1 && col("prefixpart") === "MGI:")
      .select(col("object_key").as("marker_key"), col("accid").as("mid")))

    // _process_all_allele_view (MGI.py:750-915), scoped to the
    // variant/reference-locus typing + seq-alteration chain: allele
    // individuals, internal seqalt bnodes ('mgiseqaltkey<key>', the
    // make_internal_identifier scheme MGI.py:2966-2981), allele→marker
    // locus edges, and strain sequence provenance through the SAME
    // internal strain bnodes the genotype tier mints. The
    // label-collision HACK (allele label == marker label → seqalt
    // collapses onto the allele, MGI.py:858-872) needs the unported
    // mrk_marker_view label hash and is intentionally absent.
    val allele2 = shared(in("all_allele_view")
      .join(broadcast(alleleDim.select(
        col("object_key").as("allele_key"), col("aid"))), Seq("allele_key"))
      .join(broadcast(markerDim), Seq("marker_key"), "left")
      // a nonempty marker key that misses the marker idhash skips the
      // row (MGI.py:829-835); allele-idhash misses skipped by the inner
      // join above (MGI.py:817-822)
      .filter(col("marker_key").isNull || col("mid").isNotNull)
      .join(broadcast(genoDim.select(col("strain_key"),
        lit(true).as("strainKnown")).dropDuplicates("strain_key")),
        Seq("strain_key"), "left")
      .select(col("allele_key"), col("aid"), col("mid"), col("strain_key"),
        col("strainKnown"), col("symbol"), col("name"), col("iswildtype")))

    val alleleLocusTriples = allele2
      .as[(Int, String, Option[String], Int, Option[Boolean], String,
           String, String)]
      .flatMap { case (ak, aid, mid, sk, strainKnown, symbol, name, iswt) =>
        val iseqalt = "_:" + Digest.md5IdScala(s"mgiseqaltkey$ak")
        val (locusType, locusRel) =
          if (iswt == "0") (Some(Vocab.variantLocus), Vocab.isAlleleOf)
          else if (iswt == "1") (Some("GENO:0000036"), "GENO:0000610")
          else (None, null)
        val indiv = Model.individualTriples(aid, symbol, locusType)
        val markerEdge =
          if (locusRel == null) Nil
          else mid.toSeq.flatMap(m => Model.addTriple(aid, locusRel, m))
        val seqAlt =
          if (iswt != "0") Nil
          else {
            // sequence-alteration label reformat (MGI.py:1126-1151)
            val (saId, saLabel0, attach) =
              if (mid.isDefined) {
                val l =
                  if (symbol.matches(".*<.*>.*")) symbol.replaceAll(".*<", "<")
                  else if (symbol.startsWith("+")) "<+>"
                  else symbol
                (iseqalt, l, Model.addTriple(aid, Vocab.hasVariantPart, iseqalt))
              } else (aid, symbol, Nil)
            val saLabel = saLabel0.replaceAll("[<>]", "")
            attach ++ G.addSequenceAlteration(saId, saLabel) ++
              Model.addDescription(saId, name) ++
              (if (strainKnown.contains(true))
                 G.addSequenceDerivesFrom(aid,
                   "_:" + Digest.md5IdScala(s"mgistrain+$sk"))
               else Nil)
          }
        indiv ++ markerEdge ++ seqAlt
      }

    // _process_all_allele_mutation_view (MGI.py:1089-1157): mutation →
    // SO class on the internal seqalt bnode; inner join = the
    // seqalt-idhash-miss skip; unmapped mutations default to plain
    // sequence_alteration; the Tg( label hack promotes to
    // transgenic_insertion
    val mutationTriples = in("all_allele_mutation_view")
      .join(allele2.select(col("allele_key"), col("symbol")),
        Seq("allele_key"))
      .select(col("allele_key"), col("mutation"), col("symbol"))
      .as[(Int, String, String)]
      .flatMap { case (ak, mutation, symbol) =>
        val iseqalt = "_:" + Digest.md5IdScala(s"mgiseqaltkey$ak")
        val mapped = localTt.resolve(mutation, mandatory = false,
          default = Some("SO:0001059"))
        val saType =
          if (symbol.contains("Tg(")) "SO:0001218" else mapped
        Model.individualTriples(iseqalt, null, Some(saType))
      }

    // _process_voc_annot_view (MGI.py:1158-1287): four consumed
    // annotation types. 'norm' qualifier rows are measured-but-normal →
    // skipped; DO/Genotype NOT-qualifier (key 1614157) skipped.
    val annots = shared(in("voc_annot_view")
      .filter(coalesce(col("qualifier"), lit("")) =!= "norm"))
    val gtAnnots = annots
      .filter(col("annottype").isin(
        "Mammalian Phenotype/Genotype", "DO/Genotype") &&
        !(col("annottype") === "DO/Genotype" &&
          col("qualifier_key") === 1614157))
      .join(broadcast(genoDim.select(
        col("genotype_key").as("object_key"), col("gt").as("sub"))),
        Seq("object_key"))
      .select(col("annot_key"), col("annottype"), col("sub"), col("accid"))
    val alleleAnnots = annots.filter(col("annottype") === "DO/Allele")
      .join(broadcast(alleleDim.select(
        col("object_key"), col("aid").as("sub"))), Seq("object_key"))
      .select(col("annot_key"), col("annottype"), col("sub"), col("accid"))
    val annotAssoc = shared(gtAnnots.unionByName(alleleAnnots)
      .withColumn("rel",
        when(col("annottype") === "Mammalian Phenotype/Genotype",
          lit(Vocab.hasPhenotype)).otherwise(lit(Vocab.isModelOf)))
      .withColumn("assoc", concat(lit("_:"),
        Digest.assocIdMd5("EX:mgi", col("sub"), col("rel"), col("accid")))))

    // the MP phenotype class is declared BEFORE the genotype lookup in
    // the reference (MGI.py:1221-1224) — it lands even when the
    // genotype idhash misses
    val mpClassTriples = annots
      .filter(col("annottype") === "Mammalian Phenotype/Genotype")
      .select(col("accid")).distinct()
      .as[String]
      .flatMap(a => Model.classTriples(a, null))

    val annotTriples = annotAssoc
      .select(col("annot_key"), col("sub"), col("accid"),
        col("rel"), col("assoc"))
      .as[(Int, String, String, String, String)]
      .flatMap { case (annotKey, sub, accid, rel, assoc) =>
        graft.emit.Association("EX:mgi", sub, rel, accid,
          explicitId = Some(assoc)).triples ++
          Model.addComment(assoc, s"annot_key:$annotKey")
      }

    // MCV/Marker: marker category term-key → SO class via the localtt
    // (MGI.py:1249-1263); unmapped keys warn-skip
    val mcvTriples = annots.filter(col("annottype") === "MCV/Marker")
      .join(broadcast(markerDim.select(
        col("marker_key").as("object_key"), col("mid"))), Seq("object_key"))
      .select(col("mid"), col("term_key"))
      .as[(String, Int)]
      .flatMap { case (mid, termKey) =>
        val t = localTt.resolve(termKey.toString, mandatory = false)
        if (t == termKey.toString) Nil else Model.addType(mid, t)
      }

    // _process_evidence_view (MGI.py:1288-1371): ECO + J-number citation
    // per captured annotation, MP-Sex-Specificity qualifier. Annotations
    // and evidence are both fact relations at MGI scale — this is a
    // shuffle equi-join on annot_key, NOT a broadcast.
    // evidence + note emission in ONE pass (r16, guide §2.4): the
    // former separate noteTriples branch replayed the whole
    // annots→annotAssoc→evidence chain (including its dropDuplicates
    // shuffle and the fact⋈fact equi-join) just to re-derive the
    // (annotevidence_key, assoc) pairs the evidence relation already
    // held. The notes view (_process_mgi_note_vocevidence_view,
    // MGI.py:2030-2072) left-joins onto evidence instead and both
    // triple groups emit from one flatMap — set-equivalent: a null/
    // absent note emits no description (exactly the former inner
    // join), and any join-multiplicity duplication collapses in the
    // final dropDuplicates.
    val evidence = in("evidence_view")
      .join(annotAssoc.select(col("annot_key"), col("assoc"))
        .dropDuplicates("annot_key", "assoc"), Seq("annot_key"))
      .select(col("annotevidence_key"), col("assoc"), col("evidencecode"),
        col("jnumid"), col("term"), col("value"))
    val evidenceAndNoteTriples = evidence
      .join(in("mgi_note_vocevidence_view")
        .withColumnRenamed("object_key", "annotevidence_key"),
        Seq("annotevidence_key"), "left")
      .select(col("annotevidence_key"), col("assoc"), col("evidencecode"),
        col("jnumid"), col("term"), col("value"), col("note"))
      .as[(Int, String, String, String, String, String, Option[String])]
      .flatMap { case (_, assoc, code, jnum, term, value, note) =>
        val eco = localTt.resolve(code, mandatory = false)
        graft.emit.Reference.triples(jnum) ++
          Model.addTriple(assoc, Vocab.hasEvidence, eco) ++
          Model.addTriple(assoc, Vocab.source, jnum) ++
          (if (term == "MP-Sex-Specificity" && (value == "M" || value == "F"))
             Model.addSexSpecificity(assoc,
               localTt.resolve(value, mandatory = false))
           else Nil) ++
          note.map(_.trim).filter(_.nonEmpty).toSeq
            .flatMap(Model.addDescription(assoc, _))
      }

    // ---- depth wave 2: marker dictionary + equivalences, strain
    // registry, genotype labels, marker locations (round-6 extension) ----

    // _process_mrk_marker_view (MGI.py:1556-1659): non-withdrawn mouse
    // markers; gene/pseudogene → class, everything else individual;
    // exact-synonym name, taxon from the latin name (unknown_taxa →
    // genus Mus, unmapped → Mus musculus — the reference's default), MGI
    // as clique leader for mouse markers. The class/individual partition
    // (the reference's markers['classes'/'indiv'] lists) feeds the two
    // equivalence passes and the location tier as a broadcast dimension.
    val unknownTaxa = Set("Not Applicable", "Not Specified")
    val markerRows = shared(in("mrk_marker_view")
      .filter(col("marker_status_key") =!= 2 && col("organism_key") === 1)
      .join(broadcast(markerDim), Seq("marker_key"))
      .select(col("marker_key"), col("mid"), col("symbol"), col("name"),
        col("latin_name"), col("marker_type"))
      .as[(Int, String, String, String, String, String)]
      .map { case (mk, mid, symbol, name, latin, mtype) =>
        val mapped = localTt.resolve(mtype)
        val isClass = mapped == "SO:0000704" || mapped == "SO:0000336"
        val taxon =
          if (unknownTaxa.contains(latin)) "NCBITaxon:10088"
          else localTt.resolve(latin, mandatory = false,
            default = Some("NCBITaxon:10090"))
        (mk, mid, symbol, name, mapped, isClass, taxon)
      }
      .toDF("marker_key", "mid", "symbol", "name", "mtype", "isclass",
        "taxon"))

    val markerTriples = markerRows
      .as[(Int, String, String, String, String, Boolean, String)]
      .flatMap { case (_, mid, symbol, name, mtype, isClass, taxon) =>
        (if (isClass)
           Model.classTriples(mid, symbol, subClassOf = Some(mtype),
             description = Some(name))
         else
           Model.individualTriples(mid, symbol, Some(mtype)) ++
             Model.addDescription(mid, name)) ++
          Model.addSynonym(mid, name) ++
          G.addTaxon(taxon, mid) ++
          (if (taxon == "NCBITaxon:10090")
             Seq(Triple.typed(mid, "MONARCH:cliqueLeader", "true",
               "xsd:boolean"))
           else Nil)
      }

    val markerKinds = markerRows.select(col("marker_key"), col("isclass"))

    // _process_mrk_summary_view (MGI.py:1660-1737): ENSEMBL(60)/NCBI(55)
    // equivalences on preferred non-self accessions; class-ness from the
    // marker dictionary with the Gene/Pseudogene subtype fallback
    val summaryEquivTriples = in("mrk_summary_view")
      .filter(col("preferred") === 1 && col("accid") =!= col("mgiid") &&
        col("logicaldb_key").isin(55, 60))
      .join(broadcast(markerKinds.withColumnRenamed(
        "marker_key", "object_key")), Seq("object_key"), "left")
      .select(col("accid"), col("logicaldb_key"), col("mgiid"),
        col("subtype"), col("isclass"))
      .as[(String, Int, String, String, Option[Boolean])]
      .flatMap { case (accid, ldb, mgiid, subtype, isclass) =>
        val mapped =
          if (ldb == 60) s"ENSEMBL:$accid" else s"NCBIGene:$accid"
        if (isclass.contains(true) ||
            Seq("Gene", "Pseudogene").contains(subtype))
          Model.addType(mapped, Vocab.owlClass) ++
            Model.addEquivalentClass(mgiid, mapped)
        else if (isclass.contains(false))
          Model.addType(mapped, Vocab.namedIndividual) ++
            Model.addSameIndividual(mgiid, mapped)
        else Nil
      }

    // _process_mrk_acc_view_for_equiv (MGI.py:1778-1853): second pass
    // over the accession table for mouse markers — NCBI (55), ENSEMBL
    // (60), and non-MGI logicaldb-1 accessions; idhash misses skip, and
    // a marker absent from both class/indiv partitions skips (the
    // reference error-logs it)
    val accEquivTriples = in("mrk_acc_view")
      .filter(col("organism_key") === 1 && col("preferred") === 1 &&
        (col("logicaldb_key").isin(55, 60) ||
          (col("logicaldb_key") === 1 && col("prefixpart") =!= "MGI:")))
      .join(broadcast(markerDim.select(col("marker_key").as("object_key"),
        col("mid").as("mgiid"))), Seq("object_key"))
      .join(broadcast(markerKinds.withColumnRenamed(
        "marker_key", "object_key")), Seq("object_key"), "left")
      .select(col("accid"), col("logicaldb_key"), col("mgiid"),
        col("isclass"))
      .as[(String, Int, String, Option[Boolean])]
      .flatMap { case (accid, ldb, mgiid, isclass) =>
        val markerId =
          if (ldb == 55) s"NCBIGene:$accid"
          else if (ldb == 60) s"ENSEMBL:$accid"
          else accid
        isclass match {
          case Some(true) =>
            Model.addType(markerId, Vocab.owlClass) ++
              Model.addEquivalentClass(mgiid, markerId)
          case Some(false) =>
            Model.addType(markerId, Vocab.namedIndividual) ++
              Model.addSameIndividual(mgiid, markerId)
          case None => Nil
        }
      }

    // _process_prb_strain_acc_view pass 1 (MGI.py:1854-1910): the
    // preferred-MGI strain idhash, typed intrinsic genotype in-taxon.
    // (The reference's addIndividualToGraph call passes the GENO curie
    // in the LABEL slot and the taxon as the type — an argument-order
    // slip; the docstring's triples are emitted here.)
    val strainAcc = in("prb_strain_acc_view")
    val strainIdDim = shared(strainAcc
      .filter(col("logicaldb_key") === 1 && col("prefixpart") === "MGI:" &&
        col("preferred") === 1)
      .select(col("object_key").as("strain_key"), col("accid").as("sid")))
    val strainDeclTriples = strainIdDim.as[(Int, String)]
      .flatMap { case (_, sid) =>
        Model.individualTriples(sid, null, Some("GENO:0000719")) ++
          G.addTaxon("NCBITaxon:10090", sid)
      }

    // pass 2 (MGI.py:1941-2028): external stock-center registries —
    // JAX(22), EMMA(37, EM:→EMMA:), MMRRC(38, clique leader), ORNL(40,
    // deprecated under JAX + synonym + comment), NCIMR(54),
    // neuromice(56, raw MGI ids), RIKEN(70), MUGEN(87), APB(90)
    val strainEquivTriples = strainAcc
      .filter(col("preferred") === 1 &&
        col("logicaldb_key").isin(22, 37, 38, 40, 54, 56, 70, 87, 90))
      .join(broadcast(strainIdDim.withColumnRenamed(
        "strain_key", "object_key")), Seq("object_key"))
      .select(col("accid"), col("logicaldb_key"), col("sid"))
      .as[(String, Int, String)]
      .flatMap { case (accid0, ldb, mgiid) =>
        val accid = accid0.replace("`", "").trim
        val (strainId, deprecated, comment) = ldb match {
          case 22 => (s"JAX:$accid", false, None)
          case 37 =>
            ("EMMA:" + accid.replaceAll("^(EM:)*", ""), false, None)
          case 38 =>
            (if (accid.startsWith("MMRRC:")) accid else s"MMRRC:$accid",
             false, None)
          case 40 =>
            (s"JAX:$accid", true, Some("Originally from ORNL."))
          case 54 => (s"NCIMR:$accid", false, None)
          case 56 => (accid, false, None)
          case 70 => (s"RBRC:RBRC$accid", false, None)
          case 87 => (s"MUGEN:$accid", false, None)
          case _  => (s"APB:$accid", false, None)
        }
        Model.individualTriples(strainId, null, Some("NCBITaxon:10090")) ++
          (if (deprecated)
             Model.deprecatedTriples(strainId, replacedBy = Seq(mgiid)) ++
               Model.addSynonym(mgiid, accid)
           else Model.addSameIndividual(mgiid, strainId)) ++
          (if (strainId.startsWith("MMRRC"))
             Seq(Triple.typed(strainId, "MONARCH:cliqueLeader", "true",
               "xsd:boolean"))
           else Nil) ++
          comment.toSeq.flatMap(Model.addComment(strainId, _))
      }

    // _process_prb_strain_view (MGI.py:1486-1555): strain labels +
    // species typing, with the code-level fallbacks — unknown_taxa →
    // genus Mus, 'M. m. domesticus ' prefix → Mus musculus, any other
    // unmapped species → genus Mus
    val strainViewTriples = in("prb_strain_view")
      .join(broadcast(strainIdDim), Seq("strain_key"))
      .select(col("sid"), col("strain"), col("species"))
      .as[(String, String, String)]
      .flatMap { case (sid, strain, species0) =>
        val species = species0.trim
        val resolved = localTt.resolve(species, mandatory = false)
        val sp =
          if (unknownTaxa.contains(species)) "NCBITaxon:10088"
          else if (resolved != species) resolved
          else if (species.startsWith("M. m. domesticus "))
            "NCBITaxon:10090"
          else "NCBITaxon:10088"
        Model.addType(sp, Vocab.owlClass) ++
          G.addTaxon(sp, sid) ++
          Model.individualTriples(sid, strain, Some(sp))
      }

    // _process_prb_strain_genotype_view (MGI.py:2267-2323): strain
    // has_genotype genotype; idhash misses fall back to the internal
    // digest ids (the reference's _make_internal_identifier scheme,
    // same 'mgistrain+<key>' convention the genotype tier mints)
    val strainGenotypeTriples = in("prb_strain_genotype_view")
      .join(broadcast(strainIdDim), Seq("strain_key"), "left")
      .join(broadcast(genoDim.select(col("genotype_key"), col("gt"))),
        Seq("genotype_key"), "left")
      .select(col("strain_key"), col("sid"), col("genotype_key"),
        col("gt"))
      .as[(Int, Option[String], Int, Option[String])]
      .map { case (sk, sid, gk, gt) =>
        Triple.res(
          sid.getOrElse("_:" + Digest.md5IdScala(s"mgistrain+$sk")),
          "GENO:0000222",
          gt.getOrElse("_:" + Digest.md5IdScala(s"mgigenotype+$gk")))
      }

    // _process_gxd_genotype_summary_view (MGI.py:587-667): preferred
    // rows aggregate their VSLC short-descriptions per public genotype —
    // label '<gvc> [subtype]' with commas slashed, sorted; the internal
    // genotype key rides as a comment (the reference's
    // _make_internal_identifier); ONE hash-aggregate, no shuffled state
    val genoSummaryTriples = in("gxd_genotype_summary_view")
      .filter(col("preferred") === 1)
      .select(col("mgiid"), col("object_key"),
        regexp_replace(col("short_description"), ",", "/").as("d"),
        col("subtype"))
      .groupBy(col("mgiid"))
      .agg(sort_array(collect_list(col("d"))).as("ds"),
        max(col("subtype")).as("subtype"),
        max(col("object_key")).as("okey"))
      .as[(String, Seq[String], String, Int)]
      .flatMap { case (gt, ds, subtype, okey) =>
        val label = ds.mkString("; ") + " [" + subtype + "]"
        G.addGenotype(gt, label.trim) ++
          Model.addComment(gt,
            "_:" + Digest.md5IdScala(s"mgigenotype+$okey"))
      }

    // _process_mrk_location_cache (MGI.py:2073-2146): mouse markers on
    // taxon CHR classes — or build chromosome instances when an assembly
    // version is present — with exact FALDO intervals; a missing start
    // degrades to a fuzzy begin position (no coordinate literal), a
    // missing end is simply not emitted
    val locTriples = in("mrk_location_cache")
      .filter(col("organism_key") === 1 && col("chromosome") =!= "UN")
      .join(broadcast(markerDim), Seq("marker_key"))
      .select(col("mid"), col("chromosome"), col("startcoordinate"),
        col("endcoordinate"), col("strand"), col("version"))
      .as[(String, String, String, String, String, String)]
      .flatMap { case (mid, chrom, start0, end0, strand0, version0) =>
        def nn(s: String) =
          Option(s).map(_.trim).filter(v => v.nonEmpty && v != "(null)")
        val chromClass = s"CHR:NCBITaxon-10090$chrom"
        val (ref, buildTriples) = nn(version0) match {
          case Some(v) =>
            val buildId = s"NCBIGenome:$v"
            (s"$buildId#chr$chrom",
              G.addChromosomeInstance(chrom, buildId, chromClass))
          case None => (chromClass, Seq.empty[Triple])
        }
        val strand = nn(strand0).getOrElse(".")
        val st = graft.emit.Feature.strandType(strand)
        val start = nn(start0).map(_.toDouble.toLong)
        val end = nn(end0).map(_.toDouble.toLong)
        val interval = (start, end) match {
          case (Some(s0), Some(e0)) =>
            graft.emit.Feature.featureTriples(mid, null, null, ref, s0,
              e0, strand, digest = Digest.md5IdScala)
          case (None, e1) =>
            // fuzzy begin: position node typed FuzzyPosition, no
            // coordinate literal (GenomicFeature.py FuzzyPosition arm)
            val region = "_:" + Digest.md5IdScala(
              s"region+$mid++${e1.getOrElse("")}+$ref")
            val begin = "_:" + Digest.md5IdScala(s"pos+$region+begin+")
            Seq(
              Triple.res(mid, Vocab.faldoLocation, region),
              Triple.res(region, Vocab.a, Vocab.faldoRegion),
              Triple.res(region, Vocab.faldoBegin, begin),
              Triple.res(begin, Vocab.a, "faldo:FuzzyPosition"),
              Triple.res(begin, Vocab.a, st),
              Triple.res(begin, Vocab.faldoReference, ref)) ++
              e1.toSeq.flatMap { e0 =>
                val endN = "_:" + Digest.md5IdScala(s"pos+$region+end+$e0")
                Triple.res(region, Vocab.faldoEnd, endN) +:
                  graft.emit.Feature.positionTriples(endN, e0, ref, st)
              }
          case (Some(_), None) => Nil
        }
        buildTriples ++ interval
      }

    // the reference's graph store is a set (rdflib.Graph) — dedup here
    // so repeated strain/pub patterns collapse exactly once
    genoTriples.union(alleleTriples).union(vslcAndGvcTriples)
      .union(jTriples).union(pubTriples)
      .union(alleleLocusTriples).union(mutationTriples)
      .union(mpClassTriples).union(annotTriples).union(mcvTriples)
      .union(evidenceAndNoteTriples)
      .union(markerTriples).union(summaryEquivTriples)
      .union(accEquivTriples).union(strainDeclTriples)
      .union(strainEquivTriples).union(strainViewTriples)
      .union(strainGenotypeTriples).union(genoSummaryTriples)
      .union(locTriples)
      .toDF().dropDuplicates("s", "p", "o", "lit", "dt")
  }

  override def testIds: Seq[String] = Seq("MGI:G4")
}

/** Embedded-Derby stand-in for the remote MGI Postgres, seeded
  * deterministically from the TPC-H parquet tables (fixed arithmetic on
  * the keys, reproduced 1:1 by the p04 DuckDB oracle). Seeding happens
  * once per (JVM, data dir) — repeated reads, bench retries, and the
  * correctness harness all hit the already-populated database.
  */
object MgiDb {

  private val seeded = scala.collection.concurrent.TrieMap[String, JdbcConf]()

  /** Wall nanoseconds spent SEEDING the embedded stand-in since the last
    * drain. Seeding is harness scaffolding for the missing network
    * database, not engine work — graft.Bench drains this per query so
    * the reported p04 seconds are engine-only (the production path scans
    * a database that already exists). */
  @volatile private var seedNanos = 0L
  def drainSeedNanos(): Long = { val v = seedNanos; seedNanos = 0L; v }

  def conf(spark: SparkSession, dataDir: String): JdbcConf =
    seeded.getOrElseUpdate(dataDir, synchronized {
      val t0 = System.nanoTime()
      val c = seed(spark, dataDir)
      // bill seed time only on SUCCESS: a failed seed's wall time would
      // otherwise sit in the accumulator and be drained by whichever
      // query runs next in Bench, misattributing harness failure time
      seedNanos += System.nanoTime() - t0
      c
    })

  // the path carries a schema version: adding a view must not collide
  // with a database persisted by an older build under the same dataDir
  private def dbPath(dataDir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_mgi_derby_v3/" +
      Digest.md5IdScala(dataDir) + "/db"

  private def seed(spark: SparkSession, dataDir: String): JdbcConf = {
    if (sys.props.get("derby.system.home").isEmpty)
      System.setProperty("derby.system.home", sys.props("java.io.tmpdir"))
    val path = dbPath(dataDir)
    val url = s"jdbc:derby:$path;create=true"
    def hasTable(c: java.sql.Connection, name: String): Boolean = {
      val m = c.getMetaData.getTables(null, null, name, null)
      try m.next() finally m.close()
    }
    var conn = DriverManager.getConnection(url)
    // SEED_COMPLETE is created LAST: a seed that failed mid-way leaves
    // tables without the marker, and such residue must be rebuilt, not
    // trusted — a later run would otherwise see data-less views and
    // "succeed" on an empty database.
    if (!hasTable(conn, "SEED_COMPLETE") &&
        hasTable(conn, "GXD_GENOTYPE_VIEW")) {
      conn.close()
      try { DriverManager.getConnection(s"jdbc:derby:$path;shutdown=true"); () }
      catch { case _: java.sql.SQLException => () } // shutdown reports via SQLException
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      val root = new java.io.File(path)
      rm(root)
      // a lingering handle can make the delete silently partial; booting
      // Derby with create=true over half-deleted state surfaces as an
      // opaque boot error later — fail with a named cause instead
      require(!root.exists(),
        s"MGI fixture: stale seed residue at $path could not be removed; " +
          "close other connections to the Derby directory and retry")
      conn = DriverManager.getConnection(url)
    }
    try {
      if (!hasTable(conn, "SEED_COMPLETE")) {
        val st = conn.createStatement()
        st.execute("CREATE TABLE gxd_genotype_view (genotype_key INT NOT NULL, strain_key INT, strain VARCHAR(64), mgiid VARCHAR(32))")
        st.execute("CREATE TABLE all_summary_view (object_key INT NOT NULL, preferred INT, mgiid VARCHAR(32), description VARCHAR(128), short_description VARCHAR(64))")
        st.execute("CREATE TABLE gxd_allelepair_view (allelepair_key INT NOT NULL, genotype_key INT, allele_key_1 INT, allele_key_2 INT, allele1 VARCHAR(64), allele2 VARCHAR(64), allelestate VARCHAR(32))")
        st.execute("CREATE TABLE bib_acc_view (accid VARCHAR(64), prefixpart VARCHAR(8), numericpart INT, object_key INT, logicaldb VARCHAR(32), logicaldb_key INT)")
        st.execute("CREATE TABLE mrk_acc_view (accid VARCHAR(32), prefixpart VARCHAR(8), object_key INT, preferred INT, logicaldb_key INT, organism_key INT)")
        st.execute("CREATE TABLE mrk_marker_view (marker_key INT, organism_key INT, marker_status_key INT, symbol VARCHAR(32), name VARCHAR(64), latin_name VARCHAR(32), marker_type VARCHAR(32))")
        st.execute("CREATE TABLE mrk_summary_view (accid VARCHAR(32), logicaldb_key INT, object_key INT, preferred INT, mgiid VARCHAR(32), subtype VARCHAR(32))")
        st.execute("CREATE TABLE mrk_location_cache (marker_key INT, organism_key INT, chromosome VARCHAR(8), startcoordinate VARCHAR(16), endcoordinate VARCHAR(16), strand VARCHAR(8), version VARCHAR(16))")
        st.execute("CREATE TABLE gxd_genotype_summary_view (object_key INT, preferred INT, mgiid VARCHAR(32), subtype VARCHAR(32), short_description VARCHAR(64))")
        st.execute("CREATE TABLE prb_strain_view (strain_key INT, strain VARCHAR(64), species VARCHAR(64))")
        st.execute("CREATE TABLE prb_strain_acc_view (accid VARCHAR(32), prefixpart VARCHAR(8), logicaldb_key INT, object_key INT, preferred INT)")
        st.execute("CREATE TABLE prb_strain_genotype_view (strain_key INT, genotype_key INT)")
        st.execute("CREATE TABLE all_allele_view (allele_key INT, marker_key INT, strain_key INT, symbol VARCHAR(80), name VARCHAR(64), iswildtype VARCHAR(2))")
        st.execute("CREATE TABLE all_allele_mutation_view (allele_key INT, mutation VARCHAR(64))")
        st.execute("CREATE TABLE voc_annot_view (annot_key INT, annottype VARCHAR(64), object_key INT, term_key INT, qualifier_key INT, qualifier VARCHAR(16), accid VARCHAR(32))")
        st.execute("CREATE TABLE evidence_view (annotevidence_key INT, annot_key INT, evidencecode VARCHAR(8), jnumid VARCHAR(16), term VARCHAR(32), value VARCHAR(8))")
        st.execute("CREATE TABLE mgi_note_vocevidence_view (object_key INT, note VARCHAR(256))")
        st.close()

        import spark.implicits._
        // genotypes ← customer (every 4th key): internal key, strain
        // key, strain name, public MGI id
        val geno = Tables.customer(spark, dataDir)
          .filter(col("c_custkey") % 4 === 0)
          .select(col("c_custkey").cast("int"), col("c_nationkey").cast("int"))
          .as[(Int, Int)].collect()
        batch(conn, "INSERT INTO gxd_genotype_view VALUES (?,?,?,?)", geno) {
          case (ps, (ck, nk)) =>
            ps.setInt(1, ck); ps.setInt(2, nk)
            ps.setString(3, s"strain $nk"); ps.setString(4, s"MGI:G$ck")
        }
        // alleles ← part (every 2nd key; every 10th is non-preferred —
        // the duplicate-id shape the preferred=1 filter exists for)
        val alleles = Tables.part(spark, dataDir)
          .filter(col("p_partkey") % 2 === 0)
          .select(col("p_partkey").cast("int"), col("p_name"), col("p_type"))
          .as[(Int, String, String)].collect()
        batch(conn, "INSERT INTO all_summary_view VALUES (?,?,?,?,?)", alleles) {
          case (ps, (pk, name, ptype)) =>
            ps.setInt(1, pk); ps.setInt(2, if (pk % 10 == 0) 0 else 1)
            ps.setString(3, s"MGI:A$pk"); ps.setString(4, ptype)
            ps.setString(5, name)
        }
        // allele pairs ← orders (every 10th key): allele keys derived
        // from the order key land inside — and partially miss — the
        // allele dim; 'O'-status orders carry no second allele
        val pairs = Tables.orders(spark, dataDir)
          .filter(col("o_orderkey") % 10 === 0)
          .select(col("o_orderkey"), col("o_custkey").cast("int"),
            col("o_orderstatus"), substring(col("o_orderpriority"), 1, 1))
          .as[(Long, Int, String, String)].collect()
        batch(conn, "INSERT INTO gxd_allelepair_view VALUES (?,?,?,?,?,?,?)", pairs) {
          case (ps, (ok, ck, status, prio)) =>
            val n = ok / 10
            val k1 = (n % 2000).toInt
            ps.setInt(1, ok.toInt); ps.setInt(2, ck); ps.setInt(3, k1)
            if (status == "O") {
              ps.setNull(4, java.sql.Types.INTEGER); ps.setString(6, "")
            } else {
              val k2 = ((n * 7 + 2) % 2000).toInt
              ps.setInt(4, k2); ps.setString(6, s"a<$k2>")
            }
            ps.setString(5, s"a<$k1>")
            ps.setString(7, prio match {
              case "1" => "Homozygous"
              case "2" => "Heterozygous"
              case "3" => "Hemizygous X-linked"
              case "4" => "Indeterminate"
              case _   => "Hemizygous Insertion"
            })
        }
        // publications ← supplier: every key gets a J number and an MGI
        // id; two of three get a PubMed id
        val pubs = Tables.supplier(spark, dataDir)
          .select(col("s_suppkey").cast("int")).as[Int].collect()
        val bibRows = pubs.flatMap { k =>
          Seq((s"J:$k", "J:", k, k, "MGI", 1)) ++
            (if (k % 3 != 0) Seq(((k * 91).toString, "", k * 91, k, "PubMed", 29)) else Nil) ++
            Seq((s"MGI:P$k", "MGI:", k, k, "MGI", 1))
        }
        batch(conn, "INSERT INTO bib_acc_view VALUES (?,?,?,?,?,?)", bibRows) {
          case (ps, (accid, prefix, num, ok, db, dbKey)) =>
            ps.setString(1, accid); ps.setString(2, prefix)
            ps.setInt(3, num); ps.setInt(4, ok)
            ps.setString(5, db); ps.setInt(6, dbKey)
        }
        // markers ← part (odd keys; every 9th non-preferred so some
        // marker-key lookups miss, the skip path at MGI.py:829-835)
        val markers = Tables.part(spark, dataDir)
          .filter(col("p_partkey") % 2 === 1)
          .select(col("p_partkey").cast("int")).as[Int].collect()
        // primary MGI rows (ldb 1, mouse) + equivalence accessions:
        // NCBI (55) on pk%4==1, ENSEMBL (60) on pk%4==3, a non-MGI
        // logicaldb-1 accession on pk%8==5 (the raw-accid branch), and
        // a non-mouse row on pk%16==9 (skipped by the organism filter)
        val accRows = markers.flatMap { pk =>
          Seq((s"MGI:M$pk", "MGI:", pk, if (pk % 9 == 0) 0 else 1, 1, 1)) ++
            (if (pk % 4 == 1)
               Seq(((pk * 3 + 2).toString, "", pk, 1, 55, 1)) else Nil) ++
            (if (pk % 4 == 3)
               Seq((s"ENSMUSG$pk", "", pk, 1, 60, 1)) else Nil) ++
            (if (pk % 8 == 5)
               Seq((s"XX:$pk", "XX:", pk, 1, 1, 1)) else Nil) ++
            (if (pk % 16 == 9)
               Seq((s"YY$pk", "", pk, 1, 55, 2)) else Nil)
        }
        batch(conn, "INSERT INTO mrk_acc_view VALUES (?,?,?,?,?,?)", accRows) {
          case (ps, (accid, prefix, pk, pref, ldb, org)) =>
            ps.setString(1, accid); ps.setString(2, prefix)
            ps.setInt(3, pk); ps.setInt(4, pref)
            ps.setInt(5, ldb); ps.setInt(6, org)
        }
        // marker dictionary ← odd part keys aligned with mrk_acc_view:
        // every 11th foreign-organism, every 13th withdrawn, six marker
        // types cycling, latin name unknown every 7th
        val markerTypes = Seq("Gene", "Pseudogene", "DNA Segment",
          "Cytogenetic Marker", "BAC/YAC end", "Transgene")
        batch(conn, "INSERT INTO mrk_marker_view VALUES (?,?,?,?,?,?,?)",
          markers) {
          case (ps, pk) =>
            ps.setInt(1, pk)
            ps.setInt(2, if (pk % 11 == 3) 2 else 1)
            ps.setInt(3, if (pk % 13 == 5) 2 else 1)
            ps.setString(4, s"mrk$pk"); ps.setString(5, s"marker $pk")
            ps.setString(6, if (pk % 7 == 0) "Not Specified"
                            else "Mus musculus")
            ps.setString(7, markerTypes(((pk - 1) / 2) % 6))
        }
        // marker summary ← one accession per odd key: ENSEMBL / NCBI /
        // the self-row (accid == mgiid, skipped); every 9th non-preferred
        batch(conn, "INSERT INTO mrk_summary_view VALUES (?,?,?,?,?,?)",
          markers) {
          case (ps, pk) =>
            val (accid, ldb) = pk % 3 match {
              case 0 => (s"ENSMUSG0$pk", 60)
              case 1 => ((pk * 7 + 1).toString, 55)
              case _ => (s"MGI:M$pk", 1)
            }
            ps.setString(1, accid); ps.setInt(2, ldb); ps.setInt(3, pk)
            ps.setInt(4, if (pk % 9 == 0) 0 else 1)
            ps.setString(5, s"MGI:M$pk")
            ps.setString(6, markerTypes(((pk - 1) / 2) % 6))
        }
        // marker locations ← odd keys: every 11th foreign, every 23rd
        // unlocalized ('UN'), every 17th start-less (fuzzy begin), every
        // 5th carrying an assembly version (build chromosome instance)
        batch(conn, "INSERT INTO mrk_location_cache VALUES (?,?,?,?,?,?,?)",
          markers) {
          case (ps, pk) =>
            ps.setInt(1, pk)
            ps.setInt(2, if (pk % 11 == 3) 2 else 1)
            ps.setString(3, if (pk % 23 == 0) "UN"
                            else ((pk % 19) + 1).toString)
            ps.setString(4, if (pk % 17 == 0) "(null)" else s"${pk * 1000}.0")
            ps.setString(5, s"${pk * 1000 + 500}.0")
            ps.setString(6, Seq("+", "-", "(null)")(((pk - 1) / 2) % 3))
            ps.setString(7, if (pk % 5 == 0) "GRCm38" else "(null)")
        }
        // alleles-with-context ← part (even keys, aligned with
        // all_summary_view): marker every 2 of 3, strain keys straddling
        // the genotype tier's nation-derived strain range, symbol shapes
        // exercising the Tg( / angle-bracket / '+' label reformats
        val alleleCtx = Tables.part(spark, dataDir)
          .filter(col("p_partkey") % 2 === 0)
          .select(col("p_partkey").cast("int"), col("p_name"), col("p_type"))
          .as[(Int, String, String)].collect()
        batch(conn, "INSERT INTO all_allele_view VALUES (?,?,?,?,?,?)",
          alleleCtx) {
          case (ps, (pk, name, ptype)) =>
            ps.setInt(1, pk)
            if (pk % 3 == 0) ps.setNull(2, java.sql.Types.INTEGER)
            else ps.setInt(2, pk + 1)
            ps.setInt(3, pk % 30)
            ps.setString(4, pk % 5 match {
              case 0 => s"Tg($name)"
              case 1 => s"${name.take(8)}<$pk>"
              case 2 => "+"
              case _ => name
            })
            ps.setString(5, ptype)
            ps.setString(6, if (pk % 7 == 0) "1" else "0")
        }
        batch(conn, "INSERT INTO all_allele_mutation_view VALUES (?,?)",
          alleleCtx) {
          case (ps, (pk, _, _)) =>
            ps.setInt(1, pk)
            ps.setString(2, Seq("Deletion", "Insertion", "Duplication",
              "Nucleotide substitutions", "Intragenic deletion",
              "Frobnication")((pk % 6)))
        }
        // annotations ← orders: five annotation types (one ignored),
        // 'norm' + NOT-qualifier skip rows, object keys that partially
        // miss each idhash
        val annotRows = Tables.orders(spark, dataDir)
          .select(col("o_orderkey").cast("int"), col("o_custkey").cast("int"))
          .as[(Int, Int)].collect()
        batch(conn, "INSERT INTO voc_annot_view VALUES (?,?,?,?,?,?,?)",
          annotRows) {
          case (ps, (ok, ck)) =>
            ps.setInt(1, ok)
            val atype = Seq("Mammalian Phenotype/Genotype", "DO/Genotype",
              "MCV/Marker", "DO/Allele", "Protein/Marker")(ok % 5)
            ps.setString(2, atype)
            ps.setInt(3, atype match {
              case "MCV/Marker" => 2 * (ok % 1000) + 1
              case "DO/Allele"  => 2 * (ok % 1000) + 2
              case _            => ck - (ck % 4)
            })
            ps.setInt(4, Seq(6238160, 6238161, 6238162, 6238170, 7313348,
              999999)(ok % 6))
            ps.setInt(5, if (ok % 20 == 1) 1614157 else 0)
            ps.setString(6, if (ok % 17 == 0) "norm" else "")
            ps.setString(7, atype match {
              case "Mammalian Phenotype/Genotype" => s"MP:${ok % 800}"
              case "MCV/Marker" => s"MCV:${ok % 6}"
              case _ => s"DOID:${ok % 400}"
            })
        }
        // evidence ← even order keys; notes ← every 6th, chained through
        // the evidence key (annotevidence_key = annot_key + 1)
        val evRows = annotRows.filter(_._1 % 2 == 0)
        batch(conn, "INSERT INTO evidence_view VALUES (?,?,?,?,?,?)",
          evRows) {
          case (ps, (ok, _)) =>
            ps.setInt(1, ok + 1); ps.setInt(2, ok)
            ps.setString(3, Seq("EXP", "IDA", "TAS", "IGI")(ok % 4))
            ps.setString(4, s"J:${ok % 97}")
            ps.setString(5, if (ok % 4 == 0) "MP-Sex-Specificity"
                            else "external ref")
            ps.setString(6, Seq("M", "F", "NA")(ok % 3))
        }
        batch(conn, "INSERT INTO mgi_note_vocevidence_view VALUES (?,?)",
          evRows.filter(_._1 % 6 == 0)) {
          case (ps, (ok, _)) =>
            ps.setInt(1, ok + 1)
            ps.setString(2, s"phenotype note $ok")
        }
        // genotype summary ← the genotype keys (customer %4): one VSLC
        // row each (comma-bearing every 12th — the comma→slash rule), a
        // second VSLC every 8th, non-preferred every 16th-from-4
        val summaryRows = geno.flatMap { case (ck, _) =>
          val pref = if (ck % 16 == 4) 0 else 1
          val short1 = if (ck % 12 == 0) s"a<$ck>,+" else s"a<$ck>/+"
          Seq((ck, pref, short1)) ++
            (if (ck % 8 == 0) Seq((ck, 1, s"b<$ck>/+")) else Nil)
        }
        batch(conn,
          "INSERT INTO gxd_genotype_summary_view VALUES (?,?,?,?,?)",
          summaryRows) {
          case (ps, (ck, pref, short)) =>
            ps.setInt(1, ck); ps.setInt(2, pref)
            ps.setString(3, s"MGI:G$ck")
            ps.setString(4, s"B6.${ck % 9}")
            ps.setString(5, short)
        }
        // strain registry ← the nation-key strain range (0..24): labels
        // + species cycling the resolve fallbacks; the MGI accession row
        // is absent for every 10th-from-7 key (idhash-miss path), and
        // each key carries one external stock-center accession
        val strainSpecies = Seq("laboratory mouse", "M. m. domesticus",
          "Not Specified", "M. m. domesticus Weird", "Cricetus sp.")
        val strainKeys = (0 until 25).toSeq
        batch(conn, "INSERT INTO prb_strain_view VALUES (?,?,?)",
          strainKeys) {
          case (ps, k) =>
            ps.setInt(1, k); ps.setString(2, s"strain $k")
            ps.setString(3, strainSpecies(k % 5))
        }
        val strainAccRows = strainKeys.flatMap { k =>
          (if (k % 10 != 7)
             Seq((s"MGI:S$k", "MGI:", 1, k, 1)) else Nil) ++
            Seq(k % 9 match {
              case 0 => (s"000$k", "", 22, k, 1)
              case 1 => (s"MMRRC:0$k", "", 38, k, 1)
              case 2 => (s"EM:0$k", "", 37, k, 1)
              case 3 => (s"AB$k", "", 90, k, 1)
              case 4 => (s"OR$k", "", 40, k, 1)
              case 5 => (s"NC$k", "", 54, k, 1)
              case 6 => (s"MGI:X$k", "MGI:", 56, k, 1)
              case 7 => (s"00$k", "", 70, k, 1)
              case _ => (s"MU`$k", "", 87, k, 1)
            }) ++
            (if (k % 11 == 3) Seq((s"ZZ$k", "", 22, k, 0)) else Nil)
        }
        batch(conn, "INSERT INTO prb_strain_acc_view VALUES (?,?,?,?,?)",
          strainAccRows) {
          case (ps, (accid, prefix, ldb, k, pref)) =>
            ps.setString(1, accid); ps.setString(2, prefix)
            ps.setInt(3, ldb); ps.setInt(4, k); ps.setInt(5, pref)
        }
        // strain⇄genotype bridge ← every 3rd genotype key; every 24th
        // points at an unknown strain, every 36th at an unknown genotype
        // (the internal-identifier fallback paths)
        val sgRows = geno.filter(_._1 % 3 == 0).map { case (ck, nk) =>
          (if (ck % 24 == 0) nk + 100 else nk,
           if (ck % 36 == 0) ck + 2 else ck)
        }
        batch(conn, "INSERT INTO prb_strain_genotype_view VALUES (?,?)",
          sgRows) {
          case (ps, (sk, gk)) => ps.setInt(1, sk); ps.setInt(2, gk)
        }
        // marker LAST: its presence certifies a fully-seeded database
        val fin = conn.createStatement()
        fin.execute("CREATE TABLE seed_complete (ok INT)")
        fin.close()
      }
    } finally conn.close()
    JdbcConf(url)
  }

  private def batch[T](conn: java.sql.Connection, sql: String, rows: Iterable[T])(
      set: (java.sql.PreparedStatement, T) => Unit): Unit = {
    val ps = conn.prepareStatement(sql)
    try {
      var n = 0
      rows.foreach { r =>
        set(ps, r); ps.addBatch(); n += 1
        if (n % 5000 == 0) ps.executeBatch()
      }
      ps.executeBatch()
    } finally ps.close()
  }
}
