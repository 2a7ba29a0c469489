package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{Digest, TranslationTable, Vocab}
import graft.emit.{Association, Model}
import graft.sources.OrphanetXml

/** Orphanet-shape nested-XML ingest (dipper/sources/Orphanet.py — the
  * JDBOR disease-gene product): each `DisorderGeneAssociation` subtree
  * becomes a gene→disorder association whose relation comes from the
  * association TYPE through the local table (py:185-196) and whose
  * evidence ECO comes from the association STATUS (py:200-204). The
  * gene's external references form an identifier clique: the preferred
  * representative is chosen in HGNC → ENSEMBL → SwissProt → OMIM order
  * (py:152-166, falling back to the first remaining prefix), the rest
  * attach as equivalent classes (py:168-180), and gene synonyms hang off
  * the representative (py:181-186). A disorder with no associations
  * still emits its class (py:103-110).
  *
  * Deviations from the reference, both documented here: (a) an
  * association whose gene has NO external references is skipped alone —
  * the reference `break`s and silently drops the disorder's REMAINING
  * associations too (py:147-149); (b) clique iteration uses first-seen
  * prefix order with last-value-wins overwrite, the Python dict
  * semantics of py:141-145.
  *
  * Scale shape: the file list parallelizes across executors, each file
  * StAX-streams in constant memory, and the emission is one flatMap —
  * no shuffle before the graph set-dedup.
  */
object OrphanetSource extends GraftSource {
  val name = "orphanet"

  private lazy val tt = TranslationTable.forSource("orphanet")

  /** Source-name → curie-prefix case fixes (the prefix-rewrite half of
    * the reference's orphanet localtt). */
  private val prefixRewrites = Map("Ensembl" -> "ENSEMBL", "Reactome" -> "REACT")

  private val preferred = Seq("HGNC", "ENSEMBL", "SwissProt", "OMIM")

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] = Map(
    "disease_gene" -> OrphanetXml.read(spark, Seq(s"$dataDir/en_product6.xml")))

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    import spark.implicits._
    val rewrites = prefixRewrites
    val prefer = preferred
    val table = tt
    in("disease_gene")
      .as[OrphanetXml.OrphaRow]
      .flatMap { r =>
        val disorder = "ORPHA:" + r.orpha
        val disorderClass = Model.classTriples(disorder, r.disorderName)
        if (r.assocType == null) disorderClass
        else {
          // identifier clique: first-seen prefix order, last value wins
          val clique0 = r.refSources.zip(r.refIds).map { case (src, id) =>
            (rewrites.getOrElse(src, src), id)
          }
          val order = clique0.map(_._1).distinct
          val byPrefix = clique0.toMap // last occurrence wins, like dict
          val geneCurie = prefer.find(byPrefix.contains)
            .orElse(order.headOption)
            .map(p => p + ":" + byPrefix(p))
          geneCurie match {
            case None => disorderClass // no gene at all (py:147-149)
            case Some(gene) =>
              val chosenPrefix = gene.takeWhile(_ != ':')
              val equivalents = order.filterNot(_ == chosenPrefix).flatMap { p =>
                val dbxref = p + ":" + byPrefix(p)
                if (dbxref == gene) Nil
                else Model.addType(dbxref, Vocab.owlClass) ++
                  Model.addEquivalentClass(gene, dbxref)
              }
              val rel = table.resolve(r.assocType, mandatory = false)
              val eco = table.resolve(r.status, mandatory = false)
              disorderClass ++
                Model.addType(gene, Vocab.owlClass) ++
                equivalents ++
                r.synonyms.flatMap(Model.addSynonym(gene, _)) ++
                Association("EX:orphanet", gene, rel, disorder,
                  evidence = Seq(eco)).triples
          }
        }
      }.toDF()
  }

  override def testIds: Seq[String] = Seq("ORPHA:166024")
}
