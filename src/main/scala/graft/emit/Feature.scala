package graft.emit

import graft.core.{Digest, Triple, Vocab}

/** FALDO genomic-interval patterns (dipper/models/GenomicFeature.py:54-444).
  *
  * A feature points at a region bnode; the region has begin/end position
  * nodes, each typed (exact position + strand type) with an integer
  * `faldo:position` literal and a `faldo:reference`. All bnode ids are
  * content digests — deterministic across partitions (SURVEY §7 risk item).
  */
object Feature {

  /** Strand symbol → FALDO position type (GenomicFeature.py:109-125). */
  def strandType(strand: String): String = strand match {
    case "+" => Vocab.faldoPlusStrand
    case "-" => Vocab.faldoMinusStrand
    case "." | null | "" => Vocab.faldoBothStrand
    case _ => Vocab.faldoBothStrand
  }

  /** Full feature→region→positions pattern (addFeatureToGraph).
    * `digest` defaults to the reference-faithful sha1 id; oracle-checked
    * pipelines may pass [[Digest.md5IdScala]]. */
  def featureTriples(id: String, label: String, featureType: String,
                     reference: String, start: Long, end: Long,
                     strand: String = ".",
                     digest: String => String = Digest.sha1IdScala): Seq[Triple] = {
    val region = "_:" + digest(s"region+$id+$start+$end+$reference")
    val begin = "_:" + digest(s"pos+$region+begin+$start")
    val endN = "_:" + digest(s"pos+$region+end+$end")
    val st = strandType(strand)
    Model.addType(id, featureType) ++
      Model.addLabel(id, label) ++
      Seq(
        Triple.res(id, Vocab.faldoLocation, region),
        Triple.res(region, Vocab.a, Vocab.faldoRegion),
        Triple.res(region, Vocab.faldoBegin, begin),
        Triple.res(region, Vocab.faldoEnd, endN)) ++
      positionTriples(begin, start, reference, st) ++
      positionTriples(endN, end, reference, st)
  }

  /** One position node (addPositionToGraph): type + strand type +
    * integer position literal + reference. */
  def positionTriples(node: String, coordinate: Long, reference: String,
                      strandT: String): Seq[Triple] =
    Seq(
      Triple.res(node, Vocab.a, Vocab.faldoExactPosition),
      Triple.res(node, Vocab.a, strandT),
      Triple.int(node, Vocab.faldoPosition, coordinate),
      Triple.res(node, Vocab.faldoReference, reference))

  /** Reciprocal containment pair (addSubsequenceOfFeature,
    * GenomicFeature.py:347-374). */
  def subsequenceOf(child: String, parent: String): Seq[Triple] =
    Seq(
      Triple.res(child, Vocab.isSubsequenceOf, parent),
      Triple.res(parent, Vocab.hasSubsequence, child))

  def addTaxonToFeature(feature: String, taxon: String): Seq[Triple] =
    Model.addTriple(feature, Vocab.inTaxon, taxon)

  /** Chromosome id/label minting (makeChromID/makeChromLabel) with the
    * `chr` prefix scrub of GenomicFeature.py:402-434. */
  def makeChromId(chrom: String, reference: String): String = {
    val clean = chrom.replaceFirst("(?i)^chr", "")
    s"$reference#chr$clean"
  }

  def makeChromLabel(chrom: String, build: String): String = {
    val clean = chrom.replaceFirst("(?i)^chr", "")
    s"chr$clean ($build)"
  }
}
