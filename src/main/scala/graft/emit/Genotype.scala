package graft.emit

import graft.core.{Triple, Vocab}

/** GENO genotype-partonomy patterns (dipper/models/Genotype.py:36-703).
  *
  * The genotype hierarchy (genotype → background/VSLC → variant loci →
  * alleles → genes) is adjacency-list shaped: every op emits
  * `has_part`/`has_variant_part`-style edges into the same triple
  * relation. Zygosity inference on VSLC assembly follows
  * Genotype.py:280-288 (equal allele ids ⇒ homozygous, one empty ⇒
  * hemizygous, else heterozygous).
  */
object Genotype {

  def addGenotype(id: String, label: String,
                  genoType: String = Vocab.genotype): Seq[Triple] =
    Model.addType(id, genoType) ++ Model.addLabel(id, label)

  def addAllele(id: String, label: String,
                alleleType: String = Vocab.allele): Seq[Triple] =
    Model.addType(id, alleleType) ++ Model.addLabel(id, label)

  def addGene(id: String, label: String,
              geneType: String = Vocab.gene): Seq[Triple] =
    Model.addType(id, geneType) ++ Model.addLabel(id, label)

  def addConstruct(id: String, label: String,
                   constructType: String = "SO:0000804"): Seq[Triple] =
    Model.addType(id, constructType) ++ Model.addLabel(id, label)

  def addDerivesFrom(child: String, parent: String): Seq[Triple] =
    Model.addTriple(child, Vocab.derivesFrom, parent)

  def addSequenceDerivesFrom(child: String, parent: String): Seq[Triple] =
    Model.addTriple(child, Vocab.sequenceDerivesFrom, parent)

  def addAlleleOfGene(allele: String, gene: String): Seq[Triple] =
    Model.addTriple(allele, Vocab.isAlleleOf, gene)

  def addAffectedLocus(allele: String, gene: String): Seq[Triple] =
    Model.addTriple(allele, Vocab.hasAffectedLocus, gene)

  def addGeneProduct(product: String, gene: String): Seq[Triple] =
    Model.addTriple(product, "RO:0002204", gene)

  def addPolypeptide(id: String, label: String,
                     geneProductOf: Option[String] = None): Seq[Triple] =
    Model.addType(id, "SO:0000104") ++ Model.addLabel(id, label) ++
      geneProductOf.toSeq.flatMap(g => addGeneProduct(id, g))

  /** Zygosity inference (Genotype.py:280-288). */
  def inferZygosity(allele1: String, allele2: String): String =
    if (allele1 == allele2) Vocab.homozygous
    else if (allele1 == null || allele1.isEmpty || allele2 == null || allele2.isEmpty)
      Vocab.hemizygous
    else Vocab.heterozygous

  /** addPartsToVSLC: attach both alleles with zygosity (Genotype.py). */
  def addPartsToVslc(vslc: String, allele1: String, allele2: String): Seq[Triple] = {
    val zygosity = inferZygosity(allele1, allele2)
    Model.addType(vslc, Vocab.vslc) ++
      Seq(allele1, allele2).filter(a => a != null && a.nonEmpty)
        .map(a => Triple.res(vslc, Vocab.hasVariantPart, a)) :+
      Triple.res(vslc, Vocab.hasZygosity, zygosity)
  }

  def addVslcToParent(vslc: String, parent: String): Seq[Triple] =
    Model.addTriple(parent, Vocab.hasVariantPart, vslc)

  def addParts(part: String, whole: String,
               rel: String = Vocab.hasPart): Seq[Triple] =
    Model.addTriple(whole, rel, part)

  def addSequenceAlteration(id: String, label: String,
                            saType: String = Vocab.sequenceAlteration): Seq[Triple] =
    Model.addType(id, saType) ++ Model.addLabel(id, label)

  def addGenomicBackground(id: String, label: String): Seq[Triple] =
    Model.addType(id, Vocab.genomicBackground) ++ Model.addLabel(id, label)

  def addGenomicBackgroundToGenotype(background: String, genotype: String): Seq[Triple] =
    Seq(Triple.res(genotype, Vocab.hasReferencePart, background))

  def addTaxon(taxon: String, entity: String): Seq[Triple] =
    Model.addTriple(entity, Vocab.inTaxon, taxon)

  def addGeneTargetingReagent(id: String, label: String,
                              reagentType: String = "SO:0000695",
                              targetedGene: Option[String] = None): Seq[Triple] =
    Model.addType(id, reagentType) ++ Model.addLabel(id, label) ++
      targetedGene.toSeq.map(g => Triple.res(id, "EXP:targets_gene", g))

  def addReagentTargetedGene(reagent: String, gene: String,
                             targetedGene: String): Seq[Triple] =
    Model.addType(targetedGene, "GENO:0000504") ++
      Seq(Triple.res(targetedGene, "GENO:0000639", gene),
          Triple.res(targetedGene, "GENO:0000634", reagent))

  def addMemberOfPopulation(member: String, population: String): Seq[Triple] =
    Model.addTriple(population, Vocab.hasMember, member)

  def addGenome(taxonId: String, taxonLabel: String): Seq[Triple] = {
    val genomeId = s"$taxonId#genome"
    Model.addType(genomeId, Vocab.genome) ++
      Model.addLabel(genomeId, s"$taxonLabel genome")
  }

  def addReferenceGenome(buildId: String, buildLabel: String,
                         taxonId: String): Seq[Triple] =
    Model.addType(buildId, "SO:0001505") ++
      Model.addLabel(buildId, buildLabel) ++
      Model.addTriple(buildId, Vocab.inTaxon, taxonId)

  def addChromosomeClass(chrNum: String, taxonId: String,
                         taxonLabel: String): Seq[Triple] = {
    val id = s"CHR:${taxonId.replace(":", "-")}$chrNum"
    Model.classTriples(id, s"$taxonLabel chromosome $chrNum",
      subClassOf = Some(Vocab.chromosome))
  }

  def addChromosomeInstance(chrNum: String, buildId: String,
                            chrClass: String): Seq[Triple] = {
    val id = s"$buildId#chr$chrNum"
    Model.addType(id, chrClass) ++
      Model.addLabel(id, s"chr$chrNum ($buildId)") ++
      Seq(Triple.res(id, "RO:0002525", buildId))
  }

  /** The allele implied by an explicit zygosity annotation
    * (ZFIN._get_other_allele_by_zygosity, ZFIN.py:2827-2847):
    * homozygous pairs the allele with itself, hemizygous/complex with
    * the `"0"` null-allele sentinel, unknown with `"?"`; heterozygous
    * contributes nothing (the partner arrives on its own row). */
  def otherAlleleByZygosity(allele: String, zygosity: String): Option[String] =
    zygosity match {
      case "homozygous" => Some(allele)
      case "hemizygous" | "complex" => Some("0")
      case "unknown" => Some("?")
      case _ => None
    }

  /** Resolve the second VSLC slot and zygosity class from the first two
    * entries of a locus's parts list (ZFIN.py:1004-1024): no partner →
    * wild-type slot + simple heterozygous; `"?"` → `UN` slot +
    * indeterminate; `"0"` → hemizygous; same allele → homozygous;
    * distinct alleles → compound heterozygous. Returns
    * (slot display id, zygosity term). */
  def resolveSecondSlot(allele1: String,
                        allele2Raw: Option[String]): (String, String) =
    allele2Raw match {
      case None => ("WT", Vocab.simpleHeterozygous)
      case Some("?") => ("UN", Vocab.indeterminate)
      case Some("0") => ("0", Vocab.hemizygous)
      case Some(a) if a == allele1 => (a, Vocab.homozygous)
      case Some(a) => (a, Vocab.compoundHeterozygous)
    }

  /** `gene<allele>` (Genotype.make_variant_locus_label, :658-663). */
  def makeVariantLocusLabel(geneLabel: String, alleleLabel: String): String =
    Option(geneLabel).getOrElse("").trim +
      "<" + Option(alleleLabel).getOrElse("").trim + ">"

  /** Gene-qualified Monarch VSLC label `gene<al1>/gene<al2>`
    * (Genotype.make_vslc_label, :665-687): the reference always renders
    * both slots (a wild-type partner shows as `gene<+>`). */
  def makeVslcLabel(geneLabel: String, allele1Label: String,
                    allele2Label: Option[String]): String = {
    val top = makeVariantLocusLabel(geneLabel, allele1Label)
    val bottom =
      allele2Label.map(makeVariantLocusLabel(geneLabel, _)).getOrElse("")
    top + "/" + bottom
  }

  /** VSLC label synthesis — the simple ungened form kept for emitters
    * whose inputs carry no locus column (see the 3-arg overload for the
    * reference's gene-qualified form). */
  def makeVslcLabel(allele1Label: String, allele2Label: String): String =
    Seq(Option(allele1Label).filter(_.nonEmpty),
        Option(allele2Label).filter(_.nonEmpty))
      .flatten.sorted.mkString("<", "/", ">") match {
        case "<>" => ""
        case s => s
      }
}
