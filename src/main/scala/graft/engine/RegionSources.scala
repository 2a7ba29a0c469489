package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.{Digest, Triple, Vocab}
import graft.emit.{ColumnEmit, Feature}
import graft.operators.RangeJoin

/** The Bgee-shape ingest: per-gene top-k anatomy expression calls by
  * rank score (Bgee.py:196-200 — lower rank is stronger, ties broken on
  * the anatomy id), reified with the score. The rank-limit window
  * compiles to WindowGroupLimit, so each gene's group is cut map-side
  * before the sort — the property that lets the ingest run over a
  * full-corpus expression matrix. Shares its plan with the p02 oracle
  * query, which calls straight through this source.
  */
object BgeeSource extends GraftSource {
  val name = "bgee"

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] =
    Map("expression" -> Tables.lineitem(spark, dataDir))

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    val ranked = in("expression")
      .select(
        concat(lit("ENSEMBL:"), col("l_suppkey").cast("string")).as("gene"),
        concat(lit("UBERON:"), col("l_partkey").cast("string")).as("anat"),
        col("l_extendedprice").as("score"))
      .groupBy("gene", "anat").agg(min("score").as("score"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("gene").orderBy(col("score").asc, col("anat").asc)))
      .filter(col("rk") <= 3).drop("rk")
    ColumnEmit.assocReified(ranked, "EX:bgee",
      col("gene"), lit("RO:0002206"), col("anat"),
      source = Some("EX:bgee"), score = Some(col("score")))
  }

  override def testIds: Seq[String] = Seq("ENSEMBL:1")
}

/** The UCSCBands/Monochrom-shape ingest: cytoband rows → the band
  * partonomy (UCSCBands.py:271-544, Monochrom.py:348-368). Each band
  * prefix (1p36 ⊂ 1p3 ⊂ 1p ⊂ chromosome) becomes a chromosome-band
  * feature whose FALDO extent is the min-start/max-end of everything it
  * contains — computed as ONE explode + aggregation over the leaf rows,
  * where the reference walks a python interval tree per chromosome.
  * Containment edges are the reciprocal subsequence pair.
  */
object UcscBandsSource extends GraftSource {
  val name = "ucsc_bands"

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] =
    Map("cytobands" -> Tables.part(spark, dataDir))

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    import spark.implicits._
    in("cytobands")
      .filter(col("p_partkey") >= 10)
      .select(col("p_partkey").cast("string").as("code"),
        (col("p_size") * 1000).cast("long").as("s"),
        (col("p_size") * 1000 + 999).cast("long").as("e"))
      .select(explode(expr(
        "transform(sequence(1, length(code) - 1), n -> substring(code, 1, n))")).as("band"),
        col("s"), col("e"))
      .groupBy("band")
      .agg(min("s").as("lo"), max("e").as("hi"))
      .as[(String, Long, Long)]
      .flatMap { case (band, lo, hi) =>
        val id = s"EX:band$band"
        val parent =
          if (band.length > 1) s"EX:band${band.dropRight(1)}" else "EX:chr1"
        Feature.featureTriples(id, s"band $band", "SO:0000341", "EX:chr1",
          lo, hi, ".", Digest.md5IdScala) ++
          Feature.subsequenceOf(id, parent)
      }.toDF()
  }

  override def testIds: Seq[String] = Seq("EX:band1")
}

/** The UDP-shape ingest: patient variant calls located inside gene
  * regions via the range containment join (UDP.py:330-447 assigns each
  * variant to the genes whose span contains its position). The join is
  * the bucketed [[RangeJoin.pointInInterval]] — never |points|×|genes|
  * — and the emission is map-side over the matches; the set-dedup
  * collapses the per-match repetition of variant/gene typing.
  */
object UdpSource extends GraftSource {
  val name = "udp_variants"

  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame] =
    Map("variant_calls" -> Tables.lineitem(spark, dataDir),
      "gene_regions" -> Tables.supplier(spark, dataDir))

  def transform(spark: SparkSession, in: Map[String, DataFrame]): DataFrame = {
    import spark.implicits._
    val points = in("variant_calls").select(
      concat(lit("EX:var"), col("l_orderkey"), lit("_"), col("l_linenumber")).as("vid"),
      col("l_partkey").as("pos"))
    val genes = in("gene_regions").select(
      concat(lit("EX:g"), col("s_suppkey")).as("gene"),
      (col("s_suppkey") * 20).cast("long").as("lo"),
      (col("s_suppkey") * 20 + 50).cast("long").as("hi"))
    RangeJoin.pointInInterval(points, genes, "pos", "lo", "hi", bucketWidth = 64)
      .select(col("vid"), col("gene"))
      .as[(String, String)]
      .flatMap { case (vid, gene) =>
        Seq(
          Triple.res(vid, Vocab.a, Vocab.sequenceAlteration),
          Triple.res(vid, Vocab.hasAffectedLocus, gene),
          Triple.res(gene, Vocab.a, Vocab.gene))
      }.toDF().dropDuplicates("s", "p", "o", "lit", "dt")
  }

  override def testIds: Seq[String] = Seq("EX:g1")
}
