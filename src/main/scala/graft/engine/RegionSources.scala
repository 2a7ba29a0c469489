package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    // keep the join/dedup keys NUMERIC through the shuffle (okey/lnum/
    // skey longs, not the concat'd display ids — the r2 hash-to-long
    // lesson); the id strings are built after each branch's dedup
    val points = in("variant_calls").select(
      col("l_orderkey").as("okey"), col("l_linenumber").as("lnum"),
      col("l_partkey").as("pos"))
    val genes = in("gene_regions").select(
      col("s_suppkey").as("skey"),
      (col("s_suppkey") * 20).cast("long").as("lo"),
      (col("s_suppkey") * 20 + 50).cast("long").as("hi"))
    val vid = concat(lit("EX:var"), col("okey"), lit("_"), col("lnum"))
    val gene = concat(lit("EX:g"), col("skey"))
    // Emission WITHOUT a global graph dedup: the naive shape
    // (explode 3 triples per match, then distinct) shuffles 3× the match
    // relation in wide 3-string rows — measured 8 s of a 9 s total at
    // sf0.1, and the one piece of the plan that scales with matches ×
    // triples-per-match at 100 TB. Instead each triple family dedups on
    // its OWN minimal key, and the branches are predicate-disjoint so
    // their union needs no further dedup:
    //   pairs    (vid GENO:0000418 gene) — distinct over the 2-column
    //            match relation (vid is not guaranteed unique upstream);
    //   vid type (vid a SO:0001059)     — left-semi range join (keeps
    //            each point row once, broadcast, zero shuffle), then a
    //            single-column distinct;
    //   gene type (gene a SO:0000704)   — interval-side semi,
    //            |genes|-bounded dedup inside the operator.
    // The two scans per side are pruned-columnar re-reads — cheaper at
    // scale than materializing a matches× intermediate.
    def t(s: Column, p: String, o: Column): DataFrame => DataFrame =
      _.select(s.as("s"), lit(p).as("p"), o.as("o"),
        lit(false).as("lit"), lit(null).cast("string").as("dt"))
    val pairs = t(vid, Vocab.hasAffectedLocus, gene)(
      RangeJoin.pointInInterval(points, genes, "pos", "lo", "hi", bucketWidth = 64)
        .select("okey", "lnum", "skey").distinct())
    val vidTypes = t(vid, Vocab.a, lit(Vocab.sequenceAlteration))(
      RangeJoin.pointsInAnyInterval(points, genes, "pos", "lo", "hi", bucketWidth = 64)
        .select("okey", "lnum").distinct())
    val geneTypes = t(gene, Vocab.a, lit(Vocab.gene))(
      RangeJoin.intervalsWithAnyPoint(genes, points, "pos", "lo", "hi", bucketWidth = 64))
    pairs.unionAll(vidTypes).unionAll(geneTypes)
  }

  override def testIds: Seq[String] = Seq("EX:g1")
}
