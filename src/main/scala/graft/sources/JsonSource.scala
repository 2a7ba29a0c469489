package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** REST/JSON-API payload scans + text scrubbing pre-passes.
  *
  * The reference's API-backed sources (OMIM.py:188-254, MyChem.py,
  * DipperUtil eutils) batch keyed requests on the driver and parse JSON
  * per record. The engine keeps the fetch driver-side (cache to files;
  * never network from executors — SURVEY §7) and reads the landed payload
  * files as a distributed JSON scan with an explicit schema.
  */
object JsonSource {

  /** Landed API payloads (JSON-lines or JSON array files) → DataFrame. */
  def read(spark: SparkSession, path: String, schema: Option[StructType] = None,
           multiLine: Boolean = false): DataFrame = {
    var r = spark.read.option("multiLine", multiLine.toString)
    schema.foreach(s => r = r.schema(s))
    r.json(path)
  }

  /** Control-character scrub (OMIA.py:178-210 whole-file rewrite;
    * DipperUtil.py:35-45 \r-strip) as a column transform on a text scan —
    * map-only, no driver rewrite pass. */
  def scrubControlChars(c: Column): Column =
    regexp_replace(c, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", "")

  def stripCarriageReturns(c: Column): Column = regexp_replace(c, "\r", "")

  /** Scrubbed text scan: read raw lines, clean, then hand to a parser. */
  def scrubbedText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(scrubControlChars(stripCarriageReturns(col("value"))).as("value"))
}
