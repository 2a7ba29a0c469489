package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Biomart martservice query scan (reference: dipper/sources/Ensembl.py
  * `_build_biomart_gene_query` :256-291 + `fetch` :111-137).
  *
  * The reference builds a Query XML document (TSV formatter, header,
  * unique rows), urlencodes it as the `query` parameter of
  * `/biomart/martservice?`, lands the TSV response, and scans it. Here
  * the query construction and request-URL assembly are faithful and
  * testable; the transport goes through [[Fetch]] (file:// in this
  * hermetic environment — the landed file is byte-identical to what an
  * HTTP transport would deliver, so the scan side is fully exercised).
  */
object Biomart {

  private def xmlAttrEscape(v: String): String =
    v.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** The reference's query document (Ensembl.py:273-286): one Dataset
    * element with one Attribute per requested column. */
  def buildQuery(dataset: String, attributes: Seq[String],
                 header: Boolean = true, uniqueRows: Boolean = true): String = {
    val attrs = attributes
      .map(a => s"""<Attribute name="${xmlAttrEscape(a)}"/>""").mkString
    s"""<?xml version="1.0" encoding="UTF-8"?><!DOCTYPE Query>""" +
      s"""<Query virtualSchemaName="default" formatter="TSV"""" +
      s""" header="${if (header) 1 else 0}"""" +
      s""" uniqueRows="${if (uniqueRows) 1 else 0}" count="0"""" +
      s""" datasetConfigVersion="0.6">""" +
      s"""<Dataset name="${xmlAttrEscape(dataset)}" interface="default">""" +
      attrs + "</Dataset></Query>"
  }

  /** `<base>/biomart/martservice?query=<urlencoded>` (Ensembl.py:118-122). */
  def requestUrl(baseUrl: String, query: String): String =
    baseUrl.stripSuffix("/") + "/biomart/martservice?query=" +
      java.net.URLEncoder.encode(query, "UTF-8")

  /** Land a martservice response (any transport [[Fetch]] supports) and
    * scan the TSV with the attribute names as columns. The response of a
    * `header="1"` query carries display names in row 1 — the reference
    * re-maps them to attribute order (Ensembl.py:300-309); here the scan
    * declares the attribute names directly and skips the header row. */
  def scanResponse(spark: SparkSession, landedPath: String,
                   attributes: Seq[String]): DataFrame = {
    val raw = spark.read
      .option("sep", "\t").option("header", "true")
      .csv(landedPath)
    require(raw.columns.length == attributes.length,
      s"martservice returned ${raw.columns.length} columns, " +
        s"query asked for ${attributes.length}")
    raw.toDF(attributes: _*)
  }
}
