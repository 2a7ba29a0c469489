package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Declared-schema delimited-file scan with hard header validation.
  *
  * Mirrors the reference's table-driven file manifests
  * (`files = {key: {file, url, columns: [...]}}`, Source.py:39-41) and
  * `check_fileheader` (Source.py:798-828): a missing expected column is a
  * hard failure; extra/reordered columns are logged but tolerated. Spark's
  * declared `StructType` + `select` then gives column pruning and filter
  * pushdown for free (the reference does both by hand per row).
  *
  * gzip members read natively (`.gz` paths Just Work in Spark text/csv
  * scans — reference unpacks by hand, StringDB.py:152-153).
  */
final case class SourceFile(path: String, schema: StructType,
                            delimiter: String = "\t",
                            quote: String = "\"",
                            hasHeader: Boolean = true,
                            comment: Option[Char] = None)

object DelimitedSource {

  final class HeaderMismatch(msg: String) extends RuntimeException(msg)

  /** Validate actual header columns against the declared schema.
    * @return warnings for tolerated differences (extra / reordered). */
  def checkFileHeader(expected: Seq[String], actual: Seq[String]): Seq[String] = {
    val missing = expected.toSet -- actual.toSet
    if (missing.nonEmpty)
      throw new HeaderMismatch(
        s"declared columns missing from file header: ${missing.toSeq.sorted.mkString(", ")}")
    val extra = actual.toSet -- expected.toSet
    val reordered = extra.isEmpty && expected != actual
    (if (extra.nonEmpty)
       Seq(s"unexpected new columns: ${extra.toSeq.sorted.mkString(", ")}") else Nil) ++
      (if (reordered) Seq("columns reordered relative to declaration") else Nil)
  }

  /** Read one declared file; validates the header (if present) before
    * returning the projected, typed DataFrame. */
  def read(spark: SparkSession, sf: SourceFile): DataFrame = {
    if (sf.hasHeader) {
      // One-row peek for validation; cheap (limit pushdown to the scan).
      val headerDf = spark.read
        .option("sep", sf.delimiter).option("quote", sf.quote)
        .option("header", "true")
        .csv(sf.path)
      checkFileHeader(sf.schema.fieldNames.toSeq, headerDf.columns.toSeq)
    }
    val reader = spark.read
      .option("sep", sf.delimiter).option("quote", sf.quote)
      .option("header", sf.hasHeader.toString)
      .schema(sf.schema)
    val df = sf.comment match {
      case Some(c) => reader.option("comment", c.toString).csv(sf.path)
      case None => reader.csv(sf.path)
    }
    // backtick-quote: declared names may contain dots (e.g. HGNC's
    // `pseudogene.org` column), which Column-resolution would otherwise
    // parse as a struct-field path
    df.select(sf.schema.fieldNames.map(n => df.col(s"`$n`")).toIndexedSeq: _*)
  }

  /** Read a declarative multi-file manifest (the `files` dict shape). */
  def readManifest(spark: SparkSession,
                   files: Map[String, SourceFile]): Map[String, DataFrame] =
    files.map { case (k, sf) => k -> read(spark, sf) }
}
