package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One ingest source (the reference's `Source` subclass contract,
  * dipper/sources/Source.py — 35 registered implementations driven by
  * dipper-etl.py:20-62).
  *
  * The reference's lifecycle is fetch → parse → write; here fetch stays a
  * driver-side stage that lands raw files (never network from executors —
  * SURVEY §7 risk list), `read` declares schemas over those files, and
  * `transform` is one Catalyst-planned DAG from input DataFrames to the
  * triple relation.
  */
trait GraftSource {
  def name: String

  /** Declared inputs: key → DataFrame (schema validation inside). */
  def read(spark: SparkSession, dataDir: String): Map[String, DataFrame]

  /** The whole parse/emit pipeline as one declarative plan:
    * scan → project/filter → joins → flatMap(emitters) → triples. */
  def transform(spark: SparkSession, inputs: Map[String, DataFrame]): DataFrame

  /** Taxon-constrained variant (the reference's `tax_ids` constructor
    * argument, dipper-etl.py:95-105): sources that support it override
    * and push the constraint into their scans; the default ignores it,
    * matching reference sources with no taxon support. */
  def transform(spark: SparkSession, inputs: Map[String, DataFrame],
                taxa: Seq[String]): DataFrame = transform(spark, inputs)

  /** Curated test-subset subject ids (resources/test_ids.yaml shape). */
  def testIds: Seq[String] = Nil
}
