package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{PipelineQueries, RdfQueries, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the reference's canonical
    * scan → emit(reified associations) → triples pipeline (SURVEY §3.2
    * shape). Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("r02_assoc_reified")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ RdfQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ RdfQueries.oracles ++ PipelineQueries.oracles
}
