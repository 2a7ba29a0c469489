package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-located joins via bucketed tables — the shuffle-elimination tool
  * for the repeated fact⋈fact joins a 100 TB deployment runs daily.
  *
  * A join between two tables bucketed on the join key with the same
  * bucket count is planned WITHOUT an Exchange on either side: each task
  * reads bucket i of both tables and joins locally (and `sortBy` makes it
  * a zero-sort merge join). At 100 TB the dominant cost of a fact⋈fact
  * join is shuffling both inputs across the cluster every run; paying one
  * bucketed write once moves that cost out of every subsequent query.
  * This is the persistent-storage complement to `repartition`-based
  * co-location (which helps only within one plan) — the reference has no
  * analogue (its joins are in-memory dicts, SURVEY §2.5), so this is part
  * of the engine's scale posture, not reference semantics.
  *
  * Bucket pruning: equality filters on the bucket key scan only the
  * matching bucket file per partition, so `keys`-selective point lookups
  * skip (buckets-1)/buckets of the data without a partition-column
  * directory scheme.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted external parquet table
    * registered in the session catalog (bucket metadata lives in the
    * catalog, which is why this is `saveAsTable` and not a bare
    * `parquet(path)`; on a real cluster the catalog is the metastore and
    * the layout outlives the session). */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    keys: Seq[String], buckets: Int): Unit = {
    require(keys.nonEmpty && buckets > 0)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata comes from the catalog,
    * so this must be a table read, not a path read — `spark.read.parquet`
    * on the same files would silently lose the co-location). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
