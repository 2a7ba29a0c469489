package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting.
  *
  * A hot grouping/join key concentrates its rows in one shuffle
  * partition; at 100 TB a single hot key stalls the stage (AQE's skew
  * handling covers sort-merge joins, not aggregations or broadcast-less
  * hash paths). Salting splits each hot key across `buckets` sub-keys:
  *
  *  - aggregation: partial-aggregate on (key, salt), then final-aggregate
  *    on key — exact for algebraic aggregates (sum/count/min/max);
  *  - join: the skewed side gets a content-derived salt, the build side
  *    is replicated once per salt value, and the join runs on
  *    (key, salt) — result identical to the unsalted join.
  *
  * Salts are content-derived (xxhash64 of non-key columns), never
  * random — results stay deterministic under retries and repartitioning.
  */
object Salt {

  private def saltCol(df: DataFrame, keyCols: Seq[String], buckets: Int): Column = {
    val nonKey = df.columns.filterNot(keyCols.contains)
    val basis = if (nonKey.nonEmpty) nonKey.map(col).toSeq else keyCols.map(col)
    pmod(xxhash64(basis: _*), lit(buckets)).cast("int")
  }

  /** Exact skew-resistant sum/count aggregation in two phases. */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     buckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", saltCol(df, keyCols, buckets))
    val partial = salted
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__psum").as("total"), sum("__pcnt").as("n"))
  }

  /** Skew-resistant inner equi-join: `skewed` ⋈ `dim` on `key`, with the
    * dimension replicated across `buckets` salt values. */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String,
                 buckets: Int = 16): DataFrame = {
    val saltedBig = skewed.withColumn("__salt", saltCol(skewed, Seq(key), buckets))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
