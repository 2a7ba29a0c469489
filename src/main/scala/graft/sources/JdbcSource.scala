package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Relational-database scans (reference: PostgreSQLSource.py:49-152).
  *
  * The reference materializes `COPY (SELECT * FROM t [LIMIT n]) TO STDOUT`
  * into local TSVs and re-parses them; on Spark the JDBC source reads the
  * table/query directly with predicate + column pushdown handled by
  * Catalyst (`PushedFilters` in the scan), and a stride-partitioned read
  * parallelizes the fetch across executors — the part the single-threaded
  * reference cannot do.
  *
  * Exercised end-to-end in JdbcSpec against embedded Derby (the only
  * database engine shipped with the Spark runtime); the options are the
  * standard JDBC-source options, so a Postgres URL + driver behaves
  * identically.
  */
object JdbcSource {

  final case class JdbcConf(url: String, user: String = "",
                            password: String = "",
                            driver: Option[String] = None)

  /** Stride partitioning for a parallel scan: Spark splits
    * `[lowerBound, upperBound]` of `column` into `numPartitions` ranges,
    * one executor task each. Bounds don't filter — rows outside them all
    * land in the first/last partition. */
  final case class Stride(column: String, lowerBound: Long, upperBound: Long,
                          numPartitions: Int = 8)

  /** Whole-table scan (COPY table equivalent), optionally partitioned. */
  def table(spark: SparkSession, conf: JdbcConf, table: String,
            stride: Option[Stride] = None): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", conf.url).option("dbtable", table)
      .option("user", conf.user).option("password", conf.password)
    conf.driver.foreach(d => r = r.option("driver", d))
    stride.foreach { s =>
      r = r.option("partitionColumn", s.column)
        .option("lowerBound", s.lowerBound.toString)
        .option("upperBound", s.upperBound.toString)
        .option("numPartitions", s.numPartitions.toString)
    }
    r.load()
  }

  /** Arbitrary-SQL scan (the per-source .sql query manifests,
    * MGI.py:52-66 / FlyBase.py:50-72). */
  def query(spark: SparkSession, conf: JdbcConf, sql: String): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", conf.url).option("query", sql)
      .option("user", conf.user).option("password", conf.password)
    conf.driver.foreach(d => r = r.option("driver", d))
    r.load()
  }

  /** Row-count verification (PostgreSQLSource.py:88-100). */
  def verifyCount(df: DataFrame, expected: Long): Unit = {
    val n = df.count()
    require(n == expected, s"row count mismatch: got $n, expected $expected")
  }
}
