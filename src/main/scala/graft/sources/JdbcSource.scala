package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Relational-database scans (reference: PostgreSQLSource.py:49-152).
  *
  * The reference materializes `COPY (SELECT * FROM t [LIMIT n]) TO STDOUT`
  * into local TSVs and re-parses them; on Spark the JDBC source reads the
  * table/query directly with predicate + column + limit pushdown handled
  * by Catalyst (`PushedFilters` in the scan), and `partitionColumn`
  * parallelizes the read across executors — the part the single-threaded
  * reference cannot do.
  *
  * No database (or JDBC driver) ships in this environment, so this stays
  * a thin typed wrapper: the row-count verification mirrors
  * PostgreSQLSource's fetched-vs-DB count check.
  */
object JdbcSource {

  final case class JdbcConf(url: String, user: String, password: String,
                            driver: Option[String] = None)

  /** Whole-table scan (COPY table equivalent), optionally partitioned. */
  def table(spark: SparkSession, conf: JdbcConf, table: String,
            partitionColumn: Option[String] = None,
            numPartitions: Int = 8): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", conf.url).option("dbtable", table)
      .option("user", conf.user).option("password", conf.password)
    conf.driver.foreach(d => r = r.option("driver", d))
    partitionColumn.foreach { pc =>
      r = r.option("partitionColumn", pc).option("numPartitions", numPartitions.toString)
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
