package graft

import java.nio.file.Files
import java.sql.DriverManager

import graft.sources.JdbcSource
import graft.sources.JdbcSource.{JdbcConf, Stride}

/** End-to-end JDBC scans against embedded Derby (the only database engine
  * shipped with the Spark runtime — same options as a Postgres URL). */
class JdbcSpec extends SparkSpec {

  private lazy val url: String = {
    val home = Files.createTempDirectory("graft-derby").toString
    System.setProperty("derby.system.home", home) // keep derby.log out of cwd
    val u = s"jdbc:derby:$home/db;create=true"
    val conn = DriverManager.getConnection(u)
    try {
      val st = conn.createStatement()
      st.execute(
        "CREATE TABLE genes (gene_id INT NOT NULL, symbol VARCHAR(32), taxon INT)")
      st.close()
      val ps = conn.prepareStatement("INSERT INTO genes VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"G$i")
        ps.setInt(3, if (i % 2 == 0) 9606 else 10090)
        ps.addBatch()
      }
      ps.executeBatch(); ps.close()
    } finally conn.close()
    u
  }

  private lazy val conf = JdbcConf(url)

  test("table scan reads all rows; verifyCount passes and rejects") {
    val df = JdbcSource.table(spark, conf, "genes")
    JdbcSource.verifyCount(df, 100)
    assert(df.columns.map(_.toLowerCase).toSeq == Seq("gene_id", "symbol", "taxon"))
    intercept[IllegalArgumentException](JdbcSource.verifyCount(df, 99))
  }

  test("stride-partitioned scan parallelizes without changing results") {
    val df = JdbcSource.table(spark, conf, "genes",
      stride = Some(Stride("gene_id", 1, 100, 4)))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 100)
    import spark.implicits._
    assert(df.select("gene_id").as[Int].collect().toSet == (1 to 100).toSet)
  }

  test("predicate pushdown reaches the JDBC scan") {
    val df = JdbcSource.table(spark, conf, "genes")
      .filter(org.apache.spark.sql.functions.col("taxon") === 9606)
    assert(df.count() == 50)
    // the filter must be in the scan's PushedFilters, not a Spark-side
    // Filter (Derby uppercases unquoted identifiers → TAXON)
    val scan = df.queryExecution.executedPlan.collectLeaves().mkString
    assert(scan.contains("EqualTo(TAXON,9606)"))
  }

  test("query scan runs arbitrary SQL (per-source .sql manifest shape)") {
    val df = JdbcSource.query(spark, conf,
      "SELECT taxon, count(*) AS n FROM genes GROUP BY taxon")
    import spark.implicits._
    val rows = df.as[(Int, Long)].collect().toMap
    assert(rows == Map(9606 -> 50L, 10090 -> 50L))
  }
}
