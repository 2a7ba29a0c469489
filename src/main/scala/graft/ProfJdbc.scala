package graft

import java.sql.DriverManager

import org.apache.spark.sql.SparkSession

import graft.sources.JdbcSource
import graft.sources.JdbcSource.{JdbcConf, Stride}

/** Partitioned-JDBC scan measurement (the p04 production posture): seeds
  * an embedded-Derby table with `rows` MGI-view-shaped rows (int key +
  * mixed varchar/int payload), then times a single-stream scan against
  * stride-partitioned scans at 4/8/16 partitions. Derby is embedded and
  * its PAGE CACHE is shared across connections, so concurrent readers
  * parallelize the Spark-side row materialization — the part of a JDBC
  * scan that dominates at wide-row production scale; against a real
  * Postgres server the same Stride options additionally parallelize the
  * server-side scan. Seeding is single-connection (Derby's
  * single-writer posture — documented in SCALING.md) and untimed.
  *
  * Usage: runMain graft.ProfJdbc [rows]
  */
object ProfJdbc {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 1000000
    val home = java.nio.file.Files.createTempDirectory("graft-derby-prof").toString
    System.setProperty("derby.system.home", home)
    val url = s"jdbc:derby:$home/db;create=true"

    val t0 = System.nanoTime()
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE marker (mrk_key INT NOT NULL PRIMARY KEY, " +
        "symbol VARCHAR(64), name VARCHAR(255), chromosome VARCHAR(8), " +
        "cm_offset INT, organism_key INT, status_key INT)")
      st.close()
      conn.setAutoCommit(false)
      val ps = conn.prepareStatement("INSERT INTO marker VALUES (?,?,?,?,?,?,?)")
      var i = 1
      while (i <= rows) {
        ps.setInt(1, i); ps.setString(2, s"Mrk$i")
        ps.setString(3, s"marker gene model $i with a descriptive name")
        ps.setString(4, (1 + i % 20).toString)
        ps.setInt(5, i % 1000); ps.setInt(6, 1); ps.setInt(7, i % 3 + 1)
        ps.addBatch()
        if (i % 10000 == 0) { ps.executeBatch(); conn.commit(); () }
        i += 1
      }
      ps.executeBatch(); conn.commit(); ps.close()
    } finally conn.close()
    println(f"[prof] seeded $rows%d rows in ${(System.nanoTime() - t0) / 1e9}%.1f s (single-writer, untimed posture)")

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val conf = JdbcConf(url)

    def time(label: String)(f: => Long): Unit = {
      // best-of-3: co-tenant noise discipline from Bench
      val ts = (1 to 3).map { _ =>
        val t = System.nanoTime(); val n = f
        ((System.nanoTime() - t) / 1e9, n)
      }
      val best = ts.map(_._1).min
      println(f"[prof] $label%-42s best=$best%6.2f s  runs=${ts.map(t => f"${t._1}%.2f").mkString("/")}  rows=${ts.head._2}")
    }

    time("single-stream scan") {
      Bench.fullCount(JdbcSource.table(spark, conf, "marker"))
    }
    for (p <- Seq(4, 8, 16)) {
      time(s"stride-partitioned scan ($p partitions)") {
        Bench.fullCount(JdbcSource.table(spark, conf, "marker",
          stride = Some(Stride("mrk_key", 1, rows.toLong, p))))
      }
    }
    // the p04 shape: a projected + filtered view scan (pushdown applies
    // per partition — each task's query carries the stride predicate)
    time("stride scan + pushed filter (8 partitions)") {
      Bench.fullCount(JdbcSource.table(spark, conf, "marker",
          stride = Some(Stride("mrk_key", 1, rows.toLong, 8)))
        .filter(org.apache.spark.sql.functions.col("status_key") === 1)
        .select("mrk_key", "symbol", "chromosome"))
    }
    spark.stop()
  }
}
