package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing inspection: run one query N times, print timings and
  * the formatted physical plan. Usage:
  *   runMain graft.Profile <queryName> <sfDir> [reps]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    // ad-hoc conf overrides: SPARK_GRAFT_CONF="k=v,k2=v2"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // reliable checkpoint dir for iterative operators (Dedup.clusters):
    // local tmp here; a cluster deployment points this at shared storage
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    val fn = SparkEntry.queries(name)
    println(s"=== plan for $name ===")
    fn(spark, sfDir).explain("formatted")
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      // full evaluation — a bare count() lets Catalyst eliminate
      // unique-keyed left joins and prune columns (see Bench.fullCount)
      val n = Bench.fullCount(fn(spark, sfDir))
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
