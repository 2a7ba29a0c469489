package graft

import org.apache.spark.sql.SparkSession

/** Run a comma-separated list of queries sequentially in ONE session,
  * printing per-query wall time — for diagnosing cross-query JVM/session
  * state effects that single-query profiling can't see.
  * Usage: runMain graft.ProfileSeq q01_x,q02_y[,...] <sfDir>
  */
object ProfileSeq {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // reliable checkpoint dir for iterative operators (Dedup.clusters):
    // local tmp here; a cluster deployment points this at shared storage
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    names.foreach { n =>
      val t0 = System.nanoTime()
      val cnt = Bench.fullCount(SparkEntry.queries(n)(spark, sfDir))
      println(f"[seq] $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($cnt rows)")
    }
    spark.stop()
  }
}
