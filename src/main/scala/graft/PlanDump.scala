package graft

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for a list of queries to files — the
  * before/after plan artifacts an optimization round commits
  * (plans/r15/<query>_<tag>.txt). One shared session, bench-shaped conf.
  * For index-building queries the dumped plan is the FINAL query over
  * the just-built index (the builds run eagerly inside the query fn);
  * the build jobs are visible in Profile timings, not in this plan.
  * Usage: runMain graft.PlanDump <q1,q2,...|top:N> <sfDir> <outDir> <tag>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 2) args(2) else "plans/r15"
    val tag = if (args.length > 3) args(3) else "before"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${n}_$tag.txt"),
        plan.getBytes("UTF-8"))
      val exchanges = "Exchange".r.findAllIn(plan).length
      println(f"[plan] $n%-28s -> $outDir/${n}_$tag.txt (${exchanges} Exchange)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
