package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch decomposition profiler (not part of the engine surface). */
object ProfAdhoc {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // p31 decomposition: emission without dedup, then with
    val full = SparkEntry.queries("p31_animalqtldb_pipeline")
    for (_ <- 1 to 2) time("p31 full (dedup)") { println(full(spark, sfDir).count()) }

    // rebuild the same inputs and skip the final dropDuplicates
    val withoutDedup = full(spark, sfDir).queryExecution.logical match {
      case org.apache.spark.sql.catalyst.plans.logical.Deduplicate(_, child) =>
        org.apache.spark.sql.classic.ProfShim.ofRows(spark, child)
      case other =>
        println(s"[prof] top node is ${other.getClass.getSimpleName}")
        full(spark, sfDir)
    }
    for (_ <- 1 to 2) time("p31 raw emission (no dedup)") { println(withoutDedup.count()) }
    spark.stop()
  }
}
