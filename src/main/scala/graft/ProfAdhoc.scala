package graft

import org.apache.spark.sql.SparkSession

/** Scratch decomposition profiler: times a query with and without its
  * final Deduplicate node. Usage: runMain graft.ProfAdhoc <query> [sfDir]. */
object ProfAdhoc {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()

    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($r)")
    }

    val full = SparkEntry.queries(name)
    val withoutDedup = full(spark, sfDir).queryExecution.logical match {
      case org.apache.spark.sql.catalyst.plans.logical.Deduplicate(_, child) =>
        Some(org.apache.spark.sql.classic.ProfShim.ofRows(spark, child))
      case other =>
        println(s"[prof] top node is ${other.getClass.getSimpleName}"); None
    }
    for (i <- 1 to 3) time(s"$name full") { full(spark, sfDir).count() }
    withoutDedup.foreach { raw =>
      for (i <- 1 to 3) time(s"$name raw (no dedup)") { raw.count() }
      // per-branch timing when the raw plan is a Union tree
      def flatten(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
          : Seq[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] =
        p match {
          case u: org.apache.spark.sql.catalyst.plans.logical.Union =>
            u.children.flatMap(flatten)
          case other => Seq(other)
        }
      val branches = flatten(raw.queryExecution.logical)
      if (branches.size > 1) branches.zipWithIndex.foreach { case (b, i) =>
        val df = org.apache.spark.sql.classic.ProfShim.ofRows(spark, b)
        time(f"  branch $i%2d") { df.count() }
        time(f"  branch $i%2d distinct") {
          df.dropDuplicates(df.columns.take(5)).count()
        }
      }
    }
    spark.stop()
  }
}
