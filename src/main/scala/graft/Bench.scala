package graft
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Driver bench entry: runs every SparkEntry query once against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * A query that throws is reported in an `errors` map (name → class:msg)
  * instead of being silently timed — a broken query must never look like
  * a fast one.
  *
  * SPARK_GRAFT_DIAG=1 additionally prints a per-query JVM-health line to
  * stderr (heap / code cache / metaspace / GC time / JIT compile time) —
  * the instrumentation used to chase long-session degradation.
  */
object Bench {
  import java.lang.management.ManagementFactory
  private def poolUsed(prefix: String): Long =
    ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith(prefix)).map(_.getUsage.getUsed).sum
  private def gcMillis: Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
  private def jitMillis: Long = {
    val c = ManagementFactory.getCompilationMXBean
    if (c != null && c.isCompilationTimeMonitoringSupported) c.getTotalCompilationTime else 0L
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val diag = sys.env.get("SPARK_GRAFT_DIAG").contains("1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: session/scheduler/codegen bring-up shouldn't be
    // attributed to whichever query happens to run first
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val (gc0, jit0) = (gcMillis, jitMillis)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable =>
        errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
      }
      val dt = (System.nanoTime() - t0) / 1e9
      if (diag) {
        val rt = Runtime.getRuntime
        System.err.println(f"[diag] $name%-28s ${dt}%8.2fs heap=${(rt.totalMemory - rt.freeMemory) / (1 << 20)}%5dM codecache=${poolUsed("CodeHeap") / (1 << 20)}%4dM metaspace=${poolUsed("Metaspace") / (1 << 20)}%4dM gc+=${gcMillis - gc0}%5dms jit+=${jitMillis - jit0}%6dms")
      }
      // untimed inter-query hygiene: drop finished queries' cached
      // relations (queries are independent) through the CacheManager so
      // the catalog entry and its RDD blocks go together. No System.gc():
      // an explicit full GC here unloads the previous queries' generated
      // classes, and the resulting deopt/re-JIT storm bills to whichever
      // query runs next (measured: d02 17.6s with gc vs ~3s without).
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      s"\"" + k + "\":\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
