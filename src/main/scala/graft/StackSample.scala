package graft

import org.apache.spark.sql.SparkSession

/** Poor-man's sampling profiler: runs one SparkEntry query while a
  * daemon thread samples every live thread's top frames at ~50 Hz, then
  * prints a frame histogram (executor compute only — scheduler/IO
  * threads filtered). For environments where the JVM attach API
  * (jstack/JFR) is unavailable. Usage:
  *   sbt "runMain graft.StackSample <queryName> <sfDir> [reps]"
  */
object StackSample {
  def main(args: Array[String]): Unit = {
    val (name, sfDir) = (args(0), args(1))
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir(
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString)

    val hist = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val all = Thread.getAllStackTraces
          all.forEach { (t, frames) =>
            if (t.getName.startsWith("Executor task launch") && frames.nonEmpty) {
              // attribute to the deepest non-JDK frame (the code doing work)
              val f = frames.iterator
                .find(fr => !fr.getClassName.startsWith("java.") &&
                  !fr.getClassName.startsWith("jdk.") &&
                  !fr.getClassName.startsWith("sun."))
                .getOrElse(frames(0))
              val key = s"${f.getClassName}.${f.getMethodName}"
              hist.merge(key, 1L, (a, b) => a + b)
            }
          }
        }
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    val fn = SparkEntry.queries(name)
    Bench.fullCount(fn(spark, sfDir)) // warm up untimed, unsampled
    sampling = true
    val t0 = System.nanoTime()
    (1 to reps).foreach(_ => Bench.fullCount(fn(spark, sfDir)))
    val dt = (System.nanoTime() - t0) / 1e9
    sampling = false

    println(f"== $name: $reps reps in $dt%.1f s; top executor frames ==")
    import scala.jdk.CollectionConverters._
    val total = hist.values.asScala.map(_.toLong).sum.max(1L)
    hist.asScala.toSeq.sortBy(-_._2).take(40).foreach { case (k, v) =>
      println(f"${v * 100.0 / total}%6.2f%%  $v%6d  $k")
    }
    spark.stop()
  }
}
