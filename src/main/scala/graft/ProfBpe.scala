package graft

import org.apache.spark.sql.SparkSession

/** BPE trainer scaling probe: times [[graft.operators.TextOps.bpeMerges]]
  * at a production-ish merge count on a given corpus, for the SCALING.md
  * nMerges tier. The driver-dictionary fast path runs the merge loop
  * locally after ONE Spark aggregation, so its wall should be flat in
  * nMerges next to the distributed fold's per-merge Spark-job cost —
  * this main measures both (the fold at a reduced merge count; its
  * per-merge cost is the comparison number).
  *
  * Usage: runMain graft.ProfBpe <sfDir> [nMergesFast] [nMergesDist]
  */
object ProfBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nFast = if (args.length > 1) args(1).toInt else 256
    val nDist = if (args.length > 2) args(2).toInt else 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm the scan

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[bpe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($r rows)")
    }
    time(s"driver-dict fast path, nMerges=$nFast") {
      graft.operators.TextOps.bpeMerges(docs, "text", nFast).count()
    }
    time(s"driver-dict fast path, nMerges=$nFast (rep 2)") {
      graft.operators.TextOps.bpeMerges(docs, "text", nFast).count()
    }
    time(s"distributed fold,      nMerges=$nDist") {
      graft.operators.TextOps.bpeMerges(docs, "text", nDist,
        maxDriverVocab = 0).count()
    }
    spark.stop()
  }
}
