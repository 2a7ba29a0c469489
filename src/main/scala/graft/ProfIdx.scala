package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN index scaling probe for SCALING.md: times the persisted-PQ and
  * IVFADC build/query split on a given corpus — the build pays the
  * encode/assignment passes once; the query batch must stay
  * milliseconds-to-seconds regardless of corpus size because it touches
  * codes (and for IVFADC, only the probed cells' buckets).
  *
  * Usage: runMain graft.ProfIdx <sfDir>
  */
object ProfIdx {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, sfDir)
    println(s"[idx] corpus vectors: ${emb.count()}")
    val tmp = java.nio.file.Files.createTempDirectory("graft-profidx").toString

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[idx] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($r rows)")
    }
    import graft.operators.Similarity
    time("PQ index build") {
      Similarity.writePqIndex(emb, "vec_id", "embedding",
        "prof_pq", s"$tmp/pq", dim = 64, m = 4, ks = 16, buckets = 8)
      spark.table("prof_pq").count()
    }
    val qs = emb.filter(col("vec_id") < 10)
    time("PQ indexed query (10 queries)") {
      Similarity.pqTopKIndexed(spark, "prof_pq", qs,
        "vec_id", "embedding", dim = 64, k = 3, m = 4).count()
    }
    time("PQ indexed query (rep 2)") {
      Similarity.pqTopKIndexed(spark, "prof_pq", qs,
        "vec_id", "embedding", dim = 64, k = 3, m = 4).count()
    }
    time("IVFADC index build") {
      Similarity.writeIvfadcIndex(emb, "vec_id", "embedding",
        "prof_adc", s"$tmp/adc", dim = 64, nlist = 16, m = 4, ks = 16,
        buckets = 8)
      spark.table("prof_adc").count()
    }
    time("IVFADC indexed query (10 queries)") {
      Similarity.ivfadcTopKIndexed(spark, "prof_adc", qs,
        "vec_id", "embedding", dim = 64, k = 3, nprobe = 4, m = 4).count()
    }
    time("IVFADC indexed query (rep 2)") {
      Similarity.ivfadcTopKIndexed(spark, "prof_adc", qs,
        "vec_id", "embedding", dim = 64, k = 3, nprobe = 4, m = 4).count()
    }
    spark.stop()
  }
}
