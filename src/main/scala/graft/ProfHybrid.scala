package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Step-decomposed timing of the hybrid-retrieval gate rows (s28 shape):
  * IVF index build, probe-all query, BM25 index build, indexed query,
  * fusion — so optimization effort lands on the step that costs.
  * Usage: runMain graft.ProfHybrid [sfDir] [reps]
  */
object ProfHybrid {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    import graft.operators.{Retrieval, Similarity}

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[hyb] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    for (rep <- 1 to reps) {
      println(s"--- rep $rep ---")
      val emb = Tables.embeddings(spark, sfDir)
      val docs = Tables.documents(spark, sfDir)
      val vpath = s"${sys.props("java.io.tmpdir")}/graft_profhyb_ivf/x$rep"
      time("writeIvfIndex") {
        Similarity.writeIvfIndex(emb, "vec_id", "embedding",
          "graft_profhyb_ivf", vpath, nlist = 16, buckets = 8)
      }
      val vec = time("ivfTopKIndexed probe-all") {
        val v = Similarity.ivfTopKIndexed(spark, "graft_profhyb_ivf",
          emb.filter(col("vec_id") < 3), "vec_id", "embedding",
          k = 10, nprobe = 16)
          .select(col("qid"), col("nid"), col("rank"))
        v.count(); v
      }
      val lpath = s"${sys.props("java.io.tmpdir")}/graft_profhyb_bm25/x$rep"
      time("writeBm25Index") {
        Retrieval.writeBm25Index(docs, "doc_id", "text",
          "graft_profhyb_bm25", lpath, buckets = 8)
      }
      val qs = docs.filter(col("doc_id") < 3)
        .select(col("doc_id"),
          concat_ws(" ", slice(split(col("text"), " "), 1, 8)).as("qtext"))
      val lex = time("bm25TopKIndexed") {
        val l = Retrieval.bm25TopKIndexed(spark, "graft_profhyb_bm25",
          qs, "doc_id", "qtext", k = 10)
          .select(col("qid"), col("doc_id").as("nid"), col("rank"))
        l.count(); l
      }
      time("rrfFuse+fullCount") {
        Bench.fullCount(Retrieval.rrfFuse(Seq(vec, lex), k = 5))
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
