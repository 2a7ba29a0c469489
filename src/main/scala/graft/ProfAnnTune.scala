package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Production-shape ANN tuning table for SCALING.md: IVFADC at
  * nlist=256/1024, m=8 over a 100×-replicated (200 k-vector) corpus,
  * recall\@k per (nlist, nprobe) graded by [[graft.operators.Similarity
  * .recallAtK]] against the exact brute-force baseline — the table a
  * real deployment reads when picking its probe budget. Each copy of a
  * corpus vector is deterministically perturbed (hash-seeded ±steps) so
  * the 200 k vectors are UNIQUE — recall over exact duplicates would
  * grade ties, not retrieval.
  *
  * Usage: runMain graft.ProfAnnTune [sfDir] [copies]
  */
object ProfAnnTune {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 100
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    // GRADED noise: copy c is perturbed with amplitude ∝ (1 + c), so a
    // query's exact top-k is its low-amplitude copies at cleanly
    // separated distances. The v1 fixture used a FLAT ±0.06 amplitude,
    // which made every query's top-10 a near-tie lottery among ~99
    // equally-distant copies — no coarse quantizer can rank ties that
    // sit below its resolution, so PQ/IVFADC recall was structurally
    // ~0.1–0.25 regardless of ks/nprobe/residual (the SCALING.md v1
    // table; IVF-exact resolved them at 0.965+ because exact scoring
    // can). Recall on v2 grades the quantizer, not the tie lottery.
    val fixturePath = s"/tmp/graft_ann_tune_${copies}x_v2"
    // _SUCCESS, not bare existence: a crashed prior run leaves a partial
    // directory that would silently feed the tuning table wrong numbers
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(fixturePath, "_SUCCESS"))) {
      val emb = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      val reps = spark.range(copies).select(col("id").as("copy"))
      emb.crossJoin(reps)
        .select((col("vec_id") + col("copy") * lit(1000000L)).as("vec_id"),
          expr("transform(embedding, (x, i) -> cast(x + 0.004d * (1 + copy) * " +
            "((pmod(hash(vec_id, copy, i), 7)) - 3) as float))").as("embedding"))
        .repartition(32)
        .write.mode("overwrite").parquet(fixturePath)
      println(s"[tune] fixture written: $fixturePath")
    }
    val corpus = spark.read.parquet(fixturePath)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[tune] corpus vectors: ${corpus.count()}")
    val queries = corpus.filter(col("vec_id") < 20)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[tune] query batch: ${queries.count()}")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val k = 10
    val (exact, tExact) = timed {
      val e = Similarity.bruteForceTopK(corpus, queries, "vec_id",
        "embedding", k)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count(); e
    }
    println(f"[tune] exact baseline (k=$k): $tExact%.1f s")

    val tmp = java.nio.file.Files.createTempDirectory("graft-anntune").toString

    def recall(res: DataFrame): Double =
      Similarity.recallAtK(exact, res).agg(avg("recall")).head().getDouble(0)

    // IVF-only rows (exact cosine within probed cells): isolates the
    // CELL-MISS recall component — IVFADC recall can never exceed this
    // at the same (nlist, nprobe); the gap below it is quantization loss
    {
      val table = "tune_ivf_256"
      val (_, tBuild) = timed {
        Similarity.writeIvfIndex(corpus, "vec_id", "embedding",
          table, s"$tmp/$table", nlist = 256, buckets = 32)
      }
      for (nprobe <- Seq(8, 32)) {
        val (res, tQ) = timed {
          val r = Similarity.ivfTopKIndexed(spark, table, queries,
            "vec_id", "embedding", k = k, nprobe = nprobe)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          r.count(); r
        }
        val (_, tQ2) = timed {
          Similarity.ivfTopKIndexed(spark, table, queries,
            "vec_id", "embedding", k = k, nprobe = nprobe).count()
        }
        println(f"[tune] IVF-exact nlist= 256 nprobe=$nprobe%2d | build=$tBuild%6.1f s | query=$tQ%5.2f s warm=$tQ2%5.2f s | recall@$k=${recall(res)}%.3f")
        res.unpersist()
      }
      Seq(table, s"${table}_centroids")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }

    // IVFADC grid: nlist × ks (sub-quantizer size — the precision knob;
    // nprobe stops buying recall once quantization error dominates)
    for ((nlist, ks) <- Seq((256, 16), (256, 256), (1024, 256))) {
      val table = s"tune_adc_${nlist}_$ks"
      val (_, tBuild) = timed {
        Similarity.writeIvfadcIndex(corpus, "vec_id", "embedding",
          table, s"$tmp/$table", dim = 64, nlist = nlist, m = 8, ks = ks,
          buckets = 32)
      }
      val rows = spark.table(table).count()
      for (nprobe <- Seq(8, 32)) {
        val (res, tQ) = timed {
          val r = Similarity.ivfadcTopKIndexed(spark, table, queries,
            "vec_id", "embedding", dim = 64, k = k, nprobe = nprobe, m = 8)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          r.count(); r
        }
        // warm second rep: the serving number (plan reuse, page cache)
        val (_, tQ2) = timed {
          Similarity.ivfadcTopKIndexed(spark, table, queries,
            "vec_id", "embedding", dim = 64, k = k, nprobe = nprobe, m = 8)
            .count()
        }
        println(f"[tune] IVFADC nlist=$nlist%4d ks=$ks%3d nprobe=$nprobe%2d m=8 | build=$tBuild%6.1f s (${rows}%d code rows) | query=$tQ%5.2f s warm=$tQ2%5.2f s | recall@$k=${recall(res)}%.3f")
        res.unpersist()
      }
      Seq(table, s"${table}_codebook", s"${table}_centroids")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }

    // By-residual rows (FAISS by_residual=true): same layout, codes
    // quantize v − centroid(cell) — the knob that moves recall when
    // nprobe/ks saturate (the non-residual grid above)
    for ((nlist, ks) <- Seq((256, 16), (256, 256))) {
      val table = s"tune_res_${nlist}_$ks"
      val (_, tBuild) = timed {
        Similarity.writeIvfadcResidualIndex(corpus, "vec_id", "embedding",
          table, s"$tmp/$table", dim = 64, nlist = nlist, m = 8, ks = ks,
          buckets = 32)
      }
      for (nprobe <- Seq(8, 32)) {
        val (res, tQ) = timed {
          val r = Similarity.ivfadcResidualTopKIndexed(spark, table,
            queries, "vec_id", "embedding", dim = 64, k = k,
            nprobe = nprobe, m = 8)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          r.count(); r
        }
        val (_, tQ2) = timed {
          Similarity.ivfadcResidualTopKIndexed(spark, table, queries,
            "vec_id", "embedding", dim = 64, k = k, nprobe = nprobe, m = 8)
            .count()
        }
        println(f"[tune] RESIDUAL nlist=$nlist%4d ks=$ks%3d nprobe=$nprobe%2d m=8 | build=$tBuild%6.1f s | query=$tQ%5.2f s warm=$tQ2%5.2f s | recall@$k=${recall(res)}%.3f")
        res.unpersist()
      }
      Seq(table, s"${table}_codebook", s"${table}_centroids")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }

    // Two-stage serving (s21): ADC candidates from the persisted index,
    // exact re-rank — measures the claim that rerank recovers
    // IVF-exact-level recall at code-table scan cost
    {
      val table = "tune_rr_256_256"
      val (_, tBuild) = timed {
        Similarity.writeIvfadcIndex(corpus, "vec_id", "embedding",
          table, s"$tmp/$table", dim = 64, nlist = 256, m = 8, ks = 256,
          buckets = 32)
      }
      for (kCand <- Seq(20, 50)) {
        val (res, tQ) = timed {
          val r = Similarity.ivfadcRerankTopKIndexed(spark, table, corpus,
            queries, "vec_id", "embedding", dim = 64, k = k, kCand = kCand,
            nprobe = 8, m = 8)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          r.count(); r
        }
        println(f"[tune] RERANK nlist= 256 ks=256 nprobe= 8 kCand=$kCand%3d m=8 | build=$tBuild%6.1f s | query=$tQ%5.2f s | recall@$k=${recall(res)}%.3f")
        res.unpersist()
      }
      Seq(table, s"${table}_codebook", s"${table}_centroids")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }

    // Lloyd-TRAINED codebooks (pqCodebookTrained — FAISS always trains;
    // the sampled codebook is only the init). The residual rows above
    // show WHY training matters: residuals are near-zero-mean/high-
    // variance, so sampled residual codewords are terrible — training
    // is what makes by_residual the better encoding.
    for ((resFlag, nlist, ks, it) <- Seq(
        (false, 256, 256, 3), (true, 256, 256, 3), (true, 256, 16, 3))) {
      val kind = if (resFlag) "RES-TRAINED" else "ADC-TRAINED"
      val table = s"tune_tr_${if (resFlag) "r" else "a"}_${nlist}_$ks"
      val (_, tBuild) = timed {
        if (resFlag)
          Similarity.writeIvfadcResidualIndex(corpus, "vec_id", "embedding",
            table, s"$tmp/$table", dim = 64, nlist = nlist, m = 8, ks = ks,
            buckets = 32, trainIters = it)
        else
          Similarity.writeIvfadcIndex(corpus, "vec_id", "embedding",
            table, s"$tmp/$table", dim = 64, nlist = nlist, m = 8, ks = ks,
            buckets = 32, trainIters = it)
      }
      for (nprobe <- Seq(8, 32)) {
        val (res, tQ) = timed {
          val r = (if (resFlag)
            Similarity.ivfadcResidualTopKIndexed(spark, table, queries,
              "vec_id", "embedding", dim = 64, k = k, nprobe = nprobe, m = 8)
          else
            Similarity.ivfadcTopKIndexed(spark, table, queries,
              "vec_id", "embedding", dim = 64, k = k, nprobe = nprobe, m = 8))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          r.count(); r
        }
        println(f"[tune] $kind%-11s nlist=$nlist%4d ks=$ks%3d iters=$it nprobe=$nprobe%2d m=8 | build=$tBuild%6.1f s | query=$tQ%5.2f s | recall@$k=${recall(res)}%.3f")
        res.unpersist()
      }
      Seq(table, s"${table}_codebook", s"${table}_centroids")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
    spark.stop()
  }
}
