package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Append-drift → rebalance measurement (round-13 verdict #5): appends
  * assign to FIXED centroids (correct FAISS add() semantics), so a
  * corpus whose distribution shifts re-skews cells over time even when
  * the build was balanced. This measures the full maintenance loop on
  * the power-law fixture:
  *
  *  1. balanced build (maxFactor 2.0) on the 200k Zipf corpus —
  *     occupancy bounded by construction;
  *  2. append a SHIFTED batch (50k vectors in 4 brand-new hot
  *     directions the build never saw) — `cellOccupancy`-style
  *     readout over the stored assignments shows the re-skew;
  *  3. `rebalanceIvfIndex` — retrain balanced centroids over the
  *     stored union, reassign, staged-swap rewrite — restores the
  *     bound; wall cost reported;
  *  4. oracle-identity through the swap: probe-all top-k over the
  *     rebalanced index ≡ exact brute force on the union.
  *
  * Prints `[reb] ...` rows consumed into SCALING.md.
  */
object ProfRebalance {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Similarity

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- fixtures: the ProfAnnSkew power-law base + a shifted batch ----
    // base: 64 cluster directions, Zipf sizes over 200k, graded noise
    val basePath = "/tmp/graft_reb_base_v1"
    val nBase = 200000L
    val nClusters = 64
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(basePath, "_SUCCESS"))) {
      val h = (1 to nClusters).map(1.0 / _).sum
      val sizes = (1 to nClusters).map(r => math.max(1L,
        math.round(nBase / (r * h))))
      val bounds = sizes.scanLeft(0L)(_ + _)
      val bdf = spark.createDataFrame(
        (1 to nClusters).map(r => (r, bounds(r - 1), bounds(r))))
        .toDF("cl", "lo", "hi")
      spark.range(bounds.last).select(col("id").as("vec_id"))
        .join(broadcast(bdf),
          col("vec_id") >= col("lo") && col("vec_id") < col("hi"))
        .select(col("vec_id"), col("cl"), (col("vec_id") - col("lo")).as("w"))
        .select(col("vec_id"),
          expr("transform(sequence(0, 63), j -> cast(" +
            "(pmod(hash('c', cl, j), 1001) / 500.0d - 1.0d) + " +
            "0.004d * (1 + pmod(w, 100)) * (pmod(hash(vec_id, j), 7) - 3)" +
            " as float))").as("embedding"))
        .repartition(32)
        .write.mode("overwrite").parquet(basePath)
      println(s"[reb] base fixture written: $basePath")
    }
    // shifted batch: 4 NEW directions (cluster seeds the build never
    // saw), 12.5k vectors each — the "new hot topic" crawl shape
    val shiftPath = "/tmp/graft_reb_shift_v1"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(shiftPath, "_SUCCESS"))) {
      spark.range(50000L)
        .select((col("id") + 10000000L).as("vec_id"),
          (col("id") % 4 + 1000).as("cl"), (col("id") / 4).as("w"))
        .select(col("vec_id"),
          expr("transform(sequence(0, 63), j -> cast(" +
            "(pmod(hash('c', cl, j), 1001) / 500.0d - 1.0d) + " +
            "0.004d * (1 + pmod(w, 100)) * (pmod(hash(vec_id, j), 7) - 3)" +
            " as float))").as("embedding"))
        .repartition(32)
        .write.mode("overwrite").parquet(shiftPath)
      println(s"[reb] shifted batch written: $shiftPath")
    }
    val base = spark.read.parquet(basePath)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shift = spark.read.parquet(shiftPath)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[reb] base=${base.count()} shifted=${shift.count()}")

    // occupancy readout straight off the STORED assignments — the
    // monitoring query a deployment runs against its own index table
    def occ(tag: String): (Long, Long) = {
      val counts = spark.table("graft_reb_prof").groupBy("cell").count()
        .orderBy(col("count").desc).collect().map(_.getLong(1))
      val med = counts(counts.length / 2)
      println(f"[reb] OCC $tag%-28s cells=${counts.length}%4d " +
        f"max=${counts.head}%6d p50=$med%5d " +
        f"max/p50=${counts.head.toDouble / med}%6.1f " +
        f"top5=[${counts.take(5).mkString(",")}]")
      (counts.head, med)
    }

    val tmp = java.nio.file.Files.createTempDirectory("graft-reb").toString
    // 1. balanced build on the base corpus
    val (_, tBuild) = timed {
      Similarity.writeIvfIndex(base, "vec_id", "embedding",
        "graft_reb_prof", s"$tmp/idx", nlist = 256, buckets = 32,
        balanceFactor = 2.0)
    }
    println(f"[reb] balanced build (nlist=256, maxFactor=2.0): $tBuild%.1f s")
    occ("built balanced")

    // 2. the shifted batch appends against the FIXED centroids
    val (_, tApp) = timed {
      Similarity.appendIvfIndex(spark, shift, "vec_id", "embedding",
        "graft_reb_prof", buckets = 32)
    }
    println(f"[reb] shifted append (50k, 4 new directions): $tApp%.1f s")
    val (maxDrift, medDrift) = occ("after shifted append")

    // 3. rebalance: retrain over the stored union, reassign, staged swap
    val (_, tReb) = timed {
      Similarity.rebalanceIvfIndex(spark, "graft_reb_prof", nlist = 256,
        maxFactor = 2.0)
    }
    println(f"[reb] rebalanceIvfIndex: $tReb%.1f s")
    val (maxReb, medReb) = occ("after rebalance")
    println(f"[reb] drift bound ${maxDrift.toDouble / medDrift}%.1f -> " +
      f"${maxReb.toDouble / medReb}%.1f max/p50 " +
      f"(max ${maxDrift} -> ${maxReb})")

    // 4. oracle-identity through the swap: probe-all ≡ exact on union
    val union = base.unionByName(shift)
    val qs = union.filter(col("vec_id").isin(
      0L, 1L, 2L, 10000000L, 10000001L))
    val (got, tQ) = timed {
      Similarity.ivfTopKIndexed(spark, "graft_reb_prof", qs,
          "vec_id", "embedding", k = 10, nprobe = 4096)
        .collect().toSet
    }
    val (want, tEx) = timed {
      Similarity.bruteForceTopK(union, qs, "vec_id", "embedding", k = 10)
        .collect().toSet
    }
    println(f"[reb] probe-all vs exact: match=${got == want} " +
      f"(probe-all $tQ%.1f s, exact $tEx%.1f s)")
    // serving check: a pruned query against the rebalanced index
    val (res, tServe) = timed {
      Similarity.ivfTopKIndexed(spark, "graft_reb_prof", qs,
        "vec_id", "embedding", k = 10, nprobe = 8).count()
    }
    println(f"[reb] nprobe=8 serving query: $tServe%.2f s ($res rows)")

    // ---- part 2 (r15): the COMPOSED serving shape --------------------
    // The same drift loop on the IVFADC codes table — the
    // billion-vector shape that stores no raw vectors; the retrain
    // reads the raw relation the rerank path already keeps beside the
    // index, the codes conserve (global codebook), only cells move.
    val unionRaw = base.unionByName(shift)
    def occA(tag: String): (Long, Long) = {
      val counts = spark.table("graft_reb_adc").groupBy("cell").count()
        .orderBy(col("count").desc).collect().map(_.getLong(1))
      val med = counts(counts.length / 2)
      println(f"[reb] ADC OCC $tag%-24s cells=${counts.length}%4d " +
        f"max/p50=${counts.head.toDouble / med}%6.1f")
      (counts.head, med)
    }
    val (_, tBuildA) = timed {
      Similarity.writeIvfadcIndex(base, "vec_id", "embedding",
        "graft_reb_adc", s"$tmp/adc", dim = 64, nlist = 256, m = 4,
        ks = 16, buckets = 32, balanceFactor = 2.0)
    }
    println(f"[reb] ADC balanced build: $tBuildA%.1f s")
    occA("built balanced")
    val (_, tAppA) = timed {
      Similarity.appendIvfadcIndex(spark, shift, "vec_id", "embedding",
        "graft_reb_adc", dim = 64, m = 4, buckets = 32)
    }
    println(f"[reb] ADC shifted append: $tAppA%.1f s")
    val (maxDa, medDa) = occA("after shifted append")
    val qsA = unionRaw.filter(col("vec_id").isin(
      0L, 1L, 2L, 10000000L, 10000001L))
    val beforeA = Similarity.ivfadcTopKIndexed(spark, "graft_reb_adc",
      qsA, "vec_id", "embedding", dim = 64, k = 10, nprobe = 4096, m = 4)
      .collect().toSet
    // through the POLICY entry point: the occupancy trigger picks the
    // rebalance branch and the repair prices like a balanced build +
    // the codes join (no re-encode — codes conserve)
    val (act, tRebA) = timed {
      Similarity.maintainIvfadcIndex(spark, "graft_reb_adc", unionRaw,
        "vec_id", "embedding", nlist = 256, maxFactor = 2.0,
        rebalanceAbove = 4.0)
    }
    println(f"[reb] ADC maintain -> $act: $tRebA%.1f s")
    val (maxRa, medRa) = occA("after rebalance")
    println(f"[reb] ADC drift bound ${maxDa.toDouble / medDa}%.1f -> " +
      f"${maxRa.toDouble / medRa}%.1f max/p50")
    val afterA = Similarity.ivfadcTopKIndexed(spark, "graft_reb_adc",
      qsA, "vec_id", "embedding", dim = 64, k = 10, nprobe = 4096, m = 4)
      .collect().toSet
    println(s"[reb] ADC probe-all invariant through swap: ${afterA == beforeA}")
    // the healthy tick after the repair is a NO-OP (r15 guard)
    val (act2, tTick) = timed {
      Similarity.maintainIvfadcIndex(spark, "graft_reb_adc", unionRaw,
        "vec_id", "embedding", nlist = 256, maxFactor = 2.0,
        rebalanceAbove = 4.0)
    }
    println(f"[reb] ADC healthy tick -> $act2: $tTick%.2f s")

    Seq("graft_reb_prof", "graft_reb_prof_centroids",
        "graft_reb_adc", "graft_reb_adc_centroids",
        "graft_reb_adc_codebook")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }
}
