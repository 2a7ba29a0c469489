package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end release capstone at the 100×-mutated tier: the COMPOSED
  * run a deployment actually executes — keep-best → banded MinHash
  * pairs → components → soft weights → leak-free split → JSONL shards
  * + manifest + the t36 datasheet — timed as one recipe over 500 k
  * UNIQUE mutated documents (the hard case: exact dedup finds nothing,
  * every doc shares almost all spans with its 99 siblings, so the
  * near-dup machinery does real work).
  *
  * Prints `[relcap] ...` rows consumed into SCALING.md.
  */
object ProfRelease {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val copies = if (args.length > 1) args(1).toInt else 100
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // 100×-mut fixture: copy c of each doc carries a unique tail token,
    // so every doc is UNIQUE (exact dedup finds nothing) but shares its
    // spans with 99 siblings — the d23/t25 tier's construction
    val fixture = s"/tmp/graft_relcap_${copies}xmut"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(fixture, "_SUCCESS"))) {
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source"), col("text"))
      val reps = spark.range(copies).select(col("id").as("copy"))
      docs.crossJoin(reps)
        .select((col("doc_id") + col("copy") * lit(1000000L)).as("doc_id"),
          col("source"),
          concat(col("text"), lit(" uniq"), col("copy"), lit("x"),
            col("doc_id")).as("text"))
        .repartition(32)
        .write.mode("overwrite").parquet(fixture)
      println(s"[relcap] fixture written: $fixture")
    }
    val docs = spark.read.parquet(fixture)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count()
    println(s"[relcap] corpus docs: $nDocs")

    val outDir = java.nio.file.Files
      .createTempDirectory("graft-relcap-out").toString
    val dec = org.apache.spark.sql.types.DecimalType(30, 12)
    val ((manifestRows, datasheet), tAll) = timed {
      // ONE plan relation shared by the shard writer and the datasheet
      // (what release() composes; sharing avoids pretending the plan
      // is free twice)
      val planned = graft.operators.CorpusRelease.plan(
          docs, "doc_id", "text",
          when(col("source") === "web", lit(1)).otherwise(lit(2)),
          seed = "relcap", pctTrain = 90, pctVal = 5,
          pairSource = Some(surv => graft.operators.Dedup.minhashPairs(
            surv, "doc_id", "text", numPerm = 32, bands = 8,
            threshold = 0.5, family = "md5")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      graft.sinks.TrainingShards.writeJsonlShards(
        planned.filter(col("split") === "train"), "doc_id",
        Seq("text", "weight"), outDir, "relcap", shardRows = 65536,
        buckets = 32)
      val mf = graft.sinks.TrainingShards.manifest(spark, outDir)
        .collect()
      val ds = planned
        .select(col("doc_id"), col("source"), col("split"), col("weight"))
        .join(docs.select(col("doc_id"),
          size(graft.operators.TextOps.words(col("text")))
            .cast("long").as("toks")), "doc_id")
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"),
          round(sum(col("weight").cast(dec)).cast("double"), 6)
            .as("total_weight"))
        .collect()
      planned.unpersist(false)
      (mf, ds)
    }
    val shardCount = manifestRows.length
    val shardDocs = manifestRows.map(_.getAs[Long]("n_rows")).sum
    println(f"[relcap] FULL RECIPE $nDocs%d docs -> $shardCount%d shards " +
      f"($shardDocs%d train docs) in $tAll%.1f s = " +
      f"${nDocs / tAll}%.0f docs/s in, ${shardDocs / tAll}%.0f docs/s out")
    println("[relcap] datasheet (source, split, n_docs, n_tokens, total_weight):")
    datasheet.sortBy(r => (r.getString(0), r.getString(1)))
      .foreach(r => println(s"[relcap]   $r"))
    spark.stop()
  }
}
