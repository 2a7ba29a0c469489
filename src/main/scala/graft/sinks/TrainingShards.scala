package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Deterministic training-shard writer: the corpus goes out as JSONL
  * shards of ≤ `shardRows` documents in the reproducible training order
  * of [[TextOps.deterministicShuffle]] — the layout a training run
  * consumes directly (shard k = positions [k·shardRows, (k+1)·shardRows)),
  * reconstructible byte-identically on any cluster size or retry.
  *
  * Scale shape: the shard id derives from the shuffle position (pure
  * md5 arithmetic + one per-bucket window), then ONE hash repartition on
  * the shard id co-locates each shard in a single task, so `partitionBy`
  * writes exactly one file per shard with no global sort. Positions
  * carry per-bucket gaps (bucket sizes differ), so shards are ≤
  * shardRows, not exactly equal — the property that matters (stable
  * membership + bounded shard size) holds at any scale.
  */
object TrainingShards {

  /** Write `docs` (idCol + payloadCols) as `shard=K/` JSONL directories
    * under `outDir`, one file per shard. */
  def writeJsonlShards(docs: DataFrame, idCol: String,
                       payloadCols: Seq[String], outDir: String,
                       seed: String, shardRows: Long,
                       buckets: Int = 16): Unit = {
    require(shardRows > 0, "shardRows must be positive")
    val pos = TextOps.deterministicShuffle(docs, idCol, seed, buckets)
      .select(col("id").as(idCol), col("global_pos"))
    docs.join(pos, idCol) // pos is 1:1 with docs on the id — no fan-out
      .withColumn("shard", (col("global_pos") / shardRows).cast("long"))
      .repartition(col("shard"))
      // in-FILE order must be the training order too: after the hash
      // repartition rows arrive in shuffle-fetch order, which varies
      // across runs/cluster sizes/retries — a per-partition sort on
      // global_pos (no extra shuffle; each task sorts only its shards)
      // makes every shard file byte-stable
      .sortWithinPartitions(col("shard"), col("global_pos"))
      .write.mode("overwrite").partitionBy("shard")
      .json(outDir)
  }

  /** Read the written corpus back and report one manifest row per shard:
    * (shard, n_rows, min_pos, max_pos). The read-back (not a recompute)
    * is the point — the manifest proves what landed on disk. */
  def manifest(spark: SparkSession, outDir: String): DataFrame =
    spark.read.json(outDir)
      .groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("global_pos")).as("min_pos"),
        max(col("global_pos")).as("max_pos"))
}
