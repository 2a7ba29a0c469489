package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Range}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Scan-stage parallelism estimation for the widen() guards in
  * [[Dedup]]/[[Similarity]].
  *
  * `df.rdd.getNumPartitions` answers the question exactly but forces a
  * full physical planning of the subtree; the caller then executes `df`
  * itself, planning the identical subtree a second time — harmless on a
  * laptop, real latency on the very wide plans these operators build at
  * cluster scale. Instead, read the answer off the ANALYZED plan's
  * leaves without planning: file-backed scans replicate Spark's own
  * `FilePartition.maxSplitBytes` packing arithmetic from the (already
  * cached) file listing, RDD-backed leaves already know their partition
  * count, and local relations are driver-local. Only when a leaf kind is
  * unrecognized (e.g. an in-memory cache) does it fall back to the exact
  * `df.rdd` answer — the estimate must never silently skip the widen and
  * reintroduce the 1-2-core narrow-scan trap.
  */
private[graft] object ScanStats {

  /** Estimated scan partition count of `df`, without double-planning. */
  def estimatedScanPartitions(df: DataFrame): Int = {
    val spark = df.sparkSession
    val conf = spark.sessionState.conf
    val defaultParallelism = spark.sparkContext.defaultParallelism
    var total = 0L
    var unknown = false
    // withCachedData, not analyzed: cache substitution happens after
    // analysis, so a persisted input only shows its InMemoryRelation leaf
    // here — which is unrecognized below and takes the exact fallback,
    // honouring the cached partitioning instead of the stale file listing.
    df.queryExecution.withCachedData.collectLeaves().foreach {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation =>
          val openCost = conf.filesOpenCostInBytes
          val maxPart = conf.filesMaxPartitionBytes
          val nFiles = fs.location.inputFiles.length.toLong
          val padded = fs.location.sizeInBytes + nFiles * openCost
          // FilePartition.maxSplitBytes: split files at
          // min(maxPartitionBytes, max(openCost, totalPadded/cores))
          val bytesPerCore = padded / math.max(1, defaultParallelism)
          val maxSplit = math.max(1L, math.min(maxPart, math.max(openCost, bytesPerCore)))
          total += math.max(1L, (padded + maxSplit - 1) / maxSplit)
        case _ => unknown = true
      }
      case r: LogicalRDD => total += r.rdd.getNumPartitions.toLong
      case _: LocalRelation => total += 1L
      case r: Range => total += r.numSlices.map(_.toLong)
        .getOrElse(defaultParallelism.toLong)
      case _ => unknown = true
    }
    if (unknown) df.rdd.getNumPartitions
    else math.min(total, Int.MaxValue.toLong).toInt
  }
}
