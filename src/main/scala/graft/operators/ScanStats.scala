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

  /** Widen guard (the p08 1-split-scan lesson): a small landed file
    * packs into 1-2 scan splits, serializing every downstream map-side
    * emission stage on a 32-core executor; repartition to default
    * parallelism when the estimate says so. The repartition is also the
    * one Exchange that AQE's ReuseExchange shares across the plan's
    * branching consumers.
    *
    * The always-true nondeterministic filter above the exchange is a
    * PREDICATE PUSHDOWN BARRIER: without it the optimizer pushes every
    * downstream row filter — with its full derived-expression subtree
    * (regex chains, digests) inlined — through the repartition onto the
    * narrow scan side, silently re-serializing exactly the work the
    * exchange exists to spread (measured: the WormBase GFF tier ran
    * cpu≈wall single-core with filters sunk, 6× wall with them held
    * above). Predicates cannot reorder across a nondeterministic
    * filter, and a seeded always-true `rand` costs one PRNG call per
    * row. When the scan is already wide the guard is a no-op and
    * pushdown stays fully enabled. */
  def widen(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{isnan, not, rand}
    val target = df.sparkSession.sparkContext.defaultParallelism
    // already widened upstream (e.g. the caller repartitioned the raw
    // scan so its parse projection parallelizes) — don't shuffle twice
    val alreadyWide = df.queryExecution.analyzed.exists {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation =>
        r.numPartitions >= target
      case _ => false
    }
    // NOTE: `rand(7) >= -1` does NOT work as the barrier — Spark 4's
    // range analysis folds it to TRUE and PruneFilters deletes it;
    // rand never produces NaN, so this stays always-true while opaque
    // to the optimizer
    if (!alreadyWide && estimatedScanPartitions(df) < target)
      df.repartition(target).filter(not(isnan(rand(7)))) else df
  }
}
